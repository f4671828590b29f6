"""Shared tag-category tables for tree construction and serialization.

All tables are public WHATWG spec data, re-derived from the spec (the
reference embeds the same data at /root/reference/Sources/HTMLParser.m:
special elements 1269-1280, SVG case tables 2328-2440, quirks public-ID
prefixes 212-268).
"""

from __future__ import annotations

SPECIAL_HTML = frozenset("""
address applet area article aside base basefont bgsound blockquote body br
button caption center col colgroup dd details dir div dl dt embed fieldset
figcaption figure footer form frame frameset h1 h2 h3 h4 h5 h6 head header
hgroup hr html iframe img input keygen li link listing main marquee menu meta
nav noembed noframes noscript object ol p param plaintext pre script section
select source style summary table tbody td template textarea tfoot th thead
title tr track ul wbr xmp
""".split())

SPECIAL_MATHML = frozenset(["mi", "mo", "mn", "ms", "mtext", "annotation-xml"])
SPECIAL_SVG = frozenset(["foreignObject", "desc", "title"])

FORMATTING = frozenset(
    ["a", "b", "big", "code", "em", "font", "i", "nobr", "s", "small",
     "strike", "strong", "tt", "u"])

# scope barrier sets: (html_tags, mathml_tags, svg_tags)
SCOPE_BASE_HTML = frozenset(
    ["applet", "caption", "html", "table", "td", "th", "marquee", "object",
     "template"])
SCOPE_LIST_HTML = SCOPE_BASE_HTML | {"ol", "ul"}
SCOPE_BUTTON_HTML = SCOPE_BASE_HTML | {"button"}
SCOPE_TABLE_HTML = frozenset(["html", "table", "template"])

# menuitem kept per the reference's 2016-era list
# (Sources/HTMLParser.m:3246); rb/rtc are the later additions the ruby
# handlers rely on — the reference's html5lib skip policy hides the delta.
IMPLIED_END = frozenset(
    ["dd", "dt", "li", "menuitem", "optgroup", "option", "p", "rb", "rp",
     "rt", "rtc"])
IMPLIED_END_THOROUGH = IMPLIED_END | {
    "caption", "colgroup", "tbody", "td", "tfoot", "th", "thead", "tr"}

HEADINGS = frozenset(["h1", "h2", "h3", "h4", "h5", "h6"])

VOID_ELEMENTS = frozenset(
    ["area", "base", "basefont", "bgsound", "br", "col", "embed", "frame",
     "hr", "img", "input", "keygen", "link", "menuitem", "meta", "param",
     "source", "track", "wbr"])

RAW_TEXT_SERIALIZE = frozenset(
    ["style", "script", "xmp", "iframe", "noembed", "noframes", "plaintext",
     # noscript joins the raw-text set when scripting is enabled; the
     # serializer matches the parser's default (scripting=True, the
     # reference's hardcoded behavior — Sources/HTMLParser.m:500/914 and
     # Sources/HTMLSerialization.m:194 lists noscript raw), so noscript
     # text round-trips unescaped
     "noscript"])

# foreign-content breakout start tags (spec §13.2.6.5)
BREAKOUT = frozenset("""
b big blockquote body br center code dd div dl dt em embed h1 h2 h3 h4 h5 h6
head hr i img li listing menu meta nobr ol p pre ruby s small span strong
strike sub sup table tt u ul var
""".split())

SVG_TAG_ADJUST = {
    "altglyph": "altGlyph", "altglyphdef": "altGlyphDef",
    "altglyphitem": "altGlyphItem", "animatecolor": "animateColor",
    "animatemotion": "animateMotion", "animatetransform": "animateTransform",
    "clippath": "clipPath", "feblend": "feBlend",
    "fecolormatrix": "feColorMatrix",
    "fecomponenttransfer": "feComponentTransfer", "fecomposite": "feComposite",
    "feconvolvematrix": "feConvolveMatrix",
    "fediffuselighting": "feDiffuseLighting",
    "fedisplacementmap": "feDisplacementMap",
    "fedistantlight": "feDistantLight", "fedropshadow": "feDropShadow",
    "feflood": "feFlood", "fefunca": "feFuncA", "fefuncb": "feFuncB",
    "fefuncg": "feFuncG", "fefuncr": "feFuncR",
    "fegaussianblur": "feGaussianBlur", "feimage": "feImage",
    "femerge": "feMerge", "femergenode": "feMergeNode",
    "femorphology": "feMorphology", "feoffset": "feOffset",
    "fepointlight": "fePointLight",
    "fespecularlighting": "feSpecularLighting", "fespotlight": "feSpotLight",
    "fetile": "feTile", "feturbulence": "feTurbulence",
    "foreignobject": "foreignObject", "glyphref": "glyphRef",
    "lineargradient": "linearGradient", "radialgradient": "radialGradient",
    "textpath": "textPath",
}

SVG_ATTR_ADJUST = {
    "attributename": "attributeName", "attributetype": "attributeType",
    "basefrequency": "baseFrequency", "baseprofile": "baseProfile",
    "calcmode": "calcMode", "clippathunits": "clipPathUnits",
    "diffuseconstant": "diffuseConstant", "edgemode": "edgeMode",
    "filterunits": "filterUnits", "glyphref": "glyphRef",
    "gradienttransform": "gradientTransform", "gradientunits": "gradientUnits",
    "kernelmatrix": "kernelMatrix", "kernelunitlength": "kernelUnitLength",
    "keypoints": "keyPoints", "keysplines": "keySplines",
    "keytimes": "keyTimes", "lengthadjust": "lengthAdjust",
    "limitingconeangle": "limitingConeAngle", "markerheight": "markerHeight",
    "markerunits": "markerUnits", "markerwidth": "markerWidth",
    "maskcontentunits": "maskContentUnits", "maskunits": "maskUnits",
    "numoctaves": "numOctaves", "pathlength": "pathLength",
    "patterncontentunits": "patternContentUnits",
    "patterntransform": "patternTransform", "patternunits": "patternUnits",
    "pointsatx": "pointsAtX", "pointsaty": "pointsAtY",
    "pointsatz": "pointsAtZ", "preservealpha": "preserveAlpha",
    "preserveaspectratio": "preserveAspectRatio",
    "primitiveunits": "primitiveUnits", "refx": "refX", "refy": "refY",
    "repeatcount": "repeatCount", "repeatdur": "repeatDur",
    "requiredextensions": "requiredExtensions",
    "requiredfeatures": "requiredFeatures",
    "specularconstant": "specularConstant",
    "specularexponent": "specularExponent", "spreadmethod": "spreadMethod",
    "startoffset": "startOffset", "stddeviation": "stdDeviation",
    "stitchtiles": "stitchTiles", "surfacescale": "surfaceScale",
    "systemlanguage": "systemLanguage", "tablevalues": "tableValues",
    "targetx": "targetX", "targety": "targetY", "textlength": "textLength",
    "viewbox": "viewBox", "viewtarget": "viewTarget",
    "xchannelselector": "xChannelSelector",
    "ychannelselector": "yChannelSelector", "zoomandpan": "zoomAndPan",
}

# quirks-mode classification data (spec §13.2.6.4.1; reference
# Sources/HTMLParser.m:172-305)
QUIRKY_PUBLIC_EXACT = frozenset([
    "-//w3o//dtd w3 html strict 3.0//en//",
    "-/w3c/dtd html 4.0 transitional/en",
    "html",
])
QUIRKY_SYSTEM_EXACT = frozenset([
    "http://www.ibm.com/data/dtd/v11/ibmxhtml1-transitional.dtd",
])
QUIRKY_PUBLIC_PREFIXES = tuple(p.lower() for p in [
    "+//Silmaril//dtd html Pro v0r11 19970101//",
    "-//AS//DTD HTML 3.0 asWedit + extensions//",
    "-//AdvaSoft Ltd//DTD HTML 3.0 asWedit + extensions//",
    "-//IETF//DTD HTML 2.0 Level 1//",
    "-//IETF//DTD HTML 2.0 Level 2//",
    "-//IETF//DTD HTML 2.0 Strict Level 1//",
    "-//IETF//DTD HTML 2.0 Strict Level 2//",
    "-//IETF//DTD HTML 2.0 Strict//",
    "-//IETF//DTD HTML 2.0//",
    "-//IETF//DTD HTML 2.1E//",
    "-//IETF//DTD HTML 3.0//",
    "-//IETF//DTD HTML 3.2 Final//",
    "-//IETF//DTD HTML 3.2//",
    "-//IETF//DTD HTML 3//",
    "-//IETF//DTD HTML Level 0//",
    "-//IETF//DTD HTML Level 1//",
    "-//IETF//DTD HTML Level 2//",
    "-//IETF//DTD HTML Level 3//",
    "-//IETF//DTD HTML Strict Level 0//",
    "-//IETF//DTD HTML Strict Level 1//",
    "-//IETF//DTD HTML Strict Level 2//",
    "-//IETF//DTD HTML Strict Level 3//",
    "-//IETF//DTD HTML Strict//",
    "-//IETF//DTD HTML//",
    "-//Metrius//DTD Metrius Presentational//",
    "-//Microsoft//DTD Internet Explorer 2.0 HTML Strict//",
    "-//Microsoft//DTD Internet Explorer 2.0 HTML//",
    "-//Microsoft//DTD Internet Explorer 2.0 Tables//",
    "-//Microsoft//DTD Internet Explorer 3.0 HTML Strict//",
    "-//Microsoft//DTD Internet Explorer 3.0 HTML//",
    "-//Microsoft//DTD Internet Explorer 3.0 Tables//",
    "-//Netscape Comm. Corp.//DTD HTML//",
    "-//Netscape Comm. Corp.//DTD Strict HTML//",
    "-//O'Reilly and Associates//DTD HTML 2.0//",
    "-//O'Reilly and Associates//DTD HTML Extended 1.0//",
    "-//O'Reilly and Associates//DTD HTML Extended Relaxed 1.0//",
    "-//SQ//DTD HTML 2.0 HoTMetaL + extensions//",
    "-//SoftQuad Software//DTD HoTMetaL PRO 6.0::19990601::extensions to HTML 4.0//",
    "-//SoftQuad//DTD HoTMetaL PRO 4.0::19971010::extensions to HTML 4.0//",
    "-//Spyglass//DTD HTML 2.0 Extended//",
    "-//Sun Microsystems Corp.//DTD HotJava HTML//",
    "-//Sun Microsystems Corp.//DTD HotJava Strict HTML//",
    "-//W3C//DTD HTML 3 1995-03-24//",
    "-//W3C//DTD HTML 3.2 Draft//",
    "-//W3C//DTD HTML 3.2 Final//",
    "-//W3C//DTD HTML 3.2//",
    "-//W3C//DTD HTML 3.2S Draft//",
    "-//W3C//DTD HTML 4.0 Frameset//",
    "-//W3C//DTD HTML 4.0 Transitional//",
    "-//W3C//DTD HTML Experimental 19960712//",
    "-//W3C//DTD HTML Experimental 970421//",
    "-//W3C//DTD W3 HTML//",
    "-//W3O//DTD W3 HTML 3.0//",
    "-//WebTechs//DTD Mozilla HTML 2.0//",
    "-//WebTechs//DTD Mozilla HTML//",
])
QUIRKY_IF_NO_SYSTEM_PREFIXES = tuple(p.lower() for p in [
    "-//W3C//DTD HTML 4.01 Frameset//",
    "-//W3C//DTD HTML 4.01 Transitional//",
])
LIMITED_QUIRKS_PREFIXES = tuple(p.lower() for p in [
    "-//W3C//DTD XHTML 1.0 Frameset//",
    "-//W3C//DTD XHTML 1.0 Transitional//",
])
