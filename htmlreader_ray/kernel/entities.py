"""Character-reference decoding + HTML escape/unescape scalar functions.

Semantics mirror the reference's entity machinery:
- named entities with and without trailing ';', longest-prefix match
  (/root/reference/Sources/HTMLEntities.m:79-2206,2207-2315,2328-2361)
- numeric references with the windows-1252 override table, surrogate /
  out-of-range -> U+FFFD (/root/reference/Sources/HTMLTokenizer.m:2244-2333)
- scalar escape/unescape (/root/reference/Sources/NSString+HTMLEntities.m:13-118)

The table itself is public WHATWG spec data and ships in the Python stdlib as
``html.entities.html5`` (2231 entries, keys with and without ';'), so no
generated table module is needed.
"""

from __future__ import annotations

import re
from html.entities import html5 as _HTML5_ENTITIES

from .strings import ASCII_ALNUM, ASCII_DIGITS, ASCII_HEX

# Longest entity name including the ';' (reference: LongestEntityNameLength=32,
# Sources/HTMLEntities.m:2316). Derived, not hardcoded.
MAX_ENTITY_LEN = max(len(k) for k in _HTML5_ENTITIES)

# Numeric-reference override table for C1 controls (WHATWG spec table; the
# reference's Win1252ExtensionReplacements, Sources/HTMLEntities.m:13-60).
WIN1252_OVERRIDES = {
    0x00: 0xFFFD,
    0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E, 0x85: 0x2026,
    0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6, 0x89: 0x2030, 0x8A: 0x0160,
    0x8B: 0x2039, 0x8C: 0x0152, 0x8E: 0x017D, 0x91: 0x2018, 0x92: 0x2019,
    0x93: 0x201C, 0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014,
    0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A, 0x9C: 0x0153,
    0x9E: 0x017E, 0x9F: 0x0178,
}

import re as _re

# Longest semicolonless legacy name ("CounterClockwise..." style names all
# end in ';'; the 106 legacy ones are short).
_MAX_BARE_LEN = max(len(k) for k in _HTML5_ENTITIES if not k.endswith(";"))
_NAME_RUN_RE = _re.compile(r"[a-zA-Z0-9]+")


def _numeric_codepoint_to_char(cp: int) -> str:
    if cp in WIN1252_OVERRIDES:
        return chr(WIN1252_OVERRIDES[cp])
    if cp > 0x10FFFF or (0xD800 <= cp <= 0xDFFF):
        return "�"
    return chr(cp)


def consume_character_reference(
    s: str, pos: int, *, in_attribute: bool,
    additional_allowed: str | None = None, on_error=None
):
    """Decode a character reference at ``s[pos]`` where ``s[pos] == '&'``.

    Returns ``(decoded_text, new_pos)``. When no reference is decoded, returns
    ``("&", pos + 1)`` i.e. the ampersand passes through literally.

    Implements the spec's "consume a character reference", including the
    attribute-context suppression: a named match without ';' followed by '='
    or an alphanumeric is NOT decoded in attributes
    (reference: Sources/HTMLTokenizer.m:2286-2305). ``on_error`` (a
    callable taking a spec error code) receives the character-reference
    parse errors when supplied.
    """
    n = len(s)
    i = pos + 1
    if i >= n:
        return "&", pos + 1
    c = s[i]
    if c in "\t\n\x0c <&" or (additional_allowed is not None and c == additional_allowed):
        return "&", pos + 1
    if c == "#":
        j = i + 1
        is_hex = False
        if j < n and s[j] in "xX":
            is_hex = True
            j += 1
        k = j
        digits = ASCII_HEX if is_hex else ASCII_DIGITS
        while k < n and s[k] in digits:
            k += 1
        if k == j:
            # no digits: not a character reference
            if on_error is not None:
                on_error("absence-of-digits-in-numeric-character-reference")
            return "&", pos + 1
        cp = int(s[j:k], 16 if is_hex else 10)
        if k < n and s[k] == ";":
            k += 1
        elif on_error is not None:
            on_error("missing-semicolon-after-character-reference")
        if on_error is not None:
            if cp == 0:
                on_error("null-character-reference")
            elif cp > 0x10FFFF:
                on_error("character-reference-outside-unicode-range")
            elif 0xD800 <= cp <= 0xDFFF:
                on_error("surrogate-character-reference")
            elif (0xFDD0 <= cp <= 0xFDEF) or (cp & 0xFFFE) == 0xFFFE:
                on_error("noncharacter-character-reference")
            elif cp == 0x0D or ((cp <= 0x1F or 0x7F <= cp <= 0x9F)
                                and cp not in (0x09, 0x0A, 0x0C, 0x20)):
                # spec: 0x0D, or a C0/C1 control that is not ASCII
                # whitespace (the WIN1252 remap still applies to the
                # decoded VALUE; the error reports the reference)
                on_error("control-character-reference")
        return _numeric_codepoint_to_char(cp), k
    # Named reference: dict lookups on the alphanumeric run (exact name+';'
    # first, then longest semicolonless legacy prefix).
    m = _NAME_RUN_RE.match(s, i)
    if m is None:
        return "&", pos + 1
    run = m.group()
    end_run = m.end()
    if end_run < n and s[end_run] == ";":
        hit = _HTML5_ENTITIES.get(run + ";")
        if hit is not None:
            return hit, end_run + 1
    for L in range(min(len(run), _MAX_BARE_LEN), 0, -1):
        hit = _HTML5_ENTITIES.get(run[:L])
        if hit is not None:
            end = i + L
            if in_attribute:
                # suppressed when followed by '=' or an alphanumeric
                if L < len(run) or (end < n and s[end] == "="):
                    return "&", pos + 1
            if on_error is not None:
                on_error("missing-semicolon-after-character-reference")
            return hit, end
    if on_error is not None and end_run < n and s[end_run] == ";":
        # an alphanumeric run directly followed by ';' that matched nothing
        on_error("unknown-named-character-reference")
    return "&", pos + 1


# --- scalar escape/unescape (M16/M17) -------------------------------------

def html_escape(s: str) -> str:
    """Escape ``& NBSP " < >`` exactly like -[NSString html_stringByEscapingForHTML]
    (/root/reference/Sources/NSString+HTMLEntities.m:13-25)."""
    return (
        s.replace("&", "&amp;")
        .replace("\xa0", "&nbsp;")
        .replace('"', "&quot;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
    )


_AMP_RE = re.compile(r"&")


def html_unescape(s: str) -> str:
    """Decode all character references in ``s`` (non-attribute context),
    mirroring -[NSString html_stringByUnescapingHTML]
    (/root/reference/Sources/NSString+HTMLEntities.m:27-118)."""
    if "&" not in s:
        return s
    out: list[str] = []
    pos = 0
    n = len(s)
    while True:
        amp = s.find("&", pos)
        if amp == -1:
            out.append(s[pos:])
            break
        out.append(s[pos:amp])
        decoded, new_pos = consume_character_reference(s, amp, in_attribute=False)
        out.append(decoded)
        pos = new_pos
    return "".join(out)
