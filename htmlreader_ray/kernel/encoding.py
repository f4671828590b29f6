"""Encoding sniffing + WHATWG label tables.

Re-derivation of the reference's encoding layer
(/root/reference/Sources/HTMLEncoding.m:19-116 sniffer, 124-344 label table):
BOM -> Content-Type charset= -> windows-1252 lossy fallback, returning
(encoding, confidence). The label table is public WHATWG spec data mapped to
Python codec names; loaded once per worker process at import time
(SURVEY.md §2.4).
"""

from __future__ import annotations

import codecs
from typing import NamedTuple, Optional

TENTATIVE = "tentative"
CERTAIN = "certain"
IRRELEVANT = "irrelevant"


class SniffResult(NamedTuple):
    encoding: str       # python codec name
    label: str          # whatwg canonical name
    confidence: str


# WHATWG encoding labels -> (whatwg name, python codec). Public spec data.
_L = {}


def _add(python_codec: str, whatwg_name: str, *labels: str) -> None:
    for label in labels + (whatwg_name,):
        _L[label.lower()] = (whatwg_name, python_codec)


_add("utf-8", "UTF-8", "unicode-1-1-utf-8", "utf8", "unicode11utf8",
     "unicode20utf8", "x-unicode20utf8")
_add("ibm866", "IBM866", "866", "cp866", "csibm866")
_add("iso8859-2", "ISO-8859-2", "csisolatin2", "iso-ir-101", "iso8859-2",
     "iso88592", "iso_8859-2", "iso_8859-2:1987", "l2", "latin2")
_add("iso8859-3", "ISO-8859-3", "csisolatin3", "iso-ir-109", "iso88593",
     "iso_8859-3", "iso_8859-3:1988", "l3", "latin3")
_add("iso8859-4", "ISO-8859-4", "csisolatin4", "iso-ir-110", "iso88594",
     "iso_8859-4", "iso_8859-4:1988", "l4", "latin4")
_add("iso8859-5", "ISO-8859-5", "csisolatincyrillic", "cyrillic",
     "iso-ir-144", "iso88595", "iso_8859-5", "iso_8859-5:1988")
_add("iso8859-6", "ISO-8859-6", "arabic", "asmo-708", "csiso88596e",
     "csiso88596i", "csisolatinarabic", "ecma-114", "iso-8859-6-e",
     "iso-8859-6-i", "iso-ir-127", "iso88596", "iso_8859-6",
     "iso_8859-6:1987")
_add("iso8859-7", "ISO-8859-7", "csisolatingreek", "ecma-118", "elot_928",
     "greek", "greek8", "iso-ir-126", "iso88597", "iso_8859-7",
     "iso_8859-7:1987", "sun_eu_greek")
_add("iso8859-8", "ISO-8859-8", "csiso88598e", "csisolatinhebrew", "hebrew",
     "iso-8859-8-e", "iso-ir-138", "iso88598", "iso_8859-8",
     "iso_8859-8:1988", "visual")
_add("iso8859-8", "ISO-8859-8-I", "csiso88598i", "iso-8859-8-i", "logical")
_add("iso8859-10", "ISO-8859-10", "csisolatin6", "iso-ir-157", "iso885910",
     "l6", "latin6")
_add("iso8859-13", "ISO-8859-13", "iso885913")
_add("iso8859-14", "ISO-8859-14", "iso885914")
_add("iso8859-15", "ISO-8859-15", "csisolatin9", "iso885915", "iso_8859-15",
     "l9")
_add("iso8859-16", "ISO-8859-16")
_add("koi8-r", "KOI8-R", "cskoi8r", "koi", "koi8", "koi8_r")
_add("koi8-u", "KOI8-U", "koi8-ru")
_add("mac-roman", "macintosh", "csmacintosh", "mac", "x-mac-roman")
_add("cp874", "windows-874", "dos-874", "iso-8859-11", "iso8859-11",
     "iso885911", "tis-620")
_add("cp1250", "windows-1250", "x-cp1250")
_add("cp1251", "windows-1251", "x-cp1251")
_add("cp1252", "windows-1252", "ansi_x3.4-1968", "ascii", "cp1252", "cp819",
     "csisolatin1", "ibm819", "iso-8859-1", "iso-ir-100", "iso8859-1",
     "iso88591", "iso_8859-1", "iso_8859-1:1987", "l1", "latin1",
     "us-ascii", "x-cp1252")
_add("cp1253", "windows-1253", "x-cp1253")
_add("cp1254", "windows-1254", "cp1254", "csisolatin5", "iso-8859-9",
     "iso-ir-148", "iso8859-9", "iso88599", "iso_8859-9", "iso_8859-9:1989",
     "l5", "latin5", "x-cp1254")
_add("cp1255", "windows-1255", "x-cp1255")
_add("cp1256", "windows-1256", "x-cp1256")
_add("cp1257", "windows-1257", "x-cp1257")
_add("cp1258", "windows-1258", "x-cp1258")
_add("mac-cyrillic", "x-mac-cyrillic", "x-mac-ukrainian")
_add("gbk", "GBK", "chinese", "csgb2312", "csiso58gb231280", "gb2312",
     "gb_2312", "gb_2312-80", "iso-ir-58", "x-gbk")
_add("gb18030", "gb18030")
_add("big5", "Big5", "big5-hkscs", "cn-big5", "csbig5", "x-x-big5")
_add("euc_jp", "EUC-JP", "cseucpkdfmtjapanese", "x-euc-jp")
_add("iso2022_jp", "ISO-2022-JP", "csiso2022jp")
_add("shift_jis", "Shift_JIS", "csshiftjis", "ms932", "ms_kanji", "sjis",
     "windows-31j", "x-sjis")
_add("euc_kr", "EUC-KR", "cseuckr", "csksc56011987", "iso-ir-149", "korean",
     "ks_c_5601-1987", "ks_c_5601-1989", "ksc5601", "ksc_5601",
     "windows-949")
_add("utf-16-be", "UTF-16BE", "unicodefffe")
_add("utf-16-le", "UTF-16LE", "csunicode", "iso-10646-ucs-2", "ucs-2",
     "unicode", "unicodefeff", "utf-16")
# x-user-defined and replacement handled specially
_L["x-user-defined"] = ("x-user-defined", "x-user-defined")
for _lbl in ("csiso2022kr", "hz-gb-2312", "iso-2022-cn", "iso-2022-cn-ext",
             "iso-2022-kr", "replacement"):
    _L[_lbl] = ("replacement", "replacement")


def encoding_for_label(label: str) -> Optional[tuple[str, str]]:
    """WHATWG label -> (whatwg canonical name, python codec name), or None.
    Mirrors HTMLStringEncodingForLabel
    (/root/reference/Sources/HTMLEncoding.m:433-442): strip ASCII whitespace,
    case-insensitive."""
    return _L.get(label.strip("\t\n\x0c\r ").lower())


def _decode_x_user_defined(data: bytes) -> str:
    return "".join(chr(b) if b < 0x80 else chr(0xF780 + b - 0x80) for b in data)


def decode_bytes(data: bytes, python_codec: str) -> str:
    """Decode, skipping a leading BOM for the UTF family and never raising
    (lossy windows-1252-style fallback like
    /root/reference/Sources/HTMLEncoding.m:96-115)."""
    if python_codec == "x-user-defined":
        return _decode_x_user_defined(data)
    if python_codec == "replacement":
        return "�" if data else ""
    if python_codec == "utf-8" and data.startswith(codecs.BOM_UTF8):
        data = data[len(codecs.BOM_UTF8):]
    elif python_codec == "utf-16-le" and data.startswith(codecs.BOM_UTF16_LE):
        data = data[2:]
    elif python_codec == "utf-16-be" and data.startswith(codecs.BOM_UTF16_BE):
        data = data[2:]
    try:
        return data.decode(python_codec, errors="replace")
    except LookupError:
        return data.decode("cp1252", errors="replace")


def _charset_from_content_type(content_type: str) -> Optional[str]:
    low = content_type.lower()
    idx = low.find("charset=")
    if idx == -1:
        return None
    val = content_type[idx + 8:].strip()
    if val[:1] in "\"'":
        q = val[0]
        end = val.find(q, 1)
        val = val[1:end] if end != -1 else val[1:]
    else:
        val = val.split(";")[0].strip()
    return val or None


def sniff_encoding(data: bytes, content_type: Optional[str] = None) -> SniffResult:
    """BOM -> Content-Type charset -> windows-1252 fallback
    (reference: DeterminedStringEncodingForData,
    /root/reference/Sources/HTMLEncoding.m:19-116)."""
    if data.startswith(codecs.BOM_UTF8):
        return SniffResult("utf-8", "UTF-8", CERTAIN)
    if data.startswith(codecs.BOM_UTF16_BE):
        return SniffResult("utf-16-be", "UTF-16BE", CERTAIN)
    if data.startswith(codecs.BOM_UTF16_LE):
        return SniffResult("utf-16-le", "UTF-16LE", CERTAIN)
    if content_type:
        label = _charset_from_content_type(content_type)
        if label:
            hit = encoding_for_label(label)
            if hit is not None:
                name, codec = hit
                return SniffResult(codec, name, CERTAIN)
    return SniffResult("cp1252", "windows-1252", TENTATIVE)


def normalize_meta_encoding(label: str) -> Optional[tuple[str, str]]:
    """Per spec, a <meta charset> naming UTF-16 is treated as UTF-8;
    x-user-defined becomes windows-1252
    (reference: -changeEncoding:, /root/reference/Sources/HTMLParser.m:517-542)."""
    hit = encoding_for_label(label)
    if hit is None:
        return None
    name, codec = hit
    if name in ("UTF-16BE", "UTF-16LE"):
        return ("UTF-8", "utf-8")
    if name == "x-user-defined":
        return ("windows-1252", "cp1252")
    return (name, codec)
