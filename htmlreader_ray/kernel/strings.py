"""String primitives shared by the HTML5 kernel.

Re-derives the semantics of the reference's string helpers
(/root/reference/Sources/HTMLString.m:49-95 — HTML whitespace set and
disallowed code points) on top of native Python ``str`` (which is already
code-point indexed, so the UTF-32 helpers in HTMLString.m:7-47 are free).
"""

from __future__ import annotations

# The HTML spec's "ASCII whitespace": TAB LF FF CR SPACE
# (reference: is_whitespace, Sources/HTMLString.m:49-52).
WHITESPACE = "\t\n\x0c\r "
WHITESPACE_SET = frozenset(WHITESPACE)

ASCII_ALPHA = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
)
ASCII_DIGITS = frozenset("0123456789")
ASCII_ALNUM = ASCII_ALPHA | ASCII_DIGITS
ASCII_HEX = ASCII_DIGITS | frozenset("abcdefABCDEF")

_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"
_ASCII_FOLD = str.maketrans(_ASCII_UPPER, _ASCII_LOWER)


def ascii_lower(s: str) -> str:
    """ASCII-only case fold (spec: tag/attr names fold only A-Z).

    Mirrors the per-char +0x20 folds in the reference tokenizer
    (Sources/HTMLTokenizer.m:193-201).
    """
    return s.translate(_ASCII_FOLD)


def is_surrogate(cp: int) -> bool:
    return 0xD800 <= cp <= 0xDFFF


def is_noncharacter(cp: int) -> bool:
    return (0xFDD0 <= cp <= 0xFDEF) or ((cp & 0xFFFE) == 0xFFFE and cp <= 0x10FFFF)


def is_disallowed_control(cp: int) -> bool:
    """Controls that are parse errors in the input stream (spec §13.2.3.5)."""
    if cp in (0x09, 0x0A, 0x0C, 0x0D, 0x20, 0x00):
        return False
    return (0x00 <= cp <= 0x1F) or (0x7F <= cp <= 0x9F)


# Input-stream parse errors (spec §13.2.3.2): controls other than ASCII
# whitespace and NUL, surrogates, and noncharacters each flag one error per
# occurrence. One vectorized scan; NUL is excluded here because the tokenizer
# reports unexpected-null-character contextually.
_NONCHAR_ASTRAL = "".join(
    chr(0x10000 * plane + cp)
    for plane in range(0x11) for cp in (0xFFFE, 0xFFFF)
    if 0x10000 * plane + cp <= 0x10FFFF
)
import re as _re
_INPUT_ERR_RE = _re.compile(
    "[\x01-\x08\x0b\x0e-\x1f\x7f-\x9f"
    "\ud800-\udfff\ufdd0-\ufdef"
    + _re.escape(_NONCHAR_ASTRAL) + "]"
)


def input_stream_errors(s: str) -> list[str]:
    """Error codes for disallowed code points in an (already newline-
    normalized) input stream, one per occurrence, in document order."""
    out: list[str] = []
    for ch in _INPUT_ERR_RE.findall(s):
        cp = ord(ch)
        if 0xD800 <= cp <= 0xDFFF:
            out.append("surrogate-in-input-stream")
        elif is_noncharacter(cp):
            out.append("noncharacter-in-input-stream")
        else:
            out.append("control-character-in-input-stream")
    return out


def preprocess_input(s: str) -> str:
    """Normalize newlines per the spec input-stream preprocessor.

    CRLF -> LF, lone CR -> LF (reference:
    Sources/HTMLPreprocessedInputStream.m:104-155). Vectorized via str.replace
    rather than per-code-point scanning.
    """
    if "\r" in s:
        s = s.replace("\r\n", "\n").replace("\r", "\n")
    return s
