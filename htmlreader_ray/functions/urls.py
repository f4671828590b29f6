"""URL normalization for web-corpus curation (link graphs, host-level
caps, URL dedup).

The canonical form implemented here is the common crawl-curation subset:
lowercase the scheme and host, strip the scheme's default port (:80 for
http, :443 for https), drop the fragment, and strip a bare trailing "?".
Path, query content and their case are preserved (they are
case-significant per RFC 3986). Relative references pass through
unchanged — link-graph builders keep them for site-internal edges.

Everything is vectorized with pyarrow.compute: one extract_regex splits
(scheme, host, port, rest) for the whole column, the recombination is
arrow string kernels, and non-absolute rows fall back to the input via
one if_else. No per-row Python in the batch path.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# scheme://host[:port][rest-without-fragment][#fragment]
_URL_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
           r"(?P<host>[^/:?#]+)(?::(?P<port>[0-9]+))?"
           r"(?P<rest>[^#]*)(?:#(?:.|\n)*)?$")

_DEFAULT_PORTS = {"http": "80", "https": "443", "ws": "80", "wss": "443",
                  "ftp": "21"}


def normalize_url_column(col) -> "pa.Array":
    """String array of URLs -> string array of canonical URLs.

    Absolute URLs are normalized as documented above; anything that does
    not match the absolute-URL shape (relative refs, mailto:, empty)
    is returned unchanged.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parts = pc.extract_regex(col, pattern=_URL_RE)
    is_abs = parts.is_valid()
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    port = pc.struct_field(parts, "port")
    rest = pc.fill_null(pc.struct_field(parts, "rest"), "")
    # drop a bare trailing "?" (empty query)
    rest = pc.replace_substring_regex(rest, pattern=r"\?$", replacement="")

    # default-port strip: port kept only when present AND != default(scheme).
    # extract_regex yields "" (not null) for a non-participating optional
    # group, so absence is the empty string.
    keep = pc.and_(port.is_valid(), pc.not_equal(pc.fill_null(port, ""), ""))
    for s, p in _DEFAULT_PORTS.items():
        is_default = pc.and_(pc.equal(scheme, s), pc.equal(port, p))
        keep = pc.and_(keep, pc.invert(pc.fill_null(is_default, False)))
    port_part = pc.if_else(
        keep,
        pc.binary_join_element_wise(":", pc.fill_null(port, ""), ""),
        "")

    norm = pc.binary_join_element_wise(
        scheme, "://", host, port_part, rest, "",
        null_handling="replace", null_replacement="")
    return pc.if_else(is_abs, norm, pc.fill_null(col, ""))


def url_host_column(col) -> "pa.Array":
    """String array of URLs -> lowercase host ('' for non-absolute)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parts = pc.extract_regex(col, pattern=_URL_RE)
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    return pc.fill_null(host, "")


def normalize_url(url: str) -> str:
    """Scalar convenience wrapper (tests / small sides)."""
    return normalize_url_column(pa.array([url], pa.string()))[0].as_py()
