"""Minimal WARC/1.0 source for web-corpus pipelines.

WARC is the interchange format of web crawls (ISO 28500; what Common
Crawl ships). This module implements the subset a curation pipeline
needs — response records with an HTTP envelope — as:

* ``warc_record_bytes`` / ``write_warc`` — a deterministic writer, used
  by tests and by the synthetic round-trip query (no crawler here).
* ``records_table`` — one WARC file's bytes -> an Arrow table
  ``(uri, date, status, content_type, payload)`` with the payload kept
  as raw ``binary`` (decoding is a SEPARATE stage through the kernel's
  encoding sniffer, so the Content-Type charset / BOM / <meta charset>
  precedence matches the reference's
  ``documentWithData:contentTypeHeader:`` exactly —
  reference: Sources/HTMLParser.m:3300-3360, kernel/encoding.py).
* ``read_warc`` — paths -> ``ray.data.Dataset``: a
  ``read_binary_files`` scan fanned out per file, each file parsed
  inside ``map_batches`` (files are the parallelism unit, exactly like
  Common Crawl's 1 GB segment files; one task never holds more than
  one file's records).
* ``DecodeHtml`` — actor-pool stage: payload binary + content_type ->
  ``html`` string via ``sniff_encoding``/``decode_bytes``.

Record grammar handled: ``WARC/1.0\\r\\n`` header lines up to a blank
line, a content block of exactly ``Content-Length`` bytes, then the
mandatory ``\\r\\n\\r\\n`` separator. Unknown record types (warcinfo,
request, metadata) are skipped; response records carry an HTTP head
whose status line and headers are split from the payload at the first
``\\r\\n\\r\\n``.
"""

from __future__ import annotations

from typing import Iterable, Optional

import pyarrow as pa

_CRLF2 = b"\r\n\r\n"


# ------------------------------------------------------------------ write

def warc_record_bytes(uri: str, date: str, payload: bytes, *,
                      status: int = 200,
                      content_type: str = "text/html; charset=utf-8",
                      record_id: Optional[str] = None) -> bytes:
    """One WARC/1.0 response record with an HTTP/1.1 envelope."""
    for name, v in (("uri", uri), ("date", date),
                    ("content_type", content_type)):
        if "\r" in v or "\n" in v:
            raise ValueError(f"CR/LF in WARC {name} field (header "
                             f"injection would corrupt record framing)")
    http_head = (f"HTTP/1.1 {status} OK\r\n"
                 f"Content-Type: {content_type}\r\n"
                 f"Content-Length: {len(payload)}\r\n\r\n").encode("ascii")
    block = http_head + payload
    rid = record_id or f"urn:x-graft:{abs(hash((uri, date))) % 10**12}"
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Record-ID: <{rid}>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"WARC-Date: {date}\r\n"
            f"Content-Type: application/http;msgtype=response\r\n"
            f"Content-Length: {len(block)}\r\n\r\n").encode("ascii")
    return head + block + _CRLF2


def write_warc(path: str, records: Iterable[dict]) -> int:
    """Write records (dicts with uri/date/payload[/status/content_type])
    to one WARC file; returns the record count."""
    n = 0
    with open(path, "wb") as f:
        for r in records:
            f.write(warc_record_bytes(
                r["uri"], r["date"], r["payload"],
                status=r.get("status", 200),
                content_type=r.get("content_type",
                                   "text/html; charset=utf-8")))
            n += 1
    return n


# ------------------------------------------------------------------ parse

def _parse_headers(block: bytes) -> dict:
    out = {}
    for line in block.split(b"\r\n"):
        i = line.find(b":")
        if i > 0:
            out[line[:i].strip().lower().decode("latin-1")] = \
                line[i + 1:].strip().decode("latin-1")
    return out


def iter_warc_records(data: bytes):
    """Yield (warc_headers, http_status, http_headers, payload) per
    response record; skips non-response records. Tolerates a missing
    trailing separator at EOF."""
    pos, n = 0, len(data)
    while pos < n:
        if data.startswith(b"\r\n", pos):     # stray separator remnants
            pos += 2
            continue
        if not data.startswith(b"WARC/", pos):
            break                              # not a record boundary
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            break
        headers = _parse_headers(data[pos:hdr_end])
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break                              # unrecoverable framing
        block = data[hdr_end + 4:hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        if data.startswith(_CRLF2, pos):
            pos += 4
        if headers.get("warc-type") != "response":
            continue
        http_end = block.find(_CRLF2)
        if http_end < 0:
            status, http_headers, payload = 0, {}, block
        else:
            head = block[:http_end]
            line0 = head.split(b"\r\n", 1)[0].split(b" ")
            try:
                status = int(line0[1])
            except (IndexError, ValueError):
                status = 0
            http_headers = _parse_headers(head)
            payload = block[http_end + 4:]
        yield headers, status, http_headers, payload


def records_table(data: bytes) -> pa.Table:
    """One WARC file's bytes -> (uri, date, status, content_type,
    payload) Arrow table. Payload stays binary; decode downstream."""
    uris, dates, stats, ctypes, payloads = [], [], [], [], []
    for wh, status, hh, payload in iter_warc_records(data):
        uris.append(wh.get("warc-target-uri", ""))
        dates.append(wh.get("warc-date", ""))
        stats.append(status)
        ctypes.append(hh.get("content-type", ""))
        payloads.append(payload)
    return pa.Table.from_arrays(
        [pa.array(uris, pa.string()), pa.array(dates, pa.string()),
         pa.array(stats, pa.int32()), pa.array(ctypes, pa.string()),
         pa.array(payloads, pa.binary())],
        names=["uri", "date", "status", "content_type", "payload"])


def read_warc(paths, **read_kwargs):
    """WARC file paths -> Dataset(uri, date, status, content_type,
    payload). One task per file (the WARC segment is the natural
    parallelism unit at crawl scale); ``read_kwargs`` pass through to
    ``ray.data.read_binary_files`` (e.g. ``override_num_blocks``)."""
    import ray.data

    raw = ray.data.read_binary_files(paths, **read_kwargs)

    def parse_files(batch: pa.Table) -> pa.Table:
        tables = [records_table(b.as_py())
                  for b in batch.column("bytes")]
        tables = [t for t in tables if t.num_rows]
        if not tables:
            return records_table(b"")
        return pa.concat_tables(tables)

    return raw.map_batches(parse_files, batch_format="pyarrow")


class DecodeHtml:
    """Actor-pool stage: (payload binary, content_type) -> html string
    through the kernel encoding sniffer — BOM, Content-Type charset and
    <meta charset> precedence identical to parse_bytes (S4/S5/M6)."""

    def __init__(self, payload_col: str = "payload",
                 ctype_col: str = "content_type",
                 out_col: str = "html") -> None:
        from ..kernel.encoding import decode_bytes, sniff_encoding
        self._sniff = sniff_encoding
        self._decode = decode_bytes
        self.payload_col, self.ctype_col = payload_col, ctype_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        ctypes = batch.column(self.ctype_col).to_pylist()
        htmls = []
        for p, ct in zip(payloads, ctypes):
            s = self._sniff(p or b"", ct or None)
            htmls.append(self._decode(p or b"", s.encoding))
        return batch.append_column(self.out_col,
                                   pa.array(htmls, pa.string()))
