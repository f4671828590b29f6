"""WARC source (sources/warc.py): framing, record filtering, charset
precedence through the kernel sniffer, and the Dataset read path."""

import codecs

import pyarrow as pa

from htmlreader_ray.sources.warc import (DecodeHtml, iter_warc_records,
                                         read_warc, records_table,
                                         warc_record_bytes, write_warc)


def _rec(uri="https://h.example.com/x", date="2026-01-01T00:00:00Z",
         payload=b"<p>hi", **kw):
    return warc_record_bytes(uri, date, payload, **kw)


def test_roundtrip_single_record():
    t = records_table(_rec(payload=b"<p>hello"))
    assert t.num_rows == 1
    assert t.column("uri")[0].as_py() == "https://h.example.com/x"
    assert t.column("status")[0].as_py() == 200
    assert t.column("payload")[0].as_py() == b"<p>hello"
    assert t.column("content_type")[0].as_py() == \
        "text/html; charset=utf-8"


def test_multiple_records_and_binary_payload():
    # payloads may contain \r\n\r\n — framing is length-based, not
    # delimiter-based
    tricky = b"a\r\n\r\nWARC/1.0\r\nb"
    data = _rec(payload=tricky) + _rec(uri="u2", payload=b"x" * 10000)
    t = records_table(data)
    assert t.num_rows == 2
    assert t.column("payload")[0].as_py() == tricky
    assert t.column("payload")[1].as_py() == b"x" * 10000


def test_non_response_records_skipped():
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n"
            b"\r\nabcd\r\n\r\n")
    data = info + _rec() + info
    t = records_table(data)
    assert t.num_rows == 1


def test_truncated_tail_tolerated():
    data = _rec() + b"WARC/1.0\r\nWARC-Type: response\r\nContent-Le"
    t = records_table(data)
    assert t.num_rows == 1


def test_missing_trailing_separator():
    full = _rec()
    t = records_table(full[:-4])   # strip the final \r\n\r\n
    assert t.num_rows == 1


def test_http_status_parsed():
    t = records_table(_rec(status=404))
    assert t.column("status")[0].as_py() == 404


def test_decode_charset_precedence():
    page = "<p>café"
    rows = pa.table({
        "payload": pa.array([
            codecs.BOM_UTF8 + page.encode("utf-8"),
            codecs.BOM_UTF16_LE + page.encode("utf-16-le"),
            page.encode("utf-8"),
        ], pa.binary()),
        "content_type": pa.array([
            "text/html", "text/html", "text/html; charset=utf-8",
        ], pa.string()),
    })
    out = DecodeHtml()(rows)
    assert out.column("html").to_pylist() == [page, page, page]


def test_read_warc_dataset(ray_session, tmp_path):
    p1 = str(tmp_path / "a.warc")
    p2 = str(tmp_path / "b.warc")
    write_warc(p1, [{"uri": f"https://h/{i}",
                     "date": "2026-01-01T00:00:00Z",
                     "payload": f"<p>{i}".encode()} for i in range(5)])
    write_warc(p2, [{"uri": "https://h/9",
                     "date": "2026-01-01T00:00:00Z",
                     "payload": b"<p>9"}])
    ds = read_warc([p1, p2])
    rows = ds.take_all()
    assert len(rows) == 6
    assert {r["uri"] for r in rows} == \
        {f"https://h/{i}" for i in range(5)} | {"https://h/9"}
    assert all(isinstance(r["payload"], bytes) for r in rows)


def test_iter_warc_gzip_like_garbage_prefix_stops_cleanly():
    # data that does not start with a WARC header yields nothing
    assert list(iter_warc_records(b"\x1f\x8b not a warc")) == []


def test_warc_fuzz_never_raises():
    """Framing must be total: random bytes and spliced real records
    never raise, never loop."""
    import random
    rng = random.Random(1)
    for _ in range(2000):
        data = bytes(rng.randrange(256) for _ in range(rng.randint(0, 300)))
        list(iter_warc_records(data))
    base = _rec() + _rec(uri="u2", payload=b"\r\n\r\nWARC/1.0\r\n")
    for _ in range(2000):
        i, j = rng.randrange(len(base)), rng.randrange(len(base))
        list(iter_warc_records(base[:i] + base[j:]))


def test_warc_roundtrip_random_payloads():
    import random
    rng = random.Random(7)
    payloads = [bytes(rng.randrange(256) for _ in range(rng.randint(0, 500)))
                for _ in range(50)]
    data = b"".join(_rec(uri=f"u{i}", payload=p)
                    for i, p in enumerate(payloads))
    t = records_table(data)
    assert t.num_rows == len(payloads)
    assert t.column("payload").to_pylist() == payloads
