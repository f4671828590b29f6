"""Multimodal (media-span) stages: the PDF/layout/image parse branch.

The north rule's media branch treats image/audio/pdf payloads as opaque
``binary`` columns with typed metadata. The Ray-side plumbing here is REAL
and tested — schema, actor signature, batch sizing, output layout — while
the codec work itself is STUBBED: the container ships no image/audio
libraries, so decode is gated behind an import-try and otherwise produces a
deterministic fake (or raises NotImplementedError in strict mode).

Pattern: actor pool with SMALL batches (large binary payloads: batch_size
16-64, not thousands) so batch x concurrency stays inside the worker heap.
"""

from __future__ import annotations

import hashlib
import re
from typing import Optional

import pyarrow as pa

MEDIA_META_TYPE = pa.struct([
    ("media_type", pa.string()),     # image / audio / video / pdf / other
    ("format", pa.string()),         # png / jpg / wav / mp4 / pdf / ""
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("n_frames", pa.int32()),
    ("duration_ms", pa.int32()),
    ("sha256", pa.string()),
    ("decoded", pa.bool_()),
])

_EXT_RE = re.compile(r"\.([a-z0-9]+)$")
_FORMAT_KIND = {
    "png": "image", "jpg": "image", "jpeg": "image", "gif": "image",
    "bmp": "image",
    "webp": "image", "wav": "audio", "mp3": "audio", "flac": "audio",
    "mp4": "video", "webm": "video", "pdf": "pdf",
}

try:  # full pixel decode would go here; absent in this container
    import PIL.Image as _PIL  # noqa: F401
    _HAVE_PIL = True
except Exception:
    _HAVE_PIL = False


def parse_image_header(payload: bytes):
    """REAL header decode, pure stdlib: returns (format, width, height)
    for PNG (IHDR), GIF (logical screen descriptor) or JPEG (SOF segment
    scan), or None when the bytes are not a recognized image. This is the
    production-shaped part of decode that needs no codec library."""
    import struct
    if payload is None or len(payload) < 10:
        return None
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) >= 24 and payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            return ("png", w, h)
        return None
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return ("gif", w, h)
    if payload[:2] == b"\xff\xd8":  # JPEG: scan segments to a SOF marker
        i = 2
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if i + 4 > len(payload):
                return None
            seg_len = struct.unpack(">H", payload[i + 2:i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 <= len(payload):
                    h, w = struct.unpack(">HH", payload[i + 5:i + 9])
                    return ("jpeg", w, h)
                return None
            i += 2 + seg_len
        return None
    if payload[:2] == b"BM" and len(payload) >= 26:  # BMP: BITMAPINFOHEADER
        hdr_size = struct.unpack("<I", payload[14:18])[0]
        if hdr_size >= 40 and len(payload) >= 26:
            w, h = struct.unpack("<ii", payload[18:26])
            return ("bmp", w, abs(h))  # negative height = top-down rows
        if hdr_size == 12 and len(payload) >= 22:  # BITMAPCOREHEADER
            w, h = struct.unpack("<HH", payload[18:22])
            return ("bmp", w, h)
        return None
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        chunk = payload[12:16]
        if chunk == b"VP8 " and len(payload) >= 30:
            # lossy: 14-bit width/height at frame-header bytes 6..9
            w = struct.unpack("<H", payload[26:28])[0] & 0x3FFF
            h = struct.unpack("<H", payload[28:30])[0] & 0x3FFF
            return ("webp", w, h)
        if chunk == b"VP8L" and len(payload) >= 25:
            bits = struct.unpack("<I", payload[21:25])[0]
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            return ("webp", w, h)
        if chunk == b"VP8X" and len(payload) >= 30:
            w = int.from_bytes(payload[24:27], "little") + 1
            h = int.from_bytes(payload[27:30], "little") + 1
            return ("webp", w, h)
        return None
    return None


def parse_audio_header(payload: bytes):
    """REAL audio header decode, pure stdlib: returns
    (format, duration_ms) for WAV (RIFF fmt/data chunk walk), else None."""
    import struct
    if payload is None or len(payload) < 12:
        return None
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i = 12
    byte_rate = None
    data_size = None
    while i + 8 <= len(payload):
        tag = payload[i:i + 4]
        size = struct.unpack("<I", payload[i + 4:i + 8])[0]
        if tag == b"fmt " and i + 16 <= len(payload):
            byte_rate = struct.unpack("<I", payload[i + 16:i + 20])[0]
        elif tag == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if not byte_rate or data_size is None:
        return None
    return ("wav", int(data_size * 1000 / byte_rate))


class MediaDecode:
    """Actor-pool stage: (doc_id, media_ref[, payload: binary]) ->
    (doc_id, media_ref, meta: MEDIA_META_TYPE).

    ``strict=True`` raises NotImplementedError when no codec library exists
    (production posture); the default emits a deterministic fake so the
    pipeline shape is exercisable end-to-end.
    """

    def __init__(self, *, strict: bool = False,
                 ref_col: str = "media_ref",
                 payload_col: Optional[str] = None,
                 keep_cols: tuple[str, ...] = ("doc_id",)) -> None:
        self.strict = strict
        self.ref_col = ref_col
        self.payload_col = payload_col
        self.keep_cols = keep_cols
        if strict and not _HAVE_PIL:
            raise NotImplementedError(
                "media decode requires an image library (PIL); not present "
                "in this container — run with strict=False for the "
                "deterministic stub")

    def _meta_for(self, ref: str, payload: Optional[bytes]) -> dict:
        m = _EXT_RE.search(ref or "")
        fmt = m.group(1) if m else ""
        kind = _FORMAT_KIND.get(fmt, "other")
        digest = hashlib.sha256(
            payload if payload is not None else (ref or "").encode("utf-8")
        ).hexdigest()
        # payload-bearing rows get a REAL header decode (PNG/GIF/JPEG,
        # pure stdlib) — only payload-less refs fall back to the
        # digest-derived deterministic fake
        hdr = parse_image_header(payload) if payload is not None else None
        if hdr is not None:
            real_fmt, width, height = hdr
            return {
                "media_type": "image",
                "format": real_fmt,
                "width": width,
                "height": height,
                "n_frames": 1,
                "duration_ms": 0,
                "sha256": digest,
                "decoded": True,
            }
        audio = parse_audio_header(payload) if payload is not None else None
        if audio is not None:
            real_fmt, duration_ms = audio
            return {
                "media_type": "audio",
                "format": real_fmt,
                "width": 0,
                "height": 0,
                "n_frames": 0,
                "duration_ms": duration_ms,
                "sha256": digest,
                "decoded": True,
            }
        seed = int(digest[:8], 16)
        return {
            "media_type": kind,
            "format": fmt,
            "width": 64 + seed % 1024 if kind in ("image", "video") else 0,
            "height": 64 + (seed >> 10) % 1024 if kind in ("image", "video") else 0,
            "n_frames": 1 + seed % 32 if kind == "video" else (1 if kind == "image" else 0),
            "duration_ms": seed % 60000 if kind in ("audio", "video") else 0,
            "sha256": digest,
            "decoded": False,  # no payload -> nothing to truly decode
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column(self.ref_col).to_pylist()
        payloads = (batch.column(self.payload_col).to_pylist()
                    if self.payload_col and self.payload_col in batch.column_names
                    else [None] * len(refs))
        metas = [self._meta_for(r, p) for r, p in zip(refs, payloads)]
        arrays = [batch.column(c) for c in self.keep_cols]
        names = list(self.keep_cols)
        arrays += [batch.column(self.ref_col),
                   pa.array(metas, MEDIA_META_TYPE)]
        names += [self.ref_col, "meta"]
        return pa.Table.from_arrays(arrays, names=names)


LAYOUT_BLOCK_TYPE = pa.struct([
    ("page", pa.int32()),
    ("block_idx", pa.int32()),
    ("kind", pa.string()),        # text / heading / table / figure
    ("bbox", pa.list_(pa.float32(), 4)),
    ("text", pa.string()),
])


class PdfLayoutParse:
    """Actor-pool stage: the PDF/layout parse branch of the north rule.

    (doc_id, media_ref[, payload]) -> one row per layout block:
    (doc_id, media_ref, page, block_idx, kind, bbox, text).

    The PDF engine itself is STUBBED (no pdfium/poppler in this container):
    page count and block layout derive deterministically from the content
    digest, so ordering, fan-out and schema — the parts the distributed
    pipeline depends on — are real and tested. A real implementation
    replaces _layout_for() with the native parse; nothing else changes.
    """

    _KINDS = ("heading", "text", "text", "table", "figure")

    def __init__(self, *, strict: bool = False, ref_col: str = "media_ref",
                 payload_col: Optional[str] = None,
                 keep_cols: tuple[str, ...] = ("doc_id",)) -> None:
        self.ref_col = ref_col
        self.payload_col = payload_col
        self.keep_cols = keep_cols
        if strict:
            raise NotImplementedError(
                "PDF layout parse requires a native PDF library; not "
                "present in this container — strict=False runs the "
                "deterministic stub")

    def _layout_for(self, ref: str, payload: Optional[bytes]) -> list[dict]:
        digest = hashlib.sha256(
            payload if payload is not None else (ref or "").encode("utf-8")
        ).hexdigest()
        seed = int(digest[:8], 16)
        n_pages = 1 + seed % 4
        blocks = []
        for page in range(n_pages):
            n_blocks = 1 + (seed >> (page * 3)) % 3
            for b in range(n_blocks):
                kind = self._KINDS[(seed >> (page + b)) % len(self._KINDS)]
                y0 = b / n_blocks
                blocks.append({
                    "page": page, "block_idx": b, "kind": kind,
                    "bbox": [0.1, round(y0, 4), 0.9,
                             round(y0 + 0.8 / n_blocks, 4)],
                    "text": f"[stub {kind} p{page}b{b} {digest[:8]}]",
                })
        return blocks

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column(self.ref_col).to_pylist()
        payloads = (batch.column(self.payload_col).to_pylist()
                    if self.payload_col and
                    self.payload_col in batch.column_names
                    else [None] * len(refs))
        keep_vals = {c: batch.column(c).to_pylist() for c in self.keep_cols}
        out_keep: dict[str, list] = {c: [] for c in self.keep_cols}
        out_ref, out_page, out_idx, out_kind, out_bbox, out_text = \
            [], [], [], [], [], []
        for i, (ref, payload) in enumerate(zip(refs, payloads)):
            for blk in self._layout_for(ref, payload):
                for c in self.keep_cols:
                    out_keep[c].append(keep_vals[c][i])
                out_ref.append(ref)
                out_page.append(blk["page"])
                out_idx.append(blk["block_idx"])
                out_kind.append(blk["kind"])
                out_bbox.append(blk["bbox"])
                out_text.append(blk["text"])
        arrays = [pa.array(out_keep[c]) for c in self.keep_cols]
        names = list(self.keep_cols)
        arrays += [pa.array(out_ref, pa.string()),
                   pa.array(out_page, pa.int32()),
                   pa.array(out_idx, pa.int32()),
                   pa.array(out_kind, pa.string()),
                   pa.array(out_bbox, pa.list_(pa.float32(), 4)),
                   pa.array(out_text, pa.string())]
        names += [self.ref_col, "page", "block_idx", "kind", "bbox", "text"]
        return pa.Table.from_arrays(arrays, names=names)


class MediaFeatures:
    """Actor-pool stage: media metadata -> fixed-dim feature vector
    (list<float32>). The embedding model is STUBBED (no vision/audio libs in
    this container): a deterministic pseudo-embedding derived from the
    content digest, so downstream similarity plumbing is fully exercisable.
    The batch/actor/shape contract is exactly what a real CLIP-style encoder
    stage would use (small batches, concurrency sized to model memory)."""

    def __init__(self, dim: int = 64, ref_col: str = "media_ref",
                 keep_cols: tuple[str, ...] = ("doc_id",)) -> None:
        import numpy as np
        self.dim = dim
        self.ref_col = ref_col
        self.keep_cols = keep_cols
        self._np = np

    def _feature_for(self, ref: str) -> list[float]:
        """L2-normalized pseudo-embedding from the sha256 digest bytes:
        v_i = (byte_i - 127.5) / 127.5, each op a single IEEE double and
        the norm a SEQUENTIAL sum of squares — chosen so a SQL oracle
        (hex-parse + list_transform + list_aggregate sum) reproduces the
        doubles bit-for-bit."""
        digest = hashlib.sha256((ref or "").encode("utf-8")).digest()
        reps = (self.dim + len(digest) - 1) // len(digest)
        raw = (digest * reps)[:self.dim]
        v = [(b - 127.5) / 127.5 for b in raw]
        s = 0.0
        for x in v:
            s += x * x
        import math
        norm = math.sqrt(s)
        return [x / norm for x in v]

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column(self.ref_col).to_pylist()
        feats = [self._feature_for(ref) for ref in refs]
        arrays = [batch.column(c) for c in self.keep_cols]
        names = list(self.keep_cols)
        arrays += [batch.column(self.ref_col),
                   pa.array(feats, pa.list_(pa.float64())),
                   # stub marker: no vision/audio lib in this container,
                   # so these are digest-derived pseudo-embeddings; a
                   # real encoder stage sets decoded=True. Stamped on
                   # every row so consumers see the stub in-band, not
                   # just in the docstring.
                   pa.array([False] * len(refs), pa.bool_())]
        names += [self.ref_col, "features", "decoded"]
        return pa.Table.from_arrays(arrays, names=names)


class MediaResize:
    """Actor-pool stage: raw grayscale pixel buffers -> nearest-neighbor
    thumbnails. UNLIKE the codec-dependent stages this one is REAL, not
    stubbed: the resize is pure index arithmetic over an uncompressed
    buffer (out[i, j] = src[(i*H)//out_h, (j*W)//out_w], the classic NN
    kernel), vectorized as one numpy fancy-index per image. Emits the
    resized buffer plus an exact int64 checksum (sum of resized bytes)
    so a SQL oracle can replay the index arithmetic bit-for-bit.

    Batch sizing note (100 TB posture): payloads are binary — callers
    cap ``batch_size`` (the media queries use 64) so batch x
    concurrency stays inside the worker heap; blocks stream, nothing
    is pinned."""

    def __init__(self, out_w: int = 32, out_h: int = 32,
                 payload_col: str = "payload",
                 w_col: str = "width", h_col: str = "height",
                 keep_cols: tuple[str, ...] = ("doc_id",),
                 emit_payload: bool = True) -> None:
        import numpy as np
        self.out_w, self.out_h = out_w, out_h
        self.payload_col, self.w_col, self.h_col = payload_col, w_col, h_col
        self.keep_cols = keep_cols
        self.emit_payload = emit_payload
        self._np = np
        # row/col index maps are per-(W,H) constants; cache across rows
        self._maps: dict[tuple[int, int], tuple] = {}

    def _resize(self, buf: bytes, w: int, h: int):
        np = self._np
        key = (w, h)
        maps = self._maps.get(key)
        if maps is None:
            rows = (np.arange(self.out_h, dtype=np.int64) * h) // self.out_h
            cols = (np.arange(self.out_w, dtype=np.int64) * w) // self.out_w
            maps = self._maps[key] = (rows, cols)
        rows, cols = maps
        src = np.frombuffer(buf, dtype=np.uint8).reshape(h, w)
        out = src[rows][:, cols]
        return out.tobytes(), int(out.sum(dtype=np.int64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        ws = batch.column(self.w_col).to_pylist()
        hs = batch.column(self.h_col).to_pylist()
        outs, sums = [], []
        for p, w, h in zip(payloads, ws, hs):
            o, s = self._resize(p or b"\x00", max(int(w), 1),
                                max(int(h), 1))
            outs.append(o)
            sums.append(s)
        n = batch.num_rows
        arrays = [batch.column(c) for c in self.keep_cols]
        names = list(self.keep_cols)
        arrays += [pa.array([self.out_w] * n, pa.int64()),
                   pa.array([self.out_h] * n, pa.int64()),
                   pa.array(sums, pa.int64())]
        names += ["out_w", "out_h", "checksum"]
        if self.emit_payload:
            arrays.append(pa.array(outs, pa.binary()))
            names.append("resized")
        return pa.Table.from_arrays(arrays, names=names)


class MediaFrameSample:
    """Actor-pool flat-map stage: one row per sampled frame of a video span.
    Frame decode is STUBBED; the fan-out shape (row multiplication, frame
    index + timestamp columns, small batches for large payloads) is real."""

    def __init__(self, fps_target: float = 1.0, max_frames: int = 8,
                 ref_col: str = "media_ref",
                 keep_cols: tuple[str, ...] = ("doc_id",)) -> None:
        self.fps_target = fps_target
        self.max_frames = max_frames
        self.ref_col = ref_col
        self.keep_cols = keep_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column(self.ref_col).to_pylist()
        keep_vals = {c: batch.column(c).to_pylist() for c in self.keep_cols}
        out_keep: dict[str, list] = {c: [] for c in self.keep_cols}
        out_ref, out_idx, out_ts = [], [], []
        for i, ref in enumerate(refs):
            digest = hashlib.sha256((ref or "").encode("utf-8")).hexdigest()
            duration_ms = int(digest[:8], 16) % 60000
            n = max(1, min(self.max_frames,
                           int(duration_ms / 1000 * self.fps_target)))
            for f in range(n):
                for c in self.keep_cols:
                    out_keep[c].append(keep_vals[c][i])
                out_ref.append(ref)
                out_idx.append(f)
                out_ts.append(int(f * duration_ms / n))
        arrays = [pa.array(out_keep[c]) for c in self.keep_cols]
        names = list(self.keep_cols)
        arrays += [pa.array(out_ref, pa.string()),
                   pa.array(out_idx, pa.int32()),
                   pa.array(out_ts, pa.int32()),
                   # stub marker: frame DECODE is stubbed (no video
                   # codec in this container) — the sampling grid is
                   # real, the pixels are not; a real codec stage sets
                   # decoded=True per frame
                   pa.array([False] * len(out_ref), pa.bool_())]
        names += [self.ref_col, "frame_idx", "frame_ts_ms", "decoded"]
        return pa.Table.from_arrays(arrays, names=names)
