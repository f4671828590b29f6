"""ParseExtract: the flagship actor-pool map_batches stage.

corpus batch (doc_id, spans) -> (doc_id, spans_out, n_spans, n_chars)

Design per SURVEY.md §7.1:
- callable CLASS for ``map_batches(ParseExtract, concurrency=N,
  batch_format="pyarrow")`` — rule-set selectors are compiled once per actor
  in ``__init__`` (mirrors the reference's cache-the-parsed-selector guidance,
  /root/reference/Sources/include/HTMLSelector.h:20); entity/encoding tables
  are module-level and loaded once per worker process at import
- batch = many documents; the per-document parse (tokenizer + tree builder +
  boilerplate strip) is inherently sequential WITHIN a doc but the stage
  vectorizes ACROSS docs per batch (SURVEY.md §2 M2)
- zero parser state crosses batch boundaries; the stage is deterministic and
  side-effect-free so Ray task retries are safe (SURVEY.md §4.2)
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

from ..kernel.extract import ExtractConfig, Extractor
from ..sources.corpus import SPANS_OUT_TYPE


class ParseExtract:
    """on_error: "raise" propagates kernel exceptions (test posture);
    "skip" emits an empty span list for the poisoned document and counts it
    in ``self.errors`` — at corpus scale a single pathological document must
    fail alone, not take a whole shard's task with it."""

    def __init__(self, config: Optional[ExtractConfig] = None,
                 passthrough_cols: tuple[str, ...] = (),
                 on_error: str = "raise") -> None:
        self.extractor = Extractor(config)
        self.passthrough_cols = passthrough_cols
        self.on_error = on_error
        self.errors = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Flat-column path: list_flatten + struct_field pulls the four span
        # fields out as flat arrays (no per-struct Python dicts — the nested
        # to_pylist cost 2x the extraction itself); np.lexsort is stable
        # like the Python sorted() this replaces, so equal offsets keep
        # input order. Semantics mirror Extractor.extract_spans exactly
        # (parity: tests/test_components.py spans tests run both paths).
        import numpy as np
        import pyarrow.compute as pc

        from ..kernel.extract import normalize_media_ref

        n = batch.num_rows
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        offs = pc.struct_field(flat, "offset").to_numpy(zero_copy_only=False)
        # .tolist() once: the doc loop below indexes these per span, and
        # Python-list indexing with Python ints is ~2x numpy-scalar
        # indexing (10% of stage wall time at 2 spans/doc)
        order_idx = (np.lexsort((offs, parent)) if len(parent)
                     else parent).tolist()
        kinds = pc.struct_field(flat, "kind").to_pylist()
        texts = pc.struct_field(flat, "text").to_pylist()
        refs = pc.struct_field(flat, "media_ref").to_pylist()
        counts = (np.bincount(parent, minlength=n) if len(parent)
                  else np.zeros(n, np.int64)).tolist()

        # Batch extraction: every text span's HTML goes through ONE
        # extract_many call (packed output buffer, no per-doc PyUnicode),
        # and the final text column is a take() over that packed array —
        # the composition loop below only handles integers. Falls back to
        # per-span extract_html when the C batch entry is unavailable.
        sub_pos = [0] * len(kinds)   # flat idx -> index into `extracted`
        sub_texts = []
        for i, k in enumerate(kinds):
            if k != "media":
                sub_pos[i] = len(sub_texts)
                sub_texts.append(texts[i] or "")
        extracted = self.extractor.extract_html_many(sub_texts)
        if extracted is None:
            eh = self.extractor.extract_html
            vals = []
            for t in sub_texts:
                try:
                    vals.append(eh(t))
                except Exception:
                    vals.append(None)       # routed per doc below
            extracted = pa.array(vals, pa.string())
        # sentinel "" at the end: media spans take() it for their text
        empty_idx = len(extracted)
        extracted_plus = pa.concat_arrays(
            [extracted, pa.array([""], pa.string())])
        # char length per extracted span (0 for the error sentinel; those
        # docs re-raise or skip below, so the 0 never leaks into output)
        lens = pc.utf8_length(extracted).fill_null(-1) \
            .to_numpy(zero_copy_only=False).tolist()

        skip_errors = self.on_error == "skip"
        ok_kind: list[str] = []
        ok_sel: list[int] = []
        ok_ref: list[str] = []
        ok_order: list[int] = []
        out_counts = [0] * n
        n_chars = [0] * n
        pos = 0
        for d in range(n):
            c = counts[d]
            idxs = order_idx[pos:pos + c]
            pos += c
            mark = len(ok_kind)
            order = 0
            chars = 0
            failed = False
            for i in idxs:
                if kinds[i] == "media":
                    ok_kind.append("media")
                    ok_sel.append(empty_idx)
                    ok_ref.append(normalize_media_ref(refs[i] or ""))
                    ok_order.append(order)
                    order += 1
                else:
                    j = sub_pos[i]
                    ln = lens[j]
                    if ln < 0:              # extraction raised for this span
                        failed = True
                        break
                    if ln:
                        ok_kind.append("text")
                        ok_sel.append(j)
                        ok_ref.append("")
                        ok_order.append(order)
                        order += 1
                        chars += ln
            if failed:
                if not skip_errors:
                    # reproduce the original exception for this span
                    self.extractor.extract_html(texts[i] or "")
                    raise RuntimeError("extraction failed without exception")
                self.errors += 1
                del ok_kind[mark:], ok_sel[mark:], ok_ref[mark:], \
                    ok_order[mark:]
                order = 0
                chars = 0
            out_counts[d] = order
            n_chars[d] = chars

        ok_text = pc.take(extracted_plus,
                          pa.array(ok_sel, pa.int64()))
        struct = pa.StructArray.from_arrays(
            [pa.array(ok_kind, pa.string()), ok_text,
             pa.array(ok_ref, pa.string()), pa.array(ok_order, pa.int32())],
            names=["kind", "text", "media_ref", "order"])
        offsets = np.zeros(n + 1, np.int32)
        np.cumsum(out_counts, out=offsets[1:])
        spans_out = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), struct)
        arrays = [batch.column("doc_id"),
                  spans_out.cast(SPANS_OUT_TYPE),
                  pa.array(out_counts, pa.int32()),
                  pa.array(n_chars, pa.int64())]
        names = ["doc_id", "spans_out", "n_spans", "n_chars"]
        for col in self.passthrough_cols:
            arrays.append(batch.column(col))
            names.append(col)
        return pa.Table.from_arrays(arrays, names=names)


# Per-worker-process extractor cache. Ray reuses worker processes across
# map_batches tasks, so this gives the same load-once semantics as an actor
# pool WITHOUT paying a fresh actor-pool spin-up per pipeline execution
# (which dominates wall time for short jobs and for shard loops). Use the
# ParseExtract actor class instead when per-stage state is heavy (models) or
# must not be shared across pipelines.
_WORKER_EXTRACTORS: dict = {}


def parse_extract_batch(batch: pa.Table,
                        passthrough_cols: tuple[str, ...] = (),
                        config: Optional[ExtractConfig] = None,
                        on_error: str = "raise") -> pa.Table:
    key = (passthrough_cols, config, on_error)
    pe = _WORKER_EXTRACTORS.get(key)
    if pe is None:
        pe = _WORKER_EXTRACTORS[key] = ParseExtract(
            config, passthrough_cols=passthrough_cols, on_error=on_error)
    return pe(batch)


class ExtractText:
    """Lighter variant for plain HTML columns: html text column -> extracted
    main text column (used by the documents-table queries)."""

    def __init__(self, config: Optional[ExtractConfig] = None,
                 html_col: str = "html", out_col: str = "extracted_text",
                 keep_cols: tuple[str, ...] = ("doc_id",)) -> None:
        self.extractor = Extractor(config)
        self.html_col = html_col
        self.out_col = out_col
        self.keep_cols = keep_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch.column(self.html_col).to_pylist()
        texts = self.extractor.extract_html_many(htmls)
        if texts is None:
            extract = self.extractor.extract_html
            texts = pa.array([extract(h or "") for h in htmls], pa.string())
        arrays = [batch.column(c) for c in self.keep_cols]
        names = list(self.keep_cols)
        arrays.append(texts)
        names.append(self.out_col)
        return pa.Table.from_arrays(arrays, names=names)
