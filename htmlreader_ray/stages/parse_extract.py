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
        # The span composition (ordering, dense re-numbering, per-doc
        # counts/chars, failure routing) is pure numpy boundary
        # arithmetic over the (parent, offset)-sorted stream — the former
        # per-span Python loop was ~40% of stage wall time.
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
        order_idx = (np.lexsort((offs, parent)) if len(parent)
                     else parent.astype(np.int64))
        kind_col = pc.struct_field(flat, "kind")
        text_col = pc.struct_field(flat, "text")
        refs_col = pc.struct_field(flat, "media_ref")
        is_media = pc.fill_null(pc.equal(kind_col, "media"), False) \
            .to_numpy(zero_copy_only=False)

        # Batch extraction: every text span's HTML goes through ONE
        # extract_arrow call reading the taken StringArray's buffers
        # directly (no input-side PyUnicode at all), output packed in one
        # buffer; the final text column is a take() over that packed
        # array. Falls back to the list-based extract_many, then to
        # per-span extract_html, when the C entries are unavailable.
        nonmedia_idx = np.flatnonzero(~is_media)
        sub_col = text_col.take(pa.array(nonmedia_idx))
        extracted = self.extractor.extract_html_many_arrow(sub_col)
        if extracted is None:
            sub_texts = [t or "" for t in sub_col.to_pylist()]
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
        # char length per extracted span (-1 marks a span whose
        # extraction raised; its whole doc re-raises or skips below)
        lens = pc.utf8_length(extracted).fill_null(-1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)

        # flat idx -> index into `extracted` (valid where ~is_media)
        subj = np.cumsum(~is_media) - 1
        if len(lens):
            subj_safe = np.where(is_media, 0, subj)
            ln_flat = np.where(is_media, np.int64(0), lens[subj_safe])
        else:
            subj_safe = subj
            ln_flat = np.zeros(len(is_media), np.int64)
        failed_flat = (~is_media) & (ln_flat < 0)

        parent_s = parent[order_idx] if len(parent) else parent
        is_media_s = is_media[order_idx]
        ln_s = ln_flat[order_idx]
        keep_s = is_media_s | (ln_s > 0)

        if failed_flat.any():
            if self.on_error != "skip":
                # reproduce the original exception from the FIRST failing
                # span in (doc, offset) order, like the per-doc loop did
                fs = np.flatnonzero(failed_flat[order_idx])[0]
                i = int(order_idx[fs])
                self.extractor.extract_html(text_col[i].as_py() or "")
                raise RuntimeError("extraction failed without exception")
            failed_doc = np.zeros(n, bool)
            failed_doc[parent[failed_flat]] = True
            self.errors += int(failed_doc.sum())
            keep_s &= ~failed_doc[parent_s]

        kept = np.flatnonzero(keep_s)
        kept_parent = parent_s[kept]
        kept_media = is_media_s[kept]
        kept_flat = order_idx[kept]
        k = len(kept)
        # dense 0-based order within each doc over the kept spans
        if k:
            idx = np.arange(k, dtype=np.int64)
            new_doc = np.empty(k, bool)
            new_doc[0] = True
            np.not_equal(kept_parent[1:], kept_parent[:-1],
                         out=new_doc[1:])
            doc_start = np.maximum.accumulate(np.where(new_doc, idx, 0))
            order_out = (idx - doc_start).astype(np.int32)
        else:
            order_out = np.zeros(0, np.int32)
        out_counts = (np.bincount(kept_parent, minlength=n)
                      .astype(np.int64) if k else np.zeros(n, np.int64))
        char_w = np.where(kept_media, np.int64(0), ln_s[kept])
        n_chars = (np.bincount(kept_parent, weights=char_w,
                               minlength=n).astype(np.int64)
                   if k else np.zeros(n, np.int64))

        sel = np.where(kept_media, np.int64(empty_idx),
                       subj_safe[kept_flat])
        ok_text = pc.take(extracted_plus, pa.array(sel))
        media_mask = pa.array(kept_media)
        kind_out = pc.if_else(media_mask, pa.scalar("media"),
                              pa.scalar("text"))
        # media_ref normalization stays a Python loop — but only over the
        # (few) media spans, scattered into an otherwise-empty column
        ok_ref = [""] * k
        media_pos = np.flatnonzero(kept_media)
        if len(media_pos):
            raw_refs = refs_col.take(
                pa.array(kept_flat[media_pos])).to_pylist()
            for p, r in zip(media_pos.tolist(), raw_refs):
                ok_ref[p] = normalize_media_ref(r or "")

        struct = pa.StructArray.from_arrays(
            [kind_out, ok_text,
             pa.array(ok_ref, pa.string()), pa.array(order_out)],
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
        col = batch.column(self.html_col)
        texts = self.extractor.extract_html_many_arrow(col)
        if texts is None:
            htmls = col.to_pylist()
            texts = self.extractor.extract_html_many(htmls)
            if texts is None:
                extract = self.extractor.extract_html
                texts = pa.array([extract(h or "") for h in htmls],
                                 pa.string())
        arrays = [batch.column(c) for c in self.keep_cols]
        names = list(self.keep_cols)
        arrays.append(texts)
        names.append(self.out_col)
        return pa.Table.from_arrays(arrays, names=names)
