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
        doc_ids = batch.column("doc_id")
        spans_lists = batch.column("spans").to_pylist()
        out_lists: list[list[dict]] = []
        n_spans: list[int] = []
        n_chars: list[int] = []
        extract = self.extractor.extract_spans
        skip_errors = self.on_error == "skip"
        for spans in spans_lists:
            if skip_errors:
                try:
                    out = extract(spans or [])
                except Exception:
                    self.errors += 1
                    out = []
            else:
                out = extract(spans or [])
            out_lists.append(out)
            n_spans.append(len(out))
            n_chars.append(sum(len(s["text"]) for s in out))
        arrays = [doc_ids,
                  pa.array(out_lists, SPANS_OUT_TYPE),
                  pa.array(n_spans, pa.int32()),
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
        extract = self.extractor.extract_html
        texts = [extract(h or "") for h in htmls]
        arrays = [batch.column(c) for c in self.keep_cols]
        names = list(self.keep_cols)
        arrays.append(pa.array(texts, pa.string()))
        names.append(self.out_col)
        return pa.Table.from_arrays(arrays, names=names)
