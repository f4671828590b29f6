"""Shuffle-discipline regression tests: walk the LOGICAL plan of the
flagship and per-doc pipelines before execution and pin exactly which
all-to-all operators they contain (DESIGN.md §3). A refactor that slips
an extra groupby/sort/repartition into a map-only pipeline fails here,
not in a 100 TB run."""

import pyarrow as pa
import pytest

ALL_TO_ALL = ("Aggregate", "Sort", "RandomShuffle", "Repartition", "Join")


def _shuffle_ops(ds):
    found = []

    def walk(op):
        name = type(op).__name__
        if any(name.startswith(k) for k in ALL_TO_ALL):
            found.append(name)
        for dep in op.input_dependencies:
            walk(dep)

    walk(ds._logical_plan.dag)
    return found


def _docs(ray):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": ["alpha beta", "gamma delta", "epsilon zeta"]}))


def test_flagship_extract_shuffles_only_the_mega_branch(ray_session):
    """extract_dataset: the ONLY all-to-all is the mega-document
    reassembly Sort on the routed skew branch (which sees zero rows on a
    corpus without megas); the main branch is pure map. The parquet
    entry point (extract_from_parquet) goes further and skips building
    the mega branch entirely when the footer prescan finds no megas —
    avoiding the empty-sort barrier."""
    from htmlreader_ray.sources.corpus import BuildInterleaved
    from htmlreader_ray.pipelines.extract_pipeline import extract_dataset
    corpus = _docs(ray_session).map_batches(BuildInterleaved(),
                                            batch_format="pyarrow")
    out = extract_dataset(corpus)
    assert _shuffle_ops(out) == ["Sort"]


def test_per_doc_text_queries_are_map_only(ray_session):
    from htmlreader_ray.functions.text import (ngram_repetition_batch,
                                               pii_scrub_batch,
                                               word_repetition_batch)
    for fn in (word_repetition_batch, ngram_repetition_batch,
               pii_scrub_batch):
        ds = _docs(ray_session).map_batches(fn, batch_format="pyarrow")
        assert _shuffle_ops(ds) == [], fn.__name__


def test_exact_dedup_has_exactly_one_shuffle(ray_session):
    """Digest-key dedup: one Aggregate (the groupby over 16-byte
    digests), nothing else — the text column never shuffles."""
    from htmlreader_ray.functions.dedup import exact_dedup_ids
    ds = exact_dedup_ids(_docs(ray_session))
    assert _shuffle_ops(ds) == ["Aggregate"]
