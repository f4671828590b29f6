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


def test_top_tfidf_shuffle_budget(ray_session):
    """tf-idf, bounded-vocab path: the df type table is ray.put and
    looked up via index_in — NO join touches the corpus-scale tf rows.
    The one Sort is the per-doc argmax groupby().map_groups (sort-based
    in the logical plan); its input is the block-local argmax partials,
    never the raw (doc, word) rows."""
    from htmlreader_ray.functions.scoring import top_tfidf
    ops = _shuffle_ops(top_tfidf(_docs(ray_session)))
    assert ops.count("Join") == 0, ops
    assert ops.count("Sort") == 1, ops


def test_top_tfidf_join_path_budget(ray_session):
    """Web-scale-vocab fallback: ONE word-keyed hash join, same final
    argmax shape."""
    from htmlreader_ray.functions.scoring import top_tfidf
    ops = _shuffle_ops(top_tfidf(_docs(ray_session),
                                 broadcast_max_vocab=0))
    assert ops.count("Join") == 1, ops
    assert ops.count("Sort") == 1, ops
    assert "RandomShuffle" not in ops, ops


def test_unigram_scoring_pass_is_map_only(ray_session):
    """After the (separately-executed) vocab aggregate, the scoring pass
    itself is a pure map over the documents — the plan of the returned
    dataset contains no all-to-all at all."""
    from htmlreader_ray.functions.scoring import unigram_surprisal
    ds = unigram_surprisal(_docs(ray_session))
    assert _shuffle_ops(ds) == []


def test_bigram_pmi_broadcast_path_no_joins(ray_session):
    """Bounded-vocab PMI: the unigram table is ray.put ONCE and scored
    via index_in lookups — no Join, and top-K is block partials + a
    single-task merge, not a global Sort."""
    from htmlreader_ray.functions.indexing import bigram_pmi
    ops = _shuffle_ops(bigram_pmi(_docs(ray_session), min_count=1))
    assert ops.count("Join") == 0, ops
    assert ops.count("Sort") == 0, ops


def test_bigram_pmi_join_path_two_joins(ray_session):
    """Web-scale-vocab PMI (broadcast_max_vocab exceeded): two hash
    joins of the unigram table, still no global Sort for top-K."""
    from htmlreader_ray.functions.indexing import bigram_pmi
    ops = _shuffle_ops(bigram_pmi(_docs(ray_session), min_count=1,
                                  broadcast_max_vocab=0))
    assert ops.count("Join") == 2, ops
    assert ops.count("Sort") == 0, ops


def test_inverted_index_single_groupby(ray_session):
    """Inverted index: one per-term groupby (sort-based map_groups) over
    block-local distinct partials — no joins, no extra all-to-all."""
    from htmlreader_ray.functions.indexing import inverted_index
    ops = _shuffle_ops(inverted_index(_docs(ray_session)))
    assert ops.count("Sort") == 1 and ops.count("Join") == 0, ops
    assert "Aggregate" not in ops and "RandomShuffle" not in ops, ops


def test_dup_spans_shuffle_budget(ray_session):
    """Duplicated-span index: gram-count Aggregate, ONE join back on the
    gram key (the dup set is never broadcast), and the per-doc position
    groupby (Sort) — nothing else."""
    from htmlreader_ray.functions.curation import duplicated_spans
    ops = _shuffle_ops(duplicated_spans(_docs(ray_session), n=2))
    assert ops.count("Join") == 1, ops
    assert ops.count("Aggregate") == 1, ops
    assert ops.count("Sort") == 1, ops
    assert "RandomShuffle" not in ops, ops


def test_semdedup_prune_shuffles_only_on_cluster(ray_session):
    """SemDeDup: centroids broadcast, assignment is a map, and the ONLY
    all-to-all is the cluster-keyed groupby feeding the prune groups
    (Ray Data lowers map_groups to Sort on the key)."""
    import numpy as np
    import ray.data as rd

    from htmlreader_ray.functions import clustering

    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[0.1, 0.2], [0.3, 0.1], [0.15, 0.22]],
                              pa.list_(pa.float32()))}))
    cids = np.array([0], np.int64)
    c = np.array([[100, 200]], np.int64)
    out = clustering.semdedup_prune(ds, cids, c)
    ops = _shuffle_ops(out)
    assert len(ops) == 1 and ops[0] in ("Sort", "Aggregate"), ops


def test_pca_project_is_map_only_after_learn(ray_session):
    """pca_project's output plan: the learn passes run eagerly (bounded
    take_all of dims-row partials); the emitted projection Dataset is a
    pure broadcast map with zero shuffles."""
    import ray.data as rd

    from htmlreader_ray.functions import clustering

    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[0.1, 0.2], [0.3, 0.1], [0.15, 0.22]],
                              pa.list_(pa.float32()))}))
    out = clustering.pca_project(ds, dims=2, iters=2)
    assert _shuffle_ops(out) == []


def test_temperature_sample_filter_pass_is_map_only(ray_session):
    """temperature_sample: pass 1 (sizes) is a bounded combiner
    aggregate consumed eagerly; the returned keep-filter Dataset itself
    is a pure map — the corpus never shuffles."""
    import hashlib

    import ray.data as rd

    from htmlreader_ray.functions.scan import temperature_sample

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(20), pa.int64()),
        "source": pa.array(["a" if i % 4 else "b" for i in range(20)]),
        "__hkey": pa.array(
            [int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16)
             for i in range(20)], pa.int64())}))
    out = temperature_sample(ds)
    assert _shuffle_ops(out) == []


def test_dense_rank_shuffles_distribution_not_rows(ray_session):
    """grouped_dense_rank: the rank table is built from the DISTINCT
    (keys, val) distribution (one Aggregate from the combiner, one Sort
    for the per-key rank groups) and hash-joined back — exactly one
    Join, and never a groupby over the input rows themselves."""
    import ray.data as rd
    from htmlreader_ray.functions.shuffle import grouped_dense_rank
    ds = rd.from_arrow(pa.table({
        "k": pa.array(["a", "a", "b"], pa.string()),
        "v": pa.array([1, 2, 1], pa.int64())}))
    ops = _shuffle_ops(grouped_dense_rank(ds, ["k"], "v"))
    assert ops.count("Join") == 1, ops
    assert ops.count("Sort") == 1, ops
    assert ops.count("Aggregate") == 1, ops
    assert "RandomShuffle" not in ops, ops


def test_triangle_counts_shuffle_budget(ray_session):
    """triangle_counts: distinct-edge Aggregate, degree Aggregate, the
    per-center wedge groupby (Sort), corner-count Aggregate, and the
    three hash joins (deg_u, deg_v, closing) plus their scrub
    Repartitions — no RandomShuffle, no full-table sort."""
    import ray.data as rd
    from htmlreader_ray.functions.graph import triangle_counts
    edges = rd.from_arrow(pa.table({
        "src": pa.array(["a", "b", "c"], pa.string()),
        "dst": pa.array(["b", "c", "a"], pa.string())}))
    ops = _shuffle_ops(triangle_counts(edges))
    assert ops.count("Join") == 3, ops
    assert "RandomShuffle" not in ops, ops


def test_label_propagation_per_round_budget(ray_session):
    """Each min-label round costs exactly one inner Join (labels onto
    the bidirectional edge stream), one Aggregate (min combiner), and
    one left-outer Join back — plus the label table's scrub
    Repartitions. No Sort, no RandomShuffle at any depth."""
    import ray.data as rd

    from htmlreader_ray.functions.graph import label_propagation

    edges = rd.from_arrow(pa.table({
        "src": pa.array(["a", "b"], pa.string()),
        "dst": pa.array(["b", "c"], pa.string())}))

    def unique_ops(ds):
        # the lazy label table feeds two consumers per round; walk each
        # op INSTANCE once or shared subtrees double-count
        seen, found = set(), []

        def walk(op):
            if id(op) in seen:
                return
            seen.add(id(op))
            name = type(op).__name__
            if any(name.startswith(k) for k in ALL_TO_ALL):
                found.append(name)
            for dep in op.input_dependencies:
                walk(dep)

        walk(ds._logical_plan.dag)
        return found

    one = unique_ops(label_propagation(edges, rounds=1,
                                       materialize_rounds=False))
    two = unique_ops(label_propagation(edges, rounds=2,
                                       materialize_rounds=False))
    assert one.count("Join") == 2
    assert two.count("Join") - one.count("Join") == 2
    assert "Sort" not in two and "RandomShuffle" not in two


def test_grouped_percentiles_shuffle_distribution_not_rows(ray_session):
    """Both percentile operators groupby the combiner-reduced VALUE
    DISTRIBUTION: one Aggregate (the distribution combiner) plus the
    map_groups Sort — which runs over the BOUNDED distribution table,
    never the row stream — and no Join anywhere."""
    import ray.data as rd

    from htmlreader_ray.functions.shuffle import (grouped_percentile_cont,
                                                  grouped_percentile_disc)

    t = pa.table({"g": pa.array(["a", "b"], pa.string()),
                  "v": pa.array([1, 2], pa.int64())})
    for make in (
            lambda ds: grouped_percentile_disc(ds, ["g"], "v",
                                               [("p10", 1, 10)]),
            lambda ds: grouped_percentile_cont(ds, ["g"], "v", 19, 20)):
        ops = _shuffle_ops(make(rd.from_arrow(t)))
        assert "Join" not in ops and "RandomShuffle" not in ops
        assert ops.count("Aggregate") == 1, ops
        assert ops.count("Sort") == 1, ops  # over the distribution table


def test_bigram_surprisal_join_budget(ray_session):
    """Score attach is TWO hash joins on type tables (c1 onto bigrams,
    scores onto per-doc pairs) + the type/first-word/per-doc combiner
    Aggregates; the model is never broadcast and the row stream is
    never sorted."""
    import ray.data as rd

    from htmlreader_ray.functions.indexing import bigram_surprisal

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": ["a b a", "b c"]}))
    ops = _shuffle_ops(bigram_surprisal(ds))
    assert ops.count("Join") == 2
    assert "Sort" not in ops and "RandomShuffle" not in ops


def test_edge_reciprocity_shuffle_budget(ray_session):
    """edge_reciprocity: distinct-edge Aggregate + canonical-pair
    Aggregate + the final single-partition Repartition — nothing else
    (in particular no Join: n_dir==2 replaces the reverse-edge
    self-join)."""
    import ray.data as rd
    from htmlreader_ray.functions.graph import edge_reciprocity

    edges = rd.from_arrow(pa.table({
        "src": pa.array(["a", "b"]), "dst": pa.array(["b", "a"])}))
    ops = _shuffle_ops(edge_reciprocity(edges))
    assert sorted(ops) == ["Aggregate", "Aggregate", "Repartition"], ops


def test_heavy_hitters_pass2_shuffle_budget(ray_session):
    """exact_heavy_hitters pass 2: ONE Aggregate (the candidate-only
    combiner groupby) — the full vocabulary never shuffles. (Pass 1 is
    a map + bounded take_all, executed eagerly before the plan below
    is built.)"""
    import ray.data as rd
    from htmlreader_ray.functions.sketch import exact_heavy_hitters

    docs = rd.from_arrow(pa.table({"text": ["hot hot hot cold"] * 4}))
    out = exact_heavy_hitters(docs, k=4)
    ops = _shuffle_ops(out)
    assert ops == ["Aggregate"], ops


def test_activity_streaks_single_shuffle(ray_session):
    """activity_streaks: one user-bucket map_groups exchange (planned
    as a single Sort) — block-distinct rows are the only thing that
    crosses it."""
    import ray.data as rd
    from htmlreader_ray.functions.analytics import activity_streaks

    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array([0, 86_400_000_000, 0],
                       pa.int64()).cast(pa.timestamp("us"))}))
    ops = _shuffle_ops(activity_streaks(ev))
    assert ops == ["Sort"], ops


def test_combine_aggregate_single_shuffle(ray_session):
    """combine_aggregate — the helper under most of the query surface —
    plans exactly ONE all-to-all (the merge Aggregate over block-local
    partials); the partial pass itself is a plain map. Regressing this
    to two exchanges would double the shuffle volume of ~200 queries."""
    import ray.data as rd
    from htmlreader_ray.functions.shuffle import combine_aggregate

    ds = rd.from_arrow(pa.table({
        "k": pa.array(["a", "b"]), "v": pa.array([1, 2], pa.int64())}))
    for specs in ([("", "count", "n")],
                  [("v", "sum", "s"), ("v", "min", "lo")]):
        ops = _shuffle_ops(combine_aggregate(ds, ["k"], specs))
        assert ops == ["Aggregate"], ops


def test_grouped_gini_shuffle_distribution_not_rows(ray_session):
    """grouped_gini_e6 shuffles only the (key, value) DISTRIBUTION:
    one combiner Aggregate + the map_groups Sort over that bounded
    table; no Join, and the row stream itself never sorts."""
    import ray.data as rd
    from htmlreader_ray.functions.shuffle import grouped_gini_e6

    ds = rd.from_arrow(pa.table({
        "g": pa.array(["a", "a", "b"]),
        "v": pa.array([1, 2, 3], pa.int64())}))
    ops = _shuffle_ops(grouped_gini_e6(ds, ["g"], "v"))
    assert "Join" not in ops and "RandomShuffle" not in ops
    assert ops.count("Aggregate") == 1, ops
    assert ops.count("Sort") == 1, ops


def test_grouped_topk_partials_only_shuffle(ray_session):
    """grouped_topk: block-local head-k partials are the only rows that
    reach the exchange (planned as the map_groups Sort); no extra
    Aggregate/Join sneaks in."""
    import ray.data as rd
    from htmlreader_ray.functions.shuffle import grouped_topk

    ds = rd.from_arrow(pa.table({
        "g": pa.array(["a", "a", "b"]),
        "id": pa.array([1, 2, 3], pa.int64()),
        "v": pa.array([5, 4, 3], pa.int64())}))
    ops = _shuffle_ops(grouped_topk(ds, group_col="g", order_col="v",
                                    id_col="id", k=1))
    assert "Join" not in ops and "Aggregate" not in ops, ops
    assert ops.count("Sort") == 1, ops


def test_user_transition_entropy_single_shuffle(ray_session):
    """user_transition_entropy: ONE coarse user-bucket exchange
    (planned as the map_groups Sort) — same budget as
    activity_streaks; no Aggregate/Join."""
    import ray.data as rd
    from htmlreader_ray.functions.analytics import user_transition_entropy

    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array([0, 1], pa.int64()).cast(pa.timestamp("us")),
        "event_id": pa.array([0, 1], pa.int64()),
        "event_type": ["a", "b"]}))
    ops = _shuffle_ops(user_transition_entropy(ev))
    assert ops == ["Sort"], ops


def test_doc_bigram_entropy_is_map_only(ray_session):
    """doc_bigram_entropy: each document row is complete in its batch,
    so the whole query plans ZERO all-to-all operators."""
    import __ray_entry__ as entrymod

    ds = entrymod.queries()["doc_bigram_entropy"](
        "/root/testdata/sf0.001")
    assert _shuffle_ops(ds) == []


def test_doc_similarity_df_cap_is_constant_in_corpus_size():
    """The round-4 scale flaw: a df cap of n_docs // 25 grows with the
    corpus, so one hot feature could form a (n_docs/25)²-pair group.
    Pin the fixed cap: relative for small corpora, saturating at the
    ABSOLUTE abs_df_cap — constant from there on, so per-feature pair
    fan-out is bounded by a constant (cap²), not by n_docs."""
    from htmlreader_ray.functions.indexing import similarity_df_cap
    assert similarity_df_cap(500) == 20          # relative regime
    assert similarity_df_cap(5_000) == 200       # relative regime
    assert similarity_df_cap(10**6) == 1024      # saturated
    assert similarity_df_cap(10**9) == 1024      # constant in n_docs
    assert similarity_df_cap(10**12) == similarity_df_cap(10**6)
    assert similarity_df_cap(10, abs_df_cap=2) == 2  # floor of 2


def test_doc_similarity_topk_shuffle_budget(ray_session):
    """doc_similarity_topk: the df table is vocabulary-sized, so it is
    hash-JOINED against tf on the feature key — never collected to the
    driver or ray.put-broadcast (the round-4 flaw). Budget: exactly one
    Join; the Sorts are the feature-keyed pair groupby and the per-pair
    score sum Aggregate's machinery — and no RandomShuffle anywhere."""
    from htmlreader_ray.functions.indexing import doc_similarity_topk
    ops = _shuffle_ops(doc_similarity_topk(_docs(ray_session), n_docs=3))
    assert ops.count("Join") == 1, ops
    assert "RandomShuffle" not in ops, ops


def test_doc_similarity_absolute_cap_binds(ray_session):
    """Behavioral pin: a feature shared by more documents than
    abs_df_cap is dropped even when the relative cap (n_docs // 25)
    would keep it — so hot features can never explode pair fan-out."""
    import ray.data as rd
    from htmlreader_ray.functions.indexing import doc_similarity_topk

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(4)), pa.int64()),
        # all four docs share the bigram "hot pair"; each also carries
        # one rare bigram shared by exactly two docs
        "text": ["hot pair rare one", "hot pair rare one",
                 "hot pair rare two", "hot pair rare two"]}))
    # n_docs=1000 → relative cap 40 keeps df=4; abs_df_cap=2 must win
    out = doc_similarity_topk(docs, n_docs=1000, abs_df_cap=2) \
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    # "hot pair" (df=4) and "pair rare" (df=4) dropped; only the two
    # df=2 features ("rare one", "rare two") pair their two docs each
    assert list(map(tuple, out[["doc_a", "doc_b"]].values)) == \
        [(0, 1), (2, 3)]


def test_inverted_index_hot_filter_join_fallback(ray_session):
    """Past broadcast_max_hot, the hot-term filter becomes a term-keyed
    left_anti join instead of a driver collect + ray.put broadcast (the
    hot set is the Zipf head — ≤ n_tokens/df_cap terms, which grows
    with the corpus under a fixed absolute cap). Both paths must agree
    row-for-row."""
    import ray.data as rd
    from htmlreader_ray.functions.indexing import inverted_index

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": ["hot alpha", "hot beta", "hot gamma", "hot delta",
                 "hot alpha", "hot zeta"]}))
    a = inverted_index(docs, df_cap=3).to_pandas() \
        .sort_values("term").reset_index(drop=True)
    b = inverted_index(docs, df_cap=3, broadcast_max_hot=0).to_pandas() \
        .sort_values("term").reset_index(drop=True)
    import pandas.testing as pdt
    pdt.assert_frame_equal(a, b)
    assert a[a.term == "hot"].postings.isna().all()
    ops = _shuffle_ops(inverted_index(docs, df_cap=3,
                                      broadcast_max_hot=0))
    assert ops.count("Join") == 1, ops
