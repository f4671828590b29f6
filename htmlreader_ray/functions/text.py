"""Text-analysis batch functions for large-scale training-data pipelines.

All functions are map_batches-shaped: ``pa.Table -> pa.Table`` with compiled
regexes / tables at module level (loaded once per worker process). Per-batch
work is vectorized with pyarrow.compute where a kernel exists; the remainder
iterates rows with precompiled regexes (no interpretation inside the loop).

Components: language-ID (stopword-profile heuristic), quality scoring
(length/punct/stopword ratios), token counting (whitespace + BPE-ish regex),
document fingerprinting (md5 + 64-bit rolling hash).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ------------------------------------------------------------ tokenization

_BPE_ISH = re.compile(r" ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)")
_WORD_RE = re.compile(r"\S+")
_PUNCT_RE = re.compile(r"[.,;:!?\"'()\[\]{}]")
_UPPER_RE = re.compile(r"[A-Z\u00c0-\u00de]")


def token_counts(batch: pa.Table, text_col: str = "text",
                 id_col: str = "doc_id") -> pa.Table:
    """(id, n_words, n_tokens_bpe, n_chars). n_words is fully vectorized via
    arrow split; the BPE-ish count uses a compiled regex per row."""
    col = batch.column(text_col)
    n_chars = pc.utf8_length(col)
    trimmed = pc.utf8_trim_whitespace(col)
    n_words = pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))
    # empty strings split to [""] -> count 1; fix to 0
    n_words = pc.if_else(pc.equal(pc.utf8_length(trimmed), 0),
                         pa.scalar(0, pa.int32()), n_words)
    texts = col.to_pylist()
    bpe = pa.array([len(_BPE_ISH.findall(t)) if t else 0 for t in texts],
                   pa.int64())
    return pa.Table.from_arrays(
        [batch.column(id_col), pc.cast(n_words, pa.int64()), bpe,
         pc.cast(n_chars, pa.int64())],
        names=[id_col, "n_words", "n_tokens_bpe", "n_chars"])


# ---------------------------------------------------------------- quality

_STOPWORDS_EN = frozenset("""
the a an and or but if then else of to in on at by for with from as is are
was were be been being this that these those it its not no he she they we you
i his her their our your all any each which who whom what when where why how
""".split())


def quality_scores(batch: pa.Table, text_col: str = "text",
                   id_col: str = "doc_id") -> pa.Table:
    """Length / punctuation / stopword / uppercase ratios + a combined score
    in [0,1]. Deterministic; thresholds follow common web-corpus filters
    (C4/Gopher-style rules, re-derived).

    Every ratio is a SINGLE int/int IEEE division and the composite score a
    fixed left-to-right sum of products — deliberately, so a SQL oracle
    computing the identical expression tree reproduces the doubles
    bit-for-bit (no rounding applied on either side)."""
    texts = batch.column(text_col).to_pylist()
    n = len(texts)
    n_chars = np.empty(n, np.int64)
    n_words = np.empty(n, np.int64)
    punct = np.empty(n, np.float64)
    stop = np.empty(n, np.float64)
    upper = np.empty(n, np.float64)
    mean_wl = np.empty(n, np.float64)
    for i, t in enumerate(texts):
        t = t or ""
        words = _WORD_RE.findall(t)
        n_chars[i] = len(t)
        n_words[i] = len(words)
        punct[i] = len(_PUNCT_RE.findall(t)) / max(1, len(t))
        nw = max(1, len(words))
        stop[i] = sum(1 for w in words if w.lower() in _STOPWORDS_EN) / nw
        upper[i] = len(_UPPER_RE.findall(t)) / max(1, len(t))
        mean_wl[i] = sum(len(w) for w in words) / nw
    # combined score: in-range word length, some stopwords, low punct noise,
    # low shouting, enough words
    score = (
        0.25 * np.minimum(n_words / 50.0, 1.0)
        + 0.25 * ((mean_wl >= 2.5) & (mean_wl <= 10.0)).astype(float)
        + 0.2 * np.minimum(stop / 0.2, 1.0)
        + 0.15 * (punct < 0.1).astype(float)
        + 0.15 * (upper < 0.2).astype(float)
    )
    return pa.Table.from_arrays(
        [batch.column(id_col),
         pa.array(n_chars), pa.array(n_words),
         pa.array(punct), pa.array(stop),
         pa.array(upper), pa.array(mean_wl),
         pa.array(score)],
        names=[id_col, "n_chars", "n_words", "punct_ratio", "stopword_ratio",
               "upper_ratio", "mean_word_len", "quality_score"])


# ---------------------------------------------------------------- lang id

# tiny per-language function-word profiles (public linguistic facts)
_LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is that for with as are was on".split()),
    "de": frozenset("der die das und ist nicht ein eine mit von für den im".split()),
    "fr": frozenset("le la les et de des un une est que pour dans avec".split()),
    "es": frozenset("el la los las y de que en un una es para con por".split()),
    "it": frozenset("il la le e di che un una per con non sono del".split()),
}
_CJK_RE = re.compile(r"[一-鿿]")
_CYRILLIC_RE = re.compile(r"[Ѐ-ӿ]")


def lang_id(batch: pa.Table, text_col: str = "text",
            id_col: str = "doc_id") -> pa.Table:
    """Heuristic language ID: script detection first, then stopword-profile
    scoring; 'und' when nothing scores."""
    texts = batch.column(text_col).to_pylist()
    langs: list[str] = []
    confs: list[float] = []
    for t in texts:
        t = t or ""
        if _CJK_RE.search(t):
            langs.append("zh")
            confs.append(1.0)
            continue
        if _CYRILLIC_RE.search(t):
            langs.append("ru")
            confs.append(1.0)
            continue
        words = [w.lower() for w in _WORD_RE.findall(t)[:500]]
        nw = max(1, len(words))
        best_lang, best = "und", 0.0
        for lang, profile in _LANG_PROFILES.items():
            hits = sum(1 for w in words if w in profile) / nw
            if hits > best:
                best_lang, best = lang, hits
        if best < 0.02:
            best_lang = "und"
        langs.append(best_lang)
        confs.append(round(best, 6))
    return pa.Table.from_arrays(
        [batch.column(id_col), pa.array(langs, pa.string()),
         pa.array(confs, pa.float64())],
        names=[id_col, "pred_lang", "lang_confidence"])


def lang_id_exact(batch: pa.Table, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """Same heuristic as ``lang_id`` but with an EXACT integer contract
    so a SQL oracle can replay it bit-for-bit: scores are word-hit
    COUNTS (the per-doc word total is constant, so the argmax is
    unchanged), the 2% acceptance floor is the cross-multiplied integer
    test ``50*hits >= nw``, ties go to profile order (en de fr es it),
    and confidence is ``conf_e6 = (2_000_000*hits + nw) // (2*nw)``
    — i.e. floor(1e6*hits/nw + 0.5) computed without any float.
    Script detection (CJK -> zh, Cyrillic -> ru) short-circuits with
    conf_e6 = 1_000_000, exactly as the float variant."""
    texts = batch.column(text_col).to_pylist()
    langs: list[str] = []
    confs: list[int] = []
    for t in texts:
        t = t or ""
        if _CJK_RE.search(t):
            langs.append("zh")
            confs.append(1_000_000)
            continue
        if _CYRILLIC_RE.search(t):
            langs.append("ru")
            confs.append(1_000_000)
            continue
        words = [w.lower() for w in _WORD_RE.findall(t)[:500]]
        nw = max(1, len(words))
        best_lang, best = "und", 0
        for lang, profile in _LANG_PROFILES.items():
            hits = sum(1 for w in words if w in profile)
            if hits > best:
                best_lang, best = lang, hits
        if 50 * best < nw:
            best_lang = "und"
        langs.append(best_lang)
        confs.append((2_000_000 * best + nw) // (2 * nw))
    return pa.Table.from_arrays(
        [batch.column(id_col), pa.array(langs, pa.string()),
         pa.array(confs, pa.int64())],
        names=[id_col, "pred_lang", "conf_e6"])


# ------------------------------------------------------------ fingerprints

_ROLL_MOD = (1 << 61) - 1


def fingerprints(batch: pa.Table, text_col: str = "text",
                 id_col: str = "doc_id") -> pa.Table:
    """content_md5 (hex, matches SQL md5()) + a 61-bit Rabin-Karp rolling
    hash of the raw UTF-8 bytes (base 256, mod 2^61-1), evaluated as one
    bigint reduction per doc — no per-byte Python loop. The 0x01 sentinel
    keeps leading NUL bytes significant. The string -> binary cast is
    zero-copy, so neither hash pays a decode + re-encode round trip."""
    import pyarrow.compute as pc
    texts = pc.cast(batch.column(text_col), pa.binary()).to_pylist()
    md5s: list[str] = []
    rolls: list[int] = []
    for t in texts:
        t = t or b""
        md5s.append(hashlib.md5(t).hexdigest())
        rolls.append(int.from_bytes(b"\x01" + t, "big") % _ROLL_MOD)
    return pa.Table.from_arrays(
        [batch.column(id_col), pa.array(md5s, pa.string()),
         pa.array(rolls, pa.int64())],
        names=[id_col, "content_md5", "rolling_hash"])


# ------------------------------------------------------- escape / unescape

def escape_batch(batch: pa.Table, text_col: str = "text",
                 id_col: str = "doc_id",
                 out_col: str = "escaped") -> pa.Table:
    """Vectorized M16: the five-replacement chain as arrow kernels
    (pa.compute.replace_substring — no Python loop)."""
    col = batch.column(text_col)
    col = pc.replace_substring(col, pattern="&", replacement="&amp;")
    col = pc.replace_substring(col, pattern="\xa0", replacement="&nbsp;")
    col = pc.replace_substring(col, pattern='"', replacement="&quot;")
    col = pc.replace_substring(col, pattern="<", replacement="&lt;")
    col = pc.replace_substring(col, pattern=">", replacement="&gt;")
    return pa.Table.from_arrays([batch.column(id_col), col],
                                names=[id_col, out_col])


def unescape_batch(batch: pa.Table, text_col: str = "text",
                   id_col: str = "doc_id",
                   out_col: str = "unescaped") -> pa.Table:
    """M17 over a column: full spec character-reference decoding per row
    (named incl. semicolonless + numeric with win1252 overrides)."""
    from ..kernel.entities import html_unescape
    texts = batch.column(text_col).to_pylist()
    out = pa.array([html_unescape(t or "") for t in texts], pa.string())
    return pa.Table.from_arrays([batch.column(id_col), out],
                                names=[id_col, out_col])


PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+[0-9][0-9-]+[0-9]"


def pii_scrub_batch(batch: pa.Table, text_col: str = "text",
                    id_col: str = "doc_id",
                    out_col: str = "clean_text") -> pa.Table:
    """Redact emails and phone numbers from a text column — fully
    Arrow-vectorized (RE2 kernels, zero Python per row). The patterns are
    RE2-compatible on both sides of the correctness gate: pyarrow.compute
    and DuckDB regexp_replace(..., 'g') both run RE2, so results are
    bit-comparable against a SQL oracle. ``n_pii`` counts redactions."""
    col = batch.column(text_col)
    n = pc.add(
        pc.count_substring_regex(col, pattern=PII_EMAIL_RE),
        pc.count_substring_regex(col, pattern=PII_PHONE_RE)).cast(pa.int64())
    col = pc.replace_substring_regex(col, pattern=PII_EMAIL_RE,
                                     replacement="<EMAIL>")
    col = pc.replace_substring_regex(col, pattern=PII_PHONE_RE,
                                     replacement="<PHONE>")
    return pa.Table.from_arrays([batch.column(id_col), col, n],
                                names=[id_col, out_col, "n_pii"])


def _split_words_flat(col):
    """Split a string column on ``\\s+`` and drop empty tokens, returning
    (row_ids, words). Empty tokens arise only at string boundaries, so
    dropping them cannot change interior adjacency — and the SQL oracles
    apply the identical filter, making the word multisets equal by
    construction (no trim-semantics divergence on exotic whitespace)."""
    import numpy as np
    lists = pc.split_pattern_regex(col, r"\s+")
    lists = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) \
        else lists
    offsets = lists.offsets.to_numpy(zero_copy_only=False)
    row_ids = np.repeat(np.arange(len(lists), dtype=np.int64),
                        np.diff(offsets))
    words = lists.flatten()
    nonempty = pc.greater(pc.binary_length(words), 0)
    mask = nonempty.to_numpy(zero_copy_only=False)
    return row_ids[mask], words.filter(nonempty)


def word_repetition_batch(batch: pa.Table, text_col: str = "text",
                          id_col: str = "doc_id") -> pa.Table:
    """Repetition-based quality signals (the word-level core of the
    Gopher/MassiveText repetition filters, Rae et al. 2021 table A1):
    ``dup_word_frac``  = 1 - distinct_words / total_words
    ``top_word_frac``  = occurrences of the most frequent word / total.
    Whitespace-only rows are dropped (mirrors the SQL oracle's filter).

    Fully vectorized: one Arrow regex split, then two Arrow group_by
    aggregations over (row, word) — no Python loop over rows or words.
    The n-gram variants (dup-5..10-gram, top-2..4-gram) reuse the same
    (row, gram) group_by kernel with a windowed join of adjacent words.
    """
    import numpy as np
    row_ids, words = _split_words_flat(batch.column(text_col))
    ids = batch.column(id_col)
    flat = pa.table({"row": row_ids, "word": words})
    per_word = flat.group_by(["row", "word"]).aggregate([("word", "count")])
    per_row = per_word.group_by("row").aggregate(
        [("word_count", "sum"), ("word_count", "max"), ("row", "count")])
    order = pc.array_sort_indices(per_row.column("row"))
    per_row = per_row.take(order)
    rows = per_row.column("row")
    total = per_row.column("word_count_sum").to_numpy(zero_copy_only=False)
    top = per_row.column("word_count_max").to_numpy(zero_copy_only=False)
    distinct = per_row.column("row_count").to_numpy(zero_copy_only=False)
    dup_frac = 1.0 - distinct.astype(np.float64) / total
    top_frac = top.astype(np.float64) / total
    return pa.Table.from_arrays(
        [ids.take(rows),
         pa.array(total, pa.int64()),
         pa.array(dup_frac, pa.float64()),
         pa.array(top_frac, pa.float64())],
        names=[id_col, "n_words", "dup_word_frac", "top_word_frac"])


def ngram_repetition_batch(batch: pa.Table, n: int = 2,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> pa.Table:
    """Word n-gram repetition signal (the n-gram rows of the Gopher
    repetition-filter table): ``top_{n}gram_frac`` = occurrences of the
    most frequent word n-gram / total n-grams. Documents with fewer than
    ``n`` words drop out (mirrors the SQL oracle). Same vectorized
    (row, gram) group_by kernel as word_repetition_batch; the grams are
    built by one shifted-slice string join, no Python loop."""
    import numpy as np
    row_ids, w = _split_words_flat(batch.column(text_col))
    ids = batch.column(id_col)
    total = len(w)
    if total < n:
        return pa.Table.from_arrays(
            [ids.slice(0, 0), pa.array([], pa.int64()),
             pa.array([], pa.float64())],
            names=[id_col, "n_grams", f"top_{n}gram_frac"])
    shifts = [w.slice(k, total - n + 1) for k in range(n)]
    grams = pc.binary_join_element_wise(*shifts, " ")
    same_row = row_ids[: total - n + 1] == row_ids[n - 1:]
    grams = grams.filter(pa.array(same_row))
    gram_rows = row_ids[: total - n + 1][same_row]
    flat = pa.table({"row": gram_rows, "gram": grams})
    per_gram = flat.group_by(["row", "gram"]).aggregate([("gram", "count")])
    per_row = per_gram.group_by("row").aggregate(
        [("gram_count", "sum"), ("gram_count", "max")])
    order = pc.array_sort_indices(per_row.column("row"))
    per_row = per_row.take(order)
    rows = per_row.column("row").to_numpy(zero_copy_only=False)
    tot = per_row.column("gram_count_sum").to_numpy(zero_copy_only=False)
    top = per_row.column("gram_count_max").to_numpy(zero_copy_only=False)
    return pa.Table.from_arrays(
        [ids.take(pa.array(rows)),
         pa.array(tot, pa.int64()),
         pa.array(top.astype(np.float64) / tot, pa.float64())],
        names=[id_col, "n_grams", f"top_{n}gram_frac"])
