"""Driver-contract consistency checks (no Ray execution needed)."""

import sys

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod  # noqa: E402


def test_oracle_keys_subset_of_queries():
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    missing = oracles - qs
    assert not missing, f"oracle_sql keys without queries: {missing}"


def test_query_count_and_oracle_coverage():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 30
    # at least 60% of queries are SQL-verified
    assert len(oracles) / len(qs) >= 0.6, (len(oracles), len(qs))


def test_all_queries_are_callables():
    for name, fn in entrymod.queries().items():
        assert callable(fn), name


def test_oracles_are_valid_sql():
    import duckdb
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')")
    for name, sql in entrymod.oracle_sql().items():
        con.sql(sql).fetchone()  # raises on invalid SQL
