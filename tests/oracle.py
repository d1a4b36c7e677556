"""DuckDB replay oracle — the reference state for final-table
equivalence (FIXTURES.md §5). Folds the change log in op_sequence order
to last-writer-wins final state, entirely outside Spark."""

from __future__ import annotations

import duckdb


def replay_final_state(
    binlog_parquet_glob: str,
    base_parquet: str | None = None,
    where: str = "",
    order: str = "DESC",
):
    """Return DuckDB relation of the expected final table
    (doc_id, tokens, n_tok, source), LWW over op_sequence; DELETE wins
    remove. ``base_parquet`` rows act as op_sequence=-1 INSERTs.
    ``where``: extra predicate on the binlog scan (e.g. a
    ``source_table`` route filter for multi-table streams).
    ``order``: 'DESC' = last-writer-wins (default); 'ASC' =
    first-writer-wins (the MIN op_sequence event per key decides)."""
    assert order in ("DESC", "ASC")
    con = duckdb.connect()
    base_cte = (
        f"SELECT -1::BIGINT AS op_sequence, 'INSERT' AS op, doc_id, tokens, "
        f"n_tok, source FROM read_parquet('{base_parquet}') UNION ALL "
        if base_parquet
        else ""
    )
    cond = f"WHERE {where}" if where else ""
    q = f"""
    SELECT doc_id, tokens, n_tok, source FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY op_sequence {order}) rn
      FROM ({base_cte}
            SELECT op_sequence, op, doc_id, tokens, n_tok, source
            FROM read_parquet('{binlog_parquet_glob}') {cond})
    ) WHERE rn = 1 AND op <> 'DELETE'
    ORDER BY doc_id
    """
    return con.sql(q).fetchall()


def rows_from_spark(df):
    """Spark final table → sorted comparable tuples."""
    return sorted(
        (r["doc_id"], list(r["tokens"]) if r["tokens"] is not None else None,
         r["n_tok"], r["source"])
        for r in df.select("doc_id", "tokens", "n_tok", "source").collect()
    )


def assert_equivalent(spark_df, oracle_rows):
    got = rows_from_spark(spark_df)
    want = sorted(
        (d, list(t) if t is not None else None, n, s) for d, t, n, s in oracle_rows
    )
    assert len(got) == len(want), f"row count {len(got)} != oracle {len(want)}"
    for g, w in zip(got, want):
        assert g[0] == w[0], f"doc_id mismatch {g[0]} vs {w[0]}"
        assert g[1] == w[1], f"token-array mismatch for {g[0]}: {g[1]} vs {w[1]}"
        assert g[2] == w[2] and g[3] == w[3], f"payload mismatch for {g[0]}"
