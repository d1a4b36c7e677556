"""Deterministic synthetic binlog / base-table generators.

The reference tails real MySQL binlogs / Postgres WAL / Mongo change
streams (/root/reference/pkg/cdc/mysql.go:412-477, postgresql.go:
552-623). In this sandbox there is no database, so — per SURVEY §2.2 —
we synthesize the binlog as an ordered event table with the same
information content: a strictly increasing ``op_sequence`` (the
LSN/binlog-position analogue), an op type, the merge key, and the
after-image of a pre-tokenized training sequence.

Everything is generated from ``spark.range`` with pure column
expressions seeded by ``xxhash64(id, seed)`` — fully distributed (no
driver-side data), and the same (seed, n) always produces byte-identical
rows, which the replay-equivalence tests and the DuckDB oracle rely on.

Shape (FIXTURES.md §2): op mix ≈ 40% INSERT / 45% UPDATE / 15% DELETE,
optional hot-key skew (a configurable fraction of all events hit a few
doc_ids — the adversarial case for per-key ordering, which the
reference would serialize onto one worker via its FNV partitioner,
pkg/cdc/stream.go:461-493).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

VOCAB = 50257  # GPT-2-ish vocab size for token ids

BINLOG_SCHEMA = T.StructType(
    [
        T.StructField("op_sequence", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("txn_id", T.StringType(), True),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("schema_version", T.IntegerType(), False),
    ]
)

# multi-table stream: same envelope + the routing column (the
# reference's TableMap carries (schema, table) per row event,
# pkg/cdc/mysql.go:493-604)
MULTI_BINLOG_SCHEMA = T.StructType(
    list(BINLOG_SCHEMA.fields)
    + [T.StructField("source_table", T.StringType(), False)]
)

SEQUENCE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

_SOURCES = ["web", "books", "code", "wiki"]


def _u(col, seed: int, lo: int = 0, hi: int = 1 << 30):
    """Deterministic pseudo-uniform int in [lo, hi) derived from a column."""
    return (F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(hi - lo)) + F.lit(lo)).cast("long")


def _tokens_expr(id_col, seed: int, max_tok: int):
    """array<int> of deterministic token ids; length in [1, max_tok]."""
    n = (_u(id_col, seed + 1, 1, max_tok + 1)).cast("int")
    base = _u(id_col, seed + 2, 0, VOCAB)
    step = _u(id_col, seed + 3, 1, 997)
    # tokens[j] = (base + j*step) % VOCAB — cheap, deterministic, JVM-side
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda j: F.pmod(base + j.cast("long") * step, F.lit(VOCAB)).cast("int"),
    )


def gen_base_table(
    spark: SparkSession, n_docs: int, seed: int = 42, max_tok: int = 64
) -> DataFrame:
    """The bootstrap snapshot: n_docs pre-tokenized sequences
    (doc_id, tokens array<int>, n_tok, source) — the input_hint shape."""
    df = spark.range(n_docs)
    toks = _tokens_expr(F.col("id"), seed * 7, max_tok)
    return df.select(
        F.format_string("doc-%08d", F.col("id")).alias("doc_id"),
        toks.alias("tokens"),
        F.size(toks).alias("n_tok"),
        F.element_at(
            F.array(*[F.lit(s) for s in _SOURCES]),
            (_u(F.col("id"), seed + 9, 0, len(_SOURCES)) + 1).cast("int"),
        ).alias("source"),
    )


def gen_binlog(
    spark: SparkSession,
    n_events: int,
    n_docs: int,
    seed: int = 42,
    hot_frac: float = 0.0,
    n_hot: int = 1,
    n_partitions: int = 8,
    max_tok: int = 64,
    num_slices: int | None = None,
) -> DataFrame:
    """n_events ordered change events over a doc_id space of n_docs.

    ``hot_frac`` of events are concentrated on doc ids [0, n_hot) —
    the skew case. DELETEs carry null after-images (tokens/n_tok/source),
    like a real binlog delete row (before-image only).
    """
    df = spark.range(0, n_events, numPartitions=num_slices or None)
    seq = F.col("id")

    hot = _u(seq, seed + 11, 0, 1_000_000) < F.lit(int(hot_frac * 1_000_000))
    doc_idx = F.when(hot, _u(seq, seed + 12, 0, max(n_hot, 1))).otherwise(
        _u(seq, seed + 13, 0, n_docs)
    )

    opsel = _u(seq, seed + 14, 0, 100)
    op = (
        F.when(opsel < 40, F.lit("INSERT"))
        .when(opsel < 85, F.lit("UPDATE"))
        .otherwise(F.lit("DELETE"))
    )

    toks = _tokens_expr(seq, seed + 15, max_tok)
    is_del = op == "DELETE"

    return df.select(
        seq.alias("op_sequence"),
        op.alias("op"),
        F.format_string("doc-%08d", doc_idx).alias("doc_id"),
        F.when(is_del, F.lit(None)).otherwise(toks).alias("tokens"),
        F.when(is_del, F.lit(None)).otherwise(F.size(toks)).cast("int").alias("n_tok"),
        F.when(is_del, F.lit(None))
        .otherwise(
            F.element_at(
                F.array(*[F.lit(s) for s in _SOURCES]),
                (_u(seq, seed + 16, 0, len(_SOURCES)) + 1).cast("int"),
            )
        )
        .alias("source"),
        (F.timestamp_seconds(F.lit(1704067200) + seq)).alias("ts"),
        F.format_string("txn-%d", F.floor(seq / F.lit(10)).cast("long")).alias("txn_id"),
        F.pmod(_u(seq, seed + 17), F.lit(n_partitions)).cast("int").alias("partition_id"),
        F.lit(1).alias("schema_version"),
    )


def gen_binlog_evolved(
    spark: SparkSession,
    n_events: int,
    n_docs: int,
    seed: int = 42,
    evolve_at: int | None = None,
    **kwargs,
) -> DataFrame:
    """Binlog with a mid-stream schema evolution (FIXTURES.md §3):
    events at op_sequence ≥ evolve_at carry a new nullable ``lang``
    column and a widened ``n_tok`` (long), preceded by one ``DDL``
    marker row — mirroring a CREATE/ALTER QueryEvent in a real binlog
    (pkg/cdc/mysql.go:701-723). Earlier events have lang = null."""
    evolve_at = n_events // 2 if evolve_at is None else evolve_at
    base = gen_binlog(spark, n_events, n_docs, seed=seed, **kwargs)
    seq = F.col("op_sequence")
    post = seq >= evolve_at
    evolved = base.select(
        "op_sequence",
        F.when(seq == evolve_at, F.lit("DDL")).otherwise(F.col("op")).alias("op"),
        "doc_id",
        "tokens",
        F.col("n_tok").cast("long").alias("n_tok"),
        "source",
        "ts",
        "txn_id",
        "partition_id",
        F.when(post, F.lit(2)).otherwise(F.lit(1)).alias("schema_version"),
        F.when(
            post & (F.col("op") != "DELETE"),
            F.element_at(
                F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
                (_u(seq, seed + 31, 0, 3) + 1).cast("int"),
            ),
        ).alias("lang"),
    )
    return evolved


def write_binlog_chunks(
    df: DataFrame,
    out_dir: str,
    n_chunks: int,
    seq_col: str = "op_sequence",
    files_per_chunk: int = 8,
    bucket_key: tuple[str, int] | None = None,
) -> list[str]:
    """Materialize the binlog as ordered parquet chunk dirs — the file
    roll stands in for binlog rotation (pkg/cdc/mysql.go:480-491). Each
    chunk holds a contiguous op_sequence range so a file-source stream
    that lists chunks in name order replays in order; within a chunk,
    ``files_per_chunk`` files keep the downstream scan parallel (a
    single fat file = a single input split = a serialized read).

    ``bucket_key`` = (key_col, n_buckets): producer-side BUCKET
    ALIGNMENT — each chunk file holds only keys of one bucket residue
    class (real CDC pipelines partition the feed by table/key the same
    way). A bucket-aligned feed lets the map-only MoR merge
    (merge_into dedup_how='none') write with ZERO exchanges and one
    file per (input split, residue): the shuffle the dedup needed is
    done once at capture time instead of once per consumer."""
    import os

    from nebula_spark.lake.table import bucket_expr

    os.makedirs(out_dir, exist_ok=True)
    total = df.count()
    per = max(1, (total + n_chunks - 1) // n_chunks)
    chunk = F.least(
        F.floor(F.col(seq_col) / F.lit(per)), F.lit(n_chunks - 1)
    ).cast("int")
    if bucket_key is not None:
        key_col, n_buckets = bucket_key
        subfile = F.pmod(
            bucket_expr(key_col, n_buckets), F.lit(files_per_chunk)
        ).cast("int")
    else:
        subfile = F.pmod(F.col(seq_col), F.lit(files_per_chunk)).cast("int")
    (
        df.withColumn("_chunk", chunk)
        .repartition(n_chunks * files_per_chunk, F.col("_chunk"), subfile)
        .sortWithinPartitions(seq_col)
        .write.partitionBy("_chunk")
        .mode("overwrite")
        .parquet(out_dir)
    )
    return sorted(
        os.path.join(out_dir, d)
        for d in os.listdir(out_dir)
        if d.startswith("_chunk=")
    )
