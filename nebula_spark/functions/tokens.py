"""Token-sequence operators over `tokens array<int>` columns — the
payload-specific toolkit for the tokenized-sequence lake table. All
pure Column expressions except where Arrow batches are genuinely
needed."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from nebula_spark.cdc.binlog import VOCAB


def n_tok(tokens: Column | str) -> Column:
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.size(c)


def validate_sequences(
    df: DataFrame, tokens_col: str = "tokens", n_tok_col: str = "n_tok", vocab: int = VOCAB
) -> DataFrame:
    """Data-quality checks for token rows (the reference's quality-check
    interface, core/interfaces.go:541-552): n_tok invariant, vocab
    range, non-empty. Adds a `_valid` flag + `_violation` reason."""
    c = F.col(tokens_col)
    len_ok = F.size(c) == F.col(n_tok_col)
    range_ok = F.size(F.filter(c, lambda t: (t < 0) | (t >= vocab))) == 0
    nonempty = F.size(c) > 0
    violation = (
        F.when(c.isNull(), "null_tokens")
        .when(~nonempty, "empty")
        .when(~len_ok, "n_tok_mismatch")
        .when(~range_ok, "token_out_of_vocab")
    )
    return df.withColumn("_violation", violation).withColumn(
        "_valid", violation.isNull()
    )


def token_histogram(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Global token-id frequency — explode + count, partial-agg'd."""
    return (
        df.select(F.explode(tokens_col).alias("token_id"))
        .groupBy("token_id")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def sequence_stats(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Corpus-level length stats in one aggregation."""
    n = F.size(F.col(tokens_col))
    return df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n).alias("total_tokens"),
        F.min(n).alias("min_len"),
        F.max(n).alias("max_len"),
        F.avg(n).alias("avg_len"),
        F.expr(f"percentile_approx(size({tokens_col}), 0.5)").alias("p50_len"),
        F.expr(f"percentile_approx(size({tokens_col}), 0.99)").alias("p99_len"),
    )


def pack_sequences(
    df: DataFrame,
    context_len: int = 2048,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    eos_token: int = 0,
) -> DataFrame:
    """Deterministic sequence packing for training: concatenate docs
    (each followed by eos) into packs of ~context_len tokens, binned by
    the doc's global token offset in ``id_col`` order. A doc belongs
    wholly to the pack its first token falls in — packs are therefore
    context_len ± one straddling doc, never a split or truncated
    document.

    The result is a pure function of the input rows: the global offset
    is an exact prefix sum over the total ``id_col`` order, computed in
    two phases so no stage is single-task —

    1. range-repartition on the id, per-partition running sum (window
       within partition);
    2. per-partition totals (one tiny collect, ≤ #partitions rows)
       ordered by each partition's min id → broadcast base offsets.

    Same packs at local[1] and local[1000], any input split layout.
    Output: (pack_id long, tokens array, n_tok int, n_docs long)."""
    from pyspark.sql import Window

    from pyspark.sql import types as T

    sized = df.select(
        F.col(id_col),
        F.col(tokens_col),
        (F.size(tokens_col) + 1).alias("_len"),  # + eos
    ).filter(F.size(tokens_col) + 1 <= context_len)

    spark = df.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    id_type = sized.schema[id_col].dataType
    if isinstance(id_type, T.NumericType):
        # numeric id: bucket on explicit quantile boundaries — the
        # window's own hash exchange on _pid is then the ONLY shuffle
        # before the pack groupBy (repartitionByRange + window would
        # shuffle the token payload twice). Boundary placement doesn't
        # affect the output (any contiguous id-range split reconstructs
        # the same global prefix sum), so approx quantiles are fine.
        probs = [i / n_parts for i in range(1, n_parts)]
        splits = sorted(set(sized.stat.approxQuantile(id_col, probs, 0.001)))
        if splits:
            barr = F.array(*[F.lit(float(b)) for b in splits])
            pid = F.aggregate(
                barr,
                F.lit(0),
                lambda acc, b: acc + (F.col(id_col).cast("double") > b).cast("int"),
            )
        else:
            pid = F.lit(0)
        parted = sized.withColumn("_pid", pid)
    else:
        # non-numeric id: range-partition then use the physical
        # partition id (one extra exchange, still deterministic)
        parted = sized.repartitionByRange(n_parts, id_col).withColumn(
            "_pid", F.spark_partition_id()
        )
    w = Window.partitionBy("_pid").orderBy(id_col)
    local = parted.withColumn("_lcum", F.sum("_len").over(w)).persist()

    # phase 2: base offset per partition. Partition boundaries may vary
    # run-to-run (range sampling), but offsets keyed by each partition's
    # min id reconstruct the SAME global prefix sum regardless.
    totals = sorted(
        local.groupBy("_pid").agg(
            F.sum("_len").alias("_tot"), F.min(id_col).alias("_mn")
        ).collect(),
        key=lambda r: r["_mn"],
    )
    rows, base = [], 0
    for r in totals:
        rows.append((r["_pid"], base))
        base += r["_tot"]
    if not rows:
        rows = [(0, 0)]
    off = spark.createDataFrame(rows, "_pid int, _off long")

    binned = local.join(F.broadcast(off), "_pid", "left").withColumn(
        "_start", F.col("_lcum") - F.col("_len") + F.coalesce("_off", F.lit(0))
    ).withColumn("_bin", F.floor(F.col("_start") / context_len))

    agg = binned.groupBy("_bin").agg(
        F.flatten(
            F.transform(
                # array_sort on (id, tokens) structs → concatenation
                # order is the id order, independent of task order
                F.array_sort(F.collect_list(F.struct(F.col(id_col), F.col(tokens_col)))),
                lambda s: F.concat(
                    s[tokens_col], F.array(F.lit(eos_token).cast("int"))
                ),
            )
        ).alias("tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    # `local` stays persisted until evaluation (the offsets were computed
    # from this materialization); Spark evicts it LRU afterwards
    return agg.select(
        F.col("_bin").cast("long").alias("pack_id"),
        "tokens",
        F.size("tokens").alias("n_tok"),
        "n_docs",
    )
