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
    len_col: str | None = None,
) -> DataFrame:
    """Deterministic sequence packing for training: concatenate docs
    (each followed by eos) into packs of ~context_len tokens, binned by
    the doc's global token offset in ``id_col`` order. A doc belongs
    wholly to the pack its first token falls in — packs are therefore
    context_len ± one straddling doc, never a split or truncated
    document. ``id_col`` values must be unique (the lake table's merge
    key is): duplicate ids would make the id order — and therefore the
    concatenation order — ambiguous.

    The result is a pure function of the input rows: the global offset
    is an exact prefix sum over the total ``id_col`` order, computed in
    two phases so no stage is single-task —

    1. bucket ids on driver-inlined boundary literals (quantiles for
       numeric ids, a seeded sample's quantiles for strings) — a pure,
       recompute-safe expression, so NOTHING is cached (at 100 TB the
       token payload must never be persisted); per-bucket running sum
       via a rows-frame window;
    2. per-bucket totals from a cheap column-pruned aggregation (one
       tiny collect, ≤ #buckets rows) ordered by each bucket's min id
       → broadcast base offsets.

    Boundary *placement* never affects the output — any contiguous
    id-range split reconstructs the same global prefix sum — so the
    approximate quantiles/sample only steer balance. Same packs at
    local[1] and local[1000], any input split layout.

    ``len_col``: a pre-stored token count (e.g. the lake's ``n_tok``)
    lets the phase-1/2 scans prune the token array column entirely.
    Output: (pack_id long, tokens array, n_tok int, n_docs long)."""
    from pyspark.sql import Window

    from pyspark.sql import types as T

    length = (
        F.col(len_col).cast("long") if len_col else F.size(tokens_col).cast("long")
    ) + 1  # + eos
    sized = df.select(
        F.col(id_col), F.col(tokens_col), length.alias("_len")
    ).filter(length <= context_len)

    spark = df.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    id_type = sized.schema[id_col].dataType
    if isinstance(id_type, T.NumericType):
        probs = [i / n_parts for i in range(1, n_parts)]
        # quantiles over the RAW id column, unfiltered: boundary
        # placement never affects the output (any contiguous id-range
        # split reconstructs the same global prefix sum — see the
        # docstring invariant), so the boundary job does not need the
        # length filter. Dropping it prunes the scan to the id column
        # alone — the old form filtered on _len, which forced a full
        # tokenize pass (the token column is usually a derived
        # expression) just to steer balance.
        splits = sorted(set(df.select(id_col).stat.approxQuantile(id_col, probs, 0.001)))
        bound_lits = [F.lit(float(b)) for b in splits]
        id_cmp = F.col(id_col).cast("double")
    else:
        # string ids: boundaries from a seeded sample's quantiles,
        # collected once on the driver and inlined as literals (the
        # sample is tiny: ~128 ids per target bucket). This replaces
        # the old repartitionByRange + spark_partition_id shape, which
        # shuffled the token payload an extra time AND forced a persist
        # (physical partition ids aren't recompute-stable).
        n_rows = df.select(id_col).count()
        frac = min(1.0, (128.0 * n_parts) / max(n_rows, 1))
        samp = sorted(
            r[0]
            for r in df.select(id_col).sample(False, frac, seed=42).collect()
            if r[0] is not None
        )
        bounds = []
        if samp:
            step = len(samp) / n_parts
            bounds = sorted({samp[int(i * step)] for i in range(1, n_parts)})
        bound_lits = [F.lit(b) for b in bounds]
        id_cmp = F.col(id_col)
    if bound_lits:
        pid = F.aggregate(
            F.array(*bound_lits),
            F.lit(0),
            lambda acc, b: acc + (id_cmp > b).cast("int"),
        )
    else:
        pid = F.lit(0)
    parted = sized.withColumn("_pid", pid)

    # phase 2 first: base offset per bucket from a column-pruned agg —
    # no window, no token arrays in the scan when len_col is stored.
    # Offsets keyed by each bucket's min id reconstruct the SAME global
    # prefix sum for any boundary placement.
    totals = sorted(
        parted.groupBy("_pid").agg(
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

    # rows frame, not the default RANGE frame: RANGE would give every
    # duplicate orderBy value the same cumulative sum (ids are unique
    # by contract, but rows is correct even when the contract is broken)
    w = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = (
        parted.withColumn("_lcum", F.sum("_len").over(w))
        .join(F.broadcast(off), "_pid", "left")
        .withColumn(
            "_start", F.col("_lcum") - F.col("_len") + F.coalesce("_off", F.lit(0))
        )
        .withColumn("_bin", F.floor(F.col("_start") / context_len))
    )

    # NOTE(scale): this groupBy is the second exchange of the token
    # payload (after the window's). A split plan — pack complete bins
    # per _pid partition (no exchange: HashPartitioning(_pid) satisfies
    # groupBy(_pid, _bin)) and merge only the ≤1-per-boundary straddler
    # bins — would shuffle the payload once, but both branches would
    # re-run the window sort (Spark only reuses the exchange, not
    # post-shuffle operators), doubling the dominant CPU stage.
    # Measured trade favors the single-plan double shuffle; revisit if
    # shuffle IO, not CPU, becomes the bottleneck on the target cluster.
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
    return agg.select(
        F.col("_bin").cast("long").alias("pack_id"),
        "tokens",
        F.size("tokens").alias("n_tok"),
        "n_docs",
    )
