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
    """Greedy sequence packing for training: concatenate docs into
    fixed-length contexts (docs separated by eos). Implemented per
    partition with a running-length window — one shuffle by pack key.

    This is the canonical 'what a training-data pipeline needs' op the
    reference has no analogue for: output rows are (pack_id, tokens
    array<int> of exactly context_len, n_docs)."""
    from pyspark.sql import Window

    sized = df.select(
        F.col(id_col),
        F.col(tokens_col),
        (F.size(tokens_col) + 1).alias("_len"),  # + eos
    ).filter(F.size(tokens_col) < context_len)
    # running total within shuffle partition → greedy bin id
    w = Window.partitionBy(F.spark_partition_id()).orderBy(id_col)
    packed = sized.withColumn("_cum", F.sum("_len").over(w)).withColumn(
        "_bin", F.floor((F.col("_cum") - 1) / context_len)
    )
    agg = packed.groupBy(F.spark_partition_id().alias("_part"), "_bin").agg(
        F.flatten(
            F.transform(
                F.collect_list(tokens_col), lambda t: F.concat(t, F.array(F.lit(eos_token)))
            )
        ).alias("_toks"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return agg.select(
        F.concat_ws("-", F.col("_part"), F.col("_bin")).alias("pack_id"),
        F.slice("_toks", 1, context_len).alias("tokens"),
        "n_docs",
    )
