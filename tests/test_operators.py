"""Unit tests for the operator surface: EventFilter, transforms,
skewed dedup, salting bounds, text/dedupe/similarity functions."""

from pyspark.sql import functions as F

from nebula_spark.cdc import gen_binlog
from nebula_spark.cdc.dedup import lww_dedup
from nebula_spark.cdc.filters import EventFilter
from nebula_spark.cdc.transforms import (
    chain,
    column_projection,
    field_mapper,
    filter_transform,
    type_converter,
)


def test_event_filter_ops_and_predicates(spark):
    log = gen_binlog(spark, 2000, 100, seed=1)
    ef = EventFilter(operations=["INSERT"], field_predicates=[("n_tok", "gte", 10)])
    out = ef.apply(log)
    rows = out.select("op", "n_tok").distinct().collect()
    assert all(r["op"] == "INSERT" and r["n_tok"] >= 10 for r in rows)


def test_event_filter_like_and_in(spark):
    log = gen_binlog(spark, 2000, 100, seed=2)
    ef = EventFilter(field_predicates=[("doc_id", "like", "doc-000000%"), ("source", "in", ["web", "code"])])
    out = ef.apply(log).select("doc_id", "source").collect()
    assert all(r["doc_id"].startswith("doc-000000") and r["source"] in ("web", "code") for r in out)


def test_event_filter_pushdown_reaches_scan(spark, tmp_path):
    """The compiled predicate must reach the parquet scan as
    PushedFilters — that's the point of compiling config to a Column."""
    p = str(tmp_path / "log.parquet")
    gen_binlog(spark, 1000, 50, seed=3).write.parquet(p)
    df = EventFilter(operations=["INSERT"]).apply(spark.read.parquet(p))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "op" in plan


def test_transform_chain_semantics(spark):
    df = spark.createDataFrame(
        [(1, "10", "a"), (2, "x", "b"), (3, "30", "c")], "id int, qty string, tag string"
    )
    t = chain(
        type_converter({"qty": "int"}),  # try_cast: 'x' -> null
        filter_transform(F.col("qty").isNotNull()),
        field_mapper({"qty": "quantity"}),
        column_projection(blacklist=["tag"]),
    )
    out = t(df).collect()
    assert [(r["id"], r["quantity"]) for r in out] == [(1, 10), (3, 30)]


def test_skewed_dedup_correct_and_bounded(spark):
    """50% of events on one hot key (FIXTURES §skew): all strategies
    agree, and the salted phase-1 fan-in is bounded by salt buckets."""
    log = gen_binlog(spark, 20_000, 500, seed=7, hot_frac=0.5, n_hot=1)
    a = lww_dedup(log, how="agg").orderBy("doc_id").collect()
    s = lww_dedup(log, how="salted", salt_buckets=16).orderBy("doc_id").collect()
    assert a == s
    hot = [r for r in a if r["doc_id"] == "doc-00000000"]
    assert len(hot) == 1


def test_first_writer_wins(spark):
    log = gen_binlog(spark, 5000, 200, seed=8)
    fww = lww_dedup(log, how="agg", first_writer_wins=True)
    mn = log.groupBy("doc_id").agg(F.min("op_sequence").alias("m"))
    bad = fww.join(mn, "doc_id").filter(F.col("op_sequence") != F.col("m"))
    assert bad.count() == 0


def test_simhash_near_pairs_recall(spark):
    """Identical docs must collide in at least one simhash band."""
    from nebula_spark.functions.dedupe import simhash64, simhash_near_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different text about spark engines and shuffles"),
        ],
        "doc_id long, text string",
    )
    pairs = simhash_near_pairs(simhash64(docs)).collect()
    assert any(p["doc_a"] == 1 and p["doc_b"] == 2 and p["hamming"] == 0 for p in pairs)


def test_merge_plan_prunes_buckets(spark, tmp_path):
    """Bucket pruning: a batch touching few keys must read only the
    touched buckets' files, not the whole table."""
    from nebula_spark.cdc.binlog import SEQUENCE_SCHEMA
    from nebula_spark.lake import LakeTable, merge_into

    table = LakeTable.create(str(tmp_path / "t"), SEQUENCE_SCHEMA, "doc_id", n_buckets=16)
    merge_into(spark, table, gen_binlog(spark, 5000, 1000, seed=4), epoch=0)
    n_buckets_full = len(table.snapshot().files)

    tiny = gen_binlog(spark, 3, 1, seed=5).withColumn(
        "op_sequence", F.col("op_sequence") + 100_000
    )
    res = merge_into(spark, table, tiny, epoch=1)
    assert res.buckets_touched <= 2 < n_buckets_full


def test_lsh_recall_vs_brute_force(spark):
    """Quantify the ANN scale path: on clustered vectors, single-table
    6-plane LSH must recover a substantial fraction of the true top-3
    neighbors (recall is tunable with more tables/fewer planes; this
    pins the floor so regressions surface)."""
    from pyspark.sql import functions as F

    from nebula_spark.functions.similarity import brute_topk, lsh_topk

    # 20 clusters of 25 vectors: cluster direction + small deterministic noise
    emb = spark.range(500).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: (
                F.cos((F.col("id") % 20 + 1) * (j + 1))
                + 0.05 * F.sin(F.col("id") * (j + 13))
            ).cast("float"),
        ).alias("embedding"),
    )
    queries = emb.filter(F.col("vec_id") < 20)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_topk(emb, queries, k=3).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(emb, queries, k=3).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, f"LSH recall collapsed: {recall:.2f}"


def test_dedup_candidate_ops_leave_no_cached_rdds(spark):
    """The LSH candidate/verify path must not leak persisted
    intermediates (a long-lived corpus-dedup driver would accumulate
    cached partitions until LRU pressure) — the groupBy pair-enumeration
    shape needs no cache at all."""
    from pyspark.sql import functions as F

    from nebula_spark.functions.dedupe import (
        minhash_lsh_candidates,
        ngram_jaccard,
        simhash64,
        simhash_near_pairs,
    )

    spark.catalog.clearCache()
    docs = spark.range(300).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(12)),
                lambda i: F.concat(F.lit("w"), ((F.col("id") % 7) * i).cast("string")),
            ),
        ).alias("text"),
    )
    pairs = minhash_lsh_candidates(docs)
    pairs.collect()
    ngram_jaccard(pairs, docs).collect()
    simhash_near_pairs(simhash64(docs)).collect()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0


def test_near_dedup_drops_higher_id_duplicates(spark):
    """End-to-end near-dup removal: verified duplicates drop the
    higher-id doc, unrelated docs survive, chains drop greedily."""
    from nebula_spark.functions.dedupe import near_dedup

    rows = [
        ("d1", "the quick brown fox jumps over the lazy dog again today"),
        ("d2", "the quick brown fox jumps over the lazy dog again today"),  # dup of d1
        ("d3", "the quick brown fox jumps over the lazy dog again tonight"),  # near-dup
        ("d4", "completely different words about spark shuffles and parquet files"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    kept = {r["doc_id"] for r in near_dedup(docs, threshold=0.5, n_hashes=4, band_size=2).collect()}
    assert "d1" in kept and "d4" in kept
    assert "d2" not in kept  # exact dup of d1
    assert "d3" not in kept  # near-dup of d1/d2


def test_ivf_recall_vs_brute_force(spark):
    """IVF with n_probe=4 of 16 cells on clustered vectors must recover
    most true top-3 neighbors (n_probe == n_cells would be exact);
    pins the recall floor so regressions surface."""
    from pyspark.sql import functions as F

    from nebula_spark.functions.similarity import brute_topk, ivf_topk

    emb = spark.range(500).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: (
                F.cos((F.col("id") % 20 + 1) * (j + 1))
                + 0.05 * F.sin(F.col("id") * (j + 13))
            ).cast("float"),
        ).alias("embedding"),
    )
    queries = emb.filter(F.col("vec_id") < 20)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_topk(emb, queries, k=3).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, k=3, n_cells=16, n_probe=4).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.6, f"IVF recall {recall:.2f} below floor"
    # and exactness when every cell is probed
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, k=3, n_cells=8, n_probe=8).collect()
    }
    assert exact == truth
