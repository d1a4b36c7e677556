"""Token ops, packing, multimodal plumbing."""

from pyspark.sql import functions as F

from nebula_spark.cdc import gen_base_table
from nebula_spark.functions.multimodal import (
    FEATURE_DIM,
    extract_features,
    gen_fake_media,
)
from nebula_spark.functions.tokens import (
    pack_sequences,
    sequence_stats,
    token_histogram,
    validate_sequences,
)


def test_validate_sequences_flags(spark):
    base = gen_base_table(spark, 200, seed=1)
    bad = spark.createDataFrame(
        [("x1", [1, 2], 3, "web"), ("x2", [1, -5], 2, "web"), ("x3", [], 0, "web")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    out = validate_sequences(base.unionByName(bad))
    flags = {r["doc_id"]: (r["_valid"], r["_violation"]) for r in out.filter("NOT _valid").collect()}
    assert flags == {
        "x1": (False, "n_tok_mismatch"),
        "x2": (False, "token_out_of_vocab"),
        "x3": (False, "empty"),
    }
    assert out.filter("_valid").count() == 200


def test_token_histogram_and_stats(spark):
    df = spark.createDataFrame(
        [("a", [1, 1, 2], 3, "w"), ("b", [2, 3], 2, "w")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    hist = {r["token_id"]: r["freq"] for r in token_histogram(df).collect()}
    assert hist == {1: 2, 2: 2, 3: 1}
    stats = sequence_stats(df).collect()[0]
    assert stats["n_docs"] == 2 and stats["total_tokens"] == 5 and stats["max_len"] == 3


def test_pack_sequences_shape(spark):
    base = gen_base_table(spark, 500, seed=2, max_tok=64)
    packed = pack_sequences(base, context_len=256, eos_token=0)
    rows = packed.collect()
    assert len(rows) > 0
    # a pack is context_len ± the straddling doc (never split/truncated)
    assert all(len(r["tokens"]) <= 256 + 65 for r in rows)
    assert all(r["n_tok"] == len(r["tokens"]) for r in rows)
    # lossless: every doc lands in exactly one pack, every token kept
    assert sum(r["n_docs"] for r in rows) == 500
    n_in = base.select(F.sum(F.size("tokens") + 1)).first()[0]
    assert sum(len(r["tokens"]) for r in rows) == n_in


def test_pack_sequences_deterministic_across_layout(spark):
    """Same packs whatever the input partitioning / task order — the
    property the round-1 implementation lacked."""
    base = gen_base_table(spark, 400, seed=9, max_tok=48)
    a = {r["pack_id"]: r["tokens"] for r in pack_sequences(base, 128).collect()}
    b = {
        r["pack_id"]: r["tokens"]
        for r in pack_sequences(base.repartition(13), 128).collect()
    }
    c = {
        r["pack_id"]: r["tokens"]
        for r in pack_sequences(base.coalesce(1), 128).collect()
    }
    assert a == b == c


def test_multimodal_feature_extraction(spark):
    media = gen_fake_media(spark, 120, seed=3)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 120
    ok = [r for r in rows if r["error"] is None]
    assert len(ok) == 120
    assert all(r["feature_dim"] == FEATURE_DIM for r in ok)
    # deterministic: same payload -> same feature
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in rows)


def test_multimodal_decode_failure_is_row_not_crash(spark):
    media = gen_fake_media(spark, 10, seed=4).withColumn(
        "payload", F.when(F.col("media_id") == "m-000003", None).otherwise(F.col("payload"))
    )
    rows = extract_features(media).collect()
    errs = [r for r in rows if r["error"] is not None]
    assert len(errs) == 1 and errs[0]["media_id"] == "m-000003"
    assert errs[0]["feature"] is None
