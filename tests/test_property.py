"""Property-based replay equivalence (hypothesis): for ANY event log,
ANY split into batches, and ANY delivery order, replay-to-final-state
equals a trivial in-memory LWW fold. This is the commutativity /
order-independence contract of the merge stated as a law instead of a
handful of fixed scenarios."""

import tempfile

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import types as T

from nebula_spark.lake import LakeTable, merge_into

_OPS = ("INSERT", "UPDATE", "DELETE")

_events = st.lists(
    st.tuples(
        st.sampled_from(_OPS),
        st.integers(min_value=0, max_value=5),  # key space of 6: forces collisions
        st.integers(min_value=0, max_value=10_000),
    ),
    min_size=1,
    max_size=24,
)

_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
    ]
)


def _python_lww(events):
    """The 20-line oracle: per key keep the max-seq event; DELETE wins
    removal."""
    last = {}
    for seq, (op, key, val) in enumerate(events):
        last[key] = (seq, op, val)
    return {
        f"k{key}": val for key, (_, op, val) in last.items() if op != "DELETE"
    }


def _python_lww_partial(delivered):
    """LWW oracle over an arbitrary (possibly duplicated) subset of
    (seq, op, key, val) deliveries — max-seq wins per key."""
    last = {}
    for seq, op, key, val in sorted(delivered):
        last[key] = (op, val)
    return {f"k{key}": val for key, (op, val) in last.items() if op != "DELETE"}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=_events, data=st.data())
def test_any_split_any_order_converges(spark, events, data):
    # split the log into 1-4 contiguous batches, delivered in any order
    n = len(events)
    n_cuts = data.draw(st.integers(min_value=0, max_value=min(3, n - 1)))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=n - 1),
                min_size=n_cuts,
                max_size=n_cuts,
                unique=True,
            )
        )
        if n > 1
        else []
    )
    bounds = [0] + cuts + [n]
    batches = [
        [(seq, *events[seq]) for seq in range(lo, hi)]
        for lo, hi in zip(bounds, bounds[1:])
    ]
    order = data.draw(st.permutations(range(len(batches))))

    table = LakeTable.create(
        tempfile.mkdtemp(prefix="nebula_prop_") + "/t", _SCHEMA, "k", n_buckets=2
    )
    for i in order:
        rows = [
            (seq, op, f"k{key}", None if op == "DELETE" else val)
            for seq, op, key, val in batches[i]
        ]
        df = spark.createDataFrame(
            rows, "op_sequence long, op string, k string, v long"
        )
        merge_into(spark, table, df, epoch=i)

    got = {r["k"]: r["v"] for r in table.read(spark).collect()}
    assert got == _python_lww(events)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=_events, data=st.data())
def test_map_only_replay_converges_with_duplicates(spark, events, data):
    """Map-only MoR (dedup_how='none'): for ANY log, ANY batch split,
    ANY order, AND re-delivered (duplicated) batches under fresh
    epochs, the read fold alone reaches the same LWW final state —
    no in-batch dedup anywhere."""
    n = len(events)
    n_cuts = data.draw(st.integers(min_value=0, max_value=min(3, n - 1)))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=n - 1),
                min_size=n_cuts,
                max_size=n_cuts,
                unique=True,
            )
        )
        if n > 1
        else []
    )
    bounds = [0] + cuts + [n]
    batches = [
        [(seq, *events[seq]) for seq in range(lo, hi)]
        for lo, hi in zip(bounds, bounds[1:])
    ]
    order = list(data.draw(st.permutations(range(len(batches)))))
    # duplicate one batch at the end under a fresh epoch
    dup = data.draw(st.integers(min_value=0, max_value=len(batches) - 1))
    deliveries = [(i, i) for i in order] + [(dup, len(batches))]

    table = LakeTable.create(
        tempfile.mkdtemp(prefix="nebula_prop_mo_") + "/t",
        _SCHEMA,
        "k",
        n_buckets=2,
        properties={"merge_mode": "mor"},
    )
    delivered = []
    for src, epoch in deliveries:
        rows = [
            (seq, op, f"k{key}", None if op == "DELETE" else val)
            for seq, op, key, val in batches[src]
        ]
        df = spark.createDataFrame(
            rows, "op_sequence long, op string, k string, v long"
        )
        merge_into(spark, table, df, epoch=epoch, dedup_how="none")
        delivered.extend(batches[src])
        # read after EVERY delivery (incl. the first, where buckets can
        # be single map-only files) and compare ROW LISTS, not a dict —
        # a dict keyed by k silently collapses duplicate row versions,
        # which is exactly the defect the fold-skip path can produce
        got_rows = sorted(
            (r["k"], r["v"]) for r in table.read(spark).collect()
        )
        oracle_now = _python_lww_partial(delivered)
        assert got_rows == sorted(oracle_now.items())

    assert dict(got_rows) == _python_lww(events)
