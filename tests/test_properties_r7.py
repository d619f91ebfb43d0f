"""Property-based tests for the round-7 third-pass operators.

Misra-Gries: on ARBITRARY streams (hypothesis-generated frequencies and
partitionings) the exact-recount answer must equal brute force, and the
candidate superset guarantee must hold. SCD2: any sequence of update
batches preserves the dimension invariants (exactly one open version
per key, closed intervals tile without overlap, history immutable).

These run the same SparkSession as the rest of the suite; hypothesis
example counts are kept small because each example is a Spark job.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.heavyhitters import (
    heavy_hitters,
    mg_candidates,
)
from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.scd import scd2_apply

# --- Misra-Gries ---------------------------------------------------------

streams = st.lists(
    st.tuples(st.integers(0, 12), st.integers(1, 30)),  # (item id, repeat)
    min_size=1,
    max_size=15,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=streams, k=st.integers(2, 8), parts=st.integers(1, 5))
def test_heavy_hitters_exact_on_random_streams(spark, spec, k, parts):
    rows = [(f"i{i}",) for i, rep in spec for _ in range(rep)]
    df = spark.createDataFrame(rows, "token string").repartition(parts)
    n = len(rows)
    from collections import Counter

    counts = Counter(t for t, in rows)
    expected = {(i, c) for i, c in counts.items() if c * k > n}
    got = {(r.item, r.n) for r in heavy_hitters(df, "token", k=k).collect()}
    assert got == expected
    # superset guarantee on the raw candidates
    cands = {r.item for r in mg_candidates(df, "token", k).collect()}
    assert {i for i, _ in expected} <= cands


# --- SCD2 ----------------------------------------------------------------

batches = st.lists(
    st.dictionaries(
        keys=st.integers(1, 5),  # business key
        values=st.sampled_from(["a", "b", "c"]),  # attr value
        min_size=1,
        max_size=4,
    ),
    min_size=1,
    max_size=3,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seq=batches)
def test_scd2_invariants_under_random_batches(spark, seq):
    dim = spark.createDataFrame(
        [(1, "a", datetime.datetime(2000, 1, 1), None)],
        "k long, attr string, valid_from timestamp, valid_to timestamp",
    )
    for step, batch in enumerate(seq, start=1):
        eff = datetime.datetime(2000 + step, 1, 1)
        upd = spark.createDataFrame(
            [(k, v, eff) for k, v in batch.items()],
            "k long, attr string, eff_ts timestamp",
        )
        dim = scd2_apply(dim, upd, ["k"], ["attr"]).localCheckpoint()

    rows = dim.collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.k, []).append(r)
    for k, versions in by_key.items():
        open_versions = [r for r in versions if r.valid_to is None]
        assert len(open_versions) == 1  # exactly one current version
        # intervals tile: sort by valid_from; each close matches next open
        ordered = sorted(versions, key=lambda r: r.valid_from)
        for prev, nxt in zip(ordered, ordered[1:]):
            assert prev.valid_to == nxt.valid_from  # no gaps, no overlap
        assert ordered[-1].valid_to is None
        # consecutive versions always differ in the tracked attribute
        for prev, nxt in zip(ordered, ordered[1:]):
            assert prev.attr != nxt.attr
