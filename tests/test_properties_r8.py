"""Property-based tests for the round-8 operators.

Char-exact spans: on ARBITRARY small corpora (hypothesis-generated
strings over a tiny alphabet, so collisions actually happen) the
distributed operator must equal a direct pure-Python reference —
duplicated-window marking, interval merging, maximality, and the
removal pass's byte-exact surgery. Streaming SCD2: any batch split of
an update stream yields the same dimension as the one-shot apply when
keys don't repeat across batches, and re-deliveries never change it.
"""

from __future__ import annotations

import datetime
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.dedup import (
    duplicated_char_spans,
    remove_duplicated_char_spans,
)

# tiny alphabet + short L force real duplications in small examples
L = 4
texts = st.lists(
    st.text(alphabet="abc", min_size=0, max_size=24), min_size=1, max_size=6
)


def _ref_spans(docs: list[str], min_len: int, min_count: int = 2):
    """Pure-Python reference: duplicated window positions -> merged
    maximal intervals, 1-based [start, end)."""
    grams = Counter()
    for t in docs:
        for p in range(len(t) - min_len + 1):
            grams[t[p : p + min_len]] += 1
    out = {}
    for i, t in enumerate(docs):
        covered = [
            p + 1
            for p in range(len(t) - min_len + 1)
            if grams[t[p : p + min_len]] >= min_count
        ]
        spans = []
        for p in covered:
            if spans and p <= spans[-1][1]:
                spans[-1] = (spans[-1][0], max(spans[-1][1], p + min_len))
            else:
                spans.append((p, p + min_len))
        out[i] = spans
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=texts)
def test_char_spans_match_pure_python_reference(spark, docs):
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {}
    for r in duplicated_char_spans(df, min_len=L).collect():
        got.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    ref = {i: s for i, s in _ref_spans(docs, L).items() if s}
    assert {k: sorted(v) for k, v in got.items()} == ref


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=texts)
def test_char_span_removal_matches_reference_surgery(spark, docs):
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    ref = _ref_spans(docs, L)
    expected = {}
    for i, t in enumerate(docs):
        kept, prev = [], 1
        for s, e in ref[i]:
            kept.append(t[prev - 1 : s - 1])
            prev = e
        kept.append(t[prev - 1 :])
        expected[i] = "".join(kept)
    got = {r.doc_id: r.clean_text
           for r in remove_duplicated_char_spans(df, min_len=L).collect()}
    assert got == expected


# --- streaming SCD2 batch-split equivalence ------------------------------

TS = datetime.datetime

upd_stream = st.lists(
    st.tuples(
        st.integers(0, 5),                    # key
        st.sampled_from(["x", "y", "z"]),     # attr
        st.integers(1, 20),                    # eff day
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=upd_stream, cut=st.integers(0, 8))
def test_streaming_scd2_split_equals_oneshot_on_disjoint_keys(
    spark, tmp_path_factory, spec, cut
):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.scd import (
        scd2_apply,
    )
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming.scd import (
        StreamingScd2Maintainer,
        fold_last_write_wins,
    )

    # one update per key (fold the random stream first), split at `cut`
    by_key = {}
    for k, a, d in spec:
        if k not in by_key or d >= by_key[k][2]:
            by_key[k] = (k, a, d)
    rows = [(k, a, TS(2021, 1, d)) for k, a, d in by_key.values()]
    cut = min(cut, len(rows))
    schema_u = "k long, attr string, eff_ts timestamp"
    seed = spark.createDataFrame(
        [(k, "seed", TS(2020, 1, 1), None) for k in range(6)],
        "k long, attr string, valid_from timestamp, valid_to timestamp",
    )
    state = str(tmp_path_factory.mktemp("scd") / "dim")
    m = StreamingScd2Maintainer(spark, state, ["k"], ["attr"], seed=seed)
    b1 = spark.createDataFrame(rows[:cut], schema_u) if rows[:cut] else None
    b2 = spark.createDataFrame(rows[cut:], schema_u) if rows[cut:] else None
    bid = 0
    # re-delivering b1 under a fresh batch id after b2: every row is an
    # unchanged update (same attr, same eff) -> scd2 no-op by semantics
    for b in (b1, b2, b1):
        if b is not None:
            m.apply_batch(b, bid)
            bid += 1

    folded = fold_last_write_wins(
        spark.createDataFrame(rows, schema_u), ["k"], ["attr"]
    )
    oneshot = scd2_apply(seed, folded, ["k"], ["attr"])
    snap = lambda df: sorted(
        (r.k, r.attr, str(r.valid_from), str(r.valid_to))
        for r in df.collect()
    )
    assert snap(m.current()) == snap(oneshot)
