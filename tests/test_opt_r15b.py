"""Round-15 optimization pin (second batch): the hamming near-dup
blockers consume their (id, hash) input in FOUR subplans (both
self-join sides of the candidate join + the two verify sides), so
without the lazy localCheckpoint cut an opaque upstream re-evaluates
per branch. These tests feed the operators through an accumulator-
marked mapInArrow upstream and assert the upstream ran its rows ONCE
per action — the regression the cut prevents (local mode: no retries
or speculation, so the accumulator count is deterministic).
"""

from __future__ import annotations

import pyarrow as pa

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.dedup import (
    hamming_near_dup_pairs,
    hamming_near_dup_pairs_chunked,
)


def _marked_hashes(spark, acc, rows, schema):
    src = spark.createDataFrame(rows, schema)

    def bump(batches):
        for b in batches:
            acc.add(b.num_rows)
            yield b

    return src.mapInArrow(bump, schema)


def test_hamming_pairs_evaluates_upstream_once(spark):
    acc = spark.sparkContext.accumulator(0)
    n = 40
    rows = [(i, i % 7, (i * 13) % 11) for i in range(n)]
    hashes = _marked_hashes(
        spark, acc, rows, "media_id long, dh_hi long, dh_lo long"
    )
    hamming_near_dup_pairs(hashes, max_bucket_size=None).collect()
    assert acc.value == n, (
        f"upstream evaluated {acc.value / n:.1f}x; the lazy cut on the "
        "(id, hash) proxy must make it run exactly once"
    )


def test_hamming_pairs_chunked_evaluates_upstream_once(spark):
    acc = spark.sparkContext.accumulator(0)
    n = 40
    rows = [(i, (i * 2654435761) % (1 << 40)) for i in range(n)]
    hashes = _marked_hashes(spark, acc, rows, "media_id long, ph long")
    hamming_near_dup_pairs_chunked(hashes, max_bucket_size=None).collect()
    assert acc.value == n, (
        f"upstream evaluated {acc.value / n:.1f}x; the lazy cut on the "
        "(id, value) proxy must make it run exactly once"
    )
