"""Driver-compare type-safety pins.

The per-round correctness gate fetches Spark results and DuckDB oracle
results through DIFFERENT client paths (Arrow / pandas), which coerce
some types asymmetrically:

- DuckDB ``SUM(BIGINT)`` yields HUGEINT (int128) -> float64 through
  pandas ("2260.0"), while Spark's LONG stays int ("2260").
- DECIMAL columns keep their declared scale as Decimal objects on one
  side and become floats on the other ("0.0100" vs "0.01").

Both stringify differently and fail the value-hash even when the
numbers are equal, so the contract is: every oracle output column must
be a plain BIGINT/INT/DOUBLE/VARCHAR/BOOL/DATE/TIMESTAMP, and every
Spark query output must avoid DecimalType.  (Decimals stay INTERNAL to
aggregations for order-independent exactness — they just never reach
the result surface.)  This pins round 2's four hash-FAIL root causes:
priority_shipments, events_value_stats, doc_quality_by_source,
corpus_prep_stats.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from cloudwatch_sematext_aws_lambda_log_shipper_spark.schemas import TEST_TABLES

BANNED_DUCK = ("HUGEINT", "UHUGEINT", "DECIMAL", "INT128")


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TEST_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_no_hugeint_or_decimal_in_oracle_outputs(duck):
    bad = {}
    for name, sql in entrymod.oracle_sql().items():
        rows = duck.execute(f"DESCRIBE SELECT * FROM ({sql}) q").fetchall()
        sus = {r[0]: r[1] for r in rows if any(b in r[1] for b in BANNED_DUCK)}
        if sus:
            bad[name] = sus
    assert not bad, f"oracle outputs with driver-unsafe types: {bad}"


def test_no_decimal_in_spark_query_outputs(registry_frames):
    bad = {}
    for name, df in registry_frames.items():
        # .dtypes reads the analyzed schema without executing the plan
        dec = [(c, t) for c, t in df.dtypes if "decimal" in t]
        if dec:
            bad[name] = dec
    assert not bad, f"Spark outputs with DecimalType (driver-unsafe): {bad}"
