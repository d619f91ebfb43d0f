"""Local stand-in for the driver's t2 correctness gate.

Runs every queries()[name] on Spark and oracle_sql()[name] on DuckDB
against the same parquet tables, then compares row count, column names,
and an order-insensitive value hash (columns sorted by name, rows
sorted, values stringified with float rounding).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]

Env:
  ORACLE_STRICT=1      driver-parity cell formatting (full float repr)
  ORACLE_SWEEP_OUT=f   also write the per-query result map as JSON to f
                       (the committed ORACLE_SWEEP_r{N}.json artifact —
                       the driver's rotation samples ~50 of the declared
                       queries per round; this records ALL of them)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from cloudwatch_sematext_aws_lambda_log_shipper_spark.schemas import TEST_TABLES
from cloudwatch_sematext_aws_lambda_log_shipper_spark.session import get_spark


STRICT = os.environ.get("ORACLE_STRICT", "") == "1"


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # strict mode mimics the driver: full repr, no rounding slack
        return repr(v) if STRICT else f"{v:.10g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def table_fingerprint(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    return sorted(cols), len(rows), hash(tuple(lines)), lines


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")
    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TEST_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    record: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception as exc:  # a broken query must not hide the rest
            print(f"  {name:35s} ERR  {str(exc)[:120]}")
            failures.append(name)
            record[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": str(exc)[:300],
            }
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"  {name:35s} rows={len(srows):8d}  (no oracle, rows-only) {dt:5.1f}s")
            record[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(srows), "oracle_rows": None,
                "err": "no_oracle", "sec": round(dt, 1),
            }
            continue
        ocols_rows = con.execute(oracles[name])
        orows = ocols_rows.fetchall()
        ocols = [d[0] for d in ocols_rows.description]
        sc, sn, sh, slines = table_fingerprint(scols, srows)
        oc, on, oh, olines = table_fingerprint(ocols, orows)
        ok = (sc == oc) and (sn == on) and (sh == oh)
        status = "OK " if ok else "FAIL"
        print(f"  {name:35s} {status} rows={sn}/{on} {dt:5.1f}s")
        record[name] = {
            "rows_match": sn == on, "schema_match": sc == oc,
            "hash_match": sh == oh, "spark_rows": sn, "oracle_rows": on,
            "err": None, "sec": round(dt, 1),
        }
        if not ok:
            failures.append(name)
            if sc != oc:
                print(f"    cols spark={sc}\n    cols duck ={oc}")
            sset, oset = set(slines), set(olines)
            for diff, label in ((sset - oset, "spark-only"), (oset - sset, "duck-only")):
                for line in sorted(diff)[:5]:
                    print(f"    {label}: {line.replace(chr(31), ' | ')}")
    out = os.environ.get("ORACLE_SWEEP_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(record, f, indent=1)
            f.write("\n")
        print(f"wrote {len(record)} results to {out}")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all oracle checks passed")


if __name__ == "__main__":
    main()
