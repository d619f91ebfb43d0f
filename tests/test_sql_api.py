"""SQL-API parity: the same query through spark.sql over registered
views must equal the DataFrame-API build, and the date-partitioned log
table must prune partitions at the scan."""

from __future__ import annotations

from pyspark.sql import Row

from cloudwatch_sematext_aws_lambda_log_shipper_spark.catalog import (
    register_log_table,
    register_test_tables,
    sql,
)
from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.relational import (
    orders_by_segment,
)


def test_sql_matches_dataframe_api(spark, sf_dir):
    register_test_tables(spark, sf_dir)
    via_sql = sql(
        spark,
        """
        SELECT c_mktsegment,
               count(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """,
    )
    via_df = orders_by_segment(spark, sf_dir)
    assert sorted(map(tuple, via_sql.collect())) == sorted(
        map(tuple, via_df.collect())
    )


def test_log_table_partition_pruning(spark, tmp_path):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.parse import (
        parse_log_events,
        split_dlq,
    )
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.sink import write_log_table

    msgs = [
        '{"message":"a","timestamp":"2024-01-01T00:00:01.000Z"}',
        '{"message":"b","timestamp":"2024-01-02T00:00:01.000Z"}',
        '{"message":"c","timestamp":"2024-01-03T00:00:01.000Z"}',
    ]
    df = spark.createDataFrame(
        [Row(awsRegion="r", logGroup="g", logStream="s", message=m) for m in msgs]
    )
    clean, _ = split_dlq(parse_log_events(df))
    table = str(tmp_path / "logs")
    write_log_table(clean, table, mode="overwrite")
    register_log_table(spark, table, view="logs_pruned")

    q = sql(spark, "SELECT message FROM logs_pruned WHERE log_date = DATE '2024-01-02'")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the date predicate must prune at the scan, not filter post-read
    assert "PartitionFilters" in plan and "log_date" in plan.split("PartitionFilters")[1][:200]
    assert [r.message for r in q.collect()] == ["b"]


def test_exists_subquery_decorrelates_to_semi_join(spark, sf_dir):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.relational import (
        late_shipping_orders,
    )

    df = late_shipping_orders(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the correlated EXISTS must become a semi join with the non-equi
    # date comparison kept as a join residual — never a per-row subplan
    assert "LeftSemi" in plan
    assert "Subquery" not in plan
    assert df.count() > 0
