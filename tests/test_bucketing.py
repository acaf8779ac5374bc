"""Bucketed co-located join: the write-once-shuffle-never posture for
fact-to-fact joins (SURVEY.md §4 — bucketing on scan_run_id)."""

import pyspark.sql.functions as F

from nessus_client_etl_scripts_spark.catalog import load_table, write_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        write_bucketed(
            load_table(spark, sf, "orders"), "b_orders", "o_orderkey", 8
        )
        write_bucketed(
            load_table(spark, sf, "lineitem"), "b_lineitem", "l_orderkey", 8
        )
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and the join still computes the right thing
        n = joined.count()
        plain = load_table(spark, sf, "lineitem").join(
            load_table(spark, sf, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert n == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
