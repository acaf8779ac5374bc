"""Schema-evolution reads over a partitioned snapshot lake: later
snapshots gain a column; one declared-schema read serves the whole
history (old files null-fill, partition pruning intact) without a
mergeSchema footer sweep."""

import pyspark.sql.functions as F


def _land(df, root, snapshot):
    (
        df.withColumn("snapshot_date", F.lit(snapshot))
        .write.mode("append")
        .partitionBy("snapshot_date")
        .parquet(root)
    )


def test_declared_schema_spans_lake_generations(spark, tmp_path):
    from nessus_client_etl_scripts_spark.sources.lake import (
        read_evolved_parquet,
    )

    root = str(tmp_path / "lake")
    gen1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    )
    _land(gen1, root, "20240101")
    # generation 2 added a quality score column
    gen2 = spark.createDataFrame(
        [(3, "c", 0.9)], "id long, name string, quality double"
    )
    _land(gen2, root, "20240102")

    schema = (
        "id long, name string, quality double, snapshot_date string"
    )
    out = read_evolved_parquet(spark, root, schema)
    rows = {r.id: (r.name, r.quality, r.snapshot_date) for r in out.collect()}
    assert rows == {
        1: ("a", None, "20240101"),   # old files null-fill the new column
        2: ("b", None, "20240101"),
        3: ("c", 0.9, "20240102"),
    }

    # partition pruning still fires through the declared-schema read
    pruned = out.filter(F.col("snapshot_date") == "20240102")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert pruned.count() == 1


def test_declared_schema_prunes_retired_columns(spark, tmp_path):
    """Reading YESTERDAY's wider files with a narrower declaration
    drops the retired column at the scan (ReadSchema excludes it)."""
    from nessus_client_etl_scripts_spark.sources.lake import (
        read_evolved_parquet,
    )

    root = str(tmp_path / "lake")
    wide = spark.createDataFrame(
        [(1, "a", "drop-me")], "id long, name string, legacy string"
    )
    _land(wide, root, "20240101")
    out = read_evolved_parquet(
        spark, root, "id long, name string, snapshot_date string"
    )
    assert out.columns == ["id", "name", "snapshot_date"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "legacy" not in plan.split("ReadSchema")[1][:200]
    assert out.count() == 1
