"""AQE runtime-replanning proof: the engine's documented answer to hot
keys at 100 TB is adaptive skew-join splitting (session.py turns it
on). This plants a pathologically skewed join small enough for CI and
asserts the ADAPTIVE final plan really did split the hot partition —
the difference between "we set a conf" and "the mechanism fires"."""

import pyspark.sql.functions as F


def test_aqe_splits_skewed_sort_merge_join(spark):
    confs = {
        # force sort-merge (no broadcast escape hatch) and make the
        # skew detector see our toy sizes
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.shuffle.partitions": "8",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        # one hot key carrying 200k fat rows vs 999 cold keys. The
        # payload must be HIGH-ENTROPY (sha2): shuffle blocks are
        # compressed, and a repeated-literal payload deflates below
        # the skew detector's byte threshold
        fact = spark.range(220_000).select(
            F.when(F.col("id") < 200_000, F.lit(7))
            .otherwise(F.col("id") % 999)
            .cast("long")
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"),
            F.concat(F.lit("d"), F.col("id").cast("string")).alias("name"),
        )
        joined = fact.join(dim, "k").groupBy("name").agg(
            F.count(F.lit(1)).alias("n")
        )
        # collect() executes THIS Dataset's QueryExecution, so its
        # adaptive plan is finalized in place and inspectable after
        assert len(joined.collect()) == 999  # keys {7} ∪ {0..998}
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan, final_plan
        assert "skew=true" in final_plan, final_plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
