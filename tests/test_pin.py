"""catalog.pin — the engine's single eager-pin point (VERDICT r17 #3/#5).

Every multi-consumer intermediate routes through pin(): localCheckpoint in
sessions without a checkpoint dir (local/bench — cheap, no FS round-trip),
RELIABLE checkpoint() when the caller configured one (cluster — survives
executor loss). These tests pin the routing and that results are unchanged.
"""

import os

from unfccc_documents_database_sandbox_spark.catalog import pin


def test_pin_local_without_checkpoint_dir(spark):
    assert spark.sparkContext.getCheckpointDir() is None
    df = spark.range(0, 100).withColumnRenamed("id", "v")
    pinned = pin(df)
    assert pinned.count() == 100
    assert [r.v for r in pinned.orderBy("v").limit(3).collect()] == [0, 1, 2]
    # localCheckpoint route: lineage truncated to a materialized RDD scan
    # (.rdd would wrap a NEW conversion RDD, so test the plan, not it)
    assert "LogicalRDD" in pinned._jdf.queryExecution().analyzed().toString()


def test_pin_reliable_with_checkpoint_dir(spark, tmp_path):
    ck = str(tmp_path / "ckpt")
    spark.sparkContext.setCheckpointDir(ck)
    try:
        df = spark.range(0, 50)
        pinned = pin(df)
        assert pinned.count() == 50
        # reliable route: RDD blocks written under the checkpoint dir
        files = [
            os.path.join(r, f)
            for r, _d, fs in os.walk(ck)
            for f in fs
        ]
        assert files, "reliable checkpoint wrote nothing under the dir"
    finally:
        # unset for the rest of the session-scoped fixture's consumers
        # (Scala var setter name carries a $, so reach it via getattr)
        getattr(spark.sparkContext._jsc.sc(), "checkpointDir_$eq")(
            spark.sparkContext._jvm.scala.Option.apply(None)
        )
    assert spark.sparkContext.getCheckpointDir() is None
