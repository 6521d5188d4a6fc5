"""TableIO seam + stateful streaming operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from workbook_exporter_fe_spark.sources.tableio import TableIO, iceberg_available
from workbook_exporter_fe_spark.streaming.stateful import running_source_stats
from workbook_exporter_fe_spark.streaming.stream_rollup import EVENT_SCHEMA


def test_tableio_parquet_backend_roundtrip(spark, tmp_path):
    io = TableIO(spark, backend="auto")
    # no Iceberg jar in this sandbox → auto must select parquet
    assert not iceberg_available(spark)
    assert io.backend == "parquet"
    df = spark.range(10).select(
        F.col("id"), (F.col("id") % 3).alias("part"), F.lit("a").alias("v")
    )
    path = str(tmp_path / "t")
    io.write(df, path, partition_by=["part"])
    assert io.read(path).count() == 10
    # merge: update one key, insert one
    new = spark.createDataFrame([(3, 0, "UPDATED"), (100, 1, "NEW")], "id long, part long, v string")
    io.merge(new, path, keys=["id"])
    got = {r["id"]: r["v"] for r in io.read(path).collect()}
    assert got[3] == "UPDATED" and got[100] == "NEW" and len(got) == 11


def test_stateful_running_stats(spark, events, tmp_path):
    src = str(tmp_path / "ev")
    events.select("source", "event_ts", "v", "doc_id").write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = (
        running_source_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("running_stats")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["source"]: r
        for r in spark.sql(
            """SELECT * FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY total_events DESC) AS rn
                 FROM running_stats) WHERE rn = 1"""
        ).collect()
    }
    want = {
        r["source"]: r
        for r in events.groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert set(got) == set(want)
    for s, w in want.items():
        assert got[s]["total_events"] == w["n"]
        assert abs(got[s]["total_v"] - w["s"]) < 1e-6
