"""Checkpoint recovery: re-running an availableNow drain against the
SAME checkpoint must process only files that arrived since the last
run, and the (fault-tolerant) file sink must hold every input row
exactly once across restarts — the incremental-cron contract
(SURVEY.md §2.1 S8) verified end to end, not just claimed.
"""

from __future__ import annotations


def _drain_to_parquet(spark, src_dir: str, out_dir: str, ckpt_dir: str) -> None:
    stream = (
        spark.readStream.schema("id long, v string").parquet(src_dir)
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_availablenow_restart_processes_only_new_files(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    ).coalesce(1).write.mode("append").parquet(src)
    _drain_to_parquet(spark, src, out, ckpt)
    first = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert first == {(1, "a"), (2, "b")}

    # New file arrives; the restarted drain shares the checkpoint, so
    # the original file must NOT be reprocessed (no duplicates in the
    # exactly-once file sink) while the new one lands exactly once.
    spark.createDataFrame([(3, "c")], "id long, v string").coalesce(
        1
    ).write.mode("append").parquet(src)
    _drain_to_parquet(spark, src, out, ckpt)
    rows = [tuple(r) for r in spark.read.parquet(out).collect()]
    assert sorted(rows) == [(1, "a"), (2, "b"), (3, "c")]
