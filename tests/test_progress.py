"""Progress reporting (#44): StatusTracker task progress + observed row
counts + job-group cancel (mis:1120-1131, 1215-1218)."""

from __future__ import annotations

import datetime as dt
import logging

from flink_job_spark.pipeline import IngestConfig, snapshot_ingest
from flink_job_spark.progress import ProgressReporter
from flink_job_spark.sources.tables import load_table


def test_progress_reporter_captures_task_progress(spark):
    def slow(batches):
        import time
        for pdf in batches:
            time.sleep(0.05)
            yield pdf

    df = spark.range(0, 1_000, 1, 32).mapInPandas(slow, "id long")
    with ProgressReporter(spark, "t_progress", interval=0.02) as rep:
        assert df.count() == 1_000
    assert rep.events, "no progress events captured"
    assert any("tasks" in e for e in rep.events)


def test_ingest_progress_logs_observed_rows(spark, sf_dir, tmp_path, caplog):
    nat = load_table(spark, sf_dir, "nation")
    cfg = IngestConfig(mode="replace", load_dttm=dt.datetime(2026, 1, 1),
                       progress=True)
    with caplog.at_level(logging.INFO, logger="flink_job_spark.pipeline"):
        res = snapshot_ingest(spark, nat, "nation", str(tmp_path / "n"),
                              "n_nationkey", cfg)
    assert res.ok
    # exact observed write count, no second scan (mis:1132-1134)
    assert any("Total emitted in this run: 25" in r.message for r in caplog.records)


def test_progress_reporter_cancel(spark):
    """cancel() aborts the watched job group (the reference's cancel flag).
    Job groups are thread-local: the action runs on the thread that entered
    the reporter; cancel comes from a side thread (signal-handler pattern)."""
    import threading

    def slow(batches):
        import time
        for pdf in batches:
            time.sleep(2)
            yield pdf

    df = spark.range(0, 320, 1, 32).mapInPandas(slow, "id long")
    with ProgressReporter(spark, "t_cancel", interval=0.05) as rep:
        killer = threading.Timer(0.5, rep.cancel)
        killer.start()
        try:
            import pytest
            with pytest.raises(Exception, match="(?i)cancel"):
                df.count()
        finally:
            killer.cancel()
