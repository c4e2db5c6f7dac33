from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from recordmanager_spark.operators import incremental as INC


def test_changed_since(spark):
    rows = [
        Row(_id="1", updated=dt.datetime(2024, 1, 1)),
        Row(_id="2", updated=dt.datetime(2024, 1, 10)),
    ]
    df = spark.createDataFrame(rows)
    got = [r["_id"] for r in INC.changed_since(df, "updated", dt.datetime(2024, 1, 5)).collect()]
    assert got == ["2"]
    # slack pulls the watermark back
    got = sorted(
        r["_id"]
        for r in INC.changed_since(
            df, "updated", dt.datetime(2024, 1, 1, 0, 0, 3), slack_seconds=5
        ).collect()
    )
    assert got == ["1", "2"]


def test_mark_unseen_deleted(spark):
    stored = spark.createDataFrame(
        [Row(_id="a", deleted=False), Row(_id="b", deleted=False), Row(_id="c", deleted=True)]
    )
    seen = spark.createDataFrame([Row(_id="a")])
    out = {r["_id"]: r["deleted"] for r in INC.mark_unseen_deleted(stored, seen, "_id").collect()}
    assert out == {"a": False, "b": True, "c": True}


def test_unseen_ids(spark):
    stored = spark.createDataFrame([Row(_id="a"), Row(_id="b")])
    seen = spark.createDataFrame([Row(_id="b")])
    assert [r["_id"] for r in INC.unseen_ids(stored, seen, "_id").collect()] == ["a"]


def test_propagate_dirty_to_hosts(spark):
    records = spark.createDataFrame(
        [
            Row(_id="s.host1", source_id="s", linking_id=["h1"], host_record_id=[]),
            Row(_id="s.host2", source_id="s", linking_id=["h2"], host_record_id=[]),
            Row(_id="s.c1", source_id="s", linking_id=["c1"], host_record_id=["h1"]),
        ]
    )
    changed = records.where("_id = 's.c1'")
    dirty = [r["_id"] for r in INC.propagate_dirty_to_hosts(records, changed).collect()]
    assert dirty == ["s.host1"]


def test_watermark_store(tmp_path):
    from recordmanager_spark.streaming.pipeline import WatermarkStore

    ws = WatermarkStore(str(tmp_path / "state.json"))
    assert ws.get("k") is None
    ws.set("k", "2024-01-01T00:00:00")
    assert ws.get("k") == "2024-01-01T00:00:00"
