"""FlatMessage edge parser: typed explode, pre-image alignment, DDL and
malformed-input handling."""

from __future__ import annotations

import json

from canal_spark.sources.flat_message import parse_flat_messages


def _msg(**kw):
    base = {
        "id": 1,
        "database": "db",
        "table": "t",
        "pkNames": ["k"],
        "isDdl": False,
        "type": "UPDATE",
        "es": 1000,
        "ts": 2000,
        "sql": "",
        "data": [{"k": "1", "v": "new1"}, {"k": "2", "v": "new2"}],
        "old": [{"v": "old1"}, {"v": "old2"}],
    }
    base.update(kw)
    return json.dumps(base)


def test_explode_aligns_old_row_with_data_row(spark):
    df = spark.createDataFrame([(_msg(),)], "msg string")
    rows = parse_flat_messages(df).orderBy("row_index").collect()
    assert len(rows) == 2
    assert rows[0]["row"]["v"] == "new1" and rows[0]["old_row"]["v"] == "old1"
    assert rows[1]["row"]["v"] == "new2" and rows[1]["old_row"]["v"] == "old2"
    assert rows[0]["op"] == "UPDATE" and rows[0]["msg_id"] == 1


def test_insert_has_no_pre_image(spark):
    df = spark.createDataFrame(
        [(_msg(type="INSERT", old=None),)], "msg string"
    )
    rows = parse_flat_messages(df).collect()
    assert len(rows) == 2 and all(r["old_row"] is None for r in rows)


def test_ddl_and_malformed_messages_are_dropped(spark):
    msgs = [
        (_msg(isDdl=True, type="ALTER", data=None, old=None),),
        ("{not json",),
        (_msg(id=7),),
    ]
    df = spark.createDataFrame(msgs, "msg string")
    rows = parse_flat_messages(df).collect()
    assert {r["msg_id"] for r in rows} == {7}
