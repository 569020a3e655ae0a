from __future__ import annotations

import json

from pyspark.sql import types as T

from log_analysis_spark.sources import readers, sinks

INNER = T.StructType(
    [
        T.StructField("request_id", T.StringType()),
        T.StructField("code", T.IntegerType()),
    ]
)


def test_read_json_array(spark, tmp_path):
    p = tmp_path / "arr.json"
    p.write_text(json.dumps([{"request_id": "a", "code": 200}, {"request_id": "b", "code": 404}], indent=2))
    df = readers.read_json_array(spark, str(p), INNER)
    assert df.count() == 2
    assert {r["code"] for r in df.collect()} == {200, 404}


def test_read_ndjson(spark, tmp_path):
    p = tmp_path / "nd.json"
    p.write_text('{"request_id":"a","code":1}\n{"request_id":"b","code":2}\n')
    assert readers.read_ndjson(spark, str(p), INNER).count() == 2


def test_read_delimited_text(spark, tmp_path):
    p = tmp_path / "bes.log"
    p.write_text("1700|&|inst-1|&|123|&|info|&|hello\n1701|&|inst-2|&|456|&|error|&|boom\n")
    df = readers.read_delimited_text(
        spark, str(p), ["epoch", "instance", "pid", "type", "msg"]
    )
    rows = {r["pid"]: r for r in df.collect()}
    assert rows["123"]["type"] == "info" and rows["456"]["msg"] == "boom"


def test_unwrap_envelope_drops_malformed(spark, tmp_path):
    # CloudWatch-style envelope: {message: "<json-string>"} incl. one bad row
    p = tmp_path / "env.json"
    lines = [
        json.dumps({"message": json.dumps({"request_id": "a", "code": 200})}),
        json.dumps({"message": "NOT JSON AT ALL"}),
        json.dumps({"message": json.dumps({"request_id": "b", "code": 500})}),
    ]
    p.write_text("\n".join(lines))
    raw = spark.read.json(str(p))
    out = readers.unwrap_envelope(raw, "message", INNER)
    assert out.count() == 2
    assert {r["request_id"] for r in out.collect()} == {"a", "b"}


def test_csv_and_partitioned_sinks(spark, transcripts, tmp_path):
    small = transcripts.select("conv_id", "turn_idx", "role").limit(50)
    sinks.write_csv(small, str(tmp_path / "csv"))
    back = spark.read.option("header", True).csv(str(tmp_path / "csv"))
    assert back.count() == 50

    sinks.write_partitioned(small, str(tmp_path / "part"), ["role"])
    back2 = spark.read.parquet(str(tmp_path / "part"))
    assert back2.count() == 50
    assert set(back2.columns) == {"conv_id", "turn_idx", "role"}
