"""Kafka serde/option wiring (S1/S3/S5) and topology visualisation
(§3.3). The kafka connector jar is absent in this container, so source
construction asserts the graceful error; the serde projections and
option translation are tested for real."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from willa_spark import MapValues, run_topology
from willa_spark.model import KEY, TIMESTAMP, VALUE
from willa_spark.sources import kafka as K
from willa_spark import viz


def test_kafka_options_translation():
    opts = K.kafka_options(
        {
            "bootstrap_servers": "b1:9092,b2:9092",
            "topic": "events",
            "starting_offsets": "latest",
            "min_partitions": 64,
            "options": {"failOnDataLoss": False},
        }
    )
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "events",
        "startingOffsets": "latest",
        "minPartitions": "64",
        "failOnDataLoss": "False",
    }


def test_json_serde_roundtrip(spark):
    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    serde = K.json_serde(schema)
    df = spark.createDataFrame([((1, "x"),)], T.StructType([T.StructField("v", schema)]))
    encoded = df.select(serde.encode(F.col("v")).alias("j"))
    assert encoded.collect()[0]["j"] == '{"a":1,"b":"x"}'
    decoded = encoded.select(serde.decode(F.col("j").cast("binary")).alias("v"))
    assert tuple(decoded.collect()[0]["v"]) == (1, "x")


def test_kafka_sink_projection(spark):
    df = spark.createDataFrame(
        [("k", 42, 100)], f"{KEY} string, {VALUE} bigint, {TIMESTAMP} bigint"
    )
    out = K.kafka_sink_columns(df)
    row = out.collect()[0]
    assert bytes(row["key"]) == b"k" and bytes(row["value"]) == b"42"
    assert out.columns == ["key", "value"]


def test_kafka_source_unavailable_is_clear(spark):
    assert K.available(spark) is False
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        K.kafka_source(spark, {"bootstrap_servers": "x:9092", "topic": "t"})


def test_viz_dot_output(spark):
    topo = {
        "entities": {
            "in": {"type": "topic"},
            "s": {"type": "kstream", "xform": MapValues(lambda v: v + 1)},
            "t": {"type": "ktable"},
            "out": {"type": "topic"},
        },
        "workflow": [("in", "s"), ("s", "t"), ("t", "out")],
        "joins": {("s", "t"): {"type": "left"}},
    }
    dot = viz.to_dot(topo)
    assert '"in" -> "s"' in dot and '"t" -> "out"' in dot
    assert "lightblue" in dot and "khaki" in dot
    assert "left join" in dot
    # with embedded sampled outputs (viz.clj:36-40 analogue)
    outputs = run_topology(spark, {k: v for k, v in topo.items() if k != "joins"} | {"workflow": [("in", "s"), ("s", "out")], "entities": {k: topo["entities"][k] for k in ("in", "s", "out")}}, inputs={"in": [("k", 1, 100)]})
    dot2 = viz.to_dot(
        {"entities": {k: topo["entities"][k] for k in ("in", "s", "out")},
         "workflow": [("in", "s"), ("s", "out")]},
        outputs=outputs,
    )
    assert "'k':2" in dot2


def test_viz_render_falls_back_to_dot(tmp_path):
    topo = {
        "entities": {"a": {"type": "topic"}, "b": {"type": "topic"}},
        "workflow": [("a", "b")],
    }
    out = viz.render(topo, str(tmp_path / "t.png"))
    assert out.endswith(".png") or out.endswith(".dot")
    assert open(out if out.endswith(".dot") else out, "rb").read()
