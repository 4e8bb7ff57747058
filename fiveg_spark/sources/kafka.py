"""Kafka source/sink builders (SURVEY §2 A3; ref
PcapKpiExtractor.scala:233-273 publish, KafkaKpiPipeline.scala:227-261
subscribe + JSON parse).

No broker exists in the test environment, so these construct the
readers/writers and the JSON (de)serialization plans; the
transformation halves (``parse_packet_json`` / ``to_kafka_records``)
are pure DataFrame ops tested against literal frames.  The value
payload is flowId-keyed JSON, exactly the reference's record shape —
keying by flowId keeps one flow's packets in one Kafka partition, which
is what makes the downstream stateful IAT correct without a re-sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# JSON record schema, ref KafkaKpiPipeline.scala:245-261
PACKET_JSON_SCHEMA = T.StructType(
    [
        T.StructField("sliceType", T.StringType()),
        T.StructField("timestamp", T.DoubleType()),
        T.StructField("timestampMs", T.LongType()),
        T.StructField("packetLen", T.IntegerType()),
        T.StructField("protocol", T.StringType()),
        T.StructField("srcPort", T.IntegerType()),
        T.StructField("dstPort", T.IntegerType()),
        T.StructField("flowId", T.StringType()),
        T.StructField("tcpFlags", T.IntegerType()),
        T.StructField("windowSize", T.IntegerType()),
        T.StructField("seqNumber", T.LongType()),
    ]
)


def kafka_stream_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
):
    """Streaming Kafka reader (caller .load()s when a broker exists)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader


def kafka_batch_reader(spark: SparkSession, bootstrap_servers: str, topic: str):
    """Batch Kafka reader (ref batch fallback path)."""
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
    )


def parse_packet_json(raw: DataFrame) -> DataFrame:
    """Kafka (key, value) → typed packet events; malformed rows dropped
    (ref KafkaKpiPipeline.scala 'filter($"data".isNotNull')."""
    return (
        raw.select(
            F.col("key").cast("string").alias("kafka_key"),
            F.from_json(F.col("value").cast("string"), PACKET_JSON_SCHEMA).alias("data"),
        )
        .filter(F.col("data").isNotNull() & F.col("data.flowId").isNotNull())
        .select("kafka_key", "data.*")
    )


def to_kafka_records(packets: DataFrame, key_col: str = "flow_id") -> DataFrame:
    """Packet events → (key, value) JSON records for a Kafka sink
    (ref PcapKpiExtractor.scala:233-273: flowId key, JSON value)."""
    return packets.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*packets.columns)).alias("value"),
    )


def kafka_writer(records: DataFrame, bootstrap_servers: str, topic: str):
    """Batch Kafka sink builder."""
    return (
        records.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
    )


def kafka_stream_writer(
    records: DataFrame, bootstrap_servers: str, topic: str, checkpoint: str
):
    """Streaming Kafka sink builder."""
    return (
        records.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
