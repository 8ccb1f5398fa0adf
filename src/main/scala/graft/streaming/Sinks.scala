package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import scala.collection.mutable

/** Streaming sinks + multi-query management (K1-K5, reference
  * sinks.py).
  *
  * The reference writes micro-batches to Cassandra via foreachBatch
  * with idempotent primary-key upserts as its exactly-once mechanism
  * (CASSANDRA_MODELING.md:69-75). The Spark-native analog: foreachBatch
  * into parquet partitioned by a deterministic key — append for the
  * immutable bronze/silver layers, dynamic partition overwrite for the
  * update-mode gold layer (re-emitting a window replaces its
  * partition, so replays converge instead of duplicating).
  */
object Sinks {

  /** K1 — parquet foreachBatch sink: checkpointed, 10s
    * processing-time trigger (sinks.py:88-132). `overwritePartitions`
    * selects the update-mode upsert used for gold.
    */
  def parquetSink(df: DataFrame, path: String, checkpoint: String,
                  partitionBy: Seq[String] = Nil,
                  overwritePartitions: Boolean = false,
                  trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
                  queryName: String = "parquet_sink"): DataStreamWriter[Row] = {
    val mode = if (overwritePartitions) "overwrite" else "append"
    df.writeStream
      .queryName(queryName)
      .outputMode(if (overwritePartitions) "update" else "append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val w0 = batch.write
          .option("partitionOverwriteMode", "dynamic")
          .mode(mode)
        val w = if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0
        w.parquet(path)
      }
  }

  /** K2 — console sink (sinks.py:147-164). */
  def consoleSink(df: DataFrame, numRows: Int = 20, truncate: Boolean = true,
                  queryName: String = "console_sink"): DataStreamWriter[Row] =
    df.writeStream.queryName(queryName).format("console")
      .option("numRows", numRows).option("truncate", truncate)

  /** P6/K3 — Kafka sink projection: re-key by symbol, serialize the
    * whole row as JSON (sinks.py:181-202). Exposed separately so the
    * projection is batch-testable without a broker.
    */
  def kafkaProjection(df: DataFrame): DataFrame =
    df.selectExpr("CAST(symbol AS STRING) AS key", "to_json(struct(*)) AS value")

  def kafkaSink(df: DataFrame, bootstrap: String, topic: String,
                checkpoint: String, queryName: String = "kafka_sink"): DataStreamWriter[Row] =
    kafkaProjection(df).writeStream
      .queryName(queryName)
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)

  /** K5 — dead-letter branch writer: the invalid split of
    * Validation.split, persisted with its error reasons.
    */
  def deadLetterSink(invalid: DataFrame, path: String, checkpoint: String): DataStreamWriter[Row] =
    parquetSink(invalid.withColumn("dead_lettered_at", current_timestamp()),
      path, checkpoint, queryName = "dead_letters")

  /** K4 — multi-sink fan-out manager: N concurrent StreamingQuery
    * handles from one source (SinkManager, sinks.py:209-245).
    */
  final class SinkManager {
    private val queries = mutable.LinkedHashMap[String, StreamingQuery]()

    def start(name: String, writer: DataStreamWriter[Row]): StreamingQuery = {
      val q = writer.start()
      queries(name) = q
      q
    }

    def status: Map[String, Boolean] =
      queries.map { case (n, q) => n -> q.isActive }.toMap

    def processAllAvailable(): Unit = queries.values.foreach(_.processAllAvailable())

    def awaitAnyTermination(): Unit =
      queries.values.headOption.foreach(_.sparkSession.streams.awaitAnyTermination())

    def stopAll(): Unit = queries.values.foreach(_.stop())
  }
}
