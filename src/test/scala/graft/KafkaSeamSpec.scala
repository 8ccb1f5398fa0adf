package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.TestKafka
import graft.streaming.{Sinks, TradeStreams}

/** S1/K3 seam test without kafka jars (r10 verdict item #4): the
  * in-repo `graft-testkafka` DataSourceV2 source/sink exposes the
  * EXACT Kafka connector columnar contract, so the full
  * produce → parseKafkaValue → silver → kafkaProjection → re-consume
  * loop executes end-to-end (spark_processor.py:116-133 /
  * sinks.py:181-202 shape) even though a broker cannot exist here.
  */
class KafkaSeamSpec extends SparkSpecBase {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("read schema is the Kafka source schema, field-for-field and in order") {
    val dir = tmpDir("graft_tk_schema")
    val got = spark.read.format("graft-testkafka").option("path", dir).load().schema
    val want = StructType(Seq(
      StructField("key", BinaryType),
      StructField("value", BinaryType),
      StructField("topic", StringType),
      StructField("partition", IntegerType),
      StructField("offset", LongType),
      StructField("timestamp", TimestampType),
      StructField("timestampType", IntegerType)))
    assert(got.fields.map(f => (f.name, f.dataType)).toSeq ===
      want.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("murmur2 partitioner: deterministic, in-range, spread across partitions") {
    val keys = Seq("click", "view", "purchase", "scroll", "hover")
      .map(_.getBytes("UTF-8"))
    val parts = keys.map(k => TestKafka.partitionFor(k, 4))
    assert(parts.forall(p => p >= 0 && p < 4))
    // Deterministic across calls.
    assert(parts === keys.map(k => TestKafka.partitionFor(k, 4)))
    assert(TestKafka.partitionFor(null, 4) === 0)
  }

  test("produce → parse → silver → kafkaProjection → re-consume round-trip (S1/K3)") {
    import spark.implicits._
    val dir = tmpDir("graft_tk_rt")

    // 1) PRODUCE — wire-format trades (the reference producer's JSON
    //    value, keyed by symbol) through the K3 projection into the
    //    testkafka sink.
    val wire = SparkEntry.queries("f1_silver")(spark, Sf)
      .select(col("symbol"), col("price"), col("volume"),
        col("event_time_ms").as("timestamp"),
        array().cast("array<string>").as("conditions"))
    Sinks.kafkaProjection(wire)
      .write.mode("append").format("graft-testkafka")
      .option("path", dir).option("topic", "trades_raw")
      .option("partitions", "4")
      .save()

    // 2) CONSUME — the Kafka-shaped scan: key/value binary, dense
    //    per-(topic, partition) offsets, partition = murmur2(key).
    val raw = spark.read.format("graft-testkafka")
      .option("path", dir).option("partitions", "4").load()
    val n = wire.count()
    assert(raw.count() === n)
    assert(raw.select(col("topic")).distinct().as[String].collect().toSeq === Seq("trades_raw"))
    // Keys are the symbol bytes and land on murmur2 partitions.
    val keyed = raw.select(col("key").cast("string").as("sym"), col("partition")).collect()
    keyed.foreach { r =>
      val sym = r.getString(0)
      assert(r.getInt(1) === TestKafka.partitionFor(sym.getBytes("UTF-8"), 4),
        s"symbol $sym on the wrong partition")
    }
    // Offsets dense per (topic, partition): 0..count-1.
    raw.groupBy(col("topic"), col("partition"))
      .agg(count(lit(1)).as("n"), min(col("offset")).as("lo"), max(col("offset")).as("hi"))
      .collect().foreach { r =>
        assert(r.getAs[Long]("lo") === 0L)
        assert(r.getAs[Long]("hi") === r.getAs[Long]("n") - 1L)
      }

    // 3) PARSE — P1+P2 over the consumed values must reproduce the
    //    produced wire rows exactly (value JSON → typed columns).
    val parsed = TradeStreams.parseTrades(raw)
      .select(col("symbol"), col("price"), col("volume"), col("timestamp"))
    val want = wire.select(col("symbol"), col("price"), col("volume"), col("timestamp"))
    assert(parsed.exceptAll(want).count() === 0)
    assert(want.exceptAll(parsed).count() === 0)

    // 4) RE-PRODUCE — the parsed stream back through the projection
    //    into a second topic dir and re-consume: byte-identical value
    //    payload set (the projection is deterministic in field order).
    val dir2 = tmpDir("graft_tk_rt2")
    Sinks.kafkaProjection(
        parsed.withColumn("conditions", array().cast("array<string>")))
      .write.mode("append").format("graft-testkafka")
      .option("path", dir2).option("topic", "trades_raw")
      .option("partitions", "4")
      .save()
    val v1 = spark.read.format("graft-testkafka").option("path", dir)
      .option("partitions", "4").load()
      .select(col("value").cast("string").as("v"))
    val v2 = spark.read.format("graft-testkafka").option("path", dir2)
      .option("partitions", "4").load()
      .select(col("value").cast("string").as("v"))
    assert(v1.exceptAll(v2).count() === 0 && v2.exceptAll(v1).count() === 0,
      "re-produced value payloads drifted from the originals")
  }

  test("sink contract: value required; topic column overrides option; string key/value accepted") {
    import spark.implicits._
    val dir = tmpDir("graft_tk_contract")
    // topic column wins over the option.
    Seq(("k1", "v1", "topic.a"), ("k2", "v2", "topic.b"))
      .toDF("key", "value", "topic")
      .write.mode("append").format("graft-testkafka").option("path", dir)
      .option("topic", "ignored").option("partitions", "2").save()
    val back = spark.read.format("graft-testkafka").option("path", dir)
      .option("partitions", "2").load()
    assert(back.select(col("topic")).distinct().as[String].collect().sorted
      === Array("topic.a", "topic.b"))
    assert(back.select(col("value").cast("string")).as[String].collect().sorted
      === Array("v1", "v2"))
    // Missing value column fails at planning, with THE contract error
    // (not just any exception — a temp-dir I/O failure must not pass).
    val err = intercept[Exception] {
      Seq("only-key").toDF("key")
        .write.mode("append").format("graft-testkafka").option("path", tmpDir("graft_tk_bad"))
        .option("topic", "t").save()
    }
    val msgs = Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(msgs.contains("requires a 'value' column"), s"unexpected failure: $msgs")
  }

  test("sink timestamp contract: TIMESTAMP micros and BIGINT epoch-ms both round-trip; other types rejected") {
    import spark.implicits._
    // BIGINT epoch-ms passes through verbatim.
    val dirMs = tmpDir("graft_tk_tsms")
    Seq(("k", "v", 1705312800123L)).toDF("key", "value", "timestamp")
      .write.mode("append").format("graft-testkafka").option("path", dirMs)
      .option("topic", "t").save()
    val gotMs = spark.read.format("graft-testkafka").option("path", dirMs).load()
      .select(unix_millis(col("timestamp"))).as[Long].collect()
    assert(gotMs.toSeq === Seq(1705312800123L))
    // TIMESTAMP column (micros in InternalRow) converts to the same ms.
    val dirTs = tmpDir("graft_tk_tsts")
    Seq(("k", "v")).toDF("key", "value")
      .withColumn("timestamp", lit("2024-01-15 10:00:00.123").cast("timestamp"))
      .write.mode("append").format("graft-testkafka").option("path", dirTs)
      .option("topic", "t").save()
    val gotTs = spark.read.format("graft-testkafka").option("path", dirTs).load()
      .select(unix_millis(col("timestamp"))).as[Long].collect()
    assert(gotTs.toSeq === Seq(1705312800123L))
    // An INT timestamp column is rejected at planning, not per-row.
    val err = intercept[Exception] {
      Seq(("k", "v", 42)).toDF("key", "value", "timestamp")
        .write.mode("append").format("graft-testkafka")
        .option("path", tmpDir("graft_tk_tsbad")).option("topic", "t").save()
    }
    val msgs = Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(msgs.contains("'timestamp' must be TIMESTAMP"), s"unexpected failure: $msgs")
  }

  test("streaming scan (S1): incremental micro-batches, checkpoint restart, no re-delivery") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val topicDir = tmpDir("graft_tk_stream")
    val ckpt = tmpDir("graft_tk_stream_ck")
    val outDir = tmpDir("graft_tk_stream_out")
    def produce(rows: Seq[(String, String)]): Unit =
      rows.toDF("key", "value").write.mode("append").format("graft-testkafka")
        .option("path", topicDir).option("topic", "t").option("partitions", "2").save()
    def drain(): Unit = {
      val q = spark.readStream.format("graft-testkafka")
        .option("path", topicDir).option("partitions", "2").load()
        .selectExpr("CAST(key AS STRING) AS k", "CAST(value AS STRING) AS v",
          "partition", "offset")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", outDir).start()
      q.awaitTermination()
    }
    produce(Seq(("a", "v1"), ("b", "v2")))
    drain()
    produce(Seq(("a", "v3"), ("c", "v4")))
    drain() // fresh query, same checkpoint: must consume ONLY the delta
    val rows = spark.read.parquet(outDir)
      .select(col("k"), col("v"), col("partition"), col("offset")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(rows.length === 4, s"expected exactly-once delivery, got ${rows.toSeq}")
    assert(rows.map(r => (r._1, r._2)).toSet ===
      Set(("a", "v1"), ("b", "v2"), ("a", "v3"), ("c", "v4")))
    // Offsets stay dense per partition ACROSS micro-batches/restarts.
    rows.groupBy(_._3).foreach { case (_, rs) =>
      assert(rs.map(_._4).sorted.toSeq === (0L until rs.length).toSeq)
    }
    // Arrival order: the same key's first produce has the lower offset.
    val aRows = rows.filter(_._1 == "a").sortBy(_._4).map(_._2)
    assert(aRows.toSeq === Seq("v1", "v3"))
  }

  test("FULL streaming loop (S1+K3): readStream -> re-key -> writeStream -> re-consume") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val inDir = tmpDir("graft_tk_loop_in")
    val outDir = tmpDir("graft_tk_loop_out")
    val ckpt = tmpDir("graft_tk_loop_ck")
    // Produce 3 messages on the input topic (batch write).
    Seq(("AAPL", """{"p":1}"""), ("MSFT", """{"p":2}"""), ("AAPL", """{"p":3}"""))
      .toDF("key", "value").write.mode("append").format("graft-testkafka")
      .option("path", inDir).option("topic", "trades").option("partitions", "2").save()
    // The consumer graph, fully streaming: streaming scan -> re-key by
    // payload -> STREAMING write through the DSv2 sink.
    val q = spark.readStream.format("graft-testkafka")
      .option("path", inDir).option("partitions", "2").load()
      .selectExpr("CAST(key AS STRING) AS k", "CAST(value AS STRING) AS v")
      .select(col("v").as("key"), col("k").as("value")) // swap: re-key by payload
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .format("graft-testkafka")
      .option("path", outDir).option("topic", "rekeyed").option("partitions", "4")
      .start()
    q.awaitTermination()
    // Re-consume the produced topic with the batch scan: payloads
    // survive byte-for-byte, placement follows murmur2 of the NEW key.
    val rows = spark.read.format("graft-testkafka")
      .option("path", outDir).option("partitions", "4").load()
      .selectExpr("CAST(key AS STRING)", "CAST(value AS STRING)", "topic", "partition")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3)))
    assert(rows.length === 3)
    assert(rows.map(r => (r._1, r._2)).toSet ===
      Set(("""{"p":1}""", "AAPL"), ("""{"p":2}""", "MSFT"), ("""{"p":3}""", "AAPL")))
    rows.foreach { r =>
      assert(r._3 === "rekeyed")
      assert(r._4 === TestKafka.partitionFor(r._1.getBytes("UTF-8"), 4),
        s"partition placement must follow murmur2 of the new key: $r")
    }
    // Restart with the same checkpoint and no new input: nothing
    // re-produced (streaming-write exactly-once).
    val q2 = spark.readStream.format("graft-testkafka")
      .option("path", inDir).option("partitions", "2").load()
      .selectExpr("CAST(value AS STRING) AS key", "CAST(key AS STRING) AS value")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .format("graft-testkafka")
      .option("path", outDir).option("topic", "rekeyed").option("partitions", "4")
      .start()
    q2.awaitTermination()
    assert(spark.read.format("graft-testkafka").option("path", outDir).load().count() === 3)
  }

  test("empty (non-null) keys hash like Kafka's partitioner; only null pins to 0") {
    assert(TestKafka.partitionFor(Array.empty[Byte], 4) ===
      (TestKafka.murmur2(Array.empty[Byte]) & 0x7fffffff) % 4)
    assert(TestKafka.partitionFor(null, 4) === 0)
  }

  test("sink topic/key contract: wrong types rejected at planning, not per-row (r11 advice)") {
    import spark.implicits._
    // Non-string topic column: the contract error, not an executor
    // ClassCastException.
    val errT = intercept[Exception] {
      Seq(("k", "v", 7)).toDF("key", "value", "topic")
        .write.mode("append").format("graft-testkafka")
        .option("path", tmpDir("graft_tk_badtopic")).save()
    }
    val msgsT = Iterator.iterate(errT: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(msgsT.contains("'topic' must be STRING"), s"unexpected failure: $msgsT")
    // Non-string/binary key column likewise.
    val errK = intercept[Exception] {
      Seq((42L, "v")).toDF("key", "value")
        .write.mode("append").format("graft-testkafka")
        .option("path", tmpDir("graft_tk_badkey")).option("topic", "t").save()
    }
    val msgsK = Iterator.iterate(errK: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(msgsK.contains("'key' must be BINARY or STRING"), s"unexpected failure: $msgsK")
  }

  test("streaming offset JSON round-trips for adversarial file paths (r11 advice)") {
    import graft.sources.TestKafkaOffset
    // Paths carrying the exact sequences the old regex split broke on:
    // literal quote-comma-quote, backslashes, embedded quotes.
    val nasty = Seq(
      """/tmp/a","b/records-1.tsv""" -> 3L,
      """C:\tmp\rec "x".tsv""" -> 0L,
      "plain/records-2.tsv" -> 141592653589793L,
      """q"," middle "," q""" -> 7L)
    val rt = TestKafkaOffset.fromJson(TestKafkaOffset(nasty).json())
    assert(rt.lines.sorted === nasty.sorted,
      "fromJson is not the inverse of json() for escaped paths")
    assert(TestKafkaOffset.fromJson(TestKafkaOffset(Nil).json()).lines.isEmpty)
    // Format guard (r13 advice): a legacy pre-r13 ARRAY-format offset
    // must fail loudly, not misparse — the digit scan after the first
    // filename token would otherwise land inside the next quoted
    // filename and yield wrong (file, count) pairs.
    val legacy = """["records-e0-p1.tsv","records-e0-p2.tsv"]"""
    val guard = intercept[IllegalArgumentException] { TestKafkaOffset.fromJson(legacy) }
    assert(guard.getMessage.contains("foreign or legacy checkpoint"), guard.getMessage)
  }

  test("streaming epoch re-commit is idempotent: replayed epoch overwrites, never duplicates") {
    import graft.sources.{TestKafkaCommit, TestKafkaStreamingWrite}
    val topicDir = tmpDir("graft_tk_replay")
    val schema = StructType(Seq(StructField("value", StringType)))
    val w = new TestKafkaStreamingWrite(topicDir, Some("t"), schema)
    def stageTmp(body: String): String = {
      val p = Files.createTempFile(java.nio.file.Paths.get(topicDir), ".tmp-0-", "")
      Files.write(p, (body + "\n").getBytes("UTF-8"))
      p.toString
    }
    val line = TestKafka.encodeLine(
      TestKafka.Record("t", null, "v1".getBytes("UTF-8"), 0L))
    // First commit of epoch 7.
    w.commit(7L, Array(TestKafkaCommit(stageTmp(line), 0)))
    // Crash-after-commit scenario: the epoch replays — a NEW tmp file
    // with the same content commits under the SAME epochId.
    w.commit(7L, Array(TestKafkaCommit(stageTmp(line), 0)))
    val rows = spark.read.format("graft-testkafka").option("path", topicDir)
      .option("partitions", "1").load()
    assert(rows.count() === 1L,
      "replayed epoch duplicated records — commit is not idempotent")
    // A different epoch appends (no accidental clobber across epochs).
    w.commit(8L, Array(TestKafkaCommit(stageTmp(line), 0)))
    assert(spark.read.format("graft-testkafka").option("path", topicDir)
      .option("partitions", "1").load().count() === 2L)
  }
}
