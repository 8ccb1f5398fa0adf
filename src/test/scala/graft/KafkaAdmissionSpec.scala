package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The Kafka source's ADMISSION-CONTROL contract on the TestKafka seam
  * (r13): `maxOffsetsPerTrigger` caps records per micro-batch at
  * RECORD granularity — batch boundaries land mid-file, so checkpoint
  * offsets carry partial-file line counts — honored under AvailableNow
  * through SupportsTriggerAvailableNow exactly as the real source does
  * (external/kafka-0-10-sql's KafkaMicroBatchStream). Deterministic by
  * construction: the topic is ONE record file, the cap fixes every
  * batch's size, and the crash test injects at a batch id, never a
  * timer.
  */
class KafkaAdmissionSpec extends SparkSpecBase {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** One single-file topic of `n` keyed records (coalesce(1) → one
    * write task → one committed record file), so any multi-batch
    * consumption is NECESSARILY mid-file.
    */
  private def oneFileTopic(n: Int): String = {
    import spark.implicits._
    val dir = tmpDir("graft_tk_adm")
    (0 until n).map(i => (s"sym$i", s"""{"v":$i}"""))
      .toDF("key", "value").coalesce(1)
      .write.mode("append").format("graft-testkafka")
      .option("path", dir).option("topic", "t").save()
    assert(graft.sources.TestKafka.listRecordFiles(dir).length === 1)
    dir
  }

  private def consume(dir: String, ckpt: String, cap: Option[Int],
                      sizes: ConcurrentLinkedQueue[Long],
                      out: ConcurrentLinkedQueue[(Int, Long, String)],
                      crashAtBatch: Option[Long] = None): Unit = {
    @volatile var crashed = false
    val reader = spark.readStream.format("graft-testkafka")
      .option("path", dir).option("partitions", "4")
    val raw = cap.fold(reader)(c =>
      reader.option("maxOffsetsPerTrigger", c.toString)).load()
    val q = raw.select(col("partition"), col("offset"),
        col("value").cast("string").as("v"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (crashAtBatch.contains(batchId) && !crashed) {
          crashed = true
          throw new RuntimeException("injected crash between rate-limited batches")
        }
        val rows = batch.collect()
        sizes.add(rows.length.toLong)
        rows.foreach(r => out.add((r.getInt(0), r.getLong(1), r.getString(2))))
        ()
      }
      .start()
    try q.awaitTermination()
    finally if (q.isActive) q.stop()
  }

  test("maxOffsetsPerTrigger drains one static file in ceil(n/cap) record-capped batches") {
    val dir = oneFileTopic(10)
    val sizes = new ConcurrentLinkedQueue[Long]()
    val out = new ConcurrentLinkedQueue[(Int, Long, String)]()
    consume(dir, tmpDir("graft_tk_adm_ck"), Some(3), sizes, out)
    // Arrival-order prefix admission: 3,3,3,1 — every batch ≤ cap,
    // exactly ceil(10/3) non-empty batches (a trailing empty batch is
    // legal engine behavior, never a data batch).
    val s = sizes.asScala.toSeq
    assert(s.filter(_ > 0) === Seq(3L, 3L, 3L, 1L), s"batch sizes: $s")
    assert(s.count(_ == 0) <= 1, s"batch sizes: $s")
    assert(out.asScala.map(_._3).toSet ===
      (0 until 10).map(i => s"""{"v":$i}""").toSet)
    // Offsets stay dense per partition across the mid-file boundaries.
    val perPart = out.asScala.toSeq.groupBy(_._1)
    perPart.foreach { case (p, rows) =>
      assert(rows.map(_._2).sorted === rows.indices.map(_.toLong),
        s"partition $p offsets not dense: ${rows.map(_._2).sorted}")
    }
  }

  test("crash between rate-limited batches: restart resumes from the mid-file offset, no loss, no dup") {
    val dir = oneFileTopic(10)
    val ckpt = tmpDir("graft_tk_adm_crash_ck")
    val sizes = new ConcurrentLinkedQueue[Long]()
    val out = new ConcurrentLinkedQueue[(Int, Long, String)]()
    // Batch 0 (7 records) commits; the injected throw kills the query
    // before batch 1's side effect.
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      consume(dir, ckpt, Some(7), sizes, out, crashAtBatch = Some(1L))
    }
    assert(failed.getMessage.contains("injected crash"), failed.getMessage)
    assert(sizes.asScala.toSeq === Seq(7L), s"pre-crash sizes: ${sizes.asScala.toSeq}")
    // Restart on the same checkpoint: ONLY the remaining 3 records
    // replay — the committed offset is a partial-file line count.
    consume(dir, ckpt, Some(7), sizes, out)
    assert(sizes.asScala.toSeq.filter(_ > 0) === Seq(7L, 3L),
      s"post-resume sizes: ${sizes.asScala.toSeq}")
    assert(out.asScala.map(_._3).toSeq.sorted ===
      (0 until 10).map(i => s"""{"v":$i}""").sorted, "lost or duplicated records")
  }

  test("startingOffsets=latest: fresh query skips history; offsets stay log positions") {
    import graft.sources.TestKafka
    import spark.implicits._
    val dir = oneFileTopic(5) // history: v0..v4
    val ckpt = tmpDir("graft_tk_latest_ck")
    val sizes = new ConcurrentLinkedQueue[Long]()
    val out = new ConcurrentLinkedQueue[(Int, Long, String)]()
    def consumeLatest(): Unit = {
      val q = spark.readStream.format("graft-testkafka")
        .option("path", dir).option("partitions", "4")
        .option("startingOffsets", "latest")
        .load()
        .select(col("partition"), col("offset"), col("key").cast("string").as("k"))
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val rows = batch.collect()
          sizes.add(rows.length.toLong)
          rows.foreach(r => out.add((r.getInt(0), r.getLong(1), r.getString(2))))
          ()
        }
        .start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    // Fresh start at the log end: the 5 historical records are skipped.
    consumeLatest()
    assert(out.isEmpty, s"latest start consumed history: ${out.asScala.toSeq}")
    // New records after the start ARE consumed — from the checkpointed
    // position, which initialOffset pinned at the old log end.
    (5 until 8).map(i => (s"sym$i", s"""{"v":$i}"""))
      .toDF("key", "value").coalesce(1)
      .write.mode("append").format("graft-testkafka")
      .option("path", dir).option("topic", "t").save()
    consumeLatest()
    assert(out.asScala.map(_._3).toSet === Set("sym5", "sym6", "sym7"))
    // Kafka-faithful: offsets are LOG positions — each new record's
    // offset continues after the skipped history in its partition.
    val histCount = (0 until 5).map(i => s"sym$i")
      .groupBy(s => TestKafka.partitionFor(s.getBytes("UTF-8"), 4))
      .view.mapValues(_.size.toLong).toMap.withDefaultValue(0L)
    val seen = scala.collection.mutable.Map.empty[Int, Long]
    out.asScala.toSeq.sortBy(_._2).foreach { case (p, off, k) =>
      val expected = histCount(p) + seen.getOrElse(p, 0L)
      assert(off === expected,
        s"$k on partition $p: offset $off, expected log position $expected")
      seen(p) = seen.getOrElse(p, 0L) + 1L
    }
  }

  // ------------------------------------------------------------------
  // Per-partition startingOffsets offset JSON (r13 verdict item #4):
  // {"topic":{"partition":offset}} — the r13 negative test, now the
  // positive contract. Mid-topic resume at record granularity, two
  // partitions starting at DIFFERENT offsets.
  // ------------------------------------------------------------------

  /** Records keyed so their partition (murmur2 mod 4) is known: symN's
    * partition is computed with the production partitioner, then the
    * fixture picks floors per partition from the observed layout.
    */
  private def partitionOf(key: String): Int =
    graft.sources.TestKafka.partitionFor(key.getBytes("UTF-8"), 4)

  test("startingOffsets offset JSON: two partitions start at different offsets (streaming)") {
    val dir = oneFileTopic(12) // sym0..sym11, known partitioner layout
    // Per-partition history counts, in arrival (= line) order.
    val byPart = (0 until 12).map(i => s"sym$i").groupBy(partitionOf)
    val twoParts = byPart.filter(_._2.size >= 2).keys.toSeq.sorted.take(2)
    assert(twoParts.size === 2, s"fixture needs 2 partitions with ≥2 records: $byPart")
    val (pA, pB) = (twoParts(0), twoParts(1))
    // Partition A skips 2, partition B skips 1 via -2→earliest…
    // exercised as a concrete offset and the earliest sentinel both.
    val floorsJson = s"""{"t":{"$pA":2,"$pB":1}}"""
    val sizes = new ConcurrentLinkedQueue[Long]()
    val out = new ConcurrentLinkedQueue[(Int, Long, String)]()
    val q = spark.readStream.format("graft-testkafka")
      .option("path", dir).option("partitions", "4")
      .option("startingOffsets", floorsJson)
      .load()
      .select(col("partition"), col("offset"), col("key").cast("string").as("k"))
      .writeStream.option("checkpointLocation", tmpDir("graft_tk_sojson_ck"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.collect().foreach(r => out.add((r.getInt(0), r.getLong(1), r.getString(2))))
        ()
      }
      .start()
    try q.awaitTermination() finally if (q.isActive) q.stop()
    val got = out.asScala.toSeq
    // Expected: partition A from offset 2, partition B from offset 1,
    // all other partitions from earliest; offsets are LOG positions.
    val expected = byPart.toSeq.flatMap { case (p, keys) =>
      val floor = if (p == pA) 2 else if (p == pB) 1 else 0
      keys.zipWithIndex.drop(floor).map { case (k, off) => (p, off.toLong, k) }
    }.toSet
    assert(got.toSet === expected,
      s"offset-bounded feed mismatch:\n got      $got\n expected $expected")
  }

  test("startingOffsets offset JSON bounds a BATCH read the same way") {
    import spark.implicits._
    val dir = oneFileTopic(12)
    val byPart = (0 until 12).map(i => s"sym$i").groupBy(partitionOf)
    val p = byPart.filter(_._2.size >= 2).keys.min
    val batch = spark.read.format("graft-testkafka")
      .option("path", dir).option("partitions", "4")
      .option("startingOffsets", s"""{"t":{"$p":1}}""")
      .load()
      .select($"partition", $"offset").as[(Int, Long)].collect().toSeq
    assert(!batch.contains((p, 0L)), s"offset 0 of partition $p should be skipped")
    assert(batch.filter(_._1 == p).map(_._2).min === 1L)
    // Untouched partitions still start at earliest.
    byPart.keys.filter(_ != p).foreach { other =>
      assert(batch.filter(_._1 == other).map(_._2).min === 0L)
    }
    assert(batch.size === 11)
  }

  test("startingOffsets JSON validation: -1, bad partition, malformed all fail at planning") {
    val dir = oneFileTopic(1)
    def planWith(so: String): String = {
      val err = intercept[Exception] {
        spark.read.format("graft-testkafka")
          .option("path", dir).option("partitions", "4")
          .option("startingOffsets", so).load().collect()
      }
      Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    }
    assert(planWith("""{"t":{"0":-1}}""").contains("-1 (latest) needs broker end offsets"))
    assert(planWith("""{"t":{"9":3}}""").contains("the source has 4 partitions"))
    assert(planWith("""{"t":[3]}""").contains("must map to"))
    assert(planWith("bogus").contains("must be 'earliest', 'latest' or"))
    // -2 is the earliest sentinel, accepted.
    spark.read.format("graft-testkafka")
      .option("path", dir).option("partitions", "4")
      .option("startingOffsets", """{"t":{"0":-2}}""").load().collect()
  }

  // ------------------------------------------------------------------
  // endingOffsets (batch) + subscribe/subscribePattern topic targeting
  // (r14): the remaining batch-read contract of the real source.
  // ------------------------------------------------------------------

  private def chainMsgs(err: Throwable): String =
    Iterator.iterate(err)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("|")

  test("endingOffsets JSON bounds a batch read; -1 means latest/unbounded") {
    import spark.implicits._
    val dir = oneFileTopic(12)
    val byPart = (0 until 12).map(i => s"sym$i").groupBy(partitionOf)
    val p = byPart.filter(_._2.size >= 3).keys.min
    val rows = spark.read.format("graft-testkafka")
      .option("path", dir).option("partitions", "4")
      .option("endingOffsets", s"""{"t":{"$p":2}}""")
      .load().select($"partition", $"offset").as[(Int, Long)].collect().toSeq
    // Bounded partition: offsets [0, 2) only; others unbounded.
    assert(rows.filter(_._1 == p).map(_._2).sorted === Seq(0L, 1L))
    byPart.keys.filter(_ != p).foreach { other =>
      assert(rows.count(_._1 == other) === byPart(other).size)
    }
    // -1 per partition = latest: explicitly unbounded reads everything.
    val all = spark.read.format("graft-testkafka")
      .option("path", dir).option("partitions", "4")
      .option("endingOffsets", s"""{"t":{"$p":-1}}""")
      .load().count()
    assert(all === 12L)
  }

  test("endingOffsets is rejected for streaming queries, -2 rejected as an ending offset") {
    val dir = oneFileTopic(2)
    val errS = intercept[Exception] {
      spark.readStream.format("graft-testkafka")
        .option("path", dir).option("partitions", "4")
        .option("endingOffsets", """{"t":{"0":1}}""")
        .load()
        .writeStream.option("checkpointLocation", tmpDir("graft_tk_endstream_ck"))
        .trigger(Trigger.AvailableNow()).format("noop").start().awaitTermination()
    }
    assert(chainMsgs(errS).contains("ending offset not valid in streaming queries"),
      chainMsgs(errS))
    val errE = intercept[Exception] {
      spark.read.format("graft-testkafka")
        .option("path", dir).option("partitions", "4")
        .option("endingOffsets", """{"t":{"0":-2}}""").load().collect()
    }
    assert(chainMsgs(errE).contains("not a valid ending offset"), chainMsgs(errE))
  }

  test("subscribe targets one topic of a multi-topic store; pattern targets by regex") {
    import spark.implicits._
    val dir = tmpDir("graft_tk_sub")
    Seq(("k1", "v1", "trades_raw"), ("k2", "v2", "quotes_raw"),
      ("k3", "v3", "trades_dlq"))
      .toDF("key", "value", "topic").coalesce(1)
      .write.mode("append").format("graft-testkafka")
      .option("path", dir).save()
    def topics(opts: (String, String)*): Set[String] = {
      val r = opts.foldLeft(spark.read.format("graft-testkafka")
        .option("path", dir).option("partitions", "4")) {
        case (b, (k, v)) => b.option(k, v)
      }
      r.load().select($"topic").as[String].collect().toSet
    }
    assert(topics() === Set("trades_raw", "quotes_raw", "trades_dlq"))
    assert(topics("subscribe" -> "trades_raw") === Set("trades_raw"))
    assert(topics("subscribe" -> "trades_raw, quotes_raw") ===
      Set("trades_raw", "quotes_raw"))
    assert(topics("subscribePattern" -> "trades_.*") ===
      Set("trades_raw", "trades_dlq"))
    // Mutually exclusive, like the real source.
    val err = intercept[Exception] {
      topics("subscribe" -> "trades_raw", "subscribePattern" -> "q.*")
    }
    assert(chainMsgs(err).contains("mutually exclusive"), chainMsgs(err))
  }

  test("subscribe filtering never perturbs the surviving topics' offsets") {
    import spark.implicits._
    val dir = tmpDir("graft_tk_suboff")
    // Interleave two topics with the SAME key so they share a seam
    // partition; each topic's offsets must be dense [0, n) regardless
    // of whether the other topic is filtered out.
    (0 until 8).map(i => ("k", s"v$i", if (i % 2 == 0) "a" else "b"))
      .toDF("key", "value", "topic").coalesce(1)
      .write.mode("append").format("graft-testkafka")
      .option("path", dir).save()
    val offs = spark.read.format("graft-testkafka")
      .option("path", dir).option("partitions", "4")
      .option("subscribe", "a")
      .load().select($"offset").as[Long].collect().toSeq.sorted
    assert(offs === Seq(0L, 1L, 2L, 3L),
      s"filtered-topic read must keep per-topic offsets dense: $offs")
  }

  // ------------------------------------------------------------------
  // Seek-then-admit (r14): floors and topic filters compose with
  // maxOffsetsPerTrigger EXACTLY — the budget counts admissible
  // records only, so every rate-limited batch is FULL until the tail
  // (the real source's behavior; the first r14 cut counted raw lines
  // and emitted short batches while the skip drained).
  // ------------------------------------------------------------------

  private def drainSizes(dir: String, opts: (String, String)*): Seq[Long] = {
    val sizes = new ConcurrentLinkedQueue[Long]()
    val reader = opts.foldLeft(spark.readStream.format("graft-testkafka")
      .option("path", dir).option("partitions", "4")) {
      case (b, (k, v)) => b.option(k, v)
    }
    val q = reader.load().select(col("offset"))
      .writeStream.option("checkpointLocation", tmpDir("graft_tk_sta_ck"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sizes.add(batch.count()); ()
      }
      .start()
    try q.awaitTermination() finally if (q.isActive) q.stop()
    sizes.asScala.toSeq.filter(_ > 0)
  }

  test("seek-then-admit: the cap budget counts only post-floor records") {
    val dir = oneFileTopic(12)
    val byPart = (0 until 12).map(i => s"sym$i").groupBy(partitionOf)
    val p = byPart.filter(_._2.size >= 2).keys.min
    // 12 records, 2 skipped by the floor → 10 admissible; cap 3 must
    // cut 3,3,3,1 — full batches until the tail, no short head batch.
    assert(drainSizes(dir,
      "startingOffsets" -> s"""{"t":{"$p":2}}""",
      "maxOffsetsPerTrigger" -> "3") === Seq(3L, 3L, 3L, 1L))
  }

  test("seek-then-admit: unsubscribed topics never consume budget") {
    import spark.implicits._
    val dir = tmpDir("graft_tk_subcap")
    // Interleave topics a (8 records) and b (4): subscribed-only
    // admissible = 8; cap 3 → 3,3,2 even though b's lines sit between
    // a's in the file.
    (0 until 12).map(i => ("k", s"v$i", if (i % 3 == 2) "b" else "a"))
      .toDF("key", "value", "topic").coalesce(1)
      .write.mode("append").format("graft-testkafka")
      .option("path", dir).save()
    assert(drainSizes(dir,
      "subscribe" -> "a",
      "maxOffsetsPerTrigger" -> "3") === Seq(3L, 3L, 2L))
  }

  test("batch read rejects startingOffsets=latest, matching the real source") {
    val dir = oneFileTopic(1)
    val err = intercept[Exception] {
      spark.read.format("graft-testkafka")
        .option("path", dir).option("partitions", "4")
        .option("startingOffsets", "latest").load().collect()
    }
    val msgs = Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(msgs.contains("starting offset can't be latest for batch queries"), msgs)
  }

  // ------------------------------------------------------------------
  // ReadMinRows / CompositeReadLimit (r14 verdict item #5): the real
  // source's minOffsetsPerTrigger + maxTriggerDelay pair — a trickle
  // feed accumulates until min records are available OR the deadline
  // passes since the last fired batch. At 100 TB this is what stops a
  // slow feed from generating one micro-batch (and one output file)
  // per arriving record.
  // ------------------------------------------------------------------

  private def appendKeyed(dir: String, from: Int, n: Int): Unit = {
    import spark.implicits._
    (from until from + n).map(i => (s"sym$i", s"""{"v":$i}"""))
      .toDF("key", "value").coalesce(1)
      .write.mode("append").format("graft-testkafka")
      .option("path", dir).option("topic", "t").save()
  }

  test("ReadMinRows defers a sub-min trickle until maxTriggerDelay (deterministic clock)") {
    import graft.sources.{TestKafkaMicroBatchStream, TestKafkaOffset}
    val dir = tmpDir("graft_tk_min")
    var now = 1000000L
    val stream = new TestKafkaMicroBatchStream(dir, 4,
      minPerTrigger = Some(5L), maxTriggerDelayMs = 10000L, clock = () => now)
    def latest(start: TestKafkaOffset): TestKafkaOffset =
      stream.latestOffset(start, stream.getDefaultReadLimit)
        .asInstanceOf[TestKafkaOffset]
    def total(o: TestKafkaOffset): Long = o.lines.map(_._2).sum
    // First trigger ALWAYS fires regardless of min — the real source's
    // rule (its lastTriggerMillis starts at 0, so the first delayBatch
    // call sees the deadline as already passed).
    appendKeyed(dir, 0, 2)
    val o1 = latest(TestKafkaOffset(Nil))
    assert(total(o1) === 2L, "first trigger must fire regardless of min")
    // 3 new records: 3 < 5 and the deadline has not passed → defer
    // (the end offset equals the start — no batch).
    now += 1000; appendKeyed(dir, 2, 3)
    assert(total(latest(o1)) === 2L, "sub-min trickle must defer")
    // 2 more (5 new ≥ min) → fires, and min-without-max takes all.
    now += 1000; appendKeyed(dir, 5, 2)
    val o2 = latest(o1)
    assert(total(o2) === 7L, "min met must fire and take everything")
    // A 1-record trickle defers… until the deadline expires, which
    // fires the batch with whatever is there.
    now += 1000; appendKeyed(dir, 7, 1)
    assert(total(latest(o2)) === 7L, "sub-min trickle must defer again")
    now += 10000
    assert(total(latest(o2)) === 8L, "deadline expiry must fire the sub-min batch")
  }

  test("composite min+max: max rations fired batches; the real source's sub-min-tail corner is mirrored") {
    import graft.sources.{TestKafkaMicroBatchStream, TestKafkaOffset}
    val dir = tmpDir("graft_tk_minmax")
    var now = 1000000L
    val stream = new TestKafkaMicroBatchStream(dir, 4,
      maxPerTrigger = Some(3L), minPerTrigger = Some(5L),
      maxTriggerDelayMs = 10000L, clock = () => now)
    def latest(start: TestKafkaOffset): TestKafkaOffset =
      stream.latestOffset(start, stream.getDefaultReadLimit)
        .asInstanceOf[TestKafkaOffset]
    def total(o: TestKafkaOffset): Long = o.lines.map(_._2).sum
    appendKeyed(dir, 0, 10)
    val o1 = latest(TestKafkaOffset(Nil))
    assert(total(o1) === 3L, "first trigger fires; max caps it at 3")
    now += 1000
    val o2 = latest(o1)
    assert(total(o2) === 6L, "7 available >= min 5 -> fires, capped at 3")
    now += 1000
    // The mirrored corner: 4 remaining < min 5 DEFERS until the
    // deadline even though the feed already delivered those records —
    // exactly what the real source's delayBatch does (min is checked
    // against available-not-yet-admitted, with no memory that a prior
    // batch's cap left them behind).
    assert(total(latest(o2)) === 6L, "sub-min tail left by the cap defers")
    now += 10000
    val o3 = latest(o2)
    assert(total(o3) === 9L, "deadline fires the tail, still capped at 3")
    now += 1000
    assert(total(latest(o3)) === 9L)
    now += 10000
    assert(total(latest(o3)) === 10L)
  }

  test("restart mid-deferral: the deadline clock resets in the FIRING direction (r15 verdict #5)") {
    import graft.sources.{TestKafkaMicroBatchStream, TestKafkaOffset}
    // The real source persists NOTHING about lastTriggerMillis — a
    // restarted query constructs a fresh stream whose deferral clock
    // starts at 0, and delayBatch's first call therefore sees the
    // deadline as already passed and FIRES. Pin that rule on the seam:
    // a sub-min tail that was mid-deferral when the query died is
    // admitted by the first post-restart trigger, without waiting out
    // a fresh delay window — restart can only make the source fire
    // MORE eagerly than min asks, never defer forever (a crash-looping
    // job with min set degrades to per-restart micro-batches, not to
    // starvation). SCALE.md §3 documents the operational posture.
    val dir = tmpDir("graft_tk_minrestart")
    var now = 1000000L
    val stream = new TestKafkaMicroBatchStream(dir, 4,
      minPerTrigger = Some(5L), maxTriggerDelayMs = 60000L, clock = () => now)
    def latest(s: TestKafkaMicroBatchStream, start: TestKafkaOffset): TestKafkaOffset =
      s.latestOffset(start, s.getDefaultReadLimit).asInstanceOf[TestKafkaOffset]
    def total(o: TestKafkaOffset): Long = o.lines.map(_._2).sum
    appendKeyed(dir, 0, 6)
    val o1 = latest(stream, TestKafkaOffset(Nil))
    assert(total(o1) === 6L, "first trigger fires")
    // A 2-record tail arrives; 2 < 5 and the 60 s deadline is far away
    // → the running query defers (and would keep deferring).
    now += 1000; appendKeyed(dir, 6, 2)
    assert(total(latest(stream, o1)) === 6L, "sub-min tail defers mid-run")
    now += 1000
    assert(total(latest(stream, o1)) === 6L, "still deferring before restart")
    // CRASH + RESTART: a new stream instance over the same topic dir,
    // resuming from the checkpointed offset o1. Its deferral clock is
    // fresh (0), so the very first trigger fires the 2-record tail —
    // no fresh 60 s wait.
    now += 1000
    val restarted = new TestKafkaMicroBatchStream(dir, 4,
      minPerTrigger = Some(5L), maxTriggerDelayMs = 60000L, clock = () => now)
    val o2 = latest(restarted, o1)
    assert(total(o2) === 8L,
      "first post-restart trigger must fire the mid-deferral tail immediately")
    // And that firing reset the new instance's deadline clock: the
    // next sub-min trickle defers again under the fresh window.
    now += 1000; appendKeyed(dir, 8, 1)
    assert(total(latest(restarted, o2)) === 8L,
      "post-restart deferral discipline resumes")
  }

  test("min+max+floors compose: the min gate counts ADMISSIBLE records only") {
    import graft.sources.{TestKafkaMicroBatchStream, TestKafkaOffset}
    val dir = tmpDir("graft_tk_minfloor")
    var now = 1000000L
    appendKeyed(dir, 0, 12) // sym0..sym11
    val byPart = (0 until 12).map(i => s"sym$i").groupBy(partitionOf)
    val p = byPart.filter(_._2.size >= 2).keys.min
    val floors = Map(("t", p) -> 2L)
    val stream = new TestKafkaMicroBatchStream(dir, 4,
      minPerTrigger = Some(11L), maxTriggerDelayMs = 10000L,
      floors = floors, clock = () => now)
    def latest(start: TestKafkaOffset): TestKafkaOffset =
      stream.latestOffset(start, stream.getDefaultReadLimit)
        .asInstanceOf[TestKafkaOffset]
    // First trigger always fires and (min-without-max) takes all 12
    // lines; that also starts the deadline clock.
    val first = latest(TestKafkaOffset(Nil))
    assert(first.lines.map(_._2).sum === 12L, "first trigger fires")
    now += 1000
    // 10 new records arrive, ALL admissible (the floor only skipped
    // pre-consumed history): 10 < min 11 → defer. The gate must count
    // ADMISSIBLE records — were it counting raw new lines it would
    // see the same 10 and behave identically here, so the discriminating
    // step is next: one more record makes 11 admissible while a
    // raw-minus-floor meter would still see the floor-skipped history
    // and fire a step early (12 raw new > 11). Both assertions pin the
    // admissible meter.
    appendKeyed(dir, 12, 10)
    assert(latest(first).lines.map(_._2).sum === 12L,
      "10 admissible < min 11 must defer")
    appendKeyed(dir, 22, 1) // 11 admissible now
    assert(latest(first).lines.map(_._2).sum === 23L,
      "11 admissible >= min fires and takes everything")
  }

  test("minOffsetsPerTrigger end-to-end: a trickle drain accumulates (ProcessingTime)") {
    val dir = oneFileTopic(10)
    val sizes = new ConcurrentLinkedQueue[Long]()
    val raw = spark.readStream.format("graft-testkafka")
      .option("path", dir).option("partitions", "4")
      .option("minOffsetsPerTrigger", "5")
      .option("maxOffsetsPerTrigger", "3")
      .option("maxTriggerDelay", "1s")
      .load()
    val q = raw.select(col("offset"))
      .writeStream.option("checkpointLocation", tmpDir("graft_tk_min_e2e_ck"))
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val n = batch.count(); if (n > 0) sizes.add(n); ()
      }
      .start()
    // NOTE processAllAvailable CANNOT wait out a deferral: a deferred
    // trigger reports end == start, so availableOffsets == committed
    // and the wait returns with the tail unconsumed — poll instead.
    def awaitSizes(expected: Seq[Long]): Unit = {
      val t0 = System.nanoTime()
      while (sizes.asScala.toSeq != expected &&
        (System.nanoTime() - t0) < 30L * 1000 * 1000 * 1000) Thread.sleep(50)
      assert(sizes.asScala.toSeq === expected,
        s"batch sizes: ${sizes.asScala.toSeq}")
    }
    try {
      // 10 records, max 3, min 5, delay 1s: 3,3 fire on the min gate;
      // the 4-record tail defers to the deadline, then 3,1.
      awaitSizes(Seq(3L, 3L, 3L, 1L))
      // A fresh 2-record trickle (< min) only lands after the deadline.
      appendKeyed(dir, 10, 2)
      awaitSizes(Seq(3L, 3L, 3L, 1L, 2L))
    } finally q.stop()
  }

  test("restart during a deferral fires immediately: the deadline clock is per-instance") {
    import graft.sources.{TestKafkaMicroBatchStream, TestKafkaOffset}
    // The real source keeps lastTriggerMillis in memory, not in the
    // checkpoint: a query restarted mid-deferral constructs a fresh
    // stream whose clock starts at 0, so its FIRST trigger fires
    // regardless of min — accumulated trickle data is never stranded
    // behind a deadline that died with the old process.
    val dir = tmpDir("graft_tk_minrestart")
    var now = 1000000L
    val s1 = new TestKafkaMicroBatchStream(dir, 4,
      minPerTrigger = Some(5L), maxTriggerDelayMs = 10000L, clock = () => now)
    appendKeyed(dir, 0, 4)
    val o1 = s1.latestOffset(TestKafkaOffset(Nil), s1.getDefaultReadLimit)
      .asInstanceOf[TestKafkaOffset]
    assert(o1.lines.map(_._2).sum === 4L)
    now += 1000; appendKeyed(dir, 4, 2) // 2 < 5: s1 defers
    assert(s1.latestOffset(o1, s1.getDefaultReadLimit)
      .asInstanceOf[TestKafkaOffset].lines.map(_._2).sum === 4L)
    // "Restart": a fresh instance resumes from the checkpointed o1 —
    // and fires at once with the same sub-min 2 records.
    val s2 = new TestKafkaMicroBatchStream(dir, 4,
      minPerTrigger = Some(5L), maxTriggerDelayMs = 10000L, clock = () => now)
    assert(s2.latestOffset(o1, s2.getDefaultReadLimit)
      .asInstanceOf[TestKafkaOffset].lines.map(_._2).sum === 6L)
  }

  test("minOffsetsPerTrigger is rejected for batch queries (streaming-only)") {
    val dir = oneFileTopic(2)
    val err = intercept[Exception] {
      spark.read.format("graft-testkafka")
        .option("path", dir).option("partitions", "4")
        .option("minOffsetsPerTrigger", "5").load().collect()
    }
    assert(chainMsgs(err).contains("streaming-only admission option"), chainMsgs(err))
  }

  test("no cap: ReadAllAvailable consumes everything in one batch (pre-r13 behavior unchanged)") {
    val dir = oneFileTopic(10)
    val sizes = new ConcurrentLinkedQueue[Long]()
    val out = new ConcurrentLinkedQueue[(Int, Long, String)]()
    consume(dir, tmpDir("graft_tk_adm_nc_ck"), None, sizes, out)
    assert(sizes.asScala.toSeq.filter(_ > 0) === Seq(10L),
      s"batch sizes: ${sizes.asScala.toSeq}")
  }
}
