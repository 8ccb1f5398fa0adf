package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.Ohlcv
import graft.streaming.IncrementalGoldStream

/** Stateless merge-on-read gold: per-batch partial bars upserted by
  * (symbol, window, batch_id) must read back as exactly the batch
  * bars of everything delivered — under window-straddling batch
  * splits, late out-of-order deliveries, REPLAYED batches, and
  * compaction.
  */
class IncrementalGoldStreamSpec extends SparkSpecBase {
  import spark.implicits._

  // (event_id, symbol, price, volume, minute-offset) over two 5m
  // windows and two symbols; deliberately interleaved so every batch
  // below touches both windows.
  private val t0 = 1705312800000L // 2024-01-15 10:00:00 UTC
  private def trades(rows: Seq[(Long, String, Double, Long, Long)]): DataFrame =
    rows.toDF("event_id", "symbol", "price", "volume", "off")
      .select(col("event_id"), col("symbol"), col("price"), col("volume"),
        timestamp_millis(lit(t0) + col("off") * 60000L).as("event_time"))

  private val all = Seq(
    (1L, "A", 10.0, 5L, 0L), (2L, "A", 12.0, 3L, 1L), (3L, "A", 9.0, 2L, 6L),
    (4L, "B", 50.0, 1L, 2L), (5L, "B", 55.0, 4L, 4L), (6L, "B", 52.0, 2L, 7L),
    (7L, "A", 11.0, 6L, 3L), (8L, "B", 49.0, 3L, 8L))

  // Batches slice ACROSS windows and arrive out of time order; batch 2
  // is pure late data for the first window.
  private val batches = Seq(
    all.filter(t => Set(2L, 5L, 8L).contains(t._1)),
    all.filter(t => Set(3L, 4L, 6L).contains(t._1)),
    all.filter(t => Set(1L, 7L).contains(t._1)))

  private def barsOf(df: DataFrame): Set[Seq[Any]] =
    df.select(col("symbol"), col("window_start"), col("window_end"), col("open"),
        col("high"), col("low"), col("close"), col("volume"), col("trade_count"),
        col("vwap_e6"))
      .collect().map(_.toSeq).toSet

  private lazy val expected = barsOf(Ohlcv.bars5m(trades(all)))

  test("merge-on-read equals batch bars across straddling, out-of-order batches") {
    val store = Files.createTempDirectory("graft_mor").toString + "/gold"
    batches.zipWithIndex.foreach { case (b, id) =>
      IncrementalGoldStream.mergeBatch(trades(b), id.toLong, store, "5 minutes")
    }
    assert(barsOf(IncrementalGoldStream.read(spark, store)) == expected)

    // Replay batch 1 (same batch_id, same data): key-replacement must
    // converge, not double-count.
    IncrementalGoldStream.mergeBatch(trades(batches(1)), 1L, store, "5 minutes")
    assert(barsOf(IncrementalGoldStream.read(spark, store)) == expected)

    // Compaction folds per-batch partials to one row per bar without
    // changing the read view, and the store keeps accepting upserts.
    val before = spark.read.parquet(store).count()
    IncrementalGoldStream.compact(spark, store)
    assert(spark.read.parquet(store).count() < before)
    assert(barsOf(IncrementalGoldStream.read(spark, store)) == expected)
    IncrementalGoldStream.mergeBatch(trades(batches(0)), 3L, store, "5 minutes")
    // Batch 0 re-delivered under a NEW id after compaction double-
    // counts by design (it is new data as far as the store knows) —
    // assert it actually changes the view, proving the replay
    // convergence above came from key-replacement, not accident.
    assert(barsOf(IncrementalGoldStream.read(spark, store)) != expected)
  }

  test("streaming writer wires the same semantics end-to-end") {
    val root = Files.createTempDirectory("graft_mor_stream").toString
    val store = s"$root/gold"
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double, Long, Long)]
    val in = mem.toDF().toDF("event_id", "symbol", "price", "volume", "off")
      .select(col("event_id"), col("symbol"), col("price"), col("volume"),
        timestamp_millis(lit(t0) + col("off") * 60000L).as("event_time"))
    batches.foreach(mem.addData(_))
    val q = IncrementalGoldStream.writer(in, store, s"$root/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(barsOf(IncrementalGoldStream.read(spark, store)) == expected)
  }
}
