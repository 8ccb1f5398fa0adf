package graft

import java.io.File
import java.net.URI
import java.nio.file.Files

import org.apache.hadoop.fs.{FileUtil, Path => HPath, RawLocalFileSystem}
import org.apache.spark.sql.functions._

import graft.operators.Compaction

/** A FileSystem WITHOUT atomic rename — the S3A shape: rename =
  * copy + delete, never a namespace operation, and every call is
  * recorded so a spec can prove a commit path performed none on its
  * published objects. Registered under the `nonatomic://` scheme via
  * `fs.nonatomic.impl` (Hadoop instantiates it reflectively — must be
  * a top-level class with a no-arg constructor).
  */
class NonAtomicRenameFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "nonatomic"
  override def getUri: URI = URI.create("nonatomic:///")
  override def rename(src: HPath, dst: HPath): Boolean = {
    NonAtomicRenameFileSystem.renames.add(src.toString -> dst.toString)
    // Copy bytes then delete the source — the non-atomic two-step a
    // reader can observe mid-flight, exactly what S3A does.
    FileUtil.copy(this, src, this, dst, true, getConf)
  }
}

object NonAtomicRenameFileSystem {
  val renames = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
}

/** Small-file compaction (v8 / r13 verdict item #3): bin-packing a
  * date-partitioned store's fragments must move bytes, never rows —
  * and must preserve the cluster key's per-file locality that makes
  * min/max pruning work after the rewrite.
  */
class CompactionSpec extends SparkSpecBase {
  import spark.implicits._

  /** A fragmented date-partitioned store: `frags` files per date. */
  private def fragmentedStoreAt(base: java.nio.file.Path, frags: Int): String = {
    val tmp = base.resolve("store").toString
    val df = (0 until 3000).map { i =>
      (s"SYM${i % 7}", 100.0 + (i % 250) * 0.01, (i % 13 + 1).toLong,
        java.sql.Date.valueOf(s"2024-01-${10 + i % 3}"),
        1704844800000L + i * 60000L)
    }.toDF("symbol", "price", "volume", "trade_date", "ts_ms")
    df.repartition(frags).write.partitionBy("trade_date").parquet(tmp)
    tmp
  }

  private def fragmentedStore(frags: Int): String =
    fragmentedStoreAt(Files.createTempDirectory("graft_cspec_"), frags)

  private def clusterKey = col("ts_ms")

  test("compaction collapses fragments and leaves content bit-identical") {
    val store = fragmentedStore(10)
    val before = spark.read.parquet(store)
      .select($"symbol", $"price", $"volume", $"ts_ms", $"trade_date".cast("string"))
      .collect().map(_.toString).sorted
    val flagged = Compaction.smallFilePartitions(store, "trade_date", minFiles = 4)
    assert(flagged.size === 3 && flagged.forall(_._2 === 10), flagged.toString)
    val stats = Compaction.compact(spark, store, "trade_date", clusterKey,
      targetBytes = 64L << 20, minFiles = 4)
    assert(stats.size === 3)
    stats.foreach { st =>
      assert(st.filesAfter < st.filesBefore,
        s"${st.partition}: ${st.filesBefore} -> ${st.filesAfter}")
      assert(st.filesAfter >= 1)
    }
    val after = spark.read.parquet(store)
      .select($"symbol", $"price", $"volume", $"ts_ms", $"trade_date".cast("string"))
      .collect().map(_.toString).sorted
    assert(after === before, "compaction changed the store's content")
    // No trash or tmp residue inside the store.
    assert(!new File(store, "_compact_trash").exists())
  }

  test("compaction is idempotent: the second pass finds nothing to do") {
    val store = fragmentedStore(6)
    val first = Compaction.compact(spark, store, "trade_date", clusterKey,
      targetBytes = 64L << 20, minFiles = 4)
    assert(first.nonEmpty)
    val second = Compaction.compact(spark, store, "trade_date", clusterKey,
      targetBytes = 64L << 20, minFiles = 4)
    assert(second.isEmpty, s"second pass re-compacted: $second")
  }

  test("partitions below minFiles are never touched") {
    val store = fragmentedStore(2) // 2 fragments per date < minFiles=4
    val namesBefore = new File(store).listFiles().filter(_.isDirectory)
      .flatMap(d => d.listFiles().map(_.getAbsolutePath)).sorted
    val stats = Compaction.compact(spark, store, "trade_date", clusterKey,
      targetBytes = 64L << 20, minFiles = 4)
    assert(stats.isEmpty)
    val namesAfter = new File(store).listFiles().filter(_.isDirectory)
      .flatMap(d => d.listFiles().map(_.getAbsolutePath)).sorted
    assert(namesAfter === namesBefore, "untouched partitions were rewritten")
  }

  test("a non-empty crash trash blocks compaction instead of being silently destroyed") {
    val store = fragmentedStore(6)
    // Simulate a crash between a partition's two swap moves: its
    // originals live in _compact_trash and the partition dir is empty.
    val part = new File(store).listFiles().filter(_.isDirectory).head
    val trash = new File(new File(store, "_compact_trash"), part.getName)
    trash.mkdirs()
    part.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      Files.move(f.toPath, new File(trash, f.getName).toPath)
    }
    val e = intercept[IllegalArgumentException] {
      Compaction.compact(spark, store, "trade_date", clusterKey,
        targetBytes = 64L << 20, minFiles = 4)
    }
    assert(e.getMessage.contains("crashed mid-swap"), e.getMessage)
    // Recovery (move the originals back) unblocks the run.
    trash.listFiles().foreach { f =>
      Files.move(f.toPath, new File(part, f.getName).toPath)
    }
    graft.streaming.ReplayStaging.deleteRecursively(
      new File(store, "_compact_trash").toPath)
    val stats = Compaction.compact(spark, store, "trade_date", clusterKey,
      targetBytes = 64L << 20, minFiles = 4)
    assert(stats.nonEmpty && stats.forall(st => st.filesAfter < st.filesBefore))
  }

  test("triage is size-aware: many LARGE files do not flag a partition") {
    val store = fragmentedStore(10)
    // Every fixture file counts as small under the count-based default.
    val byCount = Compaction.smallFilePartitions(store, "trade_date", 4)
    assert(byCount.size === 3)
    // With a smallness threshold below every file's size, the same
    // partitions hold 10 files each but ZERO fragments — a correctly
    // bin-packed large partition must never be re-flagged (r14 ADVICE).
    val bySize = Compaction.smallFilePartitions(store, "trade_date", 4,
      smallBytes = 1L)
    assert(bySize.isEmpty, bySize.toString)
    // Threshold between: files sized in [1, MaxValue) all count again.
    val wide = Compaction.smallFilePartitions(store, "trade_date", 4,
      smallBytes = 1L << 30)
    assert(wide.size === 3 && wide.forall(_._2 === 10), wide.toString)
  }

  test("maintenance converges when partition data exceeds minFiles x targetBytes") {
    // Per-date bytes ~= 4x targetBytes, so a bin-packed date keeps
    // ~4 files forever. Count-based triage (>= 3 files) would re-flag
    // and fully rewrite it every cycle; size-aware triage reaches a
    // fixed point in <= 3 passes (pass 2 may re-pack once if the first
    // sort changed the compression ratio; sorted input is then stable).
    // The payload is pseudo-random (incompressible) so file sizes are
    // data-dominated, not parquet-overhead-dominated.
    val rnd = new scala.util.Random(42)
    val base = Files.createTempDirectory("graft_cspec_big_")
    val store = base.resolve("store").toString
    (0 until 3000).map { i =>
      (s"SYM${i % 7}", rnd.alphanumeric.take(256).mkString,
        java.sql.Date.valueOf(s"2024-01-${10 + i % 3}"),
        1704844800000L + i * 60000L)
    }.toDF("symbol", "payload", "trade_date", "ts_ms")
      .repartition(10).write.partitionBy("trade_date").parquet(store)
    val total = Compaction.smallFilePartitions(store, "trade_date", 1).map(_._3).sum
    val target = math.max(1L, total / 12)
    var passes = 0
    while (passes < 5 && Compaction.compact(spark, store, "trade_date",
        clusterKey, targetBytes = target, minFiles = 3).nonEmpty) {
      passes += 1
    }
    assert(passes >= 1 && passes <= 3, s"compaction did not converge: $passes passes")
    // The converged store still holds multiple files per date (the
    // large-partition shape) yet nothing is flagged.
    val files = Compaction.smallFilePartitions(store, "trade_date", 1).map(_._2)
    assert(files.forall(_ >= 2), s"fixture degenerated to one file: $files")
  }

  test("store outside java.io.tmpdir: staging is in-store, swap succeeds, no residue") {
    // r14 ADVICE: the old java.io.tmpdir staging broke whenever the
    // store lived on a different filesystem. Staging now lives under
    // root/_compact_tmp (same fs by construction); prove it against a
    // store deliberately placed outside tmpdir.
    val base = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "graft_cspec_out_")
    try {
      val store = fragmentedStoreAt(base, 8)
      val before = spark.read.parquet(store)
        .select($"symbol", $"price", $"volume", $"ts_ms", $"trade_date".cast("string"))
        .collect().map(_.toString).sorted
      val stats = Compaction.compact(spark, store, "trade_date", clusterKey,
        targetBytes = 64L << 20, minFiles = 4)
      assert(stats.size === 3 && stats.forall(st => st.filesAfter < st.filesBefore))
      val after = spark.read.parquet(store)
        .select($"symbol", $"price", $"volume", $"ts_ms", $"trade_date".cast("string"))
        .collect().map(_.toString).sorted
      assert(after === before)
      assert(!new File(store, "_compact_trash").exists())
      assert(!new File(store, "_compact_tmp").exists())
    } finally graft.streaming.ReplayStaging.deleteRecursively(base)
  }

  test("a stale _compact_tmp (pre-swap crash residue) is cleared, not fatal") {
    val store = fragmentedStore(6)
    val stale = new File(new File(store, "_compact_tmp"), "rewrite")
    stale.mkdirs()
    Files.write(new File(stale, "junk.parquet").toPath, Array[Byte](1, 2, 3))
    val stats = Compaction.compact(spark, store, "trade_date", clusterKey,
      targetBytes = 64L << 20, minFiles = 4)
    assert(stats.nonEmpty && stats.forall(st => st.filesAfter < st.filesBefore))
    assert(!new File(store, "_compact_tmp").exists())
  }

  test("manifest commit works on a filesystem with NO atomic rename (r15 verdict #4)") {
    // The object-store posture, executed: compaction + read + vacuum
    // over a scheme whose rename is copy+delete (recorded), proving
    // the COMMIT is one manifest object PUT and no published file is
    // ever renamed.
    spark.sparkContext.hadoopConfiguration.set(
      "fs.nonatomic.impl", classOf[NonAtomicRenameFileSystem].getName)
    val local = Files.createTempDirectory("graft_cspec_manifest_")
    val store = s"nonatomic://${local.resolve("store")}"
    try {
      (0 until 3000).map { i =>
        (s"SYM${i % 7}", 100.0 + (i % 250) * 0.01, (i % 13 + 1).toLong,
          java.sql.Date.valueOf(s"2024-01-${10 + i % 3}"),
          1704844800000L + i * 60000L)
      }.toDF("symbol", "price", "volume", "trade_date", "ts_ms")
        .repartition(10).write.partitionBy("trade_date").parquet(store)
      // Adopt the store: manifest seq 0 snapshots the current listing.
      assert(Compaction.snapshotManifest(spark, store, "trade_date") === 0L)
      def content() = Compaction.read(spark, store)
        .select($"symbol", $"price", $"volume", $"ts_ms", $"trade_date".cast("string"))
        .collect().map(_.toString).sorted
      val before = content()
      assert(before.length === 3000)
      NonAtomicRenameFileSystem.renames.clear()
      val stats = Compaction.compactManifest(spark, store, "trade_date",
        clusterKey, targetBytes = 64L << 20, minFiles = 4)
      assert(stats.size === 3 && stats.forall(st => st.filesAfter < st.filesBefore))
      // The manifest itself was never renamed INTO place — published
      // by a single create, so non-atomic rename cannot tear the
      // commit. (Staging moves of not-yet-referenced data files are
      // allowed and expected.)
      import scala.jdk.CollectionConverters._
      val manifestRenames = NonAtomicRenameFileSystem.renames.asScala
        .filter { case (src, dst) =>
          new HPath(src).getName.startsWith("_manifest-") ||
            new HPath(dst).getName.startsWith("_manifest-") }
      assert(manifestRenames.isEmpty, s"manifest was renamed: $manifestRenames")
      // Content through the manifest reader is unchanged, while the
      // old fragments are STILL on disk (vacuum's job, after the
      // deployment's read-grace window) — a directory-listing read
      // would double-count, which is exactly why manifest-mode readers
      // go through Compaction.read.
      assert(content() === before)
      assert(spark.read.parquet(store).count() > 3000)
      val (dataGone, manifestsGone) = Compaction.vacuum(spark, store, "trade_date")
      assert(dataGone > 0 && manifestsGone === 1L, s"($dataGone, $manifestsGone)")
      assert(content() === before)
      // After vacuum the directory listing agrees with the manifest.
      assert(spark.read.parquet(store).count() === 3000)
      // Maintenance converges: a second pass finds nothing.
      assert(Compaction.compactManifest(spark, store, "trade_date",
        clusterKey, targetBytes = 64L << 20, minFiles = 4).isEmpty)
    } finally graft.streaming.ReplayStaging.deleteRecursively(local)
  }

  test("a torn manifest is skipped: readers fall back to the previous seq") {
    val local = Files.createTempDirectory("graft_cspec_torn_")
    val store = local.resolve("store").toString
    try {
      (0 until 300).map { i =>
        (s"SYM${i % 3}", i.toDouble, java.sql.Date.valueOf("2024-01-10"),
          1704844800000L + i * 1000L)
      }.toDF("symbol", "price", "trade_date", "ts_ms")
        .repartition(2).write.partitionBy("trade_date").parquet(store)
      Compaction.snapshotManifest(spark, store, "trade_date")
      val good = Compaction.read(spark, store).count()
      assert(good === 300)
      // A writer died mid-PUT of seq 1: truncated JSON, no trailing
      // "complete":true. Readers must resolve seq 0.
      Files.write(new File(store, "_manifest-" + "0" * 19 + "1.json").toPath,
        """{"seq":1,"files":["trade_date=2024-01-10/nothing.parquet""".getBytes)
      assert(Compaction.read(spark, store).count() === 300)
      // And the next snapshot commits ABOVE the torn seq (no reuse —
      // writeManifest refuses to overwrite an existing object).
      assert(Compaction.snapshotManifest(spark, store, "trade_date") === 2L)
      assert(Compaction.read(spark, store).count() === 300)
    } finally graft.streaming.ReplayStaging.deleteRecursively(local)
  }

  test("a committed-EMPTY manifest reads as zero rows WITH the table schema (r16 ADVICE)") {
    val local = Files.createTempDirectory("graft_cspec_empty_")
    val store = local.resolve("store").toString
    try {
      (0 until 50).map { i =>
        (s"SYM${i % 3}", i.toDouble, java.sql.Date.valueOf("2024-01-10"),
          1704844800000L + i * 1000L)
      }.toDF("symbol", "price", "trade_date", "ts_ms")
        .write.partitionBy("trade_date").parquet(store)
      Compaction.snapshotManifest(spark, store, "trade_date")
      val full = Compaction.read(spark, store)
      assert(full.count() === 50)
      // A retention/maintenance commit that empties the table: seq 1
      // references zero files; the physical fragments stay on disk
      // until vacuum (the normal pre-vacuum window).
      Files.write(new File(store, "_manifest-" + "0" * 19 + "1.json").toPath,
        """{"seq":1,"files":[],"complete":true}""".getBytes)
      val empty = Compaction.read(spark, store)
      assert(empty.count() === 0)
      // The schema survives, so downstream column references that
      // work on the non-empty table keep working (the r16 finding:
      // a schema-less emptyDataFrame made them AnalysisException).
      assert(empty.schema.fieldNames.toSet === full.schema.fieldNames.toSet)
      assert(empty.filter(col("symbol") === "SYM0")
        .select(col("price"), col("trade_date")).count() === 0)
    } finally graft.streaming.ReplayStaging.deleteRecursively(local)
  }

  test("cluster-key locality: per-file extents within a date do not interleave") {
    val store = fragmentedStore(10)
    // Small target so each date compacts to SEVERAL files — the
    // locality claim is vacuous with one file per date.
    val bytes = Compaction.smallFilePartitions(store, "trade_date", 1).map(_._3).sum
    val stats = Compaction.compact(spark, store, "trade_date", clusterKey,
      targetBytes = math.max(1L, bytes / 12), minFiles = 4)
    assert(stats.exists(_.filesAfter >= 2),
      s"fixture too small to test multi-file locality: $stats")
    val extents = spark.read.parquet(store)
      .select($"trade_date".cast("string").as("d"), $"ts_ms",
        input_file_name().as("f"))
      .groupBy($"d", $"f")
      .agg(min($"ts_ms").as("lo"), max($"ts_ms").as("hi"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    extents.foreach { case (d, files) =>
      // repartitionByRange gives each file a contiguous key range
      // within its date: sorted by lo, every file's lo must be >= the
      // previous file's hi (boundary ties allowed — range partitioning
      // puts equal keys in one partition, so a strict interleave is
      // the only failure shape).
      val sorted = files.sortBy(f => (f._2, f._3))
      sorted.sliding(2).foreach {
        case Array((_, _, hi1), (_, lo2, _)) =>
          assert(lo2 >= hi1, s"$d: file extents interleave ($hi1 > $lo2)")
        case _ => ()
      }
    }
  }
}
