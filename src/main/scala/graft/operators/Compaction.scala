package graft.operators

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for a date-partitioned parquet store — the
  * single most common maintenance job on a real 100 TB lake fed by
  * 10-second micro-batches (r13 verdict item #3). The reference's gold
  * tables get this for free from Cassandra's
  * TimeWindowCompactionStrategy (schemas/cassandra/keyspace.cql:37-43:
  * 1-day windows bin-pack each day's SSTables); on a parquet lake it
  * is a job, and this is that job.
  *
  * Shape (Delta OPTIMIZE's, re-expressed on plain parquet):
  *   1. DRIVER-side partition triage — list `part=value` directories,
  *      flag those with ≥ `minFiles` fragments. Bounded by partition
  *      count (a date-partitioned store has thousands of partitions,
  *      not billions), same posture as Retention.dropExpiredPartitions.
  *   2. ONE distributed rewrite of the flagged partitions only:
  *      `repartitionByRange` over (partition column, cluster key) into
  *      ceil(flaggedBytes / targetBytes) output slots, rows sorted
  *      within each slot — each output file covers a contiguous
  *      cluster-key range WITHIN its date (a range slot can straddle a
  *      date boundary, which the partitioned write then splits: at
  *      most one extra file per partition, the bin-packing bound).
  *      Untouched partitions are never read.
  *   3. DRIVER-side atomic-ish swap: each flagged partition's old
  *      fragment files move aside into an underscore-hidden trash dir,
  *      the compacted files move in, the trash drops last. A crash
  *      mid-swap leaves some partitions compacted and some not — both
  *      states read correctly, except the one partition caught between
  *      its two moves, whose originals sit complete in the trash; a
  *      later run REFUSES to start over a non-empty trash (it would
  *      otherwise end by deleting the only complete copy), demanding
  *      explicit recovery. A clean re-run after recovery converges
  *      (idempotent maintenance, like every job in this repo).
  *
  * Content is IDENTICAL before and after — compaction moves bytes,
  * never rows — proven under the DuckDB oracle by v8_compaction (the
  * read-back of a compacted store must hash-match the silver frame
  * that was appended into it) and pinned by CompactionSpec (file
  * counts, cluster-extent disjointness, idempotence).
  *
  * 100 TB posture: the rewrite touches only flagged partitions (the
  * read is a partition-pruned scan), the shuffle moves exactly the
  * bytes being compacted once, and the swap is O(files) driver
  * metadata work. Z-order within `trade_date` is PRESERVED because
  * the cluster key is the same morton key z1 writes with — compaction
  * re-sorts by it, so per-file min/max extents stay tight and scan
  * pruning on either z dimension survives the rewrite.
  */
object Compaction {

  /** One flagged partition's before/after accounting. */
  final case class PartitionStats(partition: String, filesBefore: Long,
                                  bytesBefore: Long, filesAfter: Long,
                                  bytesAfter: Long)

  private def parquetFiles(dir: File): Array[File] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  /** Driver-side triage: `part=value` directories with ≥ `minFiles`
    * parquet fragments, with their current file/byte counts.
    */
  def smallFilePartitions(root: String, partitionCol: String,
                          minFiles: Int): Seq[(String, Long, Long)] = {
    val dirs = Option(new File(root).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith(s"$partitionCol="))
    dirs.toSeq.flatMap { d =>
      val fs = parquetFiles(d)
      if (fs.length >= minFiles)
        Some((d.getName, fs.length.toLong, fs.map(_.length).sum))
      else None
    }.sortBy(_._1)
  }

  /** Compact every partition of `root` holding ≥ `minFiles` parquet
    * fragments into ~`targetBytes` files clustered by `clusterKey`.
    * Returns per-partition before/after stats (empty = nothing was
    * flagged; the store is untouched).
    */
  def compact(spark: SparkSession, root: String, partitionCol: String,
              clusterKey: Column, targetBytes: Long,
              minFiles: Int = 4): Seq[PartitionStats] = {
    // A non-empty trash dir means a previous run crashed between
    // moving a partition's originals aside and moving the compacted
    // files in: the originals in trash are the only complete copy of
    // that partition. Running again would finish by DELETING the
    // trash, so refuse loudly instead — the operator must never be
    // the thing that turns a recoverable crash into data loss.
    val staleTrash = new File(root, "_compact_trash")
    require(!staleTrash.exists() ||
        Option(staleTrash.listFiles()).forall(_.isEmpty),
      s"compaction: $staleTrash is non-empty — a previous run crashed " +
        "mid-swap and its partition originals are in there; restore them " +
        "(move the trash's files back into their partition dirs) or " +
        "delete the trash explicitly before compacting again")
    val flagged = smallFilePartitions(root, partitionCol, minFiles)
    if (flagged.isEmpty) return Seq.empty
    val values = flagged.map(_._1.split("=", 2)(1))
    val bytesFlagged = flagged.map(_._3).sum
    val slots = math.max(1L, (bytesFlagged + targetBytes - 1) / targetBytes).toInt
    // Partition-pruned scan of exactly the flagged partitions
    // (basePath keeps the partition column in the frame so the
    // partitioned re-write can route rows).
    val df = spark.read.option("basePath", root).parquet(root)
      .filter(col(partitionCol).cast("string").isin(values: _*))
    val tmpRoot = Files.createTempDirectory("graft_compact_")
    val tmp = tmpRoot.resolve("rewrite").toString
    try {
      df.repartitionByRange(slots, col(partitionCol), clusterKey)
        .sortWithinPartitions(col(partitionCol), clusterKey)
        .write.partitionBy(partitionCol).parquet(tmp)
      // Swap: old fragments aside into an underscore-prefixed trash
      // dir (hidden from Spark's file index), compacted files in,
      // trash dropped last. Plain parquet has no manifest to commit
      // atomically — a production lake would do this step through a
      // table format's transaction log; here a crash mid-swap leaves
      // the partition's originals intact in trash (recoverable), and
      // the window where a partition is visible part-swapped is the
      // per-partition move loop, not the whole rewrite.
      val trash = new File(root, "_compact_trash")
      val stats = flagged.map { case (partDir, nBefore, bBefore) =>
        val oldDir = new File(root, partDir)
        val newDir = new File(tmp, partDir)
        val newFiles = parquetFiles(newDir)
        require(newFiles.nonEmpty,
          s"compaction produced no files for $partDir — refusing to drop the originals")
        val partTrash = new File(trash, partDir)
        partTrash.mkdirs()
        parquetFiles(oldDir).foreach { f =>
          Files.move(f.toPath, Paths.get(partTrash.toString, f.getName),
            StandardCopyOption.ATOMIC_MOVE)
        }
        newFiles.foreach { f =>
          Files.move(f.toPath, Paths.get(oldDir.toString, f.getName),
            StandardCopyOption.ATOMIC_MOVE)
        }
        PartitionStats(partDir, nBefore, bBefore,
          newFiles.length.toLong, newFiles.map(_.length).sum)
      }
      graft.streaming.ReplayStaging.deleteRecursively(trash.toPath)
      stats
    } finally graft.streaming.ReplayStaging.deleteRecursively(tmpRoot)
  }
}
