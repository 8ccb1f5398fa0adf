package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line
  * {"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Methodology (pinned in round 5 after round 4's driver run showed
  * 2–7× swings on queries whose code and plans had not changed):
  *   - queries run in sorted-name order, so per-query numbers are
  *     comparable across rounds;
  *   - each query runs SPARK_GRAFT_BENCH_REPEATS times (default 5 —
  *     raised from 2 in round 8 after three rounds of noise episodes:
  *     r4 q10 7×, r5 shingle family ~2×, r7 d7/d8 ~5× — all on
  *     byte-identical jars; min-of-2 cannot separate a real 2× plan
  *     regression from one loaded interval, min-of-5 keeps the whole
  *     101-query run under ~5 min while giving each query five
  *     chances to land on a quiet core) and reports the MINIMUM —
  *     the best estimator of plan cost under transient co-tenant
  *     load, and the first run doubles as the query's own warm-up
  *     (file-index listing, codegen cache);
  *   - the full JSON is ALSO written to SPARK_GRAFT_BENCH_OUT
  *     (default BENCH_LOCAL.json in the cwd): round 4's stdout tail
  *     capture truncated the head of the one JSON line and lost the
  *     a1–a7 timings, so the line now survives on disk regardless of
  *     how much of stdout the harness keeps.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "5").toInt)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // HotSpot refuses to JIT methods >8000 bytecodes (DontCompileHuge
      // Methods): a whole-stage-codegen'd multi-level aggregate cascade
      // can exceed that and run INTERPRETED (~3.5x slower on a8's fused
      // stage, round 9). At 8000 Spark falls back to per-operator
      // execution for oversized stages, which the JIT does compile.
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/session (codegen, file index, JIT) outside the
    // timed region so the first query doesn't absorb ~7s of startup.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/events.parquet").limit(1).count()
    // Stable iteration order so per-query numbers are comparable
    // across rounds. SPARK_GRAFT_ONLY=a1,d9 restricts the run while
    // iterating on one query's plan (dev convenience; the driver's
    // per-round bench leaves it unset and times everything).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // A failing query reports -1.0 in the per-query map (visible, not
    // a fake wall-clock figure) and is EXCLUDED from the total, which
    // instead flags it in an explicit "failed" list — summing the
    // sentinel would silently SHRINK the headline number.
    val results: Seq[(String, Option[Double], Option[Double])] = names.map { name =>
      val fn = SparkEntry.queries(name)
      // The sr streaming-replay queries run a full writeStream drain
      // (stage + checkpoint + AvailableNow micro-batches) per call;
      // their wall is fixed stream orchestration, not plan cost, so
      // min-of-N buys nothing and would multiply ~3-4 s of setup into
      // the headline. One rep, documented in BENCHNOTES.
      val reps = if (name.startsWith("sr")) 1 else repeats
      val times: Seq[Option[Double]] = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            None
        }
      }
      val cold = if (times.exists(_.isEmpty)) None else Some(times.flatten.min)
      // Warm-plan re-run (round-9 verdict: trivial queries are
      // dominated by per-query plan construction/analysis jitter,
      // masking real deltas in round-over-round diffs): build the
      // frame ONCE, then time only execution. The warm column is the
      // low-noise signal bench_diff uses for its noise band; the cold
      // column stays the headline (it is what a user pays).
      // Two warm reps suffice: with construction/analysis excluded the
      // residual variance is execution-only, far below the cold run's.
      // sr streaming replays are EXCLUDED (r10 ADVICE): building the
      // frame re-runs the whole writeStream drain, and the "warm" count
      // then times an already-materialized localCheckpoint — a fake
      // ~300× speedup that would poison bench_diff's noise band. They
      // report -1.0, which bench_diff's >0 filter drops.
      val warm: Option[Double] =
        if (name.startsWith("sr")) None
        else cold.flatMap { _ =>
          try {
            val df = fn(spark, sfDir)
            val ts = (1 to math.min(repeats, 2)).map { _ =>
              val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
            }
            Some(ts.min)
          } catch { case _: Throwable => None }
        }
      (name, cold, warm)
    }
    val qs = results
      .map { case (k, v, _) => "\"" + k + "\":" + f"${v.getOrElse(-1.0)}%.3f" }
      .mkString("{", ",", "}")
    val qsWarm = results
      .map { case (k, _, w) => "\"" + k + "\":" + f"${w.getOrElse(-1.0)}%.3f" }
      .mkString("{", ",", "}")
    // The fixed per-query floor: a pre-listed single-row scan through
    // the same session — what a "0-cost" query measures here.
    val overhead = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        spark.read.parquet(s"$sfDir/events.parquet").limit(1).count()
        (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }
    val failed = results.collect { case (k, None, _) => "\"" + k + "\"" }
    // With any failure the green-subset sum is NOT a comparable
    // headline (round 8: 53 failures read as a "41% speedup" to any
    // consumer ignoring the failed list) — report null instead.
    val total =
      if (failed.nonEmpty) "null" else results.flatMap(_._2).sum.toString
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""queries_warm":$qsWarm,""" + f""""overhead":$overhead%.3f,""" +
        s""""sf":"$sfDir","repeats":$repeats,"stat":"min",""" +
        s""""failed":${failed.mkString("[", ",", "]")}}"""
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
        (line + "\n").getBytes("UTF-8"))
    } catch {
      case e: Exception =>
        System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    println(line)
    spark.stop()
  }
}
