package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling
import graft.sources.Tables

class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  test("deterministic sample is repartition-invariant and ~right-sized") {
    val docs = Tables.documents(spark, Sf)
    val s1 = Sampling.deterministicSample(docs, "doc_id", 1000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.deterministicSample(docs.repartition(13), "doc_id", 1000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 === s2) // same rows under any partitioning
    val rate = s1.size.toDouble / docs.count()
    assert(rate > 0.05 && rate < 0.15, s"rate=$rate")
  }

  test("stratified sample returns exactly n per stratum") {
    val out = Sampling.stratifiedSample(Tables.documents(spark, Sf), "lang", "doc_id", 5)
      .groupBy("lang").count().collect()
    assert(out.length === 5)
    assert(out.forall(_.getAs[Long]("count") === 5L))
  }

  test("stratified sample: null strata survive; boundary path equals the windowed form") {
    val rows = (0L until 40L).map(i =>
      (i, if (i % 4 == 0) null else s"g${i % 3}"))
    val df = rows.toDF("doc_id", "lang")
    def keyset(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    val fast = keyset(Sampling.stratifiedSample(df, "lang", "doc_id", 3))
    val windowed = keyset(Sampling.stratifiedSampleWindowed(df, "lang", "doc_id", 3))
    assert(fast === windowed)
    // The null stratum keeps its quota like any other.
    assert(fast.count(_._2.isEmpty) === 3)
  }

  test("mixture sample hits exact proportions, equals the naive rank form, partition-invariant") {
    val docs = Tables.documents(spark, Sf)
    val weights = Map("src0" -> 4000L, "src1" -> 3000L, "src2" -> 2000L, "src3" -> 1000L)
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.mixtureSample(df, "source", "doc_id", weights)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = ids(docs)
    assert(got === ids(docs.repartition(13)))
    // Exact 4:3:2:1 proportions.
    val bySrc = Sampling.mixtureSample(docs, "source", "doc_id", weights)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = bySrc.values.sum
    weights.foreach { case (s, w) =>
      assert(bySrc(s) === w * total / 10000L, s"source $s off-mixture: $bySrc")
    }
    // The boundary-bucket path selects the same set as the naive
    // per-source (hash, id) rank — the formulation the oracle states.
    import org.apache.spark.sql.expressions.Window
    val naive = docs.filter(col("source").isin(weights.keys.toSeq: _*))
      .withColumn("__rn", row_number().over(Window.partitionBy(col("source"))
        .orderBy(Sampling.hashBucket(col("doc_id")), col("doc_id"))))
      .join(bySrc.toSeq.toDF("source", "__k"), "source")
      .filter(col("__rn") <= col("__k"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === naive)
    // Weights must sum to the full e4 scale.
    intercept[IllegalArgumentException] {
      Sampling.mixtureSample(docs, "source", "doc_id", Map("src0" -> 5000L))
    }
  }

  test("mixture proportions stay exact for misaligned source counts") {
    // Counts (26,19,13,7) at 4:3:2:1 — raw t = 63 would give quotas
    // (25,18,12,6) = 41%/29.5%/19.7%/9.8%; flooring t to the weight
    // unit (60) restores exactly (24,18,12,6).
    val rows = Seq.tabulate(26)(i => (100L + i, "a")) ++
      Seq.tabulate(19)(i => (200L + i, "b")) ++
      Seq.tabulate(13)(i => (300L + i, "c")) ++
      Seq.tabulate(7)(i => (400L + i, "d"))
    val df = rows.toDF("doc_id", "source")
    val got = Sampling.mixtureSample(df, "source", "doc_id",
        Map("a" -> 4000L, "b" -> 3000L, "c" -> 2000L, "d" -> 1000L))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 24L, "b" -> 18L, "c" -> 12L, "d" -> 6L))
  }

  test("purged folds: test window exact, embargo hugs its edges, rest trains") {
    // 10 events at ms 0..9, 2 folds, 1 ms embargo. Fold 0 = [0,4],
    // fold 1 = [5,9]; each fold's embargo zone is one adjacent ms.
    val df = (0L until 10L).map(t => (t, t)).toDF("event_id", "ms")
      .withColumn("event_time", timestamp_millis(col("ms")))
    val out = Sampling.purgedFolds(df, "event_time", nFolds = 2, embargoMs = 1L)
      .collect()
      .map(r => (r.getAs[Int]("test_fold"), r.getAs[Long]("event_id")) -> r.getAs[String]("role"))
      .toMap
    (0L to 4L).foreach(t => assert(out((0, t)) === "test", s"t=$t"))
    assert(out((0, 5L)) === "embargo")
    (6L to 9L).foreach(t => assert(out((0, t)) === "train", s"t=$t"))
    (5L to 9L).foreach(t => assert(out((1, t)) === "test", s"t=$t"))
    assert(out((1, 4L)) === "embargo")
    (0L to 3L).foreach(t => assert(out((1, t)) === "train", s"t=$t"))
    // Partition invariance (the determinism contract).
    val again = Sampling.purgedFolds(df.repartition(7), "event_time", 2, 1L)
      .collect()
      .map(r => (r.getAs[Int]("test_fold"), r.getAs[Long]("event_id")) -> r.getAs[String]("role"))
      .toMap
    assert(again === out)
  }

  test("purged folds fail loudly on null timestamps and column collisions") {
    val base = Seq((1L, 100L), (2L, 200L)).toDF("event_id", "ms")
      .withColumn("event_time", timestamp_millis(col("ms")))
    // Partial nulls: the per-row assert fires (never silently 'train').
    val withNull = base.unionByName(
      Seq((3L, 0L)).toDF("event_id", "ms")
        .withColumn("event_time", lit(null).cast("timestamp")))
    intercept[Exception] {
      Sampling.purgedFolds(withNull, "event_time", 2, 0L).collect()
    }
    // All nulls: rejected up front, not an empty result.
    intercept[IllegalArgumentException] {
      Sampling.purgedFolds(
        base.withColumn("event_time", lit(null).cast("timestamp")), "event_time", 2, 0L)
    }
    // Output-column collision: rejected, not silently overwritten.
    intercept[IllegalArgumentException] {
      Sampling.purgedFolds(base.withColumn("role", lit("x")), "event_time", 2, 0L)
    }
  }

  test("dist quantiles: exact picks on a hand-built distribution; equals percentile_disc") {
    import spark.implicits._
    // [1,1,2,3,100]: median rank ⌈5·0.5⌉ = 3 → first value with cum ≥ 3
    // is 2; p99 rank ⌈4.95⌉ = 5 → 100. The outlier must not smear picks.
    val tiny = Seq(("A", 1.0), ("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 100.0))
      .toDF("symbol", "price")
    val r = Sampling.distQuantiles(tiny, "symbol", "price", Seq(5000, 9900))
      .collect().head
    assert(r.getAs[Double]("p5000") === 2.0)
    assert(r.getAs[Double]("p9900") === 100.0)
    assert(r.getAs[Long]("n") === 5L)
    // Property: the compressed-distribution walk equals the sort-based
    // percentile_disc for every key and rank on seeded random data
    // (same lower-discrete-percentile rule, different plan shape).
    val rng = new scala.util.Random(11)
    val big = (0 until 1000).map(i =>
      (s"S${i % 7}", (1 + rng.nextInt(50)) / 4.0)).toDF("symbol", "price")
    val viaDist = Sampling.distQuantiles(big, "symbol", "price", Seq(2500, 5000, 9500))
      .collect().map(r => r.getAs[String]("symbol") ->
        ((r.getAs[Double]("p2500"), r.getAs[Double]("p5000"), r.getAs[Double]("p9500")))).toMap
    val viaSort = big.groupBy(col("symbol"))
      .agg(expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY price)").as("a"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY price)").as("b"),
        expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY price)").as("c"))
      .collect().map(r => r.getAs[String]("symbol") ->
        ((r.getAs[Double]("a"), r.getAs[Double]("b"), r.getAs[Double]("c")))).toMap
    assert(viaDist === viaSort)
  }

  test("chunking windows overlap correctly and cover every token") {
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, ""), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.chunkByTokens(df, chunkTokens = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    // step 3 over 10 tokens: starts 0,3,6,9 with lengths 4,4,4,1.
    assert(out.filter(_._1 == 1L) ===
      Seq((1L, 0, 0, 4L), (1L, 1, 3, 4L), (1L, 2, 6, 4L), (1L, 3, 9, 1L)))
    assert(!out.exists(_._1 == 2L)) // empty text -> no chunks
    assert(out.filter(_._1 == 3L) === Seq((3L, 0, 0, 1L)))
    // Consecutive chunks share exactly `overlap` tokens: chunk i ends
    // at start+4, chunk i+1 starts at start+3.
  }

  test("chunking preserves case: the chunk fingerprint is over the raw text") {
    val df = Seq((1L, "Hello World"), (2L, "hello world")).toDF("doc_id", "text")
    val md5s = graft.operators.TextAnalysis.chunkByTokens(df, chunkTokens = 4, overlap = 1)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(md5s(1L) === org.apache.commons.codec.digest.DigestUtils.md5Hex("Hello World"))
    assert(md5s(1L) !== md5s(2L))
  }

  test("labeled split is exhaustive, disjoint, stable under corpus growth") {
    val small = (0L until 500L).toDF("doc_id")
    val splits = Seq("train" -> 9000L, "val" -> 500L, "test" -> 500L)
    def labels(df: org.apache.spark.sql.DataFrame) =
      Sampling.labeledSplit(df, "doc_id", splits)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val l1 = labels(small)
    assert(l1.size === 500 && l1.values.toSet.subsetOf(Set("train", "val", "test")))
    // A doc keeps its split when the corpus doubles — no re-shuffling
    // of membership across dataset versions.
    val l2 = labels((0L until 1000L).toDF("doc_id"))
    l1.foreach { case (id, s) => assert(l2(id) === s) }
    // Roughly the right fractions.
    val frac = l2.values.groupBy(identity).view.mapValues(_.size / 1000.0).toMap
    assert(frac("train") > 0.85 && frac("train") < 0.95)
    intercept[IllegalArgumentException] {
      Sampling.labeledSplit(small, "doc_id", Seq("a" -> 5000L))
    }
  }

  test("packByTokenBudget matches the sequential prefix-sum reference and is partition-invariant") {
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), (length(col("text")) / 4 + 1).cast("long").as("n_tokens"))
    val budget = 2000L

    val got = Sampling.packByTokenBudget(docs, "doc_id", "n_tokens", budget)
      .select("doc_id", "shard_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // Sequential reference: global (hashBucket, id) order, running sum,
    // shard = floor((cum - tokens) / budget).
    val rows = docs.withColumn("__hb", Sampling.hashBucket(col("doc_id")))
      .collect().map(r => (r.getAs[Long]("__hb"), r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens")))
      .sortBy(t => (t._1, t._2))
    var cum = 0L
    val want = rows.map { case (_, id, tok) =>
      cum += tok
      id -> (cum - tok) / budget
    }.toMap
    assert(got === want)
    assert(got.values.toSet.size > 1, "expected multiple shards at this budget")

    // Same ids under a different input partitioning and explicit nPart.
    val got2 = Sampling.packByTokenBudget(docs.repartition(7), "doc_id", "n_tokens", budget, numPartitions = 5)
      .select("doc_id", "shard_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 === want)
  }

  test("sequence packing: concat-and-chunk spans, empty/null docs, multi-block prefix") {
    // seqLen=4, blockIds=2 forces the distributed prefix machinery
    // across three id blocks. Token stream in doc_id order:
    // doc1 3 toks [0,3) -> seq 0 only; doc2 empty; doc3 6 toks
    // [3,9) -> seqs 0..2; doc4 NULL text -> 0 toks.
    val df = Seq(
      (1L, "a b c"),
      (2L, ""),
      (3L, "t1 t2 t3 t4 t5 t6"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Sampling.packSequences(df, seqLen = 4, blockIds = 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tok"),
          Option(r.getAs[java.lang.Long]("first_seq")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("last_seq")).map(_.toLong),
          r.getAs[Long]("n_seqs")))).toMap
    assert(out(1L) === ((3L, Some(0L), Some(0L), 1L)))
    assert(out(2L) === ((0L, None, None, 0L)))
    assert(out(3L) === ((6L, Some(0L), Some(2L), 3L)))
    assert(out(4L) === ((0L, None, None, 0L)))
  }

  test("histogram bins partition the domain with under/overflow") {
    val df = Seq(-1.0, 0.0, 4.9, 5.0, 199.9, 200.0, 500.0).toDF("v")
    val bins = Sampling.histogram(df, "v", 0.0, 200.0, 40)
      .collect().map(r => r.getAs[Int]("bin") -> r.getAs[Long]("n")).toMap
    assert(bins(0) === 1L)  // -1 underflow
    assert(bins(1) === 2L)  // 0.0 and 4.9
    assert(bins(2) === 1L)  // 5.0 lands in second bin
    assert(bins(40) === 1L) // 199.9
    assert(bins(41) === 2L) // 200, 500 overflow
    assert(bins.values.sum === 7L)
  }

  test("temperature weights: sqrt flattening, hand-computed shares and targets") {
    import spark.implicits._
    // 100 'big' + 25 'small': sqrt(100)=10, sqrt(25)=5 exactly, so
    // every intermediate is integer: sqrt_e6 = 1e7/5e6,
    // temp shares 2/3 vs 1/3 (floored), naturals 4/5 vs 1/5.
    val df = (Seq.fill(100)("big") ++ Seq.fill(25)("small")).toDF("source")
    val m = Sampling.temperatureWeights(df, "source").collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(m("big") === Seq(100L, 800000L, 666666L, 83L))
    assert(m("small") === Seq(25L, 200000L, 333333L, 41L))
    // α = 0.5 flattens: the head shrinks toward, never past, the tail.
    assert(666666L < 800000L && 333333L > 200000L)
  }
}
