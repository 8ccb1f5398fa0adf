package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators._

/** Degenerate inputs: every operator must return empty/identity
  * results on empty input rather than throwing — the difference
  * between a library and a demo when a partition filter matches
  * nothing.
  */
class EdgeCaseSpec extends SparkSpecBase {
  import spark.implicits._

  private val emptyTrades = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(
      StructField("event_id", LongType), StructField("symbol", StringType),
      StructField("price", DoubleType), StructField("volume", LongType),
      StructField("event_time", TimestampType))))

  test("OHLCV, latest prices, dedup on empty input") {
    assert(Ohlcv.bars5m(emptyTrades).count() === 0)
    assert(LatestPrices.snapshot(emptyTrades).count() === 0)
    assert(Medallion.dedup(emptyTrades).count() === 0)
  }

  test("text/dedup operators on empty and degenerate documents") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "x")).toDF("doc_id", "text")
    val feats = TextAnalysis.features(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    assert(feats(1L) === 0L && feats(2L) === 0L && feats(3L) === 1L)
    // Shingles need >= n tokens: empty shingle sets score j=0, no crash.
    assert(Dedup.jaccardPairs(docs, 0L, shingleN = 2).count() === 3)
    assert(Dedup.jaccardPairs(docs, 1L, shingleN = 2).count() === 0)
    assert(Dedup.minhashCandidates(docs).count() === 0)
    assert(Dedup.nearDedup(docs, 500000L).count() === 3)
  }

  test("round-9 operators on null, empty, and degenerate input") {
    // Classifier: null text === empty text (0 grams, score 0, drop).
    val docs = Seq((1L, null: String), (2L, ""), (3L, "one"), (4L, "  \t "))
      .toDF("doc_id", "text")
    val scored = TextAnalysis.hashedNgramScore(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(scored(1L) === ((0L, 0L, "drop")))
    assert(scored(2L) === ((0L, 0L, "drop")))
    assert(scored(4L) === ((0L, 0L, "drop")))
    assert(scored(3L)._1 === 1L)
    // Novelty/overlap: sub-shingle docs simply don't appear; a single
    // source yields no pairs. No crashes, no sentinel rows.
    assert(graft.PipelineQueries.ngramNoveltyOn(
      docs.withColumn("source", lit("s"))).count() === 0)
    assert(graft.PipelineQueries.sourceOverlapOn(
      Seq((1L, "alpha beta gamma delta", "only")).toDF("doc_id", "text", "source")).count() === 0)
    // Hard negatives: empty query set -> empty result, correct shape.
    val e = graft.sources.Tables.embeddings(spark, Sf)
    val hn = graft.operators.Similarity.hardNegatives(e.limit(0), e, k = 3)
    assert(hn.columns.toSeq === Seq("query_id", "neighbor_id", "cos_sim", "rank"))
    assert(hn.count() === 0)
    // PQ: a zero vector encodes without crashing and scores cos 0.
    import graft.operators.Pq
    val books = Pq.codebooks(e, m = 8, kCode = 16)
    val zero = Seq((99L, List.fill(64)(0f))).toDF("vec_id", "embedding")
    val codes = Pq.encode(zero, books).collect().head.getSeq[Int](1)
    assert(codes.length === 8)
    val scoredZero = Pq.pqTopK(zero, e.limit(10), k = 3).collect()
    assert(scoredZero.forall(_.getAs[Double]("approx_cos") === 0.0))
  }

  test("round-4 operators on empty and degenerate input") {
    val et = emptyTrades.withColumn("trade_date", col("event_time").cast("date"))
    assert(Ohlcv.rollup(Ohlcv.bars5m(emptyTrades), "1 hour").count() === 0)
    assert(Indicators.drawdown(et).count() === 0)
    assert(Indicators.macdDaily(et).count() === 0)
    assert(Indicators.returnCovariance(et).count() === 0)
    val docs = Seq((1L, ""), (2L, "   "), (3L, "x y")).toDF("doc_id", "text")
    // Docs shorter than the window: zero windows, zero fractions, no crash.
    val ss = Dedup.substringDupStats(docs, k = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_windows"), r.getAs[Long]("shared_frac_e6")))).toMap
    assert(ss === Map(1L -> ((0L, 0L)), 2L -> ((0L, 0L)), 3L -> ((0L, 0L))))
    assert(Dedup.windowDecontamination(docs, col("doc_id") === 1L, k = 3).count() === 0)
    // Heavy hitters over an empty frame: empty sketch, empty result.
    val emptyDocs = docs.filter(col("doc_id") < 0)
    assert(HeavyHitters.exactHeavyHitters(
      emptyDocs.select(col("text").as("token")), "token", phiE6 = 100000L).count() === 0)
    assert(TextAnalysis.charsetStats(docs).count() === 3)
    assert(Curation.curate(
      emptyDocs.withColumn("source", lit("s")), lit(false)).count() === 0)
  }

  test("similarity with empty query set and zero vectors") {
    val vecs = Seq((1L, Seq(0f, 0f)), (2L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    // Zero vector: cosine guard returns 0, no NaN.
    val sims = Similarity.bruteForceTopK(vecs.filter(col("vec_id") === 1), vecs, k = 5)
      .collect()
    assert(sims.length === 1 && sims.head.getAs[Double]("cos_sim") === 0.0)
    val none = Similarity.bruteForceTopK(vecs.filter(col("vec_id") > 99), vecs, k = 5)
    assert(none.count() === 0)
  }

  test("as-of join with empty right side preserves left rows with nulls") {
    val left = Seq((1L, "A", 10L, 1.0)).toDF("id", "k", "t", "px")
    val right = Seq.empty[(String, Long, Double)].toDF("k", "t", "bid")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("bid")).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Any]("asof_bid") === null)
  }

  test("validation of fully-null rows flags every reason, crashes never") {
    val df = Seq.empty[(java.lang.Long, String, java.lang.Double, java.lang.Long)]
      .toDF("event_id", "symbol", "price", "volume")
      .withColumn("event_time", lit(null).cast("timestamp"))
    assert(Validation.validate(df, 0L).count() === 0)
  }

  test("textRank with no qualifying pairs returns an empty frame with the right schema") {
    val docs = Seq((0L, "a b"), (1L, "c d")).toDF("doc_id", "text")
    val r = graft.operators.Retrieval.textRank(docs, minPairCount = 25, iters = 3)
    assert(r.columns.toSeq === Seq("term", "pr_e12"))
    assert(r.count() === 0)
  }

  test("encodeStats with an empty merge list degenerates to character counts") {
    val docs = Seq((0L, "ab abc", "s")).toDF("doc_id", "text", "source")
    val r = graft.operators.Bpe.encodeStats(docs, Seq.empty).collect().head
    assert(r.getAs[Long]("n_bpe_tokens") === r.getAs[Long]("n_chars"))
    assert(r.getAs[Long]("compression_e6") === 1000000L)
  }

  test("jaccardEstQuality on an all-too-short corpus yields zero buckets, crashes never") {
    val docs = Seq((0L, "one"), (1L, "two")).toDF("doc_id", "text")
    assert(graft.operators.Dedup.jaccardEstQuality(docs, shingleN = 2).count() === 0)
  }

  test("markov transitions on single-event users yield an empty matrix") {
    import graft.streaming.FunnelStream.UserEvent
    val one = Seq(UserEvent(1L, "view", 5L)).toDS()
    // Batch derivation on the same shape: lead over one row is null.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"))
    val batch = one.toDF()
      .withColumn("nx", lead(col("event_type"), 1).over(w))
      .filter(col("nx").isNotNull)
    assert(batch.count() === 0)
  }

  test("every query's output schema passes the comparer type whitelist") {
    // Build-time form of the Verify lint: the correctness comparer
    // reads Spark parquet natively and the oracle via DuckDB->pandas,
    // and only {string,int,long,double,boolean,date} canonicalize
    // identically on both paths. DECIMAL survived two rounds of local
    // green / driver red (r4 1-ulp, r5 float64 collapse) before this
    // became a hard rule.
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) => Verify.lintSchema(name, fn(spark, Sf))
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }
}
