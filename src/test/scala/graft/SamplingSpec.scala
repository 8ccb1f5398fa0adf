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
}
