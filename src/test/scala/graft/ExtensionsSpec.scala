package graft

class ExtensionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("custom expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql("""
      SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
                        array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
             sorted_intersect_size(array(1L, 2L, 3L), array(2L, 3L, 9L)) AS i,
             morton(3L, 5L) AS z
    """).collect().head
    assert(math.abs(r.getAs[Double]("c") - 1.0) < 1e-12)
    assert(r.getAs[Long]("i") === 2L)
    // x=3 spreads to even bits (0b000101=5), y=5 to odd bits
    // (0b100010=34); 5|34 = 39
    assert(r.getAs[Long]("z") === 39L)
  }

  test("text-pipeline expressions are callable from SQL: poly_hash, shingle_hashes, minhash_sig") {
    GraftExtensions.register(spark)
    val r = spark.sql("""
      SELECT poly_hash('ab', 31L, 1000000007L) AS h,
             shingle_hashes(array(7L, 8L, 9L), 2) AS sh,
             minhash_sig(array(42L), 4) AS sig
    """).collect().head
    // h = ('a'=97)*31 + ('b'=98) = 3105
    assert(r.getAs[Long]("h") === 3105L)
    // two distinct sorted 2-gram hashes from 3 token hashes
    val sh = r.getSeq[Long](1)
    assert(sh.length === 2 && sh === sh.sorted)
    assert(r.getSeq[Long](2).length === 4)
    // non-literal mult must be rejected at plan time
    val err = intercept[Exception] {
      spark.sql("SELECT poly_hash('x', id, 7L) FROM range(1)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("literal"))
  }

  test("aggregate expressions work in SQL GROUP BY") {
    GraftExtensions.register(spark)
    Seq((1L, "A", 10.0, 100L), (2L, "A", 20.0, 50L))
      .toDF("id", "sym", "px", "ts").createOrReplaceTempView("tx")
    val r = spark.sql("""
      SELECT sym, min_by_ord2(px, ts, id) AS first_px,
             max_by_ord2(px, ts, id) AS last_px
      FROM tx GROUP BY sym
    """).collect().head
    assert(r.getAs[Double]("first_px") === 20.0) // ts=50 is earliest
    assert(r.getAs[Double]("last_px") === 10.0)
  }

  test("sign_lsh_keys returns one bucket key per table and rejects non-literal params") {
    GraftExtensions.register(spark)
    val r = spark.sql("""
      SELECT sign_lsh_keys(array(CAST(0.5 AS FLOAT), CAST(-0.25 AS FLOAT)), 6, 8, 2) AS ks
    """).collect().head
    val ks = r.getSeq[Long](0)
    assert(ks.length === 8)
    assert(ks.forall(k => k >= 0 && k < 64))
    intercept[Exception] {
      spark.sql("SELECT sign_lsh_keys(array(CAST(1.0 AS FLOAT)), 1+5, 8, 2)").collect()
    }
  }

  test("optimizer rule rewrites size(array_intersect(sorted, sorted)) to the native walk") {
    GraftExtensions.register(spark)
    val df = Seq(
      (Seq(3L, 1L, 2L, 2L), Seq(2L, 3L, 9L, 3L)),
      (Seq(1L), Seq(2L))).toDF("a", "b")
      .repartition(2) // keep the plan non-foldable (no LocalRelation collapse)
      .selectExpr("size(array_intersect(array_sort(a), array_sort(b))) AS n")
    assert(df.queryExecution.optimizedPlan.toString.contains("sorted_intersect_size"),
      df.queryExecution.optimizedPlan.toString)
    // Set semantics preserved, duplicates counted once; INT schema
    // kept. (Order-insensitive: repartition scrambles row order.)
    assert(df.collect().map(_.getInt(0)).toSet === Set(2, 0))
  }

  test("pq_codes / pq_reconstruct are callable from SQL with a literal codebook") {
    GraftExtensions.register(spark)
    // m=2 subspaces, kCode=2, dsub=1. [0.9, 0.1] picks codeword 0 in
    // both subspaces -> reconstruction [1.0, 0.0].
    val books = "array(array(array(1.0D), array(0.0D)), array(array(0.0D), array(1.0D)))"
    val r = spark.sql(s"""
      SELECT pq_codes(array(0.9D, 0.1D), $books) AS codes,
             pq_reconstruct(pq_codes(array(0.9D, 0.1D), $books), $books) AS rv
    """).collect().head
    assert(r.getSeq[Int](0) === Seq(0, 0))
    assert(r.getSeq[Double](1) === Seq(1.0, 0.0))
    // Non-foldable codebook must be rejected at plan time.
    val err = intercept[Exception] {
      spark.sql(
        "SELECT pq_codes(array(0.5D), array(array(array(CAST(id AS DOUBLE))))) FROM range(1)"
      ).collect()
    }
    assert(err.getMessage.toLowerCase.contains("foldable") ||
      err.getMessage.toLowerCase.contains("literal"))
  }

  test("a NULL inside a SQL codebook literal fails loudly, not as 0.0") {
    GraftExtensions.register(spark)
    val err = intercept[Exception] {
      spark.sql(
        "SELECT pq_codes(array(0.5D), array(array(array(1.0D, CAST(NULL AS DOUBLE)))))"
      ).collect()
    }
    assert(err.getMessage.toLowerCase.contains("null"), err.getMessage)
  }

  test("count_in_set is callable from SQL; non-foldable or null word sets fail loudly") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT count_in_set(array('the', 'a', 'dog', 'the'), array('the', 'a')) AS n"
    ).collect().head
    assert(r.getAs[Long]("n") === 3L)
    val nonLit = intercept[Exception] {
      spark.sql(
        "SELECT count_in_set(array('x'), array(CAST(id AS STRING))) FROM range(1)"
      ).collect()
    }
    assert(nonLit.getMessage.toLowerCase.contains("foldable"), nonLit.getMessage)
    val nullWord = intercept[Exception] {
      spark.sql(
        "SELECT count_in_set(array('x'), array('x', CAST(NULL AS STRING)))"
      ).collect()
    }
    assert(nullWord.getMessage.toLowerCase.contains("null"), nullWord.getMessage)
  }
}
