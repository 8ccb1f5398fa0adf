package graft

import org.apache.spark.sql.functions._

import graft.functions.{ArrayFunctions, OrderedExtremum, PolyHashFunctions}

class FunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("PolyHash matches the portable recurrence incl. non-ASCII codepoints") {
    // Expected values cross-computed with DuckDB's
    // list_reduce(ord(substr)) formulation.
    val heLLo = "h" + new String(Character.toChars(0xE9)) + "llo"
    val nihao = new String(Character.toChars(0x4F60)) + new String(Character.toChars(0x597D))
    val emoji = "a" + new String(Character.toChars(0x1F600)) + "b" // astral: surrogate pair
    val out = Seq(("ascii", "hello"), ("latin", heLLo), ("cjk", nihao), ("astral", emoji))
      .toDF("k", "s")
      .select(col("k"), PolyHashFunctions.polyHash(col("s"), 31L, 1000000007L).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("ascii" -> 99162322L, "latin" -> 103094734L,
      "cjk" -> 652829L, "astral" -> 4077187L))
  }

  test("minByOrd2 is order-independent even with null values at the winning key") {
    val rows = Seq(
      (1L, "g", 5L, java.lang.Double.valueOf(7.0)),
      (2L, "g", 1L, null.asInstanceOf[java.lang.Double]), // winning ord carries a null value
      (3L, "g", 3L, java.lang.Double.valueOf(9.0)))
    def run(order: Seq[(Long, String, Long, java.lang.Double)]) =
      order.toDF("id", "k", "ord", "v").repartition(3)
        .groupBy(col("k"))
        .agg(OrderedExtremum.minByOrd2(col("v"), col("ord"), col("id")).as("m"))
        .collect().head.getAs[java.lang.Double]("m")
    // The winning (smallest-ord) row's value is null — the answer must
    // be null regardless of encounter order (the old IsNull-marker
    // buffer returned 7.0 or 9.0 depending on row order).
    assert(run(rows) == null)
    assert(run(rows.reverse) == null)
    assert(run(rows.sortBy(_._3)) == null)
  }

  test("secondMaxByOrd2: second-largest value, partition- and order-independent") {
    // 5 rows, unique (ord, id) keys — the a6 regime (dedup key unique).
    val rows = Seq(
      (1L, "g", 10L, 1.5), (2L, "g", 40L, 4.5), (3L, "g", 30L, 3.5),
      (4L, "g", 20L, 2.5), (5L, "g", 50L, 5.5))
    def run(order: Seq[(Long, String, Long, Double)], parts: Int) =
      order.toDF("id", "k", "ord", "v").repartition(parts)
        .groupBy(col("k"))
        .agg(OrderedExtremum.secondMaxByOrd2(col("v"), col("ord"), col("id")).as("m"))
        .collect().head.getAs[java.lang.Double]("m")
    // Second-largest ord is 40 -> 4.5, under every encounter order and
    // partitioning (exercises both updateExpressions and the top-2
    // mergeExpressions across partial buffers).
    for (parts <- Seq(1, 3, 5); o <- Seq(rows, rows.reverse, rows.sortBy(_._3)))
      assert(run(o, parts) === 4.5, s"parts=$parts order=${o.map(_._1)}")
  }

  test("secondMaxByOrd2: <2 rows yields null; tie-break on ord2; null ords ignored") {
    import org.apache.spark.sql.Row
    val df = Seq(
      // group a: single row -> null
      (1L, "a", 10L, 1.0),
      // group b: primary tie at ord=10, ids 2<3: top is id 3, second is id 2
      (2L, "b", 10L, 2.0), (3L, "b", 10L, 3.0))
      .toDF("id", "k", "ord", "v")
    val m = df.groupBy(col("k"))
      .agg(OrderedExtremum.secondMaxByOrd2(col("v"), col("ord"), col("id")).as("m"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(m === Map("a" -> None, "b" -> Some(2.0)))
    // A null ordering key never participates (matches the window form,
    // where the a6 caller's key is non-null by construction).
    val withNull = Seq(
      Row(1L, "c", java.lang.Long.valueOf(5L), 1.0),
      Row(2L, "c", null.asInstanceOf[java.lang.Long], 9.0),
      Row(3L, "c", java.lang.Long.valueOf(7L), 2.0))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType, false),
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType, false),
      org.apache.spark.sql.types.StructField("ord", org.apache.spark.sql.types.LongType, true),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType, false)))
    val out = spark.createDataFrame(
        spark.sparkContext.parallelize(withNull, 3), schema)
      .groupBy(col("k"))
      .agg(OrderedExtremum.secondMaxByOrd2(col("v"), col("ord"), col("id")).as("m"))
      .collect().head.getDouble(1)
    assert(out === 1.0) // second among {5->1.0, 7->2.0}; the null-ord 9.0 row is invisible
  }

  test("secondMaxByOrd2 equals lead(v,1) at the top row when keys are unique (a6 equivalence)") {
    import org.apache.spark.sql.expressions.Window
    val rows = (1L to 23L).map(i => (i, s"s${i % 4}", i * 7L % 101L, i * 1.25))
    val df = rows.toDF("id", "k", "ord", "v").repartition(4)
    val agg = df.groupBy(col("k"))
      .agg(OrderedExtremum.secondMaxByOrd2(col("v"), col("ord"), col("id")).as("m"))
    val w = Window.partitionBy(col("k")).orderBy(col("ord").desc, col("id").desc)
    val win = df.withColumn("rn", row_number().over(w))
      .withColumn("m", lead(col("v"), 1).over(w))
      .filter(col("rn") === 1).select(col("k"), col("m"))
    val a = agg.collect().map(r => r.getString(0) -> r.getAs[java.lang.Double]("m")).toMap
    val b = win.collect().map(r => r.getString(0) -> r.getAs[java.lang.Double]("m")).toMap
    assert(a === b)
  }

  test("sortedIntersectSize counts duplicate runs once (set semantics)") {
    val out = Seq((Seq(1L, 1L, 2L, 2L, 3L), Seq(1L, 2L, 2L, 9L)))
      .toDF("a", "b")
      .select(ArrayFunctions.sortedIntersectSize(col("a"), col("b")).as("n"))
      .collect().head.getAs[Long]("n")
    assert(out === 2L) // {1,2} — not 4
  }

  test("countInSet: duplicates count per occurrence, null elements skip, null array is null") {
    val words = Seq("the", "a")
    val df = Seq(
      (0L, Seq("the", "the", "a", "dog", null)),
      (1L, Seq("dog", "cat")),
      (2L, null)).toDF("id", "toks")
      .select(col("id"), ArrayFunctions.countInSet(col("toks"), words).as("n"))
    val m = df.collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(m(0L) === Some(3L)) // "the" twice + "a" once; null element skipped
    assert(m(1L) === Some(0L))
    assert(m(2L) === None)
    // Parity with the interpreted HOF form it replaces.
    val hof = Seq((0L, Seq("the", "the", "a", "dog")))
      .toDF("id", "toks")
      .select(size(filter(col("toks"), t => t.isin(words: _*))).cast("long").as("n"))
      .collect().head.getLong(0)
    assert(hof === 3L)
  }
}
