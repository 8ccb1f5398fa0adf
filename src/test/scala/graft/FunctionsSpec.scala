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
