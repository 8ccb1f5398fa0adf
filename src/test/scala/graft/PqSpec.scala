package graft

import org.apache.spark.sql.functions._

import graft.operators.Pq
import graft.sources.Tables

/** Pins the native codegen'd PQ codec (PqCodes / PqReconstruct) to the
  * fold-based higher-order-function reference form it replaced — same
  * codes and same reconstruction, element for element, on the real
  * embeddings table and on degenerate inputs.
  */
class PqSpec extends SparkSpecBase {
  import spark.implicits._

  private def books() = {
    val e = Tables.embeddings(spark, Sf)
    Pq.codebooks(e, m = 8, kCode = 16)
  }

  test("native PqCodes === fold encode on the full embeddings table") {
    val bk = books()
    val e = Tables.embeddings(spark, Sf)
    val both = e.select(
      col("vec_id"),
      Pq.encodeExpr(col("embedding"), bk).as("native"),
      Pq.encodeExprFold(col("embedding"), bk).as("fold"))
    assert(both.filter(not(col("native") <=> col("fold"))).count() === 0)
    assert(both.count() > 0)
  }

  test("native PqReconstruct === fold reconstruct on real codes") {
    val bk = books()
    val e = Tables.embeddings(spark, Sf)
    val both = e
      .select(col("vec_id"), Pq.encodeExpr(col("embedding"), bk).as("codes"))
      .select(
        col("vec_id"),
        Pq.reconstructExpr(col("codes"), bk).as("native"),
        Pq.reconstructExprFold(col("codes"), bk).as("fold"))
    assert(both.filter(not(col("native") <=> col("fold"))).count() === 0)
  }

  test("degenerate vectors: short window and null element both yield code 0, like the fold form") {
    val bk = books()
    val dsub = bk.head.head.length
    val full = bk.length * dsub
    // Row 1: too short (one full subspace missing); row 2: a null in
    // the last subspace; row 3: exact length (control).
    val ok: Seq[Option[Double]] = Seq.fill(full)(Some(0.5))
    val short = ok.take(full - dsub)
    val withNull = ok.updated(full - 1, None)
    val df = Seq((1L, short), (2L, withNull), (3L, ok)).toDF("id", "v")
    val both = df.select(
      col("id"),
      Pq.encodeExpr(col("v"), bk).as("native"),
      Pq.encodeExprFold(col("v"), bk).as("fold"))
    val rows = both.collect().map(r =>
      r.getAs[Long]("id") -> (r.getSeq[Int](1), r.getSeq[Int](2))).toMap
    rows.foreach { case (id, (n, f)) => assert(n == f, s"row $id: native $n != fold $f") }
    // The affected trailing subspace must be code 0 on rows 1 and 2.
    assert(rows(1L)._1.last === 0)
    assert(rows(2L)._1.last === 0)
  }

  test("null vector encodes to all-zero codes in both codec forms (constant outer sequence)") {
    val bk = books()
    val df = Seq((1L, Option.empty[Seq[Double]]), (2L, Option(Seq.fill(bk.length * bk.head.head.length)(0.25))))
      .toDF("id", "v")
    val rows = df.select(
        col("id"),
        Pq.encodeExpr(col("v"), bk).as("native"),
        Pq.encodeExprFold(col("v"), bk).as("fold"))
      .collect().map(x => x.getAs[Long]("id") -> ((x.getSeq[Int](1), x.getSeq[Int](2)))).toMap
    assert(rows(1L)._1 == Seq.fill(bk.length)(0))
    assert(rows(1L)._1 == rows(1L)._2)
    assert(rows(2L)._1 == rows(2L)._2)
  }
}
