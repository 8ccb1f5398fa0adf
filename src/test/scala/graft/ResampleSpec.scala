package graft

import org.apache.spark.sql.functions._

import graft.operators.{Incremental, Resample}

class ResampleSpec extends SparkSpecBase {
  import spark.implicits._

  test("gapFillForward fills gaps per key over each key's own span") {
    // A: hours 0,3 observed (gap at 1,2); B: single observation — the
    // spans must not bleed into each other.
    val obs = Seq(
      ("A", 0L, 10.0), ("A", 3 * 3600000L, 13.0),
      ("B", 2 * 3600000L, 50.0))
      .toDF("k", "ts_ms", "v")
    val out = Resample.gapFillForward(obs, "k", "ts_ms", "v", 3600000L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1) / 3600000L,
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        r.getDouble(3), r.getBoolean(4)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      ("A", 0L, Some(10.0), 10.0, false),
      ("A", 1L, None, 10.0, true),
      ("A", 2L, None, 10.0, true),
      ("A", 3L, Some(13.0), 13.0, false),
      ("B", 2L, Some(50.0), 50.0, false)))
  }

  test("gapFillForward rejects off-grid observations instead of dropping them") {
    val obs = Seq(("A", 1234L, 1.0)).toDF("k", "ts_ms", "v")
    intercept[Exception] {
      Resample.gapFillForward(obs, "k", "ts_ms", "v", 3600000L).collect()
    }
  }

  test("pitJoin picks the interval containing the as-of date; pre-history facts get nulls") {
    val dim = Seq(
      ("A", 5.0, 1, "2024-01-02", Some("2024-01-04"), false),
      ("A", 6.0, 2, "2024-01-05", None, true))
      .toDF("sym", "close", "version", "from_s", "to_s", "is_current")
      .select(col("sym"), col("close"), col("version"),
        col("from_s").cast("date").as("effective_from"),
        col("to_s").cast("date").as("effective_to"), col("is_current"))
    val facts = Seq(
      (1L, "A", "2024-01-01"), // before history -> nulls
      (2L, "A", "2024-01-03"), // inside v1
      (3L, "A", "2024-01-04"), // v1's last day (inclusive bound)
      (4L, "A", "2024-01-09"), // open-ended v2
      (5L, "B", "2024-01-03")) // unknown key -> nulls
      .toDF("id", "sym", "d").select(col("id"), col("sym"), col("d").cast("date").as("d"))
    val out = Incremental.pitJoin(facts, dim, "sym", "d", Seq("close", "version"))
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Double])))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, None), (2L, Some(5.0)), (3L, Some(5.0)), (4L, Some(6.0)), (5L, None)))
    // Disjoint intervals: the left join must not fan out.
    assert(Incremental.pitJoin(facts, dim, "sym", "d", Seq("close")).count() == 5)
  }
}
