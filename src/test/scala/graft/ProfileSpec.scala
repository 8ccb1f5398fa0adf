package graft

import org.apache.spark.sql.functions._

import graft.operators.Profile

class ProfileSpec extends SparkSpecBase {
  import spark.implicits._

  test("profile counts rows, nulls, distincts and normalizes extrema") {
    val df = Seq(
      (1L, Some("aa"), Some(1.25)),
      (2L, None, Some(-3.5)),
      (3L, Some("bb"), None),
      (4L, Some("aa"), Some(1.25))
    ).toDF("id", "s", "v")
    val out = Profile.profile(df, "t").collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(out.size === 3)
    val id = out("id")
    assert(id.getAs[Long]("n_rows") === 4L)
    assert(id.getAs[Long]("n_nonnull") === 4L)
    assert(id.getAs[Long]("n_distinct") === 4L)
    assert(id.getAs[Long]("min_num") === 1L)
    assert(id.getAs[Long]("max_num") === 4L)
    assert(id.isNullAt(id.fieldIndex("min_str")))
    val s = out("s")
    assert(s.getAs[Long]("n_nonnull") === 3L)
    assert(s.getAs[Long]("n_distinct") === 2L) // md5-distinct = value-distinct
    assert(s.getAs[String]("min_str") === "aa")
    assert(s.getAs[String]("max_str") === "bb")
    assert(s.isNullAt(s.fieldIndex("min_num")))
    val v = out("v")
    assert(v.getAs[Long]("n_nonnull") === 3L)
    assert(v.getAs[Long]("n_distinct") === 2L)
    assert(v.getAs[Long]("min_num") === -3500000L) // floor(-3.5e6)
    assert(v.getAs[Long]("max_num") === 1250000L)
  }

  test("string extremum truncates AFTER the full-string min") {
    // "a" + 100×"z" < "b…" lexicographically; the 64-char cut must not
    // change which string wins.
    val df = Seq(("a" + "z" * 100), ("b" + "a" * 100)).toDF("s")
    val r = Profile.profile(df, "t").collect().head
    assert(r.getAs[String]("min_str") === ("a" + "z" * 63))
    assert(r.getAs[String]("max_str") === ("b" + "a" * 63))
  }

  test("unsupported (nested) columns are skipped, not crashed on") {
    val df = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "emb")
    val cols = Profile.profile(df, "t").collect().map(_.getAs[String]("col_name"))
    assert(cols.toSeq === Seq("id"))
  }

  test("profile is ONE pass: a single scan of the table, distincts via Expand") {
    val df = SparkEntry.queries("x35_profile")(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    // One FileScan per profiled table (documents, events) — the
    // whole census must not re-scan per column.
    val scans = plan.split('\n').count(_.contains("Scan parquet"))
    assert(scans === 2, s"expected 2 scans (one per table), got $scans:\n$plan")
    assert(plan.contains("Expand"), "multi-column exact distincts should plan one Expand pass")
  }
}
