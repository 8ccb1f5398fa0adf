package graft

import java.time.{Instant, ZonedDateTime}

import org.apache.spark.sql.functions._

import graft.operators.MarketHours

/** Mirrors the reference's market-hours semantics
  * (src/utils/time_utils.py): ET session bounds inclusive, weekend
  * and holiday closure, extended hours, next-open arithmetic — plus
  * agreement between the driver-side and Column forms across DST.
  */
class MarketHoursSpec extends SparkSpecBase {
  import spark.implicits._

  private def etz(s: String) =
    ZonedDateTime.of(java.time.LocalDateTime.parse(s), MarketHours.Zone)

  test("regular hours: 9:30-16:00 ET inclusive on trading days") {
    assert(MarketHours.isRegularHours(etz("2024-01-16T09:30:00")))  // open edge
    assert(MarketHours.isRegularHours(etz("2024-01-16T16:00:00")))  // close edge inclusive
    assert(!MarketHours.isRegularHours(etz("2024-01-16T09:29:59")))
    assert(!MarketHours.isRegularHours(etz("2024-01-16T16:00:01")))
    assert(MarketHours.isRegularHours(etz("2024-01-16T12:00:00")))
  }

  test("weekends and holidays close the market") {
    assert(!MarketHours.isRegularHours(etz("2024-01-13T12:00:00"))) // Saturday
    assert(!MarketHours.isRegularHours(etz("2024-01-14T12:00:00"))) // Sunday
    assert(!MarketHours.isRegularHours(etz("2024-01-15T12:00:00"))) // MLK Day
    assert(!MarketHours.isRegularHours(etz("2024-12-25T12:00:00"))) // Christmas
    assert(!MarketHours.isExtendedHours(etz("2024-01-15T05:00:00"))) // holiday pre-market
  }

  test("extended hours: pre-market [4:00, 9:30) and after-hours (16:00, 20:00]") {
    assert(MarketHours.isExtendedHours(etz("2024-01-16T04:00:00")))
    assert(!MarketHours.isExtendedHours(etz("2024-01-16T03:59:59")))
    assert(MarketHours.isExtendedHours(etz("2024-01-16T09:29:59")))
    assert(!MarketHours.isExtendedHours(etz("2024-01-16T09:30:00"))) // that's regular
    assert(MarketHours.isExtendedHours(etz("2024-01-16T16:00:01")))
    assert(MarketHours.isExtendedHours(etz("2024-01-16T20:00:00")))
    assert(!MarketHours.isExtendedHours(etz("2024-01-16T20:00:01")))
    assert(MarketHours.isMarketOpen(etz("2024-01-16T05:00:00"), includeExtended = true))
    assert(!MarketHours.isMarketOpen(etz("2024-01-16T05:00:00")))
  }

  test("next open skips weekends and holidays; secondsUntilOpen is 0 while open") {
    // Friday 2024-01-12 after close -> Monday is MLK -> Tuesday 01-16 09:30.
    val nextOpen = MarketHours.nextMarketOpen(etz("2024-01-12T17:00:00"))
    assert(nextOpen === etz("2024-01-16T09:30:00"))
    // Before open on a trading day -> same day.
    assert(MarketHours.nextMarketOpen(etz("2024-01-16T08:00:00")) === etz("2024-01-16T09:30:00"))
    assert(MarketHours.secondsUntilOpen(etz("2024-01-16T12:00:00")) === 0L)
    assert(MarketHours.secondsUntilOpen(etz("2024-01-16T09:00:00")) === 1800L)
  }

  test("Column form agrees with the driver form across a DST transition week") {
    // Hourly sweep over 2024-03-08..2024-03-15 (US DST starts Mar 10)
    // plus the MLK week — UTC instants, both forms must agree.
    val starts = Seq("2024-03-08T00:00:00Z", "2024-01-12T00:00:00Z")
    val instants = starts.flatMap { s0 =>
      val base = Instant.parse(s0)
      (0 until 7 * 24).map(h => base.plusSeconds(h * 3600L + 1800L))
    }
    val expected = instants.map(i =>
      (i.toEpochMilli,
        MarketHours.isRegularHours(i.atZone(MarketHours.Zone)),
        MarketHours.isExtendedHours(i.atZone(MarketHours.Zone))))
    val df = instants.map(_.toEpochMilli).toDF("ms")
      .withColumn("ts", timestamp_millis(col("ms")))
      .select(col("ms"),
        MarketHours.isRegularHoursCol(col("ts")).as("reg"),
        MarketHours.isExtendedHoursCol(col("ts")).as("ext"))
    val got = df.collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(got.sortBy(_._1).toSeq === expected.sortBy(_._1))
  }

  test("Column forms are session-timezone independent (non-UTC cluster)") {
    // 15:00 UTC on a trading Tuesday = 10:00 ET -> regular hours. A
    // session zone of America/Chicago must not change the verdict
    // (hour()-based logic would classify it as 04:00 pre-market).
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/Chicago")
      val df = Seq(
        ("2024-01-16T15:00:00Z", true, false),  // 10:00 ET regular
        ("2024-01-16T13:00:00Z", false, true),  // 08:00 ET pre-market
        ("2024-01-15T15:00:00Z", false, false), // MLK holiday
        ("2024-03-11T13:35:00Z", true, false))  // post-DST: 09:35 EDT regular
        .toDF("iso", "expReg", "expExt")
        .withColumn("ts", to_timestamp(col("iso")))
        .select(col("iso"), col("expReg"), col("expExt"),
          MarketHours.isRegularHoursCol(col("ts")).as("reg"),
          MarketHours.isExtendedHoursCol(col("ts")).as("ext"))
      df.collect().foreach { r =>
        assert(r.getAs[Boolean]("reg") === r.getAs[Boolean]("expReg"), r.getString(0))
        assert(r.getAs[Boolean]("ext") === r.getAs[Boolean]("expExt"), r.getString(0))
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("filterMarketHours gates rows at scan time") {
    val df = Seq(
      ("in", "2024-01-16T15:00:00Z"),   // 10:00 ET Tuesday
      ("pre", "2024-01-16T13:00:00Z"),  // 08:00 ET
      ("out", "2024-01-13T15:00:00Z"))  // Saturday
      .toDF("tag", "iso")
      .withColumn("ts", to_timestamp(col("iso")))
    assert(MarketHours.filterMarketHours(df, "ts").select("tag").as[String].collect().toSet
      === Set("in"))
    assert(MarketHours.filterMarketHours(df, "ts", includeExtended = true)
      .select("tag").as[String].collect().toSet === Set("in", "pre"))
  }
}
