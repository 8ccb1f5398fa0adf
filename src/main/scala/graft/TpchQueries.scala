package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** General analytical queries over the TPC-H-ish star schema
  * (TESTDATA.md) — the engine's scan-heavy-aggregation and join
  * benchmark headliners. The reference has no joins (SURVEY.md §2.8);
  * these prove the engine handles them Spark-first at scale:
  * broadcast for dimension tables, exact DECIMAL sums so a
  * 1000-executor plan reproduces the laptop answer bit-for-bit.
  */
object TpchQueries {

  private def dec(c: String) = col(c).cast("decimal(18,2)")

  /** TPC-H Q1 shape: pricing summary. One pass over lineitem, filter
    * pushed to the parquet scan, hash aggregation on a 6-group key
    * (partial agg map-side, so shuffle traffic is O(groups), not
    * O(rows)).
    */
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast("double").as("sum_disc_price"),
        sum(dec("l_extendedprice") * (lit(1) - dec("l_discount")) * (lit(1) + dec("l_tax")))
          .cast("double").as("sum_charge"),
        round(sum(dec("l_quantity")).cast("double") / count(lit(1)), 6).as("avg_qty"),
        round(sum(dec("l_extendedprice")).cast("double") / count(lit(1)), 6).as("avg_price"),
        round(sum(dec("l_discount")).cast("double") / count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val pricingSummarySql: String = """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus"""

  /** TPC-H Q3 shape: shipping priority. lineitem |><| orders is the
    * big shuffle join (both sides hash-partitioned on orderkey);
    * customer is a filtered dimension — broadcast it so the orders
    * probe never shuffles on custkey. Top-10 via TakeOrderedAndProject
    * (no global sort).
    */
  def shippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-03-15").cast("timestamp")
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < cut)
    val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > cut)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast("double").as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        // o_orderdate is parquet TIMESTAMP_NTZ; unix_millis needs LTZ
        // (equivalent under the UTC session timezone).
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_orderdate_ms"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val shippingPrioritySql: String = """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           epoch_ms(o_orderdate) AS o_orderdate_ms, o_orderpriority
    FROM lineitem, orders, customer
    WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      AND c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10"""
}
