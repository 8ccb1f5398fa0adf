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

  /** TPC-H Q5 shape: local-supplier revenue by nation within one
    * region and year. Six-table join: lineitem |><| orders is the one
    * big shuffle; supplier/customer co-join on nationkey; nation and
    * region are broadcast dimensions. Exercises every table in the
    * star except part/documents/embeddings.
    */
  def regionRevenue(s: SparkSession, dir: String): DataFrame = {
    val from = lit("1997-01-01").cast("timestamp")
    val to = lit("1998-01-01").cast("timestamp")
    // Uncorrelated scalar "first region alphabetically" stays IN-PLAN
    // (broadcast join against the 1-row min aggregate) — no driver
    // collect, same shape as the oracle's scalar subquery.
    val region = Tables.region(s, dir).join(
      broadcast(Tables.region(s, dir).agg(min(col("r_name")).as("__min_r"))),
      col("r_name") === col("__min_r")).drop("__min_r")
    val nation = Tables.nation(s, dir)
    val cust = Tables.customer(s, dir)
    val ord = Tables.orders(s, dir).filter(col("o_orderdate") >= from && col("o_orderdate") < to)
    val li = Tables.lineitem(s, dir)
    val sup = Tables.supplier(s, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))
  }

  /** TPC-H Q14 shape: promotion revenue share. part |><| lineitem on
    * partkey — part is the build side; at real scale AQE picks
    * broadcast vs shuffle from runtime stats. The ratio is exact:
    * both numerator and denominator are DECIMAL sums, divided once.
    */
  def promoRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-06-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
    val p = Tables.part(s, dir)
    li.join(p, col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type").startsWith("PROMO"),
          dec("l_extendedprice") * (lit(1) - dec("l_discount"))).otherwise(lit(0).cast("decimal(18,2)")))
          .cast("double").as("promo_revenue"),
        sum(dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast("double").as("total_revenue"),
        count(lit(1)).as("n_lineitems"))
      .withColumn("promo_share_e6",
        when(col("total_revenue") > 0,
          floor(col("promo_revenue") / col("total_revenue") * 1000000).cast("long")))
  }

  val promoRevenueSql: String = """
    SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue,
           COUNT(*) AS n_lineitems,
           CASE WHEN SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) > 0 THEN
             CAST(FLOOR(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                  * 1000000) AS BIGINT) END AS promo_share_e6
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'"""

  /** TPC-H Q10 shape: returned-item customer ranking. The one big
    * shuffle is lineitem |><| orders on orderkey (the returnflag and
    * quarter filters push to both scans first); customer joins on the
    * already-aggregated per-customer frame would be ideal but the
    * rank needs name/acctbal/nation, so customer rides the shuffle
    * join and nation broadcasts. Top-20 via TakeOrderedAndProject —
    * no global sort. Revenue is the exact DECIMAL sum cast once.
    */
  def returnedItems(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1997-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val returnedItemsSql: String = """
    SELECT c_custkey, c_name, c_acctbal, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem, orders, customer, nation
    WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      AND c_nationkey = n_nationkey
      AND l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20"""

  /** TPC-H Q12 shape re-expressed over this schema (no
    * commit/receipt dates or shipmode in the synthetic lineitem):
    * conditional priority counts over the orders |><| lineitem join,
    * bucketed by shipping lateness (shipped more than 90 days after
    * the order date) instead of by shipmode. Same plan skeleton as
    * Q12 — one big equi-join, map-side CASE counts, a two-row result
    * — and everything is exact integer date/count arithmetic.
    */
  def lateShipments(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    val o = Tables.orders(s, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_days",
        datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date")))
      .withColumn("bucket",
        when(col("delay_days") > 90, lit("LATE")).otherwise(lit("ONTIME")))
      .groupBy(col("bucket"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority") =!= "1-URGENT" &&
          col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L)).as("low_line_count"),
        count(lit(1)).as("n_lines"),
        max(col("delay_days")).cast("long").as("max_delay_days"))
  }

  val lateShipmentsSql: String = """
    SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 90
                THEN 'LATE' ELSE 'ONTIME' END AS bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count,
           COUNT(*) AS n_lines,
           CAST(MAX(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS BIGINT) AS max_delay_days
    FROM lineitem, orders
    WHERE l_orderkey = o_orderkey
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1"""

  /** TPC-H Q13 shape: customer order-count distribution — the one
    * common join topology the suite had not yet oracle-checked: a
    * LEFT OUTER join whose filter lives on the join's right side
    * (customers with zero qualifying orders must survive with
    * count 0), followed by a count-of-counts re-aggregation. The
    * synthetic orders table has no o_comment, so the classic
    * NOT LIKE '%special%requests%' predicate becomes its analog
    * here: exclude '1-URGENT' orders before the join.
    *
    * Scale: the outer join shuffles both sides on custkey once; the
    * per-customer COUNT reuses that same hash partitioning (no second
    * shuffle — the aggregate's required distribution is satisfied by
    * the join output), and the count-of-counts aggregate is map-side
    * partial over ~tens of distinct counts, so the final shuffle
    * carries O(distinct counts × partitions) rows. Nothing here
    * broadcasts: at 100 TB both customer and orders are fact-sized,
    * and the plan is the canonical sort-merge outer join.
    */
  def custOrderDistribution(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_custkey"))
    val o = Tables.orders(s, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val custOrderDistributionSql: String = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC"""

  val regionRevenueSql: String = """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem, orders, customer, supplier, nation, region
    WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = (SELECT MIN(r_name) FROM region)
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name"""

  /** TPC-H Q2 shape over this schema (no partsupp table, so lineitem
    * plays the offer list): for each small part, the supplier that
    * sold it cheapest — the per-group-argmin-then-join-back topology
    * Q2's correlated MIN subquery decorrelates into. Exact DECIMAL
    * min, ties broken on the lowest suppkey.
    *
    * Scale: part is filtered then broadcast into the lineitem scan, so
    * the only shuffle key is p_partkey — and the min aggregate, the
    * join-back, and the tie-break aggregate ALL hash on it, letting
    * AQE reuse one exchange. Supplier attributes broadcast at the end
    * onto the part-sized (not lineitem-sized) winner set.
    */
  def minCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).filter(col("p_size") <= 5)
    val offers = Tables.lineitem(s, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("p_size"),
        col("l_suppkey"), dec("l_extendedprice").as("price"))
    val minPrice = offers.groupBy(col("p_partkey"))
      .agg(min(col("price")).as("min_price"))
    offers.join(minPrice, Seq("p_partkey"))
      .filter(col("price") === col("min_price"))
      .groupBy(col("p_partkey"), col("p_name"), col("p_size"), col("min_price"))
      .agg(min(col("l_suppkey")).as("s_suppkey"))
      .join(broadcast(Tables.supplier(s, dir)), Seq("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("p_size"),
        col("min_price").cast("double").as("min_price"),
        col("s_suppkey"), col("s_name"), col("s_acctbal"))
  }

  val minCostSupplierSql: String = """
    WITH offers AS (
      SELECT p.p_partkey, p.p_name, p.p_size, l.l_suppkey,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS price
      FROM lineitem l, part p
      WHERE l.l_partkey = p.p_partkey AND p.p_size <= 5),
    m AS (SELECT p_partkey, MIN(price) AS min_price FROM offers GROUP BY 1),
    best AS (
      SELECT o.p_partkey, o.p_name, o.p_size, m.min_price,
             MIN(o.l_suppkey) AS s_suppkey
      FROM offers o JOIN m ON o.p_partkey = m.p_partkey AND o.price = m.min_price
      GROUP BY 1, 2, 3, 4)
    SELECT b.p_partkey, b.p_name, b.p_size, CAST(b.min_price AS DOUBLE) AS min_price,
           b.s_suppkey, s.s_name, s.s_acctbal
    FROM best b JOIN supplier s ON s.s_suppkey = b.s_suppkey"""

  /** TPC-H Q18 shape: large-volume orders — the semi-join-on-an-
    * aggregate topology (orderkeys whose summed quantity clears a
    * threshold), joined back to orders and customer. Written as a
    * direct join against the filtered aggregate (the standard Q18
    * decorrelation), not a second lineitem re-scan.
    *
    * Scale: the quantity aggregate is map-side partial on l_orderkey;
    * after the > 300 filter the surviving key set is tiny, so AQE
    * plans the orders join as a runtime broadcast — the selective-
    * aggregate-becomes-broadcast pattern. Customer joins on the
    * already-small result.
    */
  def bigOrders(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir).groupBy(col("l_orderkey"))
      .agg(sum(dec("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 300)
    Tables.orders(s, dir).join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_totalprice"), col("sum_qty").cast("double").as("sum_qty"))
  }

  val bigOrdersSql: String = """
    WITH big AS (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
    SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
           o_totalprice, CAST(sum_qty AS DOUBLE) AS sum_qty
    FROM orders JOIN big ON o_orderkey = l_orderkey
         JOIN customer ON o_custkey = c_custkey"""

  /** TPC-H Q4 shape: order-priority checking — the correlated-EXISTS
    * topology, planned as a LEFT SEMI join whose condition references
    * BOTH sides (shipped more than 90 days after the order date; the
    * synthetic lineitem has no commit/receipt dates). The semi join
    * deduplicates multi-lineitem matches for free — no DISTINCT stage.
    */
  def priorityLateOrders(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, dir)
    o.join(l, col("o_orderkey") === col("l_orderkey") &&
        datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date")) > 90,
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  val priorityLateOrdersSql: String = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND date_diff('day', CAST(o.o_orderdate AS DATE),
                                  CAST(l.l_shipdate AS DATE)) > 90)
    GROUP BY o_orderpriority"""

  /** TPC-H Q22 shape: idle rich customers — the scalar-aggregate-
    * subquery-plus-ANTI-join topology: customers whose balance clears
    * the positive-balance average AND who placed no order since 2000,
    * rolled up per nation. The average never becomes a float: the
    * comparison cross-multiplies exact DECIMAL sums
    * (bal·n > Σbal ⇔ bal > Σbal/n), so partition order cannot flip a
    * boundary row; the one-row stats frame joins in-plan (broadcast),
    * the h5 scalar-aggregate posture — no driver collect.
    */
  def idleRichCustomers(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val stats = c.filter(col("c_acctbal") > 0)
      .agg(sum(dec("c_acctbal")).as("s"), count(lit(1)).as("n"))
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    c.crossJoin(broadcast(stats))
      .filter(dec("c_acctbal") * col("n") > col("s"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec("c_acctbal")).cast("double").as("totacctbal"))
  }

  val idleRichCustomersSql: String = """
    WITH stats AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s, COUNT(*) AS n
      FROM customer WHERE c_acctbal > 0)
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c, stats
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * stats.n > stats.s
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_nationkey"""

  /** TPC-H Q6 shape: forecast revenue change — the pure scan-and-
    * reduce query. Every predicate (date range, discount band,
    * quantity cap) pushes into the parquet scan; the aggregate is one
    * exact DECIMAL sum reduced map-side to a single row. At 100 TB
    * this reads only the 4 referenced columns of the pruned row
    * groups and ships ~nothing.
    */
  def forecastRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        dec("l_discount").between(lit("0.05").cast("decimal(18,2)"),
          lit("0.07").cast("decimal(18,2)")) &&
        col("l_quantity") < 24)
      .agg(sum(dec("l_extendedprice") * dec("l_discount")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  val forecastRevenueSql: String = """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN CAST('0.05' AS DECIMAL(18,2))
                                                AND CAST('0.07' AS DECIMAL(18,2))
      AND l_quantity < 24"""

  /** TPC-H Q7 shape: volume shipping between two nations, both
    * directions, by ship year. The big join is lineitem ⋈ orders on
    * orderkey; supplier/customer attach their nations (broadcast
    * dims), and the 2×2 nation-pair filter evaluates map-side before
    * the final O(years·4)-group aggregate.
    */
  def volumeShipping(s: SparkSession, dir: String): DataFrame = {
    val (na, nb) = ("NATION_3", "NATION_2")
    val n1 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === na && col("cust_nation") === nb) ||
        (col("supp_nation") === nb && col("cust_nation") === na))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(dec("l_extendedprice") * (lit(1) - dec("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))
  }

  val volumeShippingSql: String = """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
      AND ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_3'))
    GROUP BY sn.n_name, cn.n_name, year(l_shipdate)"""

  /** TPC-H Q8 shape: national market share — one nation's fraction of
    * a region's yearly revenue for one part type. Both the numerator
    * (conditional sum) and denominator accumulate as exact DECIMALs
    * in ONE aggregate; the share is a single correctly-rounded double
    * division at the end, so the ratio is bit-stable at any
    * parallelism.
    */
  def marketShare(s: SparkSession, dir: String): DataFrame = {
    val asia = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val cnation = Tables.nation(s, dir)
      .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk"))
    val snation = Tables.nation(s, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).filter(col("p_type") === "ECONOMY")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1999-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(cnation), col("c_nationkey") === col("c_nk"))
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(snation), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_2",
          dec("l_extendedprice") * (lit(1) - dec("l_discount")))
          .otherwise(lit(0).cast("decimal(18,2)"))).as("nation_rev"),
        sum(dec("l_extendedprice") * (lit(1) - dec("l_discount"))).as("total_rev"))
      .select(col("o_year"),
        col("nation_rev").cast("double").as("nation_revenue"),
        col("total_rev").cast("double").as("total_revenue"),
        (col("nation_rev").cast("double") / col("total_rev").cast("double"))
          .as("mkt_share"))
  }

  val marketShareSql: String = """
    WITH j AS (
      SELECT year(o_orderdate) AS o_year, sn.n_name AS supp_nation,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS vol
      FROM lineitem
      JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00')
    SELECT CAST(o_year AS INT) AS o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN vol
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_revenue,
           CAST(SUM(vol) AS DOUBLE) AS total_revenue,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN vol
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(vol) AS DOUBLE) AS mkt_share
    FROM j GROUP BY o_year"""

  /** TPC-H Q15 shape: top supplier(s) by quarterly revenue. The
    * per-supplier aggregate is computed ONCE; its maximum is a 1-row
    * in-plan aggregate broadcast back (the h5/h22 scalar posture), so
    * suppliers at the max — ties included, per spec — survive without
    * a second scan of lineitem and without any window.
    */
  def topSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec("l_extendedprice") * (lit(1) - dec("l_discount"))).as("total_rev"))
    val top = rev.agg(max(col("total_rev")).as("__max_rev"))
    rev.crossJoin(broadcast(top))
      .filter(col("total_rev") === col("__max_rev"))
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_revenue"))
  }

  val topSupplierSql: String = """
    WITH rev AS (
      SELECT l_suppkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)"""

  /** TPC-H Q16 shape: supplier diversity per part segment — how many
    * DISTINCT suppliers serve each (brand, type, size) bucket,
    * excluding one brand, a size set, and a "complaints" supplier
    * list (the NOT IN, expressed as a broadcast LEFT ANTI join —
    * negative-acctbal suppliers stand in for the spec's complaint
    * scan). The supplier-part pairs come from lineitem (the synthetic
    * schema has no partsupp); count-distinct is two-phase hash, never
    * a global sort.
    */
  def partSupplierCounts(s: SparkSession, dir: String): DataFrame = {
    val excluded = Tables.supplier(s, dir).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey").as("x_suppkey"))
    val p = Tables.part(s, dir)
      .filter(col("p_brand") =!= "Brand#1" &&
        col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("x_suppkey"), "left_anti")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
  }

  val partSupplierCountsSql: String = """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size"""

  /** TPC-H Q17 shape: small-quantity-order revenue — the correlated
    * per-part average decorrelated into one per-part aggregate joined
    * back on partkey (exchange reuse: both the stats build and the
    * probe hash on l_partkey). The `qty < 0.2·avg(qty)` test is
    * cross-multiplied to `5·qty·cnt < sum_qty` — exact DECIMAL
    * integers, no float average anywhere.
    */
  def smallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir).filter(col("p_brand") === "Brand#1")
    val stats = l.groupBy(col("l_partkey").as("st_partkey"))
      .agg(sum(dec("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt_qty"))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(stats, col("l_partkey") === col("st_partkey"))
      .filter(dec("l_quantity") * lit(5) * col("cnt_qty") < col("sum_qty"))
      .agg(sum(dec("l_extendedprice")).cast("double").as("total_extprice"),
        count(lit(1)).as("n_small"),
        round(sum(dec("l_extendedprice")).cast("double") / 7.0, 6).as("avg_yearly"))
  }

  val smallQtyRevenueSql: String = """
    WITH stats AS (
      SELECT l_partkey AS st_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
             COUNT(*) AS cnt_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_extprice,
           COUNT(*) AS n_small,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6) AS avg_yearly
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#1'
    JOIN stats ON l_partkey = st_partkey
    WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt_qty < sum_qty"""

  /** TPC-H Q19 shape: discounted revenue under a DISJUNCTION of
    * (brand, size-band, quantity-band) branches — the classic
    * OR-of-conjunctions predicate. It lives in the JOIN condition, so
    * Catalyst extracts the common `l_partkey = p_partkey` equi-key
    * (hash join, NOT a nested loop) and evaluates the residual OR
    * per matched row; the part side is a broadcast dimension.
    */
  def brandedRevenue(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    val branch1 = col("p_brand") === "Brand#1" &&
      col("p_size").between(1, 15) && col("l_quantity").between(1, 11)
    val branch2 = col("p_brand") === "Brand#2" &&
      col("p_size").between(1, 25) && col("l_quantity").between(10, 20)
    val branch3 = col("p_brand") === "Brand#3" &&
      col("p_size").between(1, 35) && col("l_quantity").between(20, 30)
    l.join(broadcast(p),
        col("l_partkey") === col("p_partkey") && (branch1 || branch2 || branch3))
      .agg(sum(dec("l_extendedprice") * (lit(1) - dec("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val brandedRevenueSql: String = """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)"""

  /** TPC-H Q20 shape: suppliers with excess shipments of a part
    * family — the nested-semi-join topology. Inner: per (supp, part)
    * shipped quantity of ECONOMY parts in 1997 above a threshold;
    * outer: suppliers SEMI-joined against that set (each supplier
    * emitted once no matter how many qualifying parts), nation
    * attached broadcast.
    */
  /** TPC-H Q21 shape: suppliers who kept orders waiting. The testdata
    * carries no receipt/commit dates, so "late" is l_shipdate more
    * than 60 days after o_orderdate; the famous double correlation is
    * intact — the supplier was late on a finished multi-supplier
    * order (EXISTS another supplier's line) where NO other supplier
    * was late (NOT EXISTS another late line). Both correlations are
    * hash joins on l_orderkey with the supplier-inequality as a join
    * filter (LeftSemi/LeftAnti — never a per-row subquery), the
    * 10-row supplier dimension broadcasts, and the final top-k is
    * TakeOrderedAndProject. At scale the l1/l2/l3 sides co-partition
    * on orderkey, so the whole query is one shuffle family.
    */
  def waitingSuppliers(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val l = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val late = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey"), col("l_suppkey"))
    val others = l.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
    val lateOthers = late.select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
    val waiting = late
      .join(others, col("l_orderkey") === col("o2") && col("l_suppkey") =!= col("s2"), "left_semi")
      .join(lateOthers, col("l_orderkey") === col("o3") && col("l_suppkey") =!= col("s3"), "left_anti")
    waiting
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  val waitingSuppliersSql: String = """
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM late l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10"""

  /** TPC-H Q11 shape: important stock. No partsupp table in the
    * testdata, so "inventory value" is proxied by each part's shipped
    * revenue in lineitem — the topology is the point: a grouped
    * aggregate filtered by HAVING sum > fraction × THE SAME aggregate
    * computed globally. The global total is an in-plan scalar (one
    * row) cross-joined onto the grouped frame — Spark broadcasts it;
    * no second scan, no driver collect, no correlated re-evaluation.
    * Q11's spec threshold is FRACTION = 0.0001/SF — it scales with
    * the data so the result stays selective at every size. Same here,
    * self-derived: keep parts above 1.5× the mean per-part share,
    * written in the exact cross-multiplied integer form
    * part_value × n_parts > total × 1.5 (no division, no rounding —
    * the comparison is decimal-exact on both engines at any SF).
    */
  def importantParts(s: SparkSession, dir: String): DataFrame = {
    val value = dec("l_extendedprice") * (lit(1) - dec("l_discount"))
    val perPart = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(value).as("part_value"))
    val total = perPart.agg(sum(col("part_value")).as("total_value"),
      count(lit(1)).as("n_parts"))
    perPart.join(broadcast(total))
      .filter(col("part_value") * col("n_parts") >
        col("total_value") * lit(BigDecimal("1.5")).cast("decimal(2,1)"))
      .select(col("l_partkey"),
        col("part_value").cast("double").as("part_value"))
  }

  val importantPartsSql: String = """
    WITH pp AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS part_value
      FROM lineitem GROUP BY l_partkey
    ), tot AS (SELECT SUM(part_value) AS total_value, COUNT(*) AS n_parts FROM pp)
    SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
    FROM pp, tot
    WHERE part_value * n_parts > total_value * CAST(1.5 AS DECIMAL(2,1))"""

  /** TPC-H Q9 shape: product-type profit by nation and year. The
    * testdata has no partsupp, so supply cost is the deterministic
    * proxy p_retailprice × quantity × 0.1 — the five-table join
    * topology is the point: part (filtered, broadcast) prunes
    * lineitem early, supplier→nation broadcast-chains onto it, and
    * only the orders join shuffles (both sides on orderkey). Exact
    * DECIMAL amounts keep the sum reduction-order-independent; cast
    * to double once at the end.
    */
  def productProfit(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).filter(col("p_name").contains("widget"))
      .select(col("p_partkey"), col("p_retailprice"))
    val sn = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val amount = dec("l_extendedprice") * (lit(1) - dec("l_discount")) -
      dec("p_retailprice") * dec("l_quantity") * lit(BigDecimal("0.1")).cast("decimal(2,1)")
    Tables.lineitem(s, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(amount).cast("double").as("sum_profit"))
  }

  val productProfitSql: String = """
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                    - CAST(p.p_retailprice AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(18,2)) * CAST(0.1 AS DECIMAL(2,1)))
                AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)"""

  def excessSuppliers(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).filter(col("p_type") === "ECONOMY")
      .select(col("p_partkey"))
    val shipped = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(dec("l_quantity")).as("qty"))
      .filter(col("qty") > 50)
    Tables.supplier(s, dir)
      .join(shipped, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
  }

  val excessSuppliersSql: String = """
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 50)"""
}
