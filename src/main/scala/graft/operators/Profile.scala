package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generic column profiler — the data-quality census every ingestion
  * run of a 100 TB corpus wants before anything downstream trusts the
  * data: per column, row/non-null/distinct counts and normalized
  * min/max. The reference's `catalog health` query (q12) counts rows
  * per table; this is its per-column refinement.
  *
  * Shape at scale — ONE pass over the table: all per-column aggregates
  * (including the multi-column exact COUNT(DISTINCT)s, which Catalyst
  * plans through a single Expand + two-phase hash aggregate with
  * map-side partials) run in a single aggregation over one scan. The
  * Expand multiplies rows ×(distinct-agg count), the textbook price of
  * exact multi-column distincts in one pass — still one scan, versus
  * k scans for per-column passes. The final melt (1 row → k rows)
  * happens on a single-row frame, i.e. free.
  *
  * String columns count distincts on md5(value) (16-byte digests
  * shuffle instead of full document texts — at corpus scale a text
  * column would otherwise ship terabytes into the distinct; collision
  * odds at 2⁻¹²⁸ are not a real number), and min/max ship truncated
  * to 64 chars AFTER the full-string extremum. Numeric min/max
  * normalize to BIGINT (doubles e6-floored, timestamps as epoch-ms)
  * so output rendering is engine-neutral.
  */
object Profile {

  /** Per-column profile of `df`: one output row per supported column
    * — (table, col_name, n_rows, n_nonnull, n_distinct, min_num,
    * max_num, min_str, max_str). Unsupported (nested/binary) columns
    * are skipped.
    */
  def profile(df: DataFrame, table: String): DataFrame = {
    val fields = df.schema.fields.toIndexedSeq.filter(f => supported(f.dataType))
    val aggs: Seq[Column] = fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(c).as(s"${f.name}__nn"),
        (f.dataType match {
          case StringType => count_distinct(md5(c))
          case _          => count_distinct(c)
        }).as(s"${f.name}__nd"),
        minNum(f, min(c)).as(s"${f.name}__minn"),
        minNum(f, max(c)).as(s"${f.name}__maxn"),
        strOf(f, min(c)).as(s"${f.name}__mins"),
        strOf(f, max(c)).as(s"${f.name}__maxs"))
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = fields.map { f =>
      struct(
        lit(f.name).as("col_name"),
        col(s"${f.name}__nn").as("n_nonnull"),
        col(s"${f.name}__nd").as("n_distinct"),
        col(s"${f.name}__minn").as("min_num"),
        col(s"${f.name}__maxn").as("max_num"),
        col(s"${f.name}__mins").as("min_str"),
        col(s"${f.name}__maxs").as("max_str"))
    }
    row.select(lit(table).as("tbl"), col("__n").as("n_rows"),
        explode(array(entries: _*)).as("p"))
      .select(col("tbl"), col("p.col_name"), col("n_rows"), col("p.n_nonnull"),
        col("p.n_distinct"), col("p.min_num"), col("p.max_num"),
        col("p.min_str"), col("p.max_str"))
  }

  private def supported(dt: DataType): Boolean = dt match {
    case StringType | IntegerType | LongType | FloatType | DoubleType |
         BooleanType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Normalized BIGINT view of a typed extremum: integers raw, doubles
    * e6-floored (exact long arithmetic after ONE IEEE multiply of the
    * already-reduced single extremum), timestamps as epoch millis,
    * dates as days since epoch, booleans as 0/1. NULL (typed) for
    * strings.
    */
  private def minNum(f: StructField, c: Column): Column = f.dataType match {
    case IntegerType | LongType => c.cast("long")
    case FloatType | DoubleType => floor(c.cast("double") * lit(1000000.0)).cast("long")
    case TimestampType | TimestampNTZType => unix_millis(c.cast("timestamp"))
    case DateType => datediff(c, to_date(lit("1970-01-01"))).cast("long")
    case BooleanType => c.cast("long")
    case _ => lit(null).cast("long")
  }

  /** String extremum, truncated to 64 chars AFTER the full-string
    * min/max; typed NULL for non-strings.
    */
  private def strOf(f: StructField, c: Column): Column = f.dataType match {
    case StringType => substring(c, 1, 64)
    case _ => lit(null).cast("string")
  }
}
