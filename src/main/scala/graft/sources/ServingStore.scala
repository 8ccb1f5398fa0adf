package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Batch serving-store layout — the parquet analog of the reference's
  * Cassandra data model (partition key (symbol, date), clustering
  * timestamp DESC; keyspace.cql:25-44, SURVEY.md §1.3/§4.1):
  *
  *  - directory-partitioned by the date column -> Catalyst partition
  *    pruning turns "WHERE trade_date = X" into reading one directory,
  *    the moral equivalent of a Cassandra partition-key lookup;
  *  - sorted within files by (symbol, time desc) -> parquet row-group
  *    min/max statistics let symbol point-lookups skip most row
  *    groups (clustering-order analog).
  *
  * At 100 TB this layout is what keeps the Q1-Q12 serving surface
  * interactive: every dashboard query prunes to a handful of
  * partitions before any IO happens.
  */
object ServingStore {

  def write(df: DataFrame, path: String, dateCol: String,
            sortCols: Seq[String], mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartition(df(dateCol))
      .sortWithinPartitions(sortCols.map(df(_)): _*)
      .write
      .partitionBy(dateCol)
      .mode(mode)
      .save(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed table write: pre-shuffles once at write time so that
    * every future join/aggregation on `bucketCols` runs with NO
    * exchange — the parquet analog of co-locating by Cassandra
    * partition key, and the biggest lever for repeated large-table
    * joins at 100 TB (pay the shuffle once, amortize it over every
    * downstream query). Requires the session catalog (saveAsTable).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .mode(SaveMode.Overwrite)
      .format("parquet")
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
