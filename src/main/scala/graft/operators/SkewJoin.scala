package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salting for skewed shuffle joins — the manual dial for the case
  * AQE's runtime skew-split cannot fix (one hot key dominating a
  * shuffle join where neither side broadcasts; in market data, one
  * symbol carrying most of the volume).
  *
  * The skewed (large) side gets a salt in [0, factor); the other side
  * is replicated once per salt value. The join key becomes
  * (key, salt), spreading the hot key over `factor` reducers. Output
  * rows are exactly those of the unsalted join — the salt only
  * changes physical placement (asserted in SkewJoinSpec).
  */
object SkewJoin {

  private val SupportedJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi")

  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
                 factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    // Right/full outer would emit each unmatched replicated-side row
    // `factor` times, breaking the result-identical contract.
    require(SupportedJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi joins, got $joinType")
    // Salt assignment only affects placement, not results — spread
    // rows round-robin within each input partition.
    val salted = skewed.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(factor.toLong)).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
