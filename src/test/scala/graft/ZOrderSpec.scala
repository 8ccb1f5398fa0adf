package graft

import org.apache.spark.sql.functions._

import graft.functions.{ZOrderFunctions, ZOrderUtil}

/** Morton interleave: bit-level reference check, monotonicity, and the
  * codegen/interpreted agreement every native Expression needs.
  */
class ZOrderSpec extends SparkSpecBase {
  import spark.implicits._

  /** Naive bit-by-bit interleave as the independent reference. */
  private def naive(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("interleave32 matches the bit-by-bit reference") {
    val cases = Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (0xffffffffL, 0xffffffffL), (12345L, 54321L),
      (0xaaaaaaaaL, 0x55555555L), (1L << 31, 1L << 31))
    cases.foreach { case (x, y) =>
      assert(ZOrderUtil.interleave32(x, y) == naive(x, y), s"($x, $y)")
    }
  }

  test("x occupies even bits, y odd bits; inputs truncate to 32 bits") {
    assert(ZOrderUtil.interleave32(0xffffffffL, 0L) == 0x5555555555555555L)
    assert(ZOrderUtil.interleave32(0L, 0xffffffffL) == 0xaaaaaaaaaaaaaaaaL)
    // Bits above 31 must not leak into the code.
    assert(ZOrderUtil.interleave32(1L << 32, 0L) == 0L)
  }

  test("monotone in each argument with the other fixed") {
    val xs = Seq(0L, 1L, 2L, 1000L, 65535L, 1000000L)
    xs.sliding(2).foreach { case Seq(a, b) =>
      assert(ZOrderUtil.interleave32(a, 7L) < ZOrderUtil.interleave32(b, 7L))
      assert(ZOrderUtil.interleave32(7L, a) < ZOrderUtil.interleave32(7L, b))
    }
  }

  test("expression agrees between codegen and interpreted eval, nulls pass through") {
    val df = Seq((Some(3L), Some(5L)), (Some(65535L), Some(65535L)),
        (None: Option[Long], Some(1L)), (Some(1L), None: Option[Long]))
      .toDF("x", "y")
    def run(codegen: String): Seq[Option[Long]] = {
      val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(ZOrderFunctions.morton(col("x"), col("y")).as("z"))
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
    }
    val compiled = run("CODEGEN_ONLY")
    val interpreted = run("NO_CODEGEN")
    assert(compiled == interpreted)
    assert(compiled == Seq(Some(naive(3L, 5L)), Some(naive(65535L, 65535L)), None, None))
  }

  test("z-cells bound both dimensions (the pruning property)") {
    // 4096 points on a 64×64 grid, z-bucketed into 16 cells: an
    // aligned block of 256 consecutive z codes is exactly a 16×16
    // tile, so every cell's min/max rectangle spans 16 in BOTH
    // dimensions — the whole point vs a sort by one column, whose
    // cells span the FULL range (63) of the other.
    val pts = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val cells = pts
      .withColumn("z", ZOrderFunctions.morton(col("x"), col("y")))
      .withColumn("cell", expr("z div 256"))
      .groupBy("cell")
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
      .collect()
    assert(cells.length == 16)
    cells.foreach { r =>
      assert(r.getLong(1) <= 15 && r.getLong(2) <= 15,
        s"cell ${r.getLong(0)} spans ${r.getLong(1)}×${r.getLong(2)}")
    }
  }
}
