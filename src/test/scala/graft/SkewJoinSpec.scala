package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted join returns exactly the unsalted join's rows on skewed data") {
    // 90% of the fact side lands on one hot key.
    val fact = (1 to 2000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "HOT", i.toLong)).toDF("k", "v")
    val dim = Seq(("HOT", "hot-dim"), ("k0", "d0"), ("k3", "d3")).toDF("k", "name")

    val plain = fact.join(dim, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(fact, dim, Seq("k"), factor = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(plain.size > 1500)
  }

  test("outer variants preserve unmatched rows") {
    val fact = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val dim = Seq(("a", "A")).toDF("k", "name")
    val out = SkewJoin.saltedJoin(fact, dim, Seq("k"), factor = 4, joinType = "left")
      .collect().map(r => (r.getString(0), Option(r.getString(2)))).toSet
    assert(out === Set(("a", Some("A")), ("b", None)))
  }
}
