package graft

import graft.operators.GraphOps

class GraphOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.connectedComponents(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap

  test("chain resolves to one component even without transitive edges") {
    // 1-2, 2-3, 3-4, 4-5: no pair beyond adjacent is directly linked —
    // the case a pairwise survivor rule cannot name as one cluster.
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep distinct minimum labels") {
    val got = cc(Seq((10L, 7L), (7L, 9L), (2L, 3L), (100L, 42L)))
    assert(got === Map(7L -> 7L, 9L -> 7L, 10L -> 7L,
      2L -> 2L, 3L -> 2L, 42L -> 42L, 100L -> 42L))
  }

  test("duplicate, reversed, and self-loop edges are normalized away") {
    val got = cc(Seq((2L, 1L), (1L, 2L), (2L, 2L), (1L, 2L), (3L, 3L)))
    // Self-loop-only node 3 is not incident to any real edge.
    assert(got === Map(1L -> 1L, 2L -> 1L))
  }

  test("nearDedupCC keeps exactly one representative per duplicate chain") {
    import org.apache.spark.sql.functions._
    // a~b and b~c are near-dups (one-token deltas over a long text);
    // a and c share less. CC must keep only doc 1 of {1,2,3}, plus
    // the unrelated singleton.
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, base),
      (2L, base + " xa"),
      (3L, base + " xa xb"),
      (9L, "a completely different tiny document here")).toDF("doc_id", "text")
    val kept = graft.operators.Dedup.nearDedupCC(df, minJaccardE6 = 500000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 9L))
  }

  test("star and long-path topologies converge to the same labels at any partitioning") {
    val star = (2L to 40L).map(i => (1L, i))
    val path = (1L until 40L).map(i => (i, i + 1))
    for (edges <- Seq(star, path); parts <- Seq(1, 7)) {
      val df = edges.toDF("src", "dst").repartition(parts)
      val got = GraphOps.connectedComponents(df, "src", "dst")
        .as[(Long, Long)].collect().toMap
      assert(got === (1L to 40L).map(_ -> 1L).toMap)
    }
  }
}
