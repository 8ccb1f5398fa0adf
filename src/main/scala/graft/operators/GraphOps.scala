package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for dedup pipelines.
  *
  * The one that matters at 100 TB is connected components: near-dup
  * detection produces PAIRS, but the thing a curation pipeline needs is
  * CLUSTERS — similarity is not transitive, so "a~b, b~c" must resolve
  * to one cluster {a,b,c} even when a~c was never emitted (a greedy
  * drop-the-larger-id survivor rule handles the pair list but cannot
  * name the clusters or pick one canonical representative per group).
  *
  * Algorithm: alternating large-star / small-star contraction
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SOCC'14) — each round is two shuffles (a per-node min and an
  * equi-join), the edge set only ever shrinks toward a forest of
  * stars, and the round count is O(log n) rather than O(diameter), so
  * a 100 TB pair list converges in a dozen rounds even for chain-shaped
  * duplicate families. The driver loop carries no data — only a
  * per-round star-forest convergence bit (a structural fixpoint test,
  * so there is no fingerprint-collision failure mode and the loop
  * stops the round the fixpoint is reached, not one round later);
  * every round's frame is eagerly checkpointed so lineage stays flat.
  */
object GraphOps {

  /** Connected components of the undirected graph given as an edge
    * list. Returns (id, component) for every node incident to at least
    * one edge, where component = the minimum node id reachable.
    * Deterministic for any input order or partitioning.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 50): DataFrame = {
    // Canonical undirected form: s < d, no self-loops, no multi-edges.
    var e = edges
      .select(least(col(srcCol), col(dstCol)).as("s"),
              greatest(col(srcCol), col(dstCol)).as("d"))
      .filter(col("s") =!= col("d"))
      .distinct()
      .localCheckpoint(true)

    // Convergence test: a canonical (s<d, distinct) edge set is a
    // fixpoint of the smallStar∘largeStar round IFF it is a star
    // forest — no node is both a parent and a child, and every child
    // has exactly one parent. (A star forest with min-roots maps to
    // itself under both stars, case by case; any violation changes the
    // set, so the first star-forest round IS the fixpoint.) Checking
    // structure directly is both exact — no hash-collision failure
    // mode, unlike a fingerprint compare — and one round cheaper: a
    // fingerprint only detects the fixpoint after a second round
    // reproduces it. One union + hash-aggregate per round, same cost
    // class as computing a fingerprint.
    def isStarForest(df: DataFrame): Boolean =
      df.select(col("s").as("node"), lit(1).as("par"), lit(0).as("chi"),
          lit(null).cast(df.schema("s").dataType).as("parent"))
        .union(df.select(col("d").as("node"), lit(0).as("par"), lit(1).as("chi"),
          col("s").as("parent")))
        .groupBy("node")
        .agg(max(col("par")).as("p"), max(col("chi")).as("c"),
          countDistinct(col("parent")).as("np"))
        .filter((col("p") === 1 && col("c") === 1) || col("np") > 1)
        .isEmpty

    // large-star: every neighbor v > u links to m(u) = min(N(u) ∪ {u}).
    def largeStar(cur: DataFrame): DataFrame = {
      val sym = cur.select(col("s").as("u"), col("d").as("v"))
        .union(cur.select(col("d").as("u"), col("s").as("v")))
      val m = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      sym.join(m, "u").filter(col("v") > col("u"))
        .select(col("m").as("s"), col("v").as("d")) // m(u) <= u < v: canonical
        .filter(col("s") =!= col("d"))
        .distinct()
    }

    // small-star: every neighbor v < u (and u itself) links to the
    // minimum of u's smaller neighborhood.
    def smallStar(cur: DataFrame): DataFrame = {
      val dir = cur.select(col("d").as("u"), col("s").as("v")) // u > v
      val m = dir.groupBy("u").agg(min(col("v")).as("m"))
      dir.join(m, "u")
        .select(col("m").as("s"), col("v").as("d")) // m <= v: canonical
        .union(m.select(col("m").as("s"), col("u").as("d")))
        .filter(col("s") =!= col("d"))
        .distinct()
    }

    // The backing RDD of an eager localCheckpoint, so the PREVIOUS
    // round's cached copy can be freed once the next one is
    // materialized — without this, O(log n) rounds pin O(log n) full
    // edge-set copies in executor storage for the session lifetime.
    // (The final round's copy stays pinned: the returned plan reads it.)
    def backingRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }

    var converged = isStarForest(e)
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      converged = isStarForest(next)
      backingRdd(e).foreach(_.unpersist(blocking = false))
      e = next
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")

    // At the fixpoint E is a forest of stars: each non-root's minimum
    // neighbor is its root; each root's neighbors are all larger.
    val sym = e.select(col("s").as("id"), col("d").as("nbr"))
      .union(e.select(col("d").as("id"), col("s").as("nbr")))
    sym.groupBy("id").agg(min(col("nbr")).as("mn"))
      .select(col("id"), least(col("id"), col("mn")).as("component"))
  }
}
