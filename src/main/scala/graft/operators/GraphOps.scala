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
  * (count, hash-sum) convergence signature per round (re-confirmed
  * structurally at the end, so a signature collision cannot produce a
  * silent wrong answer); every round's frame is eagerly checkpointed
  * so lineage stays flat.
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

    // Order-independent edge-set fingerprint: XOR of row hashes never
    // overflows (sum would raise under ANSI) and edges are distinct,
    // so no pair can self-cancel.
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(s, d))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

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

    var sig = signature(e)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      val nextSig = signature(next)
      backingRdd(e).foreach(_.unpersist(blocking = false))
      converged = nextSig == sig
      e = next
      sig = nextSig
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")

    // The signature is a (count, xor-of-hashes) proxy: two DIFFERENT
    // consecutive edge sets could collide (~2⁻⁶⁴) and stop the loop
    // early — a silent wrong answer. Rule it out by confirming the
    // fixpoint directly: one more contraction round must reproduce e
    // exactly (both frames are distinct+canonical, so an empty
    // symmetric difference means set equality). Costs one extra round
    // out of O(log n) — cheap insurance against a silent failure mode.
    val confirm = smallStar(largeStar(e))
    require(confirm.exceptAll(e).union(e.exceptAll(confirm)).isEmpty,
      "convergence signature collided: edge set was not a fixpoint")

    // At the fixpoint E is a forest of stars: each non-root's minimum
    // neighbor is its root; each root's neighbors are all larger.
    val sym = e.select(col("s").as("id"), col("d").as("nbr"))
      .union(e.select(col("d").as("id"), col("s").as("nbr")))
    sym.groupBy("id").agg(min(col("nbr")).as("mn"))
      .select(col("id"), least(col("id"), col("mn")).as("component"))
  }
}
