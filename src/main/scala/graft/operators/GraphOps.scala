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
  * SOCC'14) — the edge set only ever shrinks toward a forest of
  * stars, and the round count is O(log n) rather than O(diameter), so
  * a 100 TB pair list converges in a dozen rounds even for chain-shaped
  * duplicate families. The driver loop carries no data — only a
  * per-round star-forest convergence bit (a structural fixpoint test,
  * so there is no fingerprint-collision failure mode and the loop
  * stops the round the fixpoint is reached, not one round later);
  * every round's frame is eagerly checkpointed so lineage stays flat.
  *
  * Round shape (r18 optimization round — guide §2.4/§2.3, each CC
  * round used to pay 5 exchanges + 2 full-edge-set aggregation passes):
  *  - The star-forest test and large-star's min-neighbor table are ONE
  *    aggregation over the symmetrized edges (they group by the same
  *    node key; the test's parent-uniqueness check is min(parent) ≠
  *    max(parent) — equivalent to countDistinct(parent) > 1 and free
  *    of the distinct-aggregate Expand that doubled the exchange).
  *  - large-star's output `distinct()` is gone: its (m ≤ u < v) form
  *    never emits self-loops, and small-star's min-aggregates are
  *    duplicate-insensitive with its own final distinct restoring set
  *    semantics — the intermediate dedup exchange bought nothing.
  *  - At the fixpoint the SAME aggregation row set IS the label table
  *    (a min-rooted star forest's per-node min neighbor is its root),
  *    so the final labels cost no extra pass over the edges.
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

    // small-star: every neighbor v < u (and u itself) links to the
    // minimum of u's smaller neighborhood. Input may carry duplicate
    // edges (large-star no longer dedups): min() is duplicate-
    // insensitive and the final distinct restores set semantics.
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

    var labels: DataFrame = null
    var iter = 0
    while (labels == null) {
      // ONE aggregation over the symmetrized edges serves both the
      // convergence test and (when not converged) large-star:
      //   mn          = min neighbor of u  (large-star's target, and
      //                 at the fixpoint the component root)
      //   p / c       = u appears as a parent / as a child
      //   pmin / pmax = extrema of u's parents (s of each (s, u) edge);
      //                 pmin ≠ pmax ⟺ u has more than one parent.
      // A canonical (s<d, distinct) edge set is a fixpoint of the
      // smallStar∘largeStar round IFF it is a star forest — no node is
      // both a parent and a child, and every child has exactly one
      // parent. (A star forest with min-roots maps to itself under
      // both stars, case by case; any violation changes the set, so
      // the first star-forest round IS the fixpoint.) Checking
      // structure directly is both exact — no hash-collision failure
      // mode, unlike a fingerprint compare — and one round cheaper: a
      // fingerprint only detects the fixpoint after a second round
      // reproduces it.
      val sym = e.select(col("s").as("u"), col("d").as("v"),
          lit(1).as("par"), lit(0).as("chi"),
          lit(null).cast(e.schema("s").dataType).as("parent"))
        .union(e.select(col("d").as("u"), col("s").as("v"),
          lit(0).as("par"), lit(1).as("chi"), col("s").as("parent")))
      val m = sym.groupBy("u")
        .agg(min(col("v")).as("mn"), max(col("par")).as("p"),
          max(col("chi")).as("c"),
          min(col("parent")).as("pmin"), max(col("parent")).as("pmax"))
        .localCheckpoint(true)
      val converged = m
        .filter((col("p") === 1 && col("c") === 1) || col("pmin") =!= col("pmax"))
        .isEmpty
      if (converged) {
        // Fixpoint: E is a forest of stars — each non-root's minimum
        // neighbor is its root; each root's neighbors are all larger.
        // m already holds exactly (node, min neighbor) — the labels
        // cost no further pass over the edges, whose cached copy can
        // be freed now (the returned plan reads only m's checkpoint).
        labels = m.select(col("u").as("id"), least(col("u"), col("mn")).as("component"))
        backingRdd(e).foreach(_.unpersist(blocking = false))
      } else {
        require(iter < maxIter,
          s"connectedComponents did not converge in $maxIter rounds")
        // large-star: every neighbor v > u links to m(u) = min(N(u) ∪ {u}).
        val lsTargets = m.select(col("u"), least(col("u"), col("mn")).as("m"))
        val ls = sym.select(col("u"), col("v")).join(lsTargets, "u")
          .filter(col("v") > col("u"))
          .select(col("m").as("s"), col("v").as("d")) // m(u) <= u < v: canonical
        val next = smallStar(ls).localCheckpoint(true)
        backingRdd(e).foreach(_.unpersist(blocking = false))
        backingRdd(m).foreach(_.unpersist(blocking = false))
        e = next
        iter += 1
      }
    }
    labels
  }
}
