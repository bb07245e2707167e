package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Connected components over a near-duplicate pair graph — the step that
  * turns pairwise dedup output (q34/q35/q43 shapes) into *clusters*, so a
  * pipeline can keep one canonical document per duplicate group instead of
  * reasoning about overlapping pairs (a ~ b, b ~ c ⇒ drop two of {a,b,c},
  * which pair-at-a-time filtering gets wrong).
  *
  * Algorithm: distributed min-label propagation with pointer jumping.
  * Every node starts labeled with its own id; each round
  *   (1) relaxes along edges  — label(v) := min(label(v), label(u)) for
  *       each neighbor u, computed as one join + min-aggregate, and
  *   (2) pointer-jumps        — label(v) := label(label(v)), which doubles
  *       the distance a minimum travels per round.
  * The combination converges in O(log diameter) rounds (the classic
  * MapReduce connected-components recipe — cf. Rastogi et al., "Finding
  * Connected Components in Map-Reduce in Logarithmic Rounds", ICDE 2013 —
  * of which large-star/small-star is the edge-rewriting variant). Each
  * round is two shuffles over O(V) label rows, NOT the edge multiset, and
  * convergence is detected by a monotone label-sum invariant: labels only
  * ever decrease, so the sum is strictly decreasing until fixpoint.
  *
  * Scale posture: no driver-side graph state — the driver loop holds only a
  * per-round checksum. Label frames are `localCheckpoint`ed each round to
  * cut the growing lineage (iterative DataFrame plans otherwise re-derive
  * every prior round at each action). Duplicate-cluster graphs have tiny
  * diameters in practice (near-dup similarity is near-transitive), so the
  * loop typically runs 2–4 rounds.
  */
object Cluster {

  /** Per-node component labels for every node appearing in `edges`:
    * (id BIGINT, comp BIGINT) where comp = min node id reachable. Nodes not
    * present in any edge are absent (callers left-join and coalesce to the
    * node's own id — a singleton is its own component).
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIters: Int = 50): DataFrame = {
    // symmetric, loop-free edge set (undirected graph as two directed rows)
    val sym = edges.select(col(srcCol).cast(LongType).as("a"), col(dstCol).cast(LongType).as("b"))
    val und = sym.union(sym.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // seed labels with one aggregation: label(v) = min(v, min neighbor) —
    // equivalent to (distinct nodes + one relax round) in a single shuffle
    var lbl = und.groupBy(col("a").as("id"))
      .agg(min(col("b")).as("__nmin"))
      .select(col("id"), least(col("id"), col("__nmin")).as("comp"))
      .localCheckpoint(true)
    // monotone convergence metric: labels only decrease, so the label sum
    // strictly decreases every round until the fixpoint (decimal: no
    // overflow at any node count)
    def checksum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast(DecimalType(38, 0)))).head().getDecimal(0)

    var prev = checksum(lbl)
    var it = 0
    var converged = lbl.isEmpty // empty graph: nothing to do
    while (!converged) {
      it += 1
      if (it > maxIters) throw new IllegalStateException(
        s"connectedComponents: no fixpoint after $maxIters rounds")
      // (1) relax along edges: each node takes the min of its own and its
      // neighbors' labels (join keyed on the edge endpoint, min-aggregate
      // gets map-side combine — hot nodes reduce before the shuffle)
      val prop = und.join(lbl.select(col("id").as("a"), col("comp")), Seq("a"))
        .select(col("b").as("id"), col("comp"))
      val relaxed = prop.union(lbl).groupBy("id").agg(min("comp").as("comp"))
      // (2) pointer jump: follow the label one more hop (labels are node
      // ids, so they key back into the same frame)
      val parents = relaxed.select(col("id").as("pid"), col("comp").as("pcomp"))
      val jumped = relaxed.join(parents, col("comp") === col("pid"), "left")
        .select(col("id"), least(col("comp"), coalesce(col("pcomp"), col("comp"))).as("comp"))
      lbl = jumped.localCheckpoint(true)
      val cur = checksum(lbl)
      converged = cur.compareTo(prev) == 0
      prev = cur
    }
    und.unpersist()
    lbl
  }
}
