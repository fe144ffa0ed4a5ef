package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BFS-level computation over an edge table — the scale path
  * for transitive-closure queries that exceed one sentence (SURVEY §2.4
  * U12: per-sentence HEAD+ walks stay in SentGraph; cross-document
  * closures run here).
  *
  * Each round is one join (edges ⋈ frontier) whose strategy is left to
  * the optimizer on purpose: a thin frontier broadcasts (the edge side
  * then never shuffles — the common case, since a BFS level is a small
  * slice of the graph), a fat one falls back to a shuffle join with AQE
  * skew-splitting. Forcing a fixed co-partitioned layout here was
  * measured SLOWER (round 6): it pre-pays a full edge-table exchange to
  * optimize away per-round shuffles that the broadcast regime never
  * performs. Rounds = longest path length. In the general DAG regime an
  * anti-join against the already-labeled set and a min-depth regroup
  * deduplicate multi-path reaches; for a FOREST (every child has
  * exactly one parent — CoNLL HEAD columns by construction) each node
  * is reached exactly once, so `forest = true` skips both. Lineage is
  * truncated every round with localCheckpoint.
  */
object IterativeClosure {

  /** @param edges  (child, parent) rows — a forest/DAG pointing rootward
    * @param roots  (node) rows with depth 0
    * @param forest every child has exactly ONE parent (single-HEAD
    *               trees): BFS reaches each node exactly once, so the
    *               seen-filter and min-depth regroup are provably no-ops
    *               and are skipped — the round is just the one join.
    *               Leave false for general DAGs / multi-parent graphs.
    * @return (node, depth) for every node reachable from a root by
    *         following child←parent edges downward. */
  def depths(spark: SparkSession, edges: DataFrame, roots: DataFrame,
             maxIter: Int = 64, forest: Boolean = false): DataFrame = {
    import spark.implicits._
    val e = edges.select($"child", $"parent").localCheckpoint()
    // the forest contract is load-bearing (it justifies skipping the
    // seen-filter, and a multi-parent child would re-enter the frontier
    // every round as silently duplicated rows) — verify it against the
    // checkpointed edges, once per call, same discipline as
    // ConnectedComponents.assertComponentLabels
    if (forest) {
      val multi = e.groupBy($"child").count().filter($"count" > 1)
      require(multi.isEmpty,
        "forest=true but a child has multiple parents — use forest=false " +
          "for DAG/multi-parent inputs")
    }
    var labeled = roots.select($"node").distinct()
      .withColumn("depth", lit(0)).localCheckpoint()
    var frontier = labeled
    var i = 0
    var done = false
    while (!done && i < maxIter) {
      // the frontier-size check rides the round's one materialization
      // job (bump-UDF + eager localCheckpoint) instead of a separate
      // isEmpty action, and `labeled` is NOT re-checkpointed: it is a
      // union of already-checkpointed frontiers, so its lineage stays
      // shallow (≤ rounds) with no extra job per round. The accumulator
      // is only the TRIGGER (exact accumulator semantics hold in
      // actions only): an empty reading is CONFIRMED by isEmpty on the
      // checkpointed table before the loop exits, so a lost bump can
      // cost one cheap confirm, never a truncated closure.
      val sizeAcc = spark.sparkContext.longAccumulator(s"bfs_frontier_$i")
      val bump = udf { (n: String) => sizeAcc.add(1); n }
      val reached = e.join(frontier, e("parent") === frontier("node"))
        .select(e("child").as("node"), (frontier("depth") + 1).as("depth"))
      // the bump rides a throwaway string column (dropped after the
      // checkpoint materializes it) so node ids keep their exact input
      // type — the String-typed UDF must never coerce a numeric key
      val next = (if (forest) reached
        else reached
          .join(labeled.select($"node".as("seen")), $"node" === $"seen", "left_anti")
          .groupBy($"node").agg(min($"depth").as("depth")))
        .select($"node", $"depth", bump($"node".cast("string")).as("_t"))
        .localCheckpoint()
        .drop("_t")
      if (sizeAcc.value == 0L && next.isEmpty) done = true
      else {
        labeled = labeled.union(next)
        frontier = next
      }
      i += 1
    }
    // a truncated closure (budget exhausted with a non-empty frontier)
    // would silently omit every node deeper than maxIter — fail loudly
    // like the ConnectedComponents loops (64 levels covers any real
    // HEAD-tree; hitting the cap means a cycle reached from a root or a
    // mis-set budget, not a big corpus)
    require(done,
      s"BFS closure did not drain the frontier in $maxIter rounds — " +
        "path length exceeds the budget (or a root-reachable cycle)")
    labeled
  }
}
