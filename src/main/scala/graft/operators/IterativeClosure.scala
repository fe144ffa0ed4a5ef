package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BFS-level computation over an edge table — the scale path
  * for transitive-closure queries that exceed one sentence (SURVEY §2.4
  * U12: per-sentence HEAD+ walks stay in SentGraph; cross-document
  * closures run here).
  *
  * Each round is one shuffle (join on parent) + an anti-join against the
  * already-labeled frontier; rounds = longest path length. Lineage is
  * truncated every round with localCheckpoint. Skewed hub nodes are
  * handled by AQE skew-join splitting (enabled in the session).
  */
object IterativeClosure {

  /** @param edges  (child, parent) rows — a forest/DAG pointing rootward
    * @param roots  (node) rows with depth 0
    * @return (node, depth) for every node reachable from a root by
    *         following child←parent edges downward. */
  def depths(spark: SparkSession, edges: DataFrame, roots: DataFrame, maxIter: Int = 64): DataFrame = {
    import spark.implicits._
    val e = edges.select($"child", $"parent").localCheckpoint()
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
      // shallow (≤ rounds) with no extra job per round — together this
      // cuts the loop from 3 scheduled jobs per round to 1
      val sizeAcc = spark.sparkContext.longAccumulator(s"bfs_frontier_$i")
      val bump = udf { (n: String) => sizeAcc.add(1); n }
      val next = e.join(frontier, e("parent") === frontier("node"))
        .select(e("child").as("node"), (frontier("depth") + 1).as("depth"))
        .join(labeled.select($"node".as("seen")), $"node" === $"seen", "left_anti")
        .groupBy($"node").agg(min($"depth").as("depth"))
        .select(bump($"node").as("node"), $"depth")
        .localCheckpoint()
      if (sizeAcc.value == 0L) done = true
      else {
        labeled = labeled.union(next)
        frontier = next
      }
      i += 1
    }
    labeled
  }
}
