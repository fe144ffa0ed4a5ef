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
      val next = e.join(frontier, e("parent") === frontier("node"))
        .select(e("child").as("node"), (frontier("depth") + 1).as("depth"))
        .join(labeled.select($"node".as("seen")), $"node" === $"seen", "left_anti")
        .groupBy($"node").agg(min($"depth").as("depth"))
        .localCheckpoint()
      if (next.isEmpty) done = true
      else {
        labeled = labeled.union(next).localCheckpoint()
        frontier = next
      }
      i += 1
    }
    labeled
  }
}
