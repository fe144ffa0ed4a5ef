package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation.
  *
  * Used for entity canonicalization (north_rule): nodes are entity ids,
  * edges are sameness evidence; the component label (= minimum node id in
  * the component) becomes the canonical id.
  *
  * Scale notes:
  *  - each iteration is one shuffle (join on `src`) + one aggregation;
  *    iteration count is bounded by the graph diameter. Entity-sameness
  *    graphs are short-diameter (star-shaped around canonical mentions),
  *    so this converges in a handful of rounds; for adversarially long
  *    chains switch to the large-star/small-star variant (doubles label
  *    reach per round, O(log n) rounds).
  *  - `localCheckpoint` truncates lineage every iteration so the plan
  *    doesn't grow with the loop (SURVEY §4 "fixpoint executor").
  *  - convergence check compares label sums — one count-style action per
  *    iteration, exact under min-label monotonicity (labels only decrease,
  *    so the concatenated min is a fixed point iff no label changed).
  */
object ConnectedComponents {

  /** @param edges DataFrame with two string columns `src`, `dst` (undirected).
    * @return DataFrame(node: string, component: string) — component is the
    *         lexicographically smallest node id reachable from `node`.
    */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    import spark.implicits._
    val sym = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
      .filter($"src" =!= $"dst")
      .distinct()
      .localCheckpoint()

    var labels = sym.select($"src".as("node")).distinct()
      .withColumn("lbl", $"node")
      .localCheckpoint()

    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val prop = labels.join(sym, labels("node") === sym("src"))
        .select(sym("dst").as("node"), labels("lbl"))
      val next = labels.union(prop)
        .groupBy($"node").agg(min($"lbl").as("lbl"))
        .localCheckpoint()
      // Labels are monotonically non-increasing; any change strictly
      // shrinks at least one label, so an anti-join emptiness test is exact.
      val changed = next.alias("n")
        .join(labels.alias("o"), col("n.node") === col("o.node"))
        .filter(col("n.lbl") =!= col("o.lbl"))
        .isEmpty
      labels = next
      converged = changed
      i += 1
    }
    labels.select($"node", $"lbl".as("component"))
  }
}
