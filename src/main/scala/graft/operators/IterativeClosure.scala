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
  /** Edge-count bound under which the BFS runs ON THE DRIVER (r9, same
    * measured-size cutover as ConnectedComponents.localMaxEdges): a BFS
    * level over a small graph is one join's worth of fixed scheduling
    * cost per LEVEL — depth-many rounds of pure overhead (q30's det
    * token trees: 7 levels, 4.5 s warm at sf0.1 for milliseconds of
    * compute). Under the bound the edge list and roots are collected
    * once (the edges are already localCheckpointed — the collect is a
    * block read, not a recompute) and the level-synchronous BFS runs in
    * memory with IDENTICAL semantics: same forest contract check, same
    * min-depth-on-first-reach regime, same maxIter budget failure. At
    * 100 TB the edge table exceeds any sane bound and the distributed
    * loop runs unchanged. Parameterized: spark.graft.bfs.localMaxEdges
    * (0 disables). */
  private def localMaxEdges(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.bfs.localMaxEdges").map(_.toLong)
      .getOrElse(500000L)

  def depths(spark: SparkSession, edges: DataFrame, roots: DataFrame,
             maxIter: Int = 64, forest: Boolean = false): DataFrame = {
    import spark.implicits._
    val e = edges.select($"child", $"parent").localCheckpoint()
    val eCount = e.count()
    if (eCount <= localMaxEdges(spark)) {
      return localDepths(spark, e, roots, maxIter, forest)
    }
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

  /** Driver-side level-synchronous BFS — the small-graph cutover body.
    * Semantics mirror the distributed loop exactly: same forest-contract
    * check (row counts per child, not distinct parents), forest mode
    * propagates WITHOUT a seen-filter (a root that is also some node's
    * child is re-emitted at its reached depth, as the distributed join
    * does), DAG mode labels each node once at its minimum depth, and an
    * undrained frontier after maxIter rounds fails with the same loud
    * message. */
  private def localDepths(spark: SparkSession, e: DataFrame, roots: DataFrame,
                          maxIter: Int, forest: Boolean): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val es = e.collect()
    if (forest) {
      val perChild = new java.util.HashMap[Any, Integer]()
      es.foreach { r =>
        val c = r.get(0)
        val n = perChild.get(c)
        perChild.put(c, if (n == null) 1 else n + 1)
      }
      val it = perChild.values().iterator()
      var multi = false
      while (it.hasNext && !multi) multi = it.next() > 1
      require(!multi,
        "forest=true but a child has multiple parents — use forest=false " +
          "for DAG/multi-parent inputs")
    }
    val children = new java.util.HashMap[Any, scala.collection.mutable.ArrayBuffer[Any]]()
    es.foreach { r =>
      var b = children.get(r.get(1))
      if (b == null) { b = scala.collection.mutable.ArrayBuffer[Any](); children.put(r.get(1), b) }
      b += r.get(0)
    }
    val rootVals = roots.select(org.apache.spark.sql.functions.col("node"))
      .distinct().collect().map(_.get(0))
    val nodeDt = roots.select(org.apache.spark.sql.functions.col("node"))
      .schema.head.dataType
    val labeled = scala.collection.mutable.ArrayBuffer[(Any, Int)]()
    val seen = new java.util.HashSet[Any]()
    rootVals.foreach { v => labeled += ((v, 0)); if (!forest) seen.add(v) }
    var frontier: Seq[(Any, Int)] = rootVals.toSeq.map(v => (v, 0))
    var i = 0
    var done = false
    while (!done && i < maxIter) {
      val reached = frontier.flatMap { case (n, d) =>
        val cs = children.get(n)
        if (cs == null) Nil else cs.map(c => (c, d + 1))
      }
      val next =
        if (forest) reached
        else reached.filter { case (n, _) => seen.add(n) } // first reach = min depth (level order)
      if (next.isEmpty) done = true
      else { labeled ++= next; frontier = next }
      i += 1
    }
    require(done,
      s"BFS closure did not drain the frontier in $maxIter rounds — " +
        "path length exceeds the budget (or a root-reachable cycle)")
    val rows = labeled.map { case (n, d) => org.apache.spark.sql.Row(n, d) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(StructField("node", nodeDt), StructField("depth", IntegerType))))
  }
}
