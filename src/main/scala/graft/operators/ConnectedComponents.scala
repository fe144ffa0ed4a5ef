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
  *  - convergence: a changed-label accumulator riding the round's one
  *    materialization job is the cheap TRIGGER only; Spark guarantees
  *    exact accumulator semantics only in actions, so a trigger firing
  *    is CONFIRMED by an exact anti-join label compare before the loop
  *    exits (the runStar pattern; ADVICE r5 / VERDICT r5 #1 — the
  *    trigger-only variant produced one nondeterministic wrong-label
  *    run). The compare join runs only on rounds where the trigger
  *    fires — normally once per call, not per round.
  *  - belt-and-braces, both variants: the returned labels are verified
  *    as an exact fixpoint (every edge's endpoints share one label —
  *    see [[assertComponentLabels]]) so ANY early-convergence anomaly,
  *    known or unknown, is a loud error rather than a silent wrong
  *    answer. One join over the edge set, once per call.
  */
object ConnectedComponents {

  /** Edge-count bound under which a CC fixpoint FINISHES ON THE DRIVER
    * (r9, guide §1.2 step 1 / §2.2): an iterative round over a tiny edge
    * set is pure fixed overhead — each round schedules 3+ exchanges, a
    * checkpoint materialization and (on the final round) the exact
    * convergence joins, all over data that fits in one task. Measured at
    * sf0.1: q42's ~480-edge chain graph paid 4.5 s of warm wall for
    * ~5 star rounds of sub-millisecond compute. The gate is the same
    * measured-size routing the repo already uses for the gazetteer
    * broadcast (EntityLinker.link) and the canonicalize hint: both loops
    * already count their edges for the convergence trigger, so the probe
    * is free. At 100 TB the INITIAL edge set exceeds any sane bound and
    * the distributed rounds run unchanged — but the star contraction
    * shrinks the graph geometrically, so the O(log n) TAIL rounds (tiny
    * data, full scheduling latency) still cut over to the driver once
    * the measured count drops under the bound. ≤500k collected edge
    * pairs is tens of MB on the driver — the same order as a broadcast
    * build side. Parameterized (spark.graft.cc.localMaxEdges; 0 disables)
    * so a cluster profile can raise or kill the cutover.
    *
    * Exactness: the driver union-find computes the identical fixpoint
    * (component = minimum member under the column type's ordering — the
    * same ordering Spark's MIN uses for the supported key types), so the
    * result is bit-identical to the distributed loop's; LocalCcSpec pins
    * local == distributed on randomized graphs for both key types.
    */
  private def localMaxEdges(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.cc.localMaxEdges").map(_.toLong)
      .getOrElse(500000L)

  /** Orderings matching Spark's MIN/comparison semantics for the key
    * types the CC entries use; None → no local path (defensive). */
  private def orderingFor(dt: org.apache.spark.sql.types.DataType): Option[Ordering[Any]] = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType  => Some(Ordering.String.on[Any](_.asInstanceOf[String]))
      case LongType    => Some(Ordering.Long.on[Any](_.asInstanceOf[Long]))
      case IntegerType => Some(Ordering.Int.on[Any](_.asInstanceOf[Int]))
      case _           => None
    }
  }

  /** Driver-side union-find over a collected edge list: returns one
    * (node, minimum-of-component) row per distinct endpoint, as a
    * DataFrame with the loop outputs' exact schema. Path-compressed,
    * union-by-size; O(E α(E)) — sub-millisecond at the cutover bound. */
  private def localComponents(
      spark: SparkSession,
      edges: Array[(Any, Any)],
      dt: org.apache.spark.sql.types.DataType,
      ord: Ordering[Any]): DataFrame = {
    val idx = new java.util.HashMap[Any, Integer]()
    val nodes = scala.collection.mutable.ArrayBuffer[Any]()
    def id(v: Any): Int = {
      val existing = idx.get(v)
      if (existing != null) existing.intValue()
      else { val i = nodes.length; idx.put(v, Integer.valueOf(i)); nodes += v; i }
    }
    val parent = scala.collection.mutable.ArrayBuffer[Int]()
    val size = scala.collection.mutable.ArrayBuffer[Int]()
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    for ((a, b) <- edges) {
      val ia = id(a); val ib = id(b)
      while (parent.length < nodes.length) { parent += parent.length; size += 1 }
      val ra = find(ia); val rb = find(ib)
      if (ra != rb) {
        if (size(ra) < size(rb)) { parent(ra) = rb; size(rb) += size(ra) }
        else { parent(rb) = ra; size(ra) += size(rb) }
      }
    }
    // minimum member per root, under the column type's ordering
    val minOf = new java.util.HashMap[Int, Any]()
    var i = 0
    while (i < nodes.length) {
      val r = find(i)
      val cur = minOf.get(r)
      if (cur == null || ord.lt(nodes(i), cur)) minOf.put(r, nodes(i))
      i += 1
    }
    import org.apache.spark.sql.types.{StructField, StructType}
    val rows = (0 until nodes.length).map { j =>
      org.apache.spark.sql.Row(nodes(j), minOf.get(find(j)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("node", dt), StructField("component", dt))))
  }

  /** Shuffle width for the fixpoint loops, sized from the MEASURED edge
    * count (which both loops already track for their convergence
    * triggers): ~250k edge rows per partition, floored at 1, capped at
    * 4× the session's parallelism. An iterative loop pays its shuffle's
    * fixed per-task cost every ROUND, so a 5k-edge graph on 32-wide
    * default shuffles spends the rounds scheduling empty tasks; a
    * 10^10-edge graph gets the full width. Recomputed per round as the
    * star contraction shrinks the edge set. Explicit numPartitions also
    * pins both sides of each round's agg+join pair to ONE co-partitioned
    * layout (AQE never coalesces a user-specified width, so the reuse
    * can't be broken by runtime replanning). */
  private def widthFor(spark: SparkSession, rows: Long): Int = {
    val p = math.ceil(rows.toDouble / 250000.0).toLong
    math.max(1L, math.min(p, spark.sparkContext.defaultParallelism * 4L)).toInt
  }

  /** @param edges DataFrame with two string columns `src`, `dst` (undirected).
    * @param strict fail loudly if the round budget is exhausted before the
    *               labels converge (non-converged labels are silently WRONG
    *               on any node a distant minimum hasn't reached yet); only
    *               diagnostics that deliberately inspect a capped run turn
    *               this off.
    * @return DataFrame(node: string, component: string) — component is the
    *         lexicographically smallest node id reachable from `node`.
    */
  /** @param widthOverride fixes the loop's shuffle width instead of the
    *        measured-edge-count sizing — measurement hook for the
    *        width-policy A/B probes (tools/CanonProbe); production
    *        callers leave it None. */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 50,
          strict: Boolean = true, widthOverride: Option[Int] = None): DataFrame = {
    import spark.implicits._
    // loop-invariant: partition the symmetrized edges by the join key
    // ONCE, at the width the measured edge count calls for, before the
    // checkpoint pins the layout — every round's labels⋈sym join then
    // finds both sides already hash-partitioned on the key at the same
    // width (labels comes back (node, p)-partitioned from the round's
    // repartition+groupBy) and inserts no exchange; previously sym was
    // re-shuffled on src every round at the session default width.
    val sym0 = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
      .filter($"src" =!= $"dst")
      .distinct()
      .localCheckpoint()
    val symCount = sym0.count()
    // Small-graph cutover (see localMaxEdges): the measured symmetrized
    // edge count is already in hand for the width sizing; under the
    // bound the whole fixpoint is one driver union-find instead of
    // diameter-many shuffle rounds. sym0 IS the exact input graph here,
    // so the union-find result is the exact min-label fixpoint by
    // construction — the convergence trigger and the post-loop
    // assertComponentLabels have nothing left to check. widthOverride
    // (the CanonProbe A/B hook) forces the distributed loop.
    orderingFor(sym0.schema("src").dataType) match {
      case Some(ord) if widthOverride.isEmpty && symCount <= localMaxEdges(spark) =>
        val es = sym0.collect().map(r => (r.get(0), r.get(1)))
        return localComponents(spark, es, sym0.schema("src").dataType, ord)
      case _ =>
    }
    val p = widthOverride.getOrElse(widthFor(spark, symCount))
    val sym = sym0.repartition(p, $"src").localCheckpoint()

    // seed with min(node, direct neighbors): the state after one
    // propagation round of the node-id init, computed inside the same
    // aggregation that enumerates the nodes (no join) — one fewer
    // iteration for free, same fixpoint
    var labels = sym.groupBy($"src").agg(min($"dst").as("m"))
      .select($"src".as("node"), least($"src", $"m").as("lbl"))
      .localCheckpoint()

    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val prev = labels
      val prop = labels.join(sym, labels("node") === sym("src"))
        .select(sym("dst").as("node"), labels("lbl"))
      // The changed-label count rides the round's ONE materialization
      // job: the old label travels through the min-aggregation as a
      // second column and a bump-UDF counts rows whose label changed
      // while the eager localCheckpoint materializes the partitions —
      // no separate compare job on non-final rounds. But accumulators
      // inside transformations are NOT an exactness contract (they are
      // exact only in actions; retries/codegen/evaluation-order edges
      // are outside the spec), so `changed == 0` is only the TRIGGER:
      // convergence is CONFIRMED by an exact anti-join compare of the
      // two checkpointed label tables (both hold exactly one row per
      // node over the same node set, so an empty next∖prev difference
      // ⟺ identical labels ⟺ min-label fixpoint). A spurious trigger
      // costs one join and the loop continues; a suppressed trigger
      // costs a spare round; neither can mislabel. (VERDICT r5 #1:
      // the trigger-only variant flaked once in the driver run.)
      val changedAcc = spark.sparkContext.longAccumulator(s"cc_changed_$i")
      val bump = udf { (l: String, o: String) =>
        if (o == null || l != o) changedAcc.add(1)
        l
      }
      // the bump rides a THROWAWAY string column (dropped after the
      // checkpoint materializes it) so the label column itself never
      // passes through the String-typed UDF: a bigint label would
      // otherwise be silently cast to string and the next round's MIN
      // would turn lexicographic (review r6) — labels keep their exact
      // input type end-to-end
      val next = labels.select($"node", $"lbl", $"lbl".cast("string").as("old"))
        .union(prop.withColumn("old", lit(null).cast("string")))
        .repartition(p, $"node")
        .groupBy($"node").agg(min($"lbl").as("lbl"), max($"old").as("old"))
        .select($"node", $"lbl", bump($"lbl".cast("string"), $"old").as("_t"))
        .localCheckpoint()
        .drop("_t")
      converged = changedAcc.value == 0 &&
        next.join(prev, Seq("node", "lbl"), "left_anti").isEmpty
      labels = next
      i += 1
    }
    // non-convergence means silently-wrong labels (a label may not yet
    // have propagated across a long chain) — fail loudly; callers with
    // high-diameter graphs should use runStar (O(log n) rounds)
    require(!strict || converged,
      s"min-label CC did not converge in $maxIter rounds — graph diameter " +
        "exceeds the round budget; use runStar for high-diameter graphs")
    val out = labels.select($"node", $"lbl".as("component"))
    // capped non-strict runs are diagnostics of a known-wrong state —
    // verifying them would (correctly) throw. Verify against the
    // CHECKPOINTED symmetrized edges, not the caller's raw plan: the
    // input may hang off an expensive un-persisted chain (q34's LSH
    // cascade) that a second traversal would recompute in full.
    if (converged) assertComponentLabels(sym, out)
    out
  }

  /** Post-convergence exact fixpoint verification (VERDICT r5 #1a).
    *
    * Exactness argument, independent of any accumulator or convergence
    * trigger: both algorithms maintain the invariant
    * `min(component(v)) ≤ label(v) ≤ v` (labels are seeded from node
    * ids and only ever replaced by minima of existing labels). If every
    * edge's endpoints carry the SAME label, labels are constant per
    * component; the component's minimum node m has label ≤ m by the
    * invariant and ≥ min(component) = m, so the constant IS m — i.e.
    * edge-wise label equality ⟹ the exact min-label answer. A missing
    * endpoint (node dropped from the label table) is also a violation.
    * Cost: one join over the edge set, once per run — any early-
    * convergence anomaly becomes a loud error instead of a wrong hash.
    */
  def assertComponentLabels(edges: DataFrame, labels: DataFrame): Unit = {
    import org.apache.spark.sql.functions.col
    val l1 = labels.select(col("node").as("src"), col("component").as("lsrc"))
    val l2 = labels.select(col("node").as("dst"), col("component").as("ldst"))
    val bad = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .join(l1, Seq("src"), "left").join(l2, Seq("dst"), "left")
      .filter(col("lsrc").isNull || col("ldst").isNull ||
        col("lsrc") =!= col("ldst"))
    require(bad.isEmpty,
      "CC labels are not a fixpoint: an edge joins two different labels " +
        "(or an endpoint is unlabeled) — convergence was declared early")
  }

  /** Connected components by alternating large-star / small-star rounds
    * (Kiveris et al. 2014, "Connected Components in MapReduce and
    * Beyond" — a public-literature algorithm): each round contracts the
    * graph toward per-component stars centered at the minimum node, so
    * label reach DOUBLES per round and convergence is O(log n) rounds
    * regardless of diameter. This is the scale path for long-chain /
    * high-diameter evidence graphs where `run`'s min-label propagation
    * needs diameter-many rounds (a 10^12-doc provenance chain has
    * diameter ~10^10: min-label never finishes, large-star needs ~35
    * rounds). For short-diameter graphs (the gazetteer bucket stars)
    * `run` is cheaper per round — callers pick by graph shape.
    *
    *  - large-star: per node u, connect every LARGER neighbor to
    *    m = min(N(u) ∪ {u});
    *  - small-star: orient edges large→small; per node u, connect u and
    *    every smaller neighbor to the minimum;
    *  - converged when the edge set is a fixpoint (the result is then a
    *    star per component); `localCheckpoint` truncates lineage per
    *    round, the equality check is an exact count + one-sided
    *    anti-join (both sides are distinct sets).
    */
  def runStar(spark: SparkSession, edges: DataFrame, maxIter: Int = 50): DataFrame =
    runStarStats(spark, edges, maxIter)._1

  /** runStar + the number of large-star/small-star rounds taken — the
    * measurable O(log n) evidence (a diameter-d chain converges in
    * ~log2(d) rounds, not d). */
  def runStarStats(spark: SparkSession, edges: DataFrame, maxIter: Int = 50): (DataFrame, Int) = {
    import spark.implicits._
    var e = edges.select($"src".as("u"), $"dst".as("v"))
      .filter($"u" =!= $"v").distinct().localCheckpoint()
    // keep the checkpointed ORIGINAL edge set for the final label
    // verification — re-traversing the caller's raw plan would recompute
    // its full upstream chain (q34's LSH cascade) a second time
    val e0 = e
    var eCount = e.count()
    var converged = false
    var i = 0
    // Small-graph cutover (see localMaxEdges): checked at every round
    // head, because the star contraction shrinks the edge set
    // geometrically — at 100 TB the first rounds run distributed and the
    // O(log n) tail (tiny data, full per-round scheduling cost) finishes
    // as one driver union-find. Components and the per-component minimum
    // are invariants of the star rounds (edges only ever connect nodes
    // of one component and the minimum is always retained as a target),
    // so the union-find over the CONTRACTED edges yields the identical
    // label set; the original-edge fixpoint assert below still runs when
    // any distributed round contracted the graph first. eCount is the
    // at-least-once accumulator reading: an inflated count only DELAYS
    // the cutover by a round, never fires it early on a too-big graph
    // (the true count is ≤ the reading... the reading is ≥ true count,
    // so reading ≤ bound ⟹ true count ≤ bound).
    val starOrd = orderingFor(e.schema("u").dataType)
    val starLocalMax = localMaxEdges(spark)
    var localOut: Option[DataFrame] = None
    while (localOut.isEmpty && !converged && i < maxIter) {
      if (starOrd.isDefined && eCount <= starLocalMax) {
        val es = e.collect().map(r => (r.get(0), r.get(1)))
        localOut = Some(localComponents(spark, es, e.schema("u").dataType, starOrd.get))
      } else {
      // Each star pass shares ONE exchange between its aggregation and
      // its join: the adjacency is explicitly hash-partitioned on `u`
      // at the width the CURRENT edge count calls for (the count is
      // already tracked for the convergence trigger; the contraction
      // shrinks the graph round over round), so the groupBy needs no
      // further shuffle and the subsequent join finds both sides
      // co-partitioned. Three exchanges per round total (sym, ori,
      // final dedup) — the naive formulation paid ~six, all at the
      // session default width regardless of graph size.
      val p = widthFor(spark, eCount * 2)
      // large-star over the symmetrized adjacency
      val sym = e.select($"u", $"v").union(e.select($"v".as("u"), $"u".as("v")))
        .repartition(p, $"u")
      val mins = sym.groupBy($"u").agg(min($"v").as("mv"))
        .select($"u", least($"mv", $"u").as("m"))
      // no dedup here: the orientation step aggregates again anyway, and
      // u' = v > v' = m holds by construction (m ≤ u < v), so no self-loops
      val ls = sym.filter($"v" > $"u")
        .join(mins, "u")
        .select($"v".as("u"), $"m".as("v"))
      // small-star over large→small oriented edges; duplicate oriented
      // edges are harmless (MIN is duplicate-invariant, the final
      // distinct dedups the round's output), so the mid-round dedup
      // exchange is dropped in favor of the u-partitioning the agg+join
      // pair reuses
      val ori = ls.select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
        .repartition(p, $"u")
      val mins2 = ori.groupBy($"u").agg(min($"v").as("m"))
      // The edge count rides the materialization job (same accumulator
      // pattern as run()), replacing the per-round count() action — but
      // accumulators are at-least-once under task retry, so the count is
      // only the TRIGGER: convergence itself is confirmed by exact
      // two-sided anti-join set equality (both sides distinct, mutual ⊆
      // ⇒ equal, independent of the counter). A retry-inflated count can
      // only delay the trigger by a round (the fixpoint is stable, so a
      // clean round re-fires it); it can never falsely converge, and a
      // pathological every-round-retry stall hits the loud maxIter
      // require below rather than mislabeling.
      val cntAcc = spark.sparkContext.longAccumulator(s"star_edges_$i")
      val bump = udf { (u: String) => cntAcc.add(1); u }
      val ss = ori.join(mins2, "u")
        .select($"v".as("u"), $"m".as("v"))
        .union(mins2.select($"u", $"m".as("v")))
        .filter($"u" =!= $"v")
        // dedup rides an explicit (u, v) exchange at width p: the
        // aggregate behind dropDuplicates sees the clustering satisfied
        // and inserts no second, session-default-width shuffle. The
        // bump rides a throwaway string column (dropped post-
        // materialization) so u keeps its exact input type — the
        // String UDF must never coerce a numeric key (review r6)
        .repartition(p, $"u", $"v").dropDuplicates()
        .select($"u", $"v", bump($"u".cast("string")).as("_t"))
        .localCheckpoint()
        .drop("_t")
      converged = cntAcc.value == eCount &&
        ss.join(e, Seq("u", "v"), "left_anti").isEmpty &&
        e.join(ss, Seq("u", "v"), "left_anti").isEmpty
      e = ss
      eCount = cntAcc.value
      i += 1
      }
    }
    localOut match {
      case Some(out) =>
        // i == 0: the union-find ran on the exact (deduped) input graph —
        // exact by construction, nothing to verify. i > 0: the read-off
        // came from contracted edges — keep the original-edge fixpoint
        // gate, same as the distributed exit.
        if (i > 0) assertComponentLabels(
          e0.select($"u".as("src"), $"v".as("dst")), out)
        (out, i)
      case None =>
        // a non-converged edge set is NOT a star per component — the labels
        // read off below would be wrong with no signal (ADVICE r4). 50
        // rounds covers diameter 2^50; hitting the cap means a bug, not a
        // big graph — fail loudly instead of mislabeling.
        require(converged,
          s"large-star/small-star CC did not converge in $maxIter rounds")
        // converged edge set is a star per component: (node → center), with
        // each center mapping to itself
        val out = e.select($"u".as("node"), $"v".as("component"))
          .union(e.select($"v".as("node"), $"v".as("component")))
          .distinct()
          .localCheckpoint()
        // same belt-and-braces exactness gate as run(): the star read-off is
        // verified against the original (deduped, checkpointed) edges, once
        assertComponentLabels(
          e0.select($"u".as("src"), $"v".as("dst")), out)
        (out, i)
    }
  }
}
