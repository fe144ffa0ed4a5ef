package graft.tools

import org.apache.spark.sql.SparkSession

/** A/Bs the kg_entity_canonical entry's CC width policy and exactness
  * machinery on the entry's REAL sameAs graph.
  *
  * HISTORY: the r6/r7 runs of this probe (canon_probe_r7.json) timed an
  * EMPTY graph — the then 3-hex-char bucket key had zero collisions on
  * the 25-word det vocab, so n_edges was 0 and the width-policy A/B
  * measured fixed per-call overhead, not the policy (VERDICT r7
  * What's-wrong #1). The entry now buckets by ONE hex char (non-empty by
  * construction) and this probe REFUSES to produce an artifact on an
  * empty graph (ADVICE r7), so a silent return to vacuity writes no
  * official-looking JSON.
  *
  * Interleaved same-JVM A/B (the StarProbe methodology):
  *   A. CC.run on the entry's REAL edge set with the measured width
  *      (current behavior)
  *   B. same call with widthOverride = session shuffle width (the r5
  *      layout)
  * plus the END-TO-END entry and the exact-convergence fixpoint join,
  * measured in the same session. Each axis gets a warm-up pass; reported
  * numbers are min/all over ≥3 interleaved rounds with per-sample steal
  * jiffies recorded (null = gate unreadable, NOT zero steal).
  */
object CanonProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/canon_probe.json"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the REAL edge set this entry resolves, materialized once so the
    // CC A/B measures the loop, not the upstream link pipeline.
    // Identify ITS checkpoint blocks by diffing the persistent-RDD set
    // around the (eager) localCheckpoint call — edges.rdd.id would be a
    // fresh deserialization RDD, not the id holding the blocks, and a
    // blanket unpersist would destroy the truncated-lineage table
    // irrecoverably (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND).
    val (_, edges0) = graft.queries.KgQueries.entityCanonicalInputs(spark, dir)
    val beforeIds = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val edges = edges0.localCheckpoint()
    var keepIds = spark.sparkContext.getPersistentRDDs.keySet.toSet -- beforeIds
    val nEdges = edges.count()
    require(nEdges > 0,
      "probe input graph is empty — the A/B would measure nothing " +
        "(this exact vacuity shipped as canon_probe_r7.json; see VERDICT r7 #1)")

    // drop everything except the probe's shared edge table (incl. the
    // upstream parse blocks now, and each run's loop internals later)
    def cleanup(): Unit = {
      spark.sparkContext.getPersistentRDDs.foreach { case (id, r) =>
        if (!keepIds.contains(id)) r.unpersist(blocking = false)
      }
      spark.catalog.clearCache()
    }
    cleanup()

    def ccRun(width: Option[Int]): Double = {
      val t0 = System.nanoTime()
      graft.operators.ConnectedComponents.run(spark, edges, widthOverride = width).count()
      val t = (System.nanoTime() - t0) / 1e9
      cleanup()
      t
    }
    def entryRun(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("kg_entity_canonical")(spark, dir).count()
      val t = (System.nanoTime() - t0) / 1e9
      cleanup()
      t
    }

    // the r6 exactness machinery priced separately: one edge-wise
    // fixpoint join (assertComponentLabels) on the converged labels —
    // the cost run() added per call relative to r5's trigger-only loop
    val rawLabels = graft.operators.ConnectedComponents.run(spark, edges)
    val beforeLabels = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val labels = rawLabels.localCheckpoint() // copies out of run()'s internals
    // the shared labels table survives cleanup() like `edges` does;
    // run()'s internal loop checkpoints (pre-snapshot ids) do not
    keepIds ++= spark.sparkContext.getPersistentRDDs.keySet.toSet -- beforeLabels
    cleanup()
    // the resolved components are part of the evidence: non-trivial
    // merges means the A/B timed real label propagation
    val nComponents = labels.select("component").distinct().count()
    val nNodes = labels.count()
    cleanup()
    def verifyRun(): Double = {
      val t0 = System.nanoTime()
      graft.operators.ConnectedComponents.assertComponentLabels(edges, labels)
      val t = (System.nanoTime() - t0) / 1e9
      cleanup()
      t
    }

    val default = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // warm-up pass per axis
    ccRun(None); ccRun(Some(default)); entryRun(); verifyRun()

    val samples = scala.collection.mutable.Map[String, List[(Double, Option[Long])]]().withDefaultValue(Nil)
    for (_ <- 1 to 4) {
      Seq("cc_measured_width" -> (() => ccRun(None)),
          "cc_default_width" -> (() => ccRun(Some(default))),
          "entry_end_to_end" -> (() => entryRun()),
          "fixpoint_assert_join" -> (() => verifyRun())).foreach { case (k, f) =>
        val (t, steal) = HostGauge.stealWindow(f())
        samples(k) ::= (t, steal)
      }
    }
    val rowsJson = samples.toSeq.sortBy(_._1).map { case (k, ss) =>
      val floor = ss.map(_._1).min
      val allS = ss.map(s => f"${s._1}%.3f").reverse.mkString("[", ",", "]")
      // null = gate unreadable (ungated sample), distinct from 0 steal
      val steals = ss.map(_._2.map(_.toString).getOrElse("null")).reverse.mkString("[", ",", "]")
      System.err.println(f"[canon] $k%-18s floor ${floor}%6.3f s  samples $allS  steal $steals")
      f""""$k":{"floor_s":$floor%.3f,"samples_s":$allS,"steal_jiffies":$steals}"""
    }.mkString(",")
    val json = s"""{"dir":"$dir","n_edges":$nEdges,"n_nodes":$nNodes,""" +
      s""""n_components":$nComponents,"session_width":$default,$rowsJson}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    spark.stop()
  }
}
