package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement-only A/B for the round-6 ConnectedComponents exchange
  * rework: the r5 round bodies (per-round re-shuffles, mid-round ori
  * distinct, per-round sym exchange in run()) are re-created INLINE so
  * old and new run interleaved in one JVM — the only honest comparison
  * on this throttling host. Production code lives in
  * operators/ConnectedComponents; these copies exist solely to time the
  * formulation they replaced, and results are asserted identical.
  */
object StarProbe {

  /** r5 runStar round body (no shared exchanges, mid-round distinct). */
  private def oldRunStar(spark: SparkSession, edges: DataFrame, maxIter: Int = 50): (DataFrame, Int) = {
    import spark.implicits._
    var e = edges.select($"src".as("u"), $"dst".as("v"))
      .filter($"u" =!= $"v").distinct().localCheckpoint()
    var eCount = e.count()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val sym = e.select($"u", $"v").union(e.select($"v".as("u"), $"u".as("v")))
      val mins = sym.groupBy($"u").agg(min($"v").as("mv"))
        .select($"u", least($"mv", $"u").as("m"))
      val ls = sym.filter($"v" > $"u").join(mins, "u")
        .select($"v".as("u"), $"m".as("v"))
      val ori = ls.select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
        .distinct()
      val mins2 = ori.groupBy($"u").agg(min($"v").as("m"))
      val cntAcc = spark.sparkContext.longAccumulator(s"old_star_$i")
      val bump = udf { (u: String) => cntAcc.add(1); u }
      val ss = ori.join(mins2, "u")
        .select($"v".as("u"), $"m".as("v"))
        .union(mins2.select($"u", $"m".as("v")))
        .filter($"u" =!= $"v").distinct()
        .select(bump($"u").as("u"), $"v")
        .localCheckpoint()
      converged = cntAcc.value == eCount &&
        ss.join(e, Seq("u", "v"), "left_anti").isEmpty &&
        e.join(ss, Seq("u", "v"), "left_anti").isEmpty
      e = ss
      eCount = cntAcc.value
      i += 1
    }
    require(converged, "old runStar did not converge")
    (e.select($"u".as("node"), $"v".as("component"))
      .union(e.select($"v".as("node"), $"v".as("component")))
      .distinct().localCheckpoint(), i)
  }

  /** r5 run() loop (sym not pre-partitioned on the join key). */
  private def oldRun(spark: SparkSession, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    import spark.implicits._
    val sym = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
      .filter($"src" =!= $"dst").distinct().localCheckpoint()
    var labels = sym.groupBy($"src").agg(min($"dst").as("m"))
      .select($"src".as("node"), least($"src", $"m").as("lbl"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val prev = labels
      val prop = labels.join(sym, labels("node") === sym("src"))
        .select(sym("dst").as("node"), labels("lbl"))
      val changedAcc = spark.sparkContext.longAccumulator(s"old_cc_$i")
      val bump = udf { (l: String, o: String) =>
        if (o == null || l != o) changedAcc.add(1)
        l
      }
      val next = labels.select($"node", $"lbl", $"lbl".as("old"))
        .union(prop.withColumn("old", lit(null).cast("string")))
        .groupBy($"node").agg(min($"lbl").as("lbl"), max($"old").as("old"))
        .select($"node", bump($"lbl", $"old").as("lbl"))
        .localCheckpoint()
      converged = changedAcc.value == 0 &&
        next.join(prev, Seq("node", "lbl"), "left_anti").isEmpty
      labels = next
      i += 1
    }
    require(converged, "old run did not converge")
    labels.select($"node", $"lbl".as("component"))
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROBE_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // q42's edge set: per-source doc chains (the high-round-count shape)
    val d = graft.queries.Tables.documents(spark, dir).select($"doc_id", $"source")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"doc_id")
    val chainEdges = d.withColumn("nxt", lead($"doc_id", 1).over(w))
      .filter($"nxt".isNotNull)
      .select($"doc_id".as("src"), $"nxt".as("dst"))
      .localCheckpoint()

    // short-diameter star graph (every doc → its source's min doc):
    // the entity-canonicalization shape run() is built for — converges
    // in a couple of rounds, so the per-round cost is what's measured
    val starEdges = d.withColumn("m", min($"doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"source")))
      .filter($"doc_id" =!= $"m")
      .select($"doc_id".as("src"), $"m".as("dst"))
      .localCheckpoint()

    def t(label: String)(f: => (Long, Int)): Unit = {
      val t0 = System.nanoTime()
      val (n, rounds) = f
      System.err.println(f"[star] $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n labels, $rounds rounds)")
    }

    (1 to 3).foreach { k =>
      System.err.println(s"[star] --- pass $k (interleaved) ---")
      t("runStar old (r5)") {
        val (out, r) = oldRunStar(spark, chainEdges); (out.count(), r)
      }
      t("runStar new (r6)") {
        val (out, r) = graft.operators.ConnectedComponents
          .runStarStats(spark, chainEdges)
        (out.count(), r)
      }
      // run() is deliberately NOT timed on the chain set: min-label
      // needs diameter-many rounds and these chains exceed the 50-round
      // budget — the exact reason q42 resolves chains with runStar. Its
      // A/B runs on the short-diameter star graph below.
      t("run     old (r5)") { (oldRun(spark, starEdges).count(), -1) }
      t("run     new (r6)") {
        (graft.operators.ConnectedComponents.run(spark, starEdges).count(), -1)
      }
    }
    // equality spot-check: old and new must produce identical label maps
    val a = oldRunStar(spark, chainEdges)._1
    val b = graft.operators.ConnectedComponents.runStarStats(spark, chainEdges)._1
    require(a.join(b, Seq("node", "component"), "left_anti").isEmpty &&
      b.join(a, Seq("node", "component"), "left_anti").isEmpty,
      "old/new runStar labels differ")
    System.err.println("[star] old/new labels identical")
    spark.stop()
  }
}
