package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.conll.EntityLinker

/** Salted-join skew evidence (VERDICT r6 item 2): the north_rule
  * requires salted-join handling of hot gazetteer keys, and
  * `kg_pipeline_link_salted` gates the machinery for CORRECTNESS (bit-
  * equal to the broadcast regime), but the driver corpora are
  * near-uniform — nothing demonstrated the salt actually flattening a
  * straggler. This probe builds a deterministic mention table where ONE
  * surface ("the") covers 30% of all mentions (the Zipf head a web-scale
  * gazetteer join hits), forces the shuffle-join regime on both sides
  * (autoBroadcastJoinThreshold = -1, as at real gazetteer scale), and
  * interleaves four configs over ≥3 rounds:
  *
  *   unsalted          — the naive shuffle join: every "the" mention
  *                       lands in ONE reducer task (the straggler)
  *   unsalted+AQE-skew — Spark's runtime mitigation (splits oversize
  *                       SMJ partitions post-shuffle)
  *   salted            — EntityLinker.linkSalted: explicit ×16 salt
  *   salted+AQE-skew   — the production setting (complementary)
  *
  * Reported per config: warm-floor wall seconds, max/p50/p99 task ms
  * (from a TaskEnd listener — max/p50 IS the skew), and an output
  * checksum (count + sum of xxhash64 over the link rows) asserted
  * identical across all four — the salt must change the schedule, never
  * the answer. Deterministic generation (modular arithmetic, no RNG).
  */
object SkewProbe {

  private final class TaskTimes extends SparkListener {
    // boxed: ConcurrentLinkedQueue[scala.Long] would unbox poll()'s
    // empty-queue null to 0L and the drain loop could never terminate
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      buf.add(t.taskInfo.duration)
    def drain(): Seq[Long] = {
      val out = scala.collection.mutable.ArrayBuffer[Long]()
      var v = buf.poll()
      while (v != null) { out += v.longValue; v = buf.poll() }
      out.toSeq
    }
  }

  /** Block until the listener bus has delivered all queued events.
    * Preferred path: LiveListenerBus.waitUntilEmpty() (private[spark],
    * public at bytecode level → reflective call). Fallback when the
    * accessor is absent: poll until the bus reports a stable state —
    * three consecutive 100 ms windows with no new TaskEnd deliveries to
    * OUR listener (capped at 10 s). */
  private def awaitListenerQuiescence(spark: SparkSession, listener: TaskTimes): Unit = {
    val sc = spark.sparkContext
    val viaBus = scala.util.Try {
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
    }
    if (viaBus.isFailure) {
      var stable = 0
      var last = listener.buf.size
      var waited = 0
      while (stable < 3 && waited < 10000) {
        Thread.sleep(100); waited += 100
        val now = listener.buf.size
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/skew_probe.json")
    val nMentions = 20000000L
    val nSurfaces = 9999L

    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      // the regime under test: a gazetteer too big to broadcast — force
      // the shuffle join everywhere (static + adaptive thresholds)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 30% of mentions share the hot surface; the rest spread uniformly
    // over nSurfaces cold surfaces via a Knuth multiplicative scatter
    val dir = "/tmp/graft-skew-mentions-v1"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      spark.range(0, nMentions, 1, 64)
        .select(
          concat(lit("d"), ($"id" / 1000).cast("long")).as("doc_id"),
          lit(1).as("sent"),
          concat(lit("m"), $"id").as("subj"),
          lit("conll:WORD").as("pred"),
          when(pmod($"id", lit(10)) < 3, lit("the"))
            .otherwise(concat(lit("w"), pmod($"id" * 2654435761L, lit(nSurfaces)))).as("obj"))
        .write.mode("overwrite").parquet(dir)
    }
    val triples = spark.read.parquet(dir)
    val gaz = spark.range(0, nSurfaces).select(concat(lit("w"), $"id").as("word"))
      .union(Seq("the").toDF("word"))
    val gazetteer = EntityLinker.gazetteerFromVocab(gaz).localCheckpoint()

    // the unsalted shuffle join: the same mention projection linkSalted
    // uses, joined on the raw surface — one reducer owns the hot key
    def unsalted(): org.apache.spark.sql.DataFrame =
      triples.filter($"pred" === "conll:WORD")
        .select($"doc_id", $"sent", $"subj", lower($"obj").as("surface"))
        .join(gazetteer, "surface")
        .select($"doc_id", $"sent", $"subj",
          lit("conll:ENTITY").as("pred"), $"entity_id".as("obj"))
    def salted(): org.apache.spark.sql.DataFrame =
      EntityLinker.linkSalted(triples, gazetteer, saltBuckets = 16)
        .select($"doc_id", $"sent", $"subj", $"pred", $"obj")

    val listener = new TaskTimes
    spark.sparkContext.addSparkListener(listener)

    // count + order-invariant checksum in ONE action over the join output
    def runOnce(df: org.apache.spark.sql.DataFrame): (Double, Long, Long, Seq[Long]) = {
      listener.drain()
      val t0 = System.nanoTime()
      // bit_xor, not sum: ANSI mode makes sum() of 20M 64-bit hashes an
      // ARITHMETIC_OVERFLOW; xor is order-invariant and cannot overflow.
      // (Multiset caveat — xor cancels duplicate pairs — is covered by
      // the exact row count beside it plus distinct subj ids.)
      val row = df.agg(count(lit(1)), expr("bit_xor(xxhash64(subj, obj))")).head()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      // block until TaskEnd events have drained through the bus — a
      // fixed sleep dropped late events from this config's percentiles
      // and leaked them into the NEXT config's skew evidence under load
      // (ADVICE r7)
      awaitListenerQuiescence(spark, listener)
      (wall, row.getLong(0), row.getLong(1), listener.drain())
    }

    final case class Cfg(name: String, skewJoin: Boolean, mk: () => org.apache.spark.sql.DataFrame)
    val cfgs = Seq(
      Cfg("unsalted", skewJoin = false, unsalted _),
      Cfg("unsalted_aqe_skew", skewJoin = true, unsalted _),
      Cfg("salted16", skewJoin = false, salted _),
      Cfg("salted16_aqe_skew", skewJoin = true, salted _))

    def measure(c: Cfg): (Double, Long, Long, Seq[Long]) = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", c.skewJoin.toString)
      runOnce(c.mk())
    }

    cfgs.foreach(measure) // warm-up pass (JIT + page cache), unrecorded
    val rounds = 3
    val samples = (1 to rounds).flatMap(_ => cfgs.map(c => c.name -> measure(c)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap

    // the answer must be identical across every config and round
    val checksums = samples.values.flatten.map(r => (r._2, r._3)).toSet
    require(checksums.size == 1,
      s"salted/unsalted outputs diverged: $checksums — the salt changed the answer")

    def pct(xs: Seq[Long], p: Double): Long =
      if (xs.isEmpty) 0L else xs.sorted.apply(math.min(xs.size - 1, (p * xs.size).toInt))
    val rowsJson = cfgs.map { c =>
      val ss = samples(c.name)
      val wall = ss.map(_._1).min
      // task skew from the fastest round (the warm floor's schedule)
      val best = ss.minBy(_._1)._4
      val mx = if (best.isEmpty) 0L else best.max
      System.err.println(f"[skew] ${c.name}%-18s wall ${wall}%6.2f s  max task ${mx}%6d ms  p50 ${pct(best, 0.5)}%5d ms  tasks ${best.size}%4d")
      f""""${c.name}":{"wall_s":$wall%.3f,"max_task_ms":$mx,"p50_task_ms":${pct(best, 0.5)},""" +
        f""""p99_task_ms":${pct(best, 0.99)},"n_tasks":${best.size},"rounds":$rounds}"""
    }.mkString(",")
    val (nOut, chk) = checksums.head
    val json = s"""{"n_mentions":$nMentions,"hot_fraction":0.3,"n_surfaces":${nSurfaces + 1},""" +
      s""""out_rows":$nOut,"out_checksum":$chk,$rowsJson}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    spark.stop()
  }
}
