package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.{Tables, TextQueries}

/** A/B probe for the q23/q37 simhash SIGNATURE computation (r9): the
  * shipped form explodes one row per token and re-groups per doc (the
  * hash-aggregate pays the exploded row stream + one exchange of (doc,
  * 17 partial sums)); the candidate form computes the same 16 bit-sums
  * narrowly per document row with size(filter(transform(...)))
  * — the q44/q21 "per-doc work is a per-row computation" lesson. Both
  * feed the identical banding + hamming chain; the probe times the FULL
  * q37 shape under noop-style counts, alternating formulations in one
  * session, and first asserts bit-identical signature tables.
  *
  * Usage: runMain graft.tools.SigProbe <sfDir> <n>
  */
object SigProbe {

  private def md5s(c: org.apache.spark.sql.Column) = md5(c.cast("binary"))

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val n = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val (r, w, d) = HostGauge.ioCanary()
    println(f"[sigprobe] io canary read ${r}%8.1f MB/s write ${w}%8.1f MB/s direct=$d")

    val hi = Seq("8", "9", "a", "b", "c", "d", "e", "f")

    // A: shipped — exploded tokens, grouped bit sums
    def sigsGrouped(bits: Int): DataFrame = {
      val tk = TextQueries.tokens(spark, sfDir).withColumn("h", md5s($"word"))
      val bitSums = (0 until bits).map(i =>
        sum(when(substring($"h", i + 1, 1).isin(hi: _*), 1L).otherwise(0L)).as(s"s$i"))
      val agg = tk.groupBy($"doc_id")
        .agg(bitSums.head, (bitSums.tail :+ count(lit(1)).as("n")): _*)
      val bc = (0 until bits).map(i =>
        when(col(s"s$i") * 2 > col("n"), "1").otherwise("0"))
      agg.select($"doc_id", concat(bc: _*).as("sig"))
    }

    // B: narrow — per-doc bit sums from the token array, no explode/agg
    def sigsNarrow(bits: Int): DataFrame = {
      val hiSet = hi.map("'" + _ + "'").mkString("(", ",", ")")
      val sumCols = (0 until bits).map(i =>
        expr(s"size(filter(hs, h -> substring(h, ${i + 1}, 1) in $hiSet))")
          .cast("long").as(s"s$i"))
      val base = Tables.widened(spark, sfDir, "documents")
        .select($"doc_id", expr(
          "transform(split(text, '\\\\s+'), w -> md5(cast(w as binary)))").as("hs"))
        .select($"doc_id" +: size($"hs").cast("long").as("n") +: sumCols: _*)
      val bc = (0 until bits).map(i =>
        when(col(s"s$i") * 2 > col("n"), "1").otherwise("0"))
      base.select($"doc_id", concat(bc: _*).as("sig"))
    }

    // exactness: identical signature tables at 8 and 16 bits
    for (bits <- Seq(8, 16)) {
      val a = sigsGrouped(bits).orderBy($"doc_id").collect()
      val b = sigsNarrow(bits).orderBy($"doc_id").collect()
      require(a.length == b.length && a.zip(b).forall { case (x, y) => x == y },
        s"signature mismatch at $bits bits")
      println(s"[sigprobe] $bits-bit signatures identical over ${a.length} docs")
    }

    // full q37 chain parameterized by the signature source
    def q37Chain(sigs: DataFrame): DataFrame = {
      val bands = (0 until 4).map(b =>
        sigs.select($"doc_id", $"sig", lit(b).as("band"),
          substring($"sig", b * 4 + 1, 4).as("bucket")))
      val banded = bands.reduce(_ unionByName _)
        .withColumn("bn",
          count(lit(1)).over(Window.partitionBy($"band", $"bucket")))
        .filter($"bn" <= 100)
        .drop("bn")
      val cand = banded.alias("l")
        .join(banded.alias("r"),
          col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
            col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("a"), col("l.sig").as("sa"),
          col("r.doc_id").as("b"), col("r.sig").as("sb"))
        .distinct()
      val hamming = (0 until 16).map(i =>
        when(substring($"sa", i + 1, 1) =!= substring($"sb", i + 1, 1), 1L)
          .otherwise(0L)).reduce(_ + _)
      cand.withColumn("hamming", hamming)
        .filter($"hamming" <= 2)
        .select($"a", $"b", $"hamming")
        .orderBy($"a", $"b")
    }

    def time(tag: String, df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }

    // warmup both shapes once, then alternate
    time("warmA", q37Chain(sigsGrouped(16)))
    time("warmB", q37Chain(sigsNarrow(16)))
    val as = scala.collection.mutable.ArrayBuffer[Double]()
    val bs = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to n) {
      as += time("A", q37Chain(sigsGrouped(16)))
      bs += time("B", q37Chain(sigsNarrow(16)))
    }
    // and the sig stage alone (count prunes, so force all columns via agg)
    val sa = scala.collection.mutable.ArrayBuffer[Double]()
    val sb = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to n) {
      sa += time("sigA", sigsGrouped(16).agg(count($"sig"), min($"sig")))
      sb += time("sigB", sigsNarrow(16).agg(count($"sig"), min($"sig")))
    }
    println(f"[sigprobe] q37 chain  grouped min ${as.min}%6.3f runs ${as.map(t => f"$t%.3f").mkString(" ")}")
    println(f"[sigprobe] q37 chain  narrow  min ${bs.min}%6.3f runs ${bs.map(t => f"$t%.3f").mkString(" ")}")
    println(f"[sigprobe] sig stage  grouped min ${sa.min}%6.3f runs ${sa.map(t => f"$t%.3f").mkString(" ")}")
    println(f"[sigprobe] sig stage  narrow  min ${sb.min}%6.3f runs ${sb.map(t => f"$t%.3f").mkString(" ")}")
    val (r2, w2, d2) = HostGauge.ioCanary()
    println(f"[sigprobe] io canary read ${r2}%8.1f MB/s write ${w2}%8.1f MB/s direct=$d2")
    spark.stop()
  }
}
