package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.{Tables, TextQueries}

/** Where does the q37 candidate-generation chain's time go, and does the
  * shuffle WIDTH (session 32 vs data-sized 1) matter once AQE coalescing
  * is active? Times incremental prefixes of the chain, then the full
  * chain under session width vs spark.sql.shuffle.partitions set to a
  * bytes-derived width for the query's duration (the
  * StreamingPipeline.adaptiveStateWidth seam applied to a batch chain).
  *
  * Usage: runMain graft.tools.ChainWidthProbe <sfDir> <n>
  */
object ChainWidthProbe {

  private def md5s(c: org.apache.spark.sql.Column) = md5(c.cast("binary"))

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val n = if (args.length > 1) args(1).toInt else 4
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
    println(f"[chainwidth] io canary read ${r}%8.1f MB/s write ${w}%8.1f MB/s direct=$d")

    val hi = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    def sigs: DataFrame = {
      val tk = TextQueries.tokens(spark, sfDir).withColumn("h", md5s($"word"))
      val bitSums = (0 until 16).map(i =>
        sum(when(substring($"h", i + 1, 1).isin(hi: _*), 1L).otherwise(0L)).as(s"s$i"))
      val agg = tk.groupBy($"doc_id")
        .agg(bitSums.head, (bitSums.tail :+ count(lit(1)).as("n")): _*)
      val bc = (0 until 16).map(i =>
        when(col(s"s$i") * 2 > col("n"), "1").otherwise("0"))
      agg.select($"doc_id", concat(bc: _*).as("sig"))
    }
    def banded: DataFrame = {
      val bands = (0 until 4).map(b =>
        sigs.select($"doc_id", $"sig", lit(b).as("band"),
          substring($"sig", b * 4 + 1, 4).as("bucket")))
      bands.reduce(_ unionByName _)
        .withColumn("bn",
          count(lit(1)).over(Window.partitionBy($"band", $"bucket")))
        .filter($"bn" <= 100)
        .drop("bn")
    }
    def cand: DataFrame = banded.alias("l")
      .join(banded.alias("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("l.sig").as("sa"),
        col("r.doc_id").as("b"), col("r.sig").as("sb"))
    def candD: DataFrame = cand.distinct()
    def full: DataFrame = {
      val hamming = (0 until 16).map(i =>
        when(substring($"sa", i + 1, 1) =!= substring($"sb", i + 1, 1), 1L)
          .otherwise(0L)).reduce(_ + _)
      candD.withColumn("hamming", hamming)
        .filter($"hamming" <= 2)
        .select($"a", $"b", $"hamming")
        .orderBy($"a", $"b")
    }

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    def floor(tag: String, df: => DataFrame): Unit = {
      time(df) // warm
      val ts = (1 to n).map(_ => time(df))
      println(f"[chainwidth] $tag%-22s min ${ts.min}%6.3f runs ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }

    floor("sigs(agg-forced)", sigs.agg(count($"sig"), min($"sig")).toDF())
    floor("banded", banded)
    floor("cand", cand)
    floor("cand.distinct", candD)
    floor("full", full)

    // explicit-repartition variant: measured-width exchanges at the chain
    // heads (no session conf): banding window + band join ride one
    // (band,bucket) exchange at width p; the candidate dedup rides an
    // explicit all-column exchange at width p (the runStar dedup pattern)
    def fullExplicit(p: Int): DataFrame = {
      val bands = (0 until 4).map(b =>
        sigs.select($"doc_id", $"sig", lit(b).as("band"),
          substring($"sig", b * 4 + 1, 4).as("bucket")))
      val bandedE = bands.reduce(_ unionByName _)
        .repartition(p, $"band", $"bucket")
        .withColumn("bn",
          count(lit(1)).over(Window.partitionBy($"band", $"bucket")))
        .filter($"bn" <= 100)
        .drop("bn")
      val candE = bandedE.alias("l")
        .join(bandedE.alias("r"),
          col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
            col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("a"), col("l.sig").as("sa"),
          col("r.doc_id").as("b"), col("r.sig").as("sb"))
        .repartition(p, col("a"), col("sa"), col("b"), col("sb"))
        .dropDuplicates()
      val hamming = (0 until 16).map(i =>
        when(substring($"sa", i + 1, 1) =!= substring($"sb", i + 1, 1), 1L)
          .otherwise(0L)).reduce(_ + _)
      candE.withColumn("hamming", hamming)
        .filter($"hamming" <= 2)
        .select($"a", $"b", $"hamming")
        .orderBy($"a", $"b")
    }
    floor("full-explicit(p=1)", fullExplicit(1))
    floor("full-explicit(p=2)", fullExplicit(2))
    // interleaved same-window pair: plain vs explicit
    val pa = scala.collection.mutable.ArrayBuffer[Double]()
    val pe = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to n) { pa += time(full); pe += time(fullExplicit(1)) }
    println(f"[chainwidth] PAIR plain    min ${pa.min}%6.3f runs ${pa.map(t => f"$t%.3f").mkString(" ")}")
    println(f"[chainwidth] PAIR explicit min ${pe.min}%6.3f runs ${pe.map(t => f"$t%.3f").mkString(" ")}")

    val widthKey = "spark.sql.shuffle.partitions"
    for (wdt <- Seq(8, 1)) {
      def withW(df: => DataFrame): DataFrame = df
      time { spark.conf.set(widthKey, wdt.toString); val x = full; x } // warm
      val ts = (1 to n).map { _ =>
        spark.conf.set(widthKey, wdt.toString)
        val t = time(full)
        spark.conf.set(widthKey, cpus)
        t
      }
      spark.conf.set(widthKey, cpus)
      println(f"[chainwidth] full@width=$wdt%-10s min ${ts.min}%6.3f runs ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    val (r2, w2, d2) = HostGauge.ioCanary()
    println(f"[chainwidth] io canary read ${r2}%8.1f MB/s write ${w2}%8.1f MB/s direct=$d2")
    spark.stop()
  }
}
