package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Measurement-only A/B for the LSH pair chain rewrite (round 6): the
  * OLD exploded formulation (window-lead shingles → distinct → grouped
  * minhash → explode-join-regroup verify) is re-created INLINE here so
  * both variants run interleaved in one JVM — the only honest comparison
  * on this throttling host. The production chain lives in DedupQueries;
  * this copy exists solely to time the formulation it replaced.
  */
object LshProbe {
  private def md5s(c: org.apache.spark.sql.Column) = md5(c.cast("binary"))

  /** The r5 exploded formulation, verbatim semantics. */
  private def oldPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"doc_id").orderBy($"tok")
    val shingles = graft.queries.TextQueries.tokens(s, dir)
      .withColumn("w2", lead($"word", 1).over(w))
      .withColumn("w3", lead($"word", 2).over(w))
      .filter($"w3".isNotNull)
      .select($"doc_id", concat_ws(" ", $"word", $"w2", $"w3").as("shingle"))
    val sets = shingles.distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mhAggs = (0 until 8).map(j =>
      min(md5s(concat(lit(s"$j|"), col("shingle")))).as(s"mh$j"))
    val mh = sets.groupBy($"doc_id").agg(mhAggs.head, mhAggs.tail: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = (0 until 8).map { j =>
      mh.select($"doc_id", lit(j).as("band"), col(s"mh$j").as("bucket"))
    }
    val wB = Window.partitionBy($"band", $"bucket")
    val banded = bands.reduce(_ unionByName _)
      .withColumn("bn", count(lit(1)).over(wB))
      .filter($"bn" <= 100).drop("bn")
    val candidates = banded.alias("l").join(banded.alias("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .distinct()
    val sizes = sets.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter = candidates
      .join(sets.select($"doc_id".as("a"), $"shingle"), "a")
      .join(sets.select($"doc_id".as("b"), $"shingle".as("sh2")), "b")
      .filter($"shingle" === $"sh2")
      .groupBy($"a", $"b").agg(count(lit(1)).as("inter"))
    candidates.join(inter, Seq("a", "b"), "left_outer")
      .na.fill(0L, Seq("inter"))
      .join(sizes.select($"doc_id".as("a"), $"n".as("na")), "a")
      .join(sizes.select($"doc_id".as("b"), $"n".as("nb")), "b")
      .withColumn("jaccard", round($"inter" / ($"na" + $"nb" - $"inter"), 6))
      .select($"a", $"b", $"inter", $"jaccard")
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      val secs = (System.nanoTime() - t0) / 1e9
      // cache teardown OUTSIDE the timed region: the old formulation
      // holds two persists to the new one's single, so timing the clear
      // would bias the A/B in the rewrite's favor (review r6)
      spark.sharedState.cacheManager.clearCache()
      System.err.println(f"[lsh] $label%-12s $secs%6.2f s  ($n rows)")
    }

    (1 to 4).foreach { k =>
      System.err.println(s"[lsh] --- pass $k (interleaved; cache cleared per run) ---")
      t("old (r5)") { oldPairs(spark, dir).count() }
      t("new (r6)") {
        graft.SparkEntry.queries("q22_lsh_jaccard")(spark, dir).count()
      }
    }
    spark.stop()
  }
}
