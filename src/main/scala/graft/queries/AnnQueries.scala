package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Oracle-parity strategy: dot products and squared norms are accumulated
  * as DECIMAL(38,18) — exact, order-independent sums — then the cosine is
  * assembled in IEEE double with an identical expression tree on both
  * sides, so ranks and 6-dp rounded similarities match bit-for-bit.
  *
  * The library's throughput path (graft.functions.Similarity.topK) uses
  * plain float/double math without the decimal detour (~10× cheaper per
  * element, same broadcast + per-partition-top-k plan); this query is
  * the correctness anchor, and SimilaritySpec pins the two paths to the
  * same ranks on the test corpus.
  */
object AnnQueries {

  /** (vec_id, i [1-based], x [double]) exploded embeddings. */
  private def exploded(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.widened(s, dir, "embeddings")
      .select($"vec_id", posexplode($"embedding").as(Seq("pos", "xf")))
      .select($"vec_id", ($"pos" + 1).cast("int").as("i"), $"xf".cast("double").as("x"))
  }

  private val explodedCte: String =
    """WITH ex AS (
      SELECT vec_id, CAST(i AS INT) AS i, CAST(x AS DOUBLE) AS x FROM (
        SELECT vec_id, unnest(embedding) AS x,
               unnest(range(1, len(embedding)+1)) AS i
        FROM embeddings) t)"""

  val all: Seq[Q] = Seq(
    Q(
      // Brute-force cosine top-5: queries = vec_id < 10, corpus = the rest.
      // Scale path: the bounded query set is collected + broadcast as
      // arrays; each corpus partition computes exact-decimal cosines in a
      // narrow pass and emits only its per-query top-5 (map-side combine),
      // so the final window sees ≤ 5·|queries|·partitions rows. No
      // exploded join on the 64-key dimension index (VERDICT r1 #4).
      "q28_ann_topk",
      (s, dir) => {
        import s.implicits._
        val emb = Tables.widened(s, dir, "embeddings")
          .select($"vec_id", $"embedding").as[(Long, Array[Float])]
        val queries = emb.filter(_._1 < 10).collect().sortBy(_._1)
          .map { case (id, v) => (id, v, DecimalDot.normSq(v)) }
        val qB = s.sparkContext.broadcast(queries)
        val survivors = emb.filter(_._1 >= 10).mapPartitions { it =>
          val qs = qB.value
          val heaps = qs.map(_ => scala.collection.mutable.ArrayBuffer
            .empty[(Long, Double)]) // (c_id, sim), kept sorted best-first
          def better(a: (Long, Double), b: (Long, Double)): Boolean =
            a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
          for ((cid, v) <- it) {
            val nb = DecimalDot.normSq(v)
            var qi = 0
            while (qi < qs.length) {
              val (_, qv, na) = qs(qi)
              val sim = DecimalDot.cosine(DecimalDot.dot(qv, v), na, nb)
              val h = heaps(qi)
              val cand = (cid, sim)
              if (h.length < 5 || better(cand, h.last)) {
                val at = h.indexWhere(e => better(cand, e))
                if (at < 0) h.append(cand) else h.insert(at, cand)
                if (h.length > 5) h.remove(5)
              }
              qi += 1
            }
          }
          heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
            h.map { case (cid, sim) => (qs(qi)._1, cid, sim) }
          }
        }.toDF("q_id", "c_id", "sim")
        val w = Window.partitionBy($"q_id").orderBy($"sim".desc, $"c_id")
        survivors.withColumn("rnk", row_number().over(w))
          .filter($"rnk" <= 5)
          .select($"q_id", $"rnk", $"c_id", round($"sim", 6).as("sim"))
          .orderBy($"q_id", $"rnk")
      },
      Some(s"""$explodedCte,
        nrm AS (SELECT vec_id, SUM(CAST(x*x AS DECIMAL(38,18))) AS nsq FROM ex GROUP BY vec_id),
        dots AS (
          SELECT a.vec_id AS q_id, b.vec_id AS c_id,
                 SUM(CAST(a.x*b.x AS DECIMAL(38,18))) AS dot
          FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < 10 AND b.vec_id >= 10
          GROUP BY a.vec_id, b.vec_id),
        sims AS (
          SELECT q_id, c_id,
            CAST(dot AS DOUBLE)/sqrt(CAST(na.nsq AS DOUBLE)*CAST(nb.nsq AS DOUBLE)) AS sim
          FROM dots JOIN nrm na ON na.vec_id = q_id JOIN nrm nb ON nb.vec_id = c_id)
        SELECT q_id, rnk, c_id, ROUND(sim, 6) AS sim FROM (
          SELECT q_id, c_id, sim,
            ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rnk
          FROM sims) r WHERE rnk <= 5 ORDER BY q_id, rnk""")
    ),
    Q(
      // Random-hyperplane LSH bucketing (the at-scale ANN path): 4 sign
      // bits from deterministic ±1 hyperplanes; exact decimal sums make
      // the sign (and thus the bucket) engine-independent.
      "q29_ann_lsh_buckets",
      (s, dir) => {
        import s.implicits._
        val ex = exploded(s, dir)
        val sums = (0 until 4).map { p =>
          val wgt = when((($"i" * (p + 2)) % 5) < 3, 1.0).otherwise(-1.0)
          sum(($"x" * wgt).cast("decimal(38,18)")).as(s"p$p")
        }
        val agg = ex.groupBy($"vec_id").agg(sums.head, sums.tail: _*)
        val bits = (0 until 4).map(p =>
          when(col(s"p$p") > 0, "1").otherwise("0"))
        agg.withColumn("bucket", concat(bits: _*))
          .withColumn("bucket_size",
            count(lit(1)).over(Window.partitionBy($"bucket")))
          .select($"vec_id", $"bucket", $"bucket_size")
          .orderBy($"vec_id")
      },
      Some({
        val sums = (0 until 4).map(p =>
          s"SUM(CAST(x * (CASE WHEN (i*(${p + 2})) % 5 < 3 THEN 1.0 ELSE -1.0 END) AS DECIMAL(38,18))) AS p$p")
          .mkString(", ")
        val bits = (0 until 4).map(p => s"CASE WHEN p$p > 0 THEN '1' ELSE '0' END").mkString(" || ")
        s"""$explodedCte, agg AS (SELECT vec_id, $sums FROM ex GROUP BY vec_id)
        SELECT vec_id, bucket, COUNT(*) OVER (PARTITION BY bucket) AS bucket_size FROM (
          SELECT vec_id, $bits AS bucket FROM agg) x ORDER BY vec_id"""
      })
    )
  )
}
