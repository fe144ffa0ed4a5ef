package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}

/** Production similarity-search path: plain IEEE float/double math (no
  * decimal detour — that discipline lives in the oracle-anchored queries,
  * graft.queries.DecimalDot) with the scale-safe plan shape:
  *
  *   broadcast the bounded query set as arrays → one narrow pass over the
  *   corpus computing cosines → per-partition top-k heaps (map-side
  *   combine: ≤ k·|queries| rows leave each partition) → tiny final
  *   reduction.
  *
  * No exploded vectors, no join on the dimension index, no shuffle of
  * pairwise scores — the same plan that q28/q31 use, minus the exact-
  * decimal bookkeeping (~10× cheaper per element).
  */
object Similarity {

  def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def normSq(a: Array[Float]): Double = dot(a, a)

  def cosine(a: Array[Float], b: Array[Float]): Double =
    dot(a, b) / math.sqrt(normSq(a) * normSq(b))

  /** Keep the k best (sim desc, id asc) in a small sorted buffer. */
  private[functions] final class TopK(k: Int) {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    private def better(a: (Long, Double), b: (Long, Double)): Boolean =
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
    def offer(id: Long, sim: Double): Unit = {
      val cand = (id, sim)
      if (buf.length < k || better(cand, buf.last)) {
        val at = buf.indexWhere(e => better(cand, e))
        if (at < 0) buf.append(cand) else buf.insert(at, cand)
        if (buf.length > k) buf.remove(k)
      }
    }
  }

  /** Brute-force cosine top-k of a bounded query set against a corpus.
    * Output: (q_id, rnk, c_id, sim), rnk 1-based by (sim desc, c_id). */
  def topK(
      corpus: Dataset[(Long, Array[Float])],
      queries: Array[(Long, Array[Float])],
      k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qB = spark.sparkContext.broadcast(
      queries.map { case (id, v) => (id, v, normSq(v)) })
    val survivors = corpus.mapPartitions { it =>
      val qs = qB.value
      val heaps = qs.map(_ => new TopK(k))
      for ((cid, v) <- it) {
        val nv = normSq(v)
        var qi = 0
        while (qi < qs.length) {
          val (_, qv, qn) = qs(qi)
          heaps(qi).offer(cid, dot(qv, v) / math.sqrt(qn * nv))
          qi += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        h.buf.map { case (cid, sim) => (qs(qi)._1, cid, sim) }
      }
    }.toDF("q_id", "c_id", "sim")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy($"q_id").orderBy($"sim".desc, $"c_id")
    survivors.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= k)
      .select($"q_id", $"rnk", $"c_id", $"sim")
  }
}
