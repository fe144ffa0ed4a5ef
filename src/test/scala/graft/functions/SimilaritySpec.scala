package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The float throughput path must agree with the exact-decimal anchor
  * (q28's ranks) on the test corpus: decimal vs double cosines differ
  * only at ~1e-15, far below the rank-separating gaps of real data. */
class SimilaritySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("float top-k ranks agree with the exact-decimal oracle path (q28)") {
    import spark.implicits._
    val emb = graft.queries.Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
    val queries = emb.filter(_._1 < 10).collect().sortBy(_._1)
    val corpus = emb.filter(_._1 >= 10)

    val fast = Similarity.topK(corpus, queries, k = 5)
      .select($"q_id", $"rnk", $"c_id")
      .as[(Long, Int, Long)].collect().toSet

    val exact = graft.SparkEntry.queries("q28_ann_topk")(spark, dir)
      .select($"q_id", $"rnk", $"c_id")
      .as[(Long, Int, Long)].collect().toSet

    assert(fast == exact)
  }

  test("cosine of a vector with itself is 1 within float error") {
    val v = Array.tabulate(64)(i => (math.sin(i + 1) * 3).toFloat)
    assert(math.abs(Similarity.cosine(v, v) - 1.0) < 1e-12)
  }
}
