import org.apache.spark.sql.SparkSession
import graft.conll._
object ExplainTest {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]").config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val docs = DocGen.docs(s, 10)
    val plan = Pipeline.triples(Pipeline.rewrite(Pipeline.parse(docs, DocGen.columns), Pipeline.analyzeCascade))
    plan.explain("formatted")
  }
}
