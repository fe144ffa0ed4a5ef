package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: break kg_eval_possynt into stages to find the hot part. */
object EvalProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.conll._
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n)")
    }
    val parsed = () => Pipeline.parse(graft.queries.KgOracle.detDocs(spark, dir), graft.queries.KgOracle.detCols)
    t("cascade 1")(Pipeline.triples(Pipeline.rewrite(parsed(), Pipeline.analyzeCascade)).count())
    t("cascade 2")(Pipeline.triples(Pipeline.rewrite(parsed(), Pipeline.analyzeCascade)).count())
    def tri = Pipeline.triples(Pipeline.rewrite(parsed(), Pipeline.analyzeCascade)).toDF()
    t("agg 1")(Serializers.evalPossyntSelect(tri).count())
    t("agg 2")(Serializers.evalPossyntSelect(tri).count())
    t("agg 3")(Serializers.evalPossyntSelect(tri).count())
    t("cascade 3")(Pipeline.triples(Pipeline.rewrite(parsed(), Pipeline.analyzeCascade)).count())
    spark.stop()
  }
}
