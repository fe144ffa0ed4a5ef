package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.Lexiconumeric._

class LexiconumericSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("scalar kernel pads digit runs to 64 and strips leading zeros") {
    assert(keyString(":s1_2") < keyString(":s1_10"))
    assert(keyString(":s2_1") > keyString(":s1_99"))
    assert(keyString("a007b") == keyString("a7b")) // leading zeros normalized
    assert(keyString("abc") == "abc")
  }

  test("expression evaluates identically under codegen and sorts correctly") {
    import spark.implicits._
    val df = Seq(":s1_10", ":s1_2", ":s1_1", ":s10_1", ":s2_1").toDF("subj")
    val sorted = df.orderBy(lexiconumeric_key($"subj")).as[String].collect().toSeq
    assert(sorted == Seq(":s1_1", ":s1_2", ":s1_10", ":s2_1", ":s10_1"))
    // stays inside whole-stage codegen (no CodegenFallback in the plan)
    val plan = df.select(lexiconumeric_key($"subj")).queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"))
  }

  test("SQL registration works") {
    import spark.implicits._
    Lexiconumeric.register(spark)
    Seq(":s1_10", ":s1_2").toDF("s").createOrReplaceTempView("lex_t")
    val r = spark.sql("SELECT s FROM lex_t ORDER BY lexiconumeric_key(s)")
      .as[String].collect().toSeq
    assert(r == Seq(":s1_2", ":s1_10"))
  }

  test("null-safe: null input yields null") {
    import spark.implicits._
    val df = Seq(Some(":s1_1"), None).toDF("s")
      .select(lexiconumeric_key($"s").as("k"))
    assert(df.filter($"k".isNull).count() == 1)
  }
}
