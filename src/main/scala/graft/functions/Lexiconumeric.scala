package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** Native Catalyst expression for the reference's "lexiconumeric" sort key
  * (CoNLLRDFFormatter.java:485-492): every digit run is zero-padded to
  * width 64, so ":s1_10" sorts after ":s1_2" under plain binary ordering.
  *
  * A custom Expression (not a UDF) so DataFrame-level sorts of token URIs
  * stay inside whole-stage codegen: `doGenCode` emits a direct static
  * call, no serialization boundary, no Row boxing.
  */
object Lexiconumeric {

  /** Scalar kernel, shared by eval and generated code. */
  def key(s: UTF8String): UTF8String = UTF8String.fromString(keyString(s.toString))

  def keyString(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 64)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        var j = i
        while (j < n && s.charAt(j) >= '0' && s.charAt(j) <= '9') j += 1
        // strip leading zeros of the run, then pad to width 64
        var k = i
        while (k < j - 1 && s.charAt(k) == '0') k += 1
        val digits = j - k
        var p = digits
        while (p < 64) { sb.append('0'); p += 1 }
        sb.append(s, k, j)
        i = j
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  case class LexiconumericKey(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any = key(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Lexiconumeric.key($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "lexiconumeric_key"
  }

  /** Column-level API. */
  def lexiconumeric_key(c: Column): Column =
    Bridge.column(LexiconumericKey(Bridge.expression(c)))

  /** SQL registration: `SELECT lexiconumeric_key(subj) ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lexiconumeric_key", exprs => LexiconumericKey(exprs.head), "scala_udf")
}
