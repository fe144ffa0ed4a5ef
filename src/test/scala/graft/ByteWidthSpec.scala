package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Tables

/** Tables.byteWidth policy pins (r9): the measured-byte width for the
  * candidate-generation chains must follow DATA, never the session's
  * core count — width = ceil(source bytes / target), floor 1, cap 4×
  * parallelism, conf-disable lever at ≤ 0. The chains' RESULTS are
  * width-invariant (the oracle gate covers that); this spec pins the
  * routing itself so a future edit can't silently turn the policy into
  * a constant.
  */
class ByteWidthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"
  private val key = "spark.graft.sql.targetPartitionBytes"

  private def srcBytes(name: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles).getOrElse(Array.empty[java.io.File]).map(walk).sum
    walk(new java.io.File(s"$dir/$name.parquet"))
  }

  test("default 64 MB target: small local tables get width 1") {
    spark.conf.unset(key)
    assert(Tables.byteWidth(spark, dir, "documents") == 1)
    assert(Tables.byteWidth(spark, dir, "embeddings") == 1)
  }

  test("width scales with bytes/target and caps at 4x parallelism") {
    val bytes = srcBytes("documents")
    assert(bytes > 0)
    // target = half the table: exactly 2 partitions
    spark.conf.set(key, (bytes / 2 + 1).toString)
    assert(Tables.byteWidth(spark, dir, "documents") == 2)
    // tiny target: the 4x-parallelism cap binds (the 100 TB regime —
    // width is full, data-derived, not core-count-derived)
    spark.conf.set(key, "1")
    assert(Tables.byteWidth(spark, dir, "documents") ==
      spark.sparkContext.defaultParallelism * 4)
    spark.conf.unset(key)
  }

  test("target <= 0 disables (callers keep the implicit session-width shape)") {
    spark.conf.set(key, "-1")
    assert(Tables.byteWidth(spark, dir, "documents") == 0)
    spark.conf.set(key, "0")
    assert(Tables.byteWidth(spark, dir, "documents") == 0)
    spark.conf.unset(key)
  }
}
