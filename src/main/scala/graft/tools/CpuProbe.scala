package graft.tools

import org.apache.spark.sql.SparkSession

/** Pure-CPU scaling calibration: a branch-free integer busy loop with no
  * allocation, no shuffle — upper bound on what ANY job can achieve when
  * scaling local[8] → local[32] on this box (frequency scaling etc.).
  */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.map(_.toLong).getOrElse(400L)
    val levels = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(8, 32, 8, 32)
    for (threads <- levels) {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val s = SparkSession.builder().master(s"local[$threads]")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      import s.implicits._
      def run(): Double = {
        val t0 = System.nanoTime()
        s.range(0, work, 1, threads * 2).map { i =>
          var x = i.longValue(); var k = 0
          while (k < 20000000) { x = x * 6364136223846793005L + 1442695040888963407L; k += 1 }
          x
        }.reduce((a: Long, b: Long) => a ^ b)
        (System.nanoTime() - t0) / 1e9
      }
      run()
      val t = (1 to 3).map(_ => run()).min
      println(f"CPUPROBE threads=$threads%2d t=$t%.2fs")
      s.stop()
    }
  }
}
