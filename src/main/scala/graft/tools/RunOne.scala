package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Time selected queries end-to-end (plan + execute + collect count),
 *  for single-operator iteration without the full bench sweep. Usage:
 *  runMain graft.tools.RunOne [sfDir] [query ...]  (repeats each twice:
 *  cold then warm, so JIT/codegen warmup is visible instead of hidden). */
object RunOne {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q1_pricing_summary")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-runone")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      var pass = 0
      while (pass < 2) {
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(n)(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[runone] $n%-28s pass=$pass $sec%7.2fs  ($rows rows)")
        pass += 1
      }
    }
    spark.stop()
  }
}
