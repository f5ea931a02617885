package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for ivfTopK phases. */
object ProfileIvf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-ivf-prof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag%-18s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    e.count()
    for (it <- Seq(0, 2)) {
      val res = time(s"ivf iters=$it") {
        Similarity.ivfTopK(e, "vec_id", "embedding",
          e.where(col("vec_id") < 8), "vec_id", "embedding", k = 5,
          nCells = 32, nProbe = 6, iters = it)
      }
      time(s"  count it=$it")(res.count())
    }
    spark.stop()
  }
}
