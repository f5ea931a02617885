package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the IVF ANN stages (train / assign / probe /
 *  rank), each timed in isolation. This is the harness that caught the
 *  interpreted-HOF and Seq-indexing pathologies fixed in Similarity. */
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
      println(f"[prof] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    e.count()
    val q = e.where(col("vec_id") < 8)
    val cents = time("train")(
      Similarity.ivfTrain(e, "vec_id", "embedding", nCells = 32))
    val assigned = Similarity.ivfAssign(e, "vec_id", "embedding", cents)
    // count() prunes the assignment projection — force it via agg
    time("assign (forced)")(
      assigned.agg(sum(col("cell"))).collect())
    val cand = Similarity.ivfCandidatesFromIndex(
      assigned, "vec_id", cents, q, "vec_id", "embedding", nProbe = 6)
    time("probe")(println("cand=" + cand.count()))
    val full = Similarity.ivfTopK(e, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5, nCells = 32, nProbe = 6)
    time("full ivfTopK")(full.count())
    spark.stop()
  }
}
