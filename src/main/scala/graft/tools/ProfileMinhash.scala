package graft.tools

import graft.operators.{Dedup, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for minhashPairs phases: shingle hashing,
 *  signatures, band self-join, verification join. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-minhash-prof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val df = spark.read.parquet(s"$dir/documents.parquet")
    df.count()
    val t = df.select(col("doc_id").as("id"),
      Dedup.hashedShingles(TextOps.normTokens(col("text")), 2)
        .as("hs")).where(size(col("hs")) > 0)
    time("shingle-hash pass")(t.count())
    time("shingle-hash pass2")(t.count())
    val sigs = t.withColumn("sig", Dedup.minhashSignature(col("hs"), 64))
    time("signatures")(sigs.count())
    time("signatures pass2")(sigs.count())
    for (p <- Seq(0, 1)) {
      val full = Dedup.minhashPairs(df, "doc_id", "text",
        shingleN = 2, numHashes = 64, bands = 16, minMilli = 200)
      time(s"full pass=$p")(full.count())
    }
    spark.stop()
  }
}
