package graft.tools
import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfNgram {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $tag%-28s ${(System.nanoTime()-t0)/1e9}%7.2fs  ($n rows)")
    }
    time("tokens only") { docs.select(explode(TextOps.tokens(col("text")))).count() }
    time("ngrams n=2") { docs.select(explode(TextOps.tokenNgrams(col("text"), 2))).count() }
    time("ngrams n=2 again") { docs.select(explode(TextOps.tokenNgrams(col("text"), 2))).count() }
    time("ngrams n=4") { docs.select(explode(TextOps.tokenNgrams(col("text"), 4))).count() }
    time("posexplode+md5 (substr frame)") {
      Dedup.substringGramFrame(docs, "doc_id", "text", 4).count()
    }
    spark.stop()
  }
}
