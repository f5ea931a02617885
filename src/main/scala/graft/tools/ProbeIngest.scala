package graft.tools

import graft.model._
import graft.streaming.CdcPipeline
import graft.table._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Warm-JVM harness for the 1M-event ingest probe: repeats Bench's
 *  ingest1m shape on fresh tables so phase timings (GRAFT_PROF=1) and
 *  totals can be compared without cold-start noise. */
object ProbeIngest {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    // arg 3: target row count (default 1M) — 10M runs measure MARGINAL
    // throughput linearity (does the per-row cost hold at 10x the
    // batch?), the per-round bench only records the 1M point
    val target = args.lift(2).map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val base = spark.read.schema(sch).parquet(s"$dir/events.parquet")
    val n = base.count()
    val copies = math.min(200, math.max(1, (target / math.max(1L, n)).toInt))
    val big = (0 until copies).map { i =>
      base.select(lit("u").as("_op"), (col("event_id") + i * n).as("_lsn"),
        (col("user_id") + i * 1000000L).as("user_id"),
        (col("event_id") + i * n).as("event_id"),
        col("event_type"), col("value"))
    }.reduce(_ unionByName _).persist()
    val rows = big.count()
    (1 to reps).foreach { r =>
      val table = GraftTable.create(spark,
        java.nio.file.Files.createTempDirectory("probe-ingest").toString + "/t",
        SchemaDsl.struct("user_id" -> "int64", "event_id" -> "int64",
          "event_type" -> "string", "value" -> "float64"),
        Identity.Keys(Seq("user_id")),
        TableConfig(memSliceSize = 4096, walEnabled = false))
      val t0 = System.nanoTime()
      CdcPipeline.applyBatch(table, big)
      println(f"[probe-ingest] rep $r: ${(System.nanoTime() - t0) / 1e9}%.3f s ($rows rows)")
      table.drop()
    }
    spark.stop()
  }
}
