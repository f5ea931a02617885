package graft.tools

import graft.model._
import graft.streaming.CdcPipeline
import graft.table._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiler for the cdc_index_merge / dedup_minhash_incr bench
 *  regressions: times each phase of the entries in isolation. */
object ProfIdx {
  private def ph[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$d/region.parquet").count()

    val eventTableSchema = SchemaDsl.struct(
      "user_id" -> "int64", "event_id" -> "int64",
      "event_type" -> "string", "value" -> "float64")
    def freshDir(tag: String): String =
      java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/t"
    def events = Fixtures.eventsMicros(spark, d)

    val cfg = TableConfig(memSliceSize = 4096, walEnabled = false,
      indexMergeFileCountThreshold = 4)
    val table = ph("create")(GraftTable.create(spark, freshDir("prof"),
      eventTableSchema, Identity.Keys(Seq("user_id")), cfg))
    val ev = events.select(lit("u").as("_op"), col("event_id").as("_lsn"),
      col("user_id"), col("event_id"), col("event_type"), col("value"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mm = ph("minmax")(ev.agg(min(col("_lsn")), max(col("_lsn"))).head())
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val span = (hi - lo) / 5 + 1
    (0 until 5).foreach { i =>
      ph(s"applyBatch $i")(CdcPipeline.applyBatch(table, ev.where(
        col("_lsn") >= lo + i * span && col("_lsn") < lo + (i + 1) * span)))
    }
    ev.unpersist()
    System.err.println(s"[prof] indexFiles=${table.currentManifest.indexFiles.size}")
    val boundary = ph("boundary")(events.agg(max(col("event_id"))).head().getLong(0))
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
    val last = events.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
    ph("delete batch")(CdcPipeline.applyBatch(table, last
      .where(col("event_type") === "purchase")
      .select(lit("d").as("_op"),
        (lit(boundary) + col("user_id")).as("_lsn"),
        col("user_id"), lit(null).cast("long").as("event_id"),
        lit(null).cast("string").as("event_type"),
        lit(null).cast("double").as("value"))))
    ph("read+count")(table.read(None).count())
    spark.stop()
  }
}
