package graft.tools

import graft.model._
import graft.streaming.CdcPipeline
import graft.table._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the distributed CDC ingest path (not part of
 *  the driver contract; safe to delete). */
object ProfileCdc {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val tableSchema = SchemaDsl.struct(
      "user_id" -> "int64", "event_id" -> "int64",
      "event_type" -> "string", "value" -> "float64")
    // warm up the JVM/Spark first
    spark.read.schema(sch).parquet(s"$dir/events.parquet").count()

    val table = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("prof").toString + "/t",
      tableSchema, Identity.Keys(Seq("user_id")),
      TableConfig(memSliceSize = 4096, walEnabled = false))
    val ev = time("build+persist frame") {
      val e = spark.read.schema(sch).parquet(s"$dir/events.parquet")
        .select(lit("u").as("_op"), col("event_id").as("_lsn"),
          col("user_id"), col("event_id"), col("event_type"), col("value"))
        .persist()
      e.count(); e
    }
    val mm = time("minmax agg")(ev.agg(min(col("_lsn")), max(col("_lsn"))).head())
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val span = (hi - lo) / 2 + 1
    (0 until 2).foreach { i =>
      time(s"applyBatch $i") {
        CdcPipeline.applyBatch(table, ev.where(
          col("_lsn") >= lo + i * span && col("_lsn") < lo + (i + 1) * span))
      }
    }
    ev.unpersist()
    time("final read+collect") {
      table.read(None).select(col("user_id"), col("event_id"))
        .orderBy("user_id").collect()
    }

    // marginal-throughput probe: one large batch (`copies` shifted
    // copies of the stream; unique users+LSNs per copy)
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val big = time(s"build ${copies}x frame") {
      val base = spark.read.schema(sch).parquet(s"$dir/events.parquet")
      val n = base.count()
      val b = (0 until copies).map { i =>
        base.select(lit("u").as("_op"),
          (col("event_id") + i * n).as("_lsn"),
          (col("user_id") + i * 100000).as("user_id"),
          (col("event_id") + i * n).as("event_id"),
          col("event_type"), col("value"))
      }.reduce(_ unionByName _).persist()
      b.count(); b
    }
    val t2 = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("prof2").toString + "/t",
      tableSchema, Identity.Keys(Seq("user_id")),
      TableConfig(memSliceSize = 4096, walEnabled = false))
    time(s"applyBatch ${copies}00k")(CdcPipeline.applyBatch(t2, big))
    big.unpersist()
    spark.stop()
  }
}
