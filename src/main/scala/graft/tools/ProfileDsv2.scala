package graft.tools

import graft.model._
import graft.streaming.CdcPipeline
import graft.table._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler: DSv2 connector scan vs library read on a
 *  full-table aggregate (not part of the driver contract; safe to
 *  delete). The aggregate is sum(value) — NOT pushdown-eligible, so
 *  both sides must decode every value byte; the DSv2 side should win
 *  or tie now that it feeds vectorized ColumnarBatches to codegen. */
object ProfileDsv2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile-dsv2")
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
      println(f"[dsv2] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // one committed table built from the events stream (insert-only =
    // distributed path, all rows flushed to parquet files)
    val table = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("prof-dsv2").toString + "/t",
      SchemaDsl.struct("user_id" -> "int64", "event_id" -> "int64",
        "event_type" -> "string", "value" -> "float64"),
      Identity.Keys(Seq("user_id")),
      // 8 data files (~125k rows each): the realistic many-file shape —
      // both paths get file-level parallelism
      TableConfig(memSliceSize = 4096, walEnabled = false,
        rowsPerFile = 1 << 17))
    time("build table (applyBatch insert)") {
      CdcPipeline.applyBatch(table,
        spark.read.schema(sch).parquet(s"$dir/events.parquet")
          .select(lit("i").as("_op"), col("event_id").as("_lsn"),
            col("user_id"), col("event_id"), col("event_type"), col("value")))
    }
    println(s"[dsv2] rows=${table.read(None).count()}  files=${table.currentManifest.dataFiles.size}")
    def agg(df: org.apache.spark.sql.DataFrame): (Double, Long) = {
      val r = df.agg(sum("value"), count(lit(1))).head()
      (r.getDouble(0), r.getLong(1))
    }
    // double sums combine in partition order, which differs between the
    // two scans' partitionings — equal counts + sums within a few ULP
    // is the correct check (the oracle queries round to integer units)
    def same(a: (Double, Long), b: (Double, Long)): Boolean =
      a._2 == b._2 && math.abs(a._1 - b._1) <= math.ulp(a._1) * 16
    // warmup both paths once, then 3 timed alternating passes
    agg(table.read(scala.None)); agg(spark.read.format("graft").load(table.root))
    (1 to 3).foreach { i =>
      val lib = time(s"library read sum(value) #$i")(agg(table.read(scala.None)))
      val v2 = time(s"dsv2 scan    sum(value) #$i")(
        agg(spark.read.format("graft").load(table.root)))
      require(same(lib, v2), s"result mismatch: $lib vs $v2")
    }
    // the same comparison with deletes present (DV row path)
    time("delete 10% of keys") {
      val dels = table.read(scala.None).where(col("user_id") % 10 === 0)
        .select(lit("d").as("_op"),
          (col("event_id") + 100000000L).as("_lsn"),
          col("user_id"), col("event_id"), col("event_type"), col("value"))
      CdcPipeline.applyBatch(table, dels)
    }
    (1 to 2).foreach { i =>
      val lib = time(s"library read with DVs #$i")(agg(table.read(scala.None)))
      val v2 = time(s"dsv2 row path with DVs #$i")(
        agg(spark.read.format("graft").load(table.root)))
      require(same(lib, v2), s"DV result mismatch: $lib vs $v2")
    }
    table.drop()
    spark.stop()
  }
}
