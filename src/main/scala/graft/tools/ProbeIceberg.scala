package graft.tools

import graft.format.iceberg.IcebergSync
import graft.model._
import graft.streaming.CdcPipeline
import graft.table._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnose Iceberg sync vs engine read on the CDC event stream. */
object ProbeIceberg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val schema = SchemaDsl.struct("user_id" -> "int64", "event_id" -> "int64",
      "event_type" -> "string", "value" -> "float64")
    val root = java.nio.file.Files.createTempDirectory("probe-ice").toString + "/t"
    val table = GraftTable.create(spark, root, schema,
      Identity.Keys(Seq("user_id")),
      TableConfig(memSliceSize = 4096, walEnabled = false))
    val ev = spark.read.parquet(s"$d/events.parquet")
      .select(when(col("event_type") === "view", lit("d")).otherwise(lit("u")).as("_op"),
        col("event_id").as("_lsn"), col("user_id"), col("event_id"),
        col("event_type"), col("value")).persist()
    val mm = ev.agg(min(col("_lsn")), max(col("_lsn"))).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val span = (hi - lo) / 3 + 1
    val r0 = IcebergSync.sync(root, table.currentManifest)
    println(s"seed sync: $r0")
    var r = r0
    (0 until 3).foreach { i =>
      CdcPipeline.applyBatch(table, ev.where(
        col("_lsn") >= lo + i * span && col("_lsn") < lo + (i + 1) * span))
      r = IcebergSync.sync(root, table.currentManifest)
      println(s"sync $i: $r manifestFiles=${table.currentManifest.dataFiles.map(_.path).mkString(",")}")
    }
    val engine = table.read().select("user_id", "event_id").orderBy("user_id")
    val ice = IcebergSync.readDataFrame(spark, r.metadataPath)
      .select("user_id", "event_id").orderBy("user_id")
    println(s"engine rows=${engine.count()} ice rows=${ice.count()}")
    val extra = ice.exceptAll(engine)
    println(s"ice-extra=${extra.count()} engine-extra=${engine.exceptAll(ice).count()}")
    extra.show(10, false)
    // DV accounting
    val m = table.currentManifest
    println(s"dvFiles=${m.dvFiles.size} dataFiles=${m.dataFiles.size} " +
      s"manifest deletes=${m.dataFiles.map(_.deletes).sum}")
    val st = IcebergSync.readState(r.metadataPath)
    println(s"ice dv cardinality=${st.dvs.values.map(_.getLongCardinality).sum}")
    spark.stop()
  }
}
