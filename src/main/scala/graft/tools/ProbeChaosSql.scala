package graft.tools

import graft.model._
import graft.streaming.CdcPipeline
import graft.table._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Trace Fio ops during a SQL UPDATE to place the failure halves. */
object ProbeChaosSql {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val wh = java.nio.file.Files.createTempDirectory("probe-chs").toString
    val cat = GraftCatalog(spark, wh)
    val schema = SchemaDsl.struct("user_id" -> "int64", "event_id" -> "int64",
      "event_type" -> "string", "value" -> "float64")
    val kv = cat.createTable("t", schema, Identity.Keys(Seq("user_id")),
      TableConfig(memSliceSize = 4096, walEnabled = false))
    val ev = spark.read.parquet(s"$d/events.parquet")
      .where(col("user_id") % 10 === 3)
      .select(lit("u").as("_op"), col("event_id").as("_lsn"),
        col("user_id"), col("event_id"), col("event_type"), col("value"))
    CdcPipeline.applyBatch(kv, ev)
    val cname = "probechs"
    spark.conf.set(s"spark.sql.catalog.$cname",
      classOf[graft.sources.GraftCatalogPlugin].getName)
    spark.conf.set(s"spark.sql.catalog.$cname.warehouse", wh)
    // replicate the entry: pre-crash stmt1, retry, then post stmt2
    final class F extends graft.format.FioFaults {
      @volatile var mode: String = "off"
      @volatile var fired = false
      @volatile private var sawManifest = false
      def arm(m: String): Unit = { mode = m; fired = false; sawManifest = false }
      override def beforeOp(op: String, path: String): Unit = {
        if (mode != "off") println(s"[op:$mode fired=$fired saw=$sawManifest] $op $path")
        mode match {
          case "pre" =>
            if (!fired && op == "write") { fired = true
              throw new java.io.IOException(s"injected fault: $op $path") }
          case "post" =>
            if (op == "commit-rename" && path.contains("/manifest/"))
              sawManifest = true
            else if (!fired && sawManifest && (op == "delete" || op == "move")) {
              fired = true
              throw new java.io.IOException(s"injected fault: $op $path") }
          case _ => ()
        }
      }
    }
    val f = new F
    graft.format.Fio.faults = f
    try {
      f.arm("pre")
      try spark.sql(s"UPDATE $cname.graft.t SET value = value + 10 WHERE user_id % 8 = 1")
      catch { case e: Throwable => println(s"[stmt1] failed as expected") }
      f.arm("off")
      spark.sql(s"UPDATE $cname.graft.t SET value = value + 10 WHERE user_id % 8 = 1")
      println("[stmt1] retry ok")
      f.arm("post")
      try { spark.sql(s"UPDATE $cname.graft.t SET value = value + 10 WHERE user_id % 8 = 3"); println("[stmt2] SUCCEEDED fired=" + f.fired) }
      catch { case e: Throwable => println(s"[stmt2] failed fired=" + f.fired) }
      f.arm("off")
    } finally graft.format.Fio.faults = null
    spark.stop()
  }
}
