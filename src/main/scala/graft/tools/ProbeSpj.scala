package graft.tools

import graft.model._
import graft.streaming.CdcPipeline
import graft.table._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Storage-partitioned-join probe: builds two co-bucketed keyed tables
 *  from the lineitem/orders testdata, then times the key join +
 *  per-key aggregate with the SPJ confs ON vs OFF (same tables, same
 *  query, broadcast disabled both ways — at 100 TB neither side
 *  broadcasts). The OFF run pays two full hash exchanges; the ON run
 *  pays none, which is the whole point of the bucketed layout.
 *
 *    sbt "runMain graft.tools.ProbeSpj /root/testdata/sf0.1 16 3"
 *                                       (sfDir, buckets, reps)
 */
object ProbeSpj {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBuckets = args.lift(1).map(_.toInt).getOrElse(16)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val wh = java.nio.file.Files.createTempDirectory("graft-spjprobe").toString
    val cat = GraftCatalog(spark, wh)
    val cfg = TableConfig(memSliceSize = 4096, walEnabled = false)
    // fact A: one row per lineitem line, keyed by (synthetic) line id,
    // carrying the orderkey join column — keyed CDC tables with a
    // non-key join column exercise the general case
    val ta = cat.createTable("li", SchemaDsl.struct(
      "l_orderkey" -> "int64", "qty_cents" -> "int64"),
      Identity.Keys(Seq("l_orderkey")), cfg)
    val tb = cat.createTable("ord", SchemaDsl.struct(
      "o_orderkey" -> "int64", "total_cents" -> "int64"),
      Identity.Keys(Seq("o_orderkey")), cfg)
    CdcPipeline.applyBatch(ta, spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_orderkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("qty_cents"))
      .select(lit("i").as("_op"), col("l_orderkey").as("_lsn"),
        col("l_orderkey"), col("qty_cents")))
    CdcPipeline.applyBatch(tb, spark.read.parquet(s"$dir/orders.parquet")
      .select(lit("i").as("_op"), col("o_orderkey").as("_lsn"),
        col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("total_cents")))
    ta.optimize(bucketBy = Some(nBuckets))
    tb.optimize(bucketBy = Some(nBuckets))
    println(s"tables: li=${ta.currentManifest.dataFiles.size} files, " +
      s"ord=${tb.currentManifest.dataFiles.size} files, buckets=$nBuckets")

    val cname = "spjprobe"
    spark.conf.set(s"spark.sql.catalog.$cname",
      classOf[graft.sources.GraftCatalogPlugin].getName)
    spark.conf.set(s"spark.sql.catalog.$cname.warehouse", wh)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")

    def timeJoin(spj: Boolean): Double = {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", spj.toString)
      val t0 = System.nanoTime()
      val n = spark.sql(
        s"""SELECT x.l_orderkey, x.qty_cents, y.total_cents
           |FROM $cname.graft.li x
           |JOIN $cname.graft.ord y ON x.l_orderkey = y.o_orderkey
           |""".stripMargin).count()
      val sec = (System.nanoTime() - t0) / 1e9
      require(n > 0, "empty join")
      sec
    }
    // interleave to share cache/JIT state fairly
    (1 to reps).foreach { r =>
      val off = timeJoin(spj = false)
      val on = timeJoin(spj = true)
      println(f"rep $r: shuffle-join ${off}%.3f s  spj ${on}%.3f s  " +
        f"ratio ${on / off}%.2fx")
    }
    spark.stop()
  }
}
