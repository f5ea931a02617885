package graft

import graft.observability.Metrics
import graft.sources.OtelIngest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * Metrics registry semantics mirroring the reference's observability
 * module: fixed-boundary latency histograms labeled by table id
 * (`observability/snapshot_creation.rs:17-24`), RAII-style recording
 * that survives failures (`latency_guard.rs:26-32` records on Drop),
 * and OTLP export the engine's own OTEL ingest can parse back.
 */
class MetricsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("histogram bucketing against the reference boundaries") {
    Metrics.reset()
    // boundaries [50,100,200,300,400,500]: value <= bound -> bucket
    Seq(10L, 50L, 51L, 100L, 250L, 500L, 501L, 9999L).foreach(
      Metrics.recordMs("m", "t", _))
    val h = Metrics.histogram("m", "t").get
    assert(h.count.sum() == 8)
    assert(h.sumMs.sum() == 10 + 50 + 51 + 100 + 250 + 500 + 501 + 9999)
    assert(h.min == 10 && h.max == 9999)
    //                      <=50 <=100 <=200 <=300 <=400 <=500 overflow
    assert(h.bucketCounts == Seq(2L, 2L, 0L, 1L, 0L, 1L, 2L))
    assert(h.bucketCounts.sum == h.count.sum())
  }

  test("time() records even when the timed body throws (guard-on-drop)") {
    Metrics.reset()
    intercept[RuntimeException] {
      Metrics.time("op", "t") { throw new RuntimeException("boom") }
    }
    assert(Metrics.histogram("op", "t").get.count.sum() == 1)
  }

  test("counters accumulate per (metric, table) series") {
    Metrics.reset()
    Metrics.counter("c", "t1"); Metrics.counter("c", "t1", 41L)
    Metrics.counter("c", "t2", 7L)
    assert(Metrics.counterValue("c", "t1") == 42L)
    assert(Metrics.counterValue("c", "t2") == 7L)
    assert(Metrics.counterValue("c", "t3") == 0L)
  }

  test("OTLP export round-trips through the engine's own OTEL ingest") {
    Metrics.reset()
    Metrics.counter("graft.commits", "/wh/t1", 3L)
    Seq(40L, 450L).foreach(
      Metrics.recordMs("graft.snapshot_creation_latency", "/wh/t1", _))
    val payload = Metrics.toOtlpJson(timeUnixNano = 1700000000000000000L)
    import spark.implicits._
    val rows = OtelIngest.metricsToRows(Seq(payload).toDF("body"), "body")
      .withColumn("tid", expr(
        "filter(attributes, a -> a.key = 'graft.table_id')[0].value.string_value"))
      .where($"tid" === "/wh/t1")
      .cache()
    val sum = rows.where($"metric_type" === "sum" &&
      $"metric_name" === "graft.commits").head()
    assert(sum.getAs[Long]("value_int") == 3L)
    assert(sum.getAs[Boolean]("is_monotonic"))
    assert(sum.getAs[Long]("time_unix_nano") == 1700000000000000000L)
    val hist = rows.where($"metric_type" === "histogram").head()
    assert(hist.getAs[Long]("count") == 2L)
    assert(hist.getAs[Double]("sum") == 490.0)
    assert(hist.getAs[collection.Seq[Double]]("explicit_bounds").toSeq ==
      Metrics.DefaultBoundariesMs)
    //                                               <=50 ... <=500
    assert(hist.getAs[collection.Seq[Long]]("bucket_counts").toSeq ==
      Seq(1L, 0L, 0L, 0L, 0L, 1L, 0L))
    assert(hist.getAs[Double]("min") == 40.0 &&
      hist.getAs[Double]("max") == 450.0)
    rows.unpersist()
  }

  test("table ops feed the registry (counters + latency series)") {
    Metrics.reset()
    import graft.model._
    import graft.table._
    val dir = java.nio.file.Files.createTempDirectory("graft-obs").toString
    val t = GraftTable.create(spark, s"$dir/t",
      SchemaDsl.struct("id" -> "int64", "v" -> "int64"),
      Identity.Keys(Seq("id")),
      TableConfig(memSliceSize = 2, walEnabled = true))
    t.insertAll(Seq(org.apache.spark.sql.Row(1L, 1L),
      org.apache.spark.sql.Row(2L, 2L), org.apache.spark.sql.Row(3L, 3L)),
      startLsn = 1)
    assert(Metrics.counterValue("graft.rows_ingested", t.root) == 3L)
    assert(Metrics.counterValue("graft.commits", t.root) == 1L)
    // insertAll published once; the 2-row mem slice forced >=1 flush
    assert(Metrics.histogram("graft.snapshot_creation_latency", t.root)
      .exists(_.count.sum() >= 1L))
    assert(Metrics.histogram("graft.persistence_latency", t.root)
      .exists(_.count.sum() >= 1L))
    // reopen records a recovery latency sample
    GraftTable.open(spark, t.root, Identity.Keys(Seq("id")),
      TableConfig(memSliceSize = 2, walEnabled = true))
    assert(Metrics.histogram("graft.table_recovery_latency", t.root)
      .exists(_.count.sum() == 1L))
    t.drop()
  }
}
