package graft

import graft.sources.{OtelIngest, OtelSchema}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/**
 * OTLP/HTTP JSON → wide metric rows (S6 conversion; reference
 * `otel/otel_to_moonlink_pb.rs` + `otel/test.rs`): gauge, sum and
 * histogram data points with resource/scope/point attributes, int64
 * fields in the proto3-JSON string encoding.
 */
class OtelIngestSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-otel-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val payload =
    """{"resourceMetrics":[{
      |  "schemaUrl":"https://opentelemetry.io/schemas/1.21.0",
      |  "resource":{"attributes":[
      |    {"key":"service.name","value":{"stringValue":"checkout"}},
      |    {"key":"host.id","value":{"intValue":"42"}}]},
      |  "scopeMetrics":[{
      |    "scope":{"name":"meter1","version":"2.1",
      |      "attributes":[{"key":"lib","value":{"stringValue":"graft"}}]},
      |    "metrics":[
      |      {"name":"cpu.usage","description":"cpu","unit":"1",
      |       "gauge":{"dataPoints":[
      |         {"timeUnixNano":"1000000001","asDouble":0.25,
      |          "attributes":[{"key":"core","value":{"intValue":"0"}}]},
      |         {"timeUnixNano":"1000000002","asInt":"7"}]}},
      |      {"name":"requests.total","description":"req","unit":"{req}",
      |       "sum":{"aggregationTemporality":2,"isMonotonic":true,
      |         "dataPoints":[
      |           {"startTimeUnixNano":"900","timeUnixNano":"1000000003",
      |            "asInt":"123"}]}},
      |      {"name":"latency","description":"lat","unit":"ms",
      |       "histogram":{"aggregationTemporality":1,
      |         "dataPoints":[
      |           {"timeUnixNano":"1000000004","count":"6","sum":21.5,
      |            "bucketCounts":["1","2","3"],"explicitBounds":[5.0,10.0],
      |            "min":0.5,"max":9.5,
      |            "attributes":[{"key":"route","value":{"stringValue":"/pay"}}]}]}}
      |  ]}]}]}""".stripMargin

  private lazy val rows = {
    val df = spark.createDataFrame(
      Seq(Row(payload)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.StringType))))
    OtelIngest.metricsToRows(df, "payload")
  }

  test("schema matches the OTEL table schema exactly") {
    assert(rows.schema.fieldNames.toSeq == OtelSchema.schema.fieldNames.toSeq)
  }

  test("gauge points: value union, -1 temporality, point attributes") {
    val g = rows.where(col("metric_type") === "gauge")
      .orderBy("time_unix_nano").collect()
    assert(g.length == 2)
    val r1 = g(0)
    assert(r1.getAs[String]("metric_name") == "cpu.usage")
    assert(r1.getAs[Long]("time_unix_nano") == 1000000001L)
    assert(r1.getAs[Double]("value_double") == 0.25)
    assert(r1.getAs[Int]("aggregation_temporality") == -1)
    val attrs = r1.getAs[scala.collection.Seq[Row]]("attributes")
    assert(attrs.map(_.getAs[String]("key")).toSeq == Seq("core"))
    assert(attrs.head.getAs[Row]("value").getAs[Long]("int_value") == 0L)
    assert(g(1).getAs[Long]("value_int") == 7L)
  }

  test("sum points carry temporality + monotonicity") {
    val s = rows.where(col("metric_type") === "sum").collect()
    assert(s.length == 1)
    assert(s.head.getAs[Long]("value_int") == 123L)
    assert(s.head.getAs[Boolean]("is_monotonic"))
    assert(s.head.getAs[Int]("aggregation_temporality") == 2)
    assert(s.head.getAs[Long]("start_time_unix_nano") == 900L)
  }

  test("histogram points: buckets, bounds, min/max") {
    val h = rows.where(col("metric_type") === "histogram").collect()
    assert(h.length == 1)
    val r = h.head
    assert(r.getAs[Long]("count") == 6L)
    assert(r.getAs[Double]("sum") == 21.5)
    assert(r.getAs[scala.collection.Seq[Long]]("bucket_counts").toSeq ==
      Seq(1L, 2L, 3L))
    assert(r.getAs[scala.collection.Seq[Double]]("explicit_bounds").toSeq ==
      Seq(5.0, 10.0))
    assert(r.getAs[Double]("min") == 0.5 && r.getAs[Double]("max") == 9.5)
    assert(r.getAs[Int]("aggregation_temporality") == 1)
  }

  test("resource + scope context rides every row") {
    rows.collect().foreach { r =>
      assert(r.getAs[String]("scope_name") == "meter1")
      assert(r.getAs[String]("scope_version") == "2.1")
      val res = r.getAs[scala.collection.Seq[Row]]("resource_attributes")
      assert(res.map(_.getAs[String]("key")).toSeq == Seq("service.name", "host.id"))
      assert(res(1).getAs[Row]("value").getAs[Long]("int_value") == 42L)
    }
  }
}
