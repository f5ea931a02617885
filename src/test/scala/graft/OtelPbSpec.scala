package graft

import graft.sources.OtelPb
import graft.sources.OtelPb.Enc
import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * Binary OTLP metrics decoding (reference `otel_to_moonlink_pb.rs` —
 * the service's primary protobuf wire path): encode with the producer
 * half, decode with the engine half, assert the data-point rows.
 */
class OtelPbSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def attrMap(r: Row): Map[String, Row] =
    r.getSeq[Row](11).map(a => a.getString(0) -> a.getStruct(1)).toMap

  test("gauge request round-trips: resource/scope/descriptor/point") {
    val req = Enc.request(
      resourceAttrs = Seq(Enc.strAttr("service.name", "svc-a")),
      scopeName = "graft.meter", scopeVersion = "1.0",
      metrics = Seq(Enc.gauge("cpu.load", "1", Seq(
        Enc.gaugePoint(1700000000000000001L, 0.75,
          Seq(Enc.intAttr("core", 3), Enc.strAttr("host", "h1")))))))
    val rows = OtelPb.decodeRequest(req)
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "https://opentelemetry.io/schemas/1.21.0")
    assert(r.getSeq[Row](1).head.getString(0) == "service.name")
    assert(r.getSeq[Row](1).head.getStruct(1).getString(0) == "svc-a")
    assert(r.getString(2) == "graft.meter" && r.getString(3) == "1.0")
    assert(r.getString(5) == "cpu.load" && r.getString(7) == "1")
    assert(r.getString(8) == "gauge")
    assert(r.getLong(10) == 1700000000000000001L)
    assert(r.getDouble(13) == 0.75 && r.isNullAt(14))
    val am = attrMap(r)
    assert(am("core").getLong(2) == 3L && am("host").getString(0) == "h1")
    assert(r.isNullAt(15) && r.isNullAt(16)) // gauge: no sum-only fields
  }

  test("monotonic int sum carries temporality and as_int (sfixed64)") {
    val req = Enc.request(Seq.empty, "m", "v", Seq(
      Enc.sum("requests.count", monotonic = true, temporality = 2,
        Seq(Enc.sumIntPoint(42L, 12345L, Seq.empty)))))
    val r = OtelPb.decodeRequest(req).head
    assert(r.getString(8) == "sum")
    assert(r.isNullAt(13) && r.getLong(14) == 12345L)
    assert(r.getBoolean(15) && r.getInt(16) == 2)
  }

  test("histogram decodes packed bucket_counts and explicit_bounds") {
    val req = Enc.request(Seq.empty, "m", "v", Seq(
      Enc.histogram("latency", temporality = 2, Seq(
        Enc.histogramPoint(7L, count = 10L, sum = 480.5,
          bounds = Seq(50.0, 100.0, 500.0),
          buckets = Seq(2L, 3L, 4L, 1L))))))
    val r = OtelPb.decodeRequest(req).head
    assert(r.getString(8) == "histogram")
    assert(r.getLong(17) == 10L && r.getDouble(18) == 480.5)
    assert(r.getSeq[Long](19) == Seq(2L, 3L, 4L, 1L))
    assert(r.getSeq[Double](20) == Seq(50.0, 100.0, 500.0))
    assert(r.getInt(16) == 2)
  }

  test("multiple scopes/metrics/points in one request; empty attrs ok") {
    val req = Enc.request(Seq.empty, "m", "v", Seq(
      Enc.gauge("a", "1", Seq(
        Enc.gaugePoint(1L, 1.0, Seq.empty),
        Enc.gaugePoint(2L, 2.0, Seq.empty))),
      Enc.sum("b", monotonic = false, temporality = 1,
        Seq(Enc.sumIntPoint(3L, 30L, Seq.empty)))))
    val rows = OtelPb.decodeRequest(req)
    assert(rows.map(r => (r.getString(5), r.getLong(10))) ==
      Seq(("a", 1L), ("a", 2L), ("b", 3L)))
    assert(!rows(2).getBoolean(15) && rows(2).getInt(16) == 1)
  }

  test("distributed decode equals the local decode") {
    import spark.implicits._
    val reqs = (1 to 5).map(i => Enc.request(Seq.empty, "m", "v", Seq(
      Enc.gauge("g", "1", Seq(
        Enc.gaugePoint(i.toLong, i * 1.5, Seq(Enc.intAttr("i", i.toLong))))))))
    val df = OtelPb.metricsToRows(spark, reqs.toDF("payload"), "payload")
    val got = df.collect().map(r => (r.getLong(10), r.getDouble(13))).sorted
    assert(got.toSeq == (1 to 5).map(i => (i.toLong, i * 1.5)))
  }
}
