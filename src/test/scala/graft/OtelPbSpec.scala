package graft

import graft.sources.{OtelPb, OtelSchema}
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

  // rows decode in OtelSchema.schema order — address fields by name
  private val ix: Map[String, Int] =
    OtelSchema.schema.fieldNames.zipWithIndex.toMap

  private def attrMap(r: Row): Map[String, Row] =
    r.getSeq[Row](ix("attributes")).map(a => a.getString(0) -> a.getStruct(1)).toMap

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
    assert(r.getString(ix("resource_schema_url")) ==
      "https://opentelemetry.io/schemas/1.21.0")
    assert(r.getSeq[Row](ix("resource_attributes")).head.getString(0) == "service.name")
    assert(r.getSeq[Row](ix("resource_attributes")).head.getStruct(1).getString(0) == "svc-a")
    assert(r.getString(ix("scope_name")) == "graft.meter" &&
      r.getString(ix("scope_version")) == "1.0")
    assert(r.getString(ix("metric_name")) == "cpu.load" &&
      r.getString(ix("metric_unit")) == "1")
    assert(r.getString(ix("metric_type")) == "gauge")
    assert(r.getLong(ix("time_unix_nano")) == 1700000000000000001L)
    assert(r.getDouble(ix("value_double")) == 0.75 && r.isNullAt(ix("value_int")))
    val am = attrMap(r)
    assert(am("core").getLong(2) == 3L && am("host").getString(0) == "h1")
    // gauge: no sum-only fields, no exemplars attached
    assert(r.isNullAt(ix("is_monotonic")) && r.isNullAt(ix("aggregation_temporality")))
    assert(r.getSeq[Row](ix("exemplars")).isEmpty)
    assert(r.getSeq[Row](ix("resource_entity_refs")).isEmpty)
  }

  test("monotonic int sum carries temporality and as_int (sfixed64)") {
    val req = Enc.request(Seq.empty, "m", "v", Seq(
      Enc.sum("requests.count", monotonic = true, temporality = 2,
        Seq(Enc.sumIntPoint(42L, 12345L, Seq.empty)))))
    val r = OtelPb.decodeRequest(req).head
    assert(r.getString(ix("metric_type")) == "sum")
    assert(r.isNullAt(ix("value_double")) && r.getLong(ix("value_int")) == 12345L)
    assert(r.getBoolean(ix("is_monotonic")) &&
      r.getInt(ix("aggregation_temporality")) == 2)
  }

  test("histogram decodes packed bucket_counts and explicit_bounds") {
    val req = Enc.request(Seq.empty, "m", "v", Seq(
      Enc.histogram("latency", temporality = 2, Seq(
        Enc.histogramPoint(7L, count = 10L, sum = 480.5,
          bounds = Seq(50.0, 100.0, 500.0),
          buckets = Seq(2L, 3L, 4L, 1L))))))
    val r = OtelPb.decodeRequest(req).head
    assert(r.getString(ix("metric_type")) == "histogram")
    assert(r.getLong(ix("count")) == 10L && r.getDouble(ix("sum")) == 480.5)
    assert(r.getSeq[Long](ix("bucket_counts")) == Seq(2L, 3L, 4L, 1L))
    assert(r.getSeq[Double](ix("explicit_bounds")) == Seq(50.0, 100.0, 500.0))
    assert(r.getInt(ix("aggregation_temporality")) == 2)
  }

  test("multiple scopes/metrics/points in one request; empty attrs ok") {
    val req = Enc.request(Seq.empty, "m", "v", Seq(
      Enc.gauge("a", "1", Seq(
        Enc.gaugePoint(1L, 1.0, Seq.empty),
        Enc.gaugePoint(2L, 2.0, Seq.empty))),
      Enc.sum("b", monotonic = false, temporality = 1,
        Seq(Enc.sumIntPoint(3L, 30L, Seq.empty)))))
    val rows = OtelPb.decodeRequest(req)
    assert(rows.map(r =>
      (r.getString(ix("metric_name")), r.getLong(ix("time_unix_nano")))) ==
      Seq(("a", 1L), ("a", 2L), ("b", 3L)))
    assert(!rows(2).getBoolean(ix("is_monotonic")) &&
      rows(2).getInt(ix("aggregation_temporality")) == 1)
  }

  test("exemplars round-trip on number and histogram points") {
    // otel_to_moonlink_pb.rs:229 exemplars_to_rowvalue_array: (time,
    // as_int, as_double, trace_id, span_id, filtered_attributes)
    val trace = Array.tabulate[Byte](16)(_.toByte)
    val span = Array.tabulate[Byte](8)(i => (i + 1).toByte)
    val ex = Enc.exemplar(99L, 0.5, trace, span,
      Seq(Enc.strAttr("sampled.by", "head")))
    val req = Enc.request(Seq.empty, "m", "v", Seq(
      Enc.gauge("g", "1",
        Seq(Enc.gaugePoint(1L, 1.0, Seq.empty, exemplars = Seq(ex)))),
      Enc.histogram("h", temporality = 2, Seq(
        Enc.histogramPoint(7L, 1L, 1.0, Seq(1.0), Seq(1L, 0L),
          exemplars = Seq(ex, ex))))))
    val rows = OtelPb.decodeRequest(req)
    val g = rows.head
    val exs = g.getSeq[Row](ix("exemplars"))
    assert(exs.length == 1)
    assert(exs.head.getLong(0) == 99L)            // time_unix_nano
    assert(exs.head.isNullAt(1))                  // as_int (double-valued)
    assert(exs.head.getDouble(2) == 0.5)          // as_double
    assert(exs.head.getAs[Array[Byte]](3).toSeq == trace.toSeq)
    assert(exs.head.getAs[Array[Byte]](4).toSeq == span.toSeq)
    val fa = exs.head.getSeq[Row](5)
    assert(fa.head.getString(0) == "sampled.by" &&
      fa.head.getStruct(1).getString(0) == "head")
    assert(g.isNullAt(ix("hist_exemplars")))
    val h = rows(1)
    assert(h.isNullAt(ix("exemplars")))
    assert(h.getSeq[Row](ix("hist_exemplars")).length == 2)
  }

  test("resource entity refs resolve id/description keys against attrs") {
    // otel_to_moonlink_pb.rs:166: keys become (key, value) pairs looked
    // up in the resource attr map; a missing key gets the null struct
    val req = Enc.request(
      resourceAttrs = Seq(Enc.strAttr("service.name", "svc-a"),
        Enc.intAttr("service.instance", 7L)),
      scopeName = "m", scopeVersion = "v",
      metrics = Seq(Enc.gauge("g", "1", Seq(Enc.gaugePoint(1L, 1.0, Seq.empty)))),
      entityRefs = Seq(Enc.entityRef("service",
        idKeys = Seq("service.name", "service.instance", "absent.key"),
        descriptionKeys = Seq("service.name"),
        schemaUrl = "https://opentelemetry.io/schemas/1.21.0")))
    val r = OtelPb.decodeRequest(req).head
    val ers = r.getSeq[Row](ix("resource_entity_refs"))
    assert(ers.length == 1)
    val er = ers.head
    assert(er.getString(0) == "service")
    val ids = er.getSeq[Row](1)
    assert(ids.map(_.getString(0)) ==
      Seq("service.name", "service.instance", "absent.key"))
    assert(ids(0).getStruct(1).getString(0) == "svc-a")
    assert(ids(1).getStruct(1).getLong(2) == 7L)
    assert((0 until 4).forall(ids(2).getStruct(1).isNullAt)) // unresolved
    assert(er.getSeq[Row](2).head.getStruct(1).getString(0) == "svc-a")
    assert(er.getString(3) == "https://opentelemetry.io/schemas/1.21.0")
  }

  test("distributed decode equals the local decode") {
    import spark.implicits._
    val reqs = (1 to 5).map(i => Enc.request(Seq.empty, "m", "v", Seq(
      Enc.gauge("g", "1", Seq(
        Enc.gaugePoint(i.toLong, i * 1.5, Seq(Enc.intAttr("i", i.toLong))))))))
    val df = OtelPb.metricsToRows(spark, reqs.toDF("payload"), "payload")
    val got = df.collect().map(r =>
      (r.getLong(ix("time_unix_nano")), r.getDouble(ix("value_double")))).sorted
    assert(got.toSeq == (1 to 5).map(i => (i.toLong, i * 1.5)))
  }
}
