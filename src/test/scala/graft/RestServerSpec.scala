package graft

import graft.sources.RestServer
import graft.table.GraftCatalog
import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * REST HTTP surface (reference `moonlink_service/src/rest_api.rs:
 * 389-423`): table lifecycle, row ingest in all three payload
 * encodings (JSON / protobuf / Avro binary), maintenance verbs, and
 * error statuses — all through a real loopback HTTP listener.
 */
class RestServerSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-rest-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private var catalog: GraftCatalog = _
  private var srv: RestServer = _

  override def beforeAll(): Unit = {
    catalog = GraftCatalog(spark,
      java.nio.file.Files.createTempDirectory("rest-wh").toString)
    srv = RestServer.start(catalog)
  }

  override def afterAll(): Unit = {
    if (srv != null) srv.stop()
    spark.stop()
  }

  private def http(method: String, path: String,
      body: String = ""): (Int, String) = {
    val conn = java.net.URI.create(srv.baseUrl + path).toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod(method)
    if (body.nonEmpty) {
      conn.setRequestProperty("Content-Type", "application/json")
      conn.setDoOutput(true)
      val bytes = body.getBytes("UTF-8")
      conn.setFixedLengthStreamingMode(bytes.length)
      val os = conn.getOutputStream
      try os.write(bytes) finally os.close()
    }
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    val resp = new String(is.readAllBytes(), "UTF-8")
    is.close()
    (code, resp)
  }

  private val usersSchema =
    """{"schema":[
      |  {"name":"id","data_type":"int32","nullable":false},
      |  {"name":"name","data_type":"string","nullable":false},
      |  {"name":"email","data_type":"string","nullable":true},
      |  {"name":"age","data_type":"int32","nullable":true}],
      | "key_columns":["id"]}""".stripMargin

  test("health, create, list, ingest JSON, read back, drop") {
    assert(http("GET", "/health")._1 == 200)
    val (cc, _) = http("POST", "/tables/users", usersSchema)
    assert(cc == 200)
    assert(http("GET", "/tables")._2.contains("\"users\""))

    // the reference README's E2E slice: insert/upsert/delete rows
    assert(http("POST", "/ingest/users",
      """{"operation":"insert","data":{"id":1,"name":"a","age":30},"request_mode":"sync"}""")._1 == 200)
    assert(http("POST", "/ingest/users",
      """{"operation":"insert","data":{"id":2,"name":"b","email":"b@x"},"request_mode":"sync"}""")._1 == 200)
    // upsert overwrites id=1; sync mode returns an LSN
    val (uc, ub) = http("POST", "/ingest/users",
      """{"operation":"upsert","data":{"id":1,"name":"a2","age":31},"request_mode":"sync"}""")
    assert(uc == 200 && ub.contains("\"lsn\""))
    // async mode omits the LSN (Option contract, rest_api.rs:305)
    val (_, ab) = http("POST", "/ingest/users",
      """{"operation":"insert","data":{"id":3,"name":"c"}}""")
    assert(!ab.contains("\"lsn\""))
    assert(http("POST", "/ingest/users",
      """{"operation":"delete","data":{"id":2,"name":"b"},"request_mode":"sync"}""")._1 == 200)

    val got = catalog.table("users").read(None)
      .selectExpr("id", "name", "age").orderBy("id").collect()
    assert(got.toSeq == Seq(Row(1, "a2", 31), Row(3, "c", null)))

    assert(http("POST", "/tables/users/flush", "{}")._1 == 200)
    assert(http("POST", "/tables/users/optimize",
      """{"mode":"full"}""")._1 == 200)
    assert(http("POST", "/tables/users/snapshot", "{}")._1 == 200)
    assert(catalog.table("users").read(None).count() == 2)

    assert(http("DELETE", "/tables/users")._1 == 200)
    assert(!http("GET", "/tables")._2.contains("\"users\""))
  }

  test("avro binary datum over /kafka endpoints") {
    http("POST", "/tables/kf",
      """{"schema":[
        |  {"name":"id","data_type":"int64","nullable":false},
        |  {"name":"v","data_type":"string","nullable":true}],
        | "append_only":true}""".stripMargin)
    val avro =
      """{"type":"record","name":"R","fields":[
        |  {"name":"id","type":"long"},
        |  {"name":"v","type":["null","string"]}]}""".stripMargin
    // declare the schema exactly as the reference does (schema_id'd)
    val schBody = s"""{"table":"kf","kafka_schema":${avro},"schema_id":7}"""
    assert(http("POST", "/kafka/kf/schema", schBody)._1 == 200)
    val datum = graft.sources.AvroIngest.encodeBinaryDatum(avro, Row(9L, "hey"))
    val b64 = java.util.Base64.getEncoder.encodeToString(datum)
    assert(http("POST", "/kafka/kf/ingest",
      s"""{"operation":"insert","data":"$b64","request_mode":"sync"}""")._1 == 200)
    // and the serde Vec<u8> form: a JSON array of byte values
    val arr = datum.map(b => (b & 0xff) - (if ((b & 0x80) != 0) 256 else 0))
      .mkString("[", ",", "]")
    assert(http("POST", "/kafka/kf/ingest",
      s"""{"operation":"insert","data":$arr,"request_mode":"sync"}""")._1 == 200)
    val got = catalog.table("kf").read(None).orderBy("id").collect()
    assert(got.toSeq == Seq(Row(9L, "hey"), Row(9L, "hey")))
  }

  test("schema fetch mirrors the create-time FieldSchema list") {
    http("POST", "/tables/scht",
      """{"schema":[
        |  {"name":"id","data_type":"int64","nullable":false},
        |  {"name":"price","data_type":"decimal(10,2)","nullable":true},
        |  {"name":"tags","data_type":"list<string>","nullable":true}],
        | "key_columns":["id"]}""".stripMargin)
    val (code, body) = http("GET", "/schema/scht")
    assert(code == 200)
    assert(body.contains("\"decimal(10,2)\"") && body.contains("\"list<string>\"")
      && body.contains("\"int64\""))
    http("DELETE", "/tables/scht")
  }

  test("file upload: adopt parquet files, then row-ingest deletes resolve against them") {
    import org.apache.spark.sql.functions._
    http("POST", "/tables/up",
      """{"schema":[
        |  {"name":"id","data_type":"int64","nullable":false},
        |  {"name":"v","data_type":"int64","nullable":true}],
        | "key_columns":["id"]}""".stripMargin)
    val src = java.nio.file.Files.createTempDirectory("rest-up").toString + "/p"
    spark.range(1, 11).select(col("id"), (col("id") * 10).as("v"))
      .coalesce(1).write.parquet(src)
    val files = new java.io.File(src).list()
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .map(n => s"$src/$n")
    val (uc, ub) = http("POST", "/upload/up",
      s"""{"operation":"upload","files":["${files.mkString("\",\"")}"],"request_mode":"sync"}""")
    assert(uc == 200 && ub.contains("\"lsn\""), ub)
    assert(catalog.table("up").read(None).count() == 10)
    // a later REST delete must target the adopted rows (LSN above load)
    assert(http("POST", "/ingest/up",
      """{"operation":"delete","data":{"id":3},"request_mode":"sync"}""")._1 == 200)
    val got = catalog.table("up").read(None).orderBy("id").collect()
    assert(got.length == 9 && !got.exists(_.getLong(0) == 3L))
    // and the insert-by-rows form appends through the distributed path
    val src2 = java.nio.file.Files.createTempDirectory("rest-up2").toString + "/p"
    spark.range(100, 103).select(col("id"), (col("id") * 10).as("v"))
      .coalesce(1).write.parquet(src2)
    val files2 = new java.io.File(src2).list()
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .map(n => s"$src2/$n")
    assert(http("POST", "/upload/up",
      s"""{"operation":"insert","files":["${files2.mkString("\",\"")}"],"request_mode":"sync"}""")._1 == 200)
    assert(catalog.table("up").read(None).count() == 12)
    http("DELETE", "/tables/up")
  }

  test("OTLP /v1/metrics accepts protobuf and JSON by Content-Type") {
    import graft.sources.{OtelPb, OtelSchema}
    catalog.createTable("otelt", OtelSchema.schema, graft.model.Identity.None,
      graft.table.TableConfig(walEnabled = false))
    // binary protobuf (primary encoding)
    val pb = OtelPb.Enc.request(
      Seq(OtelPb.Enc.strAttr("service.name", "svc")), "m", "1", Seq(
        OtelPb.Enc.gauge("g", "1", Seq(
          OtelPb.Enc.gaugePoint(11L, 1.5, Seq(OtelPb.Enc.intAttr("u", 1))),
          OtelPb.Enc.gaugePoint(12L, 2.5, Seq(OtelPb.Enc.intAttr("u", 2)))))))
    val conn = java.net.URI.create(srv.baseUrl + "/v1/metrics?table=otelt")
      .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setRequestProperty("Content-Type", "application/x-protobuf")
    conn.setDoOutput(true)
    conn.getOutputStream.write(pb); conn.getOutputStream.close()
    assert(conn.getResponseCode == 200)
    val resp = new String(conn.getInputStream.readAllBytes(), "UTF-8")
    assert(resp.contains("\"points\":2"))
    // JSON (secondary encoding) via the default content type
    val (c2, r2) = http("POST", "/v1/metrics?table=otelt",
      """{"resourceMetrics":[{"scopeMetrics":[{"scope":{"name":"m"},
        |"metrics":[{"name":"g","gauge":{"dataPoints":[
        |{"timeUnixNano":"13","asDouble":3.5}]}}]}]}]}""".stripMargin)
    assert(c2 == 200 && r2.contains("\"points\":1"))
    val got = catalog.table("otelt").read()
      .select("time_unix_nano", "value_double").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted
    assert(got.toSeq == Seq((11L, 1.5), (12L, 2.5), (13L, 3.5)))
    // table param required
    assert(http("POST", "/v1/metrics", """{"resourceMetrics":[]}""")._1 == 400)
  }

  test("errors: unknown table 404-ish, bad operation, missing fields") {
    assert(http("POST", "/ingest/nope",
      """{"operation":"insert","data":{}}""")._1 == 404)
    http("POST", "/tables/errt",
      """{"schema":[{"name":"id","data_type":"int64","nullable":false}],
        | "key_columns":["id"]}""".stripMargin)
    assert(http("POST", "/ingest/errt",
      """{"operation":"replace","data":{"id":1}}""")._1 == 400)
    assert(http("POST", "/ingest/errt", """{"data":{"id":1}}""")._1 == 400)
    assert(http("POST", "/kafka/errt/ingest",
      """{"operation":"insert","data":"AA=="}""")._1 == 400) // no schema declared
    assert(http("GET", "/nonsense")._1 == 404)
  }
}
