package graft

import graft.sources.RpcWire
import graft.tools.Serve
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.io.DataInputStream
import java.net.Socket
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/**
 * The standalone service process (reference `moonlink-service` CLI,
 * `moonlink_service/src/main.rs`): one warehouse served over REST,
 * TCP RPC and a dedicated OTEL listener, started/stopped as a unit.
 */
class ServeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-serve-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def post(url: String, body: String,
      contentType: String = "application/json"): String = {
    val conn = java.net.URI.create(url).toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setRequestProperty("Content-Type", contentType)
    conn.setDoOutput(true)
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    val os = conn.getOutputStream
    try os.write(bytes) finally os.close()
    val code = conn.getResponseCode
    val is = if (code == 200) conn.getInputStream else conn.getErrorStream
    val resp = new String(is.readAllBytes(), StandardCharsets.UTF_8)
    is.close()
    require(code == 200, s"POST $url -> $code: $resp")
    resp
  }

  test("CLI flags parse like the reference's (ports, disables)") {
    val c = Serve.parseArgs(Array("/wh"))
    assert(c == Serve.Config("/wh")) // reference defaults 3030/3031/3435
    val c2 = Serve.parseArgs(Array("/wh", "--rest-port", "8080",
      "--no-tcp", "--maintenance-ms", "1000"))
    assert(c2.restPort.contains(8080) && c2.tcpPort.isEmpty &&
      c2.otelPort.contains(3435) && c2.maintenanceMs == 1000L)
    val c3 = Serve.parseArgs(Array("/wh", "--no-rest", "--no-otel"))
    assert(c3.restPort.isEmpty && c3.otelPort.isEmpty && c3.tcpPort.nonEmpty)
    assertThrows[IllegalArgumentException](Serve.parseArgs(Array("/wh", "--bogus")))
    assertThrows[IllegalArgumentException](Serve.parseArgs(Array.empty))
  }

  test("one process serves REST + TCP RPC + OTEL over one warehouse") {
    val wh = Files.createTempDirectory("graft-serve").toString
    // ephemeral ports for the test; real deployments use the defaults
    val h = Serve.start(spark, Serve.Config(wh,
      restPort = Some(0), tcpPort = Some(0), otelPort = Some(0),
      maintenanceMs = 60000L))
    try {
      val rest = h.rest.get.baseUrl
      // REST: create + ingest + flush
      post(s"$rest/tables/users",
        """{"schema":[
          |  {"name":"id","data_type":"int64","nullable":false},
          |  {"name":"name","data_type":"string","nullable":true}],
          | "key_columns":["id"]}""".stripMargin)
      (1 to 5).foreach(i => post(s"$rest/ingest/users",
        s"""{"operation":"upsert","data":{"id":$i,"name":"n$i"},"request_mode":"sync"}"""))
      post(s"$rest/tables/users/flush", "{}")
      assert(h.catalog.table("users").read().count() == 5L)

      // TCP RPC: ListTables over a real socket, u32-framed
      val sock = new Socket("127.0.0.1", h.tcp.get.boundPort)
      try {
        sock.setTcpNoDelay(true)
        val body = RpcWire.encodeRequest(RpcWire.ListTables)
        sock.getOutputStream.write(RpcWire.frame(body))
        sock.getOutputStream.flush()
        val in = new DataInputStream(sock.getInputStream)
        val lenB = new Array[Byte](4); in.readFully(lenB)
        val len = ByteBuffer.wrap(lenB).order(ByteOrder.LITTLE_ENDIAN).getInt
        val resp = new Array[Byte](len); in.readFully(resp)
        val infos = RpcWire.decodeResult(resp)(d =>
          d.seq(RpcWire.decodeTableInfo(d)))
          .fold(e => fail(e.message), identity)
        assert(infos.map(_.table) == Seq("users"))
        assert(infos.head.cardinality == 5L)
        // a second request on the SAME connection (persistent transport)
        sock.getOutputStream.write(RpcWire.frame(
          RpcWire.encodeRequest(RpcWire.GetTableSchema("graft", "users"))))
        sock.getOutputStream.flush()
        in.readFully(lenB)
        val len2 = ByteBuffer.wrap(lenB).order(ByteOrder.LITTLE_ENDIAN).getInt
        val resp2 = new Array[Byte](len2); in.readFully(resp2)
        val schema = RpcWire.decodeResult(resp2)(_.bytesField())
          .fold(e => fail(e.message), identity)
        assert(new String(schema, "ISO-8859-1").contains("name"))
      } finally sock.close()

      // OTEL listener: its own port, OTLP JSON by Content-Type
      val otel = h.otel.get.baseUrl
      h.catalog.createTable("metrics", graft.sources.OtelSchema.schema,
        graft.model.Identity.None,
        graft.table.TableConfig(walEnabled = false))
      post(s"$otel/v1/metrics?table=metrics",
        """{"resourceMetrics":[{"scopeMetrics":[{"metrics":[
          |{"name":"m1","gauge":{"dataPoints":[
          |  {"timeUnixNano":"1","asDouble":1.5}]}}]}]}]}""".stripMargin)
      // flush via the ADMIN port; the OTEL port must refuse everything
      // except /v1/metrics and /health (no admin surface on the
      // telemetry-exposed listener, like the reference's otel port)
      post(s"$rest/tables/metrics/flush", "{}")
      assert(h.catalog.table("metrics").read()
        .where("metric_name = 'm1'").count() == 1L)
      val denied = intercept[IllegalArgumentException](
        post(s"$otel/tables/denied", """{"schema":[]}"""))
      assert(denied.getMessage.contains("404"))
    } finally h.stop()
    // stop() released the ports: a fresh start on the same warehouse
    // recovers the tables (backend recovery through the catalog)
    val h2 = Serve.start(spark, Serve.Config(wh,
      restPort = Some(0), tcpPort = None, otelPort = None))
    try assert(h2.catalog.table("users").read().count() == 5L)
    finally h2.stop()
  }
}
