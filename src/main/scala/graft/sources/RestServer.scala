package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.model._
import graft.table.{GraftCatalog, GraftTable, TableConfig}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicLong
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/**
 * REST HTTP ingestion surface (the reference's primary user API,
 * `moonlink_service/src/rest_api.rs:389-423`): a localhost HTTP
 * listener wrapping the programmatic catalog/table API. Endpoints:
 *
 *   GET    /health                      — liveness (`/health`, :407)
 *   GET    /tables                      — list tables (:408)
 *   POST   /tables/{t}                  — create (schema as FieldSchema
 *                                         list, `schema_util.rs:6-14`)
 *   DELETE /tables/{t}                  — drop (:414)
 *   POST   /ingest/{t}                  — one JSON row event
 *                                         {operation, data,
 *                                         request_mode} (:416, :1046)
 *   POST   /ingestpb/{t}                — one protobuf row datum,
 *                                         base64 `data` (:417)
 *   POST   /kafka/{t}/schema            — declare Avro schema (:418)
 *   POST   /kafka/{t}/ingest            — one Avro datum, binary
 *                                         (base64) or avro-json (:419)
 *   POST   /tables/{t}/optimize         — compaction (:421)
 *   POST   /tables/{t}/snapshot         — force snapshot publish (:422)
 *   POST   /tables/{t}/flush            — mem->parquet flush (:423)
 *
 * Row-at-a-time requests ride the driver event path (`table.apply`) —
 * the same single event loop the reference routes REST rows through
 * (`rest_api.rs` -> event channel -> `table_handler.rs:124`); bulk
 * data belongs to the distributed `CdcPipeline.applyBatch` surface.
 * `request_mode=sync` responds with the post-apply commit LSN;
 * `async` acknowledges after enqueue semantics (here: same apply —
 * single-node — but the response omits the LSN, matching the
 * reference's Option<lsn> contract).
 *
 * Security note: binds loopback only — this is a library test surface,
 * not a hardened service.
 */
final class RestServer(catalog: GraftCatalog, port: Int = 0,
    // OTEL-ONLY mode: the listener serves /v1/metrics (+ /health) and
    // nothing else — the reference binds its otel ingestion API on its
    // own port with no admin surface (`otel_ingestion_api_port`), so a
    // deployment can expose the metrics port to telemetry producers
    // without also exposing table create/drop/ingest
    otelOnly: Boolean = false) {

  private val mapper = new ObjectMapper()
  private val avroSchemas = TrieMap[String, String]() // table -> schema json
  private val lsns = TrieMap[String, AtomicLong]()

  // disable Nagle on accepted sockets: row-at-a-time ingest is many
  // tiny request/response pairs, and the Nagle x delayed-ACK
  // interaction otherwise adds ~40 ms PER REQUEST (measured: the
  // sf0.1 driver entry fell from ~70 ms to ~2 ms per row)
  System.setProperty("sun.net.httpserver.nodelay", "true")
  private val server = HttpServer.create(
    new InetSocketAddress("127.0.0.1", port), 0)
  // daemon threads + explicit shutdown: the embedded server must never
  // keep the host JVM alive (HttpServer.stop does NOT stop a
  // caller-provided executor)
  private val pool = Executors.newFixedThreadPool(4, r => {
    val t = new Thread(r, "graft-rest"); t.setDaemon(true); t
  })
  server.setExecutor(pool)

  def boundPort: Int = server.getAddress.getPort
  def baseUrl: String = s"http://127.0.0.1:$boundPort"

  def start(): RestServer = { server.start(); this }
  def stop(): Unit = { server.stop(0); pool.shutdown() }

  // ---- routing ---------------------------------------------------------

  server.createContext("/", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val method = ex.getRequestMethod
      val path = ex.getRequestURI.getPath.stripSuffix("/")
      try {
        val raw = ex.getRequestBody.readAllBytes()
        val contentType = Option(
          ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
        val (status, body) = route(method, path,
          new String(raw, StandardCharsets.UTF_8), raw, contentType,
          Option(ex.getRequestURI.getQuery).getOrElse(""))
        respond(ex, status, body)
      } catch {
        case e: NoSuchElementException =>
          respond(ex, 404, err(s"not found: ${e.getMessage}"))
        case NonFatal(e) =>
          respond(ex, 400, err(Option(e.getMessage).getOrElse(e.toString)))
      }
    }
  })

  private def route(method: String, path: String, body: String,
      raw: Array[Byte], contentType: String, query: String): (Int, ObjectNode) = {
    val parts = path.split("/").filter(_.nonEmpty).toList
    if (otelOnly && parts.headOption.forall(p => p != "v1" && p != "health"))
      throw new NoSuchElementException(s"$method $path (otel-only listener)")
    (method, parts) match {
      // OTLP/HTTP metrics endpoint (reference otel/service.rs): binary
      // protobuf is the primary encoding, JSON the secondary; the
      // Content-Type header selects, exactly like real collectors
      case ("POST", "v1" :: "metrics" :: Nil) =>
        val table = query.split("&").collectFirst {
          case kv if kv.startsWith("table=") => kv.stripPrefix("table=")
        }.getOrElse(throw new IllegalArgumentException(
          "POST /v1/metrics needs ?table=<otel table>"))
        otlpIngest(table, raw, body, contentType)
      case ("GET", "health" :: Nil) =>
        200 -> obj("service" -> "graft", "status" -> "healthy")
      case ("GET", "tables" :: Nil) => listTables()
      case ("GET", "schema" :: t :: Nil) => fetchSchema(t)
      // the reference's db-qualified form (`rest_api.rs:415`); the
      // single-warehouse server resolves by table name
      case ("GET", "schema" :: _ :: t :: Nil) => fetchSchema(t)
      case ("POST", "tables" :: t :: Nil) => createTable(t, parse(body))
      case ("POST", "upload" :: t :: Nil) => uploadFiles(t, parse(body))
      case ("DELETE", "tables" :: t :: Nil) =>
        // dropMirror also stops a live replication stream and removes
        // the slot + publication from the primary (the reference drops
        // both on table drop, pg_replicate.rs:357-385,475); a plain
        // non-mirror drop degrades to the catalog drop
        PgInitialSync.dropMirror(catalog, t)
        lsns.remove(t); avroSchemas.remove(t)
        200 -> obj()
      case ("POST", "ingest" :: t :: Nil) =>
        ingestRow(t, parse(body), Payload.Json)
      case ("POST", "ingestpb" :: t :: Nil) =>
        ingestRow(t, parse(body), Payload.Proto)
      case ("POST", "kafka" :: t :: "schema" :: Nil) =>
        val r = parse(body)
        avroSchemas(t) = mapper.writeValueAsString(req(r, "kafka_schema"))
        200 -> obj("table" -> t,
          "schema_id" -> Option(r.get("schema_id")).map(_.asLong(0L)).getOrElse(0L))
      case ("POST", "kafka" :: t :: "ingest" :: Nil) =>
        ingestRow(t, parse(body), Payload.Avro)
      case ("POST", "tables" :: t :: "from_postgres" :: Nil) =>
        createFromPostgres(t, parse(body))
      case ("POST", "tables" :: t :: "resume_postgres" :: Nil) =>
        // restart recovery for a mirrored table (the reference restarts
        // replication for every recovered table, recovery_utils.rs:120):
        // src_uri comes from the registry; the SLOT's confirmed position
        // decides where the stream resumes. Shared-stream mirrors
        // re-attach to their URI's ONE stream via the manager.
        val shared = catalog.metadataStore.allEntries()
          .find(e => e.database == catalog.database && e.table == t)
          .exists(e => PgReplicationManager.isShared(e.srcUri))
        val lsn =
          if (shared) PgReplicationManager.resume(catalog, t).boundaryLsn
          else PgInitialSync.resume(catalog, t).boundaryLsn
        200 -> obj("table" -> t, "lsn" -> lsn)
      case ("POST", "tables" :: t :: "stop_postgres" :: Nil) =>
        // deliberate stop (the reference's shutdown(postgres_drop_all),
        // replication_connection.rs:46-47,392): keep_slot=true (the
        // default) leaves slot+publication so resume_postgres catches
        // up from the slot's confirmed position with ZERO re-copy
        val keep = Option(parse(if (body.isEmpty) "{}" else body)
          .get("keep_slot")).forall(_.asBoolean(true))
        PgInitialSync.stopMirror(catalog, t, keepSlot = keep)
        200 -> obj("table" -> t, "keep_slot" -> keep)
      case ("POST", "tables" :: t :: "optimize" :: Nil) =>
        catalog.table(t).optimize(); 200 -> obj()
      case ("POST", "tables" :: t :: "snapshot" :: Nil) =>
        // snapshot = flushed AND published: the manifest version is the
        // durable commit a restarted service recovers (publish() is a
        // no-op when nothing is pending)
        val tbl = catalog.table(t); tbl.flush(); tbl.publish()
        200 -> obj("lsn" -> tbl.commitLsn)
      case ("POST", "tables" :: t :: "flush" :: Nil) =>
        // flush acks durability to the caller, so the manifest commit
        // rides along — without it a WAL-less table's flushed files
        // would be unreachable after restart (no version references them)
        val tbl = catalog.table(t); tbl.flush(); tbl.publish()
        200 -> obj("lsn" -> tbl.flushLsn)
      case _ => throw new NoSuchElementException(s"$method $path")
    }
  }

  // ---- handlers --------------------------------------------------------

  private def listTables(): (Int, ObjectNode) = {
    val arr = mapper.createArrayNode()
    catalog.list.foreach { name =>
      val t = catalog.table(name)
      val row = obj("table" -> name, "commit_lsn" -> t.commitLsn,
        "flush_lsn" -> t.flushLsn)
      // mirror health (reference table_status ingestion state): a
      // mirror whose catch-up thread died must be VISIBLE here, not a
      // silently stale table whose only trace is a stderr line
      catalog.streams.get(name).foreach { s =>
        row.put("replicating", s.alive)
        s.lastError.foreach(e => row.put("repl_error", e.toString))
      }
      arr.add(row)
    }
    val o = mapper.createObjectNode(); o.set[ObjectNode]("tables", arr)
    200 -> o
  }

  /** body: {schema: [FieldSchema...], key_columns: [..] | append_only} */
  private def createTable(name: String, r: JsonNode): (Int, ObjectNode) = {
    val fields = req(r, "schema").elements().asScala.toSeq.map { f =>
      (f.get("name").asText(), f.get("data_type").asText(),
        Option(f.get("nullable")).forall(_.asBoolean(true)))
    }
    val schema = org.apache.spark.sql.types.StructType(
      fields.zipWithIndex.map { case ((n, dt, nn), i) =>
        SchemaDsl.field(n, dt, nn).copy(metadata =
          new org.apache.spark.sql.types.MetadataBuilder()
            .putLong(SchemaDsl.FieldIdKey, i + 1L).build())
      })
    // table_config mirrors the reference's create payload
    // (`rest_api.rs:97` CreateTableRequest.table_config): append_only
    // + buffering knobs, accepted either nested or at the top level
    val tc = Option(r.get("table_config")).getOrElse(r)
    val appendOnly =
      Option(r.get("append_only")).orElse(Option(tc.get("append_only")))
        .exists(_.asBoolean(false))
    val identity =
      if (appendOnly) Identity.None
      else Option(r.get("key_columns")) match {
        case Some(kc) if kc.isArray && kc.size() > 0 =>
          Identity.Keys(kc.elements().asScala.map(_.asText()).toSeq)
        case _ => Identity.None
      }
    var cfg = TableConfig(walEnabled = false)
    Option(tc.get("mem_slice_size")).foreach(n =>
      cfg = cfg.copy(memSliceSize = n.asInt(cfg.memSliceSize)))
    Option(tc.get("wal")).foreach(b =>
      cfg = cfg.copy(walEnabled = b.asBoolean(false)))
    catalog.createTable(name, schema, identity, cfg)
    200 -> obj("table" -> name, "lsn" -> 0L)
  }

  /** POST /tables/{t}/from_postgres (reference `rest_api.rs:410-413`,
   *  `:593-660` CreateTableFromPostgresRequest {database, table,
   *  src_uri, src_table_name, table_config}): mirror an existing
   *  postgres table — schema fetch, USE_SNAPSHOT slot, COPY snapshot,
   *  CDC catch-up from the consistent point, all on one replication
   *  connection ([[PgInitialSync]]). The catch-up stream keeps
   *  applying on a daemon thread after this returns. */
  private def createFromPostgres(name: String, r: JsonNode): (Int, ObjectNode) = {
    val srcUri = req(r, "src_uri").asText()
    val srcTable = req(r, "src_table_name").asText()
    val u = java.net.URI.create(srcUri)
    require(u.getScheme == "postgresql" || u.getScheme == "postgres",
      s"unsupported src_uri scheme: $srcUri")
    val (user, password) = PgInitialSync.credsOf(u)
    val db = Option(u.getPath).map(_.stripPrefix("/")).filter(_.nonEmpty)
      .getOrElse("postgres")
    // table_config rides the create payload like the plain create verb
    // (reference CreateTableFromPostgresRequest.table_config) — but WAL
    // stays ON regardless: the catch-up acks applied txns to the
    // primary, and apply-with-WAL is what makes applied mean durable
    var cfg = TableConfig()
    Option(r.get("table_config")).foreach { tc =>
      Option(tc.get("mem_slice_size")).foreach(n =>
        cfg = cfg.copy(memSliceSize = n.asInt(cfg.memSliceSize)))
    }
    // snapshot width (reference default 4, postgres_source.rs:339):
    // at large scale callers raise it toward the cluster's task
    // parallelism — each shard is one executor-task COPY connection
    val shards = Option(r.get("copy_shards")).map(_.asInt(4)).getOrElse(4)
    // shared_slot = the reference's ReplicationManager deployment
    // shape (replication_manager.rs:22-101): every table of one
    // src_uri multiplexes over ONE connection + slot + publication —
    // mirroring a whole database costs one walsender, not N
    if (Option(r.get("shared_slot")).exists(_.asBoolean(false))) {
      val h = PgReplicationManager.addTable(catalog, name, srcTable,
        host = u.getHost, port = if (u.getPort > 0) u.getPort else 5432,
        user = user, database = db, srcUri = srcUri, config = cfg,
        copyShards = shards, password = password)
      200 -> obj("table" -> name, "lsn" -> h.boundaryLsn,
        "copied_rows" -> h.copiedRows, "shared_slot" -> true)
    } else {
      val res = PgInitialSync.run(catalog, name, srcTable,
        host = u.getHost,
        port = if (u.getPort > 0) u.getPort else 5432,
        user = user, database = db, srcUri = srcUri,
        config = cfg,
        password = password,
        copyShards = shards)
      200 -> obj("table" -> name, "lsn" -> res.boundaryLsn,
        "copied_rows" -> res.copiedRows)
    }
  }

  /** GET /schema/{t}: the table's current schema as the same
   *  FieldSchema list the create endpoint accepts (the reference ships
   *  Arrow IPC bytes, `rest_api.rs:415`; the JSON list is this API's
   *  symmetric transport). */
  private def fetchSchema(name: String): (Int, ObjectNode) = {
    val t = catalog.table(name)
    val arr = mapper.createArrayNode()
    t.schema.fields.foreach { f =>
      val o = mapper.createObjectNode()
      o.put("name", f.name); o.put("data_type", restTypeName(f.dataType))
      o.put("nullable", f.nullable); arr.add(o)
    }
    val o = obj("table" -> name)
    o.set[ObjectNode]("schema", arr)
    200 -> o
  }

  private def restTypeName(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case ShortType => "int16"
      case IntegerType => "int32"
      case LongType => "int64"
      case StringType => "string"
      case BooleanType => "boolean"
      case FloatType => "float32"
      case DoubleType => "float64"
      case DateType => "date32"
      case TimestampType => "timestamp"
      case BinaryType => "binary"
      case d: DecimalType => s"decimal(${d.precision},${d.scale})"
      case ArrayType(et, _) => s"list<${restTypeName(et)}>"
      case other => other.simpleString
    }
  }

  /** POST /upload/{t}: bulk parquet ingestion (`rest_api.rs:420`,
   *  FileEventOperation) — `upload` ADOPTS the files into the table
   *  (no rewrite; the table takes ownership and moves them), `insert`
   *  reads them as rows through the distributed append path. */
  private def uploadFiles(name: String, r: JsonNode): (Int, ObjectNode) = {
    import org.apache.spark.sql.functions._
    val table = catalog.table(name)
    val files = req(r, "files").elements().asScala.map(_.asText()).toSeq
    require(files.nonEmpty, "files must be non-empty")
    val sync = Option(r.get("request_mode")).exists(_.asText() == "sync")
    val lsn = nextLsn(name, table)
    Option(r.get("operation")).map(_.asText()).getOrElse("upload") match {
      case "upload" => table.loadFiles(files, lsn)
      case "insert" =>
        // per-row LSNs from the allocated base (unique-LSN contract of
        // the batch path); the table commits at the batch max and the
        // next allocation resyncs from commitLsn
        val rows = table.spark.read.schema(table.schema).parquet(files: _*)
        graft.streaming.CdcPipeline.applyBatch(table, rows.select(
          lit("i").as("_op") +:
            (monotonically_increasing_id() + lsn).as("_lsn") +:
            table.schema.fieldNames.toSeq.map(col): _*))
      case other =>
        throw new IllegalArgumentException(s"unknown file operation $other")
    }
    val resp = obj("table" -> name)
    if (sync) resp.put("lsn", table.commitLsn)
    200 -> resp
  }

  private object Payload extends Enumeration { val Json, Proto, Avro = Value }

  /** {operation: insert|upsert|delete, data: ..., request_mode} */
  private def ingestRow(name: String, r: JsonNode,
      kind: Payload.Value): (Int, ObjectNode) = {
    val table = catalog.table(name)
    val op = req(r, "operation").asText()
    val sync = Option(r.get("request_mode")).exists(_.asText() == "sync")
    val row = kind match {
      case Payload.Json => JsonIngest.parse(table.schema,
        mapper.writeValueAsString(req(r, "data")))
      case Payload.Proto => ProtoIngest.decodeRow(bytesOf(req(r, "data")),
        table.schema)
      case Payload.Avro =>
        val sch = avroSchemas.getOrElse(name, throw new IllegalArgumentException(
          s"no avro schema declared for $name (POST /kafka/$name/schema first)"))
        val d = req(r, "data")
        if (d.isTextual || d.isArray) AvroIngest.decodeBinaryDatum(sch, bytesOf(d))
        else AvroIngest.decodeJsonDatum(sch, mapper.writeValueAsString(d))
    }
    val lsn = nextLsn(name, table)
    val keyCols = Identity.keyColumns(table.identity,
      table.schema.fieldNames.toSeq)
    def key: Seq[Any] =
      keyCols.map(c => row.get(table.schema.fieldIndex(c)))
    val events: Seq[CdcEvent] = op match {
      case "insert" => Seq(Append(row, lsn), Commit(lsn))
      case "upsert" => CdcEvent.upsert(row, key, lsn) :+ Commit(lsn)
      case "delete" => Seq(Delete(key, lsn), Commit(lsn))
      case other => throw new IllegalArgumentException(s"unknown operation $other")
    }
    val committed = table.apply(events)
    val resp = obj("table" -> name, "operation" -> op)
    if (sync) resp.put("lsn", committed)
    200 -> resp
  }

  /** OTLP/HTTP ExportMetricsServiceRequest → data-point rows appended
   *  to an OtelSchema table in one commit (a request is a txn). */
  private def otlpIngest(name: String, raw: Array[Byte], body: String,
      contentType: String): (Int, ObjectNode) = {
    val table = catalog.table(name)
    val rows: Seq[org.apache.spark.sql.Row] =
      if (contentType.startsWith("application/x-protobuf"))
        OtelPb.decodeRequest(raw)
      else {
        // JSON encoding: the same distributed converter, one-row frame
        val s = table.spark
        import s.implicits._
        OtelIngest.metricsToRows(Seq(body).toDF("p"), "p").collect().toSeq
      }
    val lsn = nextLsn(name, table)
    val committed = table.apply(
      rows.map(r => Append(r, lsn): CdcEvent) :+ Commit(lsn))
    200 -> obj("table" -> name).put("points", rows.length)
      .put("lsn", committed)
  }

  // ---- helpers ---------------------------------------------------------

  /** Allocate the next event LSN for a table — always strictly above
   *  its commitLsn, so bulk operations (whose batch path mints large
   *  monotonic-id LSN ranges) can never leave the counter behind and
   *  let a later delete land BELOW rows it should target. */
  private def nextLsn(name: String, table: GraftTable): Long =
    lsns.getOrElseUpdate(name, new AtomicLong(table.commitLsn))
      .updateAndGet(l => math.max(l, table.commitLsn) + 1)

  /** `data` as raw bytes: base64 string (the JSON-friendly transport
   *  for binary datums) or a JSON array of byte values (serde's
   *  default Vec<u8> encoding, `rest_api.rs:288`). */
  private def bytesOf(n: JsonNode): Array[Byte] =
    if (n.isTextual) java.util.Base64.getDecoder.decode(n.asText())
    else if (n.isArray) n.elements().asScala.map(_.asInt().toByte).toArray
    else throw new IllegalArgumentException(s"binary data must be base64 or byte array")

  private def parse(body: String): JsonNode =
    if (body.trim.isEmpty) mapper.createObjectNode() else mapper.readTree(body)

  private def req(r: JsonNode, field: String): JsonNode =
    Option(r.get(field)).filterNot(_.isNull).getOrElse(
      throw new IllegalArgumentException(s"missing field: $field"))

  private def obj(kvs: (String, Any)*): ObjectNode = {
    val o = mapper.createObjectNode()
    kvs.foreach {
      case (k, v: String) => o.put(k, v)
      case (k, v: Long) => o.put(k, v)
      case (k, v: Int) => o.put(k, v)
      case (k, v: Boolean) => o.put(k, v)
      case (k, v) => o.put(k, String.valueOf(v))
    }
    o
  }

  private def err(msg: String): ObjectNode = obj("message" -> msg)

  private def respond(ex: HttpExchange, status: Int, body: ObjectNode): Unit = {
    val bytes = mapper.writeValueAsBytes(body)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}

object RestServer {
  /** Start on an ephemeral loopback port. */
  def start(catalog: GraftCatalog): RestServer =
    new RestServer(catalog).start()
}
