package graft.format

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import java.net.{InetSocketAddress, URI}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.Executors
import scala.collection.concurrent.TrieMap
import scala.util.control.NonFatal

/**
 * Iceberg-REST-catalog-protocol client + server for graft manifests
 * (reference `storage/table/iceberg/rest_catalog.rs:96-186`, which
 * speaks the same endpoints through the iceberg-rust client; the
 * protocol is the Apache Iceberg REST OpenAPI spec and needs no
 * Iceberg jar — it is plain HTTP + JSON).
 *
 * Endpoints (v1):
 *   GET    /v1/config                                  — catalog config
 *   GET    /v1/namespaces                              — list
 *   POST   /v1/namespaces                              — create
 *   GET    /v1/namespaces/{ns}                         — exists/props
 *   DELETE /v1/namespaces/{ns}                         — drop
 *   GET    /v1/namespaces/{ns}/tables                  — list
 *   POST   /v1/namespaces/{ns}/tables                  — create/register
 *   GET    /v1/namespaces/{ns}/tables/{t}              — load
 *   POST   /v1/namespaces/{ns}/tables/{t}              — commit
 *   DELETE /v1/namespaces/{ns}/tables/{t}              — drop
 *
 * The commit body carries Iceberg-style `requirements` — the
 * optimistic-concurrency contract: `assert-create` (table must not
 * exist yet) and `assert-ref-snapshot-id` (the caller's view of the
 * current snapshot must still be current) — answered with 409 when
 * violated, exactly the retry trigger the reference's update_table
 * path surfaces (`rest_catalog.rs:167`).
 *
 * Honest scope: the catalog tracks (metadata-location, snapshot-id)
 * pointers for GRAFT manifest versions — our "mooncake-lite" format —
 * not Iceberg metadata.json. The pointer-swap protocol is the real
 * thing; translating manifests into Iceberg's metadata/manifest-list
 * files stays the documented adapter seam blocked on an Iceberg
 * runtime jar (SURVEY S8).
 */
object RestCatalog {

  final case class TableRef(namespace: String, name: String,
      metadataLocation: String, snapshotId: Long)

  // ---- client ----------------------------------------------------------

  final class Client(baseUrl: String) {
    private val mapper = new ObjectMapper()

    private def http(method: String, path: String,
        body: String = ""): (Int, JsonNode) = {
      val conn = URI.create(baseUrl + path).toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod(method)
      if (body.nonEmpty) {
        conn.setRequestProperty("Content-Type", "application/json")
        conn.setDoOutput(true)
        val b = body.getBytes(UTF_8)
        conn.setFixedLengthStreamingMode(b.length)
        val os = conn.getOutputStream
        try os.write(b) finally os.close()
      }
      val code = conn.getResponseCode
      val is = if (code < 400) conn.getInputStream else conn.getErrorStream
      val text = new String(is.readAllBytes(), UTF_8)
      is.close()
      (code, if (text.isEmpty) mapper.createObjectNode() else mapper.readTree(text))
    }

    private def expect(code: Int, r: (Int, JsonNode)): JsonNode = {
      require(r._1 == code, s"catalog: expected $code, got ${r._1}: ${r._2}")
      r._2
    }

    def config(): JsonNode = expect(200, http("GET", "/v1/config"))

    def createNamespace(ns: String): Unit =
      expect(200, http("POST", "/v1/namespaces",
        s"""{"namespace":["$ns"],"properties":{}}"""))

    def listNamespaces(): Seq[String] = {
      import scala.jdk.CollectionConverters._
      expect(200, http("GET", "/v1/namespaces")).get("namespaces")
        .elements().asScala.map(_.get(0).asText()).toSeq
    }

    /** Register a table at its initial metadata location. */
    def createTable(ns: String, name: String, metadataLocation: String,
        snapshotId: Long): Unit =
      expect(200, http("POST", s"/v1/namespaces/$ns/tables",
        s"""{"name":"$name","metadata-location":"$metadataLocation",
           |"snapshot-id":$snapshotId,
           |"requirements":[{"type":"assert-create"}]}""".stripMargin))

    def loadTable(ns: String, name: String): TableRef = {
      val r = expect(200, http("GET", s"/v1/namespaces/$ns/tables/$name"))
      TableRef(ns, name, r.get("metadata-location").asText(),
        r.get("snapshot-id").asLong())
    }

    def tableExists(ns: String, name: String): Boolean =
      http("GET", s"/v1/namespaces/$ns/tables/$name")._1 == 200

    /** Optimistic commit: swing the pointer iff the catalog still sits
     *  at `expectedSnapshotId`. Returns false on a 409 conflict (the
     *  caller reloads and retries — reference update_table contract). */
    def commitTable(ns: String, name: String, expectedSnapshotId: Long,
        newMetadataLocation: String, newSnapshotId: Long): Boolean = {
      val r = http("POST", s"/v1/namespaces/$ns/tables/$name",
        s"""{"requirements":[
           |  {"type":"assert-ref-snapshot-id","ref":"main",
           |   "snapshot-id":$expectedSnapshotId}],
           |"updates":[
           |  {"action":"set-location","location":"$newMetadataLocation"},
           |  {"action":"set-snapshot-ref","ref-name":"main",
           |   "snapshot-id":$newSnapshotId}]}""".stripMargin)
      r._1 match {
        case 200 => true
        case 409 => false
        case other => throw new IllegalStateException(
          s"catalog commit: unexpected $other: ${r._2}")
      }
    }

    def dropTable(ns: String, name: String): Unit =
      expect(200, http("DELETE", s"/v1/namespaces/$ns/tables/$name"))
  }

  // ---- server ----------------------------------------------------------

  /** In-process catalog speaking the endpoints above, holding pointer
   *  state in memory (one atomic map — the catalog's whole job is the
   *  compare-and-swap on that map). */
  final class Server(port: Int = 0) {
    private val mapper = new ObjectMapper()
    private val namespaces = TrieMap[String, Boolean]()
    private val tables = TrieMap[(String, String), (String, Long)]()

    System.setProperty("sun.net.httpserver.nodelay", "true")
    private val server = HttpServer.create(
      new InetSocketAddress("127.0.0.1", port), 0)
    private val pool = Executors.newFixedThreadPool(2, r => {
      val t = new Thread(r, "graft-iceberg-rest"); t.setDaemon(true); t
    })
    server.setExecutor(pool)

    def boundPort: Int = server.getAddress.getPort
    def baseUrl: String = s"http://127.0.0.1:$boundPort"
    def start(): Server = { server.start(); this }
    def stop(): Unit = { server.stop(0); pool.shutdown() }

    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        try {
          val (code, body) = route(ex.getRequestMethod,
            ex.getRequestURI.getPath.stripSuffix("/"),
            new String(ex.getRequestBody.readAllBytes(), UTF_8))
          respond(ex, code, body)
        } catch {
          case NonFatal(e) => respond(ex, 500,
            err(Option(e.getMessage).getOrElse(e.toString)))
        }
      }
    })

    private def route(method: String, path: String,
        body: String): (Int, ObjectNode) = {
      val parts = path.split("/").filter(_.nonEmpty).toList
      (method, parts) match {
        case ("GET", "v1" :: "config" :: Nil) =>
          val o = mapper.createObjectNode()
          o.set[ObjectNode]("defaults", mapper.createObjectNode())
          o.set[ObjectNode]("overrides", mapper.createObjectNode())
          200 -> o
        case ("GET", "v1" :: "namespaces" :: Nil) =>
          val o = mapper.createObjectNode()
          val arr = mapper.createArrayNode()
          namespaces.keys.toSeq.sorted.foreach { ns =>
            val inner = mapper.createArrayNode(); inner.add(ns); arr.add(inner)
          }
          o.set[ObjectNode]("namespaces", arr)
          200 -> o
        case ("POST", "v1" :: "namespaces" :: Nil) =>
          val ns = mapper.readTree(body).get("namespace").get(0).asText()
          if (namespaces.putIfAbsent(ns, true).isDefined)
            409 -> err(s"namespace $ns exists")
          else 200 -> obj("namespace" -> ns)
        case ("GET", "v1" :: "namespaces" :: ns :: Nil) =>
          if (namespaces.contains(ns)) 200 -> obj("namespace" -> ns)
          else 404 -> err(s"no namespace $ns")
        case ("DELETE", "v1" :: "namespaces" :: ns :: Nil) =>
          namespaces.remove(ns); 200 -> obj()
        case ("GET", "v1" :: "namespaces" :: ns :: "tables" :: Nil) =>
          val o = mapper.createObjectNode()
          val arr = mapper.createArrayNode()
          tables.keys.filter(_._1 == ns).map(_._2).toSeq.sorted
            .foreach(arr.add)
          o.set[ObjectNode]("identifiers", arr)
          200 -> o
        case ("POST", "v1" :: "namespaces" :: ns :: "tables" :: Nil) =>
          if (!namespaces.contains(ns)) 404 -> err(s"no namespace $ns")
          else {
            val r = mapper.readTree(body)
            val name = r.get("name").asText()
            val loc = r.get("metadata-location").asText()
            val snap = r.get("snapshot-id").asLong()
            // assert-create: the only requirement valid at create time
            if (tables.putIfAbsent((ns, name), (loc, snap)).isDefined)
              409 -> err(s"table $ns.$name exists (assert-create failed)")
            else 200 -> tableJson(ns, name, loc, snap)
          }
        case ("GET", "v1" :: "namespaces" :: ns :: "tables" :: t :: Nil) =>
          tables.get((ns, t)) match {
            case Some((loc, snap)) => 200 -> tableJson(ns, t, loc, snap)
            case scala.None => 404 -> err(s"no table $ns.$t")
          }
        case ("POST", "v1" :: "namespaces" :: ns :: "tables" :: t :: Nil) =>
          commit(ns, t, mapper.readTree(body))
        case ("DELETE", "v1" :: "namespaces" :: ns :: "tables" :: t :: Nil) =>
          tables.remove((ns, t)); 200 -> obj()
        case _ => 404 -> err(s"$method $path")
      }
    }

    /** The catalog's whole job: requirements-checked pointer CAS. */
    private def commit(ns: String, t: String,
        r: JsonNode): (Int, ObjectNode) = {
      import scala.jdk.CollectionConverters._
      tables.get((ns, t)) match {
        case scala.None => 404 -> err(s"no table $ns.$t")
        case Some(cur @ (_, curSnap)) =>
          val reqs = Option(r.get("requirements")).toSeq
            .flatMap(_.elements().asScala)
          val violated = reqs.exists { q =>
            q.get("type").asText() match {
              case "assert-ref-snapshot-id" =>
                q.get("snapshot-id").asLong() != curSnap
              case "assert-create" => true // table exists
              case other =>
                throw new IllegalArgumentException(s"unknown requirement $other")
            }
          }
          if (violated)
            409 -> err(s"requirement failed: current snapshot $curSnap")
          else {
            val ups = Option(r.get("updates")).toSeq
              .flatMap(_.elements().asScala)
            var (loc, snap) = cur
            ups.foreach { u =>
              u.get("action").asText() match {
                case "set-location" => loc = u.get("location").asText()
                case "set-snapshot-ref" => snap = u.get("snapshot-id").asLong()
                case other =>
                  throw new IllegalArgumentException(s"unknown update $other")
              }
            }
            // CAS on the map entry: a racing commit that got here first
            // already moved curSnap and the replace fails -> 409
            if (tables.replace((ns, t), cur, (loc, snap)))
              200 -> tableJson(ns, t, loc, snap)
            else 409 -> err("concurrent commit won the race")
          }
      }
    }

    private def tableJson(ns: String, t: String, loc: String,
        snap: Long): ObjectNode = {
      val o = obj("namespace" -> ns, "name" -> t)
      o.put("metadata-location", loc)
      o.put("snapshot-id", snap)
      o
    }

    private def obj(kvs: (String, String)*): ObjectNode = {
      val o = mapper.createObjectNode()
      kvs.foreach { case (k, v) => o.put(k, v) }
      o
    }
    private def err(m: String): ObjectNode = obj("message" -> m)

    private def respond(ex: HttpExchange, code: Int, body: ObjectNode): Unit = {
      val b = mapper.writeValueAsBytes(body)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, b.length)
      val os = ex.getResponseBody
      try os.write(b) finally os.close()
    }
  }
}
