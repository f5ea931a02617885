package graft.tools

import graft.sources.{RestServer, RpcServer, RpcTcpServer}
import graft.streaming.MaintenanceDaemon
import graft.table.GraftCatalog
import org.apache.spark.sql.SparkSession

/**
 * The standalone service process — the deployment surface of the
 * reference's `moonlink-service` CLI (`moonlink_service/src/main.rs`:
 * base path + REST port 3030 + TCP port 3031 + OTEL port 3435, each
 * individually disable-able):
 *
 *   sbt "runMain graft.tools.Serve /data/warehouse \
 *        [--rest-port 3030] [--tcp-port 3031] [--otel-port 3435] \
 *        [--no-rest] [--no-tcp] [--no-otel] [--maintenance-ms 300000] \
 *        [--metadata-uri postgresql://user@host:5432/db]"
 *
 * One process = one SparkSession + one [[GraftCatalog]] over the base
 * path, shared by every transport:
 *  - REST (S3): table create/drop/list, row + protobuf + Kafka/Avro
 *    ingest, optimize/snapshot/flush control verbs, sync/async LSN ack;
 *  - TCP RPC (S12): the u32-framed binary protocol, scan-state blobs
 *    for external readers;
 *  - OTEL (S6): a dedicated listener whose `/v1/metrics` endpoint
 *    takes OTLP protobuf or JSON by Content-Type (the reference binds
 *    its otel API on its own port, `otel_ingestion_api_port`);
 *  - the maintenance daemon (M15) ticks snapshots/compaction in the
 *    background, as the reference's timer loop does.
 */
object Serve {

  final case class Config(
      basePath: String,
      restPort: Option[Int] = Some(3030),
      tcpPort: Option[Int] = Some(3031),
      otelPort: Option[Int] = Some(3435),
      maintenanceMs: Long = 300000L,
      /** registry location (reference moonlink_service/src/main.rs
       *  wires its metadata store from the CLI at boot): None = the
       *  versioned-JSON store under the warehouse;
       *  postgresql://user@host:port/db = the wire backend speaking
       *  the reference `tables` schema over the engine's own client */
      metadataUri: Option[String] = None,
      /** engine-write throttle "(bandwidthBytes/s, burstBytes)" — the
       *  reference's accessor ThrottleConfig: bounds manifest/WAL/DV/
       *  export egress against an object store's prefix limits */
      writeThrottle: Option[(Long, Long)] = None)

  final class Handle(
      val catalog: GraftCatalog,
      val rest: Option[RestServer],
      val otel: Option[RestServer],
      val tcp: Option[RpcTcpServer],
      val daemon: MaintenanceDaemon) {
    /** every live replication stream the catalog tracks — boot-resumed
     *  mirrors AND those created/resumed over REST while serving (the
     *  r14 gap: REST-created mirrors outlived stop()) */
    def mirrors: Seq[(String, graft.table.ReplicationHandle)] =
      catalog.streams.toSeq
    def stop(): Unit = {
      // close replication streams first so no apply races the shutdown
      mirrors.foreach(m =>
        try m._2.stop() catch { case _: Throwable => () })
      daemon.stop()
      tcp.foreach(_.stop())
      otel.foreach(_.stop())
      rest.foreach(_.stop())
    }
  }

  def start(spark: SparkSession, cfg: Config): Handle = {
    cfg.writeThrottle.foreach { case (bw, burst) =>
      graft.format.Fio.setThrottle(bw, burst) }
    // service start = backend recovery: reopen every registered table
    // in the warehouse (the reference's `recover_all_tables` on boot,
    // `recovery_utils.rs:120-170`); registry entries whose directory
    // never materialized are warned about, not fatal
    val (catalog, missing) = GraftCatalog.recover(spark, cfg.basePath,
      backend = cfg.metadataUri.map(backendFor).orNull)
    missing.foreach(e => System.err.println(
      s"[graft-serve] WARN registered table ${e.table} has no manifest; skipped"))
    val rest = cfg.restPort.map(p => new RestServer(catalog, p).start())
    // the OTEL port serves ONLY /v1/metrics + /health (reference model:
    // the otel ingestion port has no admin surface)
    val otel = cfg.otelPort.map(p =>
      new RestServer(catalog, p, otelOnly = true).start())
    // one RpcServer per CONNECTION: scan pins are handle-scoped
    val tcp = cfg.tcpPort.map(p =>
      new RpcTcpServer(() => new RpcServer(catalog), p).start())
    val daemon = new MaintenanceDaemon(catalog,
      maintenanceEveryMs = cfg.maintenanceMs).start()
    val handle = new Handle(catalog, rest, otel, tcp, daemon)
    // recovery also RESTARTS replication for postgres mirrors (the
    // reference restarts each recovered table's connector,
    // `recovery_utils.rs:120-170`): the slot's confirmed position — kept
    // at the last applied commit by the conservative ack discipline —
    // decides where each stream resumes. Runs on its OWN thread so an
    // unreachable source (connect timeout) delays nothing: the
    // transports above are already serving, and
    // `POST /tables/{t}/resume_postgres` retries any mirror that failed.
    val resumeThread = new Thread(() => {
      catalog.metadataStore.allEntries()
        .filter(e => e.database == catalog.database &&
          (e.srcUri.startsWith("postgresql://") ||
            e.srcUri.startsWith("postgres://")) &&
          catalog.list.contains(e.table))
        .foreach { e =>
          try {
            // resume registers itself in catalog.streams (the handle's
            // mirrors view and the shutdown drain both read from there);
            // shared-stream mirrors re-attach to their URI's ONE stream
            if (graft.sources.PgReplicationManager.isShared(e.srcUri))
              graft.sources.PgReplicationManager.resume(catalog, e.table)
            else
              graft.sources.PgInitialSync.resume(catalog, e.table)
            System.err.println(
              s"[graft-serve] resumed postgres mirror ${e.table}")
          } catch {
            case t: Throwable => System.err.println(
              s"[graft-serve] WARN cannot resume mirror ${e.table}: ${t.getMessage}")
          }
        }
    }, "graft-serve-resume")
    resumeThread.setDaemon(true)
    resumeThread.start()
    handle
  }

  /** Instantiate the registry backend a `--metadata-uri` names — the
   *  deployment seam the reference's CLI has at boot
   *  (`moonlink_service/src/main.rs` → `base_metadata_store.rs:14-68`):
   *  the catalog's registry can live in Postgres while table data stays
   *  under the warehouse path. */
  def backendFor(uri: String): graft.table.MetadataBackend = {
    val u = java.net.URI.create(uri)
    u.getScheme match {
      case "postgresql" | "postgres" =>
        val (user, password) = graft.sources.PgInitialSync.credsOf(u)
        new graft.table.PgWireMetadataBackend(u.getHost,
          if (u.getPort > 0) u.getPort else 5432,
          user,
          Option(u.getPath).map(_.stripPrefix("/")).filter(_.nonEmpty)
            .getOrElse("postgres"),
          password)
      case other => throw new IllegalArgumentException(
        s"unsupported --metadata-uri scheme: $other (postgresql:// only)")
    }
  }

  def parseArgs(args: Array[String]): Config = {
    require(args.nonEmpty, "usage: Serve <base-path> [flags]")
    var cfg = Config(basePath = args.head)
    var i = 1
    def value(flag: String): String = {
      require(i + 1 < args.length, s"$flag needs a value")
      args(i + 1)
    }
    while (i < args.length) {
      args(i) match {
        case "--rest-port" =>
          cfg = cfg.copy(restPort = Some(value("--rest-port").toInt)); i += 2
        case "--tcp-port" =>
          cfg = cfg.copy(tcpPort = Some(value("--tcp-port").toInt)); i += 2
        case "--otel-port" =>
          cfg = cfg.copy(otelPort = Some(value("--otel-port").toInt)); i += 2
        case "--maintenance-ms" =>
          cfg = cfg.copy(maintenanceMs = value("--maintenance-ms").toLong); i += 2
        case "--metadata-uri" =>
          cfg = cfg.copy(metadataUri = Some(value("--metadata-uri"))); i += 2
        case "--write-throttle" =>
          // "BYTES_PER_SEC[:BURST]"; burst defaults to one second's worth
          val parts = value("--write-throttle").split(":")
          val bw = parts(0).toLong
          cfg = cfg.copy(writeThrottle = Some(
            (bw, if (parts.length > 1) parts(1).toLong else bw)))
          i += 2
        case "--no-rest" => cfg = cfg.copy(restPort = None); i += 1
        case "--no-tcp" => cfg = cfg.copy(tcpPort = None); i += 1
        case "--no-otel" => cfg = cfg.copy(otelPort = None); i += 1
        case other => throw new IllegalArgumentException(s"unknown flag $other")
      }
    }
    cfg
  }

  def main(args: Array[String]): Unit = {
    val cfg = parseArgs(args)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-serve")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val h = start(spark, cfg)
    h.rest.foreach(r => println(s"[graft-serve] REST  ${r.baseUrl}"))
    h.otel.foreach(r => println(s"[graft-serve] OTEL  ${r.baseUrl}/v1/metrics"))
    h.tcp.foreach(t => println(s"[graft-serve] RPC   127.0.0.1:${t.boundPort}"))
    println(s"[graft-serve] warehouse ${cfg.basePath}")
    val done = new java.util.concurrent.CountDownLatch(1)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      h.stop(); done.countDown()
    }))
    done.await() // serve until SIGTERM/SIGINT
  }
}
