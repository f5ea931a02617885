package graft.sources

import graft.model.{CdcEvent, Commit, Identity, StreamAbort}
import graft.table.{GraftCatalog, GraftTable, ReplicationHandle, TableConfig}

import scala.collection.mutable

/**
 * Multi-table replication off ONE connection + ONE slot per source URI
 * — the reference's deployment architecture
 * (`moonlink_connectors/src/replication_manager.rs:22-101`
 * get_or_create_connection keyed by src_uri + add_table;
 * `replication_connection.rs` one stream per connection;
 * `pg_replicate.rs:114` one publication per database, tables joining
 * it via `ALTER PUBLICATION … ADD TABLE` `clients/postgres.rs:145`,
 * leaving via `ALTER PUBLICATION … DROP TABLE` `pg_replicate.rs:382`).
 *
 * Versus the per-table path ([[PgInitialSync.run]]), mirroring N
 * tables of one database costs ONE walsender, ONE slot's WAL
 * retention, and ONE pgoutput decode on the primary instead of N of
 * each — the difference between "mirror a table" and "mirror a
 * database" at production scale.
 *
 * Lifecycle per the reference:
 *   - first table for a URI: connect `replication=database`, DROP+
 *     CREATE the shared publication (`pg_replicate.rs:114` boot
 *     idiom), get-or-create the shared slot, then per-table add;
 *   - per-table add (`pg_replicate.rs:240-308` perform_initial_copy):
 *     `ALTER PUBLICATION ADD TABLE` FIRST (its CDC events start
 *     accumulating), snapshot copy on a DEDICATED plain connection —
 *     boundary = `pg_current_wal_lsn()` inside the exported-snapshot
 *     txn (`clients/postgres.rs:212-228` export_snapshot_and_lsn),
 *     ctid shards as Spark executor tasks — and while the copy runs
 *     the shared stream keeps applying to every OTHER table, this
 *     table's traffic held in a bounded buffer
 *     (`table_handler.rs:838-840` initial_copy_buffered_events);
 *     replay discards txns committed at-or-below the boundary
 *     (`table_handler.rs:376` initial_persistence_lsn);
 *   - per-table drop: `ALTER PUBLICATION DROP TABLE` + route removal
 *     — the stream keeps serving the remaining tables;
 *   - stop: keep-slot by default (`replication_connection.rs:46-47,
 *     392` postgres_drop_all = false) so a restarted process resumes
 *     from the slot's confirmed position with ZERO re-copy;
 *     `keepSlot = false` is the reference's drop-all shutdown.
 *
 * Event routing: every route owns a [[PgOutput.Session]] fed the SAME
 * frame bytes; a session ignores DML for other relation OIDs (the
 * reference's per-src_table_id sink routing, `moonlink_sink.rs:
 * 127-150`). Acks to the primary carry the MINIMUM applied position
 * across tables (`pg_replicate.rs:651-675`
 * compute_confirmed_wal_flush_lsn) — the slot may only trim WAL every
 * table has durably applied.
 */
object PgReplicationManager {
  /** srcUri marker distinguishing shared-stream mirrors in the durable
   *  registry, so restart recovery resumes them through the manager
   *  (postgres URIs carry query params natively; this one is ours). */
  val SharedMarker = "graft_shared=1"
  def markShared(uri: String): String =
    if (uri.contains(SharedMarker)) uri
    else uri + (if (uri.contains("?")) "&" else "?") + SharedMarker
  def isShared(uri: String): Boolean = uri.contains(SharedMarker)

  /** one registry of shared streams per catalog (weak: a dropped
   *  catalog must not pin its streams' memory) */
  private val byCatalog = new java.util.WeakHashMap[GraftCatalog,
    mutable.LinkedHashMap[String, SharedStream]]()

  private def registry(catalog: GraftCatalog)
      : mutable.LinkedHashMap[String, SharedStream] =
    byCatalog.synchronized {
      var m = byCatalog.get(catalog)
      if (m == null) {
        m = mutable.LinkedHashMap[String, SharedStream]()
        byCatalog.put(catalog, m)
      }
      m
    }

  private def uriKey(host: String, port: Int, database: String): String =
    s"$host:$port/$database"

  /** Mirrors whose stopMirror(keepSlot=false) already ran — their
   *  deferred whole-URI drop intent. A catalog-registered shared
   *  mirror NOT in this set and not currently streaming is DORMANT
   *  (stopped keepSlot=true, or simply not resumed yet): it still owns
   *  the shared slot's confirmed position as its zero-re-copy resume
   *  point, so a sibling's keepSlot=false stop must not drop the slot
   *  (ADVICE r17). In-memory only, weak-keyed like the stream
   *  registry: after a process restart every registered mirror reads
   *  as dormant again, which fails SAFE — the slot is retained, never
   *  dropped out from under a mirror that wanted to resume. */
  private val dropIntents =
    new java.util.WeakHashMap[GraftCatalog, mutable.Set[String]]()
  private[sources] def recordDropIntent(catalog: GraftCatalog,
      table: String): Unit =
    dropIntents.synchronized {
      var s = dropIntents.get(catalog)
      if (s == null) { s = mutable.Set[String](); dropIntents.put(catalog, s) }
      s += table; ()
    }
  private[sources] def hasDropIntent(catalog: GraftCatalog,
      table: String): Boolean =
    dropIntents.synchronized {
      val s = dropIntents.get(catalog)
      s != null && s.contains(table)
    }

  /** true while a live shared stream still serves this URI with
   *  attached routes — its slot + publication are then load-bearing
   *  for OTHER mirrors, and dropping them on the primary would
   *  terminate their walsender and strand every reconnect on class-42
   *  errors. Probes routes OUTSIDE the registry monitor (lock order:
   *  never registry→stream while holding the monitor). */
  private[sources] def sharedInUse(catalog: GraftCatalog, host: String,
      port: Int, database: String): Boolean = {
    val reg = registry(catalog)
    val s = reg.synchronized(reg.get(uriKey(host, port, database)))
    s.exists(st => st.usable && st.routeNames.nonEmpty)
  }

  /** Get-or-create the shared stream for a source URI (the manager's
   *  `get_or_create_connection`). First call for a URI connects and
   *  sets up the shared publication + slot. */
  private def getOrCreate(catalog: GraftCatalog, host: String, port: Int,
      user: String, database: String, password: Option[String],
      maxReconnects: Int): SharedStream = {
    val reg = registry(catalog)
    reg.synchronized {
      val key = uriKey(host, port, database)
      reg.get(key).filter(_.usable) match {
        case Some(s) => s
        case scala.None =>
          val s = new SharedStream(catalog, host, port, user, database,
            password, maxReconnects, onClosed = () =>
              reg.synchronized { reg.remove(key); () })
          s.bootstrap()
          reg.put(key, s)
          s
      }
    }
  }

  /** Mirror `srcTableName` into graft table `name` over the URI's
   *  SHARED stream (the manager's `add_table`). */
  def addTable(catalog: GraftCatalog, name: String, srcTableName: String,
      host: String, port: Int, user: String, database: String,
      srcUri: String, config: TableConfig = TableConfig(),
      copyShards: Int = 4, maxReconnects: Int = 5,
      password: Option[String] = scala.None): SharedStream.TableHandle = {
    require(name.matches("[a-z_][a-z0-9_]*"),
      s"mirror table name must be [a-z0-9_], got '$name'")
    require(!catalog.streams.get(name).exists(_.alive),
      s"table $name already has a live replication stream")
    val shared = getOrCreate(catalog, host, port, user, database, password,
      maxReconnects)
    // a (re-)attached mirror is live again: any deferred drop intent
    // from an earlier stopMirror(keepSlot=false) no longer stands
    dropIntents.synchronized {
      val s = dropIntents.get(catalog); if (s != null) { s -= name; () }
    }
    shared.addTable(name, srcTableName, markShared(srcUri), config,
      copyShards)
  }

  /** Restart recovery for a shared-stream mirror: re-attach the table
   *  to its URI's shared stream (re-created on first use — the
   *  reference re-adds recovered tables with `is_recovery = true`,
   *  skipping the copy, `pg_replicate.rs:260` / `replication_manager
   *  .rs:96`). The resume position comes from the SLOT; redelivered
   *  txns at-or-below the table's commit LSN are skipped whole. */
  def resume(catalog: GraftCatalog, name: String,
      maxReconnects: Int = 5): SharedStream.TableHandle = {
    require(!catalog.streams.get(name).exists(_.alive),
      s"table $name already has a live replication stream")
    val entry = catalog.metadataStore.allEntries()
      .find(e => e.database == catalog.database && e.table == name)
      .getOrElse(throw new NoSuchElementException(
        s"table ${catalog.database}.$name is not registered"))
    require(isShared(entry.srcUri), s"$name is not a shared-stream mirror")
    val u = java.net.URI.create(entry.srcUri)
    val (user, password) = PgInitialSync.credsOf(u)
    val db = Option(u.getPath).map(_.stripPrefix("/")).filter(_.nonEmpty)
      .getOrElse("postgres")
    val port = if (u.getPort > 0) u.getPort else 5432
    val shared = getOrCreate(catalog, u.getHost, port, user, db, password,
      maxReconnects)
    // resuming clears any deferred drop intent (see recordDropIntent)
    dropIntents.synchronized {
      val s = dropIntents.get(catalog); if (s != null) { s -= name; () }
    }
    shared.resumeTable(name, entry.srcTableName)
  }

  /** Drop a shared-stream mirror: `ALTER PUBLICATION DROP TABLE` on
   *  the primary, detach its route (the stream keeps serving the other
   *  tables), then the catalog drop. The slot + publication stay — the
   *  reference only removes those on drop-all shutdown. */
  def dropMirror(catalog: GraftCatalog, name: String): Unit = {
    val reg = registry(catalog)
    // snapshot under the registry monitor, probe routes OUTSIDE it:
    // hasRoute takes the stream's own lock, and a stream's close path
    // (held under that lock on addTable failure) re-enters the
    // registry monitor via onClosed — probing under both orders ABBA
    val all = reg.synchronized(reg.values.toList)
    all.find(_.hasRoute(name)).foreach(_.dropTable(name))
    catalog.dropTable(name)
  }

  /** Stop every shared stream of this catalog. `keepSlot = true` (the
   *  reference's `postgres_drop_all = false`) leaves slot+publication
   *  on the primary so a restart resumes with zero re-copy. */
  def stopAll(catalog: GraftCatalog, keepSlot: Boolean = true): Unit = {
    val reg = registry(catalog)
    val all = reg.synchronized(reg.values.toList)
    all.foreach(_.stop(keepSlot))
  }
}

object SharedStream {
  /** the catalog-visible handle of ONE table on a shared stream */
  final class TableHandle(shared: SharedStream, val name: String,
      /** rows copied by this table's snapshot phase (0 on resume) */
      val copiedRows: Long,
      /** snapshot boundary LSN (table.commitLsn floor on resume) */
      val boundaryLsn: Long,
      /** rows decoded outside Spark tasks — 0 proves the executor path */
      val driverCopiedRows: Long) extends ReplicationHandle {
    override def alive: Boolean = shared.streaming && shared.hasRoute(name)
    override def lastError: Option[Throwable] = shared.lastError
    /** detach THIS table; the stream keeps serving the others (the
     *  last detach stops the stream, slot kept) */
    override def stop(): Unit = shared.detach(name)
  }
}

/**
 * One shared replication connection + slot serving every mirrored
 * table of one source URI (the reference's `ReplicationConnection`).
 * All route mutation and frame processing synchronize on `lock`: a
 * table joins or leaves BETWEEN frames, never mid-frame.
 */
final class SharedStream(catalog: GraftCatalog, host: String, port: Int,
    user: String, database: String, password: Option[String],
    maxReconnects: Int, onClosed: () => Unit) {
  import PgInitialSync.{cleanupReplication, copyShardRows, identPart,
    planCtidShards, schemaOf}

  /** slot/publication are PER SOURCE DATABASE (reference
   *  `moonlink_slot_{db}` / `moonlink_pub`, `pg_replicate.rs:114-128`) */
  val slot = s"graft_slot_${database.toLowerCase.replaceAll("[^a-z0-9_]", "_")}"
  val pub = s"graft_pub_${database.toLowerCase.replaceAll("[^a-z0-9_]", "_")}"

  private val lock = new Object
  /** live routes keyed by graft table name */
  private final class Route(val name: String, val srcNs: String,
      val srcRelName: String,
      val table: GraftTable, var sess: PgOutput.Session,
      val buf: mutable.ArrayBuffer[CdcEvent], var appliedWal: Long)
  private val routes = mutable.LinkedHashMap[String, Route]()
  /** tables mid-copy: raw pgoutput payloads held until the boundary is
   *  known (the reference's initial_copy_buffered_events) — bounded by
   *  the copy window's WAL volume, and only txn-boundary + this
   *  table's own messages are kept */
  private final class Pending(val srcNs: String, val srcRelName: String,
      /** ack-floor pin: the slot may not trim past the position this
       *  buffer started at — its contents are MEMORY, not durable, so
       *  a reconnect must be able to re-deliver them (the reference
       *  pins the same way: a mid-copy table's wal_flush watermark is
       *  0 in compute_confirmed_wal_flush_lsn, pg_replicate.rs:651) */
      val floorWal: Long) {
    val bytes = mutable.ArrayBuffer[Array[Byte]]()
    /** relation OID once its Relation message names it */
    var relId: Int = -1
    /** v2 streamed-segment context for the byte filter */
    var inStreamSeg = false
  }
  private val pendings = mutable.LinkedHashMap[String, Pending]()

  @volatile private var err: Option[Throwable] = scala.None
  @volatile private var stopRequested = false
  @volatile private var closed = false
  @volatile private var thread: Thread = null
  @volatile private var curRef: PgSyncClient = null
  /** last LSN acked to the primary (the floor when routes is empty) */
  @volatile private var lastAck = 0L

  def usable: Boolean = !closed
  def streaming: Boolean = thread != null && thread.isAlive
  def lastError: Option[Throwable] = err
  def hasRoute(name: String): Boolean = lock.synchronized(routes.contains(name))
  def routeNames: Seq[String] = lock.synchronized(routes.keys.toSeq)

  /** First-use setup: replication connection, shared publication
   *  (DROP+CREATE, the reference's boot idiom — recovered tables
   *  re-ADD themselves), shared slot (create-or-adopt: 42710 means a
   *  previous process left it, the keep-slot recovery contract). */
  private var boot: PgSyncClient = null
  private[sources] def bootstrap(): Unit = {
    val c = new PgSyncClient(host, port, user, database, password = password)
    c.connect()
    try {
      c.simpleQuery(s"DROP PUBLICATION IF EXISTS $pub;")
      c.simpleQuery(s"CREATE PUBLICATION $pub;")
      try {
        c.simpleQuery("begin read only isolation level repeatable read;")
        c.createSlotUseSnapshot(slot)
        c.simpleQuery("commit;")
      } catch {
        case e: PgWire.ServerError if e.sqlState == "42710" =>
          // slot survives from a keep-slot shutdown: adopt it — its
          // confirmed position is exactly where the stream resumes
          try c.simpleQuery("commit;") catch { case _: Throwable => () }
      }
      boot = c // becomes the first stream connection
    } catch { case t: Throwable => c.close(); throw t }
  }

  /** The manager's add_table: publication membership first, snapshot
   *  copy as Spark executor tasks on a dedicated connection, buffered
   *  CDC replay above the boundary. */
  private[sources] def addTable(name: String, srcTableName: String,
      srcUri: String, config: TableConfig,
      copyShards: Int): SharedStream.TableHandle = {
    val (ns, tbl) = splitSrc(srcTableName)
    val sqlc = new PgSyncClient(host, port, user, database,
      replication = false, password = password)
    sqlc.connect()
    var created = false
    var inPub = false
    try {
      val cols = sqlc.fetchColumns(ns, tbl)
      require(cols.nonEmpty, s"source table $srcTableName has no columns")
      val keys = cols.filter(_.primary).map(_.name)
      val identity =
        if (keys.nonEmpty) Identity.Keys(keys) else Identity.None
      val table = catalog.createTable(name, schemaOf(cols), identity,
        config, srcTableName = srcTableName, srcUri = srcUri)
      created = true
      // REPLICA IDENTITY FULL before membership (reference
      // alter_table_replica_identity, pg_replicate.rs:229-236,493)
      sqlc.simpleQuery(s"ALTER TABLE $ns.$tbl REPLICA IDENTITY FULL;")
      // buffering starts BEFORE the table joins the publication: no
      // event can slip between membership and the buffer's birth; the
      // buffer pins the ack floor at the CURRENT confirmed position so
      // a blip can re-deliver everything it will ever hold
      lock.synchronized { pendings(name) = new Pending(ns, tbl, ackFloor()) }
      sqlc.simpleQuery(s"ALTER PUBLICATION $pub ADD TABLE $ns.$tbl;")
      inPub = true
      // snapshot: boundary + snapshot id from ONE txn (the reference's
      // export_snapshot_and_lsn), shards imported by executor tasks
      sqlc.simpleQuery("begin read only isolation level repeatable read;")
      val (_, lsnRows) = sqlc.simpleQuery("SELECT pg_current_wal_lsn();")
      val boundary = sqlc.parseLsn(lsnRows.head.head.get)
      val snapId = sqlc.exportSnapshot()
      val blocks = sqlc.blockCount(ns, tbl)
      val spark = table.spark
      val staging = s"${table.root}/copy-staging"
      val colList = cols
        .map(c => "\"" + c.name.replace("\"", "\"\"") + "\"")
        .mkString(", ")
      val preds = planCtidShards(blocks, math.max(1, copyShards))
      val execRows =
        spark.sparkContext.longAccumulator("graft-pg-copy-exec-rows")
      val driverRows =
        spark.sparkContext.longAccumulator("graft-pg-copy-driver-rows")
      val copySqls = preds.map(pred =>
        s"COPY (SELECT $colList FROM $ns.$tbl WHERE $pred) TO STDOUT " +
          "WITH (FORMAT text);")
      val (h, p, u, d, pw, tc) = (host, port, user, database, password, cols)
      val rdd = spark.sparkContext
        .parallelize(copySqls, copySqls.length)
        .flatMap(sql => copyShardRows(h, p, u, d, snapId, sql, tc,
          execRows, driverRows, pw))
      spark.createDataFrame(rdd, schemaOf(cols)).write.parquet(staging)
      sqlc.simpleQuery("commit;")
      val copied = execRows.value + driverRows.value
      if (copied > 0)
        table.initialCopy(
          spark.read.schema(table.schema).parquet(staging), boundary)
      graft.format.Fio.delete(staging)
      attachRoute(name, ns, tbl, table, boundary)
      ensureStreaming()
      val handle = new SharedStream.TableHandle(this, name, copied,
        boundary, driverRows.value)
      catalog.streams.put(name, handle)
      handle
    } catch { case t: Throwable =>
      lock.synchronized { pendings.remove(name); routes.remove(name) }
      if (inPub)
        try sqlc.simpleQuery(s"ALTER PUBLICATION $pub DROP TABLE $ns.$tbl;")
        catch { case _: Throwable => () }
      if (created) try catalog.dropTable(name) catch { case _: Throwable => () }
      // first-table failure with nothing streaming: tear the shared
      // setup down so a retry starts clean. Decide under `lock`, close
      // OUTSIDE it — close() fires onClosed which takes the registry
      // monitor, and holding `lock` across that inverts dropMirror's
      // registry→stream order (ABBA)
      val tearDown = lock.synchronized {
        routes.isEmpty && pendings.isEmpty && !streaming
      }
      if (tearDown) close(keepSlot = false)
      throw t
    } finally sqlc.close()
  }

  /** Re-attach a recovered table: re-join the (recreated) publication,
   *  route from the table's own commit LSN — NO copy (the reference's
   *  is_recovery add). */
  private[sources] def resumeTable(name: String,
      srcTableName: String): SharedStream.TableHandle = {
    val (ns, tbl) = splitSrc(srcTableName)
    val table = catalog.table(name)
    val sqlc = new PgSyncClient(host, port, user, database,
      replication = false, password = password)
    sqlc.connect()
    try {
      try sqlc.simpleQuery(s"ALTER PUBLICATION $pub ADD TABLE $ns.$tbl;")
      catch { case e: PgWire.ServerError if e.sqlState == "42710" => () }
      attachRoute(name, ns, tbl, table, table.commitLsn)
      ensureStreaming()
      val handle = new SharedStream.TableHandle(this, name, 0L,
        table.commitLsn, 0L)
      catalog.streams.put(name, handle)
      handle
    } finally sqlc.close()
  }

  /** ALTER PUBLICATION DROP TABLE + route removal; remaining tables
   *  keep streaming (the reference's drop_table_from_replication). */
  private[sources] def dropTable(name: String): Unit = {
    // the registry entry carries the schema-qualified source name
    val srcFull = catalog.metadataStore.allEntries()
      .find(e => e.database == catalog.database && e.table == name)
      .map(_.srcTableName)
      .orElse(lock.synchronized(
        routes.get(name).map(r => s"${r.srcNs}.${r.srcRelName}")))
    srcFull.foreach { full =>
      val (ns, tbl) = splitSrc(full)
      try {
        val c = new PgSyncClient(host, port, user, database,
          replication = false, connectTimeoutMs = 5000, password = password)
        c.connect()
        try c.simpleQuery(s"ALTER PUBLICATION $pub DROP TABLE $ns.$tbl;")
        catch { case _: PgWire.ServerError => () } finally c.close()
      } catch { case _: Throwable => () }
    }
    detach(name)
  }

  /** Remove a table's route; the LAST route stops the stream (slot
   *  kept — keep-slot is the default shutdown). */
  private[sources] def detach(name: String): Unit = {
    val last = lock.synchronized {
      pendings.remove(name)
      routes.remove(name)
      routes.isEmpty && pendings.isEmpty
    }
    if (last) stop(keepSlot = true)
  }

  /** Stop the shared stream. keepSlot = the reference's
   *  `postgres_drop_all = false`: slot + publication stay on the
   *  primary and a restarted process resumes from the slot's confirmed
   *  position with zero re-copy. */
  def stop(keepSlot: Boolean = true): Unit = {
    stopRequested = true
    val t = thread
    val c = curRef
    if (c != null) try c.close() catch { case _: Throwable => () }
    if (t != null) t.join(30000)
    close(keepSlot)
  }

  private def close(keepSlot: Boolean): Unit = {
    if (!closed) {
      closed = true
      if (boot != null) try boot.close() catch { case _: Throwable => () }
      if (!keepSlot)
        cleanupReplication(host, port, user, database, slot, pub, password)
      onClosed()
    }
  }

  // -- internals ----------------------------------------------------------

  private def splitSrc(srcTableName: String): (String, String) =
    srcTableName.split('.') match {
      case Array(a, b) => (identPart(a, "src schema"), identPart(b, "src table"))
      case Array(b) => ("public", identPart(b, "src table"))
      case _ => throw new IllegalArgumentException(
        s"src_table_name must be [schema.]table, got $srcTableName")
    }

  private def freshSession(srcNs: String, srcRelName: String,
      table: GraftTable, floor: Long): PgOutput.Session = {
    val keys = table.identity match {
      case Identity.Keys(k) => k
      case _ => Nil
    }
    new PgOutput.Session(srcRelName, keys, firstLsn = floor + 1,
      skipCommitsAtOrBelow = floor,
      // schema-qualified Relation match: two members may share a
      // relname across schemas on one shared stream
      srcNamespace = Some(srcNs))
  }

  /** Promote a copied/recovered table to a live route, replaying its
   *  buffered stream bytes above the boundary. Runs under the frame
   *  lock: the stream is between frames while a table joins. */
  private def attachRoute(name: String, srcNs: String, srcRelName: String,
      table: GraftTable, boundary: Long): Unit = lock.synchronized {
    val floor = math.max(boundary, table.commitLsn)
    val sess = freshSession(srcNs, srcRelName, table, floor)
    val route = new Route(name, srcNs, srcRelName, table, sess,
      mutable.ArrayBuffer[CdcEvent](), appliedWal = floor)
    pendings.remove(name).foreach { p =>
      // replay from the first txn boundary: a partial leading txn
      // began before the table joined the publication and its commits
      // are at-or-below the boundary by construction. Relation
      // messages always replay — they are schema registrations the
      // session needs BEFORE the first DML, wherever they landed.
      var started = false
      p.bytes.foreach { bytes =>
        if (!started)
          started = bytes.nonEmpty &&
            (bytes(0) == 'B'.toByte || bytes(0) == 'S'.toByte)
        if (started || (bytes.nonEmpty && bytes(0) == 'R'.toByte)) {
          route.buf ++= route.sess.onMessage(bytes)
          if (route.buf.lastOption.exists(_.isInstanceOf[Commit])) {
            table.apply(route.buf.toSeq)
            route.buf.clear()
          }
        }
      }
    }
    routes(name) = route
  }

  /** txn-boundary + this-table-only byte filter for a pending buffer:
   *  keeps memory bounded by the NEW table's own churn during its copy
   *  window, not the whole database's. */
  private def offerPending(p: Pending, bytes: Array[Byte]): Unit = {
    if (bytes.isEmpty) return
    val tag = bytes(0).toChar
    tag match {
      case 'B' | 'C' | 'c' | 'A' => p.bytes += bytes
      case 'S' => p.inStreamSeg = true; p.bytes += bytes
      case 'E' => p.inStreamSeg = false; p.bytes += bytes
      case 'R' =>
        // relid lives after the optional stream xid
        val off = if (p.inStreamSeg) 5 else 1
        val relId = java.nio.ByteBuffer.wrap(bytes, off, 4).getInt
        // Relation carries namespace+name as cstrings right after
        // relid — BOTH must match (a.users vs b.users are different
        // publication members)
        val nameMatches = {
          val rest = bytes.drop(off + 4)
          val z1 = rest.indexOf(0.toByte)
          val z2 = rest.indexOf(0.toByte, z1 + 1)
          z1 >= 0 && z2 > z1 &&
            new String(rest, 0, z1,
              java.nio.charset.StandardCharsets.UTF_8) == p.srcNs &&
            new String(rest, z1 + 1, z2 - z1 - 1,
              java.nio.charset.StandardCharsets.UTF_8) == p.srcRelName
        }
        if (nameMatches) { p.relId = relId; p.bytes += bytes }
      case 'I' | 'U' | 'D' =>
        val off = if (p.inStreamSeg) 5 else 1
        val relId = java.nio.ByteBuffer.wrap(bytes, off, 4).getInt
        if (relId == p.relId) p.bytes += bytes
      case 'T' => p.bytes += bytes // tiny; the session decides relevance
      case _ => () // Type/Origin metadata
    }
  }

  /** the primary may trim WAL only to the minimum applied position
   *  across tables (reference compute_confirmed_wal_flush_lsn) — and
   *  never past a PENDING buffer's start: its contents are in-memory
   *  only, so the slot must be able to re-deliver them after a blip
   *  (the reconnect path clears the buffer and relies on exactly
   *  that). An ack lower than an earlier one is fine — the slot keeps
   *  its max. */
  private def ackFloor(): Long = lock.synchronized {
    val base =
      if (routes.isEmpty) lastAck
      else routes.values.map(_.appliedWal).min
    val floor = (Seq(base) ++ pendings.values.map(_.floorWal)).min
    if (pendings.isEmpty) lastAck = math.max(lastAck, floor)
    floor
  }

  /** Start the shared stream if it is not running (first table, or
   *  first table after a stop). START_REPLICATION at 0/0: the SLOT's
   *  confirmed position decides — fresh slot = its consistent point,
   *  adopted slot = exactly where the previous process acked. */
  private def ensureStreaming(): Unit = lock.synchronized {
    if (streaming) return
    if (stopRequested || closed) throw new IllegalStateException(
      "shared stream is stopped")
    if (thread != null) {
      // RESTART after a previous stream thread ended (clean server end
      // or terminal error): the surviving routes' sessions carry
      // skip floors from the OLD stream's start, which predate their
      // applied positions — START_REPLICATION resumes from the slot's
      // confirmed position and would redeliver already-applied txns
      // past those stale floors (double-apply / monotonicity trip).
      // Rebuild every session at its table's APPLIED floor and drop
      // pending buffer contents (the ack floor never moved past a
      // pending's start, so the resumed stream re-delivers every
      // buffered frame), exactly as the in-thread reconnect path does.
      routes.values.foreach { r =>
        r.buf.clear()
        val floor = math.max(r.table.commitLsn, 0L)
        r.sess = freshSession(r.srcNs, r.srcRelName, r.table, floor)
      }
      pendings.values.foreach { p =>
        p.bytes.clear()
        p.inStreamSeg = false
      }
    }
    err = scala.None // the revived stream starts with a clean slate
    val first = if (boot != null) { val b = boot; boot = null; b } else {
      val c = new PgSyncClient(host, port, user, database,
        password = password)
      c.connect()
      c
    }
    curRef = first
    val FlushEvents = 50000
    thread = new Thread(() => {
      var cur = first
      var connected = true
      var attempts = 0
      var done = false
      while (!done) {
        try {
          if (!connected) {
            cur = new PgSyncClient(host, port, user, database,
              password = password)
            curRef = cur
            cur.connect()
            connected = true
            // every route resumes at ITS applied floor: sessions are
            // rebuilt so redelivered txns skip per-table. PENDING
            // buffers drop their contents — the ack floor never moved
            // past their start (see Pending.floorWal), so the resumed
            // stream re-delivers every buffered frame; keeping them
            // would feed the replay session the same txn twice
            lock.synchronized {
              routes.values.foreach { r =>
                r.buf.clear()
                val floor = math.max(r.table.commitLsn, 0L)
                r.sess = freshSession(r.srcNs, r.srcRelName, r.table, floor)
              }
              pendings.values.foreach { p =>
                p.bytes.clear()
                p.inStreamSeg = false
              }
            }
          }
          cur.startReplication(slot, pub, 0L, ackLsn = () => ackFloor()) {
            (bytes, walEnd) => lock.synchronized {
              pendings.values.foreach(p => offerPending(p, bytes))
              routes.values.foreach { r =>
                r.buf ++= r.sess.onMessage(bytes)
                val committed =
                  r.buf.lastOption.exists(_.isInstanceOf[Commit])
                if (committed || r.buf.size >= FlushEvents) {
                  r.table.apply(r.buf.toSeq)
                  r.buf.clear()
                  if (committed) { r.appliedWal = walEnd; attempts = 0 }
                }
              }
            }
          }
          done = true // clean server-ended stream
        } catch {
          case t: java.io.IOException
              if !stopRequested && attempts < maxReconnects &&
                (t match {
                  case se: PgWire.ServerError => !se.sqlState.startsWith("42")
                  case _ => true
                }) =>
            attempts += 1
            lock.synchronized {
              routes.values.foreach { r =>
                r.buf.clear()
                r.sess.inFlightXids.foreach(x =>
                  r.table.apply(Seq(StreamAbort(x))))
                r.sess.rollbackUncommitted()
              }
            }
            try cur.close() catch { case _: Throwable => () }
            connected = false
            Thread.sleep(math.min(60000L, 1000L * attempts))
          case t: Throwable =>
            done = true
            if (!stopRequested) {
              err = Some(t)
              System.err.println(
                s"[graft-pg-shared] $host:$port/$database stream stopped: $t")
            }
        }
      }
      try cur.close() catch { case _: Throwable => () }
    }, s"graft-pg-shared-$database")
    thread.setDaemon(true)
    thread.start()
  }
}
