package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import graft.model.{CdcEvent, Commit, Identity, SchemaDsl}
import graft.table.{GraftCatalog, GraftTable, TableConfig}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{MetadataBuilder, StructType}

import scala.collection.mutable

/**
 * S2 over the wire: the reference's single-connection snapshot +
 * catch-up protocol (`pg_replicate/clients/postgres.rs`), behind the
 * REST verb `POST /tables/{t}/from_postgres` (`rest_api.rs:410-413`,
 * `:593-660` CreateTableFromPostgresRequest):
 *
 *   1. connect with `replication=database` — SQL and replication verbs
 *      are both legal on such a connection (the mode the reference
 *      relies on, `clients/postgres.rs:806` note);
 *   2. fetch column schemas + primary-key membership with the catalog
 *      query over pg_attribute/pg_index (`:270-315`);
 *   3. `begin read only isolation level repeatable read` (`:106-113`);
 *   4. `CREATE_REPLICATION_SLOT <slot> LOGICAL pgoutput USE_SNAPSHOT`
 *      → `consistent_point` (`:806-833`) — the boundary LSN: the
 *      slot's snapshot sees exactly the WAL prefix at that point;
 *   5. `COPY (SELECT cols FROM t WHERE pred) TO STDOUT WITH (FORMAT
 *      text)` inside that snapshot (`:247-267`) — rows stream through
 *      a bounded buffer to parquet staging, never all in memory;
 *   6. commit, then `START_REPLICATION SLOT .. LOGICAL
 *      <consistent_point> ..` (`:921`): CDC catch-up begins exactly
 *      where the snapshot ended, so no event is ever dropped or
 *      double-applied (the USE_SNAPSHOT contract replaces the
 *      buffering InitialCopy needs when copy and stream overlap).
 *
 * No PG server exists in the build sandbox, so the dialogue is
 * exercised against [[PgMockPrimary]] — a real TCP listener scripting
 * every response — keeping the client honest about framing without
 * fabricating a database. Only a live postgres endpoint remains
 * environment-dependent.
 */
object PgCopyText {
  /** One COPY text-format row: tab-separated, newline-terminated,
   *  `\N` for NULL plus the backslash escapes the format emits. */
  def encode(row: Seq[Option[String]]): Array[Byte] = {
    val sb = new StringBuilder
    row.zipWithIndex.foreach { case (v, i) =>
      if (i > 0) sb += '\t'
      v match {
        case scala.None => sb ++= "\\N"
        case Some(s) => s.foreach {
          case '\\' => sb ++= "\\\\"
          case '\t' => sb ++= "\\t"
          case '\n' => sb ++= "\\n"
          case '\r' => sb ++= "\\r"
          case '\b' => sb ++= "\\b"
          case '\f' => sb ++= "\\f"
          case c if c == 11.toChar => sb ++= "\\v"
          case c => sb += c
        }
      }
    }
    sb += '\n'
    sb.toString.getBytes(UTF_8)
  }

  /** Decode one line (without its trailing newline). */
  def decodeLine(line: String): Seq[Option[String]] = {
    val fields = mutable.ArrayBuffer[Option[String]]()
    val cur = new StringBuilder
    var isNull = false
    def endField(): Unit = {
      fields += (if (isNull && cur.isEmpty) scala.None else Some(cur.toString))
      cur.clear(); isNull = false
    }
    var i = 0
    while (i < line.length) {
      line.charAt(i) match {
        case '\t' => endField()
        case '\\' if i + 1 < line.length =>
          i += 1
          line.charAt(i) match {
            case 'N' => isNull = true
            case 't' => cur += '\t'
            case 'n' => cur += '\n'
            case 'r' => cur += '\r'
            case 'b' => cur += '\b'
            case 'f' => cur += '\f'
            case 'v' => cur += 11.toChar
            case c => cur += c // incl. '\\'
          }
        case c => cur += c
      }
      i += 1
    }
    endField()
    fields.toSeq
  }
}

/** One source column as the reference's schema query returns it
 *  (`clients/postgres.rs:300-315`: attname, atttypid, atttypmod,
 *  attnotnull, primary-key membership). */
final case class PgColumn(name: String, typeOid: Int, typeMod: Int,
    notNull: Boolean, primary: Boolean)

/**
 * v3 simple-query + replication client over ONE
 * `replication=database` connection — the reference's
 * `ReplicationClient` shape. Authenticates via trust, cleartext, md5
 * or SCRAM-SHA-256 ([[PgAuth]] — the modern primary default).
 */
final class PgSyncClient(host: String, port: Int, user: String,
    database: String,
    // replication=database makes START_REPLICATION legal but requires
    // the REPLICATION role attribute; plain-SQL users (the metadata
    // registry) connect without it
    replication: Boolean = true,
    connectTimeoutMs: Int = 15000,
    // password for cleartext/md5/SCRAM-SHA-256 auth ([[PgAuth]]);
    // None = trust-only (the server asking anyway fails loudly)
    password: Option[String] = scala.None) {
  private var sock: Socket = null
  private var in: DataInputStream = null
  private var out: PgWire.MsgOut = null
  @volatile var flushedLsn: Long = 0L

  def connect(): Unit = {
    sock = new Socket()
    // a blackholed host must fail fast, not hang a boot for the OS
    // connect timeout
    sock.connect(new java.net.InetSocketAddress(host, port), connectTimeoutMs)
    sock.setTcpNoDelay(true)
    in = new DataInputStream(sock.getInputStream)
    out = new PgWire.MsgOut(new DataOutputStream(sock.getOutputStream))
    out.sendStartup(
      Seq("user" -> user, "database" -> database) ++
        (if (replication) Seq("replication" -> "database") else Nil) ++
        Seq("application_name" -> "graft"))
    var ready = false
    while (!ready) PgWire.readMessage(in) match {
      case Some(('R', body)) =>
        val code = ByteBuffer.wrap(body).getInt
        if (code != 0) PgAuth.authenticate(code,
          java.util.Arrays.copyOfRange(body, 4, body.length), in, out,
          user, password)
      case Some(('S', _)) | Some(('K', _)) | Some(('N', _)) => ()
      case Some(('Z', _)) => ready = true
      case Some(('E', body)) => throw pgError(body)
      case Some((t, _)) =>
        throw new java.io.IOException(s"unexpected startup message '$t'")
      case scala.None => throw new EOFException("server closed during startup")
    }
  }

  def close(): Unit = if (sock != null) sock.close()

  private def pgError(body: Array[Byte]) = PgWire.serverError(body)

  /** Every verb below must fail as a TRANSPORT error on an unconnected
   *  client (a reconnect attempt that never completed), not NPE — the
   *  retry loops treat IOException as a blip and anything else as
   *  fatal, so an NPE would kill a mirror that still has retry
   *  budget. */
  private def ensureConnected(): Unit =
    if (out == null) throw new java.io.IOException("client is not connected")

  private def q(sql: String): Array[Byte] = sql.getBytes(UTF_8) :+ 0.toByte

  /** Simple query: returns (RowDescription fields as (name, typOid,
   *  typMod), DataRows as text values). Commands without a result set
   *  return empty on both sides. A backend error surfaces as
   *  [[PgWire.ServerError]] (SQLSTATE-aware). */
  def simpleQuery(sql: String)
      : (Seq[(String, Int, Int)], Seq[Seq[Option[String]]]) = {
    val (f, r, _) = simpleQueryT(sql)
    (f, r)
  }

  /** [[simpleQuery]] plus the CommandComplete tags ("INSERT 0 1",
   *  "DELETE 1", ...) — the affected-row accounting SQL callers need. */
  def simpleQueryT(sql: String): (Seq[(String, Int, Int)],
      Seq[Seq[Option[String]]], Seq[String]) = {
    ensureConnected()
    out.send('Q', q(sql))
    var fields = Seq.empty[(String, Int, Int)]
    val rows = mutable.ArrayBuffer[Seq[Option[String]]]()
    val tags = mutable.ArrayBuffer[String]()
    var open = true
    while (open) PgWire.readMessage(in) match {
      case Some(('T', b)) => fields = parseRowDescription(b)
      case Some(('D', b)) => rows += parseDataRow(b)
      case Some(('C', b)) =>
        tags += new String(b, UTF_8).takeWhile(_ != 0.toChar)
      case Some(('S', _)) | Some(('N', _)) => ()
      case Some(('E', b)) => throw pgError(b)
      case Some(('Z', _)) => open = false
      case Some((t, _)) =>
        throw new java.io.IOException(s"unexpected message '$t' in query")
      case scala.None => throw new EOFException("server closed mid-query")
    }
    (fields, rows.toSeq, tags.toSeq)
  }

  private def parseRowDescription(b: Array[Byte]): Seq[(String, Int, Int)] = {
    val bb = ByteBuffer.wrap(b)
    val n = bb.getShort.toInt
    (0 until n).map { _ =>
      val name = cstr(bb)
      bb.getInt; bb.getShort // table oid, attnum
      val typOid = bb.getInt
      bb.getShort // typlen
      val typMod = bb.getInt
      bb.getShort // format
      (name, typOid, typMod)
    }
  }

  private def parseDataRow(b: Array[Byte]): Seq[Option[String]] = {
    val bb = ByteBuffer.wrap(b)
    val n = bb.getShort.toInt
    (0 until n).map { _ =>
      val len = bb.getInt
      if (len < 0) scala.None
      else {
        val v = new Array[Byte](len); bb.get(v)
        Some(new String(v, UTF_8))
      }
    }
  }

  private def cstr(bb: ByteBuffer): String = {
    val o = new java.io.ByteArrayOutputStream()
    var c = bb.get()
    while (c != 0) { o.write(c); c = bb.get() }
    new String(o.toByteArray, UTF_8)
  }

  /** The reference's column-schema catalog query
   *  (`clients/postgres.rs:270-315`), shape-identical so a real
   *  primary answers it: name, type oid, typmod, not-null, pk. */
  def fetchColumns(namespace: String, table: String): Seq[PgColumn] = {
    val (_, rows) = simpleQuery(
      s"""select a.attname, a.atttypid, a.atttypmod, a.attnotnull,
         |  coalesce(i.indisprimary, false) as primary
         |from pg_attribute a
         |left join pg_index i on a.attrelid = i.indrelid
         |  and a.attnum = any(i.indkey) and i.indisprimary = true
         |where a.attrelid = '$namespace.$table'::regclass
         |  and a.attnum > 0::int2 and not a.attisdropped
         |order by a.attnum;""".stripMargin)
    rows.map { r =>
      def bool(v: Option[String]) = v.exists(s => s == "t" || s == "true")
      PgColumn(r(0).get, r(1).get.toInt, r(2).get.toInt, bool(r(3)), bool(r(4)))
    }
  }

  /** `CREATE_REPLICATION_SLOT .. LOGICAL pgoutput USE_SNAPSHOT` inside
   *  the open read-only txn; returns the consistent_point LSN
   *  (`clients/postgres.rs:806-833`). */
  def createSlotUseSnapshot(slot: String): Long = {
    val (fields, rows) = simpleQuery(
      s"CREATE_REPLICATION_SLOT $slot LOGICAL pgoutput USE_SNAPSHOT")
    val i = fields.indexWhere(_._1 == "consistent_point")
    require(i >= 0 && rows.nonEmpty,
      "CREATE_REPLICATION_SLOT returned no consistent_point")
    parseLsn(rows.head(i).get)
  }

  /** `SELECT pg_export_snapshot()` inside the open txn — the snapshot
   *  id worker connections import so every copy shard reads the SAME
   *  consistent cut (`clients/postgres.rs:212-228`
   *  export_snapshot_and_lsn). */
  def exportSnapshot(): String = {
    val (_, rows) = simpleQuery("SELECT pg_export_snapshot();")
    require(rows.nonEmpty && rows.head.head.isDefined,
      "pg_export_snapshot returned nothing")
    rows.head.head.get
  }

  /** Relation block-count estimate for ctid shard planning
   *  (`clients/postgres.rs:166-176`), inlined for the simple-query
   *  protocol. */
  def blockCount(namespace: String, table: String): Long = {
    val (_, rows) = simpleQuery(
      s"SELECT ((pg_relation_size(to_regclass('$namespace.$table')) + " +
        "current_setting('block_size')::int - 1) / " +
        "current_setting('block_size')::int) AS blocks;")
    rows.headOption.flatMap(_.head).map(_.toLong).getOrElse(0L)
  }

  /** Worker side: begin a repeatable-read txn and import the
   *  coordinator's exported snapshot (`clients/postgres.rs:231-245`
   *  begin_with_snapshot). */
  def beginWithSnapshot(snapshotId: String): Unit = {
    simpleQuery("begin read only isolation level repeatable read;")
    simpleQuery(s"SET TRANSACTION SNAPSHOT '$snapshotId';")
  }

  /** "X/Y" hex text LSN → 64-bit WAL position. */
  def parseLsn(s: String): Long = s.split('/') match {
    case Array(hi, lo) =>
      (java.lang.Long.parseLong(hi, 16) << 32) | java.lang.Long.parseLong(lo, 16)
    case _ => throw new IllegalArgumentException(s"bad LSN text: $s")
  }

  def lsnText(v: Long): String = PgWire.lsnText(v)

  /** COPY .. TO STDOUT (text format): stream rows to `onRow` one at a
   *  time — driver memory stays one row + one CopyData frame no matter
   *  the table size. Returns rows copied. */
  def copyOut(sql: String)(onRow: Seq[Option[String]] => Unit): Long = {
    ensureConnected()
    out.send('Q', q(sql))
    var n = 0L
    // 0x0A never occurs inside a UTF-8 multi-byte sequence, so a
    // byte-level newline scan is safe across CopyData chunk boundaries.
    // Scan by OFFSET and compact once per frame — per-row array drops
    // would make a many-row frame quadratic in its byte size.
    var buf = Array.empty[Byte]
    var open = true
    while (open) PgWire.readMessage(in) match {
      case Some(('H', _)) => () // CopyOutResponse
      case Some(('d', b)) =>
        buf = if (buf.isEmpty) b else buf ++ b
        var start = 0
        var nl = buf.indexOf('\n'.toByte, start)
        while (nl >= 0) {
          onRow(PgCopyText.decodeLine(
            new String(buf, start, nl - start, UTF_8)))
          n += 1
          start = nl + 1
          nl = buf.indexOf('\n'.toByte, start)
        }
        buf = if (start == 0) buf
              else if (start >= buf.length) Array.empty[Byte]
              else buf.drop(start)
      case Some(('c', _)) | Some(('C', _)) => ()
      case Some(('E', b)) => throw pgError(b)
      case Some(('Z', _)) => open = false
      case Some((t, _)) =>
        throw new java.io.IOException(s"unexpected message '$t' in COPY")
      case scala.None => throw new EOFException("server closed mid-COPY")
    }
    require(buf.isEmpty, "truncated COPY row at stream end")
    n
  }

  /** COPY .. TO STDOUT as a PULL iterator — the executor-task shape:
   *  a Spark task drains this lazily, so rows flow socket → decode →
   *  parquet writer inside the task with one row + one CopyData frame
   *  in memory, never through the driver. Leaves the connection at
   *  ReadyForQuery when the stream ends cleanly. */
  def copyOutIterator(sql: String): Iterator[Seq[Option[String]]] = {
    ensureConnected()
    out.send('Q', q(sql))
    new Iterator[Seq[Option[String]]] {
      private var buf = Array.empty[Byte]
      private var pos = 0
      private var streamOpen = true

      private def nextNl(): Int = buf.indexOf('\n'.toByte, pos)

      /** pull frames until a full line is buffered or the stream ends;
       *  true iff a line is available (buffered tail lines drain after
       *  the server's ReadyForQuery too) */
      private def fill(): Boolean = {
        var nl = nextNl()
        while (nl < 0 && streamOpen) {
          PgWire.readMessage(in) match {
            case Some(('H', _)) => () // CopyOutResponse
            case Some(('d', b)) =>
              // compact the consumed prefix once per frame, then append
              buf = (if (pos == 0) buf
                     else if (pos >= buf.length) Array.empty[Byte]
                     else buf.drop(pos)) ++ b
              pos = 0
            case Some(('c', _)) | Some(('C', _)) => ()
            case Some(('E', b)) => throw pgError(b)
            case Some(('Z', _)) => streamOpen = false
            case Some((t, _)) =>
              throw new java.io.IOException(s"unexpected message '$t' in COPY")
            case scala.None => throw new EOFException("server closed mid-COPY")
          }
          nl = nextNl()
        }
        if (nl < 0 && !streamOpen)
          require(pos >= buf.length, "truncated COPY row at stream end")
        nl >= 0
      }

      override def hasNext: Boolean = fill()
      override def next(): Seq[Option[String]] = {
        if (!hasNext) throw new NoSuchElementException("COPY exhausted")
        val nl = nextNl()
        val line = new String(buf, pos, nl - pos, UTF_8)
        pos = nl + 1
        PgCopyText.decodeLine(line)
      }
    }
  }

  /** START_REPLICATION from `startLsn` on this connection
   *  (`clients/postgres.rs:921`), then the copy-both loop: XLogData
   *  payloads to `onFrame`, reply-requested keepalives acked at the
   *  max WAL seen. Returns when the primary ends the stream. */
  /** START_REPLICATION from `startLsn` (0 = let the slot's
   *  confirmed_flush_lsn decide — the restart-recovery path), then the
   *  shared copy-both loop. `ackLsn` supplies the DURABLE position for
   *  standby-status replies: the mirror acks only applied transaction
   *  boundaries, never the in-memory receive watermark, so a crash
   *  between receive and apply can never trim the slot past
   *  unapplied WAL. */
  def startReplication(slot: String, publication: String, startLsn: Long,
      ackLsn: () => Long = null)(
      onFrame: (Array[Byte], Long) => Unit): Unit = {
    ensureConnected()
    out.send('Q', q(s"START_REPLICATION SLOT $slot LOGICAL " +
      s"${lsnText(startLsn)} (proto_version '2', " +
      s"publication_names '$publication')"))
    flushedLsn =
      PgWire.copyBothLoop(in, out, startLsn, onFrame, l => flushedLsn = l,
        ackLsn)
  }
}

/**
 * Orchestrates the snapshot+catch-up (the body of the REST verb).
 * The copy stages to parquet in bounded chunks; the catch-up stream
 * keeps applying on a daemon thread until the primary ends it (a real
 * primary never does; the scripted one does, which is how tests join).
 */
object PgInitialSync {
  final case class Result(boundaryLsn: Long, copiedRows: Long,
      catchUp: Thread, error: () => Option[Throwable],
      /** stop replication: close the stream and let the thread exit
       *  without logging an error (service shutdown path) */
      stopImpl: () => Unit,
      /** rows that were decoded OUTSIDE a Spark task (always 0 when
       *  the snapshot job ran distributed — the spec-visible proof
       *  that the initial copy never stages through the driver) */
      driverCopiedRows: Long = 0L) extends graft.table.ReplicationHandle {
    override def alive: Boolean = catchUp.isAlive
    override def lastError: Option[Throwable] = error()
    override def stop(): Unit = stopImpl()
  }

  /** CTID-range shard predicates (`postgres_source.rs:339-368`
   *  plan_ctid_shards, ceil-divided block space); one shard or an
   *  unknown relation size degrades to the full range. */
  def planCtidShards(blocks: Long, shardCount: Int): Seq[String] = {
    if (shardCount <= 1 || blocks <= 0) return Seq("ctid >= '(0,1)'::tid")
    val step = (blocks + shardCount - 1) / shardCount
    var cur = 0L
    (0 until shardCount).flatMap { i =>
      val next = math.min(cur + step, blocks)
      val pred =
        if (i == shardCount - 1) s"ctid >= '($cur,1)'::tid"
        else s"ctid >= '($cur,1)'::tid AND ctid < '($next,1)'::tid"
      val keep = next > cur || i == shardCount - 1
      cur = next
      if (keep) Some(pred) else scala.None
    }
  }

  /** Validate a REST-supplied relation identifier part before it is
   *  interpolated into SQL run ON THE SOURCE PRIMARY (the reference
   *  quote-identifies everything, `clients/postgres.rs`
   *  quote_identifier): the simple-query protocol executes
   *  multi-statement strings, so an unvalidated name is SQL injection
   *  as the replication-privileged mirror user. */
  private[sources] def identPart(s: String, what: String): String = {
    require(s.matches("[A-Za-z_][A-Za-z0-9_$]*"),
      s"$what must be a plain SQL identifier, got '$s'")
    s
  }

  /** One COPY shard, run INSIDE a Spark task (the snapshot job): the
   *  task opens its own connection, imports the coordinator's exported
   *  snapshot, and streams its ctid range as a pull iterator the
   *  parquet writer drains — per-task memory is one row + one CopyData
   *  frame, and no row ever crosses the driver (the accumulator pair
   *  lets specs PROVE that). A task completion listener closes the
   *  connection even when the task is killed mid-stream; a retried
   *  task re-runs its COPY against the same immutable snapshot, so
   *  retries are deterministic and the parquet commit protocol keeps
   *  partial attempts invisible. */
  /** Source columns -> engine schema with field ids (the mapping the
   *  single-table and shared-stream create paths share). */
  private[sources] def schemaOf(cols: Seq[PgColumn]): StructType =
    StructType(cols.zipWithIndex.map { case (c, i) =>
      SchemaDsl.field(c.name, PgOutput.restType(c.typeOid, c.typeMod),
        !c.notNull).copy(metadata = new MetadataBuilder()
          .putLong(SchemaDsl.FieldIdKey, i + 1L).build())
    })

  /** (user, password) from a postgresql:// URI's userinfo. */
  private[graft] def credsOf(u: java.net.URI): (String, Option[String]) = {
    val ui = Option(u.getUserInfo)
    (ui.map(_.takeWhile(_ != ':')).filter(_.nonEmpty).getOrElse("postgres"),
      ui.filter(_.contains(':')).map(_.dropWhile(_ != ':').drop(1))
        .filter(_.nonEmpty))
  }

  private[sources] def copyShardRows(host: String, port: Int,
      user: String, database: String, snapId: String, sql: String,
      cols: Seq[PgColumn],
      execRows: org.apache.spark.util.LongAccumulator,
      driverRows: org.apache.spark.util.LongAccumulator,
      password: Option[String]): Iterator[Row] = {
    val w = new PgSyncClient(host, port, user, database,
      replication = false, password = password)
    w.connect()
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ =>
      try w.close() catch { case _: Throwable => () })
    val it =
      try {
        w.beginWithSnapshot(snapId)
        w.copyOutIterator(sql)
      } catch { case t: Throwable => w.close(); throw t }
    new Iterator[Row] {
      private var finished = false
      override def hasNext: Boolean = {
        val h = it.hasNext
        if (!h && !finished) {
          finished = true
          // clean end: release the snapshot txn (and, outside a task,
          // the connection) before the writer commits
          try {
            w.simpleQuery("commit;")
            if (tc == null) w.close()
          } catch { case _: Throwable => () }
        }
        h
      }
      override def next(): Row = {
        val vals = it.next()
        (if (tc != null) execRows else driverRows).add(1L)
        Row.fromSeq(vals.zip(cols).map {
          case (scala.None, _) => null
          case (Some(s), cc) =>
            PgOutput.parseValue(cc.typeOid, cc.typeMod, s)
        })
      }
    }
  }

  /** Best-effort removal of the slot + publication a mirror holds on
   *  the primary, on a NEW plain connection (the caller's may be
   *  poisoned or mid-stream): terminate any backend still holding the
   *  slot, drop the slot, drop the publication — the reference's
   *  drop_replication_slot / remove_table_from_publication
   *  (`pg_replicate.rs:357-385`). Never throws: cleanup must not mask
   *  the failure that triggered it, and an unreachable primary keeps
   *  its orphans only until the next create retries. */
  private[sources] def cleanupReplication(host: String, port: Int,
      user: String, database: String, slot: String, pub: String,
      password: Option[String] = scala.None): Unit =
    try {
      val c = new PgSyncClient(host, port, user, database,
        replication = false, connectTimeoutMs = 5000, password = password)
      c.connect()
      try {
        def best(sql: String): Unit =
          try { c.simpleQuery(sql); () }
          catch { case _: PgWire.ServerError => () } // absent = done
        best("SELECT pg_terminate_backend(active_pid) " +
          s"FROM pg_replication_slots WHERE slot_name = '$slot' " +
          "AND active_pid IS NOT NULL;")
        best(s"SELECT pg_drop_replication_slot('$slot');")
        best(s"DROP PUBLICATION IF EXISTS $pub;")
      } finally c.close()
    } catch { case _: Throwable => () }

  /** Drop a mirrored table AND its primary-side replication artifacts
   *  (the reference drops slot and publication when a mirrored table
   *  is dropped, `pg_replicate.rs:357-385,475`): stop the live stream,
   *  best-effort slot+publication removal, then the catalog drop.
   *  Safe on non-mirrors — no postgres srcUri means no wire cleanup,
   *  just the plain drop. */
  def dropMirror(catalog: GraftCatalog, name: String): Unit = {
    val entry = catalog.metadataStore.allEntries()
      .find(e => e.database == catalog.database && e.table == name)
    // a shared-stream mirror leaves via ALTER PUBLICATION DROP TABLE;
    // the URI's slot + publication keep serving the other tables
    if (entry.exists(e => PgReplicationManager.isShared(e.srcUri))) {
      PgReplicationManager.dropMirror(catalog, name)
      return
    }
    catalog.streams.remove(name).foreach(s =>
      try s.stop() catch { case _: Throwable => () })
    entry.filter(e => e.srcUri.startsWith("postgresql://") ||
        e.srcUri.startsWith("postgres://")).foreach { e =>
      val u = java.net.URI.create(e.srcUri)
      val (user, pw) = credsOf(u)
      cleanupReplication(u.getHost,
        if (u.getPort > 0) u.getPort else 5432,
        user,
        Option(u.getPath).map(_.stripPrefix("/")).filter(_.nonEmpty)
          .getOrElse("postgres"),
        s"graft_$name", s"graft_pub_$name", pw)
    }
    catalog.dropTable(name)
  }

  /** Deliberate stop of one mirror's replication stream — the
   *  reference's `shutdown(postgres_drop_all)`
   *  (`replication_connection.rs:46-47,392`). `keepSlot = true` (the
   *  default, `postgres_drop_all = false`) leaves the slot +
   *  publication on the primary: its confirmed position is the resume
   *  point, so a later [[resume]] catches up with ZERO re-copy.
   *  `keepSlot = false` drops both (the table stays). */
  def stopMirror(catalog: GraftCatalog, name: String,
      keepSlot: Boolean = true): Unit = {
    catalog.streams.remove(name).foreach(s =>
      try s.stop() catch { case _: Throwable => () })
    if (!keepSlot) {
      val entry = catalog.metadataStore.allEntries()
        .find(e => e.database == catalog.database && e.table == name)
      entry.filter(e => e.srcUri.startsWith("postgresql://") ||
          e.srcUri.startsWith("postgres://")).foreach { e =>
        val u = java.net.URI.create(e.srcUri)
        val (user, pw) = credsOf(u)
        val db = Option(u.getPath).map(_.stripPrefix("/"))
          .filter(_.nonEmpty).getOrElse("postgres")
        val port = if (u.getPort > 0) u.getPort else 5432
        if (PgReplicationManager.isShared(e.srcUri)) {
          // shared-stream mirrors share their slot + publication with
          // every other mirror of this URI: dropping them is a
          // whole-URI decision (the reference's postgres_drop_all).
          // Only drop once NO other route is attached — otherwise the
          // surviving mirrors' walsender is pg_terminate_backend'ed
          // and their reconnect dies on the missing slot (class-42,
          // not retried): silent replication stop. A whole-URI drop
          // goes through PgReplicationManager.stopAll(keepSlot=false),
          // which detaches every route BEFORE the slot falls.
          // DORMANT mirrors count too (ADVICE r17): a sibling stopped
          // earlier with keepSlot=true holds no live route but still
          // owns the slot's confirmed position as its zero-re-copy
          // resume point — probe the catalog's registered mirrors of
          // this URI, not just the attached routes.
          val dbKey = db.toLowerCase.replaceAll("[^a-z0-9_]", "_")
          PgReplicationManager.recordDropIntent(catalog, name)
          val dormantSibling = catalog.metadataStore.allEntries().exists { o =>
            o.database == catalog.database && o.table != name &&
              !PgReplicationManager.hasDropIntent(catalog, o.table) &&
              (o.srcUri.startsWith("postgresql://") ||
                o.srcUri.startsWith("postgres://")) &&
              PgReplicationManager.isShared(o.srcUri) && {
                val ou = java.net.URI.create(o.srcUri)
                val oPort = if (ou.getPort > 0) ou.getPort else 5432
                val oDb = Option(ou.getPath).map(_.stripPrefix("/"))
                  .filter(_.nonEmpty).getOrElse("postgres")
                ou.getHost == u.getHost && oPort == port && oDb == db
              }
          }
          if (!PgReplicationManager.sharedInUse(catalog, u.getHost, port, db)
              && !dormantSibling)
            cleanupReplication(u.getHost, port, user, db,
              s"graft_slot_$dbKey", s"graft_pub_$dbKey", pw)
        } else {
          cleanupReplication(u.getHost, port, user, db,
            s"graft_$name", s"graft_pub_$name", pw)
        }
      }
    }
  }

  def run(catalog: GraftCatalog, name: String, srcTableName: String,
      host: String, port: Int, user: String, database: String,
      srcUri: String,
      // WAL stays ON for a mirror: the catch-up loop acks a txn to the
      // primary as soon as it is APPLIED, and apply-with-WAL is what
      // makes applied mean durable — ack-without-WAL would let a crash
      // lose transactions the slot has already trimmed (the reference
      // WALs every ingest event for exactly this reason, wal.rs:423)
      config: TableConfig = TableConfig(),
      // parallel snapshot width (reference default 4,
      // `postgres_source.rs:339` plan_ctid_shards) — the 100-TB
      // initial-copy lever: a single-connection COPY is the bottleneck
      copyShards: Int = 4,
      maxReconnects: Int = 5,
      password: Option[String] = scala.None): Result = {
    val (ns, tbl) = srcTableName.split('.') match {
      case Array(a, b) =>
        (identPart(a, "src schema"), identPart(b, "src table"))
      case Array(b) => ("public", identPart(b, "src table"))
      case _ => throw new IllegalArgumentException(
        s"src_table_name must be [schema.]table, got $srcTableName")
    }
    // the derived slot/publication names are REPLICATION identifiers,
    // which postgres never case-folds: only [a-z0-9_] round-trips
    // (CREATE_REPLICATION_SLOT graft_Users fails on a real primary
    // even though "Users" is a fine table name) — reject rather than
    // silently lower-case, which could collide two distinct names
    require(name.matches("[a-z_][a-z0-9_]*"),
      s"mirror table name must be slot-name material ([a-z0-9_], " +
        s"starting with a letter or _), got '$name'")
    val slot = s"graft_$name"
    val pub = s"graft_pub_$name"
    require(!catalog.streams.get(name).exists(_.alive),
      s"table $name already has a live replication stream")
    val client = new PgSyncClient(host, port, user, database,
      password = password)
    client.connect()
    try {
      val cols = client.fetchColumns(ns, tbl)
      require(cols.nonEmpty, s"source table $srcTableName has no columns")
      val keys = cols.filter(_.primary).map(_.name)
      val schema = schemaOf(cols)
      val identity =
        if (keys.nonEmpty) Identity.Keys(keys) else Identity.None
      val table = catalog.createTable(name, schema, identity, config,
        srcTableName = srcTableName, srcUri = srcUri)
      // a failure in the synchronous snapshot phase must leave the
      // create retryable AGAINST THE SAME PRIMARY: drop the
      // half-created table AND the slot/publication this attempt left
      // behind (an orphaned slot retains WAL forever and makes the
      // retry's CREATE_REPLICATION_SLOT fail with 'already exists')
      try {
      // REPLICA IDENTITY FULL before replication (the reference's
      // alter_table_replica_identity, pg_replicate.rs:229-236,493):
      // update/delete old-tuples then carry ALL columns, so key
      // resolution works even when the source table's identity is not
      // its primary key (and the Session's TOAST rejection never
      // fires — FULL tuples carry no unchanged-TOAST placeholders)
      client.simpleQuery(s"ALTER TABLE $ns.$tbl REPLICA IDENTITY FULL;")
      // the publication must exist BEFORE the slot streams with it —
      // pgoutput fails START_REPLICATION with 'publication does not
      // exist' otherwise. Per-table publication via the reference's
      // drop-then-create idiom (`pg_replicate.rs:114` creates its
      // publication at boot; `clients/postgres.rs:140-150`
      // add_table_to_publication adds each table): a leftover from an
      // earlier failed create is replaced, never appended to. Runs
      // OUTSIDE the snapshot txn — CREATE PUBLICATION is a write and
      // the txn below is read-only.
      client.simpleQuery(s"DROP PUBLICATION IF EXISTS $pub;")
      client.simpleQuery(s"CREATE PUBLICATION $pub FOR TABLE $ns.$tbl;")
      client.simpleQuery("begin read only isolation level repeatable read;")
      val boundary = client.createSlotUseSnapshot(slot)
      val spark = table.spark
      val staging = s"${table.root}/copy-staging"
      // column names come from the primary's own catalog and may be
      // arbitrary: quote-identify them (reference quote_identifier)
      val colList = cols
        .map(c => "\"" + c.name.replace("\"", "\"\"") + "\"")
        .mkString(", ")
      // sharded parallel snapshot AS A SPARK JOB (reference
      // `initial_copy.rs:57` copy_table_stream +
      // `postgres_source.rs:339,370` plan_ctid_shards /
      // spawn_sharded_copy_reader): the coordinator's slot snapshot is
      // EXPORTED and every COPY shard runs as an EXECUTOR TASK that
      // imports it, so each ctid range reads the same consistent cut
      // in parallel and rows flow source → task → parquet staging
      // without ever crossing the driver — the driver keeps only the
      // slot, the snapshot id and the boundary LSN. At 100 TB the
      // initial-copy ceiling is the primary's aggregate COPY
      // throughput across shards, not one driver NIC.
      val preds = planCtidShards(client.blockCount(ns, tbl),
        math.max(1, copyShards))
      val snapId = client.exportSnapshot()
      val execRows =
        spark.sparkContext.longAccumulator("graft-pg-copy-exec-rows")
      val driverRows =
        spark.sparkContext.longAccumulator("graft-pg-copy-driver-rows")
      val copySqls = preds.map(pred =>
        s"COPY (SELECT $colList FROM $ns.$tbl WHERE $pred) TO STDOUT " +
          "WITH (FORMAT text);")
      val (srcHost, srcPort, srcUser, srcDb) = (host, port, user, database)
      val taskCols = cols
      val taskPw = password
      val rdd = spark.sparkContext
        .parallelize(copySqls, copySqls.length)
        .flatMap(sql => copyShardRows(srcHost, srcPort, srcUser, srcDb,
          snapId, sql, taskCols, execRows, driverRows, taskPw))
      spark.createDataFrame(rdd, schema).write.parquet(staging)
      client.simpleQuery("commit;")
      val copied = execRows.value + driverRows.value
      if (copied > 0)
        table.initialCopy(
          spark.read.schema(table.schema).parquet(staging), boundary)
      graft.format.Fio.delete(staging)
      // catch-up: pgoutput event LSNs continue ABOVE the boundary (the
      // snapshot already contains everything at-or-below it, so a txn
      // redelivered at-or-below it must be skipped, not re-applied)
      val sess = new PgOutput.Session(tbl, keys, firstLsn = boundary + 1,
        skipCommitsAtOrBelow = boundary)
      val (thread, errFn, stopFn) = catchUp(table, sess, client, slot, pub,
        boundary, host, port, user, database, name, maxReconnects, password)
      val res = Result(boundary, copied, thread, errFn, stopFn,
        driverCopiedRows = driverRows.value)
      catalog.streams.put(name, res)
      res
      } catch { case t: Throwable =>
        try client.close() catch { case _: Throwable => () }
        cleanupReplication(host, port, user, database, slot, pub, password)
        catalog.dropTable(name)
        throw t
      }
    } catch { case t: Throwable => client.close(); throw t }
  }

  /** Restart-recovery for a mirrored table (the reference's
   *  `recovery_utils.rs:120-170`: recovered tables restart replication
   *  from stored metadata). The resume position comes from the SLOT:
   *  START_REPLICATION at 0/0 lets its confirmed_flush_lsn decide —
   *  which the conservative ack discipline kept at the last APPLIED
   *  commit, so a process crash between receive and apply replays the
   *  missing transactions and nothing else. The initial copy never
   *  re-runs. */
  def resume(catalog: GraftCatalog, name: String,
      maxReconnects: Int = 5): Result = {
    // a second stream on the same slot would fight the first for the
    // slot and double-apply — resume only a DEAD mirror
    require(!catalog.streams.get(name).exists(_.alive),
      s"table $name already has a live replication stream")
    // the registry id is (database, table) — a same-named table in
    // another database must never supply the source
    val entry = catalog.metadataStore.allEntries()
      .find(e => e.database == catalog.database && e.table == name)
      .getOrElse(throw new NoSuchElementException(
        s"table ${catalog.database}.$name is not registered"))
    // a shared-stream mirror re-attaches to its URI's ONE stream — via
    // the manager (callers that can hold a generic handle call it
    // directly; this path is the per-table-slot protocol)
    require(!PgReplicationManager.isShared(entry.srcUri),
      s"$name is a shared-stream mirror: resume it via " +
        "PgReplicationManager.resume")
    val u = java.net.URI.create(entry.srcUri)
    require(u.getScheme == "postgresql" || u.getScheme == "postgres",
      s"table $name has no postgres source: ${entry.srcUri}")
    val port = if (u.getPort > 0) u.getPort else 5432
    val (_, tbl) = entry.srcTableName.split('.') match {
      case Array(a, b) => (a, b)
      case Array(b) => ("public", b)
      case _ => throw new IllegalArgumentException(
        s"bad src_table_name: ${entry.srcTableName}")
    }
    val keys = entry.identity match {
      case Identity.Keys(k) => k
      case _ => Nil
    }
    val table = catalog.table(name)
    val (user, password) = credsOf(u)
    val database = Option(u.getPath).map(_.stripPrefix("/"))
      .filter(_.nonEmpty).getOrElse("postgres")
    val client = new PgSyncClient(u.getHost, port, user, database,
      password = password)
    client.connect()
    try {
      // event LSNs continue above everything the table already holds;
      // acks ride keepalives, so the slot's confirmed position may
      // trail the applied position — redelivered txns at-or-below the
      // table's commit LSN are skipped whole, never double-applied
      val sess = new PgOutput.Session(tbl, keys,
        firstLsn = table.commitLsn + 1,
        skipCommitsAtOrBelow = table.commitLsn)
      val (thread, errFn, stopFn) = catchUp(table, sess, client,
        s"graft_$name", s"graft_pub_$name", 0L, u.getHost, port,
        user, database, name, maxReconnects, password)
      val res = Result(table.commitLsn, 0L, thread, errFn, stopFn)
      catalog.streams.put(name, res)
      res
    } catch { case t: Throwable => client.close(); throw t }
  }

  /** The catch-up loop shared by [[run]] and [[resume]]: apply events
   *  at transaction boundaries, ack only APPLIED commit positions
   *  (never the receive watermark), and reconnect on transport errors
   *  with linear backoff, resuming from the WAL position covering the
   *  last applied commit — a transaction is resent whole or not at
   *  all, never half (the reference's replication event loop,
   *  `pg_replicate.rs:677-760` run_event_loop). */
  private def catchUp(table: GraftTable, sess: PgOutput.Session,
      first: PgSyncClient, slot: String, pub: String, startWal: Long,
      host: String, port: Int, user: String, database: String,
      name: String, maxReconnects: Int,
      password: Option[String] = scala.None)
      : (Thread, () => Option[Throwable], () => Unit) = {
    @volatile var err: Option[Throwable] = scala.None
    @volatile var stopRequested = false
    @volatile var curRef: PgSyncClient = first
    // a bulk source txn (the case proto_version '2' streaming exists
    // for) must not accumulate in driver memory: past this many
    // buffered events the half-txn is applied EARLY — its events carry
    // the txn's xid, so the table STAGES them (M6 machinery) until the
    // Commit event lands, and driver memory stays bounded
    val FlushEvents = 50000
    val thread = new Thread(() => {
      var cur = first
      var connected = true // `first` arrives connected
      var resumeWal = startWal
      var attempts = 0
      var done = false
      val buf = mutable.ArrayBuffer[CdcEvent]()
      while (!done) {
        try {
          if (!connected) {
            // reconnect INSIDE the try: a failed connect (primary
            // still down — the very case being retried) lands in the
            // retry branch below and consumes an attempt, instead of
            // falling through to startReplication on a dead client
            cur = new PgSyncClient(host, port, user, database,
              password = password)
            curRef = cur
            cur.connect()
            connected = true
          }
          cur.startReplication(slot, pub, resumeWal,
            // the slot may trim only to APPLIED txn boundaries
            ackLsn = () => resumeWal) { (bytes, walEnd) =>
            buf ++= sess.onMessage(bytes)
            val committed = buf.lastOption.exists(_.isInstanceOf[Commit])
            if (committed || buf.size >= FlushEvents) {
              table.apply(buf.toSeq)
              buf.clear()
              if (committed) {
                resumeWal = walEnd
                attempts = 0 // progress resets the backoff (reference)
              }
            }
          }
          done = true // clean server-ended stream
        } catch {
          // ONLY transport blips are worth a reconnect. Deterministic
          // failures — apply errors, protocol violations, and backend
          // ErrorResponses whose SQLSTATE is class 42 (undefined or
          // duplicate object: a dropped publication/slot will fail
          // identically on every retry) — surface immediately.
          case t: java.io.IOException
              if !stopRequested && attempts < maxReconnects &&
                (t match {
                  case se: PgWire.ServerError =>
                    !se.sqlState.startsWith("42")
                  case _ => true
                }) =>
            attempts += 1
            // partial txns: the primary resends them whole from the
            // resume point — discard the buffered half, ABORT every
            // early-applied staged half in the table (abortXact is a
            // no-op for unknown xids), and re-issue the LSNs
            buf.clear()
            sess.inFlightXids.foreach(x =>
              table.apply(Seq(graft.model.StreamAbort(x))))
            sess.rollbackUncommitted()
            try cur.close() catch { case _: Throwable => () }
            connected = false
            Thread.sleep(math.min(60000L, 1000L * attempts))
          case t: Throwable =>
            done = true
            if (!stopRequested) {
              err = Some(t)
              // a mirror that stops replicating must be VISIBLE, not a
              // silently-dead daemon thread
              System.err.println(
                s"[graft-pg-cdc] $name replication stopped: $t")
            }
        }
      }
      try cur.close() catch { case _: Throwable => () }
    }, s"graft-pg-cdc-$name")
    thread.setDaemon(true)
    thread.start()
    val stopFn = () => {
      stopRequested = true
      try curRef.close() catch { case _: Throwable => () }
    }
    (thread, () => err, stopFn)
  }
}
