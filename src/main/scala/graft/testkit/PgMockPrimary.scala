package graft.testkit

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import graft.sources.{PgAuth, PgColumn, PgCopyText, PgWire}

/**
 * Scripted primary for the WHOLE dialogue: startup, catalog query,
 * read-only txn, slot creation with USE_SNAPSHOT, COPY-out of the
 * scripted rows, then the replication stream replaying `frames` with
 * keepalive acks — one real TCP connection end to end. Asserts the
 * client's protocol discipline (snapshot slot before COPY, catch-up
 * start AT the consistent point).
 */
final class PgMockPrimary(
    columns: Seq[PgColumn],
    copyRows: Seq[Seq[Option[String]]],
    consistentPoint: Long,
    frames: Seq[Array[Byte]],
    keepaliveEvery: Int = 2048,
    // failure injection: answer the FIRST COPY with an ErrorResponse —
    // the client must surface it, roll back cleanly (table + slot +
    // publication), and a retried create against this SAME primary
    // must succeed
    failCopy: Boolean = false,
    // failure injection: abruptly close the replication connection
    // after this many total frames (once) — the client must reconnect
    // and resume from its last applied commit; -1 = never
    dropAfterFrames: Int = -1,
    // failure injection: after the injected drop fires, abort this many
    // reconnect attempts right after accept — each failed reconnect
    // must consume one retry-budget attempt
    refuseReconnects: Int = 0,
    // keep accepting connections after the replication stream ends
    // cleanly (drop/cleanup dialogues arrive AFTER streaming); end the
    // accept loop with shutdown()
    keepServing: Boolean = false,
    // when set, EVERY connection must pass a full SCRAM-SHA-256
    // exchange (the modern primary default) before any query is
    // served; the mock independently verifies the client's proof
    scramPassword: Option[String] = scala.None,
    // multi-table mode (the shared-stream manager dialogue): extra
    // relations keyed by "ns.tbl" — the schema/COPY/blocks queries
    // parse the table name out of the SQL and answer per-table;
    // `columns`/`copyRows` stay the fallback for unlisted names
    tables: Map[String, (Seq[PgColumn], Seq[Seq[Option[String]]])] = Map.empty,
    // pause the replication stream after sending this many frames and
    // hold it until the latch opens (releaseFrames(), or automatically
    // when a COPY for `releaseOnCopyOf` is served) — the choreography
    // that makes "a table is added WHILE the shared stream runs"
    // deterministic; -1 = never pause
    pauseAfterFrames: Int = -1,
    // open the frame latch when a COPY for this src table is served —
    // the paused tail of the stream then flows DURING that table's
    // snapshot copy, exercising the manager's event buffering
    releaseOnCopyOf: Option[String] = scala.None,
    // keep the replication stream OPEN after the last frame (a real
    // primary never ends it) until endStream() — the window in which
    // per-table add/drop against a LIVE stream is scripted
    holdStreamOpen: Boolean = false) {
  private val server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
  @volatile var sawReplicationParam = false
  @volatile var sawSchemaQuery = false
  @volatile var sawSnapshotSlot = false
  @volatile var copySentInsideTxn = false
  @volatile var error: Option[Throwable] = scala.None
  /** failure injection: abort this many future connections right
   *  after accept — a reconnect whose connect() itself fails must
   *  consume retry budget and keep retrying, never NPE */
  @volatile var refuseNextConnections = 0
  // replication-object state: a real primary rejects START_REPLICATION
  // for a publication that was never created and a duplicate
  // CREATE_REPLICATION_SLOT — the mock enforcing both is what keeps
  // the client honest about the create/cleanup lifecycle
  private val slotSet =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val pubSet =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def slots: Set[String] = {
    import scala.jdk.CollectionConverters._
    slotSet.asScala.toSet
  }
  def publications: Set[String] = {
    import scala.jdk.CollectionConverters._
    pubSet.asScala.toSet
  }
  /** per-publication table membership (ALTER PUBLICATION ADD/DROP
   *  TABLE + CREATE ... FOR TABLE) — what a real primary's
   *  pg_publication_tables would list */
  private val pubTablesMap =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.Set[String]]()
  def publicationTables(pub: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    Option(pubTablesMap.get(pub)).map(_.asScala.toSet).getOrElse(Set.empty)
  }
  /** CREATE_REPLICATION_SLOT statements served (dup-rejected ones
   *  included) — the shared-slot architecture pins this at 1 */
  @volatile var createSlotCount = 0
  /** tables whose REPLICA IDENTITY was set FULL (reference
   *  alter_table_replica_identity, pg_replicate.rs:229-236) */
  private val replicaFullSet =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def replicaIdentityFull: Set[String] = {
    import scala.jdk.CollectionConverters._
    replicaFullSet.asScala.toSet
  }
  /** the paused frame tail's gate (see pauseAfterFrames) */
  private val frameLatch = new java.util.concurrent.CountDownLatch(1)
  def releaseFrames(): Unit = frameLatch.countDown()
  /** the held-open stream's end gate (see holdStreamOpen) */
  private val endLatch = new java.util.concurrent.CountDownLatch(1)
  def endStream(): Unit = endLatch.countDown()
  /** columns/rows for a parsed "ns.tbl" (fallback: the single-table
   *  constructor pair) */
  private def columnsOf(tbl: String): Seq[PgColumn] =
    tables.get(tbl).map(_._1).getOrElse(columns)
  private def rowsOf(tbl: String): Seq[Seq[Option[String]]] =
    tables.get(tbl).map(_._2).getOrElse(copyRows)
  @volatile private var copyFailedOnce = false
  private val statusQueue =
    new java.util.concurrent.ConcurrentLinkedQueue[Long]()
  def statusUpdates: Seq[Long] = {
    import scala.jdk.CollectionConverters._
    statusQueue.asScala.toSeq
  }
  /** every START_REPLICATION request's start LSN, in arrival order
   *  (a reconnecting client appends its resume points) */
  private val startedAtQueue =
    new java.util.concurrent.ConcurrentLinkedQueue[Long]()
  def startedAtLsns: Seq[Long] = {
    import scala.jdk.CollectionConverters._
    startedAtQueue.asScala.toSeq
  }
  def startedAtLsn: Long = startedAtLsns.headOption.getOrElse(-1L)
  /** walStarts(i) = WAL position of frames(i); last entry = stream end */
  private val walStarts: Seq[Long] =
    frames.scanLeft(consistentPoint)((w, f) => w + f.length)
  @volatile private var framesSentTotal = 0
  @volatile private var droppedOnce = false
  @volatile private var finished = false
  /** deliberate mid-stream connection drop (the injected blip) */
  private object DropConn extends RuntimeException
  /** scripted auth rejection — an IOException so the per-connection
   *  handler treats it like any other ended client, not a mock error */
  private object AuthRejected extends java.io.IOException
  /** the snapshot id handed to pg_export_snapshot callers */
  val exportedSnapshot = "00000003-0000001A-1"
  private val importedQueue =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  /** snapshot ids imported by worker connections, in arrival order */
  def importedSnapshots: Seq[String] = {
    import scala.jdk.CollectionConverters._
    importedQueue.asScala.toSeq
  }
  private val copyPredQueue =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  /** the WHERE predicate of every COPY served */
  def copyPredicates: Seq[String] = {
    import scala.jdk.CollectionConverters._
    copyPredQueue.asScala.toSeq
  }
  /** one scripted "block" per copy row, so ctid-range predicates slice
   *  rows directly (pg_relation_size → blocks = row count) */
  private def blocks: Long = math.max(1L, copyRows.size.toLong)
  /** the slot's confirmed position: the max conservative ack seen —
   *  what a START_REPLICATION at 0/0 resumes from */
  @volatile private var confirmedFlushVar: Long = consistentPoint
  def confirmedFlush: Long = confirmedFlushVar

  def port: Int = server.getLocalPort

  private val thread = new Thread(() => {
    try serve() catch { case t: Throwable => error = Some(t) }
    finally server.close()
  }, "pg-mock-primary")

  def start(): PgMockPrimary = { thread.setDaemon(true); thread.start(); this }
  def join(): Unit = thread.join(30000)

  private def rowDescription(names: Seq[String]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    val d = new DataOutputStream(o)
    d.writeShort(names.size)
    names.foreach { n =>
      d.write(n.getBytes(UTF_8)); d.write(0)
      d.writeInt(0); d.writeShort(0) // table oid, attnum
      d.writeInt(25); d.writeShort(-1); d.writeInt(-1) // typoid/len/mod
      d.writeShort(0) // text format
    }
    o.toByteArray
  }

  private def dataRow(vals: Seq[Option[String]]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    val d = new DataOutputStream(o)
    d.writeShort(vals.size)
    vals.foreach {
      case scala.None => d.writeInt(-1)
      case Some(s) =>
        val b = s.getBytes(UTF_8); d.writeInt(b.length); d.write(b)
    }
    o.toByteArray
  }

  /** Accept connections until the stream has been served to a clean
   *  end: the coordinator plus N concurrent copy workers, plus
   *  reconnects when a drop is injected — each on its own thread (a
   *  worker dialogue runs WHILE the coordinator connection idles in
   *  its transaction, exactly like a real primary). */
  private def serve(): Unit =
    try {
      while (!finished) {
        val sock = server.accept()
        if (refuseNextConnections > 0) {
          refuseNextConnections -= 1
          sock.close() // injected connect-level failure
        } else {
          val th = new Thread(() =>
            try handleConnection(sock)
            catch {
              // a vanished client (job abort, injected failure legs)
              // is normal; only PROTOCOL violations are mock errors
              case _: java.io.IOException => ()
              case t: Throwable => if (error.isEmpty) error = Some(t)
            })
          th.setDaemon(true)
          th.start()
        }
      }
    } catch {
      // streamFrames closes the listener to end the accept loop
      case _: java.net.SocketException if finished => ()
    }

  private def handleConnection(sock: Socket): Unit = {
    sock.setTcpNoDelay(true)
    var inTxn = false
    try {
      val in = new DataInputStream(sock.getInputStream)
      val out = new PgWire.MsgOut(new DataOutputStream(sock.getOutputStream))
      val len = in.readInt()
      val body = new Array[Byte](len - 4)
      in.readFully(body)
      val params = new String(body.drop(4), UTF_8).split(0.toChar)
      // sticky: the COORDINATOR opens in replication mode; plain-SQL
      // worker/cleanup connections arriving later must not clear it
      if (params.sliding(2, 2).exists(p =>
          p.length == 2 && p(0) == "replication" && p(1) == "database"))
        sawReplicationParam = true
      scramPassword.foreach(pw => serverScram(in, out, pw))
      out.send('R', Array[Byte](0, 0, 0, 0))
      out.send('S', "server_version".getBytes(UTF_8) ++ Array(0.toByte) ++
        "16.0".getBytes(UTF_8) ++ Array(0.toByte))
      out.send('Z', Array[Byte]('I'.toByte))
      def ready(): Unit =
        out.send('Z', Array[Byte](if (inTxn) 'T'.toByte else 'I'.toByte))
      def complete(tag: String): Unit =
        out.send('C', tag.getBytes(UTF_8) :+ 0.toByte)
      /** ErrorResponse with a real SQLSTATE, then ReadyForQuery — the
       *  backend's errored-simple-query shape */
      def sendErr(sqlState: String, msg: String): Unit = {
        val eb = new java.io.ByteArrayOutputStream()
        def fld(code: Char, v: String): Unit = {
          eb.write(code); eb.write(v.getBytes(UTF_8)); eb.write(0)
        }
        fld('S', "ERROR"); fld('C', sqlState); fld('M', msg)
        eb.write(0)
        out.send('E', eb.toByteArray)
        ready()
      }
      var replicating = false
      while (!replicating) PgWire.readMessage(in) match {
        case Some(('Q', qb)) =>
          val sql = new String(qb, UTF_8).stripSuffix(" ").trim
          val low = sql.toLowerCase
          if (low.startsWith("select a.attname")) {
            sawSchemaQuery = true
            val cols = "'([^']+)'::regclass".r.findFirstMatchIn(sql)
              .map(m => columnsOf(m.group(1))).getOrElse(columns)
            out.send('T', rowDescription(Seq("attname", "atttypid",
              "atttypmod", "attnotnull", "primary")))
            cols.foreach { c =>
              out.send('D', dataRow(Seq(Some(c.name),
                Some(c.typeOid.toString), Some(c.typeMod.toString),
                Some(if (c.notNull) "t" else "f"),
                Some(if (c.primary) "t" else "f"))))
            }
            complete(s"SELECT ${cols.size}"); ready()
          } else if (low.startsWith("begin")) {
            inTxn = true; complete("BEGIN"); ready()
          } else if (low.startsWith("set transaction snapshot")) {
            require(inTxn, "SET TRANSACTION SNAPSHOT outside a transaction")
            importedQueue.add(sql.split('\'')(1))
            complete("SET"); ready()
          } else if (low.startsWith("select pg_export_snapshot")) {
            require(inTxn, "pg_export_snapshot outside a transaction")
            out.send('T', rowDescription(Seq("pg_export_snapshot")))
            out.send('D', dataRow(Seq(Some(exportedSnapshot))))
            complete("SELECT 1"); ready()
          } else if (low.startsWith("select ((pg_relation_size")) {
            val n = "to_regclass\\('([^']+)'\\)".r.findFirstMatchIn(sql)
              .map(m => math.max(1L, rowsOf(m.group(1)).size.toLong))
              .getOrElse(blocks)
            out.send('T', rowDescription(Seq("blocks")))
            out.send('D', dataRow(Seq(Some(n.toString))))
            complete("SELECT 1"); ready()
          } else if (low.startsWith("select pg_current_wal_lsn")) {
            // "WAL now" = the consistent point: every scripted copy's
            // rows represent state AT that position, and every frame's
            // txn is scripted to commit ABOVE it — the boundary a
            // mid-stream add derives here is consistent by construction
            out.send('T', rowDescription(Seq("pg_current_wal_lsn")))
            out.send('D',
              dataRow(Seq(Some(PgWire.lsnText(consistentPoint)))))
            complete("SELECT 1"); ready()
          } else if (sql.startsWith("CREATE_REPLICATION_SLOT")) {
            require(inTxn, "USE_SNAPSHOT outside a transaction")
            createSlotCount += 1
            val slotName = sql.split("\\s+")(1)
            if (!slotSet.add(slotName))
              // a leaked slot from an uncleaned failed create — the
              // exact error a real primary gives the retry
              sendErr("42710",
                s"""replication slot "$slotName" already exists""")
            else {
              sawSnapshotSlot = sql.contains("USE_SNAPSHOT")
              out.send('T', rowDescription(Seq("slot_name",
                "consistent_point", "snapshot_name", "output_plugin")))
              out.send('D', dataRow(Seq(Some(slotName),
                Some(PgWire.lsnText(consistentPoint)), Some("snap-1"),
                Some("pgoutput"))))
              complete("CREATE_REPLICATION_SLOT"); ready()
            }
          } else if (low.startsWith("drop publication if exists")) {
            val n = sql.split("\\s+").last.stripSuffix(";")
            pubSet.remove(n)
            pubTablesMap.remove(n)
            complete("DROP PUBLICATION"); ready()
          } else if (low.startsWith("create publication")) {
            val pubName = sql.split("\\s+")(2).stripSuffix(";")
            if (!pubSet.add(pubName))
              sendErr("42710", s"""publication "$pubName" already exists""")
            else {
              val members =
                java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
              // CREATE PUBLICATION p FOR TABLE ns.t; | CREATE PUBLICATION p;
              "(?i)for table (\\S+)".r.findFirstMatchIn(sql)
                .foreach(m => members.add(m.group(1).stripSuffix(";")))
              pubTablesMap.put(pubName, members)
              complete("CREATE PUBLICATION"); ready()
            }
          } else if (low.startsWith("alter table") &&
              low.contains("replica identity full")) {
            // the reference sets REPLICA IDENTITY FULL on every table
            // it adds to replication (pg_replicate.rs:229-236,493) so
            // update/delete old-tuples carry all columns
            "(?i)alter table (\\S+) replica".r.findFirstMatchIn(sql)
              .foreach(m => replicaFullSet.add(m.group(1)))
            complete("ALTER TABLE"); ready()
          } else if (low.startsWith("alter publication")) {
            // ALTER PUBLICATION p ADD|DROP TABLE ns.t;
            val m = "(?i)alter publication (\\S+) (add|drop) table (\\S+)".r
              .findFirstMatchIn(sql).getOrElse(
                throw new IllegalStateException(s"unscripted alter: $sql"))
            val (pubName, verb, tbl) =
              (m.group(1), m.group(2).toLowerCase, m.group(3).stripSuffix(";"))
            if (!pubSet.contains(pubName))
              sendErr("42704", s"""publication "$pubName" does not exist""")
            else {
              val members = pubTablesMap.computeIfAbsent(pubName, _ =>
                java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
              if (verb == "add") {
                if (!members.add(tbl))
                  // a real primary raises 42710 on re-adding a member
                  sendErr("42710",
                    s"""relation "$tbl" is already member of publication""")
                else { complete("ALTER PUBLICATION"); ready() }
              } else {
                if (!members.remove(tbl))
                  sendErr("42704",
                    s"""relation "$tbl" is not part of the publication""")
                else { complete("ALTER PUBLICATION"); ready() }
              }
            }
          } else if (low.startsWith("select pg_terminate_backend")) {
            out.send('T', rowDescription(Seq("pg_terminate_backend")))
            complete("SELECT 0"); ready()
          } else if (low.startsWith("select pg_drop_replication_slot")) {
            val slotName = sql.split('\'')(1)
            if (!slotSet.remove(slotName))
              sendErr("42704",
                s"""replication slot "$slotName" does not exist""")
            else {
              out.send('T', rowDescription(Seq("pg_drop_replication_slot")))
              out.send('D', dataRow(Seq(scala.None)))
              complete("SELECT 1"); ready()
            }
          } else if (low.startsWith("copy") && failCopy && !copyFailedOnce) {
            copyFailedOnce = true
            sendErr("57014", "injected COPY failure")
          } else if (low.startsWith("copy")) {
            copySentInsideTxn = inTxn
            // which relation? (multi-table mode routes by name)
            val tblName = "(?i)from (\\S+) where".r.findFirstMatchIn(sql)
              .map(_.group(1)).getOrElse("")
            val rows = rowsOf(tblName)
            val cols = columnsOf(tblName)
            // a COPY for the release table opens the paused frame tail:
            // the held-back stream now flows WHILE this snapshot copy
            // runs — the mid-copy buffering window, made deterministic
            if (releaseOnCopyOf.contains(tblName)) frameLatch.countDown()
            // slice the scripted rows by the ctid-range predicate (one
            // block per row): the shard-union check lives client-side
            val pm = ("""ctid >= '\((\d+),1\)'::tid""" +
              """( AND ctid < '\((\d+),1\)'::tid)?""").r
            val (lo, hi) = pm.findFirstMatchIn(sql) match {
              case Some(m) => (m.group(1).toInt,
                Option(m.group(3)).map(_.toInt).getOrElse(rows.size))
              case scala.None => (0, rows.size)
            }
            copyPredQueue.add(sql.substring(sql.indexOf("WHERE")))
            val slice = rows.slice(lo, hi)
            out.send('H',
              Array[Byte](0) ++ // text format
                ByteBuffer.allocate(2)
                  .putShort(cols.size.toShort).array() ++
                Array.fill(cols.size * 2)(0.toByte))
            slice.foreach(r => out.send('d', PgCopyText.encode(r)))
            out.send('c', Array.emptyByteArray)
            complete(s"COPY ${slice.size}"); ready()
          } else if (low.startsWith("commit")) {
            inTxn = false; complete("COMMIT"); ready()
          } else if (sql.startsWith("START_REPLICATION")) {
            // pgoutput resolves publication_names at stream start: an
            // uncreated publication is the reference-documented failure
            // mode (ADVICE r14) — reject it exactly like a real primary
            val pubName = """publication_names '([^']+)'""".r
              .findFirstMatchIn(sql).map(_.group(1)).getOrElse("")
            if (!pubSet.contains(pubName))
              sendErr("42704",
                s"""publication "$pubName" does not exist""")
            else {
              val m = """LOGICAL ([0-9A-Fa-f]+)/([0-9A-Fa-f]+)""".r
                .findFirstMatchIn(sql)
              val from = m.map(g =>
                (java.lang.Long.parseLong(g.group(1), 16) << 32) |
                  java.lang.Long.parseLong(g.group(2), 16)).getOrElse(-1L)
              startedAtQueue.add(from)
              streamFrames(in, out, from)
              replicating = true
            }
          } else throw new IllegalStateException(s"unscripted query: $sql")
        case scala.None =>
          replicating = true // client closed (a finished copy worker)
        case other =>
          throw new IllegalStateException(s"expected Q, got $other")
      }
    } catch {
      // the injected blip: close this connection abruptly and accept
      // the client's reconnect (optionally refusing the next few, so
      // failed reconnects are part of the scripted chaos)
      case DropConn => refuseNextConnections = refuseReconnects
    } finally sock.close()
  }

  /** End the accept loop of a `keepServing` primary. */
  def shutdown(): Unit = { finished = true; server.close() }

  /** connections that passed the full SCRAM exchange with a VERIFIED
   *  client proof */
  @volatile var scramVerified = 0

  /** Server half of SCRAM-SHA-256 (RFC 5802/7677 over the PG SASL
   *  framing): sends the mechanism offer, drives the two-round
   *  exchange, and INDEPENDENTLY verifies the client's proof from the
   *  password and the exchanged messages — a client with the wrong
   *  password, wrong AuthMessage assembly, or wrong framing cannot
   *  pass. */
  private def serverScram(in: DataInputStream, out: PgWire.MsgOut,
      password: String): Unit = {
    def authMsg(code: Int, payload: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      PgWire.putI32(o, code); o.write(payload, 0, payload.length)
      o.toByteArray
    }
    out.send('R', authMsg(10,
      "SCRAM-SHA-256".getBytes(UTF_8) ++ Array[Byte](0, 0)))
    val (t1, p1) = PgWire.readMessage(in).getOrElse(
      throw new IllegalStateException("client closed before SASL init"))
    require(t1 == 'p', s"expected SASLInitialResponse, got $t1")
    val bb = ByteBuffer.wrap(p1)
    val mech = {
      val o = new StringBuilder
      var c = bb.get()
      while (c != 0) { o += c.toChar; c = bb.get() }
      o.toString
    }
    require(mech == "SCRAM-SHA-256", s"unexpected mechanism $mech")
    val payload = new Array[Byte](bb.getInt); bb.get(payload)
    val clientFirst = new String(payload, UTF_8)
    require(clientFirst.startsWith("n,,"),
      s"expected no-channel-binding gs2 header: $clientFirst")
    val clientFirstBare = clientFirst.stripPrefix("n,,")
    val clientNonce = PgAuth.scramFields(clientFirstBare)('r')
    val salt = "mock-salt-0123456789".getBytes(UTF_8)
    val iters = 4096
    val fullNonce = clientNonce + "srvNONCE"
    val serverFirst = s"r=$fullNonce," +
      s"s=${java.util.Base64.getEncoder.encodeToString(salt)},i=$iters"
    out.send('R', authMsg(11, serverFirst.getBytes(UTF_8)))
    val (t2, p2) = PgWire.readMessage(in).getOrElse(
      throw new IllegalStateException("client closed before SASL final"))
    require(t2 == 'p', s"expected SASLResponse, got $t2")
    val clientFinal = new String(p2, UTF_8)
    val f = PgAuth.scramFields(clientFinal)
    require(f('r') == fullNonce, "client must echo the full nonce")
    val withoutProof = clientFinal.substring(0, clientFinal.lastIndexOf(",p="))
    val am = s"$clientFirstBare,$serverFirst,$withoutProof"
    val salted = PgAuth.saltedPassword(password, salt, iters)
    val stored = PgAuth.storedKey(salted)
    val proof = java.util.Base64.getDecoder.decode(f('p'))
    val clientKey = PgAuth.xor(proof, PgAuth.clientSignature(stored, am))
    if (!java.util.Arrays.equals(
        java.security.MessageDigest.getInstance("SHA-256").digest(clientKey),
        stored)) {
      // a real primary answers a bad proof with 28P01, not a hangup
      val eb = new java.io.ByteArrayOutputStream()
      def fld(code: Char, v: String): Unit = {
        eb.write(code); eb.write(v.getBytes(UTF_8)); eb.write(0)
      }
      fld('S', "FATAL"); fld('C', "28P01")
      fld('M', "password authentication failed")
      eb.write(0)
      out.send('E', eb.toByteArray)
      throw AuthRejected
    }
    scramVerified += 1
    out.send('R', authMsg(12, ("v=" + java.util.Base64.getEncoder
      .encodeToString(PgAuth.serverSignature(salted, am))).getBytes(UTF_8)))
  }

  /** Stream the frames whose WAL position is at-or-above `fromLsnReq`
   *  — the slot-resume contract: a reconnecting standby receives
   *  exactly the suffix it has not confirmed. A request at 0/0 defers
   *  to the slot's confirmed position (restart recovery). */
  private def streamFrames(in: DataInputStream, out: PgWire.MsgOut,
      fromLsnReq: Long): Unit = {
    val fromLsn =
      if (fromLsnReq <= 0L) math.max(confirmedFlushVar, consistentPoint)
      else fromLsnReq
    out.send('W', Array[Byte](0, 0, 0))
    var lastEnd = math.max(fromLsn, consistentPoint)
    var sent = 0
    frames.indices.foreach { i =>
      // the scripted mid-stream gate: hold the tail until the latch
      // opens (a COPY for releaseOnCopyOf, or the spec's releaseFrames)
      if (i == pauseAfterFrames)
        frameLatch.await(30, java.util.concurrent.TimeUnit.SECONDS)
      // pgoutput re-sends Relation messages lazily PER CONNECTION (a
      // new stream always describes a table before its first DML), so
      // a resumed stream still opens with the Relation even though its
      // WAL position precedes the resume point
      val isRelation = frames(i).nonEmpty && frames(i)(0) == 'R'.toByte
      if (walStarts(i) >= fromLsn || isRelation) {
        if (!droppedOnce && dropAfterFrames >= 0 &&
            framesSentTotal == dropAfterFrames) {
          droppedOnce = true
          throw DropConn
        }
        if (sent > 0 && sent % keepaliveEvery == 0) {
          out.send('d', PgWire.keepalive(lastEnd, replyRequested = true))
          awaitStatus(in, lastEnd)
        }
        out.send('d', PgWire.xlogData(walStarts(i), frames(i)))
        // a re-sent Relation's position precedes the resume point;
        // the stream's end watermark never regresses
        lastEnd = math.max(lastEnd, walStarts(i + 1))
        framesSentTotal += 1
        sent += 1
      }
    }
    out.send('d', PgWire.keepalive(lastEnd, replyRequested = true))
    awaitStatus(in, lastEnd)
    // hold the stream open (a live primary's steady state) until the
    // spec ends it — the add/drop-against-a-live-stream window
    if (holdStreamOpen)
      endLatch.await(60, java.util.concurrent.TimeUnit.SECONDS)
    out.send('c', Array.emptyByteArray)
    PgWire.readMessage(in) match {
      case Some(('c', _)) => ()
      case other => throw new IllegalStateException(s"expected c, got $other")
    }
    out.send('C', "COPY 0".getBytes(UTF_8) :+ 0.toByte)
    out.send('Z', Array[Byte]('I'.toByte))
    if (!keepServing) {
      finished = true
      server.close() // unblock the accept loop
    }
  }

  private def awaitStatus(in: DataInputStream, wal: Long): Unit =
    PgWire.readMessage(in) match {
      case Some(('d', b)) if b(0) == 'r' =>
        val flush = PgWire.i64(b, 9)
        statusQueue.add(flush)
        // a standby may ack BELOW the last-sent WAL (conservative,
        // applied-commits-only acks) but never beyond it; the slot's
        // confirmed position only moves forward
        require(flush <= wal, s"standby ack $flush beyond sent WAL $wal")
        confirmedFlushVar = math.max(confirmedFlushVar, flush)
      case scala.None =>
        // client gone mid-stream (a deliberate stop closes the socket
        // while this thread still holds unsent frames) — transport-
        // level, not a protocol violation
        throw new java.io.EOFException("client closed mid-stream")
      case other =>
        throw new IllegalStateException(s"expected standby status, got $other")
    }
}
