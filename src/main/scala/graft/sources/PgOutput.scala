package graft.sources

import graft.model._
import org.apache.spark.sql.Row

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable

/**
 * PostgreSQL `pgoutput` logical-replication protocol: binary message
 * decode + the event-translation session that turns a WAL stream into
 * [[CdcEvent]]s (S1). This is the protocol layer of the reference's
 * CDC source (`pg_replicate/postgres_source.rs:311`, message handling
 * `pg_replicate/conversions/cdc_event.rs:51-128`, sink translation
 * `pg_replicate/moonlink_sink.rs:127-361`) — implemented from the
 * PUBLIC protocol spec (PostgreSQL docs, "Logical Replication Message
 * Formats"). The only piece this sandbox cannot run is the socket
 * transport (a replication slot connection); everything from raw
 * message bytes onward is real and driver-verified (`cdc_pgoutput`).
 *
 * Message grammar implemented (text tuples; protocol v1 plus the v2
 * streamed-transaction messages the reference consumes —
 * `cdc_event.rs:5-7` lists StreamStartBody/StreamStopBody/
 * StreamCommitBody/StreamAbortBody):
 *   'B' Begin:    final_lsn i64, commit_ts i64, xid i32
 *   'C' Commit:   flags i8, commit_lsn i64, end_lsn i64, commit_ts i64
 *   'R' Relation: relid i32, namespace cstr, name cstr, replident i8,
 *                 ncols i16, [flags i8, name cstr, typoid i32, typmod i32]*
 *   'I' Insert:   relid i32, 'N', TupleData
 *   'U' Update:   relid i32, ['K'|'O', TupleData]?, 'N', TupleData
 *   'D' Delete:   relid i32, 'K'|'O', TupleData
 *   'T' Truncate: nrels i32, flags i8, relid i32 *
 *   'Y' Type:     typoid i32, namespace cstr, name cstr   (ignored)
 *   'O' Origin:   origin_lsn i64, name cstr               (ignored)
 *   'S' StreamStart: xid i32, first_segment i8
 *   'E' StreamStop:  (empty)
 *   'c' StreamCommit: xid i32, flags i8, commit_lsn i64, end_lsn i64,
 *                     commit_ts i64
 *   'A' StreamAbort:  xid i32, subxid i32
 *   TupleData:    ncols i16, ['n' | 'u' | 't' len i32 bytes]*
 * Inside a streamed segment (between StreamStart and StreamStop) every
 * DML/Relation/Truncate message carries the txn's xid as its FIRST
 * field (protocol v2) — `decode(bytes, streamed = true)` parses it.
 */
object PgOutput {

  // ---- message ADT ------------------------------------------------------

  sealed trait Msg
  final case class Begin(finalLsn: Long, commitTs: Long, xid: Long) extends Msg
  final case class CommitMsg(flags: Int, commitLsn: Long, endLsn: Long,
      commitTs: Long) extends Msg
  final case class RelCol(flags: Int, name: String, typeOid: Int, typeMod: Int)
  final case class Relation(relId: Int, namespace: String, name: String,
      replIdent: Int, cols: Seq[RelCol]) extends Msg
  /** None = SQL NULL; Some(Left(())) = unchanged TOAST; Some(Right(s)) = text */
  type Tuple = Seq[Option[Either[Unit, String]]]
  final case class Insert(relId: Int, row: Tuple) extends Msg
  final case class Update(relId: Int, oldKey: Option[(Char, Tuple)],
      row: Tuple) extends Msg
  final case class DeleteMsg(relId: Int, keyKind: Char, key: Tuple) extends Msg
  final case class Truncate(relIds: Seq[Int]) extends Msg
  final case class TypeMsg(typeOid: Int, namespace: String, name: String) extends Msg
  final case class Origin(originLsn: Long, name: String) extends Msg
  final case class StreamStart(xid: Long, firstSegment: Boolean) extends Msg
  case object StreamStop extends Msg
  final case class StreamCommit(xid: Long, commitLsn: Long, endLsn: Long) extends Msg
  final case class StreamAbortMsg(xid: Long, subXid: Long) extends Msg

  // ---- binary decode ----------------------------------------------------

  /** `streamed = true` inside a StreamStart..StreamStop segment, where
   *  DML/Relation/Truncate carry a leading xid (protocol v2). */
  def decode(bytes: Array[Byte], streamed: Boolean = false): Msg = {
    val b = ByteBuffer.wrap(bytes) // big-endian, the wire order
    def skipStreamXid(): Unit = if (streamed) { b.getInt(); () }
    def cstr(): String = {
      val sb = new java.lang.StringBuilder
      var c = b.get()
      val start = b.position() - 1
      var n = 0
      while (c != 0) { n += 1; c = b.get() }
      new String(bytes, start, n, UTF_8)
    }
    def tuple(): Tuple = {
      val n = b.getShort().toInt
      (0 until n).map { _ =>
        b.get().toChar match {
          case 'n' => None
          case 'u' => Some(Left(()))
          case 't' =>
            val len = b.getInt()
            val arr = new Array[Byte](len)
            b.get(arr)
            Some(Right(new String(arr, UTF_8)))
          case other =>
            throw new IllegalArgumentException(s"bad TupleData kind '$other'")
        }
      }
    }
    b.get().toChar match {
      case 'B' => Begin(b.getLong(), b.getLong(), b.getInt().toLong & 0xffffffffL)
      case 'C' => CommitMsg(b.get().toInt, b.getLong(), b.getLong(), b.getLong())
      case 'Y' => skipStreamXid(); TypeMsg(b.getInt(), cstr(), cstr())
      case 'O' => Origin(b.getLong(), cstr())
      case 'S' => StreamStart(b.getInt().toLong & 0xffffffffL, b.get() == 1)
      case 'E' => StreamStop
      case 'c' =>
        val xid = b.getInt().toLong & 0xffffffffL
        b.get() // flags
        StreamCommit(xid, b.getLong(), b.getLong())
      case 'A' => StreamAbortMsg(b.getInt().toLong & 0xffffffffL,
        b.getInt().toLong & 0xffffffffL)
      case 'R' =>
        skipStreamXid()
        val relId = b.getInt()
        val ns = cstr(); val nm = cstr()
        val ident = b.get().toInt
        val ncols = b.getShort().toInt
        val cols = (0 until ncols).map { _ =>
          RelCol(b.get().toInt, cstr(), b.getInt(), b.getInt())
        }
        Relation(relId, ns, nm, ident, cols)
      case 'I' =>
        skipStreamXid()
        val relId = b.getInt()
        val kind = b.get().toChar
        require(kind == 'N', s"Insert expects 'N' tuple, got '$kind'")
        Insert(relId, tuple())
      case 'U' =>
        skipStreamXid()
        val relId = b.getInt()
        var kind = b.get().toChar
        val old = if (kind == 'K' || kind == 'O') {
          val t = tuple(); val k = kind; kind = b.get().toChar; Some((k, t))
        } else None
        require(kind == 'N', s"Update expects 'N' tuple, got '$kind'")
        Update(relId, old, tuple())
      case 'D' =>
        skipStreamXid()
        val relId = b.getInt()
        val kind = b.get().toChar
        require(kind == 'K' || kind == 'O', s"Delete expects 'K'/'O', got '$kind'")
        DeleteMsg(relId, kind, tuple())
      case 'T' =>
        skipStreamXid()
        val n = b.getInt(); b.get() // flags
        Truncate((0 until n).map(_ => b.getInt()))
      case other =>
        throw new IllegalArgumentException(s"unknown pgoutput message '$other'")
    }
  }

  // ---- binary encode (fixtures + the driver's synthetic feed) -----------

  private def buf(): java.io.ByteArrayOutputStream = new java.io.ByteArrayOutputStream()
  private implicit class Put(o: java.io.ByteArrayOutputStream) {
    def i8(v: Int): Put = { o.write(v & 0xff); this }
    def i16(v: Int): Put = { o.write((v >> 8) & 0xff); o.write(v & 0xff); this }
    def i32(v: Int): Put = { i16(v >>> 16); i16(v & 0xffff); this }
    def i64(v: Long): Put = { i32((v >>> 32).toInt); i32(v.toInt); this }
    def ch(c: Char): Put = i8(c)
    def cstr(s: String): Put = { o.write(s.getBytes(UTF_8)); o.write(0); this }
    def tuple(t: Seq[Option[String]]): Put = {
      i16(t.length)
      t.foreach {
        case scala.None => ch('n')
        case Some(s) =>
          val bs = s.getBytes(UTF_8); ch('t'); i32(bs.length); o.write(bs)
      }
      this
    }
    def bytes: Array[Byte] = o.toByteArray
  }

  def encodeBegin(finalLsn: Long, xid: Long): Array[Byte] =
    buf().ch('B').i64(finalLsn).i64(0L).i32(xid.toInt).bytes
  def encodeCommit(commitLsn: Long, endLsn: Long): Array[Byte] =
    buf().ch('C').i8(0).i64(commitLsn).i64(endLsn).i64(0L).bytes
  def encodeStreamStart(xid: Long, first: Boolean): Array[Byte] =
    buf().ch('S').i32(xid.toInt).i8(if (first) 1 else 0).bytes
  def encodeStreamStop(): Array[Byte] = buf().ch('E').bytes
  def encodeStreamCommit(xid: Long, commitLsn: Long): Array[Byte] =
    buf().ch('c').i32(xid.toInt).i8(0).i64(commitLsn).i64(commitLsn + 1).i64(0L).bytes
  def encodeStreamAbort(xid: Long): Array[Byte] =
    buf().ch('A').i32(xid.toInt).i32(xid.toInt).bytes
  def encodeStreamedInsert(xid: Long, relId: Int,
      row: Seq[Option[String]]): Array[Byte] =
    buf().ch('I').i32(xid.toInt).i32(relId).ch('N').tuple(row).bytes
  def encodeRelation(relId: Int, ns: String, name: String,
      cols: Seq[(String, Int)]): Array[Byte] = {
    val b = buf().ch('R').i32(relId).cstr(ns).cstr(name).i8('d').i16(cols.length)
    cols.foreach { case (n, oid) => b.i8(0).cstr(n).i32(oid).i32(-1) }
    b.bytes
  }
  def encodeInsert(relId: Int, row: Seq[Option[String]]): Array[Byte] =
    buf().ch('I').i32(relId).ch('N').tuple(row).bytes
  def encodeUpdate(relId: Int, row: Seq[Option[String]]): Array[Byte] =
    buf().ch('U').i32(relId).ch('N').tuple(row).bytes
  def encodeDelete(relId: Int, key: Seq[Option[String]]): Array[Byte] =
    buf().ch('D').i32(relId).ch('K').tuple(key).bytes

  // ---- PG type OIDs -> engine types --------------------------------------

  /** pg_type OID -> REST type name (the subset the reference's
   *  postgres_schema_to_moonlink_schema maps, `pg_replicate/util.rs`). */
  def restType(oid: Int, typeMod: Int): String = oid match {
    case 16 => "boolean"
    case 21 => "int16"
    case 23 => "int32"
    case 20 => "int64"
    case 700 => "float32"
    case 701 => "float64"
    case 25 | 1043 | 1042 => "string"
    case 17 => "string" // bytea surfaces as hex string at this layer
    // uuid / json / jsonb / time / "char" / name: text passthrough —
    // the ingest rules keep them queryable (JSON via Spark's json
    // functions), matching the reference's string-typed handling
    case 2950 | 114 | 3802 | 1083 | 18 | 19 => "string"
    case 1082 => "date32"
    case 1114 | 1184 => "timestamp"
    case 1700 =>
      // numeric typmod packs ((precision << 16) | scale) + 4; -1 = free
      if (typeMod == -1) "decimal(38,18)"
      else {
        val m = typeMod - 4
        s"decimal(${(m >> 16) & 0xffff},${m & 0xffff})"
      }
    case other =>
      throw new IllegalArgumentException(s"unmapped pg type oid $other")
  }

  /** text-format value -> the JVM value the table schema expects. */
  def parseValue(oid: Int, typeMod: Int, text: String): Any = oid match {
    case 16 => text == "t" || text == "true"
    case 21 => text.toShort
    case 23 => text.toInt
    case 20 => text.toLong
    case 700 => text.toFloat
    case 701 => text.toDouble
    case 25 | 1043 | 1042 | 17 | 2950 | 114 | 3802 | 1083 | 18 | 19 => text
    case 1082 => java.sql.Date.valueOf(text)
    case 1114 =>
      // timestamp WITHOUT time zone: wall-clock text, no offset
      java.sql.Timestamp.valueOf(text.trim)
    case 1184 =>
      // timestamptz: the primary renders in ITS TimeZone with an
      // explicit offset ([+-]HH[:MM[:SS]]) — honor it, don't assume
      // UTC (a "+05:30" primary would otherwise shift every instant)
      val t = text.trim
      "([+-]\\d{2}(?::\\d{2}){0,2})$".r.findFirstIn(t) match {
        case Some(off) =>
          val base = t.dropRight(off.length).trim
          val norm = if (off.length == 3) off + ":00" else off
          java.sql.Timestamp.from(java.time.OffsetDateTime.of(
            java.time.LocalDateTime.parse(base.replace(' ', 'T')),
            java.time.ZoneOffset.of(norm)).toInstant)
        case scala.None =>
          java.sql.Timestamp.valueOf(t.stripSuffix(" UTC").trim)
      }
    case 1700 => new java.math.BigDecimal(text)
    case other =>
      throw new IllegalArgumentException(s"unmapped pg type oid $other")
  }

  // ---- replication session: messages -> CdcEvents ------------------------

  /**
   * One logical-replication stream for ONE table (the reference fans a
   * publication out to per-table sinks the same way,
   * `moonlink_sink.rs:127-150`). Feed raw message bytes in WAL order;
   * collect [[CdcEvent]]s to apply.
   *
   *  - DML inside Begin..Commit carries the txn's xid as a streaming
   *    transaction id; Commit emits `Commit(lsn, Some(xid))` — exactly
   *    the engine's staged-xact machinery.
   *  - A `Relation` message whose column set differs from the
   *    registered one becomes in-stream `AlterAdd`/`AlterDrop` events
   *    (the reference's mid-stream AlterTable,
   *    `moonlink_sink.rs:347-361`).
   *  - `Update` = delete(old identity) + append(new); when no old key
   *    is present the key comes from the new tuple (replica identity
   *    unchanged). `UnchangedToast` columns are unsupported on the
   *    tables we ingest (the reference substitutes a type default;
   *    we reject loudly rather than fabricate a value).
   */
  final class Session(tableName: String, keyCols: Seq[String],
      // first synthesized event LSN: a catch-up session that starts at
      // a snapshot boundary numbers its events ABOVE the boundary (the
      // snapshot already contains everything at-or-below it)
      firstLsn: Long = 1L,
      // slot-redelivery floor: a resumed stream may RESEND transactions
      // the table already applied (acks ride keepalives, so the slot's
      // confirmed position can trail the applied position at a crash).
      // A Begin whose final_lsn is at-or-below this floor skips the
      // whole txn — events, commit, and alter diffs alike — instead of
      // double-applying it or tripping the LSN-monotonicity require
      // (the reference's skip_before_end_lsn, `pg_replicate.rs:727`).
      skipCommitsAtOrBelow: Long = 0L,
      // schema qualifier: on a shared stream two publication members
      // may share a relname across schemas (a.users vs b.users) — the
      // Relation match must then compare the namespace too, or both
      // sessions would claim whichever relation OID registered last
      // (the reference routes by src_table_id, which is schema-unique)
      srcNamespace: Option[String] = scala.None) {
    private var rel: Option[Relation] = scala.None
    /** relation OID of OUR table, learned from its Relation message —
     *  DML for any other relid is another publication member's traffic
     *  (the shared-stream multi-table case) and must route to Nil here,
     *  exactly as the reference's sink routes events per src_table_id
     *  (`moonlink_sink.rs:127-150`) */
    private var myRelId: Option[Int] = scala.None
    private var xid: Option[Long] = scala.None
    /** xid of the streamed (in-progress, v2) txn segment we are inside */
    private var streamXid: Option[Long] = scala.None
    private var nextLsn: Long = firstLsn // per-event LSNs within a txn
    /** nextLsn value right after the last Commit — the rollback point */
    private var committedNextLsn: Long = firstLsn
    /** rel as of the last Commit — the rollback point for schema state
     *  (an alter observed mid-txn must be re-emitted if the txn is
     *  dropped and resent after a transport blip) */
    private var committedRel: Option[Relation] = scala.None
    /** inside a redelivered (already-applied) txn being skipped */
    private var skipTxn = false
    /** streamed txns with segments in flight (v2 interleaving) */
    private val liveStreamXids = mutable.Set[Long]()

    private def cols: Seq[RelCol] = rel.get.cols
    private def keyIdx: Seq[Int] = keyCols.map(k => cols.indexWhere(_.name == k))

    private def rowOf(t: Tuple): Row = Row.fromSeq(
      t.zip(cols).map {
        case (scala.None, _) => null
        case (Some(Left(())), c) => throw new IllegalArgumentException(
          s"unchanged-TOAST column ${c.name}: replica identity FULL required")
        case (Some(Right(s)), c) => parseValue(c.typeOid, c.typeMod, s)
      })

    private def keyOf(t: Tuple): Seq[Any] = keyIdx.map { i =>
      t(i) match {
        case Some(Right(s)) => parseValue(cols(i).typeOid, cols(i).typeMod, s)
        case _ => throw new IllegalArgumentException(
          s"delete/update key column ${cols(i).name} missing from tuple")
      }
    }

    /** Relation OIDs announced for tables we do NOT own — an externally
     *  ALTERed publication (extra member added to graft_pub_<name>)
     *  makes the server announce+send foreign traffic even on a
     *  nominally single-table session; such announced DML degrades to
     *  ignored instead of killing the stream (ADVICE r17). */
    private val foreignRelIds = mutable.Set[Int]()

    /** DML whose relid we don't own. On a SHARED stream (srcNamespace
     *  set), once our Relation is known, or when the relid itself was
     *  ANNOUNCED by a Relation message, it is another publication
     *  member's traffic — route to Nil. DML for a relid the server
     *  NEVER announced can only mean a protocol violation (the server
     *  always sends Relation before a relation's first DML per
     *  connection): fail loudly rather than silently drop data. */
    private def foreignDml(rid: Int): Seq[CdcEvent] = {
      require(srcNamespace.isDefined || myRelId.isDefined ||
        foreignRelIds.contains(rid),
        s"DML for relation $rid before any Relation message on a " +
          "single-table session — protocol violation, refusing to drop")
      Nil
    }

    private def lsn(): Long = { val l = nextLsn; nextLsn += 1; l }
    /** streamed segments take priority over a Begin..Commit context */
    private def dmlXid: Option[Long] = streamXid.orElse(xid)

    def onMessage(bytes: Array[Byte]): Seq[CdcEvent] = {
      val msg = decode(bytes, streamed = streamXid.isDefined)
      if (skipTxn) msg match {
        case _: CommitMsg =>
          skipTxn = false
          // the skipped txn's schema effects are committed state
          committedRel = rel
          Nil
        case r @ Relation(_, rns, name, _, _)
            if name == tableName && srcNamespace.forall(_ == rns) =>
          // keep the decoder's column registration current; the alter
          // EVENTS were applied before the crash, so no diff is emitted
          rel = Some(r); myRelId = Some(r.relId); Nil
        case r: Relation =>
          foreignRelIds += r.relId; Nil // announced member we don't own
        case _ => Nil // already-applied events of the redelivered txn
      } else msg match {
      case Begin(finalLsn, _, x) =>
        // a redelivered, already-applied txn announces itself by its
        // final LSN — skip it whole (see skipCommitsAtOrBelow)
        if (finalLsn <= skipCommitsAtOrBelow) skipTxn = true
        else xid = Some(x)
        Nil
      case StreamStart(x, _) =>
        streamXid = Some(x); liveStreamXids += x; Nil
      case StreamStop =>
        streamXid = scala.None; Nil
      case StreamCommit(x, commitLsn, _) =>
        liveStreamXids -= x
        if (commitLsn <= skipCommitsAtOrBelow) {
          // redelivered already-applied STREAMED txn (its segments
          // carry no Begin, so the plain-txn skip could not catch it):
          // abort the re-staged duplicate instead of committing it
          // twice. The duplicate's segments consumed synthesized LSNs;
          // re-issue them so the counter cannot inflate past the next
          // genuine commit's LSN — but only when no OTHER txn is in
          // flight (rolling back under interleave would renumber a
          // live txn's later segments below its earlier ones)
          if (liveStreamXids.isEmpty && xid.isEmpty)
            nextLsn = committedNextLsn
          Seq(StreamAbort(x))
        } else {
          require(commitLsn >= nextLsn - 1,
            s"stream-commit LSN $commitLsn below last event LSN ${nextLsn - 1}")
          nextLsn = math.max(nextLsn, commitLsn + 1)
          committedNextLsn = nextLsn
          committedRel = rel
          Seq(Commit(commitLsn, Some(x)))
        }
      case StreamAbortMsg(x, _) =>
        liveStreamXids -= x
        Seq(StreamAbort(x))
      case _: TypeMsg | _: Origin => Nil // metadata-only messages
      case CommitMsg(_, commitLsn, _, _) =>
        // a commit publishes everything at-or-below its LSN, so it must
        // cover the txn's synthesized per-event LSNs (real WAL byte
        // positions always do; a synthetic feed must encode commit LSNs
        // past its event count)
        require(commitLsn >= nextLsn - 1,
          s"commit LSN $commitLsn below the txn's last event LSN ${nextLsn - 1}")
        val x = xid; xid = scala.None
        nextLsn = math.max(nextLsn, commitLsn + 1)
        committedNextLsn = nextLsn
        committedRel = rel
        Seq(Commit(commitLsn, x))
      case r @ Relation(_, rns, name, _, newCols) =>
        if (name != tableName || srcNamespace.exists(_ != rns)) {
          foreignRelIds += r.relId // announced member we don't own
          Nil // not our table's relation
        } else {
          val out = rel match {
            case scala.None => Nil
            case Some(old) =>
              val oldNames = old.cols.map(_.name)
              val newNames = newCols.map(_.name)
              val dropped = oldNames.filterNot(newNames.contains)
              val added = newCols.filterNot(c => oldNames.contains(c.name))
              (if (dropped.nonEmpty) Seq(AlterDrop(dropped, lsn())) else Nil) ++
                (if (added.nonEmpty) Seq(AlterAdd(
                  added.map(c => c.name -> restType(c.typeOid, c.typeMod)),
                  lsn())) else Nil)
          }
          rel = Some(r)
          myRelId = Some(r.relId)
          out
        }
      case Insert(rid, row) =>
        if (!myRelId.contains(rid)) foreignDml(rid)
        else Seq(Append(rowOf(row), lsn(), dmlXid))
      case Update(rid, oldKey, row) =>
        if (!myRelId.contains(rid)) foreignDml(rid)
        else {
          val l = lsn()
          val key = oldKey match {
            case Some((_, t)) => keyOf(t)
            case scala.None => keyOf(row) // identity unchanged
          }
          CdcEvent.upsert(rowOf(row), key, l, dmlXid)
        }
      case DeleteMsg(rid, _, key) =>
        if (!myRelId.contains(rid)) foreignDml(rid)
        else Seq(Delete(keyOf(key), lsn(), dmlXid))
      case Truncate(relIds) =>
        // the reference treats TRUNCATE as out-of-scope for moonlink
        // tables; surface loudly rather than silently dropping data —
        // but only when it names OUR relation (another publication
        // member's truncate is not this table's concern)
        if (myRelId.exists(relIds.contains))
          throw new UnsupportedOperationException(
            "TRUNCATE is not supported on graft tables")
        else Nil
      }
    }

    /** xid of the txn currently in flight, if any — the caller aborts
     *  its staged half on a transport reconnect (the resent txn
     *  re-stages from scratch). */
    def inFlightXid: Option[Long] = streamXid.orElse(xid)

    /** ALL txns with uncommitted state (the plain in-flight txn plus
     *  every interleaved streamed txn with open segments) — what a
     *  reconnecting caller must abort before the resend re-stages. */
    def inFlightXids: Seq[Long] = (liveStreamXids ++ xid).toSeq

    /** Discard in-flight (uncommitted) txn state after a transport
     *  reconnect: the primary resends an interrupted transaction WHOLE
     *  from the slot's confirmed position, so the partial events were
     *  dropped by the caller and their synthesized LSNs must be
     *  re-issued — otherwise the resent txn's fixed commit LSN could
     *  fall below the inflated event numbering. The RELATION
     *  registration rolls back to its last-committed state too: an
     *  alter observed mid-txn emitted its AlterAdd/AlterDrop into the
     *  dropped buffer, and only restoring the pre-txn schema makes the
     *  resent Relation re-emit that diff (rel left at the new schema
     *  would diff as a no-op and lose the schema change). */
    def rollbackUncommitted(): Unit = {
      nextLsn = committedNextLsn
      rel = committedRel
      xid = scala.None
      streamXid = scala.None
      liveStreamXids.clear()
      skipTxn = false
    }

    /** current registered schema as (name, REST type) pairs */
    def schema: Seq[(String, String)] =
      cols.map(c => c.name -> restType(c.typeOid, c.typeMod))
  }

  // ---- streaming-replication transport frames ---------------------------

  /**
   * The outer copy-data frames of the START_REPLICATION stream (public
   * PG docs, "Streaming Replication Protocol"): pgoutput messages ride
   * inside XLogData ('w'); the primary interleaves keepalives ('k');
   * the standby confirms progress with status updates ('r'). The
   * reference consumes the same two inbound frames
   * (`cdc_event.rs:185-186` PrimaryKeepAlive; XLogData via the
   * LogicalReplicationMessage stream) and confirms with
   * `standby_status_update(lsn, lsn, lsn, ts, 0)`
   * (`postgres_source.rs:565-573`).
   *
   *   'w' XLogData:         walStart i64, walEnd i64, sendTs i64, payload
   *   'k' PrimaryKeepalive: walEnd i64, sendTs i64, replyRequested i8
   *   'r' StandbyStatus:    written i64, flushed i64, applied i64,
   *                         sendTs i64, replyRequested i8
   */
  sealed trait Frame
  final case class XLogData(walStart: Long, walEnd: Long, sendTs: Long,
      payload: Array[Byte]) extends Frame
  final case class PrimaryKeepalive(walEnd: Long, sendTs: Long,
      replyRequested: Boolean) extends Frame
  final case class StandbyStatus(written: Long, flushed: Long, applied: Long,
      sendTs: Long, replyRequested: Boolean) extends Frame

  def decodeFrame(bytes: Array[Byte]): Frame = {
    val b = ByteBuffer.wrap(bytes)
    b.get().toChar match {
      case 'w' =>
        val walStart = b.getLong(); val walEnd = b.getLong()
        val ts = b.getLong()
        val payload = new Array[Byte](b.remaining()); b.get(payload)
        XLogData(walStart, walEnd, ts, payload)
      case 'k' => PrimaryKeepalive(b.getLong(), b.getLong(), b.get() == 1)
      case 'r' => StandbyStatus(b.getLong(), b.getLong(), b.getLong(),
        b.getLong(), b.get() == 1)
      case other =>
        throw new IllegalArgumentException(s"unknown replication frame '$other'")
    }
  }

  def encodeXLogData(walStart: Long, walEnd: Long,
      payload: Array[Byte]): Array[Byte] = {
    val os = buf()
    os.ch('w').i64(walStart).i64(walEnd).i64(0L)
    os.write(payload, 0, payload.length)
    os.toByteArray
  }
  def encodeKeepalive(walEnd: Long, replyRequested: Boolean): Array[Byte] =
    buf().ch('k').i64(walEnd).i64(0L).i8(if (replyRequested) 1 else 0).bytes
  def encodeStandbyStatus(flushed: Long): Array[Byte] =
    buf().ch('r').i64(flushed).i64(flushed).i64(flushed).i64(0L).i8(0).bytes

  /**
   * Frame-level replication loop state over a [[Session]]: unwraps
   * XLogData, enforces the keepalive floor the reference asserts
   * (`moonlink_sink.rs:205,215,371-374` — wal positions never move
   * backwards, and no commit may land below the highest keepalive
   * `wal_end` already seen), and tracks the confirmed LSN to feed back.
   *
   * The feedback contract mirrors the reference exactly: commits and
   * keepalives both advance the replication mark
   * (`moonlink_sink.rs:240,275,375` `replication_state.mark`), and the
   * status update confirms write=flush=apply at the marked LSN
   * (`postgres_source.rs:573`) — confirming tells the primary it may
   * recycle WAL, so the mark must only ever cover durably-applied
   * positions.
   */
  final class ReplicationStream(session: Session) {
    private var keepaliveFloor: Long = 0L
    private var confirmed: Long = 0L
    private var replyPending: Boolean = false

    def onFrame(bytes: Array[Byte]): Seq[CdcEvent] = decodeFrame(bytes) match {
      case PrimaryKeepalive(walEnd, _, reply) =>
        require(walEnd >= keepaliveFloor,
          s"keepalive wal_end $walEnd moved backwards (floor $keepaliveFloor)")
        keepaliveFloor = walEnd
        confirmed = math.max(confirmed, walEnd)
        if (reply) replyPending = true
        Nil
      case XLogData(_, _, _, payload) =>
        val events = session.onMessage(payload)
        events.foreach {
          case Commit(lsn, _) =>
            require(lsn >= keepaliveFloor,
              s"commit LSN $lsn below keepalive floor $keepaliveFloor")
            confirmed = math.max(confirmed, lsn)
          case _ => ()
        }
        events
      case f: StandbyStatus =>
        throw new IllegalArgumentException(
          s"standby status is an outbound frame, not stream input: $f")
    }

    /** LSN safe to confirm (highest commit/keepalive position seen). */
    def confirmedLsn: Long = confirmed

    /** Encoded 'r' feedback frame; clears any keepalive reply demand.
     *  Callers pass the LOWER of [[confirmedLsn]] and the table's
     *  persisted LSN when the sink lags the stream. */
    def statusUpdate(flushedLsn: Long): Array[Byte] = {
      require(flushedLsn <= confirmed,
        s"cannot confirm $flushedLsn past the stream position $confirmed")
      replyPending = false
      encodeStandbyStatus(flushedLsn)
    }

    def needsReply: Boolean = replyPending
  }
}
