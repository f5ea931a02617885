package graft

import graft.model._
import graft.sources.PgOutput
import graft.sources.PgOutput._
import graft.table._
import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/**
 * pgoutput logical-replication decode + session translation (S1's
 * protocol layer, reference `pg_replicate/conversions/cdc_event.rs`,
 * `moonlink_sink.rs:127-361`): binary round-trips, type mapping,
 * txn/xid tagging, mid-stream Relation changes -> alter events, and an
 * end-to-end feed into a GraftTable.
 */
class PgOutputSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-pgoutput-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val RelId = 77
  private val userCols = Seq("id" -> 20, "name" -> 25, "score" -> 701)

  test("binary decode round-trips every message shape") {
    decode(encodeBegin(100L, 42L)) match {
      case Begin(f, _, x) => assert(f == 100L && x == 42L)
      case other => fail(s"$other")
    }
    decode(encodeCommit(100L, 101L)) match {
      case CommitMsg(_, c, e, _) => assert(c == 100L && e == 101L)
      case other => fail(s"$other")
    }
    decode(encodeRelation(RelId, "public", "users", userCols)) match {
      case Relation(id, ns, nm, _, cols) =>
        assert(id == RelId && ns == "public" && nm == "users")
        assert(cols.map(c => c.name -> c.typeOid) == userCols)
      case other => fail(s"$other")
    }
    decode(encodeInsert(RelId, Seq(Some("1"), None, Some("2.5")))) match {
      case Insert(id, t) =>
        assert(id == RelId)
        assert(t == Seq(Some(Right("1")), None, Some(Right("2.5"))))
      case other => fail(s"$other")
    }
    decode(encodeDelete(RelId, Seq(Some("1"), None, None))) match {
      case DeleteMsg(id, 'K', t) =>
        assert(id == RelId && t.head == Some(Right("1")))
      case other => fail(s"$other")
    }
  }

  test("type OIDs map to engine types and parse text values") {
    assert(restType(20, -1) == "int64" && restType(701, -1) == "float64")
    assert(restType(1700, (12 << 16 | 2) + 4) == "decimal(12,2)")
    assert(parseValue(16, -1, "t") == true)
    assert(parseValue(20, -1, "9") == 9L)
    assert(parseValue(1114, -1, "2025-01-02 03:04:05.000001") ==
      java.sql.Timestamp.valueOf("2025-01-02 03:04:05.000001"))
    assert(parseValue(1700, -1, "1.25") == new java.math.BigDecimal("1.25"))
    // uuid / jsonb pass through as text
    assert(restType(2950, -1) == "string" && restType(3802, -1) == "string")
    assert(parseValue(2950, -1, "c0fee000-0000-4000-8000-000000000001")
      == "c0fee000-0000-4000-8000-000000000001")
    // timestamptz honors the PRIMARY's rendered offset — all three
    // spellings of the same instant parse equal
    val instant = java.sql.Timestamp.from(
      java.time.Instant.parse("2025-01-02T03:04:05.500Z"))
    assert(parseValue(1184, -1, "2025-01-02 03:04:05.5+00") == instant)
    assert(parseValue(1184, -1, "2025-01-02 08:34:05.5+05:30") == instant)
    assert(parseValue(1184, -1, "2025-01-01 19:04:05.5-08") == instant)
  }

  test("session translates a txn into xid-tagged events + commit") {
    val s = new Session("users", Seq("id"))
    assert(s.onMessage(encodeRelation(RelId, "public", "users", userCols)).isEmpty)
    assert(s.onMessage(encodeBegin(50L, 7L)).isEmpty)
    val ins = s.onMessage(encodeInsert(RelId, Seq(Some("1"), Some("a"), Some("1.5"))))
    assert(ins == Seq(Append(Row(1L, "a", 1.5), 1L, Some(7L))))
    val upd = s.onMessage(encodeUpdate(RelId, Seq(Some("1"), Some("b"), Some("2.5"))))
    assert(upd == Seq(
      Delete(Seq(1L), 2L, Some(7L), ifExists = true),
      Append(Row(1L, "b", 2.5), 2L, Some(7L))))
    val del = s.onMessage(encodeDelete(RelId, Seq(Some("1"), None, None)))
    assert(del == Seq(Delete(Seq(1L), 3L, Some(7L))))
    val com = s.onMessage(encodeCommit(50L, 51L))
    assert(com == Seq(Commit(50L, Some(7L))))
    // next txn gets a fresh xid and LSNs past the last commit
    assert(s.onMessage(encodeBegin(90L, 8L)).isEmpty)
    val ins2 = s.onMessage(encodeInsert(RelId, Seq(Some("2"), Some("c"), None)))
    assert(ins2 == Seq(Append(Row(2L, "c", null), 51L, Some(8L))))
  }

  test("changed Relation message becomes in-stream alter events") {
    val s = new Session("users", Seq("id"))
    s.onMessage(encodeRelation(RelId, "public", "users", userCols))
    // same column set again: no alters
    assert(s.onMessage(encodeRelation(RelId, "public", "users", userCols)).isEmpty)
    // drop 'score', add 'tag' text
    val changed = s.onMessage(encodeRelation(RelId, "public", "users",
      Seq("id" -> 20, "name" -> 25, "tag" -> 25)))
    assert(changed == Seq(
      AlterDrop(Seq("score"), 1L),
      AlterAdd(Seq("tag" -> "string"), 2L)))
    assert(s.schema == Seq("id" -> "int64", "name" -> "string", "tag" -> "string"))
    // a relation for a DIFFERENT table is ignored
    assert(s.onMessage(encodeRelation(78, "public", "other",
      Seq("x" -> 20))).isEmpty)
  }

  test("end-to-end: pgoutput feed drives a GraftTable, alters included") {
    val dir = Files.createTempDirectory("graft-pg").toString + "/t"
    val t = GraftTable.create(spark, dir,
      SchemaDsl.struct("id" -> "int64", "name" -> "string", "score" -> "float64"),
      Identity.Keys(Seq("id")), TableConfig(memSliceSize = 4, walEnabled = false))
    val s = new Session("users", Seq("id"))
    def feed(msgs: Array[Byte]*): Unit =
      t.apply(msgs.flatMap(s.onMessage))
    feed(
      encodeRelation(RelId, "public", "users", userCols),
      encodeBegin(100L, 11L),
      encodeInsert(RelId, Seq(Some("1"), Some("a"), Some("1.5"))),
      encodeInsert(RelId, Seq(Some("2"), Some("b"), Some("2.5"))),
      encodeUpdate(RelId, Seq(Some("1"), Some("a2"), Some("9.5"))),
      encodeCommit(100L, 101L))
    // mid-stream schema change + more data in a second txn
    feed(
      encodeRelation(RelId, "public", "users",
        Seq("id" -> 20, "name" -> 25, "score" -> 701, "tier" -> 25)),
      encodeBegin(200L, 12L),
      encodeInsert(RelId, Seq(Some("3"), Some("c"), Some("3.5"), Some("gold"))),
      encodeDelete(RelId, Seq(Some("2"), None, None, None)),
      encodeCommit(200L, 201L))
    assert(t.schema.fieldNames.toSeq == Seq("id", "name", "score", "tier"))
    val got = t.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        if (r.isNullAt(3)) null else r.getString(3))).toSeq
    assert(got == Seq((1L, "a2", 9.5, null), (3L, "c", 3.5, "gold")))
    t.drop()
  }

  test("streamed (in-progress) txn: segments, commit, and abort") {
    // protocol v2: large txns stream in segments before their commit;
    // DML inside a segment carries a leading xid. Abort must discard
    // everything staged (the engine's StreamAbort machinery).
    val dir = Files.createTempDirectory("graft-pgstream").toString + "/t"
    val t = GraftTable.create(spark, dir,
      SchemaDsl.struct("id" -> "int64", "name" -> "string", "score" -> "float64"),
      Identity.Keys(Seq("id")),
      TableConfig(memSliceSize = 2, walEnabled = false)) // forces staged flushes
    val s = new Session("users", Seq("id"))
    def feed(msgs: Array[Byte]*): Unit = t.apply(msgs.flatMap(s.onMessage))
    feed(encodeRelation(RelId, "public", "users", userCols))
    // txn 21 streams two segments then commits
    feed(
      encodeStreamStart(21L, first = true),
      encodeStreamedInsert(21L, RelId, Seq(Some("1"), Some("a"), Some("1.0"))),
      encodeStreamedInsert(21L, RelId, Seq(Some("2"), Some("b"), Some("2.0"))),
      encodeStreamStop(),
      encodeStreamStart(21L, first = false),
      encodeStreamedInsert(21L, RelId, Seq(Some("3"), Some("c"), Some("3.0"))),
      encodeStreamStop(),
      encodeStreamCommit(21L, 100L))
    assert(t.read().count() == 3)
    // txn 22 streams a segment then ABORTS: nothing may surface
    feed(
      encodeStreamStart(22L, first = true),
      encodeStreamedInsert(22L, RelId, Seq(Some("9"), Some("x"), Some("9.0"))),
      encodeStreamedInsert(22L, RelId, Seq(Some("10"), Some("y"), Some("10.0"))),
      encodeStreamStop(),
      encodeStreamAbort(22L))
    val ids = t.read().collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L), s"aborted streamed txn leaked: $ids")
    t.drop()
  }

  test("transport frames: XLogData unwrap, keepalive floor, feedback") {
    // the outer START_REPLICATION frames around the pgoutput payloads;
    // keepalive floor + confirm semantics per the reference sink
    val dir = Files.createTempDirectory("graft-pgframe").toString + "/t"
    val t = GraftTable.create(spark, dir,
      SchemaDsl.struct("id" -> "int64", "name" -> "string", "score" -> "float64"),
      Identity.Keys(Seq("id")), TableConfig(walEnabled = false))
    val rs = new ReplicationStream(new Session("users", Seq("id")))
    def feed(msgs: Array[Byte]*): Unit =
      t.apply(msgs.flatMap(m => rs.onFrame(encodeXLogData(1L, 2L, m))))
    feed(encodeRelation(RelId, "public", "users", userCols))
    // keepalive advances the confirmable position ahead of any commit
    assert(rs.onFrame(encodeKeepalive(50L, replyRequested = false)).isEmpty)
    assert(rs.confirmedLsn == 50L)
    feed(
      encodeBegin(60L, 7L),
      encodeInsert(RelId, Seq(Some("1"), Some("a"), Some("1.5"))),
      encodeCommit(60L, 61L))
    assert(t.read().count() == 1)
    assert(rs.confirmedLsn == 60L)
    // a reply-requested keepalive demands feedback; statusUpdate clears it
    rs.onFrame(encodeKeepalive(70L, replyRequested = true))
    assert(rs.needsReply)
    decodeFrame(rs.statusUpdate(65L)) match {
      case StandbyStatus(w, f, a, _, _) =>
        assert(w == 65L && f == 65L && a == 65L)
      case other => fail(s"$other")
    }
    assert(!rs.needsReply)
    // floor violations surface loudly: backwards keepalive, low commit,
    // confirming past the stream position
    intercept[IllegalArgumentException] {
      rs.onFrame(encodeKeepalive(40L, replyRequested = false))
    }
    intercept[IllegalArgumentException] {
      feed(encodeBegin(62L, 8L),
        encodeInsert(RelId, Seq(Some("2"), Some("b"), Some("2.5"))),
        encodeCommit(62L, 63L)) // 62 < keepalive floor 70
    }
    intercept[IllegalArgumentException] { rs.statusUpdate(9999L) }
    t.drop()
  }

  test("session rejects TOAST placeholders and early DML loudly") {
    val s = new Session("users", Seq("id"))
    // DML before ANY Relation on a SINGLE-TABLE session can only be a
    // protocol violation — the server always sends Relation before a
    // relation's first DML per connection, and the publication has
    // exactly one member: fail loudly, never silently drop data
    // (ADVICE r17 restored the r15 contract the r16 multiplex work
    // had relaxed)
    intercept[IllegalArgumentException] { s.onMessage(
      encodeInsert(RelId, Seq(Some("1"), Some("a"), Some("1.5")))) }
    // on a SHARED stream (srcNamespace set) the same bytes are another
    // publication member's traffic (the r16 multiplex contract,
    // reference moonlink_sink.rs:127-150 per-relation routing): routed
    // to Nil, never misparsed against a wrong schema
    val sh = new Session("users", Seq("id"), srcNamespace = Some("public"))
    assert(sh.onMessage(
      encodeInsert(RelId, Seq(Some("1"), Some("a"), Some("1.5")))).isEmpty)
    // an ANNOUNCED foreign relation's DML degrades to ignored even
    // BEFORE our Relation arrives (ADVICE r17: an externally ALTERed
    // publication — extra member added to graft_pub_<name> — makes the
    // server announce+send foreign traffic first; the server DID
    // follow protocol, so this must not kill the stream)
    val sx = new Session("users", Seq("id"))
    sx.onMessage(encodeRelation(RelId + 3, "public", "audit_log", userCols))
    assert(sx.onMessage(
      encodeInsert(RelId + 3, Seq(Some("7"), Some("z"), scala.None))).isEmpty)
    // …while DML for a relid the server NEVER announced still throws
    intercept[IllegalArgumentException] { sx.onMessage(
      encodeInsert(RelId + 8, Seq(Some("7"), Some("z"), scala.None))) }
    // and once OUR Relation is known, a DIFFERENT relid is foreign
    // traffic even on a single-table session (FOR ALL TABLES pubs)
    s.onMessage(encodeRelation(RelId, "public", "users", userCols))
    assert(s.onMessage(
      encodeInsert(RelId + 7, Seq(Some("9"), Some("x"), scala.None))).isEmpty)
    // hand-craft an unchanged-TOAST tuple ('u' kind)
    val raw = {
      val o = new java.io.ByteArrayOutputStream()
      o.write('I'); // msg
      o.write(Array[Byte](0, 0, 0, RelId.toByte)) // relid
      o.write('N')
      o.write(Array[Byte](0, 3)) // ncols
      o.write('t'); o.write(Array[Byte](0, 0, 0, 1)); o.write('1')
      o.write('u')
      o.write('n')
      o.toByteArray
    }
    intercept[IllegalArgumentException] { s.onMessage(raw) }
  }

  test("schema-qualified sessions disambiguate same-named relations") {
    // a shared stream may carry a.users AND b.users (distinct relation
    // OIDs); a session pinned to its namespace must only ever claim
    // its own — the reference routes by src_table_id for this reason
    val sa = new Session("users", Seq("id"), srcNamespace = Some("a"))
    val sb = new Session("users", Seq("id"), srcNamespace = Some("b"))
    val relA = encodeRelation(41, "a", "users", userCols)
    val relB = encodeRelation(42, "b", "users", userCols)
    assert(sa.onMessage(relA).isEmpty && sa.onMessage(relB).isEmpty)
    assert(sb.onMessage(relA).isEmpty && sb.onMessage(relB).isEmpty)
    sa.onMessage(encodeBegin(60L, 9L)); sb.onMessage(encodeBegin(60L, 9L))
    val insA = encodeInsert(41, Seq(Some("1"), Some("in-a"), scala.None))
    val insB = encodeInsert(42, Seq(Some("2"), Some("in-b"), scala.None))
    // each session claims exactly its own namespace's relation OID
    assert(sa.onMessage(insA).nonEmpty && sa.onMessage(insB).isEmpty)
    assert(sb.onMessage(insA).isEmpty && sb.onMessage(insB).nonEmpty)
  }
}
