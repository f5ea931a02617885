package graft.sources

import graft.table.GraftCatalog
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * Single-connection snapshot + catch-up (reference
 * `pg_replicate/clients/postgres.rs`: schema query :270-315, read-only
 * txn :106-113, CREATE_REPLICATION_SLOT USE_SNAPSHOT :806-833, COPY
 * :247-267, START_REPLICATION :921) behind the REST
 * `POST /tables/{t}/from_postgres` verb — all over one real TCP
 * connection against the scripted primary.
 */
class PgInitialSyncSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-pgsync-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val columns = Seq(
    PgColumn("id", 20, -1, notNull = true, primary = true),
    PgColumn("name", 25, -1, notNull = false, primary = false),
    PgColumn("score", 701, -1, notNull = false, primary = false))

  private val copyRows = Seq(
    Seq(Some("1"), Some("tab\there\nand newline"), Some("1.5")),
    Seq(Some("2"), Some("bob"), Some("2.0")),
    Seq(Some("3"), Some("carol"), scala.None),
    Seq(Some("4"), scala.None, Some("4.25")))

  /** catch-up frames: one txn of update/insert/delete above the
   *  boundary (Session numbers events from boundary+1; the commit LSN
   *  must cover them). */
  private def cdcFrames(table: String): Seq[Array[Byte]] = Seq(
    PgOutput.encodeRelation(7, "public", table,
      Seq("id" -> 20, "name" -> 25, "score" -> 701)),
    PgOutput.encodeBegin(1010L, 55L),
    PgOutput.encodeUpdate(7, Seq(Some("2"), Some("bob2"), Some("2.5"))),
    PgOutput.encodeInsert(7, Seq(Some("9"), Some("nina"), scala.None)),
    PgOutput.encodeDelete(7, Seq(Some("3"), scala.None, scala.None)),
    PgOutput.encodeCommit(1010L, 1011L))

  test("COPY text rows round-trip escapes, NULLs and unicode") {
    val rows = Seq(
      Seq(Some("plain"), scala.None, Some("")),
      Seq(Some("tab\tnl\ncr\rbs\\"), Some("emoji 😀"), scala.None),
      Seq(scala.None, Some("\\N"), Some("ab\fc\bd")))
    rows.foreach { r =>
      val line = new String(PgCopyText.encode(r), "UTF-8")
      assert(line.endsWith("\n"))
      assert(PgCopyText.decodeLine(line.stripSuffix("\n")) == r,
        s"round-trip failed for $r")
    }
    // NULL (\N) and empty string are distinct fields
    val both = Seq(scala.None, Some(""))
    assert(PgCopyText.decodeLine(
      new String(PgCopyText.encode(both), "UTF-8").stripSuffix("\n")) == both)
  }

  test("snapshot + catch-up over one wire connection") {
    val cat = GraftCatalog(spark,
      java.nio.file.Files.createTempDirectory("pgsync-wh").toString)
    val primary = new PgMockPrimary(columns, copyRows,
      consistentPoint = 1000L, frames = cdcFrames("users")).start()
    val res = PgInitialSync.run(cat, "users", "public.users",
      host = "127.0.0.1", port = primary.port, user = "postgres",
      database = "postgres", srcUri = s"postgresql://127.0.0.1:${primary.port}/postgres")
    assert(res.boundaryLsn == 1000L && res.copiedRows == 4L)
    res.catchUp.join(30000)
    primary.join()
    assert(primary.error.isEmpty, primary.error)
    assert(res.error().isEmpty, res.error())
    // protocol discipline the reference relies on
    assert(primary.sawReplicationParam, "replication=database missing")
    assert(primary.sawSchemaQuery, "column-schema catalog query missing")
    assert(primary.sawSnapshotSlot, "slot must be created USE_SNAPSHOT")
    assert(primary.copySentInsideTxn, "COPY must run inside the slot's txn")
    assert(primary.startedAtLsn == 1000L,
      s"catch-up must start AT the consistent point, got ${primary.startedAtLsn}")
    assert(primary.statusUpdates.nonEmpty, "no standby acks reached the primary")
    // table state: snapshot fold + the catch-up txn
    val t = cat.table("users")
    assert(t.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(t.commitLsn == 1010L)
    val got = t.read().collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // id=1 pins the COPY text escapes end to end (tab + newline)
    assert(got == Map(1L -> Some("tab\there\nand newline"),
      2L -> Some("bob2"), 4L -> scala.None, 9L -> Some("nina")))
    // registry entry carries the source for recovery
    val entry = cat.metadataStore.allEntries().find(_.table == "users").get
    assert(entry.srcUri.startsWith("postgresql://"))
    assert(entry.srcTableName == "public.users")
  }

  test("REST POST /tables/{t}/from_postgres drives the whole flow") {
    val cat = GraftCatalog(spark,
      java.nio.file.Files.createTempDirectory("pgsync-rest-wh").toString)
    val srv = RestServer.start(cat)
    try {
      val primary = new PgMockPrimary(columns, copyRows,
        consistentPoint = 1000L, frames = cdcFrames("users")).start()
      val body =
        s"""{"database":"graftdb","table":"mirrored",
           |"src_uri":"postgresql://postgres@127.0.0.1:${primary.port}/postgres",
           |"src_table_name":"public.users"}""".stripMargin
      val conn = java.net.URI.create(
        s"${srv.baseUrl}/tables/mirrored/from_postgres").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setRequestProperty("Content-Type", "application/json")
      conn.setDoOutput(true)
      val bytes = body.getBytes("UTF-8")
      conn.setFixedLengthStreamingMode(bytes.length)
      val os = conn.getOutputStream
      try os.write(bytes) finally os.close()
      val status = conn.getResponseCode
      val resp = new String(conn.getInputStream.readAllBytes(), "UTF-8")
      assert(status == 200, resp)
      assert(resp.contains("\"copied_rows\":4"))
      primary.join()
      assert(primary.error.isEmpty, primary.error)
      // the catch-up thread applies after the response: poll commit_lsn
      val deadline = System.currentTimeMillis() + 20000
      while (cat.table("mirrored").commitLsn < 1010L &&
          System.currentTimeMillis() < deadline) Thread.sleep(20)
      val t = cat.table("mirrored")
      assert(t.commitLsn == 1010L, "catch-up never applied")
      assert(t.read().count() == 4)
      assert(t.read().where("id = 9").count() == 1)
    } finally srv.stop()
  }
}
