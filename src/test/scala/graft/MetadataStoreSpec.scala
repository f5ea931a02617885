package graft

import graft.model._
import graft.table._
import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/**
 * Durable table registry + startup recovery, mirroring the reference's
 * `moonlink_metadata_store` store/load/delete contract
 * (`base_metadata_store.rs:30-68`) and the backend's recover-all path
 * (`moonlink_backend/src/recovery_utils.rs:120-170`).
 */
class MetadataStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmpDir(): String =
    Files.createTempDirectory("graft-meta").toString

  private val schema = SchemaDsl.struct(
    "id" -> "int64", "v" -> "int64")

  /** The reference's MetadataStoreTrait contract
   *  (`base_metadata_store.rs:30-68`), run verbatim against EVERY
   *  backend: existence probe, ordered full read, config fidelity,
   *  duplicate-id refusal, guarded delete. `reopen` models a process
   *  restart (a fresh handle over the same storage) — identity for
   *  backends without durable storage. */
  private def contractSuite(mk: () => MetadataBackend,
      reopen: MetadataBackend => MetadataBackend): Unit = {
    val st = mk()
    assert(!st.metadataTableExists)
    assert(st.allEntries().isEmpty)
    val cfg = TableConfig(memSliceSize = 7, walEnabled = false,
      compactDeleteRatio = 0.25)
    st.store(TableMetadataEntry("db", "t1", "src_t1", "postgres://h/db",
      Identity.Keys(Seq("id", "v")), cfg))
    st.store(TableMetadataEntry("db", "t2", "t2", MetadataStore.RestUri,
      Identity.None, TableConfig()))
    assert(st.metadataTableExists)
    // restart: a fresh handle over the same storage sees both entries
    val st2 = reopen(st)
    val all = st2.allEntries()
    assert(all.map(_.table) == Seq("t1", "t2"))
    val e1 = all.head
    assert(e1.srcUri == "postgres://h/db" && e1.srcTableName == "src_t1")
    assert(e1.identity == Identity.Keys(Seq("id", "v")))
    assert(e1.config == cfg)
    assert(all(1).identity == Identity.None &&
      all(1).srcUri == MetadataStore.RestUri)
    // duplicate id refused; delete requires existence
    intercept[IllegalArgumentException] {
      st2.store(TableMetadataEntry("db", "t1", "x", "y", Identity.FullRow,
        TableConfig()))
    }
    st2.delete("db", "t1")
    assert(st2.allEntries().map(_.table) == Seq("t2"))
    intercept[IllegalArgumentException] { st2.delete("db", "t1") }
  }

  test("contract: versioned-JSON filesystem backend (restart included)") {
    contractSuite(() => new MetadataStore(tmpDir()),
      st => new MetadataStore(st.asInstanceOf[MetadataStore].warehouse))
  }

  test("contract: in-memory backend") {
    contractSuite(() => new InMemoryMetadataBackend, identity)
  }

  test("contract: postgres WIRE backend over a scripted registry primary") {
    // the reference's postgres registry (postgres_metadata_store.rs)
    // spoken over the engine's own v3 simple-query client — no driver
    // jar; the scripted primary holds the registry across connections
    // and answers duplicate inserts with a real SQLSTATE-23505
    // ErrorResponse. "reopen" = a fresh backend handle, new sockets.
    val srv = new PgMockMetaServer().start()
    try {
      contractSuite(
        () => new PgWireMetadataBackend("127.0.0.1", srv.port),
        _ => new PgWireMetadataBackend("127.0.0.1", srv.port))
      assert(srv.error.isEmpty, srv.error)
    } finally srv.stop()
  }

  test("JDBC backend speaks the reference registry schema") {
    // no driver jars ship in this environment, so the backend is pinned
    // two ways: (a) its SQL is the reference's `tables` schema verbatim
    // (create_tables.sql / sqlite_metadata_store.rs:35-126), (b) the
    // `config` column document round-trips an entry exactly
    assert(JdbcMetadataBackend.CreateTableSql.contains("\"database\" TEXT"))
    assert(JdbcMetadataBackend.CreateTableSql
      .contains("PRIMARY KEY (\"database\", \"table\")"))
    assert(JdbcMetadataBackend.InsertSql.contains("INSERT INTO tables"))
    assert(JdbcMetadataBackend.InsertSql.contains("src_table_name"))
    assert(JdbcMetadataBackend.DeleteSql ==
      """DELETE FROM tables WHERE "database" = ? AND "table" = ?""")
    assert(JdbcMetadataBackend.SelectAllSql.contains("FROM tables t"))
    val cfg = TableConfig(memSliceSize = 3, walEnabled = true,
      compactDeleteRatio = 0.5)
    val e = TableMetadataEntry("db", "t", "src", "postgres://h/db",
      Identity.Keys(Seq("id")), cfg)
    val json = MetadataStore.configToJson(e)
    val back = MetadataStore.configFromJson("db", "t", "src",
      "postgres://h/db", json)
    assert(back == e, s"config column round-trip drifted: $json")
    // connecting without a driver fails with the JDBC no-driver error,
    // not a graft one — the seam is ready for a real jar
    val ex = intercept[java.sql.SQLException] {
      new JdbcMetadataBackend("jdbc:sqlite::memory:").allEntries()
    }
    assert(ex.getMessage.toLowerCase.contains("no suitable driver"))
  }

  test("duplicate detection matches vendor constraint signals, nothing else") {
    import java.sql.{SQLException, SQLIntegrityConstraintViolationException}
    def cv(e: SQLException) = JdbcMetadataBackend.isConstraintViolation(e)
    // standard signals: the dedicated subclass, or SQLState class 23
    assert(cv(new SQLIntegrityConstraintViolationException("dup")))
    assert(cv(new SQLException("dup", "23505", 0)))
    // xerial sqlite-jdbc reports null/non-standard SQLStates: match the
    // SQLite result code SQLITE_CONSTRAINT (19 / extended 1555) or a
    // message naming it — but only when the error IS from that driver
    assert(cv(new SQLException(
      "[SQLITE_CONSTRAINT_PRIMARYKEY] A PRIMARY KEY constraint failed",
      null: String, 1555)))
    assert(cv(new SQLException("[SQLITE_CONSTRAINT] failed", null: String, 19)))
    // non-sqlite vendors with overlapping low bytes must NOT match …
    assert(!cv(new SQLException("duplicate entry", "HY000", 1555)))
    // … and connectivity/permission/DDL failures must surface as-is
    assert(!cv(new SQLException("connection refused", "08001", 0)))
    assert(!cv(new SQLException("no such table: tables", null: String, 1)))
  }

  test("catalog persists creates/drops; recover() reopens every table") {
    val wh = tmpDir()
    val cat = GraftCatalog(spark, wh)
    val t1 = cat.createTable("kv", schema, Identity.Keys(Seq("id")),
      TableConfig(memSliceSize = 4, walEnabled = true))
    val t2 = cat.createTable("log", schema, Identity.None,
      TableConfig(walEnabled = false))
    t1.apply(Seq(Append(Row(1L, 10L), 1), Append(Row(2L, 20L), 2),
      Delete(Seq(1L), 3), Commit(4)))
    t1.flush(); t1.publish()
    t2.insertAll(Seq(Row(5L, 50L), Row(6L, 60L), Row(7L, 70L)), startLsn = 1)
    // no WAL on t2: durability needs the flushed files in a published
    // manifest (flush writes data, publish commits the snapshot)
    t2.flush(); t2.publish()

    // "restart": a brand-new catalog instance over the same warehouse
    val (cat2, missing) = GraftCatalog.recover(spark, wh)
    assert(missing.isEmpty)
    assert(cat2.list.toSet == Set("kv", "log"))
    assert(cat2.table("kv").read().collect().map(_.getLong(0)).toSet == Set(2L))
    assert(cat2.table("log").read().count() == 3)
    // recovered tables keep accepting writes at the recovered LSN
    val kv = cat2.table("kv")
    kv.insertAll(Seq(Row(9L, 90L)), startLsn = kv.commitLsn + 1)
    assert(kv.read().collect().map(_.getLong(0)).toSet == Set(2L, 9L))
    // views registered: plain SQL works over recovered state
    assert(spark.sql("SELECT count(*) AS n FROM log").head().getLong(0) == 3)

    // drop removes the registry entry; the next recovery skips it
    cat2.dropTable("log")
    val (cat3, _) = GraftCatalog.recover(spark, wh)
    assert(cat3.list == Seq("kv"))
  }

  test("tableStatus reports reference table_status.rs fields") {
    val wh = tmpDir()
    val cat = GraftCatalog(spark, wh, database = "proddb")
    val t = cat.createTable("kv", schema, Identity.Keys(Seq("id")))
    t.insertAll(Seq(Row(1L, 1L), Row(2L, 2L), Row(3L, 3L)), startLsn = 1)
    t.flush(); t.publish()
    val st = cat.tableStatus("kv")
    // commit at LSN 4; flush LSN = highest flushed ROW lsn (3); no
    // replication stream → both mirror-health fields are None
    assert(st == TableStatus("proddb", "kv", 4L, 3L, 3L, wh))
    val df = cat.statusAll
    assert(df.columns.toSeq == Seq("database", "table", "commit_lsn",
      "flush_lsn", "cardinality", "warehouse_location",
      "replicating", "repl_error"))
    assert(df.head().getLong(4) == 3L)
    assert(df.head().isNullAt(6) && df.head().isNullAt(7))
  }

  test("recovery surfaces a registered-but-never-created table") {
    val wh = tmpDir()
    val cat = GraftCatalog(spark, wh)
    // simulate a crash between registry commit and table create
    cat.metadataStore.store(TableMetadataEntry("graft", "ghost", "ghost",
      MetadataStore.RestUri, Identity.None, TableConfig()))
    val (cat2, missing) = GraftCatalog.recover(spark, wh)
    assert(cat2.list.isEmpty)
    assert(missing.map(_.table) == Seq("ghost"))
  }
}
