package graft.table

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.{ClassTagExtensions, DefaultScalaModule}

import graft.format.Fio
import graft.model.Identity

/**
 * Durable table-metadata registry — the Spark-side counterpart of the
 * reference's `moonlink_metadata_store` crate
 * (`base_metadata_store.rs:14-68`: a `mooncake.tables` store holding
 * one `TableMetadataEntry` per table — database, table, src table
 * name, src URI, full table config), which the backend reads at
 * startup to recover every table (`moonlink_backend/src/
 * recovery_utils.rs`).
 *
 * The reference offers sqlite and postgres backends; neither runs in
 * this environment, and a versioned JSON document under the warehouse
 * (`<warehouse>/_metadata/tables-v%09d.json` — each registry commit
 * writes the NEXT version atomically, latest version present wins,
 * exactly the manifest log's commit idiom) provides the same contract
 * on any Hadoop filesystem (file://, hdfs://, s3a://): the store
 * survives process restarts, a reader never observes a torn or stale
 * write (rename-over-existing is not atomic everywhere, so versions
 * are never overwritten in place), and the registry travels with the
 * warehouse. Writes go through the same [[graft.format.FioFaults]]
 * seam as manifest commits, so chaos tests exercise
 * crash-during-registry-commit too.
 *
 * Registry size is one entry per TABLE (not per file) — thousands of
 * entries at the extreme, so a single JSON document is the right
 * shape at any data scale; per-table state lives in each table's own
 * manifest log.
 */
final case class TableMetadataEntry(
    database: String,
    table: String,
    /** upstream table name (REST tables: the logical name clients post to). */
    srcTableName: String,
    /** upstream connection string; [[MetadataStore.RestUri]] marks
     *  REST-API-created tables (reference `REST_API_URI`). */
    srcUri: String,
    /** identity kind: "none" (append-only) | "keys" | "fullrow". */
    identityKind: String,
    keyCols: Seq[String],
    config: TableConfig) {

  def identity: Identity = identityKind match {
    case "none"    => Identity.None
    case "keys"    => Identity.Keys(keyCols)
    case "fullrow" => Identity.FullRow
    case other     => sys.error(s"unknown identity kind '$other'")
  }
}

object TableMetadataEntry {
  def apply(database: String, table: String, srcTableName: String,
      srcUri: String, id: Identity, config: TableConfig): TableMetadataEntry = {
    val (kind, cols) = id match {
      case Identity.None       => ("none", Seq.empty[String])
      case Identity.Keys(cols) => ("keys", cols)
      case Identity.FullRow    => ("fullrow", Seq.empty[String])
    }
    TableMetadataEntry(database, table, srcTableName, srcUri, kind, cols, config)
  }
}

/**
 * Backend seam over the registry — the reference's `MetadataStoreTrait`
 * (`base_metadata_store.rs:29-68`) verb for verb: existence probe, full
 * read, guarded insert, guarded delete. The versioned-JSON filesystem
 * store ([[MetadataStore]]) is the default; [[InMemoryMetadataBackend]]
 * exercises the contract without a filesystem; [[JdbcMetadataBackend]]
 * speaks the reference's exact `tables` schema over plain `java.sql`,
 * so a real sqlite/Postgres registry is a drop-in the moment a JDBC
 * driver jar appears on the classpath (none ship in this environment).
 * MetadataStoreSpec runs ONE contract suite against every backend.
 */
trait MetadataBackend {
  /** reference `metadata_table_exists` */
  def metadataTableExists: Boolean
  /** reference `get_all_table_metadata_entries` */
  def allEntries(): Seq[TableMetadataEntry]
  /** reference `store_table_metadata` — creates the store on first
   *  use; refuses a duplicate (database, table) id. */
  def store(entry: TableMetadataEntry): Unit
  /** reference `delete_table_metadata` — the entry must exist. */
  def delete(database: String, table: String): Unit
}

final class MetadataStore(val warehouse: String) extends MetadataBackend {
  private val dir = s"$warehouse/_metadata"

  private def versions(): Seq[Long] =
    Fio.list(dir)
      .filter(n => n.startsWith("tables-v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("tables-v").stripSuffix(".json").toLong)
      .sorted

  private def file(v: Long): String = f"$dir/tables-v$v%09d.json"

  override def metadataTableExists: Boolean = versions().nonEmpty

  override def allEntries(): Seq[TableMetadataEntry] = synchronized {
    versions().lastOption match {
      case Some(v) => MetadataStore.fromJson(Fio.readString(file(v)))
      case None    => Seq.empty
    }
  }

  override def store(entry: TableMetadataEntry): Unit = synchronized {
    val cur = allEntries()
    require(!cur.exists(e => e.database == entry.database && e.table == entry.table),
      s"metadata for ${entry.database}.${entry.table} already stored")
    commit(cur :+ entry)
  }

  override def delete(database: String, table: String): Unit = synchronized {
    val cur = allEntries()
    require(cur.exists(e => e.database == database && e.table == table),
      s"no metadata for $database.$table")
    commit(cur.filterNot(e => e.database == database && e.table == table))
  }

  private def commit(entries: Seq[TableMetadataEntry]): Unit = {
    Fio.mkdirs(dir)
    val vs = versions()
    Fio.writeAtomic(file(vs.lastOption.getOrElse(0L) + 1),
      MetadataStore.toJson(entries))
    // each version is a full self-contained registry — older ones are
    // garbage; keep one predecessor for post-mortems, prune the rest
    vs.dropRight(1).foreach(v => Fio.delete(file(v)))
  }
}

object MetadataStore {
  /** REST-created tables have no replayable upstream (reference
   *  `moonlink_connectors::REST_API_URI`): recovery for them is
   *  snapshot+WAL only, there is no source to re-stream from. */
  val RestUri = "rest://api"

  private val mapper = {
    val m = new ObjectMapper() with ClassTagExtensions
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }
  private def toJson(entries: Seq[TableMetadataEntry]): String =
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(entries)
  private def fromJson(s: String): Seq[TableMetadataEntry] =
    mapper.readValue(s, classOf[Array[TableMetadataEntry]]).toSeq

  /** One table's identity + config as the `config` JSON column of the
   *  reference's `tables` schema (the reference serializes its
   *  `MoonlinkTableConfig` the same way, `config_utils.rs`). */
  private[graft] final case class ConfigDoc(srcTableName: String,
      identityKind: String, keyCols: Seq[String], config: TableConfig)
  private[graft] def configToJson(e: TableMetadataEntry): String =
    mapper.writeValueAsString(
      ConfigDoc(e.srcTableName, e.identityKind, e.keyCols, e.config))
  private[graft] def configFromJson(database: String, table: String,
      srcTableName: String, srcUri: String, json: String): TableMetadataEntry = {
    val d = mapper.readValue(json, classOf[ConfigDoc])
    TableMetadataEntry(database, table, srcTableName, srcUri,
      d.identityKind, d.keyCols, d.config)
  }
}

/** Contract-complete in-memory backend: the recovery tests' fast seam,
 *  and the executable specification the durable backends must match. */
final class InMemoryMetadataBackend extends MetadataBackend {
  private var entries = Vector.empty[TableMetadataEntry]
  private var created = false
  override def metadataTableExists: Boolean = synchronized(created)
  override def allEntries(): Seq[TableMetadataEntry] = synchronized(entries)
  override def store(entry: TableMetadataEntry): Unit = synchronized {
    require(!entries.exists(e =>
        e.database == entry.database && e.table == entry.table),
      s"metadata for ${entry.database}.${entry.table} already stored")
    created = true
    entries :+= entry
  }
  override def delete(database: String, table: String): Unit = synchronized {
    require(entries.exists(e => e.database == database && e.table == table),
      s"no metadata for $database.$table")
    entries = entries.filterNot(e => e.database == database && e.table == table)
  }
}

/**
 * JDBC backend speaking the reference's registry schema verbatim —
 * `sqlite/sql/create_tables.sql`: `tables("database", "table",
 * src_table_name, src_table_uri, config)` with a composite primary key
 * and the table config serialized into the `config` JSON column
 * (`sqlite_metadata_store.rs:35-126`). Plain `java.sql` (in the JDK) so
 * it binds to whatever driver the classpath offers: `jdbc:sqlite:...`
 * or `jdbc:postgresql://...` become drop-ins the moment their jars
 * appear — none ship in this offline environment, so the SQL shapes are
 * spec-pinned and the contract suite runs on the other backends.
 */
final class JdbcMetadataBackend(url: String,
    props: java.util.Properties = new java.util.Properties)
    extends MetadataBackend {
  import JdbcMetadataBackend._

  private def withConn[T](f: java.sql.Connection => T): T = {
    val c = java.sql.DriverManager.getConnection(url, props)
    try f(c) finally c.close()
  }

  override def metadataTableExists: Boolean = withConn { c =>
    val rs = c.getMetaData.getTables(null, null, "tables", null)
    try rs.next() finally rs.close()
  }

  private def ensureTable(c: java.sql.Connection): Unit = {
    val st = c.createStatement()
    try st.executeUpdate(CreateTableSql) finally st.close()
  }

  override def allEntries(): Seq[TableMetadataEntry] = withConn { c =>
    if (!metadataTableExists) return Seq.empty
    val st = c.prepareStatement(SelectAllSql)
    try {
      val rs = st.executeQuery()
      val out = Seq.newBuilder[TableMetadataEntry]
      while (rs.next()) out += MetadataStore.configFromJson(
        rs.getString(1), rs.getString(2), rs.getString(3),
        rs.getString(4), rs.getString(5))
      out.result()
    } finally st.close()
  }

  override def store(entry: TableMetadataEntry): Unit = withConn { c =>
    ensureTable(c)
    // the PRIMARY KEY enforces the no-duplicate precondition atomically;
    // ONLY an integrity violation (SQLState class 23) maps to the
    // contract's IllegalArgumentException — connectivity/permission/DDL
    // failures must surface as themselves, or a caller would conclude
    // "already exists" and skip creation instead of retrying
    val st = c.prepareStatement(InsertSql)
    try {
      st.setString(1, entry.database)
      st.setString(2, entry.table)
      st.setString(3, entry.srcTableName)
      st.setString(4, entry.srcUri)
      st.setString(5, MetadataStore.configToJson(entry))
      st.executeUpdate()
    } catch {
      case e: java.sql.SQLException
          if JdbcMetadataBackend.isConstraintViolation(e) =>
        throw new IllegalArgumentException(
          s"metadata for ${entry.database}.${entry.table} already stored", e)
    } finally st.close()
  }

  override def delete(database: String, table: String): Unit = withConn { c =>
    val st = c.prepareStatement(DeleteSql)
    try {
      st.setString(1, database)
      st.setString(2, table)
      require(st.executeUpdate() == 1, s"no metadata for $database.$table")
    } finally st.close()
  }
}

object JdbcMetadataBackend {
  /** ONLY an integrity violation maps to the contract's
   *  IllegalArgumentException — connectivity/permission/DDL failures
   *  must surface as themselves, or a caller would conclude "already
   *  exists" and skip creation instead of retrying. Standard drivers
   *  signal via the exception subclass or SQLState class 23; xerial
   *  sqlite-jdbc historically reports null or non-standard SQLStates,
   *  so its vendor signal — the SQLite result code SQLITE_CONSTRAINT
   *  (19, also the low byte of extended codes like 1555
   *  SQLITE_CONSTRAINT_PRIMARYKEY) or a message naming it — is matched
   *  too, gated on the exception actually coming from that driver. */
  private[graft] def isConstraintViolation(e: java.sql.SQLException): Boolean = {
    val sqlite = e.getClass.getName.startsWith("org.sqlite.") ||
      Option(e.getMessage).exists(_.contains("SQLITE_"))
    e.isInstanceOf[java.sql.SQLIntegrityConstraintViolationException] ||
      Option(e.getSQLState).exists(_.startsWith("23")) ||
      (sqlite && ((e.getErrorCode & 0xff) == 19 ||
        Option(e.getMessage).exists(_.contains("SQLITE_CONSTRAINT"))))
  }

  /** `sqlite/sql/create_tables.sql` (quoted identifiers are portable
   *  across sqlite and postgres). */
  val CreateTableSql: String =
    """CREATE TABLE IF NOT EXISTS tables (
      |    "database" TEXT,
      |    "table" TEXT,
      |    src_table_name TEXT NOT NULL,
      |    src_table_uri TEXT,
      |    config TEXT,
      |    PRIMARY KEY ("database", "table")
      |)""".stripMargin
  /** `sqlite_metadata_store.rs:35-44` */
  val SelectAllSql: String =
    """SELECT t."database", t."table", t.src_table_name, t.src_table_uri,
      |       t.config FROM tables t""".stripMargin
  /** `sqlite_metadata_store.rs:96` */
  val InsertSql: String =
    """INSERT INTO tables ("database", "table", src_table_name,
      |                    src_table_uri, config)
      |VALUES (?, ?, ?, ?, ?)""".stripMargin
  /** `sqlite_metadata_store.rs:126` */
  val DeleteSql: String =
    """DELETE FROM tables WHERE "database" = ? AND "table" = ?"""
}

/**
 * Point-in-time table status — reference
 * `moonlink_backend/src/table_status.rs:5-18` field-for-field.
 * `cardinality` comes from the manifest's per-file row accounting
 * (rows minus DV-masked), O(manifest) with no data scan.
 */
final case class TableStatus(
    database: String,
    table: String,
    commitLsn: Long,
    flushLsn: Long,
    cardinality: Long,
    warehouseLocation: String,
    /** mirror health (None for tables with no replication stream):
     *  whether the catch-up stream is still running, and why it
     *  stopped when it died — the per-table ingestion state the
     *  reference exposes alongside the LSNs. */
    replicating: Option[Boolean] = None,
    replicationError: Option[String] = None)
