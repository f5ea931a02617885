package graft.table

import graft.format.Fio
import graft.model.Identity
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/**
 * Catalog of Graft tables — the Spark counterpart of the reference
 * backend's table registry + DataFusion catalog/schema providers
 * (`moonlink_backend/src/lib.rs:145-450`,
 * `moonlink_datafusion/src/catalog_provider.rs`). Registers each
 * table's union read as a Spark temp view so plain `spark.sql` queries
 * run over live ingested state.
 *
 * Table definitions are durable: every create/drop is recorded in the
 * warehouse's [[MetadataStore]] (the reference persists the same
 * registry in its `moonlink_metadata_store` crate), and
 * [[GraftCatalog.recover]] re-materializes the full catalog after a
 * process restart — each listed table reopens from its manifest log +
 * WAL, exactly the reference backend's startup recovery
 * (`moonlink_backend/src/recovery_utils.rs:120-170`: load all metadata
 * entries, recover each table from its latest persisted snapshot).
 */
final class GraftCatalog private (val spark: SparkSession,
    val warehouse: String, val database: String,
    /** registry backend — the reference's service wires its metadata
     *  store at boot (`moonlink_service/src/main.rs` →
     *  `base_metadata_store.rs:14-68`); the versioned-JSON filesystem
     *  store is the default, a Postgres registry
     *  ([[PgWireMetadataBackend]]) is a `--metadata-uri` flag away. */
    val metadataStore: MetadataBackend) {
  private val tables = mutable.LinkedHashMap[String, GraftTable]()

  /** Live replication streams feeding mirrored tables, keyed by table
   *  name (the reference tracks one connector per mirrored table,
   *  `moonlink_backend/src/lib.rs`). [[graft.sources.PgInitialSync]]
   *  registers on create/resume; the service drains on shutdown and
   *  the status surfaces report (replicating, last error). */
  val streams =
    new scala.collection.concurrent.TrieMap[String, ReplicationHandle]()

  def createTable(name: String, schema: StructType, identity: Identity,
      config: TableConfig = TableConfig(),
      srcTableName: String = "", srcUri: String = MetadataStore.RestUri): GraftTable =
    synchronized {
      require(!tables.contains(name), s"table $name exists")
      // registry entry first, then the table directory: a crash between
      // the two leaves a registered-but-empty table, which recovery
      // reports (and a retried create completes) — the reverse order
      // would strand an orphan directory no recovery would ever find
      metadataStore.store(TableMetadataEntry(database, name,
        if (srcTableName.isEmpty) name else srcTableName, srcUri, identity, config))
      val t = GraftTable.create(spark,
        GraftCatalog.rootOf(warehouse, database, name), schema, identity,
        config)
      tables(name) = t
      t
    }

  def openTable(name: String, identity: Identity,
      config: TableConfig = TableConfig()): GraftTable = synchronized {
    val t = GraftTable.open(spark,
      GraftCatalog.rootOf(warehouse, database, name), identity, config)
    tables(name) = t
    t
  }

  def table(name: String): GraftTable = synchronized(tables(name))
  def list: Seq[String] = synchronized(tables.keys.toSeq)

  /** Expose the table's current committed state to Spark SQL. Call again
   *  after ingesting to refresh the view (each read is a new snapshot). */
  def registerView(name: String, atLeastLsn: Option[Long] = None): DataFrame =
    synchronized {
      val df = tables(name).read(atLeastLsn)
      df.createOrReplaceTempView(name)
      df
    }

  def dropTable(name: String): Unit = synchronized {
    // a live replication stream must not keep feeding a dropped table
    streams.remove(name).foreach(s =>
      try s.stop() catch { case _: Throwable => () })
    tables.remove(name).foreach(_.drop())
    // openTable can attach a table that predates the registry; only a
    // registered entry is deleted (the store requires existence)
    if (metadataStore.allEntries().exists(e =>
        e.database == database && e.table == name))
      metadataStore.delete(database, name)
    spark.catalog.dropTempView(name)
  }

  /** Current status of one open table — reference
   *  `table_status.rs:5-18` (commit LSN, flush LSN, cardinality,
   *  warehouse location). Cardinality is the FLUSHED snapshot's live
   *  row count from manifest stats — O(manifest), no scan. */
  def tableStatus(name: String): TableStatus = synchronized {
    val t = tables(name)
    val s = streams.get(name)
    TableStatus(database, name, t.commitLsn, t.flushLsn, t.liveRowCount,
      warehouse, replicating = s.map(_.alive),
      replicationError = s.flatMap(_.lastError).map(_.toString))
  }

  /** All open tables' status as a queryable DataFrame (the backend's
   *  `list_table_status` surface). */
  def statusAll: DataFrame = synchronized {
    val rows = tables.keys.toSeq.map { n =>
      val st = tableStatus(n)
      Row(st.database, st.table, st.commitLsn, st.flushLsn,
        st.cardinality, st.warehouseLocation,
        st.replicating.map(java.lang.Boolean.valueOf).orNull,
        st.replicationError.orNull)
    }
    spark.createDataFrame(rows.asJava, GraftCatalog.statusSchema)
  }
}

/** A live source-replication stream feeding one mirrored table — the
 *  handle the catalog tracks so drop/shutdown can close it and the
 *  status surfaces can report a dead mirror instead of a silently
 *  stale table (the reference's per-table ingestion state,
 *  `table_status.rs`). */
trait ReplicationHandle {
  /** the catch-up thread is still running */
  def alive: Boolean
  /** why it stopped, when it stopped on an error */
  def lastError: Option[Throwable]
  /** close the stream and let the thread exit cleanly */
  def stop(): Unit
}

object GraftCatalog {
  val statusSchema: StructType = StructType(Seq(
    StructField("database", StringType), StructField("table", StringType),
    StructField("commit_lsn", LongType), StructField("flush_lsn", LongType),
    StructField("cardinality", LongType),
    StructField("warehouse_location", StringType),
    // mirror health (null for tables with no replication stream): a
    // dead mirror must be VISIBLE on the status surface, not a
    // silently stale table
    StructField("replicating", BooleanType),
    StructField("repl_error", StringType)))

  def apply(spark: SparkSession, warehouse: String,
      database: String = "graft",
      backend: MetadataBackend = null): GraftCatalog = {
    Fio.mkdirs(warehouse)
    new GraftCatalog(spark, warehouse, database,
      if (backend != null) backend else new MetadataStore(warehouse))
  }

  /** Physical table root: the default database keeps the historical
   *  flat `$warehouse/$tbl` layout; every other database nests under
   *  its own directory so `db1.t` and `db2.t` never share a root. */
  def rootOf(warehouse: String, database: String, table: String): String =
    if (database == "graft") s"$warehouse/$table"
    else s"$warehouse/$database/$table"

  /** Startup recovery: read the warehouse's metadata store and reopen
   *  every registered table from durable state (manifest log + WAL),
   *  re-registering its SQL view — the reference backend's
   *  `recover_all_tables` (`recovery_utils.rs:120-170`). A registered
   *  table whose directory never materialized (crash between registry
   *  commit and create) is surfaced via `missing` rather than failing
   *  the whole recovery. */
  def recover(spark: SparkSession, warehouse: String,
      database: String = "graft", backend: MetadataBackend = null)
      : (GraftCatalog, Seq[TableMetadataEntry]) = {
    val cat = apply(spark, warehouse, database, backend)
    val missing = mutable.ArrayBuffer[TableMetadataEntry]()
    cat.metadataStore.allEntries().filter(_.database == database).foreach { e =>
      if (Fio.exists(
          s"${GraftCatalog.rootOf(warehouse, database, e.table)}/manifest")) {
        cat.openTable(e.table, e.identity, e.config)
        cat.registerView(e.table)
      } else missing += e
    }
    (cat, missing.toSeq)
  }
}
