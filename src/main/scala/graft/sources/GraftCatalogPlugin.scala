package graft.sources

import java.util

import graft.format.Fio
import graft.model.{Identity, SchemaDsl}
import graft.table.{GraftTable, MetadataStore, TableConfig, TableMetadataEntry}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/**
 * Spark V2 catalog over a graft warehouse — the Spark-native
 * counterpart of the reference's DataFusion catalog integration
 * (`moonlink_datafusion/src/catalog_provider.rs`,
 * `schema_provider.rs`: a CatalogProvider listing mooncake databases
 * and a SchemaProvider resolving each table to its TableProvider).
 *
 * Register under any name and query by three-part identifier with no
 * temp-view plumbing:
 *
 * {{{
 *   spark.conf.set("spark.sql.catalog.ml", classOf[GraftCatalogPlugin].getName)
 *   spark.conf.set("spark.sql.catalog.ml.warehouse", "/data/warehouse")
 *   spark.sql("SELECT * FROM ml.graft.events WHERE user_id = 7")
 * }}}
 *
 * Namespaces are the metadata store's `database` values; tables
 * resolve to the DSv2 [[GraftSparkTable]] (vectorized manifest scan,
 * DV skipping, runtime file pruning), so every catalog query gets the
 * same physical read path as `spark.read.format("graft")`. Like the
 * reference's DataFusion side, the catalog is a READ surface — DDL
 * `createTable` registers + creates an empty table (key columns via
 * the `keys` table property), but row ingest stays on the ingestion
 * API: this is an ingestion engine whose query side is deliberately
 * append-path-free.
 *
 * Scale note: `listTables`/`loadTable` read the registry (one small
 * JSON) and a manifest footer — O(tables) driver metadata; no data IO
 * until a scan actually runs.
 */
class GraftCatalogPlugin extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  /** `CALL cat.system.optimize|vacuum|expire_snapshots|restore|flush`
   *  — the M13/M15 control verbs on the SQL surface (the reference's
   *  REST control endpoints, `rest_api.rs /tables/{t}/...`). */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace().toSeq == Seq("system"),
      s"procedures live in the `system` namespace, got $ident")
    GraftProcedures.load(store, warehouse, ident.name())
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.toSeq == Seq("system")) GraftProcedures.list()
    else Array.empty

  /** `SELECT cat.system.jaccard_milli(...)` — the native kernels as
   *  V2 catalog functions (see GraftFunctions). */
  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction = {
    // Spark's storage-partitioned-join resolution loads `bucket` from
    // the EMPTY namespace of the table's catalog
    // (V2ExpressionUtils.loadV2FunctionOpt); user SQL reaches the same
    // kernels under `system`
    if (ident.namespace().isEmpty && ident.name() == "bucket")
      GraftFunctions.bucket()
    else if (ident.namespace().toSeq != Seq("system"))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident)
    else GraftFunctions.load(ident.name())
  }

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.toSeq == Seq("system")) GraftFunctions.list()
    else Array.empty

  private var catalogName: String = _
  private var warehouse: String = _
  private var store: MetadataStore = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.warehouse"))
    store = new MetadataStore(warehouse)
  }

  override def name(): String = catalogName

  private def dbOf(ns: Array[String]): String = {
    require(ns.length == 1,
      s"graft namespaces are single-level, got ${ns.mkString(".")}")
    ns.head
  }

  // ---- namespaces (reference CatalogProvider::schema_names) ----------

  override def listNamespaces(): Array[Array[String]] =
    store.allEntries().map(_.database).distinct.sorted
      .map(Array(_)).toArray

  override def listNamespaces(ns: Array[String]): Array[Array[String]] = {
    if (!namespaceExists(ns))
      throw new IllegalArgumentException(s"no namespace ${ns.mkString(".")}")
    Array.empty // single-level: no children
  }

  override def namespaceExists(ns: Array[String]): Boolean =
    ns.length == 1 && store.allEntries().exists(_.database == ns.head)

  override def loadNamespaceMetadata(
      ns: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(ns))
      throw new IllegalArgumentException(s"no namespace ${ns.mkString(".")}")
    Map("location" -> warehouse).asJava
  }

  override def createNamespace(ns: Array[String],
      metadata: util.Map[String, String]): Unit =
    dbOf(ns) // namespaces materialize with their first table

  override def alterNamespace(ns: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("alterNamespace")

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    val tables = store.allEntries().filter(_.database == dbOf(ns))
    require(tables.isEmpty || cascade,
      s"namespace ${ns.head} is not empty")
    tables.foreach(e => dropTable(Identifier.of(ns, e.table)))
    tables.nonEmpty
  }

  // ---- tables (reference SchemaProvider::table_names / table) --------

  override def listTables(ns: Array[String]): Array[Identifier] =
    store.allEntries().filter(_.database == dbOf(ns))
      .map(e => Identifier.of(ns, e.table)).toArray

  // default-db tables live at $warehouse/$tbl (the historical layout);
  // any other database is a subdirectory, so same-named tables in two
  // databases never collide on one physical root
  private def rootOf(ident: Identifier): String =
    graft.table.GraftCatalog.rootOf(warehouse, dbOf(ident.namespace),
      ident.name)

  override def tableExists(ident: Identifier): Boolean =
    store.allEntries().exists(e =>
      e.database == dbOf(ident.namespace) && e.table == ident.name)

  override def loadTable(ident: Identifier): Table = {
    // Delta-style metadata tables: `` t$history `` / `` t$files ``
    // resolve beside the base table and answer from manifest JSON only
    MetaTables.split(ident.name()) match {
      case Some((base, suffix)) =>
        val baseIdent = Identifier.of(ident.namespace(), base)
        if (!tableExists(baseIdent))
          throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
            (ident.namespace() :+ ident.name()).toSeq)
        return MetaTables.table(rootOf(baseIdent), suffix,
          s"$catalogName.${ident.namespace().mkString(".")}.${ident.name()}")
      case scala.None =>
    }
    if (!tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        (ident.namespace() :+ ident.name()).toSeq)
    new GraftSparkTable(rootOf(ident))
  }

  /** SQL time travel `VERSION AS OF v` — manifest versions ARE the
   *  snapshot ids (M8; the reference exposes the same axis through
   *  Iceberg snapshots). */
  override def loadTable(ident: Identifier, version: String): Table = {
    loadTable(ident) // existence check
    val v = version.toLong
    require(graft.format.ManifestLog.versions(rootOf(ident)).contains(v),
      s"table $ident has no version $v")
    new GraftSparkTable(rootOf(ident), Some(v))
  }

  /** SQL time travel `TIMESTAMP AS OF t` — Spark hands micros since
   *  epoch; resolve to the latest version committed at or before it
   *  (commit instant = the manifest file's atomic-rename mtime). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    loadTable(ident) // existence check
    val v = graft.format.ManifestLog
      .versionAsOfTime(rootOf(ident), timestampMicros / 1000L)
      .getOrElse(throw new IllegalArgumentException(
        s"table $ident has no version at or before $timestampMicros"))
    new GraftSparkTable(rootOf(ident), Some(v))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft tables cluster via compaction, not static partitions")
    require(!tableExists(ident), s"table $ident exists")
    val keys = Option(properties.get("keys"))
      .map(_.split(",").map(_.trim).toSeq.filter(_.nonEmpty))
      .getOrElse(Seq.empty)
    val identity =
      if (keys.isEmpty) Identity.None else Identity.Keys(keys)
    val spark = SparkSession.active
    store.store(TableMetadataEntry(dbOf(ident.namespace), ident.name,
      ident.name, MetadataStore.RestUri, identity, TableConfig()))
    GraftTable.create(spark, rootOf(ident), schema, identity, TableConfig())
    new GraftSparkTable(rootOf(ident))
  }

  /** SQL ALTER TABLE → the table's schema-evolution verbs (M14): ADD /
   *  DROP / RENAME COLUMN and ALTER COLUMN TYPE (widen) each publish a
   *  new manifest version; data files are never rewritten (drop hides
   *  via the column-mapping seam, add backfills nulls at read). The
   *  same alters arrive in-stream as DDL events on the CDC path. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        (ident.namespace() :+ ident.name()).toSeq)
    val entry = store.allEntries().find(e =>
      e.database == dbOf(ident.namespace) && e.table == ident.name).get
    val t = GraftTable.open(SparkSession.active, rootOf(ident),
      entry.identity, entry.config)
    def top(fieldNames: Array[String]): String = {
      require(fieldNames.length == 1,
        s"nested column alters unsupported: ${fieldNames.mkString(".")}")
      fieldNames(0)
    }
    changes.foreach {
      case c: TableChange.AddColumn =>
        t.alterAddColumn(top(c.fieldNames()), SchemaDsl.typeName(c.dataType()))
      case c: TableChange.DeleteColumn =>
        t.alterDropColumns(Seq(top(c.fieldNames())))
      case c: TableChange.RenameColumn =>
        t.alterRenameColumn(top(c.fieldNames()), c.newName())
      case c: TableChange.UpdateColumnType =>
        t.alterWidenColumn(top(c.fieldNames()),
          SchemaDsl.typeName(c.newDataType()))
      case other => throw new UnsupportedOperationException(
        s"unsupported ALTER: $other")
    }
    new GraftSparkTable(rootOf(ident))
  }

  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) false
    else {
      store.delete(dbOf(ident.namespace), ident.name)
      Fio.delete(rootOf(ident))
      true
    }
  }

  override def renameTable(from: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException("renameTable")
}
