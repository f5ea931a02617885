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

final class MetadataStore(val warehouse: String) {
  private val dir = s"$warehouse/_metadata"

  private def versions(): Seq[Long] =
    Fio.list(dir)
      .filter(n => n.startsWith("tables-v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("tables-v").stripSuffix(".json").toLong)
      .sorted

  private def file(v: Long): String = f"$dir/tables-v$v%09d.json"

  /** reference `metadata_table_exists` */
  def metadataTableExists: Boolean = versions().nonEmpty

  /** reference `get_all_table_metadata_entries` */
  def allEntries(): Seq[TableMetadataEntry] = synchronized {
    versions().lastOption match {
      case Some(v) => MetadataStore.fromJson(Fio.readString(file(v)))
      case None    => Seq.empty
    }
  }

  /** reference `store_table_metadata` — creates the store on first
   *  use; refuses a duplicate (database, table) id. */
  def store(entry: TableMetadataEntry): Unit = synchronized {
    val cur = allEntries()
    require(!cur.exists(e => e.database == entry.database && e.table == entry.table),
      s"metadata for ${entry.database}.${entry.table} already stored")
    commit(cur :+ entry)
  }

  /** reference `delete_table_metadata` — the entry must exist. */
  def delete(database: String, table: String): Unit = synchronized {
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
    warehouseLocation: String)
