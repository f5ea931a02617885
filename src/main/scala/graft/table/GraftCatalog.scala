package graft.table

import graft.format.Fio
import graft.model.Identity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import scala.collection.mutable

/**
 * In-process catalog of Graft tables — the Spark counterpart of the
 * reference backend's table registry + DataFusion catalog/schema
 * providers (`moonlink_backend/src/lib.rs:145-450`,
 * `moonlink_datafusion/src/catalog_provider.rs`). Registers each
 * table's union read as a Spark temp view so plain `spark.sql` queries
 * run over live ingested state.
 */
final class GraftCatalog(val spark: SparkSession, val warehouse: String) {
  private val tables = mutable.LinkedHashMap[String, GraftTable]()

  def createTable(name: String, schema: StructType, identity: Identity,
      config: TableConfig = TableConfig()): GraftTable = synchronized {
    require(!tables.contains(name), s"table $name exists")
    val t = GraftTable.create(spark, s"$warehouse/$name", schema, identity, config)
    tables(name) = t
    t
  }

  def openTable(name: String, identity: Identity,
      config: TableConfig = TableConfig()): GraftTable = synchronized {
    val t = GraftTable.open(spark, s"$warehouse/$name", identity, config)
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
    tables.remove(name).foreach(_.drop())
    spark.catalog.dropTempView(name)
  }
}

object GraftCatalog {
  def apply(spark: SparkSession, warehouse: String): GraftCatalog = {
    Fio.mkdirs(warehouse)
    new GraftCatalog(spark, warehouse)
  }
}
