package graft.table

import graft.sources.{PgSyncClient, PgWire}

/**
 * The reference persists its registry in Postgres
 * (`moonlink_metadata_store/src/postgres_metadata_store.rs`, schema
 * `postgres/sql/create_tables.sql`) — this backend speaks that same
 * `tables` schema over the engine's OWN v3 simple-query wire client
 * ([[graft.sources.PgSyncClient]]), so no JDBC driver jar is needed:
 * a live endpoint is the only missing piece. The [[JdbcMetadataBackend]]
 * twin stays for environments that prefer a vendor driver; both reuse
 * the exact SQL shapes it pins.
 *
 * One connection per operation, like the JDBC twin's withConn — the
 * registry is a boot/DDL-cadence surface, never a hot path.
 */
final class PgWireMetadataBackend(host: String, port: Int,
    user: String = "postgres", database: String = "postgres",
    password: Option[String] = None)
    extends MetadataBackend {

  private def lit(s: String): String =
    if (s == null) "NULL" else "'" + s.replace("'", "''") + "'"

  private def withClient[T](f: PgSyncClient => T): T = {
    // plain SQL connection: the registry user needs no REPLICATION role
    val c = new PgSyncClient(host, port, user, database,
      replication = false, password = password)
    c.connect()
    try f(c) finally c.close()
  }

  private def exists(c: PgSyncClient): Boolean =
    c.simpleQuery("select 1 from pg_tables where schemaname = 'public'" +
      " and tablename = 'tables';")._2.nonEmpty

  override def metadataTableExists: Boolean = withClient(exists)

  override def allEntries(): Seq[TableMetadataEntry] = withClient { c =>
    if (!exists(c)) Seq.empty
    else c.simpleQuery(JdbcMetadataBackend.SelectAllSql + ";")._2.map { r =>
      MetadataStore.configFromJson(r(0).get, r(1).get, r(2).get,
        r(3).orNull, r(4).get)
    }
  }

  override def store(entry: TableMetadataEntry): Unit = withClient { c =>
    c.simpleQuery(JdbcMetadataBackend.CreateTableSql + ";")
    val insert =
      """INSERT INTO tables ("database", "table", src_table_name,""" +
        " src_table_uri, config) VALUES (" +
        Seq(entry.database, entry.table, entry.srcTableName, entry.srcUri,
          MetadataStore.configToJson(entry)).map(lit).mkString(", ") + ");"
    try c.simpleQuery(insert)
    catch {
      // the PRIMARY KEY enforces the no-duplicate precondition; ONLY an
      // integrity violation (SQLSTATE class 23) maps to the contract's
      // IllegalArgumentException — same rule as the JDBC twin
      case e: PgWire.ServerError if e.sqlState.startsWith("23") =>
        throw new IllegalArgumentException(
          s"metadata for ${entry.database}.${entry.table} already stored", e)
    }
  }

  override def delete(database: String, table: String): Unit = withClient { c =>
    val (_, _, tags) = c.simpleQueryT(
      s"""DELETE FROM tables WHERE "database" = ${lit(database)}""" +
        s""" AND "table" = ${lit(table)};""")
    require(tags.contains("DELETE 1"), s"no metadata for $database.$table")
  }
}
