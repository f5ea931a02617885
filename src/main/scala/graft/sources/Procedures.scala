package graft.sources

import graft.model.Identity
import graft.table.{GraftTable, MetadataStore, TableConfig}
import org.apache.spark.sql.Row
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types._

/**
 * SQL maintenance procedures (the Iceberg `CALL catalog.system.x(...)`
 * surface) over the M13/M15 control verbs — the reference exposes the
 * same operations as REST control endpoints
 * (`rest_api.rs /tables/{t}/optimize|snapshot|flush`):
 *
 *   CALL cat.system.optimize(db => 'graft', tbl => 't')
 *   CALL cat.system.vacuum('graft', 't')
 *   CALL cat.system.expire_snapshots('graft', 't', 3)
 *   CALL cat.system.restore('graft', 't', 2)
 *   CALL cat.system.flush('graft', 't')
 *
 * Each returns a one-row result scan with the operation's metric, so
 * `CALL` output composes in SQL like any query. Procedures resolve in
 * the `system` namespace of the graft catalog.
 */
private[graft] object GraftProcedures {

  private val DbTbl = Seq(
    ProcedureParameter.in("db", StringType).build(),
    ProcedureParameter.in("tbl", StringType).build())

  def list(): Array[Identifier] =
    Array("optimize", "vacuum", "expire_snapshots", "restore", "flush",
        "check", "refresh_stats", "maintain", "iceberg_sync",
        "delta_sync", "delta_checkpoint")
      .map(n => Identifier.of(Array("system"), n))

  def load(store: MetadataStore, warehouse: String,
      name: String): UnboundProcedure = {
    def open(db: String, tbl: String): GraftTable = {
      val entry = store.allEntries()
        .find(e => e.database == db && e.table == tbl)
        .getOrElse(sys.error(s"no such table: $db.$tbl"))
      GraftTable.open(SparkSession.active,
        graft.table.GraftCatalog.rootOf(warehouse, db, tbl),
        entry.identity, entry.config)
    }
    name match {
      case "optimize" => proc("optimize",
        DbTbl ++ Seq(
          ProcedureParameter.in("cluster_by", StringType)
            .defaultValue("''").comment("comma-separated sort columns")
            .build(),
          ProcedureParameter.in("zorder", StringType)
            .defaultValue("'false'")
            .comment("'true' = z-order interleave over cluster_by")
            .build(),
          ProcedureParameter.in("bucket_by", IntegerType)
            .defaultValue("0")
            .comment("bucket count for the storage-partitioned-join " +
              "layout (pmod(xxhash64(keys), n)); 0 = off")
            .build()),
        StructType(Seq(StructField("files_before", LongType),
          StructField("files_after", LongType))),
        args => {
          val t = open(args(0).toString, args(1).toString)
          val cols = args(2).toString.split(",").map(_.trim)
            .filter(_.nonEmpty).toSeq
          val nBuckets = args(4) match {
            case null => 0
            case i: Int => i
            case other => other.toString.toInt
          }
          val before = t.currentManifest.dataFiles.size.toLong
          t.optimize(clusterBy = cols,
            zorder = args(3).toString.equalsIgnoreCase("true"),
            bucketBy = if (nBuckets > 0) Some(nBuckets) else scala.None)
          Seq(Row(before, t.currentManifest.dataFiles.size.toLong))
        })
      case "vacuum" => proc("vacuum", DbTbl,
        StructType(Seq(StructField("removed_files", LongType))),
        args => Seq(Row(
          open(args(0).toString, args(1).toString).vacuum().toLong)))
      case "refresh_stats" => proc("refresh_stats", DbTbl,
        // masked-row accounting refresh without a full optimize: after
        // deletes, one columnar pass re-arms COUNT(col)/SUM/AVG/MIN/MAX
        // aggregate pushdown (and tightens bounds to live rows)
        StructType(Seq(StructField("files_refreshed", LongType))),
        args => {
          val t = open(args(0).toString, args(1).toString)
          val n = t.refreshDvStats()
          if (n > 0) t.publish()
          Seq(Row(n.toLong))
        })
      case "maintain" => proc("maintain", DbTbl,
        // the maintenance daemon's THRESHOLD-GATED pass as a SQL verb
        // (GraftTable.maintain): flush a committed tail, compact past
        // the reference thresholds, refresh stale DV accounting, merge
        // index debt, vacuum only if anything ran. Unlike optimize it
        // NEVER rewrites an idle table — `ran = false` means zero new
        // versions and zero touched files, so operators can schedule
        // it blindly at any cadence
        StructType(Seq(StructField("ran", BooleanType))),
        args => Seq(Row(
          open(args(0).toString, args(1).toString).maintain())))
      case "expire_snapshots" => proc("expire_snapshots",
        DbTbl :+ ProcedureParameter.in("keep_last", IntegerType).build(),
        StructType(Seq(StructField("expired_versions", LongType))),
        args => {
          val (db, tbl) = (args(0).toString, args(1).toString)
          val keep = args(2).asInstanceOf[Int]
          // expireVersions itself mirrors the horizon into a synced
          // Iceberg export, so the SQL verb, the library verb, and the
          // maintenance daemon all keep retention parity
          Seq(Row(open(db, tbl).expireVersions(keep).toLong))
        })
      case "restore" => proc("restore",
        DbTbl :+ ProcedureParameter.in("version", LongType).build(),
        StructType(Seq(StructField("restored_as_version", LongType))),
        args => Seq(Row(open(args(0).toString, args(1).toString)
          .restoreToVersion(args(2).asInstanceOf[Long]))))
      case "flush" => proc("flush", DbTbl,
        StructType(Seq(StructField("flush_lsn", LongType))),
        args => {
          val t = open(args(0).toString, args(1).toString)
          t.flush(); t.publish()
          Seq(Row(t.flushLsn))
        })
      case "iceberg_sync" => proc("iceberg_sync", DbTbl,
        // the reference's force-snapshot verb for its Iceberg layer
        // (iceberg_table_syncer.rs sync_snapshot_impl): publish the
        // current committed manifest as a NEW spec-conformant Iceberg
        // v3 snapshot under $root/metadata/
        StructType(Seq(StructField("metadata_path", StringType),
          StructField("snapshot_id", LongType),
          StructField("sequence_number", LongType))),
        args => {
          val db = args(0).toString; val tbl = args(1).toString
          val t = open(db, tbl)
          val r = graft.format.iceberg.IcebergSync.sync(
            graft.table.GraftCatalog.rootOf(warehouse, db, tbl),
            t.currentManifest)
          Seq(Row(r.metadataPath, r.snapshotId, r.sequenceNumber))
        })
      case "delta_sync" => proc("delta_sync", DbTbl,
        // export the committed manifest as the next Delta log version;
        // DVs materialize via forced compaction first so the export
        // stays reader-v1 (every Delta implementation reads it)
        StructType(Seq(StructField("delta_version", LongType))),
        args => {
          val db = args(0).toString; val tbl = args(1).toString
          val t = open(db, tbl)
          if (t.currentManifest.dataFiles.exists(_.deletes > 0))
            t.optimize()
          Seq(Row(graft.format.delta.DeltaLog.sync(
            graft.table.GraftCatalog.rootOf(warehouse, db, tbl),
            t.currentManifest, spark = Some(t.spark))))
        })
      case "delta_checkpoint" => proc("delta_checkpoint", DbTbl,
        // bound log replay for the Delta export: write a spec
        // checkpoint parquet + _last_checkpoint at the current version,
        // then expire the JSON commits it supersedes (readers and the
        // next delta_sync replay checkpoint-first)
        StructType(Seq(StructField("checkpoint_version", LongType),
          StructField("expired_commits", LongType))),
        args => {
          val t = open(args(0).toString, args(1).toString)
          val root = graft.table.GraftCatalog.rootOf(
            warehouse, args(0).toString, args(1).toString)
          val v = graft.format.delta.DeltaLog.checkpoint(t.spark, root)
          val expired = graft.format.delta.DeltaLog.expireLog(root)
          Seq(Row(v, expired.toLong))
        })
      case "check" => proc("check", DbTbl,
        StructType(Seq(StructField("check", StringType),
          StructField("ok", BooleanType),
          StructField("detail", StringType))),
        args => {
          val t = open(args(0).toString, args(1).toString)
          t.integrityCheck().map { case (name, ok, detail) =>
            Row(name, ok, detail) }
        })
      case other => sys.error(s"no such procedure: system.$other")
    }
  }

  /** assemble an UnboundProcedure whose call() surfaces `run`'s rows
   *  through the same local-rows scan the metadata tables use */
  private def proc(pname: String, params: Seq[ProcedureParameter],
      outSchema: StructType,
      run: Seq[Any] => Seq[Row]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = pname
      override def description(): String = s"graft system.$pname"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = pname
          override def description(): String = s"graft system.$pname"
          override def parameters(): Array[ProcedureParameter] =
            params.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val args = params.zipWithIndex.map { case (p, i) =>
              p.dataType() match {
                case StringType => input.getUTF8String(i).toString
                case IntegerType => input.getInt(i)
                case LongType => input.getLong(i)
                case other => sys.error(s"unsupported param type $other")
              }
            }
            val out = run(args)
            val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
              .createToCatalystConverter(outSchema)
            val scan: Scan =
              new org.apache.spark.sql.connector.read.LocalScan {
                override def readSchema(): StructType = outSchema
                override def rows(): Array[InternalRow] =
                  out.map(r => conv(r).asInstanceOf[InternalRow]).toArray
              }
            java.util.List.of(scan).iterator()
          }
        }
    }
}
