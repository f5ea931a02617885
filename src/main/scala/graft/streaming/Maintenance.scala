package graft.streaming

import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}

import graft.table.{GraftCatalog, GraftTable}

/**
 * Periodic background maintenance over a catalog's tables — the
 * reference's `TableHandlerTimer` (`table_handler_timer.rs:7-24`: a
 * 500 ms mooncake-snapshot tick, a 300 s force-snapshot tick and a
 * 500 ms WAL tick driving the per-table event loop), re-expressed as a
 * scheduled driver-side daemon over [[GraftCatalog]].
 *
 * The division of labor differs from the reference on purpose: this
 * engine's apply paths publish a manifest at every batch commit and
 * append/truncate the WAL inline, so the tick's job is narrower —
 *
 *  - **snapshot tick**: committed rows that still live only in the
 *    mem-slice tail + WAL (driver-path ingest below the flush
 *    threshold) are flushed to parquet and manifest-committed, making
 *    them durable WITHOUT the WAL and visible to external readers of
 *    the manifest (DSv2 / RPC scans see only published files). A table
 *    whose flush LSN already equals its commit LSN is skipped — ticks
 *    on an idle table publish nothing (no version spam).
 *  - **maintenance tick** (the force-snapshot cadence): THRESHOLD-GATED
 *    maintenance ([[GraftTable.maintain]]) — flush a committed tail,
 *    compact past the reference's compaction thresholds
 *    (`compaction_config.rs:48-55`), fold stale DV accounting, merge
 *    index debt, vacuum only when something ran. An idle,
 *    already-compacted table is untouched: no file rewrites, no
 *    manifest versions, no Iceberg-snapshot churn. (The reference's
 *    periodic timer forces snapshots, never compaction — an
 *    unconditional `optimize()` here would rewrite up to
 *    compactMaxFilesPerOp × 128 MiB per table per tick forever.)
 *
 * Both ticks take each table's own monitor, so they serialize against
 * concurrent ingest exactly like any other control op (the reference's
 * timer events queue into the same single event loop).
 *
 * Scale note: ticks are O(tables) driver scheduling; the work each one
 * triggers (flush writes, compaction rewrites) runs as Spark jobs.
 */
final class MaintenanceDaemon(
    catalog: GraftCatalog,
    snapshotEveryMs: Long = 500,          // mooncake_snapshot_timer
    maintenanceEveryMs: Long = 300000,    // force_snapshot_timer
    // Iceberg persistence cadence (reference M9: periodic
    // RegularIcebergSnapshot, table_handler.rs:437); 0 = disabled
    icebergEveryMs: Long = 0) {

  @volatile private var exec: ScheduledExecutorService = null
  // last-synced (file set, delete count) per table: an iceberg tick
  // publishes a snapshot only when either changed — the reference's
  // "≥1 new data file / new unpersisted deletes" persist thresholds,
  // expressed as set equality so idle ticks never spam snapshots
  private val lastIcebergSig =
    scala.collection.mutable.Map[String, (Set[String], Long)]()

  /** One snapshot pass over the catalog; returns tables flushed. */
  def snapshotTick(): Seq[String] =
    catalog.list.filter { name =>
      val t = catalog.table(name)
      t.synchronized {
        if (t.hasUnflushedCommitted) { t.flush(); t.publish(); true }
        else false
      }
    }

  // registered external ANN indexes: index table -> (corpus table,
  // index id col, corpus id col). Opt-in by design: an UN-registered
  // index is deliberately stale (probe-time re-ranking keeps it safe —
  // the ann_ivf_deleted contract) and is never touched.
  private val annLinks =
    scala.collection.mutable.LinkedHashMap[String, (String, String, String)]()

  /** Register a persisted IVF assignment table for threshold-gated
   *  refresh against its corpus on the maintenance tick
   *  ([[graft.operators.IvfIndex.refresh]]). */
  def registerAnnIndex(indexName: String, corpusName: String,
      indexIdCol: String = "id", corpusIdCol: String = "id"): this.type = {
    annLinks.synchronized {
      annLinks(indexName) = (corpusName, indexIdCol, corpusIdCol) }
    this
  }

  /** One threshold-gated maintenance pass; returns the tables that did
   *  any work. Idle tables publish nothing and rewrite nothing. */
  def maintenanceTick(): Seq[String] = {
    // external-index refreshes run FIRST: the per-table maintain below
    // may compact exactly the crossed corpus files, and the rewrite
    // retires the DVs whose masked ids the refresh needs
    val refreshed = annLinks.synchronized(annLinks.toSeq).filter {
      case (idx, (corp, iid, cid)) =>
        try graft.operators.IvfIndex.refresh(
          catalog.table(idx), catalog.table(corp), iid, cid) > 0L
        catch {
          // NonFatal only (ADVICE r17): an OOM/Interrupted must
          // propagate, not be swallowed into "refresh skipped"
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[graft-maintenance] ann refresh $idx: $e")
            false
        }
    }.map(_._1)
    val maintained = catalog.list.filter(name => catalog.table(name).maintain())
    (refreshed ++ maintained).distinct
  }

  /** One Iceberg-persistence pass: tables whose committed file set or
   *  delete count moved since the last sync publish a new spec
   *  snapshot (metadata.json + avro manifests + puffin DVs); idle
   *  tables publish nothing. Returns tables synced. */
  def icebergTick(): Seq[String] =
    catalog.list.filter { name =>
      val t = catalog.table(name)
      t.synchronized {
        val m = t.currentManifest
        val sig = (m.dataFiles.map(_.path).toSet,
          m.dataFiles.map(_.deletes).sum)
        val changed = !lastIcebergSig.get(name).contains(sig)
        if (changed && m.dataFiles.nonEmpty) {
          graft.format.iceberg.IcebergSync.sync(t.root, m)
          lastIcebergSig(name) = sig
          true
        } else false
      }
    }

  def start(): this.type = synchronized {
    require(exec == null, "daemon already started")
    exec = Executors.newSingleThreadScheduledExecutor { r =>
      val th = new Thread(r, s"graft-maintenance-${catalog.warehouse}")
      th.setDaemon(true); th
    }
    def safely(tick: () => Unit): Runnable = () =>
      try tick() catch {
        case e: Throwable => // a failed tick must not kill the schedule
          System.err.println(s"[graft-maintenance] tick failed: $e")
      }
    exec.scheduleWithFixedDelay(safely(() => snapshotTick()),
      snapshotEveryMs, snapshotEveryMs, TimeUnit.MILLISECONDS)
    exec.scheduleWithFixedDelay(safely(() => maintenanceTick()),
      maintenanceEveryMs, maintenanceEveryMs, TimeUnit.MILLISECONDS)
    if (icebergEveryMs > 0)
      exec.scheduleWithFixedDelay(safely(() => icebergTick()),
        icebergEveryMs, icebergEveryMs, TimeUnit.MILLISECONDS)
    this
  }

  def stop(): Unit = synchronized {
    if (exec != null) {
      exec.shutdownNow()
      exec.awaitTermination(10, TimeUnit.SECONDS)
      exec = null
    }
  }
}
