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
 *  - **maintenance tick** (the force-snapshot cadence): full
 *    `optimize()` — flush + forced compaction + index merge + publish —
 *    then `vacuum()`, bounding small-file and DV/index debt on tables
 *    whose ingest batches are too small to trip the inline thresholds.
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
    maintenanceEveryMs: Long = 300000) {  // force_snapshot_timer

  @volatile private var exec: ScheduledExecutorService = null

  /** One snapshot pass over the catalog; returns tables flushed. */
  def snapshotTick(): Seq[String] =
    catalog.list.filter { name =>
      val t = catalog.table(name)
      t.synchronized {
        if (t.hasUnflushedCommitted) { t.flush(); t.publish(); true }
        else false
      }
    }

  /** One full-maintenance pass (optimize + vacuum every table). */
  def maintenanceTick(): Unit =
    catalog.list.foreach { name =>
      val t = catalog.table(name)
      t.optimize(); t.vacuum()
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
