package graft.streaming

import graft.table.GraftTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/**
 * S2: initial table copy — every CDC deployment starts from a snapshot
 * of an existing table, then catches up from the boundary LSN.
 *
 * Mirrors the reference's three-phase protocol
 * (`pg_replicate/initial_copy.rs:57-219` `copy_table_stream`;
 * start/finish events `table_notify.rs:167-172`; event buffering and
 * below-boundary drop `table_handler.rs:352-380`):
 *
 *   1. `StartInitialCopy` — construct this session; CDC micro-batches
 *      that arrive while the copy runs go to `onEvents` and are
 *      buffered (the reference blocks them in the handler state).
 *   2. the copy itself — `finish(snapshot)` adopts the snapshot frame
 *      as the table's base state at the boundary LSN. Spark's
 *      partitioned scan of the source IS the reference's CTID-sharded
 *      parallel COPY (`postgres_source.rs:339` `plan_ctid_shards`).
 *   3. `FinishInitialCopy{start_lsn}` — buffered batches replay, with
 *      events at-or-below the boundary dropped: the snapshot already
 *      contains their effects (`initial_persistence_lsn`,
 *      `table_handler.rs:377-379`).
 */
final class InitialCopy(table: GraftTable, boundaryLsn: Long) {
  private val buffered = mutable.ArrayBuffer[DataFrame]()
  private var finished = false

  /** Buffer a CDC micro-batch that arrived while the copy runs. */
  def onEvents(batch: DataFrame): Unit = synchronized {
    require(!finished, "initial copy already finished")
    buffered += batch
  }

  /** Adopt the snapshot, then replay buffered events above the
   *  boundary. Returns the table's commit LSN. */
  def finish(snapshot: DataFrame): Long = synchronized {
    require(!finished, "initial copy already finished")
    table.initialCopy(snapshot, boundaryLsn)
    buffered.foreach(b =>
      CdcPipeline.applyBatch(table, b.where(col("_lsn") > boundaryLsn)))
    buffered.clear()
    finished = true
    table.commitLsn
  }
}
