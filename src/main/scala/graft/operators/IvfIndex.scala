package graft.operators

import graft.table.GraftTable
import org.apache.spark.sql.functions._

/**
 * Maintenance of a PERSISTED IVF assignment table (id, cell) against
 * its corpus table under delete churn.
 *
 * Probe-time SAFETY never depends on this: the index probe re-ranks
 * its candidates against the LIVE (DV-masked) corpus read, so a stale
 * index entry can only waste probe IO, never surface a deleted vector
 * (the `ann_ivf_deleted` gate). What a heavily-deleted corpus DOES
 * cost is candidates that re-rank to nothing — at 100-TB scale a >50%
 * deleted cell doubles every probe's candidate fetch for no recall.
 * This refresh repays that debt on the same cadence the engine already
 * uses for file-local delete debt: the reference's compaction
 * delete-ratio threshold (`compaction_config.rs:48-55`).
 *
 * Mechanics are pure CDC, never a rebuild: the corpus's crossed files
 * yield their MASKED rows' ids ([[GraftTable.maskedRows]] — O(deleted
 * rows), distributed, no corpus scan), those ids become delete events
 * on the (id-keyed) assignment table, and the assignment table's own
 * threshold-gated compaction then retires the DV'd entries physically.
 * Ids deleted in files BELOW the ratio stay in the index on purpose —
 * same as small-file delete debt, they wait for their threshold.
 */
object IvfIndex {

  /** True when any corpus file's masked-row debt crossed the
   *  compaction delete-ratio — the refresh trigger. Pure manifest
   *  arithmetic: O(files) longs on the driver, no Spark job, no IO —
   *  the per-(index, corpus) gate a catalog-scale maintenance tick
   *  pays when nothing is due (cost pinned at 100k files in
   *  IvfIndexSpec; a tick over thousands of registered pairs is
   *  milliseconds of driver arithmetic unless a refresh actually
   *  fires). */
  def refreshDue(corpus: GraftTable): Boolean =
    refreshDue(corpus.currentManifest, corpus.config.compactDeleteRatio)

  def refreshDue(m: graft.format.Manifest, deleteRatio: Double): Boolean =
    m.dataFiles.exists(e =>
      e.deletes > 0 && e.deletes.toDouble >= e.rows * deleteRatio)

  /**
   * Threshold-gated refresh: CDC-delete assignment entries whose
   * corpus ids died in files past the delete-ratio. Returns index
   * entries dropped (0 = below threshold or nothing left to drop).
   * `force` refreshes against EVERY delete-carrying corpus file
   * regardless of ratio (the user-invoked full-maintenance shape).
   *
   * MUST run before the corpus's own compaction repays the same files
   * (the rewrite retires their DVs and the masked ids are unreadable)
   * — [[graft.streaming.MaintenanceDaemon.maintenanceTick]] orders the
   * two exactly that way.
   */
  def refresh(index: GraftTable, corpus: GraftTable,
      indexIdCol: String = "id", corpusIdCol: String = "id",
      force: Boolean = false): Long = {
    if (!force && !refreshDue(corpus)) return 0L
    val ratio = if (force) 0.0 else corpus.config.compactDeleteRatio
    val dead = corpus.maskedRows(Seq(corpusIdCol), ratio)
      .withColumnRenamed(corpusIdCol, indexIdCol).distinct()
    // only ids the index still lists: a prior refresh already dropped
    // the rest, and a delete event must never name an absent key
    val present = index.read(scala.None).select(col(indexIdCol))
      .join(dead, Seq(indexIdCol), "left_semi")
    val lsn = index.commitLsn + 1L
    val ev = present.select(
      lit("d").as("_op") +: lit(lsn).as("_lsn") +:
        index.schema.fields.toSeq.map(f =>
          if (f.name == indexIdCol) col(indexIdCol)
          else lit(null).cast(f.dataType).as(f.name)): _*)
    val before = index.currentManifest.liveRows
    index.applyBatchDF(ev, lsn, hasDeletes = true)
    before - index.currentManifest.liveRows
  }
}
