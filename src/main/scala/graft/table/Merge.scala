package graft.table

import graft.model.Identity
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative MERGE INTO over a [[GraftTable]] — the user-facing verb
 * (Delta/Iceberg `MERGE`, reference semantics M2–M4: upsert =
 * delete-if-exists + append, `rest_ingest/moonlink_rest_sink.rs:222-247`)
 * expressed as one CDC batch:
 *
 *   - source rows whose key exists in the table ("matched") become
 *     upsert or delete events per `whenMatched`;
 *   - source rows with no match become inserts when
 *     `insertNotMatched` is set.
 *
 * The lowering is fully distributed: matched/unmatched routing is a
 * key-only left-semi/left-anti join against the table's committed
 * snapshot (never the payload), and the resulting event batch is plain
 * i/u/d ops, so it takes `CdcPipeline.applyBatch`'s no-driver path —
 * at 100 TB the merge costs two key joins plus the ordinary ingest
 * write, shuffling on the identity key throughout.
 *
 * Contract notes:
 *   - the table must have a keyed identity (`Identity.Keys`);
 *   - source keys must be unique (the standard MERGE multi-match
 *     precondition; pre-collapse with `Dedup.latestPerKey`) — enforced
 *     with a cheap existence probe;
 *   - `matchedCondition` filters which MATCHED source rows act (over
 *     source columns; unmatched inserts are unaffected);
 *   - if the table holds duplicate rows under one key (possible via
 *     raw appends), an upsert/delete event targets ALL of them —
 *     "update all matched target rows", the MERGE semantics.
 */
object Merge {

  sealed trait MatchedAction
  /** Matched source rows replace the table's rows (upsert). */
  case object UpdateMatched extends MatchedAction
  /** Matched source rows delete the table's rows. */
  case object DeleteMatched extends MatchedAction
  /** Matched source rows do nothing (insert-if-absent merge). */
  case object IgnoreMatched extends MatchedAction

  /** Run the merge as one committed CDC batch; returns the new commit
   *  LSN (unchanged if the merge produced no events). */
  def into(table: GraftTable, source: DataFrame,
      whenMatched: MatchedAction = UpdateMatched,
      matchedCondition: Option[Column] = scala.None,
      insertNotMatched: Boolean = true): Long = {
    val keys = table.identity match {
      case Identity.Keys(cols) => cols
      case other => throw new IllegalArgumentException(
        s"MERGE requires a keyed table identity, got $other")
    }
    val dataCols = table.schema.fieldNames.toSeq
    val src = source.select(dataCols.map(col): _*)
    if (!src.groupBy(keys.map(col): _*).count()
        .where(col("count") > 1).isEmpty)
      throw new IllegalArgumentException(
        "MERGE source has duplicate identity keys; collapse it first " +
          "(e.g. Dedup.latestPerKey)")
    val targetKeys = table.read(scala.None)
      .select(keys.map(col): _*).distinct()
    val matched0 = src.join(targetKeys, keys, "left_semi")
    val matched = matchedCondition.map(matched0.where).getOrElse(matched0)
    val parts: Seq[DataFrame] = Seq(
      whenMatched match {
        case UpdateMatched => Some(matched.select(
          lit("u").as("_op") +: dataCols.map(col): _*))
        case DeleteMatched => Some(matched.select(
          lit("d").as("_op") +: dataCols.map(col): _*))
        case IgnoreMatched => scala.None
      },
      if (insertNotMatched)
        Some(src.join(targetKeys, keys, "left_anti").select(
          lit("i").as("_op") +: dataCols.map(col): _*))
      else scala.None
    ).flatten
    if (parts.isEmpty) return table.commitLsn
    // each source row contributes exactly one event, so LSN order
    // within the batch is immaterial — ids only need to be unique and
    // above the current commit
    val events = parts.reduce(_ unionByName _)
      .withColumn("_lsn", monotonically_increasing_id() + table.commitLsn + 1L)
    graft.streaming.CdcPipeline.applyBatch(table, events)
  }
}
