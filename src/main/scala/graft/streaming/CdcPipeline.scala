package graft.streaming

import graft.model._
import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Structured-Streaming wiring for CDC ingestion: a stream of flat CDC
 * event rows drives `GraftTable.apply` through `foreachBatch` — the
 * Spark shape of the reference's per-table event loop
 * (`table_handler.rs:124,202`; CDC event enum
 * `pg_replicate/conversions/cdc_event.rs:194-207`).
 *
 * Expected event-frame columns:
 *   `_op`   string  — i|insert, u|upsert, d|delete, c|commit, ab|abort
 *   `_lsn`  long    — monotone log sequence number
 *   `_xact` long    — nullable streaming-transaction id
 *   ...then the table's data columns (null for delete key cols unused).
 *
 * Each micro-batch is sorted by `_lsn` (the reference asserts strict LSN
 * monotonicity, `moonlink_sink.rs:204-215`) and applied transactionally;
 * the micro-batch boundary acts as an implicit commit only if the
 * stream carries explicit commit events — otherwise one is appended at
 * the batch's max LSN, mirroring PG txn boundaries.
 */
object CdcPipeline {

  /** Convert one micro-batch of event rows into CdcEvents, in LSN order. */
  def toEvents(table: GraftTable, batch: DataFrame): Seq[CdcEvent] = {
    val schema = table.schema
    val keyCols = Identity.keyColumns(table.identity, schema.fieldNames.toSeq)
    val rows = batch.orderBy("_lsn").collect().toSeq
    var sawCommit = false
    var maxLsn = -1L
    val events = rows.flatMap { r =>
      val op = r.getAs[String]("_op")
      val lsn = r.getAs[Long]("_lsn")
      maxLsn = math.max(maxLsn, lsn)
      val xact = if (r.isNullAt(r.fieldIndex("_xact"))) None
                 else Some(r.getAs[Long]("_xact"))
      def dataRow: Row =
        Row.fromSeq(schema.fieldNames.toSeq.map(c => r.get(r.fieldIndex(c))))
      def key: Seq[Any] = keyCols.map(c => r.get(r.fieldIndex(c)))
      op match {
        case "i" | "insert" => Seq(Append(dataRow, lsn, xact))
        case "u" | "upsert" => CdcEvent.upsert(dataRow, key, lsn, xact)
        case "d" | "delete" => Seq(Delete(key, lsn, xact))
        case "c" | "commit" => sawCommit = true; Seq(Commit(lsn, xact))
        case "ab" | "abort" =>
          Seq(StreamAbort(xact.getOrElse(
            throw new IllegalArgumentException("abort without _xact"))))
        case other => throw new IllegalArgumentException(s"unknown op $other")
      }
    }
    if (!sawCommit && maxLsn >= 0) events :+ Commit(maxLsn) else events
  }

  /** Apply one micro-batch (usable directly for batch-mode ingest too).
   *
   *  Scale path: a batch of plain insert/upsert/delete events (no
   *  streaming transactions, commits only at the batch end) never
   *  touches the driver — `GraftTable.applyBatchDF` folds, flushes and
   *  indexes it with Spark jobs. Batches carrying streaming-transaction
   *  events or mid-batch commits take the exact driver event path
   *  (those events are control-heavy and small; the reference routes
   *  them through the same single event loop, `table_handler.rs:124`). */
  def applyBatch(table: GraftTable, batch: DataFrame): Long = {
    import org.apache.spark.sql.functions._
    val b =
      if (batch.columns.contains("_xact")) batch
      else batch.withColumn("_xact", lit(null).cast("long"))
    val s = b.agg(
      max(col("_lsn")),
      sum(when(col("_xact").isNotNull, 1L).otherwise(0L)),
      sum(when(col("_op").isin("d", "delete", "u", "upsert"), 1L).otherwise(0L)),
      sum(when(!col("_op").isin("i", "insert", "u", "upsert", "d", "delete",
        "c", "commit"), 1L).otherwise(0L)),
      max(when(col("_op").isin("c", "commit"), col("_lsn"))),
      count(lit(1))).head()
    if (s.isNullAt(0)) return table.commitLsn // empty batch
    val maxLsn = s.getLong(0)
    val hasXact = s.getLong(1) > 0
    val hasDeletes = s.getLong(2) > 0
    val hasOtherOps = s.getLong(3) > 0
    val midBatchCommit = !s.isNullAt(4) && s.getLong(4) != maxLsn
    if (!hasXact && !hasOtherOps && !midBatchCommit)
      // the event count rides the same aggregate — applyBatchDF sizes
      // its output files from it without a second pass over the batch
      table.applyBatchDF(b, maxLsn, hasDeletes, estRows = s.getLong(5))
    else
      table.apply(toEvents(table, b))
  }

  /** Start the streaming ingestion query. */
  def start(table: GraftTable, events: DataFrame, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(table, batch); ()
      }
      .start()
}
