package graft.streaming

import graft.model._
import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import scala.jdk.CollectionConverters._

/**
 * Structured-Streaming wiring for CDC ingestion: a stream of flat CDC
 * event rows drives `GraftTable.apply` through `foreachBatch` — the
 * Spark shape of the reference's per-table event loop
 * (`table_handler.rs:124,202`; CDC event enum
 * `pg_replicate/conversions/cdc_event.rs:194-207`).
 *
 * Expected event-frame columns:
 *   `_op`   string  — i|insert, u|upsert, d|delete, c|commit, ab|abort,
 *                     alter_add|alter_drop (in-stream schema evolution)
 *   `_lsn`  long    — monotone log sequence number
 *   `_xact` long    — nullable streaming-transaction id
 *   `_ddl`  string  — only for alter ops: "name type; name type" for
 *                     alter_add (';'-separated so decimal(p,s) commas
 *                     survive), "name; name" for alter_drop
 *   ...then the table's data columns (null for delete key cols unused).
 *
 * Each micro-batch is sorted by `_lsn` (the reference asserts strict LSN
 * monotonicity, `moonlink_sink.rs:204-215`) and applied transactionally;
 * the micro-batch boundary acts as an implicit commit only if the
 * stream carries explicit commit events — otherwise one is appended at
 * the batch's max LSN, mirroring PG txn boundaries.
 *
 * Schema evolution mirrors the reference's mid-stream AlterTable (a PG
 * `Relation` message with a changed column set, `moonlink_sink.rs:
 * 347-361`): an alter event splits the stream — data rows after it are
 * decoded against the evolved schema, so one micro-batch can carry
 * ingest → alter → ingest without stopping the query.
 */
object CdcPipeline {

  /** Convert one micro-batch of event rows into CdcEvents, in LSN
   *  order, WITHOUT collecting the batch: `toLocalIterator` holds one
   *  shuffle partition on the driver at a time, so a giant
   *  transaction-bearing batch streams through bounded memory. The
   *  local `schema` evolves across alter events so later rows decode
   *  against the post-alter column set. */
  def eventIterator(table: GraftTable, batch: DataFrame): Iterator[CdcEvent] =
    eventsFromRows(table, batch.orderBy("_lsn").toLocalIterator().asScala)

  /** Materialized event list for SMALL batches: one collect job (a
   *  sorted `toLocalIterator` would schedule one job per shuffle
   *  partition — measured ~3s/batch of pure scheduling overhead at
   *  local[32], which dominates control-sized batches). */
  def toEvents(table: GraftTable, batch: DataFrame): Seq[CdcEvent] =
    eventsFromRows(table, batch.orderBy("_lsn").collect().iterator).toSeq

  private def eventsFromRows(table: GraftTable,
      rows: Iterator[Row]): Iterator[CdcEvent] = {
    var schema = table.schema
    val keyCols = Identity.keyColumns(table.identity, schema.fieldNames.toSeq)
    var sawCommit = false
    var maxLsn = -1L
    val base = rows.flatMap { r =>
      val op = r.getAs[String]("_op")
      val lsn = r.getAs[Long]("_lsn")
      maxLsn = math.max(maxLsn, lsn)
      val xact = if (r.isNullAt(r.fieldIndex("_xact"))) None
                 else Some(r.getAs[Long]("_xact"))
      def dataRow: Row =
        Row.fromSeq(schema.fieldNames.toSeq.map(c => r.get(r.fieldIndex(c))))
      def key: Seq[Any] = keyCols.map(c => r.get(r.fieldIndex(c)))
      def ddl: String = {
        val v = r.getAs[String]("_ddl")
        require(v != null, s"$op event needs a _ddl payload")
        v
      }
      op match {
        case "i" | "insert" => Seq(Append(dataRow, lsn, xact))
        case "u" | "upsert" => CdcEvent.upsert(dataRow, key, lsn, xact)
        case "d" | "delete" => Seq(Delete(key, lsn, xact))
        case "c" | "commit" => sawCommit = true; Seq(Commit(lsn, xact))
        case "ab" | "abort" =>
          Seq(StreamAbort(xact.getOrElse(
            throw new IllegalArgumentException("abort without _xact"))))
        case "alter_add" =>
          val cols = ddl.split(";").map(_.trim).filter(_.nonEmpty).toSeq.map { p =>
            val i = p.indexOf(' ')
            require(i > 0, s"alter_add needs 'name type', got: $p")
            (p.substring(0, i).trim, p.substring(i + 1).trim)
          }
          cols.filter { case (n, _) => !schema.fieldNames.contains(n) }
            .foreach { case (n, t) =>
              schema = org.apache.spark.sql.types.StructType(
                schema.fields :+ SchemaDsl.field(n, t)) }
          Seq(AlterAdd(cols, lsn))
        case "alter_drop" =>
          val cols = ddl.split(";").map(_.trim).filter(_.nonEmpty).toSeq
          schema = org.apache.spark.sql.types.StructType(
            schema.fields.filterNot(f => cols.contains(f.name)))
          Seq(AlterDrop(cols, lsn))
        case other => throw new IllegalArgumentException(s"unknown op $other")
      }
    }
    // the implicit batch-end commit can only be decided after the last
    // event — a lazily-evaluated tail, so the pipeline stays streaming
    base ++ new Iterator[CdcEvent] {
      private var done = false
      override def hasNext: Boolean = !done && !sawCommit && maxLsn >= 0
      override def next(): CdcEvent = { done = true; Commit(maxLsn) }
    }
  }

  /** Apply one micro-batch (usable directly for batch-mode ingest too).
   *
   *  Scale path: a batch of plain insert/upsert/delete events (no
   *  streaming transactions, commits only at the batch end) never
   *  touches the driver — `GraftTable.applyBatchDF` folds, flushes and
   *  indexes it with Spark jobs. Batches carrying streaming-transaction
   *  events, mid-batch commits, or schema-change events take the exact
   *  driver event path (the reference routes them through the same
   *  single event loop, `table_handler.rs:124`) — collected when small,
   *  streamed partition-at-a-time past `config.driverEventBatchRows` so
   *  one giant transaction cannot blow driver memory. */
  def applyBatch(table: GraftTable, batch: DataFrame): Long = {
    import org.apache.spark.sql.functions._
    var b =
      if (batch.columns.contains("_xact")) batch
      else batch.withColumn("_xact", lit(null).cast("long"))
    if (!b.columns.contains("_ddl"))
      b = b.withColumn("_ddl", lit(null).cast("string"))
    val t0 = if (sys.env.get("GRAFT_PROF").contains("1")) System.nanoTime() else 0L
    val s = b.agg(
      max(col("_lsn")),
      sum(when(col("_xact").isNotNull, 1L).otherwise(0L)),
      sum(when(col("_op").isin("d", "delete", "u", "upsert"), 1L).otherwise(0L)),
      sum(when(!col("_op").isin("i", "insert", "u", "upsert", "d", "delete",
        "c", "commit"), 1L).otherwise(0L)),
      max(when(col("_op").isin("c", "commit"), col("_lsn"))),
      count(lit(1))).head()
    if (t0 != 0L) println(
      f"[graft-prof] batch pre-agg            ${(System.nanoTime() - t0) / 1e9}%.3f s")
    if (s.isNullAt(0)) return table.commitLsn // empty batch
    val maxLsn = s.getLong(0)
    val hasXact = s.getLong(1) > 0
    val hasDeletes = s.getLong(2) > 0
    val hasOtherOps = s.getLong(3) > 0
    val midBatchCommit = !s.isNullAt(4) && s.getLong(4) != maxLsn
    if (!hasXact && !hasOtherOps && !midBatchCommit)
      // the event count rides the same aggregate — applyBatchDF sizes
      // its output files from it without a second pass over the batch
      table.applyBatchDF(b.drop("_ddl"), maxLsn, hasDeletes, estRows = s.getLong(5))
    else if (s.getLong(5) <= table.config.driverEventBatchRows)
      table.apply(toEvents(table, b))
    else
      table.applyStreamed(eventIterator(table, b))
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
