package graft.model

import org.apache.spark.sql.Row

/**
 * CDC / ingestion event ADT.
 *
 * Mirrors the reference's table-event surface (moonlink
 * `src/moonlink/src/table_notify.rs:69-224`: Append / Delete / Commit /
 * StreamAbort carrying an LSN and an optional streaming-transaction id) —
 * re-expressed as a plain Scala ADT that a `Dataset[CdcEvent]` /
 * Structured-Streaming `foreachBatch` can drain in LSN order.
 *
 * LSN semantics (reference `src/moonlink/src/lsn_state.rs:10-57`):
 * every mutation carries a monotonically increasing log sequence number;
 * a Commit publishes everything at-or-below its LSN.
 */
sealed trait CdcEvent {
  def lsn: Long
  def xactId: Option[Long]
}

/** Insert one row. (reference `mooncake_table.rs:1212` `append`) */
final case class Append(row: Row, lsn: Long, xactId: Option[Long] = None)
    extends CdcEvent

/**
 * Delete by identity key (the values of the table's key columns).
 * `ifExists = true` mirrors the reference's `delete_if_exists` used by
 * the upsert path (`rest_ingest/moonlink_rest_sink.rs:222-247`): a miss
 * is not an error.
 */
final case class Delete(
    key: Seq[Any],
    lsn: Long,
    xactId: Option[Long] = None,
    ifExists: Boolean = false)
    extends CdcEvent

/**
 * Transaction boundary: publishes all staged mutations with LSN <= lsn.
 * With `xactId` set this is a StreamCommit of a streaming transaction
 * (reference `transaction_stream.rs:522`).
 */
final case class Commit(lsn: Long, xactId: Option[Long] = None)
    extends CdcEvent

/** Abort a streaming transaction, discarding all its staged state —
 *  including any already-flushed staged files (reference
 *  `transaction_stream.rs:334`). */
final case class StreamAbort(xid: Long) extends CdcEvent {
  def lsn: Long = -1L
  def xactId: Option[Long] = Some(xid)
}

/** In-stream schema change: add columns as (name, REST type name)
 *  pairs. The reference raises the equivalent `AlterTable` when a PG
 *  `Relation` message arrives with a changed column set mid-stream
 *  (`pg_replicate/moonlink_sink.rs:347-361`); here the change is an
 *  explicit event in LSN order — data rows after it carry the new
 *  column. Not valid inside a streaming transaction. */
final case class AlterAdd(cols: Seq[(String, String)], lsn: Long)
    extends CdcEvent {
  def xactId: Option[Long] = None
}

/** In-stream schema change: drop columns by name (key columns are
 *  rejected by the table). Data rows after it no longer carry the
 *  column. Not valid inside a streaming transaction. */
final case class AlterDrop(cols: Seq[String], lsn: Long) extends CdcEvent {
  def xactId: Option[Long] = None
}

object CdcEvent {
  /** Upsert = delete-if-exists + append at the same LSN (reference
   *  `moonlink_rest_sink.rs:222-247`). */
  def upsert(row: Row, key: Seq[Any], lsn: Long,
      xactId: Option[Long] = None): Seq[CdcEvent] =
    Seq(Delete(key, lsn, xactId, ifExists = true), Append(row, lsn, xactId))

  /** CDC Update = delete(old identity) + append(new) at the same LSN
   *  (reference `pg_replicate/moonlink_sink.rs:295-325`). */
  def update(oldKey: Seq[Any], newRow: Row, lsn: Long,
      xactId: Option[Long] = None): Seq[CdcEvent] =
    Seq(Delete(oldKey, lsn, xactId), Append(newRow, lsn, xactId))
}

/**
 * Row identity — how delete/update events locate their target row.
 * Mirrors `IdentityProp` (reference `row/moonlink_row.rs:271-277`).
 */
sealed trait Identity
object Identity {
  /** Append-only table: deletes are rejected
   *  (reference `mooncake_table.rs:1242-1246`). */
  case object None extends Identity
  /** Identity = the named key columns (single primitive PK and
   *  multi-column keys collapse to the same Spark-side treatment). */
  final case class Keys(cols: Seq[String]) extends Identity
  /** Identity = the whole row. */
  case object FullRow extends Identity

  def keyColumns(id: Identity, allCols: Seq[String]): Seq[String] = id match {
    case None       => Seq.empty
    case Keys(cols) => cols
    case FullRow    => allCols
  }
}
