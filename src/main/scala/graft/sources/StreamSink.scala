package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import graft.format.{Fio, Manifest}
import graft.model.Identity
import graft.table.{GraftTable, TableConfig, Wal}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType

/**
 * Structured Streaming SINK for append-only graft tables — the write
 * half of the loop whose read half is the table's MicroBatchStream
 * source: `df.writeStream.format("graft").option("path", root)` or
 * `.toTable("cat.ns.t")` through the V2 catalog.
 *
 * Exactly-once: each micro-batch epoch stages its rows as JSONL event
 * files (executor-side, WAL codec), and the epoch commit applies them
 * through `GraftTable.applyEpochDF` — the epoch watermark is persisted
 * IN the same manifest commit as the data (`Manifest.streamEpochs`),
 * so a replayed epoch after a restart no-ops and a crash can never
 * split data from watermark. The reference's moonlink_sink plays the
 * same role for its Flink path (`moonlink_sink.rs:43-48`), with the
 * LSN axis carrying the dedup there.
 *
 * Keyed tables refuse: their streaming ingestion needs the CDC upsert
 * fold with LSN-carrying events (`CdcPipeline`), not blind appends.
 */
private[graft] class GraftStreamingWrite(root: String, manifest: Manifest,
    queryId: String, writeSchema: StructType) extends StreamingWrite {
  private val staging = s"$root/tmp/sink-$queryId"

  /** opened eagerly, once per streaming query: open()'s orphan-tmp
   *  sweep must run before the first epoch stages a file */
  private val table = GraftTable.open(SparkSession.active, root,
    Identity.None, TableConfig())

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftStreamSinkWriterFactory(staging, manifest.schema, writeSchema)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect {
      case StagedEventsMessage(p, _) if p.nonEmpty => p }
    try {
      if (files.nonEmpty) {
        val ev = StagedEvents.readEvents(
          SparkSession.active, files, manifest.schema)
        table.applyEpochDF(ev, epochId)
      }
    } finally files.foreach(Fio.delete)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    Fio.delete(staging)
}

private[graft] class GraftStreamSinkWriterFactory(staging: String,
    tableSchema: StructType, writeSchema: StructType)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftStreamSinkWriter(staging, tableSchema, writeSchema,
      partitionId, taskId, epochId)
}

/** insert-only sibling of GraftDeltaWriter: buffers this task's slice
 *  of the epoch as JSONL "i" events, committed as one atomic file */
private[graft] class GraftStreamSinkWriter(staging: String,
    tableSchema: StructType, writeSchema: StructType,
    partitionId: Int, taskId: Long, epochId: Long)
    extends DataWriter[InternalRow] {

  private val sb = new java.lang.StringBuilder
  private val mapper = new ObjectMapper()
  private val rowConv =
    CatalystTypeConverters.createToScalaConverter(writeSchema)
  private val writeIdx = tableSchema.fields.map { f =>
    val i = writeSchema.fieldNames.indexOf(f.name)
    require(i >= 0, s"stream sink write schema misses column ${f.name}")
    i
  }

  override def write(row: InternalRow): Unit = {
    val r = rowConv(row).asInstanceOf[org.apache.spark.sql.Row]
    val full = org.apache.spark.sql.Row.fromSeq(writeIdx.toSeq.map(r.get))
    val o = mapper.createObjectNode()
    o.put("t", "i")
    o.set[com.fasterxml.jackson.databind.JsonNode]("row",
      Wal.rowToNode(tableSchema, full))
    sb.append(mapper.writeValueAsString(o)).append('\n')
  }

  override def commit(): WriterCommitMessage =
    if (sb.length == 0) StagedEventsMessage("", 0L)
    else {
      val path =
        f"$staging/epoch-$epochId%09d-$partitionId%05d-$taskId.jsonl"
      Fio.writeAtomic(path, sb.toString)
      StagedEventsMessage(path, 0L)
    }

  override def abort(): Unit = ()
  override def close(): Unit = ()
}
