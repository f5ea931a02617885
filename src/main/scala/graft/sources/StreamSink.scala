package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import graft.format.{Fio, Manifest}
import graft.model.Identity
import graft.table.{GraftTable, TableConfig, Wal}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/**
 * Structured Streaming SINK for graft tables — the write half of the
 * loop whose read half is the table's MicroBatchStream source:
 * `df.writeStream.format("graft").option("path", root)` or
 * `.toTable("cat.ns.t")` through the V2 catalog. Two modes by table
 * identity:
 *
 *  - APPEND-ONLY tables take plain row streams; each epoch lands as
 *    one append commit.
 *  - KEYED tables take CDC EVENT streams: the frame carries `_op`
 *    (i/u/d) and `_lsn` (source-assigned, e.g. the replication
 *    position) beside the data columns, and each epoch runs the full
 *    upsert fold — deletes DV old versions via the key index, exactly
 *    like the batch CDC path. This is the streaming shape of the
 *    reference's moonlink_sink (`moonlink_sink.rs:43-48`), where the
 *    LSN axis carries ordering and the sink dedups replays.
 *
 * Exactly-once on both modes: each micro-batch epoch stages its rows
 * as JSONL event files (executor-side, WAL codec), and the epoch
 * commit applies them through `applyEpochDF`/`applyEpochCdcDF` — the
 * epoch watermark is persisted IN the same manifest commit as the
 * data (`Manifest.streamEpochs`), so a replayed epoch after a restart
 * no-ops and a crash can never split data from watermark.
 */
private[graft] class GraftStreamingWrite(root: String, manifest: Manifest,
    queryId: String, writeSchema: StructType) extends StreamingWrite {
  private val staging = s"$root/tmp/sink-$queryId"
  private val keyed = manifest.keyCols.nonEmpty

  // keyed mode contract: _op (string) + _lsn (long) + exactly the data
  // columns; append mode: exactly the data columns. Checked HERE so a
  // bad stream fails at query start, not first epoch.
  validateSchema()
  private def validateSchema(): Unit = {
    val dataCols = manifest.schema.fieldNames.toSet
    val got = writeSchema.fieldNames.toSet
    if (keyed) {
      require(got.contains("_op") && got.contains("_lsn"),
        s"keyed table $root takes CDC event streams: the frame needs " +
          "_op (i/u/d) and _lsn (source position) beside the data columns")
      require(got - "_op" - "_lsn" == dataCols,
        s"stream columns ${got - "_op" - "_lsn"} != table columns $dataCols")
      require(writeSchema("_lsn").dataType == LongType &&
        writeSchema("_op").dataType == StringType,
        "_op must be STRING and _lsn BIGINT")
    } else require(got == dataCols,
      s"stream columns $got != table columns $dataCols")
  }

  /** opened eagerly, once per streaming query: open()'s orphan-tmp
   *  sweep must run before the first epoch stages a file */
  private val table = GraftTable.open(SparkSession.active, root,
    if (keyed) Identity.Keys(manifest.keyCols) else Identity.None,
    TableConfig())

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftStreamSinkWriterFactory(staging, manifest.schema, writeSchema,
      keyed)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect {
      case StagedEventsMessage(p, _) if p.nonEmpty => p }
    try {
      if (files.nonEmpty) {
        val ev = StagedEvents.readEvents(
          SparkSession.active, files, manifest.schema)
        if (keyed) table.applyEpochCdcDF(ev, epochId, queryId)
        else table.applyEpochDF(ev.drop("_lsn"), epochId, queryId)
      }
    } finally files.foreach(Fio.delete)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    Fio.delete(staging)
}

/**
 * The keyed table's streaming-sink facade: `` t$cdc `` (catalog) or
 * `option("cdc","true")` (path) resolves to a WRITE-ONLY table whose
 * schema IS the CDC event schema — `_op` (i/u/d), `_lsn` (source
 * position) and the data columns — so Spark's normal output resolution
 * validates the event frame with no capability escape hatches, and the
 * epoch commit runs the full upsert fold.
 */
private[graft] class GraftCdcSinkTable(root: String, manifest: Manifest,
    displayName: String)
    extends org.apache.spark.sql.connector.catalog.Table
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  require(manifest.keyCols.nonEmpty,
    s"$displayName: the CDC sink needs a keyed table (append-only " +
      "tables take plain row streams)")
  override def name(): String = displayName
  override def schema(): StructType = StructType(
    org.apache.spark.sql.types.StructField("_op", StringType) +:
    org.apache.spark.sql.types.StructField("_lsn", LongType) +:
    manifest.schema.fields)
  override def capabilities(): java.util.Set[
      org.apache.spark.sql.connector.catalog.TableCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    val writeSchema = info.schema()
    val queryId = info.queryId()
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.Write {
          override def toStreaming: StreamingWrite =
            new GraftStreamingWrite(root, manifest, queryId, writeSchema)
        }
    }
  }
}

private[graft] class GraftStreamSinkWriterFactory(staging: String,
    tableSchema: StructType, writeSchema: StructType, keyed: Boolean)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftStreamSinkWriter(staging, tableSchema, writeSchema, keyed,
      partitionId, taskId, epochId)
}

/** stages this task's slice of the epoch as JSONL events — plain "i"
 *  appends for row streams, pass-through op/lsn for CDC streams */
private[graft] class GraftStreamSinkWriter(staging: String,
    tableSchema: StructType, writeSchema: StructType, keyed: Boolean,
    partitionId: Int, taskId: Long, epochId: Long)
    extends DataWriter[InternalRow] {

  private val sb = new java.lang.StringBuilder
  private val mapper = new ObjectMapper()
  private val rowConv =
    CatalystTypeConverters.createToScalaConverter(writeSchema)
  private val opIdx = writeSchema.fieldNames.indexOf("_op")
  private val lsnIdx = writeSchema.fieldNames.indexOf("_lsn")
  private val dataIdx = tableSchema.fields.map { f =>
    val i = writeSchema.fieldNames.indexOf(f.name)
    require(i >= 0, s"stream sink write schema misses column ${f.name}")
    i
  }

  override def write(row: InternalRow): Unit = {
    val r = rowConv(row).asInstanceOf[org.apache.spark.sql.Row]
    val full = org.apache.spark.sql.Row.fromSeq(dataIdx.toSeq.map(r.get))
    val o = mapper.createObjectNode()
    o.put("t", if (keyed) r.getString(opIdx) else "i")
    if (keyed) o.put("lsn", r.getLong(lsnIdx))
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
