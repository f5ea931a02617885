package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import graft.format.{DvSidecar, Fio}
import graft.model.{Identity, SchemaDsl}
import graft.table.{GraftCatalog, GraftTable, TableConfig}

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/**
 * The RPC control/scan plane of S12: serves the reference's ten
 * operations (`moonlink_rpc/src/lib.rs:30-41`) over [[RpcWire]] frames
 * against a [[GraftCatalog]]. The transport here is
 * `handleFrame(bytes) -> bytes`; [[RpcTcpServer]] pumps frames into it
 * unchanged from a real loopback TCP listener (the standalone
 * deployment, `graft.tools.Serve`), and tests drive it in-process.
 *
 * Op mapping (deviations documented):
 *  - `create_table`: the reference pulls the schema from the Postgres
 *    source's catalog; with no live source, `table_config` JSON carries
 *    `{"schema": [{"name","type"}...], "key": [...]}` in the SchemaDsl
 *    type grammar.
 *  - `create_snapshot(lsn)`: asserts the commit watermark covers `lsn`,
 *    then forces a publish cycle (`optimize()` — M15).
 *  - `get_table_schema`: serialized Arrow IPC schema message, the byte
 *    shape the reference returns.
 *  - `get_parquet_metadatas`: each file's thrift footer (FileMetaData)
 *    bytes, sliced per the parquet trailer (`len u32 LE + "PAR1"`).
 *  - `scan_table_begin`: pins the version ([[GraftTable.readPinned]] —
 *    the vacuum-survival machinery) and returns the [[ScanState]] blob:
 *    data files, GDV1 sidecars as the puffin set, per-file blob byte
 *    ranges as deletion-vector refs. `scan_table_end` releases the pin
 *    (reference `table_provider.rs:244-256` refcounts the same way).
 */
final class RpcServer(catalog: GraftCatalog) {
  import RpcWire._

  private val mapper = new ObjectMapper()
  // one-scan-per-table handle state; synchronized because the TCP
  // transport can dispatch from several connection threads (each
  // connection gets its OWN RpcServer — see RpcTcpServer — so pins are
  // connection-scoped like the reference's per-handle scan state, but
  // a misbehaving client pipelining from two threads must still never
  // corrupt the map)
  private val pins = scala.collection.concurrent.TrieMap[(String, String), GraftTable#ReadPin]()

  /** Release every pin this handle still holds — connection teardown
   *  (a client that dropped mid-scan must not pin versions forever). */
  def closePins(): Unit =
    pins.keys.toSeq.foreach(k => pins.remove(k).foreach(_.close()))

  private def key(db: String, t: String) = s"$db.$t"

  /** Lookup with bare-name fallback: RPC-created tables key as
   *  `db.t`, while REST/library-created tables in the same warehouse
   *  key by bare name — one Serve process exposes both over one
   *  catalog, so the RPC surface must resolve either. */
  private def resolve(db: String, t: String): GraftTable = {
    val k = key(db, t)
    val names = catalog.list
    if (names.contains(k)) catalog.table(k)
    else if (names.contains(t)) catalog.table(t)
    else catalog.table(k) // keep the db-qualified error message
  }

  def handleFrame(frameBytes: Array[Byte]): Array[Byte] =
    frame(handle(unframe(frameBytes)))

  def handle(requestBytes: Array[Byte]): Array[Byte] =
    try dispatch(decodeRequest(requestBytes))
    catch {
      case NonFatal(e) =>
        encodeErr(RpcError(Option(e.getMessage).getOrElse(e.toString),
          permanent = true, source = Some(e.getClass.getName)))
    }

  private def dispatch(req: Request): Array[Byte] = req match {
    case CreateTable(db, t, _, srcUri, cfgJson) =>
      val cfg = mapper.readTree(cfgJson)
      val fields = cfg.get("schema").elements().asScala.map { f =>
        SchemaDsl.field(f.get("name").asText(), f.get("type").asText())
      }.toSeq
      val keys = Option(cfg.get("key")) match {
        case Some(k) => k.elements().asScala.map(_.asText()).toSeq
        case None => Nil
      }
      val identity =
        if (keys.nonEmpty) Identity.Keys(keys) else Identity.None
      val table = catalog.createTable(key(db, t),
        org.apache.spark.sql.types.StructType(fields), identity,
        TableConfig(walEnabled = false))
      // src_uri doubles as an initial bulk-load path (S7) when present
      if (srcUri.nonEmpty) {
        val files = Fio.list(srcUri).filter(_.endsWith(".parquet"))
          .map(n => s"$srcUri/$n")
        if (files.nonEmpty) table.loadFiles(files, table.commitLsn + 1)
      }
      encodeOk(_ => ())

    case DropTable(db, t) =>
      pins.remove((db, t)).foreach(_.close())
      catalog.dropTable(key(db, t))
      encodeOk(_ => ())

    case CreateSnapshot(db, t, lsn) =>
      val table = resolve(db, t)
      require(table.commitLsn >= lsn,
        s"commit watermark ${table.commitLsn} below snapshot lsn $lsn")
      table.optimize()
      encodeOk(_ => ())

    case GetParquetMetadatas(files) =>
      val footers = files.map { f =>
        val bytes = Fio.readBytes(f)
        require(bytes.length >= 8 &&
          new String(bytes, bytes.length - 4, 4, "US-ASCII") == "PAR1",
          s"$f is not a parquet file")
        val len = java.nio.ByteBuffer.wrap(bytes, bytes.length - 8, 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt()
        java.util.Arrays.copyOfRange(bytes,
          bytes.length - 8 - len, bytes.length - 8)
      }
      encodeOk { e =>
        e.seq(footers)(f => { e.bytesField(f); () }); ()
      }

    case GetTableSchema(db, t) =>
      val bytes = org.apache.spark.sql.graft.ArrowSchemaShim
        .toArrowIpcBytes(resolve(db, t).schema)
      encodeOk(e => { e.bytesField(bytes); () })

    case ListTables =>
      val infos = catalog.list.sorted.map { name =>
        val table = catalog.table(name)
        val (db, t) = name.split("\\.", 2) match {
          case Array(d, tt) => (d, tt)
          case _ => ("", name)
        }
        TableInfo(db, t, table.liveRowCount, table.commitLsn,
          if (table.flushLsn > 0) Some(table.flushLsn) else None,
          catalog.warehouse)
      }
      encodeOk { e =>
        e.seq(infos)(i => encodeTableInfo(e, i)); ()
      }

    case LoadFiles(db, t, files) =>
      val table = resolve(db, t)
      table.loadFiles(files, table.commitLsn + 1)
      encodeOk(_ => ())

    case OptimizeTable(db, t, mode) =>
      require(Seq("data", "index", "full").contains(mode),
        s"unknown optimize mode '$mode'") // reference modes
      resolve(db, t).optimize()
      encodeOk(_ => ())

    case ScanTableBegin(db, t, lsn) =>
      val table = resolve(db, t)
      val pin = table.readPinned(if (lsn > 0) Some(lsn) else None)
      // atomic claim: one scan per (table, handle); a lost race must
      // release its own pin, never leak it
      if (pins.putIfAbsent((db, t), pin).isDefined) {
        pin.close()
        throw new IllegalStateException(s"scan already in progress for $db.$t")
      }
      val dataFiles = pin.pinnedDataFiles
      val dvFiles = pin.pinnedDvFiles
      val dataNumber = dataFiles.zipWithIndex.toMap
      val dvs = dvFiles.zipWithIndex.flatMap { case (dv, dvNum) =>
        DvSidecar.blobRefs(Fio.readBytes(s"${table.root}/dv/$dv"))
          .collect { case (dataFile, off, size)
              if dataNumber.contains(dataFile) =>
            ScanState.DvRef(dataNumber(dataFile), dvNum, off, size)
          }
      }
      val blob = ScanState.encode(ScanState.State(
        dataFiles.map(f => s"${table.root}/data/$f"),
        dvFiles.map(f => s"${table.root}/dv/$f"),
        dvs, Nil))
      encodeOk(e => { e.bytesField(blob); () })

    case ScanTableEnd(db, t) =>
      pins.remove((db, t)) match {
        case Some(pin) => pin.close(); encodeOk(_ => ())
        case None => throw new IllegalStateException(s"no scan open for $db.$t")
      }
  }
}
