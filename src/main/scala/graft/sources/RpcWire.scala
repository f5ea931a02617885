package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

/**
 * The RPC wire protocol of the reference's control plane (S12),
 * implemented from its observable framing (`moonlink_rpc/src/lib.rs`):
 * each message is a u32 native-endian length prefix followed by a
 * bincode(standard-config) body. The standard config means varint
 * integer encoding, little-endian:
 *
 *   uint < 251          -> 1 byte
 *   uint <= u16::MAX    -> 0xFB + u16 LE
 *   uint <= u32::MAX    -> 0xFC + u32 LE
 *   uint <= u64::MAX    -> 0xFD + u64 LE
 *   enum discriminant   -> u32 varint, declaration order
 *   String / Vec        -> u64 varint length + contents
 *   Option              -> 0x00 | (0x01 + payload)
 *   Result<T, E>        -> enum { Ok(T) = 0, Err(E) = 1 }
 *
 * The request enum mirrors `rpcs! {}`'s declaration order
 * (`lib.rs:30-41`); responses are `RpcResult<T> = Result<T,
 * ErrorStruct>` with ErrorStruct = (message, status enum
 * Temporary|Permanent, source: Option<String>, location:
 * Option<String>) per `moonlink_error/src/error.rs:26-35`.
 */
object RpcWire {

  // ---- request/response model -------------------------------------------

  sealed trait Request
  final case class CreateSnapshot(database: String, table: String,
      lsn: Long) extends Request
  final case class CreateTable(database: String, table: String, src: String,
      srcUri: String, tableConfig: String) extends Request
  final case class DropTable(database: String, table: String) extends Request
  final case class GetParquetMetadatas(dataFiles: Seq[String]) extends Request
  final case class GetTableSchema(database: String, table: String) extends Request
  case object ListTables extends Request
  final case class LoadFiles(database: String, table: String,
      files: Seq[String]) extends Request
  final case class OptimizeTable(database: String, table: String,
      mode: String) extends Request
  final case class ScanTableBegin(database: String, table: String,
      lsn: Long) extends Request
  final case class ScanTableEnd(database: String, table: String) extends Request

  /** `list_tables` row (`moonlink_rpc/src/lib.rs:63-71`). */
  final case class TableInfo(database: String, table: String,
      cardinality: Long, commitLsn: Long, flushLsn: Option[Long],
      warehouse: String)

  final case class RpcError(message: String, permanent: Boolean,
      source: Option[String] = None, location: Option[String] = None)

  // ---- bincode(standard) primitives -------------------------------------

  final class Enc {
    private val bos = new ByteArrayOutputStream()
    def byte(v: Int): Enc = { bos.write(v & 0xff); this }
    def varint(v: Long): Enc = {
      require(v >= 0, s"unsigned varint got $v")
      if (v < 251) byte(v.toInt)
      else if (v <= 0xffffL) {
        byte(0xfb)
        byte(v.toInt & 0xff); byte((v >> 8).toInt & 0xff)
      } else if (v <= 0xffffffffL) {
        byte(0xfc)
        var i = 0; while (i < 4) { byte(((v >> (8 * i)) & 0xff).toInt); i += 1 }
      } else {
        byte(0xfd)
        var i = 0; while (i < 8) { byte(((v >> (8 * i)) & 0xff).toInt); i += 1 }
      }
      this
    }
    def str(s: String): Enc = {
      val b = s.getBytes(UTF_8)
      varint(b.length.toLong); bos.write(b, 0, b.length); this
    }
    def bytesField(b: Array[Byte]): Enc = {
      varint(b.length.toLong); bos.write(b, 0, b.length); this
    }
    def opt[A](o: Option[A])(f: A => Unit): Enc = o match {
      case None => byte(0)
      case Some(a) => byte(1); f(a); this
    }
    def seq[A](xs: Seq[A])(f: A => Unit): Enc = {
      varint(xs.length.toLong); xs.foreach(f); this
    }
    def toBytes: Array[Byte] = bos.toByteArray
  }

  final class Dec(bytes: Array[Byte]) {
    private var pos = 0
    def byte(): Int = { val v = bytes(pos) & 0xff; pos += 1; v }
    def varint(): Long = byte() match {
      case 0xfb => (byte() | (byte() << 8)).toLong
      case 0xfc =>
        var v = 0L; var i = 0
        while (i < 4) { v |= byte().toLong << (8 * i); i += 1 }; v
      case 0xfd =>
        var v = 0L; var i = 0
        while (i < 8) { v |= byte().toLong << (8 * i); i += 1 }; v
      case b => b.toLong
    }
    def str(): String = {
      val n = varint().toInt
      val s = new String(bytes, pos, n, UTF_8); pos += n; s
    }
    def bytesField(): Array[Byte] = {
      val n = varint().toInt
      val b = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; b
    }
    def opt[A](f: => A): Option[A] = byte() match {
      case 0 => None
      case 1 => Some(f)
      case other => throw new IllegalArgumentException(s"bad Option tag $other")
    }
    def seq[A](f: => A): Seq[A] = Seq.fill(varint().toInt)(f)
    def remaining: Int = bytes.length - pos
  }

  // ---- frame layer -------------------------------------------------------

  /** u32 length prefix, native-endian per the reference (LE on x86). */
  def frame(body: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(4 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(body.length).put(body).array()
  }

  def unframe(bytes: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val len = b.getInt()
    require(len == bytes.length - 4,
      s"frame length $len != body length ${bytes.length - 4}")
    java.util.Arrays.copyOfRange(bytes, 4, bytes.length)
  }

  // ---- request codec -----------------------------------------------------

  // discriminants in rpcs!{} declaration order
  private val ReqCreateSnapshot = 0
  private val ReqCreateTable = 1
  private val ReqDropTable = 2
  private val ReqGetParquetMetadatas = 3
  private val ReqGetTableSchema = 4
  private val ReqListTables = 5
  private val ReqLoadFiles = 6
  private val ReqOptimizeTable = 7
  private val ReqScanTableBegin = 8
  private val ReqScanTableEnd = 9

  def encodeRequest(r: Request): Array[Byte] = {
    val e = new Enc
    r match {
      case CreateSnapshot(db, t, lsn) =>
        e.varint(ReqCreateSnapshot).str(db).str(t).varint(lsn)
      case CreateTable(db, t, src, uri, cfg) =>
        e.varint(ReqCreateTable).str(db).str(t).str(src).str(uri).str(cfg)
      case DropTable(db, t) => e.varint(ReqDropTable).str(db).str(t)
      case GetParquetMetadatas(files) =>
        e.varint(ReqGetParquetMetadatas).seq(files)(f => { e.str(f); () })
      case GetTableSchema(db, t) => e.varint(ReqGetTableSchema).str(db).str(t)
      case ListTables => e.varint(ReqListTables)
      case LoadFiles(db, t, files) =>
        e.varint(ReqLoadFiles).str(db).str(t)
        e.seq(files)(f => { e.str(f); () })
      case OptimizeTable(db, t, mode) =>
        e.varint(ReqOptimizeTable).str(db).str(t).str(mode)
      case ScanTableBegin(db, t, lsn) =>
        e.varint(ReqScanTableBegin).str(db).str(t).varint(lsn)
      case ScanTableEnd(db, t) => e.varint(ReqScanTableEnd).str(db).str(t)
    }
    e.toBytes
  }

  def decodeRequest(bytes: Array[Byte]): Request = {
    val d = new Dec(bytes)
    val req = d.varint().toInt match {
      case ReqCreateSnapshot => CreateSnapshot(d.str(), d.str(), d.varint())
      case ReqCreateTable =>
        CreateTable(d.str(), d.str(), d.str(), d.str(), d.str())
      case ReqDropTable => DropTable(d.str(), d.str())
      case ReqGetParquetMetadatas => GetParquetMetadatas(d.seq(d.str()))
      case ReqGetTableSchema => GetTableSchema(d.str(), d.str())
      case ReqListTables => ListTables
      case ReqLoadFiles => LoadFiles(d.str(), d.str(), d.seq(d.str()))
      case ReqOptimizeTable => OptimizeTable(d.str(), d.str(), d.str())
      case ReqScanTableBegin => ScanTableBegin(d.str(), d.str(), d.varint())
      case ReqScanTableEnd => ScanTableEnd(d.str(), d.str())
      case other => throw new IllegalArgumentException(s"unknown request $other")
    }
    require(d.remaining == 0, s"${d.remaining} trailing bytes after request")
    req
  }

  // ---- response codec ----------------------------------------------------

  /** Ok(T): Result discriminant 0 then the payload writer. */
  def encodeOk(write: Enc => Unit): Array[Byte] = {
    val e = new Enc
    e.varint(0)
    write(e)
    e.toBytes
  }

  /** Err(ErrorStruct): discriminant 1, message, status enum, source,
   *  location. */
  def encodeErr(err: RpcError): Array[Byte] = {
    val e = new Enc
    e.varint(1).str(err.message).varint(if (err.permanent) 1 else 0)
    e.opt(err.source)(s => { e.str(s); () })
    e.opt(err.location)(s => { e.str(s); () })
    e.toBytes
  }

  /** Decode a response; Left = error, Right = payload decoder handed to
   *  the caller. */
  def decodeResult[A](bytes: Array[Byte])(read: Dec => A): Either[RpcError, A] = {
    val d = new Dec(bytes)
    d.varint() match {
      case 0 =>
        val a = read(d)
        require(d.remaining == 0, s"${d.remaining} trailing bytes after response")
        Right(a)
      case 1 =>
        val msg = d.str(); val permanent = d.varint() == 1
        val source = d.opt(d.str()); val location = d.opt(d.str())
        Left(RpcError(msg, permanent, source, location))
      case other =>
        throw new IllegalArgumentException(s"bad Result discriminant $other")
    }
  }

  def encodeTableInfo(e: Enc, t: TableInfo): Unit = {
    e.str(t.database); e.str(t.table)
    e.varint(t.cardinality); e.varint(t.commitLsn)
    e.opt(t.flushLsn)(l => { e.varint(l); () })
    e.str(t.warehouse)
    ()
  }

  def decodeTableInfo(d: Dec): TableInfo =
    TableInfo(d.str(), d.str(), d.varint(), d.varint(),
      d.opt(d.varint()), d.str())
}
