package graft.sources

import graft.streaming.CdcPipeline
import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/**
 * Protobuf row ingest (S4): wire-format decode/encode of the
 * reference's `MoonlinkRow` message
 * (`moonlink_proto/proto/row.proto`; REST endpoint
 * `rest_api.rs:417,1026` `/ingestpb/{table}`):
 *
 *   MoonlinkRow { repeated RowValue values = 1 }
 *   RowValue oneof kind {
 *     int32=1, int64=2, float32=3, float64=4, decimal_128_be=5 (16-byte
 *     big-endian two's complement), bool=6, bytes=7,
 *     fixed_len_bytes=8 (16), Array=9, Struct=10, Null=11 }
 *
 * No protobuf runtime exists in this environment, so this implements
 * the (public, stable) proto3 wire format directly: varints,
 * fixed32/fixed64, and length-delimited fields. Values are positional
 * against the table schema, exactly like the engine's row model
 * (`moonlink_row.rs:14`): int32 doubles as date32 days, int64 as
 * timestamp micros, bytes as string-or-binary — the schema decides
 * (`arrow_converter.rs:30-110`).
 */
object ProtoIngest {

  // ---- decoded value model --------------------------------------------
  sealed trait PbValue extends Serializable
  private final case class PbInt32(v: Int) extends PbValue
  private final case class PbInt64(v: Long) extends PbValue
  private final case class PbFloat(v: Float) extends PbValue
  private final case class PbDouble(v: Double) extends PbValue
  private final case class PbDecimal(be: Array[Byte]) extends PbValue
  private final case class PbBool(v: Boolean) extends PbValue
  private final case class PbBytes(v: Array[Byte]) extends PbValue
  private final case class PbFixed(v: Array[Byte]) extends PbValue
  private final case class PbArray(vs: Seq[PbValue]) extends PbValue
  private final case class PbStruct(vs: Seq[PbValue]) extends PbValue
  private case object PbNull extends PbValue

  // ---- proto3 wire reading --------------------------------------------
  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var out = 0L
      while (true) {
        val b = buf(pos); pos += 1
        out |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
        require(shift < 64, "varint too long")
      }
      out
    }
    def fixed32(): Int = {
      val v = (buf(pos) & 0xFF) | ((buf(pos + 1) & 0xFF) << 8) |
        ((buf(pos + 2) & 0xFF) << 16) | ((buf(pos + 3) & 0xFF) << 24)
      pos += 4; v
    }
    def fixed64(): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xFFL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def bytes(): Array[Byte] = {
      val len = varint().toInt
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len; out
    }
    def sub(): Reader = {
      val len = varint().toInt
      val r = new Reader(buf, pos, pos + len)
      pos += len; r
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 =>
        // read the length BEFORE touching pos: `pos += varint()` reads
        // the old pos first and would lose the length byte's advance
        val len = varint().toInt
        pos += len
      case 5 => pos += 4
      case wt => throw new IllegalArgumentException(s"wire type $wt")
    }
  }

  /** RowValue submessage -> PbValue (proto3 oneof: last field wins). */
  private def readValue(r: Reader): PbValue = {
    var out: PbValue = PbNull
    while (r.hasMore) {
      val tag = r.varint()
      val (field, wt) = ((tag >>> 3).toInt, (tag & 7).toInt)
      field match {
        case 1 => out = PbInt32(r.varint().toInt)
        case 2 => out = PbInt64(r.varint())
        case 3 => out = PbFloat(java.lang.Float.intBitsToFloat(r.fixed32()))
        case 4 => out = PbDouble(java.lang.Double.longBitsToDouble(r.fixed64()))
        case 5 => out = PbDecimal(r.bytes())
        case 6 => out = PbBool(r.varint() != 0)
        case 7 => out = PbBytes(r.bytes())
        case 8 => out = PbFixed(r.bytes())
        case 9 => out = PbArray(readRepeatedValues(r.sub()))
        case 10 => out = PbStruct(readRepeatedValues(r.sub()))
        case 11 => r.skip(wt); out = PbNull
        case _ => r.skip(wt) // unknown field: tolerate, like protobuf
      }
    }
    out
  }

  /** Array/Struct/MoonlinkRow bodies: `repeated RowValue values = 1`. */
  private def readRepeatedValues(r: Reader): Seq[PbValue] = {
    val out = Seq.newBuilder[PbValue]
    while (r.hasMore) {
      val tag = r.varint()
      if ((tag >>> 3).toInt == 1 && (tag & 7).toInt == 2) out += readValue(r.sub())
      else r.skip((tag & 7).toInt)
    }
    out.result()
  }

  // ---- schema-directed conversion (arrow_converter.rs:30-110) ----------
  private def convert(v: PbValue, dt: DataType): Any = (v, dt) match {
    case (PbNull, _) => null
    case (PbInt32(i), IntegerType) => i
    case (PbInt32(i), ShortType) => i.toShort
    case (PbInt32(i), DateType) => // date32 = days since epoch
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.toLong))
    case (PbInt64(l), LongType) => l
    case (PbInt64(us), TimestampType) => // micros since epoch UTC
      val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      ts.setNanos(Math.floorMod(us, 1000000L).toInt * 1000)
      ts
    case (PbFloat(f), FloatType) => f
    case (PbDouble(d), DoubleType) => d
    case (PbDecimal(be), t: DecimalType) =>
      require(be.length == 16, s"decimal_128_be must be 16 bytes, got ${be.length}")
      new java.math.BigDecimal(new java.math.BigInteger(be), t.scale)
    case (PbBool(b), BooleanType) => b
    case (PbBytes(b), StringType) => new String(b, StandardCharsets.UTF_8)
    case (PbBytes(b), BinaryType) => b
    case (PbFixed(b), BinaryType) =>
      require(b.length == 16, "fixed_len_bytes is always 16 bytes"); b
    case (PbArray(vs), ArrayType(et, _)) => vs.map(convert(_, et))
    case (PbStruct(vs), st: StructType) =>
      require(vs.length == st.fields.length, "struct arity mismatch")
      Row.fromSeq(vs.zip(st.fields.toSeq).map { case (x, f) => convert(x, f.dataType) })
    case (other, t) =>
      throw new IllegalArgumentException(s"cannot convert $other to $t")
  }

  /** One serialized MoonlinkRow -> a typed Row against `schema`. */
  def decodeRow(bytes: Array[Byte], schema: StructType): Row = {
    val vs = readRepeatedValues(new Reader(bytes, 0, bytes.length))
    require(vs.length == schema.fields.length,
      s"row has ${vs.length} values, schema has ${schema.fields.length}")
    Row.fromSeq(vs.zip(schema.fields.toSeq).map { case (v, f) =>
      convert(v, f.dataType)
    })
  }

  /** Decode a frame of serialized MoonlinkRows in one distributed pass. */
  def toRows(spark: SparkSession, payloads: DataFrame, payloadCol: String,
      schema: StructType): DataFrame = {
    val rdd = payloads.select(col(payloadCol)).as(Encoders.BINARY).rdd
      .map(b => decodeRow(b, schema))
    spark.createDataFrame(rdd, schema)
  }

  /** REST-pb-style append ingest (`/ingestpb/{table}`). The decoded
   *  frame persists across applyBatch's internal passes so the wire
   *  decode runs once. */
  def ingest(table: GraftTable, payloads: DataFrame, payloadCol: String,
      startLsn: Long): Long = {
    val ev = toRows(table.spark, payloads, payloadCol, table.schema)
      .withColumn("_op", lit("i"))
      .withColumn("_lsn", monotonically_increasing_id() + startLsn)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try CdcPipeline.applyBatch(table, ev)
    finally ev.unpersist()
  }

  // ---- encoder (for producers and round-trip tests) --------------------
  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def writeTag(out: ByteArrayOutputStream, field: Int, wt: Int): Unit =
    writeVarint(out, (field.toLong << 3) | wt)
  private def writeLenDelim(out: ByteArrayOutputStream, field: Int,
      body: Array[Byte]): Unit = {
    writeTag(out, field, 2); writeVarint(out, body.length.toLong); out.write(body)
  }

  /** Encode one RowValue message body for `value` of declared type. */
  private def encodeValue(value: Any, dt: DataType): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    (value, dt) match {
      case (null, _) => writeLenDelim(out, 11, Array.emptyByteArray)
      case (i: Int, IntegerType) => writeTag(out, 1, 0); writeVarint(out, i.toLong)
      case (d: java.sql.Date, DateType) =>
        writeTag(out, 1, 0); writeVarint(out, d.toLocalDate.toEpochDay)
      case (l: Long, LongType) => writeTag(out, 2, 0); writeVarint(out, l)
      case (t: java.sql.Timestamp, TimestampType) =>
        val us = Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
        writeTag(out, 2, 0); writeVarint(out, us)
      case (f: Float, FloatType) =>
        writeTag(out, 3, 5)
        val bits = java.lang.Float.floatToIntBits(f)
        (0 until 4).foreach(i => out.write((bits >>> (8 * i)) & 0xFF))
      case (d: Double, DoubleType) =>
        writeTag(out, 4, 1)
        val bits = java.lang.Double.doubleToLongBits(d)
        (0 until 8).foreach(i => out.write(((bits >>> (8 * i)) & 0xFF).toInt))
      case (d: java.math.BigDecimal, t: DecimalType) =>
        val unscaled = d.setScale(t.scale).unscaledValue()
        val raw = unscaled.toByteArray // minimal two's complement
        val be = new Array[Byte](16)
        val pad: Byte = if (unscaled.signum() < 0) -1 else 0
        java.util.Arrays.fill(be, pad)
        System.arraycopy(raw, 0, be, 16 - raw.length, raw.length)
        writeLenDelim(out, 5, be)
      case (b: Boolean, BooleanType) =>
        writeTag(out, 6, 0); writeVarint(out, if (b) 1L else 0L)
      case (s: String, StringType) =>
        writeLenDelim(out, 7, s.getBytes(StandardCharsets.UTF_8))
      case (b: Array[Byte], BinaryType) =>
        if (b.length == 16) writeLenDelim(out, 8, b)
        else writeLenDelim(out, 7, b)
      case (xs: scala.collection.Seq[_], ArrayType(et, _)) =>
        val body = new ByteArrayOutputStream()
        xs.foreach(x => writeLenDelim(body, 1, encodeValue(x, et)))
        writeLenDelim(out, 9, body.toByteArray)
      case (r: Row, st: StructType) =>
        val body = new ByteArrayOutputStream()
        r.toSeq.zip(st.fields.toSeq).foreach { case (x, f) =>
          writeLenDelim(body, 1, encodeValue(x, f.dataType))
        }
        writeLenDelim(out, 10, body.toByteArray)
      case (other, t) =>
        throw new IllegalArgumentException(s"cannot encode $other as $t")
    }
    out.toByteArray
  }

  /** Encode a typed Row as a serialized MoonlinkRow message. */
  def encodeRow(row: Row, schema: StructType): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    row.toSeq.zip(schema.fields.toSeq).foreach { case (v, f) =>
      writeLenDelim(out, 1, encodeValue(v, f.dataType))
    }
    out.toByteArray
  }
}
