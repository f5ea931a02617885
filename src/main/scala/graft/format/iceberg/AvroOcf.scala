package graft.format.iceberg

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream}
import java.nio.charset.StandardCharsets

/**
 * Minimal Apache Avro codec — just enough of the PUBLIC Avro 1.11
 * specification (binary encoding + Object Container Files) to write
 * and read Iceberg manifest / manifest-list files without an Avro
 * dependency. The wire format is the spec's, nothing else:
 *
 *  - int/long: zigzag varint; float/double: little-endian IEEE;
 *    bytes/string: length-prefixed; record: fields in order;
 *    array/map: blocks terminated by count 0; union: branch index
 *    then value; fixed: raw bytes.
 *  - OCF: magic `Obj\1`, file-metadata map (string->bytes, carrying
 *    avro.schema + avro.codec + Iceberg's own keys), 16-byte sync
 *    marker, then (item count, byte length, payload, sync) blocks.
 *
 * Datum model (schema-driven, no reflection): record = Map[String,
 * Any], array = Seq[Any], map = Map[String, Any], bytes/fixed =
 * Array[Byte]; unions resolve null vs the single non-null branch
 * (the only union shape Iceberg metadata uses).
 *
 * The sibling ingest decoder (`sources/AvroIngest.scala`) targets
 * Spark rows from single-datum Kafka payloads; this one round-trips
 * whole container files for the table-format layer (reference writes
 * the same files through the `iceberg` crate,
 * `iceberg_table_syncer.rs:230`).
 */
private[graft] object AvroOcf {

  sealed trait AType
  case object ANull extends AType
  case object ABool extends AType
  case object AInt extends AType
  case object ALong extends AType
  case object AFloat extends AType
  case object ADouble extends AType
  case object ABytes extends AType
  case object AString extends AType
  final case class AFixed(name: String, size: Int) extends AType
  final case class AArray(items: AType) extends AType
  final case class AMap(values: AType) extends AType
  final case class ARecord(name: String, fields: Seq[(String, AType)]) extends AType
  /** union of exactly [null, inner] or [inner, null] */
  final case class AOpt(inner: AType, nullIndex: Int) extends AType

  private val mapper = new ObjectMapper()

  def parse(schemaJson: String): AType = parseNode(mapper.readTree(schemaJson))

  private def parseNode(n: JsonNode): AType =
    if (n.isTextual) n.asText match {
      case "null" => ANull
      case "boolean" => ABool
      case "int" => AInt
      case "long" => ALong
      case "float" => AFloat
      case "double" => ADouble
      case "bytes" => ABytes
      case "string" => AString
      case other => throw new IllegalArgumentException(s"avro type: $other")
    } else if (n.isArray) {
      require(n.size == 2, "only [null, T] unions are used here")
      val a = parseNode(n.get(0)); val b = parseNode(n.get(1))
      if (a == ANull) AOpt(b, 0)
      else { require(b == ANull, "union lacks null branch"); AOpt(a, 1) }
    } else n.get("type").asText match {
      case "record" =>
        ARecord(n.get("name").asText,
          n.get("fields").elements().asScalaSeq.map(f =>
            f.get("name").asText -> parseNode(f.get("type"))))
      case "array" => AArray(parseNode(n.get("items")))
      case "map" => AMap(parseNode(n.get("values")))
      case "fixed" => AFixed(n.get("name").asText, n.get("size").asInt)
      case t => parseNode(n.get("type")) // {"type":"long",...} wrapper
    }

  private implicit class IterOps[T](it: java.util.Iterator[T]) {
    def asScalaSeq: Seq[T] = {
      val b = Seq.newBuilder[T]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }

  // ---- binary encoding -------------------------------------------------

  final class Out {
    val buf = new ByteArrayOutputStream()
    def writeVarint(v0: Long): Unit = {
      var v = (v0 << 1) ^ (v0 >> 63) // zigzag
      while ((v & ~0x7fL) != 0) {
        buf.write(((v & 0x7f) | 0x80).toInt); v >>>= 7
      }
      buf.write(v.toInt)
    }
    def writeBytes(b: Array[Byte]): Unit = { writeVarint(b.length); buf.write(b) }
    def writeString(s: String): Unit = writeBytes(s.getBytes(StandardCharsets.UTF_8))
    def writeRaw(b: Array[Byte]): Unit = buf.write(b)
    def toBytes: Array[Byte] = buf.toByteArray
  }

  def encode(t: AType, v: Any, out: Out): Unit = (t, v) match {
    case (ANull, _) => ()
    case (ABool, b: Boolean) => out.buf.write(if (b) 1 else 0)
    case (AInt, i: Int) => out.writeVarint(i.toLong)
    case (ALong, l: Long) => out.writeVarint(l)
    case (ALong, i: Int) => out.writeVarint(i.toLong)
    case (AFloat, f: Float) =>
      val bits = java.lang.Float.floatToIntBits(f)
      (0 until 4).foreach(i => out.buf.write((bits >>> (8 * i)) & 0xff))
    case (ADouble, d: Double) =>
      val bits = java.lang.Double.doubleToLongBits(d)
      (0 until 8).foreach(i => out.buf.write(((bits >>> (8 * i)) & 0xff).toInt))
    case (ABytes, b: Array[Byte]) => out.writeBytes(b)
    case (AString, s: String) => out.writeString(s)
    case (AFixed(_, sz), b: Array[Byte]) =>
      require(b.length == sz, s"fixed($sz) got ${b.length}"); out.writeRaw(b)
    case (AArray(it), xs: Seq[_]) =>
      if (xs.nonEmpty) { out.writeVarint(xs.size.toLong); xs.foreach(encode(it, _, out)) }
      out.writeVarint(0L)
    case (AMap(vt), m: Map[_, _]) =>
      if (m.nonEmpty) {
        out.writeVarint(m.size.toLong)
        m.foreach { case (k, x) => out.writeString(k.toString); encode(vt, x, out) }
      }
      out.writeVarint(0L)
    case (ARecord(_, fields), m: Map[_, _]) =>
      val mm = m.asInstanceOf[Map[String, Any]]
      fields.foreach { case (fn, ft) => encode(ft, mm.getOrElse(fn, null), out) }
    case (AOpt(inner, nullIdx), x) =>
      if (x == null) out.writeVarint(nullIdx.toLong)
      else { out.writeVarint((1 - nullIdx).toLong); encode(inner, x, out) }
    case (tt, x) =>
      throw new IllegalArgumentException(s"cannot encode $x (${if (x == null) "null" else x.getClass}) as $tt")
  }

  // ---- binary decoding -------------------------------------------------

  final class In(buf: Array[Byte], var pos: Int = 0) {
    def readByte(): Int = { val b = buf(pos) & 0xff; pos += 1; b }
    def readVarint(): Long = {
      var shift = 0; var acc = 0L; var b = readByte()
      while ((b & 0x80) != 0) { acc |= (b & 0x7fL) << shift; shift += 7; b = readByte() }
      acc |= (b & 0x7fL) << shift
      (acc >>> 1) ^ -(acc & 1) // un-zigzag
    }
    def readFixed(n: Int): Array[Byte] = {
      val a = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; a
    }
    def readLenBytes(): Array[Byte] = readFixed(readVarint().toInt)
    def readString(): String = new String(readLenBytes(), StandardCharsets.UTF_8)
    def atEnd: Boolean = pos >= buf.length
  }

  def decode(t: AType, in: In): Any = t match {
    case ANull => null
    case ABool => in.readByte() != 0
    case AInt => in.readVarint().toInt
    case ALong => in.readVarint()
    case AFloat =>
      java.lang.Float.intBitsToFloat(
        (0 until 4).map(i => in.readByte() << (8 * i)).reduce(_ | _))
    case ADouble =>
      java.lang.Double.longBitsToDouble(
        (0 until 8).map(i => (in.readByte().toLong & 0xff) << (8 * i)).reduce(_ | _))
    case ABytes => in.readLenBytes()
    case AString => in.readString()
    case AFixed(_, sz) => in.readFixed(sz)
    case AArray(it) =>
      val b = Seq.newBuilder[Any]
      var n = in.readVarint()
      while (n != 0) {
        if (n < 0) { in.readVarint(); n = -n } // block byte size present
        (0L until n).foreach(_ => b += decode(it, in))
        n = in.readVarint()
      }
      b.result()
    case AMap(vt) =>
      val b = Map.newBuilder[String, Any]
      var n = in.readVarint()
      while (n != 0) {
        if (n < 0) { in.readVarint(); n = -n }
        (0L until n).foreach(_ => b += (in.readString() -> decode(vt, in)))
        n = in.readVarint()
      }
      b.result()
    case ARecord(_, fields) =>
      fields.map { case (fn, ft) => fn -> decode(ft, in) }.toMap
    case AOpt(inner, nullIdx) =>
      if (in.readVarint().toInt == nullIdx) null else decode(inner, in)
  }

  // ---- object container files -----------------------------------------

  private val OcfMagic = Array[Byte]('O', 'b', 'j', 1)

  /** Deterministic sync marker: files with identical schema + metadata
   *  reuse one marker, so golden tests are byte-stable (any 16 bytes
   *  are spec-legal). */
  private def syncOf(schemaJson: String, meta: Map[String, String]): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5")
      .digest((schemaJson + meta.toSeq.sorted.mkString(","))
        .getBytes(StandardCharsets.UTF_8))

  /** One-block OCF with the null codec (Iceberg manifests are small:
   *  one manifest lists many files; the container needs no splitting). */
  def writeFile(schemaJson: String, meta: Map[String, String],
      records: Seq[Map[String, Any]]): Array[Byte] = {
    val t = parse(schemaJson)
    val out = new Out
    out.writeRaw(OcfMagic)
    val allMeta = meta ++ Map("avro.schema" -> schemaJson, "avro.codec" -> "null")
    out.writeVarint(allMeta.size.toLong)
    allMeta.toSeq.sortBy(_._1).foreach { case (k, v) =>
      out.writeString(k); out.writeBytes(v.getBytes(StandardCharsets.UTF_8))
    }
    out.writeVarint(0L)
    val sync = syncOf(schemaJson, meta)
    out.writeRaw(sync)
    if (records.nonEmpty) {
      val block = new Out
      records.foreach(r => encode(t, r, block))
      val payload = block.toBytes
      out.writeVarint(records.size.toLong)
      out.writeVarint(payload.length.toLong)
      out.writeRaw(payload)
      out.writeRaw(sync)
    }
    out.toBytes
  }

  final case class OcfFile(meta: Map[String, String],
      records: Seq[Map[String, Any]])

  def readFile(bytes: Array[Byte]): OcfFile = {
    val in = new In(bytes)
    require(java.util.Arrays.equals(in.readFixed(4), OcfMagic), "not an Avro OCF")
    val meta = Map.newBuilder[String, String]
    var n = in.readVarint()
    while (n != 0) {
      if (n < 0) { in.readVarint(); n = -n }
      (0L until n).foreach { _ =>
        meta += (in.readString() ->
          new String(in.readLenBytes(), StandardCharsets.UTF_8))
      }
      n = in.readVarint()
    }
    val m = meta.result()
    require(m.getOrElse("avro.codec", "null") == "null",
      s"unsupported codec ${m("avro.codec")}")
    val t = parse(m("avro.schema"))
    val sync = in.readFixed(16)
    val recs = Seq.newBuilder[Map[String, Any]]
    while (!in.atEnd) {
      val count = in.readVarint()
      val size = in.readVarint()
      val end = in.pos + size.toInt
      (0L until count).foreach(_ =>
        recs += decode(t, in).asInstanceOf[Map[String, Any]])
      require(in.pos == end, "block length mismatch")
      require(java.util.Arrays.equals(in.readFixed(16), sync), "sync mismatch")
    }
    OcfFile(m, recs.result())
  }
}
