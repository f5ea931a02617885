package graft.format.iceberg

import com.fasterxml.jackson.databind.ObjectMapper
import org.roaringbitmap.longlong.Roaring64NavigableMap

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32

/**
 * Puffin container + `deletion-vector-v1` blobs — the PUBLIC Iceberg
 * puffin spec, matching what the reference persists for deletion
 * vectors (`iceberg/deletion_vector.rs:29` and `puffin_utils.rs`):
 *
 *  - container: magic `PFA1`, blobs back-to-back, then footer =
 *    magic | footer-payload JSON | payload length (4 B LE) |
 *    flags (4 B, bit0 = payload compressed — never set here) | magic.
 *  - footer payload: {"blobs":[{type, fields, snapshot-id,
 *    sequence-number, offset, length, properties}], "properties":{}}.
 *  - DV blob: combined length of magic+vector (4 B BE) | magic
 *    `D1 D3 39 64` | portable 64-bit roaring bitmap | CRC-32 of
 *    magic+vector (4 B BE). Properties carry `cardinality` and
 *    `referenced-data-file` like the reference requires
 *    (`deletion_vector.rs:22-26`).
 */
private[graft] object Puffin {

  private val Magic = Array[Byte](0x50, 0x46, 0x41, 0x31) // "PFA1"
  private val DvMagic = Array[Byte](0xD1.toByte, 0xD3.toByte, 0x39, 0x64)
  val DeletionVectorV1 = "deletion-vector-v1"
  /** Engine-extension blob carrying a key-index pointer (the
   *  reference ships its hash indexes as `mooncake-hash-index-v1`
   *  puffin blobs the same way, `iceberg/index.rs:20`); foreign
   *  readers skip unknown blob types per the puffin spec. */
  val GraftFileIndexV1 = "graft-file-index-v1"

  final case class BlobMeta(blobType: String, fields: Seq[Int],
      snapshotId: Long, sequenceNumber: Long, offset: Long, length: Long,
      properties: Map[String, String])

  // ---- deletion-vector blob payload -----------------------------------

  /** `len(magic+vector) BE | D1 D3 39 64 | portable roaring64 | crc32 BE` */
  def dvBlobBytes(bitmap: Roaring64NavigableMap): Array[Byte] = {
    val vec = new ByteArrayOutputStream()
    bitmap.serializePortable(new DataOutputStream(vec))
    val vecBytes = vec.toByteArray
    val out = new ByteArrayOutputStream()
    val d = new DataOutputStream(out)
    d.writeInt(DvMagic.length + vecBytes.length)
    d.write(DvMagic)
    d.write(vecBytes)
    val crc = new CRC32()
    crc.update(DvMagic)
    crc.update(vecBytes)
    d.writeInt(crc.getValue.toInt)
    out.toByteArray
  }

  def dvBlobParse(blob: Array[Byte]): Roaring64NavigableMap = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(blob))
    val combined = in.readInt()
    val magic = new Array[Byte](4); in.readFully(magic)
    require(java.util.Arrays.equals(magic, DvMagic), "bad DV magic")
    val vecBytes = new Array[Byte](combined - 4); in.readFully(vecBytes)
    val crcStored = in.readInt()
    val crc = new CRC32(); crc.update(magic); crc.update(vecBytes)
    require(crc.getValue.toInt == crcStored, "DV blob crc mismatch")
    val bm = new Roaring64NavigableMap()
    bm.deserializePortable(
      new DataInputStream(new java.io.ByteArrayInputStream(vecBytes)))
    bm
  }

  // ---- container -------------------------------------------------------

  /** Returns (file bytes, per-blob metadata with offsets/lengths). */
  def writeBytes(blobs: Seq[(Array[Byte], BlobMeta)]): (Array[Byte], Seq[BlobMeta]) = {
    val out = new ByteArrayOutputStream()
    out.write(Magic)
    var offset = Magic.length.toLong
    val placed = blobs.map { case (bytes, meta) =>
      out.write(bytes)
      val m = meta.copy(offset = offset, length = bytes.length.toLong)
      offset += bytes.length
      m
    }
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    val arr = root.putArray("blobs")
    placed.foreach { m =>
      val b = arr.addObject()
      b.put("type", m.blobType)
      val fs = b.putArray("fields"); m.fields.foreach(fs.add)
      b.put("snapshot-id", m.snapshotId)
      b.put("sequence-number", m.sequenceNumber)
      b.put("offset", m.offset)
      b.put("length", m.length)
      if (m.properties.nonEmpty) {
        val p = b.putObject("properties")
        m.properties.toSeq.sortBy(_._1).foreach { case (k, v) => p.put(k, v) }
      }
    }
    root.putObject("properties").put("created-by", "graft")
    val payload = mapper.writeValueAsBytes(root)
    out.write(Magic)
    out.write(payload)
    // payload size + flags, both 4-byte little-endian words
    def le32(v: Int): Unit =
      (0 until 4).foreach(i => out.write((v >>> (8 * i)) & 0xff))
    le32(payload.length)
    le32(0) // flags: payload not compressed
    out.write(Magic)
    (out.toByteArray, placed)
  }

  final case class PuffinFile(bytes: Array[Byte], blobs: Seq[BlobMeta]) {
    def blobBytes(m: BlobMeta): Array[Byte] =
      java.util.Arrays.copyOfRange(bytes, m.offset.toInt,
        (m.offset + m.length).toInt)
  }

  def readBytes(bytes: Array[Byte]): PuffinFile = {
    require(bytes.length >= 20 && bytes.startsWith(Magic), "not a puffin file")
    def le32(at: Int): Int =
      (0 until 4).map(i => (bytes(at + i) & 0xff) << (8 * i)).reduce(_ | _)
    require(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(bytes, bytes.length - 4, bytes.length),
      Magic), "bad trailing magic")
    val flags = le32(bytes.length - 8)
    require((flags & 1) == 0, "compressed footer payload unsupported")
    val payloadLen = le32(bytes.length - 12)
    val payloadStart = bytes.length - 12 - payloadLen
    require(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(bytes, payloadStart - 4, payloadStart),
      Magic), "bad footer magic")
    val node = new ObjectMapper().readTree(
      new String(bytes, payloadStart, payloadLen, StandardCharsets.UTF_8))
    val blobs = Seq.newBuilder[BlobMeta]
    node.get("blobs").elements().forEachRemaining { b =>
      val props = Map.newBuilder[String, String]
      if (b.hasNonNull("properties"))
        b.get("properties").fields().forEachRemaining(e =>
          props += (e.getKey -> e.getValue.asText))
      val fields = Seq.newBuilder[Int]
      if (b.hasNonNull("fields"))
        b.get("fields").elements().forEachRemaining(f => fields += f.asInt)
      blobs += BlobMeta(b.get("type").asText, fields.result(),
        b.get("snapshot-id").asLong, b.get("sequence-number").asLong,
        b.get("offset").asLong, b.get("length").asLong, props.result())
    }
    PuffinFile(bytes, blobs.result())
  }
}
