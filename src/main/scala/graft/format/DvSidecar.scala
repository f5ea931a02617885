package graft.format

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import org.roaringbitmap.longlong.Roaring64Bitmap

/**
 * Deletion-vector sidecar file: roaring-SERIALIZED bitmaps keyed by data
 * file name, written and read with plain (Hadoop-FS) IO — no Spark job.
 * This is the shape the reference persists DVs in (puffin blobs of
 * roaring bitmaps, `storage/table/iceberg/deletion_vector.rs:29`); the
 * previous parquet-of-(file,pos) sidecar cost a full Spark write job per
 * delete-carrying publish just to persist a few KB of positions.
 *
 * Layout: magic "GDV1", entry count, then per entry:
 *   utf8 name (len-prefixed), blob length, Roaring64Bitmap blob.
 */
object DvSidecar {
  private val Magic = 0x47445631 // "GDV1"

  def toBytes(entries: Seq[(String, Roaring64Bitmap)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(Magic)
    out.writeInt(entries.size)
    entries.foreach { case (name, bm) =>
      val nb = name.getBytes(StandardCharsets.UTF_8)
      out.writeInt(nb.length)
      out.write(nb)
      bm.runOptimize()
      val bmBos = new ByteArrayOutputStream()
      bm.serialize(new DataOutputStream(bmBos))
      val blob = bmBos.toByteArray
      out.writeInt(blob.length)
      out.write(blob)
    }
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): Seq[(String, Roaring64Bitmap)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    require(in.readInt() == Magic, "not a GDV1 deletion-vector sidecar")
    val n = in.readInt()
    (0 until n).map { _ =>
      val nb = new Array[Byte](in.readInt())
      in.readFully(nb)
      val blob = new Array[Byte](in.readInt())
      in.readFully(blob)
      val bm = new Roaring64Bitmap
      bm.deserialize(new DataInputStream(new java.io.ByteArrayInputStream(blob)))
      new String(nb, StandardCharsets.UTF_8) -> bm
    }
  }

  /** (data-file name, blob byte offset, blob size) per entry — the
   *  in-sidecar addresses the S12 scan protocol publishes as its
   *  deletion-vector refs, so a reader can fetch exactly one bitmap's
   *  byte range. */
  def blobRefs(bytes: Array[Byte]): Seq[(String, Int, Int)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    require(in.readInt() == Magic, "not a GDV1 deletion-vector sidecar")
    val n = in.readInt()
    var pos = 8
    (0 until n).map { _ =>
      val nameLen = in.readInt()
      val nb = new Array[Byte](nameLen)
      in.readFully(nb)
      val blobLen = in.readInt()
      in.skipBytes(blobLen)
      val off = pos + 4 + nameLen + 4
      pos = off + blobLen
      (new String(nb, StandardCharsets.UTF_8), off, blobLen)
    }
  }

  def write(path: String, entries: Seq[(String, Roaring64Bitmap)]): Unit =
    Fio.writeBytesAtomic(path, toBytes(entries))

  def read(path: String): Seq[(String, Roaring64Bitmap)] =
    fromBytes(Fio.readBytes(path))
}
