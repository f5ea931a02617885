package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

/**
 * The scan-state blob of the RPC scan protocol (S12): the byte layout
 * `scan_table_begin` hands to readers, reproduced exactly from the
 * reference's hand-written flat encoding
 * (`moonlink_table_metadata/src/table_metadata.rs:30-95`, consumed via
 * `union_read/read_state.rs:107-114`):
 *
 *   u32 n_data_files, u32 path_offsets[n+1]   (cumulative byte offsets)
 *   u32 n_puffin_files, u32 path_offsets[n+1]
 *   u32 n_deletion_vectors,
 *     { u32 data_file_number, u32 puffin_file_number,
 *       u32 offset, u32 size } *                (sorted by file number)
 *   u32 n_position_deletes,
 *     { u32 data_file_number, u32 row_number } *          (sorted)
 *   data-file path bytes, puffin path bytes     (concatenated UTF-8)
 *
 * All u32s little-endian (the reference writes native-endian on x86).
 * Offsets-first layout exists so a zero-copy reader can treat the
 * offset tables as `uint32_t*` — we preserve it byte-for-byte.
 *
 * In graft, "puffin files" are the GDV1 roaring sidecars and each
 * deletion-vector entry's (offset, size) addresses one file's bitmap
 * blob WITHIN its sidecar ([[graft.format.DvSidecar]] layout). A data
 * file may carry several entries (one per DV delta sidecar) — readers
 * union them; the reference's ordering assert (`assert_ge`) permits
 * equal file numbers. Position deletes carry deletes not yet folded
 * into a sidecar; graft persists DVs at publish, so the server emits
 * them only for residual in-memory deletes (none on the committed
 * path) — the codec carries them for protocol completeness.
 */
object ScanState {

  final case class DvRef(dataFileNumber: Int, puffinFileNumber: Int,
      offset: Int, size: Int)
  final case class PositionDelete(dataFileNumber: Int, rowNumber: Int)

  final case class State(
      dataFiles: Seq[String],
      puffinFiles: Seq[String],
      deletionVectors: Seq[DvRef],
      positionDeletes: Seq[PositionDelete])

  def encode(s: State): Array[Byte] = {
    val dvs = s.deletionVectors.sortBy(d =>
      (d.dataFileNumber, d.puffinFileNumber, d.offset, d.size))
    val pds = s.positionDeletes.sortBy(p => (p.dataFileNumber, p.rowNumber))
    val bos = new ByteArrayOutputStream()
    def u32(v: Int): Unit = {
      val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(v); bos.write(b.array(), 0, 4)
    }
    def offsets(paths: Seq[String]): Unit = {
      u32(paths.length)
      var off = 0
      paths.foreach { p => u32(off); off += p.getBytes(UTF_8).length }
      u32(off)
    }
    offsets(s.dataFiles)
    offsets(s.puffinFiles)
    u32(dvs.length)
    dvs.foreach { d =>
      u32(d.dataFileNumber); u32(d.puffinFileNumber)
      u32(d.offset); u32(d.size)
    }
    u32(pds.length)
    pds.foreach { p => u32(p.dataFileNumber); u32(p.rowNumber) }
    s.dataFiles.foreach(p => bos.write(p.getBytes(UTF_8)))
    s.puffinFiles.foreach(p => bos.write(p.getBytes(UTF_8)))
    bos.toByteArray
  }

  def decode(bytes: Array[Byte]): State = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def u32(): Int = b.getInt()
    def offsets(): Array[Int] = {
      val n = u32()
      Array.fill(n + 1)(u32())
    }
    val dataOffsets = offsets()
    val puffinOffsets = offsets()
    val dvs = Seq.fill(u32())(DvRef(u32(), u32(), u32(), u32()))
    val pds = Seq.fill(u32())(PositionDelete(u32(), u32()))
    def paths(offs: Array[Int]): Seq[String] = {
      (0 until offs.length - 1).map { i =>
        val len = offs(i + 1) - offs(i)
        val arr = new Array[Byte](len)
        b.get(arr)
        new String(arr, UTF_8)
      }
    }
    val dataFiles = paths(dataOffsets)
    val puffinFiles = paths(puffinOffsets)
    State(dataFiles, puffinFiles, dvs, pds)
  }
}
