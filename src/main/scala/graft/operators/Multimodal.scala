package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video payloads modeled as
 * opaque `binary` columns with typed metadata, processed in batched
 * partition iterators (`mapPartitions` over a typed Dataset — the
 * JVM analogue of arrow-batched pandas UDFs). The Spark-side plumbing
 * (schema, batching, partitioning, output shape) is real; the codec
 * itself is a clearly-marked deterministic STUB because no image/audio
 * libraries exist in this environment.
 */
object Multimodal {

  /** canonical media-table schema */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("mime", StringType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  final case class MediaIn(media_id: Long, media: Array[Byte], mime: String)
  final case class MediaFeature(media_id: Long, n_bytes: Long,
      checksum: Long, feature: Array[Double])

  /**
   * ==== STUB DECODER ====
   * A real deployment decodes the payload (JPEG/PNG/WAV/MP4 frames)
   * here with a native codec. This stand-in is deterministic on the
   * bytes so tests and oracles are stable:
   *   - n_bytes  = payload length (feature[0] = n_bytes mod 251);
   *   - checksum = sum of unsigned byte values;
   *   - feature[j>0] = sum of bytes at positions ≡ j (mod dim), mod 1009.
   */
  def decodeStub(bytes: Array[Byte], dim: Int): (Long, Array[Double]) = {
    var checksum = 0L
    val acc = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      checksum += b
      acc(i % dim) += b
      i += 1
    }
    val feat = new Array[Double](dim)
    feat(0) = (bytes.length % 251).toDouble
    var j = 1
    while (j < dim) { feat(j) = (acc(j) % 1009).toDouble; j += 1 }
    (checksum, feat)
  }

  /**
   * Batched feature extraction: one partition = one iterator, codec
   * state initialized once per partition (exactly where a real decoder
   * would load its native context). Narrow transformation — no shuffle;
   * scale by repartitioning the input on media_id ranges.
   */
  def featurize(df: DataFrame, idCol: String, binCol: String,
      dim: Int = 8): Dataset[MediaFeature] = {
    implicit val enc = Encoders.product[MediaFeature]
    df.select(col(idCol).cast("long").as("media_id"),
        col(binCol).as("media"),
        lit("application/octet-stream").as("mime"))
      .as(Encoders.product[MediaIn])
      .mapPartitions { it =>
        // per-partition codec init would go here (native lib handle)
        it.map { m =>
          val bytes = if (m.media == null) Array.empty[Byte] else m.media
          val (checksum, feat) = decodeStub(bytes, dim)
          MediaFeature(m.media_id, bytes.length.toLong, checksum, feat)
        }
      }
  }

  /** Frame/sample selector stub: pick every `stride`-th byte-window as
   *  a "frame" — the partition/batch shape of real video frame
   *  sampling, with a stub extractor. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int, stride: Int): DataFrame = {
    val frames = udf((bytes: Array[Byte]) => {
      if (bytes == null) Seq.empty[Array[Byte]]
      else bytes.grouped(frameBytes).zipWithIndex
        .collect { case (b, i) if i % stride == 0 => b }.toSeq
    })
    df.select(col(idCol), posexplode(frames(col(binCol))).as(Seq("frame_no", "frame")))
  }
}
