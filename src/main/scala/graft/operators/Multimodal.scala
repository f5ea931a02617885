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

  /**
   * Content-addressed exact dedup of raw media: group by payload
   * digest, keep the lowest id as the canonical copy. The standard
   * first pass over a crawled media corpus — at 100 TB the shuffle
   * carries (digest, id) pairs only (64+8 bytes/row), never payloads,
   * because the digest computes in place during the scan.
   */
  def contentDedup(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
        sha2(col(binCol), 256).as("digest"))
      .groupBy(col("digest"))
      .agg(min(col("media_id")).as("keep_id"),
        count(lit(1)).as("n_copies"))

  /**
   * Overlapping byte windows — the audio window/hop shape (a real
   * pipeline windows PCM samples; the byte-window stub keeps the
   * identical plumbing): window w covers bytes [w*hop, w*hop+win).
   * Same zero-shuffle explode scaling as text chunking: per-row
   * flatMap, output bounded by ceil(bytes/hop) windows per payload,
   * payload bytes sliced in place.
   */
  def byteWindows(df: DataFrame, idCol: String, binCol: String,
      winBytes: Int, hopBytes: Int): DataFrame = {
    require(hopBytes > 0 && winBytes >= hopBytes,
      s"need 0 < hop <= win, got win=$winBytes hop=$hopBytes")
    df.select(col(idCol).cast("long").as("media_id"), col(binCol).as("media"))
      .where(length(col("media")) > 0)
      .withColumn("_n", length(col("media")))
      .withColumn("win_id",
        explode(expr(s"sequence(0, (_n - 1) DIV $hopBytes)")))
      .select(col("media_id"), col("win_id").cast("long").as("win_id"),
        substr(col("media"), col("win_id") * hopBytes + 1, lit(winBytes))
          .as("win"))
  }

  /**
   * Contrastive image-text pair construction with deterministic
   * negative sampling: each media id pairs with its own caption
   * (label 1) and `negatives` pseudo-random other captions (label 0)
   * picked by a fixed multiplicative hash over a dense id space — no
   * RNG state, so re-runs and retries produce identical training
   * pairs (a requirement for reproducible data builds). The negatives
   * join is id-equi against the caption table: one shuffle keyed by
   * doc id, never a cross join.
   */
  def contrastivePairs(media: DataFrame, mediaIdCol: String,
      captions: DataFrame, capIdCol: String, capCol: String,
      nIds: Long, negatives: Int): DataFrame = {
    val m = media.select(col(mediaIdCol).cast("long").as("media_id"))
    val cap = captions.select(col(capIdCol).cast("long").as("cap_id"),
      col(capCol).as("caption"))
    val pos = m.select(col("media_id"), col("media_id").as("cap_id"),
      lit(1).as("label"), lit(0).as("pair_no"))
    val neg = m.select(col("media_id"),
        explode(expr(s"sequence(1, $negatives)")).as("pair_no"))
      .withColumn("cap_id",
        (col("media_id") * lit(2654435761L) + col("pair_no") * lit(40503L))
          % lit(nIds))
      // a negative that collides with the positive shifts by one slot
      .withColumn("cap_id",
        when(col("cap_id") === col("media_id"),
          (col("cap_id") + 1) % lit(nIds)).otherwise(col("cap_id")))
      .withColumn("label", lit(0))
      .select(col("media_id"), col("cap_id"), col("label"), col("pair_no"))
    pos.unionByName(neg)
      .join(cap, "cap_id")
      .select(col("media_id"), col("cap_id"), col("label"), col("pair_no"),
        col("caption"))
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
