package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines, all expressed as
 * declarative DataFrame plans (Catalyst optimizes; everything shuffles
 * on explicit keys and scales horizontally):
 *
 *  - exact dedup: hash-groupBy on a normalized fingerprint;
 *  - n-gram Jaccard near-dup: token-set similarity self-join with a
 *    blocking key to bound the candidate space;
 *  - MinHash + LSH near-dup: shingle -> minhash signature -> band ->
 *    bucket join -> exact-Jaccard verification (the scale path: only
 *    colliding bands ever join);
 *  - SimHash near-dup: 64-bit fingerprint + Hamming-ball self-join.
 */
object Dedup {

  /** Exact dedup: one representative (min id) per normalized-text
   *  fingerprint. Map-side partial aggregation; single shuffle on the
   *  16-byte fingerprint, never on the document text. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextOps.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Distinct word n-gram shingles of the normalized text. */
  def shingles(c: Column, n: Int): Column = {
    val toks = TextOps.tokens(TextOps.normalize(c))
    if (n == 1) array_distinct(toks)
    else array_distinct(
      when(size(toks) < n, array())
        .otherwise(transform(
          sequence(lit(0), size(toks) - lit(n)),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** Jaccard similarity of two array columns, in exact integer
   *  milli-units: (1000 * |A∩B|) div |A∪B| — engine-portable. */
  def jaccardMilli(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("long")
    // |A∪B| = |A|+|B|-|A∩B| (inputs are distinct-element arrays) —
    // avoids array_union and is the formula the SQL oracle mirrors
    val uni = size(a).cast("long") + size(b).cast("long") - inter
    // floor((1000*i)/u) == (1000*i)//u: consecutive values of the
    // rational are >= 1000/u apart, far beyond double rounding error
    when(uni === 0, lit(0L))
      .otherwise(floor(lit(1000L) * inter / uni).cast("long"))
  }

  /**
   * Exact n-gram Jaccard near-dup pairs >= `minMilli`, blocked by
   * `blockCol` (pairs are only compared within a block — at 100 TB the
   * blocking key is what keeps the self-join from being quadratic; use
   * a coarse cluster id, source, or LSH band as the block).
   */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, n: Int, minMilli: Int): DataFrame = {
    val t = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
      shingles(col(textCol), n).as("sh"))
    val a = t.select(col("blk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = t.select(col("blk"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("blk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccardMilli(col("sh_a"), col("sh_b")).as("jaccard_milli"))
      .where(col("jaccard_milli") >= minMilli)
  }

  /** MinHash signature: `numHashes` min-values over salted xxhash64 of
   *  the shingle set (codegen'd; no UDF). */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { h =>
      array_min(transform(shingleCol, s => xxhash64(s, lit(h))))
    }: _*)

  /**
   * MinHash+LSH near-duplicate pairs: signatures are cut into `bands`
   * bands of `numHashes/bands` rows; docs colliding in any band become
   * candidates; candidates are verified with exact Jaccard on the
   * shingle sets. Only band-bucket collisions are ever joined —
   * `explode` + shuffle on (band, bucketHash), the standard
   * sub-quadratic LSH plan.
   */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
      minMilli: Int = 500): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val t = df.select(col(idCol).as("id"),
      shingles(col(textCol), shingleN).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    val banded = t.select(col("id"), col("sh"),
      posexplode(array((0 until bands).map(b =>
        hash(slice(col("sig"), b * rows + 1, rows), lit(b))): _*))
        .as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct() // a pair may collide in several bands
      .select(col("id_a"), col("id_b"),
        jaccardMilli(col("sh_a"), col("sh_b")).as("jaccard_milli"))
      .where(col("jaccard_milli") >= minMilli)
  }

  /**
   * SimHash near-dup: docs whose 64-bit simhash fingerprints are within
   * `maxHamming` bits. Blocked on the top `blockBits` bits of the
   * fingerprint (near-identical docs share the prefix with high
   * probability; a production variant unions several bit-rotations).
   */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, blockBits: Int = 16): DataFrame = {
    val t = df.select(col(idCol).as("id"),
      TextOps.simhash64(col(textCol)).as("sim"))
      .withColumn("blk", shiftrightunsigned(col("sim"), 64 - blockBits))
    val a = t.select(col("blk"), col("id").as("id_a"), col("sim").as("sim_a"))
    val b = t.select(col("blk"), col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("blk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        TextOps.hamming64(col("sim_a"), col("sim_b")).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Embedding cosine near-dup pairs >= `minCosineMilli` (brute force
   *  within a blocking column; see Similarity.lshBuckets for the scale
   *  path producing the blocks). */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
      blockCol: Column, minCosineMilli: Int): DataFrame = {
    // cosine(a,b) = dot/(|a||b|) computed directly (not on pre-normalized
    // vectors) so an oracle using the same formula agrees bit-for-bit
    val t = df.select(blockCol.as("blk"), col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val a = t.select(col("blk"), col("id").as("id_a"), col("v").as("v_a"))
    val b = t.select(col("blk"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("blk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Similarity.cosine(col("v_a"), col("v_b")) * 1000).cast("long")
          .as("cosine_milli"))
      .where(col("cosine_milli") >= minCosineMilli)
  }

  /** Keep the first row per key by an ordering column (CDC-style
   *  "latest wins" dedup used widely in pipelines). */
  def latestPerKey(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol).desc)
    df.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
  }
}
