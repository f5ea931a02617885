package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distinct-count estimation via the K-minimum-values sketch
 *  (Bar-Yossef et al., RANDOM 2002): hash every value to [0, 2^31),
 *  keep the k smallest DISTINCT hashes; if the k-th smallest is h_k,
 *  the hashes are ~uniform so distinct ≈ (k-1) * 2^31 / h_k.
 *
 *  Engine-portable by construction: the hash is a multiplicative Weyl
 *  map (x * 2654435761 mod 2^31 — Knuth's 32-bit golden-ratio
 *  constant) and the estimate uses exact BIGINT division, so DuckDB
 *  recomputes the IDENTICAL sketch from the same rows (no
 *  xxhash64/SQL-engine hash mismatch) and the oracle verifies the
 *  whole sketch, not just its error band.
 *
 *  Scale shape: a k-capped heap per partition pre-thins the stream to
 *  ≤ P×k candidate hashes before the only shuffle — the global k
 *  smallest distinct hashes are a subset of the union of per-partition
 *  k smallest distinct hashes, so the thin is exact, never lossy. The
 *  full distinct set (what exact countDistinct shuffles) never
 *  travels. */
object Sketches {

  val WeylA = 2654435761L  // floor(2^32 / golden ratio), odd
  val HashMod = 2147483648L // 2^31

  /** (exact_distinct, est_distinct) over `column` of `df` — the exact
   *  count rides along (its own scan) so the result documents the
   *  estimate's quality; production callers at 100 TB would keep only
   *  the sketch half. `column` must be integral and non-negative. */
  def kmvDistinct(df: DataFrame, column: Column, k: Int): DataFrame = {
    import df.sparkSession.implicits._
    val kk = k
    val hashes = df.select(
      pmod(column.cast("long") * lit(WeylA), lit(HashMod)).as("hv")).as[Long]
    // per-partition exact pre-thin: k smallest distinct hashes survive
    val thinned = hashes.mapPartitions { it =>
      val set = new java.util.TreeSet[java.lang.Long]()
      it.foreach { h =>
        if (set.size < kk) set.add(h)
        else if (h < set.last) { set.add(h); if (set.size > kk) set.pollLast() }
      }
      import scala.jdk.CollectionConverters._
      set.iterator().asScala.map(_.longValue())
    }.toDF("hv")
    val topk = thinned.distinct().orderBy("hv").limit(k)
    val est = topk.agg(count(lit(1)).as("n"), max(col("hv")).as("hk"))
      .select(when(col("n") < kk, col("n"))
        .otherwise(expr(s"${(kk - 1).toLong * HashMod}L div hk"))
        .cast("long").as("est_distinct"))
    val exact = df.agg(
      countDistinct(column).cast("long").as("exact_distinct"))
    exact.crossJoin(est).select(col("exact_distinct"), col("est_distinct"))
  }

  /** The portable hash as a column (shared by both KMV forms). */
  def portableHash(c: Column): Column =
    pmod(c.cast("long") * lit(WeylA), lit(HashMod))

  /** Per-GROUP distinct estimation: the KMV sketch as a typed
   *  `Aggregator` usable inside any groupBy — the mergeable-sketch
   *  form (buffer = sorted array of ≤k distinct hashes, merge = sorted
   *  dedup-merge truncated at k) that partial aggregation combines
   *  map-side, so each group ships O(k) longs per partition instead of
   *  its distinct set. Same estimate function as kmvDistinct, so the
   *  oracle recomputes it per group with a rank window. */
  final class KmvAggregator(k: Int)
      extends Aggregator[Long, Array[Long], Long] {
    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(b: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(b, h)
      if (pos >= 0) b // duplicate hash
      else {
        val ins = -pos - 1
        if (b.length >= k && ins >= k) b // not among the k smallest
        else {
          val n = math.min(b.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(b, 0, out, 0, math.min(ins, n))
          if (ins < n) {
            out(ins) = h
            System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
          }
          out
        }
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val cap = math.min(a.length + b.length, k)
      val out = new Array[Long](cap)
      var i = 0; var j = 0; var o = 0
      var last = Long.MinValue; var first = true
      while (o < cap && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) {
            val x = a(i); i += 1; x
          } else { val x = b(j); j += 1; x }
        if (first || v != last) { out(o) = v; o += 1; last = v; first = false }
      }
      if (o == cap) out else java.util.Arrays.copyOf(out, o)
    }

    override def finish(r: Array[Long]): Long =
      if (r.length < k) r.length.toLong
      else (k - 1).toLong * HashMod / r(r.length - 1)

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** `kmvEstimate(k)(portableHash(col))` inside any `.agg(...)`. */
  def kmvEstimate(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new KmvAggregator(k), Encoders.scalaLong)
}
