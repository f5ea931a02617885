package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
