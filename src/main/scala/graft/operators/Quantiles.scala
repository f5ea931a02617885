package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/**
 * EXACT percentiles without a global sort — the scale answer to "what
 * is the p99 of a 100-TB column". A full `ORDER BY` is a total-order
 * shuffle of every row; approximate sketches (t-digest, GK) give up
 * exactness and oracle-checkability. This takes neither trade:
 *
 *  1. one scan: `(count, min, max)`;
 *  2. one scan: fixed-width histogram — `groupBy(bucket)` shuffles at
 *     most `buckets` CELLS (map-side combined), not rows;
 *  3. the cumulative histogram locates, per requested percentile, the
 *     single bucket holding the target rank — a driver computation
 *     over `buckets` longs;
 *  4. per percentile, a TakeOrdered (per-partition heaps + driver
 *     merge of `rankInBucket` rows) over JUST that bucket's rows —
 *     ~N/buckets of the data, filter pushed to the scan.
 *
 * Result: the exact k-th-smallest value (discrete quantile, the value
 * IS an element of the column — no interpolation, so the DuckDB
 * oracle's `ORDER BY x LIMIT 1 OFFSET k-1` reproduces it bit-for-bit).
 * Rank convention: k = max(1, N*percent/100) in integer arithmetic.
 *
 * Bucket boundaries are internal — any monotone bucketing yields the
 * same final answer because pass 4 re-ranks exactly within the bucket;
 * the histogram only has to be CONSISTENT between passes 2 and 4,
 * which it is by reusing one expression. Nulls are excluded (SQL
 * aggregate semantics).
 */
object Quantiles {

  def exactQuantiles(df: DataFrame, valueCol: String,
      percents: Seq[Int], buckets: Int = 4096): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100))
    val spark = df.sparkSession
    val vals = df.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull)
    val head = vals.agg(count(lit(1)), min(col("v")), max(col("v"))).head()
    val n = head.getLong(0)
    val out = StructType(Seq(StructField("percent", LongType),
      StructField("value", DoubleType)))
    if (n == 0)
      return spark.createDataFrame(new java.util.ArrayList[Row](), out)
    val (lo, hi) = (head.getDouble(1), head.getDouble(2))
    val ranks = percents.map(p => p -> math.max(1L, n * p / 100L))
    val result: Seq[(Int, Double)] =
      if (lo == hi) ranks.map { case (p, _) => p -> lo }
      else {
        val width = (hi - lo) / buckets
        def bucketOf = least(
          floor((col("v") - lit(lo)) / lit(width)).cast("int"),
          lit(buckets - 1))
        val histRows = vals.groupBy(bucketOf.as("b"))
          .agg(count(lit(1)).as("c")).collect()
        val hist = new Array[Long](buckets)
        histRows.foreach(r => hist(r.getInt(0)) = r.getLong(1))
        val cum = hist.scanLeft(0L)(_ + _) // cum(i) = rows below bucket i
        ranks.map { case (p, k) =>
          val b = cum.indexWhere(_ >= k) - 1 // first bucket reaching rank k
          val rankInBucket = (k - cum(b)).toInt
          val kth = vals.where(bucketOf === b)
            .orderBy(col("v")).limit(rankInBucket)
            .agg(max(col("v"))).head().getDouble(0)
          p -> kth
        }
      }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      result.map { case (p, v) => Row(p.toLong, v): Row }.asJava, out)
  }
}
