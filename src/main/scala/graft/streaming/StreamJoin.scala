package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Watermarked stream-stream joins — the Structured Streaming surface a
 * real-time event pipeline needs beyond per-key state: correlate two
 * live streams (click→purchase attribution, impression→conversion,
 * request→response pairing) without ever materializing either side.
 *
 * Both sides carry an event-time watermark, and the time-bound lives
 * IN the join condition — that pair is what lets Spark evict join
 * state: a left row older than `watermark - maxSpan` can never match a
 * future right row, so per-key state is bounded by the time window
 * times the arrival rate, not by stream length. Without the interval
 * condition an inner stream-stream join buffers both streams forever —
 * the difference between a deployable operator and an OOM at day two.
 *
 * Scale: the join shuffles both streams on the key exactly like a
 * batch shuffle join; state lives in the per-partition store
 * (RocksDB-backed on a cluster) and is keyed by the equi-key, so skew
 * and locality behave like any keyed stream op.
 */
object StreamJoin {

  /**
   * Inner join of two streams on an equi-key plus a forward time
   * interval: emits (l, r) where keys match and
   * `r.ts ∈ [l.ts, l.ts + maxSpan)`.
   *
   * @param left     streaming frame; its event-time column `leftTs`
   * @param right    streaming frame; event-time `rightTs` (must differ
   *                 from `leftTs`; all non-key columns must be
   *                 disjoint between the sides)
   * @param keyCol   equi-join key present on both sides
   * @param maxSpan  calendar interval string, e.g. "4 hours"
   * @param delay    watermark delay for both sides, e.g. "1 hour"
   */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String,
      maxSpan: String, delay: String): DataFrame = {
    require(leftTs != rightTs, "event-time columns must be named apart")
    val l = left.withWatermark(leftTs, delay)
    val r = right.withColumnRenamed(keyCol, "_rkey")
      .withWatermark(rightTs, delay)
    val cond: Column = l(keyCol) === r("_rkey") &&
      col(rightTs) >= col(leftTs) &&
      col(rightTs) < col(leftTs) + expr(s"INTERVAL $maxSpan")
    l.join(r, cond, "inner").drop("_rkey")
  }
}
