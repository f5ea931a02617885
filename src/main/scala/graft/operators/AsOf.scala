package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for each left row, attach the most recent right row (same
 * key) with right.ts <= left.ts — the canonical time-series/CDC lookup
 * that Spark has no built-in operator for.
 *
 * Implementation is the union-and-carry-forward plan rather than a
 * per-key join: tag both sides, union them, and run one window pass
 * per key ordered by (ts, side) where `last(right_payload, ignoreNulls)`
 * carries the latest right row forward onto left rows. One shuffle on
 * the key, no range explosion, skew-bounded by the largest single key —
 * this is how the plan survives 100 TB (a naive range join is
 * quadratic per key).
 */
object AsOf {

  /**
   * @param left      probe side
   * @param right     reference side (its `payloadCols` are carried)
   * @param keyCols   equi-join keys
   * @param leftTs    event-time column on the left
   * @param rightTs   event-time column on the right
   * @param payloadCols right columns to attach (renamed as given)
   */
  def joinBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String,
      payloadCols: Map[String, String]): DataFrame = {
    val lCols = left.columns.toSeq
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1)) // left sorts after right at equal ts
      .withColumn("_pl", lit(null).cast("string"))
    // pack right payload into a struct so one last() carries everything
    val rStruct = struct(payloadCols.keys.toSeq.map(col): _*)
    val r = right
      .select(keyCols.map(col) :+ col(rightTs).as("_ts") :+
        rStruct.as("_rpay"): _*)
      .withColumn("_side", lit(0))
    val lNorm = l.select(
      (keyCols.map(col) :+ col("_ts") :+ col("_side") :+
        lit(null).cast(r.schema("_rpay").dataType).as("_rpay")) ++
        lCols.filterNot(keyCols.contains).map(col): _*)
    val rNorm = r.select(
      (keyCols.map(col) :+ col("_ts") :+ col("_side") :+ col("_rpay")) ++
        lCols.filterNot(keyCols.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lNorm.unionByName(rNorm)
      .withColumn("_carry", last(col("_rpay"), ignoreNulls = true).over(w))
    carried.where(col("_side") === 1)
      .select(lCols.map(col) ++ payloadCols.map { case (src, out) =>
        col(s"_carry.$src").as(out)
      }: _*)
  }

  /**
   * Interval (range-containment) join WITHOUT an equi key: every point
   * row is matched to every interval with start <= ts < end. Spark's
   * only native plan for this predicate is BroadcastNestedLoopJoin —
   * O(points × intervals) comparisons, a scale-killer the moment the
   * interval side outgrows a broadcast.
   *
   * Bucketization turns it into an equi-join: time is cut into
   * `binWidth` bins, each interval is exploded to the bins it covers,
   * each point carries its single bin, and the join runs on the bin id
   * with the exact containment predicate applied AFTER the hash match.
   * A point's bin is unique, so a (point, interval) pair can only meet
   * in one bin — no post-join dedup is needed.
   *
   * Cost: shuffle(points) + shuffle(intervals × bins-per-interval),
   * both on the bin key — fully parallel, AQE-skew-splittable. Choose
   * `binWidth` ≈ the typical interval length: each interval then
   * explodes into ≤ 2 bins, and each bin's candidate set is local in
   * time. (A pathologically long interval explodes into
   * length/binWidth rows — still output-proportional work, never
   * quadratic.)
   *
   * Both timestamp columns and `binWidth` must share one unit (e.g.
   * µs). Intervals are half-open [start, end); empty intervals are
   * dropped.
   */
  def intervalJoin(points: DataFrame, pointTs: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // integer DIV, not floor(double /): timestamps in µs exceed the
    // range where double division is exact at the bin boundary
    val binned = intervals.where(col(endCol) > col(startCol))
      .withColumn("_bin", explode(sequence(
        expr(s"$startCol DIV ${binWidth}L"),
        expr(s"($endCol - 1) DIV ${binWidth}L"))))
    points.withColumn("_bin", expr(s"$pointTs DIV ${binWidth}L"))
      .join(binned, Seq("_bin"))
      .where(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("_bin")
  }
}
