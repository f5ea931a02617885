package graft.observability

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLongArray, LongAdder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/**
 * Per-table operation metrics — the Spark-side re-expression of the
 * reference's observability module (`src/moonlink/src/observability/`):
 * latency histograms with FIXED explicit boundaries labeled by table id
 * (`snapshot_creation.rs:17-24` builds an OTEL u64 histogram with
 * boundaries [50,100,200,300,400,500] ms; `iceberg_persistence.rs` and
 * `iceberg_table_recovery.rs` do the same for persistence and recovery)
 * plus monotonic operation counters, all exported through OTLP.
 *
 * The reference pushes through the opentelemetry SDK; with no OTEL jar
 * in this environment the registry keeps the same data model in plain
 * concurrent primitives (LongAdder counters, AtomicLongArray buckets —
 * lock-free, nanoseconds per record, safe on the single-writer ingest
 * path) and EXPORTS the standard OTLP-JSON `resourceMetrics` payload.
 * That payload is exactly what the engine's own OTEL ingest (S6,
 * `sources/OtelIngest`) parses, so the monitoring loop closes in-engine:
 * a table's operational metrics can be ingested into a graft table and
 * queried with SQL like any other metric stream.
 *
 * Scale note: cardinality is #tables x #metric-names on the DRIVER
 * only (executors never touch the registry); a 10k-table warehouse is
 * ~100k LongAdders. Latency recording happens around whole Spark jobs
 * (flush, publish, recovery), never per row.
 */
object Metrics {

  /** reference `snapshot_creation.rs:22` boundaries (milliseconds) */
  val DefaultBoundariesMs: Seq[Double] = Seq(50, 100, 200, 300, 400, 500)

  final class Histo(val boundariesMs: Seq[Double]) {
    // bucket i counts values <= boundaries(i); last slot = overflow
    private val buckets = new AtomicLongArray(boundariesMs.size + 1)
    val count = new LongAdder
    val sumMs = new LongAdder
    @volatile private[Metrics] var minMs = Long.MaxValue
    @volatile private[Metrics] var maxMs = Long.MinValue

    private[Metrics] def record(ms: Long): Unit = {
      val i = boundariesMs.indexWhere(ms <= _) match {
        case -1 => boundariesMs.size
        case n  => n
      }
      buckets.incrementAndGet(i)
      count.increment(); sumMs.add(ms)
      // min/max are advisory (racy under concurrent record, exact under
      // the single-writer-per-table contract every caller holds)
      if (ms < minMs) minMs = ms
      if (ms > maxMs) maxMs = ms
    }
    def bucketCounts: Seq[Long] =
      (0 to boundariesMs.size).map(buckets.get)
    def min: Long = minMs
    def max: Long = maxMs
  }

  private val counters = new ConcurrentHashMap[(String, String), LongAdder]()
  private val histos = new ConcurrentHashMap[(String, String), Histo]()

  def counter(metric: String, tableId: String, n: Long = 1L): Unit =
    counters.computeIfAbsent((metric, tableId), _ => new LongAdder).add(n)

  def recordMs(metric: String, tableId: String, ms: Long,
      boundaries: Seq[Double] = DefaultBoundariesMs): Unit =
    histos.computeIfAbsent((metric, tableId), _ => new Histo(boundaries))
      .record(ms)

  /** The `LatencyGuard` analogue (`latency_guard.rs:14-32` is RAII;
   *  the loan pattern is the Scala idiom for the same contract —
   *  latency records even when `f` throws). */
  def time[A](metric: String, tableId: String)(f: => A): A = {
    val t0 = System.nanoTime()
    try f
    finally recordMs(metric, tableId, (System.nanoTime() - t0) / 1000000L)
  }

  def counterValue(metric: String, tableId: String): Long =
    Option(counters.get((metric, tableId))).map(_.sum()).getOrElse(0L)

  def histogram(metric: String, tableId: String): Option[Histo] =
    Option(histos.get((metric, tableId)))

  /** Tests / long-lived benches: drop all recorded series. */
  def reset(): Unit = { counters.clear(); histos.clear() }

  // ---- export ---------------------------------------------------------

  private def esc(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def attr(tableId: String): String =
    s"""{"key":"graft.table_id","value":{"stringValue":"${esc(tableId)}"}}"""

  /** One OTLP-JSON `resourceMetrics` payload: counters as monotonic
   *  cumulative sums, latency histograms as explicit-bounds histogram
   *  points — the shape `OtelIngest.metricsToRows` parses and the
   *  reference's OTLP exporter emits. `timeUnixNano` is caller-supplied
   *  so exports stay deterministic for testing. */
  def toOtlpJson(timeUnixNano: Long): String = {
    val sums = counters.asScala.toSeq.sortBy(_._1).map {
      case ((metric, tableId), v) =>
        s"""{"name":"${esc(metric)}","sum":{"isMonotonic":true,
           |"aggregationTemporality":2,"dataPoints":[{"asInt":"${v.sum()}",
           |"timeUnixNano":"$timeUnixNano",
           |"attributes":[${attr(tableId)}]}]}}""".stripMargin.replace("\n", "")
    }
    val hists = histos.asScala.toSeq.sortBy(_._1).map {
      case ((metric, tableId), h) =>
        val bounds = h.boundariesMs.mkString(",")
        val counts = h.bucketCounts.map(c => s""""$c"""").mkString(",")
        s"""{"name":"${esc(metric)}","unit":"ms","histogram":{
           |"aggregationTemporality":2,"dataPoints":[{
           |"count":"${h.count.sum()}","sum":${h.sumMs.sum().toDouble},
           |"min":${h.min.toDouble},"max":${h.max.toDouble},
           |"explicitBounds":[$bounds],"bucketCounts":[$counts],
           |"timeUnixNano":"$timeUnixNano",
           |"attributes":[${attr(tableId)}]}]}}""".stripMargin.replace("\n", "")
    }
    s"""{"resourceMetrics":[{"scopeMetrics":[{
       |"scope":{"name":"graft"},
       |"metrics":[${(sums ++ hists).mkString(",")}]}]}]}"""
      .stripMargin.replace("\n", "")
  }

  private val dfSchema = StructType(Seq(
    StructField("metric", StringType, nullable = false),
    StructField("table_id", StringType, nullable = false),
    StructField("kind", StringType, nullable = false), // counter|histogram
    StructField("value", LongType),       // counter sum / histogram count
    StructField("sum_ms", LongType),
    StructField("min_ms", LongType),
    StructField("max_ms", LongType),
    StructField("bucket_counts", ArrayType(LongType)),
    StructField("explicit_bounds_ms", ArrayType(DoubleType))))

  /** The registry as a queryable DataFrame (driver-side rows — the
   *  registry is small by construction). */
  def toDF(spark: SparkSession): DataFrame = {
    val cRows = counters.asScala.toSeq.sortBy(_._1).map {
      case ((m, t), v) =>
        Row(m, t, "counter", v.sum(), null, null, null, null, null)
    }
    val hRows = histos.asScala.toSeq.sortBy(_._1).map {
      case ((m, t), h) =>
        Row(m, t, "histogram", h.count.sum(), h.sumMs.sum(), h.min, h.max,
          h.bucketCounts, h.boundariesMs)
    }
    spark.createDataFrame((cRows ++ hRows).asJava, dfSchema)
  }
}
