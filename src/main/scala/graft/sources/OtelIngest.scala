package graft.sources

import graft.streaming.CdcPipeline
import graft.table.GraftTable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * OTLP metrics → rows (S6, the conversion half): turns OTLP/HTTP JSON
 * `ExportMetricsServiceRequest` payloads into one wide row per metric
 * data point in `OtelSchema.schema` — the Spark-native re-expression
 * of the reference's protobuf walker
 * (`moonlink_service/src/otel/otel_to_moonlink_pb.rs`
 * `export_metrics_to_moonlink_rows`: resource → scope → metric →
 * gauge/sum/histogram data points; schema `otel_schema.rs:124-278`).
 *
 * Wire format: the OTLP JSON mapping is the protobuf JSON mapping, so
 * int64 fields (`timeUnixNano`, `asInt`, `count`, `bucketCounts`)
 * arrive as strings and are cast here. The whole conversion is
 * declarative (from_json + explode + transform) — it runs distributed
 * over a frame of payloads with no driver-side parsing, unlike the
 * reference's per-request service loop.
 */
object OtelIngest {

  private val jAttrValue = StructType(Seq(
    StructField("stringValue", StringType),
    StructField("boolValue", BooleanType),
    StructField("intValue", StringType), // proto3 JSON: int64 as string
    StructField("doubleValue", DoubleType)))

  private val jAttrs = ArrayType(StructType(Seq(
    StructField("key", StringType),
    StructField("value", jAttrValue))))

  // proto3 JSON: int64 as string, bytes as base64
  private val jExemplars = ArrayType(StructType(Seq(
    StructField("timeUnixNano", StringType),
    StructField("asDouble", DoubleType),
    StructField("asInt", StringType),
    StructField("traceId", StringType),
    StructField("spanId", StringType),
    StructField("filteredAttributes", jAttrs))))

  private val jNumberDp = StructType(Seq(
    StructField("startTimeUnixNano", StringType),
    StructField("timeUnixNano", StringType),
    StructField("asDouble", DoubleType),
    StructField("asInt", StringType),
    StructField("attributes", jAttrs),
    StructField("flags", IntegerType),
    StructField("exemplars", jExemplars)))

  private val jHistDp = StructType(Seq(
    StructField("startTimeUnixNano", StringType),
    StructField("timeUnixNano", StringType),
    StructField("count", StringType),
    StructField("sum", DoubleType),
    StructField("bucketCounts", ArrayType(StringType)),
    StructField("explicitBounds", ArrayType(DoubleType)),
    StructField("min", DoubleType),
    StructField("max", DoubleType),
    StructField("attributes", jAttrs),
    StructField("flags", IntegerType),
    StructField("exemplars", jExemplars)))

  private val jEntityRefs = ArrayType(StructType(Seq(
    StructField("schemaUrl", StringType),
    StructField("type", StringType),
    StructField("idKeys", ArrayType(StringType)),
    StructField("descriptionKeys", ArrayType(StringType)))))

  private val jMetric = StructType(Seq(
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("unit", StringType),
    StructField("gauge", StructType(Seq(
      StructField("dataPoints", ArrayType(jNumberDp))))),
    StructField("sum", StructType(Seq(
      StructField("dataPoints", ArrayType(jNumberDp)),
      StructField("aggregationTemporality", IntegerType),
      StructField("isMonotonic", BooleanType)))),
    StructField("histogram", StructType(Seq(
      StructField("dataPoints", ArrayType(jHistDp)),
      StructField("aggregationTemporality", IntegerType))))))

  private val jScopeMetrics = StructType(Seq(
    StructField("scope", StructType(Seq(
      StructField("name", StringType),
      StructField("version", StringType),
      StructField("attributes", jAttrs)))),
    StructField("metrics", ArrayType(jMetric))))

  private val jResourceMetrics = StructType(Seq(
    StructField("schemaUrl", StringType),
    StructField("resource", StructType(Seq(
      StructField("attributes", jAttrs),
      StructField("entityRefs", jEntityRefs)))),
    StructField("scopeMetrics", ArrayType(jScopeMetrics))))

  /** OTLP/HTTP JSON ExportMetricsServiceRequest (metrics subset). */
  val requestSchema: StructType = StructType(Seq(
    StructField("resourceMetrics", ArrayType(jResourceMetrics))))

  /** `attrList` with nullability relaxed: a cast target may not add
   *  NOT NULL constraints. */
  private val attrListNullable: ArrayType = ArrayType(StructType(Seq(
    StructField("key", StringType),
    StructField("value", OtelSchema.attrValue))))

  /** JSON attribute list -> the table's attrList encoding. Aliases
   *  inside a transform() lambda don't survive analysis, so the final
   *  cast renames the struct fields positionally. */
  private def convAttrs(c: Column): Column =
    transform(c, a => struct(
      a("key"),
      struct(
        a("value")("stringValue"),
        a("value")("boolValue"),
        a("value")("intValue").cast(LongType),
        a("value")("doubleValue")))).cast(attrListNullable)

  private val exemplarListNullable: ArrayType = ArrayType(StructType(Seq(
    StructField("time_unix_nano", LongType),
    StructField("as_int", LongType),
    StructField("as_double", DoubleType),
    StructField("trace_id", BinaryType),
    StructField("span_id", BinaryType),
    StructField("filtered_attributes", attrListNullable))))

  /** JSON exemplar list -> exemplarList encoding (int64-as-string cast,
   *  base64 trace/span ids decoded to raw bytes). */
  private def convExemplars(c: Column): Column =
    transform(c, e => struct(
      e("timeUnixNano").cast(LongType),
      e("asInt").cast(LongType),
      e("asDouble"),
      unbase64(e("traceId")),
      unbase64(e("spanId")),
      convAttrs(e("filteredAttributes")))).cast(exemplarListNullable)

  private val entityRefListNullable: ArrayType = ArrayType(StructType(Seq(
    StructField("type", StringType),
    StructField("id_pairs", attrListNullable),
    StructField("description_pairs", attrListNullable),
    StructField("schema_url", StringType))))

  /** Resource entityRefs -> entityRefList: id/description KEYS resolve
   *  against the (already-converted) resource attribute list; a key
   *  with no matching attribute gets the all-null value struct — the
   *  declarative twin of `otel_to_moonlink_pb.rs:166`. */
  private def convEntityRefs(refs: Column, attrsConv: Column): Column = {
    val nullVal = struct(
      lit(null).cast(StringType).as("string_value"),
      lit(null).cast(BooleanType).as("bool_value"),
      lit(null).cast(LongType).as("int_value"),
      lit(null).cast(DoubleType).as("double_value"))
    def pairs(keys: Column): Column = transform(keys, k => struct(
      k,
      coalesce(
        element_at(filter(attrsConv, a => a("key") === k), 1)("value"),
        nullVal)))
    // empty type/schema_url → null, matching the PB decode (the
    // reference nulls empty strings, otel_to_moonlink_pb.rs:199-209)
    transform(refs, er => struct(
      when(length(er("type")) > 0, er("type")),
      pairs(er("idKeys")), pairs(er("descriptionKeys")),
      when(length(er("schemaUrl")) > 0, er("schemaUrl"))))
      .cast(entityRefListNullable)
  }

  /**
   * One row per data point, in `OtelSchema.schema` column order.
   * `payloadCol` holds OTLP JSON request bodies (one request per input
   * row; a frame of many requests converts in one distributed pass).
   */
  def metricsToRows(payloads: DataFrame, payloadCol: String): DataFrame =
    pointsFromMetrics(metricsFrame(payloads, payloadCol))

  /** Parse + explode down to one row per metric (the expensive JSON
   *  work). Callers that fan out into the three data-point branches
   *  can persist this frame so the parse happens once. */
  def metricsFrame(payloads: DataFrame, payloadCol: String): DataFrame =
    payloads
      .select(explode(from_json(col(payloadCol), requestSchema)
        .getField("resourceMetrics")).as("rm"))
      .select(
        col("rm.schemaUrl").as("resource_schema_url"),
        convAttrs(col("rm.resource.attributes")).as("resource_attributes"),
        col("rm.resource.entityRefs").as("_erefs"),
        explode(col("rm.scopeMetrics")).as("sm"))
      .select(
        col("resource_schema_url"), col("resource_attributes"),
        // key resolution reads the ALREADY-converted attr list from the
        // previous select, so the attribute conversion runs once
        convEntityRefs(col("_erefs"), col("resource_attributes"))
          .as("resource_entity_refs"),
        col("sm.scope.name").as("scope_name"),
        col("sm.scope.version").as("scope_version"),
        convAttrs(col("sm.scope.attributes")).as("scope_attributes"),
        explode(col("sm.metrics")).as("m"))

  private def pointsFromMetrics(metrics: DataFrame): DataFrame = {

    // first select (still has `m`): alias the metric descriptor
    def common = Seq(
      col("resource_schema_url"), col("resource_attributes"),
      col("resource_entity_refs"),
      col("scope_name"), col("scope_version"), col("scope_attributes"),
      col("m.name").as("metric_name"),
      col("m.description").as("metric_description"),
      col("m.unit").as("metric_unit"))
    // second select (after the data-point explode): plain names only
    def commonOut = Seq(
      col("resource_schema_url"), col("resource_attributes"),
      col("resource_entity_refs"),
      col("scope_name"), col("scope_version"), col("scope_attributes"),
      col("metric_name"), col("metric_description"), col("metric_unit"))

    def dpCommon = Seq(
      col("dp.startTimeUnixNano").cast(LongType).as("start_time_unix_nano"),
      col("dp.timeUnixNano").cast(LongType).as("time_unix_nano"),
      convAttrs(col("dp.attributes")).as("attributes"),
      col("dp.flags").as("flags"))

    val nullHist = Seq(
      lit(null).cast(LongType).as("count"),
      lit(null).cast(DoubleType).as("sum"),
      lit(null).cast(ArrayType(LongType)).as("bucket_counts"),
      lit(null).cast(ArrayType(DoubleType)).as("explicit_bounds"),
      lit(null).cast(DoubleType).as("min"),
      lit(null).cast(DoubleType).as("max"),
      lit(null).cast(exemplarListNullable).as("hist_exemplars"))

    // gauge: no temporality/monotonicity (reference passes -1/false,
    // `otel_to_moonlink_pb.rs` gauge arm)
    val gauge = metrics.where(col("m.gauge").isNotNull)
      .select(common :+ explode(col("m.gauge.dataPoints")).as("dp"): _*)
      .select(commonOut ++ Seq(lit("gauge").as("metric_type")) ++ dpCommon ++ Seq(
        col("dp.asDouble").as("value_double"),
        col("dp.asInt").cast(LongType).as("value_int"),
        lit(false).as("is_monotonic"),
        lit(-1).as("aggregation_temporality"),
        convExemplars(col("dp.exemplars")).as("exemplars")) ++ nullHist: _*)

    val sum = metrics.where(col("m.sum").isNotNull)
      .select(common ++ Seq(
        col("m.sum.aggregationTemporality").as("_temp"),
        col("m.sum.isMonotonic").as("_mono"),
        explode(col("m.sum.dataPoints")).as("dp")): _*)
      .select(commonOut ++ Seq(lit("sum").as("metric_type")) ++ dpCommon ++ Seq(
        col("dp.asDouble").as("value_double"),
        col("dp.asInt").cast(LongType).as("value_int"),
        col("_mono").as("is_monotonic"),
        col("_temp").as("aggregation_temporality"),
        convExemplars(col("dp.exemplars")).as("exemplars")) ++ nullHist: _*)

    val hist = metrics.where(col("m.histogram").isNotNull)
      .select(common ++ Seq(
        col("m.histogram.aggregationTemporality").as("_temp"),
        explode(col("m.histogram.dataPoints")).as("dp")): _*)
      .select(commonOut ++ Seq(lit("histogram").as("metric_type")) ++ dpCommon ++ Seq(
        lit(null).cast(DoubleType).as("value_double"),
        lit(null).cast(LongType).as("value_int"),
        lit(null).cast(BooleanType).as("is_monotonic"),
        col("_temp").as("aggregation_temporality"),
        lit(null).cast(exemplarListNullable).as("exemplars"),
        col("dp.count").cast(LongType).as("count"),
        col("dp.sum").as("sum"),
        transform(col("dp.bucketCounts"), _.cast(LongType)).as("bucket_counts"),
        col("dp.explicitBounds").as("explicit_bounds"),
        col("dp.min").as("min"),
        col("dp.max").as("max"),
        convExemplars(col("dp.exemplars")).as("hist_exemplars")): _*)

    val ordered = OtelSchema.schema.fieldNames.toSeq
    gauge.select(ordered.map(col): _*)
      .unionByName(sum.select(ordered.map(col): _*))
      .unionByName(hist.select(ordered.map(col): _*))
  }

  /** Append converted data points to an OTEL metrics table (the sink
   *  half of S6; append-only, like the reference's metrics table).
   *  The decoded frame persists across applyBatch's internal passes
   *  (routing agg, write, stats) so the JSON conversion runs once. */
  def ingest(table: GraftTable, dataPoints: DataFrame, startLsn: Long): Long = {
    val ev = dataPoints
      .withColumn("_op", lit("i"))
      .withColumn("_lsn", monotonically_increasing_id() + startLsn)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try CdcPipeline.applyBatch(table, ev)
    finally ev.unpersist()
  }

  /** Full OTLP sink path with parse-once lifecycle: payloads -> metric
   *  frame (persisted across the gauge/sum/histogram branches) ->
   *  data-point rows -> append. */
  def ingestPayloads(table: GraftTable, payloads: DataFrame,
      payloadCol: String, startLsn: Long): Long = {
    val m = metricsFrame(payloads, payloadCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try ingest(table, pointsFromMetrics(m), startLsn)
    finally m.unpersist()
  }
}
