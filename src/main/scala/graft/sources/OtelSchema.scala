package graft.sources

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, functions => F}

/**
 * OTEL metrics table schema (S6): the reference ingests OTLP metrics
 * into one wide nested row per data point
 * (`moonlink_service/src/otel/otel_schema.rs:124-278`): ~17 common
 * resource/scope/metric fields plus number-point and histogram-point
 * groups, with attributes as List<Struct{key, value-struct}> — the
 * reference has no Map type (`otel_schema.rs:49-60`), so attributes are
 * modeled the same way here.
 */
object OtelSchema {

  /** attribute value: a tagged union struct (string/bool/int/double),
   *  mirroring AnyValue's common cases */
  val attrValue: StructType = StructType(Seq(
    StructField("string_value", StringType),
    StructField("bool_value", BooleanType),
    StructField("int_value", LongType),
    StructField("double_value", DoubleType)))

  val attrList: ArrayType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", attrValue))))

  /** exemplar: a sampled measurement correlated to a trace
   *  (`otel_schema.rs:98` exemplar_struct: time, int-or-double value,
   *  trace/span ids, filtered attributes) */
  val exemplarList: ArrayType = ArrayType(StructType(Seq(
    StructField("time_unix_nano", LongType),
    StructField("as_int", LongType),
    StructField("as_double", DoubleType),
    StructField("trace_id", BinaryType),
    StructField("span_id", BinaryType),
    StructField("filtered_attributes", attrList))))

  /** resource entity reference (`otel_schema.rs:77` entity_ref_struct):
   *  type + id/description key-value pairs RESOLVED against the
   *  resource attributes (the reference fills values from the resource
   *  attr map, `otel_to_moonlink_pb.rs:166`) + schema url */
  val entityRefList: ArrayType = ArrayType(StructType(Seq(
    StructField("type", StringType),
    StructField("id_pairs", attrList),
    StructField("description_pairs", attrList),
    StructField("schema_url", StringType))))

  /** one row per metric data point */
  val schema: StructType = StructType(Seq(
    // resource / scope
    StructField("resource_schema_url", StringType),
    StructField("resource_attributes", attrList),
    StructField("resource_entity_refs", entityRefList),
    StructField("scope_name", StringType),
    StructField("scope_version", StringType),
    StructField("scope_attributes", attrList),
    // metric descriptor
    StructField("metric_name", StringType, nullable = false),
    StructField("metric_description", StringType),
    StructField("metric_unit", StringType),
    StructField("metric_type", StringType, nullable = false), // gauge|sum|histogram
    // datapoint commons
    StructField("start_time_unix_nano", LongType),
    StructField("time_unix_nano", LongType, nullable = false),
    StructField("attributes", attrList),
    StructField("flags", IntegerType),
    // number points (gauge/sum)
    StructField("value_double", DoubleType),
    StructField("value_int", LongType),
    StructField("is_monotonic", BooleanType),
    StructField("aggregation_temporality", IntegerType),
    StructField("exemplars", exemplarList),
    // histogram points
    StructField("count", LongType),
    StructField("sum", DoubleType),
    StructField("bucket_counts", ArrayType(LongType)),
    StructField("explicit_bounds", ArrayType(DoubleType)),
    StructField("min", DoubleType),
    StructField("max", DoubleType),
    StructField("hist_exemplars", exemplarList)))

  /** Analysis helper: explode the attribute list into (key, value)
   *  rows — the query-side counterpart of the nested encoding. */
  def explodeAttrs(df: DataFrame, attrCol: String = "attributes"): DataFrame =
    df.withColumn("attr", F.explode_outer(F.col(attrCol)))
      .withColumn("attr_key", F.col("attr.key"))
      .withColumn("attr_value", F.coalesce(
        F.col("attr.value.string_value"),
        F.col("attr.value.int_value").cast("string"),
        F.col("attr.value.double_value").cast("string"),
        F.col("attr.value.bool_value").cast("string")))
      .drop("attr")
}
