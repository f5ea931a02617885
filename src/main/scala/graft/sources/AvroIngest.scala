package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.streaming.CdcPipeline
import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/**
 * Kafka/Avro ingest (S5): declared Avro schema + Avro JSON-encoded
 * datums → typed rows, mirroring the reference's converter semantics
 * (`rest_ingest/avro_converter.rs`):
 *
 *  - primitives map directly; string/bytes both land as the table's
 *    string/binary columns (`convert_value`, :45-60);
 *  - ONLY 2-variant `[null, T]` unions are supported — complex unions
 *    rejected (`convert_schema_type` union arm, :193-222);
 *  - maps become `array<struct<key, value>>` — the engine has no Map
 *    type (`convert_schema_type` map arm, :169-191);
 *  - `fixed` is supported at size 16 only (UUIDs, :62-70);
 *  - logical types date / timestamp-micros / decimal(p,s) land as
 *    date32 / timestamp(µs) / decimal — the engine's `RowValue`
 *    normalizations (`moonlink_type.rs:5-21`).
 *
 * Wire format: the Avro JSON encoding (the schema-registry-less test
 * encoding of the Avro spec): union values arrive wrapped as
 * `{"<branch>": value}`, bytes/fixed as ISO-8859-1 strings. Parsing
 * runs per-partition with a per-partition ObjectMapper — the same
 * distributed seam as the REST JSON converter.
 */
object AvroIngest {

  // ---- schema model (serializable; shipped inside the task closure) ----
  sealed trait AvroType extends Serializable
  private case object ANull extends AvroType
  private case object ABool extends AvroType
  private case object AInt extends AvroType
  private case object ALong extends AvroType
  private case object AFloat extends AvroType
  private case object ADouble extends AvroType
  private case object ABytes extends AvroType
  private case object AString extends AvroType
  private case object ADate extends AvroType
  private case object ATimestampMicros extends AvroType
  private final case class ADecimal(precision: Int, scale: Int) extends AvroType
  private final case class AFixed(size: Int) extends AvroType
  private final case class AArray(items: AvroType) extends AvroType
  private final case class AMap(values: AvroType) extends AvroType
  private final case class ARecord(fields: Seq[(String, AvroType)]) extends AvroType
  private final case class ANullable(inner: AvroType) extends AvroType

  private def parseType(n: JsonNode): AvroType =
    if (n.isTextual) n.asText() match {
      case "null" => ANull
      case "boolean" => ABool
      case "int" => AInt
      case "long" => ALong
      case "float" => AFloat
      case "double" => ADouble
      case "bytes" => ABytes
      case "string" => AString
      case other =>
        throw new IllegalArgumentException(s"unsupported avro type: $other")
    } else if (n.isArray) {
      // union: only [null, T] (either order) is representable
      val variants = n.elements().asScala.toSeq
      val (nulls, rest) = variants.partition(v => v.isTextual && v.asText == "null")
      require(nulls.size == 1 && rest.size == 1,
        "complex unions are not supported") // avro_converter.rs:205
      ANullable(parseType(rest.head))
    } else if (n.isObject) {
      val t = n.get("type").asText()
      val logical = Option(n.get("logicalType")).map(_.asText())
      (t, logical) match {
        case ("int", Some("date")) => ADate
        case ("long", Some("timestamp-micros")) => ATimestampMicros
        case ("bytes", Some("decimal")) =>
          ADecimal(n.get("precision").asInt(), n.get("scale").asInt())
        case ("record", _) =>
          ARecord(n.get("fields").elements().asScala.toSeq.map(f =>
            f.get("name").asText() -> parseType(f.get("type"))))
        case ("array", _) => AArray(parseType(n.get("items")))
        case ("map", _) => AMap(parseType(n.get("values")))
        case ("fixed", _) =>
          val size = n.get("size").asInt()
          require(size == 16, // avro_converter.rs:69 — only Fixed(16)
            s"Fixed($size) - only Fixed(16) is supported")
          AFixed(size)
        case _ => parseType(n.get("type"))
      }
    } else throw new IllegalArgumentException(s"bad avro schema node: $n")

  private def toDataType(t: AvroType): DataType = t match {
    case ANull => NullType
    case ABool => BooleanType
    case AInt => IntegerType
    case ALong => LongType
    case AFloat => FloatType
    case ADouble => DoubleType
    case ABytes | AFixed(_) => BinaryType
    case AString => StringType
    case ADate => DateType
    case ATimestampMicros => TimestampType
    case ADecimal(p, s) => DecimalType(p, s)
    case AArray(items) => ArrayType(toDataType(items))
    case AMap(values) => ArrayType(StructType(Seq( // list<struct<key,value>>
      StructField("key", StringType, nullable = false),
      StructField("value", toDataType(values)))))
    case ARecord(fields) => StructType(fields.map { case (name, ft) =>
      StructField(name, toDataType(unwrap(ft)), nullable = isNullable(ft))
    })
    case ANullable(inner) => toDataType(inner)
  }

  private def unwrap(t: AvroType): AvroType =
    t match { case ANullable(i) => i; case o => o }
  private def isNullable(t: AvroType): Boolean =
    t match { case ANullable(_) | ANull => true; case _ => false }

  /** Declared Avro schema (top-level record) -> Spark schema. */
  def schemaToStruct(avroSchemaJson: String): StructType = {
    val root = parseType(new ObjectMapper().readTree(avroSchemaJson))
    root match {
      case r: ARecord => toDataType(r).asInstanceOf[StructType]
      case _ => throw new IllegalArgumentException(
        "only record schemas are supported at the top level") // :130
    }
  }

  // ---- value decoding (Avro JSON encoding) -----------------------------

  private def decode(t: AvroType, n: JsonNode): Any = t match {
    case _ if n == null || n.isNull =>
      require(isNullable(t) || t == ANull, s"null for non-nullable $t")
      null
    case ANullable(inner) =>
      // union JSON encoding: {"<branchName>": value}
      require(n.isObject && n.size() == 1, s"expected union wrapper, got $n")
      decode(inner, n.elements().next())
    case ANull => null
    case ABool => n.asBoolean()
    case AInt => n.asInt()
    case ALong => n.asLong()
    case AFloat => n.floatValue()
    case ADouble => n.doubleValue()
    case AString => n.asText()
    case ABytes | AFixed(_) => // ISO-8859-1 chars are the raw bytes
      n.asText().getBytes(StandardCharsets.ISO_8859_1)
    case ADate => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(n.asLong()))
    case ATimestampMicros =>
      val us = n.asLong()
      val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      ts.setNanos(Math.floorMod(us, 1000000L).toInt * 1000)
      ts
    case ADecimal(_, scale) =>
      val unscaled = new java.math.BigInteger(
        n.asText().getBytes(StandardCharsets.ISO_8859_1))
      new java.math.BigDecimal(unscaled, scale)
    case AArray(items) =>
      n.elements().asScala.map(e => decode(items, e)).toSeq
    case AMap(values) =>
      n.properties().asScala.toSeq.map(e => Row(e.getKey, decode(values, e.getValue)))
    case ARecord(fields) =>
      Row.fromSeq(fields.map { case (name, ft) => decode(ft, n.get(name)) })
  }

  /**
   * Decode a frame of Avro JSON datums into typed rows — one
   * distributed pass; the ObjectMapper and schema walk initialize once
   * per partition.
   */
  def toRows(spark: SparkSession, payloads: DataFrame, payloadCol: String,
      avroSchemaJson: String): DataFrame = {
    val root = parseType(new ObjectMapper().readTree(avroSchemaJson))
      .asInstanceOf[ARecord]
    val schema = toDataType(root).asInstanceOf[StructType]
    val rdd = payloads.select(col(payloadCol)).as(Encoders.STRING).rdd
      .mapPartitions { it =>
        val mapper = new ObjectMapper()
        it.map(s => decode(root, mapper.readTree(s)).asInstanceOf[Row])
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Kafka-style append ingest of decoded rows (S5 sink half). The
   *  decoded frame persists across applyBatch's internal passes so the
   *  datum parse runs once. */
  def ingest(table: GraftTable, payloads: DataFrame, payloadCol: String,
      avroSchemaJson: String, startLsn: Long): Long = {
    val ev = toRows(table.spark, payloads, payloadCol, avroSchemaJson)
      .withColumn("_op", lit("i"))
      .withColumn("_lsn", monotonically_increasing_id() + startLsn)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try CdcPipeline.applyBatch(table, ev)
    finally ev.unpersist()
  }
}
