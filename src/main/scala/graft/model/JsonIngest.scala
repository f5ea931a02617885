package graft.model

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.time.{Instant, LocalDate, LocalTime, OffsetDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import scala.jdk.CollectionConverters._

/**
 * JSON -> typed Row converter for the REST ingest surface (S3),
 * mirroring the reference's conversion rules
 * (`rest_ingest/json_converter.rs:34-226`, `decimal_utils.rs`,
 * `datetime_utils.rs:1-192`):
 *
 *  - decimals accept JSON numbers or strings, are rescaled to the
 *    declared (p, s) with HALF_UP rounding, and overflow is an error;
 *  - date32 accepts `YYYY-MM-DD`;
 *  - timestamps accept RFC3339 with any offset and canonicalize to UTC
 *    microseconds;
 *  - time accepts `HH:MM:SS[.ffffff]` as micro-of-day (mapped to Long);
 *  - ints reject lossy narrowing; int64 accepts int32 inputs etc.
 */
object JsonIngest {
  private val mapper = new ObjectMapper()

  def parse(schema: StructType, json: String): Row =
    node2row(schema, mapper.readTree(json))

  def parseMany(schema: StructType, jsonl: Iterator[String]): Iterator[Row] =
    jsonl.filter(_.trim.nonEmpty).map(parse(schema, _))

  private def node2row(schema: StructType, n: JsonNode): Row =
    Row.fromSeq(schema.fields.toSeq.map { f =>
      val v = n.get(f.name)
      if (v == null || v.isNull) {
        if (!f.nullable)
          throw new IllegalArgumentException(s"null for non-nullable ${f.name}")
        null
      } else convert(f.dataType, v, f.name)
    })

  private def convert(dt: DataType, n: JsonNode, path: String): Any = dt match {
    case IntegerType =>
      if (n.canConvertToInt) n.asInt
      else throw new IllegalArgumentException(s"$path: not an int32: $n")
    case ShortType =>
      val i = n.asInt
      if (n.canConvertToInt && i >= Short.MinValue && i <= Short.MaxValue) i.toShort
      else throw new IllegalArgumentException(s"$path: not an int16: $n")
    case LongType =>
      if (n.canConvertToLong) n.asLong
      else throw new IllegalArgumentException(s"$path: not an int64: $n")
    case FloatType => n.asDouble.toFloat
    case DoubleType => n.asDouble
    case BooleanType =>
      if (n.isBoolean) n.asBoolean
      else throw new IllegalArgumentException(s"$path: not a bool: $n")
    case StringType => n.asText
    case BinaryType =>
      java.util.Base64.getDecoder.decode(n.asText)
    case d: DecimalType =>
      // string-or-number decimals, rescale with overflow check
      // (reference json_converter.rs:47-226 + decimal_utils.rs)
      val raw = new JBigDecimal(n.asText)
      val scaled = raw.setScale(d.scale, RoundingMode.HALF_UP)
      if (scaled.precision - scaled.scale > d.precision - d.scale)
        throw new IllegalArgumentException(s"$path: decimal overflow for $d: $n")
      scaled
    case DateType =>
      java.sql.Date.valueOf(LocalDate.parse(n.asText))
    case TimestampType =>
      // RFC3339 with offset -> UTC microsecond canonicalization
      val odt = OffsetDateTime.parse(n.asText, DateTimeFormatter.ISO_OFFSET_DATE_TIME)
      val inst = odt.withOffsetSameInstant(ZoneOffset.UTC).toInstant
      java.sql.Timestamp.from(truncToMicros(inst))
    case at @ ArrayType(st: StructType, _) if SchemaDsl.isMapEncoded(at) =>
      // map<string,V> (stored list-of-struct): the natural JSON form is
      // an OBJECT {"k": v, ...}; an array of {key, value} entries (the
      // storage encoding itself) is accepted too
      if (n.isObject)
        n.fields().asScala.toSeq.map { e =>
          Row(e.getKey,
            if (e.getValue.isNull) null
            else convert(st.fields(1).dataType, e.getValue,
              s"$path.${e.getKey}"))
        }
      else if (n.isArray)
        n.elements().asScala.zipWithIndex
          .map { case (e, i) => if (e.isNull) null
            else convert(st, e, s"$path[$i]") }
          .toSeq
      else throw new IllegalArgumentException(s"$path: not a map object: $n")
    case ArrayType(et, _) =>
      if (!n.isArray) throw new IllegalArgumentException(s"$path: not an array: $n")
      n.elements().asScala.zipWithIndex
        .map { case (e, i) => if (e.isNull) null else convert(et, e, s"$path[$i]") }
        .toSeq
    case st: StructType =>
      if (!n.isObject) throw new IllegalArgumentException(s"$path: not an object: $n")
      node2row(st, n)
    case other =>
      throw new IllegalArgumentException(s"$path: unsupported ingest type $other")
  }

  private def truncToMicros(i: Instant): Instant =
    i.plusNanos(0).minusNanos(i.getNano % 1000L)

  /** `HH:MM:SS[.ffffff]` -> micro-of-day, the reference's Time64 mapping
   *  (`datetime_utils.rs`; Spark has no TimeType so callers store Long). */
  def timeMicros(s: String): Long = {
    val t = LocalTime.parse(s)
    t.toNanoOfDay / 1000L
  }
}

/**
 * Schema DSL mirroring the REST table-creation type names
 * (`rest_ingest/schema_util.rs:64-182`): each field carries a stable
 * field id in its metadata (the reference's `PARQUET:field_id`), so
 * columns keep identity across drops (M14).
 */
object SchemaDsl {
  val FieldIdKey = "graft.field_id"

  /** Column-mapping seam: a field whose metadata carries this key is
   *  stored in parquet under that PHYSICAL name instead of its logical
   *  name. Re-added columns (drop then add of the same name) get a
   *  fresh physical name so name-based parquet resolution can never
   *  resurrect the dropped column's data from pre-alter files — the
   *  role `PARQUET:field_id` plays in the reference's iceberg layer. */
  val PhysicalKey = "graft.physical"

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysicalKey)) f.metadata.getString(PhysicalKey)
    else f.name

  def maxFieldId(schema: StructType): Long =
    schema.fields.map(f =>
      if (f.metadata.contains(FieldIdKey)) f.metadata.getLong(FieldIdKey)
      else 0L
    ).foldLeft(0L)(math.max)

  /** Marker on a map-encoded array's `key` field: `map<string,T>` is
   *  STORED as list<struct{key,value}> — the reference's convention for
   *  keyed collections (OTEL attrs are list-of-struct precisely because
   *  it has no Map type, `otel_schema.rs:49-60`), which also keeps the
   *  parquet layout engine-portable. The marker lets [[typeName]] and
   *  the JSON ingest round-trip the MAP semantics over the list
   *  encoding. */
  val MapEntryKey = "graft.map_entry"

  /** The storage encoding of `map<string,V>`. */
  def mapEntryStruct(valueType: DataType): StructType = StructType(Seq(
    StructField("key", StringType, nullable = false,
      metadata = new MetadataBuilder().putBoolean(MapEntryKey, true).build()),
    StructField("value", valueType)))

  /** True when `dt` is the list-of-struct encoding of a map column. */
  def isMapEncoded(dt: DataType): Boolean = dt match {
    case ArrayType(st: StructType, _) =>
      st.fields.length == 2 && st.fields(0).name == "key" &&
        st.fields(1).name == "value" &&
        st.fields(0).metadata.contains(MapEntryKey)
    case _ => false
  }

  def field(name: String, typeName: String, nullable: Boolean = true): StructField =
    StructField(name, parseType(typeName), nullable)

  /** REST type-name grammar (schema_util.rs:74-177). Nested list-of-list
   *  and struct-in-list are rejected, as in the reference (:162-166);
   *  `map<string,T>` additionally accepted, stored list-of-struct. */
  def parseType(t: String): DataType = parseType(t, topLevel = true)

  private def parseType(t: String, topLevel: Boolean): DataType = {
    val s = t.trim.toLowerCase
    val decimalRe = "decimal\\((\\d+),\\s*(\\d+)\\)".r
    val listRe = "(?:list|array)<(.+)>".r
    val mapRe = "map<\\s*string\\s*,(.+)>".r
    s match {
      case "int16" => ShortType
      case "int32" => IntegerType
      case "int64" => LongType
      case "string" | "text" => StringType
      case "boolean" | "bool" => BooleanType
      case "float32" => FloatType
      case "float64" => DoubleType
      case "date32" => DateType
      case "timestamp" => TimestampType
      case "binary" | "bytea" => BinaryType
      case decimalRe(p, sc) => DecimalType(p.toInt, sc.toInt)
      case mapRe(vt) =>
        if (!topLevel)
          throw new IllegalArgumentException(s"nested map rejected: $t")
        ArrayType(mapEntryStruct(parseType(vt, topLevel = false)))
      case listRe(inner) =>
        if (!topLevel)
          throw new IllegalArgumentException(s"nested list rejected: $t")
        val et = parseType(inner, topLevel = false)
        if (et.isInstanceOf[StructType])
          throw new IllegalArgumentException(s"struct in list rejected: $t")
        ArrayType(et)
      case other => throw new IllegalArgumentException(s"unknown type: $other")
    }
  }

  /** Inverse of [[parseType]] — Spark DataType back to the REST
   *  type-name grammar (for SQL DDL arriving as Catalyst types). */
  def typeName(dt: DataType): String = dt match {
    case at @ ArrayType(st: StructType, _) if isMapEncoded(at) =>
      s"map<string,${typeName(st.fields(1).dataType)}>"
    case ShortType => "int16"
    case IntegerType => "int32"
    case LongType => "int64"
    case StringType => "string"
    case BooleanType => "boolean"
    case FloatType => "float32"
    case DoubleType => "float64"
    case DateType => "date32"
    case TimestampType => "timestamp"
    case BinaryType => "binary"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case ArrayType(et, _) => s"list<${typeName(et)}>"
    case other =>
      throw new IllegalArgumentException(s"unsupported type: $other")
  }

  def struct(fields: (String, String)*): StructType =
    StructType(fields.zipWithIndex.map { case ((n, t), i) =>
      field(n, t).copy(metadata = new MetadataBuilder()
        .putLong(FieldIdKey, i + 1L).build())
    })
}
