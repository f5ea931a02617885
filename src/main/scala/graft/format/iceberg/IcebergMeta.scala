package graft.format.iceberg

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.model.SchemaDsl
import org.apache.spark.sql.types._

/**
 * Iceberg v3 table metadata — schema JSON, manifest/manifest-list Avro
 * schemas (with the spec's reserved field-ids), and the
 * `metadata.json` document, all per the PUBLIC Iceberg table spec.
 * This is the interop half the reference gets from the `iceberg`
 * crate (`iceberg_table_syncer.rs:230,488,683`): external engines
 * read the committed table because these files follow the spec, not
 * because they share a library.
 */
private[graft] object IcebergMeta {

  private val mapper = new ObjectMapper()

  // ---- iceberg schema JSON from the table's Spark schema ---------------

  def icebergTypeOf(dt: DataType): String = dt match {
    case LongType => "long"
    case IntegerType => "int"
    case ShortType => "int"
    case StringType => "string"
    case DoubleType => "double"
    case FloatType => "float"
    case BooleanType => "boolean"
    case DateType => "date"
    case TimestampType => "timestamptz"
    case BinaryType => "binary"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case other =>
      throw new IllegalArgumentException(s"no iceberg mapping for $other")
  }

  /** Field ids come from the table's own stable id seam
   *  (`SchemaDsl.FieldIdKey`), falling back to position+1 for schemas
   *  that predate id assignment. */
  def schemaJson(schema: StructType, schemaId: Int = 0): String = {
    val root = mapper.createObjectNode()
    root.put("type", "struct")
    root.put("schema-id", schemaId)
    val fields = root.putArray("fields")
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val n = fields.addObject()
      n.put("id",
        if (f.metadata.contains(SchemaDsl.FieldIdKey))
          f.metadata.getLong(SchemaDsl.FieldIdKey)
        else (i + 1).toLong)
      n.put("name", f.name)
      n.put("required", !f.nullable)
      n.put("type", icebergTypeOf(f.dataType))
    }
    mapper.writeValueAsString(root)
  }

  // ---- avro schemas with reserved field-ids ----------------------------

  /** manifest-list entry (`manifest_file`), v2+ field-ids 500-519. */
  val manifestListSchema: String =
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"sequence_number","type":"long","field-id":515},
      |{"name":"min_sequence_number","type":"long","field-id":516},
      |{"name":"added_snapshot_id","type":"long","field-id":503},
      |{"name":"added_files_count","type":"int","field-id":504},
      |{"name":"existing_files_count","type":"int","field-id":505},
      |{"name":"deleted_files_count","type":"int","field-id":506},
      |{"name":"added_rows_count","type":"long","field-id":512},
      |{"name":"existing_rows_count","type":"long","field-id":513},
      |{"name":"deleted_rows_count","type":"long","field-id":514},
      |{"name":"partitions","type":["null",{"type":"array","element-id":508,
      |  "items":{"type":"record","name":"r508","fields":[
      |    {"name":"contains_null","type":"boolean","field-id":509},
      |    {"name":"contains_nan","type":["null","boolean"],"field-id":518},
      |    {"name":"lower_bound","type":["null","bytes"],"field-id":510},
      |    {"name":"upper_bound","type":["null","bytes"],"field-id":511}]}}],
      | "field-id":507},
      |{"name":"key_metadata","type":["null","bytes"],"field-id":519}
      |]}""".stripMargin

  /** `manifest_entry` with the nested `data_file` (`r2`) record —
   *  required v2 fields plus the v3 deletion-vector trio
   *  (referenced_data_file 143 / content_offset 144 /
   *  content_size_in_bytes 145). Unpartitioned: `partition` is the
   *  empty struct `r102`. */
  val manifestEntrySchema: String =
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int","field-id":0},
      |{"name":"snapshot_id","type":["null","long"],"field-id":1},
      |{"name":"sequence_number","type":["null","long"],"field-id":3},
      |{"name":"file_sequence_number","type":["null","long"],"field-id":4},
      |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
      |  {"name":"content","type":"int","field-id":134},
      |  {"name":"file_path","type":"string","field-id":100},
      |  {"name":"file_format","type":"string","field-id":101},
      |  {"name":"partition","field-id":102,
      |   "type":{"type":"record","name":"r102","fields":[]}},
      |  {"name":"record_count","type":"long","field-id":103},
      |  {"name":"file_size_in_bytes","type":"long","field-id":104},
      |  {"name":"value_counts","type":["null",{"type":"array","logicalType":"map",
      |    "items":{"type":"record","name":"k119_v120","fields":[
      |      {"name":"key","type":"int","field-id":119},
      |      {"name":"value","type":"long","field-id":120}]}}],"field-id":109},
      |  {"name":"null_value_counts","type":["null",{"type":"array","logicalType":"map",
      |    "items":{"type":"record","name":"k121_v122","fields":[
      |      {"name":"key","type":"int","field-id":121},
      |      {"name":"value","type":"long","field-id":122}]}}],"field-id":110},
      |  {"name":"lower_bounds","type":["null",{"type":"array","logicalType":"map",
      |    "items":{"type":"record","name":"k126_v127","fields":[
      |      {"name":"key","type":"int","field-id":126},
      |      {"name":"value","type":"bytes","field-id":127}]}}],"field-id":125},
      |  {"name":"upper_bounds","type":["null",{"type":"array","logicalType":"map",
      |    "items":{"type":"record","name":"k129_v130","fields":[
      |      {"name":"key","type":"int","field-id":129},
      |      {"name":"value","type":"bytes","field-id":130}]}}],"field-id":128},
      |  {"name":"split_offsets","type":["null",{"type":"array",
      |    "items":"long","element-id":133}],"field-id":132},
      |  {"name":"sort_order_id","type":["null","int"],"field-id":140},
      |  {"name":"referenced_data_file","type":["null","string"],"field-id":143},
      |  {"name":"content_offset","type":["null","long"],"field-id":144},
      |  {"name":"content_size_in_bytes","type":["null","long"],"field-id":145}
      |]}}]}""".stripMargin

  // ---- metadata.json ---------------------------------------------------

  final case class Snapshot(snapshotId: Long, parentId: Option[Long],
      sequenceNumber: Long, timestampMs: Long, manifestList: String,
      operation: String, schemaId: Int,
      // engine keys beside the spec's "operation" (iceberg's summary is
      // a free string map; the reference rides its file-index puffin
      // bookkeeping on catalog extensions the same way)
      summary: Map[String, String] = Map.empty)

  final case class TableMetadata(
      formatVersion: Int, tableUuid: String, location: String,
      lastSequenceNumber: Long, lastUpdatedMs: Long, lastColumnId: Long,
      // full schema history (iceberg keeps every schema ever current;
      // snapshots pin theirs by schema-id), each a JSON doc carrying
      // its own schema-id
      schemas: Seq[String], currentSchemaId: Int,
      snapshots: Seq[Snapshot], currentSnapshotId: Long) {
    def currentSnapshot: Snapshot =
      snapshots.find(_.snapshotId == currentSnapshotId)
        .getOrElse(throw new IllegalStateException("no current snapshot"))
    def schemaJson: String = schemas
      .find(sj => IcebergMeta.schemaIdOf(sj) == currentSchemaId)
      .getOrElse(throw new IllegalStateException("current schema missing"))
  }

  def schemaIdOf(schemaJson: String): Int =
    mapper.readTree(schemaJson).get("schema-id").asInt

  // ---- per-file metrics: single-value serialization ---------------------
  // The Iceberg spec's binary encoding for manifest bound values
  // (Appendix D): little-endian numerics, UTF-8 strings, date = int
  // days, timestamptz = long micros, decimal = minimal big-endian
  // two's-complement unscaled value. The reference ships the same
  // metrics through `iceberg/parquet_stats_utils.rs`.

  /** Column-id map of a Spark schema — the SAME id seam
   *  [[schemaJson]] writes, so manifest metric keys always match the
   *  schema the snapshot pins. */
  def fieldIdsOf(schema: StructType): Map[String, Int] =
    schema.fields.zipWithIndex.map { case (f, i) =>
      f.name -> (if (f.metadata.contains(SchemaDsl.FieldIdKey))
        f.metadata.getLong(SchemaDsl.FieldIdKey).toInt else i + 1)
    }.toMap

  private def le(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >>> (8 * i)) & 0xff).toByte)
  private def leRead(b: Array[Byte]): Long =
    b.zipWithIndex.map { case (x, i) => (x.toLong & 0xff) << (8 * i) }.sum

  /** Bound value -> spec bytes, from the graft stat-string encoding
   *  (`GraftTable.statBounds`). None = no sound encoding (NaN
   *  float/double bounds, or a type without a bound form) — the
   *  column's bounds are simply omitted from the manifest. */
  def boundBytes(dt: DataType, statStr: String): Option[Array[Byte]] = try {
    import graft.table.GraftTable.parseStat
    dt match {
      case ShortType | IntegerType =>
        Some(le(parseStat(dt, statStr).asInstanceOf[Number].longValue, 4))
      case LongType => Some(le(statStr.toLong, 8))
      case FloatType =>
        val f = statStr.toFloat
        if (f.isNaN) None
        else Some(le(java.lang.Float.floatToIntBits(f).toLong, 4))
      case DoubleType =>
        val d = statStr.toDouble
        if (d.isNaN) None
        else Some(le(java.lang.Double.doubleToLongBits(d), 8))
      case BooleanType =>
        Some(Array[Byte](if (statStr.toBoolean) 1 else 0))
      case StringType =>
        Some(statStr.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case DateType =>
        Some(le(java.sql.Date.valueOf(statStr).toLocalDate.toEpochDay, 4))
      case TimestampType =>
        val ts = java.sql.Timestamp.valueOf(statStr)
        Some(le(Math.floorDiv(ts.getTime, 1000L) * 1000000L +
          ts.getNanos / 1000L, 8))
      case d: DecimalType =>
        Some(new java.math.BigDecimal(statStr).setScale(d.scale)
          .unscaledValue.toByteArray)
      case _ => scala.None
    }
  } catch { case _: Exception => scala.None }

  /** Inverse: manifest bound bytes -> the graft stat-string encoding
   *  (what `GraftTable.parseStat` reads back). */
  def boundStat(dt: DataType, b: Array[Byte]): Option[String] = try {
    dt match {
      case ShortType | IntegerType => Some(leRead(b).toInt.toString)
      case LongType => Some(leRead(b).toString)
      case FloatType =>
        Some(java.lang.Float.intBitsToFloat(leRead(b).toInt).toString)
      case DoubleType =>
        Some(java.lang.Double.longBitsToDouble(leRead(b)).toString)
      case BooleanType => Some((b.nonEmpty && b(0) != 0).toString)
      case StringType =>
        Some(new String(b, java.nio.charset.StandardCharsets.UTF_8))
      case DateType =>
        Some(java.time.LocalDate.ofEpochDay(leRead(b).toInt.toLong).toString)
      case TimestampType =>
        val micros = leRead(b)
        val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        Some(ts.toString)
      case d: DecimalType =>
        Some(new java.math.BigDecimal(
          new java.math.BigInteger(b), d.scale).toPlainString)
      case _ => scala.None
    }
  } catch { case _: Exception => scala.None }

  def metadataJson(m: TableMetadata): String = {
    val root = mapper.createObjectNode()
    root.put("format-version", m.formatVersion)
    root.put("table-uuid", m.tableUuid)
    root.put("location", m.location)
    root.put("last-sequence-number", m.lastSequenceNumber)
    root.put("last-updated-ms", m.lastUpdatedMs)
    root.put("last-column-id", m.lastColumnId)
    val schemas = root.putArray("schemas")
    m.schemas.foreach(sj => schemas.add(mapper.readTree(sj)))
    root.put("current-schema-id", m.currentSchemaId)
    val specs = root.putArray("partition-specs")
    val spec = specs.addObject()
    spec.put("spec-id", 0); spec.putArray("fields")
    root.put("default-spec-id", 0)
    root.put("last-partition-id", 999) // spec: >= 999 when unpartitioned
    val orders = root.putArray("sort-orders")
    val order = orders.addObject()
    order.put("order-id", 0); order.putArray("fields")
    root.put("default-sort-order-id", 0)
    root.putObject("properties")
    root.put("current-snapshot-id", m.currentSnapshotId)
    val snaps = root.putArray("snapshots")
    m.snapshots.foreach { s =>
      val n = snaps.addObject()
      n.put("snapshot-id", s.snapshotId)
      s.parentId.foreach(p => n.put("parent-snapshot-id", p))
      n.put("sequence-number", s.sequenceNumber)
      n.put("timestamp-ms", s.timestampMs)
      n.put("manifest-list", s.manifestList)
      val sm = n.putObject("summary")
      sm.put("operation", s.operation)
      s.summary.toSeq.sortBy(_._1).foreach { case (k, v) => sm.put(k, v) }
      n.put("schema-id", s.schemaId)
    }
    val log = root.putArray("snapshot-log")
    m.snapshots.foreach { s =>
      val n = log.addObject()
      n.put("timestamp-ms", s.timestampMs)
      n.put("snapshot-id", s.snapshotId)
    }
    root.putArray("metadata-log")
    val refs = root.putObject("refs")
    val main = refs.putObject("main")
    main.put("snapshot-id", m.currentSnapshotId)
    main.put("type", "branch")
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Independent spec-side parser (round-trip gate for the writer —
   *  also what the read path drives; never shares state with the
   *  writer beyond these public layouts). */
  def parseMetadataJson(s: String): TableMetadata = {
    val n = mapper.readTree(s)
    def req(k: String): JsonNode = {
      require(n.hasNonNull(k), s"metadata.json misses required key $k")
      n.get(k)
    }
    val snaps = Seq.newBuilder[Snapshot]
    req("snapshots").elements().forEachRemaining { sn =>
      val summary = Map.newBuilder[String, String]
      sn.get("summary").fields().forEachRemaining { e =>
        if (e.getKey != "operation") summary += (e.getKey -> e.getValue.asText)
      }
      snaps += Snapshot(
        sn.get("snapshot-id").asLong,
        if (sn.hasNonNull("parent-snapshot-id"))
          Some(sn.get("parent-snapshot-id").asLong) else None,
        sn.get("sequence-number").asLong,
        sn.get("timestamp-ms").asLong,
        sn.get("manifest-list").asText,
        sn.get("summary").get("operation").asText,
        sn.get("schema-id").asInt,
        summary.result())
    }
    val schemas = req("schemas").elements().asScalaSeq
      .map(mapper.writeValueAsString)
    val curSchemaId = req("current-schema-id").asInt
    require(schemas.exists(sj => schemaIdOf(sj) == curSchemaId),
      "current schema missing from schemas")
    TableMetadata(
      req("format-version").asInt,
      req("table-uuid").asText,
      req("location").asText,
      req("last-sequence-number").asLong,
      req("last-updated-ms").asLong,
      req("last-column-id").asLong,
      schemas,
      curSchemaId,
      snaps.result(),
      req("current-snapshot-id").asLong)
  }

  /** Spark StructType back from an iceberg schema JSON (the parser's
   *  read-path half; primitive columns only, like the writer). */
  def sparkSchemaOf(schemaJson: String): StructType = {
    val n = mapper.readTree(schemaJson)
    StructType(n.get("fields").elements().asScalaSeq.map { f =>
      val t = f.get("type").asText match {
        case "long" => LongType
        case "int" => IntegerType
        case "string" => StringType
        case "double" => DoubleType
        case "float" => FloatType
        case "boolean" => BooleanType
        case "date" => DateType
        case "timestamptz" => TimestampType
        case "binary" => BinaryType
        case d if d.startsWith("decimal") =>
          val Array(p, sc) = d.stripPrefix("decimal(").stripSuffix(")")
            .split(",").map(_.trim.toInt)
          DecimalType(p, sc)
        case other =>
          throw new IllegalArgumentException(s"iceberg type: $other")
      }
      val md = new org.apache.spark.sql.types.MetadataBuilder()
        .putLong(SchemaDsl.FieldIdKey, f.get("id").asLong).build()
      StructField(f.get("name").asText, t, !f.get("required").asBoolean, md)
    })
  }

  private implicit class IterOps[T](it: java.util.Iterator[T]) {
    def asScalaSeq: Seq[T] = {
      val b = Seq.newBuilder[T]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }
}
