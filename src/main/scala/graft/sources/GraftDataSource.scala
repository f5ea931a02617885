package graft.sources

import graft.format.{DataFileEntry, DvSidecar, Manifest, ManifestLog}
import graft.table.{DvCache, GraftTable}

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.{MessageType, Type => PType}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.roaringbitmap.longlong.Roaring64Bitmap

import java.util.OptionalLong
import scala.jdk.CollectionConverters._

/**
 * Spark DataSourceV2 connector for graft tables — the "v1" upgrade
 * SURVEY §4 plans over the DataFrame-composed read path (reference
 * `moonlink_datafusion/src/table_provider.rs:74-171`, a DataFusion
 * `TableProvider` with DV row-skipping):
 *
 *   spark.read.format("graft").load(tableRoot)
 *
 * reads the latest manifest snapshot with
 *  - COLUMN PRUNING pushed to the parquet scan (the reader requests the
 *    pruned subset of the file schema — untouched columns never decode),
 *  - FILTER PUSHDOWN as manifest min/max FILE pruning (inexact, like
 *    the reference's `supports_filters_pushdown`: pushed filters prune
 *    whole files, Spark re-evaluates them on the surviving rows),
 *  - DELETION VECTORS applied inside the reader as positional skips —
 *    the `RowSelection` analogue (`table_provider.rs:140-167`): each
 *    partition carries only its own file's roaring blob,
 *  - one InputPartition per data file (files are written ~rowsPerFile
 *    ≈ 128 MiB, the natural split granularity at cluster scale),
 *  - AGGREGATE PUSHDOWN: unfiltered global COUNT(*)/MIN/MAX are
 *    answered straight from the manifest (row counts minus DV
 *    cardinality; per-file min/max stats) — zero parquet bytes read,
 *    the metadata-only fast path that matters most at 100 TB,
 *  - LIMIT PUSHDOWN: plans only enough files to cover the limit and
 *    caps each reader (Spark keeps the final global Limit).
 *
 * Scope: flat relational schemas (the types `statsComparable` covers,
 * plus binary); nested/decimal columns stay on the library read path
 * (`GraftTable.read`). The committed snapshot only — the in-memory
 * tail needs the live table object (S11 union read).
 */
class GraftDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  private def root(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft source needs a path"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftSparkTable.load(root(options)).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraftSparkTable(properties.get("path"))
}

private[graft] object GraftSparkTable {
  def load(root: String): Manifest =
    ManifestLog.loadLatest(root).getOrElse(
      throw new IllegalArgumentException(s"no graft manifest under $root"))
}

private[graft] class GraftSparkTable(root: String)
    extends Table with SupportsRead {
  private lazy val manifest = GraftSparkTable.load(root)
  override def name(): String = s"graft.`$root`"
  override def schema(): StructType = manifest.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(root, manifest)
}

private[graft] class GraftScanBuilder(root: String, manifest: Manifest)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit {
  private val tableSchema = manifest.schema
  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty
  private var aggPushed: Option[Aggregation] = scala.None
  private var limit: Long = -1L

  /** Accept the filters usable for min/max file pruning; ALL filters
   *  are returned as residual — pruning is inexact by design (the
   *  reference reports Inexact the same way, `table_provider.rs:82-88`)
   *  and Spark re-evaluates on the surviving rows. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(GraftScan.prunable(tableSchema, _))
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Unfiltered global COUNT(*)/MIN/MAX answered from the manifest.
   *  Filters make stat-pruning inexact, so any pushed filter disables
   *  this (Spark also never offers aggregates past a residual Filter);
   *  MIN/MAX additionally require a delete-free snapshot — a DV could
   *  mask exactly the extreme row. The one emitted row is the FINAL
   *  answer (complete pushdown), and is equally valid as a partial
   *  buffer if Spark keeps its own agg. */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    pushed.isEmpty && GraftAggScan.supported(manifest, agg)
  override def pushAggregation(agg: Aggregation): Boolean = {
    val ok = pushed.isEmpty && GraftAggScan.supported(manifest, agg)
    if (ok) aggPushed = Some(agg)
    ok
  }

  /** Partial limit push (default isPartiallyPushed): plan only enough
   *  files to cover `l` live rows; Spark applies the exact global cut. */
  override def pushLimit(l: Int): Boolean = { limit = l.toLong; true }

  override def build(): Scan = aggPushed match {
    case Some(a) => new GraftAggScan(manifest, a)
    case scala.None => new GraftScan(root, manifest, required, pushed, limit)
  }
}

private[sources] object GraftScan {
  /** A filter we can evaluate against per-file (min, max) stats. */
  def prunable(schema: StructType, f: Filter): Boolean = {
    def ok(col: String, v: Any): Boolean =
      schema.fields.find(_.name == col).exists(fd =>
        GraftTable.statsComparable(fd.dataType) && coerce(fd.dataType, v).isDefined)
    f match {
      case EqualTo(c, v) => ok(c, v)
      case GreaterThan(c, v) => ok(c, v)
      case GreaterThanOrEqual(c, v) => ok(c, v)
      case LessThan(c, v) => ok(c, v)
      case LessThanOrEqual(c, v) => ok(c, v)
      case _ => false
    }
  }

  /** Normalize a pushed literal to the column's stat type (filter
   *  literals may be narrower/wider than the column — Int vs Long). */
  def coerce(dt: DataType, v: Any): Option[Any] = (dt, v) match {
    case (_, null) => None
    case (LongType, n: Number) => Some(n.longValue())
    case (IntegerType, n: Number) => Some(n.intValue())
    case (ShortType, n: Number) => Some(n.shortValue())
    case (DoubleType, n: Number) => Some(n.doubleValue())
    case (FloatType, n: Number) => Some(n.floatValue())
    case (StringType, s) => Some(s.toString)
    case (BooleanType, b: java.lang.Boolean) => Some(b.booleanValue())
    case (DateType, d: java.sql.Date) => Some(d)
    case (TimestampType, t: java.sql.Timestamp) => Some(t)
    case _ => None
  }

  /** Can `e` possibly contain rows passing `f`? Missing stats => yes. */
  def mayMatch(schema: StructType, e: DataFileEntry, f: Filter): Boolean = {
    def bounds(col: String): Option[(Any, Any, Ordering[Any])] = for {
      fd <- schema.fields.find(_.name == col)
      s <- e.stats.get(col)
      if s.length == 2
    } yield (GraftTable.parseStat(fd.dataType, s.head),
      GraftTable.parseStat(fd.dataType, s(1)),
      GraftTable.anyOrdering(fd.dataType))
    def cv(col: String, v: Any): Option[Any] =
      schema.fields.find(_.name == col).flatMap(fd => coerce(fd.dataType, v))
    f match {
      case EqualTo(c, v) => (bounds(c), cv(c, v)) match {
        case (Some((mn, mx, ord)), Some(x)) => ord.lteq(mn, x) && ord.gteq(mx, x)
        case _ => true
      }
      case GreaterThan(c, v) => (bounds(c), cv(c, v)) match {
        case (Some((_, mx, ord)), Some(x)) => ord.gt(mx, x)
        case _ => true
      }
      case GreaterThanOrEqual(c, v) => (bounds(c), cv(c, v)) match {
        case (Some((_, mx, ord)), Some(x)) => ord.gteq(mx, x)
        case _ => true
      }
      case LessThan(c, v) => (bounds(c), cv(c, v)) match {
        case (Some((mn, _, ord)), Some(x)) => ord.lt(mn, x)
        case _ => true
      }
      case LessThanOrEqual(c, v) => (bounds(c), cv(c, v)) match {
        case (Some((mn, _, ord)), Some(x)) => ord.lteq(mn, x)
        case _ => true
      }
      case _ => true
    }
  }
}

private[sources] class GraftScan(root: String, manifest: Manifest,
    required: StructType, pushed: Array[Filter], limit: Long = -1L)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftScan(files=${manifest.dataFiles.size}, " +
      s"pushed=[${pushed.mkString(", ")}], cols=${required.fieldNames.mkString(",")}" +
      (if (limit >= 0L) s", limit=$limit" else "") + ")"

  private lazy val statSurvivors: Seq[DataFileEntry] =
    manifest.dataFiles.filter(e =>
      pushed.forall(f => GraftScan.mayMatch(manifest.schema, e, f)))

  // With a pushed limit (only offered with no residual filters), stop
  // planning files once their live rows cover it.
  private lazy val survivors: Seq[DataFileEntry] =
    if (limit < 0L) statSurvivors
    else {
      var acc = 0L
      statSurvivors.takeWhile { e =>
        val take = acc < limit
        acc += e.rows - e.deletes
        take
      }
    }

  // per-data-file DV blobs from the GDV1 sidecars; each partition
  // ships only its own file's bitmap
  private lazy val dvBlobs: Map[String, Array[Byte]] = {
    val merged = scala.collection.mutable.HashMap[String, Roaring64Bitmap]()
    manifest.dvFiles.foreach { f =>
      DvSidecar.read(s"$root/dv/$f").foreach { case (file, bm) =>
        merged.get(file) match {
          case Some(acc) => acc.or(bm)
          case scala.None => merged(file) = bm
        }
      }
    }
    merged.map { case (f, bm) => f -> DvCache.serialize(bm) }.toMap
  }

  override def planInputPartitions(): Array[InputPartition] =
    survivors.map { e =>
      GraftInputPartition(s"$root/data/${e.path}", e.rows,
        dvBlobs.getOrElse(e.path, null), limit): InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(required.json,
      manifest.schema.fields
        .map(f => f.name -> graft.model.SchemaDsl.physicalName(f)).toMap)

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(survivors.map(_.bytes).sum)
    override def numRows(): OptionalLong =
      OptionalLong.of(survivors.map(e => e.rows - e.deletes).sum)
  }
}

/**
 * Metadata-only aggregate scan: the whole result is computed on the
 * driver from the manifest — COUNT(*) as Σ(rows − dvDeletes) per file,
 * MIN/MAX by folding the per-file stats — and shipped to one trivial
 * partition. At 100 TB this answers `SELECT count(*) FROM t` (the
 * canonical freshness probe, reference `table_provider.rs`'s
 * statistics path) without touching a single parquet byte.
 */
private[sources] class GraftAggScan(manifest: Manifest, agg: Aggregation)
    extends Scan with Batch {
  private val funcs: Seq[AggregateFunc] = agg.aggregateExpressions.toSeq

  override def readSchema(): StructType = GraftAggScan.schemaFor(manifest.schema, funcs)
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftAggScan(${funcs.mkString(", ")}) [manifest-only, 0 files read]"

  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftAggPartition(GraftAggScan.values(manifest, funcs)))
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftAggReaderFactory
}

private[sources] object GraftAggScan {
  private def named(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames.head)
      case _ => scala.None
    }

  private def colOf(f: AggregateFunc): Option[String] = f match {
    case m: Min => named(m.column)
    case m: Max => named(m.column)
    case _ => scala.None
  }

  /** Global (no GROUP BY) COUNT(*)/MIN(col)/MAX(col) only; MIN/MAX
   *  need a delete-free snapshot plus stats on every file for the
   *  column (a DV could mask exactly the extreme row; a stat-less
   *  file hides its range). */
  def supported(manifest: Manifest, agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case f @ (_: Min | _: Max) =>
          manifest.dataFiles.forall(_.deletes == 0L) && colOf(f).exists { c =>
            manifest.schema.fields.find(_.name == c)
              .exists(fd => GraftTable.statsComparable(fd.dataType)) &&
              manifest.dataFiles.forall(e => e.stats.get(c).exists(_.length == 2))
          }
        case _ => false
      }

  def schemaFor(schema: StructType, funcs: Seq[AggregateFunc]): StructType =
    StructType(funcs.zipWithIndex.map {
      case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
      case (f, i) =>
        val dt = colOf(f).flatMap(c => schema.fields.find(_.name == c)).map(_.dataType)
          .getOrElse(throw new IllegalStateException(s"unsupported pushed agg $f"))
        StructField(s"agg_$i", dt, nullable = true)
    })

  /** Final values in Spark internal representation (UTF8String, micros,
   *  days) — computed entirely from the manifest. */
  def values(manifest: Manifest, funcs: Seq[AggregateFunc]): Array[Any] = {
    def extreme(f: AggregateFunc, isMin: Boolean): Any = {
      val c = colOf(f).get
      val fd = manifest.schema.fields.find(_.name == c).get
      implicit val ord: Ordering[Any] = GraftTable.anyOrdering(fd.dataType)
      val perFile = manifest.dataFiles
        .map(e => GraftTable.parseStat(fd.dataType, e.stats(c)(if (isMin) 0 else 1)))
      if (perFile.isEmpty) null
      else CatalystTypeConverters.createToCatalystConverter(fd.dataType)(
        if (isMin) perFile.min else perFile.max)
    }
    funcs.map {
      case _: CountStar => java.lang.Long.valueOf(manifest.liveRows)
      case f: Min => extreme(f, isMin = true)
      case f: Max => extreme(f, isMin = false)
      case other => throw new IllegalStateException(s"unsupported pushed agg $other")
    }.toArray
  }
}

private[sources] final case class GraftAggPartition(values: Array[Any])
    extends InputPartition

private[sources] class GraftAggReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val vals = partition.asInstanceOf[GraftAggPartition].values
      private var done = false
      override def next(): Boolean = if (done) false else { done = true; true }
      override def get(): InternalRow = new GenericInternalRow(vals)
      override def close(): Unit = ()
    }
}

private[sources] final case class GraftInputPartition(
    path: String, rows: Long, dvBlob: Array[Byte],
    cap: Long = -1L) extends InputPartition

private[sources] class GraftReaderFactory(requiredJson: String,
    physNames: Map[String, String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftPartitionReader(partition.asInstanceOf[GraftInputPartition],
      DataType.fromJson(requiredJson).asInstanceOf[StructType], physNames)
}

/**
 * Executor-side reader: parquet Group API over the PRUNED subset of the
 * file schema (column pruning happens in parquet-mr — unrequested
 * columns never decode), positional DV skip via the partition's roaring
 * blob, value conversion straight to Spark internal representations.
 */
private[sources] class GraftPartitionReader(part: GraftInputPartition,
    required: StructType, physNames: Map[String, String])
    extends PartitionReader[InternalRow] {

  private val dv: Roaring64Bitmap =
    if (part.dvBlob == null) null else DvCache.deserialize(part.dvBlob)
  private var pos = -1L
  private var emitted = 0L // pushed-limit cap (part.cap < 0 = unlimited)
  private var current: InternalRow = _

  private val conf = new Configuration()

  // Requested columns resolved against THIS file's physical schema
  // (column mapping: a table field is stored under its physical name;
  // a field absent from the file — written before an alterAddColumn,
  // or remapped after a drop+re-add — reads as null).
  private val resolved: Seq[(StructField, Option[PType])] =
    if (required.fields.isEmpty) Nil
    else {
      val inFile = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(part.path), conf)
      val footer = ParquetFileReader.open(inFile)
      val fileSchema = try footer.getFooter.getFileMetaData.getSchema
        finally footer.close()
      required.fields.toSeq.map { f =>
        val phys = physNames.getOrElse(f.name, f.name)
        f -> fileSchema.getFields.asScala.find(_.getName == phys)
      }
    }

  // COUNT(*)-style scans request zero columns (no parquet decode at
  // all), and a file holding NONE of the requested columns decodes
  // nothing either: emit (rows - deleted) synthetic rows
  private val syntheticRows = resolved.forall(_._2.isEmpty)
  private var emptyLeft: Long =
    if (!syntheticRows) 0L
    else {
      val live = part.rows - (if (dv == null) 0L else dv.getLongCardinality)
      if (part.cap >= 0L) math.min(live, part.cap) else live
    }

  private val (reader, converters) =
    if (syntheticRows) (null, null)
    else {
      val present: Seq[PType] = resolved.collect { case (_, Some(pt)) => pt }
      val requested = new MessageType("graft_projection", present.asJava)
      conf.set(ReadSupport.PARQUET_READ_SCHEMA, requested.toString)
      val r = org.apache.parquet.hadoop.ParquetReader
        .builder(new GroupReadSupport(), new org.apache.hadoop.fs.Path(part.path))
        .withConf(conf)
        .build()
      var gi = -1 // index into the REQUESTED (present-only) projection
      val convs = resolved.map {
        case (sf, Some(pt)) =>
          gi += 1
          GraftPartitionReader.converter(sf.dataType, pt, gi)
        case (_, scala.None) => (_: Group) => null
      }
      (r, convs)
    }

  override def next(): Boolean = {
    if (syntheticRows) {
      if (emptyLeft <= 0L) return false
      emptyLeft -= 1
      current =
        if (required.fields.isEmpty) new GenericInternalRow(0)
        else new GenericInternalRow(Array.fill[Any](required.fields.length)(null))
      return true
    }
    if (part.cap >= 0L && emitted >= part.cap) return false
    var g: Group = reader.read()
    pos += 1
    while (g != null && dv != null && dv.contains(pos)) {
      g = reader.read()
      pos += 1
    }
    if (g == null) return false
    val vals = new Array[Any](converters.length)
    var i = 0
    while (i < converters.length) {
      vals(i) = converters(i)(g)
      i += 1
    }
    current = new GenericInternalRow(vals)
    emitted += 1
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = if (reader != null) reader.close()
}

private[sources] object GraftPartitionReader {
  private val JulianEpochDay = 2440588L
  private val MicrosPerDay = 86400000000L

  /** Group -> Spark internal value for requested field `i`. */
  def converter(dt: DataType, pt: PType, i: Int): Group => Any = {
    val prim = pt.asPrimitiveType().getPrimitiveTypeName
    val base: Group => Any = dt match {
      case LongType => g => g.getLong(i, 0)
      case IntegerType => g => g.getInteger(i, 0)
      case ShortType => g => g.getInteger(i, 0).toShort
      case DoubleType => g => g.getDouble(i, 0)
      case FloatType => g => g.getFloat(i, 0)
      case BooleanType => g => g.getBoolean(i, 0)
      case StringType => g => UTF8String.fromBytes(g.getBinary(i, 0).getBytes)
      case BinaryType => g => g.getBinary(i, 0).getBytes
      case DateType => g => g.getInteger(i, 0) // internal: days since epoch
      case TimestampType if prim == PrimitiveTypeName.INT96 => g => {
        // spark legacy INT96: 8B little-endian nano-of-day + 4B julian day
        val b = java.nio.ByteBuffer.wrap(g.getInt96(i, 0).getBytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val nanos = b.getLong
        val julian = b.getInt
        (julian - JulianEpochDay) * MicrosPerDay + nanos / 1000L
      }
      case TimestampType => g => {
        val raw = g.getLong(i, 0)
        pt.getLogicalTypeAnnotation match {
          case ts: TimestampLogicalTypeAnnotation => ts.getUnit match {
            case org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.MILLIS => raw * 1000L
            case org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.NANOS => raw / 1000L
            case _ => raw // MICROS — Spark's internal representation
          }
          case _ => raw
        }
      }
      case other => throw new UnsupportedOperationException(
        s"graft DSv2 reader does not support $other; use GraftTable.read")
    }
    g => if (g.getFieldRepetitionCount(i) == 0) null else base(g)
  }
}
