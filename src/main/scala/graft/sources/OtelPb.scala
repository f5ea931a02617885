package graft.sources

import java.io.ByteArrayOutputStream

import graft.streaming.CdcPipeline
import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/**
 * OTLP/HTTP **protobuf** metrics decoding (S6's primary wire format):
 * the reference service accepts binary `ExportMetricsServiceRequest`
 * bodies and converts them to rows (`moonlink_service/src/otel/
 * service.rs`, `otel_to_moonlink_pb.rs`); the JSON encoding handled by
 * [[OtelIngest]] is OTLP's secondary representation. This decoder
 * reads the proto3 wire format directly (varint / fixed64 / packed
 * repeated — same dependency-free approach as [[ProtoIngest]]; field
 * numbers from the public opentelemetry-proto definitions) and emits
 * one row per data point in [[OtelSchema.schema]] order, so decoded
 * frames feed the exact same table/ingest path as JSON payloads.
 *
 * Gauge, sum and histogram points convert (the three the reference's
 * converter handles); exponential-histogram and summary points are
 * skipped. Scale shape: payload decode is a distributed map over the
 * payload frame — executors decode, the driver never sees a byte.
 */
object OtelPb {

  // ---- proto3 wire reader ---------------------------------------------
  private final class R(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        val b = buf(pos); pos += 1
        v |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
        require(shift < 64, "varint too long")
      }
      v
    }
    def fixed64(): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xFFL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def fixed32(): Int = {
      val v = (buf(pos) & 0xFF) | ((buf(pos + 1) & 0xFF) << 8) |
        ((buf(pos + 2) & 0xFF) << 16) | ((buf(pos + 3) & 0xFF) << 24)
      pos += 4; v
    }
    def bytes(): Array[Byte] = {
      val n = varint().toInt
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n; out
    }
    def sub(): R = {
      val n = varint().toInt
      val r = new R(buf, pos, pos + n)
      pos += n; r
    }
    def str(): String = new String(bytes(), java.nio.charset.StandardCharsets.UTF_8)
    def skip(wt: Int): Unit = wt match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => val n = varint().toInt; pos += n
      case 5 => pos += 4
      case other => sys.error(s"unsupported wire type $other")
    }
  }

  // ---- message decoders (field numbers per opentelemetry-proto) -------

  /** KeyValue{key=1, value=2(AnyValue{string=1,bool=2,int=3,double=4})}
   *  → the table's attr struct (string/bool/int/double union). */
  private def attr(r: R): Row = {
    var key: String = null
    var s: String = null; var b: java.lang.Boolean = null
    var i: java.lang.Long = null; var d: java.lang.Double = null
    while (r.hasMore) {
      val tag = r.varint(); val f = (tag >> 3).toInt; val wt = (tag & 7).toInt
      f match {
        case 1 => key = r.str()
        case 2 =>
          val v = r.sub()
          while (v.hasMore) {
            val t2 = v.varint(); val f2 = (t2 >> 3).toInt
            f2 match {
              case 1 => s = v.str()
              case 2 => b = v.varint() != 0L
              case 3 => i = v.varint()
              case 4 => d = java.lang.Double.longBitsToDouble(v.fixed64())
              case _ => v.skip((t2 & 7).toInt) // array/kvlist/bytes: not in the table union
            }
          }
        case _ => r.skip(wt)
      }
    }
    Row(key, Row(s, b, i, d))
  }

  private def attrs(r: R, acc: mutable.ArrayBuffer[Row]): Unit =
    acc += attr(r)

  /** packed-or-unpacked repeated fixed64 */
  private def repFixed64(r: R, wt: Int, acc: mutable.ArrayBuffer[Long]): Unit =
    if (wt == 1) acc += r.fixed64()
    else { val p = r.sub(); while (p.hasMore) acc += p.fixed64() }

  private def repDouble(r: R, wt: Int, acc: mutable.ArrayBuffer[Double]): Unit =
    if (wt == 1) acc += java.lang.Double.longBitsToDouble(r.fixed64())
    else {
      val p = r.sub()
      while (p.hasMore) acc += java.lang.Double.longBitsToDouble(p.fixed64())
    }

  /** Exemplar{time=2(fixed64), as_double=3, span_id=4, trace_id=5,
   *  as_int=6(sfixed64), filtered_attributes=7} → exemplarList struct
   *  order (time, as_int, as_double, trace_id, span_id, attrs) —
   *  `otel_to_moonlink_pb.rs:229` exemplars_to_rowvalue_array. */
  private def exemplar(r: R): Row = {
    var time = 0L
    var aI: java.lang.Long = null; var aD: java.lang.Double = null
    var traceId: Array[Byte] = null; var spanId: Array[Byte] = null
    val as = mutable.ArrayBuffer[Row]()
    while (r.hasMore) {
      val tag = r.varint(); val f = (tag >> 3).toInt; val wt = (tag & 7).toInt
      f match {
        case 2 => time = r.fixed64()
        case 3 => aD = java.lang.Double.longBitsToDouble(r.fixed64())
        case 4 => spanId = r.bytes()
        case 5 => traceId = r.bytes()
        case 6 => aI = r.fixed64()
        case 7 => attrs(r.sub(), as)
        case _ => r.skip(wt)
      }
    }
    Row(time, aI, aD, traceId, spanId, as.toSeq)
  }

  /** EntityRef{schema_url=1, type=2, id_keys=3, description_keys=4}
   *  kept raw; values resolve later against the resource attrs. */
  private final case class EntRef(schemaUrl: String, typ: String,
      idKeys: Seq[String], descKeys: Seq[String])

  private def entityRef(r: R): EntRef = {
    var su: String = null; var ty: String = null
    val ids = mutable.ArrayBuffer[String]()
    val descs = mutable.ArrayBuffer[String]()
    while (r.hasMore) {
      val tag = r.varint(); val f = (tag >> 3).toInt; val wt = (tag & 7).toInt
      f match {
        case 1 => su = r.str()
        case 2 => ty = r.str()
        case 3 => ids += r.str()
        case 4 => descs += r.str()
        case _ => r.skip(wt)
      }
    }
    EntRef(su, ty, ids.toSeq, descs.toSeq)
  }

  /** Entity refs → entityRefList rows: id/description KEYS resolve to
   *  (key, value) pairs against the resource attribute map; a key with
   *  no matching attribute gets the all-null value struct — exactly
   *  `entityrefs_to_rowvalue_array` (`otel_to_moonlink_pb.rs:166`). */
  private def resolveEntityRefs(refs: Seq[EntRef],
      resAttrs: Seq[Row]): Seq[Row] = {
    val nullVal = Row(null, null, null, null)
    // FIRST occurrence wins on (wire-legal but spec-discouraged)
    // duplicate attr keys — the JSON path's element_at(filter, 1) does
    // the same, so both transports land identical rows (the reference
    // asserts no duplicates at all, otel_to_moonlink_pb.rs:168)
    val attrMap = resAttrs.foldLeft(Map.empty[String, Row]) { (m, a) =>
      val k = a.getString(0)
      if (m.contains(k)) m else m + (k -> a.getStruct(1))
    }
    refs.map { er =>
      def pairs(keys: Seq[String]): Seq[Row] =
        keys.map(k => Row(k, attrMap.getOrElse(k, nullVal)))
      Row(if (er.typ == null || er.typ.isEmpty) null else er.typ,
        pairs(er.idKeys), pairs(er.descKeys),
        if (er.schemaUrl == null || er.schemaUrl.isEmpty) null
        else er.schemaUrl)
    }
  }

  private final case class NumPoint(
      start: java.lang.Long, time: Long, asDouble: java.lang.Double,
      asInt: java.lang.Long, attrs: Seq[Row], flags: java.lang.Integer,
      exemplars: Seq[Row])

  /** NumberDataPoint{start=2,time=3,as_double=4,exemplars=5,
   *  as_int=6(sfixed64),attributes=7,flags=8} */
  private def numberPoint(r: R): NumPoint = {
    var start: java.lang.Long = null; var time = 0L
    var aD: java.lang.Double = null; var aI: java.lang.Long = null
    var flags: java.lang.Integer = null
    val as = mutable.ArrayBuffer[Row]()
    val exs = mutable.ArrayBuffer[Row]()
    while (r.hasMore) {
      val tag = r.varint(); val f = (tag >> 3).toInt; val wt = (tag & 7).toInt
      f match {
        case 2 => start = r.fixed64()
        case 3 => time = r.fixed64()
        case 4 => aD = java.lang.Double.longBitsToDouble(r.fixed64())
        case 5 => exs += exemplar(r.sub())
        case 6 => aI = r.fixed64()
        case 7 => attrs(r.sub(), as)
        case 8 => flags = r.varint().toInt
        case _ => r.skip(wt)
      }
    }
    NumPoint(start, time, aD, aI, as.toSeq, flags, exs.toSeq)
  }

  private final case class HistPoint(
      start: java.lang.Long, time: Long, count: Long,
      sum: java.lang.Double, buckets: Seq[Long], bounds: Seq[Double],
      min: java.lang.Double, max: java.lang.Double, attrs: Seq[Row],
      flags: java.lang.Integer, exemplars: Seq[Row])

  /** HistogramDataPoint{start=2,time=3,count=4,sum=5,bucket_counts=6,
   *  explicit_bounds=7,exemplars=8,attributes=9,flags=10,min=11,max=12} */
  private def histPoint(r: R): HistPoint = {
    var start: java.lang.Long = null; var time = 0L; var count = 0L
    var sum: java.lang.Double = null
    var mn: java.lang.Double = null; var mx: java.lang.Double = null
    var flags: java.lang.Integer = null
    val bk = mutable.ArrayBuffer[Long]()
    val bd = mutable.ArrayBuffer[Double]()
    val as = mutable.ArrayBuffer[Row]()
    val exs = mutable.ArrayBuffer[Row]()
    while (r.hasMore) {
      val tag = r.varint(); val f = (tag >> 3).toInt; val wt = (tag & 7).toInt
      f match {
        case 2  => start = r.fixed64()
        case 3  => time = r.fixed64()
        case 4  => count = r.fixed64()
        case 5  => sum = java.lang.Double.longBitsToDouble(r.fixed64())
        case 6  => repFixed64(r, wt, bk)
        case 7  => repDouble(r, wt, bd)
        case 8  => exs += exemplar(r.sub())
        case 9  => attrs(r.sub(), as)
        case 10 => flags = r.varint().toInt
        case 11 => mn = java.lang.Double.longBitsToDouble(r.fixed64())
        case 12 => mx = java.lang.Double.longBitsToDouble(r.fixed64())
        case _  => r.skip(wt)
      }
    }
    HistPoint(start, time, count, sum, bk.toSeq, bd.toSeq, mn, mx,
      as.toSeq, flags, exs.toSeq)
  }

  /** Decode one binary ExportMetricsServiceRequest into data-point rows
   *  in [[OtelSchema.schema]] order. */
  def decodeRequest(bytes: Array[Byte]): Seq[Row] = {
    val out = mutable.ArrayBuffer[Row]()
    val req = new R(bytes, 0, bytes.length)
    while (req.hasMore) {
      val tag = req.varint(); val f = (tag >> 3).toInt
      if (f != 1) req.skip((tag & 7).toInt)
      else {
        // ResourceMetrics{resource=1, scope_metrics=2, schema_url=3}
        val rm = req.sub()
        var schemaUrl: String = null
        val resAttrs = mutable.ArrayBuffer[Row]()
        val entRefs = mutable.ArrayBuffer[EntRef]()
        // (scopeName, scopeVersion, scopeAttrs, metricsReaders)
        val scopes = mutable.ArrayBuffer[R]()
        while (rm.hasMore) {
          val t = rm.varint(); val f2 = (t >> 3).toInt
          f2 match {
            case 1 =>
              // Resource{attributes=1, entity_refs=3}
              val res = rm.sub()
              while (res.hasMore) {
                val t3 = res.varint(); val f3 = (t3 >> 3).toInt
                f3 match {
                  case 1 => attrs(res.sub(), resAttrs)
                  case 3 => entRefs += entityRef(res.sub())
                  case _ => res.skip((t3 & 7).toInt)
                }
              }
            case 2 => scopes += rm.sub()
            case 3 => schemaUrl = rm.str()
            case _ => rm.skip((t & 7).toInt)
          }
        }
        val entityRows = resolveEntityRefs(entRefs.toSeq, resAttrs.toSeq)
        scopes.foreach { sm =>
          // ScopeMetrics{scope=1{name=1,version=2,attributes=3}, metrics=2}
          var sName: String = null; var sVer: String = null
          val sAttrs = mutable.ArrayBuffer[Row]()
          val metrics = mutable.ArrayBuffer[R]()
          while (sm.hasMore) {
            val t = sm.varint(); val f2 = (t >> 3).toInt
            f2 match {
              case 1 =>
                val sc = sm.sub()
                while (sc.hasMore) {
                  val t3 = sc.varint(); val f3 = (t3 >> 3).toInt
                  f3 match {
                    case 1 => sName = sc.str()
                    case 2 => sVer = sc.str()
                    case 3 => attrs(sc.sub(), sAttrs)
                    case _ => sc.skip((t3 & 7).toInt)
                  }
                }
              case 2 => metrics += sm.sub()
              case _ => sm.skip((t & 7).toInt)
            }
          }
          metrics.foreach { m =>
            // Metric{name=1,description=2,unit=3; oneof gauge=5,sum=7,
            // histogram=9 (exp-histogram=10/summary=11 skipped)}
            var name: String = null; var desc: String = null
            var unit: String = null
            var kind: String = null
            var isMono: java.lang.Boolean = null
            var temp: java.lang.Integer = null
            val nums = mutable.ArrayBuffer[NumPoint]()
            val hists = mutable.ArrayBuffer[HistPoint]()
            while (m.hasMore) {
              val t = m.varint(); val f2 = (t >> 3).toInt
              f2 match {
                case 1 => name = m.str()
                case 2 => desc = m.str()
                case 3 => unit = m.str()
                case 5 =>
                  kind = "gauge"
                  val g = m.sub()
                  while (g.hasMore) {
                    val t3 = g.varint()
                    if ((t3 >> 3).toInt == 1) nums += numberPoint(g.sub())
                    else g.skip((t3 & 7).toInt)
                  }
                case 7 =>
                  kind = "sum"
                  val su = m.sub()
                  while (su.hasMore) {
                    val t3 = su.varint(); val f3 = (t3 >> 3).toInt
                    f3 match {
                      case 1 => nums += numberPoint(su.sub())
                      case 2 => temp = su.varint().toInt
                      case 3 => isMono = su.varint() != 0L
                      case _ => su.skip((t3 & 7).toInt)
                    }
                  }
                case 9 =>
                  kind = "histogram"
                  val h = m.sub()
                  while (h.hasMore) {
                    val t3 = h.varint(); val f3 = (t3 >> 3).toInt
                    f3 match {
                      case 1 => hists += histPoint(h.sub())
                      case 2 => temp = h.varint().toInt
                      case _ => h.skip((t3 & 7).toInt)
                    }
                  }
                case _ => m.skip((t & 7).toInt)
              }
            }
            def common(start: java.lang.Long, time: Long, attrsV: Seq[Row],
                flags: java.lang.Integer) = Seq[Any](
              schemaUrl, resAttrs.toSeq, entityRows, sName, sVer, sAttrs.toSeq,
              name, desc, unit, kind, start, time, attrsV, flags)
            nums.foreach { p =>
              out += Row.fromSeq(common(p.start, p.time, p.attrs, p.flags) ++
                Seq[Any](p.asDouble, p.asInt,
                  if (kind == "sum") isMono else null,
                  if (kind == "sum") temp else null,
                  p.exemplars,
                  null, null, null, null, null, null, null))
            }
            hists.foreach { p =>
              out += Row.fromSeq(common(p.start, p.time, p.attrs, p.flags) ++
                Seq[Any](null, null, null, temp, null,
                  p.count, p.sum, p.buckets, p.bounds, p.min, p.max,
                  p.exemplars))
            }
          }
        }
      }
    }
    out.toSeq
  }

  /** Distributed decode: one row per data point across the cluster. */
  def metricsToRows(spark: SparkSession, payloads: DataFrame,
      payloadCol: String): DataFrame = {
    val rdd = payloads.select(col(payloadCol)).as(Encoders.BINARY).rdd
      .flatMap(decodeRequest)
    spark.createDataFrame(rdd, OtelSchema.schema)
  }

  /** Binary-OTLP append ingest — the protobuf twin of
   *  [[OtelIngest.ingestPayloads]]. */
  def ingestPayloads(table: GraftTable, payloads: DataFrame,
      payloadCol: String, startLsn: Long): Long = {
    val ev = metricsToRows(table.spark, payloads, payloadCol)
      .withColumn("_op", lit("i"))
      .withColumn("_lsn", monotonically_increasing_id() + startLsn)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try CdcPipeline.applyBatch(table, ev)
    finally ev.unpersist()
  }

  // ---- encoder (producer half; round-trip tests + payload synthesis) --

  object Enc {
    private def vint(o: ByteArrayOutputStream, v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { o.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      o.write(v.toInt)
    }
    private def tag(o: ByteArrayOutputStream, f: Int, wt: Int): Unit =
      vint(o, (f.toLong << 3) | wt)
    private def f64(o: ByteArrayOutputStream, f: Int, v: Long): Unit = {
      tag(o, f, 1)
      var i = 0
      while (i < 8) { o.write(((v >>> (8 * i)) & 0xFF).toInt); i += 1 }
    }
    private def dbl(o: ByteArrayOutputStream, f: Int, v: Double): Unit =
      f64(o, f, java.lang.Double.doubleToLongBits(v))
    private def len(o: ByteArrayOutputStream, f: Int, b: Array[Byte]): Unit = {
      tag(o, f, 2); vint(o, b.length); o.write(b, 0, b.length)
    }
    private def str(o: ByteArrayOutputStream, f: Int, s: String): Unit =
      len(o, f, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    private def msg(f: => ByteArrayOutputStream => Unit): Array[Byte] = {
      val o = new ByteArrayOutputStream(); f(o); o.toByteArray
    }

    def strAttr(key: String, v: String): Array[Byte] = msg { o =>
      str(o, 1, key); len(o, 2, msg(o2 => str(o2, 1, v)))
    }
    def intAttr(key: String, v: Long): Array[Byte] = msg { o =>
      str(o, 1, key); len(o, 2, msg(o2 => { tag(o2, 3, 0); vint(o2, v) }))
    }
    /** Exemplar{time=2, as_double=3, span_id=4, trace_id=5,
     *  filtered_attributes=7} (double-valued form). */
    def exemplar(timeNano: Long, value: Double, traceId: Array[Byte],
        spanId: Array[Byte],
        filteredAttrs: Seq[Array[Byte]] = Seq.empty): Array[Byte] = msg { o =>
      f64(o, 2, timeNano); dbl(o, 3, value)
      if (spanId != null) len(o, 4, spanId)
      if (traceId != null) len(o, 5, traceId)
      filteredAttrs.foreach(len(o, 7, _))
    }
    /** EntityRef{schema_url=1, type=2, id_keys=3, description_keys=4}. */
    def entityRef(typ: String, idKeys: Seq[String],
        descriptionKeys: Seq[String] = Seq.empty,
        schemaUrl: String = null): Array[Byte] = msg { o =>
      if (schemaUrl != null) str(o, 1, schemaUrl)
      str(o, 2, typ)
      idKeys.foreach(str(o, 3, _))
      descriptionKeys.foreach(str(o, 4, _))
    }
    def gaugePoint(timeNano: Long, value: Double,
        attrs: Seq[Array[Byte]],
        exemplars: Seq[Array[Byte]] = Seq.empty): Array[Byte] = msg { o =>
      f64(o, 3, timeNano); dbl(o, 4, value)
      exemplars.foreach(len(o, 5, _))
      attrs.foreach(len(o, 7, _))
    }
    def sumIntPoint(timeNano: Long, value: Long,
        attrs: Seq[Array[Byte]]): Array[Byte] = msg { o =>
      f64(o, 3, timeNano); f64(o, 6, value)
      attrs.foreach(len(o, 7, _))
    }
    def histogramPoint(timeNano: Long, count: Long, sum: Double,
        bounds: Seq[Double], buckets: Seq[Long],
        exemplars: Seq[Array[Byte]] = Seq.empty): Array[Byte] = msg { o =>
      f64(o, 3, timeNano); f64(o, 4, count); dbl(o, 5, sum)
      // packed encodings, as real exporters emit
      len(o, 6, msg(o2 => buckets.foreach { b =>
        var i = 0; while (i < 8) { o2.write(((b >>> (8 * i)) & 0xFF).toInt); i += 1 }
      }))
      len(o, 7, msg(o2 => bounds.foreach { b =>
        val v = java.lang.Double.doubleToLongBits(b)
        var i = 0; while (i < 8) { o2.write(((v >>> (8 * i)) & 0xFF).toInt); i += 1 }
      }))
      exemplars.foreach(len(o, 8, _))
    }
    def gauge(name: String, unit: String,
        points: Seq[Array[Byte]]): Array[Byte] = msg { o =>
      str(o, 1, name); str(o, 3, unit)
      len(o, 5, msg(o2 => points.foreach(len(o2, 1, _))))
    }
    def sum(name: String, monotonic: Boolean, temporality: Int,
        points: Seq[Array[Byte]]): Array[Byte] = msg { o =>
      str(o, 1, name)
      len(o, 7, msg { o2 =>
        points.foreach(len(o2, 1, _))
        tag(o2, 2, 0); vint(o2, temporality)
        tag(o2, 3, 0); vint(o2, if (monotonic) 1 else 0)
      })
    }
    def histogram(name: String, temporality: Int,
        points: Seq[Array[Byte]]): Array[Byte] = msg { o =>
      str(o, 1, name)
      len(o, 9, msg { o2 =>
        points.foreach(len(o2, 1, _))
        tag(o2, 2, 0); vint(o2, temporality)
      })
    }
    /** One request: resource attrs (+ optional entity refs) + one
     *  scope + its metrics. */
    def request(resourceAttrs: Seq[Array[Byte]], scopeName: String,
        scopeVersion: String, metrics: Seq[Array[Byte]],
        schemaUrl: String = "https://opentelemetry.io/schemas/1.21.0",
        entityRefs: Seq[Array[Byte]] = Seq.empty)
        : Array[Byte] = msg { o =>
      len(o, 1, msg { rm =>
        len(rm, 1, msg { res =>
          resourceAttrs.foreach(len(res, 1, _))
          entityRefs.foreach(len(res, 3, _))
        })
        len(rm, 2, msg { sm =>
          len(sm, 1, msg { sc =>
            str(sc, 1, scopeName); str(sc, 2, scopeVersion)
          })
          metrics.foreach(len(sm, 2, _))
        })
        str(rm, 3, schemaUrl)
      })
    }
  }
}
