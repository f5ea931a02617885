package graft.format.delta

import com.fasterxml.jackson.databind.ObjectMapper
import graft.format.{Fio, Manifest}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets

/**
 * Delta Lake transaction-log export — the PUBLIC Delta protocol
 * (delta-io PROTOCOL.md), closing the S9 seam the same way the
 * Iceberg layer closed S8: the table's committed parquet files become
 * readable as a Delta table because the `_delta_log` follows the spec,
 * with no Delta jar involved (the reference feature-gates its own
 * delta sink behind an optional dependency,
 * `deltalake/deltalake_table_manager.rs`).
 *
 *  - commits: `_delta_log/%020d.json`, one JSON action per line;
 *    version 0 carries `protocol` (minReader 1 / minWriter 2) and
 *    `metaData` (uuid, parquet format, Spark-JSON schemaString,
 *    unpartitioned); later versions carry `add`/`remove` diffs with
 *    `dataChange:true` and per-file `stats` (numRecords + typed
 *    minValues/maxValues/nullCount, so Delta readers file-skip).
 *  - state reconstruction: replay all commit JSONs in version order;
 *    live files = adds minus removes by path (checkpoints are an
 *    optional optimization the spec lets readers live without).
 *  - concurrency: a commit file is claimed by atomic rename, which
 *    REFUSES to overwrite — exactly Delta's optimistic put-if-absent
 *    commit rule, so two writers can never both claim a version.
 *
 * Deletion vectors are NOT exported: graft DVs materialize into plain
 * parquet via compaction first (`optimize()`), so every exported file
 * is wholly live — `sync` enforces it. This keeps the export at
 * reader-version 1, readable by every Delta implementation ever
 * shipped, rather than the v3 DV feature-gate.
 */
private[graft] object DeltaLog {

  private val mapper = new ObjectMapper()

  def logDir(root: String): String = s"$root/_delta_log"

  def versions(root: String): Seq[Long] =
    Fio.list(logDir(root)).filter(_.endsWith(".json"))
      .flatMap(n => n.stripSuffix(".json").toLongOption).sorted

  /** `stats` keeps the RAW per-file stats JSON so checkpoints carry
   *  the full skipping metadata through, not just numRecords. */
  final case class DeltaFile(path: String, size: Long, numRecords: Long,
      stats: String = null)
  final case class DeltaState(version: Long, schemaString: String,
      files: Seq[DeltaFile])

  /** Replay the commit JSONs into the current table state. */
  def readState(root: String): DeltaState = {
    val vs = versions(root)
    require(vs.nonEmpty, s"no delta log under $root")
    var schema: String = null
    val live = scala.collection.mutable.LinkedHashMap[String, DeltaFile]()
    vs.foreach { v =>
      val body = Fio.readString(f"${logDir(root)}/$v%020d.json")
      body.split('\n').filter(_.nonEmpty).foreach { line =>
        val n = mapper.readTree(line)
        if (n.hasNonNull("metaData"))
          schema = n.get("metaData").get("schemaString").asText
        if (n.hasNonNull("add")) {
          val a = n.get("add")
          val raw = if (a.hasNonNull("stats")) a.get("stats").asText else null
          val stats = if (raw == null) null else mapper.readTree(raw)
          live(a.get("path").asText) = DeltaFile(a.get("path").asText,
            a.get("size").asLong,
            if (stats != null && stats.hasNonNull("numRecords"))
              stats.get("numRecords").asLong else -1L,
            raw)
        }
        if (n.hasNonNull("remove"))
          live.remove(n.get("remove").get("path").asText)
      }
    }
    require(schema != null, "delta log misses metaData")
    DeltaState(vs.last, schema, live.values.toSeq)
  }

  /** Full per-file `stats` JSON for an add action (the Delta
   *  protocol's file-skipping metadata; the reference collects the
   *  same through `deltalake/stats.rs`): numRecords + typed
   *  minValues / maxValues / nullCount per top-level column, derived
   *  from the manifest's stat strings. Bounds follow the same
   *  conservative contract the manifest does (string min may be a
   *  prefix ≤ the true min, string max a lifted bound ≥ the true max —
   *  exactly what Delta skipping needs). NaN float/double bounds are
   *  omitted. */
  private def statsJson(schema: org.apache.spark.sql.types.StructType,
      f: graft.format.DataFileEntry): String = {
    import org.apache.spark.sql.types._
    val o = mapper.createObjectNode()
    o.put("numRecords", f.rows)
    val mins = o.putObject("minValues")
    val maxs = o.putObject("maxValues")
    val nulls = o.putObject("nullCount")
    def put(node: com.fasterxml.jackson.databind.node.ObjectNode,
        fd: StructField, s: String): Unit = fd.dataType match {
      case LongType => node.put(fd.name, s.toLong)
      case IntegerType | ShortType => node.put(fd.name, s.toInt)
      case DoubleType => val d = s.toDouble
        if (!d.isNaN) node.put(fd.name, d)
      case FloatType => val fl = s.toFloat
        if (!fl.isNaN) node.put(fd.name, fl)
      case BooleanType => node.put(fd.name, s.toBoolean)
      case StringType | DateType => node.put(fd.name, s)
      case TimestampType => // ISO-8601 UTC instant, micros preserved
        node.put(fd.name,
          java.sql.Timestamp.valueOf(s).toInstant.toString)
      case _: DecimalType => node.put(fd.name, new java.math.BigDecimal(s))
      case _ => ()
    }
    schema.fields.foreach { fd =>
      f.nullsOf(fd.name).foreach(n => nulls.put(fd.name, n))
      f.stats.get(fd.name).filter(_.length == 2).foreach { b =>
        put(mins, fd, b.head); put(maxs, fd, b(1))
      }
    }
    mapper.writeValueAsString(o)
  }

  /** True when any log state exists — JSON commits OR a checkpoint
   *  whose pre-checkpoint JSONs were expired ([[expireLog]]). */
  private def hasLog(root: String): Boolean =
    versions(root).nonEmpty || Fio.exists(s"${logDir(root)}/_last_checkpoint")

  /** Prior-state replay for writers. Once `_last_checkpoint` exists the
   *  JSON-only replay is no longer sound: [[expireLog]] may have removed
   *  the pre-checkpoint commits, and a metaData action in the surviving
   *  tail would make [[readState]] "succeed" with an incomplete file set
   *  (ghost adds never get removes; checkpoint-first readers see deleted
   *  files as live). So a checkpointed table REQUIRES the Spark reader. */
  private def priorState(root: String, spark: Option[SparkSession]): DeltaState =
    spark.map(readStateFromCheckpoint(_, root)).getOrElse {
      // versions are claimed contiguously (put-if-absent on prior+1) and
      // expireLog removes a prefix, so the JSON chain is complete iff
      // version 0 survives — in that case JSON-only replay is still sound
      val vs = versions(root)
      val truncated = vs.isEmpty || vs.min > 0L
      if (truncated && Fio.exists(s"${logDir(root)}/_last_checkpoint"))
        throw new IllegalStateException(
          s"$root has a Delta checkpoint (_last_checkpoint) and the " +
            "pre-checkpoint JSON commits are expired: replaying the tail " +
            "alone can silently drop pre-checkpoint adds — pass " +
            "spark = Some(session) so replay starts at the checkpoint")
      readState(root)
    }

  /** Export the committed graft manifest as the next Delta version.
   *  Returns the committed version, or -1 when nothing changed.
   *
   *  Pass `spark` when checkpoints are in play: prior-state replay then
   *  starts at the latest checkpoint, so the export keeps working after
   *  [[expireLog]] removed the pre-checkpoint JSON commits. */
  def sync(root: String, m: Manifest,
      nowMs: Long = System.currentTimeMillis(),
      spark: Option[SparkSession] = None): Long = {
    val withDeletes = m.dataFiles.filter(_.deletes > 0)
    require(withDeletes.isEmpty,
      s"delta export needs wholly-live files; ${withDeletes.size} file(s) " +
        "carry deletion vectors — run optimize() (forced compaction " +
        "materializes DV'd rows away) before syncing")
    Fio.mkdirs(logDir(root))
    val prior =
      if (!hasLog(root)) None
      else Some(priorState(root, spark))
    val curFiles = m.dataFiles.map(f => s"data/${f.path}" -> f).toMap
    val priorPaths = prior.map(_.files.map(_.path).toSet).getOrElse(Set.empty)
    val adds = curFiles.keys.toSeq.sorted.filterNot(priorPaths)
    val removes = priorPaths.toSeq.sorted.filterNot(curFiles.keySet)
    val schemaChanged = prior.exists(_.schemaString != m.schemaJson)
    if (prior.isDefined && adds.isEmpty && removes.isEmpty && !schemaChanged)
      return -1L
    val version = prior.map(_.version + 1).getOrElse(0L)
    val out = new StringBuilder
    def line(o: com.fasterxml.jackson.databind.node.ObjectNode): Unit =
      out.append(mapper.writeValueAsString(o)).append('\n')
    if (prior.isEmpty) {
      val p = mapper.createObjectNode()
      val pv = p.putObject("protocol")
      pv.put("minReaderVersion", 1); pv.put("minWriterVersion", 2)
      line(p)
    }
    if (prior.isEmpty || schemaChanged) {
      val mdWrap = mapper.createObjectNode()
      val md = mdWrap.putObject("metaData")
      md.put("id", java.util.UUID
        .nameUUIDFromBytes(root.getBytes(StandardCharsets.UTF_8)).toString)
      val fmt = md.putObject("format")
      fmt.put("provider", "parquet"); fmt.putObject("options")
      md.put("schemaString", m.schemaJson)
      md.putArray("partitionColumns")
      md.putObject("configuration")
      md.put("createdTime", nowMs)
      line(mdWrap)
    }
    adds.foreach { p =>
      val f = curFiles(p)
      val aw = mapper.createObjectNode()
      val a = aw.putObject("add")
      a.put("path", p)
      a.putObject("partitionValues")
      a.put("size", f.bytes)
      a.put("modificationTime", nowMs)
      a.put("dataChange", true)
      a.put("stats", statsJson(m.schema, f))
      line(aw)
    }
    removes.foreach { p =>
      val rw = mapper.createObjectNode()
      val r = rw.putObject("remove")
      r.put("path", p)
      r.put("deletionTimestamp", nowMs)
      r.put("dataChange", true)
      line(rw)
    }
    val ci = mapper.createObjectNode()
    val c = ci.putObject("commitInfo")
    c.put("timestamp", nowMs)
    c.put("operation", if (prior.isEmpty) "WRITE" else "MERGE")
    c.put("engineInfo", "graft")
    line(ci)
    // Delta's put-if-absent commit rule (optimistic concurrency on the
    // version number): the atomic rename never clobbers an existing
    // commit, and a DIFFERENT surviving content means another writer
    // claimed this version first — the loser must fail loudly, reload
    // and retry at the next version, never silently vanish
    val path = f"${logDir(root)}/$version%020d.json"
    Fio.writeAtomic(path, out.toString)
    if (Fio.readString(path) != out.toString)
      throw new java.util.ConcurrentModificationException(
        s"delta version $version was claimed by another writer")
    version
  }

  // ---- checkpoints (bounded log replay at scale) ------------------------

  /** Write a spec checkpoint at the current version: one parquet file
   *  `%020d.checkpoint.parquet` holding the reconstructed state as
   *  action rows (protocol + metaData + one add per live file) and the
   *  `_last_checkpoint` pointer — so replay costs O(checkpoint + tail)
   *  instead of O(every commit ever), the property that keeps a
   *  maintenance-tick export readable after thousands of versions. */
  def checkpoint(spark: SparkSession, root: String): Long = {
    import org.apache.spark.sql.types._
    // checkpoint-first replay, NOT readState: after a prior checkpoint +
    // expireLog the JSON commits below it are gone, and a metaData action
    // in the tail would let a JSON-only replay "succeed" while dropping
    // every pre-checkpoint add — the new checkpoint would then persist
    // that loss and the next expireLog would delete the evidence.
    val st = readStateFromCheckpoint(spark, root)
    // idempotent re-checkpoint: nothing committed since the last one —
    // the checkpoint parquet at this version already exists and Fio.move
    // refuses to clobber, so keep it, but REPAIR the pointer: a crash
    // between the parquet move and the _last_checkpoint write would
    // otherwise leave an orphaned checkpoint no reader ever engages
    if (Fio.exists(f"${logDir(root)}/${st.version}%020d.checkpoint.parquet")) {
      Fio.replaceAtomic(s"${logDir(root)}/_last_checkpoint",
        s"""{"version":${st.version},"size":${st.files.size + 2}}""")
      return st.version
    }
    val protocolT = StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType)))
    val formatT = StructType(Seq(
      StructField("provider", StringType),
      StructField("options", MapType(StringType, StringType))))
    val metaT = StructType(Seq(
      StructField("id", StringType), StructField("format", formatT),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType)),
      StructField("createdTime", LongType)))
    val addT = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType)))
    val rowT = StructType(Seq(
      StructField("protocol", protocolT), StructField("metaData", metaT),
      StructField("add", addT)))
    import org.apache.spark.sql.Row
    val uuid = java.util.UUID
      .nameUUIDFromBytes(root.getBytes(StandardCharsets.UTF_8)).toString
    val rows: Seq[Row] =
      Row(Row(1, 2), null, null) +:
      Row(null, Row(uuid, Row("parquet", Map.empty[String, String]),
        st.schemaString, Seq.empty[String], Map.empty[String, String],
        0L), null) +:
      st.files.map(f => Row(null, null,
        Row(f.path, Map.empty[String, String], f.size, 0L, false,
          // the RAW stats carry through so checkpointing never degrades
          // file skipping to numRecords-only
          if (f.stats != null) f.stats
          else s"""{"numRecords":${f.numRecords}}""")))
    val tmp = s"${logDir(root)}/.ckpt-${java.util.UUID.randomUUID()}"
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), rowT)
      .write.mode("overwrite").parquet(tmp)
    val part = Fio.list(tmp)
      .find(n => n.startsWith("part-") && n.endsWith(".parquet")).get
    val target = f"${logDir(root)}/${st.version}%020d.checkpoint.parquet"
    Fio.move(s"$tmp/$part", target)
    Fio.delete(tmp)
    val lastCkpt = s"""{"version":${st.version},"size":${rows.size}}"""
    Fio.replaceAtomic(s"${logDir(root)}/_last_checkpoint", lastCkpt)
    st.version
  }

  /** Replay from the latest checkpoint (when one exists) plus the JSON
   *  tail after it — the reader-side half of [[checkpoint]]. */
  def readStateFromCheckpoint(spark: SparkSession, root: String): DeltaState = {
    val hint = s"${logDir(root)}/_last_checkpoint"
    if (!Fio.exists(hint)) return readState(root)
    val ckptVersion = mapper.readTree(Fio.readString(hint))
      .get("version").asLong
    val ckpt = spark.read.parquet(
      f"${logDir(root)}/$ckptVersion%020d.checkpoint.parquet").collect()
    var schema: String = null
    val live = scala.collection.mutable.LinkedHashMap[String, DeltaFile]()
    ckpt.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("metaData")))
        schema = r.getStruct(r.fieldIndex("metaData"))
          .getString(2) // schemaString
      if (!r.isNullAt(r.fieldIndex("add"))) {
        val a = r.getStruct(r.fieldIndex("add"))
        val stats = a.getString(5)
        val n = if (stats == null) -1L
          else mapper.readTree(stats).get("numRecords").asLong
        live(a.getString(0)) = DeltaFile(a.getString(0), a.getLong(2), n,
          stats)
      }
    }
    // JSON tail after the checkpoint
    var last = ckptVersion
    versions(root).filter(_ > ckptVersion).foreach { v =>
      last = v
      val body = Fio.readString(f"${logDir(root)}/$v%020d.json")
      body.split('\n').filter(_.nonEmpty).foreach { line =>
        val n = mapper.readTree(line)
        if (n.hasNonNull("metaData"))
          schema = n.get("metaData").get("schemaString").asText
        if (n.hasNonNull("add")) {
          val a = n.get("add")
          val raw = if (a.hasNonNull("stats")) a.get("stats").asText else null
          val stats = if (raw == null) null else mapper.readTree(raw)
          live(a.get("path").asText) = DeltaFile(a.get("path").asText,
            a.get("size").asLong,
            if (stats != null && stats.hasNonNull("numRecords"))
              stats.get("numRecords").asLong else -1L,
            raw)
        }
        if (n.hasNonNull("remove"))
          live.remove(n.get("remove").get("path").asText)
      }
    }
    require(schema != null, "checkpoint misses metaData")
    DeltaState(last, schema, live.values.toSeq)
  }

  /** Expire JSON commits at or below the latest checkpoint version —
   *  Delta's metadata-cleanup rule (readers start at the checkpoint).
   *  Returns how many commit files were removed. Safe only because
   *  every reader/writer path here replays checkpoint-first whenever
   *  `_last_checkpoint` exists. */
  def expireLog(root: String): Int = {
    val hint = s"${logDir(root)}/_last_checkpoint"
    if (!Fio.exists(hint)) return 0
    val ckptVersion = mapper.readTree(Fio.readString(hint))
      .get("version").asLong
    val expired = versions(root).filter(_ <= ckptVersion)
    expired.foreach(v => Fio.delete(f"${logDir(root)}/$v%020d.json"))
    expired.size
  }

  /** The Delta state as a DataFrame — plain parquet scan over the
   *  replayed live-file set, no graft-engine involvement. */
  def readDataFrame(spark: SparkSession, root: String): DataFrame = {
    val st = readStateFromCheckpoint(spark, root)
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(st.schemaString)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val files = st.files.map(f => s"$root/${f.path}")
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files: _*)
  }
}
