package graft.format.iceberg

import graft.format.{DvSidecar, Fio, Manifest}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}
import org.roaringbitmap.longlong.Roaring64NavigableMap

import java.nio.charset.StandardCharsets

/**
 * Iceberg persistence sync (reference `iceberg_table_syncer.rs:230`
 * `sync_data_files`, `:488` `sync_deletion_vector`): converts one
 * committed graft manifest version into spec-conformant Iceberg v3
 * metadata under `$root/metadata/` —
 *
 *  - one puffin file with a `deletion-vector-v1` blob per DV'd data
 *    file (`iceberg/deletion_vector.rs:29`),
 *  - a data manifest (content=data) + a delete manifest
 *    (content=deletes) in Avro,
 *  - a manifest list, a new snapshot in `v<seq>.metadata.json`, and a
 *    `version-hint.text` pointer (HadoopTables convention).
 *
 * Files synced in a PRIOR snapshot re-enter the new data manifest as
 * EXISTING with their original data sequence number, so time travel
 * and incremental consumption see correct lineage. Scale: the sync is
 * O(manifest) driver metadata work — no data file is read or moved;
 * DV bitmaps stream from the same sidecars the engine already holds.
 */
private[graft] object IcebergSync {

  private val StatusExisting = 0
  private val StatusAdded = 1

  final case class SyncResult(metadataPath: String, snapshotId: Long,
      sequenceNumber: Long)

  def metadataDir(root: String): String = s"$root/metadata"

  def currentMetadataPath(root: String): Option[String] = {
    val hint = s"${metadataDir(root)}/version-hint.text"
    if (!Fio.exists(hint)) None
    else Some(s"${metadataDir(root)}/${Fio.readString(hint).trim}")
  }

  /** Write one Iceberg snapshot for the graft manifest `m`. */
  def sync(root: String, m: Manifest,
      nowMs: Long = System.currentTimeMillis()): SyncResult = {
    val dir = metadataDir(root)
    Fio.mkdirs(dir)
    val prior = currentMetadataPath(root)
      .map(p => IcebergMeta.parseMetadataJson(Fio.readString(p)))
    val seq = prior.map(_.lastSequenceNumber).getOrElse(0L) + 1
    // every artifact of THIS sync attempt gets an attempt-unique name
    // (iceberg names metadata files <version>-<uuid>.metadata.json for
    // the same reason): a sync that crashed after writing files but
    // before the pointer swing leaves a complete orphan set — a RETRY
    // must never have its fresh content silently displaced by the
    // orphan's stale bytes under put-if-absent writes. Only the
    // pointer (hint / catalog CAS) ever selects a closure.
    val attempt = java.util.UUID.randomUUID().toString.take(8)
    val snapshotId = seq
    val uuid = java.util.UUID
      .nameUUIDFromBytes(root.getBytes(StandardCharsets.UTF_8)).toString

    // data sequence numbers of files synced by earlier snapshots: an
    // unchanged file stays EXISTING at its original sequence
    val priorSeqOf: Map[String, Long] = prior match {
      case None => Map.empty
      case Some(pm) =>
        val ml = AvroOcf.readFile(Fio.readBytes(pm.currentSnapshot.manifestList))
        ml.records.filter(_("content") == 0).flatMap { mf =>
          val man = AvroOcf.readFile(Fio.readBytes(mf("manifest_path").toString))
          man.records.map { e =>
            val df = e("data_file").asInstanceOf[Map[String, Any]]
            df("file_path").toString ->
              e("sequence_number").asInstanceOf[Long]
          }
        }.toMap
    }

    // schema evolution: a structurally-identical prior schema keeps its
    // id (snapshots pin schemas by id); an ALTERed table appends a new
    // schema with the next id — iceberg never rewrites schema history
    val (allSchemas, schemaId) = prior match {
      case None => (Seq(IcebergMeta.schemaJson(m.schema, 0)), 0)
      case Some(pm) =>
        pm.schemas.find(sj =>
          IcebergMeta.schemaJson(m.schema, IcebergMeta.schemaIdOf(sj)) == sj)
        match {
          case Some(found) => (pm.schemas, IcebergMeta.schemaIdOf(found))
          case scala.None =>
            val nid = pm.schemas.map(IcebergMeta.schemaIdOf).max + 1
            (pm.schemas :+ IcebergMeta.schemaJson(m.schema, nid), nid)
        }
    }
    val schemaJson = IcebergMeta.schemaJson(m.schema, schemaId)
    val manifestMeta = Map(
      "schema" -> schemaJson, "schema-id" -> schemaId.toString,
      "partition-spec" -> "[]", "partition-spec-id" -> "0",
      "format-version" -> "3")

    def entry(status: Int, dataSeq: Option[Long],
        dataFile: Map[String, Any]): Map[String, Any] = Map(
      "status" -> status,
      "snapshot_id" -> snapshotId,
      "sequence_number" -> dataSeq.orNull,
      "file_sequence_number" -> dataSeq.orNull,
      "data_file" -> dataFile)

    // ---- data manifest -------------------------------------------------
    // per-file metrics (value/null counts + bounds in the spec's
    // single-value binary, keyed by the schema's field ids) so EXTERNAL
    // engines prune files from this export exactly like the graft scan
    // prunes from its own manifest — the reference collects the same
    // four maps in `iceberg/parquet_stats_utils.rs`
    val fids = IcebergMeta.fieldIdsOf(m.schema)
    def kvList(entries: Seq[(Int, Any)]): Any =
      if (entries.isEmpty) null
      else entries.sortBy(_._1)
        .map { case (k, v) => Map[String, Any]("key" -> k, "value" -> v) }
    val dataEntries = m.dataFiles.map { f =>
      val abs = s"$root/data/${f.path}"
      val known = priorSeqOf.get(abs)
      val counted = m.schema.fields.toSeq
        .filter(fd => f.nullsOf(fd.name).isDefined)
      val bounded = m.schema.fields.toSeq.flatMap { fd =>
        f.stats.get(fd.name).filter(_.length == 2).flatMap { b =>
          for (lo <- IcebergMeta.boundBytes(fd.dataType, b.head);
               hi <- IcebergMeta.boundBytes(fd.dataType, b(1)))
            yield (fids(fd.name), lo, hi)
        }
      }
      entry(
        if (known.isDefined) StatusExisting else StatusAdded,
        Some(known.getOrElse(seq)),
        Map(
          "content" -> 0, "file_path" -> abs, "file_format" -> "PARQUET",
          "partition" -> Map.empty[String, Any],
          "record_count" -> f.rows, "file_size_in_bytes" -> f.bytes,
          // value_counts = values incl. nulls = rows for flat columns
          "value_counts" -> kvList(counted.map(fd => fids(fd.name) -> f.rows)),
          "null_value_counts" -> kvList(counted.map(fd =>
            fids(fd.name) -> f.nullsOf(fd.name).get)),
          "lower_bounds" -> kvList(bounded.map(t => t._1 -> t._2)),
          "upper_bounds" -> kvList(bounded.map(t => t._1 -> t._3)),
          "split_offsets" -> null, "sort_order_id" -> null,
          "referenced_data_file" -> null, "content_offset" -> null,
          "content_size_in_bytes" -> null))
    }
    val dataManifestPath = s"$dir/manifest-data-$seq-$attempt.avro"
    val dataManifestBytes = AvroOcf.writeFile(IcebergMeta.manifestEntrySchema,
      manifestMeta + ("content" -> "data"), dataEntries)
    Fio.writeBytesAtomic(dataManifestPath, dataManifestBytes)

    // ---- deletion vectors -> puffin + delete manifest ------------------
    val dvByFile: Seq[(String, Roaring64NavigableMap)] = {
      val acc = scala.collection.mutable.LinkedHashMap[String, Roaring64NavigableMap]()
      m.dvFiles.foreach { dv =>
        DvSidecar.read(s"$root/dv/$dv").foreach { case (file, bm) =>
          val nav = acc.getOrElseUpdate(file, new Roaring64NavigableMap())
          bm.toArray.foreach(nav.addLong)
        }
      }
      // only files still live in this manifest version
      val live = m.dataFiles.map(_.path).toSet
      acc.toSeq.filter { case (f, nm) => live(f) && nm.getLongCardinality > 0 }
    }
    val (deleteEntries, puffinPathOpt) =
      if (dvByFile.isEmpty) (Seq.empty[Map[String, Any]], None)
      else {
        val puffinPath = s"$dir/dvs-$seq-$attempt.puffin"
        val blobs = dvByFile.map { case (file, nav) =>
          (Puffin.dvBlobBytes(nav), Puffin.BlobMeta(
            // reference writes an empty fields list for DV blobs
            // (iceberg_table_syncer.rs); 2147483545 would be the reserved
            // `pos` id but spec-strict readers expect no field binding here
            Puffin.DeletionVectorV1, fields = Seq.empty,
            snapshotId = snapshotId, sequenceNumber = seq,
            offset = 0, length = 0,
            properties = Map(
              "cardinality" -> nav.getLongCardinality.toString,
              "referenced-data-file" -> s"$root/data/$file")))
        }
        val (bytes, placed) = Puffin.writeBytes(blobs)
        Fio.writeBytesAtomic(puffinPath, bytes)
        val entries = dvByFile.zip(placed).map { case ((file, nav), bm) =>
          entry(StatusAdded, Some(seq), Map(
            "content" -> 1, "file_path" -> puffinPath,
            "file_format" -> "PUFFIN",
            "partition" -> Map.empty[String, Any],
            "record_count" -> nav.getLongCardinality,
            "file_size_in_bytes" -> bytes.length.toLong,
            "split_offsets" -> null, "sort_order_id" -> null,
            "referenced_data_file" -> s"$root/data/$file",
            "content_offset" -> bm.offset,
            "content_size_in_bytes" -> bm.length))
        }
        (entries, Some(puffinPath))
      }
    val deleteManifestPath = s"$dir/manifest-deletes-$seq-$attempt.avro"
    if (deleteEntries.nonEmpty)
      Fio.writeBytesAtomic(deleteManifestPath,
        AvroOcf.writeFile(IcebergMeta.manifestEntrySchema,
          manifestMeta + ("content" -> "deletes"), deleteEntries))

    // ---- file indexes -> puffin pointer blobs (engine extension) -------
    // sync_file_indices (:683): the snapshot carries the key-index set
    // so a recovered engine resolves indexes without re-scanning; the
    // blobs hold POINTERS (path + covered files), never index bytes —
    // the index parquet itself is already durable beside the data
    val indexPuffin: Option[String] =
      if (m.indexFiles.isEmpty) scala.None
      else {
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val blobs = m.indexFiles.map { ie =>
          val node = mapper.createObjectNode()
          node.put("path", s"$root/index/${ie.path}")
          val arr = node.putArray("data-files")
          ie.dataFiles.foreach(f => arr.add(s"$root/data/$f"))
          (mapper.writeValueAsBytes(node), Puffin.BlobMeta(
            Puffin.GraftFileIndexV1, fields = Seq.empty,
            snapshotId = snapshotId, sequenceNumber = seq,
            offset = 0, length = 0,
            properties = Map("cardinality" -> ie.dataFiles.size.toString)))
        }
        val (bytes, _) = Puffin.writeBytes(blobs)
        val p = s"$dir/idx-$seq-$attempt.puffin"
        Fio.writeBytesAtomic(p, bytes)
        Some(p)
      }

    // ---- manifest list -------------------------------------------------
    def listEntry(path: String, content: Int, entries: Seq[Map[String, Any]],
        minSeq: Long): Map[String, Any] = {
      val added = entries.count(_("status") == StatusAdded)
      val existing = entries.size - added
      def rows(statusWanted: Int) = entries
        .filter(_("status") == statusWanted)
        .map(_("data_file").asInstanceOf[Map[String, Any]]("record_count")
          .asInstanceOf[Long]).sum
      Map(
        "manifest_path" -> path,
        "manifest_length" -> Fio.sizeOf(path),
        "partition_spec_id" -> 0, "content" -> content,
        "sequence_number" -> seq, "min_sequence_number" -> minSeq,
        "added_snapshot_id" -> snapshotId,
        "added_files_count" -> added, "existing_files_count" -> existing,
        "deleted_files_count" -> 0,
        "added_rows_count" -> rows(StatusAdded),
        "existing_rows_count" -> rows(StatusExisting),
        "deleted_rows_count" -> 0L,
        "partitions" -> Seq.empty[Any], "key_metadata" -> null)
    }
    val minDataSeq = dataEntries
      .map(_("sequence_number").asInstanceOf[Long]).minOption.getOrElse(seq)
    val listEntries =
      listEntry(dataManifestPath, 0, dataEntries, minDataSeq) +:
      (if (deleteEntries.nonEmpty)
        Seq(listEntry(deleteManifestPath, 1, deleteEntries, seq))
      else Seq.empty)
    val manifestListPath = s"$dir/snap-$snapshotId-$attempt-manifest-list.avro"
    Fio.writeBytesAtomic(manifestListPath,
      AvroOcf.writeFile(IcebergMeta.manifestListSchema,
        Map("format-version" -> "3"), listEntries))

    // ---- metadata.json + pointer ---------------------------------------
    val snapshot = IcebergMeta.Snapshot(snapshotId,
      prior.map(_.currentSnapshotId), seq, nowMs, manifestListPath,
      operation = if (deleteEntries.nonEmpty) "overwrite" else "append",
      schemaId = schemaId,
      summary = indexPuffin.map("graft.file-index-puffin" -> _).toMap ++
        // engine state a LOADER needs to rebuild the graft manifest
        // from this snapshot alone (the reference persists its flush
        // LSN as `moonlink.table-flush-lsn` the same way,
        // iceberg_table_manager.rs:35)
        Map("graft.commit-lsn" -> m.commitLsn.toString,
          "graft.flush-lsn" -> m.flushLsn.toString,
          "graft.key-cols" -> m.keyCols.mkString(","),
          "graft.last-field-id" -> m.lastFieldId.toString))
    val meta = IcebergMeta.TableMetadata(
      formatVersion = 3, tableUuid = uuid, location = root,
      lastSequenceNumber = seq, lastUpdatedMs = nowMs,
      lastColumnId = math.max(m.lastFieldId,
        graft.model.SchemaDsl.maxFieldId(m.schema)),
      schemas = allSchemas, currentSchemaId = schemaId,
      snapshots = prior.map(_.snapshots).getOrElse(Seq.empty) :+ snapshot,
      currentSnapshotId = snapshotId)
    val metadataPath = s"$dir/v$seq-$attempt.metadata.json"
    Fio.writeAtomic(metadataPath, IcebergMeta.metadataJson(meta))
    // the hint is the one MUTABLE file (HadoopTables convention);
    // the swing is an atomic REPLACE so no crash instant leaves the
    // table pointerless — the real commit pointer is the catalog's
    // CAS swing, the hint only serves catalog-less readers
    Fio.replaceAtomic(s"$dir/version-hint.text",
      s"v$seq-$attempt.metadata.json")
    SyncResult(metadataPath, snapshotId, seq)
  }

  // ---- snapshot expiry (bounded metadata history) ----------------------

  /** Drop all but the last `keepLast` snapshots from the Iceberg
   *  history and reclaim files exclusive to the dropped ones
   *  (manifest lists, manifests, puffin DV/index files) — iceberg
   *  expire-snapshots semantics: data files are NEVER touched (they
   *  belong to the table), only metadata. Returns snapshots dropped. */
  def expireSnapshots(root: String, keepLast: Int,
      graceMs: Long = 10 * 60 * 1000L): Int = {
    val metaPath = currentMetadataPath(root).getOrElse(return 0)
    val meta = IcebergMeta.parseMetadataJson(Fio.readString(metaPath))
    val keepN = math.max(1, keepLast)
    if (meta.snapshots.size <= keepN) return 0
    val kept = meta.snapshots.takeRight(keepN)
    val dropped = meta.snapshots.dropRight(keepN)
    // metadata files referenced by a snapshot: its manifest list, every
    // manifest in it, every puffin it points at (delete manifests +
    // the index-pointer puffin in the summary)
    def filesOf(sn: IcebergMeta.Snapshot): Set[String] = {
      val ml = AvroOcf.readFile(Fio.readBytes(sn.manifestList))
      val manifests = ml.records.map(_("manifest_path").toString)
      val puffins = manifests.flatMap { mp =>
        AvroOcf.readFile(Fio.readBytes(mp)).records.flatMap { e =>
          val df = e("data_file").asInstanceOf[Map[String, Any]]
          if (df("file_format") == "PUFFIN") Some(df("file_path").toString)
          else scala.None
        }
      }
      (Seq(sn.manifestList) ++ manifests ++ puffins ++
        sn.summary.get("graft.file-index-puffin")).toSet
    }
    val keepFiles = kept.flatMap(filesOf).toSet
    dropped.flatMap(filesOf).filterNot(keepFiles).foreach(Fio.delete)
    // commit the pruned history as a NEW metadata file (iceberg never
    // rewrites one in place); the name only needs to be fresh — the
    // version-hint is the pointer
    val dir = metadataDir(root)
    val base = s"v${meta.lastSequenceNumber}"
    val name = Iterator.from(1).map(i => s"$base-e$i.metadata.json")
      .find(n => !Fio.exists(s"$dir/$n")).get
    val pruned = meta.copy(snapshots = kept)
    Fio.writeAtomic(s"$dir/$name", IcebergMeta.metadataJson(pruned))
    Fio.replaceAtomic(s"$dir/version-hint.text", name)
    // sweep orphaned sync artifacts: metadata-dir files no kept
    // snapshot references and the pruned-history commit does not own —
    // crashed attempts' complete-but-never-pointed closures and
    // superseded metadata documents. AGE-GATED so a concurrent sync's
    // just-written, not-yet-pointed artifacts always survive the sweep
    // (the same grace rule as the table-open orphan sweep).
    val owned = keepFiles ++ Set(s"$dir/$name", s"$dir/version-hint.text")
    val cutoff = System.currentTimeMillis() - math.max(0L, graceMs)
    Fio.list(dir).map(n => s"$dir/$n").filterNot(owned).filter { p =>
      val n = p.substring(p.lastIndexOf('/') + 1)
      n.startsWith("manifest-") || n.startsWith("snap-") ||
        n.startsWith("dvs-") || n.startsWith("idx-") ||
        (n.startsWith("v") && n.endsWith(".metadata.json"))
    }.filter(p => Fio.modTime(p).exists(_ < cutoff))
      .foreach(Fio.delete)
    dropped.size
  }

  // ---- loader: rebuild the graft manifest from an Iceberg snapshot ----

  /** Disaster recovery / adoption (reference `iceberg_table_loader.rs`
   *  `load_snapshot_from_table_impl`): reconstruct and COMMIT a graft
   *  manifest from the table's current Iceberg snapshot alone — data
   *  files from the data manifests, deletion vectors re-materialized
   *  from the puffin blobs into a GDV1 sidecar, key-index pointers from
   *  the engine-extension blobs, schema (with field ids) and LSN
   *  watermarks from the snapshot metadata, and per-file stats (bounds
   *  + null counts) from the manifest metrics — so pruning and
   *  COUNT(col) survive recovery. Returns the committed manifest. */
  def importManifest(root: String): Manifest = {
    val metaPath = currentMetadataPath(root).getOrElse(
      throw new IllegalArgumentException(s"no iceberg metadata under $root"))
    val meta = IcebergMeta.parseMetadataJson(Fio.readString(metaPath))
    val snap = meta.currentSnapshot
    val st = readState(metaPath)
    def rel(prefix: String, p: String): String = {
      require(p.startsWith(s"$root/$prefix/"),
        s"$p is outside this table's $prefix dir")
      p.stripPrefix(s"$root/$prefix/")
    }
    // DVs: one consolidated GDV1 sidecar regenerated from the puffin
    // bitmaps (positions are file ordinals on both sides)
    val dvFiles: Seq[String] =
      if (st.dvs.isEmpty) Seq.empty
      else {
        val entries = st.dvs.toSeq.map { case (path, nav) =>
          val bm = new org.roaringbitmap.longlong.Roaring64Bitmap()
          nav.toArray.foreach(bm.addLong)
          rel("data", path) -> bm
        }
        Fio.mkdirs(s"$root/dv")
        val name = "dv-iceberg-import.bin"
        DvSidecar.write(s"$root/dv/$name", entries)
        Seq(name)
      }
    val deletesOf: Map[String, Long] = st.dvs.map { case (p, nav) =>
      rel("data", p) -> nav.getLongCardinality }
    val commitLsn = snap.summary.get("graft.commit-lsn").map(_.toLong)
      .getOrElse(snap.sequenceNumber)
    val flushLsn = snap.summary.get("graft.flush-lsn").map(_.toLong)
      .getOrElse(commitLsn)
    val keyCols = snap.summary.get("graft.key-cols").toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    // re-materialize per-file stats from the manifest metrics (written
    // since r14): bounds prune and null counts power COUNT(col) /
    // IS [NOT] NULL. exactBounds stays EMPTY on purpose — an Iceberg
    // bound may be a truncation written by ANY engine, so it prunes
    // but never answers MIN/MAX.
    val importSchema = IcebergMeta.sparkSchemaOf(st.schemaJson)
    val fieldOfId: Map[Int, org.apache.spark.sql.types.StructField] =
      IcebergMeta.fieldIdsOf(importSchema).map { case (n, id) =>
        id -> importSchema.fields(importSchema.fieldIndex(n)) }
    val dataEntries = st.dataFiles.map { case (path, rows) =>
      val name = rel("data", path)
      val fm = st.fileMetrics.getOrElse(path,
        FileMetrics(Map.empty, Map.empty, Map.empty, Map.empty))
      val nulls = fm.nullCounts.flatMap { case (fid, n0) =>
        fieldOfId.get(fid).map(_.name -> n0.toString) }
      val stats = fieldOfId.flatMap { case (fid, fd) =>
        for (lo <- fm.lower.get(fid); hi <- fm.upper.get(fid);
             loS <- IcebergMeta.boundStat(fd.dataType, lo);
             hiS <- IcebergMeta.boundStat(fd.dataType, hi))
          yield fd.name -> Seq(loS, hiS)
      }
      graft.format.DataFileEntry(name, rows, Fio.sizeOf(path), commitLsn,
        deletesOf.getOrElse(name, 0L), stats = stats, nullStats = nulls)
    }
    val indexEntries = st.indexFiles.map { case (idxPath, covered) =>
      graft.format.IndexFileEntry(rel("index", idxPath),
        covered.map(rel("data", _)))
    }
    val schema = IcebergMeta.sparkSchemaOf(st.schemaJson)
    // non-destructive adoption: when (part of) a manifest log survives,
    // the recovered state lands as the NEXT version on top of it —
    // history stays time-travelable and the commit can never collide
    // with an existing version file
    val nextVersion = graft.format.ManifestLog.latestVersion(root)
      .map(_ + 1).getOrElse(0L)
    val m = Manifest(
      version = nextVersion, commitLsn = commitLsn, flushLsn = flushLsn,
      schemaJson = schema.json, keyCols = keyCols,
      dataFiles = dataEntries, dvFiles = dvFiles,
      indexFiles = indexEntries,
      lastFieldId = snap.summary.get("graft.last-field-id").map(_.toLong)
        .getOrElse(graft.model.SchemaDsl.maxFieldId(schema)))
    graft.format.ManifestLog.commit(root, m)
    m
  }

  // ---- independent read path (spec parser -> DataFrame) ----------------

  /** Per-file metrics parsed from a data manifest entry (field-id
   *  keyed, values in the spec's single-value binary). Empty maps for
   *  manifests written before metrics existed. */
  final case class FileMetrics(valueCounts: Map[Int, Long],
      nullCounts: Map[Int, Long],
      lower: Map[Int, Array[Byte]], upper: Map[Int, Array[Byte]])

  final case class IcebergState(schemaJson: String,
      dataFiles: Seq[(String, Long)],      // (path, record_count)
      dvs: Map[String, Roaring64NavigableMap], // data path -> deleted rows
      // engine extension: key-index pointers (path -> covered data
      // files) recovered from the snapshot's graft-file-index blobs
      indexFiles: Seq[(String, Seq[String])] = Seq.empty,
      fileMetrics: Map[String, FileMetrics] = Map.empty)

  /** Walk metadata.json -> manifest list -> manifests -> puffin blobs,
   *  entirely through the spec parsers (no engine state). */
  def readState(metadataPath: String,
      snapshotId: Option[Long] = scala.None): IcebergState = {
    val meta = IcebergMeta.parseMetadataJson(Fio.readString(metadataPath))
    // snapshot-pinned (time-travel) read: any snapshot in the history
    // resolves by id; default is the current one
    val snap = snapshotId match {
      case scala.None => meta.currentSnapshot
      case Some(id) => meta.snapshots.find(_.snapshotId == id)
        .getOrElse(throw new IllegalArgumentException(
          s"no snapshot $id in ${meta.snapshots.map(_.snapshotId)}"))
    }
    val ml = AvroOcf.readFile(Fio.readBytes(snap.manifestList))
    val dataFiles = Seq.newBuilder[(String, Long)]
    val dvs = Map.newBuilder[String, Roaring64NavigableMap]
    val metrics = Map.newBuilder[String, FileMetrics]
    ml.records.foreach { mf =>
      val man = AvroOcf.readFile(Fio.readBytes(mf("manifest_path").toString))
      man.records.foreach { e =>
        val df = e("data_file").asInstanceOf[Map[String, Any]]
        // k/v-record map fields; absent (pre-metrics file) or null ->
        // empty
        def kvOf[T](key: String): Map[Int, T] = df.getOrElse(key, null) match {
          case s: Seq[_] => s.map { m0 =>
            val mm = m0.asInstanceOf[Map[String, Any]]
            mm("key").asInstanceOf[Int] -> mm("value").asInstanceOf[T]
          }.toMap
          case _ => Map.empty
        }
        df("content") match {
          case 0 =>
            dataFiles += (df("file_path").toString ->
              df("record_count").asInstanceOf[Long])
            metrics += (df("file_path").toString -> FileMetrics(
              kvOf[Long]("value_counts"), kvOf[Long]("null_value_counts"),
              kvOf[Array[Byte]]("lower_bounds"),
              kvOf[Array[Byte]]("upper_bounds")))
          case 1 =>
            require(df("file_format") == "PUFFIN",
              "v3 position deletes are puffin DVs here")
            val puffin = Puffin.readBytes(
              Fio.readBytes(df("file_path").toString))
            val off = df("content_offset").asInstanceOf[Long]
            val blob = puffin.blobs.find(_.offset == off)
              .getOrElse(throw new IllegalStateException(
                s"no blob at offset $off"))
            dvs += (df("referenced_data_file").toString ->
              Puffin.dvBlobParse(puffin.blobBytes(blob)))
          case other =>
            throw new IllegalArgumentException(s"manifest content $other")
        }
      }
    }
    val schemaJson = meta.schemas
      .find(sj => IcebergMeta.schemaIdOf(sj) == snap.schemaId)
      .getOrElse(meta.schemaJson) // pre-history metadata: current schema
    val indexes = snap.summary.get("graft.file-index-puffin").toSeq
      .flatMap { p =>
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val puffin = Puffin.readBytes(Fio.readBytes(p))
        puffin.blobs.filter(_.blobType == Puffin.GraftFileIndexV1).map { b =>
          val node = mapper.readTree(puffin.blobBytes(b))
          val files = Seq.newBuilder[String]
          node.get("data-files").elements()
            .forEachRemaining(f => files += f.asText)
          node.get("path").asText -> files.result()
        }
      }
    IcebergState(schemaJson, dataFiles.result(), dvs.result(), indexes,
      metrics.result())
  }

  /** Materialize the Iceberg table state as a DataFrame: scan the
   *  parquet files listed by the spec walk and mask DV'd positions via
   *  the parquet `_metadata.row_index` hidden column — a read path
   *  with NO graft-engine involvement, so the entry proves an external
   *  engine could do the same. The DV position set broadcasts (bounded
   *  by delete count); the scan itself is a plain distributed parquet
   *  read. */
  def readDataFrame(spark: SparkSession, metadataPath: String,
      snapshotId: Option[Long] = scala.None): DataFrame = {
    val st = readState(metadataPath, snapshotId)
    val schema = IcebergMeta.sparkSchemaOf(st.schemaJson)
    val files = st.dataFiles.map(_._1)
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    // DV keys reduce to the FILE NAME (unique within a table), so the
    // mask is an equi-join that broadcasts — `_metadata.file_path` is a
    // URI while manifest paths are plain, and name equality sidesteps
    // the scheme mismatch without a non-equi condition
    val deleted: Seq[(String, Long)] = st.dvs.toSeq.flatMap { case (f, bm) =>
      val name = f.substring(f.lastIndexOf('/') + 1)
      bm.toArray.map(p => (name, p))
    }
    val base = spark.read.schema(schema).parquet(files: _*)
      .select(col("*"),
        org.apache.spark.sql.functions.substring_index(
          col("_metadata.file_path"), "/", -1).as("_ice_file"),
        col("_metadata.row_index").as("_ice_pos"))
    val masked =
      if (deleted.isEmpty) base
      else {
        import spark.implicits._
        val delDf = deleted.toDF("_del_file", "_del_pos")
        base.join(broadcast(delDf),
          base("_ice_file") === delDf("_del_file") &&
            base("_ice_pos") === delDf("_del_pos"),
          "left_anti")
      }
    masked.drop("_ice_file", "_ice_pos")
  }
}
