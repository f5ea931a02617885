package graft

import graft.format.iceberg.{AvroOcf, IcebergMeta, IcebergSync, Puffin}
import graft.model._
import graft.table._
import org.apache.spark.sql.{Row, SparkSession}
import org.roaringbitmap.longlong.Roaring64NavigableMap
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/**
 * Iceberg v3 metadata layer: Avro OCF codec, puffin deletion-vector
 * blobs, metadata.json, and the graft→Iceberg snapshot sync — each
 * layout pinned against the PUBLIC spec (golden byte checks), each
 * writer gated by the independent parser round-trip.
 */
class IcebergSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("avro OCF round-trips records and pins the container layout") {
    val schema =
      """{"type":"record","name":"t","fields":[
        |{"name":"s","type":"string"},
        |{"name":"n","type":"long"},
        |{"name":"o","type":["null","long"]},
        |{"name":"xs","type":{"type":"array","items":"int"}}]}""".stripMargin
    val recs = Seq(
      Map[String, Any]("s" -> "a", "n" -> 1L, "o" -> null, "xs" -> Seq(1, 2)),
      Map[String, Any]("s" -> "b", "n" -> -3L, "o" -> 9L, "xs" -> Seq.empty[Int]))
    val bytes = AvroOcf.writeFile(schema, Map("k" -> "v"), recs)
    // golden: magic Obj\1 (avro spec 1.11 container files)
    assert(hex(bytes.take(4)) == "4f626a01")
    val back = AvroOcf.readFile(bytes)
    assert(back.meta("k") == "v" && back.meta("avro.codec") == "null")
    assert(back.records.size == 2)
    assert(back.records(0)("s") == "a" && back.records(0)("o") == null)
    assert(back.records(1)("n") == -3L && back.records(1)("o") == 9L)
    assert(back.records(0)("xs") == Seq(1, 2))
    // determinism: same inputs, same bytes (golden stability)
    assert(java.util.Arrays.equals(bytes,
      AvroOcf.writeFile(schema, Map("k" -> "v"), recs)))
  }

  test("deletion-vector blob pins the v3 layout: len|magic|roaring64|crc") {
    val bm = new Roaring64NavigableMap()
    Seq(1L, 5L, 100L).foreach(bm.addLong)
    val blob = Puffin.dvBlobBytes(bm)
    // golden: bytes 4..8 are the spec magic D1 D3 39 64
    assert(hex(blob.slice(4, 8)) == "d1d33964")
    // bytes 0..4 big-endian combined length of magic + vector
    val combined = java.nio.ByteBuffer.wrap(blob, 0, 4).getInt
    assert(combined == 4 + (blob.length - 12),
      "length field = magic + portable bitmap")
    val back = Puffin.dvBlobParse(blob)
    assert(back.getLongCardinality == 3 && back.contains(5L) && !back.contains(6L))
    // corrupting one payload byte must fail the crc gate
    val bad = blob.clone(); bad(9) = (bad(9) ^ 0x1).toByte
    intercept[Exception] { Puffin.dvBlobParse(bad) }
  }

  test("puffin container pins magic/footer and round-trips blobs") {
    val bm1 = new Roaring64NavigableMap(); bm1.addLong(7L)
    val bm2 = new Roaring64NavigableMap(); Seq(0L, 2L).foreach(bm2.addLong)
    val blobs = Seq(bm1, bm2).zipWithIndex.map { case (bm, i) =>
      (Puffin.dvBlobBytes(bm), Puffin.BlobMeta(Puffin.DeletionVectorV1,
        Seq.empty, 10L, 1L, 0, 0, // reference convention: DV blobs bind no fields
        Map("cardinality" -> bm.getLongCardinality.toString,
          "referenced-data-file" -> s"/data/f$i.parquet")))
    }
    val (bytes, placed) = Puffin.writeBytes(blobs)
    // golden: magic PFA1 leads and trails the file
    assert(hex(bytes.take(4)) == "50464131")
    assert(hex(bytes.takeRight(4)) == "50464131")
    val back = Puffin.readBytes(bytes)
    assert(back.blobs.size == 2)
    assert(back.blobs.map(_.blobType).distinct == Seq("deletion-vector-v1"))
    assert(back.blobs(1).properties("referenced-data-file") == "/data/f1.parquet")
    val b2 = Puffin.dvBlobParse(back.blobBytes(back.blobs(1)))
    assert(b2.getLongCardinality == 2 && b2.contains(0L) && b2.contains(2L))
    assert(placed.map(_.offset) == back.blobs.map(_.offset))
  }

  test("metadata.json carries the v3 required fields and round-trips") {
    val schema = SchemaDsl.struct("id" -> "int64", "v" -> "int64")
    val sj = IcebergMeta.schemaJson(schema)
    val snap = IcebergMeta.Snapshot(1L, None, 1L, 1700000000000L,
      "/x/metadata/snap-1-manifest-list.avro", "append", 0)
    val meta = IcebergMeta.TableMetadata(3, "uuid-x", "/x", 1L,
      1700000000000L, 2L, Seq(sj), 0, Seq(snap), 1L)
    val json = IcebergMeta.metadataJson(meta)
    // spec-required keys present verbatim
    Seq("format-version", "table-uuid", "last-sequence-number",
      "last-column-id", "schemas", "current-schema-id", "partition-specs",
      "default-spec-id", "sort-orders", "default-sort-order-id",
      "snapshots", "current-snapshot-id", "refs").foreach(k =>
      assert(json.contains("\"" + k + "\""), s"missing $k"))
    val back = IcebergMeta.parseMetadataJson(json)
    assert(back.formatVersion == 3 && back.lastSequenceNumber == 1L)
    assert(back.currentSnapshot.manifestList == snap.manifestList)
    assert(back.currentSnapshot.operation == "append")
    // spark schema reconstruction (field ids + nullability preserved)
    val ss = IcebergMeta.sparkSchemaOf(back.schemaJson)
    assert(ss.fieldNames.toSeq == Seq("id", "v"))
  }

  test("sync publishes a spec round-trippable snapshot; DVs mask deletes") {
    val root = Files.createTempDirectory("graft-ice").toString + "/t"
    val schema = SchemaDsl.struct("id" -> "int64", "v" -> "int64")
    val t = GraftTable.create(spark, root, schema, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    t.upsertAll((1L to 100L).map(i => Row(i, i * 10L)), startLsn = 1)
    t.flush(); t.publish()
    t.apply(Seq(Delete(Seq(7L), 200L), Delete(Seq(42L), 201L), Commit(202L)))
    t.flush(); t.publish()
    val r1 = IcebergSync.sync(root, t.currentManifest, nowMs = 1700000000000L)
    assert(r1.sequenceNumber == 1L)
    // the independent parser walks metadata.json -> list -> manifests
    val st = IcebergSync.readState(r1.metadataPath)
    assert(st.dataFiles.nonEmpty)
    assert(st.dvs.values.map(_.getLongCardinality).sum == 2L,
      "both deletes land as DV positions")
    // reconstructed WITHOUT the graft engine: 98 surviving rows
    val df = IcebergSync.readDataFrame(spark, r1.metadataPath)
    assert(df.count() == 98L)
    assert(df.where("id = 7 OR id = 42").count() == 0L)
    assert(df.where("id = 8").head().getLong(1) == 80L)

    // second snapshot: more data -> EXISTING lineage + parent pointer
    t.upsertAll((101L to 120L).map(i => Row(i, i)), startLsn = 300L)
    t.flush(); t.publish()
    val r2 = IcebergSync.sync(root, t.currentManifest, nowMs = 1700000001000L)
    assert(r2.sequenceNumber == 2L)
    val meta2 = IcebergMeta.parseMetadataJson(
      graft.format.Fio.readString(r2.metadataPath))
    assert(meta2.snapshots.size == 2)
    assert(meta2.currentSnapshot.parentId.contains(r1.snapshotId))
    val ml2 = AvroOcf.readFile(graft.format.Fio.readBytes(
      meta2.currentSnapshot.manifestList))
    val dataMf = ml2.records.find(_("content") == 0).get
    val man2 = AvroOcf.readFile(graft.format.Fio.readBytes(
      dataMf("manifest_path").toString))
    val statuses = man2.records.groupBy(_("status"))
    assert(statuses.contains(1), "new files ADDED")
    assert(statuses.contains(0), "carried files EXISTING")
    // EXISTING files keep their original data sequence number
    assert(man2.records.filter(_("status") == 0)
      .forall(_("sequence_number") == 1L))
    val df2 = IcebergSync.readDataFrame(spark, r2.metadataPath)
    assert(df2.count() == 118L)
    // manifest avro metadata pins the iceberg keys external readers use
    assert(man2.meta("format-version") == "3")
    assert(man2.meta("content") == "data")
    assert(man2.meta("partition-spec") == "[]")
    assert(man2.meta.contains("schema"))
  }

  test("sync appends a new schema-id after ALTER; old snapshots keep theirs") {
    val root = Files.createTempDirectory("graft-ice-ev").toString + "/t"
    val schema = SchemaDsl.struct("id" -> "int64", "v" -> "int64")
    val t = GraftTable.create(spark, root, schema, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    t.upsertAll((1L to 5L).map(i => Row(i, i)), startLsn = 1)
    t.flush(); t.publish()
    val r1 = IcebergSync.sync(root, t.currentManifest, nowMs = 1700000000000L)
    // same schema again: id 0 reused, history length stays 1
    t.upsertAll(Seq(Row(6L, 6L)), startLsn = 10); t.flush(); t.publish()
    val r2 = IcebergSync.sync(root, t.currentManifest, nowMs = 1700000001000L)
    val m2 = IcebergMeta.parseMetadataJson(
      graft.format.Fio.readString(r2.metadataPath))
    assert(m2.schemas.size == 1 && m2.currentSchemaId == 0)
    // ALTER adds a column -> new schema id 1; prior snapshots still
    // reference schema 0 in the unchanged history
    t.alterAddColumn("w", "int64"); t.flush(); t.publish()
    val r3 = IcebergSync.sync(root, t.currentManifest, nowMs = 1700000002000L)
    val m3 = IcebergMeta.parseMetadataJson(
      graft.format.Fio.readString(r3.metadataPath))
    assert(m3.schemas.size == 2 && m3.currentSchemaId == 1)
    assert(m3.currentSnapshot.schemaId == 1)
    assert(m3.snapshots.find(_.snapshotId == r1.snapshotId)
      .exists(_.schemaId == 0))
    assert(IcebergMeta.sparkSchemaOf(m3.schemaJson).fieldNames.toSeq ==
      Seq("id", "v", "w"))
  }

  test("snapshot-pinned read: time travel through the spec parsers") {
    val root = Files.createTempDirectory("graft-ice-tt").toString + "/t"
    val schema = SchemaDsl.struct("id" -> "int64", "v" -> "int64")
    val t = GraftTable.create(spark, root, schema, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    t.upsertAll((1L to 10L).map(i => Row(i, i)), startLsn = 1)
    t.flush(); t.publish()
    val r1 = IcebergSync.sync(root, t.currentManifest, nowMs = 1700000000000L)
    t.apply(Seq(Delete(Seq(3L), 50L), Commit(51L)))
    t.upsertAll((11L to 12L).map(i => Row(i, i)), startLsn = 60L)
    t.flush(); t.publish()
    val r2 = IcebergSync.sync(root, t.currentManifest, nowMs = 1700000001000L)
    // current snapshot reflects delete + appends; the PINNED old
    // snapshot still reads the pre-delete 10 rows from the SAME
    // metadata.json — iceberg time travel, driven by the parsers only
    assert(IcebergSync.readDataFrame(spark, r2.metadataPath).count() == 11L)
    val old = IcebergSync.readDataFrame(spark, r2.metadataPath,
      snapshotId = Some(r1.snapshotId))
    assert(old.count() == 10L)
    assert(old.where("id = 3").count() == 1L, "pinned snapshot pre-delete")
  }

  test("file-index pointer blobs ride the snapshot (sync_file_indices)") {
    val root = Files.createTempDirectory("graft-ice-idx").toString + "/t"
    val schema = SchemaDsl.struct("id" -> "int64", "v" -> "int64")
    val t = GraftTable.create(spark, root, schema, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    t.upsertAll((1L to 30L).map(i => Row(i, i)), startLsn = 1)
    t.flush(); t.publish()
    val r = IcebergSync.sync(root, t.currentManifest, nowMs = 1700000000000L)
    val st = IcebergSync.readState(r.metadataPath)
    assert(st.indexFiles.nonEmpty, "keyed table ships its index pointers")
    // every pointer resolves to a real index sidecar covering real files
    st.indexFiles.foreach { case (idxPath, covered) =>
      assert(graft.format.Fio.exists(idxPath), idxPath)
      assert(covered.nonEmpty && covered.forall(graft.format.Fio.exists))
    }
    // the engine-extension blob type is skippable: the plain data read
    // works regardless of whether a reader understands the index blobs
    assert(IcebergSync.readDataFrame(spark, r.metadataPath).count() == 30L)
  }

  test("loader: the graft manifest rebuilds from the Iceberg snapshot alone") {
    val root = Files.createTempDirectory("graft-ice-load").toString + "/t"
    val schema = SchemaDsl.struct("id" -> "int64", "v" -> "int64")
    val t = GraftTable.create(spark, root, schema, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    t.upsertAll((1L to 40L).map(i => Row(i, i * 3L)), startLsn = 1)
    t.flush(); t.publish()
    t.apply(Seq(Delete(Seq(9L), 100L), Commit(101L)))
    t.flush(); t.publish()
    val expect = t.read(scala.None).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val preLsn = t.commitLsn
    IcebergSync.sync(root, t.currentManifest, nowMs = 1700000000000L)
    // disaster: the graft manifest log and DV sidecars are GONE; only
    // data/index files + the Iceberg export survive
    graft.format.Fio.delete(s"$root/manifest")
    graft.format.Fio.delete(s"$root/dv")
    intercept[Exception] { GraftTable.open(spark, root,
      Identity.Keys(Seq("id")), TableConfig(walEnabled = false)) }
    // rebuild from the snapshot, reopen, and the state is identical
    val m = IcebergSync.importManifest(root)
    assert(m.commitLsn == preLsn && m.keyCols == Seq("id"))
    val t2 = GraftTable.open(spark, root, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    val got = t2.read(scala.None).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect, "recovered state equals the pre-disaster state")
    // and the recovered table keeps WORKING: upserts resolve via the
    // recovered index, deletes DV, fresh files never collide
    t2.upsertAll(Seq(Row(9L, 999L), Row(41L, 41L)), startLsn = preLsn + 10)
    t2.flush(); t2.publish()
    assert(t2.read(scala.None).count() == 41L)
    assert(t2.read(scala.None).where("id = 9").head().getLong(1) == 999L)
    // adoption is NON-DESTRUCTIVE when a manifest log survives: a
    // second import lands as the next version on top of the existing
    // history instead of colliding with (or rewriting) version 0
    val latestBefore = graft.format.ManifestLog.latestVersion(root).get
    val m2 = IcebergSync.importManifest(root)
    assert(m2.version == latestBefore + 1,
      "import on a live log commits as the next version")
    assert(graft.format.ManifestLog.latestVersion(root).contains(m2.version))
  }

  test("manifest metrics: spec-binary bounds + null counts, import re-materializes stats") {
    // the reference ships value/null counts and lower/upper bounds into
    // its iceberg manifests (`iceberg/parquet_stats_utils.rs`); this
    // pins our export's single-value binary (spec Appendix D: LE
    // numerics, UTF-8 strings, micros timestamps, minimal big-endian
    // unscaled decimals) and that importManifest re-materializes
    // pruning stats from them
    val root = Files.createTempDirectory("graft-ice-metrics").toString + "/t"
    val schema = SchemaDsl.struct("id" -> "int64", "name" -> "string",
      "score" -> "float64", "amt" -> "decimal(12,2)", "ts" -> "timestamp")
    val t = GraftTable.create(spark, root, schema, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    def bd(c: Long) = new java.math.BigDecimal(
      java.math.BigInteger.valueOf(c), 2)
    t.apply((1L to 9L).flatMap(i => CdcEvent.upsert(Row(i,
      if (i == 4) null else s"n$i", i * 1.5, bd(i * 125L),
      java.sql.Timestamp.valueOf(f"2025-01-01 00:00:00.00000$i%d")),
      Seq(i), i)) :+ Commit(10L))
    t.flush(); t.publish()
    val r = IcebergSync.sync(root, t.currentManifest, nowMs = 1700000000000L)
    val st = IcebergSync.readState(r.metadataPath)
    assert(st.dataFiles.size == 1)
    val fm = st.fileMetrics(st.dataFiles.head._1)
    val fids = IcebergMeta.fieldIdsOf(t.currentManifest.schema)
    assert(fm.valueCounts(fids("id")) == 9L)
    assert(fm.valueCounts(fids("name")) == 9L) // values INCLUDING nulls
    assert(fm.nullCounts(fids("name")) == 1L &&
      fm.nullCounts(fids("id")) == 0L)
    // spec byte patterns: long 1/9 little-endian; decimal minimal
    // big-endian unscaled (125 = 0x7d); strings raw UTF-8
    assert(hex(fm.lower(fids("id"))) == "0100000000000000")
    assert(hex(fm.upper(fids("id"))) == "0900000000000000")
    assert(hex(fm.lower(fids("amt"))) == "7d")
    assert(new String(fm.lower(fids("name")),
      java.nio.charset.StandardCharsets.UTF_8) == "n1")
    assert(new String(fm.upper(fids("name")),
      java.nio.charset.StandardCharsets.UTF_8) == "n9")
    // timestamp bound = micros LE: 2025-01-01T00:00:00.000001Z
    val micros = java.sql.Timestamp.valueOf("2025-01-01 00:00:00.000001")
    assert(IcebergMeta.boundStat(
      org.apache.spark.sql.types.TimestampType, fm.lower(fids("ts")))
      .contains(micros.toString))
    // disaster import: pruning stats + null counts re-materialize
    graft.format.Fio.delete(s"$root/manifest")
    graft.format.Fio.delete(s"$root/dv")
    val m = IcebergSync.importManifest(root)
    val e = m.dataFiles.head
    assert(e.nullsOf("name").contains(1L) && e.nullsOf("id").contains(0L))
    assert(e.stats("id") == Seq("1", "9"))
    assert(e.stats("amt") == Seq("1.25", "11.25"))
    assert(e.stats("score") == Seq("1.5", "13.5"))
    assert(e.stats("name") == Seq("n1", "n9"))
    assert(e.stats("ts").head == "2025-01-01 00:00:00.000001")
    // iceberg bounds may be truncations (any writer): they prune but
    // must never ANSWER MIN/MAX — the exactness marker stays off
    assert(e.exactBounds.isEmpty)
    // and the recovered stats actually prune: a range outside the file
    // plans zero partitions through the DSv2 scan
    val t2 = GraftTable.open(spark, root, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    assert(t2.prunedRead("id", Some(100L), scala.None).count() == 0L)
    assert(t2.prunedRead("amt",
      Some(new java.math.BigDecimal("50.00")), scala.None).count() == 0L)
    // file-level pruning: a range overlapping the file keeps it whole
    assert(t2.prunedRead("id", Some(5L), scala.None).count() == 9L)
  }

  test("sync crash before the pointer swing: retry publishes the fresh state") {
    // a sync that wrote its whole artifact set but died before the
    // version-hint swing leaves a complete ORPHAN closure at the same
    // sequence number; the retry (possibly with NEWER table state)
    // writes attempt-unique names, so the orphan can never displace the
    // retry's bytes — the hint always selects a closure whose content
    // is what the successful sync actually saw
    val root = Files.createTempDirectory("graft-ice-crash").toString + "/t"
    val schema = SchemaDsl.struct("id" -> "int64", "v" -> "int64")
    val t = GraftTable.create(spark, root, schema, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    t.upsertAll((1L to 5L).map(i => Row(i, i)), startLsn = 1)
    t.flush(); t.publish()
    IcebergSync.sync(root, t.currentManifest, nowMs = 1700000000000L)
    t.upsertAll(Seq(Row(6L, 6L)), startLsn = 10L); t.flush(); t.publish()
    graft.format.Fio.installFaults(root, new graft.format.FioFaults {
      override def beforeOp(op: String, path: String): Unit =
        if (op == "write" && path.endsWith("version-hint.text"))
          throw new java.io.IOException("injected: crash before hint swing")
    })
    try intercept[java.io.IOException] {
      IcebergSync.sync(root, t.currentManifest, nowMs = 1700000001000L)
    } finally graft.format.Fio.clearFaults()
    // the hint still selects the LAST GOOD snapshot (seq 1, 5 rows)
    assert(IcebergSync.readDataFrame(spark,
      IcebergSync.currentMetadataPath(root).get).count() == 5L)
    // the retry sees prior = seq 1, claims seq 2 with fresh names, and
    // the published closure carries the retry's CURRENT state — the
    // crashed attempt's orphans are never adopted
    t.upsertAll(Seq(Row(7L, 7L)), startLsn = 20L); t.flush(); t.publish()
    val r = IcebergSync.sync(root, t.currentManifest, nowMs = 1700000002000L)
    assert(r.sequenceNumber == 2L)
    val df = IcebergSync.readDataFrame(spark,
      IcebergSync.currentMetadataPath(root).get)
    assert(df.count() == 7L, "the hinted snapshot holds the retry's state")
  }

  test("expire bounds the snapshot history; current state keeps reading") {
    val root = Files.createTempDirectory("graft-ice-exp").toString + "/t"
    val schema = SchemaDsl.struct("id" -> "int64", "v" -> "int64")
    val t = GraftTable.create(spark, root, schema, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    (1 to 4).foreach { i =>
      t.upsertAll(Seq(Row(i.toLong, i * 10L)), startLsn = i * 10L)
      t.flush(); t.publish()
      IcebergSync.sync(root, t.currentManifest, nowMs = 1700000000000L + i)
    }
    val before = IcebergMeta.parseMetadataJson(graft.format.Fio.readString(
      IcebergSync.currentMetadataPath(root).get))
    assert(before.snapshots.size == 4)
    assert(IcebergSync.expireSnapshots(root, keepLast = 2) == 2)
    val after = IcebergMeta.parseMetadataJson(graft.format.Fio.readString(
      IcebergSync.currentMetadataPath(root).get))
    assert(after.snapshots.size == 2)
    assert(after.currentSnapshotId == before.currentSnapshotId)
    // dropped snapshots' exclusive manifest lists are reclaimed; kept
    // ones and ALL data files survive, and the table still reads
    before.snapshots.dropRight(2).foreach(sn =>
      assert(!graft.format.Fio.exists(sn.manifestList), sn.manifestList))
    assert(IcebergSync.readDataFrame(spark,
      IcebergSync.currentMetadataPath(root).get).count() == 4L)
    // a later sync continues the history from the pruned metadata
    t.upsertAll(Seq(Row(9L, 90L)), startLsn = 100L); t.flush(); t.publish()
    val r5 = IcebergSync.sync(root, t.currentManifest,
      nowMs = 1700000001000L)
    assert(r5.sequenceNumber == 5L)
    assert(IcebergSync.readDataFrame(spark, r5.metadataPath).count() == 5L)
    // expiry is idempotent at the bound
    assert(IcebergSync.expireSnapshots(root, keepLast = 5) == 0)
    // orphan sweep: a crashed attempt's complete-but-never-pointed
    // closure (and superseded metadata documents) reclaim on the next
    // expiry once past the grace age; kept snapshots' files survive
    graft.format.Fio.installFaults(root, new graft.format.FioFaults {
      override def beforeOp(op: String, path: String): Unit =
        if (op == "write" && path.endsWith("version-hint.text"))
          throw new java.io.IOException("injected: crash before hint swing")
    })
    try intercept[java.io.IOException] {
      IcebergSync.sync(root, t.currentManifest, nowMs = 1700000002000L)
    } finally graft.format.Fio.clearFaults()
    val dir = IcebergSync.metadataDir(root)
    val orphaned = graft.format.Fio.list(dir).filter(_.contains("-data-6"))
    assert(orphaned.nonEmpty, "the crashed attempt left artifacts")
    t.upsertAll(Seq(Row(10L, 100L)), startLsn = 200L); t.flush(); t.publish()
    IcebergSync.sync(root, t.currentManifest, nowMs = 1700000003000L)
    assert(IcebergSync.expireSnapshots(root, keepLast = 2, graceMs = 0L) > 0)
    assert(graft.format.Fio.list(dir).count(_.contains("-data-6")) == 1,
      "only the successful seq-6 attempt's manifest survives the sweep")
    assert(IcebergSync.readDataFrame(spark,
      IcebergSync.currentMetadataPath(root).get).count() == 6L)
  }
}
