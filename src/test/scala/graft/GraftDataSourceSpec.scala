package graft

import graft.model._
import graft.sources.{GraftScanBuilder, GraftSparkTable}
import graft.table._
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThan, LessThan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import scala.jdk.CollectionConverters._

/**
 * DSv2 connector (`spark.read.format("graft")`): results identical to
 * the library read (DVs applied positionally in the reader), column
 * pruning incl. the zero-column COUNT(*) path, nulls, timestamps, and
 * manifest-stat file pruning at the scan-planning level (the
 * DataFusion-TableProvider behaviors, `table_provider.rs:74-171`).
 */
class GraftDataSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-dsv2-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmpDir(): String =
    Files.createTempDirectory("graft-dsv2").toString

  private val schema = SchemaDsl.struct(
    "id" -> "int64", "name" -> "string", "score" -> "float64",
    "ok" -> "boolean", "ts" -> "timestamp")

  /** Two flushed batches with disjoint id ranges (per-file stats), one
   *  deleted row resolved into a DV. */
  private def buildTable(): GraftTable = {
    val dir = tmpDir() + "/t"
    val t = GraftTable.create(spark, dir, schema,
      Identity.Keys(Seq("id")), TableConfig(memSliceSize = 4, walEnabled = false))
    def row(i: Long) = Row(i, if (i % 7 == 0) null else s"n$i",
      i * 1.5, i % 2 == 0, java.sql.Timestamp.valueOf(f"2025-01-01 00:00:${i % 60}%02d"))
    t.apply((1L to 20L).flatMap(i =>
      CdcEvent.upsert(row(i), Seq(i), i)) :+ Commit(21L))
    t.apply((101L to 120L).flatMap(i =>
      CdcEvent.upsert(row(i), Seq(i), i)) :+ Commit(121L))
    t.apply(Seq(Delete(Seq(5L), 130L), Commit(131L)))
    t
  }

  test("format(graft) read equals library read, DVs applied") {
    val t = buildTable()
    val expected = t.read(scala.None).orderBy("id").collect().toSeq
    val got = spark.read.format("graft").load(t.root)
      .orderBy("id").collect().toSeq
    assert(got == expected)
    assert(!got.exists(_.getLong(0) == 5L), "DV'd row must not surface")
    t.drop()
  }

  test("column pruning and zero-column count") {
    val t = buildTable()
    val df = spark.read.format("graft").load(t.root)
    val names = df.select("name").collect().map(_.getString(0)).toSeq
    assert(names.length == 39 && names.count(_ == null) > 0)
    assert(df.count() == 39, "count(*) drives the zero-column reader path")
    val pairs = df.select("id", "score").orderBy("id").collect()
    assert(pairs.head.getDouble(1) == 1.5)
    t.drop()
  }

  test("full-key equality probes the bucketed index; stats alone cannot") {
    // two files with OVERLAPPING id ranges defeat min/max pruning; the
    // merged (hash-bucketed) key index names the exact file — the
    // reference's persisted-hash-map point probe as DSv2 file pruning
    val dir = tmpDir() + "/t"
    val t = GraftTable.create(spark, dir, schema,
      Identity.Keys(Seq("id")), TableConfig(walEnabled = false))
    def row(i: Long) = Row(i, s"n$i", i * 1.5, i % 2 == 0,
      java.sql.Timestamp.valueOf(f"2025-01-01 00:00:${i % 60}%02d"))
    val odds = (1L to 19L by 2) :+ 100L
    val evens = (2L to 20L by 2) :+ 99L
    t.apply(odds.flatMap(i => CdcEvent.upsert(row(i), Seq(i), i)) :+ Commit(50L))
    t.flush(); t.publish()
    t.apply(evens.flatMap(i => CdcEvent.upsert(row(i), Seq(i), i + 50)) :+ Commit(99L))
    t.flush(); t.publish()
    assert(t.currentManifest.dataFiles.size == 2)
    t.mergeIndexes()
    val m = t.currentManifest
    assert(m.indexFiles.nonEmpty && m.indexFiles.forall(_.khRange.size == 2),
      "merged index files carry their hash coverage")
    def partsFor(fs: Array[org.apache.spark.sql.sources.Filter]): Int = {
      val sb = new GraftScanBuilder(t.root, m)
      sb.pushFilters(fs)
      sb.build().toBatch.planInputPartitions().length
    }
    assert(partsFor(Array.empty) == 2)
    // both files' id stats cover 19 — stats pass 2, the index names 1
    assert(partsFor(Array(GreaterThan("id", 18L), LessThan("id", 20L))) == 2,
      "overlapping ranges: stats cannot isolate")
    assert(partsFor(Array(EqualTo("id", 19L))) == 1,
      "the index probe plans exactly the one file holding the key")
    // a key that never existed plans ZERO files
    assert(partsFor(Array(EqualTo("id", 55L))) == 0)
    // IN-list batch lookup: keys living in ONE file plan one file;
    // keys spanning both plan both; all-absent keys plan zero
    assert(partsFor(Array(
      org.apache.spark.sql.sources.In("id", Array(3L, 7L, 11L)))) == 1)
    assert(partsFor(Array(
      org.apache.spark.sql.sources.In("id", Array(3L, 4L)))) == 2)
    assert(partsFor(Array(
      org.apache.spark.sql.sources.In("id", Array(55L, 66L)))) == 0)
    // end-to-end correctness with the probe active
    val got = spark.read.format("graft").load(t.root)
      .where(col("id") === 19L).collect()
    assert(got.length == 1 && got.head.getLong(0) == 19L)
    assert(spark.read.format("graft").load(t.root)
      .where(col("id") === 55L).count() == 0L)
    // 10k-key IN (the reference's batch-probe stress shape,
    // microbench_index_stress.rs): the probe must still engage — per-
    // probe file opens stay bounded by the COVERING buckets, here one
    // data file holds the only present keys, the other 9,997 miss
    val bigIn = (1000L to 10996L).toArray ++ Array(3L, 5L, 7L)
    assert(partsFor(Array(
      org.apache.spark.sql.sources.In("id", bigIn.map(_.asInstanceOf[Any])))) == 1,
      "10k-key IN must plan only the file holding the present keys")
    assert(partsFor(Array(org.apache.spark.sql.sources.In("id",
      (1000L to 10999L).toArray.map(_.asInstanceOf[Any])))) == 0,
      "all-absent 10k-key IN plans zero files")
    val bigGot = spark.read.format("graft").load(t.root)
      .where(col("id").isin(bigIn: _*)).collect()
    assert(bigGot.map(_.getLong(0)).sorted.toSeq == Seq(3L, 5L, 7L))
    t.drop()
  }

  test("composite-key point probe needs every key column pinned") {
    val dir = tmpDir() + "/t"
    val sch = SchemaDsl.struct("id" -> "int64", "name" -> "string",
      "v" -> "int64")
    val t = GraftTable.create(spark, dir, sch,
      Identity.Keys(Seq("id", "name")), TableConfig(walEnabled = false))
    def ev(i: Long, n: String) = CdcEvent.upsert(Row(i, n, i), Seq(i, n), i)
    t.apply((1L to 10L).flatMap(i => ev(i, s"a$i")) :+ Commit(20L))
    t.flush(); t.publish()
    t.apply((1L to 10L).flatMap(i => ev(i, s"b$i")) :+ Commit(40L))
    t.flush(); t.publish()
    t.mergeIndexes()
    val m = t.currentManifest
    def partsFor(fs: Array[org.apache.spark.sql.sources.Filter]): Int = {
      val sb = new GraftScanBuilder(t.root, m)
      sb.pushFilters(fs)
      sb.build().toBatch.planInputPartitions().length
    }
    // id stats overlap across both files ([1,10] each); only the full
    // composite equality engages the index probe
    assert(partsFor(Array(EqualTo("id", 5L))) == 2,
      "partial key: no probe, stats cannot isolate")
    assert(partsFor(Array(EqualTo("id", 5L), EqualTo("name", "a5"))) == 1)
    assert(partsFor(Array(EqualTo("id", 5L), EqualTo("name", "zz"))) == 0)
    val got = spark.read.format("graft").load(t.root)
      .where(col("id") === 5L && col("name") === "b5").collect()
    assert(got.length == 1 && got.head.getLong(2) == 5L)
    t.drop()
  }

  test("pushed filters prune files by manifest stats") {
    val t = buildTable()
    val manifest = t.currentManifest
    assert(manifest.dataFiles.size >= 2, "need multiple files to prune")
    def partsFor(filters: Array[org.apache.spark.sql.sources.Filter]): Int = {
      val sb = new GraftScanBuilder(t.root, manifest)
      sb.pushFilters(filters)
      sb.build().toBatch.planInputPartitions().length
    }
    val all = partsFor(Array.empty)
    assert(partsFor(Array(GreaterThan("id", 100L))) < all,
      "id > 100 must drop the low-range file")
    assert(partsFor(Array(LessThan("id", 0L))) == 0,
      "id < 0 matches nothing")
    assert(partsFor(Array(EqualTo("id", 110L))) == 1,
      "point lookup hits exactly one file")
    // correctness with pushdown active end-to-end
    val got = spark.read.format("graft").load(t.root)
      .where(col("id") > 100L).orderBy("id").collect()
    assert(got.length == 20 && got.head.getLong(0) == 101L)
    t.drop()
  }

  test("decimal filters prune files by manifest stats") {
    // decimal joined the stats family in r14: bounds round-trip via
    // toPlainString and the pushed literal coerces to BigDecimal
    // (scale-insensitive compareTo), so money-range scans prune files
    val sch = SchemaDsl.struct("id" -> "int64", "amt" -> "decimal(12,2)")
    val t = GraftTable.create(spark, tmpDir() + "/tdp", sch,
      Identity.Keys(Seq("id")),
      TableConfig(memSliceSize = 64, walEnabled = false))
    def bd(cents: Long) = new java.math.BigDecimal(
      java.math.BigInteger.valueOf(cents), 2)
    // two files with disjoint amt ranges: [1.00, 9.00] and [100.00, 900.00]
    t.apply((1L to 9L).flatMap(i => CdcEvent.upsert(
      Row(i, bd(i * 100L)), Seq(i), i)) :+ Commit(10L))
    t.flush(); t.publish()
    t.apply((101L to 109L).flatMap(i => CdcEvent.upsert(
      Row(i, bd((i - 100L) * 10000L)), Seq(i), i)) :+ Commit(110L))
    t.flush(); t.publish()
    val m = t.currentManifest
    assert(m.dataFiles.size == 2)
    def partsFor(filters: Array[org.apache.spark.sql.sources.Filter]): Int = {
      val sb = new GraftScanBuilder(t.root, m)
      sb.pushFilters(filters)
      sb.build().toBatch.planInputPartitions().length
    }
    assert(partsFor(Array(GreaterThan("amt", bd(5000L)))) == 1,
      "amt > 50.00 must plan only the high-range file")
    assert(partsFor(Array(LessThan("amt", bd(100L)))) == 0,
      "amt < 1.00 matches nothing")
    assert(partsFor(Array(EqualTo("amt", bd(500L)))) == 1)
    // end-to-end with the SQL-shaped literal (Catalyst decimal literal)
    val got = spark.read.format("graft").load(t.root)
      .where(col("amt") > expr("CAST(50.00 AS DECIMAL(12,2))"))
      .orderBy("id").collect()
    assert(got.length == 9 && got.head.getLong(0) == 101L)
    t.drop()
  }

  test("DSv2 stat pruning composes with clustered compaction") {
    // ids interleave across the two ingest files, so BEFORE clustering
    // both span nearly the whole range and a range filter prunes
    // nothing; after optimize(clusterBy) the rewrite's preserved
    // min/max stats are disjoint and the same pushed filter drops files
    // at scan-planning time — maintenance makes the connector faster
    // with zero connector changes.
    val dir = tmpDir() + "/t"
    val t = GraftTable.create(spark, dir, schema,
      Identity.Keys(Seq("id")), TableConfig(memSliceSize = 4,
        walEnabled = false, rowsPerFile = 10))
    def row(i: Long) = Row(i, s"n$i", i * 1.5, i % 2 == 0,
      java.sql.Timestamp.valueOf("2025-01-01 00:00:00"))
    val (low, high) = ((1L to 10L) ++ (101L to 110L)).partition(_ <= 10L)
    // batch 1 = odd positions of both ranges, batch 2 = even: interleaved
    val Seq(b1, b2) = Seq(0, 1).map(p =>
      (low ++ high).zipWithIndex.collect { case (i, ix) if ix % 2 == p => i })
    t.apply(b1.flatMap(i => CdcEvent.upsert(row(i), Seq(i), i))
      :+ Commit(200L))
    t.apply(b2.flatMap(i => CdcEvent.upsert(row(i), Seq(i), i))
      :+ Commit(400L))
    t.flush()
    def partsFor(m: graft.format.Manifest,
        filters: Array[org.apache.spark.sql.sources.Filter]): Int = {
      val sb = new GraftScanBuilder(t.root, m)
      sb.pushFilters(filters)
      sb.build().toBatch.planInputPartitions().length
    }
    val before = t.currentManifest
    assert(before.dataFiles.size >= 2)
    assert(partsFor(before, Array(GreaterThan("id", 100L))) ==
      partsFor(before, Array.empty), "interleaved files cannot prune")
    t.optimize(clusterBy = Seq("id"))
    val after = t.currentManifest
    assert(after.dataFiles.size >= 2, "rowsPerFile=10 over 20 live rows")
    assert(partsFor(after, Array(GreaterThan("id", 100L))) <
      partsFor(after, Array.empty), "clustered stats must prune")
    val got = spark.read.format("graft").load(t.root)
      .where(col("id") > 100L).orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == (101L to 110L),
      "pruned read returns exactly the filtered rows")
    t.drop()
  }

  test("count(*) answered from the manifest, zero files read") {
    val t = buildTable()
    val df = spark.read.format("graft").load(t.root)
    val q = df.agg(count(lit(1)))
    assert(q.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "unfiltered count(*) must hit the metadata-only scan")
    assert(q.head().getLong(0) == 39L, "count must respect DV deletes")
    // FILE-DECIDABLE filter (id > 100 splits exactly between the two
    // ingest batches): every file is all-match or none-match, so the
    // count still answers from the manifest, BEHIND the predicate
    val filtered = df.where(col("id") > 100L).agg(count(lit(1)))
    assert(filtered.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "boundary-aligned filtered count(*) must stay metadata-only")
    assert(filtered.head().getLong(0) == 20L)
    // a MID-FILE predicate is indeterminate on some file — must fall
    // back to the real scan (and still answer exactly)
    val midFile = df.where(col("id") > 102L).agg(count(lit(1)))
    assert(!midFile.queryExecution.executedPlan.toString.contains("GraftAggScan"))
    assert(midFile.head().getLong(0) == 18L)
    t.drop()
  }

  test("min/max pushed on delete-free snapshot, fall back under DVs") {
    val dir = tmpDir() + "/t"
    val t = GraftTable.create(spark, dir, schema,
      Identity.Keys(Seq("id")), TableConfig(memSliceSize = 4, walEnabled = false))
    def row(i: Long) = Row(i, s"n$i", i * 1.5, i % 2 == 0,
      java.sql.Timestamp.valueOf(f"2025-01-01 00:00:${i % 60}%02d"))
    t.apply((1L to 20L).flatMap(i =>
      CdcEvent.upsert(row(i), Seq(i), i)) :+ Commit(21L))
    val df = spark.read.format("graft").load(t.root)
    val q = df.agg(min("id"), max("score"), count(lit(1)))
    assert(q.queryExecution.executedPlan.toString.contains("GraftAggScan"))
    val r = q.head()
    assert(r.getLong(0) == 1L && r.getDouble(1) == 30.0 && r.getLong(2) == 20L)
    // now delete a row: min/max can no longer trust file stats
    t.apply(Seq(Delete(Seq(1L), 30L), Commit(31L)))
    val df2 = spark.read.format("graft").load(t.root)
    val q2 = df2.agg(min("id"), max("id"))
    assert(!q2.queryExecution.executedPlan.toString.contains("GraftAggScan"))
    val r2 = q2.head()
    assert(r2.getLong(0) == 2L && r2.getLong(1) == 20L)
    // count alone still metadata-only under DVs
    val q3 = df2.agg(count(lit(1)))
    assert(q3.queryExecution.executedPlan.toString.contains("GraftAggScan"))
    assert(q3.head().getLong(0) == 19L)
    t.drop()
  }

  test("pushed min/max uses UTF-8 binary string order and micro timestamps") {
    // U+FFFD sorts ABOVE a surrogate pair in UTF-16 code units but BELOW
    // U+1F600 in UTF-8 bytes; Spark's Min/Max compare UTF8String binary.
    // Timestamps one microsecond apart collapse under millis ordering.
    val dir = tmpDir() + "/t"
    val sch = SchemaDsl.struct("id" -> "int64", "name" -> "string",
      "ts" -> "timestamp")
    val t = GraftTable.create(spark, dir, sch,
      Identity.Keys(Seq("id")), TableConfig(memSliceSize = 2, walEnabled = false))
    val rows = Seq(
      Row(1L, "�", java.sql.Timestamp.valueOf("2025-01-01 00:00:00.000002")),
      Row(2L, "😀", java.sql.Timestamp.valueOf("2025-01-01 00:00:00.000001")),
      Row(3L, "a", java.sql.Timestamp.valueOf("2025-01-01 00:00:00.000003")))
    t.apply(rows.zipWithIndex.flatMap { case (r, i) =>
      CdcEvent.upsert(r, Seq(r.getLong(0)), i + 1L) } :+ Commit(10L))
    val df = spark.read.format("graft").load(t.root)
    // these strings are SHORT (≤32 cp), so their bounds carry the
    // exactness marker and the whole aggregation pushes — and the
    // pushed answer must still use UTF-8 binary order, not UTF-16
    // (anyOrdering(StringType) compares UTF8String bytes end to end:
    // the write-side min/max fold AND the read-side per-file fold)
    val q = df.agg(min("name"), max("name"), min("ts"), max("ts"))
    assert(q.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "exact-marked short strings must push min/max")
    val got = q.head()
    val want = t.read(None).agg(min("name"), max("name"), min("ts"), max("ts")).head()
    assert(got == want, s"pushed=$got expected=$want")
    assert(got.getString(1) == "😀", "max string must be UTF-8 order")
    val qt = df.agg(min("ts"), max("ts"))
    assert(qt.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "delete-free snapshot must answer timestamp min/max from the manifest")
    val gt = qt.head()
    assert(gt.getTimestamp(0) ==
      java.sql.Timestamp.valueOf("2025-01-01 00:00:00.000001"))
    assert(gt.getTimestamp(1) ==
      java.sql.Timestamp.valueOf("2025-01-01 00:00:00.000003"))
    t.drop()
  }

  test("limit pushdown plans only enough files and caps readers") {
    val t = buildTable()
    val manifest = t.currentManifest
    val sb = new GraftScanBuilder(t.root, manifest)
    sb.pushLimit(3)
    val parts = sb.build().toBatch.planInputPartitions()
    assert(parts.length == 1, s"3 rows fit in the first file, got ${parts.length}")
    val all = new GraftScanBuilder(t.root, manifest).build()
      .toBatch.planInputPartitions().length
    assert(all > 1)
    // end-to-end: exact limit semantics preserved (Spark's global cut)
    assert(spark.read.format("graft").load(t.root).limit(3).count() == 3L)
    t.drop()
  }

  test("timestamps and booleans round-trip through the reader") {
    val t = buildTable()
    val r = spark.read.format("graft").load(t.root)
      .where(col("id") === 3L).select("ts", "ok").head()
    assert(r.getTimestamp(0) == java.sql.Timestamp.valueOf("2025-01-01 00:00:03"))
    assert(r.getBoolean(1) == false)
    t.drop()
  }

  test("DV-free scans are columnar; scans under DVs flip to row mode") {
    // the plan-shape contract behind the DSv2 perf story: without
    // deletes the scan feeds ColumnarBatches into ColumnarToRow (the
    // built-in parquet shape); any DV'd file flips the whole scan to
    // row mode so positional skips can apply
    val dir = tmpDir() + "/colmode"
    val t = GraftTable.create(spark, dir, schema,
      Identity.Keys(Seq("id")), TableConfig(memSliceSize = 4, walEnabled = false))
    def row(i: Long) = Row(i, s"n$i", i * 1.5, true,
      java.sql.Timestamp.valueOf("2025-01-01 00:00:01"))
    t.apply((1L to 8L).flatMap(i =>
      CdcEvent.upsert(row(i), Seq(i), i)) :+ Commit(9L))
    def plan() = spark.read.format("graft").load(dir)
      .select("id", "score").queryExecution.executedPlan.toString
    assert(plan().contains("ColumnarToRow"),
      "delete-free snapshot must serve ColumnarBatches")
    t.apply(Seq(Delete(Seq(3L), 20L), Commit(21L)))
    assert(!plan().contains("ColumnarToRow"),
      "a DV'd file must flip the scan to the row path")
    // compaction folds the DVs away -> columnar again
    t.optimize()
    assert(plan().contains("ColumnarToRow"),
      "post-compaction snapshot must be columnar again")
    t.drop()
  }

  test("decimal, array, and struct columns read identically to the library path") {
    // the vectorized reader serves the full type surface the reference's
    // table provider serves (whatever Arrow schema the table has,
    // table_provider.rs:74-171) — including under DVs (row path)
    val dir = tmpDir() + "/typed"
    val sch = StructType(Seq(
      StructField("id", LongType),
      StructField("price", DecimalType(12, 2)),
      StructField("tags", ArrayType(StringType)),
      StructField("meta", StructType(Seq(
        StructField("k", StringType), StructField("v", LongType))))))
    val t = GraftTable.create(spark, dir, sch,
      Identity.Keys(Seq("id")), TableConfig(memSliceSize = 4, walEnabled = false))
    def row(i: Long) = Row(i, BigDecimal(i * 100 + 1, 2).bigDecimal,
      if (i % 5 == 0) null else Seq(s"t$i", s"u$i"),
      Row(s"k$i", i * 10))
    t.apply((1L to 12L).flatMap(i =>
      CdcEvent.upsert(row(i), Seq(i), i)) :+ Commit(13L))
    def collectBoth() = {
      val lib = t.read(scala.None).orderBy("id").collect().toSeq
      val v2 = spark.read.format("graft").load(dir).orderBy("id").collect().toSeq
      (lib, v2)
    }
    val (lib1, v21) = collectBoth()
    assert(v21 == lib1, "columnar path must match the library read")
    assert(v21.head.getDecimal(1) == new java.math.BigDecimal("1.01"))
    assert(v21(1).getSeq[String](2) == Seq("t2", "u2"))
    assert(v21.head.getStruct(3).getLong(1) == 10L)
    // a delete flips the scan to the DV row path — same contract
    t.apply(Seq(Delete(Seq(6L), 20L), Commit(21L)))
    val (lib2, v22) = collectBoth()
    assert(v22 == lib2, "DV row path must match the library read")
    assert(!v22.exists(_.getLong(0) == 6L))
    t.drop()
  }

  test("schema evolution through the connector: added and re-added columns") {
    val dir = tmpDir() + "/evo"
    val t = GraftTable.create(spark, dir, schema,
      Identity.Keys(Seq("id")), TableConfig(memSliceSize = 1, walEnabled = false))
    t.insertAll(Seq(Row(1L, "a", 1.0, true,
      java.sql.Timestamp.valueOf("2025-01-01 00:00:01"))), 1) // flushed pre-alter
    // 1) plain add: pre-alter file physically LACKS the column
    t.alterAddColumn("grade", "int64")
    // 2) drop + re-add: pre-alter file physically CONTAINS 'name'
    t.alterDropColumns(Seq("name"))
    t.alterAddColumn("name", "string")
    t.insertAll(Seq(Row(2L, 2.0, false,
      java.sql.Timestamp.valueOf("2025-01-01 00:00:02"), 7L, "fresh")), 10)
    val got = spark.read.format("graft").load(dir)
      .select("id", "grade", "name").collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2)))).toMap
    assert(got == Map(1L -> ((-1L, null)), 2L -> ((7L, "fresh"))),
      "old file: null grade AND null name (no resurrection); new file: real values")
    // selecting ONLY columns absent from the old file still counts its rows
    assert(spark.read.format("graft").load(dir).select("grade").count() == 2L)
    t.drop()
  }

  test("runtime V2 filtering prunes files from join-key IN predicates") {
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    import org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
    val t = buildTable() // two files: ids 1-20 and 101-120
    val manifest = t.currentManifest
    def scanWith(preds: Array[Predicate]): Int = {
      val sb = new GraftScanBuilder(t.root, manifest)
      val scan = sb.build()
      scan.asInstanceOf[SupportsRuntimeV2Filtering].filter(preds)
      scan.toBatch.planInputPartitions().length
    }
    def in(values: Long*): Predicate =
      new Predicate("IN", (Expressions.column("id") +:
        values.map(v => Expressions.literal(v):
          org.apache.spark.sql.connector.expressions.Expression)).toArray)
    val all = scanWith(Array.empty)
    assert(all >= 2)
    assert(scanWith(Array(in(110L, 115L))) == 1,
      "keys from one range plan one file")
    assert(scanWith(Array(in(500L))) == 0, "alien keys plan nothing")
    assert(scanWith(Array(in(5L, 110L))) == all,
      "keys spanning both ranges keep both files")
    // an unsupported predicate shape is ignored, never wrong
    assert(scanWith(Array(new Predicate("ALWAYS_TRUE", Array.empty))) == all)
    // e2e: broadcast join against a 2-key dim — result must equal the
    // library-path join regardless of whether Spark elected DPP
    import org.apache.spark.sql.functions.broadcast
    val dim = spark.range(109, 111).toDF("id") // ids 109, 110
    val got = spark.read.format("graft").load(t.root)
      .join(broadcast(dim), "id").select("id").collect()
      .map(_.getLong(0)).toSet
    assert(got == Set(109L, 110L))
    t.drop()
  }

  // ---- streaming source (MicroBatchStream over manifest versions) -----

  private def appendOnlyTable(): GraftTable = {
    val dir = tmpDir() + "/t"
    val t = GraftTable.create(spark, dir, SchemaDsl.struct(
      "id" -> "int64", "v" -> "float64"),
      Identity.None, TableConfig(walEnabled = false))
    t.insertAll((1L to 50L).map(i => Row(i, i * 0.5)), 1)
    t.flush(); t.publish() // streams serve PUBLISHED manifest versions
    t
  }

  test("readStream serves existing content, then new commits incrementally") {
    val t = appendOnlyTable()
    val ckpt = tmpDir() + "/ckpt"
    val qname = "gss_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = spark.readStream.format("graft").load(t.root)
      .writeStream.format("memory").queryName(qname)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
      .start()
    try {
      def sinkIds(): Set[Long] =
        spark.table(qname).select("id").collect().map(_.getLong(0)).toSet
      def await(cond: => Boolean): Unit = {
        val deadline = System.currentTimeMillis() + 30000
        while (!cond && System.currentTimeMillis() < deadline) {
          q.processAllAvailable(); Thread.sleep(50)
        }
        assert(cond)
      }
      await(sinkIds() == (1L to 50L).toSet)
      // commit more while the stream runs: only the NEW files replay
      t.insertAll((51L to 80L).map(i => Row(i, i * 0.5)), 100)
      t.flush(); t.publish()
      await(sinkIds() == (1L to 80L).toSet)
    } finally q.stop()
    t.drop()
  }

  test("streaming read rejects keyed tables and non-append commits") {
    // keyed table: refused at stream construction
    val keyed = buildTable()
    val ex = intercept[Exception] {
      spark.readStream.format("graft").load(keyed.root)
        .writeStream.format("memory")
        .queryName("gss_keyed_" + java.util.UUID.randomUUID().toString.take(8))
        .option("checkpointLocation", tmpDir() + "/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
    assert(ex.getMessage != null)
    keyed.drop()

    // append-only table compacted mid-stream: the removed files make
    // the range non-additive and the batch must fail loudly
    val t = appendOnlyTable()
    val v0 = t.currentManifest.version
    t.insertAll((51L to 60L).map(i => Row(i, i * 0.5)), 100)
    t.flush(); t.publish()
    val stream = new graft.sources.GraftMicroBatchStream(t.root,
      t.currentManifest, t.schema, Array.empty)
    t.optimize() // rewrites files -> non-additive
    val vN = t.currentManifest.version
    val err = intercept[IllegalArgumentException] {
      stream.planInputPartitions(
        stream.deserializeOffset(s"""{"version":$v0}"""),
        stream.deserializeOffset(s"""{"version":$vN}"""))
    }
    assert(err.getMessage.contains("non-append"))
    t.drop()
  }

  test("count(col) pushed from null accounting; IS [NOT] NULL prunes files") {
    val dir = tmpDir() + "/t"
    val t = GraftTable.create(spark, dir, schema,
      Identity.Keys(Seq("id")), TableConfig(memSliceSize = 4, walEnabled = false))
    def row(i: Long, name: Any) = Row(i, name, i * 1.5, i % 2 == 0,
      java.sql.Timestamp.valueOf(f"2025-01-01 00:00:${i % 60}%02d"))
    // file A: nulls at 7,14 (2 of 20); file B: nulls at 105,112,119
    t.apply((1L to 20L).flatMap(i =>
      CdcEvent.upsert(row(i, if (i % 7 == 0) null else s"n$i"), Seq(i), i))
      :+ Commit(21L))
    t.apply((101L to 120L).flatMap(i =>
      CdcEvent.upsert(row(i, if (i % 7 == 0) null else s"n$i"), Seq(i), i))
      :+ Commit(121L))
    // file C: no nulls at all; file D: ALL names null
    t.apply((1001L to 1005L).flatMap(i =>
      CdcEvent.upsert(row(i, s"n$i"), Seq(i), i)) :+ Commit(1006L))
    t.apply((2001L to 2003L).flatMap(i =>
      CdcEvent.upsert(row(i, null), Seq(i), i)) :+ Commit(2004L))
    t.flush(); t.publish() // the 3-row tail is below the slice size
    val m = t.currentManifest
    assert(m.dataFiles.size == 4)
    val df = spark.read.format("graft").load(t.root)
    // COUNT(col) answered from per-file null counts, zero files read
    val q = df.agg(count(col("name")), count(lit(1)))
    assert(q.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "count(col) must come from the manifest's null accounting")
    val r = q.head()
    assert(r.getLong(0) == 40L && r.getLong(1) == 48L,
      s"non-null names ${r.getLong(0)} of ${r.getLong(1)}")
    // DISTINCT count cannot come from counts — must fall back
    val qd = df.agg(count_distinct(col("name")))
    assert(!qd.queryExecution.executedPlan.toString.contains("GraftAggScan"))
    assert(qd.head().getLong(0) == 40L)
    // null-presence filters prune whole FILES from the plan
    def partsFor(fs: Array[org.apache.spark.sql.sources.Filter]): Int = {
      val sb = new GraftScanBuilder(t.root, m)
      sb.pushFilters(fs)
      sb.build().toBatch.planInputPartitions().length
    }
    assert(partsFor(Array.empty) == 4)
    assert(partsFor(Array(org.apache.spark.sql.sources.IsNull("name"))) == 3,
      "the null-free file must not be planned for IS NULL")
    assert(partsFor(Array(org.apache.spark.sql.sources.IsNotNull("name"))) == 3,
      "the all-null file must not be planned for IS NOT NULL")
    // end-to-end values with the pruning active
    assert(df.where(col("name").isNull).count() == 8L)
    assert(df.where(col("name").isNotNull).count() == 40L)
    // a DV makes count(col) unsafe — falls back, stays exact
    t.apply(Seq(Delete(Seq(7L), 3000L), Commit(3001L)))
    val df2 = spark.read.format("graft").load(t.root)
    val q2 = df2.agg(count(col("name")))
    assert(!q2.queryExecution.executedPlan.toString.contains("GraftAggScan"))
    assert(q2.head().getLong(0) == 40L) // deleted row had a null name
    t.drop()
  }

  test("SUM(col) pushed from exact integral per-file sums") {
    val dir = tmpDir() + "/t"
    val sch = SchemaDsl.struct("id" -> "int64", "v" -> "int64",
      "score" -> "float64")
    val t = GraftTable.create(spark, dir, sch,
      Identity.Keys(Seq("id")), TableConfig(memSliceSize = 4, walEnabled = false))
    // two files; v includes nulls and values near Long.MaxValue so the
    // pushed total only matches Spark if the partials recombine with
    // the SAME wrapping 64-bit arithmetic non-ANSI SUM uses
    val big = Long.MaxValue - 3L
    t.apply((1L to 8L).flatMap(i => CdcEvent.upsert(
      Row(i, if (i % 4 == 0) null else big, i * 0.5), Seq(i), i))
      :+ Commit(9L))
    t.apply((101L to 108L).flatMap(i => CdcEvent.upsert(
      Row(i, if (i % 4 == 0) null else big, i * 0.5), Seq(i), i))
      :+ Commit(109L))
    t.flush(); t.publish()
    val df = spark.read.format("graft").load(t.root)
    // ANSI arithmetic (the Spark 4 default): the bounds CANNOT prove
    // no-overflow for these near-MaxValue values, so the pushdown must
    // decline and let the scan raise the ANSI overflow (never mask it
    // with a silently wrapped metadata total)
    val qa = df.agg(sum(col("v")))
    assert(!qa.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "overflow-unprovable SUM must not push under ANSI arithmetic")
    intercept[Exception] { qa.head() } // the genuine ANSI overflow
    // non-ANSI: wrapping partials must recombine to exactly the scan's
    // wrapped total
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val q = spark.read.format("graft").load(t.root)
        .agg(sum(col("v")), count(lit(1)))
      assert(q.queryExecution.executedPlan.toString.contains("GraftAggScan"),
        "integral SUM must come from the manifest's per-file sums")
      val want = t.read(scala.None).agg(sum(col("v"))).head().getLong(0)
      val got = q.head()
      assert(got.getLong(0) == want && got.getLong(1) == 16L,
        s"pushed sum ${got.getLong(0)} != scan sum $want")
      assert(want < 0L, "the test must actually exercise 64-bit wrap")
    } finally spark.conf.unset("spark.sql.ansi.enabled")
    // under ANSI, a PROVABLY safe sum (small bounds) still pushes
    val t3 = GraftTable.create(spark, tmpDir() + "/t3", sch,
      Identity.Keys(Seq("id")), TableConfig(memSliceSize = 4, walEnabled = false))
    t3.apply((1L to 9L).flatMap(i => CdcEvent.upsert(
      Row(i, i * 10, 1.0), Seq(i), i)) :+ Commit(10L))
    t3.flush(); t3.publish()
    val qs = spark.read.format("graft").load(t3.root)
      .agg(sum(col("v")), avg(col("v")))
    assert(qs.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "bounds-provable SUM/AVG must push under ANSI")
    val rs = qs.head()
    assert(rs.getLong(0) == (1L to 9L).map(_ * 10).sum)
    // AVG is Divide(Cast(sum,double), Cast(count,double)) — bit-exact
    val wantAvg = t3.read(scala.None).agg(avg(col("v"))).head().getDouble(0)
    assert(rs.getDouble(1) == wantAvg, s"pushed avg ${rs.getDouble(1)} != $wantAvg")
    t3.drop()
    // a double column cannot push (order-dependent rounding)
    val qd = df.agg(sum(col("score")))
    assert(!qd.queryExecution.executedPlan.toString.contains("GraftAggScan"))
    // an all-null column sums to NULL
    val t2dir = tmpDir() + "/t2"
    val t2 = GraftTable.create(spark, t2dir, sch,
      Identity.Keys(Seq("id")), TableConfig(memSliceSize = 4, walEnabled = false))
    t2.apply((1L to 5L).flatMap(i => CdcEvent.upsert(
      Row(i, null, 1.0), Seq(i), i)) :+ Commit(6L))
    t2.flush(); t2.publish()
    val qn = spark.read.format("graft").load(t2.root).agg(sum(col("v")))
    assert(qn.queryExecution.executedPlan.toString.contains("GraftAggScan"))
    assert(qn.head().isNullAt(0))
    t.drop(); t2.drop()
  }

  test("partial GROUP BY pushdown answers count-only groupings over " +
      "interleaved files from per-value accounting") {
    val sch = SchemaDsl.struct("id" -> "int64", "k" -> "int64",
      "v" -> "int64", "w" -> "int64")
    val t = GraftTable.create(spark, tmpDir() + "/t", sch,
      Identity.Keys(Seq("id")),
      TableConfig(rowsPerFile = 16, walEnabled = false))
    // k = id % 3 interleaved in EVERY file; v nullable; w null-free
    def row(i: Long) = Row(i, i % 3,
      if (i % 5 == 0) null else i, i * 2)
    t.apply((1L to 60L).flatMap(i =>
      CdcEvent.upsert(row(i), Seq(i), i)) :+ Commit(61L))
    t.flush(); t.publish()
    assert(t.currentManifest.dataFiles.size > 1)
    assert(t.currentManifest.dataFiles.forall(
      _.valueStats.get("k").exists(_.size == 3)),
      "every file must record per-value accounting for k")
    val df = spark.read.format("graft").load(t.root)
    def planOf(q: org.apache.spark.sql.DataFrame): String =
      q.queryExecution.executedPlan.toString
    def partialOnly(q: org.apache.spark.sql.DataFrame): Seq[Row] = {
      val p = planOf(q)
      assert(p.contains("GraftAggScan(partial") && !p.contains("GraftScan("),
        s"grouped count not answered as manifest partials:\n$p")
      q.collect().toSeq
    }
    // count(*), count(group col), count(null-free col): all per-cell
    val got = partialOnly(df.groupBy(col("k")).agg(count(lit(1)).as("n"),
      count(col("k")).as("nk"), count(col("w")).as("nw")))
    val want = t.read(scala.None).groupBy(col("k")).agg(
      count(lit(1)), count(col("k")), count(col("w"))).collect().toSeq
    assert(got.map(_.toSeq).toSet == want.map(_.toSeq).toSet,
      s"partial GROUP BY diverges from the scan: $got vs $want")
    // a nullable NON-group count over a multi-cell file is unknowable
    val pv = planOf(df.groupBy(col("k")).agg(count(col("v"))))
    assert(!pv.contains("GraftAggScan"),
      "count(nullable non-group col) must keep the scan")
    // so is any measure aggregate (per-cell sums are not accounted)
    assert(!planOf(df.groupBy(col("k")).agg(sum(col("v"))))
      .contains("GraftAggScan"), "grouped SUM must keep the scan")
    // a high-cardinality group column overflowed the counter cap
    assert(!planOf(df.groupBy(col("id")).agg(count(lit(1))))
      .contains("GraftAggScan"), "GROUP BY id must keep the scan")
    // two interleaved group columns: the joint split is not accounted
    val t2 = GraftTable.create(spark, tmpDir() + "/t2", sch,
      Identity.Keys(Seq("id")),
      TableConfig(rowsPerFile = 16, walEnabled = false))
    t2.apply((1L to 60L).flatMap(i => CdcEvent.upsert(
      Row(i, i % 3, i % 2, i), Seq(i), i)) :+ Commit(61L))
    t2.flush(); t2.publish()
    val df2 = spark.read.format("graft").load(t2.root)
    assert(!planOf(df2.groupBy(col("k"), col("v")).agg(count(lit(1))))
      .contains("GraftAggScan"),
      "two independently-split group columns must keep the scan")
    // …but interleaved k × single-valued constant col pushes
    val t3 = GraftTable.create(spark, tmpDir() + "/t3", sch,
      Identity.Keys(Seq("id")),
      TableConfig(rowsPerFile = 16, walEnabled = false))
    t3.apply((1L to 60L).flatMap(i => CdcEvent.upsert(
      Row(i, i % 3, 7L, i), Seq(i), i)) :+ Commit(61L))
    t3.flush(); t3.publish()
    val df3 = spark.read.format("graft").load(t3.root)
    val got3 = partialOnly(df3.groupBy(col("k"), col("v"))
      .agg(count(lit(1)).as("n")))
    assert(got3.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap == Map((0L, 7L) -> 20L, (1L, 7L) -> 20L, (2L, 7L) -> 20L))
    // a delete makes the split stale (masked values unread): scan —
    // then refreshDvStats rewrites the LIVE per-value accounting and
    // the push re-arms with the delete folded in
    t.deleteWhere(col("id") === 9L) // k = 0 loses one row
    val dfDel = spark.read.format("graft").load(t.root)
    val pDel = planOf(dfDel.groupBy(col("k")).agg(count(lit(1))))
    assert(!pDel.contains("GraftAggScan"),
      "stale masked accounting must keep the scan")
    assert(t.refreshDvStats() >= 1)
    t.publish()
    val dfLive = spark.read.format("graft").load(t.root)
    val gotLive = partialOnly(dfLive.groupBy(col("k"))
      .agg(count(lit(1)).as("n")))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotLive == Map(0L -> 19L, 1L -> 20L, 2L -> 20L), gotLive)
    // NULL group: nulls on the group column land in their own cell
    val t4 = GraftTable.create(spark, tmpDir() + "/t4", sch,
      Identity.Keys(Seq("id")),
      TableConfig(rowsPerFile = 16, walEnabled = false))
    t4.apply((1L to 60L).flatMap(i => CdcEvent.upsert(
      Row(i, if (i % 4 == 0) null else i % 3, i, i), Seq(i), i))
      :+ Commit(61L))
    t4.flush(); t4.publish()
    val df4 = spark.read.format("graft").load(t4.root)
    val got4 = partialOnly(df4.groupBy(col("k")).agg(count(lit(1)).as("n"),
      count(col("k")).as("nk")))
    val want4 = t4.read(scala.None).groupBy(col("k")).agg(
      count(lit(1)), count(col("k"))).collect().toSeq
    assert(got4.map(_.toSeq).toSet == want4.map(_.toSeq).toSet,
      s"NULL-group partial diverges: $got4 vs $want4")
    // the clustered layout keeps the COMPLETE path (no 'partial' tag,
    // no final-merge rows): one row per group straight from the scan
    t2.optimize(clusterBy = Seq("k"))
    val dfC = spark.read.format("graft").load(t2.root)
    val pC = planOf(dfC.groupBy(col("k")).agg(count(lit(1))))
    assert(pC.contains("GraftAggScan(") && !pC.contains("GraftAggScan(partial"),
      s"single-valued layout must stay complete:\n$pC")
    // …while the COMPACTION read-back recorded per-value accounting for
    // the NON-cluster low-cardinality column (the fused follow-up
    // pass), so GROUP BY v pushes partially on the compacted layout
    assert(t2.currentManifest.dataFiles.forall(e =>
      e.rows == e.deletes || e.valueStats.get("v").exists(_.nonEmpty)),
      "compaction must record valueStats for the non-cluster column")
    val gotV = partialOnly(dfC.groupBy(col("v")).agg(count(lit(1)).as("n")))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotV == Map(0L -> 30L, 1L -> 30L), gotV)
    // file-exact filter composes: partial GROUP BY BEHIND the predicate
    val fLo = t.currentManifest.dataFiles.map(e =>
      e.stats("id").head.toLong).min
    val gotF = partialOnly(dfLive.where(col("id") >= fLo)
      .groupBy(col("k")).agg(count(lit(1)).as("n")))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotF == Map(0L -> 19L, 1L -> 20L, 2L -> 20L), gotF)
    t.drop(); t2.drop(); t3.drop(); t4.drop()
  }

  test("per-value accounting prunes equality/IN beyond min/max bounds") {
    // every file holds k ∈ {2, 20} (bounds [2,20]): `k = 10` sits
    // inside the bounds of EVERY file yet matches nothing — the
    // dictionary decision prunes all files and the query is manifest-
    // exact; `k IN (2,20,99)` covers every file's value set, so the
    // aggregate behind it is file-exact too, on a MULTI-valued layout
    val sch = SchemaDsl.struct("id" -> "int64", "k" -> "int64")
    val t = GraftTable.create(spark, tmpDir() + "/t", sch,
      Identity.Keys(Seq("id")),
      TableConfig(rowsPerFile = 16, walEnabled = false))
    t.apply((1L to 60L).flatMap(i => CdcEvent.upsert(
      Row(i, if (i % 2 == 0) 2L else 20L), Seq(i), i)) :+ Commit(61L))
    t.flush(); t.publish()
    val m = t.currentManifest
    assert(m.dataFiles.size > 1 &&
      m.dataFiles.forall(_.valueStats.get("k").exists(_.size == 2)))
    def partsFor(fs: Array[org.apache.spark.sql.sources.Filter]): Int = {
      val sb = new graft.sources.GraftScanBuilder(t.root, m)
      sb.pushFilters(fs)
      sb.build().toBatch.planInputPartitions().length
    }
    assert(partsFor(Array(EqualTo("k", 10L))) == 0,
      "an in-bounds literal absent from every value set must plan 0 files")
    assert(partsFor(Array(org.apache.spark.sql.sources.In(
      "k", Array[Any](7L, 9L)))) == 0)
    assert(partsFor(Array(EqualTo("k", 2L))) == m.dataFiles.size)
    val df = spark.read.format("graft").load(t.root)
    def planOf(q: org.apache.spark.sql.DataFrame): String =
      q.queryExecution.executedPlan.toString
    // file-exact aggregates BEHIND the dictionary decisions
    val qNone = df.where(col("k") === 10L).agg(count(lit(1)))
    assert(planOf(qNone).contains("GraftAggScan"), planOf(qNone))
    assert(qNone.head().getLong(0) == 0L)
    val qIn = df.where(col("k").isin(2L, 20L, 99L)).agg(count(lit(1)))
    assert(planOf(qIn).contains("GraftAggScan"),
      "a value-set-covered IN must be file-exact:\n" + planOf(qIn))
    assert(qIn.head().getLong(0) == 60L)
    // present + multi-valued: indeterminate, the scan answers
    val qEq = df.where(col("k") === 2L).agg(count(lit(1)))
    assert(!planOf(qEq).contains("GraftAggScan"))
    assert(qEq.head().getLong(0) == 30L)
    // a stale delete distrusts the set: the absent literal keeps files
    t.deleteWhere(col("id") === 4L)
    val m2 = t.currentManifest
    val sb2 = new graft.sources.GraftScanBuilder(t.root, m2)
    sb2.pushFilters(Array(EqualTo("k", 10L)))
    assert(sb2.build().toBatch.planInputPartitions().length >= 1,
      "stale per-value accounting must keep the delete-carrying file")
    t.drop()
  }

  test("AVG pushes only under a 2^53 bounds proof, in both ANSI modes") {
    // Spark's Average accumulates integral sums in DoubleType (order-
    // dependent rounding, never throws); the pushed exact-long-sum /
    // count quotient is bit-identical to the scan ONLY while every
    // accumulation order is exact in doubles, i.e. all partials within
    // ±2^53. The gate must therefore be the 2^53 bounds proof — in
    // BOTH ANSI modes, since the double accumulator is the same.
    val sch = SchemaDsl.struct("id" -> "int64", "v" -> "int64")
    def mk(name: String, vs: Seq[Long]): GraftTable = {
      val t = GraftTable.create(spark, tmpDir() + "/" + name, sch,
        Identity.Keys(Seq("id")),
        TableConfig(memSliceSize = 64, walEnabled = false))
      t.apply(vs.zipWithIndex.flatMap { case (v, i) =>
        CdcEvent.upsert(Row(i.toLong + 1L, v), Seq(i.toLong + 1L), i.toLong + 1L)
      } :+ Commit(vs.size + 1L))
      t.flush(); t.publish(); t
    }
    // 1 row of 2^53-1: cap = 2^53-1 ≤ 2^53 → AVG pushes (ANSI default)
    val tLo = mk("avg_lo", Seq((1L << 53) - 1L))
    val qLo = spark.read.format("graft").load(tLo.root).agg(avg(col("v")))
    assert(qLo.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "2^53-provable AVG must push")
    assert(qLo.head().getDouble(0) == ((1L << 53) - 1L).toDouble)
    // judge repro shape {2^53, 1, 1, 1}: ANSI SUM is provable
    // (4×2^53 ≪ Long.MaxValue) but the AVG proof fails (> 2^53) — SUM
    // must push while AVG declines and the scan answers AVG
    val tHi = mk("avg_hi", Seq(1L << 53, 1L, 1L, 1L))
    val dfHi = spark.read.format("graft").load(tHi.root)
    assert(dfHi.agg(sum(col("v"))).queryExecution.executedPlan.toString
      .contains("GraftAggScan"), "ANSI-provable SUM must still push")
    assert(dfHi.agg(sum(col("v"))).head().getLong(0) == (1L << 53) + 3L)
    val qHi = dfHi.agg(avg(col("v")))
    // NOTE: Spark rewrites a declined AVG(c) into a pushed
    // Sum(c)/Count(c) pair + division, which reconstructs the exact
    // quotient and diverges from the scan the same way — so the gate
    // must also decline the pair shape for this plan to truly fall
    // back to the scan's double accumulation
    assert(!qHi.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "AVG beyond the 2^53 proof must decline (double accumulation " +
        "is order-dependent there)")
    qHi.head() // the scan's own (double-accumulated) answer stands
    // the avg-reconstructable PAIR declines past 2^53…
    val qPair = dfHi.agg(sum(col("v")), count(col("v")))
    assert(!qPair.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "Sum(c)+Count(c) (the avg-rewrite shape) must decline past 2^53")
    // …but sum with COUNT(*) (not avg-reconstructable) still pushes
    val qStar = dfHi.agg(sum(col("v")), count(lit(1)))
    assert(qStar.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "Sum(c)+COUNT(*) is not an avg rewrite and must keep pushing")
    val rStar = qStar.head()
    assert(rStar.getLong(0) == (1L << 53) + 3L && rStar.getLong(1) == 4L)
    // non-ANSI {2^62, 1, -2^62}: the scan cancels catastrophically to
    // 0.0 while the exact quotient is 0.333… — the gate must decline
    // under non-ANSI too (sumPushable alone would push here)
    val tC = mk("avg_cancel", Seq(1L << 62, 1L, -(1L << 62)))
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val dfC = spark.read.format("graft").load(tC.root)
      assert(dfC.agg(sum(col("v"))).queryExecution.executedPlan.toString
        .contains("GraftAggScan"), "non-ANSI wrapping SUM must push")
      val qC = dfC.agg(avg(col("v")))
      assert(!qC.queryExecution.executedPlan.toString.contains("GraftAggScan"),
        "AVG must never push without the 2^53 proof, ANSI or not")
      // the un-pushed plan's answer is the contract (cancellation incl.)
      assert(qC.head().getDouble(0) == dfC.select(col("v"))
        .agg(avg(col("v"))).head().getDouble(0))
    } finally spark.conf.unset("spark.sql.ansi.enabled")
    tLo.drop(); tHi.drop(); tC.drop()
  }

  test("COUNT/SUM/AVG pushdown survives deletes via refreshed masked accounting") {
    // reference `snapshot_read.rs:52-61` keeps cardinality exact under
    // deletes (persisted minus deleted); the analogue here is per-file
    // masked-row accounting folded in by refreshDvStats — trusted only
    // while it covers EVERY delete on the file (dvAccounted == deletes)
    val sch = SchemaDsl.struct("id" -> "int64", "v" -> "int64")
    val t = GraftTable.create(spark, tmpDir() + "/t", sch,
      Identity.Keys(Seq("id")),
      TableConfig(memSliceSize = 64, walEnabled = false))
    // nulls at 5,10,15,20; values i*10 elsewhere (sum 1600, 16 non-null)
    t.apply((1L to 20L).flatMap(i => CdcEvent.upsert(
      Row(i, if (i % 5 == 0) null else i * 10L), Seq(i), i)) :+ Commit(21L))
    t.flush(); t.publish()
    // delete a null row (5) and two non-null rows (1, 2; masked sum 30)
    t.apply(Seq(Delete(Seq(5L), 100L), Delete(Seq(1L), 101L),
      Delete(Seq(2L), 102L), Commit(103L)))
    t.publish()
    // BEFORE refresh: accounting is stale (dvAccounted != deletes) —
    // every aggregate must decline and the DV-aware scan answers
    val df0 = spark.read.format("graft").load(t.root)
    val q0 = df0.agg(count(col("v")), sum(col("v")))
    assert(!q0.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "un-refreshed masked accounting must never push")
    val r0 = q0.head()
    assert(r0.getLong(0) == 14L && r0.getLong(1) == 1570L)
    assert(!df0.agg(min(col("v"))).queryExecution.executedPlan.toString
      .contains("GraftAggScan"),
      "MIN over stale physical bounds must decline (masked extreme)")
    // refresh folds the DVs into the accounting; COUNT/SUM/AVG push
    assert(t.refreshDvStats() == 1, "one delete-carrying file to refresh")
    t.publish()
    val m = t.currentManifest
    assert(m.dataFiles.forall(_.dvStatsCurrent))
    // the new accounting fields survive a manifest JSON round-trip
    val rt = graft.format.Manifest.fromJson(graft.format.Manifest.toJson(m))
    assert(rt.dataFiles.map(e => (e.dvAccounted, e.dvNullStats, e.dvSumStats))
      == m.dataFiles.map(e => (e.dvAccounted, e.dvNullStats, e.dvSumStats)))
    val df1 = spark.read.format("graft").load(t.root)
    val q1 = df1.agg(count(col("v")), sum(col("v")), avg(col("v")),
      count(lit(1)))
    assert(q1.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "refreshed accounting must push COUNT(col)/SUM/AVG under deletes")
    val r1 = q1.head()
    assert(r1.getLong(0) == 14L, s"live non-null ${r1.getLong(0)}")
    assert(r1.getLong(1) == 1570L, s"live sum ${r1.getLong(1)}")
    assert(r1.getDouble(2) == 1570.0 / 14.0)
    assert(r1.getLong(3) == 17L, "COUNT(*) = live rows")
    // MIN/MAX re-arm too: the refresh rewrote the file's bounds from
    // the SURVIVING rows in the same entry update (stale physical min
    // would be 10 — exactly the masked extreme)
    val qm = df1.agg(min(col("v")), max(col("v")))
    assert(qm.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "live bounds must push MIN/MAX under refreshed deletes")
    val rm = qm.head()
    assert(rm.getLong(0) == 30L && rm.getLong(1) == 190L)
    // a NEW delete outdates the accounting — decline returns until the
    // next refresh (for MIN/MAX too)
    t.apply(Seq(Delete(Seq(3L), 200L), Commit(201L)))
    t.publish()
    val df2 = spark.read.format("graft").load(t.root)
    val q2 = df2.agg(count(col("v")))
    assert(!q2.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "accounting must invalidate the moment deletes outgrow it")
    assert(q2.head().getLong(0) == 13L)
    assert(!df2.agg(min(col("v"))).queryExecution.executedPlan.toString
      .contains("GraftAggScan"),
      "MIN must decline again once deletes outgrow the refreshed bounds")
    // optimize() both compacts-or-refreshes and re-arms the push
    t.optimize()
    val df3 = spark.read.format("graft").load(t.root)
    val q3 = df3.agg(count(col("v")), sum(col("v")), min(col("v")))
    assert(q3.queryExecution.executedPlan.toString.contains("GraftAggScan"))
    val r3 = q3.head()
    assert(r3.getLong(0) == 13L && r3.getLong(1) == 1540L &&
      r3.getLong(2) == 40L)
    t.drop()
  }

  test("decimal SUM/MIN/MAX push exactly; AVG reconstructs via the rewrite") {
    // money columns: per-file sums are EXACT fixed-scale decimals, so
    // the pushed total is the scan's total in both ANSI modes (the
    // bounds proof rules out the order-dependent buffer overflow).
    // AVG(decimal) never pushes directly — Spark rewrites it into the
    // pushed Sum/Count pair and divides in the same exact decimal
    // arithmetic the un-pushed Average uses, so the answer is
    // bit-identical with a still-scanless plan.
    val sch = SchemaDsl.struct("id" -> "int64", "amt" -> "decimal(12,2)")
    val t = GraftTable.create(spark, tmpDir() + "/tdec", sch,
      Identity.Keys(Seq("id")),
      TableConfig(memSliceSize = 8, walEnabled = false))
    def bd(cents: Long) = new java.math.BigDecimal(
      java.math.BigInteger.valueOf(cents), 2)
    // nulls at multiples of 5; several files (memSliceSize = 8)
    t.apply((1L to 20L).flatMap(i => CdcEvent.upsert(
      Row(i, if (i % 5 == 0) null else bd(i * 125L)), Seq(i), i))
      :+ Commit(21L))
    t.flush(); t.publish()
    val df = spark.read.format("graft").load(t.root)
    val q = df.agg(sum(col("amt")), count(col("amt")),
      min(col("amt")), max(col("amt")))
    assert(q.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "decimal SUM/COUNT/MIN/MAX must answer from the manifest")
    val want = t.read(scala.None).agg(sum(col("amt")), count(col("amt")),
      min(col("amt")), max(col("amt"))).head()
    val got = q.head()
    assert(got.getDecimal(0) == want.getDecimal(0) &&
      got.getLong(1) == want.getLong(1) &&
      got.getDecimal(2) == want.getDecimal(2) &&
      got.getDecimal(3) == want.getDecimal(3),
      s"pushed $got != scan $want")
    assert(got.getDecimal(0).toPlainString == "200.00") // Σ i*1.25 over the 16 non-null ids
    // AVG: scanless plan via the Sum/Count rewrite, bit-identical value
    val qa = df.agg(avg(col("amt")))
    val planA = qa.queryExecution.executedPlan.toString
    assert(planA.contains("GraftAggScan") && !planA.contains("GraftScan("),
      s"decimal AVG must reconstruct from the pushed pair:\n$planA")
    val wantAvg = t.read(scala.None).agg(avg(col("amt"))).head().getDecimal(0)
    assert(qa.head().getDecimal(0) == wantAvg)
    // deletes: decline until refreshDvStats folds the masked decimals in
    t.apply(Seq(Delete(Seq(1L), 100L), Delete(Seq(5L), 101L),
      Commit(102L)))
    t.publish()
    val df0 = spark.read.format("graft").load(t.root)
    val q0 = df0.agg(sum(col("amt")), count(col("amt")))
    assert(!q0.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "stale masked accounting must decline decimal SUM")
    val r0 = q0.head()
    assert(t.refreshDvStats() >= 1); t.publish()
    val df1 = spark.read.format("graft").load(t.root)
    val q1 = df1.agg(sum(col("amt")), count(col("amt")), min(col("amt")))
    assert(q1.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "refreshed masked accounting must re-arm decimal SUM")
    val r1 = q1.head()
    assert(r1.getDecimal(0) == r0.getDecimal(0) &&
      r1.getLong(1) == r0.getLong(1),
      s"pushed live decimal aggregates diverge from the scan: $r1 vs $r0")
    assert(r1.getDecimal(0).toPlainString == "198.75") // minus id 1 (1.25)
    assert(r1.getDecimal(2).toPlainString == "2.50") // live min re-armed
    // a too-wide decimal (p + 10 > 38) records no sums -> SUM declines
    val t2 = GraftTable.create(spark, tmpDir() + "/tdecw",
      SchemaDsl.struct("id" -> "int64", "amt" -> "decimal(32,2)"),
      Identity.Keys(Seq("id")),
      TableConfig(memSliceSize = 64, walEnabled = false))
    t2.apply((1L to 4L).flatMap(i => CdcEvent.upsert(
      Row(i, bd(i * 100L)), Seq(i), i)) :+ Commit(5L))
    t2.flush(); t2.publish()
    val qw = spark.read.format("graft").load(t2.root).agg(sum(col("amt")))
    assert(!qw.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "un-summable wide decimal must decline to the scan")
    qw.head() // the scan answers
    // …while COUNT/MIN/MAX (bounds, not sums) still push for it
    val qwm = spark.read.format("graft").load(t2.root)
      .agg(count(col("amt")), min(col("amt")), max(col("amt")))
    assert(qwm.queryExecution.executedPlan.toString.contains("GraftAggScan"))
    assert(qwm.head().getDecimal(1).toPlainString == "1.00")
    t.drop(); t2.drop()
  }

  test("masked-accounting property: pushed aggregates equal the scan " +
      "across random delete histories") {
    // seeded random upsert/delete rounds; after every refresh the
    // whole aggregate family must push AND agree bit-for-bit with the
    // table's own scan (t.read applies DVs without DSv2 agg pushdown).
    // Values stay within ±1000 so the 2^53/ANSI proofs always hold —
    // what varies is the delete/null/file-boundary structure.
    val sch = SchemaDsl.struct("id" -> "int64", "v" -> "int64")
    val t = GraftTable.create(spark, tmpDir() + "/t", sch,
      Identity.Keys(Seq("id")),
      TableConfig(memSliceSize = 8, walEnabled = false))
    val rnd = new scala.util.Random(20260815L)
    var lsn = 1L
    def nextLsn(): Long = { lsn += 1; lsn }
    def aggsOf(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)), count(col("v")), sum(col("v")),
        avg(col("v")), min(col("v")), max(col("v")))
    (1 to 6).foreach { round =>
      val ups = (1 to 10 + rnd.nextInt(20)).map { _ =>
        val k = 1L + rnd.nextInt(40)
        val v: Any =
          if (rnd.nextInt(5) == 0) null
          else (rnd.nextInt(2001) - 1000).toLong
        (k, v)
      }
      t.apply(ups.flatMap { case (k, v) =>
        CdcEvent.upsert(Row(k, v), Seq(k), nextLsn()) } :+ Commit(nextLsn()))
      t.flush()
      val dels = (0 until rnd.nextInt(6))
        .map(_ => 1L + rnd.nextInt(40)).distinct
      if (dels.nonEmpty)
        t.apply(dels.map(k =>
          Delete(Seq(k), nextLsn(), ifExists = true): CdcEvent)
          :+ Commit(nextLsn()))
      t.publish()
      val want = aggsOf(t.read(scala.None)).head()
      // pre-refresh: whatever the plan shape, values must already match
      // (the DV-aware scan is the fallback contract)
      val pre = aggsOf(spark.read.format("graft").load(t.root)).head()
      assert(pre == want, s"round $round pre-refresh: $pre != $want")
      t.refreshDvStats(); t.publish()
      val q = aggsOf(spark.read.format("graft").load(t.root))
      assert(q.queryExecution.executedPlan.toString.contains("GraftAggScan"),
        s"round $round: refreshed aggregate family must push")
      val got = q.head()
      assert(got == want, s"round $round: pushed $got != scan $want")
    }
    t.drop()
  }

  test("string MIN/MAX push only under the exactness marker") {
    // statBounds truncates a >32-codepoint min to a prefix (below the
    // true min) and LIFTS a >32-cp max to a synthetic upper bound not
    // present in the table. Fine for pruning; WRONG as an aggregate
    // answer — and a short stored bound cannot prove the original was
    // short (a lifted max can land at any length). The writer therefore
    // marks a file's string bounds `exactBounds` when NEITHER end was
    // truncated/lifted; only then may they answer MIN/MAX.
    val sch = SchemaDsl.struct("id" -> "int64", "name" -> "string",
      "v" -> "int64")
    val t = GraftTable.create(spark, tmpDir() + "/t", sch,
      Identity.Keys(Seq("id")),
      TableConfig(memSliceSize = 64, walEnabled = false))
    val longA = "a" * 40 + "zz" // > 32 cp: stored min is a 32-cp prefix
    val longZ = "z" * 40 + "aa" // > 32 cp: stored max is a lifted prefix
    t.apply(Seq(
      CdcEvent.upsert(Row(1L, longA, 10L), Seq(1L), 1L),
      CdcEvent.upsert(Row(2L, longZ, 20L), Seq(2L), 2L)).flatten
      :+ Commit(3L))
    t.flush(); t.publish()
    assert(t.currentManifest.dataFiles.forall(
      !_.exactBounds.contains("name")),
      "truncated/lifted string bounds must NOT carry the exact marker")
    val df = spark.read.format("graft").load(t.root)
    val q = df.agg(min(col("name")), max(col("name")))
    assert(!q.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "unmarked string MIN/MAX must come from the scan, not truncated bounds")
    val r = q.head()
    assert(r.getString(0) == longA && r.getString(1) == longZ,
      s"scan answers must be the true strings: $r")
    // numeric min/max on the same table still push
    val qn = df.agg(min(col("v")), max(col("v")))
    assert(qn.queryExecution.executedPlan.toString.contains("GraftAggScan"))
    val rn = qn.head()
    assert(rn.getLong(0) == 10L && rn.getLong(1) == 20L)
    // SHORT strings (≤32 cp both ends): the marker re-arms the push and
    // the answer is the exact value — in every file
    val t2 = GraftTable.create(spark, tmpDir() + "/t2", sch,
      Identity.Keys(Seq("id")),
      TableConfig(memSliceSize = 4, walEnabled = false))
    t2.apply((1L to 8L).flatMap(i => CdcEvent.upsert(
      Row(i, s"name$i", i * 10L), Seq(i), i)) :+ Commit(9L))
    t2.flush(); t2.publish()
    assert(t2.currentManifest.dataFiles.forall(_.exactBounds.contains("name")))
    val df2 = spark.read.format("graft").load(t2.root)
    val q2 = df2.agg(min(col("name")), max(col("name")))
    assert(q2.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "exact-marked short string bounds must answer MIN/MAX")
    val r2 = q2.head()
    assert(r2.getString(0) == "name1" && r2.getString(1) == "name8")
    // deletes: the marker survives refreshDvStats (live bounds are
    // re-derived from surviving rows, still exact when short)
    t2.apply(Seq(Delete(Seq(1L), 100L), Commit(101L)))
    t2.publish()
    assert(t2.refreshDvStats() >= 1)
    t2.publish()
    val df4 = spark.read.format("graft").load(t2.root)
    val q4 = df4.agg(min(col("name")), max(col("name")))
    assert(q4.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "refreshed live string bounds keep the exact marker")
    assert(q4.head().getString(0) == "name2")
    // ONE unmarked file poisons the table-wide answer: simulate a
    // pre-marker manifest by stripping the marker from one entry (side
    // commit LAST — the handle's own next publish would CAS-collide)
    val m = t2.currentManifest
    val stripped = m.copy(version = m.version + 1, dataFiles =
      m.dataFiles.head.copy(exactBounds = Seq.empty) +: m.dataFiles.tail)
    graft.format.ManifestLog.commit(t2.root, stripped)
    val df3 = spark.read.format("graft").load(t2.root)
    assert(!df3.agg(min(col("name"))).queryExecution.executedPlan.toString
      .contains("GraftAggScan"),
      "a single pre-marker file must decline the string push")
    assert(df3.agg(min(col("name"))).head().getString(0) == "name2")
    t.drop(); t2.drop()
  }

  test("an accounting-less column declines aggregate pushdown at planning " +
      "instead of throwing") {
    // a column added after files were flushed has NO null counts or
    // sums on those files; Spark still offers the rewritten
    // Sum(c)+Count(c) pair for avg — the gate must treat the missing
    // accounting as unprovable and fall back, never crash the planner
    val sch = SchemaDsl.struct("id" -> "int64", "w" -> "int64")
    val t = GraftTable.create(spark, tmpDir() + "/t", sch,
      Identity.Keys(Seq("id")),
      TableConfig(memSliceSize = 64, walEnabled = false))
    t.apply((1L to 5L).flatMap(i =>
      CdcEvent.upsert(Row(i, i * 2), Seq(i), i)) :+ Commit(6L))
    t.flush(); t.publish()
    t.alterAddColumn("v", "int64")
    val df = spark.read.format("graft").load(t.root)
    // the avg-rewrite pair shape over the accounting-less column: must
    // plan (decline), not throw, and the scan answers
    val q = df.agg(sum(col("v")), count(col("v")), avg(col("v")))
    assert(!q.queryExecution.executedPlan.toString.contains("GraftAggScan"))
    val r = q.head()
    assert(r.isNullAt(0) && r.getLong(1) == 0L && r.isNullAt(2))
    // the fully-accounted column still pushes alongside
    val q2 = df.agg(sum(col("w")), count(col("w")))
    assert(q2.queryExecution.executedPlan.toString.contains("GraftAggScan"))
    assert(q2.head().getLong(0) == 30L)
    t.drop()
  }

  test("null accounting cannot go stale across column drop/re-add or rename") {
    // a re-added column maps to a FRESH physical name old files read as
    // all-NULL; stale per-file null counts (0 for the predecessor)
    // would make IS NULL prune those files and COUNT(col) claim their
    // rows as non-null — the alter verbs must strip/re-key stats
    val dir = tmpDir() + "/t"
    val sch = SchemaDsl.struct("id" -> "int64", "v" -> "string",
      "w" -> "int64")
    val t = GraftTable.create(spark, dir, sch,
      Identity.Keys(Seq("id")), TableConfig(memSliceSize = 4, walEnabled = false))
    t.apply((1L to 10L).flatMap(i =>
      CdcEvent.upsert(Row(i, s"v$i", i * 100), Seq(i), i)) :+ Commit(11L))
    t.flush(); t.publish()
    assert(t.currentManifest.dataFiles.forall(_.nullsOf("v").contains(0L)))
    t.alterDropColumns(Seq("v"))
    t.alterAddColumn("v", "string")
    val df = spark.read.format("graft").load(t.root)
    // every old row now reads v as NULL: IS NULL must return them all
    assert(df.where(col("v").isNull).count() == 10L)
    // and COUNT(v) must not push from the stripped (unknown) accounting
    val q = df.agg(count(col("v")))
    assert(!q.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "count(col) must not trust a predecessor column's null counts")
    assert(q.head().getLong(0) == 0L)
    // rename re-keys stats: pruning keeps working under the new name...
    t.alterRenameColumn("w", "w2")
    assert(t.currentManifest.dataFiles.forall(e =>
      e.nullsOf("w2").contains(0L) && e.nullsOf("w").isEmpty))
    def partsFor(fs: Array[org.apache.spark.sql.sources.Filter]): Int = {
      val sb = new GraftScanBuilder(t.root, t.currentManifest)
      sb.pushFilters(fs)
      sb.build().toBatch.planInputPartitions().length
    }
    assert(partsFor(Array(GreaterThan("w2", 100000L))) == 0,
      "renamed column's bounds must keep pruning")
    // ...and a fresh column under the old name inherits nothing
    t.alterAddColumn("w", "int64")
    val df3 = spark.read.format("graft").load(t.root)
    assert(df3.where(col("w").isNull).count() == 10L)
    t.drop()
  }
}
