package graft

import graft.format.Manifest
import graft.model._
import graft.sources.{GraftCatalogPlugin, GraftFunctions}
import graft.table._
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/**
 * Storage-partitioned joins: after `optimize(bucketBy = n)` both join
 * sides share the pmod(xxhash64(keys), n) layout, the DSv2 scans
 * report KeyGroupedPartitioning, and Spark plans the join with ZERO
 * exchanges — the DSv2 co-located-join machinery Iceberg uses, over
 * the graft bucket layout. At 100 TB this is the difference between
 * shuffling both fact tables and shuffling nothing.
 */
class SpjSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-spj-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshCatalog(): (String, String) = {
    val wh = Files.createTempDirectory("graft-spj").toString
    val name = "gs" + math.abs(wh.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftCatalogPlugin].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    (name, wh)
  }

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed compaction writes single-bucket files and records the spec") {
    val wh = Files.createTempDirectory("graft-spj-t").toString
    val cat = GraftCatalog(spark, wh)
    val t = cat.createTable("bt",
      SchemaDsl.struct("id" -> "int64", "v" -> "int64"),
      Identity.Keys(Seq("id")))
    t.upsertAll((1L to 300L).map(i => Row(i, i * 10)), startLsn = 1)
    t.flush(); t.publish()
    t.optimize(bucketBy = Some(4))
    val m = t.currentManifest
    assert(m.bucketN == 4L, "bucket spec not recorded")
    assert(m.dataFiles.nonEmpty && m.dataFiles.forall(_.bucket >= 0L),
      s"unbucketed files after bucketBy: ${m.dataFiles.map(_.bucket)}")
    // per-file validation against independent arithmetic: every row's
    // pmod(xxhash64(id), 4) equals its file's manifest bucket
    val physId = SchemaDsl.physicalName(
      t.schema.fields(t.schema.fieldIndex("id")))
    m.dataFiles.foreach { e =>
      val buckets = spark.read.parquet(s"$wh/bt/data/${e.path}")
        .select(pmod(xxhash64(col(physId)), lit(4L)).as("b"))
        .distinct().collect().map(_.getLong(0)).toSeq
      assert(buckets == Seq(e.bucket), s"file ${e.path} mixes buckets")
    }
    // manifest round-trip keeps the layout; total rows preserved
    val rt = Manifest.fromJson(Manifest.toJson(m))
    assert(rt.bucketN == 4L && rt.dataFiles.map(_.bucket) ==
      m.dataFiles.map(_.bucket))
    assert(m.dataFiles.map(_.rows).sum == 300L)
    // a later driver flush now routes through the SAME bucket layout
    // (bucket-aware flush): the new file carries a valid bucket id and
    // the table-level spec survives ongoing ingest
    t.upsertAll(Seq(Row(1000L, 1L)), startLsn = 400)
    t.flush(); t.publish()
    val m2 = t.currentManifest
    assert(m2.bucketN == 4L && m2.dataFiles.forall(_.bucket >= 0L),
      s"flush degraded the layout: ${m2.dataFiles.map(_.bucket)}")
    // the flushed file's recorded bucket matches the storage arithmetic
    val newFiles = m2.dataFiles.map(_.path).toSet -- m.dataFiles.map(_.path)
    newFiles.foreach { p =>
      val e = m2.dataFiles.find(_.path == p).get
      val buckets = spark.read.parquet(s"$wh/bt/data/$p")
        .select(pmod(xxhash64(col(physId)), lit(4L)).as("b"))
        .distinct().collect().map(_.getLong(0)).toSeq
      assert(buckets == Seq(e.bucket), s"flushed file $p wrong bucket")
    }
    // a SCATTERED micro-flush (several buckets, few rows each) must
    // NOT fan out into per-bucket tiny files: below the per-bucket
    // floor it writes plain unbucketed chunks and escalated compaction
    // re-buckets the tail (same policy as the distributed write path)
    t.upsertAll((2000L to 2007L).map(i => Row(i, 1L)), startLsn = 500)
    t.flush(); t.publish()
    val m3 = t.currentManifest
    val micro = m3.dataFiles.map(_.path).toSet -- m2.dataFiles.map(_.path)
    assert(micro.size == 1, s"micro-flush exploded into ${micro.size} files")
    assert(m3.dataFiles.filter(e => micro(e.path)).forall(_.bucket == -1L),
      "a below-floor scattered flush must write unbucketed")
    assert(m3.bucketN == 4L, "the table-level bucket spec must survive")
  }

  test("legacy manifests never resurrect bucket ids") {
    // a manifest with bucketN == 0 but nonzero bucket fields (what an
    // old JSON deserializes to, since missing primitives read as 0)
    // must normalize every bucket to -1
    val m = Manifest.empty(
      org.apache.spark.sql.types.StructType(Seq()), Seq("id"))
      .copy(dataFiles = Seq(graft.format.DataFileEntry(
        "f1.parquet", 10L, 100L, 1L, bucket = 0L)))
    val rt = Manifest.fromJson(Manifest.toJson(m))
    assert(rt.bucketN == 0L && rt.dataFiles.head.bucket == -1L)
    // pre-null-accounting JSON (no nullStats field at all) must read as
    // UNKNOWN — empty map, nullsOf None — never as zero nulls
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val tree = om.readTree(Manifest.toJson(m))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    tree.get("dataFiles").forEach { n =>
      n.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        .remove("nullStats"); ()
    }
    val legacy = Manifest.fromJson(tree.toString)
    assert(legacy.dataFiles.head.nullStats == Map.empty)
    assert(legacy.dataFiles.head.nullsOf("anything").isEmpty)
  }

  test("catalog bucket function matches the storage layout arithmetic") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.types._
    val bound = GraftFunctions.bucket().bind(StructType(Seq(
      StructField("n", IntegerType), StructField("id", LongType))))
    val viaSpark = spark.range(1, 100)
      .select(col("id"), pmod(xxhash64(col("id")), lit(7L)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    viaSpark.foreach { case (id, want) =>
      val got = bound.asInstanceOf[
        org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
        .produceResult(new GenericInternalRow(Array[Any](7, id)))
      assert(got.intValue() == want.toInt, s"id=$id")
    }
  }

  test("co-bucketed tables join and aggregate with zero exchanges") {
    val (cname, wh) = freshCatalog()
    val cat = GraftCatalog(spark, wh)
    val sa = SchemaDsl.struct("id" -> "int64", "a" -> "int64")
    val sb = SchemaDsl.struct("id" -> "int64", "b" -> "int64")
    val ta = cat.createTable("ta", sa, Identity.Keys(Seq("id")))
    val tb = cat.createTable("tb", sb, Identity.Keys(Seq("id")))
    ta.upsertAll((1L to 400L).map(i => Row(i, i * 10)), startLsn = 1)
    ta.flush(); ta.publish()
    tb.upsertAll((1L to 400L).filter(_ % 2 == 0).map(i => Row(i, i * 7)),
      startLsn = 1)
    tb.flush(); tb.publish()
    ta.optimize(bucketBy = Some(4))
    tb.optimize(bucketBy = Some(4))

    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      // at test SF the build side broadcasts, which is also a fine plan
      // — disable it so the assertion exercises the shuffle-join path
      // SPJ exists to replace (at 100 TB neither side broadcasts)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(
        s"""SELECT x.id, x.a, y.b
           |FROM $cname.graft.ta x JOIN $cname.graft.tb y ON x.id = y.id
           |""".stripMargin)
      val rows = df.collect()
      assert(rows.length == 200)
      rows.foreach { r =>
        assert(r.getLong(1) == r.getLong(0) * 10 &&
          r.getLong(2) == r.getLong(0) * 7)
      }
      val plan = df.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"storage-partitioned join still shuffled:\n$plan")

      // aggregation on the join key rides the same partitioning:
      // join + groupBy(id-side key) with zero exchanges end to end
      val agg = spark.sql(
        s"""SELECT x.id, count(*) AS n, sum(y.b) AS s
           |FROM $cname.graft.ta x JOIN $cname.graft.tb y ON x.id = y.id
           |GROUP BY x.id""".stripMargin)
      val ar = agg.collect()
      assert(ar.length == 200 && ar.forall(_.getLong(1) == 1L))
      val aplan = agg.queryExecution.executedPlan.toString()
      assert(!aplan.contains("Exchange"),
        s"key-grouped aggregation still shuffled:\n$aplan")

      // without the conf the same query falls back to shuffles but
      // stays correct (the layout is an optimization, not a contract)
      withConf("spark.sql.sources.v2.bucketing.enabled" -> "false") {
        val off = spark.sql(
          s"""SELECT count(*) AS n
             |FROM $cname.graft.ta x JOIN $cname.graft.tb y ON x.id = y.id
             |""".stripMargin)
        assert(off.head().getLong(0) == 200L)
      }
    }
  }

  test("SPJ survives one-sided bucket pruning: partition values pad, zero exchanges") {
    // a selective IN-list on side A's key prunes its scan to a SUBSET
    // of buckets (through the index point-lookup path), while side B
    // plans all of them — the partition-value mismatch Spark resolves
    // by padding (pushPartValues). The join must stay shuffle-free AND
    // exact. This is the realistic 100-TB shape: selective queries
    // over co-bucketed tables prune asymmetrically.
    val (cname, wh) = freshCatalog()
    val cat = GraftCatalog(spark, wh)
    val sa = SchemaDsl.struct("id" -> "int64", "a" -> "int64")
    val sb = SchemaDsl.struct("id" -> "int64", "b" -> "int64")
    val ta = cat.createTable("pa", sa, Identity.Keys(Seq("id")))
    val tb = cat.createTable("pb", sb, Identity.Keys(Seq("id")))
    ta.upsertAll((1L to 200L).map(i => Row(i, i * 2)), startLsn = 1)
    ta.flush(); ta.publish()
    tb.upsertAll((1L to 200L).map(i => Row(i, i * 5)), startLsn = 1)
    tb.flush(); tb.publish()
    ta.optimize(bucketBy = Some(8))
    tb.optimize(bucketBy = Some(8))
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(
        s"""SELECT x.id, x.a, y.b
           |FROM $cname.graft.pa x JOIN $cname.graft.pb y ON x.id = y.id
           |WHERE x.id IN (7, 8, 9)""".stripMargin)
      val rows = df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(rows.toSeq == Seq((7L, 14L, 35L), (8L, 16L, 40L), (9L, 18L, 45L)))
      val plan = df.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange hashpartitioning"),
        s"pruned SPJ fell back to a shuffle:\n$plan")
    }
  }

  test("skewed SPJ: partially-clustered distribution replicates the small side") {
    // hot-bucket skew INSIDE a storage-partitioned join: one bucket of
    // the fact side holds most rows. partiallyClustered lets Spark
    // split the big side's hot bucket across tasks and replicate the
    // matching small-side partitions instead of either shuffling or
    // serializing the hot bucket through one task. Values must stay
    // exact with the conf on and off.
    val (cname, wh) = freshCatalog()
    val cat = GraftCatalog(spark, wh)
    val ta = cat.createTable("sa",
      SchemaDsl.struct("id" -> "int64", "a" -> "int64"),
      Identity.Keys(Seq("id")))
    val tb = cat.createTable("sb",
      SchemaDsl.struct("id" -> "int64", "b" -> "int64"),
      Identity.Keys(Seq("id")))
    ta.upsertAll((1L to 300L).map(i => Row(i, i)), startLsn = 1)
    ta.flush(); ta.publish()
    tb.upsertAll((1L to 300L).map(i => Row(i, i * 3)), startLsn = 1)
    tb.flush(); tb.publish()
    ta.optimize(bucketBy = Some(4))
    tb.optimize(bucketBy = Some(4))
    def run(): Seq[(Long, Long)] = spark.sql(
      s"""SELECT x.id, x.a + y.b AS s
         |FROM $cname.graft.sa x JOIN $cname.graft.sb y ON x.id = y.id
         |""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val want = (1L to 300L).map(i => (i, i * 4)).toSeq
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      withConf("spark.sql.sources.v2.bucketing.partiallyClustered" +
          ".distribution.enabled" -> "true") {
        assert(run() == want, "partially-clustered SPJ changed values")
      }
      assert(run() == want)
    }
  }

  test("CALL system.optimize(bucket_by) buckets through the SQL surface") {
    val (cname, wh) = freshCatalog()
    val cat = GraftCatalog(spark, wh)
    val t = cat.createTable("ct",
      SchemaDsl.struct("id" -> "int64", "v" -> "int64"),
      Identity.Keys(Seq("id")))
    t.upsertAll((1L to 50L).map(i => Row(i, i)), startLsn = 1)
    t.flush(); t.publish()
    val out = spark.sql(s"CALL $cname.system.optimize(db => 'graft', " +
      "tbl => 'ct', bucket_by => 4)").collect()
    assert(out.length == 1)
    val entry = new MetadataStore(wh).allEntries().find(_.table == "ct").get
    val m = GraftTable.open(spark, s"$wh/ct", entry.identity, entry.config)
      .currentManifest
    assert(m.bucketN == 4L && m.dataFiles.forall(_.bucket >= 0L))
  }

  test("deletes and point mutations keep the bucketed layout usable") {
    val (cname, wh) = freshCatalog()
    val cat = GraftCatalog(spark, wh)
    val s = SchemaDsl.struct("id" -> "int64", "v" -> "int64")
    val t = cat.createTable("md", s, Identity.Keys(Seq("id")))
    t.upsertAll((1L to 100L).map(i => Row(i, i)), startLsn = 1)
    t.flush(); t.publish()
    t.optimize(bucketBy = Some(4))
    // DV-masking rows does not move them between files: the layout
    // stays valid and the scan still reports it
    t.deleteWhere(col("id").isin(10L, 20L))
    t.flush(); t.publish()
    val m = t.currentManifest
    assert(m.bucketN == 4L && m.dataFiles.forall(_.bucket >= 0L))
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true") {
      val df = spark.sql(s"SELECT id, count(*) AS n FROM $cname.graft.md " +
        "GROUP BY id")
      assert(df.collect().length == 98)
      assert(!df.queryExecution.executedPlan.toString().contains("Exchange"))
    }
  }

  test("SPJ survives continuous ingest: flushes, batches and maintenance keep the layout") {
    // the round-11 gap: after optimize(bucketBy), the NEXT flushed file
    // was unbucketed and the scan degraded to UnknownPartitioning until
    // a full rewrite. Now every ingest path routes onto the layout:
    // (a) driver flush, (b) distributed applyBatch (index non-empty →
    // slow fold), (c) maintenance compaction (escalated re-bucket).
    val (cname, wh) = freshCatalog()
    val cat = GraftCatalog(spark, wh)
    val ta = cat.createTable("ia",
      SchemaDsl.struct("id" -> "int64", "a" -> "int64"),
      Identity.Keys(Seq("id")))
    val tb = cat.createTable("ib",
      SchemaDsl.struct("id" -> "int64", "b" -> "int64"),
      Identity.Keys(Seq("id")))
    ta.upsertAll((1L to 200L).map(i => Row(i, i)), startLsn = 1)
    ta.flush(); ta.publish()
    tb.upsertAll((1L to 200L).map(i => Row(i, i * 3)), startLsn = 1)
    tb.flush(); tb.publish()
    ta.optimize(bucketBy = Some(4))
    tb.optimize(bucketBy = Some(4))
    // (a) driver-path ingest after the rewrite (new + overwritten keys)
    ta.upsertAll((150L to 260L).map(i => Row(i, i)), startLsn = 500)
    ta.flush(); ta.publish()
    // (b) distributed batch ingest through CdcPipeline (slow fold path)
    import spark.implicits._
    val batch = (150L to 260L).map(i => ("u", 700L + i, i, i * 3))
      .toDF("_op", "_lsn", "id", "b")
    graft.streaming.CdcPipeline.applyBatch(tb, batch)
    // (c) maintenance compaction escalates to a bucket-routed rewrite
    ta.optimize()
    val (ma, mb) = (ta.currentManifest, tb.currentManifest)
    assert(ma.bucketN == 4L && ma.dataFiles.forall(_.bucket >= 0L),
      s"ta layout degraded: ${ma.dataFiles.map(_.bucket)}")
    assert(mb.bucketN == 4L && mb.dataFiles.forall(_.bucket >= 0L),
      s"tb layout degraded: ${mb.dataFiles.map(_.bucket)}")
    // every live file is genuinely single-bucket by independent arithmetic
    Seq(("ia", ma), ("ib", mb)).foreach { case (tn, m) =>
      m.dataFiles.foreach { e =>
        val buckets = spark.read.parquet(s"$wh/$tn/data/${e.path}")
          .select(pmod(xxhash64(col("id")), lit(4L)).as("bk"))
          .distinct().collect().map(_.getLong(0)).toSeq
        assert(buckets == Seq(e.bucket), s"$tn/${e.path} mixes buckets")
      }
    }
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(
        s"""SELECT x.id, x.a, y.b
           |FROM $cname.graft.ia x JOIN $cname.graft.ib y ON x.id = y.id
           |""".stripMargin)
      val rows = df.collect()
      assert(rows.length == 260)
      rows.foreach(r => assert(r.getLong(2) == r.getLong(0) * 3 &&
        r.getLong(1) == r.getLong(0)))
      val plan = df.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"SPJ died under continuous ingest:\n$plan")
    }
  }

  test("bucket routing splits big batches into rowsPerFile-sized single-bucket files") {
    // SPJ needs each FILE single-bucket, never one file per bucket: a
    // batch bigger than n*rowsPerFile must split WITHIN buckets so file
    // sizing survives on bucketed tables (a 10M-row batch on a 4-bucket
    // table must not write 2.5M-row files). The split index is a second
    // independent key hash, so it is deterministic under replay.
    val wh = Files.createTempDirectory("graft-spj-split").toString
    val cat = GraftCatalog(spark, wh)
    val t = cat.createTable("spl",
      SchemaDsl.struct("id" -> "int64", "v" -> "int64"),
      Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false, rowsPerFile = 100))
    t.upsertAll((1L to 200L).map(i => Row(i, i)), startLsn = 1)
    t.flush(); t.publish()
    t.optimize(bucketBy = Some(2))
    val before = t.currentManifest.dataFiles.map(_.path).toSet
    // distributed batch of 600 fresh keys: splits = ceil(600/2/100) = 3
    import spark.implicits._
    val batch = (201L to 800L).map(i => ("u", 1000L + i, i, i))
      .toDF("_op", "_lsn", "id", "v")
    graft.streaming.CdcPipeline.applyBatch(t, batch)
    val m = t.currentManifest
    assert(m.bucketN == 2L && m.dataFiles.forall(_.bucket >= 0L))
    val fresh = m.dataFiles.filterNot(e => before(e.path))
    assert(fresh.nonEmpty)
    // multiple files per bucket, none oversized, every one single-bucket
    (0L to 1L).foreach { b =>
      val files = fresh.filter(_.bucket == b)
      assert(files.size >= 2, s"bucket $b not split: ${files.size} file(s)")
    }
    fresh.foreach { e =>
      assert(e.rows <= 250, s"${e.path} oversized at ${e.rows} rows")
      val bs = spark.read.parquet(s"$wh/spl/data/${e.path}")
        .select(pmod(xxhash64(col("id")), lit(2L)).as("b"))
        .distinct().collect().map(_.getLong(0)).toSeq
      assert(bs == Seq(e.bucket), s"${e.path} mixes buckets")
    }
    assert(t.read().count() == 800)
    t.drop()
  }

  test("micro-batches below the per-bucket floor stay unbucketed until compaction re-buckets") {
    // a 10-row batch on a 4-bucket layout (floor = 4*8 = 32 rows) must
    // NOT fan out into per-bucket files: it writes one unbucketed file
    // (SPJ gate degrades per-scan, correctness unaffected) and the next
    // maintenance compaction escalates it back onto the layout
    val wh = Files.createTempDirectory("graft-spj-floor").toString
    val cat = GraftCatalog(spark, wh)
    val t = cat.createTable("fl",
      SchemaDsl.struct("id" -> "int64", "v" -> "int64"),
      Identity.Keys(Seq("id")), TableConfig(walEnabled = false))
    t.upsertAll((1L to 200L).map(i => Row(i, i)), startLsn = 1)
    t.flush(); t.publish()
    t.optimize(bucketBy = Some(4))
    val before = t.currentManifest.dataFiles.map(_.path).toSet
    import spark.implicits._
    val tiny = (201L to 210L).map(i => ("u", 500L + i, i, i))
      .toDF("_op", "_lsn", "id", "v")
    graft.streaming.CdcPipeline.applyBatch(t, tiny)
    val m1 = t.currentManifest
    val fresh = m1.dataFiles.filterNot(e => before(e.path))
    assert(fresh.size == 1 && fresh.head.bucket == -1L,
      s"below-floor batch must write ONE unbucketed file: " +
        s"${fresh.map(e => (e.path, e.bucket, e.rows))}")
    assert(m1.bucketN == 4L) // the spec survives; only the gate degrades
    assert(t.read().count() == 210)
    // maintenance re-buckets the small-file tail (escalated rewrite)
    t.optimize()
    val m2 = t.currentManifest
    assert(m2.bucketN == 4L && m2.dataFiles.forall(_.bucket >= 0L),
      s"compaction must restore the layout: ${m2.dataFiles.map(_.bucket)}")
    assert(t.read().count() == 210)
    t.drop()
  }

  test("driver-side bucket evaluator matches the DataFrame hash on every key type") {
    // the flush path stamps buckets via GraftTable.rowBucketEval (a
    // Catalyst XxHash64 evaluated on the driver); a drift from the
    // DataFrame-side pmod(xxhash64(...), n) would silently mis-bucket
    // driver-flushed files. Pin parity over long, int, string,
    // timestamp, and composite keys, including nulls in non-key cols.
    val wh = Files.createTempDirectory("graft-spj-be").toString
    val cat = GraftCatalog(spark, wh)
    import scala.jdk.CollectionConverters._
    val cases = Seq(
      ("klong", SchemaDsl.struct("id" -> "int64", "v" -> "int64"),
        (1L to 50L).map(i => Row(i, i)), Seq("id")),
      ("kint", SchemaDsl.struct("id" -> "int32", "v" -> "int64"),
        (1 to 50).map(i => Row(i, i.toLong)), Seq("id")),
      ("kstr", SchemaDsl.struct("id" -> "string", "v" -> "int64"),
        (1 to 50).map(i => Row(s"user-$i-😀", i.toLong)), Seq("id")),
      ("kts", SchemaDsl.struct("id" -> "timestamp", "v" -> "int64"),
        (1 to 50).map(i => Row(
          java.sql.Timestamp.valueOf(f"2025-01-01 00:00:${i % 60}%02d.${i}%03d"),
          i.toLong)), Seq("id")),
      ("kcomp", SchemaDsl.struct("a" -> "int64", "b" -> "string",
          "v" -> "int64"),
        (1 to 50).map(i => Row(i.toLong % 7, s"g$i", i.toLong)), Seq("a", "b")))
    cases.foreach { case (name, schema, rows, keys) =>
      val t = cat.createTable(name, schema, Identity.Keys(keys))
      val n = 7L
      val be = t.rowBucketEval(n)
      val driverSide = rows.map(be)
      val df = spark.createDataFrame(rows.asJava, t.schema)
      val sparkSide = df.select(pmod(xxhash64(
          keys.map(col): _*), lit(n)).as("b")).collect().map(_.getLong(0))
      assert(driverSide == sparkSide.toSeq,
        s"$name: driver buckets drifted from the DataFrame hash")
      t.drop()
    }
  }
}
