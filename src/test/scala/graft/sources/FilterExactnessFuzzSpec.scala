package graft.sources

import graft.model.{CdcEvent, Commit, Identity, SchemaDsl}
import graft.table.{GraftTable, TableConfig}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * Equivalence fuzz for the FILE-EXACT filter path (r15): when every
 * pushed filter decides all-or-none per file, the scan reports NO
 * residual and Spark never re-evaluates the predicate — so a wrong
 * [[GraftScan.decide]] would return wrong ROWS silently, the worst
 * failure class. This spec hammers the seam with seeded random
 * predicates over a table with nulls, deletes, and multi-file layout,
 * comparing the DSv2 read (exactness path live) against the library
 * read with the same predicate applied by Spark's normal Filter (the
 * plan Catalyst builds over `table.read()` has no GraftScanBuilder in
 * it, so the comparison oracle cannot share the bug).
 */
class FilterExactnessFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-filter-fuzz")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("random predicates: DSv2 read equals library read under the exactness path") {
    val dir = java.nio.file.Files
      .createTempDirectory("filter-fuzz").toString + "/t"
    val t = GraftTable.create(spark, dir,
      SchemaDsl.struct("id" -> "int64", "v" -> "int64", "s" -> "string"),
      Identity.Keys(Seq("id")),
      TableConfig(memSliceSize = 16, walEnabled = false))
    // three batches -> file boundaries at 100/101 and 200/201; v null
    // on id % 7 == 0; string column to exercise the always-decline arm
    def row(i: Long) = Row(i,
      if (i % 7 == 0) null else java.lang.Long.valueOf(i * 3),
      if (i % 11 == 0) null else s"s$i")
    Seq((1L, 100L), (101L, 200L), (201L, 300L)).foreach { case (lo, hi) =>
      t.apply((lo to hi).flatMap(i =>
        CdcEvent.upsert(row(i), Seq(i), i)) :+ Commit(hi + 1))
      t.flush(); t.publish()
    }
    // deletes: one mid-file, one on a null-v row (stale masked
    // accounting from here on — the exactness path must stay correct
    // WITHOUT relying on refreshed stats)
    t.apply(Seq(graft.model.Delete(Seq(150L), 400L),
      graft.model.Delete(Seq(7L), 401L), Commit(402L)))
    t.flush(); t.publish()

    val dsv2 = spark.read.format("graft").load(dir)
    val rnd = new scala.util.Random(20260816L)
    // candidate boundaries: mix of file-aligned (exactness fires) and
    // arbitrary (indeterminate -> residual path)
    val bounds = Seq(0L, 1L, 100L, 101L, 150L, 200L, 201L, 300L, 301L) ++
      Seq.fill(8)(rnd.nextLong(320L))
    val cols = Seq("id", "v")
    def somePred(): org.apache.spark.sql.Column = {
      val c = col(cols(rnd.nextInt(cols.length)))
      val b = bounds(rnd.nextInt(bounds.length))
      rnd.nextInt(8) match {
        case 0 => c >= b
        case 1 => c > b
        case 2 => c < b
        case 3 => c <= b
        case 4 => c === b
        case 5 => c.isNotNull
        case 6 => c.isNull
        case 7 => // disjunctive range (the Or pruning arm)
          val b2 = bounds(rnd.nextInt(bounds.length))
          c < math.min(b, b2) || c > math.max(b, b2)
      }
    }
    (1 to 60).foreach { i =>
      val pred = rnd.nextInt(3) match {
        case 0 => somePred()
        case 1 => somePred() && somePred()
        case 2 => somePred() || somePred()
      }
      val got = dsv2.where(pred).orderBy("id").collect().toSeq
      val want = t.read(scala.None).where(pred).orderBy("id").collect().toSeq
      assert(got == want,
        s"iteration $i diverged for predicate $pred: " +
          s"dsv2=${got.take(5)}... lib=${want.take(5)}...")
      // counts behind the predicate must agree too (the aggregate may
      // ride the manifest on decidable predicates)
      val gotN = dsv2.where(pred).agg(count(lit(1))).head().getLong(0)
      assert(gotN == want.size.toLong,
        s"iteration $i count diverged for $pred: $gotN vs ${want.size}")
    }
    t.drop()
  }
}
