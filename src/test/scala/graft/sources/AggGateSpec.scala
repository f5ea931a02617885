package graft.sources

import graft.format.{DataFileEntry, Manifest}
import graft.model.SchemaDsl
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, Sum}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Planner-gate unit tests over SYNTHETIC manifests: the interesting
 * decline regions (10^10+ rows) are unreachable by writing real files
 * in a test, but the gate is pure manifest arithmetic — so fabricate
 * the accounting and probe `GraftAggScan.supported` directly. Mirrors
 * the reference's Exact/Inexact statistics discipline
 * (`table_provider.rs:174-179`).
 */
class AggGateSpec extends AnyFunSuite {

  private val schema = SchemaDsl.struct("id" -> "int64", "amt" -> "decimal(12,2)")

  private def file(rows: Long, mn: String, mx: String,
      nulls: Long = 0L, sum: String = "0") = DataFileEntry(
    path = s"data-$rows.parquet", rows = rows, bytes = 1L, maxLsn = 1L,
    stats = Map("amt" -> Seq(mn, mx), "id" -> Seq("1", rows.toString)),
    nullStats = Map("amt" -> nulls.toString, "id" -> "0"),
    sumStats = Map("amt" -> sum, "id" -> "1"))

  private def manifest(files: DataFileEntry*): Manifest =
    Manifest(1L, 1L, 1L, schema.json, Seq("id"), files.toSeq,
      Seq.empty, Seq.empty)

  private def sumAgg = new Aggregation(
    Array(new Sum(Expressions.column("amt"), false)), Array.empty)

  test("decimal SUM pushes only under the buffer-overflow bounds proof") {
    // decimal(12,2): |v| < 10^10; Spark's SUM buffer is decimal(22,2),
    // max ~10^20. 10^9 rows × 10^10 = 10^19 -> provable, pushes.
    val ok = manifest(file(1_000_000_000L, "-9999999999.99", "9999999999.99"))
    assert(GraftAggScan.supported(ok, sumAgg),
      "provable decimal SUM must push")
    // 2×10^12 rows × 10^10 = 2×10^22 > 10^20: an intermediate partial
    // can outgrow the buffer in SOME accumulation order -> decline.
    val over = manifest(
      file(2_000_000_000_000L, "-9999999999.99", "9999999999.99"))
    assert(!GraftAggScan.supported(over, sumAgg),
      "overflow-unprovable decimal SUM must decline")
    // tiny per-row bounds rescue the same row count
    val tiny = manifest(file(2_000_000_000_000L, "-1.00", "1.00"))
    assert(GraftAggScan.supported(tiny, sumAgg))
    // a bound-less file makes the claim unprovable, never an exception
    val noBounds = manifest(file(10L, "-1.00", "1.00").copy(
      stats = Map("id" -> Seq("1", "10"))))
    assert(!GraftAggScan.supported(noBounds, sumAgg))
    // a missing per-file sum (e.g. a pre-decimal-accounting writer)
    // declines structurally
    val noSum = manifest(file(10L, "-1.00", "1.00").copy(
      sumStats = Map("id" -> "1")))
    assert(!GraftAggScan.supported(noSum, sumAgg))
  }

  test("fully-deleted current files do not disarm the proofs") {
    val dead = file(100L, "-9999999999.99", "9999999999.99").copy(
      deletes = 100L, dvAccounted = 100L,
      stats = Map("id" -> Seq("1", "100")), // live bounds legitimately gone
      dvNullStats = Map("amt" -> "0", "id" -> "0"),
      dvSumStats = Map("amt" -> "0", "id" -> "0"))
    val live = file(1000L, "-1.00", "1.00")
    assert(GraftAggScan.supported(manifest(live, dead), sumAgg),
      "a zero-live file must contribute zero to the decimal proof")
    // the long-integral proof has the same escape
    val ischema = SchemaDsl.struct("id" -> "int64", "v" -> "int64")
    def ifile(rows: Long, deletes: Long) = DataFileEntry(
      path = s"i-$rows.parquet", rows = rows, bytes = 1L, maxLsn = 1L,
      deletes = deletes, dvAccounted = deletes,
      stats = if (rows == deletes) Map("id" -> Seq("1", "2"))
              else Map("v" -> Seq("1", "5"), "id" -> Seq("1", "2")),
      nullStats = Map("v" -> "0", "id" -> "0"),
      sumStats = Map("v" -> "5", "id" -> "1"),
      dvNullStats = if (deletes > 0) Map("v" -> "0", "id" -> "0") else Map.empty,
      dvSumStats = if (deletes > 0) Map("v" -> "5", "id" -> "0") else Map.empty)
    val im = Manifest(1L, 1L, 1L, ischema.json, Seq("id"),
      Seq(ifile(10L, 0L), ifile(7L, 7L)), Seq.empty, Seq.empty)
    val isum = new Aggregation(
      Array(new Sum(Expressions.column("v"), false)), Array.empty)
    assert(GraftAggScan.supported(im, isum),
      "a zero-live file must not disarm the ANSI long-SUM proof")
  }

  test("the decimal Sum+Count pair is avg-rewrite-safe by construction") {
    val m = manifest(file(1000L, "-1.00", "1.00"))
    val pair = new Aggregation(Array(
      new Sum(Expressions.column("amt"), false),
      new Count(Expressions.column("amt"), false)), Array.empty)
    assert(GraftAggScan.supported(m, pair),
      "pushable decimal Sum+Count must pass the avg-rewrite gate")
  }

  test("decide: three-valued per-file filter evaluation") {
    import org.apache.spark.sql.sources._
    val e = file(100L, "-5.00", "5.00") // id ∈ [1,100], 0 nulls
    def d(f: Filter, entry: DataFileEntry = e) =
      GraftScan.decide(schema, entry, f)
    // boundary-aligned comparisons decide; mid-file ones don't
    assert(d(GreaterThanOrEqual("id", 1L)) == Some(true))
    assert(d(GreaterThan("id", 0L)) == Some(true))
    assert(d(GreaterThan("id", 100L)) == Some(false))
    assert(d(GreaterThan("id", 50L)).isEmpty)
    assert(d(LessThanOrEqual("id", 100L)) == Some(true))
    assert(d(LessThan("id", 1L)) == Some(false))
    assert(d(EqualTo("id", 200L)) == Some(false))
    assert(d(EqualTo("id", 50L)).isEmpty)
    assert(d(IsNotNull("id")) == Some(true))
    assert(d(IsNull("id")) == Some(false))
    // decimal bounds decide too (exact stat values)
    assert(d(GreaterThanOrEqual("amt",
      new java.math.BigDecimal("-5.00"))) == Some(true))
    assert(d(GreaterThan("amt", new java.math.BigDecimal("0"))).isEmpty)
    // nulls break comparison all-match (SQL: NULL never matches) but
    // not none-match
    val nully = file(100L, "-5.00", "5.00", nulls = 5L)
    assert(d(GreaterThanOrEqual("amt",
      new java.math.BigDecimal("-5.00")), nully).isEmpty)
    assert(d(LessThan("amt", new java.math.BigDecimal("-6")), nully)
      == Some(false))
    assert(d(IsNotNull("amt"), nully).isEmpty)
    assert(d(IsNull("amt"), nully).isEmpty)
    val allNull = file(100L, "0", "0", nulls = 100L)
    assert(d(IsNull("amt"), allNull) == Some(true))
    // a single-valued file decides EqualTo and In
    val point = e.copy(stats = e.stats + ("id" -> Seq("7", "7")))
    assert(d(EqualTo("id", 7L), point) == Some(true))
    assert(d(In("id", Array[Any](3L, 7L)), point) == Some(true))
    assert(d(In("id", Array[Any](3L, 8L)), point) == Some(false))
    // deletes with STALE masked accounting: zero physical nulls still
    // prove zero live nulls (live ⊆ physical)...
    val staleDel = e.copy(deletes = 3L)
    assert(d(GreaterThanOrEqual("id", 1L), staleDel) == Some(true))
    // ...but a physically-nulled column can no longer prove anything
    val staleNully = nully.copy(deletes = 3L)
    assert(d(IsNotNull("amt"), staleNully).isEmpty)
    // bounds-less column: indeterminate unless none-match is provable
    val noBounds = e.copy(stats = Map("id" -> Seq("1", "100")))
    assert(d(GreaterThanOrEqual("amt",
      new java.math.BigDecimal("0")), noBounds).isEmpty)
    // three-valued composites: disjunctive ranges prune per arm
    assert(d(Or(GreaterThan("id", 100L), LessThan("id", 1L))) == Some(false))
    assert(d(Or(GreaterThanOrEqual("id", 1L), GreaterThan("id", 300L)))
      == Some(true))
    assert(d(Or(GreaterThan("id", 50L), LessThan("id", 0L))).isEmpty)
    assert(d(And(GreaterThanOrEqual("id", 1L), LessThanOrEqual("id", 100L)))
      == Some(true))
    assert(d(And(GreaterThan("id", 200L), GreaterThan("id", 50L)))
      == Some(false))
    assert(d(And(GreaterThan("id", 50L), LessThanOrEqual("id", 100L))).isEmpty)
    // prunability of composites (both arms must be stat-comparable)
    assert(GraftScan.prunable(schema,
      Or(EqualTo("id", 1L), EqualTo("id", 99L))))
    assert(!GraftScan.prunable(schema,
      Or(EqualTo("id", 1L), StringContains("id", "x"))))
    // r17 dictionary decisions from per-value accounting: a trusted
    // value set decides equality/IN where bounds cannot
    val dict = e.copy(stats = e.stats + ("id" -> Seq("0", "10")),
      valueStats = Map("id" -> Map("0" -> "50", "10" -> "50")))
    assert(d(EqualTo("id", 5L), dict) == Some(false),
      "a literal absent from the value set must prune inside the bounds")
    assert(d(EqualTo("id", 10L), dict).isEmpty,
      "present + multi-valued stays indeterminate")
    assert(d(In("id", Array[Any](0L, 10L, 99L)), dict) == Some(true),
      "a value set covered by the IN list is file-exact all-match")
    assert(d(In("id", Array[Any](0L, 99L)), dict).isEmpty)
    assert(d(In("id", Array[Any](5L, 99L)), dict) == Some(false))
    // nulls never match equality, so the none-match stands with nulls
    val dictNull = dict.copy(nullStats = dict.nullStats + ("id" -> "5"))
    assert(d(EqualTo("id", 5L), dictNull) == Some(false))
    // …but the all-match needs zero live nulls
    assert(d(In("id", Array[Any](0L, 10L)), dictNull).isEmpty)
    // stale deletes distrust the set both ways
    val dictStale = dict.copy(deletes = 3L)
    assert(d(EqualTo("id", 5L), dictStale).isEmpty)
    assert(d(In("id", Array[Any](0L, 10L)), dictStale).isEmpty)
    // decimal literals canonicalize to the column scale before lookup:
    // scale-0 "5" matches a stored "5.00"; a finer-than-scale literal
    // can equal nothing the accounting could enumerate
    val dAmt = e.copy(valueStats = Map("amt" ->
      Map("5.00" -> "90", "-1.00" -> "10")))
    assert(GraftScan.mayMatch(schema, dAmt,
      EqualTo("amt", new java.math.BigDecimal("5"))),
      "a scale-0 literal must canonicalize and be FOUND, never pruned")
    assert(d(EqualTo("amt", new java.math.BigDecimal("5")), dAmt).isEmpty,
      "present + multi-valued stays indeterminate")
    assert(d(EqualTo("amt", new java.math.BigDecimal("7.00")), dAmt)
      == Some(false))
    assert(d(EqualTo("amt", new java.math.BigDecimal("5.005")), dAmt)
      == Some(false),
      "a finer-than-scale literal can never equal a stored value")
  }

  test("planning stays metadata-cheap at a 100k-file manifest") {
    import org.apache.spark.sql.sources._
    // 100k files ≈ a 12 TB table at 128 MiB targets; the exactness
    // sweep runs decide() per (file × filter) AT PLAN TIME, so it must
    // stay O(files) with a tiny constant — a quadratic or allocation-
    // heavy implementation would make every query's planning pay
    // seconds before a single task launches.
    val files = (0 until 100000).map { i =>
      val lo = i * 1000L
      DataFileEntry(path = s"f$i.parquet", rows = 1000L, bytes = 1L,
        maxLsn = 1L,
        stats = Map("id" -> Seq(lo.toString, (lo + 999L).toString),
          "amt" -> Seq("-9.99", "9.99")),
        nullStats = Map("id" -> "0", "amt" -> "3"),
        sumStats = Map("id" -> "1", "amt" -> "0.10"))
    }
    val m = Manifest(1L, 1L, 1L, schema.json, Seq("id"), files,
      Seq.empty, Seq.empty)
    val filters: Array[Filter] =
      Array(GreaterThanOrEqual("id", 50000000L), IsNotNull("id"))
    val t0 = System.nanoTime()
    var decided = 0
    files.foreach { e =>
      if (filters.forall(f => GraftScan.decide(schema, e, f).isDefined))
        decided += 1
    }
    val supported = GraftAggScan.supported(m, sumAgg)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(decided == 100000, s"every file must decide, got $decided")
    assert(supported, "the 100k-file decimal SUM proof must hold")
    // generous bound: observed ~0.2-0.5s; a regression to per-file
    // parsing storms or quadratic behavior lands in tens of seconds
    assert(sec < 5.0, f"planning sweep took $sec%.2fs over 100k files")
    // the r16 GROUP BY gate + grouped fold must stay O(files) too: a
    // 100k-file bucketed layout (32 single-valued groups) plans and
    // folds in well under a second per call
    import org.apache.spark.sql.connector.expressions.aggregate.CountStar
    val bucketed = m.copy(dataFiles = files.zipWithIndex.map {
      case (e, i) =>
        val k = (i % 32).toString
        e.copy(stats = e.stats + ("id" -> Seq(k, k)))
    })
    val gAgg = new Aggregation(Array(new CountStar()),
      Array(Expressions.column("id")))
    val t1 = System.nanoTime()
    assert(GraftAggScan.supported(bucketed, gAgg),
      "the bucketed 100k-file layout must push GROUP BY")
    val groups = GraftAggScan.groupedValues(bucketed, Seq("id"),
      Seq(new CountStar()))
    val gSec = (System.nanoTime() - t1) / 1e9
    assert(groups.size == 32 &&
      groups.forall(_(1) == 100000L / 32 * 1000L), s"${groups.size} groups")
    assert(gSec < 5.0, f"group planning+fold took $gSec%.2fs over 100k files")
    // the r17 PARTIAL path must stay O(files) too: 100k interleaved
    // files (8-value accounting each) gate + emit 800k partial rows
    val interleaved = m.copy(dataFiles = files.map(e => e.copy(
      stats = e.stats + ("id" -> Seq("0", "7")),
      valueStats = Map("id" ->
        (0 until 8).map(v => v.toString -> "125").toMap))))
    val t2p = System.nanoTime()
    assert(!GraftAggScan.supported(interleaved, gAgg) &&
      GraftAggScan.supportedPartial(interleaved, gAgg),
      "the interleaved 100k-file layout must push GROUP BY partially")
    val prows = GraftAggScan.partialRows(interleaved, Seq("id"),
      Seq(new CountStar()))
    val pSec = (System.nanoTime() - t2p) / 1e9
    assert(prows.size == 800000 && prows.forall(_(1) == 125L))
    assert(pSec < 5.0, f"partial planning took $pSec%.2fs over 100k files")
  }

  test("decide on strings: exact-marked bounds decide, unmarked decline") {
    import org.apache.spark.sql.sources._
    val sSchema = SchemaDsl.struct("id" -> "int64", "tenant" -> "string")
    def sf(mn: String, mx: String, exact: Boolean) = DataFileEntry(
      path = "s.parquet", rows = 10L, bytes = 1L, maxLsn = 1L,
      stats = Map("tenant" -> Seq(mn, mx), "id" -> Seq("1", "10")),
      nullStats = Map("tenant" -> "0", "id" -> "0"),
      exactBounds = if (exact) Seq("tenant") else Seq.empty)
    def d(f: Filter, e: DataFileEntry) = GraftScan.decide(sSchema, e, f)
    // exact-marked single-valued file: equality decides both ways
    val alpha = sf("alpha", "alpha", exact = true)
    assert(d(EqualTo("tenant", "alpha"), alpha) == Some(true))
    assert(d(EqualTo("tenant", "beta"), alpha) == Some(false))
    // exact-marked range under UTF-8 binary order
    assert(d(GreaterThanOrEqual("tenant", "alpha"), alpha) == Some(true))
    assert(d(LessThan("tenant", "alpha"), alpha) == Some(false))
    assert(d(In("tenant", Array[Any]("alpha", "x")), alpha) == Some(true))
    // the UNMARKED twin: a truncated min / lifted max cannot prove
    // all-match — only none-match (plain pruning) survives
    val unmarked = sf("alpha", "alpha", exact = false)
    assert(d(EqualTo("tenant", "alpha"), unmarked).isEmpty,
      "unmarked string bounds must never prove all-match")
    assert(d(EqualTo("tenant", "zeta"), unmarked) == Some(false),
      "none-match pruning still works unmarked")
    // exact-marked but multi-valued: ranges decide, equality does not
    val range = sf("alpha", "beta", exact = true)
    assert(d(GreaterThanOrEqual("tenant", "alpha"), range) == Some(true))
    assert(d(EqualTo("tenant", "alpha"), range).isEmpty)
    // live nulls break all-match on strings too
    val nully = sf("alpha", "alpha", exact = true)
      .copy(nullStats = Map("tenant" -> "2", "id" -> "0"))
    assert(d(EqualTo("tenant", "alpha"), nully).isEmpty)
    // r17 per-value accounting on strings: the value set is exact by
    // construction (full ≤32-cp values), so it decides where even
    // exact-marked bounds cannot — and independent of the marker
    val dictS = sf("alpha", "zzz", exact = false).copy(
      valueStats = Map("tenant" -> Map("alpha" -> "5", "zzz" -> "5")))
    assert(d(EqualTo("tenant", "beta"), dictS) == Some(false),
      "an absent short literal prunes via the value set, unmarked bounds")
    assert(d(EqualTo("tenant", "zz" + "a" * 38), dictS) == Some(false),
      "a >32-cp literal inside the bounds can equal no enumerated value")
    assert(d(In("tenant", Array[Any]("alpha", "zzz", "x")), dictS)
      == Some(true),
      "a covered string value set is IN-all-match even unmarked")
  }

  test("partial/complete decision matrix: COUNT-only groupings push " +
      "partially over split files, measures and joint splits decline") {
    import org.apache.spark.sql.connector.expressions.aggregate.CountStar
    val gSchema = SchemaDsl.struct("id" -> "int64", "k" -> "int64",
      "t" -> "string", "v" -> "int64")
    // an interleaved file: k ∈ {0,1,2} with per-value accounting,
    // t single-valued exact, v nullable (3 nulls), id high-cardinality
    def split(path: String, rows: Long = 30L,
        vals: Map[String, String] = Map("0" -> "10", "1" -> "10", "2" -> "10"),
        kNulls: Long = 0L, vNulls: Long = 3L) = DataFileEntry(
      path = path, rows = rows, bytes = 1L, maxLsn = 1L,
      stats = Map("k" -> Seq("0", "2"), "t" -> Seq("x", "x"),
        "id" -> Seq("1", rows.toString), "v" -> Seq("1", "9")),
      nullStats = Map("k" -> kNulls.toString, "t" -> "0", "id" -> "0",
        "v" -> vNulls.toString),
      exactBounds = Seq("t"),
      valueStats = Map("k" -> vals, "t" -> Map("x" -> rows.toString)))
    def m(files: DataFileEntry*) = Manifest(1L, 1L, 1L, gSchema.json,
      Seq("id"), files.toSeq, Seq.empty, Seq.empty)
    import org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc
    def agg(fs: Array[AggregateFunc], cols: String*) =
      new Aggregation(fs, cols.toArray.map(Expressions.column))
    val star: Array[AggregateFunc] = Array(new CountStar())
    val mix = m(split("a"), split("b"))
    // interleaved + count(*): complete declines, partial pushes
    assert(!GraftAggScan.supported(mix, agg(star, "k")))
    assert(GraftAggScan.supportedPartial(mix, agg(star, "k")))
    // partial rows: one per (file, value) cell, counts tile the files
    val rows = GraftAggScan.partialRows(mix, Seq("k"), star.toSeq)
    assert(rows.size == 6 && rows.forall(_(1) == 10L),
      rows.map(_.toSeq).toString)
    // count(k) and count(null-free id) derive per cell; count(v)
    // (nullable, non-group, multi-cell file) cannot
    def cnt(c: String): Array[AggregateFunc] =
      Array(new Count(Expressions.column(c), false))
    assert(GraftAggScan.supportedPartial(mix, agg(cnt("k"), "k")))
    assert(GraftAggScan.supportedPartial(mix, agg(cnt("id"), "k")))
    assert(!GraftAggScan.supportedPartial(mix, agg(cnt("v"), "k")))
    // …but over a SINGLE-cell file (group col single-valued) count(v)
    // derives from plain live non-null accounting
    val single = split("c", vals = null).copy(
      stats = Map("k" -> Seq("1", "1"), "t" -> Seq("x", "x"),
        "id" -> Seq("1", "30"), "v" -> Seq("1", "9")),
      valueStats = Map.empty)
    assert(GraftAggScan.supportedPartial(m(single), agg(cnt("v"), "k")))
    // measures never push partially
    val sumV: Array[AggregateFunc] =
      Array(new Sum(Expressions.column("v"), false))
    assert(!GraftAggScan.supportedPartial(mix, agg(sumV, "k")))
    // distinct never pushes partially
    assert(!GraftAggScan.supportedPartial(mix,
      agg(Array(new Count(Expressions.column("k"), true)), "k")))
    // one split column + one single-valued column: pushes (the joint
    // varies only along the split); TWO split columns decline
    assert(GraftAggScan.supportedPartial(mix, agg(star, "k", "t")))
    val rows2 = GraftAggScan.partialRows(mix, Seq("k", "t"), star.toSeq)
    assert(rows2.size == 6 && rows2.forall(r =>
      String.valueOf(r(1)) == "x" && r(2) == 10L))
    val twoSplit = m(split("a").copy(valueStats =
      Map("k" -> Map("0" -> "15", "1" -> "15"),
        "v" -> Map("1" -> "15", "2" -> "15"))))
    assert(!GraftAggScan.supportedPartial(twoSplit, agg(star, "k", "v")))
    // no per-value accounting (counter overflowed / pre-accounting
    // writer) and not single-valued: decline
    assert(!GraftAggScan.supportedPartial(mix, agg(star, "id")))
    // nulls on the split column: the null cell joins the emission
    val nully = m(split("a", rows = 33L, kNulls = 3L))
    assert(GraftAggScan.supportedPartial(nully, agg(star, "k")))
    val rows3 = GraftAggScan.partialRows(nully, Seq("k"), star.toSeq)
    assert(rows3.size == 4 &&
      rows3.count(_(0) == null) == 1 &&
      rows3.find(_(0) == null).get(1) == 3L, rows3.map(_.toSeq).toString)
    // count(k) over the null cell is zero
    val rows3k = GraftAggScan.partialRows(nully, Seq("k"), cnt("k").toSeq)
    assert(rows3k.find(_(0) == null).get(1) == 0L)
    // single-valued file WITH some nulls: two cells (the complete gate
    // declines this file, the partial one keeps it)
    val svNull = m(split("a", kNulls = 5L, vals = null).copy(
      stats = Map("k" -> Seq("1", "1"), "t" -> Seq("x", "x"),
        "id" -> Seq("1", "30"), "v" -> Seq("1", "9")),
      valueStats = Map.empty))
    assert(!GraftAggScan.supported(svNull, agg(star, "k")))
    assert(GraftAggScan.supportedPartial(svNull, agg(star, "k")))
    val rows4 = GraftAggScan.partialRows(svNull, Seq("k"), star.toSeq)
    assert(rows4.map(r => Option(r(0)) -> r(1)).toMap ==
      Map(Some(1L) -> 25L, scala.None -> 5L))
    // STALE deletes (masked values unread) decline; a refreshed entry
    // (accounting current, live per-value counts rewritten) pushes
    val stale = m(split("a").copy(deletes = 2L))
    assert(!GraftAggScan.supportedPartial(stale, agg(star, "k")))
    val refreshed = m(split("a").copy(deletes = 2L, dvAccounted = 2L,
      dvNullStats = Map("k" -> "0", "t" -> "0", "id" -> "0", "v" -> "0"),
      dvSumStats = Map("k" -> "0", "id" -> "0", "v" -> "0"),
      valueStats = Map("k" ->
        Map("0" -> "8", "1" -> "10", "2" -> "10"),
        "t" -> Map("x" -> "28"))))
    assert(GraftAggScan.supportedPartial(refreshed, agg(star, "k")))
    val rows5 = GraftAggScan.partialRows(refreshed, Seq("k"), star.toSeq)
    assert(rows5.map(r => r(0) -> r(1)).toMap ==
      Map(0L -> 8L, 1L -> 10L, 2L -> 10L))
    // torn accounting (cells do not tile the live rows) must decline
    // rather than answer wrong
    val torn = m(split("a").copy(valueStats =
      Map("k" -> Map("0" -> "10", "1" -> "10", "2" -> "5"))))
    assert(!GraftAggScan.supportedPartial(torn, agg(star, "k")))
    // a fully-deleted file contributes nothing and never blocks
    val dead = split("d").copy(deletes = 30L, dvAccounted = 30L)
    assert(GraftAggScan.supportedPartial(m(split("a"), dead),
      agg(star, "k")))
    assert(GraftAggScan.partialRows(m(split("a"), dead), Seq("k"),
      star.toSeq).size == 3)
    // the complete path keeps precedence where both hold: every file
    // single-valued → supported() true (the builder then plans the
    // one-row-per-group scan, not the partial merge)
    val clustered = m(split("a", vals = null).copy(
      stats = Map("k" -> Seq("1", "1"), "t" -> Seq("x", "x"),
        "id" -> Seq("1", "30"), "v" -> Seq("1", "9")),
      valueStats = Map.empty))
    assert(GraftAggScan.supported(clustered, agg(star, "k")))
  }

  test("GROUP BY pushes only over single-valued (or all-null) files") {
    import org.apache.spark.sql.connector.expressions.aggregate.CountStar
    val gSchema = SchemaDsl.struct("id" -> "int64", "k" -> "int64",
      "tenant" -> "string")
    def gf(path: String, kMn: String, kMx: String, t: String,
        exact: Boolean = true, kNulls: Long = 0L, rows: Long = 10L) =
      DataFileEntry(path = path, rows = rows, bytes = 1L, maxLsn = 1L,
        stats = Map("k" -> Seq(kMn, kMx), "tenant" -> Seq(t, t),
          "id" -> Seq("1", rows.toString)),
        nullStats = Map("k" -> kNulls.toString, "tenant" -> "0",
          "id" -> "0"),
        exactBounds = if (exact) Seq("tenant") else Seq.empty)
    def m(files: DataFileEntry*) = Manifest(1L, 1L, 1L, gSchema.json,
      Seq("id"), files.toSeq, Seq.empty, Seq.empty)
    def agg(col: String) = new Aggregation(Array(new CountStar()),
      Array(Expressions.column(col)))
    val clustered = m(gf("a", "1", "1", "x"), gf("b", "2", "2", "y"))
    assert(GraftAggScan.supported(clustered, agg("k")),
      "single-valued files must push GROUP BY k")
    assert(GraftAggScan.supported(clustered, agg("tenant")),
      "exact-marked single-valued string key must push")
    // a multi-valued file (k spans 1..2) declines
    val mixed = m(gf("a", "1", "2", "x"), gf("b", "2", "2", "y"))
    assert(!GraftAggScan.supported(mixed, agg("k")),
      "a multi-valued file must decline GROUP BY")
    // unmarked string bounds decline the string key (a truncated
    // bound is not the group value) but leave the numeric key alone
    val unmarked = m(gf("a", "1", "1", "x", exact = false))
    assert(!GraftAggScan.supported(unmarked, agg("tenant")))
    assert(GraftAggScan.supported(unmarked, agg("k")))
    // a file with SOME nulls on the key holds two groups: decline;
    // an ALL-null file is exactly the SQL NULL group: push
    val someNull = m(gf("a", "1", "1", "x", kNulls = 3L))
    assert(!GraftAggScan.supported(someNull, agg("k")))
    val allNull = m(gf("a", "1", "1", "x", kNulls = 10L),
      gf("b", "2", "2", "y"))
    assert(GraftAggScan.supported(allNull, agg("k")))
    // grouped VALUES: per-group accounting, NULL group included
    val rows = GraftAggScan.groupedValues(allNull, Seq("k"),
      Seq(new CountStar()))
    val byKey = rows.map(r => Option(r(0)) -> r(1)).toMap
    assert(byKey == Map(scala.None -> 10L, Some(2L) -> 10L), byKey)
    // MULTI-column groupings: every group column must be single-valued
    // per file; one mixed column declines the whole grouping
    def agg2(c1: String, c2: String) = new Aggregation(
      Array(new CountStar()),
      Array(Expressions.column(c1), Expressions.column(c2)))
    assert(GraftAggScan.supported(clustered, agg2("k", "tenant")),
      "both-single-valued files must push a two-column GROUP BY")
    assert(!GraftAggScan.supported(mixed, agg2("k", "tenant")),
      "one multi-valued column declines the two-column grouping")
    // two-column grouped values: the key tuple is (k, tenant), counts
    // fold per distinct pair; the string cell arrives as UTF8String
    val rows2 = GraftAggScan.groupedValues(clustered, Seq("k", "tenant"),
      Seq(new CountStar()))
    val byPair = rows2.map(r => (r(0), String.valueOf(r(1))) -> r(2)).toMap
    assert(byPair == Map((1L, "x") -> 10L, (2L, "y") -> 10L), byPair)
  }
}
