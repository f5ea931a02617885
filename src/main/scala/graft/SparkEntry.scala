package graft

import graft.model._
import graft.operators._
import graft.sources.{AvroIngest, OtelIngest, OtelSchema, ProtoIngest}
import graft.streaming.{CdcPipeline, MaintenanceDaemon}
import graft.table._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Driver contract: one `queries` entry per implemented operator from
 * SURVEY.md §2, each with an equivalent DuckDB oracle in `oracleSql`.
 *
 * Conventions for engine-exact oracle parity:
 *  - money/quantity sums in integer cents: CAST(ROUND(x*100) AS BIGINT);
 *  - ratios in integer milli/micro units (floor or round, documented);
 *  - DuckDB sums of BIGINT are HUGEINT -> always CAST back to BIGINT;
 *  - timestamps compared as epoch microseconds (testdata has no
 *    sub-microsecond components);
 *  - every result deterministically ordered by a unique key.
 */
object SparkEntry {

  /** Flagship: full CDC upsert pipeline on sf0.001 (driver smoke test). */
  def entry(spark: SparkSession): DataFrame =
    cdcUpsert(spark, "/root/testdata/sf0.001")

  // =====================================================================
  // helpers
  // =====================================================================

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Root for two-stage oracle staging: approximate operators (LSH /
   *  MinHash / SimHash / IVF) materialize their deterministic
   *  intermediate — fingerprints, shingle sets, candidate pairs — here,
   *  keyed by the scale-factor directory name, and the DuckDB oracle
   *  reads the staged parquet back (`read_parquet`) to verify the
   *  exact pair-join / ranking stages over the SAME inputs Spark used.
   *  Absolute because `oracleSql` is static SQL text; the driver always
   *  verifies at sf0.01, which is the path the oracle strings embed. */
  private val OracleStageRoot = "/root/repo/target/oracle-stage"

  /** Write `df` to the oracle stage and read it back, so the Spark plan
   *  downstream consumes byte-identical data to what the oracle sees. */
  private def stage(df: DataFrame, dir: String, sub: String): DataFrame = {
    val p = s"$OracleStageRoot/${new java.io.File(dir).getName}/$sub"
    df.write.mode("overwrite").parquet(p)
    df.sparkSession.read.parquet(p)
  }

  /** Write `df` as `n` doc_id-range parquet files with staggered
   *  mtimes, so a maxFilesPerTrigger=1 file-source stream replays it
   *  in id order — the arrival-order precondition that makes the
   *  streaming dedup entries' emitted sets equal their batch oracles. */
  private def streamSourceDir(df: DataFrame, n: Int,
      idCol: String = "doc_id"): String = {
    val dir = freshDir("stream-src")
    df.repartitionByRange(n, col(idCol)).sortWithinPartitions(idCol)
      .write.mode("overwrite").parquet(dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val base = System.currentTimeMillis() - 3600 * 1000
    parts.zipWithIndex.foreach { case (f, i) =>
      // the file source replays in MTIME order — the event-time stream
      // entries' correctness rides on this stamp, so a filesystem that
      // silently ignores setLastModified must fail loudly, not regress
      // into nondeterministic late-data drops
      require(f.setLastModified(base + i * 60000L),
        s"cannot stamp mtime on $f: arrival order would be undefined") }
    dir
  }

  /** events table with `ts` ALWAYS in epoch microseconds (LongType),
   *  whatever physical unit the current testdata generation stores —
   *  the fixture layer sniffs the parquet footer's logical-type
   *  annotation and normalizes (see [[graft.model.Fixtures]]). DuckDB's
   *  `epoch_us(ts)` matches exactly; all arithmetic stays integer (the
   *  values exceed double's 53-bit mantissa). */
  private def events(spark: SparkSession, dir: String): DataFrame =
    Fixtures.eventsMicros(spark, dir)

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  private val eventTableSchema = SchemaDsl.struct(
    "user_id" -> "int64", "event_id" -> "int64",
    "event_type" -> "string", "value" -> "float64")

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/t"

  /** Overlap-independent-jobs helper (optimization guide §2.6): run an
   *  entry's INDEPENDENT table build on its own daemon thread so its
   *  small fixed-overhead Spark jobs back-fill executor slots under the
   *  entry's foreground jobs instead of serializing after them. Spark's
   *  scheduler runs concurrent jobs FIFO — exactly the back-fill
   *  behaviour wanted. Probes/assertions stay on the entry thread, so
   *  coverage and results are unchanged; only the build WAIT overlaps. */
  private def bgBuild[T](s: SparkSession, what: String)(body: => T)
      : java.util.concurrent.FutureTask[T] = {
    val task = new java.util.concurrent.FutureTask[T](() => {
      s.sparkContext.setJobDescription(s"bg build: $what")
      try body finally s.sparkContext.setJobDescription(null)
    })
    val th = new Thread(task, s"graft-build-$what")
    th.setDaemon(true) // a failed foreground probe must not pin the JVM
    th.start()
    task
  }

  /** Await a [[bgBuild]] result, unwrapping the executor's exception so
   *  a build failure surfaces with its original message. */
  private def readyBuild[T](f: java.util.concurrent.FutureTask[T]): T =
    try f.get(10, java.util.concurrent.TimeUnit.MINUTES)
    catch {
      case e: java.util.concurrent.ExecutionException => throw e.getCause
    }

  /** Run `body` with `spark.sql.shuffle.partitions = n`, restoring the
   *  session value after. Stateful streaming queries instantiate one
   *  state-store task per shuffle partition PER TRIGGER, so on an
   *  entry-sized feed (4 files, one per trigger) 32 partitions of state
   *  machinery is pure fixed cost — the setting is recorded into the
   *  checkpoint at query start, and emitted results are partition-count
   *  independent. Production tunes the same knob to cluster cores. */
  private def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, old)
  }

  /** events.parquet rows ordered by event_id, as (userId, eventId, type, value) */
  private def orderedEvents(spark: SparkSession, dir: String): Array[Row] =
    events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy("event_id").collect()

  private def ingestCfg = TableConfig(memSliceSize = 4096, walEnabled = false)

  /** The events stream as a CDC event frame (`_op`, `_lsn` = event_id,
   *  then the table's data columns) — built declaratively, never
   *  collected. `deleteType` rows become CDC deletes of that user. */
  private def cdcEventFrame(spark: SparkSession, dir: String,
      deleteType: Option[String]): DataFrame = {
    val opCol = deleteType match {
      case Some(tpe) =>
        when(col("event_type") === tpe, lit("d")).otherwise(lit("u"))
      case None => lit("u")
    }
    events(spark, dir).select(opCol.as("_op"), col("event_id").as("_lsn"),
      col("user_id"), col("event_id"), col("event_type"), col("value"))
  }

  /** Apply the events stream as CDC upserts/deletes (LSN = event_id)
   *  through the distributed batch path: contiguous LSN-range
   *  micro-batches (the shape foreachBatch produces) fold, flush and
   *  index on the cluster via `CdcPipeline.applyBatch` — the driver
   *  never holds an event. Cross-batch deletes/upserts resolve against
   *  the key index into DVs, so the batch count > 1 exercises the full
   *  committed-row delete machinery. */
  private def runCdc(spark: SparkSession, dir: String,
      deleteType: Option[String], compactAfter: Boolean = false,
      nBatches: Int = 2, cfg: TableConfig = null): GraftTable = {
    val table = GraftTable.create(spark, freshDir("cdc"), eventTableSchema,
      Identity.Keys(Seq("user_id")), Option(cfg).getOrElse(ingestCfg))
    val ev = cdcEventFrame(spark, dir, deleteType)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val mm = ev.agg(min(col("_lsn")), max(col("_lsn"))).head()
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val span = (hi - lo) / nBatches + 1
      (0 until nBatches).foreach { i =>
        CdcPipeline.applyBatch(table, ev.where(
          col("_lsn") >= lo + i * span && col("_lsn") < lo + (i + 1) * span))
      }
    } finally ev.unpersist()
    if (compactAfter) { table.optimize(); table.vacuum() }
    table
  }

  private def cdcUpsert(spark: SparkSession, dir: String): DataFrame =
    runCdc(spark, dir, deleteType = None).read(None)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"), cents(col("value")).as("value_cents"))
      .orderBy("user_id")

  /** latest state per user via window — the SQL shape of upsert */
  private val cdcUpsertOracle =
    """SELECT user_id,
       |       event_id AS last_event_id,
       |       event_type AS last_event_type,
       |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
       |FROM events
       |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
       |ORDER BY user_id""".stripMargin

  private def cdcDeleteFinal(spark: SparkSession, dir: String,
      compact: Boolean): DataFrame =
    runCdc(spark, dir, deleteType = Some("purchase"), compactAfter = compact)
      .read(None)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        cents(col("value")).as("value_cents"))
      .orderBy("user_id")

  private val cdcDeleteOracle =
    """WITH last AS (
       |  SELECT user_id, event_id, event_type, value
       |  FROM events
       |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
       |SELECT user_id, event_id AS last_event_id,
       |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
       |FROM last WHERE event_type <> 'purchase'
       |ORDER BY user_id""".stripMargin

  // =====================================================================
  // the registry
  // =====================================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- relational layer over our scan (Catalyst; SURVEY §2.3) -------

    "q1_pricing_summary" -> ((s, d) => {
      t(s, d, "lineitem")
        .where(to_date(col("l_shipdate")) <= lit("1998-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          cents(sum(col("l_quantity"))).as("sum_qty_cents"),
          cents(sum(col("l_extendedprice"))).as("sum_base_cents"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q3_top_unshipped" -> ((s, d) => {
      val c = t(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders").where(to_date(col("o_orderdate")) < lit("1998-01-01"))
      val l = t(s, d, "lineitem").where(to_date(col("l_shipdate")) > lit("1998-01-01"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"))
        .agg(cents(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    "q5_nation_revenue" -> ((s, d) => {
      val r = t(s, d, "region")
      val n = t(s, d, "nation")
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      val l = t(s, d, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(cents(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_cents"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),

    "q22_idle_customers" -> ((s, d) => {
      // the TPC-H Q22 shape: above-average-balance customers with NO
      // orders — a scalar-subquery threshold (integer cents, so the
      // boundary cannot drift between engines' FP sum orders) feeding
      // a LEFT ANTI join, grouped by segment
      val c = t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          cents(col("c_acctbal")).as("bal_cents"))
      val pos = c.where(col("bal_cents") > 0)
      val mm = pos.agg(sum(col("bal_cents")), count(lit(1))).head()
      val thr = mm.getLong(0) / mm.getLong(1) // integer division, positive
      c.where(col("bal_cents") > thr)
        .join(t(s, d, "orders")
            .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
            .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("bal_cents")).as("bal_cents"))
        .orderBy("c_mktsegment")
    }),

    "q2_min_cost_supplier" -> ((s, d) => {
      // the TPC-H Q2 shape: a CORRELATED scalar min-subquery against a
      // multi-join dimension tree, written in SQL so Catalyst's
      // decorrelation (RewriteCorrelatedScalarSubquery) turns the
      // per-part min into one aggregate + join instead of a re-executed
      // subquery per row. Unit costs compare in integer cents so the
      // min boundary cannot drift between engines. (No partsupp table
      // in this schema; lineitem plays the part-supplier cost relation.)
      t(s, d, "part").createOrReplaceTempView("q2_part")
      t(s, d, "supplier").createOrReplaceTempView("q2_supplier")
      t(s, d, "lineitem").createOrReplaceTempView("q2_lineitem")
      t(s, d, "nation").createOrReplaceTempView("q2_nation")
      t(s, d, "region").createOrReplaceTempView("q2_region")
      s.sql(
        """SELECT p.p_partkey, s.s_name, n.n_name,
          |       CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS cost_cents
          |FROM q2_part p, q2_supplier s, q2_lineitem l, q2_nation n, q2_region r
          |WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
          |  AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
          |  AND r.r_name = 'EUROPE' AND p.p_size <= 10
          |  AND CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) = (
          |    SELECT MIN(CAST(ROUND(l2.l_extendedprice * 100) AS BIGINT))
          |    FROM q2_lineitem l2, q2_supplier s2, q2_nation n2, q2_region r2
          |    WHERE l2.l_partkey = p.p_partkey AND s2.s_suppkey = l2.l_suppkey
          |      AND s2.s_nationkey = n2.n_nationkey
          |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
          |GROUP BY 1, 2, 3, 4
          |ORDER BY cost_cents, p_partkey, s_name
          |LIMIT 100""".stripMargin)
    }),

    "q7_nation_volume" -> ((s, d) => {
      // the TPC-H Q7 shape: nation-pair shipping volume — a five-way
      // join with a symmetric pair predicate and a per-year CASE-free
      // rollup; revenue rounds to integer cents per ROW before the
      // sum so the aggregate is engine-order-independent. The two
      // nation dimensions broadcast; lineitem never shuffles twice.
      val n1 = t(s, d, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = t(s, d, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      t(s, d, "lineitem")
        .where(to_date(col("l_shipdate")) >= lit("1995-01-01") &&
          to_date(col("l_shipdate")) <= lit("1996-12-31"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .where((col("supp_nation") === "NATION_1" &&
            col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" &&
            col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * 100).cast("long")).as("revenue_cents"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    "q4_late_orders" -> ((s, d) => {
      // the TPC-H Q4 shape on this schema: EXISTS-correlated subquery
      // lowered to a LEFT SEMI join with a non-equi conjunct (late
      // shipment = shipdate beyond orderdate + 60 days); the semi join
      // keys on orderkey so the non-equi predicate evaluates inside
      // the hash match, never as a nested loop
      val o = t(s, d, "orders").where(
        col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-07-01").cast("timestamp"))
      val l = t(s, d, "lineitem")
      o.join(l,
          l("l_orderkey") === o("o_orderkey") &&
            l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    "q6_revenue_delta" -> ((s, d) => {
      t(s, d, "lineitem")
        .where(to_date(col("l_shipdate")) >= lit("1996-01-01") &&
          to_date(col("l_shipdate")) < lit("1997-01-01") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(cents(sum(col("l_extendedprice") * col("l_discount")))
          .as("revenue_cents"),
          count(lit(1)).as("n_rows"))
    }),

    "q8_market_share" -> ((s, d) => {
      // the TPC-H Q8 shape: one nation's milli-share of a region's
      // market per year — conditional-sum ratio over a six-way join.
      // Revenue rounds to integer cents per ROW, the share divides as
      // BIGINT (DIV), so neither sum order nor FP division can drift.
      // Both nation dims broadcast; the big tables join once each.
      val suppN = t(s, d, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val custN = t(s, d, "nation")
        .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
      val rev = round(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * 100).cast("long")
      t(s, d, "lineitem")
        .join(t(s, d, "part").where(col("p_type") === "PROMO"),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(custN), col("c_nationkey") === col("cn_key"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA")
        .join(broadcast(suppN), col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_1", rev).otherwise(0L))
            .as("nation_cents"),
          sum(rev).as("total_cents"))
        .select(col("o_year"),
          expr("nation_cents * 1000 DIV total_cents").as("share_milli"),
          col("total_cents"))
        .orderBy("o_year")
    }),

    "q9_profit_by_nation" -> ((s, d) => {
      // the TPC-H Q9 shape: per-(nation, year) profit over a pattern-
      // filtered part family; cost substitutes p_retailprice*quantity
      // for the absent partsupp relation. Profit rounds to cents per
      // row BEFORE the sum. The part filter prunes before any join.
      val profit = (round(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * 100) - round(col("p_retailprice") * col("l_quantity") * 100))
        .cast("long")
      t(s, d, "lineitem")
        .join(t(s, d, "part").where(col("p_name").like("%red%")),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("l_shipdate")).cast("long").as("o_year"))
        .agg(sum(profit).as("profit_cents"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    "q10_returned_items" -> ((s, d) => {
      // the TPC-H Q10 shape: top customers by returned-line revenue in
      // a quarter — join + group + ranked LIMIT with a full tiebreak
      // (revenue DESC, custkey ASC) so the cut is deterministic
      t(s, d, "lineitem").where(col("l_returnflag") === "R")
        .join(t(s, d, "orders").where(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 100).cast("long")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("c_custkey").asc)
        .limit(20)
    }),

    "q11_important_parts" -> ((s, d) => {
      // the TPC-H Q11 shape: per-part inventory value for one nation's
      // suppliers, kept only above a scalar-subquery fraction of the
      // whole — the HAVING-vs-global-total plan, in SQL so Catalyst
      // plans the total as one broadcast scalar, not a rescan per group
      t(s, d, "lineitem").createOrReplaceTempView("q11_lineitem")
      t(s, d, "supplier").createOrReplaceTempView("q11_supplier")
      t(s, d, "nation").createOrReplaceTempView("q11_nation")
      s.sql(
        """WITH v AS (
          |  SELECT l_partkey,
          |         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
          |  FROM q11_lineitem
          |  JOIN q11_supplier ON l_suppkey = s_suppkey
          |  JOIN q11_nation ON s_nationkey = n_nationkey
          |  WHERE n_name = 'NATION_3')
          |SELECT l_partkey AS p_partkey, SUM(cents) AS value_cents
          |FROM v
          |GROUP BY 1
          |HAVING SUM(cents) > (SELECT SUM(cents)
          |                     DIV (2 * COUNT(DISTINCT l_partkey)) FROM v)
          |ORDER BY value_cents DESC, p_partkey
          |LIMIT 100""".stripMargin)
    }),

    "q12_priority_shipping" -> ((s, d) => {
      // the TPC-H Q12 shape: CASE-sum counting of high- vs low-priority
      // orders among late shipments, per ship year (o_orderpriority
      // stands in for the absent l_shipmode)
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(year(col("l_shipdate")).cast("long").as("ship_year"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("ship_year")
    }),

    "q13_customer_distribution" -> ((s, d) => {
      // the TPC-H Q13 shape: LEFT OUTER join + two-level aggregation —
      // orders per customer (0 for orderless ones), then the histogram
      // of customers per order count
      val o = t(s, d, "orders").where(col("o_orderstatus") =!= "P")
        .select(col("o_custkey"), col("o_orderkey"))
      t(s, d, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    "q14_promo_effect" -> ((s, d) => {
      // the TPC-H Q14 shape: conditional-revenue share in one month;
      // milli-ratio via BIGINT DIV over per-row-rounded cents
      val rev = round(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * 100).cast("long")
      t(s, d, "lineitem")
        .where(to_date(col("l_shipdate")) >= lit("1996-01-01") &&
          to_date(col("l_shipdate")) < lit("1996-02-01"))
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", rev).otherwise(0L))
            .as("promo_cents"),
          sum(rev).as("total_cents"))
        .select(expr("promo_cents * 1000 DIV total_cents").as("promo_milli"),
          col("promo_cents"), col("total_cents"))
    }),

    "q15_top_supplier" -> ((s, d) => {
      // the TPC-H Q15 shape: a revenue view reused twice — once
      // aggregated to its max, once filtered to the argmax rows (ties
      // all surface, so no arbitrary cut)
      t(s, d, "lineitem").createOrReplaceTempView("q15_lineitem")
      t(s, d, "supplier").createOrReplaceTempView("q15_supplier")
      s.sql(
        """WITH revenue AS (
          |  SELECT l_suppkey AS supplier_no,
          |         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
          |             AS BIGINT)) AS total_cents
          |  FROM q15_lineitem
          |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          |    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
          |  GROUP BY 1)
          |SELECT s_suppkey, s_name, total_cents
          |FROM q15_supplier JOIN revenue ON s_suppkey = supplier_no
          |WHERE total_cents = (SELECT MAX(total_cents) FROM revenue)
          |ORDER BY s_suppkey""".stripMargin)
    }),

    "q16_supplier_cnt" -> ((s, d) => {
      // the TPC-H Q16 shape: COUNT(DISTINCT) per part attribute class
      // with a NOT-IN anti-subquery trimming the supplier domain
      // (lineitem is the part-supplier relation in this schema)
      val excluded = t(s, d, "supplier").where(col("s_acctbal") < 0)
        .select(col("s_suppkey").as("l_suppkey"))
      t(s, d, "lineitem")
        .join(t(s, d, "part").where(col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 9, 16, 25, 36, 49)),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(excluded), Seq("l_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
    }),

    "q17_small_qty_revenue" -> ((s, d) => {
      // the TPC-H Q17 shape: a per-part correlated AVG threshold —
      // Catalyst decorrelates the scalar subquery into one aggregate
      // joined back on partkey (quantities are integral doubles, so
      // the half-average compare is FP-exact in both engines)
      t(s, d, "lineitem").createOrReplaceTempView("q17_lineitem")
      t(s, d, "part").createOrReplaceTempView("q17_part")
      s.sql(
        """SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
          |       DIV 7 AS BIGINT) AS avg_period_cents,
          |       COUNT(*) AS n_lines
          |FROM q17_lineitem l JOIN q17_part p ON l.l_partkey = p.p_partkey
          |WHERE p.p_brand = 'Brand#1'
          |  AND l.l_quantity < (
          |    SELECT 0.5 * AVG(l2.l_quantity) FROM q17_lineitem l2
          |    WHERE l2.l_partkey = p.p_partkey)""".stripMargin)
    }),

    "q18_large_orders" -> ((s, d) => {
      // the TPC-H Q18 shape: orders whose line quantity total clears a
      // threshold, found via IN over a grouped HAVING subquery, then
      // re-joined for customer detail; ranked LIMIT with full tiebreak
      t(s, d, "lineitem").createOrReplaceTempView("q18_lineitem")
      t(s, d, "orders").createOrReplaceTempView("q18_orders")
      t(s, d, "customer").createOrReplaceTempView("q18_customer")
      s.sql(
        """SELECT c_custkey, c_name, o_orderkey,
          |       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents,
          |       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
          |FROM q18_customer
          |JOIN q18_orders ON c_custkey = o_custkey
          |JOIN q18_lineitem ON o_orderkey = l_orderkey
          |WHERE o_orderkey IN (
          |  SELECT l_orderkey FROM q18_lineitem
          |  GROUP BY 1 HAVING SUM(l_quantity) > 150)
          |GROUP BY 1, 2, 3, 4
          |ORDER BY total_cents DESC, o_orderkey
          |LIMIT 100""".stripMargin)
    }),

    "q19_disjunctive_rev" -> ((s, d) => {
      // the TPC-H Q19 shape: OR-of-AND predicate blocks across the
      // join — Catalyst extracts the common l_partkey=p_partkey
      // conjunct so the join stays an equi-join and only the residual
      // disjunction evaluates post-match
      val p = t(s, d, "part")
      val l = t(s, d, "lineitem")
      l.join(broadcast(p), col("l_partkey") === col("p_partkey") && (
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(11, 25) &&
          col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(26, 50) &&
          col("l_quantity").between(20, 40))))
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 100).cast("long")).as("revenue_cents"),
          count(lit(1)).as("n_lines"))
    }),

    "q20_part_promotion" -> ((s, d) => {
      // the TPC-H Q20 shape: nested IN — suppliers whose 1996 shipped
      // quantity of the part family exceeds a fifth of their all-time
      // total for it (5*sum vs sum in BIGINT: no FP fraction drift)
      t(s, d, "lineitem").createOrReplaceTempView("q20_lineitem")
      t(s, d, "part").createOrReplaceTempView("q20_part")
      t(s, d, "supplier").createOrReplaceTempView("q20_supplier")
      t(s, d, "nation").createOrReplaceTempView("q20_nation")
      s.sql(
        """SELECT s_suppkey, s_name
          |FROM q20_supplier JOIN q20_nation ON s_nationkey = n_nationkey
          |WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
          |  AND s_suppkey IN (
          |    SELECT l_suppkey FROM q20_lineitem
          |    WHERE l_partkey IN (
          |      SELECT p_partkey FROM q20_part WHERE p_name LIKE 'red%')
          |    GROUP BY 1
          |    HAVING 5 * CAST(SUM(CASE WHEN year(l_shipdate) = 1996
          |                   THEN l_quantity ELSE 0 END) AS BIGINT)
          |         > CAST(SUM(l_quantity) AS BIGINT))
          |ORDER BY s_suppkey""".stripMargin)
    }),

    "q21_waiting_suppliers" -> ((s, d) => {
      // the TPC-H Q21 shape: EXISTS + NOT EXISTS self-joins on the
      // fact table — a supplier's late line on a finished order where
      // ANOTHER supplier shipped on time and NO other supplier was
      // late; lateness = shipdate past orderdate + 60 days
      t(s, d, "lineitem").createOrReplaceTempView("q21_lineitem")
      t(s, d, "orders").createOrReplaceTempView("q21_orders")
      t(s, d, "supplier").createOrReplaceTempView("q21_supplier")
      t(s, d, "nation").createOrReplaceTempView("q21_nation")
      s.sql(
        """SELECT s_name, COUNT(*) AS numwait
          |FROM q21_supplier
          |JOIN q21_lineitem l1 ON s_suppkey = l1.l_suppkey
          |JOIN q21_orders ON o_orderkey = l1.l_orderkey
          |JOIN q21_nation ON s_nationkey = n_nationkey
          |WHERE o_orderstatus = 'F' AND n_name = 'NATION_1'
          |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          |  AND EXISTS (
          |    SELECT 1 FROM q21_lineitem l2
          |    WHERE l2.l_orderkey = l1.l_orderkey
          |      AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (
          |    SELECT 1 FROM q21_lineitem l3
          |    JOIN q21_orders o3 ON o3.o_orderkey = l3.l_orderkey
          |    WHERE l3.l_orderkey = l1.l_orderkey
          |      AND l3.l_suppkey <> l1.l_suppkey
          |      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
          |GROUP BY 1
          |ORDER BY numwait DESC, s_name
          |LIMIT 100""".stripMargin)
    }),

    "q_semi_join" -> ((s, d) => {
      // customers WITH at least one order (left semi), per segment
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    }),

    "q_anti_join" -> ((s, d) => {
      // customers WITHOUT orders (left anti)
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),

    "q_window_top_order" -> ((s, d) => {
      // each customer's highest-value order (rank over window)
      val o = t(s, d, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          cents(col("o_totalprice")).as("price_cents"))
        .orderBy("o_custkey")
    }),

    "q_window_running" -> ((s, d) => {
      // running order-count + value per customer over time
      val o = t(s, d, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.select(col("o_custkey"), col("o_orderkey"),
          count(lit(1)).over(w).as("running_n"),
          cents(sum(col("o_totalprice")).over(w)).as("running_cents"))
        .where(col("o_custkey") % 10 === 0)
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q_rollup" -> ((s, d) => {
      val n = t(s, d, "nation")
      val c = t(s, d, "customer")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), cents(sum(col("c_acctbal"))).as("bal_cents"))
        .select(coalesce(col("n_name"), lit("ALL")).as("n_name"),
          coalesce(col("c_mktsegment"), lit("ALL")).as("c_mktsegment"),
          col("n"), col("bal_cents"))
        .orderBy("n_name", "c_mktsegment")
    }),

    "q_grouping_sets" -> ((s, d) => {
      // explicit GROUPING SETS ((n_name), (c_mktsegment)) — the union
      // of two single-dimension groupings WITHOUT the pair, which
      // neither rollup nor cube expresses; Catalyst lowers it to one
      // Expand + one grouped aggregate (a single exchange, same as a
      // plain groupBy — not two scans unioned)
      val n = t(s, d, "nation")
      val c = t(s, d, "customer")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupingSets(
          Seq(Seq(col("n_name")), Seq(col("c_mktsegment"))),
          col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), cents(sum(col("c_acctbal"))).as("bal_cents"))
        .select(coalesce(col("n_name"), lit("ALL")).as("n_name"),
          coalesce(col("c_mktsegment"), lit("ALL")).as("c_mktsegment"),
          col("n"), col("bal_cents"))
        .orderBy("n_name", "c_mktsegment")
    }),

    "q_pivot" -> ((s, d) => {
      // relational PIVOT: per-user event counts spread across the five
      // event-type columns — Catalyst's pivot lowers to one grouped
      // aggregate with a conditional-count per pivot value (the same
      // single exchange as a plain groupBy; no per-column scans)
      events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("user_id"), col("click").as("n_click"),
          col("error").as("n_error"), col("purchase").as("n_purchase"),
          col("signup").as("n_signup"), col("view").as("n_view"))
        .orderBy("user_id")
    }),

    "q_unpivot" -> ((s, d) => {
      // UNPIVOT (stack) round-trip: the pivoted per-user counts fold
      // back to long form — generator-based, no shuffle beyond the
      // pivot's own; zero-count cells drop so the round-trip equals
      // the plain grouped counts
      events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .selectExpr("user_id",
          "stack(5, 'click', click, 'error', error, 'purchase', purchase, " +
            "'signup', signup, 'view', view) AS (event_type, n)")
        .where(col("n") > 0)
        .orderBy("user_id", "event_type")
    }),

    "q_cube" -> ((s, d) => {
      // CUBE with grouping_id: all four aggregation levels over
      // (event_type, user-parity) in ONE pass — Catalyst expands to a
      // single grouped exchange, the same shape rollup audits
      events(s, d)
        .select(col("event_type"), (col("user_id") % 2).as("parity"),
          col("value"))
        .cube(col("event_type"), col("parity"))
        .agg(count(lit(1)).as("n"), cents(sum(col("value"))).as("value_cents"),
          grouping_id().as("gid"))
        .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("parity"), lit(-1L)).as("parity"),
          col("gid"), col("n"), col("value_cents"))
        .orderBy("gid", "event_type", "parity")
    }),

    "q_setops" -> ((s, d) => {
      // customers ordering in 1995 but NOT in 1996 (EXCEPT), plus the
      // intersection count as a second branch via union of two marked sets
      val o = t(s, d, "orders")
      val y95 = o.where(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
      val y96 = o.where(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
      val exc = y95.except(y96).withColumn("which", lit("only95"))
      val inter = y95.intersect(y96).withColumn("which", lit("both"))
      exc.unionByName(inter)
        .groupBy(col("which")).agg(count(lit(1)).as("n_customers"))
        .orderBy("which")
    }),

    "q_distinct_agg" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    "q_skew_salted_topk" -> ((s, d) => {
      // exact per-key TOP-K under key skew via deterministic SALTING —
      // the skew class neither partial aggregation nor AQE mitigates:
      // a Window.partitionBy(key) funnels EVERY row of a hot key
      // through one task's sort. The derived key collapses ~91% of
      // lineitem onto "hot"; stage 1 ranks within (key, salt) and keeps
      // k per salt bucket, stage 2 re-ranks only the ≤ keys×S×k
      // survivors. Exact because each row lives in exactly one salt
      // bucket, so the true per-key top-k is a subset of the union of
      // per-(key,salt) top-k. The hot key's sort state shrinks S-fold;
      // the salt never leaves the plan (the oracle is the plain per-key
      // rank). Ordering is total (cents desc, orderkey, linenumber) so
      // both stages and the oracle elect identical rows.
      val S = 8
      val k = 5
      val li = t(s, d, "lineitem").select(
        when(col("l_partkey") % 100 < 91, lit("hot"))
          .otherwise(concat(lit("c"), (col("l_partkey") % 100).cast("string")))
          .as("grp"),
        col("l_orderkey"), col("l_linenumber"),
        cents(col("l_extendedprice")).as("price_cents"))
      val salt = pmod(
        Sketches.portableHash(col("l_orderkey") * lit(8) + col("l_linenumber")),
        lit(S.toLong))
      val order = Seq(col("price_cents").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      val stage1 = li.withColumn("salt", salt)
        .withColumn("srk", row_number().over(
          Window.partitionBy(col("grp"), col("salt")).orderBy(order: _*)))
        .where(col("srk") <= k)
      stage1
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("grp")).orderBy(order: _*)).cast("long"))
        .where(col("rk") <= k)
        .select(col("grp"), col("rk"), col("price_cents"),
          col("l_orderkey"), col("l_linenumber"))
        .orderBy("grp", "rk")
    }),

    "q_skew_salted_join" -> ((s, d) => {
      // shuffle-join skew via deterministic SALTING: the derived join
      // key puts ~90% of lineitem on key 0, so a plain shuffle join
      // sends the entire hot key to one reducer. The dim side (assumed
      // beyond broadcast scale at 100 TB — the hint pins the shuffled
      // hash join so the demo doesn't silently broadcast at test SF)
      // replicates ×S with an explicit salt column; the fact side
      // computes salt = portableHash(row) % S, so joining on
      // (key, salt) spreads the hot key across S reducers while every
      // fact row still meets exactly one dim replica. AQE's skew split
      // is the automatic alternative for sort-merge/shuffled-hash
      // joins; salting is the deterministic guarantee that also works
      // when runtime stats miss. The salt never leaves the plan.
      val S = 8
      val fact = t(s, d, "lineitem").select(
        when(col("l_orderkey") % 50 < 45, lit(0L))
          .otherwise(col("l_orderkey") % 50).as("jk"),
        cents(col("l_extendedprice")).as("price_cents"),
        pmod(Sketches.portableHash(
          col("l_orderkey") * lit(8) + col("l_linenumber")), lit(S.toLong))
          .as("salt"))
      val dim = s.range(0, 50).select(col("id").as("jk"),
        concat(lit("d"), col("id").cast("string")).as("label"))
      val dimSalted = dim.crossJoin(
        s.range(0, S).select(col("id").as("salt")))
      fact.join(dimSalted.hint("shuffle_hash"),
          fact("jk") === dimSalted("jk") && fact("salt") === dimSalted("salt"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_rows"), sum(col("price_cents")).as("sum_cents"))
        .orderBy("label")
    }),

    "shard_shuffle" -> ((s, d) => {
      // deterministic training-shard shuffle: the portable
      // multiplicative hash is the pseudo-random sort key, shard =
      // key % nShards, position = rank within the shard — the
      // "globally shuffled, sharded corpus" layout every training run
      // consumes. ONE exchange keyed by shard + a per-shard sort; no
      // global total order anywhere (the textbook mistake is
      // orderBy(rand()) — a full sort through one range exchange, and
      // non-reproducible). Engine-portable hash ⇒ DuckDB replays the
      // identical permutation; re-runs and repartitioning cannot
      // change the layout because the key is a pure function of
      // doc_id.
      val nShards = 8
      val key = Sketches.portableHash(col("doc_id"))
      t(s, d, "documents")
        .select(col("doc_id"), col("n_chars"), key.as("skey"),
          pmod(key, lit(nShards.toLong)).as("shard"))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("shard"))
            .orderBy(col("skey"), col("doc_id"))).cast("long"))
        .select(col("shard"), col("pos"), col("doc_id"), col("n_chars"))
        .orderBy("shard", "pos")
    }),

    "q_exact_quantiles" -> ((s, d) => {
      // EXACT p50/p90/p99 of l_extendedprice with no global sort:
      // histogram locates each rank's bucket (shuffles <=4096 cells),
      // then a TakeOrdered over that single bucket's sliver re-ranks
      // exactly — the discrete quantile is a real element of the
      // column, so the oracle's ORDER BY/OFFSET reproduces it exactly
      Quantiles.exactQuantiles(t(s, d, "lineitem"), "l_extendedprice",
          percents = Seq(50, 90, 99))
        .orderBy("percent")
    }),

    "q_kmv_groups" -> ((s, d) => {
      // per-GROUP distinct estimation: the KMV sketch as a typed
      // Aggregator inside an ordinary groupBy — partial aggregation
      // merges k-capped sorted buffers map-side, so each group ships
      // O(k) longs per partition instead of its distinct-user set;
      // the exact count rides along to document estimate quality
      val est = Sketches.kmvEstimate(64)
      events(s, d).groupBy(col("event_type"))
        .agg(est(Sketches.portableHash(col("user_id"))).as("est_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .orderBy("event_type")
    }),

    "q_kmv_distinct" -> ((s, d) => {
      // approximate COUNT DISTINCT via the K-minimum-values sketch:
      // per-partition k-capped heaps pre-thin to <=P*k candidate
      // hashes before the only shuffle (the full distinct set never
      // travels); the portable Weyl hash + exact BIGINT division make
      // DuckDB recompute the IDENTICAL sketch, verifying the estimate
      // itself, not just an error band
      Sketches.kmvDistinct(t(s, d, "lineitem"), col("l_partkey"), k = 256)
    }),

    "q_scalar_funcs" -> ((s, d) => {
      // scalar-function surface: dates, strings, conditionals, math
      t(s, d, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("o_year"),
          month(col("o_orderdate")).cast("long").as("o_month"),
          upper(substring(col("o_orderpriority"), 1, 1)).as("prio_initial"),
          concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("status_prio"),
          when(col("o_totalprice") > 200000, lit("big"))
            .when(col("o_totalprice") > 100000, lit("mid"))
            .otherwise(lit("small")).as("bucket"),
          (col("o_orderkey") % 7).cast("long").as("key_mod"),
          length(col("o_orderpriority")).cast("long").as("prio_len"))
        .orderBy("o_orderkey").limit(500)
    }),

    "q_topk" -> ((s, d) => {
      t(s, d, "orders")
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("price_cents"))
        .orderBy(col("price_cents").desc, col("o_orderkey").asc)
        .limit(20)
    }),

    // ---- events / streaming-style analytics ---------------------------

    "ev_hourly_agg" -> ((s, d) => {
      // tumbling 1h event-time window per type (streaming-equivalent agg)
      events(s, d)
        .groupBy(expr("ts DIV 3600000000 * 3600000000").as("hour_us"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), cents(sum(col("value"))).as("value_cents"))
        .orderBy("hour_us", "event_type")
    }),

    "stream_hourly_agg" -> ((s, d) => {
      // stateful WINDOWED aggregation on a stream: event-time hourly
      // windows with a watermark, state maintained across 4 micro-
      // batches; complete-mode sink so every window surfaces for the
      // batch-equality check (append mode would hold back windows the
      // final watermark never passes). Must equal the batch hourly agg.
      // time-split arrival (see stream_sessionize): an event-time
      // watermark assumes rough event-time arrival order; id-sliced
      // files are only time-ordered when ids and times correlate, and
      // rows behind the watermark would be silently dropped as late
      val feed = streamSourceDir(
        events(s, d).select(col("event_id"), col("ts"), col("event_type"),
          col("value")),
        n = 4, idCol = "ts")
      val qn = "sha_" + java.util.UUID.randomUUID().toString.replace("-", "")
      import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
      withShufflePartitions(s, 4) {
        val q = s.readStream
          .schema(StructType(Seq(
            StructField("event_id", LongType), StructField("ts", LongType),
            StructField("event_type", StringType),
            StructField("value", DoubleType))))
          .option("maxFilesPerTrigger", 1).parquet(feed)
          .withColumn("event_time", timestamp_micros(col("ts")))
          .withWatermark("event_time", "1 hour")
          .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), cents(sum(col("value"))).as("value_cents"))
          .writeStream.outputMode("complete").format("memory").queryName(qn)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      s.table(qn)
        .select(unix_micros(col("window.start")).as("hour_us"),
          col("event_type"), col("n"), col("value_cents"))
        .orderBy("hour_us", "event_type")
    }),

    "stream_sessionize" -> ((s, d) => {
      // SESSION windows on a stream: gap-based (30 min) per-user
      // sessions via session_window + watermark, state merged across 4
      // micro-batches. Append mode emits only watermark-closed
      // sessions — correct-by-construction incremental sessionization
      // (complete mode is unsupported for session windows, and update
      // mode would emit partial sessions) — so the feed ends with one
      // far-future SENTINEL event that pushes the final watermark past
      // every real session; the sentinel's own (held-back) session is
      // filtered out. Session state is keyed (user, window) and evicted
      // at the watermark, so memory is (open sessions), not stream
      // length. Gap semantics match the oracle exactly: a new session
      // starts iff t - prev >= gap (Spark's session end is exclusive).
      val base = events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val mm = base.agg(max(col("event_id")), max(col("ts"))).head()
      // split the feed by EVENT TIME (not id): a real stream arrives in
      // rough event-time order, and the watermark contract assumes it —
      // id-sliced files each spanning the whole timeline would arrive
      // almost entirely behind the watermark from trigger 2 on and be
      // dropped as late (observed at sf1, where ids and times are
      // uncorrelated). Range-split time slices are never late under
      // any delay.
      val feed = streamSourceDir(base, n = 4, idCol = "ts")
      // TWO sentinel files, each its own trigger: the first advances
      // the watermark past every real session; the second is a real
      // data batch that applies it, deterministically evicting and
      // emitting all real sessions. Relying on the trailing NO-DATA
      // batch instead is a race under AvailableNow (observed at sf1:
      // run-to-run output counts differed by the last tranche).
      (1 to 2).foreach { i =>
        val p = java.nio.file.Files.createTempDirectory("graft-sentinel")
        val sent = s.createDataFrame(
          java.util.Arrays.asList(Row(mm.getLong(0) + i,
            -1L, mm.getLong(1) + i * 30L * 86400000000L, 0.0)),
          base.schema)
        sent.coalesce(1).write.mode("overwrite").parquet(p.toString)
        val part = new java.io.File(p.toString).listFiles()
          .filter(_.getName.startsWith("part-")).head
        val dst = new java.io.File(feed, s"sentinel-$i.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        require(dst.setLastModified(System.currentTimeMillis() + i * 60000L),
          s"cannot stamp mtime on $dst: sentinel order would be undefined")
      }
      val qn = "ssw_" + java.util.UUID.randomUUID().toString.replace("-", "")
      import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
      withShufflePartitions(s, 4) {
        val q = s.readStream
          .schema(StructType(Seq(
            StructField("event_id", LongType), StructField("user_id", LongType),
            StructField("ts", LongType), StructField("value", DoubleType))))
          .option("maxFilesPerTrigger", 1).parquet(feed)
          .withColumn("event_time", timestamp_micros(col("ts")))
          .withColumn("vc", cents(col("value")))
          .withWatermark("event_time", "1 minute")
          .groupBy(session_window(col("event_time"), "30 minutes"),
            col("user_id"))
          .agg(count(lit(1)).as("n_events"), sum(col("vc")).as("value_cents"))
          .writeStream.outputMode("append").format("memory").queryName(qn)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      s.table(qn)
        .where(col("user_id") =!= -1L)
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start_us"),
          col("n_events"), col("value_cents"))
        .orderBy("user_id", "session_start_us")
    }),

    "ev_outliers" -> ((s, d) => {
      // per-type p99 outlier detection with rank-exact integer
      // semantics: the threshold is the value at ascending rank
      // ceil(0.99·n) within each event type; outliers are the values
      // strictly above it. One window pass per type partition + one
      // aggregate — no FP stddev, so the contract ports exactly.
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value_cents"), col("event_id"))
      val ranked = events(s, d)
        .select(col("event_type"), col("event_id"),
          cents(col("value")).as("value_cents"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1))
          .over(Window.partitionBy(col("event_type"))))
      val thr = ranked
        .where(col("rn") === expr("CAST(ceil(0.99 * n) AS BIGINT)"))
        .select(col("event_type"), col("value_cents").as("p99_cents"))
      ranked.join(thr, "event_type")
        .groupBy(col("event_type"), col("p99_cents"))
        .agg(sum(when(col("value_cents") > col("p99_cents"), 1L)
          .otherwise(0L)).as("n_outliers"))
        .orderBy("event_type")
    }),

    "ev_retention" -> ((s, d) => {
      // cohort retention curve: each user's first active hour anchors
      // their cohort; the histogram counts users still active N hours
      // later. Two grouped aggregates on the user key + one on the
      // offset — distinct-activity rows only ever shuffle once.
      val act = events(s, d)
        .select(col("user_id"), expr("ts DIV 3600000000").as("h"))
        .distinct()
      val coh = act.groupBy("user_id").agg(min(col("h")).as("h0"))
      act.join(coh, "user_id")
        .select(col("user_id"), (col("h") - col("h0")).as("hours_since_first"))
        .groupBy("hours_since_first")
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("hours_since_first")
    }),

    "ev_funnel" -> ((s, d) => {
      // ordered funnel analysis: per user, the earliest view, the
      // earliest click AFTER that view, the earliest purchase AFTER
      // that click (event_id order = event time order in this fixture).
      // Three grouped aggregates, each keyed on user_id — the same
      // exchange reused; no window over the raw event stream.
      // thinned to every 7th event so the chain genuinely breaks for
      // some users (the dense synthetic stream completes any funnel)
      val ev = events(s, d)
        .where(col("event_id") % 7 === 0)
        .select(col("user_id"), col("event_id"), col("event_type"))
      val m1 = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("event_id")).as("view_id"))
      val m2 = ev.join(m1, "user_id")
        .where(col("event_type") === "click" && col("event_id") > col("view_id"))
        .groupBy("user_id").agg(min(col("event_id")).as("click_id"))
      val m3 = ev.join(m2, "user_id")
        .where(col("event_type") === "purchase" && col("event_id") > col("click_id"))
        .groupBy("user_id").agg(min(col("event_id")).as("purchase_id"))
      val depth = m1.join(m2, Seq("user_id"), "left")
        .join(m3, Seq("user_id"), "left")
        .select(col("user_id"),
          when(col("purchase_id").isNotNull, 3L)
            .when(col("click_id").isNotNull, 2L).otherwise(1L).as("depth"))
      depth.groupBy("depth").agg(count(lit(1)).as("n_users"))
        .orderBy("depth")
    }),

    "ev_sessionize" -> ((s, d) => {
      // gap-based sessionization (30 min): session count + events/user
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      events(s, d)
        .select(col("user_id"), col("event_id"), col("ts").as("us"))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("new_s",
          when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"))
        .agg(max(col("session_id")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    "ev_asof_join" -> ((s, d) => {
      // as-of join: each purchase picks the user's most recent click at
      // or before it (microsecond granularity, matching the oracle's
      // timestamp precision)
      val e = events(s, d).withColumn("us", col("ts"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("us"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("us"), col("event_id").as("c_eid"))
      AsOf.joinBackward(purchases, clicks, Seq("user_id"),
          leftTs = "us", rightTs = "us",
          payloadCols = Map("c_eid" -> "click_event_id"))
        .select(col("event_id"), col("user_id"), col("click_event_id"))
        .orderBy("event_id")
    }),

    "stream_join" -> ((s, d) => {
      // watermarked stream-stream attribution join: clicks and
      // purchases ride the SAME live event feed (4 ts-ordered files,
      // one per trigger), split by type into two streams, and joined
      // on user within a forward 4h window — the time bound in the
      // join condition is what lets Spark EVICT join state (without it
      // an inner stream-stream join buffers both sides forever).
      // ts-ordered arrival + 1h watermark delay means nothing is ever
      // late, so the emitted set equals the batch join the oracle runs.
      import org.apache.spark.sql.types._
      withShufflePartitions(s, 4) {
        val ev = events(s, d)
          .select(col("event_id"), col("ts").as("us"),
            col("user_id"), col("event_type"))
        // split by TIME so the files really are ts-ordered (ids and
        // times need not correlate; late-arriving rows would silently
        // drop against the watermark otherwise)
        val srcDir = streamSourceDir(ev, 4, idCol = "us")
        val sch = StructType(Seq(StructField("event_id", LongType),
          StructField("us", LongType), StructField("user_id", LongType),
          StructField("event_type", StringType)))
        val stream = s.readStream.schema(sch)
          .option("maxFilesPerTrigger", "1").parquet(srcDir)
          .withColumn("ets", timestamp_micros(col("us")))
        val clicks = stream.where(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"),
            col("ets").as("c_ts"))
        val purchases = stream.where(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ets").as("p_ts"))
        val sink = freshDir("sj-out")
        val q = graft.streaming.StreamJoin.intervalJoin(
            clicks, purchases, "user_id", "c_ts", "p_ts",
            maxSpan = "4 hours", delay = "1 hour")
          .select(col("user_id"), col("click_id"), col("purchase_id"))
          .writeStream.outputMode("append").format("parquet")
          .option("path", sink)
          .option("checkpointLocation", freshDir("sj-ckpt"))
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(sink).orderBy("click_id", "purchase_id")
      }
    }),

    "ev_interval_join" -> ((s, d) => {
      // pure range-containment join (no equi key): attribution windows
      // [purchase_ts, +600s) over high-value purchases vs ALL events.
      // Spark's native plan for this predicate is
      // BroadcastNestedLoopJoin (O(n*m)); the bucketized operator turns
      // it into a bin equi-join + exact post-filter
      val e = events(s, d).withColumn("us", col("ts"))
      val windows = e
        .where(col("event_type") === "purchase" && col("value") > 150)
        .select(col("event_id").as("w_id"), col("us").as("start_us"),
          (col("us") + 600000000L).as("end_us"))
      AsOf.intervalJoin(e.select(col("us"), col("value")), "us",
          windows, "start_us", "end_us", binWidth = 600000000L)
        .groupBy("w_id")
        .agg(count(lit(1)).as("n_events"),
          cents(sum(col("value"))).as("value_cents"))
        .orderBy("w_id")
    }),

    "ev_props_json" -> ((s, d) => {
      // semi-structured payload parsing: JSON props column -> typed field
      events(s, d)
        .select(from_json(col("props"),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("k",
                org.apache.spark.sql.types.LongType)))).getField("k").as("k"),
          col("value"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), cents(sum(col("value"))).as("value_cents"))
        .orderBy("k_mod")
    }),

    "ev_user_stats" -> ((s, d) => {
      events(s, d)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("event_type")).as("n_types"),
          min(col("ts")).as("first_us"),
          max(col("ts")).as("last_us"),
          cents(sum(col("value"))).as("value_cents"))
        .orderBy("user_id")
    }),

    // ---- the ingestion engine itself (S1-S11, M1-M10) -----------------

    "cdc_upsert_state" -> ((s, d) => cdcUpsert(s, d)),

    "cdc_merge_into" -> ((s, d) => {
      // declarative MERGE INTO (the Delta/Iceberg verb) lowered to one
      // CDC batch per merge: key-only semi/anti routing, then plain
      // i/u/d events through the distributed ingest path.
      //   load customers with custkey%3!=0
      //   MERGE evens (mktsegment:='MERGED'): update matched, insert rest
      //   MERGE custkey%7==0: delete matched only
      val cust = t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      val table = GraftTable.create(s, freshDir("merge"),
        SchemaDsl.struct("c_custkey" -> "int64",
          "c_mktsegment" -> "string", "c_acctbal" -> "float64"),
        Identity.Keys(Seq("c_custkey")), ingestCfg)
      CdcPipeline.applyBatch(table,
        cust.where(col("c_custkey") % 3 =!= 0)
          .select(lit("i").as("_op"),
            (monotonically_increasing_id() + 1L).as("_lsn"),
            col("c_custkey"), col("c_mktsegment"), col("c_acctbal")))
      Merge.into(table,
        cust.where(col("c_custkey") % 2 === 0)
          .withColumn("c_mktsegment", lit("MERGED")))
      Merge.into(table,
        cust.where(col("c_custkey") % 7 === 0),
        whenMatched = Merge.DeleteMatched, insertNotMatched = false)
      table.read(scala.None)
        .select(col("c_custkey"), col("c_mktsegment"),
          cents(col("c_acctbal")).as("acctbal_cents"))
        .orderBy("c_custkey")
    }),

    "cdc_time_travel" -> ((s, d) => {
      // M8/M9 time travel: the upsert stream applied in FOUR batches,
      // then read AS OF the LSN where batch 2 ended. The snapshot is
      // materialized purely from that version's manifest (its files
      // minus its DVs) — rows upserted by batches 3-4, and the DVs
      // those upserts added over batch-1/2 files, must not leak in.
      val table = runCdc(s, d, deleteType = None, nBatches = 4)
      val mm = events(s, d)
        .agg(min(col("event_id")), max(col("event_id"))).head()
      val span = (mm.getLong(1) - mm.getLong(0)) / 4 + 1
      val cut = mm.getLong(0) + 2 * span - 1
      table.readAsOf(cut)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_clustered_prune" -> ((s, d) => {
      // Clustered maintenance (Iceberg sort-order / Delta ZORDER role):
      // optimize(clusterBy) range-sorts the rewrite so file stats become
      // disjoint value ranges, then a stats-pruned scan + row filter
      // answers a range query touching only the overlapping files. The
      // oracle catches over-aggressive pruning (missing rows); the
      // effectiveness claim (files actually skipped) is spec'd in
      // GraftTableSpec.
      val table = runCdc(s, d, deleteType = None)
      table.optimize(clusterBy = Seq("value"))
      table.prunedRead("value", Some(150.0), None)
        .where(col("value") >= 150.0)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_zorder_prune" -> ((s, d) => {
      // Z-ORDER maintenance (Delta OPTIMIZE ZORDER BY role): the
      // rewrite sorts on the Morton interleave of (user_id, value), so
      // each file covers a small hypercube and min/max stats prune on
      // EITHER dimension — a linear clusterBy would serve only its
      // lead column. The two-predicate pruned scan + exact row filter
      // must return exactly what a plain filter returns (oracle);
      // the files-actually-skipped-on-both-dims claim is spec'd in
      // GraftTableSpec.
      val table = runCdc(s, d, deleteType = None)
      table.optimize(clusterBy = Seq("user_id", "value"), zorder = true)
      table.prunedRead(Seq(
          ("user_id", scala.None, Some(75L)),
          ("value", Some(150.0), scala.None)))
        .where(col("user_id") <= 75L && col("value") >= 150.0)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_dpp_join" -> ((s, d) => {
      // dynamic file pruning end-to-end: user_id-clustered files, DSv2
      // scan broadcast-joined to an 11-key dim — Spark's DPP hands the
      // observed keys to the scan as a runtime IN predicate and files
      // outside their range are never read (effectiveness spec'd in
      // GraftDataSourceSpec; this row pins result correctness)
      val table = runCdc(s, d, deleteType = None)
      table.optimize(clusterBy = Seq("user_id"))
      val dim = s.range(10, 21).toDF("user_id")
      s.read.format("graft").load(table.root)
        .join(broadcast(dim), "user_id")
        .select(col("user_id"), col("event_id").as("last_event_id"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_spj_join" -> ((s, d) => {
      // STORAGE-PARTITIONED JOIN — bucketing for co-located joins: both
      // tables bucket-compacted onto the same pmod(xxhash64(key), 8)
      // layout (optimize(bucketBy)); the DSv2 scans report
      // KeyGroupedPartitioning, the catalog's FunctionCatalog serves
      // the matching `bucket` function, and the three-part-name SQL
      // join plans with ZERO exchanges on either side (plan pinned in
      // SpjSpec; this row pins result correctness). At 100 TB this is
      // the recurring fact-fact join that never re-shuffles: Iceberg's
      // SPJ machinery over the graft bucket layout. Broadcast is
      // disabled scoped, since neither side broadcasts at real scale;
      // the result is staged while the confs hold so the recorded scan
      // executes the shuffle-free plan.
      val wh = freshDir("wh-spj")
      val cat = GraftCatalog(s, wh)
      val cust = cat.createTable("cust", SchemaDsl.struct(
        "c_custkey" -> "int64", "acct_cents" -> "int64"),
        Identity.Keys(Seq("c_custkey")), ingestCfg)
      val ords = cat.createTable("ords", SchemaDsl.struct(
        "o_custkey" -> "int64", "n_orders" -> "int64",
        "total_cents" -> "int64"),
        Identity.Keys(Seq("o_custkey")), ingestCfg)
      CdcPipeline.applyBatch(cust, t(s, d, "customer").select(
        lit("i").as("_op"), col("c_custkey").as("_lsn"),
        col("c_custkey"), cents(col("c_acctbal")).as("acct_cents")))
      CdcPipeline.applyBatch(ords, t(s, d, "orders")
        .groupBy(col("o_custkey"))
        // per-row cents BEFORE the sum: integer aggregation is
        // order-independent where a double sum would round differently
        // across engines at cent boundaries
        .agg(count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("total_cents"))
        .select(lit("i").as("_op"), col("o_custkey").as("_lsn"),
          col("o_custkey"), col("n_orders"), col("total_cents")))
      cust.optimize(bucketBy = Some(8))
      ords.optimize(bucketBy = Some(8))
      val cname = "gc" + math.abs(wh.hashCode).toString
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sources.GraftCatalogPlugin].getName)
      s.conf.set(s"spark.sql.catalog.$cname.warehouse", wh)
      val scoped = Seq(
        "spark.sql.sources.v2.bucketing.enabled" -> "true",
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1")
      val olds = scoped.map { case (k, _) => k -> s.conf.getOption(k) }
      scoped.foreach { case (k, v) => s.conf.set(k, v) }
      try {
        stage(s.sql(
          s"""SELECT x.c_custkey, x.acct_cents, y.n_orders, y.total_cents
             |FROM $cname.graft.cust x
             |JOIN $cname.graft.ords y ON x.c_custkey = y.o_custkey
             |WHERE x.c_custkey % 3 = 0
             |ORDER BY x.c_custkey""".stripMargin), d, "spj_join")
      } finally olds.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, scala.None) => s.conf.unset(k)
      }
    }),

    "cdc_changes" -> ((s, d) => {
      // Change data feed over the time-travel axis: the delete-carrying
      // stream applied in 4 batches, then changesBetween(end of batch
      // 2, end of batch 3) — net inserts (users first seen in batch
      // 3), updates (re-upserted), and deletes (latest event became a
      // purchase). Two snapshot scans + one key-partitioned join, no
      // log replay regardless of how many commits separate the cuts.
      val table = runCdc(s, d, deleteType = Some("purchase"), nBatches = 4)
      val mm = events(s, d)
        .agg(min(col("event_id")), max(col("event_id"))).head()
      val span = (mm.getLong(1) - mm.getLong(0)) / 4 + 1
      val (cutA, cutB) = (mm.getLong(0) + 2 * span - 1, mm.getLong(0) + 3 * span - 1)
      table.changesBetween(cutA, cutB)
        .select(col("user_id"), col("_change_type").as("change_type"),
          col("_post.event_id").as("last_event_id"),
          cents(col("_post.value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_restore" -> ((s, d) => {
      // RESTORE (rollback-as-commit): three upsert batches, roll back
      // to the end-of-batch-2 version, read. The restored state is
      // served from a NEW manifest version pointing at the old files —
      // batch 3's rows and the DVs its upserts added must vanish.
      val table = GraftTable.create(s, freshDir("restore"), eventTableSchema,
        Identity.Keys(Seq("user_id")), ingestCfg)
      val ev = cdcEventFrame(s, d, None)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val mm = ev.agg(min(col("_lsn")), max(col("_lsn"))).head()
        val (lo, hi) = (mm.getLong(0), mm.getLong(1))
        val span = (hi - lo) / 3 + 1
        var vKeep = -1L
        (0 until 3).foreach { i =>
          CdcPipeline.applyBatch(table, ev.where(
            col("_lsn") >= lo + i * span && col("_lsn") < lo + (i + 1) * span))
          if (i == 1) vKeep = table.version
        }
        table.restoreToVersion(vKeep)
      } finally ev.unpersist()
      table.read(scala.None)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_delete_where" -> ((s, d) => {
      // DELETE WHERE as a first-class verb: upsert state, then one
      // predicate delete lowered to key-level delete events through
      // the distributed batch path — matched rows become DV positions,
      // untouched files are never rewritten.
      val table = runCdc(s, d, deleteType = None)
      table.deleteWhere(
        col("value") < 150.0 || col("event_type") === "purchase")
      table.read(scala.None)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_agg_pushdown" -> ((s, d) => {
      // DSv2 aggregate pushdown, BOTH directions gated in-entry (the
      // reference's cardinality accounting, `snapshot_read.rs:52-61`,
      // over parquet stats, `iceberg/parquet_stats_utils.rs`):
      //  - aggScanOnly THROWS unless the plan is GraftAggScan-only
      //    (a pushdown regression fails the correctness gate), and
      //  - mustScan THROWS if a plan IS GraftAggScan when pushing
      //    would be unsound (a silently-wrong push fails it too).
      // Phase 1: a compacted delete-free table pushes count/min/max/
      // count(col)/sum/avg. Phase 2: a predicate delete masks rows via
      // DVs — count(*) stays manifest-only (liveRows); min/max/
      // count(col)/sum/avg refuse UNTIL refreshDvStats folds the
      // masked rows into the accounting AND rewrites each file's
      // bounds from the surviving rows, then all push the live values.
      // Phase 3 negatives:
      // double columns never push sum/avg; an ANSI-unprovable SUM and
      // a beyond-2^53 AVG decline on an adversarial side table.
      // §2.6 overlap (VERDICT r18 #6): this entry probes SEVEN
      // independent tables, and its 12-18 s wall was dominated by their
      // SEQUENTIAL builds — each a chain of small fixed-overhead Spark
      // jobs, not data volume. The builds are mutually independent and
      // independent of the main CDC table, so they run as concurrent
      // driver-thread jobs that back-fill executor slots under runCdc's
      // job tails; every PROBE (plan-shape gate + result) still runs in
      // the exact original order on the entry thread, so phase coverage
      // and the computed result are unchanged.
      def bg[T](what: String)(body: => T) = bgBuild(s, what)(body)
      def ready[T](f: java.util.concurrent.FutureTask[T]): T = readyBuild(f)
      // ---- concurrent builds (each table private to this entry) ----
      val auxStrF = bg("auxStr") {
        val auxStr = GraftTable.create(s, freshDir("aggstr"),
          SchemaDsl.struct("id" -> "int64", "doc" -> "string"),
          Identity.Keys(Seq("id")),
          TableConfig(memSliceSize = 64, walEnabled = false))
        auxStr.apply(Seq(
          CdcEvent.upsert(Row(1L, "a" * 40 + "zz"), Seq(1L), 1L),
          CdcEvent.upsert(Row(2L, "z" * 40 + "aa"), Seq(2L), 2L)).flatten
          :+ Commit(3L))
        auxStr.flush(); auxStr.publish()
        auxStr
      }
      val auxF = bg("aux") {
        val aux = GraftTable.create(s, freshDir("aggneg"),
          SchemaDsl.struct("id" -> "int64", "v" -> "int64"),
          Identity.Keys(Seq("id")),
          TableConfig(memSliceSize = 64, walEnabled = false))
        aux.apply(Seq[Long](1L << 53, 1L, 1L, 1L).zipWithIndex.flatMap {
          case (v, i) => CdcEvent.upsert(Row(i.toLong + 1L, v),
            Seq(i.toLong + 1L), i.toLong + 1L) } :+ Commit(5L))
        aux.flush(); aux.publish()
        aux
      }
      val aux2F = bg("aux2") {
        val aux2 = GraftTable.create(s, freshDir("aggneg2"),
          SchemaDsl.struct("id" -> "int64", "v" -> "int64"),
          Identity.Keys(Seq("id")),
          TableConfig(memSliceSize = 64, walEnabled = false))
        aux2.apply((1L to 4L).flatMap(i => CdcEvent.upsert(
          Row(i, Long.MaxValue - 3L), Seq(i), i)) :+ Commit(5L))
        aux2.flush(); aux2.publish()
        aux2
      }
      val fltF = bg("flt") {
        val flt = GraftTable.create(s, freshDir("aggflt"),
          SchemaDsl.struct("id" -> "int64", "v" -> "int64"),
          Identity.Keys(Seq("id")),
          TableConfig(rowsPerFile = 64, walEnabled = false))
        def fltBatch(lo: Long, hi: Long): Unit =
          flt.applyBatchDF(s.range(lo, hi + 1).toDF("id")
            .select(lit("i").as("_op"), col("id").as("_lsn"), col("id"),
              when(col("id") % 10 === 0, lit(null)).otherwise(col("id"))
                .cast("long").as("v")), hi + 1, hasDeletes = false)
        fltBatch(1L, 100L); fltBatch(101L, 200L)
        require(flt.currentManifest.dataFiles.size > 1,
          "the filtered-agg proof needs multiple files")
        flt
      }
      val strF = bg("str") {
        val str = GraftTable.create(s, freshDir("aggstr2"),
          SchemaDsl.struct("id" -> "int64", "tenant" -> "string",
            "k" -> "int64", "v" -> "int64"),
          Identity.Keys(Seq("id")),
          TableConfig(rowsPerFile = 64, walEnabled = false))
        def strBatch(lo: Long, hi: Long, tenant: String, k: Long): Unit =
          str.applyBatchDF(s.range(lo, hi + 1).toDF("id")
            .select(lit("i").as("_op"), col("id").as("_lsn"), col("id"),
              lit(tenant).as("tenant"), lit(k).as("k"), col("id").as("v")),
            hi + 1, hasDeletes = false)
        strBatch(1L, 100L, "alpha", 1L); strBatch(101L, 200L, "beta", 2L)
        require(str.currentManifest.dataFiles.size > 1,
          "the string-decide proof needs multiple files")
        str
      }
      val grpMixF = bg("grpMix") {
        val grpMix = GraftTable.create(s, freshDir("agggrpmix"),
          SchemaDsl.struct("id" -> "int64", "k" -> "int64"),
          Identity.Keys(Seq("id")),
          TableConfig(rowsPerFile = 64, walEnabled = false))
        grpMix.applyBatchDF(s.range(1L, 201L).toDF("id")
          .select(lit("i").as("_op"), col("id").as("_lsn"), col("id"),
            (col("id") % 3).as("k")), 201L, hasDeletes = false)
        require(grpMix.currentManifest.dataFiles.size > 1 &&
          grpMix.currentManifest.dataFiles.forall(
            _.valueStats.get("k").exists(_.size == 3)),
          "every interleaved file must record per-value accounting for k")
        grpMix
      }
      val table = runCdc(s, d, deleteType = None, compactAfter = true)
      def planOf(df: DataFrame): String =
        df.queryExecution.executedPlan.toString
      def aggScanOnly(df: DataFrame): Row = {
        val plan = planOf(df)
        require(plan.contains("GraftAggScan") && !plan.contains("GraftScan("),
          s"aggregate not answered from the manifest:\n$plan")
        df.head()
      }
      def mustScan(df: DataFrame, exec: Boolean = true): Row = {
        val plan = planOf(df)
        require(!plan.contains("GraftAggScan"),
          s"aggregate ILLEGALLY answered from the manifest:\n$plan")
        if (exec) df.head() else null
      }
      // per-phase wall clock, one log line each, so a regression in
      // this seven-phase entry localizes without bisecting a monolith
      // (phases now OVERLAP the background builds, so a phase's wall is
      // its probe work plus any residual wait on its table's future)
      var tPhase = System.nanoTime()
      def phaseDone(name: String): Unit = {
        val now = System.nanoTime()
        println(f"[cdc_agg_pushdown] phase $name: ${(now - tPhase) / 1e9}%.2f s")
        tPhase = now
      }
      val pre = aggScanOnly(s.read.format("graft").load(table.root).agg(
        count(lit(1)), min(col("user_id")), max(col("user_id")),
        min(col("event_id")), max(col("event_id")),
        min(col("value")), max(col("value")),
        count(col("value")), // COUNT(col): per-file null accounting
        sum(col("user_id")), // SUM(col): exact integral per-file sums
        avg(col("user_id")))) // AVG: exact under the 2^53 bounds proof
      // double column: SUM/AVG must never push (order-dependent FP)
      mustScan(s.read.format("graft").load(table.root)
        .agg(sum(col("value")), avg(col("value"))))
      // string column, SHORT values: every file's bounds carry the
      // exactness marker (≤32 cp, no truncation/lift), so MIN/MAX
      // answer from the manifest — and must equal the scan's answer
      val strPush = aggScanOnly(s.read.format("graft").load(table.root)
        .agg(min(col("event_type")), max(col("event_type"))))
      val strScan = table.read(scala.None)
        .agg(min(col("event_type")), max(col("event_type"))).head()
      require(strPush == strScan,
        s"pushed string MIN/MAX diverge from the scan: $strPush vs $strScan")
      // string column, LONG values (>32 cp): bounds are truncated/
      // lifted, the marker is withheld, and MIN/MAX must scan — the
      // r13 wholesale exclusion survives as the unmarked case
      val auxStr = ready(auxStrF)
      val strLong = mustScan(s.read.format("graft").load(auxStr.root)
        .agg(min(col("doc")), max(col("doc"))))
      require(strLong.getString(0) == "a" * 40 + "zz" &&
        strLong.getString(1) == "z" * 40 + "aa",
        s"scan must answer the true long strings: $strLong")
      phaseDone("1 global pushes + string bounds")
      table.deleteWhere(col("event_type") === "purchase")
      val dfDel = s.read.format("graft").load(table.root)
      // COUNT(*) stays manifest-only under DVs (liveRows accounting)…
      val post = aggScanOnly(dfDel.agg(count(lit(1))))
      // …but MIN/MAX and un-refreshed COUNT(col)/SUM must fall back,
      // and the DV-aware scan answers them exactly
      mustScan(dfDel.agg(min(col("user_id")), max(col("event_id"))))
      val stale = mustScan(dfDel.agg(count(col("value")), sum(col("user_id"))))
      // refresh folds the masked rows in and rewrites each file's
      // bounds from the SURVIVING rows; COUNT(col)/SUM/AVG push the
      // LIVE values (and must agree with what the scan just said) and
      // MIN/MAX re-arm over the live bounds
      require(table.refreshDvStats() >= 1, "no delete-carrying file refreshed")
      table.publish()
      val dfLive = s.read.format("graft").load(table.root)
      val live = aggScanOnly(dfLive.agg(count(col("value")),
        sum(col("user_id")), round(avg(col("user_id")) * 100).cast("long"),
        min(col("user_id")), max(col("user_id"))))
      require(live.getLong(0) == stale.getLong(0) &&
        live.getLong(1) == stale.getLong(1),
        s"pushed live aggregates diverge from the scan: $live vs $stale")
      phaseDone("2 DV refresh re-arm")
      // adversarial side table: {2^53, 1, 1, 1} — ANSI SUM is provable
      // and pushes; AVG is beyond the 2^53 exactness proof and declines
      // (including Spark's sum/count rewrite of it)
      val aux = ready(auxF)
      val dfAux = s.read.format("graft").load(aux.root)
      val auxSum = aggScanOnly(dfAux.agg(sum(col("v"))))
      require(auxSum.getLong(0) == (1L << 53) + 3L, s"aux sum $auxSum")
      mustScan(dfAux.agg(avg(col("v"))), exec = false)
      // unprovable ANSI SUM (near-MaxValue values): plan must scan so
      // the genuine ANSI overflow surfaces instead of a wrapped push
      val aux2 = ready(aux2F)
      mustScan(s.read.format("graft").load(aux2.root).agg(sum(col("v"))),
        exec = false)
      phaseDone("3 ANSI/2^53 negatives")
      // Phase 4 (r15): FILE-EXACT filtered aggregates — the canonical
      // telemetry probe `count(*) WHERE k >= boundary` answers from the
      // manifest when every live file's bounds DECIDE the predicate
      // (all-match or none-match → pruning IS the filter); a mid-file
      // predicate must scan. Two ingest batches give files with id
      // ranges split exactly at 100/101; v is NULL on id % 10 == 0.
      val flt = ready(fltF)
      val dfF = s.read.format("graft").load(flt.root)
      // boundary-aligned: every file decides → manifest-only, behind
      // the predicate — count(*), count(col), SUM (ANSI proof over the
      // MATCHING subset) and MIN/MAX all push
      val fAll = aggScanOnly(dfF.where(col("id") >= 1L).agg(count(lit(1))))
      val fUp = aggScanOnly(dfF.where(col("id") >= 101L).agg(count(lit(1)),
        count(col("v")), sum(col("v")), min(col("id")), max(col("id"))))
      // mid-file: some file is indeterminate → the scan answers
      val fMid = mustScan(dfF.where(col("id") >= 150L).agg(count(lit(1))))
      // a delete re-checks the masked accounting PER FILE: count(*)
      // needs only live-row counts (still pushes: id has zero physical
      // nulls, so the filter stays decidable); count(v) needs masked
      // NULL accounting and scans until refreshed, then pushes the live
      // value — which must equal what the scan just said
      flt.deleteWhere(col("id") === 161L)
      val dfF2 = s.read.format("graft").load(flt.root)
      val fUpDel = aggScanOnly(dfF2.where(col("id") >= 101L).agg(count(lit(1))))
      val fNvScan = mustScan(dfF2.where(col("id") >= 101L).agg(count(col("v"))))
      require(flt.refreshDvStats() >= 1, "no delete-carrying file refreshed")
      flt.publish()
      val dfF3 = s.read.format("graft").load(flt.root)
      val fNvLive = aggScanOnly(dfF3.where(col("id") >= 101L).agg(count(col("v"))))
      require(fNvLive.getLong(0) == fNvScan.getLong(0),
        s"pushed filtered count(v) diverges from the scan: $fNvLive vs $fNvScan")
      phaseDone("4 file-exact filtered")
      // Phase 5 (r16): STRING predicates in the file-exact decide —
      // exactBounds-marked files answer equality and ranges on string
      // columns under UTF-8 binary order (`tenant = 'x'`, the second
      // most common telemetry filter after timestamps), so aggregates
      // push BEHIND them; a file with truncated/lifted bounds (>32 cp,
      // no marker) keeps the scan. Phase 6 (r16): GROUP BY pushdown
      // over single-valued files — the clustered layout groups by the
      // file's own key value from per-file accounting (reference
      // `snapshot_read.rs:52-61`); an unclustered twin must scan.
      val str = ready(strF)
      val dfS = s.read.format("graft").load(str.root)
      // string equality: alpha files all-match, beta files none-match
      val sEq = aggScanOnly(dfS.where(col("tenant") === "alpha")
        .agg(count(lit(1))))
      // string range under UTF-8 order, aggregates BEHIND it
      val sGe = aggScanOnly(dfS.where(col("tenant") >= "beta")
        .agg(count(lit(1)), sum(col("v"))))
      // unmarked (long, truncated/lifted) bounds must keep the scan
      val sLong = mustScan(s.read.format("graft").load(auxStr.root)
        .where(col("doc") >= "a").agg(count(lit(1))))
      phaseDone("5 string decide")
      // GROUP BY a numeric single-valued key: answered per-file-group
      def aggScanRows(df: DataFrame): Seq[Row] = {
        val plan = planOf(df)
        require(plan.contains("GraftAggScan") && !plan.contains("GraftScan("),
          s"grouped aggregate not answered from the manifest:\n$plan")
        df.collect().toSeq
      }
      val gRows = aggScanRows(dfS.groupBy(col("k")).agg(
        count(lit(1)).as("n"), sum(col("v")).as("sv"),
        min(col("id")).as("mn"), max(col("id")).as("mx")))
      val gScan = str.read(scala.None).groupBy(col("k")).agg(
        count(lit(1)), sum(col("v")), min(col("id")), max(col("id")))
        .collect().toSeq
      require(gRows.map(_.toSeq).toSet == gScan.map(_.toSeq).toSet,
        s"pushed GROUP BY diverges from the scan: $gRows vs $gScan")
      // GROUP BY a STRING key (exact-marked single-valued files)
      val gStr = aggScanRows(dfS.groupBy(col("tenant"))
        .agg(count(lit(1)).as("n")))
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      require(gStr == Map("alpha" -> 100L, "beta" -> 100L),
        s"string GROUP BY wrong: $gStr")
      val g2 = gRows.find(_.getLong(0) == 2L).get
      phaseDone("6 grouped complete")
      // Phase 7 (r17): PARTIAL pushdown over the unclustered twin
      // (k = id % 3 interleaved in EVERY file). The complete gate's
      // single-valued precondition fails, but every file carries
      // per-value accounting (DataFileEntry.valueStats), so the scan
      // emits per-file-cell PARTIAL count rows — supportCompletePushDown
      // stays false and Spark's own final aggregate folds them. The
      // plan must be a partial GraftAggScan with NO parquet read, and
      // the folded result must match the full scan row-for-row. A
      // measure aggregate (per-cell sums are not accounted) and a
      // group column that overflowed the value-counter cap must both
      // STILL scan.
      val grpMix = ready(grpMixF)
      val mixRows = {
        val df = s.read.format("graft").load(grpMix.root)
          .groupBy(col("k")).agg(count(lit(1)).as("n"))
        val plan = planOf(df)
        require(plan.contains("GraftAggScan(partial") &&
          !plan.contains("GraftScan("),
          s"interleaved GROUP BY not answered as manifest partials:\n$plan")
        df.collect().toSeq
      }
      val mixScan = grpMix.read(scala.None).groupBy(col("k"))
        .agg(count(lit(1))).collect().toSeq
      require(mixRows.map(_.toSeq).toSet == mixScan.map(_.toSeq).toSet,
        s"partial GROUP BY diverges from the scan: $mixRows vs $mixScan")
      val dfMix = s.read.format("graft").load(grpMix.root)
      mustScan(dfMix.groupBy(col("k")).agg(sum(col("id"))), exec = false)
      mustScan(dfMix.groupBy(col("id")).agg(count(lit(1))), exec = false)
      val mixK1 = mixRows.find(_.getLong(0) == 1L).map(_.getLong(1)).getOrElse(-1L)
      // composition: GROUP BY BEHIND a file-exact filter — the filter
      // prunes the snapshot to its all-match files, the grouping folds
      // what remains (one GraftAggScan, zero files read)
      val gFlt = aggScanRows(dfS.where(col("id") >= 101L)
        .groupBy(col("tenant")).agg(count(lit(1)).as("n")))
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      require(gFlt == Map("beta" -> 100L),
        s"filtered GROUP BY wrong: $gFlt")
      phaseDone("7 grouped partial + filtered composition")
      import s.implicits._
      val strGrpOut = Seq((sEq.getLong(0), sGe.getLong(0), sGe.getLong(1),
        sLong.getLong(0), gRows.size.toLong, g2.getLong(1), g2.getLong(2),
        g2.getLong(4), gStr("alpha"), mixK1, gFlt("beta")))
        .toDF("str_n_alpha", "str_n_beta", "str_sum_beta", "str_n_long",
          "grp_groups", "grp_k2_n", "grp_k2_sum", "grp_k2_mx",
          "grp_t_alpha_n", "grp_mix_k1_n", "grp_flt_beta_n")
      val fltOut = Seq((fAll.getLong(0), fUp.getLong(0), fUp.getLong(1),
        fUp.getLong(2), fUp.getLong(3), fUp.getLong(4), fMid.getLong(0),
        fUpDel.getLong(0), fNvLive.getLong(0)))
        .toDF("flt_n_all", "flt_n_upper", "flt_nv_upper", "flt_sumv_upper",
          "flt_mn_upper", "flt_mx_upper", "flt_n_mid", "flt_n_upper_del",
          "flt_nv_upper_live")
      Seq((pre.getLong(0), pre.getLong(1), pre.getLong(2), pre.getLong(3),
        pre.getLong(4), pre.getDouble(5), pre.getDouble(6), pre.getLong(7),
        pre.getLong(8), post.getLong(0), live.getLong(0), live.getLong(1),
        live.getLong(2), live.getLong(3), live.getLong(4)))
        .toDF("n_users", "mn_user", "mx_user", "mn_event", "mx_event",
          "mn_value", "mx_value", "n_values", "sum_users", "n_after_deletes",
          "n_values_live", "sum_users_live", "avg_user_c_live",
          "mn_user_live", "mx_user_live")
        .select(col("n_users"), col("mn_user"), col("mx_user"),
          col("mn_event"), col("mx_event"),
          cents(col("mn_value")).as("mn_value_cents"),
          cents(col("mx_value")).as("mx_value_cents"),
          col("n_values"), col("sum_users"), col("n_after_deletes"),
          col("n_values_live"), col("sum_users_live"),
          col("avg_user_c_live"), col("mn_user_live"),
          col("mx_user_live"))
        .crossJoin(fltOut)
        .crossJoin(strGrpOut)
    }),

    "cdc_agg_decimal" -> ((s, d) => {
      // DECIMAL aggregate pushdown — the masked-accounting machinery
      // over money columns (the most common real-world aggregate).
      // Per-file sums are EXACT fixed-scale decimals (sites mirror the
      // reference's stats collection, `iceberg/parquet_stats_utils.rs`),
      // pushed only under the buffer-overflow bounds proof in BOTH ANSI
      // modes; AVG(decimal) reconstructs scanlessly via Spark's
      // Sum/Count rewrite in the same exact decimal arithmetic. Both
      // directions gated in-entry like cdc_agg_pushdown: aggScanOnly
      // throws on a missed push, mustScan on an unsound one (the wide
      // decimal(32,2) twin records no sums — p+10 > 38 — and must keep
      // scanning for SUM while COUNT/MIN/MAX still push from bounds).
      val sch = SchemaDsl.struct("event_id" -> "int64",
        "user_id" -> "int64", "amt" -> "decimal(12,2)",
        "amt_wide" -> "decimal(32,2)")
      val table = GraftTable.create(s, freshDir("aggdec"), sch,
        Identity.Keys(Seq("event_id")),
        TableConfig(rowsPerFile = 1024, compactSmallFileRows = 512,
          walEnabled = false))
      // exact decimal build: integer cents via pmod, then decimal
      // multiply by 0.01 — every step exact in both engines
      val src = events(s, d)
        .where(pmod(col("event_id"), lit(4)) === 0)
        .select(col("event_id"), col("user_id"),
          when(pmod(col("event_id"), lit(40)) === 0, lit(null))
            .otherwise(expr(
              "CAST(CAST(user_id * 100 + pmod(event_id, 100) AS " +
                "DECIMAL(14,2)) * CAST(0.01 AS DECIMAL(3,2)) AS " +
                "DECIMAL(12,2))"))
            .as("amt"))
        .withColumn("amt_wide", col("amt").cast("decimal(32,2)"))
      val maxLsn = src.agg(max("event_id")).head().getLong(0) + 2L
      // hash-repartition first: the source parquet is one split at this
      // SF, and applyBatchDF's size-tuning coalesce can only merge
      table.applyBatchDF(src.select(lit("i").as("_op"),
        (col("event_id") + 1L).as("_lsn"), col("event_id"),
        col("user_id"), col("amt"), col("amt_wide"))
        .repartition(8, col("event_id")), maxLsn,
        hasDeletes = false)
      require(table.currentManifest.dataFiles.size > 1,
        "the proof must span multiple files' partial sums")
      def planOf(df: DataFrame): String =
        df.queryExecution.executedPlan.toString
      def aggScanOnly(df: DataFrame): Row = {
        val plan = planOf(df)
        require(plan.contains("GraftAggScan") && !plan.contains("GraftScan("),
          s"decimal aggregate not answered from the manifest:\n$plan")
        df.head()
      }
      def mustScan(df: DataFrame): Row = {
        val plan = planOf(df)
        require(!plan.contains("GraftAggScan"),
          s"decimal aggregate ILLEGALLY answered from the manifest:\n$plan")
        df.head()
      }
      val df = s.read.format("graft").load(table.root)
      val pre = aggScanOnly(df.agg(count(lit(1)), count(col("amt")),
        sum(col("amt")), min(col("amt")), max(col("amt"))))
      // AVG: no direct push, but the plan must still be scanless (the
      // rewrite's pair pushes) and the value bit-identical to the
      // library scan's exact decimal average
      val preAvg = aggScanOnly(df.agg(avg(col("amt"))))
      require(preAvg.getDecimal(0) ==
        table.read(scala.None).agg(avg(col("amt"))).head().getDecimal(0),
        "pushed-pair decimal AVG must equal the scan bit-for-bit")
      // the un-summable wide twin: SUM scans, COUNT/MIN/MAX push
      mustScan(df.agg(sum(col("amt_wide"))))
      val wmm = aggScanOnly(df.agg(min(col("amt_wide")),
        max(col("amt_wide")), count(col("amt_wide"))))
      require(wmm.getDecimal(0).compareTo(pre.getDecimal(3)) == 0 &&
        wmm.getDecimal(1).compareTo(pre.getDecimal(4)) == 0 &&
        wmm.getLong(2) == pre.getLong(1),
        s"wide-decimal bounds answers diverge: $wmm vs $pre")
      // predicate delete masks rows; decimal aggregates refuse until
      // refreshDvStats folds the masked decimal sums in, then push the
      // live values — which must equal what the scan just said
      table.deleteWhere(pmod(col("user_id"), lit(5)) === 0)
      val dfDel = s.read.format("graft").load(table.root)
      val stale = mustScan(dfDel.agg(count(col("amt")), sum(col("amt")),
        min(col("amt"))))
      require(table.refreshDvStats() >= 1, "no delete-carrying file refreshed")
      table.publish()
      val dfLive = s.read.format("graft").load(table.root)
      val live = aggScanOnly(dfLive.agg(count(lit(1)), count(col("amt")),
        sum(col("amt")), min(col("amt")), max(col("amt"))))
      require(live.getLong(1) == stale.getLong(0) &&
        live.getDecimal(2) == stale.getDecimal(1) &&
        live.getDecimal(3) == stale.getDecimal(2),
        s"pushed live decimal aggregates diverge from the scan: $live vs $stale")
      val liveAvg = aggScanOnly(dfLive.agg(avg(col("amt"))))
      require(liveAvg.getDecimal(0) ==
        table.read(scala.None).agg(avg(col("amt"))).head().getDecimal(0),
        "live pushed-pair decimal AVG must equal the scan bit-for-bit")
      def bdCents(b: java.math.BigDecimal): Long =
        b.movePointRight(2).longValueExact()
      import s.implicits._
      Seq((pre.getLong(0), pre.getLong(1), bdCents(pre.getDecimal(2)),
        bdCents(pre.getDecimal(3)), bdCents(pre.getDecimal(4)),
        live.getLong(0), live.getLong(1), bdCents(live.getDecimal(2)),
        bdCents(live.getDecimal(3)), bdCents(live.getDecimal(4))))
        .toDF("n_rows", "n_amt", "sum_cents", "mn_cents", "mx_cents",
          "n_live", "n_amt_live", "sum_cents_live", "mn_cents_live",
          "mx_cents_live")
    }),

    "cdc_update_where" -> ((s, d) => {
      // UPDATE ... SET as a first-class verb: matched rows become
      // upsert events (delete-half DVs the old version, append-half
      // writes the new), O(matched) like deleteWhere — click events
      // get their value doubled and type rebranded.
      val table = runCdc(s, d, deleteType = None)
      table.updateWhere(col("event_type") === "click",
        Map("value" -> col("value") * 2.0,
          "event_type" -> lit("click2x")))
      table.read(scala.None)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_rename_col" -> ((s, d) => {
      // metadata-only column rename mid-stream: batch 1 ingests under
      // the old name, ALTER RENAME event_type -> etype, batch 2 ingests
      // under the new name; pre-rename files resolve through the
      // physical-name mapping without any rewrite.
      val table = GraftTable.create(s, freshDir("rename"), eventTableSchema,
        Identity.Keys(Seq("user_id")), ingestCfg)
      val ev = cdcEventFrame(s, d, None)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val mm = ev.agg(min(col("_lsn")), max(col("_lsn"))).head()
        val (lo, hi) = (mm.getLong(0), mm.getLong(1))
        val span = (hi - lo) / 2 + 1
        CdcPipeline.applyBatch(table, ev.where(col("_lsn") < lo + span))
        table.alterRenameColumn("event_type", "etype")
        CdcPipeline.applyBatch(table, ev.where(col("_lsn") >= lo + span)
          .withColumnRenamed("event_type", "etype"))
      } finally ev.unpersist()
      table.read(scala.None)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("etype").as("last_etype"), cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_alter_widen" -> ((s, d) => {
      // type widening mid-stream: batch 1 writes vcents as INT32
      // parquet, ALTER widens it to int64 (metadata only — narrow
      // pages decode under the wide read schema), batch 2 ingests
      // values beyond Int.MaxValue into the same column.
      val sch = SchemaDsl.struct("user_id" -> "int64",
        "event_id" -> "int64", "vcents" -> "int32")
      val table = GraftTable.create(s, freshDir("widen"), sch,
        Identity.Keys(Seq("user_id")), ingestCfg)
      val base = events(s, d).select(lit("u").as("_op"),
        col("event_id").as("_lsn"), col("user_id"), col("event_id"),
        col("value"))
      val mm = base.agg(min(col("_lsn")), max(col("_lsn"))).head()
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val span = (hi - lo) / 2 + 1
      CdcPipeline.applyBatch(table, base.where(col("_lsn") < lo + span)
        .withColumn("vcents", cents(col("value")).cast("int")).drop("value"))
      table.alterWidenColumn("vcents", "int64")
      CdcPipeline.applyBatch(table, base.where(col("_lsn") >= lo + span)
        .withColumn("vcents", cents(col("value")) + lit(3000000000L))
        .drop("value"))
      table.read(scala.None)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("vcents"))
        .orderBy("user_id")
    }),

    "cdc_sql_alter" -> ((s, d) => {
      // schema evolution through SQL DDL: the V2 catalog's alterTable
      // maps ALTER COLUMN TYPE / RENAME COLUMN onto the table's alter
      // verbs (metadata-only — narrow int32 pages decode under the
      // widened read schema, rename is a logical-name swap over the
      // column-mapping seam; zero files rewritten). Same widen contract
      // as cdc_alter_widen, driven by SQL between two CDC batches.
      val wh = freshDir("wh-alter")
      val cat = GraftCatalog(s, wh)
      val sch = SchemaDsl.struct("user_id" -> "int64",
        "event_id" -> "int64", "vcents" -> "int32")
      val table = cat.createTable("events_alter", sch,
        Identity.Keys(Seq("user_id")), ingestCfg)
      val base = events(s, d).select(lit("u").as("_op"),
        col("event_id").as("_lsn"), col("user_id"), col("event_id"),
        col("value"))
      val mm = base.agg(min(col("_lsn")), max(col("_lsn"))).head()
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val span = (hi - lo) / 2 + 1
      CdcPipeline.applyBatch(table, base.where(col("_lsn") < lo + span)
        .withColumn("vcents", cents(col("value")).cast("int")).drop("value"))
      val cname = "gc" + math.abs(wh.hashCode).toString
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sources.GraftCatalogPlugin].getName)
      s.conf.set(s"spark.sql.catalog.$cname.warehouse", wh)
      s.sql(s"ALTER TABLE $cname.graft.events_alter " +
        "ALTER COLUMN vcents TYPE BIGINT")
      // the SQL alter ran on its own handle: reopen to continue ingest
      val entry = new MetadataStore(wh).allEntries()
        .find(_.table == "events_alter").get
      val t2 = GraftTable.open(s, s"$wh/events_alter",
        entry.identity, entry.config)
      CdcPipeline.applyBatch(t2, base.where(col("_lsn") >= lo + span)
        .withColumn("vcents", cents(col("value")) + lit(3000000000L))
        .drop("value"))
      s.sql(s"ALTER TABLE $cname.graft.events_alter " +
        "RENAME COLUMN vcents TO value_cents")
      s.sql(s"""SELECT user_id, event_id AS last_event_id, value_cents
               |FROM $cname.graft.events_alter
               |ORDER BY user_id""".stripMargin)
    }),

    "cdc_meta_history" -> ((s, d) => {
      // metadata tables: the manifest history's per-version row
      // accounting (live_rows = sum over files of rows - DV-masked)
      // must match event-sourced truth at EVERY commit point — the
      // oracle recomputes each cut's state from the raw events while
      // Spark answers purely from manifest metadata, no scan.
      val table = runCdc(s, d, deleteType = Some("purchase"), nBatches = 4)
      table.metaHistory.where(col("commit_lsn") >= 0)
        .select(col("commit_lsn"), col("live_rows")).distinct()
        .orderBy("commit_lsn")
    }),

    "cdc_dsv2_read" -> ((s, d) => {
      // DSv2 connector: the same upsert table read back through
      // spark.read.format("graft") — manifest snapshot, reader-side DV
      // skip, column pruning; must equal the library read
      val table = runCdc(s, d, deleteType = None)
      s.read.format("graft").load(table.root)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_point_lookup" -> ((s, d) => {
      // the reference's hash-index point probe surfaced to SQL
      // (persisted_bucket_hash_map.rs:276): after an index merge the
      // bucketed key index carries xxhash64 coverage per file, and a
      // full-key equality scan plans ONLY the data files the index
      // names — at 100 TB a point query touches one index bucket and
      // one data file, not the table. Ten point probes read back
      // through the DSv2 connector.
      val table = runCdc(s, d, deleteType = None)
      table.mergeIndexes()
      val probes = (1 to 10).map(i => i * 7L)
      s.read.format("graft").load(table.root)
        .where(col("user_id").isin(probes: _*))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_inlist_probe" -> ((s, d) => {
      // the reference's index STRESS shape (microbench_index_stress.rs:
      // random probes against a 10M-entry merged index): a ~10k-key IN
      // list (sf-scaled: every 7th event_id) probed through the DSv2
      // index lookup against a merged bucketed index on a table keyed
      // by event_id. The probe hashes the whole key list once, opens
      // only hash-covering index buckets, and plans only the data
      // files the index names — per-probe IO bounded by bucket count,
      // never table size (GraftDataSourceSpec pins the planned-file
      // counts; this entry pins result correctness + bench cost).
      val table = GraftTable.create(s, freshDir("inlist"),
        eventTableSchema, Identity.Keys(Seq("event_id")),
        TableConfig(walEnabled = false))
      val ev = cdcEventFrame(s, d, None)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val mm = ev.agg(min(col("_lsn")), max(col("_lsn"))).head()
        val (lo, hi) = (mm.getLong(0), mm.getLong(1))
        val span = (hi - lo) / 2 + 1
        CdcPipeline.applyBatch(table, ev.where(col("_lsn") < lo + span))
        CdcPipeline.applyBatch(table, ev.where(col("_lsn") >= lo + span))
      } finally ev.unpersist()
      table.mergeIndexes()
      // bounded driver list: ~14k keys at sf0.1, ~1.4k at sf0.01
      val probes = events(s, d).select(col("event_id"))
        .where(col("event_id") % 7 === 0)
        .collect().map(_.getLong(0)).toSeq
      s.read.format("graft").load(table.root)
        .where(col("event_id").isin(probes: _*))
        .select(col("event_id"), col("event_type"),
          cents(col("value")).as("value_cents"))
        .orderBy("event_id")
    }),

    "cdc_delete_stress" -> ((s, d) => {
      // the delete-heavy scale shape (VERDICT r11 #4; reference resolves
      // against its persisted bucket hash map, persisted_bucket_hash_map
      // .rs:276): 4 LSN-range upsert batches, each followed by an index
      // merge, leave a MANY-GENERATION hash-range-bucketed index; then
      //  (1) one batch deletes ~10% of all keys through the DISTRIBUTED
      //      resolution path (threshold lowered so the path is exercised
      //      at every SF — delete keys never reach the driver, the DV
      //      delta aggregates per data file);
      //  (2) an at-least-once REDELIVERY of the slice of those deletes
      //      whose key hashes fall in the lowest tenth of hash space:
      //      state must not change (already-DV'd targets no-op), and the
      //      covering-bucket probe must open only the generations' files
      //      whose khRange intersects the slice — probed/total ≪ 1 is
      //      REQUIRED here, so a pruning regression fails correctness.
      val table = GraftTable.create(s, freshDir("delstress"),
        eventTableSchema, Identity.Keys(Seq("user_id")),
        TableConfig(memSliceSize = 4096, walEnabled = false,
          distributedDeleteThreshold = 1000))
      val ev = cdcEventFrame(s, d, None)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val hi =
        try {
          val mm = ev.agg(min(col("_lsn")), max(col("_lsn"))).head()
          val (lo, hi) = (mm.getLong(0), mm.getLong(1))
          val span = (hi - lo) / 4 + 1
          (0 until 4).foreach { i =>
            CdcPipeline.applyBatch(table, ev.where(
              col("_lsn") >= lo + i * span && col("_lsn") < lo + (i + 1) * span))
            table.mergeIndexes() // each batch becomes its own generation
          }
          hi
        } finally ev.unpersist()
      table.deleteWhere(col("user_id") % 10 === 0) // (1) the 10% purge
      // (2) redelivered deletes, clustered in hash space: xxhash64 is
      // the index's own bucketing hash, so ~10% of the slice's keys
      // cover ~10% of every generation's khRanges
      val hashTenth = Long.MinValue + 1844674407370955161L // 2^64 / 10
      val redelivered = events(s, d).select(col("user_id")).distinct()
        .where(col("user_id") % 10 === 0 &&
          xxhash64(col("user_id")) < hashTenth)
        .select(lit("d").as("_op"), lit(hi + 2).as("_lsn"), col("user_id"),
          lit(null).cast("long").as("event_id"),
          lit(null).cast("string").as("event_type"),
          lit(null).cast("double").as("value"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nRedelivered = redelivered.count()
      CdcPipeline.applyBatch(table, redelivered)
      redelivered.unpersist()
      val (probed, total) = table.lastDeleteProbe
      // guarded on the slice being non-empty: an empty redelivery
      // early-returns and lastDeleteProbe would still hold the purge's
      // full-coverage value — a scale artifact, not a pruning failure
      require(nRedelivered == 0 || total < 8 ||
        probed.toDouble / total <= 0.5,
        s"covering probe opened $probed of $total index buckets")
      table.read(scala.None)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_cached_read" -> ((s, d) => {
      // M16: same upsert table, scan routed through the object-storage
      // cache (read pins local copies; DV filtering keys on preserved
      // basenames) — results must equal the direct read's
      val table = runCdc(s, d, deleteType = None)
      val cache = new graft.storage.ObjectCache(
        graft.storage.CacheConfig(1L << 30, freshDir("cache")))
      table.attachCache(cache)
      table.read(None)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_delete_state" -> ((s, d) => cdcDeleteFinal(s, d, compact = false)),

    "cdc_compact_state" -> ((s, d) => cdcDeleteFinal(s, d, compact = true)),

    "cdc_append_scan" -> ((s, d) => {
      // append-only table: one distributed insert batch (shuffle-free
      // coalesce path of applyBatchDF), then aggregate over the scan
      val table = GraftTable.create(s, freshDir("ao"), eventTableSchema,
        Identity.None, TableConfig(walEnabled = false))
      CdcPipeline.applyBatch(table,
        cdcEventFrame(s, d, None).withColumn("_op", lit("i")))
      table.read(None)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), cents(sum(col("value"))).as("value_cents"))
        .orderBy("event_type")
    }),

    "cdc_stream_source" -> ((s, d) => {
      // the table as a Structured Streaming SOURCE (the readStream
      // half that pairs with the foreachBatch sink side): published
      // manifest versions are the offsets, each micro-batch reads
      // exactly the files its version range added, through the same
      // vectorized DSv2 partitions as the batch scan. AvailableNow
      // drains the two-commit history into a memory sink; the
      // aggregate over the sink must equal the batch read's.
      val table = GraftTable.create(s, freshDir("gss"), eventTableSchema,
        Identity.None, TableConfig(walEnabled = false))
      val ev = cdcEventFrame(s, d, None).withColumn("_op", lit("i"))
      val mm = ev.agg(min(col("_lsn")), max(col("_lsn"))).head()
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val span = (hi - lo) / 2 + 1
      CdcPipeline.applyBatch(table, ev.where(col("_lsn") < lo + span))
      CdcPipeline.applyBatch(table, ev.where(col("_lsn") >= lo + span))
      val qn = "gss_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = s.readStream.format("graft").load(table.root)
        .writeStream.format("memory").queryName(qn)
        .option("checkpointLocation", freshDir("gss_ckpt"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(qn)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), cents(sum(col("value"))).as("value_cents"))
        .orderBy("event_type")
    }),

    "cdc_sql_history" -> ((s, d) => {
      // Delta-style metadata tables through the SQL catalog: the
      // 4-batch CDC history queried as `t$history` — pure SQL over
      // manifest JSON (zero data files opened), same event-sourced
      // live-rows contract as cdc_meta_history.
      val wh = freshDir("wh-hist")
      val cat = GraftCatalog(s, wh)
      val kv = cat.createTable("events_hist", eventTableSchema,
        Identity.Keys(Seq("user_id")), ingestCfg)
      val ev = cdcEventFrame(s, d, Some("purchase"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val mm = ev.agg(min(col("_lsn")), max(col("_lsn"))).head()
        val (lo, hi) = (mm.getLong(0), mm.getLong(1))
        val span = (hi - lo) / 4 + 1
        (0 until 4).foreach { i =>
          CdcPipeline.applyBatch(kv, ev.where(
            col("_lsn") >= lo + i * span && col("_lsn") < lo + (i + 1) * span))
        }
      } finally ev.unpersist()
      val cname = "gc" + math.abs(wh.hashCode).toString
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sources.GraftCatalogPlugin].getName)
      s.conf.set(s"spark.sql.catalog.$cname.warehouse", wh)
      s.sql(s"""SELECT DISTINCT commit_lsn, live_rows
               |FROM $cname.graft.`events_hist$$history`
               |WHERE commit_lsn >= 0
               |ORDER BY commit_lsn""".stripMargin)
    }),

    "cdc_stream_sink" -> ((s, d) => {
      // the table as a Structured Streaming SINK — the writeStream
      // half that closes the DSv2 loop with cdc_stream_source: a
      // 4-file event feed streams INTO an append-only graft table via
      // `writeStream.format("graft")`, each micro-batch epoch
      // committing exactly-once through the manifest's epoch watermark
      // (Manifest.streamEpochs rides the same atomic manifest commit
      // as the data). The final batch read over the table must equal
      // the plain batch aggregate of the feed.
      val feed = streamSourceDir(
        events(s, d).select(col("user_id"), col("event_id"),
          col("event_type"), col("value")),
        n = 4, idCol = "event_id")
      val root = freshDir("gsk")
      GraftTable.create(s, root, eventTableSchema,
        Identity.None, TableConfig(walEnabled = false))
      import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
      withShufflePartitions(s, 4) {
        val q = s.readStream
          .schema(StructType(Seq(
            StructField("user_id", LongType), StructField("event_id", LongType),
            StructField("event_type", StringType), StructField("value", DoubleType))))
          .option("maxFilesPerTrigger", 1).parquet(feed)
          .writeStream.format("graft").option("path", root)
          .option("checkpointLocation", freshDir("gsk_ckpt"))
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // read back through the DSv2 scan: the sink's publishes are
      // manifest commits, visible to any fresh reader
      s.read.format("graft").option("path", root).load()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), cents(sum(col("value"))).as("value_cents"))
        .orderBy("event_type")
    }),

    "cdc_sql_call" -> ((s, d) => {
      // M15's control ops on the SQL surface: Iceberg-style CALL
      // procedures (optimize → compaction, vacuum → reclamation)
      // through the V2 ProcedureCatalog, each returning its metric as
      // a result row; the compacted table must still read the exact
      // upsert fold.
      val wh = freshDir("wh-call")
      val cat = GraftCatalog(s, wh)
      val kv = cat.createTable("events_call", eventTableSchema,
        Identity.Keys(Seq("user_id")), ingestCfg)
      val ev = cdcEventFrame(s, d, None)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val mm = ev.agg(min(col("_lsn")), max(col("_lsn"))).head()
        val (lo, hi) = (mm.getLong(0), mm.getLong(1))
        val span = (hi - lo) / 2 + 1
        (0 until 2).foreach { i =>
          CdcPipeline.applyBatch(kv, ev.where(
            col("_lsn") >= lo + i * span && col("_lsn") < lo + (i + 1) * span))
        }
      } finally ev.unpersist()
      val cname = "gc" + math.abs(wh.hashCode).toString
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sources.GraftCatalogPlugin].getName)
      s.conf.set(s"spark.sql.catalog.$cname.warehouse", wh)
      val opt = s.sql(s"CALL $cname.system.optimize(" +
        "db => 'graft', tbl => 'events_call')").head()
      require(opt.getLong(1) <= opt.getLong(0), "compaction grew the table")
      // a second, bucketed optimize arms the bucket-layout check row
      s.sql(s"CALL $cname.system.optimize(" +
        "db => 'graft', tbl => 'events_call', bucket_by => 8)").collect()
      s.sql(s"CALL $cname.system.vacuum('graft', 'events_call')").collect()
      // system.check must report every integrity row green — including
      // the bucket-layout row the bucketed optimize just made apply
      val ck = s.sql(s"CALL $cname.system.check('graft', 'events_call')")
        .collect()
      require(ck.exists(_.getString(0) == "bucket-layout"),
        "bucket-layout check row missing on a bucketed table")
      require(ck.forall(_.getBoolean(1)),
        s"system.check reported failures: ${ck.mkString("; ")}")
      // dv-stats-currency lifecycle: a fresh SQL DELETE leaves the
      // masked-row accounting stale (aggregate pushdown declines), the
      // check row SURFACES the backlog, and CALL system.refresh_stats
      // heals it — the bucket-layout row's sibling for M15 operators
      s.sql(s"DELETE FROM $cname.graft.events_call WHERE user_id = 3")
      def currency() =
        s.sql(s"CALL $cname.system.check('graft', 'events_call')")
          .collect().find(_.getString(0) == "dv-stats-currency").get
      val stale = currency()
      require(!stale.getBoolean(1) &&
        stale.getString(2).startsWith("stale_files=") &&
        !stale.getString(2).contains("stale_files=0"),
        s"stale accounting must be surfaced: $stale")
      require(s.sql(s"CALL $cname.system.refresh_stats(" +
        "'graft', 'events_call')").head().getLong(0) >= 1L,
        "refresh must fold at least one stale file")
      require(currency().getBoolean(1),
        s"refresh_stats must heal the currency row: ${currency()}")
      s.sql(s"""SELECT user_id, event_id AS last_event_id,
               |       event_type AS last_event_type,
               |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
               |FROM $cname.graft.events_call
               |WHERE user_id <> 3
               |ORDER BY user_id""".stripMargin)
    }),

    "cdc_stream_sink_restart" -> ((s, d) => {
      // sink exactly-once THROUGH a query restart: the same checkpoint
      // drives two AvailableNow runs — the feed grows between them, and
      // Spark's replay of the boundary epoch after restart must no-op
      // against the manifest watermark. Final state == one clean append
      // of the whole feed.
      val prep = streamSourceDir(
        events(s, d).select(col("user_id"), col("event_id"),
          col("event_type"), col("value")),
        n = 4, idCol = "event_id")
      val feed = freshDir("gskr-feed"); graft.format.Fio.mkdirs(feed)
      val parts = new java.io.File(prep).listFiles()
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      val root = freshDir("gskr")
      GraftTable.create(s, root, eventTableSchema,
        Identity.None, TableConfig(walEnabled = false))
      val ckpt = freshDir("gskr_ckpt")
      import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
      val sch = StructType(Seq(
        StructField("user_id", LongType), StructField("event_id", LongType),
        StructField("event_type", StringType), StructField("value", DoubleType)))
      def drain(): Unit = withShufflePartitions(s, 4) {
        val q = s.readStream.schema(sch)
          .option("maxFilesPerTrigger", 1).parquet(feed)
          .writeStream.format("graft").option("path", root)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      parts.take(2).foreach(f => graft.format.Fio.move(
        f.getPath, s"$feed/${f.getName}"))
      drain() // run 1: two files, then the query STOPS
      parts.drop(2).foreach(f => graft.format.Fio.move(
        f.getPath, s"$feed/${f.getName}"))
      drain() // run 2: same checkpoint resumes past the committed epochs
      s.read.format("graft").option("path", root).load()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), cents(sum(col("value"))).as("value_cents"))
        .orderBy("event_type")
    }),

    "cdc_stream_upsert_sink" -> ((s, d) => {
      // the KEYED half of the streaming sink: op-tagged CDC events
      // stream through `option("cdc","true")` into a keyed table —
      // each micro-batch epoch runs the full upsert fold (deletes DV
      // committed versions via the key index) and commits at the
      // source LSN, exactly-once by the manifest epoch watermark.
      // Result must equal the batch upsert fold of the same events.
      val feed = streamSourceDir(
        cdcEventFrame(s, d, None), n = 4, idCol = "_lsn")
      val root = freshDir("gcsk")
      GraftTable.create(s, root, eventTableSchema,
        Identity.Keys(Seq("user_id")), ingestCfg)
      import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
      withShufflePartitions(s, 4) {
        val q = s.readStream
          .schema(StructType(Seq(
            StructField("_op", StringType), StructField("_lsn", LongType),
            StructField("user_id", LongType), StructField("event_id", LongType),
            StructField("event_type", StringType), StructField("value", DoubleType))))
          .option("maxFilesPerTrigger", 1).parquet(feed)
          .writeStream.format("graft")
          .option("path", root).option("cdc", "true")
          .option("checkpointLocation", freshDir("gcsk_ckpt"))
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      s.read.format("graft").option("path", root).load()
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_sql_view" -> ((s, d) => {
      // S12: catalog + temp-view registration — plain spark.sql runs
      // over the live ingested state (the reference serves DuckDB/
      // DataFusion through its RPC catalog; in-process, the catalog
      // registers the union read as a view).
      val cat = GraftCatalog(s, freshDir("cat"))
      cat.createTable("events_state", eventTableSchema,
        Identity.Keys(Seq("user_id")), ingestCfg)
      CdcPipeline.applyBatch(cat.table("events_state"),
        cdcEventFrame(s, d, None))
      cat.registerView("events_state")
      s.sql("""SELECT event_type AS last_event_type,
              |       count(*) AS n_users,
              |       CAST(ROUND(SUM(value)*100) AS BIGINT) AS value_cents
              |FROM events_state GROUP BY 1 ORDER BY 1""".stripMargin)
    }),

    "cdc_streaming_e2e" -> ((s, d) => {
      // S1 as a REAL Structured Streaming query: readStream over the
      // events parquet -> CDC event frame -> CdcPipeline.start
      // (foreachBatch -> applyBatch) with Trigger.AvailableNow ->
      // LSN-gated union read. Exercises the wiring the other cdc_*
      // entries drive directly.
      import org.apache.spark.sql.types._
      val table = GraftTable.create(s, freshDir("se"), eventTableSchema,
        Identity.Keys(Seq("user_id")), ingestCfg)
      val sch = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType)))
      // the file-stream source wants a directory to watch
      val srcDir = java.nio.file.Files.createTempDirectory("graft-se-src")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$d/events.parquet"),
        srcDir.resolve("events.parquet"))
      val stream = s.readStream.schema(sch).parquet(srcDir.toString)
        .select(lit("u").as("_op"), col("event_id").as("_lsn"),
          col("user_id"), col("event_id"), col("event_type"), col("value"))
      val q = graft.streaming.CdcPipeline.start(table, stream,
        checkpoint = freshDir("se-ckpt"),
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination()
      table.read(None)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_initial_copy" -> ((s, d) => {
      // S2: snapshot of an "existing source table" at the boundary LSN
      // (latest row per user), adopted via initial copy; the CDC stream
      // overlaps the copy, so ALL events are buffered and the replay
      // must drop those at-or-below the boundary. Final state must be
      // identical to running the whole stream as upserts.
      val table = GraftTable.create(s, freshDir("ic"), eventTableSchema,
        Identity.Keys(Seq("user_id")), ingestCfg)
      val ev = cdcEventFrame(s, d, None)
      val mm = ev.agg(min(col("_lsn")), max(col("_lsn"))).head()
      val boundary = (mm.getLong(0) + mm.getLong(1)) / 2
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("event_id").desc)
      val snapshot = events(s, d).where(col("event_id") <= boundary)
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      val ic = new graft.streaming.InitialCopy(table, boundary)
      ic.onEvents(ev) // the full stream arrives mid-copy: all buffered
      ic.finish(snapshot)
      table.read(None)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_union_read" -> ((s, d) => {
      // huge mem slice: half the stream flushed manually, half served
      // from the in-memory tail -> exercises the union read (S11)
      val cfg = TableConfig(memSliceSize = Int.MaxValue, walEnabled = false)
      val table = GraftTable.create(s, freshDir("ur"), eventTableSchema,
        Identity.Keys(Seq("user_id")), cfg)
      val evs = orderedEvents(s, d)
      val (h1, h2) = evs.splitAt(evs.length / 2)
      def toUpserts(rs: Array[Row]): Seq[CdcEvent] = rs.toSeq.flatMap { r =>
        CdcEvent.upsert(Row(r.getLong(0), r.getLong(1), r.getString(2),
          r.getDouble(3)), Seq(r.getLong(0)), r.getLong(1))
      }
      table.apply(toUpserts(h1) :+ Commit(h1.last.getLong(1)))
      table.flush() // first half on disk
      table.apply(toUpserts(h2) :+ Commit(h2.last.getLong(1)))
      // second half stays in the tail (no flush): union read must see it
      table.read(Some(h2.last.getLong(1)))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_stream_xact" -> ((s, d) => {
      // M6: the stream routed through 8 interleaved streaming
      // transactions (xact = user_id % 8); xact 3 aborts AFTER staged
      // pre-commit flushes (the mem-slice is sized so every xact stages
      // roughly once regardless of SF), the rest commit at the end —
      // aborted rows must vanish, including rows already staged to
      // parquet (transaction_stream.rs:334).
      val evs = orderedEvents(s, d).filter(_.getLong(0) % 3 == 0)
      val cfg = TableConfig(memSliceSize = math.max(256, evs.length / 8),
        walEnabled = false)
      val table = GraftTable.create(s, freshDir("sx"), eventTableSchema,
        Identity.Keys(Seq("user_id")), cfg)
      val apps: Seq[CdcEvent] = evs.toSeq.map { r =>
        Append(Row(r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)),
          r.getLong(1), Some(r.getLong(0) % 8))
      }
      val maxLsn = evs.map(_.getLong(1)).max
      val ctl: Seq[CdcEvent] = (0L until 8L).map { x =>
        if (x == 3) StreamAbort(x) else Commit(maxLsn + x + 1, Some(x))
      }
      table.apply(apps ++ ctl)
      table.read(None)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), cents(sum(col("value"))).as("value_cents"))
        .orderBy("event_type")
    }),

    "cdc_wal_replay" -> ((s, d) => {
      // M12: ingest through the WAL with flushing disabled, then crash
      // and reopen — every committed-but-unflushed row must replay
      // from the WAL (reference test_wal_recovery.rs).
      val root = freshDir("wal")
      val cfg = TableConfig(memSliceSize = Int.MaxValue, walEnabled = true)
      val t0 = GraftTable.create(s, root, eventTableSchema,
        Identity.Keys(Seq("user_id")), cfg)
      val evs = orderedEvents(s, d).filter(_.getLong(0) % 7 == 0)
      val ups = evs.toSeq.flatMap { r =>
        CdcEvent.upsert(Row(r.getLong(0), r.getLong(1), r.getString(2),
          r.getDouble(3)), Seq(r.getLong(0)), r.getLong(1))
      }
      t0.apply(ups :+ Commit(evs.map(_.getLong(1)).max))
      // t0 is abandoned unflushed; open() replays the WAL into a fresh
      // instance over the same root
      val t = GraftTable.open(s, root, Identity.Keys(Seq("user_id")), cfg)
      t.read(None)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_alter_drop" -> ((s, d) => {
      // M14: distributed upsert ingest, then drop a column; reads must
      // project the survivors only (mooncake_table.rs:616).
      val table = runCdc(s, d, deleteType = None)
      table.alterDropColumns(Seq("event_type"))
      table.read(None)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_index_merge" -> ((s, d) => {
      // M11 driver proof (reference `mooncake_table.rs:1369`,
      // `persisted_bucket_hash_map.rs:525`): micro-batches push the
      // index-file count past indexMergeFileCountThreshold (lowered to
      // 4 so the proof costs 6 batches, not 20) and the auto-
      // consolidation fires mid-ingest; deletes arriving AFTER the
      // merge must resolve through the MERGED index (exact per-row
      // LSNs survive consolidation).
      val table = runCdc(s, d, deleteType = None, nBatches = 5,
        cfg = ingestCfg.copy(indexMergeFileCountThreshold = 4))
      require(table.currentManifest.indexFiles.size < 5,
        s"index merge never fired: ${table.currentManifest.indexFiles.size} files")
      val boundary = events(s, d).agg(max(col("event_id"))).head().getLong(0)
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
      val last = events(s, d)
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      CdcPipeline.applyBatch(table, last
        .where(col("event_type") === "purchase")
        .select(lit("d").as("_op"),
          (lit(boundary) + col("user_id")).as("_lsn"),
          col("user_id"), lit(null).cast("long").as("event_id"),
          lit(null).cast("string").as("event_type"),
          lit(null).cast("double").as("value")))
      table.read(None)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_drop_recreate" -> ((s, d) => {
      // M13 driver proof (reference `table_handler.rs:158-185`):
      // populate a table, DROP it (data, index, DVs, manifests all
      // gone), recreate at the SAME root, re-ingest — no state from
      // the first life may leak into the second.
      val root = freshDir("dr")
      val t0 = GraftTable.create(s, root, eventTableSchema,
        Identity.Keys(Seq("user_id")), ingestCfg)
      CdcPipeline.applyBatch(t0,
        cdcEventFrame(s, d, None).where(col("user_id") % 2 === 0))
      t0.drop()
      require(!graft.format.Fio.exists(s"$root/manifest"),
        "drop must remove the table root")
      val t = GraftTable.create(s, root, eventTableSchema,
        Identity.Keys(Seq("user_id")), ingestCfg)
      CdcPipeline.applyBatch(t, cdcEventFrame(s, d, None))
      t.read(None)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_alter_add" -> ((s, d) => {
      // M14 add-column (reference roadmap, README.md:227) — the
      // RESURRECTION hazard end-to-end: drop event_type, re-add the
      // same name (old files still physically hold the dropped values;
      // the fresh physical mapping must read them as null), then
      // upsert a subset with real values for the re-added column.
      val table = runCdc(s, d, deleteType = None)
      table.alterDropColumns(Seq("event_type"))
      table.alterAddColumn("event_type", "string")
      val boundary = events(s, d).agg(max(col("event_id"))).head().getLong(0)
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
      val ups = events(s, d)
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .where(col("user_id") % 10 === 0)
        .select(lit("u").as("_op"),
          (lit(boundary) + col("user_id")).as("_lsn"),
          col("user_id"), col("event_id"), col("value"),
          lit("readded").as("event_type"))
      CdcPipeline.applyBatch(table, ups)
      table.read(None)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("readded_type"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_pgoutput" -> ((s, d) => {
      // S1 protocol layer end-to-end: the events stream re-encoded as
      // pgoutput BINARY frames (Relation + per-txn Begin/Update*/
      // Commit), decoded by the replication session into xid-tagged
      // CDC events (reference cdc_event.rs:51-128, moonlink_sink.rs:
      // 127-150), applied through the staged-xact machinery. The feed
      // is 1/20th of the stream — a replication slot is one serial
      // connection by nature; the distributed ingest scale path is
      // applyBatchDF, covered by the other cdc_* entries.
      import graft.sources.PgOutput
      val table = GraftTable.create(s, freshDir("pgout"), eventTableSchema,
        Identity.Keys(Seq("user_id")), ingestCfg)
      val rows = events(s, d).where(col("user_id") % 20 === 3)
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
        .orderBy("event_id").collect()
      val sess = new PgOutput.Session("events", Seq("user_id"))
      val relCols = Seq("user_id" -> 20, "event_id" -> 20,
        "event_type" -> 25, "value" -> 701)
      table.apply(sess.onMessage(
        PgOutput.encodeRelation(9001, "public", "events", relCols)))
      var done = 0L
      rows.grouped(math.max(1, rows.length / 4 + 1)).zipWithIndex.foreach {
        case (chunk, i) =>
          done += chunk.length
          val msgs =
            Seq(PgOutput.encodeBegin(done, 100L + i)) ++
            chunk.map(r => PgOutput.encodeUpdate(9001, Seq(
              Some(r.getLong(0).toString), Some(r.getLong(1).toString),
              Option(r.getString(2)),
              Option(r.get(3)).map(_.toString)))) ++
            Seq(PgOutput.encodeCommit(done, done + 1))
          table.apply(msgs.flatMap(sess.onMessage))
      }
      table.read(scala.None).select(col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_pg_socket" -> ((s, d) => {
      // S1 TRANSPORT layer: the same pgoutput frames cdc_pgoutput
      // decodes in-memory travel over an actual TCP replication
      // connection — v3 startup with replication=database,
      // START_REPLICATION as a simple query, copy-both XLogData
      // framing, and keepalive/standby-status acks gating the WAL
      // (reference postgres_source.rs:311 over tokio-postgres).
      // A scripted in-process primary replays the frames; no PG server
      // exists in the sandbox, so the socket layer IS the unit under
      // test, with the protocol+apply layers shared with cdc_pgoutput.
      import graft.sources.{PgMockServer, PgOutput, PgReplicationClient}
      val table = GraftTable.create(s, freshDir("pgsock"), eventTableSchema,
        Identity.Keys(Seq("user_id")), ingestCfg)
      val rows = events(s, d).where(col("user_id") % 20 === 9)
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
        .orderBy("event_id").collect()
      val relCols = Seq("user_id" -> 20, "event_id" -> 20,
        "event_type" -> 25, "value" -> 701)
      // commit LSNs track the cumulative event count (the session
      // numbers DML events serially, and a txn's commit LSN must sit
      // at-or-above its last event — same scheme as cdc_pgoutput)
      var done = 0L
      val frames =
        Seq(PgOutput.encodeRelation(9001, "public", "events", relCols)) ++
        rows.grouped(math.max(1, rows.length / 4 + 1)).zipWithIndex.flatMap {
          case (chunk, i) =>
            done += chunk.length
            Seq(PgOutput.encodeBegin(done, 200L + i)) ++
            chunk.map(r => PgOutput.encodeUpdate(9001, Seq(
              Some(r.getLong(0).toString), Some(r.getLong(1).toString),
              Option(r.getString(2)),
              Option(r.get(3)).map(_.toString)))) ++
            Seq(PgOutput.encodeCommit(done, done + 1))
        }
      val server = new PgMockServer(frames.toSeq).start()
      val sess = new PgOutput.Session("events", Seq("user_id"))
      val client = new PgReplicationClient("127.0.0.1", server.port,
        "graft", "postgres", "graft_slot", "graft_pub")
      val buf = scala.collection.mutable.ArrayBuffer[CdcEvent]()
      client.stream(bytes => buf ++= sess.onMessage(bytes))
      server.join()
      server.error.foreach(e => throw new IllegalStateException(
        s"mock primary failed: $e"))
      require(server.sawReplicationParam, "startup lacked replication=database")
      require(server.sawStartReplication, "no START_REPLICATION issued")
      require(server.statusUpdates.nonEmpty, "no standby acks reached the primary")
      table.apply(buf.toSeq)
      table.read(scala.None).select(col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_pg_mirror" -> ((s, d) => {
      // S2 end to end over the wire, behind the reference's REST verb
      // (`rest_api.rs:410-413` POST /tables/{t}/from_postgres,
      // `clients/postgres.rs`): schema fetched via the catalog query,
      // CREATE_REPLICATION_SLOT .. USE_SNAPSHOT pins the boundary,
      // COPY streams the snapshot inside that slot's transaction, and
      // CDC catch-up STARTS AT the consistent point — so the final
      // state equals the plain last-event-per-user fold regardless of
      // where the snapshot/stream split lands. A scripted primary
      // serves the whole dialogue over one real TCP connection.
      import graft.sources.PgOutput
      import graft.testkit.PgMockPrimary
      val all = events(s, d).where(col("user_id") % 20 === 11)
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
        .orderBy("event_id").collect()
      val (half, rest) = all.splitAt(all.length / 2)
      // the source table's state at the boundary = fold of the first half
      val snapshot = half.groupBy(_.getLong(0)).values
        .map(_.maxBy(_.getLong(1))).toSeq.sortBy(_.getLong(0))
      def vals(r: org.apache.spark.sql.Row): Seq[Option[String]] = Seq(
        Some(r.getLong(0).toString), Some(r.getLong(1).toString),
        Option(r.getString(2)), Option(r.get(3)).map(_.toString))
      val columns = Seq(
        graft.sources.PgColumn("user_id", 20, -1, notNull = true, primary = true),
        graft.sources.PgColumn("event_id", 20, -1, notNull = false, primary = false),
        graft.sources.PgColumn("event_type", 25, -1, notNull = false, primary = false),
        graft.sources.PgColumn("value", 701, -1, notNull = false, primary = false))
      var done = 0L
      val frames =
        Seq(PgOutput.encodeRelation(11, "public", "mirror_src",
          Seq("user_id" -> 20, "event_id" -> 20,
            "event_type" -> 25, "value" -> 701))) ++
        rest.grouped(math.max(1, rest.length / 4 + 1)).zipWithIndex.flatMap {
          case (chunk, i) =>
            done += chunk.length
            Seq(PgOutput.encodeBegin(1000L + done, 300L + i)) ++
            chunk.map(r => PgOutput.encodeUpdate(11, vals(r))) ++
            Seq(PgOutput.encodeCommit(1000L + done, 1001L + done))
        }
      val cat = graft.table.GraftCatalog(s, freshDir("pgmirror-wh"))
      val srv = graft.sources.RestServer.start(cat)
      try {
        val primary = new PgMockPrimary(columns, snapshot.map(vals),
          consistentPoint = 1000L, frames = frames.toSeq).start()
        val conn = java.net.URI.create(
          s"${srv.baseUrl}/tables/mirror/from_postgres").toURL
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setRequestProperty("Content-Type", "application/json")
        conn.setDoOutput(true)
        val body =
          (s"""{"database":"graftdb","table":"mirror",""" +
            s""""src_uri":"postgresql://postgres@127.0.0.1:${primary.port}/postgres",""" +
            s""""src_table_name":"public.mirror_src"}""")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        conn.setFixedLengthStreamingMode(body.length)
        val os = conn.getOutputStream
        try os.write(body) finally os.close()
        require(conn.getResponseCode == 200, s"from_postgres -> ${conn.getResponseCode}")
        conn.getInputStream.close()
        // the catch-up stream applies on its own thread: wait for the
        // final txn's commit LSN, then gate the protocol discipline
        val target = 1000L + rest.length
        val deadline = System.currentTimeMillis() + 60000
        while (cat.table("mirror").commitLsn < target &&
            System.currentTimeMillis() < deadline) Thread.sleep(25)
        require(cat.table("mirror").commitLsn >= target,
          s"catch-up timed out at ${cat.table("mirror").commitLsn} < $target")
        primary.join()
        primary.error.foreach(e => throw new IllegalStateException(
          s"mock primary failed: $e"))
        require(primary.sawSnapshotSlot, "slot must be created USE_SNAPSHOT")
        require(primary.copySentInsideTxn, "COPY must run inside the slot txn")
        require(primary.startedAtLsn == 1000L,
          s"catch-up must start AT the consistent point, got ${primary.startedAtLsn}")
        cat.table("mirror").read(scala.None).select(col("user_id"),
          col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"),
          cents(col("value")).as("value_cents"))
          .orderBy("user_id")
      } finally srv.stop()
    }),

    "cdc_pg_shared" -> ((s, d) => {
      // The r16 SHARED-STREAM architecture end-to-end behind the REST
      // verb (`shared_slot`, the reference's ReplicationManager
      // deployment shape, replication_manager.rs:22-101): TWO source
      // tables mirror over ONE replication connection + ONE slot + ONE
      // publication, the second joining while the first's stream is
      // LIVE — its traffic buffered during its snapshot copy and
      // replayed above the boundary, cross-table transactions
      // interleaved on the wire. Gated in-entry: exactly one
      // CREATE_REPLICATION_SLOT and one START_REPLICATION ever reach
      // the primary, and the one publication carries both tables. The
      // oracle is the plain last-event-per-user fold of BOTH slices.
      import graft.sources.PgOutput
      import graft.testkit.PgMockPrimary
      def slice(rem: Int) = events(s, d).where(col("user_id") % 20 === rem)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"))
        .orderBy("event_id").collect()
      def vals(r: org.apache.spark.sql.Row): Seq[Option[String]] = Seq(
        Some(r.getLong(0).toString), Some(r.getLong(1).toString),
        Option(r.getString(2)), Option(r.get(3)).map(_.toString))
      def fold(rows: Array[org.apache.spark.sql.Row]) =
        rows.groupBy(_.getLong(0)).values
          .map(_.maxBy(_.getLong(1))).toSeq.sortBy(_.getLong(0))
      val columns = Seq(
        graft.sources.PgColumn("user_id", 20, -1, notNull = true, primary = true),
        graft.sources.PgColumn("event_id", 20, -1, notNull = false, primary = false),
        graft.sources.PgColumn("event_type", 25, -1, notNull = false, primary = false),
        graft.sources.PgColumn("value", 701, -1, notNull = false, primary = false))
      val relCols = Seq("user_id" -> 20, "event_id" -> 20,
        "event_type" -> 25, "value" -> 701)
      val (allA, allB) = (slice(11), slice(13))
      val (halfA, restA) = allA.splitAt(allA.length / 2)
      val (halfB, restB) = allB.splitAt(allB.length / 2)
      // interleave each slice's post-boundary updates as alternating
      // transactions — the wire shape a multi-table publication emits
      val chA = restA.grouped(math.max(1, restA.length / 2 + 1)).toSeq
      val chB = restB.grouped(math.max(1, restB.length / 2 + 1)).toSeq
      val ordered = chA.map(c => (11, c)).zipAll(chB.map(c => (12, c)),
          null, null)
        .flatMap { case (x, y) => Seq(Option(x), Option(y)).flatten }
      var done = 0L; var lastA = 1000L; var lastB = 1000L; var xid = 300L
      val dml = ordered.flatMap { case (rel, chunk) =>
        done += chunk.length; xid += 1
        val c = 1000L + done
        if (rel == 11) lastA = c else lastB = c
        Seq(PgOutput.encodeBegin(c, xid)) ++
          chunk.map(r => PgOutput.encodeUpdate(rel, vals(r))) ++
          Seq(PgOutput.encodeCommit(c, c + 1))
      }
      val frames =
        Seq(PgOutput.encodeRelation(11, "public", "src_a", relCols),
          PgOutput.encodeRelation(12, "public", "src_b", relCols)) ++ dml
      val cat = graft.table.GraftCatalog(s, freshDir("pgshared-wh"))
      val srv = graft.sources.RestServer.start(cat)
      try {
        val primary = new PgMockPrimary(columns, fold(halfA).map(vals),
          consistentPoint = 1000L, frames = frames,
          tables = Map(
            "public.src_a" -> (columns, fold(halfA).map(vals)),
            "public.src_b" -> (columns, fold(halfB).map(vals))),
          // hold the whole stream until the SECOND table's snapshot
          // copy runs — its traffic then flows mid-copy (the buffering
          // window), and table A attaches to a genuinely LIVE stream
          // (held open past the last frame like a real primary's)
          pauseAfterFrames = 0,
          releaseOnCopyOf = Some("public.src_b"),
          holdStreamOpen = true).start()
        def create(name: String, srcTable: String): Unit = {
          val conn = java.net.URI.create(
            s"${srv.baseUrl}/tables/$name/from_postgres").toURL
            .openConnection().asInstanceOf[java.net.HttpURLConnection]
          conn.setRequestMethod("POST")
          conn.setRequestProperty("Content-Type", "application/json")
          conn.setDoOutput(true)
          val body =
            (s"""{"database":"graftdb","table":"$name",""" +
              s""""src_uri":"postgresql://postgres@127.0.0.1:${primary.port}/postgres",""" +
              s""""src_table_name":"$srcTable","shared_slot":true}""")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          conn.setFixedLengthStreamingMode(body.length)
          val os = conn.getOutputStream
          try os.write(body) finally os.close()
          require(conn.getResponseCode == 200,
            s"from_postgres($name) -> ${conn.getResponseCode}")
          conn.getInputStream.close()
        }
        create("mirror_a", "public.src_a")
        create("mirror_b", "public.src_b")
        val deadline = System.currentTimeMillis() + 90000
        while ((cat.table("mirror_a").commitLsn < lastA ||
            cat.table("mirror_b").commitLsn < lastB) &&
            System.currentTimeMillis() < deadline) Thread.sleep(25)
        require(cat.table("mirror_a").commitLsn >= lastA &&
          cat.table("mirror_b").commitLsn >= lastB,
          s"catch-up timed out at ${cat.table("mirror_a").commitLsn}/" +
            s"${cat.table("mirror_b").commitLsn} < $lastA/$lastB")
        primary.endStream()
        primary.join()
        primary.error.foreach(e => throw new IllegalStateException(
          s"mock primary failed: $e"))
        // THE architecture gates: one slot, one stream, one publication
        require(primary.createSlotCount == 1,
          s"expected ONE slot create, got ${primary.createSlotCount}")
        require(primary.startedAtLsns == Seq(0L),
          s"expected ONE START_REPLICATION, got ${primary.startedAtLsns}")
        require(primary.publicationTables("graft_pub_postgres") ==
          Set("public.src_a", "public.src_b"),
          s"publication members: ${primary.publicationTables("graft_pub_postgres")}")
        def out(name: String, tag: String) =
          cat.table(name).read(scala.None).select(lit(tag).as("src"),
            col("user_id"), col("event_id").as("last_event_id"),
            col("event_type").as("last_event_type"),
            cents(col("value")).as("value_cents"))
        out("mirror_a", "a").unionByName(out("mirror_b", "b"))
          .orderBy("src", "user_id")
      } finally srv.stop()
    }),

    "cdc_rest_catalog" -> ((s, d) => {
      // S8's catalog half at the protocol level (reference
      // rest_catalog.rs:96-186 speaks the same Apache Iceberg REST
      // spec): every manifest publish swings the catalog's
      // (metadata-location, snapshot-id) pointer through an optimistic
      // assert-ref-snapshot-id commit over REAL HTTP; a deliberately
      // stale commit must 409 and land only after reload-rebase. This
      // entry keeps the pointer on graft manifest versions to isolate
      // the PROTOCOL; cdc_iceberg_commit swings the same CAS across
      // real Iceberg v3 metadata.json snapshots (format/iceberg/).
      import graft.format.RestCatalog
      val srv = new RestCatalog.Server().start()
      try {
        val cat = new RestCatalog.Client(srv.baseUrl)
        cat.createNamespace("wh")
        val table = GraftTable.create(s, freshDir("restcat"),
          eventTableSchema, Identity.Keys(Seq("user_id")), ingestCfg)
        def metaLoc: String =
          f"${table.root}/manifest/v${table.currentManifest.version}%09d.json"
        cat.createTable("wh", "events", metaLoc,
          table.currentManifest.version)
        val ev = cdcEventFrame(s, d, deleteType = Some("view"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val mm = ev.agg(min(col("_lsn")), max(col("_lsn"))).head()
          val (lo, hi) = (mm.getLong(0), mm.getLong(1))
          val span = (hi - lo) / 3 + 1
          (0 until 3).foreach { i =>
            val before = cat.loadTable("wh", "events").snapshotId
            CdcPipeline.applyBatch(table, ev.where(
              col("_lsn") >= lo + i * span && col("_lsn") < lo + (i + 1) * span))
            require(cat.commitTable("wh", "events", before, metaLoc,
              table.currentManifest.version),
              s"catalog commit $i conflicted unexpectedly")
          }
          // a stale writer (still at the FIRST commit's snapshot) must
          // be rejected, then land after reloading the current pointer
          require(!cat.commitTable("wh", "events", 0L, metaLoc,
            table.currentManifest.version + 1), "stale commit must 409")
          val cur = cat.loadTable("wh", "events")
          require(cur.snapshotId == table.currentManifest.version,
            s"catalog ${cur.snapshotId} != table ${table.currentManifest.version}")
        } finally ev.unpersist()
        // the reader's path: resolve the manifest through the catalog
        // pointer, then read the table at exactly that version
        val ref = cat.loadTable("wh", "events")
        require(graft.format.Fio.exists(ref.metadataLocation),
          s"catalog points at a missing manifest: ${ref.metadataLocation}")
        table.readAsOfVersion(ref.snapshotId)
          .select(col("user_id"), col("event_id").as("last_event_id"),
            col("event_type").as("last_event_type"),
            cents(col("value")).as("value_cents"))
          .orderBy("user_id")
      } finally srv.stop()
    }),

    "cdc_iceberg_commit" -> ((s, d) => {
      // S8 closed end-to-end: each publish syncs REAL Iceberg v3
      // metadata — metadata.json + avro manifest-list/manifests +
      // puffin deletion-vector blobs (reference
      // iceberg_table_syncer.rs:230,488 and deletion_vector.rs:29) —
      // and swings the REST catalog pointer through the optimistic CAS
      // commit. The returned frame is reconstructed ONLY by the spec
      // parsers (metadata.json -> manifest list -> manifests -> puffin
      // DVs -> plain parquet scan + row_index mask): the graft engine
      // plays no part in the read, which is what Iceberg interop means.
      import graft.format.RestCatalog
      import graft.format.iceberg.IcebergSync
      val srv = new RestCatalog.Server().start()
      try {
        val cat = new RestCatalog.Client(srv.baseUrl)
        cat.createNamespace("wh")
        val table = GraftTable.create(s, freshDir("icecommit"),
          eventTableSchema, Identity.Keys(Seq("user_id")), ingestCfg)
        val r0 = IcebergSync.sync(table.root, table.currentManifest)
        cat.createTable("wh", "events", r0.metadataPath, r0.snapshotId)
        val ev = cdcEventFrame(s, d, deleteType = Some("view"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val mm = ev.agg(min(col("_lsn")), max(col("_lsn"))).head()
          val (lo, hi) = (mm.getLong(0), mm.getLong(1))
          val span = (hi - lo) / 3 + 1
          (0 until 3).foreach { i =>
            val before = cat.loadTable("wh", "events").snapshotId
            CdcPipeline.applyBatch(table, ev.where(
              col("_lsn") >= lo + i * span && col("_lsn") < lo + (i + 1) * span))
            val r = IcebergSync.sync(table.root, table.currentManifest)
            require(cat.commitTable("wh", "events", before, r.metadataPath,
              r.snapshotId), s"iceberg catalog commit $i conflicted")
          }
        } finally ev.unpersist()
        // retention parity (VERDICT r11 #7): expiring the graft manifest
        // log ALSO bounds the exported Iceberg history — snapshots drop
        // to the horizon and files exclusive to dropped snapshots are
        // reclaimed. The read below goes through the PRUNED metadata via
        // the spec parsers alone, so the oracle also proves expiry kept
        // the surviving snapshot intact.
        val before = cat.loadTable("wh", "events").snapshotId
        table.expireVersions(keepLast = 1)
        val prunedPath = IcebergSync.currentMetadataPath(table.root)
          .getOrElse(sys.error("iceberg export vanished after expiry"))
        val pruned = graft.format.iceberg.IcebergMeta.parseMetadataJson(
          graft.format.Fio.readString(prunedPath))
        require(pruned.snapshots.size == 1,
          s"expiry left ${pruned.snapshots.size} iceberg snapshots")
        require(pruned.snapshots.head.snapshotId == before,
          "expiry must keep the LATEST snapshot")
        // catalog parity: CAS the pointer onto the pruned history
        require(cat.commitTable("wh", "events", before, prunedPath, before),
          "catalog CAS onto pruned metadata conflicted")
        val ref = cat.loadTable("wh", "events")
        IcebergSync.readDataFrame(s, ref.metadataLocation)
          .select(col("user_id"), col("event_id").as("last_event_id"),
            col("event_type").as("last_event_type"),
            cents(col("value")).as("value_cents"))
          .orderBy("user_id")
      } finally srv.stop()
    }),

    "cdc_catalog_recovery" -> ((s, d) => {
      // durable table registry + startup recovery (reference
      // moonlink_metadata_store `base_metadata_store.rs:30-68` +
      // backend `recovery_utils.rs:120-170`): tables created through
      // the catalog are recorded in the warehouse's metadata store;
      // after a simulated process restart a FRESH catalog instance
      // recovers every registered table from durable state alone
      // (registry + manifest log) and re-registers its SQL view — the
      // final query runs over plain spark.sql against the RECOVERED
      // catalog, no handle from before the "crash" survives.
      val wh = freshDir("wh-rec")
      val cat = GraftCatalog(s, wh)
      val kv = cat.createTable("ev_kv_rec", eventTableSchema,
        Identity.Keys(Seq("user_id")), ingestCfg,
        srcUri = "postgres://demo/db")
      val lg = cat.createTable("ev_log_rec", eventTableSchema,
        Identity.None, TableConfig(walEnabled = false))
      val ev = cdcEventFrame(s, d, None)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val mm = ev.agg(min(col("_lsn")), max(col("_lsn"))).head()
        val (lo, hi) = (mm.getLong(0), mm.getLong(1))
        val span = (hi - lo) / 2 + 1
        (0 until 2).foreach { i =>
          CdcPipeline.applyBatch(kv, ev.where(
            col("_lsn") >= lo + i * span && col("_lsn") < lo + (i + 1) * span))
        }
        // the second table exists to prove MULTI-table recovery; a
        // subset ingest carries that proof at a fraction of the cost
        CdcPipeline.applyBatch(lg, ev.where(col("user_id") % 4 === 1)
          .withColumn("_op", lit("i")))
      } finally ev.unpersist()
      val (commitBefore, cardBefore) = (kv.commitLsn, kv.liveRowCount)
      // ---- "restart": recover a brand-new catalog over the warehouse
      val (cat2, missing) = GraftCatalog.recover(s, wh)
      require(missing.isEmpty && cat2.list.toSet ==
        Set("ev_kv_rec", "ev_log_rec"),
        s"recovery lost tables: ${cat2.list} (missing=$missing)")
      require(cat2.table("ev_kv_rec").commitLsn == commitBefore &&
        cat2.table("ev_kv_rec").liveRowCount == cardBefore,
        "recovered table state diverged from pre-restart state")
      s.sql("""SELECT user_id, event_id AS last_event_id,
              |       event_type AS last_event_type,
              |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
              |FROM ev_kv_rec ORDER BY user_id""".stripMargin)
    }),

    "cdc_table_status" -> ((s, d) => {
      // reference table_status.rs:5-18: per-table (commit LSN, flush
      // LSN, cardinality) introspection. Cardinality comes from the
      // manifest's file-level row accounting (rows minus DV-masked) —
      // O(manifest) driver metadata, no data scan — so the upsert
      // table must report DISTINCT users while the append-only log
      // reports every event, both at the stream's final LSN.
      val wh = freshDir("wh-st")
      val cat = GraftCatalog(s, wh)
      val kv = cat.createTable("ev_kv_st", eventTableSchema,
        Identity.Keys(Seq("user_id")), ingestCfg)
      val lg = cat.createTable("ev_log_st", eventTableSchema,
        Identity.None, TableConfig(walEnabled = false))
      val ev = cdcEventFrame(s, d, None)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val mm = ev.agg(min(col("_lsn")), max(col("_lsn"))).head()
        val (lo, hi) = (mm.getLong(0), mm.getLong(1))
        val span = (hi - lo) / 2 + 1
        (0 until 2).foreach { i =>
          CdcPipeline.applyBatch(kv, ev.where(
            col("_lsn") >= lo + i * span && col("_lsn") < lo + (i + 1) * span))
        }
        CdcPipeline.applyBatch(lg, ev.withColumn("_op", lit("i")))
      } finally ev.unpersist()
      cat.statusAll
        .select(col("database"), col("table").as("table_name"),
          col("commit_lsn"), col("flush_lsn"), col("cardinality"))
        .orderBy("table_name")
    }),

    "cdc_expire_versions" -> ((s, d) => {
      // retention lifecycle (Iceberg expire-snapshots semantics): a
      // 4-batch ingest builds a manifest history; expireVersions
      // bounds the LOG (metadata only — one commit per micro-batch is
      // ~30M JSONs/year at 1 s batches, so this runs on the
      // maintenance cadence at scale), and the retention-aware vacuum
      // (retainVersions=2) reclaims files outside the horizon while
      // every version INSIDE it stays re-materializable after the GC.
      val cfg = TableConfig(memSliceSize = 4096, walEnabled = false,
        retainVersions = 2)
      val table = runCdc(s, d, deleteType = None, nBatches = 4, cfg = cfg)
      val root = table.root
      val before = graft.format.ManifestLog.versions(root)
      require(before.size >= 4, s"expected >=4 versions, got $before")
      val expired = table.expireVersions(keepLast = 3)
      require(expired == before.size - 3, s"expired $expired")
      val kept = graft.format.ManifestLog.versions(root)
      require(kept == before.takeRight(3), s"kept $kept")
      // an expired version's manifest is gone — loading it fails loudly
      require(scala.util.Try(
        graft.format.ManifestLog.load(root, before.head)).isFailure,
        "expired manifest must not load")
      table.vacuum()
      // both horizon versions re-materialize AFTER vacuum; the one
      // outside the horizon lost its exclusive files by contract
      val horizon = kept.takeRight(2)
      val users = table.liveRowCount
      horizon.foreach { v =>
        require(table.readAsOfVersion(v).count() == users,
          s"version $v unreadable after retention vacuum")
      }
      table.read(scala.None)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_catalog_sql" -> ((s, d) => {
      // the reference's DataFusion catalog/schema providers
      // (moonlink_datafusion/src/catalog_provider.rs) as a Spark V2
      // TableCatalog: the warehouse registers as a catalog and the
      // final answer is PURE three-part-name SQL — no temp views, no
      // handles — resolved through the metadata-store registry into
      // the DSv2 vectorized scan (DV skipping, manifest pruning).
      val wh = freshDir("wh-sql")
      val cat = GraftCatalog(s, wh)
      val kv = cat.createTable("events_sql", eventTableSchema,
        Identity.Keys(Seq("user_id")), ingestCfg)
      val ev = cdcEventFrame(s, d, None)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val mm = ev.agg(min(col("_lsn")), max(col("_lsn"))).head()
        val (lo, hi) = (mm.getLong(0), mm.getLong(1))
        val span = (hi - lo) / 2 + 1
        (0 until 2).foreach { i =>
          CdcPipeline.applyBatch(kv, ev.where(
            col("_lsn") >= lo + i * span && col("_lsn") < lo + (i + 1) * span))
        }
      } finally ev.unpersist()
      // catalog name keyed to the warehouse: Spark caches catalog
      // instances per name, so reruns in one session must not collide
      val cname = "gc" + math.abs(wh.hashCode).toString
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sources.GraftCatalogPlugin].getName)
      s.conf.set(s"spark.sql.catalog.$cname.warehouse", wh)
      s.sql(s"""SELECT user_id, event_id AS last_event_id,
               |       event_type AS last_event_type,
               |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
               |FROM $cname.graft.events_sql
               |WHERE user_id % 4 = 1
               |ORDER BY user_id""".stripMargin)
    }),

    "cdc_sql_insert" -> ((s, d) => {
      // the append half of the SQL surface: CREATE TABLE (DDL through
      // the V2 catalog) then INSERT INTO ... SELECT — executors write
      // the staged parquet with Spark's normal distributed write, the
      // driver commit ADOPTS the part files into the manifest at one
      // LSN (the S7 bulk-load path; driver touches metadata only).
      // Two inserts = two atomic manifest commits; the aggregate reads
      // back through the same catalog's vectorized scan.
      val wh = freshDir("wh-ins")
      val cname = "gc" + math.abs(wh.hashCode).toString
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sources.GraftCatalogPlugin].getName)
      s.conf.set(s"spark.sql.catalog.$cname.warehouse", wh)
      s.sql(s"CREATE TABLE $cname.graft.ev_ins (user_id BIGINT, " +
        "event_id BIGINT, event_type STRING, value DOUBLE)")
      events(s, d).createOrReplaceTempView("ev_src_ins")
      s.sql(s"""INSERT INTO $cname.graft.ev_ins
               |SELECT user_id, event_id, event_type, value
               |FROM ev_src_ins WHERE user_id % 2 = 0""".stripMargin)
      s.sql(s"""INSERT INTO $cname.graft.ev_ins
               |SELECT user_id, event_id, event_type, value
               |FROM ev_src_ins WHERE user_id % 2 = 1""".stripMargin)
      s.sql(s"""SELECT event_type, count(*) AS n,
               |       CAST(ROUND(SUM(value)*100) AS BIGINT) AS value_cents
               |FROM $cname.graft.ev_ins GROUP BY 1 ORDER BY 1""".stripMargin)
    }),

    "cdc_sql_overwrite" -> ((s, d) => {
      // the SQL write surface beyond plain INSERT: CTAS (create + adopt
      // in one statement), TRUNCATE TABLE (one metadata-only commit —
      // the file set empties, history stays time-travelable), and
      // INSERT OVERWRITE (truncate + append committed as ONE manifest
      // version, so no reader observes the empty middle). The flow is
      // built so each verb's failure would corrupt the final content:
      // CTAS seeds %4=0, INSERT adds %4=3, TRUNCATE drops both (a
      // silent no-op would leak them), INSERT lands %4=1, OVERWRITE
      // replaces it with %4=2 (an append-not-replace would double the
      // later %4=1), INSERT adds %4=1 back. Final state: %4 ∈ {1,2}.
      val wh = freshDir("wh-ow")
      val cname = "gc" + math.abs(wh.hashCode).toString
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sources.GraftCatalogPlugin].getName)
      s.conf.set(s"spark.sql.catalog.$cname.warehouse", wh)
      events(s, d).createOrReplaceTempView("ev_src_ow")
      def slice(m: Long) =
        s"SELECT user_id, event_id, value FROM ev_src_ow WHERE user_id % 4 = $m"
      s.sql(s"CREATE TABLE $cname.graft.ev_ow AS ${slice(0)}")
      s.sql(s"INSERT INTO $cname.graft.ev_ow ${slice(3)}")
      s.sql(s"TRUNCATE TABLE $cname.graft.ev_ow")
      s.sql(s"INSERT INTO $cname.graft.ev_ow ${slice(1)}")
      s.sql(s"INSERT OVERWRITE $cname.graft.ev_ow ${slice(2)}")
      s.sql(s"INSERT INTO $cname.graft.ev_ow ${slice(1)}")
      s.sql(s"""SELECT user_id, count(*) AS n,
               |       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT)
               |         AS value_cents
               |FROM $cname.graft.ev_ow GROUP BY 1 ORDER BY 1""".stripMargin)
    }),

    "cdc_sql_delete" -> ((s, d) => {
      // SQL DELETE FROM through the V2 catalog (SupportsDelete): Spark
      // hands the WHERE clause as source filters, the table translates
      // them back to the CDC predicate-delete path — matched rows
      // become delete events whose old versions are DV-masked via the
      // key index. O(matched), no data file rewritten; the follow-up
      // read resolves the new manifest through the same catalog.
      val wh = freshDir("wh-del")
      val cat = GraftCatalog(s, wh)
      val kv = cat.createTable("events_del", eventTableSchema,
        Identity.Keys(Seq("user_id")), ingestCfg)
      val ev = cdcEventFrame(s, d, None)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val mm = ev.agg(min(col("_lsn")), max(col("_lsn"))).head()
        val (lo, hi) = (mm.getLong(0), mm.getLong(1))
        val span = (hi - lo) / 2 + 1
        (0 until 2).foreach { i =>
          CdcPipeline.applyBatch(kv, ev.where(
            col("_lsn") >= lo + i * span && col("_lsn") < lo + (i + 1) * span))
        }
      } finally ev.unpersist()
      val cname = "gc" + math.abs(wh.hashCode).toString
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sources.GraftCatalogPlugin].getName)
      s.conf.set(s"spark.sql.catalog.$cname.warehouse", wh)
      s.sql(s"DELETE FROM $cname.graft.events_del " +
        "WHERE value < 150.0 OR event_type = 'purchase'")
      s.sql(s"""SELECT user_id, event_id AS last_event_id,
               |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
               |FROM $cname.graft.events_del
               |ORDER BY user_id""".stripMargin)
    }),

    "cdc_sql_update" -> ((s, d) => {
      // SQL UPDATE via the delta-based row-level operation API
      // (SupportsRowLevelOperations + SupportsDelta): Spark computes
      // the matched delta, executors stage it as CDC "u" events, ONE
      // batch commit DVs the old versions via the key index and
      // appends the new rows — merge-on-read, the SQL twin of
      // cdc_update_where (copy-on-write would rewrite whole files).
      val wh = freshDir("wh-upd")
      val cat = GraftCatalog(s, wh)
      val kv = cat.createTable("events_upd", eventTableSchema,
        Identity.Keys(Seq("user_id")), ingestCfg)
      CdcPipeline.applyBatch(kv, cdcEventFrame(s, d, None))
      val cname = "gc" + math.abs(wh.hashCode).toString
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sources.GraftCatalogPlugin].getName)
      s.conf.set(s"spark.sql.catalog.$cname.warehouse", wh)
      s.sql(s"UPDATE $cname.graft.events_upd " +
        "SET value = value * 2.0, event_type = 'click2x' " +
        "WHERE event_type = 'click'")
      s.sql(s"""SELECT user_id, event_id AS last_event_id,
               |       event_type AS last_event_type,
               |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
               |FROM $cname.graft.events_upd
               |ORDER BY user_id""".stripMargin)
    }),

    "cdc_sql_merge" -> ((s, d) => {
      // SQL MERGE INTO through the same delta path: one statement's
      // delete + update + insert branches land as ONE CDC batch commit
      // (one LSN, one manifest version). Matched users with an even
      // event count drop, the rest re-value to their event count, and
      // a shifted-id slice inserts as brand-new keys.
      val wh = freshDir("wh-mrg")
      val cat = GraftCatalog(s, wh)
      val kv = cat.createTable("events_mrg", eventTableSchema,
        Identity.Keys(Seq("user_id")), ingestCfg)
      CdcPipeline.applyBatch(kv, cdcEventFrame(s, d, None))
      val cname = "gc" + math.abs(wh.hashCode).toString
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sources.GraftCatalogPlugin].getName)
      s.conf.set(s"spark.sql.catalog.$cname.warehouse", wh)
      events(s, d).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"))
        .createOrReplaceTempView("ev_src_mrg")
      s.sql(
        s"""MERGE INTO $cname.graft.events_mrg t
           |USING (SELECT user_id, n FROM ev_src_mrg WHERE user_id % 3 = 0
           |       UNION ALL
           |       SELECT user_id + 100000 AS user_id, n
           |       FROM ev_src_mrg WHERE user_id % 3 = 1) s
           |ON t.user_id = s.user_id
           |WHEN MATCHED AND s.n % 2 = 0 THEN DELETE
           |WHEN MATCHED THEN UPDATE
           |  SET value = CAST(s.n AS DOUBLE), event_type = 'merged'
           |WHEN NOT MATCHED THEN INSERT (user_id, event_id, event_type, value)
           |  VALUES (s.user_id, s.n, 'inserted', CAST(s.n AS DOUBLE))
           |""".stripMargin)
      s.sql(s"""SELECT user_id, event_id AS last_event_id,
               |       event_type AS last_event_type,
               |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
               |FROM $cname.graft.events_mrg
               |ORDER BY user_id""".stripMargin)
    }),

    "cdc_sql_time_travel" -> ((s, d) => {
      // M8's time-travel axis through idiomatic Spark SQL: the V2
      // catalog implements loadTable(ident, version), so
      // `VERSION AS OF v` pins the scan to version v's manifest (files
      // + DVs of that commit, nothing newer). Pinning the version
      // published after batch 1 of 2 must reproduce the first half's
      // upsert fold exactly, while the unpinned read sees both.
      val wh = freshDir("wh-tt")
      val cat = GraftCatalog(s, wh)
      val kv = cat.createTable("events_tt", eventTableSchema,
        Identity.Keys(Seq("user_id")), ingestCfg)
      val ev = cdcEventFrame(s, d, None)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val v1 =
        try {
          val mm = ev.agg(min(col("_lsn")), max(col("_lsn"))).head()
          val (lo, hi) = (mm.getLong(0), mm.getLong(1))
          val span = (hi - lo) / 2 + 1
          CdcPipeline.applyBatch(kv, ev.where(col("_lsn") < lo + span))
          val mid = kv.currentManifest.version
          CdcPipeline.applyBatch(kv, ev.where(col("_lsn") >= lo + span))
          mid
        } finally { ev.unpersist(); }
      val cname = "gc" + math.abs(wh.hashCode).toString
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sources.GraftCatalogPlugin].getName)
      s.conf.set(s"spark.sql.catalog.$cname.warehouse", wh)
      require(v1 < kv.currentManifest.version,
        "batch 2 must have produced newer versions than the pin")
      s.sql(s"""SELECT user_id, event_id AS last_event_id,
               |       event_type AS last_event_type,
               |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
               |FROM $cname.graft.events_tt VERSION AS OF $v1
               |ORDER BY user_id""".stripMargin)
    }),

    "cdc_chaos_recovery" -> ((s, d) => {
      // the chaos filesystem wrapper made driver-visible (reference
      // filesystem_accessor_chaos_wrapper.rs + chaos_generator.rs
      // inject storage errors under every accessor op; spec'd at
      // random seeds in ChaosSpec): a DETERMINISTIC injector fails
      // every 13th mutating storage op — tmp writes, rename-commits,
      // moves, deletes — while the events subset ingests in 8 batches.
      // Each injected crash reopens the table from durable state (WAL
      // replay + orphan sweep) and re-applies the failed batch at
      // fresh LSNs (the upsert fold is key-idempotent under
      // re-application, so stale uncommitted replays cannot survive).
      // Wherever the faults land, the final state must equal the clean
      // upsert fold — that location-independence IS the invariant.
      val cfg = TableConfig(memSliceSize = 256, walEnabled = true)
      val root = freshDir("chaos-e2e")
      var table = GraftTable.create(s, root, eventTableSchema,
        Identity.Keys(Seq("user_id")), cfg)
      val rows = events(s, d).where(col("user_id") % 10 === 7)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"))
        .orderBy("event_id").collect()
      final class EveryNth(n: Int) extends graft.format.FioFaults {
        var count = 0; var crashes = 0
        @volatile var armed = true
        override def beforeOp(op: String, path: String): Unit =
          if (armed) {
            count += 1
            if (count % n == 0)
              throw new java.io.IOException(s"injected fault: $op $path")
          }
      }
      def isInjected(e: Throwable): Boolean = {
        var t: Throwable = e
        while (t != null) {
          if (t.isInstanceOf[java.io.IOException] && t.getMessage != null &&
              t.getMessage.startsWith("injected fault")) return true
          t = t.getCause
        }
        false
      }
      val faults = new EveryNth(13)
      graft.format.Fio.faults = faults
      try {
        var lsn = 1L
        val nb = 8
        val per = math.max(1, (rows.length + nb - 1) / nb)
        rows.grouped(per).foreach { batch =>
          var done = false
          while (!done) {
            val start = lsn
            try {
              table.upsertAll(batch.toSeq, startLsn = start)
              lsn = start + batch.length + 1
              done = true
            } catch {
              case e: Throwable if isInjected(e) =>
                faults.crashes += 1
                faults.armed = false // recovery itself runs fault-free
                table = GraftTable.open(s, root,
                  Identity.Keys(Seq("user_id")), cfg)
                // batch commits are atomic: either the whole batch's
                // commit landed (crash after durability) or none of it
                // did. Either way the attempt's LSN range is burned —
                // a retry uses strictly later LSNs so its delete-halves
                // outrank any stale uncommitted replay of the failed
                // attempt (deletes target strictly-earlier LSNs only)
                if (table.commitLsn >= start + batch.length) done = true
                lsn = start + batch.length + 1
                faults.armed = true
            }
          }
        }
        faults.armed = false
        require(faults.crashes > 0,
          s"chaos never fired (ops seen: ${faults.count})")
        // final read from a FRESH open — durable state only
        table = GraftTable.open(s, root, Identity.Keys(Seq("user_id")), cfg)
      } finally graft.format.Fio.faults = null
      table.read(scala.None)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_delta_commit" -> ((s, d) => {
      // S9 closed at the format level: the committed table exports a
      // spec-conformant Delta transaction log (_delta_log/%020d.json,
      // protocol v1/v2, metaData, add/remove diffs with stats) that an
      // independent replay parser reconstructs with no graft-engine
      // involvement — the reference feature-gates this sink behind an
      // optional jar (deltalake_table_manager.rs); here the LOG FORMAT
      // itself is written, like the Iceberg layer, dependency-free.
      // DVs materialize via forced compaction before each export, so
      // every exported file is wholly live (reader-v1 compatible).
      import graft.format.delta.DeltaLog
      val table = GraftTable.create(s, freshDir("deltacommit"),
        eventTableSchema, Identity.Keys(Seq("user_id")), ingestCfg)
      val ev = cdcEventFrame(s, d, deleteType = Some("view"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val mm = ev.agg(min(col("_lsn")), max(col("_lsn"))).head()
        val (lo, hi) = (mm.getLong(0), mm.getLong(1))
        val mid = lo + (hi - lo) / 2
        CdcPipeline.applyBatch(table, ev.where(col("_lsn") <= mid))
        table.optimize() // materialize DVs -> wholly-live files
        require(DeltaLog.sync(table.root, table.currentManifest) == 0L)
        CdcPipeline.applyBatch(table, ev.where(col("_lsn") > mid))
        table.optimize()
        // second export: the compaction swap lands as add+remove diffs
        require(DeltaLog.sync(table.root, table.currentManifest) == 1L)
        DeltaLog.readDataFrame(s, table.root)
          .select(col("user_id"), col("event_id").as("last_event_id"),
            col("event_type").as("last_event_type"),
            cents(col("value")).as("value_cents"))
          .orderBy("user_id")
      } finally ev.unpersist()
    }),

    "cdc_iceberg_restore" -> ((s, d) => {
      // the loader half of S8 (reference iceberg_table_loader.rs
      // load_snapshot_from_table_impl): after a disaster that destroys
      // the engine's OWN metadata (manifest log + DV sidecars), the
      // table rebuilds from its Iceberg export alone — data manifests,
      // puffin DV blobs, index pointer blobs, LSN watermarks from the
      // snapshot summary — and keeps ingesting through the recovered
      // index. The oracle is the same clean fold: recovery must be
      // invisible in the data.
      import graft.format.iceberg.IcebergSync
      val table = GraftTable.create(s, freshDir("icerestore"),
        eventTableSchema, Identity.Keys(Seq("user_id")), ingestCfg)
      val ev = cdcEventFrame(s, d, deleteType = Some("view"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val root = table.root
      try {
        val mm = ev.agg(min(col("_lsn")), max(col("_lsn"))).head()
        val (lo, hi) = (mm.getLong(0), mm.getLong(1))
        val mid = lo + (hi - lo) / 2
        // first half ingests and exports to Iceberg
        CdcPipeline.applyBatch(table, ev.where(col("_lsn") <= mid))
        IcebergSync.sync(root, table.currentManifest)
        // disaster: the graft manifest log and DV sidecars are gone
        graft.format.Fio.delete(s"$root/manifest")
        graft.format.Fio.delete(s"$root/dv")
        graft.format.Fio.delete(s"$root/wal")
        IcebergSync.importManifest(root)
        // second half ingests THROUGH the recovered table: deletes
        // resolve against the recovered key index into fresh DVs
        val t2 = GraftTable.open(s, root, Identity.Keys(Seq("user_id")),
          ingestCfg)
        CdcPipeline.applyBatch(t2, ev.where(col("_lsn") > mid))
        t2.read(scala.None)
          .select(col("user_id"), col("event_id").as("last_event_id"),
            col("event_type").as("last_event_type"),
            cents(col("value")).as("value_cents"))
          .orderBy("user_id")
      } finally ev.unpersist()
    }),

    "cdc_chaos_sql" -> ((s, d) => {
      // the every-Nth-op fault schedule extended through the SQL
      // mutation surface (WriteDelta staging + one-batch commit) and
      // the streaming-sink epoch commit. Exactly-once on BOTH failure
      // halves: a crash BEFORE the manifest publish leaves no trace
      // (the durable commit LSN is unchanged, the retry re-applies); a
      // crash AFTER it is detected by the advanced durable LSN / epoch
      // watermark, so the retry is skipped and nothing applies twice.
      // Wherever the faults land, the final state must equal the clean
      // fold + mutations — the same location-independence invariant as
      // cdc_chaos_recovery, now over the SQL verbs.
      val wh = freshDir("wh-chsql")
      val cat = GraftCatalog(s, wh)
      val kv = cat.createTable("events_chaos", eventTableSchema,
        Identity.Keys(Seq("user_id")), ingestCfg)
      CdcPipeline.applyBatch(kv,
        cdcEventFrame(s, d, None).where(col("user_id") % 10 === 3))
      val root = s"$wh/events_chaos"
      val cname = "gc" + math.abs(wh.hashCode).toString
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sources.GraftCatalogPlugin].getName)
      s.conf.set(s"spark.sql.catalog.$cname.warehouse", wh)
      // targeted injector for the two failure halves: "pre" crashes the
      // FIRST storage write of the statement (before any durability);
      // "post" crashes the first cleanup delete/move AFTER the manifest
      // commit-rename (the statement IS durable, the crash hits its
      // cleanup tail — the redelivery/retry shape a real crash leaves)
      final class HalfFault extends graft.format.FioFaults {
        @volatile var mode: String = "off"
        @volatile var fired = false
        @volatile private var sawManifestCommit = false
        var crashes = 0
        def arm(m: String): Unit = { mode = m; fired = false
          sawManifestCommit = false }
        override def beforeOp(op: String, path: String): Unit = mode match {
          case "pre" =>
            if (!fired && op == "write") {
              fired = true; crashes += 1
              throw new java.io.IOException(s"injected fault: $op $path")
            }
          case "post" =>
            if (op == "commit-rename" && path.contains("/manifest/"))
              sawManifestCommit = true
            else if (!fired && sawManifestCommit &&
                (op == "delete" || op == "move")) {
              fired = true; crashes += 1
              throw new java.io.IOException(s"injected fault: $op $path")
            }
          case _ => ()
        }
      }
      def isInjected(e: Throwable): Boolean = {
        var t: Throwable = e
        while (t != null) {
          if (t.isInstanceOf[java.io.IOException] && t.getMessage != null &&
              t.getMessage.startsWith("injected fault")) return true
          t = t.getCause
        }
        false
      }
      val faults = new HalfFault
      def durableLsn: Long = graft.format.ManifestLog.loadLatest(root)
        .map(_.commitLsn).getOrElse(-1L)
      // run one mutation under a chosen failure half, exactly once:
      // pre-half must leave NO durable trace (then a clean retry
      // applies); post-half must BE durable (so no retry happens)
      def mutateOnce(half: String, sql: String): Unit = {
        val before = durableLsn
        faults.arm(half)
        val failed =
          try { s.sql(sql); false }
          catch { case e: Throwable if isInjected(e) => true }
        val fired = faults.fired // arm("off") resets the flag
        faults.arm("off")
        if (half == "pre") {
          require(failed && durableLsn == before,
            s"pre-publish crash must leave no durable trace: $sql")
          s.sql(sql) // clean retry applies exactly once
          require(durableLsn > before, s"retry did not land: $sql")
        } else {
          require(fired, s"post fault never fired: $sql")
          require(durableLsn > before,
            s"post-publish crash must already be durable: $sql")
          // no retry: the statement landed; retrying would double-apply
        }
      }
      graft.format.Fio.faults = faults
      try {
        // SQL half: two UPDATEs (+10 lands exactly once per user —
        // the seeded ids are all odd, so % 4 buckets 1/3 partition
        // them), one per failure half, and a MERGE delete of every
        // 7th user crashed post-publish
        Seq(1 -> "pre", 3 -> "post").foreach { case (b, half) =>
          mutateOnce(half, s"UPDATE $cname.graft.events_chaos " +
            s"SET value = value + 10 WHERE user_id % 4 = $b")
        }
        mutateOnce("post", s"MERGE INTO $cname.graft.events_chaos t USING " +
          s"(SELECT user_id FROM $cname.graft.events_chaos " +
          "WHERE user_id % 7 = 0) m ON t.user_id = m.user_id " +
          "WHEN MATCHED THEN DELETE")
        // streaming half: a CDC epoch crashed pre-durability retries on
        // the SAME handle and applies exactly once (the in-memory
        // watermark resyncs from the durable manifest); then a
        // REDELIVERED epoch against a fresh handle — the post-commit
        // crash shape, where Spark re-offers the epoch after restart —
        // must be refused by the per-query watermark
        val t2 = GraftTable.open(s, root, Identity.Keys(Seq("user_id")),
          ingestCfg)
        val epochLsn = t2.commitLsn + 1000
        val epochEv = t2.read(scala.None)
          .where(col("user_id") % 9 === 1)
          .select(lit("u").as("_op"), lit(epochLsn).as("_lsn"),
            col("user_id"), col("event_id"), lit("epoch").as("event_type"),
            lit(555.0).as("value"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        epochEv.count()
        faults.arm("pre")
        val epochFailed =
          try { t2.applyEpochCdcDF(epochEv, 0, "chaos-q"); false }
          catch { case e: Throwable if isInjected(e) => true }
        faults.arm("off")
        require(epochFailed, "epoch pre-fault never fired")
        require(graft.format.ManifestLog.loadLatest(root)
            .forall(_.queryEpochs.getOrElse("chaos-q", 0L) == 0L),
          "failed epoch must not advance the durable watermark")
        require(t2.applyEpochCdcDF(epochEv, 0, "chaos-q"),
          "epoch retry after pre-crash must apply")
        epochEv.unpersist()
        require(faults.crashes >= 4,
          s"expected 4 injected crashes, saw ${faults.crashes}")
        // redelivery after the commit (fresh handle = restarted query)
        val t3 = GraftTable.open(s, root, Identity.Keys(Seq("user_id")),
          ingestCfg)
        require(!t3.applyEpochCdcDF(epochEv.limit(0), 0, "chaos-q"),
          "replayed epoch must be refused")
        t3.read(scala.None)
          .select(col("user_id"), col("event_id").as("last_event_id"),
            col("event_type").as("last_event_type"),
            cents(col("value")).as("value_cents"))
          .orderBy("user_id")
      } finally graft.format.Fio.faults = null
    }),

    "cdc_maintenance_timer" -> ((s, d) => {
      // reference table_handler_timer.rs:7-24 (periodic mooncake-
      // snapshot / force-snapshot ticks driving the event loop): the
      // daemon's snapshot tick flushes committed rows that live only
      // in the mem-slice tail + WAL into manifest-committed parquet.
      // Proof shape: ingest via the driver event path under a huge
      // mem-slice (nothing auto-flushes), tick once, then reopen the
      // table WITH THE WAL DISABLED — only manifest-durable state
      // survives, and it must equal the full upsert fold. Idle ticks
      // must publish nothing (no manifest-version spam).
      val cfg = TableConfig(memSliceSize = Int.MaxValue, walEnabled = true)
      val wh = freshDir("wh-mt")
      val cat = GraftCatalog(s, wh)
      val table = cat.createTable("ev_mt", eventTableSchema,
        Identity.Keys(Seq("user_id")), cfg)
      // SF-proportional subset (driver event path holds these rows)
      val rows = events(s, d).where(col("user_id") % 10 === 3)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"))
        .orderBy("event_id").collect()
      val (b1, b2) = rows.splitAt(rows.length / 2)
      table.upsertAll(b1.toSeq, startLsn = 1)
      table.upsertAll(b2.toSeq, startLsn = b1.length + 2L)
      require(table.flushLsn < table.commitLsn,
        "precondition: committed rows must still be tail-only")
      val daemon = new MaintenanceDaemon(cat)
      require(daemon.snapshotTick() == Seq("ev_mt"),
        "snapshot tick must flush exactly the dirty table")
      require(table.flushLsn >= b1.length + b2.length,
        s"tick left rows unflushed: flushLsn=${table.flushLsn}")
      require(daemon.snapshotTick().isEmpty,
        "an idle tick must not publish a new version")
      daemon.maintenanceTick() // compaction/index-merge debt bounded
      val re = GraftTable.open(s, table.root,
        Identity.Keys(Seq("user_id")), TableConfig(walEnabled = false))
      re.read(scala.None)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "obs_metrics_export" -> ((s, d) => {
      // the observability loop closed in-engine (reference
      // observability/: snapshot_creation.rs, iceberg_persistence.rs,
      // latency_guard.rs — OTEL histograms with fixed explicit bounds
      // labeled by table id, plus op counters): table ops record into
      // the metrics registry, the registry exports standard OTLP-JSON,
      // and the engine's OWN OTEL ingest (S6) parses it back for SQL.
      // Latency VALUES are wall-clock nondeterministic, so the oracle
      // pins the monotonic counters; histogram structure (series
      // present, counts == op counts, bounds == reference boundaries)
      // is asserted in-code.
      import graft.observability.Metrics
      val table = runCdc(s, d, deleteType = None)
      val root = table.root
      val snap = Metrics.histogram("graft.snapshot_creation_latency", root)
      require(snap.exists(_.count.sum() >= 2L),
        s"expected >=2 snapshot-creation latency records, got $snap")
      require(snap.exists(_.boundariesMs == Metrics.DefaultBoundariesMs),
        "histogram must carry the reference's explicit boundaries")
      require(Metrics.histogram("graft.persistence_latency", root)
        .exists(h => h.count.sum() >= 1L &&
          h.bucketCounts.sum == h.count.sum()),
        "persistence histogram bucket counts must sum to its count")
      val payload = Metrics.toOtlpJson(timeUnixNano = 1700000000000000000L)
      import s.implicits._
      OtelIngest.metricsToRows(Seq(payload).toDF("body"), "body")
        .where(col("metric_type") === "sum")
        .withColumn("tid", expr(
          "filter(attributes, a -> a.key = 'graft.table_id')[0].value.string_value"))
        .where(col("tid") === root)
        .where(col("metric_name").isin("graft.commits", "graft.rows_ingested"))
        .select(col("metric_name"), col("value_int"))
        .orderBy("metric_name")
    }),

    "cdc_schema_evolve" -> ((s, d) => {
      // S1 + M14 in-stream: ONE CDC feed carrying ingest → ALTER (add
      // 'src', drop 'event_type') → ingest, applied without stopping
      // the query — the reference turns a changed Relation message into
      // a mid-stream AlterTable the same way (moonlink_sink.rs:347-361).
      // Post-alter upserts backfill 'src' from the event type, so the
      // final state mixes pre-alter rows (null src, no event_type) and
      // post-alter rows (real src).
      import s.implicits._
      val table = GraftTable.create(s, freshDir("evolve"), eventTableSchema,
        Identity.Keys(Seq("user_id")), ingestCfg)
      val ev = events(s, d)
      val mm = ev.agg(min(col("event_id")), max(col("event_id"))).head()
      val mid = (mm.getLong(0) + mm.getLong(1)) / 2
      // LSN = event_id*4 so the two alter LSNs slot strictly between
      // the halves without colliding with any data LSN
      val first = ev.where(col("event_id") <= mid).select(
        lit("u").as("_op"), (col("event_id") * 4).as("_lsn"),
        col("user_id"), col("event_id"), col("event_type"), col("value"))
      CdcPipeline.applyBatch(table, first)
      val ddl = Seq(
        ("alter_add", mid * 4 + 1, "src string"),
        ("alter_drop", mid * 4 + 2, "event_type"))
        .toDF("_op", "_lsn", "_ddl")
        .withColumn("user_id", lit(null).cast("long"))
        .withColumn("event_id", lit(null).cast("long"))
        .withColumn("event_type", lit(null).cast("string"))
        .withColumn("value", lit(null).cast("double"))
        .withColumn("src", lit(null).cast("string"))
      val second = ev.where(col("event_id") > mid).select(
        lit("u").as("_op"), (col("event_id") * 4).as("_lsn"),
        lit(null).cast("string").as("_ddl"),
        col("user_id"), col("event_id"), col("event_type"), col("value"),
        col("event_type").as("src"))
      CdcPipeline.applyBatch(table, ddl.unionByName(second))
      table.read(scala.None).select(col("user_id"),
        col("event_id").as("last_event_id"), col("src"),
        cents(col("value")).as("value_cents")).orderBy("user_id")
    }),

    "cdc_bulk_load" -> ((s, d) => {
      // S7 + M2: bulk-adopt a latest-per-user snapshot parquet without
      // rewriting (index built at the load LSN), then CDC-delete the
      // purchase-final users via the distributed path — deletes must
      // resolve through the loaded files' index into DVs.
      val table = GraftTable.create(s, freshDir("bl"), eventTableSchema,
        Identity.Keys(Seq("user_id")), ingestCfg)
      val boundary = events(s, d).agg(max(col("event_id"))).head().getLong(0)
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
      val snap = events(s, d)
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      val srcDir = freshDir("blsrc")
      snap.write.parquet(srcDir)
      val files = new java.io.File(srcDir).list()
        .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
        .map(n => s"$srcDir/$n").toSeq
      table.loadFiles(files, boundary)
      CdcPipeline.applyBatch(table, snap
        .where(col("event_type") === "purchase")
        .select(lit("d").as("_op"), lit(boundary + 1).as("_lsn"),
          col("user_id"), lit(null).cast("long").as("event_id"),
          lit(null).cast("string").as("event_type"),
          lit(null).cast("double").as("value")))
      table.read(None)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    }),

    "cdc_rpc_scan" -> ((s, d) => {
      // S12 end-to-end over the WIRE protocol: create + bulk-load the
      // table through RPC frames, CDC-delete so DVs exist, then read
      // PURELY from the scan_table_begin blob — an external reader
      // gets data-file paths and DV byte ranges from the scan state
      // and must reconstruct exactly the library read. The DV bitmaps
      // broadcast (they are small by construction); the scan itself is
      // a plain distributed parquet read filtered on
      // _metadata.row_index.
      import graft.sources.{RpcServer, RpcWire, ScanState}
      val catalog = GraftCatalog(s, freshDir("rpcwh"))
      val server = new RpcServer(catalog)
      def call[A](r: RpcWire.Request)(read: RpcWire.Dec => A): A =
        RpcWire.decodeResult(RpcWire.unframe(server.handleFrame(
          RpcWire.frame(RpcWire.encodeRequest(r)))))(read)
          .fold(e => throw new IllegalStateException(e.message), identity)
      val boundary = events(s, d).agg(max(col("event_id"))).head().getLong(0)
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
      val snap = events(s, d)
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      val srcDir = freshDir("rpcsrc")
      snap.write.parquet(srcDir)
      call(RpcWire.CreateTable("db", "ev", "parquet", srcDir,
        """{"schema":[{"name":"user_id","type":"int64"},
          |{"name":"event_id","type":"int64"},
          |{"name":"event_type","type":"string"},
          |{"name":"value","type":"float64"}],"key":["user_id"]}"""
          .stripMargin))(_ => ())
      val table = catalog.table("db.ev")
      CdcPipeline.applyBatch(table, snap
        .where(col("event_type") === "purchase")
        .select(lit("d").as("_op"), lit(boundary + 1).as("_lsn"),
          col("user_id"), lit(null).cast("long").as("event_id"),
          lit(null).cast("string").as("event_type"),
          lit(null).cast("double").as("value")))
      val blob = call(RpcWire.ScanTableBegin("db", "ev", table.commitLsn))(
        _.bytesField())
      val st = ScanState.decode(blob)
      // blob-driven DV reconstruction: per data-file deleted positions
      val deadByName: Map[String, Array[Long]] = st.deletionVectors
        .groupBy(_.dataFileNumber).map { case (num, refs) =>
          val bm = new org.roaringbitmap.longlong.Roaring64Bitmap
          refs.foreach { r =>
            val sidecar = graft.format.Fio.readBytes(
              st.puffinFiles(r.puffinFileNumber))
            val one = new org.roaringbitmap.longlong.Roaring64Bitmap
            one.deserialize(new java.io.DataInputStream(
              new java.io.ByteArrayInputStream(java.util.Arrays
                .copyOfRange(sidecar, r.offset, r.offset + r.size))))
            bm.or(one)
          }
          val name = st.dataFiles(num)
            .substring(st.dataFiles(num).lastIndexOf('/') + 1)
          name -> bm.toArray
        }
      val deadBc = s.sparkContext.broadcast(deadByName.map {
        case (k, v) => k -> v.toSet
      })
      val isLive = udf((file: String, pos: Long) => {
        val name = file.substring(file.lastIndexOf('/') + 1)
        !deadBc.value.getOrElse(name, Set.empty[Long]).contains(pos)
      })
      val out = s.read.parquet(st.dataFiles: _*)
        .select(col("user_id"), col("event_id"), col("value"),
          col("_metadata.file_path").as("_file"),
          col("_metadata.row_index").as("_pos"))
        .where(isLive(col("_file"), col("_pos")))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id")
      val materialized = out.localCheckpoint(true)
      call(RpcWire.ScanTableEnd("db", "ev"))(_ => ())
      materialized
    }),

    "proto_row_ingest" -> ((s, d) => {
      // S4 end-to-end: events encoded as MoonlinkRow protobuf wire
      // messages, decoded distributed, appended, aggregated — the
      // /ingestpb path round-tripped through the real wire format.
      val sch = eventTableSchema
      val src = events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      val payloads = s.createDataFrame(
        src.rdd.map(r => Row(ProtoIngest.encodeRow(r, sch))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("pb",
            org.apache.spark.sql.types.BinaryType))))
      val table = GraftTable.create(s, freshDir("pb"), sch,
        Identity.None, TableConfig(walEnabled = false))
      ProtoIngest.ingest(table, payloads, "pb", startLsn = 1)
      table.read(None)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), cents(sum(col("value"))).as("value_cents"))
        .orderBy("event_type")
    }),

    "kafka_avro_ingest" -> ((s, d) => {
      // S5 end-to-end: events re-encoded as Avro-JSON datums against a
      // declared Avro schema with a nullable union ('view' events carry
      // a null event_type branch), decoded distributed, appended, then
      // aggregated. The union-null branch must survive the round trip.
      val avroSchema =
        """{"type":"record","name":"Event","fields":[
          |  {"name":"user_id","type":"long"},
          |  {"name":"event_id","type":"long"},
          |  {"name":"event_type","type":["null","string"]},
          |  {"name":"value","type":"double"}]}""".stripMargin
      val payloads = events(s, d).select(to_json(struct(
        col("user_id"), col("event_id"),
        when(col("event_type") === "view",
            lit(null).cast(org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("string",
                org.apache.spark.sql.types.StringType)))))
          .otherwise(struct(col("event_type").as("string"))).as("event_type"),
        col("value"))).as("datum"))
      val table = GraftTable.create(s, freshDir("avro"),
        AvroIngest.schemaToStruct(avroSchema),
        Identity.None, TableConfig(walEnabled = false))
      AvroIngest.ingest(table, payloads, "datum", avroSchema, startLsn = 1)
      table.read(None)
        .groupBy(coalesce(col("event_type"), lit("(null)")).as("etype"))
        .agg(count(lit(1)).as("n"), cents(sum(col("value"))).as("value_cents"))
        .orderBy("etype")
    }),

    "kafka_avro_binary" -> ((s, d) => {
      // S5's wire format proper: the SAME events ride the Avro BINARY
      // encoding (zigzag varints, length-prefixed strings, positional
      // union branches — what Kafka producers actually ship), encoded
      // row->datum on the executors, decoded back by the binary wire
      // decoder, appended, aggregated. Same oracle as the JSON twin:
      // the two encodings must be indistinguishable past the decoder.
      val avroSchema =
        """{"type":"record","name":"Event","fields":[
          |  {"name":"user_id","type":"long"},
          |  {"name":"event_id","type":"long"},
          |  {"name":"event_type","type":["null","string"]},
          |  {"name":"value","type":"double"}]}""".stripMargin
      val enc = AvroIngest.binaryEncoderFor(avroSchema)
      val src = events(s, d).select(col("user_id"), col("event_id"),
        when(col("event_type") === "view", lit(null).cast("string"))
          .otherwise(col("event_type")).as("event_type"), col("value"))
      val datums = src.rdd.map(r => Row(enc(r)))
      val payloads = s.createDataFrame(datums,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("datum",
            org.apache.spark.sql.types.BinaryType))))
      val table = GraftTable.create(s, freshDir("avrobin"),
        AvroIngest.schemaToStruct(avroSchema),
        Identity.None, TableConfig(walEnabled = false))
      AvroIngest.ingestBinary(table, payloads, "datum", avroSchema, startLsn = 1)
      table.read(None)
        .groupBy(coalesce(col("event_type"), lit("(null)")).as("etype"))
        .agg(count(lit(1)).as("n"), cents(sum(col("value"))).as("value_cents"))
        .orderBy("etype")
    }),

    "rest_http_ingest" -> ((s, d) => {
      // S3's missing half made real: a user's first contact with the
      // reference is `curl` against the REST API (`rest_api.rs:416`).
      // This entry round-trips ingestion through an actual localhost
      // HTTP listener: create table over HTTP (FieldSchema list), POST
      // one JSON row event per request (insert/upsert semantics with
      // sync LSN responses), flush over HTTP, then read the table
      // through the engine and aggregate. Row-at-a-time REST rides the
      // driver event loop by design (reference table_handler.rs:124);
      // bulk data belongs to applyBatch — so the entry's subset is
      // bounded (user_id % 20 == 7), never the corpus.
      val cat = graft.table.GraftCatalog(s, freshDir("rest-wh"))
      val srv = graft.sources.RestServer.start(cat)
      try {
        // plain HttpURLConnection: no client thread pool to leak into
        // the driver JVM, and keep-alive pools the loopback connection
        def post(path: String, body: String): String = {
          val conn = java.net.URI.create(srv.baseUrl + path).toURL
            .openConnection().asInstanceOf[java.net.HttpURLConnection]
          conn.setRequestMethod("POST")
          conn.setRequestProperty("Content-Type", "application/json")
          conn.setDoOutput(true)
          val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          conn.setFixedLengthStreamingMode(bytes.length)
          val os = conn.getOutputStream
          try os.write(bytes) finally os.close()
          val code = conn.getResponseCode
          val is = if (code == 200) conn.getInputStream else conn.getErrorStream
          val resp = new String(is.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
          is.close()
          require(code == 200, s"POST $path -> $code: $resp")
          resp
        }
        post("/tables/users",
          """{"schema":[
            |  {"name":"user_id","data_type":"int64","nullable":false},
            |  {"name":"event_id","data_type":"int64","nullable":true},
            |  {"name":"event_type","data_type":"string","nullable":true},
            |  {"name":"value","data_type":"float64","nullable":true}],
            | "key_columns":["user_id"]}""".stripMargin)
        // SF-INVARIANT subset: a fixed user list stays ~67 events/user
        // at every scale factor, so the entry's serial-HTTP portion is
        // bounded (~270 requests) while still exercising upsert folds.
        // Row-at-a-time REST is the reference's serial path by design
        // (one event loop per slot); bulk volume belongs to /upload.
        val rows = events(s, d)
          .where(col("user_id").isin(7L, 27L, 47L, 67L))
          .select(col("user_id"), col("event_id"), col("event_type"),
            to_json(struct(col("user_id"), col("event_id"),
              col("event_type"), col("value"))).as("data"))
          .orderBy("event_id").collect()
        rows.foreach { r =>
          post("/ingest/users",
            s"""{"operation":"upsert","data":${r.getString(3)},"request_mode":"sync"}""")
        }
        post("/tables/users/flush", "{}")
        cat.table("users").read(scala.None)
          .select(col("user_id"), col("event_id").as("last_event_id"),
            col("event_type").as("last_event_type"),
            cents(col("value")).as("value_cents"))
          .orderBy("user_id")
      } finally srv.stop()
    }),

    "serve_lifecycle" -> ((s, d) => {
      // the standalone service process (reference moonlink-service CLI,
      // moonlink_service/src/main.rs): one warehouse served over REST +
      // TCP RPC from one process, stopped, then RESTARTED — the second
      // start must recover every registered table (recover_all_tables
      // on boot) and serve identical reads. Bounded row-at-a-time REST
      // like rest_http_ingest (one fixed user ≈ 67 events at every SF).
      import graft.tools.Serve
      val wh = freshDir("serve-wh")
      def post(base: String, path: String, body: String): String = {
        val conn = java.net.URI.create(base + path).toURL
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setRequestProperty("Content-Type", "application/json")
        conn.setDoOutput(true)
        val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val os = conn.getOutputStream
        try os.write(bytes) finally os.close()
        val code = conn.getResponseCode
        val is = if (code == 200) conn.getInputStream else conn.getErrorStream
        val resp = new String(is.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        is.close()
        require(code == 200, s"POST $path -> $code: $resp")
        resp
      }
      val h1 = Serve.start(s, Serve.Config(wh,
        restPort = Some(0), tcpPort = Some(0), otelPort = None))
      try {
        val base = h1.rest.get.baseUrl
        post(base, "/tables/users",
          """{"schema":[
            |  {"name":"user_id","data_type":"int64","nullable":false},
            |  {"name":"event_id","data_type":"int64","nullable":true},
            |  {"name":"event_type","data_type":"string","nullable":true},
            |  {"name":"value","data_type":"float64","nullable":true}],
            | "key_columns":["user_id"]}""".stripMargin)
        val rows = events(s, d).where(col("user_id") === 7L)
          .select(col("event_id"), to_json(struct(col("user_id"),
            col("event_id"), col("event_type"), col("value"))).as("data"))
          .orderBy("event_id").collect()
        rows.foreach(r => post(base, "/ingest/users",
          s"""{"operation":"upsert","data":${r.getString(1)},"request_mode":"sync"}"""))
        post(base, "/tables/users/flush", "{}")
      } finally h1.stop()
      // restart: recovery must reopen the table and serve the same state
      val h2 = Serve.start(s, Serve.Config(wh,
        restPort = Some(0), tcpPort = Some(0), otelPort = None))
      try
        h2.catalog.table("users").read(scala.None)
          .select(col("user_id"), col("event_id").as("last_event_id"),
            col("event_type").as("last_event_type"),
            cents(col("value")).as("value_cents"))
          .orderBy("user_id")
          .localCheckpoint(true)
      finally h2.stop()
    }),

    "rest_map_ingest" -> ((s, d) => {
      // map<string,T> through the REST surface (SURVEY "what's
      // missing" #4): the schema DSL accepts the map type and stores
      // it as list<struct{key,value}> — the reference's convention for
      // keyed collections (otel_schema.rs:49-60), parquet-stable. JSON
      // ingest accepts the natural object form {"k": v}; the query
      // side rebuilds MapType with map_from_entries and does key
      // lookups. Bounded like rest_http_ingest (row-at-a-time REST is
      // the reference's serial path by design).
      val cat = graft.table.GraftCatalog(s, freshDir("restmap-wh"))
      val srv = graft.sources.RestServer.start(cat)
      try {
        def post(path: String, body: String): String = {
          val conn = java.net.URI.create(srv.baseUrl + path).toURL
            .openConnection().asInstanceOf[java.net.HttpURLConnection]
          conn.setRequestMethod("POST")
          conn.setRequestProperty("Content-Type", "application/json")
          conn.setDoOutput(true)
          val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          conn.setFixedLengthStreamingMode(bytes.length)
          val os = conn.getOutputStream
          try os.write(bytes) finally os.close()
          val code = conn.getResponseCode
          val is = if (code == 200) conn.getInputStream else conn.getErrorStream
          val resp = new String(is.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
          is.close()
          require(code == 200, s"POST $path -> $code: $resp")
          resp
        }
        post("/tables/kv",
          """{"schema":[
            |  {"name":"user_id","data_type":"int64","nullable":false},
            |  {"name":"props","data_type":"map<string,int64>","nullable":true}],
            | "key_columns":["user_id"]}""".stripMargin)
        val rows = events(s, d)
          .where(col("user_id").isin(7L, 27L))
          .select(col("event_id"),
            to_json(struct(col("user_id"), struct(
              col("user_id").as("uid"), col("event_id").as("eid"),
              (col("event_id") * 2).as("eid2")).as("props"))).as("data"))
          .orderBy("event_id").collect()
        rows.foreach { r =>
          post("/ingest/kv",
            s"""{"operation":"upsert","data":${r.getString(1)},"request_mode":"sync"}""")
        }
        post("/tables/kv/flush", "{}")
        val m = map_from_entries(col("props"))
        cat.table("kv").read(scala.None)
          .select(col("user_id"),
            element_at(m, "eid").as("last_eid"),
            element_at(m, "eid2").as("last_eid2"),
            size(col("props")).cast("long").as("n_keys"))
          .orderBy("user_id")
      } finally srv.stop()
    }),

    "otel_metrics_agg" -> ((s, d) => {
      // S6 end-to-end: synthesize OTLP/HTTP JSON metric exports from
      // the events table (one request per user, one gauge data point
      // per event, proto3-JSON int64-as-string encoding), convert via
      // the distributed OTLP->row path, ingest into an OTEL metrics
      // table, then aggregate per user_id attribute.
      val pay = events(s, d)
        .groupBy(col("user_id"))
        .agg(collect_list(struct(col("ts"), col("value"))).as("pts"))
        .select(to_json(struct(array(struct(
          lit("https://opentelemetry.io/schemas/1.21.0").as("schemaUrl"),
          struct(array(struct(lit("service.name").as("key"),
            struct(lit("graft-events").as("stringValue")).as("value")))
            .as("attributes")).as("resource"),
          array(struct(
            struct(lit("graft.meter").as("name"),
              lit("1.0").as("version")).as("scope"),
            array(struct(
              lit("events.value").as("name"),
              lit("event value stream").as("description"),
              lit("1").as("unit"),
              struct(transform(col("pts"), p => struct(
                (p("ts") * lit(1000L)).cast("string").as("timeUnixNano"),
                p("value").as("asDouble"),
                array(struct(lit("user_id").as("key"),
                  struct(col("user_id").cast("string").as("intValue"))
                    .as("value"))).as("attributes")))
                .as("dataPoints")).as("gauge"))).as("metrics")))
            .as("scopeMetrics"))).as("resourceMetrics"))).as("payload"))
      val table = GraftTable.create(s, freshDir("otel"), OtelSchema.schema,
        Identity.None, TableConfig(walEnabled = false))
      OtelIngest.ingestPayloads(table, pay, "payload", startLsn = 1)
      OtelSchema.explodeAttrs(table.read(None))
        .where(col("attr_key") === "user_id" && col("metric_type") === "gauge")
        .groupBy(col("attr_value").cast("long").as("user_id"))
        .agg(count(lit(1)).as("n"),
          cents(sum(col("value_double"))).as("value_cents"),
          expr("min(time_unix_nano) DIV 1000").as("first_us"))
        .orderBy("user_id")
    }),

    "otel_pb_ingest" -> ((s, d) => {
      // S6's PRIMARY wire format: the same per-user metric stream as
      // otel_metrics_agg, but as binary OTLP protobuf requests
      // (reference otel_to_moonlink_pb.rs) — producer-encoded and
      // engine-decoded by the dependency-free proto3 wire codec, both
      // sides distributed (executors encode/decode, the driver never
      // holds a payload). Each point carries ONE exemplar (value +
      // trace/span correlation ids) and the resource carries an entity
      // ref whose id key resolves against the resource attributes
      // (otel_to_moonlink_pb.rs:166,229) — the aggregate surfaces the
      // exemplar values, the span-id round-trip and the resolved
      // entity pair so the oracle verifies the whole wide row.
      import graft.sources.OtelPb
      val enc = udf((userId: Long, pts: Seq[Row]) =>
        OtelPb.Enc.request(
          Seq(OtelPb.Enc.strAttr("service.name", "graft-events")),
          "graft.meter", "1.0",
          Seq(OtelPb.Enc.gauge("events.value", "1",
            pts.map { p =>
              val ns = p.getLong(0) * 1000L
              OtelPb.Enc.gaugePoint(ns, p.getDouble(1),
                Seq(OtelPb.Enc.intAttr("user_id", userId)),
                exemplars = Seq(OtelPb.Enc.exemplar(ns, p.getDouble(1),
                  java.nio.ByteBuffer.allocate(16)
                    .putLong(userId).putLong(ns).array(),
                  java.nio.ByteBuffer.allocate(8).putLong(ns).array(),
                  Seq(OtelPb.Enc.strAttr("sampled.by", "head")))))
            })),
          entityRefs = Seq(OtelPb.Enc.entityRef("service",
            idKeys = Seq("service.name")))))
      val pay = events(s, d)
        .groupBy(col("user_id"))
        .agg(collect_list(struct(col("ts"), col("value"))).as("pts"))
        .select(enc(col("user_id"), col("pts")).as("payload"))
      val table = GraftTable.create(s, freshDir("otelpb"), OtelSchema.schema,
        Identity.None, TableConfig(walEnabled = false))
      OtelPb.ingestPayloads(table, pay, "payload", startLsn = 1)
      OtelSchema.explodeAttrs(table.read(scala.None))
        .where(col("attr_key") === "user_id" && col("metric_type") === "gauge")
        .withColumn("ex", element_at(col("exemplars"), 1))
        .withColumn("er_val", element_at(
          element_at(col("resource_entity_refs"), 1)("id_pairs"), 1)
          ("value")("string_value"))
        .groupBy(col("attr_value").cast("long").as("user_id"))
        .agg(count(lit(1)).as("n"),
          cents(sum(col("value_double"))).as("value_cents"),
          expr("min(time_unix_nano) DIV 1000").as("first_us"),
          sum(size(col("exemplars"))).as("n_exemplars"),
          sum(cents(col("ex")("as_double"))).as("exemplar_cents"),
          max(expr("CAST(conv(hex(ex.span_id), 16, 10) AS BIGINT) DIV 1000"))
            .as("span_max_us"),
          sum(when(col("er_val") === "graft-events", 1L).otherwise(0L))
            .as("n_entity"))
        .orderBy("user_id")
    }),

    // ---- text analysis (training-data ops) -----------------------------

    "text_stats" -> ((s, d) => {
      t(s, d, "documents").select(col("doc_id"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextOps.bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens"),
          TextOps.wordCount(col("text")).cast("long").as("n_words"),
          TextOps.punctCount(col("text")).cast("long").as("n_punct"),
          TextOps.qualityScore(col("text")).as("quality"),
          TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    "text_ccnet_bucket" -> ((s, d) => {
      // CCNet head/middle/tail corpus split: perplexity proxied by
      // corpus token frequency (integer-exact), cutoffs from a scalar
      // corpus reference — no LM, no global sort (see TextOps)
      TextOps.ccnetBucket(t(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    "pipeline_training_mix" -> ((s, d) => {
      // capstone v2 — the modern pretraining-data pipeline in one
      // dataflow: model-based quality filter (hashed linear logit) →
      // exact dedup (normalized-md5, min-id representative) → per-
      // source temperature-1/2 mixture weights over the SURVIVING
      // corpus. Three corpus-shaped stages, each the scale shape its
      // standalone entry audits; the mixture normalization runs over
      // a handful of source rows.
      val docs = t(s, d, "documents")
      val keep = TextOps.qualityModel(docs, "doc_id", "text")
        .where(col("decision") === "keep").select("doc_id")
      val kept = docs.join(keep, "doc_id")
      val reps = kept
        .withColumn("fp", TextOps.fingerprint(col("text")))
        .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      val surviving = docs.join(reps, "doc_id")
      TextOps.mixtureWeights(surviving, "source", "text")
        .orderBy("source")
    }),

    "text_quality_model" -> ((s, d) => {
      // model-based quality filtering (the fastText/DCLM shape) with
      // deterministic hashed pseudo-weights: one corpus scan, per-doc
      // integer logit in a single tight-JVM pass, filter verdict as a
      // column (see TextOps.qualityModel)
      TextOps.qualityModel(t(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    "mix_weights" -> ((s, d) => {
      // dataset-mixture design: per-source token shares and the
      // temperature-1/2 sampling weights, all integer-deterministic
      // (floor(sqrt(int)) ports bit-exactly; pow would not)
      TextOps.mixtureWeights(t(s, d, "documents"), "source", "text")
        .orderBy("source")
    }),

    "text_bpe_encode" -> ((s, d) => {
      // the APPLY half of tokenizer training: learn 8 merges, then
      // encode the corpus with them — per-doc symbol counts under the
      // trained tokenizer, one scan, zero shuffle, merges baked into
      // the plan as codegen'd replaces (see TextOps.bpeEncode)
      val docs = t(s, d, "documents")
      val merges = TextOps.bpeTrain(docs, "text", steps = 8)
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextOps.bpeEncode(docs, "doc_id", "text", merges).orderBy("doc_id")
    }),

    "text_bpe_train" -> ((s, d) => {
      // tokenizer TRAINING: 8 BPE merges learned from the corpus word
      // distribution — one corpus-shaped shuffle (word count), then
      // per-step aggs over distinct words only; one row per step
      // reaches the driver (see TextOps.bpeTrain)
      TextOps.bpeTrain(t(s, d, "documents"), "text", steps = 8)
        .orderBy("merge_rank")
    }),

    "chunk_documents" -> ((s, d) => {
      // RAG/retrieval unit prep: every document cut into 64-token
      // windows advancing by 48 (25% overlap), digest per chunk — a
      // pure per-row explode, zero shuffle at any corpus size (the
      // sort below is presentation only; the driver compare is
      // order-insensitive)
      TextOps.chunkDocuments(t(s, d, "documents"), "doc_id", "text",
          winSize = 64, stride = 48)
        .orderBy("doc_id", "chunk_id")
    }),

    "text_langid" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"), TextOps.langId(col("text")).as("lang_guess"))
        .groupBy(col("lang_guess")).agg(count(lit(1)).as("n"))
        .orderBy("lang_guess")
    }),

    "text_pii" -> ((s, d) => {
      // The synthetic corpus carries no PII, so the query doctors the
      // text DETERMINISTICALLY from driver data (doc_id/source-derived
      // email/IP/phone, appended conditionally so both the match and
      // no-match paths run); the oracle builds the identical string in
      // SQL, making the redaction regexes the thing under test. All
      // codegen'd regexp_replace — one scan, no shuffle until the sort.
      val doctored = concat(
        col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"), lit("@"),
            col("source"), lit(".example.com"))).otherwise(lit("")),
        when(col("doc_id") % 4 === 0,
          concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
            lit(".0."), (col("doc_id") % 100).cast("string"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" call 555-"),
            lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")))
      t(s, d, "documents")
        .select(col("doc_id"), doctored.as("doctored"))
        .select(col("doc_id"),
          TextOps.piiMatches(col("doctored"), TextOps.EmailPattern)
            .cast("long").as("n_emails"),
          TextOps.piiMatches(col("doctored"), TextOps.Ipv4Pattern)
            .cast("long").as("n_ips"),
          TextOps.piiMatches(col("doctored"), TextOps.PhonePattern)
            .cast("long").as("n_phones"),
          md5(TextOps.redactPii(col("doctored"))).as("red_fp"))
        .orderBy("doc_id")
    }),

    "text_gopher" -> ((s, d) => {
      // Gopher repetition/quality rules (Rae et al. 2021, table A1).
      // The synthetic corpus is single-line prose, so the entry
      // doctors multi-line structure in deterministically from doc_id
      // — duplicate lines, bullet lines, an ellipsis-terminated line,
      // a symbol run — making every rule's numerator nonzero on a
      // known subset; the oracle builds the identical string in SQL,
      // so the rule arithmetic itself is the thing under test.
      val doctored = concat(col("text"),
        when(col("doc_id") % 3 === 0,
          lit("\nrepeat line alpha\nrepeat line alpha\n- bullet one\n* bullet two"))
          .otherwise(lit("")),
        when(col("doc_id") % 4 === 0,
          lit("\nto be continued...\n### heading")).otherwise(lit("")))
      TextOps.gopherStats(
        t(s, d, "documents").withColumn("text", doctored),
        "doc_id", "text")
        .orderBy("doc_id")
    }),

    "text_heavyhitters" -> ((s, d) => {
      // φ-heavy-hitter bigrams (count >= 0.1% of all bigram
      // occurrences), exact counts via count-min-sketch shortlist +
      // exact verify over the surviving sliver — the sketch shuffles
      // depth x width cells, never one row per distinct gram
      TextOps.heavyHitters(t(s, d, "documents"), "text",
          n = 2, phiPermille = 1L)
        .orderBy("gram")
    }),

    "text_bm25" -> ((s, d) => {
      // BM25 corpus ranking against a fixed query (the retrieval-based
      // curation primitive): one stats scan (N, avgdl, per-term df) +
      // one scoring scan ending in a top-20 heap. The ln idf is
      // replaced by its rational core so the score is a fixed IEEE
      // dag DuckDB recomputes bit-identically.
      TextOps.bm25(t(s, d, "documents"), "text", "doc_id",
        terms = Seq("hash", "join", "spark"))
    }),

    "ann_filtered_topk" -> ((s, d) => {
      // Filtered vector search (the vector-DB "metadata filter"
      // feature): the label predicate applies BEFORE the scan
      // (pre-filtering), so the cosine pass touches only the matching
      // slice of the corpus and always returns k — the post-filter
      // alternative (top-k then filter) re-scans everything and can
      // come up short. Catalyst pushes the label filter into the
      // parquet scan (PushedFilters), which at 100 TB is the
      // difference between scanning a partition and the corpus.
      val e = t(s, d, "embeddings")
      val q = e.where(col("vec_id") < 8)
      Similarity.bruteForceTopK(e.where(col("label") === 2),
          "vec_id", "embedding", q, "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),

    "search_hybrid_rrf" -> ((s, d) => {
      // Hybrid retrieval: the BM25 lexical ranking fused with the
      // exact-cosine vector ranking by reciprocal-rank fusion
      // (RRF, k=60 — the standard two-tower combiner). doc_id==vec_id
      // joins the modalities; a doc ranked by only one list still
      // scores through that list (full-outer + coalesce 0). Integer
      // micro-RRF via floor(1e6/(60+rank)) keeps the fused score an
      // exact IEEE dag both engines reproduce. The vector list is
      // top-50 for query vec 0; lexical is the bm25 top-50 for the
      // fixed term set. Both source rankings are independently
      // verified elsewhere (text_bm25, ann_brute_topk).
      val docs = t(s, d, "documents")
      val e = t(s, d, "embeddings")
      val lex = TextOps.bm25(docs, "text", "doc_id",
          terms = Seq("hash", "join", "spark"), topN = 50)
        .withColumn("lex_rank", row_number().over(
          Window.orderBy(col("score_micro").desc, col("doc_id").asc)))
        .select(col("doc_id"), col("lex_rank").cast("long").as("lex_rank"))
      val q = e.where(col("vec_id") === 0)
      val vec = Similarity.bruteForceTopK(e, "vec_id", "embedding",
          q, "vec_id", "embedding", k = 50)
        .select(col("neighbor_id").as("doc_id"), col("rank").as("vec_rank"))
      lex.join(vec, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          (coalesce(floor(lit(1000000.0) / (lit(60.0) + col("lex_rank"))), lit(0.0)) +
           coalesce(floor(lit(1000000.0) / (lit(60.0) + col("vec_rank"))), lit(0.0)))
            .cast("long").as("rrf_micro"))
        .orderBy(col("rrf_micro").desc, col("doc_id").asc)
        .limit(10)
    }),

    "text_vocab" -> ((s, d) => {
      // top-1000 corpus vocabulary with deterministic tie-break — the
      // first step of tokenizer training / frequency filtering. The
      // count is a distributed explode+groupBy; the top-k runs as
      // TakeOrderedAndProject (per-partition heaps), and only the k
      // survivors see the ranking window.
      TextOps.vocabulary(t(s, d, "documents"), "text", 1000)
        .orderBy("vocab_id")
    }),

    "pack_sequences" -> ((s, d) => {
      // concat-and-chunk packing into 2048-token training sequences,
      // cumsum windowed per source shard (the global-order variant
      // would serialize the corpus through one task).
      TextOps.packSequences(t(s, d, "documents"),
        "doc_id", "text", "source", 2048)
        .orderBy("doc_id")
    }),

    "sample_mixture" -> ((s, d) => {
      // training-mixture reweighting: per-language quotas applied by
      // the deterministic engine-portable sample key — a pure per-row
      // predicate, no shuffle, no global count; stable under re-runs
      // and repartitioning.
      TextOps.quotaSample(t(s, d, "documents"), "doc_id", "lang",
          Map("en" -> 400L, "fr" -> 700L), defaultPermille = 1000L)
        .select(col("doc_id"), col("lang"), col("sample_key"),
          col("quota_permille"))
        .orderBy("doc_id")
    }),

    "sample_diverse" -> ((s, d) => {
      // DIVERSITY-aware coverage sampling (the cluster-balanced subset
      // selection DataComp/SemDeDup-style curation runs): k-means cells
      // partition the embedding space, and the sample keeps the 4
      // vectors closest to each centroid — every region of the space is
      // represented, where a uniform sample oversamples dense regions.
      // Scale: training is bounded (nCells x dim on the driver), the
      // scoring pass is one broadcast join (centroid matrix is tiny) +
      // a window keyed by cell; nothing all-pairs. Affinity ranks in
      // integer milli; the oracle replays the rank over the STAGED
      // scored frame so no FP recomputes cross-engine.
      val emb = t(s, d, "embeddings")
      val cents = Similarity.ivfTrain(emb, "vec_id", "embedding",
        nCells = 32, iters = 2)
      val assigned = Similarity.ivfAssign(emb, "vec_id", "embedding", cents)
      val scored = stage(assigned
          .join(emb, "vec_id").join(broadcast(cents), "cell")
          .select(col("vec_id"), col("cell"),
            round(Similarity.dot(col("embedding"), col("centroid")) * 1000)
              .cast("long").as("aff_milli")),
        d, "sdv_scored")
      val w = Window.partitionBy(col("cell"))
        .orderBy(col("aff_milli").desc, col("vec_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 4)
        .select(col("cell"), col("vec_id"), col("aff_milli"),
          col("rank").cast("long").as("rank"))
        .orderBy("cell", "rank")
    }),

    "sample_stratified" -> ((s, d) => {
      // exact-count mixture: exactly 100 docs per language, ranked by
      // the same engine-portable key as sample_mixture (so a rate
      // pre-thin composes with this exactly); DuckDB replays the
      // identical rank arithmetic.
      TextOps.stratifiedSample(t(s, d, "documents"), "doc_id", "lang", 100)
        .select(col("doc_id"), col("lang"), col("strat_rank"))
        .orderBy("doc_id")
    }),

    "text_decontam" -> ((s, d) => {
      // Benchmark decontamination (the eval-overlap gate every training
      // pipeline runs before a corpus ships): the "benchmark" is a
      // deterministic ~1% slice of the corpus (doc_id % 97 == 0); a
      // training doc is contaminated when >= 30% of its distinct token
      // bigrams appear in the benchmark set. The benchmark gram set is
      // tiny by construction -> broadcast join, so the corpus side
      // never shuffles; per-doc agg is the only exchange. Two-stage
      // oracle: the exploded gram frame is staged, DuckDB recomputes
      // the join/agg/threshold stage exactly.
      val grams = t(s, d, "documents").select(col("doc_id"),
        explode(array_distinct(TextOps.tokenNgrams(col("text"), 2)))
          .as("gram"))
      val staged = stage(grams, d, "decontam_grams")
      val bench = staged.where(col("doc_id") % 97 === 0)
        .select(col("gram")).distinct().withColumn("hit", lit(1L))
      staged.where(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), Seq("gram"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("doc_id"), col("n_grams"), col("n_hits"),
          (col("n_hits") * 1000 >= col("n_grams") * 300).cast("long")
            .as("contaminated"))
        .orderBy("doc_id")
    }),

    "dedup_exact" -> ((s, d) => {
      Dedup.exact(t(s, d, "documents"), "doc_id", "text")
        .orderBy("fp")
    }),

    "pipeline_corpus_filter" -> ((s, d) => {
      // The capstone composition every training pipeline ships: one
      // declarative plan chaining quality gate + language gate +
      // exact-dup removal (min-id representative per fingerprint) +
      // eval-slice exclusion + benchmark decontamination. Each stage
      // is the already-verified operator; Catalyst fuses the scalar
      // gates into one scan pass, the dup window shuffles on the
      // 16-byte fingerprint, and the contamination side is the
      // broadcast-join shape of text_decontam feeding a broadcast
      // anti-join (the contaminated-id set is tiny by construction).
      val docs = t(s, d, "documents")
      // 5-gram overlap, not bigrams: short grams false-positive across
      // unrelated docs as the corpus grows (at sf0.1 a 2-gram gate
      // marked every doc contaminated); real decontam uses long grams
      // so only genuine near-copies of benchmark docs trip the gate
      val grams = docs.select(col("doc_id"),
        explode(array_distinct(TextOps.tokenNgrams(col("text"), 5)))
          .as("gram"))
      val staged = stage(grams, d, "pipeline_grams")
      val bench = staged.where(col("doc_id") % 97 === 0)
        .select(col("gram")).distinct().withColumn("hit", lit(1L))
      val contam = staged.where(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), Seq("gram"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .where(col("n_hits") * 1000 >= col("n_grams") * 300)
        .select("doc_id")
      val scored = docs.select(col("doc_id"),
        TextOps.qualityScore(col("text")).as("quality"),
        TextOps.langId(col("text")).as("lang_guess"),
        TextOps.fingerprint(col("text")).as("fp"))
      // dup representative is elected over the FULL corpus (before any
      // gate), so a kept doc never changes when thresholds move
      scored
        .withColumn("keep_id", min("doc_id").over(Window.partitionBy("fp")))
        .where(col("doc_id") % 97 =!= 0 && col("quality") >= 150 &&
          col("lang_guess") =!= "unknown" &&
          col("doc_id") === col("keep_id"))
        .join(contam, Seq("doc_id"), "left_anti")
        .select("doc_id", "quality", "lang_guess")
        .orderBy("doc_id")
    }),

    "stream_corpus_filter" -> ((s, d) => {
      // The capstone's STREAMING form: documents arrive as file-source
      // micro-batches (4 doc_id-range files, one per trigger, mtimes
      // staggered so arrival order is doc_id order); each batch passes
      // the stateless quality gate, then flatMapGroupsWithState keyed
      // on the content fingerprint drops any doc whose text already
      // streamed — first-wins dedup with O(1)-per-key state, the
      // incremental shape a daily-crawl pipeline runs. With batches in
      // id order the emitted set equals global min-doc_id-per-fp,
      // which is what the oracle recomputes. The corpus streams TWICE
      // (second copy id-shifted past the first) so the copies land in
      // later batches and the state dedup must drop every one of them
      // — at sf0.01 the raw corpus has no exact dups at all, and an
      // un-exercised state path would be a vacuous test.
      import org.apache.spark.sql.types._
      withShufflePartitions(s, 4) {
        val docs0 = t(s, d, "documents")
          .select(col("doc_id"), col("lang"), col("text"))
        val off = docs0.agg(max(col("doc_id"))).head().getLong(0) + 1
        val srcDir = streamSourceDir(
          docs0.unionByName(docs0.select((col("doc_id") + off).as("doc_id"),
            col("lang"), col("text"))), 4)
        val sch = StructType(Seq(StructField("doc_id", LongType),
          StructField("lang", StringType), StructField("text", StringType)))
        val stream = s.readStream.schema(sch)
          .option("maxFilesPerTrigger", "1").parquet(srcDir)
        val sink = freshDir("scf-out")
        val q = graft.streaming.CorpusStream
          .dedupFilterStream(stream, "text", minQuality = 150)
          .writeStream.outputMode("append").format("parquet")
          .option("path", sink)
          .option("checkpointLocation", freshDir("scf-ckpt"))
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(sink)
          .select(col("doc_id"), col("lang"), col("quality"), col("fp"))
          .orderBy("doc_id")
      }
    }),

    "stream_minhash_dedup" -> ((s, d) => {
      // Streaming NEAR-dup: the doubled corpus streams through MinHash
      // banding with one long of state per occupied (band, bucket) —
      // each arriving doc that collides with a non-empty bucket emits
      // a candidate link to the bucket's representative (its min id).
      // With id-ordered batches the distinct output equals
      // min-per-bucket pairs, which the oracle recomputes from the
      // staged band frame (two-stage design like dedup_minhash_lsh:
      // banding is the staged deterministic artifact, the link rule is
      // the recomputed stage).
      import org.apache.spark.sql.types._
      withShufflePartitions(s, 4) {
        val docs0 = t(s, d, "documents").select(col("doc_id"), col("text"))
        val off = docs0.agg(max(col("doc_id"))).head().getLong(0) + 1
        val doubled = docs0.unionByName(
          docs0.select((col("doc_id") + off).as("doc_id"), col("text")))
        val srcDir = streamSourceDir(doubled, 4)
        stage(Dedup.minhashBandFrame(
            Dedup.minhashShingleFrame(doubled, "doc_id", "text", shingleN = 2),
            numHashes = 64, bands = 16),
          d, "stream_mh_bands")
        val sch = StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType)))
        val stream = s.readStream.schema(sch)
          .option("maxFilesPerTrigger", "1").parquet(srcDir)
        val sink = freshDir("smh-out")
        val q = graft.streaming.CorpusStream
          .minhashCandidateStream(stream, "doc_id", "text",
            shingleN = 2, numHashes = 64, bands = 16)
          .writeStream.outputMode("append").format("parquet")
          .option("path", sink)
          .option("checkpointLocation", freshDir("smh-ckpt"))
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(sink).select(col("id_a"), col("id_b"))
          .distinct().orderBy("id_a", "id_b")
      }
    }),

    "dedup_jaccard_pairs" -> ((s, d) => {
      Dedup.jaccardPairs(t(s, d, "documents"), "doc_id", "text",
          blockCol = "source", n = 1, minMilli = 300)
        .orderBy("id_a", "id_b")
    }),

    "q_sql_kernel" -> ((s, d) => {
      // the V2 FunctionCatalog surface end-to-end: block-bounded
      // similar-pair search written in PLAIN SQL with the catalog's
      // jaccard_milli kernel over a staged shingle frame — the same
      // contract as dedup_jaccard_pairs, driven entirely through SQL.
      // hs pre-sorts ONCE PER ROW at staging — the kernel's sorted-
      // input contract must never be re-established per PAIR (the
      // r9-measured hot spot: two array sorts × every candidate pair)
      val sh = stage(
        Dedup.minhashShingleFrame(
            t(s, d, "documents"), "doc_id", "text", shingleN = 2)
          .join(t(s, d, "documents")
            .select(col("doc_id").as("id"), col("source")), "id")
          .withColumn("hs", sort_array(col("hs"))),
        d, "sqlkernel_sh")
      val wh = freshDir("wh-fn")
      val cname = "gc" + math.abs(wh.hashCode).toString
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sources.GraftCatalogPlugin].getName)
      s.conf.set(s"spark.sql.catalog.$cname.warehouse", wh)
      sh.createOrReplaceTempView("sqlkernel_sh_v")
      // kernel computed ONCE per pair in the inner projection; the
      // outer threshold filters the alias (the function's declared
      // non-determinism pins the plan — no pushdown re-substitution)
      s.sql(
        s"""SELECT id_a, id_b, jaccard_milli FROM (
           |  SELECT a.id AS id_a, b.id AS id_b,
           |         $cname.system.jaccard_milli(a.hs, b.hs) AS jaccard_milli
           |  FROM sqlkernel_sh_v a JOIN sqlkernel_sh_v b
           |    ON a.source = b.source AND a.id < b.id)
           |WHERE jaccard_milli >= 300
           |ORDER BY id_a, id_b""".stripMargin)
    }),

    "dedup_substring" -> ((s, d) => {
      // Substring-level exact dedup (Lee et al. 2021 at token-k-gram
      // granularity): positions whose 4-gram fingerprint repeats
      // corpus-wide mark duplicated token spans; overlapping spans
      // merge per doc. Two-stage oracle: the positioned fingerprint
      // frame is staged, DuckDB recomputes repeat-marking, island
      // merge, and the per-doc rollup exactly.
      val staged = stage(Dedup.substringGramFrame(
          t(s, d, "documents"), "doc_id", "text", k = 4),
        d, "substr_grams")
      Dedup.substringDupSpans(staged, k = 4).orderBy("doc_id")
    }),

    "dedup_minhash_lsh" -> ((s, d) => {
      // two-stage oracle: the hashed shingle sets and the LSH candidate
      // pairs are staged to parquet; DuckDB recomputes the exact-Jaccard
      // verification over them (probabilistic recall is spec'd in
      // ScalaTest; the deterministic verify stage is oracle-exact here)
      val sh = stage(Dedup.minhashShingleFrame(
          t(s, d, "documents"), "doc_id", "text", shingleN = 2),
        d, "dedup_minhash_sh")
      val cand = stage(Dedup.minhashCandidates(sh, numHashes = 64, bands = 16),
        d, "dedup_minhash_cand")
      Dedup.verifyJaccardMilli(sh, cand, minMilli = 200)
        .orderBy("id_a", "id_b")
    }),

    "text_decontam_fuzzy" -> ((s, d) => {
      // NEAR-duplicate benchmark decontamination — the fuzzy complement
      // of text_decontam's exact-gram overlap: benchmark docs (every
      // 20th) and the remaining corpus both minhash-band; a corpus doc
      // is flagged iff it shares a band bucket with a benchmark doc AND
      // exact-Jaccard over the staged shingle sets confirms ≥ 500‰.
      // The corpus only ever ships ids through the band join — the
      // benchmark side is tiny by construction, the contamination check
      // costs one banded join at any corpus size.
      val docs = t(s, d, "documents")
      val sh = stage(Dedup.minhashShingleFrame(
          docs, "doc_id", "text", shingleN = 2),
        d, "decontam_fz_sh")
      val benchSh = sh.where(col("id") % 20 === 0)
      val corpusSh = sh.where(col("id") % 20 =!= 0)
      val cand = stage(Dedup.minhashCandidatesAgainst(
          Dedup.minhashBandFrame(corpusSh, numHashes = 64, bands = 16),
          Dedup.minhashBandFrame(benchSh, numHashes = 64, bands = 16)),
        d, "decontam_fz_cand")
      Dedup.verifyJaccardMilli(sh, cand, minMilli = 500)
        .select(col("id_a").as("corpus_id"), col("id_b").as("benchmark_id"),
          col("jaccard_milli"))
        .orderBy("corpus_id", "benchmark_id")
    }),

    "dedup_minhash_capped" -> ((s, d) => {
      // the LSH hot-bucket cap (VERDICT r10 #4) made ORACLE-EXACT:
      // capping is deterministic (drop (band,bucket) groups over the
      // bound before the self-join), so DuckDB recomputes the capped
      // candidate set from the staged band frame and re-verifies the
      // exact Jaccard — the recall trade is pinned by value, not just
      // by the ScalaTest property. maxBucket=2 BITES at sf0.01 (the
      // band frame's largest buckets hold 3 docs; 14 such buckets are
      // dropped) while verification keeps precision exact.
      val sh = stage(Dedup.minhashShingleFrame(
          t(s, d, "documents"), "doc_id", "text", shingleN = 2),
        d, "dedup_cap_sh")
      val bands = stage(Dedup.minhashBandFrame(sh, 64, 16),
        d, "dedup_cap_bands")
      Dedup.verifyJaccardMilli(sh,
          Dedup.minhashCandidatesFromBands(bands, maxBucket = 2),
          minMilli = 200)
        .orderBy("id_a", "id_b")
    }),

    "dedup_minhash_salted" -> ((s, d) => {
      // the salted RE-SPLIT half of the hot-bucket defense (the recall-
      // preserving alternative to dedup_minhash_capped's drop): each
      // oversized (band, bucket) splits into ceil(n/maxBucket)
      // sub-buckets by the portable hash of the id — pairs emit within
      // sub-buckets plus one star of representative links per split
      // bucket, so true boilerplate clusters stay CONNECTED while pair
      // emission stays linear in n. Fully deterministic, so DuckDB
      // recomputes the identical candidate set (sub-bucket salts, reps,
      // hubs, star links) from the staged band frame and re-verifies
      // the exact Jaccard. maxBucket=2 bites at sf0.01 like the capped
      // entry, making the two defenses value-comparable side by side.
      val sh = stage(Dedup.minhashShingleFrame(
          t(s, d, "documents"), "doc_id", "text", shingleN = 2),
        d, "dedup_salt_sh")
      val bands = stage(Dedup.minhashBandFrame(sh, 64, 16),
        d, "dedup_salt_bands")
      Dedup.verifyJaccardMilli(sh,
          Dedup.minhashCandidatesSalted(bands, maxBucket = 2),
          minMilli = 200)
        .orderBy("id_a", "id_b")
    }),

    "dedup_minhash_incr" -> ((s, d) => {
      // incremental dedup (the daily-crawl shape): the odd-doc
      // increment probes a PERSISTED band index of the even-doc corpus
      // — the index is a maintained GRAFT TABLE (CDC appends, manifest
      // versioning, compaction), so it inherits the engine's durability
      // instead of living as loose parquet; it is never recomputed.
      // candidates = cross(new vs index) ∪ within(increment);
      // composition with the batch path is exact (spec'd); the oracle
      // re-verifies Jaccard over the staged sets. The corpus is
      // tokenized exactly ONCE (the staged shingle frame feeds
      // everything); each side is signed exactly once.
      val sh = stage(Dedup.minhashShingleFrame(
          t(s, d, "documents"), "doc_id", "text", shingleN = 2),
        d, "dedup_incr_sh")
      val oldHs = sh.where(col("id") % 2 === 0)
      val newHs = sh.where(col("id") % 2 === 1)
      // the index table: banded corpus ingested through the CDC batch
      // path (append-only, fully distributed), read back via the
      // engine's committed-snapshot read
      val idxTable = GraftTable.create(s, freshDir("dedup-idx"),
        SchemaDsl.struct("id" -> "int64", "band" -> "int32",
          "bucket" -> "int32"),
        Identity.None, ingestCfg)
      CdcPipeline.applyBatch(idxTable,
        Dedup.minhashBandFrame(oldHs, 64, 16).select(
          lit("i").as("_op"),
          (monotonically_increasing_id() + 1L).as("_lsn"),
          col("id"), col("band"), col("bucket")))
      val idxBands = idxTable.read(scala.None)
      val newBands = stage(Dedup.minhashBandFrame(newHs, 64, 16),
        d, "dedup_incr_new_bands")
      val cand = stage(
        Dedup.minhashCandidatesAgainst(newBands, idxBands)
          .unionByName(Dedup.minhashCandidatesFromBands(newBands)),
        d, "dedup_incr_cand")
      val out = Dedup.verifyJaccardMilli(sh, cand, minMilli = 200)
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"),
          col("jaccard_milli"))
        .orderBy("id_a", "id_b")
      // index maintenance: the increment's bands append into the same
      // table (next day's increment probes them too) as ONE batched
      // append with no in-entry compaction — folding the index's small
      // files belongs to the table's periodic maintenance job (the verb
      // cdc_compact_state proves), not to every increment's critical
      // path. `cand` is already materialized (staged), so this cannot
      // perturb the result.
      CdcPipeline.applyBatch(idxTable,
        newBands.select(lit("i").as("_op"),
          (monotonically_increasing_id() + idxTable.commitLsn + 1L).as("_lsn"),
          col("id"), col("band"), col("bucket")))
      out
    }),

    "dedup_bloom_incr" -> ((s, d) => {
      // Incremental EXACT dedup with a Bloom prefilter — "dedup the
      // daily crawl against all history" without re-shuffling history:
      // a broadcast Bloom of the even-doc (history) fingerprints routes
      // increment rows; filter-negative rows are definitely new and
      // never join, the positive sliver is anti-join-verified on the
      // fingerprint column alone. Result is EXACT (bloom has no false
      // negatives), so the oracle is the plain anti-join in SQL. The
      // increment replays a tenth of history id-shifted (the raw corpus
      // has no exact dups at sf0.01 — without the replay the dup path
      // would be vacuous).
      val fps = t(s, d, "documents").select(col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp"))
      val hist = fps.where(col("doc_id") % 2 === 0)
      val incr = fps.where(col("doc_id") % 2 === 1)
        .unionByName(
          fps.where(col("doc_id") % 2 === 0 && col("doc_id") % 10 === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("fp")))
      Dedup.bloomNewDocs(hist, incr, "fp",
          expectedItems = 1L << 20, fpp = 0.01)
        .orderBy("doc_id")
    }),

    "dedup_components" -> ((s, d) => {
      // Near-dup PAIRS -> transitive duplicate CLUSTERS: A~B and B~C
      // must collapse to one cluster even though (A,C) was never a
      // candidate pair. Edges = MinHash/LSH candidates verified at
      // jaccard >= 200 milli (staged; DuckDB recomputes the components
      // over the SAME edges by recursive closure); labeling = the
      // alternating large-star/small-star contraction in
      // Dedup.connectedComponents — O(log n) rounds of groupBy+join,
      // no neighbor list ever materialized. Every document gets a row
      // (isolated docs represent themselves) so the output IS the
      // dedup verdict: keep rows where doc_id = cluster_rep.
      val sh = stage(Dedup.minhashShingleFrame(
          t(s, d, "documents"), "doc_id", "text", shingleN = 2),
        d, "dedup_comp_sh")
      val edges = stage(Dedup.verifyJaccardMilli(sh,
          Dedup.minhashCandidates(sh, numHashes = 64, bands = 16),
          minMilli = 200).select(col("id_a"), col("id_b")),
        d, "dedup_comp_edges")
      val comp = Dedup.connectedComponents(edges, "id_a", "id_b")
      val labeled = t(s, d, "documents").select(col("doc_id"))
        .join(comp, col("doc_id") === comp("id"), "left")
        .select(col("doc_id"),
          coalesce(col("comp"), col("doc_id")).as("cluster_rep"))
      val sizes = labeled.groupBy("cluster_rep")
        .agg(count(lit(1)).as("cluster_size"))
      labeled.join(sizes, "cluster_rep")
        .select(col("doc_id"), col("cluster_rep"), col("cluster_size"))
        .orderBy("doc_id")
    }),

    "dedup_keep_best" -> ((s, d) => {
      // quality-aware canonicalization: inside each near-dup cluster
      // keep the HIGHEST-quality document (tie -> lowest id) instead
      // of an arbitrary representative — the survivor-selection pass a
      // production corpus dedup runs after clustering (connectivity
      // picks the cluster, quality picks what ships to training).
      // Staged: the labeled (doc, cluster, quality) frame; the oracle
      // recomputes the argmax selection over the SAME rows. Scale: one
      // window keyed by cluster + one grouped count — both shuffle on
      // cluster_rep only; quality is integer milli (engine-exact).
      val docs = t(s, d, "documents")
      val sh = Dedup.minhashShingleFrame(docs, "doc_id", "text", shingleN = 2)
      val edges = Dedup.verifyJaccardMilli(sh,
          Dedup.minhashCandidates(sh, numHashes = 64, bands = 16),
          minMilli = 200)
        .select(col("id_a"), col("id_b"))
      val comp = Dedup.connectedComponents(edges, "id_a", "id_b")
      val labeled = stage(docs
          .select(col("doc_id"), TextOps.qualityScore(col("text")).as("q_milli"))
          .join(comp, col("doc_id") === comp("id"), "left")
          .select(col("doc_id"),
            coalesce(col("comp"), col("doc_id")).as("cluster_rep"),
            col("q_milli").cast("long").as("q_milli")),
        d, "keepbest_labeled")
      val w = Window.partitionBy(col("cluster_rep"))
        .orderBy(col("q_milli").desc, col("doc_id").asc)
      labeled.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .join(labeled.groupBy("cluster_rep")
          .agg(count(lit(1)).as("cluster_size")), "cluster_rep")
        .select(col("cluster_rep"), col("doc_id").as("kept_doc"),
          col("q_milli"), col("cluster_size"))
        .orderBy("cluster_rep")
    }),

    "dedup_simhash" -> ((s, d) => {
      // hamming <= 6 of 64: the typical near-dup band; pigeonhole
      // blocking = 7 chunks of 9+ bits, so blocks stay selective.
      // Fingerprints are staged; pigeonhole blocking has FULL recall,
      // so DuckDB's exact hamming<=6 self-join over the staged frame
      // must equal this output row-for-row.
      val fp = stage(t(s, d, "documents").select(col("doc_id").as("id"),
          TextOps.simhash64(col("text")).as("sim")),
        d, "dedup_simhash_fp")
      Dedup.simhashPairsFrom(fp, maxHamming = 6)
        .orderBy("id_a", "id_b")
    }),

    // ---- similarity search over embeddings -----------------------------

    "ann_brute_topk" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.bruteForceTopK(e, "vec_id", "embedding",
          e.where(col("vec_id") < 8), "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),

    "ann_lsh_topk" -> ((s, d) => {
      // two-stage oracle: the LSH candidate set is staged; DuckDB
      // re-scores and re-ranks it with the same cosine arithmetic as
      // ann_brute_topk (recall is asserted in ScalaTest)
      val e = t(s, d, "embeddings")
      val q = e.where(col("vec_id") < 8)
      val cand = stage(Similarity.lshCandidatePairs(e, "vec_id", "embedding",
          q, "vec_id", "embedding", nbits = 8),
        d, "ann_lsh_cand")
      Similarity.topKFromCandidates(cand, e, "vec_id", "embedding",
          q, "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),

    "ann_pq_topk" -> ((s, d) => {
      // product quantization: ADC shortlist over m=8 codes per vector
      // (~32x smaller than raw embeddings — the memory half of IVF-PQ),
      // exact-cosine refine of the shortlist only. Two-stage oracle:
      // the staged shortlist is re-ranked by DuckDB exactly like the
      // LSH/IVF entries.
      val e = t(s, d, "embeddings")
      val q = e.where(col("vec_id") < 8)
      val cb = Similarity.pqTrain(e, "vec_id", "embedding",
        m = 8, nCodes = 16, iters = 2)
      val cand = stage(Similarity.pqShortlist(
          Similarity.pqEncode(e, "vec_id", "embedding", cb), cb,
          q, "vec_id", "embedding", shortlist = 16),
        d, "ann_pq_cand")
      Similarity.topKFromCandidates(cand, e, "vec_id", "embedding",
          q, "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),

    "ann_ivfpq_topk" -> ((s, d) => {
      // true IVF-PQ: the coarse quantizer bounds the scan to the
      // probed cells, PQ codes make each scored row m table lookups;
      // exact-cosine refine of the shortlist. Same staged oracle.
      val e = t(s, d, "embeddings")
      val q = e.where(col("vec_id") < 8)
      val cb = Similarity.pqTrain(e, "vec_id", "embedding",
        m = 8, nCodes = 16, iters = 2)
      val coarse = Similarity.ivfCandidatePairs(e, "vec_id", "embedding",
        q, "vec_id", "embedding", nCells = 32, nProbe = 6)
      val cand = stage(Similarity.pqShortlistFromCandidates(coarse,
          Similarity.pqEncode(e, "vec_id", "embedding", cb), cb,
          q, "vec_id", "embedding", shortlist = 16),
        d, "ann_ivfpq_cand")
      Similarity.topKFromCandidates(cand, e, "vec_id", "embedding",
          q, "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),

    "ann_ivf_topk" -> ((s, d) => {
      // IVF-Flat scale path; same two-stage oracle as the LSH variant —
      // the probed candidate set is staged, DuckDB re-ranks it exactly
      val e = t(s, d, "embeddings")
      val q = e.where(col("vec_id") < 8)
      val cand = stage(Similarity.ivfCandidatePairs(e, "vec_id", "embedding",
          q, "vec_id", "embedding", nCells = 32, nProbe = 6),
        d, "ann_ivf_cand")
      Similarity.topKFromCandidates(cand, e, "vec_id", "embedding",
          q, "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),

    "ann_ivf_index_topk" -> ((s, d) => {
      // the deployment shape of IVF: train ONCE, persist centroids +
      // cell assignment, probe many query batches against the persisted
      // index without ever re-scanning the corpus for training. Both
      // index halves round-trip through parquet here (stage), so this
      // row proves the persisted form, not just the in-memory one; the
      // oracle re-ranks the probed candidates exactly as ann_ivf_topk's.
      val e = t(s, d, "embeddings")
      val q = e.where(col("vec_id") < 8)
      val cents = stage(Similarity.ivfTrain(e, "vec_id", "embedding",
          nCells = 32), d, "ann_ivf_centroids")
      // cell-clustered persistence: the probe's static In(cell, ...)
      // pushdown prunes row groups, so a query batch reads only its
      // probed cells' slice of the index
      val assigned = stage(Similarity.ivfAssign(e, "vec_id", "embedding",
          cents).withColumnRenamed("vec_id", "id")
          .repartitionByRange(4, col("cell")).sortWithinPartitions("cell"),
        d, "ann_ivf_assign")
      val cand = stage(Similarity.ivfCandidatesFromIndex(assigned, "id",
          cents, q, "vec_id", "embedding", nProbe = 6),
        d, "ann_ivf_index_cand")
      Similarity.topKFromCandidates(cand, e, "vec_id", "embedding",
          q, "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),

    "ann_ivf_incr" -> ((s, d) => {
      // incremental ANN (the daily-crawl shape, mirroring
      // dedup_minhash_incr): the even-id corpus trains and fills the
      // persisted index; the odd-id INCREMENT is assigned with the
      // SAME centroids — no retrain, no re-scan of the base corpus —
      // and appended to the assignment table. Queries probe the
      // union index; the exact refine covers both generations. The
      // staged candidate set is deterministic, so DuckDB re-ranks it
      // exactly as ann_ivf_index_topk's oracle does.
      val e = t(s, d, "embeddings")
      val base = e.where(col("vec_id") % 2 === 0)
      val incr = e.where(col("vec_id") % 2 === 1)
      val q = e.where(col("vec_id") < 8)
      val cents = stage(Similarity.ivfTrain(base, "vec_id", "embedding",
          nCells = 32), d, "ann_incr_centroids")
      val assigned = stage(
        Similarity.ivfAssign(base, "vec_id", "embedding", cents)
          .withColumnRenamed("vec_id", "id")
          .unionByName(Similarity.ivfAssign(incr, "vec_id", "embedding", cents)
            .withColumnRenamed("vec_id", "id")),
        d, "ann_incr_assign")
      val cand = stage(Similarity.ivfCandidatesFromIndex(assigned, "id",
          cents, q, "vec_id", "embedding", nProbe = 6),
        d, "ann_incr_cand")
      Similarity.topKFromCandidates(cand, e, "vec_id", "embedding",
          q, "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),

    "ann_ivf_graft_index" -> ((s, d) => {
      // the ANN index SERVED BY THE ENGINE: the IVF assignment lives
      // in a maintained graft table (CDC append, manifest versioning,
      // durability) instead of loose parquet; the table's own
      // optimize(clusterBy = cell) range-sorts it so manifest min/max
      // stats make cells disjoint file ranges; the probe then reads it
      // through the DSv2 scan, where the probed-cell In-filter prunes
      // to covering files — the same stat-pruning machinery
      // cdc_clustered_prune proves, now serving vector search. The
      // staged candidate set is re-ranked exactly by the oracle
      // (ann_ivf_index_topk's two-stage design).
      val e = t(s, d, "embeddings")
      val q = e.where(col("vec_id") < 8)
      val cents = stage(Similarity.ivfTrain(e, "vec_id", "embedding",
          nCells = 32), d, "ann_gt_centroids")
      val idxTable = GraftTable.create(s, freshDir("ann-idx"),
        SchemaDsl.struct("id" -> "int64", "cell" -> "int32"),
        Identity.None, ingestCfg)
      CdcPipeline.applyBatch(idxTable,
        Similarity.ivfAssign(e, "vec_id", "embedding", cents)
          .select(lit("i").as("_op"),
            (monotonically_increasing_id() + 1L).as("_lsn"),
            col("vec_id").as("id"), col("cell")))
      idxTable.optimize(clusterBy = Seq("cell"))
      val assigned = s.read.format("graft").load(idxTable.root)
        .select(col("id"), col("cell"))
      val cand = stage(Similarity.ivfCandidatesFromIndex(assigned, "id",
          cents, q, "vec_id", "embedding", nProbe = 6), d, "ann_gt_cand")
      Similarity.topKFromCandidates(cand, e, "vec_id", "embedding",
          q, "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),

    "ann_ivf_deleted" -> ((s, d) => {
      // Index correctness under DELETES (r15 ask #5): vectors
      // DV-deleted from the corpus table must never surface from the
      // PERSISTED IVF index probe. The index is deliberately STALE
      // (never rebuilt — gated below); soundness comes from the
      // probe's re-rank joining candidates against the LIVE corpus
      // read (DSv2, DV-masked), so a stale index entry is harmless:
      // its id no longer exists in the corpus scan and the
      // next-nearest fills the rank. Deletion targets = each query's
      // top-1 non-query candidate; the oracle recomputes the same
      // targets from the staged candidate set and re-ranks without
      // them (two-stage oracle — the stale index reproduces the same
      // candidate set pre/post delete by construction).
      val e = t(s, d, "embeddings")
      val q = e.where(col("vec_id") < 8)
      val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
      val corpus = GraftTable.create(s, freshDir("ann-del-corpus"),
        SchemaDsl.struct("id" -> "int64", "embedding" -> "array<float32>"),
        Identity.Keys(Seq("id")), ingestCfg)
      // §2.6 overlap: the corpus ingest and the train→assign→cluster
      // index chain are independent until the delete below — run the
      // corpus build behind the index chain's jobs
      val corpusF = bgBuild(s, "ann-del-corpus") {
        corpus.applyBatchDF(e.select(lit("i").as("_op"),
          (col("vec_id") + 1L).as("_lsn"), col("vec_id").as("id"),
          col("embedding")), maxId + 2L, hasDeletes = false)
      }
      val cents = Similarity.ivfTrain(e, "vec_id", "embedding", nCells = 32)
      val idxTable = GraftTable.create(s, freshDir("ann-del-idx"),
        SchemaDsl.struct("id" -> "int64", "cell" -> "int32"),
        Identity.None, ingestCfg)
      CdcPipeline.applyBatch(idxTable,
        Similarity.ivfAssign(e, "vec_id", "embedding", cents)
          .select(lit("i").as("_op"),
            (monotonically_increasing_id() + 1L).as("_lsn"),
            col("vec_id").as("id"), col("cell")))
      idxTable.optimize(clusterBy = Seq("cell"))
      readyBuild(corpusF)
      val assigned = s.read.format("graft").load(idxTable.root)
        .select(col("id"), col("cell"))
      val cand = stage(Similarity.ivfCandidatesFromIndex(assigned, "id",
          cents, q, "vec_id", "embedding", nProbe = 6), d, "ann_del_cand")
      val liveBefore = s.read.format("graft").load(corpus.root)
        .select(col("id"), col("embedding"))
      val del = Similarity.topKFromCandidates(
          cand.where(col("neighbor_id") >= 8), liveBefore, "id",
          "embedding", q, "vec_id", "embedding", k = 1)
        .select(col("neighbor_id")).distinct()
        .collect().map(_.getLong(0)).toSeq
      require(del.nonEmpty, "no deletion targets resolved")
      corpus.deleteWhere(col("id").isin(del: _*))
      // the index still lists every deleted id — the proof is about
      // probe-time filtering, not index maintenance
      require(s.read.format("graft").load(idxTable.root)
        .where(col("id").isin(del: _*)).count() == del.size.toLong,
        "index must be STALE (not rebuilt) for this proof")
      val live = s.read.format("graft").load(corpus.root)
        .select(col("id"), col("embedding"))
      require(live.where(col("id").isin(del: _*)).count() == 0L,
        "DV delete did not mask the corpus rows")
      val out = Similarity.topKFromCandidates(cand, live, "id",
        "embedding", q, "vec_id", "embedding", k = 5)
      require(out.where(col("neighbor_id").isin(del: _*)).count() == 0L,
        "a deleted vector surfaced from the stale index probe")
      out.orderBy("query_id", "rank")
    }),

    "ann_ivf_maintained" -> ((s, d) => {
      // Index MAINTENANCE under delete churn (VERDICT r16 #4): where
      // ann_ivf_deleted proves a STALE index is probe-SAFE (re-ranking
      // filters dead candidates), this proves the engine REPAYS the
      // probe-IO debt: >50% of the corpus dies (every file crosses the
      // reference's compaction delete-ratio, compaction_config.rs:
      // 48-55), one maintenance tick CDC-deletes the dead assignment
      // entries (IvfIndex.refresh — masked ids read from the crossed
      // files' DVs, O(deleted), BEFORE corpus compaction retires
      // them), and the refreshed index serves candidates that are
      // live-only BY THE INDEX, not merely by re-rank.
      val e = t(s, d, "embeddings")
      val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
      val cat = GraftCatalog(s, freshDir("ann-maint-cat"))
      val corpus = cat.createTable("corpus",
        SchemaDsl.struct("id" -> "int64", "embedding" -> "array<float32>"),
        Identity.Keys(Seq("id")), ingestCfg)
      // §2.6 overlap: corpus ingest runs behind the train→assign→
      // cluster chain (both tables are created on THIS thread — the
      // shared catalog's metadata store is not assumed thread-safe)
      val corpusF = bgBuild(s, "ann-maint-corpus") {
        corpus.applyBatchDF(e.select(lit("i").as("_op"),
          (col("vec_id") + 1L).as("_lsn"), col("vec_id").as("id"),
          col("embedding")), maxId + 2L, hasDeletes = false)
      }
      val cents = Similarity.ivfTrain(e, "vec_id", "embedding", nCells = 32)
      val idxTable = cat.createTable("ivf_idx",
        SchemaDsl.struct("id" -> "int64", "cell" -> "int32"),
        Identity.Keys(Seq("id")), ingestCfg)
      CdcPipeline.applyBatch(idxTable,
        Similarity.ivfAssign(e, "vec_id", "embedding", cents)
          .select(lit("i").as("_op"),
            (monotonically_increasing_id() + 1L).as("_lsn"),
            col("vec_id").as("id"), col("cell")))
      idxTable.optimize(clusterBy = Seq("cell"))
      readyBuild(corpusF)
      // 75% churn: ids ≡ 0,1,2 (mod 4) die, so EVERY corpus file sits
      // comfortably past the 0.5 delete-ratio whatever the flush split
      corpus.deleteWhere(pmod(col("id"), lit(4)) < 3)
      require(graft.operators.IvfIndex.refreshDue(corpus),
        "the 75% churn must cross the compaction delete-ratio")
      val idxBefore = idxTable.currentManifest.liveRows
      val daemon = new MaintenanceDaemon(cat)
      daemon.registerAnnIndex("ivf_idx", "corpus")
      val touched = daemon.maintenanceTick()
      require(touched.contains("ivf_idx"),
        s"the tick must refresh the registered index, touched $touched")
      // layout-proofing sweep: a file whose split landed it UNDER the
      // ratio legitimately waits for its threshold; force repays those
      // stragglers so the exact-equality gate below is independent of
      // where the size-tuned flush drew its file boundaries
      graft.operators.IvfIndex.refresh(idxTable, corpus, force = true)
      val liveCorpus = s.read.format("graft").load(corpus.root)
        .select(col("id"), col("embedding"))
      val liveN = liveCorpus.count()
      require(idxTable.currentManifest.liveRows == liveN &&
        liveN < idxBefore,
        s"index live count must shrink to the surviving corpus: " +
          s"${idxTable.currentManifest.liveRows} vs $liveN (was $idxBefore)")
      val q = e.where(col("vec_id") % 2 === 1 && col("vec_id") < 16)
      val assigned = s.read.format("graft").load(idxTable.root)
        .select(col("id"), col("cell"))
      val cand = stage(Similarity.ivfCandidatesFromIndex(assigned, "id",
          cents, q, "vec_id", "embedding", nProbe = 6), d, "ann_maint_cand")
      require(cand.where(pmod(col("neighbor_id"), lit(4)) < 3).count() == 0L,
        "a dead id surfaced from the REFRESHED index")
      Similarity.topKFromCandidates(cand, liveCorpus, "id", "embedding",
          q, "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),

    "stream_ivf_assign" -> ((s, d) => {
      // Streaming ANN index maintenance: embeddings arrive as
      // file-source micro-batches and are assigned to the PERSISTED
      // centroids (trained in batch on the even-id half; no retrain
      // in-stream — ann_ivf_incr's deployment shape, streamed). The
      // assignment is a stateless codegen'd select (NearestCells), so
      // it streams as-is. The oracle is fully independent here: DuckDB
      // recomputes every row's argmax-dot cell from the staged
      // centroids — streamed output must equal the exact batch
      // assignment, bit for bit (both sides are strict left-to-right
      // double folds; ties break to the lowest cell).
      import org.apache.spark.sql.types._
      withShufflePartitions(s, 4) {
        val e = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val cents = stage(Similarity.ivfTrain(
            e.where(col("vec_id") % 2 === 0), "vec_id", "embedding",
            nCells = 32), d, "stream_ivf_centroids")
        val srcDir = streamSourceDir(e, 4, idCol = "vec_id")
        val sch = StructType(Seq(StructField("vec_id", LongType),
          StructField("embedding", ArrayType(FloatType))))
        val stream = s.readStream.schema(sch)
          .option("maxFilesPerTrigger", "1").parquet(srcDir)
        val sink = freshDir("siv-out")
        val q = Similarity.ivfAssign(stream, "vec_id", "embedding", cents)
          .writeStream.outputMode("append").format("parquet")
          .option("path", sink)
          .option("checkpointLocation", freshDir("siv-ckpt"))
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(sink).select(col("vec_id"), col("cell"))
          .orderBy("vec_id")
      }
    }),

    "embed_pool" -> ((s, d) => {
      // chunk→document pooling: all embeddings sharing a label combine
      // into one mergeable integer-milli sum vector — one exchange on
      // (group, dim) with map-side partial sums, bit-identical under
      // any partitioning (float mean-pooling is not)
      // exploded to one (label, pos) row per dimension — scalar columns
      // hash deterministically in the driver harness where an
      // array-typed column cannot
      Similarity.meanPoolMilli(t(s, d, "embeddings"), "label", "embedding")
        .select(col("g").as("label"), col("n_vecs"),
          posexplode(col("pooled_milli")).as(Seq("pos", "sum_milli")))
        .select(col("label"), col("n_vecs"), col("pos").cast("long").as("pos"),
          col("sum_milli"))
        .orderBy("label", "pos")
    }),

    "embed_neardup" -> ((s, d) => {
      Dedup.embeddingPairs(t(s, d, "embeddings"), "vec_id", "embedding",
          blockCol = col("label"), minCosineMilli = 300)
        .orderBy("id_a", "id_b")
    }),

    "dedup_semantic" -> ((s, d) => {
      // SemDeDup: k-means cells (the IVF trainer reused as the
      // clustering stage) bound the pairwise cosine scan; lowest-id
      // representative survives per dup chain. The (id, cell)
      // assignment stages to parquet; DuckDB recomputes the
      // within-cell pair/threshold/representative stage exactly.
      val emb = t(s, d, "embeddings")
      val cents = Similarity.ivfTrain(emb, "vec_id", "embedding",
        nCells = 16, iters = 2)
      val assigned = stage(
        Similarity.ivfAssign(emb, "vec_id", "embedding", cents),
        d, "semdedup_assign")
      Dedup.semanticDupMarks(assigned, emb, "vec_id", "embedding",
          minCosineMilli = 300)
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id")
    }),

    // ---- multimodal plumbing -------------------------------------------

    "mm_frames" -> ((s, d) => {
      // frame sampling over binary media: fixed-size chunks, every
      // 3rd kept (video frame-sample plumbing); per-media frame count
      // and sampled byte volume checked exactly
      val docs = t(s, d, "documents")
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "UTF-8").as("media"))
      Multimodal.sampleFrames(docs, "media_id", "media",
          frameBytes = 4, stride = 3)
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(length(col("frame"))).as("sampled_bytes"))
        .orderBy("media_id")
    }),

    "mm_features" -> ((s, d) => {
      // binary media column fabricated from document bytes; batched
      // partition-iterator feature extraction (stub codec)
      val docs = t(s, d, "documents")
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "UTF-8").as("media"))
      Multimodal.featurize(docs, "media_id", "media", dim = 8)
        .select(col("media_id"), col("n_bytes"), col("checksum"),
          element_at(col("feature"), 1).cast("long").as("f0"))
        .orderBy("media_id")
    }),

    "mm_dedup" -> ((s, d) => {
      // content-addressed media dedup: payloads digest in place during
      // the scan, the shuffle carries (digest, id) pairs only — the
      // first pass over any crawled media corpus. The documents corpus
      // has deliberate exact-dup clusters, so n_copies > 1 groups
      // exist and the canonical keep_id choice is exercised.
      val docs = t(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      Multimodal.contentDedup(docs, "doc_id", "media")
        .orderBy("keep_id")
    }),

    "mm_audio_windows" -> ((s, d) => {
      // audio-shape overlapping byte windows (64-byte window, 48-byte
      // hop): the zero-shuffle explode scaling of chunk_documents on
      // BINARY payloads; per-window digest is the dedup/align key
      val docs = t(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      Multimodal.byteWindows(docs, "doc_id", "media",
          winBytes = 64, hopBytes = 48)
        .select(col("media_id"), col("win_id"),
          length(col("win")).cast("long").as("win_len"),
          // hex, not md5: byte-exact in BOTH engines on raw binary
          // (DuckDB's md5/sha256 take VARCHAR only), and window slices
          // must stay encoding-independent — a byte window may split a
          // multibyte char, so no string round-trip is safe
          hex(col("win")).as("win_hex"))
        .orderBy("media_id", "win_id")
    }),

    "mm_pairs" -> ((s, d) => {
      // contrastive pair construction with DETERMINISTIC negative
      // sampling (fixed multiplicative hash over the dense id space —
      // no RNG state, so retries rebuild identical training pairs);
      // negatives resolve via one id-equi join, never a cross join
      val docs = t(s, d, "documents")
      val n = docs.agg(count(lit(1))).head().getLong(0)
      Multimodal.contrastivePairs(
          docs.select(col("doc_id")), "doc_id",
          docs.select(col("doc_id"), substring(col("text"), 1, 40)
            .as("caption")), "doc_id", "caption",
          nIds = n, negatives = 2)
        .orderBy("media_id", "pair_no")
    })
  )

  // =====================================================================
  // DuckDB oracles (same parquet tables; ANSI SQL)
  // =====================================================================

  /** Unrolled k-step BPE training oracle: the WITH chain repeats the
   *  identical (pair-count → argmax → 3× delimited replace) step that
   *  `TextOps.bpeTrain` runs, so both engines compute the same merge
   *  table by construction (fixed pass count, total tie-break order). */
  private def bpeOracleSql(steps: Int): String =
    bpeCtes(steps) + "\nSELECT * FROM (" +
      (1 to steps).map { n =>
        s"SELECT CAST($n AS BIGINT) AS merge_rank, l AS sym_left, r AS sym_right, l||r AS merged, CAST(c AS BIGINT) AS pair_cnt FROM b$n"
      }.mkString("\nUNION ALL ") + ") ORDER BY merge_rank"

  /** the encode oracle re-learns the same merge chain, then applies it
   *  to every document with the identical 3-pass delimited replaces */
  private def bpeEncodeOracleSql(steps: Int): String = {
    val enc =
      """enc0 AS (
        |  SELECT doc_id,
        |         ' ' || regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' / ', 'g'), '([a-z0-9])', '\1 ', 'g') || ' ' AS sp
        |  FROM documents)""".stripMargin
    val applies = (1 to steps).map { n =>
      s"""enc$n AS (SELECT doc_id,
         |  replace(replace(replace(sp, ' '||l||' '||r||' ', ' '||l||r||' '),
         |          ' '||l||' '||r||' ', ' '||l||r||' '),
         |          ' '||l||' '||r||' ', ' '||l||r||' ') AS sp
         |  FROM enc${n - 1}, b$n)""".stripMargin
    }
    bpeCtes(steps) + ",\n" + (enc +: applies).mkString(",\n") +
      s"""
         |SELECT doc_id,
         |       CAST(len(list_filter(regexp_split_to_array(trim(sp), ' +'),
         |                            x -> x <> '' AND x <> '/')) AS BIGINT) AS n_bpe_symbols
         |FROM enc$steps ORDER BY doc_id""".stripMargin
  }

  private def bpeCtes(steps: Int): String = {
    val w0 =
      """WITH w0 AS (
        |  SELECT ' ' || regexp_replace(word, '(.)', '\1 ', 'g') AS seq, cnt
        |  FROM (SELECT word, COUNT(*) AS cnt FROM (
        |      SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-zA-Z0-9]+'), x -> x <> '')) AS word
        |      FROM documents) WHERE regexp_matches(word, '^[a-z]+$') GROUP BY word))""".stripMargin
    val stepCtes = (1 to steps).map { n =>
      s"""p$n AS (SELECT syms[i] AS l, syms[i+1] AS r, SUM(cnt) AS c
         |  FROM (SELECT string_split(trim(seq), ' ') AS syms, cnt FROM w${n - 1}) t,
         |       UNNEST(range(1, len(syms))) AS u(i)
         |  GROUP BY 1,2),
         |b$n AS (SELECT l, r, c FROM p$n ORDER BY c DESC, l, r LIMIT 1),
         |w$n AS (SELECT replace(replace(replace(seq, ' '||l||' '||r||' ', ' '||l||r||' '),
         |                    ' '||l||' '||r||' ', ' '||l||r||' '),
         |                    ' '||l||' '||r||' ', ' '||l||r||' ') AS seq, cnt
         |  FROM w${n - 1}, b$n)""".stripMargin
    }
    (w0 +: stepCtes).mkString(",\n")
  }

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(ROUND(SUM(l_quantity)*100) AS BIGINT) AS sum_qty_cents,
        |       CAST(ROUND(SUM(l_extendedprice)*100) AS BIGINT) AS sum_base_cents,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-01'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q3_top_unshipped" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |       CAST(ROUND(SUM(l_extendedprice*(1-l_discount))*100) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |  AND CAST(l_shipdate AS DATE) > DATE '1998-01-01'
        |GROUP BY 1,2 ORDER BY revenue_cents DESC, l_orderkey ASC LIMIT 10""".stripMargin,

    "q5_nation_revenue" ->
      """SELECT n_name,
        |       CAST(ROUND(SUM(l_extendedprice*(1-l_discount))*100) AS BIGINT) AS revenue_cents,
        |       count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // integer-cents average threshold + NOT EXISTS orders
    "q22_idle_customers" ->
      """WITH c AS (
        |  SELECT c_custkey, c_mktsegment,
        |         CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal_cents
        |  FROM customer),
        |thr AS (SELECT SUM(bal_cents) // COUNT(*) AS t FROM c WHERE bal_cents > 0)
        |SELECT c_mktsegment, COUNT(*) AS n,
        |       CAST(SUM(bal_cents) AS BIGINT) AS bal_cents
        |FROM c
        |WHERE bal_cents > (SELECT t FROM thr)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |                    AND o.o_orderdate < TIMESTAMP '1997-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // EXISTS-correlated late-shipment check, grouped by priority
    "q2_min_cost_supplier" ->
      """SELECT p.p_partkey, s.s_name, n.n_name,
        |       CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS cost_cents
        |FROM part p, supplier s, lineitem l, nation n, region r
        |WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
        |  AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
        |  AND r.r_name = 'EUROPE' AND p.p_size <= 10
        |  AND CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) = (
        |    SELECT MIN(CAST(ROUND(l2.l_extendedprice * 100) AS BIGINT))
        |    FROM lineitem l2, supplier s2, nation n2, region r2
        |    WHERE l2.l_partkey = p.p_partkey AND s2.s_suppkey = l2.l_suppkey
        |      AND s2.s_nationkey = n2.n_nationkey
        |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
        |GROUP BY 1, 2, 3, 4
        |ORDER BY cost_cents, p_partkey, s_name
        |LIMIT 100""".stripMargin,

    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
        |       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
        |           AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |  AND CAST(l.l_shipdate AS DATE) >= DATE '1995-01-01'
        |  AND CAST(l.l_shipdate AS DATE) <= DATE '1996-12-31'
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,

    "q4_late_orders" ->
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1995-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q6_revenue_delta" ->
      """SELECT CAST(ROUND(SUM(l_extendedprice*l_discount)*100) AS BIGINT) AS revenue_cents,
        |       count(*) AS n_rows
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |       CAST(SUM(CASE WHEN n1.n_name = 'NATION_1'
        |                 THEN CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)
        |                 ELSE 0 END) * 1000
        |            // SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT))
        |         AS BIGINT) AS share_milli,
        |       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT))
        |         AS BIGINT) AS total_cents
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |JOIN region ON n2.n_regionkey = r_regionkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q9_profit_by_nation" ->
      """SELECT n_name AS nation,
        |       CAST(year(l_shipdate) AS BIGINT) AS o_year,
        |       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100)
        |                     - ROUND(p_retailprice*l_quantity*100) AS BIGINT))
        |         AS BIGINT) AS profit_cents
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT))
        |         AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_cents DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,

    "q11_important_parts" ->
      """WITH v AS (
        |  SELECT l_partkey,
        |         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_3')
        |SELECT l_partkey AS p_partkey,
        |       CAST(SUM(cents) AS BIGINT) AS value_cents
        |FROM v
        |GROUP BY 1
        |HAVING SUM(cents) > (SELECT SUM(cents)
        |                     // (2 * COUNT(DISTINCT l_partkey)) FROM v)
        |ORDER BY value_cents DESC, p_partkey
        |LIMIT 100""".stripMargin,

    "q12_priority_shipping" ->
      """SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                 THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q13_customer_distribution" ->
      """WITH per_cust AS (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders
        |             WHERE o_orderstatus <> 'P') o
        |    ON c_custkey = o.o_custkey
        |  GROUP BY 1)
        |SELECT c_count, COUNT(*) AS custdist
        |FROM per_cust
        |GROUP BY 1
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q14_promo_effect" ->
      """WITH f AS (
        |  SELECT CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT) AS cents,
        |         p_type
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |    AND CAST(l_shipdate AS DATE) < DATE '1996-02-01')
        |SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) * 1000
        |            // SUM(cents) AS BIGINT) AS promo_milli,
        |       CAST(SUM(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END)
        |         AS BIGINT) AS promo_cents,
        |       CAST(SUM(cents) AS BIGINT) AS total_cents
        |FROM f""".stripMargin,

    "q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
        |             AS BIGINT)) AS BIGINT) AS total_cents
        |  FROM lineitem
        |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_cents
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_cents = (SELECT MAX(total_cents) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    "q16_supplier_cnt" ->
      """SELECT p_brand, p_size,
        |       COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,

    "q17_small_qty_revenue" ->
      """SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
        |       // 7 AS BIGINT) AS avg_period_cents,
        |       COUNT(*) AS n_lines
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_brand = 'Brand#1'
        |  AND l.l_quantity < (
        |    SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
        |    WHERE l2.l_partkey = p.p_partkey)""".stripMargin,

    "q18_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents,
        |       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY 1 HAVING SUM(l_quantity) > 150)
        |GROUP BY 1, 2, 3, 4
        |ORDER BY total_cents DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "q19_disjunctive_rev" ->
      """SELECT CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT))
        |         AS BIGINT) AS revenue_cents,
        |       COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 25
        |       AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 26 AND 50
        |       AND l_quantity BETWEEN 20 AND 40)""".stripMargin,

    "q20_part_promotion" ->
      """SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem
        |    WHERE l_partkey IN (
        |      SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |    GROUP BY 1
        |    HAVING 5 * CAST(SUM(CASE WHEN year(l_shipdate) = 1996
        |                   THEN l_quantity ELSE 0 END) AS BIGINT)
        |         > CAST(SUM(l_quantity) AS BIGINT))
        |ORDER BY s_suppkey""".stripMargin,

    "q21_waiting_suppliers" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND n_name = 'NATION_1'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,

    "q_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_window_top_order" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents
        |FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_totalprice DESC, o_orderkey ASC) = 1
        |ORDER BY o_custkey""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |       count(*) OVER w AS running_n,
        |       CAST(ROUND(SUM(o_totalprice) OVER w * 100) AS BIGINT) AS running_cents
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |QUALIFY o_custkey % 10 = 0
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_rollup" ->
      """SELECT COALESCE(n_name, 'ALL') AS n_name,
        |       COALESCE(c_mktsegment, 'ALL') AS c_mktsegment,
        |       count(*) AS n,
        |       CAST(ROUND(SUM(c_acctbal)*100) AS BIGINT) AS bal_cents
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, c_mktsegment)
        |ORDER BY 1, 2""".stripMargin,

    "q_grouping_sets" ->
      """SELECT COALESCE(n_name, 'ALL') AS n_name,
        |       COALESCE(c_mktsegment, 'ALL') AS c_mktsegment,
        |       count(*) AS n,
        |       CAST(ROUND(SUM(c_acctbal)*100) AS BIGINT) AS bal_cents
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name), (c_mktsegment))
        |ORDER BY 1, 2""".stripMargin,

    // CUBE levels with DuckDB's GROUPING() composed into Spark's
    // grouping_id bit order (event_type = high bit, parity = low)
    "q_cube" ->
      """SELECT COALESCE(event_type, 'ALL') AS event_type,
        |       COALESCE(parity, -1) AS parity,
        |       CAST(GROUPING(event_type) * 2 + GROUPING(parity) AS BIGINT) AS gid,
        |       COUNT(*) AS n,
        |       CAST(ROUND(SUM(value)*100) AS BIGINT) AS value_cents
        |FROM (SELECT event_type, user_id % 2 AS parity, value FROM events)
        |GROUP BY CUBE (event_type, parity)
        |ORDER BY gid, event_type, parity""".stripMargin,

    // pivot→unpivot round-trip == the plain grouped counts
    "q_unpivot" ->
      """SELECT user_id, event_type, COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // pivot == conditional counts per event type, one grouped pass
    "q_pivot" ->
      """SELECT user_id,
        |       COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
        |       COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
        |       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |       COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
        |       COUNT(*) FILTER (WHERE event_type = 'view') AS n_view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_setops" ->
      """WITH y95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate)=1995),
        |     y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate)=1996),
        |     marked AS (
        |       SELECT 'only95' AS which, o_custkey FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
        |       UNION ALL
        |       SELECT 'both' AS which, o_custkey FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96))
        |SELECT which, count(*) AS n_customers FROM marked GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_distinct_agg" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_orderkey) AS n_orders,
        |       count(DISTINCT l_suppkey) AS n_supps,
        |       count(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // the salt is plan-internal: the oracle is the PLAIN per-key top-k
    // over the identical total order
    "q_skew_salted_topk" ->
      """WITH li AS (
        |  SELECT CASE WHEN l_partkey % 100 < 91 THEN 'hot'
        |              ELSE 'c' || CAST(l_partkey % 100 AS VARCHAR) END AS grp,
        |         l_orderkey, l_linenumber,
        |         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents
        |  FROM lineitem)
        |SELECT grp,
        |       CAST(row_number() OVER w AS BIGINT) AS rk,
        |       price_cents, l_orderkey, l_linenumber
        |FROM li
        |WINDOW w AS (PARTITION BY grp
        |             ORDER BY price_cents DESC, l_orderkey, l_linenumber)
        |QUALIFY rk <= 5
        |ORDER BY grp, rk""".stripMargin,

    // the salt is plan-internal: the oracle is the PLAIN skewed join
    "q_skew_salted_join" ->
      """WITH fact AS (
        |  SELECT CASE WHEN l_orderkey % 50 < 45 THEN 0
        |              ELSE l_orderkey % 50 END AS jk,
        |         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents
        |  FROM lineitem),
        |dim AS (SELECT range AS jk, 'd' || CAST(range AS VARCHAR) AS label
        |        FROM range(0, 50))
        |SELECT label, count(*) AS n_rows,
        |       CAST(SUM(price_cents) AS BIGINT) AS sum_cents
        |FROM fact JOIN dim USING (jk)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // identical Weyl hash ⇒ DuckDB replays the exact permutation
    "shard_shuffle" ->
      """WITH k AS (
        |  SELECT doc_id, n_chars,
        |         (doc_id * 2654435761) % 2147483648 AS skey
        |  FROM documents)
        |SELECT skey % 8 AS shard,
        |       CAST(row_number() OVER (PARTITION BY skey % 8
        |                               ORDER BY skey, doc_id) AS BIGINT) AS pos,
        |       doc_id, n_chars
        |FROM k ORDER BY shard, pos""".stripMargin,

    "q_exact_quantiles" ->
      """WITH v AS (SELECT l_extendedprice AS x FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |n AS (SELECT count(*) AS n FROM v),
        |r AS (SELECT x, row_number() OVER (ORDER BY x) AS rk FROM v),
        |p(p) AS (VALUES (50), (90), (99))
        |SELECT CAST(p.p AS BIGINT) AS percent, r.x AS value
        |FROM p, n, r
        |WHERE r.rk = greatest(1, (n.n * p.p) // 100)
        |ORDER BY percent""".stripMargin,

    "q_scalar_funcs" ->
      """SELECT o_orderkey,
        |       CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |       CAST(month(o_orderdate) AS BIGINT) AS o_month,
        |       upper(substr(o_orderpriority, 1, 1)) AS prio_initial,
        |       o_orderstatus || '-' || o_orderpriority AS status_prio,
        |       CASE WHEN o_totalprice > 200000 THEN 'big'
        |            WHEN o_totalprice > 100000 THEN 'mid'
        |            ELSE 'small' END AS bucket,
        |       CAST(o_orderkey % 7 AS BIGINT) AS key_mod,
        |       CAST(length(o_orderpriority) AS BIGINT) AS prio_len
        |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin,

    // per-group KMV recomputed with a rank window: k smallest distinct
    // hashes per event_type, same Weyl hash and BIGINT division
    "q_kmv_groups" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type,
        |         (user_id * 2654435761) % 2147483648 AS hv
        |  FROM events),
        |r AS (SELECT event_type, hv,
        |             row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
        |      FROM h),
        |a AS (SELECT event_type, count(*) AS n, max(hv) AS hk
        |      FROM r WHERE rn <= 64 GROUP BY 1),
        |x AS (SELECT event_type, count(DISTINCT user_id) AS exact_users
        |      FROM events GROUP BY 1)
        |SELECT a.event_type,
        |       CAST(CASE WHEN a.n < 64 THEN a.n
        |                 ELSE (63 * 2147483648) // a.hk END AS BIGINT) AS est_users,
        |       x.exact_users
        |FROM a JOIN x USING (event_type)
        |ORDER BY event_type""".stripMargin,

    // the IDENTICAL KMV sketch recomputed in SQL: same Weyl hash, same
    // k smallest distinct hashes, same BIGINT division
    "q_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT (l_partkey * 2654435761) % 2147483648 AS hv
        |  FROM lineitem),
        |k AS (SELECT hv FROM h ORDER BY hv LIMIT 256),
        |a AS (SELECT count(*) AS n, max(hv) AS hk FROM k)
        |SELECT (SELECT count(DISTINCT l_partkey) FROM lineitem) AS exact_distinct,
        |       CAST(CASE WHEN n < 256 THEN n
        |                 ELSE (255 * 2147483648) // hk END AS BIGINT) AS est_distinct
        |FROM a""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents
        |FROM orders ORDER BY price_cents DESC, o_orderkey ASC LIMIT 20""".stripMargin,

    "ev_hourly_agg" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
        |       count(*) AS n,
        |       CAST(ROUND(SUM(value)*100) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    // the streaming windowed state must finalize to the batch answer
    "stream_hourly_agg" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
        |       count(*) AS n,
        |       CAST(ROUND(SUM(value)*100) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    // rank-exact per-type p99 and the strictly-above count
    "ev_outliers" ->
      """WITH ranked AS (
        |  SELECT event_type,
        |         CAST(ROUND(value*100) AS BIGINT) AS value_cents,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY CAST(ROUND(value*100) AS BIGINT), event_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |thr AS (
        |  SELECT event_type, value_cents AS p99_cents FROM ranked
        |  WHERE rn = CAST(ceil(0.99 * n) AS BIGINT))
        |SELECT r.event_type, t.p99_cents,
        |       CAST(SUM(CASE WHEN r.value_cents > t.p99_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM ranked r JOIN thr t USING (event_type)
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // first-active-hour cohorts; integer hour indexes (µs DIV 3600e6)
    "ev_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS h FROM events),
        |coh AS (SELECT user_id, MIN(h) AS h0 FROM act GROUP BY 1)
        |SELECT CAST(a.h - c.h0 AS BIGINT) AS hours_since_first,
        |       COUNT(DISTINCT a.user_id) AS n_users
        |FROM act a JOIN coh c USING (user_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // ordered min-chain funnel: view -> click-after-view ->
    // purchase-after-click; depth histogram over users with a view
    "ev_funnel" ->
      """WITH ev AS (SELECT * FROM events WHERE event_id % 7 = 0),
        |m1 AS (
        |  SELECT user_id, MIN(event_id) AS view_id FROM ev
        |  WHERE event_type = 'view' GROUP BY 1),
        |m2 AS (
        |  SELECT e.user_id, MIN(e.event_id) AS click_id
        |  FROM ev e JOIN m1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.event_id > m1.view_id
        |  GROUP BY 1),
        |m3 AS (
        |  SELECT e.user_id, MIN(e.event_id) AS purchase_id
        |  FROM ev e JOIN m2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.event_id > m2.click_id
        |  GROUP BY 1)
        |SELECT CASE WHEN m3.user_id IS NOT NULL THEN 3
        |            WHEN m2.user_id IS NOT NULL THEN 2 ELSE 1 END AS depth,
        |       COUNT(*) AS n_users
        |FROM m1 LEFT JOIN m2 USING (user_id) LEFT JOIN m3 USING (user_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // streaming session windows == batch gap-sessionization: new
    // session iff t - prev >= gap (session_window's exclusive end);
    // sum over per-row cents keeps the aggregate integer-exact
    "stream_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |         CAST(ROUND(value*100) AS BIGINT) AS vc
        |  FROM events),
        |o AS (
        |  SELECT user_id, us, vc,
        |         CASE WHEN lag(us) OVER w IS NULL
        |                OR us - lag(us) OVER w >= 1800000000
        |              THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |g AS (
        |  SELECT user_id, us, vc,
        |         SUM(brk) OVER (PARTITION BY user_id ORDER BY us
        |                        ROWS BETWEEN UNBOUNDED PRECEDING
        |                        AND CURRENT ROW) AS sid
        |  FROM o)
        |SELECT user_id, MIN(us) AS session_start_us,
        |       count(*) AS n_events, CAST(SUM(vc) AS BIGINT) AS value_cents
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,

    "ev_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_us
        |  FROM events),
        |s AS (
        |  SELECT user_id,
        |         SUM(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM e)
        |SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions,
        |       count(*) AS n_events
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    "stream_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND epoch_us(p.ts) >= epoch_us(c.ts)
        | AND epoch_us(p.ts) < epoch_us(c.ts) + 14400000000
        |ORDER BY click_id, purchase_id""".stripMargin,

    "ev_interval_join" ->
      """WITH w AS (
        |  SELECT event_id AS w_id, epoch_us(ts) AS start_us,
        |         epoch_us(ts) + 600000000 AS end_us
        |  FROM events WHERE event_type = 'purchase' AND value > 150),
        |e AS (SELECT epoch_us(ts) AS us, value FROM events)
        |SELECT w.w_id, count(*) AS n_events,
        |       CAST(ROUND(SUM(e.value)*100) AS BIGINT) AS value_cents
        |FROM w JOIN e ON e.us >= w.start_us AND e.us < w.end_us
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "ev_user_stats" ->
      """SELECT user_id, count(*) AS n,
        |       count(DISTINCT event_type) AS n_types,
        |       epoch_us(MIN(ts)) AS first_us,
        |       epoch_us(MAX(ts)) AS last_us,
        |       CAST(ROUND(SUM(value)*100) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "ev_asof_join" ->
      """SELECT p.event_id, p.user_id, c.event_id AS click_event_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,

    "ev_props_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
        |       count(*) AS n,
        |       CAST(ROUND(SUM(value)*100) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_upsert_state" -> cdcUpsertOracle,

    // latest state per user, range-filtered on value (the clustered
    // pruned scan must return exactly the rows a plain filter returns)
    "cdc_clustered_prune" ->
      """WITH last AS (
        |  SELECT user_id, event_id, value FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
        |SELECT user_id,
        |       event_id AS last_event_id,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM last
        |WHERE value >= 150.0
        |ORDER BY user_id""".stripMargin,

    // latest state for the dim's 11 users (the DPP-pruned join)
    "cdc_dpp_join" ->
      """WITH last AS (
        |  SELECT user_id, event_id, value FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
        |SELECT user_id,
        |       event_id AS last_event_id,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM last
        |WHERE user_id BETWEEN 10 AND 20
        |ORDER BY user_id""".stripMargin,

    // the bucket layout is plan-internal: the oracle is the plain join
    "cdc_spj_join" ->
      """WITH ords AS (
        |  SELECT o_custkey, count(*) AS n_orders,
        |         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |           AS total_cents
        |  FROM orders GROUP BY 1)
        |SELECT c_custkey,
        |       CAST(ROUND(c_acctbal*100) AS BIGINT) AS acct_cents,
        |       n_orders, total_cents
        |FROM customer JOIN ords ON c_custkey = o_custkey
        |WHERE c_custkey % 3 = 0
        |ORDER BY c_custkey""".stripMargin,

    // latest state per user, filtered on BOTH z-ordered dimensions
    "cdc_zorder_prune" ->
      """WITH last AS (
        |  SELECT user_id, event_id, value FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
        |SELECT user_id,
        |       event_id AS last_event_id,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM last
        |WHERE user_id <= 75 AND value >= 150.0
        |ORDER BY user_id""".stripMargin,

    // net state diff between the batch-2 and batch-3 cuts of the
    // delete-carrying stream. States: latest event per user below the
    // cut, dropped when it is a purchase (the delete op). The engine
    // compares full row structs; comparing event_id here is equivalent
    // because every upsert carries a fresh event_id (= its LSN).
    "cdc_changes" ->
      """WITH b AS (SELECT min(event_id) AS lo, max(event_id) AS hi FROM events),
        |sA AS (
        |  SELECT * FROM (
        |    SELECT user_id, event_id, event_type, value FROM events
        |    WHERE event_id < (SELECT lo + 2*((hi-lo)//4+1) FROM b)
        |    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
        |  WHERE event_type <> 'purchase'),
        |sB AS (
        |  SELECT * FROM (
        |    SELECT user_id, event_id, event_type, value FROM events
        |    WHERE event_id < (SELECT lo + 3*((hi-lo)//4+1) FROM b)
        |    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
        |  WHERE event_type <> 'purchase')
        |SELECT coalesce(sB.user_id, sA.user_id) AS user_id,
        |       CASE WHEN sA.user_id IS NULL THEN 'insert'
        |            WHEN sB.user_id IS NULL THEN 'delete'
        |            ELSE 'update' END AS change_type,
        |       sB.event_id AS last_event_id,
        |       CAST(ROUND(sB.value*100) AS BIGINT) AS value_cents
        |FROM sA FULL JOIN sB ON sA.user_id = sB.user_id
        |WHERE sA.user_id IS NULL OR sB.user_id IS NULL
        |   OR sA.event_id <> sB.event_id
        |ORDER BY user_id""".stripMargin,

    // initial load %3!=0; merge evens as 'MERGED' (update|insert);
    // merge-delete %7==0
    "cdc_merge_into" ->
      """SELECT c_custkey,
        |       CASE WHEN c_custkey % 2 = 0 THEN 'MERGED'
        |            ELSE c_mktsegment END AS c_mktsegment,
        |       CAST(ROUND(c_acctbal*100) AS BIGINT) AS acctbal_cents
        |FROM customer
        |WHERE (c_custkey % 3 <> 0 OR c_custkey % 2 = 0)
        |  AND c_custkey % 7 <> 0
        |ORDER BY c_custkey""".stripMargin,

    // upsert state truncated at the batch-2 LSN cut (LSN = event_id;
    // 4 batches of span (hi-lo)//4+1 — integer division, like the
    // Scala side's Long arithmetic)
    "cdc_time_travel" ->
      """WITH b AS (SELECT min(event_id) AS lo, max(event_id) AS hi FROM events)
        |SELECT user_id,
        |       event_id AS last_event_id,
        |       event_type AS last_event_type,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM events
        |WHERE event_id < (SELECT lo + 2*((hi-lo)//4+1) FROM b)
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,
    // upsert state truncated at the end-of-batch-2 cut of THREE
    // batches (the version the restore rolls back to)
    "cdc_restore" ->
      """WITH b AS (SELECT min(event_id) AS lo, max(event_id) AS hi FROM events)
        |SELECT user_id,
        |       event_id AS last_event_id,
        |       event_type AS last_event_type,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM events
        |WHERE event_id < (SELECT lo + 2*((hi-lo)//3+1) FROM b)
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,

    // last state per user, minus rows matched by the DELETE WHERE
    // predicate (value < 150 OR last event is a purchase)
    "cdc_delete_where" ->
      """WITH last AS (
        |  SELECT user_id, event_id, event_type, value
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
        |SELECT user_id, event_id AS last_event_id,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM last
        |WHERE NOT (value < 150.0 OR event_type = 'purchase')
        |ORDER BY user_id""".stripMargin,

    // last state per user minus the purged tenth; the redelivered
    // hash-slice deletes must be invisible (exactly-once effect under
    // at-least-once delivery)
    "cdc_delete_stress" ->
      """WITH last AS (
        |  SELECT user_id, event_id, value
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
        |SELECT user_id, event_id AS last_event_id,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM last WHERE user_id % 10 <> 0
        |ORDER BY user_id""".stripMargin,

    // manifest-only aggregates over the latest-per-user state: global
    // count/min/max before deletes, live count after a predicate
    // delete, and live COUNT(col)/SUM/AVG pushed from the refreshed
    // masked-row accounting
    "cdc_agg_pushdown" ->
      """WITH last AS (
        |  SELECT user_id, event_id, event_type, value
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1),
        |live AS (SELECT * FROM last WHERE event_type <> 'purchase')
        |SELECT count(*) AS n_users,
        |       min(user_id) AS mn_user, max(user_id) AS mx_user,
        |       min(event_id) AS mn_event, max(event_id) AS mx_event,
        |       CAST(ROUND(min(value)*100) AS BIGINT) AS mn_value_cents,
        |       CAST(ROUND(max(value)*100) AS BIGINT) AS mx_value_cents,
        |       count(value) AS n_values,
        |       CAST(SUM(user_id) AS BIGINT) AS sum_users,
        |       (SELECT count(*) FROM live) AS n_after_deletes,
        |       (SELECT count(value) FROM live) AS n_values_live,
        |       (SELECT CAST(SUM(user_id) AS BIGINT) FROM live)
        |         AS sum_users_live,
        |       (SELECT CAST(ROUND(AVG(user_id)*100) AS BIGINT) FROM live)
        |         AS avg_user_c_live,
        |       (SELECT min(user_id) FROM live) AS mn_user_live,
        |       (SELECT max(user_id) FROM live) AS mx_user_live,
        |       -- phase 4: the synthetic boundary-split table (ids
        |       -- 1..200 across batches split at 100/101, v NULL on
        |       -- id%10=0, id=161 deleted) — same arithmetic in SQL
        |       (SELECT count(*) FROM range(1, 201)) AS flt_n_all,
        |       (SELECT count(*) FROM range(101, 201)) AS flt_n_upper,
        |       (SELECT count(*) FROM range(101, 201) WHERE range % 10 <> 0)
        |         AS flt_nv_upper,
        |       (SELECT CAST(SUM(range) AS BIGINT) FROM range(101, 201)
        |        WHERE range % 10 <> 0) AS flt_sumv_upper,
        |       CAST(101 AS BIGINT) AS flt_mn_upper,
        |       CAST(200 AS BIGINT) AS flt_mx_upper,
        |       (SELECT count(*) FROM range(150, 201)) AS flt_n_mid,
        |       (SELECT count(*) FROM range(101, 201) WHERE range <> 161)
        |         AS flt_n_upper_del,
        |       (SELECT count(*) FROM range(101, 201)
        |        WHERE range % 10 <> 0 AND range <> 161) AS flt_nv_upper_live,
        |       -- phase 5/6: the tenant-split table (ids 1..100 =
        |       -- 'alpha' k=1, 101..200 = 'beta' k=2, v = id) plus the
        |       -- 2-row long-string table and the k = id%3 mixed table
        |       (SELECT count(*) FROM range(1, 101)) AS str_n_alpha,
        |       (SELECT count(*) FROM range(101, 201)) AS str_n_beta,
        |       (SELECT CAST(SUM(range) AS BIGINT) FROM range(101, 201))
        |         AS str_sum_beta,
        |       CAST(2 AS BIGINT) AS str_n_long,
        |       CAST(2 AS BIGINT) AS grp_groups,
        |       (SELECT count(*) FROM range(101, 201)) AS grp_k2_n,
        |       (SELECT CAST(SUM(range) AS BIGINT) FROM range(101, 201))
        |         AS grp_k2_sum,
        |       CAST(200 AS BIGINT) AS grp_k2_mx,
        |       (SELECT count(*) FROM range(1, 101)) AS grp_t_alpha_n,
        |       (SELECT count(*) FROM range(1, 201) WHERE range % 3 = 1)
        |         AS grp_mix_k1_n,
        |       (SELECT count(*) FROM range(101, 201)) AS grp_flt_beta_n
        |FROM last""".stripMargin,

    // exact decimal build mirrored (integer cents -> ×0.01 -> cast, all
    // exact in both engines); live = the deleteWhere complement. Cents
    // are emitted as BIGINT so DuckDB/Spark decimal result-type widths
    // never enter the comparison.
    "cdc_agg_decimal" ->
      """WITH src AS (
        |  SELECT event_id, user_id,
        |         CASE WHEN event_id % 40 = 0 THEN NULL
        |              ELSE CAST(CAST(user_id * 100 + event_id % 100
        |                     AS DECIMAL(14,2)) * CAST(0.01 AS DECIMAL(3,2))
        |                   AS DECIMAL(12,2)) END AS amt
        |  FROM events WHERE event_id % 4 = 0),
        |live AS (SELECT * FROM src WHERE user_id % 5 <> 0)
        |SELECT (SELECT count(*) FROM src) AS n_rows,
        |       (SELECT count(amt) FROM src) AS n_amt,
        |       (SELECT CAST(CAST(SUM(amt) AS DECIMAL(18,2)) * 100 AS BIGINT)
        |          FROM src) AS sum_cents,
        |       (SELECT CAST(MIN(amt) * 100 AS BIGINT) FROM src) AS mn_cents,
        |       (SELECT CAST(MAX(amt) * 100 AS BIGINT) FROM src) AS mx_cents,
        |       (SELECT count(*) FROM live) AS n_live,
        |       (SELECT count(amt) FROM live) AS n_amt_live,
        |       (SELECT CAST(CAST(SUM(amt) AS DECIMAL(18,2)) * 100 AS BIGINT)
        |          FROM live) AS sum_cents_live,
        |       (SELECT CAST(MIN(amt) * 100 AS BIGINT) FROM live)
        |         AS mn_cents_live,
        |       (SELECT CAST(MAX(amt) * 100 AS BIGINT) FROM live)
        |         AS mx_cents_live""".stripMargin,

    // last state per user; matched rows (last event is a click) carry
    // the UPDATE's assignments (value doubled, type rebranded)
    "cdc_update_where" ->
      """WITH last AS (
        |  SELECT user_id, event_id, event_type, value
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
        |SELECT user_id, event_id AS last_event_id,
        |       CASE WHEN event_type = 'click' THEN 'click2x'
        |            ELSE event_type END AS last_event_type,
        |       CAST(ROUND(CASE WHEN event_type = 'click' THEN value * 2.0
        |                       ELSE value END * 100) AS BIGINT) AS value_cents
        |FROM last
        |ORDER BY user_id""".stripMargin,

    // plain upsert state; the renamed column carries the old values
    "cdc_rename_col" ->
      """SELECT user_id,
        |       event_id AS last_event_id,
        |       event_type AS last_etype,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,

    // vcents = cents before the widen cut (batch 1, stored INT32),
    // cents + 3e9 (beyond int range) from batch 2 on
    // same widen contract as cdc_alter_widen, but the alters (widen +
    // rename) arrive as SQL DDL through the V2 catalog
    "cdc_sql_alter" ->
      """WITH b AS (SELECT min(event_id) AS lo, max(event_id) AS hi FROM events),
        |last AS (
        |  SELECT user_id, event_id, value FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
        |SELECT user_id, event_id AS last_event_id,
        |       CASE WHEN event_id >= (SELECT lo + ((hi-lo)//2+1) FROM b)
        |            THEN CAST(ROUND(value*100) AS BIGINT) + 3000000000
        |            ELSE CAST(ROUND(value*100) AS BIGINT) END AS value_cents
        |FROM last ORDER BY user_id""".stripMargin,

    "cdc_alter_widen" ->
      """WITH b AS (SELECT min(event_id) AS lo, max(event_id) AS hi FROM events),
        |last AS (
        |  SELECT user_id, event_id, value FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
        |SELECT user_id, event_id AS last_event_id,
        |       CASE WHEN event_id >= (SELECT lo + ((hi-lo)//2+1) FROM b)
        |            THEN CAST(ROUND(value*100) AS BIGINT) + 3000000000
        |            ELSE CAST(ROUND(value*100) AS BIGINT) END AS vcents
        |FROM last ORDER BY user_id""".stripMargin,

    // per-commit live-row accounting recomputed from raw events: each
    // of the 4 batch commits' LSN is the max event_id below its cut;
    // live rows at a cut = users whose latest event there is not a
    // purchase (the delete op)
    // the SQL twin of cdc_meta_history: same 4-batch cuts, queried as
    // the `t$history` metadata table
    "cdc_sql_history" ->
      """WITH b AS (SELECT min(event_id) AS lo, max(event_id) AS hi FROM events),
        |cuts AS (
        |  SELECT (SELECT max(event_id) FROM events
        |          WHERE event_id < (SELECT lo + i*((hi-lo)//4+1) FROM b)) AS commit_lsn
        |  FROM generate_series(1, 4) t(i)),
        |state AS (
        |  SELECT c.commit_lsn, e.user_id, e.event_type,
        |         row_number() OVER (PARTITION BY c.commit_lsn, e.user_id
        |                            ORDER BY e.event_id DESC) AS rn
        |  FROM events e JOIN cuts c ON e.event_id <= c.commit_lsn)
        |SELECT commit_lsn, count(*) AS live_rows
        |FROM state WHERE rn = 1 AND event_type <> 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_meta_history" ->
      """WITH b AS (SELECT min(event_id) AS lo, max(event_id) AS hi FROM events),
        |cuts AS (
        |  SELECT (SELECT max(event_id) FROM events
        |          WHERE event_id < (SELECT lo + i*((hi-lo)//4+1) FROM b)) AS commit_lsn
        |  FROM generate_series(1, 4) t(i)),
        |state AS (
        |  SELECT c.commit_lsn, e.user_id, e.event_type,
        |         row_number() OVER (PARTITION BY c.commit_lsn, e.user_id
        |                            ORDER BY e.event_id DESC) AS rn
        |  FROM events e JOIN cuts c ON e.event_id <= c.commit_lsn)
        |SELECT commit_lsn, count(*) AS live_rows
        |FROM state WHERE rn = 1 AND event_type <> 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_cached_read" -> cdcUpsertOracle,
    "cdc_dsv2_read" -> cdcUpsertOracle,

    // ten point probes = the upsert state restricted to those keys
    "cdc_point_lookup" ->
      """SELECT user_id,
        |       event_id AS last_event_id,
        |       event_type AS last_event_type,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM events
        |WHERE user_id IN (7, 14, 21, 28, 35, 42, 49, 56, 63, 70)
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,
    // streaming CDC sink folds to the same final state as batch upserts
    "cdc_stream_upsert_sink" -> cdcUpsertOracle,
    // CALL optimize/vacuum must preserve the exact fold
    // upsert fold minus the in-entry currency-lifecycle DELETE of user 3
    "cdc_sql_call" ->
      """SELECT user_id,
        |       event_id AS last_event_id,
        |       event_type AS last_event_type,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |  AND user_id <> 3
        |ORDER BY user_id""".stripMargin,
    "cdc_delete_state" -> cdcDeleteOracle,
    "cdc_compact_state" -> cdcDeleteOracle,
    "cdc_sql_view" ->
      """WITH last AS (
        |  SELECT user_id, event_type, value
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
        |SELECT event_type AS last_event_type, count(*) AS n_users,
        |       CAST(ROUND(SUM(value)*100) AS BIGINT) AS value_cents
        |FROM last GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_streaming_e2e" -> cdcUpsertOracle,
    "cdc_initial_copy" -> cdcUpsertOracle,
    "cdc_union_read" -> cdcUpsertOracle,

    "cdc_append_scan" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(ROUND(SUM(value)*100) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // every event exactly once through the streaming source
    // restart replays the boundary epoch; the watermark must no-op it
    "cdc_stream_sink_restart" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(ROUND(SUM(value)*100) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // every feed row lands exactly once whatever the epoch count
    "cdc_stream_sink" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(ROUND(SUM(value)*100) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_stream_source" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(ROUND(SUM(value)*100) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_stream_xact" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(ROUND(SUM(value)*100) AS BIGINT) AS value_cents
        |FROM events
        |WHERE user_id % 3 = 0 AND user_id % 8 <> 3
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_wal_replay" ->
      """SELECT user_id, event_id AS last_event_id,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM events
        |WHERE user_id % 7 = 0
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,

    "cdc_alter_drop" ->
      """SELECT user_id, event_id AS last_event_id,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,

    "cdc_index_merge" ->
      """WITH last AS (
        |  SELECT user_id, event_id, event_type, value
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
        |SELECT user_id, event_id AS last_event_id,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM last WHERE event_type <> 'purchase'
        |ORDER BY user_id""".stripMargin,

    "cdc_drop_recreate" -> cdcUpsertOracle,

    "cdc_alter_add" ->
      """SELECT user_id, event_id AS last_event_id,
        |       CASE WHEN user_id % 10 = 0 THEN 'readded' END AS readded_type,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,

    "cdc_pgoutput" ->
      """SELECT user_id, event_id AS last_event_id,
        |       event_type AS last_event_type,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM events WHERE user_id % 20 = 3
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,

    "cdc_pg_socket" ->
      """SELECT user_id, event_id AS last_event_id,
        |       event_type AS last_event_type,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM events WHERE user_id % 20 = 9
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,

    // snapshot ∪ catch-up at the USE_SNAPSHOT boundary = the plain
    // last-event fold: the split point is invisible when the slot's
    // consistent point is honored (the entry gates that it is)
    "cdc_pg_mirror" ->
      """SELECT user_id, event_id AS last_event_id,
        |       event_type AS last_event_type,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM events WHERE user_id % 20 = 11
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,

    "cdc_pg_shared" ->
      """WITH last AS (
        |  SELECT user_id, event_id, event_type, value
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
        |SELECT 'a' AS src, user_id, event_id AS last_event_id,
        |       event_type AS last_event_type,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM last WHERE user_id % 20 = 11
        |UNION ALL
        |SELECT 'b' AS src, user_id, event_id AS last_event_id,
        |       event_type AS last_event_type,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM last WHERE user_id % 20 = 13
        |ORDER BY src, user_id""".stripMargin,

    "cdc_rest_catalog" ->
      """WITH last AS (
        |  SELECT user_id, event_id, event_type, value
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
        |SELECT user_id, event_id AS last_event_id,
        |       event_type AS last_event_type,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM last WHERE event_type <> 'view'
        |ORDER BY user_id""".stripMargin,

    "cdc_iceberg_commit" ->
      """WITH last AS (
        |  SELECT user_id, event_id, event_type, value
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
        |SELECT user_id, event_id AS last_event_id,
        |       event_type AS last_event_type,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM last WHERE event_type <> 'view'
        |ORDER BY user_id""".stripMargin,

    "cdc_catalog_recovery" ->
      """SELECT user_id,
        |       event_id AS last_event_id,
        |       event_type AS last_event_type,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,

    "cdc_table_status" ->
      """SELECT 'graft' AS database, 'ev_kv_st' AS table_name,
        |       max(event_id) AS commit_lsn, max(event_id) AS flush_lsn,
        |       count(DISTINCT user_id) AS cardinality FROM events
        |UNION ALL
        |SELECT 'graft', 'ev_log_st', max(event_id), max(event_id),
        |       count(*) FROM events
        |ORDER BY table_name""".stripMargin,

    "cdc_expire_versions" -> cdcUpsertOracle,

    "cdc_catalog_sql" ->
      """SELECT user_id,
        |       event_id AS last_event_id,
        |       event_type AS last_event_type,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM events WHERE user_id % 4 = 1
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,

    // upsert fold, then the SQL UPDATE's assignments on matched final
    // states — identical contract to cdc_update_where, driven through
    // the row-level operation API
    "cdc_sql_update" ->
      """WITH last AS (
        |  SELECT user_id, event_id, event_type, value
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
        |SELECT user_id, event_id AS last_event_id,
        |       CASE WHEN event_type = 'click' THEN 'click2x'
        |            ELSE event_type END AS last_event_type,
        |       CAST(ROUND(CASE WHEN event_type = 'click' THEN value * 2.0
        |                       ELSE value END * 100) AS BIGINT) AS value_cents
        |FROM last
        |ORDER BY user_id""".stripMargin,

    // MERGE semantics replayed by hand: matched user_id%3=0 rows drop
    // (even event count) or re-value to the count; user_id%3=1 inserts
    // at a shifted key; everything else is untouched final state
    "cdc_sql_merge" ->
      """WITH last AS (
        |  SELECT user_id, event_id, event_type, value
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1),
        |src AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id)
        |SELECT * FROM (
        |  SELECT l.user_id, l.event_id AS last_event_id,
        |         l.event_type AS last_event_type,
        |         CAST(ROUND(l.value*100) AS BIGINT) AS value_cents
        |  FROM last l WHERE l.user_id % 3 <> 0
        |  UNION ALL
        |  SELECT l.user_id, l.event_id, 'merged', CAST(s.n * 100 AS BIGINT)
        |  FROM last l JOIN src s USING (user_id)
        |  WHERE l.user_id % 3 = 0 AND s.n % 2 <> 0
        |  UNION ALL
        |  SELECT s.user_id + 100000, s.n, 'inserted', CAST(s.n * 100 AS BIGINT)
        |  FROM src s WHERE s.user_id % 3 = 1
        |) ORDER BY user_id""".stripMargin,

    // upsert fold (last event per user), then the SQL DELETE's
    // predicate removes matching FINAL states — same contract as
    // cdc_delete_where, but driven through DELETE FROM
    "cdc_sql_delete" ->
      """WITH last AS (
        |  SELECT user_id, event_id, event_type, value
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
        |SELECT user_id, event_id AS last_event_id,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM last
        |WHERE NOT (value < 150.0 OR event_type = 'purchase')
        |ORDER BY user_id""".stripMargin,

    "cdc_sql_insert" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(ROUND(SUM(value)*100) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // after CTAS(%4=0) + INSERT(%4=3) + TRUNCATE + INSERT(%4=1) +
    // OVERWRITE(%4=2) + INSERT(%4=1), the live content is %4 in (1,2)
    "cdc_sql_overwrite" ->
      """SELECT user_id, count(*) AS n,
        |       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT)
        |         AS value_cents
        |FROM events WHERE user_id % 4 IN (1, 2)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_sql_time_travel" ->
      """SELECT user_id,
        |       event_id AS last_event_id,
        |       event_type AS last_event_type,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM events
        |WHERE event_id < (SELECT MIN(event_id) + (MAX(event_id)-MIN(event_id))//2 + 1 FROM events)
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,

    "cdc_chaos_recovery" ->
      """SELECT user_id,
        |       event_id AS last_event_id,
        |       event_type AS last_event_type,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM events WHERE user_id % 10 = 7
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,

    "cdc_delta_commit" ->
      """WITH last AS (
        |  SELECT user_id, event_id, event_type, value
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
        |SELECT user_id, event_id AS last_event_id,
        |       event_type AS last_event_type,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM last WHERE event_type <> 'view'
        |ORDER BY user_id""".stripMargin,

    "cdc_iceberg_restore" ->
      """WITH last AS (
        |  SELECT user_id, event_id, event_type, value
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
        |SELECT user_id, event_id AS last_event_id,
        |       event_type AS last_event_type,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM last WHERE event_type <> 'view'
        |ORDER BY user_id""".stripMargin,

    "cdc_chaos_sql" ->
      """WITH last AS (
        |  SELECT user_id, event_id, event_type, value FROM events
        |  WHERE user_id % 10 = 3
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
        |SELECT user_id, event_id AS last_event_id,
        |       CASE WHEN user_id % 9 = 1 THEN 'epoch'
        |            ELSE event_type END AS last_event_type,
        |       CAST(ROUND(CASE WHEN user_id % 9 = 1 THEN 555.0
        |                       ELSE value + 10 END * 100) AS BIGINT) AS value_cents
        |FROM last WHERE user_id % 7 <> 0
        |ORDER BY user_id""".stripMargin,

    "cdc_maintenance_timer" ->
      """SELECT user_id,
        |       event_id AS last_event_id,
        |       event_type AS last_event_type,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM events WHERE user_id % 10 = 3
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,

    "obs_metrics_export" ->
      """SELECT 'graft.commits' AS metric_name, CAST(2 AS BIGINT) AS value_int
        |UNION ALL
        |SELECT 'graft.rows_ingested', count(*) FROM events
        |ORDER BY metric_name""".stripMargin,

    "cdc_schema_evolve" ->
      """SELECT user_id, event_id AS last_event_id,
        |       CASE WHEN event_id > (SELECT (MIN(event_id)+MAX(event_id))//2 FROM events)
        |            THEN event_type END AS src,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,

    "cdc_bulk_load" ->
      """WITH last AS (
        |  SELECT user_id, event_id, event_type, value
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
        |SELECT user_id, event_id AS last_event_id,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM last WHERE event_type <> 'purchase'
        |ORDER BY user_id""".stripMargin,

    "cdc_rpc_scan" ->
      """WITH last AS (
        |  SELECT user_id, event_id, event_type, value
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
        |SELECT user_id, event_id AS last_event_id,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM last WHERE event_type <> 'purchase'
        |ORDER BY user_id""".stripMargin,

    "proto_row_ingest" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(ROUND(SUM(value)*100) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "kafka_avro_ingest" ->
      """SELECT CASE WHEN event_type = 'view' THEN '(null)' ELSE event_type END AS etype,
        |       count(*) AS n,
        |       CAST(ROUND(SUM(value)*100) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "kafka_avro_binary" ->
      """SELECT CASE WHEN event_type = 'view' THEN '(null)' ELSE event_type END AS etype,
        |       count(*) AS n,
        |       CAST(ROUND(SUM(value)*100) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "rest_http_ingest" ->
      """SELECT user_id,
        |       event_id AS last_event_id,
        |       event_type AS last_event_type,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM events
        |WHERE user_id IN (7, 27, 47, 67)
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,

    "serve_lifecycle" ->
      """SELECT user_id, event_id AS last_event_id,
        |       event_type AS last_event_type,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM events WHERE user_id = 7
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,

    "rest_map_ingest" ->
      """SELECT user_id, event_id AS last_eid, event_id*2 AS last_eid2,
        |       CAST(3 AS BIGINT) AS n_keys
        |FROM events WHERE user_id IN (7, 27)
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,

    "cdc_inlist_probe" ->
      """SELECT event_id, event_type,
        |       CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM events WHERE event_id % 7 = 0
        |ORDER BY event_id""".stripMargin,

    "otel_metrics_agg" ->
      """SELECT user_id, count(*) AS n,
        |       CAST(ROUND(SUM(value)*100) AS BIGINT) AS value_cents,
        |       epoch_us(MIN(ts)) AS first_us
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "otel_pb_ingest" ->
      """SELECT user_id, count(*) AS n,
        |       CAST(ROUND(SUM(value)*100) AS BIGINT) AS value_cents,
        |       epoch_us(MIN(ts)) AS first_us,
        |       count(*) AS n_exemplars,
        |       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS exemplar_cents,
        |       epoch_us(MAX(ts)) AS span_max_us,
        |       count(*) AS n_entity
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // quality keep-set → normalized-md5 dedup (min-id rep) → mixture
    // weights over survivors — each stage the standalone entry's SQL
    "pipeline_training_mix" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         unnest(list_filter(regexp_split_to_array(text, '[^a-zA-Z0-9]+'), x -> x <> '')) AS token
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |         list_reduce(
        |           list_prepend(CAST(0 AS BIGINT),
        |             list_transform(regexp_split_to_array(token, ''),
        |               c -> CAST(CASE WHEN ascii(c) BETWEEN 65 AND 90
        |                              THEN ascii(c) + 32
        |                              ELSE ascii(c) END AS BIGINT))),
        |           (a, b) -> (a * 31 + b) % 1000000007) AS hh
        |  FROM tok),
        |keep AS (SELECT doc_id FROM h GROUP BY doc_id
        |         HAVING SUM(((hh % 4096) * 2654435761) % 2001 - 1000) >= 0),
        |reps AS (
        |  SELECT MIN(d.doc_id) AS doc_id
        |  FROM documents d JOIN keep USING (doc_id)
        |  GROUP BY md5(trim(lower(regexp_replace(d.text, '[^a-zA-Z0-9]+', ' ', 'g'))))),
        |per AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |         CAST(SUM(len(list_filter(regexp_split_to_array(text, '[^a-zA-Z0-9]+'), x -> x <> ''))) AS BIGINT) AS n_tokens
        |  FROM documents JOIN reps USING (doc_id) GROUP BY 1),
        |tot AS (SELECT SUM(n_tokens) AS t FROM per),
        |w AS (SELECT source, n_docs, n_tokens,
        |             CAST((n_tokens * 1000) // (SELECT t FROM tot) AS BIGINT) AS share_milli,
        |             CAST(floor(sqrt((n_tokens * 1000000) // (SELECT t FROM tot))) AS BIGINT) AS temp_w
        |      FROM per)
        |SELECT source, n_docs, n_tokens, share_milli,
        |       CAST((temp_w * 1000) // (SELECT SUM(temp_w) FROM w) AS BIGINT) AS mix_milli
        |FROM w ORDER BY source""".stripMargin,

    // identical integer pipeline: ASCII-alnum token split on the RAW
    // text, per-char lowercase fold inside the Karp-Rabin hash
    // (mod 1e9+7 — no wrapping, ports exactly), bucket pseudo-weights
    "text_quality_model" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         unnest(list_filter(regexp_split_to_array(text, '[^a-zA-Z0-9]+'), x -> x <> '')) AS token
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |         list_reduce(
        |           list_prepend(CAST(0 AS BIGINT),
        |             list_transform(regexp_split_to_array(token, ''),
        |               c -> CAST(CASE WHEN ascii(c) BETWEEN 65 AND 90
        |                              THEN ascii(c) + 32
        |                              ELSE ascii(c) END AS BIGINT))),
        |           (a, b) -> (a * 31 + b) % 1000000007) AS hh
        |  FROM tok),
        |sc AS (SELECT doc_id, COUNT(*) AS n_tokens,
        |              SUM(((hh % 4096) * 2654435761) % 2001 - 1000) AS logit
        |       FROM h GROUP BY 1)
        |SELECT doc_id, n_tokens, CAST(logit AS BIGINT) AS logit_milli,
        |       CASE WHEN logit >= 0 THEN 'keep' ELSE 'drop' END AS decision
        |FROM sc WHERE n_tokens > 0 ORDER BY doc_id""".stripMargin,

    // integer shares; temperature-1/2 via floor(sqrt(int)) — IEEE sqrt
    // is correctly rounded so both engines agree bit-exactly
    "mix_weights" ->
      """WITH per AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |         CAST(SUM(len(list_filter(regexp_split_to_array(text, '[^a-zA-Z0-9]+'), x -> x <> ''))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT SUM(n_tokens) AS t FROM per),
        |w AS (SELECT source, n_docs, n_tokens,
        |             CAST((n_tokens * 1000) // (SELECT t FROM tot) AS BIGINT) AS share_milli,
        |             CAST(floor(sqrt((n_tokens * 1000000) // (SELECT t FROM tot))) AS BIGINT) AS temp_w
        |      FROM per)
        |SELECT source, n_docs, n_tokens, share_milli,
        |       CAST((temp_w * 1000) // (SELECT SUM(temp_w) FROM w) AS BIGINT) AS mix_milli
        |FROM w ORDER BY source""".stripMargin,

    "text_bpe_train" -> bpeOracleSql(8),
    "text_bpe_encode" -> bpeEncodeOracleSql(8),

    "text_ccnet_bucket" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-zA-Z0-9]+'), x -> x <> '')) AS token
        |  FROM documents),
        |cnt AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY 1),
        |tot AS (SELECT SUM(c*c) AS s2, SUM(c) AS s1 FROM cnt),
        |doc AS (SELECT t.doc_id, SUM(cnt.c) AS sum_c, COUNT(*) AS n_tokens
        |        FROM tok t JOIN cnt USING (token) GROUP BY 1)
        |SELECT doc_id, n_tokens,
        |       CAST((sum_c * 1000) // n_tokens AS BIGINT) AS avg_count_milli,
        |       CASE WHEN (sum_c * 1000) // n_tokens >=
        |                 (SELECT (s2 * 1000) // s1 FROM tot) THEN 'head'
        |            WHEN ((sum_c * 1000) // n_tokens) * 2 <
        |                 (SELECT (s2 * 1000) // s1 FROM tot) THEN 'tail'
        |            ELSE 'middle' END AS bucket
        |FROM doc ORDER BY doc_id""".stripMargin,

    "chunk_documents" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         string_split_regex(trim(text), '\s+') AS t,
        |         len(string_split_regex(trim(text), '\s+')) AS n
        |  FROM documents WHERE trim(text) <> ''
        |)
        |, spans AS (
        |  SELECT doc_id, t, n, unnest(range(0, (n-1)//48 + 1)) AS gs FROM toks
        |)
        |SELECT doc_id,
        |       CAST(gs AS BIGINT) AS chunk_id,
        |       CAST(least(64, n - gs*48) AS BIGINT) AS chunk_tokens,
        |       md5(array_to_string(t[gs*48+1 : gs*48+64], ' ')) AS chunk_md5
        |FROM spans
        |ORDER BY doc_id, chunk_id""".stripMargin,

    "text_stats" ->
      """SELECT doc_id,
        |       CAST(len(list_filter(regexp_split_to_array(text, '[^a-zA-Z0-9]+'), x -> x <> '')) AS BIGINT) AS n_tokens,
        |       CAST(len(regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^ \t\n\x0B\f\rA-Za-z0-9]+|[ \t\n\x0B\f\r]+')) AS BIGINT) AS n_bpe_tokens,
        |       CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'), x -> x <> '')) AS BIGINT) AS n_words,
        |       CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS BIGINT) AS n_punct,
        |       GREATEST(0, LEAST(1000,
        |         2 * len(list_filter(regexp_split_to_array(text, '[^a-zA-Z0-9]+'), x -> x <> ''))
        |         + 10 * ((length(' '||text||' ') - length(replace(' '||text||' ', ' the ', ''))) // 5
        |              + (length(' '||text||' ') - length(replace(' '||text||' ', ' a ', ''))) // 3
        |              + (length(' '||text||' ') - length(replace(' '||text||' ', ' of ', ''))) // 4
        |              + (length(' '||text||' ') - length(replace(' '||text||' ', ' to ', ''))) // 4
        |              + (length(' '||text||' ') - length(replace(' '||text||' ', ' and ', ''))) // 5
        |              + (length(' '||text||' ') - length(replace(' '||text||' ', ' in ', ''))) // 4
        |              + (length(' '||text||' ') - length(replace(' '||text||' ', ' is ', ''))) // 4)
        |         - 5 * length(regexp_replace(text, '[^.!?,;:]', '', 'g'))
        |         + length(text) // 10)) AS quality,
        |       md5(trim(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g')))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_langid" -> langIdOracle,

    "pipeline_corpus_filter" -> pipelineFilterOracle,

    // streaming first-wins dedup with batches arriving in doc_id order
    // == global min-doc_id-per-fingerprint among quality-gated docs;
    // the stream carries the corpus twice (copy id-shifted past the
    // originals), so every copy must lose to its original
    "stream_corpus_filter" ->
      s"""WITH doubled AS (
         |  SELECT doc_id, lang, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents), lang, text
         |  FROM documents),
         |scored AS (
         |  SELECT doc_id, lang,
         |         CAST($qualitySqlExpr AS BIGINT) AS quality,
         |         md5(trim(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g')))) AS fp
         |  FROM doubled),
         |gated AS (SELECT * FROM scored WHERE quality >= 150)
         |SELECT doc_id, lang, quality, fp FROM gated
         |QUALIFY doc_id = min(doc_id) OVER (PARTITION BY fp)
         |ORDER BY doc_id""".stripMargin,

    "text_pii" ->
      """WITH doctored AS (
        |  SELECT doc_id,
        |         text ||
        |         CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@' || source || '.example.com' ELSE '' END ||
        |         CASE WHEN doc_id % 4 = 0 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END ||
        |         CASE WHEN doc_id % 5 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS d
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(len(regexp_extract_all(d, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |       CAST(len(regexp_extract_all(d, '(?:[0-9]{1,3}\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ips,
        |       CAST(len(regexp_extract_all(d, '(?:\+[0-9]{1,2} )?[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |       md5(regexp_replace(regexp_replace(regexp_replace(d,
        |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |           '(?:[0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g'),
        |           '(?:\+[0-9]{1,2} )?[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS red_fp
        |FROM doctored ORDER BY doc_id""".stripMargin,

    "text_gopher" ->
      """WITH base AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'repeat line alpha' || chr(10) || 'repeat line alpha' || chr(10) || '- bullet one' || chr(10) || '* bullet two' ELSE '' END ||
        |    CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'to be continued...' || chr(10) || '### heading' ELSE '' END AS text
        |  FROM documents),
        |tokstats AS (
        |  SELECT doc_id,
        |         len(list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'), x -> x <> '')) AS n_words,
        |         list_sum(list_transform(list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'), x -> x <> ''), x -> length(x))) AS tok_chars,
        |         length(text) - length(replace(text, '#', '')) AS n_hash,
        |         (length(text) - length(replace(text, '...', ''))) // 3 AS n_ellipsis
        |  FROM base),
        |linegrp AS (
        |  SELECT doc_id, line, COUNT(*) AS cnt, length(line) AS llen,
        |         CASE WHEN starts_with(ltrim(line), '-') OR starts_with(ltrim(line), '*') THEN 1 ELSE 0 END AS bullet,
        |         CASE WHEN ends_with(rtrim(line), '...') THEN 1 ELSE 0 END AS ell
        |  FROM (SELECT doc_id, line FROM base, UNNEST(string_split(text, chr(10))) AS t(line))
        |  GROUP BY doc_id, line),
        |linestats AS (
        |  SELECT doc_id, SUM(cnt) AS n_lines, SUM(cnt - 1) AS dup_occ,
        |         SUM(cnt * llen) AS line_chars, SUM((cnt - 1) * llen) AS dup_chars,
        |         SUM(cnt * bullet) AS bullet_lines, SUM(cnt * ell) AS ellipsis_lines
        |  FROM linegrp GROUP BY doc_id),
        |tk AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '[^a-zA-Z0-9]+'), x -> x <> '') AS tks FROM base),
        |gramcnt AS (
        |  SELECT doc_id, g, COUNT(*) AS cnt FROM (
        |    SELECT doc_id, tks[i] || ' ' || tks[i+1] AS g
        |    FROM tk, UNNEST(generate_series(1, len(tks) - 1)) AS u(i))
        |  GROUP BY doc_id, g),
        |gramstats AS (SELECT doc_id, MAX(cnt * (length(g) - 1)) AS top2_chars FROM gramcnt GROUP BY doc_id),
        |m AS (
        |  SELECT t.doc_id,
        |         CAST(t.n_words AS BIGINT) AS n_words,
        |         CAST(CASE WHEN t.n_words = 0 THEN 0 ELSE FLOOR(1000.0 * t.tok_chars / t.n_words) END AS BIGINT) AS mean_word_len_milli,
        |         CAST(CASE WHEN t.n_words = 0 THEN 0 ELSE FLOOR(1000.0 * (t.n_hash + t.n_ellipsis) / t.n_words) END AS BIGINT) AS symbol_ratio_milli,
        |         CAST(FLOOR(1000.0 * l.bullet_lines / l.n_lines) AS BIGINT) AS bullet_frac_milli,
        |         CAST(FLOOR(1000.0 * l.ellipsis_lines / l.n_lines) AS BIGINT) AS ellipsis_frac_milli,
        |         CAST(FLOOR(1000.0 * l.dup_occ / l.n_lines) AS BIGINT) AS dup_line_frac_milli,
        |         CAST(CASE WHEN l.line_chars = 0 THEN 0 ELSE FLOOR(1000.0 * l.dup_chars / l.line_chars) END AS BIGINT) AS dup_line_char_frac_milli,
        |         CAST(CASE WHEN t.tok_chars = 0 OR g.top2_chars IS NULL THEN 0 ELSE FLOOR(1000.0 * g.top2_chars / t.tok_chars) END AS BIGINT) AS top2gram_char_frac_milli
        |  FROM tokstats t JOIN linestats l USING (doc_id)
        |  LEFT JOIN gramstats g USING (doc_id))
        |SELECT *,
        |       CAST(CASE WHEN n_words >= 50 AND n_words <= 100000
        |         AND mean_word_len_milli >= 3000 AND mean_word_len_milli <= 10000
        |         AND symbol_ratio_milli < 100 AND bullet_frac_milli < 900
        |         AND ellipsis_frac_milli < 300 AND dup_line_frac_milli < 300
        |         AND dup_line_char_frac_milli < 200 AND top2gram_char_frac_milli < 200
        |         THEN 1 ELSE 0 END AS BIGINT) AS gopher_keep
        |FROM m ORDER BY doc_id""".stripMargin,

    "text_heavyhitters" ->
      """WITH toks AS (
        |  SELECT list_filter(regexp_split_to_array(lower(text), '[^a-zA-Z0-9]+'), x -> x <> '') AS ts
        |  FROM documents),
        |idx AS (SELECT ts, unnest(range(1, len(ts))) AS i FROM toks),
        |grams AS (SELECT ts[i] || ' ' || ts[i+1] AS gram FROM idx),
        |cnt AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt FROM grams GROUP BY gram)
        |SELECT gram, cnt FROM cnt
        |WHERE cnt >= greatest(1, (SELECT count(*) FROM grams) // 1000)
        |ORDER BY gram""".stripMargin,

    // the identical rational-idf BM25 dag: same tokenization, same
    // literals (2.2, 1.2, 0.25, 0.75), same left-assoc term-order sum
    "text_bm25" ->
      """WITH base AS (
        |  SELECT doc_id,
        |         len(list_filter(regexp_split_to_array(lower(text), '[^a-zA-Z0-9]+'),
        |             x -> x <> '')) AS dl,
        |         len(list_filter(regexp_split_to_array(lower(text), '[^a-zA-Z0-9]+'),
        |             x -> x = 'hash')) AS tf0,
        |         len(list_filter(regexp_split_to_array(lower(text), '[^a-zA-Z0-9]+'),
        |             x -> x = 'join')) AS tf1,
        |         len(list_filter(regexp_split_to_array(lower(text), '[^a-zA-Z0-9]+'),
        |             x -> x = 'spark')) AS tf2
        |  FROM documents),
        |st AS (
        |  SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
        |         sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
        |         sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |         sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
        |  FROM base)
        |SELECT doc_id,
        |       CAST(ROUND((
        |           ((n - df0 + 0.5)/(df0 + 0.5)) * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |         + ((n - df1 + 0.5)/(df1 + 0.5)) * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |         + ((n - df2 + 0.5)/(df2 + 0.5)) * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |       ) * 1000000.0) AS BIGINT) AS score_micro
        |FROM base, st
        |ORDER BY score_micro DESC, doc_id
        |LIMIT 20""".stripMargin,

    "ann_filtered_topk" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         CAST(ROUND(list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]) * 1000000) AS BIGINT) AS cosine_micro
        |  FROM embeddings c, q WHERE c.vec_id <> q.vec_id AND c.label = 2)
        |SELECT query_id, neighbor_id,
        |       CAST(row_number() OVER (PARTITION BY query_id
        |            ORDER BY cosine_micro DESC, neighbor_id ASC) AS BIGINT) AS rank,
        |       cosine_micro
        |FROM scored
        |QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "search_hybrid_rrf" ->
      """WITH base AS (
        |  SELECT doc_id,
        |         len(list_filter(regexp_split_to_array(lower(text), '[^a-zA-Z0-9]+'),
        |             x -> x <> '')) AS dl,
        |         len(list_filter(regexp_split_to_array(lower(text), '[^a-zA-Z0-9]+'),
        |             x -> x = 'hash')) AS tf0,
        |         len(list_filter(regexp_split_to_array(lower(text), '[^a-zA-Z0-9]+'),
        |             x -> x = 'join')) AS tf1,
        |         len(list_filter(regexp_split_to_array(lower(text), '[^a-zA-Z0-9]+'),
        |             x -> x = 'spark')) AS tf2
        |  FROM documents),
        |st AS (
        |  SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
        |         sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
        |         sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |         sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
        |  FROM base),
        |lexall AS (
        |  SELECT doc_id,
        |         CAST(ROUND((
        |             ((n - df0 + 0.5)/(df0 + 0.5)) * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |           + ((n - df1 + 0.5)/(df1 + 0.5)) * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |           + ((n - df2 + 0.5)/(df2 + 0.5)) * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |         ) * 1000000.0) AS BIGINT) AS score_micro
        |  FROM base, st),
        |lex AS (
        |  SELECT doc_id,
        |         row_number() OVER (ORDER BY score_micro DESC, doc_id) AS lex_rank
        |  FROM lexall QUALIFY lex_rank <= 50),
        |q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
        |vecscored AS (
        |  SELECT c.vec_id AS doc_id,
        |         CAST(ROUND(list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]) * 1000000) AS BIGINT) AS cm
        |  FROM embeddings c, q WHERE c.vec_id <> 0),
        |vec AS (
        |  SELECT doc_id,
        |         row_number() OVER (ORDER BY cm DESC, doc_id) AS vec_rank
        |  FROM vecscored QUALIFY vec_rank <= 50),
        |fused AS (
        |  SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
        |         CAST(COALESCE(FLOOR(1000000.0/(60.0 + l.lex_rank)), 0)
        |            + COALESCE(FLOOR(1000000.0/(60.0 + v.vec_rank)), 0) AS BIGINT) AS rrf_micro
        |  FROM lex l FULL JOIN vec v ON l.doc_id = v.doc_id)
        |SELECT doc_id, rrf_micro FROM fused
        |ORDER BY rrf_micro DESC, doc_id LIMIT 10""".stripMargin,

    "text_vocab" ->
      """WITH tok AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-zA-Z0-9]+'), x -> x <> '')) AS token
        |  FROM documents),
        |cnt AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
        |        ORDER BY cnt DESC, token LIMIT 1000)
        |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS vocab_id,
        |       token, cnt
        |FROM cnt ORDER BY vocab_id""".stripMargin,

    "pack_sequences" ->
      """WITH c AS (
        |  SELECT doc_id, source,
        |         CAST(len(regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^ \t\n\x0B\f\rA-Za-z0-9]+|[ \t\n\x0B\f\r]+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, source, n_tokens,
        |         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM c)
        |SELECT doc_id, source, n_tokens,
        |       CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_id,
        |       CAST((cum - n_tokens) % 2048 AS BIGINT) AS pack_offset,
        |       CAST(CASE WHEN n_tokens > 0
        |         THEN (cum - 1) // 2048 - (cum - n_tokens) // 2048
        |         ELSE 0 END AS BIGINT) AS n_splits
        |FROM w ORDER BY doc_id""".stripMargin,

    "sample_mixture" ->
      """WITH s AS (
        |  SELECT doc_id, lang,
        |         ((doc_id % 1000003) * 2654435761) % 1000 AS sample_key,
        |         CAST(CASE WHEN lang = 'en' THEN 400
        |                   WHEN lang = 'fr' THEN 700
        |                   ELSE 1000 END AS BIGINT) AS quota_permille
        |  FROM documents)
        |SELECT doc_id, lang, sample_key, quota_permille
        |FROM s WHERE sample_key < quota_permille
        |ORDER BY doc_id""".stripMargin,

    // cluster-balanced coverage sample: rank replayed over the staged
    // scored frame (integer affinity, id tie-break)
    "sample_diverse" ->
      """WITH sc AS (
        |  SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/sdv_scored/*.parquet')),
        |r AS (
        |  SELECT cell, vec_id, aff_milli,
        |         row_number() OVER (PARTITION BY cell
        |                            ORDER BY aff_milli DESC, vec_id ASC) AS rank
        |  FROM sc)
        |SELECT cell, vec_id, aff_milli, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 4
        |ORDER BY cell, rank""".stripMargin,

    // exact-count per-language sample: same rank arithmetic as the
    // Spark side (multiplicative-hash key, id tie-break)
    "sample_stratified" ->
      """SELECT doc_id, lang, strat_rank FROM (
        |  SELECT doc_id, lang,
        |         CAST(row_number() OVER (PARTITION BY lang
        |              ORDER BY ((doc_id % 1000003) * 2654435761) % 1000, doc_id)
        |              AS BIGINT) AS strat_rank
        |  FROM documents)
        |WHERE strat_rank <= 100
        |ORDER BY doc_id""".stripMargin,

    "text_decontam" ->
      """WITH g AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/decontam_grams/*.parquet')),
        |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0)
        |SELECT g.doc_id, COUNT(*) AS n_grams,
        |       CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |       CAST(CASE WHEN SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) * 1000
        |                      >= COUNT(*) * 300 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
        |FROM g LEFT JOIN bench b ON g.gram = b.gram
        |WHERE g.doc_id % 97 <> 0
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(trim(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g')))) AS fp,
        |       MIN(doc_id) AS keep_id, count(*) AS dup_count
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_jaccard_pairs" ->
      """WITH toks AS (
        |  SELECT source, doc_id,
        |         list_distinct(list_filter(
        |           regexp_split_to_array(trim(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g'))), '[^a-zA-Z0-9]+'),
        |           x -> x <> '')) AS sh
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(FLOOR(1000.0 * len(list_intersect(a.sh, b.sh)) /
        |            (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))) AS BIGINT) AS jaccard_milli
        |FROM toks a JOIN toks b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) > 0
        |  AND CAST(FLOOR(1000.0 * len(list_intersect(a.sh, b.sh)) /
        |            (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))) AS BIGINT) >= 300
        |ORDER BY id_a, id_b""".stripMargin,

    // Two-stage oracles for the approximate paths: the query builder
    // stages its deterministic intermediates (fingerprints / shingle
    // sets / candidate pairs) as parquet under target/oracle-stage and
    // DuckDB verifies the exact pair-join / ranking stage over them.
    // The driver verifies at sf0.01, hence the staged paths below.

    "dedup_substring" ->
      """WITH f AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/substr_grams/*.parquet')),
        |dup AS (SELECT doc_id, pos FROM (
        |          SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY fp) AS occ FROM f)
        |        WHERE occ > 1),
        |isl AS (SELECT doc_id, pos,
        |          SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |        FROM (SELECT doc_id, pos,
        |                CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 4
        |                     THEN 1 ELSE 0 END AS brk
        |              FROM dup)),
        |sp AS (SELECT doc_id, island, MAX(pos) - MIN(pos) + 4 AS span_len
        |       FROM isl GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(span_len) AS BIGINT) AS dup_tokens,
        |       COUNT(*) AS n_spans
        |FROM sp GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_minhash_lsh" ->
      """WITH sh AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/dedup_minhash_sh/*.parquet')),
        |cand AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/dedup_minhash_cand/*.parquet'))
        |SELECT c.id_a, c.id_b,
        |       CAST(FLOOR(1000.0 * len(list_intersect(a.hs, b.hs)) /
        |            (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))) AS BIGINT) AS jaccard_milli
        |FROM cand c JOIN sh a ON a.id = c.id_a JOIN sh b ON b.id = c.id_b
        |WHERE (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) > 0
        |  AND CAST(FLOOR(1000.0 * len(list_intersect(a.hs, b.hs)) /
        |            (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))) AS BIGINT) >= 200
        |ORDER BY id_a, id_b""".stripMargin,

    // same formula over the staged (id, hs, source) frame
    "q_sql_kernel" ->
      """WITH sh AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/sqlkernel_sh/*.parquet'))
        |SELECT a.id AS id_a, b.id AS id_b,
        |       CAST(FLOOR(1000.0 * len(list_intersect(a.hs, b.hs)) /
        |            (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))) AS BIGINT) AS jaccard_milli
        |FROM sh a JOIN sh b ON a.source = b.source AND a.id < b.id
        |WHERE (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) > 0
        |  AND CAST(FLOOR(1000.0 * len(list_intersect(a.hs, b.hs)) /
        |            (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))) AS BIGINT) >= 300
        |ORDER BY id_a, id_b""".stripMargin,

    // exact-Jaccard confirmation over the staged cross candidates
    "text_decontam_fuzzy" ->
      """WITH sh AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/decontam_fz_sh/*.parquet')),
        |cand AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/decontam_fz_cand/*.parquet'))
        |SELECT c.id_a AS corpus_id, c.id_b AS benchmark_id,
        |       CAST(FLOOR(1000.0 * len(list_intersect(a.hs, b.hs)) /
        |            (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))) AS BIGINT) AS jaccard_milli
        |FROM cand c JOIN sh a ON a.id = c.id_a JOIN sh b ON b.id = c.id_b
        |WHERE (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) > 0
        |  AND CAST(FLOOR(1000.0 * len(list_intersect(a.hs, b.hs)) /
        |            (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))) AS BIGINT) >= 500
        |ORDER BY corpus_id, benchmark_id""".stripMargin,

    // streaming LSH candidate links == (bucket-min, member) pairs over
    // the staged band frame, distinct across bands
    "stream_minhash_dedup" ->
      """WITH b AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/stream_mh_bands/*.parquet')),
        |m AS (SELECT id, band, bucket,
        |             MIN(id) OVER (PARTITION BY band, bucket) AS rep
        |      FROM b)
        |SELECT DISTINCT rep AS id_a, id AS id_b FROM m
        |WHERE id > rep
        |ORDER BY id_a, id_b""".stripMargin,

    "dedup_minhash_capped" ->
      """WITH sh AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/dedup_cap_sh/*.parquet')),
        |bands AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/dedup_cap_bands/*.parquet')),
        |kept AS (SELECT band, bucket FROM bands GROUP BY 1, 2 HAVING count(*) <= 2),
        |b2 AS (SELECT b.id, b.band, b.bucket FROM bands b JOIN kept USING (band, bucket)),
        |cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
        |         FROM b2 x JOIN b2 y
        |           ON x.band = y.band AND x.bucket = y.bucket AND x.id < y.id)
        |SELECT c.id_a, c.id_b,
        |       CAST(FLOOR(1000.0 * len(list_intersect(a.hs, b.hs)) /
        |            (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))) AS BIGINT) AS jaccard_milli
        |FROM cand c JOIN sh a ON a.id = c.id_a JOIN sh b ON b.id = c.id_b
        |WHERE (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) > 0
        |  AND CAST(FLOOR(1000.0 * len(list_intersect(a.hs, b.hs)) /
        |            (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))) AS BIGINT) >= 200
        |ORDER BY id_a, id_b""".stripMargin,

    // the salted re-split recomputed exactly: sub-bucket salts from the
    // portable hash, within-sub pairs, plus the rep->hub star links
    "dedup_minhash_salted" ->
      """WITH sh AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/dedup_salt_sh/*.parquet')),
        |bands AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/dedup_salt_bands/*.parquet')),
        |sz AS (SELECT band, bucket, count(*) AS n FROM bands GROUP BY 1, 2),
        |b2 AS (SELECT b.id, b.band, b.bucket, s.n,
        |              CASE WHEN s.n > 2
        |                   THEN ((b.id * 2654435761) % 2147483648) % ((s.n + 1) // 2)
        |                   ELSE 0 END AS salt
        |       FROM bands b JOIN sz s USING (band, bucket)),
        |within AS (SELECT x.id AS id_a, y.id AS id_b
        |           FROM b2 x JOIN b2 y
        |             ON x.band = y.band AND x.bucket = y.bucket
        |            AND x.salt = y.salt AND x.id < y.id),
        |reps AS (SELECT band, bucket, salt, MIN(id) AS rid
        |         FROM b2 WHERE n > 2 GROUP BY 1, 2, 3),
        |hubs AS (SELECT band, bucket, MIN(rid) AS hub FROM reps GROUP BY 1, 2),
        |links AS (SELECT h.hub AS id_a, r.rid AS id_b
        |          FROM reps r JOIN hubs h USING (band, bucket)
        |          WHERE r.rid <> h.hub),
        |cand AS (SELECT DISTINCT id_a, id_b FROM
        |         (SELECT * FROM within UNION ALL SELECT * FROM links))
        |SELECT c.id_a, c.id_b,
        |       CAST(FLOOR(1000.0 * len(list_intersect(a.hs, b.hs)) /
        |            (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))) AS BIGINT) AS jaccard_milli
        |FROM cand c JOIN sh a ON a.id = c.id_a JOIN sh b ON b.id = c.id_b
        |WHERE (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) > 0
        |  AND CAST(FLOOR(1000.0 * len(list_intersect(a.hs, b.hs)) /
        |            (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))) AS BIGINT) >= 200
        |ORDER BY id_a, id_b""".stripMargin,

    "dedup_minhash_incr" ->
      """WITH sh AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/dedup_incr_sh/*.parquet')),
        |cand AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/dedup_incr_cand/*.parquet'))
        |SELECT LEAST(c.id_a, c.id_b) AS id_a, GREATEST(c.id_a, c.id_b) AS id_b,
        |       CAST(FLOOR(1000.0 * len(list_intersect(a.hs, b.hs)) /
        |            (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))) AS BIGINT) AS jaccard_milli
        |FROM cand c JOIN sh a ON a.id = c.id_a JOIN sh b ON b.id = c.id_b
        |WHERE (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) > 0
        |  AND CAST(FLOOR(1000.0 * len(list_intersect(a.hs, b.hs)) /
        |            (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))) AS BIGINT) >= 200
        |ORDER BY id_a, id_b""".stripMargin,

    "dedup_bloom_incr" ->
      """WITH fps AS (
        |  SELECT doc_id,
        |         md5(trim(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g')))) AS fp
        |  FROM documents),
        |hist AS (SELECT fp FROM fps WHERE doc_id % 2 = 0),
        |incr AS (
        |  SELECT doc_id, fp FROM fps WHERE doc_id % 2 = 1
        |  UNION ALL
        |  SELECT doc_id + 1000000, fp FROM fps
        |  WHERE doc_id % 2 = 0 AND doc_id % 10 = 0)
        |SELECT i.doc_id, i.fp FROM incr i
        |WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.fp = i.fp)
        |ORDER BY doc_id""".stripMargin,

    "dedup_components" ->
      """WITH RECURSIVE raw AS (
        |  SELECT id_a, id_b FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/dedup_comp_edges/*.parquet')),
        |e AS (SELECT id_a AS a, id_b AS b FROM raw
        |      UNION SELECT id_b, id_a FROM raw),
        |reach(src, dst) AS (
        |  SELECT a, a FROM e
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN e ON e.a = r.dst),
        |comp AS (SELECT src AS id, MIN(dst) AS comp FROM reach GROUP BY src),
        |labeled AS (
        |  SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_rep
        |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
        |sizes AS (SELECT cluster_rep, COUNT(*) AS cluster_size
        |          FROM labeled GROUP BY cluster_rep)
        |SELECT l.doc_id, l.cluster_rep, s.cluster_size
        |FROM labeled l JOIN sizes s USING (cluster_rep)
        |ORDER BY doc_id""".stripMargin,

    "dedup_keep_best" ->
      """WITH l AS (
        |  SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/keepbest_labeled/*.parquet')),
        |k AS (
        |  SELECT cluster_rep, doc_id AS kept_doc, q_milli,
        |         row_number() OVER (PARTITION BY cluster_rep
        |                            ORDER BY q_milli DESC, doc_id ASC) AS rn
        |  FROM l),
        |sz AS (SELECT cluster_rep, COUNT(*) AS cluster_size FROM l GROUP BY 1)
        |SELECT k.cluster_rep, k.kept_doc, CAST(k.q_milli AS BIGINT) AS q_milli,
        |       sz.cluster_size
        |FROM k JOIN sz USING (cluster_rep)
        |WHERE rn = 1
        |ORDER BY cluster_rep""".stripMargin,

    "dedup_simhash" ->
      """WITH fp AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/dedup_simhash_fp/*.parquet'))
        |SELECT a.id AS id_a, b.id AS id_b,
        |       CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
        |FROM fp a JOIN fp b ON a.id < b.id
        |WHERE bit_count(xor(a.sim, b.sim)) <= 6
        |ORDER BY id_a, id_b""".stripMargin,

    "ann_lsh_topk" ->
      """WITH cand AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/ann_lsh_cand/*.parquet')),
        |scored AS (
        |  SELECT c.query_id, c.neighbor_id,
        |         CAST(ROUND(list_cosine_similarity(ce.embedding::DOUBLE[], qe.embedding::DOUBLE[]) * 1000000) AS BIGINT) AS cosine_micro
        |  FROM cand c
        |  JOIN embeddings ce ON ce.vec_id = c.neighbor_id
        |  JOIN embeddings qe ON qe.vec_id = c.query_id)
        |SELECT query_id, neighbor_id,
        |       CAST(row_number() OVER (PARTITION BY query_id
        |            ORDER BY cosine_micro DESC, neighbor_id ASC) AS BIGINT) AS rank,
        |       cosine_micro
        |FROM scored
        |QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "ann_ivfpq_topk" ->
      """WITH cand AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/ann_ivfpq_cand/*.parquet')),
        |scored AS (
        |  SELECT c.query_id, c.neighbor_id,
        |         CAST(ROUND(list_cosine_similarity(ce.embedding::DOUBLE[], qe.embedding::DOUBLE[]) * 1000000) AS BIGINT) AS cosine_micro
        |  FROM cand c
        |  JOIN embeddings ce ON ce.vec_id = c.neighbor_id
        |  JOIN embeddings qe ON qe.vec_id = c.query_id)
        |SELECT query_id, neighbor_id,
        |       CAST(row_number() OVER (PARTITION BY query_id
        |            ORDER BY cosine_micro DESC, neighbor_id ASC) AS BIGINT) AS rank,
        |       cosine_micro
        |FROM scored
        |QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "ann_pq_topk" ->
      """WITH cand AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/ann_pq_cand/*.parquet')),
        |scored AS (
        |  SELECT c.query_id, c.neighbor_id,
        |         CAST(ROUND(list_cosine_similarity(ce.embedding::DOUBLE[], qe.embedding::DOUBLE[]) * 1000000) AS BIGINT) AS cosine_micro
        |  FROM cand c
        |  JOIN embeddings ce ON ce.vec_id = c.neighbor_id
        |  JOIN embeddings qe ON qe.vec_id = c.query_id)
        |SELECT query_id, neighbor_id,
        |       CAST(row_number() OVER (PARTITION BY query_id
        |            ORDER BY cosine_micro DESC, neighbor_id ASC) AS BIGINT) AS rank,
        |       cosine_micro
        |FROM scored
        |QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "ann_ivf_topk" ->
      """WITH cand AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/ann_ivf_cand/*.parquet')),
        |scored AS (
        |  SELECT c.query_id, c.neighbor_id,
        |         CAST(ROUND(list_cosine_similarity(ce.embedding::DOUBLE[], qe.embedding::DOUBLE[]) * 1000000) AS BIGINT) AS cosine_micro
        |  FROM cand c
        |  JOIN embeddings ce ON ce.vec_id = c.neighbor_id
        |  JOIN embeddings qe ON qe.vec_id = c.query_id)
        |SELECT query_id, neighbor_id,
        |       CAST(row_number() OVER (PARTITION BY query_id
        |            ORDER BY cosine_micro DESC, neighbor_id ASC) AS BIGINT) AS rank,
        |       cosine_micro
        |FROM scored
        |QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "ann_ivf_index_topk" ->
      """WITH cand AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/ann_ivf_index_cand/*.parquet')),
        |scored AS (
        |  SELECT c.query_id, c.neighbor_id,
        |         CAST(ROUND(list_cosine_similarity(ce.embedding::DOUBLE[], qe.embedding::DOUBLE[]) * 1000000) AS BIGINT) AS cosine_micro
        |  FROM cand c
        |  JOIN embeddings ce ON ce.vec_id = c.neighbor_id
        |  JOIN embeddings qe ON qe.vec_id = c.query_id)
        |SELECT query_id, neighbor_id,
        |       CAST(row_number() OVER (PARTITION BY query_id
        |            ORDER BY cosine_micro DESC, neighbor_id ASC) AS BIGINT) AS rank,
        |       cosine_micro
        |FROM scored
        |QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "ann_ivf_incr" ->
      """WITH cand AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/ann_incr_cand/*.parquet')),
        |scored AS (
        |  SELECT c.query_id, c.neighbor_id,
        |         CAST(ROUND(list_cosine_similarity(ce.embedding::DOUBLE[], qe.embedding::DOUBLE[]) * 1000000) AS BIGINT) AS cosine_micro
        |  FROM cand c
        |  JOIN embeddings ce ON ce.vec_id = c.neighbor_id
        |  JOIN embeddings qe ON qe.vec_id = c.query_id)
        |SELECT query_id, neighbor_id,
        |       CAST(row_number() OVER (PARTITION BY query_id
        |            ORDER BY cosine_micro DESC, neighbor_id ASC) AS BIGINT) AS rank,
        |       cosine_micro
        |FROM scored
        |QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "ann_ivf_graft_index" ->
      """WITH cand AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/ann_gt_cand/*.parquet')),
        |scored AS (
        |  SELECT c.query_id, c.neighbor_id,
        |         CAST(ROUND(list_cosine_similarity(ce.embedding::DOUBLE[], qe.embedding::DOUBLE[]) * 1000000) AS BIGINT) AS cosine_micro
        |  FROM cand c
        |  JOIN embeddings ce ON ce.vec_id = c.neighbor_id
        |  JOIN embeddings qe ON qe.vec_id = c.query_id)
        |SELECT query_id, neighbor_id,
        |       CAST(row_number() OVER (PARTITION BY query_id
        |            ORDER BY cosine_micro DESC, neighbor_id ASC) AS BIGINT) AS rank,
        |       cosine_micro
        |FROM scored
        |QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "ann_ivf_deleted" ->
      """WITH cand AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/ann_del_cand/*.parquet')),
        |scored AS (
        |  SELECT c.query_id, c.neighbor_id,
        |         CAST(ROUND(list_cosine_similarity(ce.embedding::DOUBLE[], qe.embedding::DOUBLE[]) * 1000000) AS BIGINT) AS cosine_micro
        |  FROM cand c
        |  JOIN embeddings ce ON ce.vec_id = c.neighbor_id
        |  JOIN embeddings qe ON qe.vec_id = c.query_id),
        |del AS (
        |  SELECT DISTINCT neighbor_id FROM (
        |    SELECT neighbor_id,
        |           row_number() OVER (PARTITION BY query_id
        |                ORDER BY cosine_micro DESC, neighbor_id ASC) AS rn
        |    FROM scored WHERE neighbor_id >= 8) WHERE rn = 1)
        |SELECT query_id, neighbor_id,
        |       CAST(row_number() OVER (PARTITION BY query_id
        |            ORDER BY cosine_micro DESC, neighbor_id ASC) AS BIGINT) AS rank,
        |       cosine_micro
        |FROM scored
        |WHERE neighbor_id NOT IN (SELECT neighbor_id FROM del)
        |QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "ann_ivf_maintained" ->
      """WITH cand AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/ann_maint_cand/*.parquet')),
        |scored AS (
        |  SELECT c.query_id, c.neighbor_id,
        |         CAST(ROUND(list_cosine_similarity(ce.embedding::DOUBLE[], qe.embedding::DOUBLE[]) * 1000000) AS BIGINT) AS cosine_micro
        |  FROM cand c
        |  JOIN embeddings ce ON ce.vec_id = c.neighbor_id
        |  JOIN embeddings qe ON qe.vec_id = c.query_id)
        |SELECT query_id, neighbor_id,
        |       CAST(row_number() OVER (PARTITION BY query_id
        |            ORDER BY cosine_micro DESC, neighbor_id ASC) AS BIGINT) AS rank,
        |       cosine_micro
        |FROM scored
        |QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "stream_ivf_assign" ->
      """WITH cents AS (SELECT cell, centroid FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/stream_ivf_centroids/*.parquet')),
        |scored AS (
        |  SELECT e.vec_id, c.cell,
        |         list_inner_product(e.embedding::DOUBLE[], c.centroid) AS ip
        |  FROM embeddings e CROSS JOIN cents c),
        |ranked AS (
        |  SELECT vec_id, cell,
        |         row_number() OVER (PARTITION BY vec_id
        |              ORDER BY ip DESC, cell ASC) AS rn
        |  FROM scored)
        |SELECT vec_id, cell FROM ranked WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    "ann_brute_topk" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         CAST(ROUND(list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]) * 1000000) AS BIGINT) AS cosine_micro
        |  FROM embeddings c, q WHERE c.vec_id <> q.vec_id)
        |SELECT query_id, neighbor_id,
        |       CAST(row_number() OVER (PARTITION BY query_id
        |            ORDER BY cosine_micro DESC, neighbor_id ASC) AS BIGINT) AS rank,
        |       cosine_micro
        |FROM scored
        |QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "embed_pool" ->
      """WITH e AS (
        |  SELECT label, gs AS pos,
        |         CAST(ROUND(embedding[gs+1] * 1000) AS BIGINT) AS mv
        |  FROM (SELECT label, embedding,
        |               unnest(range(0, len(embedding))) AS gs
        |        FROM embeddings)
        |), s AS (
        |  SELECT label, pos, SUM(mv) AS sv, count(*) AS n
        |  FROM e GROUP BY 1, 2
        |), g AS (
        |  SELECT label, max(n) AS n_vecs FROM s GROUP BY label
        |)
        |SELECT CAST(s.label AS BIGINT) AS label, g.n_vecs,
        |       CAST(s.pos AS BIGINT) AS pos, CAST(s.sv AS BIGINT) AS sum_milli
        |FROM s JOIN g USING (label) ORDER BY label, pos""".stripMargin,

    "embed_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       CAST(ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) * 1000) AS BIGINT) AS cosine_milli
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE CAST(ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) * 1000) AS BIGINT) >= 300
        |ORDER BY id_a, id_b""".stripMargin,

    "dedup_semantic" ->
      """WITH a AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/semdedup_assign/*.parquet')),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (SELECT x.vec_id AS id, MIN(y.vec_id) AS dup_of
        |      FROM a x JOIN a y ON x.cell = y.cell AND y.vec_id < x.vec_id
        |      JOIN e ex ON ex.vec_id = x.vec_id
        |      JOIN e ey ON ey.vec_id = y.vec_id
        |      WHERE CAST(ROUND(list_cosine_similarity(ex.v, ey.v) * 1000) AS BIGINT) >= 300
        |      GROUP BY 1)
        |SELECT a.vec_id, a.cell, COALESCE(p.dup_of, -1) AS dup_of,
        |       CAST(CASE WHEN p.dup_of IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
        |FROM a LEFT JOIN p ON p.id = a.vec_id
        |ORDER BY vec_id""".stripMargin,

    "mm_frames" ->
      """WITH m AS (
        |  SELECT doc_id, octet_length(encode(text)) AS len,
        |         (octet_length(encode(text)) + 3) // 4 AS nchunks
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |       (nchunks + 2) // 3 AS n_frames,
        |       (nchunks + 2) // 3 * 4
        |         - CASE WHEN (nchunks - 1) % 3 = 0
        |                THEN nchunks * 4 - len ELSE 0 END AS sampled_bytes
        |FROM m WHERE len > 0 ORDER BY media_id""".stripMargin,

    "mm_features" ->
      """SELECT doc_id AS media_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       CAST(list_sum(list_transform(string_split_regex(text, ''), c -> ascii(c))) AS BIGINT) AS checksum,
        |       CAST(octet_length(encode(text)) % 251 AS BIGINT) AS f0
        |FROM documents ORDER BY media_id""".stripMargin,

    "mm_dedup" ->
      """SELECT sha256(text) AS digest,
        |       min(doc_id) AS keep_id,
        |       count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,

    "mm_audio_windows" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, encode(text) AS media,
        |         octet_length(encode(text)) AS n
        |  FROM documents WHERE octet_length(encode(text)) > 0
        |), w AS (
        |  SELECT media_id, media, n,
        |         unnest(range(0, (n-1)//48 + 1)) AS gs FROM m
        |)
        |SELECT media_id, CAST(gs AS BIGINT) AS win_id,
        |       CAST(least(64, n - gs*48) AS BIGINT) AS win_len,
        |       substring(hex(media), gs*96+1, 128) AS win_hex
        |FROM w ORDER BY media_id, win_id""".stripMargin,

    "mm_pairs" ->
      """WITH n AS (SELECT count(*) AS c FROM documents),
        |cap AS (SELECT doc_id AS cap_id, substring(text, 1, 40) AS caption
        |        FROM documents),
        |pos AS (SELECT doc_id AS media_id, doc_id AS cap_id,
        |               1 AS label, 0 AS pair_no FROM documents),
        |neg0 AS (
        |  SELECT d.doc_id AS media_id, p.pair_no,
        |         (d.doc_id * 2654435761 + p.pair_no * 40503) % n.c AS cap_id
        |  FROM documents d, n, (SELECT unnest(range(1, 3)) AS pair_no) p
        |),
        |neg AS (
        |  SELECT media_id,
        |         CASE WHEN cap_id = media_id
        |              THEN (cap_id + 1) % (SELECT c FROM n) ELSE cap_id END
        |           AS cap_id,
        |         0 AS label, pair_no FROM neg0
        |)
        |SELECT u.media_id, u.cap_id, u.label, u.pair_no, cap.caption
        |FROM (SELECT * FROM pos UNION ALL SELECT * FROM neg) u
        |JOIN cap USING (cap_id)
        |ORDER BY media_id, pair_no""".stripMargin
  )

  /** lang-ID oracle: the same padded stopword-count argmax formula. */
  private def occSql(w: String) =
    s"(length(' '||text||' ') - length(replace(' '||text||' ', ' $w ', ''))) // ${w.length + 2}"

  /** SQL mirror of `TextOps.langId(text)` (an expression, reused by the
   *  langid and pipeline oracles). */
  private def langIdSqlCase: String = {
    def hits(ws: Seq[String]) = ws.map(occSql).mkString("(", " + ", ")")
    val en = hits(TextOps.EnStop); val de = hits(TextOps.DeStop)
    val fr = hits(TextOps.FrStop); val es = hits(TextOps.EsStop)
    s"""CASE WHEN GREATEST($en, $de, $fr, $es) = 0 THEN 'unknown'
       |         WHEN $en = GREATEST($en, $de, $fr, $es) THEN 'en'
       |         WHEN $de = GREATEST($en, $de, $fr, $es) THEN 'de'
       |         WHEN $fr = GREATEST($en, $de, $fr, $es) THEN 'fr'
       |         ELSE 'es' END""".stripMargin
  }

  /** SQL mirror of `TextOps.qualityScore(text)` — the same integer
   *  formula the text_stats oracle spells inline. */
  private def qualitySqlExpr: String = {
    val stop = TextOps.EnStop.map(occSql).mkString("(", " + ", ")")
    s"""GREATEST(0, LEAST(1000,
       |  2 * len(list_filter(regexp_split_to_array(text, '[^a-zA-Z0-9]+'), x -> x <> ''))
       |  + 10 * $stop
       |  - 5 * length(regexp_replace(text, '[^.!?,;:]', '', 'g'))
       |  + length(text) // 10))""".stripMargin
  }

  private def langIdOracle: String =
    s"""WITH g AS (
       |  SELECT doc_id, $langIdSqlCase AS lang_guess
       |  FROM documents)
       |SELECT lang_guess, count(*) AS n FROM g GROUP BY 1 ORDER BY 1""".stripMargin

  private def pipelineFilterOracle: String =
    s"""WITH g AS (SELECT * FROM read_parquet('/root/repo/target/oracle-stage/sf0.01/pipeline_grams/*.parquet')),
       |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
       |contam AS (
       |  SELECT g.doc_id
       |  FROM g LEFT JOIN bench b ON g.gram = b.gram
       |  WHERE g.doc_id % 97 <> 0
       |  GROUP BY g.doc_id
       |  HAVING SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) * 1000 >= COUNT(*) * 300),
       |scored AS (
       |  SELECT doc_id,
       |         CAST($qualitySqlExpr AS BIGINT) AS quality,
       |         $langIdSqlCase AS lang_guess,
       |         md5(trim(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g')))) AS fp
       |  FROM documents),
       |keep AS (SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS keep_id FROM scored)
       |SELECT k.doc_id, k.quality, k.lang_guess
       |FROM keep k
       |WHERE k.doc_id % 97 <> 0
       |  AND k.quality >= 150
       |  AND k.lang_guess <> 'unknown'
       |  AND k.doc_id = k.keep_id
       |  AND k.doc_id NOT IN (SELECT doc_id FROM contam)
       |ORDER BY k.doc_id""".stripMargin
}
