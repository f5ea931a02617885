package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Skew-salting entries: the salted plans must (a) produce exactly the
 *  unsalted answer — salt is plan-internal — and (b) actually shard the
 *  hot key's work across salt buckets in the physical plan, which is
 *  the whole point of the technique at 100 TB.
 */
class SkewSaltingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-skew-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  private def grpCol =
    when(col("l_partkey") % 100 < 91, lit("hot"))
      .otherwise(concat(lit("c"), (col("l_partkey") % 100).cast("string")))

  test("salted top-k equals the plain per-key top-k; sort shards on (grp, salt)") {
    val salted = SparkEntry.queries("q_skew_salted_topk")(spark, sf)

    // the heavy window exchange must partition on (grp, salt), not grp
    // alone — that is what spreads the hot key's sort across S tasks
    val plan = salted.queryExecution.executedPlan.toString()
    assert("hashpartitioning\\(grp#\\d+, salt#\\d+".r.findFirstIn(plan).nonEmpty,
      s"stage-1 window exchange not keyed by (grp, salt):\n$plan")

    // unsalted oracle: one window over grp with the identical total order
    val li = spark.read.parquet(s"$sf/lineitem.parquet").select(
      grpCol.as("grp"), col("l_orderkey"), col("l_linenumber"),
      round(col("l_extendedprice") * 100).cast("long").as("price_cents"))
    val order = Seq(col("price_cents").desc, col("l_orderkey").asc,
      col("l_linenumber").asc)
    val plain = li.withColumn("rk", row_number().over(
        Window.partitionBy(col("grp")).orderBy(order: _*)).cast("long"))
      .where(col("rk") <= 5)
      .select("grp", "rk", "price_cents", "l_orderkey", "l_linenumber")

    val got = salted.collect().map(_.toSeq).sortBy(_.toString)
    val want = plain.collect().map(_.toSeq).sortBy(_.toString)
    assert(got.length == want.length && got.sameElements(want),
      s"salted top-k diverged: got ${got.length} want ${want.length}")
  }

  test("salted join equals the plain join; hot key spreads across salt buckets") {
    val salted = SparkEntry.queries("q_skew_salted_join")(spark, sf)

    val plan = salted.queryExecution.executedPlan.toString()
    assert(plan.contains("ShuffledHashJoin"),
      s"salted join did not plan as a shuffled hash join:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      "dim side broadcast — the skew demo silently degenerated")
    assert("hashpartitioning\\(jk#\\d+(L)?, salt#\\d+".r.findFirstIn(plan).nonEmpty,
      s"join exchange not keyed by (jk, salt):\n$plan")

    // unsalted oracle
    val fact = spark.read.parquet(s"$sf/lineitem.parquet").select(
      when(col("l_orderkey") % 50 < 45, lit(0L))
        .otherwise(col("l_orderkey") % 50).as("jk"),
      round(col("l_extendedprice") * 100).cast("long").as("price_cents"))
    val dim = spark.range(0, 50).select(col("id").as("jk"),
      concat(lit("d"), col("id").cast("string")).as("label"))
    val plain = fact.join(dim, "jk").groupBy("label")
      .agg(count(lit(1)).as("n_rows"), sum("price_cents").as("sum_cents"))
      .orderBy("label")

    assert(salted.collect().map(_.toSeq).toSeq ==
      plain.collect().map(_.toSeq).toSeq)
  }

  test("shard_shuffle: one hash exchange on shard; per-shard positions are contiguous") {
    val df = SparkEntry.queries("shard_shuffle")(spark, sf)

    val plan = df.queryExecution.executedPlan.toString()
    assert("hashpartitioning\\(shard#\\d+".r.findFirstIn(plan).nonEmpty,
      s"shard window not fed by a hash exchange on shard:\n$plan")
    // no total-order sort of the corpus before the window: the only
    // rangepartitioning allowed is the final presentation orderBy
    assert("rangepartitioning.*\\n.*Window".r.findFirstIn(plan).isEmpty,
      s"global range sort feeds the window — the orderBy(rand()) anti-pattern:\n$plan")

    val rows = df.collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == docs, "shard_shuffle must be a permutation of the corpus")
    // positions within each shard are exactly 1..n_shard
    rows.groupBy(_.getLong(0)).foreach { case (shard, rs) =>
      val pos = rs.map(_.getLong(1)).sorted
      assert(pos.sameElements(1L to pos.length),
        s"shard $shard positions not contiguous")
    }
    // determinism: a re-run with different parallelism produces the
    // identical layout (the key is a pure function of doc_id)
    val again = SparkEntry.queries("shard_shuffle")(spark, sf)
      .repartition(7).collect().map(_.toSeq).sortBy(_.toString)
    assert(again.sameElements(rows.map(_.toSeq).sortBy(_.toString)))
  }
}
