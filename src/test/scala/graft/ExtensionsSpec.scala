package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * SparkSessionExtensions registration: the native Catalyst expressions
 * resolve as global SQL functions with whole-stage codegen — the
 * hot-path sibling of the V2 catalog function surface.
 */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-ext-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graft.GraftExtensions")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("injected functions resolve and compute in plain SQL") {
    assert(spark.sql(
      "SELECT graft_jaccard_milli(array(1, 2, 3), array(2, 3, 4))")
      .head().getLong(0) == 500L)
    assert(spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .head().getDouble(0) == 11.0)
    assert(spark.sql(
      "SELECT graft_token_ngrams(array('a', 'b', 'c'), 2)")
      .head().getSeq[String](0) == Seq("a b", "b c"))
    // lsh bucket: deterministic long for a fixed vector/params
    val b1 = spark.sql(
      "SELECT graft_lsh_bucket(array(1.0D, -2.0D, 0.5D), 8, 0)")
      .head().getLong(0)
    val b2 = spark.sql(
      "SELECT graft_lsh_bucket(array(1.0D, -2.0D, 0.5D), 8, 0)")
      .head().getLong(0)
    assert(b1 == b2)
    // non-literal nbits refuses at analysis
    intercept[Exception] {
      spark.sql("SELECT graft_lsh_bucket(array(1.0D), CAST(rand()*4 AS INT), 0)")
        .collect()
    }
  }

  test("the injected expression stays inside whole-stage codegen") {
    // a range source (not a foldable local relation) so the executed
    // plan genuinely evaluates the expression
    spark.range(100).selectExpr(
      "sequence(CAST(id AS INT), CAST(id AS INT) + 3) AS a",
      "sequence(CAST(id AS INT) + 2, CAST(id AS INT) + 5) AS b")
      .createOrReplaceTempView("ext_v")
    val q = spark.sql("SELECT graft_jaccard_milli(a, b) AS j FROM ext_v")
    // the `*(n)` stage prefix marks WholeStageCodegen in simpleString
    assert(q.queryExecution.executedPlan.toString.startsWith("*("))
    // overlap {id+2, id+3} over union of 6 -> 333 milli for every row
    assert(q.collect().map(_.getLong(0)).forall(_ == 333L))
  }
}
