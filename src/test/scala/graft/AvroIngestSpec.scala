package graft

import graft.model._
import graft.sources.AvroIngest
import graft.table.{GraftTable, TableConfig}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/**
 * Avro schema + Avro-JSON datum ingest (S5; reference
 * `rest_ingest/avro_converter.rs`): nullable unions, maps as
 * list<struct<key,value>>, logical date/timestamp-micros/decimal,
 * Fixed(16) only, complex-union rejection.
 */
class AvroIngestSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-avro-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val schemaJson =
    """{"type":"record","name":"Evt","fields":[
      |  {"name":"id","type":"long"},
      |  {"name":"name","type":["null","string"]},
      |  {"name":"flag","type":"boolean"},
      |  {"name":"score","type":"double"},
      |  {"name":"born","type":{"type":"int","logicalType":"date"}},
      |  {"name":"at","type":{"type":"long","logicalType":"timestamp-micros"}},
      |  {"name":"price","type":{"type":"bytes","logicalType":"decimal",
      |                          "precision":10,"scale":2}},
      |  {"name":"tags","type":{"type":"array","items":"string"}},
      |  {"name":"attrs","type":{"type":"map","values":"long"}},
      |  {"name":"raw","type":"bytes"}]}""".stripMargin

  test("schema conversion: unions, logicals, map encoding") {
    val st = AvroIngest.schemaToStruct(schemaJson)
    assert(st("id").dataType == LongType && !st("id").nullable)
    assert(st("name").dataType == StringType && st("name").nullable)
    assert(st("born").dataType == DateType)
    assert(st("at").dataType == TimestampType)
    assert(st("price").dataType == DecimalType(10, 2))
    assert(st("tags").dataType == ArrayType(StringType))
    assert(st("attrs").dataType == ArrayType(StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("value", LongType)))))
    assert(st("raw").dataType == BinaryType)
  }

  test("complex unions and non-16 fixed are rejected") {
    intercept[IllegalArgumentException](AvroIngest.schemaToStruct(
      """{"type":"record","name":"R","fields":[
        |  {"name":"u","type":["null","string","long"]}]}""".stripMargin))
    intercept[IllegalArgumentException](AvroIngest.schemaToStruct(
      """{"type":"record","name":"R","fields":[
        |  {"name":"f","type":{"type":"fixed","name":"F8","size":8}}]}""".stripMargin))
  }

  // decimal 12345 scale 2 = 123.45; bytes big-endian two's-complement
  // of 12345 = 0x30 0x39 -> ISO-8859-1 "009" = "09"
  private val datum =
    """{"id":7,"name":{"string":"ada"},"flag":true,"score":9.5,
      |"born":3,"at":1000001,
      |"price":"09",
      |"tags":["a","b"],"attrs":{"x":1,"y":2},"raw":"AB"}""".stripMargin
  private val datumNull =
    """{"id":8,"name":null,"flag":false,"score":0.5,
      |"born":0,"at":0,"price":"!","tags":[],"attrs":{},"raw":""}""".stripMargin

  private def decoded = AvroIngest.toRows(spark,
    spark.createDataFrame(Seq(Row(datum), Row(datumNull)).asJava,
      StructType(Seq(StructField("p", StringType)))), "p", schemaJson)

  test("datum decoding: union wrapper, logicals, map, bytes") {
    val r = decoded.where(col("id") === 7).head()
    assert(r.getAs[String]("name") == "ada")
    assert(r.getAs[Boolean]("flag"))
    assert(r.getAs[java.sql.Date]("born").toString == "1970-01-04")
    val at = r.getAs[java.sql.Timestamp]("at")
    assert(at.getTime == 1000L && at.getNanos == 1000)   // 1000001 us
    assert(r.getAs[java.math.BigDecimal]("price")
      .compareTo(new java.math.BigDecimal("123.45")) == 0)
    assert(r.getAs[scala.collection.Seq[String]]("tags").toSeq == Seq("a", "b"))
    val attrs = r.getAs[scala.collection.Seq[Row]]("attrs")
      .map(e => e.getAs[String]("key") -> e.getAs[Long]("value")).toMap
    assert(attrs == Map("x" -> 1L, "y" -> 2L))
    assert(new String(r.getAs[Array[Byte]]("raw"),
      java.nio.charset.StandardCharsets.ISO_8859_1) == "AB")
  }

  test("null union branch decodes to SQL NULL") {
    val r = decoded.where(col("id") === 8).head()
    assert(r.isNullAt(r.fieldIndex("name")))
  }

  test("end-to-end: Avro datums ingest into a table and aggregate") {
    val table = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("graft-avro").toString + "/t",
      AvroIngest.schemaToStruct(schemaJson),
      Identity.None, TableConfig(walEnabled = false))
    val payloads = spark.createDataFrame(
      Seq(Row(datum), Row(datumNull)).asJava,
      StructType(Seq(StructField("p", StringType))))
    AvroIngest.ingest(table, payloads, "p", schemaJson, startLsn = 1)
    val out = table.read().select(col("id"), col("name")).orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(7L, 8L))
    assert(out(0).getString(1) == "ada" && out(1).isNullAt(1))
    table.drop()
  }
}
