package graft

import graft.model._
import graft.sources.ProtoIngest
import graft.table.{GraftTable, TableConfig}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/**
 * Protobuf MoonlinkRow wire-format round trip (S4; reference
 * `moonlink_proto/proto/row.proto`, endpoint `rest_api.rs:1026`):
 * every RowValue kind, negative varints, nested array/struct, 16-byte
 * big-endian decimals.
 */
class ProtoIngestSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-proto-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val schema = StructType(Seq(
    StructField("i", IntegerType), StructField("l", LongType),
    StructField("f", FloatType), StructField("d", DoubleType),
    StructField("dec", DecimalType(12, 3)), StructField("b", BooleanType),
    StructField("s", StringType), StructField("bin", BinaryType),
    StructField("day", DateType), StructField("at", TimestampType),
    StructField("arr", ArrayType(LongType)),
    StructField("st", StructType(Seq(
      StructField("x", LongType), StructField("y", StringType))))))

  private val ts = {
    val t = new java.sql.Timestamp(1234L); t.setNanos(567891000); t
  }
  private val row = Row(
    -42, 1234567890123L, 1.5f, -2.25,
    new java.math.BigDecimal("-12345.678"), true,
    "héllo", Array[Byte](1, 2, 3),
    java.sql.Date.valueOf("2021-03-04"), ts,
    Seq(1L, -2L, 3L), Row(9L, "in"))
  private val nullRow = Row(null, null, null, null, null, null, null,
    null, null, null, null, null)

  private def rt(r: Row): Row =
    ProtoIngest.decodeRow(ProtoIngest.encodeRow(r, schema), schema)

  test("every RowValue kind survives the wire round trip") {
    val got = rt(row)
    assert(got.getInt(0) == -42) // negative varint = 10 bytes
    assert(got.getLong(1) == 1234567890123L)
    assert(got.getFloat(2) == 1.5f && got.getDouble(3) == -2.25)
    assert(got.getDecimal(4).compareTo(new java.math.BigDecimal("-12345.678")) == 0)
    assert(got.getBoolean(5) && got.getString(6) == "héllo")
    assert(got.getAs[Array[Byte]](7).toSeq == Seq[Byte](1, 2, 3))
    assert(got.getDate(8).toString == "2021-03-04")
    val at = got.getTimestamp(9)
    assert(at.getTime == ts.getTime && at.getNanos == 567891000)
    assert(got.getAs[scala.collection.Seq[Long]](10).toSeq == Seq(1L, -2L, 3L))
    assert(got.getStruct(11) == Row(9L, "in"))
  }

  test("nulls in every position decode to SQL NULL") {
    val got = rt(nullRow)
    (0 until schema.length).foreach(i => assert(got.isNullAt(i), s"pos $i"))
  }

  test("decimal is 16-byte big-endian two's complement on the wire") {
    val one = StructType(Seq(StructField("dec", DecimalType(10, 2))))
    val enc = ProtoIngest.encodeRow(Row(new java.math.BigDecimal("1.00")), one)
    // field 1 (values), then RowValue { field 5 len=16 }: unscaled 100
    val body = enc.drop(2) // tag(1,len) + len byte
    assert(body(0) == 0x2A.toByte && body(1) == 16.toByte) // tag(5,len), 16
    assert(body.drop(2).take(15).forall(_ == 0) && body(17) == 100.toByte)
  }

  test("end-to-end: pb payload frame ingests distributed") {
    val table = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("graft-pb").toString + "/t",
      schema, Identity.None, TableConfig(walEnabled = false))
    val payloads = spark.createDataFrame(
      Seq(Row(ProtoIngest.encodeRow(row, schema)),
        Row(ProtoIngest.encodeRow(nullRow, schema))).asJava,
      StructType(Seq(StructField("pb", BinaryType))))
    ProtoIngest.ingest(table, payloads, "pb", startLsn = 1)
    val out = table.read().orderBy(col("i").asc_nulls_last).collect()
    assert(out.length == 2)
    assert(out(0).getInt(0) == -42 && out(0).getString(6) == "héllo")
    assert(out(1).isNullAt(0))
    table.drop()
  }
}
