package graft

import graft.model._
import graft.sources.AvroIngest
import graft.table.{GraftTable, TableConfig}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * Avro BINARY wire-format codec (S5's Kafka path proper; reference
 * decodes real Avro datums, `rest_ingest/avro_converter.rs:28-120`):
 * zigzag varints, little-endian IEEE floats, length-prefixed
 * bytes/strings, block-encoded arrays/maps, POSITIONAL union branches
 * (where the JSON encoding names them), and strict truncation errors.
 */
class AvroBinarySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-avro-binary-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val fullSchema =
    """{"type":"record","name":"Evt","fields":[
      |  {"name":"id","type":"long"},
      |  {"name":"small","type":"int"},
      |  {"name":"name","type":["null","string"]},
      |  {"name":"flag","type":"boolean"},
      |  {"name":"ratio","type":"float"},
      |  {"name":"score","type":"double"},
      |  {"name":"blob","type":"bytes"},
      |  {"name":"born","type":{"type":"int","logicalType":"date"}},
      |  {"name":"at","type":{"type":"long","logicalType":"timestamp-micros"}},
      |  {"name":"price","type":{"type":"bytes","logicalType":"decimal",
      |    "precision":10,"scale":2}},
      |  {"name":"tags","type":{"type":"array","items":"string"}},
      |  {"name":"attrs","type":{"type":"map","values":"long"}}]}""".stripMargin

  private def sampleRow(id: Long, name: String): Row = {
    val ts = new java.sql.Timestamp(1704067200000L); ts.setNanos(123456000)
    Row(id, 42, name, true, 1.5f, 2.25, Array[Byte](1, 2, 3),
      java.sql.Date.valueOf("2024-01-15"), ts,
      new java.math.BigDecimal("12345.67"),
      Seq("a", "bb", ""), Seq(Row("k1", 7L), Row("k2", -9L)))
  }

  private def assertRowEq(a: Row, b: Row): Unit = {
    assert(a.length == b.length)
    (0 until a.length).foreach { i =>
      (a.get(i), b.get(i)) match {
        case (x: Array[Byte], y: Array[Byte]) => assert(x.sameElements(y), s"col $i")
        case (x, y) => assert(x == y, s"col $i")
      }
    }
  }

  test("binary round-trip covers every supported type") {
    val row = sampleRow(1L, "alice")
    val bytes = AvroIngest.encodeBinaryDatum(fullSchema, row)
    assertRowEq(AvroIngest.decodeBinaryDatum(fullSchema, bytes), row)
  }

  test("null union branch round-trips, both declared orders") {
    val nullFirst =
      """{"type":"record","name":"R","fields":[
        |  {"name":"v","type":["null","long"]}]}""".stripMargin
    val nullSecond =
      """{"type":"record","name":"R","fields":[
        |  {"name":"v","type":["long","null"]}]}""".stripMargin
    for (sch <- Seq(nullFirst, nullSecond); v <- Seq(null, 77L)) {
      val bytes = AvroIngest.encodeBinaryDatum(sch, Row(v))
      assert(AvroIngest.decodeBinaryDatum(sch, bytes) == Row(v), sch)
    }
    // branch indexes genuinely differ between the two orders: a
    // null-first datum is NOT decodable as null-second (branch 0 now
    // names the long arm, whose varint read runs off the datum)
    val asNull = AvroIngest.encodeBinaryDatum(nullFirst, Row(null))
    val cross = scala.util.Try(AvroIngest.decodeBinaryDatum(nullSecond, asNull))
    assert(cross.isFailure || cross.get != Row(null))
  }

  test("zigzag varint edge values") {
    val sch = """{"type":"record","name":"R","fields":[
      |  {"name":"v","type":"long"}]}""".stripMargin
    for (v <- Seq(0L, -1L, 1L, 63L, -64L, 64L, Long.MaxValue, Long.MinValue)) {
      val bytes = AvroIngest.encodeBinaryDatum(sch, Row(v))
      assert(AvroIngest.decodeBinaryDatum(sch, bytes) == Row(v), s"v=$v")
    }
  }

  test("empty array and empty map encode as a lone 0 block count") {
    val sch = """{"type":"record","name":"R","fields":[
      |  {"name":"xs","type":{"type":"array","items":"long"}},
      |  {"name":"m","type":{"type":"map","values":"long"}}]}""".stripMargin
    val bytes = AvroIngest.encodeBinaryDatum(sch, Row(Seq(), Seq()))
    assert(bytes.sameElements(Array[Byte](0, 0)))
    assert(AvroIngest.decodeBinaryDatum(sch, bytes) == Row(Seq(), Seq()))
  }

  test("negative block counts (count + byte-size prefix) decode") {
    // writers MAY emit a negative count followed by the block's byte
    // size (Avro spec block form for skippability); hand-build one
    val sch = """{"type":"record","name":"R","fields":[
      |  {"name":"xs","type":{"type":"array","items":"long"}}]}""".stripMargin
    def zz(v: Long): Seq[Byte] = {
      var n = (v << 1) ^ (v >> 63); val out = Seq.newBuilder[Byte]
      while ((n & ~0x7fL) != 0) { out += ((n & 0x7f) | 0x80).toByte; n >>>= 7 }
      (out += n.toByte).result()
    }
    // block: count=-2, byteSize=2, items [3, 4]; terminator 0
    val datum = (zz(-2) ++ zz(2) ++ zz(3) ++ zz(4) ++ zz(0)).toArray
    assert(AvroIngest.decodeBinaryDatum(sch, datum) == Row(Seq(3L, 4L)))
  }

  test("truncated datum and trailing bytes are loud errors") {
    val sch = """{"type":"record","name":"R","fields":[
      |  {"name":"s","type":"string"}]}""".stripMargin
    val good = AvroIngest.encodeBinaryDatum(sch, Row("hello"))
    intercept[IllegalArgumentException] {
      AvroIngest.decodeBinaryDatum(sch, good.dropRight(1))
    }
    intercept[IllegalArgumentException] {
      AvroIngest.decodeBinaryDatum(sch, good :+ 0.toByte)
    }
  }

  test("binary and JSON decoders agree on identical logical datums") {
    val sch = """{"type":"record","name":"R","fields":[
      |  {"name":"id","type":"long"},
      |  {"name":"name","type":["null","string"]},
      |  {"name":"score","type":"double"}]}""".stripMargin
    val bin = AvroIngest.decodeBinaryDatum(sch,
      AvroIngest.encodeBinaryDatum(sch, Row(5L, "x", 0.5)))
    val json = AvroIngest.decodeJsonDatum(sch,
      """{"id":5,"name":{"string":"x"},"score":0.5}""")
    assert(bin == json)
    val binNull = AvroIngest.decodeBinaryDatum(sch,
      AvroIngest.encodeBinaryDatum(sch, Row(5L, null, 0.5)))
    val jsonNull = AvroIngest.decodeJsonDatum(sch,
      """{"id":5,"name":null,"score":0.5}""")
    assert(binNull == jsonNull)
  }

  test("distributed binary ingest lands typed rows in a table") {
    val sch = """{"type":"record","name":"R","fields":[
      |  {"name":"id","type":"long"},
      |  {"name":"name","type":["null","string"]}]}""".stripMargin
    val enc = AvroIngest.binaryEncoderFor(sch)
    val rows = (1 to 50).map(i =>
      Row(i.toLong, if (i % 5 == 0) null else s"n$i"))
    val rdd = spark.sparkContext.parallelize(rows, 4).map(r => Row(enc(r)))
    val payloads = spark.createDataFrame(rdd,
      StructType(Seq(StructField("datum", BinaryType))))
    val dir = java.nio.file.Files.createTempDirectory("avro-bin").toString + "/t"
    val table = GraftTable.create(spark, dir, AvroIngest.schemaToStruct(sch),
      Identity.None, TableConfig(walEnabled = false))
    AvroIngest.ingestBinary(table, payloads, "datum", sch, startLsn = 1)
    val got = table.read(None).orderBy("id").collect()
    assert(got.length == 50)
    assert(got(0) == Row(1L, "n1"))
    assert(got(4) == Row(5L, null))
  }
}
