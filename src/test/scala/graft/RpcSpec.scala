package graft

import graft.model._
import graft.sources.{RpcServer, RpcWire, ScanState}
import graft.sources.RpcWire._
import graft.table._
import org.apache.spark.sql.{Row, SparkSession}
import org.roaringbitmap.longlong.Roaring64Bitmap
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.io.DataInputStream
import java.nio.file.Files

/**
 * The S12 RPC plane: bincode-standard wire codec (varint edges,
 * request round-trips, error frames), the scan-state blob's exact
 * flat layout (golden bytes vs the reference's encoding,
 * `table_metadata.rs:30-95`), and the full server flow — create /
 * load / list / schema / scan-begin (blob-driven read with DV byte
 * ranges) / pin-protected vacuum / scan-end.
 */
class RpcSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-rpc-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("bincode varint edges round-trip") {
    val vals = Seq(0L, 1L, 250L, 251L, 65535L, 65536L,
      0xffffffffL, 0x100000000L, Long.MaxValue)
    vals.foreach { v =>
      val bytes = new Enc().varint(v).toBytes
      val expectLen = v match {
        case x if x < 251 => 1
        case x if x <= 0xffffL => 3
        case x if x <= 0xffffffffL => 5
        case _ => 9
      }
      assert(bytes.length == expectLen, s"$v -> ${bytes.length} bytes")
      assert(new Dec(bytes).varint() == v)
    }
  }

  test("every request shape round-trips through the frame layer") {
    val reqs: Seq[Request] = Seq(
      CreateSnapshot("db", "t", 42L),
      CreateTable("db", "t", "postgres", "postgres://u", """{"a":1}"""),
      DropTable("db", "t"),
      GetParquetMetadatas(Seq("/a.parquet", "/b.parquet")),
      GetTableSchema("db", "t"),
      ListTables,
      LoadFiles("db", "t", Seq("/x.parquet")),
      OptimizeTable("db", "t", "full"),
      ScanTableBegin("db", "t", 7L),
      ScanTableEnd("db", "t"))
    reqs.foreach { r =>
      assert(decodeRequest(unframe(frame(encodeRequest(r)))) == r)
    }
  }

  test("scan-state blob matches the reference layout byte-for-byte") {
    // mirrors the reference's own test vector shape
    // (table_metadata.rs test_table_metadata_serde)
    val s = ScanState.State(
      dataFiles = Seq("/d/1.parquet", "/d/2.parquet"),
      puffinFiles = Seq("/p/1-puffin.bin"),
      deletionVectors = Seq(ScanState.DvRef(0, 0, 4, 10)),
      positionDeletes = Seq(ScanState.PositionDelete(1, 2)))
    val bytes = ScanState.encode(s)
    // hand-computed: u32 LE throughout.
    // data offsets: n=2, [0, 12, 24]; puffin offsets: n=1, [0, 15]
    // dvs: n=1, (0,0,4,10); pds: n=1, (1,2); then path bytes
    val header = Seq(
      2, 0, 12, 24, // data files: count + 3 offsets
      1, 0, 15, // puffin files: count + 2 offsets
      1, 0, 0, 4, 10, // one DV quad
      1, 1, 2) // one position delete
    val b = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    header.foreach(h => assert(b.getInt() == h))
    val tail = new Array[Byte](b.remaining()); b.get(tail)
    assert(new String(tail, "UTF-8") ==
      "/d/1.parquet/d/2.parquet/p/1-puffin.bin")
    assert(ScanState.decode(bytes) == s)
  }

  test("server flow: create, load, list, schema, scan with DVs, vacuum-safe") {
    val wh = Files.createTempDirectory("graft-rpc-wh").toString
    val catalog = GraftCatalog(spark, wh)
    val server = new RpcServer(catalog)
    def call[A](r: Request)(read: Dec => A): A =
      decodeResult(unframe(server.handleFrame(frame(encodeRequest(r)))))(read)
        .fold(e => fail(s"rpc error: $e"), identity)

    // source parquet for the initial bulk load
    val srcDir = Files.createTempDirectory("graft-rpc-src").toString
    import spark.implicits._
    (1 to 100).map(i => (i.toLong, s"n$i", i * 2L)).toDF("id", "name", "v")
      .coalesce(1).write.mode("overwrite").parquet(srcDir)

    call(CreateTable("db", "users", "parquet", srcDir,
      """{"schema":[{"name":"id","type":"int64"},{"name":"name","type":"string"},
        |{"name":"v","type":"int64"}],"key":["id"]}""".stripMargin))(_ => ())
    val t = catalog.table("db.users")
    assert(t.read().count() == 100)

    // delete some rows so the scan blob carries DV byte ranges
    t.apply(Seq(Delete(Seq(3L), t.commitLsn + 1),
      Delete(Seq(50L), t.commitLsn + 2), Commit(t.commitLsn + 3)))
    assert(t.read().count() == 98)

    val infos = call(ListTables)(d => d.seq(decodeTableInfo(d)))
    assert(infos.map(i => (i.database, i.table)) == Seq(("db", "users")))
    assert(infos.head.cardinality == 98 && infos.head.commitLsn == t.commitLsn)

    val schemaBytes = call(GetTableSchema("db", "users"))(_.bytesField())
    assert(schemaBytes.length > 0)
    val schemaText = new String(schemaBytes, "ISO-8859-1")
    assert(schemaText.contains("name") && schemaText.contains("id"))

    // scan protocol: blob-driven read must equal the library read
    val blob = call(ScanTableBegin("db", "users", t.commitLsn))(_.bytesField())
    val st = ScanState.decode(blob)
    assert(st.dataFiles.nonEmpty && st.puffinFiles.nonEmpty &&
      st.deletionVectors.nonEmpty)
    val deletedByFile = st.deletionVectors.groupBy(_.dataFileNumber).map {
      case (fileNum, refs) =>
        val bm = new Roaring64Bitmap
        refs.foreach { r =>
          val sidecar = graft.format.Fio.readBytes(st.puffinFiles(r.puffinFileNumber))
          val slice = java.util.Arrays.copyOfRange(sidecar,
            r.offset, r.offset + r.size)
          val one = new Roaring64Bitmap
          one.deserialize(new DataInputStream(
            new java.io.ByteArrayInputStream(slice)))
          bm.or(one)
        }
        fileNum -> bm
    }
    val live = st.dataFiles.zipWithIndex.map { case (path, num) =>
      val df = spark.read.parquet(path)
        .select(col("id"), col("_metadata.row_index").as("_pos"))
      deletedByFile.get(num) match {
        case Some(bm) =>
          val dead = bm.toArray.toSet
          df.collect().filterNot(r => dead.contains(r.getLong(1)))
            .map(_.getLong(0)).toSeq
        case None => df.collect().map(_.getLong(0)).toSeq
      }
    }.reduce(_ ++ _)
    val expected = t.read().select("id").collect().map(_.getLong(0)).toSeq
    assert(live.sorted == expected.sorted)

    // the open scan pin must survive an optimize + vacuum cycle
    call(OptimizeTable("db", "users", "full"))(_ => ())
    val stillLive = st.dataFiles.map(p =>
      spark.read.parquet(p).count()).sum
    assert(stillLive >= 98, "pinned files vanished under an open scan")
    call(ScanTableEnd("db", "users"))(_ => ())

    // footer bytes for the CURRENT manifest's files are valid thrift
    val nowBlob = call(ScanTableBegin("db", "users", t.commitLsn))(_.bytesField())
    val nowFiles = ScanState.decode(nowBlob).dataFiles
    val footers = call(GetParquetMetadatas(nowFiles))(d =>
      d.seq(d.bytesField()))
    assert(footers.length == nowFiles.length && footers.forall(_.length > 0))
    call(ScanTableEnd("db", "users"))(_ => ())

    call(CreateSnapshot("db", "users", t.commitLsn))(_ => ())

    // error frames: unknown table is an Err result, not an exception
    val err = decodeResult(unframe(server.handleFrame(frame(
      encodeRequest(GetTableSchema("db", "nope"))))))(_ => ())
    assert(err.isLeft)

    call(DropTable("db", "users"))(_ => ())
    assert(catalog.list.isEmpty)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
