package graft

import graft.format.iceberg.{AvroOcf, Puffin}
import org.roaringbitmap.longlong.Roaring64NavigableMap
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Randomized round-trip sweeps over the self-written Iceberg codec
 *  layer (Avro OCF, puffin deletion-vector blobs, puffin container).
 *  The fixed-case specs in IcebergSpec pin golden bytes; these sweeps
 *  walk the schema/value/position space the fixed cases cannot
 *  enumerate — nested records, both union null orders, empty
 *  containers, NaN/±0 bit patterns, surrogate-pair strings, and
 *  bitmap positions straddling the roaring 2^16/2^32 container
 *  boundaries. All seeds fixed: failures reproduce.
 */
class IcebergFuzzSpec extends AnyFunSuite {

  import AvroOcf._

  // ---- random schema + value generation --------------------------------

  private def genType(r: Random, depth: Int, names: Iterator[Int]): (AType, String) = {
    def prim: (AType, String) = r.nextInt(8) match {
      case 0 => (ABool, "\"boolean\"")
      case 1 => (AInt, "\"int\"")
      case 2 => (ALong, "\"long\"")
      case 3 => (AFloat, "\"float\"")
      case 4 => (ADouble, "\"double\"")
      case 5 => (ABytes, "\"bytes\"")
      case 6 => (AString, "\"string\"")
      case _ =>
        val n = s"fx${names.next()}"
        val sz = 1 + r.nextInt(8)
        (AFixed(n, sz), s"""{"type":"fixed","name":"$n","size":$sz}""")
    }
    if (depth <= 0) prim
    else r.nextInt(10) match {
      case 0 | 1 =>
        val (it, js) = genType(r, depth - 1, names)
        (AArray(it), s"""{"type":"array","items":$js}""")
      case 2 =>
        val (vt, js) = genType(r, depth - 1, names)
        (AMap(vt), s"""{"type":"map","values":$js}""")
      case 3 | 4 =>
        val n = s"r${names.next()}"
        val fields = (0 until 1 + r.nextInt(3)).map { i =>
          val (ft, js) = genType(r, depth - 1, names)
          ((s"f$i", ft), s"""{"name":"f$i","type":$js}""")
        }
        (ARecord(n, fields.map(_._1)),
          s"""{"type":"record","name":"$n","fields":[${fields.map(_._2).mkString(",")}]}""")
      case 5 | 6 =>
        // union with null, both orders (avro forbids nested unions, so
        // the inner type comes from the non-union generator paths)
        val (inner, js) = genNonUnion(r, depth - 1, names)
        if (r.nextBoolean()) (AOpt(inner, 0), s"""["null",$js]""")
        else (AOpt(inner, 1), s"""[$js,"null"]""")
      case _ => prim
    }
  }

  private def genNonUnion(r: Random, depth: Int, names: Iterator[Int]): (AType, String) = {
    var t = genType(r, depth, names)
    while (t._1.isInstanceOf[AOpt]) t = genType(r, depth, names)
    t
  }

  private def genString(r: Random): String = r.nextInt(5) match {
    case 0 => ""
    case 1 => "é世界" // multibyte
    case 2 => new String(Character.toChars(0x1F600)) + "x" // surrogate pair
    case 3 => "line\nbreak\ttab"
    case _ => r.alphanumeric.take(r.nextInt(12)).mkString
  }

  private def genValue(t: AType, r: Random): Any = t match {
    case ANull => null
    case ABool => r.nextBoolean()
    case AInt => r.nextInt(5) match {
      case 0 => Int.MinValue; case 1 => Int.MaxValue; case 2 => 0
      case _ => r.nextInt()
    }
    case ALong => r.nextInt(5) match {
      case 0 => Long.MinValue; case 1 => Long.MaxValue; case 2 => -1L
      case _ => r.nextLong()
    }
    case AFloat => r.nextInt(6) match {
      case 0 => Float.NaN; case 1 => Float.PositiveInfinity
      case 2 => -0.0f; case _ => r.nextFloat()
    }
    case ADouble => r.nextInt(6) match {
      case 0 => Double.NaN; case 1 => Double.NegativeInfinity
      case 2 => -0.0d; case _ => r.nextDouble()
    }
    case ABytes => Array.fill(r.nextInt(10))(r.nextInt().toByte)
    case AString => genString(r)
    case AFixed(_, sz) => Array.fill(sz)(r.nextInt().toByte)
    case AArray(it) => Seq.fill(r.nextInt(4))(genValue(it, r))
    case AMap(vt) =>
      (0 until r.nextInt(4)).map(i => s"k$i${genString(r)}" -> genValue(vt, r)).toMap
    case ARecord(_, fields) =>
      fields.map { case (fn, ft) => fn -> genValue(ft, r) }.toMap
    case AOpt(inner, _) => if (r.nextBoolean()) null else genValue(inner, r)
  }

  /** Structural equality with byte-array deep compare and FP-bit
   *  compare (NaN == NaN, -0 != 0 would be bitwise-distinct anyway). */
  private def deepEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
    case (x: Float, y: Float) =>
      java.lang.Float.floatToIntBits(x) == java.lang.Float.floatToIntBits(y)
    case (x: Double, y: Double) =>
      java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y)
    case (x: Seq[_], y: Seq[_]) =>
      x.size == y.size && x.lazyZip(y).forall(deepEq)
    case (x: Map[_, _], y: Map[_, _]) =>
      x.size == y.size && x.asInstanceOf[Map[String, Any]].forall { case (k, v) =>
        y.asInstanceOf[Map[String, Any]].get(k).exists(w => deepEq(v, w)) ||
          (y.asInstanceOf[Map[String, Any]].contains(k) &&
            y.asInstanceOf[Map[String, Any]](k) == null && v == null)
      }
    case _ => a == b
  }

  test("avro OCF round-trips 60 random schemas x random records exactly") {
    for (seed <- 0 until 60) {
      val r = new Random(seed)
      val names = Iterator.from(0)
      val fields = (0 until 1 + r.nextInt(4)).map { i =>
        val (ft, js) = genType(r, depth = 2, names)
        ((s"c$i", ft), s"""{"name":"c$i","type":$js}""")
      }
      val schema =
        s"""{"type":"record","name":"top","fields":[${fields.map(_._2).mkString(",")}]}"""
      val top = ARecord("top", fields.map(_._1))

      // the writer consumes the JSON via its own parser: parse(schema)
      // must reconstruct the generated tree exactly
      assert(AvroOcf.parse(schema) == top, s"seed=$seed schema parse drift")

      val recs = Seq.fill(r.nextInt(5))(
        genValue(top, r).asInstanceOf[Map[String, Any]])
      val meta = Map("m" -> genString(r))
      val bytes = AvroOcf.writeFile(schema, meta, recs)
      val back = AvroOcf.readFile(bytes)
      assert(back.meta("m") == meta("m"), s"seed=$seed meta drift")
      assert(back.records.size == recs.size, s"seed=$seed row count")
      back.records.lazyZip(recs).foreach { (got, want) =>
        assert(deepEq(got, want),
          s"seed=$seed record drift\nschema=$schema\ngot=$got\nwant=$want")
      }
      // write determinism (golden stability holds for arbitrary schemas)
      assert(java.util.Arrays.equals(bytes, AvroOcf.writeFile(schema, meta, recs)),
        s"seed=$seed nondeterministic bytes")
    }
  }

  test("DV blobs round-trip position sets straddling roaring container boundaries") {
    val interesting = Seq(0L, 1L, 0xFFFFL, 0x10000L, 0x10001L,
      0x7FFFFFFFL, 0x80000000L, 0xFFFFFFFFL, 0x100000000L, 0x100000001L,
      (1L << 40) - 1, 1L << 40)
    for (seed <- 0 until 40) {
      val r = new Random(1000 + seed)
      val positions = scala.collection.mutable.Set[Long]()
      // random picks from the boundary set
      interesting.foreach(p => if (r.nextBoolean()) positions += p)
      // a dense run (exercises run/bitmap containers)
      if (r.nextBoolean()) {
        val base = interesting(r.nextInt(interesting.size))
        (0 until 1000).foreach(i => positions += base + i)
      }
      // sparse randoms below 2^41 (parquet row positions)
      (0 until r.nextInt(50)).foreach(_ => positions += math.abs(r.nextLong()) % (1L << 41))

      val bm = new Roaring64NavigableMap()
      positions.foreach(bm.addLong)
      val blob = Puffin.dvBlobBytes(bm)
      val back = Puffin.dvBlobParse(blob)
      assert(back.getLongCardinality == positions.size, s"seed=$seed cardinality")
      positions.foreach(p => assert(back.contains(p), s"seed=$seed lost $p"))
      // membership is exact, not just cardinality-equal
      interesting.foreach(p =>
        assert(back.contains(p) == positions.contains(p), s"seed=$seed ghost $p"))

      // corrupting any single payload byte must fail the crc gate
      if (blob.length > 13) {
        val at = 8 + r.nextInt(blob.length - 12)
        val bad = blob.clone(); bad(at) = (bad(at) ^ 0x40).toByte
        intercept[Exception] { Puffin.dvBlobParse(bad) }
      }
    }
  }

  test("puffin container round-trips random blob sets and unicode properties") {
    for (seed <- 0 until 25) {
      val r = new Random(2000 + seed)
      val blobs = (0 until 1 + r.nextInt(6)).map { i =>
        val bm = new Roaring64NavigableMap()
        (0 until r.nextInt(30)).foreach(_ => bm.addLong(math.abs(r.nextLong()) % (1L << 41)))
        val props = (0 until r.nextInt(3)).map(j =>
          s"p$j${genString(r)}" -> genString(r)).toMap +
          ("referenced-data-file" -> s"/data/é$i.parquet")
        (Puffin.dvBlobBytes(bm), Puffin.BlobMeta(Puffin.DeletionVectorV1,
          Seq.empty, i.toLong, 1L, 0, 0, props))
      }
      val (bytes, placed) = Puffin.writeBytes(blobs)
      val back = Puffin.readBytes(bytes)
      assert(back.blobs.size == blobs.size, s"seed=$seed blob count")
      assert(placed.map(_.offset) == back.blobs.map(_.offset), s"seed=$seed offsets")
      back.blobs.lazyZip(blobs).zipWithIndex.foreach { case ((got, (raw, meta)), i) =>
        assert(got.properties == meta.properties, s"seed=$seed blob $i props")
        assert(got.snapshotId == meta.snapshotId, s"seed=$seed blob $i snapshot")
        val gotBm = Puffin.dvBlobParse(back.blobBytes(got))
        val wantBm = Puffin.dvBlobParse(raw)
        assert(java.util.Arrays.equals(gotBm.toArray, wantBm.toArray),
          s"seed=$seed blob $i bitmap drift")
      }
    }
  }
}
