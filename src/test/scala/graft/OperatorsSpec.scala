package graft

import graft.model._
import graft.operators._
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-ops-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def embeddings = spark.read.parquet(s"$sf/embeddings.parquet")

  test("minhash LSH finds the near-duplicate pairs exact jaccard finds") {
    // ground truth: exact 2-gram jaccard >= 0.5 across ALL pairs
    val exact = Dedup.jaccardPairs(
        docs.withColumn("one", lit(1)), "doc_id", "text",
        blockCol = "one", n = 2, minMilli = 500)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashPairs(docs, "doc_id", "text",
        shingleN = 2, numHashes = 64, bands = 16, minMilli = 500)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification step makes precision exact; recall should be high
    assert(lsh.subsetOf(exact), s"LSH produced false positives: ${lsh -- exact}")
    if (exact.nonEmpty) {
      val recall = lsh.size.toDouble / exact.size
      assert(recall >= 0.8, s"LSH recall $recall too low (found ${lsh.size}/${exact.size})")
    }
  }

  test("salted re-split bounds hot-bucket emission and preserves connectivity") {
    import spark.implicits._
    // one 50-doc hot bucket (C(50,2)=1225 pairs if unsplit), two cold docs
    val banded = ((1L to 50L).map(i => (i, 0, 77L)) ++
      Seq((100L, 0, 5L), (101L, 0, 5L))).toDF("id", "band", "bucket")
    val cand = Dedup.minhashCandidatesSalted(banded, maxBucket = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cold buckets behave exactly like the plain self-join
    assert(cand.contains((100L, 101L)))
    // emission from the hot bucket is FAR below quadratic: k=10
    // sub-buckets of ~5 plus 9 star links (hash skew tolerated 4x)
    val hotPairs = cand.filter { case (a, b) => a <= 50 && b <= 50 }
    assert(hotPairs.size < 500, s"emitted ${hotPairs.size} of 1225")
    // the star links keep the split bucket CONNECTED: union-find over
    // the emitted pairs must put all 50 docs in one component
    val parent = scala.collection.mutable.Map((1L to 50L).map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    hotPairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    assert((1L to 50L).map(find).distinct.size == 1,
      "salted re-split disconnected the hot cluster")
    // determinism: identical set under different parallelism
    val again = Dedup.minhashCandidatesSalted(banded.repartition(7), maxBucket = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == cand)
    // recall dominance: everything the DROP cap keeps, the re-split
    // keeps too (cold buckets are untouched by both)
    val dropped = Dedup.minhashCandidatesFromBands(banded, maxBucket = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dropped.subsetOf(cand))
  }

  test("native MinhashSig is bit-identical to the UDF oracle") {
    // the codegen'd Catalyst expression replacing the boxed UDF on the
    // hottest dedup path (VERDICT r10 #3) — identical seeded-splitmix64
    // arithmetic, asserted element-for-element on real shingle sets
    val hs = Dedup.minhashShingleFrame(docs, "doc_id", "text", shingleN = 2)
    val both = hs.select(col("id"),
        Dedup.minhashSignature(col("hs"), 64).as("sig"),
        Dedup.minhashSignatureUdf(col("hs"), 64).as("oracle"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id=${r.getLong(0)}")
    }
    // empty shingle set -> all-MaxValue signature; null -> null
    import spark.implicits._
    val edge = Seq(Tuple1(Seq.empty[Long])).toDF("hs")
      .select(Dedup.minhashSignature(col("hs"), 8).as("sig"),
        Dedup.minhashSignature(lit(null).cast("array<bigint>"), 8).as("n"))
      .collect().head
    assert(edge.getSeq[Long](0) == Seq.fill(8)(Long.MaxValue))
    assert(edge.isNullAt(1))
  }

  test("native HashedShinglesExpr and SimhashFp match their UDF oracles") {
    // the codegen'd first-pass text kernels, asserted bit-identical to
    // the retained UDFs on real docs — INCLUDING the HashSet insertion
    // ORDER of the shingle arrays (staged oracles hash arrays by value)
    val toks = TextOps.tokens(TextOps.normalize(col("text")))
    val both = docs.select(col("doc_id"),
        Dedup.hashedShingles(toks, 3).as("hsE"),
        Dedup.hashedShinglesUdf(toks, 3).as("hsO"),
        TextOps.simhash64(col("text")).as("fpE"),
        TextOps.simhash64Udf(col("text")).as("fpO"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"doc=${r.getLong(0)}")
      assert(r.getLong(3) == r.getLong(4), s"doc=${r.getLong(0)}")
    }
    // TermCounts: one-pass term frequencies equal the per-term
    // interpreted filter counts (bm25's previous form) — including a
    // DUPLICATED term, which must receive its full count in every slot
    val terms = Seq("the", "data", "zebra", "the")
    val tcBoth = docs.select(
        org.apache.spark.sql.graft.TermCounts.asColumn(toks, terms).as("tc"),
        array(terms.map(t =>
          size(filter(toks, x => x === lit(t))).cast("long")): _*).as("ref"))
      .collect()
    tcBoth.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    // unicode sweep — the public `tokens()` is ASCII-alnum by contract,
    // but the kernels take ANY array<string>, so feed raw
    // whitespace-split tokens: multibyte UTF-8 (CJK, accents,
    // cyrillic) and surrogate pairs (emoji, gothic). charAt iterates
    // UTF-16 code units (shingle FNV) and XXH64 hashes UTF-8 bytes
    // (simhash); expression and oracle must agree on BOTH encodings.
    import spark.implicits._
    val uni = Seq(
      (1L, "héllo wörld héllo wörld naïve café naïve café résumé"),
      (2L, "日本語 のテキスト 処理 日本語 のテキスト 検証 対象 です"),
      (3L, "emoji 😀😀 test 𝔊𝔬𝔱𝔥𝔦𝔠 𝔊𝔬𝔱𝔥𝔦𝔠 mixed ascii text here"),
      (4L, "русский текст пример русский текст проверка снова тут"),
      (5L, "mixed 日本 ascii héllo 😀 all четыре scripts in one doc"))
      .toDF("id", "text")
    val wsToks = filter(split(col("text"), " +"), t => t =!= lit(""))
    val uniBoth = uni.select(col("id"),
        Dedup.hashedShingles(wsToks, 2).as("hsE"),
        Dedup.hashedShinglesUdf(wsToks, 2).as("hsO"),
        org.apache.spark.sql.graft.SimhashFp.asColumn(wsToks).as("fpE"),
        transform(wsToks, t => xxhash64(t)).as("hashes"))
      .collect()
    uniBoth.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"unicode doc=${r.getLong(0)}")
      assert(r.getSeq[Long](1).nonEmpty, s"unicode doc=${r.getLong(0)} lost its shingles")
      // simhash oracle recomputed driver-side from the builtin
      // xxhash64 values (the pre-r11 pipeline's exact inputs)
      val votes = new Array[Int](64)
      r.getSeq[Long](4).foreach { h =>
        (0 until 64).foreach { b =>
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1 }
      }
      val want = (0 until 64).foldLeft(0L)((acc, b) =>
        if (votes(b) > 0) acc | (1L << b) else acc)
      assert(r.getLong(3) == want, s"unicode doc=${r.getLong(0)} simhash")
    }
    // null / short-doc conventions: null text → empty set and 0L; a
    // doc with fewer tokens than n → empty set
    val edge = Seq(("two tokens", 1L), (null, 2L)).toDF("text", "id")
      .select(Dedup.hashedShingles(
          TextOps.tokens(TextOps.normalize(col("text"))), 3).as("hs"),
        TextOps.simhash64(col("text")).as("fp"))
      .orderBy(lit(1)).collect()
    assert(edge.forall(r => r.getSeq[Long](0).isEmpty))
    assert(edge.exists(r => r.getLong(1) == 0L))
  }

  test("native AsciiTokens matches the regex+filter tokenizer") {
    // the byte-scan tokenizer vs the regex pipeline it replaced, on
    // real docs AND unicode/multibyte/surrogate text (every non-ASCII
    // byte has the high bit set, so the byte scan can never split
    // inside a codepoint — both sides see non-ASCII as separators)
    import spark.implicits._
    val real = docs.select(
        TextOps.tokens(col("text")).as("a"),
        TextOps.tokensRegex(col("text")).as("b"))
      .where(not(col("a") === col("b"))).count()
    assert(real == 0)
    val uni = Seq("héllo wörld abc123 x", "日本語テキストabc処理def",
        "emoji😀mixed𝔊𝔬𝔱𝔥ascii", "...only---separators!!!", "", "a",
        "Tab\tand\nnewline  split UPPER123lower")
      .toDF("text")
      .select(col("text"), TextOps.tokens(col("text")).as("a"),
        TextOps.tokensRegex(col("text")).as("b"))
      .collect()
    uni.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"text='${r.getString(0)}'")
    }
    // null propagation matches
    val nul = docs.limit(1).select(
        TextOps.tokens(lit(null).cast("string")).as("a"),
        TextOps.tokensRegex(lit(null).cast("string")).as("b"))
      .collect().head
    assert(nul.isNullAt(0) && nul.isNullAt(1))
    // the fused lowered form equals the composed normalize pipeline on
    // real docs + unicode (incl. the Kelvin sign K, whose unicode
    // lowercase IS ascii 'k': normalize kills it pre-lower, and so
    // must the fused scan)
    val fusedReal = docs.select(
        TextOps.normTokens(col("text")).as("a"),
        TextOps.tokensRegex(TextOps.normalize(col("text"))).as("b"))
      .where(not(col("a") === col("b"))).count()
    assert(fusedReal == 0)
    val fusedUni = Seq("MiXeD CaSe ABC123xyz", "Kelvin K sign",
        "İstanbul UPPER lower", "日本ABC語def")
      .toDF("text")
      .select(col("text"), TextOps.normTokens(col("text")).as("a"),
        TextOps.tokensRegex(TextOps.normalizeRegex(col("text"))).as("b"))
      .collect()
    fusedUni.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"text='${r.getString(0)}'")
    }
    // normalize as a byte scan equals the regex pipeline (real docs +
    // unicode + all-separator/empty edges) — fingerprint md5s depend
    // on byte equality, not just token equality
    val normReal = docs.select(TextOps.normalize(col("text")).as("a"),
        TextOps.normalizeRegex(col("text")).as("b"))
      .where(not(col("a") === col("b"))).count()
    assert(normReal == 0)
    val normUni = Seq("  MiXeD  CaSe!!ABC  ", "ABC 123 xyz", "...", "",
        "mixed 456 DEF", "\t\nA\t\nB\t\n",
        "日本 ABC 語 def", // CJK separators between tokens
        "emoji 😀 mid K kelvin") // surrogate pair + U+212A
      .toDF("text")
      .select(col("text"), TextOps.normalize(col("text")).as("a"),
        TextOps.normalizeRegex(col("text")).as("b"))
      .collect()
    normUni.foreach { r =>
      assert(r.getString(1) == r.getString(2), s"text='${r.getString(0)}'")
    }
  }

  test("native NearestCells/PqEncodeCodes/PqAdcScore match their UDF oracles") {
    // the codegen'd ANN kernels (IVF assignment, PQ encode, ADC sum)
    // asserted bit-identical to the retained Scala-UDF oracles —
    // including a ragged dim (non-multiple of subDim), a zero vector
    // (unit() passthrough), duplicated centroids (tie-break by lowest
    // index), and null propagation
    import spark.implicits._
    import org.apache.spark.sql.graft.{NearestCells, PqAdcScore}
    val rnd = new scala.util.Random(7)
    val dim = 20
    val rows = (0 until 120).map { i =>
      (i.toLong, Seq.fill(dim)(rnd.nextGaussian().toFloat))
    } :+ (120L -> Seq.fill(dim)(0f))
    val df = rows.toDF("vec_id", "embedding")
    val cents = Array.fill(9)(Array.fill(dim)(rnd.nextGaussian()))
    cents(5) = cents(2).clone() // exact tie: index 2 must win
    val bc = spark.sparkContext.broadcast(cents)
    val dv = col("embedding").cast("array<double>")
    val cellsBoth = df.select(col("vec_id"),
        NearestCells.asColumn(dv, cents, 4).as("expr"),
        Similarity.nearestCellsUdf(bc, 4)(dv).as("oracle"))
      .collect()
    assert(cellsBoth.nonEmpty)
    cellsBoth.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"vec_id=${r.getLong(0)}")
    }
    // PQ encode: expression vs UDF oracle, row for row
    val cb = Similarity.pqTrain(df, "vec_id", "embedding",
      m = 4, nCodes = 8, iters = 1)
    def codesOf(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("neighbor_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq
    assert(codesOf(Similarity.pqEncode(df, "vec_id", "embedding", cb)) ==
      codesOf(Similarity.pqEncodeUdf(df, "vec_id", "embedding", cb)))
    // ragged slice clamp (m*subDim > dim): expression and oracle agree
    // on the defensive lim path pqTrain itself never produces
    val ragged = Similarity.PqCodebooks(4, 8, 6,
      Array.fill(4 * 8)(Array.fill(6)(rnd.nextGaussian())))
    assert(codesOf(Similarity.pqEncode(df, "vec_id", "embedding", ragged)) ==
      codesOf(Similarity.pqEncodeUdf(df, "vec_id", "embedding", ragged)))
    // ADC lookup-sum: expression vs a driver-side recompute
    val tabs = Array.tabulate(3)(q =>
      Array.tabulate(4 * 8)(j => (q * 100 + j) * 0.125))
    val coded = (0 until 30).map(i =>
      (i % 3, Seq.fill(4)(rnd.nextInt(8)))).toDF("qi", "codes")
    val adc = coded.select(col("qi"), col("codes"),
        PqAdcScore.asColumn(col("qi"), col("codes"), tabs, 8).as("s"))
      .collect()
    adc.foreach { r =>
      val qi = r.getInt(0); val cs = r.getSeq[Int](1)
      val want = cs.zipWithIndex.map { case (c, sub) =>
        tabs(qi)(sub * 8 + c) }.sum
      assert(r.getDouble(2) == want)
    }
    // null propagation on all three
    val nulls = df.limit(1).select(
        NearestCells.asColumn(lit(null).cast("array<double>"), cents, 2).as("a"),
        org.apache.spark.sql.graft.PqEncodeCodes.asColumn(
          lit(null).cast("array<double>"), cb.books, cb.m, cb.nCodes,
          cb.subDim).as("b"),
        PqAdcScore.asColumn(lit(null).cast("int"),
          lit(Array(0, 1, 2, 3)), tabs, 8).as("c"))
      .collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1) && nulls.isNullAt(2))
  }

  test("LSH hot-bucket cap: bounded emission, recall via other bands, accounting") {
    import spark.implicits._
    // crafted band frame: one hot bucket of 50 docs (near-identical
    // boilerplate), two of which ALSO collide in a cold bucket (a
    // genuinely-near pair colliding in several bands), plus an
    // unrelated cold pair
    val hot = (1L to 50L).map(id => (id, 0, 7L))
    val rescue = Seq((1L, 1, 99L), (2L, 1, 99L))
    val cold = Seq((100L, 2, 5L), (101L, 2, 5L))
    val banded = (hot ++ rescue ++ cold).toDF("id", "band", "bucket")
    // uncapped: the hot bucket emits its full C(50,2)
    assert(Dedup.minhashCandidatesFromBands(banded).count() == 1225 + 1)
    // cap ABOVE every bucket: result unchanged (recall untouched)
    assert(Dedup.minhashCandidatesFromBands(banded, maxBucket = 50)
      .count() == 1225 + 1)
    // cap below the hot bucket: its quadratic emission is gone; the
    // near pair (1,2) SURVIVES via its other band, the cold pair is
    // untouched — bounded emission, graceful recall
    val before = graft.observability.Metrics
      .counterValue("graft.lsh_buckets_capped", "dedup")
    val capped = Dedup.minhashCandidatesFromBands(banded, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L), (100L, 101L)))
    assert(graft.observability.Metrics
      .counterValue("graft.lsh_buckets_capped", "dedup") == before + 1)
    // the accounting frame names the dropped bucket exactly
    val over = Dedup.oversizedBuckets(banded, 10).collect()
    assert(over.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0, 7L, 50L)))
    // incremental variant caps on the COMBINED bucket size
    val newB = Seq((200L, 0, 7L), (201L, 2, 5L)).toDF("id", "band", "bucket")
    val inc = Dedup.minhashCandidatesAgainst(newB, banded, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == Set((201L, 100L), (201L, 101L)),
      s"hot-bucket collisions must be dropped, got $inc")
  }

  test("native DotProduct matches the JVM fold, handles nulls") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),        // 32.0
      (2L, Seq(0.5, -1.5), Seq(2.0, 2.0)),                 // -2.0
      (3L, Seq.empty[Double], Seq.empty[Double])           // 0.0
    ).toDF("id", "a", "b")
    val got = df.select($"id",
        graft.functions.VectorExpressions.dotProduct($"a", $"b").as("d"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got == Map(1L -> 32.0, 2L -> -2.0, 3L -> 0.0))
    // null array and null element both yield null
    val n = df.select(
        graft.functions.VectorExpressions.dotProduct(
          org.apache.spark.sql.functions.lit(null)
            .cast("array<double>"), $"b").as("d"),
        graft.functions.VectorExpressions.dotProduct(
          org.apache.spark.sql.functions.array(
            org.apache.spark.sql.functions.lit(null).cast("double")),
          org.apache.spark.sql.functions.array(
            org.apache.spark.sql.functions.lit(1.0))).as("e"))
      .collect().head
    assert(n.isNullAt(0) && n.isNullAt(1))
    // ragged pair (length mismatch) yields null — a corrupt vector must
    // not produce a silent partial dot product
    val ragged = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
      .select(graft.functions.VectorExpressions.dotProduct($"a", $"b").as("d"))
      .collect().head
    assert(ragged.isNullAt(0), "length-mismatched arrays must dot to null")
  }

  test("native LshBucket: deterministic, null array and null element -> null") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, lit}
    val df = Seq((1L, Seq(0.5, -0.25, 1.0)), (2L, Seq(0.5, -0.25, 1.0)))
      .toDF("id", "v")
    val b = df.select(
        graft.functions.VectorExpressions.lshBucket($"v", 8, 0).as("b0"),
        graft.functions.VectorExpressions.lshBucket($"v", 8, 1).as("b1"))
      .collect()
    assert(b(0) == b(1), "identical vectors must bucket identically")
    val n = df.limit(1).select(
        graft.functions.VectorExpressions.lshBucket(
          lit(null).cast("array<double>"), 8, 0).as("x"),
        graft.functions.VectorExpressions.lshBucket(
          array(lit(1.0), lit(null).cast("double")), 8, 0).as("y"))
      .collect().head
    assert(n.isNullAt(0) && n.isNullAt(1),
      "null array and null element must both bucket to null")
  }

  test("minhash dup collapse is pair-identical to the doc-level join") {
    // a corpus with heavy exact-dup clusters (30 copies of each of the
    // first docs): the collapsed path must emit exactly the pairs the
    // plain doc-granularity band join emits — same ids, same
    // jaccard_milli — while only ever banding one rep per cluster
    val copies = (1 to 30).map(i => docs.where(col("doc_id") < 8)
      .select((col("doc_id") + i * 100000L).as("doc_id"), col("text")))
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionByName(copies.reduce(_ unionByName _))
    val sh = Dedup.minhashShingleFrame(corpus, "doc_id", "text", shingleN = 2)
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plain = norm(Dedup.verifyJaccardMilli(sh,
      Dedup.minhashCandidates(sh, 64, 16), minMilli = 500))
    val collapsed = norm(Dedup.minhashPairs(corpus, "doc_id", "text",
      shingleN = 2, numHashes = 64, bands = 16, minMilli = 500))
    assert(collapsed == plain)
    // the dup clusters make this corpus pair-rich by construction
    assert(plain.size > 30 * 29 / 2)
  }

  test("incremental minhash composes exactly with the batch path") {
    // signatures are per-doc, so candidates over old ∪ new must equal
    // within(old) ∪ within(new) ∪ cross(new vs old band index) — the
    // persisted-index increment path loses NOTHING vs recomputing the
    // whole corpus
    val oldDocs = docs.where(col("doc_id") % 2 === 0)
    val newDocs = docs.where(col("doc_id") % 2 === 1)
    def shingles(df: org.apache.spark.sql.DataFrame) =
      Dedup.minhashShingleFrame(df, "doc_id", "text", shingleN = 2)
    val dir = java.nio.file.Files.createTempDirectory("mh-idx").toString
    // persist the corpus index once (bands + shingle sets)
    Dedup.minhashBandFrame(shingles(oldDocs), 64, 16)
      .write.parquet(s"$dir/bands")
    shingles(oldDocs).write.parquet(s"$dir/hs")
    val idxBands = spark.read.parquet(s"$dir/bands")
    val idxHs = spark.read.parquet(s"$dir/hs")
    // increment arrives: band it, probe the stored index
    val newHs = shingles(newDocs)
    val cross = Dedup.minhashCandidatesAgainst(
      Dedup.minhashBandFrame(newHs, 64, 16), idxBands)
    val within = Dedup.minhashCandidates(newHs, 64, 16)
    val verified = Dedup.verifyJaccardMilli(newHs.unionByName(idxHs),
        cross.unionByName(within), minMilli = 500)
      .collect().map(r => {
        val (a, b) = (r.getLong(0), r.getLong(1))
        (math.min(a, b), math.max(a, b))
      }).toSet
    val fullNewPairs = Dedup.minhashPairs(docs, "doc_id", "text",
        shingleN = 2, numHashes = 64, bands = 16, minMilli = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      // drop pairs entirely inside the old corpus: the increment path
      // only ever reports pairs touching the new batch
      .filter { case (a, b) => a % 2 == 1 || b % 2 == 1 }.toSet
    assert(verified == fullNewPairs)
    assert(verified.nonEmpty)
  }

  test("streamed band index accumulates to the exact batch-path result") {
    // the foreachBatch shape of crawl dedup: micro-batches arrive one
    // at a time, each probes the persisted index (cross pairs), checks
    // itself (within pairs), then appends its bands+shingles to the
    // index. Every pair (a,b) is covered exactly when the later side
    // arrives, so the union over batches must equal the one-shot batch
    // path over the whole corpus.
    val parts = Seq(0L, 1L, 2L).map(i => docs.where(col("doc_id") % 3 === i))
    val dir = java.nio.file.Files.createTempDirectory("mh-stream").toString
    val acc = scala.collection.mutable.Set[(Long, Long)]()
    parts.zipWithIndex.foreach { case (p, i) =>
      val hs = Dedup.minhashShingleFrame(p, "doc_id", "text", shingleN = 2)
      val bands = Dedup.minhashBandFrame(hs, 64, 16)
      val within = Dedup.minhashCandidatesFromBands(bands)
      val (cand, verHs) =
        if (i == 0) (within, hs)
        else (within.unionByName(Dedup.minhashCandidatesAgainst(
            bands, spark.read.parquet(s"$dir/bands"))),
          hs.unionByName(spark.read.parquet(s"$dir/hs")))
      Dedup.verifyJaccardMilli(verHs, cand, minMilli = 500).collect()
        .foreach { r =>
          val (a, b) = (r.getLong(0), r.getLong(1))
          acc += ((math.min(a, b), math.max(a, b)))
        }
      bands.write.mode("append").parquet(s"$dir/bands")
      hs.write.mode("append").parquet(s"$dir/hs")
    }
    val full = Dedup.minhashPairs(docs, "doc_id", "text",
        shingleN = 2, numHashes = 64, bands = 16, minMilli = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(acc.toSet == full)
    assert(full.nonEmpty)
  }

  test("LSH ANN reaches high recall@5 on clustered vectors") {
    // LSH's guarantee is distance-dependent: build a corpus of 40
    // clusters (cosine ~0.95 within, ~random across) — the regime
    // near-dup/ANN search actually targets. Deterministic seed.
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val dim = 32
    val base = Array.fill(40)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 400).map { i =>
      val c = base(i % 40)
      val noisy = c.map(x => x + 0.15f * rnd.nextGaussian().toFloat)
      (i.toLong, noisy.toSeq)
    }.toDF("vec_id", "embedding")
    val q = vecs.where(col("vec_id") < 16)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5))
    val approx = pairs(Similarity.lshTopK(vecs, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5, nbits = 8, tables = 4))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"ANN recall@5 = $recall (expected >= 0.8 on clusters)")
  }

  test("IVF ANN reaches high recall@5 on clustered vectors") {
    // same clustered regime as the LSH test: 40 tight clusters; IVF
    // cells should align with clusters, so probing a few cells finds
    // the true neighbors
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val dim = 32
    val base = Array.fill(40)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 400).map { i =>
      val c = base(i % 40)
      (i.toLong, c.map(x => x + 0.15f * rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val q = vecs.where(col("vec_id") < 16)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5))
    val approx = pairs(Similarity.ivfTopK(vecs, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5, nCells = 32, nProbe = 6))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall@5 = $recall (expected >= 0.8 on clusters)")
  }

  test("persisted IVF index reproduces the in-memory IVF path exactly") {
    // train once / probe many: centroids + assignment round-trip
    // through parquet, and the probed candidate set must equal what
    // ivfCandidatePairs computes end-to-end (training is deterministic)
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val dim = 16
    val vecs = (0 until 300).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val q = vecs.where(col("vec_id") < 10)
    val dir = java.nio.file.Files.createTempDirectory("ivf-idx").toString
    Similarity.ivfTrain(vecs, "vec_id", "embedding", nCells = 16)
      .write.parquet(s"$dir/centroids")
    val cents = spark.read.parquet(s"$dir/centroids")
    Similarity.ivfAssign(vecs, "vec_id", "embedding", cents)
      .write.parquet(s"$dir/assign")
    val assigned = spark.read.parquet(s"$dir/assign")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val probe = Similarity.ivfCandidatesFromIndex(
      assigned, "vec_id", cents, q, "vec_id", "embedding", nProbe = 4)
    val fromIndex = pairSet(probe)
    val inMemory = pairSet(Similarity.ivfCandidatePairs(
      vecs, "vec_id", "embedding", q, "vec_id", "embedding",
      nCells = 16, nProbe = 4))
    assert(fromIndex == inMemory)
    assert(fromIndex.nonEmpty)
    // the probed-cell set must reach the assignment scan as a STATIC
    // pushed In-filter (row-group pruning on a cell-clustered index);
    // a broadcast join key alone would scan the whole assignment
    val scans = probe.queryExecution.executedPlan.toString()
    assert(scans.contains("In(cell"),
      s"assignment scan lost the probed-cell pushdown:\n$scans")
  }

  test("simhash: identical docs collide, near-identical docs are close") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (3L, "the quick brown fox jumps over the lazy cat near the river bank"),
      (4L, "completely different words about spark catalyst optimizer plans")
    ).toDF("id", "text")
    val sims = df.select($"id", TextOps.simhash64($"text").as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(1L) == sims(2L), "identical text must produce identical simhash")
    val close = java.lang.Long.bitCount(sims(1L) ^ sims(3L))
    val far = java.lang.Long.bitCount(sims(1L) ^ sims(4L))
    assert(close < far, s"one-word edit ($close bits) should beat unrelated ($far bits)")
  }

  test("PQ ANN: deterministic train, compact codes, high recall@5") {
    // same clustered regime as the LSH/IVF tests; PQ's ADC shortlist
    // must surface the true neighbors for the exact refine to rank
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val dim = 32
    val base = Array.fill(40)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 400).map { i =>
      val c = base(i % 40)
      (i.toLong, c.map(x => x + 0.15f * rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val q = vecs.where(col("vec_id") < 16)
    val cb = Similarity.pqTrain(vecs, "vec_id", "embedding",
      m = 8, nCodes = 16, iters = 2)
    // run-to-run determinism on the same frame (partition-index-ordered
    // combines); a DIFFERENT partitioning may differ in FP low bits
    val cb2 = Similarity.pqTrain(vecs, "vec_id", "embedding",
      m = 8, nCodes = 16, iters = 2)
    assert(cb.books.map(_.toSeq).toSeq == cb2.books.map(_.toSeq).toSeq,
      "training must be deterministic run to run")
    val codes = Similarity.pqEncode(vecs, "vec_id", "embedding", cb)
    val cs = codes.select("codes").collect()
      .map(_.getAs[scala.collection.Seq[Int]](0))
    assert(cs.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)),
      "codes must be m small ints")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5))
    val approx = pairs(Similarity.pqTopK(vecs, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5, m = 8, nCodes = 16, shortlist = 24))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"PQ recall@5 = $recall (expected >= 0.8 on clusters)")
  }

  test("IVF-PQ ANN reaches high recall@5 on clustered vectors") {
    // the composed deployment shape: coarse cells bound the scan, ADC
    // over codes ranks within them, exact refine on the shortlist
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val dim = 32
    val base = Array.fill(40)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 400).map { i =>
      val c = base(i % 40)
      (i.toLong, c.map(x => x + 0.15f * rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val q = vecs.where(col("vec_id") < 16)
    val cb = Similarity.pqTrain(vecs, "vec_id", "embedding",
      m = 8, nCodes = 16, iters = 2)
    val coarse = Similarity.ivfCandidatePairs(vecs, "vec_id", "embedding",
      q, "vec_id", "embedding", nCells = 32, nProbe = 6)
    val cand = Similarity.pqShortlistFromCandidates(coarse,
      Similarity.pqEncode(vecs, "vec_id", "embedding", cb), cb,
      q, "vec_id", "embedding", shortlist = 24)
    // duplicated query rows must not fan out the shortlist join — the
    // deduped qIdx keeps one table per id, so the result is identical
    val candDup = Similarity.pqShortlistFromCandidates(coarse,
      Similarity.pqEncode(vecs, "vec_id", "embedding", cb), cb,
      q.unionAll(q.limit(3)), "vec_id", "embedding", shortlist = 24)
    assert(candDup.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    // a coarse row whose query_id is NOT in `queries` is a caller bug
    // and must fail fast (the Map-lookup behavior), not drop silently
    val ex = intercept[Exception] {
      Similarity.pqShortlistFromCandidates(coarse,
        Similarity.pqEncode(vecs, "vec_id", "embedding", cb), cb,
        q.where(col("vec_id") =!= 0), "vec_id", "embedding",
        shortlist = 24).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(chain(ex).exists(c => String.valueOf(c.getMessage)
        .contains("query_id not in queries")),
      s"expected the fail-fast raise_error, got: $ex")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5))
    val approx = pairs(Similarity.topKFromCandidates(cand,
      vecs, "vec_id", "embedding", q, "vec_id", "embedding", k = 5))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF-PQ recall@5 = $recall (expected >= 0.8)")
  }

  test("simhash pigeonhole blocking has full recall vs brute force") {
    // adversarial fingerprints: pairs differing ONLY in top bits (the
    // pairs prefix-blocking missed) + random noise, verified against
    // exact all-pairs hamming
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = rnd.nextLong()
    val crafted = Seq(
      0L -> base,
      1L -> (base ^ (1L << 63)),               // top bit flip
      2L -> (base ^ (0xFL << 60)),             // 4 top bits flip
      3L -> (base ^ ((1L << 63) | (1L << 31) | 1L)), // spread flips
      4L -> ~base)                             // far away
    val randoms = (5L until 120L).map(i => i -> rnd.nextLong())
    val all = crafted ++ randoms
    val k = 6
    val df = all.toDF("id", "sim")
    val got = Dedup.simhashPairsFrom(df, maxHamming = k)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expect = (for {
      (ia, sa) <- all; (ib, sb) <- all if ia < ib
      if java.lang.Long.bitCount(sa ^ sb) <= k
    } yield (ia, ib)).toSet
    assert(expect.contains((0L, 1L)) && expect.contains((0L, 2L)),
      "test must exercise top-bit pairs")
    assert(got == expect,
      s"missed ${expect.diff(got).size}, extra ${got.diff(expect).size}")
  }

  test("exact dedup keeps one representative per duplicated text") {
    import spark.implicits._
    val df = Seq((10L, "Hello, World!"), (20L, "hello world"), (30L, "unrelated"))
      .toDF("doc_id", "text")
    // normalization collapses case/punctuation -> first two are dups
    val out = Dedup.exact(df, "doc_id", "text").collect()
    assert(out.length == 2)
    val dup = out.find(_.getLong(2) == 2L).get
    assert(dup.getLong(1) == 10L, "keeps min doc_id")
  }

  test("rolling hash fingerprint is stable and normalization-invariant") {
    import spark.implicits._
    val df = Seq((1L, "Spark SQL!"), (2L, "spark   sql"), (3L, "other text"))
      .toDF("id", "text")
    val fps = df.select($"id", TextOps.rollingHash($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("multimodal featurize computes checksum/features per binary payload") {
    import spark.implicits._
    val payload = "abc".getBytes("UTF-8") // 97+98+99 = 294
    val df = Seq((7L, payload)).toDF("media_id", "media")
    val out = Multimodal.featurize(df, "media_id", "media", dim = 4).collect().head
    assert(out.media_id == 7L)
    assert(out.n_bytes == 3L)
    assert(out.checksum == 294L)
    assert(out.feature(0) == 3.0) // len mod 251
    // acc: pos0 'a'(97)+... dim=4: pos0=97, pos1=98, pos2=99, pos3=0
    assert(out.feature(1) == 98.0 && out.feature(2) == 99.0 && out.feature(3) == 0.0)
  }

  test("multimodal frame sampler explodes stride-selected windows") {
    import spark.implicits._
    val bytes = (0 until 100).map(_.toByte).toArray
    val df = Seq((1L, bytes)).toDF("id", "media")
    val frames = Multimodal.sampleFrames(df, "id", "media", frameBytes = 10, stride = 2)
    assert(frames.count() == 5) // 10 windows, every 2nd
  }

  test("JsonIngest: decimal rescale + overflow, RFC3339 UTC canonicalization") {
    val schema = SchemaDsl.struct(
      "id" -> "int32", "price" -> "decimal(10,2)", "at" -> "timestamp")
    val row = JsonIngest.parse(schema,
      """{"id":1,"price":"12.345","at":"2024-03-01T10:30:00.123456+02:00"}""")
    assert(row.getDecimal(1) == new java.math.BigDecimal("12.35")) // HALF_UP
    val ts = row.getTimestamp(2)
    assert(ts.toInstant == java.time.Instant.parse("2024-03-01T08:30:00.123456Z"))
    // number-typed decimal also accepted
    assert(JsonIngest.parse(schema, """{"id":1,"price":9.1,"at":null}""")
      .getDecimal(1) == new java.math.BigDecimal("9.10"))
    assertThrows[IllegalArgumentException](
      JsonIngest.parse(schema, """{"id":1,"price":"123456789.99","at":null}"""))
    assertThrows[IllegalArgumentException](
      JsonIngest.parse(schema, """{"id":"x","price":null,"at":null}"""))
  }

  test("SchemaDsl: REST type grammar incl. rejections") {
    assert(SchemaDsl.parseType("decimal(10,2)") ==
      org.apache.spark.sql.types.DecimalType(10, 2))
    assert(SchemaDsl.parseType("list<int64>") ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))
    assertThrows[IllegalArgumentException](SchemaDsl.parseType("list<list<int32>>"))
    assertThrows[IllegalArgumentException](SchemaDsl.parseType("frobnicate"))
    // field ids assigned in declaration order
    val s = SchemaDsl.struct("a" -> "int32", "b" -> "string")
    assert(s.fields.map(_.metadata.getLong(SchemaDsl.FieldIdKey)).toSeq == Seq(1L, 2L))
    // map<string,T>: stored list<struct{key,value}> (reference keyed-
    // collection convention, otel_schema.rs:49-60), marker round-trips
    val mt = SchemaDsl.parseType("map<string,int64>")
    assert(SchemaDsl.isMapEncoded(mt))
    assert(!SchemaDsl.isMapEncoded(SchemaDsl.parseType("list<int64>")))
    assert(SchemaDsl.typeName(mt) == "map<string,int64>")
    assertThrows[IllegalArgumentException](
      SchemaDsl.parseType("list<map<string,int64>>"))
    assertThrows[IllegalArgumentException](
      SchemaDsl.parseType("map<string,map<string,int64>>"))
    assertThrows[IllegalArgumentException](SchemaDsl.parseType("map<int64,int64>"))
    // JSON ingest: the natural object form AND the entry-array form
    val ms = org.apache.spark.sql.types.StructType(Seq(
      SchemaDsl.field("id", "int64"), SchemaDsl.field("props", "map<string,int64>")))
    val r1 = JsonIngest.parse(ms, """{"id":1,"props":{"a":10,"b":null,"c":30}}""")
    assert(r1.getSeq[Row](1).map(e => (e.getString(0), e.get(1))) ==
      Seq(("a", 10L), ("b", null), ("c", 30L)))
    val r2 = JsonIngest.parse(ms,
      """{"id":2,"props":[{"key":"x","value":7}]}""")
    assert(r2.getSeq[Row](1) == Seq(Row("x", 7L)))
    assertThrows[IllegalArgumentException](
      JsonIngest.parse(ms, """{"id":3,"props":42}"""))
  }

  test("OTEL schema: nested attribute explode") {
    import scala.jdk.CollectionConverters._
    val s = graft.sources.OtelSchema.schema
    val attr = Row("host", Row("web-1", null, null, null))
    val row = Row(null, Seq(attr), null, "scope", "1.0", null,
      "cpu_usage", null, "%", "gauge",
      null, 1704067200000000000L, Seq(Row("core", Row(null, null, 0L, null))),
      0, 0.42, null, null, null, null,
      null, null, null, null, null, null, null)
    val df = spark.createDataFrame(Seq(row).asJava, s)
    val exploded = graft.sources.OtelSchema.explodeAttrs(df)
    val got = exploded.select("metric_name", "attr_key", "attr_value").collect()
    assert(got.map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet ==
      Set(("cpu_usage", "core", "0")))
  }

  test("CdcPipeline: streaming foreachBatch ingests event frames") {
    import spark.implicits._
    val schema = SchemaDsl.struct("id" -> "int64", "v" -> "string")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val table = graft.table.GraftTable.create(spark, s"$dir/t", schema,
      Identity.Keys(Seq("id")), graft.table.TableConfig(walEnabled = false))
    // batch-mode reuse of the same apply path
    val frame = Seq(
      ("i", 1L, Option.empty[Long], Option(1L), Option("a")),
      ("i", 2L, Option.empty[Long], Option(2L), Option("b")),
      ("u", 3L, Option.empty[Long], Option(1L), Option("a2")),
      ("d", 4L, Option.empty[Long], Option(2L), Option.empty[String]))
      .toDF("_op", "_lsn", "_xact", "id", "v")
    graft.streaming.CdcPipeline.applyBatch(table, frame)
    val got = table.read(Some(4)).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a2")))
    table.drop()
  }

  test("text ops agree with hand-computed values") {
    import spark.implicits._
    val df = Seq((1L, "The cat, the dog; and a bird!")).toDF("id", "text")
    val r = df.select(
      TextOps.tokenCount($"text").as("tc"),
      TextOps.wordCount($"text").as("wc"),
      TextOps.punctCount($"text").as("pc"),
      TextOps.langId($"text").as("lang")).collect().head
    assert(r.getAs[Int]("tc") == 7)
    assert(r.getAs[Int]("wc") == 7)
    assert(r.getAs[Int]("pc") == 3)  // , ; !  (. ! ? , ; :)
    assert(r.getAs[String]("lang") == "en")
  }

  test("BPE-ish token count matches hand-tokenized pretokens") {
    import spark.implicits._
    // 'I' / ''ve' / ' got' / ' 12' / ' cats' / ',' / ' don' / ''t'
    // / ' I' / '?'  = 10 pretokens (contractions split, space-prefixed
    // runs, punctuation separate)
    val df = Seq(
      (1L, "I've got 12 cats, don't I?"),
      (2L, "hello  world"), // letter run / whitespace run / letter run
      (3L, "")).toDF("id", "text")
    val got = df.select($"id",
        TextOps.bpeTokenCount($"text").as("n")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == Map(1L -> 10, 2L -> 3, 3L -> 0))
  }

  test("token n-grams window correctly incl. short docs") {
    import spark.implicits._
    val df = Seq((1L, "a b, c d!"), (2L, "x y"), (3L, "solo"), (4L, ""))
      .toDF("id", "text")
    val bi = df.select($"id", TextOps.tokenNgrams($"text", 2).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(bi(1L) == Seq("a b", "b c", "c d"))
    assert(bi(2L) == Seq("x y"))
    assert(bi(3L) == Nil && bi(4L) == Nil)
    val tri = df.select($"id", TextOps.tokenNgrams($"text", 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(tri(1L) == Seq("a b c", "b c d") && tri(2L) == Nil)
  }

  test("semantic dedup marks lower-id in-cell neighbors only") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 0.0)), (2L, Seq(0.99, 0.1, 0.0)), // dups, cell 0
      (3L, Seq(0.0, 1.0, 0.0)),                            // lone, cell 0
      (4L, Seq(0.0, 0.0, 1.0)), (5L, Seq(0.0, 0.1, 0.99)), // dups, cell 1
      (6L, Seq(1.0, 0.05, 0.0))                            // ≈vec 1 but cell 1:
    ).toDF("vec_id", "embedding")                          //   must NOT mark
    val assigned = Seq((1L, 0), (2L, 0), (3L, 0), (4L, 1), (5L, 1), (6L, 1))
      .toDF("vec_id", "cell")
    val got = Dedup.semanticDupMarks(assigned, vecs, "vec_id", "embedding",
        minCosineMilli = 900)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == ((-1L, 1L)) && got(2L) == ((1L, 0L)))
    assert(got(3L) == ((-1L, 1L)))
    assert(got(4L) == ((-1L, 1L)) && got(5L) == ((4L, 0L)))
    assert(got(6L) == ((-1L, 1L))) // cross-cell similarity never marks
  }

  test("substring dup spans: repeats mark merged token intervals") {
    import spark.implicits._
    // docs 1 and 2 share the 5-token run "p q r s t" (k=3 -> windows
    // at 3 consecutive positions merge into ONE span of 5 tokens);
    // doc 3 repeats its own 3-gram "a b c" at two sites (within-doc
    // repeats count); doc 4 shares nothing.
    val df = Seq(
      (1L, "p q r s t u v w"),
      (2L, "x y p q r s t z"),
      (3L, "a b c k m a b c"),
      (4L, "unique words only here")).toDF("doc_id", "text")
    val got = Dedup.substringDupSpans(
        Dedup.substringGramFrame(df, "doc_id", "text", k = 3), k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // doc 1: positions 1,2,3 dup -> span [1,5] = 5 tokens
    // doc 2: positions 3,4,5 dup -> span [3,7] = 5 tokens
    // doc 3: positions 1 and 6 dup (gap 5 > k) -> two 3-token spans
    assert(got == Map(1L -> ((5L, 1L)), 2L -> ((5L, 1L)),
      3L -> ((6L, 2L))))
  }

  test("PII redaction replaces emails/IPs/phones and nothing else") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.com now"),
      (2L, "host 192.168.0.1 and 10.0.0.255 up"),
      (3L, "call +1 555-123-4567 or 555-987-6543"),
      (4L, "v1.2.3 release at 3.4pm, no pii here"),
      (5L, "a@b.io on 1.2.3.4")).toDF("id", "text")
    val got = df.select($"id", TextOps.redactPii($"text").as("r"),
        TextOps.piiMatches($"text", TextOps.EmailPattern).as("ne"),
        TextOps.piiMatches($"text", TextOps.Ipv4Pattern).as("ni"),
        TextOps.piiMatches($"text", TextOps.PhonePattern).as("np"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(got(1L) == (("mail <EMAIL> now", 1, 0, 0)))
    assert(got(2L) == (("host <IP> and <IP> up", 0, 2, 0)))
    assert(got(3L) == (("call <PHONE> or <PHONE>", 0, 0, 2)))
    // "v1.2.3" has only 2 dotted groups; "3.4pm" none — untouched
    assert(got(4L) == (("v1.2.3 release at 3.4pm, no pii here", 0, 0, 0)))
    // email local/domain dots must win over the IP pattern
    assert(got(5L) == (("<EMAIL> on <IP>", 1, 1, 0)))
  }

  /** reference labeling: plain union-find over the same edges */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def componentsOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("connected components: chains, stars, and isolated pairs collapse to min id") {
    // two chains sharing no nodes, a star, a self-loop, a dup edge
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),            // chain -> comp 1
      (10L, 11L), (11L, 12L),                  // chain -> comp 10
      (20L, 21L), (20L, 22L), (20L, 23L),      // star  -> comp 20
      (30L, 30L),                              // self-loop: dropped, 30 absent
      (40L, 41L), (41L, 40L))                  // dup orientation -> comp 40
    val got = componentsOf(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L,
      40L -> 40L, 41L -> 40L))
  }

  test("connected components: long path needs multiple contraction rounds") {
    // a 200-node path (diameter 199) — label propagation would need
    // ~200 rounds; star contraction must converge in O(log n)
    val edges = (0L until 199L).map(i => (i + 1, i))
    val got = componentsOf(edges)
    assert(got.size == 200 && got.values.forall(_ == 0L))
  }

  test("gopher stats: rule numerators and keep flag on constructed docs") {
    import spark.implicits._
    val longText = (1 to 60).map(i => "word" + i).mkString(" ")
    val df = Seq(
      (1L, longText),                                  // clean prose -> keep
      (2L, "dup\ndup\ndup\nuniq"),                     // 2/4 dup lines
      (3L, "- a\n* b\nplain"),                         // 2/3 bullets
      (4L, "so...\nmore..."),                          // 2/2 ellipsis lines
      (5L, "### x # y #"),                             // symbol-heavy
      (6L, ""),                                        // empty: no words
      (7L, ("ab cd " * 40).trim)                       // one dominant 2-gram
    ).toDF("doc_id", "text")
    val got = TextOps.gopherStats(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def f(id: Long, name: String): Long =
      got(id).getAs[Long](name)
    assert(f(1L, "n_words") == 60 && f(1L, "gopher_keep") == 1)
    // doc 2: 4 lines, "dup" occurs 3x -> 2 duplicate occurrences
    assert(f(2L, "dup_line_frac_milli") == 500)
    assert(f(2L, "dup_line_char_frac_milli") ==
      math.floor(1000.0 * 6 / 13).toLong) // 2 dup occurrences x 3 chars / 13 line chars
    assert(f(3L, "bullet_frac_milli") == 666)
    assert(f(4L, "ellipsis_frac_milli") == 1000)
    // doc 5: 5 whitespace words, 5 '#' chars -> ratio exactly 1000
    assert(f(5L, "symbol_ratio_milli") == 1000 && f(5L, "gopher_keep") == 0)
    // empty doc: zero denominators guard to 0, fails word-count gate
    assert(f(6L, "n_words") == 0 && f(6L, "mean_word_len_milli") == 0 &&
      f(6L, "gopher_keep") == 0)
    // doc 7: "ab cd" dominates; 79 grams, "ab cd" occurs 40 times of
    // 79, char mass 40*4 of 160 token chars -> 1000 exactly
    assert(f(7L, "top2gram_char_frac_milli") == 1000 &&
      f(7L, "gopher_keep") == 0)
  }

  test("vocabulary: frequency order, ascii tie-break, k cap") {
    import spark.implicits._
    val df = Seq("b b a", "a c b", "d").toDF("text")
    // counts: a=2 b=3 c=1 d=1 -> b, a, then c before d (tie by token)
    val got = TextOps.vocabulary(df, "text", 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, "b", 3L), (2L, "a", 2L), (3L, "c", 1L)))
  }

  test("sequence packing: pack ids, offsets, boundary straddles per shard") {
    import spark.implicits._
    // BPE counts: "a b c"=3, "a b"=2, "a b c d"=4; seqLen=4
    val df = Seq(
      (1L, "s1", "a b c"), (2L, "s1", "a b"), (3L, "s1", "a b c d"),
      (10L, "s2", "a b c d")  // second shard starts fresh at pack 0
    ).toDF("doc_id", "source", "text")
    val got = TextOps.packSequences(df, "doc_id", "text", "source", 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(1L) == ((3L, 0L, 0L, 0L)))   // [0,3): pack 0, no straddle
    assert(got(2L) == ((2L, 0L, 3L, 1L)))   // [3,5): crosses boundary 4
    assert(got(3L) == ((4L, 1L, 1L, 1L)))   // [5,9): crosses boundary 8
    assert(got(10L) == ((4L, 0L, 0L, 0L)))  // shard s2 independent
  }

  test("quota sampling: deterministic, class-bounded, partition-invariant") {
    import spark.implicits._
    val df = (0L until 2000L).map(i =>
      (i, if (i % 2 == 0) "en" else "de")).toDF("doc_id", "lang")
    val quotas = Map("en" -> 300L)
    val kept = TextOps.quotaSample(df, "doc_id", "lang", quotas, 1000L)
    val byLang = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // de keeps everything; en keeps ~30% (multiplicative hash is
    // uniform-ish; allow wide tolerance, determinism is the point)
    assert(byLang("de") == 1000L)
    assert(byLang("en") > 200L && byLang("en") < 400L)
    // exact same ids regardless of partitioning
    val a = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = TextOps.quotaSample(df.repartition(13), "doc_id", "lang",
      quotas, 1000L).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("stratified sampling: exact per-class counts, rate-thin composes") {
    import spark.implicits._
    val df = (0L until 2000L).map(i =>
      (i, if (i % 4 == 0) "en" else if (i % 4 == 1) "de" else "fr"))
      .toDF("doc_id", "lang")   // en 500, de 500, fr 1000
    val got = TextOps.stratifiedSample(df, "doc_id", "lang", 120)
    val byLang = got.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang == Map("en" -> 120L, "de" -> 120L, "fr" -> 120L))
    // a stratum smaller than the budget keeps everything
    val small = TextOps.stratifiedSample(df.where(col("doc_id") < 40), // en 10
      "doc_id", "lang", 120)
    assert(small.where(col("lang") === "en").count() == 10L)
    // partition-invariant ids, and a 10x quota pre-thin (same key)
    // selects the IDENTICAL final set — the documented skew remedy
    val ids = got.select("doc_id").collect().map(_.getLong(0)).toSet
    val thinned = TextOps.quotaSample(df.repartition(13), "doc_id", "lang",
      Map.empty, defaultPermille = 600L)  // keeps ~60% >> 120/stratum
    val viaThin = TextOps.stratifiedSample(thinned.drop("sample_key",
      "quota_permille"), "doc_id", "lang", 120)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaThin == ids)
  }

  test("connected components: random graph matches union-find") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    val want = unionFind(edges)
    assert(componentsOf(edges) == want)
  }

  test("interval join: bucketized equals naive range join, incl. long and cross-bin intervals") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val points = (0 until 500).map(i => (i.toLong, rnd.nextInt(10000).toLong))
      .toDF("p_id", "ts")
    // lengths from 0 (empty, dropped) to 30x binWidth (long-interval path)
    val intervals = (0 until 60).map { i =>
      val s = rnd.nextInt(10000).toLong
      (1000L + i, s, s + rnd.nextInt(3000).toLong)
    }.toDF("w_id", "s", "e")
    val got = AsOf.intervalJoin(points, "ts", intervals, "s", "e", binWidth = 100L)
      .select("p_id", "w_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = points.join(intervals, $"ts" >= $"s" && $"ts" < $"e")
      .select("p_id", "w_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("z-value interleaves coordinate bits; grid scaling clamps") {
    import spark.implicits._
    import graft.spark.ZOrder
    val df = Seq((5L, 3L)).toDF("x", "y")
    // bits=3, k=2: x occupies even bit positions, y odd ->
    // x=101, y=011 => z = 0b011011 = 27
    val z = df.select(ZOrder.zValue(Seq(col("x"), col("y")), 3)).head().getLong(0)
    assert(z == 27L)
    // grid scaling: ends map to 0 and 2^bits-1; collapsed range -> 0
    val g = Seq((0.0), (100.0), (50.0)).toDF("v")
      .select(ZOrder.gridCoord(col("v"), 0.0, 100.0, 4))
      .collect().map(_.getLong(0)).toSeq
    assert(g == Seq(0L, 15L, 7L))
    assert(Seq(7.0).toDF("v")
      .select(ZOrder.gridCoord(col("v"), 7.0, 7.0, 4)).head().getLong(0) == 0L)
  }

  test("exact quantiles: histogram path equals full sort, edge cases") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(5000)(rnd.nextDouble() * 1000.0 - 200.0)
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val sorted = xs.sorted
    val n = xs.size
    for (buckets <- Seq(7, 4096)) { // tiny bucket count stresses re-rank
      val got = Quantiles.exactQuantiles(df, "v",
          percents = Seq(1, 50, 90, 99, 100), buckets = buckets)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = Seq(1, 50, 90, 99, 100).map(p =>
        p.toLong -> sorted(math.max(1L, n.toLong * p / 100L).toInt - 1)).toMap
      assert(got == want, s"buckets=$buckets")
    }
    // constant column, duplicate-heavy column, empty frame
    val const = Seq.fill(100)(42.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    assert(Quantiles.exactQuantiles(const, "v", Seq(50, 99))
      .collect().forall(_.getDouble(1) == 42.0))
    val dups = (1 to 1000).map(i => (i.toLong, (i % 3).toDouble)).toDF("id", "v")
    val dupSorted = (1 to 1000).map(i => (i % 3).toDouble).sorted
    val gotDup = Quantiles.exactQuantiles(dups, "v", Seq(40, 80))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gotDup == Map(40L -> dupSorted(399), 80L -> dupSorted(799)))
    assert(Quantiles.exactQuantiles(df.where(col("v") > 99999), "v",
      Seq(50)).count() == 0)
  }

  test("heavy hitters: CMS shortlist is exact even with a collision-heavy sketch") {
    import spark.implicits._
    // skewed corpus: token i appears ~ (40 - i) times per doc batch
    val docsDf = (0 until 40).flatMap(i =>
      Seq.fill(40 - i)(s"w$i")).grouped(37).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    // ground truth: unigram counts >= 1% of total occurrences
    val exact = docsDf.select(explode(TextOps.tokens(lower(col("text")))).as("g"))
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    val thr = math.max(1L, total * 10 / 1000)
    val want = exact.filter(_._2 >= thr)
    // width 8 << 40 distinct tokens: every bucket collides, estimates
    // overshoot wildly — the exact verify must still produce `want`
    for (width <- Seq(8, 4096)) {
      val got = TextOps.heavyHitters(docsDf, "text", n = 1,
          phiPermille = 10L, depth = 3, width = width)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, s"width=$width")
    }
    assert(want.nonEmpty && want.size < exact.size)
  }

  test("bloom incremental dedup: exact vs anti-join, even when the filter false-positives") {
    import spark.implicits._
    // history 0..499 (fp = "k<i>"), increment overlaps on multiples of 5
    // and adds fresh keys; an aggressively small/high-fpp filter forces
    // genuine false positives through the verify join
    val hist = (0 until 500).map(i => (i.toLong, s"k$i")).toDF("doc_id", "fp")
    val incr = ((0 until 500 by 5).map(i => (10000L + i, s"k$i")) ++
      (0 until 300).map(i => (20000L + i, s"new$i"))).toDF("doc_id", "fp")
    val want = incr.join(hist.select("fp"), Seq("fp"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    for (fpp <- Seq(0.5, 0.01)) {
      val got = Dedup.bloomNewDocs(hist, incr, "fp",
          expectedItems = 600L, fpp = fpp)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == want, s"fpp=$fpp")
    }
    // no false negatives: every true dup must be routed to the verify
    // join (i.e. none of them can appear in the result)
    assert(want.forall(_ >= 20000L))
  }

  test("KmvAggregator reduce/merge keep the k smallest distinct hashes") {
    val k = 8
    val agg = new Sketches.KmvAggregator(k)
    val rnd = new scala.util.Random(7)
    // reduce path: arbitrary stream with duplicates
    val xs = Seq.fill(200)(rnd.nextInt(50).toLong)
    val buf = xs.foldLeft(agg.zero)(agg.reduce)
    val want = xs.distinct.sorted.take(k)
    assert(buf.toSeq == want)
    // merge path: any split of the stream merges to the same sketch
    val (l, r) = xs.splitAt(83)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(merged.toSeq == want)
    // under-filled finish = exact count; full finish = KMV estimate
    assert(agg.finish(Array(3L, 9L)) == 2L)
    val full = (1 to k).map(_ * 1000L).toArray
    assert(agg.finish(full) == (k - 1).toLong * Sketches.HashMod / full.last)
  }

  test("kmvDistinct estimate converges on a known-cardinality column") {
    import spark.implicits._
    val df = spark.range(0, 100000).select((col("id") % 5000).as("v"))
      .repartition(4)
    val Row(exact: Long, est: Long) =
      Sketches.kmvDistinct(df, col("v"), k = 256).head()
    assert(exact == 5000L)
    // KMV with k=256 has ~1/sqrt(k) ≈ 6% relative error at 1 sigma
    assert(math.abs(est - 5000L) < 1000L, s"est=$est")
  }

  test("chunkDocuments window/stride boundary semantics") {
    import spark.implicits._
    // 10 tokens, winSize 4, stride 3 -> starts 0,3,6,9:
    // [t0..t3] [t3..t6] [t6..t9] [t9] — last chunk is the 1-token tail
    val docs = Seq(
      (1L, (0 until 10).map(i => s"t$i").mkString(" ")),
      (2L, "only three tokens"),
      (3L, "   "), // whitespace-only: no chunks
      (4L, "x")).toDF("doc_id", "text")
    val out = TextOps.chunkDocuments(docs, "doc_id", "text",
      winSize = 4, stride = 3)
      .orderBy("doc_id", "chunk_id").collect()
    val byDoc = out.groupBy(_.getLong(0))
    assert(!byDoc.contains(3L))
    assert(byDoc(1L).map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 4L), (1L, 4L), (2L, 4L), (3L, 1L)))
    assert(byDoc(2L).map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 3L)))
    assert(byDoc(4L).map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 1L)))
    // overlap invariant: consecutive full windows share winSize-stride
    // tokens, so chunk 0's digest of [t3] tail == chunk 3's content
    val d1 = byDoc(1L).map(_.getString(3))
    assert(d1.distinct.length == 4) // all chunk contents distinct here
    // digest is over the joined token text, reproducible
    import org.apache.spark.sql.functions.md5
    val want = Seq("t9").mkString(" ")
    val wantMd5 = spark.range(1).select(md5(lit(want))).head().getString(0)
    assert(d1.last == wantMd5)
  }

  test("qualityModel: integer logit, case-folded hash, empty docs drop") {
    import spark.implicits._
    val docs = Seq((1L, "Hello WORLD"), (2L, "hello world"),
      (3L, "!!!"), (4L, "")).toDF("doc_id", "text")
    val out = TextOps.qualityModel(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // case folding: doc 1 and 2 hash identically
    assert(out.length == 2)
    assert(out(0).getLong(1) == 2L) // n_tokens
    assert(out(0).getLong(2) == out(1).getLong(2), "case-insensitive logit")
    val expected = Seq("hello", "world").map { tok =>
      val h = tok.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
      ((h % 4096) * 2654435761L) % 2001L - 1000L
    }.sum
    assert(out(0).getLong(2) == expected)
    assert(out(0).getString(3) == (if (expected >= 0) "keep" else "drop"))
  }

  test("mixtureWeights: integer shares and sqrt-temperature reweight") {
    import spark.implicits._
    // source a: 9x tokens of source b -> share 900/100; sqrt flattens
    // to ~948/316 before normalization
    val docs = (Seq.fill(9)(("a", "t " * 100)) ++ Seq(("b", "t " * 100)))
      .toDF("source", "text")
    val out = TextOps.mixtureWeights(docs, "source", "text")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out(0) == ("a", 900L, 900L,
      (math.floor(math.sqrt(900000L)).toLong * 1000L) /
        (math.floor(math.sqrt(900000L)).toLong + math.floor(math.sqrt(100000L)).toLong)))
    assert(out(1)._3 == 100L)
    // temperature-1/2 boosts the tail source above its raw share
    assert(out(1)._4 > 100L)
  }

  test("bpeTrain learns classic merges with deterministic tie-breaks") {
    import spark.implicits._
    // corpus: "low" x5, "lower" x2, "newest" x6, "widest" x3
    // classic BPE walkthrough: (e,s) 9 -> (es,t) 9 -> (l,o) 7 -> (lo,w) 7 ...
    val docs = Seq(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
      .toDF("text")
    val out = TextOps.bpeTrain(docs, "text", steps = 4)
      .orderBy("merge_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, "e", "s", "es", 9L),
      (2L, "es", "t", "est", 9L),
      (3L, "l", "o", "lo", 7L),
      (4L, "lo", "w", "low", 7L)))
  }

  test("bpeTrain chained-pair fusion matches fixed 3-pass replace") {
    import spark.implicits._
    // "aaaa" x3: pair (a,a) count = 9 (3 adjacencies x 3 words... one
    // distinct word, cnt 3, 3 pairs each). After merging (a,a) with the
    // 3-pass delimited replace, "a a a a" -> "aa aa"; next best pair is
    // (aa,aa) count 3.
    val docs = Seq(Seq.fill(3)("aaaa").mkString(" ")).toDF("text")
    val out = TextOps.bpeTrain(docs, "text", steps = 2)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(out.toSeq == Seq(("a", "a", 9L), ("aa", "aa", 3L)))
  }

  test("bpeTrain stops early when no pairs remain") {
    import spark.implicits._
    // single-char words only: no adjacent pairs ever
    val docs = Seq("a b c a b").toDF("text")
    val out = TextOps.bpeTrain(docs, "text", steps = 5).collect()
    assert(out.isEmpty)
  }
}
