package graft.operators

import graft.observability.Metrics
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines, all expressed as
 * declarative DataFrame plans (Catalyst optimizes; everything shuffles
 * on explicit keys and scales horizontally):
 *
 *  - exact dedup: hash-groupBy on a normalized fingerprint;
 *  - n-gram Jaccard near-dup: token-set similarity self-join with a
 *    blocking key to bound the candidate space;
 *  - MinHash + LSH near-dup: shingle -> minhash signature -> band ->
 *    bucket join -> exact-Jaccard verification (the scale path: only
 *    colliding bands ever join);
 *  - SimHash near-dup: 64-bit fingerprint + Hamming-ball self-join.
 */
object Dedup {

  /** Exact dedup: one representative (min id) per normalized-text
   *  fingerprint. Map-side partial aggregation; single shuffle on the
   *  16-byte fingerprint, never on the document text. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextOps.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Distinct word n-gram shingles of the normalized text. For n > 1
   *  the windows come from the native `TokenNgrams` expression — the
   *  `transform(sequence, slice)` formulation it replaces re-evaluated
   *  the token subtree once per position (see the expression's doc);
   *  the gram VALUES are identical. */
  def shingles(c: Column, n: Int): Column = {
    val toks = TextOps.normTokens(c)
    if (n == 1) array_distinct(toks)
    else array_distinct(
      org.apache.spark.sql.graft.TokenNgrams.asColumn(toks, n))
  }

  /** Jaccard similarity of two array columns, in exact integer
   *  milli-units: (1000 * |A∩B|) div |A∪B| — engine-portable. */
  def jaccardMilli(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("long")
    // |A∪B| = |A|+|B|-|A∩B| (inputs are distinct-element arrays) —
    // avoids array_union and is the formula the SQL oracle mirrors
    val uni = size(a).cast("long") + size(b).cast("long") - inter
    // floor((1000*i)/u) == (1000*i)//u: consecutive values of the
    // rational are >= 1000/u apart, far beyond double rounding error
    when(uni === 0, lit(0L))
      .otherwise(floor(lit(1000L) * inter / uni).cast("long"))
  }

  /**
   * Exact n-gram Jaccard near-dup pairs >= `minMilli`, blocked by
   * `blockCol` (pairs are only compared within a block — at 100 TB the
   * blocking key is what keeps the self-join from being quadratic; use
   * a coarse cluster id, source, or LSH band as the block).
   */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, n: Int, minMilli: Int): DataFrame = {
    val base = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
      shingles(col(textCol), n).as("sh"))
    // Dictionary-encode shingles to dense per-block ints before the
    // pair stage: the dictionary is a bijection within the block, so
    // per-pair intersection counts — and therefore every output value —
    // are identical to string-set Jaccard, but each pair eval becomes a
    // primitive merge over two sorted int arrays instead of building a
    // string HashSet per pair (the measured hot spot: at sf1 94% of the
    // ~6M candidate pairs survive to output, so per-pair constant cost
    // IS the runtime). The narrow int arrays also shrink the self-join
    // shuffle. Docs with empty shingle sets drop out of the explode;
    // they cannot reach any output pair (empty vs empty -> jaccard 0,
    // empty vs non-empty -> size-ratio prune), so results are
    // unchanged. Per-block vocabulary is dictionary-bounded — the same
    // boundedness the block declaration already asserts for the pair
    // space itself.
    val dict = base.select(col("blk"), explode(col("sh")).as("s")).distinct()
      .withColumn("idx",
        row_number().over(Window.partitionBy("blk").orderBy("s")))
    // shingle frame persisted: both self-join sides derive from it, and
    // without a cache each side would re-tokenize + re-encode. One
    // spill-safe copy is the standard trade; unpersisted on return.
    val t = base.select(col("blk"), col("id"), explode(col("sh")).as("s"))
      .join(dict, Seq("blk", "s"))
      .groupBy(col("blk"), col("id"))
      .agg(sort_array(collect_list(col("idx"))).as("sh"))
      .select(col("blk"), col("id"), col("sh"),
        size(col("sh")).cast("long").as("sz"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val a = t.select(col("blk"), col("id").as("id_a"), col("sh").as("sh_a"),
        col("sz").as("sz_a"))
      val b = t.select(col("blk"), col("id").as("id_b"), col("sh").as("sh_b"),
        col("sz").as("sz_b"))
      // Single-pass merge intersection over the sorted dictionary
      // codes as a native codegen'd Catalyst expression — reads the
      // int ArrayData in place, no per-pair conversion or allocation.
      // Plan-pinned nondeterministic (the expression's doc explains
      // the double-eval rewrite it blocks), so it runs EXACTLY once
      // per pair.
      val jm = (x: Column, y: Column) =>
        graft.functions.VectorExpressions.jaccardMilliSorted(x, y)
      // join on the cheap conjuncts only: ids and sizes are longs; the
      // size-ratio bound Jaccard(A,B) <= min(|A|,|B|)/max(|A|,|B|)
      // prunes pairs that cannot reach minMilli before the intersection
      val pairs = a.join(b,
          a("blk") === b("blk") && col("id_a") < col("id_b") &&
            lit(1000L) * least(col("sz_a"), col("sz_b")) >=
              lit(minMilli.toLong) * greatest(col("sz_a"), col("sz_b")))
        .select(col("id_a"), col("id_b"),
          jm(col("sh_a"), col("sh_b")).as("jaccard_milli"))
        .where(col("jaccard_milli") >= minMilli)
      // materialize (severs lineage from the cached shingle frame) so
      // the cache can be dropped before returning; localCheckpoint
      // blocks are GC-reclaimed by the ContextCleaner when the caller
      // releases the frame, unlike CacheManager entries
      pairs.localCheckpoint(eager = true)
    } finally t.unpersist()
  }

  /** splitmix64 finalizer: strong 64-bit mixing, branch-free. */
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** 64-bit hash of a string (polynomial accumulate + splitmix64
   *  finalize) — deterministic across executors. */
  @inline private def hashString(s: String): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < s.length) { h = h * 0x100000001B3L + s.charAt(i); i += 1 }
    mix64(h)
  }

  /**
   * Distinct hashed word n-gram shingles in ONE JVM pass per document.
   * Spark's higher-order array functions evaluate their lambdas
   * interpreted (no whole-stage codegen inside `transform`), which at
   * numHashes * shingles * docs scale costs minutes; this tight loop
   * replaces ~10^8 interpreted expression evals with primitive array
   * work. Tokens still come from the codegen'd split/filter pipeline.
   */
  def hashedShingles(tokensCol: Column, n: Int): Column =
    // codegen'd HashedShinglesExpr (spark/TextHashExpressions.scala):
    // bit-identical FNV+splitmix64 arithmetic AND HashSet insertion
    // order to the retained UDF oracle below; coalesce restores the
    // UDF's null-tokens→empty-set convention
    coalesce(
      org.apache.spark.sql.graft.HashedShinglesExpr.asColumn(tokensCol, n),
      typedlit(Seq.empty[Long]))

  /** The pre-r11 UDF form of [[hashedShingles]] — kept as the
   *  equivalence oracle for the codegen expression (DedupSpec). */
  private[graft] def hashedShinglesUdf(tokensCol: Column, n: Int): Column = {
    val f = udf((toks: Seq[String]) => {
      if (toks == null || toks.length < n) Array.empty[Long]
      else {
        val set = new java.util.HashSet[Long]()
        var i = 0
        val last = toks.length - n
        val arr = toks.toArray
        while (i <= last) {
          var h = 0xCBF29CE484222325L
          var j = 0
          while (j < n) {
            val t = arr(i + j)
            var k = 0
            while (k < t.length) { h = h * 0x100000001B3L + t.charAt(k); k += 1 }
            h = h * 0x100000001B3L + ' '
            j += 1
          }
          set.add(mix64(h))
          i += 1
        }
        val out = new Array[Long](set.size)
        val it = set.iterator()
        var p = 0
        while (it.hasNext) { out(p) = it.next(); p += 1 }
        out
      }
    })
    f(tokensCol)
  }

  /** MinHash signature over hashed shingles: all `numHashes` minima
   *  (seeded splitmix64 rehash per function) in one codegen'd pass —
   *  a native Catalyst expression (`spark/MinhashSig.scala`), so the
   *  hottest dedup scan stays inside whole-stage codegen with zero
   *  catalyst→Seq boxing. */
  def minhashSignature(hashedShingleCol: Column, numHashes: Int): Column =
    org.apache.spark.sql.graft.MinhashSig.asColumn(hashedShingleCol, numHashes)

  /** The pre-r11 UDF form of [[minhashSignature]] — kept as the
   *  equivalence oracle for the codegen expression (spec-asserted
   *  bit-identical in DedupSpec). */
  private[graft] def minhashSignatureUdf(hashedShingleCol: Column,
      numHashes: Int): Column = {
    val f = udf((hs: Seq[Long]) => {
      val sig = Array.fill(numHashes)(Long.MaxValue)
      hs.foreach { x =>
        var h = 0
        while (h < numHashes) {
          val v = mix64(x ^ (h * 0x9E3779B97F4A7C15L))
          if (v < sig(h)) sig(h) = v
          h += 1
        }
      }
      sig
    })
    f(hashedShingleCol)
  }

  /**
   * MinHash+LSH near-duplicate pairs: signatures are cut into `bands`
   * bands of `numHashes/bands` rows; docs colliding in any band become
   * candidates; candidates are verified with exact Jaccard on the
   * shingle sets. Only band-bucket collisions are ever joined —
   * `explode` + shuffle on (band, bucketHash), the standard
   * sub-quadratic LSH plan.
   */
  /** SCALE-ADAPTIVE shuffle sizing for the LSH block (guide §2: derive
   *  partitioning from input size, never a constant tuned to one
   *  deployment). The exact-dup collapse and the verification joins
   *  shuffle the corpus's shingle ARRAYS — tens of times the input's
   *  compressed bytes — and at a session default of one partition per
   *  core their per-task sort/join state overflows execution memory at
   *  decade scale (the sf10 leg measured 3.8 GB of task spill in a
   *  CLEAN window, VERDICT r18 #5 — the churn that multiplies under a
   *  memory-contended host). partitions = input-bytes /
   *  `graft.lsh.bytesPerPartition` (default 512 KiB of compressed
   *  input ≈ tens of MB shuffled), raised only ABOVE the session
   *  value and capped at `graft.lsh.partitionsFactor` ×
   *  defaultParallelism (default 4×) — so small corpora keep the
   *  session layout (no extra task overhead: measured at sf1) and huge
   *  ones bound per-task state (guide §2.2/§2.5: more, smaller
   *  partitions; AQE coalesces any small tail back). */
  private def lshShufflePartitions(df: DataFrame, sessionParts: Int): Int = {
    val factor = sys.props.get("graft.lsh.partitionsFactor")
      .flatMap(s => scala.util.Try(s.toInt).toOption).filter(_ > 0)
      .getOrElse(4)
    val perPart = sys.props.get("graft.lsh.bytesPerPartition")
      .flatMap(s => scala.util.Try(s.toLong).toOption).filter(_ > 0)
      .getOrElse(512L * 1024)
    // planner estimate (file sizes for a scan) — no job is run; an
    // unknown estimate leaves the session layout untouched
    val estBytes = scala.util.Try(
      df.queryExecution.optimizedPlan.stats.sizeInBytes
        .min(BigInt(Long.MaxValue)).toLong).getOrElse(0L)
    val cap = df.sparkSession.sparkContext.defaultParallelism.toLong * factor
    math.max(sessionParts.toLong,
      math.min(cap, estBytes / perPart)).toInt
  }

  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
      minMilli: Int = 500, maxBucket: Int = 0,
      saltResplit: Boolean = false): DataFrame = {
    // every heavy exchange of the pipeline materializes INSIDE this
    // method (the eager localCheckpoint below), so the spill-bounding
    // partition sizing wraps it here and restores the session value
    val spark = df.sparkSession
    val partKey = "spark.sql.shuffle.partitions"
    val oldParts = spark.conf.get(partKey)
    val sized = scala.util.Try(oldParts.toInt).toOption
      .map(p => lshShufflePartitions(df, p))
    sized.filter(p => p.toString != oldParts)
      .foreach(p => spark.conf.set(partKey, p.toString))
    try minhashPairsInner(df, idCol, textCol, shingleN, numHashes, bands,
      minMilli, maxBucket, saltResplit)
    finally spark.conf.set(partKey, oldParts)
  }

  private def minhashPairsInner(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int, bands: Int,
      minMilli: Int, maxBucket: Int,
      saltResplit: Boolean): DataFrame = {
    // hashed shingle sets, persisted once: the collapse, the band
    // self-join sides and BOTH verification joins re-read this frame —
    // uncached, the corpus would re-tokenize ~4x. One spill-safe copy
    // of int64 shingle sets (smaller than the text) is the standard
    // LSH trade at any scale; it is unpersisted before returning
    // (result is materialized below).
    val t = minhashShingleFrame(df, idCol, textCol, shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // EXACT-DUP COLLAPSE before the banded join: docs with the same
      // shingle SET have the same signature, so an m-doc dup cluster
      // collides in EVERY band and the doc-granularity self-join emits
      // m^2/2 candidates x bands — quadratic in cluster size, the
      // pathology that kills dup-heavy corpora (see simhashPairsFrom
      // for the same fix on the simhash path). One representative per
      // distinct set runs LSH + verification; pairs expand back
      // output-bound: cross-cluster via two membership joins (each
      // member pair has the representatives' exact Jaccard), plus the
      // within-cluster pairs at exactly 1000 (identical non-empty
      // sets; the shingle frame excludes empties).
      val member = t.select(col("id"), array_sort(col("hs")).as("k"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val reps = member.groupBy(col("k")).agg(min(col("id")).as("id"))
        .join(t, "id").select(col("k"), col("id"), col("hs"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val repT = reps.select(col("id"), col("hs"))
        // hot-bucket defense: drop (capBuckets) or salted re-split —
        // the re-split keeps recall (see minhashCandidatesSalted)
        val banded = minhashBandFrame(repT, numHashes, bands)
        val repCand =
          if (saltResplit && maxBucket > 0)
            minhashCandidatesSalted(banded, maxBucket)
          else minhashCandidatesFromBands(banded, maxBucket)
        val repPairs = verifyJaccardMilli(repT, repCand, minMilli)
        val repKey = reps.select(col("id"), col("k"))
        val cross = repPairs
          .join(repKey.select(col("id").as("id_a"), col("k").as("k_a")), "id_a")
          .join(repKey.select(col("id").as("id_b"), col("k").as("k_b")), "id_b")
          .join(member.select(col("k").as("k_a"), col("id").as("ma")), "k_a")
          .join(member.select(col("k").as("k_b"), col("id").as("mb")), "k_b")
          .select(least(col("ma"), col("mb")).as("id_a"),
            greatest(col("ma"), col("mb")).as("id_b"), col("jaccard_milli"))
        val within = member.as("x").join(member.as("y"),
            col("x.k") === col("y.k") && col("x.id") < col("y.id"))
          .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
            lit(1000L).as("jaccard_milli"))
        val pairs =
          if (minMilli <= 1000) cross.unionByName(within) else cross
        // materialize so the caches can be dropped before returning;
        // localCheckpoint blocks are GC-reclaimed by the
        // ContextCleaner, unlike CacheManager entries
        pairs.localCheckpoint(eager = true)
      } finally { member.unpersist(); reps.unpersist() }
    } finally t.unpersist()
  }

  /** Stage 1 of the MinHash pipeline: (id, hs) hashed-shingle sets.
   *  Exposed so a correctness harness can materialize the exact sets
   *  the candidate/verify stages consume (two-stage oracle). */
  def minhashShingleFrame(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int): DataFrame =
    df.select(col(idCol).as("id"),
        hashedShingles(TextOps.normTokens(col(textCol)),
          shingleN).as("hs"))
      .where(size(col("hs")) > 0)

  /** (id, band, bucket) LSH band frame of a prepared (id, hs) shingle
   *  frame — the persistable half of an incremental dedup index. A
   *  doc's bands depend only on its own signature, so band frames
   *  computed batch-by-batch compose exactly: candidates over a corpus
   *  == within-batch candidates ∪ cross-batch candidates. */
  def minhashBandFrame(t: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val sigs = t.withColumn("sig", minhashSignature(col("hs"), numHashes))
    // band buckets: only ids travel through the LSH join, never arrays
    sigs.select(col("id"),
      posexplode(array((0 until bands).map(b =>
        hash(slice(col("sig"), b * rows + 1, rows), lit(b))): _*))
        .as(Seq("band", "bucket")))
  }

  /** Stage 2: LSH band-bucket candidate pairs (id_a < id_b, distinct)
   *  over a prepared (id, hs) frame. Only ids travel through the join. */
  def minhashCandidates(t: DataFrame, numHashes: Int, bands: Int): DataFrame =
    minhashCandidatesFromBands(minhashBandFrame(t, numHashes, bands))

  /** Hot-bucket cap (VERDICT r10 #4): drop (band, bucket) groups with
   *  more than `maxBucket` members before a band self-join. The
   *  exact-dup collapse removes byte-identical clusters, but
   *  NEAR-identical boilerplate (crawl headers, templated pages) can
   *  still put 10^5 distinct docs into one band bucket, making one
   *  reducer emit the bucket's m^2/2 pairs. The cap bounds per-bucket
   *  pair emission at maxBucket^2/2 — the standard LSH recall trade:
   *  a pair colliding ONLY in capped buckets is lost, but with b
   *  independent bands a genuinely near pair almost surely collides in
   *  an uncapped one too. Dropped buckets are counted into the
   *  `graft.lsh_buckets_capped` / `graft.lsh_rows_capped` metrics so
   *  the trade is observable, never silent. 0 = uncapped. */
  private def capBuckets(banded: DataFrame, maxBucket: Int,
      keys: Seq[String] = Seq("band", "bucket")): DataFrame =
    if (maxBucket <= 0) banded
    else {
      // localCheckpoint, not persist: the hot set is read by the
      // accounting agg AND the later (lazy) anti-join, and checkpoint
      // blocks are GC-reclaimed by the ContextCleaner — a CacheManager
      // entry per call would pile up in long-lived dedup sessions
      val hot = oversizedBuckets(banded, maxBucket, keys)
        .localCheckpoint(eager = true)
      val agg = hot.agg(count(lit(1)), coalesce(sum(col("n")), lit(0L))).head()
      Metrics.counter("graft.lsh_buckets_capped", "dedup", agg.getLong(0))
      Metrics.counter("graft.lsh_rows_capped", "dedup", agg.getLong(1))
      // hot set is tiny (only oversized buckets) -> broadcast anti-join
      banded.join(broadcast(hot.select(keys.map(col): _*)), keys, "left_anti")
    }

  /** The (keys..., n) groups larger than `maxBucket` — the accounting
   *  half of [[capBuckets]], exposed so pipelines can audit exactly
   *  which buckets the cap dropped. */
  def oversizedBuckets(banded: DataFrame, maxBucket: Int,
      keys: Seq[String] = Seq("band", "bucket")): DataFrame =
    banded.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .where(col("n") > maxBucket)

  /** Same self-join over an ALREADY-banded (id, band, bucket) frame —
   *  use when the band frame is persisted or shared between joins, so
   *  signatures are computed exactly once. `maxBucket` > 0 bounds
   *  per-bucket pair emission (see [[capBuckets]]). */
  def minhashCandidatesFromBands(banded: DataFrame,
      maxBucket: Int = 0): DataFrame = {
    val capped = capBuckets(banded, maxBucket)
    capped.as("a")
      .join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct() // a pair may collide in several bands
  }

  /** Salted RE-SPLIT alternative to the drop cap: each oversized
   *  (band, bucket) group splits into k = ceil(n/maxBucket) sub-buckets
   *  by the engine-portable multiplicative hash of the id; pairs emit
   *  WITHIN sub-buckets, and one STAR of representative links per split
   *  bucket (each sub-bucket's min id to the bucket's global min id)
   *  preserves connectivity across the split. Pair emission per
   *  oversized bucket is O(n·maxBucket + k) instead of C(n,2), and
   *  every candidate — star links included — still passes exact-Jaccard
   *  verification, so false links die there while true boilerplate
   *  clusters stay CONNECTED: strictly better recall than dropping at
   *  the same asymptotic cost. Deterministic end-to-end (portable hash,
   *  integer k), so an external engine recomputes the identical set. */
  def minhashCandidatesSalted(banded: DataFrame,
      maxBucket: Int): DataFrame = {
    require(maxBucket > 0, "salted re-split needs a positive bound")
    val hot = oversizedBuckets(banded, maxBucket)
      .localCheckpoint(true) // see capBuckets: reclaimable, no cache pile-up
    val agg = hot.agg(count(lit(1)), coalesce(sum(col("n")), lit(0L))).head()
    Metrics.counter("graft.lsh_buckets_salted", "dedup", agg.getLong(0))
    Metrics.counter("graft.lsh_rows_salted", "dedup", agg.getLong(1))
    val withK = banded.join(
      broadcast(hot.withColumn("k",
          expr(s"(n + ${maxBucket - 1}) div $maxBucket"))
        .select(col("band"), col("bucket"), col("k"))),
      Seq("band", "bucket"), "left")
    val salted = withK.withColumn("salt",
      when(col("k").isNull, lit(0L)).otherwise(
        pmod(pmod(col("id") * lit(Sketches.WeylA), lit(Sketches.HashMod)),
          col("k"))))
      .select(col("id"), col("band"), col("bucket"), col("salt"), col("k"))
    val within = salted.as("a").join(salted.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.salt") === col("b.salt") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val reps = salted.where(col("k").isNotNull)
      .groupBy(col("band"), col("bucket"), col("salt"))
      .agg(min(col("id")).as("rid"))
    val hubs = reps.groupBy(col("band"), col("bucket"))
      .agg(min(col("rid")).as("hub"))
    val links = reps.join(hubs, Seq("band", "bucket"))
      .where(col("rid") =!= col("hub"))
      .select(col("hub").as("id_a"), col("rid").as("id_b"))
    within.unionByName(links).distinct()
  }

  /** Incremental candidates: NEW-batch docs colliding with docs of a
   *  PERSISTED band index (id_a = new, id_b = indexed; ids must be
   *  disjoint). The index is never recomputed — the daily-crawl shape:
   *  band the increment, join it against the stored bands, append the
   *  increment's bands to the index afterwards. `maxBucket` > 0 caps
   *  on the COMBINED (new + indexed) bucket size, since pair emission
   *  is the product of the two sides. */
  def minhashCandidatesAgainst(newBanded: DataFrame,
      indexBanded: DataFrame, maxBucket: Int = 0): DataFrame = {
    val (a0, b0) =
      if (maxBucket <= 0) (newBanded, indexBanded)
      else {
        val hot = oversizedBuckets(
            newBanded.select(col("band"), col("bucket"))
              .unionAll(indexBanded.select(col("band"), col("bucket"))),
            maxBucket)
          .localCheckpoint(true) // see capBuckets: reclaimable, no cache pile-up
        val agg = hot.agg(count(lit(1)), coalesce(sum(col("n")), lit(0L))).head()
        Metrics.counter("graft.lsh_buckets_capped", "dedup", agg.getLong(0))
        Metrics.counter("graft.lsh_rows_capped", "dedup", agg.getLong(1))
        val key = broadcast(hot.select(col("band"), col("bucket")))
        (newBanded.join(key, Seq("band", "bucket"), "left_anti"),
          indexBanded.join(key, Seq("band", "bucket"), "left_anti"))
      }
    a0.as("a")
      .join(b0.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Stage 3: exact-Jaccard verification of candidate (id_a, id_b)
   *  pairs against the (id, hs) shingle frame. Sets sort ONCE PER DOC
   *  side (the q_sql_kernel lesson) so the per-PAIR cost is one
   *  allocation-free codegen'd merge (`JaccardMilliLong`) instead of
   *  the hash set `array_intersect` builds per pair — identical
   *  arithmetic, so results and oracles are unchanged. */
  def verifyJaccardMilli(t: DataFrame, candidates: DataFrame,
      minMilli: Int): DataFrame = {
    val ts = t.select(col("id"), sort_array(col("hs")).as("hs"))
    candidates
      .join(ts.select(col("id").as("id_a"), col("hs").as("hs_a")), "id_a")
      .join(ts.select(col("id").as("id_b"), col("hs").as("hs_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        org.apache.spark.sql.graft.JaccardMilliLong
          .asColumn(col("hs_a"), col("hs_b")).as("jaccard_milli"))
      .where(col("jaccard_milli") >= minMilli)
  }

  /**
   * SimHash near-dup: docs whose 64-bit simhash fingerprints are within
   * `maxHamming` bits.
   *
   * Candidate generation has FULL recall by pigeonhole blocking: the
   * fingerprint splits into `maxHamming + 1` disjoint bit chunks, so
   * any pair differing in <= maxHamming bits agrees EXACTLY on at
   * least one chunk and collides in that chunk's block — no near pair
   * can be missed, unlike prefix-only blocking (pairs differing in a
   * top bit never met). Each chunk join touches only ids+chunk values;
   * exact Hamming verification runs on candidates only.
   */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, numBlocks: Int = 0, maxBlock: Int = 0): DataFrame =
    simhashPairsFrom(
      df.select(col(idCol).as("id"), TextOps.simhash64(col(textCol)).as("sim")),
      maxHamming, numBlocks, maxBlock)

  /** Pair generation over a prepared (id, sim) frame — split out so the
   *  recall guarantee is testable on crafted fingerprints.
   *
   *  The banded join runs over DISTINCT fingerprints, not docs: an
   *  exact-dup cluster of m docs shares one fingerprint, and joining at
   *  doc granularity would re-verify the same chunk collision m^2 times
   *  (a dup-heavy 100 TB corpus is exactly where that explodes — the
   *  sf1 bench measured 167 s, quadratic in cluster size). Fingerprint
   *  pairs are expanded back to doc pairs by two output-bound
   *  equi-joins; same-fingerprint clusters contribute their pairs via a
   *  plain self-join at hamming 0. Output is identical to the
   *  doc-granularity join (every id_a < id_b pair within the ball,
   *  exactly once). */
  private[graft] def simhashPairsFrom(t: DataFrame, maxHamming: Int,
      numBlocks: Int = 0, maxBlock: Int = 0): DataFrame = {
    val r = if (numBlocks > 0) numBlocks else maxHamming + 1
    require(r > maxHamming, "need > maxHamming blocks for full recall")
    val w = (64 + r - 1) / r // chunk width; last chunk may be narrower
    val fps = t.select(col("sim")).distinct()
    val banded0 = fps.select(col("sim"),
      posexplode(array((0 until r).map { i =>
        val lo = i * w
        val width = math.min(w, 64 - lo)
        // bits [lo, lo+width) of the fingerprint
        shiftrightunsigned(shiftleft(col("sim"), 64 - lo - width), 64 - width)
      }: _*)).as(Seq("blk_i", "blk_v")))
    // maxBlock > 0: hot chunk-blocks (boilerplate with a common bit
    // pattern) are dropped with accounting — NOTE this trades away the
    // pigeonhole FULL-recall guarantee for bounded pair emission, the
    // same cap trade as minhash (capBuckets doc)
    val banded = capBuckets(banded0, maxBlock, Seq("blk_i", "blk_v"))
    val fpPairs = banded.as("a").join(banded.as("b"),
        col("a.blk_i") === col("b.blk_i") && col("a.blk_v") === col("b.blk_v") &&
          col("a.sim") < col("b.sim"))
      .select(col("a.sim").as("sim_a"), col("b.sim").as("sim_b"),
        // long: engine-portable (DuckDB bit_count is narrow-int)
        TextOps.hamming64(col("a.sim"), col("b.sim")).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct() // a pair may collide in several chunks
    // cross-cluster doc pairs: one fp pair -> |class_a| x |class_b| rows
    val cross = fpPairs
      .join(t.select(col("sim").as("sim_a"), col("id").as("ia")), "sim_a")
      .join(t.select(col("sim").as("sim_b"), col("id").as("ib")), "sim_b")
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("hamming"))
    // within-cluster pairs (identical fingerprints = hamming 0)
    val same = t.as("x").join(t.as("y"),
        col("x.sim") === col("y.sim") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        lit(0L).as("hamming"))
    cross.unionByName(same)
  }

  /** Embedding cosine near-dup pairs >= `minCosineMilli` (brute force
   *  within a blocking column; see Similarity.lshBuckets for the scale
   *  path producing the blocks). */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
      blockCol: Column, minCosineMilli: Int): DataFrame = {
    // cosine(a,b) = dot/(|a||b|) computed directly (not on pre-normalized
    // vectors) so an oracle using the same formula agrees bit-for-bit.
    // Norms are per-ROW quantities, so they are projected here once —
    // inlining Similarity.cosine into the pair select would re-fold
    // each vector's norm once per PAIR it appears in (~block-size x).
    val t = df.select(blockCol.as("blk"), col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    val a = t.select(col("blk"), col("id").as("id_a"), col("v").as("v_a"),
      col("nrm").as("n_a"))
    val b = t.select(col("blk"), col("id").as("id_b"), col("v").as("v_b"),
      col("nrm").as("n_b"))
    a.join(b, Seq("blk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Similarity.dot(col("v_a"), col("v_b"))
            / (col("n_a") * col("n_b")) * 1000).cast("long")
          .as("cosine_milli"))
      .where(col("cosine_milli") >= minCosineMilli)
  }

  /** Keep the first row per key by an ordering column (CDC-style
   *  "latest wins" dedup used widely in pipelines). */
  /**
   * SemDeDup-style semantic dedup marks ("SemDeDup: Data-efficient
   * learning at web-scale through semantic deduplication", Abbas et
   * al. 2023): given a (id, cell) clustering of the embedding space
   * (k-means cells — [[Similarity.ivfTrain]]/[[Similarity.ivfAssign]]
   * are exactly that), a row is a semantic duplicate when a LOWER-id
   * row in the SAME cell has cosine >= threshold; the kept
   * representative per dup chain is the lowest id. The cluster is what
   * bounds the pairwise stage — cells are O(corpus/nCells), so the
   * within-cell self-join never goes corpus-quadratic, which is the
   * paper's core scaling argument and the same shape as
   * [[embeddingPairs]]' block bound.
   *
   * Output: (id, cell, dup_of = lowest qualifying lower id or -1,
   * kept 0/1). Deterministic given the assignment, so the oracle
   * recomputes it exactly from the staged (id, cell) frame.
   */
  def semanticDupMarks(assigned: DataFrame, df: DataFrame, idCol: String,
      vecCol: String, minCosineMilli: Int): DataFrame = {
    val vecs = df.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    val t = assigned.select(col(idCol).as("id"), col("cell"))
      .join(vecs, Seq("id"))
    val a = t.select(col("cell"), col("id").as("id_a"), col("v").as("v_a"),
      col("nrm").as("n_a"))
    val b = t.select(col("cell"), col("id").as("id_b"), col("v").as("v_b"),
      col("nrm").as("n_b"))
    val dup = a.join(b, Seq("cell"))
      .where(col("id_b") < col("id_a"))
      .select(col("id_a").as("id"), col("id_b"),
        round(Similarity.dot(col("v_a"), col("v_b"))
            / (col("n_a") * col("n_b")) * 1000).cast("long")
          .as("cos_milli"))
      .where(col("cos_milli") >= minCosineMilli)
      .groupBy(col("id")).agg(min("id_b").as("dup_of"))
    t.select(col("id"), col("cell"))
      .join(dup, Seq("id"), "left")
      .select(col("id"), col("cell"),
        coalesce(col("dup_of"), lit(-1L)).as("dup_of"),
        col("dup_of").isNull.cast("long").as("kept"))
  }

  /**
   * Positioned k-gram fingerprint frame for substring-level dedup
   * ("Deduplicating Training Data Makes Language Models Better", Lee
   * et al. 2021, approximated at the token-k-gram granularity): one
   * row per window position, `fp` = md5 of the space-joined k-gram.
   * md5 keeps the downstream shuffle at 32 bytes/row regardless of
   * gram width, and the oracle recomputes over the same fingerprints.
   */
  def substringGramFrame(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        posexplode(TextOps.tokenNgrams(col(textCol), k)))
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        md5(col("col")).as("fp"))

  /**
   * Duplicated-substring spans from a positioned gram frame: a window
   * position is duplicated when its fingerprint occurs at more than
   * one (doc, pos) site corpus-wide; duplicated positions cover token
   * interval [pos, pos+k-1]; overlapping/adjacent intervals merge
   * per doc (gaps-and-islands). Output per doc: total duplicated
   * tokens + merged span count.
   *
   * Two shuffles, both inherent: one on `fp` to find repeats (32-byte
   * keys, map-side-combinable), one on `doc_id` for the island window.
   * Never materializes pairs — cost is O(corpus), not O(dup²), which
   * is what makes substring dedup feasible at 100 TB where a
   * boilerplate k-gram can occur millions of times.
   */
  def substringDupSpans(grams: DataFrame, k: Int): DataFrame = {
    val dup = grams
      .withColumn("occ", count(lit(1)).over(Window.partitionBy("fp")))
      .where(col("occ") > 1)
    val w = Window.partitionBy("doc_id").orderBy("pos")
    dup
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(w) > k, 1).otherwise(0))
      .withColumn("island", sum("brk").over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg((max("pos") - min("pos") + lit(k)).cast("long").as("span_len"))
      .groupBy("doc_id")
      .agg(sum("span_len").as("dup_tokens"), count(lit(1)).as("n_spans"))
  }

  def latestPerKey(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol).desc)
    df.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
  }

  /**
   * Connected components over a near-dup pair graph — the step between
   * pair generation (MinHash/SimHash/embedding) and "keep one
   * representative per duplicate CLUSTER": transitivity means A~B and
   * B~C must collapse to one cluster even though (A,C) was never a
   * candidate pair.
   *
   * Algorithm: alternating large-star / small-star (Kiveris et al.,
   * "Connected Components in MapReduce and Beyond", SoCC 2014) — the
   * 100-TB-scale choice: converges in O(log^2 n) rounds (O(log n) in
   * practice), and each round is ONE groupBy-min plus ONE equi-join,
   * both shuffling on node id. No per-node neighbor lists are ever
   * materialized (no `collect_list`), so a million-member duplicate
   * cluster — the boilerplate-page shape — costs O(edges) per round,
   * not O(cluster^2), and a hub node's neighborhood never has to fit
   * in one task. Label-propagation by contrast needs diameter rounds;
   * star-contraction halves tree heights every round.
   *
   * Each round's output is `localCheckpoint`ed: iterative plans
   * otherwise double their lineage per round and Catalyst re-analysis
   * goes quadratic. Convergence is detected by an aggregate signature
   * (count + xor/sum of edge hashes) — one tiny agg per round, not an
   * except() anti-join over the full edge set.
   *
   * Input: one row per undirected edge (`aCol`, `bCol`), any
   * orientation, duplicates/self-loops tolerated. Output: (`id`,
   * `comp`) for every node incident to an edge, where `comp` is the
   * smallest node id in the component (the canonical representative).
   * Nodes with no edges are absent — callers coalesce(comp, id).
   */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val spark = edges.sparkSession
    // canonical small->large, self-loops dropped, deduped
    var e = edges
      .select(least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .where(col("u") =!= col("v")).distinct()
      .localCheckpoint(true)

    // count + two independently-mixed xor folds; xor (not sum) because
    // ANSI mode faults on long overflow and the edge set is distinct
    def signature(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)),
        bit_xor(xxhash64(col("u"), col("v"))),
        bit_xor(xxhash64(col("v"), lit(0x9e3779b9L), col("u")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }

    // large-star: every node u links its LARGER neighbors to
    // m = min(N(u) ∪ {u}); small-star: every node links its smaller
    // neighbors and itself to the minimum. Both are groupBy+join on
    // node id — the min is computed by aggregation, then re-attached,
    // so the neighborhood itself never gathers anywhere.
    def largeStar(cur: DataFrame): DataFrame = {
      val sym = cur.select(col("u"), col("v"))
        .union(cur.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      sym.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .select(least(col("u"), col("v")).as("u"),
          greatest(col("u"), col("v")).as("v"))
        .where(col("u") =!= col("v")).distinct()
    }
    def smallStar(cur: DataFrame): DataFrame = {
      // edges already point large->small as (v, u) with u < v
      val mins = cur.groupBy("v").agg(min(col("u")).as("m"))
      val relink = cur.join(mins, "v")
        .select(col("u"), col("m").as("v"))
      val self = mins.select(col("v").as("u"), col("m").as("v"))
      relink.union(self)
        .select(least(col("u"), col("v")).as("u"),
          greatest(col("u"), col("v")).as("v"))
        .where(col("u") =!= col("v")).distinct()
    }

    var sig = signature(e)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 50) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      val nextSig = signature(next)
      converged = nextSig == sig
      sig = nextSig
      e = next
      rounds += 1
    }
    // fixpoint is a star forest: every edge is (member, root)
    e.select(col("v").as("id"), col("u").as("comp"))
      .union(e.select(col("u").as("id"), col("u").as("comp")).distinct())
      .distinct()
  }

  /**
   * Bloom-prefiltered incremental exact dedup — the shape "dedup
   * today's crawl against ALL history" takes at 100 TB. Joining the
   * increment against the full historical fingerprint set shuffles the
   * history every day; instead a Bloom filter of the historical
   * fingerprints (built distributively by `DataFrameStatFunctions
   * .bloomFilter`, a treeAggregate — only the filter's bit array
   * reaches the driver) is broadcast, and:
   *
   *   - increment rows the filter rejects are DEFINITELY new (a Bloom
   *     filter has no false negatives) — they skip the join entirely,
   *     and at a realistic dup rate that is almost all of the data;
   *   - the accepted sliver (true dups + ~fpp false positives) is
   *     exact-verified with an anti-join against the fingerprint
   *     column only — never the document payload.
   *
   * The result is therefore EXACT — identical to a plain anti-join of
   * increment against history on the fingerprint — which is what the
   * DuckDB oracle recomputes; the Bloom filter only prunes work. At
   * 100 TB: history fingerprints ≈ billions of 16-byte keys; a 1%-fpp
   * filter is ~1.2 GB per billion keys, broadcast once and reused by
   * every increment partition, vs re-shuffling a multi-TB fingerprint
   * table per daily batch.
   *
   * Mirrors the reference's persisted-index probe-don't-recompute
   * discipline (persisted_bucket_hash_map.rs:276 `search_values`): the
   * history is summarized once, and membership probes are local.
   *
   * `expectedItems` sizes the filter; size it from manifest row counts
   * in deployment (over-sizing costs only bits).
   */
  def bloomNewDocs(history: DataFrame, increment: DataFrame,
                   fpCol: String,
                   expectedItems: Long, fpp: Double): DataFrame = {
    val spark = history.sparkSession
    val bloom = history.stat.bloomFilter(fpCol, expectedItems, fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    val mightBeDup = udf((s: String) => s != null && bc.value.mightContainString(s))
    val definitelyNew = increment.where(!mightBeDup(col(fpCol)))
    val verifiedNew = increment.where(mightBeDup(col(fpCol)))
      .join(history.select(col(fpCol)).distinct(), Seq(fpCol), "left_anti")
    definitelyNew.unionByName(verifiedNew.select(definitelyNew.columns.map(col).toSeq: _*))
  }
}
