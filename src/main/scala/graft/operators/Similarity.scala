package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{NearestCells, PqAdcScore, PqEncodeCodes}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/**
 * Similarity search over embedding columns (`Array[Float]`), pure
 * DataFrame plans:
 *
 *  - brute-force cosine top-k (the correctness baseline): broadcast the
 *    query set, one scan of the corpus, per-query top-k;
 *  - LSH-bucketed ANN (the scale path): deterministic random-hyperplane
 *    signs bucket the corpus; queries probe their own bucket plus
 *    Hamming-1 neighbors, so the scan touches a small fraction of the
 *    corpus. Buckets are reusable as blocking keys for near-dup.
 *
 * All arithmetic is double-precision, strictly left-to-right folds —
 * chosen so an ANSI SQL oracle (list_cosine_similarity on DOUBLE[])
 * reproduces results bit-for-bit.
 *
 * The folds run in tight JVM loops (UDFs over `array<double>`), NOT
 * `aggregate`/`zip_with`/`transform` lambdas: Spark evaluates
 * higher-order-function lambdas INTERPRETED, one expression-tree walk
 * per element per row — profiled at 100-800 µs/vector on dim-64
 * embeddings, which made every ANN stage lambda-bound. The UDF computes
 * the identical IEEE operation sequence ~50x faster; array<float>
 * inputs take the codegen'd Cast to array<double> (not a per-element
 * interpreted lambda).
 */
object Similarity {

  /** float/any-numeric array -> array<double> via the codegen'd Cast */
  private def asDouble(a: Column): Column = a.cast("array<double>")

  /** elementwise dot product — native codegen'd Catalyst expression
   *  (graft.functions.DotProduct): reads ArrayData in place, zero
   *  per-row allocation, exact left-to-right IEEE order. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Group-wise mean pooling of embeddings — the chunk→document (or
   * frame→clip) aggregation step: chunk embeddings of one group
   * combine into a single vector. Pooling runs in INTEGER millis
   * (each component rounds to round(x*1000) before summing), so the
   * result is bit-identical under any aggregation order — float
   * mean-pooling is not reproducible across partitionings, and
   * reproducible data builds matter more than the 1e-3 quantization.
   * Callers divide `pooled_milli` by `n_vecs` (and L2-normalize) when
   * a unit vector is needed downstream; keeping the raw sums makes
   * pools MERGEABLE across shards.
   *
   * Scale shape: posexplode → ONE exchange on (group, dim) with
   * map-side partial sums (P×dims longs per partition), then a
   * per-group sort of `dims` entries — never a per-group row
   * materialization. 100 TB of chunk embeddings pool at shuffle speed.
   */
  def meanPoolMilli(df: DataFrame, groupCol: String,
      vecCol: String): DataFrame =
    df.select(col(groupCol).cast("long").as("g"),
        posexplode(asDouble(col(vecCol))).as(Seq("pos", "v")))
      .withColumn("mv", round(col("v") * 1000).cast("long"))
      .groupBy(col("g"), col("pos"))
      .agg(sum(col("mv")).as("sv"), count(lit(1)).as("n"))
      .groupBy(col("g"))
      .agg(max(col("n")).as("n_vecs"),
        transform(array_sort(collect_list(struct(col("pos"), col("sv")))),
          x => x("sv")).as("pooled_milli"))

  /**
   * Brute-force cosine top-k: for each query vector, the k nearest
   * corpus vectors. Queries are broadcast (small side); the corpus is
   * scanned once; ranking shuffles only (query_id, candidate) pairs
   * that survive no pre-filter — exact baseline.
   * Output: (query_id, neighbor_id, rank, cosine_micro).
   */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, k: Int): DataFrame = {
    // cast + norm are per-ROW quantities, projected once per side —
    // folding them inside the pair select would redo both per PAIR
    val c = corpus.select(col(idCol).as("neighbor_id"),
        asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val q = queries.select(col(qIdCol).as("query_id"),
        asDouble(col(qVecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val scored = c.join(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        // integer micro-units so ordering & output are engine-exact
        round(dot(col("cv"), col("qv")) / (col("cn") * col("qn")) * 1e6)
          .cast("long").as("cosine_micro"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_micro").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"), col("cosine_micro"))
  }

  /** `nbits`-bit LSH bucket id of a vector for hash table `table`:
   *  sign bits of dot products with deterministic hyperplanes — a
   *  native Catalyst expression over a per-executor memoized plane
   *  matrix (`org.apache.spark.sql.graft.LshBucket`): reads ArrayData
   *  in place, zero per-row conversion/boxing, null array or null
   *  element → null. Bucket ids are bit-identical to the interpreted
   *  Column-expression fold and the UDF this replaced. */
  def lshBucket(vec: Column, nbits: Int, table: Int = 0): Column =
    graft.functions.VectorExpressions.lshBucket(asDouble(vec), nbits, table)

  /**
   * Multi-table LSH approximate top-k (the standard recall lever:
   * `tables` independent hyperplane bucketings; a candidate only needs
   * to collide in ONE of them). Corpus is bucketed once per table
   * (reusable — persist it); each query probes its own bucket plus all
   * Hamming-1 neighbors per table. With nbits=8, tables=4 this touches
   * a few percent of a uniform corpus instead of 100% — the 100 TB
   * path. Same output schema as bruteForceTopK.
   */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, nbits: Int = 8, tables: Int = 4): DataFrame =
    topKFromCandidates(
      lshCandidatePairs(corpus, idCol, vecCol, queries, qIdCol, qVecCol,
        nbits, tables),
      corpus, idCol, vecCol, queries, qIdCol, qVecCol, k)

  /** LSH candidate stage: distinct (query_id, neighbor_id) pairs that
   *  collide in at least one table's probe set (own bucket + Hamming-1
   *  neighbors). Only ids and bucket longs travel through the join —
   *  never vectors — so the shuffle is narrow at any corpus size.
   *  Exposed separately so a correctness harness can materialize the
   *  exact candidate set the ranking stage consumes (two-stage oracle). */
  def lshCandidatePairs(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      nbits: Int = 8, tables: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id") +:
        (0 until tables).map(t =>
          lshBucket(col(vecCol), nbits, t).as(s"b$t")): _*)
      .select(col("neighbor_id"),
        posexplode(array((0 until tables).map(t => col(s"b$t")): _*))
          .as(Seq("tbl", "bucket")))
    val q = queries.select(col(qIdCol).as("query_id") +:
        (0 until tables).map(t =>
          lshBucket(col(qVecCol), nbits, t).as(s"b$t")): _*)
      .select(col("query_id"),
        posexplode(array((0 until tables).map(t => col(s"b$t")): _*))
          .as(Seq("tbl", "qb")))
      // probe set per table: own bucket + flip each bit once
      .withColumn("bucket", explode(array(
        (col("qb") +: (0 until nbits).map(b =>
          col("qb").bitwiseXOR(lit(1L << b)))): _*)))
      .select(col("query_id"), col("tbl"), col("bucket"))
    c.join(broadcast(q), Seq("tbl", "bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct() // a pair may collide in several tables/probes
  }

  /**
   * Rank a candidate (query_id, neighbor_id) frame by EXACT cosine and
   * keep the top `k` per query. Vectors are fetched by id (one corpus
   * join, one broadcast query join) — candidates are bounded by
   * #queries x probe width, far smaller than the corpus, so the
   * candidate side broadcasts and the corpus is never shuffled.
   * Output: (query_id, neighbor_id, rank, cosine_micro) — identical
   * arithmetic to bruteForceTopK, so a SQL oracle scoring the same
   * staged candidate set reproduces this bit-for-bit.
   */
  def topKFromCandidates(candidates: DataFrame,
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int): DataFrame = {
    // cast + norm are per-ROW quantities, projected once per side —
    // folding them inside the pair select would redo both per PAIR
    val c = corpus.select(col(idCol).as("neighbor_id"),
        asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val q = queries.select(col(qIdCol).as("query_id"),
        asDouble(col(qVecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val scored = c.join(broadcast(candidates), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("cv"), col("qv")) / (col("cn") * col("qn")) * 1e6)
          .cast("long").as("cosine_micro"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_micro").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"), col("cosine_micro"))
  }

  /** Top-`n` cell ids (by dot product with the broadcast centroids —
   *  spherical k-means assignment on unit vectors). RETAINED AS THE
   *  SPEC ORACLE for the codegen'd `NearestCells` expression that
   *  replaced it on the assignment/probe paths (OperatorsSpec asserts
   *  bit-identical output). */
  private[graft] def nearestCellsUdf(
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
      n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((u: Seq[Double]) => {
      // primitive array FIRST: the Seq the converter hands over has
      // far-from-O(1) element access — indexing it inside the dot loop
      // measured 22x slower than one toArray + primitive indexing
      val a = u.toArray
      val cents = bc.value
      val scores = Array.tabulate(cents.length) { ci =>
        val ct = cents(ci)
        val m = math.min(ct.length, a.length)
        var s = 0.0; var i = 0
        while (i < m) { s += ct(i) * a(i); i += 1 }
        s
      }
      scores.zipWithIndex.sortBy { case (s, i) => (-s, i) }.take(n).map(_._2).toSeq
    })

  /**
   * IVF-Flat ANN: spherical k-means cells + nprobe search — the second
   * scale path beside LSH. Training is fully distributed: centroids
   * seed deterministically (the `nCells` corpus vectors with smallest
   * xxhash64(id)) and refine with `iters` Lloyd rounds, each one
   * assignment pass (broadcast-centroid argmax) + one per-dimension
   * mean (posexplode + groupBy); only the nCells x dim centroid matrix
   * ever reaches the driver. Search probes the `nProbe` nearest cells
   * per query, so the corpus scan touches ~nProbe/nCells of the data;
   * candidates are ranked by EXACT cosine. Same output schema as
   * bruteForceTopK.
   */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, k: Int,
      nCells: Int = 64, nProbe: Int = 8, iters: Int = 2): DataFrame =
    topKFromCandidates(
      ivfCandidatePairs(corpus, idCol, vecCol, queries, qIdCol, qVecCol,
        nCells, nProbe, iters),
      corpus, idCol, vecCol, queries, qIdCol, qVecCol, k)

  /** IVF candidate stage: distinct (query_id, neighbor_id) pairs whose
   *  corpus vector lives in one of the query's `nProbe` nearest cells.
   *  Centroid training (distributed Lloyd rounds) happens here; only
   *  ids and a cell int travel through the probe join. Exposed
   *  separately so a correctness harness can materialize the exact
   *  candidate set the ranking stage consumes (two-stage oracle). */
  def ivfCandidatePairs(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      nCells: Int = 64, nProbe: Int = 8, iters: Int = 2): DataFrame = {
    val cents = trainCentroids(corpus, idCol, vecCol, nCells, iters)
    probeCandidates(
      assignCells(corpus, idCol, vecCol, cents), cents,
      queries, qIdCol, qVecCol, nProbe)
  }

  /** Distributed spherical k-means over the corpus; only bounded
   *  nCells x (dim+1) accumulator matrices ever reach the driver
   *  (at most ceil(numPartitions/64) per Lloyd round), combined in
   *  partition-index order so training is deterministic. */
  private def trainCentroids(corpus: DataFrame, idCol: String,
      vecCol: String, nCells: Int, iters: Int): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    // cell assignment is argmax over dot(v, centroid) with UNIT
    // centroids — scale-invariant in v, so corpus/query vectors are
    // never normalized (normalizing them per reference would inline a
    // nested HOF into every consumer and blow up plan evaluation)
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
    def normalized(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n > 0) v.map(_ / n) else v
    }
    var cents: Array[Array[Double]] = c
      .withColumn("h", xxhash64(col("neighbor_id"))).orderBy("h")
      .limit(nCells).select("cv").collect()
      .map(r => normalized(r.getAs[scala.collection.Seq[Double]](0).toArray))
    val dim = cents.headOption.map(_.length).getOrElse(0)
    // Each Lloyd round is ONE narrow pass: per-partition JVM
    // accumulators (cell sums + counts) — the MLlib-KMeans shape. No
    // shuffle of data rows, no wide codegen'd aggregate (a dim+1-column
    // groupBy spent seconds in codegen alone). Accumulators are combined
    // in PARTITION-INDEX ORDER (fixed fan-in groups of 64, then a sorted
    // driver fold) rather than treeAggregate, whose combine order
    // follows task completion — FP addition is not associative, so a
    // scheduling-dependent order would make training nondeterministic
    // across runs of the same corpus. The driver receives at most
    // ceil(P/64) nCells x (dim+1) matrices per round.
    def merge(a: (Array[Double], Array[Long]), b: (Array[Double], Array[Long]))
        : (Array[Double], Array[Long]) = {
      var i = 0; while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      var j = 0; while (j < a._2.length) { a._2(j) += b._2(j); j += 1 }
      a
    }
    (0 until iters).foreach { _ =>
      val bc = spark.sparkContext.broadcast(cents)
      val nc = cents.length
      val perPart = c.select(col("cv")).rdd.mapPartitionsWithIndex { (pi, it) =>
        val s = Array.ofDim[Double](nc * dim)
        val n = Array.ofDim[Long](nc)
        it.foreach { row =>
          // primitive array first — indexed access on the converter's
          // Seq inside the dot loop is pathologically slow (see
          // nearestCellsUdf)
          val v = row.getAs[scala.collection.Seq[Double]](0).toArray
          val ct = bc.value
          var best = 0; var bestS = Double.NegativeInfinity
          var ci = 0
          while (ci < ct.length) {
            val cv = ct(ci); var d = 0.0; var i = 0
            val m = math.min(cv.length, v.length)
            while (i < m) { d += cv(i) * v(i); i += 1 }
            if (d > bestS) { bestS = d; best = ci }
            ci += 1
          }
          val off = best * dim
          var i = 0
          val m = math.min(dim, v.length)
          while (i < m) { s(off + i) += v(i); i += 1 }
          n(best) += 1
        }
        Iterator((pi, (s, n)))
      }
      val grouped = perPart
        .map { case (pi, acc) => (pi / 64, (pi, acc)) }
        .groupByKey()
        .map { case (g, accs) =>
          (g, accs.toSeq.sortBy(_._1).map(_._2).reduceLeft(merge))
        }
        .collect().sortBy(_._1).map(_._2)
      val (sums, counts) =
        if (grouped.isEmpty) (Array.ofDim[Double](nc * dim), Array.ofDim[Long](nc))
        else grouped.reduceLeft(merge)
      val next = cents.map(_.clone())
      var ci = 0
      while (ci < nc) {
        if (counts(ci) > 0) {
          val mean = Array.tabulate(dim)(i => sums(ci * dim + i) / counts(ci))
          val nm = math.sqrt(mean.map(x => x * x).sum)
          if (nm > 0) next(ci) = mean.map(_ / nm) // empty cells keep seeds
        }
        ci += 1
      }
      cents = next
    }
    cents
  }

  /** (id, cell) assignment of every corpus row to its nearest trained
   *  cell — the persistable half of the index (parquet it, bucket it
   *  by cell, reuse it across every query batch). */
  private def assignCells(corpus: DataFrame, idCol: String,
      vecCol: String, cents: Array[Array[Double]]): DataFrame =
    // codegen'd NearestCells expression: the centroid matrix rides the
    // stage's (broadcast) task binary, the corpus scan stays inside
    // whole-stage codegen — the UDF it replaced paid a catalyst→Seq
    // conversion per corpus vector on the one pass that touches
    // EVERYTHING at 100 TB
    corpus.select(col(idCol).as("neighbor_id"),
        asDouble(col(vecCol)).as("cv"))
      .select(col("neighbor_id"),
        element_at(NearestCells.asColumn(col("cv"), cents, 1), 1).as("cell"))

  private def probeCandidates(assigned: DataFrame,
      cents: Array[Array[Double]], queries: DataFrame,
      qIdCol: String, qVecCol: String, nProbe: Int): DataFrame = {
    // the (query_id, cell) probe set is driver-bounded (nQueries x
    // nProbe — the same bounded-query-batch assumption broadcast(q)
    // makes everywhere in this file), so collect it ONCE and reuse it
    // for both halves below instead of evaluating the query-side
    // NearestCells scan twice
    val qAssigned = queries.select(col(qIdCol).as("query_id"),
        asDouble(col(qVecCol)).as("qv"))
      .select(col("query_id"),
        explode(NearestCells.asColumn(col("qv"), cents, nProbe)).as("cell"))
    val qRows = qAssigned.collect()
    // STATIC IN-filter on the assignment scan: Catalyst pushes
    // In(cell, ...) to parquet, and a cell-clustered index table
    // prunes to the probed cells' row groups — at 100 TB the probe
    // reads ~nProbe/nCells of the index instead of all of it. The
    // broadcast equi-join alone can't prune the scan (join keys are
    // not static predicates; DPP needs a partitioned source).
    val probed = qRows.map(_.getInt(1)).distinct.toSeq
    val q = assigned.sparkSession.createDataFrame(
      java.util.Arrays.asList(qRows: _*), qAssigned.schema)
    assigned.where(col("cell").isin(probed: _*))
      .join(broadcast(q), Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct() // defensive: a corpus row has exactly one cell today,
                  // but multi-assignment variants would duplicate pairs
  }

  // ---- persisted IVF index (train once / probe many) -----------------
  // At 100 TB the index is built by one batch job and served to every
  // query batch after it; re-training per query call (ivfTopK) is the
  // correctness baseline, not the deployment shape. Both halves are
  // plain DataFrames, so they parquet/bucket like any table.

  /** Train and return the centroid matrix as a storable DataFrame
   *  (cell int, centroid array<double>), deterministic for a given
   *  corpus. */
  def ivfTrain(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 64, iters: Int = 2): DataFrame = {
    val cents = trainCentroids(corpus, idCol, vecCol, nCells, iters)
    val spark = corpus.sparkSession
    import spark.implicits._
    cents.toSeq.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toDF("cell", "centroid")
  }

  /** Assign corpus rows to cells of a trained index: (id, cell). */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame =
    assignCells(corpus, idCol, vecCol, collectCentroids(centroids))
      .withColumnRenamed("neighbor_id", idCol)

  /** Candidate pairs from a PERSISTED index (assignment + centroids):
   *  no training pass, the corpus is never re-scanned for the index —
   *  only the probed cells' ids travel through the join. */
  def ivfCandidatesFromIndex(assigned: DataFrame, idCol: String,
      centroids: DataFrame, queries: DataFrame, qIdCol: String,
      qVecCol: String, nProbe: Int = 8): DataFrame =
    probeCandidates(assigned.select(col(idCol).as("neighbor_id"), col("cell")),
      collectCentroids(centroids), queries, qIdCol, qVecCol, nProbe)

  /** centroids DF -> dense matrix (nCells rows — driver-small by
   *  construction, the same matrix training already collects). */
  private def collectCentroids(centroids: DataFrame): Array[Array[Double]] =
    centroids.select(col("cell"), col("centroid")).collect()
      .map(r => (r.getInt(0),
        r.getAs[scala.collection.Seq[Double]](1).toArray))
      .sortBy(_._1).map(_._2)

  // ---- product quantization (the ANN memory/bandwidth half) ----------
  // At 100 TB the raw vectors are the storage problem: dim-64 float =
  // 256 B/row, PQ codes at m=8 small ints are ~32x less, so the
  // shortlist scan runs over data that fits where the flat vectors
  // don't. Deployment shape = ADC shortlist over codes, then EXACT
  // refine of the shortlist only (shortlist >> k) — which is also what
  // makes the two-stage oracle exact: the staged shortlist is re-ranked
  // by DuckDB with the same exact-cosine arithmetic as every other ANN
  // entry. Vectors are UNIT-normalized inside train/encode/table
  // construction, so ADC's L2 order IS cosine order (||a-b||^2 = 2-2cos
  // on unit vectors) and the shortlist agrees with the cosine refine.

  /** `m` per-subspace codebooks, flattened (sub*nCodes+code) -> centroid
   *  of length subDim. */
  final case class PqCodebooks(m: Int, nCodes: Int, subDim: Int,
      books: Array[Array[Double]])

  /** Train PQ codebooks: contiguous `m`-way split of the unit vector,
   *  `nCodes` L2 centroids per subspace. ONE corpus pass per Lloyd
   *  round trains ALL subspaces at once — the accumulator is
   *  m x nCodes x (subDim+1) doubles (9 KiB at the defaults), combined
   *  in PARTITION-INDEX order exactly like trainCentroids, so training
   *  is deterministic for a given corpus. Seeds: the `nCodes` corpus
   *  vectors with smallest xxhash64(id), sliced per subspace. */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, nCodes: Int = 16, iters: Int = 2): PqCodebooks = {
    val spark = corpus.sparkSession
    val c = corpus.select(asDouble(col(vecCol)).as("cv"),
      xxhash64(col(idCol)).as("h"))
    val seeds = c.orderBy("h").limit(nCodes).select("cv").collect()
      .map(r => unit(r.getAs[scala.collection.Seq[Double]](0).toArray))
    val dim = seeds.headOption.map(_.length).getOrElse(0)
    require(m > 0 && dim % m == 0, s"dim $dim not divisible by m=$m")
    val sd = dim / m
    var books: Array[Array[Double]] = Array.tabulate(m * nCodes) { j =>
      val s = seeds((j % nCodes) % seeds.length)
      java.util.Arrays.copyOfRange(s, (j / nCodes) * sd, (j / nCodes) * sd + sd)
    }
    def merge(a: (Array[Double], Array[Long]), b: (Array[Double], Array[Long]))
        : (Array[Double], Array[Long]) = {
      var i = 0; while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      var j = 0; while (j < a._2.length) { a._2(j) += b._2(j); j += 1 }
      a
    }
    (0 until iters).foreach { _ =>
      val bc = spark.sparkContext.broadcast(books)
      val perPart = c.select("cv").rdd.mapPartitionsWithIndex { (pi, it) =>
        val sums = Array.ofDim[Double](m * nCodes * sd)
        val cnts = Array.ofDim[Long](m * nCodes)
        it.foreach { row =>
          val v = unit(row.getAs[scala.collection.Seq[Double]](0).toArray)
          val bk = bc.value
          var sub = 0
          while (sub < m) {
            val base = sub * sd
            val lim = math.max(0, math.min(sd, v.length - base))
            var best = 0; var bestD = Double.MaxValue; var code = 0
            while (code < nCodes) {
              val ct = bk(sub * nCodes + code)
              var d = 0.0; var i = 0
              while (i < lim) { val x = v(base + i) - ct(i); d += x * x; i += 1 }
              if (d < bestD) { bestD = d; best = code } // ties keep lowest code
              code += 1
            }
            val off = (sub * nCodes + best) * sd
            var i = 0
            while (i < lim) { sums(off + i) += v(base + i); i += 1 }
            cnts(sub * nCodes + best) += 1
            sub += 1
          }
        }
        Iterator((pi, (sums, cnts)))
      }
      val grouped = perPart
        .map { case (pi, acc) => (pi / 64, (pi, acc)) }
        .groupByKey()
        .map { case (g, accs) =>
          (g, accs.toSeq.sortBy(_._1).map(_._2).reduceLeft(merge))
        }
        .collect().sortBy(_._1).map(_._2)
      if (grouped.nonEmpty) {
        val (sums, cnts) = grouped.reduceLeft(merge)
        books = Array.tabulate(m * nCodes) { j =>
          if (cnts(j) > 0)
            Array.tabulate(sd)(i => sums(j * sd + i) / cnts(j))
          else books(j) // empty codes keep their seed
        }
      }
    }
    PqCodebooks(m, nCodes, sd, books)
  }

  /** Encode every corpus vector to its m nearest-code ints:
   *  (neighbor_id, codes array<int>) — the persistable compressed half
   *  of the index; parquet it and every query batch scans codes, never
   *  raw vectors. */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      cb: PqCodebooks): DataFrame =
    // codegen'd PqEncodeCodes (see NearestCells note in assignCells):
    // this is the other whole-corpus scan of the PQ path
    corpus.select(col(idCol).as("neighbor_id"),
      PqEncodeCodes.asColumn(asDouble(col(vecCol)),
        cb.books, cb.m, cb.nCodes, cb.subDim).as("codes"))

  /** The Scala-UDF encode the expression replaced — RETAINED AS THE
   *  SPEC ORACLE (OperatorsSpec asserts bit-identical codes). */
  private[graft] def pqEncodeUdf(corpus: DataFrame, idCol: String,
      vecCol: String, cb: PqCodebooks): DataFrame = {
    val bc = corpus.sparkSession.sparkContext.broadcast(cb)
    val enc = udf((u: Seq[Double]) => {
      val v = unit(u.toArray); val b = bc.value
      Array.tabulate(b.m) { sub =>
        val base = sub * b.subDim
        val lim = math.max(0, math.min(b.subDim, v.length - base))
        var best = 0; var bestD = Double.MaxValue; var code = 0
        while (code < b.nCodes) {
          val ct = b.books(sub * b.nCodes + code)
          var d = 0.0; var i = 0
          while (i < lim) { val x = v(base + i) - ct(i); d += x * x; i += 1 }
          if (d < bestD) { bestD = d; best = code }
          code += 1
        }
        best
      }.toSeq
    })
    corpus.select(col(idCol).as("neighbor_id"),
      enc(asDouble(col(vecCol))).as("codes"))
  }

  /** ADC shortlist: per query a distance TABLE (m x nCodes partial
   *  squared distances between the query's slices and every code
   *  centroid) is built once driver-side — the query batch is bounded
   *  and small, the same assumption broadcast(q) makes everywhere in
   *  this file — and broadcast; a corpus row's approximate distance is
   *  then m array lookups summed, no per-pair vector math at all. Top
   *  `shortlist` per query by (adc asc, id asc), integer micro-units
   *  for run-stable ordering. Returns (query_id, neighbor_id) for the
   *  exact refine / two-stage oracle. */
  def pqShortlist(encoded: DataFrame, cb: PqCodebooks, queries: DataFrame,
      qIdCol: String, qVecCol: String, shortlist: Int): DataFrame = {
    val qRows = queries.select(col(qIdCol).as("query_id"),
      asDouble(col(qVecCol)).as("qv")).collect()
    val tabs: Array[Array[Double]] = qRows.map(r =>
      adcTable(cb, unit(r.getAs[scala.collection.Seq[Double]](1).toArray)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_micro").asc, col("neighbor_id").asc)
    encoded.select(col("neighbor_id"), col("codes"),
        posexplode(array(qRows.map(r => lit(r.get(0))): _*))
          .as(Seq("qi", "query_id")))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("adc_micro",
        round(PqAdcScore.asColumn(col("qi"), col("codes"), tabs, cb.nCodes)
          * 1e6).cast("long"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
  }

  /** True IVF-PQ (the FAISS IndexIVFPQ shape — the standard
   *  billion-scale deployment): ADC-score ONLY the pairs the coarse
   *  IVF quantizer admitted (`coarse` from ivfCandidatePairs or the
   *  persisted-index probe), so the scan is bounded by nProbe/nCells
   *  AND each scored row is m table lookups over compressed codes.
   *  Top `shortlist` per query for the exact refine / staged oracle. */
  def pqShortlistFromCandidates(coarse: DataFrame, encoded: DataFrame,
      cb: PqCodebooks, queries: DataFrame, qIdCol: String,
      qVecCol: String, shortlist: Int): DataFrame = {
    val spark = encoded.sparkSession
    // duplicate query_ids keep their LAST row (the behavior of the
    // string-keyed Map this replaced — and with one table per id the
    // qIdx join can never fan out a coarse row)
    val qRows = queries.select(col(qIdCol).as("query_id"),
        asDouble(col(qVecCol)).as("qv")).collect()
      .map(r => String.valueOf(r.get(0)) -> r).toMap.values.toArray
    val tabs: Array[Array[Double]] = qRows.map(r =>
      adcTable(cb, unit(r.getAs[scala.collection.Seq[Double]](1).toArray)))
    // query_id → table-ordinal map as a tiny broadcast-joined frame, so
    // the ADC expression indexes a flat double[][] (no string keying)
    val qIdx = spark.createDataFrame(
      java.util.Arrays.asList(qRows.zipWithIndex.map { case (r, i) =>
        Row(r.get(0), i) }: _*),
      StructType(Seq(
        StructField("query_id", queries.select(col(qIdCol)).schema.head.dataType),
        StructField("qi", IntegerType, nullable = false))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_micro").asc, col("neighbor_id").asc)
    encoded.join(broadcast(coarse), Seq("neighbor_id"))
      .join(broadcast(qIdx), Seq("query_id"), "left")
      .withColumn("adc_micro",
        round(PqAdcScore.asColumn(
            // fail fast like the Map lookup this replaced: a coarse
            // row whose query_id is absent from `queries` is a caller
            // bug, not a row to drop silently
            coalesce(col("qi"), raise_error(concat(
              lit("pqShortlistFromCandidates: query_id not in queries: "),
              col("query_id").cast("string"))).cast("int")),
            col("codes"), tabs, cb.nCodes)
          * 1e6).cast("long"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
  }

  /** The m x nCodes ADC table for one unit query vector: partial
   *  squared distance to every code centroid. */
  private def adcTable(cb: PqCodebooks, qv: Array[Double]): Array[Double] = {
    val t = new Array[Double](cb.m * cb.nCodes)
    var sub = 0
    while (sub < cb.m) {
      val base = sub * cb.subDim
      val lim = math.max(0, math.min(cb.subDim, qv.length - base))
      var code = 0
      while (code < cb.nCodes) {
        val ct = cb.books(sub * cb.nCodes + code)
        var d = 0.0; var i = 0
        while (i < lim) { val x = qv(base + i) - ct(i); d += x * x; i += 1 }
        t(sub * cb.nCodes + code) = d
        code += 1
      }
      sub += 1
    }
    t
  }

  /** PQ ANN end-to-end: train + encode + ADC shortlist + exact refine.
   *  Same output schema as bruteForceTopK. */
  def pqTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, k: Int,
      m: Int = 8, nCodes: Int = 16, shortlist: Int = 24,
      iters: Int = 2): DataFrame = {
    val cb = pqTrain(corpus, idCol, vecCol, m, nCodes, iters)
    topKFromCandidates(
      pqShortlist(pqEncode(corpus, idCol, vecCol, cb), cb,
        queries, qIdCol, qVecCol, shortlist),
      corpus, idCol, vecCol, queries, qIdCol, qVecCol, k)
  }

  /** In-place-safe unit normalization (zero vectors pass through). */
  private def unit(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n > 0) {
      val o = new Array[Double](v.length)
      i = 0; while (i < v.length) { o(i) = v(i) / n; i += 1 }
      o
    } else v
  }
}
