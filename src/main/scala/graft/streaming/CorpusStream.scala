package graft.streaming

import graft.operators.{Dedup, TextOps}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming corpus intake: the continuous form of the batch corpus
 * filter — every arriving document passes the stateless quality gate,
 * then a STATEFUL first-wins exact-dedup keyed on the content
 * fingerprint, so a document whose normalized text already streamed in
 * any earlier micro-batch is dropped forever after.
 *
 * This is the daily-crawl deployment shape (the streaming sibling of
 * `Dedup.minhashIncrement`): the corpus never re-tokenizes and never
 * re-joins — each batch pays only its own rows against O(1)-per-key
 * state. Reference behavior: moonlink's streamed ingestion applies
 * per-key dedup against its mem index the same incremental way
 * (`src/moonlink/src/storage/mooncake_table.rs` mem-slice probe).
 *
 * Scale: keyed state is one boolean per distinct fingerprint in the
 * state store — RocksDB-backed on a real cluster, partitioned by the
 * shuffle on `fp`, so state never concentrates: 10^10 fingerprints is
 * ~a few hundred GB spread over the fleet, and lookups are local to
 * the owning task. The within-batch winner is the min doc_id of the
 * group, so the emitted set is deterministic for a given batch
 * sequence (and equals the global min-per-fp when batches arrive in
 * doc_id order, which makes the result oracle-checkable).
 */
object CorpusStream {

  final case class GatedDoc(doc_id: Long, lang: String, quality: Long,
      fp: String)

  final case class BandRow(id: Long, band: Int, bucket: Int)
  final case class CandPair(id_a: Long, id_b: Long)

  /**
   * Streaming NEAR-dup candidate detection: each arriving document is
   * MinHash-signed and banded (stateless — a doc's bands depend only
   * on its own text), then every (band, bucket) keeps ONE long of
   * state: the smallest doc id ever seen in that bucket (its
   * representative). A document colliding with a non-empty bucket
   * emits the candidate link (representative, doc) — the edge a
   * downstream exact-verify or cluster-collapse consumes.
   *
   * This is the streaming half of the LSH pipeline the batch path
   * runs (`Dedup.minhashCandidatesAgainst`): candidate FLAGGING rides
   * the stream at O(bands) state lookups per doc; the exact Jaccard
   * verify stays an offline join, exactly how production crawl
   * pipelines split the work. State is one (band, bucket) -> long
   * entry per occupied bucket — bounded by corpus diversity, not by
   * stream length, and partitioned by the bucket shuffle.
   *
   * With id-ordered arrival the emitted set is deterministic: the
   * representative IS the bucket's global min id (smallest ids arrive
   * first), so the distinct output equals { (min(bucket), id) | id in
   * bucket, id > min } — recomputable by the oracle from the staged
   * band frame.
   */
  def minhashCandidateStream(docs: DataFrame, idCol: String,
      textCol: String, shingleN: Int, numHashes: Int,
      bands: Int): Dataset[CandPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = Dedup.minhashBandFrame(
        Dedup.minhashShingleFrame(docs, idCol, textCol, shingleN),
        numHashes, bands)
      .select(col("id"), col("band"), col("bucket")).as[BandRow]
    banded.groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, Int), it: Iterator[BandRow], state: GroupState[Long]) => {
          val ids = it.map(_.id).toArray.sorted.distinct
          val rep = if (state.exists) math.min(state.get, ids(0)) else ids(0)
          state.update(rep)
          ids.iterator.filter(_ > rep).map(CandPair(rep, _))
        })
  }

  /** quality gate + streaming first-wins dedup over `fp`. `docs` must
   *  be a STREAMING frame with (doc_id, lang, <textCol>). */
  def dedupFilterStream(docs: DataFrame, textCol: String,
      minQuality: Long): Dataset[GatedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val gated = docs.select(col("doc_id"), col("lang"),
        TextOps.qualityScore(col(textCol)).cast("long").as("quality"),
        TextOps.fingerprint(col(textCol)).as("fp"))
      .where(col("quality") >= minQuality)
      .as[GatedDoc]
    gated.groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, it: Iterator[GatedDoc], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(it.minBy(_.doc_id))
          })
  }
}
