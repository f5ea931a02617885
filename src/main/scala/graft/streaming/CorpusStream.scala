package graft.streaming

import graft.operators.TextOps
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
