package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One curation candidate: a quality-surviving doc keyed by its content
  * fingerprint (the output row shape of
  * `PipelineOps.curationCandidates`).
  */
final case class CuratedDoc(fp: String, doc_id: Long, quality: Double)

/** The STATEFUL suffix of the streaming curation pipeline: per-content-
  * fingerprint canonical selection carried across micro-batches.
  *
  * Batch i17 picks the canonical (min doc_id) per fingerprint with a
  * window; on an unbounded stream that choice needs keyed state instead.
  * `dropDuplicates` would keep the FIRST ARRIVAL — arrival-order-
  * dependent after a shuffle, even within one micro-batch — so the fold
  * tracks the MIN doc_id per fingerprint explicitly: the emitted
  * canonical is deterministic for any arrival order once all duplicates
  * have been seen, and equals the batch window's choice (asserted in
  * StreamingSpec). State is one (doc_id, quality) pair per distinct
  * fingerprint; the per-batch iterator folds eagerly.
  */
object CuratedDedup {

  def fold(key: String, rows: Iterator[CuratedDoc],
      state: GroupState[CuratedDoc]): CuratedDoc = {
    // No sentinel: a Long.MaxValue initial state could itself win (and a
    // real doc_id == Long.MaxValue would lose to it); fold over the
    // actual candidates instead. `rows` is non-empty — with NoTimeout
    // the function is only invoked for keys that received data.
    val s = (state.getOption ++ rows).minBy(_.doc_id)
    state.update(s)
    s
  }

  /** Works on both a batch Dataset (one fold per key) and a streaming one
    * (update mode, state across micro-batches) — SURVEY §2.C's unified
    * model applied to the curation pipeline.
    */
  def apply(docs: Dataset[CuratedDoc]): Dataset[CuratedDoc] = {
    implicit val enc: Encoder[CuratedDoc] = Encoders.product[CuratedDoc]
    implicit val strEnc: Encoder[String] = Encoders.STRING
    docs.groupByKey(_.fp).mapGroupsWithState(GroupStateTimeout.NoTimeout())(fold)
  }
}
