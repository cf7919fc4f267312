package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One k-gram occurrence arriving at the incremental span-dedup state
  * (SURVEY §2.D i41's streaming twin): `g` is the 8-byte gram hash,
  * `in_corpus` the stream-static flag that the persisted corpus gram
  * set already contains this gram (joined per-batch, stateless).
  */
final case class GramArrival(g: Long, doc_id: Long, pos: Long,
    in_corpus: Boolean)

/** Keyed state of one gram: the occurrence positions seen so far and
  * whether any arrival carried the corpus flag.
  */
final case class GramState(members: Seq[(Long, Long)], corpus: Boolean)

/** Current repeat positions of one gram (update-mode emission): every
  * member if the gram exists in the corpus (all batch occurrences are
  * repeats of a corpus-first), else every member but the (doc_id, pos)
  * minimum (the keep-first rule).
  */
final case class GramRepeats(g: Long, repeats: Seq[(Long, Long)])

/** The STATEFUL core of streaming incremental span dedup — i41 run as
  * an ingest: occurrences route to their gram's state, and the repeat
  * set is recomputed from full membership on every update, so the
  * final emission depends only on the occurrence SET, never on arrival
  * order (the CuratedDedup rule at gram granularity). The batch twin
  * law (PipelineOps.repeatGramsIncremental) holds because
  * corpus-present grams mark every member and fresh grams mark all but
  * the global (doc_id, pos) minimum — exactly the screen ∪ rn ≥ 2
  * union the batch operator computes. State per gram is bounded by the
  * gram's frequency in the ingest window; the `maxStateBytes` guard
  * fails loudly when one gram outgrows what a key should hold (a
  * stop-word run — at that frequency the gram belongs in the corpus
  * set, not in per-key state). The cap is BYTE-based for symmetry with
  * the sibling streams (an occurrence is a fixed 16 bytes, so here it
  * is equivalent to a ~4M-occurrence count cap).
  */
object SpanDedupStream {

  def fold(maxStateBytes: Long = 64L << 20)(key: Long,
      rows: Iterator[GramArrival], state: GroupState[GramState]): GramRepeats = {
    val st = state.getOption.getOrElse(GramState(Seq.empty, corpus = false))
    val fresh = rows.toSeq
    val corpus = st.corpus || fresh.exists(_.in_corpus)
    val members =
      (st.members ++ fresh.map(a => (a.doc_id, a.pos))).distinct.sorted
    require(16L * members.size <= maxStateBytes,
      s"gram $key accumulated ${members.size} occurrences " +
        s"(~${16L * members.size} state bytes, cap $maxStateBytes): " +
        "fold it into the persisted corpus gram set instead")
    state.update(GramState(members, corpus))
    GramRepeats(key, if (corpus) members else members.drop(1))
  }

  /** Works on both a batch Dataset (one fold per gram) and a streaming
    * one (update mode, state across micro-batches) — the unified model
    * of SURVEY §2.C applied to incremental span dedup.
    */
  def apply(arrivals: Dataset[GramArrival]): Dataset[GramRepeats] = {
    implicit val stateEnc: Encoder[GramState] = Encoders.product[GramState]
    implicit val outEnc: Encoder[GramRepeats] = Encoders.product[GramRepeats]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    arrivals.groupByKey(_.g)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fold())
  }
}
