package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One cluster-routed arrival that survived the static-corpus screen:
  * the row shape entering the keyed state of the streaming semantic
  * dedup (SURVEY §2.D i29's incremental twin).
  */
final case class SemArrival(cid: Long, vec_id: Long, embedding: Seq[Float])

/** Keyed state of one IVF cluster: the arrivals seen so far. */
final case class SemState(members: Seq[SemArrival])

/** Current keep set of one cluster (update-mode emission). */
final case class SemKeeps(cid: Long, kept: Seq[Long])

/** The STATEFUL suffix of streaming semantic dedup — the i29 shape run
  * as an ingest: the static corpus (with its materialized assignment)
  * screens each incoming vector via a stream-static anti-join on the
  * shared cluster id (cosine ≥ θ against any corpus member of the same
  * cluster ⇒ dropped before state), and WITHIN the stream the canonical
  * choice is keyed state per cluster.
  *
  * Arrival-order independence (the CuratedDedup rule — a first-arrival
  * rule would be order-dependent after a shuffle): the state accumulates
  * MEMBERS, not decisions, and every update re-runs the greedy
  * min-id-first fold over the sorted member set — keep v iff no kept
  * u < v has round(dot(u,v), 3) ≥ θ, the same index-ordered double dot
  * and HALF_UP rounding as the batch engine. The final emission per
  * cluster therefore equals the batch greedy over its full membership
  * for ANY arrival order or batching (asserted against an independent
  * model in StreamingSpec). State is cluster-bounded: one (vec_id,
  * embedding) per surviving arrival of that cluster — the same bound the
  * batch cid self-join carries.
  */
object SemDedupStream {

  private def round3(x: Double): Double =
    BigDecimal(x).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def dot(a: Seq[Float], b: Seq[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length && i < b.length) {
      s += a(i).toDouble * b(i).toDouble; i += 1
    }
    s
  }

  /** The greedy min-id-first keep set over one cluster's members. */
  def greedyKeeps(members: Seq[SemArrival], theta: Double): Seq[Long] = {
    val kept = scala.collection.mutable.ArrayBuffer.empty[SemArrival]
    members.sortBy(_.vec_id).foreach { m =>
      if (!kept.exists(k => round3(dot(k.embedding, m.embedding)) >= theta))
        kept += m
    }
    kept.map(_.vec_id).toSeq
  }

  def fold(theta: Double)(key: Long, rows: Iterator[SemArrival],
      state: GroupState[SemState]): SemKeeps = {
    val members =
      (state.getOption.map(_.members).getOrElse(Seq.empty) ++ rows)
        .distinctBy(_.vec_id)
    state.update(SemState(members))
    SemKeeps(key, greedyKeeps(members, theta))
  }

  /** Works on both a batch Dataset (one fold per cluster) and a
    * streaming one (update mode, state across micro-batches) — the
    * unified model of SURVEY §2.C applied to semantic dedup.
    */
  def apply(arrivals: Dataset[SemArrival], theta: Double): Dataset[SemKeeps] = {
    implicit val stateEnc: Encoder[SemState] = Encoders.product[SemState]
    implicit val outEnc: Encoder[SemKeeps] = Encoders.product[SemKeeps]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    arrivals.groupByKey(_.cid)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fold(theta))
  }
}
