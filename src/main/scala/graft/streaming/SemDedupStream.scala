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
  * choice is keyed state per cluster using the SAME rule as batch i29:
  * connected components over the ≥ θ edge graph, keep each component's
  * min id. (A greedy keep-vs-kept-only fold would diverge from the
  * batch semantics on transitive chains — sim(1,2) ≥ θ, sim(2,3) ≥ θ,
  * sim(1,3) < θ keeps {1} under the component rule but {1,3} under
  * greedy.)
  *
  * Arrival-order independence (the CuratedDedup rule — a first-arrival
  * rule would be order-dependent after a shuffle): the state accumulates
  * MEMBERS, not decisions, and every update recomputes the component
  * minima over the full member set — the same index-ordered double dot
  * and HALF_UP 3dp rounding as the batch engine. The final emission per
  * cluster therefore equals batch i29's resolve rule over its full
  * membership for ANY arrival order or batching (asserted against an
  * independent union-find model in StreamingSpec). State is
  * cluster-bounded: one (vec_id, embedding) per surviving arrival of
  * that cluster — the same bound the batch cid self-join carries; the
  * per-update pair scan is the batch edge join restricted to the
  * cluster, the quadratic term the salted batch join bounds the same
  * way.
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

  /** Component minima of one cluster's ≥ θ similarity graph — batch
    * i29's resolve rule (star contraction computes the same labels
    * distributed; the member set here is cluster-bounded state).
    */
  def componentKeeps(members: Seq[SemArrival], theta: Double): Seq[Long] = {
    val ms = members.sortBy(_.vec_id)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for {
      i <- ms.indices; j <- (i + 1) until ms.size
      if round3(dot(ms(i).embedding, ms(j).embedding)) >= theta
    } {
      val (ra, rb) = (find(ms(i).vec_id), find(ms(j).vec_id))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    ms.map(_.vec_id).filter(id => find(id) == id)
  }

  def fold(theta: Double)(key: Long, rows: Iterator[SemArrival],
      state: GroupState[SemState]): SemKeeps = {
    val members =
      (state.getOption.map(_.members).getOrElse(Seq.empty) ++ rows)
        .distinctBy(_.vec_id)
    state.update(SemState(members))
    SemKeeps(key, componentKeeps(members, theta))
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
