package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.Event

/** Last-seen event per user — the keyed state behind the streaming
  * Markov transition counter (the d19 batch operator run incrementally):
  * a transition (cur → nxt) is emitted the moment `nxt` arrives, and the
  * state is ONE tiny record per user regardless of stream length — the
  * O(keys) state-store story of §2.C, where the batch twin's lead()
  * needs the whole history co-located.
  */
final case class LastSeen(tus: Long, event_id: Long, event_type: String)

/** One emitted transition. */
final case class Transition(cur: String, nxt: String)

object MarkovStream {

  private def micros(e: Event): Long =
    e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L

  /** flatMapGroupsWithState fold: each micro-batch's per-user slice is
    * sorted on the d19 key (ts, event_id) — group iterators carry no
    * order guarantee — chained onto the carried last-seen event, and
    * every adjacent pair emits. Exactly the batch lead() semantics as
    * long as the FEED delivers each user's events in event-time order
    * across micro-batches (the h6/d19 stateful-twin contract; late
    * cross-batch arrivals would need a watermark buffer, out of scope
    * for the equivalence law).
    */
  def fold(key: Long, events: Iterator[Event],
      state: GroupState[LastSeen]): Iterator[Transition] = {
    val sorted = events.toSeq.sortBy(e => (micros(e), e.event_id))
    var last = state.getOption
    val out = Seq.newBuilder[Transition]
    sorted.foreach { e =>
      last.foreach(l => out += Transition(l.event_type, e.event_type))
      last = Some(LastSeen(micros(e), e.event_id, e.event_type))
    }
    last.foreach(state.update)
    out.result().iterator
  }

  /** Works on a batch Dataset (single fold, empty initial state) and a
    * streaming one (Append mode, state across micro-batches) — the
    * unified model of SURVEY §2.C.
    */
  def apply(events: Dataset[Event]): Dataset[Transition] = {
    implicit val tEnc: Encoder[Transition] = Encoders.product[Transition]
    implicit val sEnc: Encoder[LastSeen] = Encoders.product[LastSeen]
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fold)
  }
}
