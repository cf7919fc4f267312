package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{
  GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}
import graft.Event

/** Per-user running aggregate carried by the streaming engine. */
final case class Running(
    user_id: Long, n_events: Long, sum_cents: Long, last_event_id: Long)

/** The typed incremental fold behind `h6_stateful_running` — the streaming
  * generalization of the reference's per-shard cursor state (the tailer
  * keeps `latestSequenceNumber` per shard, reference `main.go:362`; here
  * the state is a per-key aggregate instead of just a resume offset).
  *
  * The batch twin (`StreamingOps.statefulRunning`) is pure Catalyst: a
  * hash aggregate with map-side partial combine that spills — that is the
  * plan to run at 100 TB. This typed `mapGroupsWithState` fold exists for
  * the genuinely incremental case (unbounded input, per-key state across
  * micro-batches); `StreamingSpec` asserts the two agree on the same data.
  *
  * Scale note: state is O(distinct keys) per partition and the store is
  * checkpointed; the per-batch iterator is folded eagerly (no
  * materialization of the group on the heap — VERDICT r1 #5).
  */
object StatefulRunning {

  /** Cents rounding identical to the batch twin's `round(value * 100)`:
    * Catalyst `Round` on a double is BigDecimal HALF_UP on the binary
    * double value (half away from zero for positives and negatives).
    */
  def roundCents(v: Double): Long =
    BigDecimal(v * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  def fold(key: Long, events: Iterator[Event], state: GroupState[Running]): Running = {
    var s = state.getOption.getOrElse(Running(key, 0L, 0L, Long.MinValue))
    events.foreach { e =>
      s = Running(
        user_id = key,
        n_events = s.n_events + 1,
        sum_cents = s.sum_cents + roundCents(e.value),
        last_event_id = math.max(s.last_event_id, e.event_id))
    }
    state.update(s)
    s
  }

  /** Works on both a batch Dataset (single fold per key, empty initial
    * state) and a streaming one (update output mode, state carried across
    * micro-batches) — the unified model of SURVEY §2.C.
    */
  def apply(events: Dataset[Event]): Dataset[Running] = {
    implicit val runningEnc: Encoder[Running] = Encoders.product[Running]
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fold)
  }

  /** The same fold on Spark 4's `transformWithState` arbitrary-state API
    * (typed `ValueState` handles, RocksDB-backed in streaming) — the API
    * successor to `mapGroupsWithState` for long-lived keyed state. Needs
    * `spark.sql.streaming.stateStore.providerClass =
    * ...RocksDBStateStoreProvider` on streaming queries; asserted
    * equivalent to both twins in `StreamingSpec`.
    */
  final class Processor extends StatefulProcessor[Long, Event, Running] {
    @transient private var state: ValueState[Running] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Running](
        "running", Encoders.product[Running], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Running] = {
      var s = Option(state.get()).getOrElse(Running(key, 0L, 0L, Long.MinValue))
      rows.foreach { e =>
        s = Running(key, s.n_events + 1, s.sum_cents + roundCents(e.value),
          math.max(s.last_event_id, e.event_id))
      }
      state.update(s)
      Iterator.single(s)
    }
  }

  def transformWithStateVariant(events: Dataset[Event]): Dataset[Running] = {
    implicit val runningEnc: Encoder[Running] = Encoders.product[Running]
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
