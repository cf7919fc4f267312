package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One CDC change arriving at the streaming SCD2 merge (SURVEY §2.B
  * b15's streaming twin): the dimension key, the change instant in
  * integer epoch-µs (the engine's exact time unit), the total-order
  * tiebreak (orderkey; −1 pins the initial snapshot first), and the
  * new attribute value.
  */
final case class ChangeArrival(k: Long, chg_ts_us: Long, chg_seq: Long, attr: String)

/** Keyed state of one dimension key: every change seen so far. SCD2
  * needs the full per-key history, not a running tail — a LATE change
  * landing between two existing versions can suppress or un-suppress
  * its neighbors, so versions re-derive from history on every update.
  */
final case class Scd2State(changes: Seq[(Long, Long, String)])

/** Current version chain of one key (update-mode emission): tuple =
  * (ver, valid_from_us, valid_to_us with −1 encoding the open interval,
  * attr, is_current) — the b15 row shape in integer time.
  */
final case class KeyVersions(k: Long, versions: Seq[(Long, Long, Long, String, Long)])

/** The STATEFUL core of the streaming SCD2 merge — b15 run as a CDC
  * stream: changes route to their key's state and the version chain is
  * re-derived from the full sorted history on every update. Derivation
  * order is (chg_ts, chg_seq) — never arrival order — so a shuffled or
  * late-arriving feed converges to exactly the batch merge
  * (StreamingSpec pins final ≡ b15 and drives the late-arrival
  * suppression flip the arrival-local form would get wrong). No-op
  * suppression is part of the derivation, not the ingest: a change is
  * stored even when currently suppressed, because a later EARLIER-
  * timestamped arrival can change what it follows. State per key is
  * the change history; the byte cap fails loudly when one key
  * accumulates more history than keyed state should hold (a dimension
  * key with millions of changes belongs in the batch merge).
  */
object Scd2Stream {

  /** The b15 derivation over one key's accumulated history: sort by
    * (ts, seq), drop changes equal to their surviving predecessor,
    * chain validity intervals, flag the open tail.
    */
  def deriveVersions(changes: Seq[(Long, Long, String)]): Seq[(Long, Long, Long, String, Long)] = {
    val sorted = changes.sortBy(c => (c._1, c._2))
    val kept = sorted.foldLeft(Vector.empty[(Long, Long, String)]) { (acc, c) =>
      if (acc.nonEmpty && acc.last._3 == c._3) acc else acc :+ c
    }
    kept.zipWithIndex.map { case ((ts, _, attr), i) =>
      val validTo = if (i + 1 < kept.size) kept(i + 1)._1 else -1L
      (i + 1L, ts, validTo, attr, if (i + 1 == kept.size) 1L else 0L)
    }
  }

  def fold(maxStateBytes: Long = 1L << 20)(key: Long,
      rows: Iterator[ChangeArrival],
      state: GroupState[Scd2State]): KeyVersions = {
    val st = state.getOption.getOrElse(Scd2State(Seq.empty))
    val changes =
      (st.changes ++ rows.map(a => (a.chg_ts_us, a.chg_seq, a.attr))).distinct
    val bytes = changes.map(c => 16L + 2L * c._3.length).sum
    require(bytes <= maxStateBytes,
      s"key $key accumulated ${changes.size} changes (~$bytes state bytes, " +
        s"cap $maxStateBytes): a history this large belongs in the batch merge")
    state.update(Scd2State(changes))
    KeyVersions(key, deriveVersions(changes))
  }

  /** Works on both a batch Dataset (one fold per key) and a streaming
    * one (update mode, state across micro-batches) — the unified model
    * of SURVEY §2.C applied to CDC dimension maintenance.
    */
  def apply(arrivals: Dataset[ChangeArrival]): Dataset[KeyVersions] = {
    implicit val stateEnc: Encoder[Scd2State] = Encoders.product[Scd2State]
    implicit val outEnc: Encoder[KeyVersions] = Encoders.product[KeyVersions]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    arrivals.groupByKey(_.k)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fold())
  }
}
