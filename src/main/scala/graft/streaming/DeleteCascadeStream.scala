package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One delete request arriving at the streaming delete cascade
  * (SURVEY §2.D i45's streaming twin): the id comes off the tombstone
  * stream; the rest is the doc's derived-table footprint and exact-dup
  * group geometry, joined stream-statically per batch from the corpus
  * catalog (fp group min/size are group CONSTANTS, so every arrival of
  * a group carries the same values).
  */
final case class DeleteRequest(fp: String, doc_id: Long, n_grams: Long,
    is_member: Boolean, gmin: Long, group_size: Long)

/** Keyed state of one fingerprint group: the members deleted so far
  * (with their per-doc footprint) and the group constants.
  */
final case class DeleteGroupState(
    members: Seq[(Long, Long, Boolean)], gmin: Long, group_size: Long)

/** Current verdicts of every deleted member of one group (update-mode
  * emission): tuple = (doc_id, deleted, fp_rows, band_rows, gram_rows,
  * member_rows, canon_moved) — the i45 row shape.
  */
final case class GroupVerdicts(fp: String,
    verdicts: Seq[(Long, Long, Long, Long, Long, Long, Long)])

/** The STATEFUL core of the streaming delete cascade — i45 run as a
  * tombstone stream: delete requests route to their exact-dup group's
  * state, and the group's verdicts are recomputed from full deleted
  * membership on every update. This is the one cascade column that is
  * NOT per-arrival local: `canon_moved` asks "does the group still
  * have survivors?", so a later delete in the same group must FLIP the
  * canonical's earlier verdict once the last survivor goes — exactly
  * the atomic-list semantics of the batch operator, reached
  * incrementally (StreamingSpec drives the flip and pins final ≡
  * batch). Every other column (fp/band/gram/member counts) is
  * arrival-local and never changes once emitted. State per group is
  * bounded by the group's size (17 bytes per deleted member + two
  * longs); the byte cap fails loudly if one fingerprint accumulates
  * more deleted members than any real dup group should hold.
  */
object DeleteCascadeStream {

  def fold(maxStateBytes: Long = 1L << 20)(key: String,
      rows: Iterator[DeleteRequest],
      state: GroupState[DeleteGroupState]): GroupVerdicts = {
    val fresh = rows.toSeq
    val st = state.getOption.getOrElse(
      DeleteGroupState(Seq.empty,
        fresh.head.gmin, fresh.head.group_size))
    val members =
      (st.members ++ fresh.map(a => (a.doc_id, a.n_grams, a.is_member)))
        .distinct.sortBy(_._1)
    require(17L * members.size + 16L <= maxStateBytes,
      s"fp group $key accumulated ${members.size} deleted members " +
        s"(~${17L * members.size + 16L} state bytes, cap $maxStateBytes): " +
        "a dup group this large belongs in a batch cascade, not keyed state")
    state.update(DeleteGroupState(members, st.gmin, st.group_size))
    val nDel = members.size.toLong
    GroupVerdicts(key, members.map { case (id, nGrams, isMember) =>
      (id, 1L, 1L, 8L, nGrams, if (isMember) 1L else 0L,
        if (id == st.gmin && st.group_size - nDel > 0) 1L else 0L)
    })
  }

  /** Works on both a batch Dataset (one fold per group) and a streaming
    * one (update mode, state across micro-batches) — the unified model
    * of SURVEY §2.C applied to deletion propagation.
    */
  def apply(arrivals: Dataset[DeleteRequest]): Dataset[GroupVerdicts] = {
    implicit val stateEnc: Encoder[DeleteGroupState] =
      Encoders.product[DeleteGroupState]
    implicit val outEnc: Encoder[GroupVerdicts] = Encoders.product[GroupVerdicts]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    arrivals.groupByKey(_.fp)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fold())
  }
}
