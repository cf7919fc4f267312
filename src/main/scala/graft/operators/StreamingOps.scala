package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Event, Q, Tables}

/** Group C (SURVEY.md §2.C): Structured-Streaming-shaped operators.
  *
  * Design rule (SURVEY §2.C): each operator is ONE logic function
  * (`DataFrame => DataFrame`) applied to both a batch DataFrame (for the
  * DuckDB oracle) and a replayed `MemoryStream`/file-source stream (for
  * the ScalaTest stream≡batch equivalence specs in
  * `graft.StreamingSpec`). This is the unified batch/stream model of
  * Structured Streaming — the plan, not the code, differs between modes.
  *
  * The reference's poll loop (reference `main.go:295-396`) is the
  * degenerate case: trigger = poll interval, offset checkpoint = saved
  * sequence number, one-shot = `Trigger.AvailableNow`.
  */
object StreamingOps {

  /** Event-time tumbling window (1 h) per event_type: count + money sum. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
          .cast("double").as("sum_value"))
      .select(col("window.start").cast("timestamp_ntz").as("ws"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Sliding window (1 h every 30 min): per-window event count. */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").cast("timestamp_ntz").as("ws"), col("cnt"))

  /** Session window (10-minute gap) per user: start + event count. */
  def session(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"),
        col("session_window.start").cast("timestamp_ntz").as("session_start"),
        col("cnt"))

  /** Keyed dedup, keep-first by event_id. Deterministic batch twin of
    * streaming `dropDuplicates` (which keeps an arbitrary row — the
    * stream variant is exercised in ScalaTest, not oracled).
    */
  def dedupFirst(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    events
      .withColumn("rn",
        row_number().over(
          Window.partitionBy(col("user_id"), col("event_type")).orderBy(col("event_id"))))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("timestamp_ntz").as("ts"))
  }

  /** Per-key running-aggregate state, as a `mapGroupsWithState` stream
    * keeps per key: event count, exact sum in integer cents, last seen
    * event_id. The batch twin below is pure Catalyst (hash aggregate with
    * map-side partial combine, spillable, no per-group materialization —
    * VERDICT r1 "what's wrong" #5); the incremental typed fold lives in
    * [[graft.streaming.StatefulRunning]] and is asserted equivalent to
    * this in `StreamingSpec`. Cents are rounded half-away-from-zero on
    * both engines (Spark `round` ≡ DuckDB `round` for this).
    */
  final case class RunningState(
      user_id: Long, n_events: Long, sum_cents: Long, last_event_id: Long)

  def statefulRunning(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"),
        max(col("event_id")).as("last_event_id"))

  /** h5: event-time tumbling count behind a 10-minute watermark. In
    * append mode a window is emitted once the watermark passes its end,
    * and rows arriving after that are dropped — the late-data contract.
    * Arrival-order dependent by design, so verified in `StreamingSpec`
    * with a crafted out-of-order feed (never oracled; SURVEY §2.C h5=T).
    */
  def watermarkedTumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").cast("timestamp_ntz").as("ws"), col("cnt"))

  /** h8: stream-stream interval join — each purchase matched to the same
    * user's errors in the preceding 10 minutes (inclusive both ends).
    * ONE logic function for both modes; the streaming callers add
    * `withWatermark` on both inputs so the join state stays bounded
    * (inner-join emission itself needs no watermark). At scale this is a
    * single co-shuffle on user_id with per-key time-range state.
    */
  def purchaseErrorJoin(purchases: DataFrame, errors: DataFrame): DataFrame = {
    val p = purchases.select(col("event_id").as("p_id"), col("user_id"),
      col("ts").as("p_ts"))
    val e = errors.select(col("event_id").as("e_id"),
      col("user_id").as("e_user"), col("ts").as("e_ts"))
    p.join(e,
        col("user_id") === col("e_user") &&
          col("e_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
          col("e_ts") <= col("p_ts"))
      .select(col("p_id"), col("e_id"), col("user_id"),
        col("p_ts").cast("timestamp_ntz").as("p_ts"),
        col("e_ts").cast("timestamp_ntz").as("e_ts"))
  }

  /** h8's LEFT OUTER sibling — the stream-stream join semantics that
    * needs the watermark to PROVE absence: a purchase with no error in
    * its trailing 10-minute window emits null-padded, but only once both
    * streams' watermarks pass the point where a matching error could
    * still arrive (Spark buffers the left row in state until then). The
    * batch form is the plain left join; StreamingSpec pins stream ≡
    * batch after a watermark-advancing sentinel drains the tail.
    */
  def purchaseErrorLeftJoin(purchases: DataFrame, errors: DataFrame): DataFrame = {
    val p = purchases.select(col("event_id").as("p_id"), col("user_id"),
      col("ts").as("p_ts"))
    val e = errors.select(col("event_id").as("e_id"),
      col("user_id").as("e_user"), col("ts").as("e_ts"))
    p.join(e,
        col("user_id") === col("e_user") &&
          col("e_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
          col("e_ts") <= col("p_ts"),
        "left_outer")
      .select(col("p_id"), col("e_id"), col("user_id"),
        col("p_ts").cast("timestamp_ntz").as("p_ts"),
        col("e_ts").cast("timestamp_ntz").as("e_ts"))
  }

  /** h9: the per-window LEADERBOARD over the h1 counts — top-2 event
    * types per 1 h tumbling window (count desc, type asc — total order
    * under ties). Factored as the RANK STAGE over any (ws, event_type,
    * cnt) frame: batch ranks the one-shot aggregate; the streaming
    * leaderboard ranks the continuously-maintained complete-mode count
    * table in foreachBatch (StreamingSpec asserts final snapshot ≡
    * batch). The rank window partitions BY WINDOW — at scale each
    * window's frame is |event types|, never the event stream, and the
    * counts arrive pre-aggregated from the h1 shuffle.
    */
  def windowTopK(counts: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    counts
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("ws"))
          .orderBy(col("cnt").desc, col("event_type").asc)))
      .filter(col("rnk") <= k)
      .select(col("ws"), col("rnk").cast("long").as("rnk"),
        col("event_type"), col("cnt"))
  }

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "events")
  private def sql(s: String): String = s.stripMargin.replace("\n", " ").trim

  val qs: Seq[Q] = Seq(
    Q("h1_stream_tumbling",
      (s, dir) => tumbling(ev(s, dir)).orderBy("ws", "event_type"),
      Some(sql("""SELECT date_trunc('hour', ts) AS ws, event_type, count(*) AS cnt,
                 | CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
                 | FROM events GROUP BY 1, 2 ORDER BY ws, event_type"""))),

    Q("h9_window_topk",
      (s, dir) => windowTopK(tumbling(ev(s, dir)), 2)
        .orderBy("ws", "rnk"),
      Some(sql("""WITH c AS (SELECT date_trunc('hour', ts) AS ws, event_type,
                 |     count(*) AS cnt,
                 |     CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
                 |   FROM events GROUP BY 1, 2)
                 | SELECT ws, rnk, event_type, cnt FROM (
                 |   SELECT ws, event_type, cnt,
                 |     row_number() OVER (PARTITION BY ws
                 |       ORDER BY cnt DESC, event_type) AS rnk
                 |   FROM c)
                 | WHERE rnk <= 2 ORDER BY ws, rnk"""))),

    // Each event lands in exactly two 1h/30m windows: the one starting at
    // its 30-minute bucket and the one 30 minutes earlier.
    Q("h2_stream_sliding",
      (s, dir) => sliding(ev(s, dir)).orderBy("ws"),
      Some(sql("""SELECT ws, count(*) AS cnt FROM (
                 |   SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws FROM events
                 |   UNION ALL
                 |   SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS ws FROM events)
                 | GROUP BY ws ORDER BY ws"""))),

    // Oracle: classic gaps-and-islands. Spark's session merge condition is
    // strict (`next.ts < prev.ts + gap`), so a break is `diff >= gap`.
    Q("h3_stream_session",
      (s, dir) => session(ev(s, dir)).orderBy("user_id", "session_start"),
      Some(sql("""WITH brk AS (
                 |   SELECT user_id, ts,
                 |     CASE WHEN lag(ts) OVER w IS NULL
                 |            OR ts - lag(ts) OVER w >= INTERVAL '10 minutes' THEN 1 ELSE 0 END AS is_brk
                 |   FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
                 | ), sess AS (
                 |   SELECT user_id, ts,
                 |     sum(is_brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
                 |   FROM brk)
                 | SELECT user_id, min(ts) AS session_start, count(*) AS cnt
                 | FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start"""))),

    Q("h4_stream_dedup",
      (s, dir) => dedupFirst(ev(s, dir)).orderBy("event_id"),
      Some(sql("""SELECT event_id, user_id, event_type, ts FROM (
                 |   SELECT event_id, user_id, event_type, ts,
                 |     row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
                 |   FROM events)
                 | WHERE rn = 1 ORDER BY event_id"""))),

    Q("h6_stateful_running",
      (s, dir) => statefulRunning(ev(s, dir)).orderBy("user_id"),
      Some(sql("""SELECT user_id, count(*) AS n_events,
                 | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
                 | max(event_id) AS last_event_id
                 | FROM events GROUP BY user_id ORDER BY user_id"""))),

    Q("h8_stream_stream_join",
      (s, dir) => {
        val events = ev(s, dir)
        purchaseErrorJoin(
          events.filter(col("event_type") === "purchase"),
          events.filter(col("event_type") === "error"))
          .orderBy("p_id", "e_id")
      },
      Some(sql("""SELECT p.event_id AS p_id, e.event_id AS e_id, p.user_id, p.ts AS p_ts, e.ts AS e_ts
                 | FROM events p JOIN events e
                 |   ON p.user_id = e.user_id
                 |  AND e.ts >= p.ts - INTERVAL '10 minutes' AND e.ts <= p.ts
                 | WHERE p.event_type = 'purchase' AND e.event_type = 'error'
                 | ORDER BY p_id, e_id""")))
  )
}
