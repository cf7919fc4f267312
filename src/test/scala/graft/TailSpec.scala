package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.Template
import graft.operators.EnvelopeOps
import graft.sources.ShardedEvents

/** The `graft.Tail` CLI end-to-end (VERDICT r12 #3): the reference's flag
  * surface and exit-code contract (`main.go:62-135`) driving the
  * sharded-events source through template render to stdout.
  */
class TailSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private lazy val streamRoot: String = {
    val r = Files.createTempDirectory("tail-shards").toString
    ShardedEvents.dump(Tables.load(spark, dir, "events"), r, 4)
    r
  }

  /** Run Tail.run with captured stdio; returns (exit, stdout, stderr). */
  private def tail(nowUs: Long, args: String*): (Int, String, String) = {
    val o = new ByteArrayOutputStream(); val e = new ByteArrayOutputStream()
    val out = new PrintStream(o, true, "UTF-8")
    val err = new PrintStream(e, true, "UTF-8")
    val code = Tail.run(args.toArray, () => spark, out, err, nowUs)
    (code, o.toString("UTF-8"), e.toString("UTF-8"))
  }

  private def nowAfterAllData: Long =
    Tables.load(spark, dir, "events")
      .select(max(unix_micros(col("ts")))).head().getLong(0) + 1L

  test("-h prints usage to stdout and exits 0") {
    val (code, out, _) = tail(0L, "-h")
    assert(code == 0 && out.contains("graft-tail [options] <stream-dir>"))
    assert(out.contains("{{.ShortHostId}}") && out.contains("--one-shot"))
  }

  test("invalid start duration exits 2 with usage on stderr (main.go:81-87)") {
    for (bad <- Seq("xyz", "5q", "-5m")) {
      val (code, _, err) = tail(0L, "-s", bad, "-O", streamRoot)
      assert(code == 2, s"start=$bad must exit 2")
      assert(err.contains(s"Invalid start time: $bad") && err.contains("graft-tail"))
    }
  }

  test("invalid or non-positive watch time exits 2 (main.go:93-102)") {
    for (bad <- Seq("junk", "0")) {
      val (code, _, err) = tail(0L, "-w", bad, streamRoot)
      assert(code == 2, s"watch=$bad must exit 2")
      assert(err.contains(s"Invalid watch/poll time: $bad"))
    }
    // ...but a non-positive watch is IGNORED under one-shot, like the
    // reference (pollTime is only parsed when not one-shot, main.go:93).
    val (code, _, _) = tail(nowAfterAllData, "-w", "0", "-O", "-s", "20000d", streamRoot)
    assert(code == 0)
  }

  test("template parse failure exits 2 (main.go:108-114)") {
    val (code, _, err) = tail(0L, "-f", "{{.NoSuchField}}", "-O", streamRoot)
    assert(code == 2)
    assert(err.contains("Invalid format") && err.contains("NoSuchField"))
  }

  test("missing stream exits 2; extra positional exits 2 (main.go:117-129)") {
    val (c1, _, e1) = tail(0L, "-O")
    assert(c1 == 2 && e1.contains("must be specified"))
    val (c2, _, e2) = tail(0L, "-O", streamRoot, "surplus")
    assert(c2 == 2 && e2.contains("Unknown argument: surplus"))
  }

  test("unreadable stream exits 1 (the ListShards failure, main.go:153-156)") {
    val (code, _, err) = tail(0L, "-O", "/nonexistent/stream/dir")
    assert(code == 1 && err.contains("Failed to list shards"))
  }

  test("one-shot drain renders every record through the default template") {
    val (code, out, _) = tail(nowAfterAllData, "-O", "-s", "20000d", streamRoot)
    assert(code == 0)
    val got = out.split("\n").filter(_.nonEmpty).toSeq
    val want = EnvelopeOps.envelope(Tables.load(spark, dir, "events"))
      .select(Template.compile(Tail.DefaultTemplate, EnvelopeOps.templateScope).as("l"))
      .collect().map(_.getString(0)).toSeq
    assert(got.size == want.size, s"expected ${want.size} lines, got ${got.size}")
    assert(got.sorted == want.sorted)
    // Spot-check the template shape: short host id, timestamp, payload.
    assert(got.head.matches(".+ \\d{4}-\\d{2}-\\d{2} .+"))
  }

  test("one-shot honors -start as the AT_TIMESTAMP offset") {
    val medianUs = Tables.load(spark, dir, "events")
      .select(expr("percentile_approx(unix_micros(ts), 0.5, 100)"))
      .head().getLong(0)
    // now == median and -s 0: only records at/after the median flow.
    val (code, out, _) = tail(medianUs, "-O", "-s", "0", streamRoot)
    assert(code == 0)
    val n = out.split("\n").count(_.nonEmpty)
    val want = Tables.eventsSince(spark, dir, medianUs).count()
    assert(n.toLong == want, s"expected $want rows since median, got $n")
  }

  test("custom template with strftime and JSON field access renders") {
    val (code, out, _) = tail(nowAfterAllData, "-O", "-s", "20000d",
      "-f", "{{strftime \"%Y\" .Timestamp}}|{{.SequenceNumber}}|{{.Log.k}}",
      streamRoot)
    assert(code == 0)
    val lines = out.split("\n").filter(_.nonEmpty)
    assert(lines.nonEmpty && lines.forall(_.matches("\\d{4}\\|\\d+\\|.*")))
  }

  test("many shards x full batches: per-shard output order is preserved by the iterator drain") {
    // sf0.01 events over 8 shards, drained one-shot with the hardwired
    // 10000-records-per-shard-per-pull cap (main.go:218): every shard's
    // lines must appear in strictly increasing sequence order in stdout —
    // the property the toLocalIterator drain (one partition on the driver
    // at a time, VERDICT r13 #4) must keep identical to a full collect.
    val bigDir = "/root/testdata/sf0.01"
    val root = Files.createTempDirectory("tail-shards-big").toString
    ShardedEvents.dump(Tables.load(spark, bigDir, "events"), root, 8)
    val nowUs = Tables.load(spark, bigDir, "events")
      .select(max(unix_micros(col("ts")))).head().getLong(0) + 1L
    val (code, out, _) = tail(nowUs, "-O", "-s", "20000d",
      "-f", "{{.ShardId}}|{{.SequenceNumber}}", root)
    assert(code == 0)
    val lines = out.split("\n").filter(_.nonEmpty).toSeq
    assert(lines.size == 10000, s"expected 10000 lines, got ${lines.size}")
    val byShard = lines.map { l =>
      val Array(sh, seq) = l.split("\\|"); (sh, seq.toLong)
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(byShard.size == 8, s"expected 8 shards, got ${byShard.keySet}")
    for ((sh, seqs) <- byShard)
      assert(seqs == seqs.sorted,
        s"shard $sh lines out of sequence order: ${seqs.take(20)}...")
  }

  test("Go-style durations parse like the reference examples") {
    assert(Tail.parseDuration("30s").contains(30L * 1000000))
    assert(Tail.parseDuration("5m").contains(300L * 1000000))
    assert(Tail.parseDuration("3h").contains(10800L * 1000000))
    assert(Tail.parseDuration("1d").contains(86400L * 1000000))
    assert(Tail.parseDuration("1h30m").contains(5400L * 1000000))
    assert(Tail.parseDuration("1.5s").contains(1500000L))
    assert(Tail.parseDuration("0").contains(0L))
    assert(Tail.parseDuration("-5m").contains(-300L * 1000000))
    assert(Tail.parseDuration("").isEmpty)
    assert(Tail.parseDuration("5").isEmpty)
    assert(Tail.parseDuration("s5").isEmpty)
  }
}
