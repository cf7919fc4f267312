package graft

import java.io.PrintStream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.Template
import graft.operators.EnvelopeOps
import graft.sources.ShardedEvents

/** The user-facing tailer — the reference CLI (`main.go:62-135`) composed
  * from the engine's parts: flag parsing with the reference's exact
  * surface and exit-code contract, [[Template.compile]] for `-format`,
  * duration parsing for `-start`/`-watch`, and the `sharded-events`
  * DSv2 source for the stream itself (the positional argument names a
  * dumped stream directory — the offline stand-in for a Kinesis stream
  * name, SURVEY §7 H6).
  *
  * Contract mapped from the reference:
  *   - `-h/--help` → usage on stdout, exit 0 (`main.go:76-79`)
  *   - `-O/--one-shot` → drain once and exit (`main.go:89-92`), run as
  *     one `Trigger.AvailableNow` pass
  *   - `-f/--format <template>` → per-record render, default
  *     `{{.ShortHostId}} {{.Timestamp}} {{.LogEntry}}` (`main.go:65`);
  *     parse failure → usage, exit 2 (`main.go:108-114`)
  *   - `-s/--start <duration>` → AT_TIMESTAMP start offset `now − d`,
  *     default `5m`; invalid/negative → exit 2 (`main.go:81-87`)
  *   - `-w/--watch <duration>` → poll trigger interval, default `10s`;
  *     invalid/non-positive → exit 2 (`main.go:93-102`)
  *   - `-r/--region`, `-p/--profile` → accepted for CLI compatibility,
  *     ignored offline (no AWS endpoint exists to point them at)
  *   - missing stream / extra positional → exit 2 (`main.go:117-129`)
  *   - unreadable stream (the reference's ListShards failure) → exit 1
  *     (`main.go:153-156`)
  *   - SIGINT during watch → graceful drain then exit (`main.go:180-208`),
  *     as a shutdown hook stopping the streaming query
  */
object Tail {

  /** The reference CLI's exact default (`main.go:65`); `.Timestamp`
    * renders as the engine's canonical timestamp string.
    */
  val DefaultTemplate: String = "{{.ShortHostId}} {{.Timestamp}} {{.LogEntry}}"

  def usage(w: PrintStream): Unit = w.print(
    s"""graft-tail [options] <stream-dir>
       |
       |Watch incoming log entries from a sharded event stream directory
       |(written by graft.sources.ShardedEvents.dump).
       |
       |Valid durations are a number followed by a unit abbreviation.
       |Examples: 30s, 5m, 3h, 1d.
       |
       |Fields available to the format template:
       |    {{.HostId}} {{.HostID}} -- The full ARN of the host generating the log.
       |    {{.ShortHostId}} {{.ShortHostID}} -- Short hostname (just the last part).
       |    {{.Timestamp}} -- The timestamp when the log was sent to the stream.
       |    {{.SequenceNumber}} -- The record's per-shard sequence number.
       |    {{.ShardId}} -- The shard the record was read from.
       |    {{.LogEntry}} -- The log entry in string format.
       |    {{.Log}} -- JSON field access via {{.Log.FieldName}} (any depth:
       |                {{.Log.a.b.c}}); printf pipelines are supported
       |                ({{.Log.k | printf "%05d"}}).
       |
       |Options:
       |  -h, --help               Show this usage information.
       |  -O, --one-shot           Display logs only once.
       |  -f, --format <template>  Format template for log entries.
       |                           [$DefaultTemplate]
       |  -s, --start <duration>   Start time, as a duration before now. [5m]
       |  -w, --watch <duration>   Watch/poll time. [10s]
       |  -r, --region <region>    Accepted for compatibility; unused offline.
       |  -p, --profile <profile>  Accepted for compatibility; unused offline.
       |""".stripMargin)

  /** Go-style duration: concatenated `<number><unit>` segments
    * (`30s`, `1h30m`, `1d`); returns micros. A bare `0` is valid, a
    * leading `-` yields a negative duration (rejected later for both
    * flags, matching the reference's range checks).
    */
  private val Seg = raw"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h|d)".r

  def parseDuration(s: String): Option[Long] = {
    val (neg, body) = if (s.startsWith("-")) (true, s.drop(1)) else (false, s)
    if (body == "0") return Some(0L)
    val segs = Seg.findAllMatchIn(body).toList
    if (segs.isEmpty || segs.map(_.matched).mkString != body) None
    else {
      val us = segs.map { m =>
        val mult = m.group(2) match {
          case "ns" => 1e-3
          case "us" | "µs" => 1.0
          case "ms" => 1e3
          case "s" => 1e6
          case "m" => 6e7
          case "h" => 3.6e9
          case "d" => 8.64e10
        }
        m.group(1).toDouble * mult
      }.sum
      Some(math.round(if (neg) -us else us))
    }
  }

  private case class Opts(
      help: Boolean = false,
      oneShot: Boolean = false,
      format: String = DefaultTemplate,
      start: String = "5m",
      watch: String = "10s",
      positional: List[String] = Nil)

  private def parseArgs(args: List[String], acc: Opts): Either[String, Opts] =
    args match {
      case Nil => Right(acc)
      case ("-h" | "--help") :: rest => parseArgs(rest, acc.copy(help = true))
      case ("-O" | "--one-shot") :: rest => parseArgs(rest, acc.copy(oneShot = true))
      case ("-f" | "--format") :: v :: rest => parseArgs(rest, acc.copy(format = v))
      case ("-s" | "--start") :: v :: rest => parseArgs(rest, acc.copy(start = v))
      case ("-w" | "--watch") :: v :: rest => parseArgs(rest, acc.copy(watch = v))
      case ("-r" | "--region") :: _ :: rest => parseArgs(rest, acc)
      case ("-p" | "--profile") :: _ :: rest => parseArgs(rest, acc)
      case (f @ ("-f" | "--format" | "-s" | "--start" | "-w" | "--watch" |
          "-r" | "--region" | "-p" | "--profile")) :: Nil =>
        Left(s"Option $f requires a value.")
      case opt :: _ if opt.startsWith("-") && opt != "-" =>
        Left(s"Unknown option: $opt")
      case v :: rest => parseArgs(rest, acc.copy(positional = acc.positional :+ v))
    }

  /** Testable entry: returns the process exit code instead of exiting.
    * `nowUs` is injectable so specs can pin "now" against fixture data.
    */
  def run(args: Array[String], spark: () => SparkSession,
      out: PrintStream, err: PrintStream,
      nowUs: Long = System.currentTimeMillis() * 1000L): Int = {
    parseArgs(args.toList, Opts()) match {
      case Left(msg) =>
        err.println(msg); usage(err); 2
      case Right(o) if o.help =>
        usage(out); 0
      case Right(o) =>
        val startUs = parseDuration(o.start) match {
          case Some(d) if d >= 0 => nowUs - d
          case _ =>
            err.println(s"Invalid start time: ${o.start}"); usage(err); return 2
        }
        val pollUs =
          if (o.oneShot) Long.MaxValue
          else parseDuration(o.watch) match {
            case Some(d) if d > 0 => d
            case _ =>
              err.println(s"Invalid watch/poll time: ${o.watch}"); usage(err); return 2
          }
        val line =
          try {
            // The tailer's record scope: the envelope fields over the
            // sharded source's columns, with SequenceNumber bound to the
            // TRUE per-shard sequence number the source carries.
            Template.compile(o.format,
              EnvelopeOps.templateScope +
                ("SequenceNumber" -> col("seq")) + // the true per-shard seq
                ("ShardId" -> col("shard_id")) + // the source's shard identity
                ("Log" -> col("props"))) // {{.Log.Field}} JSON navigation
          } catch {
            case e: IllegalArgumentException =>
              err.println(s"Invalid format: ${o.format}: ${e.getMessage}")
              usage(err); return 2
          }
        o.positional match {
          case Nil =>
            err.println("Stream directory must be specified."); usage(err); 2
          case _ :: extra :: _ =>
            err.println(s"Unknown argument: $extra"); usage(err); 2
          case streamDir :: Nil =>
            if (!new java.io.File(streamDir).isDirectory) {
              err.println(s"Failed to list shards for stream $streamDir: not a directory")
              return 1
            }
            val s = spark()
            val rendered = EnvelopeOps.envelope(
              ShardedEvents.readStream(s, streamDir,
                startTimestampUs = Some(startUs),
                maxRecordsPerTrigger = Some(10000L))) // main.go:218
              .select(line.as("line"))
            // stdout IS the sink (the reference's funnel, main.go:288-292),
            // but drained through toLocalIterator so the driver holds ONE
            // partition (= one shard's batch slice, ≤ the per-pull record
            // limit) at a time — a collect() would materialize the whole
            // micro-batch at once: 10M rows at 1000 shards × full pulls
            // (VERDICT r13 #4). Partition-by-partition iteration keeps the
            // same output order collect() had: shards in partition order,
            // each shard's records in sequence order.
            val writer = rendered.writeStream
              .option("checkpointLocation",
                java.nio.file.Files.createTempDirectory("graft-tail-ckpt").toString)
              .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
                batch.toLocalIterator().forEachRemaining(r => out.println(r.getString(0)))
                out.flush()
              }
            val q = (if (o.oneShot) writer.trigger(Trigger.AvailableNow())
              else writer.trigger(Trigger.ProcessingTime(pollUs / 1000L))).start()
            if (o.oneShot) {
              if (!q.awaitTermination(600000L)) { q.stop(); return 1 }
              0
            } else {
              // Graceful shutdown on SIGINT/SIGTERM: stop the query so the
              // in-flight micro-batch drains, then fall through to exit —
              // the reference's interrupt handler (main.go:180-208).
              val hook = new Thread(() => q.stop())
              Runtime.getRuntime.addShutdownHook(hook)
              q.awaitTermination()
              try Runtime.getRuntime.removeShutdownHook(hook)
              catch { case _: IllegalStateException => () } // already exiting
              0
            }
        }
    }
  }

  def main(args: Array[String]): Unit = {
    def session(): SparkSession = {
      val s = SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
        .appName("graft-tail")
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.extensions", "graft.plans.GraftExtensions")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    sys.exit(run(args, () => session(), System.out, System.err))
  }
}
