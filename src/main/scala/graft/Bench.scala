package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs every registered query
  * on `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with the total and
  * per-query seconds.
  *
  * Measurement notes (VERDICT r1 "what's wrong" #7):
  *   - a query that throws is recorded in `errors` with a sentinel -1
  *     timing, never as its (fast) time-to-fail — a small total must mean
  *     healthy, not broken;
  *   - results are drained through the built-in `noop` sink, which
  *     evaluates every output column (a bare `count()` lets Catalyst prune
  *     the projections being measured).
  */
object Bench {
  // Host-health stamps (loadavg / foreign-JVM / page-fault latency /
  // page-cache occupancy / O_DIRECT cold-read rate) live in the shared
  // [[HealthStamp]] so the ladder rungs, RouteEval and the
  // index-lifecycle manifests stamp identically (VERDICT r17 ask #2);
  // since r19 Bench embeds the same NESTED health_start/health_end
  // objects as every other tool (ADVICE r18 — the flat r17 key layout
  // was the one remaining artifact-shape exception).
  def main(args: Array[String]): Unit = {
    // Raw jiffies bracket for the promote gate (VERDICT r19 ask #1): the
    // gate needs the WINDOW's steal fraction, which only a start/end
    // counter diff can give — captured before the start stamp's own disk
    // probes so their cost sits inside the bracketed window like
    // everything else the draw pays for.
    val (stealStart, totalStart) = HealthStamp.cpuJiffies()
    val healthStart = HealthStamp.json()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JVM/codegen/parquet-footer costs land here, not in
    // whichever query happens to run first (steady-state measurement).
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    // Dev-only subset filter (comma-separated ids); the driver never sets
    // it, so protocol runs always measure the full registry. Ids are
    // trimmed, and a blank/empty variable means NO filter — a bench that
    // silently measured zero queries would print a bogus healthy total.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // Query isolation (r10 driver-run diagnosis): eager
      // localCheckpoint blocks from the dedup/kmeans pipelines stay
      // pinned in the block manager until the driver GC happens to
      // collect their DataFrames, so a long all-registry run
      // accumulates storage pressure and late queries (the trivial
      // j*) degrade 10-100x under eviction+GC thrash. Each registry
      // query is an independent job; drop its persisted blocks as
      // soon as it is drained, exactly as separate job JVMs would.
      // Runs UNCONDITIONALLY — a query that throws mid-pipeline after
      // eagerly checkpointing would otherwise leak its pinned blocks
      // into every later measurement — and blocking, so async eviction
      // cannot overlap the next query's timed region (dt is already
      // captured; the cleanup costs nothing in measured time).
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      // THRESHOLD-TRIGGERED broadcast hygiene (VERDICT r14 ask #2):
      // broadcast blocks outlive clearCache — the ContextCleaner reaps
      // one only after the driver GC collects its variable — so a long
      // all-registry run accumulates dead-but-pinned broadcasts, and on
      // rare draws a mid-registry query degrades under that storage
      // pressure (the diagnosed i57 51.8s-vs-3.4s scale-gate allow at
      // sf1, where ~240 had piled up). A UNIFORM per-query System.gc()
      // was measured at ~1.27x on every query (rejected, r13); instead
      // the GC fires only when the block-manager's broadcast-block
      // count says pressure is real (~once per 100+ queries at the
      // observed accumulation rate — ~1/50th of the uniform tax). The
      // probe is one driver-local metadata read; the brief sleep lets
      // the async ContextCleaner drain the reference queue before the
      // next timed region starts. dt is already captured — nothing
      // here lands in measured time.
      if (org.apache.spark.GraftBlockProbe
          .broadcastBlockCount(spark.sparkContext) > 128) {
        System.gc()
        Thread.sleep(200)
        System.err.println(s"[bench] broadcast hygiene GC after $name " +
          s"(post-GC blocks: ${org.apache.spark.GraftBlockProbe.broadcastBlockCount(spark.sparkContext)})")
      }
      if (!ok) { errors += name; name -> -1.0 } else name -> dt
    }
    // Stdout line: per-query seconds rounded to ms so the one-line JSON
    // stays within the harness's stdout-tail capture even at 133+ queries
    // (VERDICT r12 #8: the r12 line was tail-truncated and parsed null —
    // full-precision doubles cost ~40 bytes/entry, rounded ~26). The
    // file artifact below keeps full precision.
    def r3(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qsShort = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val (stealEnd, totalEnd) = HealthStamp.cpuJiffies()
    val healthEnd = HealthStamp.json()
    val loadJson =
      s""""health_start":$healthStart,"health_end":$healthEnd"""
    // PROMOTE gate (VERDICT r19 ask #1): a promote request must survive
    // the two checks a point-in-time stamp cannot fake — the window's
    // steal fraction and a fresh sustained-write floor — or carry an
    // explicit --force with the readings recorded. Draw C (r19, 496.4 s
    // with unremarkable stamps) is the episode this mechanizes away.
    val promoteRequested = args.contains("--promote") ||
      sys.env.get("SPARK_GRAFT_PROMOTE").contains("1")
    val force = args.contains("--force")
    val gateSustained = if (promoteRequested) HealthStamp.writeSustainedMbps() else -1.0
    // The draw's bracketing cold-read figures, pulled from the stamps
    // already taken (min of whichever ends were measurable; -1 abstains).
    val gateColdRead = {
      def coldOf(stamp: String): Double =
        try {
          val v = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(stamp).get("cold_read_mbps").asDouble(-1.0)
          v
        } catch { case _: Throwable => -1.0 }
      val vs = Seq(coldOf(healthStart), coldOf(healthEnd)).filter(_ >= 0)
      if (vs.isEmpty) -1.0 else vs.min
    }
    val violations =
      if (promoteRequested)
        HealthStamp.promoteViolations(stealStart, totalStart, stealEnd, totalEnd,
          gateSustained, gateColdRead)
      else Seq.empty
    val promote = promoteRequested && (violations.isEmpty || force)
    val stealFrac =
      if (totalEnd > totalStart && stealStart >= 0)
        math.rint((stealEnd - stealStart).toDouble / (totalEnd - totalStart) * 10000) / 10000
      else -1.0
    val gateJson =
      if (promoteRequested)
        s""","promote_gate":{"steal_frac":$stealFrac,"write_sustained_mbps":$gateSustained,"cold_read_min_mbps":$gateColdRead,""" +
          s""""violations":${violations.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
          s""""forced":${force && violations.nonEmpty},"promoted":$promote}"""
      else ""
    if (promoteRequested && violations.nonEmpty) {
      val verdict = if (force) "FORCED past the promote gate" else "promote REFUSED"
      System.err.println(s"[bench] $verdict: ${violations.mkString("; ")}" +
        (if (force) " (readings recorded in the artifact)"
         else " — re-run in a healthy window, or add --force to record the readings and promote anyway"))
    }
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qsShort,"errors":$errJson,"sf":"$sfDir"}"""
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir",$loadJson$gateJson}"""
    // Self-contained artifact: the FULL-precision line is also written to
    // a file. The default name carries the sf directory's basename so
    // back-to-back runs at different SFs (sf0.1 then sf1) land in
    // distinct files instead of overwriting each other;
    // $SPARK_GRAFT_OUT still overrides.
    //
    // PROMOTE gating (VERDICT r18 ask #4): the committed-envelope file
    // `BENCH_FULL_<sf>.json` is written ONLY when the caller opts in
    // with `--promote` or SPARK_GRAFT_PROMOTE=1 — every other run
    // (including the driver's unprompted per-round invocation) lands in
    // a timestamped `BENCH_full_draw_<sf>_<ts>.json`, so a driver run
    // can never overwrite the round's adjudicated envelope and the
    // round-close ritual no longer needs a manual `git checkout`.
    val sfTag = java.nio.file.Paths.get(sfDir).getFileName.toString
      .replaceAll("[^A-Za-z0-9._-]", "_")
    // `promote` above is the GATED verdict: a refused promote falls
    // through to the timestamped draw filename, so a contaminated window
    // can never overwrite the committed envelope mechanically.
    val defaultOut =
      if (promote) s"BENCH_FULL_$sfTag.json"
      else {
        val ts = java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
          .format(java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss"))
        s"BENCH_full_draw_${sfTag}_$ts.json"
      }
    val outFile = sys.env.getOrElse("SPARK_GRAFT_OUT", defaultOut)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), fullLine + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    println(line)
    // The driver's per-round artifact keeps only the LAST ~2000 chars of
    // stdout and json-parses what it finds there; at 200+ queries the
    // contract line above is ~5 KB, so its head truncates out of the
    // window and the round records `parsed: null` (VERDICT r12 #8 /
    // r13 #3). No complete per-query map can fit that window at this
    // registry size, so the LAST line is a compact trailer that always
    // parses — total, errors, the 10 slowest queries, and a pointer to
    // the committed full-precision artifact written above.
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(10)
      .map { case (k, v) => s"\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},"errors":$errJson,"queries_file":"$outFile",$loadJson,"slowest10":$slowest}""")
    spark.stop()
  }
}
