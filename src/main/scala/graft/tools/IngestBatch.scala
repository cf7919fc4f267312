package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{LlmOps, PipelineOps}

/** PRODUCTION incremental ingest — the daily-crawl command composing the
  * whole persisted-index lifecycle (VERDICT r15 ask #3): given a
  * [[BuildIndexes]] output directory and an arriving batch's tables,
  * compute every artifact's DELTA and land it as a bucketed delta
  * segment next to the base, plus a delta manifest. The corpus-side
  * artifacts are READ, never rebuilt — at 100 TB the base build is the
  * once-per-snapshot cost, and a day's crawl touches corpus data only
  * through the (small, bucketed) artifact tables.
  *
  * Per-family delta rules (each one's additivity law — build(corpus ∪
  * batch) ≡ base ∪ delta — is asserted through THIS code path in
  * PersistedIndexSpec):
  *
  * | artifact      | delta                                    | law      |
  * |---------------|------------------------------------------|----------|
  * | corpus_fp     | batch md5 fingerprints (i25 rule)        | per-row  |
  * | corpus_sets   | batch token-set sketches                 | per-row  |
  * | corpus_bands  | batch minhash bands (i36 screen side)    | per-row  |
  * | corpus_grams  | batch-new distinct grams (i41, anti-join)| set-union|
  * | truth_pairs   | pairStatsIngest (pairs touching batch)   | partition|
  * | coarse_assign | batch routed vs PERSISTED codebook (i43) | per-row* |
  * | pq_codes      | batch encoded vs PERSISTED pq_cent (i43) | per-row* |
  * | pack_state    | batch token-total segment (i52 scalar)   | sum      |
  * | dsir_counts   | batch bigram counts (i62)                | sum-merge|
  *
  * (*) The ANN families ingest under the annIndexIngest contract: an
  * ingest NEVER retrains — arrivals are encoded against the persisted
  * codebooks so old and new codes stay comparable under one LUT, and a
  * trained-routing base's batch routes through its PERSISTED
  * route_supers (the same-router law — see [[deltas]]). Given
  * the FIXED codebooks the encodings are row-local, hence additive; a
  * codebook retrain (scaledK crossing its next rung, a drifted corpus)
  * is a REBUILD, not an ingest, exactly as a production IVF/PQ index
  * versions its codebooks.
  *
  * Delta segments are bucketed identically to their base tables
  * (merge-on-read: a consumer unions base ∪ deltas and keeps the
  * co-located join per segment; a compaction materializes the union —
  * the LSM shape every 100 TB index store uses). The two aggregate
  * artifacts (pack_state, dsir_counts) merge by SUM on read —
  * PipelineOps.dsirMergeCounts / a 1-row scalar add.
  *
  * Usage: IngestBatch <indexDir> <batchSfDir> [tag] [--verbose]
  *        IngestBatch --compact <indexDir>
  *   indexDir   = a BuildIndexes output/warehouse directory
  *   batchSfDir = directory holding the batch's documents.parquet +
  *                embeddings.parquet
  *   tag        = delta segment name (default: sanitized batch basename)
  *   --verbose  = also count base-artifact rows for the manifest
  *                (O(index) telemetry I/O — off the default hot path)
  *   --compact  = materialize merge-on-read back into one bucketed base
  *                segment per artifact and drop the consumed deltas
  */
object IngestBatch {

  /** Bucket keys per artifact — the SAME keys BuildIndexes buckets the
    * base tables on (a delta segment must co-locate like its base).
    */
  val bucketKeys: Map[String, Seq[String]] = Map(
    "corpus_fp" -> Seq("fp"),
    "corpus_sets" -> Seq("doc_id"),
    "corpus_bands" -> Seq("b", "v", "source"),
    "corpus_grams" -> Seq("g"),
    "truth_pairs" -> Seq("doc_id1", "doc_id2"),
    "coarse_assign" -> Seq("vec_id"),
    "pq_codes" -> Seq("vec_id"),
    "pack_state" -> Seq(),
    "dsir_counts" -> Seq("bk"))

  /** The delta of every artifact, as pure frames — shared verbatim by
    * the tool main and PersistedIndexSpec's additivity assertions.
    * `corpusSets`/`corpusGrams` are the persisted base artifacts the
    * truth-pair and gram deltas read; `coarseCodebook`/`pqCent` are the
    * persisted codebooks the ANN deltas encode against.
    */
  def deltas(
      corpusSets: DataFrame, corpusGrams: DataFrame,
      coarseCodebook: DataFrame, pqCent: DataFrame,
      batchDocs: DataFrame, batchEmb: DataFrame,
      routeSupers: Option[DataFrame] = None): Seq[(String, DataFrame)] = {
    val batchSets = LlmOps.hashedTokenSets(batchDocs).localCheckpoint(true)
    // Encode against the persisted codebook at ITS k (the dispatcher
    // picks flat/two-level from the codebook's own size — the same k
    // the base build routed with). A trained base additionally supplies
    // its persisted route_supers, and the batch routes through the SAME
    // trained router (VERDICT r16 ask #2) — otherwise the merged
    // coarse_assign would mix stub-routed delta rows into a
    // trained-routed base, and build(c ∪ b) ≡ base ∪ delta fails.
    val k = coarseCodebook.count().toInt
    Seq(
      "corpus_fp" ->
        batchDocs.select(col("doc_id"), md5(col("text")).as("fp")),
      "corpus_sets" -> batchSets,
      "corpus_bands" -> PipelineOps.minhashBands(batchSets),
      // Only batch-NEW grams: base ∪ delta stays a distinct set (the
      // anti-join is the i41 screen run against the persisted table).
      "corpus_grams" ->
        PipelineOps.gramOcc(batchDocs, 5).select(col("g")).distinct()
          .join(corpusGrams, Seq("g"), "left_anti"),
      "truth_pairs" -> LlmOps.pairStatsIngest(corpusSets, batchSets, 7),
      "coarse_assign" ->
        routeSupers.fold(
            PipelineOps.assignToCentroids(batchEmb, coarseCodebook, k))(sup =>
            PipelineOps.assignToCentroidsTwoLevelFromSupers(
              batchEmb, coarseCodebook, sup, k))
          .select(col("vec_id"), col("cid")),
      "pq_codes" ->
        PipelineOps.pqAssign(
            PipelineOps.pqBlocks(batchEmb, nBlocks = 4, blockDim = 16), pqCent)
          .select(col("vec_id"), col("b"), col("cid").as("pcid")),
      "pack_state" ->
        batchDocs.agg(coalesce(sum(size(split(col("text"), " "))
          .cast("long")), lit(0L)).as("base_tok")),
      "dsir_counts" -> PipelineOps.dsirCounts(batchDocs))
  }

  /** MERGE-ON-READ: the artifact as consumers see it after any number
    * of ingests — base ∪ delta segments, with the per-family rule for
    * the two aggregate artifacts (pack_state rows SUM to the current
    * scalar; dsir_counts segments merge by summed counts). For the
    * per-row/set families the union IS the artifact (the additivity
    * laws PersistedIndexSpec pins); a compaction materializes the same
    * frame back into one bucketed segment.
    */
  def merged(name: String, base: DataFrame, deltas: Seq[DataFrame]): DataFrame = {
    val all = (base +: deltas).reduce(_ unionByName _)
    name match {
      case "pack_state" =>
        all.agg(coalesce(sum(col("base_tok")), lit(0L)).as("base_tok"))
      case "dsir_counts" => all.groupBy(col("bk"))
        .agg(sum(col("cs")).as("cs"), sum(col("ct")).as("ct"))
      case _ => all
    }
  }

  /** Path-level [[merged]]: reads the base table and every
    * `<name>__delta_*` segment directory under `indexDir`.
    */
  def readMerged(spark: SparkSession, indexDir: String,
      name: String): DataFrame = {
    val deltas = Option(new java.io.File(indexDir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith(s"${name}__delta_"))
      .map(f => spark.read.parquet(f.getAbsolutePath)).toSeq
    merged(name, spark.read.parquet(s"$indexDir/$name"), deltas)
  }

  /** COMPACTION (VERDICT r16 ask #4): materialize [[merged]] back into
    * ONE bucketed base segment per artifact and drop the consumed delta
    * segments — the compaction half of the LSM shape [[merged]]
    * documents. Laws (PersistedIndexSpec): readMerged before ≡
    * readMerged after, zero delta segments remain, idempotent (a second
    * run is a no-op rewrite of the base). Single-box mechanics: the
    * merged frame is EAGERLY materialized (localCheckpoint) before the
    * directories it was read from are replaced, so the rewrite can
    * never stream its own half-deleted input; a petabyte deployment
    * writes the compacted segment to a NEW directory and swaps a
    * pointer instead — same law, different atomicity mechanism. The
    * rewrite is an EXTERNAL bucketed table at the artifact path (same
    * bucket layout as a fresh BuildIndexes base), so this is callable
    * from any session regardless of its warehouse. Artifacts absent
    * from the directory are skipped (partial indexes stay partial).
    */
  def compactIndex(spark: SparkSession, indexDir: String): Seq[String] =
    bucketKeys.toSeq.sortBy(_._1).flatMap { case (name, keys) =>
      val baseDir = new java.io.File(s"$indexDir/$name")
      if (!baseDir.isDirectory) None
      else {
        val deltaDirs = Option(new java.io.File(indexDir).listFiles())
          .getOrElse(Array.empty[java.io.File])
          .filter(f => f.isDirectory &&
            f.getName.startsWith(s"${name}__delta_")).toSeq
        val t0 = System.nanoTime()
        val m = readMerged(spark, indexDir, name).localCheckpoint(true)
        (deltaDirs :+ baseDir).foreach { d =>
          spark.sql(s"DROP TABLE IF EXISTS ${d.getName}")
          rmrf(d)
        }
        val w = m.write.format("parquet").mode("overwrite")
          .option("path", s"$indexDir/$name")
        (if (keys.nonEmpty)
          w.bucketBy(8, keys.head, keys.tail: _*)
            .sortBy(keys.head, keys.tail: _*)
        else w).saveAsTable(name)
        val sec = (System.nanoTime() - t0) / 1e9
        val rows = spark.table(name).count()
        println(s"[compact] $name: $rows rows, ${deltaDirs.length} delta " +
          s"segment(s) consumed in ${f"$sec%.1f"}s")
        Some(s"""{"artifact":"$name","rows":$rows,""" +
          s""""segments_consumed":${deltaDirs.length},"compact_sec":$sec}""")
      }
    }

  def main(args: Array[String]): Unit = {
    // Health stamps bracket the run so an ingest/compaction wall taken
    // through a host-pressure episode self-flags (VERDICT r17 #2).
    val healthStart = graft.HealthStamp.json()
    val verbose = args.contains("--verbose")
    val compactMode = args.contains("--compact")
    val pos = args.filterNot(_.startsWith("--"))
    val indexDir = pos(0)
    if (compactMode) {
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.extensions", "graft.plans.GraftExtensions")
        .config("spark.sql.warehouse.dir", indexDir)
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val rows = compactIndex(spark, indexDir)
      val line = s"""{"index_dir":"$indexDir",""" +
        s""""compacted":${rows.mkString("[", ",", "]")},""" +
        s""""health_start":$healthStart,""" +
        s""""health_end":${graft.HealthStamp.json()}}"""
      println(line)
      // Sequence-tagged like the ingest manifests (VERDICT r17 #6): a
      // later compaction must not erase the record of an earlier one,
      // so each run takes the next free compact_manifest_<n>.json.
      val n = Iterator.from(1).find(i => !java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$indexDir/compact_manifest_$i.json"))).get
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$indexDir/compact_manifest_$n.json"),
        line + "\n")
      spark.stop()
      return
    }
    val batchDir = pos(1)
    // The tag becomes part of a Spark TABLE IDENTIFIER, so it must be a
    // valid lowercase identifier (ADVICE r16): dots/dashes (the repo's
    // own 'sf0.1' data-dir convention) break saveAsTable/DROP TABLE on
    // multipart identifiers, and uppercase is silently lowercased by
    // the catalog when the table directory is created while the
    // idempotence rmrf below uses the raw-case path — a same-tag re-run
    // would miss the stale segment and read its own prior delta back as
    // corpus state (silent data loss on the corpus_grams overwrite).
    val tag = (if (pos.length > 2) pos(2)
      else java.nio.file.Paths.get(batchDir).getFileName.toString)
      .toLowerCase.replaceAll("[^a-z0-9_]", "_")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir", indexDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Base artifacts by path (the in-memory catalog died with the build
    // JVM; the parquet files ARE the artifact — reading them directly
    // is output-identical, BuildIndexes' documented contract).
    def base(name: String): DataFrame =
      spark.read.parquet(s"$indexDir/$name")
    val batchDocs = spark.read.parquet(s"$batchDir/documents.parquet")
      .localCheckpoint(true)
    val batchEmb = spark.read.parquet(s"$batchDir/embeddings.parquet")
      .localCheckpoint(true)

    // Idempotence: a re-run of the SAME tag must not read its own stale
    // delta back as prior corpus state (a duplicated doc_id in the
    // merged sketch table would explode the candidate join), so this
    // tag's segments are dropped BEFORE the merge-on-read below.
    IngestBatch.bucketKeys.keys.foreach { name =>
      spark.sql(s"DROP TABLE IF EXISTS ${name}__delta_$tag")
      rmrf(new java.io.File(s"$indexDir/${name}__delta_$tag"))
    }
    // Router detection (VERDICT r16 ask #2): a --trained-routing base
    // persists its stage-1 supers as route_supers and its manifest
    // records the router. The artifact is the operative truth (it IS
    // the router); every manifest that states a router must AGREE with
    // it — a mismatch means the index directory holds artifacts from
    // two builds with different routers, which no ingest can extend
    // coherently, so fail loudly instead of writing a mixed-semantics
    // delta.
    val trained = new java.io.File(s"$indexDir/route_supers").isDirectory
    Option(new java.io.File(indexDir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName.startsWith("manifest_") &&
        f.getName.endsWith(".json"))
      .foreach { f =>
        val m = java.nio.file.Files.readString(f.toPath)
        if (m.contains("\"trained_routing\":")) {
          val says = m.contains("\"trained_routing\":true")
          require(says == trained,
            s"${f.getName} records trained_routing=$says but route_supers " +
              s"${if (trained) "exists" else "is absent"} — the index mixes " +
              "builds with different routers; rebuild before ingesting")
        }
      }
    val routeSupers =
      if (trained) Some(base("route_supers").localCheckpoint(true)) else None
    if (trained) println("[ingest-batch] trained-routing base: batch " +
      "routed with persisted route_supers")

    // The sketch/gram state a NEW batch diffs against must include every
    // PRIOR delta segment (merge-on-read): day-3 docs can truth-pair
    // with day-2 docs, and day-3's "new grams" must exclude day-2's.
    // The codebooks stay the base build's (never retrained on ingest).
    val written = deltas(
      readMerged(spark, indexDir, "corpus_sets"),
      readMerged(spark, indexDir, "corpus_grams"),
      base("coarse_codebook"), base("pq_cent"),
      batchDocs, batchEmb, routeSupers).map { case (name, df) =>
      val delta = s"${name}__delta_$tag"
      val t0 = System.nanoTime()
      val keys = bucketKeys(name)
      val w = df.write.format("parquet").mode("overwrite")
      (if (keys.nonEmpty)
        w.bucketBy(8, keys.head, keys.tail: _*).sortBy(keys.head, keys.tail: _*)
      else w).saveAsTable(delta)
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = spark.table(delta).count()
      // Base row counts are TELEMETRY, not ingest work: counting all
      // nine base artifacts is O(index) I/O per daily crawl at 100 TB
      // scale, so the default ingest plans zero base-table scans beyond
      // the two merge-on-read inputs it actually needs (corpus_sets,
      // corpus_grams) — opt back in with --verbose (VERDICT r16 ask #7).
      val baseRows = if (verbose) base(name).count().toString else "null"
      println(s"[ingest-batch] $delta: $rows rows in ${f"$sec%.1f"}s" +
        (if (verbose) s" (+$baseRows base)" else ""))
      s"""{"artifact":"$name","delta_table":"$delta","rows_delta":$rows,""" +
        s""""rows_base":$baseRows,"ingest_sec":$sec}"""
    }
    val line = s"""{"index_dir":"$indexDir","batch_dir":"$batchDir",""" +
      s""""tag":"$tag","deltas":${written.mkString("[", ",", "]")},""" +
      s""""health_start":$healthStart,""" +
      s""""health_end":${graft.HealthStamp.json()}}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$indexDir/ingest_manifest_$tag.json"),
      line + "\n")
    spark.stop()
  }

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(rmrf)
    f.delete(): Unit
  }
}
