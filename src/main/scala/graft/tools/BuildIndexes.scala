package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{LlmOps, PipelineOps}

/** PRODUCTION index build — the one command a deployment runs once per
  * corpus snapshot, so every later query/ingest reads the persisted
  * artifacts through the `...From` entry points instead of recomputing
  * them in-query (VERDICT r14 ask #4; the registry entries recompute
  * in-query only because the correctness gate runs each query in
  * isolation — PersistedIndexSpec pins every read path ≡ its in-query
  * form on these exact tables).
  *
  * Artifacts written (each a bucketed table under the output warehouse,
  * bucket key = the key its consumers join on):
  *
  * | table            | artifact                      | consumers        |
  * |------------------|-------------------------------|------------------|
  * | corpus_fp        | md5 fingerprints (i1)         | i25/i45/i72      |
  * | corpus_sets      | hashed token sets (i2 sketch) | i36 verify side  |
  * | corpus_bands     | minhash band table (i14)      | i36 screen       |
  * | corpus_grams     | distinct gram hashes (i41)    | i41 ingest       |
  * | truth_pairs      | exact-pair stats at θ=0.7     | i98/i71/i75/CC   |
  * | coarse_assign    | IVF coarse assignment         | i42/i43/i46      |
  * | coarse_codebook  | the (cid, cemb) codebook      | routing/probes   |
  * | pq_cent          | per-block PQ codebooks        | i39/i42/i44      |
  * | pq_codes         | PQ codes per vector           | i42/i44          |
  * | pack_state       | 1-row total-token scalar      | i52 ingest       |
  * | dsir_counts      | per-bigram (cs, ct) counts    | i62 ingest/score |
  * | bpe_merges       | trained BPE merge list        | tokenizer apply  |
  * | pca_direction    | dominant PCA direction        | projection/eval  |
  * | route_supers     | trained stage-1 supers (only  | IngestBatch      |
  * |                  |  with --trained-routing)      |  same-router law |
  *
  * Bucketing note: bucket metadata lives in the session catalog; in this
  * offline build the warehouse directory is the artifact (a deployment
  * with a shared metastore keeps the zero-Exchange co-located plans
  * across sessions; reading the parquet paths directly stays
  * output-identical, just re-shuffles). The `--measure` flag times each
  * read path against its in-query form in the SAME session and appends
  * the comparison to the manifest — the build-once vs read-path evidence
  * BASELINE.md records at sf1.
  *
  * Usage: BuildIndexes <sfDir> <outDir> [--measure] [--trained-routing]
  */
object BuildIndexes {
  def main(args: Array[String]): Unit = {
    // Health stamps bracket the run so a build wall measured through a
    // host-pressure episode self-flags in the manifest (VERDICT r17 #2).
    val healthStart = graft.HealthStamp.json()
    val dir = args(0)
    val outDir = args(1)
    val measure = args.contains("--measure")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir", outDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$dir/documents.parquet").localCheckpoint(true)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").localCheckpoint(true)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val built = scala.collection.mutable.ArrayBuffer.empty[String]
    def write(name: String, df: DataFrame, bucketCols: Seq[String]): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      rmrf(new java.io.File(s"$outDir/$name"))
      val (_, sec) = timed {
        val w = df.write.format("parquet").mode("overwrite")
        (if (bucketCols.nonEmpty)
          w.bucketBy(8, bucketCols.head, bucketCols.tail: _*)
            .sortBy(bucketCols.head, bucketCols.tail: _*)
        else w).saveAsTable(name)
      }
      val rows = spark.table(name).count()
      built += s"""{"table":"$name","rows":$rows,"build_sec":$sec}"""
      println(s"[build-indexes] $name: $rows rows in ${f"$sec%.1f"}s")
    }

    // Dedup-side artifacts.
    write("corpus_fp",
      docs.select(col("doc_id"), md5(col("text")).as("fp")), Seq("fp"))
    val sets = LlmOps.hashedTokenSets(docs).localCheckpoint(true)
    write("corpus_sets", sets, Seq("doc_id"))
    write("corpus_bands", PipelineOps.minhashBands(sets),
      Seq("b", "v", "source"))
    write("corpus_grams",
      PipelineOps.gramOcc(docs, 5).select(col("g")).distinct(), Seq("g"))
    write("truth_pairs", LlmOps.pairStats(docs, 7), Seq("doc_id1", "doc_id2"))

    // ANN-side artifacts: coarse assignment at the production scaledK
    // (two-level routed at k >= hierRouteMin), plus the PQ pair.
    // --trained-routing opts into trained supers (RouteEval: +15 pp
    // agreement and half the bucket skew at sf1 k=80 vs stub supers —
    // the training cost amortizes into the build, which is exactly
    // where a deployment should pay it).
    val trainedRouting = args.contains("--trained-routing")
    val k = PipelineOps.scaledK(emb)
    val coarse = PipelineOps.stubCodebook(emb, k).localCheckpoint(true)
    write("coarse_codebook", coarse, Seq())
    // A trained build PERSISTS its stage-1 supers (route_supers, the
    // 14th artifact) and the manifest records the router, so IngestBatch
    // can route a later batch with the build's EXACT router — without
    // it an ingest into a trained base silently mixes two routing
    // semantics in one merged coarse_assign and the additivity law
    // breaks (VERDICT r16 ask #2). A stub build removes any stale
    // route_supers so artifact presence always equals manifest truth.
    val useTrained = trainedRouting && k >= PipelineOps.hierRouteMin
    val assigned =
      if (useTrained) {
        val supers = PipelineOps.trainRoutingSupers(coarse, k)
        write("route_supers", supers, Seq())
        PipelineOps.assignToCentroidsTwoLevelFromSupers(emb, coarse, supers, k)
      } else {
        spark.sql("DROP TABLE IF EXISTS route_supers")
        rmrf(new java.io.File(s"$outDir/route_supers"))
        PipelineOps.assignToCentroids(emb, coarse, k)
      }
    write("coarse_assign", assigned.select(col("vec_id"), col("cid")),
      Seq("vec_id"))
    val sub = PipelineOps.pqBlocks(emb, nBlocks = 4, blockDim = 16)
      .localCheckpoint(true)
    val pqCent = PipelineOps.pqTrainStep(
      sub, PipelineOps.pqStubCodebook(sub, 8)).localCheckpoint(true)
    write("pq_cent", pqCent, Seq())
    write("pq_codes",
      PipelineOps.pqAssign(sub, pqCent)
        .select(col("vec_id"), col("b"), col("cid").as("pcid")), Seq("vec_id"))

    // Pack-state scalar (i52's prefix-additivity anchor).
    write("pack_state",
      docs.agg(coalesce(sum(size(split(col("text"), " ")).cast("long")),
        lit(0L)).as("base_tok")), Seq())

    // DSIR count state (i62's additive artifact): per-bigram corpus and
    // target-language counts, bucketed on the 8-byte hash the score
    // join keys on. Counts, not ratios — counts are what an ingest can
    // merge by sum (dsirStateFromCounts derives the scoring state).
    write("dsir_counts", PipelineOps.dsirCounts(docs), Seq("bk"))

    // Trained artifacts (r15 trainer loops): the BPE merge list in
    // training order and the corpus's dominant PCA direction — both
    // dimension-sized tables a deployment reads back instead of
    // re-training per job.
    val (bpe, _) = PipelineOps.trainBpeMerges(docs, nMerges = 16)
    write("bpe_merges",
      spark.createDataFrame(bpe.zipWithIndex.map { case (p, i) =>
        (i.toLong, p) }).toDF("merge_idx", "pair"), Seq())
    val pca = PipelineOps.trainPcaDirection(emb)
    write("pca_direction",
      spark.createDataFrame(pca.zipWithIndex.map { case (x, i) =>
        (i.toLong, x) }).toDF("pos", "v"), Seq())

    // Read-path measurement: persisted-artifact form vs in-query form,
    // same session, noop-drained (the Bench rule).
    val measured = if (!measure) Seq() else {
      def drain(df: DataFrame): Double =
        timed(df.write.format("noop").mode("overwrite").save())._2
      val truth = spark.table("truth_pairs")
      val lsh = PipelineOps.bandCandidates(PipelineOps.minhashSig(docs))
        .withColumn("is_cand", lit(1L))
      val i98From = drain(PipelineOps.lshRecallSweep(truth, lsh))
      val i98In = drain(PipelineOps.lshRecallSweep(
        LlmOps.pairStats(docs, 7), lsh))
      val i71From = drain(PipelineOps.minhashEstimate(
        LlmOps.nearDupPairsFrom(truth), PipelineOps.minhashSig(docs)))
      val i71In = drain(PipelineOps.minhashEstimate(
        LlmOps.nearDupPairs(docs), PipelineOps.minhashSig(docs)))
      val ccFrom = drain(LlmOps.nearDupPairsFrom(truth))
      val ccIn = drain(LlmOps.nearDupPairs(docs))
      Seq(
        s"""{"path":"i98_sweep","from_artifact_sec":$i98From,"in_query_sec":$i98In}""",
        s"""{"path":"i71_estimate","from_artifact_sec":$i71From,"in_query_sec":$i71In}""",
        s"""{"path":"cc_pairs","from_artifact_sec":$ccFrom,"in_query_sec":$ccIn}""")
    }

    // Manifest name carries the corpus tag (sanitized sfDir basename):
    // two builds into the same outDir from different corpora keep
    // distinct manifests instead of silently overwriting (ADVICE r15).
    val tag = java.nio.file.Paths.get(dir).getFileName.toString
      .replaceAll("[^A-Za-z0-9._-]", "_")
    val line = s"""{"sf_dir":"$dir","out_dir":"$outDir",""" +
      s""""trained_routing":$useTrained,""" +
      s""""artifacts":${built.mkString("[", ",", "]")},""" +
      s""""read_paths":${measured.mkString("[", ",", "]")},""" +
      s""""health_start":$healthStart,"health_end":${graft.HealthStamp.json()}}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/manifest_$tag.json"), line + "\n")
    spark.stop()
  }

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(rmrf)
    f.delete(): Unit
  }
}
