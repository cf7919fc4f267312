package graft

import org.apache.spark.sql.functions._
import graft.operators.{LlmOps, PipelineOps}

/** The persisted-index premise, turned into pinned plans: i36/i41/i42
  * document that a real ingest reads the PERSISTED corpus band / gram /
  * code tables instead of recomputing them per query (registry entries
  * recompute in-query only because the correctness gate runs each query
  * in isolation). Here those tables are written ONCE, bucketed on their
  * join keys (`bucketBy(8, key).sortBy(key)` — the BucketSpec
  * machinery), and each family's `...From` entry point reads them back
  * with ZERO Exchange on the bucketed side and zero corpus
  * re-tokenization, asserted output-identical to the in-query forms.
  * One write-time shuffle amortizes over every later ingest batch — the
  * 100 TB contract the operator docs claim.
  */
class PersistedIndexSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private val boundary = 400L

  /** Idempotent setup shared by every test (the BucketSpec rule: the
    * in-memory catalog dies with the JVM but the warehouse directory
    * survives, so DROP + rmrf before each saveAsTable).
    */
  private lazy val persistedTables: Unit = {
    Seq("corpus_sets_pt", "corpus_bands_pt", "corpus_grams_pt",
      "coarse_assign_pt", "pq_codes_pt", "pq_cent_pt",
      "truth_pairs_pt").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      rmrf(new java.io.File(s"/tmp/graft-test-warehouse/$tbl"))
    }
    val docs = Tables.load(spark, dir, "documents")
    // Exact-pair truth table at the loosest swept θ (0.7) — nested truth
    // sets make this ONE artifact serve i98's sweep, i71's calibration,
    // i75's banding eval and the CC family's θ=0.9 input (r15 ask #3).
    // Bucketed on the full pair key: every consumer joins on exactly
    // (doc_id1, doc_id2).
    LlmOps.pairStats(docs, 7).write.format("parquet")
      .bucketBy(8, "doc_id1", "doc_id2").sortBy("doc_id1", "doc_id2")
      .mode("overwrite").saveAsTable("truth_pairs_pt")
    val corpusSets = LlmOps.hashedTokenSets(
      docs.filter(col("doc_id") < boundary)).localCheckpoint(true)
    // Sketch table (the i2 artifact): verify joins probe it by doc id.
    corpusSets.write.format("parquet")
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("corpus_sets_pt")
    // Band table (the i14 artifact): the screen always equi-joins on
    // exactly (b, v, source), and Spark's default co-partition rule
    // (requireAllClusterKeysForCoPartition) only reuses a bucketing
    // that covers ALL join keys — so the bucket key is the full screen
    // key, not v alone.
    PipelineOps.minhashBands(corpusSets).write.format("parquet")
      .bucketBy(8, "b", "v", "source").sortBy("b", "v", "source")
      .mode("overwrite").saveAsTable("corpus_bands_pt")
    // Distinct corpus gram set (the i41 artifact), bucketed on the
    // 8-byte gram hash the semi-join keys on.
    PipelineOps.gramOcc(docs.filter(col("doc_id") < boundary), 5)
      .select(col("g")).distinct().write.format("parquet")
      .bucketBy(8, "g").sortBy("g")
      .mode("overwrite").saveAsTable("corpus_grams_pt")
    // The two i42 index tables, co-bucketed on vec_id so the probe
    // semi-join is a zero-shuffle co-located join; plus the per-block
    // codebooks (a dimension — no bucketing needed).
    val emb = Tables.load(spark, dir, "embeddings")
    val coarse = PipelineOps.stubCodebook(emb, 8)
    PipelineOps.assignToCentroids(emb, coarse)
      .select(col("vec_id"), col("cid")).write.format("parquet")
      .bucketBy(8, "vec_id").sortBy("vec_id")
      .mode("overwrite").saveAsTable("coarse_assign_pt")
    val sub = PipelineOps.pqBlocks(emb, nBlocks = 4, blockDim = 16)
      .localCheckpoint(true)
    val cent = PipelineOps.pqTrainStep(
      sub, PipelineOps.pqStubCodebook(sub, 8)).localCheckpoint(true)
    cent.write.format("parquet").mode("overwrite").saveAsTable("pq_cent_pt")
    PipelineOps.pqAssign(sub, cent)
      .select(col("vec_id"), col("b"), col("cid").as("pcid"))
      .write.format("parquet")
      .bucketBy(8, "vec_id").sortBy("vec_id")
      .mode("overwrite").saveAsTable("pq_codes_pt")
  }

  test("i36 ingest over persisted band/sketch tables == in-query; screen keeps the bucket side unshuffled") {
    persistedTables
    val docs = Tables.load(spark, dir, "documents")
    val batchSets = LlmOps.hashedTokenSets(
      docs.filter(col("doc_id") >= boundary))
    val fromPersisted = LlmOps.nearDedupIncrementalFrom(
      spark.table("corpus_sets_pt"), spark.table("corpus_bands_pt"),
      batchSets).orderBy("doc_id")
    assertSameRows(fromPersisted,
      Registry.byId("i36_near_dedup_incremental").build(spark, dir))
    // The band screen in isolation: a checkpointed batch band table
    // joining the bucketed corpus bands on (b, v, source) must shuffle
    // ONLY the batch side — the corpus side's bucketing on the full
    // screen key satisfies the join's co-partition requirement.
    withBroadcastDisabled {
      val batchBands = PipelineOps.minhashBands(batchSets)
        .localCheckpoint(true)
      val screen = batchBands.alias("p")
        .join(spark.table("corpus_bands_pt").alias("c"),
          col("p.b") === col("c.b") && col("p.v") === col("c.v") &&
            col("p.source") === col("c.source"))
        .select(col("c.doc_id"))
      val p = screen.queryExecution.executedPlan.toString
      val n = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(n == 1,
        s"screen must shuffle the batch side only (1 Exchange), got $n:\n$p")
      assert(screen.count() > 0, "screen must be non-vacuous at sf0.001")
    }
  }

  test("i41 ingest over the persisted gram table == in-query; semi-join keeps the bucket side unshuffled") {
    persistedTables
    val docs = Tables.load(spark, dir, "documents")
    val fromPersisted = PipelineOps.repeatGramsIncrementalFrom(
      docs.filter(col("doc_id") >= boundary),
      spark.table("corpus_grams_pt"), 5)
    assertSameRows(fromPersisted,
      PipelineOps.repeatGramsIncremental(docs, boundary, 5))
    // The corpus-gram screen in isolation: the bucketed gram table's
    // side of the semi-join must not re-shuffle (its bucketing on g IS
    // the join distribution) and corpus text is never re-tokenized —
    // the only documents scan in the persisted form is the batch side.
    withBroadcastDisabled {
      val batchOcc = PipelineOps.gramOcc(
          docs.filter(col("doc_id") >= boundary), 5)
        .localCheckpoint(true)
      val screen = batchOcc
        .join(spark.table("corpus_grams_pt"), Seq("g"), "left_semi")
      val p = screen.queryExecution.executedPlan.toString
      val n = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(n == 1,
        s"gram screen must shuffle the batch side only (1 Exchange), got $n:\n$p")
      assert(screen.count() > 0, "gram screen must be non-vacuous at sf0.001")
    }
    val full = PipelineOps.repeatGramsIncrementalFrom(
      docs.filter(col("doc_id") >= boundary),
      spark.table("corpus_grams_pt"), 5)
    val pf = full.queryExecution.executedPlan.toString
    assert(!pf.contains("documents.parquet") ||
      "documents\\.parquet".r.findAllIn(pf).size <= 1,
      s"persisted form must not re-tokenize corpus text:\n$pf")
  }

  test("i42 read path over co-bucketed index tables: ZERO hash Exchange, same top-10") {
    persistedTables
    val emb = Tables.load(spark, dir, "embeddings")
    val coarse = PipelineOps.stubCodebook(emb, 8)
    val res = PipelineOps.ivfPqSearch(emb, coarse,
      spark.table("pq_cent_pt"),
      spark.table("coarse_assign_pt"),
      spark.table("pq_codes_pt"))
    assertSameRows(res, Registry.byId("i42_ann_ivf_pq").build(spark, dir))
    // assigned and codes are co-bucketed on vec_id: the probe filter
    // rides the broadcast probe list, the semi-join is co-located, and
    // the ADC pivot groups on the bucket key — the whole read path
    // plans without a single hash Exchange, and the top-10 is a
    // TakeOrderedAndProject. This IS the production index-read plan.
    val p = res.queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(n == 0, s"index read path must plan zero hash Exchange, got $n:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$p")
  }

  test("truth-table read paths: i98/i71/i75/CC inputs from truth_pairs_pt == in-query; outer join keeps the bucket side unshuffled") {
    persistedTables
    val docs = Tables.load(spark, dir, "documents")
    val truth = spark.table("truth_pairs_pt")
    // The CC family's θ=0.9 input derives by integer filter + row-local
    // jaccard — no candidate join, no tokenization.
    assertSameRows(LlmOps.nearDupPairsFrom(truth), LlmOps.nearDupPairs(docs))
    // i98's sweep over the persisted truth == the in-query registry row.
    val lsh = PipelineOps.bandCandidates(PipelineOps.minhashSig(docs))
      .withColumn("is_cand", lit(1L))
    assertSameRows(PipelineOps.lshRecallSweep(truth, lsh),
      Registry.byId("i98_lsh_recall_sweep").build(spark, dir))
    // i71's calibration over truth-derived pairs == in-query.
    assertSameRows(
      PipelineOps.minhashEstimate(LlmOps.nearDupPairsFrom(truth),
        PipelineOps.minhashSig(docs)),
      Registry.byId("i71_minhash_estimate").build(spark, dir))
    // i75's banding eval over the truth-derived exact set == in-query.
    val exactFrom = truth.filter(col("inter") * 10 >= col("un") * 9)
      .select(col("doc_id1"), col("doc_id2")).withColumn("is_true", lit(1L))
    assertSameRows(PipelineOps.lshEval(lsh.localCheckpoint(true), exactFrom),
      Registry.byId("i75_lsh_eval").build(spark, dir))
    // Exchange pin: the i75 outer join on the FULL pair key must shuffle
    // only the candidate side — the truth table's bucketing on
    // (doc_id1, doc_id2) satisfies the join's co-partition requirement
    // through the filter/flag projection.
    withBroadcastDisabled {
      val candCk = PipelineOps.bandCandidates(PipelineOps.minhashSig(docs))
        .withColumn("is_cand", lit(1L)).localCheckpoint(true)
      val j = candCk.join(exactFrom, Seq("doc_id1", "doc_id2"), "full_outer")
      val p = j.queryExecution.executedPlan.toString
      val n = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(n == 1,
        s"truth side must stay unshuffled (1 Exchange for the cand side), got $n:\n$p")
      assert(j.count() > 0)
    }
  }

  test("truth-table INGEST additivity: pairStats(all) == pairStats(corpus) UNION ingest(persisted sets, batch)") {
    persistedTables
    val docs = Tables.load(spark, dir, "documents")
    val batchSets = LlmOps.hashedTokenSets(docs.filter(col("doc_id") >= boundary))
    // The daily-crawl append: batch-touching truth pairs derived against
    // the PERSISTED corpus sketch table — the corpus×corpus join (the
    // expensive build) is never re-run.
    val ingested = LlmOps.pairStatsIngest(
      spark.table("corpus_sets_pt"), batchSets, 7)
    assert(ingested.count() > 0, "ingest must be non-vacuous at sf0.001")
    val corpusOnly = LlmOps.pairStats(docs.filter(col("doc_id") < boundary), 7)
    assertSameRows(corpusOnly.unionByName(ingested), LlmOps.pairStats(docs, 7))
    // The partition is exact: no pair appears on both sides.
    assert(corpusOnly.join(ingested, Seq("doc_id1", "doc_id2"), "inner")
      .count() == 0)
  }

  test("trained-routing read path: probe membership + ADC integer agreement over the trained coarse_assign; top-3 graded on the same probe plan") {
    // The BuildIndexes --trained-routing artifact, law-covered instead
    // of only RouteEval-graded (r15 ask #4). The trained assignment is
    // persisted exactly as the build writes it ((vec_id, cid), bucketed
    // on vec_id), then: (a) i42's probe-membership law holds over it —
    // every result's TRAINED cid is one of the query's nprobe nearest
    // coarse centroids; (b) adc_q agrees integer-for-integer with the
    // unrestricted i39 ranking wherever they overlap (routing changes
    // WHICH vectors are candidates, never their ADC distance); (c) the
    // read path is output-identical to the in-query trained form; and
    // (d) annBatchTop3Assigned grades the persisted table on the same
    // probe plan the stub assignment is graded on — the Assigned split
    // exists for exactly this.
    import spark.implicits._
    persistedTables
    val emb = Tables.load(spark, dir, "embeddings")
    val coarse = PipelineOps.stubCodebook(emb, 8).localCheckpoint(true)
    spark.sql("DROP TABLE IF EXISTS coarse_assign_trained_pt")
    rmrf(new java.io.File("/tmp/graft-test-warehouse/coarse_assign_trained_pt"))
    val trainedInQuery = PipelineOps.assignToCentroidsTwoLevelTrained(
      emb, coarse, 8).localCheckpoint(true)
    trainedInQuery.select(col("vec_id"), col("cid")).write.format("parquet")
      .bucketBy(8, "vec_id").sortBy("vec_id")
      .mode("overwrite").saveAsTable("coarse_assign_trained_pt")
    val assignedT = spark.table("coarse_assign_trained_pt")
    // (c) the persisted table IS the in-query assignment.
    assertSameRows(assignedT,
      trainedInQuery.select(col("vec_id"), col("cid")))
    val res = PipelineOps.ivfPqSearch(emb, coarse,
      spark.table("pq_cent_pt"), assignedT, spark.table("pq_codes_pt"))
      .as[(Long, Long)].collect()
    assert(res.nonEmpty && res.length <= 10)
    // (a) probe membership under the TRAINED assignment.
    val cidOf = assignedT.as[(Long, Long)].collect().toMap
    val cents = emb.filter(col("vec_id") < 8)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val qv = emb.filter(col("vec_id") === 0)
      .select("embedding").as[Seq[Float]].head()
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    val probes = cents
      .map { case (cid, ce) =>
        (BigDecimal(dot(qv, ce))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, cid) }
      .sortBy { case (d, cid) => (-d, cid) }.take(2).map(_._2).toSet
    res.foreach { case (v, _) =>
      assert(probes(cidOf(v)),
        s"vec $v (trained cluster ${cidOf(v)}) outside probed clusters $probes")
    }
    // (b) ADC integer agreement with the unrestricted i39 ranking.
    val i39 = Registry.byId("i39_ann_pq_adc").build(spark, dir)
      .as[(Long, Long)].collect().toMap
    val shared = res.filter { case (v, _) => i39.contains(v) }
    assert(shared.nonEmpty, "trained i42 and i39 tops must overlap here")
    shared.foreach { case (v, a) =>
      assert(i39(v) == a, s"vec $v: trained-path adc_q=$a i39=${i39(v)}")
    }
    // (d) the batch-ANN probe plan grades the persisted trained table.
    val q = PipelineOps.queryBatch(emb, 5)
    val gradedFromTable = PipelineOps.annBatchTop3Assigned(
      assignedT.join(emb, Seq("vec_id")), coarse, q, nprobe = 2)
    assertSameRows(gradedFromTable,
      PipelineOps.annBatchTop3Assigned(trainedInQuery, coarse, q, nprobe = 2))
    val perQid = gradedFromTable.groupBy(col("qid")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(perQid.size == 5 && perQid.values.forall(_ == 3L),
      s"every query must grade a full top-3: $perQid")
  }

  test("full-lifecycle ingest additivity: build(corpus ∪ batch) == base ∪ IngestBatch.deltas, per artifact") {
    // The daily-crawl composition (r15 ask #3), asserted through the
    // SAME code path graft.tools.IngestBatch runs: every artifact's
    // delta, unioned onto its corpus-side base, equals the artifact
    // built over corpus ∪ batch. The ANN families hold under the FIXED
    // persisted codebooks (the annIndexIngest never-retrain contract;
    // on this fixture the union build's codebooks coincide — k = 8 on
    // both sides of the split and every centroid/seed id < boundary —
    // so the equality is the full build(union) one, not just the
    // fixed-codebook half).
    import graft.tools.IngestBatch
    val docs = Tables.load(spark, dir, "documents")
    val emb = Tables.load(spark, dir, "embeddings")
    val cd = docs.filter(col("doc_id") < boundary)
    val bd = docs.filter(col("doc_id") >= boundary)
    val ce = emb.filter(col("vec_id") < boundary)
    val be = emb.filter(col("vec_id") >= boundary)
    val k = PipelineOps.scaledK(emb)
    assert(PipelineOps.scaledK(ce) == k,
      "fixture must keep corpus and union on the same scaledK rung")
    val corpusSets = LlmOps.hashedTokenSets(cd).localCheckpoint(true)
    val corpusGrams = PipelineOps.gramOcc(cd, 5).select(col("g")).distinct()
      .localCheckpoint(true)
    val cb = PipelineOps.stubCodebook(ce, k).localCheckpoint(true)
    val sub = PipelineOps.pqBlocks(ce, nBlocks = 4, blockDim = 16)
      .localCheckpoint(true)
    val pqCent = PipelineOps.pqTrainStep(
      sub, PipelineOps.pqStubCodebook(sub, 8)).localCheckpoint(true)
    val d = IngestBatch.deltas(corpusSets, corpusGrams, cb, pqCent, bd, be)
      .toMap
    assert(d.keySet == IngestBatch.bucketKeys.keySet,
      "one delta per artifact family")

    def fp(x: org.apache.spark.sql.DataFrame) =
      x.select(col("doc_id"), md5(col("text")).as("fp"))
    assertSameRows(fp(cd).unionByName(d("corpus_fp")), fp(docs))
    assertSameRows(corpusSets.unionByName(d("corpus_sets")),
      LlmOps.hashedTokenSets(docs))
    assertSameRows(
      PipelineOps.minhashBands(corpusSets).unionByName(d("corpus_bands")),
      PipelineOps.minhashBands(LlmOps.hashedTokenSets(docs)))
    assert(d("corpus_grams").count() > 0, "batch must add new grams here")
    assertSameRows(corpusGrams.unionByName(d("corpus_grams")),
      PipelineOps.gramOcc(docs, 5).select(col("g")).distinct())
    assertSameRows(LlmOps.pairStats(cd, 7).unionByName(d("truth_pairs")),
      LlmOps.pairStats(docs, 7))

    // ANN: union-build equality (codebooks coincide on this fixture).
    def ca(e: org.apache.spark.sql.DataFrame) =
      PipelineOps.assignToCentroids(e, PipelineOps.stubCodebook(e, k), k)
        .select(col("vec_id"), col("cid"))
    assertSameRows(
      PipelineOps.assignToCentroids(ce, cb, k).select(col("vec_id"), col("cid"))
        .unionByName(d("coarse_assign")),
      ca(emb))
    def codes(s: org.apache.spark.sql.DataFrame) =
      PipelineOps.pqAssign(s, pqCent)
        .select(col("vec_id"), col("b"), col("cid").as("pcid"))
    assertSameRows(codes(sub).unionByName(d("pq_codes")),
      codes(PipelineOps.pqBlocks(emb, nBlocks = 4, blockDim = 16)))

    // Scalar sum (i52) and count-merge (i62) families.
    def tok(x: org.apache.spark.sql.DataFrame): Long =
      x.agg(coalesce(sum(size(split(col("text"), " ")).cast("long")), lit(0L)))
        .head.getLong(0)
    assert(tok(cd) + d("pack_state").head.getLong(0) == tok(docs))
    val merged = PipelineOps.dsirMergeCounts(
      PipelineOps.dsirCounts(cd), d("dsir_counts"))
    assertSameRows(merged, PipelineOps.dsirCounts(docs))
    // ...and the derived scoring state is the direct one: the batch
    // scores identically against merge-derived and rebuilt state.
    val (r1, c1) = PipelineOps.dsirStateFromCounts(merged)
    val (r2, c2) = PipelineOps.dsirState(docs)
    assertSameRows(PipelineOps.dsirScoreAgainst(bd, r1, c1),
      PipelineOps.dsirScoreAgainst(bd, r2, c2))
  }

  test("sequential ingest: two day-batches through deltas + merge-on-read == one build over everything") {
    // The multi-segment (LSM) half of the lifecycle: day-2's deltas are
    // computed against the MERGED day-1 state (sets for the truth
    // candidate join, grams for the new-gram anti-join), and
    // IngestBatch.merged over (base, delta1, delta2) equals the
    // artifact built over corpus ∪ batch1 ∪ batch2 — i.e.
    // ingest(ingest(build(c), b1), b2) ≡ build(c ∪ b1 ∪ b2), the law
    // that makes a daily cadence sound without ever compacting.
    import graft.tools.IngestBatch
    val docs = Tables.load(spark, dir, "documents")
    val emb = Tables.load(spark, dir, "embeddings")
    val cd = docs.filter(col("doc_id") < 300)
    val b1 = docs.filter(col("doc_id") >= 300 && col("doc_id") < boundary)
    val b2 = docs.filter(col("doc_id") >= boundary)
    val ce = emb.filter(col("vec_id") < 300)
    val e1 = emb.filter(col("vec_id") >= 300 && col("vec_id") < boundary)
    val e2 = emb.filter(col("vec_id") >= boundary)
    val k = PipelineOps.scaledK(emb)
    val cb = PipelineOps.stubCodebook(ce, k).localCheckpoint(true)
    val sub = PipelineOps.pqBlocks(ce, nBlocks = 4, blockDim = 16)
      .localCheckpoint(true)
    val pqCent = PipelineOps.pqTrainStep(
      sub, PipelineOps.pqStubCodebook(sub, 8)).localCheckpoint(true)
    val sets0 = LlmOps.hashedTokenSets(cd).localCheckpoint(true)
    val grams0 = PipelineOps.gramOcc(cd, 5).select(col("g")).distinct()
      .localCheckpoint(true)
    val d1 = IngestBatch.deltas(sets0, grams0, cb, pqCent, b1, e1).toMap
    val sets1 = IngestBatch.merged("corpus_sets", sets0,
      Seq(d1("corpus_sets"))).localCheckpoint(true)
    val grams1 = IngestBatch.merged("corpus_grams", grams0,
      Seq(d1("corpus_grams"))).localCheckpoint(true)
    val d2 = IngestBatch.deltas(sets1, grams1, cb, pqCent, b2, e2).toMap
    def m2(name: String, base: org.apache.spark.sql.DataFrame) =
      IngestBatch.merged(name, base, Seq(d1(name), d2(name)))
    assertSameRows(m2("truth_pairs", LlmOps.pairStats(cd, 7)),
      LlmOps.pairStats(docs, 7))
    assertSameRows(m2("corpus_grams", grams0),
      PipelineOps.gramOcc(docs, 5).select(col("g")).distinct())
    assertSameRows(m2("corpus_sets", sets0), LlmOps.hashedTokenSets(docs))
    def tok(x: org.apache.spark.sql.DataFrame) =
      x.agg(coalesce(sum(size(split(col("text"), " ")).cast("long")), lit(0L))
        .as("base_tok"))
    assert(m2("pack_state", tok(cd)).head.getLong(0) ==
      tok(docs).head.getLong(0))
    val (r1, c1) = PipelineOps.dsirStateFromCounts(
      m2("dsir_counts", PipelineOps.dsirCounts(cd)))
    val (r2, c2) = PipelineOps.dsirState(docs)
    assertSameRows(PipelineOps.dsirScoreAgainst(b2, r1, c1),
      PipelineOps.dsirScoreAgainst(b2, r2, c2))
  }

  test("trained-routing ingest additivity: the batch routes through the SAME persisted supers as the base") {
    // VERDICT r16 ask #2, the ingest half: a --trained-routing base
    // persists its stage-1 supers (route_supers), and IngestBatch.deltas
    // routes the batch with them — so build(corpus ∪ batch) ≡ base ∪
    // delta holds on a TRAINED base through the tool's own code path,
    // exactly as the stub-base case above. k = 64 (>= hierRouteMin)
    // puts both sides on the two-level router where stub and trained
    // actually diverge.
    import graft.tools.IngestBatch
    val docs = Tables.load(spark, dir, "documents")
    val emb = Tables.load(spark, dir, "embeddings")
    val cd = docs.filter(col("doc_id") < boundary)
    val bd = docs.filter(col("doc_id") >= boundary)
    val ce = emb.filter(col("vec_id") < boundary)
    val be = emb.filter(col("vec_id") >= boundary)
    val k = 64
    val cb = PipelineOps.stubCodebook(ce, k).localCheckpoint(true)
    // The "persisted" router: trained once from the base build's
    // codebook (what BuildIndexes writes as route_supers and the ingest
    // reads back) — NOT retrained on ingest.
    val sup = PipelineOps.trainRoutingSupers(cb, k)
    val sub = PipelineOps.pqBlocks(ce, nBlocks = 4, blockDim = 16)
      .localCheckpoint(true)
    val pqCent = PipelineOps.pqTrainStep(
      sub, PipelineOps.pqStubCodebook(sub, 8)).localCheckpoint(true)
    val corpusSets = LlmOps.hashedTokenSets(cd).localCheckpoint(true)
    val corpusGrams = PipelineOps.gramOcc(cd, 5).select(col("g")).distinct()
      .localCheckpoint(true)
    val d = IngestBatch.deltas(corpusSets, corpusGrams, cb, pqCent,
      bd, be, routeSupers = Some(sup)).toMap
    def trainedAssign(e: org.apache.spark.sql.DataFrame) =
      PipelineOps.assignToCentroidsTwoLevelFromSupers(e, cb, sup, k)
        .select(col("vec_id"), col("cid"))
    // The delta IS the trained routing of the batch...
    assertSameRows(d("coarse_assign"), trainedAssign(be))
    // ...and base ∪ delta equals the trained union build.
    assertSameRows(trainedAssign(ce).unionByName(d("coarse_assign")),
      trainedAssign(emb))
    // Non-vacuity: on this fixture the trained router disagrees with
    // the stub router somewhere on the batch — so a deltas() that
    // silently ignored routeSupers (the r16 defect) would FAIL the
    // equality above instead of passing by coincidence.
    val stubAssign = PipelineOps.assignToCentroids(be, cb, k)
      .select(col("vec_id"), col("cid").as("scid"))
    assert(d("coarse_assign").join(stubAssign, "vec_id")
      .filter(col("cid") =!= col("scid")).count() > 0,
      "fixture must distinguish trained from stub routing")
  }

  test("compaction: readMerged before == after, delta segments consumed, idempotent, bucketed rewrite") {
    // VERDICT r16 ask #4 — the LSM's compaction half. One artifact per
    // merge rule: per-row union (corpus_fp), scalar sum (pack_state),
    // count-merge (dsir_counts). Law: readMerged is invariant across
    // compaction, every __delta_ segment is consumed, a second run is a
    // no-op rewrite, and the rewritten base is a bucketed table (its
    // bucket-key aggregate plans zero Exchange in-session).
    import graft.tools.IngestBatch
    val indexDir = "/tmp/graft-test-compact"
    rmrf(new java.io.File(indexDir))
    new java.io.File(indexDir).mkdirs()
    val docs = Tables.load(spark, dir, "documents")
    def fp(x: org.apache.spark.sql.DataFrame) =
      x.select(col("doc_id"), md5(col("text")).as("fp"))
    def tok(x: org.apache.spark.sql.DataFrame) =
      x.agg(coalesce(sum(size(split(col("text"), " ")).cast("long")),
        lit(0L)).as("base_tok"))
    val cd = docs.filter(col("doc_id") < 300)
    val b1 = docs.filter(col("doc_id") >= 300 && col("doc_id") < boundary)
    val b2 = docs.filter(col("doc_id") >= boundary)
    fp(cd).write.parquet(s"$indexDir/corpus_fp")
    fp(b1).write.parquet(s"$indexDir/corpus_fp__delta_d1")
    fp(b2).write.parquet(s"$indexDir/corpus_fp__delta_d2")
    tok(cd).write.parquet(s"$indexDir/pack_state")
    tok(b1).write.parquet(s"$indexDir/pack_state__delta_d1")
    PipelineOps.dsirCounts(cd).write.parquet(s"$indexDir/dsir_counts")
    PipelineOps.dsirCounts(b1.unionByName(b2))
      .write.parquet(s"$indexDir/dsir_counts__delta_d1")
    val names = Seq("corpus_fp", "pack_state", "dsir_counts")
    val before = names.map(n =>
      n -> IngestBatch.readMerged(spark, indexDir, n).localCheckpoint(true))
    def deltaSegs() = new java.io.File(indexDir).listFiles()
      .count(f => f.getName.contains("__delta_"))
    assert(deltaSegs() == 4)
    IngestBatch.compactIndex(spark, indexDir)
    assert(deltaSegs() == 0, "every delta segment must be consumed")
    before.foreach { case (n, b) =>
      assertSameRows(IngestBatch.readMerged(spark, indexDir, n), b)
    }
    // The rewrite is a real bucketed table: grouping on the bucket key
    // reuses the bucketing (zero Exchange) in the compacting session.
    val p = spark.table("corpus_fp").groupBy(col("fp"))
      .agg(count(lit(1))).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucket-key aggregate over the compacted base must not shuffle:\n$p")
    // Idempotent: a second compaction changes nothing.
    IngestBatch.compactIndex(spark, indexDir)
    assert(deltaSegs() == 0)
    before.foreach { case (n, b) =>
      assertSameRows(IngestBatch.readMerged(spark, indexDir, n), b)
    }
  }

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(rmrf)
    f.delete(): Unit
  }

  private def withBroadcastDisabled(body: => Unit): Unit = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, old)
  }
}
