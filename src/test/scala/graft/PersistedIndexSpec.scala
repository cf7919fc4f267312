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
