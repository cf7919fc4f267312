package graft

import org.apache.spark.sql.DataFrame
import graft.operators.EnvelopeOps

/** Physical-plan shape assertions — the 100 TB properties the correctness
  * oracle can't see: predicate pushdown reaching the scan, column pruning,
  * broadcast vs shuffle joins, global top-k as TakeOrderedAndProject, the
  * render pipeline staying a single narrow codegen stage, and b6 running
  * as a hash join instead of a nested-loop scan.
  */
class PlanSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("a6: start-time predicate pushes into the events parquet scan") {
    val p = plan(Registry.byId("a6_time_filter").build(spark, dir))
    assert(p.contains("PushedFilters") &&
      p.replaceAll("\\s", "").contains("GreaterThanOrEqual(ts"),
      s"time filter must reach the scan:\n$p")
  }

  test("NsTimestampPushdown rule: plain filter on converted ts reaches the scan") {
    import org.apache.spark.sql.functions._
    // No eventsSince helper here — the optimizer rule alone must rewrite
    // `timestamp_micros(ts div 1000) >= lit` to a raw-nanos predicate.
    val df = Tables.load(spark, dir, "events")
      .filter(col("ts") >= expr("timestamp'2024-01-15 00:00:00'"))
      .select("event_id", "event_type")
    val p = plan(df)
    assert(p.replaceAll("\\s", "").contains("GreaterThanOrEqual(ts"),
      s"rule must surface a pushable raw-ns filter:\n$p")
    // Correctness of the rewrite: same rows as the helper path.
    val startMicros = java.time.Instant.parse("2024-01-15T00:00:00Z")
      .getEpochSecond * 1000000L
    val want = Tables.eventsSince(spark, dir, startMicros).count()
    assert(df.count() == want)
  }

  test("NsTimestampPushdown boundary arithmetic is exact at µs edges") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // raw ns: just below 1s, =1s start, =1s last-ns, just above 1s.
    val df = Seq(999999999L, 1000000000L, 1000000999L, 1000001000L)
      .toDF("raw")
      .select(timestamp_micros(expr("raw div 1000")).as("ts"))
    val t = expr("timestamp'1970-01-01 00:00:01'")
    assert(df.filter(col("ts") >= t).count() == 3)
    assert(df.filter(col("ts") > t).count() == 1)
    assert(df.filter(col("ts") <= t).count() == 3)
    assert(df.filter(col("ts") < t).count() == 1)
    assert(df.filter(col("ts") === t).count() == 2)
    assert(df.filter(t <= col("ts")).count() == 3) // mirrored literal-first
  }

  test("column pruning: 2-column projection reads a 2-column schema") {
    val df = Tables.load(spark, dir, "lineitem")
      .filter(org.apache.spark.sql.functions.col("l_quantity") < 10)
      .select("l_orderkey", "l_quantity")
    val p = plan(df)
    val schema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(schema.contains("l_orderkey") && schema.contains("l_quantity"))
    assert(!schema.contains("l_comment") && !schema.contains("l_extendedprice"),
      s"scan must not read unprojected columns: $schema")
    assert(p.contains("LessThan(l_quantity"), "filter must be pushed")
  }

  test("b2: small-dimension join broadcasts (no shuffle of the fact side)") {
    val p = plan(Registry.byId("b2_join_broadcast").build(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"))
  }

  test("b6: binned range join is a hash join, not a nested-loop scan") {
    val p = plan(Registry.byId("b6_join_range_theta").build(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"expected hash join on bin key:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must not fall back to nested loop:\n$p")
  }

  test("b8: CDF range aggregate plans hash joins only and never builds the pair set") {
    val p = plan(Registry.byId("b8_range_agg_cdf").build(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast CDF lookups:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range aggregate must not fall back to a pair scan:\n$p")
    // The only SortMergeJoin-eligible join is the boundary residual, and
    // it must stay broadcast too — the supplier side is the small side.
    assert(!p.contains("SortMergeJoin"), s"boundary residual must broadcast:\n$p")
    // The residual's broadcast side must be PRUNED first: a LeftSemi
    // against the probes' distinct boundary-bin set bounds the broadcast
    // by boundary-bin membership, never |values| (ADVICE r14).
    assert(p.contains("LeftSemi"),
      s"boundary residual must semi-join-prune the value side before broadcasting:\n$p")
  }

  test("two-level assignment: two broadcast corpus stages, zero corpus hash Exchange") {
    // The r15 hierarchical router (VERDICT r14 ask #1): the corpus flows
    // through exactly two 1-row-array broadcast crossJoins (stage 1
    // supers, stage 2 grouped members) — never a hash/sort-merge join —
    // and the ONLY hash Exchange in the whole plan is the k-row codebook
    // member groupBy (codebook-sized, not corpus).
    import graft.operators.PipelineOps
    val emb = Tables.load(spark, dir, "embeddings")
    val p = plan(PipelineOps.assignToCentroids(
      emb, PipelineOps.stubCodebook(emb, 256), 256))
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(bnlj == 3, s"expected 2 corpus stages + 1 codebook grouping, got $bnlj:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"assignment must stay broadcast-inline:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx <= 1,
      s"only the k-row member groupBy may hash-Exchange (codebook-sized), got $hashEx:\n$p")
  }

  test("b10: the Q5 join tree broadcasts its dimension chain") {
    // supplier/nation/region are dimensions — each must plan as a
    // BroadcastHashJoin so the lineitem/orders fact side shuffles only
    // for its fact-fact joins, and the date+region filters must not
    // leave a cross product behind.
    val p = plan(Registry.byId("b10_sql_q5").build(spark, dir))
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(p).length
    assert(nBroadcast >= 3, s"expected >=3 broadcast dimension joins:\n$p")
    assert(!p.contains("CartesianProduct"), s"cross product in Q5 tree:\n$p")
  }

  test("b11/b12: subqueries decorrelate — no per-row re-scan, no cross product") {
    // b11's correlated scalar subquery (per-part avg quantity) must
    // rewrite into ONE partkey-grouped aggregate over lineitem joined
    // back on l_partkey — visible as a partial/final HashAggregate pair
    // around an Exchange, never a nested-loop or cartesian re-probe.
    val p17 = plan(Registry.byId("b11_sql_q17").build(spark, dir))
    assert(!p17.contains("CartesianProduct") &&
      !p17.contains("BroadcastNestedLoopJoin"),
      s"Q17 subquery failed to decorrelate:\n$p17")
    assert("HashAggregate".r.findAllIn(p17).length >= 2,
      s"expected the decorrelated per-part aggregate:\n$p17")
    assert(p17.contains("BroadcastHashJoin"),
      s"part dim + avg table must broadcast at this scale:\n$p17")
    // b12's IN + grouped HAVING must rewrite into a LeftSemi join
    // against the aggregated big-order set.
    val p18 = plan(Registry.byId("b12_sql_q18").build(spark, dir))
    assert(p18.contains("LeftSemi"),
      s"IN subquery must plan as a semi join:\n$p18")
    assert(!p18.contains("CartesianProduct") &&
      !p18.contains("BroadcastNestedLoopJoin"),
      s"Q18 subquery failed to decorrelate:\n$p18")
  }

  test("b13/b14: EXISTS/NOT-EXISTS decorrelate to semi/anti joins carrying the inequality") {
    // b13's correlated EXISTS (equi-key + cross-table inequality) must
    // plan as ONE LeftSemi join over lineitem — the inequality rides
    // the join condition, never a per-order re-probe.
    val p4 = plan(Registry.byId("b13_sql_q4").build(spark, dir))
    assert(p4.contains("LeftSemi"),
      s"EXISTS must plan as a semi join:\n$p4")
    assert(!p4.contains("CartesianProduct") &&
      !p4.contains("BroadcastNestedLoopJoin"),
      s"Q4 EXISTS failed to decorrelate:\n$p4")
    // b14: the NOT EXISTS becomes a LeftAnti join and the two
    // uncorrelated scalar thresholds plan as one-row subquery
    // broadcasts, not joins.
    val p22 = plan(Registry.byId("b14_sql_q22").build(spark, dir))
    assert(p22.contains("LeftAnti"),
      s"NOT EXISTS must plan as an anti join:\n$p22")
    assert(p22.contains("Subquery") || p22.contains("scalar-subquery"),
      s"scalar thresholds must plan as subquery broadcasts:\n$p22")
    assert(!p22.contains("CartesianProduct") &&
      !p22.contains("BroadcastNestedLoopJoin"),
      s"Q22 shape failed to decorrelate:\n$p22")
  }

  test("i50: the vocab joins back as a broadcast; top-V plans as TakeOrderedAndProject") {
    // The corpus-side token stream must NEVER shuffle for the vocab
    // join — the V-row vocab is the broadcast side — and the top-V
    // selection must be a TakeOrderedAndProject over the aggregated
    // frequency table, not a global sort of it.
    val p = plan(Registry.byId("i50_vocab_coverage").build(spark, dir))
    assert(p.contains("BroadcastHashJoin"),
      s"vocab must broadcast onto the token stream:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus side must not shuffle for the vocab join:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-V must plan as TakeOrderedAndProject:\n$p")
  }

  test("b17: Q21's same-table EXISTS + NOT EXISTS decorrelate to one semi and one anti join") {
    // The hardest TPC-H decorrelation: both subqueries probe the SAME
    // fact table correlated on the outer fact row, the NOT EXISTS also
    // on a second outer table's column. Each must become ONE
    // orderkey-keyed join (semi for EXISTS, anti for NOT EXISTS with
    // the date inequality riding the condition) — never a re-probe per
    // row, never a nested loop.
    val p21 = plan(Registry.byId("b17_sql_q21").build(spark, dir))
    assert(p21.contains("LeftSemi"), s"EXISTS must plan as a semi join:\n$p21")
    assert(p21.contains("LeftAnti"), s"NOT EXISTS must plan as an anti join:\n$p21")
    assert(!p21.contains("CartesianProduct") &&
      !p21.contains("BroadcastNestedLoopJoin"),
      s"Q21 shape failed to decorrelate:\n$p21")
    assert(p21.contains("TakeOrderedAndProject"),
      s"deterministic top-100 must plan as TakeOrderedAndProject:\n$p21")
  }

  test("i30: no array-keyed sort-merge join; group verify sides broadcast; no rank window over pairs") {
    // The three structural decisions that keep the fuzzy join scale-safe:
    // probe rows get their group id from a window over the rks shuffle
    // (Spark cannot hash-join on an array key, so a group-table join-back
    // would sort-merge every probe row on a ~300-byte array), the verify
    // join's group tables broadcast onto the candidate pairs, and the
    // per-group argmax is a partial-combining hash aggregate — no
    // corpus- or pair-sized rank window anywhere.
    val p = plan(Registry.byId("i30_fuzzy_join").build(spark, dir))
    assert(!p.contains("SortMergeJoin"), s"array-keyed SMJ is back:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast verify joins:\n$p")
    assert(!p.contains("RunningWindowFunction") && !p.contains("row_number"),
      s"rank window over the verified pairs is back:\n$p")
  }

  test("b27/b29/b31: the remaining TPC-H decorrelations never fall back to nested loops") {
    // Q2's correlated scalar-min (with its own 4-table join chain), Q11's
    // global-total scalar subquery, and Q20's correlated aggregates inside
    // HAVING are the three decorrelation shapes the b11–b17 battery didn't
    // yet cover. Each must plan as aggregate + key-equi join — a
    // CartesianProduct or BroadcastNestedLoopJoin means Catalyst gave up
    // and the query re-probes lineitem per outer row (fatal at 100 TB).
    for (id <- Seq("b27_sql_q2", "b29_sql_q11", "b31_sql_q20")) {
      val p = plan(Registry.byId(id).build(spark, dir))
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$id failed to decorrelate:\n$p")
    }
    // Q2's top-100 must not global-sort.
    val p2 = plan(Registry.byId("b27_sql_q2").build(spark, dir))
    assert(p2.contains("TakeOrderedAndProject"),
      s"Q2 top-100 must plan as TakeOrderedAndProject:\n$p2")
    // Q20's IN must become a semi join on s_suppkey.
    val p20 = plan(Registry.byId("b31_sql_q20").build(spark, dir))
    assert(p20.contains("LeftSemi"), s"Q20 IN must plan as a semi join:\n$p20")
  }

  test("b30: Q16's NOT IN plans as a null-aware anti join on the 100-row supplier side") {
    val p = plan(Registry.byId("b30_sql_q16").build(spark, dir))
    assert(p.contains("LeftAnti"), s"NOT IN must plan as an anti join:\n$p")
    assert(!p.contains("CartesianProduct"), s"Q16 anti join degenerated:\n$p")
  }

  test("i68: the Bloom bitmap guards the stream before the confirm semi join") {
    val p = plan(Registry.byId("i68_bloom_prescreen").build(spark, dir))
    assert(p.contains("might_contain"),
      s"bloom prescreen filter missing from the plan:\n$p")
    assert(p.contains("LeftSemi"), s"exact confirm join missing:\n$p")
  }

  test("i67: the probe side joins the 192-cell sketch as a broadcast") {
    val p = plan(Registry.byId("i67_cms_heavy_hitters").build(spark, dir))
    assert(p.contains("BroadcastHashJoin"),
      s"sketch join must broadcast, not shuffle:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cross join:\n$p")
  }

  test("i69: the query batch broadcasts onto the pool (no shuffled cartesian)") {
    val p = plan(Registry.byId("i69_knn_classify").build(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query batch must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"shuffled cartesian over the pool:\n$p")
  }

  test("i70: containment candidates come from an equi join, never a cross product") {
    // The one-sided prefix filter must still produce an EQUI candidate
    // join on (source, rk) — an all-pairs cross product over same-source
    // docs is the failure mode the filter exists to prevent.
    val p = plan(Registry.byId("i70_containment_dedup").build(spark, dir))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"containment candidate generation degenerated to all-pairs:\n$p")
  }

  test("d8: islands pipeline reuses the shard shuffle — one hash Exchange total") {
    // hash(shard) satisfies ClusteredDistribution(shard, grp) and
    // ClusteredDistribution(shard), so the window and BOTH aggregations
    // must ride the single Exchange (the only other Exchange is the final
    // ORDER BY rangepartitioning).
    val p = plan(Registry.byId("d8_gap_islands").build(spark, dir))
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashShuffles == 1,
      s"window + island/shard aggregates must share hash(shard), got $hashShuffles:\n$p")
  }

  test("b33: lateral aggregate decorrelates — no nested-loop re-execution") {
    val p = plan(Registry.byId("b33_lateral_agg").build(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"lateral derived table must decorrelate to an equi join:\n$p")
  }

  test("i73: content-addressed thinning is a pure filter — no hash Exchange") {
    // The weighted sample must stay scan-parallel: the only Exchange in
    // the plan is the final ORDER BY rangepartitioning.
    val p = plan(Registry.byId("i73_weighted_sample").build(spark, dir))
    assert(!p.contains("Exchange hashpartitioning"),
      s"sampling must not shuffle:\n$p")
  }

  test("b34: the Bloom prescreen probes at the fact scan below the semi join") {
    val p = plan(Registry.byId("b34_bloom_semi_prune").build(spark, dir))
    assert(p.contains("might_contain"),
      s"bloom probe must survive into the physical plan:\n$p")
    assert(p.contains("LeftSemi"),
      s"the exact semi join must remain after the prescreen:\n$p")
  }

  test("d10: three dependent funnel windows share one user_id Exchange") {
    // t2 reads t1 and t3 reads t2 — three window stages, but all on the
    // same partitioning: the only hash Exchange is the initial user_id
    // shuffle (the final global rollup is a SinglePartition exchange).
    val p = plan(Registry.byId("d10_event_funnel").build(spark, dir))
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashShuffles == 1,
      s"funnel must reuse one user_id Exchange, got $hashShuffles:\n$p")
  }

  test("b35: EqualNullSafe plans as a hash join key, not a nested loop") {
    val p = plan(Registry.byId("b35_nullsafe_join").build(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"null-safe equality must stay an equi-join key:\n$p")
  }

  test("c14: weighted median runs on TWO hash Exchanges — distribution then rollup") {
    // Two is the SCALE-CORRECT count, not a concession (ADVICE r13 made
    // the old one-Exchange title match what was asserted): the first
    // Exchange moves map-side-combined (g, vc) partials — high
    // cardinality, evenly spread — and the second moves only the
    // compacted per-(g, vc) distribution onto hash(g) for the rank
    // windows + rollup. Forcing a single hash(g) Exchange up front WOULD
    // satisfy the aggregate's (g, vc) clustering (subset key), but it
    // shuffles raw lineitem rows into |g|=3 partitions — a skew funnel
    // at 100 TB. Anything beyond these two is a cascade regression.
    val p = plan(Registry.byId("c14_weighted_median").build(spark, dir))
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashShuffles <= 2,
      s"weighted median must not cascade shuffles, got $hashShuffles:\n$p")
  }

  test("e2: global top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = plan(Registry.byId("e2_topk_global").build(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("c1: hash aggregate has a map-side partial phase") {
    val p = plan(Registry.byId("c1_agg_hash_group").build(spark, dir))
    assert(p.contains("partial_sum") || p.contains("partial"),
      s"expected partial aggregation before the shuffle:\n$p")
  }

  test("a4 render pipeline: one narrow codegen stage, zero shuffles") {
    val df = EnvelopeOps.renderPipeline(Tables.load(spark, dir, "events"))
    val p = plan(df)
    // WholeStageCodegen renders as a "*(stageId)" prefix in plan strings.
    assert(p.contains("WholeStageCodegen") || p.contains("*(1)"),
      s"render must stay in codegen:\n$p")
    assert(!p.contains("Exchange"),
      s"the record pipeline is a projection — no shuffle is acceptable:\n$p")
  }

  test("i3: one-vs-all similarity broadcasts the query vector, no sort-merge") {
    val p = plan(Registry.byId("i3_sim_topk").build(spark, dir))
    assert(p.contains("BroadcastExchange"), s"query vector must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"))
  }

  test("i2: no window stage — the global token rank funnel is gone") {
    // The hash-order prefix filter needs no vocabulary rank table; the
    // df-rank variant planned an unpartitioned WindowExec (one task over
    // the whole vocabulary — a 100 TB straggler).
    val p = plan(Registry.byId("i2_dedup_near").build(spark, dir))
    assert(!p.contains("Window"), s"i2 must not plan a window:\n$p")
  }

  test("i14: band join stays an equi-join; the corpus is tokenized exactly once") {
    val p = plan(Registry.byId("i14_lsh_dedup_e2e").build(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"band candidates must come from an equi-join on the band key:\n$p")
    // Signatures, candidates AND verify all read the materialized
    // token-hash sketch (the checkpoint scan): the documents parquet
    // appears NOWHERE in this plan — the corpus is tokenized once when
    // the sketch builds, not once per consumer.
    assert(p.contains("Scan ExistingRDD"),
      s"the sketch must be a materialized scan:\n$p")
    assert(!p.contains("Scan parquet"),
      s"no consumer may re-tokenize the corpus:\n$p")
  }

  test("i17: lang filter reaches the scan; exactly one hash shuffle (the dedup window)") {
    val df = Registry.byId("i17_curation_e2e").build(spark, dir)
    val p = plan(df)
    assert(p.replaceAll("\\s", "").contains("EqualTo(lang,en)"),
      s"language cut must push into the parquet scan:\n$p")
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashShuffles == 1,
      s"curation must shuffle once (fingerprint window), got $hashShuffles:\n$p")
  }

  test("i18: AQE converts the drop-list anti-join to broadcast at runtime") {
    // Pre-execution the checkpointed drop list has no usable stats, so
    // the initial plan is a sort-merge anti-join; once the list
    // materializes small, adaptive execution must re-plan it as a
    // broadcast — exactly the runtime behavior the 100 TB run relies on
    // (and the safe default: a genuinely huge drop list stays shuffled).
    val df = Registry.byId("i18_dedup_apply").build(spark, dir)
    // drive THIS query execution (a write/count would execute a clone
    // and leave this AdaptiveSparkPlan unfinalized)
    df.queryExecution.executedPlan.executeCollect()
    val p = plan(df)
    assert(p.contains("isFinalPlan=true"), s"plan must be adaptive-final:\n$p")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"small drop list must broadcast-anti-join the corpus at runtime:\n$p")
  }

  test("i19: eval shingle set broadcasts; the corpus side never sort-merges") {
    val p = plan(Registry.byId("i19_contamination").build(spark, dir))
    assert(p.contains("BroadcastHashJoin"),
      s"the tiny eval set must broadcast against train shingles:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no corpus-side sort-merge:\n$p")
  }

  test("i19: single pass over the train side — documents scanned exactly twice") {
    // One scan feeds the eval probe set, ONE feeds the train side; the
    // two-aggregation (sizes + shared) form evaluated the train subtree —
    // explode + corpus-wide distinct — twice, i.e. three scans total.
    val p = plan(Registry.byId("i19_contamination").build(spark, dir))
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 2,
      s"expected 2 documents scans (eval + one train pass), got $scans:\n$p")
  }

  test("i20: batch ANN broadcasts the query/probe side; corpus never sort-merges") {
    val p = plan(Registry.byId("i20_ann_batch").build(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"probe list must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no corpus-side sort-merge:\n$p")
  }

  test("i10/i20: centroid assignment is shuffle-free (broadcast array, inline argmax)") {
    // The crossJoin+window formulation fanned every vector into k rows
    // (embedding payload included) and hash-Exchanged all k·N of them to
    // pick a per-vector argmax. The broadcast-centroid-array form must
    // plan NO window and, for i10 (whose final top-k is a
    // TakeOrderedAndProject), no non-broadcast Exchange anywhere except
    // the k-row codebook collapse (Exchange SinglePartition over 8 rows).
    val p10 = plan(Registry.byId("i10_ann_ivf").build(spark, dir))
    assert(!p10.contains("Window"), s"i10 must not plan a window:\n$p10")
    assert(!p10.contains("Exchange hashpartitioning") &&
      !p10.contains("Exchange rangepartitioning"),
      s"i10 must not shuffle corpus data:\n$p10")
    // i20 keeps exactly ONE hash Exchange: the final per-query top-k
    // window over narrow (qid, vec_id, sim) triples. Assignment and
    // probe routing contribute none.
    val p20 = plan(Registry.byId("i20_ann_batch").build(spark, dir))
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p20).size
    assert(hashShuffles == 1,
      s"i20 must shuffle once (candidate top-k), got $hashShuffles:\n$p20")
  }

  test("i44: batch ADC shuffles exactly twice — the 4-row sum and the per-qid top-k") {
    // The many-query ADC scan must keep the i20 counting discipline:
    // the unified (qid, b, cid, d2q) LUT broadcasts onto the code
    // table (no sort-merge anywhere), so the only hash Exchanges are
    // the per-(qid, vec_id) 4-row integer sum and the per-qid top-k
    // window over narrow (qid, vec_id, adc_q) triples. Query count
    // scales the broadcast, never the number of corpus passes.
    val p = plan(Registry.byId("i44_ann_pq_batch").build(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"LUT must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no corpus-side sort-merge:\n$p")
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashShuffles == 2,
      s"i44 must shuffle twice (pair sum + per-qid top-k), got $hashShuffles:\n$p")
  }

  test("i32: corpus re-read once for ids; sketch and pairs are materialized scans") {
    // The composed dedup plan tokenizes the corpus exactly once — into
    // the checkpointed sketch — so the final plan reads ExistingRDD for
    // the label table and touches the documents parquet only to list
    // doc ids (one scan, ids only).
    val p = plan(Registry.byId("i32_dedup_e2e").build(spark, dir))
    assert(p.contains("Scan ExistingRDD"),
      s"labels must come from the materialized pair pipeline:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1,
      s"expected exactly 1 documents scan (the id list), got $scans:\n$p")
  }

  test("i33: outlier screen is a pure scan-side filter — no hash shuffle at all") {
    // The best-centroid similarity is already inside the assignment
    // argmax, so the screen plans as broadcast codebook + narrow filter
    // + output sort: no Exchange hashpartitioning anywhere (the i21
    // shape in vector space).
    val p = plan(Registry.byId("i33_embed_outliers").build(spark, dir))
    assert(!p.contains("Exchange hashpartitioning"),
      s"the outlier screen must not shuffle:\n$p")
    assert(!p.contains("Window"), s"no window in the screen:\n$p")
  }

  test("j10: unigram counts broadcast; bigram join AQE-converts; corpus tokenized once") {
    // The unigram table broadcasts by hint; the bigram table carries NO
    // hint (its vocabulary grows with the corpus — a hard hint would
    // fail a 100 TB build), so locally it must be AQE's runtime
    // broadcast conversion that picks it up (the i18 pattern).
    val df = Registry.byId("j10_bigram_lm").build(spark, dir)
    df.queryExecution.executedPlan.executeCollect()
    val p = plan(df)
    assert(p.contains("isFinalPlan=true"), s"plan must be adaptive-final:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"count tables must broadcast at runtime:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the occurrence stream must never sort-merge locally:\n$p")
    // All three consumers read the materialized occurrence table — the
    // documents parquet appears nowhere in the final plan.
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"),
      s"the occurrence table must be materialized once:\n$p")
  }

  test("j5: quantile aggregate keeps a map-side partial phase") {
    val p = plan(Registry.byId("j5_length_quantiles").build(spark, dir))
    assert(p.contains("partial_percentile") || p.contains("partial_"),
      s"percentiles must partial-aggregate before the shuffle:\n$p")
  }

  test("AQE splits a skewed sort-merge join at runtime (OptimizeSkewedJoin)") {
    // SkewSpec proves the EXPLICIT salted join ≡ plain; this pins the
    // ADAPTIVE half of the skew story (VERDICT r12 #6): Spark's own
    // OptimizeSkewedJoin must fire on a manufactured hot key, so the
    // engine can rely on AQE for skew it did not predict. Thresholds are
    // lowered because the fixture is KB-scale; the assert is on the
    // executed adaptive plan, not on configs.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // Fact: 100 even keys plus one hot key carrying 20k wide rows —
      // one shuffle partition dwarfs the median. The payload is
      // md5-derived (incompressible — a constant pad lz4-compresses to
      // nothing in the map-output sizes AQE reads, hiding the skew) and
      // flows through the aggregate so pruning can't drop it.
      def payload(c: org.apache.spark.sql.Column) =
        concat(md5(c.cast("string")), md5((c + 1).cast("string")),
          md5((c + 2).cast("string")), md5((c + 3).cast("string")))
      val fact = spark.range(0, 2000)
        .select((col("id") % 100).as("k"), payload(col("id")).as("payload"))
        .union(spark.range(0, 20000)
          .select(lit(777L).as("k"), payload(col("id") + 1000000).as("payload")))
      val dim = (0L until 100L).map(k => (k, s"d$k")).toDF("k", "name")
        .union(Seq((777L, "hot")).toDF("k", "name"))
      val joined = fact.join(dim, "k").groupBy(col("name"))
        .agg(count(lit(1)).as("count"), sum(length(col("payload"))).as("bytes"))
      joined.collect() // execute so AQE finalizes the plan
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), s"plan must be adaptive-final:\n$p")
      assert(p.contains("skew=true"),
        s"OptimizeSkewedJoin must mark the SMJ (skew=true):\n$p")
      // And the answer survives the split.
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got("hot") == 20000L && got("d0") == 20L)
      val bytes = joined.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(bytes("hot") == 20000L * 128)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("c10: exact quantile twin holds no all-values percentile buffer") {
    val p = plan(Registry.byId("c10_sketch_quantile").build(spark, dir))
    // The VERDICT-r12 scale hazard: Spark's exact `percentile` funnels
    // every distinct value of a group into one final aggregation buffer.
    // The rewritten twin must compute exact ranks from the grouped
    // distribution instead — no exact percentile aggregate anywhere in
    // the executed plan (the sketch `percentile_approx` IS expected).
    assert(!p.contains("percentile("),
      s"exact percentile aggregate must not appear:\n$p")
    assert(p.contains("percentile_approx"),
      s"the production sketch path must remain:\n$p")
    // The distribution aggregation partial-aggregates map-side before
    // its one shuffle — the property that bounds task memory by
    // #distinct values, not #rows.
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"distribution count must partial-aggregate:\n$p")
  }

  test("i23: Lloyd step shuffles only k·dim partial sums, never the corpus") {
    val p = plan(Registry.byId("i23_kmeans_step").build(spark, dir))
    assert(!p.contains("SortMergeJoin"),
      s"assignment must stay broadcast, no corpus sort-merge:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum") ||
      p.contains("Partial"),
      s"the mean must partial-aggregate map-side before the shuffle:\n$p")
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashShuffles == 1,
      s"exactly one shuffle (the (cid,pos) partial-agg exchange), got $hashShuffles:\n$p")
  }

  test("i24: salted cluster equi-join over one materialized assignment; top-k never full-sorts") {
    val p = plan(Registry.byId("i24_embed_near_dup").build(spark, dir))
    // The assignment materializes ONCE (localCheckpoint) for the
    // hot-count dimension and both pair sides, so the plan reads the
    // checkpoint and re-runs no centroid broadcast; the PAIR join itself
    // must stay a (cid, salt) equi-join — no CartesianProduct, no BNLJ.
    assert(p.contains("Scan ExistingRDD"),
      s"the assignment must be a materialized scan:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"pair candidates must be the cid equi-join, never all-pairs:\n$p")
    // The hot-cluster salt machinery is structurally present, asserted on
    // LOGICAL-plan operators rather than plan-string fragments (the
    // string form was brittle against Spark formatting changes and could
    // match an unrelated xxhash64): the right side replicates via a
    // Generate of Explode(Sequence) — the per-cluster salt fan-out — and
    // the left side buckets by Pmod(XxHash64(vec_id), saltCount).
    import org.apache.spark.sql.catalyst.expressions.{Expression, Pmod, Sequence, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.Explode
    import org.apache.spark.sql.catalyst.plans.logical.Generate
    val opt = Registry.byId("i24_embed_near_dup").build(spark, dir)
      .queryExecution.optimizedPlan
    val saltFanOut = opt.collect {
      case g: Generate if (g.generator match {
        case Explode(child) => child.exists(_.isInstanceOf[Sequence])
        case _ => false
      }) => g
    }
    assert(saltFanOut.nonEmpty,
      s"expected the salt replication Generate(Explode(Sequence)) in:\n$opt")
    def hasSaltBucket(e: Expression): Boolean = e.exists {
      case Pmod(h: XxHash64, _, _) =>
        h.children.exists(_.references.exists(_.name.contains("vec_id")))
      case _ => false
    }
    assert(
      opt.collect { case n if n.expressions.exists(hasSaltBucket) => n }.nonEmpty,
      s"expected the pmod(xxhash64(vec_id), salts) bucketing expression in:\n$opt")
    assert(p.contains("TakeOrderedAndProject"),
      s"global top-20 must plan as TakeOrderedAndProject, not a full sort:\n$p")
  }

  test("i35: span dedup shuffles twice on 8-byte keys; every window is bounded") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = Registry.byId("i35_span_dedup").build(spark, dir)
    val p = plan(df)
    // One Exchange for the gram-hash dup-marker window, one for the
    // per-doc island windows + span aggregate (they share the doc_id
    // partitioning) — text never rides a shuffle, and there is no join
    // anywhere (the dup marker is a count window, not a join-back).
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashShuffles == 2,
      s"span dedup must shuffle exactly twice (gram marker + doc islands), got $hashShuffles:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"span dedup joins nothing:\n$p")
    // Every window is partitioned (gram- or doc-bounded) — no
    // corpus-wide single-partition sort can hide here.
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      "all span-dedup windows must be partitioned")
  }

  test("i21: sampling is a pure scan-side filter — no hash shuffle at all") {
    val p = plan(Registry.byId("i21_sample_stratified").build(spark, dir))
    assert(!p.contains("Exchange hashpartitioning"),
      s"mixture sampling must not shuffle (filter + output sort only):\n$p")
  }

  test("i34: upsampling is a narrow generator projection — no hash shuffle at all") {
    val p = plan(Registry.byId("i34_upsample").build(spark, dir))
    assert(!p.contains("Exchange hashpartitioning"),
      s"upsampling must not shuffle (generate + output sort only):\n$p")
    assert(p.contains("Generate"), s"expected the copy generator:\n$p")
  }

  test("i22: every unpartitioned window sits above an aggregation, never the corpus") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val df = Registry.byId("i22_token_shards").build(spark, dir)
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "expected window nodes in the prefix-sum plan")
    // The corpus-side running sum must be partitioned (B-way parallel)...
    assert(wins.exists(_.partitionSpec.nonEmpty),
      "per-bucket running sum must be a partitioned window")
    // ...and any unpartitioned window (the B-row offset cumsum) must be
    // bounded by an aggregation below it — the single-partition-sort-of-
    // the-corpus shape (the r3 i2 scale-killer) must never reappear.
    wins.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.child.collectFirst { case a: Aggregate => a }.nonEmpty,
        s"unpartitioned window runs over raw corpus rows:\n$w")
    }
  }

  test("j7: PII scrub is a pure map pass — no hash shuffle at all") {
    val p = plan(Registry.byId("j7_pii_redact").build(spark, dir))
    assert(!p.contains("Exchange hashpartitioning"),
      s"redaction must not shuffle (project + output sort only):\n$p")
  }

  test("j11: normalization is a pure map pass — no hash shuffle at all") {
    val p = plan(Registry.byId("j11_normalize").build(spark, dir))
    assert(!p.contains("Exchange hashpartitioning"),
      s"normalization must not shuffle (project + output sort only):\n$p")
  }

  test("i27: quantization shuffles only per-vector partial sums") {
    val p = plan(Registry.byId("i27_embed_quantize").build(spark, dir))
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashShuffles == 1,
      s"quantize must shuffle once (the vec_id partial agg), got $hashShuffles:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"quantize joins nothing — no sort-merge anywhere:\n$p")
  }

  test("i37: PQ codebooks broadcast everywhere — no corpus sort-merge, no cartesian") {
    // Every join in the PQ plan has a codebook-bounded side (per-block
    // centroid arrays, the trained (b,cid) table, the empty-cell
    // carry-through anti-join) — all must plan as broadcast joins; the
    // corpus-sized shuffles are only the quantized-mean partial aggs
    // and the per-vector pivot.
    val p = plan(Registry.byId("i37_pq_quantize").build(spark, dir))
    assert(!p.contains("SortMergeJoin"),
      s"PQ joins only codebook-bounded sides — no sort-merge:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"no unbounded join shapes in the PQ plan:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the per-block codebooks must broadcast:\n$p")
  }

  test("i39: ADC ranks via broadcast LUT lookups and a TakeOrderedAndProject top-k") {
    // The read path must never move the corpus to the LUT: the (4×8)
    // table and the per-block codebooks broadcast, code rows join them
    // map-side, and the global top-20 is a TakeOrderedAndProject over
    // (vec_id, adc_q) — not a full sort.
    val p = plan(Registry.byId("i39_ann_pq_adc").build(spark, dir))
    assert(!p.contains("SortMergeJoin"),
      s"LUT and codebook joins must broadcast — no sort-merge:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the ADC lookup table must join as a broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must plan as TakeOrderedAndProject, not a full sort:\n$p")
  }

  test("i38: pair expansion and totals derive from one materialized grouped table") {
    // The corpus contributes exactly one shuffle — the groupBy(sh) with
    // a map-side-combined collect_set — which materializes once
    // (localCheckpoint) and feeds BOTH the per-source totals and the
    // in-row pair explode as ExistingRDD scans; the totals then attach
    // as broadcast joins over the ≤|sources|² pair rows.
    val p = plan(Registry.byId("i38_source_overlap").build(spark, dir))
    assert(p.contains("Scan ExistingRDD"),
      s"the grouped shingle table must be a materialized scan:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"per-source totals must broadcast onto the pair rows:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"expected the broadcast totals joins:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no cartesian product in the overlap matrix plan:\n$p")
  }

  test("j12: holdout spine joins the corpus-keyed tables; unigram counts broadcast") {
    // The leave-one-out subtraction must keep j10's join discipline:
    // the occurrence table materializes once (all four count tables
    // derive from the same checkpoint), c1 joins by broadcast hint,
    // and the screening top-20 is a TakeOrderedAndProject.
    val p = plan(Registry.byId("j12_lm_holdout").build(spark, dir))
    assert(p.contains("Scan ExistingRDD"),
      s"the occurrence table must be a materialized scan:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the unigram count table must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the screening top-20 must plan as TakeOrderedAndProject:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no cartesian product in the holdout plan:\n$p")
  }

  test("i26: the corpus doc count broadcasts; no cartesian product") {
    val p = plan(Registry.byId("i26_tfidf_topk").build(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row count must join as a broadcast, got:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no cartesian product in the tf-idf plan:\n$p")
  }

  test("d7: sessionization runs on ONE shuffle — windows and session agg share the user_id partitioning") {
    // lag window, running-sum window, and the per-(user, sid) aggregate
    // all key on user_id (HashPartitioning(user_id) satisfies the
    // (user_id, sid) clustering), so the whole operator is one Exchange
    // + one sorted pass + one aggregate. A second hash Exchange would
    // mean the session agg re-shuffled — the scale bug to pin out.
    val p = plan(Registry.byId("d7_sessionize").build(spark, dir))
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashShuffles == 1, s"expected ONE hash Exchange, got $hashShuffles:\n$p")
  }

  test("b15: SCD2 merge runs on ONE shuffle — suppression filter preserves sort and partitioning") {
    val p = plan(Registry.byId("b15_scd2_merge").build(spark, dir))
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashShuffles == 1, s"expected ONE hash Exchange, got $hashShuffles:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian in the merge plan:\n$p")
  }

  test("b16: CDC compaction runs on ONE shuffle — three-way union rides the key partitioning") {
    val p = plan(Registry.byId("b16_cdc_upsert").build(spark, dir))
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashShuffles == 1, s"expected ONE hash Exchange, got $hashShuffles:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian in the compaction plan:\n$p")
  }

  test("e3: zone-map build is one hash aggregate — no global sort, no window") {
    // The Morton key and zone id are row-local arithmetic; building the
    // zone map needs ONE partial+final aggregate on zone_id. A plan that
    // globally sorted by zkey (the layout-write path) or windowed would
    // not scale as a stats pass.
    val p = plan(Registry.byId("e3_zorder_cluster").build(spark, dir))
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashShuffles == 1, s"expected ONE hash Exchange, got $hashShuffles:\n$p")
    assert(!p.contains("Window"), s"no window in the zone-map plan:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"zone stats must run partial+final:\n$p")
  }

  test("i47: MV maintenance shuffles only on the MV key (partials + merge, no cartesian)") {
    // Two partial aggregates (base | delta) + the merge re-aggregate,
    // every Exchange keyed on (source, lang) — the |delta|+|MV| cost
    // story. More Exchanges would mean the merge re-keyed or the corpus
    // shuffled twice.
    val p = plan(Registry.byId("i47_mv_maintain").build(spark, dir))
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashShuffles <= 3, s"expected ≤3 hash Exchanges, got $hashShuffles:\n$p")
    assert("hashpartitioning\\(source".r.findAllIn(p).size == hashShuffles,
      s"every Exchange must key on the MV key:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian in the MV plan:\n$p")
  }

  test("g6: props JSON parses once per row (one from_json, no re-extract)") {
    val df = Registry.byId("g6_json_funcs").build(spark, dir)
    val o = df.queryExecution.optimizedPlan.toString
    val parses = "from_json".r.findAllIn(o).size
    assert(parses == 1, s"expected exactly ONE from_json, got $parses:\n$o")
    assert(!o.contains("get_json_object"),
      s"no per-column re-extraction of props:\n$o")
  }

  test("i54: chunking is map-only — no Exchange except the output sort") {
    // The chunk explode must stay a narrow projection over the scan; the
    // only Exchange in the plan is the final rangepartitioning for the
    // deterministic output order (which a production delivery write
    // would drop).
    val p = plan(Registry.byId("i54_chunk_windows").build(spark, dir))
    assert(!p.contains("Exchange hashpartitioning"),
      s"chunking must not hash-shuffle:\n$p")
    val ranges = "Exchange rangepartitioning".r.findAllIn(p).size
    assert(ranges == 1, s"exactly the output sort's range Exchange:\n$p")
  }

  test("i55: pair explode runs over the aggregated word table, top-20 is TakeOrdered") {
    val p = plan(Registry.byId("i55_bpe_merge_step").build(spark, dir))
    // Global top-20 must be TakeOrderedAndProject (no full output sort).
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must be a TakeOrderedAndProject:\n$p")
    // Two hash Exchanges only: word count (corpus -> vocab) and the
    // pair-sum re-aggregation — the explode sits between them, after
    // the corpus has collapsed to the distinct-word table.
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashShuffles == 2, s"expected 2 hash Exchanges, got $hashShuffles:\n$p")
  }

  test("i56: eval fingerprint set broadcasts; the train side never self-joins") {
    val p = plan(Registry.byId("i56_winnow_overlap").build(spark, dir))
    assert(p.contains("BroadcastExchange"),
      s"the eval fingerprint set must broadcast:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the containment probe must be a broadcast hash join:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"no corpus-vs-corpus shuffle join in the screen:\n$p")
  }

  test("b18: shipdate window reaches the lineitem scan; no cartesian despite the cross-role disjunction") {
    // The dual-role nation predicate can only evaluate after both joins —
    // it must ride a join condition, never degrade the tree to a
    // CartesianProduct/BNLJ; the two-year window must prune at the scan.
    val p = plan(Registry.byId("b18_sql_q7").build(spark, dir))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"cross-role disjunction must ride an equi-join condition:\n$p")
    assert(p.replaceAll("\\s", "").contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate window must reach the lineitem scan:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"nation dimensions must broadcast:\n$p")
  }

  test("b19: per-side residuals of the OR-of-ANDs push below the join to BOTH scans") {
    // Catalyst must extract the part-only disjunction (brand+size) onto
    // the part scan and the lineitem-only quantity envelope onto the
    // lineitem scan; only the cross-side disjunction evaluates post-join.
    val p = plan(Registry.byId("b19_sql_q19").build(spark, dir))
    val flat = p.replaceAll("\\s", "")
    assert(flat.contains("And(EqualTo(p_brand") ||
      flat.contains("EqualTo(p_brand"),
      s"brand disjunction must reach the part scan's PushedFilters:\n$p")
    assert(flat.contains("GreaterThanOrEqual(l_quantity"),
      s"quantity envelope must reach the lineitem scan's PushedFilters:\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("CartesianProduct"),
      s"the join must stay an equi hash join on p_partkey:\n$p")
  }

  test("b20: one aggregation pass computes both conditional sums; month window reaches the scan") {
    val p = plan(Registry.byId("b20_sql_q14").build(spark, dir))
    // A two-scans-of-the-join formulation would show 2+ lineitem scans.
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 2, s"expected lineitem+part scans only, got $scans:\n$p")
    assert(p.replaceAll("\\s", "").contains("GreaterThanOrEqual(l_shipdate"),
      s"month window must reach the lineitem scan:\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("CartesianProduct"),
      s"part must broadcast:\n$p")
  }

  test("j14: gram explode collapses to the first-seen table; checkpoint joins broadcast 8 rows") {
    val p = plan(Registry.byId("j14_heaps_fit").build(spark, dir))
    // The only corpus-keyed hash Exchange is the gram first-seen
    // aggregate; V/N checkpoint joins must be broadcast (8-row build
    // side), never a shuffle join of the corpus against thresholds.
    assert(!p.contains("SortMergeJoin"),
      s"checkpoint joins must broadcast the 8-row frame:\n$p")
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    // gram first-seen + the two 8-group checkpoint aggregates + the
    // V⋈N 8-row join — all post-aggregation group-bounded except the
    // first; allow the bounded ones, pin the total.
    assert(hashShuffles <= 4, s"expected ≤4 hash Exchanges, got $hashShuffles:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"threshold joins must be broadcast:\n$p")
  }

  test("i57: the screen is shuffle-free and the drop is a broadcast anti-join") {
    // In-row gram screen (no hash Exchange anywhere — the corpus never
    // shuffles), tiny flagged list broadcast, LeftAnti on ids; the only
    // Exchanges are the 1-row eval-set collect and the output sort.
    val p = plan(Registry.byId("i57_decontaminate").build(spark, dir))
    assert(!p.contains("Exchange hashpartitioning"),
      s"decontamination must not hash-shuffle the corpus:\n$p")
    assert(p.contains("LeftAnti") && p.contains("BroadcastHashJoin"),
      s"the drop must be a broadcast anti-join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no shuffle join anywhere in the screen:\n$p")
  }

  test("i58: one corpus aggregate; the total is a bounded post-agg window, not a second scan") {
    val p = plan(Registry.byId("i58_mixture_weights").build(spark, dir))
    // Exactly ONE corpus-side hash Exchange (the per-source aggregate);
    // a naive per.agg+crossJoin form plans the scan+shuffle twice.
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected ONE corpus scan, got $scans:\n$p")
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashShuffles == 1, s"expected 1 hash Exchange, got $hashShuffles:\n$p")
    // The window runs above the aggregation (the i22 bounded rule).
    assert(p.contains("Window"), s"total must fold back via a window:\n$p")
  }

  test("i59: the argmax is TakeOrdered(1); the word table materializes once") {
    val p = plan(Registry.byId("i59_bpe_merge_apply").build(spark, dir))
    assert(p.contains("TakeOrderedAndProject(limit=1"),
      s"pair argmax must be a TakeOrderedAndProject(1):\n$p")
    // The checkpointed word table replaces the corpus subtree on both
    // consumers: no parquet scan appears anywhere in this plan.
    assert(!p.contains("FileScan parquet"),
      s"both consumers must read the materialized word table:\n$p")
  }

  test("j13: the regression runs above a TakeOrdered(30); no corpus-wide window") {
    val p = plan(Registry.byId("j13_zipf_slope").build(spark, dir))
    assert(p.contains("TakeOrderedAndProject(limit=30"),
      s"top-30 selection must be a TakeOrderedAndProject:\n$p")
    // The only Window sits above the 30-row TakeOrdered, and the corpus
    // contributes via the materialized word table (no rescan).
    assert(!p.contains("FileScan parquet"),
      s"both consumers must read the materialized word table:\n$p")
    val windowIdx = p.indexOf("Window")
    val topIdx = p.indexOf("TakeOrderedAndProject")
    assert(windowIdx >= 0 && topIdx > windowIdx,
      s"the rank window must sit ABOVE the TakeOrdered(30) frame:\n$p")
  }

  test("b21: quarter window prunes ORDERS at the scan; top-20 is TakeOrdered; returnflag reaches lineitem") {
    val p = plan(Registry.byId("b21_sql_q10").build(spark, dir))
    assert(p.contains("TakeOrderedAndProject(limit=20"),
      s"top-20 must be a TakeOrderedAndProject, never a full sort:\n$p")
    val flat = p.replaceAll("\\s", "")
    assert(flat.contains("GreaterThanOrEqual(o_orderdate"),
      s"quarter window must reach the orders scan:\n$p")
    assert(flat.contains("EqualTo(l_returnflag,R)"),
      s"returnflag residual must reach the lineitem scan:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the chain must stay equi hash joins:\n$p")
  }

  test("b22: the ON-clause priority filter pushes to the orders scan under the LeftOuter") {
    // The residual lives in the JOIN CONDITION — for a left outer join a
    // right-side-only predicate is pushable to the right scan without
    // changing outer semantics; a WHERE placement would have dropped
    // zero-order customers instead.
    val p = plan(Registry.byId("b22_sql_q13").build(spark, dir))
    assert(p.replaceAll("\\s", "").contains("Not(EqualTo(o_orderpriority"),
      s"the ON-residual must reach the orders scan's PushedFilters:\n$p")
    assert(p.contains("LeftOuter"),
      s"the join must stay LEFT OUTER (zero-count customers kept):\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("b23: the shipdate window prunes BOTH revenue-view consumers at their scans") {
    // The CTE runs twice (join input + scalar MAX subquery) — Q15's
    // canonical shape; the window must prune each instantiation, and the
    // gate must stay a post-aggregation Filter, never a value join.
    val p = plan(Registry.byId("b23_sql_q15").build(spark, dir))
    val pruned = "GreaterThanOrEqual\\(l_shipdate".r
      .findAllIn(p.replaceAll("\\s", "")).size
    assert(pruned >= 1,
      s"shipdate window must reach the lineitem scan(s):\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the supplier join must stay an equi hash join:\n$p")
    assert(p.contains("HashAggregate"),
      s"revenue must aggregate before the max gate:\n$p")
  }

  test("b24: all four dimensions broadcast; region/p_type/date filters prune their scans") {
    val p = plan(Registry.byId("b24_sql_q8").build(spark, dir))
    val flat = p.replaceAll("\\s", "")
    assert(flat.contains("EqualTo(p_type,PROMO)"),
      s"p_type filter must reach the part scan:\n$p")
    assert(flat.contains("EqualTo(r_name,EUROPE)"),
      s"region filter must reach the region scan:\n$p")
    assert(flat.contains("GreaterThanOrEqual(o_orderdate"),
      s"two-year window must reach the orders scan:\n$p")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj >= 4, s"expected ≥4 broadcast dimension joins, got $bhj:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("i60: one tokenize pass feeds all consumers; top-25 is TakeOrdered; no shuffle join") {
    val p = plan(Registry.byId("i60_dsir_importance").build(spark, dir))
    assert(p.contains("TakeOrderedAndProject(limit=25"),
      s"top-25 must be a TakeOrderedAndProject:\n$p")
    // Every consumer (raw counts, target counts, totals, spine) reads
    // the materialized occurrence table — no parquet rescan anywhere.
    assert(!p.contains("FileScan parquet"),
      s"all consumers must read the checkpointed occurrence table:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the ratio join must not sort-merge at this SF (AQE broadcast):\n$p")
  }

  test("i61: matvec is one scan, zero joins, one d-group hash Exchange") {
    val p = plan(Registry.byId("i61_pca_power_step").build(spark, dir))
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected ONE embeddings scan, got $scans:\n$p")
    assert(!p.contains("Join"), s"the matvec must plan ZERO joins:\n$p")
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashShuffles == 1,
      s"expected exactly one d-group hash Exchange, got $hashShuffles:\n$p")
    // Partial aggregation must combine BELOW the Exchange (map-side).
    val aggs = "HashAggregate".r.findAllIn(p).size
    assert(aggs >= 2, s"expected partial+final HashAggregate pair:\n$p")
  }

  test("c18: fifteen correlation moments ride ONE partial/final aggregate over one scan") {
    val p = plan(Registry.byId("c18_corr_matrix").build(spark, dir))
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"c18: expected ONE lineitem scan, got $scans:\n$p")
    assert(!p.contains("Join"), s"c18 plans zero joins:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"a global aggregate needs no hash Exchange (SinglePartition only):\n$p")
    val aggs = "HashAggregate".r.findAllIn(p).size
    assert(aggs >= 2, s"expected partial+final HashAggregate pair:\n$p")
  }

  test("c20: winsorized mean runs on the value distribution — one corpus Exchange, one scan") {
    // CDF, percentile bounds, and the clamped sum are windows + one
    // aggregate over the bounded (vc, cnt) table; a second corpus scan
    // (the c19 crossJoin trap) or Exchange means a branch re-derived
    // the distribution.
    val p = plan(Registry.byId("c20_winsorized_mean").build(spark, dir))
    assert(!p.contains("Join"), s"c20 plans zero joins:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"c20: ONE events scan, got $scans:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"c20: ONE distribution Exchange, got $shuffles:\n$p")
  }

  test("c19: Benford profile is one digit aggregate + a 1-row broadcast total") {
    val p = plan(Registry.byId("c19_benford_profile").build(spark, dir))
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"c19: ONE orders scan, got $scans:\n$p")
    assert(!p.contains("CartesianProduct"), s"the 1-row total must broadcast:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"c19: ONE digit Exchange, got $shuffles:\n$p")
  }

  test("d19: transition pairs ride the user Exchange; the rate window runs on the bounded matrix") {
    // lead() shuffles the stream once on user_id; the (cur, nxt) count
    // and its row-total window move only the |types|²-bounded matrix.
    // Three hash Exchanges total — a fourth means the rate re-shuffled
    // the corpus.
    val p = plan(Registry.byId("d19_markov_transition").build(spark, dir))
    assert(!p.contains("Join"), s"d19 plans zero joins:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles <= 3,
      s"d19: user window + pair agg + bounded rate window, got $shuffles:\n$p")
  }

  test("i90: k-center step never shuffles the corpus — 1-row broadcast, row-local min, TakeOrdered top-5") {
    // The center set is ONE collected row broadcast over the corpus
    // (the i26 1-row BNLJ rule), min-dist is a row-local HOF, the
    // global top-5 is TakeOrderedAndProject. Any hash Exchange means
    // the corpus shuffled for a 5-row answer.
    val p = plan(Registry.byId("i90_kcenter_step").build(spark, dir))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-5 must be TakeOrdered, not a global sort:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"the corpus must not hash-shuffle:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("i89: intra-doc excision is map-only — no hash Exchange, only the output sort") {
    // Segments, first-occurrence filter, and the fingerprint are all
    // row-local HOFs; the plan must be a narrow projection over the
    // scan plus the deterministic output sort (the i54 rule).
    val p = plan(Registry.byId("i89_intradoc_excise").build(spark, dir))
    assert(!p.contains("Exchange hashpartitioning"),
      s"excision must not hash-shuffle:\n$p")
    assert(!p.contains("Join"), s"excision plans zero joins:\n$p")
    val ranges = "Exchange rangepartitioning".r.findAllIn(p).size
    assert(ranges == 1, s"exactly the output sort's range Exchange:\n$p")
  }

  test("i88: the probe gradient keeps i61's shape — one scan, zero joins, one d-group Exchange") {
    // The row score is a same-row zip_with/aggregate (no weight join),
    // so the supervised step must plan exactly like the matvec: one
    // embeddings scan, zero joins, map-side partial aggregation below
    // the single d-group Exchange.
    val p = plan(Registry.byId("i88_probe_gradient").build(spark, dir))
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected ONE embeddings scan, got $scans:\n$p")
    assert(!p.contains("Join"), s"the gradient must plan ZERO joins:\n$p")
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashShuffles == 1,
      s"expected exactly one d-group hash Exchange, got $hashShuffles:\n$p")
    val aggs = "HashAggregate".r.findAllIn(p).size
    assert(aggs >= 2, s"expected partial+final HashAggregate pair:\n$p")
  }

  test("b25: Q6 reads 4 pruned columns with the date window and quantity cap at the scan") {
    val p = plan(Registry.byId("b25_sql_q6").build(spark, dir))
    val flat = p.replaceAll("\\s", "")
    // The scan line's PushedFilters is truncated at 100 chars in
    // toString — assert via the Filter node's full condition instead
    // (same predicates, and IsNotNulls in PushedFilters prove the scan
    // got a filter list at all).
    assert("l_shipdate#\\d+>=1996-01-01".r.findFirstIn(flat).isDefined,
      s"date window must survive to the scan-side Filter:\n$p")
    assert("l_quantity#\\d+<24".r.findFirstIn(flat).isDefined,
      s"quantity cap must survive to the scan-side Filter:\n$p")
    assert(flat.contains("PushedFilters:[IsNotNull"),
      s"the scan must carry pushed filters:\n$p")
    // Column pruning: the ReadSchema carries exactly the 4 referenced
    // columns — a wide read here multiplies 100 TB of IO for nothing.
    val rs = "ReadSchema:struct<([^>]*)>".r
      .findFirstMatchIn(flat).map(_.group(1)).getOrElse("")
    assert(rs.split(",").length == 4, s"expected a 4-column ReadSchema, got '$rs':\n$p")
    assert(!p.contains("Join"), s"Q6 must plan no join at all:\n$p")
  }

  test("i63: the budget window runs on the post-aggregation level table; joins broadcast") {
    val p = plan(Registry.byId("i63_budget_select").build(spark, dir))
    // The running sum must sit ABOVE a hash aggregate (the ≤1001-row
    // level table), never over the raw corpus — the i53 histogram rule.
    val aggIdx = p.indexOf("HashAggregate")
    val winIdx = p.indexOf("Window")
    assert(aggIdx >= 0 && winIdx >= 0 && winIdx < p.lastIndexOf("HashAggregate"),
      s"window must consume an aggregated frame:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"keep-set and budget joins must broadcast:\n$p")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"the keep-set must come back as a broadcast:\n$p")
  }

  test("i64: rendezvous assignment is map-only — no hash Exchange, no join") {
    val p = plan(Registry.byId("i64_rendezvous_shard").build(spark, dir))
    assert(!p.contains("Exchange hashpartitioning"),
      s"the in-row argmax must not shuffle:\n$p")
    assert(!p.contains("Join"), s"no join anywhere in the assignment:\n$p")
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected ONE documents scan, got $scans:\n$p")
  }

  test("b26: both conditional counts come from one aggregation pass over one join") {
    val p = plan(Registry.byId("b26_sql_q12").build(spark, dir))
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 2, s"expected orders+lineitem scans only, got $scans:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the lateness inequality must ride the equi-join:\n$p")
    val aggs = "HashAggregate".r.findAllIn(p).size
    assert(aggs == 2, s"expected ONE partial+final aggregate pair, got $aggs:\n$p")
  }

  test("i65: the metadata predicate prunes the candidate scan below the vector math") {
    val p = plan(Registry.byId("i65_ann_filtered").build(spark, dir))
    assert(p.replaceAll("\\s", "").contains("EqualTo(label,1)"),
      s"the label predicate must reach the embeddings scan:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"probe and query joins must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject(limit=10"),
      s"the top-k must be a TakeOrderedAndProject:\n$p")
  }

  test("g10: the HOF battery is a pure map pass — one scan, no shuffle, no join") {
    val p = plan(Registry.byId("g10_higher_order_funcs").build(spark, dir))
    assert(!p.contains("Exchange hashpartitioning"),
      s"in-row lambda compute must not shuffle:\n$p")
    assert(!p.contains("Join"), s"no join anywhere:\n$p")
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected ONE documents scan, got $scans:\n$p")
  }

  test("i62: the batch side is the only parquet scan; the state reads materialized tables") {
    val p = plan(Registry.byId("i62_dsir_incremental").build(spark, dir))
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1,
      s"only the BATCH slice may rescan parquet — the corpus state is persisted:\n$p")
    assert(p.contains("ExistingRDD"),
      s"the ratio/normalizer state must read the materialized tables:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("b36: both ledgers pre-aggregate BELOW the full-outer join") {
    // The reconciliation join must move day-grain rows, not facts: each
    // join input is a HashAggregate over its own scan, and the join
    // itself is the sort-merge FullOuter (a broadcast variant cannot
    // retain unmatched build-side rows).
    val p = plan(Registry.byId("b36_join_full_outer").build(spark, dir))
    assert(p.contains("FullOuter"), s"join must be FullOuter:\n$p")
    val aggBeforeJoin = p.linesIterator.toSeq
    val joinLine = aggBeforeJoin.indexWhere(_.contains("FullOuter"))
    val aggsBelow = aggBeforeJoin.drop(joinLine)
      .count(_.contains("HashAggregate"))
    assert(aggsBelow >= 2,
      s"both sides must aggregate to date grain below the join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"no nested loop:\n$p")
  }

  test("d14/d15: one user_id Exchange feeds the whole sweep — no extra shuffle") {
    // Sweep + block rollup (d14) and the 8-term lag chain (d15) must
    // each cluster every window/aggregate on the ONE user_id hash
    // Exchange; a second corpus-wide shuffle means a window or agg key
    // drifted off the partitioning.
    for (id <- Seq("d14_interval_coverage", "d15_ewma_decay", "d16_rolling_trend")) {
      val p = plan(Registry.byId(id).build(spark, dir))
      val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(shuffles == 1, s"$id: expected ONE hash Exchange, got $shuffles:\n$p")
    }
  }

  test("i83: the peel cascade reuses the checkpointed edge list — one corpus scan chain") {
    // deg0/deg1/deg2 all derive from the SAME materialized edge table
    // (ExistingRDD); a plan that re-runs the pair pipeline per degree
    // pass would show three parquet scan chains.
    val p = plan(Registry.byId("i83_kcore_peel").build(spark, dir))
    assert(p.contains("ExistingRDD"),
      s"edges must read the localCheckpoint, not recompute:\n$p")
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 0,
      s"no degree pass may rescan the corpus (edges are materialized), got $scans:\n$p")
  }

  test("i70: containment candidates stay an equi-join over the ONE materialized sketch") {
    // VERDICT r20 ask #5: i70 had no plan pin. The shape that must hold
    // at 100 TB: the token sets materialize once (ExistingRDD — the
    // corpus is tokenized exactly once, like i14), the A-prefix × B-set
    // candidate join is an equi-join on (source, rk) with the lossless
    // |B| >= 0.9|A| length guard, and nothing plans a cartesian or an
    // unpartitioned window.
    val p = plan(Registry.byId("i70_containment_dedup").build(spark, dir))
    assert(p.contains("ExistingRDD"),
      s"i70: the sketch must be a materialized scan:\n$p")
    assert(!p.contains("Scan parquet") && !p.contains("FileScan parquet"),
      s"i70: no consumer may re-tokenize the corpus:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"i70: candidates must come from the (source, rk) equi-join:\n$p")
    assert(!p.contains("Window"), s"i70 must not plan a window:\n$p")
  }

  test("d17: CUSUM runs on ONE user_id Exchange — prefix sum and prefix min share the sort") {
    // The closed form S = P − min(0, runmin P) puts both running
    // aggregates AND the final per-user rollup on the same hash(user_id)
    // clustering; the only other Exchange is the 1-row global-mean
    // broadcast (SinglePartition, not hashpartitioning).
    val p = plan(Registry.byId("d17_cusum_changepoint").build(spark, dir))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"d17: expected ONE hash Exchange, got $shuffles:\n$p")
  }

  test("c17: equi-depth buckets come off the value DISTRIBUTION — one corpus shuffle") {
    // The corpus collapses to (vc, cnt) on the single hash(vc) Exchange;
    // the rank windows, bucket explode, and bucket rollup all run on the
    // bounded distribution (SinglePartition exchanges, not corpus-wide).
    val p = plan(Registry.byId("c17_equidepth_hist").build(spark, dir))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"c17: expected ONE hash Exchange, got $shuffles:\n$p")
  }

  test("e5: two-phase skyline — local (brand, salt) frontier, then brand merge; no nested loop") {
    // Phase 1 shuffles the corpus once on (brand, salt); phase 2
    // shuffles only the local frontiers on brand. A third hash Exchange
    // (or any BNLJ/Cartesian) means the dominance filter degenerated to
    // a join.
    val p = plan(Registry.byId("e5_skyline_pareto").build(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"skyline must be window-based, not a dominance join:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 2, s"e5: expected TWO hash Exchanges, got $shuffles:\n$p")
  }

  test("c16: mode runs on the bounded pair-count table — broadcast join, rank-1 pushdown") {
    // The (group, value) count is map-side combinable (partial+final
    // HashAggregate on ONE Exchange); the argmax window shuffles only
    // the bounded count table, with the rn=1 filter pushed into a
    // WindowGroupLimit so each map partition forwards one candidate
    // row per group.
    val p = plan(Registry.byId("c16_mode_agg").build(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"orders side must broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"), s"rn=1 must push down:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 2, s"c16: expected TWO hash Exchanges (count agg + argmax window), got $shuffles:\n$p")
  }

  test("j20: the six correlation moments ride ONE map-side-combinable aggregate") {
    // All six sums (n, Σx, Σy, Σxy, Σx², Σy²) must land in a single
    // partial/final HashAggregate pair over one corpus scan — a second
    // hash Exchange means a moment fell out of the combine.
    val p = plan(Registry.byId("j20_len_quality_corr").build(spark, dir))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"j20: expected ONE hash Exchange, got $shuffles:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"j20: expected ONE corpus scan, got $scans:\n$p")
  }

  test("m5: shot segmentation clusters both windows and the rollup on ONE doc_id Exchange") {
    // The cut flag (lag), the running shot index (prefix sum), and the
    // per-shot rollup all share hash(doc_id) clustering; a second
    // corpus-wide shuffle means a window key drifted.
    val p = plan(Registry.byId("m5_shot_segments").build(spark, dir))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"m5: expected ONE hash Exchange, got $shuffles:\n$p")
  }

  test("i84: survivorship reads the checkpointed edge list — no pair-pipeline rescan") {
    // The drop flag derives from the i2 pair table's localCheckpoint
    // (ExistingRDD); the only parquet scans are the corpus quality pass
    // and its broadcast dimension side.
    val p = plan(Registry.byId("i84_dedup_quality_shift").build(spark, dir))
    assert(p.contains("ExistingRDD"),
      s"edges must read the localCheckpoint, not recompute:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 2, s"i84: expected at most TWO parquet scans, got $scans:\n$p")
  }

  test("i85: all four truncation rankings come off ONE corpus sweep") {
    // The prefix dots explode to (qid, dim) long form, so the corpus is
    // scanned once (plus the broadcast query batch and the tiny spine
    // side) and the single rank window's Exchange is WindowGroupLimit-
    // pruned; the overlap is aggregate-shaped, never a corpus join.
    val p = plan(Registry.byId("i85_mrl_recall").build(spark, dir))
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 4, s"i85: expected at most FOUR parquet scans (1 sweep + broadcast sides), got $scans:\n$p")
    assert(p.contains("WindowGroupLimit"), s"rank must push down:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles <= 3, s"i85: expected at most THREE hash Exchanges (pruned rank window + two tiny overlap aggs), got $shuffles:\n$p")
  }

  test("i86: one overlap join, four depth counts in ONE aggregate") {
    // The exact and IVF depth-10 rankings meet in a single (qid, vec_id)
    // equi-join; the four conditional depth sums must share one
    // partial/final HashAggregate pair — four join passes (or four
    // aggregates) would quadruple the ranking cost.
    val p = plan(Registry.byId("i86_overlap_curve").build(spark, dir))
    val smj = "SortMergeJoin".r.findAllIn(p).size +
      "ShuffledHashJoin".r.findAllIn(p).size
    assert(smj == 1, s"i86: expected ONE shuffled equi-join, got $smj:\n$p")
    val hashAggs = "HashAggregate".r.findAllIn(p).size -
      "ObjectHashAggregate".r.findAllIn(p).size
    assert(hashAggs == 2, s"i86: expected one partial/final HashAggregate pair, got $hashAggs:\n$p")
    assert(p.contains("WindowGroupLimit"), s"depth-10 rank must push down:\n$p")
  }

  test("d22: both neighbor scans share ONE user Exchange") {
    // The backward (last ignore-nulls) and forward (first ignore-nulls)
    // frames differ, so two Window nodes are expected — but both must
    // ride the single hash(user_id) Exchange.
    val p = plan(Registry.byId("d22_interpolate").build(spark, dir))
    assert(!p.contains("Join"), s"d22 plans zero joins:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"d22: expected ONE hash Exchange, got $shuffles:\n$p")
  }

  test("b39: nearest-event join is joinless — both direction scans share ONE user Exchange") {
    val p = plan(Registry.byId("b39_nearest_join").build(spark, dir))
    assert(!p.contains("Join"), s"b39 plans zero joins (merged-stream windows):\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"b39: expected ONE hash Exchange, got $shuffles:\n$p")
  }

  test("b38: PIT join is equi-keyed with the validity residual — two equi-joins, no nested loop") {
    // Star join on orderkey + the versioned-dimension join on custkey
    // with [valid_from, valid_to) as residual filters; a BNLJ/Cartesian
    // means the planner lost an entity key (the b37 rule).
    val p = plan(Registry.byId("b38_pit_join").build(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"PIT must stay equi-keyed:\n$p")
    val joins = "SortMergeJoin".r.findAllIn(p).size +
      "ShuffledHashJoin".r.findAllIn(p).size +
      "BroadcastHashJoin".r.findAllIn(p).size
    assert(joins == 2, s"b38: star + versioned dim, got $joins:\n$p")
  }

  test("d21: the rolling median's lag chain rides ONE user Exchange; the median is row-local") {
    val p = plan(Registry.byId("d21_rolling_median").build(spark, dir))
    assert(!p.contains("Join"), s"d21 plans zero joins:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"d21: expected ONE hash Exchange, got $shuffles:\n$p")
    val windows = "Window".r.findAllIn(p).size - "WindowGroupLimit".r.findAllIn(p).size
    assert(windows == 1, s"d21: all 8 lags share ONE Window node, got $windows:\n$p")
  }

  test("d20: TWAP runs on ONE user Exchange — lead window and the rollup share the partitioning") {
    val p = plan(Registry.byId("d20_time_weighted_avg").build(spark, dir))
    assert(!p.contains("Join"), s"d20 plans zero joins:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"d20: expected ONE hash Exchange, got $shuffles:\n$p")
  }

  test("j23/d23: stability probe and activity grid are one aggregate over one scan") {
    for (id <- Seq("j23_metric_stability", "d23_activity_grid")) {
      val p = plan(Registry.byId(id).build(spark, dir))
      assert(!p.contains("Join"), s"$id plans zero joins:\n$p")
      val scans = "Scan parquet".r.findAllIn(p).size
      assert(scans == 1, s"$id: ONE scan, got $scans:\n$p")
      val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(shuffles == 1, s"$id: ONE hash Exchange, got $shuffles:\n$p")
    }
  }

  test("i96: the funnel attributes every doc in one pass — no cartesian, masked-fp dedup window") {
    // Row-local stages + ONE fp window (sequentially scoped by the
    // singleton mask) + the broadcast contamination screen; a
    // CartesianProduct or a second corpus-wide Window means a stage
    // stopped sharing the pass.
    val p = plan(Registry.byId("i96_curation_funnel").build(spark, dir))
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    val windows = "Window".r.findAllIn(p).size - "WindowGroupLimit".r.findAllIn(p).size
    assert(windows == 1, s"i96: ONE masked-fp window, got $windows:\n$p")
  }

  test("i95: quota selection collapses to the level histogram — one corpus Exchange, one scan") {
    // The greedy walk and the quota totals both run over the bounded
    // (source, level) frame; a second corpus scan (the i63 crossJoin
    // trap) or Exchange means the quota re-derived from raw docs.
    val p = plan(Registry.byId("i95_quota_select").build(spark, dir))
    assert(!p.contains("Join"), s"i95 plans zero joins:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"i95: ONE corpus scan, got $scans:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles <= 2,
      s"i95: histogram agg + bounded window re-key, got $shuffles:\n$p")
  }

  test("i94: the corpus collapses to the (source, level) histogram; the CDF runs on the bounded table") {
    // One corpus Exchange (the histogram aggregate); the midrank
    // windows shuffle only the ≤ sources×1001-row histogram.
    val p = plan(Registry.byId("i94_quantile_normalize").build(spark, dir))
    assert(!p.contains("Join"), s"i94 plans zero joins:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles <= 2,
      s"i94: histogram agg + bounded window re-key, got $shuffles:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"i94: ONE corpus scan, got $scans:\n$p")
  }

  test("i93: cap assignment is row-local; the waste report is one bounded rollup") {
    val p = plan(Registry.byId("i93_pad_waste").build(spark, dir))
    assert(!p.contains("Join"), s"i93 plans zero joins:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"i93: ONE corpus scan, got $scans:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"i93: ONE cap-rollup Exchange, got $shuffles:\n$p")
  }

  test("i92: the constraint gate is one stats pass + one anti-join — violations count, rows never ship") {
    // Four constraints share ONE aggregate over one orders scan; the FK
    // check is a single LeftAnti join counted. A third orders scan (or
    // any extra join) means a constraint stopped sharing the pass.
    val p = plan(Registry.byId("i92_constraint_check").build(spark, dir))
    val anti = "LeftAnti".r.findAllIn(p).size
    assert(anti == 1, s"i92: exactly one anti-join, got $anti:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 3, s"i92: orders ×2 + customer, got $scans:\n$p")
    assert(!p.contains("CartesianProduct"), s"1-row merges must broadcast:\n$p")
  }

  test("j22: fertility is one map-side-combinable lang aggregate over one scan") {
    val p = plan(Registry.byId("j22_tokenizer_fertility").build(spark, dir))
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"j22: expected ONE corpus scan, got $scans:\n$p")
    assert(!p.contains("Join"), s"j22 plans zero joins:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"j22: expected ONE lang Exchange, got $shuffles:\n$p")
  }

  test("i98: three thresholds, ONE aggregate — candidates keyed per source, never all-pairs") {
    val p = plan(Registry.byId("i98_lsh_recall_sweep").build(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pair joins must stay (source, key)-bucketed:\n$p")
    assert(p.contains("ExistingRDD"),
      s"the token sets must read their localCheckpoint:\n$p")
    // Five aggregate stages (signature build, candidate distinct ×2,
    // truth distinct, the 6-sum sweep), each a partial/final pair — an
    // 11th aggregate means a threshold stopped sharing the sweep pass.
    val hashAggs = "HashAggregate".r.findAllIn(p).size
    assert(hashAggs <= 10,
      s"i98: five partial/final aggregate stages, got $hashAggs:\n$p")
  }

  test("i97: eight depths, ONE aggregate per axis — no per-depth pass, no cartesian beyond broadcasts") {
    // Coverage's 8 conditional sums and probed-mass's 8 sums must land
    // in one partial/final aggregate each (the i86 pattern); the
    // centroid ranking is row-local over the broadcast codebook.
    val p = plan(Registry.byId("i97_nprobe_curve").build(spark, dir))
    assert(!p.contains("CartesianProduct"), s"1-row merges must broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"), s"exact top-3 rank must push down:\n$p")
    assert(p.contains("ExistingRDD"),
      s"the assignment table must read its localCheckpoint, not recompute:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 5,
      s"i97: one exact sweep + filter-pruned codebook/query sides, got $scans:\n$p")
  }

  test("i91: RRF fuses two query-batch-bounded lists; the fused top-3 pushes into WindowGroupLimit") {
    // The full-outer merge moves 2·|queries|·10 rows, never the corpus;
    // the fused rank's rn<=3 must push down. A Cartesian/BNLJ beyond
    // the broadcast query sweep means a ranking re-derived corpus-side.
    val p = plan(Registry.byId("i91_rank_fusion").build(spark, dir))
    assert(p.contains("WindowGroupLimit"), s"fused rn<=3 must push down:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    val fullOuter = "FullOuter".r.findAllIn(p).size
    assert(fullOuter == 1, s"i91: exactly one full-outer merge, got $fullOuter:\n$p")
  }

  test("b37: interval overlap is a user_id equi-join with range residuals — never a nested loop") {
    // The overlap predicates must ride the hash/sort-merge equi-join on
    // user_id as residual filters; a BNLJ or Cartesian means the planner
    // lost the entity key and the join degenerated to all-pairs.
    val p = plan(Registry.byId("b37_interval_overlap").build(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"overlap join must stay an equi-join:\n$p")
    val joins = "SortMergeJoin".r.findAllIn(p).size +
      "ShuffledHashJoin".r.findAllIn(p).size +
      "BroadcastHashJoin".r.findAllIn(p).size
    assert(joins == 1, s"b37: expected ONE equi-join, got $joins:\n$p")
  }

  test("d18: season windows and the rollup share ONE (user_id, hod) Exchange") {
    // The three full-frame season aggregates (n/Σx/Σx²) and the final
    // per-season rollup all cluster on hash(user_id, hod); a second
    // corpus-wide shuffle means the rollup re-keyed.
    val p = plan(Registry.byId("d18_seasonal_anomaly").build(spark, dir))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"d18: expected ONE hash Exchange, got $shuffles:\n$p")
  }

  test("i87: the rn<=10 filter pushes into WindowGroupLimit — map side forwards ≤10 rows per source") {
    val p = plan(Registry.byId("i87_topk_sample").build(spark, dir))
    assert(p.contains("WindowGroupLimit"), s"rn<=10 must push down:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"i87: expected ONE hash Exchange (the pruned source window), got $shuffles:\n$p")
  }

  test("j21: one tokenize pass feeds ref counts and scoring; the tercile window runs on the bounded histogram") {
    // The occurrence table is localCheckpoint'ed (ExistingRDD) so the
    // reference-slice counts and the corpus scoring share one tokenize;
    // exactly TWO Window nodes exist (the running-mass frame and the
    // full-frame total — distinct frame specs sharing one source
    // Exchange) and both sit above the (source, kbin) histogram
    // aggregate, never the per-doc corpus: the Exchange feeding them is
    // the only one keyed on source alone.
    val p = plan(Registry.byId("j21_ccnet_buckets").build(spark, dir))
    assert(p.contains("ExistingRDD"),
      s"occurrences must read the localCheckpoint:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no product joins in the scoring plan:\n$p")
    val windows = "Window".r.findAllIn(p).size - "WindowGroupLimit".r.findAllIn(p).size
    assert(windows == 2, s"j21: expected TWO windows over the histogram, got $windows:\n$p")
    val srcOnly = "hashpartitioning\\(source#\\d+, \\d+\\)".r.findAllIn(p).size
    assert(srcOnly == 1, s"j21: ONE source-keyed Exchange (the histogram window), got $srcOnly:\n$p")
  }

  test("m8: aspect assignment is a narrow map — no join with the bucket table, one bounded rollup") {
    // The 9-bucket argmin is a row-local array_min over a struct
    // literal; a Join (the unnest-buckets spelling) would 9× the corpus
    // for a row-local decision.
    val p = plan(Registry.byId("m8_aspect_buckets").build(spark, dir))
    assert(!p.contains("Join"), s"m8 plans zero joins:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"m8: ONE bucket-rollup Exchange, got $shuffles:\n$p")
  }

  test("m7: perceptual dedup is aggregate-shaped — no pair join anywhere") {
    // The only join is the dense-spine LEFT join on (doc_id, slot); the
    // dedup itself is a hash aggregate on the 8-byte perceptual hash.
    // Any BNLJ/Cartesian (or a second join) would mean the ham-0 design
    // regressed to a radius pair join — the measured-quadratic shape
    // this operator deliberately refuses.
    val p = plan(Registry.byId("m7_phash_dedup").build(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no product joins:\n$p")
    val joins = "SortMergeJoin".r.findAllIn(p).size +
      "ShuffledHashJoin".r.findAllIn(p).size +
      "BroadcastHashJoin".r.findAllIn(p).size
    assert(joins == 1, s"m7: only the spine join, got $joins:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles <= 4,
      s"m7: slot counts + spine + doc window + ph rollup, got $shuffles:\n$p")
  }

  test("m6: VAD windows and the chunk rollup share ONE doc_id Exchange") {
    // The lag gap flag, the running segment index, and the per-chunk
    // rollup all cluster on hash(doc_id) — the m5 shape on the voiced
    // subset.
    val p = plan(Registry.byId("m6_audio_vad").build(spark, dir))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"m6: expected ONE hash Exchange, got $shuffles:\n$p")
  }

  test("cc round: one large+small star round runs on FOUR hash Exchanges") {
    // Optimization r20: the star-contraction round computes each
    // neighborhood min as a window over the round's ONE per-star
    // shuffle (the former groupBy+join spelling paid two shuffles per
    // star — 7 exchanges per round). The round = largeStar (window on
    // u + terminal distinct) + smallStar (window on u + terminal
    // distinct). Each star's distinct is LOAD-BEARING, not shape
    // hygiene: inside a k-clique every edge row emits (node,
    // componentMin), so an undeduped hand-off feeds O(k²) rows per
    // clique into the next star (measured 2–3× on the clique-heavy
    // sf1 rung when largeStar's distinct was dropped). A count here is
    // the fixpoint's per-round cost at any scale — each extra Exchange
    // multiplies by the round count.
    import org.apache.spark.sql.functions.col
    import graft.operators.LlmOps
    val e = spark.range(0, 50).selectExpr("id AS u", "id + 1 AS v")
      .select(col("u"), col("v"))
    val p = plan(LlmOps.smallStar(LlmOps.largeStar(e)))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 4,
      s"cc round: expected 4 hash Exchanges (2 windows + 2 distincts), got $shuffles:\n$p")
    val windows = "Window".r.findAllIn(p).size
    assert(windows >= 2, s"cc round: both stars must use window mins:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"cc round: no join — the min rides the star's own shuffle:\n$p")
  }
}
