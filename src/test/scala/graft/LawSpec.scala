package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-operator algebraic laws for the round-10 frontier operators —
  * the invariants a DuckDB value-compare can't express: batch/stream
  * agreement (d7≡h3), SCD2 interval algebra (b15), Z-order's
  * two-dimensional skipping payoff vs a single-column sort (e3), and
  * lossless HLL sketch mergeability (the c9 scale contract).
  */
class LawSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("d7 batch sessionization projects onto h3's streaming session_window output") {
    // The batch gaps-and-islands form and Spark's session_window must
    // describe the SAME sessions: identical break rule (strict ≥ 10 min),
    // so (user, start, count) agree row-for-row. d7's extra columns
    // (ordinal id, end, duration, money sum) are the batch enrichment.
    val d7 = Registry.byId("d7_sessionize").build(spark, dir)
      .select(col("user_id"), col("session_start"), col("n_events").as("cnt"))
    val h3 = Registry.byId("h3_stream_session").build(spark, dir)
    assertSameRows(d7, h3)
    assert(h3.count() > 0)
  }

  test("b15 SCD2 output satisfies the interval algebra") {
    val scd = Registry.byId("b15_scd2_merge").build(spark, dir).cache()
    val w = Window.partitionBy(col("c_custkey")).orderBy(col("ver"))
    // exactly one open (is_current) version per key
    assert(scd.groupBy("c_custkey").agg(sum("is_current").as("n"))
      .filter(col("n") =!= 1).isEmpty, "exactly one current version per key")
    // versions chain gaplessly: valid_to == next version's valid_from,
    // and only the last version is open
    assert(scd.withColumn("nxt", lead(col("valid_from"), 1).over(w))
      .filter(!((col("valid_to").isNull && col("nxt").isNull) ||
        (col("valid_to") === col("nxt")))).isEmpty,
      "valid_to must chain to the next version's valid_from")
    // no-op suppression held: consecutive versions never repeat a value
    assert(scd.withColumn("prv", lag(col("attr"), 1).over(w))
      .filter(col("attr") === col("prv")).isEmpty,
      "consecutive versions must differ in attr")
    // and it actually fired: fewer versions than snapshot+changes rows,
    // while multi-version keys exist (non-vacuous both ways)
    val raw = Tables.load(spark, dir, "customer").count() +
      Tables.load(spark, dir, "orders").count()
    assert(scd.count() < raw, "suppression must drop some change rows")
    assert(scd.filter(col("ver") > 1).count() > 0, "multi-version keys must exist")
    scd.unpersist()
  }

  test("e3 Z-order zone maps prune in BOTH dimensions; a single-column sort cannot") {
    // sf0.01: partkey spans ~1..2000, suppkey ~1..100, zones fix the
    // high bits of BOTH. The data-skipping measure: fraction of zones
    // whose [min,max] overlaps a range predicate — what a reader would
    // have to scan.
    val d01 = "/root/testdata/sf0.01"
    val zones = Registry.byId("e3_zorder_cluster").build(spark, d01).cache()
    val nZones = zones.count().toDouble
    val pTouch = zones.filter(col("p_max") >= 1000 && col("p_min") <= 1063)
      .count() / nZones
    val sTouch = zones.filter(col("s_max") >= 1 && col("s_min") <= 40)
      .count() / nZones
    assert(pTouch < 0.15, s"partkey range must prune most zones, touched $pTouch")
    assert(sTouch < 0.75, s"suppkey range must prune some zones, touched $sTouch")
    // The counterfactual: zone the same rows by a partkey-ONLY sort
    // (bucket = partkey >> 5 — same zone count scale). partkey pruning
    // is perfect, but every zone spans ~the whole suppkey domain: the
    // second dimension cannot prune at all. That asymmetry is the whole
    // reason Z-order exists.
    val sorted = Tables.load(spark, d01, "lineitem")
      .groupBy(shiftright(col("l_partkey"), 5).as("zone_id"))
      .agg(min(col("l_suppkey")).as("s_min"), max(col("l_suppkey")).as("s_max"))
      .cache()
    val sortedTouch = sorted.filter(col("s_max") >= 1 && col("s_min") <= 40)
      .count().toDouble / sorted.count()
    assert(sortedTouch > 0.95,
      s"single-column sort must NOT prune the second dim, touched $sortedTouch")
    assert(sTouch < sortedTouch, "Z-order must beat the single-column sort on dim 2")
    zones.unpersist(); sorted.unpersist()
  }

  test("b16 compaction agrees with b15's current slice, minus the tombstoned keys") {
    // The sibling law: history (b15) and current-state (b16) views of
    // the SAME change log must agree on every surviving key's final
    // attribute; b16 additionally drops exactly the content-addressed
    // tombstone keys. (updated_at differs by design: b15's current
    // valid_from is the start of the final attr RUN — suppression —
    // while b16 stamps the last write; the attr value is what must
    // match.)
    val delRule = conv(substring(md5(concat(lit("del:"),
      col("c_custkey").cast("string"))), 1, 8), 16, 10).cast("long") % 100 < 5
    val b16 = Registry.byId("b16_cdc_upsert").build(spark, dir)
      .select(col("c_custkey"), col("attr")).cache()
    val want = Registry.byId("b15_scd2_merge").build(spark, dir)
      .filter(col("is_current") === 1)
      .filter(!delRule)
      .select(col("c_custkey"), col("attr"))
    assertSameRows(b16, want)
    // tombstones fire: ~5% of keys are gone
    val all = Tables.load(spark, dir, "customer").count()
    val kept = b16.count()
    assert(kept < all && kept > all * 8 / 10,
      s"tombstones must drop ~5% of $all keys, kept $kept")
    b16.unpersist()
  }

  test("c9's scale contract: HLL sketch merge is lossless (merged halves == whole)") {
    // The reason c9's sketch is the 100 TB answer: per-partition sketches
    // union into the global sketch with NO accuracy loss — the register
    // state of sketch(A ∪ B) is the register-wise max, exactly what
    // hll_union computes. So the estimate from merged half-sketches must
    // EQUAL the whole-table estimate bit-for-bit, not approximately.
    val orders = Tables.load(spark, dir, "orders")
    val whole = orders
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("est"))
      .collect()(0).getLong(0)
    val merged = orders
      .groupBy(pmod(col("o_orderkey"), lit(2)).as("half"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect()(0).getLong(0)
    assert(merged == whole, s"lossless merge: merged=$merged whole=$whole")
    assert(whole > 0)
  }

  test("b22 histogram conservation: buckets partition customers; weighted sum counts orders") {
    // Two exact integer identities a hash-compare can't attribute:
    // Σ custdist = |customer| (every customer lands in exactly one
    // bucket — the outer join kept the orderless ones), and
    // Σ c_count·custdist = |orders passing the ON residual| (every
    // qualifying order is counted exactly once).
    val rows = Registry.byId("b22_sql_q13").build(spark, dir).collect()
    val nCust = Tables.load(spark, dir, "customer").count()
    val nQual = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED").count()
    assert(rows.map(_.getAs[Long]("custdist")).sum == nCust,
      "buckets must partition the customer set")
    assert(rows.map(r => r.getAs[Long]("c_count") *
      r.getAs[Long]("custdist")).sum == nQual,
      "weighted bucket sum must count every qualifying order once")
  }

  test("b23 picks exactly the argmax supplier(s) of an independent revenue ranking") {
    // Independent model: rank suppliers by the same decimal revenue via
    // the DataFrame API (no scalar subquery) and take the max set.
    val out = Registry.byId("b23_sql_q15").build(spark, dir).collect()
      .map(_.getAs[Long]("s_suppkey")).toSet
    val rev = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount")).cast("decimal(18,4)")).as("rev"))
    val mx = rev.agg(max(col("rev")).as("mx"))
    val want = rev.crossJoin(broadcast(mx))
      .filter(col("rev") === col("mx"))
      .collect().map(_.getAs[Long]("l_suppkey")).toSet
    assert(out == want && out.nonEmpty,
      s"scalar-subquery gate must select the argmax set: got $out want $want")
  }

  test("i18 dedup-apply is complete: the deduped corpus contains NO J ≥ 0.9 pair") {
    // Canonicals of distinct clusters can never share a J ≥ 0.9 edge
    // (an edge would have merged the clusters), so re-running the pair
    // finder over the applied output must return empty — the fixpoint
    // property that makes one dedup pass sufficient.
    val docs = Tables.load(spark, dir, "documents")
    val surv = Registry.byId("i18_dedup_apply").build(spark, dir).select("doc_id")
    val deduped = docs.join(surv, "doc_id")
    assert(graft.operators.LlmOps.nearDupPairs(deduped).count() == 0,
      "dedup-apply left a J ≥ 0.9 pair in the corpus")
  }

  test("i70 dominates i2: J ≥ 0.9 implies BOTH directed containments ≥ 0.9") {
    // J(A,B) ≤ min(C(A→B), C(B→A)) pointwise, so every symmetric
    // Jaccard pair must appear in the directed containment output in
    // both orientations — the algebraic relation tying the two dedup
    // finders together (and a cheap end-to-end cross-check of both
    // candidate filters at once).
    val ct = Registry.byId("i70_containment_dedup").build(spark, dir)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nd = Registry.byId("i2_dedup_near").build(spark, dir)
      .select(col("doc_id1"), col("doc_id2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nd.nonEmpty)
    nd.foreach { case (a, b) =>
      assert(ct((a, b)) && ct((b, a)),
        s"J≥0.9 pair ($a,$b) missing a containment orientation")
    }
  }

  test("i79 triangle algebra: per-node bound and the mod-3 global identity") {
    // Each triangle contributes one count to each of its 3 corners, so
    // the global sum ≡ 0 (mod 3); per node, triangles through v are
    // edges among v's neighbors, bounded by C(deg, 2). Both hold for
    // ANY graph — a corner-explode or orientation bug breaks them.
    val tri = Registry.byId("i79_triangles").build(spark, dir).cache()
    assert(tri.count() > 0, "fixture graph must contain triangles")
    assert(tri.filter(
      col("n_tri") * 2 > col("deg") * (col("deg") - 1)).isEmpty,
      "n_tri exceeds C(deg, 2)")
    val total = tri.agg(sum("n_tri")).head.getLong(0)
    assert(total % 3 == 0, s"corner sum $total not divisible by 3")
    tri.unpersist()
  }

  test("i74 PageRank mass conservation: Σ pr = 0.15·N + 0.85·|V⁺| ± quantization") {
    // Every node with degree > 0 hands out exactly 1 unit of rank mass
    // (deg contributions of 1/deg each), so the damped total is
    // determined by the two node counts alone — up to the declared 1e-9
    // integer quantization of each contribution.
    val pr = Registry.byId("i74_pagerank_step").build(spark, dir).cache()
    val n = pr.count().toDouble
    val nActive = pr.filter(col("deg") > 0).count().toDouble
    val total = pr.agg(sum("pr")).head.getDouble(0)
    val expected = 0.15 * n + 0.85 * nActive
    assert(math.abs(total - expected) < 1e-2,
      s"rank mass $total drifted from $expected")
    pr.unpersist()
  }

  test("d10 funnel stages are monotone and bounded by the user count") {
    val f = Registry.byId("d10_event_funnel").build(spark, dir).head
    val (nu, s1, s2, s3) =
      (f.getLong(0), f.getLong(1), f.getLong(2), f.getLong(3))
    assert(s1 <= nu && s2 <= s1 && s3 <= s2,
      s"funnel ($nu, $s1, $s2, $s3) not monotone")
    assert(s3 > 0, "the purchase stage must be non-vacuous at every SF")
  }

  test("b34 Bloom prescreen is output-invisible: identical to the plain semi join") {
    // The i68 law in relational form: false positives may pass the
    // bitmap but MUST die in the exact semi join.
    val bloom = Registry.byId("b34_bloom_semi_prune").build(spark, dir)
    Tables.load(spark, dir, "orders").createOrReplaceTempView("v_orders")
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("v_lineitem")
    val plain = spark.sql(
      """WITH u AS (SELECT o_orderkey FROM v_orders WHERE o_orderpriority = '1-URGENT'),
        |ex AS (SELECT l_orderkey, l_extendedprice
        |       FROM v_lineitem LEFT SEMI JOIN u ON l_orderkey = u.o_orderkey)
        |SELECT l_orderkey,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
        |FROM ex GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin)
    assertSameRows(bloom, plain)
  }

  test("d9 forward fill: agrees where observed, persists once seen") {
    val f = Registry.byId("d9_forward_fill").build(spark, dir).cache()
    assert(f.filter(col("raw").isNotNull && col("filled") =!= col("raw")).isEmpty,
      "fill must not rewrite observed values")
    // Once a user has a filled value, later rows never revert to null —
    // checked in the SAME (ts, event_id) order the fill itself uses
    // (ts re-joined: the query's output drops it).
    val ev = Tables.load(spark, dir, "events").select(col("event_id"), col("ts"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    assert(f.join(ev, "event_id")
      .withColumn("prev", lag(col("filled"), 1).over(w))
      .filter(col("prev").isNotNull && col("filled").isNull).isEmpty,
      "fill reverted to null after a value was seen")
    assert(f.filter(col("raw").isNull && col("filled").isNotNull).count() > 0,
      "the fill must actually repair gaps at every SF")
    f.unpersist()
  }

  test("d13 cohort retention: offset-0 is total, activity never exceeds the cohort") {
    val r = Registry.byId("d13_retention_cohort").build(spark, dir).cache()
    // offset 0 IS the cohort definition year: full retention by construction
    assert(r.filter(col("offset_yr") === 0 &&
      (col("n_active") =!= col("cohort_n") || col("retention") =!= 1.0)).isEmpty,
      "offset-0 must be the whole cohort")
    // activity is a subset of the cohort at every offset
    assert(r.filter(col("n_active") > col("cohort_n")).isEmpty,
      "a cohort-year's active count exceeded its cohort size")
    // cohort sizes partition the customer base: Σ cohort_n = |distinct custkey|
    val total = r.filter(col("offset_yr") === 0)
      .agg(sum("cohort_n")).head.getLong(0)
    val nCust = Tables.load(spark, dir, "orders")
      .select("o_custkey").distinct().count()
    assert(total == nCust, s"cohorts sum to $total, customers $nCust")
    assert(r.filter(col("offset_yr") > 0).count() > 0,
      "multi-year history must produce non-zero offsets")
    r.unpersist()
  }

  test("d14 interval coverage matches a per-user driver-side merge") {
    val got = Registry.byId("d14_interval_coverage").build(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val len = 43200L * 1000000L
    val want = Tables.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("st"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, rows) =>
        val ivs = rows.map(_._2).sorted.map(s => (s, s + len))
        // classic sequential merge — the oracle the sweep must reproduce
        val merged = ivs.foldLeft(List.empty[(Long, Long)]) {
          case (Nil, iv) => iv :: Nil
          case ((s0, e0) :: rest, (s, e)) =>
            if (s > e0) (s, e) :: (s0, e0) :: rest
            else (s0, math.max(e0, e)) :: rest
        }
        u -> (merged.size.toLong, merged.map(b => b._2 - b._1).sum)
      }
    assert(got == want, s"sweep disagrees with sequential merge")
    assert(got.values.exists(_._1 > 1), "coverage must split into blocks")
  }

  test("d15 EWMA: dyadic weights reproduce the direct per-row fold; full rows weigh 255") {
    val got = Registry.byId("d15_ewma_decay").build(spark, dir).cache()
    // after 7 predecessors the denominator saturates at Σ 2^i = 255
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val withIdx = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("value") * 100).cast("long").as("c"))
      .withColumn("rn", row_number().over(w))
    assert(got.join(withIdx.select("event_id", "rn"), "event_id")
      .filter(col("rn") >= 8 && col("ewma_den") =!= 255L).isEmpty,
      "saturated rows must weigh 255")
    // driver-side direct fold over each user's (ts, event_id)-ordered
    // sequence (rn carries that order down to the driver)
    val orderedByRn = withIdx.select("user_id", "rn", "event_id", "c")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val wantNum = orderedByRn.flatMap { case (_, rows) =>
      val ord = rows.sortBy(_._2)
      ord.indices.map { i =>
        val num = (0 until 8).collect {
          case k if i - k >= 0 => ord(i - k)._4 * (1L << (7 - k))
        }.sum
        ord(i)._3 -> num
      }
    }
    val gotNum = got.select("event_id", "ewma_num")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    wantNum.foreach { case (id, n) =>
      assert(gotNum(id) == n, s"event $id: num ${gotNum(id)} != direct $n")
    }
    assert(wantNum.nonEmpty)
    got.unpersist()
  }

  test("d16 rolling trend: num/den reproduce a driver-side least squares; den=0 only at n=1") {
    val got = Registry.byId("d16_rolling_trend").build(spark, dir).cache()
    assert(got.filter(col("den") === 0 && col("n_obs") =!= 1).isEmpty,
      "den=0 must mean a single observation (x's are distinct)")
    assert(got.filter(col("den") === 0 && col("slope").isNotNull).isEmpty,
      "no slope without variance")
    // direct least squares over each user's (ts, event_id)-ordered tail
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val seqd = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("value") * 100).cast("long").as("c"))
      .withColumn("rn", row_number().over(w))
      .select("user_id", "event_id", "c", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .groupBy(_._1)
    val want = seqd.flatMap { case (_, rows) =>
      val ord = rows.sortBy(_._4)
      ord.indices.map { i =>
        val tail = (math.max(0, i - 7) to i).map(j => ord(j)._3)
        val n = tail.size.toLong
        val xs = (8 - n until 8).map(_.toLong) // oldest x, ..., current x=7
        val sx = xs.sum; val sy = tail.sum
        val sxy = xs.zip(tail).map { case (x, y) => x * y }.sum
        val sxx = xs.map(x => x * x).sum
        ord(i)._2 -> (n * sxy - sx * sy, n * sxx - sx * sx)
      }
    }
    val gotNd = got.select("event_id", "num", "den")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    want.foreach { case (id, nd) =>
      assert(gotNd(id) == nd, s"event $id: ${gotNd(id)} != direct $nd")
    }
    assert(want.nonEmpty)
    got.unpersist()
  }

  test("c17 equi-depth buckets: counts partition n into near-equal shares, ranges nest") {
    val h = Registry.byId("c17_equidepth_hist").build(spark, dir).cache()
    val n = Tables.load(spark, dir, "events").count()
    val rows = h.orderBy("bucket").collect()
    assert(rows.map(_.getLong(1)).sum == n, "bucket counts must partition the corpus")
    // exact rank-formula sizes: every bucket holds floor(n/B) or ceil(n/B)
    val (fl, ce) = (n / 12, (n + 11) / 12)
    rows.foreach { r =>
      assert(r.getLong(1) == fl || r.getLong(1) == ce,
        s"bucket ${r.getLong(0)} size ${r.getLong(1)} not in {$fl, $ce}")
    }
    // value ranges are non-decreasing bucket to bucket (runs may straddle:
    // a boundary value can be both one bucket's hi and the next one's lo)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) <= b.getLong(2),
        s"bucket ${a.getLong(0)} hi ${a.getLong(3)} > next lo ${b.getLong(2)}")
    case _ => ()
    }
    h.unpersist()
  }

  test("d17 CUSUM: alarms and timestamps cohere; the statistic is non-negative") {
    val c = Registry.byId("d17_cusum_changepoint").build(spark, dir).cache()
    assert(c.filter(col("max_cusum_c") < 0).isEmpty,
      "S = P - min(0, runmin P) is non-negative by construction")
    assert(c.filter(col("n_alarm") > 0 && col("first_alarm_ts").isNull).isEmpty,
      "an alarmed user must carry its first trip time")
    assert(c.filter(col("n_alarm") === 0 && col("first_alarm_ts").isNotNull).isEmpty,
      "no trip time without an alarm")
    assert(c.filter(col("n_alarm") > 0).count() > 0,
      "the fixture must trip at least one user (threshold not vacuous)")
    assert(c.filter(col("n_alarm") === 0).count() > 0,
      "the threshold must not trip everyone")
    c.unpersist()
  }

  test("e5 skyline: the two-phase frontier equals the direct per-brand frontier") {
    // Exactness of the salt-then-merge decomposition: a driver-side
    // quadratic dominance check over the (small) fixture is the model.
    val got = Registry.byId("e5_skyline_pareto").build(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val parts = Tables.load(spark, dir, "part")
      .select(col("p_brand"), col("p_partkey"),
        round(col("p_retailprice") * 100).cast("long").as("pc"),
        col("p_size").cast("long").as("sz"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = parts.filter { case (b, _, pc, sz) =>
      !parts.exists { case (b2, _, pc2, sz2) =>
        b2 == b && pc2 <= pc && sz2 >= sz && (pc2 < pc || sz2 > sz)
      }
    }.map(p => (p._1, p._2)).toSet
    assert(got == want, s"frontier mismatch: extra=${got -- want} missing=${want -- got}")
    assert(want.nonEmpty && want.size < parts.length,
      "fixture must have a non-trivial frontier")
  }

  test("i89 excision agrees with a driver-side model and is idempotent") {
    def segs(text: String): Seq[String] =
      text.split(" ", -1).grouped(2).map(_.mkString(" ")).toSeq
    def keep(ss: Seq[String]): Seq[String] =
      ss.zipWithIndex.filter { case (g, j) => ss.indexOf(g) == j }.map(_._1)
    def fp(ss: Seq[String]): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(ss.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val got = Registry.byId("i89_intradoc_excise").build(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
    assert(docs.nonEmpty)
    var sawDup = false
    docs.foreach { r =>
      val ss = segs(r.getString(1)); val k = keep(ss)
      assert(got(r.getLong(0)) == ((ss.size.toLong, k.size.toLong, fp(k))),
        s"doc ${r.getLong(0)} mismatch")
      if (k.size < ss.size) sawDup = true
      // Idempotence: first-occurrence keep is a fixpoint.
      assert(keep(k) == k, s"doc ${r.getLong(0)} not idempotent")
    }
    assert(sawDup, "fixture must contain at least one intra-doc repeat")
  }

  test("d21 rolling median agrees with a driver-side sort-and-middle model") {
    val got = Registry.byId("d21_rolling_median").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(3), r.getLong(4))).toMap
    val events = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getLong(3)))
    events.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3.getTime, r._2))
      ordered.indices.foreach { i =>
        val frame = ordered.slice(math.max(0, i - 7), i + 1).map(_._4).sorted
        val want = (frame.size.toLong, frame((frame.size + 1) / 2 - 1))
        val key = (ordered(i)._1, ordered(i)._2)
        assert(got(key) == want, s"$key: got ${got(key)}, want $want")
      }
    }
    assert(events.nonEmpty)
  }

  test("m8 rational argmin equals the exact-fraction argmin; buckets partition the corpus") {
    // The model compares |w/h − p/q| as TRUE fractions (cross-multiplied
    // BigInt compare) — a float model disagrees on this very fixture at
    // exact midpoints (w/h = 7/6 is equidistant from 1:1 and 4:3, and
    // 4/3's float rounding breaks the tie the wrong way), which is the
    // drift the lcm-scaled integer form exists to avoid.
    val buckets = Seq((1, 1, "1:1"), (4, 3, "4:3"), (3, 4, "3:4"),
      (16, 9, "16:9"), (9, 16, "9:16"), (3, 2, "3:2"),
      (2, 3, "2:3"), (2, 1, "2:1"), (1, 2, "1:2"))
    val meta = Registry.byId("m1_multimodal_meta").build(spark, dir)
      .select("width", "height").collect().map(r => (r.getLong(0), r.getLong(1)))
    val wantCounts = meta.groupBy { case (w, h) =>
      buckets.zipWithIndex.reduceLeft[((Int, Int, String), Int)] {
        case (best @ ((p1, q1, _), i1), cand @ ((p2, q2, _), i2)) =>
          val n1 = BigInt((w * q1 - h * p1).abs) * q2
          val n2 = BigInt((w * q2 - h * p2).abs) * q1
          if (n2 < n1 || (n2 == n1 && i2 < i1)) cand else best
      }._1._3
    }.map { case (b, xs) => b -> xs.size.toLong }
    val got = Registry.byId("m8_aspect_buckets").build(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == wantCounts, s"got $got want $wantCounts")
    assert(got.values.sum == meta.length, "buckets must partition the corpus")
  }

  test("d22 interpolation is bounded by its neighbors and passes observations through") {
    val rows = Registry.byId("d22_interpolate").build(spark, dir).cache()
    // observed rows pass through unchanged
    assert(rows.filter(col("rawc").isNotNull && col("interp_c") =!= col("rawc")).isEmpty)
    // the fixture must actually interpolate something
    assert(rows.filter(col("rawc").isNull && col("interp_c").isNotNull).count() > 0)
    rows.unpersist()
  }

  test("i98 sweep algebra: recall non-decreasing in threshold; hits never exceed truth; truth sets nest") {
    val rows = Registry.byId("i98_lsh_recall_sweep").build(spark, dir)
      .orderBy("threshold_milli").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"hits > truth at ${r.getLong(0)}")
    }
    // Tighter thresholds shrink the truth set and can only help the
    // fixed banding: recall is monotone non-decreasing in t.
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) >= b.getLong(1), "truth sets must nest")
      assert(a.getLong(3) <= b.getLong(3), "recall must be monotone in t")
    case _ => ()
    }
    assert(rows.head.getLong(1) > rows.last.getLong(1),
      "the sweep must be non-degenerate (strictly more pairs at 0.7)")
  }

  test("j21 tercile masses: head never exceeds a third, head+middle never exceeds two thirds") {
    val b = Registry.byId("j21_ccnet_buckets").build(spark, dir).cache()
    val per = b.groupBy("source").pivot("bucket", Seq("head", "middle", "tail"))
      .sum("n_bigrams").na.fill(0L).collect()
    assert(per.nonEmpty)
    per.foreach { r =>
      val (h, m, t) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val tot = h + m + t
      assert(h * 3 <= tot, s"${r.getString(0)}: head $h exceeds tot/3 of $tot")
      assert((h + m) * 3 <= 2 * tot, s"${r.getString(0)}: head+middle exceeds 2/3")
      assert(t > 0, s"${r.getString(0)}: tail holds the boundary mass by construction")
    }
    b.unpersist()
  }
}
