package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorFunctions}

/** Determinism and algebraic properties of the text/vector primitives the
  * LLM-pipeline operators (SURVEY §2.D) are built from.
  */
class TextVectorSpec extends SparkTestBase {
  import spark.implicits._

  test("tokenHash16 stays within 16 bits and is deterministic") {
    val toks = Seq("alpha", "beta", "gamma", "", "Alpha", "alpha")
    val out = toks.toDF("t")
      .select(TextFunctions.tokenHash16(col("t")).as("h")).as[Long].collect()
    assert(out.forall(h => h >= 0 && h <= 0xFFFF))
    assert(out(0) == out(5)) // same token, same hash
    assert(out(0) != out(4)) // case-sensitive
  }

  test("fingerprint is order-sensitive and deterministic") {
    val out = Seq("a b c", "c b a", "a b c")
      .toDF("text")
      .select(TextFunctions.fingerprint(col("text")).as("fp")).as[Long].collect()
    assert(out(0) == out(2))
    assert(out(0) != out(1), "fingerprint must depend on token order")
    assert(out.forall(fp => fp >= 0 && fp < 2147483647L))
  }

  test("native graft_fingerprint == the HOF fold on the corpus and edge cases") {
    // The native expression must be bit-identical to the independent HOF
    // formulation it replaced — over every fixture text (codegen path,
    // whole-stage) and the edge shapes: empty-string token, single
    // token, long repeated text, and a NULL element mid-array (the HOF
    // poisons to NULL; so must the native fold).
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val both = docs.select(
      TextFunctions.fingerprint(col("text")).as("native"),
      TextFunctions.fingerprintHof(col("text")).as("hof"))
    assert(both.filter(col("native") =!= col("hof") ||
      col("native").isNull =!= col("hof").isNull).count() == 0)
    val edges = Seq("", "one", ("tok " * 500).trim).toDF("text")
      .select(
        TextFunctions.fingerprint(col("text")).as("native"),
        TextFunctions.fingerprintHof(col("text")).as("hof"))
      .as[(java.lang.Long, java.lang.Long)].collect()
    edges.foreach { case (n, h) => assert(n == h, s"native $n != hof $h") }
    val withNull = spark.sql(
      """SELECT graft_fingerprint(array('a', CAST(NULL AS STRING), 'b')) AS n,
        |       aggregate(array('a', CAST(NULL AS STRING), 'b'), 0L,
        |         (acc, t) -> (acc * 131 + CAST(conv(substring(md5(t), 1, 4), 16, 10) AS BIGINT)) % 2147483647) AS h
        |""".stripMargin).as[(java.lang.Long, java.lang.Long)].head()
    assert(withNull._1 == null && withNull._2 == null)
  }

  test("native graft_sanitize == the regex composition, incl. Unicode and edges") {
    // The byte-loop expression must be bit-identical to the regex
    // formulation it replaced (which stays the DuckDB oracle form) —
    // over the noised corpus the j11 registry query actually feeds it,
    // and the adversarial shapes the equivalence argument covers:
    // multi-byte UTF-8 (each byte ≥ 0x80 → stripped wholesale, like the
    // regex strips the char), supplementary chars (4-byte emoji),
    // leading/trailing/run spaces, punctuation-only, and empty.
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(concat(
        upper(expr("substring(text, 1, cast(doc_id % 4 as int))")),
        expr("substring(text, cast(doc_id % 4 as int) + 1)"),
        when(col("doc_id") % 2 === 0, lit("  ,,!!  ")).otherwise(lit(" .?;   ")),
        expr("lpad('', cast(doc_id % 3 + 1 as int), '.')")).as("s"))
    val edges = Seq(
      "", " ", "   ", "...", "a", " a ", "a  b", "  a,,b  c!  ",
      "café au lait", "ééxé", "naïve plan",
      "emoji 😀 mid", "😀", "tab\tand\nnewline",
      "MiXeD CaSe 123", "0 1 2  3").toDF("s")
    Seq(docs, edges).foreach { df =>
      val both = df.select(
        TextFunctions.sanitize(lower(col("s"))).as("native"),
        TextFunctions.sanitizeRegex(lower(col("s"))).as("regex"))
      assert(both.filter(col("native") =!= col("regex") ||
        col("native").isNull =!= col("regex").isNull).count() == 0,
        both.filter(col("native") =!= col("regex")).head(3).mkString("; "))
    }
    // NULL propagates like the regex chain.
    val n = spark.sql("SELECT graft_sanitize(CAST(NULL AS STRING)) AS x")
      .head().isNullAt(0)
    assert(n, "graft_sanitize(NULL) must be NULL")
  }

  test("graft_sanitize runs inside whole-stage codegen") {
    // A parquet-backed scan, not a local Seq — ConvertToLocalRelation
    // folds a literal frame into a LocalTableScan and the plan never
    // exercises doGenCode at all.
    val df = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(TextFunctions.sanitize(concat(col("text"), lit("  X!"))).as("x"))
    val plan = df.queryExecution.executedPlan
    val spans = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.exists(_.toString.contains("graft_sanitize")),
      s"graft_sanitize fell out of codegen:\n${plan.toString.take(2000)}")
    val one = df.limit(1).as[String].head()
    assert(!one.contains("!") && !one.endsWith(" "), s"bad sanitize: '$one'")
  }

  test("exact dedup is idempotent") {
    val docs = Seq(
      (1L, "x y"), (2L, "x y"), (3L, "z")).toDF("doc_id", "text")
    def dedup(df: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.expressions.Window
      df.withColumn("fp", md5(col("text")))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
        .filter(col("rn") === 1).drop("rn")
    }
    val once = dedup(docs)
    assertSameRows(dedup(once.select("doc_id", "text")), once)
    assert(once.count() == 2)
  }

  test("jaccard formula: bounds, symmetry, identity") {
    def jac(a: Set[String], b: Set[String]): Double = {
      val inter = (a & b).size.toDouble
      inter / (a.size + b.size - inter)
    }
    val rnd = new scala.util.Random(13)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    (1 to 200).foreach { _ =>
      val a = vocab.filter(_ => rnd.nextBoolean()).toSet + "a"
      val b = vocab.filter(_ => rnd.nextBoolean()).toSet + "b"
      val j = jac(a, b)
      assert(j >= 0.0 && j <= 1.0)
      assert(math.abs(j - jac(b, a)) < 1e-15)
      assert(jac(a, a) == 1.0)
    }
  }

  test("HLL sketch (approx_count_distinct) lands within 5% of exact") {
    // SURVEY §2 c2: the approx variant is T-only — its value is
    // engine-specific, so it can never be oracled, only bounded.
    val events = Tables.load(spark, "/root/testdata/sf0.01", "events")
    val row = events.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx")).head()
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"HLL too far off: approx=$approx exact=$exact")
  }

  test("dot/cosine/l2sq: unit self-similarity, symmetry, positivity") {
    val df = Seq(
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (Array(0.6f, 0.8f, 0.0f), Array(0.6f, 0.8f, 0.0f))
    ).toDF("a", "b")
    val rows = df.select(
      round(VectorFunctions.dot(col("a"), col("a")), 6).as("self"),
      round(VectorFunctions.dot(col("a"), col("b")), 6).as("ab"),
      round(VectorFunctions.dot(col("b"), col("a")), 6).as("ba"),
      round(VectorFunctions.l2sq(col("a"), col("b")), 6).as("d2"),
      round(VectorFunctions.cosine(col("a"), col("b")), 6).as("cos"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == 1.0) // unit vectors
      assert(r.getDouble(1) == r.getDouble(2)) // symmetry
      assert(r.getDouble(3) >= 0.0)
    }
    assert(rows(0).getDouble(4) == 0.0) // orthogonal
    assert(rows(1).getDouble(4) == 1.0) // identical
  }
}
