package graft

import org.apache.spark.sql.functions._
import graft.operators.{PipelineOps, RelationalOps}

/** Salted-join correctness: salting redistributes a hot key across
  * buckets without changing the join result.
  */
class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join == plain join on the TPC-H fixtures") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"))
    val salted = RelationalOps.saltedJoin(
      orders, customer, "o_custkey", "c_custkey",
      buckets = 8, salt = pmod(hash(col("o_orderkey")), lit(8)))
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"))
    assertSameRows(salted, plain)
  }

  test("salted join == plain join under a manufactured hot key") {
    // 10k fact rows all on ONE key — the worst case salting exists for.
    val fact = (1 to 10000).map(i => (i.toLong, 7L)).toDF("row_id", "k")
    val dim = Seq((7L, "hot"), (8L, "cold")).toDF("dk", "v")
    val plain = fact.join(dim, col("k") === col("dk")).select("row_id", "v")
    val salted = RelationalOps.saltedJoin(
      fact, dim, "k", "dk", buckets = 16,
      salt = pmod(hash(col("row_id")), lit(16)))
      .select("row_id", "v")
    assertSameRows(salted, plain)
    assert(salted.count() == 10000)
  }

  test("hot-label pair self-join: salted == unsalted under a manufactured hot label") {
    // One label holds 200 vectors (19,900 pairs), others 3 each — the
    // skew shape i12 meets when a real corpus has a dominant label.
    val rows = (0 until 200).map(i => (99, i.toLong)) ++
      (0 until 30).map(i => (i % 10, (1000 + i).toLong))
    val e = rows.toDF("label", "vec_id")
      .withColumn("embedding",
        array((0 until 4).map(d => (col("vec_id") * (d + 1)).cast("float")): _*))
    // Threshold 100 forces ONLY label 99 onto the salted path (g=16);
    // the cold labels stay on the g=1 plain path in the same run.
    val salted = PipelineOps.labelPairs(e, hotThreshold = 100, salts = 16)
      .select("label", "i", "j")
    val unsalted = PipelineOps.labelPairs(e, hotThreshold = Long.MaxValue, salts = 16)
      .select("label", "i", "j")
    assertSameRows(salted, unsalted)
    assert(salted.count() == 200L * 199 / 2 + 10 * 3)
  }

  test("semdedup cluster self-join: salted == unsalted under a manufactured hot cluster") {
    // 150 vectors pile onto centroid 0 (the semantically-hot cluster a
    // fixed-k codebook can't bound), 10 land on centroid 1. Vectors are
    // v_i = [1, i/100, 0, 0], so sim(i,j) = round(1 + ij/1e4, 3) and
    // θ=1.5 keeps a nontrivial transitive edge set (only large-i pairs
    // connect) — drops, keeps and component resolution all exercise.
    val hot = (0 until 150).map { i =>
      (i.toLong, Seq(1f, i / 100f, 0f, 0f))
    }
    val cold = (0 until 10).map { i =>
      ((1000 + i).toLong, Seq(i / 100f, 1f, 0f, 0f))
    }
    val e = (hot ++ cold).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val cent = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0f, 1f, 0f, 0f))).toDF("cid", "cemb")
      .withColumn("cemb", col("cemb").cast("array<float>"))
    // Threshold 100 forces ONLY cluster 0 onto the salted path (g=16);
    // cluster 1 stays on the g=1 plain path in the same run.
    val salted = PipelineOps.semDedup(e, cent, 1.5, hotThreshold = 100, salts = 16)
    val unsalted = PipelineOps.semDedup(e, cent, 1.5, hotThreshold = Long.MaxValue)
    assertSameRows(salted, unsalted)
    // The drop is real: θ=1.5 connects i·j ≥ 5000 pairs, so high-i
    // vectors collapse into one component and survivors < 160.
    val n = salted.count()
    assert(n < 160 && n > 10, s"expected a non-vacuous drop, kept $n")
  }
}
