package graft

import org.apache.spark.sql.functions._
import graft.operators.RelationalOps

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
}
