package graft

import org.apache.spark.sql.functions._
import graft.functions.MinHashAgg
import graft.operators.PipelineOps

/** The typed Aggregator UDAF must produce exactly the signature the
  * relational i7 pipeline computes — one sketch, two surfaces.
  */
class MinHashAggSpec extends SparkTestBase {
  import spark.implicits._

  test("Aggregator MinHash == relational minhashSig") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")

    val viaAgg = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(MinHashAgg.toColumn.name("sig"))
      .toDF("doc_id", "sig")
      .select(col("doc_id") +:
        (0 until MinHashAgg.NumHashes).map(j => col("sig")(j).as(s"mh$j")): _*)

    val viaRelational = PipelineOps.minhashSig(docs).drop("source")
    assertSameRows(viaAgg, viaRelational)
  }

  test("merge is order-insensitive (partial aggregation safe)") {
    val a = MinHashAgg.zero; val b = MinHashAgg.zero
    MinHashAgg.reduce(a, "alpha"); MinHashAgg.reduce(a, "beta")
    MinHashAgg.reduce(b, "beta"); MinHashAgg.reduce(b, "alpha")
    assert(a.toSeq == b.toSeq)
    val m1 = MinHashAgg.merge(a.clone(), MinHashAgg.zero)
    assert(m1.toSeq == a.toSeq, "zero must be the merge identity")
  }
}
