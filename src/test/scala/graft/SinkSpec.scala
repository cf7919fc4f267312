package graft

import org.apache.spark.sql.functions._

/** Curated-corpus delivery: partitioned parquet output whose partition
  * columns prune at planning time on read-back — the layout contract
  * that keeps downstream split/lang consumers from scanning the rest of
  * a 100 TB corpus.
  */
class SinkSpec extends SparkTestBase {

  test("partitioned curated output prunes on read-back and round-trips losslessly") {
    val out = "/tmp/graft-test-curated"
    val cur = Registry.byId("i17_curation_e2e").build(spark, "/root/testdata/sf0.001")
    Tables.writePartitioned(cur, out, "split")
    // hive layout: one directory per split value
    assert(new java.io.File(s"$out/split=train").isDirectory)
    val back = spark.read.parquet(out).filter(col("split") === "train")
    val p = back.queryExecution.executedPlan.toString.replaceAll("\\s", "")
    assert(p.contains("PartitionFilters:[") && p.contains("(split"),
      s"split predicate must prune partitions, not filter rows:\n$p")
    assertSameRows(
      back.select("doc_id", "quality", "split"),
      cur.filter(col("split") === "train"))
  }

  test("dimension join prunes partitions at RUNTIME (dynamic partition pruning)") {
    // Static pruning (above) needs a literal predicate; the common
    // production read is a JOIN against a dimension whose qualifying
    // values only exist at runtime (here: the languages whose corpus
    // share exceeds a threshold). Spark must insert a DynamicPruning
    // subquery on the partitioned scan — at 100 TB this is the
    // difference between scanning one lang directory and scanning the
    // corpus to discard it row-by-row.
    val out = "/tmp/graft-test-dpp"
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    Tables.writePartitioned(docs, out, "lang")
    val part = spark.read.parquet(out)
    val dim = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 100)  // runtime-valued qualifying set
      .select(col("lang"))
    val joined = part.join(dim, "lang")
    val p = joined.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"expected a DynamicPruning subquery on the partitioned scan:\n$p")
    val wantLangs = dim.collect().map(_.getString(0)).toSet
    assert(wantLangs.nonEmpty && joined.count() ==
      docs.filter(col("lang").isin(wantLangs.toSeq: _*)).count())
  }
}
