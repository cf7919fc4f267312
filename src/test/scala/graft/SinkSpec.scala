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
}
