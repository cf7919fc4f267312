package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join: the pre-shuffle technique for repeated
  * large⋈large joins at 100 TB. Writing both fact tables bucketed on the
  * join key with the same bucket count lets every subsequent join run
  * with ZERO shuffle exchanges — the bucketing metadata satisfies the
  * join's required distribution, so each task reads matching buckets
  * from both sides. One write-time shuffle is amortized over every later
  * join/aggregate on that key (the same reason the reference pins one
  * goroutine per shard: co-location beats re-partitioning per query).
  */
class BucketSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** Idempotent setup shared by every test so each can run in isolation.
    * The in-memory catalog dies with each test JVM but the warehouse
    * directory survives — DROP TABLE alone would leave a stale location
    * and the next run's saveAsTable fails LOCATION_ALREADY_EXISTS.
    */
  private lazy val bucketedTables: Unit = {
    Seq("orders_bucketed", "customer_bucketed").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      rmrf(new java.io.File(s"/tmp/graft-test-warehouse/$tbl"))
    }
    Tables.load(spark, dir, "orders").write.format("parquet")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_bucketed")
    Tables.load(spark, dir, "customer").write.format("parquet")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_bucketed")
  }

  test("join of same-bucketed tables plans no shuffle exchange and matches the plain join") {
    bucketedTables
    // Force the shuffle-join path (at sf0.001 Catalyst would broadcast
    // the dim and hide the property under test).
    withBroadcastDisabled {
      val j = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"))
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("ShuffleExchange") && !p.contains("Exchange hashpartitioning"),
        s"bucketed join must not re-shuffle either side:\n$p")
      val plain = Tables.load(spark, dir, "orders")
        .join(Tables.load(spark, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"))
      assertSameRows(j, plain)
    }
  }

  test("aggregation on the bucket key also skips the shuffle") {
    bucketedTables
    withBroadcastDisabled {
      val agg = spark.table("orders_bucketed")
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      val p = agg.queryExecution.executedPlan.toString
      assert(!p.contains("ShuffleExchange") && !p.contains("Exchange hashpartitioning"),
        s"groupBy on the bucket key must reuse the bucketing:\n$p")
      assert(agg.count() ==
        Tables.load(spark, dir, "orders").select("o_custkey").distinct().count())
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
