package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.LlmOps

/** Dev-only stage profiler for the CC-dedup family (optimization r20,
  * guide §1: measure first). Decomposes the i15-shaped pipeline into its
  * stages — sketch, candidate pairs, verify, star-contraction rounds —
  * and times each through the noop sink, so optimization effort lands on
  * the stage that actually pays. Not part of the driver contract.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.ProfileCC <sfDir> [reps]
  */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $label%-40s ${dt}%8.3f s")
      r
    }
    def drain(df: org.apache.spark.sql.DataFrame, label: String): Unit =
      timed(label)(df.write.format("noop").mode("overwrite").save())

    (1 to reps).foreach { rep =>
      println(s"=== rep $rep ===")
      val docs = Tables.load(spark, sfDir, "documents")
      // warmup scan
      drain(docs, "documents scan (warmup)")
      drain(LlmOps.hashedTokenSets(docs), "hashedTokenSets")
      val pairs = timed("nearDupPairs build+checkpoint") {
        LlmOps.nearDupPairs(docs).localCheckpoint(true)
      }
      println(s"[profile] pair count = ${pairs.count()}")
      val t0 = System.nanoTime()
      val labels = timed("clusterLabels (fixpoint rounds)") {
        LlmOps.clusterLabels(pairs).localCheckpoint(true)
      }
      println(s"[profile] label count = ${labels.count()}")
      drain(LlmOps.nearDupClusters(pairs), "nearDupClusters (labels+sizes)")
      val full = timed("i15 end-to-end") {
        LlmOps.nearDupClusters(LlmOps.nearDupPairs(docs))
          .write.format("noop").mode("overwrite").save()
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      val _ = (t0, full)
    }
    spark.stop()
  }
}
