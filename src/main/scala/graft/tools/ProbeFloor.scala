package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{SparkEntry, Tables}

/** Dev-only probe for the PER-QUERY FIXED OVERHEAD floor (VERDICT r20
  * ask #1b): ~178 of the registry's 253 queries run under 1 s at sf0.1
  * and sum to ~90 s of the envelope, so whatever every query pays
  * regardless of data size — job scheduling, relation creation (file
  * listing + parquet footer), Catalyst planning, codegen compilation —
  * is a first-class optimization target in its own right. This probe
  * decomposes that floor on representative shapes so effort lands on the
  * component that actually pays. Not part of the driver contract.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.ProbeFloor <sfDir> [reps]
  */
object ProbeFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def times(label: String, n: Int)(f: => Unit): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val s = ts.sorted
      println(f"[floor] $label%-46s min=${s.head}%7.3f med=${s(s.size / 2)}%7.3f max=${s.last}%7.3f s")
    }
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Warmup: codegen/classload/parquet-footer machinery.
    drain(SparkEntry.entry(spark))
    drain(spark.range(4).toDF())

    // 1. Pure job floor: local-relation noop (no scan, no shuffle).
    times("job floor: 1-row local noop", reps)(drain(spark.range(1).select(lit(1L).as("x"))))
    // 2. Scan floor, relation REUSED (no listing/footer cost in loop).
    val docsOnce = Tables.load(spark, sfDir, "documents")
    times("scan: documents, relation reused", reps)(drain(docsOnce.select(col("doc_id"))))
    // 3. Scan floor, relation FRESH each rep (listing + footer + plan).
    times("scan: documents, fresh relation", reps)(
      drain(Tables.load(spark, sfDir, "documents").select(col("doc_id"))))
    // 4. Relation creation only (listing + schema-from-footer).
    times("spark.read.parquet() only (documents)", reps)(
      { val _ = spark.read.parquet(s"$sfDir/documents.parquet") })
    times("spark.read.parquet() only (lineitem)", reps)(
      { val _ = spark.read.parquet(s"$sfDir/lineitem.parquet") })
    // 5. Representative registry shapes, end to end (the bench's view).
    Seq("j5_length_quantiles", "j2_quality_score", "b1_join_inner",
      "d1_window_rank", "c1_agg_hash_group").foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        times(s"registry e2e: $name", reps)(drain(fn(spark, sfDir)))
      }
    }
    // 6. Same queries, split into plan-time vs execution-time.
    Seq("j5_length_quantiles", "d1_window_rank").foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        times(s"plan only: $name", reps)(
          { val _ = fn(spark, sfDir).queryExecution.executedPlan })
        val df = fn(spark, sfDir)
        drain(df) // force codegen/AQE once
        times(s"exec only (pre-planned): $name", reps)(drain(df))
      }
    }
    spark.stop()
  }
}
