package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.PipelineOps

/** Dev tool (VERDICT r14 ask #9): re-grade the ANN evals against the
  * TWO-LEVEL router so BASELINE.md can record the before/after — the
  * recall evals exist precisely to re-grade routing changes.
  *
  * For each requested k, runs the SAME shipped plans under flat and
  * two-level assignment:
  *   - annRecall (the i28 eval) at nprobe ∈ {1, 2, k/4}: recall@3 sum
  *     over the 20-query batch — the routing-quality axis;
  *   - assignment agreement (fraction of rows whose routed cid equals
  *     the flat global argmax) and the subset-law violation count
  *     (must be 0);
  *   - bucket balance (max cluster size) under each routing — the
  *     quadratic-dedup-bound axis i24/i29 inherit.
  *
  * Usage: RouteEval <sfDir> <k1,k2,...> [out=ROUTEEVAL_<basename>.json]
  */
object RouteEval {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val ks = args(1).split(",").map(_.trim.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet").localCheckpoint(true)
    val n = emb.count()
    val q = PipelineOps.queryBatch(emb, 20)

    val rows = ks.map { k =>
      val cent = PipelineOps.stubCodebook(emb, k).localCheckpoint(true)
      val flat = PipelineOps.assignToCentroidsFlat(emb, cent)
        .localCheckpoint(true)
      val two = PipelineOps.assignToCentroids(emb, cent, k)
        .localCheckpoint(true)
      val trained = PipelineOps.assignToCentroidsTwoLevelTrained(emb, cent, k)
        .localCheckpoint(true)
      def recallSum(assigned: org.apache.spark.sql.DataFrame, nprobe: Int): Long =
        PipelineOps.annRecallAssigned(assigned, emb, cent, q, nprobe)
          .agg(sum(col("n_hit"))).head.getLong(0)
      val probes = Seq(1, 2, math.max(1, k / 4))
      def stats(a: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
        val f = flat.select(col("vec_id"), col("cid").as("fcid"),
          col("best_sim").as("fsim"))
        val j = a.select(col("vec_id"), col("cid"), col("best_sim"))
          .join(f, "vec_id").localCheckpoint(true)
        (j.filter(col("cid") === col("fcid")).count(),
          j.filter(col("best_sim") > col("fsim")).count(),
          a.groupBy(col("cid")).agg(count(lit(1)).as("c"))
            .agg(max(col("c"))).head.getLong(0))
      }
      val (agreeT, lawT, mbT) = stats(two)
      val (agreeTr, lawTr, mbTr) = stats(trained)
      val mbF = flat.groupBy(col("cid")).agg(count(lit(1)).as("c"))
        .agg(max(col("c"))).head.getLong(0)
      val rj = probes.map { p =>
        s"""{"nprobe":$p,"flat_hits":${recallSum(flat, p)},""" +
          s""""two_level_hits":${recallSum(two, p)},""" +
          s""""trained_hits":${recallSum(trained, p)}}"""
      }.mkString("[", ",", "]")
      s"""{"k":$k,"n":$n,"agreement":$agreeT,"agreement_trained":$agreeTr,""" +
        s""""law_violations":${lawT + lawTr},""" +
        s""""max_bucket_flat":$mbF,"max_bucket_two_level":$mbT,""" +
        s""""max_bucket_trained":$mbTr,"recall":$rj}"""
    }
    val tag = java.nio.file.Paths.get(dir).getFileName.toString
      .replaceAll("[^A-Za-z0-9._-]", "_")
    val line = s"""{"dir":"$dir","n_vectors":$n,"evals":${rows.mkString("[", ",", "]")}}"""
    println(line)
    val out = if (args.length > 2) args(2) else s"ROUTEEVAL_$tag.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    spark.stop()
  }
}
