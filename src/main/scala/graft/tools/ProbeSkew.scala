package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.LlmOps

/** Dev-only SKEW probe for the star-contraction hub (VERDICT r20 ask #7):
  * the window-min star round gathers N(u) at u's partition, so a mega-hub
  * could make one task's sort the round's straggler at scale (guide §2.5:
  * max/median > ~5 is worth fixing). This tool runs the CC fixpoint's
  * first large+small star round over the real near-dup pair graph and
  * reports the per-task duration distribution of every stage, straight
  * from a TaskEnd listener — the measurement the verdict asked for, so
  * the salting decision rests on numbers, not assertion.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.ProbeSkew <sfDir>
  */
object ProbeSkew {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stageTasks = scala.collection.concurrent.TrieMap
      .empty[Int, scala.collection.mutable.ArrayBuffer[Long]]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val buf = stageTasks.getOrElseUpdate(t.stageId,
          scala.collection.mutable.ArrayBuffer.empty[Long])
        buf.synchronized { buf += t.taskInfo.duration }
      }
    })

    val docs = Tables.load(spark, sfDir, "documents")
    val pairs = LlmOps.nearDupPairs(docs).localCheckpoint(true)
    println(s"[skew] pair count = ${pairs.count()}")
    val canon = pairs.select(
        greatest(col("doc_id1"), col("doc_id2")).as("u"),
        least(col("doc_id1"), col("doc_id2")).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint(true)
    println(s"[skew] canon edges = ${canon.count()}")
    // Hub profile of the symmetrized graph — the skew INPUT.
    val deg = canon.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val stats = deg.agg(max(col("d")).as("max_deg"),
      expr("percentile_approx(d, 0.5)").as("med_deg"),
      expr("percentile_approx(d, 0.99)").as("p99_deg")).head()
    println(s"[skew] degree max=${stats.get(0)} median=${stats.get(1)} p99=${stats.get(2)}")

    stageTasks.clear()
    spark.sparkContext.setJobDescription("skew probe: one large+small star round")
    val round = LlmOps.smallStar(LlmOps.largeStar(canon))
    round.write.format("noop").mode("overwrite").save()
    spark.sparkContext.setJobDescription(null)

    println(f"[skew] ${"stage"}%7s ${"tasks"}%6s ${"med ms"}%8s ${"max ms"}%8s ${"max/med"}%8s")
    stageTasks.toSeq.sortBy(_._1).foreach { case (sid, buf) =>
      val ds = buf.sorted
      if (ds.nonEmpty) {
        val med = math.max(1L, ds(ds.size / 2))
        val mx = ds.last
        println(f"[skew] $sid%7d ${ds.size}%6d $med%8d $mx%8d ${mx.toDouble / med}%8.2f")
      }
    }
    spark.stop()
  }
}
