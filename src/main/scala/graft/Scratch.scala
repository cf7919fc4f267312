package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only micro-benchmark harness (not part of the engine; deleted or
  * ignored by the driver). Times alternative shingle-pipeline stages.
  */
object Scratch {
  def time(name: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
    def drain(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warmup scan
    drain(docs.select(col("doc_id"), length(col("text")).as("n")))

    val toks = split(col("text"), " ")
    val n = size(toks)
    val idx = sequence(lit(1), n - 2)
    val shinglesHof = when(n >= 3,
      transform(idx, i => concat_ws(" ",
        element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))
    val zipped = arrays_zip(
      slice(toks, lit(1), greatest(n - 2, lit(0))),
      slice(toks, lit(2), greatest(n - 2, lit(0))),
      slice(toks, lit(3), greatest(n - 2, lit(0))))

    val sets = graft.operators.LlmOps.hashedTokenSets(docs).localCheckpoint(true)
    for (round <- 1 to 2) {
      println(s"--- round $round")
      time("sigfast from corpus") {
        val aggs = (0 until 8).map(j =>
          min(xxhash64(lit(j), col("tok"))).as(s"mh$j"))
        drain(docs.select(col("doc_id"), col("source"),
            explode(array_distinct(split(col("text"), " "))).as("tok"))
          .groupBy(col("doc_id"), col("source"))
          .agg(aggs.head, aggs.tail: _*))
      }
      time("sig from checkpointed sets") {
        val aggs = (0 until 8).map(j =>
          min(xxhash64(lit(j), col("rk"))).as(s"mh$j"))
        drain(sets.select(col("doc_id"), col("source"), explode(col("rks")).as("rk"))
          .groupBy(col("doc_id"), col("source"))
          .agg(aggs.head, aggs.tail: _*))
      }
      time("sig narrow HOF over rks") {
        val cols = (0 until 8).map(j =>
          array_min(transform(col("rks"), r => xxhash64(lit(j), r))).as(s"mh$j"))
        drain(sets.select(col("doc_id") +: col("source") +: cols: _*))
      }
      def i14With(sig: org.apache.spark.sql.DataFrame,
          s2: org.apache.spark.sql.DataFrame): Unit = {
        val bandCols = (0 until 8).map(j =>
          struct(lit(j).as("b"), col(s"mh$j").as("v")))
        val bands = sig
          .select(col("doc_id"), col("source"), explode(array(bandCols: _*)).as("band"))
          .select(col("doc_id"), col("source"),
            col("band.b").as("b"), col("band.v").as("v"))
        val cand = bands.alias("l")
          .join(bands.alias("r"),
            col("l.b") === col("r.b") && col("l.v") === col("r.v") &&
              col("l.source") === col("r.source") &&
              col("l.doc_id") < col("r.doc_id"))
          .select(col("l.doc_id").as("doc_id1"), col("r.doc_id").as("doc_id2"))
          .distinct()
        drain(graft.operators.LlmOps.verifyJaccard(cand, s2))
      }
      time("i14 full: sig from sets") {
        val aggs = (0 until 8).map(j =>
          min(xxhash64(lit(j), col("rk"))).as(s"mh$j"))
        val sig = sets.select(col("doc_id"), col("source"), explode(col("rks")).as("rk"))
          .groupBy(col("doc_id"), col("source"))
          .agg(aggs.head, aggs.tail: _*)
        i14With(sig, sets)
      }
      time("i14 full: sigfast from corpus") {
        val aggs = (0 until 8).map(j =>
          min(xxhash64(lit(j), col("tok"))).as(s"mh$j"))
        val sig = docs.select(col("doc_id"), col("source"),
            explode(array_distinct(split(col("text"), " "))).as("tok"))
          .groupBy(col("doc_id"), col("source"))
          .agg(aggs.head, aggs.tail: _*)
        i14With(sig, sets)
      }
      time("i14 full: sig narrow HOF") {
        val cols = (0 until 8).map(j =>
          array_min(transform(col("rks"), r => xxhash64(lit(j), r))).as(s"mh$j"))
        val sig = sets.select(col("doc_id") +: col("source") +: cols: _*)
        i14With(sig, sets)
      }
      time("hof explode only") {
        drain(docs.select(col("doc_id"), explode(shinglesHof).as("sstr")))
      }
      time("zip explode only") {
        drain(docs.select(col("doc_id"), explode(zipped).as("z"))
          .select(col("doc_id"),
            concat_ws(" ", col("z.0"), col("z.1"), col("z.2")).as("sstr")))
      }
      time("hof + xxhash64 + groupBy") {
        drain(docs.select(col("doc_id"), col("source"), explode(shinglesHof).as("sstr"))
          .select(col("doc_id"), col("source"), xxhash64(col("sstr")).as("s"))
          .groupBy("doc_id", "source")
          .agg(sort_array(collect_set(col("s"))).as("rks")))
      }
      time("zip + xxhash64(t1,t2,t3) + groupBy") {
        drain(docs.select(col("doc_id"), col("source"), explode(zipped).as("z"))
          .select(col("doc_id"), col("source"),
            xxhash64(col("z.0"), col("z.1"), col("z.2")).as("s"))
          .groupBy("doc_id", "source")
          .agg(sort_array(collect_set(col("s"))).as("rks")))
      }
      time("hof + md5 + 4conv + groupBy") {
        val aggs = (0 until 4).map(j =>
          min(conv(substring(col("h"), 1 + 8 * j, 8), 16, 10).cast("long")).as(s"sm$j"))
        drain(docs.select(col("doc_id"), explode(shinglesHof).as("shingle"))
          .select(col("doc_id"), md5(col("shingle")).as("h"))
          .groupBy(col("doc_id"))
          .agg(aggs.head, aggs.tail: _*))
      }
      time("zip + md5 + 4conv + groupBy") {
        val aggs = (0 until 4).map(j =>
          min(conv(substring(col("h"), 1 + 8 * j, 8), 16, 10).cast("long")).as(s"sm$j"))
        drain(docs.select(col("doc_id"), explode(zipped).as("z"))
          .select(col("doc_id"),
            md5(concat_ws(" ", col("z.0"), col("z.1"), col("z.2"))).as("h"))
          .groupBy(col("doc_id"))
          .agg(aggs.head, aggs.tail: _*))
      }
      time("zip + md5 + 4strmin + groupBy") {
        val aggs = (0 until 4).map(j =>
          min(substring(col("h"), 1 + 8 * j, 8)).as(s"sm$j"))
        drain(docs.select(col("doc_id"), explode(zipped).as("z"))
          .select(col("doc_id"),
            md5(concat_ws(" ", col("z.0"), col("z.1"), col("z.2"))).as("h"))
          .groupBy(col("doc_id"))
          .agg(aggs.head, aggs.tail: _*)
          .select(col("doc_id") +: (0 until 4).map(j =>
            conv(col(s"sm$j"), 16, 10).cast("long").as(s"m$j")): _*))
      }
    }
    spark.stop()
  }
}
