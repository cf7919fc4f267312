package graft

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TextFunctions

/** The native `graft_sorted_intersect_count` must be a drop-in for
  * `size(array_intersect(a, b))` on the engine's sorted sketch arrays:
  * identical counts on sorted-distinct inputs (the producers' contract),
  * identical distinct semantics under duplicate runs, identical null
  * handling, and it must run inside whole-stage codegen.
  */
class SetExprSpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Iterator.from(0)
      .map(i => g.apply(Gen.Parameters.default, Seed(seed + i)))
      .collect { case Some(a) => a }
      .take(n).toSeq

  // Sketch-shaped arrays: sorted, distinct, non-null longs. Values drawn
  // from a small domain so intersections are dense, plus full-range longs
  // so sign/overflow comparisons are exercised.
  private val sketchGen: Gen[Seq[Long]] =
    Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.chooseNum(-50L, 50L), Gen.chooseNum(Long.MinValue, Long.MaxValue)))
        .map(_.distinct.sorted.toSeq))

  // Same, but with duplicate runs kept (sorted, NOT distinct) — the
  // expression must still count DISTINCT overlap like array_intersect.
  private val dupGen: Gen[Seq[Long]] =
    Gen.choose(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-20L, 20L)).map(_.sorted.toSeq))

  private def bothCounts(rows: Seq[(Seq[Long], Seq[Long])]) =
    rows.toDF("a", "b").select(
      TextFunctions.sortedIntersectCount(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).as("builtin"))
      .collect()

  test("count matches size(array_intersect) on random sorted-distinct sketches") {
    bothCounts(sample(Gen.zip(sketchGen, sketchGen), 500, seed = 11L))
      .foreach(r => assert(r.get(0) == r.get(1),
        s"native=${r.get(0)} builtin=${r.get(1)}"))
  }

  test("count keeps distinct semantics under sorted duplicate runs") {
    bothCounts(sample(Gen.zip(dupGen, dupGen), 500, seed = 13L))
      .foreach(r => assert(r.get(0) == r.get(1),
        s"native=${r.get(0)} builtin=${r.get(1)}"))
  }

  test("null semantics match size(array_intersect)") {
    val rows: Seq[(Option[Seq[Option[Long]]], Option[Seq[Option[Long]]])] = Seq(
      (None, Some(Seq(Some(1L)))),                    // null array
      (Some(Seq(Some(1L))), None),                    // null array (right)
      (Some(Seq.empty), Some(Seq.empty)),             // empty ∧ empty → 0
      (Some(Seq.empty), Some(Seq(Some(1L)))),         // empty ∧ nonempty → 0
      // Null elements sort FIRST under sort_array's default order; one
      // shared null counts once, a one-sided null is skipped.
      (Some(Seq(None, Some(1L))), Some(Seq(None, Some(2L)))),
      (Some(Seq(None, Some(1L))), Some(Seq(Some(1L), Some(2L)))),
      (Some(Seq(None)), Some(Seq(None)))
    )
    val out = rows.toDF("a", "b").select(
      TextFunctions.sortedIntersectCount(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).as("builtin")).collect()
    out.foreach(r => assert(r.get(0) == r.get(1),
      s"null-semantics divergence: native=${r.get(0)} builtin=${r.get(1)}"))
    assert(out(0).isNullAt(0) && out(1).isNullAt(0), "null array must yield null")
    assert(out(2).getInt(0) == 0 && out(3).getInt(0) == 0)
    assert(out(4).getInt(0) == 1, "shared null counts once")
    assert(out(5).getInt(0) == 1, "one-sided null skipped, 1L shared")
    assert(out(6).getInt(0) == 1)
  }

  test("graft_sorted_intersect_count runs inside whole-stage codegen") {
    val df = spark.range(16)
      .select(
        sort_array(array((0 to 3).map(j => col("id") + j): _*)).as("a"),
        sort_array(array((0 to 3).map(j => lit(j.toLong * 2)): _*)).as("b"))
      .select(TextFunctions.sortedIntersectCount(col("a"), col("b")).as("x"))
      .filter(col("x") >= 0)
    val plan = df.queryExecution.executedPlan
    val codegenSpans = plan.collect { case w: WholeStageCodegenExec => w }
    assert(codegenSpans.nonEmpty, "expected a WholeStageCodegen span")
    assert(codegenSpans.exists(_.toString.contains("graft_sorted_intersect_count")),
      s"expression fell out of codegen:\n${plan.toString.take(2000)}")
    // id=0: {0,1,2,3} ∩ {0,2,4,6} = {0,2}
    assert(df.as[Int].head() == 2)
  }

  test("graft_sorted_intersect_count is callable from SQL") {
    Seq((Seq(1L, 5L, 9L), Seq(0L, 5L, 9L, 12L))).toDF("a", "b")
      .createOrReplaceTempView("sk_pairs")
    val out = spark.sql(
      "SELECT graft_sorted_intersect_count(a, b) AS c FROM sk_pairs")
    assert(out.as[Int].head() == 2)
  }

  test("rejects non-bigint-array arguments at analysis") {
    val e = intercept[Exception] {
      Seq((Seq("x"), Seq("y"))).toDF("a", "b")
        .select(TextFunctions.sortedIntersectCount(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array"),
      s"expected a type-check error mentioning arrays, got: ${e.getMessage.take(200)}")
  }
}
