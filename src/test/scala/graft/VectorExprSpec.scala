package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.VectorFunctions

/** The native `graft_dot` expression must be a drop-in replacement for the
  * HOF fold it superseded: bit-identical values (same left-to-right double
  * summation), identical null semantics, and it must actually run inside
  * whole-stage codegen (the point of writing it).
  */
class VectorExprSpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Iterator.from(0)
      .map(i => g.apply(Gen.Parameters.default, Seed(seed + i)))
      .collect { case Some(a) => a }
      .take(n).toSeq

  /** Bit-level double agreement: NaN == NaN, +0.0 != -0.0. (Scala's `==`
    * on boxed doubles is NUMERIC equality — NaN != NaN — so it cannot
    * assert the bit-identical contract.)
    */
  private def sameBits(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: java.lang.Double, y: java.lang.Double) =>
      java.lang.Double.doubleToRawLongBits(x) ==
        java.lang.Double.doubleToRawLongBits(y)
    case _ => false
  }

  /** The previous formulation, kept verbatim as the reference semantics. */
  private def hofDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  private val vecGen: Gen[Seq[Float]] =
    Gen.choose(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-10f, 10f, 0f, 1f, -1f)).map(_.toSeq))

  test("graft_dot is bit-identical to the HOF fold on random float vectors") {
    val pairs = sample(Gen.zip(vecGen, vecGen), 400, seed = 7L)
    val df = pairs.toDF("a", "b").select(
      VectorFunctions.dot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof"))
    df.collect().foreach(r => assert(sameBits(r.get(0), r.get(1)),
      s"native dot diverged from the HOF reference fold: ${r.get(0)} vs ${r.get(1)}"))
  }

  test("graft_dot null semantics match the HOF fold") {
    val rows: Seq[(Option[Seq[Option[Float]]], Option[Seq[Option[Float]]])] = Seq(
      (None, Some(Seq(Some(1f)))),                       // null array
      (Some(Seq(Some(1f))), None),                       // null array (right)
      (Some(Seq.empty), Some(Seq.empty)),                // empty ∧ empty → 0.0
      (Some(Seq(Some(1f), Some(2f))), Some(Seq(Some(3f)))),        // length mismatch
      (Some(Seq(Some(1f))), Some(Seq(Some(3f), Some(4f)))),        // mismatch (right longer)
      (Some(Seq(Some(1f), None)), Some(Seq(Some(3f), Some(4f)))),  // null element
      (Some(Seq(None)), Some(Seq(None))),                // all-null elements
      (Some(Seq(Some(2f), Some(3f))), Some(Seq(Some(4f), Some(5f)))) // plain
    )
    val df = rows.toDF("a", "b").select(
      VectorFunctions.dot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof"))
    df.collect().foreach(r => assert(r.get(0) == r.get(1),
      s"null-semantics divergence: native=${r.get(0)} hof=${r.get(1)}"))
    // And the specific values, not just agreement:
    val vals = df.collect().map(r => Option(r.get(0)))
    assert(vals(0).isEmpty && vals(1).isEmpty, "null array must yield null")
    assert(vals(2).contains(0.0), "empty arrays must yield 0.0")
    assert(vals(3).isEmpty && vals(4).isEmpty, "length mismatch must yield null")
    assert(vals(5).isEmpty && vals(6).isEmpty, "null element must yield null")
    assert(vals(7).contains(23.0))
  }

  test("graft_dot matches the HOF fold on NaN, infinities and signed zeros") {
    val specials = Seq(
      (Seq(Float.NaN, 1f), Seq(1f, 1f)),                       // NaN propagates
      (Seq(Float.PositiveInfinity, 1f), Seq(1f, 1f)),          // +Inf
      (Seq(Float.PositiveInfinity, 1f), Seq(0f, 1f)),          // Inf*0 = NaN
      (Seq(Float.NegativeInfinity, Float.PositiveInfinity), Seq(1f, 1f)), // -Inf + Inf = NaN
      (Seq(-0.0f, -0.0f), Seq(0.0f, 5f)),                      // signed zero
      (Seq(Float.MinPositiveValue, 1e30f), Seq(1e30f, 1e30f))  // denormal + overflow-ish
    )
    val df = specials.toDF("a", "b").select(
      VectorFunctions.dot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof"))
    df.collect().foreach(r => assert(sameBits(r.get(0), r.get(1)),
      s"IEEE-corner divergence: native=${r.get(0)} hof=${r.get(1)}"))
  }

  test("graft_dot accepts double arrays and mixed float/double sides") {
    val df = Seq((Seq(1.0, 2.0), Seq(3f, 4f))).toDF("d", "f")
      .select(VectorFunctions.dot(col("d"), col("f")).as("x"))
    assert(df.as[Double].head() == 11.0)
  }

  test("graft_dot runs inside whole-stage codegen") {
    // A literal-backed Seq.toDF would be folded to a LocalRelation at
    // optimization time (no codegen stage at all), so build the vectors
    // from a range source, the minimal codegen-capable scan.
    val df = spark.range(16)
      .select(
        array((0 to 3).map(j => (col("id") + j).cast("float")): _*).as("a"),
        array((0 to 3).map(j => lit(j.toFloat + 1f)): _*).as("b"))
      .select(VectorFunctions.dot(col("a"), col("b")).as("x"))
      .filter(col("x") > 0)
    val plan = df.queryExecution.executedPlan
    val codegenSpans = plan.collect { case w: WholeStageCodegenExec => w }
    assert(codegenSpans.nonEmpty, "expected a WholeStageCodegen span")
    val inside = codegenSpans.exists(_.toString.contains("graft_dot"))
    assert(inside, s"graft_dot fell out of codegen:\n${plan.toString.take(2000)}")
    // id=0: (0,1,2,3)·(1,2,3,4) = 0+2+6+12 = 20
    assert(df.as[Double].head() == 20.0)
  }

  test("graft_dot is callable from SQL through the injected registry") {
    Seq((Seq(1f, 0f), Seq(0.5f, 9f))).toDF("a", "b")
      .createOrReplaceTempView("vec_pairs")
    val out = spark.sql("SELECT graft_dot(a, b) AS d FROM vec_pairs")
    assert(out.as[Double].head() == 0.5)
  }

  test("graft_dot rejects non-array arguments at analysis") {
    val e = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b")
        .select(VectorFunctions.dot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array"),
      s"expected a type-check error mentioning arrays, got: ${e.getMessage.take(200)}")
  }
}
