package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns.
  *
  * `dot` (the hot path of every embedding query) is the native
  * [[DotProduct]] Catalyst expression — a codegen'd primitive loop with
  * zero per-row allocation, registered as `graft_dot` by
  * `GraftExtensions`. The HOF fallbacks below it exist where the native
  * form has no equivalent; note Catalyst higher-order functions codegen
  * the loop but INTERPRET the lambda body, so they are correct-but-slower
  * (measured 2-3× on sketch pipelines) — keep them off per-element hot
  * paths.
  *
  * Determinism (SURVEY.md §7 H3): every element is cast to double BEFORE
  * multiplication and the fold runs in index order, so the summation order
  * is fixed and reproducible across partitionings and engines. The native
  * `dot` keeps the identical left-to-right double summation and null
  * semantics as the HOF form it replaced (see [[DotProduct]]'s scaladoc),
  * so swapping it in changed no oracled value.
  */
object VectorFunctions {

  /** Index-ordered dot product in double precision (native, codegen'd). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Squared L2 distance in double precision, index-ordered. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm in double precision. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. The driver's embeddings are unit-normalized
    * (FIXTURES.md), so `cosine ≡ dot` there; this general form divides by
    * norms for non-normalized inputs.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
