package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built entirely from
  * codegen'd higher-order functions (`zip_with` / `aggregate`) — no UDFs,
  * so the hot path stays inside whole-stage codegen and never deserializes
  * the array to JVM objects.
  *
  * Determinism (SURVEY.md §7 H3): every element is cast to double BEFORE
  * multiplication and the fold runs in index order, so the summation order
  * is fixed and reproducible across partitionings and engines.
  */
object VectorFunctions {

  /** Index-ordered dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

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
