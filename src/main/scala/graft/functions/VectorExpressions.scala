package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two `array<float|double>` columns.
  *
  * This is the engine's single hottest scalar: every embedding query
  * (brute-force top-k, IVF centroid assignment/probing, pairwise cosine,
  * multimodal feature ranking) evaluates it once per (row, vector) pair.
  * The HOF formulation (`aggregate(zip_with(a, b, x*y), 0.0, acc+x)`)
  * materializes an intermediate product array per row and interprets two
  * lambda bodies per element — Catalyst's higher-order functions codegen
  * the loop but not the lambda, so each element pays an `InternalRow`
  * write plus interpreted-eval dispatch. This expression generates a
  * tight primitive loop instead: zero allocation, no virtual dispatch,
  * inlined into the enclosing whole-stage-codegen stage.
  *
  * Null semantics replicate the HOF form EXACTLY, so swapping it in can
  * never change an oracled result:
  *   - either array NULL → NULL (`nullIntolerant`);
  *   - length mismatch → NULL (zip_with pads with null elements and the
  *     double fold poisons on null);
  *   - any NULL element in the overlap → NULL (same poisoning);
  *   - two empty arrays → 0.0 (the fold's zero element).
  * The sum runs left-to-right in index order in double precision — the
  * same fixed summation order as the HOF fold (SURVEY.md §7 H3), so
  * results are bit-identical to the previous formulation.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot"

  private def elemOf(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOf(left).isDefined && elemOf(right).isDefined) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<FLOAT|DOUBLE> arguments, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  // Hoisted off the interpreted eval path: inside HOF lambdas (the k-wide
  // centroid argmax in i10/i20/i23) nullSafeEval runs per (row × centroid),
  // so the dataType pattern-match must not repeat per call.
  private lazy val leftIsFloat = elemOf(left).contains(FloatType)
  private lazy val rightIsFloat = elemOf(right).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xf = leftIsFloat
    val yf = rightIsFloat
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      def get(arr: String, e: Expression): String =
        if (elemOf(e).contains(FloatType)) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${get(a, left)} * ${get(b, right)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** `SparkSessionExtensions.injectFunction` descriptor: registers
    * `graft_dot(a, b)` so `call_function` / SQL can reach the native
    * expression through public API only (no private[sql] shims).
    */
  val description: (FunctionIdentifier,
      ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => children match {
      case Seq(a, b) => DotProduct(a, b)
      case cs => throw new IllegalArgumentException(
        s"graft_dot takes exactly 2 arguments, got ${cs.length}")
    }
  )
}
