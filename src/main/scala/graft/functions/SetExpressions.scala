package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native intersection-size count over two SORTED `array<bigint>` columns.
  *
  * This is the verify-stage scalar of the whole dedup family: every
  * candidate pair that survives prefix/band filtering pays one
  * `size(array_intersect(rks1, rks2))` over its two hashed token-set
  * sketches (i2/i13/i14/i15 and every CC/quality consumer, i30's fuzzy
  * join, i70's containment, the pairStats truth builder feeding
  * i71/i75/i98). `ArrayIntersect` is general-purpose: per ROW it builds a
  * hash set over one side, probes it with the other, and materializes the
  * intersection ARRAY — all to be immediately reduced to its length. The
  * engine's sketches are `sort_array(collect_set(xxhash64(...)))`, i.e.
  * sorted, distinct, non-null longs, so the distinct-overlap COUNT is one
  * allocation-free two-pointer merge — the classic sorted-list
  * intersection (guide §4.2's "do the heavy lifting natively" applied to
  * the JVM row path), inlined into whole-stage codegen.
  *
  * Count semantics replicate `size(array_intersect(a, b))` EXACTLY on
  * sorted inputs (PropertySpec cross-checks on random sorted sketches):
  *   - either array NULL → NULL (`nullIntolerant`; `size(NULL)` is NULL
  *     under the engine's non-legacy config);
  *   - result counts DISTINCT common values (duplicate runs skip — the
  *     producers never emit duplicates, but the contract is total);
  *   - a NULL element present in BOTH arrays counts once (array_intersect
  *     keeps one null; `sort_array`'s default ascending order places
  *     nulls FIRST, which is the order this merge expects);
  *   - disjoint or empty inputs → 0.
  * REQUIRES both arrays sorted ascending (nulls first) — the producers'
  * `sort_array` contract; unsorted input gives an undercount, which is
  * why this lives behind a named graft_ function, not a rewrite rule.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sorted_intersect_count"

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left) && isLongArray(right)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    // Null elements sort first (sort_array ascending): one shared null
    // counts once, one-sided nulls are skipped.
    var xNull = false
    var yNull = false
    while (i < n && x.isNullAt(i)) { i += 1; xNull = true }
    while (j < m && y.isNullAt(j)) { j += 1; yNull = true }
    if (xNull && yNull) c += 1
    while (i < n && j < m) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else {
        c += 1
        i += 1; j += 1
        while (i < n && x.getLong(i) == xv) i += 1
        while (j < m && y.getLong(j) == yv) j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val xNull = ctx.freshName("xNull")
      val yNull = ctx.freshName("yNull")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |boolean $xNull = false, $yNull = false;
         |while ($i < $n && $a.isNullAt($i)) { $i++; $xNull = true; }
         |while ($j < $m && $b.isNullAt($j)) { $j++; $yNull = true; }
         |if ($xNull && $yNull) $c++;
         |while ($i < $n && $j < $m) {
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else {
         |    $c++; $i++; $j++;
         |    while ($i < $n && $a.getLong($i) == $xv) $i++;
         |    while ($j < $m && $b.getLong($j) == $yv) $j++;
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** `SparkSessionExtensions.injectFunction` descriptor for
    * `graft_sorted_intersect_count(a, b)` (same public-API-only route as
    * `graft_dot`).
    */
  val description: (FunctionIdentifier,
      ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_sorted_intersect_count"),
    new ExpressionInfo(classOf[SortedIntersectCount].getName,
      "graft_sorted_intersect_count"),
    (children: Seq[Expression]) => children match {
      case Seq(a, b) => SortedIntersectCount(a, b)
      case cs => throw new IllegalArgumentException(
        s"graft_sorted_intersect_count takes exactly 2 arguments, got ${cs.length}")
    }
  )
}
