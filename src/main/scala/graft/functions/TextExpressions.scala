package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling-hash fingerprint over an `array<string>`
  * token column: `acc := (acc * 131 + hash16(t)) mod (2^31 − 1)` folded
  * in index order, where `hash16(t)` is the first 16 bits of md5(t) —
  * exactly `TextFunctions.fingerprint`'s HOF semantics (the DuckDB j4
  * oracle's `list_reduce` arithmetic), natively.
  *
  * Why an `Expression`: the `aggregate` HOF codegens its loop but
  * INTERPRETS the lambda body, so every token pays interpreted-eval
  * dispatch through the md5 → substring → conv chain plus an
  * intermediate `InternalRow` write. This fold runs as one generated
  * loop calling a single static digest helper — no per-element
  * expression tree, no substring/number-parse detour (the first two
  * digest bytes ARE the parsed value of the first 4 hex chars).
  *
  * Null semantics replicate the HOF form EXACTLY (swap-in can never
  * change an oracled value): NULL array → NULL (`nullIntolerant`); a
  * NULL element poisons the whole fold → NULL (md5(NULL) is NULL and
  * the arithmetic propagates); empty array → 0 (the fold's zero).
  */
case class PolyFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<STRING> argument, got ${t.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      acc = PolyFingerprint.step(acc, arr.getUTF8String(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val cls = PolyFingerprint.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |final int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc = $cls.step($acc, $a.getUTF8String($i));
         |}
         |if (!${ev.isNull}) ${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyFingerprint {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** One fold step: `(acc * 131 + first16bits(md5(t))) mod (2^31 − 1)`.
    * The first 4 hex chars of the digest are exactly its first two
    * bytes, so the parse is two masks and a shift. Called from both the
    * interpreted eval and the generated loop.
    */
  def step(acc: Long, t: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(t.getBytes)
    val h = ((d(0) & 0xffL) << 8) | (d(1) & 0xffL)
    (acc * 131L + h) % 2147483647L
  }

  /** `SparkSessionExtensions.injectFunction` descriptor for
    * `graft_fingerprint(tokens)`.
    */
  val description: (FunctionIdentifier,
      ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_fingerprint"),
    new ExpressionInfo(classOf[PolyFingerprint].getName, "graft_fingerprint"),
    (children: Seq[Expression]) => children match {
      case Seq(a) => PolyFingerprint(a)
      case cs => throw new IllegalArgumentException(
        s"graft_fingerprint takes exactly 1 argument, got ${cs.length}")
    }
  )
}

/** Native ASCII canonicalizer: one byte pass computing EXACTLY
  * `trim(regexp_replace(regexp_replace(s, '[^a-z0-9 ]', ''), ' +', ' '))`
  * — the strip → collapse-spaces → trim normalization every dedup
  * pipeline runs before fingerprinting (j11 and its streaming twin).
  *
  * Why an `Expression`: JDK regex pays ~60 ns/char scanning for a
  * char-class pattern. `Matcher` has a fast literal-first-char skip
  * (why `' +'` costs only ~4 ns/char on the same corpus), but a class
  * like `[^a-z0-9 ]` has no literal prefix, so every position runs the
  * full NFA-node dispatch — measured 28 s for one pass over the sf10
  * documents corpus (~230 MB of text) against 0.8 s for `' +'`. This
  * byte loop does strip+collapse+trim together at ~1 ns/byte; the same
  * corpus pass drops under a second.
  *
  * Byte-level equivalence to the UTF-16 regex composition holds for ALL
  * valid UTF-8 input, not just ASCII: a UTF-16 char is in `[a-z0-9 ]`
  * iff its UTF-8 encoding is a single byte in that set, and every byte
  * of a multi-byte sequence (lead ≥ 0xC2, continuation 0x80–0xBF) is
  * ≥ 0x80 — outside the allowlist — so both formulations delete
  * non-ASCII characters wholesale and agree bytewise. `' '` (0x20)
  * never occurs inside a multi-byte sequence, so space-run collapse
  * can't split one. NULL → NULL like the regex chain (`nullIntolerant`).
  */
case class AsciiSanitize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sanitize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${t.sql}")
  }

  override def nullSafeEval(s: Any): Any =
    AsciiSanitize.sanitize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = AsciiSanitize.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, s => s"$cls.sanitize($s)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AsciiSanitize {

  /** strip non-[a-z0-9 ] bytes, collapse space runs, trim — one pass,
    * one output allocation. Called from both eval paths; the loop body
    * is three compares and a store, so JIT keeps it branch-predictable.
    */
  def sanitize(s: UTF8String): UTF8String = {
    val in = s.getBytes
    val out = new Array[Byte](in.length)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < in.length) {
      val b = in(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        pendingSpace = false
        out(o) = b
        o += 1
      } else if (b == ' ') {
        pendingSpace = true
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  /** `SparkSessionExtensions.injectFunction` descriptor for
    * `graft_sanitize(text)`.
    */
  val description: (FunctionIdentifier,
      ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_sanitize"),
    new ExpressionInfo(classOf[AsciiSanitize].getName, "graft_sanitize"),
    (children: Seq[Expression]) => children match {
      case Seq(a) => AsciiSanitize(a)
      case cs => throw new IllegalArgumentException(
        s"graft_sanitize takes exactly 1 argument, got ${cs.length}")
    }
  )
}
