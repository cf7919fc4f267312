package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{concat, date_format, unix_timestamp}

/** strftime-style timestamp formatting on Spark columns.
  *
  * The reference registers a `strftime` helper in template scope
  * (reference `main.go:400-416`): C tokens in, formatted string out, with
  * an RFC3339Nano fallback for formats it cannot satisfy
  * (`main.go:410-415`). It also registers three extensions
  * (`main.go:406`): `%f` microseconds, `%L` milliseconds, `%s` unix
  * seconds. We translate the C tokens to Spark's `date_format`
  * (java.time) pattern dialect once at plan time; the formatting itself
  * stays a codegen'd built-in. `%s` has no java.time pattern token, so a
  * format containing it compiles to a `concat` of `date_format` segments
  * and `unix_timestamp` — still all codegen'd built-ins.
  *
  * Precision note (SURVEY §7 H1): Spark timestamps are microseconds, so
  * `%f` is exact and any sub-microsecond digits a nanosecond source
  * carried are zero by the time they reach a Spark column.
  */
object Strftime {
  /** C strftime token → java.time pattern. Unsupported token → None.
    * `%f`/`%L` are fraction-of-second patterns (6- and 3-digit); `%s` is
    * handled structurally in `parts`, not here.
    */
  private val tokens: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd",
    'e' -> "d", 'H' -> "HH", 'I' -> "hh", 'M' -> "mm",
    'S' -> "ss", 'p' -> "a", 'j' -> "DDD", 'a' -> "EEE",
    'A' -> "EEEE", 'b' -> "MMM", 'B' -> "MMMM",
    'F' -> "yyyy-MM-dd", 'T' -> "HH:mm:ss", 'z' -> "xx", 'Z' -> "zz",
    'f' -> "SSSSSS", 'L' -> "SSS"
  )

  private sealed trait Part
  private final case class Pat(p: String) extends Part
  private case object Epoch extends Part

  /** Tokenize a strftime format into java.time pattern segments and
    * `%s` (epoch-seconds) markers. Adjacent pattern-able pieces merge
    * into one segment. Any token outside the supported set → None
    * (caller falls back, matching the reference's invalid-format path).
    * Literal text is single-quoted so java.time treats it verbatim.
    */
  private def parts(fmt: String): Option[List[Part]] = {
    val out = List.newBuilder[Part]
    val pat = new StringBuilder
    val lit = new StringBuilder
    def quote(s: String): String =
      if (s.isEmpty) "" else "'" + s.replace("'", "''") + "'"
    def flushLit(): Unit = { pat ++= quote(lit.result()); lit.clear() }
    def flushPat(): Unit = {
      flushLit()
      if (pat.nonEmpty) { out += Pat(pat.result()); pat.clear() }
    }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        val t = fmt.charAt(i + 1)
        if (t == '%') { lit += '%'; i += 2 }
        else if (t == 's') { flushPat(); out += Epoch; i += 2 }
        else tokens.get(t) match {
          case Some(p) =>
            flushLit(); pat ++= p; i += 2
          case None => return None
        }
      } else {
        // Alphabetic literals must be quoted for java.time; quote() does.
        lit += c
        i += 1
      }
    }
    flushPat()
    Some(out.result())
  }

  /** Translate a strftime pattern to ONE java.time pattern. None when the
    * format needs fallback OR contains `%s` (which `format` compiles
    * structurally instead).
    */
  def translate(fmt: String): Option[String] =
    parts(fmt) match {
      case Some(Nil)         => Some("")
      case Some(List(Pat(p))) => Some(p)
      case _                 => None
    }

  /** Fallback pattern ≅ RFC3339 at Spark's microsecond precision
    * (the reference falls back to RFC3339Nano, `main.go:415`).
    */
  val FallbackPattern = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  /** Go reference-layout token → java.time pattern, checked in order, so
    * longer tokens that share a prefix with shorter ones come first
    * ("January" before "Jan", "15" before "1", ".000000" before ".000").
    * Go's layout grammar has no escape syntax — any non-token text is
    * literal, exactly as `time.Format` treats it.
    */
  private val goTokens: List[(String, String)] = List(
    "January" -> "MMMM", "Monday" -> "EEEE",
    "Jan" -> "MMM", "Mon" -> "EEE",
    "2006" -> "yyyy",
    ".000000" -> ".SSSSSS", ".000" -> ".SSS",
    "-07:00" -> "xxx", "-0700" -> "xx",
    "Z07:00" -> "XXX", "Z0700" -> "XX", "MST" -> "zz",
    "15" -> "HH", "01" -> "MM", "02" -> "dd", "03" -> "hh",
    "04" -> "mm", "05" -> "ss", "06" -> "yy", "PM" -> "a",
    "1" -> "M", "2" -> "d", "3" -> "h", "4" -> "m", "5" -> "s"
  )

  /** Translate a Go `time.Format` reference layout ("2006-01-02 15:04:05")
    * to a java.time pattern. None for the `.9…` trimmed-fraction tokens,
    * which java.time's formatter cannot express (it always zero-pads) —
    * the caller falls back, like an unsupported strftime format.
    */
  def translateGoLayout(layout: String): Option[String] = {
    val out = new StringBuilder
    val lit = new StringBuilder
    def quote(s: String): String =
      if (s.isEmpty) "" else "'" + s.replace("'", "''") + "'"
    var i = 0
    while (i < layout.length) {
      goTokens.find { case (g, _) => layout.startsWith(g, i) } match {
        case Some((g, p)) =>
          out ++= quote(lit.result()); lit.clear()
          out ++= p; i += g.length
        case None =>
          if (layout.startsWith(".9", i)) return None
          lit += layout.charAt(i); i += 1
      }
    }
    out ++= quote(lit.result())
    Some(out.result())
  }

  /** The template engine's `{{.Field.Format "go-layout"}}` entry point
    * (reference usage text `main.go:53-54`).
    */
  def formatGo(ts: Column, layout: String): Column =
    date_format(ts, translateGoLayout(layout).getOrElse(FallbackPattern))

  def format(ts: Column, fmt: String): Column =
    parts(fmt) match {
      case Some(ps) if ps.nonEmpty =>
        val cols = ps.map {
          case Pat(p) => date_format(ts, p)
          case Epoch  => unix_timestamp(ts).cast("string")
        }
        if (cols.sizeIs == 1) cols.head else concat(cols: _*)
      case Some(_) => date_format(ts, "") // empty format → empty string
      case None    => date_format(ts, FallbackPattern)
    }
}
