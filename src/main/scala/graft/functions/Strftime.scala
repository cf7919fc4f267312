package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{concat, date_format, dayofmonth, dayofweek, dayofyear, floor, format_string, hour, lit, lpad, pmod, unix_timestamp, weekday, weekofyear, year}

/** strftime-style timestamp formatting on Spark columns.
  *
  * The reference registers a `strftime` helper in template scope
  * (reference `main.go:400-416`): C tokens in, formatted string out, with
  * an RFC3339Nano fallback for formats it cannot satisfy
  * (`main.go:410-415`). It also registers three extensions
  * (`main.go:406`): `%f` microseconds, `%L` milliseconds, `%s` unix
  * seconds. We translate the C tokens to Spark's `date_format`
  * (java.time) pattern dialect once at plan time; the formatting itself
  * stays a codegen'd built-in. The library's FULL token set is covered
  * (`%A %a %B %b %C %c %D %d %e %F %H %h %I %j %k %l %M %m %n %p %R %r
  * %S %T %t %U %u %V %v %W %w %X %x %Y %y %Z %z` plus the three
  * extensions), so only formats the reference itself rejects hit the
  * fallback. Tokens with no java.time pattern equivalent (`%s`, the
  * space-padded and week-number forms) compile to a `concat` of
  * `date_format` segments and column expressions — still all codegen'd
  * built-ins.
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
    'H' -> "HH", 'I' -> "hh", 'M' -> "mm",
    'S' -> "ss", 'p' -> "a", 'j' -> "DDD", 'a' -> "EEE",
    'A' -> "EEEE", 'b' -> "MMM", 'B' -> "MMMM",
    'F' -> "yyyy-MM-dd", 'T' -> "HH:mm:ss", 'z' -> "xx", 'Z' -> "zz",
    'f' -> "SSSSSS", 'L' -> "SSS"
  )

  /** Composite C tokens, expanded to their POSIX C-locale definitions
    * before tokenizing (the reference's formatting library hard-codes the
    * same C-locale forms: it is not locale-aware). One level deep on
    * purpose — the right-hand sides contain only simple tokens.
    */
  private val macros: Map[Char, String] = Map(
    'c' -> "%a %b %e %H:%M:%S %Y",
    'D' -> "%m/%d/%y", 'x' -> "%m/%d/%y", 'X' -> "%H:%M:%S",
    'r' -> "%I:%M:%S %p", 'R' -> "%H:%M",
    'v' -> "%e-%b-%Y", 'h' -> "%b"
  )

  private def expandMacros(fmt: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      if (fmt.charAt(i) == '%' && i + 1 < fmt.length) {
        macros.get(fmt.charAt(i + 1)) match {
          case Some(m) => out ++= m
          case None    => out += '%' += fmt.charAt(i + 1)
        }
        i += 2
      } else { out += fmt.charAt(i); i += 1 }
    }
    out.result()
  }

  /** Tokens with no java.time pattern equivalent, computed as column
    * expressions and concat'd between `date_format` segments (all still
    * codegen'd built-ins). Space-padded day/hour (`%e %k %l`) because
    * java.time patterns can only zero-pad; C week numbers (`%U` Sunday-
    * first, `%W` Monday-first — `(yday0 + 7 - wday) / 7` per POSIX, with
    * the respective first day mapped to 0) because java.time's `ww` is
    * locale-dependent; `%V` via Spark's ISO-8601 `weekofyear`.
    */
  private val structural: Map[Char, Column => Column] = Map(
    's' -> (ts => unix_timestamp(ts).cast("string")),
    // %C is MINIMUM-width 2 (a year ≥ 10000 prints 3+ digits); lpad
    // would truncate, format_string only pads.
    'C' -> (ts => format_string("%02d", floor(year(ts) / 100).cast("int"))),
    'e' -> (ts => lpad(dayofmonth(ts).cast("string"), 2, " ")),
    'k' -> (ts => lpad(hour(ts).cast("string"), 2, " ")),
    'l' -> (ts => lpad((pmod(hour(ts) + lit(11), lit(12)) + 1).cast("string"), 2, " ")),
    'u' -> (ts => (weekday(ts) + 1).cast("string")),
    'w' -> (ts => (dayofweek(ts) - 1).cast("string")),
    'U' -> (ts => lpad(floor((dayofyear(ts) + lit(7) - dayofweek(ts)) / 7)
      .cast("string"), 2, "0")),
    'W' -> (ts => lpad(floor((dayofyear(ts) + lit(6) - weekday(ts)) / 7)
      .cast("string"), 2, "0")),
    'V' -> (ts => lpad(weekofyear(ts).cast("string"), 2, "0"))
  )

  private sealed trait Part
  private final case class Pat(p: String) extends Part
  private final case class Fx(f: Column => Column) extends Part

  /** Tokenize a strftime format into java.time pattern segments and
    * structural-expression markers. Adjacent pattern-able pieces merge
    * into one segment. Any token outside the supported set → None
    * (caller falls back, matching the reference's invalid-format path).
    * Literal text is single-quoted so java.time treats it verbatim.
    */
  private def parts(fmt0: String): Option[List[Part]] = {
    val fmt = expandMacros(fmt0)
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
        else if (t == 'n') { lit += '\n'; i += 2 }
        else if (t == 't') { lit += '\t'; i += 2 }
        else structural.get(t) match {
          case Some(f) => flushPat(); out += Fx(f); i += 2
          case None => tokens.get(t) match {
            case Some(p) =>
              flushLit(); pat ++= p; i += 2
            case None => return None
          }
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
    * format needs fallback OR contains a structural token (`%s %C %e %k
    * %l %u %w %U %W %V`, which `format` compiles as column expressions
    * instead).
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
          case Fx(f)  => f(ts)
        }
        if (cols.sizeIs == 1) cols.head else concat(cols: _*)
      case Some(_) => date_format(ts, "") // empty format → empty string
      case None    => date_format(ts, FallbackPattern)
    }
}
