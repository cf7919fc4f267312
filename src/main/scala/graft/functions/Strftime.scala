package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.date_format

/** strftime-style timestamp formatting on Spark columns.
  *
  * The reference registers a `strftime` helper in template scope
  * (reference `main.go:400-416`): C tokens in, formatted string out, with
  * an RFC3339Nano fallback for formats it cannot satisfy
  * (`main.go:410-415`). We translate the C tokens to Spark's
  * `date_format` (java.time) pattern dialect once at plan time; the
  * formatting itself stays a codegen'd built-in.
  */
object Strftime {
  /** C strftime token → java.time pattern. Unsupported token → None. */
  private val tokens: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd",
    'e' -> "d", 'H' -> "HH", 'I' -> "hh", 'M' -> "mm",
    'S' -> "ss", 'p' -> "a", 'j' -> "DDD", 'a' -> "EEE",
    'A' -> "EEEE", 'b' -> "MMM", 'B' -> "MMMM",
    'F' -> "yyyy-MM-dd", 'T' -> "HH:mm:ss", 'z' -> "xx", 'Z' -> "zz"
  )

  /** Translate a strftime pattern to a java.time pattern.
    * Literal text is single-quoted so java.time treats it verbatim.
    */
  def translate(fmt: String): Option[String] = {
    val out = new StringBuilder
    var i = 0
    def quote(s: String): String =
      if (s.isEmpty) "" else "'" + s.replace("'", "''") + "'"
    val lit = new StringBuilder
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        val t = fmt.charAt(i + 1)
        if (t == '%') { lit += '%'; i += 2 }
        else tokens.get(t) match {
          case Some(p) =>
            out ++= quote(lit.result()); lit.clear()
            out ++= p
            i += 2
          case None => return None
        }
      } else {
        // Alphabetic literals must be quoted for java.time; keep others raw.
        lit += c
        i += 1
      }
    }
    out ++= quote(lit.result())
    Some(out.result())
  }

  /** Fallback pattern ≅ RFC3339 at Spark's microsecond precision
    * (the reference falls back to RFC3339Nano, `main.go:415`).
    */
  val FallbackPattern = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  def format(ts: Column, fmt: String): Column =
    date_format(ts, translate(fmt).getOrElse(FallbackPattern))
}
