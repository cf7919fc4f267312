package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiles the reference's per-record output template into a single
  * Catalyst column expression.
  *
  * The reference renders every record through a Go `text/template`
  * (reference `main.go:103-114` parse, `main.go:281-289` exec; default
  * template `{{.ShortHostId}} {{.Timestamp}} {{.LogEntry}}` at
  * `main.go:65`). Instead of interpreting a template per row, we compile
  * the template ONCE into a `concat(...)` expression tree so rendering
  * stays inside whole-stage codegen — the per-row interpreter loop of the
  * reference becomes a vectorized projection.
  *
  * Supported syntax (the subset the reference's README documents):
  *   - literal text, passed through unchanged
  *   - `{{.Field}}` — envelope/JSON field access, resolved via `fields`
  *   - `{{.Field.Sub}}` — nested access into a JSON-string field
  *     (the reference's `{{.Log.FieldName}}`, `main.go:50-51` /
  *     README.md:19), compiled to `get_json_object(field, "$.Sub")`
  *   - `{{strftime "%fmt" .Field}}` — timestamp formatting through
  *     [[Strftime]] (the reference registers the same function at
  *     `main.go:104-107`)
  *   - `{{.Field.Format "go-layout"}}` — Go's `time.Time.Format` method
  *     syntax, documented as the supported alternative in the
  *     reference's usage text (`main.go:53-54`); the Go reference layout
  *     is translated to a java.time pattern ([[Strftime.formatGo]]),
  *     with the same RFC3339 fallback as strftime
  *
  * Unknown fields fail at compile time (the reference fails template
  * parse at startup with exit code 2 — same fail-fast contract). A field
  * that is NULL at runtime renders as the empty string (Go's template
  * would print a placeholder; rendering must not null out the whole line,
  * which Spark's `concat` would otherwise do).
  */
object Template {
  // The `.Field.Format "layout"` alternative must come FIRST: the generic
  // `.Field.Sub` alternative would otherwise consume `.Timestamp.Format`
  // and leave the quoted layout dangling. A JSON field literally named
  // `Format` without a following quoted string still falls through to the
  // generic nested case.
  private val Token =
    raw"""\{\{\s*(?:\.(\w+)\.Format\s+"([^"]*)"|\.(\w+)(?:\.(\w+))?|strftime\s+"([^"]*)"\s+\.(\w+))\s*\}\}""".r

  def compile(template: String, fields: Map[String, Column]): Column = {
    def field(name: String): Column =
      fields.getOrElse(
        name,
        throw new IllegalArgumentException(
          s"template references unknown field .$name (known: ${fields.keys.mkString(", ")})"))

    val parts = scala.collection.mutable.ArrayBuffer.empty[Column]
    var last = 0
    for (m <- Token.findAllMatchIn(template)) {
      if (m.start > last) parts += lit(template.substring(last, m.start))
      val rendered =
        if (m.group(1) != null)
          Strftime.formatGo(field(m.group(1)), m.group(2))
        else if (m.group(3) != null && m.group(4) != null)
          get_json_object(field(m.group(3)), "$." + m.group(4))
        else if (m.group(3) != null) field(m.group(3)).cast("string")
        else Strftime.format(field(m.group(6)), m.group(5))
      parts += coalesce(rendered, lit(""))
      last = m.end
    }
    if (last < template.length) parts += lit(template.substring(last))
    if (parts.isEmpty) lit("") else concat(parts.toSeq: _*)
  }

  /** The reference's default template (`main.go:65`), with `Timestamp`
    * rendered as seconds-precision ISO-8601.
    */
  val DefaultTemplate = "{{.ShortHostId}} {{strftime \"%Y-%m-%dT%H:%M:%S\" .Timestamp}} {{.LogEntry}}"
}
