package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Glob → regex attribute matching, mirroring the reference's
  * `fnmatch.translate` + case-insensitive `re.match` search
  * (`server.py:78-86`) and the Grafana substring search
  * (`server.py:196-207`).
  *
  * The produced regexes use only syntax shared by Java regex (Spark's
  * `rlike`) and RE2 (DuckDB's `regexp_matches`) so the same pattern can
  * drive both the engine and the oracle.
  */
object GlobFns {

  /** Escape so the result is a literal in both Java regex and RE2. */
  def regexQuote(s: String): String =
    s.flatMap(c =>
      if ("\\.[]{}()*+-?^$|/".indexOf(c) >= 0) s"\\$c" else c.toString)

  /** Translate a shell glob into an anchored regex. Supported: `*`, `?`,
    * `[seq]`, `[!seq]`; everything else matched literally. Same effect
    * as Python's fnmatch.translate for the patterns the UI sends. */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case '[' =>
          val close = glob.indexOf(']', i + 1)
          if (close < 0) sb.append("\\[")
          else {
            var inner = glob.substring(i + 1, close)
            if (inner.startsWith("!")) inner = "^" + inner.substring(1)
            sb.append('[').append(inner.replace("\\", "\\\\")).append(']')
            i = close
          }
        case c if "\\.[]{}()+-^$|".indexOf(c) >= 0 => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('$').toString
  }

  /** Case-insensitive glob match on a column (F5). */
  def globMatch(c: Column, glob: String): Column =
    c.rlike("(?i)" + globToRegex(glob))

  /** Case-insensitive substring match (F6, Grafana `/search`). */
  def substringRegex(term: String): String = "(?i)" + regexQuote(term)

  def substringMatch(c: Column, term: String): Column =
    c.rlike(substringRegex(term))
}
