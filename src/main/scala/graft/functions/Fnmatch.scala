package graft.functions

import org.apache.spark.sql.Column

/** Unix-shell glob matching over string columns.
  *
  * The reference filters NSLC codes with `fnmatch`-style globs translated
  * to anchored regexes (obsplus `utils/pd.py:385-431`, `get_regex`
  * `utils/pd.py:446-449`): `*` any run, `?` one char, `[seq]` / `[!seq]`
  * character classes, full-string anchored semantics.
  *
  * We translate at plan-build time and emit `rlike`, which Catalyst
  * codegens; no UDF. The produced regex uses only syntax shared by Java
  * regex and RE2 so the same pattern string drives the DuckDB oracle.
  */
object Fnmatch {

  private val regexSpecials = "\\.[]{}()*+?^$|"

  /** Translate a glob to an anchored regex (full-string match, like
    * the reference's `re.match(translate(pat))` on the whole code).
    */
  def translate(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    val n = glob.length
    while (i < n) {
      glob.charAt(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append(".")
        case '[' =>
          // a ']' as the FIRST class char (after optional '!') is
          // literal — the closing-] scan must start past it
          val contentStart = if (i + 1 < n && glob.charAt(i + 1) == '!') i + 2 else i + 1
          val j = glob.indexOf(']', contentStart + 1)
          if (j < 0) { sb.append("\\[") }
          else {
            var cls = glob.substring(i + 1, j)
            val negated = cls.startsWith("!")
            if (negated) cls = cls.substring(1)
            // escape regex-significant chars that Java/RE2 treat
            // specially inside classes; ranges (a-z) pass through
            cls = cls.replace("\\", "\\\\").replace("]", "\\]")
            if (cls.startsWith("^")) cls = "\\" + cls
            sb.append('[').append(if (negated) "^" else "").append(cls).append(']')
            i = j
          }
        case c if regexSpecials.indexOf(c) >= 0 => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append("$").toString
  }

  /** Column predicate: does `col` match the glob (full string)? */
  def matches(col: Column, glob: String): Column = col.rlike(translate(glob))

  /** True if the glob has no wildcard chars — reference uses plain
    * equality / IN in that case (obsplus `utils/pd.py:408-430`).
    */
  def isLiteral(glob: String): Boolean =
    !glob.exists(c => c == '*' || c == '?' || c == '[')
}
