package graft

/** The one JSON string escaper (three hand-rolled copies drifted apart in
  * round 12 — Observe escaped control chars, PlanAudit didn't): backslash,
  * quote, and ALL control chars (< 0x20). A raw tab or newline inside a
  * hand-built JSON artifact makes every downstream json.load fail.
  */
object JsonText {
  def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Escape and wrap in double quotes. */
  def quote(s: String): String = "\"" + escape(s) + "\""
}
