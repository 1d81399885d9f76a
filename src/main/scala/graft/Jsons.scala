package graft

/** Minimal JSON string quoting shared by the two driver-contract mains:
  * backslash, quote, and ALL control chars (<0x20). Both artifacts are
  * parsed by the driver with `json.load(s)` — one unescaped quote in a
  * builder-authored SQL string or an env-supplied path would zero a
  * round's machine-readable record, the exact failure mode the
  * degradation contract exists to prevent. */
object Jsons {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
