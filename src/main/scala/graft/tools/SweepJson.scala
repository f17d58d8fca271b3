package graft.tools

/** Shared JSON-string escaping for the robustness-sweep artifacts.
  *
  * The sweeps embed Spark error messages in their gate JSON, and those
  * messages quote corrupted cell values — which, under the TextExec
  * pool, contain raw control characters (NUL/BEL/ESC/DEL) that a
  * backslash-and-quote-only escaper passes through, producing an
  * artifact a strict JSON parser rejects exactly when a sweep fails.
  * Escape everything below 0x20 (and DEL) as \u00XX. */
object SweepJson {
  def esc(s: String): String = {
    val b = new StringBuilder(s.length + 16)
    s.foreach {
      case '\\' => b.append("\\\\")
      case '"' => b.append("\\\"")
      case c if c < 0x20 || c == 0x7f => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }
}
