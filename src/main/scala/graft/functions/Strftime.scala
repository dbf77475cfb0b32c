package graft.functions

/** strftime → Java DateTimeFormatter pattern translation, needed for
  * parity with the reference's time→text task whose pattern option is
  * a C strftime string (default "%d/%m/%Y, %H:%M:%S" —
  * /root/reference/streamtasks/system/tasks/timetotext.py:29-37;
  * SURVEY §7.4 lists this translation as a hard part).
  *
  * Literal text is quoted with single quotes so Java pattern letters
  * in the literal part can't activate (e.g. "T" in "%H:%M:%ST").
  */
object Strftime {

  private val map: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd",
    'H' -> "HH", 'I' -> "hh", 'M' -> "mm", 'S' -> "ss",
    'f' -> "SSSSSS", // microseconds; Java SSSSSS = fraction digits
    'p' -> "a", 'a' -> "EEE", 'A' -> "EEEE", 'b' -> "MMM", 'B' -> "MMMM",
    'j' -> "DDD", 'z' -> "xx", 'Z' -> "zz", 'G' -> "YYYY", 'V' -> "ww",
    'u' -> "e", 'e' -> "d")

  /** Translate a strftime pattern to a Java datetime pattern usable by
    * `date_format`. Unsupported specifiers throw (analysis-time, like
    * the reference's pydantic validation). */
  def toJavaPattern(strftime: String): String = {
    val out = new StringBuilder
    val lit = new StringBuilder
    def flushLit(): Unit = {
      if (lit.nonEmpty) {
        val s = lit.toString
        // quote any literal containing letters; always escape quotes
        if (s.exists(_.isLetter)) out.append("'").append(s.replace("'", "''")).append("'")
        else out.append(s.replace("'", "''"))
        lit.clear()
      }
    }
    var i = 0
    while (i < strftime.length) {
      val c = strftime(i)
      if (c == '%' && i + 1 < strftime.length) {
        val spec = strftime(i + 1)
        if (spec == '%') { lit.append('%'); i += 2 }
        else map.get(spec) match {
          case Some(j) => flushLit(); out.append(j); i += 2
          case None => throw new IllegalArgumentException(
            s"strftime: unsupported specifier %$spec in '$strftime'")
        }
      } else { lit.append(c); i += 1 }
    }
    flushLit()
    out.toString
  }
}
