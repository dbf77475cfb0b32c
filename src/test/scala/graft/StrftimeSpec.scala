package graft

import graft.functions.Strftime
import org.scalatest.funsuite.AnyFunSuite
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import java.util.Locale

/** strftime translation checked against Java formatting of known
  * instants (the reference default pattern and edge cases). */
class StrftimeSpec extends AnyFunSuite {

  private val t = LocalDateTime.of(2024, 3, 7, 9, 5, 2)

  private def fmt(strftime: String): String =
    DateTimeFormatter.ofPattern(Strftime.toJavaPattern(strftime), Locale.US).format(t)

  test("reference default pattern (timetotext.py default)") {
    assert(Strftime.toJavaPattern("%d/%m/%Y, %H:%M:%S") == "dd/MM/yyyy, HH:mm:ss")
    assert(fmt("%d/%m/%Y, %H:%M:%S") == "07/03/2024, 09:05:02")
  }

  test("names, 12h clock, day-of-year") {
    assert(fmt("%A %B") == "Thursday March")
    assert(fmt("%a %b") == "Thu Mar")
    assert(fmt("%I %p") == "09 AM")
    assert(fmt("%j") == "067")
    assert(fmt("%y") == "24")
  }

  test("literal percent and letter literals get quoted") {
    assert(fmt("100%% at %H") == "100% at 09")
    // 'T' is a Java pattern letter — must be quoted as a literal
    assert(fmt("%Y-%m-%dT%H:%M:%S") == "2024-03-07T09:05:02")
  }

  test("unsupported specifier throws at translation time") {
    intercept[IllegalArgumentException](Strftime.toJavaPattern("%Q"))
  }
}
