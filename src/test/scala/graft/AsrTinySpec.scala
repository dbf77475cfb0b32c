package graft

import graft.functions.AsrTiny
import org.scalatest.funsuite.AnyFunSuite

/** The trained tiny acoustic model (resource graft/asr_tiny.txt,
  * trained+quantized by scripts/train_asr.py) behind m15: shape,
  * actual classification power, and the argmax tie rule the DuckDB
  * oracle mirrors. */
class AsrTinySpec extends AnyFunSuite {

  test("model loads from the jar with the trained shape") {
    val m = AsrTiny.model
    assert(m.classes == 6 && m.dim == 8)
    assert(m.tmpl.length == 6 && m.tmpl.forall(_.length == 8))
  }

  test("trained weights classify: every class template (clean and " +
      "under the fixture's noise family) recovers its class") {
    val m = AsrTiny.model
    for (c <- 0 until m.classes) {
      assert(m.predict(m.tmpl(c)) == c, s"clean template $c")
      // the m15 noise family: offsets in [-3, 3] per dim
      for (seed <- 1 to 50) {
        val x = Array.tabulate(m.dim)(j =>
          m.tmpl(c)(j) + (seed * (j + 1) * 2654435761L) % 7L - 3L)
        assert(m.predict(x) == c, s"noisy template $c seed $seed")
      }
    }
  }

  test("argmax ties go to the lower class id (the oracle's " +
      "ORDER BY logit DESC, k)") {
    // two classes with equal logits on a constructed frame: the all
    // zeros frame scores b(k) only; find any equal pair or construct
    // the degenerate model check via logit symmetry on class 0
    val m = AsrTiny.model
    val x = new Array[Long](m.dim)
    val ls = (0 until m.classes).map(k => m.logit(k, x))
    val best = ls.zipWithIndex.filter(_._1 == ls.max).map(_._2).min
    assert(m.predict(x) == best)
  }

  test("logits are exact integer dot products (no float path)") {
    val m = AsrTiny.model
    val x = Array.tabulate(m.dim)(j => (j * 17 - 40).toLong)
    for (k <- 0 until m.classes) {
      val want = m.b(k) + (0 until m.dim).map(j => m.w(k)(j) * x(j)).sum
      assert(m.logit(k, x) == want)
    }
  }
}
