package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Pins t27's closed-form UniMax waterfilling (the arithmetic both
  * the Spark query and its DuckDB oracle implement) against a direct
  * SEQUENTIAL greedy allocator — the step-by-step procedure the
  * closed form collapses (languages ascending by cap; each step gives
  * min(cap, ceil(remaining / langs-left))) — plus the allocation
  * invariants that make the result a UniMax mix: budget exactness,
  * cap respect, and uniformity (uncapped quotas differ by ≤ 1 and
  * dominate every capped language's cap). */
class UnimaxSpec extends AnyFunSuite {

  /** t27's closed form, verbatim arithmetic: sorted ascending by
    * (cap, key); capped_i ⇔ cap_i·(L−i+1) + pfx_i ≤ B; remainder
    * split q/q+1 with the +1s to the first (rem mod m) uncapped. */
  private def closedForm(caps: Seq[(String, Long)], b: Long): Map[String, Long] = {
    val sorted = caps.sortBy { case (k, c) => (c, k) }
    val l = sorted.length.toLong
    val pfx = sorted.map(_._2).scanLeft(0L)(_ + _)
    val cappedFlags = sorted.zipWithIndex.map { case ((_, c), i0) =>
      c * (l - i0) + pfx(i0) <= b
    }
    val k = cappedFlags.zipWithIndex.filter(_._1).map(_._2 + 1).lastOption
      .getOrElse(0)
    val pk = pfx(k)
    val m = l - k
    val rem = b - pk
    sorted.zipWithIndex.map { case ((key, c), i0) =>
      val i = i0 + 1
      val quota =
        if (i <= k) c
        else rem / m + (if (i - k <= rem % m) 1L else 0L)
      key -> quota
    }.toMap
  }

  /** The sequential procedure the closed form must equal. */
  private def greedy(caps: Seq[(String, Long)], b: Long): Map[String, Long] = {
    val sorted = caps.sortBy { case (k, c) => (c, k) }
    var remaining = b
    var left = sorted.length.toLong
    sorted.map { case (key, c) =>
      val share = (remaining + left - 1) / left // ceil
      val q = math.min(c, share)
      remaining -= q
      left -= 1
      key -> q
    }.toMap
  }

  private def check[A](gen: Gen[A], trials: Int)(p: A => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(7L)
    (0 until trials).foreach { _ =>
      p(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  private val caseGen: Gen[(Seq[(String, Long)], Long)] = for {
    n <- Gen.choose(1, 12)
    caps <- Gen.listOfN(n, Gen.choose(1L, 10000L))
    tot = caps.sum
    b <- Gen.choose(0L, tot) // budget never exceeds availability
  } yield (caps.zipWithIndex.map { case (c, i) => (f"l$i%02d", c) }, b)

  test("closed form == sequential greedy on random caps and budgets") {
    check(caseGen, 300) { case (caps, b) =>
      assert(closedForm(caps, b) == greedy(caps, b), s"caps=$caps b=$b")
    }
  }

  test("allocation invariants: budget-exact, cap-respecting, uniform tail") {
    check(caseGen, 300) { case (caps, b) =>
      val q = closedForm(caps, b)
      val capOf = caps.toMap
      assert(q.values.sum == math.min(b, caps.map(_._2).sum))
      q.foreach { case (k, v) => assert(v >= 0 && v <= capOf(k)) }
      val uncapped = q.filter { case (k, v) => v < capOf(k) }.values
      if (uncapped.nonEmpty) {
        assert(uncapped.max - uncapped.min <= 1, "uniform split tail")
        // every fully-consumed language is no larger than any uncapped quota
        q.filter { case (k, v) => v == capOf(k) }
          .foreach { case (k, _) => assert(capOf(k) <= uncapped.max + 1) }
      }
    }
  }

  test("the t27 fixture scenarios: en-head downsampled at 4/5, pure uniform at 1/2") {
    val caps = Seq("de" -> 3549L, "fr" -> 3758L, "es" -> 3958L,
      "zh" -> 4143L, "en" -> 11757L)
    val tot = caps.map(_._2).sum
    val fourFifths = closedForm(caps, tot * 4 / 5)
    assert(fourFifths("de") == 3549 && fourFifths("en") == 6324)
    val half = closedForm(caps, tot / 2)
    assert(half.values.toSeq.sorted == Seq(2716L, 2716L, 2716L, 2717L, 2717L))
    assert(half("de") == 2717 && half("fr") == 2717) // remainder order
  }
}
