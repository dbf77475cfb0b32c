package graft

import org.scalatest.funsuite.AnyFunSuite

/** t26's Efraimidis–Spirakis weighted reservoir sampling: the oracle
  * hash pins engine determinism; THIS pins that the integer-key
  * formulation actually implements the E–S distribution —
  * weight-proportional inclusion across independent draws, and
  * agreement with the exact floating-point keys the paper defines.
  */
class WeightedSampleSpec extends AnyFunSuite {

  /** 1/32-bit integer log2 — TextQueries.ilog32's arithmetic. */
  private def ilog32(u: Long): Long = {
    val binLen = if (u == 0) 1 else 64 - java.lang.Long.numberOfLeadingZeros(u)
    (binLen - 1).toLong * 32 + (u * 32) / (1L << (binLen - 1)) - 32
  }

  private def u48(salt: Int, item: Int): Long = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt:$item".getBytes("UTF-8"))
    ((h(0) & 0xffL) << 40) | ((h(1) & 0xffL) << 32) |
      ((h(2) & 0xffL) << 24) | ((h(3) & 0xffL) << 16) |
      ((h(4) & 0xffL) << 8) | (h(5) & 0xffL)
  }

  /** The engine key: e·(10¹² div w), smaller = better. */
  private def intKey(u: Long, w: Long): Long =
    (1536L - ilog32(u)) * (1000000000000L / w)

  /** The paper's key (as a minimization): −ln(u/2⁴⁸)/w. */
  private def realKey(u: Long, w: Long): Double =
    -math.log(u.toDouble / (1L << 48).toDouble) / w

  private val weights: Seq[Long] =
    Seq.fill(50)(2L) ++ Seq.fill(50)(20L) // light ×50, heavy ×50
  private val k = 10
  private val salts = 1 to 300

  test("inclusion frequency is weight-proportional across draws") {
    val included = Array.fill(weights.size)(0)
    salts.foreach { s =>
      weights.indices
        .sortBy(i => (intKey(u48(s, i), weights(i)), i))
        .take(k).foreach(included(_) += 1)
    }
    val light = included.take(50).sum.toDouble / 50
    val heavy = included.drop(50).sum.toDouble / 50
    // k=10 of 100 with total weight 1100: heavy expectation ≈
    // 10·20/110 ≈ 1.8 per draw vs light ≈ 0.18 — ratio ≈ 10 (slightly
    // compressed by without-replacement saturation)
    val ratio = heavy / light
    assert(ratio > 5 && ratio < 20,
      s"heavy/light inclusion ratio $ratio should track the 10x weight")
  }

  test("integer keys agree with the exact E-S keys (quantization is " +
      "1/32-bit + a 1e-12 inverse-weight floor)") {
    val overlaps = salts.map { s =>
      val byInt = weights.indices
        .sortBy(i => (intKey(u48(s, i), weights(i)), i)).take(k).toSet
      val byReal = weights.indices
        .sortBy(i => (realKey(u48(s, i), weights(i)), i)).take(k).toSet
      (byInt & byReal).size
    }
    // near-boundary candidates can flip under the 1/32-bit log
    // quantization (both selections remain valid E-S draws — the
    // quantized key IS the defined sampler); the overlap pins that
    // the quantization stays a small perturbation, not a different
    // distribution
    assert(overlaps.forall(_ >= 6), s"min overlap ${overlaps.min}/10")
    val mean = overlaps.sum.toDouble / overlaps.size
    assert(mean >= 9.0, s"mean overlap $mean/10")
  }

  test("unweighted degenerates to uniform (all weights equal -> order " +
      "by u alone)") {
    val s = 42
    val byKey = (0 until 100)
      .sortBy(i => (intKey(u48(s, i), 7L), i)).take(k)
    val byU = (0 until 100).sortBy(i => (-u48(s, i), i)).take(k)
    assert(byKey.toSet == byU.toSet)
  }
}
