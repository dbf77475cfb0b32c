package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM property tests for the sketch MATH the k-family queries
  * distribute (SketchQueries/StreamingSketch): the merge laws are what
  * make the sketches distributable at all — partial aggregation,
  * micro-batch merging, and cross-slice union all reduce to them — so
  * they get direct tests against the set-theoretic definitions, on the
  * same md5-derived register/hash coordinates the queries use.
  */
class SketchPropSpec extends AnyFunSuite {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // ---- HLL register coordinates (same scheme as k02/k06: bucket = first
  // 2 hex chars, rank = leading-zero bits of the next 32 + 1, 33 if zero)
  private def hllCoord(key: String): (Int, Int) = {
    val h = md5hex(key)
    val bucket = Integer.parseInt(h.substring(0, 2), 16)
    val rest = h.substring(2, 10)
    val zeros = rest.takeWhile(_ == '0').length
    val rank =
      if (zeros == 8) 33
      else {
        val inner = rest(zeros) match {
          case '1' => 3
          case '2' | '3' => 2
          case c if c >= '4' && c <= '7' => 1
          case _ => 0
        }
        zeros * 4 + inner + 1
      }
    (bucket, rank)
  }

  private def hllRegs(keys: Iterable[String]): Array[Int] = {
    val regs = new Array[Int](256)
    keys.foreach { k =>
      val (b, r) = hllCoord(k)
      if (r > regs(b)) regs(b) = r
    }
    regs
  }

  private def hllEst(regs: Array[Int]): Double =
    graft.streaming.StreamingSketch.estimate(regs)

  private val genKeys: Gen[Set[String]] = for {
    n <- Gen.choose(1, 3000)
    off <- Gen.choose(0, 1000000)
  } yield (0 until n).map(i => s"key-${off + i}").toSet

  private def check[A](gen: Gen[A], trials: Int)(p: A => Unit): Unit = {
    val seeded = org.scalacheck.rng.Seed(42L)
    var seed = seeded
    (0 until trials).foreach { _ =>
      val a = gen.pureApply(Gen.Parameters.default, seed)
      p(a)
      seed = seed.next
    }
  }

  test("HLL merge law: regs(A ∪ B) == elementwise max(regs(A), regs(B))") {
    check(Gen.zip(genKeys, genKeys), 25) { case (a, b) =>
      val merged = hllRegs(a).zip(hllRegs(b)).map { case (x, y) => math.max(x, y) }
      assert(merged.toSeq == hllRegs(a ++ b).toSeq)
    }
  }

  test("HLL estimate within the published envelope (<= 3 * 1.04/sqrt(256) " +
      "~ 19.5% at large n; linear-counting regime tighter)") {
    check(genKeys, 25) { keys =>
      val est = hllEst(hllRegs(keys))
      val n = keys.size.toDouble
      assert(math.abs(est - n) <= math.max(5.0, n * 0.195),
        s"n=$n est=$est")
    }
  }

  // ---- KMV (same scheme as k01/k04: distinct md5 hex, k smallest) ----
  private val K = 64
  private def kmv(keys: Iterable[String]): Vector[String] =
    keys.map(md5hex).toVector.distinct.sorted.take(K)

  test("KMV merge law: kmv(A ∪ B) == k-smallest of kmv(A) ∪ kmv(B)") {
    check(Gen.zip(genKeys, genKeys), 25) { case (a, b) =>
      val merged = (kmv(a) ++ kmv(b)).distinct.sorted.take(K)
      assert(merged == kmv(a ++ b))
    }
  }

  test("KMV estimate (k-1)/frac(h_k) within 3 sigma (~37.5% at k=64)") {
    check(genKeys, 25) { keys =>
      val sk = kmv(keys)
      val n = keys.map(md5hex).toSet.size // md5 collisions: none expected
      val est =
        if (sk.length < K) sk.length.toDouble // exact below k
        else {
          val frac = java.lang.Long.parseLong(sk.last.substring(0, 13), 16)
            .toDouble / 4503599627370496.0
          (K - 1).toDouble / frac
        }
      assert(math.abs(est - n) <= math.max(3.0, n * 0.375), s"n=$n est=$est")
    }
  }

  // ---- Bloom (same scheme as k05: two 32-bit md5 slices mod 2^20) ----
  private val BloomBits = 1 << 20
  private def bloomPositions(key: String): (Int, Int) = {
    val h = md5hex(key)
    ((java.lang.Long.parseLong(h.substring(0, 8), 16) & (BloomBits - 1)).toInt,
      (java.lang.Long.parseLong(h.substring(8, 16), 16) & (BloomBits - 1)).toInt)
  }

  test("bloom has NO false negatives (the property k05's exactness " +
      "rests on), and false-positive rate stays near (fill)^2") {
    check(Gen.zip(genKeys, genKeys), 15) { case (ins, probe) =>
      val bits = new java.util.BitSet(BloomBits)
      ins.foreach { k =>
        val (a, b) = bloomPositions(k); bits.set(a); bits.set(b) }
      def hit(k: String): Boolean = {
        val (a, b) = bloomPositions(k); bits.get(a) && bits.get(b) }
      ins.foreach(k => assert(hit(k), s"false negative for $k"))
      val neg = probe -- ins
      if (neg.size >= 200) {
        val fill = bits.cardinality().toDouble / BloomBits
        val fpObserved = neg.count(hit).toDouble / neg.size
        // generous bound: expected fill^2; allow 5x + additive slack
        assert(fpObserved <= 5 * fill * fill + 0.02,
          s"fp=$fpObserved fill=$fill")
      }
    }
  }

  // ---- CMS (same scheme as k08: row i's position = 32-bit md5 slice i,
  // masked to w=16; estimate = min over the d=4 rows) ----
  private val CmsD = 4
  private val CmsW = 16

  private def cmsPos(key: String): Array[Int] = {
    val h = md5hex(key)
    Array.tabulate(CmsD)(i =>
      (java.lang.Long.parseLong(h.substring(8 * i, 8 * i + 8), 16) &
        (CmsW - 1)).toInt)
  }

  private def cmsCounters(occurrences: Seq[String]): Array[Array[Long]] = {
    val c = Array.fill(CmsD, CmsW)(0L)
    occurrences.foreach { k =>
      val ps = cmsPos(k)
      var i = 0
      while (i < CmsD) { c(i)(ps(i)) += 1; i += 1 }
    }
    c
  }

  private def cmsEst(c: Array[Array[Long]], key: String): Long = {
    val ps = cmsPos(key)
    (0 until CmsD).map(i => c(i)(ps(i))).min
  }

  private val genMultiset: Gen[Seq[String]] = for {
    nKeys <- Gen.choose(1, 40)
    counts <- Gen.listOfN(nKeys, Gen.choose(1, 50))
    off <- Gen.choose(0, 1000000)
  } yield counts.zipWithIndex.flatMap { case (c, i) =>
    Seq.fill(c)(s"tok-${off + i}")
  }

  test("CMS never underestimates (k08's overestimate >= 0 bound, for " +
      "EVERY key, not just the query's top-20)") {
    check(genMultiset, 20) { occ =>
      val c = cmsCounters(occ)
      val exact = occ.groupBy(identity).view.mapValues(_.size.toLong)
      exact.foreach { case (k, n) =>
        assert(cmsEst(c, k) >= n, s"underestimate for $k")
      }
    }
  }

  test("CMS merge law: counters(A ++ B) == counters(A) + counters(B) " +
      "elementwise (what makes map-side combine exact)") {
    check(Gen.zip(genMultiset, genMultiset), 15) { case (a, b) =>
      val merged = cmsCounters(a ++ b)
      val ca = cmsCounters(a); val cb = cmsCounters(b)
      for (i <- 0 until CmsD; j <- 0 until CmsW)
        assert(merged(i)(j) == ca(i)(j) + cb(i)(j))
    }
  }
}
