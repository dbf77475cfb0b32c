package graft

import graft.functions.FnTask
import org.apache.spark.sql.Encoders
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck pin for [[FnTask.topK]]'s algebra: Spark may partition a
  * group's rows arbitrarily, reduce each partition in any order, and
  * merge the partials in any tree shape — the aggregate is only
  * correct if every such evaluation yields the k least elements of
  * the whole multiset. s08 relies on exactly this to hash-match the
  * window-rank formulation.
  */
class FnTaskSpec extends AnyFunSuite {

  private implicit val bufEnc: org.apache.spark.sql.Encoder[Seq[(Int, Long)]] =
    Encoders.kryo[Seq[(Int, Long)]]

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(200).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  test("topK == global sort.take(k) under any partitioning and merge order") {
    val genCase = for {
      k <- Gen.choose(1, 6)
      n <- Gen.choose(0, 40)
      xs <- Gen.listOfN(n, Gen.zip(Gen.choose(-5, 5), Gen.choose(0L, 9L)))
      cuts <- Gen.listOfN(4, Gen.choose(0, math.max(n, 1)))
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (k, xs, cuts.sorted, seed)
    check(Prop.forAll(genCase) { case (k, xs, cuts, seed) =>
      val agg = FnTask.topK[(Int, Long)](k)
      // partition at the random cut points
      val parts = (0 +: cuts :+ xs.length).sliding(2).collect {
        case Seq(a, b) if a <= b => xs.slice(a, b)
      }.toList
      val partials = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      // merge in a seed-shuffled order (arbitrary merge tree)
      val shuffled = new scala.util.Random(seed).shuffle(partials)
      val merged = shuffled.foldLeft(agg.zero)(agg.merge)
      val expect = xs.sorted.take(k)
      agg.finish(merged) == expect
    })
  }

  test("bounded-heap path == sort-based reference at k = 1000 " +
      "(the large-k contract, incl. duplicate-heavy ties)") {
    val rnd = new scala.util.Random(42)
    // duplicate-heavy domain so tie handling is exercised hard
    val xs = List.fill(20000)((rnd.nextInt(500), rnd.nextInt(8).toLong))
    val agg = FnTask.topK[(Int, Long)](1000)
    val partials = xs.grouped(3000).map(_.foldLeft(agg.zero)(agg.reduce)).toList
    val merged = rnd.shuffle(partials).foldLeft(agg.zero)(agg.merge)
    assert(agg.finish(merged) == xs.sorted.take(1000))
  }
}
