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
}
