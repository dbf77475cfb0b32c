package graft

import graft.queries.Relational
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** q31's salted skew join: the executed plan must actually spread the
  * hot key — the join shuffles on BOTH (k, salt), and no broadcast
  * join sneaks in (broadcasting the dim would make the salt dead
  * weight and hide the skew the pattern exists to solve). Correctness
  * (salting preserves the plain join's semantics) is the driver's
  * oracle hash; this spec pins the PLAN. */
class SaltedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName("salted-join-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fixtureLineitem = {
    import spark.implicits._
    (1 to 200).map { i =>
      (i.toLong, (i % 13).toLong, 100.0 + i, i.toLong) }
      .toDF("l_orderkey", "l_partkey", "l_extendedprice", "l_linenumber")
  }

  test("the join exchanges hash-partition by BOTH k and salt, and no " +
      "broadcast join is planned") {
    val df = Relational.saltedSkewJoin(fixtureLineitem)
    df.collect() // force execution so the final plan (incl. AQE) exists
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin"), plan)
    // the JOIN inputs shuffle on (k, salt) — the post-join aggregate's
    // k-only exchange is expected and separate
    val exch = "hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    val saltedExch = exch.filter(e => e.contains("k#") && e.contains("salt#"))
    assert(saltedExch.size >= 2, s"join exchanges: $exch\n$plan")
    // and the join condition itself carries the salt key
    val smj = plan.linesIterator.find(l => l.contains("SortMergeJoin") ||
      l.contains("ShuffledHashJoin")).get
    assert(smj.contains("salt#"), smj)
  }

  test("salted result == plain unsalted join+agg on the same fixture") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val li = fixtureLineitem
    val got = Relational.saltedSkewJoin(li).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val fact = li.select(
      when(col("l_partkey") % 10 < 7, 0L).otherwise(col("l_partkey")).as("k"),
      col("l_extendedprice").cast(DecimalType(18, 2)).as("price"))
    val dim = fact.select(col("k")).distinct()
      .select(col("k"), (pmod(col("k"), lit(97)) + 1).cast(LongType).as("w"))
    val want = fact.join(dim, "k").groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("price") * col("w")).cast(DoubleType).as("weighted"))
      .orderBy(col("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }
}
