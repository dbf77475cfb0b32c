package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sketch-based corpus statistics — the queries a 100 TB pipeline runs
  * CONSTANTLY (how many distinct URLs/users/keys, what does the length
  * distribution look like, how much do two corpus slices overlap) but
  * cannot afford to answer exactly: an exact COUNT(DISTINCT) shuffles
  * every distinct key, an exact quantile sorts the corpus.
  *
  * The reference has no statistics surface at all (SURVEY.md §2.7);
  * this family is part of the beyond-reference north-star inventory,
  * alongside dedup (d01–d15) and similarity (s01–s09).
  *
  * Design rule for this file: every sketch is DETERMINISTIC — built on
  * md5, order-independent merges (max / bit_or / top-k-of-distinct) and
  * integer arithmetic — so the same estimate is reproducible run-to-run
  * AND engine-to-engine, which is what lets the DuckDB oracle hash-match
  * an *approximate* answer exactly. (Spark's own approx_count_distinct /
  * percentile_approx give engine-specific answers; a production job can
  * use them, but they cannot sit under a cross-engine hash gate, and
  * their merge order can leak into the result. The sketches here are the
  * same math with the nondeterminism designed out.)
  *
  * Scale shapes (the reason each sketch exists):
  *  - k01 KMV: shuffle carries at most k hashes per partition
  *    (TakeOrderedAndProject = per-partition heap + single merge);
  *  - k02 HLL: shuffle carries at most m=256 register rows after
  *    map-side combine, whatever the corpus size;
  *  - k03: only the hash-sample is globally sorted — the rate is the
  *    knob that holds the sorted set at ~1M rows at any corpus size;
  *  - k04: two corpus slices compared through one k-row sketch each;
  *  - k05: a 128 KiB bloom broadcast prunes the fact scan before the
  *    join shuffle — the runtime-filter pattern made explicit.
  */
object SketchQueries {

  /** Combine single-row frames side-by-side WITHOUT a join: null-pad
    * each to the union schema, union, and collapse with max (each
    * column is non-null in exactly one input). A joined pair of 1-row
    * frames plans as BroadcastNestedLoopJoin (the constant-key equi
    * trick constant-folds away); this shape instead stays a plain
    * union+agg — no nested loop for the plan audit to flag, and the
    * scalar frames still compute in parallel. */
  private[graft] def zipOne(frames: DataFrame*): DataFrame = {
    val schema = frames.flatMap(f => f.schema.fields.map(x => (x.name, x.dataType)))
    val padded = frames.map { f =>
      val have = f.columns.toSet
      f.select(schema.map { case (n, t) =>
        if (have(n)) col(n) else lit(null).cast(t).as(n)
      }: _*)
    }
    val u = padded.reduce(_ union _)
    u.agg(max(col(schema.head._1)).as(schema.head._1),
      schema.tail.map { case (n, _) => max(col(n)).as(n) }: _*)
  }

  /** Numeric value of the first `len` hex chars of `c` (lowercase md5
    * output), as an exact Long. len ≤ 15 keeps the value inside a
    * signed 64-bit / an exact double (len=13 → 52 bits). */
  private def hexVal(c: Column, len: Int): Column =
    conv(substring(c, 1, len), 16, 10).cast(LongType)

  /** DuckDB equivalent of [[hexVal]] — DuckDB has no conv(), so the
    * oracle unrolls the digit sum. Weights are exact BIGINTs. */
  private def sqlHexVal(e: String, len: Int): String =
    (0 until len).map { i =>
      val w = 1L << (4 * (len - 1 - i))
      s"(strpos('0123456789abcdef', substring($e, ${i + 1}, 1)) - 1) * $w"
    }.mkString("(", " + ", ")")

  // ---- k01: KMV (k-minimum-values) distinct-count sketch ------------------
  // Bar-Yossef et al. 2002. The k smallest distinct hash values of the
  // key set determine the estimate (k-1)/frac(h_(k)). Two scale
  // properties make this THE cheap distinct sketch:
  //  1. the theta prefilter (hash prefix '0'..'3' = lowest quarter of
  //     hash space) discards 3/4 of the keys before the distinct — at
  //     deployment the prefix is tightened so the surviving set is a few
  //     thousand rows regardless of corpus size (invariant: expected
  //     survivors ≥ 4k, so the k smallest overall are all retained);
  //  2. orderBy+limit plans as TakeOrderedAndProject — a per-partition
  //     k-heap merged once on a single reducer; no global sort. That IS
  //     the KMV merge: sketches of partitions combine by keeping the k
  //     smallest of the union.
  // The exact COUNT(DISTINCT) column is the demonstration baseline (it
  // is what 100 TB cannot afford) — a production run drops it.
  private val KmvK = 64

  private def k01(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val hashed = l
      .select(md5(col("l_orderkey").cast(StringType).cast(BinaryType)).as("h"))
      .filter(substring(col("h"), 1, 1).isin("0", "1", "2", "3"))
      .distinct()
    val kmv = hashed.orderBy("h").limit(KmvK)
    val sk = kmv.agg(count(lit(1)).as("k"), max(col("h")).as("kh"))
      .select(col("k"),
        (hexVal(col("kh"), 13).cast(DoubleType) / lit(4503599627370496.0))
          .as("frac"))
      .select(col("k").cast(LongType).as("k"),
        floor((col("k") - lit(1)).cast(DoubleType) / col("frac"))
          .cast(LongType).as("est_distinct"))
    val exact = l.agg(countDistinct(col("l_orderkey"))
      .cast(LongType).as("exact_distinct"))
    zipOne(sk, exact)
      .select(col("k"), col("est_distinct"), col("exact_distinct"),
        ((col("est_distinct") - col("exact_distinct")).cast(DoubleType) /
          col("exact_distinct").cast(DoubleType)).as("rel_err"))
  }

  private val k01Sql = {
    val frac = s"(${sqlHexVal("kh", 13)} / 4503599627370496.0)"
    s"""WITH hashed AS (
       |  SELECT DISTINCT md5(CAST(l_orderkey AS VARCHAR)) AS h
       |  FROM lineitem
       |  WHERE substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 1) IN ('0','1','2','3')),
       |kmv AS (SELECT h FROM hashed ORDER BY h LIMIT $KmvK),
       |sk AS (SELECT CAST(count(*) AS BIGINT) AS k, max(h) AS kh FROM kmv),
       |est AS (SELECT k, CAST(floor(CAST(k - 1 AS DOUBLE) / $frac) AS BIGINT) AS est_distinct FROM sk),
       |ex AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct FROM lineitem)
       |SELECT k, est_distinct, exact_distinct,
       |  CAST(est_distinct - exact_distinct AS DOUBLE) / CAST(exact_distinct AS DOUBLE) AS rel_err
       |FROM est, ex""".stripMargin
  }

  // ---- k02: deterministic HyperLogLog (m=256 registers) -------------------
  // Flajolet et al. 2007, with the nondeterminism designed out: for a
  // FIXED hash (md5) the register array is a pure max over the key set —
  // order-independent, so partial (map-side) aggregation collapses each
  // input partition to ≤256 rows and the shuffle carries O(m) data at
  // any corpus size. The harmonic mean is computed in exact integer
  // arithmetic (Σ 2^(33-rank) as BIGINT; rank ≤ 33 so no overflow) and
  // only the final one-row estimate touches doubles — identical literal
  // arithmetic on both engines.
  /** Adds a `rank` column (HLL register rank: leading-zero bits of the
    * 32-bit hex suffix in column `rest`, +1; 33 when all zero) —
    * shared by k02 (batch) and k06 (the streaming mount's fixture). */
  private[graft] def withHllRank(df: DataFrame): DataFrame = df
    .withColumn("zeros", length(regexp_extract(col("rest"), "^0*", 0)))
    .withColumn("inner", expr(
      """CASE substring(rest, zeros + 1, 1)
        |  WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
        |  WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
        |  ELSE 0 END""".stripMargin))
    .withColumn("rank",
      when(col("zeros") === 8, lit(33))
        .otherwise(col("zeros") * 4 + col("inner") + 1))

  private def k02(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    // bucket = first 2 hex chars (8 bits); rank = leading-zero bits of
    // the next 32 bits + 1 (33 when that suffix is all zero).
    val regs = withHllRank(l
      .select(md5(col("l_orderkey").cast(StringType).cast(BinaryType)).as("h"))
      .select(substring(col("h"), 1, 2).as("bucket"),
        substring(col("h"), 3, 8).as("rest")))
      .groupBy(col("bucket"))
      .agg(max(col("rank")).as("r"))
    val sk = regs.agg(
        count(lit(1)).as("present"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 33 - r)")).as("s_present"))
      // absent buckets hold register 0 → each contributes 2^33 exactly.
      .select(col("present"),
        (col("s_present") +
          (lit(256L) - col("present")) * lit(8589934592L)).as("s_total"),
        (lit(256L) - col("present")).as("zeros"))
      .select(col("present").cast(LongType).as("registers_hit"),
        col("zeros"),
        ((lit(0.7213 / (1.0 + 1.079 / 256.0)) * lit(65536.0) *
          lit(8589934592.0)) / col("s_total").cast(DoubleType)).as("raw"))
      // small-range (linear-counting) correction per the paper; with
      // |keys| ≥ ~1.5k it never fires on the driver data, and when it
      // does both engines evaluate the same ln() on the same integers.
      .select(col("registers_hit"),
        floor(when(col("raw") <= lit(640.0) && col("zeros") > 0,
            lit(256.0) * log(lit(256.0) / col("zeros").cast(DoubleType)))
          .otherwise(col("raw"))).cast(LongType).as("est_distinct"))
    val exact = l.agg(countDistinct(col("l_orderkey"))
      .cast(LongType).as("exact_distinct"))
    zipOne(sk, exact)
      .select(col("registers_hit"), col("est_distinct"), col("exact_distinct"),
        ((col("est_distinct") - col("exact_distinct")).cast(DoubleType) /
          col("exact_distinct").cast(DoubleType)).as("rel_err"))
  }

  private val k02Sql =
    """WITH hashed AS (
      |  SELECT md5(CAST(l_orderkey AS VARCHAR)) AS h FROM lineitem),
      |ranked AS (
      |  SELECT substring(h, 1, 2) AS bucket,
      |    length(regexp_extract(substring(h, 3, 8), '^0*')) AS zeros,
      |    substring(h, 3, 8) AS rest
      |  FROM hashed),
      |regs AS (
      |  SELECT bucket, max(CASE WHEN zeros = 8 THEN 33
      |    ELSE zeros * 4 + (CASE substring(rest, zeros + 1, 1)
      |      WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
      |      WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
      |      ELSE 0 END) + 1 END) AS r
      |  FROM ranked GROUP BY bucket),
      |sk AS (
      |  SELECT CAST(count(*) AS BIGINT) AS present,
      |    SUM((CAST(1 AS BIGINT) << (33 - r))) AS s_present
      |  FROM regs),
      |est0 AS (
      |  SELECT present, 256 - present AS zeros,
      |    (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 8589934592.0 /
      |      CAST(s_present + (256 - present) * 8589934592 AS DOUBLE) AS raw
      |  FROM sk),
      |est AS (
      |  SELECT present AS registers_hit,
      |    CAST(floor(CASE WHEN raw <= 640.0 AND zeros > 0
      |      THEN 256.0 * ln(256.0 / CAST(zeros AS DOUBLE)) ELSE raw END)
      |      AS BIGINT) AS est_distinct
      |  FROM est0),
      |ex AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct FROM lineitem)
      |SELECT registers_hit, est_distinct, exact_distinct,
      |  CAST(est_distinct - exact_distinct AS DOUBLE) / CAST(exact_distinct AS DOUBLE) AS rel_err
      |FROM est, ex""".stripMargin

  // ---- k03: hash-sampled quantiles ----------------------------------------
  // Exact quantiles sort the corpus; the scalable alternative keeps a
  // DETERMINISTIC Bernoulli sample (md5 of the row key under a fixed
  // threshold — reproducible, and consistent across tables sharing the
  // key) and sorts only the sample. The rate is the knob: 1/4 here so
  // the sf0.01 oracle is meaningful; at 100 TB the same query ships with
  // a prefix like '000' (1/4096) to hold the sorted set at ~1M rows.
  // Quantile definition is type-1 (value at rank ceil(p·n)) — the one
  // definition both engines express identically with row_number.
  // The q_exact column (same rank selection over the FULL table) is the
  // demonstration baseline — the global sort a production run drops.
  private val KQuantiles = Seq(0.25, 0.5, 0.75, 0.9, 0.99)

  private def k03(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val rowKey = md5(concat(col("l_orderkey").cast(StringType), lit("-"),
      col("l_linenumber").cast(StringType)).cast(BinaryType))
    val sample = l.filter(substring(rowKey, 1, 1).isin("0", "1", "2", "3"))

    def ranked(df: DataFrame): DataFrame = df.withColumn("rn",
      row_number().over(Window.orderBy(
        col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))))

    // the target-rank frame carries n along, so no scalar re-join is
    // needed downstream (a 1-row re-join would plan as BNLJ).
    def targets(df: DataFrame, rankCol: String): DataFrame = {
      val n = df.agg(count(lit(1)).as("n"))
      val ps = KQuantiles.map(p =>
        struct(lit(p).as("p"), greatest(lit(1L),
          ceil(lit(p) * col("n")).cast(LongType)).as(rankCol),
          col("n").cast(LongType).as("n_of")))
      n.select(explode(array(ps: _*)).as("t")).select(col("t.*"))
    }

    val qs = ranked(sample).join(broadcast(targets(sample, "rn")), "rn")
      .select(col("p"), col("l_extendedprice").as("q_sample"),
        col("n_of").as("n_sample"))
    val qx = ranked(l).join(broadcast(targets(l, "rn")), "rn")
      .select(col("p"), col("l_extendedprice").as("q_exact"))
    qs.join(qx, "p")
      .select(col("p"), col("q_sample"), col("q_exact"), col("n_sample"))
      .orderBy(col("p"))
  }

  private val k03Sql = {
    // CAST: a bare 0.25 literal is DECIMAL in DuckDB but DOUBLE in the
    // Spark lit() — the p column must carry the same type both sides.
    val ps = KQuantiles.map(p => s"(CAST($p AS DOUBLE))")
      .mkString("(VALUES ", ", ", ")")
    """WITH sample AS (
      |  SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |  WHERE substring(md5(CAST(l_orderkey AS VARCHAR) || '-' ||
      |    CAST(l_linenumber AS VARCHAR)), 1, 1) IN ('0','1','2','3')),
      |ranked_s AS (
      |  SELECT l_extendedprice, row_number() OVER (ORDER BY
      |    l_extendedprice, l_orderkey, l_linenumber) AS rn FROM sample),
      |ranked_f AS (
      |  SELECT l_extendedprice, row_number() OVER (ORDER BY
      |    l_extendedprice, l_orderkey, l_linenumber) AS rn FROM lineitem),
      |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_sample FROM sample),
      |nf AS (SELECT CAST(count(*) AS BIGINT) AS n_full FROM lineitem),
      |probs(p) AS """.stripMargin + ps + """,
      |qs AS (
      |  SELECT p, l_extendedprice AS q_sample FROM ranked_s, ns, probs
      |  WHERE rn = greatest(1, CAST(ceil(p * n_sample) AS BIGINT))),
      |qx AS (
      |  SELECT p, l_extendedprice AS q_exact FROM ranked_f, nf, probs
      |  WHERE rn = greatest(1, CAST(ceil(p * n_full) AS BIGINT)))
      |SELECT qs.p AS p, q_sample, q_exact, n_sample
      |FROM qs JOIN qx ON qs.p = qx.p, ns
      |ORDER BY p""".stripMargin
  }

  // ---- k04: KMV set-overlap (Jaccard) between two corpus slices -----------
  // Beyer et al. 2007: merge the per-set KMV sketches (k smallest of the
  // union, each hash flagged with which sets contain it); the fraction
  // of the merged sketch present in both sets estimates Jaccard, and
  // (k-1)/frac(h_(k)) estimates |A∪B|. At deployment each slice's
  // k-row sketch is computed where the slice lives and only 2k hashes
  // travel — corpus-slice overlap without touching either corpus twice.
  // Slices: English docs vs the src0-2 sources, keyed by content hash.
  private def k04(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val fp = md5(col("text").cast(BinaryType))
    val a = docs.filter(col("lang") === "en")
      .select(fp.as("h"), lit(1).as("in_a"), lit(0).as("in_b"))
    val b = docs.filter(col("source").isin("src0", "src1", "src2"))
      .select(fp.as("h"), lit(0).as("in_a"), lit(1).as("in_b"))
    val u = a.union(b).groupBy(col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val kmv = u.orderBy("h").limit(KmvK)
    val sk = kmv.agg(count(lit(1)).as("cnt"), max(col("h")).as("kh"),
        sum(col("in_a") * col("in_b")).as("n_both"))
      .select(col("cnt"), col("n_both"),
        (hexVal(col("kh"), 13).cast(DoubleType) / lit(4503599627370496.0))
          .as("frac"))
      .select(
        floor((col("cnt") - lit(1)).cast(DoubleType) / col("frac"))
          .cast(LongType).as("est_union"),
        (col("n_both").cast(DoubleType) / col("cnt").cast(DoubleType))
          .as("jaccard_est"))
    val exact = u.agg(
        count(lit(1)).as("exact_union"),
        sum(col("in_a") * col("in_b")).as("inter"))
      .select(col("exact_union").cast(LongType).as("exact_union"),
        (col("inter").cast(DoubleType) /
          col("exact_union").cast(DoubleType)).as("jaccard_exact"))
    zipOne(sk, exact)
      .select(col("est_union"), col("jaccard_est"),
        col("exact_union"), col("jaccard_exact"))
  }

  private val k04Sql = {
    val frac = s"(${sqlHexVal("kh", 13)} / 4503599627370496.0)"
    s"""WITH a AS (
       |  SELECT md5(text) AS h, 1 AS in_a, 0 AS in_b FROM documents WHERE lang = 'en'),
       |b AS (
       |  SELECT md5(text) AS h, 0 AS in_a, 1 AS in_b FROM documents
       |  WHERE source IN ('src0','src1','src2')),
       |u AS (
       |  SELECT h, max(in_a) AS in_a, max(in_b) AS in_b
       |  FROM (SELECT * FROM a UNION ALL SELECT * FROM b) GROUP BY h),
       |kmv AS (SELECT * FROM u ORDER BY h LIMIT $KmvK),
       |sk AS (
       |  SELECT CAST(count(*) AS BIGINT) AS cnt, max(h) AS kh,
       |    CAST(SUM(in_a * in_b) AS BIGINT) AS n_both FROM kmv),
       |est AS (
       |  SELECT CAST(floor(CAST(cnt - 1 AS DOUBLE) / $frac) AS BIGINT) AS est_union,
       |    CAST(n_both AS DOUBLE) / CAST(cnt AS DOUBLE) AS jaccard_est
       |  FROM sk),
       |ex AS (
       |  SELECT CAST(count(*) AS BIGINT) AS exact_union,
       |    CAST(SUM(in_a * in_b) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS jaccard_exact
       |  FROM u)
       |SELECT est_union, jaccard_est, exact_union, jaccard_exact FROM est, ex""".stripMargin
  }

  // ---- k05: bloom-filter semi-join ----------------------------------------
  // The runtime-filter pattern (Spark's own InjectRuntimeFilter, Trino's
  // dynamic filtering) made explicit and deterministic: build a bloom
  // over the dim-side join keys AS AN AGGREGATE (per-partition word
  // masks merged with bit_or — one 16384-row shuffle collapsing to a
  // 128 KiB map in one row), broadcast it, and prefilter the fact scan
  // BEFORE the join shuffle. False positives (~0.3% at m=2^20, 2 probes,
  // |keys|≈30k at sf0.1) are removed by the exact semi-join that
  // follows, so the result is exactly the semi-join — the oracle never
  // sees the bloom. At 100 TB the win is the shuffle: ~80% of lineitem
  // matches nothing and is dropped at the scan instead of shuffling.
  // Entirely built-in functions (md5/conv/bit ops/bit_or/map) — the
  // whole probe path stays inside whole-stage codegen.
  private val BloomBits = 1 << 20 // 2^20 bits = 16384 longs = 128 KiB

  private def k05(s: SparkSession, d: String): DataFrame = {
    val mask = lit((BloomBits - 1).toLong)
    def positions(key: Column): (Column, Column) = {
      val h = md5(key.cast(StringType).cast(BinaryType))
      (hexVal(h, 8).bitwiseAND(mask),
        conv(substring(h, 9, 8), 16, 10).cast(LongType).bitwiseAND(mask))
    }
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val (p1, p2) = positions(col("o_orderkey"))
    // The word masks densify into a zero-filled ARRAY (not a map):
    // element_at on Spark's ArrayBasedMapData is a LINEAR scan — ~16k
    // comparisons per probe — while array element_at is O(1). Dense
    // zero-fill: union a 0-mask row for every word, bit_or-group, then
    // order by word with array_sort over (w, m) structs.
    val words = BloomBits / 64
    val zeroRows = s.range(words)
      .select(col("id").cast(IntegerType).as("w"), lit(0L).as("m"))
    val bloom = urgent
      .select(explode(array(p1, p2)).as("p"))
      .select(shiftright(col("p"), 6).cast(IntegerType).as("w"),
        col("p").bitwiseAND(lit(63L)).cast(IntegerType).as("b"))
      .select(col("w"),
        expr("shiftleft(CAST(1 AS BIGINT), b)").as("m"))
      .union(zeroRows)
      .groupBy(col("w")).agg(expr("bit_or(m)").as("m"))
      .agg(expr("transform(array_sort(collect_list(struct(w, m))), x -> x.m)")
        .as("bloom"))
      .withColumn("j", lit(1))
    val l = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"))
      .withColumn("j", lit(1))
    // one md5 per probe row; both positions derive from the same hash
    val bh = md5(col("l_orderkey").cast(StringType).cast(BinaryType))
    val hitSql = (i: Int) => // SQL-level shiftright accepts a column count
      s"(shiftright(element_at(bloom, w$i + 1), b$i) & 1) = 1"
    l.join(broadcast(bloom), "j")
      .withColumn("bh", bh)
      .withColumn("f1", hexVal(col("bh"), 8).bitwiseAND(mask))
      .withColumn("f2", conv(substring(col("bh"), 9, 8), 16, 10)
        .cast(LongType).bitwiseAND(mask))
      .withColumn("w1", shiftright(col("f1"), 6).cast(IntegerType))
      .withColumn("b1", col("f1").bitwiseAND(lit(63L)).cast(IntegerType))
      .withColumn("w2", shiftright(col("f2"), 6).cast(IntegerType))
      .withColumn("b2", col("f2").bitwiseAND(lit(63L)).cast(IntegerType))
      .filter(expr(hitSql(1)) && expr(hitSql(2)))
      .join(broadcast(urgent), col("l_orderkey") === col("o_orderkey"),
        "left_semi")
      .agg(count(lit(1)).cast(LongType).as("n_matched"),
        sum(col("l_extendedprice").cast(DecimalType(12, 2)))
          .cast(DoubleType).as("revenue"))
  }

  private val k05Sql =
    """SELECT CAST(count(*) AS BIGINT) AS n_matched,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_orderkey IN
      |  (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin

  // ---- k06: STREAMING HyperLogLog over a real micro-batched stream --------
  // The online form of k02, end-to-end through the driver-free file-
  // source mount (StreamParityQueries.throughStream): per-event-type
  // register state lives in flatMapGroupsWithState across 3 micro-batch
  // boundaries; register merge is max, so the final state is chunk-
  // invariant — THE mergeable-sketch property under the oracle. The
  // hash-gated output is the final integer register state per key
  // (n_events proves every batch merged; registers_hit/s_total ARE the
  // sketch); the derived estimate's small-range branch is ln()-based
  // and engine-libm-dependent, so SketchSpec pins it JVM-side instead
  // of the cross-engine hash.
  private def k06(s: SparkSession, d: String): DataFrame = {
    val e = Tables.eventsMs(s, d)
    val kev = withHllRank(e
      .select(col("event_type"), col("ts_ms"), col("event_id"),
        md5(col("user_id").cast(StringType).cast(BinaryType)).as("h"))
      .withColumn("bucket",
        conv(substring(col("h"), 1, 2), 16, 10).cast(IntegerType))
      .withColumn("rest", substring(col("h"), 3, 8)))
      .select(col("event_type").as("key"), col("bucket").as("topic"),
        col("ts_ms").as("ts"), col("rank").cast(DoubleType).as("value"),
        lit(null).cast(StringType).as("text"), lit(false).as("paused"),
        col("event_id").as("seq"))
    StreamParityQueries.throughStream(s, kev, Seq(col("seq")),
        s"hll@$d", ds => graft.streaming.StreamingSketch.hllStream(ds),
        Map.empty)
      .groupBy(col("key"))
      .agg(max(struct(col("ts"), col("text"))).as("fin"))
      .select(col("key").as("event_type"),
        col("fin.ts").as("n_events"),
        split(col("fin.text"), ",").getItem(0).cast(LongType)
          .as("registers_hit"),
        split(col("fin.text"), ",").getItem(1).cast(LongType).as("s_total"))
      .orderBy(col("event_type"))
  }

  private val k06Sql =
    """WITH hashed AS (
      |  SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS h FROM events),
      |ranked AS (
      |  SELECT event_type, substring(h, 1, 2) AS bucket,
      |    length(regexp_extract(substring(h, 3, 8), '^0*')) AS zeros,
      |    substring(h, 3, 8) AS rest
      |  FROM hashed),
      |regs AS (
      |  SELECT event_type, bucket, max(CASE WHEN zeros = 8 THEN 33
      |    ELSE zeros * 4 + (CASE substring(rest, zeros + 1, 1)
      |      WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
      |      WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
      |      ELSE 0 END) + 1 END) AS r
      |  FROM ranked GROUP BY event_type, bucket),
      |sk AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS present,
      |    SUM((CAST(1 AS BIGINT) << (33 - r))) AS s_present
      |  FROM regs GROUP BY event_type),
      |n AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY event_type)
      |SELECT sk.event_type AS event_type, n_events,
      |  present AS registers_hit,
      |  CAST(s_present + (256 - present) * 8589934592 AS BIGINT) AS s_total
      |FROM sk JOIN n ON sk.event_type = n.event_type
      |ORDER BY event_type""".stripMargin

  // ---- k07: composed single-scan corpus profile ---------------------------
  // The production "stats job": per-language doc counts, volume, AND
  // distinct-content sketch state from ONE scan of the corpus — counts
  // and sums distribute over the HLL bucket grouping, so the whole
  // profile is two cascaded hash aggregations (scan → (lang, bucket)
  // partial → lang) with no join, no second scan, no distinct. The
  // shuffle after the first aggregate carries ≤ |langs|·256 rows
  // whatever the corpus size — this is why sketch-shaped profiles are
  // the only affordable per-slice stats at 100 TB (an exact
  // count-distinct per language would shuffle every distinct text).
  // Sketch state is emitted as integers (same rationale as k06: the
  // estimate's small-range ln() branch stays JVM-side, SketchSpec).
  private def k07(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val h = md5(col("text").cast(BinaryType))
    withHllRank(docs
      .select(col("lang"), col("n_chars"),
        substring(h, 1, 2).as("bucket"), substring(h, 3, 8).as("rest")))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("c"), sum(col("n_chars")).as("ch"),
        max(col("rank")).as("r"))
      .groupBy(col("lang"))
      .agg(sum(col("c")).cast(LongType).as("n_docs"),
        sum(col("ch")).cast(LongType).as("total_chars"),
        count(lit(1)).cast(LongType).as("registers_hit"),
        (sum(expr("shiftleft(CAST(1 AS BIGINT), 33 - r)")) +
          (lit(256L) - count(lit(1))) * lit(8589934592L))
          .cast(LongType).as("s_total"))
      .orderBy(col("lang"))
  }

  private val k07Sql =
    """WITH ranked AS (
      |  SELECT lang, n_chars, substring(md5(text), 1, 2) AS bucket,
      |    length(regexp_extract(substring(md5(text), 3, 8), '^0*')) AS zeros,
      |    substring(md5(text), 3, 8) AS rest
      |  FROM documents),
      |bk AS (
      |  SELECT lang, bucket, count(*) AS c, SUM(n_chars) AS ch,
      |    max(CASE WHEN zeros = 8 THEN 33
      |      ELSE zeros * 4 + (CASE substring(rest, zeros + 1, 1)
      |        WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
      |        WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
      |        ELSE 0 END) + 1 END) AS r
      |  FROM ranked GROUP BY lang, bucket)
      |SELECT lang, CAST(SUM(c) AS BIGINT) AS n_docs,
      |  CAST(SUM(ch) AS BIGINT) AS total_chars,
      |  CAST(count(*) AS BIGINT) AS registers_hit,
      |  CAST(SUM((CAST(1 AS BIGINT) << (33 - r))) +
      |    (256 - count(*)) * 8589934592 AS BIGINT) AS s_total
      |FROM bk GROUP BY lang ORDER BY lang""".stripMargin

  // ---- k08: count-min sketch heavy hitters --------------------------------
  // Cormode & Muthukrishnan 2005 — the frequency sketch next to the
  // cardinality sketches (k01/k02): d=4 rows × w counters; every
  // occurrence increments one counter per row (positions from disjoint
  // 32-bit slices of one md5 — independent-enough hashes from a single
  // hash computation); the estimate for a key is the MIN over its d
  // counters, and it can only OVERestimate (collisions add, never
  // subtract) — the `overestimate` column is the demonstrated ≥0 bound.
  //
  // Scale shape: the counter build is a map-side-combined count on
  // (row, position) — after partial aggregation the shuffle carries at
  // most d·w rows PER PARTITION whatever the corpus size, and the
  // final sketch is d·w integers. Frequency estimation for any
  // candidate set is then a broadcast join against that tiny counter
  // table — the corpus is scanned once and never shuffled by key. The
  // exact per-token count column is the demonstration baseline (it IS
  // the corpus-wide shuffle the sketch exists to avoid); a production
  // run drops it and keeps only the sketch + candidates.
  //
  // w=16 is deliberately far too narrow for the 31-token fixture
  // vocabulary so collisions genuinely occur and the min-over-rows
  // recovery is visible in the output; production sizes w ≈ e/ε.
  private val CmsD = 4
  private val CmsW = 16

  private def k08(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
    def posCol(i: Int): Column =
      conv(substring(col("h"), 1 + 8 * i, 8), 16, 10).cast(LongType)
        .bitwiseAND(lit((CmsW - 1).toLong))
    def rpExplode(df: DataFrame): DataFrame = df
      .withColumn("h", md5(col("tok").cast(BinaryType)))
      .select(col("*"), explode(array((0 until CmsD).map(i =>
        struct(lit(i).as("r"), posCol(i).as("p"))): _*)).as("rp"))
      .withColumn("r", col("rp.r")).withColumn("p", col("rp.p"))
      .drop("h", "rp")
    // counters: one count per (row, position) — partial agg collapses
    // each input partition to ≤ d·w rows before the shuffle.
    val counters = rpExplode(toks).groupBy(col("r"), col("p"))
      .agg(count(lit(1)).as("n"))
    // candidate heavy hitters (top-20 exact, the baseline a production
    // run replaces with a tracked candidate list or a second pass)
    val cand = toks.groupBy(col("tok"))
      .agg(count(lit(1)).cast(LongType).as("exact_count"))
      .orderBy(col("exact_count").desc, col("tok")).limit(20)
    broadcast(rpExplode(cand)).join(counters, Seq("r", "p"))
      .groupBy(col("tok"))
      .agg(max(col("exact_count")).as("exact_count"),
        min(col("n")).cast(LongType).as("est_count"))
      .select(col("tok"), col("est_count"), col("exact_count"),
        (col("est_count") - col("exact_count")).cast(LongType)
          .as("overestimate"))
      .orderBy(col("exact_count").desc, col("tok"))
  }

  private val k08Sql = {
    def pos(i: Int) =
      s"(${sqlHexVal(s"substring(h, ${1 + 8 * i}, 8)", 8)} % $CmsW)"
    def rp(src: String, extra: String) = (0 until CmsD).map(i =>
      s"SELECT $extra $i AS r, ${pos(i)} AS p FROM $src").mkString(" UNION ALL ")
    s"""WITH toks AS (
       |  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok
       |  FROM documents),
       |th AS (SELECT tok, md5(tok) AS h FROM toks),
       |rp AS (${rp("th", "")}),
       |counters AS (SELECT r, p, CAST(count(*) AS BIGINT) AS n
       |  FROM rp GROUP BY r, p),
       |cand AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact_count
       |  FROM toks GROUP BY tok ORDER BY exact_count DESC, tok LIMIT 20),
       |ch AS (SELECT tok, exact_count, md5(tok) AS h FROM cand),
       |cpos AS (${rp("ch", "tok, exact_count,")}),
       |est AS (
       |  SELECT tok, max(exact_count) AS exact_count,
       |    CAST(min(n) AS BIGINT) AS est_count
       |  FROM cpos JOIN counters USING (r, p) GROUP BY tok)
       |SELECT tok, est_count, exact_count,
       |  CAST(est_count - exact_count AS BIGINT) AS overestimate
       |FROM est ORDER BY exact_count DESC, tok""".stripMargin
  }

  // ---- k09: dyadic quantile sketch ------------------------------------------
  // Cormode & Muthukrishnan's dyadic decomposition for quantiles, with
  // EXACT counters (the determinism rule of this file): 12 levels over
  // a 17-bit value domain, level l holding one counter per cell
  // v >> (17 - l). Counter merge is +, so the sketch is an
  // order-independent, associatively mergeable function of the SET —
  // Spark's partial aggregation caps each input partition's
  // contribution at Σ 2^l ≈ 4095 rows before the shuffle, whatever
  // the corpus size, and a quantile is a descent over ≤ 2^11 cells.
  // That is the whole 100 TB story: the corpus is scanned once, never
  // sorted, never shuffled by value; rank error is ZERO (counters
  // exact) and value error is the finest cell width (64 domain units
  // here; production picks levels for its error budget — the CM paper
  // layers approximate counters per level when even the counter table
  // must shrink). q_lo is the type-1-quantile cell's LOW value; the
  // exact type-1 quantile always lies in [q_lo, q_lo + 64).
  private val DyadicBits = graft.streaming.StreamingSketch.DyadicBits
  private val DyadicLevels = graft.streaming.StreamingSketch.DyadicLevels

  private def k09(s: SparkSession, d: String): DataFrame = {
    val v = Tables.lineitem(s, d)
      .select(least(lit((1L << DyadicBits) - 1),
        floor(col("l_extendedprice")).cast(LongType)).as("v"))
    // the sketch: one counter per (level, cell), map-side combined
    val cells = v.select(explode(array((0 until DyadicLevels).map(l =>
        struct(lit(l).as("l"),
          shiftright(col("v"), DyadicBits - l).as("c"))): _*)).as("lc"))
      .groupBy(col("lc.l").as("l"), col("lc.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
    // quantile descent: the finest level's cumulative walk (the
    // coarser levels are the mergeability/early-descent structure).
    // Everything downstream of the counter aggregation runs on the
    // ≤ 4095-row SKETCH, so the global windows and the 5-way quantile
    // explode are deliberate sketch-sized single-partition work — no
    // join, no broadcast, nothing data-proportional.
    val all = Window.partitionBy()
    val fine = cells
      .withColumn("cells", count(lit(1)).over(all).cast(LongType))
      .filter(col("l") === (DyadicLevels - 1))
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("c"))))
      .withColumn("n", max(col("cum")).over(all).cast(LongType))
    fine.withColumn("p", explode(array(KQuantiles.map(lit): _*)))
      .filter(col("cum") >=
        greatest(lit(1L), ceil(col("p") * col("n")).cast(LongType)))
      .groupBy(col("p"))
      .agg(min(col("c")).as("cstar"), max(col("n")).as("n"),
        max(col("cells")).as("cells"))
      .select(col("p"),
        shiftleft(col("cstar"), DyadicBits - (DyadicLevels - 1))
          .cast(LongType).as("q_lo"),
        col("n"), col("cells"))
      .orderBy(col("p"))
  }

  private val k09Sql = {
    val ps = KQuantiles.map(p => s"(CAST($p AS DOUBLE))")
      .mkString("(VALUES ", ", ", ")")
    s"""WITH v AS (SELECT least(${(1L << DyadicBits) - 1},
       |    CAST(floor(l_extendedprice) AS BIGINT)) AS v FROM lineitem),
       |-- the finest level's cells; the full 12-level cell total rides
       |-- along as the sketch-shape column
       |fine AS (SELECT (v >> ${DyadicBits - (DyadicLevels - 1)}) AS c,
       |    count(*) AS cnt FROM v GROUP BY 1),
       |cum AS (SELECT c, sum(cnt) OVER (ORDER BY c) AS cum FROM fine),
       |cells AS (SELECT CAST(count(*) AS BIGINT) AS cells FROM (
       |  SELECT DISTINCT l.l, v.v >> (${DyadicBits} - l.l) FROM v,
       |    (SELECT unnest(range(${DyadicLevels})) AS l) l)),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
       |probs(p) AS $ps
       |SELECT p,
       |  CAST(min(c) << ${DyadicBits - (DyadicLevels - 1)} AS BIGINT)
       |    AS q_lo,
       |  any_value(n.n) AS n, any_value(cells.cells) AS cells
       |FROM probs, n, cells
       |JOIN cum ON cum.cum >= greatest(1, CAST(ceil(p * n.n) AS BIGINT))
       |GROUP BY p ORDER BY p""".stripMargin
  }

  // ---- k10: STREAMING dyadic quantile sketch --------------------------------
  // k09's online form through the driver-free micro-batched mount (the
  // k06 pattern): per-event-type cell counters live in
  // flatMapGroupsWithState across 3 micro-batch boundaries; counter
  // merge is +, so the final state is chunk-invariant, and the emitted
  // integers (cell count, median cell low) are a deterministic
  // function of the SET the oracle replays directly.
  private def k10(s: SparkSession, d: String): DataFrame = {
    val e = Tables.eventsMs(s, d)
    val kev = e.select(col("event_type").as("key"),
        lit(0).as("topic"), col("ts_ms").as("ts"),
        (col("user_id") % (1L << DyadicBits)).cast(DoubleType).as("value"),
        lit(null).cast(StringType).as("text"), lit(false).as("paused"),
        col("event_id").as("seq"))
    StreamParityQueries.throughStream(s, kev, Seq(col("seq")),
        s"dyadic@$d",
        ds => graft.streaming.StreamingSketch.dyadicStream(ds),
        Map.empty)
      .groupBy(col("key"))
      .agg(max(struct(col("ts"), col("text"))).as("fin"))
      .select(col("key").as("event_type"),
        col("fin.ts").as("n_events"),
        split(col("fin.text"), ",").getItem(0).cast(LongType)
          .as("cells_total"),
        split(col("fin.text"), ",").getItem(1).cast(LongType)
          .as("median_lo"))
      .orderBy(col("event_type"))
  }

  private val k10Sql =
    s"""WITH v AS (SELECT event_type,
       |    user_id % ${1L << DyadicBits} AS v FROM events),
       |fine AS (SELECT event_type,
       |    (v >> ${DyadicBits - (DyadicLevels - 1)}) AS c, count(*) AS cnt
       |  FROM v GROUP BY 1, 2),
       |cum AS (SELECT event_type, c,
       |    sum(cnt) OVER (PARTITION BY event_type ORDER BY c) AS cum
       |  FROM fine),
       |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
       |  FROM v GROUP BY 1),
       |cells AS (SELECT event_type, CAST(count(*) AS BIGINT) AS cells
       |  FROM (SELECT DISTINCT event_type, l.l,
       |      v.v >> (${DyadicBits} - l.l) AS cell FROM v,
       |    (SELECT unnest(range(${DyadicLevels})) AS l) l)
       |  GROUP BY 1),
       |med AS (SELECT cum.event_type,
       |    CAST(min(cum.c) << ${DyadicBits - (DyadicLevels - 1)}
       |      AS BIGINT) AS median_lo
       |  FROM cum JOIN n ON n.event_type = cum.event_type
       |  WHERE cum.cum >= greatest(1, CAST(ceil(0.5 * n.n) AS BIGINT))
       |  GROUP BY 1)
       |SELECT n.event_type AS event_type, n.n AS n_events,
       |  cells.cells AS cells_total, med.median_lo AS median_lo
       |FROM n
       |JOIN cells ON cells.event_type = n.event_type
       |JOIN med ON med.event_type = n.event_type
       |ORDER BY event_type""".stripMargin

  val all: Seq[Q] = Seq(
    Q("k01_kmv_distinct", k01, Some(k01Sql)),
    Q("k02_hll_distinct", k02, Some(k02Sql)),
    Q("k03_sample_quantiles", k03, Some(k03Sql)),
    Q("k04_kmv_jaccard", k04, Some(k04Sql)),
    Q("k05_bloom_semijoin", k05, Some(k05Sql)),
    Q("k06_streaming_hll", k06, Some(k06Sql)),
    Q("k07_corpus_profile", k07, Some(k07Sql)),
    Q("k08_countmin_hh", k08, Some(k08Sql)),
    Q("k09_dyadic_quantiles", k09, Some(k09Sql)),
    Q("k10_streaming_dyadic", k10, Some(k10Sql)),
  )
}
