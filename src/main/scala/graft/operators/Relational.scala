package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational / OLAP core: the query surface a user of any analytics engine
  * expects (scan→filter→agg, star joins, top-N, windows, semi/anti joins).
  *
  * Scale notes: every filter here is a pushable parquet predicate; dimension
  * tables (nation/region/customer at test SF) are broadcast so the fact scan
  * never shuffles for the join; aggregations are partial (map-side combine)
  * by construction.
  */
object Relational {

  /** TPC-H Q1-style pricing summary. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       round(sum(l_extendedprice), 2) AS sum_base_price,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |       round(avg(l_quantity), 4) AS avg_qty,
      |       round(avg(l_discount), 4) AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Star join: revenue by nation for a market segment. `nation`/`region`
    * are true dims (fixed 25/5 rows) and carry broadcast hints; `customer`
    * is SF-proportional (the segment filter keeps ~1/5 of it), so it gets
    * NO hint — the static plan is a shuffled join on `custkey` and AQE
    * converts it to broadcast at test scale where it measures small. */
  def q2JoinBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val nation = Tables.nation(spark, dir)
    val region = Tables.region(spark, dir)
    orders
      .join(customer.filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val q2Oracle: String =
    """SELECT r_name, n_name,
      |       round(sum(o_totalprice), 2) AS revenue,
      |       count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** Top-N revenue orders (group + sort + limit). */
  def q3TopRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val orders = Tables.orders(spark, dir)
    li.groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("orderkey"), col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("orderkey"))
      .limit(20)
  }

  val q3Oracle: String =
    """SELECT l_orderkey AS orderkey, o_orderpriority,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY l_orderkey, o_orderpriority
      |ORDER BY revenue DESC, orderkey
      |LIMIT 20""".stripMargin

  /** Window functions: per-order line ranking + running quantity. */
  def q4Window(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, dir).filter(col("l_orderkey") < 300)
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
    li.select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("linenumber"),
        rank().over(w).cast("long").as("rnk"),
        round(sum(col("l_quantity")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).as("running_qty"))
      .orderBy(col("l_orderkey"), col("linenumber"))
  }

  val q4Oracle: String =
    """SELECT l_orderkey, l_linenumber::BIGINT AS linenumber,
      |       rank() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rnk,
      |       round(sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
      |FROM lineitem WHERE l_orderkey < 300
      |ORDER BY l_orderkey, linenumber""".stripMargin

  /** Semi + anti join: customers with orders vs without. */
  def q5SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir).select(col("o_custkey"))
    val withOrders = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("has_orders").as("bucket"))
    val withoutOrders = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("no_orders").as("bucket"))
    withOrders.unionAll(withoutOrders)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"), min(col("c_custkey")).as("min_key"))
      .orderBy(col("bucket"))
  }

  val q5Oracle: String =
    """WITH u AS (
      |  SELECT c_custkey, 'has_orders' AS bucket FROM customer
      |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  UNION ALL
      |  SELECT c_custkey, 'no_orders' AS bucket FROM customer
      |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
      |SELECT bucket, count(*) AS n, min(c_custkey) AS min_key
      |FROM u GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Conditional (CASE-pivot) aggregation by order priority. */
  def q6ConditionalAgg(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    orders.groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_finished"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
        round(sum(when(col("o_totalprice") > 100000, col("o_totalprice")).otherwise(0.0)), 2).as("big_revenue"))
      .orderBy(col("o_orderpriority"))
  }

  val q6Oracle: String =
    """SELECT o_orderpriority,
      |       count(*) AS n_orders,
      |       sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS n_finished,
      |       sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS n_open,
      |       round(sum(CASE WHEN o_totalprice > 100000 THEN o_totalprice ELSE 0.0 END), 2) AS big_revenue
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Exact distinct counts per group (the approx variant lives in Bench —
    * approx_count_distinct is engine-specific, not oracle-comparable). */
  def q7Distinct(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  /** q8: ROLLUP hierarchy totals (region → nation → grand total).
    * `customer` is SF-proportional — no broadcast hint (q2's rule); the
    * fixed-size dims keep theirs. */
  def q8Rollup(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val nation = Tables.nation(spark, dir)
    val region = Tables.region(spark, dir)
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  val q8Oracle: String =
    """SELECT r_name, n_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  /** q9: exact interpolated percentiles per group (Spark `percentile` and
    * DuckDB `quantile_cont` share the linear-interpolation definition;
    * rounded at 4dp since selection order within the sort is engine-local).
    *
    * Shape: distributed ORDER-STATISTIC SELECTION, not a per-group window
    * sort. A `Window.partitionBy(group)` rank puts each ENTIRE group in one
    * task — fine for many small groups, a 33 TB single-task sort when 100 TB
    * splits over 3 return flags. Instead: range-partition by (group, value)
    * and sort WITHIN partitions (the parallel global sort, every task an
    * equal slice), materialize once, then (1) count rows per (partition,
    * group) — P×G longs to the driver, (2) turn the quantile definition
    * h = q·(n−1) into per-group target POSITIONS, (3) a second scan emits
    * only the ≤ G×8 bracketing rows, interpolated on the driver. Spark's
    * built-in `percentile` is worse still — it holds a counts-map of every
    * distinct value per partial buffer (~600k doubles here, 26 s measured).
    * Two scans of the checkpointed sort, all P tasks busy, driver state
    * O(P·G + G·quantiles) — the shape that survives any group size. */
  def q9Percentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parts = spark.sparkContext.defaultParallelism
    val sorted = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .repartitionByRange(parts, col("l_returnflag"), col("l_extendedprice"))
      .sortWithinPartitions(col("l_returnflag"), col("l_extendedprice"))
      .localCheckpoint() // sort once; both passes below re-read it
      .as[(String, Double)]

    // pass 1: per-(partition, group) row counts (partitions are globally
    // ordered, and within one partition a group's rows are contiguous)
    val partCounts: Array[(Int, Seq[(String, Long)])] =
      sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.LinkedHashMap[String, Long]()
        it.foreach { case (f, _) => m.update(f, m.getOrElse(f, 0L) + 1L) }
        Iterator((pid, m.toSeq))
      }.collect().sortBy(_._1)

    val nByFlag: Map[String, Long] = partCounts.flatMap(_._2)
      .groupBy(_._1).map { case (f, xs) => f -> xs.map(_._2).sum }
    // start rank (within its group) of each partition's first group-row
    val startRank: Map[(Int, String), Long] = {
      val running = scala.collection.mutable.Map[String, Long]()
      partCounts.flatMap { case (pid, fs) =>
        fs.map { case (f, c) =>
          val s = running.getOrElse(f, 0L); running(f) = s + c; (pid, f) -> s
        }
      }.toMap
    }
    // target 0-based positions per group: the bracketing rows of each
    // quantile (h = q·(n−1), DuckDB quantile_cont) plus min and max
    val quantiles = Seq(0.5, 0.9, 0.99)
    val wantByFlag: Map[String, Set[Long]] = nByFlag.map { case (f, n) =>
      val hs = quantiles.flatMap { q =>
        val h = (n - 1).toDouble * q
        Seq(math.floor(h).toLong, math.ceil(h).toLong)
      }
      f -> (hs ++ Seq(0L, n - 1)).toSet
    }

    // pass 2: emit only the targeted rows (≤ G×8 across the whole corpus)
    val wantB = spark.sparkContext.broadcast((startRank, wantByFlag))
    val picked: Map[(String, Long), Double] =
      sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
        val (starts, want) = wantB.value
        val seen = scala.collection.mutable.Map[String, Long]()
        it.flatMap { case (f, v) =>
          val pos = starts.getOrElse((pid, f), 0L) + seen.getOrElse(f, 0L)
          seen.update(f, seen.getOrElse(f, 0L) + 1L)
          if (want.getOrElse(f, Set.empty).contains(pos)) Some(((f, pos), v)) else None
        }
      }.collect().toMap

    // driver: interpolate (lo·(1−frac) + hi·frac — the same two-term sum
    // the previous windowed formulation aggregated, so bit-identical)
    val rows = nByFlag.toSeq.sortBy(_._1).map { case (f, n) =>
      def at(pos: Long): Double = picked((f, pos))
      def quant(q: Double): Double = {
        val h = (n - 1).toDouble * q
        val lo = math.floor(h).toLong; val hi = math.ceil(h).toLong
        if (lo == hi) at(lo)
        else { val frac = h - lo; at(lo) * (1.0 - frac) + at(hi) * frac }
      }
      (f, quant(0.5), quant(0.9), quant(0.99), at(0L), at(n - 1))
    }
    rows.toDF("l_returnflag", "p50", "p90", "p99", "p0", "p100")
      .select(col("l_returnflag"),
        round(col("p50"), 4).as("p50"), round(col("p90"), 4).as("p90"),
        round(col("p99"), 4).as("p99"), round(col("p0"), 4).as("p0"),
        round(col("p100"), 4).as("p100"))
      .orderBy(col("l_returnflag"))
  }

  val q9Oracle: String =
    """SELECT l_returnflag,
      |       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      |       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
      |       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
      |       round(min(l_extendedprice), 4) AS p0,
      |       round(max(l_extendedprice), 4) AS p100
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val q7Oracle: String =
    """SELECT l_returnflag,
      |       count(DISTINCT l_partkey) AS n_parts,
      |       count(DISTINCT l_suppkey) AS n_supps,
      |       count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q10: correlated scalar subquery (the TPC-H Q17 shape) — small-lot
    * revenue for one brand, where "small" is each part's OWN average
    * quantity: `l_quantity < 0.2 · avg(quantity of that part)`. Declared
    * as SQL with the correlated subquery so CATALYST does the
    * decorrelation: the rewritten plan is a per-partkey aggregate joined
    * back to the fact scan — never a per-row subquery execution, which is
    * the difference between one extra aggregate pass and O(rows)
    * re-scans at 100 TB. The per-part average divides EXACT integer sums
    * (quantities are integral; cast to BIGINT), so the filter threshold
    * is bit-identical in both engines; the price sum rounds at 2 dp (q1
    * convention). */
  def correlatedSmallLot(spark: SparkSession, dir: String,
                         brand: String = "Brand#13"): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("g_lineitem")
    Tables.part(spark, dir).createOrReplaceTempView("g_part")
    spark.sql(
      s"""SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
         |       count(*) AS n_small_lots
         |FROM g_lineitem l JOIN g_part p ON l.l_partkey = p.p_partkey
         |WHERE p.p_brand = '$brand'
         |  AND l.l_quantity < (
         |    SELECT 0.2 * (sum(CAST(l2.l_quantity AS BIGINT)) / count(*))
         |    FROM g_lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin)
  }

  def correlatedSmallLotOracle(brand: String = "Brand#13"): String =
    s"""SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
       |       count(*) AS n_small_lots
       |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       |WHERE p.p_brand = '$brand'
       |  AND l.l_quantity < (
       |    SELECT 0.2 * (sum(CAST(l2.l_quantity AS BIGINT)) / count(*))
       |    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin

  /** q11: HyperLogLog distinct `l_orderkey` per return flag (Flajolet et
    * al. 2007) — the hash-gateable counterpart of q7's rows-only
    * `approx_count_distinct`. Registers are `max` over an integer rank
    * (first-set-bit position of the h60 suffix), so like KMV kth-mins and
    * CMS counters — and unlike Misra–Gries — the whole sketch is
    * order-independent integer state and replays bit-for-bit in DuckDB.
    * The estimate stays deterministic because the harmonic-sum
    * denominator Σ 2^-reg is accumulated as EXACT integers scaled by 2^53
    * (each term a power of two, total < 2^61), leaving one double
    * expression both engines evaluate with identical IEEE ops.
    *
    * Shape: map-only hash/rank, then one partial-agg groupBy on
    * (flag, bucket) — map-side `max` caps the shuffle at
    * O(partitions × groups × m) rows no matter the corpus size — then a
    * groups-sized final agg. The 100 TB distinct-count shape: nothing
    * anywhere holds per-value state (q7's exact distinct shuffles every
    * distinct key; Spark's HLL sketch can't be oracle-replayed). */
  def q11HllDistinct(spark: SparkSession, dir: String, p: Int = 8): DataFrame = {
    val m = 1 << p                 // registers per group
    // fanOut at THIS call site (not inside hllRegisters): the 600k-row
    // one-row-group lineitem md5 pass wins from 32-way compute
    // (1.08→0.78 s measured); q22's two event-half register builds LOST
    // from the same shuffle (0.71→1.32 s) and stay un-fanned
    hllEstimate(
      hllRegisters(Tables.fanOut(Tables.lineitem(spark, dir), col("l_orderkey")),
        Seq("l_returnflag"), "hll:", "l_orderkey", m),
      Seq("l_returnflag"), m)
      .orderBy("l_returnflag")
  }

  /** The `(groupCols..., bucket, reg)` register table for HLL over
    * `keyCol`, shared by q11/q21/q22. rho = rank of the highest set bit in
    * the 52-bit hash suffix, 1-based from the left (53 for an all-zero
    * suffix); conv(r,10,2) and DuckDB's bin(r) both render without
    * leading zeros, so length() agrees. */
  private def hllRegisters(rows: DataFrame, groupCols: Seq[String],
                           keyPrefix: String, keyCol: String, m: Int): DataFrame = {
    val gc = groupCols.map(col)
    // registers are max-merged integers — partitioning-independent; the
    // per-call-site fanOut decision lives with the callers (q11/q21 fan
    // the 600k-row lineitem scan, q22's event halves measured faster
    // un-fanned)
    rows
      .select(gc :+ Dedup.h60(concat(lit(keyPrefix), col(keyCol).cast("string"))).as("h"): _*)
      .select(gc :+ expr(s"h % $m").as("bucket") :+ expr(s"h div $m").as("r"): _*)
      .withColumn("rho", when(col("r") === 0L, lit(53L))
        .otherwise(lit(53L) - length(conv(col("r"), 10, 2)).cast("long")))
      .groupBy(gc :+ col("bucket"): _*).agg(max(col("rho")).as("reg"))
  }

  /** The q11 estimate pipeline over any `(groupCols..., bucket, reg)`
    * register table — shared by q11 (per-flag) and q21 (per cube cell):
    * exact-integer harmonic sum scaled by 2^53, one IEEE division, linear
    * counting below 2.5·m. */
  private def hllEstimate(regs: DataFrame, groupCols: Seq[String], m: Int): DataFrame = {
    val two53 = 9007199254740992L
    val gc = groupCols.map(col)
    regs.groupBy(gc: _*).agg(
        count(lit(1)).as("n_present"),
        sum(expr("shiftleft(cast(1 as bigint), cast(53 - reg as int))")).as("present_sum"),
        sum(col("reg") * (col("bucket") + lit(1L))).as("register_checksum"))
      .select(gc ++ Seq(col("register_checksum"),
        (lit(m.toLong) - col("n_present")).as("n_zero_buckets"),
        (col("present_sum") + (lit(m.toLong) - col("n_present")) * lit(two53)).as("intsum")): _*)
      .withColumn("est_raw",
        lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble)) *
          lit(m.toDouble * m) * lit(two53.toDouble) / col("intsum").cast("double"))
      // standard small-range correction: linear counting off the zero buckets
      .withColumn("est_distinct",
        round(when(col("n_zero_buckets") > lit(0L) && col("est_raw") <= lit(2.5 * m),
          lit(m.toDouble) * log(lit(m.toDouble) / col("n_zero_buckets").cast("double")))
          .otherwise(col("est_raw")), 4))
      .select(gc ++ Seq(col("est_distinct"),
        col("n_zero_buckets"), col("register_checksum")): _*)
  }

  /** q21: HLL DISTINCT over a CUBE, rolled up IN SKETCH SPACE — the
    * mergeability claim that makes sketches the 100 TB answer, executed:
    * ONE corpus pass builds the finest-grain register table
    * (flag × status × bucket — ≤ F·S·m rows, the sketch, not the data);
    * every coarser cell ((flag, ALL), (ALL, status), (ALL, ALL)) is then
    * derived by `max`-merging REGISTERS, never rescanning the corpus.
    * Contrast q12's exact cube: Expand replicates every corpus row ×4
    * before the shuffle — correct, but the map-side input is 4× the scan;
    * here the ×4 expansion happens on the register table. This is how a
    * warehouse serves distinct-count rollups at every granularity from
    * one sketch pass (Druid/BigQuery sketch rollups). 'ALL' is the
    * grouping sentinel (not NULL) so the gate's column hashing stays
    * engine-neutral. Spec: the (flag, ALL) cells reproduce q11's output
    * EXACTLY — merged registers ≡ directly-built registers. */
  def q21HllCube(spark: SparkSession, dir: String, p: Int = 8): DataFrame = {
    val m = 1 << p
    // the ONLY corpus-sized aggregation: the finest-grain register build
    // (fanned out — the q11 call-site measurement, 1.40→1.04 s here)
    val fine = hllRegisters(Tables.fanOut(Tables.lineitem(spark, dir), col("l_orderkey")),
      Seq("l_returnflag", "l_linestatus"), "hll:", "l_orderkey", m)
    val merged = fine
      .select(explode(expr(
        "array(named_struct('gf', l_returnflag, 'gs', l_linestatus), " +
          "named_struct('gf', l_returnflag, 'gs', 'ALL'), " +
          "named_struct('gf', 'ALL', 'gs', l_linestatus), " +
          "named_struct('gf', 'ALL', 'gs', 'ALL'))")).as("g"),
        col("bucket"), col("reg"))
      .select(col("g.gf").as("grp_flag"), col("g.gs").as("grp_status"),
        col("bucket"), col("reg"))
      .groupBy(col("grp_flag"), col("grp_status"), col("bucket"))
      .agg(max(col("reg")).as("reg"))
    hllEstimate(merged, Seq("grp_flag", "grp_status"), m)
      .orderBy("grp_flag", "grp_status")
  }

  def q21Oracle(p: Int = 8): String = {
    val m = 1 << p
    s"""WITH k AS (SELECT l_returnflag, l_linestatus,
       |                  CAST('0x' || substr(md5('hll:' || CAST(l_orderkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
       |           FROM lineitem),
       |r AS (SELECT l_returnflag, l_linestatus, h % $m AS bucket,
       |             CASE WHEN h // $m = 0 THEN 53
       |                  ELSE 53 - length(bin(h // $m)) END AS rho
       |      FROM k),
       |fine AS (SELECT l_returnflag, l_linestatus, bucket, max(rho) AS reg
       |         FROM r GROUP BY 1, 2, 3),
       |exp AS (SELECT l_returnflag AS gf, l_linestatus AS gs, bucket, reg FROM fine
       |        UNION ALL SELECT l_returnflag, 'ALL', bucket, reg FROM fine
       |        UNION ALL SELECT 'ALL', l_linestatus, bucket, reg FROM fine
       |        UNION ALL SELECT 'ALL', 'ALL', bucket, reg FROM fine),
       |regs AS (SELECT gf, gs, bucket, max(reg) AS reg FROM exp GROUP BY 1, 2, 3),
       |a AS (SELECT gf, gs,
       |             sum(reg * (bucket + 1))::BIGINT AS register_checksum,
       |             ($m - count(*))::BIGINT AS n_zero_buckets,
       |             (sum(1::BIGINT << (53 - reg)) + ($m - count(*)) * 9007199254740992)::BIGINT AS intsum
       |      FROM regs GROUP BY 1, 2),
       |f AS (SELECT gf, gs, register_checksum, n_zero_buckets,
       |             0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / $m.0::DOUBLE) *
       |               ${m.toDouble * m}::DOUBLE * 9007199254740992.0::DOUBLE / intsum::DOUBLE AS est_raw
       |      FROM a)
       |SELECT gf AS grp_flag, gs AS grp_status,
       |       round(CASE WHEN n_zero_buckets > 0 AND est_raw <= ${2.5 * m}::DOUBLE
       |                  THEN $m.0::DOUBLE * ln($m.0::DOUBLE / n_zero_buckets::DOUBLE)
       |                  ELSE est_raw END, 4) AS est_distinct,
       |       n_zero_buckets, register_checksum
       |FROM f ORDER BY grp_flag, grp_status""".stripMargin
  }

  def q11Oracle(p: Int = 8): String = {
    val m = 1 << p
    s"""WITH k AS (SELECT l_returnflag,
       |                  CAST('0x' || substr(md5('hll:' || CAST(l_orderkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
       |           FROM lineitem),
       |r AS (SELECT l_returnflag, h % $m AS bucket,
       |             CASE WHEN h // $m = 0 THEN 53
       |                  ELSE 53 - length(bin(h // $m)) END AS rho
       |      FROM k),
       |regs AS (SELECT l_returnflag, bucket, max(rho) AS reg FROM r GROUP BY 1, 2),
       |a AS (SELECT l_returnflag,
       |             sum(reg * (bucket + 1))::BIGINT AS register_checksum,
       |             ($m - count(*))::BIGINT AS n_zero_buckets,
       |             (sum(1::BIGINT << (53 - reg)) + ($m - count(*)) * 9007199254740992)::BIGINT AS intsum
       |      FROM regs GROUP BY 1),
       |f AS (SELECT l_returnflag, register_checksum, n_zero_buckets,
       |             0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / $m.0::DOUBLE) *
       |               ${m.toDouble * m}::DOUBLE * 9007199254740992.0::DOUBLE / intsum::DOUBLE AS est_raw
       |      FROM a)
       |SELECT l_returnflag,
       |       round(CASE WHEN n_zero_buckets > 0 AND est_raw <= ${2.5 * m}::DOUBLE
       |                  THEN $m.0::DOUBLE * ln($m.0::DOUBLE / n_zero_buckets::DOUBLE)
       |                  ELSE est_raw END, 4) AS est_distinct,
       |       n_zero_buckets, register_checksum
       |FROM f ORDER BY l_returnflag""".stripMargin
  }

  /** q22: INCREMENTAL HLL — the sketch as a MAINTAINED MATERIALIZED VIEW
    * (q16's exact-count MV, upgraded to distinct counts): the per-type
    * user-distinct register table is persisted for the history up to a
    * cutoff, and each refresh max-merges ONLY the delta's registers —
    * nothing rescans history, the state is F×m longs forever, and because
    * register-max is idempotent and commutative a replayed or reordered
    * delta cannot corrupt the view (the s16/q16 exactly-once argument,
    * free at the sketch level). Oracle = the one-shot full-pass sketch:
    * merged-incremental ≡ full is the entire claim. */
  def q22HllIncremental(spark: SparkSession, dir: String,
                        cutoffMs: Long = 1705363200000L, p: Int = 8): DataFrame = {
    graft.Graft.init(spark)
    val m = 1 << p
    def regs(e: DataFrame): DataFrame =
      hllRegisters(e, Seq("event_type"), "hllu:", "user_id", m)
    val path = spark.conf.get("spark.sql.warehouse.dir") + "/graft_mv_hll_users"
    regs(Tables.eventsUpToMs(spark, dir, cutoffMs)).write.mode("overwrite").parquet(path)
    val merged = spark.read.parquet(path)
      .unionByName(regs(Tables.eventsAfterMs(spark, dir, cutoffMs)))
      .groupBy(col("event_type"), col("bucket")).agg(max(col("reg")).as("reg"))
    hllEstimate(merged, Seq("event_type"), m).orderBy("event_type")
  }

  def q22Oracle(p: Int = 8): String = {
    val m = 1 << p
    s"""WITH k AS (SELECT event_type,
       |                  CAST('0x' || substr(md5('hllu:' || CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
       |           FROM events),
       |r AS (SELECT event_type, h % $m AS bucket,
       |             CASE WHEN h // $m = 0 THEN 53
       |                  ELSE 53 - length(bin(h // $m)) END AS rho
       |      FROM k),
       |regs AS (SELECT event_type, bucket, max(rho) AS reg FROM r GROUP BY 1, 2),
       |a AS (SELECT event_type,
       |             sum(reg * (bucket + 1))::BIGINT AS register_checksum,
       |             ($m - count(*))::BIGINT AS n_zero_buckets,
       |             (sum(1::BIGINT << (53 - reg)) + ($m - count(*)) * 9007199254740992)::BIGINT AS intsum
       |      FROM regs GROUP BY 1),
       |f AS (SELECT event_type, register_checksum, n_zero_buckets,
       |             0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / $m.0::DOUBLE) *
       |               ${m.toDouble * m}::DOUBLE * 9007199254740992.0::DOUBLE / intsum::DOUBLE AS est_raw
       |      FROM a)
       |SELECT event_type,
       |       round(CASE WHEN n_zero_buckets > 0 AND est_raw <= ${2.5 * m}::DOUBLE
       |                  THEN $m.0::DOUBLE * ln($m.0::DOUBLE / n_zero_buckets::DOUBLE)
       |                  ELSE est_raw END, 4) AS est_distinct,
       |       n_zero_buckets, register_checksum
       |FROM f ORDER BY event_type""".stripMargin
  }

  /** q13: histogram quantiles — the MERGEABLE approximate-quantile sketch
    * that completes the sketch family (KMV/HLL = distinct, CMS =
    * frequency, this = quantiles): fixed equi-width bins over the global
    * [min, max], per-group bin counts, quantile read off the cumulative
    * histogram with within-bin linear interpolation. Bin counts ADD, so
    * partial aggregation and cross-partition merge are exact — the state
    * each task ships is ≤ `bins` longs regardless of data size, which is
    * why production engines serve p99 dashboards from histograms while
    * exact selection (q9) costs a distributed sort. Two passes (bounds,
    * then counts); at 100 TB the bounds come from table stats.
    *
    * Determinism: binning is `floor((v−lo)/width)` on driver-collected
    * lo/width doubles — both engines evaluate the identical IEEE
    * expression, and everything after is exact integers until one
    * interpolation division, so the sketch hash-gates (contrast GK/
    * t-digest, whose state depends on arrival order). */
  def q13HistQuantiles(spark: SparkSession, dir: String, bins: Int = 1024,
                       qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_extendedprice").as("v"))
    val r = li.agg(min(col("v")), max(col("v"))).head()
    val lo = r.getDouble(0)
    val width = (r.getDouble(1) - lo) / bins
    val binned = li
      .select(col("l_returnflag"),
        least(lit(bins - 1L), floor((col("v") - lo) / width)).cast("long").as("bin"))
      .groupBy(col("l_returnflag"), col("bin")).agg(count(lit(1)).as("cnt"))
    // cumulative over ≤`bins` rows per group — a bounded window by design
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = binned
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("cb", col("cum") - col("cnt"))
    val ranks = binned.groupBy(col("l_returnflag")).agg(sum(col("cnt")).as("n"))
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .withColumn("rank", ceil(col("q") * col("n")).cast("long"))
    ranks.join(cum, Seq("l_returnflag"))
      .filter(col("cum") >= col("rank") && col("cb") < col("rank"))
      .select(col("l_returnflag"), col("q"), col("n"), col("rank"),
        round(lit(lo) + lit(width) * col("bin") +
          lit(width) * ((col("rank") - col("cb")).cast("double") / col("cnt").cast("double")),
          4).as("est"))
      .orderBy(col("l_returnflag"), col("q"))
  }

  def q13Oracle(bins: Int = 1024, qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): String = {
    val qList = qs.mkString(", ")
    s"""WITH b AS (SELECT min(l_extendedprice) AS lo,
       |                  (max(l_extendedprice) - min(l_extendedprice)) / $bins.0 AS width
       |           FROM lineitem),
       |binned AS (SELECT l_returnflag,
       |                  least(${bins - 1}, floor((l_extendedprice - b.lo) / b.width))::BIGINT AS bin
       |           FROM lineitem CROSS JOIN b),
       |g AS (SELECT l_returnflag, bin, count(*) AS cnt FROM binned GROUP BY 1, 2),
       |c AS (SELECT l_returnflag, bin, cnt,
       |             sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin) AS cum
       |      FROM g),
       |c2 AS (SELECT *, cum - cnt AS cb FROM c),
       |n AS (SELECT l_returnflag, sum(cnt) AS n FROM g GROUP BY 1),
       |r AS (SELECT n.l_returnflag, t.q, n.n, ceil(t.q * n.n)::BIGINT AS rank
       |      FROM n CROSS JOIN (SELECT unnest([$qList]::DOUBLE[]) AS q) t)
       |SELECT r.l_returnflag, r.q, r.n::BIGINT AS n, r.rank,
       |       round(b.lo + b.width * c2.bin +
       |             b.width * ((r.rank - c2.cb)::DOUBLE / c2.cnt::DOUBLE), 4) AS est
       |FROM r JOIN c2 ON r.l_returnflag = c2.l_returnflag
       |              AND c2.cum >= r.rank AND c2.cb < r.rank
       |CROSS JOIN b
       |ORDER BY r.l_returnflag, r.q""".stripMargin
  }

  /** q12: CUBE / grouping sets — the multi-granularity aggregate every BI
    * layer sits on (q8's rollup is the hierarchy special case; CUBE emits
    * all 2^k granularities with a GROUPING bitmask identifying each).
    * Spark expands the cube BEFORE the aggregate, so the plan is still
    * one partial-agg groupBy — the expansion rides the map side and the
    * shuffle carries one pre-combined row per (granularity, group) per
    * task, never the fact table ×4.
    *
    * Money sums use the v20 fixed-point recipe — per-row cents
    * quantization (`floor(x·100+½)::BIGINT`) then an exact integer sum —
    * because the cube's grand-total row sums the WHOLE fact table and a
    * 2-dp-rounded double sum is not aggregation-order-stable at that
    * width (the q1 trick stops scaling exactly where CUBE starts). */
  def q12Cube(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        floor(col("l_quantity") * 100 + 0.5).cast("long").as("qty_c"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
          .cast("long").as("disc_c"))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_rows"),
        sum(col("qty_c")).as("qty_cents"),
        sum(col("disc_c")).as("disc_price_cents"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
  }

  val q12Oracle: String =
    """WITH f AS (SELECT l_returnflag, l_linestatus,
      |                  CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_c,
      |                  CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS disc_c
      |           FROM lineitem)
      |SELECT l_returnflag, l_linestatus,
      |       GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid,
      |       count(*)::BIGINT AS n_rows,
      |       sum(qty_c)::BIGINT AS qty_cents,
      |       sum(disc_c)::BIGINT AS disc_price_cents
      |FROM f
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin

  /** q15: Bloom SEMI-JOIN REDUCTION — the shuffle-side economics of a
    * selective fact×dim join made explicit: the selected order keys fold
    * into an 8 KiB Bloom bitset (distributed `bit_or`, the d10 packing),
    * which broadcasts as a CONSTANT and pre-filters lineitem with k
    * map-only bit tests BEFORE the join shuffle — the shuffle then
    * carries only probable matches instead of the whole fact table
    * (Spark's own runtime bloom-filter injection does this opportunistically;
    * here it is structural, so the plan keeps the guarantee at any scale
    * or config). False positives are removed by the exact equi-join that
    * follows, so the Bloom stage is semantically INVISIBLE: the oracle is
    * the plain join SQL, and the gate proves transparency. The spec
    * measures the reduction: post-filter fact rows ≪ fact table, and
    * every surviving row's key is genuinely probable. */
  def q15BloomJoin(spark: SparkSession, dir: String, cutoff: Double = 450000.0,
                   mBits: Int = 1 << 16, kH: Int = 3): DataFrame = {
    require(mBits % 64 == 0, s"mBits must pack into longs, got $mBits")
    graft.Graft.init(spark)
    // xxhash64 on the raw long key, not h60: the Bloom stage never reaches
    // the oracle (the exact join erases it), so the hash needs no DuckDB
    // parity — take the fast codegen'd one (3 md5-of-string hashes per
    // fact row measured 3.2 s at sf0.1; xxhash64 is the whole point of a
    // pre-shuffle screen being cheap)
    def posCols(c: Column): Seq[Column] = (0 until kH).map { j =>
      pmod(xxhash64(lit(j), c), lit(mBits.toLong))
    }
    val sel = Tables.orders(spark, dir).filter(col("o_totalprice") > cutoff)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val words = new Array[Long](mBits / 64)
    sel.select(explode(array(posCols(col("o_orderkey")): _*)).as("pos"))
      .groupBy(expr("cast(pos div 64 as int)").as("widx"))
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), cast(pos % 64 as int)))").as("word"))
      .collect().foreach(r => words(r.getInt(0)) = r.getLong(1))
    val wordsLit = typedLit(words.toSeq)
    val hit = (0 until kH).map { j =>
      s"(shiftrightunsigned(element_at(bw, cast(p$j div 64 as int) + 1), " +
        s"cast(p$j % 64 as int)) & 1)"
    }.mkString(" * ")
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      .withColumns(((0 until kH).map(j =>
        s"p$j" -> posCols(col("l_orderkey"))(j)) :+ ("bw" -> wordsLit)).toMap)
      .filter(expr(hit) === 1)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    li.join(sel, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy("o_orderpriority")
  }

  def q15Oracle(cutoff: Double = 450000.0): String =
    s"""SELECT o_orderpriority, count(*) AS n_items,
       |       round(sum(l_quantity), 2) AS sum_qty,
       |       round(sum(l_extendedprice), 2) AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_totalprice > $cutoff
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q16: INCREMENTAL aggregate maintenance (materialized-view delta
    * update) — the per-(hour, type) rollup maintained the way a nightly
    * pipeline actually maintains it: the base aggregate is a PERSISTED
    * artifact computed from the log up to the snapshot cutoff, the delta
    * scan reads only events AFTER it (the `>` filter pushed in the
    * column's native type, [[Tables.eventsAfterMs]] — at 100 TB the
    * nightly job reads the new row groups, never the history), and the
    * refresh is a union + re-aggregate of PARTIAL STATES. That merge is
    * exact because every aggregate here is a mergeable monoid in exact
    * integers: counts add, and values sum as fixed-point CENTS (the q12
    * device) so base+delta is bit-identical to the full recompute the
    * oracle runs — the gate IS the IVM correctness proof. countDistinct
    * is deliberately absent: it does not merge; its incremental form is
    * the KMV/HLL sketch state (q14, s10). */
  def q16IncrementalAgg(spark: SparkSession, dir: String,
                        cutoffMs: Long = 1705363200000L): DataFrame = {
    graft.Graft.init(spark)
    def rollup(e: DataFrame): DataFrame = e
      .withColumn("hour_bucket", expr("(ts div 1000000) div 3600000"))
      .withColumn("vc", expr("cast(floor(value * 100 + 0.5) as bigint)"))
      .groupBy(col("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("vc")).as("sum_cents"))
    val path = spark.conf.get("spark.sql.warehouse.dir") + "/graft_mv_hourly_base"
    rollup(Tables.eventsUpToMs(spark, dir, cutoffMs))
      .write.mode("overwrite").parquet(path)
    val base = spark.read.parquet(path)
    base.unionByName(rollup(Tables.eventsAfterMs(spark, dir, cutoffMs)))
      .groupBy(col("hour_bucket"), col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("sum_cents")).as("sum_cents"))
      .orderBy("hour_bucket", "event_type")
  }

  val q16Oracle: String =
    """SELECT floor(epoch_ms(ts) / 3600000)::BIGINT AS hour_bucket, event_type,
      |       count(*) AS n,
      |       sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS sum_cents
      |FROM events GROUP BY 1, 2 ORDER BY hour_bucket, event_type""".stripMargin

  /** q18: per-column DATA PROFILE of the event log — the datasheet
    * primitive a pipeline publishes with every snapshot (null rates,
    * cardinalities, numeric ranges): one row per column, each computed
    * as exact aggregates in one unioned plan. Numeric ranges are emitted
    * only for numeric columns (string min/max would gate on collation);
    * the props column's JSON key presence profiles as its null rate
    * after extraction — the semi-structured column is profiled by what
    * it PARSES to, not its raw bytes. */
  def q18Profile(spark: SparkSession, dir: String): DataFrame = {
    graft.Graft.init(spark)
    val e = Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
    def num(name: String, c: Column): DataFrame =
      e.agg(
        count(lit(1)).as("n_rows"),
        sum(when(c.isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(c).as("n_distinct"),
        min(c).cast("double").as("min_num"),
        max(c).cast("double").as("max_num"))
        .select(lit(name).as("column"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_num"), col("max_num"))
    def str(name: String, c: Column): DataFrame =
      e.agg(
        count(lit(1)).as("n_rows"),
        sum(when(c.isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(c).as("n_distinct"))
        .select(lit(name).as("column"), col("n_rows"), col("n_null"),
          col("n_distinct"), lit(null).cast("double").as("min_num"),
          lit(null).cast("double").as("max_num"))
    Seq(
      num("event_id", col("event_id")),
      str("event_type", col("event_type")),
      num("props_k", col("k")),
      num("user_id", col("user_id")),
      num("value", col("value")))
      .reduce(_ unionByName _).orderBy("column")
  }

  val q18Oracle: String =
    """WITH e AS (SELECT event_id, user_id, event_type, value,
      |                  json_extract_string(props, '$.k')::BIGINT AS k
      |           FROM events)
      |SELECT 'event_id' AS "column", count(*) AS n_rows,
      |       sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
      |       count(DISTINCT event_id) AS n_distinct,
      |       min(event_id)::DOUBLE AS min_num, max(event_id)::DOUBLE AS max_num FROM e
      |UNION ALL
      |SELECT 'event_type', count(*),
      |       sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)::BIGINT,
      |       count(DISTINCT event_type), NULL::DOUBLE, NULL::DOUBLE FROM e
      |UNION ALL
      |SELECT 'props_k', count(*),
      |       sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END)::BIGINT,
      |       count(DISTINCT k), min(k)::DOUBLE, max(k)::DOUBLE FROM e
      |UNION ALL
      |SELECT 'user_id', count(*),
      |       sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT,
      |       count(DISTINCT user_id), min(user_id)::DOUBLE, max(user_id)::DOUBLE FROM e
      |UNION ALL
      |SELECT 'value', count(*),
      |       sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT,
      |       count(DISTINCT value), min(value)::DOUBLE, max(value)::DOUBLE FROM e
      |ORDER BY "column"""".stripMargin

  private val fkEdges = Seq(
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("embeddings->documents", "embeddings", "vec_id", "documents", "doc_id"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"))

  /** q17: FOREIGN-KEY integrity audit — the data-quality gate a pipeline
    * runs before anything downstream trusts a snapshot: for every
    * declared FK edge, child rows, ORPHANS (children whose parent is
    * missing — anti-join child→parent) and UNREFERENCED parents (parents
    * no child points at — anti-join parent→child, the reverse direction).
    * Six edges × two anti-joins, each a bounded aggregate, unioned with
    * no driver loops. This generator's edges are referentially closed
    * (orphans all 0 — asserted, not assumed), so the reverse metric is
    * what keeps the audit non-vacuous: childless customers, unordered
    * parts-of-nations etc. are real and nonzero (spec cross-checks q5's
    * no-orders bucket against the orders->customer row). */
  def q17FkAudit(spark: SparkSession, dir: String): DataFrame = {
    graft.Graft.init(spark)
    def table(name: String): DataFrame = name match {
      case "customer" => Tables.customer(spark, dir)
      case "nation" => Tables.nation(spark, dir)
      case "region" => Tables.region(spark, dir)
      case "orders" => Tables.orders(spark, dir)
      case "lineitem" => Tables.lineitem(spark, dir)
      case "supplier" => Tables.supplier(spark, dir)
      case "documents" => Tables.documents(spark, dir)
      case "embeddings" => Tables.embeddings(spark, dir)
    }
    fkEdges.map { case (name, child, ck, parent, pk) =>
      val c = table(child); val p = table(parent)
      val orphans = c.select(col(ck)).join(p.select(col(pk)),
        col(ck) === col(pk), "left_anti")
      val unreferenced = p.select(col(pk)).join(c.select(col(ck)),
        col(pk) === col(ck), "left_anti")
      c.agg(count(lit(1)).as("n_child"))
        .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
        .crossJoin(unreferenced.agg(count(lit(1)).as("n_unreferenced")))
        .select(lit(name).as("edge"), col("n_child"), col("n_orphans"), col("n_unreferenced"))
    }.reduce(_ unionByName _).orderBy("edge")
  }

  val q17Oracle: String =
    fkEdges.map { case (name, child, ck, parent, pk) =>
      s"""SELECT '$name' AS edge, (SELECT count(*) FROM $child)::BIGINT AS n_child,
         |       (SELECT count(*) FROM $child c
         |        WHERE NOT EXISTS (SELECT 1 FROM $parent WHERE $pk = c.$ck))::BIGINT AS n_orphans,
         |       (SELECT count(*) FROM $parent p
         |        WHERE NOT EXISTS (SELECT 1 FROM $child WHERE $ck = p.$pk))::BIGINT AS n_unreferenced""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY edge")

  /** The hot-folded grouping column: four of the five event types collapse
    * into one `hot` group (~80% of the log), the deterministic stand-in
    * for the hot key every real workload has (one tenant, one `lang`, one
    * referrer dominating). Derivation is pure CASE so the oracle replays
    * it verbatim. */
  private def hotGrp: Column =
    when(col("event_type") === "purchase", col("event_type")).otherwise(lit("hot"))

  /** q19: MULTI-DISTINCT aggregation over a HOT group WITHOUT Expand —
    * distinct users AND distinct active days (plus plain count/sum) per
    * group, where one group carries ~80% of the log.
    *
    * Spark plans two+ distinct aggregates in one Aggregate via Expand:
    * every input row is replicated once per distinct spec (3× here — gid
    * for users, days, and the plain aggs) BEFORE the first exchange, so
    * the shuffle carries 3× the corpus and the hot group's replicas all
    * hash to the same reducers. This rewrite computes each distinct
    * dimension as its OWN two-stage compound-key aggregation — stage 1
    * keys on (grp, user) / (grp, day), so map-side combine collapses the
    * corpus to the pair cardinality and the hot group SPREADS across the
    * cluster by the high-cardinality second key; stage 2 is a partial agg
    * over pair rows only — then joins the ≤G-row branch results. At
    * 100 TB: no row is ever replicated, no corpus-sized shuffle is keyed
    * by the hot column alone, and the join is between G-row aggregates.
    * The plain metrics ride the user branch (stage-1 partial sums), so
    * the corpus is scanned once per distinct DIMENSION (2×), not
    * replicated 3× into one skewed shuffle. The spec proves the plan
    * shape (zero Expand here, Expand present in the naive twin) and
    * result equality with the naive plan; exact fixed-point cents make
    * the sum hash-stable (the q12/q16 device). */
  def q19HotDistinct(spark: SparkSession, dir: String): DataFrame = {
    graft.Graft.init(spark)
    val e = Tables.events(spark, dir)
      .withColumn("grp", hotGrp)
      .withColumn("vc", expr("cast(floor(value * 100 + 0.5) as bigint)"))
      .withColumn("day", expr("(ts div 1000000) div 86400000"))
    val userBranch = e.groupBy(col("grp"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("vc")).as("c"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_users"), sum(col("n")).as("n_events"),
        sum(col("c")).as("sum_cents"))
    val dayBranch = e.groupBy(col("grp"), col("day"))
      .agg(count(lit(1)).as("nd"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_days"))
    userBranch.join(broadcast(dayBranch), Seq("grp"))
      .select(col("grp"), col("n_users"), col("n_days"),
        col("n_events"), col("sum_cents"))
      .orderBy("grp")
  }

  /** The naive one-Aggregate twin (two countDistinct + plain aggs in a
    * single agg — Spark plans it through Expand). Exists for the spec:
    * results must be identical, plans must not be. */
  private[graft] def q19Naive(spark: SparkSession, dir: String): DataFrame = {
    graft.Graft.init(spark)
    Tables.events(spark, dir)
      .withColumn("grp", hotGrp)
      .withColumn("vc", expr("cast(floor(value * 100 + 0.5) as bigint)"))
      .withColumn("day", expr("(ts div 1000000) div 86400000"))
      .groupBy(col("grp"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("day")).as("n_days"),
        count(lit(1)).as("n_events"), sum(col("vc")).as("sum_cents"))
      .orderBy("grp")
  }

  /** q20: CHAINED CORRELATED EXISTS / NOT EXISTS — the TPC-H Q21 shape
    * ("suppliers who kept orders waiting") re-keyed to this schema: for
    * finished orders, suppliers with a RETURNED line on a multi-supplier
    * order where NO OTHER supplier on that order had a return — i.e. the
    * sole offender. Declared as SQL with both correlated subqueries so
    * Catalyst decorrelates: EXISTS → left-semi, NOT EXISTS → left-anti,
    * each an equi-join on `l_orderkey` with the extra predicates riding
    * along — three co-partitioned joins of the fact table against itself
    * instead of O(rows) correlated rescans (q10's argument, doubled).
    * Spec asserts zero surviving Subquery nodes in the executed plan and
    * cross-checks a driver recompute. Exact integer counts → hash-stable. */
  /** q27: CORRELATED SCALAR-AGGREGATE SUBQUERY — "orders above their own
    * nation's average", the whale-share report written the way analysts
    * write it: a per-row comparison against a correlated aggregate. The
    * decorrelation at stake is DIFFERENT from q20's EXISTS chain
    * (semi/anti joins): a scalar-agg subquery must become an AGGREGATE +
    * equi-JOIN (Catalyst's RewriteCorrelatedScalarSubquery) — the naive
    * plan re-runs the average per ROW, O(n²) at any scale; the rewrite
    * computes 25 nation averages once and joins. Spec asserts ZERO
    * surviving Subquery nodes in the executed plan (the q19/q20
    * convention) plus a window-based recompute. Exact-integer share_q4;
    * the avg comparison is a count (a float boundary would need a price
    * within one ulp of its nation mean). Output bounded by |nations|. */
  def q27ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    graft.Graft.init(spark)
    Tables.orders(spark, dir).createOrReplaceTempView("g_orders")
    Tables.customer(spark, dir).createOrReplaceTempView("g_customer")
    Tables.nation(spark, dir).createOrReplaceTempView("g_nation")
    spark.sql(
      """WITH above AS (
        |  SELECT c.c_nationkey
        |  FROM g_orders o JOIN g_customer c ON o.o_custkey = c.c_custkey
        |  WHERE o.o_totalprice > (SELECT avg(o2.o_totalprice)
        |                          FROM g_orders o2
        |                          JOIN g_customer c2 ON o2.o_custkey = c2.c_custkey
        |                          WHERE c2.c_nationkey = c.c_nationkey)),
        |per_nation AS (
        |  SELECT c.c_nationkey, count(*) AS n_orders
        |  FROM g_orders o JOIN g_customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY c.c_nationkey),
        |ab AS (SELECT c_nationkey, count(*) AS n_above FROM above GROUP BY 1)
        |SELECT n.n_name, ab.n_above, p.n_orders,
        |       ab.n_above * 10000 DIV p.n_orders AS share_q4
        |FROM ab JOIN per_nation p USING (c_nationkey)
        |        JOIN g_nation n ON n.n_nationkey = ab.c_nationkey
        |ORDER BY n_name""".stripMargin)
  }

  val q27Oracle: String =
    """WITH above AS (
      |  SELECT c.c_nationkey
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE o.o_totalprice > (SELECT avg(o2.o_totalprice)
      |                          FROM orders o2
      |                          JOIN customer c2 ON o2.o_custkey = c2.c_custkey
      |                          WHERE c2.c_nationkey = c.c_nationkey)),
      |per_nation AS (
      |  SELECT c.c_nationkey, count(*)::BIGINT AS n_orders
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY c.c_nationkey),
      |ab AS (SELECT c_nationkey, count(*)::BIGINT AS n_above FROM above GROUP BY 1)
      |SELECT n.n_name, ab.n_above, p.n_orders,
      |       (ab.n_above * 10000) // p.n_orders AS share_q4
      |FROM ab JOIN per_nation p USING (c_nationkey)
      |        JOIN nation n ON n.n_nationkey = ab.c_nationkey
      |ORDER BY n_name""".stripMargin

  /** q28: SALTED LOW-CARDINALITY JOIN — the skew/parallelism fix for a
    * shuffle join whose key has FEW values: joining a 100 TB fact on a
    * 5-value key hashes the entire corpus into 5 reducer partitions (27
    * of 32 tasks idle, 5 stragglers own the job; same pathology as one
    * hot key). The fix is mechanical and semantic-free: the fact side
    * salts with `h60(row_id) mod S`, the dim side EXPLODES ×S, the join
    * key becomes (key, salt) — S× the dim rows (dims are tiny by
    * definition here; S·|dim| ≪ corpus) buys S× the reduce parallelism,
    * and the result is provably identical because every (key, salt) fact
    * row meets exactly one dim copy. Broadcast is DISABLED via hint —
    * at test scale AQE would broadcast the dim and hide the very shuffle
    * this operator exists to shape; production runs this when the dim is
    * too big to broadcast (else broadcast and salting is moot). Exact
    * integer money math; oracle is the PLAIN join — the salt must be
    * invisible. Spec: non-broadcast join with salt in the keys, ≡ the
    * unsalted frame. */
  def q28SaltedJoin(spark: SparkSession, dir: String, nSalts: Int = 8): DataFrame = {
    graft.Graft.init(spark)
    val types = Seq("click", "error", "purchase", "signup", "view")
    val fact = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("vc"),
        (Dedup.h60(concat(lit("salt:"), col("event_id").cast("string")))
          % nSalts.toLong).as("salt"))
    // fixed-taxonomy dim (the q23 convention — no discovery pass); rate is
    // a deterministic function of the name so the oracle re-derives it
    import spark.implicits._
    val dim = types.toDF("event_type")
      .withColumn("rate", (length(col("event_type")) * 7L).cast("long"))
      .withColumn("salt", explode(sequence(lit(0L), lit(nSalts.toLong - 1L))))
    fact.join(dim.hint("shuffle_hash"), Seq("event_type", "salt"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("vc") * col("rate")).as("weighted_cents"))
      .orderBy("event_type")
  }

  def q28Oracle(): String =
    """WITH dim AS (SELECT t AS event_type, length(t) * 7 AS rate
      |             FROM unnest(['click', 'error', 'purchase', 'signup', 'view']) AS u(t)),
      |f AS (SELECT event_type, floor(value * 100 + 0.5)::BIGINT AS vc FROM events)
      |SELECT f.event_type, count(*)::BIGINT AS n,
      |       sum(f.vc * dim.rate)::BIGINT AS weighted_cents
      |FROM f JOIN dim USING (event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  def q20ExistsChain(spark: SparkSession, dir: String, limit: Int = 50): DataFrame = {
    graft.Graft.init(spark)
    Tables.lineitem(spark, dir).createOrReplaceTempView("g_lineitem")
    Tables.orders(spark, dir).createOrReplaceTempView("g_orders")
    spark.sql(
      s"""SELECT l1.l_suppkey AS suppkey, count(*) AS n_lines
         |FROM g_lineitem l1 JOIN g_orders o ON o.o_orderkey = l1.l_orderkey
         |WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
         |  AND EXISTS (SELECT 1 FROM g_lineitem l2
         |              WHERE l2.l_orderkey = l1.l_orderkey
         |                AND l2.l_suppkey <> l1.l_suppkey)
         |  AND NOT EXISTS (SELECT 1 FROM g_lineitem l3
         |                  WHERE l3.l_orderkey = l1.l_orderkey
         |                    AND l3.l_suppkey <> l1.l_suppkey
         |                    AND l3.l_returnflag = 'R')
         |GROUP BY l1.l_suppkey
         |ORDER BY n_lines DESC, suppkey
         |LIMIT $limit""".stripMargin)
  }

  def q20Oracle(limit: Int = 50): String =
    s"""SELECT l1.l_suppkey AS suppkey, count(*) AS n_lines
       |FROM lineitem l1 JOIN orders o ON o.o_orderkey = l1.l_orderkey
       |WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
       |  AND EXISTS (SELECT 1 FROM lineitem l2
       |              WHERE l2.l_orderkey = l1.l_orderkey
       |                AND l2.l_suppkey <> l1.l_suppkey)
       |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
       |                  WHERE l3.l_orderkey = l1.l_orderkey
       |                    AND l3.l_suppkey <> l1.l_suppkey
       |                    AND l3.l_returnflag = 'R')
       |GROUP BY l1.l_suppkey
       |ORDER BY n_lines DESC, suppkey
       |LIMIT $limit""".stripMargin

  /** q23: PIVOT — the day × event-type activity matrix as a WIDE table
    * (the report/BI shape; q12's cube is the long twin). The pivot
    * values are the EXPLICIT fixed event taxonomy: an implicit
    * `pivot("event_type")` first runs a distinct-collect JOB to discover
    * the columns — a corpus scan spent on schema inference, and
    * non-deterministic output schema if a new type appears — while the
    * explicit list keeps the whole thing one pass (Catalyst compiles it
    * to the same conditional-aggregate form the oracle spells out, so
    * this also documents that `pivot` costs nothing over CASE WHEN).
    * Missing cells are true zeros (a day with no errors had zero
    * errors), made explicit with na.fill. */
  def q23PivotDaily(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(spark, dir)
      .withColumn("day", expr("(ts div 1000000) div 86400000"))
      .groupBy(col("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .select(col("day") +: types.map(t => col(t).as(s"n_$t")): _*)
      .orderBy("day")
  }

  val q23Oracle: String =
    """SELECT floor(epoch_ms(ts) / 86400000)::BIGINT AS day,
      |       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_click,
      |       sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_error,
      |       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchase,
      |       sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS n_signup,
      |       sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS n_view
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  /** q24: SET OPERATORS — INTERSECT / EXCEPT with their ANSI DISTINCT
    * semantics, the segmentation query shape at (user, day) grain:
    * "days a user both purchased AND clicked, with no error that day" —
    * at user grain every segment saturates on this corpus (every user
    * has every type; the spec guards against that vacuity). Catalyst
    * rewrites INTERSECT → left-semi and EXCEPT → left-anti over
    * aggregated distinct sides — three equi-joins co-partitioned on the
    * (user_id, day) pair, no state beyond the per-type pair sets.
    * INTERSECT binds tighter than EXCEPT in both engines (SQL standard),
    * matching the method-chain order exactly. */
  def q24SetOps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("(ts div 1000000) div 86400000").as("day"),
        col("event_type"))
    def days(t: String) = ev.filter(col("event_type") === t)
      .select(col("user_id"), col("day"))
    days("purchase").intersect(days("click")).except(days("error"))
      .orderBy("user_id", "day")
  }

  val q24Oracle: String =
    """WITH e AS (SELECT user_id, floor(epoch_ms(ts) / 86400000)::BIGINT AS day,
      |                  event_type FROM events)
      |SELECT user_id, day FROM e WHERE event_type = 'purchase'
      |INTERSECT
      |SELECT user_id, day FROM e WHERE event_type = 'click'
      |EXCEPT
      |SELECT user_id, day FROM e WHERE event_type = 'error'
      |ORDER BY user_id, day""".stripMargin

  /** q25: GROUPING SETS — the multi-grain report (per nation×year, per
    * nation, per year, grand total) in ONE pass, the form a reporting
    * layer actually requests (q12's CUBE is the power-set special case;
    * explicit sets are what you write when the power set is 2ⁿ grains of
    * mostly-unwanted output). Catalyst compiles the four sets into one
    * Expand(×4)+aggregate — one corpus scan instead of four queries, and
    * the expansion factor is |sets|, chosen, not 2ⁿ. Dims broadcast.
    * Rollup-ness is re-derived from slot nullness (the base has no NULL
    * grouping values, so nullness ≡ rolled-up) and emitted as an
    * engine-independent bitmask `gid`; rolled slots coalesce to sentinel
    * values so the output carries no NULLs and the sort is total. */
  def q25GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    // year(TIMESTAMP_NTZ) is wall-clock (zone-free); init is for the
    // session conventions, not correctness
    graft.Graft.init(spark)
    val base = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"),
        col("o_totalprice"))
    base.groupingSets(
        Seq(Seq(col("n_name"), col("o_year")), Seq(col("n_name")), Seq(col("o_year")), Seq.empty),
        col("n_name"), col("o_year"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"), count(lit(1)).as("n_orders"))
      .select(
        (when(col("n_name").isNull, 2L).otherwise(0L) +
          when(col("o_year").isNull, 1L).otherwise(0L)).as("gid"),
        coalesce(col("n_name"), lit("ALL")).as("n_name"),
        coalesce(col("o_year"), lit(-1L)).as("o_year"),
        col("revenue"), col("n_orders"))
      .orderBy("gid", "n_name", "o_year")
  }

  val q25Oracle: String =
    """WITH base AS (
      |  SELECT n_name, year(o_orderdate)::BIGINT AS o_year, o_totalprice
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |              JOIN nation ON c_nationkey = n_nationkey),
      |g AS (SELECT n_name, o_year,
      |             round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
      |      FROM base
      |      GROUP BY GROUPING SETS ((n_name, o_year), (n_name), (o_year), ()))
      |SELECT (CASE WHEN n_name IS NULL THEN 2 ELSE 0 END
      |        + CASE WHEN o_year IS NULL THEN 1 ELSE 0 END)::BIGINT AS gid,
      |       coalesce(n_name, 'ALL') AS n_name,
      |       coalesce(o_year, -1)::BIGINT AS o_year,
      |       revenue, n_orders
      |FROM g ORDER BY gid, n_name, o_year""".stripMargin

  /** q26: RANGE-frame window — the trailing CALENDAR-interval aggregate
    * (peak 7-day customer spend, the whale/fraud-detection staple) that a
    * ROWS frame cannot express: order days are sparse per customer, so
    * "last 7 rows" silently reaches back weeks while `RANGE BETWEEN 6
    * PRECEDING AND CURRENT ROW` over the epoch-day key bounds the frame
    * by VALUE distance (`n_active_days` ≤ 7 is the spec's proof the
    * engine applied value- not row-distance). Money is the v20
    * fixed-point recipe (per-row cents before any sum). Shape: ONE
    * exchange total — an explicit `repartition(custkey)` that BOTH the
    * (custkey, day) pre-aggregate (hash on a key subset satisfies the
    * clustered requirement) and the customer-partitioned window reuse;
    * `orderBy(...).limit(20)` folds to TakeOrdered, no global sort. The
    * window key is `o_custkey` — corpus-spread high cardinality, the e14
    * audit convention — and the frame holds ≤ 7 day-rows per customer at
    * any corpus size. */
  def q26RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.Graft.init(spark) // pins session tz UTC — belt for the braces below
    val daily = Tables.orders(spark, dir)
      .select(col("o_custkey").as("custkey"),
        // timezone-FREE epoch day: o_orderdate reads as TIMESTAMP_NTZ
        // (wall clock, no zone), and NTZ→DATE preserves the wall-clock
        // date in ANY session zone — whereas the previous
        // `unix_micros(cast(... as timestamp))` interpreted the wall
        // clock in the session zone (the r11-advice hole)
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("day"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .repartition(col("custkey"))
      .groupBy(col("custkey"), col("day"))
      .agg(sum(col("cents")).as("day_cents"))
    val w = Window.partitionBy(col("custkey")).orderBy(col("day")).rangeBetween(-6, 0)
    daily.select(col("custkey"), col("day"), col("day_cents"),
        sum(col("day_cents")).over(w).as("trail7_cents"),
        count(lit(1)).over(w).as("n_active_days"))
      .orderBy(col("trail7_cents").desc, col("custkey"), col("day"))
      .limit(20)
  }

  val q26Oracle: String =
    """WITH d AS (SELECT o_custkey AS custkey,
      |                  floor(epoch_ms(o_orderdate) / 86400000)::BIGINT AS day,
      |                  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |           FROM orders),
      |g AS (SELECT custkey, day, sum(cents)::BIGINT AS day_cents FROM d GROUP BY 1, 2),
      |w AS (SELECT custkey, day, day_cents,
      |             sum(day_cents) OVER (PARTITION BY custkey ORDER BY day
      |               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)::BIGINT AS trail7_cents,
      |             count(*) OVER (PARTITION BY custkey ORDER BY day
      |               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)::BIGINT AS n_active_days
      |      FROM g)
      |SELECT custkey, day, day_cents, trail7_cents, n_active_days
      |FROM w ORDER BY trail7_cents DESC, custkey, day LIMIT 20""".stripMargin

  /** q29: DEEP MULTI-DIM JOIN — the TPC-H Q8 "national market share"
    * shape, the 7-table star this suite's 2-4-table joins never price:
    * fact (lineitem⋈orders, the one genuinely big-big shuffle) against
    * four dimension arms (part-type filter, customer→nation→region
    * market filter, supplier→nation focal flag). Join discipline per
    * the r9 structural-broadcast rule: nation/region are FIXED-
    * cardinality → explicit broadcast; part/customer/supplier scale
    * with the corpus → no hint, AQE promotes them at runtime when their
    * filtered sides measure small. The focal-nation share arrives as a
    * LEFT join + conditional sum (one pass computes numerator and
    * denominator — a share-by-filter formulation would scan the fact
    * twice). Money is the v20 fixed-point recipe (per-row cents before
    * any sum); year() over the timestamp under init-pinned UTC. */
  def q29MarketShare(spark: SparkSession, dir: String, region: String = "ASIA",
                     ptype: String = "PROMO", nation: String = "NATION_1"): DataFrame = {
    graft.Graft.init(spark)
    val li = Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0 + 0.5)
        .cast("long").as("cents"))
    val selParts = Tables.part(spark, dir)
      .filter(col("p_type") === ptype).select(col("p_partkey"))
    val ord = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).cast("long").as("o_year"))
    val marketCust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val focalSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).filter(col("n_name") === nation)
        .select(col("n_nationkey"))), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), lit(1L).as("is_focal"))
    li.join(selParts, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(marketCust, col("o_custkey") === col("c_custkey"))
      .join(focalSupp, col("l_suppkey") === col("s_suppkey"), "left")
      .groupBy(col("o_year"))
      .agg(sum(col("cents")).as("total_cents"),
        sum(when(col("is_focal") === 1L, col("cents")).otherwise(0L)).as("nation_cents"))
      .select(col("o_year"), col("total_cents"), col("nation_cents"),
        expr("nation_cents * 10000 div total_cents").as("share_q4"))
      .orderBy("o_year")
  }

  def q29Oracle(region: String = "ASIA", ptype: String = "PROMO",
                nation: String = "NATION_1"): String =
    s"""WITH li AS (SELECT l_orderkey, l_partkey, l_suppkey,
       |                   floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)::BIGINT AS cents
       |            FROM lineitem),
       |sel AS (SELECT li.cents, year(o_orderdate)::BIGINT AS o_year, li.l_suppkey
       |        FROM li JOIN part ON l_partkey = p_partkey AND p_type = '$ptype'
       |               JOIN orders ON l_orderkey = o_orderkey
       |               JOIN customer ON o_custkey = c_custkey
       |               JOIN nation cn ON c_nationkey = cn.n_nationkey
       |               JOIN region ON cn.n_regionkey = r_regionkey AND r_name = '$region'),
       |f AS (SELECT s_suppkey FROM supplier
       |      JOIN nation sn ON s_nationkey = sn.n_nationkey AND sn.n_name = '$nation')
       |SELECT o_year, sum(cents)::BIGINT AS total_cents,
       |       sum(CASE WHEN f.s_suppkey IS NOT NULL THEN cents ELSE 0 END)::BIGINT AS nation_cents,
       |       ((sum(CASE WHEN f.s_suppkey IS NOT NULL THEN cents ELSE 0 END) * 10000)
       |         // sum(cents))::BIGINT AS share_q4
       |FROM sel LEFT JOIN f ON sel.l_suppkey = f.s_suppkey
       |GROUP BY o_year ORDER BY o_year""".stripMargin

  val q19Oracle: String =
    """WITH e AS (
      |  SELECT CASE WHEN event_type = 'purchase' THEN event_type ELSE 'hot' END AS grp,
      |         user_id,
      |         floor(value * 100 + 0.5)::BIGINT AS vc,
      |         floor(epoch_ms(ts) / 86400000)::BIGINT AS day
      |  FROM events)
      |SELECT grp, count(DISTINCT user_id) AS n_users,
      |       count(DISTINCT day) AS n_days,
      |       count(*) AS n_events, sum(vc)::BIGINT AS sum_cents
      |FROM e GROUP BY grp ORDER BY grp""".stripMargin

  /** q30: DYNAMIC PARTITION PRUNING — the runtime complement of every
    * static pruning gate in the suite (v7's probe IN-lists, p6's lang
    * layout, c6's pushed cutoffs are all PLANNING-time): here the fact
    * side is month-partitioned on disk, and WHICH months survive is
    * only knowable at RUNTIME — the dim side ranks months by revenue
    * and keeps the top 3, a filter no static planner can turn into a
    * partition predicate. Spark's DPP plants the dim's broadcast result
    * as a subquery INSIDE the fact scan's PartitionFilters
    * (`dynamicpruning#` — spec-asserted on the executed plan), so the
    * second pass over the fact reads 3 month directories, not ~80. At
    * 100 TB this is THE mechanism that makes star-schema joins
    * survivable: the fact table is only ever read where the dims say
    * this query lives — without DPP the join below would rescan every
    * partition it just aggregated. Artifact-first (f7 discipline): the
    * partitioned fact is WRITTEN and re-read so the pruning is against
    * real directories, not an in-memory shortcut; fixed-point cents
    * keep both engines exact-integer; rank ties break by month. */
  def q30DppTopMonths(spark: SparkSession, dir: String, topN: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.Graft.init(spark)
    val fact0 = Tables.orders(spark, dir).select(
      col("o_orderkey"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
      substring(col("o_orderdate").cast("string"), 1, 7).as("o_month"))
    val path = Persist.tablePath(spark, "graft_fact_orders_month")
    graft.sources.Sinks.writePartitioned(fact0, path, "o_month")
    val fact = spark.read.parquet(path)
    // the dim: months ranked by total revenue — a RUNTIME-only filter
    // (domain-sized aggregate; the window runs over ~80 rows)
    val topDim = fact.groupBy(col("o_month"))
      .agg(sum(col("cents")).as("rev"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("rev").desc, col("o_month"))))
      .filter(col("rnk") <= topN)
      .select(col("o_month"))
    fact.join(topDim, Seq("o_month"))
      .groupBy(col("o_month"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("revenue_cents"))
      .orderBy("o_month")
  }

  def q30Oracle(topN: Int = 3): String =
    s"""WITH f AS (SELECT o_orderkey, floor(o_totalprice * 100 + 0.5)::BIGINT AS cents,
       |                  substr(CAST(o_orderdate AS VARCHAR), 1, 7) AS o_month
       |           FROM orders),
       |bm AS (SELECT o_month, sum(cents)::BIGINT AS rev FROM f GROUP BY o_month),
       |top_m AS (SELECT o_month FROM (
       |  SELECT o_month, row_number() OVER (ORDER BY rev DESC, o_month) AS rnk FROM bm)
       |  WHERE rnk <= $topN)
       |SELECT f.o_month, count(*)::BIGINT AS n_orders, sum(f.cents)::BIGINT AS revenue_cents
       |FROM f JOIN top_m ON f.o_month = top_m.o_month
       |GROUP BY f.o_month ORDER BY f.o_month""".stripMargin
}
