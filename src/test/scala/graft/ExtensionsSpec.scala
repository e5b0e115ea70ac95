package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions registers the function surface via spark.sql.extensions
  * — pure-SQL users get the codegen'd expressions with no Graft.init call. */
class ExtensionsSpec extends AnyFunSuite {
  test("spark.sql.extensions=graft.GraftExtensions exposes graft_* in SQL") {
    val prior = TestSession.spark // ensure the shared context exists
    // getOrCreate returns the existing default session (ignoring new
    // configs), so detach it first to force a fresh extension-built session
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // spark.sql.extensions is static (read at SparkContext creation); in
      // this shared-context JVM the programmatic path exercises the same
      // GraftExtensions class the conf would load in a fresh spark-submit
      val ext = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val v = ext
        .sql("SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
        .collect()(0).getDouble(0)
      assert(math.abs(v - 1.0) < 1e-12)
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }

  test("RangeJoinRule: a naive inequality join plans as an equi-join when the knob is set") {
    import org.apache.spark.sql.functions._
    val spark = graft.Graft.init(TestSession.spark)
    val sf = TestSession.sf
    val e = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("value"), expr("ts div 1000000").as("ms"))
    val bounds = e.agg(min(col("ms")).as("t0"), max(col("ms")).as("t1"))
    val wins = bounds
      .select(col("t0"), explode(expr("sequence(0L, (t1 - t0) div 5400000L)")).as("widx"))
      .select(col("widx"), (col("t0") + col("widx") * 5400000L).as("lo"),
        (col("t0") + col("widx") * 5400000L + 7200000L).as("hi"))
      .localCheckpoint() // freeze: both runs must see identical intervals
    def naive() = e.join(wins, col("ms") >= col("lo") && col("ms") < col("hi"))
      .groupBy(col("widx")).agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("widx")
    // knob OFF: the planner's only answer to a pure range join is a
    // nested-loop — this is the plan the rule exists to replace
    spark.conf.unset("spark.graft.rangejoin.bucket")
    val off = naive()
    off.collect()
    assert(off.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
      "precondition failed: naive range join no longer plans BNLJ")
    val offRows = off.collect().map(_.toSeq).toSeq
    // knob ON: the injected rule rewrites to the bucketed equi-join
    spark.conf.set("spark.graft.rangejoin.bucket", "3600000")
    try {
      val on = naive()
      val rows = on.collect().map(_.toSeq).toSeq
      val plan = on.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"rule did not fire:\n${plan.take(1200)}")
      assert(rows === offRows, "the rewrite changed the join's results")
      assert(rows.nonEmpty)
    } finally spark.conf.unset("spark.graft.rangejoin.bucket")
  }

  test("e12: custom AsOfJoinExec == e4's window formulation; plan has the node, no Window") {
    val spark = graft.Graft.init(TestSession.spark)
    val sf = TestSession.sf
    val merge = graft.operators.Events.asofJoinMerge(spark, sf)
    val m = merge.collect().map(_.toSeq).toSet
    val w = graft.operators.Events.asofJoin(spark, sf).collect().map(_.toSeq).toSet
    assert(m === w, "custom as-of join diverges from the union+window twin")
    assert(m.nonEmpty)
    val plan = merge.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), "AsOfJoinExec missing from the physical plan")
    assert(!plan.contains("Window ") && !plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"as-of plan fell back to a built-in formulation:\n${plan.take(1200)}")
  }

  test("AsOfJoinExec survives a different shuffle-partition count under AQE coalescing") {
    // zipPartitions requires the two child exchanges to stay aligned after
    // AQE's runtime coalescing — run at an odd partition count and compare
    // against the window twin to catch any misalignment
    val spark = graft.Graft.init(TestSession.spark)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "17")
    try {
      val m = graft.operators.Events.asofJoinMerge(spark, TestSession.sf)
        .collect().map(_.toSeq).toSet
      val w = graft.operators.Events.asofJoin(spark, TestSession.sf)
        .collect().map(_.toSeq).toSet
      assert(m === w, "as-of join results drift at a non-default partition count")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("AsOfJoin merge semantics on a hand-built frame: ties, gaps, empty keys, null payloads") {
    import org.apache.spark.sql.functions._
    val spark = graft.Graft.init(TestSession.spark)
    import spark.implicits._
    // left: (id, key, t); right: (rid, key, t) — crafted so that:
    //  key 1: two rights at the SAME time 10 (rid 100, 101) -> larger tie wins;
    //         a right AFTER the left row (t=99) must not match
    //  key 2: right only at t=50 -> left t=49 unmatched, left t=50 matched (<=)
    //  key 3: no rights at all
    //  key 4: rights only (no lefts) -> consumed and dropped
    val left = Seq((1L, 1L, 10L), (2L, 1L, 15L), (3L, 2L, 49L), (4L, 2L, 50L), (5L, 3L, 7L))
      .toDF("id", "k", "t")
    val right = Seq((100L, 1L, 10L), (101L, 1L, 10L), (102L, 1L, 99L),
      (200L, 2L, 50L), (300L, 4L, 1L))
      .toDF("rid", "rk", "rt")
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).get
    val joined = org.apache.spark.sql.GraftShims.ofRows(spark,
      graft.plans.AsOfJoin(lp, rp, attr(lp, "k"), attr(rp, "rk"),
        attr(lp, "t"), attr(rp, "rt"), attr(rp, "rid")))
      .select($"id", $"rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(joined === Map(
      1L -> Some(101L), // tie at t=10: larger rid wins; rid 102 (t=99) excluded
      2L -> Some(101L), // carried forward within the key
      3L -> None,       // strictly-before right only arrives at t=50
      4L -> Some(200L), // at-or-before is inclusive
      5L -> None))      // key with no rights
  }

  test("e13: SCD2 enrichment via AsOfJoinExec == c11's interval containment join; no Window") {
    val spark = graft.Graft.init(TestSession.spark)
    val sf = TestSession.sf
    val asOf = graft.operators.Events.scd2AsOf(spark, sf)
    val m = asOf.collect().map(_.toSeq).toSet
    val c = graft.operators.Crud.scd2Lookup(spark, sf).collect().map(_.toSeq).toSet
    assert(m === c, "as-of SCD2 enrichment diverges from the containment-join twin")
    assert(m.nonEmpty)
    val plan = asOf.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), "AsOfJoinExec missing from the e13 plan")
    assert(!plan.contains("Window ") && !plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"e13 fell back to a window/nested-loop formulation:\n${plan.take(1200)}")
  }

  test("AsOfJoin null TIMES: left null-time joins nothing, right null-time matches nothing") {
    import org.apache.spark.sql.functions._
    val spark = graft.Graft.init(TestSession.spark)
    import spark.implicits._
    // key 1: left null-time row (id 1) + real row (id 2); right has a
    //        null-time row (rid 100) that must be skipped and a real match
    //        (rid 101, t=5)
    // key 2: ONLY a null-time right -> left stays unmatched
    val left = Seq((1L, 1L, None: Option[Long]), (2L, 1L, Some(10L)), (3L, 2L, Some(8L)))
      .toDF("id", "k", "t")
    val right = Seq((100L, 1L, None: Option[Long]), (101L, 1L, Some(5L)),
      (200L, 2L, None: Option[Long]))
      .toDF("rid", "rk", "rt")
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).get
    val joined = org.apache.spark.sql.GraftShims.ofRows(spark,
      graft.plans.AsOfJoin(lp, rp, attr(lp, "k"), attr(rp, "rk"),
        attr(lp, "t"), attr(rp, "rt"), attr(rp, "rid")))
      .select($"id", $"rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(joined === Map(
      1L -> None,       // null left time: padded, no NPE, no time-0 match
      2L -> Some(101L), // the null-time right (rid 100) was skipped, not matched
      3L -> None))      // a null-time right can never be anyone's match
  }

  test("AsOfJoinExec rejects non-Long time expressions at planning time") {
    val spark = graft.Graft.init(TestSession.spark)
    import spark.implicits._
    val left = Seq((1L, 1L, "a")).toDF("id", "k", "t")
    val right = Seq((100L, 1L, "b")).toDF("rid", "rk", "rt")
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).get
    val ex = intercept[Exception] {
      org.apache.spark.sql.GraftShims.ofRows(spark,
        graft.plans.AsOfJoin(lp, rp, attr(lp, "k"), attr(rp, "rk"),
          attr(lp, "t"), attr(rp, "rt"), attr(rp, "rid"))).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("LongType"),
      s"expected a LongType validation error, got: ${ex.getMessage}")
  }
}
