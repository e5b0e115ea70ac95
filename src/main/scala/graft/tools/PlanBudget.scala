package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExpandExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

import graft.SparkEntry

/** Per-query PHYSICAL-PLAN budgets — the executable form of the PLANS.md
  * audit. For every registered query this counts the two node kinds that
  * decide whether a plan survives a 100× scale-up:
  *
  *   - `ShuffleExchangeLike` — every shuffle is a full network+disk pass
  *     over its input; an extra one appearing in a rewrite is exactly the
  *     regression the by-hand plan audits have been catching;
  *   - `ExpandExec` — row replication before an aggregate (multi-distinct,
  *     grouping sets); fine when chosen deliberately (q8 rollup, q12
  *     cube), a silent 2-3× input blowup when it sneaks in.
  *
  * Counts come from the fully-prepared STATIC plan — `executedPlan`, or
  * the AQE wrapper's `initialPlan` — after EnsureRequirements has
  * inserted exchanges but before anything runs, so the count is
  * deterministic (AQE can only reuse/convert exchanges at runtime, never
  * add one, so the initial count is the worst case). The snapshot
  * lives in `src/test/resources/plan_budgets.tsv`; `PlanBudgetSpec` fails
  * any query whose plan grows a shuffle or an Expand past its recorded
  * budget, and flags stale budgets when a plan IMPROVES. Regenerate after
  * a deliberate plan change:
  *
  *   sbt "runMain graft.tools.PlanBudget"        # rewrites the snapshot
  */
object PlanBudget {
  final case class Counts(shuffles: Int, expands: Int) {
    def tsv: String = s"$shuffles\t$expands"
  }

  def countsOf(df: DataFrame): Counts = {
    // `sparkPlan` predates EnsureRequirements (no exchanges inserted yet);
    // the AQE wrapper's initialPlan is the fully-prepared static plan —
    // exchanges present, nothing executed, runtime re-planning not yet
    // applied (AQE only ever reuses/converts exchanges, never adds one,
    // so the initial count is the worst case being budgeted)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    Counts(
      plan.collect { case e: ShuffleExchangeLike => e }.size,
      plan.collect { case e: ExpandExec => e }.size)
  }

  val SnapshotPath = "src/test/resources/plan_budgets.tsv"

  /** Budget counts for every registered query at the given corpus. Eager
    * index builds inside query constructors run (memoized per session);
    * the RETURNED plan is what gets counted — the same contract the bench
    * prep/exec split uses. */
  def snapshot(spark: SparkSession, dir: String): Seq[(String, Counts)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> countsOf(fn(spark, dir))
    }

  def parse(lines: Iterator[String]): Map[String, Counts] =
    lines.map(_.trim).filter(_.nonEmpty).filterNot(_.startsWith("#")).map { l =>
      val Array(n, s, e) = l.split("\t")
      n -> Counts(s.toInt, e.toInt)
    }.toMap

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = snapshot(spark, sfDir)
    val body = rows.map { case (n, c) => s"$n\t${c.tsv}" }.mkString("\n")
    Files.writeString(Paths.get(SnapshotPath),
      s"# query\tshuffles\texpands - regenerate: sbt \"runMain graft.tools.PlanBudget\"\n$body\n")
    println(s"[plan-budget] wrote ${rows.size} budgets to $SnapshotPath")
    spark.stop()
  }
}
