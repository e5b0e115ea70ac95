package graft

import scala.io.Source

import graft.tools.PlanBudget

/** Plan-shape regression gate: every query's static physical plan must
  * stay within its recorded shuffle/Expand budget
  * (`src/test/resources/plan_budgets.tsv` — the executable PLANS.md).
  *
  * A query EXCEEDING its budget fails: an extra shuffle or Expand is a
  * full-corpus cost at 100 TB and has historically only ever appeared by
  * accident (a rewrite losing its partial-agg shape, an inferred filter
  * re-introducing a join). A query UNDER budget also fails — that is a
  * plan improvement the snapshot must record, or it silently becomes
  * headroom for the next regression. Both fixes are one command:
  *
  *   sbt "runMain graft.tools.PlanBudget"
  *
  * then review the diff like any other code change.
  */
class PlanBudgetSpec extends GraftSuite {

  private lazy val budgets: Map[String, PlanBudget.Counts] = {
    val src = Source.fromFile(PlanBudget.SnapshotPath, "UTF-8")
    try PlanBudget.parse(src.getLines()) finally src.close()
  }

  test("snapshot covers exactly the registered queries") {
    val queries = SparkEntry.queries.keySet
    val missing = queries -- budgets.keySet
    val stale = budgets.keySet -- queries
    assert(missing.isEmpty && stale.isEmpty,
      s"plan-budget snapshot drift — missing=$missing stale=$stale; " +
        "regenerate: sbt \"runMain graft.tools.PlanBudget\"")
  }

  test("every query's plan matches its recorded shuffle/Expand budget") {
    val drift = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      budgets.get(name).flatMap { want =>
        val got = PlanBudget.countsOf(fn(spark, sf))
        if (got == want) None
        else Some(s"$name: shuffles ${want.shuffles}->${got.shuffles} " +
          s"expands ${want.expands}->${got.expands}")
      }
    }
    assert(drift.isEmpty,
      s"plan drift in ${drift.size} queries (grew = regression, shrank = stale " +
        "snapshot):\n  " + drift.mkString("\n  ") +
        "\nif deliberate, regenerate: sbt \"runMain graft.tools.PlanBudget\"")
  }
}
