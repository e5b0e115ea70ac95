package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{EqualTo, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.columnar.InMemoryRelation
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.SparkEntry

/** STATIC BROADCAST-HINT GATE — the executable form of the scale rule
  * "never hint-broadcast an SF-proportional relation". A `broadcast()`
  * hint is an UNCONDITIONAL promise that the relation fits in one
  * executor + the driver at ANY corpus size. (Planner- or AQE-chosen
  * broadcasts are different: they are size-MEASURED decisions that adapt
  * as the data grows, so they are exempt — this gate audits only the
  * hints, read from the optimized logical plan's `JoinHint`s.)
  *
  * The only relations that can keep a hint's promise:
  *
  *   - aggregated / limited subplans (a TopK hit set, a 1-row count, a
  *     k-limited sample) — bounded by the query, not the corpus;
  *   - fixed-cardinality dims (`nation` = 25 rows, `region` = 5 at every
  *     TPC-H SF) and driver-built literal frames (trained centroid /
  *     codebook matrices, probe tables — K·M rows by construction);
  *   - key-range slices (`vec_id < nQueries` — a constant number of ids).
  *
  * Everything else — base fact tables, `customer`, the corpus, unbounded
  * standing artifacts like the word-vocabulary or shingle tables — grows
  * with SF, and a hint on one is a plan that works at sf0.1 and OOMs the
  * driver at 100×. GraftSpec asserts zero violations over every
  * registered query.
  */
object BroadcastAudit {

  /** Fixed-cardinality parquet relations — safe at every SF. */
  private val BoundedTableFiles = Seq("nation.parquet", "region.parquet")

  /** Bounded standing artifacts: trained model matrices (K·M rows by
    * construction) and the external query-WORKLOAD table — bounded by the
    * serving batch the caller submits, not by the corpus (the v26–v39
    * convention: broadcasting the query side over the corpus scan IS the
    * intended serving plan; a caller with an unboundedly large workload
    * splits it into batches), and TOMBSTONE delete logs — delta-sized
    * between compactions by p7's maintenance contract (the log is folded
    * into a new index generation when it grows; a store that never
    * compacts has a durability problem before it has a broadcast
    * problem). Unbounded artifacts (vocab, shingle, band, code tables)
    * are deliberately NOT here — they scale with the corpus. */
  private val BoundedArtifactMarkers =
    Seq("centroid", "codebook", "probe", "workload", "tombstone")

  private def boundedLeaf(p: LogicalPlan): Boolean = p match {
    case _: LocalRelation => true // driver literals (centroid matrices …)
    // LogicalRDD here only ever wraps a frame built FROM driver memory
    // (collected centroid/codebook matrices re-parallelized) — the data
    // already fit on the driver, which is exactly the broadcast bound
    case _: org.apache.spark.sql.execution.LogicalRDD => true
    case _: OneRowRelation => true
    case _: Range => true
    case l: LogicalRelation =>
      l.relation match {
        case h: HadoopFsRelation =>
          val paths = h.location.rootPaths.map(_.toString.toLowerCase)
          paths.nonEmpty && paths.forall { pth =>
            BoundedTableFiles.exists(pth.endsWith) ||
              BoundedArtifactMarkers.exists(pth.contains)
          }
        case _ => false
      }
    case m: InMemoryRelation => isBounded(m.cachedPlan.logicalLink.getOrElse(m))
    case _ => false
  }

  /** True if the subtree's output cardinality is independent of the
    * corpus size: a reducer (aggregate / limit) anywhere, a literal
    * key-range filter, or all-bounded leaves. */
  def isBounded(p: LogicalPlan): Boolean = {
    val hasReducer = p.exists {
      case _: Aggregate => true
      case _: GlobalLimit => true
      case _: LocalLimit => true
      case _ => false
    }
    if (hasReducer) return true

    // key-range slice: `<` / `<=` against a literal keeps a constant
    // number of ids (the workload convention `vec_id < nQueries`);
    // attribute EQUALITY against a literal is proportional (a segment
    // filter keeps a constant FRACTION) and deliberately does not count
    val hasRangeFilter = p.exists {
      case f: Filter =>
        f.condition.exists {
          case LessThan(_, _: Literal) => true
          case LessThanOrEqual(_, _: Literal) => true
          case EqualTo(_, _: Literal) => false
          case _ => false
        }
      case _ => false
    }
    if (hasRangeFilter) return true

    val leaves = p.collectLeaves()
    leaves.nonEmpty && leaves.forall(boundedLeaf)
  }

  private def describe(p: LogicalPlan): String = {
    val leaves = p.collectLeaves().map {
      case l: LogicalRelation =>
        l.relation match {
          case h: HadoopFsRelation => h.location.rootPaths.map(_.getName).mkString(",")
          case r => r.getClass.getSimpleName
        }
      case other => other.nodeName
    }
    s"hinted broadcast over [${leaves.mkString("; ")}]:\n${p.treeString.take(600)}"
  }

  /** Violations for one query: every join side carrying a BROADCAST hint
    * whose subtree is not provably size-bounded. */
  def violations(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case j: Join =>
        val sides = Seq(j.hint.leftHint -> j.left, j.hint.rightHint -> j.right)
        sides.collect {
          case (Some(h), side) if h.strategy.contains(BROADCAST) && !isBounded(side) =>
            describe(side)
        }
    }.flatten

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val vs = try violations(fn(spark, sfDir)) catch {
        case e: Exception => Seq(s"AUDIT ERROR: ${e.getMessage}")
      }
      if (vs.nonEmpty) { bad += 1; println(s"== $name\n${vs.mkString("\n")}") }
    }
    println(s"[broadcast-audit] ${if (bad == 0) "clean" else s"$bad queries flagged"}")
    spark.stop()
  }
}
