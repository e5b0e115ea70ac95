package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSet, CaseWhen, Cast, Expression, LessThan, LessThanOrEqual, Literal, Pmod, Remainder}
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
  *   - limited subplans and aggregates whose GROUPING KEYS are provably
  *     corpus-independent (empty grouping, keys riding a bounded side of
  *     a join, fixed categorical domains like `lang`/`event_type`, or
  *     literal-valued CASE / mod-by-literal expressions) — an aggregate
  *     grouped by a corpus key (doc_id, term, band_key…) has
  *     corpus-proportional groups and is NOT bounded;
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
    // absent logicalLink → conservative false (recursing on `m` itself
    // would loop forever: m is its own leaf)
    case m: InMemoryRelation => m.cachedPlan.logicalLink.exists(isBounded)
    case _ => false
  }

  /** Columns that are ROW KEYS of the relations they filter (dense ids
    * assigned per row), so `key < N` keeps ≤ N ROWS at any SF. A range on
    * anything else bounds nothing: a MEASURE column (`n_tok < 100`) or a
    * shared key (`cluster_id < 8`) keeps a corpus FRACTION — constant
    * share, not constant count. */
  private val RowKeyColumns = Set("vec_id", "doc_id", "qid", "chunk_id")

  /** key-range slice: a TOP-LEVEL CONJUNCT `rowkey < lit` / `<= lit`
    * keeps a constant number of ids (the workload convention
    * `vec_id < nQueries`). Two deliberate exclusions (each was a hole):
    * a range inside an OR branch bounds nothing (`id < 8 OR lang='en'`
    * admits the whole segment), and attribute EQUALITY against a literal
    * is proportional (a segment filter keeps a constant FRACTION). */
  private def hasRangeCond(c: Expression): Boolean =
    topConjuncts(c).exists {
      case LessThan(l, _: Literal) => isRowKey(l)
      case LessThanOrEqual(l, _: Literal) => isRowKey(l)
      case _ => false
    }

  private def topConjuncts(c: Expression): Seq[Expression] = c match {
    case And(l, r) => topConjuncts(l) ++ topConjuncts(r)
    case other => Seq(other)
  }

  private def isRowKey(e: Expression): Boolean = e match {
    case a: Attribute => RowKeyColumns.contains(a.name)
    case c: Cast => isRowKey(c.child)
    case _ => false
  }

  /** True if the subtree's output ROW COUNT is independent of the corpus
    * size. Structural rules, not "a reducer anywhere": a limit bounds; a
    * literal key-range filter bounds; an Aggregate bounds ONLY when its
    * grouping is empty (1 row) or every grouping key traces to a
    * corpus-independent source ([[boundedAttrs]]) — a group-by over a
    * corpus-keyed column (doc_id, band_key, …) has corpus-proportional
    * groups and is NOT a reducer; a join is bounded when both sides are;
    * everything else is bounded when all its children are. */
  def isBounded(p: LogicalPlan): Boolean = p match {
    case _: GlobalLimit | _: LocalLimit => true
    case f: Filter => hasRangeCond(f.condition) || isBounded(f.child)
    case a: Aggregate =>
      a.groupingExpressions.isEmpty ||
        isBounded(a.child) || {
          lazy val cb = boundedAttrs(a.child)
          a.groupingExpressions.forall(domainBounded(_, cb))
        }
    case j: Join => isBounded(j.left) && isBounded(j.right)
    case leaf if leaf.children.isEmpty => boundedLeaf(leaf)
    case other => other.children.forall(isBounded)
  }

  /** Categorical schema columns whose VALUE DOMAIN is fixed independent
    * of SF (a language-ID label set, an event taxonomy, a class label) —
    * rows grow with the corpus, distinct values don't, so a group-by
    * over ONLY these keys is a genuine reducer. Deliberately short:
    * corpus-KEY columns (doc_id, vec_id, terms, grams, band keys) must
    * never appear here. */
  private val FixedDomainColumns = Set("lang", "source", "event_type", "label")

  /** Expression-level domain bound: every value the expression can take
    * comes from a corpus-independent set — all references domain-bounded
    * (includes pure literals: empty refs), a CASE whose branch VALUES
    * are domain-bounded (`CASE WHEN … THEN 'train' ELSE 'test' END` has
    * ≤ branches+1 values no matter what it scrutinizes), or a mod by a
    * literal (`doc_id % 10` has ≤ 10 values). */
  private def domainBounded(e: Expression, cb: AttributeSet): Boolean = e match {
    case _ if e.references.subsetOf(cb) => true
    case a: org.apache.spark.sql.catalyst.expressions.Alias => domainBounded(a.child, cb)
    case c: Cast => domainBounded(c.child, cb)
    case c: CaseWhen =>
      c.branches.forall { case (_, v) => domainBounded(v, cb) } &&
        c.elseValue.forall(domainBounded(_, cb))
    case Pmod(_, _: Literal, _) => true
    case Remainder(_, _: Literal, _) => true
    case _ => false
  }

  /** Attributes whose DISTINCT-VALUE domain is corpus-independent — the
    * lineage that lets a group-by count as a reducer: anything out of a
    * row-bounded subtree is domain-bounded; projections/aggregations of
    * bounded inputs stay bounded; a join carries each side's bounded
    * attrs through (group-by qid after corpus⋈workload is bounded
    * because qid rides the workload side). */
  private def boundedAttrs(p: LogicalPlan): AttributeSet =
    if (isBounded(p)) p.outputSet
    else p match {
      case pr: Project =>
        val cb = boundedAttrs(pr.child)
        AttributeSet(pr.projectList.collect {
          case ne if domainBounded(ne, cb) => ne.toAttribute
        })
      case a: Aggregate =>
        val cb = boundedAttrs(a.child)
        AttributeSet(a.aggregateExpressions.collect {
          case ne if ne.references.nonEmpty && ne.references.subsetOf(cb) => ne.toAttribute
        })
      case j: Join => boundedAttrs(j.left) ++ boundedAttrs(j.right)
      case g: Generate =>
        val cb = boundedAttrs(g.child)
        if (g.generator.references.subsetOf(cb)) cb ++ AttributeSet(g.generatorOutput)
        else cb
      case u: Union =>
        val childBs = u.children.map(boundedAttrs)
        AttributeSet(u.output.zipWithIndex.collect {
          case (attr, i) if u.children.zip(childBs).forall {
            case (c, b) => b.contains(c.output(i))
          } => attr
        })
      case leaf if leaf.children.isEmpty =>
        // fixed-domain categorical columns surface at the scan
        AttributeSet(leaf.output.filter(a => FixedDomainColumns.contains(a.name)))
      case other =>
        // row-preserving pass-throughs (Filter, Sort, Window, Repartition…)
        other.children.map(boundedAttrs).reduce(_ ++ _)
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
