package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.call_function

import graft.functions._

/** Session bootstrap: registers the graft native functions so both the
  * DataFrame API (via [[call_function]]) and `spark.sql` can use them.
  * Idempotent per session — keyed on the session's own function registry
  * (is `graft_cosine` already there?), not an identity-hash set, so two
  * live sessions can never collide and nothing outlives its session.
  * [[GraftExtensions]] offers the same surface via `spark.sql.extensions`
  * for sessions the library doesn't construct.
  */
object Graft {

  /** (name, builder) for every graft function — single source of truth for
    * both the runtime registry and the SparkSessionExtensions path. */
  val functionBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (es => VecDot(es(0), es(1))),
    "graft_cosine" -> (es => VecCosine(es(0), es(1))),
    "graft_l2" -> (es => VecL2(es(0), es(1))),
    "graft_manhattan" -> (es => VecManhattan(es(0), es(1))),
    "graft_norm" -> (es => VecNorm(es(0))),
    "graft_vec_normalize" -> (es => VecNormalize(es(0))),
    "graft_sq8_encode" -> (es => Sq8Encode(es(0))),
    "graft_nearest_centroid" -> (es => NearestCentroid(es(0), es(1))),
    "graft_nearest_centroid_grouped" -> (es => NearestCentroidGrouped(es(0), es(1), es(2))),
    "graft_nearest_centroid_grouped_l2" -> (es => NearestCentroidGrouped(es(0), es(1), es(2), l2 = true)),
    "graft_topk" -> (es => TopKAgg(es(0), es(1), es(2), es(3))),
    "graft_kmv" -> (es => KmvAgg(es(0), es(1))),
    "graft_vecsum" -> (es => VecSumAgg(es(0))),
    "graft_simhash_agg" -> (es => SimhashBitsAgg(es(0))),
    "graft_simhash_keys" -> (es => SimhashKeys(es(0),
      litInt(es(1), "nTables"), litInt(es(2), "nBits"), litLong(es(3), "seed"))))

  def init(spark: SparkSession): SparkSession = {
    // Conf tuning runs UNCONDITIONALLY (each setting is idempotent): a
    // session built with spark.sql.extensions=graft.GraftExtensions already
    // has the functions injected, and gating the confs on function existence
    // would silently skip them for exactly those sessions.
    //
    // InferFiltersFromGenerate turns explode(expensive_expr) into a scan
    // filter that re-evaluates the expression 2 extra times per row (seen
    // on graft_simhash_keys: 3× the tables×bits×dim loop). Our generators
    // never produce empty arrays, so the inferred guard is pure overhead.
    // Appended to (not clobbering) whatever the user already excluded.
    val inferRule = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    val excluded = spark.conf.getOption("spark.sql.optimizer.excludedRules")
      .map(_.trim).filter(_.nonEmpty)
    if (!excluded.exists(_.split(",").map(_.trim).contains(inferRule)))
      spark.conf.set("spark.sql.optimizer.excludedRules",
        excluded.map(_ + "," + inferRule).getOrElse(inferRule))
    // TypedImperativeAggregates (graft_topk / graft_vecsum) fall back to
    // sort-based aggregation after 128 distinct keys per partition by
    // default — far too low for per-user/per-query grouping at scale.
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
    // Generations of events.parquet that carry NANOSECOND timestamps are
    // rejected by the Spark 4 reader as a timestamp type; read them as raw
    // BIGINT ns (harmless when the column is µs TIMESTAMP — see
    // Tables.normalizeEventTs, which canonicalizes either encoding).
    // Session bootstrap is the right home for this (a read should not
    // mutate session conf as a side effect).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Engine convention: event time is UTC wall-clock. Tz-NAIVE parquet
    // timestamps (pandas-written events.ts generations read as
    // TIMESTAMP_NTZ) convert to instants through the session timezone —
    // pinning it makes that cast the identity, matching the DuckDB oracle's
    // naive-is-UTC `epoch_ms`, independent of host timezone. An embedding
    // application that configured its OWN session timezone gets a loud
    // one-time warning rather than a silent clobber (after the set the
    // value reads back as UTC, so the warning cannot repeat).
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    if (prevTz != "UTC") {
      // inherited-JVM-default ≠ a user choice; only an explicit non-UTC
      // configuration deserves the warning
      if (prevTz != java.util.TimeZone.getDefault.getID)
        System.err.println(
          s"[graft] overriding configured spark.sql.session.timeZone=$prevTz -> UTC " +
            "(graft's event-time convention; see Tables.normalizeEventTs)")
      spark.conf.set("spark.sql.session.timeZone", "UTC")
    }
    // Function registration alone is keyed on the registry (idempotent per
    // session, and extension-injected sessions already pass this check).
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(functionBuilders.head._1))) {
      functionBuilders.foreach { case (name, builder) =>
        reg.createOrReplaceTempFunction(name, builder, "built-in")
      }
    }
    // Sessions not built with spark.sql.extensions=graft.GraftExtensions
    // still get the (knob-gated, otherwise inert) range-join rewrite via
    // the experimental hook; idempotent append.
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RangeJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RangeJoinRule
    // ... and the as-of join planner strategy (a no-op unless an
    // [[graft.plans.AsOfJoin]] node appears in a plan).
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    spark
  }

  // Column-API sugar over the registered functions.
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)
  def l2(a: Column, b: Column): Column = call_function("graft_l2", a, b)
  def manhattan(a: Column, b: Column): Column = call_function("graft_manhattan", a, b)
  def norm(a: Column): Column = call_function("graft_norm", a)
  def vecNormalize(a: Column): Column = call_function("graft_vec_normalize", a)
  def sq8Encode(a: Column): Column = call_function("graft_sq8_encode", a)
  def nearestCentroid(v: Column, centroidMatrix: Column): Column =
    call_function("graft_nearest_centroid", v, centroidMatrix)
  def nearestCentroidGrouped(v: Column, groupKey: Column, matrixByGroup: Column): Column =
    call_function("graft_nearest_centroid_grouped", v, groupKey, matrixByGroup)
  def nearestCentroidGroupedL2(v: Column, groupKey: Column, matrixByGroup: Column): Column =
    call_function("graft_nearest_centroid_grouped_l2", v, groupKey, matrixByGroup)
  def topk(score: Column, id: Column, k: Column, smallestFirst: Column): Column =
    call_function("graft_topk", score, id, k, smallestFirst)
  def vecsum(v: Column): Column = call_function("graft_vecsum", v)

  /** Snap every component of a double vector to the 2^-21 dyadic grid
    * (round-half-up). Values on this grid are exact IEEE doubles whose sums
    * stay exact for any corpus below ~2^31 rows, so a partial aggregate over
    * quantized vectors is ORDER-INDEPENDENT: every shuffle-merge order — and
    * every engine — produces bit-identical sums. The k-means trainers
    * quantize their accumulation inputs with this so trained centroids are
    * deterministic (replayable by the DuckDB oracle) instead of drifting
    * with shuffle block fetch order. x*2^21 and /2^21 are exact (powers of
    * two); the only rounding is the intended grid snap, a ≤2^-22 ≈ 1.2e-7
    * perturbation per component — noise for ANN quality. */
  def vecQuantize(v: Column): Column = {
    import org.apache.spark.sql.functions.{floor, lit, transform}
    transform(v, x => floor(x * lit(QuantScale) + lit(0.5)) / lit(QuantScale))
  }

  /** Grid denominator for [[vecQuantize]] (2^21). */
  val QuantScale: Double = 2097152.0
  def simhashKeys(v: Column, nTables: Int, nBits: Int, seed: Long): Column =
    call_function("graft_simhash_keys", v,
      org.apache.spark.sql.functions.lit(nTables),
      org.apache.spark.sql.functions.lit(nBits),
      org.apache.spark.sql.functions.lit(seed))

  private def litInt(e: Expression, name: String): Int =
    e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(s"$name must be an int literal, got $other")
    }
  private def litLong(e: Expression, name: String): Long =
    e.eval(null) match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(s"$name must be a long literal, got $other")
    }
}
