package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft
import graft.sources.Tables

/** Event-time / temporal operators over the `events` changelog table.
  *
  * Timestamp parity note: the parquet carries nanosecond timestamps, which
  * Spark's reader rejects as a timestamp type — [[Tables.events]] reads the
  * column as raw BIGINT nanoseconds. All event-time arithmetic goes through
  * epoch **milliseconds** via exact integer division (`ts div 1000000` ≡
  * DuckDB `epoch_ms(ts)` for positive ns), with `event_id` as the decisive
  * tie-break; raw timestamps never appear in output or ORDER BY.
  */
object Events {
  val SessionGapMs = 1800000L // 30 min

  /** e1: tumbling 1-hour window aggregation (+ JSON props extraction). */
  def tumblingWindow(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .withColumn("hour_bucket", expr("(ts div 1000000) div 3600000"))
      .groupBy(col("hour_bucket"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"),
        sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))
      .orderBy("hour_bucket", "event_type")
  }

  val tumblingWindowOracle: String =
    """SELECT floor(epoch_ms(ts) / 3600000)::BIGINT AS hour_bucket, event_type,
      |       count(*) AS n,
      |       round(sum(value), 2) AS sum_value,
      |       count(DISTINCT user_id) AS n_users,
      |       sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k
      |FROM events GROUP BY 1, 2 ORDER BY hour_bucket, event_type""".stripMargin

  /** e2: gap-based sessionization (30-min inactivity starts a session). */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("ms", expr("ts div 1000000"))
      .withColumn("prev_ms", lag(col("ms"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > SessionGapMs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("event_id"), col("user_id"), col("session_idx"))
      .orderBy("event_id")
  }

  val sessionizeOracle: String =
    s"""WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events),
       |g AS (SELECT event_id, user_id, ms,
       |             lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev_ms
       |      FROM e),
       |f AS (SELECT event_id, user_id,
       |             CASE WHEN prev_ms IS NULL OR ms - prev_ms > $SessionGapMs THEN 1 ELSE 0 END AS ns,
       |             ms FROM g)
       |SELECT event_id, user_id,
       |       sum(ns) OVER (PARTITION BY user_id ORDER BY ms, event_id
       |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_idx
       |FROM f ORDER BY event_id""".stripMargin

  /** e3: top-3 events per user by value — the TopK aggregate again, this
    * time grouped by a high-cardinality key (partial agg keeps the shuffle
    * at 3 rows/user). */
  def topkPerUser(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    Graft.init(spark)
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(Graft.topk(col("value"), col("event_id"), lit(k), lit(false)).as("top"))
      .select(col("user_id"), posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("user_id"), (col("pos") + 1).cast("long").as("rank"),
        col("r.id").as("event_id"), col("r.score").as("value"))
      .orderBy("user_id", "rank")
  }

  /** e4: as-of join — each purchase matched to the same user's most recent
    * click at-or-before it (a click at the identical millisecond counts as
    * prior). Implemented with the union+window trick: tag the two streams,
    * one shuffle+sort on `user_id`, carry the last click forward — never a
    * range-join, whose candidate product explodes on active users at scale.
    * Ordering (ms, tag, event_id) with tag click=0 < purchase=1 makes the
    * tie-break total and identical in both engines.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val tagged = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(
        col("event_id"), col("user_id"), expr("ts div 1000000").as("ms"),
        when(col("event_type") === "click", 0L).otherwise(1L).as("tag"))
    val prior = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    tagged
      // both carries in ONE select → a single Window node (chained
      // withColumns left two same-spec Window passes in the plan)
      .select(col("*"),
        last(when(col("tag") === 0, col("event_id")), ignoreNulls = true).over(prior).as("click_id"),
        last(when(col("tag") === 0, col("ms")), ignoreNulls = true).over(prior).as("click_ms"))
      .filter(col("tag") === 1)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("click_id"), (col("ms") - col("click_ms")).as("gap_ms"))
      .orderBy("purchase_id")
  }

  val asofJoinOracle: String =
    """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms,
      |                  CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS tag
      |           FROM events WHERE event_type IN ('click', 'purchase')),
      |w AS (SELECT event_id, user_id, ms, tag,
      |             last_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
      |               OVER (PARTITION BY user_id ORDER BY ms, tag, event_id
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_id,
      |             last_value(CASE WHEN tag = 0 THEN ms END IGNORE NULLS)
      |               OVER (PARTITION BY user_id ORDER BY ms, tag, event_id
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ms
      |      FROM e)
      |SELECT event_id AS purchase_id, user_id, click_id, ms - click_ms AS gap_ms
      |FROM w WHERE tag = 1 ORDER BY purchase_id""".stripMargin

  def topkPerUserOracle(k: Int = 3): String =
    s"""WITH r AS (SELECT user_id, event_id, value,
       |                  row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rank
       |           FROM events)
       |SELECT user_id, rank, event_id, value FROM r WHERE rank <= $k ORDER BY user_id, rank""".stripMargin
}
