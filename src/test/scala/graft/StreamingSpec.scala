package graft

import graft.streaming.Streams

/** Structured-Streaming ≡ batch equivalence for the windowed aggregation. */
class StreamingSpec extends GraftSuite {
  import spark.implicits._

  test("streaming tumbling window matches batch e1 counts") {
    val streamed = Streams.runToMemory(spark,
        Streams.tumblingCounts(spark, sf), "graft_stream_out", "complete")
      .select("hour_bucket", "event_type", "n")
      .as[(Long, String, Long)].collect().toSet
    val batch = run("e1_tumbling_window")
      .select("hour_bucket", "event_type", "n")
      .as[(Long, String, Long)].collect().toSet
    assert(streamed === batch)
  }

  test("stateful flatMapGroupsWithState sessionization matches batch e2") {
    val streamed = Streams.runToMemory(spark,
        Streams.sessionizeStateful(spark, sf), "graft_sessions_out", "append")
      .select("user_id", "n_sessions", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    val batch = run("e2_sessionize")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max("session_idx").as("n_sessions"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n_events"))
      .select("user_id", "n_sessions", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed === batch)
  }
}
