package graft

import graft.streaming.Streams

/** Structured-Streaming ≡ batch equivalence for the windowed aggregation. */
class StreamingSpec extends GraftSuite {
  import spark.implicits._

  test("streaming tumbling window matches batch e1 counts") {
    val streamed = Streams.runToMemory(spark, sf)
      .select("hour_bucket", "event_type", "n")
      .as[(Long, String, Long)].collect().toSet
    val batch = run("e1_tumbling_window")
      .select("hour_bucket", "event_type", "n")
      .as[(Long, String, Long)].collect().toSet
    assert(streamed === batch)
  }
}
