package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowed counts with watermark: on-time events aggregate, late events drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = Streams.windowedCounts(events, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("append").start()
    try {
      // window [10:00,10:10): three clicks; [10:10,10:20): one view
      input.addData((ts(1), "click", 1.0), (ts(4), "click", 2.0),
                    (ts(9), "click", 3.0), (ts(11), "view", 5.0))
      q.processAllAvailable()
      // advance the watermark far past 10:10 so the first window closes
      input.addData((ts(40), "view", 1.0))
      q.processAllAvailable()
      val closed = spark.table("win_agg")
        .select(col("event_type"), col("n_events"), col("sum_value")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(closed.contains(("click", 3L, 6.0)), s"got $closed")
      // a late click for the closed 10:00 window must be dropped
      input.addData((ts(2), "click", 100.0))
      q.processAllAvailable()
      input.addData((ts(55), "view", 1.0))
      q.processAllAvailable()
      val after = spark.table("win_agg")
        .filter(col("event_type") === "click")
        .agg(sum(col("n_events"))).head.getLong(0)
      assert(after == 3L, "late event past the watermark must not reopen the window")
    } finally q.stop()
  }

  test("mapGroupsWithState accumulates per-user state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val q = Streams.runningUserProfiles(input.toDS(), idleTimeoutMs = None)
      .writeStream.format("memory").queryName("user_state")
      .outputMode("update").start()
    try {
      input.addData((1L, 10.0), (1L, 5.0), (2L, 1.0))
      q.processAllAvailable()
      input.addData((1L, 2.5))
      q.processAllAvailable()
      val latest = spark.table("user_state")
        .groupBy(col("userId"))
        .agg(max(col("nEvents")).as("n"), max(col("totalValue")).as("tot"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(latest(1L) == ((3L, 17.5)), s"state did not accumulate: $latest")
      assert(latest(2L) == ((1L, 1.0)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization closes sessions on gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val q = Streams.sessionize(input.toDS(), gapSec = 60L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      input.addData((1L, 100L), (1L, 130L), (2L, 100L))
      q.processAllAvailable()
      assert(spark.table("sessions").isEmpty, "open sessions must not emit")
      // user 1's event past the 60s gap closes [100,130]; user 2 stays open
      input.addData((1L, 1000L))
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .as[Streams.ClosedSession].collect().toSet
      assert(rows == Set(Streams.ClosedSession(1L, 100L, 130L, 2L, 30L)), s"got $rows")
      // a second gap closes the session the previous batch opened
      input.addData((1L, 5000L))
      q.processAllAvailable()
      val all = spark.table("sessions").as[Streams.ClosedSession].collect().toSet
      assert(all.contains(Streams.ClosedSession(1L, 1000L, 1000L, 1L, 0L)), s"got $all")
    } finally q.stop()
  }
}
