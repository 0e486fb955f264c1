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

  test("sessionize cross-batch stragglers: in-reach counts, too-late drops, no rewind") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val q = Streams.sessionize(input.toDS(), gapSec = 60L)
      .writeStream.format("memory").queryName("straggler_sessions")
      .outputMode("append").start()
    try {
      input.addData((1L, 1000L), (1L, 1040L))     // open session [1000, 1040]
      q.processAllAvailable()
      // batch 2: a straggler INSIDE the open session's reach (counts, no
      // rewind of start/lastTs) and one far older than start-gap (drops)
      input.addData((1L, 1010L), (1L, 100L))
      q.processAllAvailable()
      // close the session; its bounds must be untouched by the stragglers
      input.addData((1L, 9000L))
      q.processAllAvailable()
      val rows = spark.table("straggler_sessions")
        .as[Streams.ClosedSession].collect().toSet
      assert(rows == Set(Streams.ClosedSession(1L, 1000L, 1040L, 3L, 40L)),
        s"straggler policy violated: $rows")
    } finally q.stop()
  }

  test("mergeRuns: arrival-order-independent and equal to sort-then-fold sessionization") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 20) {
      val n = 50 + rnd.nextInt(200)
      val gap = 30L + rnd.nextInt(100)
      val events = Array.fill(n)(rnd.nextInt(5000).toLong)
      // reference: sort, then split where diff > gap
      val sorted = events.sorted
      val expected = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
      var s = sorted.head; var e = sorted.head; var c = 1L
      sorted.tail.foreach { t =>
        if (t - e <= gap) { e = t; c += 1 }
        else { expected += ((s, e, c)); s = t; e = t; c = 1L }
      }
      expected += ((s, e, c))
      // mergeRuns over three different arrival orders must all agree
      val orders = Seq(events.toSeq, events.sorted.toSeq, events.sorted.reverse.toSeq)
      for (order <- orders) {
        val got = Streams.mergeRuns(order.iterator, gap)
          .map { case (fs, (fe, fn)) => (fs, fe, fn) }.toList
        assert(got == expected.toList,
          s"trial $trial gap $gap order mismatch:\n got $got\n exp $expected")
      }
    }
  }

  test("mergeRuns: memory is O(#sessions), not O(#events), on a hot-user backfill") {
    // 100k events forming 10 sessions, arriving as interleaved sorted runs
    // (the post-shuffle shape): the fragment map must stay tiny throughout
    val gap = 100L
    val runs = (0 until 4).map { r =>
      (0 until 25000).map(i => (i / 2500) * 100000L + (i % 2500) * 4 + r)
    }
    val interleaved = (0 until 25000).flatMap(i => runs.map(_(i)))
    val frags = Streams.mergeRuns(interleaved.iterator, gap)
    assert(frags.size == 10, s"expected 10 sessions, got ${frags.size}")
    assert(frags.values.map(_._2).sum == 100000L, "every event must be counted")
  }

  test("dropDuplicatesWithinWatermark: in-horizon duplicate drops, post-eviction re-arrival emits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val q = input.toDF().toDF("k", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("k")
      .select(col("k"), unix_timestamp(col("ts")).as("epoch"))
      .writeStream.format("memory").queryName("dedup_bounded")
      .outputMode("append").start()
    try {
      input.addData(("a", ts(0)))                       // emits
      q.processAllAvailable()
      // duplicate within the horizon + a heartbeat that advances the
      // watermark far past a's expiry (eviction applies END of batch)
      input.addData(("a", ts(5)), ("hb", Timestamp.valueOf("2024-01-01 20:00:00")))
      q.processAllAvailable()
      input.addData(("hb2", Timestamp.valueOf("2024-01-01 20:01:00")))  // spacer: eviction runs
      q.processAllAvailable()
      input.addData(("a", Timestamp.valueOf("2024-01-01 23:00:00")))    // re-emits
      q.processAllAvailable()
      val rows = spark.table("dedup_bounded").as[(String, Long)].collect().toSet
      val t0 = ts(0).getTime / 1000
      val tLate = Timestamp.valueOf("2024-01-01 23:00:00").getTime / 1000
      assert(rows.filter(_._1 == "a") == Set(("a", t0), ("a", tLate)),
        s"horizon semantics violated: $rows")
    } finally q.stop()
  }

  test("native session_window flushes final sessions once the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("user_id", "ts")
    val q = Streams.sessionWindows(events, "10 minutes")
      .writeStream.format("memory").queryName("native_sessions")
      .outputMode("append").start()
    try {
      input.addData((1L, ts(0)), (1L, ts(5)), (2L, ts(3)))
      q.processAllAvailable()
      // heartbeat far past every session's close boundary — the backfill
      // flush trick st03 uses: all sessions emit WITHOUT successor events
      input.addData((-1L, ts(30)))
      q.processAllAvailable()
      val rows = spark.table("native_sessions")
        .filter(col("user_id") >= 0)
        .select(col("user_id"), col("n_events"), col("duration_sec")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set((1L, 2L, 300L), (2L, 1L, 0L)), s"got $rows")
    } finally q.stop()
  }

  test("st06 stream-static enrichment equals the batch join+window") {
    import org.apache.spark.sql.functions._
    val streamed = Streams.streamedEnriched(spark, sfDir)
      .select("day", "c_mktsegment", "n_events", "sum_value")
    // batch equivalent on the same fixtures (stream-static joins are
    // stateless, so a drained AvailableNow stream must agree exactly)
    val events = graft.core.Tables.events(spark, sfDir)
    val dim = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val batch = events.join(dim, col("user_id") === col("c_custkey"))
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
               col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "stream and batch enrichment disagree")
  }

  test("st09 left-outer interval join: inner pairs preserved, real null-extended rows, watermark gate honored") {
    val outer = graft.streaming.Streams.streamedAttributionOuter(spark, sfDir).collect()
    val inner = graft.streaming.Streams.streamedAttribution(spark, sfDir)
      .select("click_id", "purch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val outerPairs = outer.filter(!_.isNullAt(2))
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(outerPairs == inner,
      s"outer join's matched pairs must equal the inner join (${outerPairs.size} vs ${inner.size})")
    val nullRows = outer.count(_.isNullAt(2))
    assert(nullRows > 0, "degenerate fixture: every click converted — no outer rows to prove")
    // null-extended clicks must be unique (one emission per evicted click)
    val nullIds = outer.filter(_.isNullAt(2)).map(_.getLong(0))
    assert(nullIds.length == nullIds.distinct.length, "an unmatched click emitted twice")
    assert(nullIds.toSet.intersect(outerPairs.map(_._1)).isEmpty,
      "a click emitted both matched and null-extended")
  }

  test("stateful dedup restores state from a checkpoint across query restarts") {
    // exactly-once across restart: run 1 dedups {A,B}; run 2 (NEW query
    // object, SAME checkpoint) sees {B,C} and must emit only C — proving
    // the dropDuplicates state store was restored, not rebuilt. Without
    // the checkpoint, B would re-emit and the final count would be 4.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Files.createTempDirectory("graft_ckpt_").toString
    val srcDir = s"$base/src"; Files.createDirectories(Paths.get(srcDir))
    val outDir = s"$base/out"; val ckpt = s"$base/state"
    def stage(fps: Seq[String], idx: Int): Unit = {
      import spark.implicits._
      val tmp = s"$base/stage_$idx"
      fps.toDF("fp").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, Paths.get(srcDir, f"f$idx%02d.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    def drain(): Unit = {
      val q = spark.readStream.schema("fp STRING").parquet(srcDir)
        .dropDuplicates("fp")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    stage(Seq("A", "B"), 0)
    drain()
    assert(spark.read.parquet(outDir).count() == 2)
    stage(Seq("B", "C"), 1)
    drain()                                   // fresh query, same checkpoint
    val rows = spark.read.parquet(outDir).select("fp")
      .as[String](org.apache.spark.sql.Encoders.STRING).collect().sorted.toSeq
    assert(rows == Seq("A", "B", "C"),
      s"expected exactly-once {A,B,C}, got $rows")
  }

  test("st10 resume: the second AvailableNow run inputs ONLY the new generation") {
    // source-offset half of exactly-once (the test above covers state
    // restore): after a completed drain, a resumed run's input row count
    // must equal the newly staged generation — not the whole directory.
    import org.apache.spark.sql.streaming.Trigger
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import spark.implicits._
    val base = Files.createTempDirectory("graft_resume_").toString
    val srcDir = s"$base/src"; Files.createDirectories(Paths.get(srcDir))
    val outDir = s"$base/out"; val ckpt = s"$base/state"
    def stage(n: Int, idx: Int): Unit = {
      val tmp = s"$base/stage_$idx"
      (0 until n).map(i => idx * 100 + i).toDF("v")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, Paths.get(srcDir, f"f$idx%02d.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    def drain(): Long = {
      val q = spark.readStream.schema("v INT").parquet(srcDir)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      q.recentProgress.map(_.numInputRows).sum
    }
    stage(5, 0)
    assert(drain() == 5L)
    stage(3, 1)
    val second = drain()
    assert(second == 3L, s"resumed run re-read old files: input rows $second, want 3")
    assert(spark.read.parquet(outDir).count() == 8L)
  }

  test("st11 transformWithState: ValueState carries across micro-batches") {
    import org.apache.spark.sql.functions._
    val got = Streams.streamedTransformState(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val expect = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, a) =>
        u -> ((a.length.toLong, a.map(_._2).sum, a.map(_._2).max)) }
    assert(got == expect, "final state must equal the all-history aggregate")
    // the parity split puts both halves of at least one user's history in
    // different batches — if state did NOT carry over, that user's final
    // n would equal only its second-batch count and the totals would
    // disagree with the batch oracle above; additionally the restored
    // provider conf must not leak RocksDB into later entries
    assert(spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .forall(!_.contains("RocksDB")), "provider conf leaked")
  }

  test("st12 sliding windows: every event lands in exactly two 2-day windows") {
    import org.apache.spark.sql.functions._
    val got = Streams.streamedSlidingCounts(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val evs = graft.core.Tables.events(spark, sfDir)
      .select(unix_timestamp(col("ts")).as("t"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expect = evs.flatMap { case (t, et) =>
      val d = t / 86400 * 86400
      Seq((d, et), (d - 86400, et))
    }.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    assert(got == expect, "window expansion must duplicate each event into 2 windows")
    // total window-rows = 2 × events: the slide-ratio state-cost identity
    assert(got.values.sum == 2L * evs.length)
  }

  test("st13 blob stream: profile equals the closed-form decode of every staged asset") {
    val row = Streams.streamedBlobIngest(spark, sfDir).collect().head
    val expected = (0L until 30L).map { i =>
      def byteAt(t: Long): Long = ((i * 64 + t) * 1103515245L + 99L) % 2147483647L % 256L
      (i, byteAt(0) * 256 + byteAt(1), byteAt(2) * 256 + byteAt(3), 64 + i % 32)
    }
    assert(row.getLong(0) == 30L, "all three 10-file micro-batches must reach the sink")
    assert(row.getLong(1) == expected.map(_._1).sum)
    assert(row.getLong(2) == expected.map(_._2).sum, "width decode")
    assert(row.getLong(3) == expected.map(_._3).sum, "height decode")
    assert(row.getLong(4) == expected.map(_._4).sum, "byte lengths")
  }
}
