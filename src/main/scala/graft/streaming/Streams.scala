package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface — SURVEY.md §2.B6 stretch capability
  * (the reference has no streaming subsystem; its closest constructs are
  * iterative jobs + Redis pub/sub control channels). These operators are
  * the streaming forms of the batch event pipeline (q17), built the
  * Spark-native way: event-time watermarks + tumbling windows, and
  * `mapGroupsWithState` for custom per-key state.
  *
  * Works identically on a `readStream` source (kafka/files at scale) or
  * a MemoryStream in tests — the plan is source-agnostic.
  */
object Streams {

  /** Tumbling-window per-type counts with an event-time watermark: late
    * events beyond `watermarkDelay` are dropped, state for closed
    * windows is evicted — bounded state at any stream length. */
  def windowedCounts(events: DataFrame,
                     windowDur: String = "1 day",
                     watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
              col("n_events"), col("sum_value"))

  final case class UserState(nEvents: Long, totalValue: Double)
  final case class UserUpdate(userId: Long, nEvents: Long, totalValue: Double)

  /** Custom keyed state via mapGroupsWithState: a running per-user
    * profile that survives across micro-batches. Pass an idle timeout to
    * evict inactive users (bounded state at unbounded key cardinality);
    * note a processing-time timeout makes Spark schedule wake-up batches
    * continuously, so tests use idleTimeoutMs = None. */
  def runningUserProfiles(events: Dataset[(Long, Double)],
                          idleTimeoutMs: Option[Long] = Some(3600000L)): Dataset[UserUpdate] = {
    import events.sparkSession.implicits._
    val timeoutConf = if (idleTimeoutMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    events.groupByKey(_._1)
      .mapGroupsWithState[UserState, UserUpdate](timeoutConf) {
        (userId: Long, batch: Iterator[(Long, Double)], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            UserUpdate(userId, st.nEvents, st.totalValue)
          } else {
            val prev = state.getOption.getOrElse(UserState(0L, 0.0))
            var n = prev.nEvents; var tot = prev.totalValue
            batch.foreach { case (_, v) => n += 1; tot += v }
            val next = UserState(n, tot)
            state.update(next)
            idleTimeoutMs.foreach(state.setTimeoutDuration)
            UserUpdate(userId, n, tot)
          }
      }
  }

  /** Streaming append-mode output mode used by the window pipeline. */
  val AppendMode: OutputMode = OutputMode.Append()
}
