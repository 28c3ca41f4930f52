package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/**
 * Per-user session counting — the custom-state streaming surface
 * (`KeyValueGroupedDataset.mapGroupsWithState`). A session = consecutive
 * events of one user with inter-event gaps ≤ `gapUs`. The streaming state
 * carries (last event time, sessions so far, events so far) per user and
 * must converge, over any micro-batch slicing, to exactly the batch
 * window-function computation (`sessionsBatch`) — proven in SessionizeSpec.
 */
object Sessionize {
  final case class EventIn(user_id: Long, ts_us: Long)
  final case class UserSessions(user_id: Long, n_events: Long, n_sessions: Long, last_ts_us: Long)
  final case class SessionState(lastTs: Long, nSessions: Long, nEvents: Long, maxTs: Long)

  val DefaultGapUs: Long = 30L * 60 * 1000000 // 30 min

  /** Per-micro-batch state update. Events are sorted WITHIN the batch;
    * across batches the contract is chronological arrival per user (the
    * kafka-partition-per-key regime) — only then does the stream converge
    * exactly to `sessionsBatch` over any micro-batch slicing (SessionizeSpec).
    * A late cross-batch event (ts < state.lastTs) cannot be re-ordered
    * retroactively without keeping every timestamp in state; the policy here
    * is the standard monotone one: it counts toward the CURRENT session
    * (a non-positive gap never opens a session) and never moves `lastTs`
    * backwards, so one straggler can't corrupt subsequent gap decisions. */
  def updateState(gapUs: Long)(
      userId: Long, events: Iterator[EventIn], state: GroupState[SessionState]): UserSessions = {
    val sorted = events.toArray.sortBy(_.ts_us)
    var s = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L, Long.MinValue))
    sorted.foreach { e =>
      val newSession = s.lastTs == Long.MinValue || e.ts_us - s.lastTs > gapUs
      s = SessionState(math.max(s.lastTs, e.ts_us),
        s.nSessions + (if (newSession) 1 else 0), s.nEvents + 1,
        math.max(s.maxTs, e.ts_us))
    }
    state.update(s)
    UserSessions(userId, s.nEvents, s.nSessions, s.maxTs)
  }

  final case class UserSessionsLate(
      user_id: Long, n_events: Long, n_sessions: Long, last_ts_us: Long, n_late_dropped: Long)
  final case class LateState(inner: SessionState, nDropped: Long)

  /** Watermark-style bounded-lateness policy: an event older than the
    * user's event-time high-water mark minus `latenessUs` is DROPPED —
    * never silently (the drop count rides in the state and every emitted
    * row), mirroring the engine-level `withWatermark` contract for the
    * custom-state path where Spark cannot apply it for us. Events inside
    * the lateness window still follow the monotone policy of
    * `updateState` (they join the current session, `lastTs` never moves
    * backwards). */
  def updateStateLate(gapUs: Long, latenessUs: Long)(
      userId: Long, events: Iterator[EventIn], state: GroupState[LateState]): UserSessionsLate = {
    val sorted = events.toArray.sortBy(_.ts_us)
    var s = state.getOption.getOrElse(
      LateState(SessionState(Long.MinValue, 0L, 0L, Long.MinValue), 0L))
    sorted.foreach { e =>
      val watermark = if (s.inner.maxTs == Long.MinValue) Long.MinValue else s.inner.maxTs - latenessUs
      if (e.ts_us < watermark) {
        s = s.copy(nDropped = s.nDropped + 1)
      } else {
        val in = s.inner
        val newSession = in.lastTs == Long.MinValue || e.ts_us - in.lastTs > gapUs
        s = LateState(SessionState(math.max(in.lastTs, e.ts_us),
          in.nSessions + (if (newSession) 1 else 0), in.nEvents + 1,
          math.max(in.maxTs, e.ts_us)), s.nDropped)
      }
    }
    state.update(s)
    UserSessionsLate(userId, s.inner.nEvents, s.inner.nSessions, s.inner.maxTs, s.nDropped)
  }

  /** Streaming with the bounded-lateness drop policy. */
  def sessionsStreamLate(events: DataFrame, gapUs: Long = DefaultGapUs,
                         latenessUs: Long = DefaultGapUs)(
      implicit spark: SparkSession): Dataset[UserSessionsLate] = {
    import spark.implicits._
    events
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      .as[EventIn]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateStateLate(gapUs, latenessUs))
  }

  /** Streaming: per-user running session stats, updated every micro-batch.
    * The LAST emitted row per user is the converged answer. */
  def sessionsStream(events: DataFrame, gapUs: Long = DefaultGapUs)(
      implicit spark: SparkSession): Dataset[UserSessions] = {
    import spark.implicits._
    events
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      .as[EventIn]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateState(gapUs))
  }

  /** Batch oracle: the same sessions via lag + running sum windows. */
  def sessionsBatch(events: DataFrame, gapUs: Long = DefaultGapUs): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
    events
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      .withColumn("prev", lag(col("ts_us"), 1).over(w))
      .withColumn("new_session",
        when(col("prev").isNull || col("ts_us") - col("prev") > gapUs, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("new_session")).as("n_sessions"),
        max(col("ts_us")).as("last_ts_us"))
  }

  /** Run the stream over a parquet dir to completion; returns the final
    * per-user state (last update wins). */
  def runOnce(sourceDir: String, schema: org.apache.spark.sql.types.StructType,
              queryName: String, gapUs: Long = DefaultGapUs)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val src = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(sourceDir)
    val q = sessionsStream(src, gapUs).writeStream
      .format("memory").queryName(queryName)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // last update per user = converged state
    val w = Window.partitionBy(col("user_id")).orderBy(col("n_events").desc)
    spark.table(queryName)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("rn")
  }
}
