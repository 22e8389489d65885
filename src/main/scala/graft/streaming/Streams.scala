package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession, functions => F}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming operators — the streaming face of the batch event
  * queries (ExtQueries x13/x14). The verb/expression layer is
  * source-agnostic, so these compose `readStream` sources with the same
  * transforms; state is bounded by watermarks / GroupState timeouts.
  */
object Streams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class UserSessionStats(user_id: Long, n_events: Long, n_sessions: Long)
  final case class SessionState(lastTsMicros: Long, nEvents: Long, nSessions: Long)

  implicit val eventEnc: Encoder[Event] = Encoders.product[Event]
  implicit val statsEnc: Encoder[UserSessionStats] = Encoders.product[UserSessionStats]
  implicit val stateEnc: Encoder[SessionState] = Encoders.product[SessionState]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Streaming source over a parquet directory of events. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Tumbling-window counts + value sums with a watermark bounding state:
    * late data beyond 10 minutes is dropped, windows older than the
    * watermark are evicted — state stays O(active windows), not O(stream).
    */
  def windowedCounts(events: DataFrame,
      window: String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(F.window(F.col("ts"), window), F.col("event_type"))
      .agg(F.count(F.lit(1)).as("n"),
        F.sum(F.col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("total_value"))
      .select(F.col("window.start").as("window_start"), F.col("event_type"),
        F.col("n"), F.col("total_value"))

  /** Stateful sessionization via mapGroupsWithState: per user, counts
    * events and `gap`-separated sessions across triggers. State is ONE
    * small record per ACTIVE user, bounded by an event-time timeout: a
    * user idle past the session gap (relative to the watermark) emits a
    * final row and is evicted, so state is O(users active within the
    * watermark horizon), never O(users ever seen). */
  def sessionStats(events: Dataset[Event],
      gapMicros: Long = 1800000000L,
      watermark: String = "30 minutes"): Dataset[UserSessionStats] =
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserSessionStats](
        GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // idle past the gap: emit the final stats and evict the state
            val st = state.get
            state.remove()
            UserSessionStats(userId, st.nEvents, st.nSessions)
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
            sorted.foreach { e =>
              val us = e.ts.getTime * 1000L
              val newSession = st.lastTsMicros == Long.MinValue || us - st.lastTsMicros > gapMicros
              st = SessionState(us, st.nEvents + 1,
                st.nSessions + (if (newSession) 1 else 0))
            }
            state.update(st)
            // evict once the watermark passes last-event + gap
            state.setTimeoutTimestamp(st.lastTsMicros / 1000L + gapMicros / 1000L)
            UserSessionStats(userId, st.nEvents, st.nSessions)
          }
      }

  /** NoTimeout variant — unbounded state, ONLY for bounded test/batch
    * replays where every user's history must stay addressable. */
  def sessionStatsUnbounded(events: Dataset[Event],
      gapMicros: Long = 1800000000L): Dataset[UserSessionStats] =
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserSessionStats](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val us = e.ts.getTime * 1000L
            val newSession = st.lastTsMicros == Long.MinValue || us - st.lastTsMicros > gapMicros
            st = SessionState(us, st.nEvents + 1,
              st.nSessions + (if (newSession) 1 else 0))
          }
          state.update(st)
          UserSessionStats(userId, st.nEvents, st.nSessions)
      }

  /** Streaming exact dedup: drops repeated ids within the watermark —
    * state is bounded by the watermark horizon, the streaming face of
    * batch exact dedup. */
  def dedupeStream(events: DataFrame, idCol: String,
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Stream-static enrichment: join each micro-batch against a static
    * dimension (user → segment, url → domain reputation, …). The static
    * side is broadcast per micro-batch — no stream-side shuffle, no
    * state; left join so unmatched stream rows pass through (enrichment
    * must never drop events). */
  def enrichStream(events: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    events.join(F.broadcast(dim), Seq(key), "left")

  /** Streaming PII scrub — stateless projection, composes with any
    * downstream windowed aggregation. */
  def scrubStream(events: DataFrame, textCol: String): DataFrame =
    events.withColumn(textCol,
      graft.functions.text.redactPii(F.col(textCol)))

  /** Drive a stream synchronously to a memory sink (testing/smoke). */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
  }
}
