package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** One emitted user session (sessionization output). */
final case class UserSession(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long,
    total_value: Double)

/** One buffered entry in sessionization state: either a raw event
  * (n = 1, start = ts) or a FOLDED settled prefix of an open session
  * (n events summed into cents, spanning [start, ts]). Folding keeps
  * per-user state O(open sessions), not O(events): a continuously-active
  * user (heartbeat every minute, gap 30 min) never closes their session,
  * and buffering raw events would grow state without bound.
  */
private[streaming] final case class SessionEvent(
    ts: Long, cents: Long, n: Long, start: Long)

private[streaming] object SessionEvent {
  def raw(ts: Long, cents: Long): SessionEvent =
    SessionEvent(ts, cents, 1L, ts)
}

/** Per-user sessionization state: the not-yet-final entries, unordered. */
private[streaming] final case class SessionBuffer(events: List[SessionEvent])

/** Structured-Streaming surface over the driver's `events` stream table
  * (event_id, ts, user_id, event_type, value, props) — the engine's
  * incremental-ingest path. Design per the task brief: readStream ->
  * transforms -> writeStream, watermark + windowed aggregation, and
  * flatMapGroupsWithState for custom session state.
  *
  * The TRANSFORMS are plain DataFrame functions shared verbatim between
  * the batch and streaming plans (Catalyst compiles the same logical
  * plan either way), so the batch twins double as the correctness oracle:
  * q54/q55 run them on the batch table against DuckDB, and
  * EventStreamSpec asserts stream == batch on a file stream.
  */
object EventStream {

  val Schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based stream over an events parquet directory. */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(Schema).parquet(dir)

  /** Tumbling 10-minute windows per event type: counts + value sum.
    * Works on both batch and streaming inputs; streaming callers add
    * `.withWatermark("ts", ...)` upstream for append-mode emission.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // exact integer cents: float-sum order varies with partitioning
        // (and with DuckDB's parallel aggregation), so a double sum is not
        // cross-engine-stable; the value column is 2-decimal data
        (sum(floor(col("value") * 100 + 0.5).cast("long")) / 100.0)
          .as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Shared null contract for BOTH sessionize paths: the schema declares
    * user_id/ts/value nullable, and the streaming encoder `(Long,
    * Timestamp, Double)` would crash the query on the first null while
    * the batch twin's sum() silently skipped it — breaking stream==batch
    * in two different ways (round-5 review). Events without a user or
    * timestamp are non-sessionizable and dropped in both paths; a null
    * value keeps its event with a 0.0 contribution in both paths.
    */
  private def sessionizable(events: DataFrame): DataFrame =
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .withColumn("value", coalesce(col("value"), lit(0.0)))

  /** Batch sessionization twin (gaps-and-islands): a new session starts
    * when a user's inter-event gap exceeds `gapMinutes`. Scales as one
    * shuffle on user_id; the running session index is a per-user
    * cumulative sum (bounded partitions — users, not the whole table).
    * Value sums accumulate as exact integer cents (see windowedCounts).
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clean = sessionizable(events)
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    // exact microsecond gaps (unix_timestamp truncates to seconds, and
    // DuckDB's epoch() keeps fractions — only integer micros agree)
    // cast: the driver's parquet carries TIMESTAMP_NTZ; with the session
    // in UTC the cast is a pure type change
    val tsUs = (c: org.apache.spark.sql.Column) =>
      unix_micros(c.cast("timestamp"))
    val newSession = when(
      tsUs(col("ts")) -
        tsUs(lag(col("ts"), 1).over(byUser)) > gapMinutes * 60000000L ||
        lag(col("ts"), 1).over(byUser).isNull, 1L).otherwise(0L)
    clean
      .withColumn("ns", newSession)
      .withColumn("session_idx",
        sum(col("ns")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_idx")
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        (sum(floor(col("value") * 100 + 0.5).cast("long")) / 100.0)
          .as("total_value"))
      .drop("session_idx")
  }

  /** Streaming sessionization: per-user custom state via
    * flatMapGroupsWithState (event-time timeout). Events BUFFER in state
    * until the watermark passes `session_end + gap` — only then is a
    * session final, because any in-watermark straggler with a timestamp
    * inside the gap window could still extend or bridge it. Emission
    * therefore matches [[sessionizeBatch]] for ANY per-user arrival order
    * of in-watermark data, not just in-order arrival (ADVICE r03: the
    * previous inline emission produced overlapping sessions when a late
    * event landed after its session was emitted). Per-user state is
    * COMPACTED, not a raw buffer: each open session's settled prefix
    * (entries the watermark can no longer touch) folds into one aggregate
    * entry, so state is O(open sessions + in-horizon tail) even for a
    * continuously-active user whose session never closes (see
    * [[advanceSessions]]).
    */
  def sessionize(
      spark: SparkSession,
      events: DataFrame,
      gapMinutes: Int = 30,
      watermarkDelay: String = "1 minute"): Dataset[UserSession] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L
    def microsOf(ts: Timestamp): Long =
      (ts.getTime / 1000) * 1000000L + ts.getNanos / 1000
    def tsOf(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000)
      t.setNanos((us % 1000000L).toInt * 1000)
      t
    }
    sessionizable(events)
      .withWatermark("ts", watermarkDelay)
      .selectExpr("user_id", "ts", "value")
      .as[(Long, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionBuffer, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, it, state: GroupState[SessionBuffer]) =>
          val incoming = it.map(e => SessionEvent.raw(microsOf(e._2),
            math.floor(e._3 * 100 + 0.5).toLong)).toList
          // watermark in micros; no event with ts < wm can arrive later
          // (Spark's late filter drops at least rows with ts < watermark),
          // so a session whose end + gap < wm can never be extended or
          // bridged — it is final. Strict inequality keeps this sound even
          // if rows at exactly ts == watermark are admitted (ADVICE r04).
          val wm = state.getCurrentWatermarkMs() * 1000L
          val (emit, keep) = advanceSessions(
            state.getOption.map(_.events).getOrElse(Nil), incoming, wm, gapUs)
          if (keep.isEmpty) state.remove()
          else {
            state.update(SessionBuffer(keep.flatten))
            // fire again when the earliest pending session can finalize
            // (min over kept sessions of last-entry ts + gap — using any
            // earlier ts would re-arm a timeout at or below the advanced
            // watermark, which Spark rejects). +1 ms: the micros->ms
            // truncation could otherwise land the timeout exactly ON the
            // current watermark (end + gap > wm by construction, but by
            // less than 1 ms); the extra millisecond only delays
            // emission, never changes session boundaries
            state.setTimeoutTimestamp(
              (keep.map(_.last.ts).min + gapUs) / 1000 + 1)
          }
          emit.iterator.map { s =>
            UserSession(user, tsOf(s.map(_.start).min), tsOf(s.last.ts),
              s.map(_.n).sum, s.map(_.cents).sum / 100.0)
          }
      }
  }

  /** One sessionization step, pure and unit-testable: merge buffered +
    * incoming entries, gap-split, emit the sessions the watermark has
    * finalized (end + gap < wm, strictly), and COMPACT each kept session's
    * settled prefix (entries with ts + gap < wm) into a single folded
    * entry.
    *
    * Compaction safety: a future event has ts >= wm (the conservative
    * reading of Spark's late filter), and a settled entry has
    * ts + gap < wm, so the future event is > gap away from every settled
    * entry — it can only attach to
    * the unsettled tail; and arriving events can only bridge or extend
    * sessions, never split one (inserting an event between two in-gap
    * neighbors keeps both distances within the gap). So folding the
    * settled prefix changes no future boundary decision, and the fold
    * aggregates (min start, sum n, sum cents, last ts) are exactly what
    * emission needs. State stays O(open sessions + unsettled tail), not
    * O(events).
    *
    * @return (sessions to emit, kept sessions) — both lists of
    *         time-sorted sessions; kept sessions are compacted
    */
  private[streaming] def advanceSessions(
      buffered: List[SessionEvent],
      incoming: List[SessionEvent],
      wmUs: Long,
      gapUs: Long): (List[List[SessionEvent]], List[List[SessionEvent]]) = {
    val merged = (buffered ++ incoming).sortBy(_.ts)
    val sessions = splitByGap(merged, gapUs)
    // STRICT inequality on both finality tests (ADVICE r04): whether
    // Spark's late filter drops rows at ts <= watermark or only ts <
    // watermark, an event exactly `gap` after a session's last entry
    // (ts == wm == last + gap) must still be able to extend it, so a
    // session is final only when last + gap < wm. Costs at most one
    // watermark tick of emission latency; never changes boundaries.
    val (emit, keep) = sessions.partition(s => s.last.ts + gapUs < wmUs)
    val compacted = keep.map { s =>
      val (settled, tail) = s.span(e => e.ts + gapUs < wmUs)
      if (settled.size <= 1) s
      else SessionEvent(settled.last.ts, settled.map(_.cents).sum,
        settled.map(_.n).sum, settled.map(_.start).min) :: tail
    }
    (emit, compacted)
  }

  /** Gaps-and-islands over time-sorted entries: a new session starts where
    * the inter-entry gap exceeds `gapUs` — the same boundary rule as the
    * batch twin's lag-window formulation.
    */
  private def splitByGap(
      sorted: List[SessionEvent], gapUs: Long): List[List[SessionEvent]] = {
    val out = scala.collection.mutable.ListBuffer.empty[List[SessionEvent]]
    val cur = scala.collection.mutable.ListBuffer.empty[SessionEvent]
    var lastTs = Long.MinValue
    sorted.foreach { e =>
      if (cur.nonEmpty && e.ts - lastTs > gapUs) { out += cur.toList; cur.clear() }
      cur += e
      lastTs = e.ts
    }
    if (cur.nonEmpty) out += cur.toList
    out.toList
  }

}
