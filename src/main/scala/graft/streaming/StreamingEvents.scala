package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the event-log analytics — the same
  * semantics as the batch queries in [[graft.queries.EventsQ]]
  * (StreamingEventsSpec proves batch/stream parity on one fixture).
  *
  * Scale design: both operators keyed-shuffle once (window+type /
  * user_id) and keep bounded per-key state; the watermark bounds state
  * retention, so the plans run indefinitely on an unbounded stream.
  * Feed them `spark.readStream` (file/kafka source) in production;
  * specs drive them with MemoryStream.
  */
object StreamingEvents {

  /** One event row (events table schema, ts in epoch seconds). */
  final case class Ev(event_id: Long, user_id: Long, event_type: String,
                      ts_sec: Long, value: Double)

  /** Production entry: stream the events table from a parquet path via
    * the file source (`spark.readStream`) — new files under the path
    * become micro-batches. Matches [[graft.sources.Tables.events]]'s
    * read contract for every testdata generation: the physical `ts`
    * shape (int64 nanos vs timestamp[us]) is discovered from the files
    * already present (one driver-side footer peek — the file source
    * cannot infer schemas itself) and normalized by
    * [[graft.sources.Tables.normalizeTs]]. Later-arriving files must
    * match the discovered schema, which is the file source's standard
    * fixed-schema contract.
    */
  def readEventsStream(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val physical = spark.read.parquet(path).schema
    graft.sources.Tables.normalizeTs(spark.readStream.schema(physical).parquet(path))
  }

  /** One emitted session — mirrors q_events_sessionize's output. */
  final case class Session(user_id: Long, session_id: Long, n_events: Long,
                           session_start_sec: Long, session_end_sec: Long)

  /** Per-user open-session state: ordinal of the next session, plus
    * the open session's bounds/count.
    */
  final case class UserSessions(nextOrdinal: Long, startSec: Long,
                                endSec: Long, n: Long)

  /** Streaming form of q_events_anomaly — the train-batch /
    * score-stream deployment: per-type stats come from a BATCH pass
    * (EventsQ.anomalyStats; exact global stats cannot be known inside
    * an unbounded stream) and broadcast onto the live stream, which
    * scores and filters STATELESSLY — no watermark, no state store, no
    * shuffle; each event is scored the moment it arrives with the
    * identical z expression the batch query uses (parity pinned in
    * StreamingEventsSpec). Periodic stats refresh = rerun the batch
    * aggregate and restart the query with the new broadcast.
    */
  def anomalyStream(events: DataFrame, stats: DataFrame,
                    threshold: Double = 3.0): DataFrame =
    events.join(broadcast(stats), "event_type")
      .withColumn("z", graft.queries.EventsQ.zScore)
      .filter(abs(col("z")) > threshold)
      .select(col("event_id"), col("event_type"), col("value"), col("z"))

  /** Streaming exact deduplication on a content key with bounded state:
    * `dropDuplicatesWithinWatermark` keeps each key's state only until
    * the watermark passes it — the streaming form of the batch
    * hash-groupBy dedup (q_doc_exact_dedup), and the standard
    * ingest-time guard against replayed/duplicated training records.
    * State is O(distinct keys within the watermark horizon), not
    * O(stream length).
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming tumbling 1-hour rollup (batch form: q_events_tumbling).
    * Watermarked so state for closed windows is dropped; append mode
    * emits each window exactly once when the watermark passes its end.
    */
  def tumblingCounts(events: DataFrame, watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(
        (unix_micros(col("window.start")) / lit(1000000L)).cast("long")
          .as("window_start_sec"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming MATERIALIZED running stats — the live view of
    * q_events_incremental_agg's merged state: per-type count, exact
    * decimal sum, min and max, maintained by the streaming
    * aggregation state store and re-emitted complete every batch.
    * Deliberately unwatermarked in COMPLETE mode: the state is
    * bounded by the KEY DOMAIN (≤ #event-types rows of moments),
    * not the stream's length, so there is nothing for a watermark to
    * evict — the same mergeable-moment algebra the batch query
    * proves against the oracle, running continuously.
    */
  def runningStats(events: DataFrame): DataFrame =
    events
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).as("sv"),
        min("value").as("min_value"), max("value").as("max_value"))
      .select(col("event_type"), col("n_events"),
        col("sv").cast("double").as("sum_value"),
        col("min_value"), col("max_value"))

  /** Streaming sessionization with a 30-minute idle gap — the same
    * session definition as the batch gaps-and-islands query
    * (q_events_sessionize), implemented as per-user state:
    *
    *   - events merge into the open session while gaps stay ≤ `gapSec`;
    *   - a larger gap closes the session (emitted immediately) and
    *     opens the next, advancing the per-user ordinal;
    *   - the event-time timeout (watermark > open session end + gap)
    *     flushes the final open session and clears state.
    *
    * State per user is O(1) — bounds and counters, never buffered
    * events — so skewed users cost nothing extra.
    */
  def sessionize(events: Dataset[Ev], gapSec: Long = 1800): Dataset[Session] = {
    import events.sparkSession.implicits._

    def flush(key: Long, rows: Iterator[Ev],
              state: GroupState[UserSessions]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(Session(key, s.nextOrdinal, s.n, s.startSec, s.endSec))
      } else {
        val sorted = rows.toIndexedSeq.sortBy(e => (e.ts_sec, e.event_id))
        var closed = List.empty[Session]
        var cur = state.getOption
        sorted.foreach { e =>
          cur match {
            case None =>
              cur = Some(UserSessions(1L, e.ts_sec, e.ts_sec, 1L))
            case Some(s) if e.ts_sec - s.endSec <= gapSec =>
              cur = Some(s.copy(endSec = e.ts_sec, n = s.n + 1))
            case Some(s) =>
              closed ::= Session(key, s.nextOrdinal, s.n, s.startSec, s.endSec)
              cur = Some(UserSessions(s.nextOrdinal + 1, e.ts_sec, e.ts_sec, 1L))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // flush the open session once the watermark passes its close
          state.setTimeoutTimestamp((s.endSec + gapSec + 1) * 1000L)
        }
        closed.reverseIterator
      }
    }

    events
      .withColumn("ts", timestamp_seconds(col("ts_sec")))
      .withWatermark("ts", "30 minutes")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout())(flush)
  }

  /** One hashed-user observation for the KMV sketch. */
  final case class KmvIn(day: Long, h: Long)
  /** KMV state: the bottom-k distinct 60-bit hashes seen for a day. */
  final case class KmvState(hashes: Seq[Long])
  /** Updated per-day sketch: current bottom-k size and the KMV
    * distinct-count estimate (exact below k).
    */
  final case class KmvOut(day: Long, n_sketch: Int, estimate: Double)

  /** Streaming per-day distinct-user KMV sketch — the incremental form
    * of the batch KMV machinery behind q_events_wau_sketch /
    * q_events_audience_overlap: per day, maintain the bottom-`k`
    * distinct 60-bit md5 user hashes and re-emit the day's estimate
    * every time a micro-batch touches it (Update output). Merging a
    * batch into the sketch is the KMV union — the same algebra the
    * batch queries replay — so after any prefix of the stream the
    * state equals the batch sketch over the events seen so far
    * (StreamingKmvSpec proves it).
    *
    * State is k longs per active day — O(days·k), microscopic — so no
    * timeout is wired by default; a production deploy retiring old
    * days would add an event-time timeout exactly as
    * [[debounceStream]] does. The hash expression is byte-identical
    * to the batch queries': sketches built here merge losslessly with
    * sketches built there.
    */
  def kmvDailyStream(events: DataFrame, k: Int = 64): Dataset[KmvOut] = {
    import events.sparkSession.implicits._

    def merge(day: Long, rows: Iterator[KmvIn],
              state: GroupState[KmvState]): Iterator[KmvOut] = {
      val prev = state.getOption.map(_.hashes).getOrElse(Seq.empty)
      val merged = (prev ++ rows.map(_.h)).distinct.sorted.take(k)
      state.update(KmvState(merged))
      val est =
        if (merged.size < k) merged.size.toDouble
        else (k - 1).toDouble * 1.152921504606846976e18 / merged.last.toDouble
      Iterator.single(KmvOut(day, merged.size, est))
    }

    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .select(
        expr("floor(floor(unix_micros(ts) / 1000000) / 86400)")
          .cast("long").as("day"),
        conv(substring(md5(col("user_id").cast("string").cast("binary")), 1, 15),
          16, 10).cast("long").as("h"))
      .as[KmvIn]
      .groupByKey(_.day)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout())(merge)
  }

  /** A debounced event row (event-time microseconds). */
  final case class DebEv(event_id: Long, user_id: Long, event_type: String,
                         ts_us: Long)
  /** Debounce state: the last SEEN event time per key — lag semantics,
    * matching the batch q_events_debounce (the gap is measured from
    * the previous event, kept or not).
    */
  final case class DebState(lastUs: Long)

  /** Streaming debounce — the streaming form of q_events_debounce:
    * per (user_id, event_type), an event is emitted iff it is the
    * key's first or ≥ `gapUs` after the PREVIOUS event of that key.
    * Batch parity holds under event-time-ordered arrival (each
    * micro-batch is sorted by event time before the state fold, so
    * intra-batch disorder is corrected; an event arriving in a LATER
    * batch than a successor — late data past the batch boundary — is
    * judged against the state as-of its arrival, the same contract as
    * dropDuplicatesWithinWatermark).
    *
    * State per key is O(1) (one timestamp), expired by event-time
    * timeout once the watermark passes `gapUs` beyond the last event —
    * after expiry the key's next event counts as a first again, which
    * is exactly what the batch lag test would conclude for a gap that
    * large. State is O(active keys within the horizon), never
    * O(stream length).
    */
  def debounceStream(events: DataFrame, gapUs: Long = 60000000L,
                     watermarkDelay: String = "30 minutes"): Dataset[DebEv] = {
    import events.sparkSession.implicits._

    def flush(key: (Long, String), rows: Iterator[DebEv],
              state: GroupState[DebState]): Iterator[DebEv] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val sorted = rows.toIndexedSeq.sortBy(e => (e.ts_us, e.event_id))
        var last = state.getOption.map(_.lastUs)
        val out = sorted.flatMap { e =>
          val keep = last.forall(l => e.ts_us - l >= gapUs)
          last = Some(e.ts_us)
          if (keep) Some(e) else None
        }
        last.foreach { l =>
          state.update(DebState(l))
          state.setTimeoutTimestamp(l / 1000L + gapUs / 1000L + 1L)
        }
        out.iterator
      }
    }

    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermarkDelay)
      // ts stays in the frame (not projected away): the event-time
      // timeout needs the watermarked column to reach the stateful op
      .withColumn("ts_us", unix_micros(col("ts")))
      .as[DebEv]
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout())(flush)
  }

  /** One SCD2 input event (ts pre-projected to integer microseconds). */
  final case class Scd2Ev(event_id: Long, user_id: Long, event_type: String,
                          ts_us: Long)

  /** One CLOSED dimension version (the streaming-emittable half of
    * q_events_scd2's output: append mode cannot retract, so the open
    * version lives in state until a change closes it).
    */
  final case class Scd2Out(user_id: Long, version: Int, event_type: String,
                           valid_from_us: Long, valid_to_us: Long)

  /** Per-user open version: ordinal, value, and interval start. */
  final case class Scd2State(version: Int, curType: String, validFromUs: Long)

  /** Streaming SCD TYPE-2 BUILD — the CDC-feed form of
    * q_events_scd2: per user, an attribute change CLOSES the open
    * version (emitted downstream immediately — the freshness win over
    * a batch rebuild) and opens the next; same-value events are
    * no-ops. Emitted rows are exactly the batch query's
    * is_current = false set (parity pinned in StreamingScd2Spec);
    * the open version per user is the state itself.
    *
    * Scale shape: state is O(users) with one tiny record each and —
    * unlike the session/debounce operators — legitimately permanent:
    * a dimension's current version never expires, which is inherent
    * to SCD2, not a leak (the state store holds exactly the live
    * dimension table). Arrival-order contract: within-batch disorder
    * is sorted out locally; cross-batch order must be event-time
    * monotone per user (the same contract the debounce stream
    * documents — a CDC source provides it by construction).
    */
  def scd2Stream(events: DataFrame): Dataset[Scd2Out] = {
    import events.sparkSession.implicits._

    def flush(user: Long, rows: Iterator[Scd2Ev],
              state: GroupState[Scd2State]): Iterator[Scd2Out] = {
      val sorted = rows.toIndexedSeq.sortBy(e => (e.ts_us, e.event_id))
      val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Out]
      var st = state.getOption
      sorted.foreach { e =>
        st match {
          case None =>
            st = Some(Scd2State(1, e.event_type, e.ts_us))
          case Some(s) if s.curType != e.event_type =>
            out += Scd2Out(user, s.version, s.curType, s.validFromUs, e.ts_us)
            st = Some(Scd2State(s.version + 1, e.event_type, e.ts_us))
          case _ => ()
        }
      }
      st.foreach(state.update)
      out.iterator
    }

    events
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      .select("event_id", "user_id", "event_type", "ts_us")
      .as[Scd2Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout())(flush)
  }

  /** Stream-stream view→click attribution join — the streaming form of
    * the batch q_events_attribution. Both sides are watermarked and the
    * join carries an event-time range (`c_ts ∈ [v_ts, v_ts + maxLag]`),
    * which is what lets Structured Streaming BOUND the join state: a
    * buffered view can be dropped once the click-side watermark passes
    * `v_ts + maxLag`, so state is O(events within the lag horizon), not
    * O(stream length). Inner-join rows emit as soon as both sides
    * arrive. Input: an event DataFrame with TimestampType `ts` (e.g.
    * [[readEventsStream]]); both join branches may derive from the same
    * source stream.
    */
  def attributionJoin(events: DataFrame,
                      viewType: String = "view", clickType: String = "click",
                      maxLag: String = "30 minutes",
                      watermarkDelay: String = "1 hour"): DataFrame = {
    val v = events.filter(col("event_type") === viewType)
      .select(col("event_id").as("view_event_id"),
        col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", watermarkDelay)
    val c = events.filter(col("event_type") === clickType)
      .select(col("event_id").as("click_event_id"),
        col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", watermarkDelay)
    v.join(c, col("v_user") === col("c_user") &&
        col("c_ts") >= col("v_ts") &&
        col("c_ts") <= col("v_ts") + expr(s"interval $maxLag"))
      .select(col("view_event_id"), col("click_event_id"),
        col("v_user").as("user_id"),
        expr("(unix_micros(c_ts) - unix_micros(v_ts)) div 1000000")
          .cast("long").as("lag_sec"))
  }

  /** One MAU/DAU delta row from the stickiness state algebra:
    * `mau_net` is a ±1 adjustment to the 28-day-active running sum at
    * `day`; `dau_net` is +1 when a (user, day) pair is first seen.
    */
  final case class StickDelta(day: Long, mau_net: Long, dau_net: Long)

  /** Per-user stickiness state: the OPEN activity span (in the batch
    * op's sense — day-gaps ≤ windowDays−1 merge) plus the recent
    * distinct days already emitted as DAU.
    */
  final case class StickState(spanStart: Long, spanMax: Long,
                              seenDays: Seq[Long])

  /** Streaming twin of q_events_stickiness's span-merge + delta sweep
    * (the round-10 follow-up to the round-9 batch rewrite): the batch
    * op merges each user's active days into spans [s, max+w−1] and
    * sweeps ±1 deltas at span edges; here the SAME delta algebra runs
    * incrementally — each arriving day emits only the adjustments that
    * reconcile the previously-emitted deltas with the user's new span
    * shape, so summing ALL emitted deltas at any point equals the
    * batch sweep over the events seen so far:
    *
    *   - open span:      +1 @ d,        −1 @ d+w
    *   - extend forward:  +1 @ oldMax+w (cancels the old close),
    *                      −1 @ newMax+w
    *   - extend backward: +1 @ d, −1 @ oldStart (moves the open)
    *   - gap > w−1:       a fresh span (the old close stands; spans
    *                      are half-open so an exactly-adjacent span
    *                      never double-counts)
    *
    * Deltas are additive, so corrections are just MORE rows — the
    * operator runs in Append mode with no retractions. Per-user state
    * is O(w): the open span bounds plus the trailing distinct-day set
    * (trimmed to 2w days) used for DAU first-seen dedup.
    *
    * CONTRACT (same bounded-disorder class as sessionize's watermark):
    * a user's days may arrive in any order within 2w−2 days of the
    * open span; a straggler older than that opens a standalone span,
    * which is exact unless the user ALSO had separate activity inside
    * that straggler's window — the out-of-contract case a production
    * deploy bounds with a watermark. Within one micro-batch, rows are
    * sorted before folding, so batch-delivered history is always exact
    * (StreamingSweepSpec proves batch parity and split-batch parity).
    */
  def stickinessDeltaStream(events: Dataset[Ev],
                            windowDays: Long = 28): Dataset[StickDelta] = {
    import events.sparkSession.implicits._
    val w = windowDays

    def flush(user: Long, rows: Iterator[Ev],
              state: GroupState[StickState]): Iterator[StickDelta] = {
      val days = rows.map(e => math.floorDiv(e.ts_sec, 86400L))
        .toIndexedSeq.distinct.sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[StickDelta]
      var st = state.getOption
      days.foreach { d =>
        val seen = st.exists(_.seenDays.contains(d))
        if (!seen) {
          out += StickDelta(d, 0L, 1L) // DAU first-seen
          st match {
            case None =>
              out += StickDelta(d, 1L, 0L)
              out += StickDelta(d + w, -1L, 0L)
              st = Some(StickState(d, d, Seq(d)))
            case Some(s0) =>
              var s2 = s0
              if (d > s0.spanMax && d <= s0.spanMax + (w - 1)) {
                out += StickDelta(s0.spanMax + w, 1L, 0L)
                out += StickDelta(d + w, -1L, 0L)
                s2 = s0.copy(spanMax = d)
              } else if (d > s0.spanMax + (w - 1)) {
                out += StickDelta(d, 1L, 0L)
                out += StickDelta(d + w, -1L, 0L)
                s2 = StickState(d, d, s0.seenDays)
              } else if (d < s0.spanStart && d >= s0.spanStart - (w - 1)) {
                out += StickDelta(d, 1L, 0L)
                out += StickDelta(s0.spanStart, -1L, 0L)
                s2 = s0.copy(spanStart = d)
              } else if (d < s0.spanStart - (w - 1)) {
                out += StickDelta(d, 1L, 0L)
                out += StickDelta(d + w, -1L, 0L)
              } // else: mid-span repeat day — DAU only
              st = Some(s2.copy(
                seenDays = (s2.seenDays :+ d).filter(_ >= s2.spanMax - 2 * w)))
          }
        }
      }
      st.foreach(state.update)
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout())(flush)
  }
}
