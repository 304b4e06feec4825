package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured-streaming ingestion: the same transformation function serves the
  * batch oracle query and the streaming job (write-once semantics — the
  * streaming pipeline is the batch pipeline with a watermark).
  */
object EventsStream {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Shared window-agg body (tumbling and sliding differ only in the window
    * expression): counts + integer-cent sums so the DuckDB oracle is
    * fp-exact. Works on both batch and streaming frames (`withWatermark` is
    * a no-op in batch).
    */
  private def windowAgg(events: DataFrame, win: org.apache.spark.sql.Column): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(win, col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("window.start").cast("timestamp").cast("long").as("window_s"),
              col("event_type"), col("n"), col("value_cents"))

  /** 5-minute tumbling windows per event type. */
  def windowedCounts(events: DataFrame): DataFrame =
    windowAgg(events, window(col("ts"), "5 minutes"))

  val windowedCountsSql: String =
    """SELECT (epoch_us(ts) // 300000000) * 300 AS window_s, event_type,
      | count(*) AS n, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
      | FROM events GROUP BY 1, 2""".stripMargin.replace("\n", "")

  /** 10-minute windows sliding every 5: each event lands in exactly two
    * windows (the tumbling assignment and the one 5 minutes earlier) — the
    * overlapping-window flavor of [[windowedCounts]], same batch/stream
    * duality.
    */
  def slidingCounts(events: DataFrame): DataFrame =
    windowAgg(events, window(col("ts"), "10 minutes", "5 minutes"))

  /** DuckDB oracle: replicate each event into its two window starts. */
  val slidingCountsSql: String =
    """SELECT ws AS window_s, event_type, count(*) AS n,
      | CAST(sum(cents) AS BIGINT) AS value_cents FROM (
      |  SELECT (epoch_us(ts) // 300000000) * 300 AS ws, event_type,
      |         CAST(round(value * 100) AS BIGINT) AS cents FROM events
      |  UNION ALL
      |  SELECT (epoch_us(ts) // 300000000) * 300 - 300, event_type,
      |         CAST(round(value * 100) AS BIGINT) FROM events
      |) GROUP BY 1, 2""".stripMargin.replace("\n", "")

  /** Per-user sessionization with a custom state machine
    * (`flatMapGroupsWithState`): emits a session row when a user is idle
    * longer than `gapMinutes`. The stateful-streaming surface of the engine.
    *
    * `flushOpen` (batch/final-drain use only): also emit each user's trailing
    * open session instead of parking it in state — in a batch run the state
    * dies with the job, so without the flush the last session per user is
    * silently dropped. A live stream keeps `flushOpen = false` (the open
    * session must wait for its closing gap).
    *
    * `evictAtWatermark` (streaming use): without it, every idle user parks
    * one open-session tuple in state FOREVER — unbounded state growth in a
    * long-running stream. With it, the events get a `watermarkDelay` event-
    * time watermark and the state machine runs under `EventTimeTimeout`,
    * holding each user's pending sessions ("islands") in state until the
    * watermark passes a session's close (end + gap): only then can no
    * admissible event extend OR bridge it, so it is EMITTED and dropped from
    * state. Because closed-in-batch islands are also held until their close
    * passes the watermark (not emitted eagerly, as the r5 version did), an
    * admissible out-of-order event can still merge two islands a purely
    * forward reading would have split — session output is identical to the
    * batch semantics for every event the watermark admits, at the standard
    * cost of emission latency = watermarkDelay + gap. Sub-watermark
    * stragglers (which the watermark contract already excludes) are the only
    * divergence. Batch runs keep `NoTimeout` and the eager forward-only
    * emission (timeouts never fire in batch, and batch execution strips the
    * watermark node — use `flushOpen` there).
    *
    * State-schema note: the island-list state (`Seq[(start, end, n)]`) is not
    * checkpoint-compatible with the pre-r6 single-tuple state — a stream
    * upgraded across that change must restart from a fresh checkpoint.
    */
  final case class Session(user_id: Long, start_s: Long, end_s: Long, n_events: Long)

  def sessionize(spark: SparkSession, events: DataFrame, gapMinutes: Int = 30,
                 flushOpen: Boolean = false, evictAtWatermark: Boolean = false,
                 watermarkDelay: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupState
    import org.apache.spark.sql.streaming.GroupStateTimeout
    // batch execution eliminates the EventTimeWatermark node, so
    // getCurrentWatermarkMs() below would throw at runtime — fail fast with
    // the actionable combination instead (r6 advice): batch callers flush
    // with flushOpen, streams may evict
    require(events.isStreaming || !evictAtWatermark,
      "sessionize(evictAtWatermark = true) requires a streaming frame; " +
        "batch frames must use flushOpen = true instead")
    val src = if (evictAtWatermark) events.withWatermark("ts", watermarkDelay) else events
    // keep the raw ts column alongside the long view: the watermark metadata
    // rides the ts ATTRIBUTE, and flatMapGroupsWithState's event-time timeout
    // needs a watermarked column in its child output (a cast produces a new
    // attribute without the metadata)
    val typed = src
      .select(col("user_id"), col("ts").cast("timestamp").cast("long").as("ts_s"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
    val timeoutConf =
      if (evictAtWatermark) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    val gapS = gapMinutes * 60L
    // state = the user's pending islands (start, end, n), ascending, pairwise
    // separated by > gap. Merging new events via interval-fold (instead of
    // the r5 single-open-session fold) makes admissible OUT-OF-ORDER events
    // exact: an event between two islands bridges them; an event inside one
    // extends min(start)/max(end) — the r5 fold regressed `end = t` for
    // t < end, mis-splitting later batches.
    def mergeIslands(old: Seq[(Long, Long, Long)],
                     evs: Array[Long]): Seq[(Long, Long, Long)] = {
      val ivs = (old ++ evs.map(t => (t, t, 1L))).sortBy(iv => (iv._1, iv._2))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      ivs.foreach { iv =>
        if (out.isEmpty || iv._1 - out.last._2 > gapS) out += iv
        else out(out.length - 1) =
          (out.last._1, math.max(out.last._2, iv._2), out.last._3 + iv._3)
      }
      out.toSeq
    }
    typed.groupByKey(_._1).flatMapGroupsWithState[Seq[(Long, Long, Long)], Session](
      OutputMode.Append, timeoutConf) {
      (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
       state: GroupState[Seq[(Long, Long, Long)]]) =>
        // emit every island whose close fell behind the watermark (no
        // admissible event can extend or bridge it any more); park the rest
        // with the timeout at the earliest surviving close
        def evict(islands: Seq[(Long, Long, Long)]): Iterator[Session] = {
          val wmMs = state.getCurrentWatermarkMs()
          // ripe = no admissible (>= watermark) event can still extend the
          // island. Event times truncate ms → s, so the LAST extending ms
          // timestamp is (end + gap)*1000 + 999; evict only once the
          // watermark has passed the whole second, not its first ms —
          // (end+gap)*1000 < wm admits ts=(end+gap)*1000+500 (>= wm) whose
          // ts_s still merges in batch semantics, splitting the session.
          val (ripe, live) = islands.partition(iv => (iv._2 + gapS + 1) * 1000L <= wmMs)
          if (live.isEmpty) state.remove()
          else {
            state.update(live)
            state.setTimeoutTimestamp((live.head._2 + gapS) * 1000L + 1000L)
          }
          ripe.iterator.map(iv => Session(user, iv._1, iv._2, iv._3))
        }
        if (state.hasTimedOut) evict(state.get)
        else {
          val islands = mergeIslands(state.getOption.getOrElse(Nil),
            rows.map(_._2).toArray.sorted)
          if (flushOpen) { // batch/final drain: everything out, nothing parked
            if (state.exists) state.remove()
            islands.iterator.map(iv => Session(user, iv._1, iv._2, iv._3))
          } else if (evictAtWatermark) evict(islands)
          else {
            // legacy forward-only streaming (no watermark): emit islands
            // closed by a later in-batch event, park the last one
            if (islands.nonEmpty) state.update(Seq(islands.last))
            islands.dropRight(1).iterator.map(iv => Session(user, iv._1, iv._2, iv._3))
          }
        }
    }.toDF()
  }

  /** DuckDB gaps-and-islands oracle for [[sessionize]] with `flushOpen`
    * (batch semantics — ALL sessions, trailing ones included): a session
    * break is a per-user gap > `gapMinutes`; the running sum of breaks is
    * the island id. Ties on `ts_s` are gap-0 rows, so they land in the same
    * island regardless of the window's order among them.
    */
  def sessionsSql(gapMinutes: Int): String =
    s"""WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS ts_s FROM events),
       |d AS (SELECT user_id, ts_s,
       |  CASE WHEN lag(ts_s) OVER w IS NULL
       |       OR ts_s - lag(ts_s) OVER w > ${gapMinutes * 60} THEN 1 ELSE 0 END AS brk
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s)),
       |g AS (SELECT user_id, ts_s,
       |  sum(brk) OVER (PARTITION BY user_id ORDER BY ts_s ROWS UNBOUNDED PRECEDING) AS grp
       |  FROM d)
       |SELECT user_id, CAST(min(ts_s) AS BIGINT) AS start_s,
       |  CAST(max(ts_s) AS BIGINT) AS end_s, count(*) AS n_events
       |FROM g GROUP BY user_id, grp""".stripMargin.replace("\n", " ")

  /** File-source streaming read of an events directory (parquet). */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema).parquet(dir)

  def startMemorySink(df: DataFrame, name: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream.outputMode(OutputMode.Complete()).format("memory")
      .queryName(name).trigger(Trigger.AvailableNow()).start()
}
