package graft.ops

import graft.{Det, QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-checkable analogs of the reference's streaming semantics
  * (SURVEY.md §2.1 R9–R16, §2.2 q31–q38): time windows, sessionization,
  * dedup, broadcast rules (the flagship), per-key running state, watermark
  * late-data, and pattern detection. The native Structured Streaming forms
  * of the same operators live in graft.streaming.Demos.
  */
object StreamingBatch {
  import Det._
  import Tables._

  val defs: Vector[(String, QDef)] = Vector(

    // Tumbling windows are epoch-aligned in Spark ⇒ identical to
    // date_trunc('hour') bucketing.
    "q31_tumbling_window" -> QDef(
      (s, d) =>
        events(s, d)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
          .select(col("window.start").as("hour_start"), col("event_type"), col("n_events"), col("sum_value"))
          .orderBy("hour_start", "event_type"),
      s"""SELECT date_trunc('hour', ts) AS hour_start, event_type,
         |       COUNT(*) AS n_events, ${sqlDsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ),

    // Sliding 1h/15min. Spark slide alignment is epoch-based (:00/:15/:30/
    // :45); the oracle expands each event into its exactly-4 covering
    // window starts (the :15-aligned bucket and the 3 slides before it) —
    // non-empty windows only, exactly what Spark emits, and derived purely
    // from the data (round-1 ADVICE: the previous generate_series oracle
    // hardcoded one fixture's date range).
    "q32_sliding_window" -> QDef(
      (s, d) =>
        events(s, d)
          .groupBy(window(col("ts"), "1 hour", "15 minutes"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("window.start").as("window_start"), col("n_events"))
          .orderBy("window_start"),
      """SELECT ws AS window_start, COUNT(*) AS n_events
        |FROM (SELECT date_trunc('hour', ts)
        |             + ((CAST(minute(ts) AS INT) // 15) * 15) * INTERVAL 1 MINUTE
        |             - k * INTERVAL 15 MINUTE AS ws
        |      FROM events CROSS JOIN range(0, 4) r(k)) w
        |GROUP BY ws ORDER BY ws""".stripMargin
    ),

    // Session windows, 30-min gap. Spark's session interval is
    // [start, last+gap) with exclusive end ⇒ a gap of exactly 30min starts
    // a NEW session ⇒ the islands oracle must use `>=`. We compare session
    // start + count, never end (Spark end = last+gap; SURVEY §2.2 q33).
    "q33_session_window" -> QDef(
      (s, d) =>
        events(s, d)
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"), col("session_window.start").as("session_start"), col("n_events"))
          .orderBy("user_id", "session_start"),
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin
    ),

    // Deterministic dedup: row_number()=1, NOT dropDuplicates (arbitrary
    // row choice). Streaming form: Demos.s3 (withWatermark+dropDuplicates).
    "q34_dedup" -> QDef(
      (s, d) => {
        val w = Window.partitionBy("user_id", "event_type").orderBy(col("ts"), col("event_id"))
        events(s, d)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select("user_id", "event_type", "event_id", "ts")
          .orderBy("user_id", "event_type")
      },
      """SELECT user_id, event_type, event_id, ts FROM (
        |  SELECT user_id, event_type, event_id, ts,
        |    row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin
    ),

    // FLAGSHIP — the broadcast-state pattern itself (R7+R8+R9 in batch
    // form): the low-volume rules "stream" is broadcast to every task and
    // each event is matched against it. BroadcastHashJoinExec, no shuffle
    // of the event side — the exact shape this runs at 100 TB.
    "q35_broadcast_rules" -> QDef(
      (s, d) =>
        events(s, d)
          .join(broadcast(rules(s)), Seq("event_type"))
          .where(col("value") >= col("threshold"))
          .select("event_id", "user_id", "event_type", "value", "threshold", "severity")
          .orderBy("event_id"),
      s"""${Tables.rulesCte}
         |SELECT event_id, user_id, e.event_type, value,
         |       CAST(threshold AS DOUBLE) AS threshold, severity
         |FROM events e JOIN rules r ON e.event_type = r.event_type
         |WHERE value >= threshold
         |ORDER BY event_id""".stripMargin
    ),

    // Per-key running state (ValueState analog): cumulative purchase total.
    "q36_stateful_running" -> QDef(
      (s, d) => {
        val w = Window
          .partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, d)
          .where(col("event_type") === "purchase")
          .withColumn("running_total", round(sum(col("value").cast(Det.D)).over(w), 4).cast("double"))
          .select("user_id", "event_id", "ts", "running_total")
          .orderBy("user_id", "event_id")
      },
      """SELECT user_id, event_id, ts,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING), 4) AS DOUBLE) AS running_total
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id, event_id""".stripMargin
    ),

    // Watermark / late-data analog (R12/R16). ts is monotone in event_id
    // (no natural out-of-orderness), so arrival order is simulated with the
    // deterministic permutation (event_id*7919)%104729 — pure integer math,
    // identical in both engines (SURVEY §2.2 q37). An event is "late" iff
    // it arrives >10min behind the running max event time (the watermark).
    // ORACLE-ONLY form: the global-order window is single-partition, kept
    // because DuckDB replays the identical SQL. The scale-safe batch form
    // is Scan.lateEventsScalable (distributed prefix-scan, bit-identical —
    // ScanSpec); the streaming-native form is Demos.s2.
    "q37_late_events" -> QDef(
      (s, d) => {
        val w = Window
          .orderBy((col("event_id") * 7919) % 104729, col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, d)
          .withColumn("wm", max(col("ts")).over(w))
          .withColumn("is_late", col("ts") < col("wm") - expr("INTERVAL 10 MINUTES"))
          .groupBy("event_type")
          .agg(
            sum(when(col("is_late"), 1L).otherwise(0L)).as("n_late"),
            count(lit(1)).as("n_total")
          )
          .orderBy("event_type")
      },
      """SELECT event_type,
        |  CAST(SUM(CASE WHEN is_late THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
        |  COUNT(*) AS n_total
        |FROM (
        |  SELECT event_type,
        |    ts < max(ts) OVER (ORDER BY (event_id * 7919) % 104729, event_id
        |                       ROWS UNBOUNDED PRECEDING) - INTERVAL 10 MINUTE AS is_late
        |  FROM events) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin
    ),

    // Pattern detection (Hueske broadcast-tutorial shape): consecutive
    // click → purchase per user. lag() is the batch form of the
    // ValueState[lastEvent] in KeyedBroadcastProcessFunction#processElement;
    // the streaming-native form is Demos.s4 (flatMapGroupsWithState).
    "q38_pattern_detect" -> QDef(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        events(s, d)
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .where(col("prev_type") === "click" && col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_matches"))
          .orderBy("user_id")
      },
      """SELECT user_id, COUNT(*) AS n_matches FROM (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events) t
        |WHERE prev_type = 'click' AND event_type = 'purchase'
        |GROUP BY user_id ORDER BY user_id""".stripMargin
    )
  )
}
