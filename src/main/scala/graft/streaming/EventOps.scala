package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Event-stream operators in their batch form (every one of these also
  * runs under Structured Streaming via `readStream` + watermark; the
  * reference has no streaming engine, its nearest analogue is the
  * versioned store + delta ops, `store/versioned.py` + `delta.py`).
  *
  * Scale notes: sessionization is one shuffle on user_id (window
  * functions over (user, time)); the delta op is a single full outer
  * join of two filtered aggregates; nothing materializes unbounded
  * state. Timestamps stay int64 nanos end-to-end (`ts_ns`) — no
  * timezone, no double rounding.
  */
object EventOps {

  val SessionGapNs: Long = 600L * 1000 * 1000 * 1000 // 10 min

  /** Gaps-and-islands sessionization: a session breaks after a 10-minute
    * silence. Classic lag + running-sum-of-breaks; the streaming twin is
    * mapGroupsWithState with a session timeout.
    */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("prev", lag(col("ts_ns"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev").isNull || col("ts_ns") - col("prev") > SessionGapNs,
          1L).otherwise(0L))
      .withColumn("session_no", sum(col("brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_ns")).as("start_ns"),
        max(col("ts_ns")).as("end_ns"),
        round(sum(col("value")), 4).as("sum_value"))
  }

  /** Per-user profile aggregate. */
  def userStats(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        round(sum(col("value")), 4).as("sum_value"),
        min(col("ts_ns")).as("first_ns"),
        max(col("ts_ns")).as("last_ns"))

  /** Ordered funnel completion (view → click → purchase), the classic
    * product-analytics sequence query: per user, the EARLIEST view,
    * the earliest click strictly after that view, and the earliest
    * purchase strictly after that click — each stage must follow the
    * previous stage's chosen event, not merely exist. Emits the stage
    * reached (1–3) and the view→purchase conversion time in whole
    * seconds for completers.
    *
    * Scale shape: three single-type aggregates chained by equi-joins
    * on user_id — each stage scans only its event type (predicate
    * pushdown on event_type), every shuffle is user-keyed and
    * stage-output-sized (≤ one row per user), no window over the raw
    * stream and no state beyond the per-user minima.
    */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts_ns"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_ns")).as("view_ns"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts_ns") > col("view_ns"))
      .groupBy(col("user_id")).agg(min(col("ts_ns")).as("click_ns"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts_ns") > col("click_ns"))
      .groupBy(col("user_id")).agg(min(col("ts_ns")).as("purchase_ns"))
    v.join(c, Seq("user_id"), "left_outer")
      .join(p, Seq("user_id"), "left_outer")
      .select(col("user_id"), col("view_ns"), col("click_ns"),
        col("purchase_ns"),
        when(col("purchase_ns").isNotNull, 3)
          .when(col("click_ns").isNotNull, 2)
          .otherwise(1).as("reached"),
        when(col("purchase_ns").isNotNull,
          expr("(purchase_ns - view_ns) div 1000000000"))
          .as("conv_secs"))
  }

  /** ADD/MOD/DEL change feed between two halves of the event window —
    * the reference's delta semantics (`delta.py:1-4`) computed as one
    * full outer join of per-entity aggregates.
    */
  def deltaOps(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    // 1-row broadcast bounds — integer floor division on both engines
    val bounds = ev.agg(expr("(min(ts_ns) + max(ts_ns)) div 2").as("mid"))
    def half(cmp: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
        org.apache.spark.sql.Column, side: String) =
      ev.crossJoin(broadcast(bounds))
        .filter(cmp(col("ts_ns"), col("mid")))
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as(s"n_$side"))
    val a = half(_ < _, "a")
    val b = half(_ >= _, "b")
    a.join(b, Seq("user_id", "event_type"), "full_outer")
      .select(col("user_id"), col("event_type"),
        when(col("n_a").isNull, "ADD")
          .when(col("n_b").isNull, "DEL")
          .when(col("n_a") =!= col("n_b"), "MOD")
          .otherwise("SAME").as("op"))
  }

  // ---------------------------------------------------------------- oracle

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_evt_sessionize" -> (sessionize _),
    "q_evt_user_stats" -> (userStats _),
    "q_evt_funnel" -> (funnel _),
    "q_evt_delta" -> (deltaOps _))

  val oracles: Map[String, String] = Map(
    "q_evt_funnel" -> """
      WITH ev AS (
        SELECT user_id, event_type, epoch_ns(ts) AS ts_ns FROM events),
      v AS (
        SELECT user_id, min(ts_ns) AS view_ns FROM ev
        WHERE event_type = 'view' GROUP BY user_id),
      c AS (
        SELECT e.user_id, min(e.ts_ns) AS click_ns
        FROM ev e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.ts_ns > v.view_ns
        GROUP BY e.user_id),
      p AS (
        SELECT e.user_id, min(e.ts_ns) AS purchase_ns
        FROM ev e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts_ns > c.click_ns
        GROUP BY e.user_id)
      SELECT v.user_id, v.view_ns, c.click_ns, p.purchase_ns,
             CAST(CASE WHEN p.purchase_ns IS NOT NULL THEN 3
                       WHEN c.click_ns IS NOT NULL THEN 2
                       ELSE 1 END AS INTEGER) AS reached,
             CASE WHEN p.purchase_ns IS NOT NULL
                  THEN (p.purchase_ns - v.view_ns) // 1000000000
                  END AS conv_secs
      FROM v
      LEFT JOIN c USING (user_id)
      LEFT JOIN p USING (user_id)""",
    "q_evt_sessionize" -> s"""
      SELECT user_id, session_no, count(*) AS n_events,
             min(ts_ns) AS start_ns, max(ts_ns) AS end_ns,
             round(sum(value), 4) AS sum_value
      FROM (
        SELECT user_id, ts_ns, value,
               -- CAST: DuckDB window sum over INTEGER yields HUGEINT,
               -- which the driver's pandas hash formats as float
               CAST(sum(brk) OVER (PARTITION BY user_id
                              ORDER BY ts_ns, event_id) AS BIGINT)
                 AS session_no
        FROM (
          SELECT user_id, event_id, ts_ns, value,
                 CASE WHEN prev IS NULL OR ts_ns - prev > $SessionGapNs
                      THEN 1 ELSE 0 END AS brk
          FROM (
            SELECT user_id, event_id, value, epoch_ns(ts) AS ts_ns,
                   lag(epoch_ns(ts)) OVER (PARTITION BY user_id
                                           ORDER BY epoch_ns(ts), event_id)
                     AS prev
            FROM events)))
      GROUP BY user_id, session_no""",
    "q_evt_user_stats" -> """
      SELECT user_id, count(*) AS n_events,
             count(DISTINCT event_type) AS n_types,
             round(sum(value), 4) AS sum_value,
             min(epoch_ns(ts)) AS first_ns, max(epoch_ns(ts)) AS last_ns
      FROM events GROUP BY user_id""",
    "q_evt_delta" -> """
      WITH bounds AS (
        SELECT (min(epoch_ns(ts)) + max(epoch_ns(ts))) // 2 AS mid FROM events
      ),
      a AS (SELECT user_id, event_type, count(*) AS n_a FROM events, bounds
            WHERE epoch_ns(ts) < mid GROUP BY user_id, event_type),
      b AS (SELECT user_id, event_type, count(*) AS n_b FROM events, bounds
            WHERE epoch_ns(ts) >= mid GROUP BY user_id, event_type)
      SELECT coalesce(a.user_id, b.user_id) AS user_id,
             coalesce(a.event_type, b.event_type) AS event_type,
             CASE WHEN a.user_id IS NULL THEN 'ADD'
                  WHEN b.user_id IS NULL THEN 'DEL'
                  WHEN n_a <> n_b THEN 'MOD'
                  ELSE 'SAME' END AS op
      FROM a FULL OUTER JOIN b
        ON a.user_id = b.user_id AND a.event_type = b.event_type""")
}
