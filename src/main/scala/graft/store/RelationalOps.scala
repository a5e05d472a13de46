package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operators of the engine: scans with pushdown,
  * scope/flag filters, dimension joins, semi/anti joins, grouped and
  * windowed aggregation, global top-N, set ops.
  *
  * These are the Spark-native equivalents of the reference's store/view
  * layer (dataset-scope filter `store/sql.py:198-200`, external-flag
  * filter `store/memory.py:72-87`, stopword anti-join
  * `blocker/index.py:463-497`, per-subject top-K `blocker/index.py:685-694`,
  * global top-N `blocker/index.py:608-609`, set union
  * `store/versioned.py:341-350`) re-expressed over the synthetic star
  * schema so every one is DuckDB-oracle checkable.
  *
  * Scale notes: every query below is a single declarative plan — filters
  * and projections reach the parquet scan (PushedFilters / ReadSchema),
  * dimension joins are broadcast (no shuffle of the fact side), top-N is
  * TakeOrderedAndProject (no global sort materialization), and per-group
  * top-K uses WindowGroupLimit pushdown (Spark 3.5+) so no group ever
  * materializes more than K rows past the shuffle.
  */
object RelationalOps {
  import graft.Tables._

  /** Pricing-summary aggregate (grouped agg with partial map-side combine). */
  def aggPricing(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") < lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        count(lit(1)).as("count_order"))

  val aggPricingSql: String = """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 6) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus"""

  /** Scope filter + projection — mirrors the dataset-scope statement scan:
    * predicate and column pruning must reach the parquet reader.
    */
  def filterScope(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_returnflag") === "R" &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  val filterScopeSql: String = """
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE l_returnflag = 'R' AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'"""

  /** Fact ⋈ broadcast dims: customer → nation → region rollup. */
  def joinDims(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"),
        round(avg(col("c_acctbal")), 4).as("avg_acctbal"))

  val joinDimsSql: String = """
    SELECT r_name, count(*) AS n_customers,
           round(avg(c_acctbal), 4) AS avg_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name"""

  /** Anti join — customers with no 1995 orders (stopword-anti-join shape). */
  def antiJoin(s: SparkSession, d: String): DataFrame = {
    val o95 = orders(s, d)
      .filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
    customer(s, d)
      .join(o95, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  val antiJoinSql: String = """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')"""

  /** Semi join — parts that appear in at least one lineitem. */
  def semiJoin(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .join(lineitem(s, d), col("p_partkey") === col("l_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_brand"))

  val semiJoinSql: String = """
    SELECT p_partkey, p_brand FROM part
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)"""

  /** Per-group top-K with a relative score floor — the exact shape of the
    * blocker's candidate cap (max_candidates=75, min_score_ratio=0.1,
    * reference blocker/index.py:685-694): row_number + first_value over
    * the same window, then filter. Catalyst rewrites the rank filter into
    * WindowGroupLimit so only K rows per group survive the shuffle.
    */
  def topkWindow(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    customer(s, d)
      .withColumn("rn", row_number().over(w))
      .withColumn("best", first(col("c_acctbal")).over(w))
      .filter(col("rn") <= 5 && col("c_acctbal") >= col("best") * 0.5)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"), col("rn"))
  }

  val topkWindowSql: String = """
    SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER w AS rn,
             first_value(c_acctbal) OVER w AS best
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey ASC)
    ) WHERE rn <= 5 AND c_acctbal >= best * 0.5"""

  /** Global top-N with full tiebreak — TakeOrderedAndProject, the Spark
    * shape of `ORDER BY score DESC, lid, rid LIMIT ?` (blocker pair cap).
    */
  def globalTopn(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
      .select(col("o_orderkey"), col("o_totalprice"))

  val globalTopnSql: String = """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100"""

  /** Distinct union — multi-dataset scope union (Redis SUNION analog). */
  def unionScope(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_nationkey").cast("int").as("nationkey"))
      .union(supplier(s, d).select(col("s_nationkey").cast("int").as("nationkey")))
      .distinct()

  val unionScopeSql: String = """
    SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
    UNION
    SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier"""

  /** Inverted-reference join: rows whose foreign reference points into a
    * key set (reference `get_inverted`, store/sql.py:219-237).
    */
  def invertedRef(s: SparkSession, d: String): DataFrame = {
    val targets = customer(s, d).filter(col("c_nationkey") === 5)
      .select(col("c_custkey"))
    orders(s, d)
      .join(targets, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))
  }

  val invertedRefSql: String = """
    SELECT o_custkey, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    JOIN (SELECT c_custkey FROM customer WHERE c_nationkey = 5) t
      ON o_custkey = c_custkey
    GROUP BY o_custkey"""

  /** Event-time tumbling-window aggregation (batch form of the streaming
    * windowed agg; emitted as epoch seconds so the oracle compare is
    * timezone-proof).
    */
  def eventWindowAgg(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("bucket", expr("ts_ns div 3600000000000") * 3600)
      .groupBy(col("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))

  val eventWindowAggSql: String = """
    SELECT ((epoch_ns(ts) // 3600000000000) * 3600) AS bucket,
           event_type, count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_pricing" -> (aggPricing _),
    "q_filter_scope" -> (filterScope _),
    "q_join_dims" -> (joinDims _),
    "q_anti_join" -> (antiJoin _),
    "q_semi_join" -> (semiJoin _),
    "q_topk_window" -> (topkWindow _),
    "q_global_topn" -> (globalTopn _),
    "q_union_scope" -> (unionScope _),
    "q_inverted_ref" -> (invertedRef _),
    "q_event_window_agg" -> (eventWindowAgg _))

  val oracles: Map[String, String] = Map(
    "q_agg_pricing" -> aggPricingSql,
    "q_filter_scope" -> filterScopeSql,
    "q_join_dims" -> joinDimsSql,
    "q_anti_join" -> antiJoinSql,
    "q_semi_join" -> semiJoinSql,
    "q_topk_window" -> topkWindowSql,
    "q_global_topn" -> globalTopnSql,
    "q_union_scope" -> unionScopeSql,
    "q_inverted_ref" -> invertedRefSql,
    "q_event_window_agg" -> eventWindowAggSql)
}
