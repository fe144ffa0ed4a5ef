package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator coverage (SURVEY.md §2.4 Q1–Q11) over the TPC-H-ish
  * test tables, each with a DuckDB oracle.
  *
  * Numeric discipline: every aggregated double is routed through
  * DECIMAL(18,4) (DECIMAL(18,6) for event values) so the sum is exact and
  * order-independent, then cast back to double — Spark's parallel partial
  * aggregation and DuckDB's single-threaded sum otherwise disagree in the
  * low bits. Row order is pinned by an explicit ORDER BY on both sides.
  */
object Relational {
  private val DEC = "decimal(18,4)"
  private def dec(c: Column): Column = c.cast(DEC)

  val all: Seq[Q] = Seq(
    Q(
      "q01_pricing_summary",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .filter($"l_shipdate" <= lit("1998-09-01").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sum(dec($"l_quantity")).cast("double").as("sum_qty"),
            sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
            sum(dec($"l_extendedprice" * (lit(1.0) - $"l_discount"))).cast("double").as("sum_disc_price"),
            count(lit(1)).as("n_rows"),
            countDistinct($"l_orderkey").as("n_orders"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        COUNT(*) AS n_rows, COUNT(DISTINCT l_orderkey) AS n_orders
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""")
    ),
    Q(
      "q02_revenue_by_nation",
      (s, dir) => {
        import s.implicits._
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy($"n_name")
          .agg(sum(dec($"o_totalprice")).cast("double").as("revenue"),
               count(lit(1)).as("n_orders"))
          .orderBy($"n_name")
      },
      Some("""SELECT n_name,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")
    ),
    Q(
      "q03_part_type_topk",
      (s, dir) => {
        import s.implicits._
        val li = Tables.lineitem(s, dir)
        val p = Tables.part(s, dir)
        li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
          .groupBy($"p_type")
          .agg(sum(dec($"l_quantity")).cast("double").as("qty"))
          .orderBy($"qty".desc, $"p_type")
          .limit(10)
      },
      Some("""SELECT p_type, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_type ORDER BY qty DESC, p_type LIMIT 10""")
    ),
    Q(
      "q04_customers_no_orders",
      (s, dir) => {
        import s.implicits._
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir).filter($"o_totalprice" > 300000.0)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        ORDER BY c_custkey""")
    ),
    Q(
      "q05_suppliers_with_sales",
      (s, dir) => {
        import s.implicits._
        val sup = Tables.supplier(s, dir)
        val li = Tables.lineitem(s, dir)
        sup.join(li, sup("s_suppkey") === li("l_suppkey"), "left_semi")
          .select($"s_suppkey", $"s_name")
          .orderBy($"s_suppkey")
      },
      Some("""SELECT s_suppkey, s_name FROM supplier
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
        ORDER BY s_suppkey""")
    ),
    Q(
      "q06_cust_order_stats",
      (s, dir) => {
        import s.implicits._
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy($"c_custkey")
          .agg(count($"o_orderkey").as("n_orders"),
               coalesce(sum(dec($"o_totalprice")).cast("double"), lit(0.0)).as("spend"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS spend
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey ORDER BY c_custkey""")
    ),
    Q(
      "q07_top_orders_per_cust",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
        Tables.orders(s, dir)
          .withColumn("rnk", row_number().over(w))
          .filter($"rnk" <= 3)
          .select($"o_custkey", $"rnk", $"o_orderkey", $"o_totalprice")
          .orderBy($"o_custkey", $"rnk")
      },
      Some("""SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          FROM orders) q WHERE rnk <= 3 ORDER BY o_custkey, rnk""")
    ),
    Q(
      "q08_distinct_status",
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir)
          .select($"o_orderstatus", $"o_orderpriority")
          .distinct()
          .orderBy($"o_orderstatus", $"o_orderpriority")
      },
      Some("""SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        ORDER BY o_orderstatus, o_orderpriority""")
    ),
    Q(
      "q09_union_parties",
      (s, dir) => {
        import s.implicits._
        val c = Tables.customer(s, dir)
          .select(lit("customer").as("kind"), $"c_nationkey".as("nationkey"))
        val sup = Tables.supplier(s, dir)
          .select(lit("supplier").as("kind"), $"s_nationkey".as("nationkey"))
        c.unionByName(sup)
          .groupBy($"kind", $"nationkey")
          .agg(count(lit(1)).as("n"))
          .orderBy($"kind", $"nationkey")
      },
      Some("""SELECT kind, nationkey, COUNT(*) AS n FROM (
          SELECT 'customer' AS kind, c_nationkey AS nationkey FROM customer
          UNION ALL
          SELECT 'supplier' AS kind, s_nationkey AS nationkey FROM supplier) u
        GROUP BY kind, nationkey ORDER BY kind, nationkey""")
    ),
    Q(
      "q10_top_orders",
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir)
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .limit(10)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")
    ),
    Q(
      // Ordered GROUP_CONCAT — the reference's column-collapse primitive
      // (CoNLLRDFFormatter.columnsAsSelect, SURVEY §2.4 Q6).
      "q11_ordered_groupconcat",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .groupBy($"l_orderkey")
          .agg(array_join(
            transform(
              array_sort(collect_list(struct($"l_linenumber", $"l_partkey"))),
              x => x.getField("l_partkey").cast("string")),
            ",").as("parts"))
          .orderBy($"l_orderkey")
      },
      Some("""SELECT l_orderkey,
        STRING_AGG(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_linenumber, l_partkey) AS parts
        FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""")
    ),
    Q(
      "q12_running_sum",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
          .rowsBetween(Window.unboundedPreceding, 0)
        Tables.events(s, dir)
          .withColumn("running", sum($"value".cast("decimal(18,6)")).over(w).cast("double"))
          .select($"user_id", $"event_id", $"running")
          .orderBy($"user_id", $"event_id")
      },
      Some("""SELECT user_id, event_id,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
        FROM events ORDER BY user_id, event_id""")
    ),
    Q(
      // Gap-based sessionization: the batch equivalent of a session window
      // (reference has no event-time semantics — SURVEY §2.8).
      "q13_sessionize",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        Tables.events(s, dir)
          .withColumn("prev_ts", lag($"ts", 1).over(w))
          .withColumn("new_sess",
            when($"prev_ts".isNull ||
              (unix_timestamp($"ts") - unix_timestamp($"prev_ts")) > 1800, 1L).otherwise(0L))
          .withColumn("session_id",
            sum($"new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy($"user_id", $"session_id")
          .agg(count(lit(1)).as("n_events"),
               min($"event_id").as("first_event"),
               max($"event_id").as("last_event"))
          .orderBy($"user_id", $"session_id")
      },
      Some("""SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        COUNT(*) AS n_events,
        MIN(event_id) AS first_event, MAX(event_id) AS last_event
        FROM (
          SELECT user_id, event_id,
            SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM (
            SELECT user_id, event_id, ts,
              CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                     OR date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
                   THEN 1 ELSE 0 END AS new_sess
            FROM events) a) b
        GROUP BY user_id, session_id ORDER BY user_id, session_id""")
    )
  )
}
