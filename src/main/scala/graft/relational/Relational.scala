package graft.relational

import graft.{Exact, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The declared relational operator surface (SURVEY.md §2B): each entry is a
  * Spark DataFrame program plus the equivalent DuckDB SQL. Every query ends
  * with a total ORDER BY so results hash deterministically; every aggregate /
  * computed column is aliased identically on both sides.
  *
  * Scale notes (100 TB posture): all fact-side plans are single-shuffle hash
  * aggregations or joins keyed on the natural join keys; dimension tables
  * (region/nation/customer/supplier/part at typical star-schema ratios) stay
  * broadcast-able, so Catalyst picks BroadcastHashJoin and no fact-side
  * shuffle happens before the aggregate. Filters are plain column predicates
  * that push to the parquet scan.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  val qs: Seq[Q] = Seq(

    Q("q01_scan_region",
      (s, dir) => t(s, dir, "region").orderBy("r_regionkey"),
      Some("SELECT * FROM region ORDER BY r_regionkey")),

    Q("q02_project_cast",
      (s, dir) => t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast(IntegerType).as("qty_int"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, CAST(l_quantity AS INTEGER) AS qty_int,
             |l_extendedprice * (1 - l_discount) AS net_price
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("q03_filter_predicates",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderstatus") === "O"
          && col("o_totalprice").between(1000, 100000)
          && col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM")
          && col("o_orderpriority").like("%-%")
          && col("o_custkey").isNotNull)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE o_orderstatus = 'O' AND o_totalprice BETWEEN 1000 AND 100000
             |AND o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM')
             |AND o_orderpriority LIKE '%-%' AND o_custkey IS NOT NULL
             |ORDER BY o_orderkey""".stripMargin)),

    Q("q04_join_inner",
      (s, dir) => t(s, dir, "nation")
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .select("n_name", "r_name")
        .orderBy("n_name", "r_name"),
      Some("""SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey
             |ORDER BY n_name, r_name""".stripMargin)),

    Q("q05_join_left",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .select("c_custkey", "o_orderkey")
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first),
      Some("""SELECT c_custkey, o_orderkey FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin)),

    Q("q06_join_full", { (s, dir) =>
        val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("ck"))
          .agg(count(lit(1)).as("n_cust"))
        val sp = t(s, dir, "supplier").groupBy(col("s_nationkey").as("sk"))
          .agg(count(lit(1)).as("n_supp"))
        c.join(sp, col("ck") === col("sk"), "full")
          .select(coalesce(col("ck"), col("sk")).as("nationkey"), col("n_cust"), col("n_supp"))
          .orderBy("nationkey")
      },
      Some("""SELECT coalesce(c.ck, s.sk) AS nationkey, n_cust, n_supp
             |FROM (SELECT c_nationkey ck, count(*) n_cust FROM customer GROUP BY 1) c
             |FULL JOIN (SELECT s_nationkey sk, count(*) n_supp FROM supplier GROUP BY 1) s
             |ON c.ck = s.sk ORDER BY nationkey""".stripMargin)),

    Q("q07_join_semi",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
             |ORDER BY c_custkey""".stripMargin)),

    Q("q08_join_anti",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
             |ORDER BY c_custkey""".stripMargin)),

    Q("q09_join_theta",
      (s, dir) => t(s, dir, "part").as("p")
        .join(t(s, dir, "lineitem").as("l"),
          col("l.l_partkey") === col("p.p_partkey") && col("l.l_quantity") > col("p.p_size"))
        .agg(count(lit(1)).as("c"))
        .orderBy("c"),
      Some("""SELECT count(*) AS c FROM part p JOIN lineitem l
             |ON l.l_partkey = p.p_partkey AND l.l_quantity > p.p_size ORDER BY c""".stripMargin)),

    Q("q10_join_cross",
      (s, dir) => t(s, dir, "region").crossJoin(t(s, dir, "nation"))
        .agg(count(lit(1)).as("c")).orderBy("c"),
      Some("SELECT count(*) AS c FROM region CROSS JOIN nation ORDER BY c")),

    Q("q11_agg_tpch_q1",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Exact.dsum(col("l_quantity")).as("sum_qty"),
          Exact.dsum(col("l_extendedprice")).as("sum_base_price"),
          Exact.dsum6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          Exact.dsum6(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          Exact.davg(col("l_quantity")).as("avg_qty"),
          Exact.davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus,
             |${Exact.sqlSum("l_quantity")} AS sum_qty,
             |${Exact.sqlSum("l_extendedprice")} AS sum_base_price,
             |${Exact.sqlSum6("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
             |${Exact.sqlSum6("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
             |${Exact.sqlAvg("l_quantity")} AS avg_qty,
             |${Exact.sqlAvg("l_extendedprice")} AS avg_price,
             |count(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      headline = true),

    Q("q12_agg_distinct",
      (s, dir) => t(s, dir, "orders")
        .agg(countDistinct(col("o_custkey")).as("dc"), count(lit(1)).as("c"))
        .orderBy("dc"),
      Some("SELECT count(DISTINCT o_custkey) AS dc, count(*) AS c FROM orders ORDER BY dc")),

    Q("q13_agg_rollup", { (s, dir) =>
        t(s, dir, "orders").createOrReplaceTempView("g_orders")
        t(s, dir, "customer").createOrReplaceTempView("g_customer")
        t(s, dir, "nation").createOrReplaceTempView("g_nation")
        s.sql("""SELECT n_name, o_orderstatus, count(*) AS cnt
                |FROM g_orders JOIN g_customer ON o_custkey = c_custkey
                |JOIN g_nation ON c_nationkey = n_nationkey
                |GROUP BY ROLLUP(n_name, o_orderstatus)
                |ORDER BY n_name ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST, cnt""".stripMargin)
      },
      Some("""SELECT n_name, o_orderstatus, count(*) AS cnt
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY ROLLUP(n_name, o_orderstatus)
             |ORDER BY n_name NULLS FIRST, o_orderstatus NULLS FIRST, cnt""".stripMargin)),

    Q("q54_agg_cube",
      (s, dir) => t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first, col("cnt")),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, cnt""".stripMargin)),

    Q("q55_agg_grouping_sets", { (s, dir) =>
        t(s, dir, "orders").createOrReplaceTempView("gs_orders")
        s.sql("""SELECT o_orderstatus, o_orderpriority,
                |  count(*) AS cnt, grouping(o_orderstatus) AS g_status
                |FROM gs_orders
                |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
                |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, cnt""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
             |count(*) AS cnt, CAST(grouping(o_orderstatus) AS TINYINT) AS g_status
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
             |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, cnt""".stripMargin)),

    // Ordered-set aggregates: discrete percentile (no interpolation, so the
    // result is an actual data value — engine-portable) and ordered listagg.
    Q("q58_agg_ordered_set", { (s, dir) =>
        t(s, dir, "orders").createOrReplaceTempView("os_orders")
        s.sql("""SELECT o_orderstatus,
                |  percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS med_disc,
                |  listagg(DISTINCT o_orderpriority, '|') WITHIN GROUP (ORDER BY o_orderpriority) AS prios
                |FROM os_orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
      },
      Some("""SELECT o_orderstatus,
             |quantile_disc(o_totalprice, 0.5) AS med_disc,
             |string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority) AS prios
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    Q("q14_agg_having",
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 12)
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
             |HAVING count(*) > 12 ORDER BY o_custkey""".stripMargin)),

    Q("q15_flagship_revenue",
      (s, dir) => flagship(s, dir),
      Some(s"""SELECT n_name, ${Exact.sqlSum6("l_extendedprice * (1 - l_discount)")} AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
             |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),
      headline = true),

    // TPC-H Q3 shape: selective filters on BOTH fact tables (pushed to the
    // scans), a two-hop join, grouped revenue, and an ordered top-10 that
    // plans TakeOrderedAndProject — the second classic ad-hoc analytics
    // shape next to the Q5-style flagship.
    Q("q111_tpch_q3_shape", { (s, dir) =>
        val cutoff = to_timestamp(lit("1998-06-01"))
        t(s, dir, "customer").filter(col("c_nationkey") === 1)
          .join(t(s, dir, "orders").filter(col("o_orderdate") < cutoff),
            col("c_custkey") === col("o_custkey"))
          .join(t(s, dir, "lineitem").filter(col("l_shipdate") > cutoff),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(Exact.dsum6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
             |  ${Exact.sqlSum6("l_extendedprice * (1 - l_discount)")} AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_nationkey = 1
             |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
             |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
             |GROUP BY l_orderkey, o_orderdate, o_orderpriority
             |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    // As-of (point-in-time) join — an operator Spark lacks natively,
    // composed from union + running last() in graft.operators.AsofJoin
    // (one key shuffle, no join explosion). Each click gets the value of
    // the user's latest view AT OR BEFORE the click; DuckDB's native
    // ASOF LEFT JOIN is the oracle.
    Q("q80_asof_join", { (s, dir) =>
        val e = t(s, dir, "events")
        val clicks = e.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts")
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("value").as("view_value"))
        graft.operators.AsofJoin
          .asofJoin(clicks, views, Seq("user_id"), "ts", "ts", Seq("view_value"))
          .orderBy("event_id")
      },
      Some("""SELECT l.event_id, l.user_id, l.ts, r.value AS view_value
             |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
             |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') r
             |  ON l.user_id = r.user_id AND l.ts >= r.ts
             |ORDER BY l.event_id""".stripMargin))
  )

  /** TPC-H Q5 shape: revenue per nation for one region and one order year.
    * At 100 TB the fact-side joins (orders⋈lineitem) shuffle on the order
    * key once; supplier/nation/region/customer are broadcast dims.
    */
  def flagship(s: SparkSession, dir: String): DataFrame = {
    val customer = Tables(s, dir, "customer")
    val orders = Tables(s, dir, "orders")
    val lineitem = Tables(s, dir, "lineitem")
    val supplier = Tables(s, dir, "supplier")
    val nation = Tables(s, dir, "nation")
    val region = Tables(s, dir, "region")
    customer
      .join(orders, col("c_custkey") === col("o_custkey"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA"
        && col("o_orderdate") >= to_timestamp(lit("1996-01-01"))
        && col("o_orderdate") < to_timestamp(lit("1997-01-01")))
      .groupBy("n_name")
      .agg(Exact.dsum6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }
}
