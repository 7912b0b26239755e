package graft.relational

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Window-function operator surface (SURVEY.md §2B): ranking, analytic,
  * running/range frames. All windows partition by a key, so at scale each
  * partition sorts independently after one hash shuffle — no global sort
  * until the final (displayed) ORDER BY.
  */
object WindowQueries {

  val qs: Seq[Q] = Seq(

    Q("q16_window_rownum", { (s, dir) =>
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        Tables(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), row_number().over(w).as("rn"))
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
             |FROM orders ORDER BY o_custkey, rn""".stripMargin)),

    Q("q17_window_ranks", { (s, dir) =>
        val w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
        Tables(s, dir, "orders")
          .select(col("o_orderstatus"), col("o_orderkey"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            ntile(4).over(w).as("nt"))
          .orderBy("o_orderstatus", "rnk", "o_orderkey")
      },
      Some("""SELECT o_orderstatus, o_orderkey,
             |rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS rnk,
             |dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS drnk,
             |ntile(4) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS nt
             |FROM orders ORDER BY o_orderstatus, rnk, o_orderkey""".stripMargin)),

    Q("q18_window_analytic", { (s, dir) =>
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            lag("o_totalprice", 1).over(w).as("prev_price"),
            lead("o_totalprice", 1).over(w).as("next_price"),
            first("o_totalprice").over(w).as("first_price"),
            last("o_totalprice").over(wAll).as("last_price"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |lag(o_totalprice, 1) OVER w AS prev_price,
             |lead(o_totalprice, 1) OVER w AS next_price,
             |first_value(o_totalprice) OVER w AS first_price,
             |last_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    Q("q19_window_running", { (s, dir) =>
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
              .cast(DoubleType).as("run_total"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             |  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    Q("q20_window_range", { (s, dir) =>
        val w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
          .rangeBetween(-1000L, 0L)
        Tables(s, dir, "orders")
          .select(col("o_orderstatus"), col("o_orderkey"),
            count(lit(1)).over(w).as("cnt_near"))
          .orderBy("o_orderstatus", "o_orderkey")
      },
      Some("""SELECT o_orderstatus, o_orderkey,
             |count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
             |  RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS cnt_near
             |FROM orders ORDER BY o_orderstatus, o_orderkey""".stripMargin)),

    Q("q21_topk",
      (s, dir) => Tables(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // Top-k PER GROUP via rank-filter: Catalyst's InferWindowGroupLimit
    // rewrites the row_number <= k filter into a WindowGroupLimit that
    // keeps a k-row heap per group BEFORE the full sort — at scale the
    // shuffle carries k rows per customer instead of every order
    // (PlanSpec asserts the WindowGroupLimit node is present).
    Q("q96_topk_per_group", { (s, dir) =>
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders)
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    // Analytic-function completion beside q18's lag/lead/first/last:
    // nth_value over a running frame (null until the frame holds n rows),
    // lead with an explicit default (no null at the partition tail), and
    // the IGNORE NULLS form of last_value (the last non-null observation
    // so far — the forward-fill primitive q112 builds on). Same one-key
    // window shuffle as the rest of the family.
    Q("q183_window_analytic_extras", { (s, dir) =>
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wl = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        Tables(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            nth_value(col("o_totalprice"), 2).over(w).as("second_price"),
            lead(col("o_orderkey"), 1, -1L).over(wl).as("next_key"),
            last(when(col("o_orderkey") % 2 === 0, col("o_totalprice")),
              ignoreNulls = true).over(w).as("last_even_price"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  nth_value(o_totalprice, 2) OVER w AS second_price,
             |  lead(o_orderkey, 1, -1) OVER
             |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_key,
             |  last_value(CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice END
             |    IGNORE NULLS) OVER w AS last_even_price
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |ORDER BY o_custkey, o_orderkey""".stripMargin))
  )
}
