package graft.relational

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-function and set-operation surface (SURVEY.md §2B): strings, dates,
  * math, conditionals, JSON, arrays/higher-order functions, set ops, sorts
  * with explicit null ordering. All per-row expressions are pure IEEE /
  * integer ops that evaluate bit-identically in Spark and DuckDB.
  */
object FunctionQueries {

  /** One SQL text both Spark and DuckDB execute for q69 (defined before
    * `qs` — object init order matters for the oracle map).
    */
  private val SubquerySql: String =
    """SELECT c_custkey, c_acctbal FROM customer c
      |WHERE c_acctbal > (
      |    SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |           / CAST(COUNT(*) AS DOUBLE) / 50.0
      |    FROM orders o WHERE o.o_custkey = c.c_custkey)
      |  AND EXISTS (
      |    SELECT 1 FROM orders o2
      |    WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  /** One SQL text both engines execute for q151: a recursive CTE walking
    * each customer's ancestor chain in the deterministic key/10 hierarchy.
    * Integer division is spelled CAST(FLOOR(x/10)) so Spark and DuckDB
    * agree; the sums are integer-exact.
    */
  private val RecursiveSql: String =
    """WITH RECURSIVE chain AS (
      |  SELECT c_custkey AS custkey,
      |         CAST(FLOOR(c_custkey / 10) AS BIGINT) AS anc,
      |         CAST(1 AS BIGINT) AS depth
      |  FROM customer
      |  UNION ALL
      |  SELECT custkey, CAST(FLOOR(anc / 10) AS BIGINT) AS anc, depth + 1
      |  FROM chain WHERE anc >= 10)
      |SELECT custkey, count(*) AS n_anc,
      |       CAST(sum(anc) AS BIGINT) AS anc_sum, max(depth) AS hops
      |FROM chain GROUP BY custkey ORDER BY custkey""".stripMargin

  /** One SQL text both engines execute verbatim for q186. */
  private val GroupByAllSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin

  /** One SQL text both engines execute for q109: a correlated LATERAL
    * subquery with ORDER BY + LIMIT — per-customer top-2 orders. Catalyst
    * decorrelates this into a ranked window join (DecorrelateInnerQuery),
    * not a per-row re-execution.
    */
  private val LateralSql: String =
    """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
      |WHERE c.c_nationkey = 3
      |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin

  val qs: Seq[Q] = Seq(

    Q("q22_set_union", { (s, dir) =>
        val c = Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        val sp = Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        c.unionByName(sp).groupBy("nationkey").agg(count(lit(1)).as("cnt")).orderBy("nationkey")
      },
      Some("""SELECT nationkey, count(*) AS cnt FROM (
             |  SELECT c_nationkey AS nationkey FROM customer
             |  UNION ALL SELECT s_nationkey AS nationkey FROM supplier)
             |GROUP BY nationkey ORDER BY nationkey""".stripMargin)),

    Q("q23_set_intersect", { (s, dir) =>
        val c = Tables(s, dir, "customer")
          .filter(col("c_acctbal") > 9000).select(col("c_nationkey").as("nationkey"))
        val sp = Tables(s, dir, "supplier")
          .filter(col("s_acctbal") > 5000).select(col("s_nationkey").as("nationkey"))
        c.intersect(sp).orderBy("nationkey")
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
             |INTERSECT
             |SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
             |ORDER BY nationkey""".stripMargin)),

    Q("q24_set_except", { (s, dir) =>
        val c = Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        val sp = Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        c.except(sp).orderBy("nationkey")
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |EXCEPT
             |SELECT s_nationkey AS nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin)),

    // Multiset (ALL) set ops — bag semantics keep duplicate cardinalities.
    Q("q59_set_all_ops", { (s, dir) =>
        val c = Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        val sp = Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        val ex = c.exceptAll(sp).groupBy("nationkey").agg(count(lit(1)).as("n_except"))
        val in = c.intersectAll(sp).groupBy("nationkey").agg(count(lit(1)).as("n_intersect"))
        ex.join(in, Seq("nationkey"), "full")
          .orderBy("nationkey")
      },
      Some("""WITH ex AS (
             |  SELECT nationkey, count(*) AS n_except FROM (
             |    SELECT c_nationkey AS nationkey FROM customer
             |    EXCEPT ALL
             |    SELECT s_nationkey FROM supplier) GROUP BY 1
             |), ins AS (
             |  SELECT nationkey, count(*) AS n_intersect FROM (
             |    SELECT c_nationkey AS nationkey FROM customer
             |    INTERSECT ALL
             |    SELECT s_nationkey FROM supplier) GROUP BY 1
             |)
             |SELECT coalesce(ex.nationkey, ins.nationkey) AS nationkey, n_except, n_intersect
             |FROM ex FULL JOIN ins ON ex.nationkey = ins.nationkey
             |ORDER BY nationkey""".stripMargin)),

    Q("q25_string_fn",
      (s, dir) => Tables(s, dir, "customer")
        .select(col("c_custkey"),
          upper(substring(col("c_name"), 1, 8)).as("up8"),
          lower(col("c_mktsegment")).as("seg_lc"),
          length(col("c_name")).as("name_len"),
          regexp_replace(col("c_name"), "Customer", "Cust").as("repl"),
          lpad(col("c_custkey").cast(StringType), 10, "0").as("padded"),
          trim(concat(lit("  "), col("c_name"), lit(" "))).as("trimmed"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
          size(split(col("c_name"), "#")).as("n_parts"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |upper(substr(c_name, 1, 8)) AS up8,
             |lower(c_mktsegment) AS seg_lc,
             |CAST(length(c_name) AS INTEGER) AS name_len,
             |regexp_replace(c_name, 'Customer', 'Cust') AS repl,
             |lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
             |trim(concat('  ', c_name, ' ')) AS trimmed,
             |regexp_extract(c_name, '([0-9]+)', 1) AS digits,
             |CAST(len(string_split(c_name, '#')) AS INTEGER) AS n_parts
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    Q("q26_date_fn",
      (s, dir) => Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          date_trunc("month", col("o_orderdate")).as("mon"),
          datediff(to_date(lit("2000-01-01")), to_date(col("o_orderdate"))).as("days_to_y2k"),
          date_add(to_date(col("o_orderdate")), 30).as("plus30"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |CAST(year(o_orderdate) AS INTEGER) AS y,
             |CAST(month(o_orderdate) AS INTEGER) AS m,
             |CAST(day(o_orderdate) AS INTEGER) AS d,
             |CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
             |CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INTEGER) AS days_to_y2k,
             |CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
             |CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    Q("q27_math_fn",
      (s, dir) => Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          floor(col("l_extendedprice")).as("fl"),
          ceil(col("l_extendedprice")).as("cl"),
          abs(col("l_discount") - 0.05).as("ad"),
          sqrt(col("l_quantity")).as("sq"),
          pmod(col("l_orderkey"), lit(7)).as("pm"),
          signum(col("l_discount") - 0.05).cast(IntegerType).as("sg"),
          pow(lit(2.0), col("l_linenumber")).as("pw"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |CAST(floor(l_extendedprice) AS BIGINT) AS fl,
             |CAST(ceil(l_extendedprice) AS BIGINT) AS cl,
             |abs(l_discount - 0.05) AS ad,
             |sqrt(l_quantity) AS sq,
             |((l_orderkey % 7) + 7) % 7 AS pm,
             |CAST(sign(l_discount - 0.05) AS INTEGER) AS sg,
             |power(2.0, l_linenumber) AS pw
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("q28_conditional",
      (s, dir) => Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 200000, "big")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("small").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status2"),
          least(col("o_totalprice"), lit(150000.0)).as("capped"),
          greatest(col("o_totalprice") / 2, lit(50000.0)).as("floored"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |CASE WHEN o_totalprice > 200000 THEN 'big'
             |     WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket,
             |coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status2,
             |least(o_totalprice, 150000.0) AS capped,
             |greatest(o_totalprice / 2, 50000.0) AS floored
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    Q("q29_json_fn",
      (s, dir) => Tables(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
             |FROM events ORDER BY event_id""".stripMargin)),

    Q("q30_array_fn",
      (s, dir) => Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).cast(DoubleType).as("e1"),
          element_at(col("embedding"), size(col("embedding"))).cast(DoubleType).as("e_last"),
          size(filter(col("embedding"), x => x > 0f)).as("n_pos"),
          element_at(sort_array(col("embedding")), 1).cast(DoubleType).as("e_min"))
        .orderBy("vec_id"),
      Some("""SELECT vec_id,
             |CAST(len(embedding) AS INTEGER) AS dim,
             |CAST(embedding[1] AS DOUBLE) AS e1,
             |CAST(embedding[len(embedding)] AS DOUBLE) AS e_last,
             |CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
             |CAST(list_sort(embedding)[1] AS DOUBLE) AS e_min
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    Q("q56_map_fn", { (s, dir) =>
        val m = map_from_arrays(
          array(lit("status"), lit("prio")),
          array(col("o_orderstatus"), col("o_orderpriority")))
        val m2 = map_concat(m, map(lit("extra"), lit("x")))
        Tables(s, dir, "orders")
          .select(col("o_orderkey"),
            concat_ws(",", sort_array(map_keys(m))).as("ks"),
            concat_ws(",", map_values(m)).as("vs"),
            element_at(m, "status").as("status_v"),
            size(m2).as("n2"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |array_to_string(list_sort(map_keys(m)), ',') AS ks,
             |array_to_string(map_values(m), ',') AS vs,
             |m['status'][1] AS status_v,
             |CAST(cardinality(map_concat(m, map(['extra'], ['x']))) AS INTEGER) AS n2
             |FROM (SELECT o_orderkey,
             |  map(['status','prio'], [o_orderstatus, o_orderpriority]) AS m FROM orders)
             |ORDER BY o_orderkey""".stripMargin)),

    Q("q31_sort_nulls",
      (s, dir) => Tables(s, dir, "orders")
        .select(nullif(col("o_orderstatus"), lit("P")).as("st"), col("o_orderkey"))
        .orderBy(col("st").desc_nulls_first, col("o_orderkey")),
      Some("""SELECT nullif(o_orderstatus, 'P') AS st, o_orderkey FROM orders
             |ORDER BY st DESC NULLS FIRST, o_orderkey""".stripMargin)),

    // Collect aggregates, made deterministic by sorting the collected set.
    Q("q64_agg_collect",
      (s, dir) => Tables(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          concat_ws(",", sort_array(collect_set(col("o_orderpriority")))).as("prio_set"),
          count(lit(1)).as("cnt"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
             |array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS prio_set,
             |count(*) AS cnt
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // HLL++ approximate distinct: value is approximate, so no hash oracle —
    // the driver records a rows-only check; GraftSuite asserts 5% tolerance.
    Q("q32_agg_approx_distinct",
      (s, dir) => Tables(s, dir, "orders")
        .agg(approx_count_distinct(col("o_custkey")).as("approx_dc"))
        .orderBy("approx_dc"),
      None),

    // Heavy-hitter sketch: approx_top_k (Apache DataSketches frequent-items
    // under the hood) — the mergeable frequency sketch that completes the
    // sketch family beside HLL (q32) and GK percentiles (q97). One partial
    // +final aggregation, sketch size O(k), never a full token shuffle.
    // Approximate → no SQL oracle; CorpusSpec gates the top set and counts
    // against the exact aggregation.
    Q("q123_sketch_heavyhitters", { (s, dir) =>
        Tables(s, dir, "documents")
          .select(explode(graft.llm.TextOps.tokens(col("text"))).as("token"))
          .agg(expr("approx_top_k(token, 20)").as("tk"))
          .select(explode(col("tk")).as("e"))
          .select(col("e.item").as("token"), col("e.count").as("est_cnt"))
          .orderBy(col("est_cnt").desc, col("token"))
      },
      None),

    // Subqueries: correlated scalar aggregate + EXISTS, as one SQL text run
    // verbatim by both engines (Catalyst decorrelates both into joins).
    // The inner average uses the Exact.davg decimal-sum shape so the
    // boundary comparison is bit-identical across engines.
    Q("q69_subqueries", { (s, dir) =>
        Tables(s, dir, "customer").createOrReplaceTempView("customer")
        Tables(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql(SubquerySql)
      },
      Some(SubquerySql)),

    // Recursive CTE (SQL:1999 WITH RECURSIVE; Spark 4's UnionLoop executes
    // it natively — one engine-portable statement runs verbatim on both
    // sides): every customer's ancestor chain under the deterministic
    // key/10 hierarchy. Scale posture: each iteration is a narrow
    // filter+project on the previous increment (no per-iteration shuffle),
    // depth is log10(max key) ≈ 6 rounds at any SF, and the single hash
    // aggregation at the end is the only exchange.
    Q("q151_recursive_cte", { (s, dir) =>
        Tables(s, dir, "customer").createOrReplaceTempView("customer")
        s.sql(RecursiveSql)
      },
      Some(RecursiveSql)),

    // VARIANT ingestion (Spark 4's semi-structured type — the open-format
    // answer to schema-drifting JSON): rows carry heterogeneous JSON
    // (every third order has nested tags/meta the others lack),
    // parse_json lands them in ONE variant column with no up-front
    // schema, and typed path extraction (variant_get / try_variant_get)
    // reads what each row has — missing paths are NULL, not errors. The
    // JSON text carries only integers/strings (double rendering differs
    // across engines); the oracle replays the paths with json_extract.
    // Per-row codegen'd parse+extract, zero shuffle.
    Q("q169_variant_json", { (s, dir) =>
        val o = Tables(s, dir, "orders")
        val pk = col("o_orderkey")
        val j = concat(lit("{\"k\":"), pk.cast(StringType),
          lit(",\"cents\":"),
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast(LongType)
            .cast(StringType),
          when(pk % 3 === 0, concat(
            lit(",\"tags\":[\"t"), (pk % 5).cast(StringType),
            lit("\"],\"meta\":{\"pri\":\""), col("o_orderpriority"), lit("\"}")))
            .otherwise(lit("")),
          lit("}"))
        o.select(pk.as("id"), parse_json(j).as("v"))
          .select(col("id"),
            expr("variant_get(v, '$.k', 'long')").as("k"),
            expr("variant_get(v, '$.cents', 'long')").as("cents"),
            expr("try_variant_get(v, '$.tags[0]', 'string')").as("tag0"),
            expr("try_variant_get(v, '$.meta.pri', 'string')").as("pri"))
          .orderBy("id")
      },
      Some("""WITH src AS (SELECT o_orderkey AS id,
             |  '{"k":' || CAST(o_orderkey AS VARCHAR)
             |  || ',"cents":' || CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR)
             |  || CASE WHEN o_orderkey % 3 = 0
             |       THEN ',"tags":["t' || CAST(o_orderkey % 5 AS VARCHAR)
             |         || '"],"meta":{"pri":"' || o_orderpriority || '"}'
             |       ELSE '' END
             |  || '}' AS j
             |  FROM orders)
             |SELECT id,
             |  CAST(json_extract(j, '$.k') AS BIGINT) AS k,
             |  CAST(json_extract(j, '$.cents') AS BIGINT) AS cents,
             |  json_extract_string(j, '$.tags[0]') AS tag0,
             |  json_extract_string(j, '$.meta.pri') AS pri
             |FROM src ORDER BY id""".stripMargin)),

    // Exact distributed median / percentile_cont(0.5) per group, by rank
    // selection: rank every value inside its group, keep the middle one
    // (or two — averaged through the house decimal-exact sum), never a
    // global sort. This is the EXACT path beside the q97 GK sketch: one
    // group-key shuffle + per-group sort, the classic selection shape
    // written identically in both engines (native percentile_cont/
    // quantile_cont interpolate in engine-specific float order, so the
    // portable formulation IS the operator).
    Q("q185_exact_median", { (s, dir) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
        val wc = org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderstatus")
        Tables(s, dir, "orders")
          .select(col("o_orderstatus").as("st"), col("o_totalprice").as("v"),
            row_number().over(w).as("rn"), count(lit(1)).over(wc).as("n"))
          .filter(col("rn") === floor((col("n") + 1) / 2) ||
            col("rn") === floor((col("n") + 2) / 2))
          .groupBy("st")
          .agg((graft.Exact.dsum(col("v")) /
            count(lit(1)).cast(DoubleType)).as("median"))
          .orderBy("st")
      },
      Some(s"""WITH r AS (SELECT o_orderstatus AS st, o_totalprice AS v,
             |    row_number() OVER (PARTITION BY o_orderstatus
             |      ORDER BY o_totalprice, o_orderkey) AS rn,
             |    count(*) OVER (PARTITION BY o_orderstatus) AS n
             |  FROM orders)
             |SELECT st,
             |  (${graft.Exact.sqlSum("v")} / CAST(COUNT(*) AS DOUBLE)) AS median
             |FROM r WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
             |GROUP BY st ORDER BY st""".stripMargin)),

    // GROUP BY ALL / ORDER BY ALL (modern SQL sugar both engines grew —
    // Spark 3.4+/4.x and DuckDB): ONE statement text executed verbatim by
    // both, like the q151 recursive CTE. Grouping keys are inferred from
    // the non-aggregate select items; ordering covers the whole output.
    Q("q186_group_by_all", { (s, dir) =>
        Tables(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql(GroupByAllSql)
      },
      Some(GroupByAllSql)),

    // Referential-integrity audit (the data-quality pass a warehouse
    // load runs after ingest): orphaned children and childless parents
    // by LEFT ANTI join — never a row-shipping join, the only exchanges
    // are the two key aggs. Fixture drift shifts every 101st lineitem's
    // order key past the horizon so the orphan path actually fires;
    // per-check counts plus the clean-row count make the audit total to
    // the table sizes (the self-consistency a reviewer checks first).
    Q("q197_referential_audit", { (s, dir) =>
        val o = Tables(s, dir, "orders").select(col("o_orderkey"))
        val l = Tables(s, dir, "lineitem")
          .select(when(col("l_orderkey") % 101 === 0,
            col("l_orderkey") + 30000000L).otherwise(col("l_orderkey")).as("fk"))
        val orphans = l.join(o, col("fk") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("n")).select(lit("orphan_lineitem").as("check_name"), col("n"))
        val childless = o.join(l, col("fk") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("n")).select(lit("childless_order").as("check_name"), col("n"))
        val ok = l.join(o, col("fk") === col("o_orderkey"), "left_semi")
          .agg(count(lit(1)).as("n")).select(lit("ok_lineitem").as("check_name"), col("n"))
        orphans.unionAll(childless).unionAll(ok).orderBy("check_name")
      },
      Some("""WITH l AS (SELECT CASE WHEN l_orderkey % 101 = 0
             |      THEN l_orderkey + 30000000 ELSE l_orderkey END AS fk
             |  FROM lineitem)
             |SELECT * FROM (
             |  SELECT 'orphan_lineitem' AS check_name, CAST(count(*) AS BIGINT) AS n
             |  FROM l WHERE fk NOT IN (SELECT o_orderkey FROM orders)
             |  UNION ALL
             |  SELECT 'childless_order', CAST(count(*) AS BIGINT) FROM orders
             |  WHERE o_orderkey NOT IN (SELECT fk FROM l)
             |  UNION ALL
             |  SELECT 'ok_lineitem', CAST(count(*) AS BIGINT)
             |  FROM l WHERE fk IN (SELECT o_orderkey FROM orders))
             |ORDER BY check_name""".stripMargin)),

    // PIVOT + UNPIVOT round-trip: order counts per year spread across
    // status columns, then melted back to long form (null cells dropped),
    // which must equal the plain GROUP BY — the oracle states exactly that.
    Q("q70_pivot_unpivot", { (s, dir) =>
        val wide = Tables(s, dir, "orders")
          .groupBy(year(col("o_orderdate")).as("y"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
        wide.unpivot(Array(col("y")), Array(col("F"), col("O"), col("P")),
            "status", "cnt")
          .filter(col("cnt").isNotNull)
          .orderBy("y", "status")
      },
      Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
             |  o_orderstatus AS status, count(*) AS cnt
             |FROM orders GROUP BY 1, 2 ORDER BY y, status""".stripMargin)),

    // Distribution window functions: percent_rank / cume_dist are integer
    // ratios evaluated in double — deterministic across engines.
    Q("q72_window_dist", { (s, dir) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderstatus").orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"),
            percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus,
             |  percent_rank() OVER (PARTITION BY o_orderstatus
             |                       ORDER BY o_totalprice, o_orderkey) AS pr,
             |  cume_dist() OVER (PARTITION BY o_orderstatus
             |                    ORDER BY o_totalprice, o_orderkey) AS cd
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ANSI-safe try_* family: malformed casts, zero divisors, and
    // out-of-bounds element access yield NULL instead of raising.
    Q("q73_try_fn", { (s, dir) =>
        val k = col("o_orderkey")
        Tables(s, dir, "orders").select(k,
            expr("try_cast(CASE WHEN o_orderkey % 2 = 0 THEN '123' ELSE 'abc' END AS INT)")
              .as("tc"),
            try_divide(lit(100.0), (k % 3).cast("double")).as("td"),
            try_element_at(array(lit(1), lit(2)), (k % 5).cast("int") + 1).as("te"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  TRY_CAST(CASE WHEN o_orderkey % 2 = 0 THEN '123' ELSE 'abc' END AS INTEGER) AS tc,
             |  100.0 / nullif(CAST(o_orderkey % 3 AS DOUBLE), 0.0) AS td,
             |  ([1, 2])[CAST(o_orderkey % 5 AS INTEGER) + 1] AS te
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Bitwise operators + popcount over the key (integer-exact everywhere).
    Q("q74_bitwise_fn", { (s, dir) =>
        val k = col("o_orderkey")
        Tables(s, dir, "orders").select(k,
            k.bitwiseAND(lit(255L)).as("b_and"),
            k.bitwiseOR(lit(4096L)).as("b_or"),
            k.bitwiseXOR(lit(1515L)).as("b_xor"),
            shiftleft(k, 3).as("b_shl"),
            shiftright(k, 2).as("b_shr"),
            bit_count(k).as("b_pop"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  o_orderkey & 255 AS b_and,
             |  o_orderkey | 4096 AS b_or,
             |  xor(o_orderkey, 1515) AS b_xor,
             |  o_orderkey << 3 AS b_shl,
             |  o_orderkey >> 2 AS b_shr,
             |  CAST(bit_count(o_orderkey) AS INTEGER) AS b_pop
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Statistical moment aggregates (variance / stddev / correlation),
    // computed from exact decimal power sums instead of Spark's native
    // float co-moment aggregates: the 2-decimal inputs make Σx, Σx², Σxy
    // exact in DecimalType, so the distributed partial+final merge is
    // order-insensitive and the double-space derivation (identical IEEE
    // expression both engines) hash-matches a serial oracle — the same
    // trick would make var/corr deterministic across 1000 executors.
    Q("q89_stats_moments", { (s, dir) =>
        val dq = col("l_quantity").cast(DecimalType(18, 2))
        val dp = col("l_extendedprice").cast(DecimalType(18, 2))
        val m = Tables(s, dir, "lineitem").groupBy("l_returnflag").agg(
          count(lit(1)).as("n"),
          count(lit(1)).cast(DoubleType).as("nd"),
          sum(dq).cast(DoubleType).as("s1"),
          sum(dq * dq).cast(DoubleType).as("s2"),
          sum(dp).cast(DoubleType).as("p1"),
          sum(dp * dp).cast(DoubleType).as("p2"),
          sum(dq * dp).cast(DoubleType).as("c11"))
        val varQty = (col("s2") - col("s1") * col("s1") / col("nd")) / (col("nd") - 1.0)
        // Degenerate groups guarded EXPLICITLY (both engines emit the same
        // NULL): Spark's 0/0 is NULL but DuckDB's is NaN, so an unguarded
        // zero-variance group would hash-differ.
        val corrDen = (col("s2") - col("s1") * col("s1") / col("nd")) *
          (col("p2") - col("p1") * col("p1") / col("nd"))
        m.select(col("l_returnflag"), col("n"),
            (col("s1") / col("nd")).as("mean_qty"),
            when(col("nd") > 1.0, varQty).as("var_qty"),
            when(col("nd") > 1.0, sqrt(varQty)).as("stddev_qty"),
            when(corrDen > 0.0, (col("c11") - col("s1") * col("p1") / col("nd"))
              / sqrt(corrDen)).as("corr_qty_price"))
          .orderBy("l_returnflag")
      },
      Some("""WITH m AS (
             |  SELECT l_returnflag, count(*) AS n, CAST(count(*) AS DOUBLE) AS nd,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s2,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS p1,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS p2,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS c11
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag, n,
             |  s1 / nd AS mean_qty,
             |  CASE WHEN nd > 1.0 THEN (s2 - s1 * s1 / nd) / (nd - 1.0) END AS var_qty,
             |  CASE WHEN nd > 1.0 THEN sqrt((s2 - s1 * s1 / nd) / (nd - 1.0)) END AS stddev_qty,
             |  CASE WHEN (s2 - s1 * s1 / nd) * (p2 - p1 * p1 / nd) > 0.0
             |    THEN (c11 - s1 * p1 / nd) / sqrt((s2 - s1 * s1 / nd) * (p2 - p1 * p1 / nd))
             |  END AS corr_qty_price
             |FROM m ORDER BY l_returnflag""".stripMargin)),

    // PII redaction: synthesize deterministic email/phone contamination,
    // then scrub with regexes whose semantics agree between Java regex
    // (Spark, codegen'd) and RE2 (DuckDB) — no backrefs/lookarounds. The
    // scrub is per-row and shuffle-free; counts + a fingerprint of the
    // redacted text gate that both engines redacted identically.
    Q("q108_pii_redact", { (s, dir) =>
        val emailRe = "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+\\.[a-z]+"
        val phoneRe = "\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
        val dirty = concat(col("text"),
          lit(" contact user"), col("doc_id").cast(StringType),
          lit("@mail"), (col("doc_id") % 7).cast(StringType), lit(".com or +1-555-"),
          lpad((col("doc_id") % 10000).cast(StringType), 4, "0"))
        Tables(s, dir, "documents").select(col("doc_id"), dirty.as("text"))
          .select(col("doc_id"),
            regexp_count(col("text"), lit(emailRe)).as("n_emails"),
            regexp_count(col("text"), lit(phoneRe)).as("n_phones"),
            md5(regexp_replace(regexp_replace(col("text"), emailRe, "<EMAIL>"),
              phoneRe, "<PHONE>")).as("redacted_fp"))
          .orderBy("doc_id")
      },
      Some("""WITH dirty AS (
             |  SELECT doc_id,
             |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail'
             |      || CAST(doc_id % 7 AS VARCHAR) || '.com or +1-555-'
             |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+\.[a-z]+')) AS INTEGER) AS n_emails,
             |  CAST(len(regexp_extract_all(text, '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS INTEGER) AS n_phones,
             |  md5(regexp_replace(regexp_replace(text,
             |    '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+\.[a-z]+', '<EMAIL>', 'g'),
             |    '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS redacted_fp
             |FROM dirty ORDER BY doc_id""".stripMargin)),

    // Correlated LATERAL subquery with per-group ORDER BY + LIMIT.
    Q("q109_lateral_topk", { (s, dir) =>
        Tables(s, dir, "customer").createOrReplaceTempView("customer")
        Tables(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql(LateralSql)
      },
      Some(LateralSql)),

    // Modern aggregate family: count_if / bool_and / bool_or / max_by /
    // min_by. The *_by selectors key on the UNIQUE o_orderkey so the pick
    // is deterministic under any partitioning.
    Q("q116_modern_agg", { (s, dir) =>
        Tables(s, dir, "orders").groupBy("o_orderstatus").agg(
            count_if(col("o_totalprice") > 200000.0).as("n_big"),
            bool_and(col("o_totalprice") > 1000.0).as("all_over_1k"),
            bool_or(col("o_orderpriority") === "1-URGENT").as("any_urgent"),
            max_by(col("o_orderpriority"), col("o_orderkey")).as("latest_prio"),
            min_by(col("o_orderpriority"), col("o_orderkey")).as("first_prio"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus,
             |  CAST(count_if(o_totalprice > 200000.0) AS BIGINT) AS n_big,
             |  bool_and(o_totalprice > 1000.0) AS all_over_1k,
             |  bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
             |  max_by(o_orderpriority, o_orderkey) AS latest_prio,
             |  min_by(o_orderpriority, o_orderkey) AS first_prio
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Approximate percentiles via Spark's mergeable quantile sketch
    // (Greenwald-Khanna) — the 100 TB quantile path: partial sketches merge
    // across executors instead of a global sort. Approximate by design, so
    // rows-only here; CorpusSpec bounds it against the exact percentile.
    Q("q97_agg_approx_percentile", { (s, dir) =>
        Tables(s, dir, "lineitem").groupBy("l_returnflag").agg(
            percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50"),
            percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("p95"))
          .orderBy("l_returnflag")
      },
      None)
  )
}
