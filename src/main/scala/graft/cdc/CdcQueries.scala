package graft.cdc

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC operator surface as oracle-checked batch queries (SURVEY.md §2A/§2B).
  *
  * The fixtures carry no change streams, so each query derives one
  * deterministically from the parquet tables (both the Spark program and the
  * DuckDB oracle derive the *same* stream), then exercises the real CDC
  * operators — envelope render/parse, wildcard routing, changed-columns
  * diff, JDBC type catalog, latest-image merge — on it.
  */
object CdcQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** A Long rendered as MySQL's dashed server-uuid text (fixture side of
    * the q129-q131 family; the oracle SQL mirrors it with printf/substr).
    */
  private def uuidOfLong(v: Long): String = {
    val hex = f"$v%032x"
    s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-" +
      s"${hex.substring(16, 20)}-${hex.substring(20)}"
  }

  /** Shared transaction-fixture encoder for q127/q129 and
    * [[gtidAssembled]] (q130/q131): `rows` split into two BEGIN..XID
    * transactions (first ceil(n/2) rows then the rest, xids 2·gid+1 and
    * 2·gid+2, commit ts 1700000000+xid), one WRITE event per row encoded
    * by `writeVals`, each transaction GTID-framed with `sid:xid` when
    * `sid` is set. One encoder, one wire shape — the queries diverge only
    * in schema and sid derivation, not in framing.
    */
  private def txnFixtureEvents(schema: Array[BinlogColumn], sid: Option[String],
      gid: Long, rows: Seq[org.apache.spark.sql.Row],
      writeVals: org.apache.spark.sql.Row => Seq[Any]): Seq[Array[Byte]] = {
    import BinlogTxnCodec.{QueryType, XidType}
    def writeEv(r: org.apache.spark.sql.Row) = BinlogRowCodec.encodeEvent(
      BinlogRowCodec.WriteV2, BinlogRowCodec.encodeRows(
        BinlogRowCodec.WriteV2, schema, Seq(writeVals(r))))
    def txn(part: Seq[org.apache.spark.sql.Row], xid: Long): Seq[Array[Byte]] =
      if (part.isEmpty) Nil
      else {
        val framing = sid.toSeq.map(u =>
          BinlogRowCodec.encodeEvent(BinlogGtidCodec.GtidType,
            BinlogGtidCodec.encodeGtid(u, xid))) :+
          BinlogRowCodec.encodeEvent(QueryType,
            BinlogTxnCodec.encodeQuery("db", "BEGIN"))
        (framing ++ part.map(writeEv)) :+
          BinlogRowCodec.encodeEvent(XidType,
            BinlogTxnCodec.encodeXid(xid), timestamp = 1700000000L + xid)
      }
    val h = (rows.length + 1) / 2
    txn(rows.take(h), gid * 2 + 1) ++ txn(rows.drop(h), gid * 2 + 2)
  }

  /** XA fixture for q176: each gid group holds one distributed
    * transaction — `XA START x` … WRITEs … `XA END x` … XA_PREPARE(x) —
    * whose fate is formula-derived from (gid/4) % 4:
    * 0 = one-phase commit (the prepare carries the flag, no outcome
    * statement), 2 = a later `XA ROLLBACK x`, 3 = no outcome (stays
    * prepared) — all in the single file `b<gid>`.
    *
    * Fate 1 is the ORACLE-VISIBLE xid-REUSE case (MySQL permits reusing
    * an xid once the previous transaction under it completes) with its
    * outcomes split across NUMERICALLY-ordered files: the group's rows
    * split into two spans under the SAME xid —
    *   file `b<gid>`:        span 1 (first half) … prepare … XA ROLLBACK x
    *   file `b<gid·10+9>`:   span 2 (second half) … prepare
    *   file `b<gid·100+10>`: XA COMMIT x
    * so span 1 must resolve to the rollback and span 2 to the commit
    * (a min-per-xid outcome would hand span 2 the rollback), and since
    * suffix gid·100+10 sorts BEFORE gid·10+9 lexicographically (e.g.
    * "410" < "49") but after it numerically, span 2's committed state
    * also pins the numeric binlog-file ordering — both r10 ADVICE fixes,
    * now held by the DuckDB gate instead of only TransactionsSpec.
    * The suffix spaces never collide: plain gids are multiples of 4,
    * gid·10+9 is odd, gid·100+10 ≡ 2 (mod 4).
    *
    * gtrid = ascii "g<gid>", empty bqual, formatID 1 — so the oracle
    * rebuilds the xid text with lower(hex(...)). Returns (file, event)
    * pairs; the global array position is the ord (monotone within each
    * file).
    */
  private def xaFixtureEvents(schema: Array[BinlogColumn], gid: Long,
      rows: Seq[org.apache.spark.sql.Row],
      writeVals: org.apache.spark.sql.Row => Seq[Any]): Seq[(String, Array[Byte])] = {
    import BinlogTxnCodec.{QueryType, XaPrepareType}
    val gtrid = s"g$gid".getBytes("UTF-8")
    val ghex = gtrid.map(b => f"$b%02x").mkString
    val xid = BinlogTxnCodec.xidText(ghex, "", 1)
    def q(sql: String) = BinlogRowCodec.encodeEvent(QueryType,
      BinlogTxnCodec.encodeQuery("db", sql))
    def writeEv(r: org.apache.spark.sql.Row) = BinlogRowCodec.encodeEvent(
      BinlogRowCodec.WriteV2, BinlogRowCodec.encodeRows(
        BinlogRowCodec.WriteV2, schema, Seq(writeVals(r))))
    def span(part: Seq[org.apache.spark.sql.Row], onePhase: Boolean) =
      (q(s"XA START $xid") +: part.map(writeEv)) ++ Seq(
        q(s"XA END $xid"),
        BinlogRowCodec.encodeEvent(XaPrepareType,
          BinlogTxnCodec.encodeXaPrepare(onePhase, 1, gtrid, Array.emptyByteArray)))
    val fate = (gid / 4) % 4
    if (fate == 1) {
      val h = (rows.length + 1) / 2
      (span(rows.take(h), onePhase = false) :+ q(s"XA ROLLBACK $xid"))
        .map((s"b$gid", _)) ++
        span(rows.drop(h), onePhase = false).map((s"b${gid * 10 + 9}", _)) ++
        Seq((s"b${gid * 100 + 10}", q(s"XA COMMIT $xid")))
    } else {
      val events = span(rows, onePhase = fate == 0) ++
        (if (fate == 2) Seq(q(s"XA ROLLBACK $xid")) else Nil)
      events.map((s"b$gid", _))
    }
  }

  /** Fixture routing table (FIXTURES.md §4 shapes): prefix, suffix, infix,
    * exact patterns + a blacklist, over (lang, source) as (db, table).
    */
  val fixtureInstances: Seq[Instance] = Seq(
    Instance("the_kafka", "t_en_src", schemas = "en", tables = "src*", blackList = Seq("src3")),
    Instance("the_redis", "t_all_0", schemas = "*", tables = "*0"),
    Instance("the_kafka", "t_mid", schemas = "e*", tables = "s*2"))

  val qs: Seq[Q] = Seq(

    // Latest-image merge over a synthesized change stream: INSERT per order,
    // UPDATE (price+1000) for keys %3=0, DELETE for keys %7=0; highest
    // change id wins per pk, DELETE tombstones drop the key.
    Q("q33_cdc_latest_image", { (s, dir) =>
        val o = t(s, dir, "orders")
        val ins = o.select(
          (col("o_orderkey") * 3).as("cid"), col("o_orderkey").as("pk"),
          lit("INSERT").as("type"), col("o_totalprice").as("price"))
        val upd = o.filter(col("o_orderkey") % 3 === 0).select(
          (col("o_orderkey") * 3 + 1).as("cid"), col("o_orderkey").as("pk"),
          lit("UPDATE").as("type"), (col("o_totalprice") + 1000.0).as("price"))
        val del = o.filter(col("o_orderkey") % 7 === 0).select(
          (col("o_orderkey") * 3 + 2).as("cid"), col("o_orderkey").as("pk"),
          lit("DELETE").as("type"), lit(null).cast(DoubleType).as("price"))
        CdcMerge.latestImage(ins.union(upd).union(del), Seq("pk"), "cid")
          .select("pk", "type", "price")
          .orderBy("pk")
      },
      Some("""WITH chg AS (
             |  SELECT o_orderkey*3 AS cid, o_orderkey AS pk, 'INSERT' AS type, o_totalprice AS price FROM orders
             |  UNION ALL
             |  SELECT o_orderkey*3+1, o_orderkey, 'UPDATE', o_totalprice + 1000.0 FROM orders WHERE o_orderkey % 3 = 0
             |  UNION ALL
             |  SELECT o_orderkey*3+2, o_orderkey, 'DELETE', NULL FROM orders WHERE o_orderkey % 7 = 0
             |), ranked AS (
             |  SELECT *, row_number() OVER (PARTITION BY pk ORDER BY cid DESC) AS rn FROM chg
             |)
             |SELECT pk, type, price FROM ranked WHERE rn = 1 AND type <> 'DELETE'
             |ORDER BY pk""".stripMargin)),

    // SCD2 history over the same synthesized change stream: every
    // surviving version with its [valid_from, valid_to) ordinal interval
    // (DELETE closes the last version without opening one). Open intervals
    // are pinned to -1 so both engines emit null-free BIGINTs (a nullable
    // int column lands as float64 in the driver's pandas compare).
    Q("q100_cdc_scd2_history", { (s, dir) =>
        val o = t(s, dir, "orders")
        val ins = o.select(
          (col("o_orderkey") * 3).as("cid"), col("o_orderkey").as("pk"),
          lit("INSERT").as("type"), col("o_totalprice").as("price"))
        val upd = o.filter(col("o_orderkey") % 3 === 0).select(
          (col("o_orderkey") * 3 + 1).as("cid"), col("o_orderkey").as("pk"),
          lit("UPDATE").as("type"), (col("o_totalprice") + 1000.0).as("price"))
        val del = o.filter(col("o_orderkey") % 7 === 0).select(
          (col("o_orderkey") * 3 + 2).as("cid"), col("o_orderkey").as("pk"),
          lit("DELETE").as("type"), lit(null).cast(DoubleType).as("price"))
        CdcMerge.scd2(ins.union(upd).union(del), Seq("pk"), "cid")
          .select(col("pk"), col("valid_from"),
            coalesce(col("valid_to"), lit(-1L)).as("valid_to"),
            col("is_current").cast(IntegerType).as("is_current"),
            col("price"))
          .orderBy("pk", "valid_from")
      },
      Some("""WITH chg AS (
             |  SELECT o_orderkey*3 AS cid, o_orderkey AS pk, 'INSERT' AS type, o_totalprice AS price FROM orders
             |  UNION ALL
             |  SELECT o_orderkey*3+1, o_orderkey, 'UPDATE', o_totalprice + 1000.0 FROM orders WHERE o_orderkey % 3 = 0
             |  UNION ALL
             |  SELECT o_orderkey*3+2, o_orderkey, 'DELETE', NULL FROM orders WHERE o_orderkey % 7 = 0
             |), v AS (
             |  SELECT pk, type, price, cid AS valid_from,
             |    coalesce(lead(cid) OVER (PARTITION BY pk ORDER BY cid), -1) AS valid_to
             |  FROM chg)
             |SELECT pk, valid_from, valid_to, CAST(valid_to = -1 AS INTEGER) AS is_current, price
             |FROM v WHERE type <> 'DELETE' ORDER BY pk, valid_from""".stripMargin)),

    // Dead-letter split: corrupt envelope lines (truncated JSON here) must
    // route to a DLQ, not kill the job — the reference panics on malformed
    // input (`binlog.rs` unwraps); at 100 TB one bad record in a trillion
    // cannot take down the stream. PERMISSIVE `from_json` yields a null
    // struct for unparseable text; the verdict column proves BOTH
    // directions: every valid line parses, every truncated line lands in
    // the DLQ.
    Q("q104_cdc_dlq_split", { (s, dir) =>
        val o = t(s, dir, "orders").sortWithinPartitions("o_orderkey")
        val raw = o.select(col("o_orderkey").as("line_id"), Envelope.build(
          id = col("o_orderkey"),
          database = lit("testdb"),
          table = lit("orders"),
          pkNames = array(lit("o_orderkey")),
          dmlType = lit("INSERT"),
          es = unix_timestamp(col("o_orderdate")) * 1000,
          ts = unix_timestamp(col("o_orderdate")) * 1000 + 123,
          sqlType = map(lit("o_orderkey"), lit(-5)),
          mysqlType = map(lit("o_orderkey"), lit("bigint")),
          data = array(map(lit("o_orderkey"), col("o_orderkey").cast(StringType))),
          old = array(map().cast(MapType(StringType, StringType)))
        ).as("line"))
        val corrupted = raw.select(col("line_id"),
          when(col("line_id") % 13 === 0, substring(col("line"), 1, 25))
            .otherwise(col("line")).as("line"))
        corrupted.select(col("line_id"),
            when(Envelope.parse(col("line")).getField("id").isNull, "dlq")
              .otherwise("ok").as("verdict"))
          .orderBy("line_id")
      },
      Some("""SELECT o_orderkey AS line_id,
             |CASE WHEN o_orderkey % 13 = 0 THEN 'dlq' ELSE 'ok' END AS verdict
             |FROM orders ORDER BY line_id""".stripMargin)),

    // Envelope render → Canal-JSON → parse round-trip; the oracle computes
    // the expected post-round-trip projection directly (round trip lossless).
    // The deterministic sort runs BELOW the codec projection (id IS
    // o_orderkey) and within partitions only: a global sort above the
    // codec would make the range sampler execute the whole
    // to_json/from_json chain a second time (measured 4.0s vs 1.7s at
    // sf0.1), and the compare harness row-sorts anyway, so partition-local
    // determinism suffices. Narrow projections preserve the order.
    Q("q34_cdc_envelope_roundtrip", { (s, dir) =>
        val o = t(s, dir, "orders").sortWithinPartitions("o_orderkey")
        val raw = o.select(Envelope.build(
          id = col("o_orderkey"),
          database = lit("testdb"),
          table = lit("orders"),
          pkNames = array(lit("o_orderkey")),
          dmlType = lit("INSERT"),
          es = unix_timestamp(col("o_orderdate")) * 1000,
          ts = unix_timestamp(col("o_orderdate")) * 1000 + 123,
          sqlType = map(lit("o_orderkey"), lit(-5), lit("o_orderstatus"), lit(1)),
          mysqlType = map(lit("o_orderkey"), lit("bigint"), lit("o_orderstatus"), lit("char(1)")),
          data = array(map(
            lit("o_orderkey"), col("o_orderkey").cast(StringType),
            lit("o_orderstatus"), col("o_orderstatus"))),
          old = array(map().cast(MapType(StringType, StringType)))
        ).as("raw"))
        raw.select(Envelope.parse(col("raw")).as("e"))
          .select(
            col("e.id").as("id"),
            col("e.database").as("db"),
            col("e.table").as("tbl"),
            col("e.type").as("dml"),
            col("e.es").as("es"),
            element_at(element_at(col("e.data"), 1), "o_orderkey").cast(LongType).as("pk"),
            element_at(element_at(col("e.data"), 1), "o_orderstatus").as("status"),
            element_at(col("e.sqlType"), "o_orderkey").as("pk_jdbc"))
      },
      Some("""SELECT o_orderkey AS id, 'testdb' AS db, 'orders' AS tbl, 'INSERT' AS dml,
             |CAST(epoch(o_orderdate) AS BIGINT)*1000 AS es, o_orderkey AS pk,
             |o_orderstatus AS status, -5 AS pk_jdbc
             |FROM orders ORDER BY id""".stripMargin)),

    // Wildcard instance routing + blacklist, multicast as explode of routes.
    Q("q35_cdc_route_multicast", { (s, dir) =>
        val d = t(s, dir, "documents")
        d.select(col("doc_id"),
            explode(Routing.routes(fixtureInstances, col("lang"), col("source"))).as("r"))
          .select(col("doc_id"), col("r.mq").as("mq"), col("r.topic").as("topic"))
          .orderBy("doc_id", "mq", "topic")
      },
      Some("""SELECT doc_id, mq, topic FROM (
             |  SELECT doc_id, 'the_kafka' AS mq, 't_en_src' AS topic FROM documents
             |  WHERE lang = 'en' AND source <> 'src3' AND source LIKE 'src%'
             |  UNION ALL
             |  SELECT doc_id, 'the_redis', 't_all_0' FROM documents WHERE source LIKE '%0'
             |  UNION ALL
             |  SELECT doc_id, 'the_kafka', 't_mid' FROM documents
             |  WHERE lang LIKE 'e%' AND source LIKE 's%' AND source LIKE '%2'
             |) ORDER BY doc_id, mq, topic""".stripMargin)),

    // Changed-columns diff (UPDATE `old` semantics) via map_filter.
    Q("q36_cdc_changed_diff", { (s, dir) =>
        val o = t(s, dir, "orders")
        val priceStr = col("o_totalprice").cast(DecimalType(18, 2)).cast(StringType)
        val oldImg = map(
          lit("status"), col("o_orderstatus"),
          lit("price"), priceStr,
          lit("prio"), col("o_orderpriority"))
        val newImg = map(
          lit("status"), when(col("o_orderstatus") === "F", "X").otherwise(col("o_orderstatus")),
          lit("price"), when(col("o_orderkey") % 2 === 0,
            (col("o_totalprice") + 1).cast(DecimalType(18, 2)).cast(StringType)).otherwise(priceStr),
          lit("prio"), col("o_orderpriority"))
        // sort below the map-build/diff/explode chain (q34 range-sampler
        // note); explode preserves row order, map order is deterministic
        o.sortWithinPartitions("o_orderkey")
          .select(col("o_orderkey"),
            explode(Envelope.changedColumns(oldImg, newImg)).as(Seq("col_name", "old_val")))
      },
      Some("""SELECT o_orderkey, col_name, old_val FROM (
             |  SELECT o_orderkey, 'status' AS col_name, o_orderstatus AS old_val FROM orders
             |  WHERE o_orderstatus = 'F'
             |  UNION ALL
             |  SELECT o_orderkey, 'price', CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)
             |  FROM orders WHERE o_orderkey % 2 = 0
             |) ORDER BY o_orderkey, col_name""".stripMargin)),

    // Metadata enrichment: broadcast catalog join (§2A#8). The catalog rows
    // stand in for cached DESC results; the left join keeps unknown tables
    // (negative-cache analog) with null metadata.
    Q("q53_cdc_catalog_enrich", { (s, dir) =>
        import s.implicits._
        val catalog = Seq(
          ("testdb", "orders", "o_orderkey", "bigint"),
          ("testdb", "lineitem", "l_orderkey,l_linenumber", "bigint")
        ).toDF("database", "table", "pk_names", "pk_type")
        val events = t(s, dir, "orders").select(
          col("o_orderkey").as("id"),
          lit("testdb").as("database"),
          when(col("o_orderkey") % 3 === 0, "lineitem")
            .when(col("o_orderkey") % 3 === 1, "orders")
            .otherwise("dropped_tbl").as("table"))
        Catalog.enrich(events, catalog)
          .select(col("id"), col("database").as("db_name"),
            col("table").as("tbl_name"), col("pk_names"), col("pk_type"))
          .orderBy("id")
      },
      Some("""WITH catalog(db_name, tbl_name, pk_names, pk_type) AS (
             |  SELECT * FROM (VALUES ('testdb', 'orders', 'o_orderkey', 'bigint'),
             |         ('testdb', 'lineitem', 'l_orderkey,l_linenumber', 'bigint'))
             |), events AS (
             |  SELECT o_orderkey AS id, 'testdb' AS db_name,
             |    CASE WHEN o_orderkey % 3 = 0 THEN 'lineitem'
             |         WHEN o_orderkey % 3 = 1 THEN 'orders'
             |         ELSE 'dropped_tbl' END AS tbl_name
             |  FROM orders)
             |SELECT id, e.db_name, e.tbl_name, pk_names, pk_type
             |FROM events e LEFT JOIN catalog c
             |  ON e.db_name = c.db_name AND e.tbl_name = c.tbl_name
             |ORDER BY id""".stripMargin)),

    // MySQL-type-string → JDBC code catalog, expression chain + UDF exemplar.
    Q("q37_cdc_jdbc_types", { (s, dir) =>
        val names = Seq(
          "tinyint(1)", "smallint", "mediumint", "int(11)", "bigint(20)",
          "float", "double", "decimal(10,2)", "date", "time", "year",
          "datetime(3)", "timestamp", "char(10)", "varchar(32)", "longtext",
          "mediumblob", "geometry")
        val types = array(names.map(lit): _*)
        t(s, dir, "orders")
          .sortWithinPartitions("o_orderkey")
          .select(col("o_orderkey"),
            element_at(types, (col("o_orderkey") % 18 + 1).cast(IntegerType)).as("mysql_type"))
          .withColumn("jdbc_code", Catalog.jdbcCodeCol(col("mysql_type")))
          .withColumn("jdbc_code_udf", Catalog.jdbcCodeUdf(col("mysql_type")))
      },
      Some("""WITH typed AS (
             |  SELECT o_orderkey,
             |    (['tinyint(1)','smallint','mediumint','int(11)','bigint(20)','float','double',
             |      'decimal(10,2)','date','time','year','datetime(3)','timestamp','char(10)',
             |      'varchar(32)','longtext','mediumblob','geometry'])[CAST(o_orderkey % 18 AS INTEGER) + 1]
             |      AS mysql_type
             |  FROM orders
             |), coded AS (
             |  SELECT o_orderkey, mysql_type,
             |    CASE
             |      WHEN mysql_type LIKE 'tinyint%' THEN -6
             |      WHEN mysql_type LIKE 'smallint%' THEN 5
             |      WHEN mysql_type LIKE 'mediumint%' OR mysql_type LIKE 'int%' THEN 4
             |      WHEN mysql_type LIKE 'bigint%' THEN -5
             |      WHEN mysql_type LIKE 'float%' THEN 7
             |      WHEN mysql_type LIKE 'double%' THEN 8
             |      WHEN mysql_type LIKE 'decimal%' THEN 3
             |      WHEN mysql_type = 'date' THEN 91
             |      WHEN mysql_type = 'time' THEN 92
             |      WHEN mysql_type LIKE 'year%' THEN 12
             |      WHEN mysql_type LIKE 'datetime%' OR mysql_type LIKE 'timestamp%' THEN 93
             |      WHEN mysql_type LIKE 'char%' THEN 1
             |      WHEN mysql_type LIKE 'varchar%' THEN 12
             |      WHEN mysql_type LIKE '%blob' THEN 2004
             |      WHEN mysql_type LIKE '%text' THEN 2005
             |      ELSE -999 END AS jdbc_code
             |  FROM typed
             |)
             |SELECT o_orderkey, mysql_type, jdbc_code, jdbc_code AS jdbc_code_udf
             |FROM coded ORDER BY o_orderkey""".stripMargin)),

    // Raw-binlog packed DECIMAL decode (§2A#12): deterministic unscaled
    // values are encoded to MySQL's wire format (test-side UDF), decoded by
    // the custom codegen'd expression; the oracle renders the same values
    // as strings directly.
    Q("q65_binlog_decimal", { (s, dir) =>
        val enc134 = udf((u: Long) => BinlogCodec.encodeDecimalUnscaled(u, 13, 4))
        val enc100 = udf((u: Long) => BinlogCodec.encodeDecimalUnscaled(u, 10, 0))
        // sort below the encode/decode chain — see q34's range-sampler note
        t(s, dir, "orders")
          .sortWithinPartitions("o_orderkey")
          .select(col("o_orderkey"),
            ((col("o_orderkey") * 7919) % 2000001 - 1000000).as("u1"),
            ((col("o_orderkey") * 104729) % 1000000000).as("u2"))
          .select(col("o_orderkey"),
            BinlogDecode.packedDecimal(enc134(col("u1")), 13, 4).as("dec_13_4"),
            BinlogDecode.packedDecimal(enc100(col("u2")), 10, 0).as("dec_10_0"))
      },
      Some("""SELECT o_orderkey,
             |  concat(CASE WHEN u1 < 0 THEN '-' ELSE '' END,
             |         CAST(abs(u1) // 10000 AS VARCHAR), '.',
             |         lpad(CAST(abs(u1) % 10000 AS VARCHAR), 4, '0')) AS dec_13_4,
             |  CAST(u2 AS VARCHAR) AS dec_10_0
             |FROM (SELECT o_orderkey,
             |        (o_orderkey * 7919) % 2000001 - 1000000 AS u1,
             |        (o_orderkey * 104729) % 1000000000 AS u2
             |      FROM orders)
             |ORDER BY o_orderkey""".stripMargin)),

    // Raw-binlog bit-packed DATE / TIME2 / DATETIME2 / TIMESTAMP2 decode
    // (§2A#12, reference binlog.rs:249-310) through the codegen'd
    // expressions, round-tripped from deterministic components.
    Q("q66_binlog_temporal", { (s, dir) =>
        val encDate = udf((y: Int, m: Int, d: Int) => BinlogCodec.encodeDate(y, m, d))
        val encTime = udf((neg: Boolean, h: Int, m: Int, sec: Int) =>
          BinlogCodec.encodeTime(neg, h, m, sec, 0L, 0))
        val encDt = udf((y: Int, mo: Int, d: Int, h: Int, mi: Int, sec: Int, f: Long) =>
          BinlogCodec.encodeDatetime(y, mo, d, h, mi, sec, f, 3))
        val encTs = udf((ep: Long) => BinlogCodec.encodeTimestamp(ep, 0L, 0))
        val k = col("o_orderkey")
        t(s, dir, "orders").sortWithinPartitions("o_orderkey").select(k,
            encDate((k % 130 + 1970).cast(IntegerType), (k % 12 + 1).cast(IntegerType),
              (k % 28 + 1).cast(IntegerType)).as("db"),
            encTime(k % 5 === 0, (k % 100).cast(IntegerType),
              ((k * 3) % 60).cast(IntegerType), ((k * 11) % 60).cast(IntegerType)).as("tb"),
            encDt((k % 130 + 1970).cast(IntegerType), (k % 12 + 1).cast(IntegerType),
              (k % 28 + 1).cast(IntegerType), (k % 24).cast(IntegerType),
              (k % 60).cast(IntegerType), ((k * 7) % 60).cast(IntegerType),
              k % 1000).as("dtb"),
            encTs(k + 1500000000L).as("tsb"))
          .select(k,
            BinlogDecode.packedDate(col("db")).as("date_s"),
            BinlogDecode.packedTime(col("tb"), 0).as("time_s"),
            BinlogDecode.packedDatetime(col("dtb"), 3).as("datetime_s"),
            BinlogDecode.packedTimestamp(col("tsb"), 0).as("ts_s"))
      },
      Some("""WITH c AS (
             |  SELECT o_orderkey,
             |    1970 + o_orderkey % 130 AS y, o_orderkey % 12 + 1 AS mo, o_orderkey % 28 + 1 AS d,
             |    o_orderkey % 24 AS h, o_orderkey % 60 AS mi, (o_orderkey * 7) % 60 AS sec,
             |    o_orderkey % 1000 AS f3,
             |    o_orderkey % 100 AS th, (o_orderkey * 3) % 60 AS tm, (o_orderkey * 11) % 60 AS ts2,
             |    1500000000 + o_orderkey AS ep
             |  FROM orders)
             |SELECT o_orderkey,
             |  concat(lpad(CAST(y AS VARCHAR),4,'0'),'-',lpad(CAST(mo AS VARCHAR),2,'0'),'-',
             |         lpad(CAST(d AS VARCHAR),2,'0')) AS date_s,
             |  concat(CASE WHEN o_orderkey % 5 = 0 AND (th <> 0 OR tm <> 0 OR ts2 <> 0)
             |              THEN '-' ELSE '' END,
             |         lpad(CAST(th AS VARCHAR),2,'0'),':',lpad(CAST(tm AS VARCHAR),2,'0'),':',
             |         lpad(CAST(ts2 AS VARCHAR),2,'0')) AS time_s,
             |  concat(lpad(CAST(y AS VARCHAR),4,'0'),'-',lpad(CAST(mo AS VARCHAR),2,'0'),'-',
             |         lpad(CAST(d AS VARCHAR),2,'0'),' ',lpad(CAST(h AS VARCHAR),2,'0'),':',
             |         lpad(CAST(mi AS VARCHAR),2,'0'),':',lpad(CAST(sec AS VARCHAR),2,'0'),'.',
             |         lpad(CAST(f3 AS VARCHAR),3,'0')) AS datetime_s,
             |  CAST(ep AS VARCHAR) AS ts_s
             |FROM c ORDER BY o_orderkey""".stripMargin)),

    // DDL envelopes (§2A QueryEvent, reference binlog.rs:794-811): build
    // isDdl=true envelopes with statement text, round-trip, extract the
    // verb/target with codegen'd regexes, and feed the DDL stream into the
    // broadcast-catalog invalidation (Catalog.applyDdl) — `still_cached`
    // proves which tables survived.
    Q("q67_cdc_ddl", { (s, dir) =>
        import s.implicits._
        val n = t(s, dir, "nation")
        val key = col("n_nationkey")
        val isDdl = key % 3 =!= 2
        val sqlText = when(key % 3 === 0, concat(lit("DROP TABLE t_"), key))
          .when(key % 3 === 1, concat(lit("ALTER TABLE t_"), key, lit(" ADD COLUMN extra int")))
          .otherwise(lit(""))
        val raw = n.select(Envelope.build(
          id = key, database = lit("testdb"),
          table = concat(lit("t_"), key),
          pkNames = array(lit("id")),
          dmlType = when(key % 3 === 0, "DROP").when(key % 3 === 1, "ALTER").otherwise("INSERT"),
          es = key * 1000 + 1700000000000L,
          ts = key * 1000 + 1700000000123L,
          sqlType = map(lit("id"), lit(-5)),
          mysqlType = map(lit("id"), lit("bigint")),
          data = array().cast(ArrayType(MapType(StringType, StringType))),
          old = array().cast(ArrayType(MapType(StringType, StringType))),
          isDdl = isDdl, sqlText = sqlText).as("raw"))
        val parsed = raw.select(Envelope.parse(col("raw")).as("e"))
          .select(col("e.id").as("id"), col("e.database").as("database"),
            col("e.table").as("table"), col("e.isDdl").as("is_ddl"),
            Envelope.ddlOp(col("e")).as("op"), Envelope.ddlTable(col("e")).as("tbl_name"))
        val catalog = t(s, dir, "nation").select(
          lit("testdb").as("database"), concat(lit("t_"), col("n_nationkey")).as("table"),
          lit("bigint").as("pk_type"))
        val applied = Catalog.applyDdl(catalog, parsed.filter(col("is_ddl"))
          .select(col("database"), concat(col("op"), lit(" TABLE "), col("tbl_name")).as("sql")))
        parsed
          .join(applied.select(col("table"), lit(1).as("hit")), Seq("table"), "left")
          .select(col("id"), col("is_ddl").cast(IntegerType).as("is_ddl"),
            col("op"), col("tbl_name"), coalesce(col("hit"), lit(0)).as("still_cached"))
          .orderBy("id")
      },
      Some("""SELECT n_nationkey AS id,
             |  CASE WHEN n_nationkey % 3 <> 2 THEN 1 ELSE 0 END AS is_ddl,
             |  CASE WHEN n_nationkey % 3 = 0 THEN 'DROP'
             |       WHEN n_nationkey % 3 = 1 THEN 'ALTER' ELSE '' END AS op,
             |  CASE WHEN n_nationkey % 3 = 2 THEN ''
             |       ELSE 't_' || CAST(n_nationkey AS VARCHAR) END AS tbl_name,
             |  CASE WHEN n_nationkey % 3 = 2 THEN 1 ELSE 0 END AS still_cached
             |FROM nation ORDER BY id""".stripMargin)),

    // Multi-row envelopes (reference packs many rows per binlog event,
    // executor.rs:52-87): three consecutive orders share one envelope's
    // `data` array; posexplode on parse recovers per-row order.
    Q("q68_cdc_multirow", { (s, dir) =>
        val o = t(s, dir, "orders")
        val grouped = o
          .groupBy((col("o_orderkey") - col("o_orderkey") % 3).as("gid"))
          .agg(sort_array(collect_list(struct(
            col("o_orderkey"), col("o_orderstatus")))).as("rows"))
        // Sort pre-codec: gid order + posexplode's in-array order gives
        // (gid, pos) order without a post-codec global sort (whose range
        // sampler would run the JSON chain twice). sortWithinPartitions
        // keeps per-partition determinism at zero exchange cost; the
        // compare harness is row-order-insensitive (driver + compare.py
        // both sort rows), so a global order is not required.
        val raw = grouped.sortWithinPartitions("gid").select(Envelope.build(
          id = col("gid"), database = lit("testdb"), table = lit("orders"),
          pkNames = array(lit("o_orderkey")), dmlType = lit("INSERT"),
          es = col("gid") * 1000 + 1700000000000L,
          ts = col("gid") * 1000 + 1700000000123L,
          sqlType = map(lit("o_orderkey"), lit(-5)),
          mysqlType = map(lit("o_orderkey"), lit("bigint")),
          data = transform(col("rows"), r => map(
            lit("o_orderkey"), r.getField("o_orderkey").cast(StringType),
            lit("o_orderstatus"), r.getField("o_orderstatus"))),
          old = array().cast(ArrayType(MapType(StringType, StringType)))).as("raw"))
        raw.select(Envelope.parse(col("raw")).as("e"))
          .select(col("e.id").as("gid"),
            // _outer: data is never empty, and the non-outer form makes the
            // optimizer infer a size()>0 filter that re-evaluates the whole
            // JSON codec a second time per row (InferFiltersFromGenerate
            // skips outer generates)
            posexplode_outer(col("e.data")).as(Seq("pos", "img")))
          .select(col("gid"), col("pos"),
            element_at(col("img"), "o_orderkey").cast(LongType).as("pk"),
            element_at(col("img"), "o_orderstatus").as("status"))
      },
      Some("""SELECT o_orderkey - o_orderkey % 3 AS gid,
             |  CAST(row_number() OVER (PARTITION BY o_orderkey - o_orderkey % 3
             |                          ORDER BY o_orderkey) - 1 AS INTEGER) AS pos,
             |  o_orderkey AS pk, o_orderstatus AS status
             |FROM orders ORDER BY gid, pos""".stripMargin)),

    // Raw-binlog WRITE_ROWS decode (§2A#9-11 raw-bytes path, reference
    // binlog.rs:624-667,831-862): 3 orders rows packed per event body
    // (columns-present bitmap, per-row null bitmap — clerk NULL for
    // pk%7=0 — value loop, checksum tail), assembled back into typed rows
    // by the codegen'd whole-row expression.
    Q("q75_binlog_rows_write", { (s, dir) =>
        import org.apache.spark.sql.Row
        val schema = BinlogSchema.fromMysqlTypes(Seq(
          "pk" -> "bigint", "status" -> "varchar(4)", "price" -> "decimal(12,2)",
          "odate" -> "date", "prio" -> "varchar(20)", "cust" -> "int"))
        val enc = udf((rows: Seq[Row]) => BinlogRowCodec.encodeRows(
          BinlogRowCodec.WriteV2, schema,
          rows.map(r => Seq[Any](r.getLong(0), r.getString(1), r.getString(2),
            r.getString(3), if (r.isNullAt(4)) null else r.getString(4), r.getInt(5)))))
        val o = t(s, dir, "orders")
        val grouped = o.groupBy((col("o_orderkey") - col("o_orderkey") % 3).as("gid"))
          .agg(sort_array(collect_list(struct(
            col("o_orderkey").cast(LongType),
            col("o_orderstatus"),
            col("o_totalprice").cast(DecimalType(12, 2)).cast(StringType),
            date_format(col("o_orderdate"), "yyyy-MM-dd"),
            when(col("o_orderkey") % 7 === 0, lit(null)).otherwise(col("o_orderpriority")),
            col("o_custkey").cast(IntegerType)))).as("rows"))
        // gid sort pre-codec + pk-sorted rows per event = deterministic pk
        // order without a post-decode sort (see q34's range-sampler note).
        grouped.sortWithinPartitions("gid").select(col("gid"), enc(col("rows")).as("body"))
          .select(col("gid"),
            BinlogDecode.rows(col("body"), lit(BinlogRowCodec.WriteV2), schema).as("r"))
          // _outer: see q68 — avoids the inferred filter double-decoding
          .select(col("gid"), posexplode_outer(col("r.data")).as(Seq("pos", "m")))
          .select(
            element_at(col("m"), "pk").cast(LongType).as("pk"),
            col("pos"),
            element_at(col("m"), "status").as("status"),
            element_at(col("m"), "price").as("price"),
            element_at(col("m"), "odate").as("odate"),
            element_at(col("m"), "prio").as("prio"),
            element_at(col("m"), "cust").cast(IntegerType).as("cust"))
      },
      Some("""SELECT o_orderkey AS pk,
             |  CAST(row_number() OVER (PARTITION BY o_orderkey - o_orderkey % 3
             |                          ORDER BY o_orderkey) - 1 AS INTEGER) AS pos,
             |  o_orderstatus AS status,
             |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price,
             |  strftime(o_orderdate, '%Y-%m-%d') AS odate,
             |  CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS prio,
             |  CAST(o_custkey AS INTEGER) AS cust
             |FROM orders ORDER BY pk""".stripMargin)),

    // Raw-binlog UPDATE_ROWS decode (reference binlog.rs:669-722): 2-row
    // events with distinct before/after images; the decoded pairs feed the
    // canal changed-columns diff — raw bytes to canal `old` semantics in
    // one declarative pipeline.
    Q("q76_binlog_rows_update", { (s, dir) =>
        import org.apache.spark.sql.Row
        val schema = BinlogSchema.fromMysqlTypes(Seq(
          "pk" -> "bigint", "status" -> "varchar(4)", "price" -> "decimal(12,2)"))
        val enc = udf((rows: Seq[Row]) => BinlogRowCodec.encodeRows(
          BinlogRowCodec.UpdateV2, schema,
          rows.flatMap(r => Seq(
            Seq[Any](r.getLong(0), r.getString(1), r.getString(2)),
            Seq[Any](r.getLong(0), r.getString(3), r.getString(4))))))
        val o = t(s, dir, "orders")
        val oldPrice = col("o_totalprice").cast(DecimalType(12, 2))
        val grouped = o.groupBy((col("o_orderkey") - col("o_orderkey") % 2).as("gid"))
          .agg(sort_array(collect_list(struct(
            col("o_orderkey").cast(LongType),
            col("o_orderstatus"),
            oldPrice.cast(StringType),
            when(col("o_orderkey") % 2 === 0, lit("X")).otherwise(col("o_orderstatus")),
            (oldPrice + lit("1000.00").cast(DecimalType(12, 2))).cast(StringType)))).as("rows"))
        grouped.sortWithinPartitions("gid").select(
            BinlogDecode.rows(enc(col("rows")), lit(BinlogRowCodec.UpdateV2), schema).as("r"))
          .select(explode_outer(zip_with(col("r.old"), col("r.data"),
            (o1, n1) => struct(o1.as("o"), n1.as("n")))).as("p"))
          .select(
            element_at(col("p.o"), "pk").cast(LongType).as("pk"),
            element_at(col("p.o"), "price").as("old_price"),
            element_at(col("p.n"), "price").as("new_price"),
            array_join(array_sort(map_keys(
              Envelope.changedColumns(col("p.o"), col("p.n")))), ",").as("changed"))
      },
      Some("""SELECT o_orderkey AS pk,
             |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS old_price,
             |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) + CAST('1000.00' AS DECIMAL(12,2)) AS VARCHAR) AS new_price,
             |  CASE WHEN o_orderkey % 2 = 0 THEN 'price,status' ELSE 'price' END AS changed
             |FROM orders ORDER BY pk""".stripMargin)),

    // Raw bytes to a fully TYPED DataFrame: rows decode (q75) composed with
    // the typedColumns projection — decimal, date, datetime, epoch
    // timestamp, and a lossless BLOB all restore their Spark types, hashed
    // against the oracle's native-typed columns.
    Q("q77_binlog_rows_typed", { (s, dir) =>
        import org.apache.spark.sql.Row
        val types = Seq("pk" -> "bigint", "price" -> "decimal(12,2)",
          "odate" -> "date", "created" -> "datetime(3)", "epoch" -> "timestamp",
          "payload" -> "blob")
        val schema = BinlogSchema.fromMysqlTypes(types)
        val enc = udf((rows: Seq[Row]) => BinlogRowCodec.encodeRows(
          BinlogRowCodec.WriteV2, schema,
          rows.map(r => Seq[Any](r.getLong(0), r.getString(1), r.getString(2),
            r.getString(3), r.getLong(4), r.getAs[Array[Byte]](5)))))
        val o = t(s, dir, "orders")
        val key = col("o_orderkey")
        val grouped = o.groupBy((key - key % 4).as("gid"))
          .agg(sort_array(collect_list(struct(
            key.cast(LongType),
            col("o_totalprice").cast(DecimalType(12, 2)).cast(StringType),
            date_format(col("o_orderdate"), "yyyy-MM-dd"),
            date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss.SSS"),
            key + 1500000000L,
            concat(lit("blob_"), key.cast(StringType)).cast(BinaryType)))).as("rows"))
        grouped.sortWithinPartitions("gid")
          .select(BinlogDecode.rows(enc(col("rows")),
            lit(BinlogRowCodec.WriteV2), schema).as("r"))
          .select(explode_outer(col("r.data")).as("m"))
          .select(BinlogDecode.typedColumns(col("m"), types): _*)
          // The BLOB round-trips as a true BinaryType (typedColumns above);
          // hex it only for the compare harness, whose pandas sort cannot
          // hash bytearray cells (r3 q77 failure). Spark and DuckDB hex()
          // both emit uppercase. Likewise the DECIMAL(12,2) round-trips
          // natively (CdcQueriesSpec asserts the type) but is compared as
          // its exact canonical string: DECIMAL is the one output type the
          // driver's pandas hash represents differently per reader (r4 q77
          // hash mismatch); decimal→string is lossless so nothing weakens.
          .withColumn("payload", hex(col("payload")))
          .withColumn("price", col("price").cast(StringType))
      },
      Some("""SELECT o_orderkey AS pk,
             |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price,
             |  CAST(o_orderdate AS DATE) AS odate,
             |  o_orderdate AS created,
             |  CAST(to_timestamp(1500000000 + o_orderkey) AS TIMESTAMP) AS epoch,
             |  hex(CAST('blob_' || CAST(o_orderkey AS VARCHAR) AS BLOB)) AS payload
             |FROM orders ORDER BY pk""".stripMargin)),

    // Zero-metadata raw-event decode: WHOLE event bytes (19-byte common
    // header ++ row body, reference binlog.rs:517-544) split by the
    // codegen'd BinlogEventSplit, rows decoded by the header's OWN
    // event_type — no external type column at all.
    Q("q78_binlog_event_split", { (s, dir) =>
        import org.apache.spark.sql.Row
        val schema = BinlogSchema.fromMysqlTypes(Seq(
          "pk" -> "bigint", "status" -> "varchar(4)"))
        val enc = udf((gid: Long, rows: Seq[Row]) => BinlogRowCodec.encodeEvent(
          BinlogRowCodec.WriteV2,
          BinlogRowCodec.encodeRows(BinlogRowCodec.WriteV2, schema,
            rows.map(r => Seq[Any](r.getLong(0), r.getString(1)))),
          timestamp = gid % 100000 + 1700000000L,
          logPos = gid * 100 + 4))
        val o = t(s, dir, "orders")
        val grouped = o.groupBy((col("o_orderkey") - col("o_orderkey") % 3).as("gid"))
          .agg(sort_array(collect_list(struct(
            col("o_orderkey").cast(LongType), col("o_orderstatus")))).as("rows"))
        grouped.sortWithinPartitions("gid")
          .select(BinlogDecode.eventSplit(enc(col("gid"), col("rows"))).as("h"))
          .select(col("h.timestamp").as("hdr_ts"), col("h.event_type").as("ev_type"),
            col("h.log_pos").as("log_pos"),
            BinlogDecode.rows(col("h.body"), col("h.event_type"), schema).as("r"))
          .select(col("hdr_ts"), col("ev_type"), col("log_pos"),
            posexplode_outer(col("r.data")).as(Seq("pos", "m")))
          .select(
            element_at(col("m"), "pk").cast(LongType).as("pk"),
            col("hdr_ts"), col("ev_type"), col("log_pos"),
            element_at(col("m"), "status").as("status"))
      },
      Some("""SELECT o_orderkey AS pk,
             |  (o_orderkey - o_orderkey % 3) % 100000 + 1700000000 AS hdr_ts,
             |  30 AS ev_type,
             |  (o_orderkey - o_orderkey % 3) * 100 + 4 AS log_pos,
             |  o_orderstatus AS status
             |FROM orders ORDER BY pk""".stripMargin)),

    // The full zero-external-metadata CDC read path (SURVEY.md §2A#4/#6,
    // reference main.rs:101-124 pairing + binlog.rs:589-622 TABLE_MAP):
    // ONE interleaved stream of whole events from TWO tables with
    // different schemas; the engine splits each event by its header,
    // decodes TABLE_MAP events into schemas ON THE WIRE, pairs every row
    // event with the latest preceding TABLE_MAP of ITS table_id (the
    // reference's stateful pairing, expressed as an as-of join — one key
    // shuffle), and row-decodes each event with the runtime schema it was
    // paired to. No column spec, type, or name appears outside the bytes:
    // TABLE_MAPs arrive only every 4th table-event-group, so pairing is
    // genuinely keyed + ordered, not adjacent.
    Q("q83_binlog_tablemap_pair", { (s, dir) =>
        import graft.operators.AsofJoin
        val schemaA = BinlogSchema.fromMysqlTypes(Seq(
          "pk" -> "bigint", "price" -> "decimal(12,2)"))
        val schemaB = BinlogSchema.fromMysqlTypes(Seq(
          "pk" -> "bigint", "status" -> "varchar(4)", "cust" -> "int"))
        val tmA = lit(BinlogRowCodec.encodeEvent(19,
          BinlogRowCodec.encodeTableMap(1L, "db1", "ta", schemaA)))
        val tmB = lit(BinlogRowCodec.encodeEvent(19,
          BinlogRowCodec.encodeTableMap(2L, "db1", "tb", schemaB)))
        val encA = udf((pk: Long, price: String) =>
          BinlogRowCodec.encodeEvent(BinlogRowCodec.WriteV2,
            BinlogRowCodec.encodeRows(BinlogRowCodec.WriteV2, schemaA,
              Seq(Seq[Any](pk, price)), tableId = 1L)))
        val encB = udf((pk: Long, status: String, cust: Int) =>
          BinlogRowCodec.encodeEvent(BinlogRowCodec.WriteV2,
            BinlogRowCodec.encodeRows(BinlogRowCodec.WriteV2, schemaB,
              Seq(Seq[Any](pk, status, cust)), tableId = 2L)))
        val o = t(s, dir, "orders").select(col("o_orderkey").as("k"),
            col("o_totalprice").cast(DecimalType(12, 2)).cast(StringType).as("price"),
            col("o_orderstatus").as("status"),
            col("o_custkey").cast(IntegerType).as("cust"))
          .sortWithinPartitions("k")
        val isA = col("k") % 2 === 0
        val writes = o.select((col("k") * 2 + 1).as("seq"),
          when(isA, encA(col("k"), col("price")))
            .otherwise(encB(col("k"), col("status"), col("cust"))).as("ev"))
        val tableMaps = o.filter(col("k") % 8 < 2)
          .select((col("k") * 2).as("seq"), when(isA, tmA).otherwise(tmB).as("ev"))
        val events = writes.unionByName(tableMaps)

        // ---- engine side: bytes in, typed change rows out ----
        val split = events.select(col("seq"),
          BinlogDecode.eventSplit(col("ev")).as("h"))
        val tms = split.filter(col("h.event_type") === 19)
          .select(col("seq"), BinlogDecode.tableMap(col("h.body")).as("tm"))
          .select(col("tm.table_id").as("table_id"), col("seq"), col("tm"))
        val rows = split
          .filter(col("h.event_type").isin(23, 24, 25, 30, 31, 32))
          .select(BinlogDecode.rowTableId(col("h.body")).as("table_id"),
            col("seq"), col("h.event_type").as("et"), col("h.body").as("body"))
        AsofJoin.asofJoin(rows, tms, Seq("table_id"), "seq", "seq", Seq("tm"))
          .select(col("tm.database").as("db"), col("tm.table").as("tbl"),
            BinlogDecode.rowsDynamic(col("body"), col("et"), col("tm.cols")).as("r"))
          // _outer: see q68 — avoids the inferred filter double-decoding
          .select(col("db"), col("tbl"), explode_outer(col("r.data")).as("vals"))
          .select(col("db"), col("tbl"),
            element_at(col("vals"), 1).as("pk"),
            element_at(col("vals"), 2).as("c1"),
            try_element_at(col("vals"), lit(3)).as("c2"))
      },
      Some("""SELECT 'db1' AS db, 'ta' AS tbl, CAST(o_orderkey AS VARCHAR) AS pk,
             |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS c1,
             |  CAST(NULL AS VARCHAR) AS c2
             |FROM orders WHERE o_orderkey % 2 = 0
             |UNION ALL
             |SELECT 'db1', 'tb', CAST(o_orderkey AS VARCHAR), o_orderstatus,
             |  CAST(CAST(o_custkey AS INTEGER) AS VARCHAR)
             |FROM orders WHERE o_orderkey % 2 = 1
             |ORDER BY tbl, pk""".stripMargin)),

    // Binlog FILE replay (reference binlog.rs:768-828 ROTATE dispatch,
    // main.rs:115-124): orders bucketed into file-sized groups; each group
    // becomes a WHOLE binlog file — 0xfe'bin' magic, CRC32-declaring
    // FORMAT_DESCRIPTION, TABLE_MAP, one WRITE_ROWS per order, ROTATE
    // naming the next file in the chain. The engine replays it from bytes
    // alone: frame events by each header's event_size, verify+strip CRC32
    // per the file's own FDE, surface the rotate chain, decode typed rows.
    Q("q117_binlog_file_replay", { (s, dir) =>
        import org.apache.spark.sql.Row
        val schema = BinlogSchema.fromMysqlTypes(Seq(
          "pk" -> "bigint", "status" -> "varchar(4)"))
        val tm = BinlogRowCodec.encodeTableMap(7L, "db1", "orders", schema)
        val enc = udf((gid: Long, rows: Seq[Row]) => BinlogFileCodec.encodeFile(
          (19, tm) +: rows.map(r => (BinlogRowCodec.WriteV2,
            BinlogRowCodec.encodeRows(BinlogRowCodec.WriteV2, schema,
              Seq(Seq[Any](r.getLong(0), r.getString(1))), tableId = 7L))),
          checksum = true, nextFile = Some(s"bin.${gid + 64}")))
        val o = t(s, dir, "orders")
        val key = col("o_orderkey")
        val grouped = o.groupBy((key - key % 64).as("gid"))
          .agg(sort_array(collect_list(struct(
            key.cast(LongType), col("o_orderstatus")))).as("rows"))
        grouped.sortWithinPartitions("gid")
          .select(col("gid"), BinlogFileSplit(enc(col("gid"), col("rows"))).as("evs"))
          .select(col("gid"),
            BinlogRotateName(element_at(
              expr("filter(evs, e -> e.event_type = 4)"), 1).getField("body"))
              .as("next_file"),
            // _outer: see q68 — avoids the inferred filter double-decoding
            explode_outer(expr("filter(evs, e -> e.event_type = 30)")).as("h"))
          .select(col("gid"), col("next_file"),
            BinlogDecode.rows(col("h.body"), col("h.event_type"), schema).as("r"))
          .select(col("gid"), col("next_file"), explode_outer(col("r.data")).as("m"))
          .select(element_at(col("m"), "pk").cast(LongType).as("pk"),
            col("gid"), col("next_file"),
            element_at(col("m"), "status").as("status"))
      },
      Some("""SELECT o_orderkey AS pk, (o_orderkey - o_orderkey % 64) AS gid,
             |  'bin.' || CAST(o_orderkey - o_orderkey % 64 + 64 AS VARCHAR) AS next_file,
             |  o_orderstatus AS status
             |FROM orders ORDER BY pk""".stripMargin)),

    // Binlog ARCHIVE WRITER (inverse of q117's replay, as a product
    // operator): table rows → standard mysqlbinlog-replayable file blobs
    // via the codegen'd BinlogArchiveEncode — TABLE_MAP + multi-row
    // WRITE_ROWS (32 images/event) + CRC32 + ROTATE chain, one file per
    // 64-key bucket, NO ScalaUDF anywhere (q117's encoder is a fixture
    // udf; this is the write direction productized). The round trip
    // decodes the blobs through the engine's own replay path and must
    // reproduce the source rows exactly — including the packed DECIMAL
    // column the reference's own decoder family handles.
    Q("q149_binlog_archive_writer", { (s, dir) =>
        val mysqlTypes = Seq(
          "pk" -> "bigint", "status" -> "varchar(4)", "price" -> "decimal(12,2)")
        val cols = BinlogSchema.fromMysqlTypes(mysqlTypes)
        val o = t(s, dir, "orders")
        val files = BinlogArchive.archive(o,
          Seq(col("o_orderkey").cast(LongType), col("o_orderstatus"),
            col("o_totalprice").cast(DecimalType(12, 2))),
          mysqlTypes, "testdb", "orders",
          bucket = col("o_orderkey") - col("o_orderkey") % 64, bucketStep = 64L)
        files.sortWithinPartitions("gid")
          .select(col("gid"), col("next_file"),
            BinlogFileSplit(col("file_bytes")).as("evs"))
          // _outer: see q68 — avoids the inferred filter double-decoding
          .select(col("gid"), col("next_file"),
            explode_outer(expr("filter(evs, e -> e.event_type = 30)")).as("h"))
          .select(col("gid"), col("next_file"),
            BinlogDecode.rows(col("h.body"), col("h.event_type"), cols).as("r"))
          .select(col("gid"), col("next_file"), explode_outer(col("r.data")).as("m"))
          .select(element_at(col("m"), "pk").cast(LongType).as("pk"),
            col("gid"), col("next_file"),
            element_at(col("m"), "status").as("status"),
            element_at(col("m"), "price").as("price"))
      },
      Some("""SELECT o_orderkey AS pk, (o_orderkey - o_orderkey % 64) AS gid,
             |  'bin.' || CAST(o_orderkey - o_orderkey % 64 + 64 AS VARCHAR) AS next_file,
             |  o_orderstatus AS status,
             |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price
             |FROM orders ORDER BY pk""".stripMargin)),

    // binlog-row-metadata=FULL (MySQL 8 WL#4618; beyond-reference — the
    // reference stops at the base TABLE_MAP parse, binlog.rs:589-622):
    // the TABLE_MAP's optional TLV block carries column NAMES, numeric
    // SIGNEDNESS, ENUM member lists, charsets and the simple PK, so a row
    // stream decodes with ZERO external schema — names, unsigned
    // reinterpretation (cust values past 2^31 round-trip through the u32
    // wire form) and ENUM labels all come off the wire. The one-row
    // metadata struct broadcasts to the row events — no shuffle anywhere.
    Q("q150_binlog_full_metadata", { (s, dir) =>
        val schema = BinlogSchema.fromMysqlTypes(Seq(
          "pk" -> "bigint", "status" -> "enum('F','O','P')",
          "cust" -> "int unsigned", "price" -> "decimal(12,2)"))
        val tmBytes = BinlogRowCodec.encodeEvent(19,
          BinlogRowCodec.encodeTableMapFull(7L, "testdb", "orders", schema,
            pk = Seq(0)))
        val enc = udf((pk: Long, status: String, cust: Long, price: String) =>
          BinlogRowCodec.encodeEvent(BinlogRowCodec.WriteV2,
            BinlogRowCodec.encodeRows(BinlogRowCodec.WriteV2, schema,
              Seq(Seq[Any](pk, status, cust, price)), tableId = 7L)))
        val o = t(s, dir, "orders")
        val events = o.sortWithinPartitions("o_orderkey")
          .select(enc(col("o_orderkey").cast(LongType), col("o_orderstatus"),
            col("o_custkey").cast(LongType) + 2147490000L,
            col("o_totalprice").cast(DecimalType(12, 2)).cast(StringType)).as("ev"))
        // ---- engine side: one FULL TABLE_MAP + row events, no schema ----
        val meta = s.range(1).select(
          BinlogDecode.tableMapFull(
            BinlogDecode.eventSplit(lit(tmBytes)).getField("body")).as("tm"))
        events.select(BinlogDecode.eventSplit(col("ev")).as("h"))
          .crossJoin(broadcast(meta))
          .select(col("tm"),
            BinlogDecode.rowsFullMeta(col("h.body"), col("h.event_type"),
              col("tm")).as("r"))
          // _outer: see q68 — avoids the inferred filter double-decoding
          .select(col("tm"), explode_outer(col("r.data")).as("m"))
          .select(
            element_at(col("m"), "pk").cast(LongType).as("pk"),
            element_at(col("m"), "status").as("status"),
            element_at(col("m"), "cust").cast(LongType).as("cust"),
            element_at(col("m"), "price").as("price"),
            col("tm.table").as("tbl"),
            element_at(col("tm.col_names"), col("tm.pk").getItem(0) + 1).as("pk_col"))
      },
      Some("""SELECT o_orderkey AS pk, o_orderstatus AS status,
             |  CAST(o_custkey AS BIGINT) + 2147490000 AS cust,
             |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price,
             |  'orders' AS tbl, 'pk' AS pk_col
             |FROM orders ORDER BY pk""".stripMargin)),

    // Snapshot BOOTSTRAP (DBLog watermark reconciliation — see
    // CdcMerge.bootstrapMerge): a chunked consistent snapshot with per-key
    // read positions merged against the concurrent change stream. Changes
    // at-or-before a key's snapshot watermark are discarded (the snapshot
    // already reflects them); later UPDATEs re-image, later DELETEs drop,
    // snapshot-absent keys take every change. The fixture varies the
    // watermark per key (k%5) against fixed change positions (INSERT@1,
    // UPDATE@3, DELETE@4) so every apply/discard combination occurs.
    Q("q153_snapshot_bootstrap", { (s, dir) =>
        val o = t(s, dir, "orders")
        val k = col("o_orderkey")
        val pk = k.cast(LongType).as("pk")
        val price0 = col("o_totalprice").cast(DecimalType(12, 2)).cast(StringType)
        val price1 = (col("o_totalprice").cast(DecimalType(12, 2)) + 1).cast(StringType)
        val snapshot = o.filter(k % 11 =!= 0).select(
          pk, price0.as("price"), (k % 5).cast(LongType).as("snap_pos"))
        val inserts = o.filter(k % 11 === 0).select(
          pk, price0.as("price"), lit(1L).as("pos"), lit("INSERT").as("type"))
        val updates = o.filter(k % 3 === 0).select(
          pk, price1.as("price"), lit(3L).as("pos"), lit("UPDATE").as("type"))
        val deletes = o.filter(k % 7 === 0).select(
          pk, lit(null).cast(StringType).as("price"), lit(4L).as("pos"),
          lit("DELETE").as("type"))
        val changes = inserts.unionByName(updates).unionByName(deletes)
        CdcMerge.bootstrapMerge(snapshot, changes, Seq("pk"), "pos", "snap_pos")
          .sortWithinPartitions("pk")
      },
      Some("""WITH flags AS (
             |  SELECT o_orderkey AS k,
             |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price0,
             |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) + 1 AS VARCHAR) AS price1,
             |    o_orderkey % 11 = 0 AS absent,
             |    o_orderkey % 5 AS sp,
             |    (o_orderkey % 7 = 0) AND (o_orderkey % 11 = 0 OR 4 > o_orderkey % 5) AS del,
             |    (o_orderkey % 3 = 0) AND (o_orderkey % 11 = 0 OR 3 > o_orderkey % 5) AS upd
             |  FROM orders)
             |SELECT k AS pk,
             |  CASE WHEN upd THEN price1 ELSE price0 END AS price,
             |  CAST(CASE WHEN upd THEN 3 WHEN absent THEN 1 ELSE sp END AS BIGINT) AS pos,
             |  CASE WHEN upd THEN 'UPDATE' WHEN absent THEN 'INSERT'
             |       ELSE 'SNAPSHOT' END AS type
             |FROM flags WHERE NOT del
             |ORDER BY pk""".stripMargin)),

    // Merge fast path, correctness-locked: the exact route→pk→latest-image
    // pipeline Bench.cdcThroughput times. Envelopes are built FULL-width
    // (13 Canal fields); the engine side parses PARTIALLY
    // (Envelope.parsePartial: id/database/table/type + only the named data
    // keys as a struct) — proving the pruned parse loses nothing the merge
    // needs while skipping sqlType/mysqlType/old entirely.
    Q("q118_cdc_merge_fastpath", { (s, dir) =>
        val o = t(s, dir, "orders")
        val raw = o.select(Envelope.build(
          id = col("o_orderkey"),
          database = lit("testdb"),
          table = when(col("o_orderkey") % 10 === 0, "audit").otherwise("orders"),
          pkNames = array(lit("o_orderkey")),
          dmlType = when(col("o_orderkey") % 7 === 0, "DELETE")
            .when(col("o_orderkey") % 3 === 0, "UPDATE").otherwise("INSERT"),
          es = unix_timestamp(col("o_orderdate")) * 1000,
          ts = unix_timestamp(col("o_orderdate")) * 1000 + 123,
          sqlType = map(lit("o_orderkey"), lit(-5)),
          mysqlType = map(lit("o_orderkey"), lit("bigint")),
          data = array(map(
            lit("o_orderkey"), col("o_orderkey").cast(StringType),
            lit("price"), col("o_totalprice").cast(DecimalType(12, 2)).cast(StringType))),
          old = array(map().cast(MapType(StringType, StringType)))).as("value"))
        val instances = Seq(Instance("q", "t", schemas = "test*", tables = "orders"))
        val parsed = raw.select(Envelope.parsePartial(
          col("value"), Seq("o_orderkey", "price")).as("e")).select("e.*")
        val routed = parsed.filter(
          size(Routing.routes(instances, col("database"), col("table"))) > 0)
        val keyed = routed.select(col("id").as("cid"), col("type"),
          try_element_at(col("data"), lit(1)).getField("o_orderkey")
            .cast(LongType).as("pk"),
          try_element_at(col("data"), lit(1)).getField("price").as("price"))
        CdcMerge.latestImage(keyed, Seq("pk"), "cid").sortWithinPartitions("pk")
      },
      Some("""SELECT o_orderkey AS cid,
             |  CASE WHEN o_orderkey % 3 = 0 THEN 'UPDATE' ELSE 'INSERT' END AS type,
             |  o_orderkey AS pk,
             |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price
             |FROM orders WHERE o_orderkey % 10 != 0 AND o_orderkey % 7 != 0
             |ORDER BY pk""".stripMargin)),

    // MySQL wire packet layer (reference mysql.rs:96-145 framing,
    // protocal.rs:177-183 COM_QUERY): per order, a client-session byte
    // stream of two framed packets (a COM_QUERY carrying the key, then a
    // raw status payload); the engine unframes with the codegen'd
    // MysqlPacketSplit and recovers sequence ids and payload text exactly.
    Q("q119_mysql_packet_roundtrip", { (s, dir) =>
        val enc = udf((k: Long, status: String) =>
          MysqlProtocolCodec.writePacket(0, MysqlProtocolCodec.encodeComQuery(s"k=$k")) ++
            MysqlProtocolCodec.writePacket(1, status.getBytes("UTF-8")))
        val o = t(s, dir, "orders").sortWithinPartitions("o_orderkey")
        o.select(col("o_orderkey").as("pk"),
            MysqlPacketSplit(enc(col("o_orderkey"), col("o_orderstatus"))).as("ps"))
          // _outer: see q68 — avoids the inferred filter double-decoding
          .select(col("pk"), explode_outer(col("ps")).as("p"))
          .select(col("pk"), col("p.seq").as("seq"),
            when(col("p.seq") === 0,
              expr("substring(cast(p.payload as string), 2)"))
              .otherwise(col("p.payload").cast(StringType)).as("txt"))
      },
      Some("""SELECT o_orderkey AS pk, 0 AS seq,
             |  'k=' || CAST(o_orderkey AS VARCHAR) AS txt FROM orders
             |UNION ALL
             |SELECT o_orderkey, 1, o_orderstatus FROM orders
             |ORDER BY pk, seq""".stripMargin)),

    // Full COM_BINLOG_DUMP response replay (reference main.rs:74-130 hot
    // loop): each order bucket becomes one replication-session byte
    // stream — framed packets whose payloads are the 0x00 network marker
    // + a whole WRITE_ROWS event, terminated by a classic 5-byte EOF
    // packet (mysql.rs:160 heuristic). The engine unframes with
    // MysqlPacketSplit, routes by the marker byte exactly as the
    // reference's loop does, decodes event packets through the shared
    // binlog path (header split with packetMarker=true → typed row
    // decode), and classifies the terminator with MysqlOkDecode — the
    // reference's entire socket-to-rows path minus only the socket read.
    Q("q120_mysql_dump_session", { (s, dir) =>
        import org.apache.spark.sql.Row
        val schema = BinlogSchema.fromMysqlTypes(Seq(
          "pk" -> "bigint", "status" -> "varchar(4)"))
        val enc = udf((rows: Seq[Row]) => {
          val out = new java.io.ByteArrayOutputStream()
          rows.foreach { r =>
            val k = r.getLong(0)
            val ev = BinlogRowCodec.encodeEvent(BinlogRowCodec.WriteV2,
              BinlogRowCodec.encodeRows(BinlogRowCodec.WriteV2, schema,
                Seq(Seq[Any](k, r.getString(1)))),
              timestamp = k % 100000 + 1700000000L, packetMarker = true)
            val p = MysqlProtocolCodec.writePacket((k % 3 + 1).toInt, ev)
            out.write(p, 0, p.length)
          }
          val eof = MysqlProtocolCodec.writePacket(4,
            Array[Byte](0xfe.toByte, 0, 0, 2, 0))
          out.write(eof, 0, eof.length)
          out.toByteArray
        })
        val o = t(s, dir, "orders")
        val grouped = o
          .groupBy((col("o_orderkey") - col("o_orderkey") % 3).as("gid"))
          .agg(sort_array(collect_list(struct(
            col("o_orderkey").cast(LongType), col("o_orderstatus")))).as("rows"))
        val ps = grouped.sortWithinPartitions("gid")
          .select(col("gid"),
            explode_outer(MysqlPacketSplit(enc(col("rows")))).as("p"))
          .select(col("gid"), col("p.seq").as("seq"), col("p.payload").as("payload"))
        val events = ps.filter(expr("substring(payload, 1, 1) = X'00'"))
          .select(col("gid"), col("seq"),
            BinlogDecode.eventSplit(col("payload"), packetMarker = true).as("h"))
          .select(col("gid"), col("seq"),
            BinlogDecode.rows(col("h.body"), col("h.event_type"), schema).as("r"))
          // _outer: see q68 — avoids the inferred filter double-decoding
          .select(col("gid"), col("seq"), explode_outer(col("r.data")).as("m"))
          .select(col("gid"), col("seq"),
            element_at(col("m"), "pk").cast(LongType).as("pk"),
            lit("EVENT").as("kind"), element_at(col("m"), "status").as("status"))
        val eofs = ps.filter(expr("substring(payload, 1, 1) = X'FE'"))
          .select(col("gid"), col("seq"), lit(-1L).as("pk"),
            MysqlOkDecode(col("payload")).getField("kind").as("kind"),
            lit(null).cast(StringType).as("status"))
        events.unionByName(eofs)
      },
      Some("""SELECT (o_orderkey - o_orderkey % 3) AS gid,
             |  o_orderkey % 3 + 1 AS seq, o_orderkey AS pk,
             |  'EVENT' AS kind, o_orderstatus AS status
             |FROM orders
             |UNION ALL
             |SELECT gid, 4, -1, 'EOF', CAST(NULL AS VARCHAR) FROM
             |  (SELECT DISTINCT (o_orderkey - o_orderkey % 3) AS gid FROM orders)
             |ORDER BY gid, seq""".stripMargin)),

    // Multi-file ROTATE-chain replay (reference binlog.rs:768-828 rotate
    // dispatch, main.rs:115-124 file switching): each order bucket becomes
    // TWO chained binlog files — the head file's ROTATE names the tail
    // file. The engine starts from head files only and discovers the tail
    // by JOINING the rotate-extracted name against the file table (the
    // name travels through the bytes, not the fixture), then replays the
    // whole chain as one ordered typed-row stream. q117 is the single-file
    // shape; this is the cross-file handoff a real binlog directory needs.
    Q("q124_binlog_rotate_chain", { (s, dir) =>
        import org.apache.spark.sql.Row
        val schema = BinlogSchema.fromMysqlTypes(Seq(
          "pk" -> "bigint", "status" -> "varchar(4)"))
        val tm = BinlogRowCodec.encodeTableMap(7L, "db1", "orders", schema)
        def fileOf(rows: Seq[Row], next: Option[String]): Array[Byte] =
          BinlogFileCodec.encodeFile(
            (19, tm) +: rows.map(r => (BinlogRowCodec.WriteV2,
              BinlogRowCodec.encodeRows(BinlogRowCodec.WriteV2, schema,
                Seq(Seq[Any](r.getLong(0), r.getString(1))), tableId = 7L))),
            checksum = true, nextFile = next)
        // first ceil(n/2) sorted rows → head file (ROTATE → tail), rest →
        // tail file; every fixture bucket has ≥2 rows so both are non-empty
        val enc = udf((gid: Long, rows: Seq[Row]) => {
          val k = (rows.size + 1) / 2
          Seq(fileOf(rows.take(k), Some(s"bin.$gid.1")), fileOf(rows.drop(k), None))
        })
        val o = t(s, dir, "orders")
        val key = col("o_orderkey")
        val grouped = o.groupBy((key - key % 64).as("gid"))
          .agg(sort_array(collect_list(struct(
            key.cast(LongType), col("o_orderstatus")))).as("rows"))
        val files = grouped.sortWithinPartitions("gid")
          .select(col("gid"), posexplode(enc(col("gid"), col("rows")))
            .as(Seq("ford", "bytes")))
          .select(col("gid"), col("ford"),
            concat(lit("bin."), col("gid"), lit("."), col("ford")).as("fname"),
            col("bytes"))
        val heads = files.filter(col("ford") === 0)
          .select(col("gid"), BinlogFileSplit(col("bytes")).as("evs"))
          .select(col("gid"), col("evs"),
            BinlogRotateName(element_at(
              expr("filter(evs, e -> e.event_type = 4)"), 1).getField("body"))
              .as("next_file"))
        // tail files keyed by NAME: the engine only learns which file is
        // next from the decoded ROTATE body
        val tails = files.filter(col("ford") =!= 0)
          .select(col("fname").as("tname"), BinlogFileSplit(col("bytes")).as("tevs"))
        val chained = heads.join(tails, col("next_file") === col("tname"))
        chained.select(col("gid"),
            explode(array(
              struct(lit(0).as("ford"), col("evs").as("fevs")),
              struct(lit(1).as("ford"), col("tevs").as("fevs")))).as("f"))
          .select(col("gid"), col("f.ford").as("ford"),
            // _outer: see q68 — avoids the inferred filter double-decoding
            explode_outer(expr("filter(f.fevs, e -> e.event_type = 30)")).as("h"))
          .select(col("gid"), col("ford"),
            BinlogDecode.rows(col("h.body"), col("h.event_type"), schema).as("r"))
          .select(col("gid"), col("ford"), explode_outer(col("r.data")).as("m"))
          .select(element_at(col("m"), "pk").cast(LongType).as("pk"),
            col("gid"), col("ford"), element_at(col("m"), "status").as("status"))
      },
      Some("""SELECT o_orderkey AS pk, (o_orderkey - o_orderkey % 64) AS gid,
             |  CASE WHEN ROW_NUMBER() OVER (
             |      PARTITION BY (o_orderkey - o_orderkey % 64) ORDER BY o_orderkey)
             |    <= (COUNT(*) OVER (PARTITION BY (o_orderkey - o_orderkey % 64)) + 1) // 2
             |  THEN 0 ELSE 1 END AS ford,
             |  o_orderstatus AS status
             |FROM orders ORDER BY pk""".stripMargin)),

    // ENUM/SET/BIT raw-row decode — types the reference errors on
    // (`/root/reference/src/binlog.rs:330` "unsupported column type"):
    // ENUM renders its member name, SET the comma-joined selected members
    // (MySQL's textual forms), BIT the unsigned integer. Same 3-rows-per-
    // event fixture shape as q75; decode is the codegen'd whole-row kernel.
    Q("q125_binlog_enum_set_bit", { (s, dir) =>
        import org.apache.spark.sql.Row
        val schema = BinlogSchema.fromMysqlTypes(Seq(
          "pk" -> "bigint",
          "prio" -> "enum('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')",
          "flags" -> "set('red','green','blue')",
          "bits" -> "bit(12)"))
        val enc = udf((rows: Seq[Row]) => BinlogRowCodec.encodeRows(
          BinlogRowCodec.WriteV2, schema,
          rows.map(r => Seq[Any](r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))))
        val o = t(s, dir, "orders")
        val key = col("o_orderkey")
        val grouped = o.groupBy((key - key % 3).as("gid"))
          .agg(sort_array(collect_list(struct(
            key.cast(LongType),
            col("o_orderpriority"),
            (key % 8).cast(LongType),     // SET mask over 3 members
            (key % 4096).cast(LongType)   // bit(12) value
          ))).as("rows"))
        grouped.sortWithinPartitions("gid")
          .select(BinlogDecode.rows(enc(col("rows")),
            lit(BinlogRowCodec.WriteV2), schema).as("r"))
          // _outer: see q68 — avoids the inferred filter double-decoding
          .select(explode_outer(col("r.data")).as("m"))
          .select(
            element_at(col("m"), "pk").cast(LongType).as("pk"),
            element_at(col("m"), "prio").as("prio"),
            element_at(col("m"), "flags").as("flags"),
            element_at(col("m"), "bits").cast(LongType).as("bits"))
      },
      Some("""SELECT o_orderkey AS pk,
             |  o_orderpriority AS prio,
             |  concat_ws(',',
             |    CASE WHEN ((o_orderkey % 8) & 1) != 0 THEN 'red' END,
             |    CASE WHEN ((o_orderkey % 8) & 2) != 0 THEN 'green' END,
             |    CASE WHEN ((o_orderkey % 8) & 4) != 0 THEN 'blue' END) AS flags,
             |  CAST(o_orderkey % 4096 AS BIGINT) AS bits
             |FROM orders ORDER BY pk""".stripMargin)),

    // MySQL binary JSON (JSONB) column decode — beyond-reference coverage
    // (the reference errors on JSON columns too, binlog.rs:330). The wire
    // value is a length-prefixed [[JsonBinary]] document; decode renders
    // compact JSON text in MySQL's canonical (length, bytes) key order, so
    // the fixture builds its keys already in that order and the DuckDB
    // oracle reconstructs the identical text. Covers nested objects,
    // arrays, strings, ints, booleans, and the literal-null document.
    Q("q126_binlog_json", { (s, dir) =>
        import org.apache.spark.sql.Row
        val schema = BinlogSchema.fromMysqlTypes(Seq(
          "pk" -> "bigint", "doc" -> "json"))
        val enc = udf((rows: Seq[Row]) => BinlogRowCodec.encodeRows(
          BinlogRowCodec.WriteV2, schema,
          rows.map(r => Seq[Any](r.getLong(0), r.getString(1)))))
        val o = t(s, dir, "orders")
        val key = col("o_orderkey")
        val jsonText = when(key % 11 === 0, lit("null")).otherwise(concat(
          lit("{\"k\":"), key.cast(StringType),
          lit(",\"st\":\""), col("o_orderstatus"),
          lit("\",\"pri\":\""), col("o_orderpriority"),
          lit("\",\"meta\":{\"x\":true},\"tags\":["),
          col("o_custkey").cast(StringType), lit(",2]}")))
        val grouped = o.groupBy((key - key % 3).as("gid"))
          .agg(sort_array(collect_list(struct(
            key.cast(LongType), jsonText))).as("rows"))
        grouped.sortWithinPartitions("gid")
          .select(BinlogDecode.rows(enc(col("rows")),
            lit(BinlogRowCodec.WriteV2), schema).as("r"))
          .select(explode_outer(col("r.data")).as("m"))
          .select(
            element_at(col("m"), "pk").cast(LongType).as("pk"),
            element_at(col("m"), "doc").as("doc"))
      },
      Some("""SELECT o_orderkey AS pk,
             |  CASE WHEN o_orderkey % 11 = 0 THEN 'null'
             |  ELSE '{"k":' || CAST(o_orderkey AS VARCHAR) ||
             |    ',"st":"' || o_orderstatus ||
             |    '","pri":"' || o_orderpriority ||
             |    '","meta":{"x":true},"tags":[' ||
             |    CAST(o_custkey AS VARCHAR) || ',2]}'
             |  END AS doc
             |FROM orders ORDER BY pk""".stripMargin)),

    // Transaction assembly (beyond-reference: the reference skips XID
    // events entirely): each gid group becomes one binlog "file" holding
    // two BEGIN..XID transactions (first ceil(n/2) rows, then the rest;
    // one WRITE event per row), and [[Transactions.assemble]] stamps every
    // row with its commit XID and commit timestamp via the per-file
    // running-BEGIN-count window + (file, txn_seq) join.
    Q("q127_binlog_txn_assembly", { (s, dir) =>
        import org.apache.spark.sql.Row
        val schema = BinlogSchema.fromMysqlTypes(Seq(
          "pk" -> "bigint", "status" -> "varchar(4)"))
        val enc = udf((gid: Long, rows: Seq[Row]) => txnFixtureEvents(
          schema, sid = None, gid, rows, r => Seq[Any](r.getLong(0), r.getString(1))))
        val o = t(s, dir, "orders")
        val key = col("o_orderkey")
        val grouped = o.groupBy((key - key % 4).cast(LongType).as("gid"))
          .agg(sort_array(collect_list(struct(
            key.cast(LongType), col("o_orderstatus")))).as("rows"))
        grouped.sortWithinPartitions("gid")
          .select(col("gid"), posexplode(enc(col("gid"), col("rows"))).as(Seq("ord", "ev")))
          .select(col("gid"), col("ord"), BinlogDecode.eventSplit(col("ev")).as("h"))
          .select(col("gid"), col("ord"), col("h.timestamp").as("timestamp"),
            col("h.event_type").as("event_type"), col("h.body").as("body"))
          .transform(Transactions.assemble(_, "gid", "ord"))
          .filter(col("event_type") === BinlogRowCodec.WriteV2)
          .select(col("xid"), col("commit_ts"),
            BinlogDecode.rows(col("body"), col("event_type"), schema).as("r"))
          // _outer: see q68 — avoids the inferred filter double-decoding
          .select(col("xid"), col("commit_ts"), explode_outer(col("r.data")).as("m"))
          .select(
            element_at(col("m"), "pk").cast(LongType).as("pk"),
            element_at(col("m"), "status").as("status"),
            col("xid"), col("commit_ts").as("cts"))
      },
      Some("""WITH g AS (
             |  SELECT o_orderkey AS pk, o_orderstatus AS status,
             |    CAST(o_orderkey - o_orderkey % 4 AS BIGINT) AS gid,
             |    ROW_NUMBER() OVER (PARTITION BY o_orderkey - o_orderkey % 4
             |                       ORDER BY o_orderkey) AS rn,
             |    COUNT(*) OVER (PARTITION BY o_orderkey - o_orderkey % 4) AS n
             |  FROM orders)
             |SELECT pk, status,
             |  gid * 2 + (CASE WHEN rn <= (n + 1) // 2 THEN 1 ELSE 2 END) AS xid,
             |  1700000000 + gid * 2 +
             |    (CASE WHEN rn <= (n + 1) // 2 THEN 1 ELSE 2 END) AS cts
             |FROM g ORDER BY pk""".stripMargin)),

    // XA distributed-transaction assembly (beyond-reference AND beyond
    // q127's BEGIN..XID grammar): each gid group holds `XA START … XA END
    // … XA_PREPARE` spans whose fate is formula-driven — one-phase commit
    // flag, later XA COMMIT / XA ROLLBACK statement, or no outcome at all
    // (the dangling prepared txn a consistent consumer must hold back).
    // Fate-1 groups are the xid-REUSE case: two spans under the SAME xid
    // with outcomes in DIFFERENT numeric files, first rolled back, second
    // committed from a file whose suffix sorts before the span's
    // lexicographically but after it numerically — so the oracle pins
    // both r10 ADVICE fixes (per-span outcome matching and numeric
    // binlog-file ordering). xaAssemble stamps every row with the
    // canonical statement-form xid text and its resolved state; outcomes
    // are statement-scale metadata aggregated per xid and broadcast.
    Q("q176_binlog_xa_txn", { (s, dir) =>
        import org.apache.spark.sql.Row
        val schema = BinlogSchema.fromMysqlTypes(Seq(
          "pk" -> "bigint", "status" -> "varchar(4)"))
        val enc = udf((gid: Long, rows: Seq[Row]) => xaFixtureEvents(
          schema, gid, rows, r => Seq[Any](r.getLong(0), r.getString(1))))
        val o = t(s, dir, "orders")
        val key = col("o_orderkey")
        val grouped = o.groupBy((key - key % 4).cast(LongType).as("gid"))
          .agg(sort_array(collect_list(struct(
            key.cast(LongType), col("o_orderstatus")))).as("rows"))
        grouped.sortWithinPartitions("gid")
          .select(col("gid"), posexplode(enc(col("gid"), col("rows"))).as(Seq("ord", "fe")))
          .select(col("gid"), col("ord"), col("fe._1").as("file"),
            BinlogDecode.eventSplit(col("fe._2")).as("h"))
          .select(col("file"), col("ord"),
            col("h.event_type").as("event_type"), col("h.body").as("body"))
          .transform(Transactions.xaAssemble(_, "file", "ord"))
          .filter(col("event_type") === BinlogRowCodec.WriteV2)
          .select(col("xa_xid"), col("xa_state"),
            BinlogDecode.rows(col("body"), col("event_type"), schema).as("r"))
          .select(col("xa_xid"), col("xa_state"), explode_outer(col("r.data")).as("m"))
          .select(
            element_at(col("m"), "pk").cast(LongType).as("pk"),
            element_at(col("m"), "status").as("status"),
            col("xa_xid"), col("xa_state"))
          .orderBy("pk")
      },
      Some("""WITH g AS (
             |  SELECT o_orderkey AS pk, o_orderstatus AS status,
             |    CAST(o_orderkey - o_orderkey % 4 AS BIGINT) AS gid,
             |    ROW_NUMBER() OVER (PARTITION BY o_orderkey - o_orderkey % 4
             |                       ORDER BY o_orderkey) AS rn,
             |    COUNT(*) OVER (PARTITION BY o_orderkey - o_orderkey % 4) AS n
             |  FROM orders)
             |SELECT pk, status,
             |  'X''' || lower(hex('g' || CAST(gid AS VARCHAR))) || ''',X'''',1' AS xa_xid,
             |  CASE (gid // 4) % 4 WHEN 0 THEN 'committed'
             |    WHEN 1 THEN (CASE WHEN rn <= (n + 1) // 2
             |      THEN 'rolled_back' ELSE 'committed' END)
             |    WHEN 2 THEN 'rolled_back' ELSE 'prepared' END AS xa_state
             |FROM g ORDER BY pk""".stripMargin)),

    // GTID-framed transaction assembly (beyond-reference: the reference
    // resumes by file+pos only): q127's two-transactions-per-file fixture
    // with each BEGIN preceded by a GTID event whose sid is the file id
    // rendered as a uuid and whose gno is the transaction's xid; the
    // assemble() gtid column stamps every committed row with `uuid:gno`
    // — the replica-failover-safe position file+pos cannot express.
    Q("q129_binlog_gtid_txn", { (s, dir) =>
        import org.apache.spark.sql.Row
        val schema = BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint"))
        val enc = udf((gid: Long, rows: Seq[Row]) => txnFixtureEvents(
          schema, sid = Some(uuidOfLong(gid)), gid, rows, r => Seq[Any](r.getLong(0))))
        val o = t(s, dir, "orders")
        val key = col("o_orderkey")
        val grouped = o.groupBy((key - key % 4).cast(LongType).as("gid"))
          .agg(sort_array(collect_list(struct(key.cast(LongType)))).as("rows"))
        grouped.sortWithinPartitions("gid")
          .select(col("gid"), posexplode(enc(col("gid"), col("rows"))).as(Seq("ord", "ev")))
          .select(col("gid"), col("ord"), BinlogDecode.eventSplit(col("ev")).as("h"))
          .select(col("gid"), col("ord"), col("h.timestamp").as("timestamp"),
            col("h.event_type").as("event_type"), col("h.body").as("body"))
          .transform(Transactions.assemble(_, "gid", "ord"))
          .filter(col("event_type") === BinlogRowCodec.WriteV2)
          .select(col("xid"), col("gtid"),
            BinlogDecode.rows(col("body"), col("event_type"), schema).as("r"))
          // _outer: see q68 — avoids the inferred filter double-decoding
          .select(col("xid"), col("gtid"), explode_outer(col("r.data")).as("m"))
          .select(element_at(col("m"), "pk").cast(LongType).as("pk"),
            col("xid"), col("gtid"))
      },
      Some("""WITH g AS (
             |  SELECT o_orderkey AS pk,
             |    CAST(o_orderkey - o_orderkey % 4 AS BIGINT) AS gid,
             |    ROW_NUMBER() OVER (PARTITION BY o_orderkey - o_orderkey % 4
             |                       ORDER BY o_orderkey) AS rn,
             |    COUNT(*) OVER (PARTITION BY o_orderkey - o_orderkey % 4) AS n
             |  FROM orders),
             |x AS (SELECT pk, gid, printf('%032x', gid) AS hex,
             |  gid * 2 + (CASE WHEN rn <= (n + 1) // 2 THEN 1 ELSE 2 END) AS xid
             |  FROM g)
             |SELECT pk, xid,
             |  substr(hex, 1, 8) || '-' || substr(hex, 9, 4) || '-' ||
             |  substr(hex, 13, 4) || '-' || substr(hex, 17, 4) || '-' ||
             |  substr(hex, 21, 12) || ':' || CAST(xid AS VARCHAR) AS gtid
             |FROM x ORDER BY pk""".stripMargin)),

    // Executed-GTID-set aggregation: the committed transactions of the
    // 8-server-identity fixture collapsed into canonical per-sid interval
    // text (`uuid:a[-b][:c[-d]]`) — the gtid_executed resume position a
    // failing-over consumer publishes, which the reference's file+pos
    // tracking cannot express. Two-level islands-and-gaps ([[GtidSet]]):
    // bucketed local collapse keeps one sid's billions of gnos off a
    // single reducer at corpus scale.
    Q("q130_gtid_executed_set", { (s, dir) =>
        val txns = gtidAssembled(s, dir)
          .filter(col("gtid").isNotNull &&
            col("event_type") === BinlogTxnCodec.XidType)
          .select(substring_index(col("gtid"), ":", 1).as("sid"),
            element_at(split(col("gtid"), ":"), 2).cast(LongType).as("gno"))
        GtidSet.setText(GtidSet.intervals(txns, bucketBits = 10))
      },
      Some("""WITH g AS (
             |  SELECT
             |    CAST(o_orderkey - o_orderkey % 4 AS BIGINT) AS gid,
             |    ROW_NUMBER() OVER (PARTITION BY o_orderkey - o_orderkey % 4
             |                       ORDER BY o_orderkey) AS rn,
             |    COUNT(*) OVER (PARTITION BY o_orderkey - o_orderkey % 4) AS n
             |  FROM orders),
             |x AS (SELECT DISTINCT gid,
             |    gid * 2 + (CASE WHEN rn <= (n + 1) // 2 THEN 1 ELSE 2 END) AS gno
             |  FROM g),
             |v AS (SELECT printf('%032x', (gid // 4) % 8) AS hex, gno FROM x),
             |u AS (SELECT substr(hex, 1, 8) || '-' || substr(hex, 9, 4) || '-' ||
             |    substr(hex, 13, 4) || '-' || substr(hex, 17, 4) || '-' ||
             |    substr(hex, 21, 12) AS sid, gno FROM v),
             |r AS (SELECT sid, gno,
             |    ROW_NUMBER() OVER (PARTITION BY sid ORDER BY gno) AS rn2 FROM u),
             |i AS (SELECT sid, MIN(gno) AS lo, MAX(gno) AS hi
             |  FROM r GROUP BY sid, gno - rn2),
             |t AS (SELECT sid, string_agg(
             |    CASE WHEN hi > lo THEN CAST(lo AS VARCHAR) || '-' || CAST(hi AS VARCHAR)
             |         ELSE CAST(lo AS VARCHAR) END, ':' ORDER BY lo) AS ivs
             |  FROM i GROUP BY sid)
             |SELECT sid, sid || ':' || ivs AS gtid_set FROM t""".stripMargin)),

    // GTID-set resume/failover skip: the applied position arrives as a
    // PREVIOUS_GTIDS body (built from the even 8-group blocks, round-
    // tripped through the real binary codec → canonical text →
    // [[GtidSet.parse]]), and the replayed stream drops every transaction
    // whose uuid:gno the set already covers — a broadcast anti range-join
    // (the applied set is interval metadata, never row-scale), leaving
    // exactly the odd-block transactions.
    Q("q131_gtid_resume_skip", { (s, dir) =>
        import org.apache.spark.sql.Row
        val schema = BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint"))
        // applied side: committed (sid, gno) pairs of even blocks, derived
        // from the same deterministic assignment the fixture encodes
        val o = t(s, dir, "orders")
        val key = col("o_orderkey")
        val applied = o.groupBy((key - key % 4).cast(LongType).as("gid"))
          .agg(count(lit(1)).as("n"))
          .filter(shiftright(col("gid"), 5) % 2 === 0)
          .select(col("gid"), explode(when(col("n") >= 2,
              array(col("gid") * 2 + 1, col("gid") * 2 + 2))
            .otherwise(array(col("gid") * 2 + 1))).as("gno"))
          .select(udf((gid: Long) => uuidOfLong((gid >> 2) % 8))
              .apply(col("gid")).as("sid"),
            col("gno").cast(LongType).as("gno"))
        val encSet = udf((sid: String, ivs: Seq[Row]) =>
          BinlogGtidCodec.encodePreviousGtids(
            Seq(sid -> ivs.map(r => (r.getLong(0), r.getLong(1))))))
        val position = GtidSet.intervals(applied, bucketBits = 10)
          .groupBy("sid")
          .agg(array_sort(collect_list(struct(col("lo"), col("hi")))).as("ivs"))
          .select(encSet(col("sid"), col("ivs")).as("body"))
          .select(org.apache.spark.sql.graft.ColumnBridge.column(BinlogPreviousGtidsDecode(
            org.apache.spark.sql.graft.ColumnBridge.expression(col("body")))).as("txt"))
        val ivs = GtidSet.parse(position, "txt")
        val writes = gtidAssembled(s, dir)
          .filter(col("gtid").isNotNull &&
            col("event_type") === BinlogRowCodec.WriteV2)
          .select(col("xid"), col("gtid"),
            BinlogDecode.rows(col("body"), col("event_type"), schema).as("r"))
          // _outer: see q68 — avoids the inferred filter double-decoding
          .select(col("xid"), col("gtid"), explode_outer(col("r.data")).as("m"))
          .select(element_at(col("m"), "pk").cast(LongType).as("pk"),
            col("xid"), col("gtid"),
            substring_index(col("gtid"), ":", 1).as("sid"),
            element_at(split(col("gtid"), ":"), 2).cast(LongType).as("gno"))
        // bin-keyed narrow intervals + sid-keyed wide residual; see
        // [[GtidSet.skipCovered]] for the scale argument
        GtidSet.skipCovered(writes, ivs)
          .select("pk", "xid", "gtid")
      },
      Some("""WITH g AS (
             |  SELECT o_orderkey AS pk,
             |    CAST(o_orderkey - o_orderkey % 4 AS BIGINT) AS gid,
             |    ROW_NUMBER() OVER (PARTITION BY o_orderkey - o_orderkey % 4
             |                       ORDER BY o_orderkey) AS rn,
             |    COUNT(*) OVER (PARTITION BY o_orderkey - o_orderkey % 4) AS n
             |  FROM orders),
             |x AS (SELECT pk, gid,
             |    gid * 2 + (CASE WHEN rn <= (n + 1) // 2 THEN 1 ELSE 2 END) AS xid
             |  FROM g WHERE (gid // 32) % 2 = 1),
             |h AS (SELECT pk, xid, printf('%032x', (gid // 4) % 8) AS hex FROM x)
             |SELECT pk, xid,
             |  substr(hex, 1, 8) || '-' || substr(hex, 9, 4) || '-' ||
             |  substr(hex, 13, 4) || '-' || substr(hex, 17, 4) || '-' ||
             |  substr(hex, 21, 12) || ':' || CAST(xid AS VARCHAR) AS gtid
             |FROM h ORDER BY pk""".stripMargin)),

    // Compressed-transaction replay (beyond-reference: MySQL 8.0.20+
    // binlog_transaction_compression; the reference has no type-40 arm):
    // each transaction travels as GTID event + ONE zstd-compressed
    // TRANSACTION_PAYLOAD holding its BEGIN..rows..XID run. The engine
    // opens the envelope ([[BinlogTxnPayloadSplit]]), re-frames the
    // embedded events, and the standard assembly stamps xid/commit_ts
    // from INSIDE the payload and gtid from OUTSIDE it — the two framing
    // layers compose.
    Q("q132_binlog_txn_payload", { (s, dir) =>
        import org.apache.spark.sql.Row
        val schema = BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint"))
        val enc = udf((gid: Long, rows: Seq[Row]) => {
          val sid = uuidOfLong(gid)
          def txn(part: Seq[Row], xid: Long): Seq[Array[Byte]] =
            if (part.isEmpty) Nil
            else {
              val inner: Seq[(Int, Array[Byte])] =
                ((BinlogTxnCodec.QueryType,
                  BinlogTxnCodec.encodeQuery("db", "BEGIN")) +:
                  part.map(r => (BinlogRowCodec.WriteV2,
                    BinlogRowCodec.encodeRows(BinlogRowCodec.WriteV2, schema,
                      Seq(Seq[Any](r.getLong(0))))))) :+
                  ((BinlogTxnCodec.XidType, BinlogTxnCodec.encodeXid(xid)))
              Seq(
                BinlogRowCodec.encodeEvent(BinlogGtidCodec.GtidType,
                  BinlogGtidCodec.encodeGtid(sid, xid)),
                BinlogRowCodec.encodeEvent(BinlogTxnPayloadCodec.TxnPayloadType,
                  BinlogTxnPayloadCodec.encodePayload(inner, compress = true,
                    timestamp = 1700000000L + xid)))
            }
          val h = (rows.length + 1) / 2
          txn(rows.take(h), gid * 2 + 1) ++ txn(rows.drop(h), gid * 2 + 2)
        })
        val o = t(s, dir, "orders")
        val key = col("o_orderkey")
        val grouped = o.groupBy((key - key % 4).cast(LongType).as("gid"))
          .agg(sort_array(collect_list(struct(key.cast(LongType)))).as("rows"))
        grouped.sortWithinPartitions("gid")
          .select(col("gid"), posexplode(enc(col("gid"), col("rows"))).as(Seq("ord", "ev")))
          .select(col("gid"), col("ord"), BinlogDecode.eventSplit(col("ev")).as("h"))
          .select(col("gid"), col("ord"),
            when(col("h.event_type") === BinlogTxnPayloadCodec.TxnPayloadType,
              BinlogTxnPayloadSplit(col("h.body")))
              .otherwise(array(col("h"))).as("subs"))
          // _outer: see q68 — plain posexplode lets InferFiltersFromGenerate
          // clone the zstd decode into a size() filter, inflating twice
          .select(col("gid"), col("ord"),
            posexplode_outer(col("subs")).as(Seq("sub", "h")))
          .select(col("gid"), (col("ord") * 100 + col("sub")).as("ord"),
            col("h.timestamp").as("timestamp"),
            col("h.event_type").as("event_type"), col("h.body").as("body"))
          .transform(Transactions.assemble(_, "gid", "ord"))
          .filter(col("event_type") === BinlogRowCodec.WriteV2)
          .select(col("xid"), col("commit_ts"), col("gtid"),
            BinlogDecode.rows(col("body"), col("event_type"), schema).as("r"))
          // _outer: see q68 — avoids the inferred filter double-decoding
          .select(col("xid"), col("commit_ts"), col("gtid"),
            explode_outer(col("r.data")).as("m"))
          .select(element_at(col("m"), "pk").cast(LongType).as("pk"),
            col("xid"), col("commit_ts").as("cts"), col("gtid"))
      },
      Some("""WITH g AS (
             |  SELECT o_orderkey AS pk,
             |    CAST(o_orderkey - o_orderkey % 4 AS BIGINT) AS gid,
             |    ROW_NUMBER() OVER (PARTITION BY o_orderkey - o_orderkey % 4
             |                       ORDER BY o_orderkey) AS rn,
             |    COUNT(*) OVER (PARTITION BY o_orderkey - o_orderkey % 4) AS n
             |  FROM orders),
             |x AS (SELECT pk, gid, printf('%032x', gid) AS hex,
             |  gid * 2 + (CASE WHEN rn <= (n + 1) // 2 THEN 1 ELSE 2 END) AS xid
             |  FROM g)
             |SELECT pk, xid, 1700000000 + xid AS cts,
             |  substr(hex, 1, 8) || '-' || substr(hex, 9, 4) || '-' ||
             |  substr(hex, 13, 4) || '-' || substr(hex, 17, 4) || '-' ||
             |  substr(hex, 21, 12) || ':' || CAST(xid AS VARCHAR) AS gtid
             |FROM x ORDER BY pk""".stripMargin)),

    // Schema evolution across DDL (beyond-reference: the reference goes
    // stale-then-refetch against the live server, executor.rs:33-48 —
    // a replayable engine can't). TABLE_MAPs carry types but NO names;
    // the binlog's own ALTER TABLE statements carry the name timeline.
    // Engine shape: QUERY events → per-table DDL fold (SchemaVersions,
    // metadata scale) → versioned name lists; row events decode
    // positionally via TABLE_MAP pairing (the q83 as-of join) and pick up
    // the era's names with a second as-of join on binlog position. The
    // fixture crosses TWO live ALTERs — ADD COLUMN then DROP COLUMN, with
    // changed table_ids as MySQL re-registers after DDL — and every row
    // lands with the correct columns for its side of each boundary.
    Q("q133_schema_evolution", { (s, dir) =>
        import graft.operators.AsofJoin
        val v1 = Seq("pk" -> "bigint", "price" -> "decimal(12,2)")
        val v2 = Seq("pk" -> "bigint", "price" -> "decimal(12,2)",
          "status" -> "varchar(4)")
        val v3 = Seq("pk" -> "bigint", "status" -> "varchar(4)")
        val (s1, s2, s3) = (BinlogSchema.fromMysqlTypes(v1),
          BinlogSchema.fromMysqlTypes(v2), BinlogSchema.fromMysqlTypes(v3))
        // TABLE_MAP at seq 3k, WRITE at 3k+1; the two ALTERs sit at
        // 3·5000+2 and 3·10000+2 — strictly between the last old-era
        // event and the first new-era TABLE_MAP.
        val encRow = udf((k: Long, price: String, status: String) => {
          val (sch, tid, vals) =
            if (k <= 5000) (s1, 7L, Seq[Any](k, price))
            else if (k <= 10000) (s2, 8L, Seq[Any](k, price, status))
            else (s3, 9L, Seq[Any](k, status))
          Seq(
            (3 * k, BinlogRowCodec.encodeEvent(19,
              BinlogRowCodec.encodeTableMap(tid, "db1", "t1", sch))),
            (3 * k + 1, BinlogRowCodec.encodeEvent(BinlogRowCodec.WriteV2,
              BinlogRowCodec.encodeRows(BinlogRowCodec.WriteV2, sch,
                Seq(vals), tableId = tid))))
        })
        val encDdl = udf((sql: String) => BinlogRowCodec.encodeEvent(
          BinlogTxnCodec.QueryType, BinlogTxnCodec.encodeQuery("db1", sql)))
        val o = t(s, dir, "orders")
        val rowEvents = o.sortWithinPartitions("o_orderkey")
          .select(explode(encRow(col("o_orderkey").cast(LongType),
            col("o_totalprice").cast(DecimalType(12, 2)).cast(StringType),
            col("o_orderstatus"))).as("e"))
          .select(col("e._1").as("seq"), col("e._2").as("ev"))
        import s.implicits._
        val ddlEvents = Seq(
            (15002L, "ALTER TABLE t1 ADD COLUMN status varchar(4) AFTER price"),
            (30002L, "ALTER TABLE `t1` DROP COLUMN price"))
          .toDF("seq", "sql")
          .select(col("seq"), encDdl(col("sql")).as("ev"))
        val events = rowEvents.unionByName(ddlEvents)

        // ---- engine side: bytes in, named+typed change rows out ----
        val split = events.select(col("seq"),
          BinlogDecode.eventSplit(col("ev")).as("h"))
        val alters = split
          .filter(col("h.event_type") === BinlogTxnCodec.QueryType)
          .select(col("seq"), BinlogDecode.query(col("h.body")).as("q"))
          .filter(col("q.sql").rlike("(?i)^\\s*ALTER\\s+TABLE"))
          .select(col("q.db").as("db"), AlterTargetTable(col("q.sql")).as("tbl"),
            col("seq"), col("q.sql").as("sql"))
        val bootstrap = array(v1.map { case (n, tp) =>
          struct(lit(n), lit(tp)) }: _*)
        val versions = alters
          .groupBy("db", "tbl")
          .agg(sort_array(collect_list(struct(col("seq"), col("sql")))).as("ddls"))
          .select(col("db"), col("tbl"),
            explode(SchemaVersions(bootstrap, col("ddls"))).as("v"))
          .select(col("db"), col("tbl"), col("v.from_ord").as("from_ord"),
            expr("transform(v.cols, c -> c.name)").as("names"))
        val tms = split.filter(col("h.event_type") === 19)
          .select(col("seq"), BinlogDecode.tableMap(col("h.body")).as("tm"))
          .select(col("tm.table_id").as("table_id"), col("seq"), col("tm"))
        val rows = split
          .filter(col("h.event_type") === BinlogRowCodec.WriteV2)
          .select(BinlogDecode.rowTableId(col("h.body")).as("table_id"),
            col("seq"), col("h.event_type").as("et"), col("h.body").as("body"))
        val decoded = AsofJoin
          .asofJoin(rows, tms, Seq("table_id"), "seq", "seq", Seq("tm"))
          .select(col("seq"), col("tm.database").as("db"),
            col("tm.table").as("tbl"),
            BinlogDecode.rowsDynamic(col("body"), col("et"), col("tm.cols")).as("r"))
        AsofJoin
          .asofJoin(decoded, versions, Seq("db", "tbl"), "seq", "from_ord",
            Seq("names"))
          // _outer: see q68 — avoids the inferred filter double-decoding
          .select(col("names"), explode_outer(col("r.data")).as("vals"))
          .select(map_from_arrays(col("names"), col("vals")).as("m"))
          .select(element_at(col("m"), "pk").cast(LongType).as("pk"),
            try_element_at(col("m"), lit("price")).as("price"),
            try_element_at(col("m"), lit("status")).as("status"))
      },
      Some("""SELECT o_orderkey AS pk,
             |  CASE WHEN o_orderkey <= 10000
             |    THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) END AS price,
             |  CASE WHEN o_orderkey > 5000 THEN o_orderstatus END AS status
             |FROM orders ORDER BY pk""".stripMargin)),

    // Statement attribution (beyond-reference: no type-29 arm in
    // binlog.rs): with binlog_rows_query_log_events=ON MySQL precedes
    // each statement's row events with a ROWS_QUERY event carrying the
    // original SQL text. One ROWS_QUERY covers ALL row events of its
    // statement, so pairing is ordered, not adjacent — the same
    // running-last window shape as Transactions.assemble: one shuffle on
    // the file key, no join, no recompute of the decode.
    Q("q134_binlog_rows_query", { (s, dir) =>
        import org.apache.spark.sql.Row
        import org.apache.spark.sql.expressions.Window
        val schema = BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint"))
        val enc = udf((gid: Long, rows: Seq[Row]) =>
          BinlogRowCodec.encodeEvent(BinlogTxnCodec.RowsQueryType,
            BinlogTxnCodec.encodeRowsQuery(s"INSERT /* batch $gid */")) +:
            rows.map(r => BinlogRowCodec.encodeEvent(BinlogRowCodec.WriteV2,
              BinlogRowCodec.encodeRows(BinlogRowCodec.WriteV2, schema,
                Seq(Seq[Any](r.getLong(0)))))))
        val o = t(s, dir, "orders")
        val key = col("o_orderkey")
        val grouped = o.groupBy((key - key % 4).cast(LongType).as("gid"))
          .agg(sort_array(collect_list(struct(key.cast(LongType)))).as("rows"))
        val split = grouped.sortWithinPartitions("gid")
          .select(col("gid"),
            posexplode(enc(col("gid"), col("rows"))).as(Seq("ord", "ev")))
          .select(col("gid"), col("ord"), BinlogDecode.eventSplit(col("ev")).as("h"))
        val w = Window.partitionBy("gid").orderBy("ord")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        split
          .withColumn("stmt", last(
            when(col("h.event_type") === BinlogTxnCodec.RowsQueryType,
              BinlogDecode.rowsQuery(col("h.body"))),
            ignoreNulls = true).over(w))
          .filter(col("h.event_type") === BinlogRowCodec.WriteV2)
          .select(col("stmt"),
            BinlogDecode.rows(col("h.body"), col("h.event_type"), schema).as("r"))
          // _outer: see q68 — avoids the inferred filter double-decoding
          .select(col("stmt"), explode_outer(col("r.data")).as("m"))
          .select(element_at(col("m"), "pk").cast(LongType).as("pk"), col("stmt"))
      },
      Some("""SELECT o_orderkey AS pk,
             |  'INSERT /* batch ' || CAST(o_orderkey - o_orderkey % 4 AS VARCHAR)
             |    || ' */' AS stmt
             |FROM orders ORDER BY pk""".stripMargin)),

    // Partial JSON updates (beyond-reference: binlog_row_value_options=
    // PARTIAL_JSON, MySQL 8.0.3+; the reference errors on JSON columns
    // outright). A JSON_SET on a large document logs a type-39
    // PARTIAL_UPDATE_ROWS_EVENT whose after image carries a diff sequence
    // (REPLACE/INSERT/REMOVE at concrete paths) instead of the whole
    // document. The decoder applies the diffs to the before image DURING
    // row decode, so downstream sees a plain UPDATE with materialized
    // documents — no consumer-side special-casing.
    Q("q136_binlog_json_partial", { (s, dir) =>
        val schema = BinlogSchema.fromMysqlTypes(Seq(
          "pk" -> "bigint", "doc" -> "json"))
        val enc = udf((k: Long, status: String, prio: String) => {
          val before = s"""{"st":"$status","tags":["a"]}"""
          val diff = JsonDiff.encode(Seq(
            (JsonDiff.Replace, "$.st", Some("\"" + status + "x\"")),
            (JsonDiff.Insert, "$.tags[1]", Some("\"" + prio + "\""))))
          BinlogRowCodec.encodeEvent(BinlogRowCodec.PartialUpdateV2,
            BinlogRowCodec.encodePartialRows(schema,
              images = Seq(Seq[Any](k, before), Seq[Any](k, diff)),
              diffCols = Set(1)))
        })
        val o = t(s, dir, "orders")
        o.sortWithinPartitions("o_orderkey")
          .select(BinlogDecode.eventSplit(enc(col("o_orderkey").cast(LongType),
            col("o_orderstatus"), col("o_orderpriority"))).as("h"))
          .select(BinlogDecode.rows(col("h.body"), col("h.event_type"), schema).as("r"))
          // _outer: see q68 — avoids the inferred filter double-decoding
          .select(explode_outer(col("r.data")).as("m"), col("r.old").as("olds"))
          .select(element_at(col("m"), "pk").cast(LongType).as("pk"),
            element_at(col("m"), "doc").as("doc"),
            element_at(element_at(col("olds"), 1), "doc").as("doc_before"))
      },
      Some("""SELECT o_orderkey AS pk,
             |  '{"st":"' || o_orderstatus || 'x","tags":["a","' ||
             |    o_orderpriority || '"]}' AS doc,
             |  '{"st":"' || o_orderstatus || '","tags":["a"]}' AS doc_before
             |FROM orders ORDER BY pk""".stripMargin)),

    // MariaDB transaction replay (beyond-reference: the reference and the
    // MySQL GTID path both assume uuid:gno; MariaDB positions are
    // domain-server-seqno and — structurally — a non-standalone
    // GTID_EVENT (type 162) REPLACES the QUERY("BEGIN") opener, with
    // server_id taken from the event header. Transactions.assemble
    // handles both dialects in one pass; a standalone GTID (DDL framing)
    // is a marker like MySQL's, spent by the statement it names.
    Q("q137_mariadb_txn", { (s, dir) =>
        import org.apache.spark.sql.Row
        val schema = BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint"))
        val enc = udf((gid: Long, rows: Seq[Row]) => {
          def writeEv(r: Row) = BinlogRowCodec.encodeEvent(
            BinlogRowCodec.WriteV2, BinlogRowCodec.encodeRows(
              BinlogRowCodec.WriteV2, schema, Seq(Seq[Any](r.getLong(0)))),
            serverId = 5L)
          def txn(part: Seq[Row], xid: Long): Seq[Array[Byte]] =
            if (part.isEmpty) Nil
            else (BinlogRowCodec.encodeEvent(MariaGtidCodec.GtidType,
              MariaGtidCodec.encodeGtid(seqNo = xid, domainId = gid % 4),
              serverId = 5L) +:
              part.map(writeEv)) :+
              BinlogRowCodec.encodeEvent(BinlogTxnCodec.XidType,
                BinlogTxnCodec.encodeXid(xid),
                timestamp = 1700000000L + xid, serverId = 5L)
          val h = (rows.length + 1) / 2
          txn(rows.take(h), gid * 2 + 1) ++ txn(rows.drop(h), gid * 2 + 2)
        })
        val o = t(s, dir, "orders")
        val key = col("o_orderkey")
        val grouped = o.groupBy((key - key % 4).cast(LongType).as("gid"))
          .agg(sort_array(collect_list(struct(key.cast(LongType)))).as("rows"))
        grouped.sortWithinPartitions("gid")
          .select(col("gid"),
            posexplode(enc(col("gid"), col("rows"))).as(Seq("ord", "ev")))
          .select(col("gid"), col("ord"), BinlogDecode.eventSplit(col("ev")).as("h"))
          .select(col("gid"), col("ord"), col("h.timestamp").as("timestamp"),
            col("h.server_id").as("server_id"),
            col("h.event_type").as("event_type"), col("h.body").as("body"))
          .transform(Transactions.assemble(_, "gid", "ord",
            serverIdCol = "server_id"))
          .filter(col("event_type") === BinlogRowCodec.WriteV2)
          .select(col("xid"), col("commit_ts"), col("gtid"),
            BinlogDecode.rows(col("body"), col("event_type"), schema).as("r"))
          // _outer: see q68 — avoids the inferred filter double-decoding
          .select(col("xid"), col("commit_ts"), col("gtid"),
            explode_outer(col("r.data")).as("m"))
          .select(element_at(col("m"), "pk").cast(LongType).as("pk"),
            col("xid"), col("commit_ts").as("cts"), col("gtid"))
      },
      Some("""WITH g AS (
             |  SELECT o_orderkey AS pk,
             |    CAST(o_orderkey - o_orderkey % 4 AS BIGINT) AS gid,
             |    ROW_NUMBER() OVER (PARTITION BY o_orderkey - o_orderkey % 4
             |                       ORDER BY o_orderkey) AS rn,
             |    COUNT(*) OVER (PARTITION BY o_orderkey - o_orderkey % 4) AS n
             |  FROM orders),
             |x AS (SELECT pk, gid,
             |  gid * 2 + (CASE WHEN rn <= (n + 1) // 2 THEN 1 ELSE 2 END) AS xid
             |  FROM g)
             |SELECT pk, xid, 1700000000 + xid AS cts,
             |  CAST(gid % 4 AS VARCHAR) || '-5-' || CAST(xid AS VARCHAR) AS gtid
             |FROM x ORDER BY pk""".stripMargin)),

    // The schema-version timeline AS a queryable output — the "schema
    // registry" view a consumer browses to understand what each era of a
    // table looked like and since when. Oracle-locks the SchemaVersions
    // fold's exact output (era boundaries, positional name order, type
    // evolution) against hand-written expectations.
    Q("q142_schema_registry", { (s, dir) =>
        import s.implicits._
        val enc = udf((sql: String) => BinlogRowCodec.encodeEvent(
          BinlogTxnCodec.QueryType, BinlogTxnCodec.encodeQuery("db1", sql)))
        // a keyed fixture (one row per DDL) so the fold runs distributed
        val ddls = Seq(
            (10L, "ALTER TABLE t1 ADD COLUMN status varchar(4) AFTER price"),
            (20L, "ALTER TABLE `t1` MODIFY COLUMN price decimal(14,4)"),
            (30L, "ALTER TABLE t1 RENAME COLUMN status TO st"),
            (40L, "ALTER TABLE t1 DROP COLUMN price"))
          .toDF("seq", "sql")
          .select(col("seq"), enc(col("sql")).as("ev"))
          .select(col("seq"), BinlogDecode.eventSplit(col("ev")).as("h"))
          .select(col("seq"), BinlogDecode.query(col("h.body")).as("q"))
          .select(col("q.db").as("db"), AlterTargetTable(col("q.sql")).as("tbl"),
            col("seq"), col("q.sql").as("sql"))
        ddls.groupBy("db", "tbl")
          .agg(sort_array(collect_list(struct(col("seq"), col("sql")))).as("ddls"))
          .select(col("db"), col("tbl"), posexplode(SchemaVersions(
            array(struct(lit("pk"), lit("bigint")),
              struct(lit("price"), lit("decimal(12,2)"))),
            col("ddls"))).as(Seq("version", "v")))
          .select(col("db"), col("tbl"), col("version"),
            greatest(col("v.from_ord"), lit(0L)).as("from_seq"),
            concat_ws(",", expr(
              "transform(v.cols, c -> c.name || ' ' || c.mysql_type)")).as("cols"))
          .orderBy("version")
      },
      Some("""SELECT * FROM (VALUES
             |  ('db1', 't1', 0, 0, 'pk bigint,price decimal(12,2)'),
             |  ('db1', 't1', 1, 10, 'pk bigint,price decimal(12,2),status varchar(4)'),
             |  ('db1', 't1', 2, 20, 'pk bigint,price decimal(14,4),status varchar(4)'),
             |  ('db1', 't1', 3, 30, 'pk bigint,price decimal(14,4),st varchar(4)'),
             |  ('db1', 't1', 4, 40, 'pk bigint,st varchar(4)'))
             |  AS t(db, tbl, version, from_seq, cols)
             |ORDER BY version""".stripMargin)),

    // TRUNCATE-aware latest-image merge: TRUNCATE TABLE arrives IN-BAND
    // as a DDL change event (that is how Canal emits it), and a correct
    // snapshot consumer must wipe everything the stream said before the
    // LAST truncate — replaying the archive must not resurrect wiped
    // rows. The truncate position is derived from the stream itself (a
    // metadata-scale max over the DDL markers, broadcast back as a
    // scalar), then the standard pk merge runs on the surviving suffix.
    Q("q141_truncate_merge", { (s, dir) =>
        import s.implicits._
        val o = t(s, dir, "orders")
        val ins = o.select(
          (col("o_orderkey") * 3).as("cid"), col("o_orderkey").as("pk"),
          lit("INSERT").as("type"), col("o_totalprice").as("price"))
        val upd = o.filter(col("o_orderkey") % 3 === 0).select(
          (col("o_orderkey") * 3 + 1).as("cid"), col("o_orderkey").as("pk"),
          lit("UPDATE").as("type"), (col("o_totalprice") + 1000.0).as("price"))
        val del = o.filter(col("o_orderkey") % 7 === 0).select(
          (col("o_orderkey") * 3 + 2).as("cid"), col("o_orderkey").as("pk"),
          lit("DELETE").as("type"), lit(null).cast(DoubleType).as("price"))
        val truncs = Seq(15000L, 22500L).toDF("cid")
          .select(col("cid"), lit(null).cast(LongType).as("pk"),
            lit("DDL").as("type"), lit(null).cast(DoubleType).as("price"),
            lit("TRUNCATE TABLE orders").as("sql"))
        val changes = ins.union(upd).union(del)
          .withColumn("sql", lit(null).cast(StringType))
          .unionByName(truncs)
        val lastTrunc = changes
          .filter(col("type") === "DDL" &&
            upper(col("sql")).startsWith("TRUNCATE"))
          .agg(max("cid").as("tcid"))
        val live = changes.filter(col("type") =!= "DDL")
          .crossJoin(broadcast(lastTrunc))
          .filter(col("cid") > coalesce(col("tcid"), lit(Long.MinValue)))
          .drop("tcid", "sql")
        CdcMerge.latestImage(live, Seq("pk"), "cid")
          .select("pk", "type", "price").orderBy("pk")
      },
      Some("""WITH chg AS (
             |  SELECT o_orderkey*3 AS cid, o_orderkey AS pk, 'INSERT' AS type, o_totalprice AS price FROM orders
             |  UNION ALL
             |  SELECT o_orderkey*3+1, o_orderkey, 'UPDATE', o_totalprice + 1000.0 FROM orders WHERE o_orderkey % 3 = 0
             |  UNION ALL
             |  SELECT o_orderkey*3+2, o_orderkey, 'DELETE', NULL FROM orders WHERE o_orderkey % 7 = 0
             |), live AS (
             |  SELECT * FROM chg WHERE cid > 22500
             |), ranked AS (
             |  SELECT *, row_number() OVER (PARTITION BY pk ORDER BY cid DESC) AS rn FROM live
             |)
             |SELECT pk, type, price FROM ranked WHERE rn = 1 AND type <> 'DELETE'
             |ORDER BY pk""".stripMargin)),

    // Round capstone: the q133 schema-evolution stream PLUS later
    // re-writes of every third key under the final (post-DROP) schema,
    // merged to a latest-image snapshot. A pk written in the
    // two-column era and re-written after two ALTERs must surface the
    // new-era image — columns the final schema dropped come back null —
    // while untouched pks keep their original era's columns. This is the
    // exact shape a real CDC consumer faces replaying a binlog archive
    // that crosses DDL into a warehouse snapshot.
    Q("q140_evolved_snapshot", { (s, dir) =>
        import graft.operators.AsofJoin
        import org.apache.spark.sql.expressions.Window
        val v1 = Seq("pk" -> "bigint", "price" -> "decimal(12,2)")
        val (s1, s2, s3) = (BinlogSchema.fromMysqlTypes(v1),
          BinlogSchema.fromMysqlTypes(v1 :+ ("status" -> "varchar(4)")),
          BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint", "status" -> "varchar(4)")))
        // first write at 4k(+1); re-write of k%3==0 keys at BASE+4k(+1),
        // after every DDL; ALTERs at 4·5000+2 and 4·10000+2
        val Base = 80000000L
        val encRow = udf((k: Long, price: String, status: String, prio: String) => {
          val (sch, tid, vals) =
            if (k <= 5000) (s1, 7L, Seq[Any](k, price))
            else if (k <= 10000) (s2, 8L, Seq[Any](k, price, status))
            else (s3, 9L, Seq[Any](k, status))
          val first = Seq(
            (4 * k, BinlogRowCodec.encodeEvent(19,
              BinlogRowCodec.encodeTableMap(tid, "db1", "t1", sch))),
            (4 * k + 1, BinlogRowCodec.encodeEvent(BinlogRowCodec.WriteV2,
              BinlogRowCodec.encodeRows(BinlogRowCodec.WriteV2, sch,
                Seq(vals), tableId = tid))))
          if (k % 3 != 0) first
          else first ++ Seq(
            (Base + 4 * k, BinlogRowCodec.encodeEvent(19,
              BinlogRowCodec.encodeTableMap(9L, "db1", "t1", s3))),
            (Base + 4 * k + 1, BinlogRowCodec.encodeEvent(BinlogRowCodec.WriteV2,
              BinlogRowCodec.encodeRows(BinlogRowCodec.WriteV2, s3,
                Seq(Seq[Any](k, prio)), tableId = 9L))))
        })
        val encDdl = udf((sql: String) => BinlogRowCodec.encodeEvent(
          BinlogTxnCodec.QueryType, BinlogTxnCodec.encodeQuery("db1", sql)))
        val o = t(s, dir, "orders")
        val rowEvents = o.sortWithinPartitions("o_orderkey")
          .select(explode(encRow(col("o_orderkey").cast(LongType),
            col("o_totalprice").cast(DecimalType(12, 2)).cast(StringType),
            col("o_orderstatus"), col("o_orderpriority"))).as("e"))
          .select(col("e._1").as("seq"), col("e._2").as("ev"))
        import s.implicits._
        val ddlEvents = Seq(
            (20002L, "ALTER TABLE t1 ADD COLUMN status varchar(4) AFTER price"),
            (40002L, "ALTER TABLE `t1` DROP COLUMN price"))
          .toDF("seq", "sql")
          .select(col("seq"), encDdl(col("sql")).as("ev"))
        val split = rowEvents.unionByName(ddlEvents)
          .select(col("seq"), BinlogDecode.eventSplit(col("ev")).as("h"))
        val alters = split
          .filter(col("h.event_type") === BinlogTxnCodec.QueryType)
          .select(col("seq"), BinlogDecode.query(col("h.body")).as("q"))
          .filter(col("q.sql").rlike("(?i)^\\s*ALTER\\s+TABLE"))
          .select(col("q.db").as("db"), AlterTargetTable(col("q.sql")).as("tbl"),
            col("seq"), col("q.sql").as("sql"))
        val versions = alters
          .groupBy("db", "tbl")
          .agg(sort_array(collect_list(struct(col("seq"), col("sql")))).as("ddls"))
          .select(col("db"), col("tbl"),
            explode(SchemaVersions(array(v1.map { case (n, tp) =>
              struct(lit(n), lit(tp)) }: _*), col("ddls"))).as("v"))
          .select(col("db"), col("tbl"), col("v.from_ord").as("from_ord"),
            expr("transform(v.cols, c -> c.name)").as("names"))
        val tms = split.filter(col("h.event_type") === 19)
          .select(col("seq"), BinlogDecode.tableMap(col("h.body")).as("tm"))
          .select(col("tm.table_id").as("table_id"), col("seq"), col("tm"))
        val rows = split
          .filter(col("h.event_type") === BinlogRowCodec.WriteV2)
          .select(BinlogDecode.rowTableId(col("h.body")).as("table_id"),
            col("seq"), col("h.event_type").as("et"), col("h.body").as("body"))
        val named = AsofJoin
          .asofJoin(rows, tms, Seq("table_id"), "seq", "seq", Seq("tm"))
          .select(col("seq"), col("tm.database").as("db"),
            col("tm.table").as("tbl"),
            BinlogDecode.rowsDynamic(col("body"), col("et"), col("tm.cols")).as("r"))
          .transform(AsofJoin.asofJoin(_, versions, Seq("db", "tbl"),
            "seq", "from_ord", Seq("names")))
          // _outer: see q68 — avoids the inferred filter double-decoding
          .select(col("seq"), col("names"), explode_outer(col("r.data")).as("vals"))
          .select(col("seq"), map_from_arrays(col("names"), col("vals")).as("m"))
        // latest image per pk: the change stream's final word wins
        named
          .select(element_at(col("m"), "pk").cast(LongType).as("pk"),
            col("seq"), col("m"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("pk").orderBy(col("seq").desc)))
          .filter(col("rn") === 1)
          .select(col("pk"),
            try_element_at(col("m"), lit("price")).as("price"),
            try_element_at(col("m"), lit("status")).as("status"))
      },
      Some("""SELECT o_orderkey AS pk,
             |  CASE WHEN o_orderkey % 3 != 0 AND o_orderkey <= 10000
             |    THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) END AS price,
             |  CASE WHEN o_orderkey % 3 = 0 THEN o_orderpriority
             |       WHEN o_orderkey > 5000 THEN o_orderstatus END AS status
             |FROM orders ORDER BY pk""".stripMargin)),

    // Snapshot DIFF → change stream (the inverse of the q33 latest-image
    // merge, and the generator a backfill runs when no binlog exists for
    // a period — diff two snapshots, emit synthetic INSERT/UPDATE/DELETE
    // envelopes): one pk-keyed FULL OUTER join classifies every key,
    // unchanged rows are dropped, changed ones carry before/after images.
    // Same formula-drifted target as q187 (plus status flips), so the
    // two reconciliation views agree by construction.
    Q("q191_snapshot_diff", { (s, dir) =>
        val o = t(s, dir, "orders")
        val v1 = o.select(col("o_orderkey").as("pk"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("price"),
          col("o_orderstatus").as("st"))
        val v2 = v1
          .filter(col("pk") % 530 =!= 0)
          .withColumn("price",
            when(col("pk") % 970 === 0, col("price") + 5).otherwise(col("price")))
          .withColumn("st",
            when(col("pk") % 113 === 0, lit("X")).otherwise(col("st")))
          .unionAll(v1.filter(col("pk") % 1010 === 0)
            .select((col("pk") + 3000000L).as("pk"), col("price"), col("st")))
        val a = v1.select(col("pk"), col("price").as("old_price"), col("st").as("old_st"))
        val b = v2.select(col("pk"), col("price").as("new_price"), col("st").as("new_st"))
        a.join(b, Seq("pk"), "full")
          .withColumn("change",
            when(col("new_st").isNull, "DELETE")
              .when(col("old_st").isNull, "INSERT")
              .when(col("old_price") =!= col("new_price") ||
                col("old_st") =!= col("new_st"), "UPDATE"))
          .filter(col("change").isNotNull)
          .select(col("pk"), col("change"),
            col("old_price").cast(DoubleType).as("old_price"),
            col("new_price").cast(DoubleType).as("new_price"),
            col("old_st"), col("new_st"))
          .orderBy("pk")
      },
      Some("""WITH v1 AS (SELECT o_orderkey AS pk,
             |    CAST(o_totalprice AS DECIMAL(18,2)) AS price,
             |    o_orderstatus AS st FROM orders),
             |v2 AS (SELECT pk,
             |    CASE WHEN pk % 970 = 0 THEN price + 5 ELSE price END AS price,
             |    CASE WHEN pk % 113 = 0 THEN 'X' ELSE st END AS st
             |  FROM v1 WHERE pk % 530 <> 0
             |  UNION ALL SELECT pk + 3000000, price, st FROM v1 WHERE pk % 1010 = 0),
             |d AS (SELECT coalesce(a.pk, b.pk) AS pk,
             |    a.price AS old_price, a.st AS old_st,
             |    b.price AS new_price, b.st AS new_st
             |  FROM v1 a FULL OUTER JOIN v2 b ON a.pk = b.pk)
             |SELECT pk,
             |  CASE WHEN new_st IS NULL THEN 'DELETE'
             |       WHEN old_st IS NULL THEN 'INSERT'
             |       WHEN old_price <> new_price OR old_st <> new_st THEN 'UPDATE'
             |  END AS change,
             |  CAST(old_price AS DOUBLE) AS old_price,
             |  CAST(new_price AS DOUBLE) AS new_price, old_st, new_st
             |FROM d
             |WHERE (CASE WHEN new_st IS NULL THEN 'DELETE'
             |       WHEN old_st IS NULL THEN 'INSERT'
             |       WHEN old_price <> new_price OR old_st <> new_st THEN 'UPDATE'
             |  END) IS NOT NULL
             |ORDER BY pk""".stripMargin)),

    // Replica reconciliation by bucket digest — the pt-table-checksum
    // shape (Percona's canonical replication-verification tool; also
    // DBLog's validation pass): source and target exchange per-bucket
    // (row count, digest) pairs and drill into MISMATCHING buckets only —
    // at 100 TB the wire carries n_buckets tuples, never rows. Target =
    // source with formula-injected drift (sparse: every 530th row deleted, every
    // 970th price changed, inserts past the key horizon). Digest = sum of
    // a per-row md5-prefix integer (the engine-portable strpos-arithmetic
    // hash — addition is order-insensitive, so the distributed sum is
    // partition-independent and comparable across engines); the value
    // string fixes DECIMAL(18,2) rendering so both engines hash the same
    // bytes. One bucket-key agg per side + one full-outer join of
    // bucket-count rows.
    Q("q187_table_checksum_diff", { (s, dir) =>
        val o = t(s, dir, "orders")
        val src = o.select(col("o_orderkey").as("k"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("p"),
          col("o_orderstatus").as("st"))
        val dst = src
          .filter(col("k") % 530 =!= 0)
          .withColumn("p",
            when(col("k") % 970 === 0, col("p") + 1).otherwise(col("p")))
          .unionAll(src.filter(col("k") % 1010 === 0)
            .select((col("k") + 3000000L).as("k"), col("p"), col("st")))
        val digits = lit("0123456789abcdef")
        def rowHash(df: org.apache.spark.sql.DataFrame) = {
          val h = md5(concat_ws("|", col("k").cast(StringType),
            col("p").cast(StringType), col("st")))
          val uint = (0 until 6).map { i =>
            (instr(digits, substring(h, i + 1, 1)) - 1).cast(LongType) *
              (1L << (4 * (5 - i)))
          }.reduce(_ + _)
          df.select((col("k") - pmod(col("k"), lit(64))).as("bucket"), uint.as("rh"))
            .groupBy("bucket")
            .agg(count(lit(1)).as("n"), sum("rh").as("digest"))
        }
        rowHash(src).select(col("bucket"), col("n").as("src_rows"),
            col("digest").as("src_digest"))
          .join(rowHash(dst).select(col("bucket"), col("n").as("dst_rows"),
            col("digest").as("dst_digest")), Seq("bucket"), "full")
          .select(col("bucket"),
            coalesce(col("src_rows"), lit(0L)).as("src_rows"),
            coalesce(col("dst_rows"), lit(0L)).as("dst_rows"),
            coalesce(col("src_digest"), lit(-1L)).as("src_digest"),
            coalesce(col("dst_digest"), lit(-1L)).as("dst_digest"))
          .withColumn("consistent",
            col("src_rows") === col("dst_rows") &&
              col("src_digest") === col("dst_digest"))
          .orderBy("bucket")
      },
      Some("""WITH src AS (SELECT o_orderkey AS k,
             |    CAST(o_totalprice AS DECIMAL(18,2)) AS p,
             |    o_orderstatus AS st FROM orders),
             |dst AS (SELECT k, CASE WHEN k % 970 = 0 THEN p + 1 ELSE p END AS p, st
             |    FROM src WHERE k % 530 <> 0
             |  UNION ALL
             |  SELECT k + 3000000, p, st FROM src WHERE k % 1010 = 0),
             |sh AS (SELECT k - k % 64 AS bucket,
             |    CAST(strpos('0123456789abcdef', substr(md5(CAST(k AS VARCHAR) || '|' || CAST(p AS VARCHAR) || '|' || st), 1, 1)) - 1 AS BIGINT) * 1048576
             |  + CAST(strpos('0123456789abcdef', substr(md5(CAST(k AS VARCHAR) || '|' || CAST(p AS VARCHAR) || '|' || st), 2, 1)) - 1 AS BIGINT) * 65536
             |  + CAST(strpos('0123456789abcdef', substr(md5(CAST(k AS VARCHAR) || '|' || CAST(p AS VARCHAR) || '|' || st), 3, 1)) - 1 AS BIGINT) * 4096
             |  + CAST(strpos('0123456789abcdef', substr(md5(CAST(k AS VARCHAR) || '|' || CAST(p AS VARCHAR) || '|' || st), 4, 1)) - 1 AS BIGINT) * 256
             |  + CAST(strpos('0123456789abcdef', substr(md5(CAST(k AS VARCHAR) || '|' || CAST(p AS VARCHAR) || '|' || st), 5, 1)) - 1 AS BIGINT) * 16
             |  + CAST(strpos('0123456789abcdef', substr(md5(CAST(k AS VARCHAR) || '|' || CAST(p AS VARCHAR) || '|' || st), 6, 1)) - 1 AS BIGINT) AS rh
             |  FROM src),
             |dh AS (SELECT k - k % 64 AS bucket,
             |    CAST(strpos('0123456789abcdef', substr(md5(CAST(k AS VARCHAR) || '|' || CAST(p AS VARCHAR) || '|' || st), 1, 1)) - 1 AS BIGINT) * 1048576
             |  + CAST(strpos('0123456789abcdef', substr(md5(CAST(k AS VARCHAR) || '|' || CAST(p AS VARCHAR) || '|' || st), 2, 1)) - 1 AS BIGINT) * 65536
             |  + CAST(strpos('0123456789abcdef', substr(md5(CAST(k AS VARCHAR) || '|' || CAST(p AS VARCHAR) || '|' || st), 3, 1)) - 1 AS BIGINT) * 4096
             |  + CAST(strpos('0123456789abcdef', substr(md5(CAST(k AS VARCHAR) || '|' || CAST(p AS VARCHAR) || '|' || st), 4, 1)) - 1 AS BIGINT) * 256
             |  + CAST(strpos('0123456789abcdef', substr(md5(CAST(k AS VARCHAR) || '|' || CAST(p AS VARCHAR) || '|' || st), 5, 1)) - 1 AS BIGINT) * 16
             |  + CAST(strpos('0123456789abcdef', substr(md5(CAST(k AS VARCHAR) || '|' || CAST(p AS VARCHAR) || '|' || st), 6, 1)) - 1 AS BIGINT) AS rh
             |  FROM dst),
             |sa AS (SELECT bucket, CAST(count(*) AS BIGINT) AS src_rows,
             |    CAST(sum(rh) AS BIGINT) AS src_digest FROM sh GROUP BY bucket),
             |da AS (SELECT bucket, CAST(count(*) AS BIGINT) AS dst_rows,
             |    CAST(sum(rh) AS BIGINT) AS dst_digest FROM dh GROUP BY bucket)
             |SELECT coalesce(sa.bucket, da.bucket) AS bucket,
             |  coalesce(src_rows, 0) AS src_rows, coalesce(dst_rows, 0) AS dst_rows,
             |  coalesce(src_digest, -1) AS src_digest,
             |  coalesce(dst_digest, -1) AS dst_digest,
             |  (coalesce(src_rows, 0) = coalesce(dst_rows, 0) AND
             |   coalesce(src_digest, -1) = coalesce(dst_digest, -1)) AS consistent
             |FROM sa FULL OUTER JOIN da ON sa.bucket = da.bucket
             |ORDER BY bucket""".stripMargin))
  )

  /** Shared fixture for q130/q131: the q129 stream with 8 server
    * identities — sid = uuid((gid/4) % 8), gno = xid — so every sid
    * accumulates two-wide gno islands ({2·gid+1, 2·gid+2} per group)
    * separated by gaps, and single-width islands where a group holds one
    * key. Returns the [[Transactions.assemble]]-stamped event stream.
    */
  private def gtidAssembled(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    val schema = BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint"))
    // sid = uuid((gid/4) % 8): 8 server identities across the groups
    val enc = udf((gid: Long, rows: Seq[Row]) => txnFixtureEvents(
      schema, sid = Some(uuidOfLong((gid >> 2) % 8)), gid, rows,
      r => Seq[Any](r.getLong(0))))
    val o = t(s, dir, "orders")
    val key = col("o_orderkey")
    val grouped = o.groupBy((key - key % 4).cast(LongType).as("gid"))
      .agg(sort_array(collect_list(struct(key.cast(LongType)))).as("rows"))
    grouped.sortWithinPartitions("gid")
      .select(col("gid"),
        posexplode(enc(col("gid"), col("rows"))).as(Seq("ord", "ev")))
      .select(col("gid"), col("ord"), BinlogDecode.eventSplit(col("ev")).as("h"))
      .select(col("gid"), col("ord"), col("h.timestamp").as("timestamp"),
        col("h.event_type").as("event_type"), col("h.body").as("body"))
      .transform(Transactions.assemble(_, "gid", "ord"))
  }
}
