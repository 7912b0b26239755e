package graft

import graft.cdc.BinlogCodec

/** The custom expressions resolve and evaluate by SQL name after
  * registration — the surface a pure-SQL user of the engine sees.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("registered SQL functions evaluate the custom expressions") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((BinlogCodec.encodeDecimalUnscaled(12345678901234L, 14, 4),
         BinlogCodec.encodeDate(2024, 3, 7)))
      .toDF("dec", "d").createOrReplaceTempView("bl")
    val r = spark.sql(
      """SELECT mysql_packed_decimal(dec, 14, 4) AS ds,
        |       mysql_packed_date(d) AS dt,
        |       cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cs,
        |       word_shingles(array('a', 'b', 'c', 'a', 'b', 'c'), 3) AS sh,
        |       simhash64(array('x', 'y')) AS sim
        |FROM bl""".stripMargin).collect().head
    assert(r.getString(0) == "1234567890.1234")
    assert(r.getString(1) == "2024-03-07")
    assert(r.getDouble(2) == 1.0)
    assert(r.getAs[collection.Seq[String]]("sh") == Seq("a b c", "b c a", "c a b"))
    assert(r.getLong(4) != 0L)
  }

  test("round-8 decode family evaluates by SQL name") {
    import graft.cdc.{BinlogTxnCodec, MariaGtidCodec}
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((BinlogTxnCodec.encodeQuery("db1", "ALTER TABLE `db1`.`t1` ADD c int"),
         BinlogTxnCodec.encodeRowsQuery("INSERT INTO t VALUES (1)"),
         MariaGtidCodec.encodeGtid(42L, 3L)))
      .toDF("q", "rq", "mg").createOrReplaceTempView("r8")
    val r = spark.sql(
      """SELECT binlog_query_decode(q).sql AS sql,
        |       alter_target_table(binlog_query_decode(q).sql) AS tbl,
        |       binlog_rows_query(rq) AS stmt,
        |       maria_gtid_decode(mg).seq_no AS seq,
        |       schema_versions(
        |         array(struct('pk', 'bigint')),
        |         array(struct(CAST(5 AS BIGINT), 'ALTER TABLE t1 ADD c int')))
        |         [1].cols[1].name AS newcol,
        |       bpe_init_word('low') AS syms
        |FROM r8""".stripMargin).collect().head
    assert(r.getString(1) == "t1")
    assert(r.getString(2) == "INSERT INTO t VALUES (1)")
    assert(r.getLong(3) == 42L)
    assert(r.getString(4) == "c")
    assert(r.getAs[collection.Seq[String]]("syms") == Seq("l", "o", "w", "</w>"))
  }

  test("round-10 AV/tokenizer family evaluates by SQL name") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((graft.multimodal.PcmFixtures.formulaWav(3L),
         graft.multimodal.VideoFixtures.formulaAvi(3L)))
      .toDF("wav", "avi").createOrReplaceTempView("r10")
    val r = spark.sql(
      """SELECT audio_pcm_stats(wav).n_samples AS ns,
        |       video_dib_stats(avi).n_frames AS nf,
        |       wordpiece_init('word') AS wp,
        |       winnow_fingerprint(array('a','b','a','b','a','b'), 2, 3) AS plain,
        |       winnow_fingerprint(array('a','b','a','b','a','b'), 2, 3, true) AS robust
        |FROM r10""".stripMargin).collect().head
    assert(r.getLong(0) == 3L % 200 + 50)
    assert(r.getInt(1) == (3L % 4 + 2).toInt)
    assert(r.getAs[collection.Seq[String]]("wp") == Seq("w", "##o", "##r", "##d"))
    // repeated grams tie every window: the robust rule re-selects one
    // position across the run, so it records no MORE than plain
    assert(r.getAs[collection.Seq[Any]]("robust").length
      <= r.getAs[collection.Seq[Any]]("plain").length)
  }

  test("cosine_sim fails loudly on mismatched embedding dimensions") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1.0d, 2.0d), array(1.0d))").collect()
    }
    assert(e.getMessage.contains("dimensions differ") ||
      Option(e.getCause).exists(_.getMessage.contains("dimensions differ")))
  }

  test("non-literal precision argument is rejected with a clear error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT mysql_packed_decimal(cast('x' as binary), 1 + 1, 0)").collect()
    }
    assert(e.getMessage.contains("INT literal") || e.getMessage.contains("mysql_packed_decimal"))
  }
}
