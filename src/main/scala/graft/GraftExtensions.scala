package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.ColumnBridge
import graft.cdc.{MySqlPackedDate, MySqlPackedDatetime, MySqlPackedDecimal, MySqlPackedTime, MySqlPackedTimestamp}
import graft.llm.{CosineSim, SimHash64, TokenTopCount, WordShingles, WordSpans}

/** SQL-name registration for the engine's custom Catalyst expressions, so
  * `spark.sql("SELECT mysql_packed_decimal(b, 14, 4) ...")` works without
  * the Column API. Two wirings share one function table:
  * `spark.sql.extensions=graft.GraftExtensions` at session build (the
  * cluster-config path), or [[GraftExtensions.register]] on a live
  * session (REPL/tests).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinGuardRule)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, name: String, arg: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name: $arg must be an INT literal, got $other")
  }

  private def boolLit(e: Expression, name: String, arg: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$name: $arg must be a BOOLEAN literal, got $other")
  }

  /** name → builder for every SQL-exposed custom expression. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "mysql_packed_decimal" -> { args: Seq[Expression] =>
      require(args.length == 3, "mysql_packed_decimal(bytes, precision, scale)")
      MySqlPackedDecimal(args(0),
        intLit(args(1), "mysql_packed_decimal", "precision"),
        intLit(args(2), "mysql_packed_decimal", "scale"))
    },
    "mysql_packed_date" -> { args: Seq[Expression] =>
      require(args.length == 1, "mysql_packed_date(bytes)")
      MySqlPackedDate(args(0))
    },
    "mysql_packed_time" -> { args: Seq[Expression] =>
      require(args.length == 2, "mysql_packed_time(bytes, fsp)")
      MySqlPackedTime(args(0), intLit(args(1), "mysql_packed_time", "fsp"))
    },
    "mysql_packed_datetime" -> { args: Seq[Expression] =>
      require(args.length == 2, "mysql_packed_datetime(bytes, fsp)")
      MySqlPackedDatetime(args(0), intLit(args(1), "mysql_packed_datetime", "fsp"))
    },
    "mysql_packed_timestamp" -> { args: Seq[Expression] =>
      require(args.length == 2, "mysql_packed_timestamp(bytes, fsp)")
      MySqlPackedTimestamp(args(0), intLit(args(1), "mysql_packed_timestamp", "fsp"))
    },
    "cosine_sim" -> { args: Seq[Expression] =>
      require(args.length == 2, "cosine_sim(a, b)")
      CosineSim(args(0), args(1))
    },
    "word_shingles" -> { args: Seq[Expression] =>
      require(args.length == 2, "word_shingles(tokens, k)")
      WordShingles(args(0), intLit(args(1), "word_shingles", "k"))
    },
    "simhash64" -> { args: Seq[Expression] =>
      require(args.length == 1, "simhash64(tokens)")
      SimHash64(args(0))
    },
    "token_top_count" -> { args: Seq[Expression] =>
      require(args.length == 1, "token_top_count(tokens)")
      TokenTopCount(args(0))
    },
    "word_spans" -> { args: Seq[Expression] =>
      require(args.length == 2, "word_spans(tokens, k)")
      WordSpans(args(0), intLit(args(1), "word_spans", "k"))
    },
    "zorder2" -> { args: Seq[Expression] =>
      require(args.length == 2, "zorder2(x, y)")
      graft.sources.ZOrder2(args(0), args(1))
    },
    "sniff_media" -> { args: Seq[Expression] =>
      require(args.length == 1, "sniff_media(content)")
      graft.multimodal.SniffMedia(args(0))
    },
    "sniff_wav" -> { args: Seq[Expression] =>
      require(args.length == 1, "sniff_wav(content)")
      graft.multimodal.SniffWav(args(0))
    },
    "mysql_packet_split" -> { args: Seq[Expression] =>
      require(args.length == 1, "mysql_packet_split(stream)")
      graft.cdc.MysqlPacketSplit(args(0))
    },
    "mysql_handshake" -> { args: Seq[Expression] =>
      require(args.length == 1, "mysql_handshake(payload)")
      graft.cdc.MysqlHandshakeDecode(args(0))
    },
    "mysql_scramble" -> { args: Seq[Expression] =>
      require(args.length == 2, "mysql_scramble(password, seed)")
      graft.cdc.MysqlScramble(args(0), args(1))
    },
    "mysql_ok_decode" -> { args: Seq[Expression] =>
      require(args.length == 1, "mysql_ok_decode(payload)")
      graft.cdc.MysqlOkDecode(args(0))
    },
    "binlog_query_decode" -> { args: Seq[Expression] =>
      require(args.length == 1, "binlog_query_decode(body)")
      graft.cdc.BinlogQueryDecode(args(0))
    },
    "binlog_rows_query" -> { args: Seq[Expression] =>
      require(args.length == 1, "binlog_rows_query(body)")
      graft.cdc.BinlogRowsQueryDecode(args(0))
    },
    "alter_target_table" -> { args: Seq[Expression] =>
      require(args.length == 1, "alter_target_table(sql)")
      graft.cdc.AlterTargetTable(args(0))
    },
    "schema_versions" -> { args: Seq[Expression] =>
      require(args.length == 2, "schema_versions(bootstrap, ddls)")
      graft.cdc.SchemaVersions(args(0), args(1))
    },
    "maria_gtid_decode" -> { args: Seq[Expression] =>
      require(args.length == 1, "maria_gtid_decode(body)")
      graft.cdc.MariaGtidDecode(args(0))
    },
    "maria_gtid_list" -> { args: Seq[Expression] =>
      require(args.length == 1, "maria_gtid_list(body)")
      graft.cdc.MariaGtidListDecode(args(0))
    },
    "bpe_init_word" -> { args: Seq[Expression] =>
      require(args.length == 1, "bpe_init_word(word)")
      graft.llm.BpeInitWord(args(0))
    },
    "normalize_text" -> { args: Seq[Expression] =>
      require(args.length == 1, "normalize_text(text)")
      graft.llm.NormalizeText(args(0))
    },
    "sniff_container" -> { args: Seq[Expression] =>
      require(args.length == 1, "sniff_container(content)")
      graft.multimodal.SniffContainer(args(0))
    },
    "binlog_tablemap_full" -> { args: Seq[Expression] =>
      require(args.length == 1, "binlog_tablemap_full(body)")
      graft.cdc.BinlogTableMapFullDecode(args(0))
    },
    "binlog_rows_full_meta" -> { args: Seq[Expression] =>
      require(args.length == 3, "binlog_rows_full_meta(body, event_type, tablemap)")
      graft.cdc.BinlogRowsDecodeFullMeta(args(0), args(1), args(2))
    },
    "winnow_fingerprint" -> { args: Seq[Expression] =>
      require(args.length == 3 || args.length == 4,
        "winnow_fingerprint(tokens, k, w[, robust])")
      graft.llm.WinnowFingerprint(args(0),
        intLit(args(1), "winnow_fingerprint", "k"),
        intLit(args(2), "winnow_fingerprint", "w"),
        robust = args.length == 4 && boolLit(args(3), "winnow_fingerprint", "robust"))
    },
    "binlog_xa_prepare" -> { args: Seq[Expression] =>
      require(args.length == 1, "binlog_xa_prepare(body)")
      graft.cdc.BinlogXaPrepareDecode(args(0))
    },
    "media_duration_ms" -> { args: Seq[Expression] =>
      require(args.length == 1, "media_duration_ms(content)")
      graft.multimodal.MediaDurationMs(args(0))
    },
    "deflate_ratio" -> { args: Seq[Expression] =>
      require(args.length == 1, "deflate_ratio(text)")
      graft.llm.DeflateRatio(args(0))
    },
    "audio_pcm_stats" -> { args: Seq[Expression] =>
      require(args.length == 1, "audio_pcm_stats(content)")
      graft.multimodal.AudioPcmStats(args(0))
    },
    "video_dib_stats" -> { args: Seq[Expression] =>
      require(args.length == 1, "video_dib_stats(content)")
      graft.multimodal.VideoDibStats(args(0))
    },
    "wordpiece_init" -> { args: Seq[Expression] =>
      require(args.length == 1, "wordpiece_init(word)")
      graft.llm.WordPieceInit(args(0))
    })

  /** Register every function + optimizer rule into a live session. */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (name, builder) =>
      ColumnBridge.registerFunction(spark, name, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RangeJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RangeJoinRule
    if (!spark.experimental.extraOptimizations.contains(graft.plans.LevenshteinGuardRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.LevenshteinGuardRule
  }
}
