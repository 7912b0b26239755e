package graft.tools

import graft.cdc.{BinlogRowCodec, BinlogSchema, MysqlProtocolCodec, MysqlReplicaSession}
import graft.streaming.{ByteChunk, CdcCorpusChain}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** End-to-end throughput of the CDC→corpus CAPSTONE
  * ([[CdcCorpusChain]]): binlog BYTES (session bring-up + WriteV2 row
  * events over a documents table) → packet reassembly → replica session
  * fold → row decode → the full curation admission body, per trigger.
  * `runMain graft.tools.CapstoneBench [docsPerTrigger] [nTriggers]
  * [rowsPerEvent]` prints one JSON line with docs/sec over the whole
  * chain plus the first/last trigger times. Docs are all-novel (the
  * screen-cost-under-dups curve is ChainBench's job; this measures the
  * composed wire+curation cost), so `admitted == offered` doubles as the
  * correctness check. Numbers land in PERFORMANCE.md.
  */
object CapstoneBench {

  private def hx(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def lenencStr(s: String): Array[Byte] =
    s.length.toByte +: s.getBytes("UTF-8")

  /** HandshakeV10 fixture (classic protocol, mysql_native_password) —
    * the same wire shape the spec suites drive.
    */
  private def handshakeV10(seed: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(10); out.write("8.0.42-log".getBytes); out.write(0)
    out.write(Array[Byte](0x39, 0x30, 0, 0))
    out.write(seed, 0, 8); out.write(0)
    out.write(0xff); out.write(0xf7)
    out.write(0xff); out.write(Array[Byte](2, 0))
    out.write(0x08); out.write(0x00)
    out.write(21)
    for (_ <- 0 until 10) out.write(0)
    out.write(seed, 8, 12); out.write(0)
    out.write("mysql_native_password".getBytes); out.write(0)
    out.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val perTrigger = if (args.length > 0) args(0).toInt else 2000
    val nTriggers = if (args.length > 1) args(1).toInt else 5
    val rowsPerEvent = if (args.length > 2) args(2).toInt else 50
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val columns = Seq("doc_id" -> "bigint", "text" -> "varchar(2048)")
    val schema = BinlogSchema.fromMysqlTypes(columns)
    def doc(id: Long): String =
      (0 until 60).map(j => s"w${id}x$j").mkString(" ")

    val seed = (1 to 20).map(_.toByte).toArray
    val ok = hx("00" + "00" + "00" + "0200" + "0000")
    val eof = hx("fe" + "0000" + "0200")
    val bringup: Seq[Array[Byte]] = Seq(
      handshakeV10(seed),
      (0xfe.toByte +: ("mysql_native_password".getBytes :+ 0.toByte)) ++ seed :+ 0.toByte,
      ok, ok, Array(2.toByte), hx("deadbeef"), hx("deadbeef"), eof,
      lenencStr("bin.000001") ++ lenencStr("4"), eof)

    var pktSeq = 0
    var chunkOrd = 0L
    var wireBytes = 0L
    val trancheChunks: Seq[Seq[ByteChunk]] = (0 until nTriggers).map { trig =>
      val ids = (trig.toLong * perTrigger) until (trig.toLong * perTrigger + perTrigger)
      val evs = ids.grouped(rowsPerEvent).map { group =>
        0.toByte +: BinlogRowCodec.encodeEvent(BinlogRowCodec.WriteV2,
          BinlogRowCodec.encodeRows(BinlogRowCodec.WriteV2, schema,
            group.map(id => Seq[Any](id, doc(id)))))
      }.toSeq
      val payloads = if (trig == 0) bringup ++ evs else evs
      val bytes = payloads.toArray.flatMap { p =>
        val out = MysqlProtocolCodec.writePacket(pktSeq % 256, p)
        pktSeq += 1; out
      }
      wireBytes += bytes.length
      bytes.grouped(1400).map { bs =>
        val c = ByteChunk(1L, chunkOrd, bs); chunkOrd += 1; c
      }.toSeq
    }

    val base = java.nio.file.Files
      .createTempDirectory("graft_capstone_bench").toFile.getAbsolutePath
    val in = MemoryStream[ByteChunk]
    val q = CdcCorpusChain.start(in.toDS(),
      MysqlReplicaSession.Config("repl", "secret", serverId = 100L),
      columns, s"$base/root", s"$base/ckpt", compactEvery = 4)
    val times =
      try {
        trancheChunks.map { chunks =>
          val t0 = System.nanoTime()
          in.addData(chunks); q.processAllAvailable()
          (System.nanoTime() - t0) / 1e9
        }
      } finally q.stop()
    val total = times.sum
    val offered = perTrigger.toLong * nTriggers
    val admitted = spark.read.parquet(s"$base/root/admitted").count()
    println(f"""{"docs_per_trigger":$perTrigger,"triggers":$nTriggers,""" +
      f""""rows_per_event":$rowsPerEvent,"wire_mb":${wireBytes / 1e6}%.1f,""" +
      f""""admitted":$admitted,"offered":$offered,""" +
      f""""docs_per_sec":${offered / total}%.0f,""" +
      f""""first_trigger_s":${times.head}%.2f,"last_trigger_s":${times.last}%.2f,""" +
      f""""total_s":$total%.1f}""")
    spark.stop()
  }
}
