package graft.multimodal

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("decodeFeatures: schema, per-row features, stubbed codec boundary") {
    import spark.implicits._
    val media = Seq(
      (1L, "image", "abcdef".getBytes("UTF-8")),
      (2L, "audio", Array.empty[Byte])
    ).toDF("media_id", "modality", "content")
    val out = MediaDecode.decodeFeatures(media).orderBy("media_id").collect()
    assert(out.map(_.schema.fieldNames.toSeq).head ==
      Seq("media_id", "modality", "byte_len", "width", "height", "checksum"))
    assert(out(0).getAs[Int]("byte_len") == 6)
    assert(out(0).getAs[Long]("checksum") == "abcdef".getBytes.map(_.toLong).sum)
    assert(out(1).getAs[Int]("byte_len") == 0 && out(1).getAs[Long]("checksum") == 0L)
    assertThrows[NotImplementedError](MediaDecode.decodeReal(Array(1), "image"))
  }

  test("columnar decode equals the RDD-path decode, with no RDD scan in plan") {
    import spark.implicits._
    val media = Seq(
      (1L, "image", "abcdef".getBytes("UTF-8")),
      (2L, "audio", Array.empty[Byte]),
      (3L, "video", Array.tabulate(200)(i => (i * 7 % 256).toByte))
    ).toDF("media_id", "modality", "content")
    val viaRdd = MediaDecode.decodeFeatures(media).orderBy("media_id")
      .collect().map(_.toSeq).toSeq
    val columnar = MediaDecode.decodeFeaturesColumnar(media).orderBy("media_id")
      .collect().map(_.toSeq).toSeq
    assert(columnar == viaRdd)
    val plan = MediaDecode.decodeFeaturesColumnar(media)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD") && !plan.contains("Scan ExistingRDD"), plan)
  }

  test("resizeStub: stride downsample, length math, determinism") {
    val bytes = (0 until 100).map(_.toByte).toArray
    val r = MediaDecode.resizeStub(bytes, 4)
    assert(r.length == 25)
    assert(r(0) == 0.toByte && r(1) == 4.toByte && r(24) == 96.toByte)
    assert(MediaDecode.resizeStub(bytes, 4).toSeq == r.toSeq)
    assert(MediaDecode.resizeStub(Array.empty[Byte], 3).isEmpty)
  }

  test("q50/q51 run over fixture-backed media at sf0.001") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    assert(docs.count() > 0)
    val q50 = graft.SparkEntry.queries("q50_media_decode")(spark, "/root/testdata/sf0.001")
    assert(q50.filter(col("checksum") <= 0).count() == 0)
  }
}
