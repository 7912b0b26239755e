package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the scrubbing kernels over seeded adversarial inputs:
  * redaction leaves no residual matches and is idempotent; URL
  * canonicalization is idempotent and collapses exactly the equivalence
  * classes it claims (case/www/port/utm/slash/fragment variants of one
  * URL all land on one canonical form).
  */
class RedactSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)

  test("PII redaction: no residual matches, idempotent, non-PII text untouched") {
    def word() = (0 until 1 + rnd.nextInt(8)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val texts = (0 until 200).map { i =>
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      parts += word()
      if (i % 3 == 0) parts += s"${word()}.${word()}@${word()}.com"
      if (i % 4 == 0) parts += f"${rnd.nextInt(90) + 10}%02d-${rnd.nextInt(900) + 100}%03d-${rnd.nextInt(900) + 100}%03d-${rnd.nextInt(9000) + 1000}%04d"
      if (i % 5 == 0) parts += s"${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}"
      parts += word()
      parts.mkString(" ")
    } ++ Seq("", "no pii here at all", "a@b.cd", "1.2.3.4", "12-345-678-9012",
      "edge a@b.cd. trailing", "10.0.0.1:443", "double  space 1.2.3.4 x")
    val df = texts.toDF("t")
    val once = df.select(col("t"), Redact.redactPii(col("t")).as("r"))
    // 1) no residual pattern survives redaction
    val residual = once.filter(
      Redact.countPat(col("r"), Redact.EmailPat) > 0 ||
        Redact.countPat(col("r"), Redact.PhonePat) > 0 ||
        Redact.countPat(col("r"), Redact.Ipv4Pat) > 0)
    assert(residual.count() == 0, residual.collect().mkString("\n"))
    // 2) idempotent
    val notIdem = once.filter(Redact.redactPii(col("r")) =!= col("r"))
    assert(notIdem.count() == 0, notIdem.collect().mkString("\n"))
    // 3) rows with no PII pass through byte-identical
    val clean = df.filter(
      Redact.countPat(col("t"), Redact.EmailPat) === 0 &&
        Redact.countPat(col("t"), Redact.PhonePat) === 0 &&
        Redact.countPat(col("t"), Redact.Ipv4Pat) === 0)
    assert(clean.filter(Redact.redactPii(col("t")) =!= col("t")).count() == 0)
  }

  test("URL canonicalization: idempotent, and all variants of one URL collapse") {
    val variants = Seq(
      "https://shop-1.example.com/item/7",
      "HTTPS://SHOP-1.Example.COM/item/7",
      "https://www.shop-1.example.com/item/7",
      "https://shop-1.example.com:443/item/7",
      "https://shop-1.example.com/item/7/",
      "https://shop-1.example.com/item/7#frag",
      "https://www.shop-1.example.com:443/item/7/#x",
      "https://shop-1.example.com/item/7?utm_source=a",
      "https://shop-1.example.com/item/7?utm_campaign=b#y")
    val out = variants.toDF("u")
      .select(Redact.canonicalUrl(col("u")).as("c")).distinct().collect()
    assert(out.length == 1, out.mkString(", "))
    assert(out.head.getString(0) == "https://shop-1.example.com/item/7")
    // distinct queries stay distinct
    val keep = Seq(
      "https://shop-1.example.com/item/7?id=3",
      "https://shop-1.example.com/item/7?id=4",
      "https://shop-2.example.com/item/7",
      "http://shop-1.example.com/item/7",     // http != https
      "https://shop-1.example.com:8443/item/7") // non-default port kept
      .toDF("u").select(Redact.canonicalUrl(col("u")).as("c")).distinct().count()
    assert(keep == 5)
    // idempotence over a seeded messy corpus
    def seg() = (0 until 1 + rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val urls = (0 until 200).map { i =>
      val scheme = if (i % 2 == 0) "https" else "HTTPS"
      val www = if (i % 3 == 0) "www." else ""
      val port = if (i % 5 == 0) ":443" else if (i % 7 == 0) ":8080" else ""
      val q = if (i % 4 == 0) s"?id=${i % 9}&utm_x=$i" else if (i % 4 == 1) "?utm_only=1" else ""
      val frag = if (i % 6 == 0) "#sec" else ""
      s"$scheme://$www${seg()}.${seg()}.com$port/${seg()}/${seg()}$q$frag"
    }
    val bad = urls.toDF("u").select(Redact.canonicalUrl(col("u")).as("c"))
      .filter(Redact.canonicalUrl(col("c")) =!= col("c"))
    assert(bad.count() == 0, bad.collect().take(5).mkString("\n"))
  }
}
