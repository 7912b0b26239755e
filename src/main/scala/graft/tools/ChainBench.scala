package graft.tools

import graft.streaming.CurationChain
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throughput of the COMPOSED curation chain (gate → exact → MinHash →
  * semantic screens, all four stores): `runMain graft.tools.ChainBench
  * [docsPerTrigger] [nTriggers] [dupPct]` drives nTriggers batches of
  * synthetic docs — `dupPct`% of each batch re-offers / lightly edits /
  * semantically duplicates docs admitted in earlier triggers — through
  * `CurationChain.ingestInto` and prints one JSON line with end-to-end
  * docs/sec and the first/last per-trigger times (the tail shows the
  * cost of screening against a GROWN store — the number that matters
  * for a long-running ingest).
  *
  * Embeddings are deterministic hash-dense vectors: independent ids are
  * ~orthogonal (|cos| concentrates at ~1/√dim, nowhere near the 0.92
  * gate), while a semantic dup copies its source's vector exactly
  * (cos 1) — so only planted dups ever trip the semantic screen.
  */
object ChainBench {
  private val Dim = 64

  def main(args: Array[String]): Unit = {
    val perTrigger = if (args.length > 0) args(0).toInt else 2000
    val nTriggers = if (args.length > 1) args(1).toInt else 10
    val dupPct = if (args.length > 2) args(2).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files
      .createTempDirectory("graft_chainbench").toFile.getAbsolutePath + "/c"
    val nDup = perTrigger * dupPct / 100
    val nNovel = perTrigger - nDup

    // hash-dense embedding keyed on src: entries uniform in [-1, 1)
    def embOf(src: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(Dim - 1)),
        i => (pmod(xxhash64(src, i), lit(2000)).cast("float") / 1000.0f)
          - lit(1.0f))

    // 60 words over a src-namespaced vocabulary; kind 0 reproduces src's
    // text exactly, kind 1 changes one word, kind 2 is fully novel text
    def textOf(src: org.apache.spark.sql.Column,
        kind: org.apache.spark.sql.Column,
        docId: org.apache.spark.sql.Column) =
      concat_ws(" ", (0 until 60).map { j =>
        when(kind === 2, concat(lit(s"n${j}x"), docId))
          .otherwise(when(kind === 1 && lit(j) === 30,
            concat(lit("edited"), docId))
            .otherwise(concat(lit(s"w${j}x"), src)))
      }: _*)

    def batchDf(trig: Int): DataFrame = {
      val novel = spark.range(trig.toLong * perTrigger,
          trig.toLong * perTrigger + nNovel)
        .select(col("id").as("doc_id"), col("id").as("src"),
          lit(0).as("kind"))
      val all =
        if (trig == 0) novel
        else {
          // each dup targets a uniformly random EARLIER novel:
          // src = earlierTrigger * perTrigger + offsetWithinItsNovels
          val dups = spark.range(nDup.toLong)
            .select(
              (col("id") + 1000000000L + trig.toLong * 100000L).as("doc_id"),
              ((pmod(xxhash64(col("id"), lit(trig)), lit(trig)))
                * perTrigger
                + pmod(xxhash64(col("id"), lit(trig + 7)), lit(nNovel)))
                .as("src"),
              (col("id") % 3).cast("int").as("kind"))
          novel.unionByName(dups)
        }
      all.select(col("doc_id"),
        textOf(col("src"), col("kind"), col("doc_id")).as("text"),
        embOf(col("src")).as("embedding"))
    }

    val times = (0 until nTriggers).map { trig =>
      val b = batchDf(trig)
      val t0 = System.nanoTime()
      CurationChain.ingestInto(root, compactEvery = 4)(b, trig.toLong)
      (System.nanoTime() - t0) / 1e9
    }
    val total = times.sum
    // trigger 0 carries only its novels (no earlier trigger exists to
    // duplicate), so the denominator-side doc count is nNovel there, not
    // perTrigger — dividing perTrigger*nTriggers overstated docs/sec by
    // ~dupPct/nTriggers percent (r12 ADVICE)
    val docsOffered = nNovel.toLong +
      (if (nTriggers > 1) perTrigger.toLong * (nTriggers - 1) else 0L)
    val admitted = spark.read.parquet(s"$root/admitted").count()
    println(f"""{"docs_per_trigger":$perTrigger,"triggers":$nTriggers,""" +
      f""""dup_pct":$dupPct,"admitted":$admitted,"expected":${
        nNovel.toLong * nTriggers},"docs_offered":$docsOffered,""" +
      f""""docs_per_sec":${docsOffered / total}%.0f,""" +
      f""""first_trigger_s":${times.head}%.2f,"last_trigger_s":${times.last}%.2f,""" +
      f""""total_s":$total%.1f}""")
    spark.stop()
  }
}
