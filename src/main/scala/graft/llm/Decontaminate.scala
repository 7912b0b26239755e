package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * k-shingles with a held-out evaluation set — the overlap check every
  * training-data pipeline runs before a corpus ships (the reference has no
  * analog; this is part of the LLM-pipeline surface the engine adds).
  *
  * Scale posture: the benchmark side collapses to its DISTINCT shingle set
  * before the join, so each training shingle meets at most one row — the
  * join output is bounded by the training shingle stream and no hot shingle
  * can fan out (a shingle appearing in 10k benchmark docs is still ONE join
  * row). Benchmark sets are small relative to the corpus (eval suites, not
  * training data), so at 100 TB the distinct-shingle side broadcasts and
  * the whole check is a map-side semi-join over one corpus scan; when it
  * does not fit, the same plan runs as a hash-shuffle join on the shingle.
  */
object Decontaminate {

  /** Per-training-doc overlap counts against the benchmark shingle set:
    * (doc_id, n_overlap, n_shingles) for every training doc sharing at
    * least one distinct k-shingle with any benchmark doc.
    */
  def overlap(train: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, k: Int = 5): DataFrame = {
    // One shingle pass over the corpus: the per-doc size rides the
    // exploded rows as a grouping column instead of a second scan.
    val trainSh = Dedup.shingleArrays(train, textCol, idCol, k)
      .select(col("sid"), size(col("arr")).as("n_shingles"),
        explode(col("arr")).as("s"))
    val benchSh = Dedup.shingleSet(benchmark, textCol, idCol, k)
      .select("s").distinct()
    trainSh.join(benchSh, "s")
      .groupBy("sid", "n_shingles")
      .agg(count(lit(1)).as("n_overlap")) // shingle arrays are distinct per doc
      .select(col("sid").as(idCol), col("n_overlap"), col("n_shingles"))
  }
}
