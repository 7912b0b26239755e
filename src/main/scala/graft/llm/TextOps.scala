package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines, all as codegen'd
  * column expressions (no UDFs): tokenization, shingling, stopword/quality
  * stats, a language-ID heuristic, and content fingerprinting.
  *
  * Everything here is per-row (narrow, map-side) — at 100 TB these fuse into
  * whole-stage codegen over the scan with zero shuffle; only downstream
  * aggregations shuffle.
  */
object TextOps {

  /** Whitespace tokens; -1 limit keeps trailing empties so Spark and SQL
    * oracles (DuckDB string_split) agree on token counts.
    */
  def tokens(c: Column): Column = split(c, " ", -1)

  /** Distinct word k-shingles in first-occurrence order, via the
    * codegen'd [[WordShingles]] kernel (short texts yield an empty set).
    * Semantically `array_distinct(transform(sequence, i -> concat_ws(" ",
    * slice(toks, i, k))))` — but that HOF chain is interpreted per element
    * and measured ~10x slower at corpus scale.
    */
  def shingles(text: Column, k: Int = 3): Column = WordShingles(tokens(text), k)

  /** English-ish stopword list used by quality scoring and lang-ID. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "to", "in", "and", "is", "for", "on", "with")

  /** Count of tokens that are stopwords (integer-exact for oracle parity). */
  def stopwordHits(toks: Column): Column = {
    val sw = array(Stopwords.map(lit): _*)
    size(filter(toks, t => array_contains(sw, t)))
  }

  /** BPE-ish token estimate: runs of letters, digits, or single symbols. */
  def regexTokenCount(text: Column): Column =
    size(filter(split(text, "[^a-zA-Z0-9]+", -1), t => t =!= ""))

  /** Deterministic document fingerprint over normalized text. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Duplicate-bigram fraction: 1 - distinct/total bigrams (0 for <2
    * tokens). Integer-derived, so the double is engine-identical.
    */
  def dupBigramFrac(text: Column): Column = {
    val n = org.apache.spark.sql.functions.size(tokens(text))
    when(n > 1, lit(1.0) - org.apache.spark.sql.functions.size(shingles(text, 2))
      .cast(org.apache.spark.sql.types.DoubleType)
      / (n - 1).cast(org.apache.spark.sql.types.DoubleType)).otherwise(0.0)
  }

  /** Top-token fraction: max single-token count / token count. */
  def topTokenFrac(text: Column): Column = {
    val toks = tokens(text)
    TokenTopCount(toks).cast(org.apache.spark.sql.types.DoubleType) /
      org.apache.spark.sql.functions.size(toks)
        .cast(org.apache.spark.sql.types.DoubleType)
  }

  /** The Gopher-style repetition gate shared by q91 and the q106 curation
    * capstone — ONE definition so the thresholds cannot drift apart.
    */
  def repetitionGate(text: Column, maxDup2: Double = 0.04,
      maxTopFrac: Double = 0.1): Column =
    dupBigramFrac(text) <= maxDup2 && topTokenFrac(text) <= maxTopFrac
}
