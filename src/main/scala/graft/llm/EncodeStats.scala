package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Distinct-word tokenizer-inference statistics — the ONE shape shared by
  * the three corpus-wide encode queries (BPE q154, unigram q202, WordPiece
  * q212). The per-word encode kernel is the expensive per-row work and a
  * Zipf corpus repeats its words constantly, so encoding every OCCURRENCE
  * re-pays the kernel ~word-frequency times; encoding each DISTINCT word
  * once and joining the (word → stats) map back through the doc word list
  * collapses the per-occurrence work to a join + sum (guide §2.3:
  * aggregate/project before the heavy work; the kernel cost becomes
  * vocab-scale by Heaps' law). Output is identical to the per-occurrence
  * `transform` form because every kernel is a pure function of the word —
  * BpeSpec/UnigramSpec/WordPieceSpec each gate that equivalence.
  */
private[llm] object EncodeStats {

  /** Per-doc encode stats over `words` (an array<string> Column):
    * (idCol, n_words, n_tokens, n_unk, first_toks). `n_unk` counts words
    * whose whole-word encoding is exactly [unkToken] (WordPiece's [UNK]
    * rule); pass None to skip it (column emitted as null long). NULL-text
    * docs survive with null stats — identical row set to the
    * per-occurrence form, which keeps them with null aggregates.
    */
  def over(docs: DataFrame, idCol: String, words: Column,
      encode: Column => Column, unkToken: Option[String]): DataFrame = {
    val rows = docs.select(col(idCol), posexplode(words).as(Seq("pos", "w")))
    val vocab = rows.select("w").distinct()
      .select(col("w"), encode(col("w")).as("toks"))
      .select(col("w"), size(col("toks")).cast(LongType).as("ntok"),
        col("toks"))
    val unkAgg = unkToken match {
      case Some(u) => sum(when(col("toks") === array(lit(u)), 1L).otherwise(0L))
      case None => first(lit(null).cast(LongType))
    }
    val stats = rows.join(vocab, Seq("w"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum(col("ntok")).as("n_tokens"),
        unkAgg.as("n_unk"),
        // exactly one row per doc carries pos = 0, so `first` over the
        // non-null projection is deterministic despite the shuffle
        first(when(col("pos") === 0, col("toks")), ignoreNulls = true)
          .as("first_toks"))
    // rebase on the full doc set: a NULL-text doc explodes to zero word
    // rows and would vanish from the aggregate — the per-occurrence
    // form keeps it (with null stats), and "identical output" means
    // identical row sets, not just matched rows
    docs.select(col(idCol)).join(stats, Seq(idCol), "left")
      .withColumn("tokens_per_word",
        col("n_tokens").cast(DoubleType) / col("n_words").cast(DoubleType))
  }
}
