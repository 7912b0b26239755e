package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for LLM training batches: lay documents end-to-end and
  * cut the token stream every `cap` tokens ("concat-then-chunk", the
  * GPT-style packing where a document may straddle two consecutive packs).
  *
  * Deliberately NOT first-fit bin packing: greedy first-fit needs a serial
  * scan (each decision depends on all prior bins), which cannot be
  * expressed as a distributed plan without giving up determinism or
  * parallelism. Concat-then-chunk is what large training pipelines
  * actually run, and it is a pure window computation.
  *
  * Scale shape: documents are sharded by a pure function of the id, and
  * ALL work is per-shard (one hash shuffle, then a per-partition sort —
  * no global sort, no driver state). Shards are independent, so 1000
  * executors pack 1000 shards concurrently; `shards` just needs to exceed
  * the cluster's useful parallelism.
  */
object Packing {

  /** Whitespace token count, matching DuckDB `len(string_split(text, ' '))`
    * (empty fragments count, as in the shingle pipeline). */
  def tokenCount(text: Column): Column = size(split(text, " ")).cast(LongType)

  /** Assign each document a pack id and its token offset within the pack.
    *
    * @param cap    tokens per pack (context length)
    * @param shards independent packing streams; pack ids are unique across
    *               shards as `shard * 1_000_000 + chunk` (a shard packing
    *               more than 10^12 tokens at cap>=1 would need a wider
    *               stride — require()d below rather than silently colliding)
    * @return input columns plus (shard, n_tokens, pack_id, pack_offset)
    */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      cap: Int,
      shards: Int): DataFrame = {
    require(cap > 0 && shards > 0, "cap and shards must be positive")
    val shard = pmod(col(idCol), lit(shards.toLong)).as("shard")
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withCum = docs
      .select(col("*"), shard, tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
    val chunk = (col("cum_before") / cap).cast(LongType)
    withCum
      .withColumn("pack_id", col("shard") * 1000000L + chunk)
      .withColumn("pack_offset", col("cum_before") % cap)
      .drop("cum_before")
  }

  /** First-fit-decreasing BIN packing — the SAMPLE-PRESERVING packing
    * beside [[packSequences]]'s concat-then-chunk: a document is never
    * split; docs place in (n_tokens desc, id) order, each into the first
    * bin (by index) that still fits it, bins opened on demand — the FFD
    * ordering with the classic 11/9·OPT + 1 bin guarantee. Placement
    * decisions are inherently serial (the header note above), so the
    * fold runs PER SHARD of the id hash: shards are independent and
    * deterministic, the per-task state is (id, n_tokens) pairs only —
    * never text — and `shards` dials per-task memory and latency at any
    * corpus size. Docs longer than the cap emit with bin = −1
    * (rejected), never silently truncated.
    *
    * @return (doc_id, n_tokens, shard, bin, bin_fill) — bin_fill is the
    *         bin's token total AFTER this placement.
    */
  def packBinsFfd(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      cap: Long,
      shards: Int): DataFrame = {
    require(cap > 0 && shards > 0, "cap and shards must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast(LongType).as("id"),
        tokenCount(col(textCol)).as("n"),
        pmod(xxhash64(col(idCol)), lit(shards.toLong)).as("shard"))
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroups { (shard, it) =>
        val ds = it.toArray.sortBy { case (id, n, _) => (-n, id) }
        // Linear first-fit scan: O(docs·bins) per shard — fine while
        // shards keep per-task doc counts bounded; a fenwick-over-capacity
        // index is the drop-in upgrade if a shard ever packs millions.
        val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
        ds.iterator.map { case (id, n, _) =>
          if (n > cap) (id, n, shard, -1L, n)
          else {
            var b = 0
            while (b < rem.length && rem(b) < n) b += 1
            if (b == rem.length) rem += cap
            rem(b) -= n
            (id, n, shard, b.toLong, cap - rem(b))
          }
        }
      }
      .toDF("doc_id", "n_tokens", "shard", "bin", "bin_fill")
  }
}
