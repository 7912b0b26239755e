package graft.llm

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Deduplication operators for document corpora (SURVEY.md §2B LLM rows):
  * exact (content hash), n-gram Jaccard similarity join (exact, the oracle
  * for the approximate paths), MinHash + banded LSH, and SimHash.
  *
  * Scale posture: exact dedup and MinHash/SimHash signatures are one hash
  * aggregation each (map-side partial, single shuffle). The all-pairs
  * Jaccard join is quadratic in the worst case and exists as the
  * small-scale oracle; the 100 TB path is MinHash-LSH (band buckets bound
  * the candidate set) or SimHash block buckets.
  */
object Dedup {

  /** Exact dedup groups: sha256 of raw text → group size + canonical id. */
  def exactGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("canonical_id"))

  /** Exploded distinct shingles per doc: (id, shingle). */
  def shingleSet(docs: DataFrame, textCol: String, idCol: String, k: Int = 3): DataFrame =
    docs.select(col(idCol).as("sid"), explode(TextOps.shingles(col(textCol), k)).as("s"))

  /** Per-doc distinct shingle arrays: (sid, arr), shingle-less docs dropped. */
  def shingleArrays(docs: DataFrame, textCol: String, idCol: String, k: Int = 3): DataFrame =
    docs.select(col(idCol).as("sid"), TextOps.shingles(col(textCol), k).as("arr"))
      .filter(size(col("arr")) > 0)

  /** Exact-Jaccard verification of (da, db) candidate pairs against per-doc
    * shingle arrays: one |candidates|-bounded join per side, intersection
    * via codegen'd `array_intersect`, threshold decided in integer
    * arithmetic (den*inter >= num*(na+nb-inter)) so results hash-match a
    * SQL oracle exactly.
    */
  private def verifyJaccard(cand: DataFrame, arrays: DataFrame,
      num: Int, den: Int): DataFrame =
    cand
      .join(arrays.select(col("sid").as("da"), col("arr").as("arra")), "da")
      .join(arrays.select(col("sid").as("db"), col("arr").as("arrb")), "db")
      .select(col("da"), col("db"),
        size(array_intersect(col("arra"), col("arrb"))).as("inter"),
        size(col("arra")).as("na"), size(col("arrb")).as("nb"))
      .filter(col("inter") * den >= (col("na") + col("nb") - col("inter")) * num)
      .select("da", "db", "inter", "na", "nb")

  /** Prefix rows (sid, nsh, s [, passthrough...]) — the shared candidate
    * generator for [[jaccardPairs]] (self-join) and
    * [[jaccardPairsAgainst]] (new-vs-corpus join), via **prefix
    * filtering** (AllPairs/PPJoin): under a global shingle order
    * (document frequency ascending, then shingle), a doc's prefix is its
    * first `n - ceil(t*n) + 1` shingles; any pair with J >= t shares its
    * globally-minimum common shingle inside BOTH prefixes, so joining
    * prefixes only is lossless. This both shrinks the candidate join
    * ~(1-t)² and is inherently skew-resistant: high-frequency shingles
    * order last and fall out of prefixes, so a hot shingle never feeds a
    * quadratic reducer (the df-cap effect without a semantic cap).
    * Exactness means the plain shared-shingle SQL oracle is unchanged.
    * The theorem is side-agnostic — it only needs both endpoints'
    * prefixes taken under the SAME global order, which is why the cross
    * variant computes document frequency over the union.
    */
  private def prefixRows(arrays: DataFrame, num: Int, den: Int,
      passthrough: Seq[String]): DataFrame = {
    val keep = (Seq("sid") ++ passthrough).map(col) :+
      size(col("arr")).as("nsh") :+ explode(col("arr")).as("s")
    val sh = arrays.select(keep: _*)
    val dfc = sh.groupBy("s").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("sid").orderBy(col("df"), col("s"))
    sh.join(dfc, "s")
      .withColumn("r", row_number().over(w))
      .filter(col("r") <=
        col("nsh") - floor((col("nsh") * num + (den - 1)) / den) + 1)
  }

  /** Directed CONTAINMENT pairs C(a→b) = |A∩B| / |A| ≥ num/den via a
    * ONE-SIDED prefix filter: C ≥ t means |A∩B| ≥ ⌈t·n_a⌉, so if none of
    * a's first n_a − ⌈t·n_a⌉ + 1 globally-ordered shingles is in B, then
    * A∩B fits inside the remaining ⌈t·n_a⌉ − 1 — contradiction. Only the
    * CONTAINED side prunes (containment ignores |B|, so no length filter
    * and no container-side prefix exists); the filter is LOSSLESS, so the
    * output is exactly the plain shared-shingle formulation's (q234's
    * oracle is reused verbatim by q235). Returns directed
    * (da, db, common, na, containment_ppm).
    */
  def containmentPairs(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 3, num: Int = 4, den: Int = 5): DataFrame = {
    val arrays = shingleArrays(docs, textCol, idCol, k)
    val prefix = prefixRows(arrays, num, den, Nil)
    val full = arrays.select(col("sid"), explode(col("arr")).as("s"))
    val cand = prefix.as("a").join(full.as("b"),
        col("a.s") === col("b.s") && col("a.sid") =!= col("b.sid"))
      .select(col("a.sid").as("da"), col("b.sid").as("db"))
      .distinct()
    cand
      .join(arrays.select(col("sid").as("da"), col("arr").as("arra")), "da")
      .join(arrays.select(col("sid").as("db"), col("arr").as("arrb")), "db")
      .select(col("da"), col("db"),
        size(array_intersect(col("arra"), col("arrb")))
          .cast(org.apache.spark.sql.types.LongType).as("common"),
        size(col("arra")).cast(org.apache.spark.sql.types.LongType).as("na"))
      .filter(col("common") * den >= col("na") * num)
      .select(col("da"), col("db"), col("common"), col("na"),
        expr("(common * CAST(1000000 AS BIGINT)) DIV na").as("containment_ppm"))
  }

  /** Exact n-gram Jaccard self-join via the shared prefix filter, with the
    * AllPairs length filter in the join condition: J >= t implies
    * den*min(na,nb) >= num*max, so a size-mismatched pair can never reach
    * the threshold and pruning it is lossless.
    */
  def jaccardPairs(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 3, num: Int = 7, den: Int = 10): DataFrame = {
    val arrays = shingleArrays(docs, textCol, idCol, k)
    val prefix = prefixRows(arrays, num, den, Nil)
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.sid") < col("b.sid") &&
          col("a.nsh") * num <= col("b.nsh") * den &&
          col("b.nsh") * num <= col("a.nsh") * den)
      .select(col("a.sid").as("da"), col("b.sid").as("db"))
      .distinct()
    verifyJaccard(cand, arrays, num, den)
  }

  /** Incremental dedup join: exact Jaccard pairs BETWEEN a new batch and
    * an existing corpus (never corpus-vs-corpus — that work was already
    * done when the corpus was built). This is the production dedup mode at
    * 100 TB: each ingest batch joins against the standing corpus, and only
    * batch-sized work is added. Ids must be globally unique across both
    * sides (standard for a document store).
    *
    * Same lossless prefix filter as [[jaccardPairs]], with document
    * frequency computed over the union so both sides share one global
    * shingle order; candidates only pair new×corpus, so a batch B against
    * corpus C costs the prefix join's |B|-bounded candidates, not
    * |B ∪ C|². Returns (new_id, corpus_id, inter, na, nb).
    */
  def jaccardPairsAgainst(newDocs: DataFrame, corpus: DataFrame,
      textCol: String, idCol: String,
      k: Int = 3, num: Int = 7, den: Int = 10): DataFrame = {
    val arrays = shingleArrays(newDocs, textCol, idCol, k)
      .withColumn("side", lit("n"))
      .unionByName(shingleArrays(corpus, textCol, idCol, k)
        .withColumn("side", lit("c")))
    val prefix = prefixRows(arrays, num, den, Seq("side"))
    val cand = prefix.filter(col("side") === "n").as("a")
      .join(prefix.filter(col("side") === "c").as("b"),
        col("a.s") === col("b.s") &&
          col("a.nsh") * num <= col("b.nsh") * den &&
          col("b.nsh") * num <= col("a.nsh") * den)
      .select(col("a.sid").as("da"), col("b.sid").as("db"))
      .distinct()
    verifyJaccard(cand, arrays.drop("side"), num, den)
      .withColumnRenamed("da", "new_id")
      .withColumnRenamed("db", "corpus_id")
  }

  /** 2^31-1, the classic MinHash modulus: keeps a*x+b inside Long range. */
  private val P = 2147483647L
  /** Deterministic (a, b) permutation parameters, seed fixed for replay. */
  private def perms(k: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(k)((rnd.nextInt(Int.MaxValue - 1).toLong + 1, rnd.nextInt(Int.MaxValue).toLong))
  }

  /** MinHash signatures: k universal-hash minima per doc over its shingle
    * set. One hash aggregation (k partial mins, map-side combined).
    */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String, k: Int = 32): DataFrame = {
    val sh = shingleSet(docs, textCol, idCol)
    val x = pmod(xxhash64(col("s")), lit(P))
    val mins = perms(k).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(x * a + b, lit(P))).as(s"m$i")
    }
    sh.groupBy("sid").agg(mins.head, mins.tail: _*)
  }

  /** Banded-LSH candidate pairs from MinHash signatures: docs sharing any
    * band bucket. bands*rows must equal the signature width.
    *
    * `maxBucket` caps the self-join's per-bucket fan-out: a degenerate
    * bucket (boilerplate-heavy corpora hash thousands of docs into one
    * band value) would contribute |bucket|² pairs on one reducer; buckets
    * above the cap are dropped entirely — standard LSH practice, sound
    * because a bucket that large signals non-discriminative bands, and
    * near-dup recall comes from the *other* bands' buckets. Recall under
    * the default cap is what LshSpec measures.
    */
  /** The recall-critical MinHash band layout — ONE definition (r12
    * verdict item: the r11 image-band lesson applied to text): band `b`
    * is `xxhash64` over minima `[b·rows, (b+1)·rows)`, with `minimaAt(i)`
    * supplying the i-th minimum — wide `m0..m{k-1}` columns for the batch
    * path ([[lshCandidates]]) and `element_at(sig, i+1)` for the
    * streaming store's array form
    * ([[graft.streaming.TextDedupStream]]). Batch dedup and streaming
    * admission screen the SAME corpus, so a layout divergence would
    * silently zero cross-path recall; routing both through this helper
    * makes divergence unrepresentable.
    */
  private[graft] def bandStructs(minimaAt: Int => Column, bands: Int,
      rows: Int): Seq[Column] =
    (0 until bands).map { bIdx =>
      val rowsCols = (0 until rows).map(r => minimaAt(bIdx * rows + r))
      struct(lit(bIdx).as("band"), xxhash64(rowsCols: _*).as("bh"))
    }

  def lshCandidates(sig: DataFrame, bands: Int, rows: Int,
      maxBucket: Int = 10000): DataFrame = {
    val bandCols = bandStructs(i => col(s"m$i"), bands, rows)
    val buckets = sig.select(col("sid"), explode(array(bandCols: _*)).as("bk"))
      .select(col("sid"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    // Bucket-size cap via a window count, not a join against a re-aggregated
    // copy: one pass over the bucket rows (the signature pipeline is not
    // re-executed for a size side), same single (band,bh) shuffle.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")
    val sized = buckets.withColumn("bsz", count(lit(1)).over(w))
      .filter(col("bsz") <= maxBucket).drop("bsz")
    sized.as("a").join(sized.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.sid") < col("b.sid"))
      .select(col("a.sid").as("da"), col("b.sid").as("db"))
      .distinct()
  }

  /** MinHash-LSH near-dup pairs, verified with exact Jaccard on the (small)
    * candidate set. The verification join is |candidates|-bounded — this is
    * the 100 TB dedup path.
    */
  def minhashPairs(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 32, bands: Int = 8, num: Int = 7, den: Int = 10): DataFrame = {
    require(k % bands == 0,
      s"bands ($bands) must divide the signature width ($k) — a remainder would silently drop trailing hashes")
    val rows = k / bands
    val cand = lshCandidates(minhashSignatures(docs, textCol, idCol, k), bands, rows)
    verifyJaccard(cand, shingleArrays(docs, textCol, idCol), num, den)
  }

  /** SimHash over distinct word 3-shingles, via the codegen'd [[SimHash64]]
    * kernel (an imperative loop is mandatory here: a declarative 64-sum
    * HashAggregate falls out of codegen and HOF lambdas are interpreted —
    * measured ~10x slower; as an expression the kernel also avoids UDF
    * boxing). Shingles, not unigrams: on a small shared vocabulary every
    * document contains nearly every word, so unigram token *sets* (and
    * their simhashes) collapse together; shingle sets keep unrelated
    * documents far apart while near-dups still overlap. No shuffle at all.
    */
  def simhash(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("sid"),
      SimHash64(TextOps.shingles(col(textCol))).as("simhash"))

  /** SimHash near-dup pairs: block-bucket candidates (8×8-bit blocks — any
    * pair at Hamming distance <= 7 shares a block by pigeonhole, so recall
    * is exact up to the default threshold 7; beyond 7 a pair could spread
    * one flip into every block and be missed), then exact Hamming verify
    * via bit_count(xor), filtered before dedup so the bucket-join blowup
    * never reaches a shuffle.
    *
    * `maxBucket` caps per-bucket fan-out exactly like [[lshCandidates]]:
    * a degenerate block value (boilerplate corpus where one 8-bit block is
    * constant) would do |bucket|² comparisons on one reducer's compute.
    * Over-cap buckets are dropped; a pair whose every shared block is
    * over-cap can be missed, so the ≤7-Hamming recall guarantee becomes
    * "exact unless 8 blocks are simultaneously degenerate" — in that regime
    * the bucket carries no discriminative signal anyway.
    */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 7, maxBucket: Int = 10000): DataFrame = {
    val sig = simhash(docs, textCol, idCol)
    val blocks = (0 until 8).map(i =>
      struct(lit(i).as("blk"), shiftright(col("simhash"), i * 8).bitwiseAND(0xFFL).as("bv")))
    val all = sig.select(col("sid"), col("simhash"), explode(array(blocks: _*)).as("bk"))
      .select(col("sid"), col("simhash"), col("bk.blk").as("blk"), col("bk.bv").as("bv"))
    // Window count, not join-with-agg: see lshCandidates — the simhash
    // pipeline runs once per join side instead of twice.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("blk", "bv")
    val buckets = all.withColumn("bsz", count(lit(1)).over(w))
      .filter(col("bsz") <= maxBucket).drop("bsz")
    buckets.as("a").join(buckets.as("b"),
        col("a.blk") === col("b.blk") && col("a.bv") === col("b.bv") &&
          col("a.sid") < col("b.sid"))
      .select(col("a.sid").as("da"), col("b.sid").as("db"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      // Hamming-filter BEFORE distinct: correlated-vocabulary corpora make
      // block buckets collide heavily (millions of candidate rows at sf0.1);
      // bit_count is a cheap codegen'd op, so cut first, dedup the survivors.
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Span-level duplication coverage (the substring-dedup signal, à la
    * exact-substring dedup at token granularity): per doc, how many of its
    * k-gram spans — ALL positions, not distinct — also occur in at least
    * one OTHER document. High `shared_frac` with a non-duplicate hash
    * means boilerplate-heavy content: the case doc-level dedup misses.
    *
    * Scale shape: one agg over the span stream finds shared spans (a
    * distinct-doc count per span; partial aggregation absorbs hot spans),
    * then one hash join back — the probe side is the span stream, the
    * build side one row per shared span, so no hot span fans out.
    */
  def spanSharedStats(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 8): DataFrame = {
    val spans = docs.select(col(idCol).as("sid"),
        explode(WordSpans(TextOps.tokens(col(textCol)), k)).as("span"))
    val shared = spans.groupBy("span")
      .agg(countDistinct(col("sid")).as("ndocs"))
      .filter(col("ndocs") > 1)
      .select(col("span"), lit(1).as("hit"))
    spans.join(shared, Seq("span"), "left")
      .groupBy(col("sid").as(idCol))
      .agg(count(lit(1)).as("n_spans"), count(col("hit")).as("n_shared"))
      .withColumn("shared_frac",
        col("n_shared").cast(org.apache.spark.sql.types.DoubleType) /
          col("n_spans").cast(org.apache.spark.sql.types.DoubleType))
  }

  /** Near-dup SIGNAL-AGREEMENT matrix (the q189 audit): the three
    * exactly-computable detectors — token-set Jaccard ([[jaccardPairs]]),
    * winnowing fingerprint overlap, embedding cosine
    * ([[Similarity.cosineNearDupPairs]]) — over the same corpus, one row
    * per pair found by ANY of them with a flag per signal. Disagreements
    * are the review queue (a pair only the embedding finds is a
    * paraphrase, not a copy; one only Jaccard finds reordered its text).
    *
    * `sampleDocs = Some(m)` is the corpus-scale mode: the audit composes
    * the EXACT detectors (pairs-proportional and O(N²)-block work whose
    * scale paths are the banded/IVF variants q42/q128), so at corpus
    * scale it runs on a deterministic FIXED-SIZE sample — the m docs with
    * the smallest md5("ns:" ++ id), engine-portable and selected by
    * TakeOrderedAndProject (per-partition heaps, never a global sort).
    * A fixed budget makes the audit's cost flat in corpus size.
    * `None` = the exhaustive mode, the sf0.01 oracle.
    */
  def signalAgreement(docs: DataFrame, embeddings: DataFrame,
      sampleDocs: Option[Int] = None): DataFrame = {
    val base = sampleDocs match {
      case Some(m) => docs.orderBy(
        md5(concat(lit("ns:"), col("doc_id").cast("string"))), col("doc_id"))
        .limit(m)
      case None => docs
    }
    val emb0 = sampleDocs match {
      case Some(_) => embeddings.join(
        broadcast(base.select(col("doc_id").as("vec_id"))),
        Seq("vec_id"), "left_semi") // ≤m ids — broadcastable by contract
      case None => embeddings
    }
    val jac = jaccardPairs(base, "text", "doc_id")
      .select(col("da"), col("db"), lit(true).as("by_jaccard"))
    val fp = base.select(col("doc_id"),
        explode(WinnowFingerprint(TextOps.tokens(col("text")), 3, 4)).as("f"))
      .select(col("doc_id"), col("f.hash").as("h")).distinct()
    val dfc = fp.groupBy("h").agg(count(lit(1)).as("c"))
    val keep = fp.join(dfc.filter(col("c") <= 20), "h")
    val win = keep.select(col("doc_id").as("da"), col("h"))
      .join(keep.select(col("doc_id").as("db"), col("h")), "h")
      .filter(col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 5)
      .select(col("da"), col("db"), lit(true).as("by_winnow"))
    val emb = Similarity.cosineNearDupPairs(emb0, 0.45)
      .select(col("da"), col("db"), lit(true).as("by_embedding"))
    jac.join(win, Seq("da", "db"), "full")
      .join(emb, Seq("da", "db"), "full")
      .select(col("da"), col("db"),
        coalesce(col("by_jaccard"), lit(false)).as("by_jaccard"),
        coalesce(col("by_winnow"), lit(false)).as("by_winnow"),
        coalesce(col("by_embedding"), lit(false)).as("by_embedding"))
      .orderBy("da", "db")
  }
}
