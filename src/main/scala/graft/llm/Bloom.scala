package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom-filter membership for incremental corpus dedup: build a compact
  * bit-set sketch of the corpus's content keys once, then screen an ingest
  * batch against it — "definitely new" survives, "probably seen" is
  * dropped (or routed to an exact confirm join). One-sided error by
  * construction: NO false negatives ever (a key that was added always
  * reports present), false positives at a designed rate ε.
  *
  * Filters are SHARDED by key hash: `filterDf` emits one `(shard, bloom)`
  * row per shard, built with a mergeable OR-monoid aggregator (partial
  * per-partition bit-sets, tree-merged — no single-reducer build), and the
  * probe is a shard-key join + one codegen'd O(k) bit-test per row. At
  * 10⁹ keys / 1% ε a single filter is ~1.2 GB — past broadcast range —
  * but 64 shards of ~19 MB each build in parallel and the probe join
  * stays a broadcast hash join; shards scale the build reduce AND keep
  * every blob bounded. Blobs are self-describing (magic, k, m in a
  * header), so a probe can never silently run with mismatched parameters.
  *
  * The membership key is `xxhash64(content)` — 64-bit, so at corpus scale
  * the hash-collision rate (~n²/2⁶⁵) stays far below any practical ε and
  * the sketch error dominates, as designed.
  */
object BloomKernels {
  val Magic: Int = 0x47424c46 // "GBLF"
  val HeaderBytes: Int = 4 + 1 + 8 // magic, k, mBits

  /** Optimal (mBits, k) for n keys at false-positive rate fp. */
  def params(n: Long, fp: Double): (Long, Int) = {
    require(n > 0, s"bloom: n must be positive, got $n")
    require(fp > 0 && fp < 1, s"bloom: fp must be in (0,1), got $fp")
    val ln2 = math.log(2.0)
    val mBits = math.max(64L, math.ceil(-n * math.log(fp) / (ln2 * ln2)).toLong)
    require(mBits <= Int.MaxValue.toLong * 8L,
      s"bloom: $mBits bits exceeds a single blob; raise the shard count")
    val k = math.max(1, math.round(mBits.toDouble / n * ln2).toInt)
    (mBits, k)
  }

  /** 64→64 bit finalizer (splitmix64) deriving the second KM hash. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Set the k Kirsch–Mitzenmacher bit positions of `hash` in `bits`. */
  def add(bits: Array[Byte], mBits: Long, k: Int, hash: Long): Unit = {
    val h2 = mix(hash) | 1L
    var i = 0
    var h = hash
    while (i < k) {
      val idx = java.lang.Long.remainderUnsigned(h, mBits)
      bits((idx >>> 3).toInt) = (bits((idx >>> 3).toInt) | (1 << (idx & 7L).toInt)).toByte
      h += h2
      i += 1
    }
  }

  /** Header + bitset → self-describing blob. */
  def seal(bits: Array[Byte], mBits: Long, k: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(HeaderBytes + bits.length)
    out.putInt(Magic).put(k.toByte).putLong(mBits).put(bits)
    out.array()
  }

  /** Membership test against a sealed blob: k bit probes, short-circuit
    * on the first clear bit. Corrupt/foreign blobs FAIL LOUDLY — a silent
    * `false` would resurrect "seen" keys as new.
    */
  def contains(filter: Array[Byte], hash: Long): Boolean = {
    if (filter.length < HeaderBytes)
      throw new IllegalArgumentException(
        s"bloom: blob of ${filter.length} bytes is shorter than the header")
    val buf = java.nio.ByteBuffer.wrap(filter)
    val magic = buf.getInt()
    if (magic != Magic)
      throw new IllegalArgumentException(
        f"bloom: bad magic 0x$magic%08x (not a sealed bloom blob)")
    val k = buf.get() & 0xff
    val mBits = buf.getLong()
    if (filter.length.toLong != HeaderBytes + ((mBits + 7) >>> 3))
      throw new IllegalArgumentException(
        s"bloom: blob length ${filter.length} inconsistent with m=$mBits bits")
    val h2 = mix(hash) | 1L
    var i = 0
    var h = hash
    while (i < k) {
      val idx = java.lang.Long.remainderUnsigned(h, mBits)
      if ((filter(HeaderBytes + (idx >>> 3).toInt) & (1 << (idx & 7L).toInt)) == 0)
        return false
      h += h2
      i += 1
    }
    true
  }
}

/** Mergeable Bloom build: buffer = raw bitset bytes, reduce = set k bits,
  * merge = bitwise OR (commutative + associative + idempotent, so the
  * distributed partial/final merge order can never change the result),
  * finish = sealed self-describing blob.
  */
class BloomAgg(mBits: Long, k: Int)
    extends Aggregator[Long, Array[Byte], Array[Byte]] {
  private val nBytes = ((mBits + 7) >>> 3).toInt
  def zero: Array[Byte] = new Array[Byte](nBytes)
  def reduce(b: Array[Byte], hash: Long): Array[Byte] = {
    BloomKernels.add(b, mBits, k, hash)
    b
  }
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }
  def finish(b: Array[Byte]): Array[Byte] = BloomKernels.seal(b, mBits, k)
  def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Codegen'd membership probe over (key-hash BIGINT, sealed blob BINARY). */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"BloomContains expects (BIGINT, BINARY) inputs, got ${l.sql}, ${r.sql}")
  }
  override protected def nullSafeEval(hash: Any, filter: Any): Any =
    BloomKernels.contains(filter.asInstanceOf[Array[Byte]], hash.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, f) => s"graft.llm.BloomKernels.contains($f, $h)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object BloomContains {
  def apply(hash: Column, filter: Column): Column =
    ColumnBridge.column(
      BloomContains(ColumnBridge.expression(hash), ColumnBridge.expression(filter)))
}

object Bloom {

  /** shard id of a key hash: spread by the mixed high bits so shard and
    * in-filter bit positions stay independent.
    */
  private def shardOf(h: Column, shards: Int): Column =
    pmod(shiftrightunsigned(h, 32), lit(shards.toLong)).cast("int")

  /** Build one sealed Bloom blob per shard over `key`'s xxhash64.
    * `expectedN` sizes the per-shard filters for `fp`; passing the exact
    * count keeps ε at the design point, an over-estimate only wastes bits.
    */
  def filterDf(corpus: DataFrame, key: Column, expectedN: Long,
      fp: Double = 0.01, shards: Int = 4): DataFrame = {
    require(shards > 0, "bloom: shards must be positive")
    val (mBits, k) = BloomKernels.params(math.max(1L, expectedN / shards), fp)
    val bloomAgg = udaf(new BloomAgg(mBits, k))
    corpus.select(xxhash64(key).as("h"))
      .groupBy(shardOf(col("h"), shards).as("shard"))
      .agg(bloomAgg(col("h")).as("bloom"))
  }

  /** Ingest rows whose `key` is DEFINITELY not in the filtered corpus.
    * One-sided: never returns a key the corpus contains; drops ~ε of the
    * genuinely-new keys as collateral (route "probably seen" to an exact
    * confirm join when that loss matters).
    */
  def newKeys(ingest: DataFrame, key: Column, filters: DataFrame,
      shards: Int): DataFrame = {
    val probed = ingest.withColumn("__h", xxhash64(key))
      .withColumn("shard", shardOf(col("__h"), shards))
      .join(broadcast(filters), "shard")
    probed.filter(!BloomContains(col("__h"), col("bloom")))
      .drop("shard", "__h", "bloom")
  }
}
