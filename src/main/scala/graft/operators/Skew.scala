package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, VariantType}

/** Skew mitigation for hot join keys (SURVEY.md §2B scale notes).
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * remains the tool when one side must pre-shuffle (bucketed layouts,
  * deterministic partition sizing). `saltedJoin` spreads each hot key of
  * the large side over `salt` sub-keys and replicates the matching small
  * side rows, so no single reducer receives a whole hot key.
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key`, salted `salt` ways. Result is
    * row-identical to the plain join; only the shuffle distribution changes.
    *
    * LIMITATION: the salt is a content hash, so byte-identical duplicate
    * rows of a hot key all land on one salt and do not spread. That is the
    * price of retry-safety (a positional or random salt re-rolls on stage
    * retry and corrupts the join). If your hot keys are duplicate-heavy,
    * pre-disambiguate rows with a DETERMINISTIC discriminator column (an
    * upstream event id / file offset) so content hashes differ.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    require(!large.columns.contains("__salt") && !small.columns.contains("__salt"),
      "inputs must not already carry a __salt column")
    // Salt MUST be a pure function of row content: a nondeterministic salt
    // (row ids, rand) re-rolls on stage retry / recompute-after-fetch-failure,
    // so recomputed rows could land on different salts than copies already
    // consumed — dropping or duplicating join rows exactly at the scale this
    // operator exists for. xxhash64 over the hashable columns is deterministic
    // and spreads a hot key's rows uniformly (distinct non-key columns vary).
    // Maps (and variants) are not hashable in Spark — skip them rather than
    // fail analysis; the remaining columns still discriminate rows.
    def hashable(t: org.apache.spark.sql.types.DataType): Boolean = t match {
      case _: MapType | _: VariantType => false
      case org.apache.spark.sql.types.ArrayType(e, _) => hashable(e)
      case org.apache.spark.sql.types.StructType(fs) => fs.forall(f => hashable(f.dataType))
      case _ => true
    }
    val saltCols = large.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    require(saltCols.nonEmpty,
      "saltedJoin needs at least one hashable (non-map) column on the large side")
    val salted = large.withColumn("__salt",
      pmod(xxhash64(saltCols: _*), lit(salt.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
