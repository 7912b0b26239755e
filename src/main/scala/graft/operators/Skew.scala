package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    require(!large.columns.contains("__salt") && !small.columns.contains("__salt"),
      "inputs must not already carry a __salt column")
    // Deterministic-enough spread: hash of the row id spreads a hot key's
    // rows uniformly; correctness never depends on which salt a row gets.
    val salted = large.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
