package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("salted join returns exactly the plain join's rows") {
    val customer = Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey").as("nkey"))
    val nation = Tables(spark, dir, "nation")
      .select(col("n_nationkey").as("nkey"), col("n_name"))
    val plain = customer.join(nation, "nkey")
      .select("c_custkey", "n_name").orderBy("c_custkey", "n_name")
      .collect().map(_.toSeq).toSeq
    val salted = Skew.saltedJoin(customer, nation, "nkey", salt = 7)
      .select("c_custkey", "n_name").orderBy("c_custkey", "n_name")
      .collect().map(_.toSeq).toSeq
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("map-typed columns on the large side are skipped, not fatal") {
    // xxhash64 rejects MapType; the salt must hash only hashable columns.
    val customer = Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey").as("nkey"),
        map(lit("k"), col("c_name")).as("attrs"))
    val nation = Tables(spark, dir, "nation")
      .select(col("n_nationkey").as("nkey"), col("n_name"))
    val plain = customer.join(nation, "nkey").count()
    val salted = Skew.saltedJoin(customer, nation, "nkey", salt = 5).count()
    assert(salted == plain)
  }

  test("salt column does not leak into the result") {
    val customer = Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey").as("nkey"))
    val nation = Tables(spark, dir, "nation")
      .select(col("n_nationkey").as("nkey"), col("n_name"))
    val out = Skew.saltedJoin(customer, nation, "nkey", salt = 3)
    assert(!out.columns.contains("__salt"))
  }
}
