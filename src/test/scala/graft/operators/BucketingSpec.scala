package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Executable proof of the co-located-join posture: bucketed tables join
  * with zero shuffle exchanges, and results match the plain join.
  */
class BucketingSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("co-bucketed join plans no shuffle exchange and matches plain join") {
    val base = Files.createTempDirectory("graft-buckets").toString
    val orders = Tables(spark, dir, "orders")
      .select(col("o_custkey").as("custkey"), col("o_orderkey"), col("o_totalprice"))
    val customer = Tables(spark, dir, "customer")
      .select(col("c_custkey").as("custkey"), col("c_name"))
    try {
      Bucketing.writeBucketed(orders, "orders_b", "custkey", 8, s"$base/orders_b")
      Bucketing.writeBucketed(customer, "customer_b", "custkey", 8, s"$base/customer_b")

      val joined = Bucketing.colocatedJoin(spark, "orders_b", "customer_b", "custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        "co-bucketed join must not shuffle either side\n" + plan)

      val got = joined.select("custkey", "o_orderkey", "c_name")
        .orderBy("custkey", "o_orderkey")
        .collect().map(_.toSeq).toSeq
      val want = orders.join(customer, "custkey")
        .select("custkey", "o_orderkey", "c_name")
        .orderBy("custkey", "o_orderkey")
        .collect().map(_.toSeq).toSeq
      assert(got == want)
      assert(got.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
