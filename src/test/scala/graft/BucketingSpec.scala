package graft

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.warehouse.Bucketing

/** Bucketed-layout scale property: a fact⋈fact equi-join on the bucket key
  * must run with ZERO exchanges — the write-time shuffle is the only one
  * that ever happens. */
class BucketingSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def exchanges(p: String): Int =
    "Exchange".r.findAllIn(p).length

  test("co-bucketed equi-join plans with zero exchanges") {
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4,
      sortCols = Seq("o_orderkey"))
    Bucketing.writeBucketed(lineitem, "b_lineitem", "l_orderkey", 4,
      sortCols = Seq("l_orderkey"))
    // force the join to be a real SMJ decision, not a broadcast shortcut
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_extendedprice", "o_totalprice")
      val p = joined.queryExecution.executedPlan.toString
      assert(exchanges(p) == 0, s"bucketed join still shuffles:\n$p")
      assert(p.contains("SortMergeJoin"), s"expected SMJ over buckets:\n$p")
      // and the result is the same as the unbucketed join
      val expected = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("aggregation on the bucket key needs no exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val agg = spark.table("b_lineitem")
        .groupBy("l_orderkey").agg(sum("l_quantity").as("qty"))
      val p = agg.queryExecution.executedPlan.toString
      assert(exchanges(p) == 0, s"bucketed aggregation still shuffles:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("mismatched bucket counts fall back to shuffling one side only") {
    Bucketing.writeBucketed(Tables.orders(spark, dir), "b_orders8",
      "o_orderkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // 4-bucket ⋈ 8-bucket: Spark shuffles at most the mismatched side
    try {
      val j = spark.table("b_lineitem")
        .join(spark.table("b_orders8"), col("l_orderkey") === col("o_orderkey"))
      val p = j.queryExecution.executedPlan.toString
      assert(exchanges(p) <= 1, s"expected at most one exchange:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
