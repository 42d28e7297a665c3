package graft

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.warehouse.Warehouse

/** Bucketed-layout scale properties beyond WarehouseSpec's synthetic case:
  * real fact tables, bucket-key aggregation, and the mismatched-bucket
  * fallback. The write-time shuffle must be the only one that ever
  * happens on the bucket key. */
class BucketingSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def exchanges(p: String): Int = "Exchange".r.findAllIn(p).length

  test("co-bucketed fact-to-fact equi-join plans with zero exchanges") {
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    Warehouse.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Warehouse.writeBucketed(lineitem, "b_lineitem", "l_orderkey", 4)
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
      val expected = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("aggregation on the bucket key needs no exchange") {
    val agg = spark.table("b_lineitem")
      .groupBy("l_orderkey").agg(sum("l_quantity").as("qty"))
    val p = agg.queryExecution.executedPlan.toString
    assert(exchanges(p) == 0, s"bucketed aggregation still shuffles:\n$p")
  }

  test("bucketed fingerprint index: dedup anti join never moves the index") {
    import graft.ext.Dedup
    val docs = Tables.documents(spark, dir)
    val index = Dedup.survivorFingerprints(
      docs.filter(col("doc_id") < 250), "text").distinct()
    Warehouse.writeBucketed(index, "b_fp_index", "fingerprint", 4)
    val batch = docs.filter(col("doc_id") >= 250)
      // spike with an index dup so the anti join provably kills something
      .unionByName(docs.filter(col("doc_id") < 10)
        .withColumn("doc_id", col("doc_id") + 1000000L))

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = Dedup.incrementalExactDedupBucketed(
        batch, "text", "doc_id", "b_fp_index")
      val plain = Dedup.incrementalExactDedup(batch, "text", "doc_id",
        spark.table("b_fp_index"))
      // identical survivors either way — the layout is an execution detail
      assert(bucketed.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
        === plain.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
      assert(bucketed.count() === 250)
      // the index side reads in place: bucketed plan needs strictly fewer
      // exchanges than the same join against an unbucketed index copy
      val unbucketed = Dedup.incrementalExactDedup(batch, "text", "doc_id",
        index)
      val eB = exchanges(bucketed.queryExecution.executedPlan.toString)
      val eU = exchanges(unbucketed.queryExecution.executedPlan.toString)
      assert(eB < eU, s"bucketed index did not save a shuffle: $eB vs $eU")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed gram index: span-dedup history probe never moves the index") {
    import graft.ext.Dedup
    val docs = Tables.documents(spark, dir)
    val hist = docs.filter(col("doc_id") < 250)
    // spike the batch with a history doc under a new id: every one of its
    // grams is in the index, so the history probe provably cuts something
    val batch = docs.filter(col("doc_id") >= 250)
      .unionByName(docs.filter(col("doc_id") < 5)
        .withColumn("doc_id", col("doc_id") + 1000000L))
    val index = Dedup.batchGramHashes(hist, "text", "doc_id", 5)
    Warehouse.writeBucketed(index, "b_gram_index", "h", 4)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = Dedup.incrementalDuplicatedSpansBucketed(
        batch, "text", "doc_id", "b_gram_index", 5)
      val plain = Dedup.incrementalDuplicatedSpans(batch, "text", "doc_id",
        spark.table("b_gram_index"), 5)
      // identical surgery either way — the layout (and the semi-join plan
      // shape it enables) is an execution detail
      val bRows = bucketed.orderBy("id").collect().toSeq
      val pRows = plain.orderBy("id").collect().toSeq
      assert(bRows === pRows)
      // the spiked history copies are fully covered by index grams
      val spiked = bucketed.filter(col("id") >= 1000000L)
        .select(col("n_tokens") === col("n_removed")).collect()
      assert(spiked.nonEmpty && spiked.forall(_.getBoolean(0)))
      // the index side reads in place: strictly fewer exchanges than the
      // same dedup against an unbucketed index copy
      val unbucketed = Dedup.incrementalDuplicatedSpans(batch, "text",
        "doc_id", index, 5)
      val eB = exchanges(bucketed.queryExecution.executedPlan.toString)
      val eU = exchanges(unbucketed.queryExecution.executedPlan.toString)
      assert(eB < eU, s"bucketed gram index did not save a shuffle: $eB vs $eU")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("mismatched bucket counts shuffle at most one side") {
    Warehouse.writeBucketed(Tables.orders(spark, dir), "b_orders8",
      "o_orderkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("b_lineitem")
        .join(spark.table("b_orders8"), col("l_orderkey") === col("o_orderkey"))
      val p = j.queryExecution.executedPlan.toString
      assert(exchanges(p) <= 1, s"expected at most one exchange:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
