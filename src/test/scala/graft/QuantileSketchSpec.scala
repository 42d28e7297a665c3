package graft

import org.apache.spark.sql.functions._

import graft.functions.QuantileFunctions._

/** The mergeable quantile sketch (GK summary): build, merge, query,
  * null/empty semantics, and the rank-error guarantee at a size where
  * compression actually fires. */
class QuantileSketchSpec extends SparkTestBase {
  import spark.implicits._

  test("uncompressed sketch answers exact order statistics; min/max always exact") {
    // 1..100 shuffled deterministically: far below the compression
    // threshold, the summary retains every value (g=1, delta=0), so
    // queries are EXACT order statistics regardless of insertion order.
    val vals = (1 to 100).map(_.toDouble)
    val df = new scala.util.Random(42).shuffle(vals).toDF("v")
      .repartition(7) // exercise partial/final merge across partitions
    val Array(q) = df
      .agg(quantileSketchQuery(quantileSketch(col("v"), 0.001),
        Seq(0.0, 0.25, 0.5, 0.99, 1.0)).as("qs"))
      .select("qs").as[Array[Double]].collect()
    assert(q(0) === 1.0 && q(4) === 100.0, "0th/100th percentile must be exact")
    assert(q(1) === 25.0 && q(2) === 50.0 && q(3) === 99.0,
      s"uncompressed sketch must be rank-exact, got ${q.toSeq}")
  }

  test("stored blobs union-merge: partials over splits answer like one direct sketch") {
    val vals = (1 to 300).map(_.toDouble)
    val df = new scala.util.Random(7).shuffle(vals).zipWithIndex
      .map { case (v, i) => (i % 3, v) }.toDF("part", "v")
    // per-split sketches (the per-day pattern), then a blob-level merge
    val merged = df.groupBy("part")
      .agg(quantileSketch(col("v"), 0.001).as("sk"))
      .agg(quantileSketchQuery(quantileSketchMerge(col("sk")),
        Seq(0.0, 0.5, 1.0)).as("qs"))
      .select("qs").as[Array[Double]].collect().head
    val direct = df
      .agg(quantileSketchQuery(quantileSketch(col("v"), 0.001),
        Seq(0.0, 0.5, 1.0)).as("qs"))
      .select("qs").as[Array[Double]].collect().head
    assert(merged(0) === 1.0 && merged(2) === 300.0)
    // ε·n = 0.3 ranks: merged and direct must agree to within one rank
    assert(math.abs(merged(1) - direct(1)) <= 1.0,
      s"merge changed the median beyond the bound: $merged vs $direct")
  }

  test("nulls are skipped; an all-null or empty group yields NULL") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", None)).toDF("k", "v")
    val out = df.groupBy("k")
      .agg(quantileSketchQuery(quantileSketch(col("v"), 0.01),
        Seq(0.0, 1.0)).as("qs"))
      .select("k", "qs").as[(String, Option[Array[Double]])]
      .collect().toMap
    assert(out("a").get.toSeq === Seq(1.0, 3.0), "nulls must be skipped")
    assert(out("b").isEmpty, "all-null group must yield NULL")
    // merge aggregate over NULL blobs: also NULL
    val m = df.groupBy("k").agg(quantileSketch(col("v"), 0.01).as("sk"))
      .filter(col("k") === "b")
      .agg(quantileSketchMerge(col("sk")).as("m"))
      .select(col("m").isNull).as[Boolean].collect().head
    assert(m, "merging only NULL sketches must yield NULL")
  }

  test("window evaluation (update→eval with no serialize) keeps sub-head-size groups") {
    // WindowExec's AggregateProcessor calls eval() straight after
    // update() — the GK head buffer is un-flushed at that point, so an
    // eval that tested the raw count would return NULL for every group
    // smaller than the 50k head (i.e. almost all of them)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
    val out = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("k", "v")
      .withColumn("q",
        quantileSketchQuery(quantileSketch(col("v"), 0.01).over(w),
          Seq(0.0, 1.0)))
      .select("k", "q").distinct()
      .as[(String, Seq[Double])].collect().toMap
    assert(out("a") === Seq(1.0, 2.0), s"window eval lost group a: $out")
    assert(out("b") === Seq(5.0, 5.0))
  }

  test("self-reported bound: ≤ ε·n when freshly built, NULL on empty, grows under merge") {
    val df = spark.range(10000).select(col("id").cast("double").as("v"))
    val eps = 0.01
    val fresh = df.agg(quantileSketchBound(quantileSketch(col("v"), eps))
      .as("b")).select("b").as[Double].collect().head
    assert(fresh <= eps * 10000 + 1,
      s"fresh sketch must self-report ≤ ε·n, got $fresh")
    // folding 10 partials: absolute (g+delta) headroom is additive under
    // GK merge, so the RELATIVE self-reported bound stays ≤ ε·n (measured
    // 0.95-1.01·ε·n at 2/10/32/100-way folds, n=10⁴ and 10⁶; the
    // x_quantile_sketch oracle pins the same ε·n+1 corpus-side)
    val merged = df.withColumn("p", col("v").cast("long") % 10)
      .groupBy("p").agg(quantileSketch(col("v"), eps).as("sk"))
      .agg(quantileSketchBound(quantileSketchMerge(col("sk"))).as("b"))
      .select("b").as[Double].collect().head
    assert(merged <= eps * 10000 + 1,
      s"10-way merged bound exceeded ε·n+1: $merged")
    val empty = df.filter(col("v") < 0)
      .agg(quantileSketchBound(quantileSketch(col("v"), eps)).as("b"))
      .select(col("b").isNull).as[Boolean].collect().head
    assert(empty, "bound of an empty sketch must be NULL")
  }

  test("SQL surface: the quantile family and graft_vector_moments are callable from spark.sql") {
    GraftExtensions.register(spark)
    spark.range(1, 101).select(col("id").cast("double").as("v"))
      .createOrReplaceTempView("qsk_vals")
    // build per-parity partials in SQL, merge them in SQL, query in SQL
    val q = spark.sql(
      """SELECT graft_quantile_query(graft_quantile_merge(sk), array(0.0d, 0.5d, 1.0d)) AS qs,
        |       graft_quantile_bound(graft_quantile_merge(sk)) AS b
        |FROM (SELECT CAST(v AS INT) % 2 AS p, graft_quantile_sketch(v, 0.001d) AS sk
        |      FROM qsk_vals GROUP BY 1)""".stripMargin)
      .as[(Seq[Double], Double)].collect().head
    assert(q._1.head === 1.0 && q._1.last === 100.0)
    assert(math.abs(q._1(1) - 50.0) <= 1.0)
    assert(q._2 >= 0.0)
    // moment cells: n lands in the last slot, Σv in the first
    val m = spark.sql(
      "SELECT graft_vector_moments(array(v)) AS c FROM qsk_vals")
      .as[Seq[Double]].collect().head
    assert(m.length === 3 && m(2) === 100.0 && m(0) === 5050.0)
  }

  test("rank error stays within ε·n once compression fires (50k rows, ε=0.01)") {
    val n = 50000
    // deterministic non-uniform values with a known rank function:
    // v = (i * 2654435761L % n) — a permutation of 0..n-1, so the exact
    // rank of value v is v + 1
    val df = spark.range(n)
      .select(((col("id") * 2654435761L) % n).cast("double").as("v"))
    val eps = 0.01
    val phis = Seq(0.1, 0.5, 0.9, 0.99)
    val q = df.agg(quantileSketchQuery(quantileSketch(col("v"), eps), phis)
        .as("qs")).select("qs").as[Array[Double]].collect().head
    phis.zip(q).foreach { case (phi, est) =>
      val rank = est + 1 // permutation of 0..n-1
      assert(math.abs(rank - phi * n) <= eps * n + 1,
        s"phi=$phi est=$est rank=$rank outside ±εn=${eps * n}")
    }
    // the summary must actually be compressed at this size: its blob is
    // far smaller than 24 bytes × n (the uncompressed sample count)
    val blob = df.agg(quantileSketch(col("v"), eps).as("sk"))
      .select("sk").as[Array[Byte]].collect().head
    assert(blob.length < 24 * n / 10,
      s"sketch did not compress: ${blob.length} bytes for $n rows")
  }
}
