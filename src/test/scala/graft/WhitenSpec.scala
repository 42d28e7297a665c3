package graft

import org.apache.spark.sql.functions._

import graft.ext.Whiten

/** ZCA whitening + Mahalanobis scoring: moment correctness, the
  * whitened-covariance-is-identity contract, the fit-once/project-many
  * shape, and the covariance-aware property Euclidean distance lacks. */
class WhitenSpec extends SparkTestBase {
  import spark.implicits._

  // strongly correlated 2-d cloud: y ≈ x, variance along (1,1) huge,
  // along (1,−1) tiny. The jitter sign flips per CYCLE (i/20), not per
  // row — i%2 would correlate with x = i%20 and shift the covariance
  private def cloud = (0 until 400).map { i =>
    val x = (i % 20).toDouble
    val y = x + (if ((i / 20) % 2 == 0) 0.1 else -0.1)
    Array(x, y)
  }

  test("moments: n, mean, and (1/n) covariance match closed form") {
    val (n, mean, cov) = Whiten.moments(cloud.toDF("v"), "v")
    assert(n === 400L)
    assert(math.abs(mean(0) - 9.5) < 1e-9 && math.abs(mean(1) - 9.5) < 1e-9)
    // var(x) over 0..19 uniform (1/n): (20²−1)/12 = 33.25
    assert(math.abs(cov(0, 0) - 33.25) < 1e-9)
    // cov(x, y) = var(x) (the ±0.1 jitter is mean-zero and x-independent)
    assert(math.abs(cov(0, 1) - 33.25) < 1e-9)
    assert(math.abs(cov(1, 1) - (33.25 + 0.01)) < 1e-9)
  }

  test("whitened corpus has identity covariance and zero mean") {
    val wh = Whiten.whitened(cloud.toDF("v"), "v", "w", eps = 1e-12)
    val stats = wh.select(posexplode(col("w")).as(Seq("d", "x")))
      .groupBy("d")
      .agg(avg("x").as("m"), avg(col("x") * col("x")).as("v"))
      .collect()
    stats.foreach { r =>
      assert(math.abs(r.getAs[Double]("m")) < 1e-6)
      assert(math.abs(r.getAs[Double]("v") - 1.0) < 1e-6)
    }
    val cross = wh
      .select((element_at(col("w"), 1) * element_at(col("w"), 2)).as("p"))
      .agg(avg("p")).as[Double].head()
    assert(math.abs(cross) < 1e-6, s"whitened dims still correlated: $cross")
  }

  test("project with a precomputed fit reproduces whitened (the streaming shape)") {
    val df = cloud.toDF("v")
    val (_, mean, cov) = Whiten.moments(df, "v")
    val w = Whiten.zcaMatrix(cov, 1e-12)
    val a = Whiten.whitened(df, "v", "w", eps = 1e-12)
      .select("w").as[Seq[Double]].collect()
    val b = Whiten.project(df, "v", "w", mean, w)
      .select("w").as[Seq[Double]].collect()
    assert(a.zip(b).forall { case (x, y) =>
      x.zip(y).forall { case (p, q) => math.abs(p - q) < 1e-12 } })
  }

  test("mahalanobis sees what Euclidean is blind to: off-axis outliers") {
    // two probes at the SAME Euclidean distance from the mean: one along
    // the huge-variance diagonal (ordinary), one across it (anomalous)
    val onAxis = Array(12.5, 12.5)   // along (1,1): well inside the cloud
    val offAxis = Array(12.5, 6.5)   // same distance, across the ridge
    val df = (cloud ++ Seq(onAxis, offAxis)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val m2 = Whiten.mahalanobisSq(df, "v", "m2")
      .filter(col("id") >= 400).orderBy("id")
      .select("m2").as[Double].collect()
    assert(m2(1) > 100 * m2(0),
      s"cross-ridge probe must dominate: on=${m2(0)} off=${m2(1)}")
    // trace identity on the clean cloud alone
    val avgM2 = Whiten.mahalanobisSq(cloud.toDF("v"), "v", "m2")
      .agg(avg("m2")).as[Double].head()
    assert(math.abs(avgM2 - 2.0) < 1e-6, s"E[m2] must equal dim: $avgM2")
  }
}
