package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot aggregation keys.
  *
  * AQE splits skewed JOIN partitions automatically, but a skewed
  * AGGREGATION key (one sensor producing 10% of a 100 TB stream) still
  * lands its whole partial state on one reducer. Salting splits the hot
  * key across `buckets` reducers in a first phase and re-combines in a
  * second — both phases are map-side-combinable hash aggregations, so the
  * extra shuffle carries only per-(key, salt) partials.
  *
  * Only algebraic aggregates decompose this way (sum/count/min/max, and
  * avg = sum/count); holistic ones (exact percentile, countDistinct) need
  * sketch-based equivalents instead (approx_count_distinct,
  * percentile_approx) which are themselves algebraic.
  */
object Skew {

  /** Two-phase salted stats: sum/count/min/max/avg of `valueCol` per
    * `keys`, with the first phase fanned out over `buckets` random salts.
    * Result is identical to the direct groupBy for these aggregates
    * (salting is an execution detail, not a semantic one). */
  def saltedStats(df: DataFrame, keys: Seq[String], valueCol: String,
                  buckets: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      (rand(seed = 42) * buckets).cast("int"))
    val phase1 = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum(col(valueCol)).as("_sum"), count(col(valueCol)).as("_cnt"),
        min(col(valueCol)).as("_min"), max(col(valueCol)).as("_max"))
    phase1
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_sum")).as("sum_value"),
        sum(col("_cnt")).as("count_value"),
        min(col("_min")).as("min_value"),
        max(col("_max")).as("max_value"))
      .withColumn("avg_value", col("sum_value") / col("count_value"))
  }

  /** Broadcast-salt join for a skewed join key: replicate the (small)
    * build side `buckets` times with an explicit salt column, salt the
    * probe side randomly, and join on (key, salt). Distributes a hot key's
    * probe rows across `buckets` tasks. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    val saltedProbe = probe.withColumn("_salt",
      (rand(seed = 42) * buckets).cast("int"))
    val replicatedBuild = build.withColumn("_salt",
      explode(array((0 until buckets).map(lit): _*)))
    saltedProbe.join(broadcast(replicatedBuild), Seq(key, "_salt"))
      .drop("_salt")
  }

  /** Salted all-pairs candidate generation within bucket keys — the
    * NON-LOSSY alternative to truncating a hot LSH bucket with
    * `maxBucketSize`. One join side is replicated `salts` times, the
    * other gets a single deterministic hash block, and the join key
    * becomes (bucket, salt): a hot bucket's quadratic pair generation
    * spreads across `salts` reducers instead of landing on one, while
    * the output is EXACTLY the unsalted pair set — pair (a, b) appears
    * precisely once, on the task where a's replica salt equals b's
    * block. Cost: the replicated side shuffles `salts`× — worth it only
    * when a bucket is hot enough to dominate the stage, which is why
    * the LSH callers expose it as an opt-in knob.
    *
    * `payload` columns are carried through as `<name>_a` / `<name>_b`
    * alongside `id_a` / `id_b` (with `id_a < id_b`). */
  def saltedPairs(items: DataFrame, bucketCols: Seq[String], idCol: String,
                  salts: Int, payload: Seq[String] = Nil): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val blocked = items.withColumn("_blk", pmod(hash(col(idCol)), lit(salts)))
    val a = blocked.drop("_blk")
      .withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
      .as("a")
    val b = blocked.withColumnRenamed("_blk", "_salt").as("b")
    val cond = (bucketCols :+ "_salt")
      .map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _) && col(s"a.$idCol") < col(s"b.$idCol")
    a.join(b, cond)
      .select(col(s"a.$idCol").as("id_a") +: col(s"b.$idCol").as("id_b") +:
        payload.flatMap(p =>
          Seq(col(s"a.$p").as(s"${p}_a"), col(s"b.$p").as(s"${p}_b"))): _*)
  }
}
