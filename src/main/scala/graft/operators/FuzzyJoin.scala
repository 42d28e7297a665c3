package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy string matching (entity resolution): candidate pairs come
  * from an EQUI-join on a cheap deterministic blocking key, and only those
  * candidates pay the edit-distance verification. Same shape as the LSH
  * candidate join: blocking is the difference between O(n²) over the
  * dataset and O(Σ block²) over small buckets — at 100 TB the unblocked
  * variant is not an option, so this operator does not offer it.
  *
  * The default blocking key (first token) suits "adjective noun"-style
  * names; real deployments pick domain keys (soundex, zip, sorted-token
  * prefix). A skewed block (everything named "new ...") has the same
  * quadratic failure mode as a hot LSH bucket — cap or re-block if the
  * block histogram is heavy-tailed.
  */
object FuzzyJoin {

  def firstToken(c: Column): Column = split(c, " ").getItem(0)

  /** Self-join form: distinct unordered pairs (idA < idB) whose keys are
    * within `maxDist` edits, with the distance attached. */
  def fuzzySelfPairs(df: DataFrame, idCol: String, keyCol: String,
                     maxDist: Int,
                     blockFn: Column => Column = firstToken): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(keyCol).as("key_a"),
      blockFn(col(keyCol)).as("_blk"))
    val b = df.select(col(idCol).as("id_b"), col(keyCol).as("key_b"),
      blockFn(col(keyCol)).as("_blk"))
    // compute the (O(|a|·|b|) DP) distance once and filter on the column —
    // Catalyst does not CSE across Filter and Project
    a.join(b, Seq("_blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("key_a"), col("key_b")))
      .filter(col("dist") <= maxDist)
      .drop("_blk")
  }
}
