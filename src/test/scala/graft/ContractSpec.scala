package graft

import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.silver.Silver

/** Driver-contract self-checks + the property-based invariants from
  * SURVEY §5.3. */
class ContractSpec extends SparkTestBase {
  import spark.implicits._

  test("every oracleSql key has a matching query; names are unique") {
    val qNames = SparkEntry.queries.keySet
    val oNames = SparkEntry.oracleSql.keySet
    assert(oNames.subsetOf(qNames),
      s"oracle without query: ${oNames -- qNames}")
    assert(qNames.nonEmpty)
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  private val rowsGen: Gen[List[(Int, Int, Double)]] =
    Gen.listOfN(60, for {
      key <- Gen.choose(0, 5)
      seq <- Gen.choose(0, 20)
      v <- Gen.choose(0.0, 100.0)
    } yield (key, seq, v))

  test("property: dedup is idempotent and keeps one row per key") {
    val prop = forAll(rowsGen) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("key", "seq", "v")
        val once = Silver.dedupLatest(df, Seq("key"),
          Seq(col("seq").desc, col("v").desc))
        val twice = Silver.dedupLatest(once, Seq("key"),
          Seq(col("seq").desc, col("v").desc))
        val keys = rows.map(_._1).distinct.size
        once.count() == keys && twice.collect().toSet == once.collect().toSet
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: late-merge is order-insensitive (union commutes)") {
    val prop = forAll(rowsGen, rowsGen) { (xs, ys) =>
      (xs.isEmpty && ys.isEmpty) || {
        val a = xs.toDF("key", "seq", "v")
        val b = ys.toDF("key", "seq", "v")
        val order = Seq(col("seq").desc, col("v").desc)
        val ab = Silver.mergeLateData(a, b, Seq("key"), order).collect().toSet
        val ba = Silver.mergeLateData(b, a, Seq("key"), order).collect().toSet
        ab == ba
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
