package graft.quality

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative quality-suite loader: parses a Great-Expectations
  * expectation-suite JSON (the subset the reference ships —
  * great_expectations/expectations/sensor_bronze.json:46-84) into
  * [[Quality.Check]] conditional-count aggregates, so a JSON contract runs
  * as ONE scan + ONE single-row aggregate like every programmatic suite.
  *
  * Supported expectation types:
  *  - expect_column_to_exist (schema check, evaluated against df.columns)
  *  - expect_column_values_to_not_be_null (+ mostly)
  *  - expect_column_values_to_be_in_set (+ mostly; nulls ignored, as GE does)
  *  - expect_column_values_to_be_between (one- or two-sided; nulls ignored)
  *  - expect_column_values_to_match_regex (+ mostly; nulls ignored)
  *  - expect_compound_columns_to_be_unique (count - distinct count, same
  *    aggregate pass)
  *
  * GE `mostly` semantics: the expectation fails only when the offending
  * fraction exceeds 1 - mostly; the denominator is the column's non-null
  * count for null-ignoring expectations (computed in the same aggregate via
  * avg over a null-gated indicator). An expectation naming a column absent
  * from the DataFrame fails as a whole (constant failure), mirroring GE —
  * it never breaks plan resolution.
  */
object GeSuite {

  final case class Suite(name: String, checks: Seq[Quality.Check])

  def loadFile(df: DataFrame, path: String): Suite =
    load(df, new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))

  def load(df: DataFrame, jsonText: String): Suite = {
    val root = new ObjectMapper().readTree(jsonText)
    val suiteName = Option(root.get("expectation_suite_name"))
      .map(_.asText).getOrElse("suite")
    val cols = df.columns.toSet
    val checks = root.get("expectations").elements().asScala.zipWithIndex.flatMap {
      case (e, i) => toCheck(e, i, cols)
    }.toSeq
    Suite(suiteName, dedupeNames(checks))
  }

  /** Run a JSON suite end-to-end: parse, aggregate once, return per-check
    * results (prepend Quality.enforce for the fail-fast contract). */
  def run(df: DataFrame, jsonPath: String): (String, Seq[Quality.CheckResult]) = {
    val suite = loadFile(df, jsonPath)
    (suite.name, Quality.run(df, suite.checks))
  }

  // ---- expectation translation ------------------------------------------

  private def toCheck(e: JsonNode, idx: Int,
                      cols: Set[String]): Option[Quality.Check] = {
    val etype = e.get("expectation_type").asText
    val kw = e.get("kwargs")
    def columnName = kw.get("column").asText
    def mostly =
      Option(kw.get("mostly")).map(_.asDouble).getOrElse(1.0)

    // A row-level expectation: `bad` flags an offending row, `gate` keeps a
    // row in the denominator (GE excludes nulls for value-shaped checks).
    // mostly==1 → raw offending-row count; mostly<1 → 0/1 verdict on the
    // offending fraction, both inside the shared single-row aggregate.
    def rowCheck(name: String, bad: Column, gate: Column): Quality.Check =
      if (mostly >= 1.0)
        Quality.Check(name, sum(when(gate && bad, 1L).otherwise(0L)))
      else
        Quality.Check(name,
          when(coalesce(avg(when(gate, bad.cast("int"))), lit(0.0)) >
            lit(1.0 - mostly), 1L).otherwise(0L))

    // Expectation on a column the table doesn't have: fail constantly
    // (max(lit) keeps it a valid aggregate expression) instead of blowing
    // up analysis on an unresolvable reference.
    def guarded(name: String)(mk: => Quality.Check): Option[Quality.Check] =
      Some(if (cols.contains(columnName)) mk
      else Quality.Check(name, max(lit(1L))))

    etype match {
      case "expect_column_to_exist" =>
        Some(Quality.Check(s"ge_exists_$columnName",
          max(lit(if (cols.contains(columnName)) 0L else 1L))))

      case "expect_column_values_to_not_be_null" =>
        guarded(s"ge_not_null_$columnName") {
          rowCheck(s"ge_not_null_$columnName",
            bad = col(columnName).isNull, gate = lit(true))
        }

      case "expect_column_values_to_be_in_set" =>
        guarded(s"ge_in_set_$columnName") {
          val values = kw.get("value_set").elements().asScala.map(jsonLit).toSeq
          rowCheck(s"ge_in_set_$columnName",
            bad = !col(columnName).isin(values: _*),
            gate = col(columnName).isNotNull)
        }

      case "expect_column_values_to_be_between" =>
        guarded(s"ge_between_$columnName") {
          val lo = Option(kw.get("min_value")).filterNot(_.isNull).map(_.asDouble)
          val hi = Option(kw.get("max_value")).filterNot(_.isNull).map(_.asDouble)
          val bad = (lo.map(col(columnName) < _) ++ hi.map(col(columnName) > _))
            .reduceOption(_ || _).getOrElse(lit(false))
          rowCheck(s"ge_between_$columnName",
            bad = bad, gate = col(columnName).isNotNull)
        }

      case "expect_column_values_to_match_regex" =>
        guarded(s"ge_regex_$columnName") {
          rowCheck(s"ge_regex_$columnName",
            bad = !col(columnName).rlike(kw.get("regex").asText),
            gate = col(columnName).isNotNull)
        }

      case "expect_compound_columns_to_be_unique" =>
        val keys = kw.get("column_list").elements().asScala.map(_.asText).toSeq
        val name = "ge_unique_" + keys.mkString("_")
        Some(if (keys.forall(cols.contains))
          // extra rows beyond one per key, in the same aggregate pass
          Quality.Check(name,
            count(lit(1)) - countDistinct(col(keys.head), keys.tail.map(col): _*))
        else Quality.Check(name, max(lit(1L))))

      case other =>
        System.err.println(s"[graft.ge] unsupported expectation '$other' (index $idx) skipped")
        None
    }
  }

  private def jsonLit(n: JsonNode): Any =
    if (n.isBoolean) n.asBoolean()
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isNumber) n.asDouble()
    else n.asText()

  private def dedupeNames(checks: Seq[Quality.Check]): Seq[Quality.Check] = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    checks.map { c =>
      val n = seen.getOrElse(c.name, 0)
      seen(c.name) = n + 1
      if (n == 0) c else c.copy(name = s"${c.name}_$n")
    }
  }
}
