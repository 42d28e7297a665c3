package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry↔docs drift gate (VERDICT r19 #7, the TwinCoverageSpec idea
  * extended to COVERAGE.md): every backtick-quoted query name cited in a
  * COVERAGE.md "oracle: `q`" cell must exist in the SparkEntry registry,
  * so a renamed or deleted cell breaks the build until the doc row
  * follows. ContractSpec pins oracle-key↔query-name agreement INSIDE the
  * code; nothing pinned the committed coverage document to either until
  * this gate — the r19 COVERAGE.md edit happened to be correct, but only
  * by hand. (The reverse direction is deliberately NOT enforced: many
  * registry cells are scale/diagnostic variants that share one doc row.)
  */
class CoverageDocSpec extends AnyFunSuite {

  private def coverageFile: java.io.File = {
    // sbt forks tests with cwd = the build base; fall back to the repo
    // layout anchor so a differently-rooted runner still finds the doc
    val local = new java.io.File("COVERAGE.md")
    if (local.exists) local else new java.io.File("/root/repo/COVERAGE.md")
  }

  test("every `oracle: ...` cell name in COVERAGE.md exists in the " +
    "SparkEntry registry") {
    val f = coverageFile
    assert(f.exists, s"COVERAGE.md not found at ${f.getAbsolutePath}")
    val lines = new String(java.nio.file.Files.readAllBytes(f.toPath),
      "UTF-8").linesIterator.toList
    // table rows only (the doc's prose header explains the notation with
    // a literal "oracle: `q`" that is not a cell name)
    val oracleSeg = "oracle:([^|]*)".r
    val name = "`([a-z0-9_]+)`".r
    val cited = (for {
      line <- lines if line.dropWhile(_.isWhitespace).startsWith("|")
      seg <- oracleSeg.findAllMatchIn(line).map(_.group(1))
      n <- name.findAllMatchIn(seg).map(_.group(1))
    } yield n).toSet
    // the doc must actually cite things — an empty parse would mean the
    // notation changed and this gate silently stopped gating
    assert(cited.size > 100,
      s"only ${cited.size} oracle names parsed from COVERAGE.md — " +
        "notation drift? (expected the ~190-name inventory)")
    val registry = SparkEntry.queries.keySet
    val ghosts = cited -- registry
    assert(ghosts.isEmpty,
      s"COVERAGE.md cites oracle cells missing from the registry " +
        s"(renamed or deleted without updating the doc row): " +
        s"${ghosts.toSeq.sorted.mkString(", ")}")
  }
}
