package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Pins CATALOG.md to the registry: the generated content must match the
  * checked-in file up to pure line-number drift, and every registered
  * query must have a row. Fails with the regeneration command, not a diff
  * hunt.
  *
  * Line numbers inside `file:NNN` anchors are masked before comparing
  * (VERDICT r12 #1): an unrelated edit that only shifts registration or
  * def-site lines no longer reds the suite, while any SEMANTIC drift —
  * a new/renamed query, a changed description, a different implementing
  * operator, a changed oracle class or stress membership — still fails.
  * Regenerate on any SparkEntry-touching commit anyway so the checked-in
  * anchors stay clickable: `sbt "runMain graft.Catalog"`. */
class CatalogSpec extends AnyFunSuite {

  private def maskLines(s: String): String =
    s.replaceAll("""\.scala:\d+""", ".scala:_")

  test("CATALOG.md is current — regenerate with `sbt \"runMain graft.Catalog\"`") {
    val path = Paths.get("CATALOG.md")
    assert(Files.exists(path), "CATALOG.md missing — run: sbt \"runMain graft.Catalog\"")
    val onDisk = Files.readString(path)
    val generated = Catalog.generate()
    assert(maskLines(onDisk) == maskLines(generated),
      "CATALOG.md is stale — run: sbt \"runMain graft.Catalog\"")
  }

  test("every registered query has a catalog row") {
    val content = Files.readString(Paths.get("CATALOG.md"))
    val missing = SparkEntry.queries.keySet.filterNot(q => content.contains(s"`$q`"))
    assert(missing.isEmpty, s"queries absent from CATALOG.md: $missing")
  }
}
