package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Pins CATALOG.md to the registry: the generated content must match the
  * checked-in file byte-for-byte, and every registered query must have a
  * row. Fails with the regeneration command, not a diff hunt. */
class CatalogSpec extends AnyFunSuite {

  test("CATALOG.md is current — regenerate with `sbt \"runMain graft.Catalog\"`") {
    val path = Paths.get("CATALOG.md")
    assert(Files.exists(path), "CATALOG.md missing — run: sbt \"runMain graft.Catalog\"")
    val onDisk = Files.readString(path)
    val generated = Catalog.generate()
    assert(onDisk == generated,
      "CATALOG.md is stale — run: sbt \"runMain graft.Catalog\"")
  }

  test("every registered query has a catalog row") {
    val content = Files.readString(Paths.get("CATALOG.md"))
    val missing = SparkEntry.queries.keySet.filterNot(q => content.contains(s"`$q`"))
    assert(missing.isEmpty, s"queries absent from CATALOG.md: $missing")
  }
}
