package graft

import java.io.File
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Machine-checks the binding-manifest chain (VERDICT r14 #7): every
  * committed `MANIFEST_r<N>.json` lists the SHA-256 of the scale-
  * evidence artifacts its round's binding record cites; this spec
  * recomputes each hash from the working tree, so an artifact edited
  * after its manifest was generated — or a manifest citing a file that
  * no longer exists — fails the suite instead of silently drifting
  * from the prose that cites it. */
class ManifestSpec extends AnyFunSuite {

  private val manifests = Option(new File(".").listFiles()).getOrElse(Array())
    .filter(f => f.isFile && f.getName.matches("MANIFEST_r\\d+\\.json"))
    .sortBy(_.getName)

  test("every committed manifest's artifact hashes match the working tree") {
    // no manifests yet is fine (pre-r15 checkouts); once one exists it
    // must verify
    manifests.foreach { m =>
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(Files.readAllBytes(m.toPath))
      val sha = node.get("sha256")
      assert(sha != null && sha.size() > 0, s"${m.getName}: empty sha256 map")
      sha.properties().asScala.foreach { e =>
        val path = e.getKey
        assert(Files.isRegularFile(Paths.get(path)),
          s"${m.getName} cites missing artifact $path")
        assert(ManifestGen.sha256(path) == e.getValue.asText(),
          s"${m.getName}: $path drifted from its recorded sha256")
      }
    }
  }

  test("sha256 helper matches a known vector") {
    val tmp = Files.createTempFile("graft-manifest", ".txt")
    Files.write(tmp, "abc".getBytes("UTF-8"))
    try assert(ManifestGen.sha256(tmp.toString) ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    finally Files.delete(tmp)
  }
}
