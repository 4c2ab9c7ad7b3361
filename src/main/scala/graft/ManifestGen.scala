package graft

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

/** Binding-manifest generator (VERDICT r14 #7): the round's binding
  * record used to cite its scale-evidence artifacts by NAME only, so
  * the three-scale chain (sf0.01 correctness → sf1 full oracles → ×32
  * spot oracles + bench) was auditable by trust in the prose, not by
  * content. This main hashes each artifact file (SHA-256 over raw
  * bytes) into `MANIFEST_r<N>.json`, committed alongside them;
  * [[ManifestSpec]] recomputes every hash on every test run, so any
  * later drift between a cited artifact and the bytes the binding
  * commit described fails the suite — the chain is machine-checked
  * end-to-end.
  *
  * Usage: `runMain graft.ManifestGen <round> <artifact>...`
  */
object ManifestGen {

  def sha256(path: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(Files.readAllBytes(Paths.get(path)))
      .map("%02x".format(_)).mkString

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ManifestGen <round> <artifact>...")
    val round = args.head.toInt
    val entries = args.tail.sorted.map { p =>
      require(Files.isRegularFile(Paths.get(p)), s"missing artifact: $p")
      s"""  "$p": "${sha256(p)}""""
    }
    val out = s"MANIFEST_r$round.json"
    val body =
      s"""{
         | "round": $round,
         | "sha256": {
         |${entries.mkString(",\n")}
         | }
         |}
         |""".stripMargin
    Files.write(Paths.get(out), body.getBytes("UTF-8"))
    println(s"wrote $out (${args.tail.length} artifacts)")
  }
}
