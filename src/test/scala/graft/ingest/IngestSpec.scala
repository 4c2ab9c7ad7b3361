package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("sentinel coercion: parse failures and nulls become -1") {
    val raw = Seq(
      ("v1", "alice", "Music", "120", "300", "1000", "4.5", "10", "2", "a,b,c"),
      ("v2", "bob", null, "oops", null, "-", "bad", "5", "1", "")
    ).toDF("id", "uploader", "category", "age", "length", "views", "rate",
      "ratings", "comments", "related")
    val typed = Ingest.typedVideos(raw)
    val r = typed.filter(col("id") === "v2").head
    assert(r.getInt(r.fieldIndex("age")) == -1)
    assert(r.getInt(r.fieldIndex("length")) == -1)
    assert(r.getLong(r.fieldIndex("views")) == -1L)
    assert(r.getDouble(r.fieldIndex("rate")) == -1.0)
    assert(r.getSeq[String](r.fieldIndex("related")).isEmpty)
    val ok = typed.filter(col("id") === "v1").head
    assert(ok.getInt(ok.fieldIndex("age")) == 120)
    assert(ok.getSeq[String](ok.fieldIndex("related")) == Seq("a", "b", "c"))
  }

  test("XML ingest: rowTag streaming scan + sentinel typing end-to-end") {
    val dir = Files.createTempDirectory("graft-xml").toFile
    val xml = new java.io.File(dir, "videos.xml")
    val w = new java.io.PrintWriter(xml)
    w.write(
      """<videos>
        |  <video id="v1" uploader="alice" category="Music" age="120" length="300"
        |         views="1000" rate="4.5" ratings="10" comments="2">
        |    <related>v2</related><related>v3</related>
        |  </video>
        |  <video id="v2" uploader="bob" category="UNA" age="oops" length=""
        |         views="bad" rate="x" ratings="-" comments="1"/>
        |</videos>""".stripMargin)
    w.close()
    val typed = Ingest.typedVideosFromXml(
      Ingest.readVideosXml(spark, xml.getAbsolutePath))
    val rows = typed.orderBy(col("id")).collect()
    assert(rows.length == 2)
    val v1 = rows(0)
    assert(v1.getString(v1.fieldIndex("id")) == "v1")
    assert(v1.getInt(v1.fieldIndex("age")) == 120)
    assert(v1.getSeq[String](v1.fieldIndex("related")) == Seq("v2", "v3"))
    val v2 = rows(1)
    assert(v2.getInt(v2.fieldIndex("age")) == -1)     // "oops" -> sentinel
    assert(v2.getLong(v2.fieldIndex("views")) == -1L) // "bad" -> sentinel
    assert(v2.getSeq[String](v2.fieldIndex("related")).isEmpty)
  }

  test("users XML ingest: rowTag user + sentinel typing + count") {
    val dir = Files.createTempDirectory("graft-xml-users").toFile
    val xml = new java.io.File(dir, "crawl.xml")
    val w = new java.io.PrintWriter(xml)
    w.write(
      """<data>
        |  <video id="v1" uploader="alice" category="Music"/>
        |  <user id="alice" uploads="3" watches="12" friends="5"/>
        |  <user id="bob" uploads="x" friends=""/>
        |</data>""".stripMargin)
    w.close()
    val users = Ingest.typedUsersFromXml(Ingest.readUsersXml(spark, xml.getAbsolutePath))
    val rows = users.orderBy(col("user_id")).collect()
    assert(rows.length == 2) // the <video> row tag is not picked up
    val alice = rows(0)
    assert(alice.getString(alice.fieldIndex("user_id")) == "alice")
    assert(alice.getInt(alice.fieldIndex("uploads")) == 3)
    assert(alice.getInt(alice.fieldIndex("watches")) == 12)
    assert(alice.getInt(alice.fieldIndex("friends")) == 5)
    val bob = rows(1)
    assert(bob.getInt(bob.fieldIndex("uploads")) == -1)  // "x" -> sentinel
    assert(bob.getInt(bob.fieldIndex("watches")) == -1)  // absent -> sentinel
    assert(bob.getInt(bob.fieldIndex("friends")) == -1)  // "" -> sentinel
    // the reference's one consumer: collection count (YoutubeNetworkAgg_Final.py:29)
    assert(Ingest.userCount(users).head.getLong(0) == 2L)
  }

  test("dedupAppend resolves existence through the path's FileSystem scheme") {
    val dir = Files.createTempDirectory("graft-ingest-fs").toFile
    // explicit file: URI — java.io.File would mis-handle the scheme prefix;
    // the Hadoop FileSystem API resolves it (and s3a://... the same way)
    val path = s"file://${dir.getAbsolutePath}/videos"
    val b1 = Seq(("v1", 1), ("v2", 2)).toDF("id", "x")
    assert(Ingest.dedupAppend(spark, b1, path, "id") == 2L)
    assert(Ingest.dedupAppend(spark, b1, path, "id") == 0L) // replay: FS sees the data
    assert(spark.read.parquet(path).count() == 2L)
  }

  test("dedupAppend skips already-present and in-batch duplicate keys") {
    val dir = Files.createTempDirectory("graft-ingest").toFile
    val path = s"${dir.getAbsolutePath}/videos"
    val b1 = Seq(("v1", 1), ("v2", 2), ("v2", 22)).toDF("id", "x")
    assert(Ingest.dedupAppend(spark, b1, path, "id") == 2L) // in-batch dup dropped
    val b2 = Seq(("v2", 3), ("v3", 4)).toDF("id", "x")
    assert(Ingest.dedupAppend(spark, b2, path, "id") == 1L) // v2 already present
    assert(spark.read.parquet(path).count() == 3L)
    assert(Ingest.dedupAppend(spark, b1, path, "id") == 0L) // idempotent replay
  }

  test("jsonl source: clean rows typed one-pass, malformed lines quarantined whole") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-jsonl").toFile
    val path = s"${dir.getAbsolutePath}/docs.jsonl"
    val lines = Seq(
      """{"doc_id": 1, "text": "hello \"quoted\" world", "lang": "en", "source": "web", "n_chars": 20}""",
      """{"doc_id": 2, "text": "line\nbreak", "lang": "de", "source": "book", "n_chars": 10}""",
      """this is not json at all""",
      """{"doc_id": "NOT_A_NUMBER", "text": "bad id", "lang": "en", "source": "web", "n_chars": 6}""",
      """{"doc_id": 3, "text": null, "lang": null, "source": "web", "n_chars": 0}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      lines.mkString("\n").getBytes("UTF-8"))
    val raw = Ingest.readDocumentsJsonl(spark, path)
    val (clean, quarantine) = Ingest.jsonlSplit(raw)
    // typed one-pass read: escapes and embedded newlines round-trip; null
    // fields on a well-formed line are data, not corruption
    assert(clean.count() == 3L)
    assert(clean.schema.fieldNames.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    val r1 = clean.filter(col("doc_id") === 1L)
      .select("text").as[String].head()
    assert(r1 == "hello \"quoted\" world")
    assert(clean.filter(col("doc_id") === 2L)
      .select("text").as[String].head() == "line\nbreak")
    // malformed lines (bad syntax AND schema-violating values) land whole
    // in the quarantine, nothing silently dropped
    val q = quarantine.as[String].collect().toSeq
    assert(q.size == 2)
    assert(q.exists(_.contains("not json")))
    assert(q.exists(_.contains("NOT_A_NUMBER")))
  }

  test("propsFieldReport: parsed values aggregated; missing key and malformed both count as missing") {
    val ev = Seq(
      ("view", """{"k": 10}"""),
      ("view", """{"k": 20}"""),
      ("view", """{"other": 5}"""), // key absent
      ("click", "not json at all"), // malformed document
      ("click", """{"k": 7}"""))
      .toDF("event_type", "props")
    val got = Ingest.propsFieldReport(ev)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("click", 2L, 1L, 7L, 7.0),
      ("view", 3L, 1L, 30L, 15.0)), s"got $got")
  }
}
