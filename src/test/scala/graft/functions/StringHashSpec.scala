package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StringHashSpec extends SparkSpec {
  import spark.implicits._

  test("poly_hash matches the Scala reference recurrence (codegen and eval agree)") {
    val rows = Seq("abc", "", "the quick brown fox", "Ünïcödé tøkens",
      "a" * 500).toDF("s")
    val got = rows.select(col("s"), PolyHash.poly_hash(col("s")).as("h"))
      .as[(String, Long)].collect()
    got.foreach { case (s, h) =>
      assert(h == PolyHash.hash(s), s"codegen diverged from reference on '$s'")
    }
    // hand-checked anchor: "abc" = ((0*131+97)*131+98)*131+99 = 1677554
    assert(PolyHash.hash("abc") == 1677554L)
    assert(PolyHash.hash("") == 0L)
  }

  test("poly_hash iterates CODE POINTS, not UTF-16 units (supplementary plane)") {
    // U+1F600 is a surrogate pair in UTF-16; the hash must consume the
    // single code point 128512, exactly as DuckDB's ord(substr(…)) does
    val emoji = new String(Character.toChars(0x1F600))
    val expected = (128512L % PolyHash.Mod)
    assert(PolyHash.hash(emoji) == expected)
    val viaSpark = Seq(emoji).toDF("s")
      .select(PolyHash.poly_hash(col("s"))).as[Long].head()
    assert(viaSpark == expected)
  }

  test("poly_hash stays within [0, 2^31) so universal-family products cannot overflow") {
    val hs = Tables_documentsSample()
      .select(PolyHash.poly_hash(col("text")).as("h")).as[Long].collect()
    assert(hs.forall(h => h >= 0L && h < PolyHash.Mod))
  }

  private def Tables_documentsSample() =
    graft.model.Tables.documents(spark, sf).limit(200)
}
