package graft.serve

import graft.SparkSpec
import java.nio.file.Files

class CachesSpec extends SparkSpec {
  import spark.implicits._

  test("JSON cache twins round-trip with explicit schema and validate columns") {
    val dir = Files.createTempDirectory("graft-json-cache").toString
    val df = Seq((1L, "a", 2.5), (2L, "b", 3.5)).toDF("id", "name", "score")
    Caches.writeJson(df, s"$dir/c")
    val back = Caches.readJson(spark, s"$dir/c", df.schema, Seq("id", "name", "score"))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
    intercept[IllegalArgumentException] {
      Caches.readJson(spark, s"$dir/c", df.schema, Seq("nonexistent"))
    }
  }
}
