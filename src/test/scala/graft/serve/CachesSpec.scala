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

  test("JSON read fails fast when the FILE lacks a required schema column") {
    // an explicit read schema materializes missing columns as all-null, so
    // validation must look at the file's actual fields, not the schema'd df
    val dir = Files.createTempDirectory("graft-json-cache2").toString
    val full = Seq((1L, "a", 2.5)).toDF("id", "name", "score")
    Caches.writeJson(full.drop("score"), s"$dir/c") // producer forgot a column
    intercept[IllegalArgumentException] {
      Caches.readJson(spark, s"$dir/c", full.schema, Seq("id", "name", "score"))
    }
  }
}
