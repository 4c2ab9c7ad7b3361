package graft

import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkSpec {

  test("withExtensions(GraftExtensions) exposes dot_product to pure SQL") {
    spark // force the shared session (and its SparkContext) to exist first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val got = s2.sql(
        "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
        .head.getDouble(0)
      assert(got == 32.0)
      // arity errors surface at analysis, not execution
      intercept[Exception] { s2.sql("SELECT dot_product(array(1.0D))").head }
      // cosine_sim composes the same native kernel: orthogonal -> exactly
      // 0; parallel -> 1 up to the sqrt ulp (callers round, as the engine
      // does at its verify boundaries)
      val cos = s2.sql(
        """SELECT cosine_sim(array(1.0D, 0.0D), array(0.0D, 2.0D)) AS o,
          |       cosine_sim(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS p""".stripMargin)
        .head
      assert(cos.getDouble(0) == 0.0, s"cosine: $cos")
      assert(math.abs(cos.getDouble(1) - 1.0) < 1e-12, s"cosine: $cos")
      // the bloom pair, end to end in pure SQL: build over the members
      // table via scalar subquery, probe map-side — the explicit form of
      // Spark's own runtime bloom join filter
      s2.range(0, 500).selectExpr("id AS k").createOrReplaceTempView("members")
      s2.range(0, 1000).selectExpr("id AS k").createOrReplaceTempView("probe")
      val hits = s2.sql(
        """SELECT count(*) AS n FROM probe
          |WHERE bloom_might_contain(
          |  (SELECT bloom_filter_agg(xxhash64(k), 1000L, 8192L) FROM members),
          |  xxhash64(k))""".stripMargin).head.getLong(0)
      // all 500 members must hit; the other 500 may add a few false positives
      assert(hits >= 500L && hits < 560L, s"unexpected bloom hit count $hits")
      // the sketch-tier hashes, SQL-side values equal to the Scala kernels
      val ph = s2.sql("SELECT poly_hash('join merge') AS a, poly_hash61('join merge') AS b").head
      assert(ph.getLong(0) == graft.functions.PolyHash.hash("join merge"))
      assert(ph.getLong(1) == graft.functions.PolyHash61.hash("join merge"))
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
