package graft.sim

import graft.SparkSpec
import graft.model.Tables

class IsotropySpec extends SparkSpec {
  import spark.implicits._

  test("a collapsed corpus reads anisotropy 1; a balanced one reads 0") {
    // every vector identical -> the mean normalized vector IS a unit
    // vector -> anisotropy exactly 1 after rounding
    val collapsed = (0L until 10L).map(i => (i, Seq(3.0f, 4.0f, 0.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val c = Similarity.isotropyAudit(collapsed)
      .as[(Long, Double, Double)].head()
    assert(c._1 == 10 && c._3 == 1.0, s"collapsed corpus read $c")
    assert(c._2 == 5.0, s"mean norm of a 3-4-0-0 corpus is 5, got ${c._2}")
    // v and -v in equal measure -> the mean normalized vector vanishes
    val balanced = (0L until 10L)
      .map(i => (i, if (i % 2 == 0) Seq(1.0f, 2.0f, 2.0f, 0.0f)
                    else Seq(-1.0f, -2.0f, -2.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val b = Similarity.isotropyAudit(balanced)
      .as[(Long, Double, Double)].head()
    assert(b._3 == 0.0, s"balanced corpus read anisotropy ${b._3}")
  }

  test("the fixture corpus sits strictly between the two poles") {
    val r = Similarity.isotropyAudit(Tables.embeddings(spark, sf))
      .as[(Long, Double, Double)].head()
    assert(r._1 == 500)
    assert(r._3 > 0.0 && r._3 < 1.0, s"fixture anisotropy ${r._3} out of (0,1)")
  }
}
