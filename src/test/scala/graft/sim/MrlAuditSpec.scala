package graft.sim

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class MrlAuditSpec extends SparkSpec {
  import spark.implicits._

  test("full-width prefix reproduces exact retrieval; rows total and bounded") {
    val r = Similarity.mrlAudit(Tables.embeddings(spark, sf))
      .as[(Int, Long, Double)].collect().toSeq
    assert(r.map(_._1) == Seq(8, 16, 32, 64), s"got dims ${r.map(_._1)}")
    // every probe contributes exactly k slots; recall is a share of them
    assert(r.forall { case (_, n, rec) => n > 0 && rec >= 0.0 && rec <= 1.0 })
    // dim 64 IS the full vector: truncation is the identity, recall exact 1
    assert(r.last._3 == 1.0, s"full-width recall ${r.last._3} != 1.0")
    // the shortest prefix cannot beat the identity
    assert(r.head._3 <= r.last._3)
  }

  test("structure living past the prefix drops short-prefix recall") {
    // every vector shares the same 4-dim prefix (constant 0.5), and its
    // real neighborhood structure — a one-hot group id — lives in dims
    // 5..10: vectors of one group are mutual nearest neighbors at full
    // width, while the 4-prefix sees all cosines as 1.0 and falls back
    // to the id tiebreak. The audit must show the gap, not report 1.0.
    val dim = 16
    def v(group: Int): Seq[Float] =
      Seq.tabulate(dim)(i => if (i < 4) 0.5f else if (i == 4 + group) 1.0f else 0.0f)
    val emb = (0 until 40).map(i => (i.toLong, v(i % 6), i % 2))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.mrlAudit(emb, dims = Seq(4, 16), k = 5, probeMod = 10)
      .as[(Int, Long, Double)].collect().toSeq
    assert(r.size == 2)
    assert(r.last._3 == 1.0, s"full-width recall ${r.last._3} != 1.0")
    assert(r.head._3 < 1.0,
      s"4-prefix recall ${r.head._3} should drop on past-prefix structure")
  }
}
