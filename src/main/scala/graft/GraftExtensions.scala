package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProduct

/** Library entry point for `spark.sql.extensions` — the deployment path that
  * makes graft's native expressions available to EVERY session on a cluster
  * (pure SQL users included) without code changes:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * or programmatically `SparkSession.builder().withExtensions(new
  * GraftExtensions())`. This registers the same builders as
  * [[org.apache.spark.sql.graftbridge.Bridge.registerFunction]] does for a
  * single session, but at session-build time through the supported
  * extensions API — the (c)-tier integration point of the custom-operator
  * ladder (SURVEY.md §7.3), where custom rules/strategies would also hook in
  * if an operator ever needs one (none does today; Catalyst handles every
  * current plan shape).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product(a, b) takes exactly two array arguments")
        DotProduct(args.head, args(1))
      }))
    // cosine_sim as a COMPOSED expression tree over the same native
    // DotProduct — the engine's round-free cosine (Similarity.cosine) made
    // available to pure SQL; composition keeps one codegen'd kernel
    // instead of a second hand-written expression to maintain
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[DotProduct].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim(a, b) takes exactly two array arguments")
        import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
        val (a, b) = (args.head, args(1))
        Divide(DotProduct(a, b),
          Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
      }))
    // Spark's runtime-filter bloom expressions, exposed as first-class SQL:
    // the optimizer only injects them into eligible join shapes, but a
    // pipeline author knows WHERE the membership prefilter belongs (see
    // Dedup.contaminationReportBloom). Contract: insert and probe the SAME
    // xxhash64(key) longs. The filter argument of bloom_might_contain must
    // be a literal or scalar subquery (enforced by its checkInputDataTypes).
    ext.injectFunction((
      FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "bloom_filter_agg(xxhash64_key, est_items, num_bits) takes exactly three arguments")
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          args(0), args(1), args(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "bloom_might_contain(bloom, xxhash64_key) takes exactly two arguments")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(args(0), args(1))
      }))
    // the cross-engine deterministic string hashes behind the sketch
    // tiers (MinHash/SimHash/winnowing/Count-Min), exposed so pure-SQL
    // pipelines can build ORACLE-REPLICABLE sketches of their own: the
    // 31-bit default and the 61-bit wide family (see PolyHash61's doc
    // for the tradeoff)
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[graft.functions.PolyHash].getName, "poly_hash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "poly_hash(str) takes exactly one argument")
        graft.functions.PolyHash(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("poly_hash61"),
      new ExpressionInfo(classOf[graft.functions.PolyHash61].getName, "poly_hash61"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "poly_hash61(str) takes exactly one argument")
        graft.functions.PolyHash61(args.head)
      }))
  }
}
