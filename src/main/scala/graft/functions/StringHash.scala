package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Cross-engine deterministic string hash for the sketch tiers.
  *
  * `xxhash64` made the MinHash gate a PROMISE gate: no other engine
  * reproduces Spark's seed-mixed xxhash64, so the oracle could only pin a
  * recall boolean (VERDICT r9 "next" #8). This expression is the
  * graduation path: a code-point polynomial
  *
  *   h(s) = fold(c in codepoints(s)) { acc = (acc·131 + c) mod (2³¹−1) }
  *
  * that DuckDB replicates verbatim with
  * `list_reduce(list_prepend(0, list_transform(range(1, length(s)+1),
  * i -> ord(substr(s, i, 1)))), (acc, c) -> (acc*131 + c) % 2147483647)`
  * — both engines iterate UNICODE CODE POINTS (not bytes, not UTF-16
  * units), so the values agree on any input, and all intermediates stay
  * below 2³⁸ ≪ 2⁶³ (no overflow divergence in either engine).
  *
  * The order-1 universal family `(a·h + b) mod p` over this base value
  * then gives the 64 MinHash "permutations" as pure integer column
  * arithmetic — codegen'd, and cheaper than 64 seeded xxhash64 passes
  * that each re-read the string.
  *
  * Codegen'd (whole-stage tier (b) of the custom-operator preference
  * order); interpreted fallback matches exactly.
  *
  * Collision caveat (r10 advisor #4, a DELIBERATE tradeoff): the 31-bit
  * value space is far below xxhash64's — collisions are trivially
  * constructible (any two strings equal mod the polynomial), and all 64
  * "permutations" are affine maps of ONE base value, so a base collision
  * collides every signature row at once. For the shingle sketches this
  * costs a ~n²/2³² birthday term of spurious near-dup CANDIDATES (the
  * Jaccard verify step still filters them — precision survives, the
  * candidate tier grows) and is adversarially forgeable; it is accepted
  * here because it buys exact cross-engine oracle replication, which a
  * 64-bit seed-mixed hash cannot give. If sketch quality on adversarial
  * or 10¹⁰-document corpora ever matters more than DuckDB-exactness,
  * widen `Mod` to the 61-bit Mersenne prime 2⁶¹−1 with 128-bit
  * intermediates (`Math.multiplyHigh` / DuckDB HUGEINT — still exactly
  * replicable); the family structure is unchanged.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"poly_hash needs a string, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  val Mod: Long = 2147483647L // 2^31 − 1 (prime)

  /** Shared by eval and codegen — one definition, zero drift. */
  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 131L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  def poly_hash(c: Column): Column =
    Bridge.column(PolyHash(Bridge.expression(c)))
}
