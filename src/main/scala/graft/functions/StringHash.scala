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

/** The WIDE PolyHash — the class doc's documented widening executed: the
  * same code-point polynomial over the 61-bit Mersenne prime 2⁶¹−1, with
  * 128-bit intermediates (`Math.multiplyHigh`; DuckDB replicates with
  * HUGEINT arithmetic, still exactly). The 2³⁰ larger value space kills
  * the ~n²/2³² birthday term of spurious sketch CANDIDATES on
  * 10¹⁰-document corpora; the family structure (and therefore every
  * downstream band/verify stage) is unchanged. Kept BEHIND A FLAG
  * (`wide = true` on the Dedup sketch entry points) with the 31-bit form
  * as default: the two forms produce identical VERIFIED pair sets (the
  * Jaccard verify filters spurious candidates either way — A/B-asserted
  * in PolyHash61Spec), so widening only ever changes candidate-tier
  * cost, never a verdict. */
case class PolyHash61(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash61"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"poly_hash61 needs a string, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    PolyHash61.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash61.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): PolyHash61 =
    copy(child = newChild)
}

/** `(a·x + b) mod (2⁶¹−1)` over a long child — the order-1 universal
  * "permutation" of the wide MinHash family. A separate expression
  * because the product a·x overflows 64-bit arithmetic (the 31-bit
  * family's `(lit(a)·col + b) % p` Column form stays below 2⁶²); the
  * 128-bit multiply lives in one static method shared by eval and
  * codegen. */
case class AffineMod61(child: Expression, a: Long, b: Long)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "affine_mod61"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"affine_mod61 needs a long, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    PolyHash61.affine(a, input.asInstanceOf[Long], b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash61.affine(${a}L, $c, ${b}L)")

  override protected def withNewChildInternal(newChild: Expression): AffineMod61 =
    copy(child = newChild)
}

object PolyHash61 {
  val Mod: Long = (1L << 61) - 1 // 2^61 − 1 (Mersenne prime)

  /** `(a·b) mod (2⁶¹−1)` with a, b < 2⁶¹: full 128-bit product via
    * multiplyHigh, then the Mersenne fold — x mod (2⁶¹−1) =
    * (x mod 2⁶¹) + ⌊x / 2⁶¹⌋ (once more if ≥ p). Exact for the whole
    * input domain; DuckDB's HUGEINT `%` reproduces it verbatim. */
  def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) // product < 2^122 → hi < 2^58
    val lo = a * b                   // low 64 bits (unsigned semantics)
    val low61 = lo & Mod
    val rest = (lo >>> 61) | (hi << 3) // = ⌊product / 2^61⌋ < 2^61 + 8
    var r = low61 + rest
    if (r >= Mod) r -= Mod
    if (r >= Mod) r -= Mod
    r
  }

  /** `(a·x + b) mod (2⁶¹−1)` — shared by eval and codegen. */
  def affine(a: Long, x: Long, b: Long): Long = {
    var r = mulMod(a, x) + b // < 2·2⁶¹, no overflow
    if (r >= Mod) r -= Mod
    r
  }

  /** Shared by eval and codegen — one definition, zero drift. The step
    * multiplier 131 keeps acc·131 + cp < 2⁶⁸, handled by [[mulMod]]. */
  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = affine(131L, acc, cp) // cp < 2^21 ≪ p — the +b path is exact
      i += Character.charCount(cp)
    }
    acc
  }

  def poly_hash61(c: Column): Column =
    Bridge.column(PolyHash61(Bridge.expression(c)))

  def affine_mod61(c: Column, a: Long, b: Long): Column =
    Bridge.column(AffineMod61(Bridge.expression(c), a, b))
}
