package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the embedding hot path.
  *
  * The built-in route — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — is a
  * HigherOrderFunction: evaluated interpreted (CodegenFallback), allocating
  * a lambda frame per element. On a pairwise similarity join that is the
  * inner loop of O(n²) work; at sf0.1 it made cosine near-dup the
  * second-slowest query in the engine (95 s). This expression compiles to a
  * tight primitive loop inside whole-stage codegen — no allocation, no
  * virtual calls — the (b) tier of the custom-operator preference order
  * (compose built-ins < custom Expression < custom physical operator).
  *
  * Semantics: dot(a, b) over any mix of array<float>/array<double>/
  * array<int> sides, accumulated in double in index order (matching both
  * the HOF version and DuckDB's list_* functions, so oracle results are
  * bit-identical). The int side exists for the quantized-code hot path:
  * IVF-SQ ADC scoring decomposes to `q_const + dot_product(w, codes)`,
  * and a fused (double, int) loop scores a compressed posting without
  * materializing the dequantized array. Null arrays propagate null;
  * elements are assumed non-null (embedding columns — enforced by schema).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def elem(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def accessor(t: DataType): String = t match {
    case FloatType   => "getFloat"
    case DoubleType  => "getDouble"
    case IntegerType => "getInt"
    case t => throw new IllegalArgumentException(s"dot_product over $t arrays")
  }

  private def supported(t: DataType): Boolean =
    t == FloatType || t == DoubleType || t == IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _)) if supported(l) && supported(r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product needs two float/double/int arrays, got $l / $r")
    }
  }

  private def reader(t: DataType): (ArrayData, Int) => Double = t match {
    case FloatType   => (ad, i) => ad.getFloat(i).toDouble
    case DoubleType  => (ad, i) => ad.getDouble(i)
    case IntegerType => (ad, i) => ad.getInt(i).toDouble
    case t => throw new IllegalArgumentException(s"dot_product over $t arrays")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val gx = reader(elem(left))
    val gy = reader(elem(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += gx(x, i) * gy(y, i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = accessor(elem(left))
    val getR = accessor(elem(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.$getL($i) * (double) $b.$getR($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

object VectorFunctions {
  /** Column API for [[DotProduct]]. */
  def dot_product(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}
