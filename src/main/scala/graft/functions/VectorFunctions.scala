package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.{Column, functions => F}

/** Tight-loop kernels over float vectors. Static methods so generated code
  * can call them from inside WholeStageCodegen. */
object VecOps {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val x = a.toFloatArray(); val y = b.toFloatArray()
    val n = math.min(x.length, y.length)
    var s = 0.0; var i = 0
    while (i < n) { s += x(i).toDouble * y(i).toDouble; i += 1 }
    s
  }

  def norm(a: ArrayData): Double = {
    val x = a.toFloatArray()
    var s = 0.0; var i = 0
    while (i < x.length) { s += x(i).toDouble * x(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  /** Plain-array cosine for typed (non-Catalyst) call sites, e.g. the
    * streaming broadcast-index probe. Same accumulation order as
    * `cosine(ArrayData, ArrayData)`. */
  def cosineArrays(x: Array[Float], y: Array[Float]): Double = {
    val n = math.min(x.length, y.length)
    var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x(i).toDouble; val yi = y(i).toDouble
      d += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else d / math.sqrt(nx * ny)
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val x = a.toFloatArray(); val y = b.toFloatArray()
    val n = math.min(x.length, y.length)
    var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x(i).toDouble; val yi = y(i).toDouble
      d += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else d / math.sqrt(nx * ny)
  }
}

/** Native Catalyst expression: cosine similarity of two float vectors.
  *
  * A Scala UDF here would box every element through GenericRowWithSchema;
  * the higher-order-function route (`zip_with` + `aggregate`) allocates an
  * intermediate array and evaluates a lambda per element. This expression
  * stays inside whole-stage codegen and runs one fused primitive loop per
  * row — the difference between feasible and not at 10^9 vectors.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.cosine($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product of two float vectors (same codegen strategy). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-level vector API. */
object VectorFunctions {
  def cosineSim(a: Column, b: Column): Column =
    internal(CosineSimilarity(expr(a), expr(b)))

  def dotProduct(a: Column, b: Column): Column =
    internal(DotProduct(expr(a), expr(b)))

  /** L2 norm via builtins (aggregate HOF) — reference implementation used
    * in tests to cross-check the native expressions. */
  def cosineSimBuiltin(a: Column, b: Column): Column = {
    def d(c: Column) = c.cast("double")
    val dot = F.aggregate(F.zip_with(a, b, (x, y) => d(x) * d(y)), F.lit(0.0), (s, v) => s + v)
    val na = F.aggregate(F.transform(a, x => d(x) * d(x)), F.lit(0.0), (s, v) => s + v)
    val nb = F.aggregate(F.transform(b, x => d(x) * d(x)), F.lit(0.0), (s, v) => s + v)
    F.when(na === 0.0 || nb === 0.0, 0.0).otherwise(dot / F.sqrt(na * nb))
  }

  /** Random-hyperplane (SimHash) LSH signature of a float vector: `bits`
    * sign bits packed into a long. Deterministic pseudo-hyperplanes — no
    * stored model needed. Native one-pass expression
    * (graft.functions.HyperplaneSignature); the HOF formulation it
    * replaced cost bits×dims lambda evals per row. */
  def hyperplaneSignature(v: Column, bits: Int, seed: Int = 0): Column =
    HashFunctions.hyperplaneSignature(v, bits, seed)

  private def expr(c: Column): Expression =
    org.apache.spark.sql.graft.Bridge.expression(c)
  private def internal(e: Expression): Column =
    org.apache.spark.sql.graft.Bridge.column(e)
}
