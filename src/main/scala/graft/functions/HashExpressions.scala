package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass hashing kernels for sketch/fingerprint operators.
  *
  * FNV-1a 64-bit + a splitmix64 finalizer — standard public-domain
  * constructions. Static methods so WholeStageCodegen-generated code can
  * call straight into them.
  */
object HashOps {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  def fnv64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1 }
    h
  }

  /** splitmix64 finalizer — decorrelates seeded variants of one base hash. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 64-bit SimHash over a token array: bit i = sign of Σ_tokens ±1 by
    * bit i of the token hash. One pass over tokens, 64 counters. */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = fnv64(tokens.getUTF8String(t))
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) fp |= (1L << i); i += 1 }
    fp
  }

  /** k-MinHash signature over a shingle array in ONE pass: for each
    * shingle, base = fnv64(shingle); h_j = mix64(base ^ seed_j); keep the
    * minimum per j. Empty input → Long.MaxValue sentinel per slot. */
  def minhash(shingles: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var t = 0
    while (t < n) {
      if (!shingles.isNullAt(t)) {
        val base = fnv64(shingles.getUTF8String(t))
        var j = 0
        while (j < k) {
          val h = mix64(base ^ (j * 0x9e3779b97f4a7c15L))
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      t += 1
    }
    new GenericArrayData(mins)
  }
}

/** `simhash64(array<string>) -> long` as a native, codegen'd expression. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(in: Any): Any =
    HashOps.simhash64(in.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `minhash(array<string>, k) -> array<long>` native expression; one pass
  * over the shingles regardless of k (the HOF formulation would be k
  * passes). */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash"
  override protected def nullSafeEval(in: Any): Any =
    HashOps.minhash(in.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.minhash($c, $numHashes)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HashFunctions {
  import org.apache.spark.sql.graft.Bridge
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))
  def minhashSignature(shingles: Column, k: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingles), k))
}
