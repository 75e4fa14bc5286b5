package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count–Min sketch (Cormode & Muthukrishnan 2005, the public
  * construction): a depth×width grid of counters; every key increments
  * one counter per row (row r's cell = splitmix64(fnv64(key) + r·φ) low
  * bits), and a point estimate is the MIN over the key's depth cells —
  * an overestimate by construction, within εN with probability 1−δ for
  * width = e/ε, depth = ln(1/δ).
  *
  * Why it completes the engine's sketch family: Misra–Gries
  * (`mg_candidates`) answers "which keys are heavy", GK (`gk_bounds`)
  * answers rank queries, Bloom answers membership — CMS answers point
  * FREQUENCY queries for keys chosen AFTER the pass. The grid is
  * fixed-size (depth·width longs, 32 KB at 4×1024), merges by
  * element-wise addition (commutative ⇒ partition-order independent,
  * exactly mergeable across 1000 executors), and ships ONE row to the
  * driver regardless of corpus size. Every hash matches the engine's
  * splitmix64/FNV chain, so a DuckDB oracle rebuilds the identical grid
  * from exact per-key counts. */
object CountMinOps {
  final val Golden = 0x9e3779b97f4a7c15L

  /** The depth cell indices of a key (width must be a power of two). */
  def cells(key: UTF8String, depth: Int, width: Int): ArrayData = {
    val base = HashOps.fnv64(key)
    val out = new Array[Long](depth)
    var r = 0
    while (r < depth) {
      out(r) = HashOps.mix64(base + r * Golden) & (width - 1)
      r += 1
    }
    new GenericArrayData(out)
  }
}

/** Mutable aggregation buffer: the counter grid. */
final class CmsGrid(val depth: Int, val width: Int) {
  val counters = new Array[Long](depth * width)

  def add(key: UTF8String): Unit = {
    val base = HashOps.fnv64(key)
    var r = 0
    while (r < depth) {
      val c = (HashOps.mix64(base + r * CountMinOps.Golden) & (width - 1)).toInt
      counters(r * width + c) += 1L
      r += 1
    }
  }

  def merge(o: CmsGrid): Unit = {
    var i = 0
    while (i < counters.length) { counters(i) += o.counters(i); i += 1 }
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * counters.length)
    bb.putInt(depth); bb.putInt(width)
    var i = 0
    while (i < counters.length) { bb.putLong(counters(i)); i += 1 }
    bb.array()
  }
}

object CmsGrid {
  def deserialize(bytes: Array[Byte]): CmsGrid = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val g = new CmsGrid(bb.getInt(), bb.getInt())
    var i = 0
    while (i < g.counters.length) { g.counters(i) = bb.getLong(); i += 1 }
    g
  }
}

/** `cms_sketch(col, depth, width)` — aggregates the column's string
  * values into one Count–Min grid, returned as a flat array (row-major:
  * cell (r, c) at index r·width + c). Null inputs are skipped. */
case class CmsSketchAgg(
    child: Expression,
    depth: Int = 4,
    width: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsGrid] {
  require(width > 0 && (width & (width - 1)) == 0, "cms width must be a power of two")
  require(depth >= 1 && depth <= 16, "cms depth out of range")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): CmsGrid = new CmsGrid(depth, width)

  override def update(buffer: CmsGrid, input: InternalRow): CmsGrid = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String])
    buffer
  }

  override def merge(buffer: CmsGrid, other: CmsGrid): CmsGrid = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: CmsGrid): Any = new GenericArrayData(buffer.counters.clone())

  override def serialize(buffer: CmsGrid): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): CmsGrid = CmsGrid.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** `cms_cells(key, depth, width)` — the key's depth cell indices;
  * composes with `element_at` over the grid for the min-estimate. */
case class CmsCells(child: Expression, depth: Int, width: Int)
    extends UnaryExpression {
  require(width > 0 && (width & (width - 1)) == 0, "cms width must be a power of two")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_cells"
  override protected def nullSafeEval(in: Any): Any =
    CountMinOps.cells(in.asInstanceOf[UTF8String], depth, width)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CountMinOps.cells($c, $depth, $width)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object CountMinFunctions {
  def cmsSketch(c: Column, depth: Int = 4, width: Int = 1024): Column =
    Bridge.column(CmsSketchAgg(Bridge.expression(c), depth, width)
      .toAggregateExpression(isDistinct = false))
  def cmsCells(c: Column, depth: Int = 4, width: Int = 1024): Column =
    Bridge.column(CmsCells(Bridge.expression(c), depth, width))
}
