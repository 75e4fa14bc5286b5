package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Greenwald-Khanna ε-approximate quantile summary (Greenwald & Khanna
  * 2001), merged with the precise successor rank-uncertainty rule (the
  * form Spark's `QuantileSummaries` adopted in SPARK-21184, after
  * Agarwal et al. 2012 "Mergeable summaries"): an entry from one side
  * inherits g(succ)+Δ(succ)−1 of its successor in the other side, so the
  * rank invariant rmin(e) ≤ true-rank(v_e) ≤ rmin(e)+Δ(e) survives ANY
  * merge topology — including sorted partitions, where uncertainty is
  * carried by g (Δ=0) and a max-Δ rule would under-count (error adds per
  * merge level; tightness degrades, validity does not).
  *
  * The engine uses it the way `MGSummary` is used for heavy hitters: the
  * sketch NOMINATES a value window guaranteed to contain each requested
  * rank, and an exact second pass confirms — so the emitted percentile is
  * exact, while per-group state is O(1/ε · log εn) instead of the
  * per-distinct-value maps Spark's exact `percentile` holds. At 100 TB
  * the sketch crosses the wire in KBs per group and the confirm pass
  * sorts only the ~2εn in-window rows per group.
  */
final class GKSummary(val eps: Double) {
  // entries sorted by v; g = rows covered, del = rank slack
  val vs = new ArrayBuffer[Double]()
  val gs = new ArrayBuffer[Long]()
  val dels = new ArrayBuffer[Long]()
  var n: Long = 0L
  private var sinceCompress: Long = 0L

  private def compressInterval: Long = math.max(1L, (1.0 / (2.0 * eps)).toLong)

  def add(v: Double): Unit = {
    n += 1
    var lo = 0
    var hi = vs.length
    while (lo < hi) { // first idx with vs(idx) >= v
      val mid = (lo + hi) >>> 1
      if (vs(mid) < v) lo = mid + 1 else hi = mid
    }
    val del = if (lo == 0 || lo == vs.length) 0L
              else math.max(0L, math.floor(2.0 * eps * n).toLong - 1L)
    vs.insert(lo, v); gs.insert(lo, 1L); dels.insert(lo, del)
    sinceCompress += 1
    if (sinceCompress >= compressInterval) { compress(); sinceCompress = 0 }
  }

  /** Drop entries whose removal keeps every rank answerable within the
    * current 2εn budget. First and last entries (exact min/max) stay. */
  def compress(): Unit = {
    if (vs.length <= 2) return
    val budget = math.floor(2.0 * eps * n).toLong
    var i = vs.length - 2
    while (i >= 1) {
      if (gs(i) + gs(i + 1) + dels(i + 1) <= budget) {
        gs(i + 1) += gs(i)
        vs.remove(i); gs.remove(i); dels.remove(i)
      }
      i -= 1
    }
  }

  def merge(other: GKSummary): Unit = {
    if (other.n == 0) return
    if (n == 0) {
      vs.clear(); gs.clear(); dels.clear()
      vs ++= other.vs; gs ++= other.gs; dels ++= other.dels
      n = other.n
      return
    }
    // Precise neighbour rule (the SPARK-21184 form): an entry taken from
    // side A inherits the rank uncertainty of its SUCCESSOR in side B,
    // g_B(succ) + Δ_B(succ) − 1 — the number of B rows that may land on
    // either side of it. Inheriting only B's max Δ (the previous rule)
    // under-counts when B's uncertainty lives in g rather than Δ (e.g.
    // near-sorted partitions compress to Δ=0, g≈2εn), which broke the
    // containment invariant; g+Δ covers both carriers.
    val mv = new ArrayBuffer[Double](vs.length + other.vs.length)
    val mg = new ArrayBuffer[Long](vs.length + other.vs.length)
    val md = new ArrayBuffer[Long](vs.length + other.vs.length)
    var i = 0
    var j = 0
    while (i < vs.length || j < other.vs.length) {
      val takeSelf = j >= other.vs.length ||
        (i < vs.length && vs(i) <= other.vs(j))
      if (takeSelf) {
        val inc = if (j < other.vs.length)
          math.max(0L, other.gs(j) + other.dels(j) - 1L) else 0L
        mv += vs(i); mg += gs(i); md += dels(i) + inc; i += 1
      } else {
        val inc = if (i < vs.length)
          math.max(0L, gs(i) + dels(i) - 1L) else 0L
        mv += other.vs(j); mg += other.gs(j); md += other.dels(j) + inc
        j += 1
      }
    }
    // global min/max entries are exact again after a merge
    if (md.nonEmpty) { md(0) = 0L; md(md.length - 1) = 0L }
    vs.clear(); gs.clear(); dels.clear()
    vs ++= mv; gs ++= mg; dels ++= md
    n += other.n
    compress()
  }

  /** Value window guaranteed to contain the r-th smallest input value
    * (1-indexed). lo = max v with rmax ≤ r, hi = min v with rmin ≥ r. */
  def window(r: Long): (Double, Double) = {
    require(vs.nonEmpty, "empty summary")
    var lo = vs(0)
    var hi = vs(vs.length - 1)
    var rmin = 0L
    var i = 0
    var foundHi = false
    while (i < vs.length) {
      rmin += gs(i)
      if (rmin + dels(i) <= r) lo = vs(i)
      if (!foundHi && rmin >= r) { hi = vs(i); foundHi = true }
      i += 1
    }
    (lo, hi)
  }

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 8 + 4 + 24 * vs.length)
    buf.putDouble(eps).putLong(n).putInt(vs.length)
    var i = 0
    while (i < vs.length) {
      buf.putDouble(vs(i)).putLong(gs(i)).putLong(dels(i)); i += 1
    }
    buf.array()
  }
}

object GKSummary {
  def deserialize(bytes: Array[Byte]): GKSummary = {
    val buf = ByteBuffer.wrap(bytes)
    val sk = new GKSummary(buf.getDouble())
    sk.n = buf.getLong()
    val sz = buf.getInt()
    var i = 0
    while (i < sz) {
      sk.vs += buf.getDouble(); sk.gs += buf.getLong(); sk.dels += buf.getLong()
      i += 1
    }
    sk
  }
}

/** `gk_bounds(col, eps, qs)` → struct<n: long, bounds: array<struct<q,
  * lo, hi>>>: for each quantile fraction q the value window that is
  * GUARANTEED to contain the interpolation ranks ⌊q(n−1)⌋+1 and
  * ⌊q(n−1)⌋+2 — the exact-percentile confirm pass then only sorts rows
  * inside the window. Window WIDTH may vary with merge order (like the
  * MG candidate set); containment — and therefore the confirmed result —
  * never does. */
case class GKQuantileBounds(
    child: Expression,
    eps: Double,
    quantiles: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GKSummary] {

  override def children: Seq[Expression] = Seq(child)
  // null for an empty relation / all-null group (no windows to report)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("bounds", ArrayType(StructType(Seq(
      StructField("q", DoubleType, nullable = false),
      StructField("lo", DoubleType, nullable = false),
      StructField("hi", DoubleType, nullable = false))), containsNull = false),
      nullable = false)))
  override def prettyName: String = "gk_bounds"

  private lazy val toD: Any => Double = child.dataType match {
    case DoubleType => v => v.asInstanceOf[Double]
    case FloatType => v => v.asInstanceOf[Float].toDouble
    case LongType => v => v.asInstanceOf[Long].toDouble
    case IntegerType => v => v.asInstanceOf[Int].toDouble
    case other => throw new IllegalArgumentException(
      s"gk_bounds: unsupported input type $other")
  }

  override def createAggregationBuffer(): GKSummary = new GKSummary(eps)

  override def update(buffer: GKSummary, input: InternalRow): GKSummary = {
    val v = child.eval(input)
    if (v != null) buffer.add(toD(v))
    buffer
  }

  override def merge(buffer: GKSummary, other: GKSummary): GKSummary = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: GKSummary): Any = {
    val n = buffer.n
    if (n == 0L) return null
    val rows: Array[Any] = quantiles.toArray.map { q =>
      val p = q * (n - 1).toDouble
      val k1 = math.floor(p).toLong + 1 // 1-indexed lower interpolation rank
      val k2 = math.min(n, k1 + 1)
      val (lo, _) = buffer.window(math.max(1L, k1))
      val (_, hi) = buffer.window(k2)
      new GenericInternalRow(Array[Any](q, lo, hi))
    }
    new GenericInternalRow(Array[Any](n, new GenericArrayData(rows)))
  }

  override def serialize(buffer: GKSummary): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): GKSummary =
    GKSummary.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): GKQuantileBounds =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GKQuantileBounds =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object GKQuantile {
  import org.apache.spark.sql.graft.Bridge

  /** Column API: GK bound windows for `qs` at accuracy `eps`. */
  def gkBounds(c: Column, eps: Double, qs: Seq[Double]): Column =
    Bridge.column(
      GKQuantileBounds(Bridge.expression(c), eps, qs)
        .toAggregateExpression(isDistinct = false))
}
