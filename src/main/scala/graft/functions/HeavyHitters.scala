package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary (Misra & Gries 1982), capacity `k`
  * counters, mergeable per Agarwal et al. 2012 ("Mergeable summaries"):
  * pairwise-sum the counters, then subtract the (k+1)-th largest count
  * and drop the non-positives.
  *
  * Guarantee (holds under ANY stream order, partitioning, or merge
  * topology): every key with true frequency > n/(k+1) is present in the
  * summary, and each reported count is a lower bound within n/(k+1) of
  * the true count. The candidate SET may vary with merge order beyond
  * the guaranteed keys — so a deterministic heavy-hitters query pairs
  * the sketch with an exact confirm pass over just the ≤ k candidates
  * (see SparkEntry `agg_heavy_hitters`).
  *
  * Why it matters at 100 TB: finding keys above a frequency threshold
  * with groupBy shuffles EVERY distinct key; the sketch crosses the
  * wire at ≤ k counters per partition, and the confirm pass shuffles
  * only rows of the ≤ k surviving candidates. */
final class MGSummary(val k: Int) {
  val counts = new java.util.HashMap[java.lang.Long, java.lang.Long]()
  var processed: Long = 0L

  def add(key: Long): Unit = {
    processed += 1L
    val cur = counts.get(key)
    if (cur != null) counts.put(key, cur + 1L)
    else if (counts.size < k) counts.put(key, 1L)
    else {
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  def merge(other: MGSummary): Unit = {
    processed += other.processed
    other.counts.forEach { (key, c) =>
      val cur = counts.get(key)
      counts.put(key, if (cur == null) c else cur + c)
    }
    if (counts.size > k) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values.iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cstar = vals(vals.length - k - 1) // (k+1)-th largest
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= cstar) it.remove() else e.setValue(e.getValue - cstar)
      }
    }
  }

  /** (n, items sorted by (count desc, key asc)) — sort only stabilizes
    * the emitted array; the set is what the guarantee speaks to. */
  def result(): (Long, Array[(Long, Long)]) = {
    val arr = new Array[(Long, Long)](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      arr(i) = (e.getKey.longValue(), e.getValue.longValue())
      i += 1
    }
    (processed, arr.sortBy { case (key, c) => (-c, key) })
  }

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 8 + 4 + 16 * counts.size)
    buf.putInt(k).putLong(processed).putInt(counts.size)
    counts.forEach { (key, c) => buf.putLong(key); buf.putLong(c) }
    buf.array()
  }
}

object MGSummary {
  def deserialize(bytes: Array[Byte]): MGSummary = {
    val buf = ByteBuffer.wrap(bytes)
    val sk = new MGSummary(buf.getInt())
    sk.processed = buf.getLong()
    val n = buf.getInt()
    var i = 0
    while (i < n) { sk.counts.put(buf.getLong(), buf.getLong()); i += 1 }
    sk
  }
}

/** `mg_candidates(col, k)` → struct<n: long, items: array<struct<key,
  * lb>>> — the Misra-Gries summary as a mergeable aggregate, usable in
  * batch and streaming aggregations. String inputs are FNV-hashed (the
  * 100 TB form keys on hashes anyway); integer inputs key directly. */
case class MisraGriesCandidates(
    child: Expression,
    k: Int = 16,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("lb", LongType, nullable = false))), containsNull = false),
      nullable = false)))
  override def prettyName: String = "mg_candidates"

  private lazy val keyOf: Any => Long = child.dataType match {
    case StringType => v => HashOps.fnv64(v.asInstanceOf[UTF8String])
    case LongType => v => v.asInstanceOf[Long]
    case IntegerType => v => v.asInstanceOf[Int].toLong
    case ShortType => v => v.asInstanceOf[Short].toLong
    case other => throw new IllegalArgumentException(
      s"mg_candidates: unsupported input type $other")
  }

  override def createAggregationBuffer(): MGSummary = new MGSummary(k)

  override def update(buffer: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) buffer.add(keyOf(v))
    buffer
  }

  override def merge(buffer: MGSummary, other: MGSummary): MGSummary = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: MGSummary): Any = {
    val (n, items) = buffer.result()
    val rows: Array[Any] = items.map { case (key, lb) =>
      new GenericInternalRow(Array[Any](key, lb))
    }
    new GenericInternalRow(Array[Any](n, new GenericArrayData(rows)))
  }

  override def serialize(buffer: MGSummary): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): MGSummary =
    MGSummary.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesCandidates =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesCandidates =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object HeavyHitters {
  import org.apache.spark.sql.graft.Bridge

  /** Column API: Misra-Gries candidate summary with k counters. */
  def mgCandidates(c: Column, k: Int = 16): Column =
    Bridge.column(
      MisraGriesCandidates(Bridge.expression(c), k)
        .toAggregateExpression(isDistinct = false))
}
