// Hosted under org.apache.spark.sql so the aggregate can extend the
// private[sql] TypedImperativeAggregate contract (the same base class
// Spark's own percentile/count_min_sketch aggregates use) and wrap into
// Columns via the classic ExpressionUtils.
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Bounded buffer of the `k` smallest DISTINCT longs seen — the state of
  * a KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream", RANDOM'02; Beyer et
  * al., SIGMOD'07 for the unbiased (k-1)/u_k estimator).
  *
  * A `java.util.TreeSet` gives dedup + max-eviction in O(log k) with
  * exactly `k` boxed longs of state; k is a few hundred, so the boxing
  * is irrelevant next to the shuffle this sketch avoids.
  */
final class MinKBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()
  def add(v: Long): Unit = {
    // cheap reject: full and not smaller than the current max
    if (set.size() >= k) {
      if (v >= set.last()) return
      if (set.add(v)) set.pollLast()
    } else set.add(v)
  }
  def mergeIn(o: MinKBuffer): Unit = {
    val it = o.set.iterator()
    while (it.hasNext) add(it.next())
  }
  def toSortedArray: Array[Long] = {
    val out = new Array[Long](set.size())
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }
}

/** Aggregate `min_k_longs(child, k)` → the sorted array of the k smallest
  * distinct values of `child` (fewer if the group has fewer distinct
  * values). Nulls are ignored.
  *
  * Scale rationale: `count_distinct` over an ultra-high-cardinality
  * column shuffles every distinct value (the partial state IS the
  * distinct set); this aggregate's partial state is ≤ k longs per group
  * per task, map-side combined like any other bounded agg, and the
  * resulting sketches are mergeable across frames/partitions/days
  * (union = re-add, see [[graft.agg.DistinctSketch.unionSketch]]) — the
  * shape a 100 TB profiling pass needs. With a uniform 60-bit hash as
  * `child`, `(k-1) · 2^60 / kth` estimates the distinct count with
  * relative error ~1/√(k−2).
  */
case class MinKLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MinKBuffer]
    with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 2, s"min_k_longs needs k >= 2, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "min_k_longs"

  override def createAggregationBuffer(): MinKBuffer = new MinKBuffer(k)

  override def update(buffer: MinKBuffer, input: InternalRow): MinKBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: MinKBuffer, other: MinKBuffer): MinKBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: MinKBuffer): Any =
    new GenericArrayData(buffer.toSortedArray)

  override def serialize(buffer: MinKBuffer): Array[Byte] = {
    val arr = buffer.toSortedArray
    val bb = ByteBuffer.allocate(4 + 8 * arr.length)
    bb.putInt(arr.length)
    arr.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MinKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MinKBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinKLongs =
    copy(child = newChild)
}

/** Bounded buffer of the `k` (rank, value) pairs with the smallest
  * DISTINCT ranks — the state of the bottom-k-by-hash VALUE sample
  * behind [[graft.agg.QuantileSketch]]. With a uniform random rank per
  * row, the k lowest-ranked rows are a simple random sample without
  * replacement, and keeping the k smallest ranks of a UNION of buffers
  * reproduces exactly the single-pass sample — the property that makes
  * the sketch losslessly mergeable across partitions/frames/days.
  * Rank collisions (negligible at 60-bit ranks) keep the smaller value
  * so merge order can never change the result.
  */
final class MinKPairBuffer(val k: Int) {
  val map = new java.util.TreeMap[java.lang.Long, java.lang.Double]()
  def add(rank: Long, value: Double): Unit = {
    val existing = map.get(rank)
    if (existing != null) {
      if (value < existing) map.put(rank, value)
    } else if (map.size() >= k) {
      if (rank < map.lastKey()) { map.put(rank, value); map.pollLastEntry() }
    } else map.put(rank, value)
  }
  def mergeIn(o: MinKPairBuffer): Unit = {
    val it = o.map.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); add(e.getKey, e.getValue) }
  }
}

/** Aggregate `min_k_pairs(rank, value, k)` → array of
  * `struct<rank: long, value: double>` holding the k pairs with the
  * smallest distinct ranks, sorted by rank. Null ranks or values are
  * ignored. Partial state ≤ k pairs per group per task at any input
  * size — the same bounded-shuffle argument as [[MinKLongs]].
  */
case class MinKPairs(
    rank: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MinKPairBuffer]
    with ExpectsInputTypes {

  require(k >= 1, s"min_k_pairs needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(rank, value)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, org.apache.spark.sql.types.DoubleType)
  override def dataType: DataType = ArrayType(
    new org.apache.spark.sql.types.StructType()
      .add("rank", LongType, nullable = false)
      .add("value", org.apache.spark.sql.types.DoubleType, nullable = false),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "min_k_pairs"

  override def createAggregationBuffer(): MinKPairBuffer = new MinKPairBuffer(k)

  override def update(buffer: MinKPairBuffer, input: InternalRow): MinKPairBuffer = {
    val r = rank.eval(input)
    val v = value.eval(input)
    if (r != null && v != null) {
      buffer.add(r.asInstanceOf[Long], v.asInstanceOf[Double])
    }
    buffer
  }

  override def merge(buffer: MinKPairBuffer, other: MinKPairBuffer): MinKPairBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: MinKPairBuffer): Any = {
    val out = new Array[Any](buffer.map.size())
    val it = buffer.map.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(e.getKey.longValue(), e.getValue.doubleValue())
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: MinKPairBuffer): Array[Byte] = {
    val n = buffer.map.size()
    val bb = ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    val it = buffer.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey)
      bb.putDouble(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MinKPairBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MinKPairBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong, bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKPairs =
    copy(rank = newChildren(0), value = newChildren(1))
}

object SketchFunctions {
  /** `min_k_longs` as a Column aggregate. */
  def min_k_longs(c: Column, k: Int): Column =
    ExpressionUtils.column(
      MinKLongs(ExpressionUtils.expression(c), k).toAggregateExpression())

  /** `min_k_pairs` as a Column aggregate. */
  def min_k_pairs(rank: Column, value: Column, k: Int): Column =
    ExpressionUtils.column(
      MinKPairs(ExpressionUtils.expression(rank),
        ExpressionUtils.expression(value), k).toAggregateExpression())
}
