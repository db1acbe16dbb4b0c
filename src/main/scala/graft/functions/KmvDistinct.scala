package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a native mergeable
  * Catalyst aggregate (`TypedImperativeAggregate`).
  *
  * Each partition keeps the k smallest xxhash64 values of its inputs;
  * buffers merge by set-union-then-truncate (associative + commutative →
  * map-side partial aggregation works and the sketch composes across 1000
  * executors exactly like a count). Estimate: with the k-th smallest of n
  * uniform hashes at unsigned fraction u, distinct ≈ (k−1)/u; below k
  * distinct values the sketch is exact.
  *
  * Complements the built-in HLL (`approx_count_distinct`): KMV buffers are
  * also *intersectable* (Jaccard of two sketches estimates set overlap),
  * which HLL sketches are not — the building block for sketch-based
  * cross-dataset contamination checks.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 16, s"k must be >= 16, got $k")

  private lazy val hasher = XxHash64(Seq(child), 42L)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](
      java.lang.Long.compareUnsigned(_: java.lang.Long, _: java.lang.Long))

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    if (child.eval(input) != null) {
      add(buf, hasher.eval(input).asInstanceOf[Long])
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, buf.last()) < 0) {
      // only pay the insert when h actually displaces the k-th minimum —
      // once the buffer is full, almost every input hashes above it and
      // takes this O(1) rejection path instead of insert+evict
      if (buf.add(h)) buf.remove(buf.last())
    }
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else {
      // unsigned fraction of the k-th minimum in [0, 1):
      // unsigned(h) = h for h >= 0, h + 2^64 for h < 0
      val kth = buf.last().longValue()
      val u0 = kth.toDouble / math.pow(2.0, 64)
      val u = if (kth < 0) u0 + 1.0 else u0
      math.round((k - 1).toDouble / u)
    }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add(bb.getLong))
    buf
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KmvDistinct {
  /** Column API: `kmvDistinct($"user_id", 256)`. */
  def kmvDistinct(c: Column, k: Int): Column =
    ColumnBridge.column(
      KmvDistinct(ColumnBridge.expression(c), k).toAggregateExpression())
}
