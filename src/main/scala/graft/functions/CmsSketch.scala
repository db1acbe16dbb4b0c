package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Count-Min Sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
  * native mergeable Catalyst aggregate + a scalar probe expression.
  *
  * `cmsSketch` aggregates a key column into a depth×width counter grid
  * (cell (i, hᵢ(x)) += 1 per row); buffers merge by element-wise addition —
  * associative and commutative, so map-side partial aggregation and
  * 1000-executor tree merges work exactly like `sum`. `cmsEstimate` probes a
  * sketch column: estimate = min over rows of the key's cell, guaranteeing
  * est ≥ true and, w.p. ≥ 1−(1/e)^depth, est ≤ true + (e/width)·N.
  *
  * Unlike exact per-key counts (a shuffle keyed by a possibly-skewed,
  * possibly-huge key domain), the sketch is CONSTANT size regardless of
  * cardinality — the frequency analogue of HLL/KMV for 100 TB streams, and
  * (unlike Spark's driver-side `stat.countMinSketch`) fully distributed and
  * group-able.
  *
  * Determinism: row hashes are `((aᵢ·x61 + bᵢ) mod (2⁶¹−1)) mod width` over
  * x61 = non-negative xxhash64(key), constants from the shared
  * [[MinHashParams]] LCG table — same data ⇒ bit-identical sketch, which is
  * what makes sketch-contract oracles exactly reproducible in the gate.
  */
case class CmsSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
  require(width >= 16, s"width must be >= 16, got $width")

  private lazy val hasher = XxHash64(Seq(child), 42L)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    if (child.eval(input) != null) {
      val x = CmsSketch.spread(hasher.eval(input).asInstanceOf[Long])
      var i = 0
      while (i < depth) {
        buf(i * width + CmsSketch.rowHash(x, i, width)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * buf.length)
    bb.putInt(depth).putInt(width)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt; val w = bb.getInt
    require(d == depth && w == width,
      s"sketch shape mismatch: stored ${d}x$w, expected ${depth}x$width")
    val buf = new Array[Long](d * w)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(o: Int): CmsSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Scalar probe: `cmsEstimate(sketchCol, keyCol)` → the sketch's (over-)
  * estimate of the key's frequency. Interpreted eval (CodegenFallback) —
  * probes run on post-aggregate rows (one per group), never in a scan loop.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  private lazy val hasher = XxHash64(Seq(right), 42L)

  override def eval(input: InternalRow): Any = {
    val sketch = left.eval(input)
    val key = right.eval(input)
    if (sketch == null || key == null) null
    else {
      val bb = ByteBuffer.wrap(sketch.asInstanceOf[Array[Byte]])
      val depth = bb.getInt(0); val width = bb.getInt(4)
      // hash the key expression against the live row — same hash pipeline
      // as the sketch build (xxhash64 → spread → per-row modular hash)
      val x = CmsSketch.spread(hasher.eval(input).asInstanceOf[Long])
      var best = Long.MaxValue
      var i = 0
      while (i < depth) {
        val cell = bb.getLong(8 + 8 * (i * width + CmsSketch.rowHash(x, i, width)))
        if (cell < best) best = cell
        i += 1
      }
      best
    }
  }

  override def dataType: DataType = LongType
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Join-size estimation from two CMS sketches (Cormode & Muthukrishnan §4.2:
  * the sketch inner product estimates Σ_x f_A(x)·f_B(x), i.e. the row count
  * of an equi-join, without executing it): est = min over rows i of
  * Σ_j A[i][j]·B[i][j]. Always ≥ the true size (collision cross-terms are
  * non-negative); ≤ true + (e/width)·|A|·|B| w.h.p. — the pre-flight
  * answer to "how badly does this join blow up" that costs two constant-
  * size sketches instead of the join's shuffle.
  */
case class CmsJoinSize(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) null
    else {
      val ba = ByteBuffer.wrap(a.asInstanceOf[Array[Byte]])
      val bb = ByteBuffer.wrap(b.asInstanceOf[Array[Byte]])
      val (d1, w1) = (ba.getInt(0), ba.getInt(4))
      val (d2, w2) = (bb.getInt(0), bb.getInt(4))
      require(d1 == d2 && w1 == w2,
        s"sketch shape mismatch: ${d1}x$w1 vs ${d2}x$w2")
      var best = Long.MaxValue
      var i = 0
      while (i < d1) {
        var dot = 0L
        var j = 0
        while (j < w1) {
          val off = 8 + 8 * (i * w1 + j)
          dot += ba.getLong(off) * bb.getLong(off)
          j += 1
        }
        if (dot < best) best = dot
        i += 1
      }
      best
    }
  }

  override def dataType: DataType = LongType
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CmsSketch {

  /** 2⁶¹ − 1 (Mersenne prime): the pairwise-independent row-hash modulus. */
  val P61 = 2305843009213693951L

  /** Non-negative 61-bit view of an xxhash64 value. */
  def spread(h: Long): Long = h & P61

  /** Row-i hash of a spread key: ((a·x + b) mod p) mod width, with the
    * multiply in 128-bit via Math.multiplyHigh to avoid overflow.
    */
  def rowHash(x: Long, i: Int, width: Int): Int = {
    val a = MinHashParams.A(i)
    val b = MinHashParams.B(i)
    // (a * x) mod P61 without overflow: a, x < 2^61, use unsigned 128-bit
    val hi = Math.multiplyHigh(a, x)
    val lo = a * x
    // 128-bit value = hi·2^64 + lo; reduce mod 2^61−1 using 2^61 ≡ 1:
    // split into 61-bit limbs and sum
    val l0 = lo & P61
    val l1 = ((lo >>> 61) | (hi << 3)) & P61
    val l2 = (hi >>> 58) & P61
    var s = l0 + l1 + l2
    if (s >= P61) s -= P61
    s = s + (b % P61)
    if (s >= P61) s -= P61
    (s % width).toInt
  }

  /** Column API: mergeable CMS of `c` with a depth×width grid. */
  def cmsSketch(c: Column, depth: Int = 5, width: Int = 2048): Column =
    ColumnBridge.column(
      CmsSketch(ColumnBridge.expression(c), depth, width).toAggregateExpression())

  /** Column API: probe a sketch column for a key's frequency estimate. */
  def cmsEstimate(sketch: Column, key: Column): Column =
    ColumnBridge.column(
      CmsEstimate(ColumnBridge.expression(sketch), ColumnBridge.expression(key)))

  /** Column API: equi-join row-count estimate from two same-shape sketches. */
  def cmsJoinSize(a: Column, b: Column): Column =
    ColumnBridge.column(
      CmsJoinSize(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
