package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native one-pass KMV sketch aggregate: `kmv_sketch(hash_col, k)` keeps
  * the k smallest DISTINCT long values per group and returns them as an
  * ascending `array<long>` — bit-identical to the relational
  * [[graft.operators.Kmv.sketch]] over the same hashes, proven by the
  * shared oracle (a_kmv_native vs a_kmv_distinct).
  *
  * Why a TypedImperativeAggregate when the relational form exists: the
  * relational sketch pays a full `(group, h).distinct()` shuffle — every
  * distinct key crosses the exchange once — before the bounded rank. The
  * aggregate form is ONE hash-aggregate pass with O(k) state per group:
  * partial sketches build map-side (a TreeSet capped at k, so a
  * billion-row partition contributes at most k longs), and only ≤ k
  * values per (group, partition) cross the exchange in the merge. At
  * 100 TB that's the difference between shuffling the key domain and
  * shuffling `groups × partitions × k` longs. Dedup is inherent (set
  * semantics), so the input needs NO distinct() upstream.
  *
  * Determinism: the result is a pure function of the input VALUE SET
  * (min-k is associative, commutative, idempotent), so partial
  * aggregation order, partition count, and merge order cannot change it
  * — the property that makes a sketch hash-checkable at all.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"kmv_sketch: k must be >= 2, got $k")

  override def prettyName: String = "kmv_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch expects a BIGINT hash column, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // insert-then-trim: if v would be the (k+1)-th smallest it is the
    // max of the augmented set and pollLast removes it again — O(log k)
    buf.add(v)
    if (buf.size > k) { buf.pollLast(); () }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator() // TreeSet iterates ascending
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
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
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

object KmvSketchAgg {
  /** Builder for registry use: `kmv_sketch(hash_expr, k_literal)`. */
  def apply(children: Seq[Expression]): KmvSketchAgg = {
    require(children.length == 2,
      s"kmv_sketch expects (hash_col, k), got ${children.length} args")
    val k = children(1) match {
      case Literal(v: Int, IntegerType) => v
      case Literal(v: Long, LongType) => v.toInt
      case other => throw new IllegalArgumentException(
        s"kmv_sketch: k must be an integer literal, got $other")
    }
    KmvSketchAgg(children.head, k)
  }
}
