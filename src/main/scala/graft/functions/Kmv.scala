package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_kmv(h, k)` → the k smallest DISTINCT bigint hash values of the
  * group, sorted ascending — the K-minimum-values cardinality sketch
  * (Bar-Yossef et al. 2002; the Theta-sketch family in production
  * systems). From the result, `distinct ≈ (k-1) · |hash space| / kth_min`.
  *
  * The point of the sketch is what it does NOT do: no corpus-wide
  * `count(DISTINCT …)` shuffle. The buffer is a bounded sorted set capped
  * at k, so the map side ships AT MOST k longs per partition regardless of
  * input size — at 100 TB the shuffle is O(partitions · k), and the final
  * merge is a k-way min-union. Values above the current cap are rejected
  * in O(1) without touching the tree (the overwhelming majority of input
  * once the buffer warms up).
  */
case class KmvAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  override def prettyName: String = "graft_kmv"
  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"graft_kmv k must be an int literal, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("graft_kmv k must be a literal")
    else if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_kmv expects bigint hashes, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): java.util.TreeSet[Long] = new java.util.TreeSet[Long]()

  private def insert(buffer: java.util.TreeSet[Long], h: Long): Unit = {
    if (buffer.size < k) { buffer.add(h); () }
    else if (h < buffer.last) { if (buffer.add(h)) buffer.pollLast(); () }
  }

  override def update(buffer: java.util.TreeSet[Long], input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) insert(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: java.util.TreeSet[Long], other: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buffer, it.next())
    buffer
  }

  override def eval(buffer: java.util.TreeSet[Long]): Any = {
    val out = new Array[Long](buffer.size)
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 8)
    bb.putInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
