package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (score, id) pairs.
  *
  * "Best" = highest score when `smallestFirst = false` (similarities), lowest
  * score when `smallestFirst = true` (distances). Ties always break toward the
  * smaller id so results are fully deterministic across partitionings.
  *
  * Binary max-heap over the *worst* element, so insert beyond capacity is
  * O(log k) and a full scan is O(n log k) — the same complexity as the
  * reference's per-query heap (reference: app/core/indexes/flat.py:60-69),
  * but distributed: each partition keeps only k candidates and only those
  * k rows per group cross the shuffle (partial aggregation), instead of a
  * window-sort shuffling every scored row.
  */
final class TopKBuffer(val k: Int, val smallestFirst: Boolean) {
  var size: Int = 0
  val scores: Array[Double] = new Array[Double](k)
  val ids: Array[Long] = new Array[Long](k)

  /** true if (s1,id1) is WORSE than (s2,id2). */
  @inline private def worse(s1: Double, id1: Long, s2: Double, id2: Long): Boolean = {
    if (s1 != s2) { if (smallestFirst) s1 > s2 else s1 < s2 }
    else id1 > id2
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var m = i
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) return
      val ts = scores(i); scores(i) = scores(m); scores(m) = ts
      val ti = ids(i); ids(i) = ids(m); ids(m) = ti
      i = m
    }
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(scores(i), ids(i), scores(p), ids(p))) {
        val ts = scores(i); scores(i) = scores(p); scores(p) = ts
        val ti = ids(i); ids(i) = ids(p); ids(p) = ti
        i = p
      } else return
    }
  }

  def insert(score: Double, id: Long): Unit = {
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1; siftUp(size - 1)
    } else if (k > 0 && worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id; siftDown(0)
    }
  }

  /** Best-first (score desc/asc per mode, id asc on ties). */
  def sortedPairs: Array[(Double, Long)] = {
    val out = Array.tabulate(size)(i => (scores(i), ids(i)))
    out.sortWith { case ((s1, i1), (s2, i2)) =>
      if (s1 != s2) { if (smallestFirst) s1 < s2 else s1 > s2 } else i1 < i2
    }
  }
}

/** `graft_topk(score, id, k, smallestFirst)` → `array<struct<score,id>>`,
  * best-first. A `TypedImperativeAggregate`, so Spark runs it with map-side
  * partial aggregation: the shuffle for a grouped kNN moves O(groups × k)
  * rows, not O(input).
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    smallestExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def prettyName: String = "graft_topk"
  override def children: Seq[Expression] = Seq(score, id, kExpr, smallestExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"graft_topk k must be an int literal, got $other")
  }
  private lazy val smallestFirst: Boolean =
    smallestExpr.eval(InternalRow.empty).asInstanceOf[Boolean]

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!kExpr.foldable || !smallestExpr.foldable)
      TypeCheckResult.TypeCheckFailure("graft_topk k and smallestFirst must be literals")
    else if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"graft_topk score must be double, got ${score.dataType.catalogString}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"graft_topk id must be bigint, got ${id.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, smallestFirst)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { buffer.insert(other.scores(i), other.ids(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val pairs = buffer.sortedPairs
    new GenericArrayData(pairs.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putDouble(buffer.scores(i)); bb.putLong(buffer.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k, smallestFirst)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2), smallestExpr = newChildren(3))
}
