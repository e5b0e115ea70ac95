package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** `graft_simhash_agg(h)` → the 32-bit SimHash of a group of item hashes,
  * as BIGINT: bit k is set iff Σ_items (±1 from bit k of h) ≥ 0.
  *
  * One aggregate with an int[32] buffer replaces 32 separate conditional
  * sums — 32× less aggregation state per group and one pass over the
  * hashes, with map-side partial aggregation (each partition ships 32 ints
  * per doc, not its item rows).
  */
case class SimhashBitsAgg(
    child: Expression,
    nBits: Int = 32,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def prettyName: String = "graft_simhash_agg"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_agg expects bigint item hashes, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Int] = new Array[Int](nBits)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var k = 0
      while (k < nBits) {
        buffer(k) += (if (((h >> k) & 1L) == 1L) 1 else -1)
        k += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var k = 0
    while (k < nBits) { buffer(k) += other(k); k += 1 }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = {
    var sim = 0L
    var k = 0
    while (k < nBits) {
      if (buffer(k) >= 0) sim |= (1L << k)
      k += 1
    }
    sim
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 4)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 4)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashBitsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashBitsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
