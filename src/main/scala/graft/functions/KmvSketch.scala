package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct sketch as a custom
  * TypedImperativeAggregate — the mergeable-sketch extension level
  * (buffer = bounded sorted set of the k smallest hashes; partial
  * buffers merge by union-truncate, so the aggregation is map-side
  * combining and shuffle-light like any built-in sketch).
  *
  * eval returns the sketch as array<long>; `KmvSketch.estimate` turns
  * it into a distinct-count estimate ((k-1) / fraction of hash space
  * covered by the k-th minimum). Two sketches can also be compared for
  * set similarity — the KMV union/intersection trick.
  */
object KmvSketch {

  case class KmvAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "kmv_sketch"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"kmv_sketch expects bigint hashes, got $t")
    }

    override def createAggregationBuffer(): mutable.TreeSet[Long] = mutable.TreeSet.empty

    override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
      val v = child.eval(input)
      if (v != null) add(buf, v.asInstanceOf[Long])
      buf
    }

    override def merge(buf: mutable.TreeSet[Long], other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
      other.foreach(add(buf, _))
      buf
    }

    private def add(buf: mutable.TreeSet[Long], v: Long): Unit = {
      buf += v
      if (buf.size > k) buf -= buf.last
    }

    override def eval(buf: mutable.TreeSet[Long]): Any =
      new GenericArrayData(buf.toArray)

    override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + buf.size * 8)
      bb.putInt(buf.size)
      buf.foreach(bb.putLong)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = mutable.TreeSet.empty[Long]
      (0 until n).foreach(_ => buf += bb.getLong)
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
  }

  /** aggregate Column: KMV sketch of a bigint hash column. */
  def kmv_sketch(hashes: Column, k: Int = 256): Column =
    ColumnBridge.column(
      KmvAgg(ColumnBridge.expression(hashes), k).toAggregateExpression())

  /** distinct-count estimate from a sketch produced by kmv_sketch.
    * Hashes are mapped to [0,1) by (h/2^64 + 0.5); with fewer than k
    * values the sketch is exact. */
  def estimate(sketch: Seq[Long], k: Int = 256): Double = {
    if (sketch.size < k) sketch.size.toDouble
    else {
      val kth = sketch.max.toDouble / math.pow(2, 64) + 0.5
      (k - 1) / kth
    }
  }
}
