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

/** Misra-Gries heavy-hitters sketch as a TypedImperativeAggregate —
  * the frequent-items counterpart of the KMV distinct sketch
  * ([[KmvSketch]]).
  *
  * Buffer = at most `capacity` (key → counter) entries. The classic
  * guarantee holds under merging (Agarwal et al., "Mergeable summaries",
  * PODS'12): every key whose true frequency exceeds N/(capacity+1) is
  * present in the final candidate set, and each counter underestimates
  * by at most N/(capacity+1).
  *
  * Scale shape: partial buffers are map-side combined, so an exact
  * heavy-hitters report over a billion-key domain (URLs, tokens,
  * user ids at 100 TB) shuffles capacity-sized summaries per partition
  * instead of the full distinct domain — see
  * [[graft.operators.Frequency.exactHeavyHitters]] for the two-pass
  * sketch→verify plan built on top.
  */
object MgSketch {

  case class MgAgg(
      child: Expression,
      capacity: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.LongMap[Long]] {

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "mg_sketch"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"mg_sketch expects bigint keys, got $t")
    }

    override def createAggregationBuffer(): mutable.LongMap[Long] = mutable.LongMap.empty

    override def update(buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val k = v.asInstanceOf[Long]
        val cur = buf.getOrElse(k, 0L)
        if (cur > 0L) buf.update(k, cur + 1L)
        else if (buf.size < capacity) buf.update(k, 1L)
        else decrementAll(buf, 1L) // the arriving key and every counter lose one
      }
      buf
    }

    override def merge(buf: mutable.LongMap[Long], other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
      other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
      if (buf.size > capacity) {
        // subtract the (capacity+1)-th largest counter from everything —
        // the mergeable-summaries rule that preserves the MG error bound
        val counts = buf.values.toArray
        java.util.Arrays.sort(counts)
        decrementAll(buf, counts(counts.length - capacity - 1))
      }
      buf
    }

    private def decrementAll(buf: mutable.LongMap[Long], by: Long): Unit = {
      // snapshot first: removing/updating while iterating an open-
      // addressed LongMap is not safe
      val entries = buf.toArray
      var i = 0
      while (i < entries.length) {
        val (k, c) = entries(i)
        if (c <= by) buf.remove(k) else buf.update(k, c - by)
        i += 1
      }
    }

    /** candidate keys, sorted for deterministic output. */
    override def eval(buf: mutable.LongMap[Long]): Any = {
      val keys = buf.keys.toArray
      java.util.Arrays.sort(keys)
      new GenericArrayData(keys)
    }

    override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + buf.size * 16)
      bb.putInt(buf.size)
      buf.foreach { case (k, c) => bb.putLong(k); bb.putLong(c) }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = mutable.LongMap.empty[Long]
      (0 until n).foreach(_ => buf.update(bb.getLong, bb.getLong))
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): MgAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): MgAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
  }

  /** aggregate Column: sorted heavy-hitter candidate keys. */
  def mg_sketch(keys: Column, capacity: Int = 256): Column =
    ColumnBridge.column(
      MgAgg(ColumnBridge.expression(keys), capacity).toAggregateExpression())
}
