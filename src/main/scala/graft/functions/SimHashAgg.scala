package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Native SimHash aggregate: folds 64-bit token hashes into ONE 60-slot
  * counter buffer per group (`TypedImperativeAggregate`), emitting the
  * 60-bit sign hash.
  *
  * The pure-DataFrame formulation is 60 parallel `sum(when(...))`
  * aggregates over a staged hash column (graft.dedup.Dedup.simHash) —
  * correct, but each input row updates 60 separate aggregate slots
  * through codegen'd per-column paths and the partial-aggregate rows
  * carry 60 long fields through the shuffle. This aggregate keeps the
  * counters in a single primitive array (one object per group), updates
  * them in a tight loop, and serializes 240 bytes per group for the
  * partial/final exchange — the custom-Expression tier of the SURVEY
  * preference ladder, justified because the semantics (a fixed-width
  * counter vector folded to a bitmask) have no single built-in.
  *
  * Bit rule matches the SQL oracle exactly: counter j += (hash>>j)&1 ?
  * +1 : -1; final bit j set iff counter j > 0.
  */
case class SimHashAgg(
    child: Expression,
    bits: Int = 60,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < bits) {
        buf(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < bits) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var out = 0L
    var j = 0
    while (j < bits) {
      if (buf(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * bits)
    var j = 0
    while (j < bits) { bb.putInt(buf(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Int](bits)
    var j = 0
    while (j < bits) { buf(j) = bb.getInt(); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "simhash_agg"
}

object SimHashAgg {
  /** Column form: `simhash_agg(tokenHashColumn)` as an aggregate. */
  def simhash_agg(c: Column, bits: Int = 60): Column =
    GraftShims.column(
      SimHashAgg(GraftShims.expression(c), bits).toAggregateExpression())
}
