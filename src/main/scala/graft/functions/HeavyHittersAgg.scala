package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Misra–Gries heavy-hitters aggregate: one bounded counter map
  * per group (`TypedImperativeAggregate`), emitting the surviving
  * (token, count) summary sorted by (count desc, token asc).
  *
  * Why this and not `groupBy(token).count().orderBy(...).limit(k)`:
  * the exact form shuffles ONE ROW PER DISTINCT TOKEN. Over web-scale
  * text the distinct-token universe is effectively unbounded (typos,
  * ids, urls), so the exact top-k's shuffle is the size of the
  * vocabulary, not of the answer. This sketch keeps AT MOST `capacity`
  * counters per partial, merges them pairwise (Agarwal et al.'s
  * mergeable-summaries bound holds: merged error ≤ n/capacity), and
  * ships `capacity` entries per partition through the shuffle — the
  * heavy-hitter pass a 100 TB token audit actually runs.
  *
  * Guarantees (standard Misra–Gries, preserved by the subtract-merge):
  *  - reported count ∈ [true − n/capacity, true] (never overcounts);
  *  - every token with true frequency > n/capacity survives;
  *  - when `capacity` ≥ the number of DISTINCT tokens, no decrement
  *    ever fires and every count is EXACT — which is what lets the
  *    driver hash-gate t18 against the exact DuckDB oracle on the
  *    fixture vocabulary, while the same plan stays a fixed-memory
  *    sketch on an open vocabulary.
  *
  * The reference's analytics surface has no frequency operator at all
  * (`/root/reference/src/api.py:38-42` retrieves; it never profiles), so this
  * is parity-surface extension, same tier as [[SimHashAgg]]: a custom
  * aggregate justified because no built-in expresses "bounded-memory
  * approximate top-k" (`approx_count_distinct` counts the universe;
  * `count_min_sketch` answers point queries, not enumeration).
  */
case class HeavyHittersAgg(
    child: Expression,
    capacity: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0, s"capacity must be positive: $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1L)
        case None if buf.size < capacity => buf.update(key, 1L)
        case None =>
          // Misra–Gries step: a full map and an untracked arrival pay
          // one global decrement; zeroed counters free their slots.
          // O(capacity) but fires at most n/capacity times total.
          buf.mapValuesInPlace((_, c) => c - 1L)
          buf.filterInPlace((_, c) => c > 0L)
      }
    }
    buf
  }

  /** Subtract-merge (Berinde et al. / Agarwal et al. mergeable
    * summaries): sum counters, and if more than `capacity` survive,
    * subtract the (capacity+1)-th largest count from all — the same
    * "decrement together" move as update, batched. Error bounds add,
    * staying ≤ n_total/capacity regardless of merge tree shape. */
  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      val cut = a.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      a.mapValuesInPlace((_, c) => c - cut)
      a.filterInPlace((_, c) => c > 0L)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val bytes = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      buf.update(new String(kb, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "heavy_hitters"
}

object HeavyHittersAgg {
  /** Column form: `heavy_hitters(tokenColumn, capacity)` as an
    * aggregate returning array<struct<token,cnt>> sorted by
    * (cnt desc, token asc). */
  def heavy_hitters(c: Column, capacity: Int = 256): Column =
    GraftShims.column(
      HeavyHittersAgg(GraftShims.expression(c), capacity).toAggregateExpression())
}
