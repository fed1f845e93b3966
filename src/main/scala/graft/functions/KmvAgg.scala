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

/** Native KMV (k-minimum-values) distinct sketch: the k smallest
  * DISTINCT hash values seen per group (`TypedImperativeAggregate`,
  * bounded buffer, mergeable partials) — the theta-sketch family's
  * set-operable distinct counter (Beyer et al., "On Synopses for
  * Distinct-Value Estimation Under Multiset Operations").
  *
  * Why this next to `approx_count_distinct` (q09b's HLL): HLL answers
  * ONE cardinality; a KMV sketch is a SAMPLE of the hash space, so two
  * sketches COMPOSE — k-smallest-of-union is the union's sketch, and
  * the fraction of the union sketch present in both inputs estimates
  * Jaccard, hence intersection size. That is the cross-corpus overlap
  * query (how many distinct tokens/urls/ids do sources share?) that at
  * 100 TB would otherwise need a full distinct-key shuffle of both
  * sides; here each side ships k longs per partial, and the set
  * algebra runs on two k-arrays (t19 does it in plain Spark array
  * expressions — the sketch emits its raw sorted hashes for exactly
  * this).
  *
  * Determinism contract (what lets the driver HASH-GATE t19 against
  * DuckDB, unusual for a sketch): k-smallest-of-distinct is a pure
  * function of the input SET — no RNG, no merge-order dependence — so
  * an external engine replaying the same md5-prefix hash reproduces
  * the sketch and its estimates bit-for-bit. And when a group's
  * distinct count ≤ k the sketch IS the distinct set (estimates turn
  * exact), the same capacity⇒exact degeneration [[HeavyHittersAgg]]
  * pins.
  */
case class KmvAgg(
    child: Expression,
    k: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k > 0, s"k must be positive: $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty

  override def update(buf: mutable.TreeSet[Long],
      input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // admit only values that can enter the k smallest; TreeSet
      // dedups, so a re-seen hash is a no-op (DISTINCT semantics)
      if (buf.size < k) buf.add(h)
      else if (h < buf.last && buf.add(h)) buf.remove(buf.last)
    }
    buf
  }

  override def merge(a: mutable.TreeSet[Long],
      b: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    a ++= b
    while (a.size > k) a.remove(a.last)
    a
  }

  /** The raw sketch, ascending — callers run estimates and set algebra
    * over it with plain array expressions. */
  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_sketch"
}

object KmvAgg {
  /** Column form: `kmv_sketch(hashColumn, k)` — aggregate returning the
    * ascending array<long> of the k smallest distinct hashes. */
  def kmv_sketch(c: Column, k: Int = 256): Column =
    GraftShims.column(
      KmvAgg(GraftShims.expression(c), k).toAggregateExpression())
}
