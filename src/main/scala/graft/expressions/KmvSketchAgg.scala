package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.TreeSet

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values, a.k.a. bottom-k / theta) distinct sketch:
  * keeps the k SMALLEST DISTINCT long hash values seen. The classic
  * mergeable distinct-count summary (Bar-Yossef et al. 2002) with two
  * properties HyperLogLog lacks: the state is an explicit sample of
  * the distinct key space, so two groups' sketches compose into
  * union/intersection/Jaccard ESTIMATES (audience-overlap at 100 TB),
  * and insertion is idempotent (a duplicate hash is a TreeSet no-op),
  * so no pre-distinct shuffle is needed — raw occurrence streams feed
  * the aggregate directly.
  *
  * Why a TypedImperativeAggregate (the TopKByScore discipline): under
  * ObjectHashAggregate with partial aggregation every map task holds ≤
  * k longs per group, the shuffle carries ≤ k·partitions values per
  * group instead of the distinct key space, and merge folds trees of
  * size k. A `distinct + window rank` formulation would shuffle every
  * distinct key and sort each group in one task. Idempotent insertion
  * also makes the same aggregate the STREAMING state fold — the
  * micro-batch state snapshot is value-identical to the batch sketch
  * of the same rows.
  *
  * Null hashes are skipped (a null key contributes nothing to a
  * distinct count, matching COUNT(DISTINCT) semantics).
  *
  * Output: array<long> of the ≤ k minima sorted ascending — position
  * k (1-based) is the KMV threshold θ; estimates are derived by
  * [[graft.ext.Sketches]].
  */
case class KmvSketchAgg(
    hash: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TreeSet[java.lang.Long]] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): TreeSet[java.lang.Long] =
    new TreeSet[java.lang.Long]()

  private def offer(t: TreeSet[java.lang.Long], v: Long): Unit = {
    if (t.size < k) { t.add(v); () }
    else if (v < t.last()) { if (t.add(v)) { t.pollLast(); () } }
  }

  override def update(t: TreeSet[java.lang.Long], input: InternalRow): TreeSet[java.lang.Long] = {
    val h = hash.eval(input)
    if (h != null) offer(t, h.asInstanceOf[Long])
    t
  }

  override def merge(t: TreeSet[java.lang.Long], other: TreeSet[java.lang.Long]): TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) offer(t, it.next())
    t
  }

  override def eval(t: TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](t.size)
    val it = t.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr) // TreeSet iterates ascending
  }

  override def serialize(t: TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(t.size)
    val it = t.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val t = createAggregationBuffer()
    var n = in.readInt()
    while (n > 0) { t.add(in.readLong()); n -= 1 }
    t
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(hash = newChildren(0))

  override def prettyName: String = "kmv_sketch"
}

object KmvSketchAgg {
  /** Column entry point: bottom-k distinct hash values per group. */
  def kmv(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.expression(hash), k).toAggregateExpression())
}
