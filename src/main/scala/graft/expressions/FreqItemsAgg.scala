package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items aggregate (Misra & Gries 1982; mergeable
  * form per Agarwal et al., "Mergeable Summaries", PODS 2012): per
  * group, maintain at most `capacity` (item → count) entries; when a
  * new item arrives at a full summary, decrement every counter and
  * drop the zeros. Each surviving count UNDERESTIMATES the true count
  * by at most n/(capacity+1) — the deterministic frequent-items
  * guarantee (every item with true count > n/(capacity+1) is present).
  *
  * The scale story vs [[graft.ext.Sketches.cmsHeavyHitters]]: CMS
  * scores a candidate set someone must PROPOSE (a sample at 100 TB);
  * Misra–Gries maintains its own candidates, so the per-key top-items
  * question ("top tokens per source", "top pages per domain") needs no
  * candidate pass. And vs the exact `groupBy(key, item)`: the exact
  * form shuffles the full (key, item) cardinality; this aggregate
  * runs under ObjectHashAggregate with partial aggregation, so the
  * shuffle carries ≤ capacity entries per key per map task, whatever
  * the item cardinality.
  *
  * Merge (partial summaries A, B): sum counts per item, then if more
  * than `capacity` entries survive, subtract the (capacity+1)-largest
  * count from every entry and drop the non-positives — the PODS-2012
  * merge, which preserves the error bound. With capacity ≥ per-group
  * distinct items the summary never evicts and the result is EXACT
  * counts independent of row/merge order (how the driver oracle
  * checks it); under eviction, counts are order-dependent lower
  * bounds, which the spec checks against the MG bound instead.
  *
  * Output: array<struct<item string, cnt long>> sorted (cnt DESC,
  * item ASC), trimmed to the top `emitK`.
  */
case class FreqItemsAgg(
    item: Expression, capacity: Int, emitK: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, Long]] {

  require(capacity > 0 && emitK > 0, s"capacity/emitK must be positive")

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, Long] =
    new java.util.HashMap[UTF8String, Long](capacity * 2)

  private def add(m: java.util.HashMap[UTF8String, Long], it: UTF8String,
      n: Long): Unit = {
    val cur = m.get(it)
    if (cur != 0L || m.containsKey(it)) m.put(it, cur + n)
    else if (m.size < capacity) m.put(it.clone(), n)
    else {
      // MG decrement: every counter loses min(n, smallest counter that
      // reaches zero first is dropped). Classic per-row form is n=1;
      // for generality decrement by the incoming weight.
      val itr = m.entrySet().iterator()
      var minC = Long.MaxValue
      while (itr.hasNext) { val c = itr.next().getValue; if (c < minC) minC = c }
      val dec = math.min(n, minC)
      val it2 = m.entrySet().iterator()
      while (it2.hasNext) {
        val e = it2.next()
        val nv = e.getValue - dec
        if (nv <= 0) it2.remove() else e.setValue(nv)
      }
      if (n > dec) add(m, it, n - dec) // room freed unless still full
    }
  }

  override def update(m: java.util.HashMap[UTF8String, Long],
      input: InternalRow): java.util.HashMap[UTF8String, Long] = {
    val v = item.eval(input)
    if (v != null) add(m, v.asInstanceOf[UTF8String], 1L)
    m
  }

  override def merge(m: java.util.HashMap[UTF8String, Long],
      other: java.util.HashMap[UTF8String, Long]): java.util.HashMap[UTF8String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = m.get(e.getKey)
      if (cur != 0L || m.containsKey(e.getKey)) m.put(e.getKey, cur + e.getValue)
      else m.put(e.getKey, e.getValue)
    }
    if (m.size > capacity) {
      // subtract the (capacity+1)-th largest count, drop non-positives
      val counts = new Array[Long](m.size)
      var i = 0
      val it2 = m.values().iterator()
      while (it2.hasNext) { counts(i) = it2.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(m.size - capacity - 1)
      val it3 = m.entrySet().iterator()
      while (it3.hasNext) {
        val e = it3.next()
        val nv = e.getValue - cut
        if (nv <= 0) it3.remove() else e.setValue(nv)
      }
    }
    m
  }

  override def eval(m: java.util.HashMap[UTF8String, Long]): Any = {
    val entries = new Array[(UTF8String, Long)](m.size)
    var i = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortWith { case ((ia, ca), (ib, cb)) =>
      if (ca != cb) ca > cb else ia.compareTo(ib) < 0
    }
    new GenericArrayData(sorted.take(emitK).map { case (it0, c) =>
      InternalRow(it0, c) })
  }

  override def serialize(m: java.util.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(m.size)
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val m = createAggregationBuffer()
    var n = in.readInt()
    while (n > 0) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.put(UTF8String.fromBytes(b), in.readLong())
      n -= 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsAgg =
    copy(item = newChildren(0))

  override def prettyName: String = "freq_items_mg"
}

object FreqItemsAgg {
  /** Column entry point: Misra–Gries top items per group. */
  def freqItems(item: Column, capacity: Int, emitK: Int): Column =
    ColumnBridge.column(FreqItemsAgg(
      ColumnBridge.expression(item), capacity, emitK).toAggregateExpression())
}
