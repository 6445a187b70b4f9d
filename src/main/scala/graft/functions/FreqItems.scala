package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a typed imperative aggregate:
  * per-partition buffers of at most `capacity` counters, merged
  * associatively, finalized to the top-`k` (count desc, token asc).
  *
  * At 100 TB only fixed-size buffers cross the shuffle — the
  * frequent-items analogue of HLL distinct counting. When `capacity`
  * exceeds the true distinct count the sketch degrades gracefully to
  * exact counting (which is what the DuckDB oracle checks at test
  * scale); undercapacity it keeps the standard MG guarantee
  * (undercount ≤ N/capacity).
  */
case class FreqItemsAgg(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  private def add(buf: mutable.HashMap[UTF8String, Long], key: UTF8String,
                  n: Long): Unit = {
    buf.get(key) match {
      case Some(c) => buf.update(key, c + n)
      case None =>
        if (buf.size < capacity) buf.update(key.clone(), n)
        else {
          // Misra-Gries decrement step: charge every counter by the
          // min of n and the smallest counter, evicting zeros
          val dec = math.min(n, buf.valuesIterator.min)
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.mapValuesInPlace((_, c) => c - dec)
          buf.foreach { case (t, c) => if (c <= 0) dead += t }
          dead.foreach(buf.remove)
          if (n > dec && buf.size < capacity) buf.update(key.clone(), n - dec)
        }
    }
  }

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String], 1L)
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
                     other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (t, c) => add(buf, t, c) }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val top = buf.toSeq
      .sortBy { case (t, c) => (-c, t) }
      .take(k)
      .map { case (t, c) => InternalRow(t, c) }
    new GenericArrayData(top.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = c.head)
  override def prettyName: String = "freq_items_mg"
}

object FreqItemsAgg {
  /** Column API: top-k frequent values of a string column. */
  def freq_items(c: Column, k: Int, capacity: Int = 4096): Column =
    GraftBridge.column(
      FreqItemsAgg(GraftBridge.expression(c), k, capacity).toAggregateExpression())
}
