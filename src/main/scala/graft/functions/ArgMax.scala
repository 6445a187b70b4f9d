package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable last-writer-wins buffer: the value seen at the largest
  * ordinal so far.
  */
final class ArgMaxState(var set: Boolean, var ord: Long, var value: UTF8String)

/** `arg_max_str(value, ord)`: the string value at the maximum long
  * ordinal — `max_by(value, ord)` with a MUTABLE buffer.
  *
  * Spark's built-in `max_by` is a declarative aggregate over an
  * immutable (value, ord) buffer pair, which disqualifies it from
  * hash aggregation: the planner falls back to SortAggregate and the
  * partial phase SORTS the full partition by the grouping key before
  * aggregating — the dominant cost of the latest-state family of CDC
  * queries. This typed imperative form runs as ObjectHashAggregate:
  * map-side partial compaction in a hash table, no partition sort,
  * and only (flag, ord, value) triples cross the shuffle.
  *
  * Ties (equal ordinals) keep the first value encountered, matching
  * `max_by`'s indeterminate-tie contract; rows with a null ordinal
  * are ignored, as `max_by` does. A null VALUE at the winning ordinal
  * is preserved as a null result.
  */
case class ArgMaxStrAgg(
    valueExpr: Expression,
    ordExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArgMaxState] {

  override def children: Seq[Expression] = Seq(valueExpr, ordExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType

  // fail at analysis like the built-in aggregates do — without this a
  // non-string value / non-long ordinal passes the analyzer and dies
  // at execution with a ClassCastException
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (valueExpr.dataType == StringType && ordExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"arg_max_str requires (STRING, BIGINT) arguments, got " +
        s"(${valueExpr.dataType.sql}, ${ordExpr.dataType.sql})")
  }

  override def createAggregationBuffer(): ArgMaxState =
    new ArgMaxState(false, Long.MinValue, null)

  override def update(buf: ArgMaxState, input: InternalRow): ArgMaxState = {
    val o = ordExpr.eval(input)
    if (o != null) {
      val ord = o.asInstanceOf[Long]
      if (!buf.set || ord > buf.ord) {
        val v = valueExpr.eval(input)
        buf.set = true
        buf.ord = ord
        // clone: the evaluated UTF8String aliases the reused input row
        buf.value = if (v == null) null else v.asInstanceOf[UTF8String].clone()
      }
    }
    buf
  }

  override def merge(buf: ArgMaxState, other: ArgMaxState): ArgMaxState = {
    if (other.set && (!buf.set || other.ord > buf.ord)) {
      buf.set = true
      buf.ord = other.ord
      buf.value = other.value
    }
    buf
  }

  override def eval(buf: ArgMaxState): Any = if (buf.set) buf.value else null

  override def serialize(buf: ArgMaxState): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBoolean(buf.set)
    out.writeLong(buf.ord)
    out.writeBoolean(buf.value != null)
    if (buf.value != null) {
      val b = buf.value.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArgMaxState = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val set = in.readBoolean()
    val ord = in.readLong()
    val value =
      if (in.readBoolean()) {
        val b = new Array[Byte](in.readInt())
        in.readFully(b)
        UTF8String.fromBytes(b)
      } else null
    new ArgMaxState(set, ord, value)
  }

  override def withNewMutableAggBufferOffset(offset: Int): ArgMaxStrAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ArgMaxStrAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ArgMaxStrAgg =
    copy(valueExpr = c(0), ordExpr = c(1))
  override def prettyName: String = "arg_max_str"
}

object ArgMaxStrAgg {
  /** Column API: the string `value` at the maximum long `ord`. */
  def arg_max_str(value: Column, ord: Column): Column =
    GraftBridge.column(
      ArgMaxStrAgg(GraftBridge.expression(value),
        GraftBridge.expression(ord)).toAggregateExpression())
}
