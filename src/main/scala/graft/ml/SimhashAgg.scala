package graft.ml

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit SimHash as ONE native aggregate over (hash, weight) rows.
  *
  * The SQL encoding (ml.Similarity.simhash) carries 64 separate
  * `sum(when(bit, w).otherwise(-w))` buffers per group — 64 agg
  * expressions, 64 buffer slots, 64 conditional branches per input row.
  * This aggregate keeps one long[64] vote vector: update is a 64-step
  * shift loop over the input hash, merge is vector addition, eval packs
  * sign bits. Same per-group state size, but one buffer slot, one
  * expression, and a tight primitive loop — and at 100 TB the narrower
  * aggregation schema matters for the (doc_id)-shuffle's row width.
  * SimhashSpec proves it equal to the 64-column encoding on the corpus.
  */
case class SimhashAgg(
    left: Expression,  // 64-bit token hash
    right: Expression, // weight (term frequency)
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  override def prettyName: String = "simhash_agg"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val h = left.eval(input)
    val w = right.eval(input)
    if (h != null && w != null) {
      val hv = h.asInstanceOf[Long]
      val wv = w.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        if (((hv >>> i) & 1L) == 1L) b(i) += wv else b(i) -= wv
        i += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = {
    var sig = 0L
    var i = 0
    while (i < 64) { if (b(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 8)
    var i = 0
    while (i < 64) { bb.putLong(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new Array[Long](64)
    var i = 0
    while (i < 64) { b(i) = bb.getLong; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimhashAgg =
    copy(left = newLeft, right = newRight)
}

object SimhashFunctions {
  /** Column API: 64-bit simhash of (hash, weight) rows per group. */
  def simhash_agg(hash: Column, weight: Column): Column =
    GraftSqlBridge.column(SimhashAgg(
      GraftSqlBridge.expression(hash),
      GraftSqlBridge.expression(weight)).toAggregateExpression())
}
