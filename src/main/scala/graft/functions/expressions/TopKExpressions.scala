package graft.functions.expressions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded top-k aggregate — the map-side-combining primitive behind
  * skew-safe per-group curation.
  *
  * `collect_list` + sort + slice computes a group's top k but its
  * partial state is the WHOLE group (nothing combines map-side), and a
  * rank window shuffles every row of every group to one task each. This
  * aggregate's state is a k-bounded heap of the SMALLEST structs seen
  * (by the struct's natural lexicographic order), so:
  *
  *   - partial aggregation truncates on the map side — each partition
  *     contributes at most k rows per group to the shuffle;
  *   - merge is heap-union-truncate (associative/commutative);
  *   - a hot group costs k·partitions shuffle rows, never its own size.
  *
  * Callers encode "best first" in the struct's leading fields (negate a
  * score for descending) and carry the row payload in the trailing
  * field; [[graft.operators.Sampling.topKPerGroupSkewSafe]] is the
  * DataFrame-level wrapper.
  */
case class TopKStructsAgg(child: Expression, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]]
    with UnaryLike[Expression] {

  require(k > 0 && k <= 1000000, s"k out of range: $k")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]
  @transient private lazy val ordering: Ordering[InternalRow] =
    TypeUtils.getInterpretedOrdering(child.dataType)
      .asInstanceOf[Ordering[InternalRow]]
  @transient private lazy val toUnsafe: UnsafeProjection =
    UnsafeProjection.create(structType)

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    // max-heap of the current k smallest: the head is the eviction victim
    mutable.PriorityQueue.empty[InternalRow](ordering)

  override def update(buf: mutable.PriorityQueue[InternalRow],
                      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[InternalRow])
    buf
  }

  override def merge(buf: mutable.PriorityQueue[InternalRow],
                     other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    other.foreach(r => offer(buf, r, copied = true))
    buf
  }

  private def offer(buf: mutable.PriorityQueue[InternalRow], r: InternalRow,
                    copied: Boolean = false): Unit = {
    if (buf.size < k) buf.enqueue(if (copied) r else r.copy())
    else if (ordering.lt(r, buf.head)) {
      buf.dequeue()
      buf.enqueue(if (copied) r else r.copy())
    }
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(buf.toArray.sorted(ordering).map(x => x: Any))

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(buf.size)
    val writeBuffer = new Array[Byte](4096)
    buf.foreach { r =>
      val u = toUnsafe(r)
      dos.writeInt(u.getSizeInBytes)
      u.writeToStream(dos, writeBuffer)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val dis = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = dis.readInt()
    var i = 0
    while (i < n) {
      val len = dis.readInt()
      val arr = new Array[Byte](len)
      dis.readFully(arr)
      val row = new UnsafeRow(structType.length)
      row.pointTo(arr, len)
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKStructsAgg =
    copy(child = newChild)
  override def prettyName: String = "topk_structs"
}

object TopKExpressions {
  import org.apache.spark.sql.graftbridge.Bridge._

  /** Aggregate: ascending top-`k` array of `item` structs (k-bounded
    * heap state, map-side combining).
    */
  def topKStructs(item: Column, k: Int): Column =
    toColumn(TopKStructsAgg(toExpr(item), k).toAggregateExpression())
}
