package graft.functions.expressions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded Misra–Gries heavy-hitter candidate aggregate — the per-GROUP
  * twin of [[graft.text.HeavyHitters.candidates]]' per-partition pass.
  *
  * State is at most `counters` (item → count) slots. `update` is the
  * classic Misra–Gries step (hit: +1; free slot: insert; full: decrement
  * all, dropping zeros); `merge` is the mergeable-summaries combine
  * (Agarwal et al. 2012, "Mergeable summaries"): add counts cell-wise,
  * then subtract the (counters+1)-th largest count from every slot and
  * drop the non-positives — the total decrement over any update/merge
  * tree stays ≤ N/(counters+1), so every item with true count above
  * that bound SURVIVES. The emitted value is the candidate item set
  * (sorted for a stable plan); residual counts are deliberately NOT
  * emitted — they are lower bounds net of decrements, and the confirm
  * pass recounts candidates exactly.
  *
  * As a `TypedImperativeAggregate` it combines map-side: with
  * `groupBy(group).agg(...)` each partition ships at most `counters`
  * strings per group to the shuffle — a hot group costs
  * counters·partitions rows, never its token count.
  */
case class MisraGriesAgg(child: Expression, counters: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
    with UnaryLike[Expression] {

  require(counters > 0 && counters <= 1000000, s"counters out of range: $counters")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty[UTF8String, Long]

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      buf.get(s) match {
        case Some(c) => buf(s) = c + 1
        // copy: eval may return a pointer into a reused row buffer
        case None if buf.size < counters => buf(s.clone()) = 1L
        case None =>
          // decrement-all; items reaching zero free their slot (the
          // arriving item is the one absorbed by the decrement)
          val dead = List.newBuilder[UTF8String]
          buf.foreach { case (k, c) =>
            if (c == 1L) dead += k else buf(k) = c - 1
          }
          dead.result().foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
                     other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, c) =>
      buf.get(k) match {
        case Some(c0) => buf(k) = c0 + c
        case None => buf(k.clone()) = c
      }
    }
    if (buf.size > counters) {
      // subtract the (counters+1)-th largest count from every slot:
      // at most `counters` survive (those strictly above the cut)
      val sorted = buf.values.toArray
      java.util.Arrays.sort(sorted)
      val cut = sorted(buf.size - counters - 1)
      val dead = List.newBuilder[UTF8String]
      buf.foreach { case (k, c) =>
        if (c <= cut) dead += k else buf(k) = c - cut
      }
      dead.result().foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sortInPlace()(
        implicitly[Ordering[UTF8String]]).map(x => x: Any))

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val bytes = k.getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
      dos.writeLong(c)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val dis = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = dis.readInt()
    var i = 0
    while (i < n) {
      val len = dis.readInt()
      val arr = new Array[Byte](len)
      dis.readFully(arr)
      buf(UTF8String.fromBytes(arr)) = dis.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
  override def prettyName: String = "misra_gries"
}

object MisraGriesAgg {
  import org.apache.spark.sql.graftbridge.Bridge._

  /** Aggregate: the ≤ `counters` Misra–Gries candidate items of `item`
    * (bounded state, map-side combining).
    */
  def misraGries(item: Column, counters: Int): Column =
    toColumn(MisraGriesAgg(toExpr(item), counters).toAggregateExpression())
}
