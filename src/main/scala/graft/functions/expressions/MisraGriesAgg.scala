package graft.functions.expressions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Misra–Gries update/merge steps, key-type generic — shared by the
  * batch aggregate below (UTF8String keys inside Tungsten rows) and the
  * streaming per-key twin ([[graft.streaming.EventsStream]], plain
  * String keys in `mapGroupsWithState` state). Both return whether the
  * step DECREMENTED (candidates may have been dropped): if no call over
  * a group's whole update/merge tree ever decremented, the final map
  * holds EVERY distinct item with its exact count — the completeness
  * certificate [[graft.text.HeavyHitters.topKExactByGroup]] checks.
  *
  * `retain` defends against callers whose keys alias reused buffers
  * (UTF8String from `Expression.eval`): it is applied exactly when a
  * key is first stored.
  */
private[graft] object MisraGriesCore {

  /** One Misra–Gries update. Returns true iff the decrement-all step
    * ran (the arriving item is absorbed by the decrement).
    */
  def add[K](buf: mutable.HashMap[K, Long], key: K, counters: Int,
             retain: K => K): Boolean =
    buf.get(key) match {
      case Some(c) => buf(key) = c + 1; false
      case None if buf.size < counters => buf(retain(key)) = 1L; false
      case None =>
        val dead = List.newBuilder[K]
        buf.foreach { case (k, c) =>
          if (c == 1L) dead += k else buf(k) = c - 1
        }
        dead.result().foreach(buf.remove)
        true
    }

  /** Mergeable-summaries combine (Agarwal et al. 2012): add counts
    * cell-wise, then subtract the (counters+1)-th largest count from
    * every slot and drop the non-positives — the total decrement over
    * any update/merge tree stays ≤ N/(counters+1). Returns true iff
    * the cut step ran.
    */
  def merge[K](buf: mutable.HashMap[K, Long], other: collection.Map[K, Long],
               counters: Int, retain: K => K): Boolean = {
    other.foreach { case (k, c) =>
      buf.get(k) match {
        case Some(c0) => buf(k) = c0 + c
        case None => buf(retain(k)) = c
      }
    }
    if (buf.size > counters) {
      val sorted = buf.values.toArray
      java.util.Arrays.sort(sorted)
      val cut = sorted(buf.size - counters - 1)
      val dead = List.newBuilder[K]
      buf.foreach { case (k, c) =>
        if (c <= cut) dead += k else buf(k) = c - cut
      }
      dead.result().foreach(buf.remove)
      true
    } else false
  }
}

/** Bounded Misra–Gries heavy-hitter candidate aggregate — the per-GROUP
  * twin of [[graft.text.HeavyHitters.candidates]]' per-partition pass.
  *
  * State is at most `counters` (item → count) slots plus one boolean.
  * `update` is the classic Misra–Gries step (hit: +1; free slot:
  * insert; full: decrement all, dropping zeros); `merge` is the
  * mergeable-summaries combine (Agarwal et al. 2012, "Mergeable
  * summaries"): add counts cell-wise, then subtract the
  * (counters+1)-th largest count from every slot and drop the
  * non-positives — the total decrement over any update/merge tree
  * stays ≤ N/(counters+1), so every item with true count above that
  * bound SURVIVES. The emitted value is a struct
  * `(items: array<string>, evicted: boolean)`: the candidate item set
  * (sorted for a stable plan) plus whether ANY decrement ran for the
  * group. `evicted = false` is a COMPLETENESS certificate — no item
  * was ever dropped, so `items` is the group's exact distinct set
  * ([[graft.text.HeavyHitters.topKExactByGroup]] uses it to certify
  * groups that return fewer than k rows). Residual counts are
  * deliberately NOT emitted — they are lower bounds net of decrements,
  * and the confirm pass recounts candidates exactly.
  *
  * As a `TypedImperativeAggregate` it combines map-side: with
  * `groupBy(group).agg(...)` each partition ships at most `counters`
  * strings per group to the shuffle — a hot group costs
  * counters·partitions rows, never its token count.
  */
case class MisraGriesAgg(child: Expression, counters: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MisraGriesAgg.MgBuffer]
    with UnaryLike[Expression] {
  import MisraGriesAgg.MgBuffer

  require(counters > 0 && counters <= 1000000, s"counters out of range: $counters")

  override def dataType: DataType = StructType(Seq(
    StructField("items", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("evicted", BooleanType, nullable = false)))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MgBuffer =
    new MgBuffer(mutable.HashMap.empty[UTF8String, Long], false)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) {
      // copy-on-retain: eval may return a pointer into a reused row buffer
      buf.evicted |= MisraGriesCore.add(
        buf.counts, v.asInstanceOf[UTF8String], counters, (s: UTF8String) => s.clone())
    }
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    buf.evicted |= other.evicted
    buf.evicted |= MisraGriesCore.merge(
      buf.counts, other.counts, counters, (s: UTF8String) => s.clone())
    buf
  }

  override def eval(buf: MgBuffer): Any = {
    val items = new GenericArrayData(
      buf.counts.keysIterator.toArray.sortInPlace()(
        implicitly[Ordering[UTF8String]]).map(x => x: Any))
    new GenericInternalRow(Array[Any](items, buf.evicted))
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeBoolean(buf.evicted)
    dos.writeInt(buf.counts.size)
    buf.counts.foreach { case (k, c) =>
      val bytes = k.getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
      dos.writeLong(c)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val dis = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    buf.evicted = dis.readBoolean()
    val n = dis.readInt()
    var i = 0
    while (i < n) {
      val len = dis.readInt()
      val arr = new Array[Byte](len)
      dis.readFully(arr)
      buf.counts(UTF8String.fromBytes(arr)) = dis.readLong()
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

  /** Mutable aggregation state: bounded counter map + whether any
    * decrement (update evict or merge cut) has run.
    */
  final class MgBuffer(val counts: mutable.HashMap[UTF8String, Long],
                       var evicted: Boolean)

  /** Aggregate: struct `(items, evicted)` — the ≤ `counters`
    * Misra–Gries candidate items of `item` plus the
    * any-decrement-happened flag (bounded state, map-side combining).
    */
  def misraGries(item: Column, counters: Int): Column =
    toColumn(MisraGriesAgg(toExpr(item), counters).toAggregateExpression())
}
