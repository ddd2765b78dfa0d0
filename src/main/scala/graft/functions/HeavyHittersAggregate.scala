package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items state: at most `m` counters.
  *
  * Stream update: a present item increments; a new item takes a free
  * counter; with all counters taken, EVERY counter decrements (zeros
  * evicted) — the classic one-pass summary. Merge (for partial
  * aggregation): sum counters pairwise, and when more than `m` remain,
  * subtract the (m+1)-th largest count from all and evict ≤ 0 — the
  * standard mergeable form (Agarwal et al.), closed under merging with
  * the same guarantee.
  *
  * Maintenance is LAZY so a decrement-all is O(1), not O(m): counters
  * store `effective + debt` where `debt` is the number of global
  * decrements so far; a decrement-all is `debt += 1`. An entry is dead
  * when `stored <= debt`. Dead entries are found without scanning via a
  * min-heap keyed by the stored count at push time (a lower bound on
  * the entry's current stored count, i.e. its earliest possible death
  * debt): after each debt bump, pop while `top <= debt`, evicting
  * entries that are truly dead and re-pushing (with their current
  * stored count) those that were incremented since pushed. Increments
  * never touch the heap, each insert pushes once, and each re-push is
  * paid for by an increment — amortized O(1) per item with ≤ m live
  * heap entries. The map/heap state after every purge is IDENTICAL to
  * the eager algorithm's, so estimates are bit-for-bit unchanged.
  *
  * Guarantee (what makes this usable as a CANDIDATE stage): any item
  * whose true frequency exceeds n/(m+1) of the n processed items is
  * guaranteed present, and estimates undercount by at most n/(m+1).
  * Estimates are processing-order-DEPENDENT (like any MG sketch), so
  * deterministic pipelines treat the output as a candidate set and
  * re-count candidates exactly — see PipelineQueries.heavyHitters.
  */
final class HeavyHittersBuffer(val m: Int) {
  // stored = effective + debt; invariant outside purge(): stored > debt
  val counts: mutable.HashMap[UTF8String, Long] = mutable.HashMap.empty
  private var debt: Long = 0L
  private val heap = new java.util.PriorityQueue[(Long, UTF8String)](
    math.max(m, 8), Ordering.by[(Long, UTF8String), Long](_._1))

  def insert(item: UTF8String): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1)
      case None if counts.size < m =>
        val key = item.clone()
        counts.update(key, debt + 1)
        heap.add((debt + 1, key))
      case None =>
        debt += 1
        purge()
    }
  }

  /** Evict every entry whose stored count fell to `debt` (effective 0).
    * Heap keys are lower bounds on current stored counts, so popping
    * while `top <= debt` visits every dead entry; live-but-stale
    * entries re-enter with their current stored count (still exactly
    * one heap entry per live key). */
  private def purge(): Unit = {
    while (!heap.isEmpty && heap.peek()._1 <= debt) {
      val (_, k) = heap.poll()
      counts.get(k) match {
        case Some(a) if a <= debt => counts.remove(k)
        case Some(a) => heap.add((a, k))
        case None => ()
      }
    }
  }

  /** Current effective (debt-subtracted) counts; all >= 1. */
  def effective: Iterator[(UTF8String, Long)] =
    counts.iterator.map { case (k, c) => (k, c - debt) }

  /** Install a deserialized (effective-count) entry. */
  def load(k: UTF8String, c: Long): Unit = {
    counts.update(k, c)
    heap.add((c, k))
  }

  /** Rewrite state so stored counts are effective ones (debt = 0). */
  private def normalize(): Unit = {
    if (debt != 0L) {
      counts.mapValuesInPlace((_, c) => c - debt)
      debt = 0L
    }
    heap.clear()
    counts.foreach { case (k, c) => heap.add((c, k)) }
  }

  def mergeIn(other: HeavyHittersBuffer): Unit = {
    normalize()
    other.effective.foreach { case (k, c) =>
      counts.update(k, counts.getOrElse(k, 0L) + c)
    }
    if (counts.size > m) {
      // subtract the (m+1)-th largest count from everything
      val sorted = counts.values.toArray
      java.util.Arrays.sort(sorted)
      val cut = sorted(sorted.length - (m + 1)) // (m+1)-th largest
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      counts.mapValuesInPlace((_, c) => c - cut)
      counts.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(counts.remove)
    }
    normalize()
  }
}

/** `heavyhitters_agg(item, m)` → `array<struct<item string, est bigint>>`
  * of the Misra-Gries summary, sorted (est DESC, item ASC). State is at
  * most `m` counters regardless of input size or cardinality — partial
  * aggregation runs map-side (`ObjectHashAggregateExec`), each exchange
  * carries ≤ m pairs per partition, and no stage ever holds the full
  * vocabulary. The bounded-memory answer to "top tokens over 100 TB"
  * where an exact groupBy would shuffle the whole token stream. */
case class HeavyHittersAgg(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHittersBuffer]
  with UnaryLike[Expression] {

  require(m > 0, "heavyhitters_agg requires m > 0")

  override def createAggregationBuffer(): HeavyHittersBuffer =
    new HeavyHittersBuffer(m)

  override def update(buf: HeavyHittersBuffer,
      input: InternalRow): HeavyHittersBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(a: HeavyHittersBuffer,
      b: HeavyHittersBuffer): HeavyHittersBuffer = {
    a.mergeIn(b); a
  }

  override def eval(buf: HeavyHittersBuffer): Any = {
    val sorted = buf.effective.toArray
      .sortBy { case (k, c) => (-c, k.toString) }
    new GenericArrayData(sorted.map { case (k, c) =>
      new GenericInternalRow(Array[Any](k, c))
    })
  }

  override def serialize(buf: HeavyHittersBuffer): Array[Byte] = {
    val entries = buf.effective.toArray
    val byteArrays = entries.map(_._1.getBytes)
    val size = 4 + byteArrays.map(_.length + 12).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(byteArrays(i).length)
      bb.put(byteArrays(i))
      bb.putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): HeavyHittersBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new HeavyHittersBuffer(m)
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.load(UTF8String.fromBytes(arr), bb.getLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): HeavyHittersAgg =
    copy(child = c)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "heavyhitters_agg"
}

object HeavyHittersAggregate {
  /** Misra-Gries summary of `item` with at most `m` counters:
    * `array<struct<item, est>>`, (est DESC, item ASC). Estimates are
    * order-dependent lower bounds; the GUARANTEED-present set is
    * {items with true frequency > n/(m+1)}. */
  def heavyHitters(item: Column, m: Int): Column =
    GraftShims.column(
      HeavyHittersAgg(GraftShims.expression(item), m)
        .toAggregateExpression())
}
