package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a binary min-heap of (score, id) pairs whose
  * ROOT is the worst element under the total order
  * (score DESC, id ASC) — so insertion into a full heap is one compare
  * against the root, and the heap never holds more than k pairs.
  */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  /** true when (s1, i1) is WORSE than (s2, i2): lower score, or equal
    * score with the larger id (ties prefer the smaller id). */
  @inline private def worse(s1: Double, i1: Long, s2: Double,
      i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i
      if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) return
      swap(i, w); i = w
    }
  }

  def insert(score: Double, id: Long): Unit = {
    if (n < k) {
      scores(n) = score; ids(n) = id; n += 1; siftUp(n - 1)
    } else if (k > 0 && worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id; siftDown()
    }
  }

  /** Pairs sorted best-first: (score DESC, id ASC). */
  def sorted: Array[(Double, Long)] = {
    val out = Array.tabulate(n)(i => (scores(i), ids(i)))
    out.sortInPlace()(Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse,
      Ordering.Long))
    out
  }
}

/** Native bounded top-k aggregate: `topk_agg(score, id, k)` returns the
  * k best (score, id) pairs per group as `array<struct<score, id>>`,
  * sorted by (score DESC, id ASC).
  *
  * The declarative per-group top-k
  * (`row_number().over(partitionBy(g).orderBy(...)) <= k`) shuffles and
  * SORTS every input row of every group. This aggregate's state is k
  * pairs — partial aggregation runs map-side like any sketch
  * (`ObjectHashAggregateExec`), so the exchange carries at most k pairs
  * per (group × partition) instead of the whole scored input, and
  * nothing ever sorts more than k elements. That is the difference
  * between a kNN join that moves |corpus| × |queries| rows and one that
  * moves k × |queries| × |partitions| — the enabling shape for batch
  * retrieval over a 100 TB corpus.
  *
  * Determinism: the (score DESC, id ASC) order is total, so the
  * retained set and its order are independent of partitioning and
  * merge order. Null scores/ids are skipped.
  */
case class TopKAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer]
  with BinaryLike[Expression] {

  require(k > 0, "topk_agg requires k > 0")

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null) {
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b.n) { a.insert(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    })

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): TopKAgg = copy(left = l, right = r)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_agg"
}

object TopKAggregate {
  /** Bounded per-group top-k: `array<struct<score, id>>` of the k best
    * pairs, (score DESC, id ASC). `score` must be DoubleType and `id`
    * LongType (cast beforehand). */
  def topk(score: Column, id: Column, k: Int): Column =
    GraftShims.column(
      TopKAgg(GraftShims.expression(score), GraftShims.expression(id), k)
        .toAggregateExpression())
}
