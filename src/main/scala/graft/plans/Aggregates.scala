package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bottom-k-by-md5 sampling aggregate — the partial-aggregating,
  * O(k)-state form of q125's exact-quota stratified sample: keeping the
  * k values with the SMALLEST md5(value) is a deterministic uniform
  * sample every engine reproduces (md5 is engine-portable; q125's rank
  * window proved the ordering), but as a TypedImperativeAggregate the
  * per-group state is a k-entry heap that combines MAP-SIDE and merges
  * associatively — no per-stratum sort shuffle, no window. At 100 TB
  * the window form sorts every stratum; this form ships k rows per
  * (mapper, group). Spec-asserted value-identical to the window form
  * (GovernanceSpec); the DuckDB oracle states the rank-window
  * definition directly.
  *
  * State is a sorted set of (md5hex, value) bounded at k; ties inside
  * one md5 value (collision-improbable) break on the raw value, so the
  * result is a total-order prefix — merge order cannot matter.
  */
case class BottomKMd5(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.TreeSet[(String, String)]] {

  require(k > 0, "bottomk_md5 needs k > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bottomk_md5 needs a string column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): scala.collection.mutable.TreeSet[(String, String)] =
    scala.collection.mutable.TreeSet.empty[(String, String)]

  private def md5Hex(s: String): String = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < 16) { sb.append(f"${d(i) & 0xff}%02x"); i += 1 }
    sb.toString
  }

  override def update(buf: scala.collection.mutable.TreeSet[(String, String)],
                      input: InternalRow): scala.collection.mutable.TreeSet[(String, String)] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.add((md5Hex(s), s))
      if (buf.size > k) buf.remove(buf.last)
    }
    buf
  }

  override def merge(buf: scala.collection.mutable.TreeSet[(String, String)],
                     other: scala.collection.mutable.TreeSet[(String, String)]): scala.collection.mutable.TreeSet[(String, String)] = {
    other.foreach { e =>
      buf.add(e)
      if (buf.size > k) buf.remove(buf.last)
    }
    buf
  }

  override def eval(buf: scala.collection.mutable.TreeSet[(String, String)]): Any =
    new GenericArrayData(buf.toArray.map(e => UTF8String.fromString(e._2): AnyRef))

  override def serialize(buf: scala.collection.mutable.TreeSet[(String, String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (h, v) => out.writeUTF(h); out.writeUTF(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.TreeSet[(String, String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((in.readUTF(), in.readUTF())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKMd5 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKMd5 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BottomKMd5 =
    copy(child = newChildren.head)
}

/** SpaceSaving heavy-hitters sketch (Metwally et al. 2005) as a
  * mergeable TypedImperativeAggregate — the streaming/distributed
  * top-k-frequent operator: O(k) state per partial, map-side combine,
  * associative merge (Agarwal et al. 2012, "Mergeable Summaries").
  *
  * State: k counters (item → (est, err)) with the classic invariants,
  * preserved by BOTH update and merge under ANY merge order:
  *   est_i ≥ true_i                       (never undercounts)
  *   est_i − err_i ≤ true_i               (err brackets the overcount)
  *   err_i ≤ n_seen / k                   (Σ per-stream mins; each ≤ n/k)
  *   any item with true > n/k is tracked  (coverage)
  * Merge: items absent from one side contribute that side's min-est as
  * both est and err (the side's true count is provably ≤ its min), the
  * union is truncated to the k largest ests (ties on item asc). The
  * PER-ITEM ests are merge-order-dependent (Spark task order varies),
  * so oracle-gated queries must emit only the GUARANTEED facts above
  * (booleans/brackets), never raw est values — q267 does exactly that.
  *
  * At 100 TB: the exact form (groupBy token + TakeOrdered) shuffles the
  * full key universe; this ships k·(mappers) rows. The audit query runs
  * both and certifies the sketch against the exact answer.
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingTopK.Buf] {

  require(k > 0, "spacesaving needs k > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"spacesaving needs a string column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): SpaceSavingTopK.Buf = new SpaceSavingTopK.Buf(k)

  override def update(buf: SpaceSavingTopK.Buf, input: InternalRow): SpaceSavingTopK.Buf = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: SpaceSavingTopK.Buf, other: SpaceSavingTopK.Buf): SpaceSavingTopK.Buf =
    buf.mergeIn(other)

  override def eval(buf: SpaceSavingTopK.Buf): Any = {
    // deterministic ARRAY order (est desc, item asc); the est VALUES
    // themselves remain merge-order-dependent — see class doc
    val rows = buf.entries.toArray
      .sortBy { case (item, (est, _)) => (-est, item) }
      .map { case (item, (est, err)) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](UTF8String.fromString(item), est, err)): AnyRef
      }
    new GenericArrayData(rows)
  }

  override def serialize(buf: SpaceSavingTopK.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val es = buf.entries.toArray // entries is an Iterator — materialize
    out.writeInt(es.length)     // before sizing, or foreach sees it spent
    es.foreach { case (item, (est, err)) =>
      out.writeUTF(item); out.writeLong(est); out.writeLong(err)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingTopK.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.put(in.readUTF(), in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = newChildren.head)
}

object SpaceSavingTopK {
  /** k-counter state: hash map for O(1) hit, ordered set for O(log k)
    * min-eviction (a linear min scan would cost n·k per partition). */
  final class Buf(val k: Int) {
    private val map = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
    private val order = scala.collection.mutable.TreeSet.empty[(Long, String)]

    def entries: Iterator[(String, (Long, Long))] = map.iterator
    private def minEst: Long = if (map.size < k) 0L else order.head._1

    /** Raw insert (deserialize / rebuild); assumes ≤ k distinct items. */
    def put(item: String, est: Long, err: Long): Unit = {
      map.put(item, (est, err))
      order.add((est, item))
    }

    /** Single-element update: the classic SpaceSaving step. */
    def offer(item: String): Unit = map.get(item) match {
      case Some((est, err)) =>
        order.remove((est, item))
        map.put(item, (est + 1, err))
        order.add((est + 1, item))
      case None if map.size < k =>
        put(item, 1L, 0L)
      case None =>
        val (mEst, mItem) = order.head
        order.remove((mEst, mItem))
        map.remove(mItem)
        put(item, mEst + 1, mEst)
    }

    /** Associative merge preserving all four invariants (class doc). */
    def mergeIn(other: Buf): Buf = {
      val mA = minEst
      val mB = other.minEst
      val union = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
      map.foreach { case (item, (est, err)) =>
        val (bEst, bErr) = other.map.getOrElse(item, (mB, mB))
        union.put(item, (est + bEst, err + bErr))
      }
      other.map.foreach { case (item, (bEst, bErr)) =>
        if (!map.contains(item)) union.put(item, (bEst + mA, bErr + mA))
      }
      val kept = union.toArray.sortBy { case (item, (est, _)) => (-est, item) }.take(k)
      map.clear(); order.clear()
      kept.foreach { case (item, (est, err)) => put(item, est, err) }
      this
    }
  }
}
