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
