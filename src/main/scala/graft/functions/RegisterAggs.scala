package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType}

/** PACKED HLL register state: one m-byte buffer per group, byte j = the
  * rho-maximum of bucket j (0 = bucket never hit — exactly the absent
  * row of the [[Sketches.hllRegisters]] row form, so the two
  * representations are interconvertible without loss and produce
  * identical estimates).
  *
  * Why a packed form exists at all: iterated register MERGES (HyperBall's
  * B_{r+1}(v) = max-merge over neighbors) ship each node's whole register
  * state along every edge. In the row form that is one row PER
  * (edge, non-zero bucket) — at ball sizes in the hundreds, hundreds of
  * rows per edge; packed, it is ONE m-byte row per edge, and the
  * per-group merge is a fixed-size byte-wise max that map-side combines.
  * Rho values are tiny (≤ [[Sketches.RhoCap]] < 127), so a byte per
  * bucket is exact.
  *
  * Both aggregates are deterministic and commutative (byte-wise max), so
  * partial aggregation and any merge order produce the same buffer.
  */
private[graft] abstract class PackedRegisterAgg
    extends TypedImperativeAggregate[Array[Byte]] {
  def m: Int
  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)
  override def merge(b: Array[Byte], o: Array[Byte]): Array[Byte] = {
    // invariant: every buffer in one aggregation was produced under the
    // same m. A caller mixing register widths (e.g. joining two register
    // tables built with different m) would otherwise throw an opaque
    // ArrayIndexOutOfBounds or silently ignore tail bytes.
    require(b.length == m && o.length == m,
      s"packed-register width mismatch: buffers of ${b.length}/${o.length} " +
        s"bytes merged under m=$m — all inputs must share one register width")
    var i = 0
    while (i < m) { if (o(i) > b(i)) b(i) = o(i); i += 1 }
    b
  }
  override def eval(buffer: Array[Byte]): Any = buffer
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storage: Array[Byte]): Array[Byte] = storage
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** Aggregate (bucket, rho) coordinate rows (from
  * [[Sketches.registerCoords]]) into one packed m-byte register buffer
  * per group — the packed equivalent of hllRegisters' per-bucket max.
  */
private[graft] case class PackRegisters(bucket: Expression, rho: Expression,
    m: Int, mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends PackedRegisterAgg {
  override def children: Seq[Expression] = Seq(bucket, rho)
  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val b = bucket.eval(input)
    val r = rho.eval(input)
    if (b != null && r != null) {
      val bi = b.asInstanceOf[Number].intValue()
      val ri = math.min(r.asInstanceOf[Number].longValue(), 127L).toByte
      if (bi >= 0 && bi < m && ri > buffer(bi)) buffer(bi) = ri
    }
    buffer
  }
  override def withNewMutableAggBufferOffset(o: Int): PackRegisters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): PackRegisters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): PackRegisters =
    copy(bucket = cs(0), rho = cs(1))
  override def prettyName: String = "pack_registers"
}

/** Byte-wise max of already-packed m-byte register buffers — the merge
  * round of an iterated register computation (HyperBall), and the packed
  * equivalent of [[Sketches.hllMerge]]'s per-bucket max.
  */
private[graft] case class MergePackedRegisters(child: Expression, m: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends PackedRegisterAgg {
  override def children: Seq[Expression] = Seq(child)
  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val o = child.eval(input)
    if (o != null) merge(buffer, o.asInstanceOf[Array[Byte]])
    else buffer
  }
  override def withNewMutableAggBufferOffset(o: Int): MergePackedRegisters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MergePackedRegisters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): MergePackedRegisters =
    copy(child = cs(0))
  override def prettyName: String = "merge_packed_registers"
}
