package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature aggregate: folds per-shingle 64-bit hashes into the
  * element-wise minima of `numHashes` permutations `(a_i·h + b_i) mod P`
  * (Broder '97).
  *
  * Replaces the interpreted Catalyst HOF pipeline
  * (`transform(params, p -> aggregate(hashes, P, least(...)))`) with one
  * typed imperative aggregate: HOF lambdas evaluate interpreted — numHashes ×
  * |shingles| expression-tree walks per document — while this is a tight
  * numHashes-iteration JVM loop per shingle. The buffer is a plain
  * `Array[Long]` between updates, byte-serialized only on partial-aggregate
  * shuffle (8·numHashes bytes per document), so map-side combine holds at
  * 100 TB fan-in.
  *
  * `a`/`b` must come from [[graft.dedup.MinHashLSH.params]] with the P there
  * (Mersenne 2^31−1): `a·h + b < 2^62` keeps the fold overflow-free.
  */
case class MinHashAggregate(
    child: Expression,
    a: Seq[Long],
    b: Seq[Long],
    p: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(a.length == b.length && a.nonEmpty)

  @transient private lazy val aArr: Array[Long] = a.toArray
  @transient private lazy val bArr: Array[Long] = b.toArray
  private def n: Int = a.length

  override def createAggregationBuffer(): Array[Long] = Array.fill(n)(p)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < n) {
        val perm = (aArr(i) * h + bArr(i)) % p
        if (perm < buffer(i)) buffer(i) = perm
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = ArrayData.toArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(n * 8)
    var i = 0
    while (i < n) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAggregate =
    copy(child = newChild)
}

object MinHashAgg {
  /** Column wrapper: minhash signature of a group of pre-mod-P shingle
    * hashes, as `array<long>` of length `params.length`.
    */
  def minhashAgg(shingleHash: Column, params: Seq[(Long, Long)], p: Long): Column =
    ColumnBridge.column(
      MinHashAggregate(ColumnBridge.expression(shingleHash),
        params.map(_._1), params.map(_._2), p).toAggregateExpression())
}
