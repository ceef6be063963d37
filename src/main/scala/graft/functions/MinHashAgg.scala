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

  /** Column wrapper for the one-permutation variant: `buckets`-long signature
    * from a single (a, b) permutation.
    */
  def ophAgg(shingleHash: Column, a: Long, b: Long, p: Long, buckets: Int): Column =
    ColumnBridge.column(
      OnePermMinHashAggregate(ColumnBridge.expression(shingleHash),
        a, b, p, buckets).toAggregateExpression())
}

/** One-permutation minhash (Li/Owen/Zhang '12): hash every shingle ONCE,
  * range-partition the hash space into `buckets` bins, keep the minimum per
  * bin — an O(1)-per-shingle signature instead of
  * [[MinHashAggregate]]'s O(numHashes), the fix that matters when shingle
  * volume (100 TB corpus) dwarfs signature width. Empty bins densify by
  * borrowing the next non-empty bin to the right, circularly (Shrivastava
  * '14's rotation scheme, offset-free variant) — deterministic, so identical
  * shingle sets still yield identical signatures and banded LSH capture of
  * exact duplicates stays a hard guarantee.
  */
case class OnePermMinHashAggregate(
    child: Expression,
    a: Long,
    b: Long,
    p: Long,
    buckets: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(buckets > 0 && p > 0)

  override def createAggregationBuffer(): Array[Long] = Array.fill(buckets)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val perm = (a * h + b) % p
      // range partition: bin = floor(perm * buckets / p); perm < p < 2^31 and
      // buckets <= 2^12 keeps the product far from overflow
      val bin = ((perm * buckets) / p).toInt
      if (perm < buffer(bin)) buffer(bin) = perm
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buckets) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = {
    // densify: empty bins borrow the next non-empty bin (circular right scan)
    val out = new Array[Long](buckets)
    var i = 0
    while (i < buckets) {
      if (buffer(i) != Long.MaxValue) out(i) = buffer(i)
      else {
        var j = (i + 1) % buckets
        var hops = 0
        while (buffer(j) == Long.MaxValue && hops < buckets) { j = (j + 1) % buckets; hops += 1 }
        out(i) = if (buffer(j) == Long.MaxValue) 0L else buffer(j)
      }
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buckets * 8)
    var i = 0
    while (i < buckets) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](buckets)
    var i = 0
    while (i < buckets) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "oph_minhash_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): OnePermMinHashAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): OnePermMinHashAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): OnePermMinHashAggregate =
    copy(child = newChild)
}
