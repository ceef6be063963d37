package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Unsigned value of `nNibbles` hex digits of `md5(input)` starting at
  * 0-based nibble `startNibble`, as a BIGINT — bit-exact with the
  * library-wide reproducible-uniform idiom
  * `conv(substring(md5(x), startNibble + 1, nNibbles), 16, 10)` (and with
  * DuckDB's `md5(...)[a:b]` hex-slice parse on the oracle side), but
  * computed from the raw digest bytes.
  *
  * Why native instead of the composed built-ins: the string path
  * materializes the 32-char hex string, a substring copy, and conv's
  * decimal-string result per draw, and — decisive under `local[32]` —
  * Spark's `Md5` calls `MessageDigest.getInstance` per row, which
  * serializes every task thread on the JCA provider lookup (measured
  * ~16 µs per digest across 32 threads vs ~0.2 µs for the digest
  * itself). This expression holds one `MessageDigest` per thread and
  * allocates nothing per row. The md5-derived uniform is the hot inner
  * loop of the whole draw discipline (bootstrap weights, negative
  * sampling, skip-gram subsampling, DSIR/perceptron feature hashing,
  * CDC cut-points, rendezvous sharding), so at 100 TB this sits on the
  * per-row ingest path exactly like [[JavaHashCode]].
  *
  * `nNibbles` ≤ 15 keeps the value strictly inside the positive BIGINT
  * range (no sign wrap on either engine).
  */
case class Md5Field(child: Expression, startNibble: Int, nNibbles: Int)
    extends UnaryExpression {
  require(startNibble >= 0 && nNibbles >= 1 && nNibbles <= 15 &&
    startNibble + nNibbles <= 32,
    s"md5 field out of range: start=$startNibble n=$nNibbles")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_field"

  override protected def nullSafeEval(input: Any): Any =
    Md5Field.field(input.asInstanceOf[UTF8String], startNibble, nNibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Field.field($c, $startNibble, $nNibbles)")

  override protected def withNewChildInternal(newChild: Expression): Md5Field =
    copy(child = newChild)
}

/** All four Binomial(8, 1/8) multiplier-bootstrap weights of one md5 digest,
  * packed into a single BIGINT: weight `s` (the count of hex digits in
  * {0,1} among digits [8s, 8s+8) of `md5(input)`) occupies bits
  * [8·(3−s), 8·(3−s)+8). Bit-exact with four independent
  * `md5_field(input, 8s, 8)` draws each folded by the digit<2 count — but
  * ONE digest instead of four: the per-(row, replicate-group) md5 is the
  * hot inner loop of [[graft.analytics.Bootstrap.meanCI]], and as four
  * separate [[Md5Field]] expressions each call re-digested the same
  * message (common-subexpression elimination cannot reach inside an
  * expression's eval), quadrupling the dominant cost of the draw pass.
  */
case class Md5BinWeights4(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_bin_weights4"

  override protected def nullSafeEval(input: Any): Any =
    Md5Field.binWeights4(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Field.binWeights4($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5BinWeights4 =
    copy(child = newChild)
}

object Md5Field {
  private val localMd = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Digest `s`, then fold nibbles [start, start + n) big-endian into a
    * long. Called from generated code — must stay allocation-free beyond
    * the digest's own output array.
    */
  def field(s: UTF8String, start: Int, n: Int): Long = {
    val md = localMd.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    var v = 0L
    var i = start
    val end = start + n
    while (i < end) {
      val b = digest(i >> 1) & 0xff
      val nib = if ((i & 1) == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }

  /** One digest, four packed Binomial(8, 1/8) weights — see
    * [[Md5BinWeights4]]. Weight `s` is the digit<2 count of the 8-nibble
    * field starting at nibble 8s; nibble POSITIONS inside a field don't
    * matter for the count, so this equals the [[Md5Field]]-derived
    * per-nibble fold bit for bit. Called from generated code —
    * allocation-free beyond the digest's own output array.
    */
  def binWeights4(s: UTF8String): Long = {
    val md = localMd.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    var packed = 0L
    var f = 0
    while (f < 4) {
      var w = 0L
      var i = 4 * f
      val end = i + 4
      while (i < end) {
        val b = digest(i) & 0xff
        if ((b >>> 4) < 2) w += 1
        if ((b & 0xf) < 2) w += 1
        i += 1
      }
      packed = (packed << 8) | w
      f += 1
    }
    packed
  }

  /** Column API: `md5Field(c, 0, 8)` is the md5U32 uniform. */
  def md5Field(c: Column, startNibble: Int, nNibbles: Int): Column =
    ColumnBridge.column(
      Md5Field(ColumnBridge.expression(c), startNibble, nNibbles))

  /** The library's standard 32-bit uniform draw `md5U32(x)`. */
  def md5U32(c: Column): Column = md5Field(c, 0, 8)

  /** Column API for the packed bootstrap-weight quad. */
  def md5BinWeights4(c: Column): Column =
    ColumnBridge.column(Md5BinWeights4(ColumnBridge.expression(c)))
}
