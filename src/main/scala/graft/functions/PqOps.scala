package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Codebook-quantization kernels as native expressions.
  *
  * The composable formulation (argmin over `struct(dot, i)` literals — one
  * expression node per centroid coefficient) inlines every codebook value
  * into the generated Java source: an IVF cell assignment plus PQ encode at
  * nlist=16, m=8, k=16 over 64 dims embeds ~2 000 doubles, and the resulting
  * megabyte-scale source cost **~9 s of janino compilation per run** (fresh
  * expression ids defeat the codegen cache) against <1 s of actual data
  * work. These expressions instead ship the codebooks as a broadcast-able
  * reference object (`ctx.addReferenceObj`) and run a tight primitive loop —
  * the generated source is three lines regardless of codebook size.
  *
  * Semantics are identical to the composable form: per-subspace argmin of
  * `||c||² − 2·c·v_sub` with ties to the lowest code, sequential left-fold
  * dot order (bit-identical doubles).
  */
final class PqKernel(val codebooks: Array[Array[Array[Double]]]) extends Serializable {
  val m: Int = codebooks.length
  val k: Int = codebooks(0).length
  val dsub: Int = codebooks(0)(0).length
  val norms2: Array[Array[Double]] = codebooks.map(_.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  })

  /** Negative-bias distance of subspace `sub`'s centroid `c` to `v[base..]`:
    * `||c||² − 2·c·v_sub` (the `||v_sub||²` term is constant per row and
    * cancels in every argmin/ranking use).
    */
  private def dist(v: ArrayData, sub: Int, c: Int): Double = {
    val base = sub * dsub
    val cent = codebooks(sub)(c)
    var dot = 0.0
    var i = 0
    while (i < dsub) { dot += v.getDouble(base + i) * cent(i); i += 1 }
    norms2(sub)(c) - 2.0 * dot
  }

  /** PQ codes: per-subspace argmin centroid, ties to the lowest code. */
  def encode(v: ArrayData): ArrayData = {
    val out = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        val d = dist(v, sub, c)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(sub) = best
      sub += 1
    }
    new GenericArrayData(out)
  }

  /** Single-subspace argmin cell id (IVF coarse assignment; m must be 1). */
  def cell(v: ArrayData): Int = encode(v).getInt(0)

  /** The `nprobe` nearest cells ordered by (distance, cell id) — m must
    * be 1. Selection sort over k cells: k is small by construction.
    */
  def topCells(v: ArrayData, nprobe: Int): ArrayData = {
    val d = new Array[Double](k)
    val idx = new Array[Int](k)
    var c = 0
    while (c < k) { d(c) = dist(v, 0, c); idx(c) = c; c += 1 }
    val n = math.min(nprobe, k)
    val out = new Array[Int](n)
    var taken = 0
    while (taken < n) {
      var best = -1
      var c2 = 0
      while (c2 < k) {
        if (idx(c2) >= 0 &&
            (best < 0 || d(c2) < d(best) || (d(c2) == d(best) && idx(c2) < idx(best))))
          best = c2
        c2 += 1
      }
      out(taken) = idx(best)
      idx(best) = -1
      taken += 1
    }
    new GenericArrayData(out)
  }

  /** Per-query ADC lookup table: `tab[sub][code] = ||C[code]||² − 2·q_sub·C[code]`. */
  def adcTable(q: ArrayData): ArrayData = {
    val rows = new Array[AnyRef](m)
    var sub = 0
    while (sub < m) {
      val row = new Array[Double](k)
      var c = 0
      while (c < k) { row(c) = dist(q, sub, c); c += 1 }
      rows(sub) = new GenericArrayData(row)
      sub += 1
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }
}

sealed abstract class PqKernelExpression extends UnaryExpression {
  def kernel: PqKernel
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.sql}")
  }
  protected def kernelCall(ref: String, c: String): String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqKernel", kernel, classOf[PqKernel].getName)
    defineCodeGen(ctx, ev, c => kernelCall(ref, c))
  }
}

case class PqEncode(child: Expression, kernel: PqKernel) extends PqKernelExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override protected def nullSafeEval(v: Any): Any =
    kernel.encode(v.asInstanceOf[ArrayData])
  override protected def kernelCall(ref: String, c: String): String = s"$ref.encode($c)"
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

case class IvfCell(child: Expression, kernel: PqKernel) extends PqKernelExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_cell"
  override protected def nullSafeEval(v: Any): Any =
    kernel.cell(v.asInstanceOf[ArrayData])
  override protected def kernelCall(ref: String, c: String): String = s"$ref.cell($c)"
  override protected def withNewChildInternal(newChild: Expression): IvfCell =
    copy(child = newChild)
}

case class IvfProbeCells(child: Expression, kernel: PqKernel, nprobe: Int)
    extends PqKernelExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_probe_cells"
  override protected def nullSafeEval(v: Any): Any =
    kernel.topCells(v.asInstanceOf[ArrayData], nprobe)
  override protected def kernelCall(ref: String, c: String): String =
    s"$ref.topCells($c, $nprobe)"
  override protected def withNewChildInternal(newChild: Expression): IvfProbeCells =
    copy(child = newChild)
}

case class PqAdcTable(child: Expression, kernel: PqKernel) extends PqKernelExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_adc_table"
  override protected def nullSafeEval(v: Any): Any =
    kernel.adcTable(v.asInstanceOf[ArrayData])
  override protected def kernelCall(ref: String, c: String): String = s"$ref.adcTable($c)"
  override protected def withNewChildInternal(newChild: Expression): PqAdcTable =
    copy(child = newChild)
}

object PqOps {
  def pqEncode(vec: Column, kernel: PqKernel): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(vec), kernel))
  def ivfCell(vec: Column, kernel: PqKernel): Column =
    ColumnBridge.column(IvfCell(ColumnBridge.expression(vec), kernel))
  def ivfProbeCells(vec: Column, kernel: PqKernel, nprobe: Int): Column =
    ColumnBridge.column(IvfProbeCells(ColumnBridge.expression(vec), kernel, nprobe))
  def pqAdcTable(vec: Column, kernel: PqKernel): Column =
    ColumnBridge.column(PqAdcTable(ColumnBridge.expression(vec), kernel))
}
