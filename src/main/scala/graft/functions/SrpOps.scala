package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Signed-random-projection (SRP) LSH bucket as a native expression.
  *
  * The composable formulation (a `when`-chain of [[DotProduct]]s against a
  * `typedLit` planes array) is correct but embeds every plane coefficient in
  * the generated Java source: 8 planes × 64 dims inlines ~512 doubles and the
  * resulting source recompiles per run (fresh expression ids defeat the
  * codegen cache) — the same janino-compile trap [[PqKernel]] documents for
  * the PQ codebooks, and the root cause of `q_ann_lsh` regressing ~6× once
  * several SRP queries shared a session. This expression ships the planes as
  * a reference object (`ctx.addReferenceObj`) and runs a tight primitive
  * loop: the generated source is one call regardless of plane count.
  *
  * Semantics are bit-identical to the composable form: bit `b` of the bucket
  * is the sign (`>= 0`) of the sequential left-fold dot product of the vector
  * with plane `b` (same element order and null handling as [[DotProduct]],
  * hence the same doubles as the DuckDB oracle).
  */
final class SrpKernel(val planes: Array[Array[Double]]) extends Serializable {
  /** Bucket id: bit `b` set iff `dot(v, planes(b)) >= 0`. */
  def bucket(v: ArrayData): Long = {
    var out = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      val n = math.min(v.numElements(), p.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) acc += v.getDouble(i) * p(i)
        i += 1
      }
      if (acc >= 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

case class SrpBucket(child: Expression, kernel: SrpKernel) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "srp_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_bucket requires array<double> (cast float arrays with " +
        s"CAST(x AS ARRAY<DOUBLE>)), got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    kernel.bucket(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srpKernel", kernel, classOf[SrpKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.bucket($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBucket =
    copy(child = newChild)
}

object SrpOps {
  def srpBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    ColumnBridge.column(
      SrpBucket(ColumnBridge.expression(vec), new SrpKernel(planes.map(_.toArray).toArray)))
}
