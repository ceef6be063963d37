package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * The composable form (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) is correct
  * but evaluates as interpreted lambda calls — three virtual calls per
  * element. This expression generates a tight primitive loop via `doGenCode`,
  * which is the difference between the embedding scan being CPU-bound on
  * expression interpretation vs memory-bound at 100 TB corpus scale.
  *
  * Summation order is the same sequential left-fold as the composable form
  * and the DuckDB oracle (`list_reduce`), so results are bit-identical.
  * Mismatched lengths are NULL (matching `dotHof`'s zip_with padding, which
  * nulls the whole fold — see nullSafeEval); null elements are treated as 0.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // nullable even over non-nullable inputs: the length-mismatch guard
  // produces NULL, and a false `nullable` would make codegen consumers
  // ignore the isNull bit entirely
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  // require array<double> at analysis time: without this, a float-array
  // column fails deep inside the parquet reader at runtime instead of with a
  // clear analysis error telling the user to cast
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    import org.apache.spark.sql.types.ArrayType
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckSuccess
      case (l, r) => TypeCheckFailure(
        s"dot_product requires two array<double> arguments (cast float arrays " +
          s"with CAST(x AS ARRAY<DOUBLE>)), got ${l.sql} and ${r.sql}")
    }
  }

  // Mismatched lengths are NULL, not a min-length prefix dot: a 384-dim
  // vector mixed into a 768-dim table (a model-version pipeline bug at
  // crawl scale) must not get a plausible-looking prefix similarity — and
  // the HOF reference form already agrees (zip_with pads the shorter side
  // with NULL, which nulls the whole fold), so the prefix loop was the ONE
  // input class where "bit-identical to dotHof" did not hold.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |      $acc += $a.getDouble($i) * $b.getDouble($i);
         |    }
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
