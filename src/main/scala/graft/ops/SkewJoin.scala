package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting is
  * the deterministic fallback for *pathological* single-key skew (one device
  * producing a third of all telemetry), or when AQE is unavailable (streaming
  * micro-batches).
  *
  * Big side: deterministic salt in [0, saltFactor) hashed from the row's join
  * key plus a disambiguator column (so one hot key's rows spread). Small
  * side: replicated saltFactor× via explode. Join on (key, salt). The result
  * multiset is provably identical to the unsalted join — each big-side row
  * matches exactly the one replica carrying its salt.
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int, disambiguator: Column): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(key), disambiguator), lit(saltFactor.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
