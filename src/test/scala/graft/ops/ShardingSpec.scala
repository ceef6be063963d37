package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  test("rendezvous assignment: in-range, deterministic, partitioning-invariant") {
    val keys = (1L to 500L).toDF("k")
    val a = Sharding.assign(keys, "k", n = 8).as[(Long, Long)].collect().toMap
    assert(a.size == 500 && a.values.forall(s => s >= 0 && s < 8))
    val b = Sharding.assign(keys.repartition(7), "k", n = 8)
      .as[(Long, Long)].collect().toMap
    assert(b == a)
  }

  test("growthAudit: 8→9 moves ≈ 1/9 of keys, never the 8/9 of mod-hashing") {
    val keys = (1L to 2000L).toDF("k")
    val r = Sharding.growthAudit(keys, "k", n = 8)
      .as[(Long, Long, Long, Long)].head()
    val (nKeys, nMoved, maxLoad, minLoad) = r
    assert(nKeys == 2000L)
    val frac = nMoved.toDouble / nKeys
    assert(frac > 0.03 && frac < 0.25,
      s"rendezvous growth should move ~1/9 of keys, moved $frac")
    // moved keys land on the NEW shard only: every mover's next shard is 8
    val a = Sharding.assign(keys, "k", 8).withColumnRenamed("shard", "s8")
    val b = Sharding.assign(keys, "k", 9).withColumnRenamed("shard", "s9")
    val movers = a.join(b, "key").filter(col("s8") =!= col("s9"))
      .select("s9").as[Long].collect()
    assert(movers.nonEmpty && movers.forall(_ == 8L),
      "rendezvous movers must all move to the added shard")
    // mod-hash contrast: pmod(key, n) moves almost everything
    val modMoved = keys.select(
        (pmod(col("k"), lit(8)) =!= pmod(col("k"), lit(9))).cast("long").as("m"))
      .agg(sum(col("m"))).as[Long].head()
    assert(modMoved.toDouble / 2000 > 0.8)
    assert(maxLoad >= minLoad && minLoad > 0)
  }
}
