package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad (contents rotate per investigation — currently: the
  * r16 fixed-cost decomposition: per bench invocation, how much is plan
  * construction + analysis/optimization/physical-planning vs execution?
  * Measured by forcing `queryExecution.executedPlan` before evaluating.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: Scratch <q1,q2,...> [sfDir]")
      return
    }
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val names = args(0).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1L << 20).agg(sum(col("id"))).collect()
    val s = spark

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(s, dir).collect() // warm fixtures + JIT
      s.sharedState.cacheManager.clearCache()
      var ref: Array[org.apache.spark.sql.Row] = null
      Seq(true, false, true, false).zipWithIndex.foreach { case (cp, it) =>
        s.conf.set("spark.sql.constraintPropagation.enabled", cp.toString)
        val t0 = System.nanoTime()
        val df = fn(s, dir)                       // construction (+ any eager anchors)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan            // analysis + optimize + plan
        val t2 = System.nanoTime()
        val r = df.collect()                      // execution
        val t3 = System.nanoTime()
        if (ref == null) ref = r
        require(r.sameElements(ref), s"$name MISMATCH cp=$cp")
        s.sharedState.cacheManager.clearCache()
        def ms(a: Long, b: Long) = (b - a) / 1e6
        println(f"[scr] $name%-24s cp=$cp%-5s construct ${ms(t0, t1)}%7.0f ms  plan ${ms(t1, t2)}%6.0f ms  exec ${ms(t2, t3)}%7.0f ms  total ${ms(t0, t3)}%7.0f ms")
      }
      s.conf.set("spark.sql.constraintPropagation.enabled", "true")
    }
    spark.stop()
  }
}
