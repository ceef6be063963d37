package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad (contents rotate per investigation — currently: the
  * r16 generic kernel-pin A/B: each tail-tier registry query run as-is vs
  * wrapped in the 8-partition kernel pin (+ eager localCheckpoint so the
  * pinned plan evaluates inside the pin), interleaved same-window,
  * results compared for exact equality.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
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

    def pin[T](n: Int)(f: => T): T = {
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", n.toString)
      try f finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm the fixture memos outside the arms
      fn(s, dir).collect()
      var ref: Array[org.apache.spark.sql.Row] = null
      val (bt, pt) = (Array.fill(3)(0.0), Array.fill(3)(0.0))
      (0 until 3).foreach { r =>
        val t0 = System.nanoTime()
        val a = fn(s, dir).collect()
        bt(r) = (System.nanoTime() - t0) / 1e6
        val t1 = System.nanoTime()
        val b = pin(8)(fn(s, dir).localCheckpoint(true)).collect()
        pt(r) = (System.nanoTime() - t1) / 1e6
        if (ref == null) ref = a
        require(a.sameElements(ref), s"$name base mismatch r$r")
        require(b.sameElements(ref), s"$name pin8 mismatch r$r")
        s.catalog.clearCache()
      }
      def f(a: Array[Double]) = a.map(x => f"$x%.0f").mkString("/")
      println(s"[scr] $name base ${f(bt)} ms  pin8 ${f(pt)} ms  (exact-equal)")
    }
    spark.stop()
  }
}
