package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage-by-stage timing scratchpad (current target: the
  * bootstrap-CI hot path).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1L << 20).agg(sum(col("id"))).collect()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val base = Tables.events(spark, dir)
      .select(col("event_id").cast("string").as("__id"),
        round(col("value") * 100, 0).cast("long").as("x"))
    (1 to 3).foreach { it =>
      time(s"[$it] base count") {
        base.agg(count(lit(1))).collect()
      }
      time(s"[$it] explode only") {
        base.select(col("__id"), col("x"),
            explode(sequence(lit(0), lit(15))).as("rg"))
          .agg(count(lit(1)), sum(col("x"))).collect()
      }
      val digest = md5(concat(lit("boot:s1:"), col("__id"), lit(":"),
        col("rg").cast("string")))
      time(s"[$it] explode+md5") {
        base.select(col("__id"), col("x"),
            explode(sequence(lit(0), lit(15))).as("rg"))
          .select(col("x"), col("rg"), length(digest).as("l"))
          .agg(sum(col("l")), sum(col("x"))).collect()
      }
      def weightOf(s: Int) =
        (lit(8L) - length(translate(substring(digest, 1 + 8 * s, 8), "01", "")))
          .cast("long")
      time(s"[$it] explode+md5+weights flat agg") {
        base.select(col("__id"), col("x"),
            explode(sequence(lit(0), lit(15))).as("rg"))
          .select(col("rg"), col("x"),
            weightOf(0).as("w0"), weightOf(1).as("w1"),
            weightOf(2).as("w2"), weightOf(3).as("w3"))
          .groupBy(col("rg"))
          .agg(sum(col("w0") * col("x")), sum(col("w0")),
            sum(col("w1") * col("x")), sum(col("w1")),
            sum(col("w2") * col("x")), sum(col("w2")),
            sum(col("w3") * col("x")), sum(col("w3")))
          .collect()
      }
      def weightCol(s: Int) =
        (lit(8L) - length(translate(substring(col("__digest"), 1 + 8 * s, 8),
          "01", ""))).cast("long")
      time(s"[$it] staged digest, weights flat agg") {
        base.select(col("__id"), col("x"),
            explode(sequence(lit(0), lit(15))).as("rg"))
          .select(col("rg"), col("x"), digest.as("__digest"))
          .select(col("rg"), col("x"),
            weightCol(0).as("w0"), weightCol(1).as("w1"),
            weightCol(2).as("w2"), weightCol(3).as("w3"))
          .groupBy(col("rg"))
          .agg(sum(col("w0") * col("x")), sum(col("w0")),
            sum(col("w1") * col("x")), sum(col("w1")),
            sum(col("w2") * col("x")), sum(col("w2")),
            sum(col("w3") * col("x")), sum(col("w3")))
          .collect()
      }
      val stagedDigest = base.select(col("__id"), col("x"),
          explode(sequence(lit(0), lit(15))).as("rg"))
        .select(col("rg"), col("x"), digest.as("__digest"))
      time(s"[$it] digest + flat sum only") {
        stagedDigest.agg(sum(length(col("__digest"))), sum(col("x"))).collect()
      }
      time(s"[$it] digest + 4 substr/translate, no groupBy") {
        stagedDigest.select(col("x"),
            weightCol(0).as("w0"), weightCol(1).as("w1"),
            weightCol(2).as("w2"), weightCol(3).as("w3"))
          .agg(sum(col("w0")), sum(col("w1")), sum(col("w2")), sum(col("w3")),
            sum(col("x"))).collect()
      }
      time(s"[$it] digest + 4 plain substrings, no translate") {
        stagedDigest.select((col("x") +:
            (0 to 3).map(s => length(substring(col("__digest"), 1 + 8 * s, 8))
              .as(s"w$s"))): _*)
          .agg(sum(col("w0")), sum(col("w1")), sum(col("w2")), sum(col("w3")),
            sum(col("x"))).collect()
      }
      time(s"[$it] checkpointed digest + 4 translate weights") {
        val cp = stagedDigest.localCheckpoint(true)
        cp.select(col("x"),
            weightCol(0).as("w0"), weightCol(1).as("w1"),
            weightCol(2).as("w2"), weightCol(3).as("w3"))
          .agg(sum(col("w0")), sum(col("w1")), sum(col("w2")), sum(col("w3")),
            sum(col("x"))).collect()
        cp.unpersist()
      }
      def weightRepl(s: Int) =
        (lit(8L) - length(regexp_replace(
          substring(col("__digest"), 1 + 8 * s, 8), "[01]", ""))).cast("long")
      def weightRepl2(s: Int) = {
        val f = substring(col("__digest"), 1 + 8 * s, 8)
        (lit(8L) - length(replace(replace(f, lit("0"), lit("")),
          lit("1"), lit("")))).cast("long")
      }
      time(s"[$it] digest + 4 replace-replace weights") {
        stagedDigest.select((col("x") +: (0 to 3).map(s =>
            weightRepl2(s).as(s"w$s"))): _*)
          .agg(sum(col("w0")), sum(col("w1")), sum(col("w2")), sum(col("w3")),
            sum(col("x"))).collect()
      }
      time(s"[$it] digest + 1 weight + groupBy(rg)") {
        stagedDigest.select(col("rg"), col("x"), weightCol(0).as("w0"))
          .groupBy(col("rg")).agg(sum(col("w0") * col("x")), sum(col("w0")))
          .collect()
      }
      val msg = concat(lit("boot:s1:"), col("__id"), lit(":"),
        col("rg").cast("string"))
      def weightNative(s: Int) = {
        val u = graft.functions.Md5Field.md5Field(msg, 8 * s, 8)
        (0 to 7).map(j =>
          when(shiftright(u, 4 * j + 1).bitwiseAND(lit(7L)) === 0, 1L)
            .otherwise(0L)).reduce(_ + _)
      }
      if (it == 1) {
        val old = base.select(col("__id"), col("x"),
            explode(sequence(lit(0), lit(15))).as("rg"))
          .select(col("rg"), col("x"), digest.as("__digest"))
          .select((col("rg") +: (0 to 3).map(s => weightCol(s).as(s"w$s"))): _*)
          .agg(sum(col("w0")), sum(col("w1")), sum(col("w2")), sum(col("w3")))
          .collect()(0)
        val nw = base.select(col("__id"), col("x"),
            explode(sequence(lit(0), lit(15))).as("rg"))
          .select((col("rg") +: (0 to 3).map(s => weightNative(s).as(s"w$s"))): _*)
          .agg(sum(col("w0")), sum(col("w1")), sum(col("w2")), sum(col("w3")))
          .collect()(0)
        println(s"[scratch] weight parity old=$old native=$nw  equal=${old == nw}")
      }
      time(s"[$it] native md5field weights flat agg") {
        base.select(col("__id"), col("x"),
            explode(sequence(lit(0), lit(15))).as("rg"))
          .select((Seq(col("rg"), col("x")) ++
            (0 to 3).map(s => weightNative(s).as(s"w$s"))): _*)
          .groupBy(col("rg"))
          .agg(sum(col("w0") * col("x")), sum(col("w0")),
            sum(col("w1") * col("x")), sum(col("w1")),
            sum(col("w2") * col("x")), sum(col("w2")),
            sum(col("w3") * col("x")), sum(col("w3")))
          .collect()
      }
      time(s"[$it] full q_bootstrap_ci") {
        graft.Bench.fullyEvaluate(
          graft.SparkEntry.queries("q_bootstrap_ci")(spark, dir))
      }
    }
    spark.stop()
  }
}
