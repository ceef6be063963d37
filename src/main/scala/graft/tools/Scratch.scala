package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad (contents rotate per investigation — currently: why the
  * bucketed pHash TB-delta probe's TIME grows ×5 at a ×30 corpus while the
  * broadcast sibling grows ×1.4, even though both paths' shuffle is the
  * same collision-sized class. Reuses the ScaleProbe x-tier fixtures and
  * times the corpus-branch candidate join alone under plan variants.)
  *
  * Usage: Scratch <tier: x1|x10|x30> [workRoot]
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: Scratch <x1|x10|x30> [workRoot]")
      return
    }
    val tier = args(0)
    val root = if (args.length > 1) args(1) else "/tmp/graft_scale/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.warehouse.dir", "/tmp/graft_scale/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    spark.range(1L << 20).agg(sum(col("id"))).collect()

    // re-register the probe's bucketed table (location persists; in-memory
    // catalog does not)
    val pfp = s"$root/${tier}_phashfix"
    s.sql(s"DROP TABLE IF EXISTS scr_ph")
    val loc = new java.io.File(s"/tmp/graft_scale/warehouse/scr_ph")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(): Unit
    }
    if (loc.exists()) rm(loc)
    val v1b = s.read.parquet(s"$pfp/v1bands")
    v1b.repartition(32, col("bi"), col("bv")).write.bucketBy(32, "bi", "bv").sortBy("bi", "bv").saveAsTable("scr_ph")
    // salted layout: hot (bi, bv) keys spread over 16 salt sub-buckets
    s.sql(s"DROP TABLE IF EXISTS scr_ph_salt")
    val locS = new java.io.File(s"/tmp/graft_scale/warehouse/scr_ph_salt")
    if (locS.exists()) rm(locS)
    v1b.withColumn("salt", pmod(xxhash64(col("doc_id")), lit(16L)).cast("int"))
      .write.bucketBy(32, "bi", "bv", "salt").sortBy("bi", "bv", "salt")
      .saveAsTable("scr_ph_salt")

    val hashes = s.read.parquet(s"$pfp/hashes")
    val isDelta = col("doc_id") < 10000000L && col("doc_id") % 7 === 0
    val delta = hashes.filter(isDelta)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scr] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val deltaBands = graft.multimodal.Multimodal.phashBands(delta)
      .localCheckpoint(true)
    val tbl = s.table("scr_ph")

    def candJoin(left: org.apache.spark.sql.DataFrame) = left.as("a")
      .join(tbl.as("b"),
        col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("pid"),
        col("a.hash_hi").as("ahi"), col("a.hash_lo").as("alo"),
        col("b.hash_hi").as("bhi"), col("b.hash_lo").as("blo"))
      .distinct()

    val tblSalt = s.table("scr_ph_salt")
    def candJoinSalt(left: org.apache.spark.sql.DataFrame) = left
      .withColumn("salt", explode(sequence(lit(0), lit(15))))
      .as("a")
      .join(tblSalt.as("b"),
        col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
          col("a.salt") === col("b.salt") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("pid"),
        col("a.hash_hi").as("ahi"), col("a.hash_lo").as("alo"),
        col("b.hash_hi").as("bhi"), col("b.hash_lo").as("blo"))
      .distinct()

    (1 to 3).foreach { i =>
      time(s"candV1 plain (iter $i)") { candJoin(deltaBands).count() }
      time(s"candV1 salted16 (iter $i)") { candJoinSalt(deltaBands).count() }
      time(s"candV1 shuffle_hash hint (iter $i)") {
        candJoin(deltaBands.hint("shuffle_hash")).count()
      }
      time(s"candV1 broadcast-style (iter $i)") {
        broadcast(deltaBands).as("a")
          .join(graft.multimodal.Multimodal.phashBands(
              hashes.filter(!isDelta)).as("b"),
            col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
              col("a.doc_id") =!= col("b.doc_id"))
          .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("pid"),
            col("a.hash_hi").as("ahi"), col("a.hash_lo").as("alo"),
            col("b.hash_hi").as("bhi"), col("b.hash_lo").as("blo"))
          .distinct().count()
      }
    }
    println("=== plain plan ===")
    println(candJoin(deltaBands).queryExecution.executedPlan.toString.take(4000))
    println("=== shuffle_hash plan ===")
    println(candJoin(deltaBands.hint("shuffle_hash"))
      .queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
