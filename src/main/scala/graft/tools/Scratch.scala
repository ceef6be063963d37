package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad (contents rotate per investigation — currently: the
  * NULL/empty-text robustness sweep after the bloom NULL-fp find. A 100 TB
  * crawl WILL contain null and empty text fields; the fixtures never do,
  * so operator behavior on them is unexercised. Feed a tiny frame with a
  * null-text row, an empty-text row, and a whitespace-only row through
  * the core text/dedup operators and report which throw (ANSI), which
  * drop the row silently, and which emit a sane verdict.)
  *
  * Usage: Scratch go
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: Scratch go")
      return
    }
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, null.asInstanceOf[String]),
      (3L, ""),
      (4L, "   "),
      (5L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(coalesce(col("text"), lit(""))))

    def attempt(name: String)(f: => Seq[String]): Unit =
      try {
        val out = f
        println(s"[null-sweep] $name: OK rows=${out.size} :: ${out.mkString(" | ")}")
      } catch {
        case e: Throwable =>
          println(s"[null-sweep] $name: THROWS ${e.getClass.getSimpleName}: " +
            e.getMessage.linesIterator.next().take(140))
      }

    attempt("dedupExact/dedupAgainstCorpus") {
      graft.dedup.Dedup.dedupAgainstCorpus(
          docs.filter(col("doc_id") >= 3), docs.filter(col("doc_id") < 3))
        .select("doc_id").as[Long].collect().sorted.map(_.toString).toSeq
    }
    attempt("lineDedup") {
      graft.dedup.Dedup.lineDedup(docs)
        .select(col("doc_id"), col("n_lines"), col("n_kept"))
        .collect().map(_.toString).toSeq
    }
    attempt("qualityFeatures") {
      graft.text.TextAnalysis.qualityFeatures(docs)
        .select(col("doc_id"), col("quality_score")).collect().map(_.toString).toSeq
    }
    attempt("langId") {
      docs.select(col("doc_id"),
        graft.text.TextAnalysis.langId(col("text")).as("l"))
        .collect().map(_.toString).toSeq
    }
    attempt("tokenCounts") {
      graft.text.TextAnalysis.tokenCounts(docs)
        .collect().map(_.toString).toSeq
    }
    attempt("ngramJaccardPairs") {
      graft.dedup.Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.5)
        .collect().map(_.toString).toSeq
    }
    attempt("withStringShingles") {
      graft.dedup.Dedup.withStringShingles(docs, 3)
        .select(col("id"), size(col("sh")).as("n")).collect().map(_.toString).toSeq
    }
    attempt("simhash fingerprints") {
      graft.dedup.SimHash.fingerprints(docs)
        .collect().map(_.toString).toSeq
    }
    attempt("rakeKeyphrases") {
      graft.text.TextAnalysis.rakeKeyphrases(docs, k = 5)
        .collect().map(_.toString).toSeq
    }
    attempt("repetitionFeatures") {
      graft.text.Curation.repetitionFeatures(docs)
        .select("doc_id").collect().map(_.toString).toSeq
    }
    attempt("c4Flags") {
      graft.text.CorpusFilters.c4Flags(docs)
        .collect().map(_.toString).take(6).toSeq
    }
    spark.stop()
  }
}
