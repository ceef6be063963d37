package graft.text

import graft.SparkSpec
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("quality features handle degenerate inputs without nulls/NaN") {
    val out = TextAnalysis.qualityFeatures(
        Seq("", "x", "the the the", "a b. c, d!").toDF("text"))
      .select("n_tokens", "avg_token_len", "stopword_ratio", "punct_ratio", "quality_score")
      .collect()
    out.foreach { r =>
      (0 until r.length).foreach(i => assert(!r.isNullAt(i), s"null at $i in $r"))
    }
    val punct = out(3).getAs[Double]("punct_ratio")
    assert(punct == 3.0 / 10.0)
  }

  test("langId picks the language with most marker hits; fixed tie order") {
    val out = Seq(
      "the cat and the dog is here",     // en
      "el perro de la casa que ladra",   // es
      "der hund und die katze ist da",   // de
      "le chat et les oiseaux des bois", // fr
      "zzz qqq www",                     // unknown
      "the el der le"                    // 1-1-1-1 tie -> en (fixed order)
    ).toDF("text").select(TextAnalysis.langId(col("text"))).as[String].collect()
    assert(out.toSeq == Seq("en", "es", "de", "fr", "unknown", "en"))
  }

  test("token counts: regex tokenizer counts words and punctuation") {
    val out = TextAnalysis.tokenCounts(Seq("hello, world! 42").toDF("text"))
      .select("ws_tokens", "re_tokens").as[(Long, Long)].head()
    assert(out == ((3L, 5L))) // [hello][,][world][!][42]
  }

  test("fingerprint is whitespace/case-normalized") {
    val fps = Seq("Hello  World", "hello world", "hello world ")
      .toDF("text").select(TextAnalysis.fingerprint(col("text"))).as[Int].collect()
    assert(fps.distinct.length == 1)
    assert(fps(0) == "hello world".hashCode)
  }

  test("ngram langId: profile trigram overlap with fixed tie order") {
    val out = Seq(
      "the thing and the king",  // en trigrams
      "el de la que casa",       // es
      "der die und einmal",      // de
      "zzzz qqqq",               // none -> unknown
      ""                         // empty -> unknown
    ).toDF("text").select(TextAnalysis.langIdNgram(col("text"))).as[String].collect()
    assert(out.toSeq == Seq("en", "es", "de", "unknown", "unknown"))
  }

  test("resize stub preserves aspect ratio and shrinks payload") {
    val media = Multimodal.mediaFromDocuments(
      Seq((100L, "x" * 1000, "en", "s", 1000L)).toDF("doc_id", "text", "lang", "source", "n_chars"))
    // doc 100: width 100%640+64=164, height 100%480+48=148
    val out = Multimodal.resizeStub(spark, media, maxDim = 82).collect().head
    assert(out.width == 82 && out.height == 74) // scale 0.5 exactly
    assert(out.media.length == 250) // 1000 * 0.25
    val noop = Multimodal.resizeStub(spark, media, maxDim = 2000).collect().head
    assert(noop.width == 164 && noop.media.length == 1000) // no upscale
  }

  test("multimodal decode stub: exact features from known bytes") {
    val media = Multimodal.mediaFromDocuments(
      Seq((7L, "abc", "en", "s", 3L)).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val f = Multimodal.decodeStub(spark, media).collect().head
    assert(f.doc_id == 7L && f.n_bytes == 3L && f.format == "png") // 7%3+1 = 2
    assert(f.luma_mean == ('a'.toInt + 'b'.toInt + 'c'.toInt) / 3.0)
    assert(f.n_frames == 1 && f.width == 7 + 64 && f.height == 7 + 48)
  }

  test("frameOffsets: evenly spaced, within payload") {
    val offs = Seq(1000L).toDF("n")
      .select(Multimodal.frameOffsets(col("n"), 4)).as[Seq[Long]].head()
    assert(offs == Seq(0L, 250L, 500L, 750L))
  }
}
