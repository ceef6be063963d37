package graft.functions

import graft.SparkSpec
import graft.functions.Md5Field._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class Md5FieldSpec extends SparkSpec {
  import spark.implicits._

  private def samples(g: Gen[String], n: Int): Seq[String] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  /** The library-wide string idiom the native expression must replay
    * bit-exactly (and the DuckDB oracle's `md5(x)[a:b]` hex-slice parse).
    */
  private def stringIdiom(start: Int, n: Int) =
    conv(substring(md5(col("s")), start + 1, n), 16, 10).cast("long")

  test("md5Field == conv(substring(md5)) on every (start, n) window") {
    val values = samples(Gen.asciiPrintableStr, 60).distinct
    for (start <- Seq(0, 1, 7, 8, 16, 24, 31); n <- Seq(1, 4, 8, 15)
         if start + n <= 32) {
      val rows = values.toDF("s")
        .select(md5Field(col("s"), start, n).as("native"),
          stringIdiom(start, n).as("idiom"))
        .collect()
      assert(rows.forall(r => r.getLong(0) == r.getLong(1)),
        s"mismatch at start=$start n=$n")
    }
  }

  test("md5U32 matches the conv idiom on unicode + empty strings") {
    val values = Seq("", "a", "ÿüñ ✓", "boot:s1:42:7", "a\nb\tc") ++
      samples(Gen.alphaNumStr, 100).distinct
    val rows = values.toDF("s")
      .select(md5U32(col("s")).as("native"), stringIdiom(0, 8).as("idiom"))
      .collect()
    assert(rows.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("md5BinWeights4 packs the four per-field digit<2 folds bit-exactly") {
    // the composed idiom md5BinWeights4 replaces in Bootstrap.meanCI: four
    // independent md5_field draws, each folded by the per-nibble digit<2
    // count — the replacement must agree weight for weight
    def weightIdiom(s: Int) = {
      val u = md5Field(col("s"), 8 * s, 8)
      (0 to 7).map(j =>
        when(shiftright(u, 4 * j + 1).bitwiseAND(lit(7L)) === 0, 1L)
          .otherwise(0L)).reduce(_ + _)
    }
    val values = Seq("", "boot:s1:42:7", "ÿüñ ✓", "a\nb\tc") ++
      samples(Gen.asciiPrintableStr, 200).distinct ++
      (0 until 64).map(i => s"boot:s1:$i:${i % 16}")
    val rows = values.toDF("s")
      .select(md5BinWeights4(col("s")).as("packed"),
        weightIdiom(0).as("e0"), weightIdiom(1).as("e1"),
        weightIdiom(2).as("e2"), weightIdiom(3).as("e3"))
      .collect()
    rows.foreach { r =>
      val p = r.getLong(0)
      val got = (0 to 3).map(s => (p >>> (8 * (3 - s))) & 0xFFL)
      val want = (1 to 4).map(i => r.getLong(i))
      assert(got == want, s"packed=$p got=$got want=$want")
    }
    // null input yields null; interpreted eval agrees with codegen
    val out = Seq[String]("x", null).toDF("s")
      .select(md5BinWeights4(col("s")).as("w")).collect()
    assert(!out(0).isNullAt(0) && out(1).isNullAt(0))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = Seq("x").toDF("s")
        .select(md5BinWeights4(col("s"))).as[Long].head()
      assert(interp == out(0).getLong(0))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("15-nibble field stays non-negative (no BIGINT sign wrap)") {
    val values = samples(Gen.asciiPrintableStr, 200).distinct
    val mins = values.toDF("s")
      .agg(min(md5Field(col("s"), 0, 15)), min(md5Field(col("s"), 17, 15)))
      .head()
    assert(mins.getLong(0) >= 0L && mins.getLong(1) >= 0L)
  }

  test("out-of-range windows are rejected at construction") {
    intercept[IllegalArgumentException](md5Field(col("s"), 25, 8))
    intercept[IllegalArgumentException](md5Field(col("s"), 0, 16))
    intercept[IllegalArgumentException](md5Field(col("s"), -1, 4))
  }

  test("null input yields null; interpreted eval agrees with codegen") {
    val out = Seq[String]("x", null).toDF("s")
      .select(md5U32(col("s")).as("h")).collect()
    assert(!out(0).isNullAt(0) && out(1).isNullAt(0))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = Seq("x").toDF("s").select(md5U32(col("s"))).as[Long].head()
      assert(interp == out(0).getLong(0))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("md5_field is SQL-callable via GraftExtensions") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT md5_field('boot:s1:7:3', 8, 8)").as[Long].head()
    val viaCol = Seq("boot:s1:7:3").toDF("s")
      .select(md5Field(col("s"), 8, 8)).as[Long].head()
    assert(viaSql == viaCol)
  }

  test("md5_field SQL misuse fails with a usable AnalysisException, not a cast crash") {
    GraftExtensions.register(spark)
    Seq("boot").toDF("s").createOrReplaceTempView("md5f_args")
    // wrong arity: 2 args instead of 3
    val arity = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT md5_field('x', 8)").collect()
    }
    assert(arity.getMessage.contains("md5_field") &&
      arity.getMessage.contains("3"),
      s"arity error must name the function and expected count: ${arity.getMessage}")
    // non-foldable start argument (a column, not a literal)
    val fold = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT md5_field(s, length(s), 8) FROM md5f_args").collect()
    }
    assert(fold.getMessage.contains("md5_field") &&
      fold.getMessage.contains("foldable"),
      s"non-literal error must explain foldability: ${fold.getMessage}")
    // same validation guards java_hash_bucket's bucket-count argument
    val jh = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT java_hash_bucket(s, length(s)) FROM md5f_args").collect()
    }
    assert(jh.getMessage.contains("java_hash_bucket"))
    // ... and normalize_unicode's form argument (ADVICE r12: previously a
    // bare es(1).eval().toString → IndexOutOfBounds/NPE on misuse)
    val nuArity = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT normalize_unicode('x')").collect()
    }
    assert(nuArity.getMessage.contains("normalize_unicode") &&
      nuArity.getMessage.contains("2"),
      s"arity error must name the function and expected count: ${nuArity.getMessage}")
    val nuFold = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT normalize_unicode(s, s) FROM md5f_args").collect()
    }
    assert(nuFold.getMessage.contains("normalize_unicode") &&
      nuFold.getMessage.contains("foldable"),
      s"non-literal form error must explain foldability: ${nuFold.getMessage}")
    // a foldable NULL literal is a parameter-VALUE error, not a
    // foldability error (ADVICE r13: NON_FOLDABLE_ARGUMENT was misleading
    // for a null literal; before r12 this path was a bare NPE)
    val nuNull = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT normalize_unicode(s, CAST(NULL AS STRING)) FROM md5f_args")
        .collect()
    }
    assert(nuNull.getMessage.contains("normalize_unicode") &&
      nuNull.getMessage.contains("non-NULL") &&
      !nuNull.getMessage.contains("foldable"),
      s"null-literal form error must demand a non-null value: ${nuNull.getMessage}")
    // the happy path still normalizes
    val ok = spark.sql("SELECT normalize_unicode('é', 'NFC') AS n")
      .collect().head.getString(0)
    assert(ok == "é")
    // column-only builders get the same arity guard (r13: java_hash with
    // zero args threw NoSuchElementException; dot_product with one arg
    // threw IndexOutOfBounds)
    val jh0 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT java_hash()").collect()
    }
    assert(jh0.getMessage.contains("java_hash"))
    val dp1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT dot_product(array(1.0D))").collect()
    }
    assert(dp1.getMessage.contains("dot_product") &&
      dp1.getMessage.contains("2"))
  }
}
