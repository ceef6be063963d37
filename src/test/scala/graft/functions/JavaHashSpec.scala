package graft.functions

import graft.SparkSpec
import graft.functions.JavaHash._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class JavaHashSpec extends SparkSpec {
  import spark.implicits._

  private def hashOf(values: Seq[String]): Seq[Int] =
    values.toDF("s").select(javaHash(col("s"))).as[Int].collect().toSeq

  private def samples(g: Gen[String], n: Int): Seq[String] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("javaHash is bit-exact String.hashCode (FIXTURES.md edge fixtures)") {
    val fixtures = Seq("", "a", "13", "hello", "polygenelubricants",
      "device-AB-1234567890", "ÿüñ unicode ✓")
    assert(hashOf(fixtures) == fixtures.map(_.hashCode))
    // polygenelubricants hashes to Int.MinValue — the abs() edge
    assert("polygenelubricants".hashCode == Int.MinValue)
  }

  test("javaHash matches String.hashCode for arbitrary strings (property)") {
    val values = samples(Gen.asciiPrintableStr, 200).distinct
    assert(values.size > 50)
    assert(hashOf(values) == values.map(_.hashCode))
  }

  test("deviceBucket in [0, 32) incl. Int.MinValue hash; matches abs%32") {
    val values = ("polygenelubricants" +: samples(Gen.alphaNumStr, 200)).distinct
    val buckets = values.toDF("s").select(deviceBucket(col("s"), 32)).as[Int].collect()
    assert(buckets.forall(b => b >= 0 && b < 32))
    assert(buckets.toSeq == values.map(s => math.abs(s.hashCode) % 32))
  }

  test("deviceBucket rejects non-power-of-two counts (negative-bucket edge)") {
    // abs(Int.MinValue) % 7 == -2 — the construction must refuse, not emit it
    val err = intercept[IllegalArgumentException] {
      Seq("x").toDF("s").select(deviceBucket(col("s"), 7)).collect()
    }
    assert(err.getMessage.contains("power of two"))
    // powers of two stay fine on the Int.MinValue hash
    val b16 = Seq("polygenelubricants").toDF("s")
      .select(deviceBucket(col("s"), 16)).as[Int].head()
    assert(b16 == 0)
  }

  test("null input yields null, not a crash") {
    val out = Seq[String]("x", null).toDF("s")
      .select(javaHash(col("s")).as("h")).collect()
    assert(out(0).getInt(0) == "x".hashCode)
    assert(out(1).isNullAt(0))
  }

  test("javaHash survives interpreted (non-codegen) eval too") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      assert(hashOf(Seq("abc")) == Seq("abc".hashCode))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
