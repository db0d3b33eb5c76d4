package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Multimodal

class TextMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("fingerprint: position-weighted codepoint sum, hand-computed") {
    // "ab c": 1*97 + 2*98 + 3*32 + 4*99 = 97+196+96+396 = 785
    val got = Seq("ab c").toDF("text")
      .select(TextFunctions.fingerprint(col("text"))).as[Long].head()
    assert(got == 785L)
  }

  test("wordNgrams: bigrams of a known sentence; short docs empty") {
    val got = Seq("a b c d").toDF("t")
      .select(TextFunctions.wordNgrams(TextFunctions.tokens(col("t")), 2)).as[Seq[String]].head()
    assert(got == Seq("a b", "b c", "c d"))
    val short = Seq("solo").toDF("t")
      .select(TextFunctions.wordNgrams(TextFunctions.tokens(col("t")), 2)).as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("langId: marker counts drive the argmax with fixed tie-break") {
    val df = Seq(
      ("the cat is on the mat", "en"),
      ("le chat et la maison et les arbres", "fr"),
      ("xyz qqq zzz", "en") // all-zero scores → tie-break order picks en
    ).toDF("text", "expected")
    val got = df
      .withColumn("toks", TextFunctions.tokens(lower(col("text"))))
      .select(col("expected"), TextFunctions.langId(
        TextFunctions.markerCount(col("toks"), TextFunctions.enMarkers),
        TextFunctions.markerCount(col("toks"), TextFunctions.frMarkers),
        TextFunctions.markerCount(col("toks"), TextFunctions.esMarkers),
        TextFunctions.markerCount(col("toks"), TextFunctions.deMarkers)).as("got"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("multimodal feature extraction: byte stats match hand computation") {
    val docs = Seq((0L, "abc", "en", "s", 3L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val feats = Multimodal.extractFeatures(spark, Multimodal.mediaTable(docs)).collect().head
    assert(feats.n_bytes == 3L)
    assert(feats.byte_sum == (97 + 98 + 99).toLong)
    assert(math.abs(feats.mean_byte - 98.0) < 1e-12)
    assert(feats.media_type == "image/png") // doc_id 0 % 3 == 0
  }

  test("multimodal pipeline preserves row count and carries metadata") {
    val m = Multimodal.mediaTable(Tables.documents(spark, sf))
    val f = Multimodal.extractFeatures(spark, m)
    assert(f.count() == 500)
    assert(f.filter(col("n_bytes") <= 0).count() == 0)
  }

  test("multimodal decode is pluggable: a custom codec replaces the default") {
    val docs = Seq((7L, "abc", "en", "s", 3L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val constCodec = new Multimodal.MediaCodec {
      override def decode(r: Multimodal.MediaRow): Array[Double] =
        Array(1.0, 2.0, 3.0, 4.0, 5.0)
    }
    val got = Multimodal.extractFeatures(spark,
      Multimodal.mediaTable(docs), constCodec).collect().head
    assert(got.n_bytes == 1L && got.byte_sum == 2L &&
      got.mean_byte == 3.0 && got.feat_0 == 4.0 && got.feat_1 == 5.0)
  }
}
