package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Gif, Multimodal, MultimodalQueries}

class TextMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("EnvelopeCodec: bucket peaks, argmax tie-break and range on a planted waveform") {
    import graft.operators.Multimodal
    // 16 samples → 8 buckets of 2; peaks per bucket:
    // [5, 100, 7, 100, 0, 3, 50, 9] → sum 274, max 100 (argmax ties
    // bucket 1), min 0, range 100, mean 34.25
    val samples = Array[Short](5, 2, 100, 1, 7, 6, 99, 100, 0, 0, 3, 1,
      50, 12, 9, -8)
    val wav = Multimodal.synthWav(8000, samples)
    val got = new Multimodal.EnvelopeCodec(8).decode(
      Multimodal.MediaRow(1L, wav, "audio/wav", 0, 0))
    assert(got.toSeq == Seq(wav.length.toDouble, 274.0, 34.25, 1.0, 100.0),
      got.toSeq.toString)
    // degenerate: constant signal → range 0, argmax bucket 0
    val flat = Array.fill[Short](16)(7)
    val got2 = new Multimodal.EnvelopeCodec(8).decode(
      Multimodal.MediaRow(2L, Multimodal.synthWav(8000, flat),
        "audio/wav", 0, 0))
    assert(got2(3) == 0.0 && got2(4) == 0.0 && got2(1) == 56.0)
  }

  test("t26 burstiness: bursty token Fano 2, uniform token Fano 0") {
    import spark.implicits._
    // 2 docs; 'x' appears 4x in doc 1 only → Fano (2·16−16)/(2·4) = 2;
    // 'the' appears once in each → variance 0 → Fano 0
    val docs = Seq(
      (1L, "the x x x x", "en", "s", 11L),
      (2L, "the", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("fano").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("t26_token_burstiness")(spark, dir)
      .collect().map(r => r.getAs[String]("token") ->
        ((r.getAs[Long]("total_count"), r.getAs[Long]("doc_freq"),
          r.getAs[Double]("fano")))).toMap
    assert(out("x") == ((4L, 1L, 2.0)))
    assert(out("the") == ((2L, 2L, 0.0)))
  }

  test("lexicalDiversity: hand-computed types/hapax over planted docs") {
    // en: "a a b" (3 tok, 2 types, 1 hapax) + "b c" (2, 2, 2)
    //   → tokens 5, types 4, hapax 3, ttr 0.8, hapax 0.75
    // fr: "x x" → 2 tokens, 1 type, 0 hapax
    val docs = Seq((1L, "a a b", "en"), (2L, "b c", "en"), (3L, "x x", "fr"))
      .toDF("doc_id", "text", "lang")
    val got = graft.operators.TextQueries.lexicalDiversity(docs)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    assert(got("en") == ((2L, 5L, 4L, 3L, 0.8, 0.75)))
    assert(got("fr") == ((1L, 2L, 1L, 0L, 0.5, 0.0)))
  }

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

  test("quality filter: first failing rule wins; clean docs keep") {
    val mk = (id: Long, text: String) => (id, text, "en", "s", text.length.toLong)
    val docs = Seq(
      mk(0L, "only five tokens right here"),                       // 5 → too_short
      mk(1L, Seq.fill(35)("x").mkString(" ")),                     // 1-char words
      mk(2L, ("the quick brown fox jumps " * 8).trim)              // 40 toks, stopwords
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val res = {
      // the operator body, applied to the synthetic frame
      import graft.functions.TextFunctions._
      docs.withColumn("toks", tokens(lower(col("text"))))
        .withColumn("n_toks", size(col("toks")))
        .withColumn("sum_len", length(regexp_replace(col("text"), "\\s", "")))
        .withColumn("n_stop", markerCount(col("toks"), enMarkers))
        .withColumn("reason",
          when(col("n_toks") < 30, "too_short")
            .when(col("n_toks") > 10000, "too_long")
            .when(col("sum_len") < col("n_toks") * 3, "short_words")
            .when(col("sum_len") > col("n_toks") * 10, "long_words")
            .when(col("n_stop") < 2, "low_stopword")
            .otherwise(lit(null).cast("string")))
        .select(col("doc_id"), col("reason")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    assert(res(0L) == "too_short")
    assert(res(1L) == "short_words")
    assert(res(2L) == null)
  }

  test("boilerplate: cross-doc shared 5-grams flagged, within-doc repeats and short docs not") {
    // docs 1 and 2 share a 10-token prefix => 6 shared 5-grams out of
    // 10 each (14 tokens apiece); doc 3 is all-unique; doc 4 has <5
    // tokens (zero grams) and must keep with frac 0
    val docs = Seq(
      (1L, "every page has this exact same footer line here plus unique alpha beta gamma"),
      (2L, "every page has this exact same footer line here plus other delta words epsilon"),
      (3L, "totally unique content with no shared span at all in this document"),
      (4L, "tiny doc")
    ).toDF("doc_id", "text")
    val out = graft.operators.TextQueries.boilerplate(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_grams") == 10L)
    assert(out(1L).getAs[Long]("n_boiler_grams") == 6L)
    assert(out(1L).getAs[Double]("boiler_frac") == 0.6)
    assert(!out(1L).getAs[Boolean]("keep"))
    assert(out(2L).getAs[Long]("n_boiler_grams") == 6L)
    assert(!out(2L).getAs[Boolean]("keep"))
    assert(out(3L).getAs[Long]("n_boiler_grams") == 0L)
    assert(out(3L).getAs[Boolean]("keep"))
    assert(out(4L).getAs[Long]("n_grams") == 0L)
    assert(out(4L).getAs[Double]("boiler_frac") == 0.0)
    assert(out(4L).getAs[Boolean]("keep"))
  }

  test("repetition signals: dup word/bigram/5-gram fractions hand-computed") {
    // "x x x x x x": 6 tokens, 1 distinct; bigram "x x" ×5; 5-grams ×2, 1 distinct
    import graft.functions.TextFunctions._
    val toks = Seq("x x x x x x").toDF("text")
      .select(tokens(col("text")).as("toks"))
    val row = toks.select(
      size(col("toks")).as("n"),
      size(array_distinct(col("toks"))).as("nd"),
      size(wordNgrams(col("toks"), 5)).as("g5"),
      size(array_distinct(wordNgrams(col("toks"), 5))).as("g5d")).head()
    assert(row.getAs[Int]("n") == 6 && row.getAs[Int]("nd") == 1)
    assert(row.getAs[Int]("g5") == 2 && row.getAs[Int]("g5d") == 1)
  }

  test("sequence packing: contiguous bins fill to capacity, spill allowed") {
    val docs = (0L until 5L).map(i => (i, "t t t", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.operators.Packing.sequencePack(docs, capacity = 6)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("bin_id"), r.getAs[Long]("bin_fill"), r.getAs[Long]("n_docs_in_bin"))).toMap
    // 3 tokens each; offsets 0,3,6,9,12 → bins 0,0,1,1,2
    assert(out(0L) == (0L, 6L, 2L) && out(1L) == (0L, 6L, 2L))
    assert(out(2L) == (1L, 6L, 2L) && out(3L) == (1L, 6L, 2L))
    assert(out(4L) == (2L, 3L, 1L))
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

  test("pii scrub: emails, urls, ids and denylist terms replaced; counts on original") {
    import graft.operators.TextQueries
    val docs = Seq(
      (1L, "mail bob@example.com or http://x.io/a?b=1 ref 1234567 customer data", "en", "s", 0L),
      (2L, "vector of values for a customer stream", "en", "s", 0L),
      (3L, "clean words only", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextQueries.piiScrub(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_email") == 1)
    assert(out(1L).getAs[Long]("n_url") == 1)
    assert(out(1L).getAs[Long]("n_id_number") == 1)
    assert(out(1L).getAs[Long]("n_denylist") == 1)
    assert(out(2L).getAs[Long]("n_denylist") == 3) // vector, customer, stream
    assert(out(3L).getAs[Long]("n_email") == 0 &&
      out(3L).getAs[Long]("scrubbed_len") == "clean words only".length)
    val scrubbed = docs.filter(col("doc_id") === 1L)
      .select(TextQueries.scrubText(col("text"))).as[String].head()
    assert(scrubbed == "mail <EMAIL> or <URL> ref <ID> <TERM> data")
  }

  test("tfidf: hand-computed top terms, deterministic tie-break on term") {
    import graft.operators.TextQueries
    val docs = Seq(
      (1L, "apple banana apple", "en", "s", 0L),
      (2L, "banana cherry", "en", "s", 0L),
      (3L, "cherry durian cherry cherry", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextQueries.tfidfTopTerms(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rnk")) ->
        (r.getAs[String]("term"), r.getAs[Double]("tfidf"))).toMap
    // N=3; df: apple 1, banana 2, cherry 2, durian 1
    assert(out((1L, 1L))._1 == "apple")
    assert(math.abs(out((1L, 1L))._2 - 2 * math.log(3.0)) < 1e-5)
    // doc 2: banana and cherry tie on score (tf=1, df=2) → term asc
    assert(out((2L, 1L))._1 == "banana" && out((2L, 2L))._1 == "cherry")
    // doc 3: cherry 3*ln(1.5)=1.216 beats durian ln(3)=1.099
    assert(out((3L, 1L))._1 == "cherry" && out((3L, 2L))._1 == "durian")
  }

  test("unigram logprob: hand-computed scores on a 2-doc corpus") {
    val docs = Seq(
      (0L, "a a b", "en", "s", 5L),   // vocab: a:2 b:2 c:1, total 5
      (1L, "b c", "en", "s", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    // t9 is table-bound in the registry; rebuild the same plan inline
    val t = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(lower(col("text")))).as("w"))
    val vocab = t.groupBy("w").agg(count(lit(1)).as("wc"))
    val tot = vocab.agg(sum("wc").as("total"))
    val scores = t.join(vocab, "w").crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(round(avg(-log(col("wc").cast("double") / col("total").cast("double"))), 6)
        .as("s"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("s")).toMap
    // doc0: mean of (-ln .4, -ln .4, -ln .4) = -ln 0.4 = 0.916291
    assert(math.abs(scores(0L) - 0.916291) < 1e-6)
    // doc1: mean of (-ln .4, -ln .2) = (0.916291 + 1.609438) / 2
    assert(math.abs(scores(1L) - 1.262864) < 1e-6)
  }

  test("bigram logprob: hand-computed add-one-smoothed scores") {
    val docs = Seq(
      (0L, "a b a", "en", "s", 5L), // bigrams: "a b", "b a"
      (1L, "b a", "en", "s", 3L),   // bigram:  "b a"
      (2L, "x", "en", "s", 1L)      // no bigrams → no output row
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    // corpus: c(a)=3 c(b)=2 c(x)=1, V=3; c("a b")=1, c("b a")=2
    val t = docs.withColumn("toks", TextFunctions.tokens(lower(col("text"))))
    val uc = t.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
    val v = uc.agg(count(lit(1)).as("v"))
    val bi = t.select(col("doc_id"),
      explode(TextFunctions.wordNgrams(col("toks"), 2)).as("bg"))
    val bc = bi.groupBy("bg").agg(count(lit(1)).as("bc"))
    val out = bi.join(bc, "bg")
      .withColumn("w", split(col("bg"), " ").getItem(0))
      .join(uc, "w").crossJoin(broadcast(v))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(-log((col("bc") + 1).cast("double") /
          (col("wc") + col("v")).cast("double"))), 6).as("s"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("s"))).toMap
    val ab = -math.log(2.0 / 6.0) // p(b|a) = (1+1)/(3+3)
    val ba = -math.log(3.0 / 5.0) // p(a|b) = (2+1)/(2+3)
    assert(out.keySet == Set(0L, 1L))
    assert(out(0L)._1 == 2L && math.abs(out(0L)._2 - (ab + ba) / 2) < 1e-6)
    assert(out(1L)._1 == 1L && math.abs(out(1L)._2 - ba) < 1e-6)
  }

  test("perplexity filter: buckets band the score distribution; keep drops the tail") {
    val docs = Tables.documents(spark, sf)
    val out = operators.TextQueries.perplexityFilter(docs).collect()
    assert(out.nonEmpty)
    val byBucket = out.groupBy(_.getAs[String]("bucket"))
      .view.mapValues(_.map(_.getAs[Double]("avg_neg_logprob"))).toMap
    assert(byBucket.keySet.subsetOf(Set("head", "middle", "tail")))
    assert(byBucket.contains("middle"))
    // the bands are ordered: every head score < every middle score
    // < every tail score (strict by construction of the thresholds)
    for (h <- byBucket.get("head"); m <- byBucket.get("middle"))
      assert(h.max < m.min)
    for (m <- byBucket.get("middle"); t <- byBucket.get("tail"))
      assert(m.max < t.min)
    out.foreach { r =>
      assert(r.getAs[Boolean]("keep") == (r.getAs[String]("bucket") != "tail"))
    }
    // score set identical to t13's (the filter only labels, never rescales)
    val t13 = operators.TextQueries.bigramNlp(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_neg_logprob")).toMap
    assert(out.forall(r =>
      t13(r.getAs[Long]("doc_id")) == r.getAs[Double]("avg_neg_logprob")))
  }

  test("feature-hash embedding: deterministic, unit-norm, near-dups closer than strangers") {
    import graft.functions.NativeTextExpressions.featureHashEmbed
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (1L, "the quick brown fox jumps over the lazy cat near the river bank"),
      (2L, "completely unrelated text about distributed query engines and shuffles"),
      (3L, "ab") // below trigram length → zero vector
    ).toDF("doc_id", "text")
    def vecs() = docs.select(col("doc_id"), featureHashEmbed(col("text"), 64).as("v"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Double](1)).toMap
    val v = vecs()
    assert(v == vecs(), "embedding must be deterministic")
    def dot(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(v(0L), v(0L)) - 1.0) < 1e-9, "unit norm")
    assert(v(3L).forall(_ == 0.0), "sub-trigram text embeds as zero")
    val near = dot(v(0L), v(1L))
    val far = dot(v(0L), v(2L))
    assert(near > 0.8, s"one-word edit should stay close, cos=$near")
    assert(near > far + 0.3, s"near=$near must beat unrelated=$far clearly")
  }

  test("WavPcmCodec decodes a real synthesized RIFF/WAVE payload") {
    // 8000 Hz mono 16-bit PCM, 800 samples (100 ms) of a square wave
    // alternating ±8192 → mean |amplitude| = 8192/32768 = 0.25
    val sampleRate = 8000; val n = 800
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits
    bb.put("data".getBytes("US-ASCII")).putInt(2 * n)
    (0 until n).foreach(i => bb.putShort(if (i % 2 == 0) 8192 else -8192))
    val wav = bb.array()

    val media = Seq((1L, wav, "audio/wav", 0, 0))
      .toDF("doc_id", "payload", "media_type", "width", "height")
    val f = Multimodal.extractFeatures(spark, media,
      new Multimodal.WavPcmCodec).collect().head
    assert(f.n_bytes == (44 + 2 * n).toLong) // payload size
    assert(f.byte_sum == n.toLong)           // slot 1 = n_samples
    assert(f.mean_byte == sampleRate.toDouble) // slot 2 = sample rate
    assert(math.abs(f.feat_0 - 0.25) < 1e-9) // mean |amplitude|
    assert(math.abs(f.feat_1 - 100.0) < 1e-9) // duration ms
  }

  test("BmpThumbCodec: known half/half pattern resizes to the expected thumb") {
    // 4×2 image, left half black, right half white → 2×2 thumb:
    // left column luminance 0, right column 255
    val w = 4; val h = 2
    val stride = ((w * 3 + 3) / 4) * 4
    val bmp = Multimodal.synthBmp(w, h, Array.fill[Byte](stride * h)(0))
    val pixelOff = (bmp(10) & 0xff) | ((bmp(11) & 0xff) << 8)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      bmp(pixelOff + y * stride + x * 3 + c) =
        if (x < w / 2) 0.toByte else 255.toByte
    val media = Seq((1L, bmp, "image/bmp", w, h))
      .toDF("doc_id", "payload", "media_type", "width", "height")
    val f = Multimodal.extractFeatures(spark, media,
      new Multimodal.BmpThumbCodec(2, 2)).collect().head
    assert(f.byte_sum == 4L)                    // thumb pixel count
    assert(math.abs(f.mean_byte - 127.5) < 1e-6) // half black, half white
    assert(f.feat_0 == 0.0)                     // top-left lum
    assert(f.feat_1 == 255.0)                   // bottom-right lum
    // constant-color invariance: resize preserves the mean exactly
    val flat = Multimodal.synthBmp(5, 3, Array.fill[Byte](64)(100.toByte))
    val f2 = Multimodal.extractFeatures(spark,
      Seq((2L, flat, "image/bmp", 5, 3))
        .toDF("doc_id", "payload", "media_type", "width", "height"),
      new Multimodal.BmpThumbCodec(2, 2)).collect().head
    assert(math.abs(f2.mean_byte - 100.0) < 1e-6)
  }

  test("imageTiles: quadrant pattern yields per-tile sums; odd sizes crop to the patch multiple") {
    // 8×8 image in four 4×4 quadrants of constant luminance
    // 10/20/30/40 → exactly four tiles whose sums are 48× the value
    val w = 8; val h = 8
    val stride = ((w * 3 + 3) / 4) * 4
    val bmp = Multimodal.synthBmp(w, h, Array.fill[Byte](stride * h)(0))
    val pixelOff = (bmp(10) & 0xff) | ((bmp(11) & 0xff) << 8)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      bmp(pixelOff + y * stride + x * 3 + c) =
        (10 * (1 + (y / 4) * 2 + (x / 4))).toByte
    val media = Seq((1L, bmp, "image/bmp", w, h))
      .toDF("doc_id", "payload", "media_type", "width", "height")
    val tiles = Multimodal.imageTiles(spark, media, patch = 4).collect()
      .map(t => (t.tile_y, t.tile_x) -> (t.lum_sum, t.mean_lum)).toMap
    assert(tiles.size === 4)
    assert(tiles((0L, 0L)) === ((480L, 10.0)))
    assert(tiles((0L, 1L)) === ((960L, 20.0)))
    assert(tiles((1L, 0L)) === ((1440L, 30.0)))
    assert(tiles((1L, 1L)) === ((1920L, 40.0)))
    // 10×9: the grid crops to 2×2 patches (ViT crop) — the right 2
    // columns and bottom row never reach a tile
    val odd = Multimodal.synthBmp(10, 9, Array.fill[Byte](11)(7.toByte))
    val oddTiles = Multimodal.imageTiles(spark,
      Seq((2L, odd, "image/bmp", 10, 9))
        .toDF("doc_id", "payload", "media_type", "width", "height"),
      patch = 4).collect()
    assert(oddTiles.length === 4)
    assert(oddTiles.forall(t => t.tile_y < 2 && t.tile_x < 2))
  }

  test("mixed-codec tiles: PGM quadrants tile like BMP's; SniffRaster dispatches on magic and rejects junk") {
    // 8×8 grayscale PGM in four constant quadrants 10/20/30/40: tile
    // sums are 16× the value (1 channel), means equal the gray level
    // exactly as in the BMP quadrant test — the cross-codec contract
    val w = 8; val h = 8
    val px = Array.tabulate[Byte](w * h)(j =>
      (10 * (1 + ((j / w) / 4) * 2 + ((j % w) / 4))).toByte)
    val pgm = Multimodal.synthPgm(w, h, px)
    // synthPgm cycles src over w*h; src IS w*h bytes, so identity
    val bmp = Multimodal.synthBmp(w, h, Array.fill[Byte](w * 3 * h)(0))
    val pixelOff = (bmp(10) & 0xff) | ((bmp(11) & 0xff) << 8)
    val stride = ((w * 3 + 3) / 4) * 4
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      bmp(pixelOff + y * stride + x * 3 + c) =
        (10 * (1 + (y / 4) * 2 + (x / 4))).toByte
    val media = Seq((1L, bmp, "whatever/lies", w, h),
      (2L, pgm, "metadata/ignored", w, h))
      .toDF("doc_id", "payload", "media_type", "width", "height")
    val tiles = Multimodal.imageTiles(spark, media, patch = 4,
      codec = new Multimodal.SniffRaster).collect()
    assert(tiles.length === 8)
    val byDoc = tiles.groupBy(_.doc_id)
    // both codecs: mean_lum reads the quadrant's gray level
    for (d <- Seq(1L, 2L)) {
      val m = byDoc(d).map(t => (t.tile_y, t.tile_x) -> t.mean_lum).toMap
      assert(m === Map((0L, 0L) -> 10.0, (0L, 1L) -> 20.0,
        (1L, 0L) -> 30.0, (1L, 1L) -> 40.0), s"doc $d means")
    }
    // channel-count-aware sums: 48× for BMP, 16× for PGM
    assert(byDoc(1L).map(t => (t.tile_y, t.tile_x) -> t.lum_sum).toMap
      === Map((0L, 0L) -> 480L, (0L, 1L) -> 960L,
        (1L, 0L) -> 1440L, (1L, 1L) -> 1920L))
    assert(byDoc(2L).map(t => (t.tile_y, t.tile_x) -> t.lum_sum).toMap
      === Map((0L, 0L) -> 160L, (0L, 1L) -> 320L,
        (1L, 0L) -> 480L, (1L, 1L) -> 640L))
    // constant quadrants: a BMP tile of gray g hashes the byte g 48
    // times, a PGM tile 16 times — different byte streams, different
    // hashes (the hash keys CONTENT + layout, as m19 requires)
    assert(byDoc(1L).map(_.tile_hash).toSet
      .intersect(byDoc(2L).map(_.tile_hash).toSet).isEmpty)
    // junk magic fails loudly through the sniffer
    val junk = Seq((3L, "GARBAGE".getBytes("UTF-8"), "x", 1, 1))
      .toDF("doc_id", "payload", "media_type", "width", "height")
    val err = intercept[org.apache.spark.SparkException] {
      Multimodal.imageTiles(spark, junk, patch = 4,
        codec = new Multimodal.SniffRaster).collect()
    }
    assert(err.getMessage != null)
  }

  test("subimage index/probe split: per-batch probes union to the single-shot matcher") {
    // st35's contract: the frequency guard lives in the STATIC index
    // (computed once over the catalog), and the doc_a < doc_b probe
    // orientation emits each pair exactly once — in the batch where
    // its higher-id doc arrives — so any batching unions to
    // subimageMatches' answer
    def media(rows: Seq[(Long, String)]) = rows.map { case (id, txt) =>
      (id, Multimodal.synthBmp(8, 8, txt.getBytes("UTF-8")), "image/bmp", 8, 8)
    }.toDF("doc_id", "payload", "media_type", "width", "height")
    // docs 1/2 identical content (4 shared tiles), 3 different,
    // 4 identical to 1/2 again (pairs 1-2, 1-4, 2-4)
    val all = media(Seq(1L -> "copied pixel content", 2L -> "copied pixel content",
      3L -> "totally different bytes", 4L -> "copied pixel content"))
    val tiles = Multimodal.imageTiles(spark, all, patch = 4).toDF()
    val single = Multimodal.subimageMatches(tiles).collect()
      .map(_.toString).sorted.toSeq
    val index = Multimodal.subimageIndex(tiles)
    def probe(ids: Long*) = Multimodal.subimageProbePrepped(index,
      tiles.filter(col("doc_id").isin(ids.map(Long.box): _*)))
    val batched = probe(1L, 2L).unionByName(probe(3L)).unionByName(probe(4L))
    assert(batched.collect().map(_.toString).sorted.toSeq === single)
    assert(single.nonEmpty) // the planted copies actually pair
    // orientation: doc 4's batch carries exactly the pairs ending at 4
    assert(probe(4L).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((1L, 4L), (2L, 4L)))
    // and doc 1's batch carries none (no lower-id partner exists)
    assert(probe(1L).collect().isEmpty)
  }

  test("tokenizer fertility: per-lang sums equal t21's per-doc counts aggregated; ratios consistent") {
    val docs = graft.Tables.documents(spark, sf)
    val manual = docs.select(col("doc_id"), col("lang"))
      .join(graft.operators.Bpe.bpeTokens(docs), "doc_id")
      .groupBy("lang")
      .agg(sum("n_words").as("w"), sum("n_bpe_tokens").as("t")).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("w"), r.getAs[Long]("t"))).toMap
    val out = SparkEntry.queries("t27_tokenizer_fertility")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val lang = r.getAs[String]("lang")
      assert(r.getAs[Long]("n_words") === manual(lang)._1, lang)
      assert(r.getAs[Long]("n_bpe_tokens") === manual(lang)._2, lang)
      val fert = r.getAs[Double]("fertility")
      assert(fert > 0.0 && fert ===
        math.round(manual(lang)._2.toDouble / manual(lang)._1 * 1e6) / 1e6, lang)
    }
  }

  test("subimageMatches: shared pixel regions pair up; ubiquitous tiles are guarded out") {
    // docs 1 and 2 carry identical pixel content (same source bytes,
    // same 8×8 size) → every tile hash matches; doc 3 differs
    val src1 = Array.tabulate[Byte](64)(i => (i * 7 + 1).toByte)
    val src3 = Array.tabulate[Byte](64)(i => (i * 11 + 5).toByte)
    def mk(id: Long, src: Array[Byte]) =
      (id, Multimodal.synthBmp(8, 8, src), "image/bmp", 8, 8)
    val media = Seq(mk(1L, src1), mk(2L, src1), mk(3L, src3))
      .toDF("doc_id", "payload", "media_type", "width", "height")
    val tiles = Multimodal.imageTiles(spark, media).toDF()
    val pairs = Multimodal.subimageMatches(tiles).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet === Set((1L, 2L)))
    assert(pairs((1L, 2L)) >= 2L)
    // ubiquity guard: 20 constant-color docs share one tile hash —
    // carried by >16 docs it is dropped BEFORE the self-join, so the
    // flat-tile hot block never forms a pair
    val flat = (10L to 29L).map(id =>
      (id, Multimodal.synthBmp(8, 8, Array.fill[Byte](64)(42)), "image/bmp", 8, 8))
      .toDF("doc_id", "payload", "media_type", "width", "height")
    val flatTiles = Multimodal.imageTiles(spark, flat).toDF()
    assert(Multimodal.subimageMatches(flatTiles).count() === 0L)
    // ...and raising the cap past the corpus size restores the pairs
    // (a constant-color doc has ONE distinct tile hash, so the shared
    // count is 1 — minShared must come down with it)
    assert(Multimodal.subimageMatches(flatTiles, minShared = 1,
      maxDocsPerTile = 100).count() === (20L * 19L) / 2L)
  }

  test("FrameSampleCodec: sampled frames match hand-computed stats; stride 1 = full") {
    // 256 samples = 4 frames of 64; frames alternate amplitude
    // 8192 / 16384 / 8192 / 16384; stride 2 samples frames 0 and 2
    val samples = Array.tabulate[Short](256)(i =>
      (if ((i / 64) % 2 == 0) 8192 else 16384).toShort)
    val wav = Multimodal.synthWav(8000, samples)
    val media = Seq((1L, wav, "audio/wav", 0, 0))
      .toDF("doc_id", "payload", "media_type", "width", "height")
    val f = Multimodal.extractFeatures(spark, media,
      new Multimodal.FrameSampleCodec(64, 2)).collect().head
    assert(f.byte_sum == 2L)        // frames sampled
    assert(f.feat_0 == 4.0)         // frames total
    assert(f.feat_1 == 8000.0)      // sample rate
    assert(math.abs(f.mean_byte - 0.25) < 1e-6) // both sampled frames at 8192
    val full = Multimodal.extractFeatures(spark, media,
      new Multimodal.FrameSampleCodec(64, 1)).collect().head
    assert(full.byte_sum == 4L)
    assert(math.abs(full.mean_byte - 0.375) < 1e-6) // (0.25 + 0.5) / 2
  }

  test("WavPcmCodec rejects non-WAV payloads loudly") {
    val junk = Seq((2L, "not a wav".getBytes("UTF-8"), "audio/wav", 0, 0))
      .toDF("doc_id", "payload", "media_type", "width", "height")
    val err = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(spark, junk, new Multimodal.WavPcmCodec).collect()
    }
    assert(err.getMessage != null)
  }

  test("BmpCodec decodes a hand-built 24-bpp BMP exactly") {
    // 2×2, pixels cycle src = [10, 20, 30]: 12 channel bytes →
    // 10,20,30,10,20,30,... mean = 20. File = 54 + 2 rows × 8-byte
    // stride (2*3 = 6 pixel bytes + 2 padding).
    val bmp = Multimodal.synthBmp(2, 2, Array[Byte](10, 20, 30))
    assert(bmp.length == 54 + 2 * 8)
    val media = Seq((7L, bmp, "image/bmp", 2, 2))
      .toDF("doc_id", "payload", "media_type", "width", "height")
    val f = Multimodal.extractFeatures(spark, media,
      new Multimodal.BmpCodec).collect().head
    assert(f.n_bytes == bmp.length.toLong)
    assert(f.byte_sum == 4L)               // slot 1 = n_pixels
    assert(math.abs(f.mean_byte - 20.0) < 1e-9) // mean pixel value
    assert(f.feat_0 == 2.0 && f.feat_1 == 2.0)  // decoded width/height
  }

  test("m3: decoded BMP dimensions re-derive the synth metadata from bytes") {
    val out = graft.SparkEntry.queries("m3_image_meta")(spark, sf)
      .select(col("doc_id"), col("feat_0"), col("feat_1")).collect()
    assert(out.length > 0)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getDouble(1) == (2 + id % 6).toDouble, s"width mismatch doc $id")
      assert(r.getDouble(2) == (2 + id % 4).toDouble, s"height mismatch doc $id")
    }
  }

  test("PgmCodec decodes synthesized and comment-laden P5 images exactly") {
    // 2×3 grays cycling [10, 20, 30]: mean = 20, dims re-derived
    val pgm = Multimodal.synthPgm(2, 3, Array[Byte](10, 20, 30))
    val media = Seq((7L, pgm, "image/x-pgm", 2, 3))
      .toDF("doc_id", "payload", "media_type", "width", "height")
    val f = Multimodal.extractFeatures(spark, media,
      new Multimodal.PgmCodec).collect().head
    assert(f.n_bytes == pgm.length.toLong)
    assert(f.byte_sum == 6L)                    // n_pixels
    assert(math.abs(f.mean_byte - 20.0) < 1e-9) // mean gray
    assert(f.feat_0 == 2.0 && f.feat_1 == 3.0)  // decoded dims
    // header comments (Netpbm allows them anywhere in the header)
    val commented = ("P5\n# made by graft\n2 2\n# maxval next\n255\n"
      .getBytes("US-ASCII")) ++ Array[Byte](40, 40, 40, 40)
    val f2 = Multimodal.extractFeatures(spark,
      Seq((8L, commented, "image/x-pgm", 2, 2))
        .toDF("doc_id", "payload", "media_type", "width", "height"),
      new Multimodal.PgmCodec).collect().head
    assert(f2.byte_sum == 4L && math.abs(f2.mean_byte - 40.0) < 1e-9)
    // loud failures: wrong magic, truncated raster, 16-bit maxval,
    // Int-overflowing dims (65535×65535 wraps w*h negative — must not
    // slip past the raster check), a >10-digit header token (wraps the
    // accumulator itself), and a zero dimension
    Seq("P6\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4),
      Multimodal.synthPgm(4, 4, Array[Byte](1)).dropRight(8),
      "P5\n2 2\n65535\n".getBytes("US-ASCII") ++ new Array[Byte](8),
      "P5\n65535 65535\n255\n".getBytes("US-ASCII") ++ new Array[Byte](16),
      "P5\n42949672970 2\n255\n".getBytes("US-ASCII") ++ new Array[Byte](16),
      "P5\n0 2\n255\n".getBytes("US-ASCII") ++ new Array[Byte](8))
      .zipWithIndex.foreach { case (bad, i) =>
        val e = intercept[org.apache.spark.SparkException] {
          Multimodal.extractFeatures(spark,
            Seq(((100 + i).toLong, bad, "image/x-pgm", 0, 0))
              .toDF("doc_id", "payload", "media_type", "width", "height"),
            new Multimodal.PgmCodec).collect()
        }
        assert(e.getMessage != null)
      }
  }

  test("m7: decoded PGM dimensions re-derive the synth metadata from bytes") {
    val out = graft.SparkEntry.queries("m7_pgm_decode")(spark, sf)
      .select(col("doc_id"), col("feat_0"), col("feat_1")).collect()
    assert(out.length > 0)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getDouble(1) == (2 + id % 6).toDouble, s"width mismatch doc $id")
      assert(r.getDouble(2) == (2 + id % 4).toDouble, s"height mismatch doc $id")
    }
  }

  test("BmpCodec rejects truncated and non-BMP payloads loudly") {
    val bad = Multimodal.synthBmp(4, 4, Array[Byte](1, 2, 3)).dropRight(10)
    val junk = Seq((1L, "nope".getBytes("UTF-8"), "image/bmp", 0, 0),
      (2L, bad, "image/bmp", 4, 4))
      .toDF("doc_id", "payload", "media_type", "width", "height")
    val err = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(spark, junk, new Multimodal.BmpCodec).collect()
    }
    assert(err.getMessage != null)
  }

  test("quarantine decode: good rows equal the strict path exactly; corrupt rows carry the diagnostic; strict still throws") {
    // planted mixed batch: two clean BMPs + the two m20 corruption
    // classes (magic/size kill, intact-header-missing-raster)
    val clean1 = Multimodal.synthBmp(3, 2, "hello".getBytes("UTF-8"))
    val clean2 = Multimodal.synthBmp(2, 4, "world!".getBytes("UTF-8"))
    val cut20 = java.util.Arrays.copyOf(clean1, 20)
    val cut56 = java.util.Arrays.copyOf(clean2, 56)
    val media = Seq(
      (1L, clean1, "image/bmp", 3, 2), (2L, cut20, "image/bmp", 3, 2),
      (3L, clean2, "image/bmp", 2, 4), (4L, cut56, "image/bmp", 2, 4))
      .toDF("doc_id", "payload", "media_type", "width", "height")
    val out = Multimodal.extractFeaturesQuarantine(spark, media,
      new Multimodal.BmpCodec).collect().sortBy(_.doc_id)
    // good rows: byte-identical to the strict path on the clean subset
    val strict = Multimodal.extractFeatures(spark,
      media.filter($"doc_id".isin(1L, 3L)), new Multimodal.BmpCodec)
      .collect().sortBy(_.doc_id)
    val good = out.filter(_.ok)
    assert(good.map(_.doc_id).toSeq == Seq(1L, 3L))
    good.zip(strict).foreach { case (q, s) =>
      assert(q.error.isEmpty)
      assert((q.n_bytes.get, q.byte_sum.get, q.mean_byte.get,
        q.feat_0.get, q.feat_1.get) ===
        (s.n_bytes, s.byte_sum, s.mean_byte, s.feat_0, s.feat_1))
    }
    // quarantined rows: decoder diagnostic in-band, feature slots null
    val bad = out.filterNot(_.ok)
    assert(bad.map(_.doc_id).toSeq == Seq(2L, 4L))
    assert(bad(0).error.get == "doc 2: not a BMP payload")
    assert(bad(1).error.get == "doc 4: truncated pixel array")
    assert(bad.forall(b => b.n_bytes.isEmpty && b.byte_sum.isEmpty &&
      b.mean_byte.isEmpty && b.feat_0.isEmpty && b.feat_1.isEmpty))
    // strict mode is unchanged: the same batch still fails fast
    intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(spark, media, new Multimodal.BmpCodec).collect()
    }
  }

  test("tile quarantine: good tiles byte-identical to the strict grid; junk docs in-band; strict still throws") {
    val bmp = Multimodal.synthBmp(8, 8, "hello".getBytes("UTF-8"))
    val pgm = Multimodal.synthPgm(8, 8, "world!".getBytes("UTF-8"))
    val junk = Array[Byte](0x4a, 0x4b, 0x4c) // no raster magic
    val media = Seq(
      (1L, bmp, "image/bmp", 8, 8), (2L, junk, "image/bmp", 8, 8),
      (3L, pgm, "image/x-pgm", 8, 8))
      .toDF("doc_id", "payload", "media_type", "width", "height")
    val out = Multimodal.imageTilesQuarantine(spark, media, patch = 4,
      codec = new Multimodal.SniffRaster).collect()
    // good rows: the strict grid's TileRows verbatim (shared loop)
    val strict = Multimodal.imageTiles(spark,
      media.filter($"doc_id".isin(1L, 3L)), patch = 4,
      codec = new Multimodal.SniffRaster).collect()
      .map(t => (t.doc_id, t.tile_y, t.tile_x, t.lum_sum, t.mean_lum,
        t.tile_hash)).toSet
    val good = out.filter(_.ok)
      .map(q => (q.doc_id, q.tile_y.get, q.tile_x.get, q.lum_sum.get,
        q.mean_lum.get, q.tile_hash.get)).toSet
    assert(good == strict && good.size == 8) // 2 docs × 2×2 tiles
    assert(out.filter(_.ok).forall(_.error.isEmpty))
    // the junk doc: exactly ONE in-band row, the codec's diagnostic,
    // every tile field null
    val bad = out.filterNot(_.ok)
    assert(bad.map(_.doc_id).toSeq == Seq(2L))
    assert(bad.head.error.get == "doc 2: unrecognized raster magic")
    assert(bad.head.tile_y.isEmpty && bad.head.tile_x.isEmpty &&
      bad.head.lum_sum.isEmpty && bad.head.mean_lum.isEmpty &&
      bad.head.tile_hash.isEmpty)
    // strict mode unchanged: the same batch still fails fast
    intercept[org.apache.spark.SparkException] {
      Multimodal.imageTiles(spark, media, patch = 4,
        codec = new Multimodal.SniffRaster).collect()
    }
  }

  test("PngCodec fully decodes a synthesized truecolor PNG (inflate + unfilter)") {
    // 2×2, pixels cycle [10, 20, 30] with no row padding in PNG, so
    // 12 channel bytes → mean exactly 20
    val png = Multimodal.synthPng(2, 2, Array[Byte](10, 20, 30))
    val media = Seq((7L, png, "image/png", 2, 2))
      .toDF("doc_id", "payload", "media_type", "width", "height")
    val f = Multimodal.extractFeatures(spark, media,
      new Multimodal.PngCodec).collect().head
    assert(f.n_bytes == png.length.toLong)
    assert(f.byte_sum == 4L)                    // slot 1 = n_pixels
    assert(math.abs(f.mean_byte - 20.0) < 1e-9) // mean pixel value
    assert(f.feat_0 == 2.0 && f.feat_1 == 2.0)  // decoded width/height
  }

  test("PngCodec reconstructs Sub/Up/Average/Paeth filtered scanlines") {
    // hand-build a 3×4 PNG whose rows use filters 1..4: apply each
    // filter FORWARD to known pixels here, deflate, wrap in chunks —
    // the decoder must invert the filters and recover the exact mean
    val w = 3; val h = 4
    val pixels = Array.tabulate(h, w * 3)((r, c) => ((r * 37 + c * 11) % 256))
    val stride = 1 + w * 3
    val raw = new Array[Byte](stride * h)
    for (r <- 0 until h) {
      val filter = r + 1 // 1=Sub, 2=Up, 3=Average, 4=Paeth
      raw(r * stride) = filter.toByte
      def orig(rr: Int, cc: Int) = if (rr < 0 || cc < 0) 0 else pixels(rr)(cc)
      def paeth(a: Int, b: Int, c: Int): Int = {
        val p = a + b - c
        val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
        if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
      }
      for (c <- 0 until w * 3) {
        val x = orig(r, c); val left = orig(r, c - 3)
        val up = orig(r - 1, c); val ul = orig(r - 1, c - 3)
        val filtered = filter match {
          case 1 => (x - left) & 0xff
          case 2 => (x - up) & 0xff
          case 3 => (x - (left + up) / 2) & 0xff
          case 4 => (x - paeth(left, up, ul)) & 0xff
        }
        raw(r * stride + 1 + c) = filtered.toByte
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val bos = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) bos.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    def be32(v: Int) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(kind: String, data: Array[Byte]) = {
      val crc = new java.util.zip.CRC32()
      val kb = kind.getBytes("US-ASCII"); crc.update(kb); crc.update(data)
      be32(data.length) ++ kb ++ data ++ be32(crc.getValue.toInt)
    }
    val png = Array[Byte](137.toByte, 'P', 'N', 'G', 13, 10, 26, 10) ++
      chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)) ++
      chunk("IDAT", bos.toByteArray) ++ chunk("IEND", Array.empty[Byte])
    val media = Seq((9L, png, "image/png", w, h))
      .toDF("doc_id", "payload", "media_type", "width", "height")
    val f = Multimodal.extractFeatures(spark, media,
      new Multimodal.PngCodec).collect().head
    val want = pixels.flatten.map(_.toLong).sum.toDouble / (w * h * 3)
    assert(math.abs(f.mean_byte - math.round(want * 1e6) / 1e6) < 1e-9)
    assert(f.feat_0 == w.toDouble && f.feat_1 == h.toDouble)
  }

  test("m4: PNG and BMP codecs agree on identical pixel content") {
    // same (w, h, src) → same pixel stream through two INDEPENDENT
    // parsers (zlib+unfilter vs raw strided rows): n_pixels, mean and
    // dimensions must match exactly
    for (id <- 0L to 5L) {
      val w = (2 + id % 6).toInt; val h = (2 + id % 4).toInt
      val src = s"doc-$id-content".getBytes("UTF-8")
      val both = Seq(
        (id, Multimodal.synthPng(w, h, src), "image/png", w, h),
        (id + 100, Multimodal.synthBmp(w, h, src), "image/bmp", w, h))
      val png = Multimodal.extractFeatures(spark,
        Seq(both(0)).toDF("doc_id", "payload", "media_type", "width", "height"),
        new Multimodal.PngCodec).collect().head
      val bmp = Multimodal.extractFeatures(spark,
        Seq(both(1)).toDF("doc_id", "payload", "media_type", "width", "height"),
        new Multimodal.BmpCodec).collect().head
      assert(png.byte_sum == bmp.byte_sum, s"n_pixels diverge for doc $id")
      assert(png.mean_byte == bmp.mean_byte, s"mean diverges for doc $id")
      assert(png.feat_0 == bmp.feat_0 && png.feat_1 == bmp.feat_1)
    }
  }

  test("PngCodec rejects corrupt and non-PNG payloads loudly") {
    val bad = Multimodal.synthPng(4, 4, Array[Byte](1, 2, 3)).dropRight(16)
    val junk = Seq((1L, "nope".getBytes("UTF-8"), "image/png", 0, 0),
      (2L, bad, "image/png", 4, 4))
      .toDF("doc_id", "payload", "media_type", "width", "height")
    val err = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(spark, junk, new Multimodal.PngCodec).collect()
    }
    assert(err.getMessage != null)
  }

  import graft.operators.Jpeg

  test("Jpeg: constant-gray image round-trips EXACTLY through encode+decode") {
    // constant 200 → every block is DC-only; with flat q=1 the DC
    // coefficient ((200−128)·8 = 576) quantizes losslessly, so decode
    // must reproduce the exact pixel value everywhere
    val img = Jpeg.decode(Jpeg.synth(16, 8, Array.fill[Byte](16 * 8)(200.toByte)))
    assert(img.width == 16 && img.height == 8 && img.nComponents == 1)
    assert(img.luma.forall(_ == 200), s"distinct values: ${img.luma.distinct.toSeq}")
  }

  test("Jpeg: patterned grayscale mean luma survives within quantization error") {
    val w = 24; val h = 16
    val src = Array.tabulate[Byte](w * h)(i => ((i * 7 + 13) % 251).toByte)
    val img = Jpeg.decode(Jpeg.synth(w, h, src))
    assert(img.width == w && img.height == h)
    val srcMean = src.map(_ & 0xff).sum.toDouble / (w * h)
    val decMean = img.luma.sum.toDouble / (w * h)
    assert(math.abs(decMean - srcMean) < 1.5,
      s"mean drifted: src $srcMean dec $decMean")
    // per-pixel reconstruction, not just the mean: flat q=1 bounds the
    // coefficient error, so every pixel lands within a few counts
    val maxErr = img.luma.indices.map(i =>
      math.abs(img.luma(i) - (src(i) & 0xff))).max
    assert(maxErr <= 3, s"max per-pixel error $maxErr")
  }

  test("Jpeg: 4:4:4 color encode/decode reconstructs the Y plane") {
    val w = 8; val h = 8
    val rgb = Array.tabulate[Byte](w * h * 3)(i => ((i * 11 + 5) % 256).toByte)
    val img = Jpeg.decode(Jpeg.synth(w, h, rgb, planes = 3))
    assert(img.nComponents == 3 && img.width == w && img.height == h)
    val yMean = (0 until w * h).map { p =>
      0.299 * (rgb(3 * p) & 0xff) + 0.587 * (rgb(3 * p + 1) & 0xff) +
        0.114 * (rgb(3 * p + 2) & 0xff)
    }.sum / (w * h)
    val decMean = img.luma.sum.toDouble / (w * h)
    assert(math.abs(decMean - yMean) < 1.5, s"Y mean: src $yMean dec $decMean")
  }

  test("Jpeg: restart markers (DRI/RSTn) decode identically to the plain stream") {
    val w = 32; val h = 16 // 4×2 MCUs → RSTs fire at interval 2
    val src = Array.tabulate[Byte](w * h)(i => ((i * 3 + 101) % 256).toByte)
    val plain = Jpeg.decode(Jpeg.synth(w, h, src))
    val restarted = Jpeg.decode(Jpeg.synth(w, h, src, restartInterval = 2))
    assert(plain.luma.toSeq == restarted.luma.toSeq)
  }

  test("Jpeg 4:2:0: decoded luma is bit-identical to the 4:4:4 encode of the same pixels") {
    // subsampling touches only chroma: the luma blocks, their order
    // within the 16×16 MCU, their content (same edge replication) and
    // the flat quantization are all identical — so the reconstructed
    // Y planes must match EXACTLY, including partial-MCU edges
    for ((w, h) <- Seq((16, 16), (20, 12), (9, 23), (33, 17))) {
      val rgb = Array.tabulate[Byte](w * h * 3)(i => ((i * 5 + 37) % 256).toByte)
      val full = Jpeg.decode(Jpeg.synth(w, h, rgb, planes = 3))
      val sub = Jpeg.decode(Jpeg.synth(w, h, rgb, planes = 3, chromaSub = 2))
      assert(sub.width == w && sub.height == h)
      assert(full.luma.toSeq == sub.luma.toSeq, s"$w x $h luma drifted")
    }
  }

  test("Jpeg 4:2:0: restart markers and constant images behave as in 4:4:4") {
    val w = 40; val h = 18 // 3×2 MCUs of 16×16, both edges partial
    val rgb = Array.tabulate[Byte](w * h * 3)(i => ((i * 11 + 3) % 256).toByte)
    val plain = Jpeg.decode(Jpeg.synth(w, h, rgb, planes = 3, chromaSub = 2))
    val restarted = Jpeg.decode(
      Jpeg.synth(w, h, rgb, planes = 3, restartInterval = 2, chromaSub = 2))
    assert(plain.luma.toSeq == restarted.luma.toSeq)
    // constant gray: DC-only luma blocks at q=1 reconstruct exactly
    val const = Jpeg.decode(Jpeg.synth(w, h,
      Array.fill[Byte](w * h * 3)(180.toByte), planes = 3, chromaSub = 2))
    assert(const.luma.forall(_ == 180), const.luma.distinct.toSeq.toString)
  }

  test("Jpeg: subsampled-CHROMA-factor streams (chroma != 1x1) fail loudly") {
    val good = Jpeg.synth(16, 16,
      Array.fill[Byte](16 * 16 * 3)(90), planes = 3, chromaSub = 2)
    val sofAt = (0 until good.length - 1).find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0).get
    // SOF0 payload: len2 prec1 h2 w2 nc1, then (id samp qtab) triples —
    // comp2's sampling byte sits at +14; patch it to 2×1
    val bad = good.clone(); bad(sofAt + 14) = 0x21.toByte
    val e = intercept[IllegalArgumentException](Jpeg.decode(bad))
    assert(e.getMessage.contains("chroma factors"))
  }

  test("Jpeg: progressive, subsampled, truncated and junk payloads fail loudly") {
    val good = Jpeg.synth(8, 8, Array.fill[Byte](64)(90))
    // flip SOF0 (0xffc0) → SOF2 (progressive)
    val sofAt = (0 until good.length - 1).find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0).get
    val prog = good.clone(); prog(sofAt + 1) = 0xc2.toByte
    val e1 = intercept[IllegalArgumentException](Jpeg.decode(prog))
    assert(e1.getMessage.contains("progressive"))
    // patch the sampling byte (SOF0 payload: len2 prec1 h2 w2 nc1 id1 SAMP)
    val sub = good.clone(); sub(sofAt + 11) = 0x22.toByte
    val e2 = intercept[IllegalArgumentException](Jpeg.decode(sub))
    assert(e2.getMessage.contains("subsampling"))
    intercept[IllegalArgumentException](Jpeg.decode(good.dropRight(20)))
    intercept[IllegalArgumentException](Jpeg.decode("nope".getBytes("UTF-8")))
  }

  test("Gif: LZW round-trips are byte-exact, including code-width boundary rasters") {
    // LZW is lossless: decoded indices must EQUAL the source bytes
    for ((w, h) <- Seq((1, 1), (3, 5), (16, 16), (40, 25), (64, 64))) {
      val src = Array.tabulate[Byte](w * h)(i => ((i * 7 + 13) % 256).toByte)
      val d = Gif.decode(Gif.synth(w, h, src), 0L)
      assert(d.width == w && d.height == h)
      assert(d.gray.toSeq == src.toSeq, s"$w x $h raster drifted")
    }
    // constant image (maximally compressible) and a high-entropy one
    // large enough to push the code width past 9 and 10 bits
    val const = Array.fill[Byte](50 * 40)(77)
    assert(Gif.decode(Gif.synth(50, 40, const), 0L).gray.toSeq == const.toSeq)
    val rnd = new scala.util.Random(7)
    val noisy = Array.fill[Byte](120 * 90)(rnd.nextInt(256).toByte)
    assert(Gif.decode(Gif.synth(120, 90, noisy), 0L).gray.toSeq == noisy.toSeq)
  }

  test("Gif: interlace, truncation, junk and extension handling") {
    val good = Gif.synth(8, 8, Array.tabulate[Byte](64)(_.toByte))
    // image descriptor flags byte: header 13 + palette 768 + 9 → +9
    val descAt = 13 + 768
    assert((good(descAt) & 0xff) == 0x2c, "fixture drifted")
    val inter = good.clone(); inter(descAt + 9) = 0x40.toByte
    val e1 = intercept[IllegalArgumentException](Gif.decode(inter, 1L))
    assert(e1.getMessage.contains("interlaced"))
    intercept[IllegalArgumentException](Gif.decode(good.dropRight(12), 2L))
    intercept[IllegalArgumentException](Gif.decode("GIF99a junk".getBytes("US-ASCII"), 3L))
    // a GIF89a graphic-control extension before the descriptor is
    // SKIPPED, not fatal
    val ext = Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0)
    val withExt = good.take(descAt) ++ ext ++ good.drop(descAt)
    withExt(4) = '9'.toByte // GIF89a... version bytes are 3..5
    val patched = withExt.clone(); patched(3) = '8'; patched(4) = '9'
    assert(Gif.decode(patched, 4L).gray.length == 64)
  }

  test("animated Gif: every frame round-trips byte-exactly; frame sampling decimates correctly") {
    // 4 distinct frames: decodeFrames must return all of them in order
    val (w, h) = (7, 5)
    val frames = Seq.tabulate(4)(f =>
      Array.tabulate[Byte](w * h)(j => ((j * 3 + f * 11) % 256).toByte))
    val gif = Gif.synthAnimated(w, h, frames)
    val decoded = Gif.decodeFrames(gif, 0L)
    assert(decoded.size == 4)
    decoded.zip(frames).foreach { case (d, src) =>
      assert(d.width == w && d.height == h)
      assert(d.gray.toSeq == src.toSeq)
    }
    // single-frame animation ≡ the single-image decoder's answer
    val one = Gif.synthAnimated(w, h, frames.take(1))
    assert(Gif.decodeFrames(one, 1L).head.gray.toSeq ==
      frames.head.toSeq)
    // stride-2 sampling: frames 0 and 2 only — hand-computed mean
    val row = Seq((9L, gif, "image/gif", w, h))
      .toDF("doc_id", "payload", "media_type", "width", "height")
    val f2 = Multimodal.extractFeatures(spark, row,
      new Gif.FrameSampleGifCodec(2)).collect().head
    assert(f2.n_bytes == 4L && f2.byte_sum == 2L) // 4 frames, 2 sampled
    val expSum = Seq(0, 2).flatMap(f => frames(f).map(_ & 0xff)).map(_.toLong).sum
    val expMean = math.round(expSum.toDouble / (2 * w * h) * 1e6) / 1e6
    assert(f2.mean_byte == expMean && f2.feat_0 == w && f2.feat_1 == h)
    // stride 1 ≡ featurize everything (the m6 stride-1 invariant)
    val f1 = Multimodal.extractFeatures(spark, row,
      new Gif.FrameSampleGifCodec(1)).collect().head
    val allMean = math.round(frames.flatMap(_.map(_ & 0xff)).map(_.toLong).sum
      .toDouble / (4 * w * h) * 1e6) / 1e6
    assert(f1.byte_sum == 4L && f1.mean_byte == allMean)
  }

  test("m9: decoded GIF dimensions re-derive the synth metadata; mean equals the exact source mean") {
    val out = SparkEntry.queries("m9_gif_decode")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Double]("feat_0") == (3 + id % 8).toDouble, s"doc $id width")
      assert(r.getAs[Double]("feat_1") == (3 + id % 5).toDouble, s"doc $id height")
      val mean = r.getAs[Double]("mean_byte")
      assert(mean >= 0.0 && mean <= 255.0)
    }
  }

  test("m8: decoded JPEG dimensions re-derive the synth metadata from bytes") {
    val out = MultimodalQueries.jpegFeatures(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Double]("feat_0") == (8 + id % 9).toDouble, s"doc $id width")
      assert(r.getAs[Double]("feat_1") == (8 + id % 7).toDouble, s"doc $id height")
      val mean = r.getAs[Double]("mean_byte")
      assert(mean >= 0.0 && mean <= 255.0)
    }
  }

  test("m10: decoded 4:2:0 JPEG dimensions re-derive the synth metadata from bytes") {
    val out = MultimodalQueries.jpeg420Features(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Double]("feat_0") == (9 + id % 14).toDouble, s"doc $id width")
      assert(r.getAs[Double]("feat_1") == (9 + id % 11).toDouble, s"doc $id height")
      val mean = r.getAs[Double]("mean_byte")
      assert(mean >= 0.0 && mean <= 255.0)
    }
  }

  test("t21 BPE: hand-derived merges, tie-breaks, greedy application and doc counts") {
    import spark.implicits._
    // dictionary: low×6, lower×2, lowest×1, new×3, newer×4. Weighted
    // pair counts round 1: l-o 9, o-w 9 (tie → ('l','o') wins the
    // lexicographic tie-break), then (lo,w) 9, then e-w vs n-e tie at
    // 7 → ('e','w'), then (n,ew) 7. Final tokens: low=1,
    // lower=[low,e,r]=3, lowest=[low,e,s,t]=4, new=1, newer=[new,e,r]=3.
    val (merges, ntok) = graft.operators.Bpe.trainMerges(
      Seq("low" -> 6L, "lower" -> 2L, "lowest" -> 1L,
        "new" -> 3L, "newer" -> 4L), nMerges = 4)
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("e", "w"), ("n", "ew")),
      merges.toString)
    assert(ntok == Map("low" -> 1, "lower" -> 3, "lowest" -> 4,
      "new" -> 1, "newer" -> 3), ntok.toString)
    // greedy left-to-right non-overlap: "aaa" + (a,a) -> [aa, a]
    assert(graft.operators.Bpe.applyMerge(Vector("a", "a", "a"), "a", "a")
      == Vector("aa", "a"))
    assert(graft.operators.Bpe.applyMerge(Vector("a", "a", "a", "a"), "a", "a")
      == Vector("aa", "aa"))
    // end-to-end doc counts over the same corpus
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    Seq(
      (1L, "low low low low low low lower lower lowest"),
      (2L, "new new new newer newer newer newer")
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val out = graft.operators.Bpe.bpeTokens(
        Tables.documents(spark, dir), nMerges = 4)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens")))).toMap
    // doc 1: 9 words, 6·1 + 2·3 + 1·4 = 16 subword tokens
    // doc 2: 7 words, 3·1 + 4·3 = 15
    assert(out == Map(1L -> ((9L, 16L)), 2L -> ((7L, 15L))), out.toString)
    // the persistable merge-table artifact carries the same merges in
    // rank order
    val mt = graft.operators.Bpe.mergeTable(Tables.documents(spark, dir), 4)
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    assert(mt == Seq(("l", "o"), ("lo", "w"), ("e", "w"), ("n", "ew")),
      mt.toString)
  }

  test("BPE trainer guard + min-count prune (r21): loud maxVocab, prune-invariant gate corpus") {
    import graft.operators.Bpe
    val docs = Tables.documents(spark, sf)
    // 1. the maxVocab guard fails LOUDLY naming both knobs (the d4
    //    loud-guard convention) instead of an opaque driver OOM
    val e = intercept[IllegalStateException](
      Bpe.mergeTable(docs, nMerges = 2, maxVocab = 3))
    assert(e.getMessage.contains("maxVocab") && e.getMessage.contains("minCount"))
    // 2. prune invariance on the gate corpus: training on the
    //    minCount ≥ 2 dictionary learns the IDENTICAL 16-merge table
    //    (rare words contribute too little pair mass to move any
    //    argmax here), so the oracle's unpruned unroll stays exact
    def merges(mc: Long) = Bpe.mergeTable(docs, 16, minCount = mc)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"))).toSeq
    assert(merges(2L) == merges(1L),
      "min-count prune changed the gate-corpus merge table")
    // 3. and the pruned-path tokenization (distributed per-word merge
    //    application for words BELOW the prune) agrees row-for-row
    //    with the registry path
    def counts(mc: Long) = Bpe.bpeTokens(docs, 16, minCount = mc)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens")))).toMap
    assert(counts(2L) == counts(1L),
      "pruned-path token counts diverge from the registry path")
  }

  test("m13 GrvSceneCodec: planted cut found, drift rejected, loud failures") {
    import graft.operators.Multimodal
    val w = 4; val h = 3; val fs = w * h
    // two static shots of constant gray (10 then 90) with a +1 drift
    // per frame; the cut sits between frames 3 and 4
    val frames = Array.tabulate(8) { f =>
      val base = if (f < 4) 10 else 90
      Array.fill[Byte](fs)((base + f).toByte)
    }
    val clip = Multimodal.synthGrv(w, h, frames)
    val out = new Multimodal.GrvSceneCodec().decode(
      Multimodal.MediaRow(1L, clip, "video/x-grv", w, h))
    assert(out(0) == clip.length.toDouble)
    assert(out(1) == 8.0)
    // transitions: six drift steps of mean 1 and one cut of mean 80
    // (|90+4 − (10+3)| = 81? no: prev frame 3 = 10+3, cur frame 4 =
    // 90+4 → |94 − 13| = 81) → meanDiff = (6·1 + 81)/7
    assert(out(2) == math.round((6.0 * 1 + 81) / 7 * 1e6) / 1e6, out(2).toString)
    assert(out(3) == 1.0, s"exactly one cut: ${out(3)}")
    assert(out(4) == 4.0, s"cut at frame 4: ${out(4)}")
    // pure drift (no cut) → zero cuts, first-cut sentinel -1
    val calm = Array.tabulate(8)(f => Array.fill[Byte](fs)((10 + f).toByte))
    val calmOut = new Multimodal.GrvSceneCodec().decode(
      Multimodal.MediaRow(2L, Multimodal.synthGrv(w, h, calm), "video/x-grv", w, h))
    assert(calmOut(3) == 0.0 && calmOut(4) == -1.0)
    // loud failures: bad magic and truncated raster
    val bad = clip.clone(); bad(0) = 'X'
    intercept[IllegalArgumentException] {
      new Multimodal.GrvSceneCodec().decode(
        Multimodal.MediaRow(3L, bad, "video/x-grv", w, h))
    }
    intercept[IllegalArgumentException] {
      new Multimodal.GrvSceneCodec().decode(
        Multimodal.MediaRow(4L, clip.take(20), "video/x-grv", w, h))
    }
  }

  test("Dsp.fft matches a naive O(n^2) DFT and satisfies Parseval on random signals") {
    import graft.operators.Multimodal.Dsp
    val n = 64
    // deterministic LCG signal
    var x = 1234567L
    val re = Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 16) % 2000).toDouble / 1000.0 - 1.0
    }
    val im = new Array[Double](n)
    val (fr, fi) = (re.clone(), im.clone())
    Dsp.fft(fr, fi)
    // gold standard: direct DFT
    for (k <- 0 until n) {
      var sr = 0.0; var si = 0.0
      for (t <- 0 until n) {
        val ang = -2.0 * math.Pi * k * t / n
        sr += re(t) * math.cos(ang); si += re(t) * math.sin(ang)
      }
      assert(math.abs(fr(k) - sr) < 1e-9 && math.abs(fi(k) - si) < 1e-9,
        s"bin $k: (${fr(k)},${fi(k)}) vs ($sr,$si)")
    }
    // Parseval: sum |x|^2 = (1/n) sum |X|^2
    val tEnergy = re.map(v => v * v).sum
    val fEnergy = (0 until n).map(k => fr(k) * fr(k) + fi(k) * fi(k)).sum / n
    assert(math.abs(tEnergy - fEnergy) < 1e-9)
  }

  test("SpectrumCodec: bin-aligned tone lands on its exact bin with sine RMS") {
    import graft.operators.Multimodal
    val nFft = 1024
    val bin = 37
    val amp = 0.5
    val samples = Array.tabulate[Short](nFft)(i =>
      (amp * 32767.0 * math.sin(2.0 * math.Pi * bin * i / nFft)).toShort)
    val wav = Multimodal.synthWav(8000, samples)
    val f = new Multimodal.SpectrumCodec(nFft)
      .decode(Multimodal.MediaRow(1L, wav, "audio/wav", 0, 0))
    assert(f(1) == bin.toDouble, s"peak bin ${f(1)} != $bin")
    assert(math.abs(f(3) - bin * 8000.0 / nFft) < 1e-9, "peak Hz")
    // pure sine RMS = amp/sqrt(2) (quantization gives ~1e-4 slack)
    assert(math.abs(f(4) - amp / math.sqrt(2.0)) < 1e-3, s"rms ${f(4)}")
    // zero leakage for a bin-aligned tone → centroid ≈ the tone; the
    // residual ~0.6 Hz comes from 16-bit PCM quantization noise
    // (flat ~3e-5/bin, magnitude-weighted toward the band center),
    // not the transform — the naive-DFT test above pins the math
    assert(math.abs(f(2) - bin * 8000.0 / nFft) < 1.0, s"centroid ${f(2)}")
  }

  test("Phash DCT: constant image is DC-only; a planted cosine mode hits exactly its coefficient") {
    import graft.operators.Phash
    val n = 16
    val flat = Array.fill(n * n)(100.0)
    val df = Phash.dct2d(flat, n, n)
    assert(math.abs(df(0) - 100.0 * n * n) < 1e-6)
    for (i <- 1 until n * n) assert(math.abs(df(i)) < 1e-9, s"coeff $i leaked")
    // planted mode (u,v) = (3,2): only that coefficient fires
    val g = Array.tabulate(n * n) { i =>
      val x = i % n; val y = i / n
      math.cos(math.Pi * (x + 0.5) * 3 / n) * math.cos(math.Pi * (y + 0.5) * 2 / n)
    }
    val dg = Phash.dct2d(g, n, n)
    for (u <- 0 until n; v <- 0 until n) {
      val c = dg(v * n + u)
      if (u == 3 && v == 2) assert(math.abs(c - n * n / 4.0) < 1e-9)
      else assert(math.abs(c) < 1e-9, s"coeff ($u,$v) = $c leaked")
    }
  }

  test("Phash: brightness-invariant, ~half bits set, and rescale-stable on smooth images") {
    import graft.operators.Phash
    val w = 29; val h = 23
    val src = Array.tabulate[Byte](97)(i => ((i * 37 + 11) & 0xff).toByte)
    val bmp = Phash.synthSmoothBmp(w, h, src)
    val (luma, _, _) = Phash.bmpLuma(bmp, 1L)
    val p = Phash.phashFromLuma(luma, w, h)
    // brightness shift moves only the DC coefficient — hash unchanged
    val brighter = luma.map(v => math.min(255.0, v + 20.0))
    assert(Phash.phashFromLuma(brighter, w, h) == p, "brightness changed the hash")
    // median threshold ⇒ 31 of 63 AC bits set exactly
    assert(java.lang.Long.bitCount(p) == 31)
    // rescale stability on photograph-like (decaying-spectrum) content
    var within = 0; var minCross = 64
    val hashes = (0 until 30).map { id =>
      // fully-mixed bytes (a linear i·a + id·b pattern leaves doc
      // sign grids correlated → spurious cross-doc collisions)
      val s2 = Array.tabulate[Byte](80) { i =>
        var z = i.toLong * 1000003L + id.toLong * 0x9E3779B97F4A7C15L
        z ^= z >>> 30; z *= 0xBF58476D1CE4E5B9L
        z ^= z >>> 27; z *= 0x94D049BB133111EBL; z ^= z >>> 31
        (z & 0xff).toByte
      }
      val ww = 16 + id % 17; val hh = 16 + id % 13
      val (l2, _, _) = Phash.bmpLuma(Phash.synthSmoothBmp(ww, hh, s2), id.toLong)
      val half = Phash.boxResize(l2, ww, hh, ww / 2, hh / 2)
      val p1 = Phash.phashFromLuma(l2, ww, hh)
      val p2 = Phash.phashFromLuma(half, ww / 2, hh / 2)
      if (java.lang.Long.bitCount(p1 ^ p2) <= 3) within += 1
      p1
    }
    for (i <- hashes.indices; j <- i + 1 until hashes.length)
      minCross = math.min(minCross, java.lang.Long.bitCount(hashes(i) ^ hashes(j)))
    assert(within >= 27, s"only $within/30 rescale pairs within Hamming 3")
    assert(minCross > 3, s"distinct docs collided at Hamming $minCross")
  }

  test("phashPairs: banded join equals the brute-force recount (exact for Hamming <= 3)") {
    import spark.implicits._
    import graft.operators.Phash
    // planted corpus: 60 base hashes, each with variants at 0–5 bit
    // flips — the operator must find exactly the ≤3 pairs, including
    // flips spread across three different bands, and exclude 4/5
    var x = 99L
    def lcg(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    val rows = scala.collection.mutable.Buffer[(Long, Long)]()
    var id = 0L
    (0 until 60).foreach { _ =>
      val base = lcg()
      rows += ((id, base)); id += 1
      (1 to 5).foreach { k =>
        // k flips in k DISTINCT bands (worst case for banding)
        val flipped = (0 until k).foldLeft(base)((b, i) =>
          b ^ (1L << ((i % 4) * 16 + ((lcg() >>> 33) % 16).toInt)))
        rows += ((id, flipped)); id += 1
      }
    }
    val hashed = rows.toSeq.toDF("doc_id", "phash")
    val got = Phash.phashPairs(hashed, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val arr = rows.toArray
    val want = (for {
      i <- arr.indices; j <- i + 1 until arr.length
      d = java.lang.Long.bitCount(arr(i)._2 ^ arr(j)._2)
      if d <= 3
    } yield (math.min(arr(i)._1, arr(j)._1), math.max(arr(i)._1, arr(j)._1),
      d.toLong)).toSet
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
    assert(want.nonEmpty)
  }

  test("Phash: top-down and bottom-up encodings of the same image hash identically") {
    import graft.operators.Phash
    // synthSmoothBmp emits positive-height (bottom-up) BMPs; build
    // the top-down twin by negating biHeight and reversing row order
    val w = 21; val h = 17
    val src = Array.tabulate[Byte](64)(i => ((i * 89 + 5) & 0xff).toByte)
    val up = Phash.synthSmoothBmp(w, h, src)
    val down = up.clone()
    // biHeight := -h (little-endian int32 at offset 22)
    val neg = -h
    down(22) = (neg & 0xff).toByte; down(23) = ((neg >> 8) & 0xff).toByte
    down(24) = ((neg >> 16) & 0xff).toByte; down(25) = ((neg >> 24) & 0xff).toByte
    val stride = ((w * 3 + 3) / 4) * 4
    for (y <- 0 until h)
      System.arraycopy(up, 54 + (h - 1 - y) * stride, down, 54 + y * stride, stride)
    assert(Phash.phashBmp(up, 1L) == Phash.phashBmp(down, 2L),
      "orientation must be normalized — pHash is not flip-invariant")
    // and the grids themselves agree, row for row
    val (lu, _, _) = Phash.bmpLuma(up, 1L)
    val (ld, _, _) = Phash.bmpLuma(down, 2L)
    assert(lu.sameElements(ld))
  }

  test("SpectrumCodec: stereo payloads analyze channel 0, not interleaved mono") {
    import graft.operators.Multimodal
    val nFft = 512
    val bin = 25
    // stereo: L = bin-aligned tone, R = silence; interleave manually
    val mono = Array.tabulate[Short](nFft)(i =>
      (0.5 * 32767.0 * math.sin(2.0 * math.Pi * bin * i / nFft)).toShort)
    val stereo = new Array[Short](nFft * 2)
    for (i <- 0 until nFft) stereo(i * 2) = mono(i)
    // hand-build a 2-channel RIFF header (synthWav is mono-only)
    val n = stereo.length
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(8000)
      .putInt(8000 * 4).putShort(4).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(2 * n)
    stereo.foreach(bb.putShort)
    val f = new Multimodal.SpectrumCodec(nFft)
      .decode(Multimodal.MediaRow(1L, bb.array(), "audio/wav", 0, 0))
    // interleaved-as-mono would halve the apparent frequency; channel-0
    // analysis sees the true bin
    assert(f(1) == bin.toDouble, s"peak bin ${f(1)} != $bin")
  }

  test("t19: heap-ranked zipf fit equals a window-ranked recount across a tied cutoff") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 5 head terms (freqs 64..4) + 150 terms ALL at freq 2: the
    // top-100 cutoff lands inside the tie block, so WHICH tied terms
    // the bounded heap keeps is engine-dependent — the fit must not
    // care (tied terms share ln(freq)). The independent recount uses
    // a row_number window (the implementation t19 deliberately
    // avoids) over the same frequency table.
    val dir = java.nio.file.Files.createTempDirectory("zipf").toString
    val head = Seq("alpha" -> 64, "beta" -> 32, "gamma" -> 16,
      "delta" -> 8, "eps" -> 4)
    val tied = (1 to 150).map(i => f"tied$i%03d" -> 2)
    val words = (head ++ tied).flatMap { case (w, n) => Seq.fill(n)(w) }
    // spread words over docs so per-doc texts stay short
    val docs = words.grouped(25).zipWithIndex.map { case (ws, i) =>
      (i.toLong, ws.mkString(" "), "en", "fixture", ws.mkString(" ").length.toLong)
    }.toSeq
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("t19_zipf_vocab")(spark, dir).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getAs[Long]("vocab_size") == 155)
    assert(r.getAs[Long]("total_tokens") == words.length.toLong)
    assert(r.getAs[Long]("fitted_terms") == 100)
    // independent recount: window rank → log–log OLS via olsByGroup
    val tf = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      .groupBy("lang", "term").agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy("lang").orderBy(col("freq").desc, col("term").asc)
    val pts = tf.filter(col("freq") >= 2)
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 100)
      .select(col("lang"), log(col("rnk").cast("double")).as("lx"),
        log(col("freq").cast("double")).as("ly"))
    val want = graft.operators.Olap
      .olsByGroup(pts, Seq("lang"), col("lx"), col("ly")).collect()(0)
    assert(math.abs(r.getAs[Double]("zipf_alpha") - (-want.getAs[Double]("slope"))) < 1e-6)
    assert(math.abs(r.getAs[Double]("fit_r2") - want.getAs[Double]("r2")) < 1e-6)
  }

  test("t22 collocations: planted corpus matches hand-computed PMI") {
    import spark.implicits._
    // 5 x "a b" and 5 x "c c": NU=20, NB=10; PMI(a,b)=ln 8, PMI(c,c)=ln 2
    val docs = ((1 to 5).map(i => (i.toLong, "a b")) ++
      (6 to 10).map(i => (i.toLong, "c c"))).toDF("doc_id", "text")
    val got = operators.TextQueries.collocations(docs)
      .as[(Long, String, String, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, "a", "b", 5L, math.rint(math.log(8.0) * 1e6) / 1e6),
      (2L, "c", "c", 5L, math.rint(math.log(2.0) * 1e6) / 1e6)))
  }

  test("t22 collocations: below-support pairs are dropped") {
    import spark.implicits._
    val docs = ((1 to 5).map(i => (i.toLong, "a b")) :+ (6L, "x y"))
      .toDF("doc_id", "text")
    val got = operators.TextQueries.collocations(docs).collect()
    assert(got.length === 1 && got.head.getString(1) == "a")
  }

  test("m14 time-domain codec: hand-computed ZCR/RMS/peak on a planted WAV") {
    val samples = Array[Short](100, -100, 100, -100, 0, 200)
    val wav = operators.Multimodal.synthWav(8000, samples)
    val f = new operators.Multimodal.TimeDomainCodec().decode(
      operators.Multimodal.MediaRow(1L, wav, "audio/wav", 0, 0))
    assert(f(0) === wav.length.toDouble)
    assert(f(1) === 600.0, "sum of |s|")
    val rms = math.floor(math.sqrt(80000.0 / 6) * 1e6 + 0.5) / 1e6
    assert(f(2) === rms, "rms")
    assert(f(3) === 200.0, "peak")
    // signs + - + - + + : four crossings (zero counts as non-negative)
    assert(f(4) === 4.0, "zcr")
  }

  test("t23 RAKE: hand-computed degree/freq scores on a planted corpus") {
    import spark.implicits._
    val docs = Seq((1L, "red apple and green apple"), (2L, "apple"))
      .toDF("doc_id", "text")
    val got = operators.TextQueries.rakeKeywords(docs)
      .as[(Long, String, Long, Double)].collect().toSeq
    // word scores: red 2/1, green 2/1, apple (2+2+1)/3
    val appleW = 5.0 / 3
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got === Seq(
      (1L, "green apple", 1L, r6(2.0 + appleW)),
      (2L, "red apple", 1L, r6(2.0 + appleW)),
      (3L, "apple", 1L, r6(appleW))))
  }

  test("m15 VAD codec: planted loud/quiet frames segment exactly") {
    // 3 frames of 64 samples: loud(8000), quiet(100), loud(7000) ->
    // two 1-frame segments; then loud,loud,quiet -> one 2-frame run
    def wav(frames: Seq[Short]) = operators.Multimodal.synthWav(8000,
      frames.flatMap(v => Array.fill(64)(v)).toArray)
    val codec = new operators.Multimodal.VadSegmentCodec()
    val f1 = codec.decode(operators.Multimodal.MediaRow(
      1L, wav(Seq(8000, 100, 7000)), "audio/wav", 0, 0))
    assert(f1(1) === 2.0 && f1(3) === 1.0 && f1(4) === 2.0)
    assert(f1(2) === 1.0, "mean segment length")
    val f2 = codec.decode(operators.Multimodal.MediaRow(
      2L, wav(Seq(8000, 7000, 100)), "audio/wav", 0, 0))
    assert(f2(1) === 1.0 && f2(3) === 2.0 && f2(4) === 2.0)
    val silent = codec.decode(operators.Multimodal.MediaRow(
      3L, wav(Seq(10, 10)), "audio/wav", 0, 0))
    assert(silent(1) === 0.0 && silent(2) === 0.0 && silent(3) === 0.0)
  }

  test("m17 RLE codec: hand-computed runs; round-trip self-verifies") {
    val codec = new operators.Multimodal.RleCodec()
    def row(s: String) = operators.Multimodal.MediaRow(
      1L, s.getBytes("UTF-8"), "image/png", 0, 0)
    // "aaabbc": runs (a,3)(b,2)(c,1) → 3 runs, max 3, encoded 15/6
    val f = codec.decode(row("aaabbc"))
    assert(f(0) === 6.0 && f(1) === 3.0 && f(3) === 3.0)
    assert(f(2) === 2.5, "ratio 15/6 bytes")
    assert(f(4) === 2.0, "mean run 6/3")
    // all-distinct payload: RLE expands (ratio 5), max run 1
    val g = codec.decode(row("abcd"))
    assert(g(1) === 4.0 && g(2) === 5.0 && g(3) === 1.0 && g(4) === 1.0)
    // single-run payload: maximal compression for the length
    val h = codec.decode(row("zzzzzzzz"))
    assert(h(1) === 1.0 && h(3) === 8.0 && h(4) === 8.0)
    assert(h(2) === 0.625, "5/8")
  }

  test("t25 char profile: hand-computed collision ppm and entropy") {
    import spark.implicits._
    // doc 1: "aabb!" → kept n=4 over {a:2, b:2}; collision = 8/16 =
    //   0.5 → 500000 ppm, distinct 2, Rényi-2 = −log2(0.5) = 1 bit
    // doc 2: "abcd" → 4/16 = 0.25 → 250000 ppm, distinct 4, 2 bits
    val docs = Seq(
      (1L, "aabb!", "en", "web", 5L),
      (2L, "abcd", "en", "feed", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = operators.TextQueries.charEntropyProfile(docs)
      .collect().map(r => (r.getAs[String]("source"),
        (r.getAs[Double]("avg_distinct_chars"),
         r.getAs[Double]("avg_collision_ppm"),
         r.getAs[Double]("renyi2_entropy_bits")))).toMap
    assert(got("web") === ((2.0, 500000.0, 1.0)))
    assert(got("feed") === ((4.0, 250000.0, 2.0)))
    // punctuation filtered: a doc of only symbols contributes nothing
    val empty = operators.TextQueries.charEntropyProfile(
      Seq((3L, "!!!", "en", "x", 3L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")).count()
    assert(empty === 0L)
  }

  test("t28 datasheet: hand-computed fixture (lang mix, integer quality avg, cross-source dup)") {
    // 5 docs, 2 sources; d2/d3 share identical text ACROSS sources —
    // both must count as dup exposure (the report's point)
    val dir = java.nio.file.Files.createTempDirectory("ds_fix").toString
    Seq(
      (1L, "the and of it", "en", "s1", 13L),
      (2L, "copy me please now", "en", "s1", 18L),
      (3L, "copy me please now", "en", "s2", 18L),
      (4L, "le la et les maison", "fr", "s2", 19L),
      (5L, "der die das und ist heute", "de", "s2", 25L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("t28_corpus_datasheet")(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_chars"),
          (r.getAs[Long]("n_en"), r.getAs[Long]("n_fr"),
            r.getAs[Long]("n_es"), r.getAs[Long]("n_de")),
          r.getAs[Long]("avg_quality_ppm"), r.getAs[Long]("dup_docs"),
          r.getAs[Long]("dup_ppm"))).toMap
    // s1: q(d1) = 300000·3/4 + 0 + 4000·4 = 241000 (3 en markers);
    //     q(d2) = 0 + 300000·1/4 + 16000 = 91000 ("please" > 5 chars,
    //     all-zero marker tie → 'en') → avg (241000+91000) div 2
    assert(got("s1") == ((2L, 8L, 31L, (2L, 0L, 0L, 0L), 166000L,
      1L, 500000L)))
    // s2: d3 en-tie 91000, d4 fr (4 markers) 60000+20000, d5 de
    //     (5 markers, no long tokens) 24000·... = 0+0+4000·6
    assert(got("s2") == ((3L, 15L, 62L, (1L, 1L, 0L, 1L), 65000L,
      1L, 333333L)))
  }

  test("m22: every planted re-record pairs with its source; single tones fingerprint with the sentinel") {
    val pairs = SparkEntry.queries("m22_audio_neardup")(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val ids = Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // planted: doc_id % 7 == 4 re-records doc_id - 1 → both share the
    // source's constellation and MUST pair
    val planted = ids.filter(i => i % 7 == 4 && ids(i - 1)).map(i => (i - 1, i))
    assert(planted.nonEmpty)
    assert(planted.subsetOf(pairs),
      s"missing planted pairs: ${(planted -- pairs).take(5)}")
    // every reported pair shares a constellation under the synth's
    // id-formula (src = id-1 for re-records) — no false positives
    def fp(i: Long): (Long, Long) = {
      val s0 = if (i % 7 == 4) i - 1 else i
      val (b1, b2) = (3 + s0 % 200, 7 + s0 % 97)
      (b1, if (b1 == b2) 0L else b2)
    }
    for ((a, b) <- pairs) assert(fp(a) == fp(b), s"pair ($a,$b) fp mismatch")
    // degenerate single tone (b1 == b2): the second "peak" is the
    // noise floor → sentinel 0, not an arbitrary FP-noise bin
    val mono = {
      val samples = Array.tabulate[Short](1024) { i =>
        ((0.5 * math.sin(2.0 * math.Pi * 11 * i / 1024.0)) * 32767.0 / 2).toShort
      }
      operators.Multimodal.MediaRow(0L,
        operators.Multimodal.synthWav(8000, samples), "audio/wav", 0, 0)
    }
    val f = new operators.Multimodal.PeakPairCodec(1024).decode(mono)
    assert(f(3) == 11.0 && f(4) == 0.0, f.mkString(","))
  }
}
