package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Packing}

/** Round-3 pipeline operators: incremental dedup, stratified sampling,
  * mixture planning.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  lazy val corpus = Seq(
    (0L, "alpha beta gamma", "en", "s0", 16L),
    (1L, "delta epsilon zeta", "en", "s0", 18L),
    (2L, "eta theta iota", "de", "s1", 14L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("quotaSample: caps big sources at the LCG-lowest docs, keeps small ones whole") {
    // source "big": 15 docs → keep the 10 with the smallest LCG keys;
    // source "small": 3 docs → all kept, ranks 1..3
    def key(id: Long): Long =
      Math.floorMod(Math.floorMod(id, 2147483648L) * 1103515245L + 12345L,
        2147483648L)
    val docs = ((1L to 15L).map(i => (i, "big", 10L)) ++
      (100L to 102L).map(i => (i, "small", 20L)))
      .toDF("doc_id", "source", "n_chars")
    val got = graft.operators.Packing.quotaSample(docs, cap = 10L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    val gotBig = got.filter(_._2 == "big").sortBy(_._3).map(_._1)
    val wantBig = (1L to 15L).sortBy(i => (key(i), i)).take(10)
    assert(gotBig.toSeq == wantBig.toSeq, s"$gotBig vs $wantBig")
    assert(got.filter(_._2 == "small").map(_._1).sorted.toSeq ==
      Seq(100L, 101L, 102L))
    assert(got.filter(_._2 == "small").map(_._3).sorted.toSeq ==
      Seq(1L, 2L, 3L))
  }

  lazy val batch = Seq(
    (10L, "alpha beta gamma", "en", "s2", 16L),   // dup of corpus doc 0
    (11L, "kappa lambda mu", "en", "s2", 15L),    // new
    (12L, "kappa lambda mu", "en", "s3", 15L),    // dup of 11 within batch
    (13L, "nu xi omicron", "de", "s3", 13L)       // new
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("incremental dedup classifies batch docs against corpus and batch") {
    val out = Dedup.incrementalDedup(corpus, batch).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("status"), r.getAs[Long]("canonical_id"))).toMap
    assert(out(10L) == ("dup_of_corpus", 0L))
    assert(out(11L) == ("new", 11L))
    assert(out(12L) == ("dup_in_batch", 11L))
    assert(out(13L) == ("new", 13L))
  }

  test("bloom incremental dedup is row-identical to the unfiltered form") {
    def key(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("status"),
        r.getAs[Long]("canonical_id"))).toSet
    assert(key(Dedup.bloomIncrementalDedup(corpus, batch).collect()) ==
      key(Dedup.incrementalDedup(corpus, batch).collect()))
    // an absurdly small filter (high fpp) still classifies correctly —
    // false positives only take the exact join and find nothing
    assert(key(Dedup.bloomIncrementalDedup(corpus, batch,
      expectedItems = 1L, fpp = 0.5).collect()) ==
      key(Dedup.incrementalDedup(corpus, batch).collect()))
    // the definitely-new path (bloom miss skips the corpus join) is
    // actually exercised: with 3 distinct corpus contents at 1% fpp,
    // docs 11/12/13's fingerprints are not all false positives
    val planted = Dedup.bloomIncrementalDedup(corpus, batch).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(planted(10L) == "dup_of_corpus" && planted(13L) == "new")
  }

  test("bloom dedup equals the unfiltered form on a randomized corpus/batch split") {
    // 160 docs from a 50-text pool (seeded): plenty of corpus dups,
    // batch dups and genuinely-new texts; exercised at a realistic
    // fpp AND a tiny over-saturated filter (every probe a maybe)
    val rnd = new scala.util.Random(13)
    val pool = (0 until 50).map(i => s"text number $i " + ("pad " * (i % 7)))
    val all = (0L until 160L).map(i => (i, pool(rnd.nextInt(pool.size)), "en",
      "s" + (i % 3), 10L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val corpus = all.filter(col("doc_id") % 4 =!= 0)
    val batch = all.filter(col("doc_id") % 4 === 0)
    def key(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("status"),
        r.getAs[Long]("canonical_id"))).toSet
    val reference = key(Dedup.incrementalDedup(corpus, batch).collect())
    assert(key(Dedup.bloomIncrementalDedup(corpus, batch).collect()) == reference)
    assert(key(Dedup.bloomIncrementalDedup(corpus, batch,
      expectedItems = 2L, fpp = 0.4).collect()) == reference)
  }

  test("corpus prep equals a plain-Scala stage-by-stage reference on random docs") {
    val rnd = new scala.util.Random(29)
    val words = Seq("the", "a", "of", "and", "quick", "brown", "jumps",
      "spark", "rollup", "verylongtokenpadding", "x", "data", "corpus")
    val pool = (0 until 30).map { _ =>
      (5 + rnd.nextInt(60), rnd.nextInt(words.size))
    }.map { case (len, off) =>
      (0 until len).map(i => words((i + off) % words.size)).mkString(" ")
    }
    val docs = (0L until 120L).map(i => (i, pool(rnd.nextInt(pool.size)),
      if (i % 3 == 0) "en" else "xx", "s" + (i % 2), 0L))
    val out = operators.Packing.corpusPrep(
      docs.toDF("doc_id", "text", "lang", "source", "n_chars"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // stage 1 (t7 rules), stage 2 (min-id per text), stage 3 (LCG) in
    // plain Scala, applied in the same order
    val stop = Set("the", "a", "is", "of", "and")
    val kept = docs.filter { case (_, text, _, _, _) =>
      val toks = text.trim.toLowerCase.split("\\s+").toSeq
      val sumLen = text.replaceAll("\\s", "").length
      toks.size >= 30 && toks.size <= 10000 &&
        sumLen >= toks.size * 3 && sumLen <= toks.size * 10 &&
        toks.count(stop) >= 2
    }
    val canonical = kept.groupBy(_._2).values.map(_.map(_._1).min).toSet
    val expected = kept.filter(d => canonical(d._1)).filter { case (id, _, lang, _, _) =>
      val pct = ((id % 2147483648L) * 1103515245L + 12345L) % 2147483648L % 100L
      pct < (if (lang == "en") 30 else 60)
    }.map(_._1).toSet
    assert(out == expected, s"spark=$out expected=$expected")
    assert(expected.nonEmpty, "degenerate trial: no doc survived all stages")
  }

  test("incremental dedup of an empty batch is empty; full-dup batch has no 'new'") {
    assert(Dedup.incrementalDedup(corpus, batch.limit(0)).count() == 0)
    val allDup = Dedup.incrementalDedup(corpus,
      corpus.withColumn("doc_id", col("doc_id") + 100L)).collect()
    assert(allDup.forall(_.getAs[String]("status") == "dup_of_corpus"))
  }

  test("incremental dedup agrees with exactDedup over the unioned corpus (randomized)") {
    // 120 docs drawn from a 40-text pool → guaranteed collisions, both
    // corpus-vs-batch and batch-internal; seeded for reproducibility
    val rnd = new scala.util.Random(7)
    val all = (0L until 120L).map(i =>
      (i, s"text ${rnd.nextInt(40)}", "en", "s0", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val corpus = all.filter(col("doc_id") % 3 =!= 0)
    val batch = all.filter(col("doc_id") % 3 === 0)

    val inc = Dedup.incrementalDedup(corpus, batch).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("status"), r.getAs[Long]("canonical_id"))).toMap
    val union = Dedup.exactDedup(all).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
    val corpusIds = corpus.collect().map(_.getAs[Long]("doc_id")).toSet

    inc.foreach { case (id, (status, canon)) =>
      val groupIds = union.filter(_._2 == union(id)).keys
      val corpusGroup = groupIds.filter(corpusIds)
      status match {
        case "dup_of_corpus" =>
          // canonical must be the corpus group's min, and one must exist
          assert(corpusGroup.nonEmpty && canon == corpusGroup.min, s"doc $id")
        case "dup_in_batch" =>
          assert(corpusGroup.isEmpty, s"doc $id: corpus hit should win")
          assert(canon == groupIds.filterNot(corpusIds).min && canon != id, s"doc $id")
        case "new" =>
          assert(corpusGroup.isEmpty && canon == id, s"doc $id")
          assert(groupIds.filterNot(corpusIds).min == id, s"doc $id")
      }
    }
  }

  test("decontaminate flags corpus docs sharing 5-grams with eval docs") {
    val evalSet = Seq(
      (100L, "the quick brown fox jumps over the lazy dog", "en", "e", 40L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val corpusSet = Seq(
      // contains "the quick brown fox jumps" → contaminated
      (0L, "intro words then the quick brown fox jumps away", "en", "s", 40L),
      // shares words but no 5-gram → clean
      (1L, "quick dog brown lazy the fox over jumps", "en", "s", 30L),
      // exact eval copy → contaminated, many shared grams
      (2L, "the quick brown fox jumps over the lazy dog", "en", "s", 40L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.decontaminate(corpusSet, evalSet).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shared_grams"), r.getAs[Long]("n_eval_docs_hit"))).toMap
    assert(out.keySet == Set(0L, 2L))
    assert(out(0L) == (1L, 1L))   // exactly "the quick brown fox jumps"
    assert(out(2L) == (5L, 1L))   // all 5 of the eval doc's 5-grams
  }

  test("stratified sample is deterministic and respects the hash-rate rule") {
    val docs = (0L until 500L).map(i =>
      (i, s"doc $i", if (i % 3 == 0) "en" else "de", "s0", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = Packing.stratifiedSample(docs).collect().map(_.getAs[Long]("doc_id")).sorted
    val b = Packing.stratifiedSample(docs).collect().map(_.getAs[Long]("doc_id")).sorted
    assert(a.sameElements(b), "sample must be stable under re-execution")
    // every kept row satisfies the arithmetic-hash rule; en downsampled harder
    val kept = Packing.stratifiedSample(docs)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang")))
    kept.foreach { case (id, lang) =>
      val pct = (((id % 2147483648L) * 1103515245L + 12345L) % 2147483648L) % 100
      val rate = if (lang == "en") 30 else 60
      assert(pct < rate, s"doc $id (lang $lang) kept with pct $pct >= rate $rate")
    }
    // and no qualifying row was dropped
    val expected = (0L until 500L).count { i =>
      val pct = (((i % 2147483648L) * 1103515245L + 12345L) % 2147483648L) % 100
      pct < (if (i % 3 == 0) 30 else 60)
    }
    assert(kept.length == expected)
  }

  test("incremental near-dup classifies a planted near-duplicate and a novel doc") {
    val c = Seq(
      (1L, "a b c d e f", "en", "s0", 11L),
      (2L, "totally different words here", "en", "s0", 28L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val b = Seq(
      (10L, "a b c d e f g", "en", "s1", 13L), // shingle Jaccard 5/6 vs doc 1
      (11L, "nothing shared at all", "en", "s1", 21L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.incrementalNearDup(c, b).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("status"), Option(r.getAs[java.lang.Long]("match_id")))).toMap
    assert(out(10L) == ("near_dup_of_corpus", Some(1L)))
    assert(out(11L)._1 == "new" && out(11L)._2.isEmpty)
  }

  test("split shards: content-identical docs land in the same split and shard") {
    val twins = Seq(
      (0L, "same exact text", "en", "s0", 15L),
      (999L, "same exact text", "en", "s1", 15L), // same content, far id
      (5L, "different text entirely", "en", "s0", 23L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Packing.splitShards(twins).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("split"), r.getAs[Long]("shard_id"))).toMap
    assert(out(0L) == out(999L), "identical content split apart — leakage")
    assert(out.values.forall(v =>
      Set("train", "validation", "test")(v._1) && v._2 >= 0 && v._2 < 8))
  }

  test("split shards: deterministic across runs and ~80/10/10 on real docs") {
    val docs = Tables.documents(spark, sf)
    val a = Packing.splitShards(docs).collect().sortBy(_.getAs[Long]("doc_id"))
    val b = Packing.splitShards(docs).collect().sortBy(_.getAs[Long]("doc_id"))
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    val frac = a.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.length.toDouble / a.length).toMap
    assert(math.abs(frac.getOrElse("train", 0.0) - 0.8) < 0.08, frac.toString)
    assert(math.abs(frac.getOrElse("validation", 0.0) - 0.1) < 0.06, frac.toString)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.1) < 0.06, frac.toString)
  }

  test("doc chunks: stride/size arithmetic covers every token exactly once per stride") {
    val out = SparkEntry.queries("t12_doc_chunks")(spark, sf).collect()
    val nToks = SparkEntry.queries("t1_token_count")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_tokens").toLong).toMap
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, chunks) =>
      val n = math.max(nToks(id), 1L)
      // chunk count = ceil(n / 48); starts are 1 + 48k; sizes in [1, 64];
      // the last chunk ends exactly at the last token
      assert(chunks.length == ((n + 47) / 48).toInt, s"doc $id")
      val sorted = chunks.sortBy(_.getAs[Long]("start_tok"))
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.getAs[Long]("start_tok") == 1 + 48L * i)
        assert(c.getAs[Long]("chunk_idx") == i.toLong)
        val sz = c.getAs[Long]("chunk_toks")
        assert(sz >= 1 && sz <= 64, s"doc $id chunk $i size $sz")
      }
      val last = sorted.last
      assert(last.getAs[Long]("start_tok") + last.getAs[Long]("chunk_toks") - 1 == n)
    }
  }

  test("length batches: pow2 bucket bounds hold; batch ids stay under the bucket's count") {
    import graft.operators.Packing
    val docs = (0L until 200L).map { i =>
      val n = 1 + (i % 37).toInt  // token counts 1..37 across buckets 0..5
      (i, Seq.fill(n)("w").mkString(" "), "en", "s0", n.toLong * 2)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Packing.lengthBatches(docs, batchSize = 8).collect()
    assert(out.length == 200)
    val perBucket = out.groupBy(_.getAs[Long]("bucket"))
    perBucket.foreach { case (b, rows) =>
      rows.foreach { r =>
        val n = r.getAs[Long]("n_tokens")
        // pad-to-longest waste inside a bucket is bounded: 2^b <= n < 2^(b+1)
        assert(n >= (1L << b) && n < (1L << (b + 1)),
          s"n_tokens $n outside bucket $b bounds")
      }
      val nBatches = (rows.length + 7) / 8
      val ids = rows.map(_.getAs[Long]("batch_id"))
      assert(ids.forall(id => id >= 0 && id < nBatches),
        s"batch_id out of range for bucket $b: ${ids.max} vs $nBatches")
    }
    // deterministic across runs
    val again = Packing.lengthBatches(docs, batchSize = 8).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("batch_id")).toMap
    out.foreach(r => assert(
      again(r.getAs[Long]("doc_id")) == r.getAs[Long]("batch_id")))
  }

  test("mixture plan rates are capped at 1 and budget shares are honored") {
    val docs = (0L until 300L).map(i =>
      (i, Seq.fill(10)("w").mkString(" "),
        if (i < 200) "en" else "zh", "s0", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val plan = Packing.mixturePlan(docs).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("lang_tokens"), r.getAs[Double]("rate"),
          r.getAs[Long]("planned_tokens"))).toMap
    // en: 2000 tokens, budget share = 3000*0.5*0.4 = 600 → rate 0.3
    assert(math.abs(plan("en")._2 - 0.3) < 1e-9)
    assert(plan("en")._3 == 600L)
    // zh: 1000 tokens, budget share = 3000*0.5*0.15 = 225 → rate 0.225
    assert(math.abs(plan("zh")._2 - 0.225) < 1e-9)
    assert(plan("zh")._3 == 225L)
    plan.values.foreach { case (toks, rate, planned) =>
      assert(rate <= 1.0 && planned <= toks)
    }
  }

  test("decontaminated mixture: a corpus doc sharing a 5-gram with eval never reaches the plan") {
    val docs = Seq(
      (50L, "alpha beta gamma delta epsilon zeta", "en", "s0", 35L), // eval (id % 50 = 0)
      // contaminated: shares the 5-gram "alpha beta gamma delta epsilon"
      (1L, "alpha beta gamma delta epsilon something else entirely", "en", "s1", 54L),
      (2L, "seven clean tokens with no overlap at all", "en", "s2", 42L),
      (3L, "fuenf saubere woerter hier ja", "de", "s3", 29L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val corpus = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
    val eval = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
    val clean = corpus.join(
      Dedup.decontaminate(corpus, eval).select("doc_id"),
      Seq("doc_id"), "left_anti")
    val plan = Packing.mixturePlan(clean).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("lang_tokens"))).toMap
    // doc 1's 8 tokens are gone; en budgets doc 2 only
    assert(plan("en") === ((1L, 8L)))
    assert(plan("de") === ((1L, 5L)))
  }

  test("temperature mixture: alpha=1 is proportional; alpha<1 upsamples small sources") {
    val docs = ((0L until 400L).map(i => (i, Seq.fill(20)("w").mkString(" "),
        "en", "big", 40L)) ++
      (400L until 420L).map(i => (i, Seq.fill(20)("w").mkString(" "),
        "de", "small", 40L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // alpha=1: weight_i = tokens_i / total, so rate_i = budgetFrac everywhere
    val prop = Packing.temperatureMixture(docs, alpha = 1.0, budgetFrac = 0.5)
      .select("source", "rate").distinct().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("rate")).toMap
    assert(prop.values.forall(r => math.abs(r - 0.5) < 1e-4))
    // alpha=0.5: the small source's admission rate exceeds the big one's
    val temp = Packing.temperatureMixture(docs, alpha = 0.5, budgetFrac = 0.5)
    val rates = temp.select("source", "weight", "rate").distinct().collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("weight"), r.getAs[Double]("rate"))).toMap
    assert(rates("small")._2 > rates("big")._2)
    assert(rates.values.forall(_._2 <= 1.0))
    assert(math.abs(rates.values.map(_._1).sum - 1.0) < 1e-5)
    // the admission decision is deterministic: same input, same doc set
    val first = temp.select("doc_id").collect().map(_.getLong(0)).toSet
    val again = Packing.temperatureMixture(docs, alpha = 0.5, budgetFrac = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(first == again && first.nonEmpty)
    // sub-1% rates admit at ppm granularity instead of zeroing the
    // source (a whole-percent grid would drop rate=0.005 entirely)
    val many = (0L until 4000L).map(i =>
      (i, "w w w w", "en", "big", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tiny = Packing.temperatureMixture(many, alpha = 1.0, budgetFrac = 0.005)
    assert(tiny.count() > 0)
    val tinyRate = tiny.select("rate").distinct().collect()
      .map(_.getAs[Double]("rate"))
    assert(tinyRate.forall(r => math.abs(r - 0.005) < 1e-9))
  }

  test("token budget sample keeps the per-source quality prefix within budget") {
    val docs = Tables.documents(spark, sf)
    val out = operators.Packing.tokenBudgetSample(docs, budgetTokens = 800L)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("quality_ppm"), r.getAs[Long]("cum_tokens")))
    assert(out.nonEmpty)
    // the running total never exceeds the budget in any source
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).max <= 800L)
    }
    // the kept set is a quality PREFIX: every kept doc ranks at least
    // as high as every dropped doc of the same source
    val kept = out.map(r => (r._1, r._2)).toSet
    val ranked = docs.collect().map(r =>
        r.getAs[String]("source") -> r.getAs[Long]("doc_id"))
    val worstKept = out.groupBy(_._1).view
      .mapValues(_.map(r => (-r._3, r._2)).max).toMap
    operators.Packing.tokenBudgetSample(docs, budgetTokens = Long.MaxValue)
      .collect().foreach { r =>
      val (src, id, q) = (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("quality_ppm"))
      if (!kept((src, id)) && worstKept.contains(src))
        assert(Ordering[(Long, Long)].gt((-q, id), worstKept(src)),
          s"dropped $src/$id ranks above a kept doc")
    }
    assert(ranked.nonEmpty)
  }

  test("corpus prep: filter, then dedup, then deterministic sampling — in that order") {
    // 40 tokens, every token 3-9 chars, 4 stopwords => passes t7's rules
    def quality(tag: String) =
      Seq.fill(4)(s"the quick brown fox jumps over lazy dogs near $tag").mkString(" ")
    // LCG(id) % 100: id0 -> 45, id1 -> 90, id2 -> 87, id3 -> 32,
    // id4 -> 29, id7 -> 16 (en admits < 30, other langs < 60)
    val docs = Seq(
      (0L, quality("riverbank"), "xx", "s0", 0L),  // 45 < 60 => kept
      (1L, "too short", "xx", "s0", 0L),           // fails quality
      (2L, quality("mountains"), "xx", "s0", 0L),  // dup canonical, 87 >= 60 => dropped
      (3L, quality("mountains"), "xx", "s0", 0L),  // dup of 2 => dropped by dedup
      (4L, quality("waterfall"), "en", "s1", 0L),  // 29 < 30 => kept
      (7L, quality("grassland"), "en", "s1", 0L)   // 16 < 30 => kept
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = operators.Packing.corpusPrep(docs).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(0L, 4L, 7L))
    // dedup runs BEFORE sampling: doc 3 would be admitted (32 < 60)
    // but its canonical twin 2 is not — the pair must vanish, not
    // resurface through the non-canonical copy
    assert(out.forall(_.getAs[Long]("n_tokens") == 40L))
    val again = operators.Packing.corpusPrep(docs).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(again == Set(0L, 4L, 7L))
  }

  test("p12 corpus diff: every status class lands exactly where the splits put it") {
    import spark.implicits._
    // doc 7: in v1 (7%7=0 drops it... no: v1 drops doc_id%7==0) —
    // pick ids hitting each class: 7 → v1 drops it, v2 keeps → added;
    // 11 → v2 drops it → removed; 13 → shared, edited → modified;
    // 1 → shared, untouched → unchanged
    val docs = Seq(
      (1L, "alpha"), (7L, "beta"), (11L, "gamma"), (13L, "delta"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")))
    val out = operators.Packing.corpusDiff(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(out == Map(1L -> "unchanged", 7L -> "added",
      11L -> "removed", 13L -> "modified"), out.toString)
  }

  test("p13 soft dedup: singletons always survive; keep rule is the LCG test") {
    import spark.implicits._
    // components: {1,2,3,4} (size 4, threshold 250000), {10} and {11}
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 11L)).toDF("doc_id", "component_id")
    val kept = operators.Packing.softDedupSample(clusters)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(kept.contains(10L) && kept.contains(11L), "singletons survive")
    assert(kept.get(10L).map(_._2) === Some(1000000L))
    def lcgPpm(id: Long) =
      (((id % 2147483648L) * 1103515245L + 12345L) % 2147483648L) % 1000000L
    (1L to 4L).foreach { id =>
      assert(kept.contains(id) === (lcgPpm(id) < 250000L), s"doc $id")
      kept.get(id).foreach { case (size, w) =>
        assert(size === 4L && w === 250000L)
      }
    }
  }

  test("p15 interleave: strict round-robin while sources last; caps hold") {
    import spark.implicits._
    // 3 docs in 'a', 2 in 'b' → positions weave a,b,a,b,a (rank-major)
    val docs = Seq(
      (1L, "x", "en", "a", 1L), (2L, "x", "en", "a", 1L),
      (3L, "x", "en", "a", 1L), (4L, "x", "en", "b", 1L),
      (5L, "x", "en", "b", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.operators.Packing.interleaveSources(docs)
      .orderBy("position")
      .select("position", "source", "source_rank")
      .as[(Long, String, Long)].collect()
    assert(got.map(_._2).toSeq ===
      Seq("a", "b", "a", "b", "a"), "rank-major weave")
    assert(got.map(_._3).toSeq === Seq(1L, 1L, 2L, 2L, 3L),
      "every source's rank k precedes any rank k+1")
    // the per-source cap binds: 30 docs in one source keep only 25
    val big = (1L to 30L).map(i => (i, "x", "en", "solo", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(graft.operators.Packing.interleaveSources(big).count() === 25L)
  }

  test("p16 pack eval: full and underfull bins score as expected") {
    import spark.implicits._
    // 'en': three exactly-512-token docs → 3 bins at fill 512
    // 'fr': one 100-token doc → 1 bin at fill 100
    val text512 = Seq.fill(512)("w").mkString(" ")
    val text100 = Seq.fill(100)("w").mkString(" ")
    val docs = Seq(
      (1L, text512, "en", "s", 1L), (2L, text512, "en", "s", 1L),
      (3L, text512, "en", "s", 1L), (4L, text100, "fr", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("packeval").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("p16_pack_eval")(spark, dir)
      .collect().map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_bins"), r.getAs[Long]("avg_fill_ppm"),
          r.getAs[Double]("full_bin_share"), r.getAs[Double]("p50_fill"))))
      .toMap
    assert(out("en") == ((3L, 1000000L, 1.0, 512.0)))
    // 100·10⁶ div 512 = 195312 (floor); 100 < 90% of 512
    assert(out("fr") == ((1L, 195312L, 0.0, 100.0)))
  }

  test("p18 funnel: stages shrink monotonically and packing conserves the quality stage") {
    val rows = SparkEntry.queries("p18_corpus_funnel")(spark, sf)
      .collect().map(r => r.getAs[Long]("stage_id") ->
        (r.getAs[String]("stage"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_tokens"),
          Option(r.get(r.fieldIndex("n_bins"))).map(_.asInstanceOf[Long])))
      .toMap
    assert(rows.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(rows(0)._1 == "corpus" && rows(4)._1 == "packed")
    // each filter stage can only shrink the corpus (docs AND tokens)
    for (i <- 1L to 3L) {
      assert(rows(i)._2 <= rows(i - 1)._2, s"stage $i grew docs")
      assert(rows(i)._3 <= rows(i - 1)._3, s"stage $i grew tokens")
    }
    assert(rows(0)._2 > rows(3)._2, "funnel filtered nothing — fixture degenerate")
    // packing re-arranges, never drops: docs and tokens conserved
    assert(rows(4)._2 == rows(3)._2 && rows(4)._3 == rows(3)._3)
    // bin count only at the pack stage, and ≥ tokens/capacity
    assert(rows(4)._4.exists(_ >= rows(4)._3 / 512))
    for (i <- 0L to 3L) assert(rows(i)._4.isEmpty, s"stage $i has bins")
  }
}
