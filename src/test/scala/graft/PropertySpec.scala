package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.rng.Seed
import graft.functions.TextFunctions
import graft.functions.TopKAggregate.topkByScore

/** Property-based checks (scalacheck generators, fixed seed so runs
  * are reproducible): the native expressions and the bounded-heap
  * aggregate each verified against a straightforward Scala reference
  * implementation on randomized inputs — the class of edge case
  * (empty strings, unicode, ties, k > group size) hand-written
  * fixtures tend to miss.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.iterate((Seed(42L), Option.empty[A])) { case (s, _) =>
      val r = g.doPureApply(Gen.Parameters.default, s)
      (r.seed.next, Some(r.retrieve.get))
    }.drop(1).take(n).flatMap(_._2).toSeq

  test("fingerprint64 equals the positional-codepoint reference on random strings") {
    val strGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.const(' '), Gen.oneOf('é', 'ß', 'λ', '中')))
      .map(_.mkString)
    val inputs = samples(strGen, 200)
    def reference(s: String): Long = {
      var (sum, pos, i) = (0L, 1L, 0)
      while (i < s.length) {
        val cp = s.codePointAt(i)
        sum += pos * cp; i += Character.charCount(cp); pos += 1
      }
      sum
    }
    val got = inputs.toDF("t")
      .select(TextFunctions.fingerprint(col("t"))).as[Long].collect()
    inputs.zip(got).foreach { case (s, g) =>
      assert(g == reference(s), s"fingerprint mismatch for ${s.take(40)}")
    }
  }

  test("wordNgrams(n) equals sliding-window reference on random token arrays") {
    val toksGen = Gen.listOf(Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString))
    val inputs = samples(toksGen, 150)
    for (n <- Seq(2, 3, 5)) {
      val got = inputs.toDF("toks")
        .select(TextFunctions.wordNgrams(col("toks"), n)).as[Seq[String]].collect()
      inputs.zip(got).foreach { case (toks, g) =>
        val ref = if (toks.length < n) Seq.empty
          else toks.sliding(n).map(_.mkString(" ")).toSeq
        assert(g == ref, s"ngrams($n) mismatch for $toks")
      }
    }
  }

  test("topNgramFreq equals the groupBy-count reference on random token arrays") {
    // tiny alphabet so repeats (and ties) are common — the shapes the
    // sorted-run fold must get right
    val toksGen = Gen.listOf(Gen.oneOf("a", "b", "c", "aa"))
    val inputs = samples(toksGen, 200)
    for (n <- Seq(2, 3)) {
      val got = inputs.toDF("toks")
        .select(TextFunctions.topNgramFreq(col("toks"), n)).as[Long].collect()
      inputs.zip(got).foreach { case (toks, g) =>
        val ref = if (toks.length < n) 0L
          else toks.sliding(n).map(_.mkString(" ")).toSeq
            .groupBy(identity).values.map(_.size.toLong).max
        assert(g == ref, s"topNgramFreq($n) mismatch for $toks: $g != $ref")
      }
    }
  }

  test("BmpCodec round-trips synthBmp for random dimensions and pixel sources") {
    import graft.operators.Multimodal
    val codec = new Multimodal.BmpCodec
    val gen = for {
      w <- Gen.choose(1, 13)
      h <- Gen.choose(1, 9)
      src <- Gen.listOf(Gen.choose(-128, 127).map(_.toByte))
    } yield (w, h, src.toArray)
    samples(gen, 100).foreach { case (w, h, src) =>
      val bmp = Multimodal.synthBmp(w, h, src)
      val f = codec.decode(Multimodal.MediaRow(1L, bmp, "image/bmp", w, h))
      assert(f(0) == bmp.length.toDouble)
      assert(f(1) == (w.toLong * h).toDouble)
      assert(f(3) == w.toDouble && f(4) == h.toDouble,
        s"dims lost in round-trip: $w x $h -> ${f(3)} x ${f(4)}")
      // mean over the cycled channel bytes, padding excluded
      val n = w * 3 * h
      val ref = (0 until n).map(j =>
        if (src.isEmpty) (j * 31) & 0xff else src(j % src.length) & 0xff)
        .sum.toDouble / n
      assert(math.abs(f(2) - math.round(ref * 1e6) / 1e6) < 1e-9,
        s"mean mismatch at $w x $h, |src|=${src.length}")
    }
  }

  test("topkByScore equals sort-take reference for random groups and k") {
    val rowGen = for {
      grp <- Gen.choose(0, 4)
      score <- Gen.oneOf(Gen.choose(-100, 100).map(_.toDouble / 10),
        Gen.const(1.5)) // forced ties
      id <- Gen.choose(0L, 50L)
    } yield (grp, score, id)
    val rows = samples(rowGen, 400)
    for (k <- Seq(1, 3, 7)) {
      val got = rows.toDF("g", "score", "id")
        .groupBy("g").agg(topkByScore(col("score"), col("id"), k).as("tk"))
        .select(col("g"), col("tk"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(t => (t.getDouble(0), t.getLong(1))))
        .toMap
      rows.groupBy(_._1).foreach { case (g, rs) =>
        // reference: distinct (score, id) ranking is NOT deduped — the
        // aggregate keeps duplicates like a window would
        val ref = rs.map(t => (t._2, t._3)).sortBy(t => (-t._1, t._2)).take(k)
        assert(got(g) == ref, s"group $g k=$k: ${got(g)} vs $ref")
      }
    }
  }

  test("LCA pairs equal the root-path reference on random trees") {
    import graft.operators.{HierarchyAgg, HierarchyDimension}
    // random forests-as-trees: node i's parent is uniform over [0, i)
    val treeGen = for {
      n <- Gen.choose(5, 30)
      parents <- Gen.sequence[Seq[Int], Int](
        (1 until n).map(i => Gen.choose(0, i - 1)))
    } yield parents
    samples(treeGen, 6).foreach { parents =>
      val n = parents.size + 1
      val rows = (0 until n).map { i =>
        (s"v$i", i.toLong, s"node $i", "L",
          if (i == 0) null else s"v${parents(i - 1)}")
      }
      val nodes = rows.toDF("node_id", "node_natural_key", "node_name",
        "level_name", "parent_node_id")
      val dim = new HierarchyDimension(nodes, knownDepth = n)
      val got = HierarchyAgg.lcaPairs(dim.aggregationDim).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
      // reference: deepest common node of the two root paths
      def path(i: Int): List[Int] =
        if (i == 0) List(0) else path(parents(i - 1)) :+ i
      val children = parents.zipWithIndex.map { case (p, i) => p }.toSet
      val leaves = (0 until n).filterNot(children.contains)
      val expected = (for {
        a <- leaves; b <- leaves if s"v$a" < s"v$b"
      } yield {
        val (pa, pb) = (path(a), path(b))
        val lca = pa.zip(pb).takeWhile { case (x, y) => x == y }.last._1
        (s"v$a", s"v$b") -> s"v$lca"
      }).toMap
      assert(got == expected,
        s"n=$n parents=$parents\n got=$got\n want=$expected")
    }
  }

  test("incremental closure move equals the rebuilt closure on random trees and moves") {
    import graft.operators.HierarchyDimension
    val caseGen = for {
      n <- Gen.choose(6, 25)
      parents <- Gen.sequence[Seq[Int], Int](
        (1 until n).map(i => Gen.choose(0, i - 1)))
      moved <- Gen.choose(1, n - 1) // never the root
      target <- Gen.choose(0, n - 1)
    } yield (parents, moved, target)
    samples(caseGen, 8).foreach { case (parents, moved, target) =>
      val n = parents.size + 1
      def nodesDf(par: Int => Option[Int]) = (0 until n).map { i =>
        (s"v$i", i.toLong, s"node $i", "L", par(i).map(p => s"v$p").orNull)
      }.toDF("node_id", "node_natural_key", "node_name",
        "level_name", "parent_node_id")
      def parentOf(i: Int): Option[Int] =
        if (i == 0) None else Some(parents(i - 1))
      // target inside the moved subtree (or = moved) ⇒ invalid move
      def inSubtree(x: Int): Boolean =
        x == moved || parentOf(x).exists(inSubtree)
      val base = new HierarchyDimension(nodesDf(parentOf), knownDepth = n)
      if (inSubtree(target)) {
        intercept[IllegalArgumentException] {
          HierarchyDimension.moveSubtreeClosure(
            base.closurePairs, s"v$moved", s"v$target")
        }
      } else {
        val got = HierarchyDimension.moveSubtreeClosure(
            base.closurePairs, s"v$moved", s"v$target")
          .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
        def movedParent(i: Int): Option[Int] =
          if (i == moved) Some(target) else parentOf(i)
        val rebuilt = new HierarchyDimension(nodesDf(movedParent), knownDepth = n)
          .closurePairs.collect()
          .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
        assert(got == rebuilt,
          s"n=$n parents=$parents move v$moved -> v$target")
      }
    }
  }

  test("SCD2 merge equals the all-events rebuild for random streams and cutoffs") {
    val caseGen = for {
      n <- Gen.choose(2, 30)
      users <- Gen.listOfN(n, Gen.choose(1L, 4L))
      cutFrac <- Gen.choose(0, 10)
    } yield (users, cutFrac)
    samples(caseGen, 5).zipWithIndex.foreach { case ((users, cutFrac), ci) =>
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val rows = users.zipWithIndex.map { case (u, i) =>
        (u, new java.sql.Timestamp(base.getTime + i * 3600000L),
          (ci * 1000 + i).toLong, s"s${i % 3}", 1.0)
      }
      val dir = java.nio.file.Files.createTempDirectory("scd2_prop").toString
      rows.toDF("user_id", "ts", "event_id", "event_type", "value")
        .write.parquet(s"$dir/events.parquet")
      // q45's entry hard-codes its cutoff; replicate its merge with a
      // random cutoff against the q34 rebuild on the same data
      val cutTs = new java.sql.Timestamp(
        base.getTime + (users.size * cutFrac / 10) * 3600000L)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      def intervals(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("valid_to_ts", lead("ts", 1).over(w))
        .select(col("user_id"), col("event_id"), col("event_type").as("state"),
          col("ts").as("from_ts"), col("valid_to_ts"))
      val ev = Tables.events(spark, dir)
      val existing = intervals(ev.filter(col("ts") < lit(cutTs)))
      val batch = ev.filter(col("ts") >= lit(cutTs))
      val bridge = batch.groupBy("user_id")
        .agg(min(struct(col("ts"), col("event_id"))).as("f"))
        .select(col("user_id"), col("f.ts").as("bridge_ts"))
      val merged = existing.filter(col("valid_to_ts").isNotNull)
        .unionByName(existing.filter(col("valid_to_ts").isNull)
          .drop("valid_to_ts").join(bridge, Seq("user_id"), "left")
          .withColumn("valid_to_ts", col("bridge_ts")).drop("bridge_ts"))
        .unionByName(intervals(batch))
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select(col("user_id"), col("event_id"), col("state"),
          col("from_ts").cast("string"), col("valid_to_ts").cast("string"))
        .collect().map(_.toSeq).sortBy(_.toString)
      val rebuilt = intervals(ev)
      assert(canon(merged).toSeq == canon(rebuilt).toSeq,
        s"case $ci cutFrac=$cutFrac users=$users")
    }
  }

  test("attribution equals the plain-Scala journey walk on random event sequences") {
    val seqGen = for {
      n <- Gen.choose(1, 40)
      types <- Gen.listOfN(n, Gen.oneOf("view", "click", "purchase", "error"))
    } yield types
    samples(seqGen, 6).zipWithIndex.foreach { case (types, caseIdx) =>
      val base = java.sql.Timestamp.valueOf("2024-05-01 00:00:00")
      val rows = types.zipWithIndex.map { case (t, i) =>
        (1L, new java.sql.Timestamp(base.getTime + i * 60000L),
          (caseIdx * 1000 + i).toLong, t, 1.0)
      }
      val dir = java.nio.file.Files.createTempDirectory(s"attr_prop").toString
      rows.toDF("user_id", "ts", "event_id", "event_type", "value")
        .write.parquet(s"$dir/events.parquet")
      val got = SparkEntry.queries("q44_attribution")(spark, dir)
        .collect().map(r => r.getAs[Long]("conversion_id") ->
          ((r.getAs[Long]("first_touch_id"), r.getAs[String]("first_touch_type"),
            r.getAs[Long]("last_touch_id"), r.getAs[String]("last_touch_type"))))
        .toMap
      // reference: linear walk carrying (first, last) touch slots
      var ft = (-1L, "direct"); var lt = (-1L, "direct")
      val want = scala.collection.mutable.Map[Long, (Long, String, Long, String)]()
      rows.foreach { case (_, _, id, t, _) =>
        if (t == "purchase") want(id) = (ft._1, ft._2, lt._1, lt._2)
        else { if (ft._1 == -1L) ft = (id, t); lt = (id, t) }
      }
      assert(got == want.toMap, s"case $caseIdx types=$types")
    }
  }

  test("q41 transition counts equal the plain-Scala reference on random sequences") {
    import org.apache.spark.sql.expressions.Window
    val gen = for {
      n <- Gen.choose(20, 80)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(0L, 4L)
        t <- Gen.oneOf("view", "click", "purchase")
        us <- Gen.choose(0L, 1000000L)
      } yield (u, t, us))
    } yield rows.zipWithIndex.map { case ((u, t, us), i) => (i.toLong, u, t, us) }
    samples(gen, 5).foreach { rows =>
      val df = rows.toDF("event_id", "user_id", "event_type", "us")
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val got = df.withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy("prev_type", "event_type").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val ref = rows.groupBy(_._2).values.flatMap { evs =>
        val sorted = evs.sortBy(e => (e._4, e._1)).map(_._3)
        sorted.zip(sorted.drop(1))
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(got == ref, s"\n got=$got\n ref=$ref")
    }
  }

  test("q40 time-weighted average equals the hand-computed LOCF integral") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // user 1: 10 held 10s, 30 held 20s over a 30s span → (100+600)/30
    // user 2: single event → excluded
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(base.getTime + sec * 1000)
    val ev = Seq(
      (1L, 1L, at(0), 10.0), (2L, 1L, at(10), 30.0), (3L, 1L, at(30), 50.0),
      (4L, 2L, at(5), 99.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val out = ev.select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("us"))
      .withColumn("next_us", lead("us", 1).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value") * (col("next_us") - col("us"))) /
          (max("us") - min("us")), 4).as("twa"))
      .filter(col("n_events") >= 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out == Map(1L -> 23.3333), out.toString)
  }

  test("fused DFS sort order equals the to_json window reference on hostile names") {
    import org.apache.spark.sql.expressions.Window
    // names deliberately include JSON-escaping and collation hazards:
    // quotes, backslashes, control chars, '/', unicode above ASCII
    val nameGen = Gen.listOfN(6, Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('"', '\\', '\n', '\t', '\u0001', 'é', '文', ' ', '/', '{')))
      .map(_.mkString)
    val n = 48
    val names = samples(nameGen, n)
    val parentPick = samples(Gen.choose(0, n - 1), n)
    val rows = (0 until n).map { i =>
      val parent = if (i == 0) null else s"n${parentPick(i) % i}" // parents earlier → acyclic
      (s"n$i", i.toLong, names(i), "L", parent)
    }
    val df = rows.toDF("node_id", "node_natural_key", "node_name", "level_name", "parent_node_id")
    val dim = new graft.operators.HierarchyDimension(df)
    val withRef = dim.reportingDimWithPath.withColumn("ref_order",
      row_number().over(Window.orderBy(array_join(
        expr("transform(path, x -> to_json(x, map('ignoreNullFields','false')))"), "/")))
        .cast("long"))
    val mismatch = withRef.filter(col("node_sort_order") =!= col("ref_order"))
    assert(mismatch.count() == 0,
      mismatch.select("node_id", "node_name", "node_sort_order", "ref_order")
        .collect().mkString("\n"))
  }

  test("topkRows equals (score desc, term asc) sort-take reference on random data") {
    import graft.functions.TopKAggregate.topkRows
    val rowGen = for {
      grp <- Gen.choose(0, 4)
      score <- Gen.oneOf(Gen.choose(-100, 100).map(_.toDouble / 10),
        Gen.const(2.5)) // forced ties → string tie-break must decide
      term <- Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
      payload <- Gen.choose(0L, 1000L)
    } yield (grp, score, term, payload)
    val rows = samples(rowGen, 400)
    for (k <- Seq(1, 3, 7)) {
      val got = rows.toDF("g", "score", "term", "payload")
        .groupBy("g")
        .agg(topkRows(col("score"), col("term"),
          struct(col("term"), col("score"), col("payload")), k).as("tk"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(t => (t.getString(0), t.getDouble(1), t.getLong(2))))
        .toMap
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val sorted = rs.map(t => (t._3, t._2, t._4))
          .sortBy { case (term, score, _) => (-score, term) }
        // ties beyond (score, term) — equal pairs with different
        // payloads — have no defined winner; compare the rank keys,
        // and payloads only where the key is unique in the window
        val refKeys = sorted.take(k).map(t => (t._2, t._1))
        val gotKeys = got(g).map(t => (t._2, t._1))
        assert(gotKeys == refKeys, s"group $g k=$k: $gotKeys vs $refKeys")
      }
    }
  }

  test("histogram-quantile MV brackets the exact order statistic within one bucket width") {
    import graft.operators.MvFold
    // the accuracy CONTRACT of q84's sketch: for any data and any
    // percent, readout ≤ exact-rank value < readout + width, where
    // the exact rank is the same ceil(p·n/100) the readout targets
    val (lo, hi, nb) = (0L, 1024L, 64)
    val width = (hi - lo) / nb
    val rowsGen = Gen.nonEmptyListOf(Gen.choose(0L, 1023L))
    for ((vals, i) <- samples(rowsGen, 12).zipWithIndex) {
      val df = vals.map(("g", _)).toDF("grp", "v")
      val mv = MvFold.buildHist(df, Seq("grp"), col("v"), lo, hi, nb)
      val ps = Seq(1, 25, 50, 75, 95, 100)
      val got = MvFold.readHistQuantiles(mv, Seq("grp"), ps, lo, hi, nb)
        .collect().head
      val sorted = vals.sorted
      ps.zipWithIndex.foreach { case (p, j) =>
        val rank = (p.toLong * sorted.length + 99) / 100
        val exact = sorted((rank - 1).toInt)
        val q = got.getLong(1 + j)
        assert(q <= exact && exact < q + width,
          s"case $i p$p: readout $q !~ exact $exact (n=${sorted.length})")
      }
    }
  }
}
