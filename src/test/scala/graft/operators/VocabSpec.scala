package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.MisraGries

class VocabSpec extends SparkSpec {
  import spark.implicits._

  test("Misra-Gries state is hard-bounded at k counters through reduce and merge") {
    val k = 10
    val agg = new MisraGries(k)
    val b = (0 until 10000).foldLeft(agg.zero) { (st, i) =>
      val next = agg.reduce(st, s"w${i % 500}")
      assert(next.counts.size <= k)
      next
    }
    val c = (0 until 10000).foldLeft(agg.zero)((st, i) => agg.reduce(st, s"x${i % 7}"))
    val m = agg.merge(b, c)
    assert(m.counts.size <= k)
    assert(m.n === 20000L)
  }

  test("two-pass frequentWords == exact frequent set at ANY partitioning (vocab >> k)") {
    // zipf-ish: word i appears ~N/(i+1) times over a 400-word vocabulary;
    // k=12 << vocab forces constant decrement/truncation traffic
    val rnd = new Random(42)
    val words = rnd.shuffle(
      (0 until 400).flatMap(i => Seq.fill(4000 / (i + 1))(s"w$i")).toList)
    val k = 12
    def exact(df: org.apache.spark.sql.DataFrame): Set[(String, Long)] = {
      val n = df.count()
      df.groupBy(col("w")).agg(count(lit(1)).as("n"))
        .filter(col("n") > lit(n.toDouble / (k + 1)))
        .as[(String, Long)].collect().toSet
    }
    for (parts <- Seq(1, 7, 32)) {
      val df = words.toDF("w").repartition(parts)
      val got = Vocab.frequentWords(df, k).as[(String, Long)].collect()
      assert(got.length === got.toSet.size, s"parts=$parts duplicates")
      assert(got.toSet === exact(df), s"parts=$parts")
    }
  }

  test("q69 LM score: uniform corpus scores ln(vocab); empty doc stays null") {
    val docs = Seq(
      (1L, "aa bb aa bb"),  // p(aa)=p(bb)=1/2 -> every token -ln(1/2)=ln 2
      (2L, "aa aa bb bb"),
      (3L, ""))             // zero words -> n_words 0, NULL score
      .toDF("doc_id", "text")
    // reuse the registered pipeline via a scratch parquet table
    val dir = java.nio.file.Files.createTempDirectory("vocabspec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Vocab.q69LmScore(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_words"), Option(x.get(2)))).toMap
    val ln2 = BigDecimal(math.log(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    assert(r(1L)._1 === 4L && r(2L)._1 === 4L && r(3L)._1 === 0L)
    assert(r(3L)._2 === None)
    for (d <- Seq(1L, 2L))
      assert(math.abs(r(d)._2.get.asInstanceOf[Double] - ln2.toDouble) < 1e-9)
  }

  test("q69 LM score is partitioning-insensitive (decimal accumulation)") {
    val q = Vocab.q69LmScore(spark, sf("sf0.001"))
    val a = q.collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    // same corpus fanned out to maximal parallelism: identical results
    val docs = Tables.documents(spark, sf("sf0.001")).repartition(32)
    val dir = java.nio.file.Files.createTempDirectory("vocabspec2").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val b = Vocab.q69LmScore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(a === b)
  }

  test("BPE pairs: position-sensitive adjacent counts, deterministic tie cut") {
    val docs = Seq(
      (1L, "a b a b a"),   // pairs: "a b" x2, "b a" x2
      (2L, "a b. c"),      // punctuation splits: "a b", "b c"
      (3L, "solo"),        // one token -> no pairs
      (4L, "123 !!!")      // letterless -> no pairs
    ).toDF("doc_id", "text")
    val out = Vocab.bpePairCounts(docs, k = 3)
      .as[(String, Long)].collect().toSeq
    // counts: "a b"->3, "b a"->2, "b c"->1; order (n desc, pair asc)
    assert(out === Seq(("a b", 3L), ("b a", 2L), ("b c", 1L)))
    // tie cut: with k=2 the tie between nothing is moot, but with all
    // counts equal the lexicographic tiebreak decides membership
    val ties = Seq((1L, "x y"), (2L, "p q"), (3L, "m n")).toDF("doc_id", "text")
    val cut = Vocab.bpePairCounts(ties, k = 2).as[(String, Long)].collect().toSeq
    assert(cut === Seq(("m n", 1L), ("p q", 1L)))
  }

  test("TF-cosine pairs: exact integer witnesses, threshold gate, df-cap") {
    // 10 docs so the relative df-cap (n div 5 = 2) is the binding bound
    val docs = Seq(
      (1L, "alpha beta alpha"),   // tf: alpha 2, beta 1 (both df 2)
      (2L, "alpha beta beta"),    // cos vs d1 = 4/sqrt(5·5) = 0.8 → in
      (3L, "gamma delta"),        // d3–d4 share gamma only: dot 1,
      (4L, "gamma epsilon"),      //   norms 2,2 → cos 0.5 → out
      (5L, "zeta"), (6L, "eta"), (7L, "theta"),
      // 'common' appears in 3 docs > cap 2 → excluded everywhere:
      (8L, "common common"),
      (9L, "common iota"), (10L, "common iota common"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("vocabcos").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Vocab.q106TfCosinePairs(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // d1–d2: dot = 2·1 + 1·2 = 4, ‖·‖² = 5 each → cos exactly 0.8 (the
    // >= boundary is IN). d9–d10 share iota AND the capped 'common':
    // with the cap applied both sides reduce to iota alone → witnesses
    // (dot 1, norms 1, 1); uncapped they would be (3, 2, 5) — the
    // witness values prove the cap reached the norms too.
    assert(got === Set((1L, 2L, 4L, 5L, 5L), (9L, 10L, 1L, 1L, 1L)))
  }

  test("BM25: closed-form scores, non-matching docs absent, ranking correct") {
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Seq(
      (1L, "hash join hash"),        // two query terms, tf(hash)=2
      (2L, "merge sort"),            // one query term
      (3L, "nothing relevant here")  // no query terms -> absent
    ).toDF("doc_id", "text")
    val out = Vocab.bm25(docs, Seq("hash", "join", "merge", "window"), 10)
      .as[(Long, Double, Long)].collect().toSeq
    // replicate the operator's arithmetic: N=3, avgdl=8/3, df=1 each
    val avgdl = 8.0 / 3.0
    val idf = math.log(1.0 + (3.0 - 1.0 + 0.5) / 1.5)
    def contrib(tf: Double, dl: Double) =
      r(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 8)
    val d1 = r(contrib(2, 3) + contrib(1, 3), 4)
    val d2 = r(contrib(1, 2), 4)
    assert(out === Seq((1L, d1, 2L), (2L, d2, 1L)))
    assert(d1 > d2)
  }

  test("keyness: unique word maximal, shared word low; closed-form lift and G2") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("keynessspec").toString
    // source A: "x x x shared"; source B: "y shared shared shared"
    Seq((1L, "x x x shared", "en", "A", 1L),
        (2L, "y shared shared shared", "en", "B", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Vocab.q173Keyness(spark, dir)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // A: x o_in=3 o_rest=0 -> lift = 3*4*1e6 / 1 = 12e6 (unique-max)
    val (xo, xr, xl, xg) = got(("A", "x"))
    assert((xo, xr, xl) === ((3L, 0L, 12000000L)))
    // closed-form G2 for x: e_in = 4*3/8 = 1.5; term = 3*ln(3/1.5); rest 0
    val wantXg = BigDecimal(2.0 * 3 * math.log(3 / 1.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(xg === wantXg)
    // A: shared o_in=1 o_rest=3 -> lift = 1*4*1e6 / (3*4) = 333333
    assert(got(("A", "shared"))._3 === 333333L)
    // per-source rank cut: at most 10 words each (2 words per source here)
    assert(got.keySet.map(_._1) === Set("A", "B"))
  }

  test("bpe trainer: round 2 merges a pair CONTAINING round 1's token; exhaustion drops rounds") {
    // 5 copies of "a b c": round 1 merges the tied-min pair "a b",
    // round 2 merges "a#b c" (the feedback a single count step cannot
    // show), round 3 finds no pair left and is dropped on both engines
    val docs = Seq.fill(5)("a b c").toDF("text")
    val got = Vocab.bpeTrain(docs)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "a b", 5L), (2L, "a#b c", 5L)))
  }

  test("bpe rewrite is canonical Sennrich: consecutive occurrences all merge in one round") {
    // the pre-round-13 single-spaced rewrite consumed the shared
    // separator, merging only every OTHER consecutive occurrence —
    // demonstrably: replace(' a b a b ', ' a b ', ' a#b ') leaves the
    // middle occurrence untouched
    val old = spark.sql(
      "SELECT replace(' a b a b ', ' a b ', ' a#b ') AS t").first().getString(0)
    assert(old === " a#b a b ") // the documented deviation, now closed
    // the separator-doubling rewrite merges every leftmost-greedy
    // non-overlapping occurrence, exactly the reference algorithm —
    // including self-pair runs, where overlap is on the shared TOKEN
    val cases = Seq(
      (" a b a b ", "a b", " a#b a#b "),
      (" a b a b a b ", "a b", " a#b a#b a#b "),
      (" a a a a ", "a a", " a#a a#a "),
      (" a a a a a ", "a a", " a#a a#a a "),
      (" a a a ", "a a", " a#a a "),
      (" x a b y ", "a b", " x a#b y "),
      (" a b ", "c d", " a b "),              // non-occurring pair: no-op
      (" a#b c a#b c ", "a#b c", " a#b#c a#b#c ")) // merged-token pairs
    import spark.implicits._
    val got = cases.map(_._1).zip(cases.map(_._2)).toDF("t", "pair")
      .selectExpr(Vocab.mergeRewriteExpr + " AS t")
      .as[String].collect().toSeq
    assert(got === cases.map(_._3)) // Spark == hand-derived == DuckDB
    // end-to-end: "a b a b" corpus — round 1 merges BOTH occurrences,
    // so round 2 sees (a#b, a#b) and round 3 exhausts
    val docs = Seq.fill(3)("a b a b").toDF("text")
    val trained = Vocab.bpeTrain(docs)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(trained === Seq((1L, "a b", 6L), (2L, "a#b a#b", 3L)))
  }

  test("bpe encode: learned merges compress the training corpus; exhausted round is a no-op; short docs censused") {
    // same corpus as the exhaustion trainer test, plus docs the TRAINER
    // ignores but the ENCODER must still census: a 1-token doc (nothing
    // to merge) and a letterless doc (zero tokens)
    val corpus = Seq(
      (1L, "a b c", "s1"), (2L, "a b c", "s1"), (3L, "a b c", "s1"),
      (4L, "a b c", "s1"), (5L, "a b c", "s1"),
      (6L, "x", "s2"), (7L, "123 !!!", "s2"))
    val dir = java.nio.file.Files.createTempDirectory("bpeenc").toString
    corpus.toDF("doc_id", "text", "source").withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Vocab.q214BpeEncode(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // s1: round 1 "a b" -> a#b, round 2 "a#b c" -> a#b#c, round 3
    // exhausted (guarded no-op): every doc 3 tokens -> 1
    assert(got("s1") === ((5L, 15L, 5L, (10L * 1000000000L) / 15L)))
    // s2: 1-token and 0-token docs pass through unchanged, censused
    assert(got("s2") === ((2L, 1L, 1L, 0L)))
  }

  test("KN bigram: first-principles referee equality; continuation counts, not frequency, set backoff mass") {
    val corpus = Seq(
      (1L, "the cat sat"), (2L, "the dog sat"), (3L, "a cat ran"),
      (4L, "san francisco san francisco"), (5L, "x")) // <2 tokens: null score
    val dir = java.nio.file.Files.createTempDirectory("knspec").toString
    corpus.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Vocab.q212KnBigram(spark, dir)
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    // independent Scala referee, straight from the KN definition
    val toks = corpus.map { case (id, t) =>
      id -> t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq
    }.toMap
    val bigrams = toks.view.mapValues(ts => ts.zip(ts.drop(1))).toMap
    val all = bigrams.values.flatten.toSeq
    val cvw = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cv = all.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1v = cvw.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1w = cvw.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val npp = cvw.size.toLong
    def nll(b: (String, String)): BigDecimal = {
      val num = math.max(4 * cvw(b) - 3, 0L) * npp + 3 * n1v(b._1) * n1w(b._2)
      val den = 4 * cv(b._1) * npp
      BigDecimal(-math.log(num.toDouble / den.toDouble))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    }
    corpus.foreach { case (id, _) =>
      val bs = bigrams(id)
      val (n, score) = got(id)
      assert(n === bs.size.toLong, s"doc $id")
      if (bs.isEmpty) assert(score.isEmpty, s"doc $id")
      else {
        val want = BigDecimal(bs.map(nll).sum.toDouble / bs.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(score.contains(want), s"doc $id: ${score} vs $want")
      }
    }
    // the Kneser-Ney point: 'sat' and 'francisco' both occur twice, but
    // 'sat' follows TWO distinct contexts and 'francisco' only one, so
    // sat's continuation weight - its probability in unseen contexts -
    // must be the larger one
    assert(all.count(_._2 == "sat") === all.count(_._2 == "francisco"))
    assert(n1w("sat") > n1w("francisco"))
  }

  test("KN bigram: referee equality holds on random corpora") {
    // randomized version of the fixture test: small vocabulary forces
    // rich bigram collision structure (shared contexts, repeated pairs,
    // max(4c-3,0) hitting both branches)
    val vocab = Vector("a", "b", "c", "d", "e")
    val rng = new Random(4242)
    (0 until 8).foreach { k =>
      val corpus = (0 until (3 + rng.nextInt(10))).map { i =>
        val len = rng.nextInt(12) // 0..11 tokens: sub-2 docs included
        (i.toLong, Seq.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" "))
      }
      val dir = java.nio.file.Files.createTempDirectory(s"knprop$k").toString
      corpus.toDF("doc_id", "text").withColumn("lang", lit("en"))
        .withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = Vocab.q212KnBigram(spark, dir)
        .as[(Long, Long, Option[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap

      val toks = corpus.map { case (id, t) =>
        id -> t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq
      }.toMap
      val bigrams = toks.view.mapValues(ts => ts.zip(ts.drop(1))).toMap
      val all = bigrams.values.flatten.toSeq
      if (all.nonEmpty) {
        val cvw = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val cv = all.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        val n1v = cvw.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        val n1w = cvw.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val npp = cvw.size.toLong
        def nll(b: (String, String)): BigDecimal = {
          val num = math.max(4 * cvw(b) - 3, 0L) * npp +
            3 * n1v(b._1) * n1w(b._2)
          val den = 4 * cv(b._1) * npp
          BigDecimal(-math.log(num.toDouble / den.toDouble))
            .setScale(8, BigDecimal.RoundingMode.HALF_UP)
        }
        corpus.foreach { case (id, _) =>
          val bs = bigrams(id)
          val (n, score) = got(id)
          assert(n === bs.size.toLong, s"case $k doc $id")
          if (bs.isEmpty) assert(score.isEmpty, s"case $k doc $id")
          else {
            val want = BigDecimal(bs.map(nll).sum.toDouble / bs.size)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            assert(score.contains(want), s"case $k doc $id")
          }
        }
      } else corpus.foreach { case (id, _) =>
        assert(got(id) === ((0L, None)), s"case $k doc $id")
      }
    }
  }

  test("vocab coverage: hand-derived curve, ties broken lexicographically, K past the type count saturates at 1.0") {
    // bigram counts by construction: "a b"x2, "b a"x2, "a c"x1 from doc 1,
    // "b c"x1 from doc 2 — total 6 occurrences, 4 types.
    // rank order (count desc, bigram asc): a b, b a, a c, b c
    val docs = Seq(
      (1L, "a b a b a c"),
      (2L, "b c"),
      (3L, "solo") // single-token doc: no bigrams, must not contribute
    ).toDF("doc_id", "text")
    val got = Vocab.vocabCoverage(docs, Seq(1, 2, 3, 9))
      .as[(Int, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1) === ((1L, 2L, 0.333333))) // {a b}
    assert(got(2) === ((2L, 4L, 0.666667))) // + {b a}: the tie broke a-first
    assert(got(3) === ((3L, 5L, 0.833333))) // + {a c}
    assert(got(9) === ((4L, 6L, 1.0)))      // K past 4 types: all covered
  }
}
