package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = {
    val base = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (1L, "spark executes declarative plans with whole stage codegen and adaptive execution"),
      (2L, "completely unrelated text about cooking pasta with garlic olive oil and basil"),
      (3L, "a fourth document mentioning distributed shuffles partitions and broadcast joins"))
    // 100: near-copy of 0 (one word changed); 101: exact copy of 1;
    // 102: unrelated.
    val extra = Seq(
      (100L, "the quick brown fox jumps over the lazy cat near the river bank today"),
      (101L, "spark executes declarative plans with whole stage codegen and adaptive execution"),
      (102L, "yet another totally different subject entirely about astronomy and telescopes"))
    (base ++ extra).toDF("doc_id", "text")
  }

  test("minhash-LSH finds seeded near-dups and exact dups, nothing else") {
    val pairs = Dedup.neardupPairs(corpus(), bands = 16, rowsPerBand = 4, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 100L), (1L, 101L)))
  }

  test("minhash-LSH plan contains no cartesian product") {
    val plan = Dedup.neardupPairs(corpus(), 16, 4, 0.8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("exact dedup collapses exact (normalized) duplicates only") {
    val docs = corpus().unionAll(Seq(
      (200L, "  SPARK executes declarative plans with whole stage codegen and adaptive execution  "))
      .toDF("doc_id", "text"))
    val out = docs.groupBy(md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
    val dups = out.filter(col("n") > 1).select("keep_id", "n").as[(Long, Long)].collect().toSet
    // doc 1 == doc 101 == doc 200 (after case/whitespace normalization)
    assert(dups === Set((1L, 3L)))
  }

  test("simhash: near-dups within small hamming distance, unrelated docs far") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val sh = Dedup.simhash(corpus())
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    assert(hamming(sh(1L), sh(101L)) === 0) // identical text
    assert(hamming(sh(0L), sh(100L)) <= 16) // one word changed
    assert(hamming(sh(0L), sh(2L)) > 16)    // unrelated
    assert(hamming(sh(2L), sh(102L)) > 16)  // unrelated
  }

  test("near-dup detection is insensitive to input partitioning") {
    val one = Dedup.neardupPairs(corpus().repartition(1), 16, 4, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val many = Dedup.neardupPairs(corpus().repartition(7), 16, 4, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(one === many)
  }

  test("spark.graft.dedup.cache=true caches gram rows without changing results") {
    val base = Dedup.neardupPairs(corpus(), 16, 4, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    spark.conf.set("spark.graft.dedup.cache", "true")
    try {
      val df = Dedup.neardupPairs(corpus(), 16, 4, 0.5)
      val cached = df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(cached === base)
      assert(df.queryExecution.executedPlan.toString.contains("InMemoryTableScan"),
        "expected the gram/signature cache in the plan when the flag is on")
    } finally {
      spark.conf.unset("spark.graft.dedup.cache")
      spark.catalog.clearCache()
    }
  }

  test("dedup clusters: transitive closure over non-transitive pairs") {
    // pair graph: 1-2, 2-3, 3-4 (a chain: 1 and 4 are NOT a direct
    // pair) + isolated pair 10-11 → components {1,2,3,4} and {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val out = Dedup.dedupClusters(pairs)
      .as[(Long, Long, Long)].collect()
      .map { case (id, rep, sz) => id -> ((rep, sz)) }.toMap
    Seq(1L, 2L, 3L, 4L).foreach(id => assert(out(id) === ((1L, 4L)), s"id=$id"))
    Seq(10L, 11L).foreach(id => assert(out(id) === ((10L, 2L)), s"id=$id"))
    assert(out.size === 6)
  }

  test("dedup clusters match a union-find reference on random graphs") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val n = 30
      val pairs = Seq.fill(25) {
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      // driver-side union-find reference
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val want = nodes.map { id =>
        // representative = min node id in the component
        val root = find(id.toInt)
        val rep = nodes.filter(o => find(o.toInt) == root).min
        id -> rep
      }.toMap
      val got = Dedup.dedupClusters(pairs.toDF("id_a", "id_b"))
        .select("doc_id", "cluster_rep")
        .as[(Long, Long)].collect().toMap
      assert(got === want, s"trial $trial")
      // the star-contraction path must agree with union-find AND with
      // label propagation, full output shape included
      val star = Dedup.dedupClusters(pairs.toDF("id_a", "id_b"), algo = "star")
        .select("doc_id", "cluster_rep")
        .as[(Long, Long)].collect().toMap
      assert(star === want, s"trial $trial (star)")
    }
  }

  test("star contraction converges in O(log n) rounds on a long chain") {
    // a 200-node path has diameter 199: label propagation needs ~200
    // rounds, star contraction collapses it within 15
    val chain = (1L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      Dedup.dedupClusters(chain, maxIters = 15).collect()
    }
    val out = Dedup.dedupClusters(chain, maxIters = 15, algo = "star")
      .as[(Long, Long, Long)].collect()
    assert(out.length === 200)
    assert(out.forall { case (_, rep, sz) => rep == 1L && sz == 200L },
      out.take(5).mkString(", "))
  }

  test("dedup clusters refuse to return unconverged labels") {
    // an 8-node chain has diameter 7 > 3 allowed rounds → loud failure,
    // never silently under-merged clusters
    val chain = (1L until 8L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupClusters(chain, maxIters = 3).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("stop-gram df cap bounds Jaccard candidate generation") {
    // 50 docs, pairwise-distinct except ONE boilerplate trigram shared by
    // all: without a cap the inverted-index join emits C(50,2) = 1225
    // candidate pairs from that single stop-gram; with df ≤ 10 it emits
    // none (pairs share no sub-cap gram).
    val docs = (0 until 50).map { i =>
      val k = i + 1
      (i.toLong, s"${"u" * k} ${"v" * k} ${"w" * k} shared boilerplate footer")
    }.toDF("doc_id", "text")
    val gh = Dedup.gramHashRows(docs)
    assert(Dedup.jaccardCandidates(gh, maxDf = 10000).count() === 50L * 49 / 2)
    assert(Dedup.jaccardCandidates(gh, maxDf = 10).count() === 0L)
  }

  test("LSH bucket-size cap drops adversarial mega-buckets from candidate generation") {
    // 12 identical docs share every band bucket → bucket size 12; a cap
    // of 4 suppresses all k² candidates, the default keeps all 66 pairs.
    val docs = (0 until 12).map(i =>
      (i.toLong, "the exact same boilerplate text repeated for every " +
        "document in this corpus to force one giant bucket")).toDF("doc_id", "text")
    assert(Dedup.neardupPairs(docs, 16, 4, 0.8).count() === 66L)
    assert(Dedup.neardupPairs(docs, 16, 4, 0.8, maxBucket = 4).count() === 0L)
  }

  test("LSH cap is not silent: the graft_neardup_cap metrics report drops") {
    // The in/out observe pair must surface drops at action time (in ==
    // out exactly when nothing was dropped — symmetric under any
    // exchange reuse). Two scenarios:
    //   partial drop (realistic): flood group capped, singleton docs
    //     survive — metrics fire under DEFAULT confs;
    //   total drop (adversarial): every banded row capped — AQE's
    //     empty-relation propagation deletes the emptied subtree and the
    //     metric nodes with it, so the guaranteed signal needs that rule
    //     excluded (or the oversizedBuckets diagnostic).
    val floodDocs = (0 until 12).map(i =>
      (i.toLong, "the exact same boilerplate text repeated for every " +
        "document in this corpus to force one giant bucket"))
    // distinct LETTER-based tokens per doc (the tokenizer strips digits;
    // a shared phrase + numeric suffix would make these near-dups of
    // each other and cap their own buckets too)
    val singletons = (12 until 20).map { i =>
      val t = ('a' + (i - 12)).toChar.toString * 3
      (i.toLong, s"${t}foo ${t}bar ${t}baz ${t}qux ${t}quux")
    }

    @volatile var seen: Option[(Long, Long)] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit = {
        // GraftMetrics.observed = the engine's monitoring path (what the
        // GraftSession cap WARN listener reads): qe.observedMetrics plus
        // fired counters recovered from AQE-empty-propagated subtrees —
        // the r18 neardup checkpoints lose the doc_id partitioning, the
        // distinct gains an exchange, and a zero-candidate corpus (this
        // one) empties it, deleting the metric nodes from the final plan.
        val m = graft.GraftMetrics.observed(qe)
        for {
          in <- m.get("graft_neardup_cap_in")
          out <- m.get("graft_neardup_cap_out")
        } seen = Some((in.getLong(0), out.getLong(0)))
      }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    def await(): Option[(Long, Long)] = {
      // QueryExecutionListener delivery is async on the listener bus
      val deadline = System.nanoTime() + 10e9.toLong
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      seen
    }
    spark.listenerManager.register(listener)
    try {
      // partial drop, default confs
      Dedup.neardupPairs((floodDocs ++ singletons).toDF("doc_id", "text"),
        16, 4, 0.8, maxBucket = 4).count()
      val (pin, pout) = await().getOrElse(fail("partial-drop metrics never arrived"))
      assert(pin - pout >= 192L, s"flood rows must show as dropped: in=$pin out=$pout")
      assert(pout > 0L, s"singleton rows must survive the cap: out=$pout")

      // total drop, empty propagation excluded
      seen = None
      spark.conf.set("spark.sql.adaptive.optimizer.excludedRules",
        "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation")
      try {
        Dedup.neardupPairs(floodDocs.toDF("doc_id", "text"),
          16, 4, 0.8, maxBucket = 4).count()
        val (tin, tout) = await().getOrElse(fail("total-drop metrics never arrived"))
        assert(tin === 192L && tout === 0L, s"in=$tin out=$tout")
      } finally spark.conf.unset("spark.sql.adaptive.optimizer.excludedRules")
    } finally spark.listenerManager.unregister(listener)
  }

  test("oversizedBuckets diagnostic reports exactly the capped buckets") {
    val docs = ((0 until 12).map(i => (i.toLong, "identical flood text body")) ++
      (12 until 15).map(i => (i.toLong, s"unique doc $i ${"q" * i}")))
      .toDF("doc_id", "text")
    val dropped = Dedup.oversizedBuckets(docs, 16, 4, maxBucket = 4).collect()
    // the 12-doc flood shares one bucket per band; singletons never cap
    assert(dropped.length === 16, dropped.mkString(", "))
    assert(dropped.forall(_.getAs[Long]("bsize") === 12L), dropped.mkString(", "))
    assert(Dedup.oversizedBuckets(docs, 16, 4, maxBucket = 12).count() === 0L)
  }

  test("dup spans: planted shared 8-gram flagged positionally; within-doc repeats don't count") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // exactly 8 words
    val docs = Seq(
      // doc 0: shared span + 4 unique words -> 5 spans, 1 duplicated
      (0L, s"$shared uniqueword anotherone thirdword fourthword"),
      // doc 1: the shared span twice (plus a separator word):
      // spans containing the boundary are unique; BOTH full copies flag
      (1L, s"$shared stop $shared"),
      // doc 2: no overlap with anyone, 9 words -> 2 spans, 0 duplicated
      (2L, "one two three four five six seven eight nine"),
      // doc 3: repeats ITS OWN 8-gram twice but shares nothing cross-doc
      (3L, "solo dup solo dup solo dup solo dup solo dup solo dup solo dup solo dup"),
      // doc 4: 7 words -> no spans, excluded
      (4L, "too short to have any spans here")
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpanStats(docs, 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(0L) === ((5L, 1L)))
    // doc1: 10 tokens... shared(8) stop shared(8) = 17 tokens -> 10 spans;
    // flagged: the two exact copies of the shared gram
    assert(out(1L) === ((10L, 2L)))
    assert(out(2L) === ((2L, 0L)))
    // doc3: 16 tokens -> 9 spans; its 8-gram "solo dup ..." appears in no
    // OTHER doc -> 0 flagged (cross-document means >= 2 distinct docs)
    assert(out(3L) === ((9L, 0L)))
    assert(!out.contains(4L))
  }

  /** Naive exact all-pairs word-set Jaccard, same tokenization as the
    * operator — the differential reference for prefix filtering. */
  private def naiveJaccardPairs(docs: Seq[(Long, String)], t: Double) = {
    def toks(s: String): Set[String] =
      s.toLowerCase.replaceAll("(^[^a-z]+)|([^a-z]+$)", "")
        .split("[^a-z]+").filter(_.nonEmpty).toSet
    val sets = docs.map { case (id, s) => id -> toks(s) }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= t
    } yield (a, b, BigDecimal(j).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
  }

  /** Word-granularity item rows for exercising prefixJoinItems directly
    * (the q77 entry point uses trigram items via gramHashRows). */
  private def wordItems(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"),
        explode(Dedup.tokensCodegen(col("text"))).as("w"))
      .where(col("w") =!= "")
      .select(col("doc_id"), xxhash64(col("w")).as("gh")).distinct()

  test("prefix join: planted pairs found exactly, sub-threshold absent, no cartesian") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),       // jaccard 4/6 with doc 1
      (3L, "alpha beta nothing shared here at all really"),  // below 0.5
      (4L, "totally different words everywhere"),
      (5L, "totally different words everywhere"),  // exact copy -> 1.0
      (6L, "123 456")                              // letterless -> excluded
    ).toDF("doc_id", "text")
    val q = Dedup.prefixJoinItems(wordItems(docs), 0.5)
    val got = q.as[(Long, Long, Double)].collect().toSet
    assert(got === Set((1L, 2L, 0.666667), (4L, 5L, 1.0)))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pair generation must be an equi join:\n${plan.take(2000)}")
  }

  test("prefix join matches naive all-pairs on random corpora (exactness incl. recall)") {
    val rnd = new scala.util.Random(7)
    val vocab = ('a' to 't').map(c => s"$c$c$c")  // 20 words -> dense overlaps
    for (trial <- 1 to 3; t <- Seq(0.3, 0.6)) {
      val docs = (1L to 60L).map { id =>
        val n = 3 + rnd.nextInt(8)
        id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val got = Dedup.prefixJoinItems(wordItems(docs.toDF("doc_id", "text")), t)
        .as[(Long, Long, Double)].collect().toSet
      val want = naiveJaccardPairs(docs, t)
      assert(got === want,
        s"trial $trial t=$t: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("incremental dedup: batch-vs-corpus only, internal dups unpaired, exact") {
    val batch = Seq(
      (101L, "alpha beta gamma delta epsilon"),  // near-copy of corpus 1
      (102L, "unique batch content nothing shared"),
      (103L, "unique batch content nothing shared")  // batch-INTERNAL dup
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta zeta"),   // j=4/6 with batch 101
      (2L, "totally different words here"),
      (3L, "totally different words here")   // corpus-INTERNAL dup
    ).toDF("doc_id", "text")
    val got = Dedup.prefixJoinItemsTwo(wordItems(batch), wordItems(corpus), 0.5)
      .as[(Long, Long, Double)].collect().toSet
    // only the cross-table pair: internal duplicates are NOT the
    // incremental screen's job (self-join handles those)
    assert(got === Set((101L, 1L, 0.666667)))
  }

  test("prefix filter is skew-resistant: a universal stopword generates ~no candidates") {
    // 120 docs, each = the SAME stopword + 4 unique tokens. A shared-
    // token inverted index would emit all C(120,2) = 7140 pairs; the
    // prefix filter orders the stopword LAST (max df), so at t=0.6 the
    // 3-token prefixes hold only unique tokens -> zero candidates.
    val docs = (1L to 120L).map { i =>
      // letter-encoded ids: digits would split into shared fragments
      val u = "u" + i.toString.map(c => ('a' + (c - '0')).toChar)
      (i, s"zzz ${u}ww ${u}xx ${u}yy ${u}zz")
    }.toDF("doc_id", "text")
    val cand = Dedup.prefixCandidates(Dedup.rankedSetsOf(wordItems(docs)), 0.6)
    assert(cand.count() === 0)
    // sanity: the stopword IS shared — drop the filter idea entirely and
    // a token-level join explodes
    val tok = wordItems(docs)
    val allPairs = tok.select(col("gh"), col("doc_id").as("a"))
      .join(tok.select(col("gh"), col("doc_id").as("b")), Seq("gh"))
      .where(col("a") < col("b")).distinct().count()
    assert(allPairs === 120L * 119 / 2)
  }

  test("incremental dedup: empty batch and empty corpus both yield empty, no crash") {
    val docs = Seq((1L, "some corpus text here")).toDF("doc_id", "text")
    val empty = docs.limit(0)
    assert(Dedup.prefixJoinItemsTwo(wordItems(empty), wordItems(docs), 0.5)
      .count() === 0)
    assert(Dedup.prefixJoinItemsTwo(wordItems(docs), wordItems(empty), 0.5)
      .count() === 0)
  }

  test("incremental dedup matches naive cross-table all-pairs on random corpora") {
    val rnd = new scala.util.Random(21)
    val vocab = ('a' to 't').map(c => s"$c$c$c")
    for (t <- Seq(0.3, 0.6)) {
      def mk(ids: Range) = ids.map { id =>
        id.toLong -> Seq.fill(3 + rnd.nextInt(8))(
          vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val batch = mk(1 to 25); val corpus = mk(101 to 160)
      val got = Dedup.prefixJoinItemsTwo(
        wordItems(batch.toDF("doc_id", "text")),
        wordItems(corpus.toDF("doc_id", "text")), t)
        .as[(Long, Long, Double)].collect().toSet
      // cross-table subset of the naive all-pairs over the union
      val want = naiveJaccardPairs(batch ++ corpus, t)
        .filter { case (a, b, _) => a <= 25 && b >= 101 }
      assert(got === want,
        s"t=$t: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("q77 trigram prefix join: near-copy found with exact trigram jaccard") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base),
      (2L, base + " tail"),  // shares most trigrams with doc 1
      (3L, "completely unrelated text with no shingle overlap at all ok")
    ).toDF("doc_id", "text")
    // naive trigram sets (gramHashRows semantics: distinct trigrams,
    // short docs fall back to the whole-text token join)
    def grams(s: String): Set[String] = {
      val tk = s.toLowerCase.replaceAll("(^[^a-z]+)|([^a-z]+$)", "")
        .split("[^a-z]+").toSeq
      if (tk.size >= 3) tk.sliding(3).map(_.mkString(" ")).toSet
      else Set(tk.mkString(" "))
    }
    val g1 = grams(base); val g2 = grams(base + " tail")
    val inter = (g1 & g2).size
    val expectJ = BigDecimal(inter.toDouble / (g1.size + g2.size - inter))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Dedup.prefixSimilarityJoin(docs, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(got === Set((1L, 2L, expectJ)))
  }

  test("cluster keep: longest member wins, digits pad tokens not grams, ties to smallest id") {
    // 1 and 2 share every a-z trigram (digits aren't letter tokens), but
    // 2 carries two extra WHITESPACE tokens → 2 is kept though its id is
    // larger and the cluster label is min-id 1. 3 == 4 exactly → token
    // tie → smaller id 3 kept.
    val a = "the quick brown fox jumps over the lazy dog near the river bank"
    val b = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, a), (2L, a + " 123 456"),
      (3L, b), (4L, b),
      (5L, "unclustered text about cooking pasta with garlic and olive oil"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("keepspec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.q114ClusterKeep(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 2L, 15L, 2L),  // kept 2: 13 word tokens + "123" + "456"
      (3L, 3L, 10L, 2L)))
  }

  test("containment: embedded doc flagged one-way, mutual dups both ways, strangers absent") {
    import spark.implicits._
    val short = "alpha beta gamma delta epsilon zeta"     // 4 trigrams
    val long = short + " eta theta iota kappa lambda mu nu xi " +
      "omicron pi rho sigma tau upsilon phi chi psi omega"
    val docs = Seq(
      (1L, short),              // fully contained in 2 → (1,2) at 1.0
      (2L, long),               // containment(2 in 1) = 4/25 — absent
      (3L, "one two three four five six"),
      (4L, "one two three four five six"),  // exact dup of 3 → both ways
      (5L, "totally unrelated words here nothing shared"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, maxDf = 1000, threshold = 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.keySet === Set((1L, 2L), (3L, 4L), (4L, 3L)))
    assert(got((1L, 2L)) === 1.0)
    assert(got((3L, 4L)) === 1.0 && got((4L, 3L)) === 1.0)
    // the registered prefix-filtered form is EXACTLY the inverted-index
    // baseline on the same capped gram universe
    val prefix = Dedup.containmentPrefixJoin(
      Dedup.capGramDf(Dedup.gramHashRows(docs), 1000), 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(prefix === got)
  }

  test("containment prefix form == inverted baseline on real data and a hot-gram corpus") {
    import spark.implicits._
    // sf0.001 differential: full equality of directed pairs + scores
    val real = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)),
        r.getDouble(2))).toMap
    val inv = pairs(Dedup.containmentPairs(real, maxDf = 1000,
      threshold = 0.8))
    val pre = pairs(Dedup.containmentPrefixJoin(
      Dedup.capGramDf(Dedup.gramHashRows(real), 1000), 0.8))
    assert(pre === inv, s"${pre.size} vs ${inv.size} pairs")
    // hot-gram corpus: every doc shares one boilerplate sentence (its
    // grams are corpus-wide hot) plus a small unique tail, except two
    // real near-dups. The prefix form must still find exactly the
    // inverted baseline's pairs — rare-gram prefixes carry the signal
    val boiler = "this page is part of the example dot com crawl archive"
    val hot = (1L to 40L).map(i =>
      (i, s"$boiler unique$i filler$i content$i words$i here$i")) ++ Seq(
      (100L, s"$boiler identical tail of shared words in both docs"),
      (101L, s"$boiler identical tail of shared words in both docs"))
    val hotDf = hot.toDF("doc_id", "text")
    val invHot = pairs(Dedup.containmentPairs(hotDf, maxDf = 1000,
      threshold = 0.8))
    val preHot = pairs(Dedup.containmentPrefixJoin(
      Dedup.capGramDf(Dedup.gramHashRows(hotDf), 1000), 0.8))
    assert(preHot === invHot)
    assert(preHot.contains((100L, 101L)) && preHot.contains((101L, 100L)))
  }

  test("SNM: sort-adjacent near-dups verified; window bound excludes distant keys") {
    import spark.implicits._
    // docs 1,2 share a long prefix → adjacent in sort order, high Jaccard;
    // doc 9 is a COPY of 1 but prefixed with 'zzz …' → lands at the far
    // end of the sort, outside the w=1 window of doc 1: SNM's documented
    // miss. Padding docs separate the key ranges.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "mmm nnn ooo ppp qqq rrr sss ttt"),
      (4L, "uuu vvv www xxx yyy aab bbc ccd"),
      (9L, "zzz alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val got = Dedup.snmNeardup(docs, w = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // (1,2) adjacent and similar → present with high jaccard
    assert(got.contains((1L, 2L)), got)
    assert(got((1L, 2L)) > 0.5)
    // (1,9) near-identical but sort-distant → ABSENT at w=1
    assert(!got.contains((1L, 9L)) && !got.contains((9L, 1L)), got)
    // widening the window to cover the whole corpus recovers the pair
    val wide = Dedup.snmNeardup(docs, w = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(wide.contains((1L, 9L)) || wide.contains((9L, 1L)), wide)
  }

  test("exact-substring coverage: cross-doc spans merge to islands; within-doc repeats don't count") {
    import spark.implicits._
    // k=3 closed form. doc0 tokens a..h; doc1 shares the 5-token prefix
    // (dup shingle positions 0,1,2 → island [0,4], 5 tokens); doc3
    // contains doc0's "f g h" at its position 3 → doc0 also dups at
    // position 5 ([5,7], a SECOND island, whole doc covered); doc2 is
    // unique; doc4 repeats "m n o" three times WITHIN itself only —
    // within-doc repetition is not duplication (min(doc)==max(doc)).
    val docs = Seq(
      (0L, "a b c d e f g h"),
      (1L, "a b c d e x y z"),
      (2L, "p q r s t u v w"),
      (3L, "qq rr ss f g h tt uu"),
      (4L, "m n o m n o m n o"))
      .toDF("doc_id", "text")
    val got = Dedup.exactSubstr(docs, k = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(
      0L -> ((8L, 8L, 2L)),
      1L -> ((8L, 5L, 1L)),
      3L -> ((8L, 3L, 1L))), got)
    // partitioning-insensitive (the global shingle window, not data order)
    val reparted = Dedup.exactSubstr(docs.repartition(7), k = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(reparted === got)
    // one pipeline: no cartesian, no self-join of the corpus
    val plan = Dedup.exactSubstr(docs, k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("simhash join: pigeonhole bands find all radius-3 pairs (brute-force differential)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = (1 to 400).map(i => s"w$i")
    def doc(n: Int) = Seq.fill(60)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = doc(0)
    val docs = ((1 to 18).map(i => (i.toLong, doc(i))) ++ Seq(
      (100L, base), (101L, base + " extra"), // near-identical pair
      (102L, base)))                          // and an exact triple member
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("simjoinspec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.q158SimhashJoin(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    // brute force over the q31 signatures
    val sigs = Dedup.q31Simhash(spark, dir).as[(Long, Long)].collect()
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(got === brute)
    // the planted near-identicals are actually in there
    assert(brute.exists(p => p._1 == 100L && p._2 == 102L && p._3 == 0L))
    assert(brute.exists(p => Set(p._1, p._2).contains(101L)))
  }

  test("ngram decontam: quoted eval phrase flags the quoting doc; short and clean docs censused unflagged") {
    import org.apache.spark.sql.functions.{col, length, lit}
    val phrase = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val docs = Seq(
      // eval split (id % 7 == 0): the benchmark question
      (14L, phrase, "bench"),
      // train doc QUOTING the phrase: 11 tokens -> 4 grams, exactly 1 of
      // which is the planted 8-gram -> 25% >= 10% -> contaminated
      (8L, s"intro words then $phrase closing", "s1"),
      // clean train doc: 10 unique tokens -> 3 grams, 0 hits
      (9L, "one two three four five six seven eight nine ten", "s1"),
      // sub-8-token train doc: ZERO grams, censused but never flagged
      (10L, "tiny doc here", "s2"))
    val dir = java.nio.file.Files.createTempDirectory("ngdecon").toString
    docs.toDF("doc_id", "text", "source").withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.q210NgramDecontam(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // s1: 2 train docs, both have grams, doc 8 contaminated with 1 hit
    assert(got("s1") === ((2L, 2L, 1L, 1L)))
    // s2: the short doc is counted but has no grams and no flag
    assert(got("s2") === ((1L, 0L, 0L, 0L)))
    // the eval split itself never appears as a train source
    assert(!got.contains("bench"))
  }
}
