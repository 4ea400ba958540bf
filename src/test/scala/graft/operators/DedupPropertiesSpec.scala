package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based differentials for the set-similarity join family: the
  * prefix-filtered forms must equal their inverted-index baselines on
  * ARBITRARY corpora, not just the fixtures that happened to be tested.
  * Deterministic scalacheck sampling (the PropertiesSpec idiom — direct
  * `pureApply` with fixed seeds; the scalatest/scalacheck bridge isn't
  * in the offline cache). Corpora are built from a small vocabulary so
  * gram collisions, total containments, mutual dups, hot shared
  * boilerplate and sub-3-token degenerate docs all occur organically. */
class DedupPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(977L + i)))

  /** Random corpus: 4–24 docs over a 12-word vocabulary, 0–30 words
    * each; some docs duplicated verbatim to force mutual pairs. */
  private val corpusGen: Gen[Seq[(Long, String)]] = {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")
    for {
      nDocs <- Gen.choose(4, 24)
      texts <- Gen.listOfN(nDocs,
        Gen.choose(0, 30).flatMap(len =>
          Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
      dupFrom <- Gen.listOfN(nDocs, Gen.choose(0, nDocs * 3))
    } yield texts.zipWithIndex.map { case (t, i) =>
      // ~1/3 of docs become verbatim copies of an earlier doc
      val txt = if (dupFrom(i) < i) texts(dupFrom(i)) else t
      (i.toLong, txt)
    }
  }

  private def pairMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => ((r.getLong(0), r.getLong(1)),
      BigDecimal(r.getDouble(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
      .toMap

  test("containment: prefix-filtered == inverted baseline on random corpora, all (t, maxDf)") {
    val cases = samples(Gen.zip(corpusGen,
      Gen.oneOf(0.5, 0.8, 1.0), Gen.oneOf(3, 1000)), 12)
    cases.zipWithIndex.foreach { case ((docs, t, maxDf), k) =>
      val df = docs.toDF("doc_id", "text")
      val inv = pairMap(Dedup.containmentPairs(df, maxDf, t))
      val pre = pairMap(Dedup.containmentPrefixJoin(
        Dedup.cappedGramItems(df, maxDf), t))
      assert(pre === inv,
        s"case $k (t=$t maxDf=$maxDf, ${docs.size} docs): " +
          s"prefix ${pre.size} vs inverted ${inv.size} pairs")
    }
  }

  test("ngram decontam census == first-principles referee on random corpora") {
    import org.apache.spark.sql.functions.{col, length, lit}
    // longer docs than corpusGen's default so 8-grams exist; the small
    // vocabulary makes cross-split gram collisions common
    val gen = {
      val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
        "zeta", "eta", "theta")
      for {
        nDocs <- Gen.choose(6, 20)
        texts <- Gen.listOfN(nDocs,
          Gen.choose(0, 26).flatMap(len =>
            Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
        dupFrom <- Gen.listOfN(nDocs, Gen.choose(0, nDocs * 2))
      } yield texts.zipWithIndex.map { case (t, i) =>
        val txt = if (dupFrom(i) < i) texts(dupFrom(i)) else t
        (i.toLong, txt, s"src${i % 3}")
      }
    }
    samples(gen, 8).zipWithIndex.foreach { case (docs, k) =>
      val dir = java.nio.file.Files.createTempDirectory(s"ngprop$k").toString
      docs.toDF("doc_id", "text", "source").withColumn("lang", lit("en"))
        .withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = Dedup.q210NgramDecontam(spark, dir)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

      // referee straight from the definition (no hashing — gram strings)
      def grams(t: String): Set[Seq[String]] = {
        val ts = t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq
        if (ts.size < 8) Set.empty else ts.sliding(8).map(_.toSeq).toSet
      }
      val evalSet = docs.filter(_._1 % 7 == 0).flatMap(d => grams(d._2)).toSet
      val train = docs.filter(_._1 % 7 != 0)
      val want = train.groupBy(_._3).map { case (src, ds) =>
        val per = ds.map { d =>
          val g = grams(d._2); val hit = g.count(evalSet.contains).toLong
          (g.size.toLong, hit)
        }
        src -> ((ds.size.toLong,
          per.count(_._1 > 0).toLong,
          per.count(p => p._1 > 0 && p._2 * 10 >= p._1).toLong,
          per.map(_._2).sum))
      }
      assert(got === want, s"case $k")
    }
  }

  test("jaccard: prefix-filtered == inverted baseline on random corpora, all (t, maxDf)") {
    val cases = samples(Gen.zip(corpusGen,
      Gen.oneOf(0.2, 0.5, 0.9), Gen.oneOf(3, 1000)), 12)
    cases.zipWithIndex.foreach { case ((docs, t, maxDf), k) =>
      val df = docs.toDF("doc_id", "text")
      val inv = pairMap(Dedup.q22Shape(df, maxDf, t))
      val pre = pairMap(Dedup.prefixJoinItems(
        Dedup.cappedGramItems(df, maxDf), t))
      assert(pre === inv,
        s"case $k (t=$t maxDf=$maxDf, ${docs.size} docs): " +
          s"prefix ${pre.size} vs inverted ${inv.size} pairs")
    }
  }

  test("sessionize: session_window == gaps-and-islands fold on random event sets") {
    val evGen = for {
      n <- Gen.choose(1, 40)
      evs <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 5L),
        Gen.choose(0, 600), Gen.choose(0, 500)))
    } yield evs.map { case (u, min, cents) =>
      (u, new java.sql.Timestamp(min * 60000L), cents / 100.0)
    }
    val gapMs = 30 * 60000L
    samples(evGen, 12).zipWithIndex.foreach { case (evs, k) =>
      val df = evs.toDF("user_id", "ts", "value")
      val got = graft.streaming.SessionStream.sessions(df, "30 minutes")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Long)]
        .collect().toSet
      // reference fold: per user, sort, break when diff > gap (the
      // engine merges AT the boundary), end = last + gap
      val want = evs.groupBy(_._1).flatMap { case (u, es) =>
        val sorted = es.map(e => (e._2.getTime,
          math.round(e._3 * 1000))).sortBy(_._1)
        val sessions = sorted.tail.foldLeft(
          List(List(sorted.head))) { (acc, e) =>
          if (e._1 - acc.head.head._1 > gapMs) List(e) :: acc
          else (e :: acc.head) :: acc.tail
        }
        sessions.map { s =>
          val ts = s.map(_._1)
          (u, new java.sql.Timestamp(ts.min),
            new java.sql.Timestamp(ts.max + gapMs),
            s.size.toLong, s.map(_._2).sum)
        }
      }.toSet
      assert(got === want, s"case $k: ${evs.size} events")
    }
  }

  test("dynamic-gap sessionize: session_window(gap col) == running-max-end interval union on random events") {
    // the q221 semantic on arbitrary inputs: each event holds the
    // session open for ITS OWN gap; sessions are the connected
    // components of [ts, ts+gap] interval overlap, i.e. (sorted by ts)
    // an event merges while ts <= the running max end — inclusive at
    // the boundary, like the static pin — and the session end is that
    // running max, NOT last-event + anything
    val evGen = for {
      n <- Gen.choose(1, 40)
      evs <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 4L),
        Gen.choose(0, 600), Gen.oneOf(5L, 20L, 60L)))
    } yield evs
    samples(evGen, 12).zipWithIndex.foreach { case (evs, k) =>
      val df = evs.map { case (u, m, g) =>
        (u, new java.sql.Timestamp(m * 60000L), g) }
        .toDF("user_id", "ts", "gap_min")
      val got = df.groupBy(col("user_id"),
          session_window(col("ts"),
            expr("concat(gap_min, ' minutes')")).as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("w.start"), col("w.end"), col("n"))
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
        .collect().toSet
      val want = evs.groupBy(_._1).flatMap { case (u, es) =>
        val iv = es.map(e => (e._2 * 60000L, e._2 * 60000L + e._3 * 60000L))
          .sortBy(identity)
        // fold into (start, maxEnd, count) sessions
        val sessions = iv.tail.foldLeft(
          List((iv.head._1, iv.head._2, 1L))) { case (acc, (ts, end)) =>
          val (s0, e0, n0) = acc.head
          if (ts <= e0) (s0, math.max(e0, end), n0 + 1) :: acc.tail
          else (ts, end, 1L) :: acc
        }
        sessions.map { case (s0, e0, n0) =>
          (u, new java.sql.Timestamp(s0), new java.sql.Timestamp(e0), n0) }
      }.toSet
      assert(got === want, s"case $k: ${evs.size} events")
    }
  }
}
