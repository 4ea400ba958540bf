package graft.mr

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based invariants of the MR core (FIXTURES.md §3 plan):
  * partition totality, group completeness, repartition insensitivity.
  * ScalaCheck generators driven with deterministic seeds (the
  * scalatest/scalacheck bridge artifact isn't in the offline cache).
  */
class PropertiesSpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(42L + i)))

  test("partition totality: every key lands in [0, n) for any n > 0") {
    val cases = samples(Gen.zip(Gen.asciiPrintableStr, Gen.choose(1, 64)), 200)
    cases.foreach { case (key, n) =>
      val b = new FnvPartitioner(n).getPartition(key)
      assert(b >= 0 && b < n, s"key=$key n=$n")
    }
  }

  test("partitioning is deterministic and unicode-safe") {
    val keys = samples(Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString), 200)
    keys.foreach { key =>
      assert(MRJob.ihash(key) === MRJob.ihash(new String(key.toCharArray)))
      assert(MRJob.ihash(key) >= 0)
    }
  }

  test("group completeness: sum of per-key counts equals total record count") {
    // wc over generated records: no record may be lost or duplicated by
    // the shuffle + sorted group-scan.
    val gen = Gen.listOfN(500,
      Gen.zip(Gen.oneOf("a", "b", "c", "dd", "ee", "", "☃"), Gen.alphaNumStr))
    samples(gen, 3).foreach { records =>
      val rdd = spark.sparkContext.parallelize(records, 6)
      val counts = MRJob.onPairs(rdd, (_, vs) => vs.size.toString, nReduce = 4)
        .collect().toMap
      assert(counts.values.map(_.toLong).sum === records.size.toLong)
      assert(counts.keySet === records.map(_._1).toSet)
    }
  }

  test("repartition insensitivity: output is identical for any nReduce and input split") {
    val records = (0 until 1000).map(i => (s"k${i % 37}", s"v$i"))
    def run(nIn: Int, nReduce: Int): Seq[(String, String)] =
      MRJob.onPairs(spark.sparkContext.parallelize(records, nIn),
        Workloads.sortJoinReduce, nReduce).collect().sorted.toSeq
    val base = run(4, 10)
    assert(run(1, 1) === base)
    assert(run(13, 3) === base)
    assert(run(7, 32) === base)
  }

  test("reduce sees each key exactly once per job") {
    val records = (0 until 300).map(i => (s"key${i % 11}", i.toString))
    val rdd = spark.sparkContext.parallelize(records, 5)
    val out = MRJob.onPairs(rdd, (_, vs) => vs.size.toString, nReduce = 7).collect()
    assert(out.map(_._1).toSeq.sorted === out.map(_._1).distinct.toSeq.sorted)
    assert(out.length === 11)
  }
}
