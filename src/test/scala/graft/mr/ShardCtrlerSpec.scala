package graft.mr

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Spec for the shard-controller config state machine — semantics from
  * the reference's API comments (shardctrler/common.go:6-16), which are
  * the only semantics it declares (its server bodies are empty). */
class ShardCtrlerSpec extends SparkSpec {
  import ShardCtrler._

  private def counts(c: Config): Map[Int, Int] =
    c.shards.groupBy(identity).map { case (g, v) => g -> v.size }

  test("config 0 + join/leave keep shards balanced within 1 and complete") {
    var cfg = initial
    assert(cfg.shards === Vector.fill(NShards)(0))
    cfg = join(cfg, Map(1 -> Seq("s1a", "s1b")))
    assert(cfg.shards.forall(_ == 1)) // one group owns everything
    cfg = join(cfg, Map(2 -> Seq("s2a"), 3 -> Seq("s3a")))
    val byG = counts(cfg)
    assert(byG.keySet === Set(1, 2, 3))
    assert(byG.values.max - byG.values.min <= 1)
    assert(byG.values.sum === NShards)
    cfg = leave(cfg, Seq(1))
    val afterLeave = counts(cfg)
    assert(afterLeave.keySet === Set(2, 3))
    assert(afterLeave.values.max - afterLeave.values.min <= 1)
    assert(cfg.num === 3) // three transitions from config #0
  }

  test("rebalance moves as few shards as possible") {
    var cfg = join(initial, Map(1 -> Seq("s1")))
    cfg = join(cfg, Map(2 -> Seq("s2")))
    val before = cfg.shards
    val after = join(cfg, Map(3 -> Seq("s3")))
    // 10 shards over 3 groups → targets 4/3/3: exactly the shards handed
    // to group 3 change owner, nothing else shuffles around
    val moved = before.zip(after.shards).count { case (a, b) => a != b }
    assert(after.shards.count(_ == 3) === 3)
    assert(moved === 3, s"moved $moved shards, expected exactly the new group's 3")
    // and a leave moves only the leaver's shards
    val afterLeave = leave(after, Seq(3))
    val movedBack = after.shards.zip(afterLeave.shards).count { case (a, b) => a != b }
    assert(movedBack === 3)
  }

  test("move pins a shard; query returns numbered and latest configs") {
    val c1 = join(initial, Map(1 -> Seq("s1"), 2 -> Seq("s2")))
    val c2 = move(c1, shard = 4, gid = 2)
    assert(c2.shards(4) === 2)
    assert(c2.num === c1.num + 1)
    val history = IndexedSeq(initial, c1, c2)
    assert(query(history, -1) === c2)
    assert(query(history, 99) === c2)
    assert(query(history, 1) === c1)
    assert(query(history, 0) === initial)
  }

  test("key2shard matches the reference's first-byte-mod-10 hash") {
    // shardkv/client.go:22-28: shard = int(key[0]) % 10, 0 for "" —
    // key[0] in Go is the first UTF-8 BYTE, not a code point
    assert(key2shard("") === 0)
    assert(key2shard("a") === 'a'.toInt % 10)
    assert(key2shard("xyzzy") === 'x'.toInt % 10)
    assert(key2shard("0weird") === '0'.toInt % 10)
    assert(key2shard("étoile") === 195 % 10) // é = 0xC3 0xA9 in UTF-8
    assert(key2shard("日本語") === 230 % 10)  // 日 = 0xE6 0x97 0xA5
  }

  test("Spark-side routing agrees with key2shard on non-ASCII keys") {
    import spark.implicits._
    val cfg = join(initial, Map(1 -> Seq("s1"), 2 -> Seq("s2"), 3 -> Seq("s3")))
    val keys = Seq("plain", "étoile", "日本語", "ü", "😀x", "")
    val got = keys.toDF("k")
      .select(col("k"), ShardCtrler.gidFor(col("k"), cfg).as("gid"))
      .as[(String, Int)].collect().toMap
    keys.foreach { k =>
      assert(got(k) === cfg.shards(key2shard(k)), s"key=$k")
    }
  }

  test("routeByConfig co-locates each group's rows in one partition") {
    import spark.implicits._
    val cfg = join(join(initial, Map(1 -> Seq("s1"))), Map(2 -> Seq("s2"), 3 -> Seq("s3")))
    val df = (0 until 500).map(i => (s"key$i", i)).toDF("k", "v")
    val routed = ShardCtrler.routeByConfig(df, "k", cfg)
      .withColumn("pid", spark_partition_id())
    // every gid lives in exactly one partition, and the Spark-side gid
    // column agrees with the Scala-side key2shard → shards lookup
    val gidParts = routed.groupBy("__gid").agg(countDistinct("pid").as("nparts"))
      .as[(Int, Long)].collect()
    assert(gidParts.nonEmpty)
    assert(gidParts.forall(_._2 === 1L), gidParts.mkString(", "))
    val mismatch = routed.as[(String, Int, Int, Int)].collect().count {
      case (k, _, gid, _) => cfg.shards(key2shard(k)) != gid
    }
    assert(mismatch === 0)
  }
}
