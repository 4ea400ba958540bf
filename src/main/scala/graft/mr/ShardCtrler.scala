package graft.mr

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's shard-controller surface (declared but UNIMPLEMENTED
  * there — shardctrler/common.go:6-29 specifies the RPC API and Config
  * shape; server.go bodies are empty), realized as a pure configuration
  * state machine plus the Spark-side routing it exists to drive.
  *
  * Semantics from the spec comments (shardctrler/common.go:6-16):
  *   - Join(gid -> servers): add replica groups, rebalance shards as
  *     evenly as possible moving as few shards as possible.
  *   - Leave(gids): remove groups, redistribute their shards likewise.
  *   - Move(shard, gid): pin one shard to a group.
  *   - Query(num): config #num, or the latest for num == -1 / too big.
  *   - Config #0 is all-shards-on-invalid-group-0 with no groups.
  *
  * Design stance (COVERAGE.md §2.3): in Spark, shard PLACEMENT is the
  * scheduler/state-store's job — what survives of this API is the
  * CONFIG: a versioned, deterministic shard→group map. The state
  * machine is pure metadata (driver-side, like a Partitioner spec);
  * [[routeByConfig]] shows a Config driving an actual DataFrame
  * repartition, and rebalance minimality means a config change moves
  * only the delta shards' rows.
  */
object ShardCtrler {

  /** shardctrler/common.go:21 */
  val NShards = 10

  /** shard -> gid assignment + gid -> servers map (common.go:25-29). */
  case class Config(num: Int, shards: Vector[Int], groups: Map[Int, Seq[String]])

  /** Config #0: no groups, every shard on the invalid group 0. */
  val initial: Config = Config(0, Vector.fill(NShards)(0), Map.empty)

  /** The reference's static key→shard hash: first UTF-8 BYTE mod NShards
    * (shardkv/client.go:22-28 — Go's key[0] is a byte, not a code point;
    * charAt(0) would diverge on any non-ASCII key). */
  def key2shard(key: String): Int =
    (if (key.isEmpty) 0
     else key.getBytes(java.nio.charset.StandardCharsets.UTF_8)(0) & 0xff) % NShards

  /** Rebalance with minimal movement: keep every shard where it is
    * unless its group is gone or over target; targets differ by ≤1
    * (floor/ceil of NShards/ngroups). Deterministic: gids processed in
    * sorted order, spare shards reassigned in index order. */
  private def rebalance(shards: Vector[Int], gids: Seq[Int]): Vector[Int] = {
    if (gids.isEmpty) return Vector.fill(NShards)(0)
    val sorted = gids.sorted
    val base = NShards / sorted.size
    val extra = NShards % sorted.size
    // first `extra` gids (sorted) get base+1 shards, rest get base
    val target = sorted.zipWithIndex
      .map { case (g, i) => g -> (base + (if (i < extra) 1 else 0)) }.toMap
    val kept = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
    val out = shards.toArray
    // pass 1: keep in-place assignments up to each group's target
    for (i <- 0 until NShards) {
      val g = out(i)
      if (target.contains(g) && kept(g) < target(g)) kept(g) += 1
      else out(i) = -1 // needs a new home
    }
    // pass 2: hand spare shards to groups below target, in sorted order
    var pool = sorted.filter(g => kept(g) < target(g)).iterator
    var cur = if (pool.hasNext) pool.next() else -1
    for (i <- 0 until NShards if out(i) == -1) {
      while (kept(cur) >= target(cur) && pool.hasNext) cur = pool.next()
      out(i) = cur
      kept(cur) += 1
    }
    out.toVector
  }

  /** Join: add gid→servers groups, rebalance (common.go:7,37-38). */
  def join(cfg: Config, servers: Map[Int, Seq[String]]): Config = {
    val groups = cfg.groups ++ servers
    Config(cfg.num + 1, rebalance(cfg.shards, groups.keys.toSeq), groups)
  }

  /** Leave: drop groups, redistribute their shards (common.go:8,46). */
  def leave(cfg: Config, gids: Seq[Int]): Config = {
    val groups = cfg.groups -- gids
    Config(cfg.num + 1, rebalance(cfg.shards.map(g => if (gids.contains(g)) -1 else g),
      groups.keys.toSeq), groups)
  }

  /** Move: pin one shard to a group; later rebalances may undo it, as
    * the reference spec allows (common.go:9,55-57). */
  def move(cfg: Config, shard: Int, gid: Int): Config = {
    require(shard >= 0 && shard < NShards, s"shard $shard out of range")
    Config(cfg.num + 1, cfg.shards.updated(shard, gid), cfg.groups)
  }

  /** Query: config #num from the history, or the latest for num == -1
    * or past-the-end (common.go:10,64-65). History index = config num. */
  def query(history: IndexedSeq[Config], num: Int): Config =
    if (num < 0 || num >= history.size) history.last else history(num)

  /** key→gid routing column for a Config (key2shard then shard→gid).
    * First UTF-8 byte via encode+hex — `ascii()` returns the first CODE
    * POINT (Spark's Ascii uses codePointAt), which disagrees with both
    * the Go reference's key[0] byte and [[key2shard]] on non-ASCII keys.
    * NULL keys route like the empty string (shard 0): without the
    * coalesce, length(NULL) skips the empty branch and the whole
    * expression goes NULL — silently routing null-key rows by a null
    * partition key while the Scala [[key2shard]] would NPE. */
  def gidFor(keyCol: Column, cfg: Config): Column = {
    val key = coalesce(keyCol, lit(""))
    val firstByte =
      conv(substring(hex(encode(key, "UTF-8")), 1, 2), 16, 10).cast("int")
    val shard = when(length(key) === 0, lit(0))
      .otherwise(pmod(firstByte, lit(NShards)))
    // shard → gid via a literal lookup array (configs are tiny metadata)
    element_at(array(cfg.shards.map(lit): _*), shard + 1)
  }

  /** The Spark demo the config exists for: route rows to their owning
    * group's partition — one partition per gid, exactly the reference's
    * data placement contract, expressed as a repartition. */
  def routeByConfig(df: DataFrame, keyCol: String, cfg: Config): DataFrame = {
    val ngroups = math.max(cfg.groups.size, 1)
    df.withColumn("__gid", gidFor(col(keyCol), cfg))
      .repartition(ngroups, col("__gid"))
  }
}
