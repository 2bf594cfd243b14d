package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key guards for cross-frame equi-joins — the ONE-SIDED sibling of
  * the ordered shard-pair covers (`Dedup.guardedBlockPairs`,
  * `Similarity.guardedCellPairs`) that retire the remaining per-key
  * quadratic class: `left.join(right, key)` puts
  * |left_k| × |right_k| rows on join key k, so one hub key (a bot user
  * with 10⁶ items, an anchor-dense IVF cell) concentrates the whole
  * product in ONE task. The cover shards BOTH sides independently:
  * a left row sits at (key, x = hash(leftId) mod ka, every y), a right
  * row at (key, every x, y = hash(rightId) mod kb), so each (left,
  * right) row pair meets at join key (key, x_left, y_right) EXACTLY
  * once — the output multiset is identical to the naive join (property-
  * tested in DedupGuardSpec) while no join key carries more than
  * ~(|left_k|/ka)·(|right_k|/kb) ≤ maxSide² rows. Cold keys get
  * ka = kb = 1 and degenerate to the plain join (no row replication).
  *
  * Cost model: the left frame replicates kb× and the right ka× — which
  * is why callers pass IDS-ONLY frames and re-attach payloads (vectors,
  * text) by id AFTERWARDS, the guardedCellPairs discipline. Shard
  * counts cap at [[MaxShards]]: beyond that the residual per-key work
  * is maxSide·|other|/64 per task, and unbounded k would make the
  * replication factor itself the new hazard.
  */
object Skew {

  val MaxShards = 64

  /** Exact sharded INNER equi-join of `left` and `right` on `key`:
    * returns the same multiset of combined rows as
    * `left.join(right, Seq(key))`, with per-join-key work bounded by
    * ~maxSide². `leftId`/`rightId` are per-side columns whose hash
    * spreads that side's rows inside a hot key (any column works —
    * determinism of the shard assignment is irrelevant to the output
    * set). Payload column names must be disjoint across sides apart
    * from `key`. */
  def guardedKeyJoin(left: DataFrame, right: DataFrame, key: String,
                     leftId: String, rightId: String,
                     maxSide: Int = 4096): DataFrame = {
    def shards(n: org.apache.spark.sql.Column) =
      least(ceil(n / maxSide), lit(MaxShards)).cast("int")
    // per-key side sizes → shard counts; an inner join on the sizes
    // frame drops keys absent from either side, which the inner join
    // semantics drop anyway. NOT broadcast-forced: the key domain is
    // unbounded (user ids, cells), so sizes shuffle-join by key and AQE
    // may still broadcast small ones.
    val sizes = left.groupBy(col(key)).agg(count(lit(1)).as("__ln"))
      .join(right.groupBy(col(key)).agg(count(lit(1)).as("__rn")), Seq(key))
      .select(col(key), shards(col("__ln")).as("__ka"),
        shards(col("__rn")).as("__kb"))
    val a = left.join(sizes, Seq(key))
      .withColumn("__x", pmod(hash(col(leftId)), col("__ka")))
      .withColumn("__y", explode(sequence(lit(0), col("__kb") - 1)))
      .drop("__ka", "__kb")
    val b = right.join(sizes, Seq(key))
      .withColumn("__x", explode(sequence(lit(0), col("__ka") - 1)))
      .withColumn("__y", pmod(hash(col(rightId)), col("__kb")))
      .drop("__ka", "__kb")
    a.join(b, Seq(key, "__x", "__y")).drop("__x", "__y")
  }
}
