package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.plans.{BloomBitPositions, BloomMightContain}

/** Bloom-pruned joins: when the probe side is huge and the build side
  * is too big to broadcast-hash-join but small enough to summarize, a
  * bloom filter of the build keys prunes the probe BEFORE its shuffle
  * — the rows that would never match (the overwhelming majority in a
  * selective semi join at 100 TB) are dropped at the scan, inside
  * whole-stage codegen, and only survivors pay shuffle + exact join.
  *
  * Results are EXACT: false positives are re-checked by the exact
  * join; false negatives cannot exist. The bitset is built by a
  * distributed explode → bit_or aggregation (per-word longs — the
  * driver collects at most numBits/64 metadata rows, never keys).
  *
  * Sizing: false-positive rate ≈ (1 − e^(−k·n/m))^k; the default
  * m = 2^23 bits (1 MiB) with k = 5 holds ~1% FP to n ≈ 900 k build
  * keys. The bitset rides the serialized plan like a broadcast build
  * side — size m accordingly.
  */
object BloomJoin {

  /** Distributed bitset build over `keyCol` (bigint). */
  def buildBits(keys: DataFrame, keyCol: String,
                numBits: Int, k: Int): Array[Long] = {
    require(numBits > 0 && numBits % 64 == 0, s"numBits $numBits not a multiple of 64")
    require(k >= 1, s"k must be >= 1, got $k")
    val pos = ColumnBridge.column(BloomBitPositions(
      ColumnBridge.expression(col(keyCol).cast("long")), k, numBits))
    val words = keys
      .filter(col(keyCol).isNotNull)
      .select(explode(pos).as("pos"))
      .select(shiftrightunsigned(col("pos"), 6).cast("int").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("mask"))
      .groupBy("word").agg(expr("bit_or(mask)").as("bits"))
      .collect()
    val out = new Array[Long](numBits / 64)
    words.foreach(r => out(r.getInt(0)) = r.getLong(1))
    out
  }

  /** The probe predicate for an already-built bitset. */
  def mightContain(key: Column, bits: Array[Long],
                   numBits: Int, k: Int): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(key.cast("long")), bits, k, numBits))

  /** Exact left-semi join of `big` against `small`'s keys, with the
    * bloom pre-filter ahead of the shuffle. */
  def semiJoin(big: DataFrame, small: DataFrame,
               bigKey: String, smallKey: String,
               numBits: Int = 1 << 23, k: Int = 5): DataFrame = {
    val bits = buildBits(small.select(col(smallKey)), smallKey, numBits, k)
    // alias the build side: bigKey == smallKey must not be ambiguous
    val keys = small.select(col(smallKey).as("__graft_bk")).distinct()
    big.filter(mightContain(col(bigKey), bits, numBits, k))
      .join(keys, col(bigKey) === col("__graft_bk"), "left_semi")
  }

  /** Exact left-anti join with the stronger bloom win: a bloom MISS
    * proves absence, so miss rows skip the join entirely — only the
    * (few) bloom hits pay the exact anti check. Null probe keys never
    * match anything and are kept, matching SQL anti-join semantics. */
  def antiJoin(big: DataFrame, small: DataFrame,
               bigKey: String, smallKey: String,
               numBits: Int = 1 << 23, k: Int = 5): DataFrame = {
    val bits = buildBits(small.select(col(smallKey)), smallKey, numBits, k)
    val mc = mightContain(col(bigKey), bits, numBits, k)
    val keys = small.select(col(smallKey).as("__graft_bk")).distinct()
    val sureAbsent = big.filter(!coalesce(mc, lit(false)))
    val needCheck = big.filter(coalesce(mc, lit(false)))
      .join(keys, col(bigKey) === col("__graft_bk"), "left_anti")
    sureAbsent.unionByName(needCheck)
  }
}
