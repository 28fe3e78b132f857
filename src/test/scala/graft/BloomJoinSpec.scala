package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomJoin
import graft.plans.BloomKernels

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val big = (1L to 5000L).toDF("bk")
  private lazy val small = (1L to 5000L).filter(_ % 17 == 0).toDF("sk")

  test("kernel: no false negatives, ever") {
    val bits = BloomJoin.buildBits(small, "sk", numBits = 1 << 12, k = 5)
    (1L to 5000L).filter(_ % 17 == 0).foreach { key =>
      assert(BloomKernels.mightContain(key, bits, 5, 1 << 12),
        s"inserted key $key reported absent")
    }
  }

  test("semiJoin == plain left_semi, even with a tiny (FP-heavy) filter") {
    val got = BloomJoin.semiJoin(big, small, "bk", "sk",
      numBits = 64, k = 2) // 64 bits for ~300 keys: FP rate ~1
      .select("bk").as[Long].collect().toSet
    val expected = big.join(small, col("bk") === col("sk"), "left_semi")
      .as[Long].collect().toSet
    assert(got == expected)
  }

  test("antiJoin == plain left_anti, null probe keys kept") {
    val bigN = big.union(Seq.empty[Long].toDF("bk"))
      .union(spark.sql("SELECT CAST(NULL AS BIGINT) AS bk"))
    val got = BloomJoin.antiJoin(bigN, small, "bk", "sk",
      numBits = 1 << 12, k = 5)
      .select("bk").collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSet
    val expected = bigN.join(small, col("bk") === col("sk"), "left_anti")
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSet
    assert(got == expected)
    assert(got.contains(-1L)) // the null row survived
  }

  test("same-named join keys resolve (build side aliased)") {
    val small2 = (1L to 5000L).filter(_ % 17 == 0).toDF("bk")
    val semi = BloomJoin.semiJoin(big, small2, "bk", "bk",
      numBits = 1 << 12, k = 5).count()
    val anti = BloomJoin.antiJoin(big, small2, "bk", "bk",
      numBits = 1 << 12, k = 5).count()
    assert(semi == small2.count() && semi + anti == 5000L)
  }

  test("bloom prune actually reduces the joined row count") {
    val bits = BloomJoin.buildBits(small, "sk", numBits = 1 << 16, k = 5)
    val pruned = big.filter(
      BloomJoin.mightContain(col("bk"), bits, 1 << 16, 5)).count()
    assert(pruned < 5000 / 2, s"prune kept $pruned of 5000")
    assert(pruned >= small.count())
  }
}
