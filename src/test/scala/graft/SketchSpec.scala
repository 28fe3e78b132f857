package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketch

class SketchSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish key stream: key k appears ~200/k times
  private lazy val stream = (1L to 20L)
    .flatMap(k => Seq.fill((200 / k).toInt)(k))
    .toDF("k")

  private lazy val truth = stream.groupBy("k")
    .agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap

  test("estimate never undercounts (one-sided error)") {
    val sk = Sketch.countMin(stream, "k", depth = 4, width = 16) // collides
    val est = Sketch.estimate(sk, stream.distinct(), "k",
      depth = 4, width = 16).as[(Long, Long)].collect().toMap
    truth.foreach { case (k, n) => assert(est(k) >= n, s"key $k") }
  }

  test("wide sketch is exact; unseen keys estimate 0") {
    val sk = Sketch.countMin(stream, "k", depth = 4, width = 4096)
    val queries = (1L to 30L).toDF("k") // 21-30 never appeared
    val est = Sketch.estimate(sk, queries, "k", depth = 4, width = 4096)
      .as[(Long, Long)].collect().toMap
    truth.foreach { case (k, n) => assert(est(k) == n) }
    (21L to 30L).foreach(k => assert(est(k) == 0L))
  }

  test("merge of shard sketches == sketch of the union") {
    val a = stream.filter(col("k") % 2 === 0)
    val b = stream.filter(col("k") % 2 =!= 0)
    val merged = Sketch.merge(
      Sketch.countMin(a, "k", 4, 64), Sketch.countMin(b, "k", 4, 64))
      .as[(Int, Long, Long)].collect().toSet
    val whole = Sketch.countMin(stream, "k", 4, 64)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("sketch size is bounded by depth x width regardless of stream size") {
    val sk = Sketch.countMin(stream, "k", depth = 3, width = 8)
    assert(sk.count() <= 3L * 8L)
    // and total mass per row equals the stream length
    val mass = sk.groupBy("j").agg(sum("c").as("m"))
      .select("m").as[Long].collect()
    assert(mass.forall(_ == stream.count()))
  }
}
