package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator: writes `<dst>` = `<copies>`
  * stride-remapped copies of the tables under `<src>` (sf0.1 × 10 =
  * sf1). Exists to measure the one decade the driver's testdata does
  * not cover — the BASELINE.md scaling curve's sf1 point.
  *
  * Design rules (what "honest 10×" means here):
  *  - every foreign-key relation is preserved per copy (copy k of
  *    lineitem references copy k of orders/part/supplier), so join
  *    selectivities and group cardinalities scale linearly;
  *  - `region`/`nation` stay fixed (dimension tables, as in TPC-H);
  *  - document TEXT is made distinct per copy (every word suffixed
  *    `_k` for k>0) so the corpus duplicate RATE stays constant —
  *    10 verbatim copies of every doc would turn the pair-emitting
  *    dedup queries quadratic in a way no real corpus scales;
  *  - embeddings are circularly rotated per copy (norm-preserving,
  *    cross-copy cosine decorrelated) for the same reason on the
  *    ANN side;
  *  - event timestamps are left alone: scaling users 10× inside the
  *    same wall-clock window is the realistic densification.
  *
  * All map-only (one explode per table, no shuffle); key strides are
  * one metadata-sized max() per table.
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/root/repo/testdata_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val files = args.lift(3).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, dst, copies, files)
    spark.stop()
  }

  def run(spark: SparkSession, src: String, dst: String,
          copies: Int, files: Int = 32): Unit = {
    def rd(t: String): DataFrame =
      spark.read.parquet(s"$src/$t.parquet")
    // Fanned tables are written as `files` part files: the sf0.1
    // sources are single-file single-row-group parquet, and a map-only
    // copy inherits that layout — every sf1 scan then runs as ONE task
    // (a 78 MB lineitem = 1 row group = 1 split) and the whole suite
    // measures a single thread, not the engine. Real 100 TB layouts
    // are thousands of files; the repartition here is the honest
    // equivalent, and the only shuffle in the generator.
    def wr(df: DataFrame, t: String): Unit = {
      df.repartition(files).write.mode("overwrite")
        .parquet(s"$dst/$t.parquet")
      System.err.println(s"[scaleup] wrote $t")
    }
    /** max(key)+1 — the per-copy id stride. */
    def stride(df: DataFrame, c: String): Long =
      df.agg(max(col(c)).cast("long")).collect()(0).getLong(0) + 1L
    /** cross with k=0..copies-1 (map-only fan-out). */
    def fan(df: DataFrame): DataFrame =
      df.withColumn("__k",
        explode(lit((0L until copies.toLong).toArray)))
    def shifted(c: String, s: Long) = (col(c) + col("__k") * s).as(c)

    // fixed dims verbatim
    wr(rd("region"), "region")
    wr(rd("nation"), "nation")

    // c_name is REBUILT from the shifted key ("Customer#%09d"), not
    // cloned: the linkage queries derive agreement fields from name
    // substrings (digits of the key), so 10 verbatim clones of every
    // name would read as 10 copies of every entity — cross-copy
    // agreement, and q_r_erclust's positive-evidence edge set, would
    // be a clone artifact rather than the blocked-pair growth the
    // fixed blocking keys already imply. A tag at either end is no
    // better: a suffix sits exactly where substr(c_name,-4) reads.
    val cust = rd("customer"); val cs = stride(cust, "c_custkey")
    val shiftedCK = col("c_custkey") + col("__k") * cs
    // format_string, not lpad: lpad TRUNCATES strings longer than its
    // len, so once shifted keys exceed 9 digits names would silently
    // collide and corrupt the name-substring-derived linkage fields.
    // %09d pads short keys and passes long ones through intact.
    wr(fan(cust).select(shiftedCK.as("c_custkey"),
      format_string("Customer#%09d", shiftedCK).as("c_name"),
      col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")),
      "customer")

    val supp = rd("supplier"); val ss = stride(supp, "s_suppkey")
    wr(fan(supp).select(shifted("s_suppkey", ss), col("s_name"),
      col("s_nationkey"), col("s_acctbal")), "supplier")

    val part = rd("part"); val ps = stride(part, "p_partkey")
    wr(fan(part).select(shifted("p_partkey", ps), col("p_name"),
      col("p_brand"), col("p_type"), col("p_size"),
      col("p_retailprice")), "part")

    val ord = rd("orders"); val os = stride(ord, "o_orderkey")
    wr(fan(ord).select(shifted("o_orderkey", os),
      shifted("o_custkey", cs), col("o_orderstatus"),
      col("o_totalprice"), col("o_orderdate"), col("o_orderpriority")),
      "orders")

    val li = rd("lineitem")
    wr(fan(li).select(shifted("l_orderkey", os),
      shifted("l_partkey", ps), shifted("l_suppkey", ss),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate")), "lineitem")

    val ev = rd("events")
    val es = stride(ev, "event_id"); val us = stride(ev, "user_id")
    wr(fan(ev).select(shifted("event_id", es), col("ts"),
      shifted("user_id", us), col("event_type"), col("value"),
      col("props")), "events")

    // copy 0 verbatim; copy k>0 suffixes every word with _k (the
    // Column-replacement overload makes the suffix per-row); n_chars
    // recomputed to stay consistent with the rewritten text
    val doc = rd("documents"); val ds = stride(doc, "doc_id")
    val scaledText = when(col("__k") === 0, col("text"))
      .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
        concat(lit("$1_"), col("__k"))))
    wr(fan(doc).select(shifted("doc_id", ds), scaledText.as("text"),
      col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long")),
      "documents")

    // circular rotation by (k*7 mod dim) positions: slice+concat,
    // norm-preserving, identity for k=0
    val emb = rd("embeddings"); val vs = stride(emb, "vec_id")
    val dim = size(col("embedding"))
    val rot = (col("__k") * 7 % dim).cast("int")
    wr(fan(emb).select(shifted("vec_id", vs),
      when(rot === 0, col("embedding")).otherwise(
        concat(slice(col("embedding"), rot + 1, dim - rot),
          slice(col("embedding"), lit(1), rot))).as("embedding"),
      col("label")), "embeddings")
  }
}
