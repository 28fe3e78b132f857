package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{ColumnFns => CF, TextFns => TF}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry maps one operator from SURVEY.md §2 (or a
  * north-star training-data op) onto the driver's synthetic tables,
  * routed through the graft operator library; `oracleSql` holds the
  * equivalent DuckDB SQL. Column names are aligned on both sides
  * (the driver's compare sorts columns by name before hashing).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Drop a query-scoped tmp store (catalog table + files) NOW — for
    * queries whose returned frames are eagerly checkpointed inside the
    * operator (the ingest loop), so the store is dead weight the
    * moment the lambda returns. An sf100 shingle-set store is ~8 GB;
    * leaking one per JVM run filled the host disk once (round 16). */
  private def dropStore(s: SparkSession, tag: String, path: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $tag")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Register a query-scoped tmp store directory for deletion at JVM
    * exit — for queries whose RETURNED frame still lazily reads the
    * store (the incremental-probe family), where an eager delete
    * would break the harness's later materialization. */
  private val exitPaths = new java.util.concurrent.ConcurrentLinkedQueue[String]
  private lazy val exitHook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => exitPaths.forEach { d =>
      try {
        def del(f: java.io.File): Unit = {
          val cs = f.listFiles(); if (cs != null) cs.foreach(del); f.delete()
        }
        del(new java.io.File(d))
      } catch { case _: Exception => }
    }))
  private def cleanupAtExit(path: String): Unit = {
    exitHook; exitPaths.add(path)
  }

  /** DuckDB CTE chain ending in `base` = (doc_id, truth, pred) of the
    * trained BoW classifier on the held-out split — shared by the
    * q_c_bowlangid (confusion) and q_c_prf (per-class P/R/F1)
    * oracles. */
  private lazy val bowOracleBase: String =
    s"tr AS (SELECT lang, unnest($toksSql) AS term FROM documents WHERE doc_id % 10 < 8), " +
      "p AS (SELECT lang AS label, term, count(*) AS cnt FROM tr GROUP BY 1, 2), " +
      "tot AS (SELECT label, CAST(sum(cnt) AS BIGINT) AS n, count(*) AS v FROM p GROUP BY 1), " +
      "lp AS (SELECT p.label, term, CAST(round(ln((cnt + 1)::DOUBLE / (n + v + 1)) * 1e6) AS BIGINT) AS lpm FROM p JOIN tot ON p.label = tot.label), " +
      "oov AS (SELECT label, CAST(round(ln(1.0 / (n + v + 1)) * 1e6) AS BIGINT) AS ov FROM tot), " +
      s"te AS (SELECT doc_id, unnest($toksSql) AS term FROM documents WHERE doc_id % 10 >= 8), " +
      "pres AS (SELECT doc_id, label, CAST(sum(lpm) AS BIGINT) AS sp, count(*) AS np FROM te JOIN lp USING (term) GROUP BY 1, 2), " +
      "lens AS (SELECT doc_id, count(*) AS len FROM te GROUP BY 1), " +
      "sc AS (SELECT lens.doc_id, oov.label, coalesce(sp, 0) + (len - coalesce(np, 0)) * ov AS score FROM lens CROSS JOIN oov LEFT JOIN pres ON pres.doc_id = lens.doc_id AND pres.label = oov.label), " +
      "win AS (SELECT doc_id, label AS pred FROM (SELECT sc.*, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, label) AS rn FROM sc) WHERE rn = 1), " +
      "base AS (SELECT d.doc_id, d.lang AS truth, coalesce(w.pred, (SELECT min(label) FROM tot)) AS pred FROM documents d LEFT JOIN win w ON d.doc_id = w.doc_id WHERE d.doc_id % 10 >= 8)"

  /** DuckDB CTE chain ending in `fs` = the FS pair-score table —
    * shared by the q_r_fs and q_r_erclust oracles. The double
    * constants are written as IEEE ops (CAST(1.0 AS DOUBLE) - CAST(
    * 0.95 AS DOUBLE)) so both engines compute identical bits. */
  private lazy val fsOracleCtes: String = {
    val fields = Seq(
      "bal" -> "CAST(floor(c_acctbal / 100) AS BIGINT)",
      "tail" -> "substr(c_name, -2, 2)",
      "mid" -> "substr(c_name, -4, 2)")
    val proj = fields.map { case (n, ex) => s"$ex AS f_$n" }.mkString(", ")
    // non-null groups only in the numerator, clamped to [1, N²−1] —
    // mirrors Linkage.fieldWeights exactly
    val us = fields.map { case (n, _) =>
      s"(SELECT CAST(least(greatest(sum(CASE WHEN v IS NOT NULL THEN c * c ELSE 0 END), 1), sum(c) * sum(c) - 1) AS DOUBLE) / (CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE)) " +
        s"FROM (SELECT f_$n AS v, count(*) AS c FROM f GROUP BY f_$n) t_$n) AS u_$n"
    }.mkString(", ")
    val ws = fields.map { case (n, _) =>
      s"CAST(round(ln(CAST(0.95 AS DOUBLE) / u_$n) * 1e6) AS BIGINT) AS wa_$n, " +
        s"CAST(round(ln((CAST(1.0 AS DOUBLE) - CAST(0.95 AS DOUBLE)) / (CAST(1.0 AS DOUBLE) - u_$n)) * 1e6) AS BIGINT) AS wd_$n"
    }.mkString(", ")
    val agreeSum = fields.map { case (n, _) =>
      s"CASE WHEN a.f_$n = b.f_$n THEN 1 ELSE 0 END"
    }.mkString(" + ")
    val scoreSum = fields.map { case (n, _) =>
      s"CASE WHEN a.f_$n = b.f_$n THEN wa_$n ELSE wd_$n END"
    }.mkString(" + ")
    val flags = fields.map { case (n, _) =>
      s"CASE WHEN a.f_$n = b.f_$n THEN 1 ELSE 0 END AS agree_$n"
    }.mkString(", ")
    "f AS (SELECT c_custkey AS id, c_nationkey AS bk1, c_mktsegment AS bk2, " +
      proj + " FROM customer), " +
      s"u AS (SELECT $us), w AS (SELECT $ws FROM u), " +
      s"fs AS (SELECT a.id AS id_a, b.id AS id_b, $agreeSum AS n_agree, " +
      s"$scoreSum AS score_unats, $flags " +
      "FROM f a JOIN f b ON a.bk1 = b.bk1 AND a.bk2 = b.bk2 AND a.id < b.id CROSS JOIN w)"
  }

  // shared FS linkage config (q_r_fs + q_r_erclust)
  private def fsPairs(customer: DataFrame): DataFrame =
    Linkage.fellegiSunter(customer, "c_custkey",
      Seq("c_nationkey", "c_mktsegment"),
      Seq("bal" -> "cast(floor(c_acctbal / 100) as bigint)",
        "tail" -> "substr(c_name, -2, 2)",
        "mid" -> "substr(c_name, -4, 2)"))

  // capped FS (q_r_fscapped + q_r_fscap_report): blocking on key
  // digit-count × segment makes block sizes exponentially skewed, so
  // maxBlock=12 genuinely splits the census at every SF — the cap and
  // the report leg are both exercised, not vacuous
  private def fsCapped(customer: DataFrame): Linkage.FsCandidates =
    Linkage.fellegiSunterCapped(
      customer.withColumn("c_keydigits",
        length(col("c_custkey").cast("string"))),
      "c_custkey", Seq("c_keydigits", "c_mktsegment"),
      Seq("bal" -> "cast(floor(c_acctbal / 100) as bigint)",
        "tail" -> "substr(c_name, -2, 2)",
        "mid" -> "substr(c_name, -4, 2)"),
      maxBlock = 12)

  // ---- derived interval tables for J1 (shared Spark/SQL definition) ----
  // The coordinate space GROWS with the data: L = max(100000,
  // 5·count(part)), which is exactly 100000 at every driver SF
  // (part(sf0.1) = 20000 rows, so results at or below sf0.1 are
  // bit-identical to the fixed-space derivation) and 10×/100× wider
  // at the ScaleUp sf1/sf10 decades. A fixed space densified
  // [0,100k)×23 quadratically at sf10 — a test-geometry artifact,
  // not an operator property; scaling L with row count keeps
  // interval density (and join selectivity per row) constant across
  // decades, the way a growing cohort adds samples over a fixed
  // genome rather than squaring per-base density. Both tables read L
  // from part's count so they share one space; the 1-row agg rides a
  // broadcast — no driver action.
  private def coordSpace(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").agg(
      greatest(lit(100000L), lit(5L) * count(lit(1))).as("__L"))

  private def genes(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").crossJoin(broadcast(coordSpace(s, dir))).select(
      col("p_partkey").as("g_id"),
      (col("p_partkey") % 23).as("chrom"),
      ((col("p_partkey") * 37) % col("__L")).as("g_start"),
      ((col("p_partkey") * 37) % col("__L") + 50 + col("p_size") * 10).as("g_end"))

  private def segs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").crossJoin(broadcast(coordSpace(s, dir))).select(
      col("o_orderkey").as("s_id"),
      (col("o_orderkey") % 23).as("chrom"),
      ((col("o_orderkey") * 53) % col("__L")).as("s_start"),
      ((col("o_orderkey") * 53) % col("__L") + 100 + col("o_orderkey") % 500).as("s_end"))

  private val coordSpaceSql =
    "(SELECT greatest(100000, 5 * count(*)) AS __L FROM part)"
  private val genesSql =
    s"SELECT p_partkey AS g_id, p_partkey % 23 AS chrom, (p_partkey*37) % __L AS g_start, (p_partkey*37) % __L + 50 + p_size*10 AS g_end FROM part, $coordSpaceSql"
  private val segsSql =
    s"SELECT o_orderkey AS s_id, o_orderkey % 23 AS chrom, (o_orderkey*53) % __L AS s_start, (o_orderkey*53) % __L + 100 + o_orderkey % 500 AS s_end FROM orders, $coordSpaceSql"

  /** Shared by q_j13_closest and q_j13_closest_br: one string, so the
    * twin can never silently decouple from the contract it claims to
    * replay. */
  private val closestOracleSql =
    s"WITH g AS ($genesSql), s AS ($segsSql), " +
      "p AS (SELECT g.g_id, s.s_id, CASE WHEN g.g_start < s.s_end AND s.s_start < g.g_end THEN 0 ELSE greatest(s.s_start - g.g_end, g.g_start - s.s_end) END AS dist FROM g JOIN s ON g.chrom = s.chrom), " +
      "r AS (SELECT *, row_number() OVER (PARTITION BY g_id ORDER BY dist, s_id) AS rn FROM p) " +
      "SELECT g.g_id, r.s_id AS closest_id, r.dist FROM g LEFT JOIN (SELECT * FROM r WHERE rn = 1) r ON g.g_id = r.g_id"

  /** Shared by the q_j9/q_j16 _br twins — the two directions differ
    * only in the as-of comparator. */
  private def asofBrOracleSql(cmp: String) =
    "SELECT l.event_id, l.event_type, r.r_event_id FROM (SELECT event_id, event_type, ts FROM events WHERE event_id % 2 = 0) l ASOF LEFT JOIN (SELECT event_type, ts, min(event_id) AS r_event_id FROM events WHERE event_id % 2 = 1 GROUP BY 1, 2) r " +
      s"ON l.event_type = r.event_type AND l.ts $cmp r.ts"

  /** Flagship: the CNV-style interval-join pipeline (SURVEY §3.1 step
    * 8) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    IntervalJoin.overlapBinned(
      genes(spark, dir), segs(spark, dir), Seq("chrom"),
      "g_start", "g_end", "s_start", "s_end", frac = 0.5, binWidth = 10000)
      .select("g_id", "s_id", "overlap_len")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.2 projections / filters ----
    "q_p1_project" -> ((s, d) =>
      t(s, d, "part").select(col("p_partkey"),
        col("p_name").as("part_name"), upper(col("p_brand")).as("brand"))),

    "q_p3_filter_eq" -> ((s, d) =>
      t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("l_quantity")), 4).as("sum_qty"))),

    "q_p5_conjunctive" -> ((s, d) =>
      t(s, d, "orders").filter(
        col("o_orderstatus") === "O" && col("o_totalprice") > 1000.0 &&
          col("o_orderpriority") =!= "1-URGENT")
        .select("o_orderkey", "o_custkey")),

    "q_p7_semi" -> ((s, d) =>
      t(s, d, "customer").join(t(s, d, "orders"),
        col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")),

    "q_p8_dupcheck" -> ((s, d) =>
      t(s, d, "orders").groupBy("o_custkey")
        .agg(count(lit(1)).as("n")).filter(col("n") > 1)),

    // ---- §2.3 joins ----
    "q_j1_interval" -> ((s, d) =>
      IntervalJoin.overlapBinned(genes(s, d), segs(s, d), Seq("chrom"),
        "g_start", "g_end", "s_start", "s_end", frac = 0.5, binWidth = 1000)
        .select("g_id", "s_id", "overlap_len")),

    // bedtools -r: the overlap must cover half of BOTH intervals
    "q_j17_reciprocal" -> ((s, d) =>
      IntervalJoin.fractionFilter(
        IntervalJoin.overlapBinned(genes(s, d), segs(s, d), Seq("chrom"),
          "g_start", "g_end", "s_start", "s_end", binWidth = 1000),
        "g_start", "g_end", "s_start", "s_end",
        fracA = 0.5, fracB = 0.5)
        .select("g_id", "s_id", "overlap_len")),

    "q_j2_left" -> ((s, d) =>
      t(s, d, "orders").join(t(s, d, "customer"),
        col("o_custkey") === col("c_custkey"), "left")
        .groupBy(coalesce(col("c_mktsegment"), lit("NONE")).as("segment"))
        .agg(count(lit(1)).as("n_orders"))),

    "q_j3_recon" -> ((s, d) =>
      Reconcile.countMatch(
        t(s, d, "lineitem"),
        t(s, d, "lineitem").filter(col("l_discount") > 0),
        Seq("l_suppkey"))),

    // J4 (inner count reconcile) as a parquet replay: the dump-vs-DB
    // table-stat frames of flows.DbCounter.reconcile, simulated from
    // two different tables bucketed to a shared synthetic table_name.
    "q_j4_counts" -> ((s, d) => {
      val dump = t(s, d, "customer")
        .groupBy(concat(lit("t"),
          (col("c_nationkey") % 5).cast("string")).as("table_name"))
        .agg(countDistinct(col("c_mktsegment")).as("column_count"),
          count(lit(1)).as("row_count"))
      val db = t(s, d, "supplier")
        .groupBy(concat(lit("t"),
          (col("s_nationkey") % 5).cast("string")).as("table_name"))
        .agg(countDistinct(col("s_nationkey")).as("column_count"),
          count(lit(1)).as("row_count"))
      graft.flows.DbCounter.reconcile(dump, db)
    }),

    "q_j5_anti" -> ((s, d) =>
      t(s, d, "customer").join(t(s, d, "orders"),
        col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")),

    "q_j7_lookup" -> ((s, d) => {
      val af = t(s, d, "lineitem").groupBy("l_partkey")
        .agg(min(col("l_extendedprice")).as("af_val"))
      t(s, d, "part").join(broadcast(af),
        col("p_partkey") === col("l_partkey"), "left")
        .select(col("p_partkey"),
          round(coalesce(col("af_val"), lit(-1.0)), 2).as("vaf"))
    }),

    // J6 indicator form: germline subtraction that ANNOTATES instead
    // of dropping (left join + boolean flag)
    "q_j6_indicator" -> ((s, d) =>
      VariantOps.subtractGermline(
        t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        t(s, d, "customer").filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey").as("o_custkey")),
        Seq("o_custkey"), keepFlag = true)),

    // J8: tumor/normal full-outer merge on the variant key, every
    // non-key column side-prefixed, INFO/QUAL re-exposed tumor-first —
    // replayed over VCF-shaped frames built from orders
    "q_j8_merge" -> ((s, d) => {
      def vcfish(m: Long, tag: String) =
        t(s, d, "orders").filter(col("o_orderkey") % m === 0).select(
          concat(lit("chr"), (col("o_orderkey") % 5).cast("string"))
            .as("CHROM"),
          col("o_orderkey").as("POS"),
          lit("A").as("REF"),
          col("o_orderstatus").as("ALT"),
          concat(lit(tag), col("o_orderpriority")).as("INFO"),
          round(col("o_totalprice"), 2).as("QUAL"),
          concat_ws(":", lit("0/1"), col("o_custkey").cast("string"))
            .as("S1"))
      VariantOps.mergeTumorNormal(
        vcfish(2, "T;PRI="), vcfish(3, "N;PRI="), "S1")
    }),

    // G4: FT injection — FORMAT gains ":FT", the packed sample column
    // gains the row FILTER
    "q_g4_ft" -> ((s, d) =>
      VariantOps.injectFt(
        t(s, d, "events").select(
          col("event_id"),
          lit("GT:DP").as("FORMAT"),
          when(col("value") > 0.5, "PASS").otherwise("q10").as("FILTER"),
          concat_ws(":", lit("0/1"), col("user_id").cast("string"))
            .as("S1")),
        "S1")),

    // A8: horizontal column-bind as a same-row struct (no positional
    // zip); the verify projection re-extracts scalar fields
    "q_a8_colbind" -> ((s, d) =>
      graft.flows.ClinicalMergeFlow.bindAnnotations(
        t(s, d, "customer").select("c_custkey", "c_name", "c_acctbal"),
        struct(upper(col("c_name")).as("uname"),
          round(col("c_acctbal") * 2, 2).as("dbl")))
        .select(col("c_custkey"),
          col("annotation.uname").as("uname"),
          col("annotation.dbl").as("dbl"))),

    // ---- §2.4 aggregation / dedup ----
    "q_a5_dedup_first" -> ((s, d) =>
      Dedup.keepFirst(t(s, d, "lineitem"), Seq("l_orderkey"),
        Seq(col("l_quantity").desc, col("l_linenumber").asc))
        .select("l_orderkey", "l_linenumber", "l_quantity")),

    "q_a5c_prefer" -> ((s, d) =>
      Dedup.preferReported(t(s, d, "orders"), Seq("o_custkey"),
        "o_orderstatus", Seq(col("o_orderdate").asc, col("o_orderkey").asc),
        lastValue = "O")
        .select("o_custkey", "o_orderkey", "o_orderstatus")),

    "q_a7_union" -> ((s, d) => {
      val a = t(s, d, "customer")
        .select(col("c_custkey").as("id"), lit("customer").as("kind"))
      val b = t(s, d, "supplier")
        .select(col("s_suppkey").as("id"), lit("supplier").as("kind"))
      a.unionByName(b).groupBy("kind").agg(count(lit(1)).as("n"),
        sum(col("id")).as("id_sum"))
    }),

    "q_a9_except" -> ((s, d) =>
      t(s, d, "part").select(col("p_partkey").as("k"))
        .except(t(s, d, "lineitem").select(col("l_partkey").as("k")))),

    // ---- §2.5 pivots ----
    "q_v1_pivot" -> ((s, d) => {
      val agg = t(s, d, "lineitem").groupBy("l_suppkey", "l_returnflag")
        .agg(round(sum(col("l_quantity")), 4).as("v"))
      Pivots.continuous(agg, "l_suppkey", "l_returnflag", "v", Seq("A", "N", "R"))
    }),

    "q_v2_pivot_discrete" -> ((s, d) => {
      val agg = t(s, d, "lineitem").groupBy("l_suppkey", "l_returnflag")
        .agg(count(lit(1)).cast("int").as("v"))
      Pivots.discrete(agg, "l_suppkey", "l_returnflag", "v", Seq("A", "N", "R"))
    }),

    // the reference's real matrix shape (cnv.py:655-679): one column
    // per sample, values passed EXPLICITLY (SURVEY §7.4 item 3) — no
    // inference scan, no 10k-value cap surprise. Pre-agg + pivot, NOT
    // the single-shuffle conditional-agg form: at width 500 the
    // latter evaluates every predicate per input row and falls out of
    // whole-stage codegen (measured 20 s vs 1.8 s at sf0.1 —
    // Pivots.continuousAgg scaladoc).
    "q_v3_wide" -> ((s, d) => {
      val agg = t(s, d, "lineitem")
        .withColumn("pcol", concat(lit("p"), col("l_partkey") % 500))
        .groupBy("l_suppkey", "pcol")
        .agg(round(sum(col("l_quantity")), 4).as("v"))
      Pivots.continuous(agg, "l_suppkey", "pcol", "v", widePivotCols)
    }),

    // V4: melt the V1 matrix back to long — the published-matrix
    // reader path; map-only Expand, round-trips to the long agg
    "q_v4_melt" -> ((s, d) => {
      val agg = t(s, d, "lineitem").groupBy("l_suppkey", "l_returnflag")
        .agg(round(sum(col("l_quantity")), 4).as("v"))
      Pivots.melt(
        Pivots.continuous(agg, "l_suppkey", "l_returnflag", "v",
          Seq("A", "N", "R")),
        Seq("l_suppkey"), Seq("A", "N", "R"),
        varName = "flag", valueName = "sum_qty")
    }),

    // ---- §2.7 scalar functions ----
    "q_f_strings" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        CF.splitIdx(col("o_orderpriority"), "-", 0).as("prio_num"),
        CF.splitLast(col("o_orderpriority"), "-").as("prio_name"),
        concat(lit("chr"), col("o_orderkey") % 5).as("chrom"))),

    "q_f9_gistic" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        CF.log2Ratio(col("p_size")).as("log2r"))
        .withColumn("gistic", CF.gisticBin(col("log2r")))),

    "q_f14_md5" -> ((s, d) =>
      t(s, d, "customer").select(col("c_custkey"),
        CF.md5Hex(col("c_name")).as("md5sum"),
        CF.hash60(col("c_name")).as("h60"))),

    // ---- §2.8 explode / generation ----
    "q_g1_explode" -> ((s, d) =>
      t(s, d, "embeddings").filter(col("vec_id") < 50)
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), (col("pos") + 1).as("pos"),
          round(col("col").cast("double"), 6).as("val"))),

    "q_g2_pairing" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("event_id")
      t(s, d, "events")
        .withColumn("rn", row_number().over(w))
        .withColumn("site2_id", lead(col("event_id"), 1).over(w))
        .withColumn("site2_type", lead(col("event_type"), 1).over(w))
        .filter(col("rn") % 2 === 1 && col("site2_id").isNotNull)
        .select(col("user_id"), col("event_id").as("site1_id"),
          col("event_type").as("site1_type"),
          col("site2_id"), col("site2_type"))
    }),

    "q_g3_split_explode" -> ((s, d) =>
      t(s, d, "part")
        .select(explode(split(col("p_name"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))),

    // ---- §2.7 extractors on constructed payloads ----
    "q_f3_info" -> ((s, d) =>
      t(s, d, "events").select(col("event_id"),
        CF.infoField(
          concat(lit("TYPE="), col("event_type"), lit(";UID="),
            col("user_id"), lit(";END")), "UID").cast("long").as("uid"),
        CF.infoFieldNa(lit(null).cast("string"), "UID").as("na_case"))),

    "q_f5_gtf" -> ((s, d) =>
      t(s, d, "part").select(col("p_partkey"),
        CF.gtfAttr(
          concat(lit("gene_id \"G"), col("p_partkey"),
            lit("\"; gene_name \""), col("p_name"),
            lit("\"; level "), col("p_size"), lit(";")),
          "gene_name").as("gene_name"))),

    // ---- §2.6 top-k per group ----
    "q_o6_topk" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("value").desc, col("event_id").asc)
      t(s, d, "events").withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select("user_id", "event_id", "value", "rnk")
    }),

    // tie-inclusive top-k (rank, not row_number): peers at the cut
    // all survive — order-insensitive, so no tiebreak column needed
    "q_o8_topk_ties" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc)
      t(s, d, "orders").withColumn("rnk", rank().over(w))
        .filter(col("rnk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")
    }),

    // ---- events: JSON nav (F15), sessionization, tumbling windows ----
    "q_e_json" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_val"))),

    "q_e_session" -> ((s, d) =>
      // micro-precision ts so the DuckDB oracle (micros-only timestamps)
      // sees identical values; gap = 30 min
      Sessionize.sessionStats(
        t(s, d, "events").withColumn("ts_us", expr("ts div 1000")),
        "user_id", "ts_us",
        gapNs = 1800000000L, tiebreak = Seq(col("event_id")))),

    // Spark's NATIVE session_window operator (the built-in gap-merge
    // aggregation, no window function) — split rule is diff >= gap,
    // end = last event + gap; the oracle replays that contract
    "q_e_sesswin" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("__et", timestamp_micros(expr("ts div 1000")))
        .groupBy(col("user_id"),
          session_window(col("__et"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), unix_micros(col("sw.start")).as("start_us"),
          unix_micros(col("sw.end")).as("end_us"), col("n_events"))),

    // debounce: drop same-user same-type events within 60s of the
    // previous one (double-click / duplicate-beacon filter)
    "q_e_debounce" -> ((s, d) =>
      Sessionize.debounce(t(s, d, "events"), Seq("user_id", "event_type"),
          "ts", Seq(col("event_id")), minGapNs = 60000000000L)
        .select("event_id", "user_id", "event_type")),

    // market-basket rules: sessions as baskets, event types as items
    "q_e_basket" -> ((s, d) =>
      Sessionize.basketRules(
        t(s, d, "events").withColumn("ts_us", expr("ts div 1000")),
        "user_id", "ts_us", "event_type",
        gapNs = 1800000000L, tiebreak = Seq(col("event_id")),
        minSupport = 2L)),

    // top-10 session paths: ordered event-type sequences by frequency
    "q_e_paths" -> ((s, d) =>
      Sessionize.topPaths(
        t(s, d, "events").withColumn("ts_us", expr("ts div 1000")),
        "user_id", "ts_us", "event_type",
        gapNs = 1800000000L, tiebreak = Seq(col("event_id")), k = 10)),

    // first-order Markov transition matrix of the event stream:
    // P(next type | type) in integer PPM
    "q_e_markov" -> ((s, d) =>
      Sessionize.transitionMatrix(t(s, d, "events"), "user_id", "ts",
        "event_type", Seq(col("event_id")))),

    "q_e_hourly" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(expr("ts div 3600000000000").as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_val"))),

    // hourly OHLC bars per event type: one hash aggregation, opens and
    // closes via lexicographic struct min/max (no window, no sort)
    "q_e_ohlc" -> ((s, d) =>
      Features.ohlcBars(t(s, d, "events"), Seq("event_type"), "ts",
        "event_id", "value", bucket = 3600000000000L)),

    // recency-weighted engagement: 7-day half-life against a FIXED
    // reference instant, per-row micro-unit rounding keeps sums exact
    "q_e_decay" -> ((s, d) =>
      Features.decayedSum(t(s, d, "events"), Seq("user_id"), "ts",
        "value", halfLife = 604800000000000L,
        refTs = 1767225600000000000L)),

    // the same WAU curve from merged HLL registers — the sketch path
    // that touches the event stream once at any window length
    "q_e_wauhll" -> ((s, d) =>
      Sketch.rollingDistinctHll(t(s, d, "events"), "ts", "user_id",
        bucketNs = 86400000000000L, window = 7)),

    // rolling 7-day distinct users per active day (the WAU curve):
    // dedup to (user, day) once, constant fan-out explode, one
    // count-distinct per day — no per-day rescans
    "q_e_wau" -> ((s, d) =>
      Features.rollingActive(t(s, d, "events"), "ts", "user_id",
        bucketNs = 86400000000000L, window = 7)),

    // Theil-Sen robust trend of daily volume per event type: median
    // of pairwise slopes (documented exact leg, maxPoints-guarded)
    "q_e_theilsen" -> ((s, d) =>
      Features.theilSen(
        t(s, d, "events")
          .groupBy(col("event_type"), expr("ts div 86400000000000").as("d"))
          .agg(count(lit(1)).as("c")),
        Seq("event_type"), "d", "c")),

    // OLS trend of the same daily series: slope/intercept/r² from five
    // exact long sums in ONE aggregation (the cheap non-robust twin)
    "q_e_ols" -> ((s, d) =>
      Features.olsTrend(
        t(s, d, "events")
          .groupBy(col("event_type"), expr("ts div 86400000000000").as("d"))
          .agg(count(lit(1)).as("c")),
        Seq("event_type"), "d", "c")),

    // lead/lag detection: cross-correlation of hourly click vs error
    // volume at lags 0..6 hours (exact long moment sums per lag)
    "q_e_ccf" -> ((s, d) =>
      Features.crossCorrelation(
        t(s, d, "events")
          .groupBy(expr("ts div 3600000000000").as("h"))
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("x"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L))
              .as("y")),
        "h", "x", "y", maxLag = 6)),

    // hour-of-day seasonal profile per event type: per-position mean
    // and population variance of per-day counts from exact sums
    "q_e_seasonal" -> ((s, d) =>
      Features.seasonalProfile(t(s, d, "events"), Seq("event_type"),
        "ts", positionNs = 3600000000000L, periodNs = 86400000000000L)),

    // seasonality-aware anomalies: hour buckets ≥2σ from their own
    // hour-of-day profile (rush hour doesn't fire; a 3 a.m. spike does)
    "q_e_seasonanom" -> ((s, d) =>
      Features.seasonalAnomalies(t(s, d, "events"), Seq("event_type"),
        "ts", positionNs = 3600000000000L, periodNs = 86400000000000L,
        thresholdMilli = 2000L)),

    // inter-arrival burstiness per user: CV of ms gaps from exact
    // moments (decimal Σg² — month-long gaps square past a long)
    "q_e_burst" -> ((s, d) =>
      Features.burstiness(t(s, d, "events"), "user_id", "ts",
        tieCols = Seq("event_id"))),

    // duration-weighted mean value per user (TWAP — the correct
    // average for irregularly sampled series)
    "q_e_twap" -> ((s, d) =>
      Features.twap(t(s, d, "events"), "user_id", "ts", "value",
        tieCols = Seq("event_id"))),

    // robust dispersion: exact median + MAD per event type
    "q_e_mad" -> ((s, d) =>
      Profile.madStats(t(s, d, "events"), Seq("event_type"), "value")),

    // last-touch attribution: each purchase credited to the latest
    // strictly-earlier non-purchase event within 7 days (as-of join
    // composition; nulls = organic purchases)
    "q_e_attrib" -> ((s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      // one touch row per (user, instant): max type breaks the tie a
      // same-timestamp pair would otherwise leave nondeterministic
      val touches = ev.filter(col("event_type") =!= "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_type")).as("touch_type"))
        .withColumn("touch_ts", col("ts").cast("long"))
      AsOfJoin.backward(purchases, touches, Seq("user_id"), "ts",
          Seq("touch_type", "touch_ts"), strict = true)
        .withColumn("attributed",
          when(col("touch_ts").isNotNull &&
            col("ts").cast("long") - col("touch_ts") <= 604800000000000L,
            col("touch_type")))
        .groupBy("attributed")
        .agg(count(lit(1)).as("n_purchases"))
    }),

    // per-user inter-arrival gap distribution (sessionization evidence).
    // Gaps are in integer MILLISECONDS on both engine and oracle sides:
    // Spark reads the raw ns longs while DuckDB's TIMESTAMP truncates to
    // µs, so any sub-ms unit makes the two gap multisets (and therefore
    // the interpolated percentiles) genuinely different, not just noisy.
    // buffer engine: per-USER groups are the many-small-groups regime
    // (tiny per-group multisets, group count scales with the corpus) —
    // the hash-agg percentile's buffers are bounded by per-user events
    // and it scans the windowed interArrival lineage ONCE, where the
    // radix twin would re-scan it four times and broadcast a
    // user-cardinality survivors frame (adoption contract in
    // Profile.groupedPercentiles scaladoc)
    "q_e_gaps" -> ((s, d) =>
      Profile.groupedPercentiles(
        Features.interArrival(
          t(s, d, "events").withColumn("ts_ms", expr("ts div 1000000")),
          Seq("user_id"), "ts_ms", Seq(col("event_id"))),
        Seq("user_id"), "gap", Seq(0.5, 0.95), engine = "buffer")),

    // daily new vs returning users (86400000000000 ns = 1 day)
    "q_e_newusers" -> ((s, d) =>
      Funnel.newVsReturning(t(s, d, "events"), "user_id", "ts",
        bucket = 86400000000000L)),

    // source x lang independence: chi-square statistic + dof
    "q_x_chi2" -> ((s, d) =>
      Profile.chiSquare(t(s, d, "documents"), "source", "lang")),

    // rank-normalize value to [0,1] within each event type
    "q_e_prank" -> ((s, d) =>
      Features.percentRankByRange(t(s, d, "events"), "event_type",
          "value", Seq(col("event_id")))
        .select("event_id", "event_type", "prank")),

    // lag-1 autocorrelation of value per event type (ts, id order)
    "q_e_autocorr" -> ((s, d) =>
      Features.autocorrelationByRange(t(s, d, "events"),
        Seq("event_type"), "ts", "value", Seq(col("event_id")))),

    // smoothed target encoding of event_type against value
    "q_x_target" -> ((s, d) =>
      Features.targetEncode(t(s, d, "events"), Seq("event_type"),
        "value", m = 10.0)),

    // leakage-safe temporal split: 2024-01-21 cut, 1-day embargo
    "q_x_embargo" -> ((s, d) =>
      Features.embargoSplit(t(s, d, "events"), "ts",
          splitTs = 1705795200000000000L, embargoNs = 86400000000000L)
        .groupBy("split").agg(count(lit(1)).as("n"))),

    // ordered funnel: view -> click -> purchase, first-touch strict
    "q_e_funnel" -> ((s, d) =>
      Funnel.reached(t(s, d, "events"), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))),

    // the same funnel with a 1-day conversion window per step — the
    // form product funnels actually ship
    "q_e_funnelw" -> ((s, d) =>
      Funnel.reachedWithin(t(s, d, "events"), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"),
        maxGapNs = 86400000000000L)),

    // conversion-lag distribution per funnel transition (ms units
    // before the percentile — the q_e_gaps determinism recipe)
    "q_e_steplag" -> ((s, d) =>
      Funnel.stepLags(
        t(s, d, "events").withColumn("ts_ms", expr("ts div 1000000")),
        "user_id", "ts_ms", "event_type",
        Seq("view", "click", "purchase"))),

    // per-type latency-style percentile table — BOTH engines carried
    // as bench rows (the q_j13/q_j13_br discipline) so the adoption
    // contract stays MEASURED: the default one-scan hash-agg
    // percentile wins while per-group buffers fit (solo one-band
    // sf10 1.45 s / sf100 3.99 s vs radix 6.80 / 32.3 — buffers of
    // ~10⁶ distincts/group are not the breaking regime); the radix
    // twin removes the buffers entirely and is the
    // ≫distincts-per-group memory-safety knob. Identical output,
    // same oracle
    "q_e_pctl" -> ((s, d) =>
      Profile.groupedPercentiles(t(s, d, "events"), Seq("event_type"),
        "value", Seq(0.5, 0.95, 0.99))),

    "q_e_pctl_radix" -> ((s, d) =>
      Profile.groupedPercentiles(t(s, d, "events"), Seq("event_type"),
        "value", Seq(0.5, 0.95, 0.99), engine = "radix")),

    // percentile-threshold anomaly flags (composed from the grouped
    // percentile table, broadcast back onto the stream of events);
    // default (buffer) engine — the row's subject is the threshold
    // join, and the one-scan percentile is the measured winner at
    // bench scales (see the q_e_pctl twins)
    "q_e_anomaly" -> ((s, d) => {
      val ev = t(s, d, "events")
      val p99 = Profile.groupedPercentiles(ev, Seq("event_type"),
        "value", Seq(0.99))
      ev.join(broadcast(p99), "event_type")
        .filter(col("value") > col("p99"))
        .select("event_id", "event_type", "value")
    }),

    // blocked fuzzy matching (entity resolution): same first word,
    // Levenshtein <= 3 — over DISTINCT values with multiplicities
    // (the heavy-duplicate scale path; row count stops mattering)
    "q_x_fuzzy" -> ((s, d) =>
      FuzzyJoin.valuePairs(t(s, d, "part"), "p_name",
        st => split(st, " ").getItem(0), maxDist = 3)),

    // UNBLOCKED edit-distance self-join via q-gram prefix filtering
    // (Ed-Join): recall 1.0 by theorem — the oracle is the exact
    // quadratic join, so the gate PROVES the blocked path loses
    // nothing. Word-like column (the filter's home turf); ID-like
    // keys (c_name…) belong to q_d_snm — see editGramPairs scaladoc.
    "q_d_editjoin" -> ((s, d) =>
      FuzzyJoin.editGramPairs(t(s, d, "part"), "p_name",
        q = 2, maxDist = 3)),

    // sorted-neighborhood candidates (window 4 over the name order),
    // Levenshtein-verified — the bounded-candidate ER scheme
    "q_d_snm" -> ((s, d) =>
      FuzzyJoin.snmPairs(t(s, d, "supplier"), "s_suppkey", "s_name",
        window = 4, maxDist = 2)),

    // edit-similarity profile: codegen'd Jaro / Jaro-Winkler / FULL
    // Damerau-Levenshtein kernels over adjacent distinct names
    // (vocabulary-sized — one window over 64 values at any SF)
    "q_r_dist" -> ((s, d) =>
      Linkage.neighborDistances(t(s, d, "part"), "p_name")),

    // Fellegi-Sunter probabilistic linkage: blocked candidate pairs,
    // u-probabilities from value frequencies, integer micro-nat
    // weights (exact long scores — the LangModel determinism recipe)
    "q_r_fs" -> ((s, d) => fsPairs(t(s, d, "customer"))),

    // the full ER pipeline under one gate: FS scoring -> positive-
    // evidence threshold -> connected components (min-label clusters)
    "q_r_erclust" -> ((s, d) =>
      Dedup.dupClusters(
        fsPairs(t(s, d, "customer"))
          .filter(col("score_unats") > 0)
          .select(col("id_a"), col("id_b")))
        .select(col("id").as("node"), col("cluster_id").as("cluster"))),

    // block-capped FS: the Θ(Σ block²) guard rail — scores restricted
    // to blocks <= maxBlock, plus (next row) the skipped-block report
    "q_r_fscapped" -> ((s, d) => fsCapped(t(s, d, "customer")).scores),

    "q_r_fscap_report" -> ((s, d) =>
      fsCapped(t(s, d, "customer")).oversized.select(
        col("c_keydigits").as("block_digits"),
        col("c_mktsegment").as("block_segment"), col("block_n"))),

    // integer-micro PageRank (3 iterations) on the order->part graph
    // per-node triangle counts on an md5-randomized 150-node graph
    // derived from orders (degree-ordered orientation bounds the
    // wedge fan-out; oracle counts a<b<c closures directly)
    "q_g_triangles" -> ((s, d) =>
      Graph.triangles(
        t(s, d, "orders").select(
          (conv(substring(md5(concat(lit("ta"),
            col("o_orderkey").cast("string"))), 1, 8), 16, 10)
            .cast("long") % 150).as("x"),
          (conv(substring(md5(concat(lit("tb"),
            col("o_orderkey").cast("string"))), 1, 8), 16, 10)
            .cast("long") % 150).as("y")),
        "x", "y")),

    // k-core membership: 8 fixed peels (the oracle unrolls the same
    // rounds, so convergence state can never diverge between engines)
    "q_g_kcore" -> ((s, d) =>
      Graph.kCore(
        t(s, d, "orders").filter(col("o_orderkey") % 5 === 0).select(
          (conv(substring(md5(concat(lit("ka"),
            col("o_orderkey").cast("string"))), 1, 8), 16, 10)
            .cast("long") % 300).as("x"),
          (conv(substring(md5(concat(lit("kb"),
            col("o_orderkey").cast("string"))), 1, 8), 16, 10)
            .cast("long") % 300).as("y")),
        "x", "y", k = 2, peels = 8)),

    "q_g_pagerank" -> ((s, d) =>
      Graph.pageRankInt(
        t(s, d, "lineitem").select(
          (col("l_orderkey") % 500).as("src"),
          (col("l_partkey") % 500).as("dst")),
        "src", "dst", iters = 3).ranks),

    // personalized PageRank: restart mass pinned to the % 97 seed
    // set — relevance-to-core ranking on the same order->part graph
    "q_g_ppr" -> ((s, d) => {
      val edges = t(s, d, "lineitem").select(
        (col("l_orderkey") % 500).as("src"),
        (col("l_partkey") % 500).as("dst"))
      val seeds = edges.select(col("src").as("seed"))
        .unionAll(edges.select(col("dst").as("seed")))
        .filter(col("seed") % 97 === 0)
      Graph.personalizedPageRankInt(edges, "src", "dst", seeds,
        "seed", iters = 3).ranks
    }),

    // first-class connected components on a SPARSE md5-randomized
    // graph (2000-node space, ~1/40 of orders as edges → many
    // components; oracle is an independent recursive-CTE min-label
    // reachability fixpoint)
    "q_g_cc" -> ((s, d) =>
      Graph.connectedComponents(
        t(s, d, "orders").filter(col("o_orderkey") % 40 === 0).select(
          (conv(substring(md5(concat(lit("ca"),
            col("o_orderkey").cast("string"))), 1, 8), 16, 10)
            .cast("long") % 2000).as("x"),
          (conv(substring(md5(concat(lit("cb"),
            col("o_orderkey").cast("string"))), 1, 8), 16, 10)
            .cast("long") % 2000).as("y")),
        "x", "y")),

    // bounded-depth BFS (3 hops) from a modular seed set over the
    // symmetrized graph; oracle is a depth-bounded recursive CTE
    // taking min(d) per reached node
    "q_g_bfs" -> ((s, d) => {
      val raw = t(s, d, "orders").filter(col("o_orderkey") % 10 === 0)
        .select(
          (conv(substring(md5(concat(lit("ba"),
            col("o_orderkey").cast("string"))), 1, 8), 16, 10)
            .cast("long") % 500).as("x"),
          (conv(substring(md5(concat(lit("bb"),
            col("o_orderkey").cast("string"))), 1, 8), 16, 10)
            .cast("long") % 500).as("y"))
      val sym = raw.select(col("x").as("src"), col("y").as("dst"))
        .unionAll(raw.select(col("y").as("src"), col("x").as("dst")))
        .filter(col("src") =!= col("dst"))
      val seeds = sym.select(col("src").as("seed"))
        .filter(col("seed") % 97 === 0)
      Graph.bfsHops(sym, "src", "dst", seeds, "seed", maxHops = 3).dists
    }),

    // deterministic synchronous label propagation (3 rounds,
    // mode-of-neighbors, ties to the smaller label) on a sparse
    // md5-randomized 400-node graph — community detection
    "q_g_lpa" -> ((s, d) => {
      val edges = t(s, d, "orders").filter(col("o_orderkey") % 20 === 0)
        .select(
          (conv(substring(md5(concat(lit("la"),
            col("o_orderkey").cast("string"))), 1, 8), 16, 10)
            .cast("long") % 400).as("x"),
          (conv(substring(md5(concat(lit("lb"),
            col("o_orderkey").cast("string"))), 1, 8), 16, 10)
            .cast("long") % 400).as("y"))
      Graph.labelPropagation(edges, "x", "y", iters = 3).labels
    }),

    // resample: hourly counts densified per type (missing hours -> 0)
    "q_e_gapfill" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .groupBy(expr("ts div 3600000000000").as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      Features.fillGaps(hourly, Seq("event_type"), "hour", step = 1L,
        Map("n" -> lit(0L)))
        .select("event_type", "hour", "n")
    }),

    // document-level term co-occurrence with PMI scores
    "q_t_pmi" -> ((s, d) =>
      Tfidf.cooccurrence(t(s, d, "documents"), "text", "doc_id",
        minPairs = 5L)),

    // weekly cohort retention triangle (ts is epoch-nanos)
    "q_e_retention" -> ((s, d) =>
      Funnel.retention(t(s, d, "events"), "user_id", "ts",
        bucket = 604800000000000L)),

    // RAG-style overlapping character chunks (80 wide, 20 overlap)
    "q_t_chunks" -> ((s, d) =>
      Corpus.chunk(t(s, d, "documents"), "text", "doc_id",
        maxChars = 80, overlap = 20)),

    // ---- temporal alignment: as-of join (union-sort form — ONE
    //      shuffle, no range-join product; the oracle is DuckDB's
    //      NATIVE ASOF JOIN, an independent implementation) ----
    "q_j9_asof" -> ((s, d) => {
      val ev = t(s, d, "events")
      val l = ev.filter(col("event_id") % 2 === 0)
        .select("user_id", "ts", "event_id")
      val r = ev.filter(col("event_id") % 2 === 1)
        .select(col("user_id"), col("ts"),
          col("event_id").as("r_event_id"), col("value").as("r_value"))
      AsOfJoin.backward(l, r, Seq("user_id"), "ts",
        Seq("r_event_id", "r_value"))
        .select("event_id", "user_id", "r_event_id", "r_value")
    }),

    // forward as-of: earliest odd event at/after each even event —
    // same union-sort single-shuffle shape, reversed ordering
    "q_j16_asof_fwd" -> ((s, d) => {
      val ev = t(s, d, "events")
      val l = ev.filter(col("event_id") % 2 === 0)
        .select("user_id", "ts", "event_id")
      val r = ev.filter(col("event_id") % 2 === 1)
        .select(col("user_id"), col("ts"),
          col("event_id").as("r_event_id"), col("value").as("r_value"))
      AsOfJoin.forward(l, r, Seq("user_id"), "ts",
        Seq("r_event_id", "r_value"))
        .select("event_id", "user_id", "r_event_id", "r_value")
    }),

    // ByRange twins under the SAME DuckDB-native-ASOF oracle, keyed by
    // event_type — the low-cardinality wall shape the twins exist for
    // (each key spans many range partitions, so the carry path runs).
    // Right side pre-aggregates to unique ts per key (the as-of
    // precondition; min event_id makes the pick total).
    "q_j9_asof_br" -> ((s, d) => {
      val ev = t(s, d, "events")
      val l = ev.filter(col("event_id") % 2 === 0)
        .select("event_id", "event_type", "ts")
      val r = ev.filter(col("event_id") % 2 === 1)
        .groupBy(col("event_type"), col("ts"))
        .agg(min(col("event_id")).as("r_event_id"))
      AsOfJoin.backwardByRange(l, r, Seq("event_type"), "ts",
        Seq("r_event_id"))
        .select("event_id", "event_type", "r_event_id")
    }),

    "q_j16_asof_fwd_br" -> ((s, d) => {
      val ev = t(s, d, "events")
      val l = ev.filter(col("event_id") % 2 === 0)
        .select("event_id", "event_type", "ts")
      val r = ev.filter(col("event_id") % 2 === 1)
        .groupBy(col("event_type"), col("ts"))
        .agg(min(col("event_id")).as("r_event_id"))
      AsOfJoin.forwardByRange(l, r, Seq("event_type"), "ts",
        Seq("r_event_id"))
        .select("event_id", "event_type", "r_event_id")
    }),

    // ---- interval algebra (bedtools merge / genomecov siblings) ----
    "q_j10_merge" -> ((s, d) =>
      Intervals.mergeOverlaps(segs(s, d), Seq("chrom"), "s_start", "s_end")
        .select("chrom", "s_start", "s_end", "n_intervals")),

    "q_j11_depth" -> ((s, d) =>
      Intervals.coverageDepth(segs(s, d), Seq("chrom"), "s_start", "s_end")
        .select("chrom", "d_start", "d_end", "depth")),

    "q_j12_subtract" -> ((s, d) =>
      Intervals.subtract(genes(s, d), segs(s, d), Seq("chrom"),
        "g_id", "g_start", "g_end", "s_start", "s_end")
        .select("g_id", "chrom", "sub_start", "sub_end")),

    "q_j13_closest" -> ((s, d) =>
      Intervals.closest(genes(s, d), segs(s, d), Seq("chrom"),
        "g_id", "g_start", "g_end", "s_id", "s_start", "s_end",
        binWidth = 1000)),

    // range-partitioned twin: the two as-of legs ride
    // backwardByRange/forwardByRange instead of the 23-task per-chrom
    // window — key-count-independent parallelism (q_j13 is the
    // worst sf100/sf10 ratio in the flagship census, and the as-of
    // legs are its wall). Same oracle SQL as q_j13_closest.
    "q_j13_closest_br" -> ((s, d) =>
      Intervals.closestByRange(genes(s, d), segs(s, d), Seq("chrom"),
        "g_id", "g_start", "g_end", "s_id", "s_start", "s_end",
        binWidth = 1000)),

    // bedtools complement: uncovered gaps between merged islands
    "q_j14_complement" -> ((s, d) =>
      Intervals.complement(segs(s, d), Seq("chrom"),
        "s_start", "s_end")),

    // bedtools jaccard: intersection/union bp between two interval
    // sets per chrom — islands first, exact longs, one division
    "q_j15_ivjaccard" -> ((s, d) =>
      Intervals.intervalJaccard(
        genes(s, d).select(col("chrom"), col("g_start").as("istart"),
          col("g_end").as("iend")),
        segs(s, d).select(col("chrom"), col("s_start").as("istart"),
          col("s_end").as("iend")),
        Seq("chrom"), "istart", "iend")),

    // group-aware null imputation (nulls injected deterministically so
    // the oracle sees the same holes)
    // median mode, deliberately: the sf10 spot-gate caught the mean
    // mode's 4-dp round landing EXACTLY on a .00005 tie (41.58625),
    // where Spark's HALF_UP (shortest-decimal-repr) and DuckDB's
    // scaled-double round diverge — a presentation-rounding class no
    // summation fix removes. Medians of 2-dp data are 0.005-quantized,
    // so round(…,4) never decides a tie at ANY scale; this also puts
    // the grouped-exact-percentile + radix-global-fallback branch
    // (previously spec-only) under the oracle gate. Mean mode stays
    // spec-covered with the caveat on the operator scaladoc.
    "q_e_impute" -> ((s, d) =>
      Impute.fillFromGroup(
        t(s, d, "events").withColumn("value",
          when(col("event_id") % 10 === 0, lit(null)).otherwise(col("value"))),
        Seq("user_id"), "value", stat = "median")
        .select("event_id", "user_id", "value_filled", "value_imputed")),

    // quantile normalization over a 10-sample x 100-gene cents matrix
    // (exact integer rank sums -> engine-exact rank means)
    "q_e_qnorm" -> ((s, d) => {
      val m = t(s, d, "lineitem")
        .groupBy((col("l_suppkey") % 10).as("sample_id"),
          (col("l_partkey") % 100).as("gene"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("v"))
      Features.quantileNormalize(m, "sample_id", "gene", "v")
        .select("sample_id", "gene", "qn_rank", "qn_value")
    }),

    // ---- per-key rolling + lag features (feature engineering) ----
    "q_e_rolling" -> ((s, d) =>
      Features.lagFeatures(
        Features.rollingStats(t(s, d, "events"), Seq("user_id"), "ts",
          "value", k = 4),
        Seq("user_id"), "ts", "value", Seq(1))
        .select("event_id", "user_id", "roll_n", "roll_sum", "roll_avg",
          "roll_min", "roll_max", "lag_1")),

    // functional-dependency discovery: one holding key FD, one
    // violated, one constant-rhs FD — the profiler's key detector
    "q_x_fd" -> ((s, d) =>
      Profile.fdReport(t(s, d, "orders"),
        Seq("o_orderkey" -> "o_custkey",
          "o_custkey" -> "o_orderpriority",
          "o_orderstatus" -> "o_orderstatus"))),

    // Benford first-digit screen on an amount column (exact counts,
    // micro-unit shares vs the closed-form expectation)
    "q_x_benford" -> ((s, d) =>
      Profile.benford(t(s, d, "lineitem"), "l_extendedprice")),

    // drift report between two table snapshots (split halves stand
    // in for ref/cur versions): which columns moved, by how much
    "q_x_drift" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      Profile.drift(
        li.filter(col("l_orderkey") % 2 === 0),
        li.filter(col("l_orderkey") % 2 === 1),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
    }),

    // the 100 TB monitor form of q_x_drift, gated on its ERROR
    // CONTRACT (the q_x_profile_approx pattern): each side runs the
    // one-scan HLL + quantile-summary sketches AND the exact anchors,
    // the four booleans assert the sketches' documented bounds, and
    // the oracle replays the exact drift report with literal TRUEs.
    // The bare approx-drift THROUGHPUT (no anchor scans) is measured
    // by the bench-only q_x_drift_approx_raw row in `benchExtras`
    "q_x_drift_approx" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      Profile.approxDriftCheck(
        li.filter(col("l_orderkey") % 2 === 0),
        li.filter(col("l_orderkey") % 2 === 1),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
    }),

    // feature-usefulness screen: which metadata predicts the label?
    // per-cell micro-nat rounding -> exact long sums -> one division
    "q_x_infogain" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Profile.infoGain(docs, "source", "lang").unionAll(
        Profile.infoGain(
          docs.withColumn("len_bucket", expr("n_chars div 200")),
          "len_bucket", "lang"))
    }),

    // per-brand pareto front (minimize price, maximize size): one
    // range-frame window instead of the O(n^2) dominance test the
    // oracle replays as NOT EXISTS
    "q_o7_skyline" -> ((s, d) =>
      Features.skyline2D(
        t(s, d, "part").select(col("p_partkey"), col("p_brand"),
          round(col("p_retailprice") * 100).cast("long")
            .as("price_cents"), col("p_size")),
        Seq("p_brand"), "price_cents", "p_size")),

    // sliding mean-shift change points per event type (trailing vs
    // leading 8-row windows, exact integer milli-unit sums, flag on
    // cross-multiplied compare — no division in the detector)
    // ts is emitted (and ordered) in µs with the event_id tiebreak —
    // DuckDB timestamps are µs-precision, so both engines must key
    // on the identical (µs, id) pair
    "q_e_shift" -> ((s, d) =>
      Features.meanShiftPointsByRange(
        t(s, d, "events").withColumn("ts_us", expr("ts div 1000")),
        Seq("event_type"), "ts_us", "value", k = 8,
        thresholdMilli = 30000L, tiebreak = Seq(col("event_id")))
        .select("event_type", "ts_us", "lsum_milli", "rsum_milli",
          "shift_milli", "is_shift")),

    // ---- text analysis (documents) ----
    "q_t_stats" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TF.wordCount(col("text")).as("n_words"),
        round(TF.punctRatio(col("text")), 6).as("punct_ratio"))),

    "q_t_quality" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TF.qualityScore(col("text")).as("quality"))),

    // vocabulary coverage curve: token-stream share of the top
    // 100/1000/10000 types (tokenizer sizing)
    "q_t_vocabcov" -> ((s, d) =>
      Tfidf.vocabCoverage(t(s, d, "documents"), "text",
        Seq(100, 1000, 10000))),

    // hashing-trick vectorizer: fixed 256-slot sparse features,
    // no fitted vocabulary state
    "q_t_hashvec" -> ((s, d) =>
      Tfidf.hashVectorize(t(s, d, "documents"), "text", "doc_id",
        k = 256)),

    // chars-per-token fertility by language (tokenizer equity)
    "q_t_fertility" -> ((s, d) =>
      Tfidf.tokenFertility(t(s, d, "documents"), "text", "lang")),

    // Heaps-law vocabulary growth over 10 nested subsets, one pass
    "q_t_heaps" -> ((s, d) =>
      Tfidf.heapsCurve(t(s, d, "documents"), "text", "doc_id")),

    // character-distribution entropy screen (map-only, no shuffle)
    "q_t_entropy" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        TF.charEntropy(col("text")).as("entropy"))),

    // MOSS winnowing fingerprints (map-only; window min over 3-gram
    // hashes, rightmost tie, per-doc distinct before the explode)
    "q_t_winnow" -> ((s, d) =>
      Dedup.winnowFingerprints(t(s, d, "documents"), "text", "doc_id",
        n = 3, w = 4)),

    // fingerprint-join candidate pairs with the boilerplate-fp cap
    "q_d_winnowpairs" -> ((s, d) =>
      Dedup.winnowPairs(t(s, d, "documents"), "text", "doc_id",
        n = 3, w = 4, minShared = 2, maxFp = 100)),

    // Gopher-style repetition screens (word-level): the drop-before-
    // training filters a 100 TB corpus pass runs first. Tokenize once
    // per row (own projection), score three screens off the bound array.
    "q_t_repetition" -> ((s, d) =>
      t(s, d, "documents")
        // one native-kernel pass per document (graft.plans.TokenStats);
        // all three screens derive from the bound struct
        .select(col("doc_id"), TF.tokenStats(col("text")).as("__ts"))
        .select(col("doc_id"),
          round(TF.dupFracOf(col("__ts")), 6).as("dup_frac"),
          round(TF.topFracOf(col("__ts")), 6).as("top_frac"),
          round(TF.consecFracOf(col("__ts")), 6).as("consec_frac"))),

    "q_t_langid" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TF.langGuess(col("text")).as("lang_guess"))),

    "q_t_fingerprint" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TF.fingerprint(col("text")).as("fp"))),

    "q_t_bpe" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        expr("size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0))")
          .as("n_tokens"))),

    // true BPE merge induction: 5 merges learned over the corpus
    // vocabulary (driver argmax per step — one metadata-sized row)
    "q_t_bpemerges" -> ((s, d) =>
      Bpe.learnMerges(t(s, d, "documents"), "text", k = 100)),

    // the DISTRIBUTED learn path under the same oracle (localSymbolCap
    // = 0 forces it): per-step pair-count aggregation + argmax jobs,
    // vocabulary never collected — the form a 100 TB corpus runs as.
    // Shallow k: every step is a driver-coordinated job, and the
    // k=100 depth is already gated through the local path above
    "q_t_bpemerges_dist" -> ((s, d) =>
      Bpe.learnMerges(t(s, d, "documents"), "text", k = 12,
        localSymbolCap = 0L)),

    // the encode side: every corpus token segmented by those merges.
    // Pieces posexplode to scalar (pos, piece) rows — the driver's
    // comparator can't sort array-typed columns.
    "q_t_bpeencode" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Bpe.encode(docs, "text", "doc_id",
        Bpe.learnMerges(docs, "text", k = 100))
        // posexplode_OUTER + isNotNull, not posexplode:
        // InferFiltersFromGenerate would push size(pieces)>0 below the
        // distinct, re-running the encode kernel per token OCCURRENCE
        // (the q_d_prefix lesson — outer generates are exempt)
        .select(col("doc_id"), col("w"), posexplode_outer(col("pieces")))
        .filter(col("pos").isNotNull)
        .withColumnRenamed("col", "piece")
    }),

    // ---- dedup at scale (documents) ----
    "q_d_exact" -> ((s, d) =>
      Dedup.exactByContent(t(s, d, "documents"), "text", "doc_id")),

    // cross-source duplicate overlap matrix (mirror/syndication map)
    "q_d_srcoverlap" -> ((s, d) =>
      Dedup.sourceOverlap(t(s, d, "documents"), "text", "source")),

    // referential-integrity report over the TPC-H FK edges
    "q_x_fk" -> ((s, d) =>
      Validate.fkReport(Seq(
        ("lineitem_orders", t(s, d, "lineitem"), "l_orderkey",
          t(s, d, "orders"), "o_orderkey"),
        ("orders_customer", t(s, d, "orders"), "o_custkey",
          t(s, d, "customer"), "c_custkey"),
        ("customer_nation", t(s, d, "customer"), "c_nationkey",
          t(s, d, "nation"), "n_nationkey")))),

    // duplication concentration: dup-group deciles by copy count.
    // The decile over the dup-GROUP frame (data-sized: one row per
    // distinct content) rides the range-partitioned ntile skeleton —
    // a bare Window.orderBy here would funnel every group through one
    // task at corpus scale.
    "q_d_dupconc" -> ((s, d) =>
      Batching.ntileByRange(
          Dedup.exactByContent(t(s, d, "documents"), "text", "doc_id"),
          Seq(col("dup_count").desc, col("content_hash")), 10, 0)
        .withColumn("decile", col("batch").cast("long"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_groups"), sum(col("dup_count")).as("n_docs"))),

    // normalization-aware exact dedup: case/punct/whitespace variants
    // collapse to one canonical form before hashing (C4 convention)
    "q_d_normdedup" -> ((s, d) =>
      Dedup.exactByContent(
        t(s, d, "documents").withColumn("__norm",
          TF.normalizeText(col("text"))),
        "__norm", "doc_id")),

    // incremental dedup against a BUCKETED signature store — the
    // operational 100 TB shape: the ingested corpus writes its
    // signature store bucketed by sig ONCE; an arriving batch (here a
    // re-crawl of every 10th doc — new ids, punctuation-mangled text,
    // so the match is through the normalization, not byte equality)
    // joins it with the corpus side exchange-free (PlanSpec pins the
    // single batch-side Exchange)
    "q_d_incr" -> ((s, d) => {
      val docs = t(s, d, "documents")
      // per-JVM store name: two graft processes on one host (a Verify
      // overlapping a Bench) must not Overwrite each other's bucketed
      // files mid-read
      val tag = s"graft_dedup_store_${ProcessHandle.current.pid}"
      val path = sys.props("java.io.tmpdir") + "/" + tag
      cleanupAtExit(path)
      Dedup.writeSignatureStore(docs, "text", "doc_id",
        tag, path, buckets = 8)
      val batch = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"),
          concat(col("text"), lit(" ***")).as("text"))
      Dedup.incrementalExact(batch, "text", "doc_id", s.table(tag))
    }),

    // incremental NEAR-dedup against a bucketed BAND-SIGNATURE store —
    // q_d_incr's LSH sibling, the other half of the operational 100 TB
    // shape: the corpus's minhash band rows are written bucketed by
    // (band, bucket) once; an arriving batch (re-crawl of every 10th
    // doc, new ids, trailing-garbage text so matches are band-level,
    // not byte-level) LSH-probes the store exchange-free on the corpus
    // side (PlanSpec pins the two batch-sized Exchanges)
    "q_d_incr_lsh" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val tag = s"graft_lsh_store_${ProcessHandle.current.pid}"
      val path = sys.props("java.io.tmpdir") + "/" + tag
      cleanupAtExit(path)
      Dedup.writeBandSignatureStore(docs, "text", "doc_id", tag, path,
        buckets = 8, numHashes = 8, bands = 4, shingleSize = 3)
      val batch = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"),
          concat(col("text"), lit(" ***")).as("text"))
      Dedup.incrementalLsh(batch, "text", "doc_id", s.table(tag),
        numHashes = 8, bands = 4, shingleSize = 3).pairs
    }),

    // the APPEND leg of the band-store lifecycle (r13 verdict #1):
    // generation 0 (even doc ids) is written bucketed; generation 1
    // (odd ids) is FOLDED IN via Storage.appendBucketed under the
    // table's own catalog spec — no store rewrite; the re-crawl batch
    // then probes store∪batch1 exchange-free on the store side
    // (PlanSpec pins it on exactly this appended table). The DuckDB
    // oracle replays both generations as an explicit UNION ALL of
    // band rows. Compaction (one file per bucket, probe-plan
    // invariance) is pinned in StorageSpec — a maintenance op, not a
    // query-path stage.
    "q_d_incr_lsh2" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val tag = s"graft_lsh_store2_${ProcessHandle.current.pid}"
      val path = sys.props("java.io.tmpdir") + "/" + tag
      cleanupAtExit(path)
      Dedup.writeBandSignatureStore(docs.filter(col("doc_id") % 2 === 0),
        "text", "doc_id", tag, path,
        buckets = 8, numHashes = 8, bands = 4, shingleSize = 3)
      Dedup.appendBandSignatures(docs.filter(col("doc_id") % 2 === 1),
        "text", "doc_id", tag, numHashes = 8, bands = 4, shingleSize = 3)
      val batch = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"),
          concat(col("text"), lit(" ***")).as("text"))
      Dedup.incrementalLsh(batch, "text", "doc_id", s.table(tag),
        numHashes = 8, bands = 4, shingleSize = 3).pairs
    }),

    // the COMPLETE ingest loop as one operator (probe → agreement
    // confirm → accept → append), run twice against one
    // signature-carrying store: batch1 (even ids) dedupes internally
    // and seeds the corpus; batch2 (odd ids) dedupes internally AND
    // drops its cross-batch near-dups of batch-1 survivors via the
    // minhash-agreement screen (≥ ceil(0.5·8) = 4 agreeing slots).
    // Output = (batch, surviving doc_id); the oracle replays BOTH CC
    // rounds (recursive CTEs) and the agreement screen over the
    // replayed signatures. Short docs pre-filtered (the q_d_pipeline
    // convention); their keep-semantics are pinned in DedupSpec.
    "q_d_ingest2" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .filter(TF.wordCount(col("text")) >= 3)
      val tag = s"graft_ingest_store_${ProcessHandle.current.pid}"
      val path = sys.props("java.io.tmpdir") + "/" + tag
      Dedup.writeBandSignatureStore(docs.filter(lit(false)), "text",
        "doc_id", tag, path, buckets = 8, numHashes = 8, bands = 4,
        shingleSize = 3, withSignatures = true)
      val r1 = Dedup.lshIngestBatch(docs.filter(col("doc_id") % 2 === 0),
        "text", "doc_id", tag, numHashes = 8, bands = 4,
        shingleSize = 3, minJaccard = 0.5)
      val r2 = Dedup.lshIngestBatch(docs.filter(col("doc_id") % 2 === 1),
        "text", "doc_id", tag, numHashes = 8, bands = 4,
        shingleSize = 3, minJaccard = 0.5)
      val out = r1.survivors.select(lit(1).as("batch"), col("doc_id"))
        .unionAll(r2.survivors.select(lit(2).as("batch"), col("doc_id")))
      // survivors are eagerly checkpointed inside lshIngestBatch, so
      // the store is droppable NOW (an sf100 shingle-set store is
      // ~8 GB of /tmp — leaking one per run once filled the disk)
      dropStore(s, tag, path)
      out
    }),

    // the EXACT-CONFIRM twin of q_d_ingest2 (round-15 tight-tolerance
    // knob): the store carries sorted hashed shingle sets
    // (withShingleSets = true) and the cross-batch screen is the exact
    // n-gram Jaccard (early-abort merge kernel) instead of the ±1/√k
    // agreement estimator — no decision window around the threshold.
    // The oracle replays the screen as a plain list_intersect Jaccard
    // over the replayed shingle CTEs.
    "q_d_ingest3" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .filter(TF.wordCount(col("text")) >= 3)
      val tag = s"graft_ingest3_store_${ProcessHandle.current.pid}"
      val path = sys.props("java.io.tmpdir") + "/" + tag
      Dedup.writeBandSignatureStore(docs.filter(lit(false)), "text",
        "doc_id", tag, path, buckets = 8, numHashes = 8, bands = 4,
        shingleSize = 3, withShingleSets = true)
      val r1 = Dedup.lshIngestBatch(docs.filter(col("doc_id") % 2 === 0),
        "text", "doc_id", tag, numHashes = 8, bands = 4,
        shingleSize = 3, minJaccard = 0.5, confirm = "exact")
      val r2 = Dedup.lshIngestBatch(docs.filter(col("doc_id") % 2 === 1),
        "text", "doc_id", tag, numHashes = 8, bands = 4,
        shingleSize = 3, minJaccard = 0.5, confirm = "exact")
      val out = r1.survivors.select(lit(1).as("batch"), col("doc_id"))
        .unionAll(r2.survivors.select(lit(2).as("batch"), col("doc_id")))
      // survivors are eagerly checkpointed inside lshIngestBatch, so
      // the store is droppable NOW (an sf100 shingle-set store is
      // ~8 GB of /tmp — leaking one per run once filled the disk)
      dropStore(s, tag, path)
      out
    }),

    // the HYBRID-CONFIRM twin (round-16 two-tier router): the
    // estimator alone decides collided pairs whose agreement falls
    // strictly outside ±0.25 of the threshold (here: agree ≥ 7 → dup,
    // agree < 2 → keep, both without touching a shingle set); only
    // the in-band pairs (2..6 of 8 slots) pay the exact merge kernel.
    // The window is explicit (not the 4/√k default, which at k=8
    // routes everything) so BOTH estimator fast paths and the exact
    // band are exercised against the oracle, which replays the same
    // integer cuts from Dedup.hybridCuts.
    "q_d_ingest4" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .filter(TF.wordCount(col("text")) >= 3)
      val tag = s"graft_ingest4_store_${ProcessHandle.current.pid}"
      val path = sys.props("java.io.tmpdir") + "/" + tag
      Dedup.writeBandSignatureStore(docs.filter(lit(false)), "text",
        "doc_id", tag, path, buckets = 8, numHashes = 8, bands = 4,
        shingleSize = 3, withShingleSets = true)
      val r1 = Dedup.lshIngestBatch(docs.filter(col("doc_id") % 2 === 0),
        "text", "doc_id", tag, numHashes = 8, bands = 4,
        shingleSize = 3, minJaccard = 0.5, confirm = "hybrid",
        hybridWindow = 0.25)
      val r2 = Dedup.lshIngestBatch(docs.filter(col("doc_id") % 2 === 1),
        "text", "doc_id", tag, numHashes = 8, bands = 4,
        shingleSize = 3, minJaccard = 0.5, confirm = "hybrid",
        hybridWindow = 0.25)
      val out = r1.survivors.select(lit(1).as("batch"), col("doc_id"))
        .unionAll(r2.survivors.select(lit(2).as("batch"), col("doc_id")))
      // survivors are eagerly checkpointed inside lshIngestBatch, so
      // the store is droppable NOW (an sf100 shingle-set store is
      // ~8 GB of /tmp — leaking one per run once filled the disk)
      dropStore(s, tag, path)
      out
    }),

    "q_d_minhash" -> ((s, d) =>
      Dedup.minhashSignature(t(s, d, "documents").select("doc_id", "text"),
        "text", numHashes = 4, shingleSize = 3)
        .select("doc_id", "mh_0", "mh_1", "mh_2", "mh_3")),

    "q_d_simhash" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TF.simhash(col("text"), 8).as("simhash"))),

    // 32-bit signatures: 8-bit blocks give 256 bucket values per
    // block, keeping in-bucket pairing subquadratic (16-bit/4-bit
    // blocks measured 84 s at sf0.1 — bucket-space sizing IS the
    // scale knob here)
    "q_d_simdup" -> ((s, d) =>
      Dedup.simhashNearDups(t(s, d, "documents"), "text", "doc_id",
        bits = 32, maxHamming = 3)),

    "q_d_jaccard" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val pairs = docs.select(col("doc_id").as("id_a"),
        (col("doc_id") + 1).as("id_b"))
      Dedup.ngramJaccard(pairs, docs, "text", "doc_id", 3)
        .select(col("id_a"), col("id_b"),
          round(col("jaccard"), 6).as("jaccard"))
    }),

    // one-sided containment for the same adjacent-id candidate pairs:
    // the quote/excerpt signal Jaccard dilutes
    "q_d_containment" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val pairs = docs.select(col("doc_id").as("id_a"),
        (col("doc_id") + 1).as("id_b"))
      Dedup.ngramContainment(pairs, docs, "text", "doc_id", 3)
    }),

    // prefix-filtering exact similarity self-join: recall-1.0 near-dup
    // pairs at Jaccard >= 0.6 (the oracle replays the prefix filter
    // under ITS OWN token order — the final pair set is order-free)
    "q_d_prefix" -> ((s, d) =>
      Dedup.prefixFilterPairs(t(s, d, "documents"), "text", "doc_id", 0.6)
        .select("id_a", "id_b", "jaccard")),

    // PII format screens on constructed payloads (email/url/phone
    // injected per doc so counts and the redaction are exercised);
    // redacted text compared via md5 — byte-for-byte parity
    "q_t_pii" -> ((s, d) => {
      val txt = concat(col("text"), lit(" contact doc"), col("doc_id"),
        lit("@example.com or https://ex.org/p/"), col("doc_id"),
        lit(" tel +1 (555) 000-"), col("doc_id") % 10000)
      t(s, d, "documents")
        .select(col("doc_id"), TF.piiCounts(txt).as("__p"),
          md5(TF.redactPii(txt)).as("red_md5"))
        .select(col("doc_id"), col("__p.n_emails").as("n_emails"),
          col("__p.n_urls").as("n_urls"),
          col("__p.n_phones").as("n_phones"), col("red_md5"))
    }),

    // quantile winsorization (outlier clip between profile and features)
    "q_x_winsor" -> ((s, d) =>
      Profile.winsorize(
        t(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity"),
        "l_quantity", loQ = 0.05, hiQ = 0.95)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity_wins"), 4).as("wins"))),

    // TF-IDF salient terms (rounded BEFORE ranking so ln's last-ulp
    // noise can't decide order — ties break by term in both engines)
    "q_t_tfidf" -> ((s, d) =>
      Tfidf.topTerms(t(s, d, "documents"), "text", "doc_id", k = 3)),

    // BM25 relevance for a fixed 3-term query over the corpus
    "q_t_bm25" -> ((s, d) =>
      Tfidf.bm25(t(s, d, "documents"), "text", "doc_id",
        Seq("spark", "join", "vector"))),

    // Fightin' Words: per-source distinctive terms, corpus-prior
    // log-odds z-scores, top 5 per group
    "q_t_keyterms" -> ((s, d) =>
      Tfidf.distinctiveTerms(t(s, d, "documents"), "text", "source",
        k = 5)),

    // lexical diversity per source: TTR + hapax fraction. Ratios go to
    // integer PPM (round(a/b*1e6) as long) so the cross-engine compare
    // is exact long arithmetic, not low-order double bits.
    "q_t_ttr" -> ((s, d) =>
      Tfidf.lexicalDiversity(t(s, d, "documents"), "text", "source")
        .select(col("grp"), col("n_tokens"), col("n_types"), col("n_hapax"),
          round(col("n_types").cast("double") / col("n_tokens") * 1e6)
            .cast("long").as("ttr_ppm"),
          round(col("n_hapax").cast("double") / col("n_types") * 1e6)
            .cast("long").as("hapax_ppm"))),

    // Zipf rank-frequency slope over the top-1000 terms
    "q_t_zipf" -> ((s, d) =>
      Tfidf.zipfSlope(t(s, d, "documents"), "text", topN = 1000)),

    // daily bounce rate: 1-event sessions / sessions, day of t_start
    "q_e_bounce" -> ((s, d) =>
      Sessionize.sessionStats(
          t(s, d, "events").withColumn("ts_us", expr("ts div 1000")),
          "user_id", "ts_us",
          gapNs = 1800000000L, tiebreak = Seq(col("event_id")))
        .groupBy(expr("t_start div 86400000000").as("day"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1, 1L).otherwise(0L))
            .as("n_bounce"))
        .withColumn("bounce_ppm",
          round(col("n_bounce") / col("n_sessions") * 1e6).cast("long"))),

    // adjacent-bigram collocations: top 20 by PMI at support >= 5
    "q_t_colloc" -> ((s, d) =>
      Tfidf.collocations(t(s, d, "documents"), "text",
        minCount = 5L, k = 20)),

    // unigram LM perplexity filter: trained on the even-doc_id half,
    // scored over everything (odd docs exercise OOV smoothing);
    // per-term log-probs are integer micro-nats so document sums are
    // exact long arithmetic in both engines
    "q_t_lm" -> ((s, d) => {
      val docs = t(s, d, "documents")
      LangModel.scoreDocs(docs, "text", "doc_id",
        LangModel.unigramCounts(docs.filter(col("doc_id") % 2 === 0), "text"))
    }),

    // per-source domain-shift report: cross-entropy of each source
    // under the whole-corpus unigram LM
    "q_t_srcxent" -> ((s, d) => {
      val docs = t(s, d, "documents")
      LangModel.crossEntropyByGroup(docs, "text", "source",
        LangModel.unigramCounts(docs, "text"))
    }),

    // bigram LM with add-one smoothing: seen-pair -> seen-context ->
    // OOV coalesce chain, all log-probs integer micro-nats
    "q_t_lm2" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val train = docs.filter(col("doc_id") % 2 === 0)
      LangModel.scoreDocsBigram(docs, "text", "doc_id",
        LangModel.unigramCounts(train, "text"),
        LangModel.bigramCounts(train, "text"))
    }),

    // stupid-backoff bigram scoring (unnormalized web-scale smoothing)
    "q_t_lm3" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val train = docs.filter(col("doc_id") % 2 === 0)
      LangModel.scoreDocsBackoff(docs, "text", "doc_id",
        LangModel.unigramCounts(train, "text"),
        LangModel.bigramCounts(train, "text"))
    }),

    // the COMPOSED corpus-cleaning pass: screens (length/language/
    // quality/repetition) -> exact dedup -> LSH near-dedup, with
    // per-document drop attribution — both the survivors and the
    // audit report are oracle-checked whole
    "q_t_clean" -> ((s, d) =>
      Corpus.clean(t(s, d, "documents"), "text", "doc_id")
        .kept.select("doc_id")),

    "q_t_cleanreport" -> ((s, d) =>
      Corpus.clean(t(s, d, "documents"), "text", "doc_id")
        .dropReport),

    // substring-level dedup signal (Lee et al.): n-grams shared across
    // docs, and the per-doc span coverage a trim/drop pass acts on
    "q_d_ngramdups" -> ((s, d) =>
      Dedup.duplicatedNgrams(t(s, d, "documents"), "text", "doc_id",
        n = 5, minDocs = 2)),

    "q_d_ngramcov" -> ((s, d) =>
      Dedup.ngramSpanCoverage(t(s, d, "documents"), "text", "doc_id",
        n = 5, minDocs = 2)),

    // the ExactSubstr TRANSFORM the coverage report audits: rebuild
    // text with every cross-doc 5-gram span removed
    "q_d_trimspans" -> ((s, d) =>
      Dedup.trimDuplicatedSpans(t(s, d, "documents"), "text", "doc_id",
        n = 5, minDocs = 2)),

    // ingestion-order novelty: fraction of a doc's 5-grams first seen
    // in this doc (low novelty = recycled content)
    "q_d_novelty" -> ((s, d) =>
      Dedup.ngramNovelty(t(s, d, "documents"), "text", "doc_id", n = 5)),

    // inverted index over the corpus vocabulary (df >= 3); the postings
    // list posexplodes to scalar (pos, posting) rows for the driver gate
    "q_t_postings" -> ((s, d) =>
      Tfidf.postings(t(s, d, "documents"), "text", "doc_id", minDf = 3L)
        .select(col("term"), col("df"), posexplode_outer(col("postings")))
        .filter(col("pos").isNotNull)
        .withColumnRenamed("col", "posting")),

    // benchmark decontamination: per-train-doc n-gram overlap vs a
    // held-out benchmark slice (doc_id % 97 == 0)
    "q_x_decontam" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Decontaminate.overlapReport(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "text", "doc_id", n = 5)
    }),

    // ---- similarity search (embeddings) ----
    "q_s_brute" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
    }),

    // exact label centroids: micro-unit sums, order-independent; the
    // centroid array posexplodes to scalar (pos, value) rows, with +0.0
    // canonicalizing any IEEE -0.0 the per-dim rounding produced
    "q_s_meanpool" -> ((s, d) =>
      Similarity.meanPool(t(s, d, "embeddings"), "embedding", "label")
        .select(col("label"), col("n"), posexplode_outer(col("centroid")))
        .filter(col("pos").isNotNull)
        .select(col("label"), col("n"), col("pos"),
          (col("col") + lit(0.0)).as("value"))),

    // embedding health: per-dimension profile + vector reject census
    "q_s_dimprofile" -> ((s, d) =>
      Similarity.dimProfile(t(s, d, "embeddings"), "embedding")),

    // the one distributed pass PCA needs: exact upper-triangle
    // covariance (micro-int products, one (i,j) aggregation)
    "q_s_cov" -> ((s, d) =>
      Similarity.covarianceMatrix(t(s, d, "embeddings"), "embedding")),

    // diagonal whitening: dims-sized stats collected, map-only apply;
    // the whitened vector posexplodes to scalar (pos, value) rows
    "q_s_whiten" -> ((s, d) =>
      // outer + isNotNull so the size()>0 filter inference can't
      // inline the whitening transform into a per-row filter (it was
      // being evaluated 3x: filter size, filter isnotnull, project)
      Similarity.whiten(t(s, d, "embeddings"), "vec_id", "embedding")
        .select(col("vec_id"), posexplode_outer(col("whitened")))
        .filter(col("pos").isNotNull)
        .withColumnRenamed("col", "value")),

    // corpus outlier census: squared diagonal-Mahalanobis from the
    // whitened vector, per-element micro-int squares -> exact long
    // score, global top-25 via TakeOrdered
    "q_s_outlier" -> ((s, d) =>
      Similarity.outlierScores(t(s, d, "embeddings"), "vec_id",
        "embedding", k = 25)),

    // cluster-balanced prototype sampling: nearest-centroid assign
    // (same seeds as q_s_ivf), keep the 10 most-central per cluster
    "q_s_diverse" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.diverseSample(emb, "vec_id", "embedding",
        Similarity.seedCentroids(emb, "vec_id", "embedding", 8),
        perCluster = 10)
    }),

    "q_s_hygiene" -> ((s, d) =>
      Similarity.vectorHygiene(t(s, d, "embeddings"), "embedding",
        expectedDim = 64)),

    // did the embedding space move: per-label centroid cosine between
    // the even- and odd-id halves of the corpus
    "q_s_centdrift" -> ((s, d) =>
      Similarity.centroidDrift(t(s, d, "embeddings"), "vec_id",
        "embedding", "label", col("vec_id") % 2 === 0)),

    // hybrid retrieval: BM25 lexical top-20 fused with cosine top-20
    // (doc_id ≡ vec_id in the synthetic corpus) via reciprocal-rank
    // fusion, nano-unit integer scores
    "q_s_rrf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // lexical top-20 via TakeOrdered (the BM25 frame is
      // corpus-sized), rank only the 20 survivors
      val lexical = Tfidf.bm25(t(s, d, "documents"), "text", "doc_id",
          Seq("spark", "join", "vector"))
        .orderBy(col("score").desc, col("doc_id")).limit(20)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))))
        .select(col("doc_id").as("id"), col("rank"))
      val emb = t(s, d, "embeddings")
      val vector = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") === 1), "vec_id", "embedding", k = 20)
        .select(col("neighbor_id").as("id"), col("rank"))
      Similarity.rrfFuse(Seq(lexical, vector), "id", "rank",
        k = 60, topN = 10)
    }),

    // embedding-space cluster quality: assign every vector to its
    // nearest label centroid, report the label x assigned confusion
    "q_s_confusion" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val cents = Similarity.meanPool(emb, "embedding", "label")
        .select(col("label").cast("long").as("centroid_id"),
          col("centroid").as("cvec"))
      Similarity.ivfAssign(emb, "vec_id", "embedding", cents)
        .select("vec_id", "centroid_id")
        .join(emb.select("vec_id", "label"), Seq("vec_id"))
        .groupBy(col("label"), col("centroid_id").as("assigned"))
        .agg(count(lit(1)).as("n"))
    }),

    // contrastive hard negatives: top-5 nearest with a DIFFERENT label
    "q_s_hardneg" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", "label", k = 5)
    }),

    "q_s_threshold" -> ((s, d) =>
      Similarity.thresholdPairs(
        t(s, d, "embeddings").filter(col("vec_id") < 200),
        "vec_id", "embedding", minCos = 0.2)),

    "q_s_lsh" -> ((s, d) =>
      t(s, d, "embeddings").select(col("vec_id"),
        Similarity.srpBucket(col("embedding").cast("array<double>"),
          planes = 8, dim = 64).as("bucket"))),

    // full SRP-bucketed ANN path: bucket -> in-bucket exact re-rank
    "q_s_lshpairs" -> ((s, d) =>
      Similarity.lshBucketed(
        t(s, d, "embeddings").filter(col("vec_id") < 300),
        "vec_id", "embedding", minCos = 0.2)),

    // multi-probe SRP: each vector also probes the one-flip buckets,
    // recovering pairs a single hyperplane split
    "q_s_multiprobe" -> ((s, d) =>
      Similarity.lshBucketedMultiProbe(
        t(s, d, "embeddings").filter(col("vec_id") < 300),
        "vec_id", "embedding", minCos = 0.2).pairs),

    // recall accounting for the approximate path: what the SRP buckets
    // cost vs the exact threshold pairs, on the same sample
    "q_s_recall" -> ((s, d) => {
      val emb = t(s, d, "embeddings").filter(col("vec_id") < 300)
      Similarity.recallReport(
        Similarity.lshBucketed(emb, "vec_id", "embedding", minCos = 0.2),
        Similarity.thresholdPairs(emb, "vec_id", "embedding", minCos = 0.2),
        keyCols = Seq("id_a", "id_b"))
    }),

    // the SECOND recall point on the same sample: multi-probe (home
    // bucket + all Hamming-1 neighbors) vs the same exact threshold
    // pairs — quantifies exactly how much recall the probe expansion
    // buys back over q_s_recall's single-bucket number
    "q_s_recall_mp" -> ((s, d) => {
      val emb = t(s, d, "embeddings").filter(col("vec_id") < 300)
      Similarity.recallReport(
        Similarity.lshBucketedMultiProbe(emb, "vec_id", "embedding",
          minCos = 0.2).pairs,
        Similarity.thresholdPairs(emb, "vec_id", "embedding", minCos = 0.2),
        keyCols = Seq("id_a", "id_b"))
    }),

    // second recall point under a TIGHT bucket budget (maxBucket = 5
    // genuinely drops buckets at every driver SF): the recall/cost
    // tradeoff of the capped path, oracle-gated like the FS cap rows
    "q_s_recall_mp2" -> ((s, d) => {
      val emb = t(s, d, "embeddings").filter(col("vec_id") < 300)
      Similarity.recallReport(
        Similarity.lshBucketedMultiProbe(emb, "vec_id", "embedding",
          minCos = 0.2, maxBucket = 5).pairs,
        Similarity.thresholdPairs(emb, "vec_id", "embedding", minCos = 0.2),
        keyCols = Seq("id_a", "id_b"))
    }),

    // PCA under the gate: exact integer-unit covariance (one
    // distributed pass) -> driver power iteration with deflation over
    // the dims^2 matrix (metadata-sized, fixed start + 50 iters =
    // deterministic) -> map-only projection of every vector onto the
    // top-2 components. The oracle replays the identical float-op
    // order as recursive CTEs, so the compare is bit-exact pre-round.
    "q_s_pca" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val cov = Similarity.covarianceMatrix(emb, "embedding")
      val comps = Similarity.pcaComponents(cov, dims = 64, k = 2)
      Similarity.pcaProject(emb, "vec_id", "embedding", comps)
        .select(col("vec_id"),
          (round(col("pc0"), 6) + lit(0.0)).as("pc0"),
          (round(col("pc1"), 6) + lit(0.0)).as("pc1"))
    }),

    // matryoshka truncation audit: top-3 by the FIRST 16 dims vs the
    // full-dim exact top-3 — "how much recall does a 4× cheaper
    // prefix embedding keep" (the MRL storage/latency trade)
    "q_s_mrl" -> ((s, d) => {
      val emb = t(s, d, "embeddings").filter(col("vec_id") < 200)
      val tr = emb.withColumn("emb16", slice(col("embedding"), 1, 16))
      Similarity.recallReport(
        Similarity.bruteForceTopK(tr, tr, "vec_id", "emb16", 3)
          .select("query_id", "neighbor_id"),
        Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 3)
          .select("query_id", "neighbor_id"),
        keyCols = Seq("query_id", "neighbor_id"))
    }),

    // ---- §2.4 distincts ----
    "q_a3_distinct" -> ((s, d) =>
      t(s, d, "events").select("event_type").distinct()),

    "q_a4_droprows" -> ((s, d) =>
      t(s, d, "orders").select("o_orderstatus", "o_orderpriority")
        .dropDuplicates()),

    // ---- §2.7 F6/F7 filename + URL ops ----
    "q_f7_names" -> ((s, d) => {
      val url = concat(lit("s3://bkt-"), col("source"), lit("/data/f"),
        col("doc_id"), lit(".vcf.gz"))
      t(s, d, "documents").select(col("doc_id"),
        CF.vcfToMafName(concat(lit("doc_"), col("doc_id"), lit(".vcf.gz")))
          .as("maf_name"),
        CF.s3Bucket(url).as("bucket"),
        CF.basename(url).as("fname"))
    }),

    // ---- MinHash-LSH candidate pairs (full pipeline) ----
    "q_d_lsh" -> ((s, d) =>
      Dedup.minhashLshPairs(
        t(s, d, "documents").filter(TF.wordCount(col("text")) >= 3),
        "text", "doc_id", numHashes = 8, bands = 4, shingleSize = 3)),

    // end-to-end dedup composition under the clock: LSH candidates ->
    // Jaccard confirm -> connected components -> representatives.
    // No SQL oracle (iterative CC); driver records rows-only — the
    // component stages above are each oracle-checked separately.
    "q_d_pipeline" -> ((s, d) =>
      Dedup.dedupByLshChecked(
        t(s, d, "documents").filter(TF.wordCount(col("text")) >= 3),
        "text", "doc_id", numHashes = 8, bands = 4, shingleSize = 3,
        minJaccard = 0.5).deduped.select("doc_id")),

    // the sibling end-to-end pipelines, oracle-checked whole the same
    // way (pairs stage -> recursive-CTE connected components)
    // 60-bit signature, 4 Manku blocks of 15 bits: the bucket
    // keyspace (4 x 32768) must outnumber the corpus or in-bucket
    // pair work goes quadratic — at 10x SF the old 32-bit/8-bit-block
    // form (keyspace 1024) was 25 s of bucket kernel for 3k dups
    "q_d_pipeline_sim" -> ((s, d) =>
      Dedup.dedupBySimhash(t(s, d, "documents"), "text", "doc_id",
        bits = 60, maxHamming = 3).select("doc_id")),

    // quality-aware representative selection: same 60-bit SimHash
    // clusters as q_d_pipeline_sim, but each cluster keeps its
    // HIGHEST-quality member (integer micro-unit score, ties -> min
    // id) instead of the min id — the form a real pretraining
    // pipeline ships (the best copy survives, not the first-crawled)
    "q_d_keepbest" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val pairs = Dedup.simhashNearDups(docs, "text", "doc_id",
        bits = 60, maxHamming = 3).select("id_a", "id_b")
      Dedup.dedupKeepBest(docs, pairs, "doc_id",
        round(TF.qualityScore(col("text")) * 1e6).cast("long"))
        .select("doc_id")
    }),

    "q_d_pipeline_emb" -> ((s, d) =>
      Dedup.dedupByEmbedding(
        t(s, d, "embeddings").filter(col("vec_id") < 300),
        "vec_id", "embedding", minCos = 0.3, exact = true)
        .select("vec_id")),

    // the designated 100 TB semantic-dedup path under the oracle AND
    // the clock: multi-probe SRP-bucketed ANN pairs (bucket join, not
    // all-pairs) -> connected components -> representatives. The
    // exact=true twin above stays as the correctness baseline.
    "q_d_pipeline_emb_ann" -> ((s, d) =>
      Dedup.dedupByEmbedding(
        t(s, d, "embeddings").filter(col("vec_id") < 300),
        "vec_id", "embedding", minCos = 0.3, exact = false,
        multiProbe = true)
        .select("vec_id")),

    // the EMBEDDING ingest loop (the semantic twin of q_d_ingest2):
    // two batches against one bucket-bucketed SRP vector store —
    // in-batch multi-probe ANN dedup, cross-batch probe of the store
    // (home + Hamming-1 buckets) with the EXACT cosine confirm
    // against the stored vector, accepted survivors appended. The
    // corpus slice is plane-count-appropriate (vec_id < 2000 keeps
    // the fixed 8-plane replay's buckets under the guard at every
    // SF — see planesFor: a grown corpus needs re-planing, which the
    // hardcoded-plane oracle cannot follow). The oracle replays both
    // CC rounds, the multiprobe expansion, and the store probe.
    "q_s_ingest" -> ((s, d) => {
      val emb = t(s, d, "embeddings").filter(col("vec_id") < 2000)
      val tag = s"graft_srp_store_${ProcessHandle.current.pid}"
      val path = sys.props("java.io.tmpdir") + "/" + tag
      Similarity.writeSrpStore(emb.filter(lit(false)), "vec_id",
        "embedding", tag, path, buckets = 8)
      val r1 = Similarity.srpIngestBatch(
        emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
        tag, minCos = 0.3)
      val r2 = Similarity.srpIngestBatch(
        emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
        tag, minCos = 0.3)
      val out = r1.survivors.select(lit(1).as("batch"), col("vec_id"))
        .unionAll(r2.survivors.select(lit(2).as("batch"), col("vec_id")))
      // survivors are eagerly checkpointed inside srpIngestBatch, so
      // the tmp store is droppable NOW (the q_d_ingest* discipline)
      dropStore(s, tag, path)
      out
    }),

    // ---- skew tooling (§4): salted full outer == plain full outer —
    //      the oracle is the unsalted SQL join, so the decomposition
    //      (salted inner + salted anti legs) is hash-checked whole ----
    "q_x_salted" -> ((s, d) => {
      val o = t(s, d, "orders").filter(col("o_orderkey") % 7 === 0)
        .select(col("o_custkey").as("custkey"),
          col("o_orderkey"), col("o_totalprice"))
      val c = t(s, d, "customer")
        .select(col("c_custkey").as("custkey"), col("c_name"))
      Skew.saltedOuterJoin(o, c, Seq("custkey"), numSalts = 8, "full_outer")
        .select("custkey", "o_orderkey", "o_totalprice", "c_name")
    }),

    // ---- deterministic sampling / splitting (training-data ops):
    //      md5-keyed, so re-runs, repartitioning, and appends never
    //      change a row's fate — and the oracle replays the exact set ----
    "q_x_sample" -> ((s, d) =>
      Sampling.hashSample(t(s, d, "orders"), "o_orderkey", 0.25)
        .select("o_orderkey", "o_custkey", "o_totalprice")),

    // weighted sample without replacement (ES keys, longer docs more
    // likely): top-k runs as TakeOrderedAndProject, no global sort
    "q_x_weighted" -> ((s, d) =>
      Sampling.weightedSample(
        t(s, d, "documents")
          .withColumn("wt", length(col("text")).cast("double") + 1.0),
        "doc_id", "wt", k = 100, salt = "ws")
        .select("doc_id")),

    // count-min sketch: build over the lineitem supplier stream,
    // point-estimate every supplier (width 256 forces collisions, so
    // the one-sided overcount is visible and oracle-replayed exactly)
    "q_x_cms" -> ((s, d) =>
      Sketch.estimate(
        Sketch.countMin(t(s, d, "lineitem"), "l_suppkey",
          depth = 4, width = 256),
        t(s, d, "supplier").select(col("s_suppkey")), "s_suppkey",
        depth = 4, width = 256)),

    // KMV distinct-count sketch over the lineitem part keys
    "q_x_kmv" -> ((s, d) =>
      Sketch.kmvEstimate(
        Sketch.kmv(t(s, d, "lineitem"), "l_partkey", k = 256), k = 256)),

    // per-group mergeable distinct sketch: parts per return flag
    "q_x_kmvgrp" -> ((s, d) =>
      Sketch.kmvEstimateGrouped(
        Sketch.kmvGrouped(t(s, d, "lineitem"), "l_returnflag",
          "l_partkey", k = 128), k = 128)),

    // cross-source overlap WITHOUT joining raw data: KMV Jaccard
    // between per-source sketches (the sketch-scale path of
    // q_d_srcoverlap — S^2·k work regardless of corpus size)
    "q_x_kmvjac" -> ((s, d) =>
      Sketch.kmvJaccardGrouped(
        Sketch.kmvGrouped(t(s, d, "documents"), "source", "text",
          k = 128), k = 128)),

    // HyperLogLog registers per market segment (p=9 → 512 registers;
    // integer/string rank arithmetic so the oracle replays every
    // register bit-for-bit — estimates are SketchSpec territory)
    "q_x_hll" -> ((s, d) =>
      Sketch.hllRegisters(t(s, d, "customer"), "c_mktsegment",
        "c_custkey", p = 9)),

    "q_x_split" -> ((s, d) =>
      Sampling.assignSplit(t(s, d, "documents"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "split")),

    // scaling-law plan: nested-subset row/byte totals at 4 rates in
    // ONE scan (lower rates are subsets of higher — same salt)
    "q_x_lcurve" -> ((s, d) =>
      Sampling.learningCurve(
        t(s, d, "documents")
          .withColumn("__w", length(col("text")).cast("long")),
        "doc_id", Seq(0.1, 0.2, 0.4, 0.8), weightCol = Some("__w"))),

    // class-balanced undersample: every language kept at the
    // minority class size, deterministic hash order
    "q_x_balance" -> ((s, d) =>
      Sampling.balanceClasses(t(s, d, "documents"), "doc_id", "lang")),

    // leakage-free split: every source's documents land in ONE split
    // (keyed on the group hash, not the row hash)
    "q_x_groupsplit" -> ((s, d) =>
      Sampling.groupAwareSplit(t(s, d, "documents"), "source",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"))),

    // exact tie-aware ROC AUC: does transaction value predict a
    // purchase? (Mann-Whitney U in exact longs, scalable prefix sum)
    "q_x_auc" -> ((s, d) =>
      Classify.auc(t(s, d, "events"), "value",
        col("event_type") === "purchase")),

    // reliability diagram: the heuristic quality score as a predictor
    // of English documents, 10 equal-width bins
    "q_x_calib" -> ((s, d) =>
      Classify.calibrationBins(
        t(s, d, "documents").select(col("doc_id"), col("lang"),
          TF.qualityScore(col("text")).as("score")),
        "score", col("lang") === "en", bins = 10)),

    // k-anonymity census over (nation, market segment) QIDs
    "q_x_kanon" -> ((s, d) =>
      Validate.kAnonymity(t(s, d, "customer"),
        Seq("c_nationkey", "c_mktsegment"), k = 5)),

    // X9 data core: study coverage checks (matrix sample columns and
    // case-list rosters vs the clinical roster) replayed on parquet —
    // supplier*17 fabricates out-of-roster samples, orders stay inside
    "q_x_study" -> ((s, d) => {
      val clinical = t(s, d, "customer")
        .select(concat(lit("s"), col("c_custkey")).as("sample_id"))
      val matrix = t(s, d, "supplier")
        .select(concat(lit("s"), (col("s_suppkey") * 17)).as("sample_id"))
      val caseList = t(s, d, "orders")
        .select(concat(lit("s"), col("o_custkey")).as("sample_id"))
      StudyValidate.coverageReport(Seq(
        ("matrix_samples_in_clinical", matrix, "sample_id"),
        ("case_list_samples_in_clinical", caseList, "sample_id")),
        clinical, "sample_id")
    }),

    // CBO-stats join cardinality estimate vs ground truth
    "q_x_joinest" -> ((s, d) =>
      Profile.joinSizeEstimate(t(s, d, "orders"), "o_custkey",
        t(s, d, "customer"), "c_custkey")),

    // which cells drive the source×lang dependence (chi² residuals)
    "q_x_residuals" -> ((s, d) =>
      Profile.chiSquareResiduals(t(s, d, "documents"), "source", "lang")),

    // per-feed staleness against the corpus-wide high-water mark
    "q_x_freshness" -> ((s, d) =>
      Profile.freshness(t(s, d, "events"), "event_type", "ts")),

    "q_x_stratified" -> ((s, d) =>
      Sampling.stratifiedSample(t(s, d, "documents"), "doc_id", "source",
        Map("src0" -> 0.9, "src1" -> 0.5), defaultRate = 0.1)
        .select("doc_id", "source")),

    "q_x_reservoir" -> ((s, d) =>
      Sampling.samplePerKey(t(s, d, "events"), Seq("user_id"),
        "event_id", k = 3)
        .select("user_id", "event_id")),

    // deterministic global shuffle (training read order): scalable
    // rank by (hash, id) — oracle is the plain one-window row_number
    "q_x_shuffle" -> ((s, d) =>
      Sampling.deterministicShuffle(t(s, d, "documents"), "doc_id")
        .select("doc_id", "shuffle_rank")),

    // proportional source interleave: integer midpoint-fraction order
    // key, no global window
    "q_x_interleave" -> ((s, d) =>
      Sampling.interleaveByGroup(t(s, d, "documents"), "doc_id", "source")
        .select("doc_id", "source", "rank_in_group", "progress_micro")),

    // bloom-pruned exact joins: the bitset prunes the probe side
    // before its shuffle; FPs are re-checked, so results match the
    // plain semi/anti SQL exactly. Deliberately small filter (2^16
    // bits) so false positives are exercised at test scale.
    "q_x_bloomsemi" -> ((s, d) =>
      BloomJoin.semiJoin(t(s, d, "lineitem"),
        t(s, d, "orders").filter(col("o_totalprice") > 450000.0),
        "l_orderkey", "o_orderkey", numBits = 1 << 16)
        .select("l_orderkey", "l_linenumber")),

    "q_x_bloomanti" -> ((s, d) =>
      BloomJoin.antiJoin(t(s, d, "lineitem"),
        t(s, d, "orders").filter(col("o_totalprice") > 450000.0),
        "l_orderkey", "o_orderkey", numBits = 1 << 16)
        .select("l_orderkey", "l_linenumber")),

    // z-order (Morton) key over two join/filter columns — the layout
    // sort key a clustered write uses for two-column scan pruning
    "q_x_zorder" -> ((s, d) =>
      Layout.withZValue(t(s, d, "lineitem"), "l_partkey", "l_suppkey",
        bits = 8)
        .select("l_orderkey", "l_linenumber", "zval")),

    // incremental merge: upsert a derived extract (modified balances
    // for %7 keys, brand-new %13 keys) into the customer snapshot
    "q_x_upsert" -> ((s, d) => {
      val base = t(s, d, "customer")
      val upd = base.filter(col("c_custkey") % 7 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 1000.0)
        .unionByName(base.filter(col("c_custkey") % 13 === 0)
          .withColumn("c_custkey", col("c_custkey") + 1000000))
      Merge.upsert(base, upd, Seq("c_custkey"))
        .select("c_custkey", "c_acctbal")
    }),

    // CDC diff of the same extract vs the snapshot (plus deletes:
    // the extract omits %11 keys)
    "q_x_cdc" -> ((s, d) => {
      val base = t(s, d, "customer")
      val upd = base.filter(col("c_custkey") % 11 =!= 0)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 7 === 0, col("c_acctbal") + 1000.0)
            .otherwise(col("c_acctbal")))
        .unionByName(base.filter(col("c_custkey") % 13 === 0)
          .withColumn("c_custkey", col("c_custkey") + 1000000))
      Merge.cdcDiff(base, upd, Seq("c_custkey"))
    }),

    // SCD Type-2 dimension build: orders as a per-customer status
    // change log (change compression + validity chain)
    "q_x_scd2" -> ((s, d) =>
      Merge.scd2(
        t(s, d, "orders").select("o_custkey", "o_orderdate", "o_orderkey",
          "o_orderstatus", "o_orderpriority"),
        Seq("o_custkey"), "o_orderdate", tieBreak = Seq("o_orderkey"))
        .select(col("o_custkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("effective_from"),
          col("effective_to"), col("is_current").cast("int").as("is_current"))),

    // incremental aggregate maintenance: yesterday's per-customer
    // (count, cents) state + today's CDC delta == direct recompute
    "q_x_incragg" -> ((s, d) => {
      val o = t(s, d, "orders").withColumn("cents",
        round(col("o_totalprice") * 100).cast("long"))
      val baseAgg = o.filter(col("o_orderkey") % 7 =!= 0)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("sum_v"))
      val delta =
        o.filter(col("o_orderkey") % 7 === 0)
          .select(col("o_custkey"), lit("I").as("op"), col("cents"))
          .unionByName(
            o.filter(col("o_orderkey") % 7 =!= 0 && col("o_orderkey") % 11 === 0)
              .select(col("o_custkey"), lit("D").as("op"), col("cents")))
      Merge.incrementalAgg(baseAgg, delta, Seq("o_custkey"), "cents")
    }),

    // golden-record survivorship over synthetic dup clusters (nulls
    // injected deterministically; fields survive from different
    // members by recency priority)
    "q_x_golden" -> ((s, d) => {
      val c = t(s, d, "customer").select(
        (col("c_custkey") % 500).as("cluster"),
        col("c_custkey"),
        when(col("c_custkey") % 3 === 0, lit(null))
          .otherwise(col("c_name")).as("name"),
        when(col("c_custkey") % 5 === 0, lit(null))
          .otherwise(col("c_acctbal")).as("bal"))
      Merge.goldenRecord(c, "cluster", Seq(col("c_custkey").desc))
    }),

    // declarative expectation suite (one scan for the row rules, one
    // key shuffle per uniqueness rule); in_range is intentionally
    // tight so the report shows real violations
    "q_x_expect" -> ((s, d) =>
      Validate.expectations(t(s, d, "orders"),
        rules = Seq(
          Validate.notNull("o_custkey"),
          Validate.inRange("o_totalprice", 0.0, 1000.0),
          Validate.inSet("o_orderstatus", Seq("O", "F", "P")),
          Validate.matches("o_orderpriority", "^[1-5]-")),
        unique = Seq(("unique(o_orderkey)", Seq("o_orderkey")),
          ("unique(o_custkey)", Seq("o_custkey"))))),

    // per-group z-score feature scaling
    "q_e_zscore" -> ((s, d) =>
      Features.standardize(t(s, d, "events"), Seq("user_id"), "value")
        .select("event_id", "user_id", "value_z")),

    // deterministic oversampling (dataset-mixing ratios: each doc
    // appears floor(2.3)=2 times + once more for a 0.3 hash draw)
    "q_x_oversample" -> ((s, d) =>
      Sampling.oversample(t(s, d, "documents"), "doc_id", factor = 2.3)
        .select("doc_id", "copy")),

    // domain-weighted token-budget mixture: fill each language's
    // token budget in deterministic hash order (grouped two-phase
    // running sum — no per-domain single-task window)
    "q_x_budget" -> ((s, d) =>
      Sampling.tokenBudget(t(s, d, "documents"), "doc_id", "lang",
        "n_chars", Map("en" -> 30000L, "es" -> 10000L),
        defaultBudget = 15000L)
        .select("doc_id", "lang", "n_chars")),

    // token-budget sequence packing (pretraining batch construction):
    // contiguous packs of ~5000 chars in doc_id order, scalable
    // two-phase running sum — oracle is the plain one-window cumsum
    "q_p10_pack" -> ((s, d) =>
      Batching.packByBudget(t(s, d, "documents"), "doc_id", "n_chars",
        budget = 5000L)
        .select("doc_id", "n_chars", "pack")),

    // GPT-style EXACT sequence packing: the corpus as one virtual
    // token stream cut every 512 tokens, docs SPLIT across cuts —
    // one (doc, sequence) span row each
    "q_p11_packexact" -> ((s, d) =>
      Batching.packExact(t(s, d, "documents"), "doc_id", "n_chars",
        seqLen = 512L)),

    // trained bag-of-words language ID: per-lang unigram models learned
    // on the doc_id%10<8 slice, held-out docs argmax-classified in
    // integer micro-nats; output is the confusion matrix
    "q_c_bowlangid" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val train = docs.filter(col("doc_id") % 10 < 8)
      val test = docs.filter(col("doc_id") % 10 >= 8)
      Classify.confusion(
        Classify.classifyBow(test, "text", "doc_id",
          Classify.trainBow(train, "text", "lang")),
        test, "doc_id", "lang")
    }),

    // per-class P/R/F1 of the trained classifier on the held-out
    // split — metrics as single divisions of exact counts
    "q_c_prf" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val train = docs.filter(col("doc_id") % 10 < 8)
      val test = docs.filter(col("doc_id") % 10 >= 8)
      Classify.prfByClass(
        Classify.classifyBow(test, "text", "doc_id",
          Classify.trainBow(train, "text", "lang")),
        test, "doc_id", "lang")
    }),

    // temperature-scaled language mixing (alpha=0.5): rare languages
    // upweighted toward sqrt-proportional shares of a 300-doc target
    "q_x_tempmix" -> ((s, d) =>
      Sampling.temperatureMix(t(s, d, "documents"), "doc_id", "lang",
        alpha = 0.5, targetTotal = 300L)
        .select("doc_id", "lang", "source")),

    // ---- §2.2 P9: deterministic batching — scalable range-partitioned
    //      form (identical output to ntile(10) OVER (ORDER BY ...),
    //      which the oracle uses; no single-task global window) ----
    // batch_total in exact integer cents then ONE division: a double
    // sum is summation-order-sensitive and drifts off the oracle at
    // sf1 magnitudes (~3.7e10) even though it matches at sf<=0.1
    "q_p9_ntile" -> ((s, d) =>
      Batching.ntileByRange(t(s, d, "orders"), "o_orderkey", 10)
        .groupBy("batch")
        .agg(count(lit(1)).as("n"),
          (sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .cast("double") / 100.0).as("batch_total"))),

    // ---- IVF ANN (nProbe = k degrades to exact ⇒ oracle = brute force) ----
    "q_s_ivf" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val centroids = Similarity.seedCentroids(emb, "vec_id", "embedding", 8)
      val assigned = Similarity.ivfAssign(emb, "vec_id", "embedding", centroids)
      Similarity.ivfSearch(assigned, centroids,
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        nProbe = 8, topK = 5)
    }),

    // IVF with one Lloyd refinement pass: refined centroids are the
    // per-dim means of the seed assignment (rounded to 6 dp so the
    // distributed avg's last-ulp partial-aggregation order can't leak
    // into downstream comparisons), then assignment + probed search
    // run against THEM. nProbe < k, so the result genuinely depends on
    // the refined centroids — the oracle replays the whole cascade.
    "q_s_ivf_lloyd" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val seeds = Similarity.seedCentroids(emb, "vec_id", "embedding", 8)
      val refined = Similarity
        .refineCentroids(emb, "vec_id", "embedding", seeds, iterations = 1)
        .select(col("centroid_id"),
          transform(col("cvec"), x => round(x, 6)).as("cvec"))
      val assigned = Similarity.ivfAssign(emb, "vec_id", "embedding", refined)
      Similarity.ivfSearch(assigned, refined,
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        nProbe = 3, topK = 5)
    }),

    // ---- column profiling (validate-before-ingest surface):
    //      all measures for all columns in one aggregation pass ----
    "q_x_profile" -> ((s, d) =>
      Profile.numeric(t(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),

    // the radix order-statistic engine, gated DIRECTLY: a 7-fraction
    // exact ladder over a near-unique column (the shape whose
    // distinct-value buffers sank `percentile`) and a low-cardinality
    // one (duplicate piles exercise the boundary short-circuits),
    // both columns riding the SAME four bounded-state scans;
    // hash-checked against DuckDB's independent quantile_cont
    "q_x_quantiles" -> ((s, d) => {
      import s.implicits._
      val ps = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
      val qs = Quantiles.exactQuantiles(t(s, d, "lineitem"),
        Seq("l_extendedprice" -> ps, "l_quantity" -> ps))
      Seq("l_extendedprice", "l_quantity").flatMap { c =>
        ps.zip(qs(c)).map { case (p, v) => (c, p, v) } }
        .toDF("column", "p", "v")
        .select(col("column"), col("p"), round(col("v"), 6).as("value"))
    }),

    // the 100 TB cheap twin of q_x_profile (HLL distincts +
    // quantile-summary medians: bounded state, ONE scan — no Expand,
    // no exact-percentile value buffer; sf10: 4.7 s vs 14.7 s exact),
    // gated by its ERROR CONTRACT since round 11: the approx estimates
    // are engine-specific, so the row outputs the exact anchors plus
    // two booleans — HLL within the 3σ rsd band, approx median's rank
    // within n/accuracy of n/2 — and the oracle replays the anchors
    // and emits literal TRUEs (the q_s_recall pattern: accuracy
    // accounting is the checkable surface of an approximate operator)
    "q_x_profile_approx" -> ((s, d) =>
      Profile.approxProfileCheck(t(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),

    "q_x_topvalues" -> ((s, d) =>
      Profile.frequentValues(t(s, d, "orders"),
        Seq("o_orderstatus", "o_orderpriority"), k = 3)),

    // ---- PQ: product quantization — the compression half of the
    //      100 TB ANN story (IVF partitions the corpus, PQ shrinks
    //      what each partition stores). Encode is map-only; ADC
    //      scores via integer LUT sums, so the oracle replays the
    //      cascade exactly ----
    "q_s_pq_code" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val cb = Similarity.pqTrain(emb, "vec_id", "embedding",
        m = 4, dim = 64, k = 8)
      Similarity.pqEncode(emb, "vec_id", "embedding", cb)
    }),

    "q_s_pq_adc" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val cb = Similarity.pqTrain(emb, "vec_id", "embedding",
        m = 4, dim = 64, k = 8)
      val codes = Similarity.pqEncode(emb, "vec_id", "embedding", cb)
      Similarity.pqAdcSearch(codes, cb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", m = 4, dim = 64, topK = 5)
    }),

    // the combined IVF-PQ index: probe 3 of 8 cells, ADC-score only
    // their members from PQ codes — the full trillion-row cascade,
    // oracle-replayed end to end
    "q_s_ivfpq" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val cents = Similarity.seedCentroids(emb, "vec_id", "embedding", 8)
      val assigned = Similarity.ivfAssign(emb, "vec_id", "embedding", cents)
      val cb = Similarity.pqTrain(emb, "vec_id", "embedding",
        m = 4, dim = 64, k = 8)
      val codes = Similarity.pqEncode(emb, "vec_id", "embedding", cb)
      Similarity.ivfPqSearch(assigned, codes, cb, cents,
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        m = 4, dim = 64, nProbe = 3, topK = 5)
    }),

    // int8 scalar quantization (8× embedding storage cut; codes are
    // engine-portable because floor(x/s + 0.5) is, unlike round())
    "q_s_quant" -> ((s, d) =>
      Similarity.quantizeInt8(t(s, d, "embeddings"), "embedding", "__q")
        .select(col("vec_id"), round(col("__q.scale"), 6).as("scale"),
          posexplode(col("__q.codes")).as(Seq("pos", "code")))),

    // equi-width histogram + one-pass correlation matrix (profiling)
    // mergeable histogram quantiles: the 100 TB quantile path (bin
    // counts merge by addition; error bounded by one bin width)
    "q_x_histq" -> ((s, d) =>
      Profile.histQuantiles(t(s, d, "lineitem"), "l_extendedprice",
        bins = 64, ps = Seq(0.5, 0.95, 0.99))),

    // the grouped form: per-flag quantiles, per-group bin edges
    "q_x_histqgrp" -> ((s, d) =>
      Profile.histQuantilesByGroup(t(s, d, "lineitem"), "l_returnflag",
        "l_extendedprice", bins = 64, ps = Seq(0.5, 0.95))),

    "q_x_histogram" -> ((s, d) =>
      Profile.histogram(t(s, d, "lineitem"), "l_extendedprice", bins = 20)),

    "q_x_corr" -> ((s, d) =>
      Profile.correlationMatrix(t(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"))),

    // equi-depth (quantile-bounded) histogram of a skewed column
    "q_x_eqdepth" -> ((s, d) =>
      Profile.equiDepthHistogram(t(s, d, "lineitem"),
        "l_extendedprice", bins = 8)),

    // PSI distribution drift between the even- and odd-order halves
    "q_x_psi" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      Profile.psi(li.filter(col("l_orderkey") % 2 === 0),
        li.filter(col("l_orderkey") % 2 === 1),
        "l_extendedprice", bins = 10)
    }),

    // ---- SQL surface (spark.sql over registered views) ----
    // OLAP rollup: per-(flag, status) + per-flag subtotals + grand
    // total in one pass (the partial-aggregation tree Spark plans)
    "q_sql_rollup" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT coalesce(l_returnflag, '<all>') AS flag,
               coalesce(l_linestatus, '<all>') AS status,
               count(*) AS cnt, round(sum(l_quantity), 4) AS sum_qty
               FROM lineitem
               GROUP BY ROLLUP (l_returnflag, l_linestatus)""")
    }),

    // OLAP cube: all four grouping combinations in one pass (Spark
    // plans one Expand + one partial-aggregation tree — no re-scan
    // per grouping set, which is what matters at 100 TB)
    "q_sql_cube" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT coalesce(o_orderstatus, '<all>') AS status,
               coalesce(o_orderpriority, '<all>') AS priority,
               count(*) AS cnt, round(sum(o_totalprice), 2) AS sum_price
               FROM orders
               GROUP BY CUBE (o_orderstatus, o_orderpriority)""")
    }),

    // window-function battery: lag/lead/row_number/running sum per
    // customer. The running sum is sequential in frame order on both
    // engines (identical addition order -> identical IEEE doubles).
    "q_w_funcs" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT o_orderkey, o_custkey,
               row_number()   OVER w AS rn,
               round(coalesce(lag(o_totalprice)  OVER w, 0.0), 2) AS prev_price,
               round(coalesce(lead(o_totalprice) OVER w, 0.0), 2) AS next_price,
               round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS UNBOUNDED PRECEDING), 2) AS run_total
               FROM orders
               WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""")
    }),

    // explicit GROUPING SETS (the cube/rollup generalization: only
    // the two named sets, still one Expand pass)
    "q_sql_gsets" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT coalesce(l_returnflag, '<any>') AS flag,
               coalesce(l_linestatus, '<any>') AS status,
               count(*) AS cnt, round(sum(l_extendedprice), 2) AS sum_price
               FROM lineitem
               GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""")
    }),

    // correlated EXISTS -> semi join under the planner
    "q_sql_exists" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT c_custkey, c_name FROM customer c
               WHERE EXISTS (SELECT 1 FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                   AND o.o_totalprice > 200000)""")
    }),

    // NOT IN subquery -> null-aware anti join (customers who never
    // placed a large order — non-empty at every SF)
    "q_sql_notin" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT c_custkey FROM customer
               WHERE c_custkey NOT IN
                 (SELECT o_custkey FROM orders
                  WHERE o_totalprice > 300000 AND o_custkey IS NOT NULL)""")
    }),

    // calendar RANGE window frame: trailing-30-day spend per customer
    // (exact integer cents; RANGE includes o_orderdate peers)
    "q_sql_frames" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT o_orderkey, o_custkey,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS cents_30d,
               count(*) OVER w AS n_30d
               FROM orders
               WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)""")
    }),

    "q_sql_agg" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_price,
               count(*) AS cnt
               FROM lineitem WHERE l_discount > 0.02
               GROUP BY l_returnflag, l_linestatus""")
    }),

    "q_sql_join3" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT c_mktsegment, o_orderpriority,
               count(*) AS n_items,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
               FROM customer
               JOIN orders ON c_custkey = o_custkey
               JOIN lineitem ON l_orderkey = o_orderkey
               WHERE o_totalprice > 500.0
               GROUP BY c_mktsegment, o_orderpriority""")
    }),

    // five-table chain: region and nation are broadcast tiers, the
    // orders-lineitem spine shuffles once — the join-reorder stressor
    "q_sql_join5" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT r_name, o_orderpriority,
               count(*) AS n_items, sum(l_quantity) AS qty
               FROM region
               JOIN nation ON n_regionkey = r_regionkey
               JOIN customer ON c_nationkey = n_nationkey
               JOIN orders ON o_custkey = c_custkey
               JOIN lineitem ON l_orderkey = o_orderkey
               GROUP BY r_name, o_orderpriority""")
    }),

    // ---- F16: HGVS extraction cascade on constructed payloads ----
    "q_f16_hgvs" -> ((s, d) => {
      val hp = when(col("doc_id") % 3 === 0, lit("Not Reported"))
        .otherwise(concat(lit("p.V"), col("doc_id") % 50, lit("E")))
      val hc = concat(lit("c."), col("doc_id") % 40,
        when(col("doc_id") % 4 === 0, "delACGT")
          .when(col("doc_id") % 4 === 1, "dupGG")
          .when(col("doc_id") % 4 === 2, "insTT")
          .otherwise(">A"))
      val cons = array(
        struct(
          when(col("doc_id") % 5 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("p.V"), col("doc_id") % 7, lit("E")))
            .as("hgvsp"),
          concat(lit("c."), col("doc_id") % 40, lit("del")).as("hgvsc"),
          lit("p.S1").as("hgvspShort"),
          lit("ClassA").as("variantClassification")),
        struct(
          concat(lit("xx p.V"), col("doc_id") % 50, lit("E yy")).as("hgvsp"),
          concat(lit("c."), col("doc_id") % 11, lit(">A")).as("hgvsc"),
          lit("p.S2").as("hgvspShort"),
          lit("ClassB").as("variantClassification")))
      val summ = array(
        struct(
          concat(lit("p.V"), col("doc_id") % 50, lit("E")).as("hgvsp"),
          concat(lit("c."), col("doc_id") % 13, lit(">A")).as("hgvsc"),
          lit("p.SS").as("hgvspShort"),
          lit("ClassS").as("variantClassification")))
      t(s, d, "documents")
        .select(col("doc_id"),
          CF.hgvsExtract(cons, summ, hp, hc).as("__a"))
        .select(col("doc_id"), col("__a.hgvs_short").as("hgvs_short"),
          col("__a.variant_classification").as("variant_classification"))
    }),

    // ---- multimodal binary plumbing ----
    "q_m_binary" -> ((s, d) =>
      MultiModal.decodeStub(
        MultiModal.attachBinary(t(s, d, "documents"), "text"))
        .select(col("doc_id"), col("meta.n_bytes").as("n_bytes"),
          col("meta.width").as("width"), col("meta.height").as("height"))),

    // the full video-shaped pipeline under the gate: decode (stub
    // metadata) -> resize bookkeeping -> every-k frame-sample explode
    "q_m_frames" -> ((s, d) => {
      val dec = MultiModal.decodeStub(
        MultiModal.attachBinary(t(s, d, "documents"), "text"))
        .filter(col("meta.width") > 0 && col("meta.height") > 0)
      val rs = MultiModal.resizeMeta(dec, maxW = 320, maxH = 240)
        .withColumn("n_frames", (col("meta.n_bytes") % 50) + 1)
      MultiModal.frameSample(rs, "n_frames", every = 7)
        .select(col("doc_id"), col("resized.width").as("r_width"),
          col("resized.height").as("r_height"),
          col("resized.scale").as("scale"), col("frame_idx"))
    })
  )

  /** Bench-only rows: timed by `Bench` alongside `queries` but NOT
    * correctness-dumped by `Verify` — each is the BARE form of an
    * approximate operator whose estimate values are engine-specific
    * sketch outputs (HLL / quantile-summary), so no SQL oracle can
    * replay them value-for-value. Their error CONTRACTS are what the
    * oracle-gated twins check (`q_x_profile_approx`,
    * `q_x_drift_approx` — the q_s_recall pattern); these rows exist
    * so the cheap-twin throughput claims (sf10: approx profile 4.7 s
    * vs 18 s exact) are measured, not prose. */
  def benchExtras: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the one-scan HLL + quantile-summary profile — numeric's fully
    // approx form collapses to a single scan (no Expand, no
    // percentile state)
    "q_x_profile_approx_raw" -> ((s, d) =>
      Profile.numeric(t(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        approxDistinct = true, approxMedian = true)),

    // the bare approx drift monitor (two one-scan sketch profiles,
    // no exact anchors) — what q_x_drift_approx gated before r13
    "q_x_drift_approx_raw" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      Profile.drift(
        li.filter(col("l_orderkey") % 2 === 0),
        li.filter(col("l_orderkey") % 2 === 1),
        Seq("l_quantity", "l_extendedprice", "l_discount"),
        approx = true)
    })
  )

  // ---- shared DuckDB oracle fragments (kept in lockstep with the
  //      TextFns/ColumnFns implementations above) ----
  private def h60Sql(x: String): String =
    s"(('0x' || substr(md5($x), 1, 15))::BIGINT)"
  private val P = "1000000007"
  private val toksSql =
    "list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '')"
  /** BM25 pipeline CTEs (shared by q_t_bm25 and the q_s_rrf fusion):
    * ends at `sc` = per-(doc, query-term) partial scores. */
  private lazy val bm25Ctes =
    s"t AS (SELECT doc_id, $toksSql AS tk FROM documents), " +
      "st AS (SELECT count(*) AS nn, sum(len(tk)) * 1.0 / count(*) AS avglen FROM t), " +
      "tf AS (SELECT doc_id, l, term, count(*) AS tf FROM (SELECT doc_id, len(tk) AS l, unnest(tk) AS term FROM t) WHERE term IN ('spark', 'join', 'vector') GROUP BY 1, 2, 3), " +
      "dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), " +
      "sc AS (SELECT doc_id, ln(1.0 + (nn - df + 0.5) / (df + 0.5)) * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * l / avglen)) AS s FROM tf JOIN dfq USING (term) CROSS JOIN st)"

  /** Unrolled 5-step BPE oracle: greedy left-to-right pair merge ==
    * mark (l,r) positions, split runs of CONSECUTIVE marks (only
    * possible when l==r), merge odd run-positions, drop the symbol
    * after each merge. Generated per step so the SQL replays the
    * driver loop exactly. */
  /** Winnowing CTE chain (3-gram hashes, window w=4, rightmost-tie
    * min) ending at `r` = per-window picks; shared by q_t_winnow and
    * the pair-candidate query. */
  private lazy val winnowCtes: String =
    s"t AS (SELECT doc_id, $toksSql AS tk FROM documents), " +
      "h AS (SELECT doc_id, list_transform(CASE WHEN len(tk) < 3 THEN []::VARCHAR[] ELSE list_transform(range(1, len(tk) - 1), i -> array_to_string(list_slice(tk, i, i + 2), ' ')) END, " +
      "x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs FROM t), " +
      "w AS (SELECT doc_id, hs, unnest(CASE WHEN len(hs) = 0 THEN []::BIGINT[] WHEN len(hs) < 4 THEN [0] ELSE range(0, len(hs) - 3) END) AS i FROM h), " +
      "p AS (SELECT doc_id, i, list_slice(hs, i + 1, i + 4) AS win FROM w), " +
      "q AS (SELECT doc_id, i, win, list_min(win) AS fp FROM p), " +
      "r AS (SELECT doc_id, i, fp, list_max(list_transform(range(1, len(win) + 1), j -> CASE WHEN win[j] = fp THEN j ELSE 0 END)) AS jmax FROM q)"

  /** Merge-step count for the BPE oracle queries — matches the k the
    * Spark queries learn. 100 exercises the adaptive local learn loop
    * and the compiled encode kernel well past toy depth. */
  private val bpeK = 100

  /** Merge-step count for the DISTRIBUTED-path BPE oracle row: each
    * step is a driver-coordinated argmax job, so the row stays shallow
    * to keep the bench suite's total honest (the k=100 depth is
    * exercised by the local-path row above; local==distributed parity
    * at depth is pinned by BpeSpec). */
  private val bpeDistK = 12

  private lazy val bpeSql: String = bpeSqlK(bpeK)

  private def bpeSqlK(k: Int): String =
    s"WITH ${bpeCtes(k)} " +
      (1 to k).map(i =>
        s"""SELECT $i AS step, l AS "left", r AS "right", CAST(cnt AS BIGINT) AS cnt FROM b$i""")
        .mkString(" UNION ALL ")

  private def bpeCtes(k: Int): String = {
    val sb = new StringBuilder
    // every w_i is referenced twice (pair counts + position explode);
    // MATERIALIZED stops DuckDB from inlining the subtree into both,
    // which at k=100 compounds into an exponential scan fan-out that
    // exhausts file descriptors before it exhausts patience
    sb.append("w0 AS MATERIALIZED (SELECT term AS w, count(*) AS freq, " +
      s"list_filter(string_split(term, ''), x -> x <> '') AS ss " +
      s"FROM (SELECT unnest($toksSql) AS term FROM documents) GROUP BY 1), ")
    for (i <- 1 to k) {
      val p = s"w${i - 1}"
      sb.append(s"p$i AS (SELECT l, r, sum(freq) AS cnt FROM (SELECT freq, ss[i] AS l, ss[i + 1] AS r FROM (SELECT freq, ss, unnest(range(1, len(ss))) AS i FROM $p)) GROUP BY 1, 2), ")
      sb.append(s"b$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1), ")
      sb.append(s"e$i AS (SELECT w, freq, pos, ss[pos] AS s, ss[pos + 1] AS s2, len(ss) AS n FROM (SELECT w, freq, ss, unnest(range(1, len(ss) + 1)) AS pos FROM $p)), ")
      // LEFT JOIN (not CROSS): when the pair space exhausts before k,
      // b_i is EMPTY and a cross join would wipe the vocabulary; the
      // null-safe mk=false instead carries words through unchanged,
      // matching the learn loop's early stop
      sb.append(s"m$i AS (SELECT e$i.*, coalesce(s = b$i.l AND pos < n AND s2 = b$i.r, false) AS mk FROM e$i LEFT JOIN b$i ON true), ")
      sb.append(s"g$i AS (SELECT *, pos - (CASE WHEN mk THEN row_number() OVER (PARTITION BY w, mk ORDER BY pos) END) AS grp FROM m$i), ")
      sb.append(s"f$i AS (SELECT *, mk AND (row_number() OVER (PARTITION BY w, grp, mk ORDER BY pos) % 2 = 1) AS mg FROM g$i), ")
      sb.append(s"d$i AS (SELECT *, coalesce(lag(mg) OVER (PARTITION BY w ORDER BY pos), false) AS dropped FROM f$i), ")
      sb.append(s"w$i AS MATERIALIZED (SELECT w, max(freq) AS freq, list(CASE WHEN mg THEN s || s2 ELSE s END ORDER BY pos) AS ss FROM d$i WHERE NOT dropped GROUP BY 1), ")
    }
    sb.setLength(sb.length - 2)
    sb.toString
  }

  private val punctSql =
    "CASE WHEN length(text) = 0 THEN 0.0 ELSE length(regexp_replace(text, '[^.,!?;:]', '', 'g'))::DOUBLE / length(text) END"
  /** 3-word shingles of `tk`, distinct. */
  private val shinglesSql =
    "list_distinct(CASE WHEN len(tk) < 3 THEN []::VARCHAR[] ELSE list_transform(range(1, len(tk) - 1), i -> array_to_string(list_slice(tk, i, i + 2), ' ')) END)"
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform($a, (x, i) -> x * $b[i]))"
  /** SimHash over a token-hash list column `hs` — mirrors
    * TextFns.simhash bit votes. */
  private def simhashSql(bits: Int): String =
    (0 until bits).map(j =>
      s"(CASE WHEN list_sum(list_transform(hs, h -> ((h >> $j) & 1) * 2 - 1)) > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")

  /** Connected-components tail shared by the end-to-end dedup
    * oracles: symmetric edges from a `(id_a, id_b)` CTE named
    * `$pairsCte`, min-label propagation to fixpoint via WITH
    * RECURSIVE (the same fixpoint `Dedup.dupClusters` reaches with
    * pointer-jumped iteration), then everything that is NOT a
    * non-representative member of a cluster. Prepend `WITH RECURSIVE`
    * to the full query when splicing this in. */
  /** Connected-components CTEs (recursive min-label propagation) with
    * a name prefix so two independent CC rounds can live in one
    * WITH RECURSIVE (the q_d_ingest2 two-batch replay). Produces
    * `{p}edges`/`{p}cc`/`{p}dropped`; `{p}dropped` holds every id
    * that is NOT its cluster's min. */
  private def ccCtesSql(pairsCte: String, p: String): String =
    s"${p}edges AS (SELECT id_a AS src, id_b AS dst FROM $pairsCte UNION SELECT id_b, id_a FROM $pairsCte), " +
      s"${p}cc AS (SELECT src AS id, src AS lbl FROM ${p}edges UNION SELECT e.dst, ${p}cc.lbl FROM ${p}cc JOIN ${p}edges e ON ${p}cc.id = e.src WHERE ${p}cc.lbl < e.dst), " +
      s"${p}dropped AS (SELECT id FROM (SELECT id, min(lbl) AS c FROM ${p}cc GROUP BY id) WHERE id <> c)"

  private def ccTailSql(pairsCte: String, keepFrom: String,
                        idCol: String): String =
    ccCtesSql(pairsCte, "") + " " +
      s"SELECT $idCol FROM $keepFrom WHERE $idCol NOT IN (SELECT id FROM dropped)"

  /** q_v3_wide's explicit pivot-value list — the cBio
    * one-column-per-sample matrix shape (500 columns here; values are
    * always passed, never inferred). */
  private val widePivotCols: Seq[String] = (0 until 500).map(i => s"p$i")

  /** SRP bucket over a DOUBLE[] column — mirrors Similarity.srpBucket. */
  private def srpBucketSql(v: String): String =
    (0 until 8).map(p =>
      s"(CASE WHEN list_sum(list_transform($v, (x, i) -> x * (((($p * 64 + (i - 1)) * 2654435761) % 1009) - 504))) > 0 THEN ${1L << p} ELSE 0 END)")
      .mkString(" + ")
  private def cosSql(a: String, b: String): String =
    s"round(${cosRawSql(a, b)}, 6)"
  /** Unrounded cosine — for ORDER-BY comparisons that mirror the Spark
    * kernel's unrounded ranking (both engines sum the same arrays in
    * the same sequential order, so the IEEE doubles agree bitwise). */
  private def cosRawSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  /** Squared-L2 over DOUBLE[] — sequential sum mirroring
    * Similarity.l2Hof, so the IEEE doubles agree bitwise. */
  private def l2Sql(a: String, b: String): String =
    s"list_sum(list_transform($a, (x, i) -> (x - $b[i]) * (x - $b[i])))"

  /** PQ shared CTE prefix: 4×16-dim subspace slices, codebook seeded
    * from the 8 lowest-id vectors, per-(vec, sub) nearest-centroid
    * code — mirrors pqTrain(iterations = 0) + pqEncode. */
  private val pqPrefixSql: String =
    "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
      "subs AS (SELECT unnest(range(0, 4)) AS sub), " +
      "seeds AS (SELECT vec_id AS centroid_id, v FROM e ORDER BY vec_id LIMIT 8), " +
      "cb AS (SELECT sub, centroid_id, list_slice(v, sub*16 + 1, sub*16 + 16) AS cvec FROM seeds CROSS JOIN subs), " +
      "sv AS (SELECT vec_id, sub, list_slice(v, sub*16 + 1, sub*16 + 16) AS svec FROM e CROSS JOIN subs), " +
      s"dists AS (SELECT sv.vec_id, sv.sub, cb.centroid_id, ${l2Sql("sv.svec", "cb.cvec")} AS d FROM sv JOIN cb ON sv.sub = cb.sub), " +
      "enc AS (SELECT vec_id, sub, centroid_id AS code FROM (SELECT vec_id, sub, centroid_id, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, centroid_id) AS rn FROM dists) WHERE rn = 1)"

  /** Exact drift replay mirroring Profile.drift's exact form over the
    * lineitem even/odd-orderkey split; with `withContractBooleans` it
    * appends the four literal-TRUE sketch-contract booleans the
    * approxDriftCheck gate computes (Spark side asserts the HLL rsd
    * band and the approx-percentile rank guarantee per side). */
  private def driftOracleSql(withContractBooleans: Boolean): String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    def side(tag: String, pred: String) =
      cols.map { c =>
        s"SELECT '$c' AS column, count($c) AS n_$tag, " +
          s"CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_$tag, " +
          s"count(DISTINCT $c) AS distinct_$tag, " +
          s"round(avg($c), 4) AS mean_$tag, " +
          s"round(quantile_cont($c, 0.5), 6) AS median_$tag " +
          s"FROM lineitem WHERE $pred"
      }.mkString(" UNION ALL ")
    val booleans =
      if (withContractBooleans)
        ", TRUE AS distinct_ok_ref, TRUE AS median_ok_ref" +
          ", TRUE AS distinct_ok_cur, TRUE AS median_ok_cur"
      else ""
    s"WITH r AS (${side("ref", "l_orderkey % 2 = 0")}), " +
      s"c AS (${side("cur", "l_orderkey % 2 = 1")}) " +
      "SELECT r.column, n_ref, null_ref, distinct_ref, mean_ref, median_ref, " +
      "n_cur, null_cur, distinct_cur, mean_cur, median_cur, " +
      "round(mean_cur - mean_ref, 4) AS mean_delta, " +
      "round(median_cur - median_ref, 6) AS median_delta, " +
      "CAST(round((mean_cur - mean_ref) / greatest(abs(mean_ref), 1e-9) * 1e6) AS BIGINT) AS rel_mean_shift_micro" +
      booleans +
      " FROM r JOIN c ON r.column = c.column"
  }

  /** Per-column profile row mirroring Profile.numeric. */
  private def profileColSql(table: String, c: String): String =
    s"SELECT '$c' AS \"column\", count($c) AS n, " +
      s"sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null, " +
      s"count(DISTINCT $c) AS n_distinct, " +
      s"round(min($c)::DOUBLE, 6) AS min_v, round(max($c)::DOUBLE, 6) AS max_v, " +
      s"round(avg($c), 4) AS mean_v, round(quantile_cont($c, 0.5), 6) AS median_v " +
      s"FROM $table"

  /** Shared prefix of the corpus-clean oracles: screens with
    * first-fail attribution (mirrors Corpus.clean's stage CASE), exact
    * dedup, then the q_d_pipeline LSH machinery over the survivors.
    * Splice after WITH RECURSIVE; ends at the `conf` CTE. */
  private val cleanPrefixSql: String = {
    val mh = (0 until 8).map { i =>
      val a = graft.functions.TextFns.minhashA(i)
      val b = graft.functions.TextFns.minhashB(i)
      s"list_min(list_transform(sh, g -> ($a * (${h60Sql("g")} % $P) + $b) % $P)) AS mh_$i"
    }.mkString(", ")
    val bandSelects = (0 until 4).map { bnd =>
      s"SELECT doc_id, $bnd AS band, ${h60Sql(s"mh_${2 * bnd}::VARCHAR || '_' || mh_${2 * bnd + 1}::VARCHAR")} AS bucket FROM sig"
    }.mkString(" UNION ALL ")
    val jac = "CASE WHEN len(list_distinct(list_concat(da.sh, db.sh))) = 0 THEN 0.0 ELSE len(list_intersect(da.sh, db.sh))::DOUBLE / len(list_distinct(list_concat(da.sh, db.sh))) END"
    s"en0 AS (SELECT doc_id, text, $toksSql AS tk FROM documents), " +
      "en1 AS (SELECT doc_id, text, tk, len(tk) AS nw, " +
      "len(list_filter(tk, t -> t IN ('the','a','an','and','or','of','to','in','is','it')))::DOUBLE AS hits, " +
      s"$punctSql AS pr, " +
      "len(list_filter(tk, t -> t IN ('the','and','of','is'))) AS c_en, " +
      "len(list_filter(tk, t -> t IN ('el','la','los','es'))) AS c_es, " +
      "len(list_filter(tk, t -> t IN ('der','die','und','ist'))) AS c_de, " +
      "len(list_filter(tk, t -> t IN ('le','les','est','et'))) AS c_fr, " +
      "CASE WHEN len(tk) = 0 THEN 0.0 ELSE (len(tk) - len(list_distinct(tk)))::DOUBLE / len(tk) END AS dup_frac FROM en0), " +
      "scr AS (SELECT doc_id, text, tk, CASE WHEN nw < 3 OR nw > 100000 THEN 'length' " +
      "WHEN NOT (c_en >= c_es AND c_en >= c_de AND c_en >= c_fr) THEN 'language' " +
      "WHEN round((least(nw / 100.0, 1.0) + least(hits / greatest(nw::DOUBLE, 1.0) * 5.0, 1.0) + (1.0 - least(pr * 5.0, 1.0))) / 3.0, 6) < 0.3 THEN 'quality' " +
      "WHEN dup_frac > 0.5 THEN 'repetition' END AS stage FROM en1), " +
      "ex AS (SELECT doc_id, text, tk FROM scr WHERE stage IS NULL), " +
      "exk AS (SELECT doc_id, text, tk FROM (SELECT ex.*, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM ex) WHERE rn = 1), " +
      s"d AS (SELECT doc_id, $shinglesSql AS sh FROM exk), " +
      s"sig AS (SELECT doc_id, $mh FROM d), bk AS ($bandSelects), " +
      "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id), " +
      s"conf AS (SELECT id_a, id_b FROM cand JOIN d da ON da.doc_id = cand.id_a JOIN d db ON db.doc_id = cand.id_b WHERE $jac >= 0.5)"
  }

  /** 5-gram list of `tk` WITH duplicates and positions preserved —
    * mirrors TextFns.wordShingles(n = 5). */
  private val ngram5Sql =
    "CASE WHEN len(tk) < 5 THEN []::VARCHAR[] ELSE list_transform(range(1, len(tk) - 3), i -> array_to_string(list_slice(tk, i, i + 4), ' ')) END"

  def oracleSql: Map[String, String] = Map(
    "q_t_pii" ->
      ("WITH p AS (SELECT doc_id, text || ' contact doc' || doc_id || '@example.com or https://ex.org/p/' || doc_id || ' tel +1 (555) 000-' || (doc_id % 10000) AS t FROM documents) " +
        "SELECT doc_id, " +
        "len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails, " +
        "len(regexp_extract_all(t, 'https?://[^ \\t\\n]+')) AS n_urls, " +
        "len(regexp_extract_all(t, '\\+[0-9][0-9()\\-. ]{7,}[0-9]')) AS n_phones, " +
        "md5(regexp_replace(regexp_replace(regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), 'https?://[^ \\t\\n]+', '<URL>', 'g'), '\\+[0-9][0-9()\\-. ]{7,}[0-9]', '<PHONE>', 'g')) AS red_md5 FROM p"),

    "q_x_winsor" ->
      ("WITH q AS (SELECT round(quantile_cont(l_quantity, 0.05), 6) AS lo, round(quantile_cont(l_quantity, 0.95), 6) AS hi FROM lineitem) " +
        "SELECT l_orderkey, l_linenumber, round(least(greatest(l_quantity, lo), hi), 4) AS wins FROM lineitem CROSS JOIN q"),

    "q_t_tfidf" ->
      (s"WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM (SELECT doc_id, unnest(tk) AS term FROM t) GROUP BY 1, 2), " +
        "dfq AS (SELECT term, count(*) AS df FROM (SELECT doc_id, unnest(list_distinct(tk)) AS term FROM t) GROUP BY 1), " +
        "n AS (SELECT count(*) AS nn FROM documents), " +
        "sc AS (SELECT doc_id, term, round(tf * (ln((nn + 1)::DOUBLE / (df + 1)) + 1), 4) AS tfidf FROM tf JOIN dfq USING (term) CROSS JOIN n) " +
        "SELECT doc_id, term, tfidf, rank FROM (SELECT sc.*, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank FROM sc) WHERE rank <= 3"),

    "q_t_bm25" ->
      (s"WITH $bm25Ctes " +
        "SELECT doc_id, count(*) AS n_matched, round(sum(s), 6) AS score FROM sc GROUP BY 1"),

    "q_s_rrf" ->
      (s"WITH $bm25Ctes, " +
        "bm AS (SELECT doc_id, round(sum(s), 6) AS score FROM sc GROUP BY 1), " +
        "br AS (SELECT doc_id AS id, row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM bm), " +
        "ce AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "cq AS (SELECT v FROM ce WHERE vec_id = 1), " +
        s"cs AS (SELECT ce.vec_id, ${cosSql("cq.v", "ce.v")} AS cos FROM ce CROSS JOIN cq WHERE ce.vec_id <> 1), " +
        "cr AS (SELECT vec_id AS id, row_number() OVER (ORDER BY cos DESC, vec_id) AS r FROM cs), " +
        "u AS (SELECT id, CAST(round(1e9 / (r + 60)) AS BIGINT) AS c FROM br WHERE r <= 20 " +
        "UNION ALL SELECT id, CAST(round(1e9 / (r + 60)) AS BIGINT) FROM cr WHERE r <= 20), " +
        "f AS (SELECT id, count(*) AS n_lists, CAST(sum(c) AS BIGINT) AS rrf_micro FROM u GROUP BY 1) " +
        "SELECT id, n_lists, rrf_micro, rank FROM (SELECT f.*, row_number() OVER (ORDER BY rrf_micro DESC, id) AS rank FROM f) WHERE rank <= 10"),

    "q_t_lm" ->
      (s"WITH tr AS (SELECT unnest($toksSql) AS term FROM documents WHERE doc_id % 2 = 0), " +
        "cnt AS (SELECT term, count(*) AS c FROM tr GROUP BY 1), " +
        "tot AS (SELECT sum(c) AS n, count(*) AS v FROM cnt), " +
        "lp AS (SELECT term, CAST(round(ln((c + 1)::DOUBLE / (n + v + 1)::DOUBLE) * 1e6) AS BIGINT) AS lpm FROM cnt CROSS JOIN tot), " +
        "oov AS (SELECT CAST(round(ln(1.0 / (n + v + 1)::DOUBLE) * 1e6) AS BIGINT) AS olpm FROM tot), " +
        s"tk AS (SELECT doc_id, unnest($toksSql) AS term FROM documents), " +
        "sc AS (SELECT tk.doc_id, count(*) AS n_tokens, sum(coalesce(lp.lpm, oov.olpm)) AS s FROM tk LEFT JOIN lp USING (term) CROSS JOIN oov GROUP BY 1) " +
        "SELECT d.doc_id, coalesce(sc.n_tokens, 0) AS n_tokens, " +
        "round(sc.s / sc.n_tokens / 1e6, 6) AS avg_logprob, " +
        "round(exp(-(sc.s::DOUBLE) / sc.n_tokens / 1e6), 4) AS ppl " +
        "FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id"),

    "q_t_bpemerges" -> bpeSql,
    "q_t_bpemerges_dist" -> bpeSqlK(bpeDistK),

    "q_t_bpeencode" ->
      (s"WITH ${bpeCtes(bpeK)} " +
        s"SELECT d.doc_id, d.term AS w, (generate_subscripts(wk.ss, 1) - 1)::INT AS pos, unnest(wk.ss) AS piece " +
        s"FROM (SELECT doc_id, unnest($toksSql) AS term FROM documents) d " +
        s"JOIN w$bpeK wk ON d.term = wk.w"),

    "q_t_keyterms" ->
      (s"WITH tok AS (SELECT source AS grp, unnest($toksSql) AS term FROM documents), " +
        "yst AS (SELECT grp, term, count(*) AS yg FROM tok GROUP BY 1, 2), " +
        "yt AS (SELECT term, sum(yg) AS y FROM yst GROUP BY 1), " +
        "ns AS (SELECT grp, sum(yg) AS ng FROM yst GROUP BY 1), " +
        "tot AS (SELECT sum(yg) AS n FROM yst), " +
        "j AS (SELECT yst.grp, yst.term, yg, ng, 100.0 * y / n AS a, y - yg AS yr, n - ng AS nr FROM yst JOIN yt USING (term) JOIN ns USING (grp) CROSS JOIN tot), " +
        "dd AS (SELECT grp, term, yg, a, yr, ln((yg + a) / (ng + 100.0 - yg - a)) - ln((yr + a) / (nr + 100.0 - yr - a)) AS d FROM j), " +
        "sc AS (SELECT grp, term, round(d, 6) AS delta, round(d / sqrt(1.0 / (yg + a) + 1.0 / (yr + a)), 6) AS z FROM dd) " +
        "SELECT grp, term, delta, z, rank FROM (SELECT sc.*, row_number() OVER (PARTITION BY grp ORDER BY z DESC, term) AS rank FROM sc) WHERE rank <= 5"),

    "q_t_srcxent" ->
      (s"WITH tr AS (SELECT unnest($toksSql) AS term FROM documents), " +
        "cnt AS (SELECT term, count(*) AS c FROM tr GROUP BY 1), " +
        "tot AS (SELECT sum(c) AS n, count(*) AS v FROM cnt), " +
        "lp AS (SELECT term, CAST(round(ln((c + 1)::DOUBLE / (n + v + 1)::DOUBLE) * 1e6) AS BIGINT) AS lpm FROM cnt CROSS JOIN tot), " +
        "oov AS (SELECT CAST(round(ln(1.0 / (n + v + 1)::DOUBLE) * 1e6) AS BIGINT) AS olpm FROM tot), " +
        s"tk AS (SELECT source AS grp, unnest($toksSql) AS term FROM documents) " +
        "SELECT grp, count(*) AS n_tokens, " +
        "round(-sum(coalesce(lpm, olpm)) / count(*) / 1e6, 6) AS cross_entropy, " +
        "round(exp(-(sum(coalesce(lpm, olpm))::DOUBLE) / count(*) / 1e6), 4) AS ppl " +
        "FROM tk LEFT JOIN lp USING (term) CROSS JOIN oov GROUP BY 1"),

    "q_t_zipf" ->
      (s"WITH f AS (SELECT term, count(*) AS freq FROM (SELECT unnest($toksSql) AS term FROM documents) GROUP BY 1), " +
        "r AS (SELECT CAST(round(ln(rank) * 1e6) AS BIGINT) AS x, CAST(round(ln(freq) * 1e6) AS BIGINT) AS y FROM (SELECT freq, term, row_number() OVER (ORDER BY freq DESC, term) AS rank FROM f) WHERE rank <= 1000), " +
        "a AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx FROM r) " +
        "SELECT n AS n_terms, " +
        "round((n::DOUBLE * sxy - sx::DOUBLE * sy) / (n::DOUBLE * sxx - sx::DOUBLE * sx), 6) AS slope, " +
        "round((sy::DOUBLE - (n::DOUBLE * sxy - sx::DOUBLE * sy) / (n::DOUBLE * sxx - sx::DOUBLE * sx) * sx) / n / 1e6, 6) AS intercept FROM a"),

    "q_e_bounce" ->
      ("WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsn FROM events), " +
        "g AS (SELECT user_id, event_id, tsn, CASE WHEN tsn - lag(tsn) OVER w IS NULL OR tsn - lag(tsn) OVER w > 1800000000 THEN 1 ELSE 0 END AS ns FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)), " +
        "s AS (SELECT user_id, tsn, sum(ns) OVER (PARTITION BY user_id ORDER BY tsn, event_id ROWS UNBOUNDED PRECEDING) AS session_id FROM g), " +
        "ses AS (SELECT user_id, session_id, count(*) AS n_events, min(tsn) AS t_start FROM s GROUP BY 1, 2) " +
        "SELECT t_start // 86400000000 AS day, count(*) AS n_sessions, " +
        "CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce, " +
        "CAST(round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*) * 1e6) AS BIGINT) AS bounce_ppm " +
        "FROM ses GROUP BY 1"),

    "q_t_ttr" ->
      (s"WITH tc AS (SELECT source AS grp, term, count(*) AS c FROM (SELECT source, unnest($toksSql) AS term FROM documents) GROUP BY 1, 2) " +
        "SELECT grp, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_types, " +
        "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax, " +
        "CAST(round(count(*)::DOUBLE / sum(c) * 1e6) AS BIGINT) AS ttr_ppm, " +
        "CAST(round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*) * 1e6) AS BIGINT) AS hapax_ppm " +
        "FROM tc GROUP BY 1"),

    "q_t_colloc" ->
      (s"WITH t AS (SELECT $toksSql AS tk FROM documents), " +
        "u AS (SELECT term, count(*) AS c FROM (SELECT unnest(tk) AS term FROM t) GROUP BY 1), " +
        "b AS (SELECT p[1] AS w1, p[2] AS w2, count(*) AS c12 FROM (SELECT unnest(list_transform(range(1, len(tk)), i -> [tk[i], tk[i + 1]])) AS p FROM t) GROUP BY 1, 2), " +
        "n1 AS (SELECT sum(c) AS n1 FROM u), n2 AS (SELECT sum(c12) AS n2 FROM b), " +
        "sc AS (SELECT w1, w2, c12, round(ln((c12::DOUBLE / n2) / ((u1.c::DOUBLE / n1) * (u2.c::DOUBLE / n1))), 6) AS pmi " +
        "FROM b JOIN u u1 ON b.w1 = u1.term JOIN u u2 ON b.w2 = u2.term CROSS JOIN n1 CROSS JOIN n2 WHERE c12 >= 5) " +
        "SELECT w1, w2, c12, pmi, rank FROM (SELECT sc.*, row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rank FROM sc) WHERE rank <= 20"),

    "q_t_lm2" ->
      (s"WITH tr AS (SELECT $toksSql AS tk FROM documents WHERE doc_id % 2 = 0), " +
        "uni AS (SELECT term, count(*) AS cu FROM (SELECT unnest(tk) AS term FROM tr) GROUP BY 1), " +
        "vv AS (SELECT count(*) AS v FROM uni), " +
        "trb AS (SELECT unnest(list_transform(range(1, len(tk)), i -> [tk[i], tk[i + 1]])) AS p FROM tr), " +
        "big AS (SELECT p[1] AS w1, p[2] AS w2, count(*) AS cb FROM trb GROUP BY 1, 2), " +
        "ctx AS (SELECT term AS w1, cu + v + 1 AS denom FROM uni CROSS JOIN vv), " +
        "plp AS (SELECT w1, w2, CAST(round(ln((cb + 1)::DOUBLE / denom) * 1e6) AS BIGINT) AS plpm FROM big JOIN ctx USING (w1)), " +
        "clp AS (SELECT w1, CAST(round(ln(1.0 / denom) * 1e6) AS BIGINT) AS clpm FROM ctx), " +
        "oov AS (SELECT CAST(round(ln(1.0 / (v + 1)) * 1e6) AS BIGINT) AS olpm FROM vv), " +
        s"dtk AS (SELECT doc_id, $toksSql AS tk FROM documents), " +
        "dp AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)), i -> [tk[i], tk[i + 1]])) AS p FROM dtk), " +
        "dpw AS (SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM dp), " +
        "sc AS (SELECT doc_id, count(*) AS n_bigrams, sum(coalesce(plpm, clpm, olpm)) AS s FROM dpw LEFT JOIN plp USING (w1, w2) LEFT JOIN clp USING (w1) CROSS JOIN oov GROUP BY 1) " +
        "SELECT d.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams, " +
        "round(sc.s / sc.n_bigrams / 1e6, 6) AS avg_logprob, " +
        "round(exp(-(sc.s::DOUBLE) / sc.n_bigrams / 1e6), 4) AS ppl " +
        "FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id"),

    "q_t_lm3" ->
      (s"WITH tr AS (SELECT $toksSql AS tk FROM documents WHERE doc_id % 2 = 0), " +
        "uni AS (SELECT term, count(*) AS cu FROM (SELECT unnest(tk) AS term FROM tr) GROUP BY 1), " +
        "nn AS (SELECT CAST(sum(cu) AS BIGINT) AS n FROM uni), " +
        "trb AS (SELECT unnest(list_transform(range(1, len(tk)), i -> [tk[i], tk[i + 1]])) AS p FROM tr), " +
        "big AS (SELECT p[1] AS w1, p[2] AS w2, count(*) AS cb FROM trb GROUP BY 1, 2), " +
        "plp AS (SELECT w1, w2, CAST(round(ln(cb::DOUBLE / cu) * 1e6) AS BIGINT) AS plpm FROM big JOIN (SELECT term AS w1, cu FROM uni) u USING (w1)), " +
        "ulp AS (SELECT term AS w2, CAST(round(ln(0.4 * cu / n) * 1e6) AS BIGINT) AS ulpm FROM uni CROSS JOIN nn), " +
        "oov AS (SELECT CAST(round(ln(0.4 / (n + 1)) * 1e6) AS BIGINT) AS olpm FROM nn), " +
        s"dtk AS (SELECT doc_id, $toksSql AS tk FROM documents), " +
        "dp AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)), i -> [tk[i], tk[i + 1]])) AS p FROM dtk), " +
        "dpw AS (SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM dp), " +
        "sc AS (SELECT doc_id, count(*) AS n_bigrams, sum(coalesce(plpm, ulpm, olpm)) AS s FROM dpw LEFT JOIN plp USING (w1, w2) LEFT JOIN ulp USING (w2) CROSS JOIN oov GROUP BY 1) " +
        "SELECT d.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams, " +
        "round(sc.s / sc.n_bigrams / 1e6, 6) AS avg_logprob " +
        "FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id"),

    "q_t_clean" ->
      (s"WITH RECURSIVE $cleanPrefixSql, " +
        ccTailSql("conf", "exk", "doc_id")),

    "q_t_cleanreport" ->
      (s"WITH RECURSIVE $cleanPrefixSql, " +
        "edges AS (SELECT id_a AS src, id_b AS dst FROM conf UNION SELECT id_b, id_a FROM conf), " +
        "cc AS (SELECT src AS id, src AS lbl FROM edges UNION SELECT e.dst, cc.lbl FROM cc JOIN edges e ON cc.id = e.src WHERE cc.lbl < e.dst), " +
        "ccdrop AS (SELECT id FROM (SELECT id, min(lbl) AS c FROM cc GROUP BY id) WHERE id <> c), " +
        "rep AS (SELECT stage, count(*) AS n FROM scr WHERE stage IS NOT NULL GROUP BY 1 " +
        "UNION ALL SELECT 'exact_dup', count(*) FROM ex WHERE doc_id NOT IN (SELECT doc_id FROM exk) " +
        "UNION ALL SELECT 'near_dup', count(*) FROM ccdrop) " +
        "SELECT stage, n FROM rep WHERE n > 0"),

    "q_d_ngramdups" ->
      (s"WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents), " +
        s"g AS (SELECT doc_id, unnest($ngram5Sql) AS g FROM t), " +
        s"h AS (SELECT doc_id, ${h60Sql("g")} AS ngram_hash FROM g) " +
        "SELECT ngram_hash, count(DISTINCT doc_id) AS n_docs, count(*) AS n_total FROM h GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2"),

    "q_x_decontam" ->
      (s"WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents), " +
        s"g AS (SELECT doc_id, unnest($ngram5Sql) AS g FROM t), " +
        s"h AS (SELECT DISTINCT doc_id, ${h60Sql("g")} AS ngram_hash FROM g), " +
        "bench AS (SELECT DISTINCT ngram_hash FROM h WHERE doc_id % 97 = 0), " +
        "tr AS (SELECT doc_id, ngram_hash FROM h WHERE doc_id % 97 <> 0), " +
        "hits AS (SELECT doc_id, count(*) AS n_hits FROM tr JOIN bench USING (ngram_hash) GROUP BY 1), " +
        "tot AS (SELECT doc_id, count(*) AS n_grams FROM tr GROUP BY 1) " +
        "SELECT t.doc_id, coalesce(n_grams, 0) AS n_grams, coalesce(n_hits, 0) AS n_hits, " +
        "round(coalesce(n_hits, 0) / greatest(coalesce(n_grams, 0), 1), 6) AS contamination " +
        "FROM t LEFT JOIN tot USING (doc_id) LEFT JOIN hits USING (doc_id) WHERE t.doc_id % 97 <> 0"),

    "q_d_ngramcov" ->
      (s"WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents), " +
        s"g AS (SELECT doc_id, unnest(ng) AS g, generate_subscripts(ng, 1) AS gpos FROM (SELECT doc_id, $ngram5Sql AS ng FROM t)), " +
        s"h AS (SELECT doc_id, gpos, ${h60Sql("g")} AS ngram_hash FROM g), " +
        "dup AS (SELECT ngram_hash FROM h GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2), " +
        "pos AS (SELECT doc_id, unnest(range(gpos, gpos + 5)) AS p FROM h JOIN dup USING (ngram_hash)), " +
        "cov AS (SELECT doc_id, count(DISTINCT p) AS covered FROM pos GROUP BY 1) " +
        "SELECT t.doc_id, len(tk) AS n_tokens, coalesce(covered, 0) AS covered, CASE WHEN len(tk) = 0 THEN 0.0 ELSE round(coalesce(covered, 0) / len(tk), 6) END AS coverage FROM t LEFT JOIN cov ON t.doc_id = cov.doc_id"),

    "q_d_novelty" ->
      (s"WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents), " +
        s"g AS (SELECT DISTINCT doc_id, ${h60Sql("g")} AS h FROM (SELECT doc_id, unnest($ngram5Sql) AS g FROM t)), " +
        "f AS (SELECT h, min(doc_id) AS first FROM g GROUP BY 1), " +
        "per AS (SELECT doc_id, count(*) AS n_grams, sum(CASE WHEN first = doc_id THEN 1 ELSE 0 END) AS n_novel FROM g JOIN f USING (h) GROUP BY 1) " +
        "SELECT d.doc_id, coalesce(n_grams, 0)::BIGINT AS n_grams, coalesce(n_novel, 0)::BIGINT AS n_novel, " +
        "CASE WHEN coalesce(n_grams, 0) = 0 THEN 0.0 ELSE round(n_novel / n_grams, 6) END AS novelty " +
        "FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id"),

    "q_d_trimspans" ->
      (s"WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents), " +
        s"g AS (SELECT doc_id, unnest(ng) AS g, generate_subscripts(ng, 1) AS gpos FROM (SELECT doc_id, $ngram5Sql AS ng FROM t)), " +
        s"h AS (SELECT doc_id, gpos, ${h60Sql("g")} AS ngram_hash FROM g), " +
        "dup AS (SELECT ngram_hash FROM h GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2), " +
        "pos AS (SELECT doc_id, unnest(range(gpos, gpos + 5)) AS p FROM h JOIN dup USING (ngram_hash)), " +
        "cov AS (SELECT doc_id, count(DISTINCT p) AS nrem, list(DISTINCT p) AS cl FROM pos GROUP BY 1) " +
        "SELECT t.doc_id, len(tk)::BIGINT AS n_tokens, coalesce(nrem, 0)::BIGINT AS n_removed, " +
        "coalesce(array_to_string(list_filter(tk, (x, i) -> cl IS NULL OR NOT list_contains(cl, i)), ' '), '') AS text_clean " +
        "FROM t LEFT JOIN cov ON t.doc_id = cov.doc_id"),

    "q_x_profile" ->
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .map(profileColSql("lineitem", _)).mkString(" UNION ALL "),

    "q_x_quantiles" ->
      (for {
        c <- Seq("l_extendedprice", "l_quantity")
        p <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
      } yield s"SELECT '$c' AS column, $p AS p, " +
        s"round(quantile_cont($c, $p), 6) AS value FROM lineitem")
        .mkString(" UNION ALL "),

    // the approx row is gated on its error contract: exact anchors
    // replayed here, booleans are literal TRUE — Spark computes them
    // from the HLL rsd band / quantile-summary rank guarantee, so a
    // sketch drifting outside its documented bounds hash-mismatches
    "q_x_profile_approx" ->
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .map(c => "SELECT *, TRUE AS distinct_ok, TRUE AS median_ok " +
          s"FROM (${profileColSql("lineitem", c)})")
        .mkString(" UNION ALL "),

    "q_x_topvalues" ->
      ("WITH pairs AS (SELECT 'o_orderstatus' AS \"column\", o_orderstatus::VARCHAR AS value FROM orders UNION ALL SELECT 'o_orderpriority', o_orderpriority::VARCHAR FROM orders), " +
        "c AS (SELECT \"column\", value, count(*) AS cnt FROM pairs GROUP BY 1, 2) " +
        "SELECT \"column\", value, cnt, rank FROM (SELECT c.*, row_number() OVER (PARTITION BY \"column\" ORDER BY cnt DESC, value) AS rank FROM c) WHERE rank <= 3"),

    "q_s_ivfpq" ->
      (s"WITH $pqPrefixSql, " +
        "ivfc AS (SELECT vec_id AS centroid_id, v AS cvec FROM e ORDER BY vec_id LIMIT 8), " +
        s"a0 AS (SELECT vec_id, centroid_id FROM (SELECT e.vec_id, i.centroid_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cosRawSql("e.v", "i.cvec")} DESC, i.centroid_id) AS rn FROM e CROSS JOIN ivfc i) WHERE rn = 1), " +
        "qq AS (SELECT vec_id, v FROM e WHERE vec_id < 10), " +
        s"probes AS (SELECT vec_id AS query_id, centroid_id FROM (SELECT q.vec_id, i.centroid_id, row_number() OVER (PARTITION BY q.vec_id ORDER BY ${cosRawSql("q.v", "i.cvec")} DESC, i.centroid_id) AS rn FROM qq q CROSS JOIN ivfc i) WHERE rn <= 3), " +
        "qs AS (SELECT vec_id AS query_id, sub, list_slice(v, sub*16 + 1, sub*16 + 16) AS qsv FROM qq CROSS JOIN subs), " +
        s"lut AS (SELECT query_id, sub, centroid_id AS code, floor(${l2Sql("qsv", "cvec")} * 1e6)::BIGINT AS d FROM qs JOIN cb USING (sub)), " +
        "cand AS (SELECT p.query_id, a.vec_id FROM probes p JOIN a0 a USING (centroid_id) WHERE p.query_id <> a.vec_id), " +
        "sc AS (SELECT c.query_id, c.vec_id, sum(lut.d)::BIGINT AS adist FROM cand c JOIN enc ON enc.vec_id = c.vec_id JOIN lut ON lut.query_id = c.query_id AND lut.sub = enc.sub AND lut.code = enc.code GROUP BY 1, 2) " +
        "SELECT query_id, vec_id AS neighbor_id, adist, rank FROM (SELECT sc.*, row_number() OVER (PARTITION BY query_id ORDER BY adist, vec_id) AS rank FROM sc) WHERE rank <= 5"),

    "q_s_quant" ->
      ("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "q AS (SELECT vec_id, list_max(list_transform(v, x -> abs(x))) / 127.0 AS s, v FROM e), " +
        "c AS (SELECT vec_id, s, CASE WHEN s = 0 THEN list_transform(v, x -> 0) ELSE list_transform(v, x -> floor(x / s + 0.5)::INT) END AS codes FROM q) " +
        "SELECT vec_id, round(s, 6) AS scale, generate_subscripts(codes, 1) - 1 AS pos, unnest(codes) AS code FROM c"),

    "q_s_pq_code" ->
      s"WITH $pqPrefixSql SELECT vec_id, sub, code FROM enc",

    "q_s_pq_adc" ->
      (s"WITH $pqPrefixSql, " +
        "q AS (SELECT vec_id AS query_id, sub, list_slice(v, sub*16 + 1, sub*16 + 16) AS qs FROM e CROSS JOIN subs WHERE vec_id < 10), " +
        s"lut AS (SELECT query_id, sub, centroid_id AS code, floor(${l2Sql("qs", "cvec")} * 1e6)::BIGINT AS d FROM q JOIN cb USING (sub)), " +
        "sc AS (SELECT lut.query_id, enc.vec_id, sum(lut.d)::BIGINT AS adist FROM enc JOIN lut ON enc.sub = lut.sub AND enc.code = lut.code WHERE lut.query_id <> enc.vec_id GROUP BY 1, 2) " +
        "SELECT query_id, vec_id AS neighbor_id, adist, rank FROM (SELECT sc.*, row_number() OVER (PARTITION BY query_id ORDER BY adist, vec_id) AS rank FROM sc) WHERE rank <= 5"),

    "q_p1_project" ->
      "SELECT p_partkey, p_name AS part_name, upper(p_brand) AS brand FROM part",

    "q_p3_filter_eq" ->
      "SELECT l_linestatus, count(*) AS cnt, round(sum(l_quantity), 4) AS sum_qty FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_linestatus",

    "q_p5_conjunctive" ->
      "SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 1000.0 AND o_orderpriority <> '1-URGENT'",

    "q_p7_semi" ->
      "SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)",

    "q_p8_dupcheck" ->
      "SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey HAVING count(*) > 1",

    "q_j1_interval" ->
      s"WITH genes AS ($genesSql), segs AS ($segsSql) SELECT g_id, s_id, least(g_end, s_end) - greatest(g_start, s_start) AS overlap_len FROM genes JOIN segs USING (chrom) WHERE g_start < s_end AND s_start < g_end AND least(g_end, s_end) - greatest(g_start, s_start) >= 0.5 * (g_end - g_start)",

    "q_j17_reciprocal" ->
      (s"WITH genes AS ($genesSql), segs AS ($segsSql) SELECT g_id, s_id, least(g_end, s_end) - greatest(g_start, s_start) AS overlap_len FROM genes JOIN segs USING (chrom) " +
        "WHERE g_start < s_end AND s_start < g_end " +
        "AND least(g_end, s_end) - greatest(g_start, s_start) >= 0.5 * (g_end - g_start) " +
        "AND least(g_end, s_end) - greatest(g_start, s_start) >= 0.5 * (s_end - s_start)"),

    "q_j2_left" ->
      "SELECT coalesce(c_mktsegment, 'NONE') AS segment, count(*) AS n_orders FROM orders LEFT JOIN customer ON o_custkey = c_custkey GROUP BY 1",

    "q_j3_recon" ->
      "WITH e AS (SELECT l_suppkey, count(*) AS expected_count FROM lineitem GROUP BY l_suppkey), o AS (SELECT l_suppkey, count(*) AS observed_count FROM lineitem WHERE l_discount > 0 GROUP BY l_suppkey) SELECT coalesce(e.l_suppkey, o.l_suppkey) AS l_suppkey, coalesce(expected_count, 0) AS expected_count, coalesce(observed_count, 0) AS observed_count, coalesce(expected_count, 0) <> coalesce(observed_count, 0) AS mismatch FROM e FULL OUTER JOIN o ON e.l_suppkey = o.l_suppkey",

    "q_j4_counts" ->
      ("WITH dump AS (SELECT 't' || (c_nationkey % 5) AS table_name, count(DISTINCT c_mktsegment) AS dump_columns, count(*) AS dump_rows FROM customer GROUP BY 1), " +
        "db AS (SELECT 't' || (s_nationkey % 5) AS table_name, count(DISTINCT s_nationkey) AS db_columns, count(*) AS db_rows FROM supplier GROUP BY 1) " +
        "SELECT dump.table_name, dump_columns, dump_rows, db_columns, db_rows, dump_columns = db_columns AS columns_match, dump_rows = db_rows AS rows_match " +
        "FROM dump JOIN db USING (table_name)"),

    "q_j5_anti" ->
      "SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",

    "q_j7_lookup" ->
      "WITH af AS (SELECT l_partkey, min(l_extendedprice) AS af_val FROM lineitem GROUP BY l_partkey) SELECT p_partkey, round(coalesce(af_val, -1.0), 2) AS vaf FROM part LEFT JOIN af ON p_partkey = l_partkey",

    "q_j6_indicator" ->
      "SELECT o_orderkey, o_custkey, o_totalprice, coalesce(o_custkey IN (SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0), false) AS germline FROM orders",

    "q_j8_merge" ->
      ("WITH t AS (SELECT 'chr' || (o_orderkey % 5) AS CHROM, o_orderkey AS POS, 'A' AS REF, o_orderstatus AS ALT, 'T;PRI=' || o_orderpriority AS INFO, round(o_totalprice, 2) AS QUAL, concat_ws(':', '0/1', o_custkey) AS S1 FROM orders WHERE o_orderkey % 2 = 0), " +
        "n AS (SELECT 'chr' || (o_orderkey % 5) AS CHROM, o_orderkey AS POS, 'A' AS REF, o_orderstatus AS ALT, 'N;PRI=' || o_orderpriority AS INFO, round(o_totalprice, 2) AS QUAL, concat_ws(':', '0/1', o_custkey) AS S1 FROM orders WHERE o_orderkey % 3 = 0) " +
        "SELECT coalesce(t.CHROM, n.CHROM) AS CHROM, coalesce(t.POS, n.POS) AS POS, coalesce(t.REF, n.REF) AS REF, coalesce(t.ALT, n.ALT) AS ALT, " +
        "t.INFO AS tumor_INFO, t.QUAL AS tumor_QUAL, t.S1 AS tumor_S1, " +
        "n.INFO AS normal_INFO, n.QUAL AS normal_QUAL, n.S1 AS normal_S1, " +
        "coalesce(t.INFO, n.INFO) AS INFO, coalesce(t.QUAL, n.QUAL) AS QUAL " +
        "FROM t FULL OUTER JOIN n ON t.CHROM = n.CHROM AND t.POS = n.POS AND t.REF = n.REF AND t.ALT = n.ALT"),

    "q_g4_ft" ->
      ("SELECT event_id, 'GT:DP:FT' AS FORMAT, " +
        "CASE WHEN value > 0.5 THEN 'PASS' ELSE 'q10' END AS FILTER, " +
        "concat_ws(':', '0/1', user_id, CASE WHEN value > 0.5 THEN 'PASS' ELSE 'q10' END) AS S1 FROM events"),

    "q_a8_colbind" ->
      "SELECT c_custkey, upper(c_name) AS uname, round(c_acctbal * 2, 2) AS dbl FROM customer",

    "q_a5_dedup_first" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM (SELECT l_orderkey, l_linenumber, l_quantity, row_number() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC, l_linenumber ASC) AS rn FROM lineitem) WHERE rn = 1",

    "q_a5c_prefer" ->
      "SELECT o_custkey, o_orderkey, o_orderstatus FROM (SELECT o_custkey, o_orderkey, o_orderstatus, row_number() OVER (PARTITION BY o_custkey ORDER BY CASE WHEN o_orderstatus IS NULL OR o_orderstatus = 'O' THEN 1 ELSE 0 END ASC, o_orderdate ASC, o_orderkey ASC) AS rn FROM orders) WHERE rn = 1",

    "q_a7_union" ->
      // sum(BIGINT) is HUGEINT in DuckDB; cast back so the hash matches Spark's LongType
      "SELECT kind, count(*) AS n, sum(id)::BIGINT AS id_sum FROM (SELECT c_custkey AS id, 'customer' AS kind FROM customer UNION ALL SELECT s_suppkey AS id, 'supplier' AS kind FROM supplier) GROUP BY kind",

    "q_a9_except" ->
      "SELECT p_partkey AS k FROM part EXCEPT SELECT l_partkey AS k FROM lineitem",

    "q_v1_pivot" ->
      "SELECT l_suppkey, round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 4) AS \"A\", round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 4) AS \"N\", round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 4) AS \"R\" FROM lineitem GROUP BY l_suppkey",

    "q_v2_pivot_discrete" ->
      "SELECT l_suppkey, CAST(count(CASE WHEN l_returnflag = 'A' THEN 1 END) AS INTEGER) AS \"A\", CAST(count(CASE WHEN l_returnflag = 'N' THEN 1 END) AS INTEGER) AS \"N\", CAST(count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS INTEGER) AS \"R\" FROM lineitem GROUP BY l_suppkey",

    "q_v4_melt" ->
      "SELECT l_suppkey, l_returnflag AS flag, round(sum(l_quantity), 4) AS sum_qty FROM lineitem GROUP BY 1, 2",

    "q_v3_wide" -> {
      val cases = widePivotCols.zipWithIndex.map { case (name, i) =>
        s"round(sum(CASE WHEN l_partkey % 500 = $i THEN l_quantity END), 4) AS $name"
      }.mkString(", ")
      s"SELECT l_suppkey, $cases FROM lineitem GROUP BY l_suppkey"
    },

    "q_f_strings" ->
      "SELECT o_orderkey, string_split(o_orderpriority, '-')[1] AS prio_num, string_split(o_orderpriority, '-')[-1] AS prio_name, 'chr' || CAST(o_orderkey % 5 AS VARCHAR) AS chrom FROM orders",

    "q_f9_gistic" ->
      "SELECT p_partkey, round(log2(p_size / 2.0), 4) AS log2r, CASE WHEN round(log2(p_size / 2.0), 4) > 2.0 THEN 2 WHEN round(log2(p_size / 2.0), 4) > 0.3 THEN 1 WHEN round(log2(p_size / 2.0), 4) < -1.0 THEN -2 WHEN round(log2(p_size / 2.0), 4) < -0.3 THEN -1 ELSE 0 END AS gistic FROM part",

    "q_f14_md5" ->
      "SELECT c_custkey, md5(c_name) AS md5sum, ('0x' || substr(md5(c_name), 1, 15))::BIGINT AS h60 FROM customer",

    "q_g1_explode" ->
      "SELECT vec_id, generate_subscripts(embedding, 1) AS pos, round(CAST(unnest(embedding) AS DOUBLE), 6) AS val FROM embeddings WHERE vec_id < 50",

    "q_g2_pairing" ->
      "SELECT user_id, event_id AS site1_id, event_type AS site1_type, site2_id, site2_type FROM (SELECT user_id, event_id, event_type, row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn, lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS site2_id, lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS site2_type FROM events) WHERE rn % 2 = 1 AND site2_id IS NOT NULL",

    "q_g3_split_explode" ->
      "SELECT token, count(*) AS n FROM (SELECT unnest(string_split(p_name, ' ')) AS token FROM part) GROUP BY token",

    "q_f3_info" ->
      "SELECT event_id, regexp_extract('TYPE=' || event_type || ';UID=' || user_id || ';END', 'UID=([^;]+)', 1)::BIGINT AS uid, 'NA' AS na_case FROM events",

    "q_f5_gtf" ->
      "SELECT p_partkey, p_name AS gene_name FROM part",

    "q_o6_topk" ->
      "SELECT user_id, event_id, value, rnk FROM (SELECT user_id, event_id, value, row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk FROM events) WHERE rnk <= 3",

    "q_o8_topk_ties" ->
      ("SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM " +
        "(SELECT o_orderpriority, o_orderkey, o_totalprice, rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS rnk FROM orders) WHERE rnk <= 3"),

    "q_e_json" ->
      "SELECT json_extract_string(props, '$.k')::BIGINT AS k, count(*) AS n, round(sum(value), 4) AS sum_val FROM events GROUP BY 1",

    "q_e_session" ->
      "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsn FROM events), g AS (SELECT user_id, event_id, tsn, CASE WHEN tsn - lag(tsn) OVER w IS NULL OR tsn - lag(tsn) OVER w > 1800000000 THEN 1 ELSE 0 END AS ns FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)), s AS (SELECT user_id, tsn, sum(ns) OVER (PARTITION BY user_id ORDER BY tsn, event_id ROWS UNBOUNDED PRECEDING) AS session_id FROM g) SELECT user_id, session_id::BIGINT AS session_id, count(*) AS n_events, min(tsn) AS t_start, max(tsn) AS t_end FROM s GROUP BY 1, 2",

    // native session_window splits at diff >= gap (vs sessionStats'
    // strict >); end = last event time + gap
    "q_e_sesswin" ->
      ("WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events), " +
        "g AS (SELECT user_id, event_id, tsu, CASE WHEN tsu - lag(tsu) OVER w IS NULL OR tsu - lag(tsu) OVER w >= 1800000000 THEN 1 ELSE 0 END AS ns FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)), " +
        "s AS (SELECT user_id, tsu, sum(ns) OVER (PARTITION BY user_id ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM g) " +
        "SELECT user_id, min(tsu) AS start_us, max(tsu) + 1800000000 AS end_us, count(*) AS n_events FROM s GROUP BY user_id, sid"),

    "q_e_debounce" ->
      ("SELECT event_id, user_id, event_type FROM (SELECT event_id, user_id, event_type, epoch_ns(ts) AS tsn, lag(epoch_ns(ts)) OVER (PARTITION BY user_id, event_type ORDER BY epoch_ns(ts), event_id) AS prev FROM events) " +
        "WHERE prev IS NULL OR tsn - prev > 60000000000"),

    "q_e_basket" ->
      ("WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tsn FROM events), " +
        "g AS (SELECT user_id, event_id, event_type, tsn, CASE WHEN tsn - lag(tsn) OVER w IS NULL OR tsn - lag(tsn) OVER w > 1800000000 THEN 1 ELSE 0 END AS ns FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)), " +
        "s AS (SELECT user_id, event_type, sum(ns) OVER (PARTITION BY user_id ORDER BY tsn, event_id ROWS UNBOUNDED PRECEDING) AS session_id FROM g), " +
        "bk AS (SELECT DISTINCT user_id::VARCHAR || '#' || session_id::VARCHAR AS basket, event_type AS item FROM s), " +
        "nb AS (SELECT count(DISTINCT basket) AS nb FROM bk), " +
        "si AS (SELECT item, count(*) AS sc FROM bk GROUP BY 1), " +
        "p AS (SELECT a.item AS item_a, b.item AS item_b, count(*) AS support FROM bk a JOIN bk b ON a.basket = b.basket AND a.item < b.item GROUP BY 1, 2 HAVING count(*) >= 2) " +
        "SELECT item_a, item_b, support, " +
        "round(support::DOUBLE / sa.sc, 6) AS conf_a_b, " +
        "round(support::DOUBLE / sb.sc, 6) AS conf_b_a, " +
        "round(support::DOUBLE * nb / (sa.sc::DOUBLE * sb.sc), 6) AS lift " +
        "FROM p JOIN si sa ON p.item_a = sa.item JOIN si sb ON p.item_b = sb.item CROSS JOIN nb"),

    "q_e_paths" ->
      ("WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tsn FROM events), " +
        "g AS (SELECT user_id, event_id, event_type, tsn, CASE WHEN tsn - lag(tsn) OVER w IS NULL OR tsn - lag(tsn) OVER w > 1800000000 THEN 1 ELSE 0 END AS ns FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)), " +
        "s AS (SELECT user_id, event_id, event_type, tsn, sum(ns) OVER (PARTITION BY user_id ORDER BY tsn, event_id ROWS UNBOUNDED PRECEDING) AS session_id FROM g), " +
        "p AS (SELECT user_id, session_id, string_agg(event_type, '>' ORDER BY tsn, event_id) AS path FROM s GROUP BY 1, 2), " +
        "tp AS (SELECT path, count(*) AS n_sessions FROM p GROUP BY 1) " +
        "SELECT path, n_sessions, rank FROM (SELECT tp.*, row_number() OVER (ORDER BY n_sessions DESC, path) AS rank FROM tp) WHERE rank <= 10"),

    "q_e_markov" ->
      ("WITH st AS (SELECT event_type AS src, lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst FROM events), " +
        "c AS (SELECT src, dst, count(*) AS n FROM st WHERE dst IS NOT NULL GROUP BY 1, 2), " +
        "tt AS (SELECT src, dst, n, sum(n) OVER (PARTITION BY src) AS tot FROM c) " +
        "SELECT src, dst, CAST(n AS BIGINT) AS n, CAST(round(n * 1000000.0 / tot) AS BIGINT) AS p_ppm FROM tt"),

    "q_e_hourly" ->
      "SELECT epoch_ns(ts) // 3600000000000 AS hour, event_type, count(*) AS n, round(sum(value), 4) AS sum_val FROM events GROUP BY 1, 2",

    "q_e_decay" ->
      ("SELECT user_id, count(*) AS n, " +
        "round(sum(CAST(round(value * exp(-ln(2) * ((1767225600000000000 - epoch_ns(ts))::DOUBLE) / 604800000000000.0) * 1e6) AS BIGINT))::DOUBLE / 1e6, 4) AS decayed_sum " +
        "FROM events GROUP BY 1"),

    "q_e_ohlc" ->
      ("SELECT epoch_ns(ts) // 3600000000000 AS bucket, event_type, " +
        "min({'t': epoch_ns(ts), 'i': event_id, 'v': value}).v AS open, " +
        "max(value) AS high, min(value) AS low, " +
        "max({'t': epoch_ns(ts), 'i': event_id, 'v': value}).v AS close, " +
        "count(*) AS n FROM events GROUP BY 1, 2"),

    "q_e_funnel" ->
      ("WITH u AS (SELECT DISTINCT user_id FROM events), " +
        "t0 AS (SELECT user_id, min(epoch_ns(ts)) AS t FROM events WHERE event_type = 'view' GROUP BY 1), " +
        "t1 AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t FROM events e JOIN t0 ON e.user_id = t0.user_id WHERE e.event_type = 'click' AND epoch_ns(e.ts) > t0.t GROUP BY 1), " +
        "t2 AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t FROM events e JOIN t1 ON e.user_id = t1.user_id WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > t1.t GROUP BY 1) " +
        "SELECT u.user_id, CASE WHEN t2.t IS NOT NULL THEN 3 WHEN t1.t IS NOT NULL THEN 2 WHEN t0.t IS NOT NULL THEN 1 ELSE 0 END AS steps_completed " +
        "FROM u LEFT JOIN t0 ON u.user_id = t0.user_id LEFT JOIN t1 ON u.user_id = t1.user_id LEFT JOIN t2 ON u.user_id = t2.user_id"),

    "q_e_funnelw" ->
      ("WITH u AS (SELECT DISTINCT user_id FROM events), " +
        "t0 AS (SELECT user_id, min(epoch_ns(ts)) AS t FROM events WHERE event_type = 'view' GROUP BY 1), " +
        "t1 AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t FROM events e JOIN t0 ON e.user_id = t0.user_id WHERE e.event_type = 'click' AND epoch_ns(e.ts) > t0.t AND epoch_ns(e.ts) <= t0.t + 86400000000000 GROUP BY 1), " +
        "t2 AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t FROM events e JOIN t1 ON e.user_id = t1.user_id WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > t1.t AND epoch_ns(e.ts) <= t1.t + 86400000000000 GROUP BY 1) " +
        "SELECT u.user_id, CASE WHEN t2.t IS NOT NULL THEN 3 WHEN t1.t IS NOT NULL THEN 2 WHEN t0.t IS NOT NULL THEN 1 ELSE 0 END AS steps_completed " +
        "FROM u LEFT JOIN t0 ON u.user_id = t0.user_id LEFT JOIN t1 ON u.user_id = t1.user_id LEFT JOIN t2 ON u.user_id = t2.user_id"),

    "q_e_pctl" ->
      "SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50, round(quantile_cont(value, 0.95), 6) AS p95, round(quantile_cont(value, 0.99), 6) AS p99 FROM events GROUP BY 1",

    // bounded-state engine twin of q_e_pctl — same replay
    "q_e_pctl_radix" ->
      "SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50, round(quantile_cont(value, 0.95), 6) AS p95, round(quantile_cont(value, 0.99), 6) AS p99 FROM events GROUP BY 1",

    "q_e_attrib" ->
      ("WITH p AS (SELECT user_id, epoch_ns(ts) AS tsn FROM events WHERE event_type = 'purchase'), " +
        "t AS (SELECT user_id, epoch_ns(ts) AS tsn, max(event_type) AS touch_type FROM events WHERE event_type <> 'purchase' GROUP BY 1, 2), " +
        "j AS (SELECT p.user_id, p.tsn, t.touch_type, t.tsn AS touch_ts FROM p ASOF LEFT JOIN t ON p.user_id = t.user_id AND p.tsn > t.tsn) " +
        "SELECT CASE WHEN touch_ts IS NOT NULL AND tsn - touch_ts <= 604800000000000 THEN touch_type END AS attributed, count(*) AS n_purchases FROM j GROUP BY 1"),

    "q_e_gaps" ->
      ("WITH g AS (SELECT user_id, epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS gap FROM events) " +
        "SELECT user_id, round(quantile_cont(gap, 0.5), 6) AS p50, round(quantile_cont(gap, 0.95), 6) AS p95 FROM g WHERE gap IS NOT NULL GROUP BY 1"),

    "q_e_twap" ->
      ("WITH b AS (SELECT user_id, epoch_ms(ts) AS ms, CAST(round(value * 1e6) AS BIGINT) AS vm, event_id FROM events), " +
        "l AS (SELECT user_id, ms, vm, lead(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS nms FROM b), " +
        "ag AS (SELECT user_id, count(*) AS n_segments, CAST(sum(nms - ms) AS BIGINT) AS span_ms, sum((nms - ms) * vm) AS s FROM l WHERE nms IS NOT NULL GROUP BY 1) " +
        "SELECT user_id, n_segments, span_ms, CASE WHEN span_ms > 0 THEN CAST(round(s::DOUBLE / span_ms) AS BIGINT) END AS twap_micro FROM ag"),

    "q_e_burst" ->
      ("WITH g AS (SELECT user_id, epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS gap FROM events), " +
        "ag AS (SELECT user_id, count(*) AS n_gaps, CAST(sum(gap) AS BIGINT) AS s1, sum(gap * gap) AS s2 FROM g WHERE gap IS NOT NULL GROUP BY 1) " +
        "SELECT user_id, n_gaps, CAST(round(s1::DOUBLE / n_gaps * 1e6) AS BIGINT) AS mean_gap_ms_micro, " +
        "CASE WHEN n_gaps > 1 AND s1 > 0 THEN CAST(round(sqrt((s2::DOUBLE - s1::DOUBLE * s1 / n_gaps) / n_gaps) / (s1::DOUBLE / n_gaps) * 1e6) AS BIGINT) END AS cv_micro FROM ag"),

    // same strict-sequence cascade as q_e_funnel, at ms granularity
    "q_e_steplag" ->
      ("WITH s0 AS (SELECT user_id, min(epoch_ms(ts)) AS t0 FROM events WHERE event_type = 'view' GROUP BY 1), " +
        "s1 AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS t1 FROM events e JOIN s0 USING (user_id) WHERE e.event_type = 'click' AND epoch_ms(e.ts) > t0 GROUP BY 1), " +
        "s2 AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS t2 FROM events e JOIN s1 USING (user_id) WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) > t1 GROUP BY 1), " +
        "l AS (SELECT 'view->click' AS transition, t1 - t0 AS lag_ms FROM s1 JOIN s0 USING (user_id) " +
        "UNION ALL SELECT 'click->purchase', t2 - t1 FROM s2 JOIN s1 USING (user_id)) " +
        "SELECT transition, count(*) AS n_converted, round(quantile_cont(lag_ms, 0.25), 6) AS p25, " +
        "round(quantile_cont(lag_ms, 0.5), 6) AS p50, round(quantile_cont(lag_ms, 0.9), 6) AS p90 FROM l GROUP BY 1"),

    "q_e_newusers" ->
      ("WITH a AS (SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS bucket FROM events), " +
        "f AS (SELECT user_id, min(bucket) AS first FROM a GROUP BY 1) " +
        "SELECT bucket, CAST(sum(CASE WHEN bucket = first THEN 1 ELSE 0 END) AS BIGINT) AS n_new, " +
        "CAST(sum(CASE WHEN bucket <> first THEN 1 ELSE 0 END) AS BIGINT) AS n_returning " +
        "FROM a JOIN f USING (user_id) GROUP BY 1"),

    "q_e_wauhll" ->
      (s"WITH h AS (SELECT epoch_ns(ts) // 86400000000000 AS b, ('0x' || substr(md5('hll' || user_id::VARCHAR), 1, 15))::BIGINT AS hv FROM events WHERE user_id IS NOT NULL), " +
        "rg0 AS (SELECT b, hv // 2251799813685248 AS j, hv % 2251799813685248 AS rem FROM h), " +
        "rg AS (SELECT b, j, CAST(max(CASE WHEN rem = 0 THEN 52 ELSE 52 - length(bin(rem)) END) AS BIGINT) AS r FROM rg0 GROUP BY 1, 2), " +
        "o AS (SELECT DISTINCT b AS bucket FROM rg), " +
        "mg AS (SELECT bucket, j, max(r) AS r FROM (SELECT rg.j, rg.r, rg.b + g.g AS bucket FROM rg CROSS JOIN range(0, 7) g(g)) x JOIN o USING (bucket) GROUP BY 1, 2), " +
        "ag AS (SELECT bucket, count(*) AS n_present, sum(1::BIGINT << (52 - r)::INT) AS s FROM mg GROUP BY 1), " +
        s"es AS (SELECT bucket, n_present, ${Sketch.hllRollNum(9)} / (s + (512 - n_present) * 4503599627370496)::DOUBLE AS raw FROM ag) " +
        "SELECT bucket, n_present, CAST(round((CASE WHEN raw <= 1280.0 AND n_present < 512 THEN 512.0 * ln(512.0 / (512 - n_present)) ELSE raw END) * 1e6) AS BIGINT) AS est_micro FROM es"),

    "q_e_wau" ->
      ("WITH a AS (SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS b FROM events), " +
        "o AS (SELECT DISTINCT b AS bucket FROM a), " +
        "x AS (SELECT a.user_id, a.b + r.g AS bucket FROM a CROSS JOIN range(0, 7) r(g)) " +
        "SELECT bucket, count(DISTINCT user_id) AS n_active FROM x JOIN o USING (bucket) GROUP BY 1"),

    "q_e_theilsen" ->
      ("WITH s AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS d, count(*) AS c FROM events GROUP BY 1, 2), " +
        "sz AS (SELECT event_type, count(*) AS n_points FROM s GROUP BY 1), " +
        "p AS (SELECT a.event_type, (b.c - a.c)::DOUBLE / (b.d - a.d) AS slope FROM s a JOIN s b ON a.event_type = b.event_type AND a.d < b.d JOIN sz ON sz.event_type = a.event_type AND sz.n_points <= 1000), " +
        "ag AS (SELECT event_type, count(*) AS n_pairs, CAST(round(quantile_cont(slope, 0.5) * 1e6) AS BIGINT) AS slope_micro FROM p GROUP BY 1) " +
        "SELECT ag.event_type, n_points, n_pairs, slope_micro FROM ag JOIN sz USING (event_type)"),

    "q_e_ols" ->
      ("WITH s AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS d, count(*) AS c FROM events GROUP BY 1, 2), " +
        "ag AS (SELECT event_type, count(*) AS n, CAST(sum(d) AS BIGINT) AS sx, CAST(sum(c) AS BIGINT) AS sy, CAST(sum(d * c) AS BIGINT) AS sxy, CAST(sum(d * d) AS BIGINT) AS sxx, CAST(sum(c * c) AS BIGINT) AS syy FROM s GROUP BY 1), " +
        "d2 AS (SELECT event_type, n, sx, sy, (n * sxx - sx * sx)::DOUBLE AS dx, (n * syy - sy * sy)::DOUBLE AS dy, (n * sxy - sx * sy)::DOUBLE AS cov FROM ag) " +
        "SELECT event_type, n, " +
        "CASE WHEN dx > 0 THEN CAST(round(cov / dx * 1e6) AS BIGINT) END AS slope_micro, " +
        "CASE WHEN dx > 0 THEN CAST(round((sy::DOUBLE - cov / dx * sx) / n * 1e6) AS BIGINT) END AS intercept_micro, " +
        "CASE WHEN dx > 0 AND dy > 0 THEN CAST(round(cov * cov / (dx * dy) * 1e6) AS BIGINT) END AS r2_micro " +
        "FROM d2"),

    "q_e_ccf" ->
      ("WITH b AS (SELECT epoch_ns(ts) // 3600000000000 AS t, CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x, CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS y FROM events GROUP BY 1), " +
        "j AS (SELECT l.g AS lag, b.x, b2.y FROM b CROSS JOIN range(0, 7) l(g) JOIN b b2 ON b2.t = b.t + l.g), " +
        "ag AS (SELECT lag, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy FROM j GROUP BY 1), " +
        "d2 AS (SELECT lag, n, (n * sxx - sx * sx)::DOUBLE AS dx, (n * syy - sy * sy)::DOUBLE AS dy, (n * sxy - sx * sy)::DOUBLE AS cov FROM ag) " +
        "SELECT lag::INT AS lag, n, CASE WHEN dx > 0 AND dy > 0 THEN CAST(round(cov / sqrt(dx * dy) * 1e6) AS BIGINT) END AS r_micro FROM d2"),

    "q_e_seasonanom" ->
      ("WITH pp AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS period, (epoch_ns(ts) % 86400000000000) // 3600000000000 AS position, count(*) AS c FROM events GROUP BY 1, 2, 3), " +
        "pr AS (SELECT event_type, position, count(*) AS np, CAST(sum(c) AS BIGINT) AS tot, CAST(sum(c * c) AS BIGINT) AS cc FROM pp GROUP BY 1, 2), " +
        "pm AS (SELECT event_type, position, tot::DOUBLE / np AS mn, (cc::DOUBLE - tot::DOUBLE * tot / np) / np AS vr FROM pr), " +
        "r AS (SELECT pp.event_type, pp.period, pp.position, pp.c, CASE WHEN vr > 0 THEN CAST(round((pp.c - mn) / sqrt(vr) * 1000) AS BIGINT) END AS resid_milli FROM pp JOIN pm ON pp.event_type = pm.event_type AND pp.position = pm.position) " +
        "SELECT event_type, period, position, c, resid_milli FROM r WHERE resid_milli IS NOT NULL AND abs(resid_milli) >= 2000"),

    "q_e_seasonal" ->
      ("WITH pp AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS period, (epoch_ns(ts) % 86400000000000) // 3600000000000 AS position, count(*) AS c FROM events GROUP BY 1, 2, 3), " +
        "ag AS (SELECT event_type, position, count(*) AS n_periods, CAST(sum(c) AS BIGINT) AS total, CAST(sum(c * c) AS BIGINT) AS cc FROM pp GROUP BY 1, 2) " +
        "SELECT event_type, position, n_periods, total, " +
        "CAST(round(total::DOUBLE / n_periods * 1e6) AS BIGINT) AS mean_micro, " +
        "CAST(round((cc::DOUBLE - total::DOUBLE * total / n_periods) / n_periods * 1e6) AS BIGINT) AS var_micro " +
        "FROM ag"),

    "q_x_chi2" ->
      ("WITH obs AS (SELECT coalesce(source, '__null__') AS a, coalesce(lang, '__null__') AS b, count(*) AS o FROM documents GROUP BY 1, 2), " +
        "ra AS (SELECT a, sum(o) AS ra FROM obs GROUP BY 1), " +
        "rb AS (SELECT b, sum(o) AS rb FROM obs GROUP BY 1), " +
        "tot AS (SELECT sum(o) AS n, count(DISTINCT a) AS ka, count(DISTINCT b) AS kb FROM obs), " +
        "grid AS (SELECT a, b, ra, rb, coalesce(o, 0) AS o FROM ra CROSS JOIN rb LEFT JOIN obs USING (a, b)), " +
        "t AS (SELECT CAST(round((o - e) * (o - e) / e * 1e6) AS BIGINT) AS tm, n, ka, kb FROM (SELECT o, ra::DOUBLE * rb / n AS e, n, ka, kb FROM grid CROSS JOIN tot)) " +
        "SELECT CAST(max(n) AS BIGINT) AS n, CAST(max((ka - 1) * (kb - 1)) AS BIGINT) AS dof, round(CAST(sum(tm) AS BIGINT)::DOUBLE / 1e6, 6) AS chi2 FROM t"),

    "q_e_prank" ->
      ("SELECT event_id, event_type, CASE WHEN n = 1 THEN 0.0 ELSE round((rk - 1)::DOUBLE / (n - 1), 6) END AS prank FROM " +
        "(SELECT event_id, event_type, row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rk, count(*) OVER (PARTITION BY event_type) AS n FROM events)"),

    "q_e_autocorr" ->
      ("WITH y AS (SELECT event_type, CAST(round(value * 1e3) AS BIGINT) AS y, epoch_ns(ts) AS tsn, event_id FROM events), " +
        "p AS (SELECT event_type, y, lag(y) OVER (PARTITION BY event_type ORDER BY tsn, event_id) AS yl FROM y), " +
        "ag AS (SELECT event_type, count(*) AS n_pairs, CAST(sum(y) AS BIGINT) AS sx, CAST(sum(yl) AS BIGINT) AS sy, CAST(sum(y * yl) AS BIGINT) AS sxy, CAST(sum(y * y) AS BIGINT) AS sxx, CAST(sum(yl * yl) AS BIGINT) AS syy FROM p WHERE yl IS NOT NULL GROUP BY 1) " +
        "SELECT event_type, n_pairs, CASE WHEN n_pairs < 3 OR n_pairs::DOUBLE * sxx - sx::DOUBLE * sx <= 0.0 OR n_pairs::DOUBLE * syy - sy::DOUBLE * sy <= 0.0 THEN NULL " +
        "ELSE round((n_pairs::DOUBLE * sxy - sx::DOUBLE * sy) / sqrt((n_pairs::DOUBLE * sxx - sx::DOUBLE * sx) * (n_pairs::DOUBLE * syy - sy::DOUBLE * sy)), 6) + 0 END AS r1 " +
        "FROM ag"),

    "q_x_target" ->
      ("WITH per AS (SELECT event_type, count(*) AS n, sum(CAST(round(value * 1e6) AS BIGINT)) AS s FROM events GROUP BY 1), " +
        "g AS (SELECT count(*) AS gn, sum(CAST(round(value * 1e6) AS BIGINT)) AS gs FROM events) " +
        "SELECT event_type, n, round((s::DOUBLE + 10.0 * (gs::DOUBLE / gn)) / (n + 10.0) / 1e6, 6) AS enc FROM per CROSS JOIN g"),

    "q_x_embargo" ->
      ("SELECT CASE WHEN epoch_ns(ts) < 1705795200000000000 - 86400000000000 THEN 'train' " +
        "WHEN epoch_ns(ts) > 1705795200000000000 THEN 'test' ELSE 'embargo' END AS split, count(*) AS n " +
        "FROM events GROUP BY 1"),

    "q_e_mad" ->
      ("WITH m AS (SELECT event_type, count(*) AS n, round(quantile_cont(value, 0.5), 6) AS median FROM events GROUP BY 1) " +
        "SELECT e.event_type, max(n)::BIGINT AS n, max(median) AS median, " +
        "round(quantile_cont(abs(value - median), 0.5), 6) AS mad " +
        "FROM events e JOIN m USING (event_type) GROUP BY 1"),

    "q_e_anomaly" ->
      ("WITH q AS (SELECT event_type, round(quantile_cont(value, 0.99), 6) AS p99 FROM events GROUP BY 1) " +
        "SELECT event_id, e.event_type, value FROM events e JOIN q USING (event_type) WHERE value > p99"),

    "q_x_fuzzy" ->
      ("WITH v AS (SELECT p_name AS s, count(*) AS cnt, string_split(p_name, ' ')[1] AS blk FROM part GROUP BY 1) " +
        "SELECT a.s AS s_a, b.s AS s_b, a.cnt * b.cnt AS n_pairs, levenshtein(a.s, b.s) AS dist " +
        "FROM v a JOIN v b ON a.blk = b.blk AND a.s < b.s WHERE levenshtein(a.s, b.s) <= 3"),

    // EXACT quadratic oracle (length-banded) — the engine's q-gram
    // prefix filter must reproduce it pair-for-pair (recall 1.0)
    "q_d_editjoin" ->
      ("WITH v AS (SELECT p_name AS s, count(*) AS cnt FROM part GROUP BY 1) " +
        "SELECT a.s AS s_a, b.s AS s_b, CAST(a.cnt * b.cnt AS BIGINT) AS n_pairs, levenshtein(a.s, b.s) AS dist " +
        "FROM v a JOIN v b ON a.s < b.s AND abs(length(a.s) - length(b.s)) <= 3 WHERE levenshtein(a.s, b.s) <= 3"),

    // single-task global row_number is FINE for the oracle (DuckDB,
    // sf0.01); the engine side must use the range-partitioned index
    "q_d_snm" ->
      ("WITH v AS (SELECT s_suppkey AS id, s_name AS s FROM supplier WHERE s_name IS NOT NULL), " +
        "r AS (SELECT id, s, row_number() OVER (ORDER BY s, id) AS rn FROM v), " +
        "c AS (SELECT a.id AS id_a, b.id AS id_b, a.s AS s_a, b.s AS s_b, b.rn - a.rn AS gap FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn <= 3) " +
        "SELECT id_a, id_b, s_a, s_b, gap, levenshtein(s_a, s_b) AS dist FROM c WHERE levenshtein(s_a, s_b) <= 2"),

    // DuckDB's jaro/jw/damerau builtins are the independent
    // implementations the graft kernels were pinned against
    "q_r_dist" ->
      ("WITH v AS (SELECT DISTINCT p_name AS s_a FROM part), " +
        "w AS (SELECT s_a, lead(s_a) OVER (ORDER BY s_a) AS s_b FROM v) " +
        "SELECT s_a, s_b, " +
        "CAST(round(jaro_similarity(s_a, s_b) * 1e6) AS BIGINT) AS jaro_micro, " +
        "CAST(round(jaro_winkler_similarity(s_a, s_b) * 1e6) AS BIGINT) AS jw_micro, " +
        "damerau_levenshtein(s_a, s_b) AS dl_dist, " +
        "levenshtein(s_a, s_b) AS lev_dist, " +
        "CAST(round((CAST(1.0 AS DOUBLE) - " +
        "levenshtein(array_to_string(list_sort(string_split(s_a, ' ')), ' '), array_to_string(list_sort(string_split(s_b, ' ')), ' '))::DOUBLE / " +
        "greatest(length(array_to_string(list_sort(string_split(s_a, ' ')), ' ')), length(array_to_string(list_sort(string_split(s_b, ' ')), ' ')))::DOUBLE) * 1e6) AS BIGINT) AS toksort_micro " +
        "FROM w WHERE s_b IS NOT NULL"),

    // u = sum(cnt^2)/N^2 (ratio of exact integers), weights in
    // micro-nats; the double subtraction is written as IEEE ops
    // (CAST(1.0 AS DOUBLE) - CAST(0.95 AS DOUBLE)) so both engines
    // compute the identical constant
    "q_r_fs" -> s"WITH $fsOracleCtes SELECT * FROM fs",

    // capped FS: same field/weight CTEs, blocking on digit-count ×
    // segment, pairs only from blocks of <= 12 records
    "q_r_fscapped" ->
      (s"WITH $fsOracleCtes, " +
        "fb AS (SELECT f.*, length(CAST(id AS VARCHAR)) AS bk0 FROM f), " +
        "bs AS (SELECT bk0, bk2, count(*) AS block_n FROM fb GROUP BY 1, 2), " +
        "keep AS (SELECT fb.* FROM fb JOIN bs USING (bk0, bk2) WHERE block_n <= 12) " +
        "SELECT a.id AS id_a, b.id AS id_b, " +
        "CASE WHEN a.f_bal = b.f_bal THEN 1 ELSE 0 END + CASE WHEN a.f_tail = b.f_tail THEN 1 ELSE 0 END + CASE WHEN a.f_mid = b.f_mid THEN 1 ELSE 0 END AS n_agree, " +
        "CASE WHEN a.f_bal = b.f_bal THEN wa_bal ELSE wd_bal END + CASE WHEN a.f_tail = b.f_tail THEN wa_tail ELSE wd_tail END + CASE WHEN a.f_mid = b.f_mid THEN wa_mid ELSE wd_mid END AS score_unats, " +
        "CASE WHEN a.f_bal = b.f_bal THEN 1 ELSE 0 END AS agree_bal, " +
        "CASE WHEN a.f_tail = b.f_tail THEN 1 ELSE 0 END AS agree_tail, " +
        "CASE WHEN a.f_mid = b.f_mid THEN 1 ELSE 0 END AS agree_mid " +
        "FROM keep a JOIN keep b ON a.bk0 = b.bk0 AND a.bk2 = b.bk2 AND a.id < b.id CROSS JOIN w"),

    "q_r_fscap_report" ->
      (s"WITH $fsOracleCtes, " +
        "fb AS (SELECT f.*, length(CAST(id AS VARCHAR)) AS bk0 FROM f), " +
        "bs AS (SELECT bk0, bk2, count(*) AS block_n FROM fb GROUP BY 1, 2) " +
        "SELECT bk0 AS block_digits, bk2 AS block_segment, block_n FROM bs WHERE block_n > 12"),

    // min-label components over the positive-evidence FS edges —
    // the oracle replays the WHOLE pipeline (scoring + clustering)
    "q_r_erclust" ->
      (s"WITH RECURSIVE $fsOracleCtes, " +
        "e AS (SELECT id_a AS src, id_b AS dst FROM fs WHERE score_unats > 0 " +
        "UNION SELECT id_b, id_a FROM fs WHERE score_unats > 0), " +
        "walk(node, lbl) AS (SELECT src, src FROM e UNION SELECT s.dst, w.lbl FROM walk w JOIN e s ON s.src = w.node) " +
        "SELECT node, min(lbl) AS cluster FROM walk GROUP BY 1"),

    "q_g_kcore" -> {
      // MATERIALIZED: each round is referenced 3× by the next — the
      // default inlining would re-expand the whole chain per
      // reference (3^8 scans of orders)
      val rounds = (1 to 8).map { i =>
        s"k$i AS MATERIALIZED (SELECT n FROM (SELECT n, count(*) AS dg FROM (SELECT a AS n FROM e${i - 1} UNION ALL SELECT b AS n FROM e${i - 1}) u GROUP BY 1) d WHERE dg >= 2), " +
          s"e$i AS MATERIALIZED (SELECT pe.a, pe.b FROM e${i - 1} pe JOIN k$i ka ON pe.a = ka.n JOIN k$i kb ON pe.b = kb.n)"
      }.mkString(", ")
      "WITH raw AS (SELECT ('0x' || substr(md5('ka' || o_orderkey::VARCHAR), 1, 8))::BIGINT % 300 AS x, ('0x' || substr(md5('kb' || o_orderkey::VARCHAR), 1, 8))::BIGINT % 300 AS y FROM orders WHERE o_orderkey % 5 = 0), " +
        "e0 AS MATERIALIZED (SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b FROM raw WHERE x <> y), " +
        rounds + " " +
        "SELECT n AS node, count(*) AS core_degree FROM (SELECT a AS n FROM e8 UNION ALL SELECT b AS n FROM e8) f GROUP BY 1 HAVING count(*) >= 2"
    },

    "q_g_triangles" ->
      ("WITH raw AS (SELECT ('0x' || substr(md5('ta' || o_orderkey::VARCHAR), 1, 8))::BIGINT % 150 AS x, ('0x' || substr(md5('tb' || o_orderkey::VARCHAR), 1, 8))::BIGINT % 150 AS y FROM orders), " +
        "c AS (SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b FROM raw WHERE x <> y), " +
        "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM c e1 JOIN c e2 ON e2.a = e1.a AND e2.b > e1.b JOIN c e3 ON e3.a = e1.b AND e3.b = e2.b), " +
        "u AS (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri) " +
        "SELECT node, count(*) AS n_triangles FROM u GROUP BY 1"),

    "q_g_pagerank" -> {
      def hop(prev: String, out: String) =
        s"c_$out AS (SELECT dst, CAST(sum(pr // outdeg) AS BIGINT) AS insum FROM e JOIN d USING (src) JOIN $prev ON $prev.node = e.src GROUP BY 1), " +
          s"$out AS (SELECT node, 150000 + 850000 * coalesce(insum, 0) // 1000000 AS pr FROM n LEFT JOIN c_$out ON node = dst)"
      // MATERIALIZED: e is referenced by every hop CTE — inlined, the
      // 600M-row DISTINCT re-evaluates per reference and DuckDB spilled
      // past the host disk at sf100
      "WITH e AS MATERIALIZED (SELECT DISTINCT l_orderkey % 500 AS src, l_partkey % 500 AS dst FROM lineitem), " +
        "n AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e), " +
        "d AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM e GROUP BY 1), " +
        "p0 AS (SELECT node, 1000000::BIGINT AS pr FROM n), " +
        hop("p0", "p1") + ", " + hop("p1", "p2") + ", " + hop("p2", "p3") + " " +
        "SELECT node, pr FROM p3"
    },

    // same unrolled hops with the restart CASE pinned to the seeds;
    // the engine's overflow-split damping equals the plain
    // (850000·insum) // 1e6 form algebraically
    "q_g_ppr" -> {
      def hop(prev: String, out: String) =
        s"c_$out AS (SELECT dst, CAST(sum(pr // outdeg) AS BIGINT) AS insum FROM e JOIN d USING (src) JOIN $prev ON $prev.node = e.src GROUP BY 1), " +
          s"$out AS (SELECT node, (CASE WHEN node % 97 = 0 THEN 150000 ELSE 0 END) + 850000 * coalesce(insum, 0) // 1000000 AS pr FROM n LEFT JOIN c_$out ON node = dst)"
      // MATERIALIZED: e is referenced by every hop CTE — inlined, the
      // 600M-row DISTINCT re-evaluates per reference and DuckDB spilled
      // past the host disk at sf100
      "WITH e AS MATERIALIZED (SELECT DISTINCT l_orderkey % 500 AS src, l_partkey % 500 AS dst FROM lineitem), " +
        "n AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e), " +
        "d AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM e GROUP BY 1), " +
        "p0 AS (SELECT node, CASE WHEN node % 97 = 0 THEN 1000000::BIGINT ELSE 0::BIGINT END AS pr FROM n), " +
        hop("p0", "p1") + ", " + hop("p1", "p2") + ", " + hop("p2", "p3") + " " +
        "SELECT node, pr FROM p3"
    },

    // independent implementation: recursive-CTE label reachability
    // fixpoint (UNION dedups (node,label) states → terminates); the
    // engine runs pointer-jumped min-label propagation
    "q_g_cc" ->
      ("WITH RECURSIVE raw AS (SELECT ('0x' || substr(md5('ca' || o_orderkey::VARCHAR), 1, 8))::BIGINT % 2000 AS x, ('0x' || substr(md5('cb' || o_orderkey::VARCHAR), 1, 8))::BIGINT % 2000 AS y FROM orders WHERE o_orderkey % 40 = 0), " +
        "sym AS (SELECT x AS src, y AS dst FROM raw WHERE x <> y UNION SELECT y, x FROM raw WHERE x <> y), " +
        "walk(node, lbl) AS (SELECT src, src FROM sym UNION SELECT s.dst, w.lbl FROM walk w JOIN sym s ON s.src = w.node) " +
        "SELECT node, min(lbl) AS component FROM walk GROUP BY 1"),

    "q_g_bfs" ->
      ("WITH RECURSIVE raw AS (SELECT ('0x' || substr(md5('ba' || o_orderkey::VARCHAR), 1, 8))::BIGINT % 500 AS x, ('0x' || substr(md5('bb' || o_orderkey::VARCHAR), 1, 8))::BIGINT % 500 AS y FROM orders WHERE o_orderkey % 10 = 0), " +
        "sym AS (SELECT DISTINCT x AS src, y AS dst FROM raw WHERE x <> y UNION SELECT DISTINCT y, x FROM raw WHERE x <> y), " +
        "seeds AS (SELECT DISTINCT src AS node FROM sym WHERE src % 97 = 0), " +
        "walk(node, d) AS (SELECT node, 0::BIGINT AS d FROM seeds UNION SELECT s.dst, w.d + 1 FROM walk w JOIN sym s ON s.src = w.node WHERE w.d < 3) " +
        "SELECT node, min(d) AS dist FROM walk GROUP BY 1"),

    // synchronous LPA, 3 unrolled rounds; the per-node argmax is
    // ORDER BY c DESC, lbl ASC == Spark's max(struct(cnt, -label))
    "q_g_lpa" -> {
      def round_(prev: String, cnt: String, out: String) =
        s"$cnt AS (SELECT e.b AS node, l.lbl AS lbl, count(*) AS c FROM e JOIN $prev l ON l.node = e.a GROUP BY 1, 2), " +
          s"$out AS (SELECT node, lbl FROM (SELECT node, lbl, row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl ASC) AS rn FROM $cnt) t WHERE rn = 1)"
      "WITH raw AS (SELECT ('0x' || substr(md5('la' || o_orderkey::VARCHAR), 1, 8))::BIGINT % 400 AS x, ('0x' || substr(md5('lb' || o_orderkey::VARCHAR), 1, 8))::BIGINT % 400 AS y FROM orders WHERE o_orderkey % 20 = 0), " +
        "e AS (SELECT DISTINCT a, b FROM (SELECT x AS a, y AS b FROM raw UNION ALL SELECT y AS a, x AS b FROM raw) t WHERE a <> b), " +
        "l0 AS (SELECT DISTINCT a AS node, a AS lbl FROM e), " +
        round_("l0", "c1", "l1") + ", " + round_("l1", "c2", "l2") + ", " +
        round_("l2", "c3", "l3") + " " +
        "SELECT node, lbl AS label FROM l3"
    },

    "q_e_gapfill" ->
      ("WITH h AS (SELECT epoch_ns(ts) // 3600000000000 AS hour, event_type, count(*) AS n FROM events GROUP BY 1, 2), " +
        "r AS (SELECT event_type, unnest(range(min(hour), max(hour) + 1)) AS hour FROM h GROUP BY event_type) " +
        "SELECT r.event_type, r.hour, coalesce(h.n, 0) AS n FROM r LEFT JOIN h ON r.hour = h.hour AND r.event_type = h.event_type"),

    "q_t_pmi" ->
      (s"WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents), " +
        "u AS (SELECT DISTINCT doc_id, term FROM (SELECT doc_id, unnest(tk) AS term FROM t)), " +
        "p AS (SELECT a.term AS term_a, b.term AS term_b, count(*) AS n_ab FROM u a JOIN u b ON a.doc_id = b.doc_id AND a.term < b.term GROUP BY 1, 2 HAVING count(*) >= 5), " +
        "f AS (SELECT term, count(*) AS n_t FROM u GROUP BY 1), " +
        "nn AS (SELECT count(*) AS n FROM documents) " +
        "SELECT term_a, term_b, n_ab, round(ln(n_ab::DOUBLE * n / (fa.n_t * fb.n_t)), 4) AS pmi " +
        "FROM p JOIN f fa ON fa.term = term_a JOIN f fb ON fb.term = term_b CROSS JOIN nn"),

    "q_e_retention" ->
      ("WITH f AS (SELECT user_id, min(epoch_ns(ts) // 604800000000000) AS cohort FROM events GROUP BY 1), " +
        "a AS (SELECT DISTINCT user_id, epoch_ns(ts) // 604800000000000 AS wk FROM events) " +
        "SELECT cohort, wk - cohort AS offset, count(DISTINCT a.user_id) AS n_users FROM a JOIN f ON a.user_id = f.user_id GROUP BY 1, 2"),

    "q_t_chunks" ->
      ("WITH t AS (SELECT doc_id, text, length(text)::BIGINT AS len FROM documents WHERE length(text) > 0), " +
        "c AS (SELECT doc_id, text, unnest(range(0, greatest(1, (len - 20 + 59) // 60))) AS chunk_id FROM t) " +
        "SELECT doc_id, chunk_id, chunk_id * 60 AS chunk_start, substring(text, (chunk_id * 60 + 1)::INT, 80) AS chunk FROM c"),

    "q_t_postings" ->
      (s"WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents), " +
        "u AS (SELECT DISTINCT doc_id, term FROM (SELECT doc_id, unnest(tk) AS term FROM t)), " +
        "f AS (SELECT term, count(*) AS df FROM u GROUP BY 1 HAVING count(*) >= 3) " +
        "SELECT u.term, f.df, (row_number() OVER (PARTITION BY u.term ORDER BY u.doc_id) - 1)::INT AS pos, u.doc_id AS posting FROM u JOIN f USING (term)"),

    "q_j9_asof" ->
      "SELECT l.event_id, l.user_id, r.event_id AS r_event_id, r.value AS r_value FROM (SELECT user_id, ts, event_id FROM events WHERE event_id % 2 = 0) l ASOF LEFT JOIN (SELECT user_id, ts, event_id, value FROM events WHERE event_id % 2 = 1) r ON l.user_id = r.user_id AND l.ts >= r.ts",

    "q_j16_asof_fwd" ->
      "SELECT l.event_id, l.user_id, r.event_id AS r_event_id, r.value AS r_value FROM (SELECT user_id, ts, event_id FROM events WHERE event_id % 2 = 0) l ASOF LEFT JOIN (SELECT user_id, ts, event_id, value FROM events WHERE event_id % 2 = 1) r ON l.user_id = r.user_id AND l.ts <= r.ts",

    "q_j9_asof_br" -> asofBrOracleSql(">="),

    "q_j16_asof_fwd_br" -> asofBrOracleSql("<="),

    // island chain + lead(): gaps between covered runs
    "q_j14_complement" ->
      (s"WITH iv AS ($segsSql), " +
        "o AS (SELECT chrom, s_start, s_end, max(s_end) OVER (PARTITION BY chrom ORDER BY s_start, s_end ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max FROM iv), " +
        "f AS (SELECT *, CASE WHEN prev_max IS NULL OR s_start > prev_max THEN 1 ELSE 0 END AS ni FROM o), " +
        "i AS (SELECT *, sum(ni) OVER (PARTITION BY chrom ORDER BY s_start, s_end ROWS UNBOUNDED PRECEDING) AS island FROM f), " +
        "isl AS (SELECT chrom, min(s_start) AS s, max(s_end) AS e FROM i GROUP BY chrom, island) " +
        "SELECT chrom, e AS gap_start, ns AS gap_end FROM " +
        "(SELECT chrom, e, lead(s) OVER (PARTITION BY chrom ORDER BY s) AS ns FROM isl) t WHERE ns IS NOT NULL"),

    "q_j15_ivjaccard" -> {
      def isl(src: String, sCol: String, eCol: String, out: String) =
        s"o_$out AS (SELECT chrom, $sCol AS s0, $eCol AS e0, max($eCol) OVER (PARTITION BY chrom ORDER BY $sCol, $eCol ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM $src), " +
          s"f_$out AS (SELECT *, CASE WHEN pm IS NULL OR s0 > pm THEN 1 ELSE 0 END AS ni FROM o_$out), " +
          s"g_$out AS (SELECT *, sum(ni) OVER (PARTITION BY chrom ORDER BY s0, e0 ROWS UNBOUNDED PRECEDING) AS island FROM f_$out), " +
          s"$out AS (SELECT chrom, min(s0) AS s, max(e0) AS e FROM g_$out GROUP BY chrom, island)"
      s"WITH ga AS ($genesSql), sb AS ($segsSql), " +
        isl("ga", "g_start", "g_end", "ia") + ", " +
        isl("sb", "s_start", "s_end", "ib") + ", " +
        "bpa AS (SELECT chrom, CAST(sum(e - s) AS BIGINT) AS bp_a FROM ia GROUP BY 1), " +
        "bpb AS (SELECT chrom, CAST(sum(e - s) AS BIGINT) AS bp_b FROM ib GROUP BY 1), " +
        "inter AS (SELECT ia.chrom, CAST(sum(least(ia.e, ib.e) - greatest(ia.s, ib.s)) AS BIGINT) AS bp_inter FROM ia JOIN ib ON ia.chrom = ib.chrom AND ia.s < ib.e AND ib.s < ia.e GROUP BY 1) " +
        "SELECT chrom, coalesce(bp_a, 0) AS bp_a, coalesce(bp_b, 0) AS bp_b, coalesce(bp_inter, 0) AS bp_inter, " +
        "coalesce(bp_a, 0) + coalesce(bp_b, 0) - coalesce(bp_inter, 0) AS bp_union, " +
        "CASE WHEN coalesce(bp_a, 0) + coalesce(bp_b, 0) - coalesce(bp_inter, 0) = 0 THEN 0 " +
        "ELSE CAST(round(CAST(coalesce(bp_inter, 0) AS DOUBLE) / CAST(coalesce(bp_a, 0) + coalesce(bp_b, 0) - coalesce(bp_inter, 0) AS DOUBLE) * 1e6) AS BIGINT) END AS jaccard_micro " +
        "FROM bpa FULL JOIN bpb USING (chrom) LEFT JOIN inter USING (chrom)"
    },

    "q_j10_merge" ->
      (s"WITH iv AS ($segsSql), " +
        "o AS (SELECT chrom, s_start, s_end, max(s_end) OVER (PARTITION BY chrom ORDER BY s_start, s_end ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max FROM iv), " +
        "f AS (SELECT *, CASE WHEN prev_max IS NULL OR s_start > prev_max THEN 1 ELSE 0 END AS ni FROM o), " +
        "i AS (SELECT *, sum(ni) OVER (PARTITION BY chrom ORDER BY s_start, s_end ROWS UNBOUNDED PRECEDING) AS island FROM f) " +
        "SELECT chrom, min(s_start) AS s_start, max(s_end) AS s_end, count(*) AS n_intervals FROM i GROUP BY chrom, island"),

    "q_j11_depth" ->
      (s"WITH iv AS ($segsSql), " +
        "ev AS (SELECT chrom, s_start AS pos, 1 AS delta FROM iv UNION ALL SELECT chrom, s_end, -1 FROM iv), " +
        "c AS (SELECT chrom, pos, CAST(sum(delta) AS BIGINT) AS d FROM ev GROUP BY 1, 2), " +
        "w AS (SELECT chrom, pos, CAST(sum(d) OVER (PARTITION BY chrom ORDER BY pos ROWS UNBOUNDED PRECEDING) AS BIGINT) AS depth, lead(pos) OVER (PARTITION BY chrom ORDER BY pos) AS next_pos FROM c) " +
        "SELECT chrom, pos AS d_start, next_pos AS d_end, depth FROM w WHERE next_pos IS NOT NULL AND depth > 0"),

    "q_j12_subtract" ->
      (s"WITH g AS ($genesSql), iv AS ($segsSql), " +
        "o AS (SELECT chrom, s_start, s_end, max(s_end) OVER (PARTITION BY chrom ORDER BY s_start, s_end ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max FROM iv), " +
        "f AS (SELECT *, CASE WHEN prev_max IS NULL OR s_start > prev_max THEN 1 ELSE 0 END AS ni FROM o), " +
        "ii AS (SELECT *, sum(ni) OVER (PARTITION BY chrom ORDER BY s_start, s_end ROWS UNBOUNDED PRECEDING) AS island FROM f), " +
        "i AS (SELECT chrom, min(s_start) AS istart, max(s_end) AS iend FROM ii GROUP BY chrom, island), " +
        "p AS (SELECT g.g_id, g.chrom, g.g_start, g.g_end, i.istart, i.iend FROM g JOIN i ON g.chrom = i.chrom AND g.g_start < i.iend AND i.istart < g.g_end), " +
        "r AS (SELECT *, lag(iend) OVER (PARTITION BY g_id ORDER BY istart) AS prev_end FROM p), " +
        "f1 AS (SELECT g_id, chrom, greatest(g_start, coalesce(prev_end, g_start)) AS sub_start, least(g_end, istart) AS sub_end FROM r), " +
        "f2 AS (SELECT g_id, chrom, greatest(g_start, max(iend)) AS sub_start, g_end AS sub_end FROM r GROUP BY g_id, chrom, g_start, g_end), " +
        "f3 AS (SELECT g_id, chrom, g_start AS sub_start, g_end AS sub_end FROM g WHERE NOT EXISTS (SELECT 1 FROM i WHERE i.chrom = g.chrom AND g.g_start < i.iend AND i.istart < g.g_end)), " +
        "u AS (SELECT * FROM f1 UNION ALL SELECT * FROM f2 UNION ALL SELECT * FROM f3) " +
        "SELECT g_id, chrom, sub_start, sub_end FROM u WHERE sub_start < sub_end"),

    "q_j13_closest" -> closestOracleSql,

    // identical contract to q_j13_closest — the SAME string, proving
    // the range-partitioned as-of legs change topology only
    "q_j13_closest_br" -> closestOracleSql,

    "q_e_qnorm" ->
      ("WITH m AS (SELECT l_suppkey % 10 AS sample_id, l_partkey % 100 AS gene, sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS v FROM lineitem GROUP BY 1, 2), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY sample_id ORDER BY v, gene) AS rn FROM m), " +
        "mm AS (SELECT rn, round(sum(v) * 1.0 / count(*), 6) AS qn_value FROM r GROUP BY 1) " +
        "SELECT sample_id, gene, r.rn AS qn_rank, mm.qn_value FROM r JOIN mm USING (rn)"),

    "q_e_rolling" ->
      ("SELECT event_id, user_id, count(value) OVER w AS roll_n, round(sum(value) OVER w, 4) AS roll_sum, round(avg(value) OVER w, 4) AS roll_avg, min(value) OVER w AS roll_min, max(value) OVER w AS roll_max, lag(value, 1) OVER w2 AS lag_1 FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), w2 AS (PARTITION BY user_id ORDER BY ts)"),

    "q_x_fd" -> {
      def leg(lhs: String, rhs: String) =
        s"SELECT '$lhs' AS lhs, '$rhs' AS rhs, count(*) AS n_lhs, " +
          "CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating, " +
          "max(k) AS max_rhs_per_lhs, " +
          "CASE WHEN sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END AS holds " +
          s"FROM (SELECT __l, count(*) AS k FROM (SELECT DISTINCT $lhs AS __l, $rhs AS __r FROM orders) t GROUP BY 1) g"
      leg("o_orderkey", "o_custkey") + " UNION ALL " +
        leg("o_custkey", "o_orderpriority") + " UNION ALL " +
        leg("o_orderstatus", "o_orderstatus")
    },

    "q_x_benford" ->
      ("WITH c AS (SELECT CAST(substr(CAST(CAST(floor(abs(l_extendedprice)) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit, count(*) AS n " +
        "FROM lineitem WHERE l_extendedprice IS NOT NULL AND abs(l_extendedprice) >= 1 GROUP BY 1), " +
        "t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c) " +
        "SELECT digit, n, obs_micro, benford_micro, obs_micro - benford_micro AS dev_micro FROM " +
        "(SELECT digit, n, CAST(round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE) * 1e6) AS BIGINT) AS obs_micro, " +
        "CAST(round(log10(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)) * 1e6) AS BIGINT) AS benford_micro " +
        "FROM c CROSS JOIN t) s"),

    // independent formulation: quadratic NOT EXISTS dominance test
    "q_o7_skyline" ->
      ("WITH p AS (SELECT p_partkey, p_brand, CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents, p_size FROM part) " +
        "SELECT p_partkey, p_brand, price_cents, p_size FROM p a " +
        "WHERE NOT EXISTS (SELECT 1 FROM p b WHERE b.p_brand = a.p_brand AND b.price_cents < a.price_cents AND b.p_size > a.p_size)"),

    // both window sums are exact integer milli-units; the flag
    // compares cross-multiplied longs (no division in the detector)
    "q_e_shift" ->
      ("WITH b AS (SELECT event_type, epoch_us(ts) AS ts_us, event_id, CAST(round(value * 1e3) AS BIGINT) AS y FROM events), " +
        "w AS (SELECT event_type, ts_us, count(y) OVER lw AS ln, CAST(sum(y) OVER lw AS BIGINT) AS lsum, count(y) OVER rw AS rn, CAST(sum(y) OVER rw AS BIGINT) AS rsum FROM b " +
        "WINDOW lw AS (PARTITION BY event_type ORDER BY ts_us, event_id ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING), " +
        "rw AS (PARTITION BY event_type ORDER BY ts_us, event_id ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING)) " +
        "SELECT event_type, ts_us, lsum AS lsum_milli, rsum AS rsum_milli, " +
        "CAST(round((rsum - lsum)::DOUBLE / 8) AS BIGINT) AS shift_milli, " +
        "CASE WHEN abs(rsum - lsum) > 30000 * 8 THEN 1 ELSE 0 END AS is_shift " +
        "FROM w WHERE ln = 8 AND rn = 8"),

    "q_e_impute" ->
      ("WITH e AS (SELECT event_id, user_id, CASE WHEN event_id % 10 = 0 THEN NULL ELSE value END AS value FROM events), " +
        "g AS (SELECT event_id, user_id, value, quantile_cont(value, 0.5) OVER (PARTITION BY user_id) AS gstat FROM e), " +
        "a AS (SELECT quantile_cont(value, 0.5) AS allstat FROM e) " +
        "SELECT event_id, user_id, round(coalesce(value, gstat, allstat), 4) AS value_filled, CASE WHEN value IS NULL THEN 1 ELSE 0 END AS value_imputed FROM g CROSS JOIN a"),

    "q_t_stats" ->
      s"SELECT doc_id, len($toksSql) AS n_words, round($punctSql, 6) AS punct_ratio FROM documents",

    "q_t_quality" ->
      s"WITH q AS (SELECT doc_id, len($toksSql)::DOUBLE AS nw, len(list_filter($toksSql, t -> t IN ('the','a','an','and','or','of','to','in','is','it')))::DOUBLE AS hits, $punctSql AS pr FROM documents) SELECT doc_id, round((least(nw / 100.0, 1.0) + least(hits / greatest(nw, 1.0) * 5.0, 1.0) + (1.0 - least(pr * 5.0, 1.0))) / 3.0, 6) AS quality FROM q",

    "q_t_vocabcov" ->
      (s"WITH tk AS (SELECT unnest($toksSql) AS term FROM documents), " +
        "c AS (SELECT term, count(*) AS cnt FROM tk GROUP BY 1), " +
        "r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rk FROM c), " +
        "n AS (SELECT unnest([100, 1000, 10000]) AS top_n), " +
        "ag AS (SELECT top_n, count(*) AS n_terms, CAST(sum(cnt) AS BIGINT) AS total_tokens, CAST(sum(CASE WHEN rk <= top_n THEN cnt ELSE 0 END) AS BIGINT) AS covered_tokens FROM r CROSS JOIN n GROUP BY 1) " +
        "SELECT top_n, n_terms, total_tokens, covered_tokens, CAST(round(covered_tokens::DOUBLE / total_tokens * 1e6) AS BIGINT) AS coverage_micro FROM ag"),

    "q_t_hashvec" ->
      (s"WITH tk AS (SELECT doc_id, unnest($toksSql) AS term FROM documents) " +
        s"SELECT doc_id, (${h60Sql("term")} % 256)::INT AS slot, count(*) AS cnt FROM tk GROUP BY 1, 2"),

    "q_t_heaps" ->
      (s"WITH tk AS MATERIALIZED (SELECT doc_id % 10 AS m, unnest($toksSql) AS term FROM documents), " +
        "tf AS MATERIALIZED (SELECT term, min(m) AS fm FROM tk GROUP BY 1), " +
        "d AS (SELECT unnest(range(1, 11)) AS subset) " +
        "SELECT subset::INT AS subset, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM tk WHERE tk.m < d.subset) AS n_tokens, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM tf WHERE tf.fm < d.subset) AS vocab " +
        "FROM d"),

    "q_t_fertility" ->
      (s"WITH f AS (SELECT lang, len($toksSql)::BIGINT AS nt, length(text)::BIGINT AS nc FROM documents), " +
        "ag AS (SELECT lang, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens, CAST(sum(nc) AS BIGINT) AS n_chars FROM f GROUP BY 1) " +
        "SELECT lang, n_docs, n_tokens, n_chars, CASE WHEN n_tokens > 0 THEN CAST(round(n_chars::DOUBLE / n_tokens * 1e6) AS BIGINT) END AS chars_per_token_micro FROM ag"),

    "q_t_winnow" ->
      (s"WITH $winnowCtes " +
        "SELECT DISTINCT doc_id, CAST(i + jmax - 1 AS BIGINT) AS pos, fp FROM r"),

    "q_d_winnowpairs" ->
      (s"WITH $winnowCtes, " +
        "wf AS (SELECT DISTINCT doc_id, fp FROM r), " +
        "fdf AS (SELECT fp, count(*) AS c FROM wf GROUP BY 1), " +
        "el AS (SELECT wf.doc_id, wf.fp FROM wf JOIN fdf USING (fp) WHERE c BETWEEN 2 AND 100) " +
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared " +
        "FROM el a JOIN el b ON a.fp = b.fp AND a.doc_id < b.doc_id " +
        "GROUP BY 1, 2 HAVING count(*) >= 2"),

    "q_t_entropy" ->
      ("WITH ch AS (SELECT doc_id, unnest(list_filter(string_split(text, ''), x -> x <> '')) AS c FROM documents), " +
        "cnt AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY 1, 2), " +
        "ag AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS n, CAST(sum(k * CAST(round(ln(k) * 1e6) AS BIGINT)) AS BIGINT) AS s FROM cnt GROUP BY 1) " +
        "SELECT d.doc_id, length(d.text)::BIGINT AS n_chars, " +
        "CASE WHEN ag.n IS NULL THEN 0.0 ELSE round((ag.n * CAST(round(ln(ag.n) * 1e6) AS BIGINT) - ag.s) / (ag.n * 1e6), 6) END AS entropy " +
        "FROM documents d LEFT JOIN ag ON d.doc_id = ag.doc_id"),

    "q_t_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents)
         |SELECT doc_id,
         |  round(CASE WHEN len(tk) = 0 THEN 0.0 ELSE (len(tk) - len(list_distinct(tk)))::DOUBLE / len(tk) END, 6) AS dup_frac,
         |  round(CASE WHEN len(tk) = 0 THEN 0.0 ELSE list_max(list_transform(list_distinct(tk), d -> len(list_filter(tk, x -> x = d))))::DOUBLE / len(tk) END, 6) AS top_frac,
         |  round(CASE WHEN len(tk) < 2 THEN 0.0 ELSE len(list_filter(range(2, len(tk) + 1), i -> tk[i] = tk[i-1]))::DOUBLE / (len(tk) - 1) END, 6) AS consec_frac
         |FROM t""".stripMargin,

    "q_t_langid" ->
      s"WITH q AS (SELECT doc_id, $toksSql AS tk FROM documents), c AS (SELECT doc_id, len(list_filter(tk, t -> t IN ('the','and','of','is'))) AS c_en, len(list_filter(tk, t -> t IN ('el','la','los','es'))) AS c_es, len(list_filter(tk, t -> t IN ('der','die','und','ist'))) AS c_de, len(list_filter(tk, t -> t IN ('le','les','est','et'))) AS c_fr FROM q) SELECT doc_id, CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en' WHEN c_es >= c_de AND c_es >= c_fr THEN 'es' WHEN c_de >= c_fr THEN 'de' ELSE 'fr' END AS lang_guess FROM c",

    "q_t_fingerprint" ->
      s"SELECT doc_id, list_reduce(list_prepend(0::BIGINT, list_transform($toksSql, t -> ${h60Sql("t")} % $P)), (acc, h) -> (acc * 31 + h) % $P) AS fp FROM documents",

    "q_t_bpe" ->
      "SELECT doc_id, len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_tokens FROM documents",

    "q_d_exact" ->
      "SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS dup_count FROM documents GROUP BY 1",

    "q_d_normdedup" ->
      "SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS content_hash, min(doc_id) AS keep_id, count(*) AS dup_count FROM documents GROUP BY 1",

    "q_d_incr" ->
      ("WITH store AS (SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS sig, min(doc_id) AS dup_of FROM documents GROUP BY 1), " +
        "batch AS (SELECT doc_id + 10000000 AS doc_id, md5(trim(regexp_replace(lower(text || ' ***'), '[^a-z0-9]+', ' ', 'g'))) AS sig FROM documents WHERE doc_id % 10 = 0) " +
        "SELECT b.doc_id, s.dup_of, b.sig FROM batch b JOIN store s USING (sig)"),

    // replay: corpus band rows (the q_d_lsh recipe) = the store; batch
    // band rows over the re-crawl; size-capped equi-join on
    // (band, bucket); band agreement counts per (batch, corpus) pair
    "q_d_incr_lsh" -> {
      val mh = (0 until 8).map { i =>
        val a = graft.functions.TextFns.minhashA(i)
        val b = graft.functions.TextFns.minhashB(i)
        s"list_min(list_transform(sh, g -> ($a * (${h60Sql("g")} % $P) + $b) % $P)) AS mh_$i"
      }.mkString(", ")
      def bandSelects(src: String) = (0 until 4).map { bnd =>
        s"SELECT doc_id, $bnd AS band, ${h60Sql(s"mh_${2 * bnd}::VARCHAR || '_' || mh_${2 * bnd + 1}::VARCHAR")} AS bucket FROM $src"
      }.mkString(" UNION ALL ")
      s"WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents WHERE len($toksSql) >= 3), " +
        s"d AS (SELECT doc_id, $shinglesSql AS sh FROM t), " +
        s"sig AS (SELECT doc_id, $mh FROM d), " +
        s"bk AS (${bandSelects("sig")}), " +
        "sizes AS (SELECT band, bucket, count(*) AS c FROM bk GROUP BY 1, 2), " +
        "ok AS (SELECT bk.* FROM bk JOIN sizes USING (band, bucket) WHERE c <= 1000), " +
        "braw AS (SELECT doc_id + 10000000 AS doc_id, text || ' ***' AS text FROM documents WHERE doc_id % 10 = 0), " +
        s"bt AS (SELECT doc_id, $toksSql AS tk FROM braw WHERE len($toksSql) >= 3), " +
        s"bd AS (SELECT doc_id, $shinglesSql AS sh FROM bt), " +
        s"bsig AS (SELECT doc_id, $mh FROM bd), " +
        s"bbk AS (${bandSelects("bsig")}) " +
        "SELECT b.doc_id, a.doc_id AS cand_id, count(*) AS band_matches " +
        "FROM bbk b JOIN ok a USING (band, bucket) GROUP BY 1, 2"
    },

    // two-generation replay: the store's band rows are an explicit
    // UNION ALL of gen0 (even ids, the initial bucketed write) and
    // gen1 (odd ids, the append) — byte-for-byte what the appended
    // table holds; probe recipe identical to q_d_incr_lsh
    "q_d_incr_lsh2" -> {
      val mh = (0 until 8).map { i =>
        val a = graft.functions.TextFns.minhashA(i)
        val b = graft.functions.TextFns.minhashB(i)
        s"list_min(list_transform(sh, g -> ($a * (${h60Sql("g")} % $P) + $b) % $P)) AS mh_$i"
      }.mkString(", ")
      def bandSelects(src: String) = (0 until 4).map { bnd =>
        s"SELECT doc_id, $bnd AS band, ${h60Sql(s"mh_${2 * bnd}::VARCHAR || '_' || mh_${2 * bnd + 1}::VARCHAR")} AS bucket FROM $src"
      }.mkString(" UNION ALL ")
      def genBands(gen: String, parity: Int) =
        s"t$gen AS (SELECT doc_id, $toksSql AS tk FROM documents WHERE doc_id % 2 = $parity AND len($toksSql) >= 3), " +
          s"d$gen AS (SELECT doc_id, $shinglesSql AS sh FROM t$gen), " +
          s"sig$gen AS (SELECT doc_id, $mh FROM d$gen), " +
          s"bk$gen AS (${bandSelects(s"sig$gen")})"
      s"WITH ${genBands("0", 0)}, " +
        s"${genBands("1", 1)}, " +
        "bk AS (SELECT * FROM bk0 UNION ALL SELECT * FROM bk1), " +
        "sizes AS (SELECT band, bucket, count(*) AS c FROM bk GROUP BY 1, 2), " +
        "ok AS (SELECT bk.* FROM bk JOIN sizes USING (band, bucket) WHERE c <= 1000), " +
        "braw AS (SELECT doc_id + 10000000 AS doc_id, text || ' ***' AS text FROM documents WHERE doc_id % 10 = 0), " +
        s"bt AS (SELECT doc_id, $toksSql AS tk FROM braw WHERE len($toksSql) >= 3), " +
        s"bd AS (SELECT doc_id, $shinglesSql AS sh FROM bt), " +
        s"bsig AS (SELECT doc_id, $mh FROM bd), " +
        s"bbk AS (${bandSelects("bsig")}) " +
        "SELECT b.doc_id, a.doc_id AS cand_id, count(*) AS band_matches " +
        "FROM bbk b JOIN ok a USING (band, bucket) GROUP BY 1, 2"
    },

    // two-batch ingest replay: per-batch pipeline dedup (bands →
    // candidates → exact-Jaccard confirm → CC as prefixed recursive
    // CTEs), then the cross-batch minhash-agreement screen of batch-2
    // representatives against batch-1 survivors' stored signatures.
    // Heavy per-batch CTEs are MATERIALIZED (each is referenced 2-3×;
    // default inlining re-expands the whole chain per reference).
    "q_d_ingest2" -> {
      val mh = (0 until 8).map { i =>
        val a = graft.functions.TextFns.minhashA(i)
        val b = graft.functions.TextFns.minhashB(i)
        s"list_min(list_transform(sh, g -> ($a * (${h60Sql("g")} % $P) + $b) % $P)) AS mh_$i"
      }.mkString(", ")
      def bandSelects(src: String) = (0 until 4).map { bnd =>
        s"SELECT doc_id, $bnd AS band, ${h60Sql(s"mh_${2 * bnd}::VARCHAR || '_' || mh_${2 * bnd + 1}::VARCHAR")} AS bucket FROM $src"
      }.mkString(" UNION ALL ")
      val jac = "CASE WHEN len(list_distinct(list_concat(da.sh, db.sh))) = 0 THEN 0.0 ELSE len(list_intersect(da.sh, db.sh))::DOUBLE / len(list_distinct(list_concat(da.sh, db.sh))) END"
      def gen(g: Int, parity: Int): String =
        s"t$g AS MATERIALIZED (SELECT doc_id, $toksSql AS tk FROM documents WHERE doc_id % 2 = $parity AND len($toksSql) >= 3), " +
          s"d$g AS MATERIALIZED (SELECT doc_id, $shinglesSql AS sh FROM t$g), " +
          s"sig$g AS MATERIALIZED (SELECT doc_id, $mh FROM d$g), " +
          s"bk$g AS MATERIALIZED (${bandSelects(s"sig$g")}), " +
          s"cand$g AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM bk$g a JOIN bk$g b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id), " +
          s"conf$g AS (SELECT id_a, id_b FROM cand$g JOIN d$g da ON da.doc_id = cand$g.id_a JOIN d$g db ON db.doc_id = cand$g.id_b WHERE $jac >= 0.5), " +
          ccCtesSql(s"conf$g", s"c$g")
      val agree8 = (0 until 8).map(i =>
        s"CASE WHEN sa.mh_$i = sb.mh_$i THEN 1 ELSE 0 END").mkString(" + ")
      "WITH RECURSIVE " + gen(1, 0) + ", " + gen(2, 1) + ", " +
        "surv1 AS MATERIALIZED (SELECT doc_id FROM t1 WHERE doc_id NOT IN (SELECT id FROM c1dropped)), " +
        // the store after batch 1 = batch-1 survivors' band rows;
        // bucket-size guard over exactly those rows (<= 1000)
        "sbk AS MATERIALIZED (SELECT bk1.* FROM bk1 JOIN surv1 USING (doc_id)), " +
        "sizes AS (SELECT band, bucket, count(*) AS c FROM sbk GROUP BY 1, 2), " +
        "okst AS (SELECT sbk.* FROM sbk JOIN sizes USING (band, bucket) WHERE c <= 1000), " +
        s"xdup AS (SELECT DISTINCT b2.doc_id FROM bk2 b2 JOIN okst ON b2.band = okst.band AND b2.bucket = okst.bucket " +
        s"JOIN sig2 sa ON sa.doc_id = b2.doc_id JOIN sig1 sb ON sb.doc_id = okst.doc_id WHERE ($agree8) >= 4) " +
        "SELECT 1 AS batch, doc_id FROM surv1 " +
        "UNION ALL SELECT 2, doc_id FROM t2 WHERE doc_id NOT IN (SELECT id FROM c2dropped) AND doc_id NOT IN (SELECT doc_id FROM xdup)"
    },

    // q_d_ingest2 with the cross-batch screen replayed as the EXACT
    // shingle-set Jaccard (no signature agreement): same banding,
    // bucket guard, and CC rounds; only the confirm differs
    "q_d_ingest3" -> {
      val mh = (0 until 8).map { i =>
        val a = graft.functions.TextFns.minhashA(i)
        val b = graft.functions.TextFns.minhashB(i)
        s"list_min(list_transform(sh, g -> ($a * (${h60Sql("g")} % $P) + $b) % $P)) AS mh_$i"
      }.mkString(", ")
      def bandSelects(src: String) = (0 until 4).map { bnd =>
        s"SELECT doc_id, $bnd AS band, ${h60Sql(s"mh_${2 * bnd}::VARCHAR || '_' || mh_${2 * bnd + 1}::VARCHAR")} AS bucket FROM $src"
      }.mkString(" UNION ALL ")
      val jac = "CASE WHEN len(list_distinct(list_concat(da.sh, db.sh))) = 0 THEN 0.0 ELSE len(list_intersect(da.sh, db.sh))::DOUBLE / len(list_distinct(list_concat(da.sh, db.sh))) END"
      def gen(g: Int, parity: Int): String =
        s"t$g AS MATERIALIZED (SELECT doc_id, $toksSql AS tk FROM documents WHERE doc_id % 2 = $parity AND len($toksSql) >= 3), " +
          s"d$g AS MATERIALIZED (SELECT doc_id, $shinglesSql AS sh FROM t$g), " +
          s"sig$g AS MATERIALIZED (SELECT doc_id, $mh FROM d$g), " +
          s"bk$g AS MATERIALIZED (${bandSelects(s"sig$g")}), " +
          s"cand$g AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM bk$g a JOIN bk$g b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id), " +
          s"conf$g AS (SELECT id_a, id_b FROM cand$g JOIN d$g da ON da.doc_id = cand$g.id_a JOIN d$g db ON db.doc_id = cand$g.id_b WHERE $jac >= 0.5), " +
          ccCtesSql(s"conf$g", s"c$g")
      "WITH RECURSIVE " + gen(1, 0) + ", " + gen(2, 1) + ", " +
        "surv1 AS MATERIALIZED (SELECT doc_id FROM t1 WHERE doc_id NOT IN (SELECT id FROM c1dropped)), " +
        "sbk AS MATERIALIZED (SELECT bk1.* FROM bk1 JOIN surv1 USING (doc_id)), " +
        "sizes AS (SELECT band, bucket, count(*) AS c FROM sbk GROUP BY 1, 2), " +
        "okst AS (SELECT sbk.* FROM sbk JOIN sizes USING (band, bucket) WHERE c <= 1000), " +
        s"xdup AS (SELECT DISTINCT b2.doc_id FROM bk2 b2 JOIN okst ON b2.band = okst.band AND b2.bucket = okst.bucket " +
        s"JOIN d2 da ON da.doc_id = b2.doc_id JOIN d1 db ON db.doc_id = okst.doc_id WHERE $jac >= 0.5) " +
        "SELECT 1 AS batch, doc_id FROM surv1 " +
        "UNION ALL SELECT 2, doc_id FROM t2 WHERE doc_id NOT IN (SELECT id FROM c2dropped) AND doc_id NOT IN (SELECT doc_id FROM xdup)"
    },

    // q_d_ingest3's replay with the cross-batch screen replayed as the
    // HYBRID router: minhash agreement decides outside the integer
    // cuts (shared with the engine via Dedup.hybridCuts), the exact
    // shingle-set Jaccard decides the in-band pairs
    "q_d_ingest4" -> {
      val (loCut, hiCut) = graft.operators.Dedup.hybridCuts(8, 0.5, 0.25)
      val mh = (0 until 8).map { i =>
        val a = graft.functions.TextFns.minhashA(i)
        val b = graft.functions.TextFns.minhashB(i)
        s"list_min(list_transform(sh, g -> ($a * (${h60Sql("g")} % $P) + $b) % $P)) AS mh_$i"
      }.mkString(", ")
      def bandSelects(src: String) = (0 until 4).map { bnd =>
        s"SELECT doc_id, $bnd AS band, ${h60Sql(s"mh_${2 * bnd}::VARCHAR || '_' || mh_${2 * bnd + 1}::VARCHAR")} AS bucket FROM $src"
      }.mkString(" UNION ALL ")
      val jac = "CASE WHEN len(list_distinct(list_concat(da.sh, db.sh))) = 0 THEN 0.0 ELSE len(list_intersect(da.sh, db.sh))::DOUBLE / len(list_distinct(list_concat(da.sh, db.sh))) END"
      def gen(g: Int, parity: Int): String =
        s"t$g AS MATERIALIZED (SELECT doc_id, $toksSql AS tk FROM documents WHERE doc_id % 2 = $parity AND len($toksSql) >= 3), " +
          s"d$g AS MATERIALIZED (SELECT doc_id, $shinglesSql AS sh FROM t$g), " +
          s"sig$g AS MATERIALIZED (SELECT doc_id, $mh FROM d$g), " +
          s"bk$g AS MATERIALIZED (${bandSelects(s"sig$g")}), " +
          s"cand$g AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM bk$g a JOIN bk$g b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id), " +
          s"conf$g AS (SELECT id_a, id_b FROM cand$g JOIN d$g da ON da.doc_id = cand$g.id_a JOIN d$g db ON db.doc_id = cand$g.id_b WHERE $jac >= 0.5), " +
          ccCtesSql(s"conf$g", s"c$g")
      val agree8 = "(" + (0 until 8).map(i =>
        s"CASE WHEN sa.mh_$i = sb.mh_$i THEN 1 ELSE 0 END").mkString(" + ") + ")"
      "WITH RECURSIVE " + gen(1, 0) + ", " + gen(2, 1) + ", " +
        "surv1 AS MATERIALIZED (SELECT doc_id FROM t1 WHERE doc_id NOT IN (SELECT id FROM c1dropped)), " +
        "sbk AS MATERIALIZED (SELECT bk1.* FROM bk1 JOIN surv1 USING (doc_id)), " +
        "sizes AS (SELECT band, bucket, count(*) AS c FROM sbk GROUP BY 1, 2), " +
        "okst AS (SELECT sbk.* FROM sbk JOIN sizes USING (band, bucket) WHERE c <= 1000), " +
        s"xdup AS (SELECT DISTINCT b2.doc_id FROM bk2 b2 JOIN okst ON b2.band = okst.band AND b2.bucket = okst.bucket " +
        s"JOIN sig2 sa ON sa.doc_id = b2.doc_id JOIN sig1 sb ON sb.doc_id = okst.doc_id " +
        s"JOIN d2 da ON da.doc_id = b2.doc_id JOIN d1 db ON db.doc_id = okst.doc_id " +
        s"WHERE $agree8 >= $hiCut OR ($agree8 >= $loCut AND $agree8 < $hiCut AND $jac >= 0.5)) " +
        "SELECT 1 AS batch, doc_id FROM surv1 " +
        "UNION ALL SELECT 2, doc_id FROM t2 WHERE doc_id NOT IN (SELECT id FROM c2dropped) AND doc_id NOT IN (SELECT doc_id FROM xdup)"
    },

    "q_d_srcoverlap" ->
      ("WITH hs AS (SELECT DISTINCT md5(text) AS h, source AS src FROM documents) " +
        "SELECT a.src AS src_a, b.src AS src_b, count(*) AS n_shared " +
        "FROM hs a JOIN hs b ON a.h = b.h AND a.src < b.src GROUP BY 1, 2"),

    "q_x_fk" ->
      ("SELECT 'lineitem_orders' AS fk, (SELECT count(*) FROM lineitem) AS n_child, (SELECT count(*) FROM lineitem l WHERE l_orderkey IS NOT NULL AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans, (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL) AS n_null " +
        "UNION ALL SELECT 'orders_customer', (SELECT count(*) FROM orders), (SELECT count(*) FROM orders o WHERE o_custkey IS NOT NULL AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)), (SELECT count(*) FROM orders WHERE o_custkey IS NULL) " +
        "UNION ALL SELECT 'customer_nation', (SELECT count(*) FROM customer), (SELECT count(*) FROM customer c WHERE c_nationkey IS NOT NULL AND NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)), (SELECT count(*) FROM customer WHERE c_nationkey IS NULL)"),

    "q_d_dupconc" ->
      ("WITH g AS (SELECT md5(text) AS content_hash, count(*) AS dup_count FROM documents GROUP BY 1), " +
        "d AS (SELECT dup_count, ntile(10) OVER (ORDER BY dup_count DESC, content_hash) AS decile FROM g) " +
        "SELECT decile, count(*) AS n_groups, CAST(sum(dup_count) AS BIGINT) AS n_docs FROM d GROUP BY 1"),

    "q_d_minhash" -> {
      val mh = (0 until 4).map { i =>
        val a = graft.functions.TextFns.minhashA(i)
        val b = graft.functions.TextFns.minhashB(i)
        s"list_min(list_transform(sh, g -> ($a * (${h60Sql("g")} % $P) + $b) % $P)) AS mh_$i"
      }.mkString(", ")
      s"WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents), d AS (SELECT doc_id, $shinglesSql AS sh FROM t) SELECT doc_id, $mh FROM d"
    },

    "q_d_simhash" ->
      s"WITH t AS (SELECT doc_id, list_transform($toksSql, x -> ${h60Sql("x")}) AS hs FROM documents) SELECT doc_id, ${simhashSql(8)} AS simhash FROM t",

    // brute-force oracle validates that block banding is EXACT for
    // hamming <= maxHamming (pigeonhole recall guarantee)
    "q_d_simdup" ->
      s"""WITH t AS (SELECT doc_id, list_transform($toksSql, x -> ${h60Sql("x")}) AS hs FROM documents),
         |s AS (SELECT doc_id, ${simhashSql(32)} AS sig FROM t),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  list_sum(list_transform(range(0, 32), j -> CASE WHEN ((a.sig >> j) & 1) <> ((b.sig >> j) & 1) THEN 1 ELSE 0 END)) AS hamming
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, hamming::BIGINT AS hamming FROM p WHERE hamming <= 3
         |""".stripMargin,

    "q_d_jaccard" ->
      s"WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents), d AS (SELECT doc_id, $shinglesSql AS sh FROM t) SELECT a.doc_id AS id_a, b.doc_id AS id_b, round(CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0 ELSE len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(list_concat(a.sh, b.sh))) END, 6) AS jaccard FROM d a JOIN d b ON b.doc_id = a.doc_id + 1",

    "q_d_containment" ->
      (s"WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents), d AS (SELECT doc_id, $shinglesSql AS sh FROM t) " +
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "CASE WHEN len(a.sh) = 0 THEN 0.0 ELSE round(len(list_intersect(a.sh, b.sh)) / len(a.sh), 6) END AS containment_a, " +
        "CASE WHEN len(b.sh) = 0 THEN 0.0 ELSE round(len(list_intersect(a.sh, b.sh)) / len(b.sh), 6) END AS containment_b " +
        "FROM d a JOIN d b ON b.doc_id = a.doc_id + 1"),

    "q_d_prefix" ->
      (s"WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents), " +
        s"d AS (SELECT doc_id, $shinglesSql AS sh FROM t), " +
        "dd AS (SELECT doc_id, sh, len(sh) AS sz FROM d), " +
        "e AS (SELECT doc_id, sz, unnest(sh) AS g FROM dd), " +
        "dfq AS (SELECT g, count(*) AS dfc FROM e GROUP BY 1), " +
        "r AS (SELECT e.doc_id, e.sz, e.g, row_number() OVER (PARTITION BY e.doc_id ORDER BY dfc, e.g) AS rn FROM e JOIN dfq USING (g)), " +
        "p AS (SELECT doc_id, g FROM r WHERE rn <= sz - ceil(0.6 * sz) + 1), " +
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM p a JOIN p b ON a.g = b.g AND a.doc_id < b.doc_id), " +
        "v AS (SELECT id_a, id_b, CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0 ELSE len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(list_concat(a.sh, b.sh))) END AS j FROM cand JOIN dd a ON a.doc_id = cand.id_a JOIN dd b ON b.doc_id = cand.id_b) " +
        "SELECT id_a, id_b, round(j, 6) AS jaccard FROM v WHERE j >= 0.6"),

    "q_s_brute" ->
      s"WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), q AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 10), s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, ${cosSql("q.v", "c.v")} AS cos FROM c CROSS JOIN q WHERE q.vec_id <> c.vec_id) SELECT query_id, neighbor_id, cos, rank FROM (SELECT s.*, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM s) WHERE rank <= 5",

    "q_s_meanpool" ->
      ("WITH p AS (SELECT label, generate_subscripts(embedding, 1) AS pos, unnest(embedding::DOUBLE[]) AS x FROM embeddings), " +
        "a AS (SELECT label, pos, CAST(sum(CAST(round(x * 1e6) AS BIGINT)) AS BIGINT) AS s, count(*) AS n FROM p GROUP BY 1, 2), " +
        "m AS (SELECT label, max(n) AS n FROM a GROUP BY 1) " +
        "SELECT a.label, m.n AS n, (a.pos - 1)::INT AS pos, round(a.s::DOUBLE / a.n / 1e6, 6) + 0 AS value FROM a JOIN m USING (label)"),

    "q_s_cov" ->
      ("WITH y AS (SELECT list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1e6) AS BIGINT)) AS y FROM embeddings), " +
        "tri AS (SELECT t.i AS i, t.j AS j, t.p AS p FROM (SELECT unnest(flatten(list_transform(range(0, len(y)), i -> list_transform(range(i, len(y)), j -> struct_pack(i := i, j := j, p := y[i + 1] * y[j + 1]))))) AS t FROM y)), " +
        "ag AS (SELECT i, j, count(*) AS n, sum(p) AS spp FROM tri GROUP BY 1, 2), " +
        "s AS (SELECT pos - 1 AS pos, sum(v) AS sv FROM (SELECT generate_subscripts(y, 1) AS pos, unnest(y) AS v FROM y) GROUP BY 1) " +
        "SELECT i::INT AS i, j::INT AS j, n, " +
        "round((spp::DOUBLE - si.sv::DOUBLE * sj.sv / n) / (n - 1) / 1e12, 6) + 0 AS cov " +
        "FROM ag JOIN s si ON ag.i = si.pos JOIN s sj ON ag.j = sj.pos"),

    "q_s_whiten" ->
      ("WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos, unnest(embedding::DOUBLE[]) AS x FROM embeddings), " +
        "st AS (SELECT pos, count(*) AS n, sum(y) AS sv, sum(y * y) AS spp FROM (SELECT pos, CAST(round(x * 1e6) AS BIGINT) AS y FROM e) GROUP BY 1), " +
        "ms AS (SELECT pos, sv::DOUBLE / n / 1e6 AS m, sqrt(greatest((spp::DOUBLE - sv::DOUBLE * sv / n) / (n - 1) / 1e12, 0.0)) AS sd FROM st) " +
        "SELECT e.vec_id, (e.pos - 1)::INT AS pos, CASE WHEN ms.sd = 0.0 THEN 0.0 ELSE round((e.x - ms.m) / ms.sd, 6) + 0 END AS value " +
        "FROM e JOIN ms USING (pos)"),

    // same whitening CTEs as q_s_whiten, then Σ round(z²·1e6) per
    // vector and a global top-25
    "q_s_outlier" ->
      ("WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos, unnest(embedding::DOUBLE[]) AS x FROM embeddings), " +
        "st AS (SELECT pos, count(*) AS n, sum(y) AS sv, sum(y * y) AS spp FROM (SELECT pos, CAST(round(x * 1e6) AS BIGINT) AS y FROM e) GROUP BY 1), " +
        "ms AS (SELECT pos, sv::DOUBLE / n / 1e6 AS m, sqrt(greatest((spp::DOUBLE - sv::DOUBLE * sv / n) / (n - 1) / 1e12, 0.0)) AS sd FROM st), " +
        "z AS (SELECT e.vec_id, CASE WHEN ms.sd = 0.0 THEN 0.0 ELSE round((e.x - ms.m) / ms.sd, 6) + 0 END AS v FROM e JOIN ms USING (pos)), " +
        "sc AS (SELECT vec_id, CAST(sum(CAST(round(v * v * 1e6) AS BIGINT)) AS BIGINT) AS score_micro FROM z GROUP BY 1), " +
        "r AS (SELECT vec_id, score_micro, row_number() OVER (ORDER BY score_micro DESC, vec_id) AS rank FROM sc) " +
        "SELECT vec_id, score_micro, rank FROM r WHERE rank <= 25"),

    // nearest-centroid assignment exactly as q_s_ivf's a0 CTE, then
    // keep the 10 most-central members per cluster
    "q_s_diverse" ->
      (s"WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "ivfc AS (SELECT vec_id AS centroid_id, v AS cvec FROM e ORDER BY vec_id LIMIT 8), " +
        s"a0 AS (SELECT vec_id, centroid_id, v, cvec FROM (SELECT e.vec_id, i.centroid_id, e.v, i.cvec, row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cosRawSql("e.v", "i.cvec")} DESC, i.centroid_id) AS rn FROM e CROSS JOIN ivfc i) WHERE rn = 1), " +
        s"sc AS (SELECT centroid_id, vec_id, ${cosSql("v", "cvec")} AS cos FROM a0), " +
        "r AS (SELECT centroid_id, vec_id, cos, row_number() OVER (PARTITION BY centroid_id ORDER BY cos DESC, vec_id) AS rank FROM sc) " +
        "SELECT centroid_id, vec_id, cos, rank FROM r WHERE rank <= 10"),

    "q_s_centdrift" ->
      ("WITH e AS (SELECT vec_id, label, vec_id % 2 = 0 AS h, generate_subscripts(embedding, 1) AS pos, unnest(embedding::DOUBLE[]) AS x FROM embeddings), " +
        "st AS (SELECT label, h, pos, CAST(sum(CAST(round(x * 1e6) AS BIGINT)) AS BIGINT) AS s, count(*) AS n FROM e GROUP BY 1, 2, 3), " +
        "mm AS (SELECT label, h, pos, CAST(round(s::DOUBLE / n) AS BIGINT) AS m FROM st), " +
        "j AS (SELECT a.label, a.m AS ma, b.m AS mb FROM (SELECT * FROM mm WHERE h) a JOIN (SELECT * FROM mm WHERE NOT h) b ON a.label = b.label AND a.pos = b.pos), " +
        "ag AS (SELECT label, count(*) AS n_dims, CAST(sum(ma * mb) AS BIGINT) AS ab, CAST(sum(ma * ma) AS BIGINT) AS aa, CAST(sum(mb * mb) AS BIGINT) AS bb FROM j GROUP BY 1) " +
        "SELECT label, n_dims, CASE WHEN aa > 0 AND bb > 0 THEN round(ab::DOUBLE / (sqrt(aa::DOUBLE) * sqrt(bb::DOUBLE)), 6) + 0 END AS cos FROM ag"),

    "q_s_dimprofile" ->
      ("WITH p AS (SELECT generate_subscripts(embedding, 1) - 1 AS pos, unnest(embedding::DOUBLE[]) AS x FROM embeddings) " +
        "SELECT pos::INT AS pos, count(*) AS n, " +
        "CAST(sum(CASE WHEN isnan(x) THEN 1 ELSE 0 END) AS BIGINT) AS n_nan, " +
        "min(CASE WHEN isnan(x) THEN NULL ELSE x END) AS min_v, " +
        "max(CASE WHEN isnan(x) THEN NULL ELSE x END) AS max_v, " +
        "round(CAST(sum(CASE WHEN isnan(x) THEN 0 ELSE CAST(round(x * 1e6) AS BIGINT) END) AS BIGINT)::DOUBLE / sum(CASE WHEN isnan(x) THEN 0 ELSE 1 END) / 1e6, 6) AS mean_v " +
        "FROM p GROUP BY 1"),

    "q_s_hygiene" ->
      ("WITH c AS (SELECT CASE WHEN embedding IS NULL OR len(embedding) <> 64 THEN 'wrong_dim' " +
        "WHEN len(list_filter(embedding::DOUBLE[], x -> isnan(x))) > 0 THEN 'has_nan' " +
        "WHEN len(list_filter(embedding::DOUBLE[], x -> x <> 0.0)) = 0 THEN 'zero_vector' " +
        "ELSE 'ok' END AS issue FROM embeddings) " +
        "SELECT issue, count(*) AS n FROM c GROUP BY 1"),

    "q_s_confusion" ->
      (s"WITH p AS (SELECT label, generate_subscripts(embedding, 1) AS pos, unnest(embedding::DOUBLE[]) AS x FROM embeddings), " +
        "a AS (SELECT label, pos, sum(CAST(round(x * 1e6) AS BIGINT)) AS s, count(*) AS n FROM p GROUP BY 1, 2), " +
        "cent AS (SELECT label AS cid, list(round(s::DOUBLE / n / 1e6, 6) ORDER BY pos) AS cvec FROM a GROUP BY 1), " +
        "e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings), " +
        s"scn AS (SELECT e.vec_id, e.label, cent.cid, ${cosRawSql("e.v", "cent.cvec")} AS sim FROM e CROSS JOIN cent), " +
        "asg AS (SELECT vec_id, label, cid FROM (SELECT scn.*, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn FROM scn) WHERE rn = 1) " +
        "SELECT label, cid::BIGINT AS assigned, count(*) AS n FROM asg GROUP BY 1, 2"),

    "q_s_hardneg" ->
      s"WITH c AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings), q AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 10), s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, ${cosSql("q.v", "c.v")} AS cos FROM c CROSS JOIN q WHERE q.label <> c.label) SELECT query_id, neighbor_id, cos, rank FROM (SELECT s.*, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM s) WHERE rank <= 5",

    "q_s_threshold" ->
      s"WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 200), p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, ${cosSql("a.v", "b.v")} AS cos FROM e a JOIN e b ON a.vec_id < b.vec_id) SELECT id_a, id_b, cos FROM p WHERE cos >= 0.2",

    "q_s_lsh" ->
      s"SELECT vec_id, ${srpBucketSql("v")} AS bucket FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",

    "q_s_lshpairs" ->
      s"WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 300), b AS (SELECT vec_id, v, ${srpBucketSql("v")} AS bucket FROM e), p AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b, ${cosSql("a.v", "c.v")} AS cos FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id) SELECT id_a, id_b, cos FROM p WHERE cos >= 0.2",

    "q_s_multiprobe" ->
      s"WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 300), b AS (SELECT vec_id, v, ${srpBucketSql("v")} AS bucket FROM e), pr AS (SELECT vec_id, unnest(list_concat([bucket], list_transform(range(0, 8), p -> xor(bucket, (1::BIGINT << p))))) AS pbucket FROM b), cand AS (SELECT DISTINCT a.vec_id AS id_a, h.vec_id AS id_b FROM pr a JOIN b h ON a.pbucket = h.bucket AND a.vec_id < h.vec_id), p AS (SELECT c.id_a, c.id_b, ${cosSql("ea.v", "eb.v")} AS cos FROM cand c JOIN e ea ON ea.vec_id = c.id_a JOIN e eb ON eb.vec_id = c.id_b) SELECT id_a, id_b, cos FROM p WHERE cos >= 0.2",

    "q_s_recall" ->
      s"WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 300), b AS (SELECT vec_id, v, ${srpBucketSql("v")} AS bucket FROM e), approx AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id WHERE ${cosSql("a.v", "c.v")} >= 0.2), exact AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b FROM e a JOIN e c ON a.vec_id < c.vec_id WHERE ${cosSql("a.v", "c.v")} >= 0.2) SELECT count(*) AS exact_count, CAST(count(ap.id_a) AS BIGINT) AS hit_count, count(ap.id_a) * 1.0 / count(*) AS recall FROM exact ex LEFT JOIN approx ap ON ex.id_a = ap.id_a AND ex.id_b = ap.id_b",

    // multiprobe candidate set (home + Hamming-1 buckets, as in
    // q_s_multiprobe) measured against the same exact threshold pairs
    "q_s_recall_mp" ->
      s"WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 300), b AS (SELECT vec_id, v, ${srpBucketSql("v")} AS bucket FROM e), pr AS (SELECT vec_id, unnest(list_concat([bucket], list_transform(range(0, 8), p -> xor(bucket, (1::BIGINT << p))))) AS pbucket FROM b), cand AS (SELECT DISTINCT a.vec_id AS id_a, h.vec_id AS id_b FROM pr a JOIN b h ON a.pbucket = h.bucket AND a.vec_id < h.vec_id), approx AS (SELECT c.id_a, c.id_b FROM cand c JOIN e ea ON ea.vec_id = c.id_a JOIN e eb ON eb.vec_id = c.id_b WHERE ${cosSql("ea.v", "eb.v")} >= 0.2), exact AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b FROM e a JOIN e c ON a.vec_id < c.vec_id WHERE ${cosSql("a.v", "c.v")} >= 0.2) SELECT count(*) AS exact_count, CAST(count(ap.id_a) AS BIGINT) AS hit_count, count(ap.id_a) * 1.0 / count(*) AS recall FROM exact ex LEFT JOIN approx ap ON ex.id_a = ap.id_a AND ex.id_b = ap.id_b",

    // the capped-mp2 oracle replays the bucket census: buckets over 5
    // members are dropped from BOTH the probe and the home side before
    // pairing, exactly as lshBucketedMultiProbe(maxBucket = 5)
    "q_s_recall_mp2" ->
      s"WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 300), b AS (SELECT vec_id, v, ${srpBucketSql("v")} AS bucket FROM e), cs AS (SELECT bucket, count(*) AS c FROM b GROUP BY 1), vv AS (SELECT b.vec_id, b.v, b.bucket FROM b JOIN cs ON b.bucket = cs.bucket WHERE cs.c <= 5), pr AS (SELECT vec_id, unnest(list_concat([bucket], list_transform(range(0, 8), p -> xor(bucket, (1::BIGINT << p))))) AS pbucket FROM vv), cand AS (SELECT DISTINCT a.vec_id AS id_a, h.vec_id AS id_b FROM pr a JOIN vv h ON a.pbucket = h.bucket AND a.vec_id < h.vec_id), approx AS (SELECT c.id_a, c.id_b FROM cand c JOIN e ea ON ea.vec_id = c.id_a JOIN e eb ON eb.vec_id = c.id_b WHERE ${cosSql("ea.v", "eb.v")} >= 0.2), exact AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b FROM e a JOIN e c ON a.vec_id < c.vec_id WHERE ${cosSql("a.v", "c.v")} >= 0.2) SELECT count(*) AS exact_count, CAST(count(ap.id_a) AS BIGINT) AS hit_count, count(ap.id_a) * 1.0 / count(*) AS recall FROM exact ex LEFT JOIN approx ap ON ex.id_a = ap.id_a AND ex.id_b = ap.id_b",

    // PCA: the q_s_cov covariance (exact, 6-dp-rounded -> identical
    // doubles in both engines), then power iteration as recursive
    // CTEs replaying the driver loop's exact float-op order (matvec
    // sums ascending j, norm ascending i, deflation of component 2
    // against the finished component 1 inside each iteration), then
    // the per-vector projection. Bit-exact pre-round, so the 6-dp
    // round compares exactly.
    "q_s_pca" ->
      ("WITH RECURSIVE y AS (SELECT list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1e6) AS BIGINT)) AS y FROM embeddings), " +
        "tri AS (SELECT t.i AS i, t.j AS j, t.p AS p FROM (SELECT unnest(flatten(list_transform(range(0, len(y)), i -> list_transform(range(i, len(y)), j -> struct_pack(i := i, j := j, p := y[i + 1] * y[j + 1]))))) AS t FROM y)), " +
        "ag AS (SELECT i, j, count(*) AS n, sum(p) AS spp FROM tri GROUP BY 1, 2), " +
        "s AS (SELECT pos - 1 AS pos, sum(v) AS sv FROM (SELECT generate_subscripts(y, 1) AS pos, unnest(y) AS v FROM y) GROUP BY 1), " +
        "cv AS (SELECT i::INT AS i, j::INT AS j, round((spp::DOUBLE - si.sv::DOUBLE * sj.sv / n) / (n - 1) / 1e12, 6) + 0 AS cov FROM ag JOIN s si ON ag.i = si.pos JOIN s sj ON ag.j = sj.pos), " +
        "cf AS (SELECT i, j, cov FROM cv UNION ALL SELECT j, i, cov FROM cv WHERE i <> j), " +
        "cm AS MATERIALIZED (SELECT list(row ORDER BY i) AS m FROM (SELECT i, list(cov ORDER BY j) AS row FROM cf GROUP BY i)), " +
        "pw1 AS (SELECT 0 AS it, list_transform(range(0, 64), x -> 1.0 / sqrt(64.0)) AS v " +
        "UNION ALL SELECT q.it + 1, CASE WHEN q.nrm = 0.0 THEN q.v ELSE list_transform(q.w, x -> x / q.nrm) END " +
        "FROM (SELECT p.it, p.v, p.w, sqrt(list_sum(list_transform(p.w, x -> x * x))) AS nrm " +
        "FROM (SELECT pw1.it, pw1.v, list_transform(range(1, 65), i -> list_sum(list_transform(range(1, 65), j -> cm.m[i][j] * pw1.v[j]))) AS w " +
        "FROM pw1, cm WHERE pw1.it < 50) p) q), " +
        "p1 AS MATERIALIZED (SELECT v AS p FROM pw1 WHERE it = 50), " +
        "pw2 AS (SELECT 0 AS it, list_transform(range(0, 64), x -> 1.0 / sqrt(64.0)) AS v " +
        "UNION ALL SELECT q.it + 1, CASE WHEN q.nrm = 0.0 THEN q.v ELSE list_transform(q.w2, x -> x / q.nrm) END " +
        "FROM (SELECT d.it, d.v, d.w2, sqrt(list_sum(list_transform(d.w2, x -> x * x))) AS nrm " +
        "FROM (SELECT g.it, g.v, list_transform(range(1, 65), i -> g.w[i] - g.d * g.p[i]) AS w2 " +
        "FROM (SELECT mv.it, mv.v, mv.w, p1.p, list_sum(list_transform(range(1, 65), i -> mv.w[i] * p1.p[i])) AS d " +
        "FROM (SELECT pw2.it, pw2.v, list_transform(range(1, 65), i -> list_sum(list_transform(range(1, 65), j -> cm.m[i][j] * pw2.v[j]))) AS w " +
        "FROM pw2, cm WHERE pw2.it < 50) mv, p1) g) d) q), " +
        "p2 AS MATERIALIZED (SELECT v AS p FROM pw2 WHERE it = 50) " +
        "SELECT e.vec_id, round(list_sum(list_transform(range(1, 65), k -> e.v[k] * p1.p[k])), 6) + 0 AS pc0, " +
        "round(list_sum(list_transform(range(1, 65), k -> e.v[k] * p2.p[k])), 6) + 0 AS pc1 " +
        "FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) e, p1, p2"),

    "q_s_mrl" ->
      (s"WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 200), " +
        "t AS (SELECT vec_id, v[1:16] AS v16 FROM e), " +
        s"ax AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, row_number() OVER (PARTITION BY a.vec_id ORDER BY ${cosSql("a.v16", "b.v16")} DESC, b.vec_id) AS rk FROM t a JOIN t b ON a.vec_id <> b.vec_id), " +
        "approx AS (SELECT query_id, neighbor_id FROM ax WHERE rk <= 3), " +
        s"ex AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, row_number() OVER (PARTITION BY a.vec_id ORDER BY ${cosSql("a.v", "b.v")} DESC, b.vec_id) AS rk FROM e a JOIN e b ON a.vec_id <> b.vec_id), " +
        "exact AS (SELECT query_id, neighbor_id FROM ex WHERE rk <= 3) " +
        "SELECT count(*) AS exact_count, CAST(count(ap.query_id) AS BIGINT) AS hit_count, count(ap.query_id) * 1.0 / count(*) AS recall " +
        "FROM exact x LEFT JOIN approx ap ON x.query_id = ap.query_id AND x.neighbor_id = ap.neighbor_id"),

    "q_m_binary" ->
      s"SELECT doc_id, octet_length(encode(text)) AS n_bytes, ${h60Sql("text")} % 640 AS width, ${h60Sql("text")} % 480 AS height FROM documents",

    "q_m_frames" ->
      (s"WITH h AS (SELECT doc_id, octet_length(encode(text))::BIGINT AS nb, ${h60Sql("text")} % 640 AS w, ${h60Sql("text")} % 480 AS ht FROM documents), " +
        "f AS (SELECT doc_id, nb, w, ht, least(320.0 / w, 240.0 / ht, 1.0) AS sc FROM h WHERE w > 0 AND ht > 0), " +
        "e AS (SELECT doc_id, CAST(floor(w * sc) AS BIGINT) AS r_width, CAST(floor(ht * sc) AS BIGINT) AS r_height, round(sc, 6) AS scale, (nb % 50) + 1 AS nf FROM f) " +
        "SELECT doc_id, r_width, r_height, scale, unnest(range(0, nf, 7)) AS frame_idx FROM e"),

    "q_f16_hgvs" ->
      """WITH v AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'Not Reported'
        |         ELSE 'p.V' || (doc_id % 50)::VARCHAR || 'E' END AS hp,
        |    'c.' || (doc_id % 40)::VARCHAR ||
        |      CASE doc_id % 4 WHEN 0 THEN 'delACGT' WHEN 1 THEN 'dupGG'
        |           WHEN 2 THEN 'insTT' ELSE '>A' END AS hc
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, hp, hc,
        |    [struct_pack(hgvsp := CASE WHEN doc_id % 5 = 0 THEN NULL
        |                   ELSE 'p.V' || (doc_id % 7)::VARCHAR || 'E' END,
        |                 hgvsc := 'c.' || (doc_id % 40)::VARCHAR || 'del',
        |                 hgvspShort := 'p.S1', variantClassification := 'ClassA'),
        |     struct_pack(hgvsp := 'xx p.V' || (doc_id % 50)::VARCHAR || 'E yy',
        |                 hgvsc := 'c.' || (doc_id % 11)::VARCHAR || '>A',
        |                 hgvspShort := 'p.S2', variantClassification := 'ClassB')] AS cons,
        |    [struct_pack(hgvsp := 'p.V' || (doc_id % 50)::VARCHAR || 'E',
        |                 hgvsc := 'c.' || (doc_id % 13)::VARCHAR || '>A',
        |                 hgvspShort := 'p.SS', variantClassification := 'ClassS')] AS summ
        |  FROM v),
        |m AS (
        |  SELECT doc_id, cons,
        |    list_filter(cons, c -> CASE WHEN hp <> 'Not Reported'
        |      THEN c.hgvsp IS NOT NULL AND c.hgvsp <> '' AND contains(c.hgvsp, hp)
        |      ELSE contains(coalesce(c.hgvsc, ''), hc) END) AS hit1,
        |    list_filter(summ, c -> CASE WHEN hp <> 'Not Reported'
        |      THEN c.hgvsp IS NOT NULL AND c.hgvsp <> '' AND contains(c.hgvsp, hp)
        |      ELSE contains(coalesce(c.hgvsc, ''), hc) END) AS hit2,
        |    CASE WHEN contains(hc, 'del') THEN split_part(hc, 'del', 1) || 'del'
        |         WHEN contains(hc, 'dup') THEN split_part(hc, 'dup', 1) || 'dup'
        |         WHEN contains(hc, 'ins') THEN split_part(hc, 'ins', 1) || 'ins'
        |    END AS trunc
        |  FROM p),
        |h AS (
        |  SELECT doc_id, coalesce(hit1[1], hit2[1],
        |    list_filter(cons, c -> trunc IS NOT NULL AND
        |      contains(coalesce(c.hgvsc, ''), trunc))[1]) AS hit
        |  FROM m)
        |SELECT doc_id, hit.hgvspShort AS hgvs_short,
        |       hit.variantClassification AS variant_classification FROM h
        |""".stripMargin,

    "q_p9_ntile" ->
      "SELECT batch, count(*) AS n, sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0 AS batch_total FROM (SELECT o_totalprice, ntile(10) OVER (ORDER BY o_orderkey) AS batch FROM orders) GROUP BY batch",

    "q_x_salted" ->
      "SELECT custkey, o_orderkey, o_totalprice, c_name FROM (SELECT o_custkey AS custkey, o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 = 0) o FULL OUTER JOIN (SELECT c_custkey AS custkey, c_name FROM customer) c USING (custkey)",

    "q_x_sample" ->
      s"SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE substr(md5(o_orderkey::VARCHAR), 1, 8) < '${Sampling.thresholdHex(0.25)}'",

    "q_x_weighted" ->
      ("WITH w AS (SELECT doc_id, length(text)::DOUBLE + 1.0 AS wt, ('0x' || substr(md5('ws' || doc_id::VARCHAR), 1, 8))::BIGINT AS h FROM documents), " +
        "e AS (SELECT doc_id, round(ln((h + 1)::DOUBLE / 4294967297.0) / wt, 9) AS es FROM w) " +
        "SELECT doc_id FROM e ORDER BY es DESC, doc_id LIMIT 100"),

    "q_x_cms" ->
      ("WITH js AS (SELECT unnest(range(0, 4)) AS j), " +
        "e AS (SELECT j, ('0x' || substr(md5('cms' || j::VARCHAR || ':' || l_suppkey::VARCHAR), 1, 15))::BIGINT % 256 AS b FROM lineitem CROSS JOIN js), " +
        "sk AS (SELECT j, b, count(*) AS c FROM e GROUP BY 1, 2), " +
        "q AS (SELECT s_suppkey, j, ('0x' || substr(md5('cms' || j::VARCHAR || ':' || s_suppkey::VARCHAR), 1, 15))::BIGINT % 256 AS b FROM supplier CROSS JOIN js) " +
        "SELECT s_suppkey, min(coalesce(sk.c, 0)) AS est FROM q LEFT JOIN sk USING (j, b) GROUP BY 1"),

    "q_x_kmv" ->
      ("WITH h AS (SELECT DISTINCT ('0x' || substr(md5('kmv' || l_partkey::VARCHAR), 1, 15))::BIGINT AS hv FROM lineitem), " +
        "s AS (SELECT hv FROM h ORDER BY hv LIMIT 256) " +
        "SELECT count(*) AS n, max(hv) AS kth, round(CASE WHEN count(*) < 256 THEN count(*)::DOUBLE ELSE 255.0 * 1152921504606846976.0 / max(hv) END, 2) AS est FROM s"),

    "q_x_kmvgrp" ->
      ("WITH h AS (SELECT DISTINCT l_returnflag AS grp, ('0x' || substr(md5('kmv' || l_partkey::VARCHAR), 1, 15))::BIGINT AS hv FROM lineitem), " +
        "r AS (SELECT grp, hv, row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn FROM h), " +
        "s AS (SELECT grp, hv FROM r WHERE rn <= 128) " +
        "SELECT grp, count(*) AS n, max(hv) AS kth, round(CASE WHEN count(*) < 128 THEN count(*)::DOUBLE ELSE 127.0 * 1152921504606846976.0 / max(hv) END, 2) AS est FROM s GROUP BY 1"),

    "q_x_drift" -> driftOracleSql(withContractBooleans = false),

    // the approx row is gated on its error contract (the
    // q_x_profile_approx pattern): the exact drift report is replayed
    // here and the four per-side sketch-contract booleans are literal
    // TRUE — Spark computes them from the HLL rsd band / the
    // quantile-summary rank guarantee, so a sketch drifting outside
    // its documented bounds on either side hash-mismatches
    "q_x_drift_approx" -> driftOracleSql(withContractBooleans = true),

    "q_x_infogain" -> {
      def leg(name: String, fex: String) =
        s"(WITH c AS (SELECT $fex AS f, lang AS l, count(*) AS c FROM documents WHERE $fex IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2), " +
          "n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c), " +
          "ft AS (SELECT f, CAST(sum(c) AS BIGINT) AS cf FROM c GROUP BY 1), " +
          "sc AS (SELECT CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE) / CAST(cf AS DOUBLE)) * 1e6) AS BIGINT)) AS BIGINT) AS s_cond FROM c JOIN ft USING (f)), " +
          "lt AS (SELECT l, CAST(sum(c) AS BIGINT) AS cl FROM c GROUP BY 1), " +
          "sl AS (SELECT CAST(sum(cl * CAST(round(ln(CAST(cl AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6) AS BIGINT)) AS BIGINT) AS s_lab FROM lt CROSS JOIN n) " +
          s"SELECT '$name' AS feature, n, " +
          "CAST(round(-CAST(s_lab AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) AS h_label_micro, " +
          "CAST(round(-CAST(s_cond AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) AS h_cond_micro, " +
          "CAST(round(-CAST(s_lab AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) - CAST(round(-CAST(s_cond AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) AS ig_micro " +
          "FROM sl CROSS JOIN sc CROSS JOIN n)"
      leg("source", "source") + " UNION ALL " +
        leg("len_bucket", "n_chars // 200")
    },

    // replay: per-source kmv -> pair union top-k -> membership counts
    "q_x_kmvjac" ->
      ("WITH h AS (SELECT DISTINCT source AS grp, ('0x' || substr(md5('kmv' || text), 1, 15))::BIGINT AS hv FROM documents), " +
        "r AS (SELECT grp, hv, row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn FROM h), " +
        "s AS (SELECT grp, hv FROM r WHERE rn <= 128), " +
        "g AS (SELECT DISTINCT grp FROM s), " +
        "p AS (SELECT a.grp AS grp_a, b.grp AS grp_b FROM g a JOIN g b ON a.grp < b.grp), " +
        "m AS (SELECT p.grp_a, p.grp_b, hv, max(CASE WHEN s.grp = p.grp_a THEN 1 ELSE 0 END) AS in_a, max(CASE WHEN s.grp = p.grp_b THEN 1 ELSE 0 END) AS in_b " +
        "FROM p JOIN s ON s.grp = p.grp_a OR s.grp = p.grp_b GROUP BY 1, 2, 3), " +
        "rk AS (SELECT *, row_number() OVER (PARTITION BY grp_a, grp_b ORDER BY hv) AS rn FROM m), " +
        "u AS (SELECT grp_a, grp_b, count(*) AS n_u, max(hv) AS theta, CAST(sum(in_a * in_b) AS BIGINT) AS c_both FROM rk WHERE rn <= 128 GROUP BY 1, 2) " +
        "SELECT grp_a, grp_b, n_u, theta, c_both, " +
        "CAST(round(CAST(c_both AS DOUBLE) / CAST(n_u AS DOUBLE) * 1e6) AS BIGINT) AS jaccard_micro, " +
        "round(CASE WHEN n_u < 128 THEN n_u::DOUBLE ELSE 127.0 * 1152921504606846976.0 / theta END, 2) AS est_union, " +
        "round((CASE WHEN n_u < 128 THEN n_u::DOUBLE ELSE 127.0 * 1152921504606846976.0 / theta END) * (CAST(c_both AS DOUBLE) / CAST(n_u AS DOUBLE)), 2) AS est_inter " +
        "FROM u"),

    // HLL registers p=9: j = top 9 bits of the 60-bit hash, rank =
    // leading zeros of the low-51-bit field + 1 via bin() length —
    // integer/string ops only, register-exact across engines
    "q_x_hll" ->
      ("WITH h AS (SELECT c_mktsegment AS grp, ('0x' || substr(md5('hll' || c_custkey::VARCHAR), 1, 15))::BIGINT AS hv FROM customer WHERE c_custkey IS NOT NULL), " +
        "b AS (SELECT grp, hv // 2251799813685248 AS j, hv % 2251799813685248 AS rem FROM h), " +
        "k AS (SELECT grp, j, CASE WHEN rem = 0 THEN 52 ELSE 52 - length(bin(rem)) END AS rank FROM b) " +
        "SELECT grp, j, CAST(max(rank) AS BIGINT) AS r FROM k GROUP BY 1, 2"),

    "q_x_split" ->
      s"SELECT doc_id, CASE WHEN substr(md5(doc_id::VARCHAR), 1, 8) < '${Sampling.thresholdHex(0.8)}' THEN 'train' WHEN substr(md5(doc_id::VARCHAR), 1, 8) < '${Sampling.thresholdHex(0.9)}' THEN 'val' ELSE 'test' END AS split FROM documents",

    "q_x_groupsplit" ->
      (s"WITH a AS (SELECT source, CASE WHEN substr(md5(source), 1, 8) < '${Sampling.thresholdHex(0.8)}' THEN 'train' WHEN substr(md5(source), 1, 8) < '${Sampling.thresholdHex(0.9)}' THEN 'val' ELSE 'test' END AS split FROM documents) " +
        "SELECT split, count(*) AS n_docs, count(DISTINCT source) AS n_sources FROM a GROUP BY 1"),

    "q_x_lcurve" ->
      Seq(0.1, 0.2, 0.4, 0.8).map { r =>
        val thr = Sampling.thresholdHex(r)
        s"SELECT ${math.round(r * 1e6)} AS rate_ppm, " +
          s"CAST(sum(CASE WHEN substr(md5(doc_id::VARCHAR), 1, 8) < '$thr' THEN 1 ELSE 0 END) AS BIGINT) AS n_rows, " +
          s"CAST(sum(CASE WHEN substr(md5(doc_id::VARCHAR), 1, 8) < '$thr' THEN length(text) ELSE 0 END) AS BIGINT) AS weight_sum FROM documents"
      }.mkString(" UNION ALL "),

    "q_x_balance" ->
      ("WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY 1), " +
        "m AS (SELECT min(cnt) AS nmin FROM c), " +
        "r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang ORDER BY substr(md5(doc_id::VARCHAR), 1, 8), doc_id) AS rk FROM documents) " +
        "SELECT doc_id, lang FROM r CROSS JOIN m WHERE rk <= nmin"),

    "q_x_auc" ->
      ("WITH b AS (SELECT value AS s, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p FROM events WHERE value IS NOT NULL), " +
        "g AS (SELECT s, CAST(sum(p) AS BIGINT) AS n1, CAST(sum(1 - p) AS BIGINT) AS n0 FROM b GROUP BY 1), " +
        "c AS (SELECT n1, n0, CAST(coalesce(sum(n0) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS c0 FROM g), " +
        "t AS (SELECT CAST(sum(n1) AS BIGINT) AS n_pos, CAST(sum(n0) AS BIGINT) AS n_neg, sum(n1 * (2 * c0 + n0)) AS u2 FROM c) " +
        "SELECT n_pos, n_neg, CASE WHEN n_pos > 0 AND n_neg > 0 THEN CAST(round(u2::DOUBLE / (2.0 * n_pos * n_neg) * 1e6) AS BIGINT) END AS auc_micro FROM t"),

    "q_x_calib" ->
      (s"WITH q0 AS (SELECT doc_id, lang, len($toksSql)::DOUBLE AS nw, len(list_filter($toksSql, t -> t IN ('the','a','an','and','or','of','to','in','is','it')))::DOUBLE AS hits, $punctSql AS pr FROM documents), " +
        "q AS (SELECT doc_id, lang, round((least(nw / 100.0, 1.0) + least(hits / greatest(nw, 1.0) * 5.0, 1.0) + (1.0 - least(pr * 5.0, 1.0))) / 3.0, 6) AS score FROM q0), " +
        "b AS (SELECT min(score)::DOUBLE AS lo, max(score)::DOUBLE AS hi FROM q), " +
        "bn AS (SELECT CASE WHEN hi = lo THEN 0 ELSE least(floor((score - lo) * 10 / (hi - lo)), 9) END::BIGINT AS bin, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS p, CAST(round(score * 1e6) AS BIGINT) AS sm FROM q CROSS JOIN b), " +
        "ag AS (SELECT bin, count(*) AS n, CAST(sum(p) AS BIGINT) AS n_pos, CAST(sum(sm) AS BIGINT) AS ssum FROM bn GROUP BY 1), " +
        "m AS (SELECT bin, n, n_pos, CAST(round(ssum::DOUBLE / n) AS BIGINT) AS mean_score_micro, CAST(round(n_pos::DOUBLE / n * 1e6) AS BIGINT) AS pos_rate_micro FROM ag) " +
        "SELECT bin, n, n_pos, mean_score_micro, pos_rate_micro, abs(mean_score_micro - pos_rate_micro) AS gap_micro FROM m"),

    "q_x_kanon" ->
      ("WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS sz FROM customer GROUP BY 1, 2) " +
        "SELECT sz AS class_size, count(*) AS n_classes, CAST(sum(sz) AS BIGINT) AS n_rows, CASE WHEN sz < 5 THEN 1 ELSE 0 END AS violates FROM g GROUP BY 1"),

    "q_x_study" ->
      ("WITH clinical AS (SELECT DISTINCT 's' || c_custkey AS sample_id FROM customer), " +
        "m AS (SELECT DISTINCT 's' || (s_suppkey * 17) AS sample_id FROM supplier), " +
        "cl AS (SELECT DISTINCT 's' || o_custkey AS sample_id FROM orders) " +
        "SELECT 'matrix_samples_in_clinical' AS rule, (SELECT count(*) FROM m) AS n_referenced, (SELECT count(*) FROM m WHERE sample_id NOT IN (SELECT sample_id FROM clinical)) AS n_missing, (SELECT count(*) FROM m WHERE sample_id NOT IN (SELECT sample_id FROM clinical)) = 0 AS pass " +
        "UNION ALL " +
        "SELECT 'case_list_samples_in_clinical' AS rule, (SELECT count(*) FROM cl) AS n_referenced, (SELECT count(*) FROM cl WHERE sample_id NOT IN (SELECT sample_id FROM clinical)) AS n_missing, (SELECT count(*) FROM cl WHERE sample_id NOT IN (SELECT sample_id FROM clinical)) = 0 AS pass"),

    "q_x_joinest" ->
      ("WITH sa AS (SELECT count(o_custkey) AS n_a, count(DISTINCT o_custkey) AS d_a FROM orders), " +
        "sb AS (SELECT count(c_custkey) AS n_b, count(DISTINCT c_custkey) AS d_b FROM customer), " +
        "ac AS (SELECT count(*) AS actual_rows FROM orders JOIN customer ON o_custkey = c_custkey) " +
        "SELECT n_a, d_a, n_b, d_b, CAST(round(n_a::DOUBLE * n_b / greatest(d_a, d_b)) AS BIGINT) AS est_rows, actual_rows FROM sa CROSS JOIN sb CROSS JOIN ac"),

    "q_x_residuals" ->
      ("WITH obs AS (SELECT coalesce(source, '__null__') AS a, coalesce(lang, '__null__') AS b, count(*) AS o FROM documents GROUP BY 1, 2), " +
        "ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM obs GROUP BY 1), " +
        "rb AS (SELECT b, CAST(sum(o) AS BIGINT) AS rb FROM obs GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs), " +
        "grid AS (SELECT a, b, ra, rb, CAST(coalesce(o, 0) AS BIGINT) AS o FROM ra CROSS JOIN rb LEFT JOIN obs USING (a, b)) " +
        "SELECT a, b, o, round(ra::DOUBLE * rb / n, 6) AS expected, " +
        "CAST(round((o - ra::DOUBLE * rb / n) / sqrt(ra::DOUBLE * rb / n) * 1000) AS BIGINT) AS resid_milli " +
        "FROM grid CROSS JOIN tot"),

    "q_x_freshness" ->
      ("WITH g AS (SELECT max(epoch_ns(ts)) AS gmax FROM events) " +
        "SELECT event_type, count(*) AS n, max(epoch_ns(ts)) AS latest_ns, " +
        "(max(gmax) - max(epoch_ns(ts))) // 1000000 AS lag_ms " +
        "FROM events CROSS JOIN g GROUP BY 1"),

    "q_x_stratified" ->
      s"SELECT doc_id, source FROM documents WHERE substr(md5(doc_id::VARCHAR), 1, 8) < (CASE WHEN source = 'src0' THEN '${Sampling.thresholdHex(0.9)}' WHEN source = 'src1' THEN '${Sampling.thresholdHex(0.5)}' ELSE '${Sampling.thresholdHex(0.1)}' END)",

    "q_x_reservoir" ->
      "SELECT user_id, event_id FROM (SELECT user_id, event_id, row_number() OVER (PARTITION BY user_id ORDER BY substr(md5(event_id::VARCHAR), 1, 8), event_id) AS rn FROM events) WHERE rn <= 3",

    "q_x_oversample" ->
      s"SELECT doc_id, unnest(range(1, copies + 1)) AS copy FROM (SELECT doc_id, 2 + CASE WHEN substr(md5(doc_id::VARCHAR), 1, 8) < '${Sampling.thresholdHex(0.3)}' THEN 1 ELSE 0 END AS copies FROM documents)",

    "q_x_shuffle" ->
      "SELECT doc_id, row_number() OVER (ORDER BY substr(md5(doc_id::VARCHAR), 1, 8), doc_id) AS shuffle_rank FROM documents",

    "q_x_interleave" ->
      ("WITH r AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source ORDER BY substr(md5(doc_id::VARCHAR), 1, 8), doc_id) AS rank_in_group FROM documents), " +
        "c AS (SELECT source, count(*) AS c FROM documents GROUP BY 1) " +
        "SELECT doc_id, source, rank_in_group::BIGINT AS rank_in_group, " +
        "((2 * rank_in_group - 1) * 1000000000000) // (2 * c) AS progress_micro " +
        "FROM r JOIN c USING (source)"),

    "q_x_zorder" -> {
      val terms = (0 until 8).map(i =>
        s"((na >> $i) & 1) * ${1L << (2 * i)} + ((nb >> $i) & 1) * ${1L << (2 * i + 1)}")
        .mkString(" + ")
      "WITH s AS (SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax, min(l_suppkey) AS smin, max(l_suppkey) AS smax FROM lineitem), " +
        "n AS (SELECT l_orderkey, l_linenumber, floor((l_partkey - pmin) * 256.0 / (pmax - pmin + 1))::BIGINT AS na, floor((l_suppkey - smin) * 256.0 / (smax - smin + 1))::BIGINT AS nb FROM lineitem CROSS JOIN s) " +
        s"SELECT l_orderkey, l_linenumber, ($terms)::BIGINT AS zval FROM n"
    },

    "q_x_upsert" ->
      ("WITH upd AS (SELECT c_custkey, c_acctbal + 1000.0 AS c_acctbal FROM customer WHERE c_custkey % 7 = 0 " +
        "UNION ALL SELECT c_custkey + 1000000, c_acctbal FROM customer WHERE c_custkey % 13 = 0) " +
        "SELECT c_custkey, c_acctbal FROM upd " +
        "UNION ALL SELECT c_custkey, c_acctbal FROM customer WHERE NOT EXISTS (SELECT 1 FROM upd WHERE upd.c_custkey = customer.c_custkey)"),

    "q_x_cdc" ->
      ("WITH upd AS (SELECT c_custkey, c_name, c_nationkey, CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 1000.0 ELSE c_acctbal END AS c_acctbal, c_mktsegment FROM customer WHERE c_custkey % 11 <> 0 " +
        "UNION ALL SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer WHERE c_custkey % 13 = 0) " +
        "SELECT coalesce(b.c_custkey, u.c_custkey) AS c_custkey, " +
        "CASE WHEN u.c_custkey IS NULL THEN 'delete' WHEN b.c_custkey IS NULL THEN 'insert' " +
        "WHEN NOT (b.c_name IS NOT DISTINCT FROM u.c_name AND b.c_nationkey IS NOT DISTINCT FROM u.c_nationkey AND b.c_acctbal IS NOT DISTINCT FROM u.c_acctbal AND b.c_mktsegment IS NOT DISTINCT FROM u.c_mktsegment) THEN 'update' " +
        "ELSE 'unchanged' END AS change_type " +
        "FROM customer b FULL OUTER JOIN upd u ON b.c_custkey = u.c_custkey"),

    "q_x_scd2" ->
      ("WITH w AS (SELECT o_custkey, o_orderdate, o_orderstatus, o_orderpriority, " +
        "row_number() OVER pk AS rn, lag(o_orderstatus) OVER pk AS ps, lag(o_orderpriority) OVER pk AS pp " +
        "FROM orders WINDOW pk AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)), " +
        "f AS (SELECT *, CASE WHEN rn = 1 OR NOT (o_orderstatus IS NOT DISTINCT FROM ps AND o_orderpriority IS NOT DISTINCT FROM pp) THEN 1 ELSE 0 END AS nv FROM w), " +
        "r AS (SELECT *, sum(nv) OVER (PARTITION BY o_custkey ORDER BY rn ROWS UNBOUNDED PRECEDING) AS run FROM f), " +
        "g AS (SELECT o_custkey, run, min(o_orderdate) AS effective_from, min(rn) AS from_rn, min(o_orderstatus) AS o_orderstatus, min(o_orderpriority) AS o_orderpriority FROM r GROUP BY 1, 2) " +
        "SELECT o_custkey, o_orderstatus, o_orderpriority, effective_from, " +
        "lead(effective_from) OVER v AS effective_to, " +
        "CASE WHEN lead(effective_from) OVER v IS NULL THEN 1 ELSE 0 END AS is_current " +
        "FROM g WINDOW v AS (PARTITION BY o_custkey ORDER BY from_rn)"),

    "q_x_incragg" ->
      ("WITH o AS (SELECT o_custkey, o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders) " +
        "SELECT o_custkey, count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS sum_v FROM o " +
        "WHERE NOT (o_orderkey % 7 <> 0 AND o_orderkey % 11 = 0) GROUP BY 1"),

    "q_x_golden" ->
      ("WITH src AS (SELECT c_custkey % 500 AS cluster, c_custkey, CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_name END AS name, CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_acctbal END AS bal FROM customer), " +
        "g AS (SELECT cluster, row_number() OVER w AS rn, count(*) OVER pw AS n_members, " +
        "first_value(c_custkey IGNORE NULLS) OVER pw AS c_custkey, " +
        "first_value(name IGNORE NULLS) OVER pw AS name, " +
        "first_value(bal IGNORE NULLS) OVER pw AS bal " +
        "FROM src WINDOW w AS (PARTITION BY cluster ORDER BY c_custkey DESC), " +
        "pw AS (PARTITION BY cluster ORDER BY c_custkey DESC ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) " +
        "SELECT cluster, c_custkey, name, bal, n_members FROM g WHERE rn = 1"),

    "q_x_expect" ->
      ("WITH t AS (SELECT count(*) AS total, " +
        "CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v1, " +
        "CAST(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0.0 OR o_totalprice > 1000.0 THEN 1 ELSE 0 END) AS BIGINT) AS v2, " +
        "CAST(sum(CASE WHEN o_orderstatus IS NULL OR o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS v3, " +
        "CAST(sum(CASE WHEN o_orderpriority IS NULL OR NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 ELSE 0 END) AS BIGINT) AS v4 FROM orders), " +
        "u1 AS (SELECT CAST(coalesce(sum(CASE WHEN n > 1 THEN n END), 0) AS BIGINT) AS v, CAST(coalesce(sum(n), 0) AS BIGINT) AS total FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey)), " +
        "u2 AS (SELECT CAST(coalesce(sum(CASE WHEN n > 1 THEN n END), 0) AS BIGINT) AS v, CAST(coalesce(sum(n), 0) AS BIGINT) AS total FROM (SELECT count(*) AS n FROM orders GROUP BY o_custkey)), " +
        "r AS (SELECT 'not_null(o_custkey)' AS rule, v1 AS violations, total FROM t " +
        "UNION ALL SELECT 'in_range(o_totalprice)', v2, total FROM t " +
        "UNION ALL SELECT 'in_set(o_orderstatus)', v3, total FROM t " +
        "UNION ALL SELECT 'matches(o_orderpriority)', v4, total FROM t " +
        "UNION ALL SELECT 'unique(o_orderkey)', v, total FROM u1 " +
        "UNION ALL SELECT 'unique(o_custkey)', v, total FROM u2) " +
        "SELECT rule, violations, total, CASE WHEN violations = 0 THEN 1 ELSE 0 END AS pass FROM r"),

    "q_x_bloomsemi" ->
      "SELECT l_orderkey, l_linenumber FROM lineitem WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey AND o_totalprice > 450000.0)",

    "q_x_bloomanti" ->
      "SELECT l_orderkey, l_linenumber FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey AND o_totalprice > 450000.0)",

    "q_e_zscore" ->
      "SELECT event_id, user_id, CASE WHEN stddev_pop(value) OVER w = 0 OR stddev_pop(value) OVER w IS NULL THEN 0.0 ELSE round((value - avg(value) OVER w) / stddev_pop(value) OVER w, 4) END AS value_z FROM events WINDOW w AS (PARTITION BY user_id)",

    "q_x_budget" ->
      ("WITH c AS (SELECT doc_id, lang, n_chars, sum(n_chars) OVER (PARTITION BY lang ORDER BY substr(md5(doc_id::VARCHAR), 1, 8), doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM documents) " +
        "SELECT doc_id, lang, n_chars FROM c WHERE cum - n_chars < CASE lang WHEN 'en' THEN 30000 WHEN 'es' THEN 10000 ELSE 15000 END"),

    "q_p10_pack" ->
      "SELECT doc_id, n_chars, floor((sum(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_chars) / 5000)::BIGINT AS pack FROM documents",

    "q_c_bowlangid" ->
      (s"WITH $bowOracleBase " +
        "SELECT truth, pred, count(*) AS n FROM base GROUP BY 1, 2"),

    // per-class precision/recall/F1 from the same trained-classifier
    // replay — F1 computed directly from integer counts
    // (2tp/(2tp+fp+fn)) so no rounded-value composition
    "q_c_prf" ->
      (s"WITH $bowOracleBase, " +
        "cls AS (SELECT truth AS cls FROM base UNION SELECT pred FROM base), " +
        "tpc AS (SELECT truth AS cls, count(*) AS tp FROM base WHERE truth = pred GROUP BY 1), " +
        "tn AS (SELECT truth AS cls, count(*) AS n_truth FROM base GROUP BY 1), " +
        "pn AS (SELECT pred AS cls, count(*) AS n_pred FROM base GROUP BY 1) " +
        "SELECT cls, coalesce(n_truth, 0) AS n_truth, coalesce(n_pred, 0) AS n_pred, coalesce(tp, 0) AS tp, " +
        "CASE WHEN coalesce(n_pred, 0) = 0 THEN 0 ELSE CAST(round(CAST(coalesce(tp, 0) AS DOUBLE) / CAST(n_pred AS DOUBLE) * 1e6) AS BIGINT) END AS precision_micro, " +
        "CASE WHEN coalesce(n_truth, 0) = 0 THEN 0 ELSE CAST(round(CAST(coalesce(tp, 0) AS DOUBLE) / CAST(n_truth AS DOUBLE) * 1e6) AS BIGINT) END AS recall_micro, " +
        "CASE WHEN 2 * coalesce(tp, 0) + (coalesce(n_pred, 0) - coalesce(tp, 0)) + (coalesce(n_truth, 0) - coalesce(tp, 0)) = 0 THEN 0 " +
        "ELSE CAST(round(CAST(2 * coalesce(tp, 0) AS DOUBLE) / CAST(2 * coalesce(tp, 0) + (coalesce(n_pred, 0) - coalesce(tp, 0)) + (coalesce(n_truth, 0) - coalesce(tp, 0)) AS DOUBLE) * 1e6) AS BIGINT) END AS f1_micro " +
        "FROM cls LEFT JOIN tpc USING (cls) LEFT JOIN tn USING (cls) LEFT JOIN pn USING (cls)"),

    "q_x_tempmix" ->
      ("WITH c AS (SELECT lang, count(*) AS n, CAST(round(sqrt(count(*)) * 1e6) AS BIGINT) AS w FROM documents GROUP BY 1), " +
        "z AS (SELECT CAST(sum(w) AS BIGINT) AS z FROM c), " +
        "r AS (SELECT lang, CAST(round(least(1.0, 300.0 * w / z / n) * 4294967296.0) AS BIGINT) AS thr FROM c CROSS JOIN z) " +
        "SELECT doc_id, lang, source FROM documents JOIN r USING (lang) WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT < thr"),

    "q_p11_packexact" ->
      ("WITH c AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w, CAST(sum(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM documents WHERE n_chars > 0), " +
        "s AS (SELECT doc_id, w, cum - w AS strt, unnest(range((cum - w) // 512, (cum - 1) // 512 + 1)) AS seq_id FROM c) " +
        "SELECT doc_id, w AS n_tokens, seq_id, greatest(seq_id * 512 - strt, 0) AS span_start, " +
        "least((seq_id + 1) * 512, strt + w) - strt AS span_end, " +
        "greatest(strt - seq_id * 512, 0) AS seq_off FROM s"),

    // q_s_ivf with nProbe = number of centroids searches every bucket,
    // so the exact brute-force top-k is the correct oracle
    "q_s_ivf" ->
      s"WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), q AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 10), s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, ${cosSql("q.v", "c.v")} AS cos FROM c CROSS JOIN q WHERE q.vec_id <> c.vec_id) SELECT query_id, neighbor_id, cos, rank FROM (SELECT s.*, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM s) WHERE rank <= 5",

    "q_sql_agg" ->
      "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 4) AS sum_qty, round(sum(l_extendedprice), 2) AS sum_price, count(*) AS cnt FROM lineitem WHERE l_discount > 0.02 GROUP BY l_returnflag, l_linestatus",

    "q_sql_exists" ->
      "SELECT c_custkey, c_name FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)",

    "q_sql_notin" ->
      "SELECT c_custkey FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000 AND o_custkey IS NOT NULL)",

    "q_sql_frames" ->
      ("SELECT o_orderkey, o_custkey, " +
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_30d, " +
        "count(*) OVER w AS n_30d FROM orders " +
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)"),

    "q_sql_rollup" ->
      "SELECT coalesce(l_returnflag, '<all>') AS flag, coalesce(l_linestatus, '<all>') AS status, count(*) AS cnt, round(sum(l_quantity), 4) AS sum_qty FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)",

    "q_sql_cube" ->
      "SELECT coalesce(o_orderstatus, '<all>') AS status, coalesce(o_orderpriority, '<all>') AS priority, count(*) AS cnt, round(sum(o_totalprice), 2) AS sum_price FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)",

    "q_sql_gsets" ->
      "SELECT coalesce(l_returnflag, '<any>') AS flag, coalesce(l_linestatus, '<any>') AS status, count(*) AS cnt, round(sum(l_extendedprice), 2) AS sum_price FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))",

    "q_w_funcs" ->
      ("SELECT o_orderkey, o_custkey, row_number() OVER w AS rn, " +
        "round(coalesce(lag(o_totalprice) OVER w, 0.0), 2) AS prev_price, " +
        "round(coalesce(lead(o_totalprice) OVER w, 0.0), 2) AS next_price, " +
        "round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING), 2) AS run_total " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"),

    "q_x_histogram" ->
      ("WITH b AS (SELECT min(l_extendedprice)::DOUBLE AS lo, max(l_extendedprice)::DOUBLE AS hi FROM lineitem) " +
        "SELECT CASE WHEN hi = lo THEN 0 ELSE least(floor((l_extendedprice - lo) * 20 / (hi - lo)), 19) END::BIGINT AS bin, count(*) AS n FROM lineitem CROSS JOIN b GROUP BY 1"),

    "q_x_histqgrp" ->
      ("WITH nn AS (SELECT l_returnflag AS grp, l_extendedprice AS v FROM lineitem WHERE l_extendedprice IS NOT NULL), " +
        "b AS (SELECT grp, min(v)::DOUBLE AS lo, max(v)::DOUBLE AS hi FROM nn GROUP BY 1), " +
        "bc AS (SELECT nn.grp, CASE WHEN hi = lo THEN 0 ELSE least(floor((v - lo) * 64 / (hi - lo)), 63) END::BIGINT AS bin, count(*) AS c FROM nn JOIN b ON nn.grp = b.grp GROUP BY 1, 2), " +
        "cum AS (SELECT grp, bin, c, CAST(sum(c) OVER (PARTITION BY grp ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cm FROM bc), " +
        "cw AS (SELECT grp, bin, c, cm, cm - c AS cbv FROM cum), " +
        "tot AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM bc GROUP BY 1), " +
        "j AS (SELECT tot.grp, pp, n, lo, hi, pp * n AS t FROM (SELECT unnest([0.5, 0.95]) AS pp) p CROSS JOIN tot JOIN b ON tot.grp = b.grp), " +
        "r AS (SELECT j.grp, j.pp, j.n, j.lo, j.hi, j.t, cw.bin, cw.c, cw.cbv FROM j JOIN cw ON cw.grp = j.grp AND cw.cbv < j.t AND cw.cm >= j.t) " +
        "SELECT grp AS l_returnflag, CAST(round(pp * 1e6) AS BIGINT) AS p_ppm, n, " +
        "CAST(round((lo + (bin + (t - cbv) / c) * (hi - lo) / 64) * 1e6) AS BIGINT) AS est_micro FROM r"),

    "q_x_histq" ->
      ("WITH nn AS (SELECT l_extendedprice AS v FROM lineitem WHERE l_extendedprice IS NOT NULL), " +
        "b AS (SELECT min(v)::DOUBLE AS lo, max(v)::DOUBLE AS hi FROM nn), " +
        "bc AS (SELECT CASE WHEN hi = lo THEN 0 ELSE least(floor((v - lo) * 64 / (hi - lo)), 63) END::BIGINT AS bin, count(*) AS c FROM nn CROSS JOIN b GROUP BY 1), " +
        "cum AS (SELECT bin, c, CAST(sum(c) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cm FROM bc), " +
        "cw AS (SELECT bin, c, cm, cm - c AS cbv FROM cum), " +
        "tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM bc), " +
        "j AS (SELECT pp, n, lo, hi, pp * n AS t FROM (SELECT unnest([0.5, 0.95, 0.99]) AS pp) CROSS JOIN tot CROSS JOIN b), " +
        "r AS (SELECT j.pp, j.n, j.lo, j.hi, j.t, cw.bin, cw.c, cw.cbv FROM j JOIN cw ON cw.cbv < j.t AND cw.cm >= j.t) " +
        "SELECT CAST(round(pp * 1e6) AS BIGINT) AS p_ppm, n, " +
        "CAST(round((lo + (bin + (t - cbv) / c) * (hi - lo) / 64) * 1e6) AS BIGINT) AS est_micro FROM r"),

    "q_x_eqdepth" -> {
      val bounds = (1 until 8).map(i =>
        s"round(quantile_cont(l_extendedprice, ${i / 8.0}), 6) AS b$i").mkString(", ")
      val bin = (1 until 8).map(i =>
        s"CASE WHEN l_extendedprice > b$i THEN 1 ELSE 0 END").mkString(" + ")
      s"WITH q AS (SELECT $bounds FROM lineitem) " +
        s"SELECT ($bin)::BIGINT AS bin, count(*) AS n FROM lineitem CROSS JOIN q " +
        "WHERE l_extendedprice IS NOT NULL GROUP BY 1"
    },

    "q_x_psi" ->
      ("WITH b AS (SELECT min(l_extendedprice)::DOUBLE AS lo, max(l_extendedprice)::DOUBLE AS hi FROM lineitem WHERE l_orderkey % 2 = 0), " +
        "r AS (SELECT (CASE WHEN hi = lo THEN 0 ELSE greatest(least(floor((l_extendedprice - lo) * 10 / (hi - lo)), 9), 0) END)::BIGINT AS bin, count(*) AS n FROM lineitem CROSS JOIN b WHERE l_orderkey % 2 = 0 AND l_extendedprice IS NOT NULL GROUP BY 1), " +
        "c AS (SELECT (CASE WHEN hi = lo THEN 0 ELSE greatest(least(floor((l_extendedprice - lo) * 10 / (hi - lo)), 9), 0) END)::BIGINT AS bin, count(*) AS n FROM lineitem CROSS JOIN b WHERE l_orderkey % 2 = 1 AND l_extendedprice IS NOT NULL GROUP BY 1), " +
        "tr AS (SELECT sum(n)::DOUBLE AS t FROM r), tc AS (SELECT sum(n)::DOUBLE AS t FROM c), " +
        "s AS (SELECT unnest(range(0, 10)) AS bin) " +
        "SELECT s.bin, coalesce(r.n, 0) AS n_ref, coalesce(c.n, 0) AS n_cur, " +
        "round(((coalesce(r.n, 0) + 1.0) / (tr.t + 10) - (coalesce(c.n, 0) + 1.0) / (tc.t + 10)) * ln(((coalesce(r.n, 0) + 1.0) / (tr.t + 10)) / ((coalesce(c.n, 0) + 1.0) / (tc.t + 10))), 6) AS psi_term " +
        "FROM s LEFT JOIN r ON s.bin = r.bin LEFT JOIN c ON s.bin = c.bin CROSS JOIN tr CROSS JOIN tc"),

    "q_x_corr" ->
      ("SELECT col_a, col_b, corr FROM (" +
        "SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, round(corr(l_quantity, l_extendedprice), 4) AS corr FROM lineitem " +
        "UNION ALL SELECT 'l_quantity', 'l_discount', round(corr(l_quantity, l_discount), 4) FROM lineitem " +
        "UNION ALL SELECT 'l_extendedprice', 'l_discount', round(corr(l_extendedprice, l_discount), 4) FROM lineitem)"),

    "q_sql_join3" ->
      "SELECT c_mktsegment, o_orderpriority, count(*) AS n_items, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey WHERE o_totalprice > 500.0 GROUP BY c_mktsegment, o_orderpriority",

    "q_sql_join5" ->
      "SELECT r_name, o_orderpriority, count(*) AS n_items, sum(l_quantity) AS qty FROM region JOIN nation ON n_regionkey = r_regionkey JOIN customer ON c_nationkey = n_nationkey JOIN orders ON o_custkey = c_custkey JOIN lineitem ON l_orderkey = o_orderkey GROUP BY r_name, o_orderpriority",

    "q_a3_distinct" ->
      "SELECT DISTINCT event_type FROM events",

    "q_a4_droprows" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",

    "q_f7_names" ->
      "SELECT doc_id, 'doc_' || doc_id || '_annotated.maf' AS maf_name, 'bkt-' || source AS bucket, 'f' || doc_id || '.vcf.gz' AS fname FROM documents",

    "q_d_lsh" -> {
      val mh = (0 until 8).map { i =>
        val a = graft.functions.TextFns.minhashA(i)
        val b = graft.functions.TextFns.minhashB(i)
        s"list_min(list_transform(sh, g -> ($a * (${h60Sql("g")} % $P) + $b) % $P)) AS mh_$i"
      }.mkString(", ")
      val bandSelects = (0 until 4).map { bnd =>
        s"SELECT doc_id, $bnd AS band, ${h60Sql(s"mh_${2 * bnd}::VARCHAR || '_' || mh_${2 * bnd + 1}::VARCHAR")} AS bucket FROM sig"
      }.mkString(" UNION ALL ")
      s"WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents WHERE len($toksSql) >= 3), d AS (SELECT doc_id, $shinglesSql AS sh FROM t), sig AS (SELECT doc_id, $mh FROM d), bk AS ($bandSelects) SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS band_matches FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id GROUP BY 1, 2"
    },

    // the END-TO-END dedup composition, oracle-checked whole: LSH
    // candidates (q_d_lsh's SQL) -> Jaccard confirm (q_d_jaccard's
    // set algebra) -> connected components via WITH RECURSIVE
    // min-label propagation (the fixpoint dupClusters reaches
    // iteratively) -> representative filter
    "q_d_pipeline" -> {
      val mh = (0 until 8).map { i =>
        val a = graft.functions.TextFns.minhashA(i)
        val b = graft.functions.TextFns.minhashB(i)
        s"list_min(list_transform(sh, g -> ($a * (${h60Sql("g")} % $P) + $b) % $P)) AS mh_$i"
      }.mkString(", ")
      val bandSelects = (0 until 4).map { bnd =>
        s"SELECT doc_id, $bnd AS band, ${h60Sql(s"mh_${2 * bnd}::VARCHAR || '_' || mh_${2 * bnd + 1}::VARCHAR")} AS bucket FROM sig"
      }.mkString(" UNION ALL ")
      val jac = "CASE WHEN len(list_distinct(list_concat(da.sh, db.sh))) = 0 THEN 0.0 ELSE len(list_intersect(da.sh, db.sh))::DOUBLE / len(list_distinct(list_concat(da.sh, db.sh))) END"
      s"WITH RECURSIVE t AS (SELECT doc_id, $toksSql AS tk FROM documents WHERE len($toksSql) >= 3), " +
        s"d AS (SELECT doc_id, $shinglesSql AS sh FROM t), " +
        s"sig AS (SELECT doc_id, $mh FROM d), bk AS ($bandSelects), " +
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id), " +
        s"conf AS (SELECT id_a, id_b FROM cand JOIN d da ON da.doc_id = cand.id_a JOIN d db ON db.doc_id = cand.id_b WHERE $jac >= 0.5), " +
        ccTailSql("conf", "t", "doc_id")
    },

    "q_d_pipeline_sim" -> {
      s"WITH RECURSIVE t AS (SELECT doc_id, list_transform($toksSql, x -> ${h60Sql("x")}) AS hs FROM documents), " +
        s"s AS (SELECT doc_id, ${simhashSql(60)} AS sig FROM t), " +
        // hamming via one bit_count(xor) intrinsic — same reduction
        // TextFns.hamming compiles to on the Spark side
        "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM s a JOIN s b ON a.doc_id < b.doc_id WHERE bit_count(xor(a.sig, b.sig)) <= 3), " +
        ccTailSql("p", "t", "doc_id")
    },

    // same pair CTE as q_d_pipeline_sim, then cluster labels (not the
    // keep-min filter), micro-unit quality, and one argmax window
    "q_d_keepbest" -> {
      s"WITH RECURSIVE t AS (SELECT doc_id, list_transform($toksSql, x -> ${h60Sql("x")}) AS hs FROM documents), " +
        s"s AS (SELECT doc_id, ${simhashSql(60)} AS sig FROM t), " +
        "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM s a JOIN s b ON a.doc_id < b.doc_id WHERE bit_count(xor(a.sig, b.sig)) <= 3), " +
        "edges AS (SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p), " +
        "walk(node, lbl) AS (SELECT src, src FROM edges UNION SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node), " +
        "cc AS (SELECT node, min(lbl) AS cluster FROM walk GROUP BY 1), " +
        s"q AS (SELECT doc_id, len($toksSql)::DOUBLE AS nw, len(list_filter($toksSql, x -> x IN ('the','a','an','and','or','of','to','in','is','it')))::DOUBLE AS hits, $punctSql AS pr FROM documents), " +
        "qm AS (SELECT doc_id, CAST(round(round((least(nw / 100.0, 1.0) + least(hits / greatest(nw, 1.0) * 5.0, 1.0) + (1.0 - least(pr * 5.0, 1.0))) / 3.0, 6) * 1e6) AS BIGINT) AS micros FROM q), " +
        "m AS (SELECT d.doc_id, coalesce(cc.cluster, d.doc_id) AS cluster, qm.micros FROM documents d JOIN qm USING (doc_id) LEFT JOIN cc ON cc.node = d.doc_id), " +
        "r AS (SELECT doc_id, row_number() OVER (PARTITION BY cluster ORDER BY micros DESC, doc_id) AS rk FROM m) " +
        "SELECT doc_id FROM r WHERE rk = 1"
    },

    "q_d_pipeline_emb" -> {
      s"WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 300), " +
        s"p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM e a JOIN e b ON a.vec_id < b.vec_id WHERE ${cosSql("a.v", "b.v")} >= 0.3), " +
        ccTailSql("p", "e", "vec_id")
    },

    // multi-probe SRP pairs (q_s_multiprobe's expansion, at minCos
    // 0.3) -> the same recursive-CTE connected-components tail: the
    // approximate end-to-end semantic dedup, hash-checked whole
    "q_d_pipeline_emb_ann" -> {
      s"WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 300), " +
        s"b AS (SELECT vec_id, v, ${srpBucketSql("v")} AS bucket FROM e), " +
        "pr AS (SELECT vec_id, unnest(list_concat([bucket], list_transform(range(0, 8), p -> xor(bucket, (1::BIGINT << p))))) AS pbucket FROM b), " +
        "cand AS (SELECT DISTINCT a.vec_id AS id_a, h.vec_id AS id_b FROM pr a JOIN b h ON a.pbucket = h.bucket AND a.vec_id < h.vec_id), " +
        s"p AS (SELECT c.id_a, c.id_b FROM cand c JOIN e ea ON ea.vec_id = c.id_a JOIN e eb ON eb.vec_id = c.id_b WHERE ${cosSql("ea.v", "eb.v")} >= 0.3), " +
        ccTailSql("p", "e", "vec_id")
    },

    // the embedding ingest loop replayed whole: per batch the
    // in-batch multiprobe ANN dedup (cand/conf + recursive-CTE CC,
    // the q_d_pipeline_emb_ann shape), then the store after batch 1
    // (= batch-1 survivors' bucket rows) screens batch 2 through the
    // same multiprobe expansion with the exact cosine confirm; the
    // bucket-size guard is replayed on the store side exactly as the
    // engine's window applies it
    "q_s_ingest" -> {
      def gen(g: Int, parity: Int): String =
        s"e$g AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 2000 AND vec_id % 2 = $parity), " +
          s"b$g AS MATERIALIZED (SELECT vec_id, v, ${srpBucketSql("v")} AS bucket FROM e$g), " +
          s"pr$g AS (SELECT vec_id, unnest(list_concat([bucket], list_transform(range(0, 8), q -> xor(bucket, (1::BIGINT << q))))) AS pbucket FROM b$g), " +
          s"cand$g AS (SELECT DISTINCT a.vec_id AS id_a, h.vec_id AS id_b FROM pr$g a JOIN b$g h ON a.pbucket = h.bucket AND a.vec_id < h.vec_id), " +
          s"conf$g AS (SELECT id_a, id_b FROM cand$g JOIN e$g ea ON ea.vec_id = cand$g.id_a JOIN e$g eb ON eb.vec_id = cand$g.id_b WHERE ${cosSql("ea.v", "eb.v")} >= 0.3), " +
          ccCtesSql(s"conf$g", s"s$g")
      "WITH RECURSIVE " + gen(1, 0) + ", " + gen(2, 1) + ", " +
        "surv1 AS MATERIALIZED (SELECT vec_id FROM e1 WHERE vec_id NOT IN (SELECT id FROM s1dropped)), " +
        "sbk AS MATERIALIZED (SELECT b1.* FROM b1 JOIN surv1 USING (vec_id)), " +
        "sizes AS (SELECT bucket, count(*) AS c FROM sbk GROUP BY 1), " +
        "okst AS (SELECT sbk.* FROM sbk JOIN sizes USING (bucket) WHERE c <= 1000), " +
        "isurv2 AS MATERIALIZED (SELECT vec_id FROM e2 WHERE vec_id NOT IN (SELECT id FROM s2dropped)), " +
        s"xdup AS (SELECT DISTINCT p2.vec_id FROM pr2 p2 JOIN isurv2 USING (vec_id) JOIN okst ON p2.pbucket = okst.bucket JOIN e2 ea ON ea.vec_id = p2.vec_id WHERE ${cosSql("ea.v", "okst.v")} >= 0.3) " +
        "SELECT 1 AS batch, vec_id FROM surv1 " +
        "UNION ALL SELECT 2, vec_id FROM isurv2 WHERE vec_id NOT IN (SELECT vec_id FROM xdup)"
    },

    // full IVF cascade with one Lloyd pass: seed assignment -> per-dim
    // means rounded to 6 dp (matching the Spark wrapper) -> re-assign
    // -> probe the 3 nearest refined centroids -> exact top-5 re-rank
    // inside the probed buckets only
    "q_s_ivf_lloyd" -> {
      s"WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "seeds AS (SELECT vec_id AS centroid_id, v AS cvec FROM e ORDER BY vec_id LIMIT 8), " +
        s"a0 AS (SELECT vec_id, v, centroid_id FROM (SELECT e.vec_id, e.v, s.centroid_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cosRawSql("e.v", "s.cvec")} DESC, s.centroid_id) AS rn FROM e CROSS JOIN seeds s) WHERE rn = 1), " +
        "dims AS (SELECT centroid_id, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM a0), " +
        "ref AS (SELECT centroid_id, list(m ORDER BY pos) AS cvec FROM (SELECT centroid_id, pos, round(avg(x), 6) AS m FROM dims GROUP BY 1, 2) GROUP BY centroid_id), " +
        s"a1 AS (SELECT vec_id, v, centroid_id FROM (SELECT e.vec_id, e.v, r.centroid_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cosRawSql("e.v", "r.cvec")} DESC, r.centroid_id) AS rn FROM e CROSS JOIN ref r) WHERE rn = 1), " +
        "q AS (SELECT vec_id, v FROM e WHERE vec_id < 10), " +
        s"probes AS (SELECT vec_id AS query_id, v AS qv, centroid_id FROM (SELECT q.vec_id, q.v, r.centroid_id, row_number() OVER (PARTITION BY q.vec_id ORDER BY ${cosRawSql("q.v", "r.cvec")} DESC, r.centroid_id) AS rn FROM q CROSS JOIN ref r) WHERE rn <= 3), " +
        s"cands AS (SELECT p.query_id, a.vec_id AS neighbor_id, ${cosSql("p.qv", "a.v")} AS cos FROM probes p JOIN a1 a ON p.centroid_id = a.centroid_id WHERE p.query_id <> a.vec_id) " +
        "SELECT query_id, neighbor_id, cos, rank FROM (SELECT c.*, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM cands c) WHERE rank <= 5"
    }
  )
}
