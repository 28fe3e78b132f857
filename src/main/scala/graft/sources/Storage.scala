package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed/partitioned storage helpers (SURVEY.md §4 "partitioning /
  * shuffle"): pre-shuffle tables ONCE at write time so every later
  * join/aggregation on the bucket keys runs exchange-free.
  *
  * The 100 TB layout for the genomic tables: partition by chrom
  * (partition pruning for per-chromosome queries), bucket by sample_id
  * (co-located sample-keyed joins and pivots). Parquet + explicit
  * bucket counts sized so a bucket ≈ one task's memory budget.
  */
object Storage {

  /** Parse a possibly database-qualified table name (`tbl` or
    * `db.tbl`) through the session's own SQL parser — raw-string
    * `TableIdentifier(name)` would treat `db.tbl` as one unqualified
    * name and whole-name backtick quoting would produce an invalid
    * identifier in DDL. */
  private def ident(spark: SparkSession, table: String)
      : org.apache.spark.sql.catalyst.TableIdentifier =
    spark.sessionState.sqlParser.parseTableIdentifier(table)

  /** Write `df` bucketed by `bucketKeys` (sorted within buckets) as a
    * catalog table backed by parquet at `path`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketKeys: Seq[String], buckets: Int,
                    sortKeys: Seq[String] = Seq.empty,
                    partitionKeys: Seq[String] = Seq.empty): Unit = {
    var w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .option("path", path)
      .bucketBy(buckets, bucketKeys.head, bucketKeys.tail: _*)
    if (sortKeys.nonEmpty) w = w.sortBy(sortKeys.head, sortKeys.tail: _*)
    if (partitionKeys.nonEmpty) w = w.partitionBy(partitionKeys: _*)
    w.saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Append `df` into an existing bucketed table under the TABLE'S OWN
    * bucket spec (keys, count, sort) read from the catalog — the
    * ingest leg of a store lifecycle: write once with
    * [[writeBucketed]], then fold each accepted batch in without
    * rewriting the corpus. Each append adds ≤ (writing tasks ×
    * buckets) files — the batch is NOT re-shuffled to bucket-align
    * (that would put a shuffle on the ingest hot path), so every
    * writing task opens a file per bucket it sees; measured: 4 gens ×
    * 32 tasks × 32 buckets = 4096 files on the sf10-store fixture,
    * which [[compactBucketed]] collapsed back to 32 in 2.6 s. Reads
    * stay bucketed (a bucket's files are one scan partition),
    * so probe joins on the bucket keys remain exchange-free across
    * generations. After many small batches, reclaim the file count
    * with [[compactBucketed]]. The spec is taken from the catalog
    * rather than caller arguments so a drifted caller cannot corrupt
    * the table's co-location contract — Spark itself re-verifies the
    * spec on append. */
  def appendBucketed(spark: SparkSession, df: DataFrame, table: String,
                     commitManifest: Boolean = true): Unit = {
    val meta = spark.sessionState.catalog.getTableMetadata(ident(spark, table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"table $table is not bucketed; appendBucketed requires a bucketed table"))
    var w = df.write.mode(SaveMode.Append).format("parquet")
      .bucketBy(spec.numBuckets,
        spec.bucketColumnNames.head, spec.bucketColumnNames.tail: _*)
    if (spec.sortColumnNames.nonEmpty)
      w = w.sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
    // the catalog's PARTITION columns ride along too — without them
    // Spark rejects the append on a partitioned+bucketed table
    // ("specified partitioning does not match the existing table")
    if (meta.partitionColumnNames.nonEmpty)
      w = w.partitionBy(meta.partitionColumnNames: _*)
    w.saveAsTable(table)
    // CRASH-SAFETY CONTRACT: parquet append is not transactional — a
    // failure during job commit can leave a PARTIAL generation's files
    // visible (task files move one by one from _temporary into place).
    // The manifest written after each SUCCESSFUL append records the
    // committed file set; after a crash, [[recoverToManifest]] deletes
    // any stray files the interrupted append left behind, restoring
    // the last-good generation. Cost per append is one recursive
    // listing of the table directory — bounded when compactBucketed
    // runs on its documented every-N-batches cadence.
    if (commitManifest) writeManifest(spark, table)
  }

  /** Compact a bucketed table accumulated by [[appendBucketed]] back
    * to ONE file per bucket, preserving the bucket spec (probe plans
    * are invariant — pinned in StorageSpec), with ZERO shuffle: the
    * bucketed scan already yields exactly one partition per bucket,
    * so the bucketed re-write opens exactly one file per task. The
    * only subtlety is `autoBucketedScan`: with nothing downstream
    * "needing" the distribution, the planner would decompose the scan
    * into file splits (and an explicit repartition is elided BEFORE
    * that decision, measured — 13 files out of a 4-bucket rewrite),
    * so bucketed scanning is forced ON for the duration. The new
    * generation lands at `newPath` as a temp table, then swaps names
    * — never an in-place overwrite, so the old files stay readable
    * until the swap commits. Returns the OLD generation's directory
    * for deferred deletion under the caller's retention policy
    * ([[retire]] is that policy's executor).
    * A maintenance op run every N batches, never on the query path.
    *
    * SWAP ATOMICITY: the catalog swap is rename-aside —
    * `<t>` → `<t>_precompact`, then `<t>_compacting` → `<t>`, then
    * DROP `<t>_precompact` — so the no-table window is ONE metadata
    * rename wide (the old DROP-then-RENAME form left the whole
    * compaction write inside it). A concurrent reader planning inside
    * that window fails loudly with TABLE_OR_VIEW_NOT_FOUND (retry);
    * readers planned before the swap keep reading the old files,
    * which stay on disk until [[retire]]. CRASH RECOVERY: if a
    * failure lands between the renames, the data is intact under
    * `<t>_precompact` — run `ALTER TABLE <t>_precompact RENAME TO
    * <t>` (and drop `<t>_compacting`) to restore. */
  def compactBucketed(spark: SparkSession, table: String,
                      newPath: String): String = {
    val cat = spark.sessionState.catalog
    val id = ident(spark, table)
    val meta = cat.getTableMetadata(id)
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"table $table is not bucketed; compactBucketed requires a bucketed table"))
    val oldPath = meta.location.toString
    val tmpId = id.copy(table = id.table + "_compacting")
    val asideId = id.copy(table = id.table + "_precompact")
    val auto = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(auto)
    try {
      spark.conf.set(auto, "false")
      // partition columns preserved — dropping them here would
      // silently cost the new generation its directory pruning
      writeBucketed(spark.table(table), tmpId.quotedString, newPath,
        spec.bucketColumnNames, spec.numBuckets, spec.sortColumnNames,
        meta.partitionColumnNames)
    } finally spark.conf.set(auto, prev)
    // rename-aside swap: the only window with no live `table` is
    // between the two renames (one catalog op), and a crash inside it
    // leaves the old generation recoverable under `_precompact`
    spark.sql(s"ALTER TABLE ${id.quotedString} RENAME TO ${asideId.quotedString}")
    spark.sql(s"ALTER TABLE ${tmpId.quotedString} RENAME TO ${id.quotedString}")
    // the table's graft.* properties are SEMANTIC metadata (LSH recipe,
    // hash family — the guards requireLshParams enforces); the rewrite
    // produced a fresh catalog entry without them, so carry them across
    // the swap or the every-N-batches compaction would silently disarm
    // the recipe-drift guard (pinned in DedupSpec's compact-then-drift
    // test)
    val semantic = meta.properties.filter(_._1.startsWith("graft."))
    if (semantic.nonEmpty)
      spark.sql(s"ALTER TABLE ${id.quotedString} SET TBLPROPERTIES (" +
        semantic.map { case (k, v) => s"'$k'='$v'" }.mkString(",") + ")")
    spark.sql(s"DROP TABLE ${asideId.quotedString}")
    // the compacted generation is the new last-good for crash recovery
    writeManifest(spark, table)
    oldPath
  }

  private val ManifestName = "_graft_manifest"

  private def fsOf(spark: SparkSession, path: org.apache.hadoop.fs.Path) =
    path.getFileSystem(spark.sessionState.newHadoopConf())

  /** Data files (relative to `root`) currently visible to a reader:
    * everything except hidden files/dirs (`_`/`.` prefixes — Spark's
    * own listing convention, which also skips `_temporary` and this
    * manifest). */
  private def listDataFiles(spark: SparkSession,
                            root: org.apache.hadoop.fs.Path): Seq[String] = {
    val fs = fsOf(spark, root)
    val rootUri = root.toUri.getPath.stripSuffix("/")
    def hidden(n: String) = n.startsWith("_") || n.startsWith(".")
    def walk(dir: org.apache.hadoop.fs.Path): Seq[String] =
      fs.listStatus(dir).toSeq.filterNot(s => hidden(s.getPath.getName))
        .flatMap { s =>
          if (s.isDirectory) walk(s.getPath)
          else Seq(s.getPath.toUri.getPath.stripPrefix(rootUri).stripPrefix("/"))
        }
    if (fs.exists(root)) walk(root) else Seq.empty
  }

  /** Record the table's CURRENT data-file set as its committed
    * manifest (`_graft_manifest` at the table root, one relative path
    * per line, written atomically via temp-file rename). Called by
    * [[appendBucketed]]/[[compactBucketed]] after every successful
    * mutation; [[recoverToManifest]] restores to it after a crash. */
  def writeManifest(spark: SparkSession, table: String): Unit = {
    val meta = spark.sessionState.catalog.getTableMetadata(ident(spark, table))
    val root = new org.apache.hadoop.fs.Path(meta.location)
    val fs = fsOf(spark, root)
    val files = listDataFiles(spark, root)
    val tmp = new org.apache.hadoop.fs.Path(root, ManifestName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(files.sorted.mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // rename WITH overwrite semantics (FileContext — FileSystem.rename
    // has none): a delete-then-rename pair would open a crash window
    // with NO manifest at all, losing recovery capability exactly when
    // recovery is needed
    org.apache.hadoop.fs.FileContext
      .getFileContext(root.toUri, spark.sessionState.newHadoopConf())
      .rename(tmp, new org.apache.hadoop.fs.Path(root, ManifestName),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Crash recovery for the non-transactional append path: delete
    * every data file under the table root that the committed manifest
    * does not list (the stray partial generation an interrupted
    * [[appendBucketed]] can leave visible), plus any `_temporary`
    * job-attempt litter, then refresh the table's file-listing cache.
    * Run on restart after a crash, BEFORE the next probe/append.
    * Refuses to run without a manifest (nothing to recover TO — a
    * store predating the manifest contract should write one first).
    * Returns the deleted paths (empty = store was clean). */
  def recoverToManifest(spark: SparkSession, table: String): Seq[String] = {
    val meta = spark.sessionState.catalog.getTableMetadata(ident(spark, table))
    val root = new org.apache.hadoop.fs.Path(meta.location)
    val fs = fsOf(spark, root)
    val mf = new org.apache.hadoop.fs.Path(root, ManifestName)
    require(fs.exists(mf),
      s"$table has no $ManifestName — write one (writeManifest) before " +
        "relying on crash recovery")
    val in = fs.open(mf)
    val committed =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toSet
      finally in.close()
    val stray = listDataFiles(spark, root).filterNot(committed)
    stray.foreach(rel =>
      fs.delete(new org.apache.hadoop.fs.Path(root, rel), false))
    val tempDir = new org.apache.hadoop.fs.Path(root, "_temporary")
    val litter = if (fs.exists(tempDir)) {
      fs.delete(tempDir, true); Seq(tempDir.toString)
    } else Seq.empty
    spark.catalog.refreshTable(table)
    stray.map(new org.apache.hadoop.fs.Path(root, _).toString) ++ litter
  }

  /** Retention policy executor for retired generations: delete the
    * directories [[compactBucketed]] returned, oldest-first, keeping
    * the most recent `keepLast` as rollback insurance. REFUSES to
    * touch the table's live location (the one mistake this op must
    * make impossible) and silently skips already-gone paths
    * (idempotent re-runs). Returns the deleted directories. The
    * engine half of the reference's cleanup mode
    * (workflows/cnv.py:502-516 — retire superseded artifacts, never
    * the live ones). */
  def retire(spark: SparkSession, table: String, oldPaths: Seq[String],
             keepLast: Int = 0): Seq[String] = {
    require(keepLast >= 0, s"keepLast=$keepLast")
    val meta = spark.sessionState.catalog.getTableMetadata(ident(spark, table))
    val live = new org.apache.hadoop.fs.Path(meta.location).toUri.getPath
      .stripSuffix("/")
    val toDrop = oldPaths.dropRight(keepLast)
    toDrop.flatMap { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      require(hp.toUri.getPath.stripSuffix("/") != live,
        s"refusing to retire $p: it is $table's LIVE location")
      val fs = fsOf(spark, hp)
      if (fs.exists(hp)) { fs.delete(hp, true); Some(p) } else None
    }
  }

  // ---------- writer lease (concurrent-ingest safety) ----------

  private val LeaseName = "_graft_lease"

  /** A held writer lease on a store table. The random `token` fences
    * release/renew: only the holder that wrote the CURRENT lease file
    * may delete or refresh it, so a writer whose expired lease was
    * broken by a successor can never release the successor's lease. */
  final case class WriterLease(table: String, owner: String, token: String)

  private def leaseFile(spark: SparkSession, table: String)
      : org.apache.hadoop.fs.Path = {
    val meta = spark.sessionState.catalog.getTableMetadata(ident(spark, table))
    new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(meta.location),
      LeaseName)
  }

  private def readLease(fs: org.apache.hadoop.fs.FileSystem,
                        p: org.apache.hadoop.fs.Path): (String, String) = {
    // (token, owner); a torn/empty file (reader raced the holder's
    // create) parses as unknown — staleness still works off mtime
    try {
      val in = fs.open(p)
      val line =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .take(1).toList.headOption.getOrElse("")
        finally in.close()
      line.split('\t') match {
        case Array(tok, own, _*) => (tok, own)
        case _ => ("<unreadable>", "<unknown>")
      }
    } catch { case _: java.io.IOException => ("<unreadable>", "<unknown>") }
  }

  /** Acquire the table's WRITER LEASE, or fail loudly naming the
    * current holder. The mutation ops on a store ([[appendBucketed]],
    * [[compactBucketed]], the composed `Dedup.lshIngestBatch`) are
    * non-transactional parquet + a last-writer-wins manifest: two
    * writers racing the same table interleave their files, and the
    * second manifest silently blesses the union — so concurrent
    * writers must be EXCLUDED, not merged. The lease is a cooperative
    * fence: every writer brackets its mutation in
    * [[withWriterLease]]; a second acquire throws
    * `IllegalStateException` carrying the holder's owner tag and the
    * lease age, and the caller retries after the holder finishes.
    *
    * Mechanics: one `_graft_lease` file at the table root, taken via
    * atomic `create(overwrite = false)` — mutual exclusion is the
    * filesystem's create-exclusivity (atomic on HDFS and HDFS-likes;
    * object stores need a conditional-put flavor — S3 strong
    * consistency + If-None-Match, GCS generation preconditions — or
    * an external lock service). A holder that dies without releasing
    * leaves its file behind: a later acquirer breaks the lease once
    * its age (file mtime) exceeds `ttlMs`, then re-races the create —
    * size `ttlMs` past the longest expected batch wall-clock and
    * [[renewWriterLease]] mid-job if a batch can overrun it. The
    * break-then-create pair is two FS ops, so two breakers can race;
    * exactly one wins the create, the loser gets the loud failure —
    * never two holders. NOT a fence against a dead holder's still-
    * running executors (that needs job-level fencing tokens in the
    * file commit protocol); it is restart/concurrency discipline for
    * cooperative ingest drivers. */
  def acquireWriterLease(spark: SparkSession, table: String, owner: String,
                         ttlMs: Long = 10L * 60 * 1000): WriterLease = {
    require(owner != null && owner.nonEmpty, "lease owner must be non-empty")
    val p = leaseFile(spark, table)
    val fs = fsOf(spark, p)
    val token = java.util.UUID.randomUUID.toString
    def tryCreate(): Boolean =
      try {
        val out = fs.create(p, false)
        try out.write(s"$token\t$owner\t${System.currentTimeMillis}\n"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.io.IOException if fs.exists(p) => false
      }
    if (tryCreate()) return WriterLease(table, owner, token)
    // held — stale-break path: age from mtime survives torn content
    val ageMs =
      try System.currentTimeMillis - fs.getFileStatus(p).getModificationTime
      catch { case _: java.io.FileNotFoundException => Long.MaxValue }
    if (ageMs > ttlMs) {
      try fs.delete(p, false)
      catch { case _: java.io.IOException => () }
      if (tryCreate()) return WriterLease(table, owner, token)
    }
    val (_, heldBy) = readLease(fs, p)
    throw new IllegalStateException(
      s"$table writer lease is held by '$heldBy' (age ${ageMs} ms, " +
        s"ttl $ttlMs ms) — a concurrent append would interleave " +
        "non-transactional generations under one manifest; retry after " +
        "the holder releases or the lease expires")
  }

  /** Refresh a held lease's mtime (resets the TTL clock) — call
    * mid-job when a batch may outlive `ttlMs`. Throws if the lease on
    * disk is no longer OURS (expired and broken by a successor): the
    * caller has lost exclusivity and must abort its append rather
    * than finish and corrupt the successor's generation. */
  def renewWriterLease(spark: SparkSession, lease: WriterLease): Unit = {
    val p = leaseFile(spark, lease.table)
    val fs = fsOf(spark, p)
    val (tok, own) = readLease(fs, p)
    if (tok != lease.token)
      throw new IllegalStateException(
        s"${lease.table} writer lease was lost: now held by '$own' — " +
          "this writer's lease expired and was broken; abort the append")
    val out = fs.create(p, true)
    try out.write(
      s"${lease.token}\t${lease.owner}\t${System.currentTimeMillis}\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Release a held lease. Returns true if OUR lease file was
    * deleted; false (touching nothing) when the file is already gone
    * or a successor broke the expired lease and holds its own —
    * deleting THAT would hand the table to a third writer. */
  def releaseWriterLease(spark: SparkSession, lease: WriterLease): Boolean = {
    val p = leaseFile(spark, lease.table)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return false
    val (tok, _) = readLease(fs, p)
    if (tok != lease.token) false
    else { fs.delete(p, false); true }
  }

  /** Bracket a store mutation in the writer lease:
    * acquire → body → release (release runs on failure too; the lease
    * never outlives the job by more than a crash, and a crashed
    * holder's file expires after `ttlMs`). */
  def withWriterLease[T](spark: SparkSession, table: String, owner: String,
                         ttlMs: Long = 10L * 60 * 1000)(body: => T): T = {
    val lease = acquireWriterLease(spark, table, owner, ttlMs)
    try body finally releaseWriterLease(spark, lease)
  }

  /** Plain partitioned-parquet write (no catalog table): one directory
    * per partition value, so reads filtered on `partitionKeys` prune
    * whole directories before any I/O (`PartitionFilters` in the scan,
    * verified in StorageSpec). The corpus layout knob: partition by
    * low-cardinality routing columns (date, lang, source shard), never
    * by high-cardinality ones — a million tiny directories is the
    * small-file problem with extra steps. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionKeys: Seq[String]): Unit = {
    require(partitionKeys.nonEmpty, "no partition keys")
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionKeys: _*).parquet(path)
  }

  /** Compact a frame to ≈`targetBytes` output files using the plan's
    * own size estimate (no driver collect; the estimate is coarse —
    * parquet encoding typically shrinks it further, so treat
    * `targetBytes` as a lower bound on file size). The answer to the
    * small-file problem a streaming or per-batch ingest leaves behind:
    * read the fragments, write back ceil(bytes/target) files. */
  def compact(df: DataFrame, path: String,
              targetBytes: Long = 128L * 1024 * 1024): Unit = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // BigInt-safe: stats default to huge sentinels for sources without
    // real estimates — cap BEFORE toInt (a raw toInt wraps negative /
    // to 1 and either throws or un-compacts); 65536 tasks of
    // targetBytes is past any single compaction job's sane size
    val parts = ((bytes + targetBytes - 1) / targetBytes)
      .max(BigInt(1)).min(BigInt(65536)).toInt
    df.repartition(parts).write.mode(SaveMode.Overwrite).parquet(path)
  }
}
