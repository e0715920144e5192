package graft.bank

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Log-structured transactional parquet table — the Delta-style index
  * layer from docs/NEXT.md, built on nothing but a filesystem with
  * atomic create-if-absent.
  *
  * Layout:
  * {{{
  *   root/data/<commit-uuid>/part-*.parquet   // immutable data files
  *   root/_txlog/00000000000000000042.json    // one commit = one file
  *   root/_txlog/00000000000000000040.checkpoint.json
  * }}}
  *
  * Each commit file holds one JSON action per line: `add` (path, rows)
  * or `remove` (path). A reader replays the log in version order; the
  * live file set is adds minus removes. Nothing is ever modified in
  * place, so:
  *
  *   - **Atomic commits**: a commit is visible iff its log file exists;
  *     data files written but never committed are invisible garbage.
  *     Version N is claimed put-if-absent through a scheme-resolved
  *     [[TxTable.ClaimStore]]: hardlink on local filesystems (POSIX
  *     rename cannot fail-if-exists), `FileContext.rename(Rename.NONE)`
  *     on HDFS; object-store schemes are REJECTED unless a
  *     conditional-put store is registered
  *     ([[TxTable.registerClaimStore]]) — their copy-based rename
  *     would let two writers win one version and lose a commit.
  *   - **Optimistic concurrency**: writers prepare data files, then try
  *     to claim version `latest+1`; a loser re-reads the log and
  *     retries. Blind appends always commute; `overwrite`/`compact`
  *     recompute their remove-set per attempt.
  *   - **Snapshot isolation / time travel**: `read(Some(v))` resolves
  *     the file list as of version v — concurrent writers never tear a
  *     read.
  *   - **Bounded log replay**: every `checkpointInterval` commits the
  *     full live state is written as `<v>.checkpoint.json`; readers
  *     start from the newest checkpoint ≤ target, so replay cost is
  *     O(interval), not O(table age). At 100 TB the log is KBs per
  *     commit — the index of the index.
  *
  * The reference's HDF5/SQLite banks (obsplus `bank/core.py`,
  * `wavebank.py:247-315`) serialize writers through a single local
  * file; this is the multi-writer contract those banks can't offer.
  */
class TxTable(spark: SparkSession, root: String,
              checkpointInterval: Int = 10,
              mergeSchemaOnRead: Boolean = false,
              tagRetention: Option[Long] = None) {

  // tagRetention is a promise that no producer will ever replay a
  // batch whose commit is more than `r` versions old (see appendOnce's
  // scaladoc). A retention below the checkpoint interval could drop a
  // tag at the very first checkpoint after its commit, breaking
  // exactly-once for even a 1-deep replay — reject it outright.
  require(tagRetention.forall(_ >= checkpointInterval),
    s"tagRetention (${tagRetention.orNull}) must be >= checkpointInterval " +
      s"($checkpointInterval): a smaller horizon can drop a tag at the " +
      "first checkpoint after its commit, so appendOnce would re-commit " +
      "a replayed batch")

  val logDir = s"$root/_txlog"
  val dataDir = s"$root/data"

  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // All _txlog IO goes through the RAW filesystem: ChecksumFileSystem's
  // .crc sidecars are not atomic with their data file under concurrent
  // claims of the same version (observable as ChecksumException on a
  // committed log file); a commit file is all-or-nothing by the claim
  // protocol itself, so the sidecars add risk and no protection here.
  private def rawFs: FileSystem = fs match {
    case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
    case f => f
  }

  // FileContext.rename has the strict no-overwrite contract FileSystem
  // lacks (throws FileAlreadyExistsException) — the HDFS log-store
  // atomic-claim primitive (HDFS rename is atomic server-side)
  private def fc: FileContext =
    FileContext.getFileContext(fs.getUri,
      spark.sparkContext.hadoopConfiguration)

  /** Scheme-gated claim primitive (mirrors Delta's LogStore gating):
    * resolved once; unknown schemes FAIL FAST at first commit instead
    * of silently racing on a copy-based rename.
    */
  private lazy val claimStore: TxTable.ClaimStore =
    TxTable.claimStoreFor(rawFs, fc, logDir)

  private def versionFile(v: Long): Path =
    new Path(logDir, f"$v%020d.json")
  private def checkpointFile(v: Long): Path =
    new Path(logDir, f"$v%020d.checkpoint.json")

  // ---- log encoding (hand-rolled: one self-describing JSON object per
  // line; paths are the only strings and get minimal escaping) ----

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def encode(a: TxAction): String = a match {
    case AddFile(p, rows) => s"""{"add":{"path":"${esc(p)}","rows":$rows}}"""
    case RemoveFile(p) => s"""{"remove":{"path":"${esc(p)}"}}"""
    case CommitTag(t, v) =>
      if (v >= 0) s"""{"tag":{"value":"${esc(t)}","v":$v}}"""
      else s"""{"tag":{"value":"${esc(t)}"}}"""
    case MetaData(schemaJson) => s"""{"meta":{"schema":"${esc(schemaJson)}"}}"""
  }

  private def decode(line: String): Option[TxAction] = {
    // hand-rolled scanner, NOT a regex: the obvious
    // `("((?:[^"\\]|\\.)*)"|[-0-9]+)` pattern backtracks one JVM stack
    // frame per character of the value, and a MetaData line carrying a
    // wide table's schema JSON (the escaped eventSummary schema is
    // ~3.5 KB) overflows the stack — found the day a 31-column schema
    // first went through a TxTable. Linear scan, zero recursion.
    def field(obj: String, k: String): Option[String] = {
      val keyPat = "\"" + k + "\""
      var i = obj.indexOf(keyPat)
      while (i >= 0) {
        var j = i + keyPat.length
        while (j < obj.length && obj.charAt(j).isWhitespace) j += 1
        if (j < obj.length && obj.charAt(j) == ':') {
          j += 1
          while (j < obj.length && obj.charAt(j).isWhitespace) j += 1
          if (j < obj.length && obj.charAt(j) == '"') {
            // string value: unescape (esc() emits only \\ and \") up to
            // the first unescaped close quote
            val sb = new java.lang.StringBuilder
            var p = j + 1
            while (p < obj.length) {
              val c = obj.charAt(p)
              if (c == '\\' && p + 1 < obj.length) {
                sb.append(obj.charAt(p + 1)); p += 2
              } else if (c == '"') return Some(sb.toString)
              else { sb.append(c); p += 1 }
            }
            return None // unterminated string: malformed line
          } else {
            val st = j
            var p = j
            while (p < obj.length &&
              (obj.charAt(p) == '-' || obj.charAt(p).isDigit)) p += 1
            return if (p > st) Some(obj.substring(st, p)) else None
          }
        }
        i = obj.indexOf(keyPat, i + 1)
      }
      None
    }
    val t = line.trim
    if (t.isEmpty) None
    else if (t.startsWith("{\"add\""))
      field(t, "path").map(p => AddFile(p, field(t, "rows").map(_.toLong).getOrElse(0L)))
    else if (t.startsWith("{\"remove\""))
      field(t, "path").map(RemoveFile)
    else if (t.startsWith("{\"tag\""))
      field(t, "value").map(v =>
        CommitTag(v, field(t, "v").map(_.toLong).getOrElse(-1L)))
    else if (t.startsWith("{\"meta\""))
      field(t, "schema").map(MetaData)
    else None // unknown action kinds are skipped (forward compatibility)
  }

  /** Atomic publish through the scheme-resolved [[TxTable.ClaimStore]]:
    * a log file is either absent or complete, never partial, and a
    * claim either wins the version atomically or reports the loss.
    */
  private def writeAtomic(p: Path, lines: Seq[String], overwrite: Boolean): Boolean = {
    val bytes = (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8)
    if (overwrite) { claimStore.put(p, bytes); true }
    else claimStore.putIfAbsent(p, bytes)
  }

  private def readLines(p: Path): Seq[String] = {
    val in = new BufferedReader(
      new InputStreamReader(rawFs.open(p), StandardCharsets.UTF_8))
    try Iterator.continually(in.readLine()).takeWhile(_ != null).toVector
    finally in.close()
  }

  // ---- snapshot resolution ----

  private def listLog(): (Seq[Long], Seq[Long]) = { // (commits, checkpoints)
    if (!rawFs.exists(new Path(logDir))) return (Nil, Nil)
    val names = rawFs.listStatus(new Path(logDir)).map(_.getPath.getName)
    val commits = names.collect {
      case n if n.matches("\\d{20}\\.json") => n.take(20).toLong
    }.sorted.toSeq
    val cps = names.collect {
      case n if n.matches("\\d{20}\\.checkpoint\\.json") => n.take(20).toLong
    }.sorted.toSeq
    (commits, cps)
  }

  /** Latest committed version, or -1 for an empty table. */
  def latestVersion(): Long = listLog()._1.lastOption.getOrElse(-1L)

  /** Live (path → rows) as of `version` (default: latest). */
  def snapshot(version: Option[Long] = None): Seq[AddFile] = {
    val (commits, cps) = listLog()
    val target = version.getOrElse(commits.lastOption.getOrElse(-1L))
    require(version.forall(v => commits.contains(v) || cps.contains(v)) || commits.isEmpty,
      s"version ${version.getOrElse(-1L)} not in log (have ${commits.take(5)}...)")
    val startCp = cps.filter(_ <= target).lastOption
    val live = mutable.LinkedHashMap.empty[String, AddFile]
    startCp.foreach { v =>
      readLines(checkpointFile(v)).flatMap(decode).foreach {
        case a: AddFile => live(a.path) = a
        case RemoveFile(p) => live.remove(p)
        case _ => ()
      }
    }
    commits.filter(v => v <= target && startCp.forall(v > _)).foreach { v =>
      readLines(versionFile(v)).flatMap(decode).foreach {
        case a: AddFile => live(a.path) = a
        case RemoveFile(p) => live.remove(p)
        case _ => ()
      }
    }
    live.values.toVector
  }

  /** Last committed schema (a `meta` action) as of `target`. */
  private def schemaJsonAt(commits: Seq[Long], cps: Seq[Long],
                           target: Long): Option[String] = {
    val startCp = cps.filter(_ <= target).lastOption
    var meta: Option[String] = startCp.flatMap(v =>
      readLines(checkpointFile(v)).flatMap(decode)
        .collectFirst { case MetaData(j) => j })
    commits.filter(v => v <= target && startCp.forall(v > _)).foreach { v =>
      readLines(versionFile(v)).flatMap(decode).foreach {
        case MetaData(j) => meta = Some(j)
        case _ => ()
      }
    }
    meta
  }

  /** Read the table (optionally as of an older version).
    * `mergeSchemaOnRead` reconciles commits written before a schema
    * extension (an all-footers pass per read — leave it off for
    * stable-schema tables like the bank indices, whose writers conform
    * batches before committing).
    */
  def read(version: Option[Long] = None): DataFrame = {
    val files = snapshot(version).map(_.path)
    if (files.isEmpty) {
      // empty live set: the committed schema survives in the log's
      // `meta` actions, so downstream plans (compaction, watermark
      // aggregates) still resolve their columns
      val (commits, cps) = listLog()
      val target = version.getOrElse(commits.lastOption.getOrElse(-1L))
      schemaJsonAt(commits, cps, target).map { j =>
        val schema = org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      }.getOrElse(spark.emptyDataFrame)
    }
    else if (mergeSchemaOnRead)
      spark.read.option("mergeSchema", "true").parquet(files: _*)
    else spark.read.parquet(files: _*)
  }

  // ---- commits ----

  /** Claim `v` with `actions`; false if someone else won the version. */
  private def tryCommit(v: Long, actions: Seq[TxAction]): Boolean = {
    rawFs.mkdirs(new Path(logDir))
    val ok = writeAtomic(versionFile(v), actions.map(encode), overwrite = false)
    if (ok && v > 0 && v % checkpointInterval == 0) {
      // checkpoint is derived state: safe to (re)write with overwrite.
      // It carries the tag set (each tag stamped with its commit
      // version) and the latest schema, so tags() replay and
      // empty-table reads are O(interval) — not O(table age).
      // tagRetention drops tags whose commit is older than the horizon
      // the producer's own checkpoint could ever replay, bounding the
      // tag set for long-lived streams (docs/NEXT.md).
      val (commits, cps) = listLog()
      val horizon = tagRetention.map(r => v - r).getOrElse(Long.MinValue)
      val tagLines = tagsFrom(commits, cps, v)
        .filter { case (tv, _) => tv < 0 || tv >= horizon }
        .map { case (tv, t) => encode(CommitTag(t, tv)) }
      val metaLine =
        schemaJsonAt(commits, cps, v).map(j => encode(MetaData(j))).toSeq
      val full = snapshot(Some(v)).map(a => encode(a)) ++ metaLine ++ tagLines
      writeAtomic(checkpointFile(v), full, overwrite = true)
    }
    ok
  }

  /** All (commitVersion, tag) pairs committed ≤ target: newest
    * checkpoint's tag lines (version-stamped) plus the delta commits
    * after it. Tags from pre-versioning checkpoints carry -1.
    */
  private def tagsFrom(commits: Seq[Long], cps: Seq[Long],
                       target: Long): Seq[(Long, String)] = {
    val startCp = cps.filter(_ <= target).lastOption
    val fromCp = startCp.toSeq.flatMap(v =>
      readLines(checkpointFile(v)).flatMap(decode).collect {
        case CommitTag(t, tv) => (tv, t)
      })
    val fromDeltas = commits
      .filter(v => v <= target && startCp.forall(v > _))
      .flatMap(v => readLines(versionFile(v)).flatMap(decode).collect {
        case CommitTag(t, _) => (v, t)
      })
    fromCp ++ fromDeltas
  }

  /** Write `df` as new immutable files, return their AddFile actions.
    * A zero-column frame (a tag-only commit vehicle) stages nothing —
    * parquet cannot represent an empty schema — but it must also be
    * EMPTY: a degenerate `df.select()` with rows would otherwise
    * silently commit as a no-op, dropping its rows without error.
    */
  private def stageFiles(df: DataFrame): Seq[AddFile] = {
    if (df.schema.fields.isEmpty) {
      require(df.isEmpty,
        "zero-column DataFrame with rows: refusing to stage (the rows would " +
          "be silently dropped); tag-only commits must use an empty frame")
      return Nil
    }
    val commitId = java.util.UUID.randomUUID().toString
    val dir = s"$dataDir/$commitId"
    df.write.mode(SaveMode.ErrorIfExists).parquet(dir)
    val st = fs.listStatus(new Path(dir))
      .filter(s => s.getPath.getName.startsWith("part-"))
    st.map(s => AddFile(s.getPath.toString, -1L)).toVector
  }

  /** Transactional append. Safe under any concurrency — appends
    * commute, so losers just re-claim the next version. An optional
    * `tag` rides IN the same atomic commit (one log file), which is
    * what makes [[appendOnce]] replay-safe.
    */
  def append(df: DataFrame, tag: Option[String] = None): Long = {
    val staged = stageFiles(df)
    if (staged.isEmpty && tag.isEmpty) return latestVersion()
    // A tag-only commit (nothing staged, zero-column df) must NOT stamp
    // MetaData: it would overwrite the table's latest committed schema
    // with an empty one, and a later empty-live-set read would resolve
    // to zero columns.
    val metaLine =
      if (staged.nonEmpty || df.schema.fields.nonEmpty)
        Seq(MetaData(df.schema.json))
      else Nil
    val adds: Seq[TxAction] = staged ++ metaLine ++
      tag.map(t => CommitTag(t)).toSeq
    var v = latestVersion() + 1
    while (!tryCommit(v, adds)) v = latestVersion() + 1
    v
  }

  /** Tags of every commit ≤ latest, in version order (checkpointed —
    * cost is O(checkpointInterval) log files, not O(table age)).
    */
  def tags(): Seq[String] = {
    val (commits, cps) = listLog()
    if (commits.isEmpty) Nil
    else tagsFrom(commits, cps, commits.last).map(_._2)
  }

  /** Idempotent append for replayed producers (a Structured Streaming
    * `foreachBatch` sink keyed by batchId): if a commit already carries
    * `tag`, skip — the batch landed before the crash. The tag and the
    * file adds share one atomic commit, and the tag check re-runs
    * inside the claim loop from the same log listing the claim is based
    * on: winning the put-if-absent claim of `latest+1` proves no commit
    * (hence no duplicate tag) landed after the check, so even two
    * drivers replaying the same batch concurrently (zombie failover)
    * commit it exactly once.
    *
    * '''tagRetention interaction''': exactly-once holds only for
    * replays whose original commit is within `tagRetention` commits of
    * the newest checkpoint — older tags are dropped from checkpoints,
    * so a replay from beyond the horizon re-commits its batch. The
    * contract is on the TABLE constructor: `tagRetention` must be ≥ the
    * deepest batch the producer's own streaming checkpoint could ever
    * replay (for a Structured Streaming `foreachBatch` producer that is
    * a handful of batches; `None` = keep every tag forever).
    */
  def appendOnce(df: DataFrame, tag: String): Option[Long] = {
    val (commits0, cps0) = listLog()
    if (commits0.nonEmpty &&
      tagsFrom(commits0, cps0, commits0.last).exists(_._2 == tag)) return None
    val staged0 = stageFiles(df)
    val metaLine0 =
      if (staged0.nonEmpty || df.schema.fields.nonEmpty)
        Seq(MetaData(df.schema.json))
      else Nil
    val adds: Seq[TxAction] = staged0 ++ metaLine0 ++ Seq(CommitTag(tag))
    while (true) {
      val (commits, cps) = listLog()
      val latest = commits.lastOption.getOrElse(-1L)
      if (commits.nonEmpty && tagsFrom(commits, cps, latest).exists(_._2 == tag))
        return None // competitor landed this tag; staged files → vacuum
      if (tryCommit(latest + 1, adds)) return Some(latest + 1)
    }
    None // unreachable
  }

  /** Transactional replace-all (last-writer-wins): removes every file
    * live at commit time and adds `df`'s files. The remove-set is
    * recomputed per attempt, so a concurrent append either lands before
    * (and is replaced) or after (and survives) — never torn. When the
    * new content DERIVES from a read of the table (merge, compaction),
    * use [[overwriteIfVersion]] instead: this form would silently
    * discard a concurrent commit that landed after the read.
    */
  def overwrite(df: DataFrame): Long = {
    val adds = stageFiles(df) :+ MetaData(df.schema.json)
    var done = false
    var v = -1L
    while (!done) {
      val current = latestVersion()
      val removes = snapshot(if (current < 0) None else Some(current))
        .map(a => RemoveFile(a.path))
      v = current + 1
      done = tryCommit(v, removes ++ adds)
    }
    v
  }

  /** Conditional replace: commits `df` as version `expected + 1`
    * removing exactly the files live at `expected`; None if any other
    * writer committed first (the caller re-reads and retries — the
    * optimistic read-modify-write primitive that makes derived
    * overwrites like upsert-merge and compaction serializable).
    * Staged files of a lost attempt become unreferenced and fall to
    * [[vacuum]]'s age guard.
    */
  def overwriteIfVersion(df: DataFrame, expected: Long): Option[Long] = {
    val adds = stageFiles(df) :+ MetaData(df.schema.json)
    val removes =
      if (expected < 0) Nil
      else snapshot(Some(expected)).map(a => RemoveFile(a.path))
    if (tryCommit(expected + 1, removes ++ adds)) Some(expected + 1) else None
  }

  /** Rewrite the live set into fresh compacted files (small-file
    * cleanup after many appends). Content-neutral AND conflict-safe:
    * the rewrite commits only if the table hasn't advanced since it was
    * read, else re-reads and retries — a concurrent append is never
    * folded away.
    *
    * `sortCols` (round 14) additionally GLOBALLY sorts the rewrite:
    * append-per-batch tables carry tight per-FILE min/max stats only
    * within each batch, so successive batches overlap in key range and
    * an equality/IN filter touches every file; a global sort restores
    * store-wide disjoint key slices — file-level pruning on top of
    * row-group pruning, the append-table analog of `partitionBy` (the
    * WaveBank compactIndex re-cluster, available to every TxTable).
    * Still content-neutral: same rows, new layout.
    */
  def compact(sortCols: Seq[String] = Nil): Long = {
    var res = -1L
    var done = false
    while (!done) {
      val cur = latestVersion()
      if (cur < 0) return -1L // nothing committed: nothing to compact
      val df0 = read(Some(cur))
      val df =
        if (sortCols.isEmpty) df0
        else df0.sort(sortCols.map(org.apache.spark.sql.functions.col): _*)
      overwriteIfVersion(df, cur) match {
        case Some(v) => res = v; done = true
        case None => ()
      }
    }
    res
  }

  /** True iff every commit in (`from`, `to`] is a pure append (no
    * RemoveFile action) — the precondition for [[readAppendedSince]]
    * to be an exact row delta.
    */
  def isAppendPure(from: Long, to: Long): Boolean = {
    val (commits, _) = listLog()
    commits.filter(v => v > from && v <= to).forall { v =>
      !readLines(versionFile(v)).flatMap(decode)
        .exists(_.isInstanceOf[RemoveFile])
    }
  }

  /** The rows APPENDED in (`from`, `to`] — the files those commits
    * added, read directly (the incremental-maintenance delta read:
    * versions pin snapshots, so "what arrived since the generation was
    * built" is a log-level file-list diff, never a corpus-sized
    * anti-join). EXACT only over an append-pure range: a compaction or
    * overwrite in between rewrites surviving rows into fresh files,
    * which a file-level delta would double-count — refused loudly;
    * callers fall back to a full read (the incremental builders'
    * documented fallback).
    */
  def readAppendedSince(from: Long, to: Option[Long] = None): DataFrame = {
    val target = to.getOrElse(latestVersion())
    if (target <= from) return read(Some(math.max(from, 0L))).limit(0)
    require(isAppendPure(from, target),
      s"readAppendedSince($from, $target): range contains a remove " +
        "(compact/overwrite) — a file-level delta would double-count " +
        "rewritten rows; read the full table instead")
    val (commits, _) = listLog()
    val paths = commits.filter(v => v > from && v <= target).flatMap { v =>
      readLines(versionFile(v)).flatMap(decode).collect {
        case AddFile(p, _) => p
      }
    }
    if (paths.isEmpty) read(Some(target)).limit(0)
    else spark.read.parquet(paths: _*)
  }

  /** Data files no longer referenced by any version ≥ `retainFrom` —
    * candidates for physical deletion once readers of older snapshots
    * are gone (the vacuum contract). `olderThanMs` is the in-flight
    * guard: a concurrent writer's staged-but-uncommitted files are
    * unreferenced too, so only files at least this stale are listed
    * (default 24 h, Delta's shape).
    */
  def orphans(retainFrom: Long,
              olderThanMs: Long = 24L * 3600 * 1000): Seq[String] = {
    val (commits, _) = listLog()
    val referenced = commits.filter(_ >= retainFrom)
      .flatMap(v => snapshot(Some(v)).map(_.path)).toSet
    if (!fs.exists(new Path(dataDir))) return Nil
    val cutoff = System.currentTimeMillis() - olderThanMs
    val all = fs.listStatus(new Path(dataDir)).flatMap { d =>
      if (d.isDirectory) fs.listStatus(d.getPath)
      else Array(d)
    }
    all.filter(s => s.getModificationTime <= cutoff)
      .map(_.getPath.toString)
      .filterNot(referenced).filter(_.contains("part-")).toVector
  }

  /** Physically delete unreferenced files (irreversible). */
  def vacuum(retainFrom: Long,
             olderThanMs: Long = 24L * 3600 * 1000): Int = {
    val os = orphans(retainFrom, olderThanMs)
    os.foreach(p => fs.delete(new Path(p), false))
    os.size
  }
}

object TxTable {

  /** The atomic-publish primitive a transactional log needs from its
    * storage: `putIfAbsent` must be ATOMIC create-if-absent (two
    * concurrent callers on the same path — exactly one true). On
    * object stores this maps to a conditional put (`If-None-Match: *`);
    * the Hadoop FileSystem API cannot express it, which is why schemes
    * without an atomic no-overwrite rename are rejected unless a store
    * is registered (the Delta LogStore gating shape).
    */
  trait ClaimStore {
    /** Atomically publish `content` at `p` iff absent; false if lost. */
    def putIfAbsent(p: Path, content: Array[Byte]): Boolean
    /** Unconditional overwrite-publish (derived state: checkpoints). */
    def put(p: Path, content: Array[Byte]): Unit
  }

  /** Rename-based store: full content staged to a hidden temp file,
    * then moved into place. The no-overwrite move is
    * `FileContext.rename(Rename.NONE)` — atomic server-side on HDFS.
    * A crash mid-write leaves only a `.tmp-*` file no reader lists.
    */
  private[graft] class RenameClaimStore(raw: FileSystem, fc: FileContext,
                                       tmpDir: String) extends ClaimStore {
    protected def stage(content: Array[Byte]): Path = {
      val tmp = new Path(tmpDir, s".tmp-${java.util.UUID.randomUUID()}")
      val out = raw.create(tmp, false)
      try out.write(content) finally out.close()
      tmp
    }
    protected def claim(tmp: Path, p: Path): Boolean = {
      fc.rename(tmp, p, Options.Rename.NONE); true
    }
    final def putIfAbsent(p: Path, content: Array[Byte]): Boolean = {
      val tmp = stage(content)
      try claim(tmp, p)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.io.IOException if raw.exists(p) => false
      } finally {
        if (raw.exists(tmp)) raw.delete(tmp, false) // staged copy: discard
      }
    }
    final def put(p: Path, content: Array[Byte]): Unit = {
      val tmp = stage(content)
      fc.rename(tmp, p, Options.Rename.OVERWRITE)
    }
  }

  /** Local-filesystem store: POSIX rename cannot fail-if-exists, so
    * the claim is a hardlink (`Files.createLink` — atomic, throws
    * FileAlreadyExistsException), with a rename fallback for link-less
    * local filesystems (vfat/FUSE/SMB) — weaker under contention,
    * never unusable.
    */
  private[graft] class HardlinkClaimStore(raw: FileSystem, fc: FileContext,
                                         tmpDir: String)
      extends RenameClaimStore(raw, fc, tmpDir) {
    override protected def claim(tmp: Path, p: Path): Boolean = {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(p.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
          super.claim(tmp, p)
      }
    }
  }

  /** Schemes whose FileSystem rename is an atomic no-overwrite move.
    * Everything else (s3/s3a/gs/wasb/abfs/oss/...) implements rename as
    * a client-side copy + existence check, under which two concurrent
    * writers can both "win" the same version and one commit is
    * silently lost — exactly the contract violation this class exists
    * to prevent, so those schemes are rejected outright.
    */
  private val AtomicRenameSchemes = Set("hdfs", "viewfs", "webhdfs", "swebhdfs")

  // scheme → ClaimStore factory, for object-store conditional-put
  // integrations (and tests): one registration makes every TxTable on
  // that scheme safe.
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, (FileSystem, FileContext) => ClaimStore]()

  /** Register a conditional-put claim store for a scheme (e.g. "s3a"
    * backed by S3 `If-None-Match: *` puts).
    */
  def registerClaimStore(scheme: String,
                         factory: (FileSystem, FileContext) => ClaimStore): Unit =
    registry.put(scheme, factory)

  def unregisterClaimStore(scheme: String): Unit = registry.remove(scheme)

  private[graft] def claimStoreFor(raw: FileSystem, fc: FileContext,
                                  tmpDir: String): ClaimStore =
    resolve(Option(raw.getUri.getScheme).getOrElse("file"), raw, fc, tmpDir)

  private[graft] def resolve(scheme: String, raw: FileSystem, fc: FileContext,
                            tmpDir: String): ClaimStore = {
    Option(registry.get(scheme)).map(_(raw, fc)).getOrElse {
      if (scheme == "file") new HardlinkClaimStore(raw, fc, tmpDir)
      else if (AtomicRenameSchemes(scheme)) new RenameClaimStore(raw, fc, tmpDir)
      else throw new IllegalArgumentException(
        s"TxTable: filesystem scheme '$scheme' has no atomic no-overwrite " +
          "rename (on object stores rename is a copy + existence check, so " +
          "two concurrent writers can both claim the same version and one " +
          "commit is silently lost). Register a conditional-put claim via " +
          "TxTable.registerClaimStore(scheme, factory) — on S3/GCS an " +
          "If-None-Match:* put — or point the table at HDFS/local storage.")
    }
  }
}

sealed trait TxAction
final case class AddFile(path: String, rows: Long) extends TxAction
final case class RemoveFile(path: String) extends TxAction
/** `atVersion` stamps the owning commit when re-emitted in checkpoints
  * (-1 in delta files, where the filename is the version).
  */
final case class CommitTag(value: String, atVersion: Long = -1L) extends TxAction
/** Table schema (Spark StructType JSON) — rides every file-adding
  * commit so an empty live set still reads with its schema.
  */
final case class MetaData(schemaJson: String) extends TxAction
