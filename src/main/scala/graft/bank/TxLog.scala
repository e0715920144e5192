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
  *     Commit content is staged to a temp file, then version N is
  *     claimed put-if-absent: hardlink on local filesystems (POSIX
  *     rename cannot fail-if-exists), `FileContext.rename(Rename.NONE)`
  *     on HDFS; object stores should map this to a conditional put.
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
              mergeSchemaOnRead: Boolean = false) {

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

  private def isLocal: Boolean = "file" == rawFs.getUri.getScheme

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
    case CommitTag(t) => s"""{"tag":{"value":"${esc(t)}"}}"""
  }

  private def decode(line: String): Option[TxAction] = {
    def field(obj: String, k: String): Option[String] = {
      val m = ("\"" + k + "\"\\s*:\\s*(\"((?:[^\"\\\\]|\\\\.)*)\"|[-0-9]+)").r
      m.findFirstMatchIn(obj).map { g =>
        Option(g.group(2)).map(_.replace("\\\"", "\"").replace("\\\\", "\\"))
          .getOrElse(g.group(1))
      }
    }
    val t = line.trim
    if (t.isEmpty) None
    else if (t.startsWith("{\"add\""))
      field(t, "path").map(p => AddFile(p, field(t, "rows").map(_.toLong).getOrElse(0L)))
    else if (t.startsWith("{\"remove\""))
      field(t, "path").map(RemoveFile)
    else if (t.startsWith("{\"tag\""))
      field(t, "value").map(CommitTag)
    else None // unknown action kinds are skipped (forward compatibility)
  }

  /** Atomic publish: the full content is written to a hidden temp file
    * first, then linked/renamed into place — a log file is either
    * absent or complete, never partial, and a claim either wins the
    * version atomically or reports the loss. A crash mid-write leaves
    * only a `.tmp-*` file that no reader lists.
    *
    * Claim primitive by scheme: POSIX rename cannot fail-if-exists, so
    * on local filesystems the claim is a hardlink
    * (`Files.createLink` — atomic, throws FileAlreadyExistsException);
    * everywhere else `FileContext.rename(..., Rename.NONE)` (atomic
    * no-overwrite on HDFS; object stores should map this to a
    * conditional put).
    */
  private def writeAtomic(p: Path, lines: Seq[String], overwrite: Boolean): Boolean = {
    val tmp = new Path(logDir, s".tmp-${java.util.UUID.randomUUID()}")
    val out = rawFs.create(tmp, false)
    try out.write((lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    try {
      if (overwrite) {
        fc.rename(tmp, p, Options.Rename.OVERWRITE)
        true
      } else if (isLocal) {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(p.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
            // link-less local fs (vfat/FUSE/SMB): fall back to the
            // rename claim — weaker under contention, never unusable
            fc.rename(tmp, p, Options.Rename.NONE)
            true
        }
      } else {
        fc.rename(tmp, p, Options.Rename.NONE)
        true
      }
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.io.IOException if rawFs.exists(p) && !overwrite => false
    } finally {
      if (rawFs.exists(tmp)) rawFs.delete(tmp, false) // staged copy: discard
    }
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
        case _: CommitTag => ()
      }
    }
    commits.filter(v => v <= target && startCp.forall(v > _)).foreach { v =>
      readLines(versionFile(v)).flatMap(decode).foreach {
        case a: AddFile => live(a.path) = a
        case RemoveFile(p) => live.remove(p)
        case _: CommitTag => ()
      }
    }
    live.values.toVector
  }

  /** Read the table (optionally as of an older version).
    * `mergeSchemaOnRead` reconciles commits written before a schema
    * extension (an all-footers pass per read — leave it off for
    * stable-schema tables like the bank indices, whose writers conform
    * batches before committing).
    */
  def read(version: Option[Long] = None): DataFrame = {
    val files = snapshot(version).map(_.path)
    if (files.isEmpty)
      spark.emptyDataFrame
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
      // It carries the tag set too, so tags() replay is O(interval)
      // like snapshot() — not O(table age).
      val (commits, cps) = listLog()
      val full = snapshot(Some(v)).map(a => encode(a)) ++
        tagsFrom(commits, cps, v).map(t => encode(CommitTag(t)))
      writeAtomic(checkpointFile(v), full, overwrite = true)
    }
    ok
  }

  /** All tags committed ≤ target: newest checkpoint's tag lines plus
    * the delta commits after it.
    */
  private def tagsFrom(commits: Seq[Long], cps: Seq[Long],
                       target: Long): Seq[String] = {
    val startCp = cps.filter(_ <= target).lastOption
    val fromCp = startCp.toSeq.flatMap(v =>
      readLines(checkpointFile(v)).flatMap(decode).collect {
        case CommitTag(t) => t
      })
    val fromDeltas = commits
      .filter(v => v <= target && startCp.forall(v > _))
      .flatMap(v => readLines(versionFile(v)).flatMap(decode).collect {
        case CommitTag(t) => t
      })
    fromCp ++ fromDeltas
  }

  /** Write `df` as new immutable files, return their AddFile actions. */
  private def stageFiles(df: DataFrame): Seq[AddFile] = {
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
    val adds: Seq[TxAction] = stageFiles(df) ++ tag.map(CommitTag).toSeq
    if (adds.isEmpty) return latestVersion()
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
    else tagsFrom(commits, cps, commits.last)
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
    */
  def appendOnce(df: DataFrame, tag: String): Option[Long] = {
    val (commits0, cps0) = listLog()
    if (commits0.nonEmpty &&
      tagsFrom(commits0, cps0, commits0.last).contains(tag)) return None
    val adds: Seq[TxAction] = stageFiles(df) ++ Seq(CommitTag(tag))
    while (true) {
      val (commits, cps) = listLog()
      val latest = commits.lastOption.getOrElse(-1L)
      if (commits.nonEmpty && tagsFrom(commits, cps, latest).contains(tag))
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
    val adds = stageFiles(df)
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
    val adds = stageFiles(df)
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
    */
  def compact(): Long = {
    var res = -1L
    var done = false
    while (!done) {
      val cur = latestVersion()
      val df = read(if (cur < 0) None else Some(cur))
      overwriteIfVersion(df, cur) match {
        case Some(v) => res = v; done = true
        case None => ()
      }
    }
    res
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

sealed trait TxAction
final case class AddFile(path: String, rows: Long) extends TxAction
final case class RemoveFile(path: String) extends TxAction
final case class CommitTag(value: String) extends TxAction
