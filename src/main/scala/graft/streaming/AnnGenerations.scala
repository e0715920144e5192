package graft.streaming

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

import graft.bank.TxTable

/** Crash-safe generation pointer for a maintained ANN serving store —
  * the serving-swap half of the retrain loop. [[StreamingAnnIndex
  * .retrainIfDrifted]] bulk-loads a FRESH store + drift sidecar and
  * returns; "the caller swaps at its convenience" becomes concrete
  * here: each retrain lands in a fresh generation directory and goes
  * live through ONE atomic pointer rename (the WaveBank
  * `compactIndex`/`writeGeneration` publish device, applied to the ANN
  * store):
  *
  * {{{
  *   root/GEN.ptr            // "<N>" — the current generation number
  *   root/gen-<N>/store      // TxTable roots of generation N
  *   root/gen-<N>/drift
  * }}}
  *
  * Contract:
  *   - a reader resolves the pointer ONCE ([[current]]) and binds to
  *     that generation's TxTables — generations are never modified
  *     after publish (the maintainer appends to the CURRENT generation
  *     it resolved at start), and old generation dirs stay on disk, so
  *     a reader resolved mid-swap keeps serving a COMPLETE generation;
  *   - [[publish]] is one `FileContext.rename(OVERWRITE)` of a staged
  *     tmp file — atomic on local/HDFS, so a crash at ANY instant
  *     leaves the pointer either on the old or the new generation,
  *     never missing or truncated, and half-built unpublished
  *     generations are invisible garbage;
  *   - publish is IDEMPOTENT (re-publishing the current generation is
  *     a no-op rename to the same content) and MONOTONIC (publishing a
  *     generation older than the pointer is refused loudly — a delayed
  *     duplicate retrain must not roll serving back).
  *
  * [[StreamingAnnIndex.retrainAndSwap]] composes the loop end to end:
  * probe → retrain into `next()` → publish on fire.
  */
class AnnGenerations(spark: SparkSession, root: String) {

  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def fc: FileContext =
    FileContext.getFileContext(fs.getUri,
      spark.sparkContext.hadoopConfiguration)

  private val ptr = new Path(s"$root/GEN.ptr")

  private def genDir(gen: Long) = s"$root/gen-$gen"

  /** TxTable pair of generation `gen` (no pointer read — callers that
    * already resolved bind through this).
    */
  def tables(gen: Long): (TxTable, TxTable) =
    (new TxTable(spark, s"${genDir(gen)}/store"),
      new TxTable(spark, s"${genDir(gen)}/drift"))

  /** The published generation number, or None before the first
    * publish. A torn read is impossible: the pointer file is only ever
    * replaced by an atomic rename.
    */
  def currentGen(): Option[Long] = {
    val f = fs
    if (!f.exists(ptr)) None
    else {
      val in = f.open(ptr)
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](256)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        Some(new String(out.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
      } finally in.close()
    }
  }

  /** Resolve the pointer once and bind: (generation, store, drift). */
  def current(): Option[(Long, TxTable, TxTable)] =
    currentGen().map { g =>
      val (s, d) = tables(g)
      (g, s, d)
    }

  /** Fresh UNPUBLISHED generation: one past BOTH the pointer and any
    * generation directory already on disk. The on-disk probe is the
    * crash-safety half: a retrain that committed into gen-N and died
    * before [[publish]] leaves gen-N's appendOnce tags behind, and a
    * rebuild that REUSED gen-N would silently no-op against them and
    * then publish the crashed run's stale rows as if they were the
    * fresh build. Skipping every existing directory makes crashed
    * half-built generations permanent invisible garbage (a manual
    * sweep can remove anything above the pointer) and every build's
    * target genuinely empty.
    */
  def next(): (Long, TxTable, TxTable) = {
    val f = fs
    val base = new Path(root)
    val onDisk =
      if (!f.exists(base)) -1L
      else
        f.listStatus(base).toSeq
          .map(_.getPath.getName)
          .collect { case n if n.startsWith("gen-") =>
            scala.util.Try(n.stripPrefix("gen-").toLong).toOption
          }
          .flatten
          .foldLeft(-1L)(math.max)
    val g = math.max(currentGen().getOrElse(-1L), onDisk) + 1L
    val (s, d) = tables(g)
    (g, s, d)
  }

  /** Atomically swap serving to `gen`. Idempotent; refuses rollback. */
  def publish(gen: Long): Unit = {
    val cur = currentGen()
    require(cur.forall(_ <= gen),
      s"publish($gen) would roll the pointer back from ${cur.get} — " +
        "generations are monotonic (a delayed duplicate retrain must " +
        "not regress serving)")
    if (cur.contains(gen)) return // already live
    require(fs.exists(new Path(s"${genDir(gen)}/store/_txlog")),
      s"publish($gen): generation has no committed store — publish " +
        "AFTER the bootstrap/retrain commits")
    val tmp = new Path(root, s".GEN.ptr.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(s"$gen\n".getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fc.rename(tmp, ptr, Options.Rename.OVERWRITE)
  }
}
