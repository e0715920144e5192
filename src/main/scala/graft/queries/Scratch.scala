package graft.queries

import java.nio.file.{Files, Path}

/** Scratch directories for oracle-query bodies (parquet copies of the
  * input tables, TxTable stores, streaming checkpoints). Every query
  * used to call `Files.createTempDirectory` directly and never delete
  * it, so repeated correctness runs accumulated gigabytes in /tmp —
  * the disk-fill failure mode ScaleBench's own scratch comment records.
  * All query scratch now nests under ONE per-JVM root removed by a
  * shutdown hook: the driver's Verify/Bench process writes its outputs,
  * exits, and the whole tree goes with it. (Deletion cannot happen
  * earlier: most results are returned LAZY and still read the scratch
  * parquet/TxTable when the caller materializes them.)
  */
object Scratch {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft-scratch-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(r.toFile)))
    r
  }

  private def deleteRec(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRec)
    f.delete()
    ()
  }

  /** A fresh directory under the self-cleaning root. */
  def tempDir(prefix: String): Path = Files.createTempDirectory(root, prefix)
}
