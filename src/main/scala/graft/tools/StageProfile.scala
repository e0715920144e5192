package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level profile of one catalog query: wall, task count,
  * executor CPU, shuffle read/write and spill per stage, sorted by
  * stage wall — the "which exchange actually costs" answer `explain`
  * cannot give. Usage:
  *
  *   sbt "runMain graft.tools.StageProfile /root/testdata/sf0.1 q80_remove_duplicate_spans [runs]"
  *
  * Runs the query `runs` times (default 3) and prints the profile of
  * the LAST run (warm page cache — the bench regime).
  */
object StageProfile {

  final case class StageRow(id: Int, wallMs: Long, tasks: Int,
                            cpuMs: Long, shufReadMb: Double,
                            shufWriteMb: Double, spillMb: Double,
                            name: String)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val query = args(1)
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
    val lsnr = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val tm = si.taskMetrics
        rows.add(StageRow(si.stageId,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.numTasks, tm.executorCpuTime / 1000000L,
          (tm.shuffleReadMetrics.totalBytesRead) / 1048576.0,
          tm.shuffleWriteMetrics.bytesWritten / 1048576.0,
          tm.memoryBytesSpilled / 1048576.0,
          si.name.linesIterator.next()))
      }
    }
    val fn = graft.SparkEntry.queries(query)
    (1 until runs).foreach { _ => fn(spark, sfDir).count(); () }
    spark.sparkContext.addSparkListener(lsnr)
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000) // listener drain
    spark.sparkContext.removeSparkListener(lsnr)
    println(f"== $query: rows=$n wall=$wall%.2f s (run $runs of $runs)")
    println(f"${"stage"}%6s ${"wall_ms"}%8s ${"tasks"}%6s ${"cpu_ms"}%8s " +
      f"${"shRd_MB"}%8s ${"shWr_MB"}%8s ${"spill"}%6s  name")
    import scala.jdk.CollectionConverters._
    rows.asScala.toSeq.sortBy(-_.wallMs).foreach { r =>
      println(f"${r.id}%6d ${r.wallMs}%8d ${r.tasks}%6d ${r.cpuMs}%8d " +
        f"${r.shufReadMb}%8.1f ${r.shufWriteMb}%8.1f ${r.spillMb}%6.1f  ${r.name.take(90)}")
    }
    spark.stop()
  }
}
