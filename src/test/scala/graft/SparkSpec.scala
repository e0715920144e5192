package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one JVM-wide session, lazily built). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = graft.core.GraftSession.configure(
      SparkSession.builder()
        .master("local[4]")
        .appName("graft-test")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.warehouse.dir",
          java.nio.file.Files.createTempDirectory("graft-wh").toString)
        .config("spark.ui.enabled", "false")
        // The 4.1 checksum checkpoint manager has an async-close race
        // under rapid micro-batch cycling (tasks await a checksum
        // future that is lost when a provider unloads): state commits
        // hang forever. Local test checkpoints don't need corruption
        // detection — disable it for deterministic streaming specs.
        .config("spark.sql.streaming.checkpoint.fileChecksum.enabled",
          "false")
    ).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
