package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The 100 TB layout contract: a day-partitioned archive must answer a
  * day-filtered query by touching ONLY that day's files — partition
  * pruning at plan time, not a full scan filtered afterwards.
  */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  test("day-partitioned archive reads prune to the requested day") {
    val out = Files.createTempDirectory("graft-prune").toString + "/archive"
    (0L until 300L).map(i => (i, i % 3, i * 1000L))
      .toDF("event_id", "day", "ts")
      .write.partitionBy("day").parquet(out)

    val q = spark.read.parquet(out).filter(col("day") === 1)
    assert(q.count() == 100)

    // the scan's partition filters must carry the day predicate, and
    // the files actually read must all come from day=1
    val scan = q.queryExecution.executedPlan.collectLeaves().head
    val scanStr = scan.toString
    assert(scanStr.contains("PartitionFilters") &&
      scanStr.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("day"), scanStr)
    val files = q.select(col("_metadata.file_path")).distinct()
      .as[String].collect()
    assert(files.nonEmpty && files.forall(_.contains("day=1")), files.mkString(","))
  }
}
