package graft

import graft.bank.TxTable
import org.apache.spark.sql.functions._

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

class TxLogSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("txlog").toString

  test("append / read round trip with versions") {
    val t = new TxTable(spark, tmp())
    assert(t.latestVersion() == -1L && t.read().isEmpty)
    val v0 = t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val v1 = t.append(Seq((3L, "c")).toDF("id", "s"))
    assert(v0 == 0L && v1 == 1L)
    assert(t.read().count() == 3)
    // time travel: version 0 predates the second append
    assert(t.read(Some(v0)).count() == 2)
  }

  test("zero-column frame with rows is refused, not silently dropped") {
    val t = new TxTable(spark, tmp())
    // df.select() keeps the rows but drops every column — committing it
    // would stage nothing and lose the rows as a fake tag-only commit
    val degenerate = spark.range(3).select()
    val e = intercept[IllegalArgumentException](t.append(degenerate))
    assert(e.getMessage.contains("zero-column"))
    // the legitimate tag-only vehicle (zero columns AND zero rows) works
    val v = t.append(spark.emptyDataFrame, tag = Some("marker"))
    assert(v >= 0L && t.tags().contains("marker"))
  }

  test("readAppendedSince: exact row delta over an append-pure range; " +
       "refuses a range containing a remove") {
    val t = new TxTable(spark, tmp())
    val v0 = t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    t.append(Seq((3L, "c")).toDF("id", "s"))
    val v2 = t.append(Seq((4L, "d")).toDF("id", "s"))
    assert(t.isAppendPure(v0, v2))
    val delta = t.readAppendedSince(v0)
    assert(delta.select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
    // delta reads ONLY the appended files, never the base snapshot
    val basePaths = t.snapshot(Some(v0)).map(_.path).toSet
    assert(delta.inputFiles.forall(f => !basePaths.contains(f)))
    // empty range → empty frame with the table's schema
    assert(t.readAppendedSince(v2).isEmpty)
    // a compaction rewrites survivors into fresh files: a file-level
    // delta across it would double-count — refused loudly
    t.compact()
    val vc = t.latestVersion()
    assert(!t.isAppendPure(v0, vc))
    val e = intercept[IllegalArgumentException](t.readAppendedSince(v0))
    assert(e.getMessage.contains("remove"))
  }

  test("overwrite replaces all live rows; old snapshots still readable") {
    val t = new TxTable(spark, tmp())
    t.append(Seq((1L, "a")).toDF("id", "s"))
    val vOver = t.overwrite(Seq((9L, "z"), (8L, "y")).toDF("id", "s"))
    assert(t.read().select("id").as[Long].collect().sorted.toSeq == Seq(8L, 9L))
    assert(t.read(Some(vOver - 1)).select("s").as[String].collect().toSeq == Seq("a"))
  }

  test("compact preserves content and shrinks the file count") {
    val t = new TxTable(spark, tmp())
    (0 until 6).foreach(i => t.append(Seq((i.toLong, s"r$i")).toDF("id", "s")))
    val before = t.snapshot().size
    val rows = t.read().orderBy("id").collect().map(_.mkString("|")).toSeq
    val vc = t.compact()
    assert(t.snapshot().size < before)
    assert(t.read().orderBy("id").collect().map(_.mkString("|")).toSeq == rows)
    // orphans of the compacted history are exactly the replaced files
    // (olderThanMs=0 disables the in-flight-writer age guard for the test)
    assert(t.orphans(retainFrom = vc, olderThanMs = 0L).nonEmpty)
    val n = t.vacuum(retainFrom = vc, olderThanMs = 0L)
    assert(n > 0 && t.read().orderBy("id").collect()
      .map(_.mkString("|")).toSeq == rows)
    // with the default age guard, freshly staged files are NOT orphans
    assert(t.orphans(retainFrom = vc).isEmpty)
  }

  test("checkpoint bounds replay and produces identical snapshots") {
    val t = new TxTable(spark, tmp(), checkpointInterval = 4)
    (0 until 9).foreach(i => t.append(Seq((i.toLong, s"r$i")).toDF("id", "s")))
    // a checkpoint exists at version 4 and 8
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      t.logDir, f"${4L}%020d.checkpoint.json")))
    assert(t.read().count() == 9)
    assert(t.read(Some(5L)).count() == 6) // checkpoint 4 + delta 5
  }

  test("concurrent appends all land with distinct versions") {
    val t = new TxTable(spark, tmp())
    val pool = Executors.newFixedThreadPool(4)
    val start = new CountDownLatch(1)
    val versions = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Long]())
    (0 until 8).foreach { i =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          versions.add(t.append(Seq((i.toLong, s"w$i")).toDF("id", "s")))
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    import scala.jdk.CollectionConverters._
    val vs = versions.asScala.toSeq.sorted
    assert(vs == (0L until 8L), vs.toString) // contiguous, no lost claim
    assert(t.read().count() == 8)
    assert(t.read().select("id").as[Long].collect().sorted.toSeq ==
      (0L until 8L))
  }

  test("concurrent overwrite vs append never tears") {
    val t = new TxTable(spark, tmp())
    t.append(Seq((0L, "base")).toDF("id", "s"))
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    pool.submit(new Runnable {
      override def run(): Unit = {
        start.await(); t.overwrite(Seq((100L, "over")).toDF("id", "s"))
      }
    })
    pool.submit(new Runnable {
      override def run(): Unit = {
        start.await(); t.append(Seq((200L, "app")).toDF("id", "s"))
      }
    })
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    val ids = t.read().select("id").as[Long].collect().toSet
    // overwrite-then-append → {100, 200}; append-then-overwrite → {100}
    assert(ids == Set(100L, 200L) || ids == Set(100L), ids.toString)
  }

  test("uncommitted staged files are invisible to readers") {
    val dir = tmp()
    val t = new TxTable(spark, dir)
    t.append(Seq((1L, "a")).toDF("id", "s"))
    // simulate a writer that crashed after staging, before commit
    Seq((99L, "ghost")).toDF("id", "s")
      .write.parquet(s"$dir/data/dead-writer")
    assert(t.read().select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("overwriteIfVersion refuses when the table advanced (lost-update guard)") {
    val t = new TxTable(spark, tmp())
    t.append(Seq((1L, "a")).toDF("id", "s"))
    val seen = t.latestVersion()
    // another writer commits in between
    t.append(Seq((2L, "b")).toDF("id", "s"))
    assert(t.overwriteIfVersion(Seq((9L, "stale")).toDF("id", "s"), seen).isEmpty)
    // nothing replaced: both rows still live
    assert(t.read().count() == 2)
    // retry against the current version succeeds
    val cur = t.latestVersion()
    assert(t.overwriteIfVersion(Seq((9L, "fresh")).toDF("id", "s"), cur).isDefined)
    assert(t.read().select("id").as[Long].collect().toSeq == Seq(9L))
  }

  test("concurrent tx putEvents upserts never lose a writer's batch") {
    val root = java.nio.file.Files.createTempDirectory("txev").toString
    val bank = new graft.bank.EventBank(spark, root,
      mergeOnRead = true, txIndex = true)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    val start = new CountDownLatch(1)
    (0 until 6).foreach { i =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          bank.putEvents(Seq((s"e$i", 1000L * i, 1.0, 2.0, 3.0,
            2.5, "ML", i.toLong))
            .toDF("event_id", "time", "latitude", "longitude", "depth",
                  "magnitude", "magnitude_type", "updated"))
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(180, TimeUnit.SECONDS))
    // every writer's event survived the optimistic merge loop
    assert(bank.readIndex().select("event_id").as[String].collect().toSet ==
      (0 until 6).map(i => s"e$i").toSet)
  }

  test("seeded fuzz: concurrent appends/compacts/vacuums keep every row exactly once") {
    val t = new TxTable(spark, tmp(), checkpointInterval = 3)
    val rnd = new scala.util.Random(9109)
    val nWriters = 4
    val opsPer = 6
    // pre-plan each thread's op sequence (deterministic given the seed)
    val plans: Seq[Seq[(String, Long)]] = (0 until nWriters).map { w =>
      (0 until opsPer).map { i =>
        val id = (w * 1000 + i).toLong
        rnd.nextInt(10) match {
          case k if k < 6 => ("append", id)
          case k if k < 9 => ("compact", id)
          case _ => ("vacuum", id)
        }
      }
    }
    val expected = plans.flatten.collect { case ("append", id) => id }.toSet
    val pool = Executors.newFixedThreadPool(nWriters)
    val start = new CountDownLatch(1)
    val errs = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Throwable]())
    plans.foreach { plan =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try plan.foreach {
            case ("append", id) =>
              t.append(Seq((id, s"row$id")).toDF("id", "s")); ()
            case ("compact", _) => t.compact(); ()
            case ("vacuum", _) =>
              // default age guard on: must never touch in-flight files
              t.vacuum(retainFrom = math.max(0L, t.latestVersion() - 2)); ()
            case _ => ()
          } catch { case e: Throwable => errs.add(e) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS))
    import scala.jdk.CollectionConverters._
    assert(errs.asScala.isEmpty, errs.asScala.map(_.toString).toString)
    // invariant 1: contiguous version history, no lost claim
    val latest = t.latestVersion()
    assert(latest >= 0)
    // invariant 2: the final table holds exactly the union of appended
    // rows, each exactly once (compaction is content-neutral, vacuum
    // never deleted a live or in-flight file)
    val got = t.read().select("id").as[Long].collect().toSeq
    assert(got.size == got.distinct.size, "duplicated rows")
    assert(got.toSet == expected,
      s"missing=${expected -- got.toSet} extra=${got.toSet -- expected}")
    // invariant 3: every historical version is still a readable snapshot
    (0L to latest).foreach { v =>
      val n = t.read(Some(v)).count()
      assert(n >= 0 && n <= expected.size)
    }
  }

  test("paths with quotes/backslashes survive the log encoding") {
    // encode/decode round trip is private; exercise via a weird root
    val dir = tmp() + "/we ird-dir"
    val t = new TxTable(spark, dir)
    t.append(Seq((1L, "a")).toDF("id", "s"))
    assert(t.read().count() == 1)
  }

  test("wide-schema MetaData lines decode without stack overflow (regex-backtracking regression)") {
    // the old regex-based log-line field extractor backtracked one JVM
    // stack frame per character, so a table whose schema JSON ran past
    // ~2 KB (any ~30-column schema — eventSummary was the first)
    // overflowed the stack ON READ. Pin a schema far past that size
    // through a full append/read round trip.
    val t = new TxTable(spark, tmp())
    val wide = (0 until 120).foldLeft(Seq((1L, "x")).toDF("id", "c")) {
      (df, i) => df.withColumn(f"extremely_long_column_name_number_$i%03d",
        lit(s"value_$i"))
    }
    t.append(wide)
    val back = t.read()
    assert(back.columns.length == 122)
    assert(back.count() == 1)
    // tags on the same log (exercise the string-value path too)
    t.appendOnce(wide, tag = "wide-" + ("pad" * 200))
    assert(t.read().count() == 2)
  }
}
