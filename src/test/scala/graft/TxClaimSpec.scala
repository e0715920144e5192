package graft

import graft.bank.TxTable
import org.apache.hadoop.fs.{FileContext, FileSystem, Path}
import org.apache.spark.sql.functions._

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

/** The storage-contract surface of the tx log: scheme gating (no
  * silent copy-rename races on object stores), the conditional-put
  * claim path under contention, tag retention at checkpoints, and
  * schema survival of an empty live set.
  */
class TxClaimSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("txclaim").toString

  private def rawFs: FileSystem = {
    val f = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    f match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case x => x
    }
  }
  private def fc: FileContext =
    FileContext.getFileContext(rawFs.getUri,
      spark.sparkContext.hadoopConfiguration)

  /** In-process stand-in for an object store's `If-None-Match: *` put:
    * claims serialize on one mutex (the store's atomicity), publish is
    * all-or-nothing via stage + atomic local rename, and there is NO
    * rename-based no-overwrite anywhere in the claim path.
    */
  private class FakeObjectStore(raw: FileSystem) extends TxTable.ClaimStore {
    val lock = new Object
    var puts = 0
    private def publish(p: Path, content: Array[Byte]): Unit = {
      val tmp = new Path(p.getParent, s".stage-${java.util.UUID.randomUUID()}")
      val out = raw.create(tmp, false)
      try out.write(content) finally out.close()
      // readers never see a partial object (server-side atomicity)
      fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
    def putIfAbsent(p: Path, content: Array[Byte]): Boolean = lock.synchronized {
      if (raw.exists(p)) false
      else { publish(p, content); puts += 1; true }
    }
    def put(p: Path, content: Array[Byte]): Unit = lock.synchronized {
      publish(p, content)
    }
  }

  /** In-process HTTP object store: the server side of the
    * `If-None-Match: *` contract. Conditional puts serialize on one
    * mutex and publish all-or-nothing to the LOCAL filesystem (where
    * the table's FileSystem reads them back) — so a full TxTable runs
    * with its claims over real HTTP and its reads over the FS, exactly
    * the S3 deployment shape.
    */
  private class HttpObjectStore(requireAuth: Option[String] = None) {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    private val server =
      HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    private val lock = new Object
    @volatile var conditionalPuts = 0
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        try {
          val body = ex.getRequestBody.readAllBytes()
          if (ex.getRequestMethod != "PUT") {
            ex.sendResponseHeaders(405, -1); return
          }
          if (requireAuth.exists(a =>
              ex.getRequestHeaders.getFirst("Authorization") != a)) {
            ex.sendResponseHeaders(403, -1); return
          }
          val target = java.nio.file.Paths.get(ex.getRequestURI.getPath)
          val conditional =
            Option(ex.getRequestHeaders.getFirst("If-None-Match")).contains("*")
          val status = lock.synchronized {
            if (conditional && java.nio.file.Files.exists(target)) 412
            else {
              java.nio.file.Files.createDirectories(target.getParent)
              val tmp = target.getParent
                .resolve(s".http-stage-${java.util.UUID.randomUUID()}")
              java.nio.file.Files.write(tmp, body)
              java.nio.file.Files.move(tmp, target,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE,
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
              if (conditional) { conditionalPuts += 1; 201 } else 200
            }
          }
          ex.sendResponseHeaders(status, -1)
        } finally ex.close()
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    def endpoint: java.net.URI =
      new java.net.URI(s"http://127.0.0.1:${server.getAddress.getPort}")
    def stop(): Unit = server.stop(0)
  }

  test("object-store schemes without a registered claim are rejected loudly") {
    val e = intercept[IllegalArgumentException](
      TxTable.resolve("s3a", rawFs, fc, tmp()))
    assert(e.getMessage.contains("conditional-put"))
    intercept[IllegalArgumentException](TxTable.resolve("gs", rawFs, fc, tmp()))
    // atomic-rename schemes and local resolve fine
    assert(TxTable.resolve("hdfs", rawFs, fc, tmp())
      .isInstanceOf[TxTable.RenameClaimStore])
    assert(TxTable.resolve("file", rawFs, fc, tmp())
      .isInstanceOf[TxTable.HardlinkClaimStore])
  }

  test("a registered conditional-put store unlocks the scheme") {
    TxTable.registerClaimStore("fake-s3", (r, _) => new FakeObjectStore(r))
    try assert(TxTable.resolve("fake-s3", rawFs, fc, tmp())
      .isInstanceOf[FakeObjectStore])
    finally TxTable.unregisterClaimStore("fake-s3")
    intercept[IllegalArgumentException](
      TxTable.resolve("fake-s3", rawFs, fc, tmp()))
  }

  test("conditional-put claim: N racing writers, exactly one wins each version") {
    val store = new FakeObjectStore(rawFs)
    val dir = tmp()
    val target = new Path(dir, "00000000000000000000.json")
    val pool = Executors.newFixedThreadPool(8)
    val start = new CountDownLatch(1)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    (0 until 8).foreach { i =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          if (store.putIfAbsent(target, s"writer-$i".getBytes)) wins.incrementAndGet()
          ()
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(60, TimeUnit.SECONDS))
    assert(wins.get() == 1)
  }

  test("TxTable over the conditional-put path: concurrent appends keep every commit") {
    TxTable.registerClaimStore("file", (r, _) => new FakeObjectStore(r))
    try {
      val t = new TxTable(spark, tmp(), checkpointInterval = 3)
      val pool = Executors.newFixedThreadPool(4)
      val start = new CountDownLatch(1)
      (0 until 8).foreach { i =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            start.await()
            t.append(Seq((i.toLong, s"w$i")).toDF("id", "s")); ()
          }
        })
      }
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(120, TimeUnit.SECONDS))
      assert(t.latestVersion() == 7L) // contiguous: no lost claim
      assert(t.read().select("id").as[Long].collect().sorted.toSeq == (0L until 8L))
    } finally TxTable.unregisterClaimStore("file")
  }

  test("HTTP claim store: racing writers through real If-None-Match puts, one winner") {
    val store = new HttpObjectStore()
    try {
      val claims = new graft.bank.HttpConditionalPutClaimStore(store.endpoint)
      // s3a-shaped keys: bucket = authority, no leading slash
      assert(claims.keyFor(new Path("s3a://bkt/t/_txlog/5.json")) ==
        "bkt/t/_txlog/5.json")
      val dir = tmp()
      val target = new Path(dir, "00000000000000000000.json")
      val pool = Executors.newFixedThreadPool(8)
      val start = new CountDownLatch(1)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val winner = new java.util.concurrent.atomic.AtomicInteger(-1)
      (0 until 8).foreach { i =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            start.await()
            if (claims.putIfAbsent(target, s"writer-$i".getBytes)) {
              wins.incrementAndGet(); winner.set(i)
            }
            ()
          }
        })
      }
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(60, TimeUnit.SECONDS))
      assert(wins.get() == 1 && store.conditionalPuts == 1)
      // the object holds the WINNER's bytes (all-or-nothing publish)
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "00000000000000000000.json"))
      assert(new String(bytes) == s"writer-${winner.get()}")
      // checkpoint-style unconditional put overwrites
      claims.put(target, "ckpt".getBytes)
      assert(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "00000000000000000000.json"))) == "ckpt")
    } finally store.stop()
  }

  test("TxTable over the HTTP claim store: concurrent appends keep every commit") {
    val store = new HttpObjectStore()
    TxTable.registerClaimStore("file",
      (_, _) => new graft.bank.HttpConditionalPutClaimStore(store.endpoint))
    try {
      val t = new TxTable(spark, tmp(), checkpointInterval = 3)
      val pool = Executors.newFixedThreadPool(4)
      val start = new CountDownLatch(1)
      (0 until 8).foreach { i =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            start.await()
            t.append(Seq((i.toLong, s"w$i")).toDF("id", "s")); ()
          }
        })
      }
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(120, TimeUnit.SECONDS))
      assert(t.latestVersion() == 7L) // contiguous: no lost claim
      assert(t.read().select("id").as[Long].collect().sorted.toSeq ==
        (0L until 8L))
    } finally {
      TxTable.unregisterClaimStore("file")
      store.stop()
    }
  }

  test("HTTP claim store: the vendor adapter is endpoint + signer") {
    val store = new HttpObjectStore(requireAuth = Some("Bearer graft-test"))
    try {
      val dir = tmp()
      val target = new Path(dir, "c.json")
      // unsigned: the store's 403 fails fast (no silent lost-claim)
      val unsigned = new graft.bank.HttpConditionalPutClaimStore(store.endpoint)
      intercept[java.io.IOException](unsigned.putIfAbsent(target, "x".getBytes))
      // signed: only the sign hook differs — the claim logic is shared
      val signed = new graft.bank.HttpConditionalPutClaimStore(store.endpoint,
        sign = b => b.header("Authorization", "Bearer graft-test"))
      assert(signed.putIfAbsent(target, "x".getBytes))
      assert(!signed.putIfAbsent(target, "y".getBytes)) // 412 = lost
    } finally store.stop()
  }

  test("HTTP claim store: retries re-sign a FRESH request — no duplicate headers") {
    // HttpRequest.Builder.header() APPENDS; a builder reused across
    // attempts would stack one extra Authorization + If-None-Match per
    // retry and real stores reject that. Serve two 503s, then assert
    // the succeeding third attempt carries each header exactly once.
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var headerCounts: (Int, Int) = (-1, -1)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = try {
        ex.getRequestBody.readAllBytes()
        if (attempts.incrementAndGet() <= 2) ex.sendResponseHeaders(503, -1)
        else {
          headerCounts = (
            Option(ex.getRequestHeaders.get("Authorization")).map(_.size).getOrElse(0),
            Option(ex.getRequestHeaders.get("If-None-Match")).map(_.size).getOrElse(0))
          ex.sendResponseHeaders(201, -1)
        }
      } finally ex.close()
    })
    server.start()
    try {
      val ep = new java.net.URI(s"http://127.0.0.1:${server.getAddress.getPort}")
      val signs = new java.util.concurrent.atomic.AtomicInteger(0)
      val claims = new graft.bank.HttpConditionalPutClaimStore(ep,
        sign = b => { signs.incrementAndGet(); b.header("Authorization", "Bearer t") })
      assert(claims.putIfAbsent(new Path(tmp(), "c.json"), "x".getBytes))
      assert(attempts.get() == 3)
      assert(signs.get() == 3, "signer must re-stamp every attempt")
      assert(headerCounts == ((1, 1)),
        s"retried request must carry each header once, got $headerCounts")
    } finally server.stop(0)
  }

  test("tag retention bounds the checkpointed tag set; recent replay stays exactly-once") {
    val t = new TxTable(spark, tmp(), checkpointInterval = 2,
      tagRetention = Some(3L))
    (0 until 10).foreach(i =>
      t.append(Seq((i.toLong, s"r$i")).toDF("id", "s"), tag = Some(s"b$i")))
    // checkpoint at v8 kept tags with commit version >= 8-3=5; delta 9 adds b9
    assert(t.tags() == Seq("b5", "b6", "b7", "b8", "b9"))
    // replay of a batch inside the horizon is still skipped
    assert(t.appendOnce(Seq((99L, "dup")).toDF("id", "s"), "b7").isEmpty)
    assert(t.read().count() == 10)
    // without retention every tag survives checkpointing
    val t2 = new TxTable(spark, tmp(), checkpointInterval = 2)
    (0 until 6).foreach(i =>
      t2.append(Seq((i.toLong, s"r$i")).toDF("id", "s"), tag = Some(s"b$i")))
    assert(t2.tags() == (0 until 6).map(i => s"b$i"))
  }

  test("tagRetention below checkpointInterval is rejected at construction") {
    intercept[IllegalArgumentException] {
      new TxTable(spark, tmp(), checkpointInterval = 5, tagRetention = Some(2L))
    }
  }

  test("tag-only commit does not clobber the committed schema (ADVICE regression)") {
    val t = new TxTable(spark, tmp())
    t.append(Seq((1L, "a")).toDF("id", "s"))
    // record a tag via a zero-column empty frame: no MetaData stamped
    t.append(spark.emptyDataFrame, tag = Some("marker"))
    assert(t.tags().contains("marker"))
    t.overwrite(Seq((1L, "a")).toDF("id", "s").filter(lit(false)))
    // empty live set still resolves to the LAST REAL schema, not ()
    assert(t.read().schema.fieldNames.toSeq == Seq("id", "s"))
  }

  test("empty live set keeps the committed schema; fresh compact is a no-op") {
    val t = new TxTable(spark, tmp())
    assert(t.compact() == -1L) // nothing committed: no crash, no commit
    val df = Seq((1L, "a", 2.5)).toDF("id", "s", "x")
    t.append(df)
    t.overwrite(df.filter(lit(false))) // live file set may go empty
    val empty = t.read()
    assert(empty.count() == 0)
    assert(empty.schema.fieldNames.toSeq == Seq("id", "s", "x"))
    // downstream column-resolving plans still analyze
    assert(empty.groupBy("s").agg(max("id")).count() == 0)
    // a fresh tx EventBank compacts without crashing (ADVICE regression)
    val bank = new graft.bank.EventBank(spark,
      java.nio.file.Files.createTempDirectory("txev2").toString,
      mergeOnRead = true, txIndex = true)
    bank.compact()
  }

  test("seeded fuzz: concurrent overwriteIfVersion upserts against a per-key model") {
    val t = new TxTable(spark, tmp(), checkpointInterval = 4)
    val nWriters = 4
    val opsPer = 5
    val rnd = new scala.util.Random(4721)
    // each op: upsert key -> value (writer-unique); model = per-key set
    // of written values
    val plans: Seq[Seq[(Long, Long)]] = (0 until nWriters).map { w =>
      (0 until opsPer).map { i =>
        (rnd.nextInt(5).toLong, (w * 1000 + i).toLong)
      }
    }
    val writtenByKey: Map[Long, Set[Long]] =
      plans.flatten.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    def upsert(key: Long, value: Long): Unit = {
      var done = false
      while (!done) {
        val cur = t.latestVersion()
        val updated = Seq((key, value)).toDF("k", "v")
        if (cur < 0) {
          // bootstrap: claim version 0; a loser falls through and retries
          done = t.overwriteIfVersion(updated, -1L).isDefined
        } else {
          val merged = t.read(Some(cur)).filter(col("k") =!= key)
            .unionByName(updated)
          done = t.overwriteIfVersion(merged, cur).isDefined
        }
      }
    }
    val pool = Executors.newFixedThreadPool(nWriters)
    val start = new CountDownLatch(1)
    val errs = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Throwable]())
    plans.foreach { plan =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try plan.foreach { case (k, v) => upsert(k, v) }
          catch { case e: Throwable => errs.add(e) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(600, TimeUnit.SECONDS))
    import scala.jdk.CollectionConverters._
    assert(errs.asScala.isEmpty, errs.asScala.map(_.toString).toString)
    // per-key model: exactly one row per touched key, value one of the
    // values some writer actually wrote to that key
    val got = t.read().select("k", "v").as[(Long, Long)].collect().toSeq
    assert(got.map(_._1).sorted == writtenByKey.keys.toSeq.sorted,
      s"keys: ${got.map(_._1).sorted} vs ${writtenByKey.keys.toSeq.sorted}")
    got.foreach { case (k, v) =>
      assert(writtenByKey(k).contains(v), s"key $k holds unwritten value $v")
    }
    // serializability: walking versions, each key only ever holds
    // written values and the key set only grows
    val latest = t.latestVersion()
    var seenKeys = Set.empty[Long]
    (0L to latest).foreach { ver =>
      val rows = t.read(Some(ver)).select("k", "v").as[(Long, Long)]
        .collect().toSeq
      assert(rows.map(_._1).distinct.size == rows.size,
        s"duplicate keys at version $ver")
      rows.foreach { case (k, v) => assert(writtenByKey(k).contains(v)) }
      assert(seenKeys.subsetOf(rows.map(_._1).toSet),
        s"key vanished at version $ver")
      seenKeys = rows.map(_._1).toSet
    }
  }
}
