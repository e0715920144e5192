package graft

import graft.operators.Dedup
import graft.tools.{PlanIntrospect, ScaleBench}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-proof assertions for the pipeline operators: the SAME
  * compositions the oracle queries pin (shared bodies, see
  * tools.ScaleBench) must keep their physical-plan shape as the corpus
  * grows — shuffle count constant, no BroadcastNestedLoop/cartesian
  * appearing when size estimates change, CC round count flat. Wall
  * times are NOT asserted here (CI noise); graft.tools.ScaleBench
  * records them at 10⁶–10⁷ docs in BASELINE.md.
  *
  * Size-triggered broadcasts are disabled for the comparison — the
  * plan that matters is the one where nothing fits in a broadcast (the
  * 100 TB shape); operators' explicit broadcast hints stay live.
  */
class ScaleProofSpec extends SparkSpec {
  import spark.implicits._

  private val small = 8000L
  private val large = 40000L // 5× — enough to flip any size heuristic

  private lazy val corpora: Map[Long, DataFrame] = {
    val root = java.nio.file.Files.createTempDirectory("graft-scaleproof")
    Seq(small, large).map { n =>
      val dir = root.resolve(s"docs_$n").toString
      ScaleBench.synthDocs(spark, n).write.parquet(dir)
      n -> spark.read.parquet(dir)
    }.toMap
  }

  private def withPlainJoins[T](f: => T): T = {
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("plan shape is scale-invariant: constant shuffles, no BNLJ/cartesian") {
    withPlainJoins {
      val perScale = Seq(small, large).map { n =>
        n -> ScaleBench.pipelines(corpora(n)).map { case (name, mk) =>
          name -> PlanIntrospect.counts(mk())
        }
      }
      val (_, base) = perScale.head
      perScale.foreach { case (n, counts) =>
        counts.zip(base).foreach { case ((name, c), (_, b)) =>
          assert(c.bnlj == 0 && c.cartesian == 0,
            s"$name at $n docs: ${c.render}")
          assert(c.shuffles == b.shuffles && c.broadcasts == b.broadcasts,
            s"$name plan changed with scale: $n docs ${c.render} " +
              s"vs $small docs ${b.render}")
        }
      }
    }
  }

  test("image near-dup plan shape is scale-invariant; planted pairs found exactly") {
    withPlainJoins {
      val perScale = Seq(small, large).map { n =>
        val imgs = spark.range(n).select(col("id").as("doc_id")).as[Long]
          .mapPartitions { it =>
            javax.imageio.ImageIO.setUseCache(false)
            it.map(id => (id, graft.queries.MultimodalQueries.renderPng(id)))
          }.toDF("doc_id", "payload")
        val pairs = graft.multimodal.Multimodal
          .imageNearDupPairs(spark, imgs, maxHamming = 3)
        val counts = PlanIntrospect.counts(pairs)
        assert(counts.bnlj == 0 && counts.cartesian == 0, counts.render)
        // at these scales the synthetic image space has no background
        // near-collisions (first appear around 10⁵): the pair set IS
        // the planted set, so recall and precision are both pinned
        val found = pairs.select("a", "b").as[(Long, Long)]
          .collect().toSet
        val planted = (7L until n by 50L).map(b => (b - 7, b)).toSet
        assert(found == planted,
          s"$n imgs: ${found.size} found vs ${planted.size} planted")
        // end-to-end dedup keeps exactly one doc per planted pair
        val labels = graft.multimodal.Multimodal.dedupImages(spark, imgs,
          maxHamming = 3)
        assert(PlanIntrospect.counts(labels).cartesian == 0)
        assert(labels.filter(col("is_keeper") === 1L).count() ==
          n - planted.size)
        n -> counts
      }
      val (_, base) = perScale.head
      perScale.foreach { case (n, c) =>
        assert(c.shuffles == base.shuffles && c.broadcasts == base.broadcasts,
          s"image near-dup plan changed with scale: $n imgs ${c.render} " +
            s"vs $small imgs ${base.render}")
      }
    }
  }

  test("embedding near-dup / ANN probe plan shapes are scale-invariant; planted structure exact") {
    withPlainJoins {
      val perScale = Seq(small, large).map { n =>
        val vecs = ScaleBench.synthEmbeddings(spark, n)
        // the batch operator the q110 stream defers to: bucket join +
        // cosine refine — one shuffle pair, never all-pairs
        val pairs = graft.operators.Similarity.nearDupPairs(
          vecs, "doc_id", "embedding", bits = 16, minCosine = 0.99)
        val cp = PlanIntrospect.counts(pairs)
        assert(cp.bnlj == 0 && cp.cartesian == 0, cp.render)
        // synthEmbeddings plants 15 kept pairs per full group of 8
        // (5 exact copies + 1 near member; the co-bucketed far member
        // must be refined away) and no background near-collisions
        assert(pairs.count() == (n / 8) * 15,
          s"$n vecs: expected ${(n / 8) * 15} planted pairs")
        // the probe the q111 stream runs per micro-batch
        val topk = graft.operators.Similarity.lshTopK(
          vecs, vecs.filter(col("doc_id") % 1000 === 0),
          "doc_id", "embedding", bits = 16, k = 5)
        val ct = PlanIntrospect.counts(topk)
        assert(ct.bnlj == 0 && ct.cartesian == 0, ct.render)
        n -> (cp, ct)
      }
      val (_, (bp, bt)) = perScale.head
      perScale.foreach { case (n, (cp, ct)) =>
        assert(cp.shuffles == bp.shuffles && cp.broadcasts == bp.broadcasts,
          s"embedding near-dup plan changed with scale: $n ${cp.render}")
        assert(ct.shuffles == bt.shuffles && ct.broadcasts == bt.broadcasts,
          s"lshTopK plan changed with scale: $n ${ct.render}")
      }
    }
  }

  test("CC round count stays flat (2-4) on the LSH pair graph at both scales") {
    withPlainJoins {
      Seq(small, large).foreach { n =>
        val pairs = graft.queries.DedupQueries.minhashPairsOf(corpora(n))
        Dedup.lastCcRounds = 0
        Dedup.connectedComponentsLabelProp(pairs, "a", "b").count()
        val lp = Dedup.lastCcRounds
        assert(lp >= 1 && lp <= 4, s"label-prop rounds $lp at $n docs")
        Dedup.lastCcRounds = 0
        Dedup.connectedComponentsStar(pairs, "a", "b").count()
        val star = Dedup.lastCcRounds
        assert(star >= 1 && star <= 4, s"star rounds $star at $n docs")
      }
    }
  }

  private lazy val eventsCorpora: Map[Long, DataFrame] = {
    val root = java.nio.file.Files.createTempDirectory("graft-scaleproof-ev")
    Seq(small, large).map { n =>
      val dir = root.resolve(s"events_$n").toString
      ScaleBench.synthEvents(spark, n).write.parquet(dir)
      n -> spark.read.parquet(dir)
    }.toMap
  }

  test("domain lifecycle plan shape is scale-invariant (q14/q15/q19/q67/q52/q53)") {
    withPlainJoins {
      val perScale = Seq(small, large).map { n =>
        n -> ScaleBench.domainPipelines(spark, eventsCorpora(n)).map {
          case (name, mk) => name -> PlanIntrospect.counts(mk())
        }
      }
      val (_, base) = perScale.head
      perScale.foreach { case (n, counts) =>
        counts.zip(base).foreach { case ((name, c), (_, b)) =>
          assert(c.cartesian == 0, s"$name at $n rows: ${c.render}")
          if (name.contains("q52")) {
            // the ONE sanctioned nested loop: the quakes x channels
            // cross expansion (reference origin strategy) with the
            // small inventory side explicitly broadcast — never an
            // unbroadcast cartesian
            assert(c.bnlj == 1 && c.broadcasts >= 1,
              s"$name at $n rows: ${c.render}")
          } else assert(c.bnlj == 0, s"$name at $n rows: ${c.render}")
          assert(c.shuffles == b.shuffles && c.broadcasts == b.broadcasts,
            s"$name plan changed with scale: $n rows ${c.render} " +
              s"vs $small rows ${b.render}")
        }
      }
    }
  }

  test("interval joins take the intended physical strategies at the 100 TB shape") {
    import org.apache.spark.sql.execution.joins.{SortMergeJoinExec, ShuffledHashJoinExec}
    withPlainJoins {
      val ev = eventsCorpora(small)
      def planNodes(df: DataFrame) =
        PlanIntrospect.nodes(df.queryExecution.executedPlan)
      // q19: the request side is explicitly broadcast (requests are
      // small BY CONSTRUCTION — rare error events), so the broadcast
      // survives threshold -1 and the custom RangeJoinExec interval
      // index carries the range predicate: no per-row scan of the
      // whole window
      val q19 = graft.queries.WindowQueries.intervalJoinOf(ev)
      assert(planNodes(q19).exists(_.isInstanceOf[graft.plans.RangeJoinExec]),
        "q19 must plan the broadcast interval-index join")
      // q67: the huge x huge scale path — banded equi join, pure
      // shuffle (SMJ/SHJ on (user_id, band)), ZERO broadcasts
      val q67 = graft.queries.WindowQueries.intervalJoinOf(ev, banded = true)
      val n67 = planNodes(q67)
      assert(n67.exists(p => p.isInstanceOf[SortMergeJoinExec] ||
        p.isInstanceOf[ShuffledHashJoinExec]),
        "q67 must plan a shuffled equi join on (user_id, band)")
      assert(PlanIntrospect.counts(q67).broadcasts == 0,
        "the banded path must not depend on any broadcast")
      // q52: the fetch lifecycle's overlap join rides the same
      // RangeJoinExec (requests = quakes x channels, explicitly
      // broadcast; the index side streams)
      val q52 = graft.queries.DomainQueries.fetchWindowsOf(spark, ev)
      assert(planNodes(q52).exists(_.isInstanceOf[graft.plans.RangeJoinExec]),
        "q52 must plan the broadcast interval-index join")
    }
  }

  test("planted dedup structure is found exactly, and scales linearly") {
    Seq(small, large).foreach { n =>
      val docs = corpora(n)
      val groups = n / 8
      // exact dedup: members 0 and 6 of each group are identical, all
      // other texts distinct -> exactly 7 fingerprints per group
      assert(Dedup.exactGroups(docs, "text", "doc_id").count() == groups * 7)
      // LSH pairs: identical signatures always collide, so every
      // group's (base, exact-copy) pair (b - a == 6, a % 8 == 0) is
      // present; totals stay bounded (group-local, no chaining blowup)
      val pairs = graft.queries.DedupQueries.minhashPairsOf(docs).cache()
      try {
        assert(pairs.filter(col("a") % 8 === 0 && col("b") - col("a") === 6)
          .count() == groups)
        val total = pairs.count()
        assert(total >= groups * 10 && total <= groups * 21,
          s"$total pairs for $groups groups") // <= C(7,2) per group
      } finally pairs.unpersist()
    }
  }

  test("both CC algorithms agree: group members share a component, unique docs do not") {
    val labels = graft.queries.DedupQueries
      .clusterLabelsOf(corpora(small), Dedup.connectedComponentsLabelProp(_, "a", "b"))
    val star = graft.queries.DedupQueries
      .clusterLabelsOf(corpora(small), Dedup.connectedComponentsStar(_, "a", "b"))
    // same labeling from both algorithms (the q48/q65 agreement, here
    // on a corpus 12x the oracle's)
    assert(labels.exceptAll(star).isEmpty && star.exceptAll(labels).isEmpty)
    val byMember = labels
      .withColumn("m", pmod(col("doc_id"), lit(8L)))
      .withColumn("grouped", (col("component") === col("doc_id") - col("m"))
        .cast("long"))
    // exact copies (m = 6) ALWAYS share the base's component — identical
    // signatures collide in every band, no probability involved
    val exactRow = byMember.filter(col("m") === 6)
      .agg(count(lit(1)), sum("grouped")).head()
    assert(exactRow.getLong(0) == exactRow.getLong(1), "an exact copy escaped")
    // near-dup members (m 1..5) connect with LSH probability, not
    // certainty — assert corpus-level recall, not per-doc membership
    val nearRow = byMember.filter(col("m").between(1, 5))
      .agg(count(lit(1)), sum("grouped")).head()
    // 4 bands x 2 rows on ~6%-perturbed docs measures 0.89 here (the
    // corpus and LSH are both hash-deterministic, so this is a fixed
    // number, not a flaky one); the bound has margin, not slack for
    // regressions below the banding math's own recall
    val recall = nearRow.getLong(1).toDouble / nearRow.getLong(0)
    assert(recall > 0.85, s"near-dup recall $recall")
    // unique docs (m = 7) stay singletons
    val uniqRow = byMember.filter(col("m") === 7)
      .agg(count(lit(1)), sum((col("component") === col("doc_id")).cast("long")))
      .head()
    assert(uniqRow.getLong(0) == uniqRow.getLong(1), "a unique doc joined a component")
  }

  test("q80 hot-span join re-parallelizes under adversarial skew (AQE skew split)") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    // every doc contains the SAME 8-token run: one span key occurs
    // once per document, so the occurrence x detection join funnels
    // the whole corpus through a single key — the mega-duplicated
    // boilerplate shape at 100 TB
    val n = 50000L
    val docs = ScaleBench.synthDocsHotSpan(spark, n)
    // thresholds scaled to spec size (the default 256 MB skew floor
    // would need a corpus CI can't afford); force=true because the
    // rule's extra-shuffle veto is moot here — the downstream merge
    // window repartitions by doc regardless
    val tuned = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      // enough partitions that uniform keys spread thin and the hot
      // key's partition dwarfs the median — at 100 TB this contrast
      // exists at the DEFAULT thresholds; spec scale must create it
      "spark.sql.shuffle.partitions" -> "64")
    val saved = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      withPlainJoins { // the 100 TB shape: detection side too big to broadcast
        val out = Dedup.removeDuplicateSpans(docs, "text", "doc_id", width = 8)
          .agg(sum("n_cut").as("cut"), count(lit(1)).as("docs"),
            sum(when(col("n_cut") === 0L, 1L).otherwise(0L)).as("intact"))
        // collect() (not head()) — head() spawns a separate limit
        // plan, leaving THIS dataset's adaptive plan unfinalized
        val r = out.collect().head
        // correctness under skew: the canonical doc keeps its run,
        // every other occurrence (8 tokens each) is cut
        assert(r.getAs[Long]("docs") == n)
        assert(r.getAs[Long]("intact") == 1L, "exactly one keeper doc")
        assert(r.getAs[Long]("cut") == 8L * (n - 1), s"cut=${r.getAs[Long]("cut")}")
        // and the engine actually split the hot key: the finalized
        // adaptive plan must contain a skew-marked sort-merge join
        val skewed = PlanIntrospect.nodes(out.queryExecution.executedPlan)
          .collect { case j: SortMergeJoinExec if j.isSkewJoin => j }
        assert(skewed.nonEmpty,
          "no skew-split SMJ in the executed plan:\n" +
            out.queryExecution.executedPlan.treeString)
      }
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
