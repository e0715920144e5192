package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Lexical
import graft.tools.{PlanIntrospect, ScaleBench}

/** Plan-shape pins for the round-16 positional surfaces (SDM full /
  * SDM rerank / phrase): with size-triggered broadcasts DISABLED (the
  * nothing-fits 100 TB shape), the query-sized sides must still ride
  * EXPLICIT broadcasts, nothing may degenerate to BNLJ/cartesian, and
  * the shuffle count must not grow with the corpus — the scale claim
  * is the plan, not a local wall.
  */
class SdmPlanSpec extends SparkSpec {
  import spark.implicits._

  private val small = 5000L
  private val large = 25000L

  private lazy val corpora: Map[Long, DataFrame] = {
    val root = java.nio.file.Files.createTempDirectory("graft-sdmplan")
    root.toFile.deleteOnExit()
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

  private def plans(n: Long): Seq[(String, PlanIntrospect.Counts)] = {
    val d = corpora(n)
    val post = Lexical.postingsPositional(d, "text", "doc_id")
    val qs = d.filter(col("doc_id") % 500 === 0)
      .select(col("doc_id").as("q_id"),
        concat_ws(" ",
          slice(graft.functions.TextFunctions.tokens(col("text")), 1, 3))
          .as("qtext"))
    Seq(
      "sdm_full" -> PlanIntrospect.counts(
        Lexical.sdmTopKFromPostings(post, qs, "qtext", "q_id", k = 5)),
      "sdm_rerank" -> PlanIntrospect.counts(
        Lexical.sdmTopKFromPostings(post, qs, "qtext", "q_id", k = 5,
          rerank = Some(20))),
      "phrase" -> PlanIntrospect.counts(
        Lexical.phraseTopKFromPostings(post, qs, "qtext", "q_id", k = 5)))
  }

  test("SDM/phrase plan shape is scale-invariant: constant shuffles, " +
      "no cartesian, explicit broadcasts survive threshold -1") {
    withPlainJoins {
      val base = plans(small)
      val big = plans(large)
      base.zip(big).foreach { case ((name, b), (_, c)) =>
        // the ONLY nested-loop joins allowed are the sanctioned
        // one-row stats crossJoins (broadcast side is literally a
        // single aggregate row — corpus growth cannot touch them), so
        // the count must be small and SCALE-INVARIANT; a cartesian is
        // never allowed.
        assert(b.cartesian == 0 && c.cartesian == 0,
          s"$name: ${b.render} / ${c.render}")
        assert(b.bnlj <= 2 && c.bnlj == b.bnlj,
          s"$name nested-loop joins beyond the one-row stats " +
            s"crossJoins: $small docs ${b.render} vs $large ${c.render}")
        assert(c.shuffles == b.shuffles,
          s"$name shuffle count changed with scale: " +
            s"$small docs ${b.render} vs $large docs ${c.render}")
        assert(c.broadcasts >= 1,
          s"$name lost its explicit query-side broadcast: ${c.render}")
      }
    }
  }
}
