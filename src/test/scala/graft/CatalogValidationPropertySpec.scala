package graft

import scala.util.Random
import graft.operators.CatalogValidation

/** Differential tests for the seismology validation rules: random pick
  * catalogs checked against straightforward in-memory reference
  * implementations of each rule's semantics (the same discipline as
  * IntervalPropertySpec). Seeded → deterministic.
  */
class CatalogValidationPropertySpec extends SparkSpec {
  import spark.implicits._

  private case class P(rid: String, eid: String, net: String, sta: String,
                       loc: String, chan: String, phase: String,
                       status: String, time: Long)

  private def randomPicks(seed: Int): Seq[P] = {
    val rnd = new Random(seed)
    val phases = Seq("P", "p", "S", "s", "AML", "IAML", "Pg")
    (0 until (20 + rnd.nextInt(80))).map { i =>
      P(s"pk/$i", s"e${rnd.nextInt(4)}", s"N${rnd.nextInt(2)}",
        s"S${rnd.nextInt(3)}", if (rnd.nextBoolean()) "" else "00",
        Seq("HHZ", "HHN", "HHE")(rnd.nextInt(3)),
        phases(rnd.nextInt(phases.length)),
        if (rnd.nextInt(5) == 0) "rejected" else "",
        rnd.nextInt(100000).toLong * 1000)
    }
  }

  private def toDf(ps: Seq[P]) =
    ps.map(p => (p.rid, p.eid, p.net, p.sta, p.loc, p.chan, p.phase,
      p.status, p.time))
      .toDF("resource_id", "event_id", "network", "station", "location",
        "channel", "phase_hint", "evaluation_status", "time")

  private def active(ps: Seq[P]) = ps.filterNot(_.status == "rejected")

  test("duplicatePicks matches the in-memory reference on random catalogs") {
    for (seed <- 1 to 8) {
      val ps = randomPicks(seed)
      val exp = active(ps)
        .filter(p => Set("P", "p", "S", "s")(p.phase))
        .groupBy(p => (p.eid, p.phase, p.net, p.sta, p.loc))
        .values.flatMap(g => g.sortBy(p => (p.time, p.rid)).drop(1))
        .map(_.rid).toSeq.sorted
      val got = CatalogValidation.duplicatePicks(toDf(ps))
        .as[String].collect().sorted.toSeq
      assert(got == exp, s"seed=$seed")
    }
  }

  test("sBeforeP and ampBeforeP match the in-memory reference") {
    for (seed <- 10 to 17) {
      val ps = randomPicks(seed)
      val groups = active(ps).groupBy(p => (p.eid, p.net, p.sta, p.loc))
      val expS = groups.toSeq.flatMap { case ((e, n, s, l), g) =>
        val pT = g.filter(_.phase.toUpperCase == "P").map(_.time).minOption
        val sT = g.filter(_.phase.toUpperCase == "S").map(_.time).minOption
        (pT, sT) match {
          case (Some(pt), Some(st)) if st < pt => Seq(s"$e|$n.$s" + (if (l.isEmpty) "." else s".$l"))
          case _ => Nil
        }
      }.sorted
      val expA = groups.toSeq.flatMap { case (_, g) =>
        g.filter(_.phase.toUpperCase == "P").map(_.time).minOption match {
          case Some(pt) =>
            g.filter(p => p.phase.endsWith("AML") && p.time < pt).map(_.rid)
          case None => Nil
        }
      }.sorted
      val gotS = CatalogValidation.sBeforeP(toDf(ps)).as[String]
        .collect().sorted.toSeq
      val gotA = CatalogValidation.ampBeforeP(toDf(ps)).as[String]
        .collect().sorted.toSeq
      assert(gotS == expS, s"seed=$seed sBeforeP")
      assert(gotA == expA, s"seed=$seed ampBeforeP")
    }
  }

  test("pOutliers matches the in-memory reference (interpolated median over µs)") {
    for (seed <- 20 to 27; lim <- Seq(1000L, 20000L)) {
      val ps = randomPicks(seed)
      val exp = active(ps).filter(_.phase == "P").groupBy(_.eid)
        .values.flatMap { g =>
          val us = g.map(_.time / 1000).sorted
          val n = us.length
          val med =
            if (n % 2 == 1) us(n / 2).toDouble
            else (us(n / 2 - 1) + us(n / 2)) / 2.0
          g.filter(p => math.abs(p.time / 1000 - med) > lim).map(_.rid)
        }.toSeq.sorted
      val got = CatalogValidation.pOutliers(toDf(ps), lim)
        .as[String].collect().sorted.toSeq
      assert(got == exp, s"seed=$seed lim=$lim")
    }
  }

  test("ampsOnZ matches the in-memory reference") {
    for (seed <- 30 to 33) {
      val ps = randomPicks(seed)
      val exp = active(ps)
        .filter(p => Set("AML", "IAML")(p.phase) && p.chan.endsWith("Z"))
        .map(_.rid).sorted
      val got = CatalogValidation.ampsOnZ(toDf(ps)).as[String]
        .collect().sorted.toSeq
      assert(got == exp, s"seed=$seed")
    }
  }
}
