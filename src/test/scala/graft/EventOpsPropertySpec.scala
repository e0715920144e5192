package graft

import scala.util.Random
import graft.core.EventOps
import graft.core.EventOps._

/** Differential test for the prune graph semantics: random trees with
  * random statuses and references, checked against an edge-list
  * reference implementation shaped like the obsplus original
  * (`utils/events.py:98-145`: build (parent, child) edges from every
  * status-carrying object to every resource id it contains, keep a
  * rejected object iff some non-rejected parent references it).
  * Seeded → deterministic.
  */
class EventOpsPropertySpec extends SparkSpec {

  private def randomEvent(seed: Int): FullEvent = {
    val rnd = new Random(seed)
    def status() = if (rnd.nextInt(3) == 0) Some("rejected") else Some("")
    val nPicks = 1 + rnd.nextInt(6)
    val picks = (0 until nPicks).map(i =>
      Pick(s"p$i", rnd.nextInt(1000).toLong, "N.S..HHZ",
        Seq("P", "S", "AML")(rnd.nextInt(3)), status()))
    def somePick() = s"p${rnd.nextInt(nPicks)}"
    val nOrigins = rnd.nextInt(3)
    val origins = (0 until nOrigins).map(i =>
      Origin(s"o$i", rnd.nextInt(1000).toLong, 1.0, 2.0, 3.0, status(),
        (0 until rnd.nextInt(3)).map(j => Arrival(s"o$i-a$j", somePick(), "P"))))
    val magnitudes = (0 until rnd.nextInt(3)).map(i =>
      Magnitude(s"m$i", 1.0, "ML",
        if (nOrigins > 0) s"o${rnd.nextInt(nOrigins)}" else "o-none", status()))
    val amplitudes = (0 until rnd.nextInt(4)).map(i =>
      Amplitude(s"a$i", 1.0, somePick(), "f", status()))
    FullEvent("ev", None, None, Nil, picks, origins, magnitudes, amplitudes)
  }

  /** Edge-list reference: (statusObjRid, rejected, containedRids). */
  private def refPrune(e: FullEvent): Set[String] = {
    def rej(s: Option[String]) = s.contains("rejected")
    val objs: Seq[(String, Boolean, Seq[String])] =
      e.picks.map(p => (p.resource_id, rej(p.evaluation_status),
        Seq(p.resource_id))) ++
      e.origins.map(o => (o.resource_id, rej(o.evaluation_status),
        o.resource_id +: o.arrivals.flatMap(a => Seq(a.resource_id, a.pick_id)))) ++
      e.magnitudes.map(m => (m.resource_id, rej(m.evaluation_status),
        Seq(m.resource_id, m.origin_id))) ++
      e.amplitudes.map(a => (a.resource_id, rej(a.evaluation_status),
        Seq(a.resource_id, a.pick_id)))
    val edges = for {
      (rid, isRej, refs) <- objs; child <- refs
    } yield (rid, isRej, child)
    val rejectedRids = objs.collect { case (rid, true, _) => rid }.toSet
    rejectedRids.filter { rid =>
      // removed iff every edge into it comes from a rejected parent
      edges.collect { case (_, pRej, c) if c == rid => pRej }.forall(identity)
    }
  }

  test("pruneOne removes exactly the orphaned rejected set on random trees") {
    for (seed <- 1 to 60) {
      val e = randomEvent(seed)
      val expected = refPrune(e)
      val p = EventOps.pruneOne(e)
      def ids(x: FullEvent): Set[String] =
        (x.picks.map(_.resource_id) ++ x.origins.map(_.resource_id) ++
          x.magnitudes.map(_.resource_id) ++
          x.amplitudes.map(_.resource_id)).toSet
      val removed = ids(e) -- ids(p)
      assert(removed == expected, s"seed=$seed removed=$removed expected=$expected")
      // non-rejected objects are never removed
      def statuses(x: FullEvent): Map[String, Option[String]] =
        (x.picks.map(p0 => p0.resource_id -> p0.evaluation_status) ++
          x.origins.map(o => o.resource_id -> o.evaluation_status) ++
          x.magnitudes.map(m => m.resource_id -> m.evaluation_status) ++
          x.amplitudes.map(a => a.resource_id -> a.evaluation_status)).toMap
      removed.foreach(rid => assert(statuses(e)(rid).contains("rejected")))
      // idempotence is NOT expected (a second pass may remove objects
      // whose only live referrer was itself removed), but a fixpoint
      // must exist within #objects passes and only shrink
      val p2 = EventOps.pruneOne(p)
      assert(ids(p2).subsetOf(ids(p)))
    }
  }
}
