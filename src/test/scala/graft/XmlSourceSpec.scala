package graft

import java.nio.file.Files
import graft.sources.{QuakeMl, StationXml, Xml}

/** QuakeML / StationXML parsing: field extraction, preferred-element
  * resolution, ns time round trip, permissive directory scans, and
  * write→parse identity.
  */
class XmlSourceSpec extends SparkSpec {

  private val qml =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<q:quakeml xmlns:q="http://quakeml.org/xmlns/quakeml/1.2"
      |           xmlns="http://quakeml.org/xmlns/bed/1.2">
      | <eventParameters publicID="smi:local/cat">
      |  <event publicID="smi:local/ev1">
      |   <preferredOriginID>smi:local/or2</preferredOriginID>
      |   <preferredMagnitudeID>smi:local/mag1</preferredMagnitudeID>
      |   <description><text>quarry blast</text></description>
      |   <origin publicID="smi:local/or1">
      |    <time><value>2019-01-01T00:00:00.5Z</value></time>
      |    <latitude><value>1.0</value></latitude>
      |    <longitude><value>2.0</value></longitude>
      |    <arrival publicID="smi:local/ar1">
      |     <pickID>smi:local/pk1</pickID><phase>P</phase>
      |     <azimuth>10.5</azimuth><distance>0.3</distance>
      |     <timeResidual>-0.12</timeResidual><timeWeight>1.0</timeWeight>
      |    </arrival>
      |   </origin>
      |   <origin publicID="smi:local/or2">
      |    <time><value>2019-01-01T00:00:00.123456789Z</value></time>
      |    <latitude><value>35.5</value></latitude>
      |    <longitude><value>-117.25</value></longitude>
      |    <depth><value>5000.0</value><uncertainty>120.0</uncertainty></depth>
      |    <arrival publicID="smi:local/ar2">
      |     <pickID>smi:local/pk1</pickID><phase>P</phase>
      |    </arrival>
      |    <quality>
      |     <associatedPhaseCount>4</associatedPhaseCount>
      |     <usedPhaseCount>0</usedPhaseCount>
      |     <standardError>0.25</standardError>
      |     <azimuthalGap>80.0</azimuthalGap>
      |    </quality>
      |    <originUncertainty>
      |     <horizontalUncertainty>350.0</horizontalUncertainty>
      |    </originUncertainty>
      |    <creationInfo><creationTime>2019-03-01T00:00:00Z</creationTime></creationInfo>
      |   </origin>
      |   <magnitude publicID="smi:local/mag1">
      |    <mag><value>2.75</value></mag><type>ML</type>
      |    <originID>smi:local/or2</originID>
      |    <stationCount>12</stationCount><azimuthalGap>45.0</azimuthalGap>
      |   </magnitude>
      |   <magnitude publicID="smi:local/mag2">
      |    <mag><value>3.0</value></mag><type>MW</type>
      |   </magnitude>
      |   <pick publicID="smi:local/pk1">
      |    <time><value>2019-01-01T00:00:01.25Z</value></time>
      |    <waveformID networkCode="UU" stationCode="TMU"
      |                locationCode="01" channelCode="HHZ"/>
      |    <phaseHint>P</phaseHint><onset>impulsive</onset>
      |    <polarity>positive</polarity>
      |    <evaluationStatus>reviewed</evaluationStatus>
      |   </pick>
      |   <amplitude publicID="smi:local/am1">
      |    <genericAmplitude><value>0.004</value></genericAmplitude>
      |    <type>AML</type><unit>m</unit>
      |    <period><value>0.2</value></period><snr>8.5</snr>
      |    <pickID>smi:local/pk1</pickID>
      |   </amplitude>
      |   <stationMagnitude publicID="smi:local/sm1">
      |    <mag><value>2.6</value></mag><type>ML</type>
      |    <originID>smi:local/or2</originID>
      |    <amplitudeID>smi:local/am1</amplitudeID>
      |    <waveformID networkCode="UU" stationCode="TMU"
      |                locationCode="01" channelCode="HHZ"/>
      |   </stationMagnitude>
      |   <creationInfo>
      |    <agencyID>NIOSH</agencyID><author>auto</author>
      |    <creationTime>2019-02-01T12:00:00Z</creationTime>
      |    <version>2</version>
      |   </creationInfo>
      |  </event>
      | </eventParameters>
      |</q:quakeml>""".stripMargin

  test("iso/ns time conversion round-trips at ns precision") {
    val cases = Seq("2019-01-01T00:00:00.123456789Z", "1969-12-31T23:59:59.999999999Z",
      "2024-02-29T12:34:56.000000001Z")
    cases.foreach { s =>
      val ns = Xml.isoToNs(s).get
      assert(Xml.nsToIso(ns) == s)
    }
    assert(Xml.isoToNs("2019-01-01T00:00:00").contains(1546300800L * 1000000000L))
    assert(Xml.isoToNs("garbage").isEmpty)
    // explicit offsets parse (negative offsets especially — the date's
    // own hyphens must not mask them)
    assert(Xml.isoToNs("2019-01-01T00:00:00-07:00") ==
      Xml.isoToNs("2019-01-01T07:00:00Z"))
    assert(Xml.isoToNs("2019-01-01T05:30:00+05:30") ==
      Xml.isoToNs("2019-01-01T00:00:00Z"))
  }

  test("quakeml: preferred origin/magnitude drive the event summary") {
    val cat = QuakeMl.parseCatalog(qml.getBytes("UTF-8"), Some("/x.xml"))
    assert(cat.events.length == 1)
    val ev = cat.events.head
    assert(ev.event_id == "smi:local/ev1")
    assert(ev.time.contains(Xml.isoToNs("2019-01-01T00:00:00.123456789Z").get))
    assert(ev.latitude.contains(35.5) && ev.longitude.contains(-117.25))
    assert(ev.depth.contains(5000.0))
    assert(ev.magnitude.contains(2.75) && ev.magnitude_type.contains("ML"))
    // latest-per-type columns: ML from mag1, MW from mag2, no MD
    assert(ev.local_magnitude.contains(2.75))
    assert(ev.moment_magnitude.contains(3.0))
    assert(ev.duration_magnitude.isEmpty)
    assert(ev.agency_id.contains("NIOSH") && ev.author.contains("auto"))
    // updated = newest creationTime anywhere in the tree (the origin's
    // March stamp beats the event-level February one)
    assert(ev.updated.contains(Xml.isoToNs("2019-03-01T00:00:00Z").get))
    assert(ev.creation_time.contains(Xml.isoToNs("2019-02-01T12:00:00Z").get))
    assert(ev.version.contains("2"))
  }

  test("quakeml: origin-quality columns follow reference falsy semantics") {
    val ev = QuakeMl.parseCatalog(qml.getBytes("UTF-8")).events.head
    assert(ev.event_description.contains("quarry blast"))
    assert(ev.associated_phase_count.contains(4L))
    assert(ev.azimuthal_gap.contains(80.0))
    assert(ev.standard_error.contains(0.25))
    assert(ev.horizontal_uncertainty.contains(350.0))
    assert(ev.vertical_uncertainty.contains(120.0))
    // phase counts come from the PREFERRED origin's arrivals only
    // (or1's arrival doesn't count); pick counts from all event picks
    assert(ev.p_phase_count.contains(1L) && ev.s_phase_count.contains(0L))
    assert(ev.p_pick_count.contains(1L) && ev.s_pick_count.contains(0L))
    // quality said usedPhaseCount=0 — falsy, so the derived P+S wins
    assert(ev.used_phase_count.contains(1L))
    // one station (TMU) referenced by the preferred origin's arrivals
    assert(ev.station_count.contains(1L))
  }

  test("quakeml: picks, magnitudes, amplitudes, arrivals extract fully") {
    val cat = QuakeMl.parseCatalog(qml.getBytes("UTF-8"))
    val p = cat.picks.head
    assert(p.resource_id == "smi:local/pk1" && p.event_id == "smi:local/ev1")
    assert(p.network.contains("UU") && p.station.contains("TMU") &&
      p.location.contains("01") && p.channel.contains("HHZ"))
    assert(p.phase_hint.contains("P") && p.polarity.contains("positive"))

    assert(cat.magnitudes.map(_.magnitude_type).flatten == Seq("ML", "MW"))
    assert(cat.magnitudes.head.station_count.contains(12L))

    val a = cat.amplitudes.head
    assert(a.generic_amplitude.contains(0.004) && a.unit.contains("m") &&
      a.pick_id.contains("smi:local/pk1"))

    val ar = cat.arrivals.head
    assert(ar.origin_id == "smi:local/or1" && ar.phase.contains("P") &&
      ar.time_residual.contains(-0.12) && ar.time_weight.contains(1.0))

    val sm = cat.stationMagnitudes.head
    assert(sm.resource_id == "smi:local/sm1" && sm.magnitude.contains(2.6))
    assert(sm.station_magnitude_type.contains("ML") &&
      sm.amplitude_id.contains("smi:local/am1") &&
      sm.origin_id.contains("smi:local/or2"))
    assert(sm.station.contains("TMU") && sm.channel.contains("HHZ"))
    // the plain-magnitudes extraction must NOT absorb stationMagnitude
    assert(cat.magnitudes.length == 2)
  }

  test("quakeml: station_magnitudes table conforms with seed_id") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-smag").toString
    Files.write(java.nio.file.Paths.get(s"$dir/ev1.xml"), qml.getBytes("UTF-8"))
    val sm = QuakeMl.readTables(spark, dir)("station_magnitudes")
    assert(sm.columns.toSeq ==
      graft.core.Schemas.stationMagnitudes.fields.map(_.name).toSeq)
    val row = sm.head
    assert(row.getAs[String]("seed_id") == "UU.TMU.01.HHZ")
    assert(row.getAs[Double]("magnitude") == 2.6)
  }

  test("quakeml: missing preferred id falls back to last element") {
    val noPref = qml.replaceAll("<preferred(Origin|Magnitude)ID>[^<]*</preferred(Origin|Magnitude)ID>", "")
    val ev = QuakeMl.parseCatalog(noPref.getBytes("UTF-8")).events.head
    assert(ev.latitude.contains(35.5)) // last origin
    assert(ev.magnitude.contains(3.0) && ev.magnitude_type.contains("MW"))
  }

  test("quakeml write → parse is identity on table fields") {
    val cat = QuakeMl.parseCatalog(qml.getBytes("UTF-8"))
    // the writer emits ONE origin, so derived counts only round-trip
    // when it gets the preferred origin's arrivals
    val prefArrivals = cat.arrivals.filter(_.origin_id == "smi:local/or2")
    val rewritten = QuakeMl.toQuakeMl(cat.events.head.copy(path = None),
      cat.picks, prefArrivals)
    val back = QuakeMl.parseCatalog(rewritten.getBytes("UTF-8"))
    assert(back.events.head == cat.events.head.copy(path = None))
    assert(back.picks == cat.picks)
    // arrivals come back attached to the synthetic origin id
    assert(back.arrivals ==
      prefArrivals.map(_.copy(origin_id = "smi:local/ev1/origin")))
  }

  test("quakeml directory scan: distributed parse, permissive skip, conformed schema") {
    val dir = Files.createTempDirectory("qmldir")
    Files.writeString(dir.resolve("a.xml"), qml)
    Files.writeString(dir.resolve("b.xml"),
      qml.replaceAll("smi:local/ev1", "smi:local/ev2"))
    Files.writeString(dir.resolve("broken.xml"), "<q:quakeml><unclosed")
    Files.writeString(dir.resolve("notxml.txt"), "ignored by glob")
    val tables = QuakeMl.readTables(spark, dir.toString)
    val events = tables("events")
    assert(events.schema.fieldNames
      .take(graft.core.Schemas.eventSummary.length).toSeq ==
      graft.core.Schemas.eventSummary.fieldNames.toSeq)
    val ids = events.select("event_id").collect().map(_.getString(0)).sorted
    assert(ids.toSeq == Seq("smi:local/ev1", "smi:local/ev2"))
    assert(tables("picks").where("seed_id = 'UU.TMU.01.HHZ'").count() == 2)
    assert(tables("arrivals").count() == 4 && tables("amplitudes").count() == 2)
  }

  private val sxml =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<FDSNStationXML xmlns="http://www.fdsn.org/xml/station/1" schemaVersion="1.1">
      | <Source>test</Source>
      | <Network code="UU">
      |  <Station code="TMU">
      |   <Latitude>40.1</Latitude><Longitude>-111.5</Longitude>
      |   <Elevation>2000.0</Elevation>
      |   <Channel code="HHZ" locationCode="01"
      |            startDate="2010-01-01T00:00:00Z" endDate="2020-01-01T00:00:00Z">
      |    <Latitude>40.2</Latitude><Longitude>-111.6</Longitude>
      |    <Elevation>2001.0</Elevation><Depth>10.0</Depth>
      |    <Azimuth>0.0</Azimuth><Dip>-90.0</Dip>
      |    <SampleRate>100.0</SampleRate>
      |   </Channel>
      |   <Channel code="HHN" locationCode="">
      |    <SampleRate>100.0</SampleRate>
      |   </Channel>
      |  </Station>
      | </Network>
      |</FDSNStationXML>""".stripMargin

  test("stationxml: channel rows with station-coordinate fallback and open end_date") {
    val rows = StationXml.parseChannels(sxml.getBytes("UTF-8"))
    assert(rows.length == 2)
    val hhz = rows.find(_.channel == "HHZ").get
    assert(hhz.latitude.contains(40.2) && hhz.sample_rate.contains(100.0))
    assert(hhz.start_date.contains(Xml.isoToNs("2010-01-01T00:00:00Z").get))
    val hhn = rows.find(_.channel == "HHN").get
    assert(hhn.latitude.contains(40.1)) // station fallback
    assert(hhn.end_date.isEmpty) // open-ended
  }

  test("stationxml: spark read conforms to stations schema; write round-trips") {
    val dir = Files.createTempDirectory("sxmldir")
    Files.writeString(dir.resolve("inv.xml"), sxml)
    val df = StationXml.readChannels(spark, dir.toString)
    assert(df.schema.fieldNames.take(11).toSeq ==
      graft.core.Schemas.stations.fieldNames.toSeq)
    assert(df.where("seed_id = 'UU.TMU.01.HHZ'").count() == 1)

    val rows = StationXml.parseChannels(sxml.getBytes("UTF-8"))
    val back = StationXml.parseChannels(
      StationXml.toStationXml(rows).getBytes("UTF-8"))
    assert(back.toSet == rows.toSet)
  }
}
