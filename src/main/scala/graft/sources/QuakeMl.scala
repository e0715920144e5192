package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Schemas

/** QuakeML 1.2 reader/writer on the JDK StAX parser.
  *
  * The reference scans directories of QuakeML files with
  * `obspy.read_events` (obsplus `eventbank.py:392-418`, permissive
  * skip via `try_read_catalog`, `utils/misc.py:170-180`) and flattens
  * the object tree into fixed-schema tables (events, picks,
  * magnitudes, amplitudes, arrivals — `events/pd.py:495-539`,
  * `constants.py:81-291`). Here the same extraction is a Spark job:
  * `binaryFile` scan → per-partition StAX parse → typed Datasets
  * conformed to [[graft.core.Schemas]].
  *
  * Preferred-origin/magnitude resolution follows the reference's
  * fallback chain (`utils/events.py:425-480`): the element whose
  * publicID matches `preferredOriginID`/`preferredMagnitudeID`, else
  * the last one in document order.
  */
object QuakeMl {

  case class EventRow(
      event_id: String, time: Option[Long], latitude: Option[Double],
      longitude: Option[Double], depth: Option[Double],
      magnitude: Option[Double], magnitude_type: Option[String],
      local_magnitude: Option[Double] = None,
      moment_magnitude: Option[Double] = None,
      duration_magnitude: Option[Double] = None,
      event_description: Option[String] = None,
      associated_phase_count: Option[Long] = None,
      azimuthal_gap: Option[Double] = None,
      horizontal_uncertainty: Option[Double] = None,
      vertical_uncertainty: Option[Double] = None,
      p_phase_count: Option[Long] = None,
      s_phase_count: Option[Long] = None,
      p_pick_count: Option[Long] = None,
      s_pick_count: Option[Long] = None,
      standard_error: Option[Double] = None,
      used_phase_count: Option[Long] = None,
      station_count: Option[Long] = None,
      creation_time: Option[Long] = None,
      version: Option[String] = None,
      updated: Option[Long] = None, author: Option[String] = None,
      agency_id: Option[String] = None, path: Option[String] = None)

  case class PickRow(
      resource_id: String, event_id: String, time: Option[Long],
      network: Option[String], station: Option[String],
      location: Option[String], channel: Option[String],
      phase_hint: Option[String], onset: Option[String],
      polarity: Option[String], evaluation_status: Option[String])

  case class MagnitudeRow(
      resource_id: String, event_id: String, magnitude: Option[Double],
      magnitude_type: Option[String], origin_id: Option[String],
      station_count: Option[Long], azimuthal_gap: Option[Double])

  case class AmplitudeRow(
      resource_id: String, event_id: String,
      generic_amplitude: Option[Double], amplitude_type: Option[String],
      unit: Option[String], period: Option[Double], snr: Option[Double],
      pick_id: Option[String])

  case class ArrivalRow(
      resource_id: String, event_id: String, origin_id: String,
      pick_id: Option[String], phase: Option[String],
      azimuth: Option[Double], distance: Option[Double],
      time_residual: Option[Double], time_weight: Option[Double])

  case class StationMagnitudeRow(
      resource_id: String, event_id: String, magnitude: Option[Double],
      station_magnitude_type: Option[String], origin_id: Option[String],
      amplitude_id: Option[String],
      network: Option[String], station: Option[String],
      location: Option[String], channel: Option[String])

  case class Catalog(
      events: Seq[EventRow], picks: Seq[PickRow],
      magnitudes: Seq[MagnitudeRow], amplitudes: Seq[AmplitudeRow],
      arrivals: Seq[ArrivalRow], stationMagnitudes: Seq[StationMagnitudeRow])

  // ---------------------------------------------------------------- parse

  /** Parse one QuakeML document into flat rows. Throws on malformed
    * XML; directory readers catch per-file (reference semantics: warn
    * and skip, `utils/misc.py:170-180`).
    */
  def parseCatalog(bytes: Array[Byte], path: Option[String] = None): Catalog = {
    val root = Xml.parse(bytes) // <quakeml>
    val eventParams = (root \ "eventParameters").getOrElse(
      throw new IllegalArgumentException("not a QuakeML document: no eventParameters"))

    val events = Vector.newBuilder[EventRow]
    val picks = Vector.newBuilder[PickRow]
    val mags = Vector.newBuilder[MagnitudeRow]
    val amps = Vector.newBuilder[AmplitudeRow]
    val arrs = Vector.newBuilder[ArrivalRow]
    val smags = Vector.newBuilder[StationMagnitudeRow]

    (eventParams \\ "event").foreach { ev =>
      val eventId = ev.attr("publicID").getOrElse("")
      val origins = ev \\ "origin"
      val magnitudes = ev \\ "magnitude"

      def preferred(items: Vector[XNode], prefTag: String): Option[XNode] = {
        val prefId = ev.textAt(prefTag)
        prefId.flatMap(id => items.find(_.attr("publicID").contains(id)))
          .orElse(items.lastOption)
      }
      val prefOrigin = preferred(origins, "preferredOriginID")
      val prefMag = preferred(magnitudes, "preferredMagnitudeID")

      // origin-quality extraction (events/pd.py:74-165). The reference
      // coerces falsy quality values through Python `or`: a 0 / missing
      // count falls back to the derived default, a 0.0 gap/error to NaN.
      val pickNodes = ev \\ "pick"
      val prefArrivals = prefOrigin.map(_ \\ "arrival").getOrElse(Vector.empty)
      val quality = prefOrigin.flatMap(_ \ "quality")
      def qualDouble(t: String): Option[Double] =
        quality.flatMap(_.doubleAt(t)).filter(_ != 0.0)
      def qualLong(t: String): Option[Long] =
        quality.flatMap(_.textAt(t))
          .flatMap(s => scala.util.Try(s.toDouble.toLong).toOption)
          .filter(_ != 0L)
      // phase counts: arrivals of the preferred origin whose phase is
      // exactly "P"/"S" (events/pd.py:103-111)
      val pPhase = prefArrivals.count(_.textAt("phase").contains("P")).toLong
      val sPhase = prefArrivals.count(_.textAt("phase").contains("S")).toLong
      // pick counts: ALL event picks with that hint, rejected excluded
      // (events/pd.py:93-101)
      def pickCount(ph: String): Long = pickNodes.count(p =>
        p.textAt("phaseHint").contains(ph) &&
          !p.textAt("evaluationStatus").contains("rejected")).toLong
      // stations used by the preferred origin = distinct station codes
      // of picks its arrivals reference (events/pd.py:137-153)
      val arrivalPickIds = prefArrivals.flatMap(_.textAt("pickID")).toSet
      val usedStations = pickNodes
        .filter(p => p.attr("publicID").exists(arrivalPickIds))
        .flatMap(p => (p \ "waveformID").flatMap(_.attr("stationCode")))
        .distinct

      val creation = ev \ "creationInfo"
      // updated = newest creationTime ANYWHERE in the event tree
      // (events/pd.py:218-224: max over all CreationInfo, missing → 0)
      val allCreations = ev.descendants("creationInfo")
      events += EventRow(
        event_id = eventId,
        time = prefOrigin.flatMap(_.textAt("time", "value")).flatMap(Xml.isoToNs),
        latitude = prefOrigin.flatMap(_.doubleAt("latitude", "value")),
        longitude = prefOrigin.flatMap(_.doubleAt("longitude", "value")),
        depth = prefOrigin.flatMap(_.doubleAt("depth", "value")),
        magnitude = prefMag.flatMap(_.doubleAt("mag", "value")),
        magnitude_type = prefMag.flatMap(_.textAt("type")),
        // latest magnitude per type = LAST list element of that type
        // (events/pd.py:166-175; type match case-insensitive like the
        // reference's upper-cased compare)
        local_magnitude = magnitudes.filter(_.textAt("type")
          .exists(_.equalsIgnoreCase("ML"))).lastOption
          .flatMap(_.doubleAt("mag", "value")),
        moment_magnitude = magnitudes.filter(_.textAt("type")
          .exists(_.equalsIgnoreCase("MW"))).lastOption
          .flatMap(_.doubleAt("mag", "value")),
        duration_magnitude = magnitudes.filter(_.textAt("type")
          .exists(_.equalsIgnoreCase("MD"))).lastOption
          .flatMap(_.doubleAt("mag", "value")),
        event_description = (ev \ "description").flatMap(_.textAt("text")),
        associated_phase_count = Some(qualLong("associatedPhaseCount").getOrElse(0L)),
        azimuthal_gap = qualDouble("azimuthalGap"),
        horizontal_uncertainty = prefOrigin.flatMap(_ \ "originUncertainty")
          .flatMap(_.doubleAt("horizontalUncertainty")).filter(_ != 0.0),
        vertical_uncertainty = prefOrigin.flatMap(_.doubleAt("depth", "uncertainty")),
        p_phase_count = Some(pPhase),
        s_phase_count = Some(sPhase),
        p_pick_count = Some(pickCount("P")),
        s_pick_count = Some(pickCount("S")),
        standard_error = qualDouble("standardError"),
        used_phase_count = Some(qualLong("usedPhaseCount").getOrElse(pPhase + sPhase)),
        station_count = Some(usedStations.size.toLong),
        creation_time = creation.flatMap(_.textAt("creationTime")).flatMap(Xml.isoToNs),
        version = creation.flatMap(_.textAt("version")),
        updated =
          if (allCreations.isEmpty) None
          else Some(allCreations.map(
            _.textAt("creationTime").flatMap(Xml.isoToNs).getOrElse(0L)).max),
        author = creation.flatMap(_.textAt("author")),
        agency_id = creation.flatMap(_.textAt("agencyID")),
        path = path)

      (ev \\ "pick").foreach { p =>
        val wid = p \ "waveformID"
        picks += PickRow(
          resource_id = p.attr("publicID").getOrElse(""),
          event_id = eventId,
          time = p.textAt("time", "value").flatMap(Xml.isoToNs),
          network = wid.flatMap(_.attr("networkCode")),
          station = wid.flatMap(_.attr("stationCode")),
          location = wid.flatMap(_.attr("locationCode")),
          channel = wid.flatMap(_.attr("channelCode")),
          phase_hint = p.textAt("phaseHint"),
          onset = p.textAt("onset"),
          polarity = p.textAt("polarity"),
          evaluation_status = p.textAt("evaluationStatus"))
      }

      magnitudes.foreach { m =>
        mags += MagnitudeRow(
          resource_id = m.attr("publicID").getOrElse(""),
          event_id = eventId,
          magnitude = m.doubleAt("mag", "value"),
          magnitude_type = m.textAt("type"),
          origin_id = m.textAt("originID"),
          station_count = m.textAt("stationCount").flatMap(s =>
            scala.util.Try(s.toLong).toOption),
          azimuthal_gap = m.doubleAt("azimuthalGap"))
      }

      (ev \\ "amplitude").foreach { a =>
        amps += AmplitudeRow(
          resource_id = a.attr("publicID").getOrElse(""),
          event_id = eventId,
          generic_amplitude = a.doubleAt("genericAmplitude", "value"),
          amplitude_type = a.textAt("type"),
          unit = a.textAt("unit"),
          period = a.doubleAt("period", "value"),
          snr = a.doubleAt("snr"),
          pick_id = a.textAt("pickID"))
      }

      (ev \\ "stationMagnitude").foreach { sm =>
        val wid = sm \ "waveformID"
        smags += StationMagnitudeRow(
          resource_id = sm.attr("publicID").getOrElse(""),
          event_id = eventId,
          magnitude = sm.doubleAt("mag", "value"),
          station_magnitude_type = sm.textAt("type"),
          origin_id = sm.textAt("originID"),
          amplitude_id = sm.textAt("amplitudeID"),
          network = wid.flatMap(_.attr("networkCode")),
          station = wid.flatMap(_.attr("stationCode")),
          location = wid.flatMap(_.attr("locationCode")),
          channel = wid.flatMap(_.attr("channelCode")))
      }

      // arrivals nest inside origins (QuakeML schema; reference table
      // carries the origin link, constants.py:264-291)
      origins.foreach { o =>
        val originId = o.attr("publicID").getOrElse("")
        (o \\ "arrival").foreach { a =>
          arrs += ArrivalRow(
            resource_id = a.attr("publicID").getOrElse(""),
            event_id = eventId,
            origin_id = originId,
            pick_id = a.textAt("pickID"),
            phase = a.textAt("phase"),
            azimuth = a.doubleAt("azimuth"),
            distance = a.doubleAt("distance"),
            time_residual = a.doubleAt("timeResidual"),
            time_weight = a.textAt("timeWeight").orElse(a.textAt("weight"))
              .flatMap(s => scala.util.Try(s.toDouble).toOption))
        }
      }
    }
    Catalog(events.result(), picks.result(), mags.result(), amps.result(),
      arrs.result(), smags.result())
  }

  // ---------------------------------------------------------------- write

  private def tag(name: String, value: String): String =
    s"<$name>${Xml.escape(value)}</$name>"
  private def valueTag(name: String, value: String): String =
    s"<$name><value>${Xml.escape(value)}</value></$name>"

  /** Serialize one event (with its picks) back to a QuakeML document —
    * the write half of the reference's `put_events` file format
    * (obsplus `eventbank.py:440-528`). Lossless for the fields the
    * tables carry: ns times survive via 9-digit ISO fractions, doubles
    * via `Double.toString` round-tripping.
    */
  def toQuakeMl(event: EventRow, picks: Seq[PickRow] = Nil,
                arrivals: Seq[ArrivalRow] = Nil): String = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>")
    sb.append("<q:quakeml xmlns:q=\"http://quakeml.org/xmlns/quakeml/1.2\" ")
    sb.append("xmlns=\"http://quakeml.org/xmlns/bed/1.2\">")
    sb.append("<eventParameters publicID=\"smi:local/catalog\">")
    sb.append(s"""<event publicID="${Xml.escape(event.event_id)}">""")
    val originId = s"${event.event_id}/origin"
    val magId = s"${event.event_id}/magnitude"
    sb.append(tag("preferredOriginID", originId))
    sb.append(tag("preferredMagnitudeID", magId))
    event.event_description.foreach(d =>
      sb.append(s"<description>${tag("text", d)}</description>"))
    sb.append(s"""<origin publicID="${Xml.escape(originId)}">""")
    event.time.foreach(t => sb.append(valueTag("time", Xml.nsToIso(t))))
    event.latitude.foreach(v => sb.append(valueTag("latitude", v.toString)))
    event.longitude.foreach(v => sb.append(valueTag("longitude", v.toString)))
    if (event.depth.isDefined || event.vertical_uncertainty.isDefined) {
      sb.append("<depth>")
      event.depth.foreach(v => sb.append(tag("value", v.toString)))
      event.vertical_uncertainty.foreach(v =>
        sb.append(tag("uncertainty", v.toString)))
      sb.append("</depth>")
    }
    // all arrivals serialize into this (single) origin; a reparse
    // therefore reads them back with origin_id = the synthetic id
    arrivals.foreach { a =>
      sb.append(s"""<arrival publicID="${Xml.escape(a.resource_id)}">""")
      a.pick_id.foreach(v => sb.append(tag("pickID", v)))
      a.phase.foreach(v => sb.append(tag("phase", v)))
      a.azimuth.foreach(v => sb.append(tag("azimuth", v.toString)))
      a.distance.foreach(v => sb.append(tag("distance", v.toString)))
      a.time_residual.foreach(v => sb.append(tag("timeResidual", v.toString)))
      a.time_weight.foreach(v => sb.append(tag("timeWeight", v.toString)))
      sb.append("</arrival>")
    }
    val qualityTags = List(
      event.associated_phase_count.map(v => tag("associatedPhaseCount", v.toString)),
      event.used_phase_count.map(v => tag("usedPhaseCount", v.toString)),
      event.standard_error.map(v => tag("standardError", v.toString)),
      event.azimuthal_gap.map(v => tag("azimuthalGap", v.toString))).flatten
    if (qualityTags.nonEmpty)
      sb.append(qualityTags.mkString("<quality>", "", "</quality>"))
    event.horizontal_uncertainty.foreach(h => sb.append(
      s"<originUncertainty>${tag("horizontalUncertainty", h.toString)}</originUncertainty>"))
    // `updated` (tree-max creation time) rides the origin's creationInfo
    // so it round-trips independently of the event-level creation_time
    event.updated.foreach(t => sb.append(
      s"<creationInfo>${tag("creationTime", Xml.nsToIso(t))}</creationInfo>"))
    sb.append("</origin>")
    if (event.magnitude.isDefined || event.magnitude_type.isDefined) {
      sb.append(s"""<magnitude publicID="${Xml.escape(magId)}">""")
      event.magnitude.foreach(v => sb.append(valueTag("mag", v.toString)))
      event.magnitude_type.foreach(t => sb.append(tag("type", t)))
      sb.append(tag("originID", originId))
      sb.append("</magnitude>")
    }
    // per-type magnitudes AFTER the preferred element: the read side
    // takes the LAST element of each type (events/pd.py:166-175), so
    // this ordering round-trips ML/MW/MD even when the preferred
    // magnitude shares a type with one of them
    Seq("ML" -> event.local_magnitude, "MW" -> event.moment_magnitude,
        "MD" -> event.duration_magnitude).foreach { case (t, vOpt) =>
      vOpt.foreach { v =>
        sb.append(s"""<magnitude publicID="${Xml.escape(magId)}/$t">""")
        sb.append(valueTag("mag", v.toString))
        sb.append(tag("type", t))
        sb.append("</magnitude>")
      }
    }
    picks.foreach { p =>
      sb.append(s"""<pick publicID="${Xml.escape(p.resource_id)}">""")
      p.time.foreach(t => sb.append(valueTag("time", Xml.nsToIso(t))))
      sb.append(s"""<waveformID networkCode="${Xml.escape(p.network.getOrElse(""))}" """)
      sb.append(s"""stationCode="${Xml.escape(p.station.getOrElse(""))}" """)
      sb.append(s"""locationCode="${Xml.escape(p.location.getOrElse(""))}" """)
      sb.append(s"""channelCode="${Xml.escape(p.channel.getOrElse(""))}"/>""")
      p.phase_hint.foreach(v => sb.append(tag("phaseHint", v)))
      p.onset.foreach(v => sb.append(tag("onset", v)))
      p.polarity.foreach(v => sb.append(tag("polarity", v)))
      p.evaluation_status.foreach(v => sb.append(tag("evaluationStatus", v)))
      sb.append("</pick>")
    }
    if (event.creation_time.isDefined || event.author.isDefined ||
        event.agency_id.isDefined || event.version.isDefined) {
      sb.append("<creationInfo>")
      event.agency_id.foreach(v => sb.append(tag("agencyID", v)))
      event.author.foreach(v => sb.append(tag("author", v)))
      event.creation_time.foreach(t => sb.append(tag("creationTime", Xml.nsToIso(t))))
      event.version.foreach(v => sb.append(tag("version", v)))
      sb.append("</creationInfo>")
    }
    sb.append("</event></eventParameters></q:quakeml>")
    sb.toString
  }

  // ---------------------------------------------------------------- spark

  /** All five tables from a directory of QuakeML files. One
    * distributed `binaryFile` scan; malformed files are skipped with a
    * stderr warning (reference: `try_read_catalog` warn+skip). The
    * parse runs once per file and fans out to five cached DataFrames.
    */
  def readTables(spark: SparkSession, dir: String, glob: String = "*.xml")
      : Map[String, DataFrame] = {
    import spark.implicits._
    val catalogs = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) =>
        try Iterator(parseCatalog(bytes, Some(path)))
        catch {
          case e: Exception =>
            System.err.println(s"[quakeml] skipping unreadable $path: ${e.getMessage}")
            Iterator.empty
        }
      })
      .cache()
    Map(
      "events" -> Schemas.conformTo(
        catalogs.flatMap(_.events).toDF(), Schemas.eventSummary),
      "picks" -> conformPicks(spark, catalogs.flatMap(_.picks).toDF()),
      "magnitudes" -> Schemas.conformTo(
        catalogs.flatMap(_.magnitudes).toDF(), Schemas.magnitudes),
      "amplitudes" -> Schemas.conformTo(
        catalogs.flatMap(_.amplitudes).toDF(), Schemas.amplitudes),
      "arrivals" -> Schemas.conformTo(
        catalogs.flatMap(_.arrivals).toDF(), Schemas.arrivals),
      "station_magnitudes" -> {
        import org.apache.spark.sql.functions.{col, concat_ws}
        val norm = Seq("network", "station", "location", "channel")
          .foldLeft(catalogs.flatMap(_.stationMagnitudes).toDF())(
            (d, c) => d.withColumn(c, Schemas.nslcNormalize(col(c))))
        Schemas.conformTo(
          norm.withColumn("seed_id", concat_ws(".", col("network"),
            col("station"), col("location"), col("channel"))),
          Schemas.stationMagnitudes)
      })
  }

  /** Event-summary table only (the EventBank index shape). */
  def readEvents(spark: SparkSession, dir: String, glob: String = "*.xml"): DataFrame =
    readTables(spark, dir, glob)("events")

  private def conformPicks(spark: SparkSession, df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    // normalize nullish codes to "" BEFORE building seed_id: a None
    // code exports as an empty attribute and parses back as Some(""),
    // and concat_ws skips NULL but keeps "" — without the normalize,
    // the same pick gets a different seed_id shape across an
    // export→reindex round trip (reference normalizes at ingest,
    // `utils/misc.py:325-376`, `wavebank.py:773-774`)
    val norm = Seq("network", "station", "location", "channel")
      .foldLeft(df)((d, c) => d.withColumn(c, Schemas.nslcNormalize(col(c))))
    // seed_id = network.station.location.channel (constants.py:326)
    Schemas.conformTo(
      norm.withColumn("seed_id", concat_ws(".",
        col("network"), col("station"), col("location"), col("channel"))),
      Schemas.picks)
  }
}
