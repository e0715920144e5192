package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Schemas

/** FDSN StationXML reader: Network → Station → Channel hierarchy
  * flattened to the channel-level stations table.
  *
  * The reference reads inventories with `obspy.read_inventory`,
  * recursing directories and skipping unreadable files (obsplus
  * `stations/pd.py:62-76`, `utils/stations.py:433-446`), then flattens
  * to the channel-level schema (`constants.py:45-62`). Open-ended
  * channels (no EndDate) keep a null `end_date`; downstream activity
  * filters substitute the +∞ sentinel (`fetcher.py:525-526`).
  */
object StationXml {

  case class ChannelRow(
      network: String, station: String, location: String, channel: String,
      latitude: Option[Double], longitude: Option[Double],
      elevation: Option[Double], depth: Option[Double],
      azimuth: Option[Double], dip: Option[Double],
      sample_rate: Option[Double],
      start_date: Option[Long], end_date: Option[Long])

  /** Parse one StationXML document into channel rows. Station-level
    * coordinates fill in for channels that omit their own (mirrors
    * obspy's inventory semantics used by `utils/stations.py:98-125`).
    */
  def parseChannels(bytes: Array[Byte]): Seq[ChannelRow] = {
    val root = Xml.parse(bytes) // <FDSNStationXML>
    for {
      net <- root \\ "Network"
      netCode = net.attr("code").getOrElse("")
      sta <- net \\ "Station"
      staCode = sta.attr("code").getOrElse("")
      staLat = sta.doubleAt("Latitude")
      staLon = sta.doubleAt("Longitude")
      staElev = sta.doubleAt("Elevation")
      cha <- sta \\ "Channel"
    } yield ChannelRow(
      network = netCode,
      station = staCode,
      location = cha.attr("locationCode").getOrElse(""),
      channel = cha.attr("code").getOrElse(""),
      latitude = cha.doubleAt("Latitude").orElse(staLat),
      longitude = cha.doubleAt("Longitude").orElse(staLon),
      elevation = cha.doubleAt("Elevation").orElse(staElev),
      depth = cha.doubleAt("Depth"),
      azimuth = cha.doubleAt("Azimuth"),
      dip = cha.doubleAt("Dip"),
      sample_rate = cha.doubleAt("SampleRate"),
      start_date = cha.attr("startDate").flatMap(Xml.isoToNs),
      end_date = cha.attr("endDate").flatMap(Xml.isoToNs))
  }

  /** Channel-level stations DataFrame from a directory of StationXML
    * files; unreadable files warn and skip.
    */
  def readChannels(spark: SparkSession, dir: String, glob: String = "*.xml"): DataFrame = {
    import spark.implicits._
    val rows = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) =>
        try parseChannels(bytes).iterator
        catch {
          case e: Exception =>
            System.err.println(s"[stationxml] skipping unreadable $path: ${e.getMessage}")
            Iterator.empty
        }
      })
    Schemas.conformTo(
      rows.toDF().withColumn("seed_id", concat_ws(".",
        col("network"), col("station"), col("location"), col("channel"))),
      Schemas.stations)
  }

  /** Serialize channel rows to a StationXML document (one Network/
    * Station element per distinct code pair, channels nested).
    */
  def toStationXml(channels: Seq[ChannelRow]): String = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>")
    sb.append("<FDSNStationXML xmlns=\"http://www.fdsn.org/xml/station/1\" schemaVersion=\"1.1\">")
    sb.append("<Source>graft</Source>")
    channels.groupBy(_.network).toSeq.sortBy(_._1).foreach { case (net, netChans) =>
      sb.append(s"""<Network code="${Xml.escape(net)}">""")
      netChans.groupBy(_.station).toSeq.sortBy(_._1).foreach { case (sta, staChans) =>
        sb.append(s"""<Station code="${Xml.escape(sta)}">""")
        staChans.head.latitude.foreach(v => sb.append(s"<Latitude>$v</Latitude>"))
        staChans.head.longitude.foreach(v => sb.append(s"<Longitude>$v</Longitude>"))
        staChans.head.elevation.foreach(v => sb.append(s"<Elevation>$v</Elevation>"))
        staChans.foreach { c =>
          sb.append(s"""<Channel code="${Xml.escape(c.channel)}" locationCode="${Xml.escape(c.location)}"""")
          c.start_date.foreach(t => sb.append(s""" startDate="${Xml.nsToIso(t)}""""))
          c.end_date.foreach(t => sb.append(s""" endDate="${Xml.nsToIso(t)}""""))
          sb.append(">")
          c.latitude.foreach(v => sb.append(s"<Latitude>$v</Latitude>"))
          c.longitude.foreach(v => sb.append(s"<Longitude>$v</Longitude>"))
          c.elevation.foreach(v => sb.append(s"<Elevation>$v</Elevation>"))
          c.depth.foreach(v => sb.append(s"<Depth>$v</Depth>"))
          c.azimuth.foreach(v => sb.append(s"<Azimuth>$v</Azimuth>"))
          c.dip.foreach(v => sb.append(s"<Dip>$v</Dip>"))
          c.sample_rate.foreach(v => sb.append(s"<SampleRate>$v</SampleRate>"))
          sb.append("</Channel>")
        }
        sb.append("</Station>")
      }
      sb.append("</Network>")
    }
    sb.append("</FDSNStationXML>")
    sb.toString
  }
}
