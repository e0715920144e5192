package graft.core

import org.apache.spark.sql.DataFrame
import graft.bank.EventQuery
import graft.stations.StationQuery

/** FDSN-client-style structural protocols (obsplus
  * `interfaces.py:16-111`): a local bank, an in-memory table, or a
  * remote data-center adapter expose the SAME query surface, so a
  * pipeline written against the trait swaps sources without change —
  * the property obsplus gets from duck-typed `get_events` /
  * `get_waveforms` / `get_stations` protocols.
  */
trait EventClient {
  /** Filtered event summary table (`get_events` kwarg surface). */
  def getEvents(q: EventQuery): DataFrame

  /** The reference aliases `get_event_summary = read_index`
    * (`eventbank.py:530`) — same rows as [[getEvents]].
    */
  def getEventSummary(q: EventQuery): DataFrame = getEvents(q)
}

trait WaveformClient {
  /** Scalar request: one NSLC (glob allowed where the impl supports
    * it) and one [t1, t2] window, stitched and trimmed.
    */
  def getWaveforms(network: String, station: String, location: String,
                   channel: String, t1: Long, t2: Long): DataFrame

  /** Bulk request table (seed_id, t1, t2) — one job for all rows. */
  def getWaveformsBulk(requests: DataFrame): DataFrame
}

trait StationClient {
  /** Channel-level station table filtered by the FDSN kwarg surface. */
  def getStations(q: StationQuery): DataFrame
}
