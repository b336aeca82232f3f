package graft.ingest

import java.time.LocalDate
import java.time.temporal.ChronoUnit

/** Pure contract logic of the three external-system connectors (SURVEY.md
  * §2.1 S15–S17). The network/API surface stays outside the engine — jobs
  * run at Google / NASA in the reference too — but every DECISION those
  * connectors make is deterministic and portable, so it lives here where
  * it can be unit-tested: granule-count gates, the export-task poll
  * lifecycle with capped exponential backoff, and the Harmony async-job
  * state machine with its OGC subsetting request builder. Effects (poll,
  * sleep, cancel, fetch) are injected as functions; production shells bind
  * them to real clients, specs bind them to scripted sequences.
  *
  * ref: src/pm25ml/collectors/ned/data_retriever_raw.py:27-105,
  *      src/pm25ml/collectors/gee/gee_export_pipeline.py:112-132,
  *      src/pm25ml/collectors/ned/data_retriever_harmony.py:80-333.
  */
object Connectors {

  /** Metadata identifying, subsetting and regridding one NED dataset
    * (ref: ned/dataset_descriptor.py:17-71). Bounds are (W, S, E, N).
    */
  final case class NedDatasetDescriptor(
      datasetName: String,
      datasetVersion: String,
      startDate: LocalDate,
      endDate: LocalDate,
      filterBounds: (Double, Double, Double, Double),
      variableMapping: Map[String, String],
      interpolationMethod: String = "linear",
      level: Option[Int] = None) {
    require(interpolationMethod == "linear" || interpolationMethod == "nearest",
      s"unsupported interpolation method $interpolationMethod")

    /** Days in [start, end], inclusive (ref :49-51). */
    def daysInRange: Int =
      (ChronoUnit.DAYS.between(startDate, endDate) + 1).toInt
  }

  /** Gate outcome: rejected with a hard error, or accepted, possibly with
    * a warning the caller should surface.
    */
  final case class GateWarning(message: String)

  /** The daily-granule count gate both retrievers apply after search
    * (ref: data_retriever_raw.py:66-105, data_retriever_harmony.py:271-309):
    * zero granules is missing data; more than one per day indicates a
    * duplicated dataset; one short of the day count is tolerated (granule
    * availability lags a day at the boundary) but two short is not.
    */
  def checkExpectedGranules(found: Int,
                            d: NedDatasetDescriptor): Either[String, Option[GateWarning]] = {
    val days = d.daysInRange
    if (found == 0)
      Left(s"No granules found for dataset ${d.datasetName}.")
    else if (found > days)
      Left(s"Found $found granules for dataset ${d.datasetName}, but expected " +
        s"only $days. This may indicate an issue with the dataset.")
    else if (found < days - 1)
      Left(s"We require ${days - 1} or $days (for $days days) granules for " +
        s"dataset ${d.datasetName}, but found $found.")
    else if (found != days)
      Right(Some(GateWarning(
        s"Expected $days granules for dataset ${d.datasetName}, but found $found.")))
    else Right(None)
  }

  /** Collection search must resolve to exactly one dataset before a
    * subsetting job can target it (ref: data_retriever_harmony.py:203-216).
    */
  def checkExpectedDataset(count: Int, datasetName: String): Either[String, Unit] =
    if (count == 0) Left(s"No datasets found for $datasetName.")
    else if (count > 1)
      Left(s"Multiple datasets found for $datasetName. " +
        "Please specify a more precise dataset name.")
    else Right(())

  /** Poll delays for a running export task: 1.0 s growing ×1.5, capped at
    * 10 s (ref: gee_export_pipeline.py:115-123). Infinite — the consumer
    * stops when the task stops.
    */
  def backoffDelays(initial: Double = 1.0, growth: Double = 1.5,
                    max: Double = 10.0): Iterator[Double] =
    Iterator.iterate(initial)(d => math.min(max, d * growth))

  /** Terminal status of an export task as the lifecycle sees it. */
  final case class TaskStatus(state: String, errorMessage: Option[String])

  /** Drive one export task to completion (ref: gee_export_pipeline.py:112-132):
    * poll `active` with backoff sleeps until the task stops, then require a
    * COMPLETED terminal state; `cancel` ALWAYS runs (also on success and on
    * thrown poll errors — a completed task ignores it, a wedged one is
    * reaped) and its own failures are swallowed.
    */
  def completeTask(taskName: String,
                   active: () => Boolean,
                   status: () => TaskStatus,
                   sleep: Double => Unit,
                   cancel: () => Unit): Either[String, Unit] =
    try {
      val delays = backoffDelays()
      while (active()) sleep(delays.next())
      val st = status()
      if (st.state == "COMPLETED") Right(())
      else Left(s"Task $taskName failed: " +
        st.errorMessage.getOrElse("No error message"))
    } finally {
      try cancel() catch { case _: Exception => () }
    }

  /** One result link from a Harmony job status document. Links without an
    * explicit `rel` count as data links (ref: data_retriever_harmony.py:171).
    */
  final case class JobLink(href: String, rel: String = "data")

  /** Harmony async-job status snapshot. */
  final case class JobStatus(status: String, progress: Int, links: Seq[JobLink])

  val JobCompletePercentage = 100

  /** ref: data_retriever_harmony.py:318-324 */
  def isJobRunning(s: JobStatus): Boolean =
    s.status == "running" && s.progress < JobCompletePercentage

  /** ref: data_retriever_harmony.py:327-333 */
  def hasJobSucceeded(s: JobStatus): Boolean =
    s.status == "successful" && s.progress == JobCompletePercentage

  /** Await a Harmony job's download links (ref: data_retriever_harmony.py:157-178):
    * refetch while running (fixed 10 s cadence in the reference — the
    * injected `sleep` decides), then return only the `rel="data"` links of
    * a succeeded job; any other terminal state is an error. Note a job
    * that stops running without reaching `successful`@100 — e.g.
    * `canceled`, or `running_with_errors` stuck at a partial progress with
    * a non-running status — fails even if links are present.
    */
  def awaitDownloadLinks(jobId: String,
                         fetch: () => JobStatus,
                         sleep: () => Unit): Either[String, Seq[JobLink]] = {
    var st = fetch()
    while (isJobRunning(st)) { sleep(); st = fetch() }
    if (hasJobSucceeded(st)) Right(st.links.filter(_.rel == "data"))
    else Left(s"Job $jobId failed with status: ${st.status}. " +
      "Please check the Harmony Subsetter API for more details.")
  }

  /** Every link a job hands back must carry an href
    * (ref: data_retriever_harmony.py:150-155).
    */
  def requireHrefs(links: Seq[JobLink]): Either[String, Seq[String]] = {
    val missing = links.filter(_.href.isEmpty)
    if (missing.nonEmpty) Left(s"Link details missing 'href': ${missing.head}")
    else Right(links.map(_.href))
  }

  val HarmonyRoot = "https://harmony.earthdata.nasa.gov"
  val OgcApiCoveragesVersion = "1.0.0"

  /** Build the OGC coverages subsetting request for one collection
    * (ref: data_retriever_harmony.py:218-259): bbox + time subsets (end
    * date extended to 23:59:59), netCDF-4 output, at most 31 results, and
    * the API's one-variable-per-request restriction enforced here.
    */
  def buildSubsettingUrl(collectionId: String,
                         d: NedDatasetDescriptor): Either[String, String] = {
    if (d.variableMapping.size != 1)
      return Left("Harmony Subsetter API only supports one variable for " +
        s"retrieval. Provided variables: ${d.variableMapping.keys.mkString(", ")}")
    val (west, south, east, north) = d.filterBounds
    val variable = d.variableMapping.keys.head
    val start = s"${d.startDate}T00:00:00Z"
    val end = s"${d.endDate}T23:59:59Z"
    val path = s"/$collectionId/ogc-api-coverages/$OgcApiCoveragesVersion" +
      "/collections/parameter_vars/coverage/rangeset"
    def enc(s: String) =
      java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")
    val params = Seq(
      "format" -> "application/x-netcdf4",
      "variable" -> variable,
      "subset" -> s"lon($west:$east)",
      "subset" -> s"lat($south:$north)",
      "subset" -> s"""time("$start":"$end")""",
      "maxResults" -> "31")
    val qs = params.map { case (k, v) => s"$k=${enc(v)}" }.mkString("&")
    Right(s"$HarmonyRoot$path?$qs")
  }
}
