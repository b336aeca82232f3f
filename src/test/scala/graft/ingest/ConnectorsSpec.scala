package graft.ingest

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Connectors._

class ConnectorsSpec extends AnyFunSuite {

  private def desc(start: String = "2023-07-01", end: String = "2023-07-31",
                   vars: Map[String, String] = Map("AOD" -> "aod")) =
    NedDatasetDescriptor("M2T1NXAER", "5.12.4",
      LocalDate.parse(start), LocalDate.parse(end),
      (68.0, 6.0, 98.0, 36.0), vars)

  test("daysInRange is inclusive of both endpoints") {
    assert(desc().daysInRange === 31)
    assert(desc(end = "2023-07-01").daysInRange === 1)
  }

  test("granule gate: zero granules is a hard error") {
    assert(checkExpectedGranules(0, desc()).isLeft)
  }

  test("granule gate: more granules than days is a hard error") {
    assert(checkExpectedGranules(32, desc()).isLeft)
  }

  test("granule gate: exactly days passes clean; one short warns; two short fails") {
    assert(checkExpectedGranules(31, desc()) === Right(None))
    val warned = checkExpectedGranules(30, desc())
    assert(warned.isRight && warned.toOption.get.nonEmpty)
    assert(checkExpectedGranules(29, desc()).isLeft)
  }

  test("granule gate: single-day range accepts 1 granule only") {
    val d = desc(end = "2023-07-01")
    assert(checkExpectedGranules(1, d) === Right(None))
    assert(checkExpectedGranules(2, d).isLeft)
    assert(checkExpectedGranules(0, d).isLeft)
  }

  test("dataset gate requires exactly one match") {
    assert(checkExpectedDataset(1, "x") === Right(()))
    assert(checkExpectedDataset(0, "x").isLeft)
    assert(checkExpectedDataset(2, "x").isLeft)
  }

  test("backoff grows 1.5x from 1s and caps at 10s") {
    val ds = backoffDelays().take(8).toSeq
    assert(ds.take(4) === Seq(1.0, 1.5, 2.25, 3.375))
    assert(ds.last === 10.0)
    assert(ds.sliding(2).forall { case Seq(a, b) => b >= a })
  }

  test("completeTask polls with backoff, succeeds on COMPLETED, always cancels") {
    var polls = 0
    val slept = scala.collection.mutable.Buffer.empty[Double]
    var cancelled = false
    val r = completeTask("t1",
      active = () => { polls += 1; polls <= 3 },
      status = () => TaskStatus("COMPLETED", None),
      sleep = slept += _,
      cancel = () => cancelled = true)
    assert(r === Right(()))
    assert(slept.toSeq === Seq(1.0, 1.5, 2.25))
    assert(cancelled)
  }

  test("completeTask surfaces the task error and swallows cancel failures") {
    val r = completeTask("t2",
      active = () => false,
      status = () => TaskStatus("FAILED", Some("quota exceeded")),
      sleep = _ => (),
      cancel = () => throw new IllegalStateException("already done"))
    assert(r === Left("Task t2 failed: quota exceeded"))
    val noMsg = completeTask("t3", () => false,
      () => TaskStatus("CANCELLED", None), _ => (), () => ())
    assert(noMsg === Left("Task t3 failed: No error message"))
  }

  test("completeTask cancels even when polling throws") {
    var cancelled = false
    intercept[RuntimeException] {
      completeTask("t4", () => throw new RuntimeException("api down"),
        () => TaskStatus("COMPLETED", None), _ => (), () => cancelled = true)
    }
    assert(cancelled)
  }

  test("harmony job predicates: running needs status AND progress") {
    assert(isJobRunning(JobStatus("running", 40, Nil)))
    assert(!isJobRunning(JobStatus("running", 100, Nil)))
    assert(!isJobRunning(JobStatus("paused", 40, Nil)))
    assert(hasJobSucceeded(JobStatus("successful", 100, Nil)))
    assert(!hasJobSucceeded(JobStatus("successful", 99, Nil)))
    assert(!hasJobSucceeded(JobStatus("failed", 100, Nil)))
  }

  test("awaitDownloadLinks polls to success and keeps only data links") {
    val statuses = Iterator(
      JobStatus("running", 10, Nil),
      JobStatus("running", 60, Nil),
      JobStatus("successful", 100, Seq(
        JobLink("https://h/a.nc4"),
        JobLink("https://h/self", rel = "self"),
        JobLink("https://h/b.nc4", rel = "data"))))
    var sleeps = 0
    val r = awaitDownloadLinks("j1", () => statuses.next(), () => sleeps += 1)
    assert(r === Right(Seq(JobLink("https://h/a.nc4"), JobLink("https://h/b.nc4"))))
    assert(sleeps === 2)
  }

  test("awaitDownloadLinks fails on a non-successful terminal state") {
    val r = awaitDownloadLinks("j2",
      () => JobStatus("canceled", 55, Seq(JobLink("x"))), () => ())
    assert(r.isLeft)
    assert(r.swap.toOption.get.contains("canceled"))
  }

  test("requireHrefs rejects empty hrefs") {
    assert(requireHrefs(Seq(JobLink("a"), JobLink("b"))) === Right(Seq("a", "b")))
    assert(requireHrefs(Seq(JobLink("a"), JobLink(""))).isLeft)
  }

  test("subsetting URL carries bbox, end-of-day time window, and caps results") {
    val Right(url) = buildSubsettingUrl("C123-GES_DISC", desc()): @unchecked
    assert(url.startsWith(HarmonyRoot +
      "/C123-GES_DISC/ogc-api-coverages/1.0.0" +
      "/collections/parameter_vars/coverage/rangeset?"))
    assert(url.contains("format=application%2Fx-netcdf4"))
    assert(url.contains("variable=AOD"))
    assert(url.contains("subset=lon%2868.0%3A98.0%29"))
    assert(url.contains("subset=lat%286.0%3A36.0%29"))
    assert(url.contains("2023-07-31T23%3A59%3A59Z"))
    assert(url.contains("2023-07-01T00%3A00%3A00Z"))
    assert(url.contains("maxResults=31"))
  }

  test("subsetting URL enforces the single-variable restriction") {
    val r = buildSubsettingUrl("C1", desc(vars = Map("a" -> "x", "b" -> "y")))
    assert(r.isLeft)
    assert(r.swap.toOption.get.contains("one variable"))
  }

  test("descriptor rejects unknown interpolation methods") {
    intercept[IllegalArgumentException] {
      desc().copy(interpolationMethod = "cubic")
    }
  }
}
