package graft.lake

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BulkHttpSink accounting parity with the reference's
  * `bulk(raise_on_error=False)` + first-10 logging
  * (`src/index_elastic.py:210-216`): per-document success/error split
  * inside a batch, cluster-wide totals, capped error sample, no throw
  * on item failures, transport failure = whole batch errored.
  */
object BulkSinkSpec {
  // a transport that rejects documents whose payload contains "bad"
  // (per-item split — the ES bulk items-array shape); lives on the
  // companion so the shipped closure doesn't capture the suite
  def splittingPost(batch: Seq[String]): BulkHttpSink.BulkResult = {
    val (bad, ok) = batch.partition(_.contains("bad"))
    BulkHttpSink.BulkResult(ok.size, bad.map(d => s"mapper_parsing: $d"))
  }

  def refusingPost(batch: Seq[String]): BulkHttpSink.BulkResult =
    BulkHttpSink.BulkResult(0,
      batch.map(_ => "ConnectException: connection refused"))
}

class BulkSinkSpec extends AnyFunSuite {
  import BulkSinkSpec._
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("partial batch failure: per-doc split, exact totals, no throw") {
    val docs = (0 until 100)
      .map(i => (s"id$i", if (i % 10 == 0) "bad" else "fine"))
      .toDF("icao24", "status").repartition(4)
    val sink = new BulkHttpSink(splittingPost, batchSize = 7)
    sink.upsert(docs, "icao24") // must not throw
    val r = sink.report
    assert(r.indexed == 90L)
    assert(r.errors == 10L)
    assert(r.firstErrors.nonEmpty &&
      r.firstErrors.forall(_.startsWith("mapper_parsing:")))
  }

  test("error sample is capped at maxLoggedErrors") {
    val docs = (0 until 50).map(i => (s"id$i", "bad"))
      .toDF("icao24", "status").repartition(3)
    val sink = new BulkHttpSink(splittingPost, batchSize = 5,
      maxLoggedErrors = 10)
    sink.upsert(docs, "icao24")
    val r = sink.report
    assert(r.indexed == 0L)
    assert(r.errors == 50L)
    assert(r.firstErrors.size == 10)
  }

  test("transport-level failure books the whole batch as errors") {
    val docs = (0 until 20).map(i => (s"id$i", "fine"))
      .toDF("icao24", "status").coalesce(1)
    val sink = new BulkHttpSink(refusingPost, batchSize = 8)
    sink.upsert(docs, "icao24")
    val r = sink.report
    assert(r.indexed == 0L)
    assert(r.errors == 20L)
    assert(r.firstErrors.size == 10)
  }

  test("clean run reports zero errors and an empty sample") {
    val docs = (0 until 30).map(i => (s"id$i", "fine"))
      .toDF("icao24", "status").repartition(2)
    val sink = new BulkHttpSink(splittingPost, batchSize = 4)
    sink.upsert(docs, "icao24")
    val r = sink.report
    assert(r.indexed == 30L)
    assert(r.errors == 0L)
    assert(r.firstErrors.isEmpty)
  }
}
