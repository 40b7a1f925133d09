package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Constraint suite: violation counts, null semantics, single-pass shape. */
class DataQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import DataQuality._

  private lazy val df = Seq(
    (Some(1L), Some(10.0), "F"),
    (Some(2L), Some(-5.0), "O"),   // range violation
    (None, Some(20.0), "X"),       // null key + domain violation
    (Some(2L), None, "F")          // duplicate key; null value not a range violation
  ).toDF("k", "v", "status")

  test("counts violations per rule with documented null semantics") {
    val got = check(df, Seq(
      NotNull("k"), Unique("k"), InRange("v", 0.0, 100.0),
      IsIn("status", Seq("F", "O", "P"))))
      .as[(String, String, Double, Boolean)].collect().toSet
    assert(got == Set(
      ("k", "not_null", 1.0, false),
      ("k", "unique", 2.0, false),   // 4 rows - 2 distinct non-null values
      ("v", "in_range", 1.0, false), // null v is NOT a range violation
      ("status", "is_in", 1.0, false)))
  }

  test("a clean table passes every rule") {
    val clean = Seq((1L, 1.0, "F"), (2L, 2.0, "O")).toDF("k", "v", "status")
    val got = check(clean, Seq(NotNull("k"), Unique("k"),
      InRange("v", 0.0, 10.0), IsIn("status", Seq("F", "O"))))
    assert(got.filter(!col("passed")).count() == 0)
  }

  test("rule set without Unique plans a single aggregate, no Expand") {
    val plan = check(df, Seq(NotNull("k"), InRange("v", 0.0, 1.0)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"unexpected Expand:\n$plan")
  }
}

/** Resample: gap days appear with n=0, LOCF carries the last day sum. */
class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gap days are zero-filled and values carried forward per key") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 2.0),
      (1L, ts("2024-01-01 11:00:00"), 3.0),
      (1L, ts("2024-01-04 09:00:00"), 7.0), // 2-day gap
      (2L, ts("2024-01-02 00:00:00"), 1.0)
    ).toDF("user_id", "ts", "value")
    val got = TimeSeries.resampleDailyLocf(ev, "user_id", "ts", "value")
      .select(col("key"), date_format(col("day"), "yyyy-MM-dd"), col("n"), col("locf_value"))
      .as[(Long, String, Long, Double)].collect().toSet
    assert(got == Set(
      (1L, "2024-01-01", 2L, 5.0),
      (1L, "2024-01-02", 0L, 5.0),
      (1L, "2024-01-03", 0L, 5.0),
      (1L, "2024-01-04", 1L, 7.0),
      (2L, "2024-01-02", 1L, 1.0))) // key 2's span is its own min..max
  }

  test("funnel: strict ordering chains steps; out-of-order steps don't count") {
    val ev = Seq(
      // user 1: full conversion in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // user 2: purchase BEFORE click -> stops at click (stage 2)
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:30:00"), "purchase"),
      (2L, ts("2024-01-01 11:00:00"), "click"),
      // user 3: click precedes the first view -> only a later click counts
      (3L, ts("2024-01-01 09:00:00"), "click"),
      (3L, ts("2024-01-01 10:00:00"), "view"),
      // user 4: never viewed -> not in the funnel at all
      (4L, ts("2024-01-01 10:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = TimeSeries.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .select(col("key"), col("stage")).as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 1))
  }

  test("decayedSum: reference event full weight, older events decayed by half-life") {
    val lam = 0.6931471805599453 / 7.0 // 7-day half-life, literal contract
    val ev = Seq(
      (1L, ts("2024-01-15 00:00:00"), 10.0), // the max ts -> weight 1
      (1L, ts("2024-01-08 00:00:00"), 10.0), // exactly 7 days old -> 1/2
      (2L, ts("2024-01-01 00:00:00"), 8.0)   // 14 days old -> 1/4
    ).toDF("user_id", "ts", "value")
    val got = TimeSeries.decayedSum(ev, "user_id", "ts", "value", lam)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // exp(-lam*7) = 0.5 exactly up to ulps -> 6-dp rounds absorb
    assert(got(1L) == ((2L, 15.0)))
    assert(got(2L) == ((1L, 2.0)))
  }
}

/** SCD2: consecutive equal states merge; intervals chain exactly. */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("builds validity intervals from a change log") {
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), "bronze", 1L),
      (1L, ts("2024-01-02 00:00:00"), "bronze", 2L), // no change -> merged
      (1L, ts("2024-01-03 00:00:00"), "silver", 3L),
      (1L, ts("2024-01-05 00:00:00"), "bronze", 4L), // state can recur
      (2L, ts("2024-01-01 00:00:00"), "gold", 5L)
    ).toDF("user_id", "ts", "state", "event_id")
    val got = Scd2.buildHistory(log, "user_id", "ts", "state", "event_id")
      .as[(Long, String, Long, Option[Long])].collect().toSet
    def us(s: String) = ts(s).getTime * 1000L
    assert(got == Set(
      (1L, "bronze", us("2024-01-01 00:00:00"), Some(us("2024-01-03 00:00:00"))),
      (1L, "silver", us("2024-01-03 00:00:00"), Some(us("2024-01-05 00:00:00"))),
      (1L, "bronze", us("2024-01-05 00:00:00"), None),
      (2L, "gold", us("2024-01-01 00:00:00"), None)))
  }

  test("both windows reuse one key partitioning (single Exchange)") {
    val log = Seq((1L, ts("2024-01-01 00:00:00"), "a", 1L))
      .toDF("user_id", "ts", "state", "event_id")
    val plan = Scd2.buildHistory(log, "user_id", "ts", "state", "event_id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected one shuffle, got $exchanges:\n$plan")
  }

  test("point-in-time lookup: same-instant changes resolve to the last one") {
    // the q123 composition contract: dropping zero-width intervals
    // makes valid_from unique per key, so backward-as-of == interval
    // containment even when several changes land on one instant
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), "a", 1L),
      (1L, ts("2024-01-02 00:00:00"), "b", 2L), // same instant...
      (1L, ts("2024-01-02 00:00:00"), "c", 3L) // ...c wins (seq order)
    ).toDF("user_id", "ts", "state", "event_id")
    val hist = Scd2.buildHistory(log, "user_id", "ts", "state", "event_id")
      .filter(col("valid_to_us").isNull ||
        col("valid_to_us") =!= col("valid_from_us"))
      .select(col("key").as("user_id"), col("state"), col("valid_from_us"))
    def us(s: String) = ts(s).getTime * 1000L
    val facts = Seq(
      (1L, 10L, us("2024-01-01 12:00:00")), // inside [a)
      (1L, 11L, us("2024-01-02 00:00:00")), // exactly at the double change
      (1L, 12L, us("2023-12-31 00:00:00")) // before history -> no match
    ).toDF("user_id", "event_id", "lookup_us")
    val got = AsOfJoin.backward(
        facts, hist, Seq("user_id"), "lookup_us", "valid_from_us",
        rightPayload = Seq("state"), tieBreakCol = "valid_from_us")
      .select(col("event_id"), col("state"))
      .as[(Long, Option[String])].collect().toMap
    assert(got == Map(10L -> Some("a"), 11L -> Some("c"), 12L -> None))
  }
}
