package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("joinAsOf: latest right row at or before each left time, per key") {
    val quotes = Seq(
      ("A", ts("2024-01-01 00:00:00"), 10L),
      ("A", ts("2024-01-03 00:00:00"), 30L),
      ("B", ts("2024-01-02 00:00:00"), 99L)
    ).toDF("k", "qt", "qid")
    val trades = Seq(
      (1L, "A", ts("2024-01-02 00:00:00")), // after q10, before q30 -> 10
      (2L, "A", ts("2024-01-03 00:00:00")), // equal time is inclusive -> 30
      (3L, "A", ts("2024-01-04 00:00:00")), // after both -> 30
      (4L, "B", ts("2024-01-01 00:00:00")), // before any B quote -> null
      (5L, "C", ts("2024-01-05 00:00:00"))  // key with no quotes -> null
    ).toDF("tid", "k", "tt")

    val joined = AsOf.joinAsOf(trades, quotes, key = "k",
        leftTime = "tt", rightTime = "qt", payload = Seq("qid"), leftId = "tid")
      .select("tid", "qid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    assert(joined == Map(
      1L -> Some(10L), 2L -> Some(30L), 3L -> Some(30L),
      4L -> None, 5L -> None))
  }

  test("joinAsOf: NULL times follow SQL ASOF semantics, NULL payload fields stay NULL") {
    val quotes = Seq(
      ("A", null.asInstanceOf[java.sql.Timestamp], Some(99L)), // never matchable
      ("A", ts("2024-01-01 00:00:00"), Some(10L)),
      ("A", ts("2024-01-02 00:00:00"), None)                   // matched row carries NULL qid
    ).toDF("k", "qt", "qid")
    val trades = Seq(
      (1L, "A", ts("2024-01-01 12:00:00")), // -> 10
      (2L, "A", ts("2024-01-03 00:00:00")), // latest match has NULL qid -> NULL, not stale 10
      (3L, "A", null.asInstanceOf[java.sql.Timestamp]) // NULL left time -> no match
    ).toDF("tid", "k", "tt")
    val joined = AsOf.joinAsOf(trades, quotes, "k", "tt", "qt", Seq("qid"), "tid")
      .select("tid", "qid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(joined == Map(1L -> Some(10L), 2L -> None, 3L -> None))
  }

  test("joinAsOf: payload/left column collisions fail fast") {
    val quotes = Seq(("A", ts("2024-01-01 00:00:00"), 1L)).toDF("k", "qt", "tid")
    val trades = Seq((1L, "A", ts("2024-01-02 00:00:00"))).toDF("tid", "k", "tt")
    intercept[IllegalArgumentException] {
      AsOf.joinAsOf(trades, quotes, "k", "tt", "qt", Seq("tid"), "tid")
    }
  }

  test("joinAsOf: single shuffle on the key, no cartesian/range explosion") {
    val quotes = Seq(("A", ts("2024-01-01 00:00:00"), 1L)).toDF("k", "qt", "qid")
    val trades = Seq((1L, "A", ts("2024-01-02 00:00:00"))).toDF("tid", "k", "tt")
    val p = AsOf.joinAsOf(trades, quotes, "k", "tt", "qt", Seq("qid"), "tid")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("Window"), "carry-forward must be a window, not a join")
  }
}
