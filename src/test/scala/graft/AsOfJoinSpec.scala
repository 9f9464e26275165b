package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOfJoin

/** The native as-of join (plans/AsOfJoin.scala — custom LogicalPlan +
  * SparkStrategy + merge-pass SparkPlan via GraftExtensions). Locked:
  *  1. on real data it reproduces q16's window form bit-for-bit (both SFs)
  *     — same rows, same NULLs for click-less purchases;
  *  2. two-table generality the window trick cannot express: trades vs
  *     quotes with different schemas, strict/non-strict and tolerance
  *     semantics, checked against an independent composed computation;
  *  3. plan shape: the physical plan contains AsOfJoinExec fed by
  *     key-hash exchanges + (key, time) sorts — no nested-loop join, no
  *     row amplification;
  *  4. edge cases: empty right side (all-NULL payload, left preserved).
  */
class AsOfJoinSpec extends AnyFunSuite {
  import SharedSpark.{sf001, sf01, spark}
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("reproduces q16's single-table window form bit-for-bit on both SFs") {
    for (d <- Seq(sf001, sf01)) {
      val ev = Tables.events(spark, d)
      val got = AsOfJoin.asof(
        left = ev.where(col("event_type") === "purchase"),
        right = ev.where(col("event_type") === "click"),
        leftKey = "user_id", rightKey = "user_id",
        leftTime = "ts", rightTime = "ts",
        payload = Seq("ts" -> "last_click_ts"))
        .select("event_id", "user_id", "ts", "last_click_ts")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2), r.get(3))).toSet
      val want = SparkEntry.queries("q16_join_asof")(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2), r.get(3))).toSet
      assert(got.nonEmpty && got == want, s"as-of mismatch at $d")
      assert(got.exists(_._4 == null), "expected some click-less purchases (NULL payload)")
    }
  }

  test("two-table trades-vs-quotes: strict, non-strict, and tolerance semantics") {
    val trades = Seq((1L, ts(10), 100.0), (1L, ts(30), 101.0), (2L, ts(5), 50.0), (3L, ts(1), 9.0))
      .toDF("sym", "t_ts", "price")
    val quotes = Seq((1L, ts(8), 99.5), (1L, ts(10), 99.9), (1L, ts(29), 100.9), (2L, ts(5), 49.9))
      .toDF("sym", "q_ts", "bid")
    def run(strict: Boolean, tol: Long = -1L) = AsOfJoin.asof(
      trades, quotes, "sym", "sym", "t_ts", "q_ts",
      Seq("bid" -> "last_bid", "q_ts" -> "last_q_ts"), strict, tol)
      .select("sym", "t_ts", "last_bid")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.get(2))).toSet
    // strict: the ts(10) trade must NOT see the ts(10) quote
    assert(run(strict = true) == Set(
      (1L, ts(10), 99.5), (1L, ts(30), 100.9), (2L, ts(5), null), (3L, ts(1), null)))
    // non-strict: it must
    assert(run(strict = false) == Set(
      (1L, ts(10), 99.9), (1L, ts(30), 100.9), (2L, ts(5), 49.9), (3L, ts(1), null)))
    // tolerance 60s: the ts(30) trade's latest quote (ts(29)) is within it,
    // the ts(10) trade's latest strict quote (ts(8)) is not
    assert(run(strict = true, tol = 60L * 1000000) == Set(
      (1L, ts(10), null), (1L, ts(30), 100.9), (2L, ts(5), null), (3L, ts(1), null)))
  }

  test("matches an independent composed computation on dense random data") {
    // 5k left rows × 5k right rows over 50 keys — multiple rows per
    // (key, minute), forced through the 32-partition shuffle path
    val lhs = spark.range(5000).select(
      (col("id") % 50).as("k"),
      timestamp_micros(col("id") * 7919 % 100000 * 1000000L).as("lt"),
      col("id").as("lid"))
    val rhs = spark.range(5000).select(
      (col("id") % 50).as("k"),
      timestamp_micros(col("id") * 104729 % 100000 * 1000000L).as("rt"),
      (col("id") * 3).as("rv"))
    val got = AsOfJoin.asof(lhs, rhs, "k", "k", "lt", "rt", Seq("rv" -> "asof_rv"))
      .select("lid", "asof_rv")
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    // oracle: inequality join + per-left-row argmax on (rt, rv) — rv is the
    // deterministic tie-break for equal rt within a key
    val want = lhs.join(rhs, lhs("k") === rhs("k") && col("rt") < col("lt"), "left")
      .groupBy("lid").agg(max(struct(col("rt"), col("rv"))).as("m"))
      .select(col("lid"), col("m.rv").as("asof_rv"))
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(got.size == 5000)
    // where several right rows share the latest rt, the merge keeps the
    // LAST in sort order — max(struct) picks the same (largest rv)
    assert(got == want)
  }

  test("right rows tied on (key, time): the max payload tuple wins, deterministically") {
    // 40 right rows per key ALL at the same timestamp with shuffled distinct
    // payloads — forced through the 32-partition shuffle so partition-sort
    // luck can't save a missing tie-break. Ordering contract: the exec
    // appends payload columns to the right child's required ordering, so
    // the retained row == max(struct(time, payload...)).
    val lhs = spark.range(50).select(
      col("id").as("k"), timestamp_micros(lit(1000000000L)).as("lt"), col("id").as("lid"))
    val rhs = spark.range(2000).select(
      (col("id") % 50).as("k"),
      timestamp_micros(lit(999000000L)).as("rt"),
      // permuted payloads: per key the 40 values are (id*17+k)%40-ish, max varies
      ((col("id") * 7919) % 1000).as("rv"))
    val got = AsOfJoin.asof(lhs, rhs, "k", "k", "lt", "rt", Seq("rv" -> "asof_rv"))
      .select("lid", "asof_rv")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = rhs.groupBy("k").agg(max("rv").as("mx"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, "tied right timestamps must retain the largest payload")
  }

  test("SQL surface: the asof_join TVF plans the same operator as the Scala API") {
    val got = SparkEntry.queries("q68_asof_sql")(spark, sf001)
    // same physical operator...
    assert(got.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      "SQL surface must plan through AsOfJoinExec")
    // ...same rows as the native Scala form (q64)
    val want = SparkEntry.queries("q64_asof_native")(spark, sf001)
    assert(got.collect().toSeq == want.collect().toSeq)
  }

  test("SQL surface: 9th boolean arg flips strictness; bad arguments fail fast") {
    val trades = Seq((1L, ts(10), 100.0)).toDF("sym", "t_ts", "price")
    val quotes = Seq((1L, ts(10), 99.9), (1L, ts(8), 99.5)).toDF("sym", "q_ts", "bid")
    trades.createOrReplaceTempView("graft_tvf_trades")
    quotes.createOrReplaceTempView("graft_tvf_quotes")
    def bid(strictArg: String): Any = spark.sql(
      s"""SELECT last_bid FROM asof_join('graft_tvf_trades', 'graft_tvf_quotes',
         |'sym', 'sym', 't_ts', 'q_ts', 'bid', 'last_bid'$strictArg)""".stripMargin)
      .collect().head.get(0)
    assert(bid("") == 99.5)             // default strict: ts(10) quote excluded
    assert(bid(", true") == 99.5)
    assert(bid(", false") == 99.9)      // non-strict: ties match
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM asof_join('graft_tvf_trades', 'graft_tvf_quotes')").collect()
    }
    assert(e1.getMessage.contains("asof_join takes 8 or 9 arguments"))
    val e2 = intercept[Exception] {
      spark.sql(
        """SELECT * FROM asof_join('graft_tvf_trades', 'graft_tvf_quotes',
          |'sym', 'sym', 't_ts', 'q_ts', 'bid', 42)""".stripMargin).collect()
    }
    assert(e2.getMessage.contains("must be a string literal"))
  }

  test("plan shape: AsOfJoinExec fed by key exchanges and (key,time) sorts; no NLJ") {
    val ev = Tables.events(spark, sf01)
    val df = AsOfJoin.asof(
      ev.where(col("event_type") === "purchase"),
      ev.where(col("event_type") === "click"),
      "user_id", "user_id", "ts", "ts", Seq("ts" -> "last_click_ts"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), "custom operator missing from the plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size >= 2,
      "both sides must co-partition on the key")
    assert(plan.contains("Sort"), "children must sort on (key, time)")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      "the whole point: no quadratic join")
  }

  test("input validation: unknown columns and non-temporal time columns fail fast") {
    val lhs = Seq((1L, ts(1), 1.0)).toDF("k", "lt", "v")
    val rhs = Seq((1L, ts(0), 9.0)).toDF("k", "rt", "rv")
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.asof(lhs, rhs, "nope", "k", "lt", "rt", Seq("rv" -> "x"))
    }
    assert(e1.getMessage.contains("nope"))
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asof(lhs, rhs, "k", "k", "v", "rt", Seq("rv" -> "x")) // v is DOUBLE
    }
    assert(e2.getMessage.contains("TIMESTAMP"))
  }

  test("empty right side: left preserved with all-NULL payload") {
    val lhs = Seq((1L, ts(1), 1.0), (2L, ts(2), 2.0)).toDF("k", "lt", "v")
    val rhs = Seq.empty[(Long, Timestamp, Double)].toDF("k", "rt", "rv")
    val out = AsOfJoin.asof(lhs, rhs, "k", "k", "lt", "rt", Seq("rv" -> "asof_rv"))
      .collect()
    assert(out.length == 2 && out.forall(_.get(3) == null))
  }
}
