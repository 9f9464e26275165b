package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

class SkewSpec extends AnyFunSuite {
  import SharedSpark.{sf01, spark}

  test("salted two-phase aggregation is bit-identical to the plain plan") {
    val ev = Tables.events(spark, sf01)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = toMap(Skew.saltedCountSum(ev, "event_type", "value"))
    val plain = toMap(Skew.plainCountSum(ev, "event_type", "value"))
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (n, s)) =>
      val (pn, ps) = plain(k)
      assert(n == pn)
      assert(java.lang.Double.doubleToLongBits(s) == java.lang.Double.doubleToLongBits(ps),
        s"$k: salted $s != plain $ps")
    }
  }

  test("salted plan has two aggregation exchanges (the skew split)") {
    val df = Skew.saltedCountSum(Tables.events(spark, sf01), "event_type", "value")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges >= 2, s"expected salt + final exchanges:\n${plan.take(800)}")
  }
}
