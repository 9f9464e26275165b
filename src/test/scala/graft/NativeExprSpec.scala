package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.DotProduct

/** The custom-Catalyst-extension tier: native DotProduct expression
  * (doGenCode), the graft_dot SQL function, and the FoldToDotProduct
  * optimizer rule injected via SparkSessionExtensions. */
class NativeExprSpec extends AnyFunSuite {
  import SharedSpark.{sf001, spark}

  private def hofDot = {
    val e = col("embedding").cast("array<double>")
    aggregate(zip_with(e, e, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
  }

  test("native DotProduct is bit-identical to the HOF fold on real embeddings") {
    val e = col("embedding").cast("array<double>")
    val both = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), hofDot.as("hof"), DotProduct.dot(e, e).as("native"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(
        java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"vec ${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}"
      )
    }
  }

  test("DotProduct participates in whole-stage codegen (no CodegenFallback)") {
    val e = col("embedding").cast("array<double>")
    val df = Tables.embeddings(spark, sf001).select(DotProduct.dot(e, e).as("d"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"not codegen'd:\n${plan.take(400)}")
  }

  test("graft_dot SQL function + FoldToDotProduct rule work in an extensions session") {
    // SharedSpark loads graft.plans.GraftExtensions (spark.sql.extensions
    // is a STATIC conf — it must be set on the first session of the JVM).
    assert(spark.catalog.functionExists("graft_dot"))
    Tables.embeddings(spark, sf001).createOrReplaceTempView("emb_ext")

    // injected SQL function
    val viaFn = spark.sql(
      """SELECT vec_id, graft_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |                         CAST(embedding AS ARRAY<DOUBLE>)) AS d
        |FROM emb_ext ORDER BY vec_id LIMIT 5""".stripMargin).collect()
    assert(viaFn.length == 5 && viaFn.forall(_.getDouble(1) > 0))

    // optimizer rule: the HOF idiom written by a user is rewritten to
    // the native expression in the optimized plan
    val hof = spark.sql(
      """SELECT aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>),
        |                          CAST(embedding AS ARRAY<DOUBLE>),
        |                          (x, y) -> x * y),
        |                 CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d
        |FROM emb_ext""".stripMargin)
    val optimized = hof.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"), s"rule did not fire:\n$optimized")

    // and the rewrite preserves values exactly
    val viaRule = hof.collect().map(_.getDouble(0)).sorted
    val viaNative = spark.sql(
      """SELECT graft_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |                 CAST(embedding AS ARRAY<DOUBLE>)) AS d
        |FROM emb_ext""".stripMargin).collect().map(_.getDouble(0)).sorted
    assert(viaRule.toSeq == viaNative.toSeq)
  }

  test("DotProduct matches the HOF null contract: length mismatch and null elements") {
    // zip_with null-pads the shorter array and a null product nulls the
    // fold, so the HOF returns null on length mismatch or any null
    // element; DotProduct must agree or the FoldToDotProduct rewrite
    // silently changes user semantics (round-1 ADVICE).
    import spark.implicits._
    val rows = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)), // ok: 11.0
      (2L, Seq[java.lang.Double](1.0, 2.0, 5.0), Seq[java.lang.Double](3.0, 4.0)), // len mismatch
      (3L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)), // null element
      (4L, Seq.empty[java.lang.Double], Seq.empty[java.lang.Double]) // empty: 0.0
    ).toDF("id", "a", "b")
    val out = rows.select(
      col("id"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, v) => acc + v).as("hof"),
      DotProduct.dot(col("a"), col("b")).as("native")
    ).orderBy("id").collect()
    out.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"id ${r.getLong(0)}: null mismatch $r")
      if (!r.isNullAt(1))
        assert(
          java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
            java.lang.Double.doubleToLongBits(r.getDouble(2)), s"id ${r.getLong(0)}: $r")
    }
    assert(out(0).getDouble(2) == 11.0 && out(1).isNullAt(2) &&
      out(2).isNullAt(2) && out(3).getDouble(2) == 0.0)
  }
}
