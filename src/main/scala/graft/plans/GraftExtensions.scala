package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{
  Add, ArrayAggregate, BloomFilterMightContain, Expression, ExpressionInfo,
  LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith
}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Engine extensions, registered via
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`:
  *
  *  1. `graft_dot(a, b)` SQL function → the native DotProduct expression
  *     (extension tier (b): injectFunction).
  *  2. `FoldToDotProduct` optimizer rule (injectOptimizerRule): rewrites
  *     the declarative HOF dot-product idiom `aggregate(zip_with(a, b,
  *     (x,y) -> x*y), 0.0, (acc,v) -> acc+v)` into DotProduct — user code
  *     stays fully declarative builtins, the optimizer swaps in the
  *     codegen'd loop. Safe because both sides are the same strict
  *     left-to-right fold (bit-identical results, NativeExprSpec asserts
  *     it).
  *  3. `AsOfJoinStrategy` planner strategy (extension tier (c):
  *     injectPlannerStrategy): plans the custom [[AsOfJoinPlan]] logical
  *     node into the merge-based [[AsOfJoinExec]] physical operator —
  *     the whole-operator extension path for semantics Spark's built-in
  *     operators can't express efficiently (two-table as-of join).
  *  4. `asof_join(...)` SQL table-valued function (injectTableFunction):
  *     the FROM-clause surface over the same [[AsOfJoinPlan]] node, so SQL
  *     and Scala callers share one operator (see [[AsOfJoinTvf]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))
    ))
    // 5. Bloom-filter surface (q79): Spark's own runtime-filter
    //    expressions — BloomFilterAggregate builds the sketch as a binary
    //    aggregate, BloomFilterMightContain probes it (requires a constant
    //    or scalar-subquery bloom side, exactly the InjectRuntimeFilter
    //    contract). Registered as SQL functions so user queries can apply
    //    the semi-join pre-filter pattern declaratively.
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => new BloomFilterAggregate(c)
        case Seq(c, est) => new BloomFilterAggregate(c, est)
        case Seq(c, est, bits) => new BloomFilterAggregate(c, est, bits)
        case other => throw new IllegalArgumentException(
          s"graft_bloom_agg expects 1-3 arguments, got ${other.size}")
      }
    ))
    ext.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      (children: Seq[Expression]) => BloomFilterMightContain(children(0), children(1))
    ))
    ext.injectOptimizerRule(_ => FoldToDotProduct)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectTableFunction((
      new FunctionIdentifier("asof_join"),
      new ExpressionInfo(AsOfJoinTvf.getClass.getName, "asof_join"),
      (args: Seq[Expression]) => AsOfJoinTvf.builder(args)
    ))
  }
}

/** aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) -> acc+v) ⇒
  * DotProduct(a, b). The finish lambda must be the identity (which is
  * what `functions.aggregate` without a finish argument produces).
  *
  * Soundness: DotProduct implements the HOF's exact null contract — null
  * when the arrays differ in length (zip_with null-pads) or any element
  * is null, 0.0 on empty arrays — so the rewrite is value-preserving for
  * every array<double> input, nullable elements included (round-1 ADVICE:
  * the previous min-length non-null sum silently changed user semantics).
  */
object FoldToDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(t: org.apache.spark.sql.types.DataType): Boolean = t match {
    case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
    case _ => false
  }

  private object IdentityLambda {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
        v.exprId == arg.exprId
      case _ => false
    }
  }

  private object MultiplyLambda {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), Seq(a, b), _) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
  }

  private object AddLambda {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _), Seq(a, b), _) =>
        x.exprId == a.exprId && y.exprId == b.exprId
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressionsWithPruning(
    _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.HIGH_ORDER_FUNCTION)) {
    case ArrayAggregate(ZipWith(a, b, MultiplyLambda()), Literal(0.0, DoubleType), AddLambda(), IdentityLambda())
        if isDoubleArray(a.dataType) && isDoubleArray(b.dataType) =>
      DotProduct(a, b)
  }
}
