package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, AttributeSet, Expression,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection
}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, TimestampType}

/** AS-OF JOIN — for every left row, attach the payload of the LATEST right
  * row with the same key and an earlier (strictly, by default) timestamp:
  * the core temporal-join primitive (pandas `merge_asof`, kdb/QuestDB
  * ASOF JOIN) that Spark's relational algebra cannot express efficiently
  * for two DIFFERENT tables — the declarative spellings are either an
  * inequality join + per-key MAX re-join (quadratic within key×time) or a
  * union + window trick that only works when both sides share one schema
  * (q16). This is the brief's extension tier (c) case: a whole-operator
  * semantic gap, filled with a custom LogicalPlan + SparkStrategy +
  * physical SparkPlan, registered through [[GraftExtensions]].
  *
  * Physical algorithm (the 100 TB shape): hash-co-partition both sides by
  * key, sort each partition by (key, time) — both requirements DECLARED
  * (`requiredChildDistribution` / `requiredChildOrdering`) so Catalyst
  * plans the exchanges/sorts and AQE can still coalesce — then one
  * streaming merge pass per partition holding O(1) state (the latest
  * matching right row). Shuffle volume is one pass of each side, no
  * row amplification, no per-key buffering.
  *
  * Semantics notes: left rows always survive (left-outer); a left row with
  * no qualifying right row gets NULL payload. `strict = true` matches
  * `r.time < l.time`; `toleranceMicros >= 0` additionally requires
  * `l.time - r.time <= tolerance` (evaluated against the latest earlier
  * row — as-of, not nearest-within-window). Null right timestamps never
  * match; keys compare by sort order (the corpus has no null keys; null
  * keys would group like any other value, unlike SQL equi-join nulls).
  * Right rows TIED on (key, time) with distinct payloads: the retained row
  * is the one with the lexicographically LARGEST payload tuple — enforced,
  * not partition-sort luck, because the exec appends the (orderable)
  * payload columns to the right child's required ordering and the merge
  * keeps the last match. Equivalent to `max(struct(time, payload...))`
  * per left row. A non-orderable payload column (e.g. MAP) truncates the
  * tie-break at that column; ties beyond it are nondeterministic.
  */
object AsOfJoin {

  /** As-of join `left` with `right` on `leftKey == rightKey`,
    * `right(rightTime) < left(leftTime)` (or `<=` when `strict = false`),
    * carrying `payload` columns from the right as `(rightCol -> outName)`.
    * Time columns must be TIMESTAMP or BIGINT. */
  def asof(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[(String, String)],
      strict: Boolean = true,
      toleranceMicros: Long = -1L): DataFrame =
    GraftSqlBridge.ofRows(left.sparkSession,
      node(left, right, leftKey, rightKey, leftTime, rightTime, payload,
        strict, toleranceMicros))

  /** Build the resolved [[AsOfJoinPlan]] logical node without materializing
    * a DataFrame — shared by [[asof]] and the `asof_join` SQL table-valued
    * function ([[AsOfJoinTvf]]). */
  private[plans] def node(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[(String, String)],
      strict: Boolean = true,
      toleranceMicros: Long = -1L): AsOfJoinPlan = {
    // Fresh aliases on the right side mint new exprIds, so self-joins
    // (left and right carved from the same table) never present duplicate
    // attributes to the binary node.
    val rightPrep = right.select(
      col(rightKey).as("__asof_key") +: col(rightTime).as("__asof_time") +:
        payload.zipWithIndex.map { case ((c, _), i) => col(c).as(s"__asof_p$i") }: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rightPrep.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${p.output.map(_.name).mkString(", ")}]"))
    def checkTime(a: Attribute): Attribute = {
      require(a.dataType == TimestampType || a.dataType == LongType,
        s"as-of time column ${a.name} must be TIMESTAMP or BIGINT, got ${a.dataType}")
      a
    }
    val rPayload = payload.zipWithIndex.map { case (_, i) => attr(rPlan, s"__asof_p$i") }
    val outAttrs = payload.zip(rPayload).map { case ((_, outName), ra) =>
      AttributeReference(outName, ra.dataType, nullable = true)()
    }
    AsOfJoinPlan(
      lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, "__asof_key"),
      checkTime(attr(lPlan, leftTime)), checkTime(attr(rPlan, "__asof_time")),
      rPayload, outAttrs, strict, toleranceMicros)
  }
}

/** SQL surface for the native as-of join — a table-valued function
  * registered through `SparkSessionExtensions.injectTableFunction`
  * ([[GraftExtensions]]), so plain SQL users get the operator without
  * touching the Scala API:
  *
  * {{{
  * SELECT * FROM asof_join(
  *   'purchases', 'clicks',        -- left/right table or view names
  *   'user_id', 'user_id',         -- join keys
  *   'ts', 'ts',                   -- time columns
  *   'ts', 'last_click_ts')        -- right payload column -> output name
  * }}}
  *
  * An optional 9th boolean argument sets `strict` (default true: right time
  * strictly earlier). The builder resolves the named tables through the
  * active session's catalog and returns the same [[AsOfJoinPlan]] the Scala
  * API builds, so SQL and Scala share one physical operator (and DuckDB's
  * native `ASOF LEFT JOIN` serves as the oracle — q68). Table names go
  * through `SparkSession.table`, so views, catalog tables, and
  * database-qualified names all work.
  */
object AsOfJoinTvf {
  val usage: String =
    "asof_join('left','right','leftKey','rightKey','leftTime','rightTime'," +
      "'payloadCol','outName'[, strict BOOLEAN])"

  def builder(args: Seq[Expression]): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{BooleanType, StringType}
    require(args.length == 8 || args.length == 9,
      s"asof_join takes 8 or 9 arguments, got ${args.length}; usage: $usage")
    def str(i: Int, what: String): String = args(i) match {
      case Literal(v, StringType) if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"asof_join: $what (argument ${i + 1}) must be a string literal, " +
          s"got ${other.sql}; usage: $usage")
    }
    val strict = if (args.length == 9) args(8) match {
      case Literal(b: Boolean, BooleanType) => b
      case other => throw new IllegalArgumentException(
        s"asof_join: strict (argument 9) must be a boolean literal, " +
          s"got ${other.sql}; usage: $usage")
    } else true
    val spark = SparkSession.active
    AsOfJoin.node(
      spark.table(str(0, "left table")), spark.table(str(1, "right table")),
      str(2, "left key"), str(3, "right key"),
      str(4, "left time"), str(5, "right time"),
      Seq(str(6, "payload column") -> str(7, "output name")), strict)
  }
}

/** Logical as-of join: output = left.output ++ outAttrs (the carried right
  * payload, re-minted as produced attributes). Constructed fully resolved
  * by [[AsOfJoin.asof]]; planned by [[AsOfJoinStrategy]]. */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightPayload: Seq[Expression],
    outAttrs: Seq[AttributeReference],
    strict: Boolean,
    toleranceMicros: Long) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]. Injected via
  * `GraftExtensions` (`injectPlannerStrategy`). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, pay, out, strict, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, pay, out, strict, tol) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: declares co-clustering on the key and (key, time)
  * ordering for both children — Catalyst inserts the exchanges and sorts —
  * then merges each co-partition in one pass with O(1) carried state. */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightPayload: Seq[Expression],
    outAttrs: Seq[AttributeReference],
    strict: Boolean,
    toleranceMicros: Long) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    // payload columns extend the right ordering so rows tied on
    // (key, time) are consumed in payload order and the merge's
    // last-match-wins retention is deterministic (== max payload tuple).
    // takeWhile, not filter: sort keys after the first non-orderable one
    // can't contribute a well-defined tie-break anyway.
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightPayload.takeWhile(p => RowOrdering.isOrderable(p.dataType))
        .map(SortOrder(_, Ascending)))

  // left rows pass through in their sorted order
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExpr = leftKey
    val rKeyExpr = rightKey
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val payloadExprs = rightPayload
    val keyType = leftKey.dataType
    val strictLocal = strict
    val tolLocal = toleranceMicros
    val payloadTypes = rightPayload.map(_.dataType)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lKeyExpr), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rKeyExpr), rOut)
      val lTimeBound = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeBound = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val valProj = UnsafeProjection.create(payloadExprs, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyType))
      val nullVal = InternalRow.fromSeq(payloadTypes.map(_ => null))
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(output, lOut ++ outAttrs)

      new Iterator[InternalRow] {
        // the un-consumed right row currently under the cursor
        private var rCur: InternalRow = _
        // latest right row seen with (key == lastKey, time <= bound); the
        // projections reuse buffers, so retained values are copies
        private var lastKey: InternalRow = _
        private var lastTime: Long = 0L
        private var lastVal: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val ltRow = lTimeBound(l)
          val lHasTime = !ltRow.isNullAt(0)
          val lt = if (lHasTime) ltRow.getLong(0) else 0L
          // advance the right cursor up to (but not past) this left row
          var advancing = lHasTime
          while (advancing && (rCur != null || rIter.hasNext)) {
            if (rCur == null) rCur = rIter.next()
            val rk = rKeyProj(rCur)
            val c = keyOrd.compare(rk, lk)
            if (c > 0) {
              advancing = false // right is ahead; keep for a later left key
            } else if (c < 0) {
              rCur = null // right key exhausted below this left key
            } else {
              val rtRow = rTimeBound(rCur)
              if (rtRow.isNullAt(0)) {
                rCur = null // null right time never matches
              } else {
                val rt = rtRow.getLong(0)
                if (if (strictLocal) rt < lt else rt <= lt) {
                  lastKey = rk.copy(); lastTime = rt; lastVal = valProj(rCur).copy()
                  rCur = null
                } else {
                  advancing = false // right row is in this left row's future
                }
              }
            }
          }
          val matched = lHasTime && lastVal != null &&
            keyOrd.compare(lastKey, lk) == 0 &&
            (tolLocal < 0L || lt - lastTime <= tolLocal)
          resultProj(joined(l, if (matched) lastVal else nullVal))
        }
      }
    }
  }
}
