package graft.plans

import scala.collection.mutable

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, BindReferences, Cast, EqualTo, Expression, GreaterThan,
  GreaterThanOrEqual, JoinedRow, LessThan, LessThanOrEqual, PredicateHelper,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** Native point-in-interval (range) join — the full custom-operator ladder
  * tier (c): logical plan node + planner strategy + physical operator +
  * optimizer rewrite rule, registered through `SparkSessionExtensions`.
  *
  * Semantics: inner join of a (large) point-side row set against a
  * (broadcast-small) interval-side row set on optional equi-keys plus
  * `start <= point < end`.
  *
  * Why a custom node: Spark plans a join whose condition includes
  * inequalities but whose equi-keys alone are non-selective as
  * BroadcastNestedLoopJoin — O(|points| x |intervals|) per key group. This
  * operator instead broadcasts the interval side ONCE as a per-key
  * start-sorted index with a prefix-max-end array, and probes it per point
  * row with binary search: O(log n + matches) per row, no shuffle of the
  * point side at all (its partitioning is preserved for downstream reuse).
  * The composed bucketized rewrite ([[graft.operators.RangeJoin]]) stays
  * the scale path when BOTH sides are large; this node is the dimension-
  * sized-interval path (SCD windows, calendars, session bounds).
  *
  * At 100 TB: the point side streams through executors untouched (narrow
  * dependency); the interval index ships once per executor. The optimizer
  * rule only fires when the interval side fits `autoBroadcastJoinThreshold`,
  * so the driver collect is bounded by the same contract Spark's own
  * broadcast joins rely on.
  */
case class BroadcastRangeJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    point: Expression,
    start: Expression,
    end: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BroadcastRangeJoin =
    copy(left = newLeft, right = newRight)
}

/** Per-key start-sorted interval index, built on the driver, broadcast to
  * executors. `prefixMaxEnd(i)` = max of `ends(0..i)` — the probe walks
  * left from the binary-search upper bound and stops the moment the prefix
  * max can no longer cover the point, which keeps overlapping intervals
  * cheap without a full interval tree.
  */
private[plans] final class IntervalIndex(
    groups: java.util.HashMap[UnsafeRow, IntervalIndex.Group])
  extends Serializable {
  def lookup(key: UnsafeRow): IntervalIndex.Group = groups.get(key)
}

private[plans] object IntervalIndex {
  final class Group(
      val starts: Array[Long],
      val ends: Array[Long],
      val prefixMaxEnd: Array[Long],
      val rows: Array[UnsafeRow])
    extends Serializable

  def build(entries: Iterator[(UnsafeRow, Long, Long, UnsafeRow)]): IntervalIndex = {
    val byKey = new java.util.HashMap[UnsafeRow, mutable.ArrayBuffer[(Long, Long, UnsafeRow)]]()
    entries.foreach { case (k, s, e, row) =>
      var buf = byKey.get(k)
      if (buf == null) { buf = mutable.ArrayBuffer.empty; byKey.put(k, buf) }
      buf += ((s, e, row))
    }
    val groups = new java.util.HashMap[UnsafeRow, Group](byKey.size())
    byKey.forEach { (k, buf) =>
      val sorted = buf.sortBy(_._1).toArray
      val starts = sorted.map(_._1)
      val ends = sorted.map(_._2)
      val prefix = new Array[Long](ends.length)
      var m = Long.MinValue
      var i = 0
      while (i < ends.length) { m = math.max(m, ends(i)); prefix(i) = m; i += 1 }
      groups.put(k, new Group(starts, ends, prefix, sorted.map(_._3)))
    }
    new IntervalIndex(groups)
  }
}

case class BroadcastRangeJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    point: Expression,
    start: Expression,
    end: Expression,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // Point-side partitioning flows through unchanged — downstream operators
  // keyed the same way reuse it with no Exchange.
  override def outputPartitioning = left.outputPartitioning

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numIntervals" -> SQLMetrics.createMetric(sparkContext, "broadcast interval rows"))

  /** Widen the supported orderable types to one Long domain (timestamp
    * micros, date days, integral).
    */
  private def asLong(dt: DataType): Any => Long = dt match {
    case TimestampType | TimestampNTZType | LongType => v => v.asInstanceOf[Long]
    case IntegerType | DateType => v => v.asInstanceOf[Int].toLong
    case other =>
      throw new IllegalArgumentException(
        s"BroadcastRangeJoin supports timestamp/date/integral bounds, got ${other.simpleString}")
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numIntervals = longMetric("numIntervals")

    // Driver side: collect + index the (broadcast-sized) interval side.
    // The rewrite rule gates on autoBroadcastJoinThreshold; the programmatic
    // API has no stats to gate on, so enforce a hard row cap here — failing
    // fast with a named conf beats an opaque driver OOM. The cap must bound
    // the collect ITSELF: executeTake(cap+1) never materializes more than
    // one row past the limit, where a collect-then-check would OOM first.
    val maxRows = math.min(
      conf.getConfString("spark.graft.rangeJoin.maxBroadcastRows", "5000000").toLong,
      Int.MaxValue - 2L).toInt
    val rightRows = right.executeTake(maxRows + 1)
    if (rightRows.length > maxRows) {
      throw new IllegalStateException(
        s"BroadcastRangeJoin interval side exceeds " +
          s"spark.graft.rangeJoin.maxBroadcastRows=$maxRows rows; use " +
          "graft.operators.RangeJoin.pointInInterval (bucketized) for large interval sides")
    }
    numIntervals.add(rightRows.length)
    val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
    val rRowProj = UnsafeProjection.create(right.output, right.output)
    val sBound = BindReferences.bindReference(start, right.output)
    val eBound = BindReferences.bindReference(end, right.output)
    val sGet = asLong(start.dataType)
    val eGet = asLong(end.dataType)
    val index = IntervalIndex.build(rightRows.iterator.flatMap { r =>
      val sv = sBound.eval(r)
      val ev = eBound.eval(r)
      val key = rKeyProj(r)
      // Inner-join semantics: null keys / null bounds never match.
      if (sv == null || ev == null || (leftKeys.nonEmpty && key.anyNull)) None
      else Some((key.copy(), sGet(sv), eGet(ev), rRowProj(r).copy()))
    })
    val bcast: Broadcast[IntervalIndex] = sparkContext.broadcast(index)

    val pointExpr = point
    val lKeys = leftKeys
    val lOutput = left.output
    val allOutput = output
    val pGet = asLong(point.dataType)

    left.execute().mapPartitions { iter =>
      val idx = bcast.value
      val keyProj = UnsafeProjection.create(lKeys, lOutput)
      val pBound = BindReferences.bindReference(pointExpr, lOutput)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(allOutput, allOutput)
      iter.flatMap { lrow =>
        val pv = pBound.eval(lrow)
        val key = keyProj(lrow)
        if (pv == null || (lKeys.nonEmpty && key.anyNull)) Iterator.empty
        else {
          val g = idx.lookup(key)
          if (g == null) Iterator.empty
          else {
            val t = pGet(pv)
            // Rightmost interval with start <= t.
            var lo = 0
            var hi = g.starts.length - 1
            var ub = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (g.starts(mid) <= t) { ub = mid; lo = mid + 1 } else hi = mid - 1
            }
            if (ub < 0) Iterator.empty
            else new Iterator[InternalRow] {
              private var j = ub
              private var ready = advance()
              private def advance(): Boolean = {
                while (j >= 0 && g.prefixMaxEnd(j) > t) {
                  if (g.ends(j) > t) return true
                  j -= 1
                }
                false
              }
              override def hasNext: Boolean = ready
              override def next(): InternalRow = {
                val out = outProj(joined(lrow, g.rows(j)))
                numOutputRows.add(1)
                j -= 1
                ready = advance()
                out
              }
            }
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastRangeJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Plans the custom logical node; a no-op for everything else. */
object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case BroadcastRangeJoin(l, r, lk, rk, p, s, e) =>
      BroadcastRangeJoinExec(lk, rk, p, s, e, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Rewrites a plain `Inner` join whose condition carries a range predicate
  * (`p >= s AND p < e`, point side large, interval side under the broadcast
  * threshold) into [[BroadcastRangeJoin]] — so a user writing the natural
  * declarative join never hits BroadcastNestedLoopJoin. Conservative by
  * construction: fires only on deterministic conditions, supported bound
  * types, and a broadcast-sized build side; anything else is left for
  * Spark's own planner. Disable with `spark.graft.rangeJoin.enabled=false`.
  */
case class RangeJoinRewrite() extends Rule[LogicalPlan] with PredicateHelper {

  private def supported(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType | LongType | IntegerType | DateType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.rangeJoin.enabled", "true").toBoolean) return plan
    val threshold = conf.autoBroadcastJoinThreshold
    if (threshold <= 0) return plan
    plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), _) if cond.deterministic =>
        // Points may sit on either side; the interval (broadcast) side must
        // be under the threshold. The swapped orientation restores the
        // join's original column order with a Project.
        rewrite(j, l, r, cond, threshold, swapped = false)
          .orElse(rewrite(j, r, l, cond, threshold, swapped = true))
          .getOrElse(j)
    }
  }

  private def rewrite(
      j: Join, l: LogicalPlan, r: LogicalPlan, cond: Expression,
      threshold: Long, swapped: Boolean): Option[LogicalPlan] = {
    if (r.stats.sizeInBytes > threshold) return None
    val conjuncts = splitConjunctivePredicates(cond)

    def fromLeft(e: Expression) = e.references.subsetOf(l.outputSet)
    def fromRight(e: Expression) = e.references.subsetOf(r.outputSet)

    // point >= start (or start <= point)
    val lower = conjuncts.collectFirst {
      case c @ GreaterThanOrEqual(p, s) if fromLeft(p) && fromRight(s) && supported(p.dataType) => (c: Expression, p, s)
      case c @ LessThanOrEqual(s, p) if fromLeft(p) && fromRight(s) && supported(p.dataType) => (c: Expression, p, s)
    }
    lower.flatMap { case (lowC, p, s) =>
      // point < end (or end > point), same point expression
      val upper = conjuncts.collectFirst {
        case c @ LessThan(p2, e) if p2.semanticEquals(p) && fromRight(e) => (c: Expression, e)
        case c @ GreaterThan(e, p2) if p2.semanticEquals(p) && fromRight(e) => (c: Expression, e)
      }
      upper.map { case (upC, e) =>
        val rest = conjuncts.filterNot(c => c.eq(lowC) || c.eq(upC))
        val (equi, leftover) = rest.partition {
          case EqualTo(a, b) => (fromLeft(a) && fromRight(b)) || (fromLeft(b) && fromRight(a))
          case _ => false
        }
        val (lk, rk) = equi.map {
          case EqualTo(a, b) if fromLeft(a) => (a, b)
          case EqualTo(a, b) => (b, a)
        }.unzip
        val node = BroadcastRangeJoin(l, r, lk, rk, p, s, e)
        val base: LogicalPlan =
          if (leftover.isEmpty) node
          else Filter(leftover.reduce(org.apache.spark.sql.catalyst.expressions.And), node)
        if (swapped) Project(j.output, base) else base
      }
    }
  }
}

/** `SparkSessionExtensions` entry point: planner strategy + rewrite rule +
  * SQL registration of the engine's custom expressions. Wired into every
  * engine session by [[graft.Sessions]].
  */
object GraftExtensions {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => RangeJoinStrategy)
    e.injectOptimizerRule(_ => RangeJoinRewrite())
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_similarity"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_similarity(a, b) takes 2 arguments")
        CosineSimilarity(args.head, args(1))
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("hashed_shingles"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[HashedShingles].getName, "hashed_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "hashed_shingles(text, n) takes 2 arguments")
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"hashed_shingles n must be an integer literal, got $other")
        }
        HashedShingles(args.head, n)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("poly_token_hashes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[PolyTokenHashes].getName, "poly_token_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "poly_token_hashes(text) takes 1 argument")
        PolyTokenHashes(args.head)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("poly_string_hash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[PolyStringHash].getName, "poly_string_hash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "poly_string_hash(text) takes 1 argument")
        PolyStringHash(args.head)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("bottom_k"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[BottomKSketch].getName, "bottom_k"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "bottom_k(col, k) takes 2 arguments")
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"bottom_k k must be an integer literal, got $other")
        }
        BottomKSketch(args.head, k)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("hilbert_index"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[HilbertIndex].getName, "hilbert_index"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "hilbert_index(coords, bits) takes 2 arguments")
        val bits = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"hilbert_index bits must be an integer literal, got $other")
        }
        HilbertIndex(args.head, bits)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("morton_index"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MortonIndex].getName, "morton_index"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "morton_index(coords, bits) takes 2 arguments")
        val bits = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"morton_index bits must be an integer literal, got $other")
        }
        MortonIndex(args.head, bits)
      }))
  }
}

/** Programmatic surface mirroring [[graft.operators.RangeJoin.pointInInterval]]
  * but planning through the native operator (no bucketization, no explode).
  */
object NativeRangeJoin {
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointKeys: Seq[String],
      intervalKeys: Seq[String],
      pointTime: String,
      intervalStart: String,
      intervalEnd: String): DataFrame = {
    require(pointKeys.length == intervalKeys.length)
    val spark: SparkSession = points.sparkSession
    val lp = PlanBridge.analyzed(points)
    val rp = PlanBridge.analyzed(intervals)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not in ${p.output.map(_.name)}"))
    val lk = pointKeys.map(attr(lp, _))
    val rk = intervalKeys.map { n =>
      val a = attr(rp, n); a: Expression
    }
    // Align key types the way the analyzer would for an equi-join.
    val rkCast = lk.zip(rk).map { case (a, b) =>
      if (a.dataType == b.dataType) b else Cast(b, a.dataType)
    }
    PlanBridge.ofRows(spark, BroadcastRangeJoin(
      lp, rp, lk, rkCast,
      attr(lp, pointTime), attr(rp, intervalStart), attr(rp, intervalEnd)))
  }
}
