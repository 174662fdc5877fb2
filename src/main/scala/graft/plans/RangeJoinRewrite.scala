package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: rewrite a declarative interval-containment join —
  * `probe JOIN intervals ON ts >= start AND ts < end` with no equi key —
  * into the bucketed equi-join of `JoinOps.rangeJoinBucketed`, at the
  * LOGICAL PLAN level, so a user who writes the natural non-equi join
  * gets the scalable plan without knowing the trick exists.
  *
  * Without this rule Spark's only strategies for the shape are
  * BroadcastNestedLoopJoin (O(|probe|·|intervals|) comparisons, and only
  * while one side still fits in a broadcast) or a cartesian product. The
  * rewrite adds a `__bucket = unix_micros div width` column to the ts
  * side, explodes each interval to the buckets its half-open span
  * touches (guarded by `end > start`, which also keeps the sequence
  * ascending), joins bucket-to-bucket, and keeps the ORIGINAL predicate
  * as the residual filter — every true pair meets exactly once (a probe
  * row has one bucket), so output equality with the naive join is
  * structural, not probabilistic.
  *
  * Activation, narrowest first:
  *
  *  1. per-JOIN: a [[RangeJoinRewrite.WidthTag]] on the logical `Join`
  *     node (set by the owner of that plan, e.g. q64b) — scoped to that
  *     one join, invisible to every other query in the session;
  *  2. per-SESSION: `spark.conf.set(BucketSecondsKey, "300")` — applies
  *     to every matching join until unset. Off when unset, <= 0, or
  *     unparseable (a malformed value logs a warning and disables the
  *     rule rather than failing every query in the session).
  *
  * A rewritten interval explodes to `span/width` bucket rows, so a
  * misconfigured width (say 1s buckets against year-long intervals)
  * could quietly multiply the interval side 10^7-fold. The generated
  * sequence is therefore capped: any interval spanning more than
  * [[RangeJoinRewrite.MaxBucketsKey]] buckets (default
  * [[RangeJoinRewrite.DefaultMaxBuckets]]) raises a clear error at
  * execution instead of OOMing the shuffle.
  *
  * Registered either per-session at build time
  * (`SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`) or at
  * runtime via `spark.experimental.extraOptimizations`. The matched
  * pattern is deliberately exact — inner join, a conjunction of one
  * lower and one upper timestamp bound on the same expression, bounds
  * from the opposite side, no other conjuncts — anything else (an extra
  * equi key, outer joins) is a shape Spark already executes well, and
  * rewriting it would risk changing semantics.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val BucketSecondsKey = "spark.graft.rangeJoin.bucketSeconds"
  val MaxBucketsKey = "spark.graft.rangeJoin.maxBucketsPerInterval"
  val DefaultMaxBuckets = 65536L

  /** Set on a logical `Join` node to opt THAT join into the rewrite at
    * the given bucket width, regardless of the session conf. Catalyst
    * copies node tags through `withNewChildren`/`makeCopy`, so the tag
    * survives the optimizer batches that run before this rule.
    */
  val WidthTag: TreeNodeTag[Long] =
    TreeNodeTag[Long]("graft.rangeJoin.bucketSeconds")

  private def confLong(key: String, default: Long): Long = {
    val raw = SQLConf.get.getConfString(key, default.toString)
    raw.toLongOption.getOrElse {
      logWarning(s"$key='$raw' is not a long — treating as $default")
      default
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val sessionSeconds = confLong(BucketSecondsKey, 0L)
    val maxBuckets = math.max(1L, confLong(MaxBucketsKey, DefaultMaxBuckets))
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val seconds = j.getTagValue(WidthTag).getOrElse(sessionSeconds)
        if (seconds <= 0) j
        else rewrite(j, left, right, cond, hint, seconds, maxBuckets)
          .getOrElse(j)
    }
  }

  /** (ts, lower-bound) of `e` when it is a lower bound, either spelling. */
  private def asLower(e: Expression): Option[(Expression, Expression)] =
    e match {
      case GreaterThanOrEqual(ts, lo) => Some((ts, lo))
      case LessThanOrEqual(lo, ts) => Some((ts, lo))
      case _ => None
    }

  /** (ts, upper-bound) of `e` when it is a strict upper bound. */
  private def asUpper(e: Expression): Option[(Expression, Expression)] =
    e match {
      case LessThan(ts, hi) => Some((ts, hi))
      case GreaterThan(hi, ts) => Some((ts, hi))
      case _ => None
    }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, hint: JoinHint,
                      seconds: Long, maxBuckets: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.size != 2) return None
    val bounds = (asLower(conjuncts(0)), asUpper(conjuncts(1))) match {
      case (Some(lo), Some(hi)) => Some((lo, hi))
      case _ => (asLower(conjuncts(1)), asUpper(conjuncts(0))) match {
        case (Some(lo), Some(hi)) => Some((lo, hi))
        case _ => None
      }
    }
    bounds.flatMap { case ((ts, start), (ts2, end)) =>
      val allTimestamps = Seq(ts, start, end)
        .forall(_.dataType.isInstanceOf[TimestampType.type])
      if (!ts.semanticEquals(ts2) || !allTimestamps) None
      else {
        // which side carries the probe timestamp, which the interval?
        val sides = if (ts.references.subsetOf(left.outputSet) &&
            (start.references ++ end.references).subsetOf(right.outputSet))
          Some((left, right))
        else if (ts.references.subsetOf(right.outputSet) &&
            (start.references ++ end.references).subsetOf(left.outputSet))
          Some((right, left))
        else None
        sides.map { case (probe, intervals) =>
          val w = Literal(seconds * 1000000L)
          def bucketOf(e: Expression): Expression =
            IntegralDivide(UnixMicros(e), w)
          val probeBucket =
            Alias(bucketOf(ts), "__graft_bucket")()
          val probeProj = Project(probe.output :+ probeBucket, probe)
          val ivBucket = AttributeReference("__graft_iv_bucket", LongType)()
          // Sequence is TimeZoneAwareExpression: without an explicit zone
          // it stays unresolved, and the optimizer never re-runs
          // ResolveTimeZone — set it here (unused for a Long sequence)
          val startB = bucketOf(start)
          val endB =
            IntegralDivide(Subtract(UnixMicros(end), Literal(1L)), w)
          val seq = new Sequence(startB, endB,
            None, Some(conf.sessionLocalTimeZone))
          // explosion guard: a span/width ratio past the cap raises a
          // clear error instead of materializing millions of bucket rows
          val guarded = If(
            LessThan(Subtract(endB, startB), Literal(maxBuckets)),
            seq,
            Cast(new RaiseError(Literal(
              s"RangeJoinRewrite: interval spans more than $maxBuckets " +
                s"buckets at width ${seconds}s — raise $BucketSecondsKey " +
                s"or $MaxBucketsKey")), seq.dataType))
          val gen = Generate(
            Explode(guarded),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(ivBucket),
            Filter(GreaterThan(end, start), intervals))
          val bucketed = Join(probeProj, gen, Inner,
            Some(And(EqualTo(probeBucket.toAttribute, ivBucket), cond)),
            hint)
          Project(j.output, bucketed)
        }
      }
    }
  }
}

/** `spark.sql.extensions` entry point: registers [[RangeJoinRewrite]] and
  * the native graft functions (`cosine_sim`, `poly_char_hash`, `int_dot`,
  * `bpe_encode`, `phash64`, `nfc_normalize`) into every session built
  * over the extensions,
  * e.g.
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RangeJoinRewrite)
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[graft.functions.CosineSim].getName, "cosine_sim"),
      exprs => graft.functions.CosineSim(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("poly_char_hash"),
      new ExpressionInfo(classOf[graft.functions.PolyCharHash].getName, "poly_char_hash"),
      exprs => graft.functions.PolyCharHash(exprs.head)))
    ext.injectFunction((FunctionIdentifier("content_key64"),
      new ExpressionInfo(classOf[graft.functions.ContentKey64].getName, "content_key64"),
      exprs => graft.functions.ContentKey64(exprs.head)))
    ext.injectFunction((FunctionIdentifier("int_dot"),
      new ExpressionInfo(classOf[graft.functions.IntDot].getName, "int_dot"),
      exprs => graft.functions.IntDot(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("bpe_encode"),
      new ExpressionInfo(classOf[graft.functions.BpeEncode].getName, "bpe_encode"),
      exprs => graft.functions.BpeEncode(exprs.head)))
    ext.injectFunction((FunctionIdentifier("phash64"),
      new ExpressionInfo(classOf[graft.functions.PHash64].getName, "phash64"),
      exprs => graft.functions.PHash64(exprs.head)))
    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[graft.functions.NfcNormalize].getName, "nfc_normalize"),
      exprs => graft.functions.NfcNormalize(exprs.head)))
    ext.injectFunction((FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[graft.functions.StripAccents].getName, "strip_accents"),
      exprs => graft.functions.StripAccents(exprs.head)))
  }
}
