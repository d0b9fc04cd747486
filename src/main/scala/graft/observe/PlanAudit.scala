package graft.observe

import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BinaryComparison, Expression, In, Literal, StartsWith}
import org.apache.spark.sql.execution.{ColumnarToRowExec, ExpandExec, FileSourceScanExec, FilterExec, GenerateExec, InputAdapter, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Automated plan-hygiene audit: walks a query's physical plan and flags
  * the shapes that break at 100 TB — the same rules PlanSpec pins by hand
  * for representative queries, generalized so EVERY query in the registry
  * is continuously checked (ObserveSpec sweeps `Queries.all`), and so a
  * production pipeline can assert hygiene on its own plans before burning
  * a 1000-executor run:
  *
  *  - `nested_loop_join` (warn): `CartesianProduct` / `BroadcastNestedLoopJoin`
  *    — O(n·m) compare work; fine only for the intentional
  *    corpus × broadcast-tiny-side scans (whitelist those by rule).
  *  - `unpushed_filter` (warn): a Filter directly above a parquet scan
  *    carrying at least one pushable-shaped predicate (attribute vs
  *    literal comparison / IN / prefix) while the scan's `PushedFilters`
  *    is empty — the scan reads every row group for a filter parquet
  *    statistics could have skipped. Predicates parquet genuinely cannot
  *    push (UDF-shaped, computed columns, nested types) don't trigger it.
  *  - `broadcastable_shuffle_join` (warn): a shuffle join (sort-merge or
  *    shuffled-hash) whose one side reads ≤ the session's
  *    autoBroadcastJoinThreshold of source data while the other side reads
  *    ≥ 16× more — the forgotten-broadcast-dim regression: both sides pay
  *    an exchange where a broadcast would have shuffled nothing. Sides
  *    whose size cannot be proven from leaf parquet scans (cached /
  *    checkpointed inputs) or that contain row-multiplying operators
  *    (joins, explode, Expand) are skipped — aggregation/filter/projection
  *    only ever shrink a side, so the leaf bound stays an upper bound.
  *  - `exchanges` / `leaf_scan_bytes` (info): shuffle count and total
  *    source bytes — the two numbers to sanity-check against cluster size
  *    before a large run.
  *
  * The audit inspects the pre-execution plan (under AQE, the initial plan
  * inside `AdaptiveSparkPlanExec` — shuffles AQE later coalesces still
  * count, which is the conservative direction for a pre-flight check).
  */
object PlanAudit {

  final case class Finding(severity: String, rule: String, detail: String) {
    // detail embeds expression SQL, which can carry control chars via
    // exotic column names — the shared escaper covers them
    def toJson: String =
      s"""{"severity":"$severity","rule":"$rule","detail":${
        graft.JsonText.quote(detail)}}"""
  }

  /** Every node in the plan, descending through AQE wrappers and subquery
    * plans (scalar subqueries hide joins — q11's corpus-average cross).
    * The AQE wrapper descends into `executedPlan` (the CURRENT physical
    * plan: before execution that is the initial plan, with
    * EnsureRequirements already applied) — NOT `inputPlan`, which predates
    * exchange insertion and would make every shuffle invisible to the
    * audit.
    */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val extra = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _ => Nil
    }
    val subs = try p.subqueries catch { case _: Throwable => Nil }
    Seq(p) ++ (p.children ++ extra ++ subs.map(_.asInstanceOf[SparkPlan]))
      .flatMap(nodes)
  }

  /** Strip the execution-only wrappers between a Filter and its scan. */
  @annotation.tailrec
  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case w: WholeStageCodegenExec => unwrap(w.child)
    case i: InputAdapter => unwrap(i.child)
    case c: ColumnarToRowExec => unwrap(c.child)
    case other => other
  }

  private def isPushableShape(cond: Expression, scanOut: Set[Long]): Boolean = {
    def atomicScanAttr(e: Expression): Boolean = e match {
      case a: AttributeReference if scanOut.contains(a.exprId.id) =>
        a.dataType match {
          case _: ArrayType | _: MapType | _: StructType => false
          case _ => true
        }
      case _ => false
    }
    cond.exists {
      case c: BinaryComparison =>
        (atomicScanAttr(c.left) && c.right.isInstanceOf[Literal]) ||
          (atomicScanAttr(c.right) && c.left.isInstanceOf[Literal])
      case In(a, list) => atomicScanAttr(a) && list.forall(_.isInstanceOf[Literal])
      case StartsWith(a, _: Literal) => atomicScanAttr(a)
      case _ => false
    }
  }

  /** Upper bound on a subtree's input from leaf parquet scans; None when a
    * leaf's size is unknowable (cached/RDD-backed) or the subtree can
    * multiply rows (join/explode/Expand), so the bound would be a lie.
    */
  private def provenLeafBytes(side: SparkPlan): Option[Long] = {
    val all = nodes(side)
    val multiplies = all.exists {
      case _: BaseJoinExec | _: CartesianProductExec | _: GenerateExec |
          _: ExpandExec => true
      case _ => false
    }
    val leaves = all.filter(_.children.isEmpty)
    val sizes = leaves.map {
      case s: FileSourceScanExec => Some(s.relation.location.sizeInBytes)
      case _ => None // cached / ExistingRDD / range — size unprovable here
    }
    if (multiplies || sizes.exists(_.isEmpty)) None else Some(sizes.flatten.sum)
  }

  def audit(df: DataFrame): Seq[Finding] = {
    val plan = df.queryExecution.executedPlan
    val all = nodes(plan)
    val threshold = JavaUtils.byteStringAsBytes(
      df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB"))

    val nested = all.collect {
      case j: BroadcastNestedLoopJoinExec =>
        Finding("warn", "nested_loop_join",
          s"BroadcastNestedLoopJoin ${j.joinType} on ${j.condition.map(_.sql).getOrElse("true")}")
      case _: CartesianProductExec =>
        Finding("warn", "nested_loop_join", "CartesianProduct")
    }

    // `PushedFilters` metadata reflects filter TRANSLATION only — the conf
    // that governs whether the reader APPLIES them is consulted at scan
    // time, so an audit that trusted the metadata alone would pass a
    // session where someone disabled pushdown (verified: the metadata is
    // identical either way). Check both legs.
    def pushdownConf(s: FileSourceScanExec): Option[String] = {
      val fmt = s.relation.fileFormat.toString.toLowerCase
      val conf =
        if (fmt.contains("parquet")) Some("spark.sql.parquet.filterPushdown")
        else if (fmt.contains("orc")) Some("spark.sql.orc.filterPushdown")
        else if (fmt.contains("csv")) Some("spark.sql.csv.filterPushdown.enabled")
        else if (fmt.contains("json")) Some("spark.sql.json.filterPushdown.enabled")
        else None
      conf.filterNot(c => df.sparkSession.conf.get(c, "true").toBoolean)
    }
    val unpushed = all.collect {
      case f: FilterExec => (f, unwrap(f.child))
    }.collect {
      case (f, s: FileSourceScanExec)
          if isPushableShape(f.condition, s.output.map(_.exprId.id).toSet) &&
            (s.metadata.get("PushedFilters").contains("[]") ||
              pushdownConf(s).isDefined) =>
        val why = pushdownConf(s)
          .map(c => s"pushdown disabled by $c=false")
          .getOrElse("no predicate translated")
        Finding("warn", "unpushed_filter",
          s"filter '${f.condition.sql.take(120)}' not pushed into scan of " +
            s.relation.location.rootPaths.headOption.map(_.getName).getOrElse("?") +
            s" ($why)")
    }

    val shuffleJoins = all.collect {
      case j: SortMergeJoinExec => j: BaseJoinExec
      case j: ShuffledHashJoinExec => j: BaseJoinExec
    }
    val notBroadcast = shuffleJoins.flatMap { j =>
      // a side is only worth flagging if the join TYPE permits building the
      // hash side there: full outer can't broadcast at all; an outer side
      // that must stream unmatched rows can't be the build side
      import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
      val canBuild: Map[String, Boolean] = j.joinType match {
        case Inner | Cross => Map("left" -> true, "right" -> true)
        case LeftOuter | LeftSemi | LeftAnti => Map("left" -> false, "right" -> true)
        case RightOuter => Map("left" -> true, "right" -> false)
        case _ => Map("left" -> false, "right" -> false) // full outer, existence
      }
      val sides = Seq("left" -> j.left, "right" -> j.right)
        .map { case (n, s) => (n, provenLeafBytes(s)) }
      sides.combinations(2).flatMap { case Seq((n1, b1), (n2, b2)) =>
        def flag(smallName: String, small: Long, bigName: String, big: Long) =
          if (threshold > 0 && small > 0 && small <= threshold &&
            big >= 16 * small && canBuild(smallName))
            Some(Finding("warn", "broadcastable_shuffle_join",
              s"${j.nodeName} (${j.joinType}): $smallName side reads ~$small bytes " +
                s"(≤ broadcast threshold $threshold) vs $bigName ~$big — " +
                "broadcast the small side"))
          else None
        (b1, b2) match {
          case (Some(x1), Some(x2)) if x1 <= x2 => flag(n1, x1, n2, x2)
          case (Some(x1), Some(x2)) => flag(n2, x2, n1, x1)
          case _ => None
        }
      }
    }

    val nExchanges = all.count(_.isInstanceOf[ShuffleExchangeExec])
    val leafBytes = all.collect { case s: FileSourceScanExec =>
      s.relation.location.sizeInBytes }.sum
    val info = Seq(
      Finding("info", "exchanges", nExchanges.toString),
      Finding("info", "leaf_scan_bytes", leafBytes.toString))

    nested ++ unpushed ++ notBroadcast ++ info
  }

  def warns(df: DataFrame): Seq[Finding] =
    audit(df).filter(_.severity == "warn")
}
