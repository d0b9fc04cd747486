package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal/point-in-time) join: each left record picks up the latest
  * right record with `rightTs <= leftTs` for the same key — the versioned-
  * KTable / stream⋈temporal-table enrichment semantics (what a changelog
  * join means when the dimension has history, not just a current snapshot).
  *
  * Implementation is the scalable union form, not a range join:
  * tag both sides, union, then one `partitionBy(key) orderBy(ts, side)`
  * window with `last(value, ignoreNulls)` carries the most recent right
  * payload forward onto each left row. Exactly ONE shuffle+sort by key —
  * a per-key merge — versus the O(left × right-versions) blowup of the
  * naive `leftTs >= rightTs` theta-join + argmax. Right rows sort before
  * left rows on ts ties (side 0 < 1), so a same-timestamp update is
  * visible to the event at that timestamp (ASOF >= semantics).
  */
object AsOfJoin {

  /** @param left      stream side
    * @param right     versioned (changelog) side
    * @param key       equi-key column name present on both sides
    * @param leftTs    event-time column on left
    * @param rightTs   version-time column on right
    * @param payload   right columns to carry onto left rows (renamed as given)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, leftTs: String,
      rightTs: String, payload: Map[String, String]): DataFrame =
    asOfImpl(left, right, key, leftTs, rightTs, payload, forward = false)

  /** Shared union-merge core for both directions. The carried value is a
    * STRUCT of the right row's payload fields, non-null for every right row
    * even when the payload fields themselves are null — `last(ignoreNulls)`
    * over bare payload columns would skip a matched right row with a null
    * payload and surface a farther row's value instead (diverging from ASOF
    * semantics and the DuckDB oracle, which return the nearest row's null).
    */
  private def asOfImpl(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Map[String, String],
      forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(
      payload.map { case (src, out) => col(src).as(out) }.toSeq: _*)
    val nullStruct = lit(null).cast(
      org.apache.spark.sql.types.StructType(payload.map { case (src, out) =>
        org.apache.spark.sql.types.StructField(out, right.schema(src).dataType)
      }.toSeq))
    val taggedLeft = left
      .withColumn("__side", lit(1))
      .withColumn("__ts", col(leftTs))
      .select(Seq(col("__side"), col("__ts"), col(key).as("__key")) ++
        leftCols.map(col) :+ nullStruct.as("__p"): _*)
    val taggedRight = right
      .withColumn("__side", lit(0))
      .withColumn("__ts", col(rightTs))
      .select(Seq(col("__side"), col("__ts"), col(key).as("__key")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        payloadStruct.as("__p"): _*)
    val unioned = taggedLeft.unionByName(taggedRight)
    val tsOrd = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(col("__key"))
      .orderBy(tsOrd, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.values.toSeq.map(o => col(s"__m.$o").as(o)): _*)
  }

  /** Forward as-of join: each left record picks up the EARLIEST right record
    * with `rightTs >= leftTs` for the same key — the "next event after"
    * lookup (funnel conversion, next price tick, SLA response matching).
    * Same union-merge shape as [[asOf]] with the walk reversed: the window
    * descends through time carrying the nearest FUTURE right payload back
    * onto each left row; right still sorts before left on ts ties, so a
    * same-timestamp right row matches (>= semantics). One shuffle+sort.
    *
    * Determinism note: if the right side can hold several rows at the same
    * (key, ts), pre-aggregate them first — ordering among exact duplicates
    * inside the window is not defined.
    */
  def asOfForward(left: DataFrame, right: DataFrame, key: String, leftTs: String,
      rightTs: String, payload: Map[String, String]): DataFrame =
    asOfImpl(left, right, key, leftTs, rightTs, payload, forward = true)

  /** Stream-static as-of: the same temporal semantics as [[asOf]] /
    * [[asOfForward]] when the RIGHT side is a static versioned snapshot
    * (e.g. the parquet store a startSnapshotSink maintains keyed by
    * (key, versionTs)) and the LEFT side may be an unbounded stream.
    *
    * The union-window merge is not streaming-legal (it sorts over both
    * full histories), so this form restructures: ONE batch aggregation
    * packs the dimension into a per-key ts-sorted version array, the
    * stream equi-joins it (a plain stream-static left join — stateless,
    * any output mode), and a codegen'd `filter` + `get` picks the latest
    * version at-or-before each record's time (earliest at-or-after for
    * `forward`) — same inclusive-tie semantics as the window form (right
    * row at ts == left ts matches). Works on batch left frames too and
    * returns identical rows to [[asOf]]; use it whenever the dimension is
    * snapshot-shaped.
    *
    * Scale posture: state-free (the only shuffle is the equi-join, and
    * Spark broadcasts the packed dim when small). Each key's FULL version
    * history must fit in one row — true for dimension changelogs (versions
    * per key is bounded by update frequency), NOT for event-shaped right
    * sides; those belong in the batch union-window form.
    */
  def asOfSnapshot(left: DataFrame, right: DataFrame, key: String, leftTs: String,
      rightTs: String, payload: Map[String, String],
      forward: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    val versions = right.groupBy(col(key).as("__vk"))
      .agg(sort_array(collect_list(struct(
        col(rightTs).as("__vts"),
        struct(payload.map { case (src, out) => col(src).as(out) }.toSeq: _*)
          .as("__vp")))).as("__vers"))
    // NULL-SAFE equality: asOf's Window.partitionBy groups null keys into
    // one partition, so null-keyed left rows DO pick up null-keyed
    // versions there — a plain === here would silently diverge from the
    // documented row-identity. <=> is a valid hash-join key (Spark plans
    // it as BroadcastHashJoin/SMJ, not a nested loop).
    val joined = left.join(versions, left(key) <=> versions("__vk"), "left")
    // the version array is ts-ASCENDING (sort_array on a struct orders by
    // its first field); inclusive bounds match the window form's tie rule
    val eligible =
      if (forward) filter(col("__vers"), v => v.getItem("__vts") >= col(leftTs))
      else filter(col("__vers"), v => v.getItem("__vts") <= col(leftTs))
    // get() (0-based, null out of bounds) rather than element_at: ANSI mode
    // makes element_at THROW on an empty filter result, and "no version
    // yet" must be a null payload, not a query error
    val hit =
      if (forward) get(eligible, lit(0))
      else get(eligible, size(eligible) - 1)
    joined.withColumn("__hit", hit)
      .select(leftCols.map(col) ++
        payload.values.toSeq.map(o => col(s"__hit.__vp.$o").as(o)): _*)
  }

  /** Fixed-interval resampling with forward fill (time-series gap filling):
    * for each key, a grid of `interval`-spaced timestamps spans
    * [epoch-aligned bucket of its first observation, its last observation],
    * and each grid point carries the latest observation at-or-before it —
    * null until the key's first observation lands (the leading grid point
    * sits at its bucket's START). Grid generation is one per-key aggregate
    * plus a map-side `sequence` explode — the grid never exceeds
    * span/interval rows per key — and the fill reuses [[asOf]]'s
    * single-shuffle union-window merge, so the whole operator is two
    * exchanges regardless of scale. Epoch-aligned buckets match DuckDB/
    * TimescaleDB `time_bucket` for month-free intervals.
    *
    * Ties: multiple observations sharing (key, ts) make "the" carried
    * value ambiguous — pre-reduce to one row per (key, ts) first if inputs
    * can collide (the x20 query does).
    */
  def resample(df: DataFrame, key: String, tsCol: String,
      valueCols: Seq[String], interval: String,
      maxGridRowsPerKey: Long = 0L): DataFrame = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(interval))
    require(iv != null && iv.months == 0,
      s"unparseable or month-based resample interval '$interval'")
    val micros = iv.days * 86_400_000_000L + iv.microseconds
    require(micros > 0, s"resample interval '$interval' must be positive")
    val secs = micros / 1_000_000L
    require(secs * 1_000_000L == micros,
      s"resample interval '$interval' must be whole seconds")
    // with the guard on, the bounds aggregate gets TWO actions (the guard
    // head() now, the grid explode later) — persist it so the guard's cost
    // really is one pass over |keys| bounds rows, not a second full input
    // scan+shuffle (registered for the shared release hook like every
    // operator-internal cache)
    val bounds0 = df.groupBy(col(key))
      .agg(min(col(tsCol)).as("__min"), max(col(tsCol)).as("__max"))
    val bounds =
      if (maxGridRowsPerKey > 0L)
        Dedup.registerCache(bounds0.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      else bounds0
    // DENSE-GRID GUARD (declared, 0 = unguarded): output volume is
    // Σ_keys (span/every) — a mis-declared `every` against a long-span key
    // silently multiplies output by orders of magnitude (the x20 scaling
    // row is output-bound for exactly this reason). When a bound is
    // declared, fail LOUDLY before exploding, naming the densest key's
    // grid size and the sizing formula. Costs one extra pass over the
    // per-key bounds (|keys| rows), not over the data.
    if (maxGridRowsPerKey > 0L) {
      val worst = bounds.select(
        max(expr(s"floor((unix_timestamp(__max) - " +
          s"floor(unix_timestamp(__min) / $secs) * $secs) / $secs) + 1")
          .cast("long")).as("g")).head()
      val worstGrid = if (worst.isNullAt(0)) 0L else worst.getLong(0)
      require(worstGrid <= maxGridRowsPerKey,
        s"resample grid for the densest key would be $worstGrid rows " +
          s"(ceil(span / every) with every = '$interval'), exceeding the " +
          s"declared maxGridRowsPerKey = $maxGridRowsPerKey; total output " +
          "is SUM over keys of span/every — widen `every`, shorten the " +
          "span (filter first), or raise the declared bound")
    }
    val grid = bounds
      .select(col(key), explode(expr(
        s"sequence(timestamp_seconds(floor(unix_timestamp(__min) / $secs) * $secs), " +
          s"__max, interval $secs seconds)")).as("grid_ts"))
    asOf(grid, df, key, "grid_ts", tsCol,
      valueCols.map(c => c -> c).toMap)
  }
}
