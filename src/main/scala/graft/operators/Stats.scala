package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Grouped statistics with engine-independent numerics — the analytics
 * staples a 100 TB curation pipeline reaches for between the heavy
 * operators (reference analog: the summary statistics the NSForest and
 * annotation writers emit per cluster, `NSForestResultsWriter.py`
 * aggregation blocks).
 *
 * The float-gate recipe throughout: every aggregation is carried in
 * exact arithmetic (BIGINT / DECIMAL(38,0) moments — associative, so
 * any partial-aggregation plan produces identical values), and each
 * IEEE double is produced by ONE fixed final expression. Rank
 * selections use the "lower value" (inverted-CDF) definition so no
 * interpolation arithmetic exists to diverge.
 *
 * Scale: every operator here is a single groupBy/window plan — partial
 * aggregation on the map side, one shuffle on the group keys, no
 * collect, no iteration. Window functions partition on the group key,
 * so skew follows key cardinality (callers group on low-skew keys or
 * pre-salt).
 */
object Stats {

  /** Exact per-key quartiles by rank selection (inverted CDF / type-1
    * "lower" quantile): the element at 1-based sorted position
    * floor((n-1)·q/4)+1. Selected VALUES are order-independent under
    * ties (the sorted multiset is unique), so no tie-break key is
    * needed and both engines pick the same element exactly.
    *
    * One window sort per key partition + one groupBy — two shuffles on
    * the same key, no interpolation arithmetic. */
  def exactQuartiles(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(valueCol))
    val ranked = df
      .select(col(keyCol), col(valueCol))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(keyCol))))
    // `div` is integral division (Column./ on longs is IEEE division)
    def pos(q: Int): Column = expr(s"((__n - 1) * $q) div 4 + 1")
    ranked
      .filter(col("__rn") === pos(1) || col("__rn") === pos(2) ||
        col("__rn") === pos(3))
      .groupBy(col(keyCol))
      .agg(
        max(when(col("__rn") === pos(1), col(valueCol))).as("p25"),
        max(when(col("__rn") === pos(2), col(valueCol))).as("p50"),
        max(when(col("__rn") === pos(3), col(valueCol))).as("p75"),
        max(col("__n")).as("n"))
  }

  /** Per-key ordinary-least-squares y = slope·x + intercept over two
    * integral columns. Moments (n, Σx, Σy, Σxy, Σx²) are exact
    * DECIMAL(38,0) sums; numerator n·Σxy − Σx·Σy and denominator
    * n·Σx² − (Σx)² stay exact (callers keep |moments| < ~1e18 so the
    * products fit 38 digits); slope/intercept are each ONE fixed final
    * double expression. Keys with a degenerate x spread (den = 0) are
    * dropped rather than emitting ±Inf. */
  def groupedLinReg(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val x = col(xCol).cast(d38)
    val y = col(yCol).cast(d38)
    df.groupBy(col(keyCol))
      .agg(
        count(lit(1)).cast(d38).as("__n"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * y).as("__sxy"), sum(x * x).as("__sxx"))
      .withColumn("__num", col("__n") * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__den", col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .filter(col("__den") =!= 0)
      .select(
        col(keyCol),
        col("__n").cast("long").as("n"),
        (col("__num").cast("double") / col("__den").cast("double")).as("slope"),
        ((col("__sy").cast("double") -
          (col("__num").cast("double") / col("__den").cast("double")) *
            col("__sx").cast("double")) / col("__n").cast("double"))
          .as("intercept"))
  }

  /** Per-key mode with a deterministic tie-break (highest count, then
    * smallest value). Two-level aggregation: the (key, value) count is
    * map-side combined before the window picks one row per key, so the
    * window partition size is the per-key DISTINCT value count, not
    * the raw row count — skew-safe for low-cardinality value domains. */
  def modePerKey(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol), col(valueCol))
      .agg(count(lit(1)).as("n_mode"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("n_mode").desc, col(valueCol))
    counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .withColumnRenamed(valueCol, "mode")
  }

  /** Gaps-and-islands over integral day numbers: maximal runs of
    * consecutive distinct days per key. The island id day − row_number
    * is constant within a run (classic Tabibito trick); one distinct +
    * one window + one groupBy, all on the same key. */
  def dayStreaks(df: DataFrame, keyCol: String, dayCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
    df.select(col(keyCol), col(dayCol)).distinct()
      .withColumn("__grp", col(dayCol) - row_number().over(w))
      .groupBy(col(keyCol), col("__grp"))
      .agg(min(col(dayCol)).as("start_day"), max(col(dayCol)).as("end_day"),
        count(lit(1)).as("len"))
      .drop("__grp")
  }

  /** Per-key lag-1 serial (Pearson) autocorrelation of an integral
    * series under a caller-supplied total order. Adjacent pairs come
    * from one lag window; the correlation uses the same exact-moment
    * recipe as [[groupedLinReg]] with the single fixed final
    * expression num / sqrt(denx · deny). Degenerate keys (fewer than
    * 2 pairs or a zero-variance side) are dropped. */
  def lag1Autocorr(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val pairs = df
      .withColumn("__prev", lag(col(valueCol), 1).over(w))
      .filter(col("__prev").isNotNull)
    val x = col("__prev").cast(d38)
    val y = col(valueCol).cast(d38)
    pairs.groupBy(col(keyCol))
      .agg(
        count(lit(1)).cast(d38).as("__n"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * y).as("__sxy"), sum(x * x).as("__sxx"),
        sum(y * y).as("__syy"))
      .withColumn("__num", col("__n") * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__dx", col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("__dy", col("__n") * col("__syy") - col("__sy") * col("__sy"))
      .filter(col("__dx") > 0 && col("__dy") > 0)
      .select(
        col(keyCol),
        col("__n").cast("long").as("n_pairs"),
        (col("__num").cast("double") /
          sqrt(col("__dx").cast("double") * col("__dy").cast("double")))
          .as("autocorr"))
  }
}
