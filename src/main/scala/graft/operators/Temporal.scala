package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively, composed from shuffle-once
  * primitives (the "(a) compose existing ops" tier — no custom physical
  * plan needed, and Catalyst keeps optimizing around them).
  */
object Temporal {

  /** As-of join: for every left row, attach the value columns of the most
    * recent right row with the same key and `rightTime <= leftTime`
    * (inclusive). Left rows with no prior right row get nulls.
    *
    * Implementation is the union-window trick: tag sides, union, and run
    * `last(value, ignoreNulls)` over a (key)-partitioned window ordered by
    * (time, side) — right rows sort before left rows at equal timestamps,
    * which gives the inclusive bound. ONE shuffle on the key (the same
    * exchange a plain equi-join would pay) and no range explosion, so it
    * scales to arbitrarily large fact/quote tables; per-key state is a
    * sort, which Spark spills if a key is enormous.
    *
    * Right (key, time) pairs should be unique (pre-aggregate otherwise);
    * with duplicates the attached values follow the window order within
    * the tie, which is nondeterministic.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
               valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "asofJoin: valueCols must be non-empty")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(valueCols.contains),
      s"asofJoin: value columns ${valueCols.mkString(",")} collide with left")
    // align schemas: left rows carry null values, right rows carry null
    // left-payload; __side orders right (0) before left (1) at equal time.
    // Right rows with a null time OR null key must match NOTHING (the join
    // predicate `r.key = l.key AND r.time <= l.time` is never true for
    // null) — unfiltered they'd sort nulls-first and leak into left rows
    // with no real prior match. Left null-key/null-time rows land in a
    // partition/prefix with no surviving right rows and get nulls, which
    // matches join semantics.
    val l = left.withColumn("__side", lit(1))
      .withColumns(valueCols.map(c => c -> lit(null)).toMap)
    val r0 = right.select((Seq(key, time) ++ valueCols).map(col): _*)
      .filter(col(time).isNotNull && col(key).isNotNull)
      .withColumn("__side", lit(0))
    val r = leftCols.filterNot(Seq(key, time).contains)
      .foldLeft(r0)((df, c) => df.withColumn(c, lit(null)))
      .select(l.columns.map(col).toSeq: _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the attached row is the most recent right ROW, not the most recent
    // non-null field: values ride in one struct that is non-null exactly
    // for right rows, so a null value on the latest quote stays null
    // instead of falling back to a stale older quote
    val packed = when(col("__side") === 0, struct(valueCols.map(col): _*))
    val joined = l.unionByName(r)
      .withColumn("__pack", last(packed, ignoreNulls = true).over(w))
    valueCols.foldLeft(joined)((df, c) =>
        df.withColumn(c, col("__pack").getField(c)))
      .filter(col("__side") === 1)
      .drop("__side", "__pack")
  }

  /** Range join: all (point, interval) pairs with
    * `start <= point <= end` (inclusive), without an equi key.
    *
    * A naive formulation is a broadcast-nested-loop / cartesian — the
    * classic scale-killer. This one bins time into `binSeconds` buckets:
    * each point maps to ONE bin, each interval explodes to the bins it
    * covers, and the join becomes an equi-join on the bin id followed by
    * the exact range filter. Shuffle volume ∝ rows × (interval span /
    * binSeconds); pick binSeconds near the typical interval length.
    * Intervals must satisfy start <= end (rows violating it are dropped).
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, pointCol: String,
                startCol: String, endCol: String,
                binSeconds: Long = 600L): DataFrame = {
    require(binSeconds > 0, "rangeJoin: binSeconds must be positive")
    def binOf(c: Column): Column = floor(unix_seconds(c) / binSeconds)
    val p = points.withColumn("__bin", binOf(col(pointCol)))
    val iv = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("__bin",
        explode(sequence(binOf(col(startCol)), binOf(col(endCol)))))
    p.join(iv, Seq("__bin"))
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__bin")
  }

  /** Interval-OVERLAP join: all (a, b) pairs sharing `keys` whose closed
    * intervals `[aStart, aEnd]` and `[bStart, bEnd]` overlap
    * (`aStart <= bEnd AND bStart <= aEnd`) — sessions × campaign windows,
    * outage × deploy overlap, any interval-algebra question
    * [[rangeJoin]]'s point-in-interval shape can't phrase.
    *
    * Both sides explode to the time bins they cover and candidates meet
    * in an equi-join on `(keys, bin)` — but an overlapping pair shares
    * EVERY bin of its overlap region, so instead of an (expensive)
    * distinct, each pair is credited exactly once IN the join filter: at
    * the bin containing `max(aStart, bStart)`, the overlap's first
    * instant — a point both intervals cover, so both sides are
    * guaranteed to have exploded that bin. No cartesian anywhere; pick
    * `binSeconds` near the typical interval length (shuffle ∝ rows ×
    * span/bin). Rows with `start > end` drop, as in [[rangeJoin]]. */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame, keys: Seq[String],
                          aStart: String, aEnd: String,
                          bStart: String, bEnd: String,
                          binSeconds: Long = 600L): DataFrame = {
    require(binSeconds > 0, "intervalOverlapJoin: binSeconds must be positive")
    require(Seq(aStart, aEnd, bStart, bEnd).distinct.size == 4,
      "interval column names must be distinct across the two sides")
    def binOf(c: Column): Column = floor(unix_seconds(c) / binSeconds)
    def explodeBins(df: DataFrame, s: String, e: String) = df
      .filter(col(s) <= col(e))
      .withColumn("__bin", explode(sequence(binOf(col(s)), binOf(col(e)))))
    val ea = explodeBins(a, aStart, aEnd)
    val eb = explodeBins(b, bStart, bEnd)
    ea.join(eb, keys :+ "__bin")
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd) &&
        col("__bin") === greatest(binOf(col(aStart)), binOf(col(bStart))))
      .drop("__bin")
  }
}
