package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the feature-store-critical operator.
  *
  * The reference declares this capability via its Polars dependency
  * (`join_asof`; reference: projects/feray/pyproject.toml:25) — point-in-time
  * correctness is what feature stores need when enriching entities with the
  * latest known state at a given time (reference README.md:21-23 record-level
  * versioning implies temporal lookups).
  *
  * Implementation is the scalable union-and-fill pattern, NOT a broadcast or
  * nested-loop join: tag both sides, union, ONE shuffle on (keys, ts), then a
  * running `last(..., ignoreNulls)` window carries the most recent right-side
  * row forward onto each left row. Cost is a single sort-shuffle of
  * |left|+|right| — at 100 TB this is the plan you want (an equi-join on key
  * with a range predicate would either explode or broadcast).
  */
object AsOfJoin {

  /** Backward as-of join: for each left row, attach the columns of the most
    * recent right row with `right.ts <= left.ts` for the same key.
    *
    * @param on        equi-key column names present on both sides
    * @param leftTs    event-time column on `left`
    * @param rightTs   event-time column on `right`
    * @param rightCols right-side payload columns to attach (aliased as-is)
    * @param toleranceMicros optional max staleness: matches older than
    *        leftTs - tolerance are nulled out (Polars `tolerance` parity)
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      toleranceMicros: Option[Long] = None): DataFrame = {

    val leftCols = left.columns.toSeq
    val spark = left.sparkSession
    val tsCol = "__asof_ts"
    val sideCol = "__asof_side" // 0 = right (sorts first at tie → inclusive <=)
    val matchedTs = "__asof_matched_ts"

    // Align both sides to a common schema: left payload ++ right payload.
    val l = left
      .withColumn(tsCol, col(leftTs))
      .withColumn(sideCol, lit(1))
      .select((Seq(col(tsCol), col(sideCol)) ++ on.map(col) ++
        leftCols.filterNot(on.contains).map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")) :+
        lit(null).cast(right.schema(rightTs).dataType).as(matchedTs)): _*)
    val r = right
      .withColumn(tsCol, col(rightTs))
      .withColumn(sideCol, lit(0))
      .select((Seq(col(tsCol), col(sideCol)) ++ on.map(col) ++
        leftCols.filterNot(on.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(s"__r_$c")) :+
        col(rightTs).cast(right.schema(rightTs).dataType).as(matchedTs)): _*)

    val unioned = l.unionByName(r)
    // Single sort-shuffle; the fill is a running window, no join blow-up.
    val w = Window
      .partitionBy(on.map(col): _*)
      .orderBy(col(tsCol).asc, col(sideCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filledCols = rightCols.map(c => last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"__f_$c"))
    val filledTs = last(col(matchedTs), ignoreNulls = true).over(w).as("__f_ts")

    val filled = unioned
      .select((unioned.columns.map(col).toSeq ++ filledCols :+ filledTs): _*)
      .where(col(sideCol) === 1)

    val stale: Column = toleranceMicros match {
      case Some(tol) =>
        col("__f_ts").isNull ||
          (unix_micros(col(tsCol)) - unix_micros(col("__f_ts"))) > tol
      case None => col("__f_ts").isNull
    }

    filled.select((on.map(col) ++
      leftCols.filterNot(on.contains).map(col) ++
      rightCols.map(c => when(stale, lit(null)).otherwise(col(s"__f_$c")).as(c)) :+
      when(stale, lit(null)).otherwise(col("__f_ts")).cast(right.schema(rightTs).dataType).as(s"matched_$rightTs")): _*)
  }

  /** Forward as-of join (Polars `strategy="forward"` parity): for each left
    * row, attach the EARLIEST right row with `right.ts >= left.ts` for the
    * same key. Same single-shuffle union+window shape, with the window
    * looking forward and the tie sort flipped so an equal timestamp matches
    * (right sorts after left at ties under a descending-side scan). */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      toleranceMicros: Option[Long] = None): DataFrame = {

    val leftCols = left.columns.toSeq
    val tsCol = "__asof_ts"
    val sideCol = "__asof_side" // right = 0: ordering (ts DESC, side ASC)
                                // puts an equal-ts right row BEFORE the left
                                // row in scan order → inclusive >= match
    val matchedTs = "__asof_matched_ts"

    val l = left
      .withColumn(tsCol, col(leftTs))
      .withColumn(sideCol, lit(1))
      .select((Seq(col(tsCol), col(sideCol)) ++ on.map(col) ++
        leftCols.filterNot(on.contains).map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")) :+
        lit(null).cast(right.schema(rightTs).dataType).as(matchedTs)): _*)
    val r = right
      .withColumn(tsCol, col(rightTs))
      .withColumn(sideCol, lit(0))
      .select((Seq(col(tsCol), col(sideCol)) ++ on.map(col) ++
        leftCols.filterNot(on.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(s"__r_$c")) :+
        col(rightTs).cast(right.schema(rightTs).dataType).as(matchedTs)): _*)

    val unioned = l.unionByName(r)
    // scan in ts-DESC order: the running last(...) seen so far is the
    // EARLIEST right row at-or-after the current left row
    val w = Window
      .partitionBy(on.map(col): _*)
      .orderBy(col(tsCol).desc, col(sideCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filledCols = rightCols.map(c => last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"__f_$c"))
    val filledTs = last(col(matchedTs), ignoreNulls = true).over(w).as("__f_ts")

    val filled = unioned
      .select((unioned.columns.map(col).toSeq ++ filledCols :+ filledTs): _*)
      .where(col(sideCol) === 1)

    val stale: Column = toleranceMicros match {
      case Some(tol) =>
        col("__f_ts").isNull ||
          (unix_micros(col("__f_ts")) - unix_micros(col(tsCol))) > tol
      case None => col("__f_ts").isNull
    }

    filled.select((on.map(col) ++
      leftCols.filterNot(on.contains).map(col) ++
      rightCols.map(c => when(stale, lit(null)).otherwise(col(s"__f_$c")).as(c)) :+
      when(stale, lit(null)).otherwise(col("__f_ts")).cast(right.schema(rightTs).dataType).as(s"matched_$rightTs")): _*)
  }
}
