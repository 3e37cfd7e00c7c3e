package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Distributed backward AS-OF join: every left row picks the single right
  * row with the greatest right timestamp that is <= the left timestamp
  * (same keys), optionally within a tolerance — the point-in-time join of
  * event analytics ("the view this click attributes to", "the price in
  * force at trade time").
  *
  * Scale shape: the naive formulation is a range join (left × right
  * candidate pairs, then a per-left argmax) — quadratic in hot keys and a
  * broadcast-nested-loop invitation. This implementation is the
  * union-window form: tag both sides, exchange ONCE keyed by the join
  * keys, sort within partitions by (ts, side), and carry each right row's
  * payload forward with `last(_, ignoreNulls)` over the running frame.
  * Total shuffle = |left| + |right| rows regardless of temporal fan-in, no
  * candidate pairs ever materialize, and the per-partition sort is the
  * same sort a merge-based as-of pays on a single node. Right rows at the
  * same (key, ts) as a left row DO match (<=, not <). The right payload
  * rides in ONE struct so all matched columns come from the same right
  * row even when some of its fields are null.
  *
  * Ties among right rows at identical (key, ts): pass `rightTiebreak` to
  * pick the row with the GREATEST tiebreak value deterministically;
  * without it the pick among exact duplicates is plan-dependent, so
  * pre-dedup the right side (one row per key+ts) when ids matter.
  *
  * Skew: one hot key serializes into one task, the inherent limit of any
  * ordered-state operator (Flink temporal joins share it); keys here are
  * users/instruments — high cardinality — and AQE splits oversized
  * partitions of DISTINCT keys fine.
  */
object AsOf {

  /** @param toleranceSeconds max allowed (leftTs - rightTs), < 0 = unbounded
    * @param joinType "inner" (drop unmatched/out-of-tolerance left rows) or
    *                 "left" (keep them with null right columns)
    * @return left's columns followed by the matched right row's non-key
    *         columns (including its timestamp column under its own name);
    *         right value columns must not collide with left's. */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           toleranceSeconds: Long = -1L,
           joinType: String = "inner",
           rightTiebreak: Option[String] = None): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"asof joinType must be inner|left, got $joinType")
    val leftCols = left.columns.toSeq
    val rightVals = right.columns.toSeq.filterNot(keys.contains)
    require(rightVals.contains(rightTs), s"right side lacks ts column $rightTs")
    val collisions = rightVals.intersect(leftCols)
    require(collisions.isEmpty,
      s"right value columns collide with left: ${collisions.mkString(",")} — rename before joining")

    val TS = "__asof_ts"; val SIDE = "__asof_side"; val TIE = "__asof_tie"
    val RS = "__asof_right"
    val rsType = StructType(rightVals.map(c => right.schema(c)))
    val tieType = rightTiebreak.map(c => right.schema(c).dataType).getOrElse(LongType)

    val l2 = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as(TS), lit(1).as(SIDE), lit(null).cast(tieType).as(TIE),
        lit(null).cast(rsType).as(RS)) ++
      leftCols.filterNot(keys.contains).map(col): _*)
    // a NULL right timestamp is not <= anything — and NULLS FIRST ordering
    // would otherwise park it at the partition head as a universal
    // fallback match for every left row
    val r2 = right.filter(col(rightTs).isNotNull).select(
      keys.map(col) ++ Seq(
        col(rightTs).as(TS), lit(0).as(SIDE),
        rightTiebreak.map(col).getOrElse(lit(null).cast(LongType)).as(TIE),
        struct(rightVals.map(col): _*).as(RS)) ++
      leftCols.filterNot(keys.contains)
        .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(TS).asc, col(SIDE).asc, col(TIE).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l2.unionByName(r2)
      .withColumn(RS, last(col(RS), ignoreNulls = true).over(w))
      .filter(col(SIDE) === 1)

    val withinTol: Column =
      if (toleranceSeconds < 0) col(RS).isNotNull
      else col(RS).isNotNull &&
        (col(TS).cast("double") - col(RS).getField(rightTs).cast("double")) <= toleranceSeconds
    val gated =
      if (joinType == "inner") matched.filter(withinTol)
      else matched.withColumn(RS, when(withinTol, col(RS)))

    gated.select(leftCols.map(col) ++
      rightVals.map(c => col(RS).getField(c).as(c)): _*)
  }
}
