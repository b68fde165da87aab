package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal join operators Spark lacks natively, built as single-shuffle
  * compositions of existing operators (SURVEY preference (a): compose
  * before dropping to a custom physical plan).
  *
  * Both are standard web/event-pipeline shapes: as-of joins for
  * attribution ("latest state at or before this event") and range joins
  * for windowed containment ("all events inside this interval") — the
  * naive Spark formulations (inequality theta-joins) fall back to
  * broadcast-nested-loop and die at scale; these do not. */
object JoinOps {

  /** As-of join: for each left row, the single right row with the same key
    * and the largest `rightTime <= leftTime` (inclusive), or nulls when no
    * such row exists — LEFT ASOF JOIN semantics (DuckDB `ASOF LEFT JOIN`,
    * kdb `aj`, pandas `merge_asof`).
    *
    * Implementation is the union-sort trick, NOT a join: tag both inputs,
    * union them, and run `last(payload, ignoreNulls)` over a per-key window
    * ordered by (time, side) with right-side rows sorting first at equal
    * times (that tie order IS the inclusivity of `<=`). One shuffle on the
    * key, sequential scan per key — O(n log n) with no pair blow-up, vs the
    * O(n·m)-per-key broadcast-nested-loop Spark plans for the equivalent
    * theta-join. At 100 TB this is the only workable shape: state per key
    * is a single struct, skewed keys cost a sort, never a cross product.
    *
    * Determinism requires the right side unique on (key, time): pass
    * `tieBreak` columns (largest wins) to dedup deterministically inside,
    * or pre-aggregate upstream and leave it empty.
    *
    * Output: every left column, plus every right column except `rightKey`
    * (so the matched `rightTime` is visible), null-filled for unmatched
    * rows. Column names must not collide — rename upstream. */
  def asofJoin(left: DataFrame, leftKey: String, leftTime: String,
               right: DataFrame, rightKey: String, rightTime: String,
               tieBreak: Seq[String] = Nil): DataFrame = {
    val payloadCols = right.columns.filter(_ != rightKey).toSeq
    require(payloadCols.contains(rightTime), s"rightTime $rightTime must be a right column")
    require(left.columns.toSet.intersect(payloadCols.toSet).isEmpty,
      "left and right payload column names must not collide — rename upstream")
    val r0 =
      if (tieBreak.isEmpty) right
      else {
        val w = Window.partitionBy(col(rightKey), col(rightTime))
          .orderBy(tieBreak.map(c => col(c).desc): _*)
        right.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
      }
    val pStruct = struct(payloadCols.map(col): _*)
    val pType = r0.select(pStruct).schema.head.dataType.asInstanceOf[StructType]
    val lStruct = struct(left.columns.toSeq.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType.asInstanceOf[StructType]
    val rSide = r0.select(col(rightKey).as("__k"), col(rightTime).as("__t"),
      pStruct.as("__p"), lit(0).as("__side"), lit(null).cast(lType).as("__l"))
    val lSide = left.select(col(leftKey).as("__k"), col(leftTime).as("__t"),
      lit(null).cast(pType).as("__p"), lit(1).as("__side"), lStruct.as("__l"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rSide.unionByName(lSide)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__l.*") +: payloadCols.map(c => col("__m").getField(c).as(c)): _*)
  }

  /** Range (interval-containment) join with NO equality key: every
    * (interval, point) pair with `startCol <= pointTime < endCol` (times
    * are epoch-microsecond LONG columns — convert upstream).
    *
    * Implementation: quantize time into `bucketUs` buckets, explode each
    * interval to the buckets it covers, map each point to its single
    * bucket, equi-join on the bucket and post-filter the exact bounds.
    * A point's bucket is unique, so no pair is produced twice — no
    * DISTINCT needed. This turns the inequality join (Spark:
    * broadcast-nested-loop) into one shuffle whose key cardinality the
    * caller controls: size `bucketUs` near the typical interval length so
    * intervals explode to O(1) rows, and let AQE's skew-join split hot
    * buckets (a flash-crowd hour). Inner semantics — intervals with no
    * points are absent; left-join the aggregate back upstream if needed. */
  def rangeJoin(points: DataFrame, pointTime: String,
                intervals: DataFrame, startCol: String, endCol: String,
                bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val iv = intervals.withColumn("__b", explode(sequence(
      expr(s"$startCol div $bucketUs"), expr(s"($endCol - 1) div $bucketUs"))))
    val pt = points.withColumn("__b", expr(s"$pointTime div $bucketUs"))
    iv.join(pt, Seq("__b"))
      .where(col(pointTime) >= col(startCol) && col(pointTime) < col(endCol))
      .drop("__b")
  }

  /** Skew-salted inner equi-join: identical result to `big.join(small,
    * keys)`, different physical shape. A web-scale key distribution is
    * Zipfian — one hot key (the empty referrer, the top domain, the ""
    * language) can put 10% of a 100 TB table into ONE reducer task and
    * stall the whole stage behind it. Salting splits every big-side key
    * into `salts` sub-keys (deterministic: xxhash64 of the row's unique
    * id, so reruns repartition identically) and replicates each small-side
    * row `salts` times; the join keys on (key, salt), so the hot key's
    * rows spread over `salts` tasks. Cost: small side × salts (fine — it
    * is the SMALL side by contract); benefit: max task size shrinks
    * ~salts-fold. AQE's skew-join handles sort-merge skew at runtime;
    * salting is the static form that also covers hash aggregations and
    * engines/plans AQE doesn't reach.
    *
    * `bigId` must be unique per big-side row (any stable id column); the
    * salt never leaves the join. Inner join only — outer variants need
    * null-extension after de-salting, a different operator. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 bigId: String, salts: Int): DataFrame = {
    require(salts >= 2 && salts <= 1024, "salts must be in [2, 1024]")
    require(keys.nonEmpty, "need at least one join key")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "__salt is reserved by saltedJoin — rename the input column")
    val b = big.withColumn("__salt", pmod(xxhash64(col(bigId)), lit(salts.toLong)))
    val s = small.withColumn("__salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    b.join(s, keys :+ "__salt").drop("__salt")
  }
}
