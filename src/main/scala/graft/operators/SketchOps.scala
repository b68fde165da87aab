package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed sketch operators (the "novel sketch" custom-operator
  * category): HyperLogLog cardinality registers and Count-Min frequency
  * sketches, built from pure Catalyst expressions over MD5 — no UDFs, no
  * JVM-private hash, so every row of the sketch is reproducible bit-for-bit
  * by any engine with MD5 + integer arithmetic (the correctness oracle
  * recomputes the whole structure in SQL).
  *
  * Both sketches are MERGEABLE monoids — the entire point at 100 TB:
  * registers/counters combine associatively, so Spark's partial aggregation
  * computes them map-side and shuffles only the tiny sketch state
  * (2^p rows for HLL, depth×width for CMS), never the data. Snapshots of
  * different corpora union + re-aggregate into the sketch of the union. */
object SketchOps {

  /** Per-item HLL coordinates from the first 64 bits of md5(key):
    * the top `p` bits pick the register, the remaining 64-p bits give
    * rho = (leading zeros) + 1, the classic Flajolet split. p must be a
    * multiple of 4 (register = leading hex chars — keeps the arithmetic
    * exact in any engine: no 64-bit unsigned shifts, just substrings and
    * base conversion; bin() gives floor(log2) without floats). */
  private def hllCoords(key: Column, p: Int): (Column, Column) = {
    require(p >= 4 && p <= 16 && p % 4 == 0, "p must be 4, 8, 12, or 16")
    val nHex = p / 4
    val bits = 64 - p
    val h = md5(key.cast("string").cast("binary"))
    val reg = conv(substring(h, 1, nHex), 16, 10).cast("int")
    val v = conv(substring(h, nHex + 1, 16 - nHex), 16, 10).cast("long")
    val rho = when(v === 0, lit(bits + 1))
      .otherwise(lit(bits + 1) - length(bin(v)).cast("int"))
    (reg, rho)
  }

  /** The HLL sketch itself: one row per non-empty register with the max
    * rho observed — the mergeable state (union corpora = UNION ALL + this
    * same max-aggregate). One scan, one shuffle of ≤2^p 8-byte keys with
    * map-side partial max. At most 2^p rows come back regardless of input
    * size — cardinality estimation over 10^12 docs moves kilobytes. */
  def hllRegisters(df: DataFrame, key: Column, p: Int = 8): DataFrame = {
    val (reg, rho) = hllCoords(key, p)
    df.select(reg.as("register"), rho.as("rho"))
      .groupBy(col("register")).agg(max(col("rho")).as("max_rho"))
  }

  /** Scale factor for the harmonic sum: Z is kept as the exact integer
    * sum of 2^(S - min(rho, S)) so cross-engine comparison is bitwise
    * (capping rho at S=40 only matters past ~10^12 cardinality). */
  private val S = 40
  private val Scale = 1L << S

  /** Raw HLL estimate from a register table — a single row holding the
    * exact integer pieces (registers observed, scaled harmonic sum) plus
    * the raw Flajolet estimate alpha_m·m²/Z. The float work is ONE
    * division of exactly-agreed inputs (alpha_m·m²·2^S is precomputed on
    * the driver and embedded as a literal — see [[hllAlphaScaled]]), so
    * even the double is bitwise-reproducible. Small-range linear-counting
    * correction is [[hllCorrected]] (uses ln, so only tolerance-testable). */
  def hllEstimate(registers: DataFrame, p: Int = 8): DataFrame = {
    val m = 1 << p
    registers
      .agg(count(lit(1)).cast("int").as("nonzero"),
        sum(expr(s"shiftleft(cast(1 as bigint), $S - least(max_rho, $S))")).as("z_present"))
      .select(lit(m).as("m"), col("nonzero"),
        (col("z_present") + (lit(m) - col("nonzero")).cast("long") * lit(Scale)).as("z_scaled"))
      .select(col("m"), col("nonzero"), col("z_scaled"),
        (lit(hllAlphaScaled(p)) / col("z_scaled").cast("double")).as("estimate_raw"))
  }

  /** alpha_m · m² · 2^S as one driver-computed double literal: embedding
    * the same literal in the Spark plan and the oracle SQL removes any
    * dependence on expression-folding order. */
  def hllAlphaScaled(p: Int): Double = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    alpha * m * m * Scale.toDouble
  }

  /** Linear-counting-corrected cardinality (driver-side, for API users:
    * the raw estimate under-reads when most registers are empty). */
  def hllCorrected(registers: DataFrame, p: Int = 8): Double = {
    val m = 1 << p
    val row = hllEstimate(registers, p).head()
    val zeros = m - row.getAs[Int]("nonzero")
    val raw = row.getAs[Double]("estimate_raw")
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }

  /** Mergeable log2 histogram of a long-valued column (doc lengths, token
    * counts, degree distributions): bin = floor(log2 v) computed EXACTLY
    * as length(bin(v)) - 1 — no floats, so cross-engine bitwise. Same
    * monoid argument as the other sketches: counts/min/max combine
    * associatively, partial aggregation ships ≤64 bins per partition, and
    * histograms of two corpora union + re-aggregate into the histogram of
    * the union. The shape of a 10^12-doc length distribution costs one
    * narrow pass. v ≤ 0 lands in bin -1 (sentinel, disclosed). */
  def logHistogram(df: DataFrame, value: Column): DataFrame = {
    val v = value.cast("long")
    val b = when(v <= 0, lit(-1)).otherwise(length(bin(v)).cast("int") - 1)
    df.select(b.as("bin"), v.as("v"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("min_v"), max(col("v")).as("max_v"))
  }

  /** Merge HLL register tables: per-register MAX. This is the whole
    * incremental-maintenance story made first-class: registers(snapshot ∪
    * delta) = merge(registers(snapshot), registers(delta)), so corpus
    * cardinality stats update from a day's delta without rescanning the
    * 100 TB history — the driver row proves merged-halves ≡ whole-corpus
    * bit for bit. Inputs are [[hllRegisters]] frames with the same p. */
  def mergeHllRegisters(rs: DataFrame*): DataFrame = {
    require(rs.nonEmpty, "need at least one register table")
    rs.reduce(_ unionByName _).groupBy(col("register"))
      .agg(max(col("max_rho")).as("max_rho"))
  }

  /** Merge log2 histograms: counts add, extrema combine — same
    * incremental contract as [[mergeHllRegisters]]. */
  def mergeLogHistograms(hs: DataFrame*): DataFrame = {
    require(hs.nonEmpty, "need at least one histogram")
    hs.reduce(_ unionByName _).groupBy(col("bin"))
      .agg(sum(col("n")).as("n"), min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))
  }

  /** Merge Count-Min sketches: counters add per (d, bucket). Sketches
    * must share (depth, width) and hash family — ours is fixed by
    * [[cmsBucket]], so any two [[cmsSketch]] outputs merge. */
  def mergeCmsSketches(ss: DataFrame*): DataFrame = {
    require(ss.nonEmpty, "need at least one sketch")
    ss.reduce(_ unionByName _).groupBy(col("d"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Quantile estimates read off the mergeable [[logHistogram]]: for each
    * requested quantile q = q_num/q_den the answer is the smallest bin whose
    * cumulative count reaches ceil(q·total) — entirely BIGINT arithmetic
    * (ceil(a·n/d) = (a·n + d − 1) div d), so the result is cross-engine
    * exact, unlike `percentile_approx`. Emits (q_num, q_den, bin, min_v,
    * max_v): the observed value range inside the answer bin is the bracket
    * a 100 TB percentile question actually needs (resolution = the bin's
    * factor-of-2 width, the price of a 64-row mergeable state). The
    * unpartitioned windows run over the ≤65-row histogram, never the data
    * — one narrow corpus pass total, same as [[logHistogram]]. */
  def logHistogramQuantiles(df: DataFrame, value: Column,
                            qs: Seq[(Int, Int)] = Seq((1, 4), (1, 2), (3, 4), (9, 10))): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (n, d) => n >= 0 && d > 0 && n <= d },
      "quantiles must be rationals in [0, 1]")
    import org.apache.spark.sql.expressions.Window
    val hist = logHistogram(df, value) // (bin, n, min_v, max_v), ≤65 rows
    val cumW = Window.orderBy(col("bin")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allW = Window.orderBy(col("bin")).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = hist
      .withColumn("cum", sum(col("n")).over(cumW))
      .withColumn("total", sum(col("n")).over(allW))
    val spark = df.sparkSession
    val qdf = spark.createDataFrame(qs.map { case (n, d) => (n, d) })
      .toDF("q_num", "q_den")
    val target = expr("(total * q_num + q_den - 1) div q_den")
    val rkW = Window.partitionBy(col("q_num"), col("q_den")).orderBy(col("bin"))
    cum.crossJoin(broadcast(qdf))
      .where(col("cum") >= target)
      .withColumn("rk", row_number().over(rkW))
      .where(col("rk") === 1)
      .select(col("q_num"), col("q_den"), col("bin"), col("min_v"), col("max_v"))
  }

  /** Per-(row, item) CMS bucket: row hash family is md5(d || ':' || item),
    * first 32 bits mod width — independent-enough rows, engine-portable. */
  private[graft] def cmsBucket(d: Column, item: Column, width: Int): Column =
    (conv(substring(md5(concat(d.cast("string"), lit(":"), item).cast("binary")), 1, 8), 16, 10)
      .cast("long") % width).cast("int")

  /** Count-Min sketch build over an item column (one input row = one
    * occurrence): the full counter matrix as (d, bucket, cnt) rows.
    * The explode-by-depth multiplies rows ×depth BEFORE the aggregation,
    * but partial aggregation collapses each partition to ≤ depth·width
    * counters map-side, so the shuffle moves sketch-sized state, not
    * data-sized — the same argument as [[hllRegisters]], and why this
    * beats exact top-k counting when the item domain (URLs, shingles,
    * tokens at 100 TB) no longer fits a hash aggregate. */
  def cmsSketch(items: DataFrame, item: Column, depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1, width >= 2")
    items.select(item.as("__w"), explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .select(col("d"), cmsBucket(col("d"), col("__w"), width).as("bucket"))
      .groupBy(col("d"), col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** [[cmsSketch]] over PRE-AGGREGATED (item, n) counts instead of raw
    * occurrences: each distinct item contributes its full count to its
    * (d, bucket) cells in one row, so cnt(d, bucket) = Σ n over the items
    * hashing there — exactly the counters [[cmsSketch]] produces from the
    * raw rows (guide §1.2: when a consumer has already paid the exact
    * per-item aggregation, deriving the sketch from it costs an
    * items-sized pass instead of a second occurrences-sized pass). Only
    * worth it when the count table exists anyway — from raw data the
    * occurrence formulation's map-side-to-sketch-size partial aggregation
    * is the scale shape. */
  def cmsSketchFromCounts(counts: DataFrame, item: Column, n: Column,
                          depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1, width >= 2")
    counts.select(item.as("__w"), n.as("__n"),
        explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .select(col("d"), cmsBucket(col("d"), col("__w"), width).as("bucket"), col("__n"))
      .groupBy(col("d"), col("bucket")).agg(sum(col("__n")).as("cnt"))
  }

  /** Point-query the sketch for each probe item: the CMS estimate is the
    * MIN over the depth rows' counters (never under the true count; over
    * by at most 2n/width with prob 1-2^-depth). Probes are a small frame;
    * the sketch is ≤ depth·width rows → broadcast join, no shuffle. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, item: Column,
                  depth: Int = 4, width: Int = 256): DataFrame =
    probes.select(item.as("item"), explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .withColumn("bucket", cmsBucket(col("d"), col("item"), width))
      .join(broadcast(sketch), Seq("d", "bucket"))
      .groupBy(col("item")).agg(min(col("cnt")).as("cms_count"))
}
