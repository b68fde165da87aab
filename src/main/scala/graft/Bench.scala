package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract): one JSON line with per-query seconds
  * plus the north-rule scaling evidence — extraction throughput (docs/sec)
  * measured at two parallelism levels (local[8] vs local[32], the sandbox
  * proxy for N vs 4N executors) on the same input, and their efficiency. */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // media must not collapse into one-split-per-core: finer splits
      // smooth the straggler tail (the 100 TB guidance — size
      // maxPartitionBytes so partitions stay balanced; 8m measured ~13%
      // faster than 16m at 16 cores on this corpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Extraction wall time over the prepared corpus at a given parallelism. */
  private def extractionRun(spark: SparkSession, inDir: String, cpus: Int): (Long, Double) = {
    implicit val s: SparkSession = spark
    val docs = spark.read.parquet(s"$inDir/docs")
    val media = spark.read.parquet(s"$inDir/media")
    val refs = docs.select(explode(col("spans.media_ref")).as("media_ref"))
      .where(col("media_ref") =!= "").distinct()
    val (n, sec) = time {
      ExtractJob.assembleSpans(docs, ExtractJob.extractMedia(media, refs, cpus * 2).toDF()).count()
    }
    (n, sec)
  }

  /** Fork one executor-sized JVM for a measurement level: same classpath
    * and module flags as this JVM, GC threads sized to the core count. The
    * child prints `RESULT n sec`; we parse it. */
  private def measureForked(cpus: Int, inDir: String): (Long, Double) = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val jvmArgs = {
      import scala.jdk.CollectionConverters._
      _root_.java.lang.management.ManagementFactory.getRuntimeMXBean.getInputArguments.asScala.toSeq
        .filterNot(a => a.startsWith("-XX:ParallelGCThreads") || a.startsWith("-agentlib"))
    }
    // the heap-scaled -Xmn (large young gen for the allocation-heavy
    // kernel) is inherited from the parent's javaOptions
    val cmd = Seq(javaBin) ++ jvmArgs ++ Seq(
      s"-XX:ParallelGCThreads=${math.max(2, cpus)}",
      "-cp", System.getProperty("java.class.path"),
      "graft.Bench", "--measure", cpus.toString, inDir)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    p.waitFor()
    out.linesIterator.find(_.startsWith("RESULT ")) match {
      case Some(line) =>
        val parts = line.split(" ")
        (parts(1).toLong, parts(2).toDouble)
      case None =>
        System.err.println(s"[bench] forked level $cpus failed:\n${out.takeRight(2000)}")
        (0L, Double.NaN)
    }
  }

  /** Child mode: one level, one JVM. Warm once on a slice (JIT+codegen,
    * excluded), then measured runs — one for the slow 4-core level (its
    * repetition comes from the 4 interleaved children), two for the
    * faster levels. Keeps the whole bench inside harness timeouts. */
  private def childMeasure(cpus: Int, inDir: String): Unit = {
    val s = session(cpus)
    locally { // warm: codegen + JIT on a corpus slice
      implicit val sp: SparkSession = s
      val docs = s.read.parquet(s"$inDir/docs").limit(1500)
      val media = s.read.parquet(s"$inDir/media")
      val refs = docs.select(explode(col("spans.media_ref")).as("media_ref"))
        .where(col("media_ref") =!= "").distinct()
      ExtractJob.assembleSpans(docs, ExtractJob.extractMedia(media, refs, cpus * 2).toDF()).count()
    }
    val nRuns = if (cpus <= 4) 1 else 2
    val runs = (1 to nRuns).map(_ => extractionRun(s, inDir, cpus))
    s.stop()
    println(s"RESULT ${runs.head._1} ${runs.map(_._2).min}")
  }

  def main(args: Array[String]): Unit = {
    if (args.length >= 3 && args(0) == "--measure") {
      childMeasure(args(1).toInt, args(2))
      return
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // sized so steady-state kernel throughput dominates the fixed per-job
    // planning cost (~0.5 s) the way a real long-running job amortizes it;
    // re-grown after the round-2 kernel got ~2x faster
    val nDocs = sys.env.get("SPARK_GRAFT_BENCH_DOCS").map(_.toInt).getOrElse {
      if (sfDir.contains("sf0.1")) 24000 else if (sfDir.contains("sf0.01")) 2000 else 200
    }

    // prepare the synthetic interleaved corpus once (seed=42, generated
    // distributed on the executors)
    val inDir = java.nio.file.Files.createTempDirectory("graft-bench").toString
    locally {
      val s = session(cpus)
      graft.testkit.Corpus.writeBenchCorpus(s, nDocs, inDir)
      // JIT warmup for the kernel path (excluded from measurements)
      extractionRun(s, inDir, cpus)
      s.stop()
    }

    // north-rule scaling: identical job at N=4 and 4N=16 local cores (the
    // sandbox proxy for N vs 4N executors — both levels leave GC/runtime
    // headroom on the 32-core box). Each level runs in its OWN forked JVM
    // with ParallelGCThreads=cores: a real 4-core executor sizes its GC to
    // 4 cores, while a shared 32-core JVM would hand the small level 23 GC
    // threads for free and understate its true cost. local[32] is measured
    // too as the peak.
    //
    // The VM's noise windows last minutes, so levels are measured
    // INTERLEAVED (4,16,32 × 3 rounds) and each level takes its min across
    // rounds — a noise spike then degrades one round of every level instead
    // of silently biasing one level's only measurement.
    // the 4↔16 ratio IS the north metric → measure that pair 4×
    // interleaved; the informational 32-core peak twice (schedule bounded
    // so the whole bench stays well under typical harness timeouts). The
    // host shows multi-minute throttle windows during which local[32] can
    // measure SLOWER than local[16]; min-per-level over interleaved rounds
    // is the defense — a reported number is always one the machine
    // actually achieved.
    // Kernel evidence (bandwidth-isolated, plain thread pool, no Spark) is
    // measured INTERLEAVED with the job pairs — one (4t,16t) kernel rep in
    // the parent right after each forked (4,16) job pair — so both
    // estimators sample the same noise windows instead of the kernel getting
    // whatever window happens to follow the whole schedule (r2 measured an
    // in-bench 0.52 vs 0.84+ standalone that way).
    val kMedia = graft.testkit.KernelBench.genMedia(3000)
    graft.testkit.KernelBench.run(kMedia.take(500), 4) // JIT warm
    val kernelPairs = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    // 5 (4,16) pairs for a stable median; 3 separate 32-core rounds so the
    // informational peak has three window samples (this host's throttle
    // windows can sink any single round by 2-3x)
    val schedule = Seq(Seq(4, 16, 32), Seq(4, 16), Seq(4, 16, 32), Seq(4, 16), Seq(4, 16, 32))
    // WINDOW PROBES: a ~0.35 s single-thread kernel run is a direct sensor
    // of the host's CPU-throttle state (clean ≈ 700-780 media/s here,
    // throttled windows halve it). One probe runs before every child and
    // once after the last; a (4,16) pair is accepted as window-clean only
    // if the three probes bracketing it all sit within 85% of the best
    // probe seen. Crucially the criterion never looks at the pair's own
    // ratio — selection is outcome-INDEPENDENT, so unlike filtering on the
    // ratios themselves it cannot bias the estimate in either direction.
    val probeMedia = kMedia.take(250)
    val probes = scala.collection.mutable.ArrayBuffer.empty[Double]
    def probe(): Int = { probes += graft.testkit.KernelBench.run(probeMedia, 1); probes.size - 1 }
    val childCpus = scala.collection.mutable.ArrayBuffer.empty[Int]
    val childRes = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val childProbeIdx = scala.collection.mutable.ArrayBuffer.empty[Int]
    val kernelProbeIdx = scala.collection.mutable.ArrayBuffer.empty[Int]
    schedule.foreach { group =>
      group.foreach { c =>
        childProbeIdx += probe()
        childCpus += c
        childRes += measureForked(c, inDir)
      }
      // probes also bracket the kernel pairs (same sensor, same criterion):
      // the within-15%-of-best-per-level filter used in earlier revisions
      // broke when EVERY k4 sample was throttled — "best" was itself
      // corrupted and the filter passed a pair with impossible eff 1.12
      kernelProbeIdx += probe()
      kernelPairs += ((graft.testkit.KernelBench.run(kMedia, 4),
        graft.testkit.KernelBench.run(kMedia, 16)))
    }
    probe() // closing bracket for the last kernel pair
    // three extra kernel reps (~4 s each): more window samples
    (1 to 3).foreach { _ =>
      kernelProbeIdx += probes.size - 1
      kernelPairs += ((graft.testkit.KernelBench.run(kMedia, 4),
        graft.testkit.KernelBench.run(kMedia, 16)))
      probe()
    }
    val results: Seq[(Int, (Long, Double))] = childCpus.toSeq.zip(childRes.toSeq)
    def best(cpus: Int): (Long, Double) = {
      val rs = results.collect { case (`cpus`, r) if !r._2.isNaN => r }
      (rs.head._1, rs.map(_._2).min)
    }
    val (_, sec4) = best(4)
    val (_, sec16) = best(16)
    val (n32, sec32) = best(32)

    // PAIRED efficiency: each adjacent (4,16) schedule pair ran back-to-back,
    // usually inside one noise window, so its ratio tends to be internally
    // consistent. The MEDIAN over ALL pairs is the headline — max() over
    // noisy samples cherry-picks upward (r2 shipped a physically impossible
    // 3.03 that way), the min-per-level ratio mixes windows, and
    // pre-filtering only the >1.0 pairs would be asymmetric (a window flip
    // mid-pair corrupts ratios in BOTH directions; discarding just the
    // upward ones biases the median down — observed in a round-3 dry run:
    // filtered median 0.57 vs all-pair median 0.86). The median absorbs
    // corrupted pairs on either side; the headline is clamped to 1.0 with
    // the raw value and every pair's times emitted for audit.
    def median(xs: Seq[Double]): Double =
      if (xs.isEmpty) Double.NaN
      else { val s = xs.sorted; (s((s.size - 1) / 2) + s(s.size / 2)) / 2.0 }

    // pairs with their bracketing window probes: probes is chronological,
    // so the probe AFTER any measurement is the next index past the probe
    // taken before it — a (k, k+1) child pair spans probe indices
    // childProbeIdx(k) .. childProbeIdx(k+1)+1
    val probeRef = probes.max
    def probesCleanIn(lo: Int, hi: Int): Boolean =
      (lo to math.min(hi, probes.size - 1)).forall(i => probes(i) >= 0.85 * probeRef)
    val pairEntries = (0 until results.size - 1).collect {
      case k if childCpus(k) == 4 && childCpus(k + 1) == 16 &&
        !childRes(k)._2.isNaN && !childRes(k + 1)._2.isNaN =>
        val clean = probesCleanIn(childProbeIdx(k), childProbeIdx(k + 1) + 1)
        (childRes(k)._2, childRes(k + 1)._2, clean)
    }.toSeq
    val jobPairs = pairEntries.map(p => (p._1, p._2))
    val jobEffs = jobPairs.map { case (a, b) => a / (4.0 * b) }
    val pairedMedianEff = median(jobEffs)
    val cleanEffs = pairEntries.collect { case (a, b, true) => a / (4.0 * b) }
    val jobCleanN = cleanEffs.size
    val jobCleanEff = median(if (cleanEffs.nonEmpty) cleanEffs else jobEffs)

    // kernel pairs: same probe-bracketed cleanliness criterion as the job
    // pairs (a kernel pair sits between the probe at kernelProbeIdx(j) and
    // the next probe)
    val kernelEffs = kernelPairs.toSeq.map { case (k4, k16) => k16 / (4.0 * k4) }
    val kernelClean = kernelPairs.toSeq.zipWithIndex.collect {
      case ((k4, k16), j) if probesCleanIn(kernelProbeIdx(j), kernelProbeIdx(j) + 1) =>
        k16 / (4.0 * k4)
    }
    val kernelCleanN = kernelClean.size
    val kernelEffRaw = median(if (kernelClean.nonEmpty) kernelClean else kernelEffs)
    // efficiency > 1 is physically impossible — clamp, report raw alongside
    val kernelEff = math.min(1.0, kernelEffRaw)
    val k4 = kernelPairs.map(_._1).max
    val k16 = kernelPairs.map(_._2).max
    val dps4 = nDocs / sec4
    val dps16 = nDocs / sec16
    val dps32 = nDocs / sec32
    val efficiency = dps16 / (4.0 * dps4)

    // per-query timings at the driver-provided parallelism
    val sq = session(cpus)
    val queryTimes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (_, sec) = time { try fn(sq, sfDir).count() catch { case _: Throwable => -1L } }
      name -> sec
    }
    sq.stop()

    val extras = Seq(
      "extract_docs_per_sec_local4" -> dps4,
      "extract_docs_per_sec_local16" -> dps16,
      "extract_docs_per_sec_local32" -> dps32,
      "extract_scaling_efficiency_4_to_16" -> efficiency,
      "extract_sec_local4" -> sec4,
      "extract_sec_local16" -> sec16,
      "extract_sec_local32" -> sec32,
      "extract_span_rows" -> n32.toDouble,
      "extract_docs" -> nDocs.toDouble,
      "extract_scaling_efficiency_paired_median" -> pairedMedianEff,
      "extract_scaling_efficiency_clean_pairs" -> jobCleanEff,
      "extract_clean_pair_count" -> jobCleanN.toDouble,
      "kernel_media_per_sec_4t" -> k4,
      "kernel_media_per_sec_16t" -> k16,
      "kernel_clean_pair_count" -> kernelCleanN.toDouble,
      "kernel_scaling_efficiency_raw" -> kernelEffRaw,
      "kernel_scaling_efficiency_4_to_16" -> kernelEff)
    // NaN/Infinity are not valid JSON literals (a fully-failed pair set
    // would otherwise make the whole driver line unparseable) → null
    def num(v: Double): String = if (v.isNaN || v.isInfinite) "null" else f"$v%.4f"
    val qs = (queryTimes ++ extras)
      .map { case (k, v) => "\"" + k + "\":" + num(v) }.mkString("{", ",", "}")
    val total = queryTimes.map(_._2).sum
    // headline efficiency = median over the clean (window-uncorrupted)
    // time-paired rounds, clamped to [0,1]; raw value, the all-pair median
    // and every pair's (t4,t16)/(k4,k16) emitted for audit.
    val headlineRaw =
      if (!jobCleanEff.isNaN) jobCleanEff
      else if (!pairedMedianEff.isNaN) pairedMedianEff
      else efficiency
    val headlineEff = math.min(1.0, headlineRaw)
    val outOfRange = headlineRaw > 1.0
    def pairsJson(ps: Seq[(Double, Double)]): String =
      ps.map { case (a, b) => s"[${num(a)},${num(b)}]" }.mkString("[", ",", "]")
    val probesJson = probes.map(p => num(p)).mkString("[", ",", "]")
    val cleanJson = pairEntries.map(_._3).mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","docs_per_sec_local32":${num(dps32)},"scaling_efficiency":${num(headlineEff)},"scaling_efficiency_raw":${num(headlineRaw)},"scaling_out_of_range":$outOfRange,"scaling_pairs_sec_4_16":${pairsJson(jobPairs)},"scaling_pairs_window_clean":$cleanJson,"window_probes_media_per_sec":$probesJson,"kernel_pairs_media_per_sec_4_16":${pairsJson(kernelPairs.toSeq)}}""")
  }
}
