package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main (driver contract): runs every SparkEntry query on
 * SPARK_GRAFT_SF_DIR, then measures the flagship tile-render critical path
 * (rasterize → k-anon agg → 14-level pyramid → MVT encode) at TWO
 * parallelism levels — the sandbox substitute for the north rule's N vs 4N
 * executor scaling (BENCH/BASELINE.md protocol).
 *
 * Flagship protocol (strong scaling on a noisy VM — identical stages vary
 * 2-3× run to run, so the estimator is MIN and every leg must be warm):
 *   1. one discarded warm ROUND over all legs (JIT state persists across
 *      SparkSessions in one JVM, so after this every leg is warm);
 *   2. `Rounds` timed rounds, INTERLEAVED over the legs (2, 8, 32 cores in
 *      rotation) so slow host drift hits every leg equally, per-leg best;
 *   3. sanity gates BEFORE emitting: strong-scaling efficiency must be in
 *      (0, 1.05] — noise under min-statistics can only inflate a leg, so an
 *      efficiency > 1.05 means the LOW leg is still inflated and an
 *      implausibly low one means the HIGH leg is — the offending leg is
 *      automatically re-measured once (extra runs merged by min) and the
 *      ratio recomputed; if a gate still fails the record carries an
 *      explicit "anomaly" field rather than a silently absurd number.
 *
 * Output: the LAST stdout line is a SHORT summary JSON (totals + flagship
 * block only — small enough for the driver's tail window); the full record
 * including the per-query map goes to BENCH_LAST.json (and is printed once,
 * earlier, for the log).
 */
object Bench {
  /** Timed rounds per leg after the warm round. */
  val Rounds = 3
  /** Extra runs when a leg is re-measured by a sanity gate. */
  val RemeasureRuns = 2

  /** One flagship pass (rasterize → k-anon → pyramid → MVT) in an existing
    * session; returns (tiles, seconds). `input` is "direct:N" (N synthesized
    * tracks) or an sf dir (events-derived tracks). */
  private def flagshipOnce(spark: SparkSession, input: String): (Long, Long, Double) = {
    implicit val s: SparkSession = spark
    import org.apache.spark.sql.functions.{col, count, hash, lit, sum}
    val t0 = System.nanoTime()
    val tracks =
      if (input.startsWith("direct:"))
        graft.pipeline.HeatmapPipeline.tracksDirect(input.stripPrefix("direct:").toLong)
      else graft.queries.GraftQueries.eventTracks(spark, input)
    val result = graft.pipeline.HeatmapPipeline.run(tracks)
    // one aggregate action: tile count + an order-independent content
    // fingerprint (sum of per-tile murmur3 over key AND blob bytes) — the
    // invariance gate needs the SET of rendered tiles, not just its size
    val row = graft.pipeline.HeatmapPipeline.mvtAll(result)
      .agg(count(lit(1)), sum(hash(col("z"), col("tx"), col("ty"), col("mvt")).cast("long")))
      .head()
    val (tiles, fp) = (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
    val secs = (System.nanoTime() - t0) / 1e9
    result.release()
    (tiles, fp, secs)
  }

  /** One flagship run in a FRESH session at `cpus` (session startup is
    * outside the timed region). AQE is OFF on this path: the strong-scaling
    * protocol fixes the plan (64 shuffle partitions at every cluster size),
    * so AQE's per-exchange replan barriers would only add serial time. */
  private def runLeg(cpus: Int, input: String): (Long, Long, Double) = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .config("spark.local.dir",
        graft.spark.Sessions.scratchDir.getOrElse(System.getProperty("java.io.tmpdir")))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try flagshipOnce(spark, input) finally spark.stop()
  }

  private def r3(v: Double): Double = math.rint(v * 1000) / 1000.0

  /** One measured sample: Right(seconds) or Left(error message). */
  type Sample = Either[String, Double]

  /** Per-query record: one sample per pass, in pass order. */
  final case class QueryMeasure(name: String, samples: Seq[Sample]) {
    /** Best successful timing (min — host noise only ever inflates). */
    def secs: Option[Double] = {
      val ok = samples.collect { case Right(t) => t }
      if (ok.isEmpty) None else Some(ok.min)
    }
    /** Hard error: EVERY pass failed. A transient single-pass failure
      * followed by a success is a PASS with the successful timing (a flaky
      * first run must not permanently mark the query errored — advisor r4);
      * the transient message is still recorded, never swallowed. */
    def error: Option[String] =
      if (samples.forall(_.isLeft)) samples.collectFirst { case Left(e) => e } else None
    def transient: Option[String] =
      if (samples.exists(_.isRight)) samples.collectFirst { case Left(e) => e } else None
  }

  /** Constant-work host-noise canary: a codegen'd hash+sum over a fixed
    * range — pure compute, no IO, no sf dependence — measured at the start
    * of EVERY catalog pass. Its per-pass drift is recorded in
    * BENCH_LAST.json (`canary_samples`): a reader of a degraded-window
    * artifact (the r5 evidence gap) sees the host state per pass instead
    * of inferring it from query scatter. */
  val CanaryRows = 300000000L
  def canaryOnce(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions.{col, lit, pmod, sum, xxhash64}
    val t0 = System.nanoTime()
    // pmod bounds the addend so the ANSI-mode sum cannot overflow Long
    // (3e8 rows × 999 max ≪ Long.Max); the hash is still the work
    spark.range(CanaryRows).select(sum(pmod(xxhash64(col("id")), lit(1000L)))).head()
    (System.nanoTime() - t0) / 1e9
  }

  /** A query's two samples disagree enough to warrant a third pass when
    * the worse one exceeds BOTH bounds: > AdaptRatio × the better one AND
    * > AdaptFloorSecs absolute (sub-second scheduling scatter routinely
    * exceeds 3× on trivial queries and needs no arbitration — min() is
    * already right there). */
  val AdaptRatio = 3.0
  val AdaptFloorSecs = 1.0

  /** Per-query measurement: `passes` INTERLEAVED passes over the whole
    * sorted catalog (pass 1 over all queries, then pass 2 — NOT two
    * back-to-back runs per query). Rationale: a sustained multi-minute host
    * stall hits back-to-back samples of every query inside its window, and
    * min() cannot reject it (the r4 driver record shows exactly such a
    * contiguous alphabetical inflation block); with interleaving the stall
    * lands in at most one pass of many queries and min() takes the clean
    * pass — the same drift argument as the flagship leg rotation. All
    * samples are recorded (BENCH_LAST.json `query_samples`) so a post-hoc
    * reader can SEE an inflation window. Queries whose two samples
    * disagree > AdaptRatio× (above the absolute floor) get ONE adaptive
    * third sample in a final mini-pass — the flagship legs' re-measure
    * gate applied per query, arbitrating which of two contradictory
    * samples was the stalled one. A query that THROWS in every pass
    * is loud: status "error" in the queries map, a query_errors object, an
    * errors count in both summary lines, and the anomaly field (exit stays
    * 0 so the driver still collects the artifact). BenchSpec drives a
    * broken query, a transient-failure query, the interleaving order, and
    * the adaptive trigger through this path. `onPassStart` runs before
    * every pass (including the adaptive one) — main hooks the canary in. */
  def measureQueries(spark: SparkSession, sfDir: String,
                     queries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame],
                     passes: Int = 2,
                     onPassStart: Int => Unit = _ => ()): Seq[QueryMeasure] = {
    val named = queries.toSeq.sortBy(_._1)
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Sample = {
      val t0 = System.nanoTime()
      val err =
        try {
          val df = fn(spark, sfDir)
          df.count()
          // checkpointed results (the dedup/CC family) hold block-manager
          // storage until driver GC; the harness is a long-lived session
          // measuring 73 queries × 2 passes — release eagerly (documented
          // caller contract of the checkpoint-returning jobs)
          graft.dedup.Dedup.releaseCheckpoint(df)
          None
        }
        catch { case e: Throwable => Some(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      // cache-ownership contract: a query may persist intermediates for
      // its own lifetime; the harness owns the session and clears the
      // cache between runs so nothing leaks into the next measurement.
      spark.sharedState.cacheManager.clearCache()
      err.toLeft(dt)
    }
    val perPass: Seq[Seq[Sample]] =
      (1 to passes).map { p => onPassStart(p); named.map { case (_, fn) => once(fn) } }
    var samples: Seq[Seq[Sample]] = named.indices.map(i => perPass.map(_(i)))
    val disputed = named.indices.filter { i =>
      val ok = samples(i).collect { case Right(t) => t }
      ok.size >= 2 && ok.max > AdaptFloorSecs && ok.max > AdaptRatio * ok.min
    }
    if (disputed.nonEmpty) {
      System.err.println(s"[bench] adaptive third pass for ${disputed.size} " +
        s"disputed queries: ${disputed.map(named(_)._1).mkString(", ")}")
      onPassStart(passes + 1)
      val extra = disputed.map(i => i -> once(named(i)._2)).toMap
      samples = samples.zipWithIndex.map { case (s, i) => extra.get(i).fold(s)(s :+ _) }
    }
    named.indices.map(i => QueryMeasure(named(i)._1, samples(i)))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // ---- per-query timings at full parallelism ----
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .config("spark.local.dir",
        graft.spark.Sessions.scratchDir.getOrElse(System.getProperty("java.io.tmpdir")))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Per-query estimator: min over 2 INTERLEAVED catalog passes (same min
    // statistic as the flagship legs — host noise only ever inflates a
    // run; interleaving makes a sustained stall rejectable, see
    // measureQueries). Pass 1 also absorbs the one-time costs that made
    // single-run totals swing ±35 % between sessions (shared-dump
    // materialization, parquet page cache, JIT); pass 2 measures the
    // steady state a resident service would see.
    // host-noise canary bracketing every pass (adaptive pass included):
    // constant work whose drift dates a degraded-host window in the record.
    // One DISCARDED warm-up first — the canary must measure the HOST, not
    // session JIT: both r6 driver-protocol runs showed a reproducible
    // ~4.4 s cold first sample vs ~0.5 s steady, which would set a ~10x
    // "drift" on every perfectly healthy run
    canaryOnce(spark)
    val canarySamples = scala.collection.mutable.ArrayBuffer.empty[Double]
    val results = measureQueries(spark, sfDir, SparkEntry.queries,
      onPassStart = _ => canarySamples += canaryOnce(spark))
    val canaryDrift =
      if (canarySamples.size >= 2 && canarySamples.min > 0) canarySamples.max / canarySamples.min
      else 1.0
    val queryErrors = results.collect { case m if m.error.isDefined => (m.name, m.error.get) }
    queryErrors.foreach { case (name, err) => System.err.println(s"[bench] QUERY ERROR $name: $err") }
    results.foreach(m => m.transient.foreach(e =>
      System.err.println(s"[bench] transient failure ${m.name} (passed on another run): $e")))
    val nEvents = graft.queries.Tables.events(spark, sfDir).count()
    spark.stop()

    // ---- flagship N vs 4N cores on the SAME input ----
    // Input = 10× the sf's track count: at bench SF the per-stage work is
    // otherwise too short to measure compute rather than fixed scheduling
    // cost (~5.7 s serial per run — BENCH/BASELINE.md Amdahl fit; at 6×
    // input that term alone costs ~7 points of 2→8 efficiency, and at
    // 10^12-row scale it vanishes entirely — the longer run is the MORE
    // faithful model of the target regime). Headline pair is 2→8 cores —
    // both below this VM's ~16-thread memory-path saturation knee (the
    // raw-CPU microbench scales perfectly to 32; memory-touching work does
    // not — a single-box artifact a multi-node cluster doesn't share). The
    // saturated 8→32 pair is also measured and reported, not hidden.
    val input = s"direct:${10 * nEvents}"
    val legs = Seq(2, 8, cpus).distinct
    val times = scala.collection.mutable.Map.empty[Int, List[Double]].withDefaultValue(Nil)
    var tiles = 0L

    System.err.println(s"[bench] flagship warm round over legs ${legs.mkString(",")}")
    // warm round (discarded timings: JIT + page cache) doubles as the
    // parallelism-invariance gate — every leg must render the IDENTICAL
    // tile set (count AND order-independent content fingerprint over the
    // encoded blobs) or the scaling ratios compare different computations
    val warm = legs.map { c => val (t, fp, _) = runLeg(c, input); (c, t, fp) }
    require(warm.map(w => (w._2, w._3)).distinct.size == 1,
      s"parallelism changed the output: (leg, tiles, fingerprint) = $warm")
    tiles = warm.head._2
    (1 to Rounds).foreach { round =>
      legs.foreach { c =>
        val (_, _, secs) = runLeg(c, input)
        times(c) ::= secs
        System.err.println(f"[bench] flagship leg=$c round=$round sec=$secs%.2f")
      }
    }
    def best(c: Int): Double = times(c).min
    def remeasure(c: Int): Unit = (1 to RemeasureRuns).foreach { _ =>
      val (_, _, secs) = runLeg(c, input)
      times(c) ::= secs
      System.err.println(f"[bench] flagship re-measure leg=$c sec=$secs%.2f")
    }

    // sanity gates (min-statistics: noise only inflates a leg, so the gate
    // identifies WHICH leg is still inflated and re-measures it once)
    def effOf(lo: Int, hi: Int): Double = (best(lo) / best(hi)) / (hi.toDouble / lo)
    var anomaly: Option[String] = None
    if (effOf(2, 8) > 1.05) remeasure(2) // 2-core leg inflated → eff impossibly > 1
    else if (effOf(2, 8) < 0.65) remeasure(8) // 8-core leg inflated → eff implausibly low
    if (effOf(2, 8) > 1.05 || effOf(2, 8) <= 0)
      anomaly = Some(f"headline 2->8 efficiency ${effOf(2, 8)}%.3f outside (0, 1.05] after re-measure")
    else if (effOf(2, 8) < 0.65) // still implausibly low → say so, per the documented protocol
      anomaly = Some(f"headline 2->8 efficiency ${effOf(2, 8)}%.3f below 0.65 after re-measure")
    if (queryErrors.nonEmpty)
      anomaly = Some((anomaly.fold("")(_ + "; ")) +
        s"${queryErrors.size} catalog queries threw (see query_errors); total covers the passing queries only")
    if (canaryDrift > 2.0)
      anomaly = Some(anomaly.fold("")(_ + "; ") +
        f"host-noise canary drifted ${canaryDrift}%.2fx across passes (canary_samples) — " +
          "per-query numbers from the slow pass are host noise, min() rejects them")
    if (legs.length > 2 && best(cpus) > best(8)) {
      remeasure(cpus) // more cores must never be SLOWER than fewer
      if (best(cpus) > best(8))
        anomaly = Some(anomaly.fold("")(_ + "; ") +
          f"$cpus-core leg (${best(cpus)}%.1f s) slower than 8-core (${best(8)}%.1f s) after re-measure")
    }

    val secsLow = best(2); val secsMid = best(8); val secsHigh = best(cpus)
    val tpsLow = tiles / secsLow; val tpsMid = tiles / secsMid; val tpsHigh = tiles / secsHigh
    val efficiency = effOf(2, 8)
    val efficiencyHigh = effOf(8, cpus)

    val flagshipJson =
      s"""{"tiles":$tiles,"input":"$input","protocol":"interleaved, warm, best of ${Rounds}+ per leg, gated (0,1.05]",""" +
      s""""cpus_low":2,"cpus_high":8,"sec_low":${r3(secsLow)},"sec_high":${r3(secsMid)},""" +
      s""""tiles_per_sec_low":${r3(tpsLow)},"tiles_per_sec_high":${r3(tpsMid)},""" +
      s""""scaling_efficiency":${r3(efficiency)},""" +
      // the saturated upper pair only exists when a third leg ran
      (if (cpus > 8)
        s""""pair_8_to_$cpus":{"sec_low":${r3(secsMid)},"sec_high":${r3(secsHigh)},""" +
        s""""tiles_per_sec_low":${r3(tpsMid)},"tiles_per_sec_high":${r3(tpsHigh)},""" +
        s""""scaling_efficiency":${r3(efficiencyHigh)}},"""
      else "") +
      anomaly.fold("")(a => s""""anomaly":"$a",""") +
      s""""note":"headline pair 2->8 cores (below this VM's ~16-thread memory-path saturation; see BENCH/BASELINE.md)"}"""
    val qs = results.map { m =>
      "\"" + m.name + "\":" + m.secs.fold("\"error\"")(v => r3(v).toString)
    }.mkString("{", ",", "}")
    // both raw samples per query, in pass order (null = that pass threw):
    // lets a post-hoc reader SEE a stall window instead of inferring it
    val qSamples = results.map { m =>
      "\"" + m.name + "\":" +
        m.samples.map(_.fold(_ => "null", v => r3(v).toString)).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // JSON-escape AFTER truncating (a cut mid-escape would leave a dangling
    // backslash) and cover control characters — Spark exception messages
    // embed plan fragments full of newlines
    def jesc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val errsJson =
      if (queryErrors.isEmpty) ""
      else queryErrors.map { case (n, e) =>
        "\"" + n + "\":\"" + jesc(e.take(200)) + "\""
      }.mkString(""""query_errors":{""", ",", "},")
    val total = r3(results.flatMap(_.secs).sum)
    val protocol = "min over 2 interleaved catalog passes + adaptive 3rd for >3x disputes, cache-cleared, canary per pass"
    val canaryJson = canarySamples.map(r3).mkString("[", ",", "]")
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","query_protocol":"$protocol",""" +
      s""""canary_samples":$canaryJson,"canary_drift":${r3(canaryDrift)},""" +
      s""""errors":${queryErrors.size},$errsJson"queries":$qs,"query_samples":$qSamples,"sf":"$sfDir","flagship":$flagshipJson}"""
    val shortJson =
      s"""{"metric":"total","value":$total,"unit":"sec","query_protocol":"$protocol","n_queries":${results.size},""" +
      s""""canary_drift":${r3(canaryDrift)},""" +
      s""""errors":${queryErrors.size},"queries_file":"BENCH_LAST.json","sf":"$sfDir","flagship":$flagshipJson}"""

    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LAST.json"),
      (fullJson + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => }
    // full record once for the log; the SHORT summary is the very last line
    // (the driver keeps only a tail window — round 2's 3 KB line was
    // truncated mid-JSON and failed to parse)
    println(fullJson)
    println(shortJson)
    System.out.flush()
  }
}
