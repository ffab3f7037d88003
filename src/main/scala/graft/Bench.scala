package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Median of the per-query host-speed stamps (ms). Pure so BenchSpec
    * can pin the adjudication math without running a bench.
    */
  def medianOf(vs: Array[Double]): Double = {
    val s = vs.sorted
    if (s.isEmpty) 0.0
    else if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  /** Stamp-normalized total (seconds at the clean-floor host speed):
    * `total × floor/stampMedian` — the adjudication BASELINE.md's stamp
    * ladder does by hand. This is the artifact's `normalized` field as
    * of r18 and takes PRECEDENCE over `calibration_s` for cross-window
    * comparison: the one-shot calibration probe samples host speed at
    * ONE instant and a transient stall there over-corrects the whole
    * run (r17: the WORSE 146.6 s close run read normalized 36.2,
    * out-ranking the better window's 54.3 and masquerading as an
    * all-time record). The stamp median samples host speed next to
    * EVERY row, so a contended run normalizes against its own
    * contention and can never out-rank a cleaner window of the same
    * engine. `calibration_s` stays in the artifact as a secondary
    * datum (start-of-run host state).
    */
  def stampNormalized(total: Double, stampMedianMs: Double,
      floorMs: Double): Double =
    if (stampMedianMs > 0.0 && floorMs > 0.0) total * floorMs / stampMedianMs
    else 0.0

  /** The per-query entries of the FINAL compact stdout line (r19).
    *
    * Through r18 the final line carried "the slowest queries that fit
    * the 1700-char budget" — but which queries make that cut changes
    * run-to-run with host noise, so the driver's round-over-round
    * per-query diff (which parses only the tail line) manufactured
    * phantom `dropped_from_bench`/`new_in_bench` statuses: PERF_r18
    * reported 13 "dropped" + 10 "new" queries when all 161 ran in both
    * rounds (r18 verdict, "What's wrong" item 3). The fix is a FIXED
    * roster: exactly the 51 query names that appear in the committed
    * BENCH_r18.json final line, so consecutive rounds' tail lines carry
    * the identical key set and the driver's diff is phantom-free. The
    * full 161-query map still rides the first stdout line and
    * BENCH_DETAIL.json (committed at close) — nothing is lost, only the
    * compact line's SELECTION is pinned. Roster names are a subset of
    * the registry (BenchSpec pins this), and the registry itself never
    * drops or renames entries (the driver contract).
    */
  val tailRoster: Seq[String] = Seq(
    "q_dup_spans", "q_topk_range", "q_sql_subqueries", "q_pack_chunks",
    "q_curate_segments", "q_retention", "q_sample_diverse", "q_domain_mix",
    "q_agg_minmax_by", "q_vec_centroid_assign", "q_curate_containment",
    "q_sql_q3", "q_search_hybrid", "q_knn_pq", "q_scan_jsonl_stream",
    "q_neardup_containment", "q_source_overlap", "q_curate_semantic",
    "q_dedup_asof", "q_dedup_simhash", "q_knn_lsh", "q_bm25",
    "q_agg_distinct", "q_agg_bitagg", "q_knn_collapse", "q_dedup_normalized",
    "q_sql_recursive", "q_knn_graph", "q_domain_resample", "q_join_smj",
    "q_agg_cube", "q_topk_merge", "q_scan_orc", "q_quality_gopher",
    "q_distinct_days", "q_knn_ivf", "q_scan_csv", "q_tfidf", "q_vec_drift",
    "q_stream_session", "q_text_langid", "q_join_asof", "q_join_full",
    "q_events_attribution", "q_topk_group", "q_quality_logprob",
    "q_agg_listagg", "q_events_funnel", "q_events_anomaly",
    "q_decontaminate_semantic", "q_join_inner")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the round-3 driver contract runs local[32] with 32 shuffle
    // partitions; SPARK_GRAFT_CPUS overrides for local iteration
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (scheduler, codegen, shuffle machinery) so the
    // first timed query doesn't absorb one-time boot cost.
    spark.range(1000).selectExpr("sum(id)").collect()
    // Host-speed calibration probe: a fixed synthetic workload (hash +
    // shuffle + sort over 20M longs) whose cost depends only on the
    // machine, never on engine code or fixtures. Rounds 7-9 each burned
    // an adjudication on "regression or host drift?" (BASELINE.md's
    // commit A/B re-benched an identical commit 27% slower day-over-day);
    // carrying the probe in-band lets any future A/B normalize:
    // total/calibration is comparable across windows, total alone is not.
    val cal0 = System.nanoTime()
    spark.range(20000000L)
      .selectExpr("xxhash64(id) % 1024 as k", "id")
      .groupBy("k").count().orderBy("k").collect()
    val calibration = (System.nanoTime() - cal0) / 1e9
    // Per-query micro-calibration: the start-of-run probe adjudicates a
    // WHOLE run, but a roving host stall (r11: ~10 rows inflated 5-15×
    // in the driver capture while start-time calibration read clean)
    // contaminates specific rows. A ~50 ms probe after each query — the
    // same host-only kernel at 1/32 scale — stamps every row with the
    // host speed IT ran next to: a stalled row carries its own elevated
    // cal_ms in the driver's artifact, so adjudication needs no
    // out-of-band rerun. Probe time is outside the query timing and the
    // total (both measure engine work only).
    // single-partition, shuffle-free kernel: one task of pure hashing.
    // The first probe shape (32-task shuffle at 1/32 scale) measured
    // mostly job-submission overhead (~320 ms median at 32 cores vs the
    // ~50 ms its compute share predicts) — scheduler noise, which hides
    // exactly the per-row host stalls the stamp exists to expose.
    def microCal(): Double = {
      val t0 = System.nanoTime()
      // bit_xor, not sum: summing 5M hashes overflows Long under ANSI
      spark.range(0L, 5000000L, 1L, 1)
        .selectExpr("bit_xor(xxhash64(id)) as s").collect()
      (System.nanoTime() - t0) / 1e6
    }
    microCal() // warm the probe's own codegen before the first stamp
    // Family-cache warm-up rows: the session memo builds (verified pair
    // frames, cluster labels, curate reasons, the contract graph) are
    // ONE-TIME costs that otherwise land on whichever contract row the
    // registry's iteration order runs first — adding a key re-shuffles
    // that order and per-row trends break (the r15 q_curate_semantic
    // 8.25 s mystery was exactly this). Price each build in its own
    // named row; "value" still includes them so totals stay comparable
    // with pre-warm rounds, and the per-query rows now measure only
    // their own compose + execution.
    val warm = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    (graft.queries.TextOps.warmFamilies(spark, sfDir) ++
        graft.queries.VectorOps.warmFamilies(spark, sfDir)).foreach {
      case (name, thunk) =>
        val w0 = System.nanoTime()
        // a failed warm build must be loud IN THE JSON like a failed
        // query (the round-9 rule): its row would otherwise read as a
        // successful build price while the first consumer silently
        // re-pays the memo — corrupting exactly the per-row trend the
        // warm rows exist to protect
        // a failed build records 0.0, not its partial elapsed: `value`
        // must only ever price SUCCESSFUL builds (the first consumer
        // re-pays the memo, so counting the partial build would both
        // double-count and skew cross-round totals); the warm:<name>
        // entry in `failed` carries the loud signal
        try {
          thunk()
          warm += name -> ((System.nanoTime() - w0) / 1e9)
        } catch { case t: Throwable =>
          System.err.println(s"[bench] warm $name FAILED: ${t.getMessage}")
          failed += s"warm:$name"
          warm += name -> 0.0
        }
    }
    val calMs = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failed query must be LOUD *inside the JSON*, not a
      // suspiciously-fast row distinguishable only on stderr (round 9:
      // 26 fixture-broken queries looked like 0.07 s successes in
      // BENCH_r09.json). Record the name for the "failed" field and keep
      // the timing row so the queries map stays complete.
      try { fn(spark, sfDir).count() } catch {
        case t: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${t.getClass.getName}: ${t.getMessage}")
          failed += name
      }
      val sec = (System.nanoTime() - t0) / 1e9
      calMs += name -> microCal()
      name -> sec
    }
    // The driver captures only the LAST ~2000 chars of run output and
    // parses the JSON line out of that tail. With 100 queries a full
    // per-query map is ~2.2k chars, so its head (the `{"metric"` prefix)
    // fell outside the window in rounds 4–5 → `parsed: null`. Emit the
    // full detail to a file + an early stdout line (greppable, allowed to
    // be truncated in the tail), and keep the FINAL line — the one inside
    // the tail window — compact: total + the slowest queries that fit.
    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // Window self-labeling (r16 verdict task 1): the committed r16 close
    // artifact was a worst-window 566.8 s run that read as a 4.4×
    // regression to anyone not cross-reading BASELINE.md's stamp log.
    // Carry the adjudication IN the artifact: the median per-query stamp
    // vs the 38.96 ms all-time clean floor (BASELINE.md r13) classifies
    // the window, so a contaminated run can never masquerade as the
    // engine's number.
    // the clean floor is HOST-SPECIFIC (this machine's r13 best stamp);
    // on different hardware override via GRAFT_STAMP_FLOOR_MS so clean
    // windows can still self-identify (review catch r17)
    val StampFloorMs = sys.env.get("GRAFT_STAMP_FLOOR_MS")
      .flatMap(v => scala.util.Try(v.toDouble).toOption)
      .getOrElse(38.96)
    val stampMedian: Double = medianOf(calMs.values.toArray)
    val windowQuality =
      if (stampMedian <= 0.0) "unknown"
      else if (stampMedian <= StampFloorMs * 1.25) "clean"     // ≤ ~48.7 ms
      else if (stampMedian <= StampFloorMs * 2.0) "contended"  // ≤ ~77.9 ms
      else "degraded"
    // any failure is carried in-band: a "failed" name array plus a count,
    // present in BOTH the detail file and the compact tail line, so a
    // broken query can never masquerade as a fast success in BENCH_r*.json
    val failJson =
      s""","n_failed":${failed.size},"failed":${failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
    def line(entries: Iterable[(String, Double)], total: Double,
        cal: Iterable[(String, Double)] = Nil): String = {
      val qs = entries.map { case (k, v) => "\"" + k + "\":" + f(v) }
        .mkString("{", ",", "}")
      // per-query probe stamps ride only in the FULL line (detail file):
      // they would blow the compact tail line's budget, and stall
      // adjudication reads the artifact, not the tail
      val calJson =
        if (cal.isEmpty) ""
        else cal.map { case (k, v) => "\"" + k + "\":" + f(v) }
          .mkString(""","cal_ms":{""", ",", "}")
      // the per-family warm rows (tiny, fixed count) ride in BOTH lines:
      // build-vs-query split is the adjudication signal
      val warmJson = warm.map { case (k, v) => "\"" + k + "\":" + f(v) }
        .mkString(""","warm_s":""" + f(warm.values.sum) + ""","warm":{""",
          ",", "}")
      // normalized = stamp-floor-equivalent total (seconds) — see
      // [[stampNormalized]] for why the per-query stamp median, not the
      // one-shot calibration probe, is the adjudicator (r17 verdict
      // task 1: the calibration form let a contended run out-rank a
      // better window). UNIT CHANGE vs pre-r18 artifacts: old
      // normalized was total/calibration_s (dimensionless, ~35-55);
      // new is seconds at the clean-floor host speed (~88 for r17's
      // best window). Cross-round trend reads must not mix the two.
      val norm = stampNormalized(total, stampMedian, StampFloorMs)
      s"""{"metric":"total","value":${f(total)},"unit":"sec","n":${results.size},"calibration_s":${f(calibration)},"normalized":${f(norm)},"stamp_median_ms":${f(stampMedian)},"window_quality":"$windowQuality"$failJson$warmJson,"queries":$qs$calJson,"sf":"$sfDir"}"""
    }
    // value = warm builds + per-query times: totals stay comparable with
    // pre-warm rounds, where the builds hid inside their first consumer
    val total = warm.values.sum +
      (if (results.nonEmpty) results.values.sum else 0.0)
    val full = line(results, total, calMs)
    println(full)
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"),
        (full + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () } // detail file is best-effort
    // Final compact line: the FIXED [[tailRoster]] (see its doc — a
    // run-dependent "slowest that fit" selection made the driver's
    // per-query diff manufacture phantom dropped/new statuses), ordered
    // slowest-first for readability, still budget-capped so the whole
    // line stays well inside the driver's tail window even after sbt's
    // `[success] Total time ...` trailer (~80 chars) is appended. The
    // budget only binds if per-row times gain digits wholesale; roster
    // rows are admitted slowest-first so any cut hits the cheapest rows.
    val budget = 1700
    val rosterSet = tailRoster.toSet
    val slowest = results.toSeq.filter(kv => rosterSet(kv._1)).sortBy(-_._2)
    val kept = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    var len = line(Nil, total).length
    slowest.foreach { case (k, v) =>
      val add = k.length + f(v).length + 5
      if (len + add <= budget) { kept += ((k, v)); len += add }
    }
    println(line(kept, total))
    spark.stop()
  }
}
