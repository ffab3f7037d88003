package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Banded-Hamming near-duplicate candidate generation over a 64-bit
  * hash column — the shared plan behind SimHash text dedup
  * ([[graft.queries.VectorOps.dedupSimhash]]) and perceptual-hash image
  * dedup ([[graft.extract.Multimodal.imageDedup]]).
  *
  * The 64-bit hash splits into `bands` equal slices; two rows become a
  * candidate pair iff they agree on at least one whole slice, so pairs
  * meet in a shuffle keyed by (band index, band value) — never all-pairs —
  * and only candidates pay the exact `bit_count` Hamming check. With
  * `maxHamming < bands` the pigeonhole guarantees recall 1; above it
  * (e.g. the 6-vs-4 defaults) recall stays high because near-dup bit
  * flips rarely spread across every band — and with radius-1
  * multi-probe ([[withFlipProbes]], the media surfaces' default) the
  * guarantee itself extends to `maxHamming < 2·bands`.
  *
  * Hot-bucket guard: the "never all-pairs" claim has a standard LSH
  * failure mode — a degenerate band value shared by a large row
  * population (the all-zero band of short docs, the aHash of flat/
  * low-contrast images) makes in-bucket pairs quadratic. Every candidate
  * join here therefore drops buckets whose population exceeds
  * `maxBucket`, with a loud warning per dropped bucket; at cap B the
  * per-bucket pair cost is bounded by B². The count rides the same
  * shuffle the join needs (a window over the bucket key), not an extra
  * scan.
  *
  * Recall cost of the guard, stated precisely: members of an over-cap
  * bucket can still meet through any OTHER band whose value is not
  * itself over-cap — but when a cluster of > `maxBucket` rows carries
  * IDENTICAL hashes (boilerplate/empty docs, flat images), every band
  * bucket of that cluster is the same degenerate population and the
  * quadratic join alone would lose every pair among them. The
  * `rescueHot` star-edge rescue closes that hole where it is sound:
  * each over-cap bucket additionally emits (min-id member, every other
  * member) candidate pairs — LINEAR in bucket population, so an
  * identical-content cluster still collapses (every member meets the
  * representative; connected components closes the rest) at O(B) extra
  * verifies instead of O(B²) join rows. Rescue defaults ON for
  * [[bucketedPairs]]/[[probedPairs]] because every caller there runs an
  * exact verify (Jaccard / cosine / knn distance) on candidates, so a
  * star edge between merely-band-colliding rows costs one verify and is
  * then discarded — it can never admit a false pair. It defaults OFF
  * for [[pairs]], where the 64-bit hash IS the verdict (SimHash text,
  * aHash images): an over-cap bucket there means a degenerate hash
  * value (flat images, empty docs) whose members would "verify" at
  * Hamming 0 despite being genuinely different content — the drop is
  * the correct semantic, and exact dedup beforehand (the
  * [[graft.queries.TextOps.curate]] stage order) is the sanctioned way
  * to collapse truly identical content first.
  */
object BandedHamming {

  /** Buckets above this population are dropped from candidate
    * generation. 10⁵ bounds any single bucket's pair blow-up at 10¹⁰
    * comparisons — loud long before that — while sitting far above any
    * non-degenerate LSH bucket at sane banding (buckets should hold
    * tens of rows; a miscalibrated scheme shows up in the warning).
    */
  val DefaultMaxBucket: Int = 100000

  /** Derived SimHash banding (r18 — the knnLshAt discipline applied to
    * the fixed 4×16 choice, whose exact-band misses read 0.879
    * exact-J0.5 recall at sf0.1 and drifted DOWN with scale): pick the
    * (bands, multiProbe) pair that makes candidate generation
    * pigeonhole-EXHAUSTIVE for `maxHamming` while expected bucket
    * population stays under `maxBucket`/4.
    *
    *  - small corpora: (8, false) — 8-bit bands; d < 8 forces some
    *    band to match exactly, so every pair the d ≤ 6 gate can accept
    *    IS a candidate. Measured (SimhashGrid, BASELINE.md r18): lifts
    *    exact-J0.5 recall to the gate's own ceiling at all 3 SFs
    *    (0.929/1.000/0.926 vs 0.929/0.920/0.879 for 4×16 exact), and
    *    is the CHEAPER config through at least 120k docs (8.1 s vs
    *    29.3 s at 60k, 25.3 vs 121.5 at 120k on the jittered ×N
    *    corpora — the probe config re-finds every dup-cluster pair up
    *    to 2·17·bands times before its distinct).
    *  - large corpora: (4, true) — 16-bit bands + radius-1 flip
    *    probes, same d ≤ 7 guarantee (all four bands ≥ 2 flips needs
    *    d ≥ 8). 8-bit candidate volume grows ~n²/64 (only 256 bucket
    *    values per band, so the hot-bucket guard cannot bound it until
    *    buckets hit the cap at n = 256·maxBucket), while this config's
    *    in-bucket pairs shrink 512× and its probe cost is ~linear.
    *
    * The switch point is the measured-cost crossover, NOT the cap
    * bound the r18 first cut used (64·maxBucket ≈ 6.4M — falsified by
    * the SimhashGrid scale rows: extrapolating the measured quadratic,
    * 8×8 at 6.4M would pay hours against the probe config's minutes).
    * Wall at 120k: 8×8 ≈ 22 s growing ×(n/120k)², probe ≈ 121 s
    * growing ~linearly → crossover ≈ 5.5×120k ≈ 2¹⁹. The cap bound
    * stays as the secondary constraint for small explicit caps.
    *
    * Past ~1.6B rows expected 16-bit buckets re-approach the cap —
    * partition the corpus (by source/shard) or pass explicit knobs
    * there. Requires maxHamming ≤ 7: both configurations' guarantees
    * stop at d = 7, and a derived default that silently under-covers a
    * wider gate would be the r17 LshGrid bug again.
    */
  def simhashBanding(n: Long, maxHamming: Int = 6,
      maxBucket: Int = DefaultMaxBucket): (Int, Boolean) = {
    require(maxHamming <= 7,
      s"derived banding is exhaustive only to hamming 7, got $maxHamming" +
        " — pass explicit bands/multiProbe for wider gates")
    if (n <= math.min(64L * maxBucket, 1L << 19)) (8, false) else (4, true)
  }

  /** Rows the guard pulled out of the quadratic candidate join (they may
    * still surface through star-edge rescue) — diagnostic telemetry for
    * tests and local-mode runs. At-least-once: the candidate self-join
    * evaluates the guarded subtree from both branches (and retries
    * re-run filters), so counts can double; per-executor in a real
    * cluster. The authoritative signal is the per-bucket WARN log line.
    */
  def droppedHotBucketRows: java.util.concurrent.atomic.AtomicLong =
    org.apache.spark.sql.graft.WarnHotBucket.droppedRows

  /** The single bucket-population pass every guard/rescue shape derives
    * from: one UNORDERED window keyed by the bucket tuple (the exact
    * shuffle key the downstream candidate join uses — no extra scan, and
    * no sort: the r7 guard's `row_number` marker forced a per-bucket
    * sort; the min-id row is the same unique marker for free) computing
    * each row's bucket population `__n` and the bucket representative
    * `__rep` = min (id, carried cols) struct. The quadratic-join input,
    * the star-edge rescue, the probe-side rep table and the warn marker
    * are all filters over THIS one frame, so their physical plans share
    * the same exchange+window subtree (exchange reuse) instead of
    * re-shuffling per shape.
    */
  private[graft] def markBuckets(d: DataFrame, idCol: String,
      bucketCols: Seq[String], carryCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(bucketCols.map(col): _*)
    d.withColumn("__n", count(lit(1)).over(w))
      .withColumn("__rep",
        min(struct((col(idCol) +: carryCols.map(col)): _*)).over(w))
  }

  /** Rows of small-enough buckets — the quadratic join's input. The
    * over-cap bucket's min-id row carries the warning (codegen'd
    * WarnHotBucket — no interpreted UDF enters the plan; `hit` returns
    * false so the marker row is dropped with the rest).
    */
  private[graft] def keepSmall(marked: DataFrame, idCol: String,
      bucketCols: Seq[String], maxBucket: Int): DataFrame =
    marked.filter(col("__n") <= maxBucket ||
        (col(idCol) === col("__rep").getField(idCol) &&
          org.apache.spark.sql.graft.WarnHotBucket.column(
            concat_ws(",", bucketCols.map(c => col(c).cast("string")): _*),
            col("__n"))))
      .drop("__n", "__rep")

  /** Star edges of over-cap buckets: (bucket min id, each other member) —
    * linear in bucket population, the rescue that keeps an identical-
    * content cluster connected after [[keepSmall]] pulls it out of the
    * quadratic join (see the guard note above). Distinct is the caller's
    * job (the same cluster is over-cap in every band, so each band
    * re-emits the same edges).
    */
  private def starEdges(marked: DataFrame, idCol: String,
      maxBucket: Int): DataFrame =
    marked.filter(col("__n") > maxBucket &&
        col(idCol) =!= col("__rep").getField(idCol))
      .select(col("__rep").getField(idCol).as("id1"), col(idCol).as("id2"))

  /** Distinct candidate pairs (id1 < id2) of rows sharing a bucket — the
    * generic LSH candidate join: rows meet iff every `bucketCols` value
    * matches, i.e. the shuffle is keyed by the bucket tuple, never
    * all-pairs. Shared by MinHash (bucket = (band, sig)), SimHash/aHash
    * (via [[pairs]]) and hyperplane cosine LSH (bucket = (band, bits)).
    * Buckets above `maxBucket` rows leave the quadratic join with a
    * warning; with `rescueHot` (default — all callers exact-verify
    * candidates) they contribute linear star edges instead of vanishing
    * (see the hot-bucket guard note above).
    */
  def bucketedPairs(df: DataFrame, idCol: String, bucketCols: Seq[String],
      maxBucket: Int = DefaultMaxBucket,
      rescueHot: Boolean = true): DataFrame =
    bucketedPairRows(df, idCol, bucketCols, maxBucket, rescueHot).distinct()

  /** [[bucketedPairs]] WITHOUT the cross-band dedup — the same (id1 <
    * id2) pair rows, with a pair repeated once per band it collides in
    * (plus its rescue edge when its bucket is over-cap). For a caller
    * whose per-candidate verification is CHEAP relative to a shuffle
    * (e.g. one codegen'd dot product), deduplicating after the verify
    * filter is the same set at a fraction of the exchanged bytes: the
    * distinct here is a full shuffle of every candidate pair, and a
    * deterministic per-pair filter commutes with dedup
    * (σ∘distinct = distinct∘σ). Measured on the r19 cosine-LSH warm
    * build (2-bit bands keep ~89% of all pairs, verify keeps 4057 of
    * 1.78M): the distinct exchanged 4.0M rows to save ~2.2M broadcast-
    * join probes — see OPTIMIZATION_r19.md.
    */
  def bucketedPairRows(df: DataFrame, idCol: String, bucketCols: Seq[String],
      maxBucket: Int = DefaultMaxBucket,
      rescueHot: Boolean = true): DataFrame = {
    val marked = markBuckets(
      df.select((col(idCol).as("__id") +: bucketCols.map(col)): _*),
      "__id", bucketCols, Nil)
    val d = keepSmall(marked, "__id", bucketCols, maxBucket)
    val cond = bucketCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _) && col("a.__id") < col("b.__id")
    val quad = d.as("a").join(d.as("b"), cond)
      .select(col("a.__id").as("id1"), col("b.__id").as("id2"))
    if (rescueHot) quad.union(starEdges(marked, "__id", maxBucket))
    else quad
  }

  /** Asymmetric probe form of [[bucketedPairs]] — the ANN-query shape:
    * candidate (probe id, base id) pairs sharing a bucket, deduplicated
    * across bands. The join is keyed by the bucket tuple, so at corpus
    * scale it shuffles by bucket — never probe × corpus — and when the
    * probe side is small (the usual ANN case) AQE broadcasts it so the
    * corpus never moves at all. The corpus side gets the hot-bucket
    * guard (a degenerate bucket would otherwise cost |probe|·|bucket|);
    * self-matches are NOT filtered here — the caller owns identity
    * semantics (probe ids need not be base ids). With `rescueHot`
    * (default — every caller exact-verifies), an over-cap BASE bucket
    * still surfaces through its min-id representative: probes landing in
    * it pair with the rep (one candidate instead of |bucket| — for the
    * degenerate identical-content bucket that one verify is exactly as
    * informative, and for a mere band collision it is one wasted verify
    * instead of zero recall).
    */
  def probedPairs(probe: DataFrame, base: DataFrame, probeIdCol: String,
      baseIdCol: String, bucketCols: Seq[String],
      maxBucket: Int = DefaultMaxBucket,
      rescueHot: Boolean = true): DataFrame =
    probedPairRows(probe, base, probeIdCol, baseIdCol, bucketCols,
      maxBucket, rescueHot).distinct()

  /** [[probedPairs]] WITHOUT the cross-band dedup — the probe-side twin
    * of [[bucketedPairRows]]: the same (probe id, base id) rows, one per
    * band collision (plus rescue rows). At production scale the probe
    * candidates are |batch| × collision-rate × |corpus| rows, so for a
    * caller whose verification is one codegen'd expression the built-in
    * distinct is the single largest exchange of the probe — defer it to
    * the verified survivors (same set: a deterministic per-pair filter
    * commutes with dedup).
    */
  def probedPairRows(probe: DataFrame, base: DataFrame, probeIdCol: String,
      baseIdCol: String, bucketCols: Seq[String],
      maxBucket: Int = DefaultMaxBucket,
      rescueHot: Boolean = true): DataFrame = {
    val p = probe.select((col(probeIdCol).as("__pid") +: bucketCols.map(col)): _*)
    val marked = markBuckets(
      base.select((col(baseIdCol).as("__bid") +: bucketCols.map(col)): _*),
      "__bid", bucketCols, Nil)
    val b = keepSmall(marked, "__bid", bucketCols, maxBucket)
    val cond = bucketCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _)
    val quad = p.as("a").join(b.as("b"), cond)
      .select(col("a.__pid").as("id1"), col("b.__bid").as("id2"))
    val all = if (rescueHot) {
      // over-cap buckets reduced to their rep row — a tiny frame (few
      // degenerate values by construction) the probe side joins on the
      // same bucket key; AQE broadcasts it
      val reps = marked.filter(col("__n") > maxBucket &&
          col("__bid") === col("__rep").getField("__bid"))
        .select((col("__bid").as("__rep") +: bucketCols.map(col)): _*)
      quad.union(p.as("a").join(reps.as("b"), cond)
        .select(col("a.__pid").as("id1"), col("b.__rep").as("id2")))
    } else quad
    all
  }

  /** Pairs (id1, id2, hamming ≤ maxHamming), id1 < id2, over
    * `df(idCol, hashCol)`. The id column may be any orderable type.
    * Over-cap (band, value) buckets leave the quadratic join with a
    * warning. `rescueHot` defaults OFF here — the hash IS the verdict on
    * this surface (SimHash text, aHash images), so star edges inside a
    * degenerate bucket would "verify" at Hamming 0 despite genuinely
    * different content (flat images); see the guard note above. Turn it
    * on only when the caller exact-verifies pairs on the underlying
    * content afterwards.
    *
    * `multiProbe` adds radius-1 band probing ([[withFlipProbes]]): the
    * candidate guarantee rises from Hamming < `bands` to
    * Hamming < `2·bands` (≤ 7 at the 4-band default — which finally
    * COVERS the 6-bit default radius; without it, 4-6-bit pairs whose
    * flips span all four bands are silently missed) for a probe-side
    * ×(64/bands + 1) posting fan-out. The media surfaces turn it on;
    * SimHash text dedup keeps it off (its measured containment recall
    * prices the exact-band trade there).
    */
  /** Single-bit-flip probe postings beside the exact ones — radius-1
    * multi-probe ([[pairs]]' `multiProbe`, and the probe SIDE of an
    * asymmetric media probe): each exact (band, bandval) posting gains
    * `bits` sibling rows with one band-value bit flipped, so two hashes
    * become candidates iff SOME band differs by ≤ 1 bit. Pigeonhole:
    * a missed pair needs ≥ 2 flips in EVERY band — ≥ `2·bands` total —
    * so with 4 bands the candidate guarantee covers Hamming ≤ 7 (the
    * exact-match join alone only guarantees ≤ 3; the 4-6-bit gap was
    * the r14-advice finding). Cost: probe-side fan-out ×(bits + 1) —
    * 68 rows per 64-bit hash at 4×16 banding — on ONE side of the
    * join only; the stored/base side keeps its `bands` exact postings,
    * so bucket populations (and the hot-bucket guard) are unchanged.
    */
  private[graft] def withFlipProbes(exploded: DataFrame, bits: Int)
      : DataFrame =
    exploded.unionByName(
      exploded
        .withColumn("__flip",
          explode(sequence(lit(0), lit(bits - 1))))
        .withColumn("bandval",
          expr("bandval ^ shiftleft(CAST(1 AS BIGINT), __flip)"))
        .drop("__flip"))

  /** Identical-hash collapse (r18): exact-duplicate content (and any
    * hash-identical rows) enters candidate generation as ONE
    * representative row per distinct hash value, not one row per member.
    *
    * Why: on exact-dup-dense corpora — the norm for raw crawl text and
    * the very thing a dedup operator is pointed at — a k-member
    * identical-hash cluster lands all k rows in the SAME bucket of
    * every band, so the quadratic candidate join pays k²·bands joined
    * rows and the distinct collapses each of the C(k,2) pairs bands
    * (×2·(bits+1) with probing) times. Collapsed, the cluster is one
    * row per band: the candidate join and its distinct run over
    * DISTINCT hashes, and member pairs are reconstructed afterwards by
    * joining the (hash → members) frame — each pair emitted exactly
    * once, and the within-cluster C(k,2) expansion (the OUTPUT's own
    * size, irreducible) pays one hash-keyed join instead of riding the
    * banded shuffle ×bands.
    *
    * Results are bit-identical to the per-member form in EVERY regime,
    * including hot-bucket drops ([[pairsReference]] is kept as the
    * oracle and BandedCollapseSpec pins equality on randomized corpora
    * with planted identical clusters and tiny caps):
    *  - bucket populations stay MEMBER-weighted (`sum(cnt)` over the
    *    bucket window), so the guard fires in exactly the same regimes
    *    and warns with the same row counts;
    *  - members of one hash group share every bucket, so per-group
    *    keep/drop equals today's per-member keep/drop;
    *  - within-group (hamming 0) pairs are emitted iff the group
    *    survived the guard in ≥ 1 band — exactly when the quadratic
    *    join would have emitted them;
    *  - star-edge rescue expands to (bucket min member, every other
    *    member) through the same membership join.
    */
  def pairs(df: DataFrame, idCol: String, hashCol: String,
      bands: Int = 4, maxHamming: Int = 6,
      maxBucket: Int = DefaultMaxBucket,
      rescueHot: Boolean = false,
      multiProbe: Boolean = false): DataFrame = {
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    val bits = 64 / bands
    val mask = (1L << bits) - 1
    val members = df.select(col(idCol).as("__id"), col(hashCol).as("__h"))
    // ONE per-hash aggregate feeds everything downstream — the banding
    // representative (gid, member-weighted cnt) AND the sorted member
    // lists the expansions join (r19 fusion, second cut): two separate
    // aggregates paid two member-grain exchanges where one identical
    // exchange is REUSED across every reference of this subtree
    val grp = members.groupBy(col("__h"))
      .agg(min(col("__id")).as("__gid"), count(lit(1)).as("__cnt"),
        sort_array(collect_list(col("__id"))).as("__ids"))
    // __ids is projected OUT before the ×bands explode (§2.3 — member
    // lists must never ride the banded shuffle)
    val gex = grp.select(col("__gid"), col("__h"), col("__cnt"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bandval", expr(s"shiftright(__h, band * $bits) & $mask"))
    // member-weighted bucket populations: identical __n (and identical
    // warn lines/telemetry) to the per-member form
    val w = Window.partitionBy(col("band"), col("bandval"))
    val marked = gex
      .withColumn("__n", sum(col("__cnt")).over(w))
      .withColumn("__rep", min(struct(col("__gid"), col("__h"))).over(w))
    val banded = marked.filter(col("__n") <= maxBucket ||
        (col("__gid") === col("__rep").getField("__gid") &&
          org.apache.spark.sql.graft.WarnHotBucket.column(
            concat_ws(",", col("band").cast("string"),
              col("bandval").cast("string")), col("__n"))))
      .drop("__n", "__rep", "__cnt")
    // candidate DISTINCT-HASH pairs, deduplicated across bands at group
    // level (tiny vs the member-level stream), hamming-verified ONCE per
    // hash pair before any member expansion
    val gquad = if (!multiProbe) {
      banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bandval") === col("b.bandval") &&
            col("a.__gid") < col("b.__gid"))
        .select(col("a.__gid").as("g1"), col("b.__gid").as("g2"),
          col("a.__h").as("h1"), col("b.__h").as("h2"))
    } else {
      // exact+flip postings joined against the GUARDED exact postings
      // (band-distance ≤ 1 ⇒ candidate; see withFlipProbes). The probe
      // side is unguarded on purpose: a probe row landing in a dropped
      // hot bucket finds nothing (the guard removed the exact rows),
      // and probe rows are linear per input row. Each unordered pair
      // can surface from both directions — normalize via the id-ordered
      // struct so (g1, h1) stays the smaller id's hash, then distinct.
      val s1 = struct(col("a.__gid").as("i"), col("a.__h").as("h"))
      val s2 = struct(col("b.__gid").as("i"), col("b.__h").as("h"))
      withFlipProbes(gex.drop("__cnt"), bits).as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bandval") === col("b.bandval") &&
            col("a.__gid") =!= col("b.__gid"))
        .select(least(s1, s2).getField("i").as("g1"),
          greatest(s1, s2).getField("i").as("g2"),
          least(s1, s2).getField("h").as("h1"),
          greatest(s1, s2).getField("h").as("h2"))
    }
    val gcand = gquad.distinct()
      .withColumn("hamming", expr("bit_count(h1 ^ h2)"))
      .filter(col("hamming") <= maxHamming)
    // Expansion fusion (r19): ONE per-hash member-list aggregate
    // (hash → sorted member-id array) replaces the r18 form's three
    // member-grain operators — the two membership joins expanding cross
    // pairs, the members×members self-join producing within-group
    // pairs, and the star expansion's membership join — each of which
    // paid its own exchange over the member-grain frame. The arrays are
    // group-sized (the within-group C(k,2) expansion is the OUTPUT's
    // own size either way; a k-member array row is 8k bytes where the
    // self-join shuffled k rows), and every expansion below is a
    // map-side explode over the joined arrays instead of a shuffle.
    val mem = grp.select(col("__h"), col("__ids"))
    // expand candidate hash pairs to member pairs (h1 ≠ h2, so the two
    // array joins cannot overlap; ids normalized ascending)
    val cross = gcand
      .join(mem.select(col("__h").as("h1"), col("__ids").as("__ids1")), "h1")
      .join(mem.select(col("__h").as("h2"), col("__ids").as("__ids2")), "h2")
      .select(col("hamming"), explode(col("__ids1")).as("i1"), col("__ids2"))
      .select(col("hamming"), col("i1"), explode(col("__ids2")).as("i2"))
      // i1 ≠ i2 in any well-formed frame (h1 ≠ h2); the filter only
      // mirrors the per-member join's id inequality for malformed
      // duplicate-id inputs, where the reference also emits no self-pair
      .filter(col("i1") =!= col("i2"))
      .select(least(col("i1"), col("i2")).as("id1"),
        greatest(col("i1"), col("i2")).as("id2"), col("hamming"))
    // within-group pairs (hamming 0 ≤ maxHamming by construction): all
    // member pairs of every multi-member group the guard kept somewhere.
    // The left-semi equi-join on __h keeps null-hash groups out exactly
    // as the per-member self-join's `a.__h === b.__h` did; the sorted
    // array makes (earlier, later) slices the id1 < id2 order, and the
    // id1 ≠ id2 filter mirrors the self-join's strict `<` for malformed
    // duplicate-id inputs (sorted duplicates are adjacent slices). No
    // distinct on the semi-join's right side — semi-join semantics
    // ignore duplicates, and the r19 first cut's `.distinct()` here was
    // a full extra exchange of the banded frame for nothing.
    val survived = banded.select(col("__h"))
    val wg = mem.filter(size(col("__ids")) > 1)
      .join(survived, Seq("__h"), "left_semi")
      .select(col("__ids"), posexplode(col("__ids")).as(Seq("__p", "id1")))
      .select(col("id1"),
        explode(slice(col("__ids"), col("__p") + lit(2),
          size(col("__ids")))).as("id2"))
      .filter(col("id1") =!= col("id2"))
      .select(col("id1"), col("id2"), lit(0).as("hamming"))
      .filter(col("hamming") <= maxHamming)
    val expanded = cross.union(wg)
    val all = if (rescueHot) {
      // star edges of over-cap buckets, expanded to (bucket min member,
      // every other member) through the same member-list frame — the
      // member-level edge set the per-member form emits; they can
      // duplicate expanded pairs (and each other across bands), so the
      // rescue path pays one member-level distinct the default path
      // does not need
      val overcap = marked.filter(col("__n") > maxBucket)
        .select(col("__h"),
          col("__rep").getField("__gid").as("__repid"),
          col("__rep").getField("__h").as("__reph"))
      val star = overcap.join(mem, Seq("__h"))
        .select(col("__repid"), col("__reph"), col("__h"),
          explode(col("__ids")).as("__id"))
        .filter(col("__id") =!= col("__repid"))
        .select(col("__repid").as("id1"), col("__id").as("id2"),
          expr("bit_count(__reph ^ __h)").as("hamming"))
        .filter(col("hamming") <= maxHamming)
      expanded.union(star).distinct()
    } else expanded
    all.select(col("id1"), col("id2"), col("hamming"))
  }

  /** The pre-r18 per-member form of [[pairs]] — every hash-identical row
    * enters the banded candidate join individually. Kept as the
    * equivalence oracle for the identical-hash collapse
    * (BandedCollapseSpec pins `pairs == pairsReference` on randomized
    * corpora across every (bands, multiProbe, rescueHot, maxBucket)
    * regime) and as the baseline arm of the SimhashGrid A/B.
    */
  private[graft] def pairsReference(df: DataFrame, idCol: String,
      hashCol: String, bands: Int = 4, maxHamming: Int = 6,
      maxBucket: Int = DefaultMaxBucket,
      rescueHot: Boolean = false,
      multiProbe: Boolean = false): DataFrame = {
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    val bits = 64 / bands
    val mask = (1L << bits) - 1
    val exploded = df.select(col(idCol).as("__id"), col(hashCol).as("__h"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bandval", expr(s"shiftright(__h, band * $bits) & $mask"))
    val marked = markBuckets(exploded,
      "__id", Seq("band", "bandval"), Seq("__h"))
    val banded = keepSmall(marked, "__id", Seq("band", "bandval"), maxBucket)
    val quad = if (!multiProbe) {
      banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bandval") === col("b.bandval") &&
            col("a.__id") < col("b.__id"))
        .select(col("a.__id").as("id1"), col("b.__id").as("id2"),
          col("a.__h").as("h1"), col("b.__h").as("h2"))
    } else {
      val s1 = struct(col("a.__id").as("i"), col("a.__h").as("h"))
      val s2 = struct(col("b.__id").as("i"), col("b.__h").as("h"))
      withFlipProbes(exploded, bits).as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bandval") === col("b.bandval") &&
            col("a.__id") =!= col("b.__id"))
        .select(least(s1, s2).getField("i").as("id1"),
          greatest(s1, s2).getField("i").as("id2"),
          least(s1, s2).getField("h").as("h1"),
          greatest(s1, s2).getField("h").as("h2"))
    }
    val all = if (rescueHot) {
      val star = marked.filter(col("__n") > maxBucket &&
          col("__id") =!= col("__rep").getField("__id"))
        .select(col("__rep").getField("__id").as("id1"), col("__id").as("id2"),
          col("__rep").getField("__h").as("h1"), col("__h").as("h2"))
      quad.union(star)
    } else quad
    all.distinct()
      .withColumn("hamming", expr("bit_count(h1 ^ h2)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
  }
}
