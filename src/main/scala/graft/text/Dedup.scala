package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextOps._

/**
 * Deduplication family for web-scale corpora (builder mandate):
 * exact (hash-groupBy), MinHash+LSH (shingle -> minhash -> band ->
 * bucket-join -> exact-Jaccard verify), SimHash (band-join on signature
 * nibbles, exact Hamming verify), and exact n-gram-Jaccard via an
 * inverted shingle index.
 *
 * Scale notes: every pipeline is candidate-generation-by-equi-join (no
 * all-pairs product anywhere); the verify step touches only candidate
 * pairs. All hashes are md5-derived (TextKernels/SimHash) so the DuckDB
 * oracle reproduces every signature exactly. Tiebreaks are explicit
 * (min doc_id keeper, a<b pair order) — deterministic at any
 * parallelism.
 */
object Dedup {

  /** Default document-frequency cap for capped n-gram candidate
    * generation (the gate configuration; production corpora tune it). */
  val NgramMaxDf = 8

  /** Exact dedup: group by content hash, keep min id.
    * Returns (fp, n_dups, keeper). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("fp"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keeper"))

  /** All (id, shingle) occurrences (duplicates kept — min-aggregation
    * consumers don't need the distinct shuffle). */
  def docShinglesAll(df: DataFrame, idCol: String, textCol: String,
                     k: Int = 3): DataFrame =
    df.select(col(idCol).as("id"),
      explode(shingles(col(textCol), k)).as("shingle"))

  /** Distinct (id, shingle) pairs (the set semantics Jaccard needs). */
  def docShingles(df: DataFrame, idCol: String, textCol: String,
                  k: Int = 3): DataFrame =
    docShinglesAll(df, idCol, textCol, k).distinct()

  /** MinHash signatures: numHashes 32-bit minima. The hash family is
    * the md5 WORDS of salted shingles — md5(shingle || '#' || salt)
    * yields FOUR independent 32-bit hashes per digest, so 8 hashes
    * cost 2 digests per shingle (not 8). Words are projected to plain
    * columns before the min-aggregate so each digest runs once/row. */
  def minhash(sh: DataFrame, numHashes: Int = 8): DataFrame = {
    import graft.functions.md5_words
    require(numHashes % 4 == 0, "numHashes must be a multiple of 4")
    val nSalts = numHashes / 4
    val withWords = sh.select(
      col("id") +:
        (0 until nSalts).map(s => md5_words(
          if (s == 0) col("shingle")
          else concat(col("shingle"), lit(s"#$s"))).as(s"w$s")): _*)
    val flat = withWords.select(
      col("id") +:
        (0 until numHashes).map(i =>
          element_at(col(s"w${i / 4}"), i % 4 + 1).as(s"h$i")): _*)
    flat.groupBy("id").agg(
      min(col("h0")).as("m0"),
      (1 until numHashes).map(i => min(col(s"h$i")).as(s"m$i")): _*)
  }

  /** LSH band keys: the rowsPerBand signature values as NATIVE long
    * columns (k0, k1, ...) — the bucket self-join then runs on plain
    * longs, no per-row key-string building. Emits (id, band, k*). */
  def bands(sig: DataFrame, numHashes: Int = 8,
            rowsPerBand: Int = 2): DataFrame = {
    // fail fast like every sibling banding entry point: rowsPerBand >
    // numHashes would emit ZERO band rows (silently empty near-dup
    // result), a non-divisor would silently ignore the hash tail
    require(rowsPerBand >= 1 && numHashes % rowsPerBand == 0,
      s"rowsPerBand $rowsPerBand must divide numHashes $numHashes")
    val nBands = numHashes / rowsPerBand
    val bandCols = (0 until nBands).map { b =>
      struct((lit(b).as("band") +: (0 until rowsPerBand)
        .map(r => col(s"m${b * rowsPerBand + r}").as(s"k$r"))): _*)
    }
    val kCols = (0 until rowsPerBand).map(r => col(s"bk.k$r").as(s"k$r"))
    sig.select(col("id"), explode(array(bandCols: _*)).as("bk"))
      .select((col("id") +: col("bk.band").as("band") +: kCols): _*)
  }

  /** Drop rows of band buckets holding more than `cap` ids: the bucket
    * self-join is QUADRATIC in bucket size, so one boilerplate cluster
    * of 10^6 near-identical pages sharing a band bucket would emit
    * ~5*10^11 candidate pairs before any verify. The per-bucket count is
    * a partial-aggregating groupBy (no skewed window), and surviving
    * rows come back via an equi-join on the same keys. Dropped-bucket
    * accounting stays queryable: cappedBucketStats reports what a cap
    * would drop (no silent truncation). */
  def capBuckets(bandDf: DataFrame, cap: Int): DataFrame = {
    val keyCols = bandDf.columns.filter(c => c == "band" || c.startsWith("k")).toSeq
    val small = bandDf.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") <= cap)
      .drop("bucket_n")
    bandDf.join(small, keyCols)
  }

  /** SALVAGE policy for hot band buckets (the graded alternative to
    * capBuckets' binary keep/drop): buckets <= `cap` pair fully
    * (ksub = 0 — identical to the uncapped path); buckets between cap
    * and cap * `salvageFactor` split into ceil(n/cap) md5-salted
    * sub-buckets — the sub-bucket id becomes an extra join key, so
    * pairing runs within sub-buckets only and per-bucket join work
    * drops from n^2 to ~n*cap while every SAMPLED pair still goes
    * through the exact verify, i.e. strictly more survivors than
    * dropping, at identical precision; buckets beyond cap*salvageFactor
    * still drop entirely (bucketStats keeps the accounting honest).
    * The sub-bucket hash is the first md5 word of the id's decimal
    * string (DuckDB-reproducible, h32FromMd parity) and depends only on
    * (id, bucket size) — deterministic at any parallelism. */
  def capBucketsSalvage(bandDf: DataFrame, cap: Int,
                        salvageFactor: Int): DataFrame = {
    require(cap >= 1 && salvageFactor >= 1)
    val keyCols = bandDf.columns.filter(c => c == "band" || c.startsWith("k")).toSeq
    val counts = bandDf.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") <= cap.toLong * salvageFactor)
    val h32 = element_at(
      graft.functions.md5_words(col("id").cast("string")), 1)
    // ceil(n/cap) via truncating double division — DuckDB's int '/'
    // is DOUBLE too, so CAST(... AS BIGINT) on both sides agrees
    val nsub = ((col("bucket_n") + (cap - 1)) / cap).cast("long")
    bandDf.join(counts, keyCols)
      .withColumn("ksub", when(col("bucket_n") <= cap, lit(0L))
        .otherwise(pmod(h32, nsub)))
      .drop("bucket_n")
  }

  /** Three-tier accounting for the salvage policy — what a given
    * (cap, salvageFactor) pair would keep whole, salvage via
    * sub-buckets, and drop (the capBucketsSalvage companion to
    * bucketStats' keep/drop report; same no-silent-truncation
    * discipline). */
  def salvageStats(bandDf: DataFrame, cap: Int,
                   salvageFactor: Int): DataFrame = {
    val keyCols = bandDf.columns.filter(c => c == "band" || c.startsWith("k")).toSeq
    val hi = cap.toLong * salvageFactor
    bandDf.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("bucket_n"))
      .agg(count(lit(1)).as("n_buckets"),
        max(col("bucket_n")).as("max_bucket"),
        sum(when(col("bucket_n") <= cap, 1L).otherwise(0L))
          .as("n_kept_buckets"),
        sum(when(col("bucket_n") > cap && col("bucket_n") <= hi, 1L)
          .otherwise(0L)).as("n_salvaged_buckets"),
        sum(when(col("bucket_n") > hi, 1L).otherwise(0L))
          .as("n_dropped_buckets"),
        sum(when(col("bucket_n") > hi, col("bucket_n")).otherwise(0L))
          .as("n_dropped_rows"))
  }

  /** Bucket-size distribution over a band relation — the "what would a
    * cap drop" report callers log before committing to a cap. */
  def bucketStats(bandDf: DataFrame, cap: Int): DataFrame = {
    val keyCols = bandDf.columns.filter(c => c == "band" || c.startsWith("k")).toSeq
    bandDf.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("bucket_n"))
      .agg(count(lit(1)).as("n_buckets"),
        max(col("bucket_n")).as("max_bucket"),
        sum(when(col("bucket_n") > cap, 1L).otherwise(0L)).as("n_dropped_buckets"),
        sum(when(col("bucket_n") > cap, col("bucket_n")).otherwise(0L))
          .as("n_dropped_rows"))
  }

  /** The SINGLE bucket-policy dispatch shared by every band family
    * (minhash candidates, simhashPairs, hyperplane bandedCandidates):
    * None = exact semantics; cap only = keep/drop (capBuckets); cap +
    * salvageFactor = the three-tier keep/salvage/drop policy
    * (capBucketsSalvage — the sub-bucket id joins as an extra key via
    * the k-prefix convention). salvageFactor without a cap is a
    * contract error, not a silent no-op. */
  def applyBucketPolicy(bandDf: DataFrame, maxBucket: Option[Int],
                        salvageFactor: Option[Int]): DataFrame = {
    require(salvageFactor.isEmpty || maxBucket.isDefined,
      "salvageFactor requires maxBucket (the salvage tier refines a cap)")
    (maxBucket, salvageFactor) match {
      case (Some(cap), Some(f)) => capBucketsSalvage(bandDf, cap, f)
      case (Some(cap), None) => capBuckets(bandDf, cap)
      case (None, _) => bandDf
    }
  }

  /** Candidate pairs: ids sharing any band bucket, a < b, distinct.
    * Bucket policy per [[applyBucketPolicy]]. */
  def candidates(bandDf: DataFrame, maxBucket: Option[Int] = None,
                 salvageFactor: Option[Int] = None): DataFrame = {
    val capped = applyBucketPolicy(bandDf, maxBucket, salvageFactor)
    val keyCols = capped.columns.filter(c => c == "band" || c.startsWith("k"))
    val a = capped.alias("a"); val b = capped.alias("b")
    val keyEq = keyCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _)
    a.join(b, keyEq && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard over distinct shingle sets for given pairs. */
  def jaccard(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val common = pairs
      .join(sh.select(col("id").as("id_a"), col("shingle")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("n_a") + col("n_b") - col("common")).cast("double"))
  }

  /** Full MinHash-LSH near-dup pipeline: candidates verified by exact
    * Jaccard >= threshold. Returns (id_a, id_b, common, n_a, n_b,
    * jaccard).
    *
    * Scale shape (round-2 rework of the round-1 "distinct everything
    * first" pipeline, whose full-shingle-relation distinct shuffle
    * dominated the query):
    *  - the minhash path aggregates RAW shingle occurrences — min is
    *    idempotent over duplicates, and the map-side partial min-agg
    *    collapses each partition to numHashes longs per doc, so the
    *    only shuffle on this path is tiny;
    *  - the exact-Jaccard verify needs distinct shingle SETS, but only
    *    for docs that appear in a candidate pair — the shingle relation
    *    is semi-joined to the (small, LSH-pruned) candidate id set
    *    BEFORE its distinct, so the big distinct shuffle shrinks from
    *    |corpus shingles| to |candidate docs' shingles|.
    * Cache lifetime is the CALLER's (the returned plan references the
    * cached relations lazily); Verify/Bench clearCache between queries.
    */
  /** Candidate-pair count above which the verify-side semi-join stops
    * broadcasting the candidate id set (2 longs/pair — beyond this the
    * driver-collected broadcast is the OOM risk, and a shuffled
    * semi-join is the right plan anyway). */
  val BroadcastCandLimit = 4_000_000L

  /** Candidate-pair count below which the exact-Jaccard verify runs
    * SET-BASED: per-candidate-doc shingle sets via collect_set (ONE
    * map-side-combining shuffle of raw occurrences — replaces the
    * distinct shuffle of the full candidate shingle relation), then
    * two pair joins against the set relation and a per-pair array
    * intersection. Measured at 800k docs / 160k pairs: verify tail
    * 7.4 s -> 5.8 s at local[32], and at 100 TB the win is the
    * shuffled BYTES — the shingle relation crosses the wire once, not
    * three times. Above the limit, the pair-join formulation (jaccard)
    * is the right plan: everything shuffles, nothing is driver-
    * materialized, and per-row memory stays flat (no array rows).
    * Both paths produce identical values (set semantics either way). */
  val SetVerifyCandLimit = 200_000L

  /** Byte budget for BROADCASTING the set relation into the pair
    * joins. The pair count says nothing about document length — 150k
    * pairs of 100 KB documents carry tens of GB of shingles — so the
    * broadcast hint is gated on the MEASURED shingle volume of the
    * candidate docs (summed during the same aggregation that builds
    * the sets; an upper bound since raw occurrences count duplicates).
    * Over budget, the same set-based joins run shuffled — still one
    * shingle-relation shuffle + two set-relation shuffles, strictly
    * fewer bytes than the pair-join path. */
  val SetVerifyBroadcastBytes = 256L * 1024 * 1024

  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 threshold: Double = 0.4, numHashes: Int = 8,
                 rowsPerBand: Int = 2, k: Int = 3,
                 maxBucket: Option[Int] = None,
                 setVerifyLimit: Long = SetVerifyCandLimit,
                 setBroadcastBytes: Long = SetVerifyBroadcastBytes,
                 salvageFactor: Option[Int] = None): DataFrame = {
    val shAll = docShinglesAll(df, idCol, textCol, k)
    // signatures via the per-row kernel (round-6): one pass over the
    // corpus, no occurrence explode, no groupBy-min shuffle — md5 runs
    // once per distinct in-document shingle+salt. Bit-identical to
    // bands(minhash(shAll)) (DedupAnnSpec parity); docs shorter than k
    // tokens produce an empty signature and drop, exactly like the
    // aggregated path's absent row.
    val sig = df.select(col(idCol).as("id"),
        graft.functions.minhash_sigs(col(textCol), k, numHashes).as("mh"))
      .filter(size(col("mh")) > 0)
      .select(col("id") +: (0 until numHashes)
        .map(i => element_at(col("mh"), i + 1).as(s"m$i")): _*)
    val bnd = bands(sig, numHashes, rowsPerBand).cache()
    val cand = candidates(bnd, maxBucket, salvageFactor).cache()
    // no distinct: a semi-join right side tolerates duplicates, and the
    // distinct would cost one more (tiny but scheduled) shuffle
    val candIds = cand.select(col("id_a").as("id"))
      .union(cand.select(col("id_b").as("id")))
    // the count is over the CACHED cand, so it costs one traversal that
    // the verify join reuses; it gates BOTH broadcasts below — a
    // pathological corpus with huge LSH buckets falls back to shuffled
    // joins instead of OOMing the driver
    val nCand = cand.count()
    // BOTH branches gate the candIds broadcast on BroadcastCandLimit —
    // a caller who raises setVerifyLimit above it must not bypass the
    // driver-OOM guard the fallback path enforces (ADVICE r4 #1)
    val candIdsHinted =
      if (nCand <= BroadcastCandLimit) broadcast(candIds) else candIds
    if (nCand <= setVerifyLimit) {
      // `bytes` rides the same aggregation that builds the sets (raw
      // occurrences — an upper bound on the true set volume); cached so
      // the byte-gating count and both pair joins share one traversal
      // (caller-owned lifetime, the minhashLsh convention)
      val sets = shAll.join(candIdsHinted, Seq("id"), "left_semi")
        .groupBy("id").agg(collect_set(col("shingle")).as("ss"),
          sum(octet_length(col("shingle")).cast("long")).as("bytes"))
        .select(col("id"), col("ss"), size(col("ss")).cast("long").as("n"),
          col("bytes"))
        .cache()
      val totalBytes = sets.agg(coalesce(sum(col("bytes")), lit(0L)))
        .first().getLong(0)
      // the hint is gated on measured BYTES, not pair count — long
      // documents must not ride a driver-sized broadcast
      val hint: DataFrame => DataFrame =
        if (totalBytes <= setBroadcastBytes) df => broadcast(df)
        else df => df
      cand
        .join(hint(sets.select(col("id").as("id_a"),
          col("ss").as("ss_a"), col("n").as("n_a"))), Seq("id_a"))
        .join(hint(sets.select(col("id").as("id_b"),
          col("ss").as("ss_b"), col("n").as("n_b"))), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("ss_a"), col("ss_b"))).cast("long")
            .as("common"), col("n_a"), col("n_b"))
        .withColumn("jaccard",
          col("common").cast("double") /
            (col("n_a") + col("n_b") - col("common")).cast("double"))
        // common > 0: the pair-join path's inner join on shared shingles
        // never sees zero-overlap candidates, so without this filter the
        // two count-selected paths would diverge at threshold <= 0
        // (ADVICE r4 #2 — identical row sets on both paths, any threshold)
        .filter(col("common") > 0 && col("jaccard") >= threshold)
    } else {
      val sh = shAll.join(candIdsHinted, Seq("id"), "left_semi")
        .distinct().cache()
      // normalized column order: identical schema on both verify paths
      jaccard(cand, sh).filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("common"),
          col("n_a"), col("n_b"), col("jaccard"))
    }
  }

  /** SimHash near-dup: 60-bit signatures (graft.text.SimHash via the
    * codegen'd simhash60 expression), band-join on the 4 15-bit bands
    * (Hamming <= 3 over 4 bands guarantees >= 1 identical band —
    * standard pigeonhole blocking), verify exact Hamming.
    * `maxBucket` caps band-bucket size before the quadratic self-join
    * (same 100-TB guard as candidates/capBuckets; None = exact). */
  /** The (band, k0) struct array of a 60-bit signature column — the
    * SINGLE source of the band layout, shared by the batch pair join
    * and the streaming state keying (NearDupStream) so the two paths
    * cannot drift. `numBands` must divide 60; the pigeonhole guarantee
    * covers Hamming <= numBands - 1. */
  def simhashBandStructs(sig: Column,
                         numBands: Int = graft.text.SimHash.NumBands): Column = {
    require(graft.text.SimHash.Bits % numBands == 0,
      s"numBands=$numBands must divide ${graft.text.SimHash.Bits}")
    val bandBits = graft.text.SimHash.Bits / numBands
    val mask = (1L << bandBits) - 1L
    array((0 until numBands).map(n => struct(lit(n).as("band"),
      shiftright(sig, n * bandBits).bitwiseAND(mask).as("k0"))): _*)
  }

  /** Band count whose pigeonhole guarantee covers `maxHamming` bit
    * flips: maxHamming + 1 bands (at most maxHamming of them can
    * differ, so >= 1 is identical). Must divide the 60-bit signature —
    * maxHamming in {0..5, 9, 11, 14, 19, 29, 59}; the ADVICE r3 bug
    * class (fixed 4 bands silently under-recalling at maxHamming >= 4)
    * fails fast here instead. */
  def simhashNumBands(maxHamming: Int): Int = {
    require(maxHamming >= 0 &&
      graft.text.SimHash.Bits % (maxHamming + 1) == 0,
      s"maxHamming=$maxHamming unsupported: need (maxHamming+1) | " +
        s"${graft.text.SimHash.Bits} so the band blocking stays " +
        "complete (pigeonhole)")
    maxHamming + 1
  }

  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3,
                   maxBucket: Option[Int] = None,
                   salvageFactor: Option[Int] = None): DataFrame = {
    import graft.functions.simhash60
    val numBands = simhashNumBands(maxHamming)
    val sig = df.select(col(idCol).as("id"), simhash60(col(textCol)).as("sig"))
    val nib0 = sig.select(col("id"), col("sig"),
        explode(simhashBandStructs(col("sig"), numBands)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band").as("band"), col("bk.k0").as("k0"))
    val nib = applyBucketPolicy(nib0, maxBucket, salvageFactor)
    // join keys are whatever the cap policy left: (band, k0) plus the
    // salvage sub-bucket when present
    val keyCols = nib.columns.filter(c => c == "band" || c.startsWith("k")).toSeq
    val a = nib.alias("a"); val b = nib.alias("b")
    val keyEq = keyCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _)
    a.join(b, keyEq && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Hot-shingle count bound for BROADCASTING the df > cap shingle set
    * into the rare/hot occurrence split (round-6). A cap that is doing
    * its job leaves FEW hot shingles (boilerplate n-grams), so the
    * split is two map-side anti/semi joins against a broadcast set and
    * the full occurrence relation never shuffles by shingle just to
    * learn its df. Rows are short strings (tens of bytes); beyond the
    * limit the shuffled df-tagging join remains the 100-TB-safe plan. */
  val BroadcastHotShingleLimit = 2_000_000L

  /** Exact n-gram-Jaccard near-dup via the inverted shingle index
    * (no LSH): every pair sharing >= 1 shingle is scored exactly.
    *
    * `maxDf`: optional document-frequency cap on shingles feeding the
    * inverted-index self-join — the join is quadratic in the hottest
    * shingle's df (one boilerplate 3-gram shared by 10^6 docs means
    * 10^12 pair rows), so at corpus scale candidates must come from
    * rare shingles only. The cap bounds candidate generation; emitted
    * pairs are still scored by exact Jaccard over FULL shingle sets, so
    * values are exact — only pairs sharing nothing rarer than maxDf are
    * missed (the standard recall trade; None = fully exact). */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double, k: Int = 3,
                   maxDf: Option[Int] = None,
                   hotBroadcastLimit: Long = BroadcastHotShingleLimit)
                  : DataFrame = {
    val sh = docShingles(df, idCol, textCol, k).cache()
    maxDf match {
      case Some(cap) =>
        // candidates AND their rare-intersection sizes come from ONE
        // aggregation over the rare-shingle self-join (no pair-distinct
        // pass); the hot shingles' contribution to |A∩B| is added back
        // by joining the (small) hot occurrence rows against the
        // candidate pairs only — the full-set Jaccard stays exact while
        // nothing quadratic ever touches a hot shingle
        val dfRel = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        // rare/hot split (round-6): the occurrences only need a BINARY
        // df <= cap decision, not the df value — and the hot set
        // (df > cap) is small by construction wherever the cap is
        // meaningful, so under the count gate it broadcasts and the
        // split is two map-side anti/semi joins over the cached shingle
        // relation (the old shape shuffled EVERY occurrence through a
        // join with the df table just to read one bit of it). Over the
        // gate — a corpus whose boilerplate is so diverse that hot
        // shingles alone outgrow a broadcast — the shuffled df-tagging
        // join stays the plan.
        val hotShingles = dfRel.filter(col("df") > cap).select("shingle")
          .cache()
        val (rare, hot) =
          if (hotShingles.count() <= hotBroadcastLimit) {
            (sh.join(broadcast(hotShingles), Seq("shingle"), "left_anti"),
              sh.join(broadcast(hotShingles), Seq("shingle"), "left_semi"))
          } else {
            // tag every occurrence with its shingle's document frequency
            // in ONE join (two separate semi-joins would compute the df
            // aggregate twice), then split rare/hot by filter
            val withDf = sh.join(dfRel, Seq("shingle")).cache()
            (withDf.filter(col("df") <= cap).drop("df"),
              withDf.filter(col("df") > cap).drop("df"))
          }
        val a = rare.alias("a"); val b = rare.alias("b")
        val commonRare = a.join(b, col("a.shingle") === col("b.shingle") &&
            col("a.id") < col("b.id"))
          .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .agg(count(lit(1)).as("common_rare"))
        val commonHot = commonRare.select("id_a", "id_b")
          .join(hot.select(col("id").as("id_a"), col("shingle")), Seq("id_a"))
          .join(hot.select(col("id").as("id_b"), col("shingle")),
            Seq("id_b", "shingle"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("common_hot"))
        val common = commonRare
          .join(commonHot, Seq("id_a", "id_b"), "left_outer")
          .select(col("id_a"), col("id_b"),
            (col("common_rare") + coalesce(col("common_hot"), lit(0L)))
              .as("common"))
        scoreCommon(common, sh, threshold)
      case None =>
        // The inverted-index self-join ALREADY enumerates one row per
        // shared shingle per pair — aggregate it straight into the
        // intersection size instead of distinct-ing pairs and re-joining
        // the shingle sets (which would replay |pairs| x |shingles/doc|).
        val a = sh.alias("a"); val b = sh.alias("b")
        val common = a.join(b, col("a.shingle") === col("b.shingle") &&
            col("a.id") < col("b.id"))
          .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .agg(count(lit(1)).as("common"))
        scoreCommon(common, sh, threshold)
    }
  }

  /** Cluster-keeper output over near-dup pairs — the contract a
    * training-data pipeline actually consumes (the pair list itself is
    * quadratic in duplicate-cluster size; the per-doc keeper row is
    * linear). Connected components by iterative min-label propagation:
    * every doc starts labeled with its own id; each round every doc
    * takes the min over {its label} ∪ {labels of the labels of its
    * neighbors} (the label-of-label hop is pointer doubling, so a chain
    * of length n converges in O(log n) rounds, not O(n)); stop when no
    * label changes. Every step is a hash equi-join + min-aggregate — no
    * global structure, the 100-TB CC shape. The convergence check is a
    * count() per round (bookkeeping-scale action).
    *
    * Input: (id_a, id_b) near-dup pairs (extra columns ignored).
    * Output: (id, keeper) for every id that appears in >= 1 pair, where
    * keeper = min id of its connected component (keeper == id marks the
    * component representative to KEEP; the rest drop).
    *
    * Beyond-reference operator (builder mandate): the reference emits
    * pair lists only. Caches each round's label relation; caller owns
    * the lifetime of the returned (final) relation. */
  /** Label-table row bound for broadcasting the label side of the CC
    * round join (the BroadcastCandLimit discipline): the id set is
    * FIXED after seeding — labels change value, never cardinality — so
    * one count decides the strategy for every round. Under the limit
    * the round join is a broadcast hash join (the only exchange left
    * per round is the groupBy); over it, the shuffled equi-join is the
    * right 100-TB plan. ~24 bytes/row. */
  val BroadcastLabelLimit = 1_000_000L

  def clusters(pairs: DataFrame, maxRounds: Int = 50,
               checkpointDir: Option[String] = None): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    // DURABLE mode (checkpointDir set): per-round truncation goes
    // through reliable checkpoint() files, so a 100-TB CC run survives
    // executor loss mid-loop (localCheckpoint blocks die with their
    // executor and fail the job). Superseded rounds' files are deleted
    // eagerly by Checkpoints.release (same call as the local-block
    // release), so only the final round's files — one row per distinct
    // doc id — remain; the caller owns the directory's lifetime for
    // those.
    // save/restore the session's prior checkpoint dir (ADVICE r4 #4:
    // leaving it mutated is a surprising global side effect for the
    // rest of the session). A session that had NO dir set cannot be
    // restored to none (no public unset API) — documented side effect.
    val prevCheckpointDir = sc.getCheckpointDir
    checkpointDir.foreach(sc.setCheckpointDir)
    // LAZY local checkpoint (round-6): the per-round `changed` count is
    // the materializing action, so each round runs ONE pass instead of
    // an eager-checkpoint pass plus a count pass. Durable mode keeps
    // the eager reliable checkpoint (lazy reliable checkpoints recompute
    // the lineage a second time to write the files).
    def pin(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint(false)
    // cache the edge relation: every propagation round joins against it,
    // and the upstream pair pipeline (band joins, verifies) must not
    // re-execute per round. ONE pass via explode — the old
    // union(select(a,b), select(b,a)) executed the whole upstream pair
    // pipeline twice to fill this cache (round-6 profile evidence).
    val e = pairs.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("ed"))
      .select(col("ed.src").as("src"), col("ed.dst").as("dst"))
      .cache()
    // checkpoint (eager), NOT cache: each round's relation is
    // defined in terms of the previous one (twice, via the hop
    // self-join), so an un-truncated lineage grows ~3x PER ROUND and
    // Catalyst analysis time explodes exponentially even though
    // execution is cheap — the classic iterative-algorithm pitfall.
    // Checkpointing pins the materialized rows and resets the plan to a
    // leaf.
    // seed labels with min(self, direct neighbors) — one aggregation
    // that is exactly the loop's neighbor step, so star-shaped
    // duplicate clusters (the common case) start already-converged and
    // pay only the confirming round
    var lab = pin(e.groupBy(col("src"))
      .agg(min(col("dst")).as("nmin"))
      .select(col("src").as("id"),
        least(col("src"), col("nmin")).as("label")))
    var converged = false
    // the id set is fixed for the whole loop (labels change value,
    // never cardinality): ONE count over the checkpointed seed gates
    // the round join's broadcast for every round (round-6 — under the
    // limit only the groupBy exchange remains per round)
    val labelHint: DataFrame => DataFrame =
      if (lab.count() <= BroadcastLabelLimit) df => broadcast(df)
      else df => df
    // the relation pinned this round but not yet promoted to `lab` —
    // a failure between pin(next) and `lab = next` must release BOTH
    // (ADVICE r4 #4: the finally block used to leak next's files)
    var inFlight: DataFrame = null
    // try/finally: a failed round (or the convergence require) must
    // still release the cached edge relation and the last round's
    // checkpoint blocks — without it a long-lived session leaks both
    try {
      var round = 0
      while (!converged && round < maxRounds) {
        // ROUND = ONE join (round-6 rework; the old round ran TWO joins
        // — e⋈lab for neighbor labels plus lab⋈lab for the pointer
        // hop — and then a THIRD join to count changed labels, ~11 AQE
        // stage-jobs per round of kilobyte shuffles). The label table
        // is itself an edge set (id -> label), so augmenting e with the
        // label edges and joining ONCE against lab yields, per id, both
        // the neighbor labels (via e rows) and lab(label) (via the
        // label edge) — pointer doubling included. min(neighbor labels,
        // lab(label)) equals the old min(label, ...) because labels are
        // monotone non-increasing (lab(label) <= label always), and the
        // FIXPOINT is unchanged: stable iff every edge's endpoints
        // agree, i.e. min id per connected component. The label edge
        // also carries the id's CURRENT label as `old`, so the changed
        // count becomes a filter over the (checkpointed) round output —
        // no third join.
        // (A two-steps-per-checkpoint variant was measured and REVERTED:
        // the outer step references its unpinned input twice — union
        // and join side — so the inner step's subtree executed twice
        // per round and the composite cost more than it saved.)
        val g = e.unionByName(
          lab.select(col("id").as("src"), col("label").as("dst"),
            col("label").as("old")), allowMissingColumns = true)
        val next = pin(g
          .join(labelHint(
            lab.select(col("id").as("dst"), col("label").as("nlabel"))),
            Seq("dst"))
          .groupBy(col("src").as("id"))
          .agg(min("nlabel").as("label"), max("old").as("old")))
        inFlight = next
        val changed = next.filter(col("label") =!= col("old")).count()
        // the superseded round's checkpoint blocks are dead the moment
        // `changed` has been counted — release them explicitly
        // (Dataset.unpersist is a no-op for checkpoints, and waiting for
        // the ContextCleaner leaks O(rounds x ids) storage to a
        // long-lived caller)
        graft.util.Checkpoints.release(lab)
        lab = next
        inFlight = null
        converged = changed == 0
        round += 1
      }
      require(converged, s"clusters() did not converge in $maxRounds rounds")
      lab.select(col("id"), col("label").as("keeper"))
    } finally {
      e.unpersist()
      if (inFlight != null && (inFlight ne lab))
        graft.util.Checkpoints.release(inFlight)
      if (!converged) graft.util.Checkpoints.release(lab)
      if (checkpointDir.isDefined) prevCheckpointDir.foreach(sc.setCheckpointDir)
    }
  }

  /** End-to-end near-dup REMOVAL (the composed operator a training-data
    * pipeline runs): keep exactly one doc — the min-id cluster keeper —
    * per connected component of `pairs`, plus every doc that appears in
    * no pair. One anti-join against the (linear-sized) drop list. */
  def keepClusterKeepers(df: DataFrame, idCol: String,
                         pairs: DataFrame): DataFrame = {
    val drop = clusters(pairs).filter(col("id") =!= col("keeper"))
      .select(col("id").as(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** Shared Jaccard scoring tail: (id_a, id_b, common) + the distinct
    * shingle relation -> thresholded (..., n_a, n_b, jaccard). */
  private def scoreCommon(common: DataFrame, sh: DataFrame,
                          threshold: Double): DataFrame = {
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    common
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("n_a") + col("n_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
  }
}
