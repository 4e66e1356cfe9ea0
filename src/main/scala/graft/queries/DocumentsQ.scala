package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{Hashing, TextAnalysis}
import T._

/** Training-data pipeline operators over the `documents` table:
  * deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard), language ID,
  * quality scoring, token counting, fingerprinting.
  *
  * Scale notes: the sketch computations are map-only (one pass, codegen'd
  * where built-ins suffice, UDFs where a sketch is needed); candidate
  * generation shuffles only (doc_id, band_key) pairs — never the text — so
  * at 100 TB the shuffle volume is O(docs * bands * 16 bytes), and the
  * bucket self-join only materializes within-bucket pairs.
  */
object DocumentsQ {

  private def lowerTokens(text: String): Array[String] =
    graft.functions.Strings.splitWs(if (text == null) "" else text.toLowerCase)

  private val minhashUdf = udf { (text: String) =>
    Hashing.minhashFromTokens(lowerTokens(text), 3, 64)
  }
  private val bandsUdf = udf { (sig: Seq[Long]) => Hashing.lshBandKeys(sig.toArray, 4) }
  private val minhashSimUdf = udf { (a: Seq[Long], b: Seq[Long]) =>
    Hashing.minhashSimilarity(a.toArray, b.toArray)
  }
  private val simhashUdf = udf { (text: String) =>
    Hashing.simhashFromTokens(lowerTokens(text))
  }
  private val jaccardUdf = udf { (a: String, b: String) => TextAnalysis.ngramJaccard(a, b, 3) }
  private val langIdUdf = udf { (text: String) => TextAnalysis.langId(text) }
  private val qualityUdf = udf { (text: String) => TextAnalysis.qualityScore(text) }
  private val bpeishUdf = udf { (text: String) => TextAnalysis.tokenCountBpeish(text) }
  private val fingerprintFullUdf = udf { (text: String) => TextAnalysis.fingerprintFull(text) }

  /** Exact dedup: hash-groupBy on content hash; only the hash shuffles. */
  def d01ExactDups(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= 1)
      .orderBy("content_hash")

  /** Whitespace + BPE-ish token counts per document (map-only). */
  def d02TokenCounts(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens_ws"),
        length(col("text")).cast("long").as("len_chars"))
      .orderBy("doc_id")

  /** Per-language corpus profile. */
  def d03LangProfile(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("source")).as("n_sources"))
      .withColumn("avg_chars", col("sum_chars").cast("double") / col("n_docs"))
      .orderBy("lang")

  /** Quality signals, all computed with codegen'd built-ins for oracle
    * parity (integer counts -> exact; one double ratio from exact ints).
    */
  def d04QualitySignals(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("len"),
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("long").as("alpha_chars"),
        length(regexp_replace(col("text"), "[^!?.,;:]", "")).cast("long").as("punct_chars"))
      .withColumn("alpha_ratio", col("alpha_chars").cast("double") / col("len"))
      .withColumn("is_quality", (col("alpha_ratio") > 0.6) && (col("len") >= 50L))
      .orderBy("doc_id")

  /** Document fingerprint (normalized-content hash) duplicate groups. */
  def d05FingerprintGroups(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .groupBy(md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")).as("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .orderBy("fp")

  /** Base ∪ deterministic near-duplicate variants (last 5 words dropped) —
    * gives the near-dup detectors a guaranteed positive set; variant ids are
    * offset by 10^7.
    */
  private[queries] def withVariants(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents").select(col("doc_id"), col("text"))
    val variants = docs.select(
      (col("doc_id") + lit(10000000L)).as("doc_id"),
      concat_ws(" ", slice(split(trim(col("text")), "\\s+"), lit(1),
        greatest(size(split(trim(col("text")), "\\s+")) - 5, lit(1)))).as("text"))
    docs.unionByName(variants)
  }

  /** MinHash planted positives: docs with >= 40 words get a variant (last 2
    * words dropped, id + 10^7). The variant's true shingle Jaccard is
    * >= (n-4)/(n-2) >= 0.947, which 16 bands of 4 catch with miss
    * probability < 1e-11 per pair and a 64-slot est_jaccard >= 0.5 with
    * overwhelming margin — so planted-pair recall is exactly 1 and the
    * oracle can enumerate the expected output in SQL.
    */
  private[queries] def minhashVariants(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents").select(col("doc_id"), col("text"))
    val w = split(trim(col("text")), "\\s+")
    val variants = docs.filter(size(w) >= 40).select(
      (col("doc_id") + lit(10000000L)).as("doc_id"),
      concat_ws(" ", slice(w, lit(1), size(w) - 2)).as("text"))
    docs.unionByName(variants)
  }

  /** MinHash + LSH near-dup detection: shingle -> 64-slot signature ->
    * 16 bands of 4 -> band-bucket equi-join -> signature-estimated Jaccard
    * -> planted-pair recall surface. The full candidate pipeline runs over
    * base ∪ variants; the output keeps the planted (id, id+10^7) pairs —
    * the only SQL-derivable truth — as the machine-checked recall claim
    * (100% by the margin analysis on minhashVariants). Incidental base-base
    * candidate pairs are real output of the same pipeline but depend on the
    * signatures, so they're pinned by QueriesSpec, not the oracle.
    */
  /** Hot-bucket cap for LSH candidate generation: a bucket with more than
    * `maxBucket` members contributes O(members^2) candidate pairs — at
    * corpus scale a single degenerate bucket (boilerplate-identical or
    * empty-ish docs sharing a signature) turns the self-join quadratic.
    * Such buckets carry no near-dup information the exact-dedup pass
    * (d01/d05) doesn't already capture, so production LSH drops them from
    * candidate generation (the standard guard). 1000 is far above any
    * bucket this corpus produces, so the cap is exercised structurally
    * (extra co-partitioned count join) without changing any oracle output.
    */
  private val maxBucket = 1000

  private def capBuckets(bands: DataFrame, keys: Seq[String]): DataFrame = {
    val counts = bands.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") <= maxBucket)
      .drop("bucket_n")
    // co-partitioned on the same keys -> no extra wide shuffle of `bands`
    bands.join(counts, keys)
  }

  /** The operator's REAL output: every candidate pair surviving the
    * signature-similarity gate, flagged `planted` (the SQL-derivable
    * (id, id+10^7) recall rows) vs incidental base-base discoveries —
    * production users consume this surface; d06 (the oracle row) is its
    * planted projection, the only subset a SQL oracle can enumerate.
    * Incidental behavior is spec-pinned (NearDupSurfaceSpec plants an
    * exact-duplicate base pair and requires it here, unflagged).
    */
  /** MinHash LSH candidate-pair pipeline over a (doc_id, sig) frame:
    * band-bucket equi-join (hot buckets capped) -> distinct pairs ->
    * signature-estimated Jaccard gate. Shuffles only (doc_id, band) pairs —
    * signatures rejoin after dedup. Shared by d06 and d17.
    *
    * The signature frame is materialized ONCE up front (guide §1.2/§2.3:
    * don't recompute what you can keep): it is referenced by both sides of
    * the band self-join, by the hot-bucket count, and by the two signature
    * rejoins — six subtree references in total, and without materialization
    * Catalyst duplicates the whole sketch pipeline (the minhash UDF over the
    * full corpus) into every one of them (the round-5 d06 plan carried 24
    * parquet scans of `documents` for this reason). `localCheckpoint` is
    * eager, block-backed and reclaimed by the ContextCleaner when the frame
    * is dropped, so repeated bench passes don't accumulate cache entries.
    * At 100 TB the materialized side is (doc_id, 64 longs) — ~0.05% of the
    * corpus bytes — and the sketch pass runs exactly once.
    */
  private def minhashPairs(sigsIn: DataFrame): DataFrame = {
    val sigs = sigsIn.localCheckpoint()
    // band keys materialized too: the banding UDF (a collection-argument
    // Scala UDF — ~40µs/call conversion tax in Spark 4) is otherwise
    // re-evaluated by the hot-bucket count AND both sides of the candidate
    // self-join; 3 slim long columns per row.
    val bands = capBuckets(sigs.select(col("doc_id"),
      posexplode(bandsUdf(col("sig"))).as(Seq("band_idx", "band_key")))
        .localCheckpoint(),
      Seq("band_idx", "band_key"))
    val pairs = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    pairs
      .join(sigs.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sig", "sig_a"), "doc_a")
      .join(sigs.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sig", "sig_b"), "doc_b")
      .filter(minhashSimUdf(col("sig_a"), col("sig_b")) >= 0.5)
      .select(col("doc_a"), col("doc_b"))
  }

  def d06MinhashLshAll(spark: SparkSession, dir: String): DataFrame = {
    val sigs = minhashVariants(spark, dir)
      .withColumn("sig", minhashUdf(col("text")))
      .select(col("doc_id"), col("sig"))
    minhashPairs(sigs)
      .select(col("doc_a"), col("doc_b"),
        (col("doc_b") === col("doc_a") + 10000000L).as("planted"))
  }

  def d06MinhashLsh(spark: SparkSession, dir: String): DataFrame =
    d06MinhashLshAll(spark, dir)
      .filter(col("planted"))
      .select(col("doc_a"), col("doc_b"))
      .orderBy("doc_a")

  /** Chain variants for the dedup-clustering surface: each eligible doc
    * (>= 40 words, the d06 margin regime) gets TWO stacked variants —
    * v1 = drop last 2 words (id + 10^7), v2 = drop last 4 (id + 2*10^7).
    * Each parent/child pair drops exactly 2 words, so every chain edge has
    * the d06 margin (shingle Jaccard >= (n-6)/(n-4) >= 0.944 at n = 40;
    * 16x4 bands miss < 1e-11 per pair) — LSH recall of both chain edges is
    * provably 1 and the oracle can enumerate the full family.
    */
  private[queries] def minhashChainVariants(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents").select(col("doc_id"), col("text"))
    val w = split(trim(col("text")), "\\s+")
    val eligible = docs.filter(size(w) >= 40)
    val v1 = eligible.select(
      (col("doc_id") + lit(10000000L)).as("doc_id"),
      concat_ws(" ", slice(w, lit(1), size(w) - 2)).as("text"))
    val v2 = eligible.select(
      (col("doc_id") + lit(20000000L)).as("doc_id"),
      concat_ws(" ", slice(w, lit(1), size(w) - 4)).as("text"))
    docs.unionByName(v1).unionByName(v2)
  }

  /** Dedup clustering + representative selection (the keep-one-copy stage
    * every training pipeline runs after pair detection): the MinHash LSH
    * pair pipeline runs over base ∪ chain variants, the provable planted
    * chain edges (doc_b = doc_a + 10^7 — structurally exact: variant ids
    * are parent + 10^7, so the predicate can only match same-family pairs,
    * and recall is 1 by the minhashChainVariants margin) feed iterative
    * min-label connected components (GraphOps), and each component elects
    * its minimum doc id as the copy to keep. Eligible docs form provable
    * 3-member chains {id, id+10^7, id+2*10^7} with component = id;
    * everything else is a singleton — so the whole output is id arithmetic
    * for the oracle while the engine runs the real sketch -> band join ->
    * edge -> multi-round label propagation path. Components over the FULL
    * (unfiltered) pair surface are spec-pinned (GraphOpsSpec) — incidental
    * base-base near-dups merge clusters in ways only the signatures know.
    */
  def d17DedupComponents(spark: SparkSession, dir: String): DataFrame = {
    val fam = minhashChainVariants(spark, dir)
    val sigs = fam.withColumn("sig", minhashUdf(col("text")))
      .select(col("doc_id"), col("sig"))
    // edges materialized before clustering: connectedComponents references
    // its edge input twice (the symmetrizing union) — without this the whole
    // LSH candidate pipeline would run twice before the first round starts
    val edges = minhashPairs(sigs)
      .filter(col("doc_b") === col("doc_a") + 10000000L)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .localCheckpoint()
    val labels = graft.functions.GraphOps.connectedComponents(
      fam.select(col("doc_id").as("node")), edges, maxIter = 6)
    graft.functions.GraphOps.componentSummary(labels)
      .orderBy("doc_id")
  }

  /** SimHash planted positives: every doc gets a rotated variant (first
    * word moved to the end, id + 10^7). SimHash is a bag-of-tokens sketch,
    * so a token rotation preserves the signature EXACTLY — planted pairs
    * have Hamming 0 by construction, every chunk matches, and recall is
    * provably 1 (the oracle enumerates all docs). Nonzero-Hamming behavior
    * is pinned by HashingSpec/PropertiesSpec on crafted inputs.
    */
  private[queries] def simhashVariants(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents").select(col("doc_id"), col("text"))
    val w = split(trim(col("text")), "\\s+")
    val variants = docs.select(
      (col("doc_id") + lit(10000000L)).as("doc_id"),
      concat_ws(" ", concat(slice(w, lit(2), size(w) - 1), slice(w, lit(1), lit(1)))).as("text"))
    docs.unionByName(variants)
  }

  /** SimHash near-dups: 64-bit sketch, 4x16-bit chunk candidate join,
    * exact Hamming re-check <= 12, planted-pair recall surface (see
    * simhashVariants — planted pairs are Hamming-0, so the oracle can
    * enumerate them; incidental base-base near-dups are spec-pinned).
    */
  /** Full SimHash pair surface (see d06MinhashLshAll): candidate pairs
    * within Hamming 12, `planted` distinguishing the provable recall rows
    * from incidental base-base near-dups (spec-pinned).
    */
  def d07SimhashAll(spark: SparkSession, dir: String): DataFrame = {
    // (doc_id, sim) materialized once — the simhash UDF tokenizes the full
    // corpus, and this frame is referenced four times below (hot-bucket
    // count, capped join-back, and both sides of the chunk self-join); see
    // the minhashPairs materialization note. 16 bytes/row at any scale.
    val sigs = simhashVariants(spark, dir)
      .withColumn("sim", simhashUdf(col("text")))
      .select(col("doc_id"), col("sim"))
      .localCheckpoint()
    // chunk frame materialized (see minhashPairs' band note): referenced by
    // the hot-bucket count and both self-join sides
    val chunks = capBuckets(sigs.select(col("doc_id"), col("sim"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("sim"), i * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("chunk_idx", "chunk_val")))
        .localCheckpoint(),
      Seq("chunk_idx", "chunk_val"))
    val a = chunks.select(col("doc_id").as("doc_a"), col("sim").as("sim_a"),
      col("chunk_idx"), col("chunk_val"))
    val b = chunks.select(col("doc_id").as("doc_b"), col("sim").as("sim_b"),
      col("chunk_idx"), col("chunk_val"))
    a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("int").as("hamming"))
      // hamming is a pure function of the pair, so gating BEFORE the dedup
      // shuffle is result-identical and shuffles only surviving candidates
      // (guide §2.3: shuffle fewer bytes)
      .filter(col("hamming") <= 12)
      .distinct()
      .withColumn("planted", col("doc_b") === col("doc_a") + 10000000L)
  }

  def d07Simhash(spark: SparkSession, dir: String): DataFrame =
    d07SimhashAll(spark, dir)
      .filter(col("planted"))
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy("doc_a")

  /** Exact n-gram Jaccard over known candidate pairs (doc, variant). */
  def d08NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents").select(col("doc_id"), col("text"))
    val variants = withVariants(spark, dir).filter(col("doc_id") >= 10000000L)
      .select((col("doc_id") - 10000000L).as("doc_id"), col("text").as("text_b"))
    docs.join(variants, "doc_id")
      .select(col("doc_id"), jaccardUdf(col("text"), col("text_b")).as("jaccard"))
      .filter(col("jaccard") >= 0.3)
      .orderBy("doc_id")
  }

  /** Language-ID heuristic + agreement with the labeled lang column. */
  def d09LangId(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), langIdUdf(col("text")).as("lang_pred"),
        qualityUdf(col("text")).as("quality"))
      .orderBy("doc_id")

  /** BPE-ish token counts + rolling-hash fingerprint (UDF kernel path).
    * The fingerprint is a 64-bit hash no SQL oracle can recompute, so the
    * machine-checked claim is the GROUPING it induces: fp_group_first =
    * min doc_id sharing this doc's full-coverage rolling-hash fingerprint,
    * which must equal the min doc_id sharing its md5-normalized text
    * (fingerprintFull is a function of normalized text, collision-free in
    * practice). The winnowed near-dup variant (TextAnalysis.fingerprint)
    * deliberately collides across similar docs and is spec-pinned instead.
    * n_tokens_bpeish (letter-run ceil(len/4) + digits + punctuation) is
    * directly SQL-expressible.
    */
  def d10Fingerprints(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .select(col("doc_id"), bpeishUdf(col("text")).cast("long").as("n_tokens_bpeish"),
        fingerprintFullUdf(col("text")).as("fp"))
      .withColumn("fp_group_first",
        min(col("doc_id")).over(Window.partitionBy(col("fp"))))
      .select(col("doc_id"), col("n_tokens_bpeish"), col("fp_group_first"))
      .orderBy("doc_id")

  /** Token counting through the native codegen'd Catalyst expression
    * (graft.functions.WsTokenCount): stays inside whole-stage codegen with
    * zero per-row regex/array allocation, unlike the split() idiom of d02 or
    * a Scala UDF. Registered on the session idempotently (production route:
    * spark.sql.extensions=graft.plans.GraftExtensions).
    */
  def d13NativeTokens(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.NativeFunctions.ensureRegistered(spark)
    load(spark, dir, "documents")
      .select(col("doc_id"),
        call_function("ws_token_count", col("text")).cast("long").as("n_tokens"))
      .withColumn("is_short", col("n_tokens") < 20L)
      .orderBy("doc_id")
  }

  /** 13-format date round-trip: every order date is formatted into one of
    * the reference's 13 accepted input formats (chosen by key) and parsed
    * back through the permissive parser (date_utils.py:17-91 semantics,
    * functions/Dates.scala). The oracle is the original date — an exact
    * DuckDB check that every format gate + formatter round-trips.
    */
  def d14DateRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import java.time.format.DateTimeFormatter
    import java.util.Locale
    val patterns = Seq(
      "M/d/uuuu", "M-d-uuuu", "M/d/yy", "M-d-yy", "uuuu-MM-dd", "uuuu/MM/dd",
      "MMMM d, uuuu", "MMMM d uuuu", "d MMMM uuuu", "MMM d, uuuu",
      "MMM d uuuu", "MMdduuuu", "MMddyy")
    val roundtripUdf = udf { (key: Long, d: java.time.LocalDate) =>
      val raw = d.format(DateTimeFormatter.ofPattern(
        patterns((key % patterns.length).toInt), Locale.US))
      graft.functions.Dates.normalizeDate(raw).orNull
    }
    load(spark, dir, "orders")
      .select(col("o_orderkey"),
        (col("o_orderkey") % patterns.length).as("fmt_idx"),
        roundtripUdf(col("o_orderkey"), col("o_orderdate").cast("date")).as("parsed_iso"))
      .orderBy("o_orderkey")
  }

  /** Human-correction overlay (reference runner.py:735-783): a corrections
    * table LEFT-JOINED onto the corpus, corrected fields overwritten with
    * confidence 1.0 and flagged. Corrections here are derived
    * deterministically (every 10th doc) so the oracle can re-derive them.
    */
  def d15Corrections(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    val corrections = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), lit("xx").as("corrected_lang"))
    docs.join(broadcast(corrections), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("corrected_lang"), col("lang")).as("lang_final"),
        col("corrected_lang").isNotNull.as("human_corrected"),
        when(col("corrected_lang").isNotNull, 1.0).otherwise(0.5).as("confidence"))
      .orderBy("doc_id")
  }

  /** Per-language length quantiles — the exact continuous percentile
    * (median/p90) aggregate (SURVEY §2.7 median row; the reference's
    * deskew uses a median of line angles).
    */
  def d16LengthQuantiles(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(
        expr("percentile(length(text), 0.5)").as("median_len"),
        expr("percentile(length(text), 0.9)").as("p90_len"),
        count(lit(1)).as("n_docs"))
      .orderBy("lang")

  /** Top-k most frequent token per language — explode + two-phase top-k.
    *
    * A single `row_number` window partitioned by `lang` (5 values) would
    * rank each language's ENTIRE vocabulary in one task — the last
    * all-of-a-group-through-one-task shape in the query set (round-4
    * verdict). Instead: phase 1 ranks locally within (lang, token-hash
    * split) — 5×32 independent window partitions — and keeps each split's
    * top 5; phase 2 ranks only the ≤ 5×32 surviving candidates per
    * language. Any global top-5 token has ≤ 4 tokens above it in its own
    * split under the same total order (n desc, token asc), so it survives
    * phase 1 — the rewrite is exact, and the oracle is unchanged.
    */
  def d11TopTokens(spark: SparkSession, dir: String): DataFrame = {
    val toks = load(spark, dir, "documents")
      .select(col("lang"), explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
      .filter(length(col("token")) >= 3)
    val counts = toks.groupBy(col("lang"), col("token")).agg(count(lit(1)).as("n"))
    val localW = Window
      .partitionBy(col("lang"), pmod(xxhash64(col("token")), lit(32)))
      .orderBy(desc("n"), col("token"))
    val candidates = counts
      .withColumn("local_rank", row_number().over(localW))
      .filter(col("local_rank") <= 5)
      .drop("local_rank")
    val w = Window.partitionBy(col("lang")).orderBy(desc("n"), col("token"))
    candidates.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .orderBy("lang", "rank")
  }

  /** Corpus-mixing weights (percent) per language — the domain-mixing
    * config a training pipeline applies before tokenization. > 100 means
    * UPsampling (the doc is replicated); < 100 is deterministic
    * downsampling. Values are a fixture; production reads them from a
    * config table.
    */
  private[graft] val mixWeights: Seq[(String, Int)] =
    Seq("de" -> 100, "en" -> 30, "es" -> 50, "fr" -> 150, "zh" -> 10)

  /** Corpus mixing / stratified sampling (d18): per-language target weights
    * applied as a DETERMINISTIC id-mod gate — `doc_id % 100 < weight` keeps
    * the decision reproducible at any parallelism and re-derivable by the
    * oracle (production keys the gate on a salted content hash; the
    * synthetic ids are already uniform). Upsampled languages emit `copy`
    * rows 1..k via an in-row sequence explode. The weight table joins
    * BROADCAST (a config dim never shuffles the corpus); the gate and the
    * replication are map-only — the only shuffle in the query is the final
    * presentation sort.
    */
  def d18CorpusMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val weights = mixWeights.toDF("lang", "weight_pct")
    val docs = load(spark, dir, "documents").select(col("doc_id"), col("lang"))
      .join(broadcast(weights), "lang")
    val copies = when(col("weight_pct") <= 100,
        when(pmod(col("doc_id"), lit(100)) < col("weight_pct"), 1).otherwise(0))
      .otherwise(lit(1) +
        when(pmod(col("doc_id"), lit(100)) < col("weight_pct") - 100, 1).otherwise(0))
    docs.withColumn("n_copies", copies)
      .filter(col("n_copies") >= 1)
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(1), col("n_copies"))).as("copy"))
      .withColumn("copy", col("copy").cast("long"))
      .orderBy("doc_id", "copy")
  }

  /** Benchmark decontamination (d19): flag corpus documents sharing any
    * word 13-gram with the evaluation set (the standard n-gram overlap
    * check run before training). The eval set here is the `doc_id % 41 = 0`
    * slice of the same table, so contamination is guaranteed non-empty
    * (the eval docs themselves) and the whole join is exactly mirrorable in
    * SQL — no planting. Shape at scale: eval shingles are the SMALL side
    * (thousands of benchmark docs vs the corpus) and broadcast into a
    * map-side semi-ish join; the corpus side is a map-only explode of
    * 13-gram strings, aggregated per doc before output, so nothing but
    * (doc_id, matched-shingle) pairs ever shuffles.
    */
  def d19Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    // Tokenize ONCE into a materialized column and shingle over the
    // attribute: with `split` inlined into the transform lambda, Catalyst
    // re-evaluates the full regex tokenization for EVERY shingle — O(n²)
    // re-tokenization per document (the round-5 plan showed split(trim(text))
    // inside the per-element lambda). The Project boundary keeps it one
    // split per row; the shingle expressions then only slice the array.
    val words = docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
    val w = col("w")
    // docs under 13 words have no 13-grams; filter BEFORE the sequence so
    // sequence(1, n) never sees n <= 0 (Spark would emit a DESCENDING range)
    val shingled = words.filter(size(w) >= 13)
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(1), size(w) - 12),
          i => concat_ws(" ", slice(w, i, lit(13))))).as("shingle"))
    val evalShingles = shingled
      .filter(pmod(col("doc_id"), lit(41)) === 0)
      .select(col("shingle")).distinct()
    shingled
      .join(broadcast(evalShingles), "shingle")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("shingle")).as("n_shared_13grams"))
      .withColumn("is_eval_doc", pmod(col("doc_id"), lit(41)) === 0)
      .orderBy("doc_id")
  }

  /** Dedup-aware stratified train/val/test split (d20): the holdout
    * assignment every training pipeline makes before tokenization. The
    * split is keyed on the CONTENT hash, not the document id, so exact
    * duplicates always land in the same split — the standard guard against
    * train→eval leakage through duplicated text (id-keyed splits scatter a
    * duplicate group across splits). Bucketing compares the first two hex
    * chars of md5 lexicographically ('00'..'cc' → train 205/256 ≈ 80.1%,
    * 'cd'..'e5' → val, 'e6'..'ff' → test) — a pure string comparison both
    * engines evaluate identically, no hex→int conversion needed. Output is
    * the per-(lang, source) audit table: counts per split and the exact
    * train fraction. Shape at scale: one map-only hash+gate pass; only
    * (lang, source, split) keyed counts shuffle after map-side combine —
    * the text never leaves the scan.
    */
  def d20HoldoutSplit(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
      .select(col("lang"), col("source"),
        substring(md5(col("text")), 1, 2).as("hb"))
    val tagged = docs.withColumn("split",
      when(col("hb") < "cd", "train")
        .when(col("hb") < "e6", "val")
        .otherwise("test"))
    tagged.groupBy(col("lang"), col("source"))
      .agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"),
        count(lit(1)).as("n_total"))
      .withColumn("train_frac",
        round(col("n_train").cast("double") / col("n_total").cast("double"), 6))
      .orderBy("lang", "source")
  }

  /** Intra-document repetition filter (d21): the Gopher-style quality gate
    * that drops boilerplate/degenerate documents by their duplicate-2-gram
    * fraction (Rae et al. 2021 use duplicate n-gram character fractions;
    * the token-count variant here is the common simplification). Everything
    * is computed per row with codegen'd collection built-ins — no explode,
    * no shuffle except the presentation sort — so at 100 TB this is a pure
    * map over the scan. The flag avoids a threshold comparison on a
    * computed double: `dup > 1/25` is evaluated as the exact integer test
    * `25 * (n_2grams - n_distinct) > n_2grams`. (Gopher's production
    * threshold is 0.20 on duplicate-n-gram CHARACTER fraction; the
    * synthetic corpus draws from a wide vocabulary and tops out near 0.06,
    * so the demo gate is calibrated to 1/25 to exercise both branches —
    * the operator shape is identical at any cut.)
    */
  def d21RepetitionFilter(spark: SparkSession, dir: String): DataFrame = {
    // tokenize once into an attribute (see d19): `split` inlined into the
    // transform lambda re-tokenizes the document per 2-gram — O(n²) per row
    val w = col("w")
    // size(w) < 2 would hand sequence() a descending range — guard first
    val grams = when(size(w) >= 2,
      transform(sequence(lit(1), size(w) - 1), i => concat_ws(" ", slice(w, i, lit(2)))))
      .otherwise(array().cast("array<string>"))
    load(spark, dir, "documents")
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("w"))
      .select(col("doc_id"), size(w).cast("long").as("n_words"), grams.as("grams"))
      .select(col("doc_id"), col("n_words"),
        size(col("grams")).cast("long").as("n_2grams"),
        size(array_distinct(col("grams"))).cast("long").as("n_distinct_2grams"))
      .withColumn("dup_2gram_frac",
        when(col("n_2grams") === 0, lit(0.0)).otherwise(
          round(lit(1.0) - col("n_distinct_2grams").cast("double") /
            col("n_2grams").cast("double"), 6)))
      .withColumn("flagged_repetitive",
        (col("n_2grams") - col("n_distinct_2grams")) * 25 > col("n_2grams"))
      .orderBy("doc_id")
  }

  /** PII patterns shared by the query and its spec. RE2-safe (no
    * backreferences/lookaround) so the DuckDB oracle runs the IDENTICAL
    * regexes: email, NANP-style phone (d3-d3-d4), SSN (d3-d2-d4). The two
    * dashed patterns cannot cross-match (a phone has no 2-digit middle
    * group to offer the SSN pattern and vice versa).
    */
  private[graft] val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[a-z0-9.]+@[a-z.]+[a-z]",
    "phone" -> "\\d{3}-\\d{3}-\\d{4}",
    "ssn" -> "\\d{3}-\\d{2}-\\d{4}")

  /** PII scrubbing (d22): the redaction pass a training pipeline runs
    * before tokenization — detect emails/phones/SSNs, count them, and
    * replace each with a typed placeholder. The corpus text is PII-free by
    * construction, so the surface plants deterministic id-derived PII into
    * the `doc_id % 7 == 3` slice (1 or 2 emails + phone + SSN per planted
    * doc) and then detects it GENUINELY with the regexes above — the
    * oracle mirrors both the injection and the detection in SQL, so a
    * regex-semantics divergence between engines fails the gate rather than
    * hiding behind id arithmetic. Map-only: regex extraction + three
    * chained global replaces per row, no shuffle except the sort; the
    * scrubbed text itself never leaves the executors (only its md5 and
    * length delta are emitted).
    */
  def d22PiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val dec = (e: org.apache.spark.sql.Column) => e.cast("string")
    val pii = concat(
      lit(" contact u"), dec(id), lit("@mail.example"),
      when(pmod(id, lit(2)) === 1,
        concat(lit(" alt"), dec(id), lit("@mail.example"))).otherwise(lit("")),
      lit(" phone 555-"), dec(lit(100) + pmod(id, lit(900))),
      lit("-"), dec(lit(1000) + pmod(id, lit(9000))),
      lit(" ssn "), dec(lit(100) + pmod(id, lit(900))),
      lit("-"), dec(lit(10) + pmod(id, lit(90))),
      lit("-"), dec(lit(1000) + pmod(id, lit(9000))))
    val withPii = load(spark, dir, "documents")
      .select(id, when(pmod(id, lit(7)) === 3, concat(col("text"), pii))
        .otherwise(col("text")).as("t"))
    val Seq(email, phone, ssn) = piiPatterns.map(_._2)
    val scrubbed = regexp_replace(regexp_replace(regexp_replace(
      col("t"), email, "[EMAIL]"), phone, "[PHONE]"), ssn, "[SSN]")
    withPii.select(
      id,
      size(regexp_extract_all(col("t"), lit(email), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(col("t"), lit(phone), lit(0))).cast("long").as("n_phones"),
      size(regexp_extract_all(col("t"), lit(ssn), lit(0))).cast("long").as("n_ssns"),
      md5(scrubbed).as("scrubbed_hash"),
      (length(col("t")) - length(scrubbed)).cast("long").as("chars_removed"))
      .orderBy("doc_id")
  }
}
