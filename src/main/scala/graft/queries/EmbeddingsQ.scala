package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Hashing
import T._

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label).
  *
  * Scale design: the brute-force path broadcasts the (small) query set and
  * streams the corpus once — O(corpus) with no corpus shuffle; the LSH path
  * buckets the corpus by random-hyperplane signature so each query probes
  * one bucket (candidate set ~ corpus/2^bits), the standard recall/throughput
  * trade at 10^9+ vectors (IVF/LSH family).
  */
object EmbeddingsQ {

  /** Elementwise dot product with explicit double promotion, via the
    * codegen'd native expression (graft.functions.FloatVecDot): identical
    * summation order to the zip_with+aggregate HOF chain and to DuckDB's
    * list_sum (oracle-exact), but HOFs are CodegenFallback — on all-pairs
    * similarity the native expression keeps the inner loop compiled.
    */
  private def dot(spark: SparkSession, a: Column, b: Column): Column = {
    graft.functions.NativeFunctions.ensureRegistered(spark)
    call_function("float_vec_dot", a, b)
  }

  private def norm(spark: SparkSession, a: Column): Column =
    sqrt(dot(spark, a, a))

  /** L2 norms (map-only; sanity surface for the ANN paths). */
  def e01Norms(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), norm(spark, col("embedding")).as("l2_norm"))
      .orderBy("vec_id")

  /** Brute-force cosine top-5 for the first 20 query vectors: corpus scanned
    * once against a broadcast query set, ranked per query. Norms are
    * precomputed per side BEFORE the join — recomputing them per pair would
    * do |pairs| norm scans instead of |rows| (the values, hence the oracle
    * comparison, are unchanged).
    */
  def e02AnnBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val emb = load(spark, dir, "embeddings")
      .withColumn("e_norm", norm(spark, col("embedding")))
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("e_norm").as("q_norm"))
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(spark, col("q_emb"), col("embedding")) /
          (col("q_norm") * col("e_norm"))).as("cos_sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos_sim"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .orderBy("query_id", "rank")
  }

  /** Deterministic random hyperplanes: component j of plane p is a signed
    * unit derived from mix64 — fixed across executors with no RNG state.
    * private[graft]: SparkEntry materializes these as SQL literals so the
    * DuckDB oracle can recompute the signatures.
    */
  private[graft] def planeSign(p: Int, j: Int): Double =
    if (Hashing.mix64(p.toLong * 131071L + j.toLong) >= 0L) 1.0 else -1.0

  private[graft] val lshBits = 8

  private val lshSigUdf = udf { (emb: Seq[Float]) =>
    var sig = 0
    var p = 0
    while (p < lshBits) {
      var s = 0.0
      var j = 0
      while (j < emb.length) { s += planeSign(p, j) * emb(j); j += 1 }
      if (s >= 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  /** All XOR masks within Hamming distance 2 of zero over lshBits bits —
    * standard multi-probe LSH probe sequence (probe the query's bucket and
    * every bucket whose signature differs in at most 2 bits).
    */
  private val probeMasks: Seq[Int] = {
    val singles = (0 until lshBits).map(1 << _)
    val doubles = for {
      i <- 0 until lshBits; j <- (i + 1) until lshBits
    } yield (1 << i) | (1 << j)
    0 +: (singles ++ doubles)
  }

  /** LSH-bucketed ANN: corpus bucketed by 8-bit hyperplane signature; each
    * query multi-probes buckets within Hamming<=2 of its own signature
    * (~37/256 of the corpus), then exact cosine re-ranks candidates.
    */
  def e03AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    // norms computed ONCE per side before the join (as e02/e04/e06 do) —
    // inside the scored select they'd be re-evaluated per candidate pair.
    // The bucketed frame is materialized: it feeds both the corpus side and
    // the query-probe side, and materialization keeps the signature UDF at
    // one evaluation per row (the optimizer otherwise duplicates it into
    // each branch and can relocate it above the join — guide §4.4).
    val emb = load(spark, dir, "embeddings")
      .withColumn("bucket", lshSigUdf(col("embedding")))
      .withColumn("e_norm", norm(spark, col("embedding")))
      .localCheckpoint()
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("bucket").as("q_bucket"), col("e_norm").as("q_norm"))
    val probes = queries.select(col("query_id"), col("q_emb"), col("q_norm"),
      col("q_bucket"), explode(array(probeMasks.map(lit(_)): _*)).as("mask"))
      .withColumn("probe_bucket", col("q_bucket").bitwiseXOR(col("mask")))
      .select(col("query_id"), col("q_emb"), col("q_norm"), col("probe_bucket"))
    // each candidate matches exactly ONE probe mask (XOR is injective), so
    // no distinct is needed — a dedup here would only add a shuffle
    val cands = emb.join(broadcast(probes),
      col("bucket") === col("probe_bucket") && col("vec_id") =!= col("query_id"))
    val scored = cands.select(col("query_id"), col("vec_id").as("neighbor_id"),
      (dot(spark, col("q_emb"), col("embedding")) /
        (col("q_norm") * col("e_norm"))).as("cos_sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos_sim"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .orderBy("query_id", "rank")
  }

  /** kNN majority-label classification for the first 100 vectors. */
  def e04KnnClassify(spark: SparkSession, dir: String): DataFrame = {
    val emb = load(spark, dir, "embeddings")
      .withColumn("e_norm", norm(spark, col("embedding")))
    val queries = emb.filter(col("vec_id") < 100)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("e_norm").as("q_norm"))
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("label"),
        (dot(spark, col("q_emb"), col("embedding")) /
          (col("q_norm") * col("e_norm"))).as("cos_sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos_sim"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("vote_rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(desc("votes"), col("label"))))
      .filter(col("vote_rank") === 1)
      .select(col("query_id"), col("label").as("predicted_label"), col("votes"))
      .orderBy("query_id")
  }

  /** 16-bit hyperplane signature for pair-generation bucketing (wider than
    * e03's 8-bit probe signature: pair-gen self-joins within buckets, so
    * bucket population — corpus/2^bits — is the cost driver; at 10^9+
    * vectors size bits ~ log2(n) so within-bucket pair counts stay bounded).
    */
  private[graft] val dedupBits = 16

  private val dedupSigUdf = udf { (emb: Seq[Float]) =>
    var sig = 0
    var p = 0
    while (p < dedupBits) {
      var s = 0.0
      var j = 0
      while (j < emb.length) { s += planeSign(p, j) * emb(j); j += 1 }
      if (s >= 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  /** Embedding-cosine near-duplicate detection (training-data dedup
    * surface), LSH-bucketed — NO all-pairs join at any scale: corpus is
    * bucketed by 16-bit hyperplane signature, candidate pairs form only
    * within buckets (duplicate embeddings share every signature bit, so
    * recall on dup pairs is exactly 1), then the exact cosine re-check
    * keeps pairs >= 0.999. Planted positives: every vector gets an exact
    * duplicate at vec_id + 10^6, mirroring an ingest that re-embeds the
    * same content — the SQL oracle re-derives those pairs and their cosine
    * bit-exactly. Near-miss (non-identical) recall is governed by
    * tables x probe-Hamming as in e03 and is spec-pinned, not oracled.
    */
  def e06EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val emb = load(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val dups = emb.select((col("vec_id") + lit(1000000L)).as("vec_id"), col("embedding"))
    // materialized once — referenced by BOTH sides of the bucket self-join
    // (see the e03 note; without it the 16-bit signature UDF runs twice per
    // row and can migrate into the join)
    val corpus = emb.unionByName(dups)
      .withColumn("bucket", dedupSigUdf(col("embedding")))
      .withColumn("e_norm", norm(spark, col("embedding")))
      .localCheckpoint()
    val left = corpus.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"),
      col("e_norm").as("norm_a"), col("bucket"))
    val right = corpus.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"),
      col("e_norm").as("norm_b"), col("bucket"))
    left.join(right, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        (dot(spark, col("emb_a"), col("emb_b")) /
          (col("norm_a") * col("norm_b"))).as("cos_sim"))
      .filter(col("cos_sim") >= 0.999)
      .orderBy("vec_a", "vec_b")
  }

  /** IVF-style ANN: the per-label mean vectors act as the coarse quantizer
    * (k-means-step centroids, deterministic — no RNG init), every corpus
    * vector is assigned to its nearest centroid cell, and each query probes
    * its nprobe=2 nearest cells before the exact cosine re-rank. The
    * inverted-file counterpart of e03's LSH: candidates ~ nprobe/k of the
    * corpus; at 10^9 vectors k grows with sqrt(n) and cells become the
    * partition key, so probing touches only the probed cells' partitions.
    */
  def e07AnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = load(spark, dir, "embeddings")
    // coarse quantizer: per-label elementwise means (tiny k -> collected)
    val cents: Array[(Int, Array[Double])] = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(avg(col("v").cast("double")).as("m"))
      .groupBy(col("label"))
      .agg(sort_array(collect_list(struct(col("dim"), col("m")))).as("dm"))
      .collect()
      .map { r =>
        val dm = r.getSeq[org.apache.spark.sql.Row](1)
        (r.getInt(0), dm.map(_.getDouble(1)).toArray)
      }
      .sortBy(_._1)
    def dists(e: Seq[Float]): Seq[(Double, Int)] = cents.toSeq.map { case (lbl, c) =>
      var d = 0.0
      var j = 0
      while (j < e.length) {
        val diff = e(j).toDouble - c(j); d += diff * diff; j += 1
      }
      (d, lbl)
    }
    val cellUdf = udf { (e: Seq[Float]) => dists(e).minBy(identity)._2 }
    val probesUdf = udf { (e: Seq[Float]) => dists(e).sorted.take(2).map(_._2) }
    // materialized once — the cell assignment feeds the corpus scan, the
    // query branch AND the equi-join key (see the e03 note)
    val corpus = emb.withColumn("cell", cellUdf(col("embedding")))
      .withColumn("e_norm", norm(spark, col("embedding")))
      .localCheckpoint()
    val queries = corpus.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("e_norm").as("q_norm"),
        explode(probesUdf(col("embedding"))).as("probe_cell"))
    val scored = corpus.join(broadcast(queries),
      col("cell") === col("probe_cell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(spark, col("q_emb"), col("embedding")) /
          (col("q_norm") * col("e_norm"))).as("cos_sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos_sim"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .orderBy("query_id", "rank")
  }

  /** Per-label centroid norms — elementwise mean via posexplode + re-agg,
    * the distributed shape for centroid computation (k-means step analog).
    * The norm is rounded to 6 dp: double summation order varies with
    * shuffle arrival (and differs from the oracle engine's scan order), so
    * the raw double is only stable to ~1e-13 — far below the 1e-6 grid,
    * making the rounded value deterministic and oracle-exact.
    */
  def e05Centroids(spark: SparkSession, dir: String): DataFrame = {
    val emb = load(spark, dir, "embeddings")
    val comps = emb.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
    comps.groupBy(col("label"), col("dim"))
      .agg(avg(col("v").cast("double")).as("mean_v"))
      .groupBy(col("label"))
      .agg(round(sqrt(sum(col("mean_v") * col("mean_v"))), 6).as("centroid_norm"),
        count(lit(1)).as("n_dims"))
      .orderBy("label")
  }

  // One-pass quantized cosine: exact Long sums over the int8 codes then one
  // final double divide/sqrt, as the codegen'd `sq8_cos` native expression
  // (graft.functions.Sq8Cos — round 6; the former two-ARRAY<BIGINT>-argument
  // Scala UDF paid ~40µs/call in argument conversion alone, which dominated
  // the scoring join). Values bit-identical; DuckDB oracle unchanged.

  /** Scalar-quantized (SQ8) ANN: per-dimension min/max over the corpus
    * give a 256-level code per component — the memory-compression path for
    * billion-vector search (4x less IO than float32; FAISS's SQ8 storage).
    * Quantization is `floor((x - mn) * 255 / (mx - mn))` clamped to 255
    * (floor, not round: half-up vs half-even rounding differs between
    * engines; floor is unambiguous), scoring is cosine over the integer
    * codes — exact Long arithmetic end-to-end until one final double
    * divide/sqrt, so the oracle reproduces every score bit-exactly.
    *
    * Scale shape: the per-dim stats are one explode + groupBy over 64 dims
    * collapsed to a single broadcast row; quantization is map-only; the
    * scoring pass is the e02 broadcast-query scan over CODES (1/4 the
    * bytes). Top-5 ties broken by neighbor_id (coarse integer scores tie
    * more often than floats — the total order keeps both engines aligned).
    */
  def e08AnnSq8(spark: SparkSession, dir: String): DataFrame = {
    val emb = load(spark, dir, "embeddings")
    val ex = emb.select(posexplode(col("embedding")).as(Seq("dim", "v")))
    val st = ex.groupBy("dim").agg(
      min(col("v")).cast("double").as("mn"),
      max(col("v")).cast("double").as("mx"))
    val statsRow = st
      .agg(sort_array(collect_list(struct(col("dim"), col("mn"), col("mx")))).as("s"))
      .select(transform(col("s"), x => x.getField("mn")).as("mn_a"),
        transform(col("s"), x => x.getField("mx")).as("mx_a"))
    val quant = emb.crossJoin(broadcast(statsRow))
      .withColumn("qv", zip_with(
        zip_with(transform(col("embedding"), x => x.cast("double")),
          col("mn_a"), (x, mn) => x - mn),
        zip_with(col("mx_a"), col("mn_a"), (mx, mn) => mx - mn),
        (d, r) => when(r === 0d, lit(0L))
          .otherwise(least(floor(d * lit(255.0) / r), lit(255.0)).cast("long"))))
      .select(col("vec_id"), col("qv"))
      // materialized once: `quant` feeds both the broadcast query side and
      // the scoring scan — without this the per-dim stats aggregation and
      // the quantization pass run twice (guide §1.2: don't recompute).
      // (vec_id, 64 int8-valued longs) per row, eagerly computed, blocks
      // reclaimed when the frame is dropped.
      .localCheckpoint()
    val qs = quant.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"))
    graft.functions.NativeFunctions.ensureRegistered(spark)
    val scored = quant.join(broadcast(qs), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        call_function("sq8_cos", col("q_qv"), col("qv")).as("cos_sq8"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos_sq8"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .orderBy("query_id", "rank")
  }

  /** Product-quantization ANN (e09): the FAISS PQ storage path — each
    * 64-dim float vector is stored as m=4 one-byte codes (one per 16-dim
    * subspace, k=16 centroids), a 64× compression over float32, and scored
    * against the codebook reconstruction (one exact L2² per candidate over
    * the reconstructed vector, dimension-sequential so the oracle replays
    * it op-for-op). Codebooks are deterministically SEEDED — the first k
    * corpus vectors' subvectors, a single assignment step with no Lloyd
    * iterations and no RNG — so every number in the surface is exact
    * float→double IEEE arithmetic both engines reproduce bit-identically;
    * production would run k-means per subspace, which changes the codebook
    * values, not the engine shape. Scale: the codebook is m·k subvectors
    * (broadcast as a closure constant), encoding is map-only over the
    * corpus scan, queries broadcast, per-query top-k windowed over 20
    * partitions — the corpus never shuffles and only (vec_id, 4 codes)
    * would persist in a real index.
    */
  def e09AnnPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = load(spark, dir, "embeddings")
    val sd = 16; val m = 4; val k = 16
    val cents: Array[Array[Float]] = emb.filter(col("vec_id") < k)
      .select(col("vec_id"), col("embedding")).collect()
      .sortBy(_.getLong(0)).map(_.getSeq[Float](1).toArray)
    // per-subspace argmin over the k centroids; strict < keeps the FIRST
    // minimum, i.e. ties resolve to the lowest centroid id (the oracle's
    // ROW_NUMBER ... ORDER BY d, cid mirrors this exactly)
    val encodeUdf = udf { (e: Seq[Float]) =>
      Array.tabulate(m) { s =>
        var best = 0; var bestD = Double.MaxValue; var cid = 0
        while (cid < k) {
          var d = 0.0; var j = s * sd
          while (j < (s + 1) * sd) {
            val diff = e(j).toDouble - cents(cid)(j).toDouble; d += diff * diff; j += 1
          }
          if (d < bestD) { bestD = d; best = cid }
          cid += 1
        }
        best
      }
    }
    // asymmetric-style scoring against the reconstruction, summed in
    // dimension order (left-to-right, like float_vec_dot and list_sum) —
    // via the codegen'd `pq_dist` native expression (graft.functions.PqDist,
    // round 6: the former Scala UDF's per-call collection-argument
    // conversion dominated the scoring join; scores are op-for-op
    // identical). The codebook travels as a constant-folded nested-array
    // literal.
    graft.functions.NativeFunctions.ensureRegistered(spark)
    val cbCol = array(cents.toIndexedSeq.map(c =>
      array(c.toIndexedSeq.map(v => lit(v)): _*)): _*)
    // codes materialized once: without this the optimizer relocates the
    // encode UDF's evaluation above the broadcast join, re-encoding the
    // vector once PER CANDIDATE PAIR instead of once per corpus row
    // (measured 1.7s -> 0.2s on the scoring stage; guide §4.4's
    // UDF-duplication trap). (vec_id, m codes) per row — the actual PQ
    // index payload, 64x smaller than the vectors.
    val corpus = emb.select(col("vec_id"), encodeUdf(col("embedding")).as("code"))
      .localCheckpoint()
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = corpus.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        call_function("pq_dist", col("q_emb"), col("code"), cbCol).as("approx_dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_dist"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .orderBy("query_id", "rank")
  }
}
