package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` covers SURVEY.md §2 operator-by-operator; `oracleSql` carries a
  * DuckDB-equivalent for every SQL-expressible query (column names and
  * ordering aligned; exact-decimal aggregation pattern on both sides, see
  * queries/Tables.scala). Kernel-dependent queries (tokenizer, sketches,
  * ANN) are rows-only here and pinned precisely by ScalaTest goldens.
  */
object SparkEntry {

  /** Flagship: ordered-span extraction over the interleaved doc table. */
  def entry(spark: SparkSession): DataFrame =
    ExtractionQ.x01Spans(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational coverage (oracle-backed)
    "q01_pricing_summary" -> (Relational.q01PricingSummary _),
    "q02_top_customers" -> (Relational.q02TopCustomers _),
    "q03_segment_revenue" -> (Relational.q03SegmentRevenue _),
    "q04_order_priority" -> (Relational.q04OrderPriority _),
    "q05_nation_volume" -> (Relational.q05NationVolume _),
    "q06_forecast" -> (Relational.q06Forecast _),
    "q07_returned_items" -> (Relational.q07ReturnedItems _),
    "q08_brand_stats" -> (Relational.q08BrandStats _),
    "q10_window_running" -> (Relational.q10WindowRunning _),
    "q11_window_topn" -> (Relational.q11WindowTopN _),
    "q12_rollup" -> (Relational.q12Rollup _),
    "q13_anti_join" -> (Relational.q13AntiJoin _),
    "q14_semi_join" -> (Relational.q14SemiJoin _),
    "q15_set_ops" -> (Relational.q15SetOps _),
    "q16_sessions" -> (Relational.q16Sessions _),
    "q17_events_hourly" -> (Relational.q17EventsHourly _),
    "q18_events_json" -> (Relational.q18EventsJson _),
    "q19_grouping_sets" -> (Relational.q19GroupingSets _),
    "q20_asof_join" -> (Relational.q20AsofJoin _),
    "q21_range_join" -> (Relational.q21RangeJoin _),
    // training-data pipeline ops over documents (dedup / text analysis)
    "d01_exact_dups" -> (DocumentsQ.d01ExactDups _),
    "d02_token_counts" -> (DocumentsQ.d02TokenCounts _),
    "d03_lang_profile" -> (DocumentsQ.d03LangProfile _),
    "d04_quality_signals" -> (DocumentsQ.d04QualitySignals _),
    "d05_fingerprint_groups" -> (DocumentsQ.d05FingerprintGroups _),
    "d06_minhash_lsh" -> (DocumentsQ.d06MinhashLsh _),
    "d07_simhash" -> (DocumentsQ.d07Simhash _),
    "d08_ngram_jaccard" -> (DocumentsQ.d08NgramJaccard _),
    "d09_lang_id" -> (DocumentsQ.d09LangId _),
    "d10_fingerprints" -> (DocumentsQ.d10Fingerprints _),
    "d11_top_tokens" -> (DocumentsQ.d11TopTokens _),
    "d13_native_tokens" -> (DocumentsQ.d13NativeTokens _),
    "d14_date_roundtrip" -> (DocumentsQ.d14DateRoundtrip _),
    "d15_corrections" -> (DocumentsQ.d15Corrections _),
    "d17_dedup_components" -> (DocumentsQ.d17DedupComponents _),
    "d18_corpus_mix" -> (DocumentsQ.d18CorpusMix _),
    "d19_decontaminate" -> (DocumentsQ.d19Decontaminate _),
    "d20_holdout_split" -> (DocumentsQ.d20HoldoutSplit _),
    "d21_repetition_filter" -> (DocumentsQ.d21RepetitionFilter _),
    "d22_pii_scrub" -> (DocumentsQ.d22PiiScrub _),
    "s07_session_window" -> (StreamingQ.s07SessionWindow _),
    // similarity search over embeddings
    "e01_norms" -> (EmbeddingsQ.e01Norms _),
    "e02_ann_bruteforce" -> (EmbeddingsQ.e02AnnBruteForce _),
    "e03_ann_lsh" -> (EmbeddingsQ.e03AnnLsh _),
    "e04_knn_classify" -> (EmbeddingsQ.e04KnnClassify _),
    "e05_centroids" -> (EmbeddingsQ.e05Centroids _),
    "e06_embedding_neardup" -> (EmbeddingsQ.e06EmbeddingNearDup _),
    "e07_ann_ivf" -> (EmbeddingsQ.e07AnnIvf _),
    "e08_ann_sq8" -> (EmbeddingsQ.e08AnnSq8 _),
    "e09_ann_pq" -> (EmbeddingsQ.e09AnnPq _),
    // the extraction pipeline (north rule)
    "x01_spans" -> (ExtractionQ.x01Spans _),
    "x02_span_stats" -> (ExtractionQ.x02SpanStats _),
    "x03_modality" -> (ExtractionQ.x03Modality _),
    "x04_table_rows" -> (ExtractionQ.x04TableRows _),
    "x05_media_quality" -> (ExtractionQ.x05MediaQuality _),
    "x06_reconcile" -> (ExtractionQ.x06Reconcile _),
    "x07_golden_f1" -> (ExtractionQ.x07GoldenF1 _),
    "x08_suspicion" -> (ExtractionQ.x08Suspicion _),
    "x09_table_sum_rule" -> (ExtractionQ.x09TableSumRule _),
    "x10_code_validation" -> (ExtractionQ.x10CodeValidation _),
    "x11_calibration" -> (ExtractionQ.x11Calibration _),
    "x12_media_pipeline" -> (ExtractionQ.x12MediaPipeline _),
    "x13_routing" -> (ExtractionQ.x13Routing _),
    "x14_cross_field" -> (ExtractionQ.x14CrossField _),
    "x15_confidence" -> (ExtractionQ.x15Confidence _),
    "x16_critic" -> (ExtractionQ.x16Critic _),
    "x17_golden_eval" -> (ExtractionQ.x17GoldenEval _),
    "x18_field_f1" -> (ExtractionQ.x18FieldF1 _),
    "x19_record_suspicion" -> (ExtractionQ.x19RecordSuspicion _),
    "x20_code_checks" -> (ExtractionQ.x20CodeChecks _),
    "x21_fax_signals" -> (ExtractionQ.x21FaxSignals _),
    "x22_doc_segments" -> (ExtractionQ.x22DocSegments _),
    "x23_doc_metadata" -> (ExtractionQ.x23DocMetadata _),
    "x24_tiebreaker_stats" -> (ExtractionQ.x24TiebreakerStats _),
    "x25_run_comparison" -> (ExtractionQ.x25RunComparison _),
    "x26_review_queue" -> (ExtractionQ.x26ReviewQueue _),
    "x27_span_provenance" -> (ExtractionQ.x27SpanProvenance _),
    "x28_consolidated" -> (ExtractionQ.x28Consolidated _),
    "x29_decoded_quality" -> (ExtractionQ.x29DecodedQuality _),
    "x30_ab_test" -> (ExtractionQ.x30AbTest _),
    "x31_regression_ladder" -> (ExtractionQ.x31RegressionLadder _),
    "x32_schema_versioning" -> (ExtractionQ.x32SchemaVersioning _),
    "x33_resized_stats" -> (ExtractionQ.x33ResizedStats _),
    "d16_length_quantiles" -> (DocumentsQ.d16LengthQuantiles _),
    // streaming
    "s01_stream_hourly" -> (StreamingQ.s01StreamHourly _),
    "s02_user_state" -> (StreamingQ.s02UserState _),
    "s03_watermark_append" -> (StreamingQ.s03WatermarkAppend _),
    "s04_stream_dedup" -> (StreamingQ.s04StreamDedup _),
    "s05_stream_join" -> (StreamingQ.s05StreamJoin _),
    "s06_stream_enrich" -> (StreamingQ.s06StreamEnrich _))

  private val discPrice =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  /** DuckDB list literal of hyperplane p's sign vector (the deterministic
    * hyperplanes of EmbeddingsQ, materialized so the oracle can recompute
    * LSH signatures bit-exactly).
    */
  private def signLiteral(p: Int, dims: Int): String =
    (0 until dims).map(j => _root_.graft.queries.EmbeddingsQ.planeSign(p, j))
      .map(s => if (s > 0) "1.0" else "-1.0").mkString("[", ",", "]")

  private val embDims = 64

  /** Exact cosine between two FLOAT[] columns, mirroring FloatVecDot's
    * double-promoted index-order summation (and norm = sqrt(self-dot)).
    */
  private def cosSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) " +
      s"/ (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) " +
      s"* sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"

  /** DuckDB shingle-set expression over a word-list column (word k=3 grams,
    * TextAnalysis.shingles semantics: <3 words collapse to one shingle).
    */
  private def shinglesSql(w: String): String =
    s"CASE WHEN len($w) = 0 THEN [] " +
      s"WHEN len($w) < 3 THEN [array_to_string($w, ' ')] " +
      s"ELSE [array_to_string($w[i:i+2], ' ') FOR i IN range(1, len($w) - 1)] END"

  private def stopwordListSql(lang: String): String =
    graft.functions.TextAnalysis.stopwords(lang).toSeq.sorted
      .map(s => s"'$s'").mkString("[", ",", "]")

  /** Per-language stopword hit-rate (TextAnalysis.langId score). */
  private def langScoreSql(lang: String): String =
    s"CASE WHEN len(toks) = 0 THEN 0.0 ELSE " +
      s"CAST(len(list_filter(toks, x -> list_contains(${stopwordListSql(lang)}, x))) AS DOUBLE)" +
      s" / len(toks) END"

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, " +
        s"CAST(SUM($discPrice) AS DOUBLE) AS sum_disc_price, " +
        "COUNT(*) AS count_order, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01' " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    "q02_top_customers" ->
      ("SELECT c_custkey, c_name, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue, " +
        "COUNT(*) AS n_orders FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY 1, 2 ORDER BY revenue DESC, c_custkey LIMIT 10"),
    "q03_segment_revenue" ->
      ("SELECT l_orderkey, o_orderdate, " +
        s"CAST(SUM($discPrice) AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey WHERE c_mktsegment = 'BUILDING' " +
        "GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey LIMIT 10"),
    "q04_order_priority" ->
      ("SELECT o_orderpriority, COUNT(*) AS order_count FROM orders " +
        "WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45) " +
        "GROUP BY 1 ORDER BY 1"),
    "q05_nation_volume" ->
      ("SELECT r_name, n_name, " +
        s"CAST(SUM($discPrice) AS DOUBLE) AS revenue, COUNT(*) AS n_items " +
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    "q06_forecast" ->
      ("SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue, " +
        "COUNT(*) AS n_rows FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01' " +
        "AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24"),
    "q07_returned_items" ->
      ("SELECT c_custkey, c_name, c_mktsegment, " +
        s"CAST(SUM($discPrice) AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey WHERE l_returnflag = 'R' " +
        "GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20"),
    "q08_brand_stats" ->
      ("SELECT p_brand, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
        "COUNT(*) AS n_items, COUNT(DISTINCT l_suppkey) AS n_suppliers " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1 ORDER BY 1"),
    "q10_window_running" ->
      ("SELECT l_suppkey, l_orderkey, l_linenumber, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_suppkey " +
        "ORDER BY l_shipdate, l_orderkey, l_linenumber " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty " +
        "FROM lineitem WHERE l_suppkey <= 3 " +
        "ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber"),
    "q11_window_topn" ->
      ("SELECT o_custkey, o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price, rn " +
        "FROM (SELECT o_custkey, o_orderkey, o_totalprice, " +
        "ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn " +
        "FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn"),
    "q12_rollup" ->
      ("SELECT l_returnflag, l_linestatus, COUNT(*) AS n, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"),
    "q13_anti_join" ->
      ("SELECT c_custkey, c_name, c_mktsegment FROM customer " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P') " +
        "ORDER BY c_custkey"),
    "q14_semi_join" ->
      ("SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer " +
        "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F') " +
        "GROUP BY 1 ORDER BY 1"),
    "q15_set_ops" ->
      ("SELECT nationkey FROM (SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer " +
        "INTERSECT SELECT CAST(s_nationkey AS INT) FROM supplier) ORDER BY nationkey"),
    "q16_sessions" ->
      ("SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events " +
        "FROM (SELECT user_id, CASE WHEN prev_ts IS NULL OR " +
        "epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_session " +
        "FROM (SELECT user_id, ts, event_id, " +
        "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events)) " +
        "GROUP BY 1 ORDER BY 1"),
    "q17_events_hourly" ->
      ("SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"),
    "q18_events_json" ->
      ("SELECT event_type, " +
        "CAST(SUM(TRY_CAST(regexp_extract(props, '\"k\": (\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k, " +
        "COUNT(*) AS n, " +
        "CAST(SUM(TRY_CAST(regexp_extract(props, '\"k\": (\\d+)', 1) AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_k " +
        "FROM events GROUP BY 1 ORDER BY 1"),
    "q19_grouping_sets" ->
      ("SELECT l_returnflag, l_linestatus, COUNT(*) AS n, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem " +
        "GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ()) " +
        "ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST, n"),
    "q20_asof_join" ->
      ("SELECT p.user_id, p.event_id, v.event_id AS view_event_id, v.value AS view_value " +
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p " +
        "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v " +
        "ON p.user_id = v.user_id AND p.ts >= v.ts " +
        "ORDER BY p.user_id, p.event_id"),
    "q21_range_join" ->
      ("SELECT s.user_id, s.signup_id, COUNT(*) AS n_following, " +
        "MIN(e.event_id) AS first_event_id " +
        "FROM (SELECT user_id, event_id AS signup_id, ts AS signup_ts FROM events " +
        "WHERE event_type = 'signup') s " +
        "JOIN events e ON e.user_id = s.user_id AND e.ts > s.signup_ts " +
        "AND e.ts <= s.signup_ts + INTERVAL 1 HOUR " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    "d14_date_roundtrip" ->
      ("SELECT o_orderkey, CAST(o_orderkey % 13 AS BIGINT) AS fmt_idx, " +
        "CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS parsed_iso " +
        "FROM orders ORDER BY o_orderkey"),
    "d15_corrections" ->
      ("SELECT doc_id, CASE WHEN doc_id % 10 = 0 THEN 'xx' ELSE lang END AS lang_final, " +
        "(doc_id % 10 = 0) AS human_corrected, " +
        "CAST(CASE WHEN doc_id % 10 = 0 THEN 1.0 ELSE 0.5 END AS DOUBLE) AS confidence " +
        "FROM documents ORDER BY doc_id"),
    "d13_native_tokens" ->
      ("SELECT doc_id, " +
        "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens, " +
        "(len(regexp_extract_all(text, '\\S+')) < 20) AS is_short " +
        "FROM documents ORDER BY doc_id"),
    "e02_ann_bruteforce" ->
      ("WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 20), " +
        "scored AS (SELECT q.query_id, e.vec_id AS neighbor_id, " +
        "list_sum(list_transform(list_zip(q.q_emb, e.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) " +
        "/ (sqrt(list_sum(list_transform(q.q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) " +
        "* sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos_sim " +
        "FROM embeddings e, q WHERE e.vec_id <> q.query_id) " +
        "SELECT query_id, neighbor_id, cos_sim, rank FROM " +
        "(SELECT query_id, neighbor_id, cos_sim, " +
        "CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank " +
        "FROM scored) WHERE rank <= 5 ORDER BY query_id, rank"),
    "e04_knn_classify" ->
      ("WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 100), " +
        "scored AS (SELECT q.query_id, e.vec_id AS neighbor_id, e.label, " +
        "list_sum(list_transform(list_zip(q.q_emb, e.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) " +
        "/ (sqrt(list_sum(list_transform(q.q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) " +
        "* sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos_sim " +
        "FROM embeddings e, q WHERE e.vec_id <> q.query_id), " +
        "votes AS (SELECT query_id, label, COUNT(*) AS votes FROM " +
        "(SELECT query_id, label, ROW_NUMBER() OVER (PARTITION BY query_id " +
        "ORDER BY cos_sim DESC, neighbor_id) AS rank FROM scored) " +
        "WHERE rank <= 10 GROUP BY 1, 2) " +
        "SELECT query_id, label AS predicted_label, votes FROM " +
        "(SELECT query_id, label, votes, ROW_NUMBER() OVER (PARTITION BY query_id " +
        "ORDER BY votes DESC, label) AS vr FROM votes) WHERE vr = 1 ORDER BY query_id"),
    "d01_exact_dups" ->
      ("SELECT md5(text) AS content_hash, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc " +
        "FROM documents GROUP BY 1 ORDER BY 1"),
    "d02_token_counts" ->
      ("SELECT doc_id, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens_ws, " +
        "CAST(length(text) AS BIGINT) AS len_chars FROM documents ORDER BY doc_id"),
    "d03_lang_profile" ->
      ("SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars, " +
        "COUNT(DISTINCT source) AS n_sources, " +
        "CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars " +
        "FROM documents GROUP BY 1 ORDER BY 1"),
    "d04_quality_signals" ->
      ("SELECT doc_id, CAST(length(text) AS BIGINT) AS len, " +
        "CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS alpha_chars, " +
        "CAST(length(regexp_replace(text, '[^!?.,;:]', '', 'g')) AS BIGINT) AS punct_chars, " +
        "CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) AS alpha_ratio, " +
        "(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) > 0.6 " +
        "AND length(text) >= 50) AS is_quality " +
        "FROM documents ORDER BY doc_id"),
    "d05_fingerprint_groups" ->
      ("SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp, " +
        "COUNT(*) AS n_docs, MIN(doc_id) AS first_doc FROM documents GROUP BY 1 ORDER BY 1"),
    "d11_top_tokens" ->
      ("SELECT lang, token, n, rank FROM (SELECT lang, token, COUNT(*) AS n, " +
        "ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, token) AS rank " +
        "FROM (SELECT lang, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token " +
        "FROM documents) WHERE length(token) >= 3 GROUP BY lang, token) " +
        "WHERE rank <= 5 ORDER BY lang, rank"),
    "e01_norms" ->
      ("SELECT vec_id, label, " +
        "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS l2_norm " +
        "FROM embeddings ORDER BY vec_id"),
    "s01_stream_hourly" ->
      ("SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"),
    "s03_watermark_append" ->
      ("SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n FROM events " +
        "GROUP BY 1, 2 " +
        "HAVING hour + INTERVAL 1 HOUR <= (SELECT max(ts) - INTERVAL 2 HOUR FROM events) " +
        "ORDER BY 1, 2"),
    "s04_stream_dedup" ->
      ("SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n FROM events " +
        "GROUP BY 1, 2 " +
        "HAVING hour + INTERVAL 1 HOUR <= (SELECT max(ts) - INTERVAL 2 HOUR FROM events) " +
        "ORDER BY 1, 2"),
    "s02_user_state" ->
      ("SELECT user_id, n_events, last_event_type FROM " +
        "(SELECT user_id, event_type AS last_event_type, " +
        "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn, " +
        "COUNT(*) OVER (PARTITION BY user_id) AS n_events FROM events) " +
        "WHERE rn = 1 ORDER BY user_id"),
    "s05_stream_join" ->
      ("SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id, " +
        "p.value FROM events c JOIN events p ON c.user_id = p.user_id " +
        "AND c.event_type = 'click' AND p.event_type = 'purchase' " +
        "AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR " +
        "ORDER BY click_id, purchase_id"),
    "s06_stream_enrich" ->
      ("WITH s AS (SELECT event_type, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS type_avg " +
        "FROM events GROUP BY 1) " +
        "SELECT e.event_type, COUNT(*) AS n_above, s.type_avg FROM events e " +
        "JOIN s ON e.event_type = s.event_type WHERE e.value > s.type_avg " +
        "GROUP BY e.event_type, s.type_avg ORDER BY e.event_type"),
    "d18_corpus_mix" ->
      ("WITH wts(lang, weight_pct) AS (VALUES ('de', 100), ('en', 30), " +
        "('es', 50), ('fr', 150), ('zh', 10)), " +
        "gated AS (SELECT d.doc_id, d.lang, " +
        "CASE WHEN w.weight_pct <= 100 THEN " +
        "CASE WHEN d.doc_id % 100 < w.weight_pct THEN 1 ELSE 0 END " +
        "ELSE 1 + CASE WHEN d.doc_id % 100 < w.weight_pct - 100 THEN 1 ELSE 0 END END " +
        "AS n_copies FROM documents d JOIN wts w ON d.lang = w.lang) " +
        "SELECT doc_id, lang, CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy " +
        "FROM gated WHERE n_copies >= 1 ORDER BY doc_id, copy"),
    "d19_decontaminate" ->
      ("WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w " +
        "FROM documents WHERE len(string_split_regex(trim(text), '\\s+')) >= 13), " +
        "sh AS (SELECT doc_id, unnest([array_to_string(list_slice(w, i, i + 12), ' ') " +
        "FOR i IN range(1, len(w) - 11)]) AS shingle FROM t), " +
        "ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 41 = 0) " +
        "SELECT sh.doc_id, COUNT(DISTINCT sh.shingle) AS n_shared_13grams, " +
        "sh.doc_id % 41 = 0 AS is_eval_doc FROM sh JOIN ev ON sh.shingle = ev.shingle " +
        "GROUP BY sh.doc_id ORDER BY sh.doc_id"),
    "d20_holdout_split" ->
      ("WITH t AS (SELECT lang, source, substr(md5(text), 1, 2) AS hb FROM documents), " +
        "s AS (SELECT lang, source, CASE WHEN hb < 'cd' THEN 'train' " +
        "WHEN hb < 'e6' THEN 'val' ELSE 'test' END AS split FROM t) " +
        "SELECT lang, source, " +
        "CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train, " +
        "CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val, " +
        "CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test, " +
        "COUNT(*) AS n_total, " +
        "round(CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS DOUBLE) " +
        "/ CAST(COUNT(*) AS DOUBLE), 6) AS train_frac " +
        "FROM s GROUP BY lang, source ORDER BY lang, source"),
    "d21_repetition_filter" ->
      ("WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w " +
        "FROM documents), " +
        "g AS (SELECT doc_id, len(w) AS n_words, CASE WHEN len(w) >= 2 THEN " +
        "[array_to_string(list_slice(w, i, i + 1), ' ') FOR i IN range(1, len(w))] " +
        "ELSE [] END AS grams FROM t) " +
        "SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, " +
        "CAST(len(grams) AS BIGINT) AS n_2grams, " +
        "CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_2grams, " +
        "CASE WHEN len(grams) = 0 THEN 0.0 ELSE " +
        "round(CAST(1 AS DOUBLE) - CAST(len(list_distinct(grams)) AS DOUBLE) " +
        "/ CAST(len(grams) AS DOUBLE), 6) END AS dup_2gram_frac, " +
        "(len(grams) - len(list_distinct(grams))) * 25 > len(grams) AS flagged_repetitive " +
        "FROM g ORDER BY doc_id"),
    "s07_session_window" ->
      ("WITH l AS (SELECT user_id, ts, event_id, " +
        "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events), " +
        "e AS (SELECT user_id, ts, event_id, CASE WHEN prev_ts IS NULL OR " +
        "epoch_us(ts) - epoch_us(prev_ts) >= 1800000000 THEN 1 ELSE 0 END AS ns FROM l), " +
        "s AS (SELECT user_id, ts, SUM(ns) OVER (PARTITION BY user_id " +
        "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM e), " +
        "g AS (SELECT user_id, MIN(ts) AS session_start, " +
        "MAX(ts) + INTERVAL 30 MINUTE AS session_end, COUNT(*) AS n_events " +
        "FROM s GROUP BY user_id, sid) " +
        "SELECT user_id, session_start, session_end, n_events FROM g " +
        "WHERE session_end <= (SELECT make_timestamp((epoch_us(MAX(ts)) // 1000) * 1000 " +
        "- 7200000000) FROM events) " +
        "ORDER BY user_id, session_start"),
    "d22_pii_scrub" ->
      ("WITH p AS (SELECT doc_id, CASE WHEN doc_id % 7 = 3 THEN text || " +
        "' contact u' || CAST(doc_id AS VARCHAR) || '@mail.example' || " +
        "CASE WHEN doc_id % 2 = 1 THEN ' alt' || CAST(doc_id AS VARCHAR) || " +
        "'@mail.example' ELSE '' END || " +
        "' phone 555-' || CAST(100 + doc_id % 900 AS VARCHAR) || '-' || " +
        "CAST(1000 + doc_id % 9000 AS VARCHAR) || " +
        "' ssn ' || CAST(100 + doc_id % 900 AS VARCHAR) || '-' || " +
        "CAST(10 + doc_id % 90 AS VARCHAR) || '-' || " +
        "CAST(1000 + doc_id % 9000 AS VARCHAR) ELSE text END AS t FROM documents), " +
        "s AS (SELECT doc_id, t, regexp_replace(regexp_replace(regexp_replace(t, " +
        "'[a-z0-9.]+@[a-z.]+[a-z]', '[EMAIL]', 'g'), " +
        "'\\d{3}-\\d{3}-\\d{4}', '[PHONE]', 'g'), " +
        "'\\d{3}-\\d{2}-\\d{4}', '[SSN]', 'g') AS sc FROM p) " +
        "SELECT doc_id, " +
        "CAST(len(regexp_extract_all(t, '[a-z0-9.]+@[a-z.]+[a-z]')) AS BIGINT) AS n_emails, " +
        "CAST(len(regexp_extract_all(t, '\\d{3}-\\d{3}-\\d{4}')) AS BIGINT) AS n_phones, " +
        "CAST(len(regexp_extract_all(t, '\\d{3}-\\d{2}-\\d{4}')) AS BIGINT) AS n_ssns, " +
        "md5(sc) AS scrubbed_hash, " +
        "CAST(length(t) - length(sc) AS BIGINT) AS chars_removed " +
        "FROM s ORDER BY doc_id"),
    "d17_dedup_components" ->
      ("WITH w AS (SELECT doc_id, " +
        "len(string_split_regex(trim(text), '\\s+')) >= 40 AS elig FROM documents), " +
        "nodes AS (SELECT doc_id, doc_id AS component_id, " +
        "CASE WHEN elig THEN 3 ELSE 1 END AS component_size FROM w " +
        "UNION ALL SELECT doc_id + 10000000, doc_id, 3 FROM w WHERE elig " +
        "UNION ALL SELECT doc_id + 20000000, doc_id, 3 FROM w WHERE elig) " +
        "SELECT doc_id, component_id, CAST(component_size AS BIGINT) AS component_size, " +
        "doc_id = component_id AS keep FROM nodes ORDER BY doc_id"),
    "e05_centroids" ->
      ("WITH comps AS (SELECT label, unnest(embedding) AS v, " +
        "generate_subscripts(embedding, 1) AS dim FROM embeddings), " +
        "means AS (SELECT label, dim, avg(CAST(v AS DOUBLE)) AS mean_v " +
        "FROM comps GROUP BY 1, 2) " +
        "SELECT label, round(sqrt(sum(mean_v * mean_v)), 6) AS centroid_norm, " +
        "count(*) AS n_dims FROM means GROUP BY label ORDER BY label"),
    "e06_embedding_neardup" ->
      ("SELECT vec_a, vec_b, cos_sim FROM (SELECT vec_id AS vec_a, " +
        "vec_id + 1000000 AS vec_b, " +
        cosSql("embedding", "embedding") + " AS cos_sim FROM embeddings) " +
        "WHERE cos_sim >= 0.999 ORDER BY vec_a, vec_b"),
    "e03_ann_lsh" ->
      ("WITH signs AS (SELECT * FROM (VALUES " +
        (0 until _root_.graft.queries.EmbeddingsQ.lshBits)
          .map(p => s"($p, ${signLiteral(p, embDims)})").mkString(", ") +
        ") t(p, sv)), " +
        "b AS (SELECT e.vec_id, CAST(SUM(CASE WHEN " +
        "list_sum(list_transform(list_zip(e.embedding, s.sv), x -> CAST(x[1] AS DOUBLE) * x[2])) >= 0 " +
        "THEN (1 << s.p) ELSE 0 END) AS INTEGER) AS bucket " +
        "FROM embeddings e, signs s GROUP BY e.vec_id), " +
        "sigs AS (SELECT e.vec_id, e.embedding, b.bucket FROM embeddings e JOIN b USING (vec_id)), " +
        "q AS (SELECT vec_id AS query_id, embedding AS q_emb, bucket AS q_bucket " +
        "FROM sigs WHERE vec_id < 20), " +
        "scored AS (SELECT q.query_id, e.vec_id AS neighbor_id, " +
        cosSql("q.q_emb", "e.embedding") + " AS cos_sim " +
        "FROM sigs e, q WHERE e.vec_id <> q.query_id " +
        "AND bit_count(xor(e.bucket, q.q_bucket)) <= 2) " +
        "SELECT query_id, neighbor_id, cos_sim, rank FROM " +
        "(SELECT query_id, neighbor_id, cos_sim, " +
        "CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank " +
        "FROM scored) WHERE rank <= 5 ORDER BY query_id, rank"),
    "e08_ann_sq8" ->
      ("WITH ex AS (SELECT unnest(embedding) AS v, " +
        "generate_subscripts(embedding, 1) AS dim FROM embeddings), " +
        "st AS (SELECT dim, CAST(min(v) AS DOUBLE) AS mn, " +
        "CAST(max(v) AS DOUBLE) AS mx FROM ex GROUP BY dim), " +
        "sa AS (SELECT list(mn ORDER BY dim) AS mn_a, list(mx ORDER BY dim) AS mx_a FROM st), " +
        "qv AS (SELECT vec_id, [CASE WHEN (mx_a[i] - mn_a[i]) = 0 THEN 0 " +
        "ELSE CAST(least(floor((CAST(embedding[i] AS DOUBLE) - mn_a[i]) * 255.0 " +
        "/ (mx_a[i] - mn_a[i])), 255.0) AS BIGINT) END " +
        "FOR i IN range(1, len(embedding) + 1)] AS q FROM embeddings, sa), " +
        "sc AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, " +
        "CAST(list_sum([a.q[i] * b.q[i] FOR i IN range(1, len(a.q) + 1)]) AS BIGINT) AS dt, " +
        "CAST(list_sum([a.q[i] * a.q[i] FOR i IN range(1, len(a.q) + 1)]) AS BIGINT) AS na, " +
        "CAST(list_sum([b.q[i] * b.q[i] FOR i IN range(1, len(b.q) + 1)]) AS BIGINT) AS nb " +
        "FROM qv a, qv b WHERE a.vec_id < 20 AND b.vec_id <> a.vec_id), " +
        "cs AS (SELECT query_id, neighbor_id, CASE WHEN na = 0 OR nb = 0 THEN 0.0 " +
        "ELSE CAST(dt AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) END " +
        "AS cos_sq8 FROM sc) " +
        "SELECT query_id, neighbor_id, cos_sq8, rank FROM " +
        "(SELECT query_id, neighbor_id, cos_sq8, " +
        "CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sq8 DESC, neighbor_id) AS BIGINT) AS rank " +
        "FROM cs) WHERE rank <= 5 ORDER BY query_id, rank"),
    "e09_ann_pq" ->
      ("WITH cb AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 16), " +
        "sub AS (SELECT e.vec_id, ss.s, c.cid, " +
        "list_sum([(CAST(e.embedding[ss.s*16 + i] AS DOUBLE) - CAST(c.cvec[ss.s*16 + i] AS DOUBLE)) " +
        "* (CAST(e.embedding[ss.s*16 + i] AS DOUBLE) - CAST(c.cvec[ss.s*16 + i] AS DOUBLE)) " +
        "FOR i IN range(1, 17)]) AS d " +
        "FROM embeddings e, range(0, 4) ss(s), cb c), " +
        "codes AS (SELECT vec_id, s, cid AS code FROM (SELECT vec_id, s, cid, d, " +
        "ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, cid) AS rk FROM sub) WHERE rk = 1), " +
        "rs AS (SELECT codes.vec_id, codes.s, " +
        "list_slice(cb.cvec, codes.s*16 + 1, codes.s*16 + 16) AS rsub " +
        "FROM codes JOIN cb ON cb.cid = codes.code), " +
        "recon AS (SELECT vec_id, flatten(list(rsub ORDER BY s)) AS rvec FROM rs GROUP BY vec_id), " +
        "q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 20), " +
        "sc AS (SELECT q.query_id, r.vec_id AS neighbor_id, " +
        "list_sum([(CAST(q.q_emb[i] AS DOUBLE) - CAST(r.rvec[i] AS DOUBLE)) " +
        "* (CAST(q.q_emb[i] AS DOUBLE) - CAST(r.rvec[i] AS DOUBLE)) FOR i IN range(1, 65)]) AS approx_dist " +
        "FROM recon r, q WHERE r.vec_id <> q.query_id) " +
        "SELECT query_id, neighbor_id, approx_dist, rank FROM " +
        "(SELECT query_id, neighbor_id, approx_dist, " +
        "CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY approx_dist, neighbor_id) AS BIGINT) AS rank " +
        "FROM sc) WHERE rank <= 5 ORDER BY query_id, rank"),
    "d06_minhash_lsh" ->
      ("SELECT doc_id AS doc_a, doc_id + 10000000 AS doc_b FROM documents " +
        "WHERE len(string_split_regex(trim(text), '\\s+')) >= 40 ORDER BY doc_a"),
    "d07_simhash" ->
      ("SELECT doc_id AS doc_a, doc_id + 10000000 AS doc_b, " +
        "CAST(0 AS INTEGER) AS hamming FROM documents ORDER BY doc_a"),
    "d08_ngram_jaccard" ->
      ("WITH base AS (SELECT doc_id, " +
        "string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents), " +
        "pair AS (SELECT doc_id, w, w[1:greatest(len(w) - 5, 1)] AS wb FROM base), " +
        "sh AS (SELECT doc_id, " + shinglesSql("w") + " AS sa, " +
        shinglesSql("wb") + " AS sb FROM pair), " +
        "j AS (SELECT doc_id, CASE WHEN len(sa) = 0 AND len(sb) = 0 THEN 1.0 " +
        "WHEN len(sa) = 0 OR len(sb) = 0 THEN 0.0 " +
        "ELSE CAST(len(list_intersect(sa, sb)) AS DOUBLE) / len(list_distinct(list_concat(sa, sb))) END AS jaccard " +
        "FROM sh) " +
        "SELECT doc_id, jaccard FROM j WHERE jaccard >= 0.3 ORDER BY doc_id"),
    "d09_lang_id" ->
      ("WITH t AS (SELECT doc_id, lang, text, length(text) AS len, " +
        "list_filter(string_split_regex(lower(text), '[^\\p{L}]+'), x -> x <> '') AS toks, " +
        "string_split_regex(trim(text), '\\s+') AS words FROM documents), " +
        "s AS (SELECT *, " +
        Seq("de", "en", "es", "fr", "it")
          .map(l => langScoreSql(l) + s" AS s_$l").mkString(", ") + " FROM t), " +
        "q AS (SELECT *, " +
        "CASE WHEN len < 20 THEN len / 20.0 * 0.5 WHEN len <= 10000 THEN 1.0 " +
        "ELSE greatest(0.2, 1.0 - (len - 10000) / 100000.0) END AS length_score, " +
        "length(regexp_replace(text, '[^!?.,;:]', '', 'g')) AS punct, " +
        "length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha, " +
        "CASE WHEN len(words) = 0 THEN 0.0 ELSE " +
        "CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE) / len(words) END AS mean_word " +
        "FROM s) " +
        "SELECT doc_id, lang, " +
        "CASE WHEN len(toks) = 0 OR greatest(s_de, s_en, s_es, s_fr, s_it) <= 0.0 THEN 'und' " +
        "WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_it THEN 'de' " +
        "WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_it THEN 'en' " +
        "WHEN s_es >= s_fr AND s_es >= s_it THEN 'es' " +
        "WHEN s_fr >= s_it THEN 'fr' ELSE 'it' END AS lang_pred, " +
        "0.25 * length_score " +
        "+ 0.15 * (CASE WHEN CAST(punct AS DOUBLE) / len <= 0.1 THEN 1.0 " +
        "ELSE greatest(0.0, 1.0 - (CAST(punct AS DOUBLE) / len - 0.1) * 5) END) " +
        "+ 0.25 * (CAST(alpha AS DOUBLE) / len) " +
        "+ 0.15 * (CASE WHEN mean_word >= 3 AND mean_word <= 10 THEN 1.0 ELSE 0.5 END) " +
        "+ 0.20 * least(1.0, s_en * 5) AS quality " +
        "FROM q ORDER BY doc_id"),
    "d10_fingerprints" ->
      ("SELECT doc_id, " +
        "CAST(coalesce(list_sum(list_transform(regexp_extract_all(text, '[A-Za-z]+'), x -> (length(x) + 3) // 4)), 0) " +
        "+ length(regexp_replace(text, '[^0-9]', '', 'g')) " +
        "+ length(regexp_replace(text, '[A-Za-z0-9\\t\\n\\x0B\\f\\r ]', '', 'g')) AS BIGINT) AS n_tokens_bpeish, " +
        "min(doc_id) OVER (PARTITION BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))) AS fp_group_first " +
        "FROM documents ORDER BY doc_id")) ++ OracleX.all
}
