package graft

/** DuckDB oracle SQL for the extraction-pipeline (x*) queries.
  *
  * The extraction input is synthesized from the `documents` table by
  * deterministic ARITHMETIC on the numeric doc id (graft.tokenize.DocGen),
  * so every extracted span is re-derivable in SQL: these builders
  * reconstruct the full ordered span list per document — HTML boilerplate
  * classification (chrome tags, link-density, min-words), pdf block split +
  * heading rule, table-cell grid, EDI segmentation, media stubs and the
  * mega-doc tail — and express each x-query over that reconstruction. This
  * makes the north-rule invariant (span-sequence equality on
  * (kind, text, media_ref, order)) a machine-checked CORRECTNESS row, not
  * just a spec golden. Formulas mirror DocGen/SpanTokenizer/Boilerplate;
  * keep in sync (x-oracle rows in CORRECTNESS will fail loudly if not).
  *
  * DuckDB 1.0 notes: list_concat is binary (chains use ||), `offset` is
  * reserved (quoted), list comprehensions [expr FOR x IN list IF cond] and
  * two-arg lambdas (s, i) are used throughout.
  */
object OracleX {

  private val SpanT = "STRUCT(kind VARCHAR, \"text\" VARCHAR, media_ref VARCHAR)[]"

  /** pdfPayload(V) -> expanded spans (heading rule: <=60 chars). Empty V -> []. */
  private def pdfSpans(v: String): String = {
    val head = s"upper(array_to_string($v[1:4], ' '))"
    s"CASE WHEN len($v) = 0 THEN CAST([] AS $SpanT) ELSE list_concat(" +
      s"[{'kind': CASE WHEN length($head) <= 60 THEN 'heading' ELSE 'text' END, " +
      s"'text': $head, 'media_ref': ''}], " +
      s"[{'kind': 'text', 'text': array_to_string($v[i:least(i+14, len($v))], ' ') || '.', 'media_ref': ''} " +
      s"FOR i IN range(5, len($v) + 1, 15)]) END"
  }

  /** HTML main-content spans: h1 heading + 12-word paragraph chunks kept at
    * the given min-words floor (Boilerplate link-density drops the nav /
    * read-more / footer blocks of the fixed htmlPayload shape).
    */
  private def htmlSpans(minWords: Int): String =
    "list_concat(" +
      "[{'kind': 'heading', 'text': array_to_string(w[1:3], ' '), 'media_ref': ''}], " +
      "[{'kind': 'text', 'text': array_to_string(w[i:least(i+11, n)], ' '), 'media_ref': ''} " +
      s"FOR i IN range(4, n + 1, 12) IF least(i+11, n) - i + 1 >= $minWords])"

  private def mediaRefSql(iExpr: String): String =
    s"'s3://graft-corpus/media/' || CAST((id*131 + ($iExpr)*7) % 1000 AS VARCHAR) " +
      s"|| '/' || did || '_' || CAST(($iExpr) AS VARCHAR) || '.png'"

  private def amtStr(cents: String): String =
    s"'$$' || CAST(($cents) // 100 AS VARCHAR) || '.' || " +
      s"lpad(CAST(($cents) % 100 AS VARCHAR), 2, '0')"

  private val tableCells: String =
    "list_concat(flatten([ [ " +
      "{'kind':'table_cell','text': items[i+1], 'media_ref': ''}, " +
      "{'kind':'table_cell','text': CAST(qs[i+1] AS VARCHAR), 'media_ref': ''}, " +
      s"{'kind':'table_cell','text': ${amtStr("amts[i+1]")}, 'media_ref': ''} ] " +
      "FOR i IN range(0, len(items)) ]), " +
      "[ {'kind':'table_cell','text':'total','media_ref':''}, " +
      "{'kind':'table_cell','text': CAST(list_sum(qs) AS VARCHAR),'media_ref':''}, " +
      s"{'kind':'table_cell','text': ${amtStr("list_sum(amts)")},'media_ref':''} ])"

  private val edi: String =
    "[ {'kind':'text','text':'ISA*00*' || CAST((id*1009 + 7) % 1000000000 AS VARCHAR),'media_ref':''}, " +
      "{'kind':'text','text':'GS*HP*SENDER*RECEIVER','media_ref':''}, " +
      "{'kind':'text','text':'CLP*' || did || '*1*150.00*120.00','media_ref':''}, " +
      "{'kind':'text','text':'SE*4*0001','media_ref':''} ]"

  /** DOCX paragraphs: chunks of 10 words from w[3..] as text spans. */
  private val docxSpans: String =
    "[{'kind': 'text', 'text': array_to_string(w[i:least(i+9, n)], ' '), 'media_ref': ''} " +
      "FOR i IN range(3, n + 1, 10)]"

  /** Sheet cells: the first min(n, 15) words, row-major (rows of 5). */
  private val sheetSpans: String =
    "[{'kind': 'table_cell', 'text': w[j], 'media_ref': ''} " +
      "FOR j IN range(1, least(n, 15) + 1)]"

  /** DICOM tag lines + pixel-data figure (media index 200). */
  private val dicomSpans: String =
    "[{'kind': 'text', 'text': 'patient_name=' || array_to_string(w[1:2], ' '), 'media_ref': ''}, " +
      "{'kind': 'text', 'text': 'modality=' || CASE id % 3 WHEN 0 THEN 'CT' WHEN 1 THEN 'MR' ELSE 'XR' END, 'media_ref': ''}, " +
      "{'kind': 'text', 'text': 'study_date=' || CAST(DATE '2021-01-01' + CAST(id % 365 AS INT) AS VARCHAR), 'media_ref': ''}, " +
      "{'kind': 'figure', 'text': '', 'media_ref': 's3://graft-corpus/media/' || CAST((id*131 + 1400) % 1000 AS VARCHAR) || '/' || did || '_200.png'}]"

  /** Shared reconstruction CTE prefix. passes: html min-words per span
    * column (3 -> `spans` = tokenizer default; 2 -> `spans2` = pass2).
    */
  private def recon(passes: Seq[Int] = Seq(3)): String = {
    val spanCols = passes.map { mw =>
      val name = if (mw == 3) "spans" else "spans2"
      s"(${htmlSpans(mw)} " +
        s"|| CASE WHEN mix <= 3 THEN ${pdfSpans("wp")} ELSE CAST([] AS $SpanT) END " +
        s"|| CASE WHEN mix % 2 = 0 THEN $tableCells ELSE CAST([] AS $SpanT) END " +
        s"|| CASE WHEN mix % 3 = 0 THEN [{'kind':'figure','text':'','media_ref': ${mediaRefSql("0")}}] ELSE CAST([] AS $SpanT) END " +
        s"|| CASE WHEN mix = 5 THEN $edi ELSE CAST([] AS $SpanT) END " +
        s"|| CASE WHEN id % 7 = 3 THEN $docxSpans ELSE CAST([] AS $SpanT) END " +
        s"|| CASE WHEN id % 7 = 5 THEN $sheetSpans ELSE CAST([] AS $SpanT) END " +
        s"|| CASE WHEN id % 11 = 7 THEN $dicomSpans ELSE CAST([] AS $SpanT) END " +
        s"|| CASE WHEN id % 997 = 0 THEN flatten([ (${pdfSpans("w")} " +
        s"|| CASE WHEN i % 10 = 0 THEN [{'kind':'figure','text':'','media_ref': ${mediaRefSql("i + 1")}}] ELSE CAST([] AS $SpanT) END) " +
        s"FOR i IN range(0, 100) ]) ELSE CAST([] AS $SpanT) END" +
        s") AS $name"
    }
    "WITH d0 AS (SELECT doc_id AS id, printf('doc_%09d', doc_id) AS did, doc_id % 6 AS mix, " +
      "CASE WHEN length(trim(text)) = 0 THEN ['empty','document','body'] " +
      "ELSE string_split_regex(trim(text), '\\s+') END AS w FROM documents), " +
      "d1 AS (SELECT id, did, mix, w, len(w) AS n, w[6:len(w)] AS wp, " +
      "CASE WHEN len(w) >= 4 THEN w[1:4] WHEN len(w) >= 2 THEN w[1:len(w)] " +
      "ELSE list_concat(w[1:1], ['item']) END AS items FROM d0), " +
      "d2 AS (SELECT *, [(id*31 + i*17) % 9 + 1 FOR i IN range(0, len(items))] AS qs, " +
      "[(id*97 + i*57) % 90000 + 100 FOR i IN range(0, len(items))] AS amts FROM d1), " +
      "recon AS (SELECT id, did, mix, w, n, items, qs, amts, " +
      spanCols.mkString(", ") + " FROM d2)"
  }

  val x01: String = recon() +
    ", ex AS (SELECT did, unnest(list_transform(spans, (s, i) -> " +
    "{'o': i - 1, 'k': s.kind, 't': s.\"text\", 'm': s.media_ref})) AS s FROM recon) " +
    "SELECT did AS doc_id, CAST(s.o AS INT) AS \"offset\", s.k AS kind, s.t AS text, " +
    "s.m AS media_ref FROM ex ORDER BY doc_id, s.o"

  val x02: String = recon() +
    ", ex AS (SELECT unnest(spans) AS s FROM recon) " +
    "SELECT s.kind AS kind, count(*) AS n_spans, " +
    "CAST(sum(length(s.\"text\")) AS BIGINT) AS sum_chars FROM ex GROUP BY 1 ORDER BY 1"

  /** Media (shard, index) pairs per doc, in raw-span order (plain media,
    * then dicom pixel data, then the mega tail's figures).
    */
  private val mediaNums: String =
    "CASE WHEN mix % 3 = 0 THEN [{'s': (id*131) % 1000, 'i': 0}] ELSE CAST([] AS STRUCT(s BIGINT, i BIGINT)[]) END || " +
      "CASE WHEN id % 11 = 7 THEN [{'s': (id*131 + 1400) % 1000, 'i': CAST(200 AS BIGINT)}] ELSE CAST([] AS STRUCT(s BIGINT, i BIGINT)[]) END || " +
      "CASE WHEN id % 997 = 0 THEN [{'s': (id*131 + (i+1)*7) % 1000, 'i': CAST(i + 1 AS BIGINT)} FOR i IN range(0, 100) IF i % 10 = 0] " +
      "ELSE CAST([] AS STRUCT(s BIGINT, i BIGINT)[]) END"

  /** SpanTokenizer.fakeDecodeQuality + Model.qualityScore over a media
    * struct x = {s: shard, i: index} (exact IEEE mirror).
    */
  private def qScore(x: String): String =
    s"0.4 * least(100.0, CAST(($x.s*97 + $x.i*31) % 1000 AS DOUBLE) / 5.0) " +
      s"+ 0.3 * least(100.0, CAST(($x.s*29 + $x.i*7) % 128 AS DOUBLE) * (100.0/64.0)) " +
      s"+ 0.3 * (100.0 - abs(CAST(($x.s*53 + $x.i*11) % 256 AS DOUBLE) - 128.0) * (100.0/128.0))"

  /** Per-doc modality/fax aggregates over the media list + word totals. */
  private val modalityAggs: String =
    s", m AS (SELECT id, did, mix, spans, $mediaNums AS media FROM recon), " +
      "f AS (SELECT id, did, mix, spans, media, len(media) AS n_media, " +
      "len(list_filter(media, x -> (x.s*29 + x.i*7) % 128 < 30)) AS low_cnt, " +
      "CASE WHEN len(media) = 0 THEN 0.0 ELSE list_sum(list_transform(media, x -> CAST((x.s*97 + x.i*31) % 1000 AS DOUBLE))) / greatest(len(media), 1) END AS avg_blur, " +
      s"CASE WHEN len(media) = 0 THEN 0.0 ELSE list_sum(list_transform(media, x -> ${qScore("x")})) / greatest(len(media), 1) END AS avg_q, " +
      "coalesce(list_sum(list_transform(list_filter(spans, s -> s.kind IN ('text', 'heading')), " +
      "s -> length(s.\"text\") - length(replace(s.\"text\", ' ', '')) + 1)), 0) AS total_words " +
      "FROM m)"

  private val isFax: String =
    "(n_media > 0 AND low_cnt >= greatest(1, n_media // 2) AND avg_blur < 150 AND avg_q < 50)"

  val x03: String = recon() + modalityAggs +
    " SELECT did AS doc_id, array_to_string(list_sort(['printed'] " +
    "|| CASE WHEN mix % 2 = 0 THEN ['table'] ELSE CAST([] AS VARCHAR[]) END " +
    "|| CASE WHEN total_words < 50 AND NOT (mix % 2 = 0) THEN ['visual'] ELSE CAST([] AS VARCHAR[]) END " +
    s"|| CASE WHEN $isFax THEN ['fax'] ELSE CAST([] AS VARCHAR[]) END), ',') AS modalities, " +
    "CAST(len(spans) AS INT) AS n_spans, CAST(0 AS INT) AS n_errors, " +
    "'tokenize:v1' AS extraction_path FROM f ORDER BY doc_id"

  val x04: String = recon() +
    ", rows0 AS (SELECT did, CAST(CASE WHEN mix <= 3 THEN 2 ELSE 1 END AS INT) AS span_offset, " +
    s"list_concat(['amount=' || ${amtStr("amts[i+1]")} || '|item=' || items[i+1] || '|qty=' || CAST(qs[i+1] AS VARCHAR) " +
    "FOR i IN range(0, len(items))], " +
    s"['amount=' || ${amtStr("list_sum(amts)")} || '|item=total|qty=' || CAST(list_sum(qs) AS VARCHAR)]) AS kvs " +
    "FROM recon WHERE mix % 2 = 0), " +
    "ex AS (SELECT did, span_offset, unnest(list_transform(kvs, (kv, i) -> {'i': i - 1, 'kv': kv})) AS r FROM rows0) " +
    "SELECT did AS doc_id, span_offset, CAST(r.i AS INT) AS row_idx, r.kv AS row_kv " +
    "FROM ex ORDER BY doc_id, span_offset, row_idx"

  val x05: String = recon() + modalityAggs +
    s", g AS (SELECT did, media, $isFax AS is_fax, " +
    "(total_words < 50 AND NOT (mix % 2 = 0)) AS is_visual FROM f WHERE len(media) > 0), " +
    "ex AS (SELECT did, is_fax, is_visual, unnest(media) AS x FROM g) " +
    "SELECT did AS doc_id, " +
    "'s3://graft-corpus/media/' || CAST(x.s AS VARCHAR) || '/' || did || '_' || CAST(x.i AS VARCHAR) || '.png' AS media_ref, " +
    "CAST((x.s*97 + x.i*31) % 1000 AS DOUBLE) AS blur_score, " +
    "CAST((x.s*53 + x.i*11) % 256 AS DOUBLE) AS brightness, " +
    "CAST((x.s*29 + x.i*7) % 128 AS DOUBLE) AS contrast, " +
    s"${qScore("x")} AS quality_score, " +
    "((x.s*29 + x.i*7) % 128 < 30) AS low_contrast, " +
    "CASE WHEN is_fax THEN 'deskew+otsu+open+despeckle' WHEN is_visual THEN 'deskew' " +
    "ELSE 'deskew+denoise+clahe' END AS enhancement_plan " +
    "FROM ex ORDER BY doc_id, media_ref"

  val x06: String = recon(Seq(3, 2)) +
    ", t AS (SELECT did, CAST(len(spans) AS INT) AS n_spans_1, CAST(len(spans2) AS INT) AS n_spans_2, " +
    "list_transform(spans, s -> s.\"text\") AS t1, list_transform(spans2, s -> s.\"text\") AS t2 FROM recon) " +
    "SELECT did AS doc_id, n_spans_1, n_spans_2, " +
    "CAST(len(list_intersect(t1, t2)) AS INT) AS n_agree, " +
    "CAST(len(list_intersect(t1, t2)) AS DOUBLE) / CAST(greatest(len(list_distinct(list_concat(t1, t2))), 1) AS DOUBLE) AS agreement_rate " +
    "FROM t ORDER BY doc_id"

  val x07: String = recon(Seq(3, 2)) +
    ", t AS (SELECT did, len(spans) AS n1, len(spans2) AS n2, " +
    "len(list_intersect(list_transform(spans, s -> s.\"text\"), list_transform(spans2, s -> s.\"text\"))) AS agree FROM recon), " +
    "per AS (SELECT agree AS tp, greatest(n2 - agree, 0) AS fp, greatest(n1 - agree, 0) AS fn, " +
    "CASE WHEN agree * 2 + greatest(n2 - agree, 0) + greatest(n1 - agree, 0) = 0 THEN 1.0 " +
    "ELSE CAST(agree AS DOUBLE) * 2 / (agree * 2 + greatest(n2 - agree, 0) + greatest(n1 - agree, 0)) END AS doc_f1 FROM t) " +
    "SELECT CAST(sum(tp) AS BIGINT) AS tp, CAST(sum(fp) AS BIGINT) AS fp, CAST(sum(fn) AS BIGINT) AS fn, " +
    "round(avg(doc_f1), 6) AS macro_f1, count(*) AS n_docs, " +
    "CAST(sum(tp) AS DOUBLE) * 2 / (sum(tp) * 2 + sum(fp) + sum(fn)) AS micro_f1 FROM per"

  // ---- hallucination pattern mirrors (functions/Patterns.scala) ----
  // RE2 has no backreferences: repeated-digit runs are the 10 explicit
  // alternatives instead of (\d)\1{4,}.
  private val placeholderAlt =
    "n/?a|tbd|xxx+|placeholder|unknown|not\\s*applicable|not\\s*available|none|null|" +
      "undefined|to\\s*be\\s*determined|pending|missing|\\[.*\\]|<.*>|_+|\\*+|\\.{3,}"
  private val testDataAlt =
    "test\\s*\\d*|sample\\s*\\d*|demo\\s*\\d*|example\\s*\\d*|dummy\\s*\\d*|mock\\s*\\d*|fake\\s*\\d*"
  private val repeatedAlt = (0 to 9).map(d => s"$d{5}").mkString("|")
  private def sqlStrSet(xs: Iterable[String]): String =
    xs.toSeq.sorted.map(s => s"'$s'").mkString("[", ",", "]")

  /** Severity-weighted per-span suspicion weight (Patterns.fieldFlags order:
    * critical 0.8, generic-name/address 0.5, test-data 0.5, repeated 0.3,
    * sequential 0.3 — summed left to right like the Scala fold).
    */
  private def spanWeight(t: String, ds: String): String =
    s"(CASE WHEN regexp_matches(trim($t), '(?i)^($placeholderAlt)$$') THEN 0.8 ELSE 0.0 END " +
      s"+ CASE WHEN list_contains(${sqlStrSet(graft.functions.Patterns.genericNames)}, trim(regexp_replace(lower($t), '\\s+', ' ', 'g'))) " +
      s"OR list_contains(${sqlStrSet(graft.functions.Patterns.genericAddresses)}, trim(regexp_replace(lower($t), '\\s+', ' ', 'g'))) THEN 0.5 ELSE 0.0 END " +
      s"+ CASE WHEN regexp_matches(trim($t), '(?i)^($testDataAlt)$$') THEN 0.5 ELSE 0.0 END " +
      s"+ CASE WHEN regexp_matches($t, '$repeatedAlt') THEN 0.3 ELSE 0.0 END " +
      s"+ CASE WHEN length($ds) >= 5 AND length($ds) = length(trim($t)) AND " +
      s"(len(list_filter(range(1, length($ds)), k -> CAST($ds[k+1] AS INT) - CAST($ds[k] AS INT) = 1)) = length($ds) - 1 " +
      s"OR len(list_filter(range(1, length($ds)), k -> CAST($ds[k] AS INT) - CAST($ds[k+1] AS INT) = 1)) = length($ds) - 1) " +
      "THEN 0.3 ELSE 0.0 END)"

  private val suspicion: String =
    "coalesce(list_sum(list_transform(list_filter(list_transform(spans, s -> s.\"text\"), t -> length(t) > 0), " +
      s"t -> ${spanWeight("t", "regexp_replace(t, '[^0-9]', '', 'g')")})), 0.0)"

  val x08: String = recon() +
    s", sc AS (SELECT did, least(1.0, $suspicion) AS suspicion FROM recon) " +
    "SELECT did AS doc_id, suspicion, suspicion >= 0.7 AS is_likely_hallucination " +
    "FROM sc ORDER BY doc_id"

  val x09: String = recon() +
    ", t AS (SELECT did, CAST(CASE WHEN mix <= 3 THEN 2 ELSE 1 END AS INT) AS span_offset, " +
    "list_sum(amts) AS parts_cents FROM recon WHERE mix % 2 = 0) " +
    "SELECT did AS doc_id, span_offset, CAST(parts_cents AS DOUBLE) / 100.0 AS parts_sum, " +
    "CAST(parts_cents AS DOUBLE) / 100.0 AS total_cell, " +
    "abs(parts_cents - parts_cents) <= 1 AS sum_ok FROM t ORDER BY doc_id, span_offset"

  val x10: String = recon() +
    ", cells AS (SELECT did, unnest(list_transform(list_filter(spans, s -> s.kind = 'table_cell'), s -> s.\"text\")) AS c FROM recon) " +
    "SELECT CASE WHEN trim(c) = '' THEN 'empty' " +
    "WHEN regexp_matches(trim(c), '^[0-9]{5}$') THEN 'code5' " +
    "WHEN regexp_matches(c, '[$£€¥]') THEN 'currency' " +
    "WHEN regexp_matches(trim(c), '^[0-9]+(\\.[0-9]+)?$') THEN 'number' " +
    "ELSE 'text' END AS cell_type, count(*) AS n_cells, count(DISTINCT did) AS n_docs " +
    "FROM cells GROUP BY 1 ORDER BY 1"

  val x12: String = recon() +
    s", m AS (SELECT id, did, unnest($mediaNums) AS x FROM recon), " +
    "meta AS (SELECT did, x.s AS s, x.i AS i, " +
    "'s3://graft-corpus/media/' || CAST(x.s AS VARCHAR) || '/' || did || '_' || CAST(x.i AS VARCHAR) || '.png' AS media_ref, " +
    "CASE (x.s + x.i) % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpg' WHEN 2 THEN 'tiff' ELSE 'mp4' END AS format, " +
    "CAST(320 + (x.s*17 + x.i*41) % 3777 AS INT) AS width, " +
    "CAST(240 + (x.s*23 + x.i*13) % 2921 AS INT) AS height FROM m), " +
    "meta2 AS (SELECT *, CASE WHEN format = 'mp4' THEN CAST(30 + (s*7 + i) % 3571 AS INT) ELSE 1 END AS n_frames, " +
    "CASE WHEN width <= 224 AND height <= 224 THEN width WHEN width >= height THEN 224 " +
    "ELSE greatest(1, CAST(round(CAST(width AS DOUBLE) * 224 / height, 0) AS INT)) END AS resize_w, " +
    "CASE WHEN width <= 224 AND height <= 224 THEN height WHEN width >= height " +
    "THEN greatest(1, CAST(round(CAST(height AS DOUBLE) * 224 / width, 0) AS INT)) ELSE 224 END AS resize_h FROM meta) " +
    "SELECT did AS doc_id, media_ref, format, width, height, resize_w, resize_h, n_frames, " +
    "array_to_string(CASE WHEN n_frames <= 8 THEN [CAST(k AS VARCHAR) FOR k IN range(0, n_frames)] " +
    "ELSE [CAST((k * n_frames) // 8 AS VARCHAR) FOR k IN range(0, 8)] END, ',') AS sampled_frames " +
    "FROM meta2 ORDER BY doc_id, media_ref"

  /** x11 mirror: the per-(profile, tenant) isotonic calibrator re-derived in
    * SQL. The planted sample's labels are monotone in the score
    * (Calibration.plantedSample), so the PAV fit reduces to the per-knot
    * means m(j) = (1[2j >= thr] + 1[2j+1 >= thr]) / 2 over knots x_j = j/20,
    * and apply(x) is the same clamp + binary-search linear interpolation the
    * Scala Isotonic performs (kk = largest knot index with x_kk <= x).
    */
  val x11: String = {
    def m(j: String): String =
      s"(CAST(CAST(2*($j) >= thr AS INT) + CAST(2*($j)+1 >= thr AS INT) AS DOUBLE) / 2.0)"
    val texts1 = "list_transform(spans, s -> s.\"text\")"
    val texts2 = "list_transform(spans2, s -> s.\"text\")"
    recon(Seq(3, 2)) +
      s", t AS (SELECT id, did, least(1.0, $suspicion) AS x, " +
      s"CAST(len(list_intersect($texts1, $texts2)) AS DOUBLE) " +
      s"/ CAST(greatest(len(list_distinct(list_concat($texts1, $texts2))), 1) AS DOUBLE) AS agr " +
      "FROM recon), " +
      "c AS (SELECT id, did, x, agr, id % 3 AS profile, id % 2 AS tenant, " +
      "20 + 3*(id % 3) + 2*(id % 2) AS thr FROM t), " +
      "kx AS (SELECT *, len([i FOR i IN range(0, 21) IF CAST(i AS DOUBLE)/20.0 <= x]) - 1 AS kk FROM c) " +
      "SELECT did AS doc_id, profile, tenant, x AS raw_score, " +
      "CASE WHEN agr > 0.9 THEN 1.0 ELSE 0.0 END AS label, " +
      s"CASE WHEN x <= 0.0 THEN ${m("0")} WHEN x >= 1.0 THEN ${m("20")} " +
      s"ELSE ${m("kk")} + (${m("kk+1")} - ${m("kk")}) * (x - CAST(kk AS DOUBLE)/20.0) " +
      "/ (CAST(kk+1 AS DOUBLE)/20.0 - CAST(kk AS DOUBLE)/20.0) END AS isotonic, " +
      "least(CAST(1.0 AS DOUBLE), greatest(CAST(0.0 AS DOUBLE), CAST(0.85 AS DOUBLE) * x + 0.05)) AS linear " +
      "FROM kx ORDER BY doc_id"
  }

  val x13: String = recon() +
    s", sc AS (SELECT id, did, least(1.0, $suspicion) AS suspicion FROM recon), " +
    "c AS (SELECT id, did, suspicion, least(1.0, greatest(0.0, 0.85 * (1.0 - suspicion) + 0.05)) AS confidence FROM sc), " +
    "r AS (SELECT id, did, suspicion, confidence, " +
    "CASE WHEN confidence >= 0.85 THEN 'high' WHEN confidence >= 0.5 THEN 'medium' ELSE 'low' END AS conf_level, " +
    "id % 3 > 0 AS retries_left, suspicion >= 0.7 AS is_likely_hallucination FROM c) " +
    "SELECT did AS doc_id, confidence, conf_level, is_likely_hallucination, retries_left, " +
    "CASE WHEN is_likely_hallucination THEN 'human_review' WHEN conf_level = 'high' THEN 'complete' " +
    "WHEN conf_level = 'medium' AND retries_left THEN 'retry' ELSE 'human_review' END AS route " +
    "FROM r ORDER BY doc_id"

  /** Review-queue mirror (x26): the x13 route ladder filtered to
    * non-complete rows, with the DLQ outcome closed-form — the first
    * successful redelivery pass is p* = (2·id) mod 5 (ReviewSink's stubbed
    * delivery schedule); p* in 1..MaxAttempts delivers with p*-1 failed
    * attempts, p* = 0 or 4 accumulates MaxAttempts failures and dies
    * (pass 4 never claims a dead entry).
    */
  val x26: String = recon() +
    s", sc AS (SELECT id, did, least(1.0, $suspicion) AS suspicion FROM recon), " +
    "c AS (SELECT id, did, suspicion, least(1.0, greatest(0.0, 0.85 * (1.0 - suspicion) + 0.05)) AS confidence FROM sc), " +
    "r AS (SELECT id, did, confidence, " +
    "CASE WHEN confidence >= 0.85 THEN 'high' WHEN confidence >= 0.5 THEN 'medium' ELSE 'low' END AS conf_level, " +
    "id % 3 > 0 AS retries_left, suspicion >= 0.7 AS is_likely_hallucination FROM c), " +
    "rt AS (SELECT id, did, confidence, " +
    "CASE WHEN is_likely_hallucination THEN 'human_review' WHEN conf_level = 'high' THEN 'complete' " +
    "WHEN conf_level = 'medium' AND retries_left THEN 'retry' ELSE 'human_review' END AS route " +
    "FROM r), " +
    "dlq AS (SELECT id, did, confidence, route, (2 * id) % 5 AS pstar FROM rt WHERE route <> 'complete') " +
    "SELECT did AS doc_id, route AS queue, confidence, " +
    "CASE WHEN pstar BETWEEN 1 AND 3 THEN 'delivered' ELSE 'dead' END AS status, " +
    "CAST(CASE WHEN pstar BETWEEN 1 AND 3 THEN pstar - 1 ELSE 3 END AS INT) AS attempts, " +
    "CAST(CASE WHEN pstar BETWEEN 1 AND 3 THEN pstar ELSE 0 END AS INT) AS delivered_pass " +
    "FROM dlq ORDER BY doc_id"

  // ---- claim-record surfaces (ExtractionQ.claimFields mirror) ----

  /** Per-rule violation booleans for the CMS-1500 pack over the id-derived
    * claim (ExtractionQ.claimFields): dates via DuckDB date arithmetic,
    * charges via the cents formulas.
    */
  val x14: String =
    "WITH c0 AS (SELECT doc_id AS id, printf('doc_%09d', doc_id) AS did FROM documents), " +
      "c1 AS (SELECT id, did, " +
      "DATE '1950-01-01' + CAST(id % 28000 AS INT) AS birth, " +
      "DATE '2020-01-01' + CAST(id % 365 AS INT) AS sfrom, " +
      "DATE '2020-01-01' + CAST(id % 365 AS INT) + CAST(id % 7 - 1 AS INT) AS sto, " +
      "[(id*97 + i*57) % 90000 + 100 FOR i IN range(0, 4)] AS line_cents FROM c0), " +
      "v AS (SELECT id, did, " +
      "(birth >= sfrom) AS v_dob, " +                       // allow_equal=false
      "(sto < sfrom) AS v_order, " +
      "((id % 3 <> 0) AND (id % 5 = 0)) AS v_cpt_diag, " +
      "((id % 4 = 1) AND (id % 3 = 0)) AS v_mod_cpt, " +
      "(abs(list_sum(list_transform(line_cents, x -> CAST(x AS DOUBLE) / 100.0)) " +
      "- CAST(list_sum(line_cents) + CASE WHEN id % 11 = 0 THEN 200 ELSE 0 END AS DOUBLE) / 100.0) > 0.01) AS v_sum " +
      "FROM c1), " +
      "agg AS (SELECT did, " +
      "CAST(v_dob AS INT) + CAST(v_order AS INT) + CAST(v_cpt_diag AS INT) " +
      "+ CAST(v_mod_cpt AS INT) + CAST(v_sum AS INT) AS n_err, " +
      "list_sort(CASE WHEN v_cpt_diag THEN ['cpt_requires_diagnosis'] ELSE CAST([] AS VARCHAR[]) END " +
      "|| CASE WHEN v_sum THEN ['line_charges_total'] ELSE CAST([] AS VARCHAR[]) END " +
      "|| CASE WHEN v_mod_cpt THEN ['modifier_requires_cpt'] ELSE CAST([] AS VARCHAR[]) END " +
      "|| CASE WHEN v_dob THEN ['patient_dob_before_service'] ELSE CAST([] AS VARCHAR[]) END " +
      "|| CASE WHEN v_order THEN ['service_date_order'] ELSE CAST([] AS VARCHAR[]) END) AS names " +
      "FROM v) " +
      "SELECT did AS doc_id, CAST(6 AS INT) AS rules_checked, " +
      "CAST(6 - n_err AS INT) AS rules_passed, CAST(n_err AS INT) AS n_errors, " +
      "(n_err = 0) AS passed, coalesce(array_to_string(names, ','), '') AS violated " +
      "FROM agg ORDER BY doc_id"

  /** Confidence.fieldConfidence + overall mirrored per field; weights are
    * the literals normalized by their IEEE sum exactly as the Scala does.
    */
  val x15: String = {
    // CAST to DOUBLE: DuckDB literals are DECIMAL, and decimal-with-decimal
    // arithmetic is exact — the Scala weights are computed in doubles where
    // 0.35+0.30+0.20+0.15 = 0.999...9, so the SQL must sum doubles too
    val wsum = "(CAST(0.35 AS DOUBLE) + 0.30 + 0.20 + 0.15)"
    def fld(k: Int, p: Int, q: Int): String = {
      val e = s"CAST(id * $p % 101 AS DOUBLE) / 100.0"
      val a = s"CAST(id * $q % 101 AS DOUBLE) / 100.0"
      val v = s"((id + $k) % 7 <> 0)"
      val pf = s"((id + $k) % 13 = 0)"
      val blend = s"(CAST(0.35 AS DOUBLE) / $wsum) * ($e) + (CAST(0.30 AS DOUBLE) / $wsum) * ($a) " +
        s"+ (CAST(0.20 AS DOUBLE) / $wsum) * (CASE WHEN $v THEN 1.0 ELSE CAST(1.0 AS DOUBLE) - 0.30 END) " +
        s"+ (CAST(0.15 AS DOUBLE) / $wsum) * (CASE WHEN $pf THEN CAST(1.0 AS DOUBLE) - 0.20 ELSE 1.0 END)"
      s"CASE WHEN NOT $v THEN least(greatest(0.0, least(1.0, $blend)), CAST(0.85 AS DOUBLE) - 0.01) " +
        s"ELSE greatest(0.0, least(1.0, $blend)) END AS c$k"
    }
    "WITH c0 AS (SELECT doc_id AS id, printf('doc_%09d', doc_id) AS did FROM documents), " +
      s"f AS (SELECT id, did, ${fld(0, 3, 7)}, ${fld(1, 5, 11)}, ${fld(2, 13, 17)}, ${fld(3, 19, 23)} FROM c0), " +
      "lv AS (SELECT *, " +
      (0 to 3).map(k => s"CASE WHEN c$k >= 0.85 THEN 'high' WHEN c$k >= 0.5 THEN 'medium' ELSE 'low' END AS l$k")
        .mkString(", ") + " FROM f), " +
      "o AS (SELECT id, did, l0, l1, l2, l3, " +
      "(c0 * 2 + c1 * 2 + c2 + c3) / 6.0 AS conf0, " +
      "CAST(l0 = 'low' AS INT) + CAST(l1 = 'low' AS INT) AS ci FROM lv), " +
      "o2 AS (SELECT id, did, l0, l1, l2, l3, ci, " +
      "CASE WHEN ci > 0 THEN greatest(0.0, conf0 - 0.40 * (CAST(ci AS DOUBLE) / 2)) ELSE conf0 END AS conf FROM o) " +
      "SELECT did AS doc_id, conf AS overall_confidence, " +
      "CASE WHEN conf >= 0.85 THEN 'high' WHEN conf >= 0.5 THEN 'medium' ELSE 'low' END AS overall_level, " +
      "CASE WHEN ci > 0 THEN 'human_review' " +
      "WHEN conf >= 0.85 THEN 'auto_accept' " +
      "WHEN id % 4 < 2 THEN 'retry' ELSE 'human_review' END AS action, " +
      (Seq("high", "medium", "low").map(l =>
        s"CAST(" + (0 to 3).map(k => s"CAST(l$k = '$l' AS INT)").mkString(" + ") +
          s" AS INT) AS n_$l").mkString(", ")) +
      " FROM o2 ORDER BY doc_id"
  }

  /** Critic combiner over real dual-pass agreement + derived modalities. */
  val x16: String = recon(Seq(3, 2)) + modalityAggs +
    ", agr AS (SELECT id, did, " +
    "CAST(len(list_intersect(list_transform(spans, s -> s.\"text\"), list_transform(spans2, s -> s.\"text\"))) AS DOUBLE) " +
    "/ CAST(greatest(len(list_distinct(list_concat(list_transform(spans, s -> s.\"text\"), list_transform(spans2, s -> s.\"text\")))), 1) AS DOUBLE) AS dp " +
    "FROM recon), " +
    s"mods AS (SELECT f.id, f.did, $isFax AS is_fax, " +
    "(total_words < 50 AND NOT (mix % 2 = 0)) AS is_visual FROM f), " +
    "j AS (SELECT a.id, a.did, a.dp, " +
    "CAST(a.id * 13 % 101 AS DOUBLE) / 100.0 AS ct, " +
    "greatest(CASE WHEN m.is_fax THEN 0.7 ELSE 0.0 END, CASE WHEN m.is_visual THEN 0.4 ELSE 0.0 END) AS pen " +
    "FROM agr a JOIN mods m ON a.id = m.id) " +
    "SELECT did AS doc_id, greatest(0.0, least(1.0, dp)) AS dual_pass, " +
    "greatest(0.0, least(1.0, ct)) AS critic, pen AS modality_penalty, " +
    "greatest(0.0, least(1.0, 0.5 * greatest(0.0, least(1.0, dp)) + 0.3 * greatest(0.0, least(1.0, ct)) " +
    "+ 0.2 * greatest(0.0, 1.0 - pen))) AS raw_combined " +
    "FROM j ORDER BY doc_id"

  // ---- golden-eval ladder (ExtractionQ.goldenPairs + GoldenEval mirror) ----

  private def normSql(v: String): String =
    s"regexp_replace(lower(trim($v)), '\\s+', ' ', 'g')"

  private def ratioSql(a: String, b: String): String =
    s"CASE WHEN length($a) = 0 AND length($b) = 0 THEN 1.0 " +
      s"WHEN length($a) = 0 OR length($b) = 0 THEN 0.0 " +
      s"ELSE CAST(1.0 AS DOUBLE) - CAST(levenshtein($a, $b) AS DOUBLE) / greatest(length($a), length($b)) END"

  private def numSql(v: String): String =
    s"TRY_CAST(trim(regexp_replace(trim($v), '[$$€£¥,]', '', 'g')) AS DOUBLE)"

  private def centsStr(c: String): String =
    s"CAST(($c) // 100 AS VARCHAR) || '.' || lpad(CAST(($c) % 100 AS VARCHAR), 2, '0')"

  /** ExtractionQ.evalWords mirror: word list padded to >= 6 with the fixed
    * filler so every index the pair builders use exists for any document.
    */
  private val evalWordsCte: String =
    "gw AS (SELECT doc_id AS id, printf('doc_%09d', doc_id) AS did, " +
      "CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[]) " +
      "ELSE string_split_regex(trim(text), '\\s+') END AS w0 FROM documents), " +
      "g0 AS (SELECT id, did, CASE WHEN len(w0) >= 6 THEN w0 " +
      "ELSE w0 || ['empty','document','body','gamma','delta','omega'][len(w0)+1:6] END AS w FROM gw)"

  private val goldenPairsCte: String =
    s"WITH $evalWordsCte, " +
      "g1 AS (SELECT id, did, w, len(w) AS n, (id*97) % 90000 + 100 AS cents FROM g0), " +
      "pairs AS (" +
      "SELECT id, did, 'claim_id' AS field, 'exact' AS match_level, did AS g, " +
      "CASE WHEN id % 29 = 0 THEN substr(did, 5) ELSE did END AS x FROM g1 " +
      "UNION ALL SELECT id, did, 'patient_name', 'normalized', w[1] || ' ' || w[2], " +
      "CASE WHEN id % 23 = 0 THEN (CASE WHEN n >= 5 THEN w[5] ELSE 'alt' END) " +
      "WHEN id % 13 = 0 THEN upper(w[1]) || '  ' || upper(w[2]) " +
      "ELSE w[1] || ' ' || w[2] END FROM g1 " +
      "UNION ALL SELECT id, did, 'provider', 'fuzzy', w[3] || ' ' || w[4], " +
      // planted FN: extraction dropped every 41st doc (NULL extracted)
      "CASE WHEN id % 41 = 0 THEN NULL " +
      "WHEN id % 17 = 0 THEN substr(w[3] || ' ' || w[4], 1, length(w[3] || ' ' || w[4]) - 1) " +
      "ELSE w[3] || ' ' || w[4] END FROM g1 " +
      s"UNION ALL SELECT id, did, 'total_charges', 'numeric', '$$' || ${centsStr("cents")}, " +
      s"CASE WHEN id % 19 = 0 THEN ${centsStr("cents + cents // 5")} " +
      s"ELSE ${centsStr("cents")} END FROM g1 " +
      // planted FP: spurious field with no golden every 59th doc
      "UNION ALL SELECT id, did, 'auth_code', 'exact', NULL, " +
      "'AUTH' || CAST(id % 997 AS VARCHAR) FROM g1 WHERE id % 59 = 0), " +
      "cmp AS (SELECT did, field, match_level, " +
      "g IS NOT NULL AS golden_present, x IS NOT NULL AS extracted_present, " +
      "CASE WHEN g IS NULL AND x IS NULL THEN TRUE " +
      "WHEN g IS NULL OR x IS NULL THEN FALSE " +
      "ELSE CASE match_level " +
      "WHEN 'exact' THEN g = x " +
      s"WHEN 'normalized' THEN ${normSql("g")} = ${normSql("x")} " +
      s"WHEN 'fuzzy' THEN ${ratioSql(normSql("g"), normSql("x"))} >= 0.85 " +
      s"ELSE abs(${numSql("g")} - ${numSql("x")}) / abs(${numSql("g")}) <= 0.01 END END AS is_match, " +
      "CASE WHEN g IS NULL AND x IS NULL THEN 1.0 " +
      "WHEN g IS NULL OR x IS NULL THEN 0.0 " +
      "ELSE CASE match_level " +
      s"WHEN 'exact' THEN (CASE WHEN g = x THEN 1.0 ELSE ${ratioSql("g", "x")} END) " +
      s"WHEN 'normalized' THEN (CASE WHEN ${normSql("g")} = ${normSql("x")} THEN 1.0 " +
      s"ELSE ${ratioSql(normSql("g"), normSql("x"))} END) " +
      s"WHEN 'fuzzy' THEN ${ratioSql(normSql("g"), normSql("x"))} " +
      s"ELSE greatest(0.0, CAST(1.0 AS DOUBLE) - abs(${numSql("g")} - ${numSql("x")}) / abs(${numSql("g")})) END END AS similarity " +
      "FROM pairs)"

  val x17: String = goldenPairsCte +
    " SELECT did AS doc_id, field, match_level, golden_present, " +
    "extracted_present, is_match, similarity " +
    "FROM cmp ORDER BY doc_id, field"

  /** metrics.py:233-272 per_field_f1 mirror: expected/extracted/correct
    * counted separately, zero-guarded precision/recall, f1 = 2pr/(p+r).
    */
  val x18: String = goldenPairsCte +
    ", agg AS (SELECT field, match_level, " +
    "CAST(SUM(CAST(is_match AS INT)) AS BIGINT) AS tp, " +
    "CAST(SUM(CAST(extracted_present AS INT)) AS BIGINT) AS n_extracted, " +
    "CAST(SUM(CAST(golden_present AS INT)) AS BIGINT) AS n_expected, " +
    "count(*) AS n_docs FROM cmp GROUP BY 1, 2), " +
    "pr AS (SELECT field, match_level, tp, n_extracted - tp AS fp, " +
    "n_expected - tp AS fn, n_docs, " +
    "CASE WHEN n_extracted > 0 THEN CAST(tp AS DOUBLE) / n_extracted ELSE 0.0 END AS precision, " +
    "CASE WHEN n_expected > 0 THEN CAST(tp AS DOUBLE) / n_expected ELSE 0.0 END AS recall " +
    "FROM agg) " +
    "SELECT field, match_level, tp, fp, fn, n_docs, precision, recall, " +
    "CASE WHEN precision + recall > 0 THEN 2 * precision * recall / (precision + recall) " +
    "ELSE CAST(0.0 AS DOUBLE) END AS f1 " +
    "FROM pr ORDER BY field"

  // ---- full hallucination detector over named-field records ----

  /** x19 mirror. Checks that cannot fire on this record shape by
    * construction (placeholder/test-data regexes on the letter-fillers,
    * flags on the <=4-digit ref fields) are omitted from the SQL — if the
    * construction ever drifted so they fired, the Scala side would diverge
    * and this row would fail loudly.
    */
  val x19: String = {
    val alphaHit = (v: String) =>
      s"(regexp_replace(lower($v), '[^a-z]', '', 'g') LIKE '%abcd%' " +
        s"OR regexp_replace(lower($v), '[^a-z]', '', 'g') LIKE '%efgh%' " +
        s"OR regexp_replace(lower($v), '[^a-z]', '', 'g') LIKE '%lmno%') " +
        s"AND length(regexp_replace(lower($v), '[^a-z]', '', 'g')) >= 4"
    val trunc = (v: String) =>
      s"(ends_with($v, '...') OR ends_with($v, '…') OR ends_with($v, '---') OR ends_with($v, '___'))"
    val genName = (v: String) =>
      s"list_contains(${sqlStrSet(graft.functions.Patterns.genericNames)}, " +
        s"trim(regexp_replace(lower($v), '\\s+', ' ', 'g')))"
    val zeroId = (ds: String) =>
      s"(length($ds) >= 5 AND $ds = repeat('0', length($ds)))"
    val seqId = (ds: String) =>
      s"(length($ds) >= 5 AND len(list_filter(range(1, length($ds)), " +
        s"k -> CAST($ds[k+1] AS INT) - CAST($ds[k] AS INT) = 1)) = length($ds) - 1)"
    "WITH r0 AS (SELECT doc_id AS id, printf('doc_%09d', doc_id) AS did FROM documents), " +
      "f AS (SELECT id, did, " +
      "CASE WHEN id % 53 = 0 THEN 'john doe' WHEN id % 47 = 0 THEN 'dup value' " +
      "ELSE 'alice ' || substr('pqrstuv', CAST(id % 7 AS INT) + 1, 1) END AS patient_name, " +
      "CASE WHEN id % 47 = 0 THEN 'dup value' " +
      "ELSE 'bob ' || substr('vwxyz', CAST(id % 5 AS INT) + 1, 1) END AS provider_name, " +
      "CASE WHEN id % 47 = 0 THEN 'dup value' WHEN id % 41 = 0 THEN 'see abcd list' " +
      "ELSE 'note ' || substr('abcdefghijk', CAST(id % 11 AS INT) + 1, 1) END AS notes, " +
      "CASE WHEN id % 43 = 0 THEN 'partial text...' " +
      "ELSE 'full text ' || substr('abcdefghijklm', CAST(id % 13 AS INT) + 1, 1) END AS description, " +
      "CASE WHEN id % 31 = 0 THEN '00000' WHEN id % 37 = 0 THEN 'M34567' " +
      "ELSE 'M' || CAST(id * 7 % 100000 AS VARCHAR) END AS member_id, " +
      "CASE WHEN id % 61 = 0 THEN '101' ELSE CAST(id * 3 % 900 + 100 AS VARCHAR) END AS ref_a, " +
      "CASE WHEN id % 61 = 0 THEN '102' ELSE CAST(id * 5 % 900 + 1100 AS VARCHAR) END AS ref_b, " +
      "CASE WHEN id % 61 = 0 THEN '103' ELSE CAST(id * 9 % 900 + 2100 AS VARCHAR) END AS ref_c " +
      "FROM r0), " +
      "g AS (SELECT id, did, " +
      // per-field flags in the engine's order: fields alphabetical, flags
      // in namedFieldFlags order (repeat, trunc, alpha, zero-id, seq-id)
      s"CAST(${trunc("description")} AS INT) AS d_trunc, " +
      s"CAST(${alphaHit("description")} AS INT) AS d_alpha, " +
      s"CAST(regexp_matches(member_id, '$repeatedAlt') AS INT) AS m_rep, " +
      s"CAST(${zeroId("regexp_replace(member_id, '[^0-9]', '', 'g')")} AS INT) AS m_zero, " +
      s"CAST(${seqId("regexp_replace(member_id, '[^0-9]', '', 'g')")} AS INT) AS m_seq, " +
      s"CAST(${alphaHit("notes")} AS INT) AS n_alpha, " +
      s"CAST(${genName("patient_name")} AS INT) AS p_gen, " +
      s"CAST(${alphaHit("patient_name")} AS INT) AS p_alpha, " +
      s"CAST(${genName("provider_name")} AS INT) AS pr_gen, " +
      s"CAST(${alphaHit("provider_name")} AS INT) AS pr_alpha, " +
      // cross-field detectors over the full value list
      "len(list_filter(list_distinct([x FOR x IN [trim(lower(patient_name)), trim(lower(provider_name)), " +
      "trim(lower(notes)), trim(lower(description)), trim(lower(member_id)), " +
      "trim(lower(ref_a)), trim(lower(ref_b)), trim(lower(ref_c))] IF length(x) > 2]), " +
      "v -> len(list_filter([x FOR x IN [trim(lower(patient_name)), trim(lower(provider_name)), " +
      "trim(lower(notes)), trim(lower(description)), trim(lower(member_id)), " +
      "trim(lower(ref_a)), trim(lower(ref_b)), trim(lower(ref_c))] IF length(x) > 2], x -> x = v)) >= 3)) AS dup_groups, " +
      "list_sort([n FOR n IN list_transform([regexp_replace(x, '[^0-9]', '', 'g') FOR x IN " +
      "[trim(lower(patient_name)), trim(lower(provider_name)), trim(lower(notes)), trim(lower(description)), " +
      "trim(lower(member_id)), trim(lower(ref_a)), trim(lower(ref_b)), trim(lower(ref_c))] IF length(x) > 2], " +
      "d -> TRY_CAST(d AS BIGINT)) IF n IS NOT NULL AND n > 0 AND n < 1000000]) AS ints " +
      "FROM f), " +
      "h AS (SELECT id, did, d_trunc, d_alpha, m_rep, m_zero, m_seq, n_alpha, p_gen, p_alpha, pr_gen, pr_alpha, dup_groups, " +
      "CASE WHEN len(ints) < 3 THEN 0 ELSE len([k FOR k IN range(1, len(ints) - 1) " +
      "IF ints[k+1] = ints[k] + 1 AND ints[k+2] = ints[k] + 2]) END AS triples FROM g) " +
      "SELECT did AS doc_id, " +
      "CAST(m_zero AS INT) AS n_critical, " +
      "CAST(m_seq + p_gen + pr_gen + dup_groups AS INT) AS n_high, " +
      "CAST(d_trunc + d_alpha + m_rep + n_alpha + p_alpha + pr_alpha + triples AS INT) AS n_medium, " +
      "least(CAST(1.0 AS DOUBLE), " +
      // coefficients forced to DOUBLE so the additions accumulate in
      // IEEE like the Scala fold (DuckDB decimal literals would sum exactly)
      "CAST(0.3 AS DOUBLE) * d_trunc + CAST(0.3 AS DOUBLE) * d_alpha + CAST(0.3 AS DOUBLE) * m_rep + CAST(0.8 AS DOUBLE) * m_zero + CAST(0.5 AS DOUBLE) * m_seq + CAST(0.3 AS DOUBLE) * n_alpha + CAST(0.5 AS DOUBLE) * p_gen + CAST(0.3 AS DOUBLE) * p_alpha + CAST(0.5 AS DOUBLE) * pr_gen + CAST(0.3 AS DOUBLE) * pr_alpha + CAST(0.5 AS DOUBLE) * dup_groups + CAST(0.3 AS DOUBLE) * triples) AS suspicion, " +
      "least(CAST(1.0 AS DOUBLE), " +
      "CAST(0.3 AS DOUBLE) * d_trunc + CAST(0.3 AS DOUBLE) * d_alpha + CAST(0.3 AS DOUBLE) * m_rep + CAST(0.8 AS DOUBLE) * m_zero + CAST(0.5 AS DOUBLE) * m_seq + CAST(0.3 AS DOUBLE) * n_alpha + CAST(0.5 AS DOUBLE) * p_gen + CAST(0.3 AS DOUBLE) * p_alpha + CAST(0.5 AS DOUBLE) * pr_gen + CAST(0.3 AS DOUBLE) * pr_alpha + CAST(0.5 AS DOUBLE) * dup_groups + CAST(0.3 AS DOUBLE) * triples) >= 0.7 AS is_likely_hallucination " +
      "FROM h ORDER BY doc_id"
  }

  /** Consolidated-export mirror (x28): the planted outcomes are pure id
    * arithmetic — the field-name PHI set is constant (member_id /
    * patient_name / provider_name), contact_info joins it on the planted
    * SSN-shape docs, the schema gap (empty auth_code) lands every 5th doc,
    * and duplicate-group sizes follow from the x19 patient-name schedule.
    */
  val x28: String =
    "WITH r0 AS (SELECT doc_id AS id, printf('doc_%09d', doc_id) AS did FROM documents), " +
      "f AS (SELECT id, did, " +
      "CASE WHEN id % 53 = 0 THEN 'john doe' WHEN id % 47 = 0 THEN 'dup value' " +
      "ELSE 'alice ' || substr('pqrstuv', CAST(id % 7 AS INT) + 1, 1) END AS patient_name FROM r0), " +
      "g AS (SELECT id, did, patient_name, " +
      "CASE WHEN id % 19 = 0 THEN 'contact_info,member_id,patient_name,provider_name' " +
      "ELSE 'member_id,patient_name,provider_name' END AS masked_fields, " +
      "(id % 5 <> 0) AS is_complete, " +
      "CASE WHEN id % 5 = 0 THEN CAST(9 AS DOUBLE) / 10 ELSE CAST(10 AS DOUBLE) / 10 END AS completeness, " +
      "CAST(CASE WHEN id % 5 = 0 THEN 1 ELSE 0 END AS INT) AS n_empty FROM f) " +
      "SELECT did AS doc_id, patient_name AS primary_norm, masked_fields, " +
      "is_complete, completeness, n_empty, " +
      "COUNT(*) OVER (PARTITION BY patient_name) AS dup_group_size " +
      "FROM g ORDER BY doc_id"

  // ---- code validators (x20) + fax signals (x21) ----

  val x20: String = {
    val carcPat = "^(CO|CR|OA|PI|PR)?([A-Z]?[0-9]{1,3})$"
    val rarcPat = "^(MA|M|N)([0-9]{1,3})$"
    "WITH c0 AS (SELECT doc_id AS id, printf('doc_%09d', doc_id) AS did FROM documents), " +
      "f AS (SELECT id, did, " +
      "['25','LT','ZZ','5X','-59','1'][CAST(id % 6 AS INT) + 1] AS modifier, " +
      "['207Q00000X','207q00000x','12345','ABCD567890'][CAST(id % 4 AS INT) + 1] AS taxonomy, " +
      "['45','CO-45','PR 3','B45','XX45','4567'][CAST(id % 6 AS INT) + 1] AS carc, " +
      "['MA01','N1','M12','ma 130','X1','MA1234'][CAST(id % 6 AS INT) + 1] AS rarc FROM c0), " +
      "g AS (SELECT *, regexp_replace(upper(trim(modifier)), '^-+', '') AS mod_n, " +
      "upper(trim(taxonomy)) AS taxo_n, " +
      "regexp_replace(upper(trim(carc)), '[-\\s]+', '', 'g') AS carc_n, " +
      "regexp_replace(upper(trim(rarc)), '[-\\s]+', '', 'g') AS rarc_n FROM f) " +
      "SELECT did AS doc_id, modifier, " +
      "regexp_matches(mod_n, '^[A-Z0-9]{2}$') AS modifier_format_ok, " +
      "regexp_matches(mod_n, '^[A-Z0-9]{2}$') AND " +
      s"list_contains(${sqlStrSet(graft.functions.Codes.validModifiers)}, mod_n) AS modifier_known, " +
      "taxonomy, length(taxo_n) = 10 AND regexp_matches(taxo_n, '^[0-9]{2}[0-9A-Z]{8}$') AS taxonomy_ok, " +
      "carc, " +
      s"CASE WHEN regexp_matches(carc_n, '$carcPat') THEN " +
      s"(CASE WHEN regexp_extract(carc_n, '$carcPat', 1) <> '' " +
      s"THEN regexp_extract(carc_n, '$carcPat', 1) || '-' || regexp_extract(carc_n, '$carcPat', 2) " +
      s"ELSE regexp_extract(carc_n, '$carcPat', 2) END) ELSE NULL END AS carc_norm, " +
      "rarc, " +
      s"CASE WHEN regexp_matches(rarc_n, '$rarcPat') THEN " +
      s"regexp_extract(rarc_n, '$rarcPat', 1) || regexp_extract(rarc_n, '$rarcPat', 2) ELSE NULL END AS rarc_norm, " +
      s"CASE WHEN regexp_matches(rarc_n, '$rarcPat') THEN " +
      s"(CASE regexp_extract(rarc_n, '$rarcPat', 1) WHEN 'MA' THEN 'Alert' " +
      "WHEN 'M' THEN 'Modified' ELSE 'Supplemental' END) ELSE NULL END AS rarc_category " +
      "FROM g ORDER BY doc_id"
  }

  val x21: String = recon() +
    s", m AS (SELECT id, did, unnest($mediaNums) AS x FROM recon) " +
    "SELECT did AS doc_id, " +
    "'s3://graft-corpus/media/' || CAST(x.s AS VARCHAR) || '/' || did || '_' || CAST(x.i AS VARCHAR) || '.png' AS media_ref, " +
    "((x.s + 3 * x.i) % 5 = 0) AS is_one_bit, " +
    "((x.s + 2 * x.i) % 7 = 0 OR (x.s + x.i) % 11 = 0) AS is_ccitt, " +
    "coalesce(array_to_string(" +
    "CASE WHEN (x.s + 3 * x.i) % 5 = 0 THEN ['1-bit-image'] ELSE CAST([] AS VARCHAR[]) END " +
    "|| CASE WHEN (x.s + 2 * x.i) % 7 = 0 THEN ['ccitt-fax-encoded'] ELSE CAST([] AS VARCHAR[]) END " +
    "|| CASE WHEN (x.s + x.i) % 11 = 0 THEN ['jbig2-encoded'] ELSE CAST([] AS VARCHAR[]) END, ','), '') AS fax_signals " +
    "FROM m ORDER BY doc_id, media_ref"

  /** Document-metadata header projection (x23 mirror). */
  val x23: String =
    "WITH d0 AS (SELECT doc_id AS id, printf('doc_%09d', doc_id) AS did, " +
      "doc_id % 6 AS mix, text FROM documents) " +
      "SELECT did AS doc_id, sha256(text) AS content_sha256, " +
      "CAST(1 + CAST(mix <= 3 AS INT) + CAST(mix % 2 = 0 AS INT) " +
      "+ CAST(mix % 3 = 0 AS INT) + CAST(mix = 5 AS INT) " +
      "+ CAST(id % 7 = 3 AS INT) + CAST(id % 7 = 5 AS INT) " +
      "+ CAST(id % 11 = 7 AS INT) " +
      "+ CASE WHEN id % 997 = 0 THEN 110 ELSE 0 END AS INT) AS n_raw_spans, " +
      "array_to_string(list_sort(" +
      "CASE WHEN id % 11 = 7 THEN ['dicom'] ELSE CAST([] AS VARCHAR[]) END " +
      "|| CASE WHEN id % 7 = 3 THEN ['docx'] ELSE CAST([] AS VARCHAR[]) END " +
      "|| CASE WHEN mix = 5 THEN ['edi'] ELSE CAST([] AS VARCHAR[]) END " +
      "|| ['html'] " +
      "|| CASE WHEN mix % 3 = 0 OR id % 997 = 0 THEN ['media'] ELSE CAST([] AS VARCHAR[]) END " +
      "|| CASE WHEN mix <= 3 OR id % 997 = 0 THEN ['pdf_text'] ELSE CAST([] AS VARCHAR[]) END " +
      "|| CASE WHEN id % 7 = 5 THEN ['sheet'] ELSE CAST([] AS VARCHAR[]) END " +
      "|| CASE WHEN mix % 2 = 0 THEN ['table_raw'] ELSE CAST([] AS VARCHAR[]) END), ',') AS raw_kinds, " +
      "(mix % 2 = 0) AS has_tables, " +
      "(mix % 3 = 0 OR id % 11 = 7 OR id % 997 = 0) AS has_media, " +
      "CAST(DATE '2019-01-01' + CAST(id % 1000 AS INT) AS VARCHAR) AS creation_date " +
      "FROM d0 ORDER BY doc_id"

  /** Tiebreaker-ladder outcomes per planted field pair (x24 mirror — the
    * word-derived values never collide with the 'x'-suffixed variant or the
    * placeholder by construction, so outcomes reduce to the id schedule).
    * The IoU runs on span-attached provenance boxes (DocGen.spanBbox): the
    * two passes share span 0's box on even ids (IoU = 1) and use
    * neighboring spans' boxes on odd ids (IoU <= ~0.043 or 0 on wrap, far
    * below the 0.4 threshold — margin pinned by spec), so bbox_overlap
    * fires exactly on id % 6 = 0.
    */
  val x24: String =
    "WITH c0 AS (SELECT doc_id AS id, printf('doc_%09d', doc_id) AS did FROM documents), " +
      "t AS (SELECT id, did, unnest([" +
      "CASE WHEN id % 5 = 0 THEN 'single_pass' ELSE 'exact_agreement' END, " +
      "CASE WHEN id % 6 = 0 THEN 'bbox_overlap' WHEN id % 3 = 0 THEN 'last_resort' " +
      "WHEN id % 4 = 0 THEN 'placeholder_penalty' ELSE 'last_resort' END, " +
      "CASE WHEN id % 9 = 0 THEN 'both_missing' ELSE 'single_pass' END]) AS tiebreaker FROM c0) " +
      "SELECT tiebreaker, count(*) AS n, count(DISTINCT did) AS n_docs " +
      "FROM t GROUP BY 1 ORDER BY 1"

  /** Per-span provenance mirror (x27): page from the 15-spans-per-page
    * rule, bbox from DocGen.spanBbox id arithmetic, blk_p{page}_{idx} ids.
    */
  val x27: String = recon() +
    ", ex AS (SELECT id, did, unnest(list_transform(spans, (s, i) -> " +
    "{'o': i - 1, 'k': s.kind})) AS s FROM recon) " +
    "SELECT did AS doc_id, CAST(s.o AS INT) AS \"offset\", s.k AS kind, " +
    "CAST(s.o // 15 + 1 AS INT) AS page, " +
    "'blk_p' || CAST(s.o // 15 + 1 AS VARCHAR) || '_' || CAST(s.o AS VARCHAR) AS block_id, " +
    "CAST((id*7 + s.o*13) % 80 AS DOUBLE) / 100.0 AS x1, " +
    "CAST((id*11 + s.o*3) % 80 AS DOUBLE) / 100.0 AS y1, " +
    "CAST((id*7 + s.o*13) % 80 AS DOUBLE) / 100.0 + 0.15 AS x2, " +
    "CAST((id*11 + s.o*3) % 80 AS DOUBLE) / 100.0 + 0.08 AS y2, " +
    "'tokenize:v1' AS extraction_path " +
    "FROM ex ORDER BY doc_id, \"offset\""

  /** Run comparison: per-field F1 of candidate vs baseline over the same
    * golden fixture (x25 mirror; reuses the x17 comparison expressions).
    */
  val x25: String = {
    def isMatch(g: String, x: String): String =
      "CASE match_level " +
        s"WHEN 'exact' THEN $g = $x " +
        s"WHEN 'normalized' THEN ${normSql(g)} = ${normSql(x)} " +
        s"WHEN 'fuzzy' THEN ${ratioSql(normSql(g), normSql(x))} >= 0.85 " +
        s"ELSE abs(${numSql(g)} - ${numSql(x)}) / abs(${numSql(g)}) <= 0.01 END"
    s"WITH $evalWordsCte, " +
      "g1 AS (SELECT id, did, w, len(w) AS n, (id*97) % 90000 + 100 AS cents FROM g0), " +
      "pairs AS (" +
      // baseline extracted (x17 profile) and candidate extracted side by side
      "SELECT id, 'claim_id' AS field, 'exact' AS match_level, did AS g, " +
      "CASE WHEN id % 29 = 0 THEN substr(did, 5) ELSE did END AS xb, did AS xc FROM g1 " +
      "UNION ALL SELECT id, 'patient_name', 'normalized', w[1] || ' ' || w[2], " +
      "CASE WHEN id % 23 = 0 THEN (CASE WHEN n >= 5 THEN w[5] ELSE 'alt' END) " +
      "WHEN id % 13 = 0 THEN upper(w[1]) || '  ' || upper(w[2]) " +
      "ELSE w[1] || ' ' || w[2] END, " +
      "CASE WHEN id % 11 = 0 THEN (CASE WHEN n >= 6 THEN w[6] ELSE 'other' END) " +
      "ELSE w[1] || ' ' || w[2] END FROM g1 " +
      "UNION ALL SELECT id, 'provider', 'fuzzy', w[3] || ' ' || w[4], " +
      "CASE WHEN id % 17 = 0 THEN substr(w[3] || ' ' || w[4], 1, length(w[3] || ' ' || w[4]) - 1) " +
      "ELSE w[3] || ' ' || w[4] END, " +
      "CASE WHEN id % 31 = 0 THEN substr(w[3] || ' ' || w[4], 1, length(w[3] || ' ' || w[4]) - 1) " +
      "ELSE w[3] || ' ' || w[4] END FROM g1 " +
      s"UNION ALL SELECT id, 'total_charges', 'numeric', '$$' || ${centsStr("cents")}, " +
      s"CASE WHEN id % 19 = 0 THEN ${centsStr("cents + cents // 5")} ELSE ${centsStr("cents")} END, " +
      s"CASE WHEN id % 37 = 0 THEN ${centsStr("cents + cents // 5")} ELSE ${centsStr("cents")} END FROM g1), " +
      "m AS (SELECT field, " +
      s"CAST(${isMatch("g", "xb")} AS INT) AS mb, CAST(${isMatch("g", "xc")} AS INT) AS mc FROM pairs), " +
      "agg AS (SELECT field, CAST(SUM(mb) AS BIGINT) AS tpb, CAST(SUM(1 - mb) AS BIGINT) AS eb, " +
      "CAST(SUM(mc) AS BIGINT) AS tpc, CAST(SUM(1 - mc) AS BIGINT) AS ec FROM m GROUP BY 1) " +
      "SELECT field, CAST(tpb AS DOUBLE) * 2 / (tpb * 2 + eb + eb) AS f1_baseline, " +
      "CAST(tpc AS DOUBLE) * 2 / (tpc * 2 + ec + ec) AS f1_candidate, " +
      "CAST(tpc AS DOUBLE) * 2 / (tpc * 2 + ec + ec) - CAST(tpb AS DOUBLE) * 2 / (tpb * 2 + eb + eb) AS delta, " +
      "CASE WHEN CAST(tpc AS DOUBLE) * 2 / (tpc * 2 + ec + ec) - CAST(tpb AS DOUBLE) * 2 / (tpb * 2 + eb + eb) < -0.02 THEN 'regression' " +
      "WHEN CAST(tpc AS DOUBLE) * 2 / (tpc * 2 + ec + ec) - CAST(tpb AS DOUBLE) * 2 / (tpb * 2 + eb + eb) > 0.02 THEN 'improvement' " +
      "ELSE 'stable' END AS status " +
      "FROM agg ORDER BY field"
  }

  /** IVF ANN mirror (e07): per-label mean centroids as the coarse
    * quantizer, nearest-cell assignment, nprobe=2 probing, exact re-rank.
    */
  val e07: String = {
    val cos =
      "list_sum(list_transform(list_zip(p.q_emb, x.embedding), y -> CAST(y[1] AS DOUBLE) * CAST(y[2] AS DOUBLE))) " +
        "/ (sqrt(list_sum(list_transform(p.q_emb, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))) " +
        "* sqrt(list_sum(list_transform(x.embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))))"
    "WITH comps AS (SELECT label, unnest(embedding) AS v, " +
      "generate_subscripts(embedding, 1) AS dim FROM embeddings), " +
      "means AS (SELECT label, dim, avg(CAST(v AS DOUBLE)) AS m FROM comps GROUP BY 1, 2), " +
      "cl AS (SELECT label, list(m ORDER BY dim) AS cvec FROM means GROUP BY label), " +
      "dists AS (SELECT e.vec_id, c.label, " +
      "list_sum(list_transform(list_zip(e.embedding, c.cvec), " +
      "x -> (CAST(x[1] AS DOUBLE) - x[2]) * (CAST(x[1] AS DOUBLE) - x[2]))) AS d " +
      "FROM embeddings e, cl c), " +
      "ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, label) AS rk FROM dists), " +
      "cells AS (SELECT vec_id, label AS cell FROM ranked WHERE rk = 1), " +
      "corpus AS (SELECT e.vec_id, e.embedding, c.cell FROM embeddings e JOIN cells c USING (vec_id)), " +
      "probes AS (SELECT r.vec_id AS query_id, e.embedding AS q_emb, r.label AS probe_cell " +
      "FROM ranked r JOIN embeddings e USING (vec_id) WHERE r.rk <= 2 AND r.vec_id < 20), " +
      s"scored AS (SELECT p.query_id, x.vec_id AS neighbor_id, $cos AS cos_sim " +
      "FROM corpus x JOIN probes p ON x.cell = p.probe_cell AND x.vec_id <> p.query_id) " +
      "SELECT query_id, neighbor_id, cos_sim, rank FROM " +
      "(SELECT query_id, neighbor_id, cos_sim, " +
      "CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank " +
      "FROM scored) WHERE rank <= 5 ORDER BY query_id, rank"
  }

  /** Exact continuous length quantiles per language (d16 mirror). */
  val d16: String =
    "SELECT lang, quantile_cont(length(text), 0.5) AS median_len, " +
      "quantile_cont(length(text), 0.9) AS p90_len, count(*) AS n_docs " +
      "FROM documents GROUP BY lang ORDER BY lang"

  /** Segment fold as a window (splitter.py:290-332 mirror). */
  val x22: String =
    "WITH p0 AS (SELECT doc_id AS id, printf('doc_%09d', doc_id) AS did FROM documents), " +
      "pages AS (SELECT id, did, CAST(unnest(range(1, CAST(id % 9 + 1 AS INT) + 1)) AS INT) AS page FROM p0), " +
      "f AS (SELECT id, did, page, (page > 1 AND (id*31 + page*7) % 5 = 0) AS is_new, " +
      "['cms1500','ub04','eob','unknown'][CAST((id + page) % 4 AS INT) + 1] AS doc_type, " +
      "(id*11 + page*3) % 101 AS conf_pct FROM pages), " +
      "s AS (SELECT *, SUM(CASE WHEN page = 1 OR is_new THEN 1 ELSE 0 END) " +
      "OVER (PARTITION BY id ORDER BY page) AS segment FROM f) " +
      "SELECT did AS doc_id, CAST(segment AS INT) AS segment, " +
      "min(page) AS start_page, max(page) AS end_page, " +
      "arg_min(doc_type, page) AS document_type, count(*) AS n_pages, " +
      "CAST(SUM(conf_pct) AS DOUBLE) / count(*) / 100.0 AS confidence " +
      "FROM s GROUP BY did, segment ORDER BY doc_id, segment"

  /** x29 mirror — decoded-pixel quality re-derived WITHOUT any codec: the
    * PNG round-trip is lossless, so the decoded pixels equal the synthetic
    * page arithmetic (ImageKernels.syntheticPage): 64x64 grid, glyph bands
    * in rows r<32 with r%8 in 4..6 (column gaps every (s+c)%7==0), 12
    * speckle pixels in the lower half, 235 background. The Laplacian's
    * BORDER_REFLECT_101 neighbors come from lag/lead windows (at an edge the
    * missing side coalesces to the opposite neighbor — exactly reflect-101
    * for a 3x3 kernel). Sums are exact integers and the final divisions are
    * by the power-of-two pixel count, so every metric is bit-exact vs the
    * Scala kernel.
    */
  val x29: String = recon() +
    s", m AS (SELECT id, did, unnest($mediaNums) AS x FROM recon), " +
    "px AS (SELECT did, x.s AS s, x.i AS i, rr.r AS r, cc.c AS c, " +
    "CAST(CASE WHEN rr.r < 32 AND rr.r % 8 >= 4 AND rr.r % 8 <= 6 AND (x.s + cc.c) % 7 <> 0 " +
    "THEN 20 + (x.s * cc.c + x.i * rr.r) % 30 " +
    "WHEN rr.r >= 32 AND len([k FOR k IN range(0, 12) " +
    "IF 32 + (x.s*13 + x.i*7 + k*31) % 32 = rr.r AND (x.s*17 + x.i*11 + k*43) % 64 = cc.c]) > 0 " +
    "THEN 10 ELSE 235 END AS BIGINT) AS v " +
    "FROM m, range(0, 64) rr(r), range(0, 64) cc(c)), " +
    "lap AS (SELECT did, s, i, v, " +
    "coalesce(lag(v) OVER wr, lead(v) OVER wr) + coalesce(lead(v) OVER wr, lag(v) OVER wr) " +
    "+ coalesce(lag(v) OVER wc, lead(v) OVER wc) + coalesce(lead(v) OVER wc, lag(v) OVER wc) " +
    "- 4 * v AS lp FROM px " +
    "WINDOW wr AS (PARTITION BY did, i, c ORDER BY r), " +
    "wc AS (PARTITION BY did, i, r ORDER BY c)), " +
    "agg AS (SELECT did, s, i, sum(v) AS sv, sum(v*v) AS sv2, " +
    "sum(lp) AS sl, sum(lp*lp) AS sl2 FROM lap GROUP BY 1, 2, 3), " +
    "q AS (SELECT did, s, i, CAST(sv AS DOUBLE) / 4096.0 AS brightness, " +
    "sqrt(CAST(sv2 AS DOUBLE) / 4096.0 - (CAST(sv AS DOUBLE) / 4096.0) * (CAST(sv AS DOUBLE) / 4096.0)) AS contrast, " +
    "CAST(sl2 AS DOUBLE) / 4096.0 - (CAST(sl AS DOUBLE) / 4096.0) * (CAST(sl AS DOUBLE) / 4096.0) AS lap_var FROM agg) " +
    "SELECT did AS doc_id, " +
    "'s3://graft-corpus/media/' || CAST(s AS VARCHAR) || '/' || did || '_' || CAST(i AS VARCHAR) || '.png' AS media_ref, " +
    "brightness, contrast, lap_var, " +
    "greatest(CAST(0.0 AS DOUBLE), least(CAST(100.0 AS DOUBLE), " +
    "least(CAST(100.0 AS DOUBLE), lap_var / 10.0) * 0.4 " +
    "+ least(CAST(100.0 AS DOUBLE), contrast * 2.0) * 0.3 " +
    "+ (100.0 - abs(brightness - 128.0) * 0.78) * 0.3)) AS quality_score, " +
    "contrast < 30.0 AS low_contrast, brightness < 100.0 AS is_dark, " +
    "(brightness > 200.0 AND contrast < 40.0) AS is_washed_out " +
    "FROM q ORDER BY doc_id, media_ref"

  /** x33 mirror — 2×2 box downsample over the same re-derived pixels as
    * x29: block sums are exact integers; the resized brightness divides by
    * 1024 then 4 and the full-resolution mean by 4096 — the same integer
    * scaled by powers of two, so `mean_preserved` compares two exactly
    * equal doubles in both engines.
    */
  val x33: String = recon() +
    s", m AS (SELECT id, did, unnest($mediaNums) AS x FROM recon), " +
    "px AS (SELECT did, x.s AS s, x.i AS i, rr.r AS r, cc.c AS c, " +
    "CAST(CASE WHEN rr.r < 32 AND rr.r % 8 >= 4 AND rr.r % 8 <= 6 AND (x.s + cc.c) % 7 <> 0 " +
    "THEN 20 + (x.s * cc.c + x.i * rr.r) % 30 " +
    "WHEN rr.r >= 32 AND len([k FOR k IN range(0, 12) " +
    "IF 32 + (x.s*13 + x.i*7 + k*31) % 32 = rr.r AND (x.s*17 + x.i*11 + k*43) % 64 = cc.c]) > 0 " +
    "THEN 10 ELSE 235 END AS BIGINT) AS v " +
    "FROM m, range(0, 64) rr(r), range(0, 64) cc(c)), " +
    "ds AS (SELECT did, s, i, r // 2 AS br, c // 2 AS bc, SUM(v) AS sv " +
    "FROM px GROUP BY 1, 2, 3, 4, 5), " +
    "agg AS (SELECT did, s, i, SUM(sv) AS s1, SUM(sv * sv) AS s2 FROM ds GROUP BY 1, 2, 3), " +
    "q AS (SELECT did, s, i, CAST(s1 AS DOUBLE) / 1024.0 / 4.0 AS b, " +
    "CAST(s2 AS DOUBLE) / 1024.0 / 16.0 AS e2, CAST(s1 AS DOUBLE) / 4096.0 AS bfull FROM agg) " +
    "SELECT did AS doc_id, " +
    "'s3://graft-corpus/media/' || CAST(s AS VARCHAR) || '/' || did || '_' || CAST(i AS VARCHAR) || '.png' AS media_ref, " +
    "CAST(32 AS INTEGER) AS out_w, CAST(32 AS INTEGER) AS out_h, " +
    "b AS brightness_ds, sqrt(e2 - b * b) AS contrast_ds, b = bfull AS mean_preserved " +
    "FROM q ORDER BY doc_id, media_ref"

  // ---- A/B testing (x30) + regression ladder (x31) mirrors ----

  /** Shared strategy-profile expressions for x30/x31 (ExtractionQ
    * goldenPairs / abCandPairs / abBrokenPairs / abCosmeticPairs).
    */
  private val abName = "w[1] || ' ' || w[2]"
  private val abProv = "w[3] || ' ' || w[4]"
  private val abNameB =
    "CASE WHEN id % 23 = 0 THEN (CASE WHEN n >= 5 THEN w[5] ELSE 'alt' END) " +
      s"WHEN id % 13 = 0 THEN upper(w[1]) || '  ' || upper(w[2]) ELSE $abName END"
  private val abNameC =
    "CASE WHEN id % 11 = 0 THEN (CASE WHEN n >= 6 THEN w[6] ELSE 'other' END) " +
      s"ELSE $abName END"
  private val abNameM =
    "CASE WHEN id % 23 = 0 THEN (CASE WHEN n >= 5 THEN w[5] ELSE 'alt' END) " +
      s"WHEN id % 13 = 0 THEN upper(w[1]) || '  ' || upper(w[2]) " +
      s"ELSE upper($abName) END"
  private val abProvB =
    s"CASE WHEN id % 17 = 0 THEN substr($abProv, 1, length($abProv) - 1) ELSE $abProv END"
  private val abProvC = s"CASE WHEN id % 43 = 0 THEN 'zzz clinic' ELSE $abProvB END"
  private val abTotB =
    s"CASE WHEN id % 19 = 0 THEN ${centsStr("cents + cents // 5")} ELSE ${centsStr("cents")} END"
  private def abMatch(g: String, x: String): String =
    "CASE match_level " +
      s"WHEN 'exact' THEN $g = $x " +
      s"WHEN 'normalized' THEN ${normSql(g)} = ${normSql(x)} " +
      s"WHEN 'fuzzy' THEN ${ratioSql(normSql(g), normSql(x))} >= 0.85 " +
      s"ELSE abs(${numSql(g)} - ${numSql(x)}) / abs(${numSql(g)}) <= 0.01 END"

  /** A/B outcome classification over four planted strategy pairs
    * (ab_testing.py:164-171 decision rule, compare_runs ±0.02 field bar).
    */
  val x30: String =
    s"WITH $evalWordsCte, " +
      "g1 AS (SELECT id, did, w, len(w) AS n, (id*97) % 90000 + 100 AS cents FROM g0), " +
      "v AS (" +
      "SELECT id, 'claim_id' AS field, 'exact' AS match_level, did AS g, " +
      "CASE WHEN id % 29 = 0 THEN substr(did, 5) ELSE did END AS xb, " +
      "did AS xc, " +
      "CASE WHEN id % 7 = 0 THEN substr(did, 5) ELSE did END AS xk, " +
      "CASE WHEN id % 29 = 0 THEN substr(did, 5) ELSE did END AS xm FROM g1 " +
      s"UNION ALL SELECT id, 'patient_name', 'normalized', $abName, " +
      s"$abNameB, $abNameC, $abNameB, $abNameM FROM g1 " +
      s"UNION ALL SELECT id, 'provider', 'fuzzy', $abProv, " +
      s"$abProvB, $abProvC, $abProvB, $abProvB FROM g1 " +
      s"UNION ALL SELECT id, 'total_charges', 'numeric', '$$' || ${centsStr("cents")}, " +
      s"$abTotB, $abTotB, $abTotB, $abTotB FROM g1), " +
      "t AS (" +
      "SELECT 'baseline_vs_candidate' AS test_name, field, match_level, g, xb AS xa, xc AS xx FROM v " +
      "UNION ALL SELECT 'baseline_vs_broken', field, match_level, g, xb, xk FROM v " +
      "UNION ALL SELECT 'broken_vs_baseline', field, match_level, g, xk, xb FROM v " +
      "UNION ALL SELECT 'cosmetic_refactor', field, match_level, g, xb, xm FROM v), " +
      "m AS (SELECT test_name, field, " +
      s"CAST(${abMatch("g", "xa")} AS INT) AS ma, CAST(${abMatch("g", "xx")} AS INT) AS mb FROM t), " +
      "pf AS (SELECT test_name, field, " +
      "CAST(SUM(ma) AS BIGINT) AS tpa, CAST(SUM(1 - ma) AS BIGINT) AS ea, " +
      "CAST(SUM(mb) AS BIGINT) AS tpb, CAST(SUM(1 - mb) AS BIGINT) AS eb FROM m GROUP BY 1, 2), " +
      "pf2 AS (SELECT *, CAST(tpa AS DOUBLE) * 2 / (tpa * 2 + ea + ea) AS f1a, " +
      "CAST(tpb AS DOUBLE) * 2 / (tpb * 2 + eb + eb) AS f1b FROM pf), " +
      "agg AS (SELECT test_name, " +
      "CAST(SUM(tpa) AS DOUBLE) * 2 / (SUM(tpa) * 2 + SUM(ea) + SUM(ea)) AS f1_a, " +
      "CAST(SUM(tpb) AS DOUBLE) * 2 / (SUM(tpb) * 2 + SUM(eb) + SUM(eb)) AS f1_b, " +
      "coalesce(array_to_string(list(field ORDER BY field) FILTER (WHERE f1b - f1a < -0.02), ','), '') AS regressions, " +
      "coalesce(array_to_string(list(field ORDER BY field) FILTER (WHERE f1b - f1a > 0.02), ','), '') AS improvements " +
      "FROM pf2 GROUP BY 1) " +
      "SELECT test_name, f1_a, f1_b, f1_b - f1_a AS f1_delta, " +
      "CASE WHEN f1_b - f1_a > 0.02 THEN 'b_wins' " +
      "WHEN f1_b - f1_a < -0.02 THEN 'a_wins' ELSE 'no_difference' END AS outcome, " +
      "regressions, improvements " +
      "FROM agg ORDER BY test_name"

  /** Regression severity ladder vs the committed baseline fixture
    * (regression.py:118-201): literals inlined from the SAME classpath
    * resource the Spark side reads, so fixture edits can't drift.
    */
  val x31: String = {
    val (baseMicro, baseFields) = graft.queries.ExtractionQ.regressionBaseline
    val baseValues = baseFields
      .map { case (f, v) => s"('$f', CAST($v AS DOUBLE))" }.mkString(", ")
    s"WITH $evalWordsCte, " +
      "g1 AS (SELECT id, did, w, len(w) AS n, (id*97) % 90000 + 100 AS cents FROM g0), " +
      "cur AS (" +
      "SELECT id, 'claim_id' AS field, 'exact' AS match_level, did AS g, did AS x FROM g1 " +
      s"UNION ALL SELECT id, 'patient_name', 'normalized', $abName, $abNameC FROM g1 " +
      s"UNION ALL SELECT id, 'provider', 'fuzzy', $abProv, $abProvC FROM g1 " +
      s"UNION ALL SELECT id, 'total_charges', 'numeric', '$$' || ${centsStr("cents")}, $abTotB FROM g1), " +
      s"m AS (SELECT field, CAST(${abMatch("g", "x")} AS INT) AS mm FROM cur), " +
      "agg AS (SELECT field, CAST(SUM(mm) AS BIGINT) AS tp, " +
      "CAST(SUM(1 - mm) AS BIGINT) AS e FROM m GROUP BY 1), " +
      s"base(field, baseline_f1) AS (SELECT * FROM (VALUES $baseValues)), " +
      "pf AS (SELECT coalesce(a.field, b.field) AS field, " +
      "coalesce(b.baseline_f1, CAST(0.0 AS DOUBLE)) AS baseline_f1, " +
      "coalesce(CAST(a.tp AS DOUBLE) * 2 / (a.tp * 2 + a.e + a.e), CAST(0.0 AS DOUBLE)) AS current_f1, " +
      "a.tp AS tp, a.e AS e " +
      "FROM agg a FULL JOIN base b ON a.field = b.field), " +
      "pf2 AS (SELECT *, current_f1 - baseline_f1 AS delta, " +
      "CASE WHEN current_f1 - baseline_f1 < -0.02 THEN 'regression' " +
      "WHEN current_f1 - baseline_f1 > 0.02 THEN 'improvement' ELSE 'stable' END AS status FROM pf), " +
      "pf3 AS (SELECT *, CASE WHEN status = 'regression' THEN " +
      "(CASE WHEN abs(delta) >= 0.10 THEN 'critical' ELSE 'warning' END) " +
      "ELSE 'info' END AS severity FROM pf2), " +
      "ov AS (SELECT MAX(CASE WHEN status = 'regression' THEN 1 ELSE 0 END) AS any_reg, " +
      "MAX(CASE WHEN severity = 'critical' THEN 1 ELSE 0 END) AS any_crit, " +
      "CAST(SUM(tp) AS DOUBLE) * 2 / (SUM(tp) * 2 + SUM(e) + SUM(e)) AS cur_micro FROM pf3) " +
      "SELECT field, baseline_f1, current_f1, delta, status, severity, " +
      "any_reg = 1 AS has_regression, " +
      "CASE WHEN any_crit = 1 THEN 'critical' WHEN any_reg = 1 THEN 'warning' " +
      "ELSE 'info' END AS overall_severity, " +
      s"cur_micro - CAST($baseMicro AS DOUBLE) AS overall_f1_delta " +
      "FROM pf3, ov ORDER BY field"
  }

  /** Schema-versioning mirror (x32): the five canonical hash preimages are
    * constants (name-sorted name+type+PythonBool concatenation,
    * versioning.py:329-344), so every column reduces to a CASE on the id
    * schedule with sha256 over string literals.
    */
  val x32: String = {
    val v1 = "claim_idstringTruenotesstringFalsepatient_namestringTruetotalnumberTrue"
    val vAdd = "auth_codestringFalse" + v1
    val vRem = "claim_idstringTruepatient_namestringTruetotalnumberTrue"
    val vTyp = "claim_idstringTruenotesstringFalsepatient_namestringTruetotalstringTrue"
    val vReq = "claim_idstringTruenotesstringTruepatient_namestringTruetotalnumberTrue"
    "WITH s AS (SELECT doc_id AS id, printf('doc_%09d', doc_id) AS did, " +
      "CASE WHEN doc_id % 5 = 0 THEN 'none' " +
      "WHEN doc_id % 4 = 0 THEN 'add' WHEN doc_id % 4 = 1 THEN 'rem' " +
      "WHEN doc_id % 4 = 2 THEN 'typ' ELSE 'req' END AS k FROM documents) " +
      s"SELECT did AS doc_id, sha256('$v1') AS schema_hash_v1, " +
      s"CASE k WHEN 'none' THEN sha256('$v1') WHEN 'add' THEN sha256('$vAdd') " +
      s"WHEN 'rem' THEN sha256('$vRem') WHEN 'typ' THEN sha256('$vTyp') " +
      s"ELSE sha256('$vReq') END AS schema_hash_v2, " +
      "k <> 'none' AS changed, " +
      "CASE k WHEN 'none' THEN '' WHEN 'add' THEN 'field_added' " +
      "WHEN 'rem' THEN 'field_removed' WHEN 'typ' THEN 'field_type_changed' " +
      "ELSE 'field_required_changed' END AS change_types, " +
      "k IN ('rem', 'typ') AS is_breaking, " +
      "CASE k WHEN 'none' THEN '1.0.0' WHEN 'rem' THEN '1.1.0' ELSE '1.0.1' END AS new_version, " +
      "CASE k WHEN 'none' THEN 'No changes' WHEN 'add' THEN '1 field(s) added' " +
      "WHEN 'rem' THEN '1 field(s) removed' ELSE '1 other change(s)' END AS summary, " +
      "CASE k WHEN 'add' THEN 'auth_code,claim_id,notes,patient_name,total' " +
      "WHEN 'rem' THEN 'claim_id,patient_name,total' " +
      "ELSE 'claim_id,notes,patient_name,total' END AS migrated_fields, " +
      "CASE k WHEN 'add' THEN 'auth_code' ELSE '' END AS null_fields " +
      "FROM s ORDER BY doc_id"
  }

  val all: Map[String, String] = Map(
    "x30_ab_test" -> x30, "x31_regression_ladder" -> x31,
    "x32_schema_versioning" -> x32,
    "x14_cross_field" -> x14, "x15_confidence" -> x15, "x16_critic" -> x16,
    "x17_golden_eval" -> x17, "x18_field_f1" -> x18, "x19_record_suspicion" -> x19,
    "x20_code_checks" -> x20, "x21_fax_signals" -> x21, "x22_doc_segments" -> x22,
    "x23_doc_metadata" -> x23, "x24_tiebreaker_stats" -> x24,
    "x25_run_comparison" -> x25, "d16_length_quantiles" -> d16,
    "e07_ann_ivf" -> e07,
    "x01_spans" -> x01, "x02_span_stats" -> x02, "x03_modality" -> x03,
    "x04_table_rows" -> x04, "x05_media_quality" -> x05, "x06_reconcile" -> x06,
    "x07_golden_f1" -> x07, "x08_suspicion" -> x08, "x09_table_sum_rule" -> x09,
    "x10_code_validation" -> x10, "x11_calibration" -> x11,
    "x12_media_pipeline" -> x12, "x13_routing" -> x13,
    "x26_review_queue" -> x26, "x27_span_provenance" -> x27,
    "x28_consolidated" -> x28, "x29_decoded_quality" -> x29,
    "x33_resized_stats" -> x33)
}
