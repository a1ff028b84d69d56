package graft.ext

/** DuckDB oracles for the SQL-expressible extension queries. Same
  * bit-parity discipline as OperatorOracles: identical arithmetic
  * shape, explicit casts where DuckDB widens (len/length -> BIGINT vs
  * Spark INT), regexp_replace 'g' flag, round(…, 6) before compare.
  * MinHash is portable because both engines share md5: the 60-bit
  * seed-hash is the first 15 hex chars of md5(seed|gram).
  */
object ExtOracles {
  /** Shared replay of the pattern-image d-hashes (the ivfReplayCtes
    * discipline): mosaic values from the md5-60 generator formulas,
    * bits, and the hash as two 32-bit BIGINT halves — used by both
    * image near-dup oracles so the formulas cannot diverge. */
  private val dhashReplayCtes =
    """ids AS (SELECT doc_id AS id, doc_id // 3 AS fam,
        |    CAST(doc_id % 3 AS INTEGER) AS variant FROM documents),
        |grid AS (SELECT t1.range AS bx, t2.range AS by
        |         FROM range(9) t1, range(8) t2),
        |base AS (SELECT i.id, i.fam, i.variant, g.bx, g.by,
        |    CAST(concat('0x', substr(md5('px|' || i.fam || '|' || g.bx
        |      || '|' || g.by), 1, 15)) AS BIGINT) % 256 AS v0
        |  FROM ids i, grid g),
        |pert AS (SELECT f.fam, t.range AS j,
        |    CAST(concat('0x', substr(md5('pb|' || f.fam || '|' || t.range),
        |      1, 15)) AS BIGINT) % 9 AS px,
        |    CAST(concat('0x', substr(md5('pq|' || f.fam || '|' || t.range),
        |      1, 15)) AS BIGINT) % 8 AS py
        |  FROM (SELECT DISTINCT fam FROM ids) f, range(1, 3) t),
        |hits AS (SELECT i.id, p.px, p.py, count(*) AS n
        |  FROM ids i JOIN pert p ON p.fam = i.fam AND p.j <= i.variant
        |  GROUP BY 1, 2, 3),
        |vals AS (SELECT b.id, b.bx, b.by,
        |    (b.v0 + 96 * COALESCE(h.n, 0)) % 256 AS v
        |  FROM base b LEFT JOIN hits h
        |    ON h.id = b.id AND h.px = b.bx AND h.py = b.by),
        |bits AS (SELECT v1.id, v1.by AS cy, v1.bx AS cx,
        |    CASE WHEN v1.v < v2.v THEN 1 ELSE 0 END AS bit
        |  FROM vals v1 JOIN vals v2
        |    ON v1.id = v2.id AND v1.by = v2.by AND v2.bx = v1.bx + 1
        |  WHERE v1.bx < 8),
        |halves AS (SELECT id,
        |    CAST(sum(CASE WHEN cy * 8 + cx < 32
        |      THEN bit * (CAST(1 AS BIGINT) << (cy * 8 + cx))
        |      ELSE 0 END) AS BIGINT) AS h1,
        |    CAST(sum(CASE WHEN cy * 8 + cx >= 32
        |      THEN bit * (CAST(1 AS BIGINT) << (cy * 8 + cx - 32))
        |      ELSE 0 END) AS BIGINT) AS h2
        |  FROM bits GROUP BY id)"""


  private val toks =
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '')"

  /** The Lloyd-IVF replay (2 iterations: seeds -> assign ->
    * integer-micro centroid update -> probe -> per-cluster scoring),
    * ending with the probed `scored` CTE — shared by the
    * q_sim_ivf_topk oracle and the q_ann_recall composition,
    * which append their own final stage. */
  private val ivfReplayCtes: String =
    """WITH c AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |nrm AS (SELECT vec_id AS id,
        |          list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv
        |        FROM c),
        |dims AS (SELECT unnest(range(1, (SELECT len(nv) FROM nrm LIMIT 1) + 1)) AS pos),
        |cent0 AS (SELECT CAST(row_number() OVER (ORDER BY id) AS INTEGER) - 1 AS cluster,
        |            nv AS cv
        |          FROM (SELECT id, nv FROM nrm ORDER BY id LIMIT 8) s),
        |asg1 AS (SELECT id, cluster FROM (
        |    SELECT n.id, cent0.cluster,
        |      row_number() OVER (PARTITION BY n.id
        |        ORDER BY list_dot_product(n.nv, cent0.cv) DESC, cent0.cluster) AS rn
        |    FROM nrm n CROSS JOIN cent0) t WHERE rn = 1),
        |cent1 AS (SELECT cluster, list(cval ORDER BY pos) AS cv FROM (
        |    SELECT a.cluster, d.pos,
        |      CAST(SUM(CAST(ROUND(n.nv[d.pos] * 1e6, 0) AS BIGINT)) AS DOUBLE)
        |        / COUNT(*) / 1e6 AS cval
        |    FROM asg1 a JOIN nrm n ON n.id = a.id CROSS JOIN dims d
        |    GROUP BY a.cluster, d.pos) u GROUP BY cluster),
        |asg2 AS (SELECT id, cluster FROM (
        |    SELECT n.id, cent1.cluster,
        |      row_number() OVER (PARTITION BY n.id
        |        ORDER BY list_dot_product(n.nv, cent1.cv) DESC, cent1.cluster) AS rn
        |    FROM nrm n CROSS JOIN cent1) t WHERE rn = 1),
        |cent2 AS (SELECT cluster, list(cval ORDER BY pos) AS cv FROM (
        |    SELECT a.cluster, d.pos,
        |      CAST(SUM(CAST(ROUND(n.nv[d.pos] * 1e6, 0) AS BIGINT)) AS DOUBLE)
        |        / COUNT(*) / 1e6 AS cval
        |    FROM asg2 a JOIN nrm n ON n.id = a.id CROSS JOIN dims d
        |    GROUP BY a.cluster, d.pos) u GROUP BY cluster),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 5),
        |probes AS (SELECT query_id, qv, cluster FROM (
        |    SELECT q.query_id, q.qv, cent2.cluster,
        |      row_number() OVER (PARTITION BY q.query_id
        |        ORDER BY list_dot_product(q.qv, cent2.cv)
        |          / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(cent2.cv, cent2.cv))) DESC,
        |        cent2.cluster) AS prn
        |    FROM q CROSS JOIN cent2) t WHERE prn <= 2),
        |scored AS (SELECT query_id, c.vec_id AS nn_id,
        |    round(list_dot_product(qv, v)
        |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) AS cos_sim
        |  FROM c JOIN asg2 ON c.vec_id = asg2.id
        |  JOIN probes ON asg2.cluster = probes.cluster
        |  WHERE c.vec_id != query_id)""".stripMargin

  /** Build-then-append IVF replay shared by q_ivf_append and
    * q_ivf_drift: 2-iteration Lloyd on the resident subset
    * (vec_id % 3 ≠ 0, `bnrm`), the appended third assigned against the
    * FROZEN cent2 centroids (`asgapp`), membership union in `fullasg`.
    * Mirrors [[graft.ext.ExtQueries.ensureIvfAppendIndex]] exactly. */
  private val ivfAppendCtes: String =
    """WITH c AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |nrm AS (SELECT vec_id AS id,
        |          list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv
        |        FROM c),
        |bnrm AS (SELECT * FROM nrm WHERE id % 3 <> 0),
        |dims AS (SELECT unnest(range(1, (SELECT len(nv) FROM nrm LIMIT 1) + 1)) AS pos),
        |cent0 AS (SELECT CAST(row_number() OVER (ORDER BY id) AS INTEGER) - 1 AS cluster,
        |            nv AS cv
        |          FROM (SELECT id, nv FROM bnrm ORDER BY id LIMIT 8) s),
        |asg1 AS (SELECT id, cluster FROM (
        |    SELECT n.id, cent0.cluster,
        |      row_number() OVER (PARTITION BY n.id
        |        ORDER BY list_dot_product(n.nv, cent0.cv) DESC, cent0.cluster) AS rn
        |    FROM bnrm n CROSS JOIN cent0) t WHERE rn = 1),
        |cent1 AS (SELECT cluster, list(cval ORDER BY pos) AS cv FROM (
        |    SELECT a.cluster, d.pos,
        |      CAST(SUM(CAST(ROUND(n.nv[d.pos] * 1e6, 0) AS BIGINT)) AS DOUBLE)
        |        / COUNT(*) / 1e6 AS cval
        |    FROM asg1 a JOIN bnrm n ON n.id = a.id CROSS JOIN dims d
        |    GROUP BY a.cluster, d.pos) u GROUP BY cluster),
        |asg2 AS (SELECT id, cluster FROM (
        |    SELECT n.id, cent1.cluster,
        |      row_number() OVER (PARTITION BY n.id
        |        ORDER BY list_dot_product(n.nv, cent1.cv) DESC, cent1.cluster) AS rn
        |    FROM bnrm n CROSS JOIN cent1) t WHERE rn = 1),
        |cent2 AS (SELECT cluster, list(cval ORDER BY pos) AS cv FROM (
        |    SELECT a.cluster, d.pos,
        |      CAST(SUM(CAST(ROUND(n.nv[d.pos] * 1e6, 0) AS BIGINT)) AS DOUBLE)
        |        / COUNT(*) / 1e6 AS cval
        |    FROM asg2 a JOIN bnrm n ON n.id = a.id CROSS JOIN dims d
        |    GROUP BY a.cluster, d.pos) u GROUP BY cluster),
        |asgapp AS (SELECT id, cluster FROM (
        |    SELECT n.id, cent2.cluster,
        |      row_number() OVER (PARTITION BY n.id
        |        ORDER BY list_dot_product(n.nv, cent2.cv) DESC, cent2.cluster) AS rn
        |    FROM (SELECT * FROM nrm WHERE id % 3 = 0) n CROSS JOIN cent2) t
        |  WHERE rn = 1),
        |fullasg AS (SELECT * FROM asg2 UNION ALL SELECT * FROM asgapp)""".stripMargin

  private val base: Map[String, String] = Map(
    "q_text_stats" ->
      s"""WITH t AS (SELECT doc_id, text, $toks AS toks FROM documents),
        |s AS (SELECT doc_id, text,
        |  CAST(len(toks) AS INTEGER) AS n_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) AS INTEGER) AS n_bpe_tokens,
        |  CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS INTEGER) AS n_punct,
        |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','is','to','in','it','that'))) AS INTEGER) AS n_stopwords
        |FROM t)
        |SELECT doc_id, n_tokens, n_bpe_tokens, n_punct, n_stopwords,
        |  round(CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1) * 0.4
        |      + least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
        |      + (1.0 - CAST(n_punct AS DOUBLE) / greatest(length(text), 1)) * 0.2, 6) AS quality_score,
        |  md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
        |FROM s""".stripMargin,

    "q_text_langid" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |s AS (SELECT doc_id,
        |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','is','to','in','it','that'))) AS INTEGER) AS en_hits,
        |  CAST(len(list_filter(toks, x -> x IN ('el','la','de','y','es','en','que','los'))) AS INTEGER) AS es_hits,
        |  CAST(len(list_filter(toks, x -> x IN ('le','la','de','et','est','les','des','un'))) AS INTEGER) AS fr_hits,
        |  CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist','den','von','mit'))) AS INTEGER) AS de_hits
        |FROM t)
        |SELECT doc_id, en_hits, es_hits, fr_hits, de_hits,
        |  CASE
        |    WHEN en_hits = 0 AND es_hits = 0 AND fr_hits = 0 AND de_hits = 0 THEN 'unknown'
        |    WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= de_hits THEN 'en'
        |    WHEN es_hits >= fr_hits AND es_hits >= de_hits THEN 'es'
        |    WHEN fr_hits >= de_hits THEN 'fr'
        |    ELSE 'de' END AS lang_pred
        |FROM s""".stripMargin,

    "q_text_redact" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |    text
        |    || CASE WHEN doc_id % 3 = 0
        |            THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |            ELSE '' END
        |    || CASE WHEN doc_id % 5 = 0
        |            THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
        |                 || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |            ELSE '' END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b')) AS INTEGER) AS n_phones,
        |  regexp_replace(regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |                 '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g') AS redacted
        |FROM planted""".stripMargin,

    "q_pii_extract" ->
      """WITH planted AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0
        |      THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0
        |      THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
        |        || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      ELSE '' END AS text
        |  FROM documents),
        |x AS (SELECT doc_id,
        |    list_sort(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS em,
        |    list_sort(regexp_extract_all(text, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b')) AS ph
        |  FROM planted)
        |SELECT doc_id, COALESCE(list_aggregate(em, 'string_agg', ','), '') AS emails,
        |  COALESCE(list_aggregate(ph, 'string_agg', ','), '') AS phones,
        |  CAST(len(em) AS INTEGER) AS n_emails, CAST(len(ph) AS INTEGER) AS n_phones
        |FROM x WHERE len(em) > 0 OR len(ph) > 0""".stripMargin,

    "q_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |long_docs AS (SELECT * FROM t WHERE len(toks) >= 3),
        |grams AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
        |          FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS i FROM long_docs) x)
        |SELECT doc_id, count(*) AS n_grams, count(DISTINCT gram) AS n_distinct,
        |  round(1.0 - CAST(count(DISTINCT gram) AS DOUBLE) / count(*), 6) AS repetition
        |FROM grams GROUP BY doc_id""".stripMargin,

    "q_novelty_score" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |long_docs AS (SELECT * FROM t WHERE len(toks) >= 3),
        |grams AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
        |          FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS i FROM long_docs) x),
        |dfreq AS (SELECT gram, CAST(count(*) AS BIGINT) AS gdf FROM grams GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN gdf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        |  round(CAST(sum(CASE WHEN gdf = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS novelty
        |FROM grams JOIN dfreq USING (gram) GROUP BY doc_id""".stripMargin,

    "q_token_fertility" ->
      """SELECT lang AS grp, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS n_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  round(CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]'))) AS DOUBLE)
        |    / CAST(sum(length(text)) AS DOUBLE), 6) AS fertility
        |FROM documents GROUP BY 1""".stripMargin,

    "q_novelty_indexed" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |long_docs AS (SELECT * FROM t WHERE len(toks) >= 3),
        |grams AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
        |          FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS i FROM long_docs) x),
        |hist AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 4 <> 0),
        |batch AS (SELECT * FROM grams WHERE doc_id % 4 = 0)
        |SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN h.gram IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
        |  round(CAST(sum(CASE WHEN h.gram IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS novelty
        |FROM batch b LEFT JOIN hist h ON h.gram = b.gram GROUP BY b.doc_id""".stripMargin,

    "q_hash_split" ->
      """SELECT doc_id,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        CAST(concat('0x', substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
        |      FROM documents) t""".stripMargin,

    "q_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE CAST(concat('0x', substr(md5('sample|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 < 100""".stripMargin,

    "q_gopher_filters" ->
      s"""WITH t AS (SELECT doc_id, text, $toks AS toks,
        |  trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |m AS (SELECT doc_id, text,
        |  CAST(len(toks) AS INTEGER) AS n_tokens,
        |  round(CAST(length(replace(norm, ' ', '')) AS DOUBLE)
        |    / greatest(CAST(len(toks) AS INTEGER), 1), 6) AS mean_word_len,
        |  round(CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS INTEGER)
        |    / CAST(greatest(CAST(len(toks) AS INTEGER), 1) AS DOUBLE), 6) AS alpha_ratio,
        |  round(CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS DOUBLE)
        |    / greatest(CAST(len(toks) AS INTEGER), 1), 6) AS symbol_ratio,
        |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','is','to','in','it','that'))) AS INTEGER) AS n_stopwords
        |FROM t)
        |SELECT doc_id, n_tokens, mean_word_len, alpha_ratio, symbol_ratio, n_stopwords,
        |  n_tokens BETWEEN 40 AND 5000 AS r_wordcount,
        |  mean_word_len BETWEEN 3.0 AND 10.0 AS r_meanlen,
        |  alpha_ratio >= 0.8 AS r_alpha,
        |  symbol_ratio <= 0.1 AS r_symbol,
        |  n_stopwords >= 2 AS r_stop,
        |  (n_tokens BETWEEN 40 AND 5000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
        |    AND alpha_ratio >= 0.8 AND symbol_ratio <= 0.1 AND n_stopwords >= 2 AS keep
        |FROM m""".stripMargin,

    "q_data_mixture" ->
      """WITH cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
        |tot AS (SELECT sum(n) AS total FROM cnt),
        |r AS (SELECT source, n,
        |        (CASE WHEN CAST(substr(source, 4, 10) AS INTEGER) % 2 = 0
        |              THEN CAST(2.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END
        |         * CAST(total AS DOUBLE)) / CAST(n AS DOUBLE) AS ratio
        |      FROM cnt, tot),
        |rr AS (SELECT source, ratio / (SELECT max(ratio) FROM r) AS rate FROM r)
        |SELECT d.doc_id, d.source, round(rr.rate, 6) AS rate
        |FROM documents d JOIN rr USING (source)
        |WHERE CAST(concat('0x', substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |      % 1000000 < rate * 1000000.0""".stripMargin,

    "q_bm25_topk" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |wtf AS (SELECT doc_id,
        |  CAST(len(toks) AS INTEGER) AS dl,
        |  CAST(len(list_filter(toks, x -> x = 'spark')) AS INTEGER) AS tf0,
        |  CAST(len(list_filter(toks, x -> x = 'data')) AS INTEGER) AS tf1,
        |  CAST(len(list_filter(toks, x -> x = 'join')) AS INTEGER) AS tf2
        |FROM t),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(dl) AS BIGINT) AS sum_dl,
        |  CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
        |  CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
        |  CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
        |FROM wtf),
        |scored AS (SELECT doc_id, dl, tf0, tf1, tf2,
        |  ln(((CAST(n_docs AS DOUBLE) - df0 + 0.5) / (CAST(df0 AS DOUBLE) + 0.5)) + 1.0)
        |    * (CAST(tf0 AS DOUBLE) * (1.2 + 1.0))
        |    / (CAST(tf0 AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs))))
        |  + ln(((CAST(n_docs AS DOUBLE) - df1 + 0.5) / (CAST(df1 AS DOUBLE) + 0.5)) + 1.0)
        |    * (CAST(tf1 AS DOUBLE) * (1.2 + 1.0))
        |    / (CAST(tf1 AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs))))
        |  + ln(((CAST(n_docs AS DOUBLE) - df2 + 0.5) / (CAST(df2 AS DOUBLE) + 0.5)) + 1.0)
        |    * (CAST(tf2 AS DOUBLE) * (1.2 + 1.0))
        |    / (CAST(tf2 AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))) AS score
        |FROM wtf CROSS JOIN stats)
        |SELECT doc_id, dl, tf0, tf1, tf2, round(score, 6) AS bm25
        |FROM scored WHERE score > 0
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    // SemDeDup replay: same flat-seed centroids + argmax assignment as
    // q_sim_ivf_flat, then within-cluster pairwise cosine (a<b) and
    // is_kept = no lower-id partner at cos >= 0.35.
    "q_semantic_dedup" ->
      """WITH c AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |cent AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS cluster, v AS cv
        |         FROM (SELECT vec_id, v FROM c ORDER BY vec_id LIMIT 8)),
        |asg AS (SELECT vec_id, v, cluster FROM (
        |    SELECT c.vec_id, c.v, cent.cluster,
        |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
        |        list_dot_product(v, cv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) DESC,
        |        cluster) AS arn
        |    FROM c CROSS JOIN cent) t WHERE arn = 1),
        |dups AS (SELECT b.vec_id AS b_id,
        |    round(list_dot_product(a.v, b.v)
        |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
        |  FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
        |better AS (SELECT b_id, count(*) AS n_better FROM dups
        |           WHERE cos_sim >= 0.35 GROUP BY 1)
        |SELECT asg.vec_id, asg.cluster,
        |  COALESCE(better.n_better, 0) AS n_better,
        |  COALESCE(better.n_better, 0) = 0 AS is_kept
        |FROM asg LEFT JOIN better ON asg.vec_id = better.b_id""".stripMargin,

    "q_contamination" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |long_docs AS (SELECT * FROM t WHERE len(toks) >= 3),
        |grams AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
        |          FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS i FROM long_docs) x),
        |bench AS (SELECT doc_id AS bench_id, gram FROM grams WHERE doc_id % 97 = 0),
        |train AS (SELECT doc_id, gram FROM grams WHERE doc_id % 97 != 0)
        |SELECT t.doc_id,
        |  count(DISTINCT t.gram) AS n_shared_grams,
        |  count(DISTINCT b.bench_id) AS n_bench_docs
        |FROM train t JOIN bench b ON t.gram = b.gram
        |GROUP BY 1
        |HAVING count(DISTINCT t.gram) >= 3""".stripMargin,

    "q_vocab_topk" ->
      s"""WITH tok AS (SELECT unnest($toks) AS token FROM documents)
        |SELECT token, count(*) AS n FROM tok
        |GROUP BY 1 ORDER BY n DESC, token LIMIT 100""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
        |  min(doc_id) AS keeper_id, count(*) AS n_docs
        |FROM documents GROUP BY 1""".stripMargin,

    "q_dedup_ngram_jaccard" ->
      s"""WITH sampled AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
        |t AS (SELECT doc_id, $toks AS toks FROM sampled),
        |long_docs AS (SELECT * FROM t WHERE len(toks) >= 3),
        |grams AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
        |          FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS i FROM long_docs) x),
        |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
        |rare AS (SELECT g.doc_id, g.gram FROM grams g
        |         JOIN (SELECT gram, count(*) AS gdf FROM grams GROUP BY 1) d USING (gram)
        |         WHERE d.gdf <= 100),
        |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |         FROM rare a JOIN rare b USING (gram)
        |         WHERE a.doc_id < b.doc_id),
        |shared AS (SELECT c.a_id, c.b_id, count(*) AS n_shared
        |           FROM cand c
        |           JOIN grams ga ON ga.doc_id = c.a_id
        |           JOIN grams gb ON gb.doc_id = c.b_id AND gb.gram = ga.gram
        |           GROUP BY 1, 2)
        |SELECT a_id, b_id, jaccard FROM (
        |  SELECT a_id, b_id,
        |    round(CAST(n_shared AS DOUBLE) / (na.n + nb.n - n_shared), 6) AS jaccard
        |  FROM shared JOIN sizes na ON na.doc_id = a_id
        |              JOIN sizes nb ON nb.doc_id = b_id) p
        |WHERE jaccard >= 0.02""".stripMargin,

    // Sequence-level conversation dedup: docs re-expressed as ordered
    // turn-hash text (8-token turns, md5-hex15 per turn), then the
    // ngram-jaccard pipeline verbatim over the turn tokens — pairs
    // score only on shared ordered 3-turn runs.
    "q_conv_near_dups" -> {
      val tt = ExtQueries.convTurnTokens
      val th = ExtQueries.convThreshold
      s"""WITH t0 AS (SELECT doc_id, $toks AS toks FROM documents),
        |turns AS (SELECT doc_id, i,
        |    substr(md5(array_to_string(toks[(i*$tt+1):(i*$tt+$tt)], ' ')), 1, 15) AS th
        |  FROM (SELECT doc_id, toks,
        |        unnest(range(0, CAST((len(toks) + $tt - 1) // $tt AS INT))) AS i
        |        FROM t0) x),
        |tt AS (SELECT doc_id, string_agg(th, ' ' ORDER BY i) AS text
        |       FROM turns GROUP BY 1),
        |t AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '${"\\s"}+'), x -> x != '') AS toks
        |  FROM tt),
        |long_docs AS (SELECT * FROM t WHERE len(toks) >= 3),
        |grams AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
        |          FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS i FROM long_docs) x),
        |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
        |rare AS (SELECT g.doc_id, g.gram FROM grams g
        |         JOIN (SELECT gram, count(*) AS gdf FROM grams GROUP BY 1) d USING (gram)
        |         WHERE d.gdf <= 100),
        |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |         FROM rare a JOIN rare b USING (gram)
        |         WHERE a.doc_id < b.doc_id),
        |shared AS (SELECT c.a_id, c.b_id, count(*) AS n_shared
        |           FROM cand c
        |           JOIN grams ga ON ga.doc_id = c.a_id
        |           JOIN grams gb ON gb.doc_id = c.b_id AND gb.gram = ga.gram
        |           GROUP BY 1, 2)
        |SELECT a_id, b_id, jaccard FROM (
        |  SELECT a_id, b_id,
        |    round(CAST(n_shared AS DOUBLE) / (na.n + nb.n - n_shared), 6) AS jaccard
        |  FROM shared JOIN sizes na ON na.doc_id = a_id
        |              JOIN sizes nb ON nb.doc_id = b_id) p
        |WHERE jaccard >= $th""".stripMargin
    },

    // Per-source token-budget waterfill, α = 0.5: exact-integer
    // shares ⌊R·w/W⌋ in HUGEINT (the engine's BigInt), saturation
    // rounds unrolled. UNROLL PIN: the loop adds ≥1 saturated source
    // per effective round, so rounds needed ≤ #sources (20 in the
    // documents table at every sweep SF); 24 rounds carry headroom
    // and are idempotent once the saturated set stabilizes. Each
    // round CTE is MATERIALIZED — DuckDB inlines CTEs, and each
    // round references its predecessor twice (rows + totals), so
    // un-materialized rounds re-evaluate 2^24 times.
    "q_token_budget" ->
      (tokenBudgetCtes +
        """
          |SELECT source, n_docs, ts AS tokens_available,
          |  w AS weight_micro, alloc AS tokens_alloc, sat AS saturated,
          |  frac AS alloc_frac FROM alloc""".stripMargin),

    // the allocation APPLIED: per-source accept rate = alloc_frac
    // micro, portable-md5 hash rule (the temperatureSample oracle
    // pattern with its own salt)
    "q_token_budget_sample" ->
      (tokenBudgetCtes +
        s"""
          |SELECT d.doc_id, d.source,
          |  CAST(round(a.frac * 1e6, 0) AS BIGINT) AS rate_micro
          |FROM documents d JOIN alloc a ON a.source = d.source
          |WHERE CAST(concat('0x', substr(md5('tbudget|' ||
          |    CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000
          |  < CAST(round(a.frac * 1e6, 0) AS BIGINT)""".stripMargin),

    // Within-conversation turn repetition: turn hashes as in
    // q_conv_near_dups; the longest identical-turn run via
    // gaps-and-islands (i − row_number per (doc, turn) = island id).
    "q_turn_repetition" -> {
      val tt = ExtQueries.convTurnTokens
      s"""WITH t0 AS (SELECT doc_id, $toks AS toks FROM documents),
        |turns AS (SELECT doc_id, i,
        |    substr(md5(array_to_string(toks[(i*$tt+1):(i*$tt+$tt)], ' ')), 1, 15) AS th
        |  FROM (SELECT doc_id, toks,
        |        unnest(range(0, CAST((len(toks) + $tt - 1) // $tt AS INT))) AS i
        |        FROM t0) x),
        |runs AS (SELECT doc_id, th,
        |    i - row_number() OVER (PARTITION BY doc_id, th ORDER BY i) AS isl
        |  FROM turns),
        |rl AS (SELECT doc_id, count(*) AS cnt
        |  FROM runs GROUP BY doc_id, th, isl),
        |agg AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_turns,
        |    CAST(count(DISTINCT th) AS INTEGER) AS n_distinct_turns
        |  FROM turns GROUP BY 1),
        |mr AS (SELECT doc_id, CAST(max(cnt) AS INTEGER) AS max_run
        |  FROM rl GROUP BY 1)
        |SELECT d.doc_id, coalesce(n_turns, 0) AS n_turns,
        |  coalesce(n_distinct_turns, 0) AS n_distinct_turns,
        |  coalesce(max_run, 0) AS max_run,
        |  coalesce(round(1.0 - CAST(n_distinct_turns AS DOUBLE)
        |    / CAST(n_turns AS DOUBLE), 6), 0.0) AS repeat_frac
        |FROM (SELECT doc_id FROM documents) d
        |LEFT JOIN agg ON agg.doc_id = d.doc_id
        |LEFT JOIN mr ON mr.doc_id = d.doc_id""".stripMargin
    },

    // Role-aware conversation structure over the SAME deterministic
    // transcript synthesis as the engine query (8-token chunks,
    // parity roles, doc_id%3 system opener, %5 forced repeat, %7
    // blank turn, %4 unmarked continuation at line 3, odd-doc
    // terminal period) — but the expected structure is recomputed
    // DIRECTLY from the chunk table (continuations merged by join,
    // violations by lag), never by re-running the line parser, so
    // the oracle checks the parser rather than mirroring it.
    "q_conv_structure" ->
      s"""WITH t0 AS (SELECT doc_id, $toks AS toks FROM documents),
        |dims AS (SELECT doc_id, toks,
        |    CAST((len(toks) + 7) // 8 AS INT) AS nch FROM t0),
        |chunk AS (SELECT doc_id, nch, i,
        |    CASE WHEN i = 0 AND doc_id % 3 = 0 THEN 'system'
        |         WHEN doc_id % 5 = 0 AND i = 2 THEN 'user'
        |         WHEN (i + doc_id) % 2 = 0 THEN 'user'
        |         ELSE 'assistant' END AS role,
        |    (doc_id % 4 = 0 AND i = 3) AS cont,
        |    concat(
        |      CASE WHEN doc_id % 7 = 0 AND i = 1 THEN ''
        |           ELSE array_to_string(toks[(i*8+1):(i*8+8)], ' ') END,
        |      CASE WHEN i = nch - 1 AND doc_id % 2 = 1 THEN '.'
        |           ELSE '' END) AS content
        |  FROM (SELECT doc_id, toks, nch,
        |        unnest(range(0, nch)) AS i FROM dims) x),
        |turns AS (SELECT b.doc_id, b.i, b.role,
        |    CASE WHEN b.doc_id % 4 = 0 AND b.i = 2 AND b.nch >= 4
        |         THEN b.content || ' ' || c.content
        |         ELSE b.content END AS content
        |  FROM chunk b LEFT JOIN chunk c
        |    ON c.doc_id = b.doc_id AND c.i = 3
        |       AND b.i = 2 AND b.doc_id % 4 = 0
        |  WHERE NOT b.cont),
        |nonsys AS (SELECT doc_id, role,
        |    lag(role) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        |  FROM turns WHERE role != 'system'),
        |agg AS (SELECT doc_id,
        |    CAST(count(*) AS INTEGER) AS n_turns,
        |    CAST(count(*) FILTER (WHERE role = 'user') AS INTEGER)
        |      AS n_user,
        |    CAST(count(*) FILTER (WHERE role = 'assistant') AS INTEGER)
        |      AS n_assistant,
        |    CAST(count(*) FILTER (WHERE role = 'system') AS INTEGER)
        |      AS n_system,
        |    arg_min(role, i) AS first_role,
        |    arg_max(role, i) AS last_role,
        |    CAST(count(*) FILTER (WHERE content = '') AS INTEGER)
        |      AS n_empty_turns,
        |    NOT regexp_matches(arg_max(content, i), '[.!?]$$')
        |      AS truncated_last
        |  FROM turns GROUP BY 1),
        |viol AS (SELECT doc_id,
        |    CAST(count(*) FILTER (WHERE role = prev) AS INTEGER) AS av
        |  FROM nonsys GROUP BY 1)
        |SELECT d.doc_id, coalesce(n_turns, 0) AS n_turns,
        |  coalesce(n_user, 0) AS n_user,
        |  coalesce(n_assistant, 0) AS n_assistant,
        |  coalesce(n_system, 0) AS n_system,
        |  CAST(0 AS INTEGER) AS n_pre_lines,
        |  coalesce(first_role, '') AS first_role,
        |  coalesce(last_role, '') AS last_role,
        |  coalesce(av, 0) AS alternation_violations,
        |  coalesce(n_empty_turns, 0) AS n_empty_turns,
        |  coalesce(truncated_last, false) AS truncated_last
        |FROM (SELECT doc_id FROM documents) d
        |LEFT JOIN agg USING (doc_id)
        |LEFT JOIN viol ON viol.doc_id = d.doc_id""".stripMargin,

    // The lint oracle NEVER parses the transcript: every expected
    // count derives from the synthesis arithmetic (chunk role and
    // block-kind are pure functions of doc_id and chunk index), so
    // the engine's line fold + strict JSON validation is the only
    // parser under test. Kinds per assistant chunk i, m=(doc_id+i)%5:
    // 0 valid ```json, 1 invalid ```json, 2 ```python,
    // 3 inline JSON (valid for even doc_id, '{broken}' for odd),
    // 4 prose. User chunks contribute fences only when
    // doc_id%3=0 ∧ i=0 — and those must NOT count. Every 7th doc
    // gains a trailing unclosed ```json.
    "q_struct_lint" ->
      s"""WITH t0 AS (SELECT doc_id, $toks AS toks FROM documents),
        |dims AS (SELECT doc_id,
        |    CAST((len(toks) + 7) // 8 AS INT) AS nch FROM t0),
        |chunk AS (SELECT doc_id, i,
        |    ((i + doc_id) % 2 = 1) AS ast,
        |    ((doc_id + i) % 5) AS m
        |  FROM (SELECT doc_id, nch,
        |        unnest(range(0, nch)) AS i FROM dims) x),
        |agg AS (SELECT doc_id,
        |    CAST(count(*) FILTER (WHERE ast AND m = 0) AS INTEGER) AS na,
        |    CAST(count(*) FILTER (WHERE ast AND m = 1) AS INTEGER) AS nb,
        |    CAST(count(*) FILTER (WHERE ast AND m = 2) AS INTEGER) AS nc,
        |    CAST(count(*) FILTER (WHERE ast AND m = 3
        |      AND doc_id % 2 = 0) AS INTEGER) AS nd,
        |    CAST(count(*) FILTER (WHERE ast AND m = 3
        |      AND doc_id % 2 = 1) AS INTEGER) AS ne
        |  FROM chunk GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(2 * (na + nb + nc), 0) +
        |    CASE WHEN d.doc_id % 7 = 0 AND nch > 0 THEN 1 ELSE 0 END
        |    AS n_fences,
        |  coalesce(na + nb + nc, 0) AS n_code_blocks,
        |  (d.doc_id % 7 = 0 AND nch > 0) AS unclosed_fence,
        |  coalesce(na + nb, 0) AS n_json_blocks,
        |  coalesce(nb, 0) AS n_json_invalid,
        |  coalesce(nd + ne, 0) AS n_inline_json,
        |  coalesce(ne, 0) AS n_inline_json_invalid
        |FROM dims d LEFT JOIN agg USING (doc_id)""".stripMargin,

    "q_dedup_minhash_sig" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |long_docs AS (SELECT * FROM t WHERE len(toks) >= 3),
        |grams AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
        |          FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS i FROM long_docs) x),
        |h AS (SELECT doc_id, s,
        |        CAST(concat('0x', substr(md5(CAST(s // 2 AS VARCHAR) || '|' || gram), 1 + 15 * (s % 2), 15)) AS BIGINT) AS hv
        |      FROM grams CROSS JOIN (SELECT unnest(range(0, 8)) AS s) seeds)
        |SELECT doc_id,
        |  MIN(CASE WHEN s = 0 THEN hv END) AS m0, MIN(CASE WHEN s = 1 THEN hv END) AS m1,
        |  MIN(CASE WHEN s = 2 THEN hv END) AS m2, MIN(CASE WHEN s = 3 THEN hv END) AS m3,
        |  MIN(CASE WHEN s = 4 THEN hv END) AS m4, MIN(CASE WHEN s = 5 THEN hv END) AS m5,
        |  MIN(CASE WHEN s = 6 THEN hv END) AS m6, MIN(CASE WHEN s = 7 THEN hv END) AS m7
        |FROM h GROUP BY doc_id""".stripMargin,

    "q_source_quality" ->
      s"""WITH t AS (SELECT source, text, $toks AS toks FROM documents),
        |st AS (SELECT source,
        |  CAST(len(toks) AS INTEGER) AS n_tokens,
        |  CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS INTEGER) AS n_punct,
        |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','is','to','in','it','that'))) AS INTEGER) AS n_stopwords,
        |  length(text) AS n_chars,
        |  md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
        |FROM t),
        |q AS (SELECT source, fingerprint,
        |  round(CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1) * 0.4
        |      + least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
        |      + (1.0 - CAST(n_punct AS DOUBLE) / greatest(n_chars, 1)) * 0.2, 6) AS quality_score
        |FROM st)
        |SELECT source, count(*) AS n_docs,
        |  round(CAST(SUM(CAST(ROUND(quality_score * 1e6, 0) AS BIGINT)) AS BIGINT) / 1e6
        |        / count(*), 6) AS mean_quality,
        |  round(1.0 - CAST(count(DISTINCT fingerprint) AS DOUBLE) / count(*), 6) AS dup_rate
        |FROM q GROUP BY source""".stripMargin,

    "q_unigram_logprob" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toks) AS token FROM documents),
        |vocab AS (SELECT token, count(*) AS tok_n FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(sum(tok_n) AS BIGINT) AS total_n FROM vocab),
        |terms AS (SELECT doc_id,
        |    CAST(ROUND(-ln(CAST(tok_n AS DOUBLE) / total_n) * 1e6, 0) AS BIGINT) AS nll_micro
        |  FROM tok JOIN vocab USING (token) CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round((CAST(SUM(nll_micro) AS BIGINT) / 1e6) / count(*), 6) AS mean_nll
        |FROM terms GROUP BY doc_id""".stripMargin,

    "q_dedup_simhash" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |h AS (SELECT doc_id,
        |        CAST(concat('0x', substr(md5('sh|' || tok), 1, 15)) AS BIGINT) AS h
        |      FROM tok),
        |bitsum AS (SELECT doc_id, i,
        |             SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS b
        |           FROM h CROSS JOIN (SELECT unnest(range(0, 60)) AS i) r
        |           GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(SUM(CASE WHEN b > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS simhash
        |FROM bitsum GROUP BY doc_id""".stripMargin,

    // SimHash near-dup replay: the oracle deliberately does the FULL
    // all-pairs Hamming filter (no banding) — 4x16 banding is complete
    // for radius <= 3 by pigeonhole, so any banding bug that drops a
    // true pair breaks the hash match.
    "q_simhash_near_dups" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |h AS (SELECT doc_id,
        |        CAST(concat('0x', substr(md5('sh|' || tok), 1, 15)) AS BIGINT) AS h
        |      FROM tok),
        |bitsum AS (SELECT doc_id, i,
        |             SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS b
        |           FROM h CROSS JOIN (SELECT unnest(range(0, 60)) AS i) r
        |           GROUP BY 1, 2),
        |sh AS (SELECT doc_id,
        |  CAST(SUM(CASE WHEN b > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS simhash
        |FROM bitsum GROUP BY doc_id)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin,

    "q_dedup_lsh_candidates" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |long_docs AS (SELECT * FROM t WHERE len(toks) >= 3),
        |grams AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
        |          FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS i FROM long_docs) x),
        |h AS (SELECT doc_id, s,
        |        CAST(concat('0x', substr(md5(CAST(s // 2 AS VARCHAR) || '|' || gram), 1 + 15 * (s % 2), 15)) AS BIGINT) AS hv
        |      FROM grams CROSS JOIN (SELECT unnest(range(0, 8)) AS s) seeds),
        |sig AS (SELECT doc_id,
        |  MIN(CASE WHEN s = 0 THEN hv END) AS m0, MIN(CASE WHEN s = 1 THEN hv END) AS m1,
        |  MIN(CASE WHEN s = 2 THEN hv END) AS m2, MIN(CASE WHEN s = 3 THEN hv END) AS m3,
        |  MIN(CASE WHEN s = 4 THEN hv END) AS m4, MIN(CASE WHEN s = 5 THEN hv END) AS m5,
        |  MIN(CASE WHEN s = 6 THEN hv END) AS m6, MIN(CASE WHEN s = 7 THEN hv END) AS m7
        |FROM h GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, 0 AS band, m0 AS k0, m1 AS k1 FROM sig UNION ALL
        |  SELECT doc_id, 1, m2, m3 FROM sig UNION ALL
        |  SELECT doc_id, 2, m4, m5 FROM sig UNION ALL
        |  SELECT doc_id, 3, m6, m7 FROM sig)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_shared_bands
        |FROM bands a JOIN bands b
        |  ON a.band = b.band AND a.k0 = b.k0 AND a.k1 = b.k1
        | AND a.doc_id < b.doc_id
        |GROUP BY 1, 2""".stripMargin,

    // Cap replay: identical chain to q_dedup_lsh_candidates, but the
    // bands CTE keeps only the 2 lowest doc_ids per (band, k0, k1)
    // bucket — the exact deterministic subset KmvSketchAgg's bottom-k
    // computes — before pairing. Proves the hot-bucket guard's
    // semantics cross-engine at a cap small enough to actually fire.
    "q_dedup_lsh_capped" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |long_docs AS (SELECT * FROM t WHERE len(toks) >= 3),
        |grams AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
        |          FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS i FROM long_docs) x),
        |h AS (SELECT doc_id, s,
        |        CAST(concat('0x', substr(md5(CAST(s // 2 AS VARCHAR) || '|' || gram), 1 + 15 * (s % 2), 15)) AS BIGINT) AS hv
        |      FROM grams CROSS JOIN (SELECT unnest(range(0, 8)) AS s) seeds),
        |sig AS (SELECT doc_id,
        |  MIN(CASE WHEN s = 0 THEN hv END) AS m0, MIN(CASE WHEN s = 1 THEN hv END) AS m1,
        |  MIN(CASE WHEN s = 2 THEN hv END) AS m2, MIN(CASE WHEN s = 3 THEN hv END) AS m3,
        |  MIN(CASE WHEN s = 4 THEN hv END) AS m4, MIN(CASE WHEN s = 5 THEN hv END) AS m5,
        |  MIN(CASE WHEN s = 6 THEN hv END) AS m6, MIN(CASE WHEN s = 7 THEN hv END) AS m7
        |FROM h GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, 0 AS band, m0 AS k0, m1 AS k1 FROM sig UNION ALL
        |  SELECT doc_id, 1, m2, m3 FROM sig UNION ALL
        |  SELECT doc_id, 2, m4, m5 FROM sig UNION ALL
        |  SELECT doc_id, 3, m6, m7 FROM sig),
        |capped AS (SELECT doc_id, band, k0, k1 FROM bands
        |           QUALIFY row_number() OVER (PARTITION BY band, k0, k1 ORDER BY doc_id) <= 2)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_shared_bands
        |FROM capped a JOIN capped b
        |  ON a.band = b.band AND a.k0 = b.k0 AND a.k1 = b.k1
        | AND a.doc_id < b.doc_id
        |GROUP BY 1, 2""".stripMargin,

    "q_dedup_lsh_verified" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |long_docs AS (SELECT * FROM t WHERE len(toks) >= 3),
        |grams AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
        |          FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS i FROM long_docs) x),
        |h AS (SELECT doc_id, s,
        |        CAST(concat('0x', substr(md5(CAST(s // 2 AS VARCHAR) || '|' || gram), 1 + 15 * (s % 2), 15)) AS BIGINT) AS hv
        |      FROM grams CROSS JOIN (SELECT unnest(range(0, 8)) AS s) seeds),
        |sig AS (SELECT doc_id,
        |  MIN(CASE WHEN s = 0 THEN hv END) AS m0, MIN(CASE WHEN s = 1 THEN hv END) AS m1,
        |  MIN(CASE WHEN s = 2 THEN hv END) AS m2, MIN(CASE WHEN s = 3 THEN hv END) AS m3,
        |  MIN(CASE WHEN s = 4 THEN hv END) AS m4, MIN(CASE WHEN s = 5 THEN hv END) AS m5,
        |  MIN(CASE WHEN s = 6 THEN hv END) AS m6, MIN(CASE WHEN s = 7 THEN hv END) AS m7
        |FROM h GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, 0 AS band, m0 AS k0, m1 AS k1 FROM sig UNION ALL
        |  SELECT doc_id, 1, m2, m3 FROM sig UNION ALL
        |  SELECT doc_id, 2, m4, m5 FROM sig UNION ALL
        |  SELECT doc_id, 3, m6, m7 FROM sig),
        |cand AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_shared_bands
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.k0 = b.k0 AND a.k1 = b.k1
        |          AND a.doc_id < b.doc_id
        |         GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
        |shared AS (SELECT c.a_id, c.b_id, c.n_shared_bands, count(*) AS n_shared
        |           FROM cand c
        |           JOIN grams ga ON ga.doc_id = c.a_id
        |           JOIN grams gb ON gb.doc_id = c.b_id AND gb.gram = ga.gram
        |           GROUP BY 1, 2, 3)
        |SELECT s.a_id, s.b_id, s.n_shared_bands,
        |  round(CAST(s.n_shared AS DOUBLE) / (na.n + nb.n - s.n_shared), 6) AS jaccard
        |FROM shared s JOIN sizes na ON na.doc_id = s.a_id
        |              JOIN sizes nb ON nb.doc_id = s.b_id""".stripMargin,

    // NFC replay: identical planted canonical-equivalence cases (all
    // non-ASCII built with chr() so the SQL stays ASCII), DuckDB's
    // utf8proc nfc_normalize vs java.text.Normalizer per row.
    "q_nfc_normalize" ->
      """WITH planted AS (SELECT doc_id,
        |    text || CASE WHEN doc_id % 3 = 0 THEN ' cafe' || chr(769) || ' decomposed'
        |                 WHEN doc_id % 3 = 1 THEN ' caf' || chr(233) || ' composed'
        |                 ELSE '' END AS text
        |  FROM documents)
        |SELECT doc_id, nfc_normalize(text) AS nfc_text,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_raw_bytes,
        |  CAST(octet_length(encode(nfc_normalize(text))) AS INTEGER) AS n_nfc_bytes,
        |  nfc_normalize(text) != text AS changed
        |FROM planted""".stripMargin,

    "q_dedup_report" ->
      """WITH planted AS (SELECT doc_id, source,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN 'common boilerplate page please enable javascript to continue'
        |      ELSE text END AS text
        |  FROM documents),
        |fp AS (SELECT doc_id, source,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
        |  FROM planted),
        |g AS (SELECT fingerprint, min(doc_id) AS keeper_id FROM fp GROUP BY 1)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN fp.doc_id != g.keeper_id THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
        |  CAST(count(DISTINCT fp.fingerprint) AS BIGINT) AS n_distinct,
        |  round(CAST(sum(CASE WHEN fp.doc_id != g.keeper_id THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS dup_rate
        |FROM fp JOIN g USING (fingerprint)
        |GROUP BY source""".stripMargin,

    // Memorization replay: distinct salted-md5 8-gram hashes on both
    // sides, reference = the doc_id % 5 slice, per-doc hit ratio.
    "q_memorization" ->
      s"""WITH tok AS (SELECT doc_id, $toks AS toks FROM documents),
        |dg AS (SELECT DISTINCT doc_id,
        |    CAST(concat('0x', substr(md5('mem|' ||
        |      array_to_string(toks[i:i+7], ' ')), 1, 15)) AS BIGINT) AS h
        |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS i
        |        FROM tok WHERE len(toks) >= 8) x),
        |ref AS (SELECT DISTINCT h FROM dg WHERE doc_id % 5 = 0)
        |SELECT dg.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN ref.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
        |  round(CAST(sum(CASE WHEN ref.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS mem_score
        |FROM dg LEFT JOIN ref ON dg.h = ref.h
        |GROUP BY dg.doc_id""".stripMargin,

    // Cross-corpus LSH replay: identical shingle/minhash/banding
    // construction on both corpora (benchmark = every 40th doc,
    // 'eval prompt ' prefix, id+100000), banded keys joined ACROSS
    // them, exact-Jaccard verify on the collisions.
    "q_cross_near_dups" ->
      s"""WITH corp AS (SELECT doc_id, text FROM documents),
        |bench AS (SELECT doc_id + 100000 AS doc_id,
        |    'eval prompt ' || text AS text
        |  FROM documents WHERE doc_id % 40 = 0),
        |tl AS (SELECT doc_id, $toks AS toks FROM corp),
        |tr AS (SELECT doc_id, $toks AS toks FROM bench),
        |gl AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
        |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS i
        |             FROM tl WHERE len(toks) >= 3) x),
        |gr AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
        |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS i
        |             FROM tr WHERE len(toks) >= 3) x),
        |hl AS (SELECT doc_id, s,
        |        CAST(concat('0x', substr(md5(CAST(s // 2 AS VARCHAR) || '|' || gram), 1 + 15 * (s % 2), 15)) AS BIGINT) AS hv
        |      FROM gl CROSS JOIN (SELECT unnest(range(0, 8)) AS s) seeds),
        |hr AS (SELECT doc_id, s,
        |        CAST(concat('0x', substr(md5(CAST(s // 2 AS VARCHAR) || '|' || gram), 1 + 15 * (s % 2), 15)) AS BIGINT) AS hv
        |      FROM gr CROSS JOIN (SELECT unnest(range(0, 8)) AS s) seeds),
        |sl AS (SELECT doc_id,
        |  MIN(CASE WHEN s = 0 THEN hv END) AS m0, MIN(CASE WHEN s = 1 THEN hv END) AS m1,
        |  MIN(CASE WHEN s = 2 THEN hv END) AS m2, MIN(CASE WHEN s = 3 THEN hv END) AS m3,
        |  MIN(CASE WHEN s = 4 THEN hv END) AS m4, MIN(CASE WHEN s = 5 THEN hv END) AS m5,
        |  MIN(CASE WHEN s = 6 THEN hv END) AS m6, MIN(CASE WHEN s = 7 THEN hv END) AS m7
        |FROM hl GROUP BY doc_id),
        |sr AS (SELECT doc_id,
        |  MIN(CASE WHEN s = 0 THEN hv END) AS m0, MIN(CASE WHEN s = 1 THEN hv END) AS m1,
        |  MIN(CASE WHEN s = 2 THEN hv END) AS m2, MIN(CASE WHEN s = 3 THEN hv END) AS m3,
        |  MIN(CASE WHEN s = 4 THEN hv END) AS m4, MIN(CASE WHEN s = 5 THEN hv END) AS m5,
        |  MIN(CASE WHEN s = 6 THEN hv END) AS m6, MIN(CASE WHEN s = 7 THEN hv END) AS m7
        |FROM hr GROUP BY doc_id),
        |bl AS (
        |  SELECT doc_id, 0 AS band, m0 AS k0, m1 AS k1 FROM sl UNION ALL
        |  SELECT doc_id, 1, m2, m3 FROM sl UNION ALL
        |  SELECT doc_id, 2, m4, m5 FROM sl UNION ALL
        |  SELECT doc_id, 3, m6, m7 FROM sl),
        |br AS (
        |  SELECT doc_id, 0 AS band, m0 AS k0, m1 AS k1 FROM sr UNION ALL
        |  SELECT doc_id, 1, m2, m3 FROM sr UNION ALL
        |  SELECT doc_id, 2, m4, m5 FROM sr UNION ALL
        |  SELECT doc_id, 3, m6, m7 FROM sr),
        |cand AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_shared_bands
        |         FROM bl a JOIN br b
        |           ON a.band = b.band AND a.k0 = b.k0 AND a.k1 = b.k1
        |         GROUP BY 1, 2),
        |szl AS (SELECT doc_id, count(*) AS n FROM gl GROUP BY 1),
        |szr AS (SELECT doc_id, count(*) AS n FROM gr GROUP BY 1),
        |shared AS (SELECT c.a_id, c.b_id, c.n_shared_bands, count(*) AS n_shared
        |           FROM cand c
        |           JOIN gl ga ON ga.doc_id = c.a_id
        |           JOIN gr gb ON gb.doc_id = c.b_id AND gb.gram = ga.gram
        |           GROUP BY 1, 2, 3)
        |SELECT s.a_id, s.b_id, s.n_shared_bands,
        |  round(CAST(s.n_shared AS DOUBLE) / (na.n + nb.n - s.n_shared), 6) AS jaccard
        |FROM shared s JOIN szl na ON na.doc_id = s.a_id
        |              JOIN szr nb ON nb.doc_id = s.b_id""".stripMargin,

    // CDC replay: a boundary opens at every token whose portable
    // md5-60 hash is ≡0 mod 8; chunks are the token runs between
    // boundaries, fingerprinted as md5 of the space-joined run.
    // Shared boilerplate is planted identically on both sides.
    "q_dedup_cdc" ->
      s"""WITH planted AS (SELECT doc_id,
        |    text || CASE WHEN doc_id % 10 = 0
        |      THEN ' license ' || CAST(doc_id % 5 AS VARCHAR) || '${ExtQueries.cdcBoiler}'
        |      ELSE '' END AS t
        |  FROM documents),
        |tk AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(t), '\\s+'), x -> x != '') AS toks
        |  FROM planted),
        |b AS (SELECT doc_id, toks,
        |    list_filter(range(1, len(toks) + 1), i -> i = 1 OR
        |      CAST(concat('0x', substr(md5(toks[i]), 1, 15)) AS BIGINT) % 8 = 0) AS bnd
        |  FROM tk WHERE len(toks) > 0),
        |c0 AS (SELECT doc_id, toks, bnd, unnest(range(1, len(bnd) + 1)) AS j FROM b),
        |ch AS (SELECT doc_id,
        |    md5(array_to_string(list_slice(toks, bnd[j],
        |      coalesce(bnd[j + 1], len(toks) + 1) - 1), ' ')) AS chunk_hash
        |  FROM c0)
        |SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs
        |FROM ch GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2""".stripMargin,

    "q_dedup_clusters" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, $toks AS toks FROM documents),
        |long_docs AS (SELECT * FROM t WHERE len(toks) >= 3),
        |grams AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
        |          FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS i FROM long_docs) x),
        |h AS (SELECT doc_id, s,
        |        CAST(concat('0x', substr(md5(CAST(s // 2 AS VARCHAR) || '|' || gram), 1 + 15 * (s % 2), 15)) AS BIGINT) AS hv
        |      FROM grams CROSS JOIN (SELECT unnest(range(0, 8)) AS s) seeds),
        |sig AS (SELECT doc_id,
        |  MIN(CASE WHEN s = 0 THEN hv END) AS m0, MIN(CASE WHEN s = 1 THEN hv END) AS m1,
        |  MIN(CASE WHEN s = 2 THEN hv END) AS m2, MIN(CASE WHEN s = 3 THEN hv END) AS m3,
        |  MIN(CASE WHEN s = 4 THEN hv END) AS m4, MIN(CASE WHEN s = 5 THEN hv END) AS m5,
        |  MIN(CASE WHEN s = 6 THEN hv END) AS m6, MIN(CASE WHEN s = 7 THEN hv END) AS m7
        |FROM h GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, 0 AS band, m0 AS k0, m1 AS k1 FROM sig UNION ALL
        |  SELECT doc_id, 1, m2, m3 FROM sig UNION ALL
        |  SELECT doc_id, 2, m4, m5 FROM sig UNION ALL
        |  SELECT doc_id, 3, m6, m7 FROM sig),
        |cand AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.k0 = b.k0 AND a.k1 = b.k1
        |          AND a.doc_id < b.doc_id
        |         GROUP BY 1, 2),
        |edges AS (SELECT a_id AS s, b_id AS d FROM cand
        |          UNION SELECT b_id, a_id FROM cand),
        |reach(node, label) AS (
        |  SELECT DISTINCT s, s FROM edges
        |  UNION
        |  SELECT e.s, r.label FROM reach r JOIN edges e ON e.d = r.node)
        |SELECT node, MIN(label) AS component FROM reach GROUP BY node""".stripMargin,

    // Keep-best replay: the q_dedup_clusters CC construction, quality
    // from the q_text_stats formula, argmax per component with
    // singleton docs as their own components.
    "q_dedup_keep_best" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, text, $toks AS toks FROM documents),
        |long_docs AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 3),
        |grams AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
        |          FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS i FROM long_docs) x),
        |h AS (SELECT doc_id, s,
        |        CAST(concat('0x', substr(md5(CAST(s // 2 AS VARCHAR) || '|' || gram), 1 + 15 * (s % 2), 15)) AS BIGINT) AS hv
        |      FROM grams CROSS JOIN (SELECT unnest(range(0, 8)) AS s) seeds),
        |sig AS (SELECT doc_id,
        |  MIN(CASE WHEN s = 0 THEN hv END) AS m0, MIN(CASE WHEN s = 1 THEN hv END) AS m1,
        |  MIN(CASE WHEN s = 2 THEN hv END) AS m2, MIN(CASE WHEN s = 3 THEN hv END) AS m3,
        |  MIN(CASE WHEN s = 4 THEN hv END) AS m4, MIN(CASE WHEN s = 5 THEN hv END) AS m5,
        |  MIN(CASE WHEN s = 6 THEN hv END) AS m6, MIN(CASE WHEN s = 7 THEN hv END) AS m7
        |FROM h GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, 0 AS band, m0 AS k0, m1 AS k1 FROM sig UNION ALL
        |  SELECT doc_id, 1, m2, m3 FROM sig UNION ALL
        |  SELECT doc_id, 2, m4, m5 FROM sig UNION ALL
        |  SELECT doc_id, 3, m6, m7 FROM sig),
        |cand AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.k0 = b.k0 AND a.k1 = b.k1
        |          AND a.doc_id < b.doc_id
        |         GROUP BY 1, 2),
        |edges AS (SELECT a_id AS s, b_id AS d FROM cand
        |          UNION SELECT b_id, a_id FROM cand),
        |reach(node, label) AS (
        |  SELECT DISTINCT s, s FROM edges
        |  UNION
        |  SELECT e.s, r.label FROM reach r JOIN edges e ON e.d = r.node),
        |cc AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
        |q AS (SELECT doc_id,
        |  round(CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','is','to','in','it','that'))) AS DOUBLE)
        |      / greatest(len(toks), 1) * 0.4
        |    + least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.4
        |    + (1.0 - CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS DOUBLE)
        |        / greatest(length(text), 1)) * 0.2, 6) AS quality_score
        |  FROM t),
        |labeled AS (SELECT q.doc_id, COALESCE(cc.component, q.doc_id) AS component,
        |    q.quality_score
        |  FROM q LEFT JOIN cc ON q.doc_id = cc.node)
        |SELECT doc_id, component, quality_score,
        |  row_number() OVER (PARTITION BY component
        |    ORDER BY quality_score DESC, doc_id) = 1 AS is_keeper
        |FROM labeled""".stripMargin,

    "q_sessionize" ->
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value
        |           FROM events),
        |m AS (SELECT *,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM e),
        |marked AS (SELECT *,
        |    CASE WHEN prev_ts IS NULL
        |           OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1
        |         ELSE 0 END AS is_new
        |  FROM m),
        |seq AS (SELECT *,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM marked)
        |SELECT user_id, session_seq,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end,
        |  COUNT(*) AS n_events,
        |  SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS sum_value
        |FROM seq GROUP BY user_id, session_seq""".stripMargin,

    "q_rolling" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |             CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        |           FROM events)
        |SELECT event_id, user_id,
        |  round(avg(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) / 100.0, 6) AS ma7,
        |  CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0 AS sum1h
        |FROM e""".stripMargin,

    "q_curation_pipeline" ->
      s"""WITH RECURSIVE t0 AS (SELECT doc_id, text, $toks AS toks FROM documents),
        |st AS (SELECT doc_id, text, toks,
        |  CAST(len(toks) AS INTEGER) AS n_tokens,
        |  CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS INTEGER) AS n_punct,
        |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','is','to','in','it','that'))) AS INTEGER) AS en_hits,
        |  CAST(len(list_filter(toks, x -> x IN ('el','la','de','y','es','en','que','los'))) AS INTEGER) AS es_hits,
        |  CAST(len(list_filter(toks, x -> x IN ('le','la','de','et','est','les','des','un'))) AS INTEGER) AS fr_hits,
        |  CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist','den','von','mit'))) AS INTEGER) AS de_hits,
        |  md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
        |FROM t0),
        |scored AS (SELECT *,
        |  round(CAST(en_hits AS DOUBLE) / greatest(n_tokens, 1) * 0.4
        |      + least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
        |      + (1.0 - CAST(n_punct AS DOUBLE) / greatest(length(text), 1)) * 0.2, 6) AS quality_score,
        |  CASE
        |    WHEN en_hits = 0 AND es_hits = 0 AND fr_hits = 0 AND de_hits = 0 THEN 'unknown'
        |    WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= de_hits THEN 'en'
        |    WHEN es_hits >= fr_hits AND es_hits >= de_hits THEN 'es'
        |    WHEN fr_hits >= de_hits THEN 'fr'
        |    ELSE 'de' END AS lang_pred
        |FROM st),
        |gated AS (SELECT * FROM scored
        |          WHERE n_tokens BETWEEN 15 AND 95 AND quality_score >= 0.4),
        |keepers AS (SELECT fingerprint, MIN(doc_id) AS keep_id FROM gated GROUP BY 1),
        |deduped AS (SELECT g.* FROM gated g
        |            JOIN keepers k ON g.fingerprint = k.fingerprint AND g.doc_id = k.keep_id),
        |long_docs AS (SELECT doc_id, toks FROM deduped WHERE len(toks) >= 3),
        |grams AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
        |          FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS i FROM long_docs) x),
        |h AS (SELECT doc_id, s,
        |        CAST(concat('0x', substr(md5(CAST(s // 2 AS VARCHAR) || '|' || gram), 1 + 15 * (s % 2), 15)) AS BIGINT) AS hv
        |      FROM grams CROSS JOIN (SELECT unnest(range(0, 8)) AS s) seeds),
        |sig AS (SELECT doc_id,
        |  MIN(CASE WHEN s = 0 THEN hv END) AS m0, MIN(CASE WHEN s = 1 THEN hv END) AS m1,
        |  MIN(CASE WHEN s = 2 THEN hv END) AS m2, MIN(CASE WHEN s = 3 THEN hv END) AS m3,
        |  MIN(CASE WHEN s = 4 THEN hv END) AS m4, MIN(CASE WHEN s = 5 THEN hv END) AS m5,
        |  MIN(CASE WHEN s = 6 THEN hv END) AS m6, MIN(CASE WHEN s = 7 THEN hv END) AS m7
        |FROM h GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, 0 AS band, m0 AS k0, m1 AS k1 FROM sig UNION ALL
        |  SELECT doc_id, 1, m2, m3 FROM sig UNION ALL
        |  SELECT doc_id, 2, m4, m5 FROM sig UNION ALL
        |  SELECT doc_id, 3, m6, m7 FROM sig),
        |cand AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.k0 = b.k0 AND a.k1 = b.k1
        |          AND a.doc_id < b.doc_id
        |         GROUP BY 1, 2),
        |edges AS (SELECT a_id AS s, b_id AS d FROM cand
        |          UNION SELECT b_id, a_id FROM cand),
        |reach(node, label) AS (
        |  SELECT DISTINCT s, s FROM edges
        |  UNION
        |  SELECT e.s, r.label FROM reach r JOIN edges e ON e.d = r.node),
        |cc AS (SELECT node AS doc_id, MIN(label) AS component FROM reach GROUP BY node)
        |SELECT d.doc_id, d.lang_pred, d.n_tokens, d.quality_score
        |FROM deduped d LEFT JOIN cc ON d.doc_id = cc.doc_id
        |WHERE cc.component IS NULL OR cc.component = d.doc_id""".stripMargin,

    "q_embed_quantize" ->
      """WITH c AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |m AS (SELECT vec_id, v,
        |        greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) AS s
        |      FROM c)
        |SELECT vec_id, round(s, 6) AS scale,
        |  array_to_string(list_transform(v,
        |    x -> CAST(CAST(round(x / s * 127, 0) AS INTEGER) AS VARCHAR)), ',') AS q
        |FROM m""".stripMargin,

    // Exact columns are hash-checked; the ok_* flags are computed on
    // the Spark side (estimate within bound of exact) and must all be
    // TRUE — a drifting sketch therefore fails the hash.
    "q_approx_aggs" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  TRUE AS ok_orders, TRUE AS ok_parts, TRUE AS ok_p50
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q_profile_orders" ->
      """WITH n AS (SELECT COUNT(*) AS n_rows FROM orders)
        |SELECT 'o_orderkey' AS column_name, n_rows,
        |  (SELECT COUNT(o_orderkey) FROM orders) AS n_nonnull,
        |  (SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS n_distinct FROM n
        |UNION ALL SELECT 'o_custkey', n_rows,
        |  (SELECT COUNT(o_custkey) FROM orders),
        |  (SELECT COUNT(DISTINCT o_custkey) FROM orders) FROM n
        |UNION ALL SELECT 'o_orderstatus', n_rows,
        |  (SELECT COUNT(o_orderstatus) FROM orders),
        |  (SELECT COUNT(DISTINCT o_orderstatus) FROM orders) FROM n
        |UNION ALL SELECT 'o_totalprice', n_rows,
        |  (SELECT COUNT(o_totalprice) FROM orders),
        |  (SELECT COUNT(DISTINCT o_totalprice) FROM orders) FROM n
        |UNION ALL SELECT 'o_orderdate', n_rows,
        |  (SELECT COUNT(o_orderdate) FROM orders),
        |  (SELECT COUNT(DISTINCT o_orderdate) FROM orders) FROM n
        |UNION ALL SELECT 'o_orderpriority', n_rows,
        |  (SELECT COUNT(o_orderpriority) FROM orders),
        |  (SELECT COUNT(DISTINCT o_orderpriority) FROM orders) FROM n""".stripMargin,

    "q_sim_cosine_topk" ->
      """WITH c AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 5),
        |scored AS (SELECT query_id, c.vec_id AS nn_id,
        |    round(list_dot_product(qv, v)
        |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) AS cos_sim
        |  FROM c CROSS JOIN q WHERE c.vec_id != query_id)
        |SELECT query_id, nn_id, cos_sim, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY cos_sim DESC, nn_id) AS rn
        |  FROM scored) t WHERE rn <= 10""".stripMargin,

    // retrieval metrics: same exact ranking as q_sim_cosine_topk,
    // same-label relevance, integer-nano DCG weights (round half-up
    // == Java Math.round for positive args), prefix-sum IDCG
    "q_ranking_metrics" ->
      """WITH c AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, label AS q_label, v AS qv
        |      FROM c WHERE vec_id < 5),
        |scored AS (SELECT query_id, q_label, c.vec_id AS nn_id,
        |    c.label AS n_label,
        |    round(list_dot_product(qv, v)
        |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6)
        |      AS cos_sim
        |  FROM c CROSS JOIN q WHERE c.vec_id != query_id),
        |ranked AS (SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY cos_sim DESC, nn_id) AS rn
        |    FROM scored) t WHERE rn <= 10),
        |wt AS (SELECT CAST(t.range AS INTEGER) AS i,
        |    CAST(round(1e9 / log2(t.range + 1)) AS BIGINT) AS w
        |  FROM range(1, 11) t),
        |pw AS (SELECT i, CAST(sum(w) OVER (ORDER BY i) AS BIGINT) AS pre
        |       FROM wt),
        |rel AS (SELECT r.query_id,
        |    CASE WHEN r.q_label = r.n_label THEN 1 ELSE 0 END AS rel,
        |    r.rn, wt.w
        |  FROM ranked r JOIN wt ON wt.i = r.rn),
        |agg AS (SELECT query_id,
        |    CAST(sum(rel * w) AS BIGINT) AS dcg_nano,
        |    min(CASE WHEN rel = 1 THEN rn END) AS first_rel,
        |    CAST(sum(rel) AS BIGINT) AS n_rel
        |  FROM rel GROUP BY 1),
        |rtot AS (SELECT q.query_id,
        |    (SELECT count(*) FROM c WHERE c.label = q.q_label) - 1 AS r_total
        |  FROM q)
        |SELECT a.query_id, a.n_rel,
        |  round(CASE WHEN a.first_rel IS NOT NULL
        |    THEN 1.0 / a.first_rel ELSE 0.0 END, 6) AS mrr,
        |  round(CASE WHEN r.r_total > 0
        |    THEN CAST(a.dcg_nano AS DOUBLE) /
        |      (SELECT pre FROM pw WHERE i = least(r.r_total, 10))
        |    ELSE 0.0 END, 6) AS ndcg_at_k,
        |  round(a.n_rel / 10.0, 6) AS p_at_k
        |FROM agg a JOIN rtot r ON r.query_id = a.query_id""".stripMargin,

    // IVF-flat replay: centroids = 8 lowest-id vectors; assignment and
    // probing rank by the identical cosine expression (left-to-right
    // list_dot_product), ties to the lowest cluster id — bit-for-bit
    // the argmax graft computes map-side with greatest(struct(...)).
    "q_sim_ivf_flat" ->
      """WITH c AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |cent AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS cluster, v AS cv
        |         FROM (SELECT vec_id, v FROM c ORDER BY vec_id LIMIT 8)),
        |asg AS (SELECT vec_id, cluster FROM (
        |    SELECT c.vec_id, cent.cluster,
        |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
        |        list_dot_product(v, cv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) DESC,
        |        cluster) AS arn
        |    FROM c CROSS JOIN cent) t WHERE arn = 1),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 5),
        |probes AS (SELECT query_id, qv, cluster FROM (
        |    SELECT query_id, qv, cent.cluster,
        |      row_number() OVER (PARTITION BY query_id ORDER BY
        |        list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) DESC,
        |        cluster) AS prn
        |    FROM q CROSS JOIN cent) t WHERE prn <= 2),
        |scored AS (SELECT query_id, c.vec_id AS nn_id,
        |    round(list_dot_product(qv, v)
        |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) AS cos_sim
        |  FROM c JOIN asg ON c.vec_id = asg.vec_id
        |  JOIN probes ON asg.cluster = probes.cluster
        |  WHERE c.vec_id != query_id)
        |SELECT query_id, nn_id, cos_sim, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY cos_sim DESC, nn_id) AS rn
        |  FROM scored) t WHERE rn <= 10""".stripMargin,

    // Product quantization replay: codebook = subvector slices of the
    // 16 lowest-id vectors (8 subspaces × 8 dims); encode = per
    // subspace argmax of ip(x_j, c) − ½‖c‖² (≡ argmin L2, ties to the
    // lowest code) — the same greatest-struct argmax graft computes
    // map-side.
    "q_embed_pq_codes" ->
      """WITH c AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |seed AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS code, v
        |         FROM (SELECT vec_id, v FROM c ORDER BY vec_id LIMIT 16) s),
        |subs AS (SELECT CAST(unnest(range(0, 8)) AS INTEGER) AS j),
        |cb AS (SELECT j, code, list_slice(v, j*8 + 1, j*8 + 8) AS cent
        |       FROM seed CROSS JOIN subs),
        |enc AS (SELECT vec_id, j, code FROM (
        |    SELECT c.vec_id, cb.j, cb.code,
        |      row_number() OVER (PARTITION BY c.vec_id, cb.j
        |        ORDER BY list_dot_product(list_slice(c.v, cb.j*8 + 1, cb.j*8 + 8), cb.cent)
        |                 - 0.5 * list_dot_product(cb.cent, cb.cent) DESC, cb.code) AS rn
        |    FROM c CROSS JOIN cb) t WHERE rn = 1)
        |SELECT vec_id,
        |  CAST(MIN(CASE WHEN j = 0 THEN code END) AS INTEGER) AS c0,
        |  CAST(MIN(CASE WHEN j = 1 THEN code END) AS INTEGER) AS c1,
        |  CAST(MIN(CASE WHEN j = 2 THEN code END) AS INTEGER) AS c2,
        |  CAST(MIN(CASE WHEN j = 3 THEN code END) AS INTEGER) AS c3,
        |  CAST(MIN(CASE WHEN j = 4 THEN code END) AS INTEGER) AS c4,
        |  CAST(MIN(CASE WHEN j = 5 THEN code END) AS INTEGER) AS c5,
        |  CAST(MIN(CASE WHEN j = 6 THEN code END) AS INTEGER) AS c6,
        |  CAST(MIN(CASE WHEN j = 7 THEN code END) AS INTEGER) AS c7
        |FROM enc GROUP BY vec_id""".stripMargin,

    // ADC search: every subspace inner-product term is rounded to
    // integer micro-units BEFORE the sum, so the approximate score is
    // an exact BIGINT both engines agree on — no float tolerance in
    // the ranking.
    "q_sim_pq_topk" ->
      """WITH c AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |seed AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS code, v
        |         FROM (SELECT vec_id, v FROM c ORDER BY vec_id LIMIT 16) s),
        |subs AS (SELECT CAST(unnest(range(0, 8)) AS INTEGER) AS j),
        |cb AS (SELECT j, code, list_slice(v, j*8 + 1, j*8 + 8) AS cent
        |       FROM seed CROSS JOIN subs),
        |enc AS (SELECT vec_id, j, code FROM (
        |    SELECT c.vec_id, cb.j, cb.code,
        |      row_number() OVER (PARTITION BY c.vec_id, cb.j
        |        ORDER BY list_dot_product(list_slice(c.v, cb.j*8 + 1, cb.j*8 + 8), cb.cent)
        |                 - 0.5 * list_dot_product(cb.cent, cb.cent) DESC, cb.code) AS rn
        |    FROM c CROSS JOIN cb) t WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 5),
        |sc AS (SELECT q.query_id, e.vec_id AS nn_id,
        |         CAST(SUM(CAST(ROUND(list_dot_product(
        |             list_slice(q.qv, e.j*8 + 1, e.j*8 + 8), cb.cent) * 1e6, 0) AS BIGINT)) AS BIGINT) AS ip_micro
        |       FROM q CROSS JOIN enc e JOIN cb ON cb.j = e.j AND cb.code = e.code
        |       WHERE e.vec_id != q.query_id
        |       GROUP BY 1, 2)
        |SELECT query_id, nn_id, ip_micro, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY ip_micro DESC, nn_id) AS rn
        |  FROM sc) t WHERE rn <= 10""".stripMargin,

    // Full replay of the Lloyd k-means IVF build (2 iterations,
    // nClusters=8, nprobe=2): seeds are the 8 lowest-id normalized
    // vectors; assignment ranks by plain dot against the current
    // centroids (ties to the lowest cluster id); the update step sums
    // each component in integer micro-units — CAST(ROUND(x*1e6) AS
    // BIGINT) — so the mean is summation-order-independent and both
    // engines land on bit-identical centroids. Positions are 1-based
    // here vs 0-based in Spark; only their ORDER matters (components
    // are reassembled in pos order on both sides).
    "q_sim_ivf_topk" ->
      (ivfReplayCtes + """
        |SELECT query_id, nn_id, cos_sim, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY cos_sim DESC, nn_id) AS rn
        |  FROM scored) t WHERE rn <= 10""".stripMargin),

    // the on-disk IVF index (q_ivf_indexed) probes with the SAME
    // kmeans parameters as the in-memory path, and pruning never
    // changes answers (IOSpec proves pruned ≡ unpruned) — so the
    // replay is identical to q_sim_ivf_topk's
    "q_ivf_indexed" ->
      (ivfReplayCtes + """
        |SELECT query_id, nn_id, cos_sim, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY cos_sim DESC, nn_id) AS rn
        |  FROM scored) t WHERE rn <= 10""".stripMargin),

    // minhash band index replay: history (%4 != 0) and batch (%4 == 0)
    // signatures from the shared md5-60 chain, candidates via banded
    // equality, scored by signature-agreement count (the minhash
    // Jaccard estimate), best match per batch doc by (cnt desc, id),
    // history beating batch — mirrors MinHashBandIndex.probe
    "q_dedup_near_indexed" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |long_docs AS (SELECT * FROM t WHERE len(toks) >= 3),
        |grams AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
        |          FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS i FROM long_docs) x),
        |h AS (SELECT doc_id, s,
        |        CAST(concat('0x', substr(md5(CAST(s // 2 AS VARCHAR) || '|' || gram), 1 + 15 * (s % 2), 15)) AS BIGINT) AS hv
        |      FROM grams CROSS JOIN (SELECT unnest(range(0, 8)) AS s) seeds),
        |sig AS (SELECT doc_id,
        |  MIN(CASE WHEN s = 0 THEN hv END) AS m0, MIN(CASE WHEN s = 1 THEN hv END) AS m1,
        |  MIN(CASE WHEN s = 2 THEN hv END) AS m2, MIN(CASE WHEN s = 3 THEN hv END) AS m3,
        |  MIN(CASE WHEN s = 4 THEN hv END) AS m4, MIN(CASE WHEN s = 5 THEN hv END) AS m5,
        |  MIN(CASE WHEN s = 6 THEN hv END) AS m6, MIN(CASE WHEN s = 7 THEN hv END) AS m7
        |FROM h GROUP BY doc_id),
        |hist AS (SELECT * FROM sig WHERE doc_id % 4 <> 0),
        |batch AS (SELECT * FROM sig WHERE doc_id % 4 = 0),
        |hb AS (
        |  SELECT doc_id, 0 AS band, m0 AS k0, m1 AS k1 FROM hist UNION ALL
        |  SELECT doc_id, 1, m2, m3 FROM hist UNION ALL
        |  SELECT doc_id, 2, m4, m5 FROM hist UNION ALL
        |  SELECT doc_id, 3, m6, m7 FROM hist),
        |bb AS (
        |  SELECT doc_id, 0 AS band, m0 AS k0, m1 AS k1 FROM batch UNION ALL
        |  SELECT doc_id, 1, m2, m3 FROM batch UNION ALL
        |  SELECT doc_id, 2, m4, m5 FROM batch UNION ALL
        |  SELECT doc_id, 3, m6, m7 FROM batch),
        |candh AS (SELECT DISTINCT b.doc_id AS id, h.doc_id AS hist_id
        |          FROM bb b JOIN hb h
        |            ON b.band = h.band AND b.k0 = h.k0 AND b.k1 = h.k1),
        |cnth AS (SELECT c.id, c.hist_id,
        |    (CASE WHEN x.m0 = y.m0 THEN 1 ELSE 0 END + CASE WHEN x.m1 = y.m1 THEN 1 ELSE 0 END
        |   + CASE WHEN x.m2 = y.m2 THEN 1 ELSE 0 END + CASE WHEN x.m3 = y.m3 THEN 1 ELSE 0 END
        |   + CASE WHEN x.m4 = y.m4 THEN 1 ELSE 0 END + CASE WHEN x.m5 = y.m5 THEN 1 ELSE 0 END
        |   + CASE WHEN x.m6 = y.m6 THEN 1 ELSE 0 END + CASE WHEN x.m7 = y.m7 THEN 1 ELSE 0 END) AS cnt
        |  FROM candh c JOIN batch x ON x.doc_id = c.id
        |  JOIN hist y ON y.doc_id = c.hist_id),
        |histbest AS (SELECT id, hist_id, cnt FROM (SELECT id, hist_id, cnt,
        |    row_number() OVER (PARTITION BY id ORDER BY cnt DESC, hist_id) AS rn
        |  FROM cnth WHERE cnt >= 3) u WHERE rn = 1),
        |candb AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |          FROM bb a JOIN bb b
        |            ON a.band = b.band AND a.k0 = b.k0 AND a.k1 = b.k1
        |           AND a.doc_id < b.doc_id),
        |cntb AS (SELECT c.a_id, c.b_id,
        |    (CASE WHEN x.m0 = y.m0 THEN 1 ELSE 0 END + CASE WHEN x.m1 = y.m1 THEN 1 ELSE 0 END
        |   + CASE WHEN x.m2 = y.m2 THEN 1 ELSE 0 END + CASE WHEN x.m3 = y.m3 THEN 1 ELSE 0 END
        |   + CASE WHEN x.m4 = y.m4 THEN 1 ELSE 0 END + CASE WHEN x.m5 = y.m5 THEN 1 ELSE 0 END
        |   + CASE WHEN x.m6 = y.m6 THEN 1 ELSE 0 END + CASE WHEN x.m7 = y.m7 THEN 1 ELSE 0 END) AS cnt
        |  FROM candb c JOIN batch x ON x.doc_id = c.a_id
        |  JOIN batch y ON y.doc_id = c.b_id),
        |batchbest AS (SELECT b_id AS id, a_id, cnt FROM (SELECT b_id, a_id, cnt,
        |    row_number() OVER (PARTITION BY b_id ORDER BY cnt DESC, a_id) AS rn
        |  FROM cntb WHERE cnt >= 3) u WHERE rn = 1)
        |SELECT b.doc_id,
        |  CASE WHEN hx.id IS NOT NULL THEN 'dup_history'
        |       WHEN bx.id IS NOT NULL THEN 'dup_batch'
        |       ELSE 'kept' END AS status,
        |  CASE WHEN hx.id IS NOT NULL THEN hx.hist_id ELSE bx.a_id END AS dup_of,
        |  CAST(CASE WHEN hx.id IS NOT NULL THEN hx.cnt ELSE bx.cnt END AS INTEGER) AS n_matches
        |FROM batch b LEFT JOIN histbest hx ON hx.id = b.doc_id
        |LEFT JOIN batchbest bx ON bx.id = b.doc_id""".stripMargin,

    // IVF append replay: the coarse quantizer is trained on the
    // resident 2/3 only (same seeded 2-iteration Lloyd chain), the
    // appended third is assigned against the FROZEN final centroids
    // (argmax dot on the normalized vector, ties to the lowest
    // cluster — exactly IvfIndex.appendVectors), and the probe serves
    // the union. A hash match proves append-then-probe ≡
    // assign-at-rebuild for the same centroids.
    "q_ivf_append" ->
      (ivfAppendCtes + """,
        |q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 5),
        |probes AS (SELECT query_id, qv, cluster FROM (
        |    SELECT q.query_id, q.qv, cent2.cluster,
        |      row_number() OVER (PARTITION BY q.query_id
        |        ORDER BY list_dot_product(q.qv, cent2.cv)
        |          / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(cent2.cv, cent2.cv))) DESC,
        |        cent2.cluster) AS prn
        |    FROM q CROSS JOIN cent2) t WHERE prn <= 2),
        |scored AS (SELECT query_id, c.vec_id AS nn_id,
        |    round(list_dot_product(qv, v)
        |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) AS cos_sim
        |  FROM c JOIN fullasg ON c.vec_id = fullasg.id
        |  JOIN probes ON fullasg.cluster = probes.cluster
        |  WHERE c.vec_id != query_id)
        |SELECT query_id, nn_id, cos_sim, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY cos_sim DESC, nn_id) AS rn
        |  FROM scored) t WHERE rn <= 10""".stripMargin),

    // staleness monitor over the SAME built+appended index as
    // q_ivf_append: per cluster, cosine (micro-exact long sums) of
    // the frozen cent2 centroid against the mean of ALL resident
    // members (asg2 residents + frozen-assigned appends); flag below
    // the shared threshold (ExtQueries.ivfDriftThresholdMicro)
    "q_ivf_drift" ->
      (ivfAppendCtes + s""",
        |mm AS (SELECT f.cluster, d.pos, COUNT(*) AS n,
        |    CAST(ROUND(CAST(SUM(CAST(ROUND(n.nv[d.pos] * 1e6, 0) AS BIGINT)) AS DOUBLE)
        |      / COUNT(*), 0) AS BIGINT) AS m
        |  FROM fullasg f JOIN nrm n ON n.id = f.id CROSS JOIN dims d
        |  GROUP BY f.cluster, d.pos),
        |gg AS (SELECT cluster, d.pos,
        |    CAST(ROUND(cv[d.pos] * 1e6, 0) AS BIGINT) AS g
        |  FROM cent2 CROSS JOIN dims d),
        |sums AS (SELECT mm.cluster, MAX(mm.n) AS n_vecs,
        |    SUM(mm.m * gg.g) AS dotmg, SUM(mm.m * mm.m) AS nm2,
        |    SUM(gg.g * gg.g) AS ng2
        |  FROM mm JOIN gg ON mm.cluster = gg.cluster AND mm.pos = gg.pos
        |  GROUP BY mm.cluster),
        |rep AS (SELECT cluster, n_vecs,
        |    CAST(ROUND(CASE WHEN nm2 > 0 AND ng2 > 0
        |      THEN CAST(dotmg AS DOUBLE)
        |        / (sqrt(CAST(nm2 AS DOUBLE)) * sqrt(CAST(ng2 AS DOUBLE))) * 1e6
        |      ELSE 0.0 END, 0) AS BIGINT) AS cos_micro
        |  FROM sums)
        |SELECT cluster, n_vecs, cos_micro,
        |  cos_micro < ${graft.ext.ExtQueries.ivfDriftThresholdMicro} AS recluster
        |FROM rep""".stripMargin),

    // recall@10 of the IVF path vs exact brute force: both replays
    // are deterministic, so the measured recall is itself an oracle
    // contract (per query: hits of the exact top-10 found by IVF)
    "q_ann_recall" ->
      (ivfReplayCtes + """,
        |ivf AS (SELECT query_id, nn_id FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_sim DESC, nn_id) AS rn FROM scored) t
        |  WHERE rn <= 10),
        |exsc AS (SELECT query_id, c.vec_id AS nn_id,
        |    round(list_dot_product(qv, v)
        |      / (sqrt(list_dot_product(qv, qv))
        |         * sqrt(list_dot_product(v, v))), 6) AS cos_sim
        |  FROM c CROSS JOIN q WHERE c.vec_id != query_id),
        |ex AS (SELECT query_id, nn_id FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_sim DESC, nn_id) AS rn FROM exsc) t
        |  WHERE rn <= 10),
        |hit AS (SELECT e.query_id, CAST(count(i.nn_id) AS BIGINT) AS n_hits
        |  FROM ex e LEFT JOIN ivf i
        |    ON i.query_id = e.query_id AND i.nn_id = e.nn_id
        |  GROUP BY 1)
        |SELECT query_id, n_hits, n_hits * 100000 AS recall_micro
        |FROM hit""".stripMargin),


    // Every modality carries a REAL container the oracle predicts:
    // PNG (stored-deflate: closed byte length h*(1+3w)+68) decoded by
    // javax.imageio; WAV (canonical 44-byte header: 44+2n) parsed by
    // javax.sound.sampled; AVI (RIFF: 224 + frames*(8+stride*h),
    // stride = 3w padded to 4) parsed by the RIFF chunk walk. The
    // checksums are content-addressed from the DECODED values
    // ('img|w|h|r|g|b', 'wav|rate|frames|amp', 'avi|w|h|n|r|g|b'),
    // so no md5-over-binary is ever needed — a codec bug on either
    // side breaks the hash match.
    // image near-dup: recompute every 9x8 block mosaic from the
    // md5-60 generator formulas (no decoding needed -- cells == 8x8
    // uniform blocks), assemble the dHash as two 32-bit halves, and
    // brute-force Hamming <= 3 over all pairs (the oracle may
    // all-pairs; the engine must band)
    "q_image_near_dup" ->
      s"""WITH $dhashReplayCtes,
        |pairs AS (SELECT a.id AS id_a, b.id AS id_b,
        |    CAST(bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2))
        |      AS INTEGER) AS hamming
        |  FROM halves a JOIN halves b ON a.id < b.id)
        |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3""".stripMargin,

    // indexed image dedup: same mosaic-formula hashes; batch ids
    // (%4 == 0) classified against history by (hamming, id) argmin,
    // history beating the pairwise smaller-id batch rule
    "q_image_dedup_indexed" ->
      s"""WITH $dhashReplayCtes,
        |hist AS (SELECT * FROM halves WHERE id % 4 <> 0),
        |batch AS (SELECT * FROM halves WHERE id % 4 = 0),
        |hm AS (SELECT * FROM (SELECT b.id, h.id AS hist_id,
        |    CAST(bit_count(xor(b.h1, h.h1)) + bit_count(xor(b.h2, h.h2))
        |      AS INTEGER) AS d
        |  FROM batch b, hist h) WHERE d <= 3),
        |histbest AS (SELECT id, hist_id, d FROM (SELECT id, hist_id, d,
        |    row_number() OVER (PARTITION BY id ORDER BY d, hist_id) AS rn
        |  FROM hm) WHERE rn = 1),
        |bm AS (SELECT * FROM (SELECT b.id, a.id AS a_id,
        |    CAST(bit_count(xor(b.h1, a.h1)) + bit_count(xor(b.h2, a.h2))
        |      AS INTEGER) AS d
        |  FROM batch b JOIN batch a ON a.id < b.id) WHERE d <= 3),
        |batchbest AS (SELECT id, a_id, d FROM (SELECT id, a_id, d,
        |    row_number() OVER (PARTITION BY id ORDER BY d, a_id) AS rn
        |  FROM bm) WHERE rn = 1)
        |SELECT b.id AS media_id,
        |  CASE WHEN hb.id IS NOT NULL THEN 'dup_history'
        |       WHEN bb.id IS NOT NULL THEN 'dup_batch'
        |       ELSE 'kept' END AS status,
        |  CASE WHEN hb.id IS NOT NULL THEN hb.hist_id ELSE bb.a_id END
        |    AS dup_of,
        |  CASE WHEN hb.id IS NOT NULL THEN hb.d ELSE bb.d END AS hamming
        |FROM batch b LEFT JOIN histbest hb ON hb.id = b.id
        |LEFT JOIN batchbest bb ON bb.id = b.id""".stripMargin,

    "q_multimodal_meta" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |    CAST(doc_id % 3 AS INTEGER) AS k3,
        |    CAST(16 + doc_id % 48 AS INTEGER) AS iw,
        |    CAST(16 + (doc_id // 3) % 48 AS INTEGER) AS ih,
        |    CAST(8000 + (doc_id % 8) * 1000 AS INTEGER) AS rate,
        |    CAST(32 + (doc_id // 3) % 64 AS INTEGER) AS ns,
        |    CAST((doc_id % 100) * 100 AS INTEGER) AS amp,
        |    CAST(16 + doc_id % 24 AS INTEGER) AS vw,
        |    CAST(16 + (doc_id // 3) % 24 AS INTEGER) AS vh,
        |    CAST(1 + doc_id % 6 AS INTEGER) AS vn
        |  FROM documents)
        |SELECT media_id,
        |  CASE k3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(CASE WHEN k3 = 0 THEN ih * (1 + 3 * iw) + 68
        |            WHEN k3 = 1 THEN 44 + 2 * ns
        |            ELSE 224 + vn * (8 + ((3 * vw + 3) // 4) * 4 * vh)
        |       END AS INTEGER) AS byte_len,
        |  CAST(CASE WHEN k3 = 0 THEN iw
        |            WHEN k3 = 1 THEN rate // 1000
        |            ELSE vw END AS INTEGER) AS width,
        |  CAST(CASE WHEN k3 = 0 THEN ih
        |            WHEN k3 = 1 THEN 16
        |            ELSE vh END AS INTEGER) AS height,
        |  CAST(CASE WHEN k3 = 0 THEN 1
        |            WHEN k3 = 1 THEN 1 + ns % 8
        |            ELSE vn END AS INTEGER) AS n_frames,
        |  CASE WHEN k3 = 0 THEN CAST(concat('0x', substr(md5(
        |         'img|' || CAST(iw AS VARCHAR) || '|' || CAST(ih AS VARCHAR)
        |         || '|' || CAST(media_id % 256 AS VARCHAR)
        |         || '|' || CAST((media_id // 256) % 256 AS VARCHAR)
        |         || '|' || CAST((media_id // 65536) % 256 AS VARCHAR)), 1, 15)) AS BIGINT)
        |       WHEN k3 = 1 THEN CAST(concat('0x', substr(md5(
        |         'wav|' || CAST(rate AS VARCHAR) || '|' || CAST(ns AS VARCHAR)
        |         || '|' || CAST(amp AS VARCHAR)), 1, 15)) AS BIGINT)
        |       ELSE CAST(concat('0x', substr(md5(
        |         'avi|' || CAST(vw AS VARCHAR) || '|' || CAST(vh AS VARCHAR)
        |         || '|' || CAST(vn AS VARCHAR)
        |         || '|' || CAST(media_id % 256 AS VARCHAR)
        |         || '|' || CAST((media_id // 256) % 256 AS VARCHAR)
        |         || '|' || CAST((media_id // 65536) % 256 AS VARCHAR)), 1, 15)) AS BIGINT)
        |  END AS checksum
        |FROM m""".stripMargin,

    "q_multimodal_frames" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |    CAST(doc_id % 3 AS INTEGER) AS k3,
        |    CAST(16 + doc_id % 48 AS INTEGER) AS iw,
        |    CAST(16 + (doc_id // 3) % 48 AS INTEGER) AS ih,
        |    CAST(8000 + (doc_id % 8) * 1000 AS INTEGER) AS rate,
        |    CAST(32 + (doc_id // 3) % 64 AS INTEGER) AS ns,
        |    CAST((doc_id % 100) * 100 AS INTEGER) AS amp,
        |    CAST(16 + doc_id % 24 AS INTEGER) AS vw,
        |    CAST(16 + (doc_id // 3) % 24 AS INTEGER) AS vh,
        |    CAST(1 + doc_id % 6 AS INTEGER) AS vn
        |  FROM documents),
        |feat AS (SELECT media_id,
        |    CAST(CASE WHEN k3 = 0 THEN 1
        |              WHEN k3 = 1 THEN 1 + ns % 8
        |              ELSE vn END AS INTEGER) AS n_frames,
        |    CASE WHEN k3 = 0 THEN CAST(concat('0x', substr(md5(
        |           'img|' || CAST(iw AS VARCHAR) || '|' || CAST(ih AS VARCHAR)
        |           || '|' || CAST(media_id % 256 AS VARCHAR)
        |           || '|' || CAST((media_id // 256) % 256 AS VARCHAR)
        |           || '|' || CAST((media_id // 65536) % 256 AS VARCHAR)), 1, 15)) AS BIGINT)
        |         WHEN k3 = 1 THEN CAST(concat('0x', substr(md5(
        |           'wav|' || CAST(rate AS VARCHAR) || '|' || CAST(ns AS VARCHAR)
        |           || '|' || CAST(amp AS VARCHAR)), 1, 15)) AS BIGINT)
        |         ELSE CAST(concat('0x', substr(md5(
        |           'avi|' || CAST(vw AS VARCHAR) || '|' || CAST(vh AS VARCHAR)
        |           || '|' || CAST(vn AS VARCHAR)
        |           || '|' || CAST(media_id % 256 AS VARCHAR)
        |           || '|' || CAST((media_id // 256) % 256 AS VARCHAR)
        |           || '|' || CAST((media_id // 65536) % 256 AS VARCHAR)), 1, 15)) AS BIGINT)
        |    END AS checksum
        |  FROM m),
        |f AS (SELECT media_id, checksum,
        |    unnest(range(0, n_frames, 2)) AS i
        |  FROM feat)
        |SELECT media_id, CAST(i AS INTEGER) AS frame_idx,
        |  xor(checksum, CAST(concat('0x', substr(md5('f|' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT)) AS frame_hash
        |FROM f""".stripMargin,

    "q_sim_near_dup" ->
      """WITH s AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |pc AS (SELECT j, i,
        |         2 * (CAST(concat('0x', substr(md5(CAST(j AS VARCHAR) || '|' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT)
        |              / pow(2, 60)) - 1 AS c
        |       FROM (SELECT unnest(range(0, 16)) AS j) a
        |       CROSS JOIN (SELECT unnest(range(0, 64)) AS i) b),
        |planes AS (SELECT j, list(c ORDER BY i) AS plane FROM pc GROUP BY j),
        |bits AS (SELECT id, j,
        |           CASE WHEN list_dot_product(v, plane) >= 0 THEN 1 ELSE 0 END AS bit
        |         FROM s CROSS JOIN planes),
        |bk AS (SELECT id, j // 4 AS band, SUM(bit * (1 << (j % 4))) AS k
        |       FROM bits GROUP BY id, j // 4),
        |cand AS (SELECT DISTINCT a.id AS a_id, b.id AS b_id
        |         FROM bk a JOIN bk b ON a.band = b.band AND a.k = b.k AND a.id < b.id)
        |SELECT a_id, b_id, cos_sim FROM (
        |  SELECT a_id, b_id,
        |    round(list_dot_product(va.v, vb.v)
        |      / (sqrt(list_dot_product(va.v, va.v)) * sqrt(list_dot_product(vb.v, vb.v))), 6) AS cos_sim
        |  FROM cand JOIN s va ON va.id = a_id JOIN s vb ON vb.id = b_id) t
        |WHERE cos_sim >= 0.35""".stripMargin,

    // the q_sim_near_dup pipeline + a recursive label-propagation CTE:
    // the oracle replays LSH banding, exact-cosine verify, AND the
    // transitive clustering the Spark side runs as HashMin rounds
    "q_sim_clusters" ->
      """WITH RECURSIVE s AS (
        |  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |pc AS (SELECT j, i,
        |         2 * (CAST(concat('0x', substr(md5(CAST(j AS VARCHAR) || '|' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT)
        |              / pow(2, 60)) - 1 AS c
        |       FROM (SELECT unnest(range(0, 16)) AS j) a
        |       CROSS JOIN (SELECT unnest(range(0, 64)) AS i) b),
        |planes AS (SELECT j, list(c ORDER BY i) AS plane FROM pc GROUP BY j),
        |bits AS (SELECT id, j,
        |           CASE WHEN list_dot_product(v, plane) >= 0 THEN 1 ELSE 0 END AS bit
        |         FROM s CROSS JOIN planes),
        |bk AS (SELECT id, j // 4 AS band, SUM(bit * (1 << (j % 4))) AS k
        |       FROM bits GROUP BY id, j // 4),
        |cand AS (SELECT DISTINCT a.id AS a_id, b.id AS b_id
        |         FROM bk a JOIN bk b ON a.band = b.band AND a.k = b.k AND a.id < b.id),
        |pairs AS (
        |  SELECT a_id, b_id FROM (
        |    SELECT a_id, b_id,
        |      round(list_dot_product(va.v, vb.v)
        |        / (sqrt(list_dot_product(va.v, va.v)) * sqrt(list_dot_product(vb.v, vb.v))), 6) AS cos_sim
        |    FROM cand JOIN s va ON va.id = a_id JOIN s vb ON vb.id = b_id) t
        |  WHERE cos_sim >= 0.35),
        |edges AS (SELECT a_id AS s, b_id AS d FROM pairs
        |          UNION SELECT b_id, a_id FROM pairs),
        |reach(node, label) AS (
        |  SELECT DISTINCT s, s FROM edges
        |  UNION
        |  SELECT e.s, r.label FROM reach r JOIN edges e ON e.d = r.node)
        |SELECT node, MIN(label) AS component FROM reach GROUP BY node""".stripMargin,

    // concat-and-chunk packing: per-shard running token sum replayed
    // with the same portable md5 shard and BPE-ish token count; the
    // windowed SUM is cast to BIGINT (DuckDB widens to HUGEINT)
    "q_pack_chunks" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(CAST(concat('0x', substr(md5('pack|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8 AS INTEGER) AS shard,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_tok
        |  FROM documents),
        |packed AS (
        |  SELECT doc_id, shard, n_tok,
        |    CAST(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS tok_end
        |  FROM base WHERE n_tok > 0)
        |SELECT doc_id, shard, n_tok, tok_end,
        |  tok_end - n_tok AS tok_start,
        |  CAST(floor(CAST(tok_end - n_tok AS DOUBLE) / 512) AS BIGINT) AS first_chunk,
        |  CAST(floor(CAST(tok_end - 1 AS DOUBLE) / 512) AS BIGINT) AS last_chunk,
        |  (tok_end - n_tok) % 512 AS chunk_offset
        |FROM packed""".stripMargin,

    // Morton dilation replayed as the same 4-round shift/mask cascade
    "q_zorder_key" ->
      """WITH base AS (
        |  SELECT l_orderkey, l_linenumber,
        |    l_partkey % 65536 AS x, l_orderkey % 65536 AS y
        |  FROM lineitem WHERE l_partkey % 20 = 0),
        |r1 AS (SELECT l_orderkey, l_linenumber,
        |    (x | (x << 8)) & 16711935 AS x, (y | (y << 8)) & 16711935 AS y FROM base),
        |r2 AS (SELECT l_orderkey, l_linenumber,
        |    (x | (x << 4)) & 252645135 AS x, (y | (y << 4)) & 252645135 AS y FROM r1),
        |r3 AS (SELECT l_orderkey, l_linenumber,
        |    (x | (x << 2)) & 858993459 AS x, (y | (y << 2)) & 858993459 AS y FROM r2),
        |r4 AS (SELECT l_orderkey, l_linenumber,
        |    (x | (x << 1)) & 1431655765 AS x, (y | (y << 1)) & 1431655765 AS y FROM r3)
        |SELECT l_orderkey, l_linenumber, x | (y << 1) AS zv FROM r4""".stripMargin,

    // cross-doc boilerplate: lines (planted banners + near-dup-chain
    // repeats) in >= 3 distinct docs struck everywhere, rebuild by pos
    "q_line_dedup" ->
      """WITH t AS (SELECT doc_id, text FROM documents),
        |pl AS (SELECT doc_id, concat_ws(chr(10),
        |    CASE WHEN doc_id % 3 = 0 THEN 'subscribe to our newsletter' END,
        |    regexp_replace(text, '((?:\S+ ){9}\S+) ', '\1' || chr(10), 'g'),
        |    CASE WHEN doc_id % 4 = 0 THEN 'all rights reserved' END) AS text FROM t),
        |lines AS (SELECT doc_id, CAST(i AS INTEGER) AS pos, sl[CAST(i+1 AS INTEGER)] AS line
        |  FROM (SELECT doc_id, sl, unnest(range(0, len(sl))) AS i
        |        FROM (SELECT doc_id, string_split(text, chr(10)) AS sl FROM pl) s0) s1),
        |fp AS (SELECT doc_id, pos, line, md5(trim(line)) AS f FROM lines),
        |boiler AS (SELECT f FROM fp GROUP BY f HAVING count(DISTINCT doc_id) >= 3),
        |kept AS (SELECT * FROM fp WHERE f NOT IN (SELECT f FROM boiler)),
        |agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
        |        count(*) AS n_kept FROM kept GROUP BY doc_id),
        |tot AS (SELECT doc_id, count(*) AS n_lines FROM fp GROUP BY doc_id)
        |SELECT t.doc_id, COALESCE(a.text, '') AS text,
        |  CAST(tot.n_lines AS INTEGER) AS n_lines,
        |  CAST(tot.n_lines - COALESCE(a.n_kept, 0) AS INTEGER) AS n_removed
        |FROM t JOIN tot ON t.doc_id = tot.doc_id
        |LEFT JOIN agg a ON t.doc_id = a.doc_id""".stripMargin,

    // char-level Shannon entropy, per-term micro rounding before the
    // long sum (ln is empirically bit-identical between engines here)
    "q_char_entropy" ->
      """WITH t AS (SELECT doc_id, text FROM documents WHERE length(text) > 0),
        |c AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM t),
        |h AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS cnt FROM c GROUP BY doc_id, ch),
        |n AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n, CAST(count(*) AS INTEGER) AS n_distinct_chars FROM h GROUP BY doc_id),
        |e AS (SELECT h.doc_id,
        |        CAST(sum(CAST(round(1000000.0 * cnt * ln(CAST(n AS DOUBLE) / cnt)) AS BIGINT)) AS BIGINT) AS s
        |      FROM h JOIN n ON h.doc_id = n.doc_id GROUP BY h.doc_id)
        |SELECT n.doc_id, CAST(n.n AS INTEGER) AS n_chars, n.n_distinct_chars,
        |  CAST(e.s // n.n AS BIGINT) AS entropy_micro
        |FROM n JOIN e ON n.doc_id = e.doc_id""".stripMargin,

    // classifier-apply: hashed-bigram mean micro-weight under the
    // wrapper's Knuth-hash pseudo-model; 60-bit md5 hash contract
    "q_quality_classify" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |g AS (SELECT doc_id, concat(toks[CAST(i AS INTEGER)], ' ', toks[CAST(i+1 AS INTEGER)]) AS gram
        |      FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM t) x),
        |h AS (SELECT doc_id, CAST(concat('0x', substr(md5(gram),1,15)) AS BIGINT) % 65536 AS bucket FROM g),
        |w AS (SELECT doc_id, (bucket * 2654435761) % 2000001 - 1000000 AS wm FROM h),
        |s AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_grams, CAST(sum(wm) AS BIGINT) AS sw
        |      FROM w GROUP BY doc_id)
        |SELECT t.doc_id, COALESCE(s.n_grams, 0) AS n_grams,
        |  CAST(COALESCE(sw // s.n_grams, 0) AS BIGINT) AS score_micro,
        |  COALESCE(sw // s.n_grams, 0) >= 0 AS keep
        |FROM t LEFT JOIN s ON t.doc_id = s.doc_id""".stripMargin,

    // C4 line rules: terminal punct + >=3 words + no lorem/brace;
    // keep_doc when >=3 lines survive; rebuild by pos
    "q_c4_clean" ->
      """WITH t AS (SELECT doc_id, text FROM documents),
        |rf AS (SELECT doc_id, regexp_replace(text, '((?:\S+ ){9}\S+) ', '\1' || chr(10), 'g') AS b FROM t),
        |pu AS (SELECT doc_id, CASE WHEN doc_id % 2 = 0
        |         THEN regexp_replace(b, chr(10), '.' || chr(10), 'g') || '.' ELSE b END AS b FROM rf),
        |pl AS (SELECT doc_id, concat_ws(chr(10),
        |    CASE WHEN doc_id % 5 = 0 THEN 'lorem ipsum dolor sit amet.' END,
        |    b,
        |    CASE WHEN doc_id % 7 = 0 THEN 'config { display none }' END) AS text FROM pu),
        |lines AS (SELECT doc_id, CAST(i AS INTEGER) AS pos, sl[CAST(i+1 AS INTEGER)] AS line
        |  FROM (SELECT doc_id, sl, unnest(range(0, len(sl))) AS i
        |        FROM (SELECT doc_id, string_split(text, chr(10)) AS sl FROM pl) s0) s1),
        |k AS (SELECT doc_id, pos, line,
        |    (regexp_matches(trim(line), '[.!?]["'']?$')
        |     AND len(regexp_split_to_array(trim(line), '\s+')) >= 3
        |     AND position('lorem ipsum' IN lower(line)) = 0
        |     AND position('{' IN line) = 0) AS keep
        |  FROM lines),
        |agg AS (SELECT doc_id,
        |        string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY pos) AS text,
        |        count(*) AS n_lines,
        |        CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS INTEGER) AS n_kept
        |        FROM k GROUP BY doc_id)
        |SELECT doc_id, COALESCE(text, '') AS text,
        |  CAST(n_lines AS INTEGER) AS n_lines, n_kept,
        |  n_kept >= 3 AS keep_doc FROM agg""".stripMargin,

    // global first occurrence by (doc_id, idx) = row_number() = 1,
    // identical to Spark's min-struct keeper
    "q_dedup_passage" ->
      s"""WITH planted AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |         THEN 'copyright notice all rights reserved do not reproduce this content '
        |         ELSE '' END
        |    || text
        |    || CASE WHEN doc_id % 4 = 0
        |            THEN ' subscribe to our newsletter for updates and follow us online'
        |            ELSE '' END AS text
        |  FROM documents),
        |t AS (SELECT doc_id, $toks AS toks FROM planted),
        |tt AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0),
        |p AS (SELECT doc_id, CAST(i AS INTEGER) AS idx,
        |        array_to_string(toks[i*10+1 : i*10+10], ' ') AS passage
        |      FROM tt, unnest(range(0, (len(toks) - 1) // 10 + 1)) AS u(i)),
        |k AS (SELECT doc_id, idx, passage,
        |        row_number() OVER (PARTITION BY md5(passage)
        |                           ORDER BY doc_id, idx) AS rn
        |      FROM p)
        |SELECT doc_id, count(*) AS n_passages,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  coalesce(string_agg(CASE WHEN rn = 1 THEN passage END, ' ' ORDER BY idx),
        |           '') AS clean_text
        |FROM k GROUP BY doc_id""".stripMargin,

    "q_dedup_incremental" ->
      """WITH fp AS (SELECT doc_id,
        |        md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
        |      FROM documents),
        |hist AS (SELECT * FROM fp WHERE doc_id % 5 != 4),
        |idx AS (SELECT fingerprint, min(doc_id) AS keeper_id FROM hist GROUP BY 1),
        |newb AS (SELECT doc_id, fingerprint FROM fp WHERE doc_id % 5 = 4
        |         UNION ALL
        |         SELECT doc_id + 1000000, fingerprint FROM hist WHERE doc_id % 7 = 0),
        |bm AS (SELECT fingerprint, min(doc_id) AS batch_keeper FROM newb GROUP BY 1)
        |SELECT n.doc_id, n.fingerprint,
        |  CASE WHEN i.keeper_id IS NOT NULL THEN 'dup_history'
        |       WHEN n.doc_id != b.batch_keeper THEN 'dup_batch'
        |       ELSE 'kept' END AS status,
        |  coalesce(i.keeper_id,
        |    CASE WHEN n.doc_id != b.batch_keeper THEN b.batch_keeper END) AS dup_of
        |FROM newb n JOIN bm b USING (fingerprint)
        |LEFT JOIN idx i USING (fingerprint)""".stripMargin,

    // full fit+classify replay: integer-micro components, truncating
    // centroid division, argmin with ties to the lowest label
    "q_centroid_classify" ->
      """WITH m AS (SELECT vec_id, CAST(label AS BIGINT) AS lbl,
        |        list_transform(embedding,
        |          x -> CAST(ROUND(CAST(x AS DOUBLE) * 1e6, 0) AS BIGINT)) AS mv
        |      FROM embeddings),
        |cells AS (SELECT vec_id, lbl, i AS pos, mv[i] AS v
        |          FROM m, unnest(range(1, len(mv) + 1)) AS u(i)),
        |cent AS (SELECT lbl, pos, CAST(sum(v) AS BIGINT) // count(*) AS c
        |         FROM cells WHERE vec_id % 5 != 0 GROUP BY lbl, pos),
        |d AS (SELECT te.vec_id, te.lbl, cent.lbl AS clbl,
        |        sum((te.v - cent.c) * (te.v - cent.c)) AS dist
        |      FROM (SELECT * FROM cells WHERE vec_id % 5 = 0) te
        |      JOIN cent ON te.pos = cent.pos
        |      GROUP BY 1, 2, 3),
        |pr AS (SELECT vec_id, lbl, clbl,
        |         row_number() OVER (PARTITION BY vec_id
        |                            ORDER BY dist, clbl) AS rn
        |       FROM d)
        |SELECT lbl AS label, clbl AS pred_label, count(*) AS n
        |FROM pr WHERE rn = 1 GROUP BY 1, 2""".stripMargin,

    // simplified silhouette: whole-table integer-micro centroids
    // (embed_outliers' fit), own vs nearest-rival distances, per-point
    // s micro-rounded pre-average
    "q_silhouette" ->
      """WITH m AS (SELECT vec_id, CAST(label AS BIGINT) AS lbl,
        |        list_transform(embedding,
        |          x -> CAST(ROUND(CAST(x AS DOUBLE) * 1e6, 0) AS BIGINT)) AS mv
        |      FROM embeddings),
        |cells AS (SELECT vec_id, lbl, i AS pos, mv[i] AS v
        |          FROM m, unnest(range(1, len(mv) + 1)) AS u(i)),
        |cent AS (SELECT lbl, pos, CAST(sum(v) AS BIGINT) // count(*) AS c
        |         FROM cells GROUP BY lbl, pos),
        |d AS (SELECT cells.vec_id, cells.lbl, cent.lbl AS clbl,
        |        CAST(sum((v - c) * (v - c)) AS BIGINT) AS dist
        |      FROM cells JOIN cent ON cells.pos = cent.pos
        |      GROUP BY 1, 2, 3),
        |ab AS (SELECT vec_id, lbl,
        |        max(CASE WHEN clbl = lbl THEN dist END) AS a2,
        |        min(CASE WHEN clbl <> lbl THEN dist END) AS b2
        |      FROM d GROUP BY 1, 2),
        |s AS (SELECT lbl,
        |        CASE WHEN greatest(sqrt(CAST(a2 AS DOUBLE)),
        |            sqrt(CAST(b2 AS DOUBLE))) <= 0.0 THEN 0
        |          ELSE CAST(round((sqrt(CAST(b2 AS DOUBLE))
        |            - sqrt(CAST(a2 AS DOUBLE)))
        |            / greatest(sqrt(CAST(a2 AS DOUBLE)),
        |              sqrt(CAST(b2 AS DOUBLE))) * 1e6, 0) AS BIGINT)
        |        END AS s_micro
        |      FROM ab)
        |SELECT lbl AS label, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(s_micro) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    / 1e6, 6) AS silhouette
        |FROM s GROUP BY 1""".stripMargin,

    // whole-table centroid fit + integer squared distance to the own-
    // label centroid, replayed exactly
    "q_embed_outliers" ->
      """WITH m AS (SELECT vec_id, CAST(label AS BIGINT) AS lbl,
        |        list_transform(embedding,
        |          x -> CAST(ROUND(CAST(x AS DOUBLE) * 1e6, 0) AS BIGINT)) AS mv
        |      FROM embeddings),
        |cells AS (SELECT vec_id, lbl, i AS pos, mv[i] AS v
        |          FROM m, unnest(range(1, len(mv) + 1)) AS u(i)),
        |cent AS (SELECT lbl, pos, CAST(sum(v) AS BIGINT) // count(*) AS c
        |         FROM cells GROUP BY lbl, pos)
        |SELECT cells.vec_id, cells.lbl AS label,
        |  CAST(sum((v - c) * (v - c)) AS BIGINT) AS dist_micro2,
        |  CAST(sum((v - c) * (v - c)) AS BIGINT) > 1000000000000 AS is_outlier
        |FROM cells JOIN cent ON cells.lbl = cent.lbl AND cells.pos = cent.pos
        |GROUP BY 1, 2""".stripMargin,

    "q_domain_cap" ->
      s"""WITH t AS (SELECT doc_id, source, text, $toks AS toks FROM documents),
        |s AS (SELECT doc_id, source,
        |  CAST(len(toks) AS INTEGER) AS n_tokens,
        |  CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS INTEGER) AS n_punct,
        |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','is','to','in','it','that'))) AS INTEGER) AS n_stopwords,
        |  length(text) AS tlen
        |FROM t),
        |q AS (SELECT doc_id, source,
        |  round(CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1) * 0.4
        |      + least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
        |      + (1.0 - CAST(n_punct AS DOUBLE) / greatest(tlen, 1)) * 0.2, 6) AS quality_score
        |FROM s)
        |SELECT doc_id, source, quality_score, CAST(rn AS INTEGER) AS rank_in_domain
        |FROM (SELECT *, row_number() OVER (PARTITION BY source
        |        ORDER BY quality_score DESC, doc_id) AS rn FROM q) r
        |WHERE rn <= 15""".stripMargin,

    // Threshold-filter cap replay (the zero-sort path): per-source
    // descending cumulative counts over DISTINCT 6dp-micro quality
    // values; threshold = largest value whose cum ≥ k (min value for
    // small sources); keep every doc at/above it — boundary ties stay.
    "q_domain_cap_approx" ->
      s"""WITH t AS (SELECT doc_id, source, text, $toks AS toks FROM documents),
        |s AS (SELECT doc_id, source,
        |  CAST(len(toks) AS INTEGER) AS n_tokens,
        |  CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS INTEGER) AS n_punct,
        |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','is','to','in','it','that'))) AS INTEGER) AS n_stopwords,
        |  length(text) AS tlen
        |FROM t),
        |q AS (SELECT doc_id, source,
        |  round(CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1) * 0.4
        |      + least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
        |      + (1.0 - CAST(n_punct AS DOUBLE) / greatest(tlen, 1)) * 0.2, 6) AS quality_score
        |FROM s),
        |q2 AS MATERIALIZED (SELECT doc_id, source, quality_score,
        |  CAST(round(quality_score * 1e6, 0) AS BIGINT) AS q_micro FROM q),
        |counts AS (SELECT source, q_micro, count(*) AS cnt FROM q2 GROUP BY 1, 2),
        |cdf AS (SELECT source, q_micro,
        |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY q_micro DESC) AS BIGINT) AS cum
        |  FROM counts),
        |thr AS (SELECT source,
        |    COALESCE(max(CASE WHEN cum >= 15 THEN q_micro END), min(q_micro)) AS thr_micro
        |  FROM cdf GROUP BY 1)
        |SELECT q2.doc_id, q2.source, q2.quality_score, thr.thr_micro
        |FROM q2 JOIN thr ON thr.source = q2.source
        |WHERE q2.q_micro >= thr.thr_micro""".stripMargin,

    // Σw in integer micro-units; the acceptance rate uses only
    // exactly-rounded IEEE *,/ so the row set replays exactly
    "q_weighted_sample" ->
      s"""WITH t AS (SELECT doc_id, text, $toks AS toks FROM documents),
        |s AS (SELECT doc_id,
        |  CAST(len(toks) AS INTEGER) AS n_tokens,
        |  CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS INTEGER) AS n_punct,
        |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','is','to','in','it','that'))) AS INTEGER) AS n_stopwords,
        |  length(text) AS tlen
        |FROM t),
        |q AS (SELECT doc_id,
        |  round(CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1) * 0.4
        |      + least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
        |      + (1.0 - CAST(n_punct AS DOUBLE) / greatest(tlen, 1)) * 0.2, 6) AS qs
        |FROM s),
        |st AS (SELECT CAST(sum(CAST(ROUND(qs * 1e6, 0) AS BIGINT)) AS BIGINT) AS sum_w,
        |         count(*) AS n FROM q),
        |a AS (SELECT doc_id,
        |        CASE WHEN sum_w > 0
        |          THEN least(1.0, CAST(CAST(ROUND(qs * 1e6, 0) AS BIGINT) AS DOUBLE)
        |            * 0.3 * n / CAST(sum_w AS DOUBLE))
        |          ELSE 0.0 END AS accept_rate
        |      FROM q CROSS JOIN st)
        |SELECT doc_id, round(accept_rate, 6) AS accept_rate FROM a
        |WHERE CAST(concat('0x', substr(md5('wsample|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |      % 1000000 < accept_rate * 1000000""".stripMargin,

    "q_corpus_diff" ->
      """WITH fp AS (SELECT doc_id, text,
        |        md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS f
        |      FROM documents),
        |old AS (SELECT doc_id,
        |          md5(trim(regexp_replace(lower(
        |            CASE WHEN doc_id % 11 = 0 THEN text || ' legacy trailer'
        |                 ELSE text END), '\s+', ' ', 'g'))) AS old_fp
        |        FROM fp WHERE doc_id % 17 != 0
        |        UNION ALL
        |        SELECT doc_id + 3000000, f FROM fp WHERE doc_id % 19 = 0),
        |new AS (SELECT doc_id, f AS new_fp FROM fp)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.old_fp IS NULL THEN 'added'
        |       WHEN n.new_fp IS NULL THEN 'removed'
        |       WHEN o.old_fp != n.new_fp THEN 'changed'
        |       ELSE 'unchanged' END AS status,
        |  o.old_fp, n.new_fp
        |FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id""".stripMargin,

    // vocab = top-50 train tokens (count desc, token asc); test docs
    // probe it; splits via the portable md5 bucket of q_hash_split
    "q_oov_rate" ->
      s"""WITH b AS (SELECT doc_id, text,
        |        CAST(concat('0x', substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bk
        |      FROM documents),
        |train_tok AS (SELECT unnest($toks) AS token FROM b WHERE bk < 80),
        |vocab AS (SELECT token FROM (
        |    SELECT token, count(*) AS n,
        |      row_number() OVER (ORDER BY count(*) DESC, token) AS rn
        |    FROM train_tok GROUP BY token) v WHERE rn <= 50),
        |test_tok AS (SELECT doc_id, unnest($toks) AS token FROM b WHERE bk >= 90)
        |SELECT t.doc_id, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  round(CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS oov_rate
        |FROM test_tok t LEFT JOIN vocab v USING (token)
        |GROUP BY t.doc_id""".stripMargin,

    // add-one bigram LM; per-bigram NLL rounded to integer micro
    // BEFORE the doc sum (the unigram_logprob discipline)
    "q_bigram_logprob" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |bg AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
        |       FROM t, unnest(range(1, len(toks))) AS u(i)
        |       WHERE len(toks) >= 2),
        |counted AS (SELECT doc_id, w1, w2, count(*) AS cnt
        |            FROM bg GROUP BY 1, 2, 3),
        |bn AS (SELECT w1, w2, CAST(sum(cnt) AS BIGINT) AS bg_n
        |       FROM counted GROUP BY 1, 2),
        |pn AS (SELECT w1, CAST(sum(bg_n) AS BIGINT) AS w1_n FROM bn GROUP BY 1),
        |vv AS (SELECT count(DISTINCT token) AS v_size
        |       FROM (SELECT unnest(toks) AS token FROM t) x),
        |nll AS (SELECT c.doc_id, c.cnt,
        |          CAST(ROUND(-ln(CAST(bn.bg_n + 1 AS DOUBLE)
        |            / (pn.w1_n + vv.v_size)) * 1e6, 0) AS BIGINT) AS nll_micro
        |        FROM counted c
        |        JOIN bn ON c.w1 = bn.w1 AND c.w2 = bn.w2
        |        JOIN pn ON c.w1 = pn.w1 CROSS JOIN vv)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
        |  CAST(sum(nll_micro * cnt) AS BIGINT) // CAST(sum(cnt) AS BIGINT)
        |    AS mean_nll_micro
        |FROM nll GROUP BY doc_id""".stripMargin,

    // identical spell-out + ordered literal replace() cascade; both
    // engines' replace() share the left-to-right non-overlap contract
    "q_bpe_apply" ->
      """SELECT doc_id, CAST(len(string_split(s, ' ')) AS INTEGER) AS n_bpe_symbols,
        |  s AS bpe_symbols
        |FROM (SELECT doc_id,
        |  replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(
        |    trim(regexp_replace(replace(lower(text), ' ', '_'), '(.)', '\1 ', 'g')),
        |    't h', 'th'), 'th e', 'the'), 'i n', 'in'), 'a n', 'an'),
        |    'an d', 'and'), 'e r', 'er'), 'o r', 'or'), 's t', 'st'),
        |    'the _', 'the_'), 'and _', 'and_') AS s
        |FROM documents) t""".stripMargin,

    "q_score_calibrate" ->
      s"""WITH t AS (SELECT doc_id, source, text, $toks AS toks FROM documents),
        |s AS (SELECT doc_id, source,
        |  CAST(len(toks) AS INTEGER) AS n_tokens,
        |  CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS INTEGER) AS n_punct,
        |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','is','to','in','it','that'))) AS INTEGER) AS n_stopwords,
        |  length(text) AS tlen
        |FROM t),
        |q AS (SELECT doc_id, source,
        |  round(CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1) * 0.4
        |      + least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
        |      + (1.0 - CAST(n_punct AS DOUBLE) / greatest(tlen, 1)) * 0.2, 6) AS quality_score
        |FROM s)
        |SELECT doc_id, source, quality_score,
        |  round(percent_rank() OVER (PARTITION BY source ORDER BY quality_score), 6)
        |    AS pct_rank
        |FROM q""".stripMargin,

    // stride-1 window hashes -> duplicated windows -> gaps-and-islands
    // merge to maximal spans; pos - row_number() island ids exactly as
    // the Spark side computes them
    "q_dedup_spans" ->
      s"""WITH planted AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 6 = 0
        |         THEN ' all rights reserved unauthorized reproduction of this material is strictly prohibited by law'
        |         ELSE '' END AS text
        |  FROM documents),
        |t AS (SELECT doc_id, $toks AS toks FROM planted),
        |tt AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 8),
        |w AS (SELECT doc_id, CAST(i AS INTEGER) AS pos,
        |        md5(array_to_string(toks[i+1 : i+8], ' ')) AS wh
        |      FROM tt, unnest(range(0, len(toks) - 7)) AS u(i)),
        |d AS (SELECT wh FROM w GROUP BY wh HAVING count(*) > 1),
        |dp AS (SELECT doc_id, pos FROM w JOIN d USING (wh)),
        |isl AS (SELECT doc_id, pos,
        |          pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |        FROM dp)
        |SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end,
        |  max(pos) + 7 - min(pos) + 1 AS n_tokens
        |FROM isl GROUP BY doc_id, island""".stripMargin,

    "q_sim_filtered_topk" ->
      """WITH c AS (SELECT vec_id, label,
        |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |      FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 5),
        |scored AS (SELECT query_id, c.vec_id AS nn_id,
        |    round(list_dot_product(qv, v)
        |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) AS cos_sim
        |  FROM c CROSS JOIN q
        |  WHERE c.label IN (1, 2, 3) AND c.vec_id != query_id)
        |SELECT query_id, nn_id, cos_sim, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY cos_sim DESC, nn_id) AS rn
        |  FROM scored) t WHERE rn <= 10""".stripMargin,

    // winnowing: k=3 token grams, window w=4, min-hash per window with
    // rightmost tie-break (reverse + first-position = rightmost);
    // 60-bit md5-prefix hash is the shared cross-engine contract
    "q_winnow_fingerprints" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |ld AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 6),
        |g AS (SELECT doc_id,
        |    list_transform(range(0, len(toks) - 2), i ->
        |      CAST(concat('0x', substr(md5(array_to_string(toks[i+1:i+3], ' ')), 1, 15)) AS BIGINT)) AS hv
        |  FROM ld),
        |sel AS (SELECT doc_id, hv,
        |    list_distinct(list_transform(range(0, len(hv) - 3), s ->
        |      s + 4 - list_position(list_reverse(hv[s+1:s+4]), list_min(hv[s+1:s+4])))) AS sels
        |  FROM g)
        |SELECT doc_id, CAST(pos AS BIGINT) AS pos, hv[CAST(pos AS INTEGER)+1] AS fp
        |FROM (SELECT doc_id, hv, unnest(sels) AS pos FROM sel) x""".stripMargin,

    // TextRank: adjacent-token co-occurrence graph (string-level
    // distinct, then 60-bit md5-prefix node ids), full 3-iteration
    // integer-micro PageRank replay, top-20 by (rank desc, token)
    "q_textrank" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |bg AS (SELECT DISTINCT toks[i] AS a, toks[i+1] AS b
        |       FROM (SELECT toks, unnest(range(1, len(toks))) AS i
        |             FROM t WHERE len(toks) >= 2) x
        |       WHERE toks[i] != toks[i+1]),
        |e0 AS (SELECT a, b FROM bg UNION SELECT b AS a, a AS b FROM bg),
        |vid AS (SELECT token,
        |          CAST(concat('0x', substr(md5(token), 1, 15)) AS BIGINT) AS nid
        |        FROM (SELECT a AS token FROM bg UNION SELECT b FROM bg) v),
        |e AS (SELECT va.nid AS src, vb.nid AS dst FROM e0
        |      JOIN vid va ON va.token = e0.a JOIN vid vb ON vb.token = e0.b),
        |deg AS (SELECT src, count(*) AS odeg FROM e GROUP BY src),
        |nodes AS (SELECT DISTINCT src AS node FROM e
        |          UNION SELECT DISTINCT dst AS node FROM e),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
        |i1 AS (SELECT e.dst AS node, sum(r0.r // deg.odeg) AS inflow
        |       FROM e JOIN deg USING (src) JOIN r0 ON r0.node = e.src
        |       GROUP BY e.dst),
        |r1 AS (SELECT n.node,
        |         CAST(150000 + (85 * coalesce(i1.inflow, 0)) // 100 AS BIGINT) AS r
        |       FROM nodes n LEFT JOIN i1 USING (node)),
        |i2 AS (SELECT e.dst AS node, sum(r1.r // deg.odeg) AS inflow
        |       FROM e JOIN deg USING (src) JOIN r1 ON r1.node = e.src
        |       GROUP BY e.dst),
        |r2 AS (SELECT n.node,
        |         CAST(150000 + (85 * coalesce(i2.inflow, 0)) // 100 AS BIGINT) AS r
        |       FROM nodes n LEFT JOIN i2 USING (node)),
        |i3 AS (SELECT e.dst AS node, sum(r2.r // deg.odeg) AS inflow
        |       FROM e JOIN deg USING (src) JOIN r2 ON r2.node = e.src
        |       GROUP BY e.dst),
        |r3 AS (SELECT n.node,
        |         CAST(150000 + (85 * coalesce(i3.inflow, 0)) // 100 AS BIGINT) AS r
        |       FROM nodes n LEFT JOIN i3 USING (node))
        |SELECT token, r AS rank_micro, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT v.token, r3.r, row_number() OVER (ORDER BY r3.r DESC, v.token) AS rn
        |  FROM r3 JOIN vid v ON v.nid = r3.node) ranked
        |WHERE rn <= 20""".stripMargin,

    // epoch shuffle: shard = first 60-bit md5 half mod 8, order = the
    // digest's second half (hex chars 16..30) — one digest, two keys
    "q_epoch_shuffle" ->
      """WITH h AS (SELECT doc_id,
        |    md5(concat('epoch1|', CAST(doc_id AS VARCHAR))) AS d
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(CAST(concat('0x', substr(d, 1, 15)) AS BIGINT) % 8 AS INTEGER) AS shard,
        |  CAST(row_number() OVER (
        |    PARTITION BY CAST(concat('0x', substr(d, 1, 15)) AS BIGINT) % 8
        |    ORDER BY CAST(concat('0x', substr(d, 16, 15)) AS BIGINT), doc_id)
        |    AS INTEGER) AS pos
        |FROM h""".stripMargin,

    // prefix-filtered Jaccard self-join: rarest-first shingle order,
    // prefix |d| − ceil(t·|d|) + 1, candidates on shared prefix
    // shingles, exact Jaccard verify at t = 0.5; shingles carried as
    // their 60-bit md5-prefix hash (the shared cross-engine contract)
    "q_prefix_jaccard" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |ts AS (SELECT doc_id, list_sort(list_distinct(list_transform(
        |         range(1, len(toks) - 1),
        |         i -> CAST(concat('0x', substr(md5(
        |           toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 15)) AS BIGINT)))) AS s
        |       FROM t WHERE len(toks) >= 3),
        |ex AS (SELECT doc_id, unnest(s) AS token FROM ts),
        |df AS (SELECT token, count(*) AS df FROM ex GROUP BY token),
        |ranked AS (SELECT e.doc_id, e.token,
        |    row_number() OVER (PARTITION BY e.doc_id ORDER BY d.df, e.token) AS rnk,
        |    count(*) OVER (PARTITION BY e.doc_id) AS sz
        |  FROM ex e JOIN df d USING (token)),
        |pref AS (SELECT doc_id, token FROM ranked
        |         WHERE rnk <= sz - CAST(ceil(0.5 * sz) AS BIGINT) + 1),
        |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |         FROM pref a JOIN pref b
        |           ON a.token = b.token AND a.doc_id < b.doc_id),
        |ver AS (SELECT a_id, b_id,
        |    len(list_intersect(sa.s, sb.s)) AS inter,
        |    len(sa.s) AS la, len(sb.s) AS lb
        |  FROM cand JOIN ts sa ON sa.doc_id = a_id
        |            JOIN ts sb ON sb.doc_id = b_id)
        |SELECT a_id, b_id,
        |  round(CAST(inter AS DOUBLE) / (la + lb - inter), 6) AS jaccard
        |FROM ver WHERE CAST(inter AS DOUBLE) / (la + lb - inter) >= 0.5""".stripMargin,

    // overlapping chunker: starts every (chunk − overlap) tokens
    "q_chunk_overlap" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents)
        |SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
        |  CAST(len(toks[i*48 + 1 : i*48 + 64]) AS INTEGER) AS n_chunk_tokens,
        |  array_to_string(toks[i*48 + 1 : i*48 + 64], ' ') AS chunk_text
        |FROM t, unnest(range(0, greatest(0, (len(toks) - 17) // 48) + 1)) AS u(i)
        |WHERE len(toks) > 0""".stripMargin,

    // PMI collocations: one-ln fixed-order double ratio, micro-rounded
    "q_pmi_collocations" ->
      s"""WITH t AS (SELECT $toks AS toks FROM documents),
        |uni AS (SELECT w, count(*) AS c FROM (
        |    SELECT unnest(toks) AS w FROM t) x GROUP BY w),
        |bi AS (SELECT toks[i] AS a, toks[i+1] AS b, count(*) AS pair_n
        |       FROM (SELECT toks FROM t WHERE len(toks) >= 2) y,
        |            unnest(range(1, len(toks))) AS u(i)
        |       GROUP BY 1, 2),
        |tot AS (SELECT (SELECT CAST(sum(c) AS BIGINT) FROM uni) AS n_tokens,
        |               (SELECT CAST(sum(pair_n) AS BIGINT) FROM bi) AS n_bigrams),
        |scored AS (SELECT bi.a, bi.b, CAST(bi.pair_n AS BIGINT) AS pair_n,
        |    CAST(ROUND(ln((CAST(bi.pair_n AS DOUBLE) * n_tokens * n_tokens)
        |      / (CAST(n_bigrams AS DOUBLE) * ua.c * ub.c)) * 1e6, 0) AS BIGINT) AS pmi_micro
        |  FROM bi JOIN uni ua ON ua.w = bi.a JOIN uni ub ON ub.w = bi.b
        |  CROSS JOIN tot WHERE bi.pair_n >= 5)
        |SELECT a, b, pair_n, pmi_micro, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT *, row_number() OVER (ORDER BY pmi_micro DESC, a, b) AS rn
        |  FROM scored) t WHERE rn <= 20""".stripMargin,

    // √-temperature source rebalancing: w ∝ √p (τ=2; sqrt is the one
    // exactly-rounded exponent), √-sum folded in sorted source order,
    // portable-hash acceptance coin
    "q_temperature_sample" ->
      """WITH cnt AS (SELECT source, count(*) AS n FROM documents
        |             WHERE source IS NOT NULL GROUP BY source),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cnt),
        |ssum AS (SELECT list_reduce(list(sqrt(CAST(n AS DOUBLE)) ORDER BY source),
        |           (a, b) -> a + b) AS s FROM cnt),
        |rates AS (SELECT source,
        |    CAST(ROUND(least(1.0,
        |      sqrt(CAST(n AS DOUBLE)) / s * 0.3 * total / n) * 1e6, 0) AS BIGINT)
        |      AS rate_micro
        |  FROM cnt CROSS JOIN tot CROSS JOIN ssum)
        |SELECT d.doc_id, d.source, r.rate_micro
        |FROM documents d JOIN rates r USING (source)
        |WHERE CAST(concat('0x', substr(md5(concat('tsample|',
        |    CAST(d.doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 1000000
        |  < r.rate_micro""".stripMargin,

    // hard negatives: nearest different-label neighbors
    "q_hard_negatives" ->
      """WITH c AS (SELECT vec_id, CAST(label AS BIGINT) AS lbl,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, lbl AS query_label, v AS qv
        |      FROM c WHERE vec_id < 5),
        |scored AS (SELECT query_id, query_label, c.vec_id AS nn_id,
        |    c.lbl AS nn_label,
        |    round(list_dot_product(qv, v)
        |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) AS cos_sim
        |  FROM c CROSS JOIN q
        |  WHERE c.vec_id != query_id AND c.lbl != query_label)
        |SELECT query_id, query_label, nn_id, nn_label, cos_sim,
        |  CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY cos_sim DESC, nn_id) AS rn
        |  FROM scored) t WHERE rn <= 10""".stripMargin,

    // length-bucketed batching: rank by (n_tokens, id) within hash
    // shard, runs of 8 become a batch
    "q_length_batches" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($toks) AS INTEGER) AS n_tokens,
        |    CAST(CAST(concat('0x', substr(md5(concat('lbb|',
        |      CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 4 AS INTEGER) AS shard
        |  FROM documents),
        |r AS (SELECT doc_id, n_tokens, shard,
        |    row_number() OVER (PARTITION BY shard
        |      ORDER BY n_tokens, doc_id) - 1 AS r
        |  FROM t)
        |SELECT doc_id, n_tokens, shard,
        |  CAST(r // 8 AS INTEGER) AS batch_id,
        |  CAST(r % 8 AS INTEGER) AS pos_in_batch
        |FROM r""".stripMargin,

    // span-removal decontamination: benchmark window set (8-token md5
    // windows of the id%97 split) probed against the train stream,
    // gaps-and-islands span merge, covered positions cut from the text
    "q_decontaminate" ->
      s"""WITH d AS (SELECT doc_id, concat(text,
        |    CASE WHEN doc_id % 97 = 0 OR doc_id % 13 = 0
        |      THEN ' the quick brown fox jumps over the lazy dog near the riverbank'
        |      ELSE '' END) AS text FROM documents),
        |t AS (SELECT doc_id, $toks AS toks FROM d),
        |win AS (SELECT doc_id, i AS pos,
        |          md5(array_to_string(toks[i+1:i+8], ' ')) AS wh
        |        FROM (SELECT doc_id, toks FROM t WHERE len(toks) >= 8) x,
        |             unnest(range(0, len(toks) - 7)) AS u(i)),
        |bw AS (SELECT DISTINCT wh FROM win WHERE doc_id % 97 = 0),
        |dp AS (SELECT w.doc_id, w.pos FROM win w JOIN bw USING (wh)
        |       WHERE w.doc_id % 97 != 0),
        |isl AS (SELECT doc_id, pos,
        |          pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |        FROM dp),
        |sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
        |       FROM isl GROUP BY doc_id, island),
        |cov AS (SELECT doc_id, list(p) AS cov FROM (
        |    SELECT DISTINCT doc_id, unnest(range(s, e + 1)) AS p FROM sp) z
        |  GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(toks) AS INTEGER) AS n_tokens,
        |  CAST(coalesce(len(cov), 0) AS INTEGER) AS n_removed,
        |  COALESCE(CASE WHEN cov IS NULL THEN array_to_string(toks, ' ')
        |       ELSE array_to_string(list_filter(toks,
        |         (x, i) -> NOT list_contains(cov, i - 1)), ' ')
        |  END, '') AS clean_text
        |FROM t LEFT JOIN cov USING (doc_id) WHERE t.doc_id % 97 != 0""".stripMargin,

    // pre-shuffle skew report on o_custkey: hot key (ties to lowest
    // key string), integer-micro share, per-key micro-rounded entropy
    "q_skew_report" ->
      """WITH c AS (SELECT CAST(o_custkey AS VARCHAR) AS k,
        |    CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_rows,
        |        CAST(count(*) AS BIGINT) AS n_keys FROM c),
        |h AS (SELECT k AS hot_key, n AS hot_n FROM c
        |      ORDER BY n DESC, k LIMIT 1),
        |e AS (SELECT CAST(sum(CAST(round(-(CAST(n AS DOUBLE) / t.n_rows)
        |        * ln(CAST(n AS DOUBLE) / t.n_rows) * 1000000, 0) AS BIGINT))
        |      AS BIGINT) AS entropy_micro
        |      FROM c CROSS JOIN t)
        |SELECT t.n_rows, t.n_keys, h.hot_key, h.hot_n,
        |  (h.hot_n * 1000000) // t.n_rows AS hot_share_micro,
        |  e.entropy_micro
        |FROM t CROSS JOIN h CROSS JOIN e""".stripMargin,

    // negative-sampling draw: w = cnt^(3/4) as sqrt(c*sqrt(c))
    // (exactly-rounded ops only), md5-Gumbel top-20 proportional to w
    "q_neg_sampling" ->
      s"""WITH t AS (SELECT $toks AS toks FROM documents),
        |v AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt
        |      FROM (SELECT unnest(toks) AS token FROM t) x GROUP BY 1),
        |w AS (SELECT token, cnt,
        |    sqrt(cnt * sqrt(cnt)) AS wt,
        |    (CAST(concat('0x', substr(md5('negs|' || token), 1, 15))
        |       AS BIGINT) + 0.5) / 1152921504606846976.0 AS u
        |  FROM v)
        |SELECT token, cnt,
        |  CAST(round(wt * 1000000, 0) AS BIGINT) AS w_micro,
        |  CAST(round(ln(wt) * 1000000, 0) AS BIGINT)
        |    + CAST(round(-ln(-ln(u)) * 1000000, 0) AS BIGINT) AS score_micro
        |FROM w ORDER BY score_micro DESC, token LIMIT 20""".stripMargin,

    // Bloom screening summary: 3x4096 portable-md5 filter over
    // train-split bigrams, probed by bench bigrams + 200 planted
    // absents; maybe = all 3 addressed bits set
    "q_bloom_probe" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |bg AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS key
        |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        |             FROM t WHERE len(toks) >= 2) x),
        |train AS (SELECT DISTINCT key FROM bg WHERE doc_id % 97 != 0),
        |probes AS (SELECT DISTINCT key FROM (
        |    SELECT key FROM bg WHERE doc_id % 97 = 0
        |    UNION ALL
        |    SELECT 'absent' || CAST(i AS VARCHAR)
        |    FROM (SELECT unnest(range(0, 200)) AS i)) u),
        |bloom AS (SELECT DISTINCT
        |    CAST(concat('0x', substr(md5('bloom' || CAST(s AS VARCHAR)
        |      || '|' || key), 1, 15)) AS BIGINT) % 4096 AS pos
        |  FROM train CROSS JOIN (SELECT unnest(range(0, 3)) AS s) d),
        |pr AS (SELECT key,
        |    CAST(concat('0x', substr(md5('bloom' || CAST(s AS VARCHAR)
        |      || '|' || key), 1, 15)) AS BIGINT) % 4096 AS pos
        |  FROM probes CROSS JOIN (SELECT unnest(range(0, 3)) AS s) d),
        |hits AS (SELECT pr.key,
        |    CAST(sum(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END)
        |      AS BIGINT) AS h
        |  FROM pr LEFT JOIN bloom b ON b.pos = pr.pos GROUP BY 1),
        |m AS (SELECT key, h = 3 AS maybe_present FROM hits)
        |SELECT CAST(count(*) AS BIGINT) AS n_probe,
        |  CAST(sum(CASE WHEN tr.key IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_true_present,
        |  CAST(sum(CASE WHEN maybe_present THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_maybe,
        |  CAST(sum(CASE WHEN maybe_present AND tr.key IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
        |FROM m LEFT JOIN train tr USING (key)""".stripMargin,

    // MMR diversified top-5 (lambda=7/10), greedy unrolled 5 steps
    // (the bpe-train replay discipline): cosine top-20 candidates,
    // integer-micro scoring 7*rel - 3*maxsim, ties to lowest cid
    "q_mmr_diversify" ->
      """WITH c AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 3),
        |scored AS (SELECT query_id, c.vec_id AS nn_id,
        |    round(list_dot_product(qv, v)
        |      / (sqrt(list_dot_product(qv, qv))
        |         * sqrt(list_dot_product(v, v))), 6) AS cos_sim
        |  FROM c CROSS JOIN q WHERE c.vec_id != query_id),
        |cand AS (SELECT query_id, nn_id AS cid,
        |    CAST(round(cos_sim * 1000000, 0) AS BIGINT) AS rel_micro FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos_sim DESC, nn_id) AS rn FROM scored) t
        |  WHERE rn <= 20),
        |sims AS (SELECT a.query_id, a.cid AS a, b.cid AS b,
        |    CAST(round(round(list_dot_product(va.v, vb.v)
        |      / (sqrt(list_dot_product(va.v, va.v))
        |         * sqrt(list_dot_product(vb.v, vb.v))), 6)
        |      * 1000000, 0) AS BIGINT) AS sim_micro
        |  FROM cand a JOIN cand b ON a.query_id = b.query_id AND a.cid != b.cid
        |  JOIN c va ON va.vec_id = a.cid JOIN c vb ON vb.vec_id = b.cid),
        |p1 AS (SELECT query_id, cid, 1 AS pick_rank, rel_micro FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY rel_micro DESC, cid) AS rn FROM cand) t WHERE rn = 1),
        |s2 AS (SELECT query_id, cid, 2 AS pick_rank, rel_micro FROM (
        |    SELECT m.query_id, m.cid, m.rel_micro,
        |      row_number() OVER (PARTITION BY m.query_id
        |        ORDER BY 7 * m.rel_micro - 3 * m.maxsim DESC, m.cid) AS rn
        |    FROM (SELECT c.query_id, c.cid, c.rel_micro, max(s.sim_micro) AS maxsim
        |          FROM cand c
        |          JOIN sims s ON s.query_id = c.query_id AND s.a = c.cid
        |          JOIN p1 p ON p.query_id = s.query_id AND p.cid = s.b
        |          WHERE NOT EXISTS (SELECT 1 FROM p1 q
        |                            WHERE q.query_id = c.query_id AND q.cid = c.cid)
        |          GROUP BY 1, 2, 3) m) z WHERE rn = 1),
        |p2 AS (SELECT * FROM p1 UNION ALL SELECT * FROM s2),
        |s3 AS (SELECT query_id, cid, 3 AS pick_rank, rel_micro FROM (
        |    SELECT m.query_id, m.cid, m.rel_micro,
        |      row_number() OVER (PARTITION BY m.query_id
        |        ORDER BY 7 * m.rel_micro - 3 * m.maxsim DESC, m.cid) AS rn
        |    FROM (SELECT c.query_id, c.cid, c.rel_micro, max(s.sim_micro) AS maxsim
        |          FROM cand c
        |          JOIN sims s ON s.query_id = c.query_id AND s.a = c.cid
        |          JOIN p2 p ON p.query_id = s.query_id AND p.cid = s.b
        |          WHERE NOT EXISTS (SELECT 1 FROM p2 q
        |                            WHERE q.query_id = c.query_id AND q.cid = c.cid)
        |          GROUP BY 1, 2, 3) m) z WHERE rn = 1),
        |p3 AS (SELECT * FROM p2 UNION ALL SELECT * FROM s3),
        |s4 AS (SELECT query_id, cid, 4 AS pick_rank, rel_micro FROM (
        |    SELECT m.query_id, m.cid, m.rel_micro,
        |      row_number() OVER (PARTITION BY m.query_id
        |        ORDER BY 7 * m.rel_micro - 3 * m.maxsim DESC, m.cid) AS rn
        |    FROM (SELECT c.query_id, c.cid, c.rel_micro, max(s.sim_micro) AS maxsim
        |          FROM cand c
        |          JOIN sims s ON s.query_id = c.query_id AND s.a = c.cid
        |          JOIN p3 p ON p.query_id = s.query_id AND p.cid = s.b
        |          WHERE NOT EXISTS (SELECT 1 FROM p3 q
        |                            WHERE q.query_id = c.query_id AND q.cid = c.cid)
        |          GROUP BY 1, 2, 3) m) z WHERE rn = 1),
        |p4 AS (SELECT * FROM p3 UNION ALL SELECT * FROM s4),
        |s5 AS (SELECT query_id, cid, 5 AS pick_rank, rel_micro FROM (
        |    SELECT m.query_id, m.cid, m.rel_micro,
        |      row_number() OVER (PARTITION BY m.query_id
        |        ORDER BY 7 * m.rel_micro - 3 * m.maxsim DESC, m.cid) AS rn
        |    FROM (SELECT c.query_id, c.cid, c.rel_micro, max(s.sim_micro) AS maxsim
        |          FROM cand c
        |          JOIN sims s ON s.query_id = c.query_id AND s.a = c.cid
        |          JOIN p4 p ON p.query_id = s.query_id AND p.cid = s.b
        |          WHERE NOT EXISTS (SELECT 1 FROM p4 q
        |                            WHERE q.query_id = c.query_id AND q.cid = c.cid)
        |          GROUP BY 1, 2, 3) m) z WHERE rn = 1),
        |p5 AS (SELECT * FROM p4 UNION ALL SELECT * FROM s5)
        |SELECT query_id, cid, pick_rank, rel_micro FROM p5""".stripMargin,

    // per-source HyperLogLog distinct bigrams: portable md5-60
    // registers (rho from binary-string length), exact-long harmonic
    // sum, alpha_micro=718273 for m=256, linear-counting small-range
    // branch on the proven-portable ln
    "q_hll_distinct" ->
      s"""WITH t AS (SELECT source, $toks AS toks FROM documents),
        |bg AS (SELECT source, toks[i] || ' ' || toks[i+1] AS key
        |       FROM (SELECT source, toks, unnest(range(1, len(toks))) AS i
        |             FROM t WHERE len(toks) >= 2) x),
        |h AS (SELECT source, key,
        |    CAST(concat('0x', substr(md5('hll|' || key), 1, 15)) AS BIGINT)
        |      AS hv FROM bg),
        |r AS (SELECT source, hv % 256 AS reg,
        |    CAST(least(53 - length(format('{:b}', hv // 256)), 32)
        |      AS BIGINT) AS rho FROM h),
        |m AS (SELECT source, reg, max(rho) AS mj FROM r GROUP BY 1, 2),
        |agg AS (SELECT source,
        |    CAST(sum(CAST(1 AS BIGINT) << (32 - mj)) AS BIGINT)
        |      + (256 - count(*)) * 4294967296 AS est_scaled,
        |    CAST(256 - count(*) AS BIGINT) AS v
        |  FROM m GROUP BY 1),
        |est AS (SELECT source, v,
        |    (718273 * (281474976710656 // est_scaled)) // 1000000
        |      AS raw_est FROM agg),
        |ex AS (SELECT source, CAST(count(DISTINCT key) AS BIGINT) AS true_n
        |       FROM bg GROUP BY 1)
        |SELECT e.source, ex.true_n, e.v, e.raw_est,
        |  CASE WHEN e.v > 0 AND e.raw_est <= 640
        |       THEN CAST(round(256 * ln(256.0 / e.v), 0) AS BIGINT)
        |       ELSE e.raw_est END AS hll_est
        |FROM est e JOIN ex USING (source)""".stripMargin,

    // mergeable quantile sketch: the deterministic md5-threshold
    // sample replays exactly, quantile_cont ≡ Spark percentile
    "q_quantile_sketch" ->
      """WITH s AS (SELECT o_orderpriority, o_totalprice FROM orders
        |  WHERE CAST(concat('0x',
        |      substr(md5('qs|' || CAST(o_orderkey AS VARCHAR)), 1, 15))
        |    AS BIGINT) % 8 = 0),
        |est AS (SELECT o_orderpriority,
        |    CAST(count(*) AS BIGINT) AS n_sampled,
        |    round(quantile_cont(o_totalprice, 0.5), 4) AS p50_est,
        |    round(quantile_cont(o_totalprice, 0.9), 4) AS p90_est
        |  FROM s GROUP BY 1),
        |ex AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |    round(quantile_cont(o_totalprice, 0.5), 4) AS p50_exact,
        |    round(quantile_cont(o_totalprice, 0.9), 4) AS p90_exact
        |  FROM orders GROUP BY 1)
        |SELECT ex.o_orderpriority, ex.n, est.n_sampled,
        |  est.p50_est, est.p90_est, ex.p50_exact, ex.p90_exact
        |FROM ex LEFT JOIN est USING (o_orderpriority)""".stripMargin,

    // KMV bottom-k overlap: replay the bottom-256 distinct md5-60
    // hashes per returnflag (window-rank formulation — fine in an
    // oracle), then the identical IEEE-double union/intersection
    // estimates; exact pairwise intersection rides along
    "q_kmv_overlap" ->
      """WITH li AS (SELECT l_returnflag AS grp,
        |    CAST(l_partkey AS VARCHAR) AS key FROM lineitem),
        |h AS (SELECT DISTINCT grp,
        |    CAST(concat('0x', substr(md5('kmv|' || key), 1, 15)) AS BIGINT)
        |      AS h FROM li),
        |rk AS (SELECT grp, h,
        |    row_number() OVER (PARTITION BY grp ORDER BY h) AS rn FROM h),
        |sk AS (SELECT grp, list(h ORDER BY h) AS hs
        |       FROM rk WHERE rn <= 256 GROUP BY grp),
        |p AS (SELECT a.grp AS grp_a, b.grp AS grp_b, a.hs AS hs_a, b.hs AS hs_b
        |      FROM sk a JOIN sk b ON a.grp < b.grp),
        |c AS (SELECT grp_a, grp_b, hs_a, hs_b,
        |    list_sort(list_distinct(list_concat(hs_a, hs_b)))[1:256] AS l
        |  FROM p),
        |e AS (SELECT grp_a, grp_b, hs_a, hs_b, l, len(l) AS kp,
        |    CASE WHEN len(l) < 256 THEN CAST(len(l) AS DOUBLE)
        |         ELSE round(255.0 * pow(2, 60) / CAST(l[256] AS DOUBLE), 2)
        |    END AS est_union,
        |    len(list_filter(l, x -> list_contains(hs_a, x)
        |          AND list_contains(hs_b, x))) AS common
        |  FROM c),
        |d AS (SELECT DISTINCT grp, key FROM li),
        |ex AS (SELECT a.grp AS grp_a, b.grp AS grp_b,
        |    CAST(count(*) AS BIGINT) AS inter_exact
        |  FROM d a JOIN d b ON a.key = b.key AND a.grp < b.grp GROUP BY 1, 2)
        |SELECT e.grp_a, e.grp_b,
        |  CASE WHEN len(e.hs_a) < 256 THEN CAST(len(e.hs_a) AS DOUBLE)
        |       ELSE round(255.0 * pow(2, 60) / CAST(e.hs_a[256] AS DOUBLE), 2)
        |  END AS est_a,
        |  CASE WHEN len(e.hs_b) < 256 THEN CAST(len(e.hs_b) AS DOUBLE)
        |       ELSE round(255.0 * pow(2, 60) / CAST(e.hs_b[256] AS DOUBLE), 2)
        |  END AS est_b,
        |  e.est_union,
        |  round(CAST(e.common AS DOUBLE) / e.kp * e.est_union, 2) AS est_inter,
        |  ex.inter_exact
        |FROM e JOIN ex USING (grp_a, grp_b)""".stripMargin,

    // joinability: the q_kmv_overlap replay over six key columns,
    // plus directed containment = est_inter/est_a and the exact
    // intersection (0 for disjoint pairs, as the engine coalesces)
    "q_joinability" ->
      """WITH li AS (
        |  SELECT 'orders.o_custkey' AS grp, CAST(o_custkey AS VARCHAR) AS key FROM orders
        |  UNION ALL
        |  SELECT 'customer.c_custkey', CAST(c_custkey AS VARCHAR) FROM customer
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey', CAST(l_partkey AS VARCHAR) FROM lineitem
        |  UNION ALL
        |  SELECT 'part.p_partkey', CAST(p_partkey AS VARCHAR) FROM part
        |  UNION ALL
        |  SELECT 'lineitem.l_suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem
        |  UNION ALL
        |  SELECT 'supplier.s_suppkey', CAST(s_suppkey AS VARCHAR) FROM supplier),
        |h AS (SELECT DISTINCT grp,
        |    CAST(concat('0x', substr(md5('kmv|' || key), 1, 15)) AS BIGINT)
        |      AS h FROM li),
        |rk AS (SELECT grp, h,
        |    row_number() OVER (PARTITION BY grp ORDER BY h) AS rn FROM h),
        |sk AS (SELECT grp, list(h ORDER BY h) AS hs
        |       FROM rk WHERE rn <= 256 GROUP BY grp),
        |p AS (SELECT a.grp AS grp_a, b.grp AS grp_b, a.hs AS hs_a, b.hs AS hs_b
        |      FROM sk a JOIN sk b ON a.grp < b.grp),
        |c AS (SELECT grp_a, grp_b, hs_a, hs_b,
        |    list_sort(list_distinct(list_concat(hs_a, hs_b)))[1:256] AS l
        |  FROM p),
        |e AS (SELECT grp_a, grp_b, hs_a, hs_b, l, len(l) AS kp,
        |    CASE WHEN len(l) < 256 THEN CAST(len(l) AS DOUBLE)
        |         ELSE round(255.0 * pow(2, 60) / CAST(l[256] AS DOUBLE), 2)
        |    END AS est_union,
        |    len(list_filter(l, x -> list_contains(hs_a, x)
        |          AND list_contains(hs_b, x))) AS common
        |  FROM c),
        |o AS (SELECT grp_a, grp_b,
        |    CASE WHEN len(hs_a) < 256 THEN CAST(len(hs_a) AS DOUBLE)
        |         ELSE round(255.0 * pow(2, 60) / CAST(hs_a[256] AS DOUBLE), 2)
        |    END AS est_a,
        |    CASE WHEN len(hs_b) < 256 THEN CAST(len(hs_b) AS DOUBLE)
        |         ELSE round(255.0 * pow(2, 60) / CAST(hs_b[256] AS DOUBLE), 2)
        |    END AS est_b,
        |    est_union,
        |    CASE WHEN kp = 0 THEN 0.0
        |         ELSE round(CAST(common AS DOUBLE) / kp * est_union, 2)
        |    END AS est_inter
        |  FROM e),
        |d AS (SELECT DISTINCT grp, key FROM li),
        |ex AS (SELECT a.grp AS grp_a, b.grp AS grp_b,
        |    CAST(count(*) AS BIGINT) AS inter_exact
        |  FROM d a JOIN d b ON a.key = b.key AND a.grp < b.grp GROUP BY 1, 2)
        |SELECT o.grp_a, o.grp_b, o.est_a, o.est_b, o.est_union, o.est_inter,
        |  COALESCE(ex.inter_exact, 0) AS inter_exact,
        |  round(o.est_inter / o.est_a, 4) AS containment_a,
        |  round(o.est_inter / o.est_b, 4) AS containment_b
        |FROM o LEFT JOIN ex ON o.grp_a = ex.grp_a AND o.grp_b = ex.grp_b""".stripMargin,

    // interpolated Kneser-Ney bigram LM, D=3/4 folded into exact
    // long arithmetic (split-term truncating division IS the
    // contract); top-100 by count
    "q_kn_bigram" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |bg AS (SELECT toks[i] AS w1, toks[i+1] AS w2
        |       FROM (SELECT toks, unnest(range(1, len(toks))) AS i
        |             FROM t WHERE len(toks) >= 2) x),
        |c AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
        |      FROM bg GROUP BY 1, 2),
        |h AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cw1,
        |        CAST(count(*) AS BIGINT) AS n1f FROM c GROUP BY 1),
        |f AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1b
        |      FROM c GROUP BY 1),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS T FROM c)
        |SELECT w1, w2, c,
        |  (1000000000 * (4 * c - 3)) // (4 * cw1)
        |    + (3000000000 * n1f * n1b) // (4 * cw1 * T) AS pkn_nano
        |FROM c JOIN h USING (w1) JOIN f USING (w2) CROSS JOIN tt
        |ORDER BY c DESC, w1, w2 LIMIT 100""".stripMargin,

    // count-min heavy hitters: bigram keys, 4x256 portable-md5
    // sketch, sample-proposed candidates estimated as min over the
    // 4 addressed counters; estimate >= exact by construction
    "q_cms_heavy_hitters" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |bg AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS key
        |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        |             FROM t WHERE len(toks) >= 2) x),
        |vc AS (SELECT key, count(*) AS exact_n FROM bg GROUP BY 1),
        |ex AS (SELECT key, exact_n, CAST(seed AS INTEGER) AS seed,
        |    CAST(concat('0x', substr(md5('cms' || CAST(seed AS VARCHAR)
        |      || '|' || key), 1, 15)) AS BIGINT) % 256 AS bucket
        |  FROM vc CROSS JOIN (SELECT unnest(range(0, 4)) AS seed) s),
        |sk AS (SELECT seed, bucket, CAST(sum(exact_n) AS BIGINT) AS c
        |       FROM ex GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT key FROM bg WHERE doc_id % 8 = 0),
        |est AS (SELECT e.key, min(sk.c) AS cms_est
        |        FROM ex e JOIN sk USING (seed, bucket)
        |             JOIN cand USING (key)
        |        GROUP BY 1)
        |SELECT e.key, vc.exact_n, e.cms_est
        |FROM est e JOIN vc USING (key)
        |ORDER BY cms_est DESC, key LIMIT 50""".stripMargin,

    // co-purchase association rules: pair support >= 3, exact
    // integer-micro confidence and lift, top-50 by lift
    "q_assoc_rules" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders
        |      FROM li),
        |supp AS (SELECT pk, CAST(count(*) AS BIGINT) AS s
        |         FROM li GROUP BY 1),
        |pairs AS (SELECT a.pk AS a, b.pk AS b,
        |    CAST(count(*) AS BIGINT) AS s_ab
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk != b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT p.a, p.b, p.s_ab,
        |  (p.s_ab * 1000000) // sa.s AS conf_micro,
        |  (p.s_ab * n.n_orders * 1000000) // (sa.s * sb.s) AS lift_micro
        |FROM pairs p JOIN supp sa ON sa.pk = p.a
        |  JOIN supp sb ON sb.pk = p.b CROSS JOIN n
        |ORDER BY lift_micro DESC, a, b LIMIT 50""".stripMargin,

    // ER with the Jaro-Winkler residual (micro threshold 900000),
    // same blocking/closure as q_entity_resolution
    "q_entity_resolution_jw" ->
      """WITH RECURSIVE recs AS (
        |  SELECT c_custkey AS record_id, c_name AS name FROM customer
        |  UNION ALL SELECT c_custkey + 1000000,
        |    replace(c_name, 'Customer', 'Custoomer')
        |    FROM customer WHERE c_custkey % 5 = 0
        |  UNION ALL SELECT c_custkey + 2000000,
        |    replace(c_name, 'Customer', 'Custmer')
        |    FROM customer WHERE c_custkey % 7 = 0
        |  UNION ALL SELECT c_custkey + 3000000,
        |    concat('  ', upper(c_name), ' ')
        |    FROM customer WHERE c_custkey % 3 = 0),
        |n AS (SELECT record_id,
        |    regexp_replace(lower(trim(name)), '[^a-z]', '', 'g') AS letters,
        |    regexp_replace(lower(trim(name)), '[^0-9]', '', 'g') AS digits
        |  FROM recs),
        |bc AS (SELECT digits, count(*) AS c FROM n WHERE digits != ''
        |       GROUP BY 1),
        |nb AS (SELECT n.* FROM n JOIN bc USING (digits) WHERE bc.c <= 64),
        |e AS (SELECT a.record_id AS src, b.record_id AS dst
        |      FROM nb a JOIN nb b USING (digits)
        |      WHERE a.record_id < b.record_id
        |        AND CAST(round(jaro_winkler_similarity(a.letters, b.letters)
        |          * 1000000, 0) AS BIGINT) >= 900000),
        |edges AS (SELECT src AS s, dst AS d FROM e
        |          UNION SELECT dst, src FROM e),
        |reach(node, label) AS (
        |  SELECT DISTINCT s, s FROM edges
        |  UNION
        |  SELECT e2.s, rr.label FROM reach rr JOIN edges e2 ON e2.d = rr.node),
        |comp AS (SELECT node, MIN(label) AS component FROM reach
        |         GROUP BY node)
        |SELECT n.record_id, COALESCE(comp.component, n.record_id) AS entity_id
        |FROM n LEFT JOIN comp ON n.record_id = comp.node""".stripMargin,

    // native Jaro-Winkler vs DuckDB's built-in, micro-rounded per
    // within-block pair of the ER variant set
    "q_jaro_winkler" ->
      """WITH recs AS (
        |  SELECT c_custkey AS record_id, c_name AS name FROM customer
        |  UNION ALL SELECT c_custkey + 1000000,
        |    replace(c_name, 'Customer', 'Custoomer')
        |    FROM customer WHERE c_custkey % 5 = 0
        |  UNION ALL SELECT c_custkey + 2000000,
        |    replace(c_name, 'Customer', 'Custmer')
        |    FROM customer WHERE c_custkey % 7 = 0
        |  UNION ALL SELECT c_custkey + 3000000,
        |    concat('  ', upper(c_name), ' ')
        |    FROM customer WHERE c_custkey % 3 = 0),
        |n AS (SELECT record_id,
        |    regexp_replace(lower(trim(name)), '[^a-z]', '', 'g') AS letters,
        |    regexp_replace(lower(trim(name)), '[^0-9]', '', 'g') AS digits
        |  FROM recs)
        |SELECT a.record_id AS src, b.record_id AS dst,
        |  CAST(round(jaro_winkler_similarity(a.letters, b.letters)
        |    * 1000000, 0) AS BIGINT) AS jw_micro
        |FROM n a JOIN n b
        |  ON a.digits = b.digits AND a.record_id < b.record_id""".stripMargin,

    // sorted-neighborhood ER: global rank on digits|letters, window-8
    // neighbor pairs, same digit-equal + edit-1 match rule; keyless
    // md5-letter twin families must link (blocking cannot)
    "q_entity_resolution_sn" ->
      """WITH RECURSIVE recs AS (
        |  SELECT c_custkey AS record_id, c_name AS name FROM customer
        |  UNION ALL SELECT c_custkey + 1000000,
        |    replace(c_name, 'Customer', 'Custoomer')
        |    FROM customer WHERE c_custkey % 5 = 0
        |  UNION ALL SELECT c_custkey + 2000000,
        |    replace(c_name, 'Customer', 'Custmer')
        |    FROM customer WHERE c_custkey % 7 = 0
        |  UNION ALL SELECT c_custkey + 3000000,
        |    concat('  ', upper(c_name), ' ')
        |    FROM customer WHERE c_custkey % 3 = 0
        |  UNION ALL SELECT c_custkey + 4000000,
        |    concat('zz', regexp_replace(md5('kl|' ||
        |      CAST(c_custkey AS VARCHAR)), '[0-9]', '', 'g'))
        |    FROM customer WHERE c_custkey % 13 = 0
        |  UNION ALL SELECT c_custkey + 5000000,
        |    concat('zz', regexp_replace(md5('kl|' ||
        |      CAST(c_custkey AS VARCHAR)), '[0-9]', '', 'g'), 'x')
        |    FROM customer WHERE c_custkey % 13 = 0),
        |n AS (SELECT record_id,
        |    regexp_replace(lower(trim(name)), '[^a-z]', '', 'g') AS letters,
        |    regexp_replace(lower(trim(name)), '[^0-9]', '', 'g') AS digits
        |  FROM recs),
        |r AS (SELECT *, row_number() OVER (
        |    ORDER BY digits || '|' || letters, record_id) AS rank FROM n),
        |e AS (SELECT a.record_id AS src, b.record_id AS dst
        |      FROM r a JOIN r b
        |        ON b.rank > a.rank AND b.rank - a.rank < 8
        |      WHERE a.digits = b.digits
        |        AND levenshtein(a.letters, b.letters) <= 1),
        |edges AS (SELECT src AS s, dst AS d FROM e
        |          UNION SELECT dst, src FROM e),
        |reach(node, label) AS (
        |  SELECT DISTINCT s, s FROM edges
        |  UNION
        |  SELECT e2.s, rr.label FROM reach rr JOIN edges e2 ON e2.d = rr.node),
        |comp AS (SELECT node, MIN(label) AS component FROM reach
        |         GROUP BY node)
        |SELECT n.record_id, COALESCE(comp.component, n.record_id) AS entity_id
        |FROM n LEFT JOIN comp ON n.record_id = comp.node""".stripMargin,

    // entity resolution: digit-string strong-key blocking (block cap
    // 64), letter-string edit-distance-1 match, recursive min-label
    // closure; singletons resolve to themselves
    "q_entity_resolution" ->
      """WITH RECURSIVE recs AS (
        |  SELECT c_custkey AS record_id, c_name AS name FROM customer
        |  UNION ALL SELECT c_custkey + 1000000,
        |    replace(c_name, 'Customer', 'Custoomer')
        |    FROM customer WHERE c_custkey % 5 = 0
        |  UNION ALL SELECT c_custkey + 2000000,
        |    replace(c_name, 'Customer', 'Custmer')
        |    FROM customer WHERE c_custkey % 7 = 0
        |  UNION ALL SELECT c_custkey + 3000000,
        |    concat('  ', upper(c_name), ' ')
        |    FROM customer WHERE c_custkey % 3 = 0),
        |n AS (SELECT record_id,
        |    regexp_replace(lower(trim(name)), '[^a-z]', '', 'g') AS letters,
        |    regexp_replace(lower(trim(name)), '[^0-9]', '', 'g') AS digits
        |  FROM recs),
        |bc AS (SELECT digits, count(*) AS c FROM n WHERE digits != ''
        |       GROUP BY 1),
        |nb AS (SELECT n.* FROM n JOIN bc USING (digits) WHERE bc.c <= 64),
        |e AS (SELECT a.record_id AS src, b.record_id AS dst
        |      FROM nb a JOIN nb b USING (digits)
        |      WHERE a.record_id < b.record_id
        |        AND levenshtein(a.letters, b.letters) <= 1),
        |edges AS (SELECT src AS s, dst AS d FROM e
        |          UNION SELECT dst, src FROM e),
        |reach(node, label) AS (
        |  SELECT DISTINCT s, s FROM edges
        |  UNION
        |  SELECT e.s, r.label FROM reach r JOIN edges e ON e.d = r.node),
        |comp AS (SELECT node, MIN(label) AS component FROM reach
        |         GROUP BY node)
        |SELECT n.record_id, COALESCE(comp.component, n.record_id) AS entity_id
        |FROM n LEFT JOIN comp ON n.record_id = comp.node""".stripMargin,

    // exact 5-NN majority vote on integer-micro squared L2
    "q_knn_classify" ->
      """WITH c AS (SELECT vec_id, label, list_transform(embedding,
        |    x -> CAST(ROUND(CAST(x AS DOUBLE) * 1e6, 0) AS BIGINT)) AS m
        |  FROM embeddings),
        |t AS (SELECT vec_id AS tid, CAST(label AS BIGINT) AS true_lbl, m AS tm
        |      FROM c WHERE vec_id % 5 = 0),
        |tr AS (SELECT vec_id AS nid, CAST(label AS BIGINT) AS n_lbl, m AS nm
        |       FROM c WHERE vec_id % 5 != 0),
        |sc AS (SELECT tid, true_lbl, nid, n_lbl,
        |    CAST(list_sum(list_transform(range(1, len(tm) + 1),
        |      i -> (tm[i] - nm[i]) * (tm[i] - nm[i]))) AS BIGINT) AS d2
        |  FROM t CROSS JOIN tr),
        |top AS (SELECT tid, true_lbl, n_lbl FROM (
        |    SELECT *, row_number() OVER (PARTITION BY tid ORDER BY d2, nid) AS rn
        |    FROM sc) x WHERE rn <= 5),
        |vote AS (SELECT tid, true_lbl, n_lbl, count(*) AS cnt
        |         FROM top GROUP BY 1, 2, 3),
        |pred AS (SELECT tid, true_lbl, n_lbl AS pred_label FROM (
        |    SELECT *, row_number() OVER (PARTITION BY tid
        |      ORDER BY cnt DESC, n_lbl) AS vr FROM vote) y WHERE vr = 1)
        |SELECT true_lbl AS label, pred_label, CAST(count(*) AS BIGINT) AS n
        |FROM pred GROUP BY 1, 2""".stripMargin,

    // IVF-PQ replay: coarse centroids = 8 lowest-id vectors; residual
    // codebook = residuals of the 16 lowest-id vectors under the SAME
    // assignment argmax; ADC = micro-rounded coarse term + per-subspace
    // micro-rounded residual terms — an exact BIGINT in both engines
    "q_sim_ivfpq_topk" ->
      """WITH c AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |cent AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS cluster, v AS cv
        |         FROM (SELECT vec_id, v FROM c ORDER BY vec_id LIMIT 8)),
        |asg AS (SELECT vec_id, cluster FROM (
        |    SELECT c.vec_id, cent.cluster,
        |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
        |        list_dot_product(v, cv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) DESC,
        |        cluster) AS arn
        |    FROM c CROSS JOIN cent) t WHERE arn = 1),
        |res AS (SELECT c.vec_id, asg.cluster,
        |          list_transform(range(1, len(v) + 1), i -> v[i] - cv[i]) AS rv
        |        FROM c JOIN asg ON c.vec_id = asg.vec_id
        |        JOIN cent ON cent.cluster = asg.cluster),
        |seed AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS code, rv
        |         FROM (SELECT vec_id, rv FROM res ORDER BY vec_id LIMIT 16) s),
        |subs AS (SELECT CAST(unnest(range(0, 8)) AS INTEGER) AS j),
        |cb AS (SELECT j, code, list_slice(rv, j*8 + 1, j*8 + 8) AS cent
        |       FROM seed CROSS JOIN subs),
        |enc AS (SELECT vec_id, cluster, j, code FROM (
        |    SELECT res.vec_id, res.cluster, cb.j, cb.code,
        |      row_number() OVER (PARTITION BY res.vec_id, cb.j
        |        ORDER BY list_dot_product(list_slice(res.rv, cb.j*8 + 1, cb.j*8 + 8), cb.cent)
        |                 - 0.5 * list_dot_product(cb.cent, cb.cent) DESC, cb.code) AS rn
        |    FROM res CROSS JOIN cb) t WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 5),
        |probes AS (SELECT query_id, qv, cluster FROM (
        |    SELECT query_id, qv, cent.cluster,
        |      row_number() OVER (PARTITION BY query_id ORDER BY
        |        list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) DESC,
        |        cluster) AS prn
        |    FROM q CROSS JOIN cent) t WHERE prn <= 2),
        |sc AS (SELECT p.query_id, e.vec_id AS nn_id,
        |    MIN(CAST(ROUND(list_dot_product(p.qv, cent.cv) * 1e6, 0) AS BIGINT))
        |    + CAST(SUM(CAST(ROUND(list_dot_product(
        |        list_slice(p.qv, e.j*8 + 1, e.j*8 + 8), cb.cent) * 1e6, 0) AS BIGINT)) AS BIGINT) AS ip_micro
        |  FROM probes p JOIN enc e ON e.cluster = p.cluster
        |  JOIN cb ON cb.j = e.j AND cb.code = e.code
        |  JOIN cent ON cent.cluster = p.cluster
        |  WHERE e.vec_id != p.query_id
        |  GROUP BY p.query_id, e.vec_id)
        |SELECT query_id, nn_id, ip_micro, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY ip_micro DESC, nn_id) AS rn
        |  FROM sc) t WHERE rn <= 10""".stripMargin,

    // RRF hybrid-retrieval replay: the BM25 top-20 (identical scoring
    // to q_bm25_topk) and dense cosine top-20 for query 0 (identical
    // to q_sim_cosine_topk), each re-ranked, fused by
    // round(1e6/(60+rank)) micro-terms summed as longs.
    "q_rrf_fusion" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |wtf AS (SELECT doc_id,
        |  CAST(len(toks) AS INTEGER) AS dl,
        |  CAST(len(list_filter(toks, x -> x = 'spark')) AS INTEGER) AS tf0,
        |  CAST(len(list_filter(toks, x -> x = 'data')) AS INTEGER) AS tf1,
        |  CAST(len(list_filter(toks, x -> x = 'join')) AS INTEGER) AS tf2
        |FROM t),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(dl) AS BIGINT) AS sum_dl,
        |  CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
        |  CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
        |  CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
        |FROM wtf),
        |scored AS (SELECT doc_id,
        |  ln(((CAST(n_docs AS DOUBLE) - df0 + 0.5) / (CAST(df0 AS DOUBLE) + 0.5)) + 1.0)
        |    * (CAST(tf0 AS DOUBLE) * (1.2 + 1.0))
        |    / (CAST(tf0 AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs))))
        |  + ln(((CAST(n_docs AS DOUBLE) - df1 + 0.5) / (CAST(df1 AS DOUBLE) + 0.5)) + 1.0)
        |    * (CAST(tf1 AS DOUBLE) * (1.2 + 1.0))
        |    / (CAST(tf1 AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs))))
        |  + ln(((CAST(n_docs AS DOUBLE) - df2 + 0.5) / (CAST(df2 AS DOUBLE) + 0.5)) + 1.0)
        |    * (CAST(tf2 AS DOUBLE) * (1.2 + 1.0))
        |    / (CAST(tf2 AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))) AS score
        |FROM wtf CROSS JOIN stats),
        |lex AS (SELECT doc_id AS item_id,
        |    row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rank
        |  FROM (SELECT * FROM scored ORDER BY score DESC, doc_id LIMIT 20) x
        |  WHERE score > 0),
        |c AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |      FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 1),
        |dscored AS (SELECT query_id, c.vec_id AS nn_id,
        |    round(list_dot_product(qv, v)
        |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) AS cos_sim
        |  FROM c CROSS JOIN q WHERE c.vec_id != query_id),
        |dense AS (SELECT nn_id AS item_id, rn AS rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY cos_sim DESC, nn_id) AS rn
        |  FROM dscored) t WHERE rn <= 20),
        |terms AS (
        |  SELECT item_id, CAST(round(1e6 / (60 + rank), 0) AS BIGINT) AS term_micro FROM lex
        |  UNION ALL
        |  SELECT item_id, CAST(round(1e6 / (60 + rank), 0) AS BIGINT) AS term_micro FROM dense),
        |fused AS (SELECT item_id, CAST(sum(term_micro) AS BIGINT) AS rrf_micro,
        |    CAST(count(*) AS BIGINT) AS n_lists
        |  FROM terms GROUP BY 1)
        |SELECT item_id, rrf_micro, n_lists, CAST(rank AS INTEGER) AS rank FROM (
        |  SELECT *, row_number() OVER (ORDER BY rrf_micro DESC, item_id) AS rank
        |  FROM fused) f WHERE rank <= 10""".stripMargin,

    // CCNet bucketing replay: the bigram-NLL pipeline (identical to
    // q_bigram_logprob) + per-source exact ntile(3) over the integer
    // (mean_nll_micro, doc_id) key.
    "q_ppl_buckets" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |bg AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
        |       FROM t, unnest(range(1, len(toks))) AS u(i)
        |       WHERE len(toks) >= 2),
        |counted AS (SELECT doc_id, w1, w2, count(*) AS cnt
        |            FROM bg GROUP BY 1, 2, 3),
        |bn AS (SELECT w1, w2, CAST(sum(cnt) AS BIGINT) AS bg_n
        |       FROM counted GROUP BY 1, 2),
        |pn AS (SELECT w1, CAST(sum(bg_n) AS BIGINT) AS w1_n FROM bn GROUP BY 1),
        |vv AS (SELECT count(DISTINCT token) AS v_size
        |       FROM (SELECT unnest(toks) AS token FROM t) x),
        |nllt AS (SELECT c.doc_id, c.cnt,
        |          CAST(ROUND(-ln(CAST(bn.bg_n + 1 AS DOUBLE)
        |            / (pn.w1_n + vv.v_size)) * 1e6, 0) AS BIGINT) AS nll_micro
        |        FROM counted c
        |        JOIN bn ON c.w1 = bn.w1 AND c.w2 = bn.w2
        |        JOIN pn ON c.w1 = pn.w1 CROSS JOIN vv),
        |docnll AS (SELECT doc_id,
        |    CAST(sum(nll_micro * cnt) AS BIGINT) // CAST(sum(cnt) AS BIGINT)
        |      AS mean_nll_micro
        |  FROM nllt GROUP BY doc_id),
        |ranked AS (SELECT d.doc_id, d.source, n.mean_nll_micro,
        |    CAST(ntile(3) OVER (PARTITION BY d.source
        |      ORDER BY n.mean_nll_micro, d.doc_id) AS INTEGER) AS bucket
        |  FROM documents d JOIN docnll n ON d.doc_id = n.doc_id)
        |SELECT doc_id, source, mean_nll_micro, bucket,
        |  CASE bucket WHEN 1 THEN 'head' WHEN 3 THEN 'tail'
        |       ELSE 'middle' END AS ppl_bucket
        |FROM ranked""".stripMargin,

    // Histogram-CDF bucketing replay (the zero-sort assignment path):
    // same bigram-NLL pipeline, then 0.01-nat cells, per-source
    // cumulative cell counts, ntile-rank targets j·(n div 3) +
    // least(j, n mod 3), cutoff = first cell reaching the target,
    // bucket = 1 + #cutoffs below the doc's cell. All-integer — the
    // hash match IS the determinism proof the GK sketch can't give.
    "q_ppl_buckets_approx" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |bg AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
        |       FROM t, unnest(range(1, len(toks))) AS u(i)
        |       WHERE len(toks) >= 2),
        |counted AS (SELECT doc_id, w1, w2, count(*) AS cnt
        |            FROM bg GROUP BY 1, 2, 3),
        |bn AS (SELECT w1, w2, CAST(sum(cnt) AS BIGINT) AS bg_n
        |       FROM counted GROUP BY 1, 2),
        |pn AS (SELECT w1, CAST(sum(bg_n) AS BIGINT) AS w1_n FROM bn GROUP BY 1),
        |vv AS (SELECT count(DISTINCT token) AS v_size
        |       FROM (SELECT unnest(toks) AS token FROM t) x),
        |nllt AS (SELECT c.doc_id, c.cnt,
        |          CAST(ROUND(-ln(CAST(bn.bg_n + 1 AS DOUBLE)
        |            / (pn.w1_n + vv.v_size)) * 1e6, 0) AS BIGINT) AS nll_micro
        |        FROM counted c
        |        JOIN bn ON c.w1 = bn.w1 AND c.w2 = bn.w2
        |        JOIN pn ON c.w1 = pn.w1 CROSS JOIN vv),
        |docnll AS (SELECT doc_id,
        |    CAST(sum(nll_micro * cnt) AS BIGINT) // CAST(sum(cnt) AS BIGINT)
        |      AS mean_nll_micro
        |  FROM nllt GROUP BY doc_id),
        |scored AS MATERIALIZED (SELECT d.doc_id, d.source, n.mean_nll_micro,
        |    n.mean_nll_micro // 10000 AS cell
        |  FROM documents d JOIN docnll n ON d.doc_id = n.doc_id),
        |hist AS MATERIALIZED (SELECT source, cell, count(*) AS cnt
        |  FROM scored GROUP BY 1, 2),
        |cdf AS (SELECT source, cell,
        |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY cell) AS BIGINT) AS cum
        |  FROM hist),
        |nsrc AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n FROM hist GROUP BY 1),
        |targets AS (SELECT source, j, j * (n // 3) + least(j, n % 3) AS target
        |  FROM nsrc, unnest([1, 2]) AS u(j)),
        |cuts AS (SELECT t.source, t.j, min(c.cell) AS cut
        |  FROM targets t JOIN cdf c ON c.source = t.source AND c.cum >= t.target
        |  GROUP BY 1, 2),
        |b AS (SELECT s.doc_id, s.source, s.mean_nll_micro,
        |    CAST(1 + sum(CASE WHEN c.cut < s.cell THEN 1 ELSE 0 END) AS INTEGER) AS bucket
        |  FROM scored s JOIN cuts c ON c.source = s.source
        |  GROUP BY 1, 2, 3)
        |SELECT doc_id, source, mean_nll_micro, bucket,
        |  CASE bucket WHEN 1 THEN 'head' WHEN 3 THEN 'tail'
        |       ELSE 'middle' END AS ppl_bucket
        |FROM b""".stripMargin,

    // DSIR replay: hashed-unigram bucket LMs for target (src0-src3)
    // and raw, add-one smoothing, per-bucket LLR micro-rounded BEFORE
    // the per-doc sum (order-free long arithmetic), portable-md5
    // Gumbel perturbation, top-100 by (score desc, id). ln and IEEE
    // division are the only float ops — both replay bit-identically.
    "q_dsir_sample" ->
      s"""WITH tok AS MATERIALIZED (SELECT doc_id,
        |    CAST(concat('0x', substr(md5('dsirb|' || t.token), 1, 15)) AS BIGINT) % 8192 AS bucket
        |  FROM (SELECT doc_id, unnest($toks) AS token FROM documents) t),
        |counted AS MATERIALIZED (SELECT doc_id, bucket, count(*) AS cnt
        |  FROM tok GROUP BY 1, 2),
        |rawlm AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS rc
        |  FROM counted GROUP BY 1),
        |tgtlm AS (SELECT bucket, count(*) AS tc FROM (
        |    SELECT CAST(concat('0x', substr(md5('dsirb|' || t.token), 1, 15)) AS BIGINT) % 8192 AS bucket
        |    FROM (SELECT unnest($toks) AS token FROM documents
        |          WHERE source IN ('src0', 'src1', 'src2', 'src3')) t)
        |  GROUP BY 1),
        |rt AS (SELECT COALESCE(CAST(sum(rc) AS BIGINT), 0) AS rn FROM rawlm),
        |tt AS (SELECT COALESCE(CAST(sum(tc) AS BIGINT), 0) AS tn FROM tgtlm),
        |bl AS (SELECT bucket,
        |    CAST(round((ln(CAST(COALESCE(tc, 0) + 1 AS DOUBLE) / (tn + 8192))
        |              - ln(CAST(rc + 1 AS DOUBLE) / (rn + 8192))) * 1e6, 0)
        |      AS BIGINT) AS llr_micro
        |  FROM rawlm LEFT JOIN tgtlm USING (bucket) CROSS JOIN rt CROSS JOIN tt),
        |sc AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |    CAST(sum(cnt * llr_micro) AS BIGINT) AS llr_micro
        |  FROM counted JOIN bl USING (bucket) GROUP BY 1)
        |SELECT doc_id, n_tokens, llr_micro,
        |  llr_micro + CAST(round(-ln(-ln(
        |    (CAST(concat('0x', substr(md5('dsir|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 0.5)
        |    / 1152921504606846976.0)) * 1e6, 0) AS BIGINT) AS score_micro
        |FROM sc ORDER BY score_micro DESC, doc_id LIMIT 100""".stripMargin,

    // Batched-greedy BPE replay (3 merges): per round take the top
    // `remaining` pairs by (cnt desc, a, b), greedily keep the
    // pairwise-disjoint prefix-subset (used-set = each keep's symbols
    // + its merged token), apply the batch in selection order, and
    // re-count. Worst case 3 rounds (all conflicts), best 1 (all
    // disjoint); the unrolled SQL covers every case — a round whose
    // quota is exhausted ranks zero rows and its replaces no-op on a
    // chr(1) pattern. CTEs are MATERIALIZED: the scalar subqueries
    // fan out multiplicatively otherwise (each replace() argument
    // would re-evaluate the whole upstream chain).
    "q_bpe_train" ->
      """WITH s0 AS MATERIALIZED (SELECT trim(regexp_replace(replace(lower(text), ' ', '_'),
        |                        '(.)', '\1 ', 'g')) AS s FROM documents),
        |p1 AS MATERIALIZED (SELECT arr[j] AS a, arr[j+1] AS b, count(*) AS cnt
        |       FROM (SELECT string_split(s, ' ') AS arr FROM s0) t,
        |            unnest(range(1, len(arr))) AS u(j)
        |       GROUP BY 1, 2),
        |t1 AS MATERIALIZED (SELECT a, b, CAST(cnt AS BIGINT) AS cnt,
        |         row_number() OVER (ORDER BY cnt DESC, a, b) AS rn
        |       FROM p1 QUALIFY rn <= 3),
        |g1 AS MATERIALIZED (SELECT
        |    (SELECT a FROM t1 WHERE rn = 1) AS a1,
        |    (SELECT b FROM t1 WHERE rn = 1) AS b1,
        |    (SELECT cnt FROM t1 WHERE rn = 1) AS c1,
        |    (SELECT a FROM t1 WHERE rn = 2) AS a2,
        |    (SELECT b FROM t1 WHERE rn = 2) AS b2,
        |    (SELECT cnt FROM t1 WHERE rn = 2) AS c2,
        |    (SELECT a FROM t1 WHERE rn = 3) AS a3,
        |    (SELECT b FROM t1 WHERE rn = 3) AS b3,
        |    (SELECT cnt FROM t1 WHERE rn = 3) AS c3),
        |f1 AS MATERIALIZED (SELECT *,
        |    (a2 IS NOT NULL AND a2 NOT IN (a1, b1, a1||b1)
        |                    AND b2 NOT IN (a1, b1, a1||b1)) AS s2,
        |    (a3 IS NOT NULL AND a3 NOT IN (a1, b1, a1||b1)
        |                    AND b3 NOT IN (a1, b1, a1||b1)
        |     AND (NOT (a2 IS NOT NULL AND a2 NOT IN (a1, b1, a1||b1)
        |                               AND b2 NOT IN (a1, b1, a1||b1))
        |          OR (a3 NOT IN (a2, b2, a2||b2) AND b3 NOT IN (a2, b2, a2||b2))))
        |      AS s3
        |  FROM g1),
        |r1 AS MATERIALIZED (SELECT *,
        |    1 + CAST(s2 AS INTEGER) + CAST(s3 AS INTEGER) AS n1 FROM f1),
        |s1 AS MATERIALIZED (SELECT replace(replace(replace(s,
        |         (SELECT a1 || ' ' || b1 FROM r1), (SELECT a1 || b1 FROM r1)),
        |         COALESCE((SELECT CASE WHEN s2 THEN a2 || ' ' || b2 END FROM r1), chr(1)),
        |         COALESCE((SELECT CASE WHEN s2 THEN a2 || b2 END FROM r1), '')),
        |         COALESCE((SELECT CASE WHEN s3 THEN a3 || ' ' || b3 END FROM r1), chr(1)),
        |         COALESCE((SELECT CASE WHEN s3 THEN a3 || b3 END FROM r1), '')) AS s
        |       FROM s0),
        |p2 AS MATERIALIZED (SELECT arr[j] AS a, arr[j+1] AS b, count(*) AS cnt
        |       FROM (SELECT string_split(s, ' ') AS arr FROM s1) t,
        |            unnest(range(1, len(arr))) AS u(j)
        |       GROUP BY 1, 2),
        |t2 AS MATERIALIZED (SELECT a, b, CAST(cnt AS BIGINT) AS cnt,
        |         row_number() OVER (ORDER BY cnt DESC, a, b) AS rn
        |       FROM p2 QUALIFY rn <= 3 - (SELECT n1 FROM r1)),
        |g2 AS MATERIALIZED (SELECT
        |    (SELECT a FROM t2 WHERE rn = 1) AS a1,
        |    (SELECT b FROM t2 WHERE rn = 1) AS b1,
        |    (SELECT cnt FROM t2 WHERE rn = 1) AS c1,
        |    (SELECT a FROM t2 WHERE rn = 2) AS a2,
        |    (SELECT b FROM t2 WHERE rn = 2) AS b2,
        |    (SELECT cnt FROM t2 WHERE rn = 2) AS c2),
        |f2 AS MATERIALIZED (SELECT *,
        |    (a2 IS NOT NULL AND a2 NOT IN (a1, b1, a1||b1)
        |                    AND b2 NOT IN (a1, b1, a1||b1)) AS s2
        |  FROM g2),
        |r2 AS MATERIALIZED (SELECT *,
        |    CAST(a1 IS NOT NULL AS INTEGER) + CAST(s2 AS INTEGER) AS n2 FROM f2),
        |s2c AS MATERIALIZED (SELECT replace(replace(s,
        |         COALESCE((SELECT a1 || ' ' || b1 FROM r2), chr(1)),
        |         COALESCE((SELECT a1 || b1 FROM r2), '')),
        |         COALESCE((SELECT CASE WHEN s2 THEN a2 || ' ' || b2 END FROM r2), chr(1)),
        |         COALESCE((SELECT CASE WHEN s2 THEN a2 || b2 END FROM r2), '')) AS s
        |       FROM s1),
        |p3 AS MATERIALIZED (SELECT arr[j] AS a, arr[j+1] AS b, count(*) AS cnt
        |       FROM (SELECT string_split(s, ' ') AS arr FROM s2c) t,
        |            unnest(range(1, len(arr))) AS u(j)
        |       GROUP BY 1, 2),
        |t3 AS MATERIALIZED (SELECT a, b, CAST(cnt AS BIGINT) AS cnt,
        |         row_number() OVER (ORDER BY cnt DESC, a, b) AS rn
        |       FROM p3
        |       QUALIFY rn <= 3 - (SELECT n1 FROM r1) - (SELECT n2 FROM r2)),
        |sel AS (
        |  SELECT 1 AS ord, a1 AS a, b1 AS b, c1 AS cnt FROM r1
        |  UNION ALL SELECT 2, a2, b2, c2 FROM r1 WHERE s2
        |  UNION ALL SELECT 3, a3, b3, c3 FROM r1 WHERE s3
        |  UNION ALL SELECT 4, a1, b1, c1 FROM r2 WHERE a1 IS NOT NULL
        |  UNION ALL SELECT 5, a2, b2, c2 FROM r2 WHERE s2
        |  UNION ALL SELECT 6, a, b, cnt FROM t3 WHERE rn = 1)
        |SELECT CAST(row_number() OVER (ORDER BY ord) AS INTEGER) AS step, a, b, cnt
        |FROM sel""".stripMargin,

    // CUSUM level-shift: mean-cleared scaled-integer cumulative sum
    // (S'_t = Σ N·x_i − T = N·S_t, argmax-preserving), peak flagged.
    "q_cusum" ->
      """WITH s AS (SELECT CAST(ts AS DATE) AS d, count(*) AS n
        |  FROM events GROUP BY 1),
        |tot AS (SELECT sum(n) AS t, count(*) AS nd FROM s),
        |cum AS (SELECT d, n,
        |    sum(nd * n - t) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cusum_scaled
        |  FROM s CROSS JOIN tot)
        |SELECT d, CAST(n AS BIGINT) AS n,
        |  CAST(cusum_scaled AS BIGINT) AS cusum_scaled,
        |  abs(cusum_scaled) = (SELECT max(abs(cusum_scaled)) FROM cum)
        |    AS is_peak
        |FROM cum""".stripMargin,

    // autocorrelation lags 1..7: exact-long numerator/denominator in
    // mean-cleared scaled residuals r_t = N·x_t − T (N² cancels).
    "q_acf" ->
      """WITH s AS (SELECT CAST(ts AS DATE) AS d, count(*) AS n
        |  FROM events GROUP BY 1),
        |idxd AS (SELECT d, CAST(d - (SELECT min(d) FROM s) AS INTEGER) AS idx, n
        |         FROM s),
        |tot AS (SELECT sum(n) AS t, count(*) AS nd FROM s),
        |r AS (SELECT idx, nd * n - t AS r FROM idxd CROSS JOIN tot),
        |den AS (SELECT sum(r * r) AS den FROM r),
        |lags AS (SELECT CAST(unnest(range(1, 8)) AS INTEGER) AS lag)
        |SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(ROUND(CAST(sum(a.r * b.r) AS DOUBLE)
        |             / (SELECT den FROM den) * 1e6, 0) AS BIGINT)
        |    AS acf_micro
        |FROM r a CROSS JOIN lags JOIN r b ON b.idx = a.idx + lag
        |GROUP BY lag""".stripMargin,

    // Ljung–Box: rho_k from the hash-matched acf_micro contract,
    // per-lag terms nano-rounded pre-sum, one Q expression.
    "q_ljung_box" ->
      """WITH s AS (SELECT CAST(ts AS DATE) AS d, count(*) AS n
        |  FROM events GROUP BY 1),
        |idxd AS (SELECT d, CAST(d - (SELECT min(d) FROM s) AS INTEGER) AS idx, n
        |         FROM s),
        |tot AS (SELECT sum(n) AS t, count(*) AS nd FROM s),
        |r AS (SELECT idx, nd * n - t AS r FROM idxd CROSS JOIN tot),
        |den AS (SELECT sum(r * r) AS den FROM r),
        |lags AS (SELECT CAST(unnest(range(1, 8)) AS INTEGER) AS lag),
        |ac AS (SELECT lag,
        |    CAST(ROUND(CAST(sum(a.r * b.r) AS DOUBLE)
        |               / (SELECT den FROM den) * 1e6, 0) AS BIGINT)
        |      AS acf_micro
        |  FROM r a CROSS JOIN lags JOIN r b ON b.idx = a.idx + lag
        |  GROUP BY lag),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM s),
        |terms AS (SELECT n_days,
        |    CAST(round((CAST(acf_micro AS DOUBLE) / 1e6)
        |      * (CAST(acf_micro AS DOUBLE) / 1e6)
        |      / (CAST(n_days AS DOUBLE) - CAST(lag AS DOUBLE)) * 1e9, 0)
        |      AS BIGINT) AS term_nano
        |  FROM ac CROSS JOIN nd)
        |SELECT CAST(count(*) AS BIGINT) AS m_lags,
        |  coalesce(max(n_days), 0) AS n_days,
        |  CAST(count(*) AS BIGINT) AS dof,
        |  round(CASE WHEN count(*) = 0 THEN 0.0
        |    ELSE CAST(max(n_days) AS DOUBLE)
        |      * (CAST(max(n_days) AS DOUBLE) + 2.0)
        |      * CAST(sum(term_nano) AS DOUBLE) / 1e9 END, 6) AS q_stat
        |FROM terms""".stripMargin,

    // Hurst R/S: per-block rescaled ranges from mean-cleared scaled
    // residuals, micro-rounded pre-average; ln(w) constants from the
    // SAME Scala list as the engine call; slope from exact co-moment
    // longs.
    "q_hurst" -> {
      val vals = ExtQueries.hurstWindows.map(w =>
        s"(CAST($w AS BIGINT), " +
          s"CAST(${math.round(math.log(w.toDouble) * 1e6)} AS BIGINT))")
        .mkString(", ")
      s"""WITH s AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
        |idxd AS (SELECT d, CAST(d - (SELECT min(d) FROM s) AS BIGINT)
        |    AS idx, n FROM s),
        |wt(w, lnw_micro) AS (VALUES $vals),
        |blocks AS (SELECT w, lnw_micro, idx, n, idx // w AS blk
        |  FROM idxd CROSS JOIN wt),
        |bt AS (SELECT w, blk, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(n) AS BIGINT) AS t
        |  FROM blocks GROUP BY 1, 2 HAVING count(*) = w),
        |r AS (SELECT b.w, b.lnw_micro, b.blk, b.idx, b.w * b.n - bt.t AS r
        |  FROM blocks b JOIN bt ON bt.w = b.w AND bt.blk = b.blk),
        |cum AS (SELECT w, lnw_micro, blk, idx, r,
        |    CAST(sum(r) OVER (PARTITION BY w, blk ORDER BY idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS z
        |  FROM r),
        |pb AS (SELECT w, lnw_micro,
        |    CASE WHEN sum(r * r) > 0 THEN
        |      CAST(round(CAST(max(z) - min(z) AS DOUBLE)
        |        * sqrt(CAST(w AS DOUBLE)) / sqrt(CAST(sum(r * r) AS DOUBLE))
        |        * 1e6, 0) AS BIGINT) END AS rs_micro
        |  FROM cum GROUP BY w, lnw_micro, blk),
        |pw AS (SELECT w, lnw_micro,
        |    CAST(count(rs_micro) AS BIGINT) AS n_blocks,
        |    CAST(sum(rs_micro) AS BIGINT) AS sum_rs
        |  FROM pb GROUP BY 1, 2),
        |pw2 AS (SELECT w, lnw_micro, n_blocks,
        |    CASE WHEN n_blocks > 0 AND sum_rs > 0 THEN
        |      CAST(sum_rs AS DOUBLE) / CAST(n_blocks AS DOUBLE) / 1e6
        |    END AS avg_rs
        |  FROM pw),
        |pw3 AS (SELECT w, lnw_micro, n_blocks, avg_rs,
        |    CASE WHEN avg_rs IS NOT NULL THEN
        |      CAST(round(ln(avg_rs) * 1e6, 0) AS BIGINT) END AS lnrs_micro
        |  FROM pw2),
        |pts AS (SELECT CAST(count(*) AS BIGINT) AS np,
        |    CAST(sum(lnw_micro) AS BIGINT) AS su,
        |    CAST(sum(lnrs_micro) AS BIGINT) AS sv,
        |    CAST(sum(lnw_micro * lnw_micro) AS BIGINT) AS suu,
        |    CAST(sum(lnw_micro * lnrs_micro) AS BIGINT) AS suv
        |  FROM pw3 WHERE lnrs_micro IS NOT NULL),
        |h AS (SELECT round(CASE WHEN np < 2
        |      OR np * suu - su * su = 0 THEN 0.0
        |    ELSE CAST(np * suv - su * sv AS DOUBLE)
        |      / CAST(np * suu - su * su AS DOUBLE) END, 6) AS hurst
        |  FROM pts)
        |SELECT w AS wsize, n_blocks, round(COALESCE(avg_rs, 0.0), 6)
        |    AS avg_rs, hurst
        |FROM pw3 CROSS JOIN h""".stripMargin
    },

    // Fisher dispersion: per-series (n, Σx, Σx²) longs, VMR and D as
    // single divisions. Densified per series across its observed
    // [min d, max d] span — zero-event days enter as x = 0 (the
    // engine contract; a zero-truncated series biases VMR/D).
    "q_dispersion_test" ->
      """WITH s0 AS (SELECT event_type AS series, CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        |span AS (SELECT series, min(d) AS d0, max(d) AS d1
        |  FROM s0 GROUP BY 1),
        |dense AS (SELECT series,
        |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM span),
        |s AS (SELECT dense.series, dense.d,
        |    COALESCE(s0.x, CAST(0 AS BIGINT)) AS x
        |  FROM dense LEFT JOIN s0
        |    ON s0.series = dense.series AND s0.d = dense.d),
        |ag AS (SELECT series, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(x) AS BIGINT) AS t,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM s GROUP BY 1)
        |SELECT series, n_days,
        |  round(CASE WHEN n_days = 0 THEN 0.0
        |    ELSE CAST(t AS DOUBLE) / CAST(n_days AS DOUBLE) END, 6) AS mean,
        |  round(CASE WHEN n_days < 2 OR t = 0 THEN 0.0
        |    ELSE CAST(n_days * sxx - t * t AS DOUBLE)
        |      / ((CAST(n_days AS DOUBLE) - 1.0) * CAST(t AS DOUBLE))
        |    END, 6) AS vmr,
        |  round(CASE WHEN n_days < 2 OR t = 0 THEN 0.0
        |    ELSE CAST(n_days * sxx - t * t AS DOUBLE) / CAST(t AS DOUBLE)
        |    END, 6) AS d_stat,
        |  greatest(n_days - 1, 0) AS dof
        |FROM ag""".stripMargin,

    // EWMA α=1/2 over an 8-day tail: power-of-two weights keep
    // num/den exact longs; edges renormalize over existing lags.
    "q_ewma" ->
      """WITH s AS (SELECT CAST(ts AS DATE) AS d, count(*) AS n
        |  FROM events GROUP BY 1),
        |idxd AS (SELECT d, CAST(d - (SELECT min(d) FROM s) AS INTEGER) AS idx, n
        |         FROM s),
        |lags AS (SELECT CAST(unnest(range(0, 8)) AS INTEGER) AS lag,
        |                CAST(power(2, 7 - unnest(range(0, 8))) AS BIGINT) AS w)
        |SELECT a.d, CAST(a.n AS BIGINT) AS n,
        |  CAST(ROUND(CAST(sum(b.n * w) AS DOUBLE) / sum(w) * 1e6, 0) AS BIGINT)
        |    AS ewma_micro
        |FROM idxd a CROSS JOIN lags
        |JOIN idxd b ON b.idx = a.idx - lag
        |GROUP BY a.d, a.n""".stripMargin,

    // MATCH_RECOGNIZE-lite: per-user event-initial string in
    // (µs-truncated ts, event_id) order, then regex pattern counts.
    // 'v[^p]*p' cannot cross a purchase, so RE2 (here) and Java regex
    // (Spark) agree on the non-overlapping match count.
    "q_seq_pattern" ->
      """WITH e AS (SELECT user_id, event_id,
        |    CAST(ts AS TIMESTAMP) AS ts, substr(event_type, 1, 1) AS c
        |  FROM events),
        |seqs AS (SELECT user_id,
        |    string_agg(c, '' ORDER BY ts, event_id) AS seq
        |  FROM e GROUP BY 1)
        |SELECT user_id, CAST(length(seq) AS BIGINT) AS n_events,
        |  CAST(len(regexp_extract_all(seq, 'v[^p]*p')) AS BIGINT)
        |    AS n_view_to_purchase,
        |  regexp_matches(seq, 's.*v.*p') AS has_funnel
        |FROM seqs""".stripMargin,

    // blocklist screen: multi-substring match ≡ per-term contains()
    // at oracle scale; matched list in pattern-list order. Terms come
    // from the shared ExtQueries.BlocklistTerms Seq.
    "q_blocklist_filter" ->
      s"""WITH terms(term_idx, term) AS (VALUES ${
        ExtQueries.BlocklistTerms.zipWithIndex
          .map { case (t, i) => s"($i, '$t')" }.mkString(", ")}),
        |t AS (SELECT doc_id, lower(text) AS lt FROM documents),
        |m AS (SELECT t.doc_id, tr.term_idx, tr.term
        |      FROM t JOIN terms tr ON contains(t.lt, tr.term)),
        |agg AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_matches,
        |        string_agg(term, ',' ORDER BY term_idx) AS matched_csv
        |        FROM m GROUP BY doc_id)
        |SELECT t.doc_id, COALESCE(a.n_matches, 0) AS n_matches,
        |  COALESCE(a.matched_csv, '') AS matched_csv,
        |  a.doc_id IS NULL AS keep
        |FROM t LEFT JOIN agg a ON t.doc_id = a.doc_id""".stripMargin,

    // JL project-then-rerank: the q_sim_near_dup plane generator (8
    // planes), reduced-space shortlist of 40 by (rounded cos desc,
    // nn_id), exact full-width rerank to top 10 — both rankings
    // replayed with the same tie-break the bounded heap uses
    "q_sim_jl_rerank" ->
      """WITH s AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |pc AS (SELECT j, i,
        |         2 * (CAST(concat('0x', substr(md5(CAST(j AS VARCHAR) || '|' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT)
        |              / pow(2, 60)) - 1 AS c
        |       FROM (SELECT unnest(range(0, 8)) AS j) a
        |       CROSS JOIN (SELECT unnest(range(0, 64)) AS i) b),
        |planes AS (SELECT j, list(c ORDER BY i) AS plane FROM pc GROUP BY j),
        |red AS (SELECT s.vec_id, list(list_dot_product(s.v, p.plane) ORDER BY p.j) AS rv
        |        FROM s CROSS JOIN planes p GROUP BY s.vec_id),
        |redq AS (SELECT vec_id AS query_id, rv AS qv FROM red WHERE vec_id < 5),
        |scored_r AS (SELECT query_id, red.vec_id AS nn_id,
        |    round(list_dot_product(qv, rv)
        |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(rv, rv))), 6) AS cs
        |  FROM red CROSS JOIN redq WHERE red.vec_id != query_id),
        |cand AS (SELECT query_id, nn_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY cs DESC, nn_id) AS srn
        |    FROM scored_r) t WHERE srn <= 40),
        |rescored AS (SELECT c.query_id, c.nn_id,
        |    round(list_dot_product(q.v, n.v)
        |      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(n.v, n.v))), 6) AS cos_sim
        |  FROM cand c JOIN s q ON q.vec_id = c.query_id
        |  JOIN s n ON n.vec_id = c.nn_id)
        |SELECT query_id, nn_id, cos_sim, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY cos_sim DESC, nn_id) AS rn
        |  FROM rescored) t WHERE rn <= 10""".stripMargin,

    // Poisson bootstrap: the 60-bit pre-scaled Poisson(1) thresholds
    // come from the shared Bootstrap.thresholds60 Seq; replicate
    // means are exact (num*1000)//den; CI = fixed order statistics
    "q_bootstrap_ci" ->
      s"""WITH t AS (SELECT event_type AS g,
        |    CAST(round(value * 100, 0) AS BIGINT) AS v,
        |    CAST(event_id AS VARCHAR) AS id FROM events),
        |point AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    (CAST(sum(v) AS BIGINT) * 1000) // CAST(count(*) AS BIGINT)
        |      AS point_milli FROM t GROUP BY 1),
        |h AS (SELECT g, v,
        |    CAST(concat('0x', substr(md5('bs|' || id), 1, 15)) AS BIGINT) AS h1,
        |    CAST(concat('0x', substr(md5('bs|' || id), 16, 15)) AS BIGINT)
        |      % 9007199254740992 AS h2b FROM t),
        |r AS (SELECT g, v, h1, h2b, unnest(range(0, 50)) AS b FROM h),
        |u AS (SELECT g, v, b,
        |    (h1 + b * h2b) % 1152921504606846976 AS hv FROM r),
        |w AS (SELECT g, v, b,
        |    len(list_filter([${graft.ext.Bootstrap.thresholds60.mkString(", ")}],
        |      x -> hv >= x)) AS w FROM u),
        |m AS (SELECT g, b, CAST(sum(w * v) AS BIGINT) AS num,
        |    CAST(sum(w) AS BIGINT) AS den FROM w GROUP BY 1, 2),
        |mm AS (SELECT g, b, (num * 1000) // den AS mean_milli
        |       FROM m WHERE den > 0),
        |rk AS (SELECT g, b, mean_milli, row_number() OVER (
        |    PARTITION BY g ORDER BY mean_milli, b) AS rn FROM mm)
        |SELECT p.g AS event_type, p.n, p.point_milli,
        |  lo.mean_milli AS lo_milli, hi.mean_milli AS hi_milli
        |FROM point p
        |JOIN rk lo ON lo.g = p.g AND lo.rn = 2
        |JOIN rk hi ON hi.g = p.g AND hi.rn = 49""".stripMargin,

    // seasonal anomalies: per-weekday exact-long moments, one double
    // division+sqrt micro-rounded (DuckDB dayofweek is 0-based Sunday,
    // Spark's is 1-based — hence the +1)
    "q_seasonal_anomaly" ->
      """WITH s AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
        |w AS (SELECT d, n, dayofweek(d) + 1 AS dow FROM s),
        |st AS (SELECT dow, CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(n) AS BIGINT) AS t, CAST(sum(n * n) AS BIGINT) AS t2
        |  FROM w GROUP BY 1),
        |z AS (SELECT w.d, w.n, w.dow,
        |    CASE WHEN c * t2 - t * t > 0
        |      THEN CAST(round(CAST(c * n - t AS DOUBLE)
        |             / sqrt(CAST(c * t2 - t * t AS DOUBLE)) * 1e6, 0) AS BIGINT)
        |      ELSE 0 END AS z_micro
        |  FROM w JOIN st USING (dow))
        |SELECT d, n, CAST(dow AS INTEGER) AS dow, z_micro,
        |  abs(z_micro) >= 2000000 AS is_anomaly
        |FROM z""".stripMargin,

    // HTML main-content: replant the identical pages; tag-strip with
    // the 'g' flag, entity decode, per-block anchor-char sum, and the
    // division-free cross-multiplied density gate
    "q_html_extract" ->
      """WITH h AS (SELECT doc_id,
        |  '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
        |  '</title></head><body>' ||
        |  '<nav><a href="/">Home</a> <a href="/about">About us</a></nav>' ||
        |  '<p>' || substr(text, 1, 120) || '</p>' ||
        |  (CASE WHEN doc_id % 3 = 0
        |    THEN '<div class="ad"><a href="/buy">Buy now great deal</a> <a href="/win">Click here</a></div>'
        |    ELSE '' END) ||
        |  '<p>' || substr(text, 121, 4000) || ' &amp; tail</p>' ||
        |  '<footer><a href="/tos">Terms</a> <a href="/priv">Privacy</a></footer>' ||
        |  '</body></html>' AS html FROM documents),
        |sel AS (SELECT doc_id,
        |  regexp_extract_all(html,
        |    '<(?:p|div|nav|footer|li|h1)[^>]*>.*?</(?:p|div|nav|footer|li|h1)>', 0)
        |    AS blks FROM h)
        |SELECT doc_id, CAST(len(blks) AS INTEGER) AS n_blocks,
        |  CAST(len(kept) AS INTEGER) AS n_kept,
        |  array_to_string(kept, chr(10)) AS main_text
        |FROM (SELECT doc_id, blks,
        |  list_transform(list_filter(blks, bb ->
        |    length(replace(replace(replace(replace(trim(
        |      regexp_replace(bb, '<[^>]*>', '', 'g')),
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&amp;', '&')) >= 10
        |    AND COALESCE(list_sum(list_transform(
        |          regexp_extract_all(bb, '<a [^>]*>([^<]*)</a>', 1),
        |          a -> length(a))), 0) * 1000000
        |        < 500000 * length(replace(replace(replace(replace(trim(
        |            regexp_replace(bb, '<[^>]*>', '', 'g')),
        |            '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&amp;', '&'))),
        |    bb -> replace(replace(replace(replace(trim(
        |      regexp_replace(bb, '<[^>]*>', '', 'g')),
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&amp;', '&')) AS kept
        |  FROM sel) x""".stripMargin,

    // URL canonicalization: replant the synthetic URLs, replay every
    // rule (authority lowering, fragment cut, default-port cut,
    // tracking-param filter + sort, registered-domain suffix cut)
    "q_url_canonicalize" ->
      """WITH u AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://' ELSE 'http://' END) ||
        |  (CASE WHEN doc_id % 4 = 0 THEN 'WWW.' ELSE '' END) ||
        |  'Site' || CAST(doc_id % 7 AS VARCHAR) ||
        |  (CASE WHEN doc_id % 5 = 0 THEN '.co.uk' ELSE '.example.com' END) ||
        |  (CASE WHEN doc_id % 3 = 0 THEN ':443'
        |        WHEN doc_id % 3 = 1 THEN ':80' ELSE '' END) ||
        |  '/Path/' || CAST(doc_id % 11 AS VARCHAR) ||
        |  (CASE doc_id % 4 WHEN 0 THEN '?utm_source=x&b=2&a=1'
        |        WHEN 1 THEN '?a=1&fbclid=zz'
        |        WHEN 2 THEN '?z=9' ELSE '' END) ||
        |  (CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END) AS url
        |  FROM documents),
        |low AS (SELECT doc_id, url,
        |  lower(regexp_extract(url, '^([^:/?#]+://[^/?#]*)', 1)) ||
        |  regexp_replace(url, '^[^:/?#]+://[^/?#]*', '') AS lu FROM u),
        |nf AS (SELECT doc_id, url, regexp_replace(lu, '#.*$', '') AS v FROM low),
        |np AS (SELECT doc_id, url,
        |  regexp_replace(regexp_replace(v,
        |    '^(https://[^/:?#]+):443([/?#].*)?$', '\1\2'),
        |    '^(http://[^/:?#]+):80([/?#].*)?$', '\1\2') AS v FROM nf),
        |q AS (SELECT doc_id, url, v,
        |  regexp_extract(v, '\?(.*)$', 1) AS qs FROM np),
        |k AS (SELECT doc_id, url, v,
        |  list_sort(list_filter(string_split(qs, '&'), p ->
        |    p != '' AND NOT regexp_matches(p,
        |      '^(utm_[^=]*|fbclid|gclid|ref)='))) AS kept FROM q),
        |c AS (SELECT doc_id, url,
        |  regexp_replace(v, '\?.*$', '') ||
        |  (CASE WHEN len(kept) > 0
        |        THEN '?' || array_to_string(kept, '&') ELSE '' END)
        |    AS canon_url FROM k),
        |d AS (SELECT doc_id, url, canon_url,
        |  regexp_replace(regexp_extract(canon_url,
        |    '^[^:/?#]+://([^/:?#]+)', 1), '^www\.', '') AS host FROM c),
        |s AS (SELECT *, string_split(host, '.') AS labels FROM d)
        |SELECT doc_id, url, canon_url,
        |  CASE WHEN host LIKE '%.co.uk' OR host LIKE '%.com.au'
        |            OR host LIKE '%.co.jp'
        |    THEN array_to_string(list_slice(labels, len(labels)-2, len(labels)), '.')
        |    ELSE array_to_string(list_slice(labels,
        |           greatest(len(labels)-1, 1), len(labels)), '.') END AS domain,
        |  url != canon_url AS changed
        |FROM s""".stripMargin,

    // Misra–Gries at never-evicting capacity ≡ exact per-source token
    // counts, (cnt desc, token asc) order — same tie-break eval() uses
    "q_freq_items" ->
      s"""WITH t AS (SELECT source, unnest($toks) AS tok FROM documents),
        |c AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
        |      FROM t GROUP BY 1, 2)
        |SELECT source, CAST(rn AS INTEGER) AS rn, tok AS token, cnt FROM (
        |  SELECT *, row_number() OVER (PARTITION BY source
        |                               ORDER BY cnt DESC, tok) AS rn
        |  FROM c) x WHERE rn <= 10""".stripMargin
  )

  // The disk-index twins answer identically to their in-memory forms
  // by construction (same reference slice, same probe batch); the
  // on-disk layout changes I/O, never answers — so each reuses its
  // twin's one-shot replay verbatim.
  /** q_maxsim_topk: token slices and per-token norms once per row,
    * per-pair score = Σ_i greatest_j cos(q_i, d_j) with zero-norm
    * tokens scoring 0 — generated from the SAME (nTokens, tokenDim)
    * grid constants the Spark query uses, so query and oracle cannot
    * desynchronize. Fixed-order arithmetic: greatest over identical
    * IEEE doubles, left-associative i-sum, one round(…, 6). */
  private val maxsimSql: String = {
    val n = ExtQueries.maxsimTokens
    val td = ExtQueries.maxsimTokenDim
    val tokCols = (0 until n).map { i =>
      val a = i * td + 1; val b = (i + 1) * td
      s"v[$a:$b] AS t$i,\n    sqrt(list_dot_product(v[$a:$b], v[$a:$b])) AS n$i"
    }.mkString(",\n    ")
    val qCols = (0 until n).map(i => s"t$i AS qt$i, n$i AS qn$i").mkString(", ")
    val sumTerms = (0 until n).map { i =>
      val inner = (0 until n).map { j =>
        s"CASE WHEN q.qn$i * t.n$j = 0 THEN 0.0\n      " +
          s"ELSE list_dot_product(q.qt$i, t.t$j) / (q.qn$i * t.n$j) END"
      }.mkString(",\n      ")
      s"greatest($inner)"
    }.mkString("\n    + ")
    s"""WITH c AS (SELECT vec_id,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
tok AS (SELECT vec_id,
    $tokCols
  FROM c),
q AS (SELECT vec_id AS query_id, $qCols
      FROM tok WHERE vec_id < 5),
scored AS (SELECT q.query_id, t.vec_id AS nn_id,
    round($sumTerms, 6) AS maxsim
  FROM tok t CROSS JOIN q WHERE t.vec_id != q.query_id)
SELECT query_id, nn_id, maxsim, CAST(rn AS INTEGER) AS rn FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY maxsim DESC, nn_id) AS rn
  FROM scored) x WHERE rn <= 10"""
  }

  /** q_bradley_terry: duels → Laplace-smoothed ordered-pair counts →
    * `btIters` unrolled MM rounds. Every per-item sum is over
    * pre-rounded nano longs (order-free); the two divisions per
    * round are single fixed-shape IEEE expressions with
    * exactly-representable 1e15 scale constants, and round(x, 0)
    * yields an integer-valued double that casts identically in both
    * engines (Spark truncates, DuckDB rounds — both identity on
    * whole numbers). */
  private val bradleyTerrySql: String = {
    val iters = (1 to ExtQueries.btIters).map { t =>
      val pw = if (t == 1) "w0" else s"w${t - 1}"
      s"""d$t AS MATERIALIZED (SELECT m.i,
    CAST(sum(CAST(round(CAST(m.m AS DOUBLE) * 1e15 /
      CAST(wi.w + wj.w AS DOUBLE), 0) AS BIGINT)) AS BIGINT) AS dn
  FROM m JOIN $pw wi ON wi.item = m.i JOIN $pw wj ON wj.item = m.j
  GROUP BY 1),
w$t AS MATERIALIZED (SELECT d$t.i AS item,
    CAST(round(CAST(wt.w_total AS DOUBLE) * 1e15 /
      CAST(d$t.dn AS DOUBLE), 0) AS BIGINT) AS w
  FROM d$t JOIN wt ON wt.i = d$t.i)"""
    }.mkString(",\n")
    s"""WITH l1 AS MATERIALIZED (SELECT l_orderkey AS ok, l_partkey AS pk, l_extendedprice AS ep
      FROM lineitem WHERE l_linenumber = 1),
l2 AS MATERIALIZED (SELECT l_orderkey AS ok, l_partkey AS pk, l_extendedprice AS ep
      FROM lineitem WHERE l_linenumber = 2),
duel AS MATERIALIZED (SELECT
    CASE WHEN a.ep > b.ep THEN ba.p_brand ELSE bb.p_brand END AS i,
    CASE WHEN a.ep > b.ep THEN bb.p_brand ELSE ba.p_brand END AS j
  FROM l1 a JOIN l2 b ON a.ok = b.ok
  JOIN part ba ON ba.p_partkey = a.pk
  JOIN part bb ON bb.p_partkey = b.pk
  WHERE a.ep != b.ep AND ba.p_brand != bb.p_brand),
wins AS MATERIALIZED (SELECT i, j, count(*) AS n_raw FROM duel GROUP BY 1, 2),
items AS MATERIALIZED (SELECT DISTINCT u.i AS item
  FROM (SELECT i FROM wins UNION ALL SELECT j FROM wins) u(i)),
pairs AS MATERIALIZED (SELECT a.item AS i, b.item AS j,
    CAST(COALESCE(w.n_raw, 0) + 1 AS BIGINT) AS n
  FROM items a JOIN items b ON a.item != b.item
  LEFT JOIN wins w ON w.i = a.item AND w.j = b.item),
wt AS MATERIALIZED (SELECT i, CAST(sum(n) AS BIGINT) AS w_total FROM pairs GROUP BY 1),
m AS MATERIALIZED (SELECT a.i, a.j, a.n + b.n AS m
  FROM pairs a JOIN pairs b ON a.i = b.j AND a.j = b.i),
w0 AS MATERIALIZED (SELECT item, CAST(1000000 AS BIGINT) AS w FROM items),
$iters
SELECT item, w AS w_micro,
  CAST(row_number() OVER (ORDER BY w DESC, item) AS INTEGER) AS rk
FROM w${ExtQueries.btIters}"""
  }

  /** q_corpus_drift: add-one-smoothed hashed-unigram distributions on
    * the full source×bucket grid; ONE ln per divergence term,
    * micro-rounded before the order-free long sums (the PMI/bigram-NLL
    * discipline); probabilities are single IEEE divisions of exact
    * BIGINTs, identical in both engines. */
  private val corpusDriftSql: String =
    """WITH tok AS MATERIALIZED (SELECT source,
      |    CAST(concat('0x', substr(md5('cd|' || t.tok), 1, 15)) AS BIGINT)
      |      % 256 AS bucket
      |  FROM documents,
      |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
      |      x -> x != '')) AS t(tok)),
      |counts AS MATERIALIZED (SELECT source, bucket, CAST(count(*) AS BIGINT) AS c
      |  FROM tok GROUP BY 1, 2),
      |totals AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s
      |           FROM counts GROUP BY 1),
      |allb AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS c_all
      |         FROM counts GROUP BY 1),
      |nall AS (SELECT CAST(sum(c) AS BIGINT) AS n_all FROM counts),
      |grid AS (SELECT t.source, t.n_s, r.range AS bucket, n.n_all,
      |    COALESCE(c.c, 0) + 1 AS cs, COALESCE(a.c_all, 0) + 1 AS ca
      |  FROM totals t CROSS JOIN range(256) r CROSS JOIN nall n
      |  LEFT JOIN counts c ON c.source = t.source AND c.bucket = r.range
      |  LEFT JOIN allb a ON a.bucket = r.range),
      |terms AS (SELECT source, n_s,
      |    CAST(round((CAST(cs AS DOUBLE) / CAST(n_s + 256 AS DOUBLE))
      |      * ln(CAST(cs * (n_all + 256) AS DOUBLE)
      |            / CAST((n_s + 256) * ca AS DOUBLE)) * 1e6, 0)
      |      AS BIGINT) AS kl_t,
      |    CAST(round(((CAST(cs AS DOUBLE) / CAST(n_s + 256 AS DOUBLE))
      |      * ln((CAST(cs AS DOUBLE) / CAST(n_s + 256 AS DOUBLE))
      |            / ((CAST(cs AS DOUBLE) / CAST(n_s + 256 AS DOUBLE)
      |                + CAST(ca AS DOUBLE) / CAST(n_all + 256 AS DOUBLE)) / 2))
      |      / 2.0) * 1e6, 0) AS BIGINT) AS js_s,
      |    CAST(round(((CAST(ca AS DOUBLE) / CAST(n_all + 256 AS DOUBLE))
      |      * ln((CAST(ca AS DOUBLE) / CAST(n_all + 256 AS DOUBLE))
      |            / ((CAST(cs AS DOUBLE) / CAST(n_s + 256 AS DOUBLE)
      |                + CAST(ca AS DOUBLE) / CAST(n_all + 256 AS DOUBLE)) / 2))
      |      / 2.0) * 1e6, 0) AS BIGINT) AS js_a
      |  FROM grid)
      |SELECT source, max(n_s) AS n_tokens,
      |  CAST(sum(kl_t) AS BIGINT) AS kl_micro,
      |  CAST(sum(js_s) + sum(js_a) AS BIGINT) AS js_micro
      |FROM terms GROUP BY source""".stripMargin

  /** q_rouge_overlap: bigrams as 60-bit md5 hashes, clipped-count
    * overlap Σ min(cc, rc) joined co-keyed on (pair, hash); zero-
    * denominator pairs score 0; P/R/F1 single IEEE divisions rounded
    * to 6dp. */
  private val rougeSql: String =
    """WITH cand AS (SELECT doc_id AS pair_id, text FROM documents
      |              WHERE doc_id % 2 = 0),
      |refs AS (SELECT doc_id - 1 AS pair_id, text FROM documents
      |         WHERE doc_id % 2 = 1),
      |ct AS (SELECT pair_id,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'),
      |      x -> x != '') AS toks FROM cand),
      |rt AS (SELECT pair_id,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'),
      |      x -> x != '') AS toks FROM refs),
      |cg AS MATERIALIZED (SELECT pair_id,
      |    CAST(concat('0x', substr(md5('rg|' || g.gram), 1, 15)) AS BIGINT) AS h,
      |    CAST(count(*) AS BIGINT) AS cc
      |  FROM ct, unnest(list_transform(range(1, len(toks)),
      |    i -> toks[i] || ' ' || toks[i + 1])) AS g(gram)
      |  GROUP BY 1, 2),
      |rg AS MATERIALIZED (SELECT pair_id,
      |    CAST(concat('0x', substr(md5('rg|' || g.gram), 1, 15)) AS BIGINT) AS h,
      |    CAST(count(*) AS BIGINT) AS rc
      |  FROM rt, unnest(list_transform(range(1, len(toks)),
      |    i -> toks[i] || ' ' || toks[i + 1])) AS g(gram)
      |  GROUP BY 1, 2),
      |ov AS (SELECT pair_id, CAST(sum(least(cc, rc)) AS BIGINT) AS overlap
      |  FROM cg JOIN rg USING (pair_id, h) GROUP BY 1),
      |nc AS (SELECT pair_id, CAST(sum(cc) AS BIGINT) AS n_cand
      |       FROM cg GROUP BY 1),
      |nr AS (SELECT pair_id, CAST(sum(rc) AS BIGINT) AS n_ref
      |       FROM rg GROUP BY 1),
      |base AS (SELECT c.pair_id FROM cand c
      |         JOIN refs r ON r.pair_id = c.pair_id),
      |j AS (SELECT b.pair_id,
      |    COALESCE(ov.overlap, 0) AS overlap,
      |    COALESCE(nc.n_cand, 0) AS n_cand,
      |    COALESCE(nr.n_ref, 0) AS n_ref
      |  FROM base b
      |  LEFT JOIN nc ON nc.pair_id = b.pair_id
      |  LEFT JOIN nr ON nr.pair_id = b.pair_id
      |  LEFT JOIN ov ON ov.pair_id = b.pair_id),
      |pr AS (SELECT pair_id, overlap, n_cand, n_ref,
      |    CASE WHEN n_cand > 0
      |      THEN CAST(overlap AS DOUBLE) / CAST(n_cand AS DOUBLE)
      |      ELSE 0.0 END AS p,
      |    CASE WHEN n_ref > 0
      |      THEN CAST(overlap AS DOUBLE) / CAST(n_ref AS DOUBLE)
      |      ELSE 0.0 END AS r
      |  FROM j)
      |SELECT pair_id, overlap, n_cand, n_ref,
      |  round(p, 6) AS rouge_p, round(r, 6) AS rouge_r,
      |  round(CASE WHEN p + r > 0.0 THEN 2.0 * p * r / (p + r)
      |        ELSE 0.0 END, 6) AS rouge_f1
      |FROM pr""".stripMargin

  /** q_lsh_recall: the exact prefix-join replay (q_prefix_jaccard's
    * chain) LEFT-joined against the banding replay
    * (q_dedup_lsh_candidates' chain), rolled up per Jaccard decile —
    * both chains verbatim from their single-query oracles so the
    * composition cannot drift from the parts. */
  private def lshRecallSql(toks: String): String =
    s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
      |ts AS (SELECT doc_id, list_sort(list_distinct(list_transform(
      |         range(1, len(toks) - 1),
      |         i -> CAST(concat('0x', substr(md5(
      |           toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 15)) AS BIGINT)))) AS s
      |       FROM t WHERE len(toks) >= 3),
      |ex AS (SELECT doc_id, unnest(s) AS token FROM ts),
      |df AS (SELECT token, count(*) AS df FROM ex GROUP BY token),
      |ranked AS (SELECT e.doc_id, e.token,
      |    row_number() OVER (PARTITION BY e.doc_id ORDER BY d.df, e.token) AS rnk,
      |    count(*) OVER (PARTITION BY e.doc_id) AS sz
      |  FROM ex e JOIN df d USING (token)),
      |pref AS (SELECT doc_id, token FROM ranked
      |         WHERE rnk <= sz - CAST(ceil(0.5 * sz) AS BIGINT) + 1),
      |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |         FROM pref a JOIN pref b
      |           ON a.token = b.token AND a.doc_id < b.doc_id),
      |ver AS (SELECT a_id, b_id,
      |    len(list_intersect(sa.s, sb.s)) AS inter,
      |    len(sa.s) AS la, len(sb.s) AS lb
      |  FROM cand JOIN ts sa ON sa.doc_id = a_id
      |            JOIN ts sb ON sb.doc_id = b_id),
      |exact AS (SELECT a_id, b_id,
      |    round(CAST(inter AS DOUBLE) / (la + lb - inter), 6) AS jaccard
      |  FROM ver WHERE CAST(inter AS DOUBLE) / (la + lb - inter) >= 0.5),
      |long_docs AS (SELECT * FROM t WHERE len(toks) >= 3),
      |grams AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
      |          FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS i FROM long_docs) x),
      |h AS (SELECT doc_id, s,
      |        CAST(concat('0x', substr(md5(CAST(s // 2 AS VARCHAR) || '|' || gram), 1 + 15 * (s % 2), 15)) AS BIGINT) AS hv
      |      FROM grams CROSS JOIN (SELECT unnest(range(0, 8)) AS s) seeds),
      |sig AS (SELECT doc_id,
      |  MIN(CASE WHEN s = 0 THEN hv END) AS m0, MIN(CASE WHEN s = 1 THEN hv END) AS m1,
      |  MIN(CASE WHEN s = 2 THEN hv END) AS m2, MIN(CASE WHEN s = 3 THEN hv END) AS m3,
      |  MIN(CASE WHEN s = 4 THEN hv END) AS m4, MIN(CASE WHEN s = 5 THEN hv END) AS m5,
      |  MIN(CASE WHEN s = 6 THEN hv END) AS m6, MIN(CASE WHEN s = 7 THEN hv END) AS m7
      |FROM h GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, 0 AS band, m0 AS k0, m1 AS k1 FROM sig UNION ALL
      |  SELECT doc_id, 1, m2, m3 FROM sig UNION ALL
      |  SELECT doc_id, 2, m4, m5 FROM sig UNION ALL
      |  SELECT doc_id, 3, m6, m7 FROM sig),
      |lsh AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.k0 = b.k0 AND a.k1 = b.k1
      |   AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT CAST(floor(jaccard * 10) AS BIGINT) AS j_bucket,
      |  CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(sum(CASE WHEN l.a_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
      |  round(CAST(sum(CASE WHEN l.a_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 6) AS recall
      |FROM exact e LEFT JOIN lsh l ON l.a_id = e.a_id AND l.b_id = e.b_id
      |GROUP BY 1""".stripMargin

  /** q_holt_forecast: the Holt recurrence replayed as a recursive
    * CTE over the per-series day index; permille weights / milli
    * state keep every update numerator < 2⁵³, so floor() of the one
    * exact-rational division lands identically in both engines. */
  private val holtSql: String =
    """WITH RECURSIVE d AS (SELECT event_type AS series,
      |    CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |idx AS (SELECT series, day, x,
      |    CAST(row_number() OVER (PARTITION BY series ORDER BY day)
      |      AS BIGINT) AS i FROM d),
      |cnt AS (SELECT series, CAST(count(*) AS BIGINT) AS n_days
      |        FROM idx GROUP BY 1),
      |hw AS (
      |  SELECT series, i, x * 1000 AS l, CAST(0 AS BIGINT) AS b
      |  FROM idx WHERE i = 1
      |  UNION ALL
      |  SELECT n.series, n.i,
      |    CAST(floor(CAST(300 * n.x * 1000 + 700 * (hw.l + hw.b) AS DOUBLE)
      |      / 1000) AS BIGINT) AS l,
      |    CAST(floor(CAST(100 * (CAST(floor(
      |        CAST(300 * n.x * 1000 + 700 * (hw.l + hw.b) AS DOUBLE) / 1000)
      |        AS BIGINT) - hw.l) + 900 * hw.b AS DOUBLE) / 1000) AS BIGINT) AS b
      |  FROM hw JOIN idx n ON n.series = hw.series AND n.i = hw.i + 1)
      |SELECT h.series, CAST(c.n_days AS INTEGER) AS n_days,
      |  h.l AS level_milli, h.b AS trend_milli,
      |  h.l + h.b AS f1_milli, h.l + 2 * h.b AS f2_milli,
      |  h.l + 3 * h.b AS f3_milli
      |FROM hw h JOIN cnt c ON c.series = h.series AND h.i = c.n_days""".stripMargin

  /** q_holt_winters: the additive-seasonal recurrence as a recursive
    * CTE carrying the rotating 7-slot seasonal LIST; lNew is repeated
    * inline where bNew/sNew need it (lateral aliases are unreliable
    * inside recursive CTEs), exactly the holtSql discipline. */
  private val holtWintersSql: String = {
    val lNew = "CAST(floor(CAST(300 * (n.x * 1000 - hw.sl[1]) " +
      "+ 700 * (hw.l + hw.b) AS DOUBLE) / 1000) AS BIGINT)"
    s"""WITH RECURSIVE d0 AS (SELECT event_type AS series,
      |    CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT series, min(day) AS dmin, max(day) AS dmax
      |  FROM d0 GROUP BY 1),
      |cal AS (SELECT span.series, CAST(u.day AS DATE) AS day
      |  FROM span, unnest(generate_series(CAST(dmin AS TIMESTAMP),
      |    CAST(dmax AS TIMESTAMP), INTERVAL 1 DAY)) AS u(day)),
      |d AS (SELECT cal.series, cal.day, coalesce(d0.x, CAST(0 AS BIGINT)) AS x
      |  FROM cal LEFT JOIN d0 ON d0.series = cal.series
      |    AND d0.day = cal.day),
      |idx AS (SELECT series, day, x,
      |    CAST(row_number() OVER (PARTITION BY series ORDER BY day)
      |      AS BIGINT) AS i FROM d),
      |cnt AS (SELECT series, CAST(count(*) AS BIGINT) AS n_days
      |        FROM idx GROUP BY 1),
      |ok AS (SELECT series, n_days FROM cnt WHERE n_days > 7),
      |init AS (SELECT idx.series,
      |    CAST(floor(CAST(sum(idx.x * 1000) AS DOUBLE) / 7.0) AS BIGINT) AS l0
      |  FROM idx JOIN ok ON ok.series = idx.series
      |  WHERE idx.i <= 7 GROUP BY 1),
      |s0 AS (SELECT idx.series, init.l0,
      |    list(idx.x * 1000 - init.l0 ORDER BY idx.i) AS sl
      |  FROM idx JOIN init ON init.series = idx.series
      |  WHERE idx.i <= 7 GROUP BY 1, 2),
      |hw AS (
      |  SELECT series, CAST(7 AS BIGINT) AS i, l0 AS l,
      |    CAST(0 AS BIGINT) AS b, sl
      |  FROM s0
      |  UNION ALL
      |  SELECT n.series, n.i,
      |    $lNew,
      |    CAST(floor(CAST(100 * ($lNew - hw.l) + 900 * hw.b AS DOUBLE)
      |      / 1000) AS BIGINT),
      |    list_append(list_slice(hw.sl, 2, 7),
      |      CAST(floor(CAST(200 * (n.x * 1000 - $lNew) + 800 * hw.sl[1]
      |        AS DOUBLE) / 1000) AS BIGINT))
      |  FROM hw JOIN idx n ON n.series = hw.series AND n.i = hw.i + 1)
      |SELECT h.series, CAST(c.n_days AS INTEGER) AS n_days,
      |  h.l AS level_milli, h.b AS trend_milli,
      |  h.l + h.b + h.sl[1] AS f1_milli,
      |  h.l + 2 * h.b + h.sl[2] AS f2_milli,
      |  h.l + 3 * h.b + h.sl[3] AS f3_milli
      |FROM hw h JOIN ok c ON c.series = h.series AND h.i = c.n_days""".stripMargin
  }

  /** q_forecast_backtest: the same HW recursion truncated at the
    * train boundary (n_days − 7), then the 7 held-out days scored
    * against both the model forecast and the seasonal-naive repeat
    * of the train window's last season. */
  private val forecastBacktestSql: String = {
    val lNew = "CAST(floor(CAST(300 * (n.x * 1000 - hw.sl[1]) " +
      "+ 700 * (hw.l + hw.b) AS DOUBLE) / 1000) AS BIGINT)"
    s"""WITH RECURSIVE d0 AS (SELECT event_type AS series,
      |    CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT series, min(day) AS dmin, max(day) AS dmax
      |  FROM d0 GROUP BY 1),
      |cal AS (SELECT span.series, CAST(u.day AS DATE) AS day
      |  FROM span, unnest(generate_series(CAST(dmin AS TIMESTAMP),
      |    CAST(dmax AS TIMESTAMP), INTERVAL 1 DAY)) AS u(day)),
      |d AS (SELECT cal.series, cal.day, coalesce(d0.x, CAST(0 AS BIGINT)) AS x
      |  FROM cal LEFT JOIN d0 ON d0.series = cal.series
      |    AND d0.day = cal.day),
      |idx AS (SELECT series, day, x,
      |    CAST(row_number() OVER (PARTITION BY series ORDER BY day)
      |      AS BIGINT) AS i FROM d),
      |cnt AS (SELECT series, CAST(count(*) AS BIGINT) AS n_days
      |        FROM idx GROUP BY 1),
      |tr AS (SELECT series, n_days, n_days - 7 AS n_train
      |       FROM cnt WHERE n_days > 14),
      |init AS (SELECT idx.series,
      |    CAST(floor(CAST(sum(idx.x * 1000) AS DOUBLE) / 7.0) AS BIGINT) AS l0
      |  FROM idx JOIN tr ON tr.series = idx.series
      |  WHERE idx.i <= 7 GROUP BY 1),
      |s0 AS (SELECT idx.series, init.l0,
      |    list(idx.x * 1000 - init.l0 ORDER BY idx.i) AS sl
      |  FROM idx JOIN init ON init.series = idx.series
      |  WHERE idx.i <= 7 GROUP BY 1, 2),
      |hw AS (
      |  SELECT series, CAST(7 AS BIGINT) AS i, l0 AS l,
      |    CAST(0 AS BIGINT) AS b, sl
      |  FROM s0
      |  UNION ALL
      |  SELECT n.series, n.i,
      |    $lNew,
      |    CAST(floor(CAST(100 * ($lNew - hw.l) + 900 * hw.b AS DOUBLE)
      |      / 1000) AS BIGINT),
      |    list_append(list_slice(hw.sl, 2, 7),
      |      CAST(floor(CAST(200 * (n.x * 1000 - $lNew) + 800 * hw.sl[1]
      |        AS DOUBLE) / 1000) AS BIGINT))
      |  FROM hw
      |  JOIN idx n ON n.series = hw.series AND n.i = hw.i + 1
      |  JOIN tr ON tr.series = hw.series
      |  WHERE n.i <= tr.n_train)
      |, hfin AS (SELECT hw.series, hw.l, hw.b, hw.sl, tr.n_days, tr.n_train
      |  FROM hw JOIN tr ON tr.series = hw.series AND hw.i = tr.n_train),
      |hs AS (SELECT series, n_days, n_train, l, b, sl,
      |    unnest(range(1, 8)) AS h FROM hfin),
      |terr AS (SELECT hs.series, hs.n_days,
      |    abs(hs.l + hs.h * hs.b + hs.sl[CAST(hs.h AS INT)]
      |      - tst.x * 1000) AS em,
      |    abs(nv.x * 1000 - tst.x * 1000) AS en
      |  FROM hs
      |  JOIN idx tst ON tst.series = hs.series
      |    AND tst.i = hs.n_train + hs.h
      |  JOIN idx nv ON nv.series = hs.series
      |    AND nv.i = hs.n_train - 7 + hs.h)
      |SELECT series, CAST(max(n_days) AS INTEGER) AS n_days,
      |  CAST(round(CAST(sum(em) AS DOUBLE) / 7.0, 0) AS BIGINT)
      |    AS mae_model_milli,
      |  CAST(round(CAST(sum(en) AS DOUBLE) / 7.0, 0) AS BIGINT)
      |    AS mae_naive_milli,
      |  round(CASE WHEN sum(en) = 0 THEN 0.0
      |    ELSE CAST(sum(em) AS DOUBLE) / CAST(sum(en) AS DOUBLE)
      |  END, 6) AS mase
      |FROM terr GROUP BY 1""".stripMargin
  }

  /** q_embed_drift: per-dim micro values summed as longs, integer
    * centroids, distances from the integer vectors with one sqrt/
    * division each — the centroidClassify parity discipline. */
  private val embedDriftSql: String =
    """WITH dims AS MATERIALIZED (SELECT label,
      |    CAST(u.i AS INTEGER) - 1 AS d,
      |    CAST(round(CAST(embedding[u.i] AS DOUBLE) * 1e6, 0) AS BIGINT) AS vm
      |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
      |perld AS MATERIALIZED (SELECT label, d, CAST(sum(vm) AS BIGINT) AS s,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM dims GROUP BY 1, 2),
      |cl AS (SELECT label, d, n,
      |    CAST(round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 0) AS BIGINT) AS c
      |  FROM perld),
      |cg AS (SELECT d,
      |    CAST(round(CAST(sum(s) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 0)
      |      AS BIGINT) AS g
      |  FROM perld GROUP BY 1),
      |agg AS (SELECT label, CAST(max(n) AS BIGINT) AS n_vecs,
      |    CAST(sum((c - g) * (c - g)) AS BIGINT) AS l2sq,
      |    CAST(sum(c * g) AS BIGINT) AS dotlg,
      |    CAST(sum(c * c) AS BIGINT) AS nl2,
      |    CAST(sum(g * g) AS BIGINT) AS ng2
      |  FROM cl JOIN cg USING (d) GROUP BY 1)
      |SELECT label, n_vecs,
      |  CAST(round(sqrt(CAST(l2sq AS DOUBLE)), 0) AS BIGINT) AS l2_micro,
      |  CAST(round(CASE WHEN nl2 > 0 AND ng2 > 0
      |    THEN CAST(dotlg AS DOUBLE) /
      |      (sqrt(CAST(nl2 AS DOUBLE)) * sqrt(CAST(ng2 AS DOUBLE))) * 1e6
      |    ELSE 0.0 END, 0) AS BIGINT) AS cos_micro
      |FROM agg""".stripMargin

  /** q_vocab_pruning: threshold explode over the hashed-token
    * frequency table; exact-long sums, one micro division. */
  private val vocabPruningSql: String =
    """WITH tok AS (SELECT
      |    CAST(concat('0x', substr(md5('vp|' || t.tok), 1, 15)) AS BIGINT) AS h
      |  FROM documents,
      |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
      |      x -> x != '')) AS t(tok)),
      |counts AS MATERIALIZED (SELECT h, CAST(count(*) AS BIGINT) AS c
      |  FROM tok GROUP BY 1),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM counts),
      |th AS (SELECT CAST(u.t AS BIGINT) AS min_count
      |       FROM unnest([1, 2, 4, 8, 16, 32, 64, 128, 256]) AS u(t))
      |SELECT th.min_count,
      |  CAST(count(*) AS BIGINT) AS vocab_size,
      |  CAST(sum(c.c) AS BIGINT) AS covered_tokens,
      |  CAST(round(CAST(sum(c.c) AS DOUBLE) * 1e6
      |    / CAST(max(tot.n_total) AS DOUBLE), 0) AS BIGINT) AS coverage_micro
      |FROM counts c JOIN th ON c.c >= th.min_count CROSS JOIN tot
      |GROUP BY 1""".stripMargin

  /** q_luhn_screen: the same regexp extraction + per-candidate Luhn
    * fold, with DuckDB's explicit 'g' replace flag; planted valid /
    * invalid runs prove both checksum branches. */
  private val luhnScreenSql: String =
    """WITH p AS (SELECT doc_id,
      |    CASE WHEN doc_id % 50 = 0
      |        THEN text || ' card 4111 1111 1111 1111 ok'
      |      WHEN doc_id % 50 = 25 THEN text || ' ref 4111111111111112 x'
      |      ELSE text END AS text
      |  FROM documents),
      |c AS (SELECT doc_id, list_filter(list_transform(
      |    regexp_extract_all(text, '[0-9][0-9 -]{11,24}[0-9]', 0),
      |    cc -> regexp_replace(cc, '[ -]', '', 'g')),
      |    d -> length(d) >= 13 AND length(d) <= 19) AS cands FROM p),
      |v AS (SELECT doc_id, cands,
      |    list_filter(cands, d -> list_sum(list_transform(
      |      range(0, length(d)),
      |      i -> CASE WHEN i % 2 = 1 THEN
      |          CASE WHEN CAST(substr(reverse(d), CAST(i + 1 AS INTEGER), 1)
      |              AS INTEGER) * 2 > 9
      |            THEN CAST(substr(reverse(d), CAST(i + 1 AS INTEGER), 1)
      |              AS INTEGER) * 2 - 9
      |            ELSE CAST(substr(reverse(d), CAST(i + 1 AS INTEGER), 1)
      |              AS INTEGER) * 2 END
      |        ELSE CAST(substr(reverse(d), CAST(i + 1 AS INTEGER), 1)
      |          AS INTEGER) END)) % 10 = 0) AS valids
      |  FROM c)
      |SELECT doc_id, CAST(len(cands) AS INTEGER) AS n_candidates,
      |  CAST(len(valids) AS INTEGER) AS n_luhn_valid,
      |  len(valids) = 0 AS keep
      |FROM v""".stripMargin

  /** q_mutual_knn: the cosine ranking CTE on the subset, self-joined
    * both directions for reciprocity. */
  private val mutualKnnSql: String =
    """WITH c AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings WHERE vec_id % 4 = 0),
      |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
      |    round(list_dot_product(q.v, c.v)
      |      / (sqrt(list_dot_product(q.v, q.v))
      |         * sqrt(list_dot_product(c.v, c.v))), 6) AS cos_sim
      |  FROM c CROSS JOIN c q WHERE c.vec_id != q.vec_id),
      |ranked AS MATERIALIZED (SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |                                 ORDER BY cos_sim DESC, nn_id) AS rn
      |    FROM scored) t WHERE rn <= 5)
      |SELECT a.query_id AS a_id, a.nn_id AS b_id, a.cos_sim,
      |  CAST(a.rn AS INTEGER) AS ra, CAST(b.rn AS INTEGER) AS rb
      |FROM ranked a JOIN ranked b
      |  ON b.query_id = a.nn_id AND b.nn_id = a.query_id
      |WHERE a.query_id < a.nn_id""".stripMargin

  /** q_mad_outliers: integer-micro median/MAD with `(a+b) // 2`
    * even-count midpoints (nonneg longs — identical truncation), one
    * double robust-z per day micro-rounded; MAD = 0 convention 0/±10⁹. */
  private val madOutliersSql: String =
    """WITH d AS (SELECT event_type AS series, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
      |s AS (SELECT series, list(day ORDER BY day) AS days,
      |    list(x ORDER BY day) AS xs FROM d GROUP BY 1),
      |m AS (SELECT series, days, xs, sx,
      |    CASE WHEN len(sx) % 2 = 1 THEN sx[(len(sx) + 1) // 2]
      |      ELSE (sx[len(sx) // 2] + sx[len(sx) // 2 + 1]) // 2 END AS med
      |  FROM (SELECT *, list_sort(list_transform(xs, v -> v * 1000000)) AS sx
      |        FROM s) t),
      |md AS (SELECT series, days, xs, med,
      |    CASE WHEN len(dv) % 2 = 1 THEN dv[(len(dv) + 1) // 2]
      |      ELSE (dv[len(dv) // 2] + dv[len(dv) // 2 + 1]) // 2 END AS mad
      |  FROM (SELECT *, list_sort(list_transform(xs,
      |          v -> abs(v * 1000000 - med))) AS dv FROM m) t),
      |rows_ AS (SELECT series, med, mad, days[u.i] AS day, xs[u.i] AS x
      |  FROM md, unnest(range(1, len(xs) + 1)) AS u(i))
      |SELECT series, day, x,
      |  CASE WHEN mad = 0 THEN
      |    CASE WHEN x * 1000000 = med THEN CAST(0 AS BIGINT)
      |      ELSE CAST(sign(CAST(x * 1000000 - med AS DOUBLE)) AS BIGINT)
      |        * 1000000000 END
      |  ELSE CAST(round(0.6745 * CAST(x * 1000000 - med AS DOUBLE)
      |    / CAST(mad AS DOUBLE) * 1e6, 0) AS BIGINT) END AS rz_micro,
      |  abs(CASE WHEN mad = 0 THEN
      |    CASE WHEN x * 1000000 = med THEN CAST(0 AS BIGINT)
      |      ELSE CAST(sign(CAST(x * 1000000 - med AS DOUBLE)) AS BIGINT)
      |        * 1000000000 END
      |  ELSE CAST(round(0.6745 * CAST(x * 1000000 - med AS DOUBLE)
      |    / CAST(mad AS DOUBLE) * 1e6, 0) AS BIGINT) END) >= 3500000
      |    AS is_outlier
      |FROM rows_""".stripMargin

  /** q_theil_sen: pairwise slopes / medians replayed with 1-based
    * DuckDB list arithmetic — each slope ONE IEEE division of exact
    * longs, medians order statistics of identically-sorted doubles,
    * residuals exact longs off the rounded integer slope. */
  private val theilSenSql: String =
    """WITH d AS (SELECT event_type AS series, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
      |s AS (SELECT series, list(day ORDER BY day) AS days,
      |    list(x ORDER BY day) AS xs FROM d GROUP BY 1),
      |w AS (SELECT series, CAST(len(xs) AS INTEGER) AS n_days, xs,
      |    list_transform(days, dd -> dd - days[1]) AS idx FROM s),
      |sl AS (SELECT series, n_days, xs, idx,
      |    list_sort(flatten(list_transform(range(1, len(xs)),
      |      i -> list_transform(range(i + 1, len(xs) + 1),
      |        j -> CAST(xs[j] - xs[i] AS DOUBLE) / (idx[j] - idx[i])))))
      |      AS slopes FROM w),
      |sm AS (SELECT series, n_days, xs, idx,
      |    CASE WHEN len(slopes) = 0 THEN CAST(0 AS BIGINT)
      |      ELSE CAST(round((CASE WHEN len(slopes) % 2 = 1
      |        THEN slopes[(len(slopes) + 1) // 2]
      |        ELSE (slopes[len(slopes) // 2]
      |              + slopes[len(slopes) // 2 + 1]) / 2.0 END) * 1e6, 0)
      |        AS BIGINT) END AS slope_micro FROM sl),
      |rs AS (SELECT series, n_days, slope_micro,
      |    list_sort(list_transform(range(1, len(xs) + 1),
      |      i -> xs[i] * 1000000 - slope_micro * idx[i])) AS res FROM sm)
      |SELECT series, n_days, slope_micro,
      |  CASE WHEN len(res) % 2 = 1 THEN res[(len(res) + 1) // 2]
      |    ELSE CAST(round(CAST(res[len(res) // 2]
      |      + res[len(res) // 2 + 1] AS DOUBLE) / 2.0, 0) AS BIGINT) END
      |    AS intercept_micro
      |FROM rs""".stripMargin

  /** q_modularity: the q_label_prop replay chain verbatim, then
    * Newman modularity on the same symmetrized representation —
    * per-community terms micro-rounded before the order-free sum. */
  private val modularitySql: String =
    """WITH li AS (SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      |            FROM lineitem),
      |e AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
      |    SELECT src, dst FROM li UNION ALL SELECT dst AS src, src AS dst FROM li) x
      |  WHERE src != dst),
      |n AS (SELECT DISTINCT src AS node FROM e),
      |l0 AS (SELECT node, node AS label FROM n),
      |r1 AS MATERIALIZED (SELECT node, label FROM (
      |    SELECT e.src AS node, l.label, count(*) AS cnt,
      |      row_number() OVER (PARTITION BY e.src
      |        ORDER BY count(*) DESC, l.label) AS rn
      |    FROM e JOIN l0 l ON l.node = e.dst GROUP BY e.src, l.label) t
      |  WHERE rn = 1),
      |r2 AS MATERIALIZED (SELECT node, label FROM (
      |    SELECT e.src AS node, l.label, count(*) AS cnt,
      |      row_number() OVER (PARTITION BY e.src
      |        ORDER BY count(*) DESC, l.label) AS rn
      |    FROM e JOIN r1 l ON l.node = e.dst GROUP BY e.src, l.label) t
      |  WHERE rn = 1),
      |r3 AS MATERIALIZED (SELECT node, label FROM (
      |    SELECT e.src AS node, l.label, count(*) AS cnt,
      |      row_number() OVER (PARTITION BY e.src
      |        ORDER BY count(*) DESC, l.label) AS rn
      |    FROM e JOIN r2 l ON l.node = e.dst GROUP BY e.src, l.label) t
      |  WHERE rn = 1),
      |bigd AS (SELECT CAST(count(*) AS BIGINT) AS big_d FROM e),
      |win AS (SELECT la.label, CAST(count(*) AS BIGINT) AS w_in
      |  FROM e JOIN r3 la ON la.node = e.src
      |         JOIN r3 lb ON lb.node = e.dst
      |  WHERE la.label = lb.label GROUP BY 1),
      |dc AS (SELECT l.label, CAST(count(*) AS BIGINT) AS n_nodes,
      |    CAST(sum(d.deg) AS BIGINT) AS d_tot
      |  FROM (SELECT src, count(*) AS deg FROM e GROUP BY 1) d
      |  JOIN r3 l ON l.node = d.src GROUP BY 1),
      |perc AS (SELECT dc.label, dc.n_nodes,
      |    COALESCE(win.w_in, 0) AS w_in, dc.d_tot,
      |    CAST(round((CAST(COALESCE(win.w_in, 0) AS DOUBLE)
      |        / CAST(big_d AS DOUBLE)
      |      - (CAST(dc.d_tot AS DOUBLE) / CAST(big_d AS DOUBLE))
      |        * (CAST(dc.d_tot AS DOUBLE) / CAST(big_d AS DOUBLE)))
      |      * 1e6, 0) AS BIGINT) AS term_micro
      |  FROM dc LEFT JOIN win ON win.label = dc.label CROSS JOIN bigd),
      |s AS (SELECT CAST(sum(term_micro) AS BIGINT) AS modularity_micro
      |      FROM perc)
      |SELECT label, n_nodes, w_in, d_tot, term_micro, modularity_micro
      |FROM perc CROSS JOIN s""".stripMargin

  /** q_hits: `hitsIters` unrolled alternating updates over the
    * directed part→supplier graph; raw sums are exact longs, each
    * L1 normalization is one rounded IEEE division against the
    * scalar round total — generated from the SAME iteration constant
    * the Spark query uses. */
  private val hitsSql: String = {
    val iters = (1 to graft.queries.AdvancedAnalytics.hitsIters).map { t =>
      val ph = s"h${t - 1}"; val pa = s"a$t"
      s"""a${t}raw AS MATERIALIZED (SELECT e.dst AS node,
    CAST(sum(p.s) AS BIGINT) AS raw
  FROM e JOIN $ph p ON p.node = e.src GROUP BY 1),
a$t AS MATERIALIZED (SELECT n.node,
    CAST(round(CAST(COALESCE(r.raw, 0) AS DOUBLE) * 1e12 /
      CAST((SELECT CAST(sum(raw) AS BIGINT) FROM a${t}raw) AS DOUBLE), 0)
      AS BIGINT) AS s
  FROM nodes n LEFT JOIN a${t}raw r ON r.node = n.node),
h${t}raw AS MATERIALIZED (SELECT e.src AS node,
    CAST(sum(p.s) AS BIGINT) AS raw
  FROM e JOIN $pa p ON p.node = e.dst GROUP BY 1),
h$t AS MATERIALIZED (SELECT n.node,
    CAST(round(CAST(COALESCE(r.raw, 0) AS DOUBLE) * 1e12 /
      CAST((SELECT CAST(sum(raw) AS BIGINT) FROM h${t}raw) AS DOUBLE), 0)
      AS BIGINT) AS s
  FROM nodes n LEFT JOIN h${t}raw r ON r.node = n.node)"""
    }.mkString(",\n")
    val n = graft.queries.AdvancedAnalytics.hitsIters
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT l_partkey * 2 AS src,
    l_suppkey * 2 + 1 AS dst FROM lineitem),
nodes AS MATERIALIZED (SELECT DISTINCT u.node
  FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e) u),
h0 AS MATERIALIZED (SELECT node, CAST(1000000 AS BIGINT) AS s FROM nodes),
$iters
SELECT n.node, h$n.s AS hub_micro, a$n.s AS auth_micro
FROM nodes n JOIN h$n ON h$n.node = n.node JOIN a$n ON a$n.node = n.node"""
  }

  /** q_eval_calibration: explicit floor() before every would-be
    * integer cast (Spark cast truncates, DuckDB rounds — floor makes
    * the value integer first); all sums are exact longs. */
  private val calibrationSql: String =
    """WITH t AS (SELECT lower(text) AS lt,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'),
      |      x -> x != '') AS toks FROM documents),
      |pred AS (SELECT
      |    least(1000000, CAST(len(list_filter(toks,
      |      x -> x IN ('the','a','of','and','is','to','in','it','that')))
      |      AS BIGINT) * 125000) AS p,
      |    CASE WHEN lt LIKE '% the %' THEN 1 ELSE 0 END AS y FROM t),
      |binned AS (SELECT
      |    CAST(least(floor(p * 10 / 1000000), 9) AS BIGINT) AS bin, p, y,
      |    CAST(floor((p - y * 1000000) * (p - y * 1000000) / 1000000)
      |      AS BIGINT) AS sq FROM pred),
      |perbin AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_bin,
      |    CAST(round(CAST(sum(p) AS DOUBLE) / count(*), 0) AS BIGINT)
      |      AS conf_micro,
      |    CAST(round(CAST(sum(y) AS DOUBLE) * 1e6 / count(*), 0) AS BIGINT)
      |      AS acc_micro,
      |    CAST(sum(sq) AS BIGINT) AS sq
      |  FROM binned GROUP BY 1),
      |g AS (SELECT bin, n_bin, conf_micro, acc_micro,
      |    abs(acc_micro - conf_micro) AS gap_micro, sq FROM perbin),
      |s AS (SELECT
      |    CAST(round(CAST(sum(gap_micro * n_bin) AS DOUBLE) / sum(n_bin), 0)
      |      AS BIGINT) AS ece_micro,
      |    CAST(max(gap_micro) AS BIGINT) AS mce_micro,
      |    CAST(round(CAST(sum(sq) AS DOUBLE) / sum(n_bin), 0) AS BIGINT)
      |      AS brier_micro FROM g)
      |SELECT bin, n_bin, conf_micro, acc_micro, gap_micro,
      |  ece_micro, mce_micro, brier_micro
      |FROM g CROSS JOIN s""".stripMargin

  /** q_cohen_kappa: multi-class κ from exact-long confusion /
    * marginal counts; pe's numerator Σ nₐ·n_b is long-exact. */
  private val cohenKappaSql: String =
    """WITH t AS (SELECT source, lower(text) AS lt,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'),
      |      x -> x != '') AS toks FROM documents),
      |lab AS (SELECT source AS grp,
      |    CASE WHEN len(list_filter(toks,
      |        x -> x IN ('the','a','of','and','is','to','in','it','that')))
      |      >= len(list_filter(toks,
      |        x -> x IN ('el','la','de','y','es','en','que','los')))
      |      THEN 'en' ELSE 'es' END AS la,
      |    CASE WHEN lt LIKE '% the %' THEN 'en' ELSE 'es' END AS lb FROM t),
      |cells AS MATERIALIZED (SELECT grp, la, lb, CAST(count(*) AS BIGINT) AS c
      |  FROM lab GROUP BY 1, 2, 3),
      |n AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY 1),
      |ag AS (SELECT grp, CAST(sum(c) AS BIGINT) AS agree FROM cells
      |       WHERE la = lb GROUP BY 1),
      |ma AS (SELECT grp, la, CAST(sum(c) AS BIGINT) AS na
      |       FROM cells GROUP BY 1, 2),
      |mb AS (SELECT grp, lb, CAST(sum(c) AS BIGINT) AS nb
      |       FROM cells GROUP BY 1, 2),
      |pe AS (SELECT ma.grp, CAST(sum(na * nb) AS BIGINT) AS pe_num
      |  FROM ma JOIN mb ON mb.grp = ma.grp AND mb.lb = ma.la GROUP BY 1),
      |j AS (SELECT n.grp, n.n, COALESCE(ag.agree, 0) AS agree,
      |    COALESCE(pe.pe_num, 0) AS pe_num
      |  FROM n LEFT JOIN ag ON ag.grp = n.grp
      |  LEFT JOIN pe ON pe.grp = n.grp),
      |f AS (SELECT grp, n, agree,
      |    CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) AS po,
      |    CAST(pe_num AS DOUBLE) / CAST(n * n AS DOUBLE) AS pe FROM j)
      |SELECT grp, n, agree, round(po, 6) AS po, round(pe, 6) AS pe,
      |  round(CASE WHEN pe = 1.0 THEN 0.0
      |        ELSE (po - pe) / (1.0 - pe) END, 6) AS kappa
      |FROM f""".stripMargin

  /** q_vocab_richness: frequency-of-frequencies rollup; Chao1
    * bias-corrected estimator + Good–Turing coverage. */
  private val vocabRichnessSql: String =
    """WITH tok AS (SELECT source,
      |    CAST(concat('0x', substr(md5('vr|' || t.tok), 1, 15)) AS BIGINT) AS h
      |  FROM documents,
      |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
      |      x -> x != '')) AS t(tok)),
      |counts AS (SELECT source, h, CAST(count(*) AS BIGINT) AS c
      |  FROM tok GROUP BY 1, 2),
      |agg AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
      |    CAST(count(*) AS BIGINT) AS vocab,
      |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
      |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
      |  FROM counts GROUP BY 1)
      |SELECT source, n_tokens, vocab, f1, f2,
      |  round(CAST(vocab AS DOUBLE) +
      |    CAST(f1 * (f1 - 1) AS DOUBLE) / CAST(2 * (f2 + 1) AS DOUBLE), 6)
      |    AS chao1,
      |  round(1.0 - CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
      |    AS coverage
      |FROM agg""".stripMargin

  /** q_auc_roc: Mann–Whitney 2U as an exact long over the distinct-
    * score table (mid-rank ties via 2·neg_below + neg); single IEEE
    * division, degenerate groups 0.5. */
  private val aucRocSql: String =
    """WITH t AS (SELECT lang AS grp, lower(text) AS lt,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'),
      |      x -> x != '') AS toks FROM documents),
      |pred AS (SELECT grp,
      |    least(1000000, CAST(len(list_filter(toks,
      |      x -> x IN ('the','a','of','and','is','to','in','it','that')))
      |      AS BIGINT) * 125000) AS s,
      |    CASE WHEN lt LIKE '% the %' THEN 1 ELSE 0 END AS y FROM t),
      |cells AS (SELECT grp, s, CAST(sum(y) AS BIGINT) AS pos,
      |    CAST(count(*) - sum(y) AS BIGINT) AS neg
      |  FROM pred GROUP BY 1, 2),
      |c2 AS (SELECT grp, pos, neg,
      |    COALESCE(CAST(sum(neg) OVER (PARTITION BY grp ORDER BY s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      |      0) AS nb FROM cells),
      |agg AS (SELECT grp, CAST(sum(pos) AS BIGINT) AS n_pos,
      |    CAST(sum(neg) AS BIGINT) AS n_neg,
      |    CAST(sum(pos * (2 * nb + neg)) AS BIGINT) AS u2
      |  FROM c2 GROUP BY 1)
      |SELECT grp, n_pos, n_neg, u2,
      |  round(CASE WHEN n_pos = 0 OR n_neg = 0 THEN 0.5
      |    ELSE CAST(u2 AS DOUBLE) /
      |      (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) END, 6)
      |    AS auc
      |FROM agg""".stripMargin

  /** q_fleiss_kappa: three unioned rater rules; po/pe numerators and
    * denominators exact longs; single-rating items excluded from both
    * numerators and marginals. */
  private val fleissKappaSql: String =
    """WITH t AS (SELECT source AS grp, doc_id AS item, lang,
      |    lower(text) AS lt,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'),
      |      x -> x != '') AS toks FROM documents),
      |r AS (SELECT grp, item,
      |    CASE WHEN len(list_filter(toks,
      |        x -> x IN ('the','a','of','and','is','to','in','it','that')))
      |      >= len(list_filter(toks,
      |        x -> x IN ('el','la','de','y','es','en','que','los')))
      |      THEN 'en' ELSE 'es' END AS cat FROM t
      |  UNION ALL SELECT grp, item,
      |    CASE WHEN lt LIKE '% the %' THEN 'en' ELSE 'es' END FROM t
      |  UNION ALL SELECT grp, item,
      |    CASE WHEN lang = 'en' THEN 'en' ELSE 'es' END FROM t),
      |nic AS MATERIALIZED (SELECT grp, item, cat,
      |    CAST(count(*) AS BIGINT) AS c FROM r GROUP BY 1, 2, 3),
      |it AS MATERIALIZED (SELECT grp, item, CAST(sum(c) AS BIGINT) AS ni,
      |    CAST(sum(c * (c - 1)) AS BIGINT) AS po_i
      |  FROM nic GROUP BY 1, 2 HAVING sum(c) >= 2),
      |po AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_items,
      |    CAST(sum(ni) AS BIGINT) AS n_ratings,
      |    CAST(sum(po_i) AS BIGINT) AS po_num,
      |    CAST(sum(ni * (ni - 1)) AS BIGINT) AS po_den FROM it GROUP BY 1),
      |marg AS (SELECT n.grp, n.cat, CAST(sum(n.c) AS BIGINT) AS mc
      |  FROM nic n JOIN it k ON k.grp = n.grp AND k.item = n.item
      |  GROUP BY 1, 2),
      |pe AS (SELECT grp, CAST(sum(mc * mc) AS BIGINT) AS pe_num
      |  FROM marg GROUP BY 1),
      |f AS (SELECT po.grp, n_items, n_ratings,
      |    CAST(po_num AS DOUBLE) / CAST(po_den AS DOUBLE) AS po,
      |    CAST(COALESCE(pe.pe_num, 0) AS DOUBLE) /
      |      CAST(n_ratings * n_ratings AS DOUBLE) AS pe
      |  FROM po LEFT JOIN pe ON pe.grp = po.grp)
      |SELECT grp, n_items, n_ratings, round(po, 6) AS po,
      |  round(pe, 6) AS pe,
      |  round(CASE WHEN pe = 1.0 THEN 0.0
      |        ELSE (po - pe) / (1.0 - pe) END, 6) AS kappa
      |FROM f""".stripMargin

  /** q_krippendorff_alpha: same three rater rules as fleiss with the
    * planted missing-data filters; per-unit Do terms micro-rounded
    * then summed as longs, marginals exact longs (the 1/(m−1)
    * weights cancel), De one IEEE division; De = 0 → α = 1. */
  private val krippendorffSql: String =
    """WITH t AS (SELECT source AS grp, doc_id AS item, lang,
      |    lower(text) AS lt,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'),
      |      x -> x != '') AS toks FROM documents),
      |r AS (SELECT grp, item,
      |    CASE WHEN len(list_filter(toks,
      |        x -> x IN ('the','a','of','and','is','to','in','it','that')))
      |      >= len(list_filter(toks,
      |        x -> x IN ('el','la','de','y','es','en','que','los')))
      |      THEN 'en' ELSE 'es' END AS cat FROM t
      |  UNION ALL SELECT grp, item,
      |    CASE WHEN lt LIKE '% the %' THEN 'en' ELSE 'es' END FROM t
      |    WHERE item % 3 <> 1
      |  UNION ALL SELECT grp, item,
      |    CASE WHEN lang = 'en' THEN 'en' ELSE 'es' END FROM t
      |    WHERE item % 5 <> 2),
      |nic AS MATERIALIZED (SELECT grp, item, cat,
      |    CAST(count(*) AS BIGINT) AS c FROM r GROUP BY 1, 2, 3),
      |it AS MATERIALIZED (SELECT grp, item, CAST(sum(c) AS BIGINT) AS m,
      |    CAST(sum(c * c) AS BIGINT) AS sumc2
      |  FROM nic GROUP BY 1, 2 HAVING sum(c) >= 2),
      |du AS (SELECT grp, item, m, CAST(round(
      |    1000000.0 * CAST(m * m - sumc2 AS DOUBLE) / CAST(m - 1 AS DOUBLE),
      |    0) AS BIGINT) AS du_micro FROM it),
      |doa AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_items,
      |    CAST(sum(m) AS BIGINT) AS n_ratings,
      |    CAST(sum(du_micro) AS BIGINT) AS do_micro FROM du GROUP BY 1),
      |marg AS (SELECT n.grp, n.cat, CAST(sum(n.c) AS BIGINT) AS nc
      |  FROM nic n JOIN it k ON k.grp = n.grp AND k.item = n.item
      |  GROUP BY 1, 2),
      |m2 AS (SELECT grp, CAST(sum(nc * nc) AS BIGINT) AS sum_nc2
      |  FROM marg GROUP BY 1)
      |SELECT d.grp, n_items, n_ratings, do_micro,
      |  round(CAST(n_ratings * n_ratings - sum_nc2 AS DOUBLE)
      |    / CAST(n_ratings - 1 AS DOUBLE), 6) AS de,
      |  CASE WHEN n_ratings * n_ratings - sum_nc2 = 0 THEN 1.0
      |    ELSE round(1.0 - (CAST(do_micro AS DOUBLE) / 1000000.0)
      |      / (CAST(n_ratings * n_ratings - sum_nc2 AS DOUBLE)
      |         / CAST(n_ratings - 1 AS DOUBLE)), 6) END AS alpha
      |FROM doa d JOIN m2 ON m2.grp = d.grp""".stripMargin

  /** q_ks_drift: exact-long D numerator max |cumA·nB − cumB·nA| over
    * the pooled distinct-value table; single IEEE division. */
  private val ksDriftSql: String =
    """WITH t AS (SELECT doc_id, lang AS grp,
      |    least(1000000, CAST(len(list_filter(
      |      list_filter(regexp_split_to_array(lower(text), '\s+'),
      |        x -> x != ''),
      |      x -> x IN ('the','a','of','and','is','to','in','it','that')))
      |      AS BIGINT) * 125000) AS v FROM documents),
      |cells AS (SELECT grp, v,
      |    CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ca,
      |    CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS cb FROM t GROUP BY 1, 2),
      |cum AS (SELECT grp,
      |    CAST(sum(ca) OVER (PARTITION BY grp ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cumA,
      |    CAST(sum(cb) OVER (PARTITION BY grp ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cumB,
      |    CAST(sum(ca) OVER (PARTITION BY grp) AS BIGINT) AS tA,
      |    CAST(sum(cb) OVER (PARTITION BY grp) AS BIGINT) AS tB
      |  FROM cells)
      |SELECT grp, max(tA) AS n_a, max(tB) AS n_b,
      |  CAST(max(abs(cumA * tB - cumB * tA)) AS BIGINT) AS d_num,
      |  round(CASE WHEN max(tA) = 0 OR max(tB) = 0 THEN 1.0
      |    ELSE CAST(max(abs(cumA * tB - cumB * tA)) AS DOUBLE) /
      |      CAST(max(tA) * max(tB) AS DOUBLE) END, 6) AS ks
      |FROM cum GROUP BY grp""".stripMargin

  /** q_wasserstein: exact-long per-interval terms
    * |cumA·nB − cumB·nA|·Δv over the pooled distinct-value table;
    * single IEEE division — mirrored from Evaluation.wasserstein1. */
  private val wassersteinSql: String =
    """WITH t AS (SELECT doc_id, lang AS grp,
      |    least(1000000, CAST(len(list_filter(
      |      list_filter(regexp_split_to_array(lower(text), '\s+'),
      |        x -> x != ''),
      |      x -> x IN ('the','a','of','and','is','to','in','it','that')))
      |      AS BIGINT) * 125000) AS v FROM documents),
      |cells AS (SELECT grp, v,
      |    CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ca,
      |    CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS cb FROM t GROUP BY 1, 2),
      |cum AS (SELECT grp, v,
      |    CAST(sum(ca) OVER (PARTITION BY grp ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cumA,
      |    CAST(sum(cb) OVER (PARTITION BY grp ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cumB,
      |    CAST(sum(ca) OVER (PARTITION BY grp) AS BIGINT) AS tA,
      |    CAST(sum(cb) OVER (PARTITION BY grp) AS BIGINT) AS tB,
      |    lead(v) OVER (PARTITION BY grp ORDER BY v) AS nextV
      |  FROM cells)
      |SELECT grp, max(tA) AS n_a, max(tB) AS n_b,
      |  CAST(sum(CASE WHEN nextV IS NULL THEN 0
      |    ELSE abs(cumA * tB - cumB * tA) * (nextV - v) END) AS BIGINT)
      |    AS w1_num,
      |  round(CASE WHEN max(tA) = 0 OR max(tB) = 0 THEN 0.0
      |    ELSE CAST(sum(CASE WHEN nextV IS NULL THEN 0
      |      ELSE abs(cumA * tB - cumB * tA) * (nextV - v) END) AS DOUBLE) /
      |      CAST(max(tA) * max(tB) AS DOUBLE) END, 6) AS w1
      |FROM cum GROUP BY grp""".stripMargin

  /** q_cvm: pooled-multiplicity squared CDF gaps, per-value terms
    * nano-rounded pre-sum, one T expression — mirrored from
    * Evaluation.cramerVonMises. */
  private val cvmSql: String =
    """WITH t AS (SELECT doc_id, lang AS grp,
      |    least(1000000, CAST(len(list_filter(
      |      list_filter(regexp_split_to_array(lower(text), '\s+'),
      |        x -> x != ''),
      |      x -> x IN ('the','a','of','and','is','to','in','it','that')))
      |      AS BIGINT) * 125000) AS v FROM documents),
      |cells AS (SELECT grp, v,
      |    CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ca,
      |    CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS cb FROM t GROUP BY 1, 2),
      |cum AS (SELECT grp, ca, cb,
      |    CAST(sum(ca) OVER (PARTITION BY grp ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cumA,
      |    CAST(sum(cb) OVER (PARTITION BY grp ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cumB,
      |    CAST(sum(ca) OVER (PARTITION BY grp) AS BIGINT) AS tA,
      |    CAST(sum(cb) OVER (PARTITION BY grp) AS BIGINT) AS tB
      |  FROM cells),
      |terms AS (SELECT grp, tA, tB,
      |    CASE WHEN tA = 0 OR tB = 0 THEN 0
      |      ELSE CAST(round(CAST(ca + cb AS DOUBLE)
      |        * (CAST(cumA * tB - cumB * tA AS DOUBLE)
      |           / (CAST(tA AS DOUBLE) * CAST(tB AS DOUBLE)))
      |        * (CAST(cumA * tB - cumB * tA AS DOUBLE)
      |           / (CAST(tA AS DOUBLE) * CAST(tB AS DOUBLE)))
      |        * 1e9, 0) AS BIGINT) END AS term_nano
      |  FROM cum),
      |ag AS (SELECT grp, max(tA) AS n_a, max(tB) AS n_b,
      |    CAST(sum(term_nano) AS BIGINT) AS tsum
      |  FROM terms GROUP BY 1)
      |SELECT grp, n_a, n_b,
      |  round(CASE WHEN n_a = 0 OR n_b = 0 THEN 0.0
      |    ELSE CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
      |      / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
      |         * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
      |      * CAST(tsum AS DOUBLE) / 1e9 END, 6) AS cvm
      |FROM ag""".stripMargin

  /** q_anderson_darling: Scholz–Stephens midrank A² in doubled block
    * counts (the /4 cancels exactly); per-value fully-scaled terms
    * nano-rounded pre-sum — mirrored from Evaluation.andersonDarling. */
  private val andersonDarlingSql: String = {
    def dd(c: String) = s"CAST($c AS DOUBLE)"
    val nTot = "(tA + tB)"
    val t = "(ca + cb)"
    val b2 = s"(2 * (cumA + cumB) - $t)"
    val m2 = "(2 * cumA - ca)"
    val num = s"($nTot * $m2 - tA * $b2)"
    val den = s"($b2 * (2 * $nTot - $b2) - $nTot * $t)"
    val cFac = s"((CAST($nTot AS DOUBLE) - 1.0) " +
      s"/ (CAST($nTot AS DOUBLE) * CAST($nTot AS DOUBLE)) " +
      s"* (1.0 / ${dd("tA")} + 1.0 / ${dd("tB")}))"
    s"""WITH t0 AS (SELECT doc_id, lang AS grp,
       |    least(1000000, CAST(len(list_filter(
       |      list_filter(regexp_split_to_array(lower(text), '${"\\s"}+'),
       |        x -> x != ''),
       |      x -> x IN ('the','a','of','and','is','to','in','it','that')))
       |      AS BIGINT) * 125000) AS v FROM documents),
       |cells AS (SELECT grp, v,
       |    CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS ca,
       |    CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS cb FROM t0 GROUP BY 1, 2),
       |cum AS (SELECT grp, ca, cb,
       |    CAST(sum(ca) OVER (PARTITION BY grp ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cumA,
       |    CAST(sum(cb) OVER (PARTITION BY grp ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cumB,
       |    CAST(sum(ca) OVER (PARTITION BY grp) AS BIGINT) AS tA,
       |    CAST(sum(cb) OVER (PARTITION BY grp) AS BIGINT) AS tB
       |  FROM cells),
       |terms AS (SELECT grp, tA, tB,
       |    CASE WHEN tA = 0 OR tB = 0 OR $den <= 0 THEN 0
       |      ELSE CAST(round($cFac * CAST($t AS DOUBLE)
       |        * CAST($num AS DOUBLE) * CAST($num AS DOUBLE)
       |        / CAST($den AS DOUBLE) * 1e9, 0) AS BIGINT) END AS term_nano
       |  FROM cum),
       |ag AS (SELECT grp, max(tA) AS n_a, max(tB) AS n_b,
       |    CAST(sum(term_nano) AS BIGINT) AS tsum
       |  FROM terms GROUP BY 1)
       |SELECT grp, n_a, n_b,
       |  round(CASE WHEN n_a = 0 OR n_b = 0 THEN 0.0
       |    ELSE CAST(tsum AS DOUBLE) / 1e9 END, 6) AS a2
       |FROM ag""".stripMargin
  }

  /** q_chi_square: χ² over the full marginal grid (zero-observed
    * cells included); per-cell term from the long-exact (o·N − r·c)
    * difference, micro-rounded pre-sum; Cramér's V via IEEE sqrt. */
  private val chiSquareSql: String =
    """WITH t AS (SELECT source AS grp, lang AS la,
      |    CASE WHEN len(list_filter(
      |        list_filter(regexp_split_to_array(lower(text), '\s+'),
      |          x -> x != ''),
      |        x -> x IN ('the','a','of','and','is','to','in','it','that')))
      |      >= len(list_filter(
      |        list_filter(regexp_split_to_array(lower(text), '\s+'),
      |          x -> x != ''),
      |        x -> x IN ('el','la','de','y','es','en','que','los')))
      |      THEN 'en' ELSE 'es' END AS lb FROM documents),
      |cells AS MATERIALIZED (SELECT grp, la, lb,
      |    CAST(count(*) AS BIGINT) AS o FROM t GROUP BY 1, 2, 3),
      |ma AS (SELECT grp, la, CAST(sum(o) AS BIGINT) AS rn
      |  FROM cells GROUP BY 1, 2),
      |mb AS (SELECT grp, lb, CAST(sum(o) AS BIGINT) AS cn
      |  FROM cells GROUP BY 1, 2),
      |n AS (SELECT grp, CAST(sum(o) AS BIGINT) AS n FROM cells GROUP BY 1),
      |grid AS (SELECT ma.grp, ma.la, mb.lb, n.n, ma.rn, mb.cn,
      |    COALESCE(c.o, 0) AS o
      |  FROM ma JOIN mb ON mb.grp = ma.grp
      |  JOIN n ON n.grp = ma.grp
      |  LEFT JOIN cells c ON c.grp = ma.grp AND c.la = ma.la
      |    AND c.lb = mb.lb),
      |terms AS (SELECT grp, n,
      |    CAST(round(CAST(o * n - rn * cn AS DOUBLE)
      |      * CAST(o * n - rn * cn AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE))
      |      * 1e6, 0) AS BIGINT) AS term_micro FROM grid),
      |chi AS (SELECT grp, CAST(max(n) AS BIGINT) AS n,
      |    CAST(sum(term_micro) AS BIGINT) AS chi2 FROM terms GROUP BY 1),
      |ks AS (SELECT a.grp, a.ka, b.kb FROM
      |  (SELECT grp, CAST(count(*) AS BIGINT) AS ka FROM ma GROUP BY 1) a
      |  JOIN
      |  (SELECT grp, CAST(count(*) AS BIGINT) AS kb FROM mb GROUP BY 1) b
      |  ON b.grp = a.grp)
      |SELECT chi.grp, chi.n, (ka - 1) * (kb - 1) AS dof,
      |  CASE WHEN least(ka - 1, kb - 1) = 0 THEN 0
      |    ELSE chi.chi2 END AS chi2_micro,
      |  round(CASE WHEN least(ka - 1, kb - 1) = 0 THEN 0.0
      |    ELSE sqrt(CAST(chi.chi2 AS DOUBLE) / 1e6
      |      / (CAST(chi.n AS DOUBLE)
      |        * CAST(least(ka - 1, kb - 1) AS DOUBLE))) END, 6)
      |    AS cramers_v
      |FROM chi JOIN ks ON ks.grp = chi.grp""".stripMargin

  /** q_ppr: full 3-iteration integer-micro personalized PageRank
    * replay — seed-only reset, truncating division, positive-rank
    * frontier filter each round (matching the engine's loop). */
  private val pprSql: String = {
    val rounds = (1 to 3).map { i =>
      val prev = s"r${i - 1}"
      s"""i$i AS (SELECT e.dst AS node, sum($prev.r // deg.odeg) AS inflow
         |       FROM e JOIN deg USING (src)
         |       JOIN $prev ON $prev.node = e.src
         |       GROUP BY e.dst),
         |r$i AS (SELECT node, r FROM (
         |       SELECT COALESCE(s.node, i$i.node) AS node,
         |         CAST(CASE WHEN s.node IS NOT NULL THEN 150000 ELSE 0 END
         |           + (85 * COALESCE(i$i.inflow, 0)) // 100 AS BIGINT) AS r
         |       FROM seeds s FULL JOIN i$i ON i$i.node = s.node) t
         |       WHERE r > 0)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS s
       |            FROM lineitem),
       |e AS (SELECT p AS src, s AS dst FROM li
       |      UNION SELECT s AS src, p AS dst FROM li),
       |deg AS (SELECT src, count(*) AS odeg FROM e GROUP BY src),
       |seeds AS (SELECT DISTINCT l_partkey * 2 AS node FROM lineitem
       |          WHERE l_partkey % 100 = 0),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM seeds),
       |$rounds
       |SELECT node, r AS rank_micro FROM r3""".stripMargin
  }

  /** q_audio_frames: formula replay of the constant-amplitude WAV
    * frames — decoded RMS must land exactly on |amp|·1000 and zcr on
    * 0, so the hash-match proves encoder, parser, and the framing
    * arithmetic at once. */
  private val audioFramesSql: String =
    """WITH a AS (SELECT doc_id AS media_id,
      |    CAST(32 + (doc_id // 3) % 64 AS INTEGER) AS ns,
      |    CAST((doc_id % 100) * 100 AS BIGINT) AS amp
      |  FROM documents WHERE doc_id % 3 = 1),
      |f AS (SELECT media_id, ns, amp,
      |    CAST(u.i AS INTEGER) AS frame_idx,
      |    CAST((ns + 15) // 16 AS INTEGER) AS nf
      |  FROM a, unnest(range(0, (ns + 15) // 16)) AS u(i))
      |SELECT media_id, frame_idx,
      |  CAST(CASE WHEN frame_idx < nf - 1 OR ns % 16 = 0 THEN 16
      |       ELSE ns % 16 END AS INTEGER) AS n_samples,
      |  amp * 1000 AS rms_milli, CAST(0 AS INTEGER) AS zcr
      |FROM f""".stripMargin

  /** q_image_stats: the mosaic-formula block values (the
    * dhash-replay vals CTE) rolled into per-image luma statistics —
    * each 9×8 block covers 8×8 constant pixels, so
    * mean = Σv·1000/72 and min/max are block-level. */
  private val imageStatsSql: String =
    """WITH ids AS (SELECT doc_id AS id, doc_id // 3 AS fam,
      |    CAST(doc_id % 3 AS INTEGER) AS variant FROM documents),
      |grid AS (SELECT t1.range AS bx, t2.range AS by
      |         FROM range(9) t1, range(8) t2),
      |base AS (SELECT i.id, i.fam, i.variant, g.bx, g.by,
      |    CAST(concat('0x', substr(md5('px|' || i.fam || '|' || g.bx
      |      || '|' || g.by), 1, 15)) AS BIGINT) % 256 AS v0
      |  FROM ids i, grid g),
      |pert AS (SELECT f.fam, t.range AS j,
      |    CAST(concat('0x', substr(md5('pb|' || f.fam || '|' || t.range),
      |      1, 15)) AS BIGINT) % 9 AS px,
      |    CAST(concat('0x', substr(md5('pq|' || f.fam || '|' || t.range),
      |      1, 15)) AS BIGINT) % 8 AS py
      |  FROM (SELECT DISTINCT fam FROM ids) f, range(1, 3) t),
      |hits AS (SELECT i.id, p.px, p.py, count(*) AS n
      |  FROM ids i JOIN pert p ON p.fam = i.fam AND p.j <= i.variant
      |  GROUP BY 1, 2, 3),
      |vals AS (SELECT b.id, b.bx, b.by,
      |    (b.v0 + 96 * COALESCE(h.n, 0)) % 256 AS v
      |  FROM base b LEFT JOIN hits h
      |    ON h.id = b.id AND h.px = b.bx AND h.py = b.by)
      |SELECT id AS media_id, CAST(72 AS INTEGER) AS width,
      |  CAST(64 AS INTEGER) AS height,
      |  CAST(round(CAST(sum(v) AS DOUBLE) * 1000 / 72, 0) AS BIGINT)
      |    AS mean_milli,
      |  CAST(min(v) AS INTEGER) AS min_luma,
      |  CAST(max(v) AS INTEGER) AS max_luma
      |FROM vals GROUP BY id""".stripMargin

  /** q_vad_gate: formula replay over the constant-amplitude clips —
    * amp·1000 ≥ threshold decides every frame of a clip at once. */
  private val vadGateSql: String =
    """WITH a AS (SELECT doc_id AS media_id,
      |    CAST((32 + (doc_id // 3) % 64 + 15) // 16 AS BIGINT) AS nf,
      |    CAST((doc_id % 100) * 100 AS BIGINT) AS amp
      |  FROM documents WHERE doc_id % 3 = 1)
      |SELECT media_id, nf AS n_frames,
      |  CASE WHEN amp * 1000 >= 1000 THEN nf ELSE 0 END AS n_speech,
      |  CASE WHEN amp * 1000 >= 1000 THEN 1000000 ELSE 0 END
      |    AS speech_ratio_micro,
      |  amp * 1000 < 1000 AS is_silent
      |FROM a""".stripMargin

  /** q_fk_audit: dbt relationships audit replay — planted orphan
    * keys, distinct-key anti-join semantics. */
  private val fkAuditSql: String =
    """WITH planted AS (SELECT CASE WHEN l_orderkey % 1000 = 0
      |    THEN l_orderkey + 1000000000 ELSE l_orderkey END AS k
      |  FROM lineitem),
      |ck AS (SELECT k AS orphan_key, CAST(count(*) AS BIGINT) AS n_rows
      |  FROM planted WHERE k IS NOT NULL GROUP BY 1)
      |SELECT orphan_key, n_rows FROM ck
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_orderkey = ck.orphan_key)""".stripMargin

  /** q_source_freshness: per-source max-ts lag vs a fixed asOf in
    * floor-epoch seconds (Spark's long cast truncates); dead feed
    * classifies error with null max. */
  /** q_brier_decomp: the calibration bins re-finished into Murphy's
    * REL/RES/UNC — nano per-bin terms, exact totals, fixed-shape
    * publications mirrored from Evaluation.brierDecomposition. */
  private val brierDecompSql: String = {
    val f = "CAST(sum_p AS DOUBLE) / (CAST(n_bin AS DOUBLE) * 1e6)"
    val o = "CAST(pos AS DOUBLE) / CAST(n_bin AS DOUBLE)"
    val obar = "CAST(p AS DOUBLE) / CAST(n AS DOUBLE)"
    s"""WITH t AS (SELECT lower(text) AS lt,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |      x -> x != '') AS toks FROM documents),
       |pred AS (SELECT
       |    least(1000000, CAST(len(list_filter(toks,
       |      x -> x IN ('the','a','of','and','is','to','in','it','that')))
       |      AS BIGINT) * 125000) AS p,
       |    CASE WHEN lt LIKE '% the %' THEN 1 ELSE 0 END AS y FROM t),
       |binned AS (SELECT
       |    CAST(least(floor(p * 10 / 1000000), 9) AS BIGINT) AS bin, p, y
       |  FROM pred),
       |st AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_bin,
       |    CAST(sum(p) AS BIGINT) AS sum_p, CAST(sum(y) AS BIGINT) AS pos
       |  FROM binned GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_bin) AS BIGINT) AS n,
       |    CAST(sum(pos) AS BIGINT) AS p,
       |    CAST(count(*) AS BIGINT) AS n_bins FROM st),
       |tm AS (SELECT n, p, n_bins,
       |    CAST(round(CAST(n_bin AS DOUBLE) * (($f) - ($o)) * (($f) - ($o)) * 1e9, 0) AS BIGINT) AS rel_nano,
       |    CAST(round(CAST(n_bin AS DOUBLE) * (($o) - ($obar)) * (($o) - ($obar)) * 1e9, 0) AS BIGINT) AS res_nano
       |  FROM st CROSS JOIN tot)
       |SELECT n, n_bins,
       |  round($obar, 6) AS o_bar,
       |  round(CAST(sum(rel_nano) AS DOUBLE) / 1e9 / CAST(n AS DOUBLE), 6) AS reliability,
       |  round(CAST(sum(res_nano) AS DOUBLE) / 1e9 / CAST(n AS DOUBLE), 6) AS resolution,
       |  round(($obar) * (1.0 - ($obar)), 6) AS uncertainty
       |FROM tm GROUP BY n, p, n_bins""".stripMargin
  }

  /** q_hill_tail: top-k membership from the descending cumulative
    * count window, nano ln terms × integer weights — mirrored from
    * Evaluation.hillTail at k = 100. */
  private val hillTailSql: String =
    """WITH cells AS (SELECT event_type AS grp,
      |    CAST(round(value * 100, 0) AS BIGINT) AS v,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM events WHERE CAST(round(value * 100, 0) AS BIGINT) > 0
      |  GROUP BY 1, 2),
      |w AS (SELECT grp, v, c,
      |    CAST(sum(c) OVER (PARTITION BY grp ORDER BY v DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM cells),
      |r AS (SELECT grp, v, c, cum, cum - c AS cumPrev FROM w),
      |ref AS (SELECT grp,
      |    max(CASE WHEN cum >= 101 THEN v END) AS x_ref,
      |    CAST(sum(c) AS BIGINT) AS n_pos
      |  FROM r GROUP BY 1),
      |tm AS (SELECT r.grp,
      |    greatest(0, least(cum, 100) - cumPrev)
      |      * CAST(round(ln(CAST(v AS DOUBLE) / CAST(x_ref AS DOUBLE)) * 1e9, 0) AS BIGINT)
      |      AS t_nano,
      |    greatest(0, least(cum, 100) - cumPrev) AS wgt
      |  FROM r JOIN ref ON ref.grp = r.grp
      |  WHERE ref.x_ref IS NOT NULL AND cumPrev < 100),
      |ag AS (SELECT grp, CAST(sum(wgt) AS BIGINT) AS k_used,
      |    CAST(sum(t_nano) AS BIGINT) AS s_nano FROM tm GROUP BY 1)
      |SELECT ref.grp, COALESCE(ag.k_used, 0) AS k_used, ref.x_ref,
      |  round(CASE WHEN ref.x_ref IS NULL OR COALESCE(ag.k_used, 0) = 0
      |      OR COALESCE(ag.s_nano, 0) <= 0 THEN 0.0
      |    ELSE CAST(ag.k_used AS DOUBLE) / (CAST(ag.s_nano AS DOUBLE) / 1e9)
      |    END, 6) AS alpha
      |FROM ref LEFT JOIN ag ON ag.grp = ref.grp""".stripMargin

  /** q_seasonal_strength: weekday (c, Σx, Σx²) rollup, nano SSE/SST
    * terms — mirrored from Timeseries.seasonalStrength. DuckDB's
    * dayofweek differs from Spark's numbering, but only GROUPING by
    * weekday matters, not the label. */
  private val seasonalStrengthSql: String =
    """WITH s AS (SELECT event_type AS series, CAST(ts AS DATE) AS d,
      |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
      |byd AS (SELECT series, dayofweek(d) AS dow,
      |    CAST(count(*) AS BIGINT) AS c, CAST(sum(x) AS BIGINT) AS sx,
      |    CAST(sum(x * x) AS BIGINT) AS sxx
      |  FROM s GROUP BY 1, 2),
      |sse AS (SELECT series, CAST(sum(c) AS BIGINT) AS n_days,
      |    CAST(sum(sx) AS BIGINT) AS t, CAST(sum(sxx) AS BIGINT) AS sxx,
      |    CAST(sum(CASE WHEN c = 0 THEN 0
      |      ELSE CAST(round(CAST(c * sxx - sx * sx AS DOUBLE)
      |        / CAST(c AS DOUBLE) * 1e9, 0) AS BIGINT) END) AS BIGINT) AS sse_nano
      |  FROM byd GROUP BY 1)
      |SELECT series, n_days,
      |  round(CASE WHEN CAST(round(CAST(n_days * sxx - t * t AS DOUBLE)
      |      / CAST(n_days AS DOUBLE) * 1e9, 0) AS BIGINT) <= 0 THEN 0.0
      |    ELSE greatest(0.0, 1.0 - CAST(sse_nano AS DOUBLE)
      |      / CAST(CAST(round(CAST(n_days * sxx - t * t AS DOUBLE)
      |        / CAST(n_days AS DOUBLE) * 1e9, 0) AS BIGINT) AS DOUBLE))
      |    END, 6) AS strength
      |FROM sse""".stripMargin

  /** q_gwet_ac1: pooled-marginal chance term as the exact long
    * Σ m(2N−m) — mirrored from Evaluation.gwetAC1 over the
    * cohen-kappa label pair. */
  private val gwetAc1Sql: String =
    """WITH t AS (SELECT source, lower(text) AS lt,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'),
      |      x -> x != '') AS toks FROM documents),
      |lab AS (SELECT source AS grp,
      |    CASE WHEN len(list_filter(toks,
      |        x -> x IN ('the','a','of','and','is','to','in','it','that')))
      |      >= len(list_filter(toks,
      |        x -> x IN ('el','la','de','y','es','en','que','los')))
      |      THEN 'en' ELSE 'es' END AS la,
      |    CASE WHEN lt LIKE '% the %' THEN 'en' ELSE 'es' END AS lb FROM t),
      |cells AS MATERIALIZED (SELECT grp, la, lb, CAST(count(*) AS BIGINT) AS c
      |  FROM lab GROUP BY 1, 2, 3),
      |n AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY 1),
      |ag AS (SELECT grp, CAST(sum(c) AS BIGINT) AS agree FROM cells
      |       WHERE la = lb GROUP BY 1),
      |marg AS (SELECT grp, cat, CAST(sum(c) AS BIGINT) AS m FROM (
      |    SELECT grp, la AS cat, c FROM cells
      |    UNION ALL SELECT grp, lb AS cat, c FROM cells)
      |  GROUP BY 1, 2),
      |ch AS (SELECT marg.grp,
      |    CAST(count(DISTINCT cat) AS BIGINT) AS k_cat,
      |    CAST(sum(m * (2 * n.n - m)) AS BIGINT) AS chance_num
      |  FROM marg JOIN n ON n.grp = marg.grp GROUP BY 1),
      |f AS (SELECT n.grp, n.n, ch.k_cat,
      |    CAST(COALESCE(ag.agree, 0) AS DOUBLE) / CAST(n.n AS DOUBLE) AS po,
      |    CAST(ch.chance_num AS DOUBLE)
      |      / (4.0 * CAST(n.n AS DOUBLE) * CAST(n.n AS DOUBLE)
      |         * (CAST(ch.k_cat AS DOUBLE) - 1.0)) AS pe
      |  FROM n LEFT JOIN ag ON ag.grp = n.grp
      |  JOIN ch ON ch.grp = n.grp)
      |SELECT grp, n, k_cat, round(po, 6) AS po,
      |  round(CASE WHEN k_cat <= 1 THEN 0.0 ELSE pe END, 6) AS pe_gamma,
      |  round(CASE WHEN k_cat <= 1 THEN 0.0
      |    WHEN pe = 1.0 THEN 0.0
      |    ELSE (po - pe) / (1.0 - pe) END, 6) AS ac1
      |FROM f""".stripMargin

  /** q_rbo: rank windows with the (score DESC, item ASC) tie-break,
    * depth scaffold, cumulative overlap, and the SAME compiled-in
    * p^{d-1} double literals Evaluation.rboOverlap bakes into its
    * plan — no cross-engine pow(). */
  private val rboSql: String = {
    val k = 20; val p = 0.9
    val pw = (1 to k).map(d =>
      s"($d, ${java.lang.Double.toString(math.pow(p, d - 1))})")
      .mkString(", ")
    val oneMinusP = java.lang.Double.toString(1.0 - p)
    s"""WITH t AS (SELECT doc_id, lang, text, n_chars, $toks AS toks
       |  FROM documents),
       |st AS (SELECT doc_id, lang, n_chars,
       |  CAST(len(toks) AS INTEGER) AS n_tokens,
       |  CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS INTEGER) AS n_punct,
       |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','is','to','in','it','that'))) AS INTEGER) AS n_stopwords,
       |  length(text) AS lt
       |FROM t),
       |q AS (SELECT doc_id, lang, n_chars,
       |  round(CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1) * 0.4
       |      + least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
       |      + (1.0 - CAST(n_punct AS DOUBLE) / greatest(lt, 1)) * 0.2, 6)
       |    AS quality_score
       |FROM st),
       |ra AS (SELECT lang AS grp, doc_id AS item,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY CAST(round(quality_score * 1e6, 0) AS BIGINT) DESC,
       |        doc_id) AS ra
       |  FROM q QUALIFY ra <= $k),
       |rb AS (SELECT lang AS grp, doc_id AS item,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY n_chars DESC, doc_id) AS rb
       |  FROM q QUALIFY rb <= $k),
       |ent AS (SELECT ra.grp, greatest(ra.ra, rb.rb) AS d,
       |    CAST(count(*) AS BIGINT) AS enter
       |  FROM ra JOIN rb ON rb.grp = ra.grp AND rb.item = ra.item
       |  GROUP BY 1, 2),
       |grps AS (SELECT DISTINCT grp FROM ra UNION SELECT DISTINCT grp FROM rb),
       |depths AS (SELECT grps.grp, CAST(u.d AS INTEGER) AS d
       |  FROM grps, unnest(range(1, $k + 1)) AS u(d)),
       |xd AS (SELECT depths.grp, depths.d,
       |    CAST(sum(COALESCE(ent.enter, 0)) OVER (PARTITION BY depths.grp
       |      ORDER BY depths.d
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS xd
       |  FROM depths LEFT JOIN ent ON ent.grp = depths.grp
       |    AND ent.d = depths.d),
       |pw(d, w) AS (VALUES $pw),
       |tm AS (SELECT grp, d, xd,
       |    CAST(round(pw.w * CAST(xd AS DOUBLE) / CAST(d AS DOUBLE) * 1e9, 0)
       |      AS BIGINT) AS term_nano
       |  FROM xd JOIN pw USING (d))
       |SELECT grp, CAST($k AS INTEGER) AS k,
       |  max(CASE WHEN d = $k THEN xd END) AS overlap_k,
       |  round(CAST(sum(term_nano) AS DOUBLE) / 1e9 * $oneMinusP, 6) AS rbo
       |FROM tm GROUP BY 1""".stripMargin
  }

  /** q_trimmed_mean: value-count cumulative windows, integer ⌊N·α⌋,
    * clipped weights and rank-order clamps — all exact longs,
    * mirrored from Evaluation.robustLocation. */
  private val trimmedMeanSql: String =
    """WITH cells AS (SELECT event_type AS grp,
      |    CAST(round(value * 100, 0) AS BIGINT) AS v,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |w AS (SELECT grp, v, c,
      |    CAST(sum(c) OVER (PARTITION BY grp) AS BIGINT) AS n,
      |    CAST(sum(c) OVER (PARTITION BY grp ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM cells),
      |r AS (SELECT grp, v, c, n, cum, cum - c AS cumPrev,
      |    (n * 50000) // 1000000 AS lo FROM w),
      |ag AS (SELECT grp, max(n) AS n, max(lo) AS lo,
      |    CAST(sum(greatest(0, least(cum, n - lo) - greatest(cumPrev, lo)) * v)
      |      AS BIGINT) AS mid_sum,
      |    min(CASE WHEN cum >= lo + 1 THEN v END) AS v_lo,
      |    min(CASE WHEN cum >= n - lo THEN v END) AS v_hi
      |  FROM r GROUP BY 1)
      |SELECT grp, n, lo AS trim_n,
      |  round(CASE WHEN n - 2 * lo <= 0 THEN 0.0
      |    ELSE CAST(mid_sum AS DOUBLE) / CAST(n - 2 * lo AS DOUBLE) END, 6)
      |    AS trimmed_mean,
      |  round(CASE WHEN n - 2 * lo <= 0 THEN 0.0
      |    ELSE CAST(mid_sum + lo * v_lo + lo * v_hi AS DOUBLE)
      |      / CAST(n AS DOUBLE) END, 6) AS winsor_mean
      |FROM ag""".stripMargin

  /** q_assortativity: Newman's r over the symmetrized part↔supplier
    * edges — exact-long numerator/denominator, one division. */
  private val assortativitySql: String =
    """WITH li AS (SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS s
      |            FROM lineitem),
      |e AS (SELECT p AS src, s AS dst FROM li
      |      UNION ALL SELECT s AS src, p AS dst FROM li),
      |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
      |        FROM e GROUP BY 1),
      |paired AS (SELECT da.deg AS dx, db.deg AS dy
      |  FROM e JOIN deg da ON da.node = e.src
      |  JOIN deg db ON db.node = e.dst),
      |ag AS (SELECT CAST(count(*) AS BIGINT) AS m_pairs,
      |    CAST(sum(dx) AS BIGINT) AS sum_x,
      |    CAST(sum(dx * dx) AS BIGINT) AS sum_xx,
      |    CAST(sum(dx * dy) AS BIGINT) AS sum_xy
      |  FROM paired)
      |SELECT m_pairs, sum_x, sum_xx, sum_xy,
      |  round(CASE WHEN m_pairs * sum_xx - sum_x * sum_x = 0 THEN 0.0
      |    ELSE CAST(m_pairs * sum_xy - sum_x * sum_x AS DOUBLE)
      |      / CAST(m_pairs * sum_xx - sum_x * sum_x AS DOUBLE) END, 6) AS r
      |FROM ag""".stripMargin

  /** q_cochran_q: three gates stacked long, complete-panel filter,
    * clear-fraction identity — every term an exact long. */
  private val cochranQSql: String =
    s"""WITH t AS (SELECT doc_id, lang, text, n_chars, $toks AS toks
       |  FROM documents),
       |r AS (SELECT lang AS grp, doc_id AS item, 'len' AS rater,
       |    CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END AS y FROM t
       |  UNION ALL SELECT lang, doc_id, 'tok',
       |    CASE WHEN len(toks) >= 30 THEN 1 ELSE 0 END FROM t
       |  UNION ALL SELECT lang, doc_id, 'the',
       |    CASE WHEN lower(text) LIKE '% the %' THEN 1 ELSE 0 END FROM t),
       |kk AS (SELECT grp, CAST(count(DISTINCT rater) AS BIGINT) AS k
       |  FROM r GROUP BY 1),
       |li AS (SELECT grp, item, CAST(count(*) AS BIGINT) AS nr,
       |    CAST(sum(y) AS BIGINT) AS li FROM r GROUP BY 1, 2),
       |comp AS (SELECT li.grp, li.item, li.li FROM li
       |  JOIN kk USING (grp) WHERE nr = k),
       |ia AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_items,
       |    CAST(sum(li) AS BIGINT) AS n,
       |    CAST(sum(li * li) AS BIGINT) AS l2 FROM comp GROUP BY 1),
       |gj AS (SELECT r.grp, r.rater, CAST(sum(r.y) AS BIGINT) AS gj
       |  FROM r JOIN comp ON comp.grp = r.grp AND comp.item = r.item
       |  GROUP BY 1, 2),
       |g2 AS (SELECT grp, CAST(sum(gj * gj) AS BIGINT) AS g2
       |  FROM gj GROUP BY 1)
       |SELECT kk.grp, k, n_items,
       |  round(CASE WHEN k * n - l2 = 0 THEN 0.0
       |    ELSE CAST((k - 1) * (k * g2 - n * n) AS DOUBLE)
       |      / CAST(k * n - l2 AS DOUBLE) END, 6) AS q
       |FROM kk JOIN ia USING (grp) JOIN g2 USING (grp)""".stripMargin

  /** q_pr_auc: descending distinct-score windows, nano ΔR·P terms
    * summed exactly — mirrored from Evaluation.prAuc. */
  private val prAucSql: String =
    s"""WITH t AS (SELECT doc_id, lang, text, $toks AS toks FROM documents),
       |st AS (SELECT lang, text,
       |  CAST(len(toks) AS INTEGER) AS n_tokens,
       |  CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS INTEGER) AS n_punct,
       |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','is','to','in','it','that'))) AS INTEGER) AS n_stopwords
       |FROM t),
       |q AS (SELECT lang, text,
       |  round(CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1) * 0.4
       |      + least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
       |      + (1.0 - CAST(n_punct AS DOUBLE) / greatest(length(text), 1)) * 0.2, 6)
       |    AS quality_score
       |FROM st),
       |sc AS (SELECT lang AS grp,
       |    CAST(round(quality_score * 1e6, 0) AS BIGINT) AS s,
       |    CASE WHEN lower(text) LIKE '% the %' THEN 1 ELSE 0 END AS y
       |  FROM q),
       |cells AS (SELECT grp, s, CAST(sum(y) AS BIGINT) AS pos,
       |    CAST(count(*) - sum(y) AS BIGINT) AS neg
       |  FROM sc GROUP BY 1, 2),
       |w AS (SELECT grp, pos, neg,
       |    CAST(sum(pos) OVER (PARTITION BY grp ORDER BY s DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
       |    CAST(sum(neg) OVER (PARTITION BY grp ORDER BY s DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp,
       |    CAST(sum(pos) OVER (PARTITION BY grp) AS BIGINT) AS n_pos,
       |    CAST(sum(neg) OVER (PARTITION BY grp) AS BIGINT) AS n_neg
       |  FROM cells),
       |tm AS (SELECT grp, n_pos, n_neg,
       |    CASE WHEN pos = 0 OR n_pos = 0 THEN 0
       |      ELSE CAST(round(((CAST(pos AS DOUBLE) / CAST(n_pos AS DOUBLE))
       |        * (CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))) * 1e9, 0) AS BIGINT)
       |    END AS term_nano
       |  FROM w)
       |SELECT grp, max(n_pos) AS n_pos, max(n_neg) AS n_neg,
       |  round(CASE WHEN max(n_pos) = 0 THEN 0.0
       |    ELSE CAST(sum(term_nano) AS DOUBLE) / 1e9 END, 6) AS pr_auc
       |FROM tm GROUP BY 1""".stripMargin

  /** q_logrank: per-time risk-set windows, nano E/V terms summed
    * exactly — mirrored from Evaluation.logRank over the
    * kaplan-meier lifetimes split by customer-key parity. */
  private val logRankSql: String =
    """WITH pc AS (SELECT o_custkey,
      |    min(CAST(o_orderdate AS DATE)) AS f,
      |    max(CAST(o_orderdate AS DATE)) AS l
      |  FROM orders GROUP BY 1),
      |subj AS (SELECT 'all' AS grp, o_custkey % 2 AS arm,
      |    CAST(floor(date_diff('day', f, l) / 30.0) AS BIGINT) AS t,
      |    CASE WHEN l < DATE '2001-02-01' THEN 1 ELSE 0 END AS event
      |  FROM pc),
      |cells AS (SELECT grp, t,
      |    CAST(sum(arm * event) AS BIGINT) AS d1,
      |    CAST(sum((1 - arm) * event) AS BIGINT) AS d0,
      |    CAST(sum(arm) AS BIGINT) AS all1,
      |    CAST(count(*) AS BIGINT) AS alln
      |  FROM subj GROUP BY 1, 2),
      |r AS (SELECT grp, t, d1, d0, d1 + d0 AS d,
      |    CAST(sum(all1) OVER (PARTITION BY grp) AS BIGINT)
      |      - COALESCE(CAST(sum(all1) OVER (PARTITION BY grp ORDER BY t
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS n1,
      |    CAST(sum(alln) OVER (PARTITION BY grp) AS BIGINT)
      |      - COALESCE(CAST(sum(alln) OVER (PARTITION BY grp ORDER BY t
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS n
      |  FROM cells),
      |tm AS (SELECT grp, d1,
      |    CAST(round((CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9, 0) AS BIGINT) AS e1_nano,
      |    CASE WHEN n <= 1 THEN 0
      |      ELSE CAST(round((CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
      |        * (CAST(n - n1 AS DOUBLE) / CAST(n AS DOUBLE))
      |        * (CAST(n AS DOUBLE) - CAST(d AS DOUBLE))
      |        / (CAST(n AS DOUBLE) - 1.0)) * 1e9, 0) AS BIGINT)
      |    END AS v_nano
      |  FROM r WHERE d > 0),
      |ag AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_times,
      |    CAST(sum(d1) AS BIGINT) AS o1, CAST(sum(e1_nano) AS BIGINT) AS se,
      |    CAST(sum(v_nano) AS BIGINT) AS sv
      |  FROM tm GROUP BY 1)
      |SELECT grp, n_times, o1,
      |  round(CAST(se AS DOUBLE) / 1e9, 6) AS e1,
      |  round(CASE WHEN sv = 0 THEN 0.0
      |    ELSE (CAST(o1 AS DOUBLE) - CAST(se AS DOUBLE) / 1e9)
      |      * (CAST(o1 AS DOUBLE) - CAST(se AS DOUBLE) / 1e9)
      |      / (CAST(sv AS DOUBLE) / 1e9) END, 6) AS chi2
      |FROM ag""".stripMargin

  /** q_effect_size: exact per-arm n/Σy/Σy² longs (cents scale), the
    * unbiased pooled variance, fixed-shape d and Hedges' g. */
  private val effectSizeSql: String = {
    val meanA = "CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE)"
    val meanB = "CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE)"
    val varA = "CAST(n_a * qa - sa * sa AS DOUBLE) " +
      "/ (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0))"
    val varB = "CAST(n_b * qb - sb * sb AS DOUBLE) " +
      "/ (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0))"
    val sp = s"sqrt(((CAST(n_a AS DOUBLE) - 1.0) * ($varA) " +
      s"+ (CAST(n_b AS DOUBLE) - 1.0) * ($varB)) " +
      "/ (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 2.0))"
    val j = "(1.0 - 3.0 / (4.0 * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) - 9.0))"
    val dEff = s"((($meanB) - ($meanA)) / ($sp))"
    s"""WITH ag AS (SELECT event_type AS grp,
       |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN user_id % 2 = 0
       |      THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS sa,
       |    CAST(sum(CASE WHEN user_id % 2 <> 0
       |      THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS sb,
       |    CAST(sum(CASE WHEN user_id % 2 = 0
       |      THEN CAST(round(value * 100, 0) AS BIGINT) * CAST(round(value * 100, 0) AS BIGINT)
       |      ELSE 0 END) AS BIGINT) AS qa,
       |    CAST(sum(CASE WHEN user_id % 2 <> 0
       |      THEN CAST(round(value * 100, 0) AS BIGINT) * CAST(round(value * 100, 0) AS BIGINT)
       |      ELSE 0 END) AS BIGINT) AS qb
       |  FROM events GROUP BY 1)
       |SELECT grp, n_a, n_b,
       |  round(CASE WHEN n_a = 0 THEN 0.0 ELSE $meanA END, 6) AS mean_a,
       |  round(CASE WHEN n_b = 0 THEN 0.0 ELSE $meanB END, 6) AS mean_b,
       |  round(CASE WHEN n_a < 2 OR n_b < 2 THEN 0.0
       |    WHEN ($sp) = 0.0 THEN 0.0 ELSE $dEff END, 6) AS d,
       |  round(CASE WHEN n_a < 2 OR n_b < 2 THEN 0.0
       |    WHEN ($sp) = 0.0 THEN 0.0 ELSE $j * $dEff END, 6) AS g
       |FROM ag""".stripMargin
  }

  /** q_page_hinkley: N-scaled mean-cleared cumsum minus its running
    * min — exact longs end-to-end, mirrored from
    * Timeseries.pageHinkley. */
  private val pageHinkleySql: String =
    """WITH s AS (SELECT event_type AS series, CAST(ts AS DATE) AS d,
      |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
      |tot AS (SELECT series, CAST(sum(n) AS BIGINT) AS t,
      |    CAST(count(*) AS BIGINT) AS nd FROM s GROUP BY 1),
      |dev AS (SELECT s.series, d, n, nd * n - t AS r
      |  FROM s JOIN tot USING (series)),
      |cum AS (SELECT series, d, n,
      |    CAST(sum(r) OVER w AS BIGINT) AS m
      |  FROM dev WINDOW w AS (PARTITION BY series ORDER BY d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |ph AS (SELECT series, d, n,
      |    m - min(m) OVER w AS ph_scaled
      |  FROM cum WINDOW w AS (PARTITION BY series ORDER BY d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |pk AS (SELECT series, max(ph_scaled) AS peak FROM ph GROUP BY 1)
      |SELECT ph.series, d, n, ph_scaled,
      |  (ph_scaled = peak AND peak > 0) AS is_peak
      |FROM ph JOIN pk USING (series)""".stripMargin

  /** The shared Mann–Whitney replay chain (quality scores → per-lang
    * ' the ' arms → (grp, value) cells → rank rollup `ag` with exact
    * n_a/n_b/u2/tie3 longs) — consumed by the q_mann_whitney z oracle
    * and the q_cliffs_delta effect-size oracle, mirroring the
    * engine's shared mwAgg. */
  private val mwChainCtes: String =
    s"""WITH t AS (SELECT doc_id, lang, text, $toks AS toks FROM documents),
       |st AS (SELECT lang, text,
       |  CAST(len(toks) AS INTEGER) AS n_tokens,
       |  CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS INTEGER) AS n_punct,
       |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','is','to','in','it','that'))) AS INTEGER) AS n_stopwords
       |FROM t),
       |q AS (SELECT lang, text,
       |  round(CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1) * 0.4
       |      + least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
       |      + (1.0 - CAST(n_punct AS DOUBLE) / greatest(length(text), 1)) * 0.2, 6)
       |    AS quality_score
       |FROM st),
       |sc AS (SELECT lang AS grp,
       |    CASE WHEN lower(text) LIKE '% the %' THEN 1 ELSE 0 END AS arm,
       |    CAST(round(quality_score * 1e6, 0) AS BIGINT) AS v
       |  FROM q),
       |cells AS (SELECT grp, v,
       |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na_v,
       |    CAST(sum(CASE WHEN arm <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS nb_v
       |  FROM sc GROUP BY 1, 2),
       |w AS (SELECT grp, na_v, nb_v,
       |    COALESCE(CAST(sum(na_v) OVER (PARTITION BY grp ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
       |      AS abelow
       |  FROM cells),
       |ag AS (SELECT grp, CAST(sum(na_v) AS BIGINT) AS n_a,
       |    CAST(sum(nb_v) AS BIGINT) AS n_b,
       |    CAST(sum(nb_v * (2 * abelow + na_v)) AS BIGINT) AS u2,
       |    CAST(sum((na_v + nb_v) * (na_v + nb_v) * (na_v + nb_v)
       |      - (na_v + nb_v)) AS BIGINT) AS tie3
       |  FROM w GROUP BY 1)""".stripMargin

  /** q_mann_whitney: rank-sum via distinct-value count windows (the
    * aucRoc/delong discipline), exact u2/tie longs, one fixed-shape z. */
  private val mannWhitneySql: String = {
    val varU = "CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 * " +
      "((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0) - " +
      "CAST(tie3 AS DOUBLE) / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) " +
      "* (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1.0)))"
    s"""$mwChainCtes
       |SELECT grp, n_a, n_b, u2,
       |  round(CASE WHEN n_a = 0 OR n_b = 0 THEN 0.0
       |    WHEN ($varU) <= 0.0 THEN 0.0
       |    ELSE (CAST(u2 AS DOUBLE) - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
       |      / (2.0 * sqrt($varU)) END, 6) AS z
       |FROM ag""".stripMargin
  }

  /** q_cliffs_delta: the mwChainCtes rank rollup finished into the
    * ordinal effect size δ = u2/(n_a·n_b) − 1, banded on the 6dp
    * value — mirrored from Evaluation.cliffsDelta. */
  private val cliffsDeltaSql: String = {
    val delta = "round(CASE WHEN n_a = 0 OR n_b = 0 THEN 0.0 " +
      "ELSE CAST(u2 AS DOUBLE) / (CAST(n_a AS DOUBLE) " +
      "* CAST(n_b AS DOUBLE)) - 1.0 END, 6)"
    s"""$mwChainCtes
       |SELECT grp, n_a, n_b, u2, $delta AS delta,
       |  CASE WHEN n_a = 0 OR n_b = 0 THEN 'none'
       |    WHEN abs($delta) < 0.147 THEN 'negligible'
       |    WHEN abs($delta) < 0.33 THEN 'small'
       |    WHEN abs($delta) < 0.474 THEN 'medium'
       |    ELSE 'large' END AS magnitude
       |FROM ag""".stripMargin
  }

  /** q_hosmer_lemeshow: the calibrationState replay finished into the
    * HL χ² — per-bin NANO (O−E)²/(E(1−E/n)) terms, degenerate bins
    * excluded-and-counted — mirrored from Evaluation.hosmerLemeshow. */
  private val hosmerLemeshowSql: String = {
    val e = "(CAST(sum_p AS DOUBLE) / 1e6)"
    val denom = s"($e * (1.0 - $e / CAST(n_bin AS DOUBLE)))"
    s"""WITH t AS (SELECT lower(text) AS lt,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |      x -> x != '') AS toks FROM documents),
       |pred AS (SELECT
       |    least(1000000, CAST(len(list_filter(toks,
       |      x -> x IN ('the','a','of','and','is','to','in','it','that')))
       |      AS BIGINT) * 125000) AS p,
       |    CASE WHEN lt LIKE '% the %' THEN 1 ELSE 0 END AS y FROM t),
       |binned AS (SELECT
       |    CAST(least(floor(p * 10 / 1000000), 9) AS BIGINT) AS bin, p, y
       |  FROM pred),
       |st AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_bin,
       |    CAST(sum(p) AS BIGINT) AS sum_p, CAST(sum(y) AS BIGINT) AS pos
       |  FROM binned GROUP BY 1),
       |tm AS (SELECT n_bin,
       |    CASE WHEN $denom <= 0.0 THEN 0
       |      ELSE CAST(round((CAST(pos AS DOUBLE) - $e)
       |        * (CAST(pos AS DOUBLE) - $e) / $denom * 1e9, 0) AS BIGINT)
       |    END AS t_nano,
       |    CASE WHEN $denom <= 0.0 THEN 0 ELSE 1 END AS used
       |  FROM st)
       |SELECT CAST(sum(n_bin) AS BIGINT) AS n,
       |  CAST(count(*) AS BIGINT) AS n_bins,
       |  CAST(sum(used) AS BIGINT) AS bins_used,
       |  round(CAST(sum(t_nano) AS DOUBLE) / 1e9, 6) AS hl,
       |  greatest(CAST(sum(used) AS BIGINT) - 2, 0) AS df
       |FROM tm""".stripMargin
  }

  /** q_fdr_bh: abTest z replay (6dp, the published statistic), the
    * Chernoff-bound p, then the step-up windows — raw adjusted values
    * 9dp-rounded BEFORE the running min, exactly as bhAdjust. */
  private val fdrBhSql: String = {
    val pa = "CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
    val pb = "CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)"
    val pool = "CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)"
    val se = s"sqrt(($pool) * (1.0 - ($pool)) * " +
      "(1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))"
    s"""WITH cells AS (SELECT event_type AS grp,
       |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN user_id % 2 = 0 AND value > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS conv_a,
       |    CAST(sum(CASE WHEN user_id % 2 <> 0 AND value > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS conv_b
       |  FROM events GROUP BY 1),
       |zt AS (SELECT grp,
       |    round(CASE WHEN n_a = 0 OR n_b = 0 THEN 0.0
       |      WHEN ($se) = 0.0 THEN 0.0
       |      ELSE (($pa) - ($pb)) / ($se) END, 6) AS z
       |  FROM cells),
       |p AS (SELECT 'all' AS grp, grp AS test,
       |    CAST(round(least(1.0, 2.0 * exp(-(z * z) / 2.0)) * 1e6, 0) AS BIGINT) AS p_micro
       |  FROM zt),
       |r AS (SELECT grp, test, p_micro,
       |    CAST(row_number() OVER (PARTITION BY grp ORDER BY p_micro, test) AS BIGINT) AS rnk,
       |    CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS m
       |  FROM p),
       |raw AS (SELECT grp, test, p_micro, rnk, m,
       |    round(CAST(p_micro * m AS DOUBLE) / (1e6 * CAST(rnk AS DOUBLE)), 9) AS rawv
       |  FROM r),
       |adj AS (SELECT grp, test, p_micro, rnk, m,
       |    round(least(1.0, min(rawv) OVER (PARTITION BY grp
       |      ORDER BY p_micro DESC, test DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) AS p_adj
       |  FROM raw)
       |SELECT grp, test, p_micro, rnk, m, p_adj, p_adj <= 0.05 AS reject
       |FROM adj""".stripMargin
  }

  /** q_mantel_haenszel: per-stratum 2×2 cells, nano-rounded R/S/E/Var
    * terms summed exactly, fixed-shape OR_MH and continuity-corrected
    * CMH χ² — mirrored from Evaluation.mantelHaenszel. */
  private val mantelHaenszelSql: String = {
    val dev = "abs(CAST(sum_a AS DOUBLE) - CAST(sum_e AS DOUBLE) / 1e9) - 0.5"
    s"""WITH cells AS (SELECT 'all' AS grp, event_type AS stratum,
       |    CAST(sum(CASE WHEN user_id % 2 <> 0 AND value > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
       |    CAST(sum(CASE WHEN user_id % 2 <> 0 AND NOT (value > 50.0) THEN 1 ELSE 0 END) AS BIGINT) AS b,
       |    CAST(sum(CASE WHEN user_id % 2 = 0 AND value > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS c,
       |    CAST(sum(CASE WHEN user_id % 2 = 0 AND NOT (value > 50.0) THEN 1 ELSE 0 END) AS BIGINT) AS d,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2 HAVING count(*) >= 2),
       |t AS (SELECT grp, a,
       |    CAST(round((CAST(a AS DOUBLE) * CAST(d AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9, 0) AS BIGINT) AS r_nano,
       |    CAST(round((CAST(b AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9, 0) AS BIGINT) AS s_nano,
       |    CAST(round((CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9, 0) AS BIGINT) AS e_nano,
       |    CAST(round((CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE) * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)
       |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) * 1e9, 0) AS BIGINT) AS v_nano
       |  FROM cells),
       |ag AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_strata,
       |    CAST(sum(a) AS BIGINT) AS sum_a, CAST(sum(r_nano) AS BIGINT) AS sum_r,
       |    CAST(sum(s_nano) AS BIGINT) AS sum_s, CAST(sum(e_nano) AS BIGINT) AS sum_e,
       |    CAST(sum(v_nano) AS BIGINT) AS sum_v
       |  FROM t GROUP BY 1)
       |SELECT grp, n_strata, sum_a,
       |  round(CASE WHEN sum_s = 0 THEN 0.0
       |    ELSE CAST(sum_r AS DOUBLE) / CAST(sum_s AS DOUBLE) END, 6) AS or_mh,
       |  round(CASE WHEN sum_v = 0 THEN 0.0
       |    ELSE greatest($dev, 0.0) * greatest($dev, 0.0)
       |      / (CAST(sum_v AS DOUBLE) / 1e9) END, 6) AS chi2
       |FROM ag""".stripMargin
  }

  /** q_js_divergence: vocab cells → totals → nano-rounded ln terms
    * summed exactly — mirrored from Evaluation.jsDivergence (the
    * ln-at-nano discipline of the logprob oracles). */
  private val jsDivergenceSql: String =
    s"""WITH tk AS (SELECT lang AS grp, doc_id % 2 AS side, u.tok AS tok
       |    FROM (SELECT lang, doc_id, $toks AS toks FROM documents),
       |    unnest(toks) AS u(tok)),
       |cells AS (SELECT grp, tok,
       |    CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |    CAST(sum(CASE WHEN side <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS cb
       |  FROM tk GROUP BY 1, 2),
       |tot AS (SELECT grp, CAST(sum(ca) AS BIGINT) AS n_a,
       |    CAST(sum(cb) AS BIGINT) AS n_b, CAST(count(*) AS BIGINT) AS vocab
       |  FROM cells GROUP BY 1),
       |pq AS (SELECT c.grp, c.ca, c.cb, t.n_a, t.n_b,
       |    CAST(c.ca AS DOUBLE) / CAST(t.n_a AS DOUBLE) AS pa,
       |    CAST(c.cb AS DOUBLE) / CAST(t.n_b AS DOUBLE) AS qa
       |  FROM cells c JOIN tot t USING (grp)),
       |terms AS (SELECT grp,
       |    CASE WHEN ca = 0 OR n_a = 0 THEN 0
       |      ELSE CAST(round((pa * ln(2.0 * pa / (pa + qa))) * 1e9, 0) AS BIGINT)
       |    END AS tp,
       |    CASE WHEN cb = 0 OR n_b = 0 THEN 0
       |      ELSE CAST(round((qa * ln(2.0 * qa / (pa + qa))) * 1e9, 0) AS BIGINT)
       |    END AS tq
       |  FROM pq),
       |ag AS (SELECT grp, CAST(sum(tp) AS BIGINT) AS sp,
       |    CAST(sum(tq) AS BIGINT) AS sq FROM terms GROUP BY 1)
       |SELECT t.grp, t.n_a, t.n_b, t.vocab,
       |  round(CASE WHEN t.n_a = 0 OR t.n_b = 0 THEN 0.0
       |    ELSE CAST(sp + sq AS DOUBLE) / 2e9 END, 6) AS js_nats,
       |  round(CASE WHEN t.n_a = 0 OR t.n_b = 0 THEN 0.0
       |    ELSE CAST(sp + sq AS DOUBLE) / 2e9 / 0.6931471805599453 END, 6) AS js_bits
       |FROM tot t JOIN ag USING (grp)""".stripMargin

  /** q_kaplan_meier: risk-set windows over bucketed lifetimes,
    * nano-rounded ln factors cumulated exactly, died-out flag pins
    * S = 0 — mirrored from Evaluation.kaplanMeier. */
  /** q_changepoint: prefix-sum SSE scan over the per-series daily
    * table, micro-rounded gains, row_number argmax (ties to the
    * earliest day — the engine's struct-min order) — mirrored from
    * Timeseries.changePoint. */
  private val changepointSql: String = {
    def dd(c: String) = s"CAST($c AS DOUBLE)"
    val sseT = s"(${dd("tss")} - ${dd("ts_")} * ${dd("ts_")} / ${dd("nd")})"
    val sseL = s"(${dd("css")} - ${dd("cs")} * ${dd("cs")} / ${dd("i")})"
    val sseR = s"((${dd("tss")} - ${dd("css")}) - (${dd("ts_")} - ${dd("cs")})" +
      s" * (${dd("ts_")} - ${dd("cs")}) / (${dd("nd")} - ${dd("i")}))"
    s"""WITH s AS (SELECT event_type AS series, CAST(ts AS DATE) AS d,
       |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
       |w AS (SELECT series, d,
       |    CAST(count(*) OVER wc AS BIGINT) AS i,
       |    CAST(sum(n) OVER wc AS BIGINT) AS cs,
       |    CAST(sum(n * n) OVER wc AS BIGINT) AS css,
       |    CAST(count(*) OVER wa AS BIGINT) AS nd,
       |    CAST(sum(n) OVER wa AS BIGINT) AS ts_,
       |    CAST(sum(n * n) OVER wa AS BIGINT) AS tss
       |  FROM s WINDOW wc AS (PARTITION BY series ORDER BY d
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |  wa AS (PARTITION BY series)),
       |cand AS (SELECT series, d, i, cs, nd, ts_,
       |    CAST(round(($sseT - $sseL - $sseR) * 1e6, 0) AS BIGINT)
       |      AS gain_micro
       |  FROM w WHERE i < nd),
       |pick AS (SELECT *, row_number() OVER (PARTITION BY series
       |    ORDER BY gain_micro DESC, d) AS rn FROM cand)
       |SELECT series, nd AS n_days, d AS cp_d, i AS n_left,
       |  round(CAST(cs AS DOUBLE) / CAST(i AS DOUBLE), 6) AS mean_left,
       |  round(CAST(ts_ - cs AS DOUBLE) / CAST(nd - i AS DOUBLE), 6)
       |    AS mean_right,
       |  round(CAST(gain_micro AS DOUBLE) / 1e6, 6) AS gain
       |FROM pick WHERE rn = 1""".stripMargin
  }

  /** q_local_clustering: the q_triangles degree-orientation replay,
    * with each closed triangle exploded to its three member credits —
    * mirrored from Graph.localClustering. */
  /** q_rich_club: node/min-endpoint-degree histograms, exact
    * threshold sums per k rung, one φ division — mirrored from
    * Graph.richClub. */
  private val richClubSql: String =
    """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |e0 AS (SELECT a.pk AS s, b.pk AS d FROM li a
      |  JOIN li b ON b.ok = a.ok AND a.pk < b.pk),
      |und AS (SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
      |  FROM e0 WHERE s != d),
      |deg AS (SELECT n, CAST(count(*) AS BIGINT) AS deg FROM (
      |    SELECT u AS n FROM und UNION ALL SELECT v AS n FROM und)
      |  GROUP BY 1),
      |nh AS (SELECT deg, CAST(count(*) AS BIGINT) AS nn FROM deg
      |  GROUP BY 1),
      |eh AS (SELECT least(du.deg, dv.deg) AS mdeg,
      |    CAST(count(*) AS BIGINT) AS ne
      |  FROM und JOIN deg du ON du.n = und.u
      |  JOIN deg dv ON dv.n = und.v
      |  GROUP BY 1),
      |ks AS (SELECT CAST(unnest([1, 2, 4, 8, 16, 32]) AS INTEGER) AS k),
      |nk AS (SELECT k, CAST(sum(CASE WHEN deg > k THEN nn ELSE 0 END)
      |    AS BIGINT) AS n_nodes FROM ks CROSS JOIN nh GROUP BY 1),
      |ek AS (SELECT k, CAST(sum(CASE WHEN mdeg > k THEN ne ELSE 0 END)
      |    AS BIGINT) AS n_edges FROM ks CROSS JOIN eh GROUP BY 1)
      |SELECT nk.k, n_nodes, n_edges,
      |  round(CASE WHEN n_nodes < 2 THEN 0.0
      |    ELSE 2.0 * CAST(n_edges AS DOUBLE)
      |      / CAST(n_nodes * (n_nodes - 1) AS DOUBLE) END, 6) AS phi
      |FROM nk JOIN ek ON ek.k = nk.k""".stripMargin

  /** q_ktruss: the kCore-oracle unroll pattern on EDGE supports —
    * `rounds` peel rounds (fixpoint-idempotent, so extra rounds are
    * no-ops once the engine's convergence is reached), each a both-
    * directions wedge join; final supports recomputed on the
    * surviving set — mirrored from Graph.kTruss (k = 4).
    *
    * UNROLL-COUNT PIN: the sf0.1 lineitem co-occurrence graph needs
    * 8 synchronous peel rounds (measured removal shells: 61,909 →
    * 22,380 → 1,719 → 658 → 81 → 21 → 4 → 0; 1,109,228 surviving
    * edges), and sf0.01 converged inside the 8-round unroll through
    * r15, so rounds = 12 carries headroom at both sweep scales. The
    * engine peels to convergence (worklist fast path, or the
    * distributed loop's maxRounds = 30) —
    * if the data scale or slice ever changes, a not-yet-converged
    * oracle would flag a FALSE mismatch: re-check the convergence
    * round count at the new scale and keep rounds comfortably above
    * it. Each extra round costs DuckDB one more wedge-join pass over
    * the (converged, unchanged) edge set — cheap at the sf0.01 the
    * correctness sweep runs at, so headroom is affordable. */
  private val kTrussSql: String = {
    val rounds = 12
    ("""WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok,
      |    l_partkey AS pk FROM lineitem),
      |e0 AS MATERIALIZED (SELECT DISTINCT a.pk AS u, b.pk AS v FROM li a
      |  JOIN li b ON a.ok = b.ok AND a.pk < b.pk)""" +
      (1 to rounds).map { n =>
        s""",
          |b$n AS MATERIALIZED (SELECT u AS src, v AS dst FROM e${n - 1}
          |  UNION ALL SELECT v AS src, u AS dst FROM e${n - 1}),
          |s$n AS MATERIALIZED (SELECT e.u, e.v, CAST(count(*) AS BIGINT) AS s
          |  FROM e${n - 1} e JOIN b$n x ON x.src = e.u
          |  JOIN b$n y ON y.src = e.v AND y.dst = x.dst
          |  GROUP BY 1, 2),
          |e$n AS MATERIALIZED (SELECT e.u, e.v FROM e${n - 1} e
          |  JOIN s$n s ON s.u = e.u AND s.v = e.v AND s.s >= 2)"""
      }.mkString +
      s""",
        |bf AS MATERIALIZED (SELECT u AS src, v AS dst FROM e$rounds
        |  UNION ALL SELECT v AS src, u AS dst FROM e$rounds),
        |sf AS MATERIALIZED (SELECT e.u, e.v, CAST(count(*) AS BIGINT) AS s
        |  FROM e$rounds e JOIN bf x ON x.src = e.u
        |  JOIN bf y ON y.src = e.v AND y.dst = x.dst GROUP BY 1, 2)
        |SELECT e.u AS src, e.v AS dst, COALESCE(sf.s, 0) AS support
        |FROM e$rounds e LEFT JOIN sf ON sf.u = e.u AND sf.v = e.v""")
      .stripMargin
  }

  /** q_boxplot: doubled median + type-1 quartiles from cumulative
    * value counts; Tukey fences compared in doubled units — mirrored
    * from Profiler.boxplotStats. */
  private val boxplotSql: String =
    """WITH src AS (SELECT o_orderpriority AS grp,
      |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v FROM orders),
      |cells AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS cnt
      |  FROM src GROUP BY 1, 2),
      |sc AS (SELECT grp, v, cnt,
      |    CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum,
      |    CAST(sum(cnt) OVER (PARTITION BY grp) AS BIGINT) AS n
      |  FROM cells),
      |st AS (SELECT grp, max(n) AS n, min(v) AS v_min, max(v) AS v_max,
      |    min(CASE WHEN cum >= (n + 3) // 4 THEN v END) AS q1,
      |    min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS m_lo,
      |    min(CASE WHEN cum >= n // 2 + 1 THEN v END) AS m_hi,
      |    min(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS q3
      |  FROM sc GROUP BY 1),
      |fn AS (SELECT grp AS fg, q1, q3,
      |    2 * q1 - 3 * (q3 - q1) AS lo2, 2 * q3 + 3 * (q3 - q1) AS hi2
      |  FROM st),
      |ol AS (SELECT cells.grp,
      |    CAST(sum(CASE WHEN 2 * v < lo2 THEN cnt ELSE 0 END) AS BIGINT)
      |      AS n_low_outliers,
      |    CAST(sum(CASE WHEN 2 * v > hi2 THEN cnt ELSE 0 END) AS BIGINT)
      |      AS n_high_outliers
      |  FROM cells JOIN fn ON fn.fg = cells.grp GROUP BY 1)
      |SELECT st.grp, n, v_min, q1,
      |  round(CAST(m_lo + m_hi AS DOUBLE) / 2.0, 6) AS median,
      |  q3, v_max, q3 - q1 AS iqr, n_low_outliers, n_high_outliers
      |FROM st JOIN ol ON ol.grp = st.grp""".stripMargin

  /** q_gini: rank-weighted value sum folded per (group, value) cell
    * (exact tie identity), one G division — mirrored from
    * Curation.giniValue. */
  private val giniSql: String =
    """WITH src AS (SELECT o_orderpriority AS grp,
      |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v FROM orders),
      |cells AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS cnt
      |  FROM src GROUP BY 1, 2),
      |r AS (SELECT grp, v, cnt,
      |    COALESCE(CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      |      0) AS b
      |  FROM cells),
      |ag AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS n,
      |    CAST(sum(v * cnt) AS BIGINT) AS total,
      |    CAST(sum(v * (b * cnt + (cnt * (cnt + 1)) // 2)) AS BIGINT)
      |      AS iwx
      |  FROM r GROUP BY 1)
      |SELECT grp, n, total,
      |  round(CASE WHEN n < 2 OR total <= 0 THEN 0.0
      |    ELSE (2.0 * CAST(iwx AS DOUBLE)
      |      - (CAST(n AS DOUBLE) + 1.0) * CAST(total AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE)) END, 6) AS gini
      |FROM ag""".stripMargin

  private val localClusteringSql: String =
    """WITH pairs AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u,
      |    b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |deg AS MATERIALIZED (SELECT node, CAST(count(*) AS BIGINT) AS deg
      |  FROM (SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs) x
      |  GROUP BY node),
      |o AS MATERIALIZED (SELECT
      |    CASE WHEN (du.deg, p.u) > (dv.deg, p.v) THEN p.v ELSE p.u END AS src,
      |    CASE WHEN (du.deg, p.u) > (dv.deg, p.v) THEN p.u ELSE p.v END AS dst
      |  FROM pairs p JOIN deg du ON du.node = p.u JOIN deg dv ON dv.node = p.v),
      |tri AS MATERIALIZED (SELECT e.src AS a, e.dst AS b, x.dst AS w
      |  FROM o e JOIN o x ON x.src = e.src
      |  JOIN o y ON y.src = e.dst AND y.dst = x.dst),
      |cr AS (SELECT node, CAST(count(*) AS BIGINT) AS tri
      |  FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
      |        UNION ALL SELECT w FROM tri) z
      |  GROUP BY 1)
      |SELECT deg.node, deg.deg, COALESCE(cr.tri, 0) AS tri,
      |  round(CASE WHEN deg.deg < 2 THEN 0.0
      |    ELSE 2.0 * CAST(COALESCE(cr.tri, 0) AS DOUBLE)
      |      / CAST(deg.deg * (deg.deg - 1) AS DOUBLE) END, 6) AS lcc
      |FROM deg LEFT JOIN cr ON cr.node = deg.node""".stripMargin

  /** q_lift_gain: the quality-score replay feeding whole-cell decile
    * assignment (⌈cum·B/N⌉ on the distinct-score table — ties can
    * never straddle a boundary), exact cumulatives, single divisions —
    * mirrored from Evaluation.liftGain. */
  private val liftGainSql: String =
    s"""WITH t AS (SELECT doc_id, lang, text, $toks AS toks FROM documents),
       |st0 AS (SELECT lang,
       |  CAST(len(toks) AS INTEGER) AS n_tokens,
       |  CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS INTEGER) AS n_punct,
       |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','is','to','in','it','that'))) AS INTEGER) AS n_stopwords,
       |  length(text) AS n_chars
       |FROM t),
       |q AS (SELECT lang,
       |  round(CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1) * 0.4
       |      + least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
       |      + (1.0 - CAST(n_punct AS DOUBLE) / greatest(n_chars, 1)) * 0.2, 6)
       |    AS quality_score
       |FROM st0),
       |sc AS (SELECT 'all' AS grp,
       |    CAST(round(quality_score * 1e6, 0) AS BIGINT) AS score,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM q),
       |cells AS (SELECT grp, score, CAST(count(*) AS BIGINT) AS cnt,
       |    CAST(sum(CASE WHEN y <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS pos
       |  FROM sc GROUP BY 1, 2),
       |b AS (SELECT grp, score, cnt, pos,
       |    CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY score DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum,
       |    CAST(sum(cnt) OVER (PARTITION BY grp) AS BIGINT) AS n_total,
       |    CAST(sum(pos) OVER (PARTITION BY grp) AS BIGINT) AS p_total
       |  FROM cells),
       |bn AS (SELECT grp, (cum * 10 + n_total - 1) // n_total AS bucket,
       |    cnt, pos, n_total, p_total FROM b),
       |pb AS (SELECT grp, bucket, CAST(sum(cnt) AS BIGINT) AS n,
       |    CAST(sum(pos) AS BIGINT) AS pos,
       |    max(n_total) AS n_total, max(p_total) AS p_total
       |  FROM bn GROUP BY 1, 2),
       |fin AS (SELECT grp, bucket, n, pos,
       |    CAST(sum(n) OVER wb AS BIGINT) AS cum_n,
       |    CAST(sum(pos) OVER wb AS BIGINT) AS cum_pos, n_total, p_total
       |  FROM pb WINDOW wb AS (PARTITION BY grp ORDER BY bucket
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT grp, bucket, n, pos, cum_n, cum_pos,
       |  round(CASE WHEN p_total = 0 THEN 0.0
       |    ELSE CAST(cum_pos AS DOUBLE) / CAST(p_total AS DOUBLE) END, 6)
       |    AS gain,
       |  round(CASE WHEN p_total = 0 THEN 0.0
       |    ELSE (CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE))
       |      / (CAST(p_total AS DOUBLE) / CAST(n_total AS DOUBLE)) END, 6)
       |    AS lift
       |FROM fin""".stripMargin

  /** q_column_mi: per-pair joint grids, nano-rounded p·ln terms and
    * marginal entropies, union of single-row pair results — mirrored
    * from Curation.columnMi (the profiling columns are non-null, so
    * the (is_null, value) key reduces to the value). */
  private val columnMiSql: String = {
    def pairBlock(a: String, b: String): String = {
      val term = "CAST(round(CAST(c AS DOUBLE) / CAST(n AS DOUBLE) " +
        "* ln(CAST(n AS DOUBLE) * CAST(c AS DOUBLE) " +
        "/ (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))) * 1e9, 0) AS BIGINT)"
      def ent(cc: String) = s"CAST(round(CAST($cc AS DOUBLE) " +
        s"/ CAST(n AS DOUBLE) * ln(CAST($cc AS DOUBLE) " +
        s"/ CAST(n AS DOUBLE)) * 1e9, 0) AS BIGINT)"
      s"""SELECT '$a' AS lhs, '$b' AS rhs, n, grid_cells,
         |  round(CAST(mi_nano AS DOUBLE) / 1e9, 6) AS mi_nats,
         |  round(CAST(h_cx AS DOUBLE) / 1e9, 6) AS h_lhs,
         |  round(CAST(h_cy AS DOUBLE) / 1e9, 6) AS h_rhs,
         |  round(CASE WHEN least(h_cx, h_cy) <= 0 THEN 0.0
         |    ELSE CAST(mi_nano AS DOUBLE)
         |      / CAST(least(h_cx, h_cy) AS DOUBLE) END, 6) AS nmi
         |FROM (
         |  SELECT
         |    (SELECT CAST(sum(c) AS BIGINT) FROM g_${a}_$b) AS n,
         |    (SELECT CAST(count(*) AS BIGINT) FROM g_${a}_$b) AS grid_cells,
         |    (SELECT COALESCE(CAST(sum($term) AS BIGINT), 0) FROM
         |      (SELECT g.c, mx.cx, my.cy, t.n FROM g_${a}_$b g
         |       JOIN (SELECT x, CAST(sum(c) AS BIGINT) AS cx
         |             FROM g_${a}_$b GROUP BY 1) mx ON mx.x = g.x
         |       JOIN (SELECT y, CAST(sum(c) AS BIGINT) AS cy
         |             FROM g_${a}_$b GROUP BY 1) my ON my.y = g.y
         |       CROSS JOIN (SELECT CAST(sum(c) AS BIGINT) AS n
         |             FROM g_${a}_$b) t) z) AS mi_nano,
         |    (SELECT COALESCE(-CAST(sum(${ent("cx")}) AS BIGINT), 0) FROM
         |      (SELECT cx, n FROM (SELECT x, CAST(sum(c) AS BIGINT) AS cx
         |          FROM g_${a}_$b GROUP BY 1) m
         |        CROSS JOIN (SELECT CAST(sum(c) AS BIGINT) AS n
         |          FROM g_${a}_$b) t) z) AS h_cx,
         |    (SELECT COALESCE(-CAST(sum(${ent("cy")}) AS BIGINT), 0) FROM
         |      (SELECT cy, n FROM (SELECT y, CAST(sum(c) AS BIGINT) AS cy
         |          FROM g_${a}_$b GROUP BY 1) m
         |        CROSS JOIN (SELECT CAST(sum(c) AS BIGINT) AS n
         |          FROM g_${a}_$b) t) z) AS h_cy
         |) f""".stripMargin
    }
    val grids = Seq(("status", "priority"), ("status", "month"),
      ("priority", "month")).map { case (a, b) =>
      s"""g_${a}_$b AS MATERIALIZED (SELECT $a AS x, $b AS y,
         |    CAST(count(*) AS BIGINT) AS c FROM src GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val blocks = Seq(("status", "priority"), ("status", "month"),
      ("priority", "month")).map { case (a, b) => pairBlock(a, b) }
      .mkString("\nUNION ALL\n")
    s"""WITH src AS MATERIALIZED (SELECT o_orderstatus AS status,
       |    o_orderpriority AS priority,
       |    strftime(o_orderdate, '%Y-%m') AS month FROM orders),
       |$grids
       |$blocks""".stripMargin
  }

  /** q_dp_dispersion: portable-hash token cells, window-rank replay
    * of the bounded-heap top-K (count desc, hash asc), the dense
    * term × source deviation grid with micro-rounded terms — mirrored
    * from TextAnalysis.dpDispersion. */
  private val dpDispersionSql: String =
    s"""WITH tok AS (SELECT source,
       |    CAST(concat('0x', substr(md5('dp|' || t.tok), 1, 15)) AS BIGINT)
       |      AS h
       |  FROM (SELECT source, $toks AS toks FROM documents) d,
       |    unnest(toks) AS t(tok)),
       |base AS MATERIALIZED (SELECT source, h, CAST(count(*) AS BIGINT) AS c
       |  FROM tok GROUP BY 1, 2),
       |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS s_n
       |  FROM base GROUP BY 1),
       |nc AS (SELECT CAST(sum(s_n) AS BIGINT) AS n_corpus FROM st),
       |tt AS (SELECT h, CAST(sum(c) AS BIGINT) AS total
       |  FROM base GROUP BY 1),
       |top AS (SELECT h, total FROM (SELECT h, total, row_number() OVER (
       |    ORDER BY total DESC, h ASC) AS rn FROM tt) z WHERE rn <= 20),
       |grid AS (SELECT top.h, top.total, st.source, st.s_n, nc.n_corpus,
       |    COALESCE(base.c, 0) AS c
       |  FROM top CROSS JOIN st CROSS JOIN nc
       |  LEFT JOIN base ON base.source = st.source AND base.h = top.h),
       |dev AS (SELECT h, total,
       |    CAST(round(abs(CAST(c AS DOUBLE) / CAST(total AS DOUBLE)
       |      - CAST(s_n AS DOUBLE) / CAST(n_corpus AS DOUBLE)) * 1e6, 0)
       |      AS BIGINT) AS dev_micro
       |  FROM grid)
       |SELECT h, max(total) AS total,
       |  round(CAST(sum(dev_micro) AS DOUBLE) / 2e6, 6) AS dp
       |FROM dev GROUP BY 1""".stripMargin

  /** q_durbin_watson: N-scaled integer residuals (the acf discipline),
    * exact-long lag-difference and variance sums, one division —
    * mirrored from Timeseries.durbinWatson. */
  private val durbinWatsonSql: String =
    """WITH s AS (SELECT event_type AS series, CAST(ts AS DATE) AS d,
      |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
      |w AS (SELECT series, d, n,
      |    CAST(count(*) OVER (PARTITION BY series) AS BIGINT) AS nd,
      |    CAST(sum(n) OVER (PARTITION BY series) AS BIGINT) AS t
      |  FROM s),
      |r AS (SELECT series, d, nd, nd * n - t AS r FROM w),
      |l AS (SELECT series, nd, r,
      |    lag(r) OVER (PARTITION BY series ORDER BY d) AS rp FROM r),
      |ag AS (SELECT series, max(nd) AS n_days,
      |    CAST(sum(r * r) AS BIGINT) AS den,
      |    CAST(sum(CASE WHEN rp IS NULL THEN 0
      |      ELSE (r - rp) * (r - rp) END) AS BIGINT) AS num
      |  FROM l GROUP BY 1)
      |SELECT series, n_days,
      |  round(CASE WHEN n_days < 2 OR den = 0 THEN 0.0
      |    ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END, 6) AS dw
      |FROM ag""".stripMargin

  /** q_partial_corr: the quality replay feeding ten exact co-moment
    * longs per language, three Pearson shapes and the first-order
    * partial as one fixed expression — mirrored from
    * Evaluation.partialCorr. */
  private val partialCorrSql: String = {
    def dd(c: String) = s"CAST($c AS DOUBLE)"
    def rr(sab: String, sa: String, sb: String, saa: String,
        sbb: String): String = {
      val num = s"(${dd("n")} * ${dd(sab)} - ${dd(sa)} * ${dd(sb)})"
      val den = s"sqrt((${dd("n")} * ${dd(saa)} - ${dd(sa)} * ${dd(sa)}) " +
        s"* (${dd("n")} * ${dd(sbb)} - ${dd(sb)} * ${dd(sb)}))"
      s"(CASE WHEN $den <= 0.0 THEN 0.0 ELSE $num / $den END)"
    }
    val rxy = rr("sxy", "sx", "sy", "sxx", "syy")
    val rxz = rr("sxz", "sx", "sz", "sxx", "szz")
    val ryz = rr("syz", "sy", "sz", "syy", "szz")
    val pden = s"sqrt((1.0 - $rxz * $rxz) * (1.0 - $ryz * $ryz))"
    s"""WITH t AS (SELECT lang, text, n_chars, $toks AS toks FROM documents),
       |st AS (SELECT lang, n_chars,
       |  CAST(len(toks) AS INTEGER) AS n_tokens,
       |  CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS INTEGER) AS n_punct,
       |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','is','to','in','it','that'))) AS INTEGER) AS n_stopwords,
       |  length(text) AS len_chars
       |FROM t),
       |q AS (SELECT lang, n_chars, n_tokens,
       |  round(CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1) * 0.4
       |      + least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
       |      + (1.0 - CAST(n_punct AS DOUBLE) / greatest(len_chars, 1)) * 0.2, 6)
       |    AS quality_score
       |FROM st),
       |v AS (SELECT lang AS grp,
       |    CAST(round(quality_score * 1e6, 0) AS BIGINT) AS x,
       |    CAST(n_chars AS BIGINT) AS y,
       |    CAST(n_tokens AS BIGINT) AS z
       |  FROM q),
       |ag AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(z) AS BIGINT) AS sz,
       |    CAST(sum(x * x) AS BIGINT) AS sxx,
       |    CAST(sum(y * y) AS BIGINT) AS syy,
       |    CAST(sum(z * z) AS BIGINT) AS szz,
       |    CAST(sum(x * y) AS BIGINT) AS sxy,
       |    CAST(sum(x * z) AS BIGINT) AS sxz,
       |    CAST(sum(y * z) AS BIGINT) AS syz
       |  FROM v GROUP BY 1)
       |SELECT grp, n, round($rxy, 6) AS r_xy, round($rxz, 6) AS r_xz,
       |  round($ryz, 6) AS r_yz,
       |  round(CASE WHEN n < 3 THEN 0.0
       |    WHEN $pden <= 0.0 THEN 0.0
       |    ELSE ($rxy - $rxz * $ryz) / $pden END, 6) AS r_partial
       |FROM ag""".stripMargin
  }

  /** q_yules_k: frequency-of-frequencies second moment over portable
    * token-hash cells — mirrored from TextAnalysis.yulesK. */
  private val yulesKSql: String =
    s"""WITH tok AS (SELECT source,
       |    CAST(concat('0x', substr(md5('yk|' || t.tok), 1, 15)) AS BIGINT)
       |      AS h
       |  FROM (SELECT source, $toks AS toks FROM documents) d,
       |    unnest(toks) AS t(tok)),
       |counts AS (SELECT source, h, CAST(count(*) AS BIGINT) AS c
       |  FROM tok GROUP BY 1, 2),
       |ag AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
       |    CAST(count(*) AS BIGINT) AS vocab,
       |    CAST(sum(c * c) AS BIGINT) AS m2
       |  FROM counts GROUP BY 1)
       |SELECT source, n_tokens, vocab,
       |  round(10000.0 * (CAST(m2 AS DOUBLE) - CAST(n_tokens AS DOUBLE))
       |    / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)), 6) AS k
       |FROM ag""".stripMargin

  /** q_icc: complete-panel activity scores, the four sufficient longs
    * (G, Q, ΣT², ΣC²), two-way ANOVA mean squares and the ICC(2,1)
    * ratio as one fixed-shape expression — mirrored from
    * Evaluation.icc21. */
  private val iccSql: String = {
    def dd(c: String) = s"CAST($c AS DOUBLE)"
    val nk = s"(${dd("n")} * ${dd("k")})"
    val corr = s"(${dd("g")} * ${dd("g")} / $nk)"
    val ssr = s"(${dd("sr")} / ${dd("k")} - $corr)"
    val ssc = s"(${dd("scq")} / ${dd("n")} - $corr)"
    val sse = s"((${dd("q")} - $corr) - $ssr - $ssc)"
    val msr = s"($ssr / (${dd("n")} - 1.0))"
    val msc = s"($ssc / (${dd("k")} - 1.0))"
    val mse = s"($sse / ((${dd("n")} - 1.0) * (${dd("k")} - 1.0)))"
    val den = s"($msr + (${dd("k")} - 1.0) * $mse " +
      s"+ ${dd("k")} * ($msc - $mse) / ${dd("n")})"
    s"""WITH act AS (SELECT 'all' AS grp, user_id AS subject,
       |    event_type AS rater, CAST(count(*) AS BIGINT) AS score
       |  FROM events GROUP BY 1, 2, 3),
       |kt AS (SELECT grp, CAST(count(DISTINCT rater) AS BIGINT) AS k
       |  FROM act GROUP BY 1),
       |keep AS (SELECT act.grp, subject FROM act
       |  JOIN kt ON kt.grp = act.grp
       |  GROUP BY act.grp, subject, k HAVING count(DISTINCT rater) = k),
       |sc AS (SELECT act.* FROM act
       |  JOIN keep ON keep.grp = act.grp AND keep.subject = act.subject),
       |bs AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(t * t) AS BIGINT) AS sr, CAST(sum(t) AS BIGINT) AS g
       |  FROM (SELECT grp, subject, CAST(sum(score) AS BIGINT) AS t
       |        FROM sc GROUP BY 1, 2) z
       |  GROUP BY 1),
       |br AS (SELECT grp, CAST(sum(c * c) AS BIGINT) AS scq
       |  FROM (SELECT grp, rater, CAST(sum(score) AS BIGINT) AS c
       |        FROM sc GROUP BY 1, 2) z
       |  GROUP BY 1),
       |qq AS (SELECT grp, CAST(sum(score * score) AS BIGINT) AS q
       |  FROM sc GROUP BY 1)
       |SELECT bs.grp, n AS n_subjects, k AS k_raters,
       |  round(CASE WHEN n < 2 OR k < 2 THEN 0.0 ELSE $msr END, 6) AS msr,
       |  round(CASE WHEN n < 2 OR k < 2 THEN 0.0 ELSE $msc END, 6) AS msc,
       |  round(CASE WHEN n < 2 OR k < 2 THEN 0.0 ELSE $mse END, 6) AS mse,
       |  round(CASE WHEN n < 2 OR k < 2 THEN 0.0
       |    WHEN $den <= 0.0 THEN 0.0
       |    ELSE ($msr - $mse) / $den END, 6) AS icc
       |FROM bs JOIN br ON br.grp = bs.grp JOIN qq ON qq.grp = bs.grp
       |JOIN kt ON kt.grp = bs.grp""".stripMargin
  }

  /** q_runs_test: exact doubled median of the daily counts, sign-run
    * boundaries from a day-ordered lag, the Wald–Wolfowitz z —
    * mirrored from Timeseries.runsTest. */
  private val runsTestSql: String = {
    def dd(c: String) = s"CAST($c AS DOUBLE)"
    val nn = s"(${dd("n1")} + ${dd("n2")})"
    val mu = s"(2.0 * ${dd("n1")} * ${dd("n2")} / $nn + 1.0)"
    val sig2 = s"(2.0 * ${dd("n1")} * ${dd("n2")} " +
      s"* (2.0 * ${dd("n1")} * ${dd("n2")} - ${dd("n1")} - ${dd("n2")}) " +
      s"/ ($nn * $nn * ($nn - 1.0)))"
    s"""WITH s AS (SELECT event_type AS series, CAST(ts AS DATE) AS d,
       |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
       |cw AS (SELECT series, n,
       |    CAST(count(*) OVER (PARTITION BY series ORDER BY n
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum,
       |    CAST(count(*) OVER (PARTITION BY series) AS BIGINT) AS nd
       |  FROM s),
       |med AS (SELECT series,
       |    min(CASE WHEN cum >= (nd + 1) // 2 THEN n END)
       |      + min(CASE WHEN cum >= nd // 2 + 1 THEN n END) AS med2
       |  FROM cw GROUP BY 1),
       |sg AS (SELECT s.series, d,
       |    CASE WHEN 2 * n > med2 THEN 1 ELSE 0 END AS sign
       |  FROM s JOIN med ON med.series = s.series
       |  WHERE 2 * n <> med2),
       |rn AS (SELECT series, sign,
       |    CASE WHEN lag(sign) OVER (PARTITION BY series ORDER BY d)
       |      IS NULL OR lag(sign) OVER (PARTITION BY series ORDER BY d)
       |      <> sign THEN 1 ELSE 0 END AS brk
       |  FROM sg),
       |ag AS (SELECT series, CAST(sum(sign) AS BIGINT) AS n1,
       |    CAST(sum(1 - sign) AS BIGINT) AS n2,
       |    CAST(sum(brk) AS BIGINT) AS runs
       |  FROM rn GROUP BY 1)
       |SELECT series, n1, n2, runs,
       |  round(CASE WHEN n1 = 0 OR n2 = 0 THEN 0.0
       |    WHEN $sig2 <= 0.0 THEN 0.0
       |    ELSE (${dd("runs")} - $mu) / sqrt($sig2) END, 6) AS z
       |FROM ag""".stripMargin
  }

  /** q_strat_ate: per-(stratum, arm) exact moment longs, NANO-rounded
    * stratum ATE/variance terms, single-division effect/SE/z —
    * mirrored from Evaluation.postStratifiedAte. */
  private val stratAteSql: String = {
    def dd(c: String) = s"CAST($c AS DOUBLE)"
    def sv(n: String, s: String, ss: String) =
      s"((${dd(n)} * ${dd(ss)} - ${dd(s)} * ${dd(s)}) " +
        s"/ (${dd(n)} * (${dd(n)} - 1.0)))"
    val w = s"((${dd("n0")} + ${dd("n1")}) / ${dd("n")})"
    val diff = s"(${dd("s1")} / ${dd("n1")} - ${dd("s0")} / ${dd("n0")})"
    val varT = s"(${sv("n1", "s1", "ss1")} / ${dd("n1")} " +
      s"+ ${sv("n0", "s0", "ss0")} / ${dd("n0")})"
    val cents = "CAST(round(value * 100, 0) AS BIGINT)"
    s"""WITH cells AS (SELECT 'all' AS grp, event_type AS stratum,
       |    CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END AS arm,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum($cents) AS BIGINT) AS s,
       |    CAST(sum($cents * $cents) AS BIGINT) AS ss
       |  FROM events GROUP BY 1, 2, 3),
       |st AS (SELECT grp, stratum,
       |    CAST(sum(CASE WHEN arm = 0 THEN n ELSE 0 END) AS BIGINT) AS n0,
       |    CAST(sum(CASE WHEN arm = 0 THEN s ELSE 0 END) AS BIGINT) AS s0,
       |    CAST(sum(CASE WHEN arm = 0 THEN ss ELSE 0 END) AS BIGINT) AS ss0,
       |    CAST(sum(CASE WHEN arm <> 0 THEN n ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN arm <> 0 THEN s ELSE 0 END) AS BIGINT) AS s1,
       |    CAST(sum(CASE WHEN arm <> 0 THEN ss ELSE 0 END) AS BIGINT) AS ss1
       |  FROM cells GROUP BY 1, 2),
       |tot AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_strata,
       |    CAST(sum(CASE WHEN n0 >= 2 AND n1 >= 2 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_used,
       |    CAST(sum(CASE WHEN n0 >= 2 AND n1 >= 2 THEN n0 + n1 ELSE 0 END)
       |      AS BIGINT) AS n
       |  FROM st GROUP BY 1),
       |tm AS (SELECT st.grp,
       |    CAST(round($w * $diff * 1e9, 0) AS BIGINT) AS ate_nano,
       |    CAST(round($w * $w * $varT * 1e9, 0) AS BIGINT) AS var_nano
       |  FROM st JOIN tot ON tot.grp = st.grp
       |  WHERE n0 >= 2 AND n1 >= 2),
       |ag AS (SELECT grp, CAST(sum(ate_nano) AS BIGINT) AS ate_nano,
       |    CAST(sum(var_nano) AS BIGINT) AS var_nano
       |  FROM tm GROUP BY 1)
       |SELECT tot.grp, n_strata, n_used, n,
       |  round(COALESCE(CAST(ate_nano AS DOUBLE), 0.0) / 1e9, 6) AS ate,
       |  round(sqrt(COALESCE(CAST(var_nano AS DOUBLE), 0.0) / 1e9), 6) AS se,
       |  round(CASE WHEN COALESCE(var_nano, 0) <= 0 THEN 0.0
       |    ELSE COALESCE(CAST(ate_nano AS DOUBLE), 0.0) / 1e9
       |      / sqrt(COALESCE(CAST(var_nano AS DOUBLE), 0.0) / 1e9) END, 6)
       |    AS z
       |FROM tot LEFT JOIN ag ON ag.grp = tot.grp""".stripMargin
  }

  /** q_quantile_norm: the quality replay feeding per-source cell
    * positions k = ⌈(cum_s/n_s)·N⌉ (integer //), pooled order
    * statistics read via the union-and-forward-min as-of pattern —
    * mirrored from Curation.quantileNormalize. */
  private val quantileNormSql: String =
    s"""WITH t AS (SELECT source, text, $toks AS toks FROM documents),
       |st0 AS (SELECT source,
       |  CAST(len(toks) AS INTEGER) AS n_tokens,
       |  CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS INTEGER) AS n_punct,
       |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','is','to','in','it','that'))) AS INTEGER) AS n_stopwords,
       |  length(text) AS n_chars
       |FROM t),
       |q AS (SELECT source,
       |  round(CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1) * 0.4
       |      + least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
       |      + (1.0 - CAST(n_punct AS DOUBLE) / greatest(n_chars, 1)) * 0.2, 6)
       |    AS quality_score
       |FROM st0),
       |sc AS (SELECT 'all' AS grp, source,
       |    CAST(round(quality_score * 1e6, 0) AS BIGINT) AS v FROM q),
       |cells AS (SELECT grp, source, v, CAST(count(*) AS BIGINT) AS n
       |  FROM sc GROUP BY 1, 2, 3),
       |pooled AS (SELECT grp, v, CAST(sum(n) AS BIGINT) AS np
       |  FROM cells GROUP BY 1, 2),
       |pc AS (SELECT grp, v, CAST(sum(np) OVER (PARTITION BY grp ORDER BY v
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS cum_p
       |  FROM pooled),
       |nt AS (SELECT grp, CAST(sum(np) AS BIGINT) AS n_total
       |  FROM pooled GROUP BY 1),
       |pr AS (SELECT cells.grp, source, v, n,
       |    (CAST(sum(n) OVER (PARTITION BY cells.grp, source ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      * n_total
       |      + CAST(sum(n) OVER (PARTITION BY cells.grp, source) AS BIGINT)
       |      - 1)
       |    // CAST(sum(n) OVER (PARTITION BY cells.grp, source) AS BIGINT)
       |      AS k
       |  FROM cells JOIN nt ON nt.grp = cells.grp),
       |u AS (SELECT grp, k AS key, 0 AS tag, source, v, n,
       |    CAST(NULL AS BIGINT) AS vb FROM pr
       |  UNION ALL SELECT grp, cum_p, 1, NULL, NULL, NULL, v FROM pc),
       |wq AS (SELECT *, min(vb) OVER (PARTITION BY grp ORDER BY key, tag
       |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS qn
       |  FROM u)
       |SELECT grp, source, v, n, qn FROM wq WHERE tag = 0""".stripMargin

  /** q_welch_ttest: per-arm exact (n, Σy, Σy²) longs, then the t and
    * Welch–Satterthwaite df as one fixed-shape IEEE expression —
    * mirrored from Evaluation.welchTTest. */
  private val welchTtestSql: String = {
    val varA = "(CAST(n_a AS DOUBLE) * CAST(ss_a AS DOUBLE) " +
      "- CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)) " +
      "/ (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0))"
    val varB = "(CAST(n_b AS DOUBLE) * CAST(ss_b AS DOUBLE) " +
      "- CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)) " +
      "/ (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0))"
    val sea = s"(($varA) / CAST(n_a AS DOUBLE))"
    val seb = s"(($varB) / CAST(n_b AS DOUBLE))"
    val se2 = s"($sea + $seb)"
    s"""WITH ag AS (SELECT event_type AS grp,
       |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN user_id % 2 = 0
       |      THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS s_a,
       |    CAST(sum(CASE WHEN user_id % 2 = 0
       |      THEN CAST(round(value * 100, 0) AS BIGINT) * CAST(round(value * 100, 0) AS BIGINT)
       |      ELSE 0 END) AS BIGINT) AS ss_a,
       |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN user_id % 2 <> 0
       |      THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS s_b,
       |    CAST(sum(CASE WHEN user_id % 2 <> 0
       |      THEN CAST(round(value * 100, 0) AS BIGINT) * CAST(round(value * 100, 0) AS BIGINT)
       |      ELSE 0 END) AS BIGINT) AS ss_b
       |  FROM events GROUP BY 1)
       |SELECT grp, n_a, n_b,
       |  round(CASE WHEN n_a = 0 THEN 0.0
       |    ELSE CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) END, 6) AS mean_a,
       |  round(CASE WHEN n_b = 0 THEN 0.0
       |    ELSE CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) END, 6) AS mean_b,
       |  round(CASE WHEN n_a < 2 OR n_b < 2 THEN 0.0
       |    WHEN $se2 <= 0.0 THEN 0.0
       |    ELSE (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)
       |      - CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)) / sqrt($se2)
       |  END, 6) AS t_stat,
       |  round(CASE WHEN n_a < 2 OR n_b < 2 THEN 0.0
       |    WHEN $se2 <= 0.0 THEN 0.0
       |    ELSE $se2 * $se2 / ($sea * $sea / (CAST(n_a AS DOUBLE) - 1.0)
       |      + $seb * $seb / (CAST(n_b AS DOUBLE) - 1.0))
       |  END, 6) AS df
       |FROM ag""".stripMargin
  }

  /** q_msprt: the welch state replay finished as the normal-mixture
    * mSPRT log Λ and always-valid p (τ = 100 cents) — mirrored from
    * Evaluation.msprt. */
  private val msprtSql: String = {
    val varA = "(CAST(n_a AS DOUBLE) * CAST(ss_a AS DOUBLE) " +
      "- CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)) " +
      "/ (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0))"
    val varB = "(CAST(n_b AS DOUBLE) * CAST(ss_b AS DOUBLE) " +
      "- CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)) " +
      "/ (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0))"
    val se2 = s"((($varA) / CAST(n_a AS DOUBLE)) " +
      s"+ (($varB) / CAST(n_b AS DOUBLE)))"
    val delta = "(CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) " +
      "- CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))"
    val t2 = "CAST(10000.0 AS DOUBLE)"
    val logLam = s"(CAST(0.5 AS DOUBLE) * ln($se2 / ($se2 + $t2)) " +
      s"+ $delta * $delta * $t2 " +
      s"/ (CAST(2.0 AS DOUBLE) * $se2 * ($se2 + $t2)))"
    s"""WITH ag AS (SELECT event_type AS grp,
       |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN user_id % 2 = 0
       |      THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS s_a,
       |    CAST(sum(CASE WHEN user_id % 2 = 0
       |      THEN CAST(round(value * 100, 0) AS BIGINT) * CAST(round(value * 100, 0) AS BIGINT)
       |      ELSE 0 END) AS BIGINT) AS ss_a,
       |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN user_id % 2 <> 0
       |      THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS s_b,
       |    CAST(sum(CASE WHEN user_id % 2 <> 0
       |      THEN CAST(round(value * 100, 0) AS BIGINT) * CAST(round(value * 100, 0) AS BIGINT)
       |      ELSE 0 END) AS BIGINT) AS ss_b
       |  FROM events GROUP BY 1)
       |SELECT grp, n_a, n_b,
       |  round(CASE WHEN n_a < 2 OR n_b < 2 THEN 0.0
       |    WHEN $se2 <= 0.0 THEN 0.0 ELSE $delta END, 6) AS delta,
       |  round(CASE WHEN n_a < 2 OR n_b < 2 THEN 0.0
       |    WHEN $se2 <= 0.0 THEN 0.0 ELSE $logLam END, 6) AS log_lambda,
       |  round(CASE WHEN n_a < 2 OR n_b < 2 THEN 1.0
       |    WHEN $se2 <= 0.0 THEN 1.0
       |    WHEN $logLam <= 0.0 THEN 1.0
       |    ELSE exp(-$logLam) END, 6) AS p_always
       |FROM ag""".stripMargin
  }

  /** q_kruskal_wallis: (arm, value) count cells, doubled rank sums
    * from cumulative value windows, MICRO-rounded per-arm H terms,
    * fixed-shape tie correction — mirrored from
    * Evaluation.kruskalWallis. */
  private val kruskalWallisSql: String = {
    val dev = "(CAST(r2_j AS DOUBLE) / (2.0 * CAST(n_j AS DOUBLE)) " +
      "- (CAST(n_total AS DOUBLE) + 1.0) / 2.0)"
    val corr = "(1.0 - CAST(tie3 AS DOUBLE) / (CAST(n AS DOUBLE) " +
      "* CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))"
    s"""WITH cells AS (SELECT lang AS grp, source AS arm,
       |    CAST(n_chars AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS cnt
       |  FROM documents GROUP BY 1, 2, 3),
       |tv AS (SELECT grp, v, CAST(sum(cnt) AS BIGINT) AS t_v
       |  FROM cells GROUP BY 1, 2),
       |tw AS (SELECT grp, v, t_v,
       |    COALESCE(CAST(sum(t_v) OVER (PARTITION BY grp ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
       |      AS below
       |  FROM tv),
       |pa AS (SELECT cells.grp, arm, CAST(sum(cnt) AS BIGINT) AS n_j,
       |    CAST(sum(cnt * (2 * below + t_v + 1)) AS BIGINT) AS r2_j
       |  FROM cells JOIN tw ON tw.grp = cells.grp AND tw.v = cells.v
       |  GROUP BY 1, 2),
       |ties AS (SELECT grp,
       |    CAST(sum(t_v * t_v * t_v - t_v) AS BIGINT) AS tie3,
       |    CAST(sum(t_v) AS BIGINT) AS n_total
       |  FROM tv GROUP BY 1),
       |tm AS (SELECT pa.grp, n_total, tie3,
       |    CAST(round(12.0 * CAST(n_j AS DOUBLE) * $dev * $dev
       |      / (CAST(n_total AS DOUBLE) * (CAST(n_total AS DOUBLE) + 1.0))
       |      * 1e6, 0) AS BIGINT) AS term_micro
       |  FROM pa JOIN ties ON ties.grp = pa.grp),
       |ag AS (SELECT grp, CAST(count(*) AS BIGINT) AS k_arms,
       |    min(n_total) AS n, min(tie3) AS tie3,
       |    CAST(sum(term_micro) AS BIGINT) AS h_micro
       |  FROM tm GROUP BY 1)
       |SELECT grp, k_arms, n,
       |  round(CASE WHEN k_arms < 2 THEN 0.0
       |    ELSE CAST(h_micro AS DOUBLE) / 1e6 END, 6) AS h,
       |  round(CASE WHEN k_arms < 2 THEN 0.0
       |    WHEN $corr <= 0.0 THEN 0.0
       |    ELSE CAST(h_micro AS DOUBLE) / 1e6 / $corr END, 6) AS h_adj
       |FROM ag""".stripMargin
  }

  /** q_brown_forsythe: exact value-domain medians in DOUBLED units,
    * |2v − med2| deviations, N-normalized micro-rounded SSB/SSW terms,
    * one F division — mirrored from Evaluation.brownForsythe. */
  /** q_jonckheere: doubled pairwise MW counts over ordered-arm-pair
    * pooled value windows; exact-long arm/tie cubic moments; one
    * Hollander–Wolfe z expression — mirrored from
    * Evaluation.jonckheereTerpstra. */
  private val jonckheereSql: String = {
    def dd(c: String) = s"CAST($c AS DOUBLE)"
    val nD = dd("n")
    val aTerm = s"(($nD * ($nD - 1.0) * (2.0 * $nD + 5.0) " +
      s"- ${dd("a_arm")} - ${dd("a_tie")}) / 72.0)"
    val bTerm = s"(${dd("b_arm")} * ${dd("b_tie")} " +
      s"/ (36.0 * $nD * ($nD - 1.0) * ($nD - 2.0)))"
    val cTerm = s"(${dd("c_arm")} * ${dd("c_tie")} " +
      s"/ (8.0 * $nD * ($nD - 1.0)))"
    val varJ = s"($aTerm + $bTerm + $cTerm)"
    s"""WITH src AS (SELECT 'all' AS grp,
       |    CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS arm,
       |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
       |  FROM orders),
       |cells AS (SELECT grp, arm, v, CAST(count(*) AS BIGINT) AS cnt
       |  FROM src GROUP BY 1, 2, 3),
       |arms AS (SELECT DISTINCT grp, arm FROM cells),
       |pairs AS (SELECT a.grp, a.arm AS ai, b.arm AS aj
       |  FROM arms a JOIN arms b ON b.grp = a.grp AND a.arm < b.arm),
       |pooled AS (SELECT p.grp, ai, aj, v,
       |    CAST(sum(CASE WHEN c.arm = p.ai THEN cnt ELSE 0 END) AS BIGINT)
       |      AS c0,
       |    CAST(sum(CASE WHEN c.arm = p.aj THEN cnt ELSE 0 END) AS BIGINT)
       |      AS c1
       |  FROM pairs p JOIN cells c ON c.grp = p.grp
       |    AND (c.arm = p.ai OR c.arm = p.aj)
       |  GROUP BY 1, 2, 3, 4),
       |below AS (SELECT grp, c0, c1,
       |    COALESCE(CAST(sum(c0) OVER (PARTITION BY grp, ai, aj
       |      ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
       |      AND 1 PRECEDING) AS BIGINT), 0) AS b0
       |  FROM pooled),
       |jt AS (SELECT grp, CAST(sum(c1 * (2 * b0 + c0)) AS BIGINT) AS j2
       |  FROM below GROUP BY 1),
       |an AS (SELECT grp, arm, CAST(sum(cnt) AS BIGINT) AS n_j
       |  FROM cells GROUP BY 1, 2),
       |am AS (SELECT grp, CAST(count(*) AS BIGINT) AS k_arms,
       |    CAST(sum(n_j) AS BIGINT) AS n,
       |    CAST(sum(n_j * n_j) AS BIGINT) AS sn2,
       |    CAST(sum(n_j * (n_j - 1) * (2 * n_j + 5)) AS BIGINT) AS a_arm,
       |    CAST(sum(n_j * (n_j - 1) * (n_j - 2)) AS BIGINT) AS b_arm,
       |    CAST(sum(n_j * (n_j - 1)) AS BIGINT) AS c_arm
       |  FROM an GROUP BY 1),
       |tm AS (SELECT grp,
       |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS a_tie,
       |    CAST(sum(t * (t - 1) * (t - 2)) AS BIGINT) AS b_tie,
       |    CAST(sum(t * (t - 1)) AS BIGINT) AS c_tie
       |  FROM (SELECT grp, v, CAST(sum(cnt) AS BIGINT) AS t
       |    FROM cells GROUP BY 1, 2) GROUP BY 1)
       |SELECT am.grp, k_arms, n, COALESCE(j2, 0) AS j2,
       |  (n * n - sn2) // 2 AS e2j,
       |  round(CASE WHEN k_arms < 2 OR n < 3 THEN 0.0
       |    WHEN $varJ <= 0.0 THEN 0.0
       |    ELSE (CAST(COALESCE(j2, 0) AS DOUBLE)
       |      - CAST((n * n - sn2) // 2 AS DOUBLE))
       |      / (2.0 * sqrt($varJ)) END, 6) AS z
       |FROM am JOIN tm ON tm.grp = am.grp
       |LEFT JOIN jt ON jt.grp = am.grp""".stripMargin
  }

  /** q_bartlett: welch-style per-arm (n, Σy, Σy²) longs; pooled-share
    * and weighted-ln terms micro-rounded pre-sum, reciprocals
    * nano-rounded; one χ²/C expression — mirrored from
    * Evaluation.bartlett. */
  private val bartlettSql: String = {
    def dd(c: String) = s"CAST($c AS DOUBLE)"
    val varJ = s"((${dd("n")} * ${dd("ss")} - ${dd("s")} * ${dd("s")}) " +
      s"/ (${dd("n")} * (${dd("n")} - 1.0)))"
    val nk = s"(${dd("n_used")} - ${dd("k_used")})"
    s"""WITH v AS (SELECT 'all' AS grp, event_type AS arm,
       |    CAST(round(value * 100, 0) AS BIGINT) AS y FROM events),
       |st AS (SELECT grp, arm, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS ss
       |  FROM v GROUP BY 1, 2),
       |fl AS (SELECT grp, n, s, ss,
       |    (n >= 2 AND n * ss - s * s > 0) AS ok FROM st),
       |tot AS (SELECT grp, CAST(count(*) AS BIGINT) AS k_arms,
       |    CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS k_used,
       |    CAST(sum(CASE WHEN ok THEN n ELSE 0 END) AS BIGINT) AS n_used
       |  FROM fl GROUP BY 1),
       |terms AS (SELECT fl.grp,
       |    CAST(round((${dd("n")} - 1.0) * $varJ / $nk * 1e6, 0) AS BIGINT)
       |      AS pool_micro,
       |    CAST(round((${dd("n")} - 1.0) * ln($varJ) * 1e6, 0) AS BIGINT)
       |      AS ln_micro,
       |    CAST(round(1e9 / (${dd("n")} - 1.0), 0) AS BIGINT) AS inv_nano
       |  FROM fl JOIN tot ON tot.grp = fl.grp
       |  WHERE ok AND k_used >= 2),
       |fold AS (SELECT grp, CAST(sum(pool_micro) AS BIGINT) AS pool,
       |    CAST(sum(ln_micro) AS BIGINT) AS lns,
       |    CAST(sum(inv_nano) AS BIGINT) AS invs
       |  FROM terms GROUP BY 1)
       |SELECT t.grp, k_arms, k_used, n_used,
       |  greatest(k_used - 1, 0) AS dof,
       |  round(CASE WHEN k_used < 2 OR pool IS NULL OR pool <= 0 THEN 0.0
       |    ELSE ((${dd("n_used")} - ${dd("k_used")})
       |        * ln(${dd("pool")} / 1e6) - ${dd("lns")} / 1e6)
       |      / (1.0 + (${dd("invs")} / 1e9
       |          - 1.0 / (${dd("n_used")} - ${dd("k_used")}))
       |        / (3.0 * (${dd("k_used")} - 1.0))) END, 6) AS chi2
       |FROM tot t LEFT JOIN fold f ON f.grp = t.grp""".stripMargin
  }

  private val brownForsytheSql: String = {
    val meanJ = "(CAST(sz AS DOUBLE) / CAST(n_j AS DOUBLE))"
    val meanG = "(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
    s"""WITH cells AS (SELECT 'all' AS grp, event_type AS arm,
       |    CAST(round(value * 100, 0) AS BIGINT) AS v,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM events GROUP BY 1, 2, 3),
       |cw AS (SELECT grp, arm, v, cnt,
       |    CAST(sum(cnt) OVER (PARTITION BY grp, arm ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
       |    CAST(sum(cnt) OVER (PARTITION BY grp, arm) AS BIGINT) AS n_j
       |  FROM cells),
       |med AS (SELECT grp, arm,
       |    min(CASE WHEN cum >= (n_j + 1) // 2 THEN v END)
       |      + min(CASE WHEN cum >= n_j // 2 + 1 THEN v END) AS med2
       |  FROM cw GROUP BY 1, 2),
       |z AS (SELECT cells.grp, cells.arm, cnt,
       |    abs(2 * v - med2) AS z2
       |  FROM cells JOIN med ON med.grp = cells.grp AND med.arm = cells.arm),
       |pa AS (SELECT grp, arm, CAST(sum(cnt) AS BIGINT) AS n_j,
       |    CAST(sum(cnt * z2) AS BIGINT) AS sz,
       |    CAST(sum(cnt * z2 * z2) AS BIGINT) AS szz
       |  FROM z GROUP BY 1, 2),
       |gr AS (SELECT grp, CAST(count(*) AS BIGINT) AS k_arms,
       |    CAST(sum(n_j) AS BIGINT) AS n, CAST(sum(sz) AS BIGINT) AS s
       |  FROM pa GROUP BY 1),
       |tm AS (SELECT pa.grp, k_arms, n,
       |    CAST(round(CAST(n_j AS DOUBLE) * ($meanJ - $meanG)
       |      * ($meanJ - $meanG) / CAST(n AS DOUBLE) * 1e6, 0) AS BIGINT)
       |      AS ssb_micro,
       |    CAST(round((CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE)
       |        * CAST(sz AS DOUBLE) / CAST(n_j AS DOUBLE))
       |      / CAST(n AS DOUBLE) * 1e6, 0) AS BIGINT) AS ssw_micro
       |  FROM pa JOIN gr ON gr.grp = pa.grp),
       |ag AS (SELECT grp, min(k_arms) AS k_arms, min(n) AS n,
       |    CAST(sum(ssb_micro) AS BIGINT) AS ssb,
       |    CAST(sum(ssw_micro) AS BIGINT) AS ssw
       |  FROM tm GROUP BY 1)
       |SELECT grp, k_arms, n,
       |  round(CASE WHEN k_arms < 2 OR n <= k_arms OR ssw <= 0 THEN 0.0
       |    ELSE (CAST(ssb AS DOUBLE) / (CAST(k_arms AS DOUBLE) - 1.0))
       |      / (CAST(ssw AS DOUBLE) / (CAST(n AS DOUBLE)
       |        - CAST(k_arms AS DOUBLE)))
       |  END, 6) AS f
       |FROM ag""".stripMargin
  }

  /** q_split_half: cronbach's complete-panel census; odd/even item
    * split by name rank; five exact co-moment longs; one r and one
    * Spearman–Brown expression — mirrored from Evaluation.splitHalf. */
  private val splitHalfSql: String = {
    def dd(c: String) = s"CAST($c AS DOUBLE)"
    val num = s"(${dd("n")} * ${dd("sxy")} - ${dd("sx")} * ${dd("sy")})"
    val den = s"sqrt((${dd("n")} * ${dd("sxx")} - ${dd("sx")} * ${dd("sx")}) " +
      s"* (${dd("n")} * ${dd("syy")} - ${dd("sy")} * ${dd("sy")}))"
    val r = s"($num / $den)"
    s"""WITH act AS (SELECT 'all' AS grp, user_id AS subject,
       |    event_type AS item, CAST(count(*) AS BIGINT) AS score
       |  FROM events GROUP BY 1, 2, 3),
       |kt AS (SELECT grp, CAST(count(DISTINCT item) AS BIGINT) AS k
       |  FROM act GROUP BY 1),
       |keep AS (SELECT act.grp, subject FROM act
       |  JOIN kt ON kt.grp = act.grp
       |  GROUP BY act.grp, subject, k HAVING count(DISTINCT item) = k),
       |hv AS (SELECT grp, item,
       |    CAST(row_number() OVER (PARTITION BY grp ORDER BY item) % 2
       |      AS BIGINT) AS half
       |  FROM (SELECT DISTINCT grp, item FROM act)),
       |sums AS (SELECT a.grp, a.subject,
       |    CAST(sum(CASE WHEN half = 1 THEN score ELSE 0 END) AS BIGINT)
       |      AS x,
       |    CAST(sum(CASE WHEN half = 0 THEN score ELSE 0 END) AS BIGINT)
       |      AS y
       |  FROM act a JOIN keep ON keep.grp = a.grp
       |    AND keep.subject = a.subject
       |  JOIN hv ON hv.grp = a.grp AND hv.item = a.item
       |  GROUP BY 1, 2),
       |ag AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(x * x) AS BIGINT) AS sxx,
       |    CAST(sum(y * y) AS BIGINT) AS syy,
       |    CAST(sum(x * y) AS BIGINT) AS sxy
       |  FROM sums GROUP BY 1)
       |SELECT ag.grp, k AS k_items, n AS n_subjects,
       |  round(CASE WHEN k < 2 OR n < 2 THEN 0.0
       |    WHEN $den <= 0.0 THEN 0.0 ELSE $r END, 6) AS r_halves,
       |  round(CASE WHEN k < 2 OR n < 2 THEN 0.0
       |    WHEN $den <= 0.0 THEN 0.0
       |    WHEN 1.0 + $r <= 0.0 THEN 0.0
       |    ELSE 2.0 * $r / (1.0 + $r) END, 6) AS sb
       |FROM ag JOIN kt ON kt.grp = ag.grp""".stripMargin
  }

  /** q_kendall_w: complete-panel filter, doubled mid-ranks per rater
    * from value-count windows, the exact-long 4S identity, one W
    * division — mirrored from Evaluation.kendallW. */
  private val kendallWSql: String = {
    val denom = "(CAST(m AS DOUBLE) * CAST(m AS DOUBLE) " +
      "* (CAST(n_items AS DOUBLE) * CAST(n_items AS DOUBLE) " +
      "* CAST(n_items AS DOUBLE) - CAST(n_items AS DOUBLE)) " +
      "- CAST(m AS DOUBLE) * CAST(tie_sum AS DOUBLE))"
    s"""WITH one AS (SELECT 'all' AS grp, o_orderpriority AS rater,
       |    strftime(o_orderdate, '%Y-%m') AS item,
       |    CAST(count(*) AS BIGINT) AS score
       |  FROM orders GROUP BY 1, 2, 3),
       |mt AS (SELECT grp, CAST(count(DISTINCT rater) AS BIGINT) AS m
       |  FROM one GROUP BY 1),
       |keep AS (SELECT one.grp, item FROM one
       |  JOIN mt ON mt.grp = one.grp
       |  GROUP BY one.grp, item, m HAVING count(DISTINCT rater) = m),
       |ratings AS (SELECT one.* FROM one
       |  JOIN keep ON keep.grp = one.grp AND keep.item = one.item),
       |cells AS (SELECT grp, rater, score, CAST(count(*) AS BIGINT) AS t
       |  FROM ratings GROUP BY 1, 2, 3),
       |rk AS (SELECT grp, rater, score,
       |    2 * COALESCE(CAST(sum(t) OVER (PARTITION BY grp, rater
       |      ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING
       |      AND 1 PRECEDING) AS BIGINT), 0) + t + 1 AS mr2,
       |    t * t * t - t AS tie
       |  FROM cells),
       |pi AS (SELECT r.grp, item, CAST(sum(mr2) AS BIGINT) AS r2_i
       |  FROM ratings r JOIN rk ON rk.grp = r.grp
       |    AND rk.rater = r.rater AND rk.score = r.score
       |  GROUP BY 1, 2),
       |ts AS (SELECT grp, CAST(sum(tie) AS BIGINT) AS tie_sum
       |  FROM rk GROUP BY 1),
       |ag AS (SELECT pi.grp, CAST(count(*) AS BIGINT) AS n_items,
       |    CAST(sum(r2_i) AS BIGINT) AS sr,
       |    CAST(sum(r2_i * r2_i) AS BIGINT) AS srr
       |  FROM pi GROUP BY 1),
       |fin AS (SELECT ag.grp, m, n_items, tie_sum,
       |    srr - 2 * m * (n_items + 1) * sr
       |      + n_items * m * (n_items + 1) * m * (n_items + 1) AS s4
       |  FROM ag JOIN mt ON mt.grp = ag.grp
       |  JOIN ts ON ts.grp = ag.grp)
       |SELECT grp, m AS m_raters, n_items, s4, tie_sum,
       |  round(CASE WHEN n_items < 2 THEN 0.0
       |    WHEN $denom <= 0.0 THEN 0.0
       |    ELSE 3.0 * CAST(s4 AS DOUBLE) / $denom END, 6) AS w
       |FROM fin""".stripMargin
  }

  /** q_friedman: the kendallW state replay finished as
    * χ²_F = m(n−1)·W, df = n−1 — mirrored from
    * Evaluation.friedmanTest. */
  private val friedmanSql: String = {
    val denom = "(CAST(m AS DOUBLE) * CAST(m AS DOUBLE) " +
      "* (CAST(n_items AS DOUBLE) * CAST(n_items AS DOUBLE) " +
      "* CAST(n_items AS DOUBLE) - CAST(n_items AS DOUBLE)) " +
      "- CAST(m AS DOUBLE) * CAST(tie_sum AS DOUBLE))"
    s"""WITH one AS (SELECT 'all' AS grp, o_orderpriority AS rater,
       |    strftime(o_orderdate, '%Y-%m') AS item,
       |    CAST(count(*) AS BIGINT) AS score
       |  FROM orders GROUP BY 1, 2, 3),
       |mt AS (SELECT grp, CAST(count(DISTINCT rater) AS BIGINT) AS m
       |  FROM one GROUP BY 1),
       |keep AS (SELECT one.grp, item FROM one
       |  JOIN mt ON mt.grp = one.grp
       |  GROUP BY one.grp, item, m HAVING count(DISTINCT rater) = m),
       |ratings AS (SELECT one.* FROM one
       |  JOIN keep ON keep.grp = one.grp AND keep.item = one.item),
       |cells AS (SELECT grp, rater, score, CAST(count(*) AS BIGINT) AS t
       |  FROM ratings GROUP BY 1, 2, 3),
       |rk AS (SELECT grp, rater, score,
       |    2 * COALESCE(CAST(sum(t) OVER (PARTITION BY grp, rater
       |      ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING
       |      AND 1 PRECEDING) AS BIGINT), 0) + t + 1 AS mr2,
       |    t * t * t - t AS tie
       |  FROM cells),
       |pi AS (SELECT r.grp, item, CAST(sum(mr2) AS BIGINT) AS r2_i
       |  FROM ratings r JOIN rk ON rk.grp = r.grp
       |    AND rk.rater = r.rater AND rk.score = r.score
       |  GROUP BY 1, 2),
       |ts AS (SELECT grp, CAST(sum(tie) AS BIGINT) AS tie_sum
       |  FROM rk GROUP BY 1),
       |ag AS (SELECT pi.grp, CAST(count(*) AS BIGINT) AS n_items,
       |    CAST(sum(r2_i) AS BIGINT) AS sr,
       |    CAST(sum(r2_i * r2_i) AS BIGINT) AS srr
       |  FROM pi GROUP BY 1),
       |fin AS (SELECT ag.grp, m, n_items, tie_sum,
       |    srr - 2 * m * (n_items + 1) * sr
       |      + n_items * m * (n_items + 1) * m * (n_items + 1) AS s4
       |  FROM ag JOIN mt ON mt.grp = ag.grp
       |  JOIN ts ON ts.grp = ag.grp)
       |SELECT grp, m AS m_raters, n_items, n_items - 1 AS dof,
       |  round(CASE WHEN n_items < 2 THEN 0.0
       |    WHEN $denom <= 0.0 THEN 0.0
       |    ELSE CAST(m AS DOUBLE) * (CAST(n_items AS DOUBLE) - 1.0)
       |      * (3.0 * CAST(s4 AS DOUBLE) / $denom) END, 6) AS chi2_f
       |FROM fin""".stripMargin
  }

  /** q_page_trend: the kendallW state replay plus the item-position
    * moment Σj·R2_j; exact-long χ² numerator 6·L2 − 3mn(n+1)², one
    * division — mirrored from Evaluation.pageTrend. */
  private val pageTrendSql: String =
    s"""WITH one AS (SELECT 'all' AS grp, o_orderpriority AS rater,
       |    strftime(o_orderdate, '%Y-%m') AS item,
       |    CAST(count(*) AS BIGINT) AS score
       |  FROM orders GROUP BY 1, 2, 3),
       |mt AS (SELECT grp, CAST(count(DISTINCT rater) AS BIGINT) AS m
       |  FROM one GROUP BY 1),
       |keep AS (SELECT one.grp, item FROM one
       |  JOIN mt ON mt.grp = one.grp
       |  GROUP BY one.grp, item, m HAVING count(DISTINCT rater) = m),
       |ratings AS (SELECT one.* FROM one
       |  JOIN keep ON keep.grp = one.grp AND keep.item = one.item),
       |cells AS (SELECT grp, rater, score, CAST(count(*) AS BIGINT) AS t
       |  FROM ratings GROUP BY 1, 2, 3),
       |rk AS (SELECT grp, rater, score,
       |    2 * COALESCE(CAST(sum(t) OVER (PARTITION BY grp, rater
       |      ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING
       |      AND 1 PRECEDING) AS BIGINT), 0) + t + 1 AS mr2
       |  FROM cells),
       |pi AS (SELECT r.grp, item, CAST(sum(mr2) AS BIGINT) AS r2_i
       |  FROM ratings r JOIN rk ON rk.grp = r.grp
       |    AND rk.rater = r.rater AND rk.score = r.score
       |  GROUP BY 1, 2),
       |pr AS (SELECT grp, r2_i,
       |    CAST(row_number() OVER (PARTITION BY grp ORDER BY item)
       |      AS BIGINT) AS rk2
       |  FROM pi),
       |ag AS (SELECT pr.grp, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(rk2 * r2_i) AS BIGINT) AS sjr
       |  FROM pr GROUP BY 1),
       |fin AS (SELECT ag.grp, m, n, sjr,
       |    6 * sjr - 3 * m * n * (n + 1) * (n + 1) AS num,
       |    m * n * n * (n + 1) * (n * n - 1) AS den
       |  FROM ag JOIN mt ON mt.grp = ag.grp)
       |SELECT grp, m AS m_raters, n AS n_items, sjr AS l2,
       |  CAST(1 AS BIGINT) AS dof,
       |  round(CASE WHEN n < 2 OR den = 0 THEN 0.0
       |    ELSE CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
       |      / CAST(den AS DOUBLE) END, 6) AS chi2_l,
       |  CAST(CASE WHEN n < 2 OR den = 0 THEN 0
       |    WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END AS BIGINT)
       |    AS trend
       |FROM fin""".stripMargin

  /** q_cronbach_alpha: complete-panel activity scores, micro-rounded
    * per-item sample variances, total-score variance from exact
    * sums, one α expression — mirrored from Evaluation.cronbachAlpha. */
  private val cronbachAlphaSql: String = {
    def sv(n: String, s: String, ss: String) =
      s"(CAST($n AS DOUBLE) * CAST($ss AS DOUBLE) " +
        s"- CAST($s AS DOUBLE) * CAST($s AS DOUBLE)) " +
        s"/ (CAST($n AS DOUBLE) * (CAST($n AS DOUBLE) - 1.0))"
    val tVar = sv("n", "s", "ss")
    s"""WITH act AS (SELECT 'all' AS grp, user_id AS subject,
       |    event_type AS item, CAST(count(*) AS BIGINT) AS score
       |  FROM events GROUP BY 1, 2, 3),
       |kt AS (SELECT grp, CAST(count(DISTINCT item) AS BIGINT) AS k
       |  FROM act GROUP BY 1),
       |keep AS (SELECT act.grp, subject FROM act
       |  JOIN kt ON kt.grp = act.grp
       |  GROUP BY act.grp, subject, k HAVING count(DISTINCT item) = k),
       |sc AS (SELECT act.* FROM act
       |  JOIN keep ON keep.grp = act.grp AND keep.subject = act.subject),
       |pi AS (SELECT grp, item, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(score) AS BIGINT) AS s,
       |    CAST(sum(score * score) AS BIGINT) AS ss
       |  FROM sc GROUP BY 1, 2),
       |pim AS (SELECT grp, n,
       |    CAST(round((CASE WHEN n < 2 THEN 0.0
       |      ELSE ${sv("n", "s", "ss")} END) * 1e6, 0) AS BIGINT) AS var_micro
       |  FROM pi),
       |ia AS (SELECT grp, CAST(sum(var_micro) AS BIGINT) AS ivar_micro,
       |    max(n) AS n_subjects
       |  FROM pim GROUP BY 1),
       |tot AS (SELECT grp, subject, CAST(sum(score) AS BIGINT) AS tot
       |  FROM sc GROUP BY 1, 2),
       |ta AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(tot) AS BIGINT) AS s,
       |    CAST(sum(tot * tot) AS BIGINT) AS ss
       |  FROM tot GROUP BY 1)
       |SELECT ia.grp, k AS k_items, n_subjects,
       |  round(CAST(ivar_micro AS DOUBLE) / 1e6, 6) AS item_var_sum,
       |  round(CASE WHEN n < 2 THEN 0.0 ELSE $tVar END, 6) AS total_var,
       |  round(CASE WHEN k < 2 OR n < 2 THEN 0.0
       |    WHEN ($tVar) <= 0.0 THEN 0.0
       |    ELSE CAST(k AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0)
       |      * (1.0 - CAST(ivar_micro AS DOUBLE) / 1e6 / ($tVar))
       |  END, 6) AS alpha
       |FROM ia JOIN kt ON kt.grp = ia.grp JOIN ta ON ta.grp = ia.grp""".stripMargin
  }

  /** q_nelson_aalen: the kaplanMeier risk-set replay with additive
    * NANO hazard/variance increments and the Fleming–Harrington
    * survival — mirrored from Evaluation.nelsonAalen. */
  private val nelsonAalenSql: String =
    """WITH pc AS (SELECT o_custkey,
      |    min(CAST(o_orderdate AS DATE)) AS f,
      |    max(CAST(o_orderdate AS DATE)) AS l
      |  FROM orders GROUP BY 1),
      |subj AS (SELECT 'all' AS grp,
      |    CAST(floor(date_diff('day', f, l) / 30.0) AS BIGINT) AS t,
      |    CASE WHEN l < DATE '2001-02-01' THEN 1 ELSE 0 END AS event
      |  FROM pc),
      |st AS (SELECT grp, t, CAST(sum(event) AS BIGINT) AS d,
      |    CAST(count(*) - sum(event) AS BIGINT) AS c
      |  FROM subj GROUP BY 1, 2),
      |r AS (SELECT grp, t, d, c,
      |    CAST(sum(d + c) OVER (PARTITION BY grp) AS BIGINT)
      |      - COALESCE(CAST(sum(d + c) OVER (PARTITION BY grp ORDER BY t
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
      |      AS n_risk
      |  FROM st),
      |tm AS (SELECT grp, t, d, c, n_risk,
      |    CASE WHEN d = 0 THEN 0
      |      ELSE CAST(round(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) * 1e9, 0) AS BIGINT)
      |    END AS h_nano,
      |    CASE WHEN d = 0 THEN 0
      |      ELSE CAST(round(CAST(d AS DOUBLE) / (CAST(n_risk AS DOUBLE)
      |        * CAST(n_risk AS DOUBLE)) * 1e9, 0) AS BIGINT)
      |    END AS v_nano
      |  FROM r),
      |cu AS (SELECT grp, t, d, c, n_risk,
      |    CAST(sum(h_nano) OVER w AS BIGINT) AS cum_h,
      |    CAST(sum(v_nano) OVER w AS BIGINT) AS cum_v
      |  FROM tm WINDOW w AS (PARTITION BY grp ORDER BY t
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT grp, t, n_risk, d, c,
      |  round(CAST(cum_h AS DOUBLE) / 1e9, 6) AS cum_haz,
      |  round(CAST(cum_v AS DOUBLE) / 1e9, 6) AS var_haz,
      |  round(exp(-CAST(cum_h AS DOUBLE) / 1e9), 6) AS fh_surv
      |FROM cu WHERE d > 0""".stripMargin

  private val kaplanMeierSql: String =
    """WITH pc AS (SELECT o_custkey,
      |    min(CAST(o_orderdate AS DATE)) AS f,
      |    max(CAST(o_orderdate AS DATE)) AS l
      |  FROM orders GROUP BY 1),
      |subj AS (SELECT 'all' AS grp,
      |    CAST(floor(date_diff('day', f, l) / 30.0) AS BIGINT) AS t,
      |    CASE WHEN l < DATE '2001-02-01' THEN 1 ELSE 0 END AS event
      |  FROM pc),
      |st AS (SELECT grp, t, CAST(sum(event) AS BIGINT) AS d,
      |    CAST(count(*) - sum(event) AS BIGINT) AS c
      |  FROM subj GROUP BY 1, 2),
      |r AS (SELECT grp, t, d, c,
      |    CAST(sum(d + c) OVER (PARTITION BY grp) AS BIGINT)
      |      - COALESCE(CAST(sum(d + c) OVER (PARTITION BY grp ORDER BY t
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
      |      AS n_risk
      |  FROM st),
      |tm AS (SELECT grp, t, d, c, n_risk,
      |    CASE WHEN d = 0 THEN 0 WHEN d >= n_risk THEN 0
      |      ELSE CAST(round(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)) * 1e9, 0) AS BIGINT)
      |    END AS term_nano
      |  FROM r),
      |cu AS (SELECT grp, t, d, c, n_risk,
      |    CAST(sum(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) OVER w AS BIGINT) AS died_out,
      |    CAST(sum(term_nano) OVER w AS BIGINT) AS cum_nano
      |  FROM tm WINDOW w AS (PARTITION BY grp ORDER BY t
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT grp, t, n_risk, d, c,
      |  round(CASE WHEN died_out > 0 THEN 0.0
      |    ELSE exp(CAST(cum_nano AS DOUBLE) / 1e9) END, 6) AS surv
      |FROM cu WHERE d > 0""".stripMargin

  /** q_mann_kendall: densified daily series (the holtWinters calendar
    * fill), pair self-join S, tie-corrected variance, continuity-
    * corrected z — mirrored from Timeseries.mannKendall. */
  private val mannKendallSql: String = {
    val var18 = "(n_days * (n_days - 1) * (2 * n_days + 5) - tie18)"
    val zPos = s"(CAST(s AS DOUBLE) - 1.0) / sqrt(CAST($var18 AS DOUBLE) / 18.0)"
    val zNeg = s"(CAST(s AS DOUBLE) + 1.0) / sqrt(CAST($var18 AS DOUBLE) / 18.0)"
    s"""WITH d0 AS (SELECT event_type AS series, CAST(ts AS DATE) AS day,
       |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
       |span AS (SELECT series, min(day) AS dmin, max(day) AS dmax
       |  FROM d0 GROUP BY 1),
       |cal AS (SELECT span.series, CAST(u.day AS DATE) AS day
       |  FROM span, unnest(generate_series(CAST(dmin AS TIMESTAMP),
       |    CAST(dmax AS TIMESTAMP), INTERVAL 1 DAY)) AS u(day)),
       |d AS (SELECT cal.series, cal.day, coalesce(d0.x, CAST(0 AS BIGINT)) AS x
       |  FROM cal LEFT JOIN d0 ON d0.series = cal.series AND d0.day = cal.day),
       |sst AS (SELECT a.series,
       |    CAST(sum(CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1
       |      ELSE 0 END) AS BIGINT) AS s
       |  FROM d a JOIN d b ON a.series = b.series AND a.day < b.day
       |  GROUP BY 1),
       |ties AS (SELECT series, CAST(sum(t) AS BIGINT) AS n_days,
       |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
       |  FROM (SELECT series, x, CAST(count(*) AS BIGINT) AS t
       |        FROM d GROUP BY 1, 2)
       |  GROUP BY 1)
       |SELECT ties.series, n_days, s,
       |  round(CASE WHEN $var18 <= 0 THEN 0.0
       |    WHEN s > 0 THEN $zPos
       |    WHEN s < 0 THEN $zNeg
       |    ELSE 0.0 END, 6) AS z,
       |  CASE WHEN $var18 <= 0 THEN 'none'
       |    WHEN (CASE WHEN s > 0 THEN $zPos WHEN s < 0 THEN $zNeg
       |      ELSE 0.0 END) > 1.96 THEN 'increasing'
       |    WHEN (CASE WHEN s > 0 THEN $zPos WHEN s < 0 THEN $zNeg
       |      ELSE 0.0 END) < -1.96 THEN 'decreasing'
       |    ELSE 'none' END AS trend
       |FROM ties JOIN sst ON sst.series = ties.series""".stripMargin
  }

  private val sourceFreshnessSql: String =
    """WITH s AS (SELECT DISTINCT event_type AS src FROM events
      |  UNION ALL SELECT 'ghost'),
      |m AS (SELECT event_type AS src, max(ts) AS max_loaded_at
      |  FROM events GROUP BY 1),
      |j AS (SELECT s.src, m.max_loaded_at,
      |    CAST(epoch(TIMESTAMP '2024-03-01 00:00:00') AS BIGINT)
      |      - CAST(floor(epoch(m.max_loaded_at)) AS BIGINT) AS lag_s
      |  FROM s LEFT JOIN m ON m.src = s.src)
      |SELECT src, max_loaded_at, lag_s,
      |  CASE WHEN lag_s IS NULL OR lag_s > 2678400 THEN 'error'
      |       WHEN lag_s > 2505600 THEN 'warn'
      |       ELSE 'pass' END AS status
      |FROM j""".stripMargin

  /** q_leakage_split: the q_dedup_clusters CC replay, singletons as
    * their own cluster, split bucket = portable md5 of "split|" ||
    * cluster (the q_hash_split formula over cluster ids). */
  private val leakageSplitSql: String =
    s"""WITH RECURSIVE t AS (SELECT doc_id, $toks AS toks FROM documents),
      |long_docs AS (SELECT * FROM t WHERE len(toks) >= 3),
      |grams AS (SELECT DISTINCT doc_id,
      |    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
      |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS i
      |        FROM long_docs) x),
      |h AS (SELECT doc_id, s,
      |    CAST(concat('0x', substr(md5(CAST(s // 2 AS VARCHAR) || '|'
      |      || gram), 1 + 15 * (s % 2), 15)) AS BIGINT) AS hv
      |  FROM grams CROSS JOIN (SELECT unnest(range(0, 8)) AS s) seeds),
      |sig AS (SELECT doc_id,
      |  MIN(CASE WHEN s = 0 THEN hv END) AS m0,
      |  MIN(CASE WHEN s = 1 THEN hv END) AS m1,
      |  MIN(CASE WHEN s = 2 THEN hv END) AS m2,
      |  MIN(CASE WHEN s = 3 THEN hv END) AS m3,
      |  MIN(CASE WHEN s = 4 THEN hv END) AS m4,
      |  MIN(CASE WHEN s = 5 THEN hv END) AS m5,
      |  MIN(CASE WHEN s = 6 THEN hv END) AS m6,
      |  MIN(CASE WHEN s = 7 THEN hv END) AS m7
      |FROM h GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, 0 AS band, m0 AS k0, m1 AS k1 FROM sig UNION ALL
      |  SELECT doc_id, 1, m2, m3 FROM sig UNION ALL
      |  SELECT doc_id, 2, m4, m5 FROM sig UNION ALL
      |  SELECT doc_id, 3, m6, m7 FROM sig),
      |cand AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
      |         FROM bands a JOIN bands b
      |           ON a.band = b.band AND a.k0 = b.k0 AND a.k1 = b.k1
      |          AND a.doc_id < b.doc_id
      |         GROUP BY 1, 2),
      |edges AS (SELECT a_id AS s, b_id AS d FROM cand
      |          UNION SELECT b_id, a_id FROM cand),
      |reach(node, label) AS (
      |  SELECT DISTINCT s, s FROM edges
      |  UNION
      |  SELECT e.s, r.label FROM reach r JOIN edges e ON e.d = r.node),
      |cc AS (SELECT node, MIN(label) AS component FROM reach
      |  GROUP BY node),
      |clustered AS (SELECT d.doc_id,
      |    COALESCE(cc.component, d.doc_id) AS cluster
      |  FROM documents d LEFT JOIN cc ON cc.node = d.doc_id)
      |SELECT doc_id, cluster,
      |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM (SELECT doc_id, cluster,
      |    CAST(concat('0x', substr(md5('split|'
      |      || CAST(cluster AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
      |  FROM clustered) z""".stripMargin

  /** q_containment_indexed: replay of the df-capped posting index +
    * the planted/decoy batch, joined on shingle hash and thresholded
    * — identical to the bucketed-table probe. */
  private val containmentIndexedSql: String =
    s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
      |hist AS MATERIALIZED (SELECT doc_id, u.h
      |  FROM (SELECT doc_id, list_distinct(list_transform(
      |      range(1, len(toks) - 1),
      |      i -> CAST(concat('0x', substr(md5(
      |        toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 15))
      |        AS BIGINT))) AS hs
      |    FROM t WHERE len(toks) >= 3) x, unnest(hs) AS u(h)),
      |rare AS (SELECT h FROM (SELECT h, count(*) AS df FROM hist
      |  GROUP BY 1) d WHERE df <= 1000),
      |idx AS (SELECT hi.h, hi.doc_id AS hist_id
      |  FROM hist hi JOIN rare USING (h)),
      |batch AS (
      |  SELECT doc_id + 1000000 AS doc_id,
      |      array_to_string(toks[1 : CAST(greatest((len(toks) * 2) // 5, 5)
      |        AS BIGINT)], ' ') AS text
      |    FROM t WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000,
      |      array_to_string(list_reverse(toks), ' ')
      |    FROM t WHERE doc_id % 11 = 3),
      |bt AS (SELECT doc_id, $toks AS toks FROM batch),
      |bn AS MATERIALIZED (SELECT doc_id, u.h
      |  FROM (SELECT doc_id, list_distinct(list_transform(
      |      range(1, len(toks) - 1),
      |      i -> CAST(concat('0x', substr(md5(
      |        toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 15))
      |        AS BIGINT))) AS hs
      |    FROM bt WHERE len(toks) >= 3) x, unnest(hs) AS u(h)),
      |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
      |  FROM bn GROUP BY 1),
      |m AS (SELECT bn.doc_id, idx.hist_id, CAST(count(*) AS BIGINT)
      |    AS inter
      |  FROM bn JOIN idx USING (h) GROUP BY 1, 2)
      |SELECT m.doc_id AS src_id, m.hist_id AS dst_id, m.inter, sz.sz,
      |  round(CAST(m.inter AS DOUBLE) / CAST(sz.sz AS DOUBLE), 6)
      |    AS containment
      |FROM m JOIN sz ON sz.doc_id = m.doc_id
      |WHERE CAST(m.inter AS DOUBLE) / CAST(sz.sz AS DOUBLE) >= 0.9""".stripMargin

  /** q_benford: first digit via decimal string (no float log10),
    * expected shares injected from the SAME Scala table
    * ([[graft.ext.Profiler.benfordExpectedMicro]]). */
  private val benfordSql: String = {
    val expRows = graft.ext.Profiler.benfordExpectedMicro
      .map { case (d, p) => s"($d, $p)" }.mkString(", ")
    s"""WITH src AS (SELECT o_orderpriority AS grp,
      |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v FROM orders),
      |digits AS (SELECT grp,
      |    CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INTEGER) AS digit,
      |    CAST(count(*) AS BIGINT) AS n_digit
      |  FROM src WHERE v IS NOT NULL AND v > 0 GROUP BY 1, 2),
      |tot AS (SELECT grp, CAST(sum(n_digit) AS BIGINT) AS n
      |  FROM digits GROUP BY 1),
      |exp_t(digit, p_micro) AS (VALUES $expRows),
      |grid AS (SELECT t.grp, e.digit, t.n,
      |    COALESCE(d.n_digit, 0) AS n_digit, CAST(e.p_micro AS BIGINT)
      |      AS p_micro
      |  FROM tot t CROSS JOIN exp_t e
      |  LEFT JOIN digits d ON d.grp = t.grp AND d.digit = e.digit),
      |dev AS (SELECT grp, digit, n_digit, n, p_micro,
      |    CAST(round(CAST(n_digit AS DOUBLE) * 1e6 / CAST(n AS DOUBLE), 0)
      |      AS BIGINT) - p_micro AS dev_micro FROM grid),
      |mad AS (SELECT grp,
      |    CAST(round(CAST(sum(abs(dev_micro)) AS DOUBLE) / 9.0, 0)
      |      AS BIGINT) AS mad_micro FROM dev GROUP BY 1)
      |SELECT d.grp, d.digit, d.n_digit, d.n, d.p_micro, d.dev_micro,
      |  m.mad_micro
      |FROM dev d JOIN mad m ON m.grp = d.grp""".stripMargin
  }

  /** q_zipf_slope: window-rank replay of the bounded-heap top-K
    * (count desc, hash asc — the documented heap tie-break), per-term
    * micro-rounded ln pairs, exact-long OLS sums. */
  private val zipfSlopeSql: String =
    s"""WITH tok AS (SELECT source,
      |    CAST(concat('0x', substr(md5('zf|' || t.tok), 1, 15)) AS BIGINT)
      |      AS h
      |  FROM (SELECT source, $toks AS toks FROM documents) d,
      |    unnest(toks) AS t(tok)),
      |counts AS (SELECT source, h, CAST(count(*) AS BIGINT) AS c
      |  FROM tok GROUP BY 1, 2),
      |rk AS (SELECT source, c, CAST(row_number() OVER (
      |    PARTITION BY source ORDER BY c DESC, h ASC) AS BIGINT) AS rank
      |  FROM counts),
      |top AS (SELECT * FROM rk WHERE rank <= 50),
      |xy AS (SELECT source,
      |    CAST(round(ln(CAST(rank AS DOUBLE)) * 1e6, 0) AS BIGINT) AS x,
      |    CAST(round(ln(CAST(c AS DOUBLE)) * 1e6, 0) AS BIGINT) AS y
      |  FROM top),
      |agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(x * y) AS BIGINT) AS sxy FROM xy GROUP BY 1)
      |SELECT source, n AS n_terms,
      |  CASE WHEN n * sxx - sx * sx = 0 THEN 0
      |    ELSE CAST(round(CAST(n * sxy - sx * sy AS DOUBLE)
      |      / CAST(n * sxx - sx * sx AS DOUBLE) * 1e6, 0) AS BIGINT)
      |    END AS slope_micro,
      |  CASE WHEN n * sxx - sx * sx = 0
      |    THEN CAST(round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 0)
      |      AS BIGINT)
      |    ELSE CAST(round((CAST(sy AS DOUBLE)
      |      - (CAST(n * sxy - sx * sy AS DOUBLE)
      |        / CAST(n * sxx - sx * sx AS DOUBLE))
      |        * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 0) AS BIGINT)
      |    END AS intercept_micro
      |FROM agg""".stripMargin

  /** q_containment: replants the 40%-prefix derived docs with the
    * same integer arithmetic, then replays exact directed containment
    * over ALL shared-shingle pairs — a superset of the engine's
    * prefix-filtered candidates, identical after the exact C ≥ t
    * filter (the prefix lemma is lossless). */
  private val containmentSql: String =
    s"""WITH t0 AS (SELECT doc_id, text FROM documents),
      |plant AS (SELECT doc_id + 1000000 AS doc_id,
      |    array_to_string(toks[1 : CAST(greatest((len(toks) * 2) // 5, 5)
      |      AS BIGINT)], ' ') AS text
      |  FROM (SELECT doc_id, $toks AS toks FROM documents
      |        WHERE doc_id % 7 = 0) p),
      |base AS (SELECT * FROM t0 UNION ALL SELECT * FROM plant),
      |t AS (SELECT doc_id, $toks AS toks FROM base),
      |ts AS MATERIALIZED (SELECT doc_id, list_sort(list_distinct(
      |    list_transform(range(1, len(toks) - 1),
      |      i -> CAST(concat('0x', substr(md5(
      |        toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 15))
      |        AS BIGINT)))) AS s
      |  FROM t WHERE len(toks) >= 3),
      |ex AS (SELECT doc_id, unnest(s) AS token FROM ts),
      |cand AS (SELECT DISTINCT a.doc_id AS src_id, b.doc_id AS dst_id
      |  FROM ex a JOIN ex b ON b.token = a.token
      |    AND a.doc_id != b.doc_id),
      |ver AS (SELECT src_id, dst_id,
      |    len(list_intersect(sa.s, sb.s)) AS inter, len(sa.s) AS la
      |  FROM cand JOIN ts sa ON sa.doc_id = src_id
      |            JOIN ts sb ON sb.doc_id = dst_id)
      |SELECT src_id, dst_id,
      |  round(CAST(inter AS DOUBLE) / la, 6) AS containment
      |FROM ver WHERE CAST(inter AS DOUBLE) / la >= 0.9""".stripMargin

  /** The token-budget waterfill CTE chain shared by q_token_budget
    * and q_token_budget_sample: exact-integer shares ⌊R·w/W⌋ in
    * HUGEINT (the engine's BigInt), saturation rounds unrolled.
    * UNROLL PIN: the loop adds ≥1 saturated source per effective
    * round, so rounds needed ≤ #sources (20 in the documents table
    * at every sweep SF); 24 rounds carry headroom and are idempotent
    * once the saturated set stabilizes. Each round CTE is
    * MATERIALIZED — DuckDB inlines CTEs, and each round references
    * its predecessor twice (rows + totals), so un-materialized
    * rounds re-evaluate 2^24 times. Ends with `alloc`:
    * (source, n_docs, ts, w, alloc, sat, frac). */
  // lazy: referenced by a query map declared ABOVE this definition —
  // a strict val would still be null at that map's initialization
  private lazy val tokenBudgetCtes: String = {
    val rounds = 24
    val b = ExtQueries.tokenBudget
    val alpha = ExtQueries.tokenBudgetAlpha
    (s"""WITH t AS MATERIALIZED (SELECT CAST(source AS VARCHAR) AS source,
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(len($toks)) AS BIGINT) AS ts
      |  FROM documents WHERE source IS NOT NULL GROUP BY 1),
      |r0 AS MATERIALIZED (SELECT source, n_docs, ts,
      |    CAST(round(pow(CAST(ts AS DOUBLE), CAST($alpha AS DOUBLE)) * 1e6, 0) AS BIGINT) AS w,
      |    FALSE AS sat FROM t)""" +
      (1 to rounds).map { n =>
        s""",
          |a$n AS MATERIALIZED (SELECT
          |    CAST($b AS BIGINT) - COALESCE(SUM(CASE WHEN sat THEN ts END), 0) AS rem,
          |    COALESCE(SUM(CASE WHEN NOT sat THEN w END), 0) AS wsum
          |  FROM r${n - 1}),
          |r$n AS MATERIALIZED (SELECT source, n_docs, ts, w,
          |    sat OR (wsum > 0 AND (CAST(rem AS HUGEINT) * w) // wsum >= ts) AS sat
          |  FROM r${n - 1} CROSS JOIN a$n)"""
      }.mkString +
      s""",
        |af AS (SELECT
        |    CAST($b AS BIGINT) - COALESCE(SUM(CASE WHEN sat THEN ts END), 0) AS rem,
        |    COALESCE(SUM(CASE WHEN NOT sat THEN w END), 0) AS wsum
        |  FROM r$rounds),
        |alloc AS MATERIALIZED (SELECT source, n_docs, ts, w, sat,
        |    CASE WHEN sat OR wsum = 0 THEN ts
        |      ELSE least(ts, CAST((CAST(rem AS HUGEINT) * w) // wsum AS BIGINT))
        |      END AS alloc,
        |    round(CASE WHEN ts = 0 THEN 0.0
        |      ELSE CAST(CASE WHEN sat OR wsum = 0 THEN ts
        |        ELSE least(ts, CAST((CAST(rem AS HUGEINT) * w) // wsum AS BIGINT)) END
        |        AS DOUBLE) / CAST(ts AS DOUBLE) END, 6) AS frac
        |  FROM r$rounds CROSS JOIN af)""").stripMargin
  }

  /** q_conv_containment: [[containmentSql]]'s plant-then-verify
    * replay at SEQUENCE level — planted prefixes snapped to the
    * 4-token turn boundary, both sides re-expressed as turn-hash
    * text, then the identical shingle-containment tail. */
  private val convContainmentSql: String = {
    val tt = ExtQueries.convContainTurn
    s"""WITH t0 AS (SELECT doc_id, text FROM documents),
      |plant AS (SELECT doc_id + 1000000 AS doc_id,
      |    array_to_string(toks[1 : CAST(greatest(
      |      ((len(toks) * 2) // 5 // $tt) * $tt, ${2 * tt}) AS BIGINT)],
      |      ' ') AS text
      |  FROM (SELECT doc_id, $toks AS toks FROM documents
      |        WHERE doc_id % 7 = 0) p),
      |base AS (SELECT * FROM t0 UNION ALL SELECT * FROM plant),
      |bt AS (SELECT doc_id, $toks AS toks FROM base),
      |turns AS (SELECT doc_id, i,
      |    substr(md5(array_to_string(toks[(i*$tt+1):(i*$tt+$tt)], ' ')), 1, 15) AS th
      |  FROM (SELECT doc_id, toks,
      |        unnest(range(0, CAST((len(toks) + $tt - 1) // $tt AS INT))) AS i
      |        FROM bt) x),
      |ttx AS (SELECT doc_id, string_agg(th, ' ' ORDER BY i) AS text
      |        FROM turns GROUP BY 1),
      |t AS (SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '${"\\s"}+'),
      |      x -> x != '') AS toks FROM ttx),
      |ts AS MATERIALIZED (SELECT doc_id, list_sort(list_distinct(
      |    list_transform(range(1, len(toks) - 1),
      |      i -> CAST(concat('0x', substr(md5(
      |        toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 15))
      |        AS BIGINT)))) AS s
      |  FROM t WHERE len(toks) >= 3),
      |ex AS (SELECT doc_id, unnest(s) AS token FROM ts),
      |cand AS (SELECT DISTINCT a.doc_id AS src_id, b.doc_id AS dst_id
      |  FROM ex a JOIN ex b ON b.token = a.token
      |    AND a.doc_id != b.doc_id),
      |ver AS (SELECT src_id, dst_id,
      |    len(list_intersect(sa.s, sb.s)) AS inter, len(sa.s) AS la
      |  FROM cand JOIN ts sa ON sa.doc_id = src_id
      |            JOIN ts sb ON sb.doc_id = dst_id)
      |SELECT src_id, dst_id,
      |  round(CAST(inter AS DOUBLE) / la, 6) AS containment
      |FROM ver WHERE CAST(inter AS DOUBLE) / la >= 0.9""".stripMargin
  }

  /** q_feature_hash: the portable-md5 hashing trick replayed —
    * bucket = h mod 64, sign from the next hash bit, zero buckets
    * dropped. */
  private val featureHashSql: String =
    """WITH f AS (
      |  SELECT o_orderkey AS id, 'o_orderstatus=' || o_orderstatus AS feat
      |    FROM orders WHERE o_orderstatus IS NOT NULL
      |  UNION ALL
      |  SELECT o_orderkey, 'o_orderpriority=' || o_orderpriority
      |    FROM orders WHERE o_orderpriority IS NOT NULL
      |  UNION ALL
      |  SELECT o_orderkey, 'cust_cohort=' || CAST(o_custkey % 16 AS VARCHAR)
      |    FROM orders WHERE o_custkey IS NOT NULL),
      |h AS (SELECT id,
      |    CAST(concat('0x', substr(md5('fh|' || feat), 1, 15)) AS BIGINT)
      |      AS h FROM f),
      |s AS (SELECT id, CAST(h % 64 AS BIGINT) AS bucket,
      |    CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END AS sign FROM h),
      |g AS (SELECT id, bucket, CAST(sum(sign) AS BIGINT) AS w
      |  FROM s GROUP BY 1, 2)
      |SELECT id, bucket, w FROM g WHERE w != 0""".stripMargin

  /** q_label_vote: majority per (grp, item) with min-category
    * tie-break; is_tie = more than one category at the max count. */
  private val labelVoteSql: String =
    """WITH t AS (SELECT source AS grp, doc_id AS item, lang,
      |    lower(text) AS lt,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'),
      |      x -> x != '') AS toks FROM documents),
      |r AS (SELECT grp, item,
      |    CASE WHEN len(list_filter(toks,
      |        x -> x IN ('the','a','of','and','is','to','in','it','that')))
      |      >= len(list_filter(toks,
      |        x -> x IN ('el','la','de','y','es','en','que','los')))
      |      THEN 'en' ELSE 'es' END AS cat FROM t
      |  UNION ALL SELECT grp, item,
      |    CASE WHEN lt LIKE '% the %' THEN 'en' ELSE 'es' END FROM t
      |  UNION ALL SELECT grp, item,
      |    CASE WHEN lang = 'en' THEN 'en' ELSE 'es' END FROM t),
      |cells AS MATERIALIZED (SELECT grp, item, cat,
      |    CAST(count(*) AS BIGINT) AS c FROM r GROUP BY 1, 2, 3),
      |cm AS (SELECT grp, item, CAST(max(c) AS BIGINT) AS cmax,
      |    CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY 1, 2),
      |top AS (SELECT c.grp, c.item, min(c.cat) AS label,
      |    CAST(count(*) AS BIGINT) AS ntop
      |  FROM cells c JOIN cm ON cm.grp = c.grp AND cm.item = c.item
      |    AND c.c = cm.cmax
      |  GROUP BY 1, 2)
      |SELECT t.grp, t.item, t.label, cm.cmax AS votes, cm.n AS n_ratings,
      |  round(CAST(cm.cmax AS DOUBLE) / CAST(cm.n AS DOUBLE), 6)
      |    AS confidence,
      |  t.ntop > 1 AS is_tie
      |FROM top t JOIN cm ON cm.grp = t.grp AND cm.item = t.item""".stripMargin

  /** q_periodogram: the cos/sin micro factors are injected as a
    * VALUES list from the SAME Scala table the engine joins
    * ([[graft.ext.Timeseries.periodogramFactors]]) — no libm replay;
    * residuals, truncating term division, and the power ratio mirror
    * the engine expression shape exactly. */
  private val periodogramSql: String = {
    val factorRows = graft.ext.Timeseries
      .periodogramFactors(graft.ext.ExtQueries.periodogramMin,
        graft.ext.ExtQueries.periodogramMax)
      .map { case (p, m, c, s) => s"($p, $m, $c, $s)" }
      .mkString(", ")
    s"""WITH daily AS (SELECT event_type AS series, CAST(ts AS DATE) AS day,
       |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
       |base AS (SELECT series, min(day) AS d0, CAST(sum(x) AS BIGINT) AS t,
       |    CAST(count(*) AS BIGINT) AS nd FROM daily GROUP BY 1),
       |r AS (SELECT d.series, datediff('day', b.d0, d.day) AS idx,
       |    b.nd * d.x - b.t AS r FROM daily d JOIN base b USING (series)),
       |den AS (SELECT series, CAST(sum(r * r) AS BIGINT) AS den
       |  FROM r GROUP BY 1),
       |f(p, m, cos_micro, sin_micro) AS (VALUES $factorRows),
       |terms AS (SELECT r.series, f.p,
       |    (r.r * f.cos_micro) // 1000000 AS tc,
       |    (r.r * f.sin_micro) // 1000000 AS tsn
       |  FROM r JOIN f ON f.m = r.idx % f.p),
       |sums AS (SELECT series, p, CAST(sum(tc) AS BIGINT) AS sc,
       |    CAST(sum(tsn) AS BIGINT) AS ss FROM terms GROUP BY 1, 2),
       |pw AS (SELECT s.series, CAST(s.p AS INTEGER) AS period, sc, ss,
       |    CASE WHEN den.den = 0 THEN 0
       |      ELSE CAST(round((CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
       |        + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))
       |        / (CAST(den.den AS DOUBLE) * CAST(b.nd AS DOUBLE))
       |        * 1e6, 0) AS BIGINT) END AS power_micro
       |  FROM sums s JOIN den USING (series) JOIN base b USING (series)),
       |pk AS (SELECT series, max(power_micro) AS pmax FROM pw GROUP BY 1)
       |SELECT pw.series, period, sc, ss, power_micro,
       |  power_micro = pmax AS is_peak
       |FROM pw JOIN pk USING (series)""".stripMargin
  }

  /** q_psi_drift: calibration-style integer bins, +1 Laplace smoothing
    * over the full bin grid, per-bin term micro-rounded before the
    * order-free sum; ln of one exact-long cross ratio. */
  private val psiDriftSql: String =
    """WITH t AS (SELECT doc_id, lang AS grp,
      |    least(1000000, CAST(len(list_filter(
      |      list_filter(regexp_split_to_array(lower(text), '\s+'),
      |        x -> x != ''),
      |      x -> x IN ('the','a','of','and','is','to','in','it','that')))
      |      AS BIGINT) * 125000) AS p FROM documents),
      |cells AS (SELECT grp,
      |    CAST(least(floor(p * 10 / 1000000), 9) AS BIGINT) AS bin,
      |    CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS a_n,
      |    CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS b_n FROM t GROUP BY 1, 2),
      |tot AS (SELECT grp, CAST(sum(a_n) AS BIGINT) AS ta,
      |    CAST(sum(b_n) AS BIGINT) AS tb FROM cells GROUP BY 1),
      |grid AS (SELECT tot.grp, g.bin, tot.ta, tot.tb,
      |    COALESCE(c.a_n, 0) AS a_n, COALESCE(c.b_n, 0) AS b_n
      |  FROM tot CROSS JOIN (SELECT unnest(range(0, 10)) AS bin) g
      |  LEFT JOIN cells c ON c.grp = tot.grp AND c.bin = g.bin),
      |terms AS (SELECT grp, bin, a_n, b_n,
      |    CAST(round((
      |      CAST(b_n + 1 AS DOUBLE) / CAST(tb + 10 AS DOUBLE)
      |      - CAST(a_n + 1 AS DOUBLE) / CAST(ta + 10 AS DOUBLE))
      |      * ln(CAST((b_n + 1) * (ta + 10) AS DOUBLE)
      |        / CAST((a_n + 1) * (tb + 10) AS DOUBLE)) * 1e6, 0) AS BIGINT)
      |      AS term_micro FROM grid),
      |s AS (SELECT grp, CAST(sum(term_micro) AS BIGINT) AS psi_micro
      |  FROM terms GROUP BY 1)
      |SELECT t.grp, t.bin, t.a_n, t.b_n, t.term_micro, s.psi_micro
      |FROM terms t JOIN s ON s.grp = t.grp""".stripMargin

  /** q_corpus_bleu: per-order clipped counts as exact longs (order
    * tag inside the gram hash), corpus-summed before the p_n
    * divisions; BLEU-2's root is IEEE-exact sqrt; bp's exp runs on
    * one scalar from exact longs. */
  private val corpusBleuSql: String =
    """WITH cand AS (SELECT doc_id AS pair_id, text FROM documents
      |              WHERE doc_id % 2 = 0),
      |refs AS (SELECT doc_id - 1 AS pair_id, text FROM documents
      |         WHERE doc_id % 2 = 1),
      |ids AS (SELECT c.pair_id FROM cand c
      |        JOIN refs r ON r.pair_id = c.pair_id),
      |ct AS MATERIALIZED (SELECT i.pair_id,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'),
      |      x -> x != '') AS toks FROM cand c JOIN ids i USING (pair_id)),
      |rt AS MATERIALIZED (SELECT i.pair_id,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'),
      |      x -> x != '') AS toks FROM refs r JOIN ids i USING (pair_id)),
      |cg AS MATERIALIZED (
      |  SELECT 1 AS n, pair_id,
      |      CAST(concat('0x', substr(md5('bl|1|' || g.gram), 1, 15))
      |        AS BIGINT) AS h, CAST(count(*) AS BIGINT) AS cc
      |    FROM ct, unnest(toks) AS g(gram) GROUP BY 2, 3
      |  UNION ALL
      |  SELECT 2, pair_id,
      |      CAST(concat('0x', substr(md5('bl|2|' || g.gram), 1, 15))
      |        AS BIGINT), CAST(count(*) AS BIGINT)
      |    FROM ct, unnest(list_transform(range(1, len(toks)),
      |      i -> toks[i] || ' ' || toks[i + 1])) AS g(gram) GROUP BY 2, 3),
      |rg AS MATERIALIZED (
      |  SELECT 1 AS n, pair_id,
      |      CAST(concat('0x', substr(md5('bl|1|' || g.gram), 1, 15))
      |        AS BIGINT) AS h, CAST(count(*) AS BIGINT) AS rc
      |    FROM rt, unnest(toks) AS g(gram) GROUP BY 2, 3
      |  UNION ALL
      |  SELECT 2, pair_id,
      |      CAST(concat('0x', substr(md5('bl|2|' || g.gram), 1, 15))
      |        AS BIGINT), CAST(count(*) AS BIGINT)
      |    FROM rt, unnest(list_transform(range(1, len(toks)),
      |      i -> toks[i] || ' ' || toks[i + 1])) AS g(gram) GROUP BY 2, 3),
      |clip AS (SELECT n, CAST(sum(least(cc, rc)) AS BIGINT) AS clip
      |  FROM cg JOIN rg USING (n, pair_id, h) GROUP BY 1),
      |tot AS (SELECT n, CAST(sum(cc) AS BIGINT) AS tot FROM cg GROUP BY 1),
      |lens AS (SELECT
      |    (SELECT COALESCE(CAST(sum(len(toks)) AS BIGINT), 0) FROM ct)
      |      AS c_len,
      |    (SELECT COALESCE(CAST(sum(len(toks)) AS BIGINT), 0) FROM rt)
      |      AS r_len,
      |    (SELECT CAST(count(*) AS BIGINT) FROM ids) AS n_pairs),
      |ord AS (SELECT t.n, t.tot, COALESCE(c.clip, 0) AS clip,
      |    CASE WHEN t.tot > 0
      |      THEN CAST(COALESCE(c.clip, 0) AS DOUBLE) / CAST(t.tot AS DOUBLE)
      |      ELSE 0.0 END AS p
      |  FROM tot t LEFT JOIN clip c ON c.n = t.n),
      |w AS (SELECT
      |    max(CASE WHEN n = 1 THEN clip END) AS clip_1,
      |    max(CASE WHEN n = 1 THEN tot END) AS tot_1,
      |    max(CASE WHEN n = 1 THEN p END) AS p1,
      |    max(CASE WHEN n = 2 THEN clip END) AS clip_2,
      |    max(CASE WHEN n = 2 THEN tot END) AS tot_2,
      |    max(CASE WHEN n = 2 THEN p END) AS p2 FROM ord),
      |f AS (SELECT n_pairs, c_len, r_len,
      |    COALESCE(clip_1, 0) AS clip_1, COALESCE(tot_1, 0) AS tot_1,
      |    COALESCE(p1, 0.0) AS p1,
      |    COALESCE(clip_2, 0) AS clip_2, COALESCE(tot_2, 0) AS tot_2,
      |    COALESCE(p2, 0.0) AS p2,
      |    CASE WHEN c_len >= r_len OR c_len = 0 THEN 1.0
      |      ELSE exp(1.0 - CAST(r_len AS DOUBLE) / CAST(c_len AS DOUBLE))
      |      END AS bp_raw
      |  FROM w CROSS JOIN lens)
      |SELECT n_pairs, c_len, r_len, clip_1, tot_1, round(p1, 6) AS p_1,
      |  clip_2, tot_2, round(p2, 6) AS p_2, round(bp_raw, 6) AS bp,
      |  round(bp_raw * sqrt(p1 * p2), 6) AS bleu
      |FROM f""".stripMargin

  /** q_adamic_adar: per-center micro weight round(1e6/ln(deg)) as an
    * exact long before summing (order-free); wedge self-join on the
    * center, anti-exists against existing edges. */
  private val adamicAdarSql: String =
    """WITH e0 AS (SELECT DISTINCT l_partkey * 2 AS s,
      |    l_suppkey * 2 + 1 AS d FROM lineitem WHERE l_partkey % 20 = 0),
      |und AS MATERIALIZED (SELECT s AS w, d AS n FROM e0
      |  UNION SELECT d, s FROM e0),
      |dt AS (SELECT w,
      |    CAST(round(1000000.0 / ln(CAST(count(*) AS DOUBLE))) AS BIGINT)
      |      AS term
      |  FROM und GROUP BY 1
      |  HAVING count(*) >= 2 AND count(*) <= 100000),
      |sc AS (SELECT a.n AS u, b.n AS v, CAST(count(*) AS BIGINT) AS cn,
      |    CAST(sum(dt.term) AS BIGINT) AS aa_micro
      |  FROM und a JOIN und b ON b.w = a.w AND a.n < b.n
      |  JOIN dt ON dt.w = a.w
      |  GROUP BY 1, 2)
      |SELECT u, v, cn, aa_micro FROM sc
      |WHERE NOT EXISTS (SELECT 1 FROM und x
      |  WHERE x.w = sc.u AND x.n = sc.v)""".stripMargin

  /** q_pca_power: exact integer-micro mean/covariance, then the
    * unrolled power iteration with 12dp squash per round — v₀ =
    * 1/√dims per element, sequential list_dot_product on both sides. */
  private def pcaPowerSql(rounds: Int): String = {
    val steps = (1 to rounds).map { r =>
      s"""w$r AS (SELECT list(round(list_dot_product(rws.rw, v${r - 1}.v), 12)
        |    ORDER BY rws.i) AS w FROM rws CROSS JOIN v${r - 1}),
        |v$r AS (SELECT list_transform(w,
        |    x -> round(x / sqrt(list_dot_product(w, w)), 12)) AS v
        |  FROM w$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH vm AS MATERIALIZED (SELECT vec_id AS id,
      |    CAST(u.i AS INTEGER) - 1 AS j,
      |    CAST(round(CAST(embedding[u.i] AS DOUBLE) * 1e6, 0) AS BIGINT) AS x
      |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
      |mu AS MATERIALIZED (SELECT j,
      |    CAST(round(CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE), 0)
      |      AS BIGINT) AS m
      |  FROM vm GROUP BY 1),
      |cent AS MATERIALIZED (SELECT vm.id, vm.j, vm.x - mu.m AS e
      |  FROM vm JOIN mu USING (j)),
      |cov AS MATERIALIZED (SELECT a.j AS i, b.j AS jj,
      |    CAST(round(CAST(sum(a.e * b.e) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE), 0) AS BIGINT) AS c
      |  FROM cent a JOIN cent b ON a.id = b.id GROUP BY 1, 2),
      |rws AS MATERIALIZED (SELECT i, list(CAST(c AS DOUBLE) ORDER BY jj)
      |    AS rw FROM cov GROUP BY 1),
      |dims AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM mu),
      |v0 AS (SELECT list_transform(range(1, CAST(dims.nd AS INTEGER) + 1),
      |    x -> CAST(1.0 AS DOUBLE) / sqrt(CAST(dims.nd AS DOUBLE))) AS v
      |  FROM dims),
      |$steps,
      |wf AS (SELECT list(round(list_dot_product(rws.rw, v$rounds.v), 12)
      |    ORDER BY rws.i) AS w FROM rws CROSS JOIN v$rounds),
      |ray AS (SELECT list_dot_product(v$rounds.v, wf.w) AS ray
      |  FROM v$rounds CROSS JOIN wf),
      |tr AS (SELECT CAST(sum(c) AS BIGINT) AS trace FROM cov WHERE i = jj)
      |SELECT mu.j AS d, mu.m AS mu_micro,
      |  round(v$rounds.v[mu.j + 1], 6) AS pc1,
      |  round(ray.ray, 6) AS eig,
      |  round(ray.ray / CAST(tr.trace AS DOUBLE), 6) AS explained
      |FROM mu CROSS JOIN v$rounds CROSS JOIN ray CROSS JOIN tr""".stripMargin
  }

  /** q_delong: covariance of paired AUC structural components; the
    * cov shape string mirrors Evaluation.delongTest.cov verbatim. */
  private val delongSql: String = {
    def covSql(sxy: String, sx: String, sy: String, n: String,
        d: String): String =
      s"(CAST($sxy AS DOUBLE) - CAST($sx AS DOUBLE) * CAST($sy AS DOUBLE) " +
        s"/ CAST($n AS DOUBLE)) / (CAST($n AS DOUBLE) - 1.0) " +
        s"/ (CAST($d AS DOUBLE) * CAST($d AS DOUBLE))"
    val v10 = covSql("saa10", "sa10", "sa10", "n_pos", "2 * n_neg") +
      " + " + covSql("sbb10", "sb10", "sb10", "n_pos", "2 * n_neg") +
      " - 2.0 * " + covSql("sab10", "sa10", "sb10", "n_pos", "2 * n_neg")
    val v01 = covSql("saa01", "sa01", "sa01", "n_neg", "2 * n_pos") +
      " + " + covSql("sbb01", "sb01", "sb01", "n_neg", "2 * n_pos") +
      " - 2.0 * " + covSql("sab01", "sa01", "sb01", "n_neg", "2 * n_pos")
    val varD = s"($v10) / CAST(n_pos AS DOUBLE) " +
      s"+ ($v01) / CAST(n_neg AS DOUBLE)"
    s"""WITH t AS (SELECT doc_id, lang, text, n_chars, $toks AS toks
        |  FROM documents),
        |st AS (SELECT doc_id, lang, text, n_chars,
        |  CAST(len(toks) AS INTEGER) AS n_tokens,
        |  CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS INTEGER) AS n_punct,
        |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','is','to','in','it','that'))) AS INTEGER) AS n_stopwords
        |FROM t),
        |q AS (SELECT lang, text, n_chars,
        |  round(CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1) * 0.4
        |      + least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
        |      + (1.0 - CAST(n_punct AS DOUBLE) / greatest(length(text), 1)) * 0.2, 6)
        |    AS quality_score
        |FROM st),
        |sc AS (SELECT lang AS grp,
        |    CASE WHEN lower(text) LIKE '% the %' THEN 1 ELSE 0 END AS y,
        |    CAST(round(quality_score * 1e6, 0) AS BIGINT) AS sa,
        |    least(n_chars, 1000) * 1000 AS sb
        |  FROM q),
        |vta AS (SELECT grp, sa AS s, CAST(sum(y) AS BIGINT) AS pos,
        |    CAST(count(*) - sum(y) AS BIGINT) AS neg FROM sc GROUP BY 1, 2),
        |vta2 AS (SELECT grp, s,
        |    2 * COALESCE(CAST(sum(neg) OVER (PARTITION BY grp ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |      + neg AS v10,
        |    2 * COALESCE(CAST(sum(pos) OVER (PARTITION BY grp ORDER BY s
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS BIGINT), 0)
        |      + pos AS v01
        |  FROM vta),
        |vtb AS (SELECT grp, sb AS s, CAST(sum(y) AS BIGINT) AS pos,
        |    CAST(count(*) - sum(y) AS BIGINT) AS neg FROM sc GROUP BY 1, 2),
        |vtb2 AS (SELECT grp, s,
        |    2 * COALESCE(CAST(sum(neg) OVER (PARTITION BY grp ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |      + neg AS v10,
        |    2 * COALESCE(CAST(sum(pos) OVER (PARTITION BY grp ORDER BY s
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS BIGINT), 0)
        |      + pos AS v01
        |  FROM vtb),
        |j AS (SELECT sc.grp, sc.y, a.v10 AS v10a, a.v01 AS v01a,
        |    b.v10 AS v10b, b.v01 AS v01b
        |  FROM sc JOIN vta2 a ON a.grp = sc.grp AND a.s = sc.sa
        |  JOIN vtb2 b ON b.grp = sc.grp AND b.s = sc.sb),
        |ag AS (SELECT grp, CAST(sum(y) AS BIGINT) AS n_pos,
        |    CAST(count(*) - sum(y) AS BIGINT) AS n_neg,
        |    CAST(sum(CASE WHEN y = 1 THEN v10a ELSE 0 END) AS BIGINT) AS sa10,
        |    CAST(sum(CASE WHEN y = 1 THEN v10b ELSE 0 END) AS BIGINT) AS sb10,
        |    CAST(sum(CASE WHEN y = 1 THEN v10a * v10a ELSE 0 END) AS BIGINT) AS saa10,
        |    CAST(sum(CASE WHEN y = 1 THEN v10b * v10b ELSE 0 END) AS BIGINT) AS sbb10,
        |    CAST(sum(CASE WHEN y = 1 THEN v10a * v10b ELSE 0 END) AS BIGINT) AS sab10,
        |    CAST(sum(CASE WHEN y = 0 THEN v01a ELSE 0 END) AS BIGINT) AS sa01,
        |    CAST(sum(CASE WHEN y = 0 THEN v01b ELSE 0 END) AS BIGINT) AS sb01,
        |    CAST(sum(CASE WHEN y = 0 THEN v01a * v01a ELSE 0 END) AS BIGINT) AS saa01,
        |    CAST(sum(CASE WHEN y = 0 THEN v01b * v01b ELSE 0 END) AS BIGINT) AS sbb01,
        |    CAST(sum(CASE WHEN y = 0 THEN v01a * v01b ELSE 0 END) AS BIGINT) AS sab01
        |  FROM j GROUP BY 1)
        |SELECT grp, n_pos, n_neg,
        |  round(CASE WHEN n_pos = 0 OR n_neg = 0 THEN 0.5
        |    ELSE CAST(sa10 AS DOUBLE) / CAST(n_pos * 2 * n_neg AS DOUBLE)
        |    END, 6) AS auc_a,
        |  round(CASE WHEN n_pos = 0 OR n_neg = 0 THEN 0.5
        |    ELSE CAST(sb10 AS DOUBLE) / CAST(n_pos * 2 * n_neg AS DOUBLE)
        |    END, 6) AS auc_b,
        |  round(CASE WHEN n_pos < 2 OR n_neg < 2 THEN 0.0
        |    ELSE $varD END, 6) AS var_diff,
        |  round(CASE WHEN n_pos < 2 OR n_neg < 2 THEN 0.0
        |    WHEN ($varD) <= 0.0 THEN 0.0
        |    ELSE (CAST(sa10 - sb10 AS DOUBLE)
        |      / CAST(n_pos * 2 * n_neg AS DOUBLE)) / sqrt($varD)
        |  END, 6) AS z
        |FROM ag""".stripMargin
  }

  /** q_fd_discovery: one distinct-count aggregate per ordered column
    * pair from the SAME shared column list as the engine query. The
    * NULL key is the engine's two-part (is_null, value) key — here a
    * fixed-prefix concat ('true|'/'false|' differ before any value
    * content), collision-free against any genuine string value. */
  private val fdDiscoverySql: String = {
    val cols = ExtQueries.fdCols
    (for (a <- cols; b <- cols if a != b) yield
      s"""SELECT '$a' AS lhs, '$b' AS rhs,
        |  CAST(count(*) AS BIGINT) AS n_lhs,
        |  CAST(sum(k) AS BIGINT) AS n_pairs,
        |  max(k) = 1 AS holds,
        |  CAST(sum(k) - count(*) AS BIGINT) AS violations
        |FROM (SELECT ($a IS NULL) AS ln,
        |    coalesce(CAST($a AS VARCHAR), '') AS lv,
        |    CAST(count(DISTINCT concat(CAST($b IS NULL AS VARCHAR), '|',
        |      coalesce(CAST($b AS VARCHAR), ''))) AS BIGINT) AS k
        |  FROM customer GROUP BY 1, 2) z""".stripMargin)
      .mkString("\nUNION ALL\n")
  }

  /** q_jaccard_links: same wedge replay as adamicAdarSql with true
    * (unfiltered) endpoint degrees and the truncating micro division. */
  private val jaccardLinksSql: String =
    """WITH e0 AS (SELECT DISTINCT l_partkey * 2 AS s,
      |    l_suppkey * 2 + 1 AS d FROM lineitem WHERE l_partkey % 20 = 0),
      |und AS MATERIALIZED (SELECT s AS w, d AS n FROM e0
      |  UNION SELECT d, s FROM e0),
      |dall AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS deg
      |  FROM und GROUP BY 1),
      |ct AS (SELECT w FROM dall WHERE deg >= 2 AND deg <= 100000),
      |sc AS (SELECT a.n AS u, b.n AS v, CAST(count(*) AS BIGINT) AS cn
      |  FROM und a JOIN ct ON ct.w = a.w
      |  JOIN und b ON b.w = a.w AND a.n < b.n
      |  GROUP BY 1, 2),
      |j AS (SELECT sc.u, sc.v, sc.cn, du.deg AS du, dv.deg AS dv,
      |    (sc.cn * 1000000) // (du.deg + dv.deg - sc.cn) AS jaccard_micro
      |  FROM sc JOIN dall du ON du.w = sc.u JOIN dall dv ON dv.w = sc.v)
      |SELECT u, v, cn, du, dv, jaccard_micro FROM j
      |WHERE NOT EXISTS (SELECT 1 FROM und x
      |  WHERE x.w = j.u AND x.n = j.v)""".stripMargin

  val all: Map[String, String] = base ++ Map(
    "q_dedup_indexed" -> base("q_dedup_incremental"),
    "q_jaccard_links" -> jaccardLinksSql,
    "q_fd_discovery" -> fdDiscoverySql,
    "q_memorization_indexed" -> base("q_memorization"),
    "q_line_dedup_indexed" -> base("q_line_dedup"),
    "q_maxsim_topk" -> maxsimSql,
    "q_bradley_terry" -> bradleyTerrySql,
    "q_corpus_drift" -> corpusDriftSql,
    "q_rouge_overlap" -> rougeSql,
    "q_eval_calibration" -> calibrationSql,
    "q_cohen_kappa" -> cohenKappaSql,
    "q_vocab_richness" -> vocabRichnessSql,
    "q_lsh_recall" -> lshRecallSql(toks),
    "q_hits" -> hitsSql,
    "q_holt_forecast" -> holtSql,
    "q_holt_winters" -> holtWintersSql,
    "q_forecast_backtest" -> forecastBacktestSql,
    "q_modularity" -> modularitySql,
    "q_embed_drift" -> embedDriftSql,
    "q_theil_sen" -> theilSenSql,
    "q_mad_outliers" -> madOutliersSql,
    "q_mutual_knn" -> mutualKnnSql,
    "q_luhn_screen" -> luhnScreenSql,
    "q_vocab_pruning" -> vocabPruningSql,
    "q_auc_roc" -> aucRocSql,
    "q_fleiss_kappa" -> fleissKappaSql,
    "q_krippendorff_alpha" -> krippendorffSql,
    "q_ks_drift" -> ksDriftSql,
    "q_wasserstein" -> wassersteinSql,
    "q_cvm" -> cvmSql,
    "q_anderson_darling" -> andersonDarlingSql,
    "q_psi_drift" -> psiDriftSql,
    "q_chi_square" -> chiSquareSql,
    "q_ppr" -> pprSql,
    "q_periodogram" -> periodogramSql,
    "q_feature_hash" -> featureHashSql,
    "q_label_vote" -> labelVoteSql,
    "q_containment" -> containmentSql,
    "q_conv_containment" -> convContainmentSql,
    "q_zipf_slope" -> zipfSlopeSql,
    "q_benford" -> benfordSql,
    "q_containment_indexed" -> containmentIndexedSql,
    "q_leakage_split" -> leakageSplitSql,
    "q_fk_audit" -> fkAuditSql,
    "q_audio_frames" -> audioFramesSql,
    "q_vad_gate" -> vadGateSql,
    "q_image_stats" -> imageStatsSql,
    "q_source_freshness" -> sourceFreshnessSql,
    "q_corpus_bleu" -> corpusBleuSql,
    "q_adamic_adar" -> adamicAdarSql,
    "q_fellegi_sunter" -> fellegiSunterSql,
    "q_fs_em" -> fsEmSql(ExtQueries.fsEmIters),
    "q_lr_train" -> lrTrainSql(ExtQueries.lrIters),
    "q_lr_eval" -> lrEvalSql(ExtQueries.lrIters),
    "q_cartography" -> cartographySql(ExtQueries.lrIters),

    // weighted Cohen's κ (linear + quadratic) between two derived 1–5
    // ordinal judges; κ_w = 1 − n·Σ(w·O)/Σ(w·row·col), exact longs
    // until the one final division
    "q_weighted_kappa" ->
      s"""WITH t AS (SELECT lang AS grp,
        |    least(5, greatest(1, n_chars // 50)) AS i,
        |    least(5, greatest(1, CAST(len($toks) AS BIGINT) // 10)) AS j
        |  FROM documents),
        |cells AS (SELECT grp, i, j, count(*) AS o FROM t GROUP BY 1, 2, 3),
        |obs AS (SELECT grp, CAST(sum(o) AS BIGINT) AS n,
        |    CAST(sum(abs(i - j) * o) AS BIGINT) AS wol,
        |    CAST(sum((i - j) * (i - j) * o) AS BIGINT) AS woq
        |  FROM cells GROUP BY grp),
        |rws AS (SELECT grp, i, CAST(sum(o) AS BIGINT) AS ri
        |        FROM cells GROUP BY 1, 2),
        |cls AS (SELECT grp, j, CAST(sum(o) AS BIGINT) AS cj
        |        FROM cells GROUP BY 1, 2),
        |ex AS (SELECT rws.grp,
        |    CAST(sum(abs(rws.i - cls.j) * rws.ri * cls.cj) AS BIGINT) AS wel,
        |    CAST(sum((rws.i - cls.j) * (rws.i - cls.j) * rws.ri * cls.cj)
        |      AS BIGINT) AS weq
        |  FROM rws JOIN cls ON rws.grp = cls.grp GROUP BY 1)
        |SELECT obs.grp, obs.n,
        |  round(CASE WHEN ex.wel = 0 THEN 1.0 ELSE
        |    1.0 - CAST(obs.n * obs.wol AS DOUBLE) / CAST(ex.wel AS DOUBLE)
        |    END, 6) AS kappa_linear,
        |  round(CASE WHEN ex.weq = 0 THEN 1.0 ELSE
        |    1.0 - CAST(obs.n * obs.woq AS DOUBLE) / CAST(ex.weq AS DOUBLE)
        |    END, 6) AS kappa_quadratic
        |FROM obs JOIN ex ON obs.grp = ex.grp""".stripMargin,

    // Flesch–Kincaid: words = whitespace tokens, sentences = [.!?]+
    // runs (min 1), syllables = [aeiouy]+ runs per word (min 1);
    // every constant CAST to DOUBLE so DuckDB's decimal literals
    // don't change the arithmetic shape
    "q_readability" ->
      s"""WITH t AS (SELECT doc_id, text, $toks AS toks FROM documents),
        |s AS (SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT)
        |      AS n_sentences,
        |    CAST(coalesce(list_sum(list_transform(toks, w ->
        |      greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))), 0)
        |      AS BIGINT) AS n_syllables
        |  FROM t)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  round(CASE WHEN n_words = 0 THEN 0.0 ELSE
        |    CAST(0.39 AS DOUBLE) * CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)
        |    + CAST(11.8 AS DOUBLE) * CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)
        |    - CAST(15.59 AS DOUBLE) END, 6) AS fk_grade,
        |  round(CASE WHEN n_words = 0 THEN 0.0 ELSE
        |    CAST(206.835 AS DOUBLE)
        |    - CAST(1.015 AS DOUBLE) * CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)
        |    - CAST(84.6 AS DOUBLE) * CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)
        |    END, 6) AS flesch_ease
        |FROM s""".stripMargin,

    // fog/SMOG/Coleman–Liau on the shared readability heuristics:
    // complex = 3+ vowel groups, letters = [A-Za-z] count
    "q_readability_ext" ->
      s"""WITH t AS (SELECT doc_id, text, $toks AS toks FROM documents),
        |s AS (SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT)
        |      AS n_sentences,
        |    CAST(len(list_filter(toks, w ->
        |      len(regexp_extract_all(w, '[aeiouy]+')) >= 3)) AS BIGINT)
        |      AS n_complex,
        |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT)
        |      AS n_letters
        |  FROM t)
        |SELECT doc_id, n_words, n_sentences, n_complex, n_letters,
        |  round(CASE WHEN n_words = 0 THEN 0.0 ELSE
        |    CAST(0.4 AS DOUBLE) * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)
        |    + CAST(100.0 AS DOUBLE) * CAST(n_complex AS DOUBLE) / CAST(n_words AS DOUBLE))
        |    END, 6) AS fog,
        |  round(CASE WHEN n_words = 0 THEN 0.0 ELSE
        |    CAST(1.0430 AS DOUBLE) * sqrt(CAST(n_complex AS DOUBLE)
        |      * CAST(30.0 AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |    + CAST(3.1291 AS DOUBLE) END, 6) AS smog,
        |  round(CASE WHEN n_words = 0 THEN 0.0 ELSE
        |    CAST(0.0588 AS DOUBLE) * (CAST(100.0 AS DOUBLE)
        |      * CAST(n_letters AS DOUBLE) / CAST(n_words AS DOUBLE))
        |    - CAST(0.296 AS DOUBLE) * (CAST(100.0 AS DOUBLE)
        |      * CAST(n_sentences AS DOUBLE) / CAST(n_words AS DOUBLE))
        |    - CAST(15.8 AS DOUBLE) END, 6) AS coleman_liau
        |FROM s""".stripMargin,

    // mixture diversity: entropy/effective-N/HHI over source shares,
    // Gini over size-sorted groups (exact long Σ i·x)
    "q_mix_diversity" ->
      """WITH g AS (SELECT source AS grp, count(*) AS c
        |           FROM documents GROUP BY source),
        |r AS (SELECT c, row_number() OVER (ORDER BY c, grp) AS i FROM g),
        |a AS (SELECT count(*) AS n_groups, CAST(sum(c) AS BIGINT) AS n_docs,
        |        CAST(sum(i * c) AS BIGINT) AS iwx FROM r),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM g),
        |e AS (SELECT
        |    sum(-(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) *
        |      ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE))) AS h,
        |    sum((CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) *
        |      (CAST(c AS DOUBLE) / CAST(t AS DOUBLE))) AS hhi
        |  FROM g, tot)
        |SELECT a.n_groups, a.n_docs,
        |  round(e.h, 6) AS entropy,
        |  round(exp(e.h), 6) AS eff_n,
        |  round(e.hhi, 6) AS hhi,
        |  round(CASE WHEN a.n_groups <= 1 THEN 0.0 ELSE
        |    CAST(2.0 AS DOUBLE) * CAST(a.iwx AS DOUBLE) /
        |      CAST(a.n_groups * a.n_docs AS DOUBLE)
        |    - CAST(a.n_groups + 1 AS DOUBLE) / CAST(a.n_groups AS DOUBLE)
        |    END, 6) AS gini
        |FROM a, e""".stripMargin,

    // RAKE: phrases = maximal stopword-free runs; word score =
    // floor(deg·10⁶ / freq) with deg = Σ containing-phrase length;
    // phrase score = Σ word scores; top 3 per doc
    "q_rake_keywords" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |tok AS (SELECT doc_id, i AS pos, toks[i] AS w,
        |          toks[i] IN ($enStopSql) AS is_stop
        |        FROM t, unnest(range(1, len(toks) + 1)) AS u(i)),
        |ph AS (SELECT doc_id, pos, w, is_stop,
        |         sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY doc_id ORDER BY pos) AS pid
        |       FROM tok),
        |occ AS (SELECT doc_id, pid, pos, w,
        |          count(*) OVER (PARTITION BY doc_id, pid) AS plen
        |        FROM ph WHERE NOT is_stop),
        |ws AS (SELECT w,
        |         (CAST(sum(plen) AS BIGINT) * 1000000) // count(*) AS w_score
        |       FROM occ GROUP BY w),
        |phr AS (SELECT o.doc_id, o.pid,
        |          string_agg(o.w, ' ' ORDER BY o.pos) AS phrase,
        |          CAST(sum(ws.w_score) AS BIGINT) AS score_micro
        |        FROM occ o JOIN ws USING (w) GROUP BY o.doc_id, o.pid)
        |SELECT doc_id, phrase, score_micro, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score_micro DESC, phrase, pid) AS rn FROM phr) x
        |WHERE rn <= 3""".stripMargin,

    // Spearman ρ with doubled average ranks (2·rank_min + ties − 1,
    // exact longs) + Kendall τ-b over the first-200-by-id capped
    // subset per language
    "q_rank_corr" ->
      s"""WITH t AS (SELECT lang AS grp, doc_id AS id,
        |        CAST(n_chars AS BIGINT) AS x,
        |        CAST(len($toks) AS BIGINT) AS y FROM documents),
        |r AS (SELECT grp, id, x, y,
        |    2 * rank() OVER (PARTITION BY grp ORDER BY x)
        |      + count(*) OVER (PARTITION BY grp, x) - 1 AS rx,
        |    2 * rank() OVER (PARTITION BY grp ORDER BY y)
        |      + count(*) OVER (PARTITION BY grp, y) - 1 AS ry
        |  FROM t),
        |rho AS (SELECT grp, count(*) AS n,
        |    CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
        |    CAST(sum(rx * rx) AS BIGINT) AS sxx,
        |    CAST(sum(ry * ry) AS BIGINT) AS syy,
        |    CAST(sum(rx * ry) AS BIGINT) AS sxy
        |  FROM r GROUP BY grp),
        |rho2 AS (SELECT grp, n,
        |    round(CASE WHEN n * sxx = sx * sx OR n * syy = sy * sy THEN 0.0
        |      ELSE CAST(n * sxy - sx * sy AS DOUBLE) /
        |        sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
        |             CAST(n * syy - sy * sy AS DOUBLE)) END, 6) AS spearman_rho
        |  FROM rho),
        |cap AS (SELECT grp, id, x, y FROM (
        |    SELECT *, row_number() OVER (PARTITION BY grp ORDER BY id) AS rn
        |    FROM t) z WHERE rn <= 200),
        |p AS (SELECT a.grp AS grp,
        |        CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1
        |             WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN -1
        |             ELSE 0 END AS s,
        |        CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
        |        CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
        |      FROM cap a JOIN cap b ON a.grp = b.grp AND a.id < b.id),
        |tau AS (SELECT grp,
        |    CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(sum(tx) AS BIGINT) AS n1, CAST(sum(ty) AS BIGINT) AS n2,
        |    count(*) AS n0
        |  FROM p GROUP BY grp),
        |tau2 AS (SELECT grp,
        |    round(CASE WHEN n0 = n1 OR n0 = n2 THEN 0.0
        |      ELSE CAST(c - d AS DOUBLE) /
        |        sqrt(CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n2 AS DOUBLE))
        |      END, 6) AS kendall_tau_b
        |  FROM tau),
        |nt AS (SELECT grp, count(*) AS n_tau FROM cap GROUP BY grp)
        |SELECT rho2.grp, rho2.n, rho2.spearman_rho,
        |  coalesce(nt.n_tau, 0) AS n_tau,
        |  coalesce(tau2.kendall_tau_b, 0.0) AS kendall_tau_b
        |FROM rho2 LEFT JOIN nt USING (grp) LEFT JOIN tau2 USING (grp)""".stripMargin,

    // two-proportion pooled z-test; arm = user_id parity, conversion
    // = value > 50
    "q_ab_test" ->
      """WITH t AS (SELECT event_type AS grp, user_id % 2 AS arm,
        |        CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS conv
        |      FROM events),
        |a AS (SELECT grp,
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN arm != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
        |    CAST(sum(CASE WHEN arm != 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
        |  FROM t GROUP BY grp),
        |b AS (SELECT *, CAST(conv_a AS DOUBLE) / n_a AS pa,
        |        CAST(conv_b AS DOUBLE) / n_b AS pb,
        |        CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b) AS pp
        |      FROM a),
        |c AS (SELECT *, sqrt(pp * (1.0 - pp) *
        |        (1.0 / n_a + 1.0 / n_b)) AS se FROM b)
        |SELECT grp, n_a, n_b, conv_a, conv_b,
        |  round(CASE WHEN n_a = 0 THEN 0.0 ELSE pa END, 6) AS rate_a,
        |  round(CASE WHEN n_b = 0 THEN 0.0 ELSE pb END, 6) AS rate_b,
        |  round(CASE WHEN n_a = 0 OR n_b = 0 THEN 0.0
        |    WHEN se = 0 THEN 0.0 ELSE (pa - pb) / se END, 6) AS z
        |FROM c""".stripMargin,

    // difference-in-differences: four exact cell sums per group, then
    // the DiD/z formulas mirrored from Evaluation.didEstimate
    "q_did" ->
      """WITH b AS (SELECT event_type AS grp, user_id % 2 AS a,
        |    CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
        |      THEN 1 ELSE 0 END AS p,
        |    CAST(round(value * 100, 0) AS BIGINT) AS y FROM events),
        |ag AS (SELECT grp,
        |  CAST(sum(CASE WHEN a=0 AND p=0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
        |  CAST(sum(CASE WHEN a=0 AND p=1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
        |  CAST(sum(CASE WHEN a=1 AND p=0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
        |  CAST(sum(CASE WHEN a=1 AND p=1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
        |  CAST(sum(CASE WHEN a=0 AND p=0 THEN y ELSE 0 END) AS BIGINT) AS s00,
        |  CAST(sum(CASE WHEN a=0 AND p=1 THEN y ELSE 0 END) AS BIGINT) AS s01,
        |  CAST(sum(CASE WHEN a=1 AND p=0 THEN y ELSE 0 END) AS BIGINT) AS s10,
        |  CAST(sum(CASE WHEN a=1 AND p=1 THEN y ELSE 0 END) AS BIGINT) AS s11,
        |  CAST(sum(CASE WHEN a=0 AND p=0 THEN y*y ELSE 0 END) AS BIGINT) AS q00,
        |  CAST(sum(CASE WHEN a=0 AND p=1 THEN y*y ELSE 0 END) AS BIGINT) AS q01,
        |  CAST(sum(CASE WHEN a=1 AND p=0 THEN y*y ELSE 0 END) AS BIGINT) AS q10,
        |  CAST(sum(CASE WHEN a=1 AND p=1 THEN y*y ELSE 0 END) AS BIGINT) AS q11
        | FROM b GROUP BY 1),
        |f AS (SELECT *,
        |  (CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE)
        |    - CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE))
        |  - (CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE)
        |    - CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE)) AS did,
        |  sqrt(
        |    (CAST(n00 AS DOUBLE) * CAST(q00 AS DOUBLE)
        |      - CAST(s00 AS DOUBLE) * CAST(s00 AS DOUBLE))
        |      / (CAST(n00 AS DOUBLE) * (CAST(n00 AS DOUBLE) - 1.0))
        |      / CAST(n00 AS DOUBLE) +
        |    (CAST(n01 AS DOUBLE) * CAST(q01 AS DOUBLE)
        |      - CAST(s01 AS DOUBLE) * CAST(s01 AS DOUBLE))
        |      / (CAST(n01 AS DOUBLE) * (CAST(n01 AS DOUBLE) - 1.0))
        |      / CAST(n01 AS DOUBLE) +
        |    (CAST(n10 AS DOUBLE) * CAST(q10 AS DOUBLE)
        |      - CAST(s10 AS DOUBLE) * CAST(s10 AS DOUBLE))
        |      / (CAST(n10 AS DOUBLE) * (CAST(n10 AS DOUBLE) - 1.0))
        |      / CAST(n10 AS DOUBLE) +
        |    (CAST(n11 AS DOUBLE) * CAST(q11 AS DOUBLE)
        |      - CAST(s11 AS DOUBLE) * CAST(s11 AS DOUBLE))
        |      / (CAST(n11 AS DOUBLE) * (CAST(n11 AS DOUBLE) - 1.0))
        |      / CAST(n11 AS DOUBLE)) AS se
        | FROM ag WHERE n00 > 0 AND n01 > 0 AND n10 > 0 AND n11 > 0)
        |SELECT grp, n00, n01, n10, n11,
        |  round(CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE), 6) AS m00,
        |  round(CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE), 6) AS m01,
        |  round(CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE), 6) AS m10,
        |  round(CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE), 6) AS m11,
        |  round(did, 6) AS did_micro,
        |  round(CASE WHEN n00 < 2 OR n01 < 2 OR n10 < 2 OR n11 < 2 THEN 0.0
        |    WHEN se = 0.0 THEN 0.0 ELSE did / se END, 6) AS z
        |FROM f""".stripMargin,

    // CUPED: pooled theta/xbar from exact sums, per-arm adjusted
    // mean and variance reduction derived algebraically (no per-row
    // doubles anywhere) — formulas mirror Evaluation.cupedAdjust
    "q_cuped" ->
      """WITH e AS (SELECT user_id,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents,
        |    CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
        |      THEN 1 ELSE 0 END AS post FROM events),
        |u AS (SELECT user_id,
        |    CAST(sum(CASE WHEN post = 0 THEN cents ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN post = 1 THEN cents ELSE 0 END) AS BIGINT) AS y
        |  FROM e GROUP BY 1),
        |c AS (SELECT 'all' AS grp, user_id % 2 AS arm, y, x FROM u),
        |cells AS (SELECT grp, arm, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y*y) AS BIGINT) AS syy, CAST(sum(x*x) AS BIGINT) AS sxx,
        |    CAST(sum(x*y) AS BIGINT) AS sxy
        |  FROM c GROUP BY 1, 2),
        |pooled AS (SELECT grp, CAST(sum(n) AS BIGINT) AS tn,
        |    CAST(sum(sy) AS BIGINT) AS tsy, CAST(sum(sx) AS BIGINT) AS tsx,
        |    CAST(sum(sxx) AS BIGINT) AS tsxx, CAST(sum(sxy) AS BIGINT) AS tsxy
        |  FROM cells GROUP BY 1),
        |pt AS (SELECT grp,
        |    CASE WHEN CAST(tn AS DOUBLE) * CAST(tsxx AS DOUBLE)
        |        - CAST(tsx AS DOUBLE) * CAST(tsx AS DOUBLE) = 0.0 THEN 0.0
        |      ELSE (CAST(tn AS DOUBLE) * CAST(tsxy AS DOUBLE)
        |        - CAST(tsx AS DOUBLE) * CAST(tsy AS DOUBLE))
        |        / (CAST(tn AS DOUBLE) * CAST(tsxx AS DOUBLE)
        |          - CAST(tsx AS DOUBLE) * CAST(tsx AS DOUBLE)) END AS th,
        |    CAST(tsx AS DOUBLE) / CAST(tn AS DOUBLE) AS xb
        |  FROM pooled),
        |j AS (SELECT cells.*, pt.th, pt.xb,
        |    CAST(n AS DOUBLE) AS nd FROM cells JOIN pt USING (grp)),
        |k AS (SELECT *,
        |    CAST(sy AS DOUBLE) / nd AS meany,
        |    CAST(sx AS DOUBLE) / nd AS meanx,
        |    (nd * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (nd * (nd - 1.0)) AS vary,
        |    (nd * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      / (nd * (nd - 1.0)) AS varx,
        |    (nd * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (nd * (nd - 1.0)) AS covxy
        |  FROM j)
        |SELECT grp, arm, n, round(meany, 6) AS mean_y,
        |  round(meany - th * (meanx - xb), 6) AS mean_adj,
        |  round(th, 6) AS theta,
        |  round(CASE WHEN n < 2 OR vary = 0.0 THEN 0.0
        |    ELSE 1.0 - (vary - 2.0 * th * covxy + th * th * varx) / vary
        |  END, 6) AS var_reduction
        |FROM k""".stripMargin,

    // DeLong paired-AUC replay: structural components from value-
    // count windows (the aucRoc discipline), one example join, exact
    // long sums, covariance shapes mirrored from Evaluation.delongTest
    "q_delong" -> delongSql,
    "q_mann_whitney" -> mannWhitneySql,
    "q_fdr_bh" -> fdrBhSql,
    "q_mantel_haenszel" -> mantelHaenszelSql,
    "q_js_divergence" -> jsDivergenceSql,
    "q_kaplan_meier" -> kaplanMeierSql,
    "q_nelson_aalen" -> nelsonAalenSql,
    "q_welch_ttest" -> welchTtestSql,
    "q_msprt" -> msprtSql,
    "q_kruskal_wallis" -> kruskalWallisSql,
    "q_brown_forsythe" -> brownForsytheSql,
    "q_bartlett" -> bartlettSql,
    "q_jonckheere" -> jonckheereSql,
    "q_kendall_w" -> kendallWSql,
    "q_friedman" -> friedmanSql,
    "q_page_trend" -> pageTrendSql,
    "q_split_half" -> splitHalfSql,
    "q_cronbach_alpha" -> cronbachAlphaSql,
    "q_changepoint" -> changepointSql,
    "q_local_clustering" -> localClusteringSql,
    "q_rich_club" -> richClubSql,
    "q_ktruss" -> kTrussSql,
    // forced-distributed variant: path differs, fixpoint identical
    "q_ktruss_dist" -> kTrussSql,
    "q_gini" -> giniSql,
    "q_boxplot" -> boxplotSql,
    "q_lift_gain" -> liftGainSql,
    "q_column_mi" -> columnMiSql,
    "q_dp_dispersion" -> dpDispersionSql,
    "q_strat_ate" -> stratAteSql,
    "q_quantile_norm" -> quantileNormSql,
    "q_icc" -> iccSql,
    "q_runs_test" -> runsTestSql,
    "q_cliffs_delta" -> cliffsDeltaSql,
    "q_hosmer_lemeshow" -> hosmerLemeshowSql,
    "q_yules_k" -> yulesKSql,
    "q_durbin_watson" -> durbinWatsonSql,
    "q_partial_corr" -> partialCorrSql,
    "q_mann_kendall" -> mannKendallSql,
    "q_cochran_q" -> cochranQSql,
    "q_pr_auc" -> prAucSql,
    "q_logrank" -> logRankSql,
    "q_effect_size" -> effectSizeSql,
    "q_page_hinkley" -> pageHinkleySql,
    "q_gwet_ac1" -> gwetAc1Sql,
    "q_rbo" -> rboSql,
    "q_trimmed_mean" -> trimmedMeanSql,
    "q_assortativity" -> assortativitySql,
    "q_hill_tail" -> hillTailSql,
    "q_seasonal_strength" -> seasonalStrengthSql,
    "q_brier_decomp" -> brierDecompSql,
    "q_pca_power" -> pcaPowerSql(ExtQueries.pcaRounds),
    // effective rank: the pcaPower covariance cells re-rounded to
    // unit scale, trace and Frobenius as exact long folds
    "q_effective_rank" ->
      """WITH vm AS MATERIALIZED (SELECT vec_id AS id,
        |    CAST(u.i AS INTEGER) - 1 AS j,
        |    CAST(round(CAST(embedding[u.i] AS DOUBLE) * 1e6, 0) AS BIGINT) AS x
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
        |mu AS (SELECT j,
        |    CAST(round(CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE), 0)
        |      AS BIGINT) AS m
        |  FROM vm GROUP BY 1),
        |cent AS MATERIALIZED (SELECT vm.id, vm.j, vm.x - mu.m AS e
        |  FROM vm JOIN mu USING (j)),
        |cov AS (SELECT a.j AS i, b.j AS jj,
        |    CAST(round(CAST(round(CAST(sum(a.e * b.e) AS DOUBLE)
        |        / CAST(count(*) AS DOUBLE), 0) AS DOUBLE) / 1e6, 0)
        |      AS BIGINT) AS cr
        |  FROM cent a JOIN cent b ON a.id = b.id GROUP BY 1, 2)
        |SELECT CAST(sum(CASE WHEN i = jj THEN 1 ELSE 0 END) AS BIGINT) AS dims,
        |  CAST(sum(CASE WHEN i = jj THEN cr ELSE 0 END) AS BIGINT)
        |    AS trace_units,
        |  CAST(sum(cr * cr) AS BIGINT) AS frob2_units,
        |  round(CASE WHEN sum(cr * cr) = 0 THEN 0.0
        |    ELSE CAST(sum(CASE WHEN i = jj THEN cr ELSE 0 END)
        |        * sum(CASE WHEN i = jj THEN cr ELSE 0 END) AS DOUBLE)
        |      / CAST(sum(cr * cr) AS DOUBLE) END, 6) AS eff_rank
        |FROM cov""".stripMargin,

    // split-conformal gate: the q_text_stats quality replay feeds
    // inverted-score nonconformity; k = ceil((n+1)(1-alpha)) by
    // integer arithmetic; the order statistic via cumulative value
    // counts; coverage measured on the held-out split
    "q_conformal_gate" ->
      s"""WITH t AS (SELECT doc_id, lang, text, $toks AS toks FROM documents),
        |st AS (SELECT doc_id, lang,
        |  CAST(len(toks) AS INTEGER) AS n_tokens,
        |  CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS INTEGER) AS n_punct,
        |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','is','to','in','it','that'))) AS INTEGER) AS n_stopwords,
        |  length(text) AS n_chars
        |FROM t),
        |q AS (SELECT doc_id, lang,
        |  round(CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1) * 0.4
        |      + least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
        |      + (1.0 - CAST(n_punct AS DOUBLE) / greatest(n_chars, 1)) * 0.2, 6)
        |    AS quality_score
        |FROM st),
        |sc AS (SELECT lang AS grp,
        |    CASE WHEN doc_id % 5 = 0 THEN 'test' ELSE 'cal' END AS split,
        |    1000000 - CAST(round(quality_score * 1e6, 0) AS BIGINT) AS s
        |  FROM q),
        |ncal AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_cal,
        |    ((count(*) + 1) * 900 + 999) // 1000 AS k
        |  FROM sc WHERE split = 'cal' GROUP BY 1),
        |cum AS (SELECT grp, s,
        |    CAST(sum(count(*)) OVER (PARTITION BY grp ORDER BY s)
        |      AS BIGINT) AS cum
        |  FROM sc WHERE split = 'cal' GROUP BY grp, s),
        |thr AS (SELECT cum.grp, min(cum.s) AS thr0
        |  FROM cum JOIN ncal ON ncal.grp = cum.grp
        |  WHERE cum.cum >= ncal.k GROUP BY 1),
        |ta AS (SELECT ncal.grp, ncal.n_cal, ncal.k,
        |    coalesce(thr.thr0, 1000000) AS threshold_micro
        |  FROM ncal LEFT JOIN thr ON thr.grp = ncal.grp),
        |tc AS (SELECT tst.grp, CAST(count(*) AS BIGINT) AS n_test0,
        |    CAST(sum(CASE WHEN tst.s <= ta.threshold_micro
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_cov0
        |  FROM sc tst JOIN ta ON ta.grp = tst.grp
        |  WHERE tst.split = 'test' GROUP BY 1)
        |SELECT ta.grp, ta.n_cal, ta.k, ta.threshold_micro,
        |  coalesce(tc.n_test0, 0) AS n_test,
        |  coalesce(tc.n_cov0, 0) AS n_cov,
        |  CASE WHEN coalesce(tc.n_test0, 0) = 0 THEN NULL
        |    ELSE round(CAST(tc.n_cov0 AS DOUBLE)
        |      / CAST(tc.n_test0 AS DOUBLE), 6) END AS coverage
        |FROM ta LEFT JOIN tc ON tc.grp = ta.grp""".stripMargin,

    // interval Krippendorff: per-unit (m, Σv, Σv²) → 2(m·S2−S1²)
    // identity — no category grid; incomplete panel via residue drops
    "q_krippendorff_interval" ->
      s"""WITH d AS (SELECT lang AS grp, doc_id AS item,
        |    least(5, greatest(1, n_chars // 50)) AS v1,
        |    least(5, greatest(1, len($toks) // 10)) AS v2,
        |    least(5, greatest(1, n_chars // 60)) AS v3
        |  FROM documents),
        |r AS (
        |  SELECT grp, item, v1 AS v FROM d
        |  UNION ALL SELECT grp, item, v2 FROM d WHERE item % 17 <> 0
        |  UNION ALL SELECT grp, item, v3 FROM d
        |    WHERE item % 17 <> 0 AND item % 3 <> 0),
        |pi AS (SELECT grp, item, CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(v) AS BIGINT) AS s1, CAST(sum(v * v) AS BIGINT) AS s2
        |  FROM r GROUP BY 1, 2),
        |pi2 AS (SELECT *,
        |    CAST(round(1e6 * CAST(2 * (m * s2 - s1 * s1) AS DOUBLE)
        |      / CAST(m - 1 AS DOUBLE), 0) AS BIGINT) AS du
        |  FROM pi WHERE m >= 2),
        |ag AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_items,
        |    CAST(sum(m) AS BIGINT) AS n_ratings,
        |    CAST(sum(du) AS BIGINT) AS do_micro,
        |    CAST(sum(s1) AS BIGINT) AS t1, CAST(sum(s2) AS BIGINT) AS t2
        |  FROM pi2 GROUP BY 1),
        |fin AS (SELECT *, 2 * (n_ratings * t2 - t1 * t1) AS den FROM ag)
        |SELECT grp, n_items, n_ratings, do_micro,
        |  round(CAST(den AS DOUBLE) / CAST(n_ratings - 1 AS DOUBLE), 6) AS de,
        |  CASE WHEN den = 0 THEN CAST(1.0 AS DOUBLE)
        |    ELSE round(CAST(1.0 AS DOUBLE) - (CAST(do_micro AS DOUBLE) / 1e6)
        |      / (CAST(den AS DOUBLE) / CAST(n_ratings - 1 AS DOUBLE)), 6)
        |  END AS alpha
        |FROM fin""".stripMargin,

    // distinct-n diversity: per (source, n) exact occurrence and
    // distinct-type counts over the same tokenizer
    "q_distinct_ngrams" ->
      s"""WITH t AS (SELECT source AS grp, $toks AS toks FROM documents),
        |g AS (
        |  SELECT grp, 1 AS n, toks[CAST(i AS INTEGER)] AS gram
        |  FROM (SELECT grp, toks, unnest(range(1, len(toks) + 1)) AS i
        |        FROM t) x
        |  UNION ALL
        |  SELECT grp, 2, concat(toks[CAST(i AS INTEGER)], ' ',
        |      toks[CAST(i + 1 AS INTEGER)])
        |  FROM (SELECT grp, toks, unnest(range(1, len(toks))) AS i
        |        FROM t) x
        |  UNION ALL
        |  SELECT grp, 3, concat(toks[CAST(i AS INTEGER)], ' ',
        |      toks[CAST(i + 1 AS INTEGER)], ' ',
        |      toks[CAST(i + 2 AS INTEGER)])
        |  FROM (SELECT grp, toks, unnest(range(1, len(toks) - 1)) AS i
        |        FROM t) x)
        |SELECT grp, n, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct,
        |  round(CAST(count(DISTINCT gram) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS distinct_ratio
        |FROM g GROUP BY 1, 2""".stripMargin,

    // confident-learning joint: langid hit shares as per-class micro
    // probabilities, self-confidence mean thresholds, threshold-
    // cleared argmax (ties to first class), classes^2 count matrix
    "q_label_noise" ->
      s"""WITH t AS (SELECT doc_id, lang, $toks AS toks FROM documents
        |  WHERE lang IN ('en','es','fr','de')),
        |s AS (SELECT doc_id, lang,
        |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','is','to','in','it','that'))) AS BIGINT) AS en_hits,
        |  CAST(len(list_filter(toks, x -> x IN ('el','la','de','y','es','en','que','los'))) AS BIGINT) AS es_hits,
        |  CAST(len(list_filter(toks, x -> x IN ('le','la','de','et','est','les','des','un'))) AS BIGINT) AS fr_hits,
        |  CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist','den','von','mit'))) AS BIGINT) AS de_hits
        |FROM t),
        |w AS (SELECT *, en_hits + es_hits + fr_hits + de_hits AS tot
        |      FROM s),
        |sc AS (
        |  SELECT doc_id, lang AS noisy, 'en' AS cls,
        |    CAST(round(CAST(en_hits AS DOUBLE) * 1e6 / CAST(tot AS DOUBLE), 0) AS BIGINT) AS p
        |  FROM w WHERE tot > 0
        |  UNION ALL
        |  SELECT doc_id, lang, 'es',
        |    CAST(round(CAST(es_hits AS DOUBLE) * 1e6 / CAST(tot AS DOUBLE), 0) AS BIGINT)
        |  FROM w WHERE tot > 0
        |  UNION ALL
        |  SELECT doc_id, lang, 'fr',
        |    CAST(round(CAST(fr_hits AS DOUBLE) * 1e6 / CAST(tot AS DOUBLE), 0) AS BIGINT)
        |  FROM w WHERE tot > 0
        |  UNION ALL
        |  SELECT doc_id, lang, 'de',
        |    CAST(round(CAST(de_hits AS DOUBLE) * 1e6 / CAST(tot AS DOUBLE), 0) AS BIGINT)
        |  FROM w WHERE tot > 0),
        |th AS (SELECT cls,
        |    CAST(round(CAST(sum(p) AS DOUBLE) / CAST(count(*) AS DOUBLE), 0) AS BIGINT) AS t_micro
        |  FROM sc WHERE noisy = cls GROUP BY 1),
        |cand AS (SELECT sc.* FROM sc
        |  JOIN th ON sc.cls = th.cls AND sc.p >= th.t_micro),
        |mx AS (SELECT doc_id, max(p) AS mxp FROM cand GROUP BY 1),
        |yh AS (SELECT c.doc_id, c.noisy, min(c.cls) AS pred
        |  FROM cand c JOIN mx ON c.doc_id = mx.doc_id AND c.p = mx.mxp
        |  GROUP BY 1, 2)
        |SELECT noisy, pred, CAST(count(*) AS BIGINT) AS n,
        |  noisy <> pred AS off_diag
        |FROM yh GROUP BY 1, 2""".stripMargin,

    // McNemar paired test: discordant-pair cells per language, then
    // the continuity-corrected chi-square as one double expression
    "q_mcnemar" ->
      s"""WITH t AS (SELECT lang AS grp,
        |    CASE WHEN lower(text) LIKE '% the %' THEN 1 ELSE 0 END AS y,
        |    CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END AS pa,
        |    CASE WHEN len($toks) >= 30 THEN 1 ELSE 0 END AS pb
        |  FROM documents),
        |c AS (SELECT grp, count(*) AS n,
        |    CAST(sum(CASE WHEN pa = y AND pb = y THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
        |    CAST(sum(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END) AS BIGINT) AS n01,
        |    CAST(sum(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END) AS BIGINT) AS n10,
        |    CAST(sum(CASE WHEN pa <> y AND pb <> y THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
        |  FROM t GROUP BY 1)
        |SELECT grp, n, n_both, n01, n10, n_neither,
        |  round(CASE WHEN n01 + n10 = 0 THEN 0.0
        |    ELSE CAST(abs(n01 - n10) - 1 AS DOUBLE)
        |      * CAST(abs(n01 - n10) - 1 AS DOUBLE)
        |      / CAST(n01 + n10 AS DOUBLE) END, 6) AS chi2_cc
        |FROM c""".stripMargin,

    // group-fairness audit: per-language cells, overall cells from
    // the same partials, rates and gaps as fixed-shape doubles
    "q_fairness" ->
      """WITH t AS (SELECT lang AS grp,
        |    CASE WHEN lower(text) LIKE '% the %' THEN 1 ELSE 0 END AS y,
        |    CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END AS p
        |  FROM documents),
        |g AS (SELECT grp, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
        |    CAST(sum(p) AS BIGINT) AS n_sel,
        |    CAST(sum(y * p) AS BIGINT) AS n_tp,
        |    CAST(sum((1 - y) * p) AS BIGINT) AS n_fp
        |  FROM t GROUP BY 1),
        |o AS (SELECT CAST(sum(n) AS BIGINT) AS t_n,
        |    CAST(sum(n_pos) AS BIGINT) AS t_pos,
        |    CAST(sum(n_sel) AS BIGINT) AS t_sel,
        |    CAST(sum(n_tp) AS BIGINT) AS t_tp,
        |    CAST(sum(n_fp) AS BIGINT) AS t_fp FROM g),
        |r AS (SELECT g.*,
        |    CASE WHEN n = 0 THEN 0.0
        |      ELSE CAST(n_sel AS DOUBLE) / CAST(n AS DOUBLE) END AS sr,
        |    CASE WHEN n_pos = 0 THEN 0.0
        |      ELSE CAST(n_tp AS DOUBLE) / CAST(n_pos AS DOUBLE) END AS tp,
        |    CASE WHEN n - n_pos = 0 THEN 0.0
        |      ELSE CAST(n_fp AS DOUBLE) / CAST(n - n_pos AS DOUBLE) END AS fp,
        |    CASE WHEN t_n = 0 THEN 0.0
        |      ELSE CAST(t_sel AS DOUBLE) / CAST(t_n AS DOUBLE) END AS tsr,
        |    CASE WHEN t_pos = 0 THEN 0.0
        |      ELSE CAST(t_tp AS DOUBLE) / CAST(t_pos AS DOUBLE) END AS ttp,
        |    CASE WHEN t_n - t_pos = 0 THEN 0.0
        |      ELSE CAST(t_fp AS DOUBLE) / CAST(t_n - t_pos AS DOUBLE) END AS tfp
        |  FROM g CROSS JOIN o)
        |SELECT grp, n, n_pos, n_sel, n_tp, n_fp,
        |  round(sr, 6) AS sel_rate, round(tp, 6) AS tpr, round(fp, 6) AS fpr,
        |  round(sr - tsr, 6) AS dp_gap, round(tp - ttp, 6) AS tpr_gap,
        |  round(fp - tfp, 6) AS fpr_gap
        |FROM r""".stripMargin,

    // classification report over the centroid-classify confusion
    // replay (same CTEs as q_centroid_classify), integer-micro P/R/F1
    "q_eval_f1" ->
      """WITH m AS (SELECT vec_id, CAST(label AS BIGINT) AS lbl,
        |        list_transform(embedding,
        |          x -> CAST(ROUND(CAST(x AS DOUBLE) * 1e6, 0) AS BIGINT)) AS mv
        |      FROM embeddings),
        |cells AS (SELECT vec_id, lbl, i AS pos, mv[i] AS v
        |          FROM m, unnest(range(1, len(mv) + 1)) AS u(i)),
        |cent AS (SELECT lbl, pos, CAST(sum(v) AS BIGINT) // count(*) AS c
        |         FROM cells WHERE vec_id % 5 != 0 GROUP BY lbl, pos),
        |d AS (SELECT te.vec_id, te.lbl, cent.lbl AS clbl,
        |        sum((te.v - cent.c) * (te.v - cent.c)) AS dist
        |      FROM (SELECT * FROM cells WHERE vec_id % 5 = 0) te
        |      JOIN cent ON te.pos = cent.pos
        |      GROUP BY 1, 2, 3),
        |pr AS (SELECT vec_id, lbl, clbl,
        |         row_number() OVER (PARTITION BY vec_id
        |                            ORDER BY dist, clbl) AS rn
        |       FROM d),
        |conf AS (SELECT lbl AS label, clbl AS pred_label, count(*) AS n
        |         FROM pr WHERE rn = 1 GROUP BY 1, 2),
        |tpt AS (SELECT label, CAST(sum(n) AS BIGINT) AS tp FROM conf
        |        WHERE label = pred_label GROUP BY label),
        |bt AS (SELECT label, CAST(sum(n) AS BIGINT) AS support
        |       FROM conf GROUP BY label),
        |bp AS (SELECT pred_label AS label, CAST(sum(n) AS BIGINT) AS pred_n
        |       FROM conf GROUP BY pred_label),
        |j AS (SELECT coalesce(bt.label, bp.label) AS label,
        |        coalesce(bt.support, 0) AS support,
        |        coalesce(tpt.tp, 0) AS tp,
        |        coalesce(bp.pred_n, 0) - coalesce(tpt.tp, 0) AS fp,
        |        coalesce(bt.support, 0) - coalesce(tpt.tp, 0) AS fn
        |      FROM bt FULL OUTER JOIN bp ON bt.label = bp.label
        |        LEFT JOIN tpt ON coalesce(bt.label, bp.label) = tpt.label),
        |k AS (SELECT *,
        |    CASE WHEN tp + fp = 0 THEN CAST(0 AS BIGINT)
        |      ELSE (tp * 1000000) // (tp + fp) END AS precision_micro,
        |    CASE WHEN tp + fn = 0 THEN CAST(0 AS BIGINT)
        |      ELSE (tp * 1000000) // (tp + fn) END AS recall_micro
        |  FROM j)
        |SELECT label, support, tp, fp, fn, precision_micro, recall_micro,
        |  CASE WHEN precision_micro + recall_micro = 0 THEN CAST(0 AS BIGINT)
        |    ELSE (2 * precision_micro * recall_micro)
        |      // (precision_micro + recall_micro) END AS f1_micro
        |FROM k""".stripMargin)

  private def enStopSql: String =
    TextAnalysis.EnStop.map(w => s"'$w'").mkString(", ")

  /** Logistic-regression training replay: the same hashed-bigram
    * features, labels, and SF-adaptive stepDiv; each unrolled round
    * is margins (exact long sums) → micro-rounded sigmoid residuals
    * → exact long gradient → truncate-toward-zero weight update
    * (emulated — DuckDB's `//` floors, Spark's `div` truncates), so
    * the learned weight table and final margins replay bit-for-bit. */
  /** The WITH-chain shared by q_lr_train and q_lr_eval: features,
    * labels, stepDiv, `iters` unrolled training rounds, and the final
    * per-doc margin CTE `fin` (doc_id, y, m). */
  private def lrChainCtes(iters: Int): String = {
    def truncDiv(a: String) =
      s"(CASE WHEN $a >= 0 THEN $a // sd.stepdiv " +
      s"ELSE -((-($a)) // sd.stepdiv) END)"
    val rounds = (1 to iters).map { i =>
      val wp = s"w${i - 1}"
      s"""m$i AS MATERIALIZED (SELECT f.doc_id, CAST(sum(f.x * $wp.w) AS BIGINT) AS m
        |  FROM f JOIN $wp ON f.bucket = $wp.bucket GROUP BY 1),
        |r$i AS MATERIALIZED (SELECT lab.doc_id,
        |    CAST(round((1.0 / (1.0 + exp(-(CAST(coalesce(m$i.m, 0) AS DOUBLE)
        |      / 1000000.0))) - CAST(lab.y AS DOUBLE)) * 1000000.0, 0)
        |      AS BIGINT) AS r
        |  FROM lab LEFT JOIN m$i ON lab.doc_id = m$i.doc_id),
        |g$i AS MATERIALIZED (SELECT f.bucket, CAST(sum(f.x * r$i.r) AS BIGINT) AS gr
        |  FROM f JOIN r$i ON f.doc_id = r$i.doc_id GROUP BY 1),
        |w$i AS MATERIALIZED (SELECT bucket, w FROM (
        |    SELECT coalesce(wp.bucket, gg.bucket) AS bucket,
        |      coalesce(wp.w, CAST(0 AS BIGINT)) -
        |        ${truncDiv("coalesce(gg.gr, CAST(0 AS BIGINT))")} AS w
        |    FROM w${i - 1} wp FULL OUTER JOIN g$i gg
        |      ON wp.bucket = gg.bucket
        |    CROSS JOIN sd) z WHERE z.w != 0)""".stripMargin
    }.mkString(",\n")
    s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
      |g AS (SELECT doc_id, concat(toks[CAST(i AS INTEGER)], ' ',
      |        toks[CAST(i+1 AS INTEGER)]) AS gram
      |      FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
      |            FROM t) x),
      |hh AS (SELECT doc_id, CAST(concat('0x', substr(md5(gram), 1, 15))
      |         AS BIGINT) % 65536 AS bucket FROM g),
      |f0 AS MATERIALIZED (SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS x
      |       FROM hh GROUP BY 1, 2),
      |f AS MATERIALIZED (SELECT * FROM f0
      |      UNION ALL SELECT doc_id, CAST(65536 AS BIGINT),
      |        CAST(1 AS BIGINT) FROM documents),
      |lab AS MATERIALIZED (SELECT doc_id, CASE WHEN lower(text) LIKE '% the %'
      |          THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y
      |        FROM documents),
      |sd AS MATERIALIZED (SELECT greatest(CAST(1 AS BIGINT),
      |         CAST(sum(x) AS BIGINT) // 100) AS stepdiv FROM f0),
      |w0 AS (SELECT CAST(NULL AS BIGINT) AS bucket,
      |         CAST(NULL AS BIGINT) AS w WHERE false),
      |$rounds,
      |fin AS MATERIALIZED (SELECT lab.doc_id, lab.y,
      |    CAST(coalesce(sc.m, 0) AS BIGINT) AS m
      |  FROM lab LEFT JOIN (
      |    SELECT f.doc_id, CAST(sum(f.x * w$iters.w) AS BIGINT) AS m
      |    FROM f JOIN w$iters ON f.bucket = w$iters.bucket GROUP BY 1) sc
      |    ON lab.doc_id = sc.doc_id)""".stripMargin
  }

  private def lrTrainSql(iters: Int): String =
    s"""${lrChainCtes(iters)}
      |SELECT doc_id, y, m AS margin_micro, m > 0 AS pred
      |FROM fin""".stripMargin

  /** Dataset-cartography replay: the post-update snapshot of round r
    * is the margin CTE m(r+1) the training chain already carries
    * (scored with w_r), and the final round's snapshot is `fin`
    * (scored with w_iters) — 12 rounds total, same counting as
    * [[graft.ext.Curation.lrCartography]]'s fold. Gold-probability
    * micro terms, exact long Σpg/Σpg², then mean/std as one
    * fixed-shape double each; region bands from the shared Scala
    * thresholds. */
  private def cartographySql(iters: Int): String = {
    val roundSnaps = (1 until iters).map { r =>
      s"""SELECT lab.doc_id, lab.y,
        |    CAST(coalesce(m${r + 1}.m, 0) AS BIGINT) AS m
        |  FROM lab LEFT JOIN m${r + 1} ON lab.doc_id = m${r + 1}.doc_id""".stripMargin
    }.mkString("\n  UNION ALL\n") +
      "\n  UNION ALL\nSELECT doc_id, y, m FROM fin"
    s"""${lrChainCtes(iters)},
      |trace AS ($roundSnaps),
      |pgs AS (SELECT doc_id, y,
      |    CAST(round((CASE WHEN y = 1 THEN s ELSE 1.0 - s END)
      |      * 1000000.0, 0) AS BIGINT) AS pg,
      |    CASE WHEN (m > 0) = (y = 1) THEN 1 ELSE 0 END AS corr
      |  FROM (SELECT doc_id, y, m,
      |      1.0 / (1.0 + exp(-(CAST(m AS DOUBLE) / 1000000.0))) AS s
      |    FROM trace) z),
      |ag AS (SELECT doc_id, CAST(sum(pg) AS BIGINT) AS spg,
      |    CAST(sum(pg * pg) AS BIGINT) AS spg2,
      |    CAST(sum(corr) AS BIGINT) AS ncorr
      |  FROM pgs GROUP BY 1),
      |rep AS (SELECT doc_id,
      |    CAST(round(CAST(spg AS DOUBLE) / $iters.0, 0) AS BIGINT) AS conf_micro,
      |    CAST(round(sqrt(CAST($iters * spg2 - spg * spg AS DOUBLE))
      |      / $iters.0, 0) AS BIGINT) AS var_micro,
      |    ncorr AS n_correct
      |  FROM ag)
      |SELECT doc_id, conf_micro, var_micro, n_correct,
      |  CASE WHEN var_micro >= ${graft.ext.Curation.cartographyVarHiMicro} THEN 'ambiguous'
      |       WHEN conf_micro >= ${graft.ext.Curation.cartographyConfHiMicro} THEN 'easy'
      |       WHEN conf_micro <= ${graft.ext.Curation.cartographyConfLoMicro} THEN 'hard'
      |       ELSE 'middle' END AS region
      |FROM rep""".stripMargin
  }

  /** Train, score, then Mann–Whitney AUC of the margins against the
    * labels — the same finish CTEs as the q_auc_roc replay over the
    * trained chain. */
  private def lrEvalSql(iters: Int): String =
    s"""${lrChainCtes(iters)},
      |cells AS (SELECT 'all' AS grp, m AS s, CAST(sum(y) AS BIGINT) AS pos,
      |    CAST(count(*) - sum(y) AS BIGINT) AS neg
      |  FROM fin GROUP BY 1, 2),
      |c2 AS (SELECT grp, pos, neg,
      |    COALESCE(CAST(sum(neg) OVER (PARTITION BY grp ORDER BY s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      |      0) AS nb FROM cells),
      |agg AS (SELECT grp, CAST(sum(pos) AS BIGINT) AS n_pos,
      |    CAST(sum(neg) AS BIGINT) AS n_neg,
      |    CAST(sum(pos * (2 * nb + neg)) AS BIGINT) AS u2
      |  FROM c2 GROUP BY 1)
      |SELECT grp, n_pos, n_neg, u2,
      |  round(CASE WHEN n_pos = 0 OR n_neg = 0 THEN 0.5
      |    ELSE CAST(u2 AS DOUBLE) /
      |      (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) END, 6)
      |    AS auc
      |FROM agg""".stripMargin

  /** The shared recs/blocking/pair CTE prefix of both FS oracles
    * (identical dirty-record generator and census cap). */
  private def fsPairPrefix: String =
    s"""WITH recs AS (
      |  SELECT c_custkey * 2 AS record_id,
      |    CAST(c_custkey // 10 AS VARCHAR) AS blk,
      |    c_name AS name, c_mktsegment AS segment,
      |    '555-' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS phone
      |  FROM customer
      |  UNION ALL
      |  SELECT c_custkey * 2 + 1, CAST(c_custkey // 10 AS VARCHAR),
      |    CASE WHEN c_custkey % 3 = 0
      |      THEN replace(c_name, 'Customer', 'Custommer') ELSE c_name END,
      |    CASE WHEN c_custkey % 4 = 0 THEN 'MOVED' ELSE c_mktsegment END,
      |    CASE WHEN c_custkey % 5 = 0
      |      THEN substr('555-' || lpad(CAST(c_custkey AS VARCHAR), 9, '0'), 1, 12)
      |      ELSE '555-' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') END
      |  FROM customer),
      |n AS (SELECT record_id, blk, lower(trim(name)) AS name,
      |        lower(trim(segment)) AS segment,
      |        lower(trim(phone)) AS phone FROM recs),
      |bc AS (SELECT blk, count(*) AS c FROM n GROUP BY blk),
      |nb AS (SELECT n.* FROM n JOIN bc USING (blk) WHERE bc.c <= 64)""".stripMargin

  /** Fellegi–Sunter EM replay: the same agreement-pattern histogram,
    * pivoted to ONE row with all 2³ pattern counts as columns, then
    * `iters` EM rounds as pure scalar arithmetic with EXPLICIT
    * left-associated sums in canonical pattern order — the exact
    * association the Scala fold uses (zero-count patterns contribute
    * an exact +0.0 on both sides), with the same per-round 12dp
    * squash, so the iterated trace is bit-stable across engines. */
  private def fsEmSql(iters: Int): String = {
    val Seq(nameF, segF, phoneF) = ExtQueries.fsEmFields
    val pats = for (a <- 0 to 1; b <- 0 to 1; c <- 0 to 1) yield (a, b, c)
    def code(p: (Int, Int, Int)) = s"${p._1}${p._2}${p._3}"
    val pivot = pats.map { p =>
      s"    coalesce(max(CASE WHEN a1 = ${p._1} AND a2 = ${p._2} AND a3 = ${p._3} " +
      s"THEN CAST(c AS DOUBLE) END), 0.0) AS c${code(p)}"
    }.mkString(",\n")
    def term(bit: Int, v: String) = if (bit == 1) s"q.$v" else s"(1.0 - q.$v)"
    val iterCtes = (1 to iters).map { i =>
      val prev = s"p${i - 1}"
      val ws = pats.map { p =>
        s"    (q.p * ${term(p._1, "m1")} * ${term(p._2, "m2")} * ${term(p._3, "m3")}) AS wm_${code(p)},\n" +
        s"    ((1.0 - q.p) * ${term(p._1, "u1")} * ${term(p._2, "u2")} * ${term(p._3, "u3")}) AS wu_${code(p)}"
      }.mkString(",\n")
      val rs = pats.map(p =>
        s"    wm_${code(p)} / (wm_${code(p)} + wu_${code(p)}) AS r_${code(p)}")
        .mkString(",\n")
      def sum(f: ((Int, Int, Int)) => Option[String]) =
        pats.flatMap(p => f(p)).mkString(" + ")
      val sumCR = sum(p => Some(s"c${code(p)} * r_${code(p)}"))
      val sumCN = sum(p => Some(s"c${code(p)} * (1.0 - r_${code(p)})"))
      val sumC = sum(p => Some(s"c${code(p)}"))
      def mNum(bitOf: ((Int, Int, Int)) => Int) =
        sum(p => if (bitOf(p) == 1) Some(s"c${code(p)} * r_${code(p)}") else None)
      def uNum(bitOf: ((Int, Int, Int)) => Int) =
        sum(p => if (bitOf(p) == 1) Some(s"c${code(p)} * (1.0 - r_${code(p)})") else None)
      val bits = Seq[((Int, Int, Int)) => Int](_._1, _._2, _._3)
      // the Scala trace's per-round clamp, verbatim: both bounds build
      // from the same IEEE doubles (cast before arithmetic — a DuckDB
      // bare decimal literal would otherwise do exact-decimal math)
      def cl(x: String) =
        s"least(CAST(1.0 AS DOUBLE) - CAST(0.000001 AS DOUBLE), " +
        s"greatest(CAST(0.000001 AS DOUBLE), $x))"
      val params = bits.zipWithIndex.map { case (bit, j) =>
        s"    ${cl(s"round((${mNum(bit)}) / ($sumCR), 12)")} AS m${j + 1},\n" +
        s"    ${cl(s"round((${uNum(bit)}) / ($sumCN), 12)")} AS u${j + 1}"
      }.mkString(",\n")
      s"""e$i AS (SELECT hp.*,
        |$ws
        |  FROM hp, $prev q),
        |r$i AS (SELECT *,
        |$rs
        |  FROM e$i),
        |p$i AS (SELECT
        |$params,
        |    ${cl(s"round(($sumCR) / ($sumC), 12)")} AS p
        |  FROM r$i)""".stripMargin
    }.mkString(",\n")
    def agreeSql(f: graft.ext.EntityResolution.FsField, idx: Int) =
      if (f.jwMin >= 1.0)
        s"CASE WHEN a.${f.field} = b.${f.field} THEN 1 ELSE 0 END AS a$idx"
      else
        s"CASE WHEN CAST(round(jaro_winkler_similarity(a.${f.field}, " +
        s"b.${f.field}) * 1000000, 0) AS BIGINT) >= " +
        s"${math.round(f.jwMin * 1e6)} THEN 1 ELSE 0 END AS a$idx"
    s"""$fsPairPrefix,
      |pr AS (SELECT
      |    ${agreeSql(nameF, 1)},
      |    ${agreeSql(segF, 2)},
      |    ${agreeSql(phoneF, 3)}
      |  FROM nb a JOIN nb b USING (blk)
      |  WHERE a.record_id < b.record_id),
      |h AS (SELECT a1, a2, a3, count(*) AS c FROM pr GROUP BY 1, 2, 3),
      |hp AS (SELECT
      |$pivot
      |  FROM h),
      |p0 AS (SELECT CAST(${nameF.m} AS DOUBLE) AS m1,
      |    CAST(${segF.m} AS DOUBLE) AS m2, CAST(${phoneF.m} AS DOUBLE) AS m3,
      |    CAST(${nameF.u} AS DOUBLE) AS u1, CAST(${segF.u} AS DOUBLE) AS u2,
      |    CAST(${phoneF.u} AS DOUBLE) AS u3, CAST(0.1 AS DOUBLE) AS p),
      |$iterCtes
      |SELECT 'name' AS field, round(m1, 6) AS m, round(u1, 6) AS u,
      |  round(p, 6) AS p FROM p$iters
      |UNION ALL SELECT 'segment', round(m2, 6), round(u2, 6), round(p, 6)
      |  FROM p$iters
      |UNION ALL SELECT 'phone', round(m3, 6), round(u3, 6), round(p, 6)
      |  FROM p$iters""".stripMargin
  }

  /** Fellegi–Sunter replay: the same dirty-record generator, blocking
    * census, and INTEGER MICRO weights as the Spark side — the weight
    * constants interpolate from the SAME FsField (m, u) values
    * (ExtQueries.fsFields), so no engine ever re-derives a log. */
  private def fellegiSunterSql: String = {
    val Seq(nameF, segF, phoneF) = ExtQueries.fsFields
    val jwMicro = math.round(nameF.jwMin * 1e6)
    s"""$fsPairPrefix,
      |p AS (SELECT a.record_id AS a_id, b.record_id AS b_id,
      |        (CASE WHEN CAST(round(jaro_winkler_similarity(a.name, b.name)
      |             * 1000000, 0) AS BIGINT) >= $jwMicro
      |           THEN ${nameF.agreeMicro} ELSE ${nameF.disagreeMicro} END
      |         + CASE WHEN a.segment = b.segment
      |           THEN ${segF.agreeMicro} ELSE ${segF.disagreeMicro} END
      |         + CASE WHEN a.phone = b.phone
      |           THEN ${phoneF.agreeMicro} ELSE ${phoneF.disagreeMicro} END
      |        ) AS score_micro
      |      FROM nb a JOIN nb b USING (blk)
      |      WHERE a.record_id < b.record_id)
      |SELECT a_id, b_id, CAST(score_micro AS BIGINT) AS score_micro,
      |  CASE WHEN score_micro >= ${ExtQueries.fsUpperMicro} THEN 'match'
      |       WHEN score_micro <= ${ExtQueries.fsLowerMicro} THEN 'nonmatch'
      |       ELSE 'review' END AS decision
      |FROM p""".stripMargin
  }
}
