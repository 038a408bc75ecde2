"""DuckDB oracle SQL for the corpus (documents/embeddings) operators.

Independent SQL re-implementations of the same canonical definitions
(functions/textstats.py, functions/dedup.py): md5 everywhere a hash is
needed (hashlib ↔ DuckDB md5() agree), whitespace words, 3-word
shingles, 16 minhashes in 4 bands, 60-bit simhash, float64 cosine
rounded to 6 dp before thresholds/ordering.

The driver pre-registers ``documents`` and ``embeddings`` as views over
the sf parquet files.
"""

from __future__ import annotations

from ..functions.textstats import EN_STOP, LANG_WORDLISTS

_TOK = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_PUNCT = r"[^A-Za-z0-9\s]"

# words CTE shared by the text oracles
_W = r"""
WITH w AS (
  SELECT doc_id, text,
         CASE WHEN trim(text) = '' THEN []
              ELSE string_split_regex(lower(trim(text)), '\s+') END AS words
  FROM documents
)"""


def _inlist(words) -> str:
    return ", ".join("'" + w + "'" for w in words)


def _shingle_ctes() -> str:
    """Distinct 3-word shingles per doc (whole text if < 3 words)."""
    return _W + r""",
pos AS (
  SELECT doc_id, words, unnest(range(0, len(words) - 2)) AS i
  FROM w WHERE len(words) >= 3
),
sh AS (
  SELECT DISTINCT doc_id,
         words[i+1] || ' ' || words[i+2] || ' ' || words[i+3] AS s
  FROM pos
  UNION
  SELECT DISTINCT doc_id, array_to_string(words, ' ') AS s
  FROM w WHERE len(words) > 0 AND len(words) < 3
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)"""


def corpus_oracle_sql(sf_name: str = "sf0.01") -> dict[str, str]:
    q: dict[str, str] = {}

    # relational join/aggregate pipelines (pre-registered TPC-H views)
    from . import analytics_joins  # noqa: F401  (registers into ORACLES)
    from . import analytics_joins2  # noqa: F401
    from .analytics import ORACLES as analytics_oracles
    q.update(analytics_oracles)
    en = _inlist(EN_STOP)
    small = "0.001" in sf_name

    q["text_quality"] = _W + f"""
SELECT doc_id,
  length(text) AS n_chars,
  len(regexp_extract_all(text, '{_TOK}')) AS n_tokens,
  len(words) AS n_words,
  CASE WHEN n_tokens = 0 THEN 0.0
       ELSE len(regexp_extract_all(text, '{_PUNCT}')) / n_tokens
  END AS punct_ratio,
  CASE WHEN n_words = 0 THEN 0.0
       ELSE len(list_filter(words, t -> t IN ({en}))) / n_words
  END AS stop_ratio,
  CAST(0.4 AS DOUBLE) * least(n_words, 100) / 100
    + 0.3 * (1.0 - punct_ratio)
    + 0.3 * least(1.0, 5.0 * stop_ratio) AS quality
FROM w"""

    # UNPIVOT/melt of the same wide stats into (doc_id, metric, value)
    # long form — mirrors functions/textstats.melt_stats (the nested
    # WITH is the text_quality oracle verbatim)
    melt_arms = " UNION ALL ".join(
        f"SELECT doc_id, '{m}' AS metric, CAST({m} AS DOUBLE) AS value "
        "FROM s"
        for m in ("n_chars", "n_tokens", "n_words", "punct_ratio",
                  "stop_ratio", "quality"))
    q["melt_stats"] = f"WITH s AS ({q['text_quality']}) {melt_arms}"

    hit_cols = []
    for lang, ws in LANG_WORDLISTS:
        hit_cols.append(
            f"len(list_filter(words, t -> t IN ({_inlist(ws)}))) AS h_{lang}")
    langs = [lang for lang, _ in LANG_WORDLISTS]
    mx = "greatest(" + ", ".join(f"h_{l}" for l in langs) + ")"
    nlead = " + ".join(f"(h_{l} = mx)::INT" for l in langs)
    pick = " ".join(f"WHEN h_{l} = mx THEN '{l}'" for l in langs)
    q["text_langid"] = _W + f""",
h AS (SELECT doc_id, {', '.join(hit_cols)} FROM w),
m AS (SELECT *, {mx} AS mx FROM h)
SELECT doc_id,
  CASE WHEN mx = 0 THEN 'und'
       WHEN {nlead} > 1 THEN 'und'
       {pick}
  END AS lang_pred
FROM m"""

    q["doc_fingerprints"] = _W + r""",
p5 AS (
  SELECT doc_id, words, unnest(range(0, len(words) - 4)) AS i
  FROM w WHERE len(words) >= 5
),
g AS (
  SELECT doc_id,
         min(md5(words[i+1] || ' ' || words[i+2] || ' ' || words[i+3]
                 || ' ' || words[i+4] || ' ' || words[i+5])) AS wf
  FROM p5
  GROUP BY doc_id
)
SELECT w.doc_id,
       md5(array_to_string(words, ' ')) AS exact_md5,
       coalesce(g.wf, md5(array_to_string(words, ' '))) AS winnow_fp
FROM w LEFT JOIN g USING (doc_id)"""

    q["dedup_exact"] = _W + """
SELECT md5(array_to_string(words, ' ')) AS text_hash,
       min(doc_id) AS keep_id,
       count(*) AS n_copies
FROM w GROUP BY 1"""

    minhash_pairs = _shingle_ctes() + """,
mh AS (
  SELECT doc_id, i, min(md5(i || ':' || s)) AS sig
  FROM sh, range(16) t(i) GROUP BY doc_id, i
),
sg AS (SELECT doc_id, list(sig ORDER BY i) AS sigs FROM mh GROUP BY doc_id),
bd AS (
  SELECT doc_id, b,
         md5(sigs[4*b+1] || '|' || sigs[4*b+2] || '|' ||
             sigs[4*b+3] || '|' || sigs[4*b+4]) AS bkey
  FROM sg, range(4) t(b)
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bd x JOIN bd y ON x.b = y.b AND x.bkey = y.bkey
                      AND x.doc_id < y.doc_id
),
inter AS (
  SELECT c.a, c.b, count(*) AS i
  FROM cand c
  JOIN sh p ON p.doc_id = c.a
  JOIN sh r ON r.doc_id = c.b AND r.s = p.s
  GROUP BY c.a, c.b
),
pairs AS (
  SELECT a, b, round(i / (na.n + nb.n - i), 6) AS jaccard
  FROM inter
  JOIN sizes na ON na.doc_id = a
  JOIN sizes nb ON nb.doc_id = b
  WHERE i / (na.n + nb.n - i) >= 0.5
)"""

    q["dedup_minhash"] = minhash_pairs + """
SELECT a AS doc_a, b AS doc_b, jaccard FROM pairs"""

    # near-dup REMOVAL: a doc is dropped when it is the higher id of any
    # near-dup pair (the engine applies the identical rule)
    q["dedup_filtered_docs"] = minhash_pairs + """
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT b FROM pairs)"""

    # transitive closure over the pair graph: component rep = min doc_id
    # (WITH RECURSIVE must be declared on the first CTE of the chain)
    q["dedup_clusters"] = minhash_pairs.replace(
        "WITH w AS", "WITH RECURSIVE w AS", 1) + """,
edges AS (
  SELECT a, b FROM pairs UNION SELECT b, a FROM pairs
),
reach(src, dst) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
)
SELECT src AS doc_id,
       least(src, min(dst)) AS cluster_rep
FROM reach GROUP BY src"""

    q["dedup_ngram"] = _shingle_ctes() + """,
inter AS (
  SELECT p.doc_id AS a, r.doc_id AS b, count(*) AS i
  FROM sh p JOIN sh r ON r.s = p.s AND p.doc_id < r.doc_id
  GROUP BY 1, 2
)
SELECT a AS doc_a, b AS doc_b,
       round(i / (na.n + nb.n - i), 6) AS jaccard
FROM inter
JOIN sizes na ON na.doc_id = a
JOIN sizes nb ON nb.doc_id = b
WHERE i / (na.n + nb.n - i) >= 0.5"""

    simhash_cte = _W + """,
tok AS (
  SELECT doc_id, t, count(*) AS c
  FROM (SELECT doc_id, unnest(words) AS t FROM w) GROUP BY doc_id, t
),
th AS (
  SELECT doc_id, c,
         CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS h
  FROM tok
),
bits AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b) & 1 = 1 THEN c ELSE -c END) AS wsum
  FROM th, range(60) t(b) GROUP BY doc_id, b
),
sh60 AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN wsum > 0 THEN (1::BIGINT << b) ELSE 0 END)
              AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
)"""

    q["dedup_simhash"] = simhash_cte + """
SELECT doc_id, simhash FROM sh60"""

    q["dedup_simhash_pairs"] = simhash_cte + """
SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       bit_count(xor(x.simhash, y.simhash)) AS hamming
FROM sh60 x JOIN sh60 y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 3"""

    q["dedup_embedding"] = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a
JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                   b.embedding::DOUBLE[]), 6) >= 0.45"""

    # DSIR selection (integer-ppm importance weights): hashed-unigram
    # (md5[:8] mod 1024) Laplace-ppm models of the lang='en' target
    # slice vs the whole corpus; per-doc sum of (ppm_t - ppm_s) over
    # all word occurrences, kept = score > 0. Docs with >= 1 word.
    q["dsir_select"] = _W + """,
tok AS (SELECT doc_id, unnest(words) AS t FROM w),
f AS (SELECT doc_id,
             CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 1024 AS b
      FROM tok),
tgt AS (SELECT f.b, CAST(count(*) AS BIGINT) AS c
        FROM f JOIN documents d ON f.doc_id = d.doc_id
        WHERE d.lang = 'en' GROUP BY f.b),
src AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM f GROUP BY b),
tt AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS t FROM tgt),
ss AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS s FROM src),
ppm AS (SELECT s.b,
               (coalesce(t.c, 0) + 1) * 1000000 // (tt.t + 1024) AS pt,
               (s.c + 1) * 1000000 // (ss.s + 1024) AS ps
        FROM src s LEFT JOIN tgt t ON s.b = t.b, tt, ss)
SELECT f.doc_id,
       CAST(sum(ppm.pt - ppm.ps) AS BIGINT) AS dsir_score,
       CAST(CASE WHEN sum(ppm.pt - ppm.ps) > 0 THEN 1 ELSE 0 END
            AS BIGINT) AS kept
FROM f JOIN ppm ON f.b = ppm.b
GROUP BY f.doc_id"""

    # SemDeDup: within-cluster (label) semantic dedup — a vector is
    # removed iff an earlier (smaller vec_id) vector in its cluster has
    # round(cosine, 6) >= 0.45
    q["semdedup"] = """
SELECT v.vec_id, v.label,
       CAST(CASE WHEN EXISTS (
         SELECT 1 FROM embeddings u
         WHERE u.label = v.label AND u.vec_id < v.vec_id
           AND round(list_cosine_similarity(u.embedding::DOUBLE[],
                                            v.embedding::DOUBLE[]), 6)
               >= 0.45)
       THEN 0 ELSE 1 END AS BIGINT) AS kept
FROM embeddings v"""

    q["ann_topk"] = """
WITH qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
            FROM embeddings WHERE vec_id < 10),
cv AS (SELECT vec_id, embedding::DOUBLE[] AS ce
       FROM embeddings WHERE vec_id >= 10),
s AS (
  SELECT query_id, vec_id,
         round(list_cosine_similarity(qe, ce), 6) AS cosine
  FROM qv CROSS JOIN cv
)
SELECT query_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, vec_id) AS rank,
       vec_id, cosine
FROM s
QUALIFY rank <= 5"""

    # reciprocal-rank fusion of the ann_topk (rounded-cosine) and
    # ann_quantized (int8-dot) rankings: integer contributions
    # floor(1e9/(60+rank)), missing list = 0, exact int64 ordering
    q["rrf_fusion"] = """
WITH qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
            FROM embeddings WHERE vec_id < 10),
cv AS (SELECT vec_id, embedding::DOUBLE[] AS ce
       FROM embeddings WHERE vec_id >= 10),
sc AS (SELECT query_id, vec_id,
              round(list_cosine_similarity(qe, ce), 6) AS cosine
       FROM qv CROSS JOIN cv),
ra AS (SELECT query_id, vec_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id) AS rank
       FROM sc QUALIFY rank <= 5),
e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS d,
             CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
am AS (SELECT d, max(abs(v)) AS amax FROM e GROUP BY d),
qq AS (SELECT e.vec_id, e.d,
              CASE WHEN am.amax > 0 THEN
                CAST(least(greatest(floor((v * 127) / am.amax), -127),
                           127) AS BIGINT)
              ELSE 0 END AS q
       FROM e JOIN am USING (d)),
s2 AS (SELECT ql.vec_id AS query_id, db.vec_id AS vec_id,
              CAST(sum(ql.q * db.q) AS BIGINT) AS score
       FROM qq ql JOIN qq db ON ql.d = db.d
       WHERE ql.vec_id IN (0,1,2,3,4,5,6,7,8,9)
         AND db.vec_id NOT IN (0,1,2,3,4,5,6,7,8,9)
       GROUP BY 1, 2),
rb AS (SELECT query_id, vec_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, vec_id) AS rank
       FROM s2 QUALIFY rank <= 5),
u AS (SELECT COALESCE(ra.query_id, rb.query_id) AS query_id,
             COALESCE(ra.vec_id, rb.vec_id) AS vec_id,
             COALESCE(CAST(floor(1000000000 / (60 + ra.rank))
                           AS BIGINT), 0)
           + COALESCE(CAST(floor(1000000000 / (60 + rb.rank))
                           AS BIGINT), 0) AS s
      FROM ra FULL JOIN rb
        ON ra.query_id = rb.query_id AND ra.vec_id = rb.vec_id)
SELECT query_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY s DESC, vec_id) AS rrf_rank,
       vec_id, s AS rrf_score
FROM u QUALIFY rrf_rank <= 5"""

    # hard-negative mining: exact top-5 highest-cosine DIFFERENT-label
    # candidates per query (same CTEs/order rule as ann_topk)
    q["hard_negatives"] = """
WITH qv AS (SELECT vec_id AS query_id, label AS qlab,
                   embedding::DOUBLE[] AS qe
            FROM embeddings WHERE vec_id < 10),
cv AS (SELECT vec_id, label, embedding::DOUBLE[] AS ce
       FROM embeddings WHERE vec_id >= 10),
s AS (
  SELECT query_id, vec_id,
         round(list_cosine_similarity(qe, ce), 6) AS cosine
  FROM qv JOIN cv ON cv.label <> qv.qlab
)
SELECT query_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, vec_id) AS rank,
       vec_id, cosine
FROM s
QUALIFY rank <= 5"""

    # radius (range) search: every candidate with cosine >= 0.30 of a
    # query — same CTEs as ann_topk, threshold instead of rank
    q["ann_range"] = """
WITH qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
            FROM embeddings WHERE vec_id < 10),
cv AS (SELECT vec_id, embedding::DOUBLE[] AS ce
       FROM embeddings WHERE vec_id >= 10)
SELECT query_id, vec_id,
       round(list_cosine_similarity(qe, ce), 6) AS cosine
FROM qv CROSS JOIN cv
WHERE round(list_cosine_similarity(qe, ce), 6) >= 0.30"""

    # k-NN majority vote over the exact top-5 neighbors; ties break
    # toward the smaller label (same rule as the engine fold)
    q["knn_classify"] = """
WITH qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
            FROM embeddings WHERE vec_id < 10),
cv AS (SELECT vec_id, label, embedding::DOUBLE[] AS ce
       FROM embeddings WHERE vec_id >= 10),
s AS (
  SELECT query_id, vec_id, label,
         round(list_cosine_similarity(qe, ce), 6) AS cosine
  FROM qv CROSS JOIN cv
),
top AS (
  SELECT query_id, label FROM s
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY cosine DESC, vec_id) <= 5
),
v AS (SELECT query_id, label, count(*) AS votes
      FROM top GROUP BY 1, 2)
SELECT query_id, CAST(label AS BIGINT) AS label,
       CAST(votes AS BIGINT) AS votes
FROM v
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY votes DESC, label) = 1
ORDER BY query_id"""

    # broadcast interval join: events of every type counted inside each
    # type's opening window [min, min + (max-min)//4] — mirrors
    # windows.interval_join_counts (integer-µs bounds on both engines)
    q["events_interval_join"] = """
WITH b AS (SELECT event_type,
                  CAST(min(epoch_us(ts)) AS BIGINT) AS lo,
                  CAST(min(epoch_us(ts))
                       + (max(epoch_us(ts)) - min(epoch_us(ts))) // 4
                       AS BIGINT) AS hi
           FROM events GROUP BY 1)
SELECT b.event_type, CAST(count(*) AS BIGINT) AS n_overlap
FROM events e JOIN b ON epoch_us(e.ts) BETWEEN b.lo AND b.hi
GROUP BY 1 ORDER BY 1"""

    # ordered 3-step windowed funnel: stage-k events valid iff a
    # stage-(k-1)-valid event lies within the preceding day (inclusive)
    # — mirrors windows.funnel_stages
    q["events_funnel3"] = """
WITH s0 AS (SELECT user_id, epoch_us(ts) AS t FROM events
            WHERE event_type = 'view'),
s1 AS (SELECT e.user_id, epoch_us(e.ts) AS t FROM events e
       WHERE e.event_type = 'click' AND EXISTS (
         SELECT 1 FROM s0 WHERE s0.user_id = e.user_id
           AND s0.t BETWEEN epoch_us(e.ts) - 86400000000
                        AND epoch_us(e.ts))),
s2 AS (SELECT e.user_id, epoch_us(e.ts) AS t FROM events e
       WHERE e.event_type = 'purchase' AND EXISTS (
         SELECT 1 FROM s1 WHERE s1.user_id = e.user_id
           AND s1.t BETWEEN epoch_us(e.ts) - 86400000000
                        AND epoch_us(e.ts)))
SELECT u.user_id,
       CAST(CASE WHEN u.user_id IN (SELECT user_id FROM s2) THEN 3
                 WHEN u.user_id IN (SELECT user_id FROM s1) THEN 2
                 ELSE 1 END AS BIGINT) AS stage
FROM (SELECT DISTINCT user_id FROM s0) u
ORDER BY u.user_id"""

    # MATCH_RECOGNIZE-lite: per-user symbol string in (ts, event_id)
    # order, RE2 non-overlapping match count — mirrors
    # windows.match_recognize_counts
    q["events_match_pattern"] = """
WITH o AS (SELECT user_id,
                  CASE event_type WHEN 'view' THEN 'v'
                                  WHEN 'click' THEN 'c'
                                  WHEN 'purchase' THEN 'p'
                                  WHEN 'signup' THEN 's'
                                  WHEN 'error' THEN 'e' END AS sym,
                  ts, event_id
           FROM events),
s AS (SELECT user_id,
             string_agg(sym, '' ORDER BY ts, event_id) AS seq
      FROM o GROUP BY 1)
SELECT user_id,
       CAST(len(regexp_extract_all(seq, 'vc*p')) AS BIGINT) AS n_matches
FROM s WHERE len(regexp_extract_all(seq, 'vc*p')) > 0
ORDER BY user_id"""

    # weekly cohort retention: users cohorted by first active week,
    # counted at each later active week's offset
    q["retention_cohorts"] = """
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week
  FROM events),
c AS (SELECT user_id, week,
             min(week) OVER (PARTITION BY user_id) AS cohort
      FROM uw)
SELECT cohort AS cohort_week, week - cohort AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM c GROUP BY 1, 2 ORDER BY 1, 2"""

    # --- adversarial syslog edge corpus (hand-written expectations) --
    from .edge_corpus import edge_oracle_sql
    q["parse_edge_syslog"] = edge_oracle_sql()

    # --- collectd source oracle --------------------------------------
    # The packet fixture is a pure function of the record index
    # (corpus.collectd_fixture_metric), so SQL rebuilds the decoder's
    # value-list JSON message and canonical property bag from range(n)
    # without touching the binary wire — an independent second
    # implementation of the generator+decoder pair.
    n_cd = 200 if small else 2000
    _t = "(1700000000 + i*10)"
    _g = "printf('%.3f', {})"  # gauge / time / interval formatting
    msg_case = f"""CASE i%4
  WHEN 0 THEN '{{"values":[' || (i*100) || '],"dstypes":["derive"],"dsnames":["value"],"time":' || {_g.format(f"CAST({_t} AS DOUBLE)")} || ',"interval":10.000,"host":"cnode' || (i%5) || '","plugin":"cpu","plugin_instance":"","type":"cpu","type_instance":"idle"}}'
  WHEN 1 THEN '{{"values":[' || i || ',' || (2*i) || '],"dstypes":["derive","derive"],"dsnames":["rx","tx"],"time":' || {_g.format(f"CAST({_t} AS DOUBLE)")} || ',"interval":10.000,"host":"cnode' || (i%5) || '","plugin":"interface","plugin_instance":"eth0","type":"if_octets","type_instance":""}}'
  WHEN 2 THEN '{{"values":[' || {_g.format("i + 0.5")} || '],"dstypes":["gauge"],"dsnames":["value"],"time":' || {_g.format(f"CAST({_t} AS DOUBLE)")} || ',"interval":10.000,"host":"cnode' || (i%5) || '","plugin":"memory","plugin_instance":"","type":"memory","type_instance":"used"}}'
  ELSE '{{"values":[' || {_g.format("(i%10) + 0.25")} || ',' || {_g.format("CAST(i%10 AS DOUBLE)")} || ',' || {_g.format("(i%10) / 2.0")} || '],"dstypes":["gauge","gauge","gauge"],"dsnames":["shortterm","midterm","longterm"],"time":' || {_g.format(f"CAST({_t} AS DOUBLE)")} || ',"interval":10.000,"host":"cnode' || (i%5) || '","plugin":"load","plugin_instance":"","type":"load","type_instance":""}}'
  END"""
    props_case = f"""CASE i%4
  WHEN 0 THEN '{{"collectd":{{"type":"cpu","type_instance":"idle"}},"derive":{{"value":"' || (i*100) || '"}}}}'
  WHEN 1 THEN '{{"collectd":{{"plugin_instance":"eth0","type":"if_octets"}},"derive":{{"rx":"' || i || '","tx":"' || (2*i) || '"}}}}'
  WHEN 2 THEN '{{"collectd":{{"type":"memory","type_instance":"used"}},"gauge":{{"value":"' || {_g.format("i + 0.5")} || '"}}}}'
  ELSE '{{"collectd":{{"type":"load"}},"gauge":{{"longterm":"' || {_g.format("(i%10) / 2.0")} || '","midterm":"' || {_g.format("CAST(i%10 AS DOUBLE)")} || '","shortterm":"' || {_g.format("(i%10) + 0.25")} || '"}}}}'
  END"""
    q["parse_collectd"] = f"""
SELECT i AS rec_idx,
       'cnode' || (i%5) AS hostname,
       CASE i%4 WHEN 0 THEN 'cpu' WHEN 1 THEN 'interface'
                WHEN 2 THEN 'memory' ELSE 'load' END AS procid,
       14 AS priority, 1 AS facility, 6 AS severity,
       make_timestamp({_t}::BIGINT * 1000000) AS time_reported,
       {msg_case} AS message,
       {props_case} AS properties
FROM (SELECT unnest(range(0, {n_cd})) AS i)"""

    # --- macOS unified-log source oracle ------------------------------
    # fixture is a pure function of i (corpus.macos_fixture_line);
    # 05:10:SS+0100 → UTC 04:10:SS on 2026-01-15 = 1768450200 + SS
    n_mac = 200 if small else 2000
    _mac_props = """'{"macos":{"activityID":"' || (i%11) || '"' ||
  CASE WHEN i%4 <> 0 THEN ',"category":"cat' || (i%4) || '"' ELSE '' END ||
  ',"machTimestamp":"' || (10000000000 + i) || '"' ||
  ',"messageType":"' || CASE i%3 WHEN 0 THEN 'Default' WHEN 1 THEN 'Info' ELSE 'Error' END || '"' ||
  ',"processUniqueID":"' || (1000 + i) || '"' ||
  ',"senderProgramCounter":"' || (i*7) || '"' ||
  CASE WHEN i%5 <> 0 THEN ',"subsystem":"com.example.s' || (i%3) || '"' ELSE '' END ||
  ',"threadID":"' || i || '","traceID":"' || (i*3) || '"}}'"""
    q["parse_macos"] = f"""
SELECT i AS rec_idx,
       'localhost' AS hostname,
       '/usr/bin/proc' || (i%7) AS appname,
       CAST(300 + i%50 AS VARCHAR) AS procid,
       14 AS priority, 1 AS facility, 6 AS severity, 1 AS version,
       make_timestamp((1768450200 + i%60)::BIGINT * 1000000
                      + (i*137)%1000000) AS time_reported,
       'macos event ' || i AS message,
       {_mac_props} AS properties
FROM (SELECT unnest(range(0, {n_mac})) AS i)"""

    # --- approximate-ANN oracles -------------------------------------
    # The LSH hyperplanes and the IVF probe rule are deterministic
    # functions of the stored embeddings, so both approximate paths have
    # exact SQL mirrors: the plane matrix is embedded as literals
    # (sign(dot) is scale-invariant, so the SQL skips normalization) and
    # the IVF coarse cells are the stored ``label`` column.
    import numpy as _np
    from ..functions.similarity import (IVF_NPROBE, LSH_PLANES, LSH_SEED)
    _planes = _np.random.default_rng(LSH_SEED).standard_normal((LSH_PLANES, 64))
    _plane_rows = ", ".join(
        f"({b}, [{', '.join(repr(float(v)) for v in _planes[b])}])"
        for b in range(LSH_PLANES))

    q["ann_lsh"] = f"""
WITH pl(b, p) AS (VALUES {_plane_rows}),
e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
bk AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN list_dot_product(emb, p) > 0
                       THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS bucket
  FROM e CROSS JOIN pl GROUP BY vec_id
),
qb AS (SELECT bucket FROM bk WHERE vec_id < 10),
probe AS (
  SELECT DISTINCT bucket FROM qb
  UNION
  SELECT DISTINCT xor(bucket, (1::BIGINT << b)) FROM qb, range({LSH_PLANES}) t(b)
),
qv AS (SELECT vec_id AS query_id, emb AS qe FROM e WHERE vec_id < 10),
cand AS (
  SELECT e.vec_id, e.emb FROM e JOIN bk USING (vec_id)
  WHERE e.vec_id >= 10 AND bk.bucket IN (SELECT bucket FROM probe)
),
s AS (
  SELECT query_id, vec_id,
         round(list_cosine_similarity(qe, emb), 6) AS cosine
  FROM qv CROSS JOIN cand
)
SELECT query_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, vec_id) AS rank,
       vec_id, cosine
FROM s QUALIFY rank <= 5"""

    # LSH-bucketed near-dup pairs: one bucket per vector (sign pattern
    # vs the same literal planes), pairs scored within buckets only —
    # the SQL mirror of dedup.embedding_lsh_pairs.
    q["dedup_embedding_lsh"] = f"""
WITH pl(b, p) AS (VALUES {_plane_rows}),
e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
bk AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN list_dot_product(emb, p) > 0
                       THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS bucket
  FROM e CROSS JOIN pl GROUP BY vec_id
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(ea.emb, eb.emb), 6) AS cosine
FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
JOIN e ea ON ea.vec_id = a.vec_id
JOIN e eb ON eb.vec_id = b.vec_id
WHERE round(list_cosine_similarity(ea.emb, eb.emb), 6) >= 0.45"""

    q["ann_ivf"] = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
cm AS (
  SELECT label, i, avg(emb[i]) AS m
  FROM e, range(1, 65) t(i) GROUP BY label, i
),
cent AS (SELECT label, list(m ORDER BY i) AS c FROM cm GROUP BY label),
qv AS (SELECT vec_id AS query_id, emb AS qe FROM e WHERE vec_id < 10),
qc AS (
  SELECT query_id, label,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY list_cosine_similarity(qe, c) DESC,
                                     label) AS r
  FROM qv CROSS JOIN cent
),
probed AS (SELECT query_id, label FROM qc WHERE r <= {IVF_NPROBE}),
cand AS (
  SELECT p.query_id, v.vec_id, v.emb AS ce
  FROM e v JOIN probed p ON v.label = p.label
  WHERE v.vec_id >= 10
),
s AS (
  SELECT c.query_id, c.vec_id,
         round(list_cosine_similarity(q2.qe, c.ce), 6) AS cosine
  FROM cand c JOIN qv q2 ON q2.query_id = c.query_id
)
SELECT query_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, vec_id) AS rank,
       vec_id, cosine
FROM s QUALIFY rank <= 5"""

    q["topk_terms"] = _W + """,
t AS (SELECT unnest(words) AS term FROM w),
c AS (SELECT term, count(*) AS n FROM t GROUP BY term)
SELECT term, n FROM c ORDER BY n DESC, term LIMIT 20"""

    # hopping windows: window 1h, hop 30min → every event lands in 2
    # hop-aligned windows (base and base-hop)
    q["events_hopping"] = """
SELECT make_timestamp(((epoch_us(ts) // 1800000000) - k) * 1800000000)
         AS window_start,
       event_type, count(*) AS n, round(sum(value), 6) AS sum_value
FROM events, range(2) t(k) GROUP BY 1, 2"""

    q["events_tumbling"] = """
SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000)
         AS window_start,
       event_type, count(*) AS n, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2"""

    # as-of join: most recent click at-or-before each purchase, same
    # user; ties on ts broken by larger click event_id (the engine's
    # sweep processes rights in event_id order and keeps the last)
    q["events_asof"] = """
WITH c AS (SELECT user_id, ts, event_id FROM events
           WHERE event_type = 'click'),
p AS (SELECT user_id, ts, event_id FROM events
      WHERE event_type = 'purchase'),
j AS (
  SELECT p.event_id AS p_event, p.user_id, p.ts AS p_ts,
         c.event_id AS c_event, c.ts AS c_ts,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
)
SELECT p_event, user_id, p_ts, c_event, c_ts FROM j WHERE rn = 1"""

    # window functions: running cents-exact sum + lag per user
    q["events_running"] = """
SELECT event_id, user_id, ts,
  round(CAST(sum(CAST(round(value*100) AS BIGINT)) OVER w AS DOUBLE)
        / 100.0, 6) AS run_sum,
  CAST(coalesce(lag(event_id) OVER w, -1) AS BIGINT) AS prev_event,
  CAST(coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER w, -1) AS BIGINT)
    AS prev_gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""

    # two-phase top-N ≡ ROW_NUMBER ≤ 3 per event_type
    q["events_topn"] = """
SELECT event_type, rank, event_id, round(value, 6) AS value FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rank
  FROM events) WHERE rank <= 3"""

    # pivot: per-user event-type count columns + exact cents total
    _piv = ",\n  ".join(
        f"CAST(sum(CASE WHEN event_type='{t}' THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS n_{t}"
        for t in ("click", "error", "purchase", "signup", "view"))
    q["events_pivot"] = f"""
SELECT user_id,
  {_piv},
  round(CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE) / 100.0, 6)
    AS sum_value
FROM events GROUP BY user_id"""

    # anti-join: users with no purchase over $100
    q["users_no_big_purchase"] = """
SELECT user_id FROM events GROUP BY user_id
HAVING sum(CASE WHEN event_type = 'purchase' AND value > 100.0
                THEN 1 ELSE 0 END) = 0"""

    # burst detection: ≥3 same-user events in the prior 6 hours
    q["events_bursts"] = """
SELECT * FROM (
  SELECT a.event_id, a.user_id,
         (SELECT count(*) FROM events b
          WHERE b.user_id = a.user_id
            AND b.ts >= a.ts - INTERVAL 6 HOUR
            AND b.ts < a.ts) AS n_prior
  FROM events a) WHERE n_prior >= 3"""

    # funnel: purchases with a click at-or-before within the prior hour
    q["events_funnel"] = """
SELECT user_id, count(*) AS n_then,
  CAST(sum(CASE WHEN EXISTS (
      SELECT 1 FROM events c
      WHERE c.user_id = p.user_id AND c.event_type = 'click'
        AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR)
    THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM events p WHERE event_type = 'purchase'
GROUP BY user_id"""

    # documents⋈embeddings join + per-lang vector-norm stats
    q["lang_embedding_stats"] = """
SELECT lang, count(*) AS n,
  round(avg(sqrt(list_sum(list_transform(embedding,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS avg_norm
FROM documents JOIN embeddings ON doc_id = vec_id
GROUP BY lang"""

    # range self-join: strictly-earlier same-user events within 30min
    q["events_range_counts"] = """
SELECT a.event_id, a.user_id,
       (SELECT count(*) FROM events b
        WHERE b.user_id = a.user_id
          AND b.ts >= a.ts - INTERVAL 30 MINUTE
          AND b.ts < a.ts) AS n_prior
FROM events a"""

    q["events_sessions"] = """
WITH o AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS pts
  FROM events)
SELECT user_id,
       CAST(sum(CASE WHEN pts IS NULL
                      OR epoch_us(ts) - epoch_us(pts) > 1800000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM o GROUP BY user_id"""

    # source-reader oracles: the fixtures are pure functions of the
    # record index, so SQL re-derives every field from range(n) without
    # touching the binary/export files — an independent second
    # implementation of the generator+parser pair.
    n_acct = 200 if small else 2000
    q["source_accounting"] = f"""
SELECT 'acct_{n_acct}' AS source, i AS rec_idx,
       'proc' || (i % 10) AS comm,
       1000 + (i * 7) % 5 AS uid, 100 + i % 3 AS gid,
       2000 + i AS pid, 1 AS ppid, 1700000000 + i * 10 AS btime,
       (i % 50) / 2.0 AS etime,
       CAST((i % 8191) * power(8, i % 4) AS BIGINT) AS utime,
       i % 8191 AS stime,
       CAST(((i * 13) % 8191) * power(8, i % 3) AS BIGINT) AS mem,
       i % 100 AS io, 0 AS exitcode
FROM (SELECT unnest(range(0, {n_acct})) AS i)"""

    n_j = 100 if small else 1000
    q["source_journald"] = f"""
SELECT 'journal_{n_j}' AS conv_id, i AS turn_idx, 0 AS sub_idx,
       'journal_{n_j}:' || i || ':0' AS uid,
       '' AS role, '' AS tool,
       make_timestamp(1700000000000000 + i * 1000) AS ts,
       TRUE AS parse_ok,
       (i % 24) * 8 + (i % 8) AS priority,
       i % 24 AS facility, i % 8 AS severity, 1 AS version,
       (1700000000000000 + i * 1000) * 1000 AS time_reported,
       (1700000000000000 + i * 1000) * 1000 AS time_generated,
       'node' || (i % 5) AS hostname, 'svc' || (i % 7) AS appname,
       CAST(100 + i AS VARCHAR) AS procid, '' AS msgid, '' AS structured,
       'event ' || i AS message,
       '{{"journald":{{"systemd_unit":"svc' || (i % 7)
         || '.service"}}}}' AS properties
FROM (SELECT unnest(range(0, {n_j})) AS i)"""

    # --- KMV cardinality sketch (deterministic, so exactly mirrored;
    # shares the canonical words CTE so the split can never drift) ----
    from ..functions.sketches import kmv_oracle_sql
    q["distinct_kmv"] = kmv_oracle_sql(words_cte=_W)

    # Count-Min sketch estimates: identical md5 grid + min over rows
    from ..functions.sketches import cms_oracle_sql
    from .corpus import CMS_PROBES
    q["cms_terms"] = cms_oracle_sql(CMS_PROBES, words_cte=_W)

    # stratified per-language sampling: same md5-prefix membership as
    # sample_docs, with a CASE keep-bound per stratum (hex compare)
    q["stratified_sample"] = """
SELECT doc_id, lang, source FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
      CASE lang WHEN 'en' THEN '20' WHEN 'zh' THEN '80'
                WHEN 'es' THEN '80' WHEN 'de' THEN 'c0'
                WHEN 'fr' THEN 'c0' ELSE '40' END"""

    # --- within-doc repetition (Gopher A1.1 signals) ------------------
    # 3-gram occurrences here are NON-distinct (unlike the dedup sh CTE)
    q["text_repetition"] = _W + """,
p3 AS (
  SELECT doc_id, words, unnest(range(0, len(words) - 2)) AS i
  FROM w WHERE len(words) >= 3
),
g3 AS (
  SELECT doc_id, count(*) AS total,
         count(DISTINCT words[i+1] || ' ' || words[i+2] || ' '
               || words[i+3]) AS uniq
  FROM p3 GROUP BY doc_id
),
tw AS (
  SELECT doc_id, max(c) AS maxc, sum(c) AS nw
  FROM (SELECT doc_id, t, count(*) AS c
        FROM (SELECT doc_id, unnest(words) AS t FROM w)
        GROUP BY doc_id, t)
  GROUP BY doc_id
)
SELECT w.doc_id,
       round(coalesce((g3.total - g3.uniq) / g3.total, 0), 6)
         AS dup_3gram_frac,
       round(coalesce(tw.maxc / tw.nw, 0), 6) AS top_word_frac
FROM w LEFT JOIN g3 ON g3.doc_id = w.doc_id
       LEFT JOIN tw ON tw.doc_id = w.doc_id"""

    # --- decontamination / TF-IDF ------------------------------------
    q["decontaminate"] = _shingle_ctes() + """,
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
ov AS (
  SELECT sh.doc_id, count(*) AS n
  FROM sh JOIN bench USING (s)
  WHERE sh.doc_id % 97 <> 0
  GROUP BY sh.doc_id
)
SELECT d.doc_id, coalesce(ov.n, 0) AS n_overlap,
       coalesce(ov.n, 0) > 0 AS contaminated
FROM documents d LEFT JOIN ov ON ov.doc_id = d.doc_id
WHERE d.doc_id % 97 <> 0"""

    # Bloom-filter decontamination: the filter's set bit positions are
    # rebuilt in SQL from the same md5 hex slices; a shingle hits iff
    # all 3 of its positions are set
    q["bloom_decontam"] = _shingle_ctes() + """,
bpos AS (
  SELECT DISTINCT CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)
                  % 4096 AS p
  FROM sh WHERE doc_id % 97 = 0
  UNION
  SELECT DISTINCT CAST(('0x' || substr(md5(s), 9, 8)) AS BIGINT) % 4096
  FROM sh WHERE doc_id % 97 = 0
  UNION
  SELECT DISTINCT CAST(('0x' || substr(md5(s), 17, 8)) AS BIGINT) % 4096
  FROM sh WHERE doc_id % 97 = 0),
probe AS (
  SELECT doc_id, s,
         CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) % 4096 AS p1,
         CAST(('0x' || substr(md5(s), 9, 8)) AS BIGINT) % 4096 AS p2,
         CAST(('0x' || substr(md5(s), 17, 8)) AS BIGINT) % 4096 AS p3
  FROM sh WHERE doc_id % 97 <> 0),
hits AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS h FROM probe
  WHERE p1 IN (SELECT p FROM bpos) AND p2 IN (SELECT p FROM bpos)
        AND p3 IN (SELECT p FROM bpos)
  GROUP BY doc_id)
SELECT z.doc_id, CAST(z.n AS BIGINT) AS n_shingles,
       coalesce(h.h, 0) AS n_hits
FROM sizes z LEFT JOIN hits h ON z.doc_id = h.doc_id
WHERE z.doc_id % 97 <> 0"""

    q["tfidf_terms"] = _W + """,
tok AS (
  SELECT doc_id, t, count(*) AS c
  FROM (SELECT doc_id, unnest(words) AS t FROM w) GROUP BY doc_id, t
),
df AS (SELECT t, count(*) AS dfn FROM tok GROUP BY t),
nn AS (SELECT count(*) AS n FROM documents),
s AS (
  SELECT doc_id, t AS term, round(c * ln(n / dfn), 6) AS tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY c * ln(n / dfn) DESC, t) AS rank
  FROM tok JOIN df USING (t) CROSS JOIN nn
)
SELECT doc_id, rank, term, tfidf FROM s WHERE rank <= 3"""

    # --- curation operators ------------------------------------------
    # deterministic md5-prefix sample: first digest byte < 0x1a ↔
    # 2-char lowercase hex prefix < '1a' lexicographically
    q["sample_docs"] = """
SELECT doc_id, lang, source FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'"""

    # per-source quota: K smallest doc_ids per source (K=10)
    q["cap_per_source"] = """
SELECT doc_id, source, lang FROM documents
QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 10"""

    # sliding-window chunking, size 200 / stride 150; the chunk count
    # per doc is ceil(len/150), derived from the data (no fixed cap
    # that a longer document could silently exceed)
    q["chunk_docs"] = """
WITH c AS (
  SELECT doc_id, text,
         unnest(range(0, CAST(ceil(length(text) / 150.0) AS BIGINT))) AS i
  FROM documents
)
SELECT doc_id, i AS chunk_idx, substr(text, i*150 + 1, 200) AS chunk
FROM c"""

    # quality gate: keep docs at/above the global p25 of the quality
    # score, quantized by floor(quality*10000) so the threshold value
    # is integer-exact across engines (quantile_disc = index selection
    # at ceil(p*n)-1, same as the engine's counting sort)
    q["quality_filter"] = _W + f""",
qual AS (
  SELECT doc_id,
    CAST(0.4 AS DOUBLE) * least(len(words), 100) / 100
    + 0.3 * (1.0 - CASE WHEN len(regexp_extract_all(text, '{_TOK}')) = 0
                        THEN 0.0
                        ELSE len(regexp_extract_all(text, '{_PUNCT}'))
                             / len(regexp_extract_all(text, '{_TOK}'))
                   END)
    + 0.3 * least(1.0, 5.0 *
        CASE WHEN len(words) = 0 THEN 0.0
             ELSE len(list_filter(words, t -> t IN ({en}))) / len(words)
        END) AS quality
  FROM w),
k AS (SELECT doc_id, quality,
             CAST(floor(quality * 10000) AS BIGINT) AS qk FROM qual),
t AS (SELECT quantile_disc(qk, 0.25) AS thr FROM k)
SELECT doc_id, quality FROM k, t WHERE qk >= thr"""

    # exact per-language vocabulary (engine: salted two-round shuffle)
    q["distinct_terms_lang"] = _W + """
SELECT d.lang, CAST(count(DISTINCT t) AS BIGINT) AS n_distinct
FROM (SELECT doc_id, unnest(words) AS t FROM w) x
JOIN documents d ON x.doc_id = d.doc_id
GROUP BY d.lang"""

    # cross-doc duplicate-span fraction: distinct 5-word spans per doc,
    # shared = span occurs in ≥2 distinct docs; ppm via exact floor
    q["dup_span_fraction"] = _W + """,
p5 AS (
  SELECT doc_id, words, unnest(range(0, len(words) - 4)) AS i
  FROM w WHERE len(words) >= 5),
g5 AS (
  SELECT DISTINCT doc_id,
         words[i+1] || ' ' || words[i+2] || ' ' || words[i+3] || ' '
         || words[i+4] || ' ' || words[i+5] AS g
  FROM p5),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
        FROM g5 GROUP BY doc_id),
shg AS (SELECT g FROM g5 GROUP BY g
        HAVING count(DISTINCT doc_id) >= 2),
cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
        FROM g5 JOIN shg USING (g) GROUP BY doc_id)
SELECT t.doc_id, t.n_grams, coalesce(c.n_shared, 0) AS n_shared,
       coalesce(c.n_shared, 0) * 1000000 // t.n_grams AS shared_ppm
FROM tot t LEFT JOIN cnt c ON t.doc_id = c.doc_id"""

    # exact substring dedup removal (Lee et al. 2022, word-granular):
    # drop words covered by any 5-word span occurring >= 2 times
    # globally (every occurrence, within- or cross-doc); rebuild the
    # normalized text from survivors. Docs with >= 1 word only.
    q["dedup_spans_removed"] = _W + """,
p AS (
  SELECT doc_id, words, unnest(range(0, len(words) - 4)) AS i
  FROM w WHERE len(words) >= 5),
s AS (
  SELECT doc_id, i,
         words[i+1] || ' ' || words[i+2] || ' ' || words[i+3] || ' '
         || words[i+4] || ' ' || words[i+5] AS g
  FROM p),
dup AS (SELECT g FROM s GROUP BY g HAVING count(*) >= 2),
cov AS (
  SELECT DISTINCT s.doc_id, s.i + off.o AS pos
  FROM s JOIN dup USING (g),
       (SELECT unnest(range(0, 5)) AS o) off),
wp AS (
  SELECT doc_id, unnest(words) AS wd,
         unnest(range(0, len(words))) AS pos
  FROM w WHERE len(words) >= 1)
SELECT wp.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(count(*) FILTER (WHERE cov.pos IS NOT NULL) AS BIGINT)
         AS n_removed,
       coalesce(string_agg(wp.wd, ' ' ORDER BY wp.pos)
                  FILTER (WHERE cov.pos IS NULL), '') AS clean_text
FROM wp LEFT JOIN cov ON wp.doc_id = cov.doc_id AND wp.pos = cov.pos
GROUP BY wp.doc_id"""

    # bigram LM counts: P(w2|w1) as integer ppm (floor), denominators
    # over ALL bigrams of w1, emitted rows filtered to n >= 20
    q["bigram_lm"] = _W + """,
b AS (
  SELECT doc_id, words, unnest(range(0, len(words) - 1)) AS i
  FROM w WHERE len(words) >= 2),
g AS (SELECT words[i+1] AS w1, words[i+2] AS w2,
             CAST(count(*) AS BIGINT) AS n
      FROM b GROUP BY 1, 2),
t AS (SELECT w1, sum(n) AS tot FROM g GROUP BY w1)
SELECT g.w1, g.w2, g.n,
       CAST((g.n * 1000000) // t.tot AS BIGINT) AS p_ppm
FROM g JOIN t ON g.w1 = t.w1
WHERE g.n >= 20"""

    # CCNet-style fluency terciles: mean floor-ppm bigram conditional
    # per doc (bigrams under the n>=20 filter contribute 0), buckets by
    # quantile_disc terciles of qk = fluency_ppm // 100
    q["ccnet_buckets"] = _W + """,
b AS (
  SELECT doc_id, words, unnest(range(0, len(words) - 1)) AS i
  FROM w WHERE len(words) >= 2),
pair AS (SELECT doc_id, words[i+1] AS w1, words[i+2] AS w2 FROM b),
g AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
      FROM pair GROUP BY 1, 2),
tot AS (SELECT w1, sum(n) AS t FROM g GROUP BY w1),
lm AS (SELECT g.w1, g.w2, CAST(g.n * 1000000 // t.t AS BIGINT) AS p_ppm
       FROM g JOIN tot t ON g.w1 = t.w1 WHERE g.n >= 20),
sc AS (SELECT p.doc_id,
              CAST(coalesce(sum(lm.p_ppm), 0) // count(*) AS BIGINT)
                AS fluency_ppm
       FROM pair p LEFT JOIN lm ON p.w1 = lm.w1 AND p.w2 = lm.w2
       GROUP BY p.doc_id),
k AS (SELECT doc_id, fluency_ppm, fluency_ppm // 100 AS qk FROM sc),
t AS (SELECT quantile_disc(qk, 1.0/3) AS t1,
             quantile_disc(qk, 2.0/3) AS t2 FROM k)
SELECT doc_id, fluency_ppm,
       CASE WHEN qk > t.t2 THEN 'head'
            WHEN qk > t.t1 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM k, t"""

    # inverted index: df over ALL docs, posting list = first 20 doc_ids
    # ascending, terms with df ≥ 5 only
    q["inverted_index"] = _W + """,
p AS (SELECT DISTINCT doc_id, unnest(words) AS term FROM w),
g AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY term
      HAVING count(*) >= 5),
r AS (SELECT term, doc_id,
             row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
      FROM p)
SELECT g.term, g.df,
       string_agg(CAST(r.doc_id AS VARCHAR), ',' ORDER BY r.doc_id)
         AS postings
FROM g JOIN r ON g.term = r.term AND r.rn <= 20
GROUP BY g.term, g.df"""

    # per-language embedding centroid + per-vector L2 distance to its
    # own centroid. Centroids FLOOR-quantize to 1e-6 on both engines
    # (floor has one semantic everywhere; round() is half-away in
    # DuckDB but half-even in numpy) so the distance inputs agree;
    # dist itself is unrounded — the driver comparator rounds both
    # engines' floats identically.
    q["lang_centroid_dist"] = """
WITH x AS (
  SELECT e.vec_id, d.lang,
         unnest(e.embedding) AS v,
         unnest(range(1, len(e.embedding) + 1)) AS dim
  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
c AS (SELECT lang, dim, floor(avg(v) * 1000000) / 1000000 AS c
      FROM x GROUP BY lang, dim)
SELECT x.vec_id, x.lang,
       sqrt(sum((x.v - c.c) * (x.v - c.c))) AS dist
FROM x JOIN c ON x.lang = c.lang AND x.dim = c.dim
GROUP BY x.vec_id, x.lang"""

    # corpus mix rebalancing: binding stratum (min count/weight, exact
    # cross-multiplied rationals, lexicographic tie-break) kept whole,
    # every other language thinned to h64·w_m·n_i < 2^64·w_i·n_m —
    # HUGEINT arithmetic mirrors the engine's exact Python ints
    q["rebalance_mix"] = """
WITH c AS (SELECT lang, CAST(count(*) AS HUGEINT) AS n
           FROM documents GROUP BY lang),
t(lang, w) AS (VALUES ('de', 15), ('en', 40), ('es', 15),
                      ('fr', 15), ('zh', 15)),
j AS (SELECT c.lang, c.n, CAST(t.w AS HUGEINT) AS w
      FROM c JOIN t ON c.lang = t.lang),
m AS (SELECT j1.lang AS ml, j1.n AS mn, j1.w AS mw FROM j j1
      WHERE NOT EXISTS (SELECT 1 FROM j j2
                        WHERE j2.n * j1.w < j1.n * j2.w
                           OR (j2.n * j1.w = j1.n * j2.w
                               AND j2.lang < j1.lang)))
SELECT d.doc_id, d.lang, d.source
FROM documents d JOIN j ON d.lang = j.lang, m
WHERE CAST(CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 16))
                AS UBIGINT) AS HUGEINT) * (m.mw * j.n)
      < CAST(18446744073709551616 AS HUGEINT) * (j.w * m.mn)"""

    # quality-weighted sampling: keep iff h64(doc_id) < floor(quality ×
    # 2^64) — identical doubles on both engines, so the floor matches
    q["weighted_sample"] = _W + f""",
qual AS (
  SELECT doc_id,
    CAST(0.4 AS DOUBLE) * least(len(words), 100) / 100
    + 0.3 * (1.0 - CASE WHEN len(regexp_extract_all(text, '{_TOK}')) = 0
                        THEN 0.0
                        ELSE len(regexp_extract_all(text, '{_PUNCT}'))
                             / len(regexp_extract_all(text, '{_TOK}'))
                   END)
    + 0.3 * least(1.0, 5.0 *
        CASE WHEN len(words) = 0 THEN 0.0
             ELSE len(list_filter(words, t -> t IN ({en}))) / len(words)
        END) AS quality
  FROM w)
SELECT doc_id, quality FROM qual
WHERE CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
                AS UBIGINT) AS HUGEINT)
      < CAST(floor(quality * 18446744073709551616.0) AS HUGEINT)"""

    # global quality ranking: ROW_NUMBER over (quality DESC, doc_id).
    # The engine computes it shuffle-light (bounded qk-cell offsets +
    # in-cell numbering); floor quantization is order-preserving so the
    # two decompositions agree exactly.
    q["rank_docs"] = _W + f""",
qual AS (
  SELECT doc_id,
    CAST(0.4 AS DOUBLE) * least(len(words), 100) / 100
    + 0.3 * (1.0 - CASE WHEN len(regexp_extract_all(text, '{_TOK}')) = 0
                        THEN 0.0
                        ELSE len(regexp_extract_all(text, '{_PUNCT}'))
                             / len(regexp_extract_all(text, '{_TOK}'))
                   END)
    + 0.3 * least(1.0, 5.0 *
        CASE WHEN len(words) = 0 THEN 0.0
             ELSE len(list_filter(words, t -> t IN ({en}))) / len(words)
        END) AS quality
  FROM w)
SELECT doc_id, quality,
       ROW_NUMBER() OVER (ORDER BY quality DESC, doc_id) AS rnk
FROM qual"""

    # deterministic md5 shard layout: shard = md5(doc_id)[0] mod 16,
    # per-shard doc and canonical-word-count totals
    q["shard_docs"] = r"""
WITH d AS (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
              AS INTEGER) % 16 AS shard_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS toks
  FROM documents)
SELECT CAST(shard_id AS BIGINT) AS shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS tokens
FROM d GROUP BY 1 ORDER BY 1"""

    # concat-and-cut sequence packing: docs laid end-to-end in doc_id
    # order, cut every 512 tokens; a doc belongs to the pack where it
    # starts (pack_id = floor(tokens-before / 512)). Token count is the
    # canonical word count (trim + whitespace-run split, 0 if blank).
    q["pack_sequences"] = r"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS toks
  FROM documents),
c AS (
  SELECT doc_id, toks,
         coalesce(sum(toks) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
  FROM d)
SELECT CAST(floor(cumb / 512.0) AS BIGINT) AS pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM c GROUP BY 1 ORDER BY 1"""

    # video frame sampling: positions floor(j*(nf-1)/3) for j in 0..3
    # over the nf = 8 + doc_id % 25 concatenated-PNG frames; brightness
    # = floor(mean decoded pixel). The engine really walks the
    # container and inflates/unfilters the sampled frames
    # (functions/media.FrameSampleStage); this closed form is what the
    # synthesized frame content must decode back to.
    q["media_frames"] = """
WITH v AS (
  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h,
         8 + doc_id % 25 AS nf
  FROM documents WHERE doc_id % 3 = 2
),
f AS (
  SELECT doc_id, w, h,
         CAST(floor(t.j * (nf - 1) / 3.0) AS BIGINT) AS frame_idx
  FROM v, range(4) t(j)
),
b AS (
  SELECT doc_id, frame_idx, w, h,
         CAST(sum((doc_id + 31 * frame_idx + 5 * xs.x + 9 * ys.y) % 256)
              AS BIGINT) AS s
  FROM f, range(17) xs(x), range(15) ys(y)
  WHERE xs.x < w AND ys.y < h
  GROUP BY doc_id, frame_idx, w, h
)
SELECT doc_id, frame_idx, frame_idx * 100 AS frame_ts_ms,
       s // (w * h) AS brightness
FROM b"""

    # real-codec features: width/height/channels, duration and the
    # decoded pixel/sample sum of the synthesized PNG / WAV / PNG-stream
    # payloads (closed-form content rules in functions/media.py; the
    # engine computes these from actually-decoded bytes)
    q["media_features"] = """
WITH img AS (
  SELECT doc_id, 8 + doc_id % 17 AS w, 8 + doc_id % 13 AS h
  FROM documents WHERE doc_id % 3 = 0
),
imgsum AS (
  SELECT doc_id, w, h,
         CAST(sum((doc_id + 3 * xs.x + 7 * ys.y + 11 * cs.c) % 256)
              AS BIGINT) AS px_sum
  FROM img, range(25) xs(x), range(21) ys(y), range(3) cs(c)
  WHERE xs.x < w AND ys.y < h
  GROUP BY doc_id, w, h
),
aud AS (
  SELECT doc_id, 8 * (64 + doc_id % 129) AS n
  FROM documents WHERE doc_id % 3 = 1
),
audsum AS (
  SELECT doc_id, n,
         CAST(sum(((13 * doc_id + 5 * ss.i) % 4096) - 2048)
              AS BIGINT) AS px_sum
  FROM aud, range(1544) ss(i)
  WHERE ss.i < n
  GROUP BY doc_id, n
),
vid AS (
  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h,
         8 + doc_id % 25 AS nf
  FROM documents WHERE doc_id % 3 = 2
),
vidsum AS (
  SELECT doc_id, w, h, nf,
         CAST(sum((doc_id + 5 * xs.x + 9 * ys.y) % 256)
              AS BIGINT) AS px_sum
  FROM vid, range(17) xs(x), range(15) ys(y)
  WHERE xs.x < w AND ys.y < h
  GROUP BY doc_id, w, h, nf
)
SELECT doc_id, 'image' AS media_type, w AS width, h AS height,
       CAST(3 AS BIGINT) AS channels, CAST(0 AS BIGINT) AS duration_ms,
       px_sum
FROM imgsum
UNION ALL
SELECT doc_id, 'audio', 0, 0, 1, n // 8, px_sum FROM audsum
UNION ALL
SELECT doc_id, 'video', w, h, 1, nf * 100, px_sum FROM vidsum"""

    # BPE round-0 merge candidates: adjacent char pairs over word
    # OCCURRENCES (non-distinct), top-20 by (n DESC, pair ASC)
    q["bpe_merges"] = _W + """,
wo AS (SELECT unnest(words) AS word FROM w),
pr AS (
  SELECT substr(word, i, 1) AS left_sym,
         substr(word, i + 1, 1) AS right_sym
  FROM (SELECT word, unnest(range(1, len(word))) AS i
        FROM wo WHERE len(word) >= 2))
SELECT left_sym, right_sym, CAST(count(*) AS BIGINT) AS n
FROM pr GROUP BY 1, 2
ORDER BY n DESC, left_sym, right_sym LIMIT 20"""

    # int8 symmetric quantization: identical IEEE-double expression
    # (v·127)/amax with floor, exact integer summaries (weights d=1..dim
    # from generate_subscripts match the engine's d+1)
    q["embedding_quantize"] = """
WITH e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings),
a AS (SELECT d, max(abs(v)) AS amax FROM e GROUP BY d),
qv AS (
  SELECT e.vec_id, e.d,
         CASE WHEN a.amax > 0 THEN
           CAST(least(greatest(floor((v * 127) / a.amax), -127), 127)
                AS BIGINT)
         ELSE 0 END AS q
  FROM e JOIN a USING (d))
SELECT vec_id, CAST(sum(q) AS BIGINT) AS q_sum,
       CAST(sum(abs(q)) AS BIGINT) AS q_l1,
       CAST(sum(q * d) AS BIGINT) AS q_checksum
FROM qv GROUP BY vec_id"""

    # snapshot diff vs the derived v2 (corpus.DIFF_NEW_OFFSET rule);
    # hash rule = first 8 md5 bytes, same as functions/diff._h64
    q["snapshot_diff"] = """
WITH a AS (SELECT doc_id, substr(md5(text), 1, 16) AS h FROM documents),
b AS (
  SELECT doc_id,
         substr(md5(CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]'
                         ELSE text END), 1, 16) AS h
  FROM documents WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, substr(md5(text), 1, 16) AS h
  FROM documents WHERE doc_id % 11 = 0),
j AS (
  SELECT COALESCE(a.doc_id, b.doc_id) AS k,
         CASE WHEN a.doc_id IS NULL THEN 'added'
              WHEN b.doc_id IS NULL THEN 'removed'
              WHEN a.h = b.h THEN 'unchanged' ELSE 'changed' END AS status
  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id),
agg AS (SELECT status, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(k) AS BIGINT) AS key_sum FROM j GROUP BY status)
SELECT s.status, COALESCE(agg.n, 0) AS n,
       COALESCE(agg.key_sum, 0) AS key_sum
FROM (VALUES ('added'), ('changed'), ('removed'), ('unchanged'))
     s(status)
LEFT JOIN agg USING (status) ORDER BY s.status"""

    # hash-sampled quantiles: identical md5 membership rule (first byte
    # < 0x20), quantile_disc over the 2-dp sampled values
    q["sampled_quantiles"] = """
WITH s AS (
  SELECT event_type, round(value * 100) / 100.0 AS v
  FROM events
  WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 2))
             AS INTEGER) < 32)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_sampled,
       round(quantile_disc(v, 0.50), 6) AS p50,
       round(quantile_disc(v, 0.90), 6) AS p90,
       round(quantile_disc(v, 0.99), 6) AS p99
FROM s GROUP BY event_type"""

    # ROLLUP: fine (type, day) cells + per-type + grand total, exact
    # integer cents; sentinels instead of NULL grouping markers
    q["events_rollup"] = """
WITH e AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events)
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(day, -1) AS day,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM e GROUP BY ROLLUP(event_type, day)
HAVING count(*) > 0"""

    # CUBE: rollup + the by-day slice, same sentinel convention
    q["events_cube"] = """
WITH e AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events)
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(day, -1) AS day,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM e GROUP BY CUBE(event_type, day)
HAVING count(*) > 0"""

    # composed curation flagship: the quality_filter, dedup_exact and
    # rebalance_mix rules chained over the SURVIVOR set at each stage
    q["curated_docs"] = _W + f""",
qual AS (
  SELECT doc_id,
    CAST(0.4 AS DOUBLE) * least(len(words), 100) / 100
    + 0.3 * (1.0 - CASE WHEN len(regexp_extract_all(text, '{_TOK}')) = 0
                        THEN 0.0
                        ELSE len(regexp_extract_all(text, '{_PUNCT}'))
                             / len(regexp_extract_all(text, '{_TOK}'))
                   END)
    + 0.3 * least(1.0, 5.0 *
        CASE WHEN len(words) = 0 THEN 0.0
             ELSE len(list_filter(words, t -> t IN ({en}))) / len(words)
        END) AS quality
  FROM w),
k AS (SELECT doc_id, CAST(floor(quality * 10000) AS BIGINT) AS qk
      FROM qual),
t AS (SELECT quantile_disc(qk, 0.25) AS thr FROM k),
s1 AS (
  SELECT w.doc_id, md5(array_to_string(w.words, ' ')) AS h
  FROM w JOIN k ON w.doc_id = k.doc_id, t WHERE k.qk >= t.thr),
s2 AS (SELECT min(doc_id) AS doc_id FROM s1 GROUP BY h),
s3 AS (SELECT d.doc_id, d.lang FROM documents d JOIN s2 USING (doc_id)),
c AS (SELECT lang, CAST(count(*) AS HUGEINT) AS n FROM s3 GROUP BY lang),
tt(lang, w) AS (VALUES ('de', 15), ('en', 40), ('es', 15),
                       ('fr', 15), ('zh', 15)),
j AS (SELECT c.lang, c.n, CAST(tt.w AS HUGEINT) AS w
      FROM c JOIN tt ON c.lang = tt.lang),
m AS (SELECT j1.lang AS ml, j1.n AS mn, j1.w AS mw FROM j j1
      WHERE NOT EXISTS (SELECT 1 FROM j j2
                        WHERE j2.n * j1.w < j1.n * j2.w
                           OR (j2.n * j1.w = j1.n * j2.w
                               AND j2.lang < j1.lang)))
SELECT s3.doc_id, s3.lang
FROM s3 JOIN j ON s3.lang = j.lang, m
WHERE CAST(CAST(('0x' || substr(md5(CAST(s3.doc_id AS VARCHAR)), 1, 16))
                AS UBIGINT) AS HUGEINT) * (m.mw * j.n)
      < CAST(18446744073709551616 AS HUGEINT) * (j.w * m.mn)"""

    # watermark late-data rule: strict-prefix running max of event time
    # over arrival order (event_id), late iff > 5 min behind
    q["late_events"] = """
WITH o AS (
  SELECT event_id, event_type, epoch_us(ts) AS us,
         max(epoch_us(ts)) OVER (ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
  FROM events)
SELECT event_type,
       CAST(count(*) FILTER (WHERE pmax - us > 300000000) AS BIGINT)
         AS n_late,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(COALESCE(sum(event_id)
                     FILTER (WHERE pmax - us > 300000000), 0) AS BIGINT)
         AS late_id_sum
FROM o GROUP BY event_type ORDER BY event_type"""

    # quantized ANN: codes rebuilt by the identical floor-quantizer,
    # int8×int8 dot scores summed as BIGINT — exact integer ordering
    q["ann_quantized"] = """
WITH e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings),
a AS (SELECT d, max(abs(v)) AS amax FROM e GROUP BY d),
qv AS (
  SELECT e.vec_id, e.d,
         CASE WHEN a.amax > 0 THEN
           CAST(least(greatest(floor((v * 127) / a.amax), -127), 127)
                AS BIGINT)
         ELSE 0 END AS q
  FROM e JOIN a USING (d)),
scores AS (
  SELECT ql.vec_id AS query_id, db.vec_id AS vec_id,
         CAST(sum(ql.q * db.q) AS BIGINT) AS score
  FROM qv ql JOIN qv db ON ql.d = db.d
  WHERE ql.vec_id IN (0,1,2,3,4,5,6,7,8,9)
    AND db.vec_id NOT IN (0,1,2,3,4,5,6,7,8,9)
  GROUP BY 1, 2),
r AS (SELECT query_id, vec_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id) AS rank
      FROM scores)
SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, score
FROM r WHERE rank <= 5"""

    # the prefix-filter path must reproduce the EXACT pair set of the
    # triangle path — same oracle by construction
    q["dedup_prefix"] = q["dedup_ngram"]

    # ANALYZE profile: per-column stats, uniform KMV distinct rule
    # (identical estimator constants to sketches.kmv_estimate)
    def _prof_col(col: str) -> str:
        cast = f"CAST({col} AS VARCHAR)"
        kmv = f"""(SELECT CASE WHEN count(*) < 256
            THEN CAST(count(*) AS DOUBLE)
            ELSE round(255 / (CAST(('0x' || substr(max(h), 1, 15))
                              AS BIGINT) / power(16, 15)), 6) END
      FROM (SELECT h FROM (SELECT DISTINCT md5({cast}) AS h
                           FROM documents WHERE {col} IS NOT NULL)
            ORDER BY h LIMIT 256))"""
        return f"""SELECT '{col}' AS "column",
       CAST(count(*) AS BIGINT) AS n,
       CAST(COALESCE(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_null,
       {kmv} AS n_distinct,
       COALESCE(CAST(min({col}) AS VARCHAR), '') AS min_repr,
       COALESCE(CAST(max({col}) AS VARCHAR), '') AS max_repr
FROM documents"""

    q["profile_docs"] = "\nUNION ALL\n".join(
        _prof_col(c) for c in ("doc_id", "n_chars", "text", "lang",
                               "source"))

    # Gopher rules (Rae et al. 2021 §A1.1): every flag an exact integer
    # comparison over the canonical word stream; '#'/'...' counts via
    # non-overlapping replace (same semantics as Python str.count)
    q["gopher_rules"] = _W + f""",
g AS (
  SELECT doc_id, len(words) AS n,
         coalesce(list_sum(list_transform(words, x -> length(x))), 0)
           AS wl,
         (length(text) - length(replace(text, '#', '')))
         + (length(text) - length(replace(text, '...', ''))) // 3
           AS nsym,
         len(list_filter(words, x -> regexp_matches(x, '[a-z]')))
           AS nalpha,
         len(list_filter([{en}],
                         s -> list_contains(words, s))) AS nstop
  FROM w),
f AS (
  SELECT doc_id, CAST(n AS BIGINT) AS n_words,
    CAST(CASE WHEN n BETWEEN 50 AND 100000 THEN 1 ELSE 0 END
         AS BIGINT) AS r_words,
    CAST(CASE WHEN n > 0 AND 3*n <= wl AND wl <= 10*n THEN 1 ELSE 0
         END AS BIGINT) AS r_wlen,
    CAST(CASE WHEN 10*nsym <= n THEN 1 ELSE 0 END AS BIGINT)
      AS r_symbol,
    CAST(CASE WHEN 5*nalpha >= 4*n THEN 1 ELSE 0 END AS BIGINT)
      AS r_alpha,
    CAST(CASE WHEN nstop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS r_stop
  FROM g)
SELECT doc_id, n_words, r_words, r_wlen, r_symbol, r_alpha, r_stop,
       r_words * r_wlen * r_symbol * r_alpha * r_stop AS keep
FROM f"""

    # α=1/2 temperature mixture sampling: keep iff u²·n_s < n_min·2⁶⁴,
    # u = first 8 md5 hex digits (the square-root-free exact coin)
    q["mixture_sample"] = """
WITH c AS (SELECT lang, CAST(count(*) AS HUGEINT) AS n
           FROM documents GROUP BY lang),
m AS (SELECT min(n) AS mn FROM c)
SELECT d.doc_id, d.lang
FROM documents d JOIN c ON d.lang = c.lang, m
WHERE CAST(CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                AS UBIGINT) AS HUGEINT)
      * CAST(CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                  AS UBIGINT) AS HUGEINT)
      * c.n
      < m.mn * CAST(18446744073709551616 AS HUGEINT)"""

    # quality-ranked token-budget selection: the engine's histogram +
    # boundary-cell prefix scan ≡ this window cumsum (floor quantization
    # is order-preserving; ties break by doc_id in both)
    q["token_budget_select"] = _W + f""",
qual AS (
  SELECT doc_id, len(words) AS n_words,
    CAST(0.4 AS DOUBLE) * least(len(words), 100) / 100
    + 0.3 * (1.0 - CASE WHEN len(regexp_extract_all(text, '{_TOK}')) = 0
                        THEN 0.0
                        ELSE len(regexp_extract_all(text, '{_PUNCT}'))
                             / len(regexp_extract_all(text, '{_TOK}'))
                   END)
    + 0.3 * least(1.0, 5.0 *
        CASE WHEN len(words) = 0 THEN 0.0
             ELSE len(list_filter(words, t -> t IN ({en}))) / len(words)
        END) AS quality
  FROM w),
k AS (SELECT doc_id,
             CAST(floor(quality * 10000) AS BIGINT) AS qk,
             CAST(n_words AS BIGINT) AS n_words FROM qual),
t AS (SELECT sum(n_words) // 4 AS budget FROM k)
SELECT doc_id, qk, n_words FROM (
  SELECT doc_id, qk, n_words,
         SUM(n_words) OVER (ORDER BY qk DESC, doc_id) - n_words
           AS before
  FROM k), t
WHERE before < t.budget"""

    # JL signed projection: q_d = floor(v·10⁶) (identical IEEE floor),
    # sign from the first md5 hex digit of "d:j", integer sums exact
    q["jl_project"] = """
WITH e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings),
qv AS (SELECT vec_id, d,
              CAST(floor(v * 1000000.0) AS BIGINT) AS q FROM e),
jj AS (SELECT unnest(range(1, 9)) AS j),
s AS (SELECT qv.vec_id, jj.j,
             CASE WHEN substr(md5(CAST(qv.d AS VARCHAR) || ':' ||
                              CAST(jj.j AS VARCHAR)), 1, 1) < '8'
                  THEN qv.q ELSE -qv.q END AS t
      FROM qv, jj)
SELECT vec_id, CAST(j AS BIGINT) AS j, CAST(sum(t) AS BIGINT) AS y
FROM s GROUP BY vec_id, j"""

    # per-source shingle type-token ratio: postings = Σ per-doc
    # DISTINCT shingles (the sh CTE is per-doc distinct), types =
    # globally distinct per source; shared round-6dp expression
    q["ngram_diversity"] = _shingle_ctes() + """,
ss AS (SELECT d.source, sh.doc_id, sh.s
       FROM sh JOIN documents d USING (doc_id)),
p AS (SELECT source, CAST(count(*) AS BIGINT) AS n_postings,
             CAST(count(DISTINCT s) AS BIGINT) AS n_types
      FROM ss GROUP BY 1)
SELECT source, n_postings, n_types,
       CASE WHEN n_postings = 0 THEN 0.0
            ELSE round(CAST(n_types AS DOUBLE)
                       / CAST(n_postings AS DOUBLE), 6) END AS ttr
FROM p"""

    # vocabulary-growth curve: a shingle is "new" in its min-doc_id
    # owner; every doc keeps a row (empty docs report zeros)
    q["shingle_novelty"] = _shingle_ctes() + """,
f AS (SELECT s, min(doc_id) AS doc_id FROM sh GROUP BY s),
nn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_new
       FROM f GROUP BY 1)
SELECT w.doc_id, CAST(COALESCE(z.n, 0) AS BIGINT) AS n_shingles,
       COALESCE(nn.n_new, 0) AS n_new
FROM w LEFT JOIN sizes z USING (doc_id)
       LEFT JOIN nn USING (doc_id)"""

    # CDC latest-wins compaction: one row per (user, type), winner =
    # highest event_id
    q["upsert_latest"] = """
SELECT user_id, event_type, event_id, value FROM (
  SELECT user_id, event_type, event_id, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY event_id DESC, value DESC) AS rn
  FROM events) WHERE rn = 1"""

    # deterministic per-epoch shuffle: md5 order key, rank within
    # epoch, round-robin shard; lowercase-hex md5 ordering matches the
    # engine's cell-histogram + in-cell lexicographic numbering
    q["epoch_shuffle"] = """
WITH e AS (SELECT doc_id, unnest(range(1, 3)) AS epoch
           FROM documents),
h AS (SELECT epoch, doc_id,
             md5(CAST(epoch AS VARCHAR) || ':'
                 || CAST(doc_id AS VARCHAR)) AS hh
      FROM e),
r AS (SELECT epoch, doc_id,
             row_number() OVER (PARTITION BY epoch
                                ORDER BY hh, doc_id) AS pos
      FROM h)
SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
       CAST(pos AS BIGINT) AS pos,
       CAST((pos - 1) % 8 AS BIGINT) AS shard
FROM r"""

    # BPE train+apply: the round-0 top-20 merge list applied in rank
    # order, one single-pass replace per merge (SQL replace ==
    # Python str.replace semantics — the shared contract). Steps are
    # generated; a rank with no merge row falls back to a chr(1)
    # pattern that can never match (COALESCE guard).
    steps = []
    prev = "s0"
    for i in range(1, 21):
        steps.append(
            f"s{i} AS (SELECT doc_id, word, replace(seq,\n"
            f"  COALESCE((SELECT ' '||l||' '||r||' ' FROM m WHERE rk={i}),"
            f" chr(1)),\n"
            f"  COALESCE((SELECT ' '||l||r||' ' FROM m WHERE rk={i}),"
            f" chr(1))) AS seq FROM {prev})")
        prev = f"s{i}"
    q["bpe_encode"] = _W + r""",
wo AS (SELECT doc_id, unnest(words) AS word FROM w),
pr AS (SELECT substr(word, i, 1) AS l, substr(word, i + 1, 1) AS r
       FROM (SELECT word, unnest(range(1, len(word))) AS i
             FROM wo WHERE len(word) >= 2)),
m AS (SELECT l, r, row_number() OVER (ORDER BY n DESC, l, r) AS rk
      FROM (SELECT l, r, CAST(count(*) AS BIGINT) AS n
            FROM pr GROUP BY 1, 2
            ORDER BY n DESC, l, r LIMIT 20)),
s0 AS (SELECT doc_id, word,
              ' ' || regexp_replace(word, '(.)', '\1 ', 'g') AS seq
       FROM wo),
""" + ",\n".join(steps) + f""",
tok AS (SELECT doc_id, len(word) AS n_chars,
               string_split(trim(seq), ' ') AS toks FROM {prev}),
agg AS (SELECT doc_id,
               CAST(sum(n_chars) AS BIGINT) AS n_chars,
               CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
               CAST(sum(len(list_filter(toks, t -> len(t) > 1)))
                    AS BIGINT) AS n_merged
        FROM tok GROUP BY 1)
SELECT w.doc_id, COALESCE(a.n_chars, 0) AS n_chars,
       COALESCE(a.n_tokens, 0) AS n_tokens,
       COALESCE(a.n_merged, 0) AS n_merged
FROM w LEFT JOIN agg a USING (doc_id)"""

    # per-doc unigram entropy: inner sum as order-independent int64
    # micro-units floor(c*ln(c)*1e6); the final entropy is ONE shared
    # expression tree rounded to 6 dp
    q["unigram_entropy"] = _W + """,
u AS (SELECT doc_id, unnest(words) AS wd FROM w),
c AS (SELECT doc_id, wd, CAST(count(*) AS BIGINT) AS c
      FROM u GROUP BY 1, 2),
e AS (SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_words,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(sum(CAST(floor(CAST(c AS DOUBLE)
                                 * ln(CAST(c AS DOUBLE))
                                 * 1000000.0) AS BIGINT)) AS BIGINT)
               AS ent_micro
      FROM c GROUP BY 1)
SELECT w.doc_id,
       COALESCE(e.n_words, 0) AS n_words,
       COALESCE(e.n_distinct, 0) AS n_distinct,
       COALESCE(e.ent_micro, 0) AS ent_micro,
       CASE WHEN e.n_words IS NULL OR e.n_words = 0 THEN 0.0
            ELSE round(ln(CAST(e.n_words AS DOUBLE))
                       - CAST(e.ent_micro AS DOUBLE)
                         / (CAST(e.n_words AS DOUBLE) * 1000000.0), 6)
       END AS entropy
FROM w LEFT JOIN e USING (doc_id)"""

    # cross-source shingle contamination matrix: distinct shingles per
    # source, pairwise intersection counts, Jaccard rounded 6 dp with
    # the same expression tree; only n_common > 0 pairs emitted
    q["source_overlap"] = _shingle_ctes() + """,
ss AS (SELECT DISTINCT d.source, sh.s
       FROM sh JOIN documents d USING (doc_id)),
sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n
       FROM ss GROUP BY 1),
pairs AS (SELECT a.source AS source_a, b.source AS source_b,
                 CAST(count(*) AS BIGINT) AS n_common
          FROM ss a JOIN ss b ON a.s = b.s AND a.source < b.source
          GROUP BY 1, 2)
SELECT p.source_a, p.source_b, za.n AS n_a, zb.n AS n_b, p.n_common,
       round(CAST(p.n_common AS DOUBLE)
             / CAST(za.n + zb.n - p.n_common AS DOUBLE), 6) AS jaccard
FROM pairs p JOIN sz za ON za.source = p.source_a
             JOIN sz zb ON zb.source = p.source_b"""

    # two-iteration Lloyd k-means, fully exact: micro-unit floor
    # quantization, k=8 lowest-vec_id seeds, int64 distances, exact
    # floor-division centroid update ((s - pymod(s,n)) // n because
    # DuckDB's // truncates toward zero while numpy's floors), ties to
    # the lowest centroid id
    q["kmeans_assign"] = """
WITH e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings),
qv AS (SELECT vec_id, d,
              CAST(floor(v * 1000000.0) AS BIGINT) AS q FROM e),
seeds AS (SELECT vec_id AS cid FROM embeddings
          ORDER BY vec_id LIMIT 8),
c0 AS (SELECT s.cid, qv.d, qv.q FROM qv JOIN seeds s
       ON qv.vec_id = s.cid),
d1 AS (SELECT qv.vec_id, c.cid,
              CAST(sum((qv.q - c.q) * (qv.q - c.q)) AS BIGINT) AS dist2
       FROM qv JOIN c0 c USING (d) GROUP BY 1, 2),
a1 AS (SELECT vec_id, cid FROM (
         SELECT vec_id, cid,
                row_number() OVER (PARTITION BY vec_id
                                   ORDER BY dist2, cid) AS rn
         FROM d1) WHERE rn = 1),
upd AS (SELECT a1.cid, qv.d,
               CAST(sum(qv.q) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM a1 JOIN qv USING (vec_id) GROUP BY 1, 2),
c1 AS (
  SELECT cid, d, (s - (((s % n) + n) % n)) // n AS q FROM upd
  UNION ALL
  SELECT cid, d, q FROM c0
  WHERE cid NOT IN (SELECT DISTINCT cid FROM upd)),
d2 AS (SELECT qv.vec_id, c.cid,
              CAST(sum((qv.q - c.q) * (qv.q - c.q)) AS BIGINT) AS dist2
       FROM qv JOIN c1 c USING (d) GROUP BY 1, 2)
SELECT vec_id, cid AS cluster, dist2 FROM (
  SELECT vec_id, cid, dist2,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY dist2, cid) AS rn
  FROM d2) WHERE rn = 1"""

    # BM25 per-(doc, term) partial scores: identical IEEE expression
    # tree to textstats.bm25_scores, rounded to 6 dp; never summed
    # across terms (float addition order is engine-dependent)
    q["bm25_scores"] = _W + """,
s AS (SELECT CAST(count(*) AS DOUBLE) AS nd,
             CAST(sum(len(words)) AS DOUBLE) AS tw FROM w),
t(term) AS (VALUES ('data'), ('join'), ('stream'), ('vector')),
df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
       FROM t JOIN w ON list_contains(words, term) GROUP BY term),
tf AS (SELECT doc_id, term,
              CAST(len(list_filter(words, x -> x = term)) AS BIGINT)
                AS tf,
              len(words) AS dl
       FROM w, t WHERE list_contains(words, term))
SELECT doc_id, term, tf,
  round(ln((s.nd - df.df + 0.5) / (df.df + 0.5) + 1.0)
        * (tf * CAST(2.2 AS DOUBLE))
        / (tf + 1.2 * (0.25 + 0.75 * (dl / (s.tw / s.nd)))), 6)
    AS score
FROM tf JOIN df USING (term), s"""

    # Matryoshka two-stage retrieval: coarse top-20 on the first 16
    # dims (rounded-cosine/vec_id order), exact full-dim rerank to
    # top-5 — mirrors functions/similarity.matryoshka_rerank
    q["matryoshka_rerank"] = """
WITH qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
            FROM embeddings WHERE vec_id < 10),
cv AS (SELECT vec_id, embedding::DOUBLE[] AS ce
       FROM embeddings WHERE vec_id >= 10),
p AS (SELECT query_id, vec_id, qe, ce,
             round(list_cosine_similarity(qe[1:16], ce[1:16]), 6)
               AS pcos
      FROM qv CROSS JOIN cv),
cand AS (SELECT query_id, vec_id, qe, ce,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY pcos DESC, vec_id) AS prank
         FROM p QUALIFY prank <= 20),
r AS (SELECT query_id, vec_id,
             round(list_cosine_similarity(qe, ce), 6) AS cosine
      FROM cand)
SELECT query_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, vec_id) AS rank,
       vec_id, cosine
FROM r QUALIFY rank <= 5"""

    # MMR greedy diversified top-5 over the exact top-8 cosine pool,
    # unrolled one CTE per selection step; rel/sim in int64
    # micro-cosine units so the fold is order-exact on both engines —
    # mirrors functions/similarity.mmr_diversify
    q["mmr_diversify"] = _mmr_sql(k=5, m=8)

    # hashing-trick bag-of-words: signed md5-bucket sums per doc,
    # nonzero rows only — mirrors textstats.feature_hash_batch
    q["feature_hashing"] = _W + """,
tok AS (SELECT doc_id, unnest(words) AS t FROM w),
h AS (SELECT doc_id,
             CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 64
               AS bucket,
             CASE WHEN CAST(('0x' || substr(md5(t), 9, 1)) AS BIGINT)
                       % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM tok)
SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS weight
FROM h GROUP BY doc_id, bucket HAVING sum(sgn) <> 0"""

    # edge-triggered per-user threshold alerts over 1-hour tumbling
    # windows: fires when n reaches 2 and the immediately preceding
    # window was below 2 (absent window counts 0) — mirrors
    # functions/windows.alert_windows
    q["alert_windows"] = """
WITH c AS (SELECT user_id,
                  (epoch_us(ts) // 3600000000) * 3600000000 AS w,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
l AS (SELECT user_id, w, n,
             CASE WHEN lag(w) OVER (PARTITION BY user_id ORDER BY w)
                       = w - 3600000000
                  THEN lag(n) OVER (PARTITION BY user_id ORDER BY w)
                  ELSE 0 END AS prev_n
      FROM c)
SELECT user_id, make_timestamp(w) AS window_start, n, prev_n
FROM l WHERE n >= 2 AND prev_n < 2"""

    # per-(user, 1h window) rate limiting: first 3 by (ts, event_id)
    # keep, later rows marked dropped — mirrors windows.rate_limit
    q["rate_limit"] = """
SELECT event_id, user_id,
       make_timestamp((epoch_us(ts) // 3600000000) * 3600000000)
         AS window_start,
       row_number() OVER (PARTITION BY user_id,
                                       epoch_us(ts) // 3600000000
                          ORDER BY ts, event_id) AS seq,
       CAST(CASE WHEN row_number() OVER (
                        PARTITION BY user_id,
                                     epoch_us(ts) // 3600000000
                        ORDER BY ts, event_id) <= 3
            THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM events"""

    # per-lang z-score of document length from exact INT64 moments;
    # the float expression tree (mu = s/n; v = ss/n - mu*mu;
    # z = round((x-mu)/sqrt(v), 6)) matches textstats.zscore_lengths
    # op for op; constant groups pin z = 0
    q["zscore_lengths"] = """
WITH m AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(n_chars) AS BIGINT) AS s,
                  CAST(sum(n_chars * n_chars) AS BIGINT) AS ss
           FROM documents GROUP BY lang)
SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars,
       CASE WHEN CAST(m.ss AS DOUBLE) / m.n
                 - (CAST(m.s AS DOUBLE) / m.n)
                   * (CAST(m.s AS DOUBLE) / m.n) > 0
            THEN round((CAST(d.n_chars AS DOUBLE)
                        - CAST(m.s AS DOUBLE) / m.n)
                       / sqrt(CAST(m.ss AS DOUBLE) / m.n
                              - (CAST(m.s AS DOUBLE) / m.n)
                                * (CAST(m.s AS DOUBLE) / m.n)), 6)
            ELSE 0.0 END AS z
FROM documents d JOIN m USING (lang)"""

    # blocklist redaction audit: whole-word hits replaced by
    # <REDACTED>; md5 of the scrubbed text, never the text — mirrors
    # textstats.redact_batch (same RE2-compatible pattern)
    q["redact_terms"] = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\b(customer|vector)\b'))
            AS BIGINT) AS n_hits,
       md5(regexp_replace(text, '\b(customer|vector)\b',
                          '<REDACTED>', 'g')) AS scrub_md5
FROM documents"""

    # one-sided CUSUM over per-type tumbling counts via the closed
    # form S_t = P_t - least(0, running-min P) — mirrors
    # windows.cusum_changepoints (k=2, h=5, existing windows only)
    q["cusum_changepoints"] = """
WITH c AS (SELECT event_type,
                  (epoch_us(ts) // 3600000000) * 3600000000 AS w,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
p AS (SELECT event_type, w, n,
             sum(n - 2) OVER (PARTITION BY event_type ORDER BY w)
               AS pf
      FROM c),
s AS (SELECT event_type, w, n,
             pf - least(0, min(pf) OVER (PARTITION BY event_type
                                         ORDER BY w)) AS cusum
      FROM p)
SELECT event_type, make_timestamp(w) AS window_start, n,
       CAST(cusum AS BIGINT) AS cusum,
       CAST(CASE WHEN cusum >= 5 THEN 1 ELSE 0 END AS BIGINT) AS alarm
FROM s"""

    # per-lang p10/p90 winsorization of n_chars; quantile_disc = the
    # engine's _hist_quantile selection rule — mirrors
    # curation.winsorize_lengths
    q["winsorize_lengths"] = """
WITH qs AS (SELECT lang,
                   CAST(quantile_disc(n_chars, 0.1) AS BIGINT) AS lo,
                   CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS hi
            FROM documents GROUP BY lang)
SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars,
       CAST(least(greatest(d.n_chars, qs.lo), qs.hi) AS BIGINT)
         AS clipped
FROM documents d JOIN qs USING (lang)"""

    # k=2 MAD robust length outliers per language (median and MAD both
    # quantile_disc ≡ the shared _hist_quantile rule) — mirrors
    # curation.mad_outliers
    q["mad_outliers"] = """
WITH m AS (SELECT lang, CAST(quantile_disc(n_chars, 0.5) AS BIGINT)
                    AS med
           FROM documents GROUP BY lang),
d AS (SELECT doc_id, dd.lang, CAST(dd.n_chars AS BIGINT) AS n_chars,
             CAST(abs(dd.n_chars - m.med) AS BIGINT) AS dev
      FROM documents dd JOIN m USING (lang)),
md AS (SELECT lang, CAST(quantile_disc(dev, 0.5) AS BIGINT) AS mad
       FROM d GROUP BY lang)
SELECT doc_id, d.lang, n_chars, dev
FROM d JOIN md USING (lang) WHERE dev > 2 * md.mad"""

    # chi-square independence grid lang × source: per-cell (o-e)^2/e in
    # micro-units, e = row*col/n in DOUBLE — mirrors
    # corpus.q_chi2_lang_source
    q["chi2_lang_source"] = """
WITH o AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
           FROM documents GROUP BY 1, 2),
r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rl FROM o GROUP BY 1),
c AS (SELECT source, CAST(sum(o) AS BIGINT) AS cs FROM o GROUP BY 1),
n AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM o)
SELECT o.lang, o.source, o.o,
       CAST(round((o.o - CAST(r.rl * c.cs AS DOUBLE) / n.nn)
                  * (o.o - CAST(r.rl * c.cs AS DOUBLE) / n.nn)
                  / (CAST(r.rl * c.cs AS DOUBLE) / n.nn)
                  * 1000000) AS BIGINT) AS term_micro
FROM o JOIN r USING (lang) JOIN c USING (source), n"""

    # Wilson lower bound of per-user click share — IDENTICAL IEEE
    # expression order as windows.wilson_ctr
    q["wilson_ctr"] = """
WITH t AS (SELECT user_id,
                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS c
           FROM events WHERE event_type IN ('click', 'view')),
g AS (SELECT CAST(user_id AS BIGINT) AS user_id,
             CAST(sum(c) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM t GROUP BY 1)
SELECT user_id, n, s,
       round(((CAST(s AS DOUBLE) / n) + (1.96 * 1.96) / (2 * n)
              - 1.96 * sqrt((((CAST(s AS DOUBLE) / n)
                              * (1 - CAST(s AS DOUBLE) / n))
                             + (1.96 * 1.96) / (4 * n)) / n))
             / (1 + (1.96 * 1.96) / n), 6) AS wilson_lb
FROM g"""

    # lag-1 autocorrelation of daily counts per type: exact int64
    # moments (S, Q, P, x1, xn, n), one shared IEEE ratio — mirrors
    # windows.autocorr_daily
    q["autocorr_daily"] = """
WITH t AS (SELECT event_type AS et,
                  (epoch_us(ts) // 86400000000) * 86400000000 AS d
           FROM events),
x AS (SELECT et, d, CAST(count(*) AS BIGINT) AS x
      FROM t GROUP BY 1, 2),
adj AS (SELECT et, d, x,
               lead(x) OVER (PARTITION BY et ORDER BY d) AS nx
        FROM x),
mo AS (SELECT et,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(x) AS BIGINT) AS s,
              CAST(sum(x * x) AS BIGINT) AS qq,
              CAST(sum(CASE WHEN nx IS NULL THEN 0
                            ELSE x * nx END) AS BIGINT) AS p,
              CAST(arg_min(x, d) AS BIGINT) AS x1,
              CAST(arg_max(x, d) AS BIGINT) AS xn
       FROM adj GROUP BY 1),
f AS (SELECT *, CAST(s AS DOUBLE) / n AS m FROM mo)
SELECT et AS event_type, n AS n_days,
       round((CAST(p AS DOUBLE) - m * (s - xn) - m * (s - x1)
              + (n - 1) * m * m)
             / (CAST(qq AS DOUBLE) - CAST(s AS DOUBLE) * s / n), 6)
         AS r6
FROM f
WHERE n >= 2 AND (CAST(qq AS DOUBLE) - CAST(s AS DOUBLE) * s / n) <> 0
ORDER BY 1"""

    # seasonal-naive (lag-7 calendar) MAE per type: exact |diff| sums,
    # float-free half-up micro rounding — mirrors windows.seasonal_error
    q["seasonal_error"] = """
WITH t AS (SELECT event_type AS et,
                  (epoch_us(ts) // 86400000000) * 86400000000 AS d
           FROM events),
x AS (SELECT et, d, CAST(count(*) AS BIGINT) AS x
      FROM t GROUP BY 1, 2)
SELECT a.et AS event_type, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST((sum(abs(b.x - a.x)) * 2000000 + count(*))
            // (2 * count(*)) AS BIGINT) AS mae_micro
FROM x a JOIN x b ON b.et = a.et AND b.d = a.d + 7 * 86400000000
GROUP BY 1 ORDER BY 1"""

    # adjacent-word PMI collocations (bigrams seen >= 20), one shared
    # IEEE ln expression — mirrors corpus.q_bigram_pmi
    q["bigram_pmi"] = _W + """,
b AS (
  SELECT doc_id, words, unnest(range(0, len(words) - 1)) AS i
  FROM w WHERE len(words) >= 2),
g AS (SELECT words[i+1] AS w1, words[i+2] AS w2,
             CAST(count(*) AS BIGINT) AS n
      FROM b GROUP BY 1, 2),
u AS (SELECT unnest(words) AS wo FROM w),
uc AS (SELECT wo, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY 1),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n_tok FROM u),
mm AS (SELECT CAST(sum(n) AS BIGINT) AS m FROM g)
SELECT g.w1, g.w2, g.n,
       CAST(round(ln((CAST(g.n AS DOUBLE) / mm.m)
                     / ((CAST(a.c AS DOUBLE) / nn.n_tok)
                        * (CAST(bb.c AS DOUBLE) / nn.n_tok)))
                  * 1000000) AS BIGINT) AS pmi_micro
FROM g JOIN uc a ON a.wo = g.w1 JOIN uc bb ON bb.wo = g.w2, nn, mm
WHERE g.n >= 20"""

    # per-doc share of corpus hapax legomena, half-up micro — mirrors
    # corpus.q_hapax_share
    q["hapax_share"] = _W + """,
u AS (SELECT doc_id, unnest(words) AS wo FROM w),
uc AS (SELECT wo, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY 1),
d AS (SELECT u.doc_id,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(CASE WHEN uc.c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax
      FROM u JOIN uc USING (wo) GROUP BY 1)
SELECT doc_id, n_words, n_hapax,
       CAST((n_hapax * 2000000 + n_words) // (2 * n_words) AS BIGINT)
         AS share_micro
FROM d"""

    # Fano factor of daily counts per type, exact int64 moments, one
    # shared IEEE ratio — mirrors windows.fano_factor
    # user-granular type-pair lift — mirrors windows.event_type_lift
    q["event_type_lift"] = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu FROM ut),
s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n1
      FROM ut GROUP BY 1),
p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM ut a JOIN ut b ON a.user_id = b.user_id
                         AND a.event_type < b.event_type
      GROUP BY 1, 2)
SELECT type_a, type_b, n_both,
       round(CAST(n_both AS DOUBLE) * nu
             / (sa.n1 * CAST(sb.n1 AS DOUBLE)), 6) AS lift6
FROM p
JOIN s sa ON sa.event_type = type_a
JOIN s sb ON sb.event_type = type_b
CROSS JOIN n
ORDER BY 1, 2"""

    # 7-day rolling actives — mirrors windows.rolling_active_7d
    q["rolling_active_7d"] = """
WITH ud AS (SELECT DISTINCT user_id,
                   epoch_us(ts) // 86400000000 AS d
            FROM events),
bounds AS (SELECT min(d) AS dmin, max(d) AS dmax FROM ud),
days AS (SELECT unnest(generate_series(dmin, dmax)) AS d
         FROM bounds)
SELECT days.d, CAST(count(DISTINCT ud.user_id) AS BIGINT)
         AS n_active_7d
FROM days JOIN ud ON ud.d BETWEEN days.d - 6 AND days.d
GROUP BY 1 ORDER BY 1"""

    # two-proportion z between even/odd user cohorts — mirrors
    # windows.ab_test_z (same pooled-variance IEEE expression)
    q["ab_test_z"] = """
WITH u AS (SELECT user_id,
                  CAST(max(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS BIGINT) AS conv
           FROM events GROUP BY 1),
c AS (SELECT CAST(count(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT)
               AS n_a,
             CAST(sum(conv) FILTER (WHERE user_id % 2 = 0) AS BIGINT)
               AS x_a,
             CAST(count(*) FILTER (WHERE user_id % 2 = 1) AS BIGINT)
               AS n_b,
             CAST(sum(conv) FILTER (WHERE user_id % 2 = 1) AS BIGINT)
               AS x_b
      FROM u)
SELECT n_a, x_a, n_b, x_b,
       round((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)
             / sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                    * (1 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)), 6) AS z6
FROM c"""

    # week-over-week churn, open final week dropped — mirrors
    # windows.churn_weekly
    q["churn_weekly"] = """
WITH uw AS (SELECT DISTINCT user_id,
                   epoch_us(ts) // 604800000000 AS wk
            FROM events),
mx AS (SELECT max(wk) AS mw FROM uw),
j AS (SELECT a.wk,
             CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END AS churned
      FROM uw a LEFT JOIN uw b
        ON b.user_id = a.user_id AND b.wk = a.wk + 1)
SELECT wk, CAST(count(*) AS BIGINT) AS n_active,
       CAST(sum(churned) AS BIGINT) AS n_churned,
       round(CAST(sum(churned) AS DOUBLE) / count(*), 6)
         AS churn_rate6
FROM j, mx WHERE wk < mw GROUP BY wk ORDER BY wk"""

    # per-source exact-duplicate exposure (dedup_exact's hash rule)
    # — mirrors dedup.dup_rate_by_source
    q["dup_rate_by_source"] = r"""
WITH w AS (SELECT doc_id, source,
                  CASE WHEN trim(text) = '' THEN []
                       ELSE string_split_regex(lower(trim(text)), '\s+')
                  END AS words
           FROM documents),
h AS (SELECT doc_id, source,
             md5(array_to_string(words, ' ')) AS th
      FROM w),
c AS (SELECT th, CAST(count(*) AS BIGINT) AS cnt FROM h GROUP BY 1)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE c.cnt >= 2) AS BIGINT) AS n_dup,
       round(CAST(count(*) FILTER (WHERE c.cnt >= 2) AS DOUBLE)
             / count(*), 6) AS rate6
FROM h JOIN c USING (th) GROUP BY 1 ORDER BY 1"""

    # within-source PERCENT_RANK of n_chars — mirrors
    # curation.quantile_normalize (same min-rank/(n-1) definition)
    q["quantile_normalize"] = """
SELECT doc_id, source, n_chars,
       round(percent_rank() OVER (PARTITION BY source ORDER BY n_chars),
             6) AS pct6
FROM documents"""

    # per-source JS divergence vs the corpus language mixture —
    # mirrors overlap.js_divergence (same per-lang IEEE terms)
    q["js_divergence"] = """
WITH c AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n
           FROM documents GROUP BY 1, 2),
s AS (SELECT source, CAST(sum(n) AS BIGINT) AS ns FROM c GROUP BY 1),
g AS (SELECT lang, CAST(sum(n) AS BIGINT) AS nl FROM c GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c),
grid AS (SELECT s.source, g.lang, s.ns, g.nl, t.tot,
                COALESCE(c.n, 0) AS n
         FROM s CROSS JOIN g CROSS JOIN t
         LEFT JOIN c ON c.source = s.source AND c.lang = g.lang),
term AS (SELECT source,
                CAST(n AS DOUBLE) / ns AS p,
                CAST(nl AS DOUBLE) / tot AS q
         FROM grid)
SELECT source,
       round(sum(CASE WHEN p > 0
                      THEN 0.5 * p * ln(p / ((p + q) / 2)) ELSE 0 END
                 + 0.5 * q * ln(q / ((p + q) / 2))), 6) AS js6
FROM term GROUP BY source ORDER BY source"""

    # Mann-Whitney U with midrank ties over the bounded length grid —
    # mirrors corpus.mann_whitney_u (2x-scaled integer rank sums)
    q["mann_whitney"] = """
WITH d AS (SELECT lang, n_chars FROM documents
           WHERE lang IN ('en', 'zh')),
v AS (SELECT n_chars AS x, CAST(count(*) AS BIGINT) AS nv,
             CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS na_v
      FROM d GROUP BY 1),
r AS (SELECT x, nv, na_v,
             CAST(COALESCE(sum(nv) OVER (ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS cum
      FROM v),
a AS (SELECT CAST(sum(na_v * (2 * cum + nv + 1)) AS BIGINT) AS r2a,
             CAST(sum(na_v) AS BIGINT) AS na,
             CAST(sum(nv - na_v) AS BIGINT) AS nb,
             CAST(sum(nv * nv * nv - nv) AS BIGINT) AS ties
      FROM r)
SELECT na AS n_a, nb AS n_b, r2a - na * (na + 1) AS u2_a,
       round((CAST(r2a - na * (na + 1) AS DOUBLE) / 2
              - CAST(na AS DOUBLE) * nb / 2)
             / sqrt(CAST(na AS DOUBLE) * nb / 12.0
                    * ((na + nb + 1)
                       - CAST(ties AS DOUBLE)
                         / ((na + nb) * (na + nb - 1.0)))), 6) AS z6
FROM a"""

    # guaranteed heavy hitters: exact HAVING filter at the same
    # n * k > N integer threshold as sketches.heavy_hitters (k=200)
    q["heavy_hitters"] = _W + """,
t AS (SELECT unnest(words) AS term FROM w),
c AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY term),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
SELECT term, n FROM c, tot WHERE n * 200 > total ORDER BY term"""

    # SCD2 validity intervals: lag-change flag + lead window over the
    # same (ts, event_id) order as windows.scd2_intervals
    q["scd2_intervals"] = """
WITH o AS (SELECT user_id, event_type, ts, event_id,
                  CASE WHEN lag(event_type) OVER w
                            IS DISTINCT FROM event_type
                       THEN 1 ELSE 0 END AS is_new
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
c AS (SELECT user_id, event_type, ts, event_id FROM o WHERE is_new = 1)
SELECT user_id, event_type, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS valid_to
FROM c"""

    # Benford first-digit screen: exact integer counts, one shared
    # IEEE share/expectation expression — mirrors windows.benford_digits
    q["benford_digits"] = """
WITH v AS (SELECT CAST(floor(abs(value)) AS BIGINT) AS x
           FROM events WHERE abs(value) >= 1),
d AS (SELECT CAST(substr(CAST(x AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM v),
c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
SELECT digit, n, round(CAST(n AS DOUBLE) / tot, 6) AS share6,
       round(log10(1 + 1.0 / digit), 6) AS benford6
FROM c, t ORDER BY digit"""

    # Zipf OLS fit over the exact top-100 terms (same count + tie-break
    # rule as topk_terms) — mirrors corpus.q_zipf_slope / zipf_fit
    q["zipf_slope"] = _W + """,
t AS (SELECT unnest(words) AS term FROM w),
c AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY term),
r AS (SELECT n, row_number() OVER (ORDER BY n DESC, term) AS rank
      FROM c ORDER BY n DESC, term LIMIT 100),
s AS (SELECT CAST(count(*) AS BIGINT) AS k, sum(ln(rank)) AS sx,
             sum(ln(n)) AS sy, sum(ln(rank) * ln(n)) AS sxy,
             sum(ln(rank) * ln(rank)) AS sxx
      FROM r)
SELECT k, round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS slope6,
       round((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k,
             6) AS intercept6
FROM s"""

    q["fano_factor"] = """
WITH t AS (SELECT event_type AS et,
                  (epoch_us(ts) // 86400000000) * 86400000000 AS d
           FROM events),
x AS (SELECT et, d, CAST(count(*) AS BIGINT) AS x
      FROM t GROUP BY 1, 2),
mo AS (SELECT et, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(x) AS BIGINT) AS s,
              CAST(sum(x * x) AS BIGINT) AS qq
       FROM x GROUP BY 1)
SELECT et AS event_type, n AS n_days,
       round((CAST(qq AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / s, 6)
         AS fano6
FROM mo ORDER BY 1"""

    # first event type per user (ts, then event_id), counted per type
    # — mirrors windows.first_event_counts
    q["first_event_counts"] = """
WITH r AS (SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn
           FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n
FROM r WHERE rn = 1 GROUP BY 1 ORDER BY 1"""

    # day-over-day relative change per type (previous OBSERVED day),
    # half-away-from-zero on the magnitude (nonnegative operands only,
    # so truncating // ≡ floor) — mirrors windows.dod_change
    q["dod_change"] = """
WITH t AS (SELECT event_type AS et,
                  (epoch_us(ts) // 86400000000) * 86400000000 AS d
           FROM events),
x AS (SELECT et, d, CAST(count(*) AS BIGINT) AS x
      FROM t GROUP BY 1, 2),
adj AS (SELECT et, d, x,
               lag(x) OVER (PARTITION BY et ORDER BY d) AS prev
        FROM x)
SELECT et AS event_type, make_timestamp(d) AS day, x,
       CAST(prev AS BIGINT) AS prev,
       CAST(CASE WHEN x >= prev
                 THEN ((x - prev) * 2000000 + prev) // (2 * prev)
                 ELSE -(((prev - x) * 2000000 + prev) // (2 * prev))
            END AS BIGINT) AS change_micro
FROM adj WHERE prev IS NOT NULL ORDER BY 1, 2"""

    # Pearson corr(word count, char count) per lang from exact int64
    # moments, one shared IEEE expression — mirrors
    # corpus.q_corr_words_chars
    q["corr_words_chars"] = _W + """,
v AS (SELECT doc_id, len(words) AS x, length(w.text) AS y FROM w),
mo AS (SELECT d.lang,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(v.x) AS BIGINT) AS sx,
              CAST(sum(v.y) AS BIGINT) AS sy,
              CAST(sum(v.x * v.y) AS BIGINT) AS sxy,
              CAST(sum(v.x * v.x) AS BIGINT) AS sxx,
              CAST(sum(v.y * v.y) AS BIGINT) AS syy
       FROM v JOIN documents d USING (doc_id) GROUP BY 1)
SELECT lang, n,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy
                       - CAST(sy AS DOUBLE) * sy)), 6) AS r6
FROM mo
WHERE n >= 2
  AND (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) > 0
ORDER BY 1"""

    # hour-of-day activity grid per type — mirrors
    # corpus.q_hourly_profile
    q["hourly_profile"] = """
SELECT event_type,
       CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hour,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2 ORDER BY 1, 2"""

    # DAU / calendar-month MAU / stickiness, half-up micro — mirrors
    # windows.dau_mau
    q["dau_mau"] = """
WITH p AS (SELECT DISTINCT
             (epoch_us(ts) // 86400000000) * 86400000000 AS d,
             user_id
           FROM events),
dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM p GROUP BY 1),
mp AS (SELECT DISTINCT
         CAST(strftime(make_timestamp(d), '%Y') AS BIGINT) * 100
           + CAST(strftime(make_timestamp(d), '%m') AS BIGINT) AS mo,
         user_id
       FROM p),
mau AS (SELECT mo, CAST(count(*) AS BIGINT) AS mau FROM mp GROUP BY 1)
SELECT make_timestamp(dau.d) AS day, dau.dau, mau.mau,
       CAST((dau.dau * 2000000 + mau.mau) // (2 * mau.mau) AS BIGINT)
         AS stickiness_micro
FROM dau
JOIN mau ON mau.mo =
  CAST(strftime(make_timestamp(dau.d), '%Y') AS BIGINT) * 100
  + CAST(strftime(make_timestamp(dau.d), '%m') AS BIGINT)
ORDER BY 1"""

    # lifetime-value deciles by deterministic quantile_disc thresholds
    # (count of thresholds strictly below) — mirrors
    # windows.user_value_deciles
    q["user_value_deciles"] = """
WITH ut AS (SELECT user_id,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS total
            FROM events GROUP BY 1),
t AS (SELECT quantile_disc(total, 0.1) AS t1,
             quantile_disc(total, 0.2) AS t2,
             quantile_disc(total, 0.3) AS t3,
             quantile_disc(total, 0.4) AS t4,
             quantile_disc(total, 0.5) AS t5,
             quantile_disc(total, 0.6) AS t6,
             quantile_disc(total, 0.7) AS t7,
             quantile_disc(total, 0.8) AS t8,
             quantile_disc(total, 0.9) AS t9 FROM ut),
d AS (SELECT total,
             (CASE WHEN total > t.t1 THEN 1 ELSE 0 END
              + CASE WHEN total > t.t2 THEN 1 ELSE 0 END
              + CASE WHEN total > t.t3 THEN 1 ELSE 0 END
              + CASE WHEN total > t.t4 THEN 1 ELSE 0 END
              + CASE WHEN total > t.t5 THEN 1 ELSE 0 END
              + CASE WHEN total > t.t6 THEN 1 ELSE 0 END
              + CASE WHEN total > t.t7 THEN 1 ELSE 0 END
              + CASE WHEN total > t.t8 THEN 1 ELSE 0 END
              + CASE WHEN total > t.t9 THEN 1 ELSE 0 END) AS decile
      FROM ut, t)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(total) AS BIGINT) AS sum_cents
FROM d GROUP BY 1 ORDER BY 1"""

    # edit-distance near-dup pairs: the SAME MinHash band candidates
    # as dedup_minhash (blocking is part of the definition), verified
    # by levenshtein over the normalized text; dist <= floor(0.2 *
    # max(len)) — mirrors dedup.edit_distance_pairs (whose kernel is
    # fuzz-matched to DuckDB's levenshtein)
    q["dedup_edit"] = minhash_pairs + """,
nt AS (SELECT doc_id, array_to_string(words, ' ') AS t FROM w)
SELECT c.a AS doc_a, c.b AS doc_b,
       CAST(levenshtein(x.t, y.t) AS BIGINT) AS edit_dist
FROM cand c
JOIN nt x ON x.doc_id = c.a
JOIN nt y ON y.doc_id = c.b
WHERE levenshtein(x.t, y.t)
      <= floor(0.2 * greatest(length(x.t), length(y.t)))"""

    # HyperLogLog distinct words, p=6 (64 registers) over the 60-bit
    # md5[:15] hash; the 2^-M sum is an EXACT int64 sum of 2^(55-M)
    # so the double estimate is order-independent — mirrors
    # sketches.hll_distinct_terms including the linear-counting branch
    q["distinct_hll"] = _W + """,
tok AS (SELECT DISTINCT t FROM (SELECT unnest(words) AS t FROM w)),
hh AS (SELECT CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS h
       FROM tok),
rr AS (SELECT h >> 54 AS j,
              CASE WHEN (h & 18014398509481983) > 0
                   THEN 55 - length(bin(h & 18014398509481983))
                   ELSE 55 END AS rho
       FROM hh),
regs AS (SELECT r.range AS j, coalesce(max(rr.rho), 0) AS M
         FROM range(64) r LEFT JOIN rr ON rr.j = r.range GROUP BY 1),
agg AS (SELECT CAST(sum(1::BIGINT << (55 - M)) AS BIGINT) AS s,
               CAST(sum(CASE WHEN M = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS v
        FROM regs),
est AS (SELECT CAST(0.709 AS DOUBLE) * 64 * 64
               * 36028797018963968.0 / s AS e, v
        FROM agg)
SELECT CAST(64 AS BIGINT) AS m,
       CASE WHEN e <= 160.0 AND v > 0
            THEN round(64 * ln(64.0 / v), 6)
            ELSE round(e, 6) END AS hll_estimate,
       v AS zero_registers
FROM est"""

    # linear multi-touch attribution: each purchase splits 1,000,000
    # ppm across same-user clicks in the 6h lookback; remainder to the
    # earliest click (ties by event_id) — mirrors
    # windows.attribution_linear (credit conserved per purchase)
    q["attribution_linear"] = """
WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
           WHERE event_type = 'click'),
p AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
      WHERE event_type = 'purchase'),
j AS (SELECT c.event_id AS ce, c.user_id,
             count(*) OVER (PARTITION BY p.event_id) AS n,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY c.us, c.event_id) AS rn
      FROM p JOIN c ON c.user_id = p.user_id AND c.us <= p.us
                    AND c.us > p.us - 21600000000),
cr AS (SELECT ce, user_id,
              1000000 // n
              + CASE WHEN rn = 1 THEN 1000000 % n ELSE 0 END AS credit
       FROM j)
SELECT ce AS click_event, user_id,
       CAST(sum(credit) AS BIGINT) AS credit_ppm
FROM cr GROUP BY 1, 2"""

    # per-day Population Stability Index over the event-type
    # distribution, Laplace-smoothed, each (day, type) term rounded to
    # int64 micro-units BEFORE the sum (order-independent) — mirrors
    # windows.psi_drift
    q["psi_drift"] = """
WITH t AS (SELECT (epoch_us(ts) // 86400000000) * 86400000000 AS d,
                  event_type AS et FROM events),
kk AS (SELECT CAST(count(DISTINCT et) AS BIGINT) AS k FROM t),
tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM t),
q2 AS (SELECT et, CAST(count(*) AS BIGINT) AS cq FROM t GROUP BY et),
dn AS (SELECT d, CAST(count(*) AS BIGINT) AS nd FROM t GROUP BY d),
dc AS (SELECT d, et, CAST(count(*) AS BIGINT) AS cd
       FROM t GROUP BY d, et),
grid AS (SELECT dn.d, q2.et, dn.nd, q2.cq, coalesce(dc.cd, 0) AS cd
         FROM dn CROSS JOIN q2
         LEFT JOIN dc ON dc.d = dn.d AND dc.et = q2.et),
terms AS (SELECT d,
            CAST(round(((CAST(cd + 1 AS DOUBLE) / (nd + kk.k))
                        - (CAST(cq + 1 AS DOUBLE) / (tot.nn + kk.k)))
                       * ln((CAST(cd + 1 AS DOUBLE) / (nd + kk.k))
                            / (CAST(cq + 1 AS DOUBLE)
                               / (tot.nn + kk.k)))
                       * 1000000) AS BIGINT) AS tm
          FROM grid, kk, tot)
SELECT make_timestamp(d) AS day, CAST(sum(tm) AS BIGINT) AS psi_micro
FROM terms GROUP BY 1"""

    # langid heuristic confusion matrix vs the lang label — mirrors
    # corpus.q_langid_confusion (reuses the text_langid prediction SQL)
    q["langid_confusion"] = _W + f""",
h AS (SELECT doc_id, {', '.join(hit_cols)} FROM w),
m AS (SELECT *, {mx} AS mx FROM h),
pred AS (SELECT doc_id,
  CASE WHEN mx = 0 THEN 'und'
       WHEN {nlead} > 1 THEN 'und'
       {pick}
  END AS lang_pred
FROM m)
SELECT d.lang, pred.lang_pred, CAST(count(*) AS BIGINT) AS n
FROM pred JOIN documents d USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2"""

    # Heaps-law vocabulary growth at doc_id decile checkpoints —
    # mirrors corpus.q_vocab_growth
    q["vocab_growth"] = _W + """,
u AS (SELECT doc_id, unnest(words) AS wo FROM w),
f AS (SELECT wo, CAST(min(doc_id) AS BIGINT) AS fd FROM u GROUP BY 1),
mx2 AS (SELECT CAST(max(doc_id) AS BIGINT) AS m FROM documents),
t AS (SELECT unnest(range(1, 11)) AS k)
SELECT CAST(t.k AS BIGINT) AS k,
       CAST((mx2.m * t.k) // 10 AS BIGINT) AS doc_max,
       CAST(sum(CASE WHEN f.fd <= (mx2.m * t.k) // 10
                THEN 1 ELSE 0 END) AS BIGINT) AS vocab
FROM f, mx2, t GROUP BY 1, 2 ORDER BY 1"""

    return q


def _mmr_sql(k: int, m: int) -> str:
    """Unrolled MMR selection SQL: one (p_t, sel_t) CTE pair per
    greedy step — no recursive CTE, every step an argmax QUALIFY."""
    head = """
WITH qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
            FROM embeddings WHERE vec_id < 10),
cv AS (SELECT vec_id, embedding::DOUBLE[] AS ce
       FROM embeddings WHERE vec_id >= 10),
s AS (SELECT query_id, vec_id,
             round(list_cosine_similarity(qe, ce), 6) AS cosine
      FROM qv CROSS JOIN cv),
cand AS (SELECT query_id, vec_id,
                CAST(round(cosine * 1000000) AS BIGINT) AS rel,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS rnk
         FROM s QUALIFY rnk <= %d),
ce2 AS (SELECT c.query_id, c.vec_id, e.embedding::DOUBLE[] AS ce
        FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id),
sim AS (SELECT a.query_id, a.vec_id AS v1, b.vec_id AS v2,
               CAST(round(round(list_cosine_similarity(a.ce, b.ce), 6)
                          * 1000000) AS BIGINT) AS s
        FROM ce2 a JOIN ce2 b
          ON a.query_id = b.query_id AND a.vec_id <> b.vec_id),
p1 AS (SELECT query_id, vec_id, rel AS mmrv FROM cand
       QUALIFY row_number() OVER (PARTITION BY query_id
                                  ORDER BY rel DESC, vec_id) = 1),
sel1 AS (SELECT query_id, CAST(1 AS BIGINT) AS step, vec_id, mmrv
         FROM p1)""" % m
    parts = [head]
    for t in range(2, k + 1):
        parts.append(""",
p%d AS (SELECT c.query_id, c.vec_id, c.rel - max(m.s) AS mmrv
       FROM cand c
       JOIN sim m ON m.query_id = c.query_id AND m.v1 = c.vec_id
       JOIN (SELECT query_id, vec_id FROM sel%d) pk
         ON pk.query_id = m.query_id AND pk.vec_id = m.v2
       LEFT JOIN (SELECT query_id, vec_id FROM sel%d) ex
         ON ex.query_id = c.query_id AND ex.vec_id = c.vec_id
       WHERE ex.vec_id IS NULL
       GROUP BY c.query_id, c.vec_id, c.rel
       QUALIFY row_number() OVER (PARTITION BY c.query_id
                                  ORDER BY mmrv DESC, c.vec_id) = 1),
sel%d AS (SELECT * FROM sel%d
          UNION ALL
          SELECT query_id, CAST(%d AS BIGINT), vec_id, mmrv FROM p%d)"""
                     % (t, t - 1, t - 1, t, t - 1, t, t))
    parts.append("""
SELECT query_id, step, vec_id, mmrv AS mmr_score
FROM sel%d""" % k)
    return "".join(parts)
