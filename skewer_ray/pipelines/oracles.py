"""DuckDB oracle SQL for every SQL-expressible query in queries.py.

The SQL re-derives every field from the transcript ``text`` column alone
(regexp/json/split), independently of the engine's decoders — an
independent second implementation of the same wire-format semantics over
the generated corpus. Family = conv_index % 12 mirrors the generator's
per-conv decoder assignment.

Transcripts are referenced by absolute path (the driver's DuckDB session
pre-registers only the testdata views); ``ensure_transcripts`` guarantees
the files exist before any SQL runs.
"""

from __future__ import annotations

from ..constants import FACILITIES, SEVERITIES
from ..gen import DATA_ROOT, FAMILY_NAMES


def _tpath(sf_name: str) -> str:
    return f"{DATA_ROOT}/{sf_name}/transcripts.parquet/part-*.parquet"


def _lit(v) -> str:
    return str(v) if isinstance(v, int) else "'" + str(v).replace("'", "''") + "'"


def _case(col_expr: str, mapping: dict, default) -> str:
    whens = " ".join(f"WHEN {_lit(k)} THEN {_lit(v)}" for k, v in mapping.items())
    return f"CASE {col_expr} {whens} ELSE {_lit(default)} END"


_FAC_CASE = _case("json_extract_string(jtext,'$.facility')",
                  {name: i for i, name in enumerate(FACILITIES)}, 1)
_SEV_CASE = _case("json_extract_string(jtext,'$.severity')",
                  {name: i for i, name in enumerate(SEVERITIES)}, 6)

_T3339 = "'%Y-%m-%dT%H:%M:%SZ'"

# --- per-family field expressions over the generated corpus ---------------

_PRI = f"""CASE
  WHEN fam IN (0,1) THEN CAST(regexp_extract(text,'^<(\\d+)>',1) AS INTEGER)
  WHEN fam IN (2,3) THEN CAST(regexp_extract(text,'^<(\\d+)>',1) AS INTEGER)
  WHEN fam = 4 THEN CASE WHEN regexp_matches(text,'^<\\d+>$')
        THEN CAST(regexp_extract(text,'^<(\\d+)>$',1) AS INTEGER) ELSE 0 END
  WHEN fam = 5 THEN ({_FAC_CASE})*8 + ({_SEV_CASE})
  WHEN fam = 6 THEN CAST(json_extract_string(jtext,'$.pri') AS INTEGER)
  WHEN fam = 7 THEN 8 + CAST(json_extract(jtext,'$.level') AS INTEGER)
  WHEN fam = 8 THEN 134
  WHEN fam = 9 THEN 0
  WHEN fam = 10 THEN 14
  ELSE 133 END"""

_HOST = """CASE
  WHEN fam IN (0,1) THEN CASE WHEN split_part(text,' ',3)='-' THEN '' ELSE split_part(text,' ',3) END
  WHEN fam = 2 THEN split_part(text,' ',4)
  WHEN fam = 3 THEN split_part(text,' ',2)
  WHEN fam = 4 THEN ''
  WHEN fam = 5 THEN json_extract_string(jtext,'$.hostname')
  WHEN fam = 6 THEN json_extract_string(jtext,'$.hostname')
  WHEN fam = 7 THEN json_extract_string(jtext,'$.host')
  WHEN fam = 8 THEN regexp_extract(text,'host=([^,]+),',1)
  WHEN fam = 9 THEN ''
  WHEN fam = 10 THEN regexp_extract(text,'host:([^\t]*)',1)
  ELSE '' END"""

_APP = """CASE
  WHEN fam IN (0,1) THEN CASE WHEN split_part(text,' ',4)='-' THEN '' ELSE split_part(text,' ',4) END
  WHEN fam = 2 THEN regexp_extract(split_part(text,' ',5),'^([^\\[]*)\\[',1)
  WHEN fam = 3 THEN rtrim(split_part(text,' ',3), ':')
  WHEN fam = 4 THEN ''
  WHEN fam = 5 THEN json_extract_string(jtext,'$.appname')
  WHEN fam = 6 THEN json_extract_string(jtext,'$."app-name"')
  WHEN fam = 7 THEN ''
  WHEN fam = 8 THEN 'influxdb'
  WHEN fam = 9 THEN ''
  WHEN fam = 10 THEN regexp_extract(text,'app:([^\t]*)',1)
  ELSE split_part(text,'|',2) END"""

_PROC = """CASE
  WHEN fam IN (0,1) THEN CASE WHEN split_part(text,' ',5)='-' THEN '' ELSE split_part(text,' ',5) END
  WHEN fam = 2 THEN regexp_extract(split_part(text,' ',5),'\\[(\\d+)\\]',1)
  WHEN fam = 5 THEN json_extract_string(jtext,'$.procid')
  WHEN fam = 6 THEN json_extract_string(jtext,'$.procid')
  ELSE '' END"""

_MSGID = """CASE
  WHEN fam IN (0,1) THEN CASE WHEN split_part(text,' ',6)='-' THEN '' ELSE split_part(text,' ',6) END
  WHEN fam = 5 THEN json_extract_string(jtext,'$.msgid')
  WHEN fam = 6 THEN json_extract_string(jtext,'$.msgid')
  ELSE '' END"""

_MSG = """CASE
  WHEN fam = 0 THEN regexp_extract(text,'\\] (.*)$',1)
  WHEN fam = 1 THEN regexp_extract(text,'^<\\d+>1 \\S+ \\S+ \\S+ - - - (.*)$',1)
  WHEN fam = 2 THEN regexp_extract(text,'\\]: (.*)$',1)
  WHEN fam = 3 THEN regexp_extract(text,'^\\S+ \\S+ \\S+ (.*)$',1)
  WHEN fam = 4 THEN CASE WHEN regexp_matches(text,'^<\\d+>$') THEN '' ELSE text END
  WHEN fam = 5 THEN json_extract_string(jtext,'$.message')
  WHEN fam = 6 THEN trim(json_extract_string(jtext,'$.msg'))
  WHEN fam = 7 THEN json_extract_string(jtext,'$.short_message')
  WHEN fam = 8 THEN regexp_extract(text,'^([^,]+),',1)
  WHEN fam = 9 THEN ''
  WHEN fam = 10 THEN regexp_extract(text,'msg:([^\t]*)',1)
  ELSE split_part(text,'|',3) END"""

_TR = f"""CASE
  WHEN fam IN (0,1) THEN CASE WHEN split_part(text,' ',2)='-' THEN ts
       ELSE strptime(split_part(text,' ',2), {_T3339}) END
  WHEN fam = 2 THEN make_timestamp(
       CAST(strftime(ts,'%Y') AS BIGINT), 1, CAST(split_part(text,' ',2) AS BIGINT),
       CAST(split_part(split_part(text,' ',3),':',1) AS BIGINT),
       CAST(split_part(split_part(text,' ',3),':',2) AS BIGINT),
       CAST(split_part(split_part(text,' ',3),':',3) AS DOUBLE))
  WHEN fam = 3 THEN strptime(regexp_extract(text,'^<\\d+>(\\S+)',1), {_T3339})
  WHEN fam = 4 THEN CASE WHEN regexp_matches(text,'^<\\d+>$')
       THEN TIMESTAMP '1970-01-01 00:00:00' ELSE ts END
  WHEN fam = 5 THEN strptime(json_extract_string(jtext,'$.timereported'), {_T3339})
  WHEN fam = 6 THEN strptime(json_extract_string(jtext,'$.timereported'), {_T3339})
  WHEN fam = 7 THEN make_timestamp(CAST(json_extract(jtext,'$.timestamp') AS BIGINT)*1000000)
  WHEN fam = 8 THEN make_timestamp(CAST(regexp_extract(text,' (\\d+)$',1) AS BIGINT)//1000)
  WHEN fam = 9 THEN TIMESTAMP '1970-01-01 00:00:00'
  WHEN fam = 10 THEN strptime(regexp_extract(text,'time:([^\t]*)',1), {_T3339})
  ELSE ts END"""

_VER = """CASE WHEN fam IN (0,1,5,6,7,8) THEN 1 ELSE 0 END"""


def parsed_cte(sf_name: str) -> str:
    """Shared CTE: the SQL mirror of parse+route over the generated corpus."""
    return f"""
WITH raw0 AS (
  SELECT conv_id, turn_idx, role, tool, text, ts,
         CAST(substr(conv_id,6) AS INTEGER)%12 AS fam
  FROM read_parquet('{_tpath(sf_name)}')
),
raw AS (
  -- jtext: NULL for malformed JSON so json_extract never raises
  SELECT *, CASE WHEN fam IN (5,6,7) AND json_valid(text) THEN text END AS jtext
  FROM raw0
),
parsed AS (
  SELECT conv_id, turn_idx, role, tool, text, ts, fam,
    (fam = 5 AND NOT json_valid(text)) AS parse_error,
    CAST({_PRI} AS INTEGER) AS priority,
    CAST(({_PRI})//8 AS INTEGER) AS facility,
    CAST(({_PRI})%8 AS INTEGER) AS severity,
    CAST({_VER} AS INTEGER) AS version,
    {_HOST} AS hostname,
    {_APP} AS appname,
    {_PROC} AS procid,
    {_MSGID} AS msgid,
    {_MSG} AS message,
    {_TR} AS time_reported
  FROM raw
),
routed AS (
  SELECT *,
    CASE WHEN parse_error THEN 'parse_error'
         WHEN severity = 7 THEN 'dropped'
         WHEN appname = 'reject-me' THEN 'rejected'
         ELSE 'passing' END AS filter_status,
    CASE WHEN appname <> '' THEN 'syslog-' || appname
         ELSE 'default-topic' END AS topic,
    'pk-' || hostname AS partition_key
  FROM parsed
)
"""


def oracle_sql_for(sf_name: str) -> dict[str, str]:
    C = parsed_cte(sf_name)
    syslog_cols = ("priority, facility, severity, version, hostname, "
                   "appname, procid, msgid, message")
    q: dict[str, str] = {}

    q["parse_rfc5424"] = C + f"""
SELECT conv_id, turn_idx, {syslog_cols}, time_reported
FROM parsed WHERE fam IN (0,1)"""

    q["parse_rfc3164"] = C + """
SELECT conv_id, turn_idx, priority, facility, severity, hostname,
       appname, procid, message, time_reported
FROM parsed WHERE fam IN (2,3)"""

    q["parse_degenerate"] = C + """
SELECT conv_id, turn_idx, priority, facility, severity, hostname,
       appname, message
FROM parsed WHERE fam = 4"""

    q["parse_json"] = C + f"""
SELECT conv_id, turn_idx, {syslog_cols}, time_reported
FROM parsed WHERE fam = 5 AND NOT parse_error"""

    q["parse_rsyslogjson"] = C + f"""
SELECT conv_id, turn_idx, {syslog_cols}, time_reported
FROM parsed WHERE fam = 6"""

    q["parse_gelf"] = C + f"""
SELECT conv_id, turn_idx, {syslog_cols}, time_reported
FROM parsed WHERE fam = 7"""

    q["parse_influx"] = C + """
SELECT conv_id, turn_idx, hostname, appname, facility, severity, version,
       message, time_reported,
       CAST(regexp_extract(text,'usage_idle=([0-9.]+)',1) AS DOUBLE) AS usage_idle,
       CAST(regexp_extract(text,'count=(\\d+)i',1) AS BIGINT) AS count_val,
       regexp_extract(text,'region=([^ ]+) ',1) AS region
FROM parsed WHERE fam = 8"""

    q["parse_w3c"] = C + """
SELECT conv_id, turn_idx,
       split_part(text,' ',3) AS cs_method,
       split_part(text,' ',4) AS cs_uri,
       split_part(text,' ',5) AS sc_status
FROM parsed WHERE fam = 9"""

    q["parse_ltsv"] = C + """
SELECT conv_id, turn_idx, hostname, appname, message, time_reported
FROM parsed WHERE fam = 10"""

    q["parse_custom"] = C + """
SELECT conv_id, turn_idx, priority, facility, severity, appname, message
FROM parsed WHERE fam = 11"""

    q["route_topics"] = C + """
SELECT topic, COUNT(*) AS n FROM routed WHERE NOT parse_error GROUP BY topic"""

    q["route_partition_keys"] = C + """
SELECT partition_key, COUNT(*) AS n FROM routed WHERE NOT parse_error
GROUP BY partition_key"""

    q["filter_results"] = C + """
SELECT filter_status, COUNT(*) AS n FROM routed GROUP BY filter_status"""

    q["sink_counts"] = C + """
SELECT s.sink, r.filter_status AS status, COUNT(*) AS n
FROM routed r
CROSS JOIN (VALUES ('kafka'), ('file'), ('stderr')) AS s(sink)
WHERE NOT r.parse_error
GROUP BY s.sink, r.filter_status
UNION ALL
SELECT '_parse' AS sink, 'error' AS status, COUNT(*) AS n
FROM routed WHERE parse_error"""

    # the engine renders 'logs-{msgid}-{hostname}' AFTER the filter's
    # msgid-uppercase writeback; an item acks iff the name passes ES
    # index-name validation (stages/esbulk.valid_index_name mirrored
    # here predicate for predicate)
    q["es_bulk_acks"] = C + """
SELECT status, COUNT(*) AS n FROM (
  SELECT CASE
    WHEN filter_status IN ('dropped','rejected') THEN filter_status
    WHEN idx = lower(idx)
         AND NOT regexp_matches(idx, '[\\\\/*?"<>| ,#:]')
         AND NOT regexp_matches(idx, '^[-_+]')
         AND idx NOT IN ('.', '..')
         AND strlen(idx) <= 255
      THEN 'passing'
    ELSE 'nack' END AS status
  FROM (SELECT filter_status,
               'logs-' || upper(msgid) || '-' || hostname AS idx
        FROM routed WHERE NOT parse_error))
GROUP BY status"""

    q["file_sink_routes"] = C + """
SELECT appname || '_' || strftime(time_reported, '%Y-%m-%d') AS route,
       COUNT(*) AS n
FROM routed WHERE filter_status = 'passing'
GROUP BY 1"""

    q["encode_rfc5424"] = C + """
SELECT conv_id, turn_idx,
       regexp_replace(text, ' id(\\d\\d) ', ' ID\\1 ') AS text_out
FROM routed WHERE fam = 0 AND filter_status = 'passing'"""

    q["encode_rfc3164"] = C + """
SELECT conv_id, turn_idx, text AS text_out
FROM routed WHERE fam = 2 AND filter_status = 'passing'"""

    role_case = _case("role", {"user": "human", "assistant": "model",
                               "system": "control", "tool": "tool"}, "unknown")
    tool_case = _case("tool", {
        "": "none", "grep": "search", "bash": "exec", "search": "search",
        "browser": "web", "python": "exec", "sql": "data", "editor": "edit",
        "calc": "data", "map": "data", "fetch": "web", "test": "exec",
        "plan": "control", "git": "vcs", "docker": "infra", "k8s": "infra",
    }, "unknown")
    q["enrich_groups"] = C + f"""
SELECT {role_case} AS role_class, {tool_case} AS tool_category,
       COUNT(*) AS n
FROM routed GROUP BY 1, 2"""

    fam_name_case = _case("fam", dict(enumerate(FAMILY_NAMES)), "?")
    q["metrics_incoming"] = C + f"""
SELECT {fam_name_case} AS format, NOT parse_error AS parse_ok,
       COUNT(*) AS n
FROM routed GROUP BY 1, 2"""

    q["conv_stats"] = f"""
SELECT conv_id, count(*) AS n_turns, min(ts) AS first_ts,
       max(ts) AS last_ts, CAST(sum(length(text)) AS BIGINT) AS n_chars
FROM read_parquet('{_tpath(sf_name)}')
GROUP BY conv_id"""

    # incremental ≡ recompute: the merged-checkpoint result must equal
    # the plain full-table aggregate
    q["incremental_conv_stats"] = f"""
SELECT conv_id, count(*) AS n_turns, min(ts) AS first_ts,
       max(ts) AS last_ts, CAST(sum(length(text)) AS BIGINT) AS n_chars
FROM read_parquet('{_tpath(sf_name)}')
GROUP BY conv_id"""

    q["conv_text"] = f"""
SELECT conv_id, count(*) AS n_turns,
       string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx)
         AS session_text
FROM read_parquet('{_tpath(sf_name)}')
GROUP BY conv_id"""

    from ..functions.multiline import multiline_oracle_sql
    q["merge_multiline"] = multiline_oracle_sql(_tpath(sf_name))

    # syslogd repeated-message suppression: consecutive identical texts
    # per stream → one row with the run length (gaps-and-islands) —
    # mirrors functions/multiline.repeat_reduce
    q["repeat_reduce"] = f"""
WITH o AS (
  SELECT conv_id, turn_idx, text,
         CASE WHEN lag(text) OVER (PARTITION BY conv_id
                                   ORDER BY turn_idx)
                   IS DISTINCT FROM text THEN 1 ELSE 0 END AS brk
  FROM read_parquet('{_tpath(sf_name)}')),
i AS (SELECT conv_id, turn_idx, text,
             sum(brk) OVER (PARTITION BY conv_id ORDER BY turn_idx
                            ROWS UNBOUNDED PRECEDING) AS isl
      FROM o)
SELECT conv_id, CAST(min(turn_idx) AS BIGINT) AS first_idx,
       CAST(count(*) AS BIGINT) AS n_repeats, text
FROM i GROUP BY conv_id, isl, text
ORDER BY conv_id, first_idx"""

    q["role_transitions"] = f"""
WITH b AS (
  SELECT role AS to_role,
         lag(role) OVER (PARTITION BY conv_id
                         ORDER BY turn_idx) AS from_role
  FROM read_parquet('{_tpath(sf_name)}'))
SELECT from_role, to_role, CAST(count(*) AS BIGINT) AS n
FROM b WHERE from_role IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2"""

    # sliding turn windows (8 turns, stride 4): each turn joins the ≤2
    # windows covering it; window w exists iff its start w*4 < n_turns
    q["conv_windows"] = f"""
WITH t AS (
  SELECT conv_id, role || ': ' || text AS line,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY turn_idx) - 1 AS rn
  FROM read_parquet('{_tpath(sf_name)}')),
x AS (SELECT conv_id, line, rn, unnest(range(0, 2)) AS k FROM t),
win AS (
  SELECT conv_id, line, rn, rn // 4 - k AS w
  FROM x
  WHERE rn // 4 - k >= 0 AND rn < (rn // 4 - k) * 4 + 8)
SELECT conv_id, w AS win_idx, CAST(count(*) AS BIGINT) AS n_turns,
       string_agg(line, chr(10) ORDER BY rn) AS window_text
FROM win GROUP BY conv_id, w"""

    # conversation-granularity holdout split: pure md5-byte assignment,
    # per-split conv/turn totals
    q["holdout_split"] = f"""
WITH s AS (
  SELECT conv_id,
         CASE WHEN CAST(('0x' || substr(md5(conv_id), 1, 2)) AS INTEGER)
                   < 244 THEN 'train'
              WHEN CAST(('0x' || substr(md5(conv_id), 1, 2)) AS INTEGER)
                   < 250 THEN 'val'
              ELSE 'test' END AS split
  FROM read_parquet('{_tpath(sf_name)}'))
SELECT split, CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
       CAST(count(*) AS BIGINT) AS n_turns
FROM s GROUP BY split ORDER BY split"""

    # weighted sample over turns ⋈ conv-size: keep iff
    # h60(conv:turn)·32 < least(w,32)·2^60 (exact HUGEINT compare)
    q["weighted_join_sample"] = f"""
WITH t AS (
  SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
         CAST(count(*) OVER (PARTITION BY conv_id) AS BIGINT) AS w_conv
  FROM read_parquet('{_tpath(sf_name)}'))
SELECT conv_id, turn_idx, w_conv
FROM t
WHERE CAST(('0x' || substr(md5(conv_id || ':' ||
                               CAST(turn_idx AS VARCHAR)), 1, 15))
           AS BIGINT)::HUGEINT * 32
      < least(w_conv, 32)::HUGEINT * 1152921504606846976::HUGEINT"""

    # per-role-transition latency stats: exact integer µs end-to-end
    # (mean = floor-divided µs — no float rounding mode in play)
    q["turn_latency"] = f"""
WITH b AS (
  SELECT role AS to_role, epoch_us(ts) AS us,
         lag(role) OVER w AS from_role,
         lag(epoch_us(ts)) OVER w AS prev_us
  FROM read_parquet('{_tpath(sf_name)}')
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
SELECT from_role, to_role, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(us - prev_us) // count(*) AS BIGINT) AS avg_gap_us,
       CAST(max(us - prev_us) AS BIGINT) AS max_gap_us
FROM b WHERE from_role IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2"""

    # context-window truncation: longest suffix of turns per conv with
    # total canonical word count ≤ 64 (DESC-order window frame = the
    # engine's reversed cumsum)
    q["trim_context"] = f"""
WITH t AS (
  SELECT conv_id, turn_idx,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END
              AS BIGINT) AS toks
  FROM read_parquet('{_tpath(sf_name)}')),
c AS (SELECT conv_id, turn_idx, toks,
             SUM(toks) OVER (PARTITION BY conv_id
                             ORDER BY turn_idx DESC) AS suffix
      FROM t)
SELECT conv_id, turn_idx, toks FROM c WHERE suffix <= 64"""

    # conversation-level dedup by ordered role sequence: canonical =
    # min conv_id of the identical-pattern group
    q["conv_pattern_dedup"] = f"""
WITH h AS (
  SELECT conv_id,
         md5(string_agg(role, chr(10) ORDER BY turn_idx))
           AS pattern_hash
  FROM read_parquet('{_tpath(sf_name)}')
  GROUP BY conv_id)
SELECT conv_id, pattern_hash,
       min(conv_id) OVER (PARTITION BY pattern_hash) AS canonical_conv,
       CAST(count(*) OVER (PARTITION BY pattern_hash) AS BIGINT)
         AS group_size
FROM h"""

    q["routed_rows_kafka"] = C + """
SELECT conv_id || ':' || CAST(turn_idx AS VARCHAR) || ':0' AS uid,
       topic, partition_key
FROM routed WHERE filter_status = 'passing'"""

    # anonymization: identical pseudonym rule + PII scrub chain
    from ..functions.anonymize import pii_rules_sql
    q["anonymize_hosts"] = C + f"""
SELECT conv_id, turn_idx,
       CASE WHEN hostname = '' THEN ''
            ELSE 'h-' || substr(md5(hostname), 1, 16) END AS hostname,
       appname,
       {pii_rules_sql('message')} AS message
FROM parsed WHERE fam IN (0, 1, 2, 3)"""

    # grok: the identical expanded RE2 regex, extracted by group index
    from ..functions.grok import expand_grok
    from .queries import GROK_5424
    _grx, _gfields = expand_grok(GROK_5424, named=False)
    _grx_sql = _grx.replace("'", "''")
    _gcols = []
    for _i, _f in enumerate(_gfields, start=1):
        e = f"regexp_extract(text, '{_grx_sql}', {_i})"
        if _f in ("pri", "ver"):
            e = f"CAST({e} AS BIGINT)"
        _gcols.append(f"{e} AS {_f}")
    q["grok_transcripts"] = f"""
SELECT conv_id, turn_idx, {', '.join(_gcols)}
FROM read_parquet('{_tpath(sf_name)}')
WHERE regexp_matches(text, '{_grx_sql}')"""

    # template mining: the identical RE2 mask chain, same order
    from ..functions.templates import mask_rules_sql
    q["log_templates"] = f"""
SELECT {mask_rules_sql('text')} AS template, count(*) AS n
FROM read_parquet('{_tpath(sf_name)}')
GROUP BY 1"""

    # footer-only storage audit: per-file rows / row groups / column
    # chunks / byte totals from DuckDB's parquet metadata functions —
    # mirrors functions/storage.storage_profile (pyarrow footers)
    q["storage_profile"] = f"""
WITH f AS (SELECT file_name, CAST(num_rows AS BIGINT) AS n_rows,
                  CAST(num_row_groups AS BIGINT) AS n_row_groups
           FROM parquet_file_metadata('{_tpath(sf_name)}')),
c AS (SELECT file_name, CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(total_compressed_size) AS BIGINT)
               AS compressed_bytes,
             CAST(sum(total_uncompressed_size) AS BIGINT)
               AS uncompressed_bytes
      FROM parquet_metadata('{_tpath(sf_name)}') GROUP BY 1)
SELECT regexp_extract(f.file_name, '[^/]+$') AS fname, n_rows,
       n_row_groups, n_chunks, compressed_bytes, uncompressed_bytes
FROM f JOIN c USING (file_name) ORDER BY fname"""

    # per-day top-5 terms, tie-break (n DESC, term ASC) — mirrors
    # functions/textstats.trending_terms
    q["trending_terms"] = f"""
WITH w AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
         CASE WHEN trim(text) = '' THEN []
              ELSE string_split_regex(lower(trim(text)), '\\s+') END
           AS words
  FROM read_parquet('{_tpath(sf_name)}')),
t AS (SELECT d, unnest(words) AS term FROM w),
c AS (SELECT d, term, CAST(count(*) AS BIGINT) AS n
      FROM t GROUP BY 1, 2),
r AS (SELECT d, term, n,
             row_number() OVER (PARTITION BY d
                                ORDER BY n DESC, term) AS rank
      FROM c)
SELECT d, CAST(rank AS BIGINT) AS rank, term, n
FROM r WHERE rank <= 5 ORDER BY d, rank"""

    # new-template alarm: per day, distinct templates + first-ever-seen
    # templates — mirrors functions/templates.template_novelty
    q["template_novelty"] = f"""
WITH p AS (
  SELECT DISTINCT {mask_rules_sql('text')} AS template,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
  FROM read_parquet('{_tpath(sf_name)}')),
f AS (SELECT template, min(d) AS fd FROM p GROUP BY 1)
SELECT p.d, CAST(count(*) AS BIGINT) AS n_templates,
       CAST(sum(CASE WHEN f.fd = p.d THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new
FROM p JOIN f ON p.template = f.template
GROUP BY p.d ORDER BY p.d"""

    # log₂-bucketed gap histogram: bin = #powers-of-two ≤ gap (exact
    # integer bit length — mirrors the engine's frexp exponent)
    q["gap_hist"] = f"""
WITH b AS (
  SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER
           (PARTITION BY conv_id ORDER BY turn_idx) AS g
  FROM read_parquet('{_tpath(sf_name)}')),
g2 AS (
  SELECT g, CASE WHEN g > 0 THEN
      (SELECT count(*) FROM range(0, 63) t(j)
       WHERE (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) <= g)
    ELSE 0 END AS bin
  FROM b WHERE g IS NOT NULL)
SELECT bin, CAST(count(*) AS BIGINT) AS n,
       CAST(min(g) AS BIGINT) AS min_gap_us,
       CAST(max(g) AS BIGINT) AS max_gap_us
FROM g2 GROUP BY bin ORDER BY bin"""

    # conversation-length skew profile: histogram-exact integer Gini
    # (same cell-folded formula as the engine), quantile_disc median
    q["conv_skew"] = f"""
WITH c AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS len
           FROM read_parquet('{_tpath(sf_name)}') GROUP BY conv_id),
h AS (SELECT len, CAST(count(*) AS BIGINT) AS cnt FROM c GROUP BY len),
o AS (SELECT len, cnt,
             COALESCE(sum(cnt) OVER (ORDER BY len
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum
      FROM h),
s AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(len) AS BIGINT) AS tot,
             CAST(min(len) AS BIGINT) AS mn,
             CAST(max(len) AS BIGINT) AS mx,
             CAST(quantile_disc(len, 0.5) AS BIGINT) AS med
      FROM c),
g AS (SELECT CAST(sum(len * (2 * cnt * cum + cnt * (cnt + 1)
                             - cnt * (s.n + 1))) AS BIGINT) AS num
      FROM o, s GROUP BY s.n)
SELECT s.n AS n_convs, s.tot AS total_turns, s.mn AS min_len,
       s.mx AS max_len, s.med AS median_len,
       CAST((1000000 * g.num) // (s.n * s.tot) AS BIGINT) AS gini_ppm
FROM s, g"""

    # market-basket tool co-occurrence: distinct-pair self-join
    q["tool_cooccurrence"] = f"""
WITH e AS (
  SELECT DISTINCT conv_id, tool
  FROM read_parquet('{_tpath(sf_name)}')
  WHERE tool IS NOT NULL AND tool <> '')
SELECT a.tool AS tool_a, b.tool AS tool_b,
       CAST(count(*) AS BIGINT) AS n
FROM e a JOIN e b ON a.conv_id = b.conv_id AND a.tool < b.tool
GROUP BY 1, 2 ORDER BY 1, 2"""

    # one PageRank step over the conv→tool graph: exact lcm-integer
    # 1/outdeg shares (functions/graph.MASS_UNIT = lcm(1..15))
    q["pagerank_tools"] = f"""
WITH e AS (
  SELECT DISTINCT conv_id, tool
  FROM read_parquet('{_tpath(sf_name)}')
  WHERE tool IS NOT NULL AND tool <> ''),
deg AS (SELECT conv_id, count(*) AS outdeg FROM e GROUP BY conv_id)
SELECT e.tool AS node,
       CAST(sum(360360 // deg.outdeg) AS BIGINT) AS in_mass,
       CAST(count(*) AS BIGINT) AS n_sources
FROM e JOIN deg USING (conv_id)
GROUP BY 1 ORDER BY 1"""

    # Markov anomaly score per conversation: Laplace-smoothed global
    # role-transition log-probs, each term rounded to int64 micro-units
    # BEFORE the per-conv sum (order-independent) — mirrors
    # queries.q_conv_loglik
    q["conv_loglik"] = f"""
WITH b AS (
  SELECT conv_id,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS f,
         role AS t
  FROM read_parquet('{_tpath(sf_name)}')),
tr AS (SELECT conv_id, f, t FROM b WHERE f IS NOT NULL),
g AS (SELECT f, t, CAST(count(*) AS BIGINT) AS c FROM tr GROUP BY 1, 2),
fz AS (SELECT f, CAST(sum(c) AS BIGINT) AS cf FROM g GROUP BY 1),
nr AS (SELECT CAST(count(DISTINCT role) AS BIGINT) AS r
       FROM read_parquet('{_tpath(sf_name)}')),
term AS (SELECT g.f, g.t,
                CAST(round(ln(CAST(g.c + 1 AS DOUBLE)
                              / CAST(fz.cf + nr.r AS DOUBLE))
                           * 1000000) AS BIGINT) AS lm
         FROM g JOIN fz USING (f), nr)
SELECT tr.conv_id, CAST(count(*) AS BIGINT) AS n_trans,
       CAST(sum(term.lm) AS BIGINT) AS loglik_micro
FROM tr JOIN term ON tr.f = term.f AND tr.t = term.t
GROUP BY 1"""

    # length-3 tool-subsequence counts (non-tool turns skipped, order by
    # turn_idx within conv) — mirrors queries.q_frequent_sequences
    q["frequent_sequences"] = f"""
WITH s AS (
  SELECT conv_id, tool,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY turn_idx) AS rn
  FROM read_parquet('{_tpath(sf_name)}')
  WHERE tool IS NOT NULL AND tool <> ''),
l AS (SELECT conv_id, tool AS t1,
             lead(tool, 1) OVER (PARTITION BY conv_id ORDER BY rn) AS t2,
             lead(tool, 2) OVER (PARTITION BY conv_id ORDER BY rn) AS t3
      FROM s)
SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
FROM l WHERE t3 IS NOT NULL GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

    # two-sample KS statistic between user/assistant text lengths:
    # exact int64 numerator over the bounded length-value domain and a
    # float-free half-up micro ratio — mirrors queries.q_ks_lengths
    q["ks_lengths"] = f"""
WITH t AS (
  SELECT role, length(text) AS v
  FROM read_parquet('{_tpath(sf_name)}')
  WHERE role IN ('user', 'assistant')),
n AS (SELECT CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)
              AS BIGINT) AS n1,
             CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
              AS BIGINT) AS n2 FROM t),
h AS (SELECT v,
             CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)
              AS BIGINT) AS c1,
             CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
              AS BIGINT) AS c2
      FROM t GROUP BY v),
c AS (SELECT sum(c1) OVER (ORDER BY v) AS f1,
             sum(c2) OVER (ORDER BY v) AS f2 FROM h),
d AS (SELECT CAST(max(abs(f1 * n.n2 - f2 * n.n1)) AS BIGINT) AS d_num
      FROM c, n GROUP BY n.n1, n.n2)
SELECT n.n1, n.n2, d.d_num,
       CAST((d.d_num * 2000000 + n.n1 * n.n2)
            // (2 * n.n1 * n.n2) AS BIGINT) AS d_micro
FROM d, n"""

    # triangles in the tool co-occurrence graph, edges gated at the
    # p75 of edge weights (quantile_disc ≡ _hist_quantile) — mirrors
    # queries.q_triangle_count
    q["triangle_count"] = f"""
WITH e AS (
  SELECT DISTINCT conv_id, tool
  FROM read_parquet('{_tpath(sf_name)}')
  WHERE tool IS NOT NULL AND tool <> ''),
p AS (SELECT a.tool AS ta, b.tool AS tb, CAST(count(*) AS BIGINT) AS n
      FROM e a JOIN e b ON a.conv_id = b.conv_id AND a.tool < b.tool
      GROUP BY 1, 2),
thr AS (SELECT quantile_disc(n, 0.75) AS t FROM p),
g AS (SELECT ta, tb FROM p, thr WHERE n >= thr.t)
SELECT x.ta AS t1, x.tb AS t2, y.tb AS t3
FROM g x JOIN g y ON y.ta = x.tb
JOIN g z ON z.ta = x.ta AND z.tb = y.tb
ORDER BY 1, 2, 3"""

    # per-conv tool-usage Shannon entropy, term-wise micro rounding —
    # mirrors queries.q_tool_entropy
    q["tool_entropy"] = f"""
WITH t AS (SELECT conv_id, tool
           FROM read_parquet('{_tpath(sf_name)}')
           WHERE tool IS NOT NULL AND tool <> ''),
g AS (SELECT conv_id, tool, CAST(count(*) AS BIGINT) AS c
      FROM t GROUP BY 1, 2),
tot AS (SELECT conv_id, CAST(sum(c) AS BIGINT) AS tt FROM g
        GROUP BY 1),
terms AS (SELECT g.conv_id,
                 CAST(round(-(CAST(c AS DOUBLE) / tt)
                            * ln(CAST(c AS DOUBLE) / tt)
                            * 1000000) AS BIGINT) AS lm
          FROM g JOIN tot USING (conv_id))
SELECT tot.conv_id, tot.tt AS n_tool_turns,
       CAST(sum(terms.lm) AS BIGINT) AS entropy_micro
FROM terms JOIN tot USING (conv_id) GROUP BY 1, 2"""

    # top-1 next-tool prediction accuracy of the bigram tool model,
    # ties → lexicographically smallest — mirrors
    # queries.q_tool_next_accuracy
    q["tool_next_accuracy"] = f"""
WITH s AS (
  SELECT conv_id, tool,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY turn_idx) AS rn
  FROM read_parquet('{_tpath(sf_name)}')
  WHERE tool IS NOT NULL AND tool <> ''),
bg AS (SELECT a.tool AS f, b.tool AS t
       FROM s a JOIN s b ON b.conv_id = a.conv_id
                        AND b.rn = a.rn + 1),
g AS (SELECT f, t, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY 1, 2),
p AS (SELECT f, t, n,
             row_number() OVER (PARTITION BY f
                                ORDER BY n DESC, t ASC) AS rk,
             CAST(sum(n) OVER (PARTITION BY f) AS BIGINT) AS tot
      FROM g)
SELECT f AS from_tool, t AS predicted, tot AS n_total, n AS n_correct,
       CAST((n * 2000000 + tot) // (2 * tot) AS BIGINT) AS acc_micro
FROM p WHERE rk = 1 ORDER BY 1"""

    # assistant/user verbosity ratio per conv, half-up micro, convs
    # with both roles and user_chars > 0 — mirrors
    # queries.q_response_ratio
    q["response_ratio"] = f"""
WITH t AS (SELECT conv_id, role, CAST(length(text) AS BIGINT) AS ch
           FROM read_parquet('{_tpath(sf_name)}')
           WHERE role IN ('user', 'assistant')),
g AS (SELECT conv_id,
             CAST(sum(CASE WHEN role = 'user' THEN ch ELSE 0 END)
                  AS BIGINT) AS user_chars,
             CAST(sum(CASE WHEN role = 'assistant' THEN ch ELSE 0 END)
                  AS BIGINT) AS asst_chars,
             count(DISTINCT role) AS nr
      FROM t GROUP BY 1)
SELECT conv_id, user_chars, asst_chars,
       CAST((asst_chars * 2000000 + user_chars)
            // (2 * user_chars) AS BIGINT) AS ratio_micro
FROM g WHERE nr = 2 AND user_chars > 0"""

    # user→assistant adjacent-turn SFT pairs — mirrors
    # queries.q_sft_pairs
    q["sft_pairs"] = f"""
WITH t AS (
  SELECT conv_id, turn_idx, role, text,
         lead(role) OVER (PARTITION BY conv_id
                          ORDER BY turn_idx) AS nrole,
         lead(text) OVER (PARTITION BY conv_id
                          ORDER BY turn_idx) AS ntext
  FROM read_parquet('{_tpath(sf_name)}'))
SELECT conv_id, turn_idx, text AS prompt, ntext AS response
FROM t WHERE role = 'user' AND nrole = 'assistant'"""

    return q
