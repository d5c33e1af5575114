"""Arrow schemas for every table the engine reads or writes.

The reference declares its schemas in SQL DDL
(``vv8_backend_database/init/1_postgres_schema.sql``,
``2_mega_vv8_postgres_schema.sql``, ``3_vv8_backend_init.sql``) plus
duplicated ORM models.  Here each logical table gets one explicit
``pyarrow.Schema``, versioned in this module (SURVEY.md §1.4).

The central table is the interleaved text+media crawl document —
the columnar encoding of the reference's per-URL artifact bundle of
ordered VV8 log records + screenshot + HAR
(``celery_workers/vv8_worker/tasks.py:184-279``).
"""

from __future__ import annotations

import pyarrow as pa

# --------------------------------------------------------------------------
# Span kinds — mirrors VisibleV8 log record kinds (isolate/origin/script +
# g/s/c/n usage records, see 1_postgres_schema.sql:55-82) plus media spans
# for the screenshot/HAR artifacts and 'link' spans carrying outlinks.
SPAN_KINDS = (
    "isolate",
    "origin",
    "script",
    "get",
    "set",
    "call",
    "new",
    "action/click",
    "action/nav",
    "trigger/click",
    "trigger/dblclick",
    "trigger/focusblur",
    "trigger/mouse",
    "trigger/key",
    "trigger/copypaste",
    "trigger/scroll",
    "trigger/resize",
    "trigger/orientation",
    "trigger/touch",
    "link",
    "media/screenshot",
    "media/har",
    "media/audio",
    "media/video",
)

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

# Primary I/O table (driver input_hint shape): one row per crawled URL.
DOCS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# Seed list — analog of urls_100k.txt lines + candidate payloads
# (url_sender.py:52-79, backend endpoints/tasks.py:137-237).
SEEDS_SCHEMA = pa.schema(
    [
        pa.field("seed_id", pa.int64()),
        pa.field("url", pa.string()),
        pa.field("scan_domain", pa.string()),
        pa.field("task_id", pa.string()),
        pa.field("actions", pa.string()),  # JSON string or ''
    ]
)

# Frontier rows flowing through the wave loop.
FRONTIER_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),          # canonical URL
        pa.field("url_key", pa.string()),      # md5(canonical url) hex
        pa.field("host", pa.string()),
        pa.field("wave", pa.int32()),
        pa.field("depth", pa.int32()),
        pa.field("priority", pa.float64()),
        pa.field("admission_key", pa.int64()), # deterministic discovery order key
    ]
)

# Final URL-seen ledger — analog of the unique submissions.url check
# (endpoints/tasks.py:148-156).
URLSEEN_SCHEMA = pa.schema(
    [
        pa.field("url_key", pa.string()),
        pa.field("url", pa.string()),
        pa.field("first_wave", pa.int32()),
        pa.field("first_seq", pa.int64()),
    ]
)

# Crawl ledger — analog of the submissions table (3_vv8_backend_init.sql:3-20)
# plus the local sqlite client ledger (scripts/local_data_store.py:38-46).
CRAWL_LOG_SCHEMA = pa.schema(
    [
        pa.field("seq", pa.int64()),           # global crawl order
        pa.field("wave", pa.int32()),
        pa.field("host", pa.string()),
        pa.field("url", pa.string()),
        pa.field("url_key", pa.string()),
        pa.field("doc_id", pa.string()),
        pa.field("depth", pa.int32()),
        pa.field("fetch_vtime", pa.int64()),   # deterministic virtual fetch time (ms)
        pa.field("status", pa.string()),       # 'ok' | 'robots_blocked' | 'failed'
        pa.field("n_spans", pa.int32()),
        pa.field("n_links", pa.int32()),
        # in-task retries consumed (0 or 1): SURVEY.md:440's crawl_log
        # retry_count; 1 = transient first attempt (succeeded on retry)
        # or permanent failure (retry exhausted)
        pa.field("retry_count", pa.int32()),
    ]
)

# Per-wave accounting — analog of url_progress.pkl counters + status.txt
# (url_sender.py:146-167).
METRICS_SCHEMA = pa.schema(
    [
        pa.field("wave", pa.int32()),
        pa.field("admitted", pa.int64()),
        pa.field("fetched", pa.int64()),
        pa.field("deduped", pa.int64()),
        pa.field("robots_blocked", pa.int64()),
        pa.field("deferred", pa.int64()),
        pa.field("failed", pa.int64()),
        pa.field("retried", pa.int64()),  # fetches that consumed a retry
        # URLs dropped by the per-host total crawl budget (0 when
        # cfg.max_per_host_total is unset)
        pa.field("budget_dropped", pa.int64()),
    ]
)

# Parsed script records — analog of script_flow (1_postgres_schema.sql:55-69).
SCRIPTS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("script_sha", pa.string()),
        pa.field("url", pa.string()),
        pa.field("apis", pa.list_(pa.string())),
        pa.field("code", pa.string()),
    ]
)

# Exploded usage facts — analog of mega_usages / feature_usage rows
# (2_mega_vv8_postgres_schema.sql:90-98, 1_postgres_schema.sql:71-82).
USAGE_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("script_sha", pa.string()),
        pa.field("offset", pa.int32()),
        pa.field("feature", pa.string()),
        pa.field("mode", pa.string()),  # 'g' | 's' | 'c' | 'n'
    ]
)

# Synthetic web model (FIXTURES.md §3) — drives the deterministic fetcher.
HOSTS_SCHEMA = pa.schema(
    [
        pa.field("host", pa.string()),
        pa.field("robots_disallow", pa.list_(pa.string())),
        pa.field("crawl_delay_ms", pa.int32()),
        pa.field("page_count", pa.int32()),
        pa.field("link_seed", pa.int64()),
    ]
)
