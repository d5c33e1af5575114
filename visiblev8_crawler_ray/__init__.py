"""visiblev8_crawler_ray — a Ray-Data-native rebuild of the
aswad546/visiblev8-crawler URL-crawling + log-analytics pipeline.

The reference (see /root/reference and SURVEY.md) is a distributed task
system: FastAPI -> Celery/Redis -> per-URL browser subprocess -> Go
post-processor -> Postgres/Mongo.  This package re-expresses *what* it
computes as `ray.data.Dataset` pipelines:

- URL frontier + fetch scheduling  -> wave-loop of Dataset transforms
  (`pipelines/crawl.py`) with deterministic politeness scheduling
  (`state/politeness.py`) and sharded URL-seen actors (`state/urlseen.py`).
- Per-URL crawl document bundles   -> one row of an interleaved
  text+media span table (`schemas.DOCS_SCHEMA`).
- Log parsing / usage rollups      -> vectorized `map_batches` +
  `groupby().aggregate()` stages (`stages/parse.py`,
  `pipelines/analytics.py`).
- Training-data ops (dedup, language-ID, quality, ANN) over document /
  embedding tables (`pipelines/textops.py`, `pipelines/embeddings.py`).

No module in this package calls ``ray.init()`` — the driver, bench.py
and the pytest session fixture own the Ray session.
"""

__version__ = "0.12.0"  # 0.12: real HAR request-log payloads (har_entries)
