"""Round-3 additions: sitemap seed source, count-min sketch bounds,
recrawl scheduling policy."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://src0.example/page/1 </loc>
    <lastmod>2025-03-01</lastmod>
    <priority>0.8</priority>
  </url>
  <url><loc>https://src1.example/page/2</loc></url>
  <url>
    <loc>https://hot.example/page/3</loc>
    <lastmod>2025-04-15</lastmod>
  </url>
</urlset>
"""


def test_read_sitemap(ray_session, tmp_path):
    from visiblev8_crawler_ray.sources.readers import (read_sitemap,
                                                       union_seed_sources)

    f = tmp_path / "sitemap.xml"
    f.write_text(SITEMAP)
    df = read_sitemap(str(f)).to_pandas().sort_values("seed_id")
    assert df["seed_id"].tolist() == [0, 1, 2]
    assert df["url"].tolist() == ["https://src0.example/page/1",
                                  "https://src1.example/page/2",
                                  "https://hot.example/page/3"]
    assert df["lastmod"].tolist() == ["2025-03-01", "", "2025-04-15"]
    assert df["priority"].tolist() == [0.8, 0.5, 0.5]

    # unions with the other seed sources (D6 contract)
    g = tmp_path / "seeds.txt"
    g.write_text("https://src2.example/page/9\n")
    from visiblev8_crawler_ray.sources.readers import read_url_file
    u = union_seed_sources(read_sitemap(str(f)), read_url_file(str(g)))
    assert sorted(u.to_pandas()["url"]) == sorted(
        df["url"].tolist() + ["https://src2.example/page/9"])


def test_cms_bounds_under_collisions(ray_session, tmp_path):
    """CMS guarantees: est >= true always, and est <= true +
    eps * stream_length for the vast majority of point queries — on a
    corpus wide enough (30k unique tokens vs 4096 cells) that
    collisions are unavoidable."""
    from visiblev8_crawler_ray.pipelines.textops import (
        CMS_W, token_cms, _flat_tokens)

    rng = np.random.default_rng(11)
    # zipf-ish: token t{i} appears with skewed frequency
    toks = [f"t{i}" for i in np.clip(
        rng.zipf(1.3, size=60_000), 1, 30_000)]
    docs = pd.DataFrame({
        "doc_id": np.arange(60, dtype="int64"),
        "text": [" ".join(toks[i::60]) for i in range(60)],
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    est = token_cms(str(tmp_path), k=25)
    true = pd.Series(toks).value_counts()
    n = len(toks)
    merged = est.assign(true=est["token"].map(true))
    assert (merged["est_count"] >= merged["true"]).all()
    # the epsilon bound (e/W); deterministic seed, comfortably inside
    eps_bound = np.e / CMS_W * n
    assert (merged["est_count"] - merged["true"] <= eps_bound).all()


def test_cms_merge_is_parallelism_invariant(ray_session, tmp_path):
    """Partial matrices merge by addition: two different batch sizes
    produce the identical sketch estimates."""
    from visiblev8_crawler_ray.pipelines import textops as T

    docs = pd.DataFrame({
        "doc_id": np.arange(40, dtype="int64"),
        "text": [" ".join(f"w{j % 97}" for j in range(i, i + 50))
                 for i in range(40)],
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    a = T.token_cms(str(tmp_path), k=10)
    b = T.token_cms(str(tmp_path), k=10)
    pd.testing.assert_frame_equal(a, b)


def test_recrawl_due_policy(ray_session, tmp_path):
    """recrawl_due over a crawl: every row keeps the invariant
    due == (age_ms >= revisit_ms), ages decrease with seq, and the
    per-host intervals follow crawl_delay_ms."""
    from visiblev8_crawler_ray import synth
    from visiblev8_crawler_ray.config import CrawlConfig
    from visiblev8_crawler_ray.pipelines.crawl import (REVISIT_FACTOR,
                                                       recrawl_due, run_crawl)

    cfg = CrawlConfig(max_depth=1, max_waves=3, max_per_host_per_wave=20)
    seeds = synth.seeds_table(np.arange(50), cfg)
    run = run_crawl(seeds, cfg, str(tmp_path / "store"))
    out = recrawl_due(run.crawl_log(), cfg).to_pandas()
    assert len(out) > 0
    assert (out["due"] == (out["age_ms"] >= out["revisit_ms"])).all()
    adm = int(cfg.admission_delay_s * 1000)
    horizon = out["last_seq"].max() + 1
    assert (out["age_ms"] == (horizon - out["last_seq"]) * adm).all()
    for host, grp in out.groupby("host"):
        assert (grp["revisit_ms"]
                == REVISIT_FACTOR * cfg.crawl_delay_ms(str(host))).all()
