"""Deterministic synthetic web + seed derivation.

The reference crawls the real web with an instrumented Chromium
(``crawler.js:774-884``); this sandbox has no network, so the "web" is a
pure function: ``spans = f(canonical_url, wave)`` and
``outlinks = f(host, page)``.  Both the single-process oracle
(:mod:`..oracle`) and the Ray fetcher actors (:mod:`..stages.fetcher`)
call these same primitives, so per-row span-sequence equality tests the
*pipeline machinery* (dedup, ordering, scheduling, explode), which is
what this engine owns.

Seeds are derived deterministically from the driver's ``documents``
parquet table (TESTDATA.md) — a function of ``doc_id`` only — with
deliberate dirt mirroring FIXTURES.md §2: missing scheme, uppercase
scheme/host, default ports, fragments, invalid schemes, exact
duplicates, empty rows, and a hot host owning ~1/3 of seeds.  The same
derivation is emitted as SQL (:func:`seeds_sql`) for DuckDB oracles.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

from .config import CrawlConfig

# ---------------------------------------------------------------------------
# Seed derivation (pure function of documents.doc_id)

_DIRT_CLASSES = 10


def _hosts_for(doc_ids: np.ndarray, n_src_hosts: int, hot_host: str) -> np.ndarray:
    hosts = np.array(
        [f"src{i}.example" for i in doc_ids % n_src_hosts], dtype=object
    )
    hosts[doc_ids % 3 == 0] = hot_host
    return hosts


def derive_seed_urls(doc_ids: np.ndarray, cfg: CrawlConfig) -> np.ndarray:
    """doc_id -> dirty seed URL string (see module docstring for classes)."""
    d = np.asarray(doc_ids, dtype=np.int64)
    host = _hosts_for(d, cfg.n_src_hosts, cfg.hot_host)
    page = d.astype(str).astype(object)
    dirt = d % _DIRT_CLASSES
    base = host + "/page/" + page
    out = np.empty(len(d), dtype=object)
    out[dirt == 0] = base[dirt == 0]
    up = np.char.upper(host[dirt == 1].astype(str)).astype(object)
    out[dirt == 1] = "HTTP://" + up + "/page/" + page[dirt == 1]
    out[dirt == 2] = "http://" + host[dirt == 2] + ":80/page/" + page[dirt == 2]
    out[dirt == 3] = "https://" + host[dirt == 3] + ":443/page/" + page[dirt == 3]
    out[dirt == 4] = "https://" + base[dirt == 4] + "#frag"
    out[dirt == 5] = "ftp://" + base[dirt == 5]
    out[dirt == 6] = "https://" + base[dirt == 6] + "?b=2&a=1"
    dup_target = d - 7
    dup_host = _hosts_for(dup_target, cfg.n_src_hosts, cfg.hot_host)
    dup = "https://" + dup_host + "/page/" + dup_target.astype(str).astype(object)
    out[dirt == 7] = dup[dirt == 7]
    out[dirt == 8] = "https://" + base[dirt == 8]
    out[dirt == 9] = ""
    return out


def actions_for(doc_ids: np.ndarray) -> np.ndarray:
    """Deterministic per-seed action scripts (M6 action replay).

    Mirrors the reference's LoginGPT missions: ~1/5 of submissions carry
    a JSON list of click actions (``endpoints/tasks.py:96-99`` accepts
    ``actions``; ``crawler.js:636-680`` replays clickPositions).  Here:
    seeds with ``doc_id % 5 == 1`` get ``1 + doc_id % 3`` clicks at
    deterministic coordinates; everything else gets ''.  The exact JSON
    string is reproducible in SQL (:func:`actions_sql_expr`) so the
    driver's DuckDB oracle can regenerate it.
    """
    d = np.asarray(doc_ids, dtype=np.int64)
    out = np.full(len(d), "", dtype=object)
    for i in np.flatnonzero(d % 5 == 1):
        di = int(d[i])
        n_act = 1 + di % 3
        parts = [
            f'{{"x":{(di * 7 + j * 31) % 1280},"y":{(di * 13 + j * 17) % 720}}}'
            for j in range(n_act)
        ]
        out[i] = "[" + ",".join(parts) + "]"
    return out


def actions_sql_expr(d: str) -> str:
    """DuckDB SQL producing the identical actions JSON string for a
    doc_id column expression ``d`` (mirrors :func:`actions_for`)."""
    def elem(j: int) -> str:
        return (f"'{{\"x\":' || CAST((({d})*7+{j}*31) % 1280 AS VARCHAR) ||"
                f" ',\"y\":' || CAST((({d})*13+{j}*17) % 720 AS VARCHAR) || '}}'")

    return f"""(CASE WHEN ({d}) % 5 <> 1 THEN ''
        ELSE '[' || {elem(0)} ||
             (CASE WHEN ({d}) % 3 >= 1 THEN ',' || {elem(1)} ELSE '' END) ||
             (CASE WHEN ({d}) % 3 >= 2 THEN ',' || {elem(2)} ELSE '' END) ||
        ']' END)"""


def seeds_table(doc_ids: np.ndarray, cfg: CrawlConfig) -> pa.Table:
    """Seed table shaped like SEEDS_SCHEMA from a doc_id vector."""
    urls = derive_seed_urls(doc_ids, cfg)
    return pa.table(
        {
            "seed_id": pa.array(np.asarray(doc_ids, dtype=np.int64)),
            "url": pa.array(urls, type=pa.string()),
            "scan_domain": pa.array(
                _hosts_for(np.asarray(doc_ids), cfg.n_src_hosts, cfg.hot_host),
                type=pa.string(),
            ),
            "task_id": pa.array([f"task-{i}" for i in doc_ids], type=pa.string()),
            "actions": pa.array(actions_for(doc_ids), type=pa.string()),
        }
    )


def host_sql_expr(d: str) -> str:
    """DuckDB SQL mirroring _hosts_for for a doc_id column expression."""
    return (
        f"(CASE WHEN ({d}) % 3 = 0 THEN 'hot.example' "
        f"ELSE 'src' || CAST(({d}) % 20 AS VARCHAR) || '.example' END)"
    )


def seeds_sql() -> str:
    """SELECT producing the identical seed table from the documents view.

    n_src_hosts=20 and the dirt classes are hard-coded to match
    CrawlConfig defaults — assert in tests if the config changes.
    """
    h = host_sql_expr("doc_id")
    ht = host_sql_expr("doc_id - 7")
    p = "CAST(doc_id AS VARCHAR)"
    pt = "CAST(doc_id - 7 AS VARCHAR)"
    url = f"""CASE doc_id % 10
        WHEN 0 THEN {h} || '/page/' || {p}
        WHEN 1 THEN 'HTTP://' || upper({h}) || '/page/' || {p}
        WHEN 2 THEN 'http://' || {h} || ':80/page/' || {p}
        WHEN 3 THEN 'https://' || {h} || ':443/page/' || {p}
        WHEN 4 THEN 'https://' || {h} || '/page/' || {p} || '#frag'
        WHEN 5 THEN 'ftp://' || {h} || '/page/' || {p}
        WHEN 6 THEN 'https://' || {h} || '/page/' || {p} || '?b=2&a=1'
        WHEN 7 THEN 'https://' || {ht} || '/page/' || {pt}
        WHEN 8 THEN 'https://' || {h} || '/page/' || {p}
        ELSE '' END"""
    return f"SELECT doc_id AS seed_id, ({url}) AS url FROM documents"


# ---------------------------------------------------------------------------
# The synthetic web: pages, outlinks, spans

_PAGE_RE = re.compile(r"/page/(\d+)")

# API-feature vocabulary — names shaped like the reference's feature rows
# (mega_features full_name, 2_mega_vv8_postgres_schema.sql:70-78) and the
# behavioral-API families its classifier inspects
# (script_classification/.../classify.py:184-248).
FEATURE_VOCAB = (
    "Window.document",
    "Window.navigator",
    "Navigator.userAgent",
    "Navigator.plugins",
    "Document.createElement",
    "Document.cookie",
    "Element.addEventListener",
    "MouseEvent.clientX",
    "MouseEvent.clientY",
    "KeyboardEvent.key",
    "TouchEvent.touches",
    "Screen.width",
    "Screen.height",
    "CanvasRenderingContext2D.fillText",
    "HTMLCanvasElement.toDataURL",
    "AudioContext.createOscillator",
    "WebGLRenderingContext.getParameter",
    "Storage.getItem",
    "Storage.setItem",
    "XMLHttpRequest.open",
    "XMLHttpRequest.send",
    "Performance.now",
    "Date.getTime",
    "History.pushState",
    "Location.href",
    "Window.setTimeout",
    "Window.setInterval",
    "Node.appendChild",
    "EventTarget.dispatchEvent",
    "Window.requestAnimationFrame",
)
_MODES = ("g", "s", "c", "n")
_MODE_KINDS = ("get", "set", "call", "new")

# Script provenance model (1_postgres_schema.sql:126-133 script_genesis):
# the first script of a page is 'static'; later scripts draw a genesis
# deterministically, and eval/insert-class scripts name the previous
# script as their parent — giving the parser a real eval-chain to
# attribute (VERDICT r1 missing-item #2).
GENESIS_KINDS = ("static", "eval", "include", "insert",
                 "write_include", "write_insert")

# Event-handler trigger repertoire (M7): the reference fires these
# synthetic events on every page after load, each under its own timeout
# (crawler.js:280-420 executeWithTimeout calls; budgets in ms).  A
# trigger span records the virtual duration, or 'timeout' when the
# deterministic duration exceeds the budget (the trigger is abandoned);
# successful triggers of an input family fire one matching handler-API
# usage span (the handler's observable effect in the VV8 log).
TRIGGERS = (
    ("click", 10_000), ("dblclick", 10_000), ("focusblur", 240_000),
    ("mouse", 20_000), ("key", 15_000), ("copypaste", 15_000),
    ("scroll", 30_000), ("resize", 15_000), ("orientation", 5_000),
    ("touch", 15_000),
)
TRIGGER_HANDLER_API = {
    "click": "MouseEvent.clientX",
    "mouse": "MouseEvent.clientY",
    "key": "KeyboardEvent.key",
    "touch": "TouchEvent.touches",
    "scroll": "Window.requestAnimationFrame",
    "focusblur": "Element.addEventListener",
}
_PARENTED = {"eval", "insert", "write_insert"}
CREATE_TAGS = ("div", "script", "img", "iframe", "canvas", "a")


def _u64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def page_of(path: str) -> int:
    m = _PAGE_RE.search(path)
    return int(m.group(1)) if m else 0


def host_seed(host: str) -> int:
    return _u64("host:" + host)


def outlinks(host: str, page: int, cfg: CrawlConfig) -> list[str]:
    """Deterministic outlinks of a page — always scheme https, no dirt."""
    hs = host_seed(host)
    links = []
    for j in range(1, cfg.branching + 1):
        t = (page * 31 + j * 131 + hs) % cfg.page_space
        if j % 2 == 1:
            th = host
        else:
            th = f"src{(page + j) % cfg.n_src_hosts}.example"
        links.append(f"https://{th}/page/{t}")
    return links


def doc_id_for(canonical_url: str, wave: int) -> str:
    """Idempotent document id — pure function of (url, wave), mirroring the
    reference's rerun/cache semantics (endpoints/tasks.py:150-156).

    Equals the first 16 hex chars of the crawl's 128-bit url_key plus the
    wave suffix, so the fetcher derives doc ids vectorized from the key
    column it already carries (functions/urls.py:url_key128)."""
    from .functions.urls import hash128_parts

    h1, _ = hash128_parts([canonical_url])
    return f"{h1[0]:016x}-w{wave}"


_NAV_OUTCOMES = ("none", "same-page", "new-tab")


def make_spans_flat(canonical_url: str, host: str, path: str, wave: int,
                    cfg: CrawlConfig,
                    kinds: list, texts: list, medias: list,
                    did: str | None = None,
                    actions: list[tuple[int, int]] | None = None,
                    ) -> tuple[int, list[str]]:
    """Append one URL's ordered span columns to the shared flat lists.

    Columnar emission (kind/text/media_ref appended to caller-owned
    lists) so the fetcher can build the Arrow struct column directly —
    no per-span Python dicts in the hot path.  Returns (span_count,
    outlinks).  Offsets are implicit 0..n-1 per URL.  ``did`` lets the
    fetcher pass the vectorized-computed doc id; defaults to
    :func:`doc_id_for`.
    """
    h = _u64(canonical_url)
    if did is None:
        did = doc_id_for(canonical_url, wave)
    page = page_of(path)
    scheme = canonical_url.split("://", 1)[0]
    start = len(kinds)

    kinds.append("isolate"); texts.append(f"0x{h & 0xFFFF:04x}"); medias.append("")
    kinds.append("origin"); texts.append(f"{scheme}://{host}"); medias.append("")
    # Page richness mirrors real VV8 traces: a page emits thousands of
    # g/s/c/n records across several scripts (logfile.size/lines,
    # 1_postgres_schema.sql:2-10) — ~100-300 usage spans per page here.
    n_scripts = 2 + h % 4
    nv = len(FEATURE_VOCAB)
    for s in range(n_scripts):
        # VV8-style structured script record: genesis + parent ordinal
        # header, then the code (the reference's raw log packs script
        # id/parent/source into one line the same way).
        if s == 0:
            genesis, parent = "static", -1
        else:
            genesis = GENESIS_KINDS[(h >> (3 * s + 1)) % 6]
            parent = s - 1 if genesis in _PARENTED else -1
        kinds.append("script")
        texts.append(f"g={genesis};p={parent};"
                     f"function f_{page}_{s}() {{ /* {h % 997} */ }}")
        medias.append("")
        n_api = 25 + (h >> (4 * s + 4)) % 50
        for i in range(n_api):
            kinds.append(_MODE_KINDS[(h >> ((2 * i + s) & 31)) % 4])
            feat = FEATURE_VOCAB[(h * 7 + s * 13 + i * 31) % nv]
            if feat == "Document.createElement":
                # argument channel: created tag name (create_elements,
                # 1_postgres_schema.sql:148-158)
                feat = feat + ":" + CREATE_TAGS[(h + s * 7 + i) % 6]
            texts.append(feat)
            medias.append("")
    # Event-handler triggering (M7): the full per-page repertoire runs
    # after the page's own scripts, before action replay.
    for j, (name, budget) in enumerate(TRIGGERS):
        dur = ((h >> (2 * j)) * 37) % (budget + budget // 4)
        kinds.append(f"trigger/{name}")
        if dur >= budget:
            texts.append("timeout")
            medias.append("")
            continue
        texts.append(str(dur))
        medias.append("")
        api = TRIGGER_HANDLER_API.get(name)
        if api is not None:
            kinds.append(_MODE_KINDS[(h >> (j & 31)) % 4])
            texts.append(api)
            medias.append("")
    # Action replay (M6): after page load, before leaving the page —
    # mirrors crawler.js:636-680 (mouse.move/click + navigation detect).
    # Navigation outcomes are recorded in the trace but do not alter the
    # outlink graph (link following stays the frontier's job).
    if actions:
        for j, (ax, ay) in enumerate(actions):
            kinds.append("action/click"); texts.append(f"{ax},{ay}")
            medias.append("")
            kinds.append("action/nav")
            texts.append(_NAV_OUTCOMES[(h >> (2 * j)) % 3])
            medias.append("")
    links = outlinks(host, page, cfg)
    for link in links:
        kinds.append("link"); texts.append(link); medias.append("")
    kinds.append("media/screenshot"); texts.append("")
    medias.append(f"blob://{did}/shot.png")
    kinds.append("media/har"); texts.append("")
    medias.append(f"blob://{did}/har.json")
    # a third of pages carry an audio capture (interleaved text+media
    # contract: the third modality; real WAV bytes via functions/audio)
    if h % 3 == 0:
        kinds.append("media/audio"); texts.append("")
        medias.append(f"blob://{did}/clip.wav")
    # every fifth page: a frame-container video capture (fourth
    # modality; real PNG frames via functions/video)
    if h % 5 == 0:
        kinds.append("media/video"); texts.append("")
        medias.append(f"blob://{did}/cap.vid")
    return len(kinds) - start, links


def make_spans(canonical_url: str, host: str, path: str, wave: int,
               cfg: CrawlConfig,
               actions: list[tuple[int, int]] | None = None) -> list[dict]:
    """Ordered interleaved span list for one URL — the per-URL trace
    (dict form; the oracle/tests view of make_spans_flat).

    Shape mirrors the reference's per-submission bundle: VV8 log records
    (isolate/origin/script + g/s/c/n usage lines,
    ``1_postgres_schema.sql:55-82``) interleaved with action-replay
    spans (M6), screenshot and HAR artifacts
    (``vv8_worker/tasks.py:184-264``) plus 'link' spans that drive
    frontier expansion.
    """
    kinds: list = []
    texts: list = []
    medias: list = []
    make_spans_flat(canonical_url, host, path, wave, cfg, kinds, texts,
                    medias, actions=actions)
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(zip(kinds, texts, medias))
    ]


def parse_actions(actions_json: str) -> list[tuple[int, int]]:
    """'' -> []; JSON click list -> [(x, y), ...]."""
    if not actions_json:
        return []
    import json

    return [(int(a["x"]), int(a["y"])) for a in json.loads(actions_json)]


def mode_kind(mode: str) -> str:
    return {"g": "get", "s": "set", "c": "call", "n": "new"}[mode]


def robots_blocked(host: str, path: str, cfg: CrawlConfig) -> bool:
    """Robots semantics (new stage; absent in reference — its stealth
    crawler deliberately ignores robots, SURVEY.md T7).  Base tier:
    synthetic per-host prefixes; with ``cfg.robots_file``, the parsed
    RFC 9309 rules (longest-match) decide instead."""
    if cfg.robots_file:
        from .functions.robots import corpus_rules

        hr = corpus_rules(cfg.robots_file).get(host)
        return hr is not None and not hr.allowed(path)
    return any(path.startswith(pfx) for pfx in cfg.robots_disallow(host))


def _segment_arange(counts: np.ndarray) -> np.ndarray:
    """[3, 2] -> [0, 1, 2, 0, 1] (intra-segment indices)."""
    total = int(counts.sum())
    starts = np.cumsum(counts) - counts
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


# every span kind is one of these constants; the arrow kind column is a
# dictionary over this vocabulary (codes below index into it)
_KIND_VOCAB = ("isolate", "origin", "script", *_MODE_KINDS,
               *(f"trigger/{name}" for name, _ in TRIGGERS),
               "action/click", "action/nav",
               "link", "media/screenshot", "media/har", "media/audio",
               "media/video")
_KC_TRIG0 = 7
_KC_CLICK = _KC_TRIG0 + len(TRIGGERS)
_KC_NAV = _KC_CLICK + 1
_KC_LINK = _KC_NAV + 1
_KC_SHOT = _KC_LINK + 1
_KC_HAR = _KC_SHOT + 1
_KC_AUD = _KC_HAR + 1
_KC_VID = _KC_AUD + 1


def fetch_rows_arrow(urls: list[str], hosts: list[str], paths: list[str],
                     waves: list[int], cfg: CrawlConfig,
                     doc_ids: list[str] | None = None,
                     actions: list[list[tuple[int, int]]] | None = None):
    """Batch fetch, columnar: arrow span columns + per-row counts.

    Returns (kind_arr, text_arr, media_arr, span_counts, doc_ids,
    link_lists) with the three span columns already ARROW string arrays
    — the fetcher wraps them in the list<struct> column directly.
    ``doc_ids`` lets the fetcher pass vectorized-computed ids;
    ``actions`` the per-row replay scripts (M6).

    Batch-vectorized page render: every span position is computed
    analytically (numpy cumsums over the per-URL/per-script layout);
    the kind and media columns are dictionary codes over small
    vocabularies, and the text column is assembled per span family then
    interleaved with ONE arrow take over the inverse position
    permutation — the multi-million-row usage family never materializes
    Python string objects.  Byte-identical to the per-URL naive
    reference :func:`make_spans_flat` (parity-tested), which remains
    the oracle's view.  Python-int formulas that exceed 64 bits
    (``h * 37``, ``h * 7``) are rewritten with modular identities so
    uint64 numpy arithmetic cannot wrap differently.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(urls)
    if doc_ids is None:
        doc_ids = [doc_id_for(u, int(w)) for u, w in zip(urls, waves)]
    empty = pa.array([], type=pa.string())
    if n == 0:
        return empty, empty, empty, np.zeros(0, np.int64), doc_ids, []
    B = cfg.branching
    nv = len(FEATURE_VOCAB)
    h = np.array([_u64(u) for u in urls], dtype=np.uint64)
    pages = np.array([page_of(p) for p in paths], dtype=np.int64)
    n_act = np.array([len(a) if a else 0 for a in actions],
                     dtype=np.int64) if actions is not None \
        else np.zeros(n, dtype=np.int64)

    # ---- per-(url, script) table
    n_scripts = (2 + (h % 4)).astype(np.int64)
    u_of_s = np.repeat(np.arange(n, dtype=np.int64), n_scripts)
    s_idx = _segment_arange(n_scripts)
    h_s = h[u_of_s]
    n_api = (25 + ((h_s >> ((4 * s_idx + 4).astype(np.uint64))) % 50)
             ).astype(np.int64)
    total_api_u = np.zeros(n, dtype=np.int64)
    np.add.at(total_api_u, u_of_s, n_api)

    # ---- trigger layout: (n, 10) fixed shape
    tb = np.array([b for _, b in TRIGGERS], dtype=np.int64)
    tm = tb + tb // 4
    j_idx = np.arange(len(TRIGGERS), dtype=np.uint64)
    dur = ((((h[:, None] >> (2 * j_idx)[None, :])
             % tm.astype(np.uint64)).astype(np.int64)) * 37) % tm
    timeout = dur >= tb
    has_api = np.array([TRIGGERS[j][0] in TRIGGER_HANDLER_API
                        for j in range(len(TRIGGERS))])
    extra = (~timeout) & has_api[None, :]
    t_spans = 1 + extra.astype(np.int64)            # spans per trigger
    trig_total = t_spans.sum(axis=1)

    # ---- per-URL span layout
    aud = (h % np.uint64(3) == 0)        # every third page: audio span
    vid = (h % np.uint64(5) == 0)        # every fifth page: video span
    totals = (2 + n_scripts + total_api_u + trig_total + 2 * n_act + B + 2
              + aud.astype(np.int64) + vid.astype(np.int64))
    base = np.cumsum(totals) - totals
    grand = int(totals.sum())
    kind_code = np.empty(grand, dtype=np.int8)
    # text column: (positions, arrow part) pairs, interleaved at the end
    t_pos: list[np.ndarray] = []
    t_part: list = []

    # headers
    kind_code[base] = 0
    kind_code[base + 1] = 1
    t_pos.append(base)
    t_part.append(pa.array(
        np.char.mod("0x%04x", (h & 0xFFFF).astype(np.int64))))
    t_pos.append(base + 1)
    t_part.append(pa.array(
        [f"{u.split('://', 1)[0]}://{hst}"
         for u, hst in zip(urls, hosts)], type=pa.string()))

    # script spans: position = base + 2 + s + (api spans of earlier
    # scripts in the same url)
    api_cum = np.cumsum(n_api) - n_api
    first_s = np.cumsum(n_scripts) - n_scripts     # first (u,s) row per u
    api_cum_u = api_cum - api_cum[first_s][u_of_s]  # segmented excl-cumsum
    p_script = base[u_of_s] + 2 + s_idx + api_cum_u
    g_idx = ((h_s >> ((3 * s_idx + 1).astype(np.uint64))) % 6
             ).astype(np.int64)
    g_arr = np.array(GENESIS_KINDS, dtype=object)
    parented = np.array([g in _PARENTED for g in GENESIS_KINDS])
    genesis = g_arr[g_idx]
    parent = np.where(parented[g_idx], s_idx - 1, -1)
    genesis[s_idx == 0] = "static"
    parent[s_idx == 0] = -1
    mod997 = (h_s % 997).astype(np.int64)
    kind_code[p_script] = 2
    t_pos.append(p_script)
    t_part.append(pa.array(
        [f"g={g};p={p};function f_{pg}_{s}() {{ /* {m} */ }}"
         for g, p, pg, s, m in zip(
             genesis, parent, pages[u_of_s], s_idx, mod997)],
        type=pa.string()))

    # usage spans: expand each (u,s) by its n_api.  Texts are dictionary
    # codes over the (vocab + createElement:tag) table — no Python
    # strings for the dominant span family.
    us_row = np.repeat(np.arange(len(s_idx), dtype=np.int64), n_api)
    i_idx = _segment_arange(n_api)
    h_i = h_s[us_row]
    s_i = s_idx[us_row]
    kind_ix = ((h_i >> (((2 * i_idx + s_i) & 31).astype(np.uint64))) % 4
               ).astype(np.int64)
    feat_ix = (((h_i % nv).astype(np.int64) * 7 + s_i * 13 + i_idx * 31)
               % nv).astype(np.int32)
    ce = feat_ix == FEATURE_VOCAB.index("Document.createElement")
    if ce.any():
        tag_ix = (((h_i[ce] % 6).astype(np.int64) + s_i[ce] * 7
                   + i_idx[ce]) % 6)
        feat_ix[ce] = (nv + tag_ix).astype(np.int32)
    usage_vocab = pa.array(
        list(FEATURE_VOCAB)
        + [f"Document.createElement:{t}" for t in CREATE_TAGS])
    p_usage = p_script[us_row] + 1 + i_idx
    kind_code[p_usage] = (3 + kind_ix).astype(np.int8)
    t_pos.append(p_usage)
    t_part.append(pc.cast(
        pa.DictionaryArray.from_arrays(pa.array(feat_ix), usage_vocab),
        pa.string()))

    # trigger spans
    tbase = base + 2 + n_scripts + total_api_u
    p_trig = tbase[:, None] + (np.cumsum(t_spans, axis=1) - t_spans)
    kind_code[p_trig] = (_KC_TRIG0
                         + np.arange(len(TRIGGERS), dtype=np.int8))[None, :]
    t_text = np.char.mod("%d", dur).astype(object)
    t_text[timeout] = "timeout"
    t_pos.append(p_trig.ravel())
    t_part.append(pa.array(t_text.ravel(), type=pa.string()))
    if extra.any():
        hk_ix = ((h[:, None] >> j_idx[None, :]).astype(np.int64) % 4)
        api_arr = np.array([TRIGGER_HANDLER_API.get(name, "")
                            for name, _ in TRIGGERS], dtype=object)
        pe = (p_trig + 1)[extra]
        kind_code[pe] = (3 + hk_ix[extra]).astype(np.int8)
        t_pos.append(pe)
        t_part.append(pa.array(
            np.broadcast_to(api_arr, extra.shape)[extra], type=pa.string()))

    # action spans (actioned rows only; mission-bounded)
    abase = tbase + trig_total
    if n_act.any():
        a_pos: list[int] = []
        a_txt: list[str] = []
        for u in np.flatnonzero(n_act):
            hu, p = int(h[u]), int(abase[u])
            for j, (ax, ay) in enumerate(actions[u]):
                kind_code[p] = _KC_CLICK
                kind_code[p + 1] = _KC_NAV
                a_pos += (p, p + 1)
                a_txt.append(f"{ax},{ay}")
                a_txt.append(_NAV_OUTCOMES[(hu >> (2 * j)) % 3])
                p += 2
        t_pos.append(np.array(a_pos, dtype=np.int64))
        t_part.append(pa.array(a_txt, type=pa.string()))

    # link spans + per-URL link lists
    lbase = abase + 2 * n_act
    ps_mod = cfg.page_space
    hs_cache: dict[str, int] = {}
    hs_mod = np.array([hs_cache.setdefault(hst, host_seed(hst) % ps_mod)
                       for hst in hosts], dtype=np.int64)
    jj = np.arange(1, B + 1, dtype=np.int64)
    t_page = (pages[:, None] * 31 + jj[None, :] * 131
              + hs_mod[:, None]) % ps_mod
    sh_ix = (pages[:, None] + jj[None, :]) % cfg.n_src_hosts
    odd = (jj % 2 == 1)
    links_flat = [
        f"https://{hst}/page/{t}" if o else f"https://src{si}.example/page/{t}"
        for hst, trow, srow in zip(hosts, t_page, sh_ix)
        for o, t, si in zip(odd, trow, srow)]
    p_link = (lbase[:, None] + (jj - 1)[None, :]).ravel()
    kind_code[p_link] = _KC_LINK
    t_pos.append(p_link)
    t_part.append(pa.array(links_flat, type=pa.string()))

    # media spans
    p_med = lbase + B
    kind_code[p_med] = _KC_SHOT
    kind_code[p_med + 1] = _KC_HAR
    t_pos.append(p_med)
    t_part.append(pa.array([""] * n, type=pa.string()))
    t_pos.append(p_med + 1)
    t_part.append(pa.array([""] * n, type=pa.string()))
    aud_ix = np.flatnonzero(aud)
    if len(aud_ix):
        p_aud = p_med[aud_ix] + 2
        kind_code[p_aud] = _KC_AUD
        t_pos.append(p_aud)
        t_part.append(pa.array([""] * len(aud_ix), type=pa.string()))
    vid_ix = np.flatnonzero(vid)
    if len(vid_ix):
        # video follows the audio span when one is present on the page
        p_vid = p_med[vid_ix] + 2 + aud[vid_ix].astype(np.int64)
        kind_code[p_vid] = _KC_VID
        t_pos.append(p_vid)
        t_part.append(pa.array([""] * len(vid_ix), type=pa.string()))

    # text column: one inverse-permutation take interleaves the parts
    pos = np.concatenate(t_pos)
    inv = np.empty(grand, dtype=np.int64)
    inv[pos] = np.arange(grand, dtype=np.int64)
    text_arr = pa.concat_arrays(t_part).take(pa.array(inv))
    kind_arr = pc.cast(
        pa.DictionaryArray.from_arrays(pa.array(kind_code),
                                       pa.array(list(_KIND_VOCAB))),
        pa.string())

    # media column: dictionary over '' + the per-doc blob refs
    m_code = np.zeros(grand, dtype=np.int32)
    m_code[p_med] = 1 + np.arange(n, dtype=np.int32)
    m_code[p_med + 1] = 1 + n + np.arange(n, dtype=np.int32)
    if len(aud_ix):
        m_code[p_aud] = 1 + 2 * n + np.arange(len(aud_ix), dtype=np.int32)
    if len(vid_ix):
        m_code[p_vid] = (1 + 2 * n + len(aud_ix)
                         + np.arange(len(vid_ix), dtype=np.int32))
    m_vocab = pa.array(
        [""] + [f"blob://{d}/shot.png" for d in doc_ids]
        + [f"blob://{d}/har.json" for d in doc_ids]
        + [f"blob://{doc_ids[i]}/clip.wav" for i in aud_ix]
        + [f"blob://{doc_ids[i]}/cap.vid" for i in vid_ix])
    media_arr = pc.cast(
        pa.DictionaryArray.from_arrays(pa.array(m_code), m_vocab),
        pa.string())

    link_lists = [links_flat[u * B:(u + 1) * B] for u in range(n)]
    return kind_arr, text_arr, media_arr, totals, doc_ids, link_lists


def fetch_rows_flat(urls: list[str], hosts: list[str], paths: list[str],
                    waves: list[int], cfg: CrawlConfig,
                    doc_ids: list[str] | None = None,
                    actions: list[list[tuple[int, int]]] | None = None):
    """List-valued view of :func:`fetch_rows_arrow` (parity tests and
    naive-reference comparisons; the fetcher consumes the arrow form)."""
    K, T, M, counts, doc_ids, link_lists = fetch_rows_arrow(
        urls, hosts, paths, waves, cfg, doc_ids=doc_ids, actions=actions)
    return (K.to_pylist(), T.to_pylist(), M.to_pylist(), counts,
            doc_ids, link_lists)
