"""Vectorized URL kernels: canonicalize, validate, key, host-extract.

Reference semantics:
- canonicalizer: add ``https://`` when the scheme is missing, derive the
  scan domain from the netloc (``url_sender.py:93-101``);
- validator: scheme in {http, https}, non-empty netloc, non-zero length
  (``backend/app/api/api_v1/endpoints/tasks.py:27-52``);
- URL parser/stemmer columns (scheme/host/port/path, sha key) as in the
  ``urls`` dimension table (``2_mega_vv8_postgres_schema.sql:15-26``).

Everything here operates on whole Arrow arrays with ``pyarrow.compute``
(zero-copy from the object store) — no per-row Python in the hot path.
The exact same canonicalization contract is emitted as a DuckDB SQL
expression by :func:`canonical_sql_expr` so the driver's oracle and the
Ray pipeline can never drift apart.

Canonicalization contract (applied in order):
1. trim surrounding whitespace
2. prepend ``https://`` when no ``<scheme>://`` prefix is present
3. lowercase scheme and host
4. strip the ``#fragment``
5. drop default ports (``http:80``, ``https:443``)
6. empty path becomes ``/``
7. query params sorted bytewise (``?b=2&a=1`` == ``?a=1&b=2``, M2)
8. trailing whitespace stripped from the path (idempotence)
"""

from __future__ import annotations

import hashlib

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

# the one whitespace set both sides trim (see canonicalize)
_WS = " \t\n\r\x0b\x0c"
_SQL_WS = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"

_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://"

# Two independent 64-bit seeds -> a 128-bit URL key.  Collision
# probability at the 10^10-URL design point: ~10^20 / 2^129 ≈ 1.5e-19.
_KEY_SEED_A = 0x9E3779B97F4A7C15
_KEY_SEED_B = 0xC2B2AE3D27D4EB4F
_FAIL_SEED = 0xA24BAED4963EE407


def _join(*parts):
    """Element-wise concat of string arrays/scalars."""
    return pc.binary_join_element_wise(*parts, "")


def canonicalize(urls: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
    """Return dict of arrays: canonical_url, scheme, host, port, path, valid."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    # ASCII whitespace only (" \\t\\n\\r\\v\\f") — arrow
    # utf8_trim_whitespace strips ALL Unicode whitespace while DuckDB
    # trim() strips ASCII space only; an explicit char set keeps the
    # engine and the SQL oracle byte-identical (ADVICE r2)
    t = pc.utf8_trim(pc.cast(urls, pa.string()), characters=_WS)
    has_scheme = pc.match_substring_regex(t, _SCHEME_RE)
    t = pc.if_else(has_scheme, t, _join(pa.scalar("https://"), t))

    # (?s) dotall everywhere `.` appears: RE2's default `.` stops at \n,
    # so a URL with an EMBEDDED newline failed the whole-string extract
    # on the Arrow side (-> null parts) while DuckDB's regexp_extract
    # returned '' and kept parsing — splitting the engine from its
    # oracle (ADVICE r3).  With dotall on BOTH sides the two parse
    # embedded control whitespace byte-identically.
    parts = pc.extract_regex(
        t, r"(?s)^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<rest>.*)$")
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    rest = pc.struct_field(parts, "rest")
    # strip fragment
    rest = pc.replace_substring_regex(rest, r"(?s)#.*$", "")
    hp = pc.extract_regex(rest, r"(?s)^(?P<hostport>[^/]*)(?P<path>.*)$")
    hostport = pc.struct_field(hp, "hostport")
    path = pc.struct_field(hp, "path")
    host = pc.utf8_trim(
        pc.utf8_lower(pc.replace_substring_regex(hostport, r"(?s):.*$", "")),
        characters=_WS)
    port = pc.replace_substring_regex(hostport, r"^[^:]*", "")  # ':NN' or ''
    is_default = pc.or_(
        pc.and_(pc.equal(scheme, "http"), pc.equal(port, ":80")),
        pc.and_(pc.equal(scheme, "https"), pc.equal(port, ":443")),
    )
    port = pc.if_else(is_default, pa.scalar(""), port)
    path = pc.if_else(pc.equal(path, ""), pa.scalar("/"), path)
    # query-param sort (M2): '?b=2&a=1' == '?a=1&b=2' — split the query
    # off the path, sort its '&'-separated params bytewise, re-attach.
    # polars list kernels keep this fully vectorized.
    pq_df = pl.DataFrame({"p": pl.from_arrow(path)}).with_columns(
        base=pl.col("p").str.splitn("?", 2).struct.field("field_0"),
        q=pl.col("p").str.splitn("?", 2).struct.field("field_1"),
    ).with_columns(
        qs=pl.col("q").str.split("&").list.sort().list.join("&"),
    ).with_columns(
        out=pl.when(pl.col("q").is_null()).then(pl.col("p")).otherwise(
            pl.col("base") + "?" + pl.col("qs")),
    )
    path_only = pq_df["base"].to_arrow().cast(pa.string())
    query = pq_df["qs"].fill_null("").to_arrow().cast(pa.string())
    # trailing whitespace would break idempotence (the canonical output
    # must be its own fixed point under the leading trim)
    path = pc.utf8_rtrim(pq_df["out"].to_arrow().cast(pa.string()),
                         characters=_WS)
    canonical = _join(scheme, pa.scalar("://"), host, port, path)

    valid = pc.and_(
        pc.is_in(scheme, value_set=pa.array(["http", "https"])),
        pc.not_equal(host, ""),
    )
    return {
        "canonical_url": canonical,
        "scheme": scheme,
        "host": host,
        "port": port,
        "path": path,
        "path_only": path_only,
        "query": query,
        "valid": valid,
    }


def sql_url_parts(col: str) -> dict[str, str]:
    """DuckDB SQL expressions for every canonicalization output column.

    Mirrors :func:`canonicalize` step-for-step; kept next to it so the
    two implementations cannot drift.
    """
    ws = f"({_SQL_WS})"
    tcol = f"trim({col}, {ws})"
    t = f"(CASE WHEN regexp_matches({tcol}, '^[A-Za-z][A-Za-z0-9+.\\-]*://') THEN {tcol} ELSE 'https://' || {tcol} END)"
    scheme = f"lower(regexp_extract({t}, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1))"
    # (?s) mirrors the dotall Arrow patterns (embedded-newline URLs)
    rest = (f"regexp_replace(regexp_extract({t}, '(?s)://(.*)$', 1), "
            f"'(?s)#.*$', '')")
    hostport = f"regexp_extract({rest}, '^([^/]*)', 1)"
    path0 = f"regexp_replace({rest}, '^[^/]*', '')"
    pre_path = f"(CASE WHEN {path0} = '' THEN '/' ELSE {path0} END)"
    # everything after the FIRST '?' is the query (split_part would cut
    # at every '?'; substr+strpos matches the Python splitn semantics)
    path_only = (f"(CASE WHEN strpos({pre_path}, '?') > 0 "
                 f"THEN substr({pre_path}, 1, strpos({pre_path}, '?') - 1) "
                 f"ELSE {pre_path} END)")
    query0 = (f"(CASE WHEN strpos({pre_path}, '?') > 0 "
              f"THEN substr({pre_path}, strpos({pre_path}, '?') + 1) "
              f"ELSE NULL END)")
    query_sorted = f"array_to_string(list_sort(string_split({query0}, '&')), '&')"
    query = f"coalesce({query_sorted}, '')"
    path = (f"rtrim(CASE WHEN {query0} IS NULL THEN {pre_path} "
            f"ELSE {path_only} || '?' || {query_sorted} END, {ws})")
    host = f"trim(lower(regexp_replace({hostport}, '(?s):.*$', '')), {ws})"
    port0 = f"regexp_replace({hostport}, '^[^:]*', '')"
    port = (
        f"(CASE WHEN {port0} = '' OR ({scheme} = 'http' AND {port0} = ':80') "
        f"OR ({scheme} = 'https' AND {port0} = ':443') THEN '' ELSE {port0} END)"
    )
    return {
        "scheme": scheme,
        "host": host,
        "port": port,
        "path": path,
        "path_only": path_only,
        "query": query,
        "canonical_url": f"({scheme} || '://' || {host} || {port} || {path})",
        "valid": f"({scheme} IN ('http','https') AND {host} <> '')",
    }


# Two-level public suffixes recognized by the simplified eTLD+1 rule
# (a real deployment drops in the full public-suffix list; the RULE —
# last label count depends on the suffix — is what the pipeline
# exercises).  Mirrors urls.url_etld1, 2_mega_vv8_postgres_schema.sql:15-26.
TWO_LEVEL_SUFFIXES = ("co.uk", "org.uk", "gov.uk", "com.au", "co.jp")


def etld1(hosts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Simplified eTLD+1: last 2 host labels, or 3 when the last 2 form
    a known two-level public suffix.  Vectorized regex extracts."""
    if isinstance(hosts, pa.ChunkedArray):
        hosts = hosts.combine_chunks()
    last2 = pc.struct_field(
        pc.extract_regex(hosts, r"(?P<x>[^.]+\.[^.]+)$"), "x")
    last3 = pc.struct_field(
        pc.extract_regex(hosts, r"(?P<x>[^.]+\.[^.]+\.[^.]+)$"), "x")
    is2lvl = pc.is_in(last2, value_set=pa.array(list(TWO_LEVEL_SUFFIXES)))
    out = pc.if_else(is2lvl, last3, last2)
    # hosts with a single label (or no match) fall back to the host
    return pc.coalesce(out, hosts)


def etld1_sql_expr(host: str) -> str:
    """DuckDB SQL mirroring :func:`etld1` for a host expression."""
    last2 = f"regexp_extract({host}, '([^.]+\\.[^.]+)$', 1)"
    last3 = f"regexp_extract({host}, '([^.]+\\.[^.]+\\.[^.]+)$', 1)"
    suffixes = ", ".join(f"'{sfx}'" for sfx in TWO_LEVEL_SUFFIXES)
    return (f"(CASE WHEN {last2} = '' THEN {host} "
            f"WHEN {last2} IN ({suffixes}) AND {last3} <> '' THEN {last3} "
            f"ELSE {last2} END)")


def canonical_sql_expr(col: str) -> str:
    return sql_url_parts(col)["canonical_url"]


def valid_sql_expr(col: str) -> str:
    return sql_url_parts(col)["valid"]


def _as_arrow_strings(strings) -> pa.Array:
    if isinstance(strings, pa.ChunkedArray):
        return strings.combine_chunks()
    if isinstance(strings, pa.Array):
        return strings
    return pa.array(list(strings), type=pa.string())


def hash128_parts(strings) -> tuple[np.ndarray, np.ndarray]:
    """Two independent vectorized 64-bit hashes per string (uint64).

    polars' seeded xxhash over the Arrow buffer — ~14M strings/s, no
    per-row Python (measured 400x faster than the per-row hashlib loop
    this replaced).  Deterministic across processes for fixed seeds
    (asserted by tests), which the cross-parallelism crawl-order
    equality contract requires.  Deployment note: hash values are
    stable per polars build, not across polars versions — a cluster
    must pin one polars version everywhere (standard practice), and a
    crawl store's url_keys are only resumable under the version that
    wrote them.
    """
    arr = _as_arrow_strings(strings)
    s = pl.from_arrow(arr)
    h1 = s.hash(seed=_KEY_SEED_A).to_numpy().astype(np.uint64)
    h2 = s.hash(seed=_KEY_SEED_B).to_numpy().astype(np.uint64)
    return h1, h2


_HEX_LUT = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def hex_of_u64(*parts: np.ndarray) -> pa.Array:
    """Vectorized fixed-width hex encoding of one or more uint64 columns
    into a single Arrow string array (16 hex chars per part, no per-row
    Python: nibble lookup + StringArray.from_buffers)."""
    n = len(parts[0])
    stacked = np.empty((n, len(parts)), dtype=">u8")
    for j, p in enumerate(parts):
        stacked[:, j] = p
    raw = np.frombuffer(stacked.tobytes(), dtype=np.uint8)
    codes = np.empty(raw.size * 2, dtype=np.uint8)
    codes[0::2] = _HEX_LUT[raw >> 4]
    codes[1::2] = _HEX_LUT[raw & 15]
    width = 16 * len(parts)
    offsets = (np.arange(n + 1, dtype=np.int32) * width)
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(offsets.tobytes()), pa.py_buffer(codes.tobytes()))


def url_key128(strings) -> tuple[pa.Array, np.ndarray]:
    """The crawl's URL dedup key: (32-hex-char 128-bit key, routing h64).

    Returns (url_key string array, h1 as uint64 ndarray).  The reference
    keys URL dedup on the exact submitted URL string
    (``endpoints/tasks.py:148-156``); md5 is kept only for DuckDB-oracle-
    compared queries (:func:`md5_hex`) — the crawl path uses this
    vectorized 128-bit key instead.
    """
    h1, h2 = hash128_parts(strings)
    return hex_of_u64(h1, h2), h1


def fail_mask(strings) -> np.ndarray:
    """Deterministic permanent-failure predicate over URLs (vectorized).

    Mirrors the reference's permanently-failing-page model
    (``url_sender.py:242-252`` retry exhaustion): ~1/211 of URLs fail.
    The oracle calls this per-row; the fetcher per-batch.
    """
    arr = _as_arrow_strings(strings)
    h = pl.from_arrow(arr).hash(seed=_FAIL_SEED).to_numpy().astype(np.uint64)
    return (h % np.uint64(211)) == 0


_TRANSIENT_SEED = 0x7E57_AB1E_5EED_F00D


def transient_fail_mask(strings) -> np.ndarray:
    """Deterministic TRANSIENT-failure predicate over URLs (vectorized).

    Mirrors the failure class the reference's feeder retry absorbs
    (``url_sender.py:242-252`` resubmits a failed URL once): ~1/97 of
    URLs fail their first fetch attempt and succeed on the in-task
    retry.  Disjoint seed from :func:`fail_mask` (permanent failures =
    retry exhaustion); a URL in both masks fails both attempts."""
    arr = _as_arrow_strings(strings)
    h = pl.from_arrow(arr).hash(seed=_TRANSIENT_SEED).to_numpy().astype(np.uint64)
    return (h % np.uint64(97)) == 0


_ACTION_FAIL_SEED = 0x71EE5EED0C0FFEE5


def action_fail_mask(strings) -> np.ndarray:
    """Deterministic action-replay failure predicate (vectorized).

    Mirrors the reference's actions-crawl timeout/failure that triggers
    the direct-URL fallback retry (``vv8_worker/tasks.py:148-178``):
    ~1/17 of actioned URLs fail replay and are re-crawled without
    actions.
    """
    arr = _as_arrow_strings(strings)
    h = pl.from_arrow(arr).hash(seed=_ACTION_FAIL_SEED).to_numpy().astype(np.uint64)
    return (h % np.uint64(17)) == 0


def md5_hex(strings: pa.Array | pa.ChunkedArray | list[str]) -> pa.Array:
    """md5 hex digest per element — the URL-seen key (DuckDB: md5(col)).

    The reference keys URL dedup on the exact submitted URL string
    (``endpoints/tasks.py:148-156``) and scripts/urls on sha256
    (``2_mega_vv8_postgres_schema.sql:15-26``); md5 here only because it
    is the hash DuckDB ships for oracle comparison.  No vectorized Arrow
    digest kernel exists, so this is a tight Python loop over the
    (already-deduplicated, small) key column — not a hot path.
    """
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if isinstance(strings, (pa.Array,)):
        strings = strings.to_pylist()
    return pa.array(
        [hashlib.md5(s.encode()).hexdigest() if s is not None else None for s in strings],
        type=pa.string(),
    )


def key_hash64(keys_hex: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """64-bit shard-routing hash derived from the md5-hex key column.

    The first 16 hex chars of the (already computed) dedup key are the
    hash — no second digest pass.  Used to route rows to URL-seen
    shards; uniform by construction.
    """
    if isinstance(keys_hex, pa.ChunkedArray):
        keys_hex = keys_hex.combine_chunks()
    prefixes = pc.utf8_slice_codeunits(keys_hex, 0, 16)
    return np.array(
        [int(p, 16) for p in prefixes.to_pylist()], dtype=np.uint64
    )


def extract_host(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Host from a canonical URL — SQL: regexp_extract(u,'^https?://([^/:]+)',1).

    Analog of the reference's REGEXP_REPLACE host extraction
    (``production_classifier.py:446-447``).
    """
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    return pc.struct_field(
        pc.extract_regex(urls, r"^https?://(?P<host>[^/:]+)"), "host"
    )
