"""The vectorized span parsers must equal a naive per-row reference on
docs with edge cases: usage before any script, scripts with no usage,
multi-doc batches, action spans, genesis headers, eval parents,
createElement args."""

import hashlib
import re

import pyarrow as pa

from visiblev8_crawler_ray.stages.parse import (
    explode_usage_batch,
    parse_scripts_batch,
)

_USAGE = {"get": "g", "set": "s", "call": "c", "new": "n"}
_HDR = re.compile(r"^g=([a-z_]+);p=(-?\d+);")


def _mk(doc_id, kinds_texts):
    spans = [
        {"kind": k, "text": t, "media_ref": "", "offset": i}
        for i, (k, t) in enumerate(kinds_texts)
    ]
    return doc_id, spans


DOCS = [
    _mk("d1", [("isolate", "0x1"), ("get", "early.Feature"),  # usage pre-script
               ("script", "g=static;p=-1;function a(){}"),
               ("get", "A.x"), ("call", "Document.createElement:div"),
               ("action/click", "3,4"), ("action/nav", "none"),
               ("script", "g=eval;p=0;function b(){}"),  # eval child of a()
               ("new", "B.q"),
               ("link", "https://x/1"), ("media/screenshot", "")]),
    _mk("d2", [("script", "g=static;p=-1;function c(){}"),
               ("new", "C.z"), ("set", "Document.createElement:img")]),
    _mk("d3", [("origin", "https://h"), ("get", "orphan.Only")]),  # no script
    _mk("d4", [("script", "legacy-no-header(){}"),  # genesis unknown
               ("call", "L.m")]),
]


def _batch():
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in DOCS]),
            "spans": pa.array(
                [s for _, s in DOCS],
                type=pa.list_(pa.struct(
                    [("kind", pa.string()), ("text", pa.string()),
                     ("media_ref", pa.string()), ("offset", pa.int32())])),
            ),
        }
    )


def _hdr(raw):
    m = _HDR.match(raw)
    if not m:
        return "unknown", -1, raw
    return m.group(1), int(m.group(2)), raw[m.end():]


def _sha(code):
    return hashlib.sha256(code.encode()).hexdigest()[:16]


def test_explode_usage_matches_naive():
    got = explode_usage_batch(_batch()).to_pylist()
    want = []
    for did, spans in DOCS:
        cur = ""
        for s in spans:
            if s["kind"] == "script":
                cur = _sha(_hdr(s["text"])[2])
            elif s["kind"] in _USAGE:
                feat, _, arg = s["text"].partition(":")
                want.append(dict(doc_id=did, script_sha=cur,
                                 offset=s["offset"], feature=feat, arg=arg,
                                 mode=_USAGE[s["kind"]]))
    assert got == want


def test_parse_scripts_matches_naive():
    got = parse_scripts_batch(_batch()).to_pylist()
    want = []
    for did, spans in DOCS:
        cur = None
        doc_shas = []
        for s in spans:
            if s["kind"] == "script":
                g, p, code = _hdr(s["text"])
                cur = dict(doc_id=did, script_sha=_sha(code), code=code,
                           genesis=g,
                           evaled_by=doc_shas[p] if 0 <= p < len(doc_shas) else "",
                           apis=[])
                doc_shas.append(cur["script_sha"])
                want.append(cur)
            elif s["kind"] in _USAGE and cur is not None:
                cur["apis"].append(s["text"].partition(":")[0])
    assert got == want
    # the eval chain resolved: d1's second script names the first
    d1 = [r for r in got if r["doc_id"] == "d1"]
    assert d1[1]["genesis"] == "eval" and d1[1]["evaled_by"] == d1[0]["script_sha"]


def test_simhash_vectorized_properties(ray_session):
    """Equal texts hash equal; a one-token edit stays within a few bits;
    disjoint texts differ widely."""
    import numpy as np
    import ray.data as rd

    from visiblev8_crawler_ray.pipelines.textops import SimHasher

    base = " ".join(f"tok{i}" for i in range(60))
    near = base.replace("tok7", "tokX")
    far = " ".join(f"other{i}" for i in range(60))
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                  "text": [base, base, near, far]})
    out = SimHasher()(t)
    h = np.array(out["simhash"].to_pylist(), dtype=np.int64).view(np.uint64)

    def ham(a, b):
        return bin(int(a) ^ int(b)).count("1")

    assert h[0] == h[1]
    assert ham(h[0], h[2]) <= 12
    assert ham(h[0], h[3]) >= 20


def test_minhash_batch_signatures_match_per_doc():
    """The vectorized batch signature path equals the per-doc reference
    ``signature()`` exactly, including <3-token padding and empty docs."""
    import numpy as np

    from visiblev8_crawler_ray.pipelines.textops import MinHasher

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "", "one", "one two", "a b c",
        "  leading and   multiple   spaces \t tab\nnewline ",
        "repeat repeat repeat repeat repeat",
        " ".join(f"w{i % 17}" for i in range(400)),
    ]
    mh = MinHasher()
    sig_vec = mh.batch_signatures(pa.array(texts), len(texts))
    ref = MinHasher()
    sig_ref = np.stack([ref.signature(t) for t in texts])
    assert (sig_vec == sig_ref).all()
    # band hashes: equal signatures -> equal band hash in every band
    t = pa.table({"doc_id": pa.array(range(4), type=pa.int64()),
                  "text": [texts[0], texts[0], texts[7], texts[7]]})
    out = MinHasher()(t).to_pandas().pivot(
        index="doc_id", columns="band", values="band_hash")
    assert (out.loc[0] == out.loc[1]).all()
    assert (out.loc[2] == out.loc[3]).all()
    assert (out.loc[0] != out.loc[2]).any()


def test_winnow_fingerprint_matches_naive_reference():
    """The flat-byte vectorized winnowing kernel (zero-copy arrow utf8
    buffers, W shifted-scaled lanes, reduceat min) equals a per-doc
    per-position naive rolling hash on a real corpus slice."""
    import hashlib

    import pandas as pd
    import pyarrow.parquet as pq

    from visiblev8_crawler_ray.pipelines.textops import winnow_fingerprint

    out = winnow_fingerprint("/root/testdata/sf0.001")
    df = (out.to_pandas() if hasattr(out, "to_pandas") else pd.DataFrame(out))
    col = [c for c in df.columns if c != "doc_id"][0]
    got = dict(zip(df["doc_id"], df[col]))

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    B, M, W = 257, (1 << 31) - 1, 16
    checked = 0
    for did, s in zip(t["doc_id"].to_pylist()[:120], t["text"].to_pylist()[:120]):
        b = s.encode()
        assert len(b) >= W  # fallback branch covered separately below
        want = min(
            sum(c * pow(B, W - 1 - j, M) for j, c in enumerate(b[i:i + W])) % M
            for i in range(len(b) - W + 1))
        assert got[did] == want, did
        checked += 1
    assert checked == 120


def test_winnow_fingerprint_short_doc_fallback(tmp_path):
    """Docs under W=16 bytes take the md5 fallback (first 4 digest
    bytes, big-endian — the impl's exact formula) and long docs in the
    same batch still take the rolling-hash path."""
    import hashlib

    import pandas as pd

    from visiblev8_crawler_ray.pipelines.textops import winnow_fingerprint

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["tiny", "", "x" * 40],
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    out = winnow_fingerprint(str(tmp_path))
    df = (out.to_pandas() if hasattr(out, "to_pandas") else pd.DataFrame(out))
    got = dict(zip(df["doc_id"], df["min_rolling_hash"]))
    for did, s in [(0, "tiny"), (1, "")]:
        want = int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big")
        assert got[did] == want
    B, M, W = 257, (1 << 31) - 1, 16
    b = b"x" * 40
    want2 = min(
        sum(c * pow(B, W - 1 - j, M) for j, c in enumerate(b[i:i + W])) % M
        for i in range(len(b) - W + 1))
    assert got[2] == want2


def test_simhash_md5_token_hash_matches_duckdb():
    """The token hash IS DuckDB's md5_number_lower (the SQL-gate
    contract for the simhash family)."""
    import duckdb
    import numpy as np

    from visiblev8_crawler_ray.pipelines.textops import SimHasher

    sh = SimHasher()
    toks = pa.array(["the", "a", "tok7", "", "Ünïcode"])
    got = sh._token_hashes(toks)
    want = [duckdb.sql("select md5_number_lower(?)", params=[t]).fetchone()[0]
            for t in toks.to_pylist()]
    assert got.tolist() == [w & ((1 << 64) - 1) for w in want]


def test_simhash_banding_is_exact(tmp_path, ray_session):
    """The 4x16-bit banded pair generation loses NOTHING vs brute-force
    popcount at Hamming <= 3 (pigeonhole exactness), on a corpus
    engineered with near and far pairs."""
    import numpy as np
    import pandas as pd

    from visiblev8_crawler_ray.pipelines.textops import (
        SimHasher, popcount64, simhash_near_dup)

    rng = np.random.default_rng(7)
    base = [" ".join(f"w{rng.integers(0, 40)}" for _ in range(30))
            for _ in range(12)]
    texts = []
    for t in base:
        texts.append(t)                       # identical twin -> ham 0
        texts.append(t)
        toks = t.split()
        toks[3] = "EDIT"                      # near variant
        texts.append(" ".join(toks))
    docs = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                         "text": texts})
    docs.to_parquet(tmp_path / "documents.parquet")

    got = simhash_near_dup(str(tmp_path))
    sim = SimHasher()(pa.table(docs))
    hs = sim["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
    ids = sim["doc_id"].to_numpy(zero_copy_only=False)
    i, j = np.triu_indices(len(hs), 1)
    ham = popcount64(hs[i] ^ hs[j])
    keep = ham <= 3
    want = pd.DataFrame({"doc_a": ids[i[keep]], "doc_b": ids[j[keep]],
                         "hamming": ham[keep]}).sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)
    assert len(want) >= len(base)  # the identical twins at minimum
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False)


def test_minhash_batch_jaccard_matches_per_pair():
    """The vectorized exact-Jaccard verify kernel equals the per-pair
    ``set(shingles())`` reference it replaced (VERDICT r3 #3),
    including <3-token padding, empty docs, and identical pairs."""
    import numpy as np

    from visiblev8_crawler_ray.pipelines.textops import MinHasher

    a = ["the quick brown fox jumps over the lazy dog",
         "", "one", "one two", "a b c d e f",
         "x y z shared tail words here",
         "same same same", " ".join(f"w{i % 13}" for i in range(300))]
    b = ["the quick brown fox leaps over the lazy dog",
         "", "one", "two one", "a b c d e f",
         "completely different tokens throughout",
         "same same same", " ".join(f"w{i % 11}" for i in range(300))]
    mh = MinHasher()
    got = mh.batch_jaccard(pa.array(a), pa.array(b))
    ref = MinHasher()
    exp = []
    for ta, tb in zip(a, b):
        sa, sb = set(ref.shingles(ta)), set(ref.shingles(tb))
        exp.append(len(sa & sb) / max(1, len(sa | sb)))
    assert np.allclose(got, np.array(exp), rtol=0, atol=0)


def test_vectorized_digest_matches_hashlib_and_duckdb():
    """digest_hex / md5_low64 (the DuckDB in-process kernel that
    replaced the per-row hashlib loops) are bit-identical to both
    hashlib and the SQL oracle's md5/sha256/md5_number_lower."""
    import hashlib

    import duckdb
    import numpy as np

    from visiblev8_crawler_ray.functions.util import digest_hex, md5_low64

    strs = ["", "a", "hello world", "ü ✓ unicode", "x" * 5000]
    arr = pa.array(strs + [None])
    md5 = digest_hex(arr).to_pylist()
    sha = digest_hex(arr, "sha256").to_pylist()
    lo = md5_low64(pa.array(strs))
    for i, s in enumerate(strs):
        assert md5[i] == hashlib.md5(s.encode()).hexdigest()
        assert sha[i] == hashlib.sha256(s.encode()).hexdigest()
        exp = int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little")
        assert np.uint64(lo[i].astype(np.uint64)) == np.uint64(exp)
    assert md5[-1] is None and sha[-1] is None
    con = duckdb.connect()
    t = pa.table({"s": pa.array(strs)})
    con.register("t", t)
    odf = con.execute(
        "SELECT md5(s) m, sha256(s) h, md5_number_lower(s) lo FROM t").df()
    assert list(odf["m"]) == md5[:-1]
    assert list(odf["h"]) == sha[:-1]
    assert (odf["lo"].to_numpy().astype(np.uint64)
            == lo.view(np.uint64)).all()
