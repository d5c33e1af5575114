"""Edge-case parity for the text-quality operator family: the synthetic
corpus has no empty docs, single-token docs, whitespace runs, or exact
duplicates, so this adversarial mini-corpus exercises the branches the
sf tables never hit — and checks them against the SAME oracle SQL the
driver runs (the `documents` view just points at the edge corpus)."""

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as R  # noqa: E402
from visiblev8_crawler_ray.pipelines import textops as T  # noqa: E402

EDGE_DOCS = pd.DataFrame(
    {
        # 0 and 97 are the benchmark slice (doc_id % 97 == 0)
        "doc_id": [0, 1, 2, 3, 4, 5, 97],
        "text": [
            "",                                     # empty: no tokens at all
            "word",                                 # single token
            "  a  b\t c  ",                         # whitespace runs + tabs
            "zz aa bb cc dd ee",                    # shares 5-gram with 97
            "x x x x x x",                          # degenerate repetition
            "only four tokens here",                # too short for 5-grams
            "pp aa bb cc dd ee qq word",            # benchmark doc
        ],
    }
)
# one exact duplicate pair for the dedup/canonicality leg
EDGE_DOCS = pd.concat(
    [EDGE_DOCS, pd.DataFrame({"doc_id": [6], "text": ["x x x x x x"]})],
    ignore_index=True,
)

NEW_OPS = ["decontaminate", "repetition_stats", "vocab_df",
           "tfidf_top_term", "curate_corpus"]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_docs")
    EDGE_DOCS.to_parquet(d / "documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def edge_con(edge_dir):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{edge_dir}/documents.parquet')"
    )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", NEW_OPS)
def test_edge_corpus_matches_oracle(name, edge_dir, edge_con):
    eng = pd.DataFrame(R.queries()[name](edge_dir))
    odf = edge_con.sql(R.oracle_sql()[name]).df()
    a, b = _norm(eng), _norm(odf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_edge_semantics(edge_dir):
    dec = T.decontaminate(edge_dir).set_index("doc_id")["contaminated"]
    # doc 3 shares "aa bb cc dd ee" with benchmark doc 97; 97 hits itself
    assert bool(dec[3]) and bool(dec[97])
    # empty / short / unrelated docs are clean
    assert not (dec[0] or dec[1] or dec[4] or dec[5])

    rep = T.repetition_stats(edge_dir).set_index("doc_id")
    assert rep.loc[4, "top_bigram_frac"] == 1.0       # all bigrams "x x"
    assert rep.loc[4, "dup_word_frac"] == pytest.approx(0.8333)
    assert rep.loc[0, "dup_word_frac"] == 1.0          # empty-doc convention
    assert rep.loc[0, "top_bigram_frac"] == 0.0
    assert rep.loc[1, "dup_word_frac"] == 0.0          # single distinct token

    cur = T.curate_corpus(edge_dir).set_index("doc_id")
    # duplicate text: min doc_id (4) is canonical, 6 is not
    assert bool(cur.loc[4, "is_canonical"]) and not bool(
        cur.loc[6, "is_canonical"])
    # everything here is far below the length band -> nothing kept
    assert not cur["kept"].any()

    tf = T.tfidf_top_term(edge_dir)
    assert 0 not in set(tf["doc_id"])                  # tokenless doc absent
    assert tf.set_index("doc_id").loc[4, "token"] == "x"
