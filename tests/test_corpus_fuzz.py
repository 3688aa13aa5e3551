"""Seeded randomized-corpus parity fuzz: the text/dedup operators must
match their DuckDB oracles on corpora the fixed testdata never shows
them — unicode words, punctuation-glued tokens, single-word and
whitespace-only documents, exact and near duplicates.

Deterministic (seeded PRNG, no hypothesis shrink loops) so a failure
reproduces byte-for-byte. Characters are chosen to keep the engines'
regex/casefold semantics aligned: no vertical-tab (Java \\s includes
\\x0B, RE2's does not) and no Turkish dotted-I (locale-sensitive
casefold) — those are DOCUMENTED engine-boundary exclusions, not bugs.
"""

import glob
import random

import duckdb
import pytest

from sfguide_getting_started_openflow_postgresql_cdc_spark.operators import (
    ORACLES,
    QUERIES,
)
from tests.oracle_harness import rows_to_canonical

VOCAB = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "café naïve Zürich São résumé "
    "数据 处理 引擎 分布式 "
    "foo-bar x.y.z a,b end. (paren) [brack] 'quo' 42 3.14 _under_ "
    "UPPER MiXeD lower"
).split()

QUERY_NAMES = [
    "tx1_token_count",
    "tx7_vocab_topk",
    "tx10_tfidf_top_terms",
    "dd1_exact_dedup",
    "dd3_ngram_jaccard_pairs",
    "dd4_minhash_lsh_pairs",
    "dd5_simhash",
]


def _corpus(seed: int) -> list[tuple]:
    rng = random.Random(seed)
    rows = []
    doc_id = 1
    langs = ["en", "de", "zh", "fr"]
    for _ in range(60):
        n = rng.choice([1, 2, 3, 5, 8, 15, 30])
        text = " ".join(rng.choice(VOCAB) for _ in range(n))
        # occasional messy whitespace between tokens
        if rng.random() < 0.3:
            text = text.replace(" ", rng.choice(["  ", " \t ", " \n "]), 1)
        rows.append((doc_id, text, rng.choice(langs), "fuzz", len(text)))
        doc_id += 1
    # degenerate shapes
    rows.append((doc_id, "", "en", "fuzz", 0)); doc_id += 1
    rows.append((doc_id, "   \t  ", "en", "fuzz", 6)); doc_id += 1
    rows.append((doc_id, "solo", "en", "fuzz", 4)); doc_id += 1
    # exact duplicates + a near-duplicate pair
    base = " ".join(rng.choice(VOCAB) for _ in range(12))
    rows.append((doc_id, base, "en", "fuzz", len(base))); doc_id += 1
    rows.append((doc_id, base, "en", "fuzz", len(base))); doc_id += 1
    near = base.rsplit(" ", 1)[0] + " changed"
    rows.append((doc_id, near, "en", "fuzz", len(near))); doc_id += 1
    return rows


@pytest.mark.parametrize("seed", [7, 1234])
def test_text_dedup_parity_on_fuzzed_corpus(spark, tmp_path, seed):
    sf_dir = str(tmp_path / f"sf_fuzz_{seed}")
    spark.createDataFrame(
        _corpus(seed),
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    con = duckdb.connect()
    files = glob.glob(f"{sf_dir}/documents.parquet/*.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet({files!r})")

    for name in QUERY_NAMES:
        sdf = QUERIES[name](spark, sf_dir)
        got = rows_to_canonical(list(sdf.columns), [tuple(r) for r in sdf.collect()])
        res = con.execute(ORACLES[name])
        want = rows_to_canonical([d[0] for d in res.description], res.fetchall())
        assert got == want, f"{name} diverged on fuzz corpus seed={seed}"
    # sanity: the corpus actually exercised dup paths
    dd1 = {r["n_copies"] for r in QUERIES["dd1_exact_dedup"](spark, sf_dir).collect()}
    assert max(dd1) >= 2  # exact dups present
