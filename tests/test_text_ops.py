"""Semantic pins for the repetition / feature-hash / tf-idf operators
(parity with DuckDB is covered in test_oracle_parity; these check the
operators mean what they claim)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def test_repetition_signals_semantics(ray_session):
    from geocoding_toolbox_ray import queries

    df = queries.repetition_signals_documents(SF_DIR).to_pandas()
    assert len(df) == 500
    # permilles bounded; gate has signal in both directions
    assert df["dup_token_permille"].between(0, 1000).all()
    assert df["top_bigram_permille"].between(0, 1000).all()
    assert 0 < df["keep"].sum() < len(df)
    # hand-check one doc: all-unique tokens -> dup 0; "x x x" -> dup 666
    from geocoding_toolbox_ray.functions.text import ws_tokens

    ts = ws_tokens("a b c a a")
    assert (1000 * (len(ts) - len(set(ts)))) // len(ts) == 400


def test_feature_hash_reconstructs_counts(ray_session):
    """Sum of |weight| per doc is <= token count (sign cancellation only
    ever removes mass), and every dim is in [0, K)."""
    from geocoding_toolbox_ray import queries
    from geocoding_toolbox_ray.functions.text import ws_tokens

    feats = queries.feature_hash_documents(SF_DIR).to_pandas()
    assert feats["dim"].between(0, queries.FEAT_HASH_DIMS - 1).all()
    assert (feats["weight"] != 0).all()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    ntok = docs.set_index("doc_id")["text"].map(lambda s: len(ws_tokens(s.lower())))
    mass = feats.groupby("doc_id")["weight"].apply(lambda w: int(np.abs(w).sum()))
    joined = pd.concat([mass.rename("m"), ntok.rename("n")], axis=1).fillna(0)
    assert (joined["m"] <= joined["n"]).all()


def test_tfidf_topk_scores_monotone(ray_session):
    """Top-k arrives sorted (score DESC, doc_id ASC) and every returned
    doc actually contains at least one query term."""
    from geocoding_toolbox_ray import queries
    from geocoding_toolbox_ray.functions.text import ws_tokens

    df = queries.tfidf_search_topk(SF_DIR).to_pandas()
    assert len(df) == queries.TFIDF_TOPK
    s = df["score"].to_numpy()
    assert (s[:-1] >= s[1:]).all()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet").set_index("doc_id")
    for did in df["doc_id"]:
        toks = set(ws_tokens(docs.loc[did, "text"].lower()))
        assert toks & set(queries.TFIDF_TERMS)


def test_doc_sentence_dedup_planted(ray_session):
    """The synthetic documents corpus has no repeated sentences (its
    driver parity row is trivially all-kept), so the discriminating
    behavior is pinned here: planted cross-doc and intra-doc duplicate
    sentences, engine vs the SAME oracle SQL over a constructed
    documents table."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from geocoding_toolbox_ray import oracle

    rows = [
        {"doc_id": 1, "text": "alpha beta. shared sentence. gamma"},
        {"doc_id": 2, "text": "shared sentence. delta epsilon"},      # cross-doc dup drops
        {"doc_id": 3, "text": "zeta. zeta. unique tail"},             # intra-doc dup drops
        {"doc_id": 4, "text": "shared sentence"},                     # whole doc is a dup
    ]
    # engine path over an in-memory documents source: monkeypatch _docs
    import geocoding_toolbox_ray.queries as q

    orig = q._docs
    try:
        q._docs = lambda sf_dir, columns=("doc_id", "text"): rd.from_items(rows)
        out = (
            q.doc_sentence_dedup("unused")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    finally:
        q._docs = orig

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", [(r["doc_id"], r["text"]) for r in rows]
    )
    exp = (
        con.execute(oracle.doc_sentence_dedup_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["clean_text"].tolist() == exp["clean_text"].tolist()
    assert out["n_kept"].tolist() == exp["n_kept"].tolist()
    assert out["n_dropped"].tolist() == exp["n_dropped"].tolist()
    # semantic pins, independent of the oracle
    got = out.set_index("doc_id")
    assert got.loc[1, "clean_text"] == "alpha beta. shared sentence. gamma"
    assert got.loc[2, "clean_text"] == "delta epsilon"
    assert got.loc[3, "clean_text"] == "zeta. unique tail"
    assert got.loc[4, "clean_text"] == ""
    assert got.loc[4, "n_dropped"] == 1
