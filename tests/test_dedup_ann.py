"""Near-dup (MinHash/SimHash) and ANN operator behavior tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from geocoding_toolbox_ray.stages import dedup


def test_minhash_identical_docs_full_match():
    sig_a = dedup.minhash_signature("the quick brown fox jumps over the lazy dog")
    sig_b = dedup.minhash_signature("the quick brown fox jumps over the lazy dog")
    assert np.array_equal(sig_a, sig_b)


def test_minhash_similar_docs_high_overlap():
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    sig_a = dedup.minhash_signature(a)
    sig_b = dedup.minhash_signature(b)
    frac = (sig_a == sig_b).mean()
    assert frac > 0.5
    c = "completely different words entirely unrelated content here now"
    frac2 = (sig_a == dedup.minhash_signature(c)).mean()
    assert frac2 < 0.2


def test_minhash_pipeline_finds_planted_dups(ray_session):
    import ray.data as rd

    base = [
        f"document number {i} with shared boilerplate text about data processing "
        f"pipelines and distributed systems plus unique token u{i}"
        for i in range(20)
    ]
    # plant near-identical pairs (2i, 2i+1000)
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(base)]
    rows += [{"doc_id": 1000 + i, "text": base[i] + " extra"} for i in range(5)]
    docs = rd.from_items(rows)
    pairs = dedup.minhash_dup_pairs(docs, est_threshold=0.5).to_pandas()
    found = set(zip(pairs["doc_a"], pairs["doc_b"]))
    for i in range(5):
        assert (i, 1000 + i) in found


def test_simhash_hamming_zero_for_identical():
    h1 = dedup.simhash64("alpha beta gamma delta")
    h2 = dedup.simhash64("alpha beta gamma delta")
    assert h1 == h2


def test_simhash_pipeline_detects_dups(ray_session):
    import ray.data as rd

    rows = [{"doc_id": i, "text": f"totally distinct content item {i} " + "x" * i} for i in range(10)]
    rows += [{"doc_id": 100 + i, "text": rows[i]["text"]} for i in range(3)]
    pairs = dedup.simhash_dup_pairs(rd.from_items(rows), max_hamming=3).to_pandas()
    found = set(zip(pairs["doc_a"], pairs["doc_b"]))
    for i in range(3):
        assert (i, 100 + i) in found


def test_ann_quantized_vs_cosine_agree_on_top1(ray_session):
    from geocoding_toolbox_ray.stages.ann import topk_cosine, topk_quantized_dot

    sf = "/root/testdata/sf0.001"
    qd = topk_quantized_dot(sf)
    cs = topk_cosine(sf)
    # rank-1 of each query is the query vector itself under both metrics
    for qid in (0, 1, 2):
        top_q = qd[(qd["query_id"] == qid) & (qd["rank"] == 1)]["vec_id"].iloc[0]
        top_c = cs[(cs["query_id"] == qid) & (cs["rank"] == 1)]["vec_id"].iloc[0]
        assert top_q == qid or top_c == qid


def test_ann_lsh_subset_of_bruteforce(ray_session):
    from geocoding_toolbox_ray.stages.ann import topk_cosine, topk_lsh

    sf = "/root/testdata/sf0.001"
    lsh = topk_lsh(sf)
    brute = topk_cosine(sf, k=500)
    # every LSH hit is a real vector with the same sim as brute force
    merged = lsh.merge(brute, on=["query_id", "vec_id"], suffixes=("_l", "_b"))
    assert len(merged) == len(lsh)
    assert np.allclose(merged["sim_l"], merged["sim_b"])


def test_embedding_dup_pairs_finds_planted(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    base = rng.standard_normal((30, 16)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(30)]
    # plant near-duplicates: tiny perturbations of vectors 0..4
    for i in range(5):
        rows.append({"vec_id": 100 + i, "embedding": (base[i] + 0.001).tolist()})
    from geocoding_toolbox_ray.stages.dedup import embedding_dup_pairs

    pairs = embedding_dup_pairs(rd.from_items(rows), threshold=0.99).to_pandas()
    found = set(zip(pairs["vec_a"], pairs["vec_b"]))
    assert sum((i, 100 + i) in found for i in range(5)) >= 4  # LSH recall < 1


def test_embedding_planted_pairs_bruteforce_verified(ray_session):
    """The registered query plants 16 perturbed copies; brute-force cosine
    over the augmented set is the ground truth, and the banded-LSH
    operator must recover every qualifying pair (recall pinned at 1.0 for
    the planted fixture at sf0.001)."""
    import numpy as np
    import pyarrow.parquet as pq

    from geocoding_toolbox_ray import queries as q

    sf = "/root/testdata/sf0.001"
    got = q.embedding_dup_pairs(sf).to_pandas()
    found = set(zip(got["vec_a"].astype(int), got["vec_b"].astype(int)))

    # ground truth: brute-force over fixture + the same planted rows
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    aug = q._plant_near_dups(t)
    ids = np.asarray(aug["vec_id"].to_numpy(zero_copy_only=False), np.int64)
    mat = np.asarray(aug["embedding"].combine_chunks().flatten(), np.float32)
    mat = mat.reshape(len(ids), -1).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    ia, ib = np.nonzero(np.triu(sims >= 0.95, k=1))
    truth = {tuple(sorted((int(ids[a]), int(ids[b])))) for a, b in zip(ia, ib)}
    assert truth, "fixture must contain planted pairs"
    assert found == truth  # banded LSH: full recall on the planted set


def test_ann_recall_pinned(ray_session):
    from geocoding_toolbox_ray.stages.ann import ann_recall

    r = ann_recall("/root/testdata/sf0.001")
    vals = dict(zip(r["method"], r["recall_permille"]))
    # deterministic planes/centroids/data -> stable values; IVF probes 4/16
    # centroid lists, LSH restricts to the query's exact bucket
    assert vals["ivf"] >= 900
    assert vals["ivf_kmeans"] >= 900
    # multi-probe LSH on the near-uniform random fixture: genuinely-near
    # neighbors barely exist, so recall is low by data property (the
    # planted-pair test shows full recall when real signal exists)
    assert vals["lsh"] >= 150


def test_ivf_pruned_matches_scan(ray_session):
    """The list-partitioned store must return IDENTICAL rows to the
    scan-everything IVF — only the read volume differs."""
    import shutil

    from geocoding_toolbox_ray.stages.ann import (
        IVF_STORE_ROOT,
        topk_ivf,
        topk_ivf_pruned,
    )

    shutil.rmtree(IVF_STORE_ROOT, ignore_errors=True)
    sf = "/root/testdata/sf0.001"
    a = topk_ivf(sf).reset_index(drop=True)
    b = topk_ivf_pruned(sf).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # warm-cache second call hits the cached store
    b2 = topk_ivf_pruned(sf).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b2)


def test_ivf_pruned_recall_at_scale(ray_session):
    """Round-3 verdict #7: recall@10 >= 0.9 for the partition-pruned IVF
    on a corpus sized off ``orders`` at sf0.1 (150k vectors — the real
    embeddings table barely scales with sf).  Also pins pruned == scan at
    this scale."""
    from geocoding_toolbox_ray.stages.ann import (
        synthetic_embeddings_corpus,
        topk_cosine,
        topk_ivf,
        topk_ivf_pruned,
    )

    corpus = synthetic_embeddings_corpus("/root/testdata/sf0.1")
    exact = topk_cosine(corpus, 10)
    pruned = topk_ivf_pruned(corpus, 10)
    scan = topk_ivf(corpus, 10)
    pd.testing.assert_frame_equal(
        pruned.reset_index(drop=True), scan.reset_index(drop=True)
    )
    recalls = []
    for qid, g in exact.groupby("query_id"):
        truth = set(g["vec_id"])
        got = set(pruned.loc[pruned["query_id"] == qid, "vec_id"])
        recalls.append(len(truth & got) / max(len(truth), 1))
    assert float(np.mean(recalls)) >= 0.9


def test_ivf_kmeans_uses_refined_centroids(ray_session):
    """Round-3 regression pin: topk_ivf used to IGNORE its centroids
    argument, so the kmeans variant silently probed the seed quantizer."""
    from geocoding_toolbox_ray.stages.ann import (
        ivf_centroids,
        kmeans_centroids,
        topk_ivf,
        topk_ivf_kmeans,
    )

    sf = "/root/testdata/sf0.001"
    refined = kmeans_centroids(sf)
    assert not np.allclose(refined, ivf_centroids(sf))  # refinement moved them
    a = topk_ivf_kmeans(sf).reset_index(drop=True)
    b = topk_ivf(sf, centroids=refined).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_ngram_jaccard_exact_pairs(ray_session):
    """Exact operator finds the identical pair at 1000 permille, keeps the
    half-overlapping pair at >= theta, and excludes the disjoint doc."""
    import ray.data as rd

    from geocoding_toolbox_ray.stages.dedup import ngram_jaccard_exact_pairs

    docs = rd.from_items(
        [
            {"doc_id": 1, "text": "a b c d e f"},
            {"doc_id": 2, "text": "a b c d e f"},
            {"doc_id": 3, "text": "x y z w v u"},
            {"doc_id": 4, "text": "a b c d e f g h"},
        ]
    )
    out = ngram_jaccard_exact_pairs(docs, theta_permille=500).to_pandas()
    got = {(a, b): j for a, b, j in zip(out["doc_a"], out["doc_b"], out["jaccard_permille"])}
    assert got[(1, 2)] == 1000
    # docs 1 & 4: 4 shared 3-grams of union 6 -> 667 permille
    assert got[(1, 4)] == got[(2, 4)] == 667
    assert not any(3 in p for p in got)


def test_dedup_clusters_min_label(ray_session):
    import ray.data as rd

    from geocoding_toolbox_ray.stages.dedup import dedup_clusters

    # components: {1,2,3,4} (chain), {10,11}, singleton edges ignored
    pairs = rd.from_items(
        [
            {"doc_a": 1, "doc_b": 2},
            {"doc_a": 2, "doc_b": 3},
            {"doc_a": 3, "doc_b": 4},
            {"doc_a": 10, "doc_b": 11},
        ]
    )
    out = dedup_clusters(pairs).to_pandas().sort_values("doc_id")
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_dedup_clusters_chain_converges(ray_session):
    """A 5-node path needs multiple propagation rounds (label travels one
    hop per round); validates the DISTRIBUTED multi-round fixpoint +
    convergence aggregate (small_graph_edges=0 forces the bucketed path
    past the round-3 single-task fast path), and that the fast path
    produces identical labels."""
    import ray.data as rd

    from geocoding_toolbox_ray.stages.dedup import dedup_clusters

    items = [{"doc_a": i, "doc_b": i + 1} for i in range(100, 104)] + [
        {"doc_a": 200, "doc_b": 201}
    ]
    out = dedup_clusters(rd.from_items(items), small_graph_edges=0).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert all(got[i] == 100 for i in range(100, 105))
    assert got[200] == got[201] == 200
    fast = dedup_clusters(rd.from_items(items)).to_pandas()
    got_fast = dict(zip(fast["doc_id"], fast["cluster_id"]))
    assert got_fast == got


def test_minhash_extreme_skew_star_cap(ray_session):
    """> RUN_ALL_PAIRS_CAP identical docs land in one LSH bucket per band:
    the star-pair cap keeps output linear while every doc stays connected
    to the representative."""
    import ray.data as rd

    n = dedup.RUN_ALL_PAIRS_CAP + 8
    rows = [
        {"doc_id": i, "text": "identical boilerplate page content repeated verbatim"}
        for i in range(n)
    ]
    pairs = dedup.minhash_dup_pairs(rd.from_items(rows), est_threshold=0.5).to_pandas()
    # star pairs only: linear in n, all anchored at doc 0
    assert len(pairs) == n - 1
    assert (pairs["doc_a"] == 0).all()
    assert set(pairs["doc_b"]) == set(range(1, n))


def test_star_cap_oracle_parity(ray_session):
    """ADVICE r2 (medium): past RUN_ALL_PAIRS_CAP the engine emits star
    pairs only — the oracle SQL must replicate the cap bit-for-bit or any
    boilerplate-heavy corpus silently hash-fails.  Exercised with cap=4 on
    a corpus mixing a 9-doc identical run (star mode), a similar pair and
    distinct docs, for BOTH minhash and simhash."""
    import duckdb
    import ray.data as rd

    from geocoding_toolbox_ray import oracle

    cap = 4
    rows = [
        {"doc_id": i, "text": "identical boilerplate page content repeated verbatim here"}
        for i in range(9)
    ]
    rows += [
        {"doc_id": 20, "text": "the quick brown fox jumps over the lazy dog again and again today"},
        {"doc_id": 21, "text": "the quick brown fox jumps over the lazy dog again and again tomorrow"},
        {"doc_id": 30, "text": "completely different words entirely unrelated content here now"},
        {"doc_id": 31, "text": "another unique document about distributed stream processing"},
    ]
    docs_df = pd.DataFrame(rows)
    con = duckdb.connect()
    con.register("documents", docs_df)

    mh = (
        dedup.minhash_dup_pairs(rd.from_items(rows), est_threshold=0.5, cap=cap)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    mh_sql = (
        con.execute(oracle.minhash_dup_pairs_sql(cap=cap))
        .df()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(mh[sorted(mh.columns)], mh_sql[sorted(mh_sql.columns)])
    # the identical run (9 > cap) must appear as a star anchored at doc 0
    star = mh[mh["doc_b"] <= 8]
    assert len(star) == 8 and (star["doc_a"] == 0).all()

    sh = (
        dedup.simhash_dup_pairs(rd.from_items(rows), max_hamming=3, cap=cap)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    sh_sql = (
        con.execute(oracle.simhash_dup_pairs_sql(cap=cap))
        .df()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(sh[sorted(sh.columns)], sh_sql[sorted(sh_sql.columns)])


def test_shared_passage_pairs_planted(ray_session):
    """Two docs sharing one 8-token quoted passage but otherwise disjoint
    must pair up; unrelated docs must not."""
    import ray.data as rd

    quote = "the quick brown fox jumps over lazy dogs"  # 8 tokens
    rows = [
        {"doc_id": 1, "text": f"intro words here {quote} completely different tail one"},
        {"doc_id": 2, "text": f"other opening {quote} and some unrelated ending text"},
        {"doc_id": 3, "text": "nothing in common with anyone else at all here today"},
    ]
    out = dedup.shared_passage_pairs(rd.from_items(rows), w=8).to_pandas()
    assert set(zip(out["doc_a"], out["doc_b"])) == {(1, 2)}
    assert int(out["shared_windows"].iloc[0]) == 1


def test_unicode_whitespace_tokenization_parity(ray_session):
    """ADVICE r2: engine tokenization must match RE2 '[\\t\\n\\f\\r ]+'
    exactly — Python str.split() also splits U+00A0/U+2028 and re.ASCII
    \\s also matches \\x0b.  Docs containing those characters must hash
    identically in engine and oracle."""
    import duckdb
    import ray.data as rd

    from geocoding_toolbox_ray import oracle

    rows = [
        # NBSP inside: ONE token for RE2, two for str.split()
        {"doc_id": 0, "text": "alpha\xa0beta gamma delta epsilon zeta eta"},
        {"doc_id": 1, "text": "alpha\xa0beta gamma delta epsilon zeta eta theta"},
        # vertical tab: ONE token for RE2, two for re.ASCII \\s
        {"doc_id": 2, "text": "one\x0btwo three four five six seven"},
        {"doc_id": 3, "text": "one\x0btwo three four five six seven eight"},
        # line separator U+2028
        {"doc_id": 4, "text": "aa bb cc dd ee ff gg"},
        {"doc_id": 5, "text": "aa bb cc dd ee ff gg hh"},
    ]
    docs_df = pd.DataFrame(rows)
    con = duckdb.connect()
    con.register("documents", docs_df)

    for builder, q_fn in [
        (oracle.minhash_dup_pairs_sql, lambda ds: dedup.minhash_dup_pairs(ds, 0.5)),
        (oracle.simhash_dup_pairs_sql, lambda ds: dedup.simhash_dup_pairs(ds, 3)),
        (
            oracle.ngram_jaccard_exact_pairs_sql,
            lambda ds: dedup.ngram_jaccard_exact_pairs(ds, 500),
        ),
    ]:
        eng = q_fn(rd.from_items(rows)).to_pandas()
        sql = con.execute(builder()).df()
        cols = sorted(eng.columns)
        a = eng[cols].sort_values(cols).reset_index(drop=True)
        b = sql[cols].sort_values(cols).reset_index(drop=True)
        assert len(a) == len(b), (builder.__name__, len(a), len(b))
        for c in cols:
            assert a[c].tolist() == b[c].tolist(), (builder.__name__, c)


def test_kmeans_centroids_deterministic(ray_session):
    """Two runs must produce BIT-IDENTICAL centroids (the 2^-20
    quantization kills float merge-order noise) and unit-ish norms."""
    from geocoding_toolbox_ray.stages.ann import kmeans_centroids

    sf = "/root/testdata/sf0.001"
    c1 = kmeans_centroids(sf, n_iters=2)
    c2 = kmeans_centroids(sf, n_iters=2)
    assert np.array_equal(c1, c2)
    norms = np.linalg.norm(c1, axis=1)
    assert np.all(np.abs(norms - 1.0) < 1e-3)


def test_ann_ivf_subset_of_bruteforce(ray_session):
    from geocoding_toolbox_ray.stages.ann import topk_cosine, topk_ivf

    sf = "/root/testdata/sf0.001"
    ivf = topk_ivf(sf)
    brute = topk_cosine(sf, k=500)
    merged = ivf.merge(brute, on=["query_id", "vec_id"], suffixes=("_i", "_b"))
    assert len(merged) == len(ivf)  # every IVF hit is a real vector
    assert np.allclose(merged["sim_i"], merged["sim_b"])
    # the query vector itself shares its own centroid list -> rank 1 kept
    for qid in (0, 1, 2):
        top = ivf[(ivf["query_id"] == qid) & (ivf["rank"] == 1)]["vec_id"]
        assert len(top) == 1 and top.iloc[0] == qid


def test_minhash_delta_probe_cross_only_and_cap(ray_session):
    """Incremental probe: (1) pairs are strictly delta x base (never
    base-base or delta-delta); (2) a base run past the cap pairs each
    delta doc with the min base doc only; (3) oracle SQL replicates the
    cap (checked in the registry parity) — here the ENGINE semantics are
    pinned directly."""
    import duckdb
    import ray.data as rd

    txt = "identical boilerplate page content repeated verbatim"
    base_rows = [{"doc_id": i, "text": txt} for i in range(1, 10)]  # 9 base docs
    base_rows += [{"doc_id": 50, "text": "completely different unrelated words here"}]
    delta_rows = [{"doc_id": 100, "text": txt}, {"doc_id": 101, "text": txt}]

    out = dedup.minhash_delta_probe(
        rd.from_items(base_rows), rd.from_items(delta_rows), cap=4
    ).to_pandas()
    # base run of 9 > cap=4 -> each delta doc pairs ONLY with base min (1)
    assert set(zip(out["delta_doc"], out["base_doc"])) == {(100, 1), (101, 1)}
    assert (out["est_jaccard_permille"] == 1000).all()

    # uncapped: each delta doc pairs with every base run member
    out2 = dedup.minhash_delta_probe(
        rd.from_items(base_rows), rd.from_items(delta_rows)
    ).to_pandas()
    assert len(out2) == 18
    assert set(out2["delta_doc"]) == {100, 101}
    assert set(out2["base_doc"]) == set(range(1, 10))

    # oracle cap parity at cap=4 over a documents view with the same shape
    # (delta membership = doc_id % DELTA_MOD == 0 -> use ids 7/14 as delta)
    from geocoding_toolbox_ray import oracle

    con = duckdb.connect()
    rows = [(i, txt) for i in range(1, 6) if i % 7 != 0]
    rows += [(7, txt), (14, txt), (8, "another entirely different document text")]
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    got = con.execute(oracle.minhash_delta_near_dups_sql(cap=2)).df()
    assert set(zip(got["delta_doc"], got["base_doc"])) == {(7, 1), (14, 1)}
