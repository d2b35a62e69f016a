"""HLL sketch properties + range-join / top-k-per-group parity."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from geocoding_toolbox_ray.stages import sketch


def test_hll_accuracy_and_determinism():
    vals = np.arange(10_000, dtype=np.int64) * 7919
    regs = sketch.hll_registers(vals)
    est = sketch.hll_estimate(regs)
    assert abs(est - 10_000) / 10_000 < 0.05  # ~1.6% std error at P=12
    assert np.array_equal(regs, sketch.hll_registers(vals))


def test_hll_merge_equals_union():
    a = np.arange(0, 5000, dtype=np.int64)
    b = np.arange(2500, 7500, dtype=np.int64)
    merged = np.maximum(sketch.hll_registers(a), sketch.hll_registers(b))
    direct = sketch.hll_registers(np.concatenate([a, b]))
    assert np.array_equal(merged, direct)


@pytest.mark.parametrize("name", ["value_band_join", "top_orders_per_customer"])
def test_misc_parity(name, ray_session):
    import pandas as pd

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    res = entrymod.queries()[name](sf)
    df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    o = con.execute(entrymod.oracle_sql()[name]).df()
    key = sorted(df.columns)
    assert key == sorted(o.columns)
    a = df[key].sort_values(key).reset_index(drop=True)
    b = o[key].sort_values(key).reset_index(drop=True)
    assert a.astype(str).equals(b.astype(str)), name


def test_approx_distinct_close_to_exact(ray_session):
    import duckdb as dd

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    got = entrymod.queries()["approx_distinct_users"](sf)["approx_distinct_users"].iloc[0]
    exact = dd.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM '{sf}/events.parquet'"
    ).fetchone()[0]
    assert abs(got - exact) / max(exact, 1) < 0.15


def test_bloom_filter_properties(ray_session):
    import numpy as np
    import ray.data as rd

    from geocoding_toolbox_ray.stages.bloom import bloom_test, build_bloom

    keys = np.arange(0, 20000, 2, dtype=np.int64)  # evens present
    ds = rd.from_arrow(__import__("pyarrow").table({"k": keys}))
    bitmap, m_bits = build_bloom(ds, "k", len(keys))
    # no false negatives
    assert bloom_test(bitmap, keys, m_bits).all()
    # false-positive rate ~1% target on the absent odds
    odds = keys + 1
    fp = bloom_test(bitmap, odds, m_bits).mean()
    assert fp < 0.05


def test_redaction_patterns_parity_on_planted_pii():
    """The synthetic corpus has no PII, so the registered query exercises
    the no-match path; this test plants emails/phones/SSNs and asserts
    pandas-re and DuckDB-RE2 produce byte-identical redactions."""
    import duckdb
    import pandas as pd

    from geocoding_toolbox_ray.queries import REDACT_PATTERNS

    texts = [
        "contact me at bob.smith+x@example.co or call 801-555-1234 now",
        "ssn 123-45-6789 inline and email a@b.io end",
        "no pii here at all",
        "two mails x@y.com z@w.org and 111-22-3333",
    ]
    s = pd.Series(texts)
    for pat, rep in REDACT_PATTERNS:
        s = s.str.replace(pat, rep, regex=True)

    expr = "t"
    for pat, rep in REDACT_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    con = duckdb.connect()
    got = [
        con.execute(f"SELECT {expr} FROM (SELECT ? AS t)", [x]).fetchone()[0]
        for x in texts
    ]
    assert list(s) == got
    assert "<EMAIL>" in got[0] and "<PHONE>" in got[0]
    assert "<SSN>" in got[1]


def test_rolling_fingerprint_properties():
    from geocoding_toolbox_ray.functions.text import (
        ROLL_BASE,
        ROLL_MOD,
        rolling_fingerprint,
        rolling_fingerprint_batch,
    )
    import pandas as pd

    a = rolling_fingerprint("hello world")
    assert a == rolling_fingerprint("hello world")
    assert a != rolling_fingerprint("hello worlds")
    batch = rolling_fingerprint_batch(pd.Series(["hello world", "x", "", "héllo 𝄞"]))
    assert batch[0] == a
    assert batch[2] == 0
    assert batch[3] == rolling_fingerprint("héllo 𝄞")
    # chunk-merge identity: h_ab = (h_a * B^len(b) + h_b) mod p
    sa, sb = "hello ", "world"
    ha, hb = rolling_fingerprint(sa), rolling_fingerprint(sb)
    assert a == (ha * pow(ROLL_BASE, len(sb), ROLL_MOD) + hb) % ROLL_MOD


def test_bpe_token_parity(ray_session):
    import duckdb
    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    df = entrymod.queries()["bpe_token_count_documents"](sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    o = con.execute(entrymod.oracle_sql()["bpe_token_count_documents"]).df().sort_values("doc_id").reset_index(drop=True)
    assert df["n_bpe_tokens"].tolist() == o["n_bpe_tokens"].tolist()


def test_shuffle_and_repartition_preserve_rows(ray_session):
    """random_shuffle / repartition coverage: layout ops never change the
    row multiset."""
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.001/orders.parquet", columns=["o_orderkey"])
    base = sorted(ds.to_pandas()["o_orderkey"])
    shuffled = ds.random_shuffle(seed=7)
    assert sorted(shuffled.to_pandas()["o_orderkey"]) == base
    repart = ds.repartition(8)
    assert sorted(repart.to_pandas()["o_orderkey"]) == base


def test_ordered_prefix_sum_matches_numpy(ray_session):
    """Distributed exclusive scan == numpy cumsum over the key order,
    regardless of input block order."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geocoding_toolbox_ray.stages.scan import ordered_prefix_sum

    rng = np.random.RandomState(7)
    n = 5000
    keys = rng.permutation(n).astype(np.int64)  # scrambled input order
    vals = rng.randint(1, 50, n).astype(np.int64)
    ds = rd.from_arrow(
        pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    ).repartition(13)
    out = (
        ordered_prefix_sum(ds, "k", "v", max_key=n)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    order = np.argsort(keys)
    expect = np.concatenate([[0], np.cumsum(vals[order][:-1])])
    assert out["cum_prev"].to_numpy(np.int64).tolist() == expect.tolist()
