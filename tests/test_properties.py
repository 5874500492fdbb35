"""Property-based tests (hypothesis) for the engine's algebraic
contracts — the invariants that must hold at ANY scale, checked over
generated inputs rather than one fixture:

- upsert last-wins: idempotent, newest-wins, key-unique (ST6);
- salted aggregation == plain aggregation (salting must be exactly
  algebraic, or skew mitigation silently corrupts results);
- minhash estimated similarity is a valid similarity (range, identity);
- quality score stays in [0, 1] for arbitrary text.

Inputs are small on purpose: these check ALGEBRA, not throughput; the
oracle suite covers volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, version, value) rows; versions may collide across keys
_row = st.tuples(
    st.integers(min_value=0, max_value=5),
    st.integers(min_value=0, max_value=100),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
)


@given(rows=st.lists(_row, min_size=1, max_size=40))
@_settings
def test_last_wins_algebra(spark, rows):
    from block_data_fetcher_spark.operators.windows import last_wins

    df = spark.createDataFrame(
        [(k, v, x, i) for i, (k, v, x) in enumerate(rows)],
        "k long, ver long, x double, rid long",
    )
    out = last_wins(df, ["k"], ["ver", "rid"]).collect()
    # one row per key
    assert len(out) == len({r.k for r in out}) == len({k for k, _, _ in rows})
    # the survivor is the max (ver, rid) row of its key
    best = {}
    for i, (k, v, x) in enumerate(rows):
        if k not in best or (v, i) > best[k][:2]:
            best[k] = (v, i, x)
    for r in out:
        assert (r.ver, r.rid, r.x) == best[r.k]
    # idempotence: applying again changes nothing
    again = last_wins(
        spark.createDataFrame(out), ["k"], ["ver", "rid"]
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
        ),
        min_size=1,
        max_size=50,
    ),
    n_salts=st.integers(min_value=1, max_value=8),
)
@_settings
def test_salted_agg_equals_plain(spark, rows, n_salts):
    from block_data_fetcher_spark.storage import salted_sum_count

    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)], "k long, v double, rid long"
    )
    salted = {
        r.k: (round(r.sum_v, 6), r.cnt)
        for r in salted_sum_count(df, ["k"], "v", n_salts, "rid").collect()
    }
    plain = {
        r.k: (round(r.s, 6), r.c)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("*").alias("c"))
        .collect()
    }
    assert salted == plain


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab cd"),
            min_size=1,
            max_size=60,
        ),
        min_size=2,
        max_size=8,
    )
)
@_settings
def test_minhash_similarity_is_valid(spark, texts):
    from block_data_fetcher_spark.functions.hashing import minhash_pairs

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for r in minhash_pairs(docs).collect():
        assert 0.0 <= r.est_sim <= 1.0
        assert r.doc_a < r.doc_b
    # identical texts in the same bucket estimate similarity 1
    dup = spark.createDataFrame(
        [(0, "x y z w v"), (1, "x y z w v")], "doc_id long, text string"
    )
    pairs = minhash_pairs(dup).collect()
    assert len(pairs) == 1 and pairs[0].est_sim == 1.0


@given(
    texts=st.lists(
        st.text(alphabet=st.sampled_from("the quick brown fox. "), min_size=1, max_size=80),
        min_size=1,
        max_size=6,
    )
)
@_settings
def test_quality_score_bounded(spark, texts):
    from block_data_fetcher_spark.functions.text import quality_score

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for r in df.select(quality_score("text").alias("q")).collect():
        assert 0.0 <= r.q <= 1.0
