"""Property-based equivalence guards for dual-implementation contracts.

Two places ship more than one implementation of one semantic contract:

- `full_dedup` (exact-first pipeline, df weighted by dup multiplicity) vs
  connected components over {raw ngram pairs} ∪ {doc → exact-dup canonical}
  (a Python union-find reference here; the driver oracle is the SQL twin);
- `as_of_join_union` (union + last-value carry) vs `as_of_join`
  (interval + rank) — equal by construction of the ordering rules.

Fixed-fixture tests pin known edge cases; these Hypothesis tests sweep
randomized corpora (tiny vocabularies force natural exact/near duplicates
and equal-ts ties) so a future semantic drift in either implementation
trips the guard. Few examples, big state space per example — Spark
round-trips dominate, so depth beats count here.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from real_time_sliding_window_spark.operators import dedup
from real_time_sliding_window_spark.operators.joins import (
    as_of_join,
    as_of_join_union,
)

T0 = datetime(2024, 1, 1)

VOCAB = ["alpha", "beta", "gamma", "delta", "echo", "fox"]

doc_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=6).map(" ".join),
    min_size=2,
    max_size=14,
)


def _uf_clusters(ids, edges):
    """Min-label union-find reference: component root is the min id
    (union always parents the larger root under the smaller)."""
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    roots = {i: find(i) for i in ids}
    from collections import Counter

    sizes = Counter(roots.values())
    return sorted((i, roots[i], sizes[roots[i]]) for i in ids)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=doc_strategy)
def test_full_dedup_contract_random(spark, texts):
    """full_dedup == CC over {raw ngram pairs} ∪ {doc → exact canonical}.

    max_df=3 is deliberately tiny so random corpora regularly push shingles
    over the cap — exercising exactly the dup/boilerplate-heavy regime where
    full_dedup's semantics diverge from plain neardup_clusters(raw) (exact
    dups always cluster; pairs gated on the RAW-corpus df via weighting)."""
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    docs = spark.createDataFrame(pdf)
    piped = dedup.full_dedup(docs, min_jaccard=0.3, max_df=3).toPandas()
    raw_pairs = dedup.ngram_jaccard_pairs(
        docs, min_jaccard=0.3, max_df=3
    ).toPandas()
    edges = list(zip(raw_pairs.doc_a.astype(int), raw_pairs.doc_b.astype(int)))
    canon = pdf.groupby("text")["doc_id"].transform("min")
    edges += [
        (int(c), int(d)) for c, d in zip(canon, pdf.doc_id) if c != d
    ]
    expect = _uf_clusters(list(range(len(texts))), edges)
    got = sorted(
        map(tuple, piped[["doc_id", "cluster_id", "cluster_size"]]
            .itertuples(index=False))
    )
    assert got == expect


event_strategy = st.lists(
    st.tuples(
        st.sampled_from(["u1", "u2"]),          # key
        st.integers(min_value=0, max_value=30),  # ts offset (ties likely)
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lefts=event_strategy, rights=event_strategy)
def test_asof_union_equals_interval_random(spark, lefts, rights):
    ldf = spark.createDataFrame(pd.DataFrame({
        "user": [u for u, _ in lefts],
        "lid": range(len(lefts)),
        "ts": [T0 + timedelta(seconds=s) for _, s in lefts],
    }))
    rdf = spark.createDataFrame(pd.DataFrame({
        "user": [u for u, _ in rights],
        "rid": range(len(rights)),
        "ts": [T0 + timedelta(seconds=s) for _, s in rights],
    }))
    key = lambda p: sorted(
        map(tuple, p[sorted(p.columns)].itertuples(index=False))
    )
    for horizon in (timedelta(seconds=10), None):
        a = as_of_join(
            ldf, rdf, keys=["user"], left_ts="ts", right_ts="ts",
            horizon=horizon, tiebreakers=["rid"],
        ).toPandas()
        b = as_of_join_union(
            ldf, rdf, keys=["user"], left_ts="ts", right_ts="ts",
            horizon=horizon, tiebreakers=["rid"],
        ).toPandas()
        assert sorted(a.columns) == sorted(b.columns)
        assert key(a) == key(b)
