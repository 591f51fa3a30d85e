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


def _py_shingles(text: str, k: int = 3) -> set[str]:
    """Mirror of columns.word_shingles + array_distinct: word k-grams with
    1-based inclusive slicing; short docs yield one (short) shingle."""
    words = text.split(" ")
    n = max(len(words) - k + 1, 1)
    return {" ".join(words[i : i + k]) for i in range(n)}


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=doc_strategy)
def test_ngram_cap_equals_capfree_restricted_random(spark, texts):
    """VERDICT r02 #8: capped ngram pairs == cap-free pairs restricted to
    pairs sharing ≥1 sub-threshold shingle, with (inter, union, jaccard)
    IDENTICAL on survivors — the cap may only prune boilerplate-only pairs,
    never change a reported value. max_df=2 on a 6-word vocabulary pushes
    shingles over the cap in nearly every random corpus."""
    max_df = 2
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    docs = spark.createDataFrame(pdf)
    capped = dedup.ngram_jaccard_pairs(
        docs, min_jaccard=0.3, max_df=max_df
    ).toPandas()
    free = dedup.ngram_jaccard_pairs(
        docs, min_jaccard=0.3, max_df=None
    ).toPandas()

    sh = {int(i): _py_shingles(t) for i, t in zip(pdf.doc_id, pdf.text)}
    df_count = {}
    for s_set in sh.values():
        for s in s_set:
            df_count[s] = df_count.get(s, 0) + 1
    shares_rare = lambda a, b: any(
        df_count[s] <= max_df for s in sh[a] & sh[b]
    )
    key = lambda p: sorted(
        (int(r.doc_a), int(r.doc_b), int(r.inter), int(r.union_sz),
         round(float(r.jaccard), 9))
        for r in p.itertuples(index=False)
    )
    expect = [
        row for row in key(free) if shares_rare(row[0], row[1])
    ]
    assert key(capped) == expect


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=doc_strategy)
def test_simhash_banding_invariance_random(spark, texts):
    """VERDICT r02 #8: the 4x15-bit banded equi-join returns EXACTLY the
    hamming<=3 pairs a brute-force O(n²) scan over the same fingerprints
    finds (pigeonhole: <=3 differing bits cannot touch all 4 bands) — the
    banding is a pure physical-plan optimization, never a recall change."""
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    docs = spark.createDataFrame(pdf)
    fp = (
        dedup.simhash_fingerprints(docs)
        .select("doc_id", "simhash")
        .toPandas()
        .set_index("doc_id")["simhash"]
        .to_dict()
    )
    brute = sorted(
        (a, b, bin(fp[a] ^ fp[b]).count("1"))
        for a in fp
        for b in fp
        if a < b and bin(fp[a] ^ fp[b]).count("1") <= 3
    )
    banded = dedup.simhash_neardup_pairs(
        docs, max_hamming=3, max_bucket=None
    ).toPandas()
    got = sorted(
        (int(r.doc_a), int(r.doc_b), int(r.hamming))
        for r in banded.itertuples(index=False)
    )
    assert got == brute


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


def test_asof_null_permutation_lefts_distinct_ids(spark):
    """ADVICE r03: xxhash64 skips null inputs, so left rows that are
    null-permutations of each other — (NULL,'x') vs ('x',NULL) — hashed
    identically and the rn disambiguator permuted NON-identical rows
    under stage retry. With null indicators interleaved into the hash,
    both rows flow through as_of_join, each exactly once, with the
    correct per-row match."""
    ldf = spark.createDataFrame(pd.DataFrame({
        "user": ["u1", "u1"],
        "a": [None, "x"],
        "b": ["x", None],
        "ts": [T0 + timedelta(seconds=5), T0 + timedelta(seconds=9)],
    }))
    rdf = spark.createDataFrame(pd.DataFrame({
        "user": ["u1", "u1"],
        "rid": [1, 2],
        "ts": [T0 + timedelta(seconds=4), T0 + timedelta(seconds=8)],
    }))
    out = as_of_join(
        ldf, rdf, keys=["user"], left_ts="ts", right_ts="ts",
        tiebreakers=["rid"],
    ).toPandas()
    assert len(out) == 2
    match = {
        (row.l_a, row.l_b): row.r_rid for row in out.itertuples()
    }
    assert match[(None, "x")] == 1  # ts=5 -> latest right at ts=4
    assert match[("x", None)] == 2  # ts=9 -> latest right at ts=8
