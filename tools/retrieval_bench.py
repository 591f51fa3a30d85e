"""Retrieval stopword fan-out: the max_df cap's effect on query cost.

Same doctrine as the dedup df-cap (BENCH/DFCAP.md): a stopword query term
joins to nearly EVERY document's posting while contributing idf weight
≈ 1000/df — negligible score, full join fan-out. This harness builds a
corpus where every doc carries a boilerplate stopword and measures the
scoring join's row volume and wall time for a mixed (stopword + rare
term) query, capped vs uncapped, at increasing corpus sizes.

Run: python tools/retrieval_bench.py [sizes...]  (markdown to stdout;
paste into BENCH/DFCAP.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F

from real_time_sliding_window_spark.operators import retrieval as R
from real_time_sliding_window_spark.session import get_spark


def corpus(spark, n: int):
    rows = [
        {"doc_id": i,
         "text": f"the quick answer item{i} value alpha beta the common"}
        for i in range(n)
    ]
    return spark.createDataFrame(pd.DataFrame(rows)).repartition(16).cache()


def fanout(df, queries, max_df):
    """Rows the query-term join materializes (pre-aggregation)."""
    post = R.postings(df)
    dfreq = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_df)
    q_terms = [
        (qid, t) for qid, text in queries for t in set(R.tokenize_query(text))
    ]
    qdf = df.sparkSession.createDataFrame(q_terms, "query_id string, term string")
    return post.join(dfreq, "term").join(F.broadcast(qdf), "term").count()


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [20000, 80000]
    queries = [("q", "the item77 alpha")]  # stopword + rare + mid terms
    spark = get_spark(app_name="retrieval-bench", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    print("| n docs | mode | join rows | sec | top-1 doc |")
    print("|---|---|---|---|---|")
    for n in sizes:
        df = corpus(spark, n)
        df.count()
        for label, cap in (("uncapped", None), ("max_df=1000", 1000)):
            rows = fanout(df, queries, cap)
            t0 = time.monotonic()
            top = R.tfidf_topk(df, queries, k=1, max_df=cap).collect()
            dt = round(time.monotonic() - t0, 2)
            top1 = top[0].doc_id if top else "-"
            print(f"| {n:,} | {label} | {rows:,} | {dt} | {top1} |")
        df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
