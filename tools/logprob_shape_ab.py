"""A/B the r14 logprob plan fixes (VERDICT r13 #3 follow-through).

unigram_logprob: the r13 shape let the V-sized vocabulary feed two
consumers un-cut, duplicating the corpus explode+aggregate subtree
(2 extra corpus scans); r14 lazily checkpoints it (1 visible FileScan).
bigram_logprob: the r13 shape formed bigrams with a positional
self-join and let every count frame's subtree duplicate inline (8
corpus FileScans); r14 forms pairs off the token array with a Catalyst
transform (no self-join) and derives every statistic from ONE
checkpointed pair-count aggregate (1 visible FileScan, 2 total corpus
passes).

This tool measures old vs new, interleaved same-session, on the 10x
documents tier (the dedup-safe alphabet-rotation build), asserting
value equality to 1e-9 per doc. The old shapes are inlined verbatim
from the r13 code (git a853e13^).

``--tier N`` swaps the data source for the N-replica documents tier
(tools/dsir_tier_ab.build — the .bench_docs100x alphabet-rotation
build; ``--tier 100`` = 5 M docs) and drops to 3 timed reps per
shape: the VERDICT r14 #7 check that the removed pair-formation
shuffle's advantage GROWS with data (the dsir precedent), not just
holds at 10x.

Usage: python tools/logprob_shape_ab.py [--tier N] [--bigram-only]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import functions as F

    import tools.scale_evidence as SE
    from xarray_scipy_spark import pipeline as pl
    from xarray_scipy_spark.pipeline.text import tokens
    from xarray_scipy_spark.session import get_spark

    spark = get_spark("logprob-shape-ab")
    tier_reps = (
        int(sys.argv[sys.argv.index("--tier") + 1])
        if "--tier" in sys.argv
        else 0
    )
    if tier_reps:
        from tools.dsir_tier_ab import build as build_docs_tier

        tier = build_docs_tier(spark, tier_reps)
        n_reps = 3
    else:
        SE.build_tier(spark)
        tier = SE.DST
        n_reps = 5

    def docs():
        return spark.read.parquet(os.path.join(tier, "documents.parquet"))

    # --- old shapes, inlined verbatim from r13 (a853e13^) ----------------
    def old_unigram(df):
        tok = df.select(
            F.col("doc_id"), F.explode(tokens(F.col("text"))).alias("token")
        )
        vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
        total = vocab.agg(F.sum("tf").alias("n_total"))
        scored = (
            tok.join(vocab, "token")
            .crossJoin(F.broadcast(total))
            .select(
                "doc_id",
                (-F.log(F.col("tf").cast("double") / F.col("n_total"))).alias(
                    "nll"
                ),
            )
        )
        return scored.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg("nll").alias("avg_nll"),
        )

    def old_bigram(df, alpha=0.1):
        tok = df.select(
            F.col("doc_id"),
            F.posexplode(tokens(F.col("text"))).alias("pos", "token"),
        )
        vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
        totals = vocab.agg(
            F.sum("tf").alias("n_total"), F.count(F.lit(1)).alias("v_size")
        )
        nxt = tok.select(
            F.col("doc_id"),
            (F.col("pos") - 1).alias("pos"),
            F.col("token").alias("w2"),
        )
        bigrams = tok.join(nxt, ["doc_id", "pos"]).select(
            "doc_id", F.col("token").alias("w1"), "w2"
        )
        bg_counts = bigrams.groupBy("w1", "w2").agg(
            F.count(F.lit(1)).alias("c12")
        )
        ctx_counts = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
        a = float(alpha)
        scored_bg = (
            bigrams.join(bg_counts, ["w1", "w2"])
            .join(ctx_counts, "w1")
            .crossJoin(F.broadcast(totals))
            .select(
                "doc_id",
                (
                    -F.log(
                        (F.col("c12") + F.lit(a))
                        / (F.col("c1") + F.lit(a) * F.col("v_size"))
                    )
                ).alias("nll"),
            )
        )
        first = (
            tok.filter(F.col("pos") == 0)
            .join(vocab, "token")
            .crossJoin(F.broadcast(totals))
            .select(
                "doc_id",
                (-F.log(F.col("tf").cast("double") / F.col("n_total"))).alias(
                    "nll"
                ),
            )
        )
        return (
            scored_bg.unionByName(first)
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_tokens"),
                F.avg("nll").alias("avg_nll"),
            )
        )

    # value parity spot check (quantized: summation order differs)
    small = docs().limit(2000).localCheckpoint()
    for old, new in (
        (old_unigram, pl.unigram_logprob),
        (old_bigram, pl.bigram_logprob),
    ):
        a = {
            r["doc_id"]: (r["n_tokens"], round(r["avg_nll"], 9))
            for r in old(small).collect()
        }
        b = {
            r["doc_id"]: (r["n_tokens"], round(r["avg_nll"], 9))
            for r in new(small).collect()
        }
        assert a == b, "value drift — A/B void"

    def run(mk):
        t0 = time.time()
        mk(docs()).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    out = {
        "loadavg": [round(x, 2) for x in os.getloadavg()[:2]],
        "tier": tier_reps or 10,
    }
    pairs = (
        ("unigram", old_unigram, pl.unigram_logprob),
        ("bigram", old_bigram, pl.bigram_logprob),
    )
    if "--bigram-only" in sys.argv:
        pairs = pairs[1:]
    for name, old, new in pairs:
        run(old)
        run(new)
        a, b = [], []
        for _ in range(n_reps):
            a.append(run(old))
            b.append(run(new))
        out[name] = {
            "old": a,
            "old_med": statistics.median(a),
            "new": b,
            "new_med": statistics.median(b),
            "speedup": round(statistics.median(a) / statistics.median(b), 2),
        }
        print(
            f"# {name}: old {out[name]['old_med']}s new "
            f"{out[name]['new_med']}s ({out[name]['speedup']}x)",
            file=sys.stderr,
        )
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
