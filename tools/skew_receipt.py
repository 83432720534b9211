"""Skew-adversarial receipt for the dedup/LSH caps (r9 verdict #4).

Every earlier scale receipt ran on the UNIFORM synthetic corpus; this
one builds the adversarial shape — ONE template stamped onto ~10% of
documents at sf1 (50k docs → a 5k-clone hot set) — and measures:

- the capped tiers (df-capped MinHash, df≤64 n-gram Jaccard, capped
  SimHash, and the dense tier with its bucket_cap engaged) keep their
  candidate counts and wall time bounded: every hot shingle's df blows
  past the caps, so the clone set simply sits out candidate generation;
- the UNCAPPED dense banding's candidate count on the same corpus,
  computed ANALYTICALLY from bucket sizes (Σ C(|bucket|, 2) — we count
  the explosion, we don't pay for it): the 5k-clone bucket alone is
  C(5000, 2) ≈ 12.5M pairs per band — the quadratic cliff the caps
  exist to prevent;
- recall on the NON-HOT mass holds: against a ground-truth set of
  exact-clone pairs among the 90% of documents whose text is untouched
  (sampled spanning-tree pairs per clone group, so truth size is
  linear), each tier's recall on the skewed corpus matches its recall
  on the uniform one. NOTE this is deliberately NOT "identical pair
  sets": the ngram/simhash capped tiers score similarity over the
  CAPPED shingle subspace / cap-filtered buckets, so their
  borderline-τ output legitimately shifts when any part of the corpus
  changes document frequencies — recall of true duplicates is the
  invariant that matters, and the full-set-verified tiers (dfcap,
  dense+bucket_cap) additionally hold their non-hot pair sets exactly
  (asserted).

Usage: python tools/skew_receipt.py [sf_dir] [out.json]
(sf_dir defaults to .scale/sf1 — generate with tools/gen_scale_data.py)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
OUT = sys.argv[2] if len(sys.argv) > 2 else None
HOT_FRAC = 0.10


def _make_skewed(spark, src_dir: str, dst_dir: str) -> tuple[int, int]:
    """Copy documents.parquet, stamping one template onto every doc_id
    divisible by 10 (~10%). Returns (n_docs, n_hot)."""
    from pyspark.sql import functions as F

    from fintech_etl_spark.sources.tables import load_table

    docs = load_table(spark, src_dir, "documents")
    template = (
        "hot template boilerplate navigation footer copyright subscribe "
        "newsletter cookie consent terms privacy contact about careers"
    )
    skewed = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 10 == 0, F.lit(template)).otherwise(
            F.col("text")
        ),
    ).withColumn("n_chars", F.length("text"))
    os.makedirs(dst_dir, exist_ok=True)
    skewed.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(dst_dir, "documents.parquet")
    )
    n = docs.count()
    return n, skewed.filter(F.col("doc_id") % 10 == 0).count()


def _clone_truth(spark, sf_dir: str):
    """Ground-truth exact-duplicate pairs among NON-HOT docs, sampled
    as spanning chains (consecutive sorted ids per identical-text
    group) so the truth set is LINEAR in docs even when a clone group
    is huge. Full-set jaccard of every truth pair is exactly 1.0."""
    from pyspark.sql import functions as F

    from fintech_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 != 0
    )
    groups = (
        docs.groupBy("text")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("m"))
        .filter(F.size("m") >= 2)
    )
    return {
        (int(r.a), int(r.b))
        for r in groups.select(
            F.explode(
                F.expr(
                    "transform(slice(m, 1, size(m) - 1), "
                    "(x, i) -> struct(x AS a, element_at(m, i + 2) AS b))"
                )
            ).alias("p")
        ).select("p.a", "p.b")
        .collect()
    }


def _tier_metrics(fn, spark, sf_dir: str, truth: set):
    """(wall, n_nonhot_pairs, recall@truth) — pair membership is
    evaluated Spark-side; only counts come to the driver."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    df = (
        fn(spark, sf_dir)
        .filter((F.col("doc_a") % 10 != 0) & (F.col("doc_b") % 10 != 0))
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=False)
    )
    n_pairs = df.count()
    wall = round(time.perf_counter() - t0, 2)
    tdf = spark.createDataFrame(
        [(a, b) for a, b in sorted(truth)], "doc_a long, doc_b long"
    )
    # tier outputs use doc_a < doc_b; truth chains are sorted too.
    # broadcast the (linear, small) truth side; the tier output may be
    # millions of rows and stays distributed
    hit = df.join(F.broadcast(tdf), ["doc_a", "doc_b"], "semi").count()
    return wall, n_pairs, round(hit / max(len(truth), 1), 4)


def main() -> int:
    from pyspark.sql import functions as F

    from fintech_etl_spark.operators.dedup import (
        _SIMHASH_BUCKET_CAP,
        _dense_band_verify,
        dedup_minhash_lsh_dfcap,
        dedup_ngram_jaccard_capped,
        dedup_simhash_capped,
        minhash_signature_xxhash64,
        with_shingles,
    )
    from fintech_etl_spark.session import build_session
    from fintech_etl_spark.sources.tables import load_table

    spark = build_session("skew_receipt")
    work = tempfile.mkdtemp(prefix="skew_corpus_")
    receipt: dict = {"metric": "dedup_skew_adversarial", "sf_dir": SF}
    try:
        n_docs, n_hot = _make_skewed(spark, SF, work)
        receipt["n_docs"] = n_docs
        receipt["n_hot_clones"] = n_hot

        # analytic candidate count of the UNCAPPED dense banding on the
        # skewed corpus: Σ C(|bucket|,2) over band buckets (cheap agg)
        docs = load_table(spark, work, "documents")
        sig = with_shingles(docs, 3).select(
            "doc_id", minhash_signature_xxhash64("s").alias("sig")
        )
        bands = sig.select(
            "doc_id",
            F.posexplode(
                F.array(
                    *[
                        F.concat_ws(
                            "_",
                            *[
                                F.element_at("sig", 4 * b + r + 1).cast(
                                    "string"
                                )
                                for r in range(4)
                            ],
                        )
                        for b in range(16)
                    ]
                )
            ).alias("band", "bucket"),
        )
        bstats = (
            bands.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("sz"))
            .agg(
                F.sum(F.expr("sz * (sz - 1) / 2")).alias("cand_uncapped"),
                F.max("sz").alias("max_bucket"),
                F.sum(
                    F.when(
                        F.col("sz") <= _SIMHASH_BUCKET_CAP,
                        F.expr("sz * (sz - 1) / 2"),
                    ).otherwise(0)
                ).alias("cand_capped"),
            )
            .first()
        )
        receipt["dense_banding"] = {
            "max_bucket": int(bstats["max_bucket"]),
            "candidates_uncapped": int(bstats["cand_uncapped"]),
            "candidates_bucket_capped": int(bstats["cand_capped"]),
            "bucket_cap": _SIMHASH_BUCKET_CAP,
            "reduction": round(
                bstats["cand_uncapped"] / max(bstats["cand_capped"], 1), 1
            ),
        }

        tiers = {
            "dedup_minhash_lsh_dfcap": dedup_minhash_lsh_dfcap,
            "dedup_ngram_jaccard_capped": dedup_ngram_jaccard_capped,
            "dedup_simhash_capped": dedup_simhash_capped,
            "dense_xxhash64_bucket_capped": lambda s, d: _dense_band_verify(
                load_table(s, d, "documents"),
                minhash_signature_xxhash64("s"),
                bucket_cap=_SIMHASH_BUCKET_CAP,
            ),
        }
        # ground truth: exact clone pairs among non-hot docs — same
        # texts in both corpora, so ONE truth set serves both
        truth = _clone_truth(spark, SF)
        receipt["truth_pairs_nonhot"] = len(truth)

        # full-set-verified tiers must hold their non-hot pair sets
        # EXACTLY; subspace-scored tiers are held to recall instead
        full_set_verified = {
            "dedup_minhash_lsh_dfcap",
            "dense_xxhash64_bucket_capped",
        }
        per_tier = {}
        ok = True
        for name, fn in tiers.items():
            uni_wall, uni_n, uni_rec = _tier_metrics(fn, spark, SF, truth)
            skw_wall, skw_n, skw_rec = _tier_metrics(fn, spark, work, truth)
            wall_ratio = round(skw_wall / max(uni_wall, 1e-9), 2)
            entry = {
                "uniform_wall_sec": uni_wall,
                "skewed_wall_sec": skw_wall,
                "wall_ratio": wall_ratio,
                "nonhot_pairs_uniform": uni_n,
                "nonhot_pairs_skewed": skw_n,
                "recall_truth_uniform": uni_rec,
                "recall_truth_skewed": skw_rec,
            }
            tier_ok = wall_ratio <= 2.0 and skw_rec >= uni_rec - 0.02
            if name in full_set_verified:
                # true-pair outputs are bounded — a real set comparison
                # is affordable for these two tiers
                def _pairs(d):
                    return {
                        (r.doc_a, r.doc_b)
                        for r in fn(spark, d)
                        .filter(
                            (F.col("doc_a") % 10 != 0)
                            & (F.col("doc_b") % 10 != 0)
                        )
                        .select("doc_a", "doc_b")
                        .collect()
                    }

                exact_hold = _pairs(SF) == _pairs(work)
                entry["nonhot_pairs_held_exactly"] = exact_hold
                tier_ok = tier_ok and exact_hold
            entry["passed"] = tier_ok
            per_tier[name] = entry
            ok = ok and tier_ok
        receipt["tiers"] = per_tier
        receipt["passed"] = ok
    finally:
        shutil.rmtree(work, ignore_errors=True)

    line = json.dumps(receipt)
    print(line)
    if OUT:
        with open(OUT, "w") as fh:
            fh.write(line + "\n")
    return 0 if receipt["passed"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
