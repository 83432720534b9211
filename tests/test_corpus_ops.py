"""Corpus-construction invariants beyond the DuckDB oracles: the
properties that make these operators usable in reproducible training
pipelines (determinism, permutation/partition structure, merge
semantics)."""

from __future__ import annotations

from fintech_etl_spark.operators.corpus_ops import (
    _N_SHARDS,
    corpus_mixture_sample,
    corpus_train_shuffle,
    lake_upsert_latest,
    scd2_user_event_history,
)
from fintech_etl_spark.sources.tables import load_table

SF_SMOKE = "/root/testdata/sf0.001"


def test_mixture_sample_deterministic_and_rate_shaped(spark):
    a = {r.doc_id for r in corpus_mixture_sample(spark, SF_SMOKE).collect()}
    b = {r.doc_id for r in corpus_mixture_sample(spark, SF_SMOKE).collect()}
    assert a == b, "hash-based sampling must be run-to-run identical"
    # rate-1.0 sources keep EVERY document; no source oversamples
    rows = corpus_mixture_sample(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    by_src_total: dict[str, int] = {}
    for d in docs:
        by_src_total[d.source] = by_src_total.get(d.source, 0) + 1
    by_src_kept: dict[str, int] = {}
    rate_of: dict[str, float] = {}
    for r in rows:
        by_src_kept[r.source] = by_src_kept.get(r.source, 0) + 1
        rate_of[r.source] = r.sample_rate
    for src, rate in rate_of.items():
        if rate == 1.0:
            assert by_src_kept[src] == by_src_total[src]
        assert by_src_kept[src] <= by_src_total[src]


def test_train_shuffle_is_sharded_permutation(spark):
    rows = corpus_train_shuffle(spark, SF_SMOKE).collect()
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs  # every doc exactly once
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r.shard < _N_SHARDS
        by_shard.setdefault(r.shard, []).append(r.pos)
    # positions within each shard are exactly 1..len (a permutation)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # and the assignment actually spreads load (no empty shard at 500 docs)
    assert len(by_shard) == _N_SHARDS


def test_upsert_latest_semantics(spark):
    orders = {
        r.o_orderkey: r.o_totalprice
        for r in load_table(spark, SF_SMOKE, "orders").collect()
    }
    merged = lake_upsert_latest(spark, SF_SMOKE).collect()
    assert len(merged) == len(orders)  # key set preserved
    for r in merged:
        if r.o_orderkey % 3 == 0:
            assert r.version == 2
            assert abs(r.current_price - round(orders[r.o_orderkey] * 1.1, 4)) < 1e-6
        else:
            assert r.version == 1
            assert r.current_price == orders[r.o_orderkey]


def test_scd2_intervals_tile_each_user(spark):
    rows = scd2_user_event_history(spark, SF_SMOKE).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    ev = load_table(spark, SF_SMOKE, "events")
    n_events = ev.count()
    assert sum(r.n_events for r in rows) == n_events  # intervals partition events
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r.valid_from)
        # exactly one open (current) interval, and it is the last
        opens = [r for r in ivs if r.valid_to is None]
        assert len(opens) == 1 and ivs[-1].valid_to is None
        # half-open intervals tile: valid_to == next valid_from
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from
            assert a.event_type != b.event_type or True  # types may repeat across gaps
        # consecutive intervals never carry the same type (else not collapsed)
        for a, b in zip(ivs, ivs[1:]):
            assert not (a.event_type == b.event_type)


def test_span_dedup_survival_accounting(spark):
    from fintech_etl_spark.operators.corpus_ops import _SPAN, corpus_span_dedup

    rows = corpus_span_dedup(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    assert len(rows) == len(docs)  # every doc reports, even fully-dup ones
    # kept spans across the corpus == number of DISTINCT spans (each
    # distinct span survives exactly once, C4 semantics)
    distinct_spans = set()
    total_spans = 0
    for d in docs:
        toks = d.text.strip().split()
        spans = [
            " ".join(toks[i : i + _SPAN]) for i in range(0, len(toks), _SPAN)
        ]
        total_spans += len(spans)
        distinct_spans.update(spans)
    assert sum(r.kept_spans for r in rows) == len(distinct_spans)
    assert sum(r.n_spans for r in rows) == total_spans
    for r in rows:
        assert 0 <= r.kept_spans <= r.n_spans
        assert r.kept_tokens <= r.n_spans * _SPAN


def test_chunking_covers_and_overlaps(spark):
    from fintech_etl_spark.operators.corpus_ops import (
        _CH_STRIDE,
        _CH_WIN,
        doc_chunk_sliding,
    )

    chunks = doc_chunk_sliding(spark, SF_SMOKE).collect()
    docs = {d.doc_id: d.text.strip().split() for d in
            load_table(spark, SF_SMOKE, "documents").collect()}
    by_doc: dict[int, list] = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
    assert set(by_doc) == set(docs)
    for doc_id, cs in by_doc.items():
        toks = docs[doc_id]
        cs.sort(key=lambda c: c.chunk_id)
        # chunk ids are dense 0..k and starts stride-spaced
        assert [c.chunk_id for c in cs] == list(range(len(cs)))
        for c in cs:
            start = c.chunk_id * _CH_STRIDE
            expect = toks[start : start + _CH_WIN]
            assert c.chunk_text.split() == expect
            assert c.n_tokens == len(expect)
        # sliding coverage: every token index falls in some chunk
        covered = max(cs[-1].chunk_id * _CH_STRIDE + cs[-1].n_tokens, 0)
        assert covered == len(toks)


def test_temperature_weights_flatten_distribution(spark):
    from fintech_etl_spark.operators.corpus_ops import corpus_temperature_weights

    rows = corpus_temperature_weights(spark, SF_SMOKE).collect()
    assert abs(sum(r.temp_weight for r in rows) - 1.0) < 1e-2  # normalized
    assert abs(sum(r.raw_share for r in rows) - 1.0) < 1e-2
    # α<1 flattens: upweight strictly decreases as source size grows
    by_size = sorted(rows, key=lambda r: r.n_docs)
    for a, b in zip(by_size, by_size[1:]):
        if a.n_docs < b.n_docs:
            assert a.upweight >= b.upweight, (a.source, b.source)


def test_manifest_composes_stage_guarantees(spark):
    from fintech_etl_spark.operators.corpus_ops import (
        _SELECT_BUDGET,
        corpus_build_manifest,
        corpus_decontaminate,
        corpus_mixture_sample,
    )

    manifest = corpus_build_manifest(spark, SF_SMOKE).collect()
    assert manifest
    mixture = {r.doc_id for r in corpus_mixture_sample(spark, SF_SMOKE).collect()}
    contaminated = {
        r.doc_id
        for r in corpus_decontaminate(spark, SF_SMOKE).collect()
        if r.contaminated
    }
    texts = {
        d.doc_id: d.text for d in load_table(spark, SF_SMOKE, "documents").collect()
    }
    by_src_cum: dict[str, int] = {}
    seen_texts: dict[str, int] = {}
    for r in sorted(manifest, key=lambda r: r.doc_id):
        assert r.doc_id in mixture  # stage 1: sampled in
        assert r.doc_id not in contaminated  # stage 3: decontaminated
        # stage 2: exact-dedup survivor — first occurrence of its text
        # among SAMPLED docs (dedup runs on the sampled set)
        prior = seen_texts.get(texts[r.doc_id])
        assert prior is None or prior == r.doc_id
        seen_texts.setdefault(texts[r.doc_id], r.doc_id)
        by_src_cum[r.source] = max(by_src_cum.get(r.source, 0), r.cum_tokens)
    for src, cum in by_src_cum.items():  # stage 4: budget respected
        assert cum <= _SELECT_BUDGET, src
