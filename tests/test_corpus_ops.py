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
