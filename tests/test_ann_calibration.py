"""n_probe calibration for IVF-PQ serving (streaming/ann.py):
calibrate_n_probe sweeps a built index and auto_n_probe picks the
minimal probe width for a recall target. Pinned here:

- the curve is sane: recall@k in [0, 1], recall non-decreasing in
  n_probe at every k, fan-out strictly increasing (wider probes scan
  more), and at n_probe = k(cells) the probe covers the corpus so
  recall is bound only by the PQ candidate cut (_PQ_CAND), not by
  probe width — measurably higher than the 1-cell floor;
- auto_n_probe returns the SMALLEST swept value reaching the target,
  the largest swept value when saturated (strict=False), and raises
  with the best-achieved diagnostics when strict;
- ivf_pq_query_batch with default n_probe is bit-identical to what
  the streaming server emits per batch (same core, by construction —
  asserted against the registry's ann_ivf_pq row shape).
"""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from fintech_etl_spark.sources.tables import load_table
from fintech_etl_spark.streaming.ann import (
    auto_n_probe,
    build_ivf_pq_index,
    calibrate_n_probe,
)

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def calibrated(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    build_ivf_pq_index(spark, SF_SMOKE, idx, k=4)
    queries = (
        load_table(spark, SF_SMOKE, "embeddings")
        .filter(F.col("vec_id") < 20)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    curve = calibrate_n_probe(
        spark, idx, queries, n_probes=(1, 2, 4), at_k=(1, 5)
    )
    return curve


def test_calibration_curve_shape(calibrated):
    curve = calibrated
    assert [p["n_probe"] for p in curve] == [1, 2, 4]
    for p in curve:
        for k, r in p["recall"].items():
            assert 0.0 <= r <= 1.0, (k, r)
        assert p["queries"] == 20
    for k in (1, 5):
        rs = [p["recall"][k] for p in curve]
        assert rs == sorted(rs), f"recall@{k} not monotone: {rs}"
    fans = [p["mean_fanout"] for p in curve]
    assert fans == sorted(fans) and fans[0] < fans[-1]
    # r13 attribution: ceiling = exact-refine-all recall (truth in
    # probed cells). It bounds recall from above at every point, is
    # monotone in n_probe, and reaches 1.0 when the probe covers all
    # 4 cells (every truth neighbor is then reachable by definition)
    for p in curve:
        for k in (1, 5):
            assert 0.0 <= p["ceiling"][k] <= 1.0
            assert p["ceiling"][k] >= p["recall"][k]
    for k in (1, 5):
        cs = [p["ceiling"][k] for p in curve]
        assert cs == sorted(cs), f"ceiling@{k} not monotone: {cs}"
    assert curve[-1]["ceiling"][1] == 1.0
    assert curve[-1]["ceiling"][5] == 1.0
    # full-coverage probe (n_probe = all 4 cells): recall is now
    # PQ-candidate-cut bound, not probe bound — well above the 1-cell
    # floor (smoke corpus: @1 0.5->0.95, @5 0.52->0.82)
    full = curve[-1]
    assert full["recall"][1] >= 0.9 and full["recall"][5] >= 0.8
    assert full["recall"][1] > curve[0]["recall"][1]
    assert full["recall"][5] > curve[0]["recall"][5]


def test_auto_n_probe_picks_minimal(calibrated):
    curve = calibrated
    # target = the full-coverage recall: only n_probe=4 reaches it...
    top5 = curve[-1]["recall"][5]
    assert auto_n_probe(curve, top5, at_k=5) == 4
    # ...a trivial target is met by the smallest sweep point...
    floor = curve[0]["recall"][5]
    assert auto_n_probe(curve, floor, at_k=5) == 1
    # ...an unreachable target saturates: default returns the
    # HIGHEST-RECALL point (here recall is monotone, so the widest),
    # never blindly the widest probe — strict raises with diagnostics
    best5 = max(p["recall"][5] for p in curve)
    picked = auto_n_probe(curve, 0.99, at_k=5)
    assert next(
        p["recall"][5] for p in curve if p["n_probe"] == picked
    ) == best5
    assert picked == 4  # monotone smoke curve: best IS the widest
    with pytest.raises(ValueError, match="saturated"):
        auto_n_probe(curve, 0.99, at_k=5, strict=True)
    with pytest.raises(ValueError, match="no recall@7"):
        auto_n_probe(curve, 0.5, at_k=7)


def test_auto_n_probe_saturated_fallback_is_best_not_widest():
    """The r13 review catch: at a fixed shortlist cut, recall can
    DECREASE in n_probe (the r12 dilution artifact), so the saturated
    fallback must return the best MEASURED point, never blindly the
    widest probe — which here would be the worst recall at 8x the
    cost."""
    curve = [
        {"n_probe": n, "recall": {5: r}}
        for n, r in [(1, 0.18), (2, 0.15), (4, 0.12), (8, 0.10)]
    ]
    assert auto_n_probe(curve, 0.9, at_k=5) == 1


def test_pq_cand_sweep_and_picker(spark, tmp_path):
    """The shortlist-depth lever (r13): recall is non-decreasing in
    pq_cand (a deeper ADC shortlist can only ADD true neighbors to the
    exact re-rank), mean_refined records the cost honestly (capped by
    the probe's candidate yield), a cut at/past the fan-out closes the
    gap to the probe ceiling, and auto_pq_cand picks minimally /
    saturates loudly — the exact analogues of the n_probe picker."""
    from fintech_etl_spark.streaming.ann import (
        auto_pq_cand,
        calibrate_n_probe,
        calibrate_pq_cand,
    )

    idx = str(tmp_path / "idx")
    build_ivf_pq_index(spark, SF_SMOKE, idx, k=4)
    queries = (
        load_table(spark, SF_SMOKE, "embeddings")
        .filter(F.col("vec_id") < 20)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    cuts = (5, 20, 50, 100000)
    curve = calibrate_pq_cand(
        spark, idx, queries, pq_cands=cuts, n_probe=2, at_k=(5,)
    )
    assert [p["pq_cand"] for p in curve] == sorted(cuts)
    r5 = [p["recall"][5] for p in curve]
    assert r5 == sorted(r5), f"recall@5 not monotone in pq_cand: {r5}"
    refined = [p["mean_refined"] for p in curve]
    assert refined == sorted(refined)
    # the absurd cut is capped by what the probe yielded, measured
    assert refined[-1] < 100000
    assert refined[0] <= 5.0
    # cut >= fan-out ⇒ shortlist covers every probed candidate:
    # recall equals the probe ceiling at the same n_probe
    ceil5 = calibrate_n_probe(
        spark, idx, queries, n_probes=(2,), at_k=(5,)
    )[0]["ceiling"][5]
    assert r5[-1] == pytest.approx(ceil5, abs=1e-9)
    # picker: minimal cut for a feasible target, loud on saturation
    target = r5[-1]
    picked = auto_pq_cand(curve, target, at_k=5)
    assert [p for p in curve if p["pq_cand"] == picked][0]["recall"][5] >= target
    assert all(
        p["recall"][5] < target for p in curve if p["pq_cand"] < picked
    )
    # saturated: the SMALLEST cut achieving the best measured recall
    # (cheapest point on the frontier; ties collapse downward)
    sat = auto_pq_cand(curve, 1.01, at_k=5)
    best_r = max(r5)
    assert next(
        p["recall"][5] for p in curve if p["pq_cand"] == sat
    ) == best_r
    assert all(
        p["recall"][5] < best_r for p in curve if p["pq_cand"] < sat
    )
    with pytest.raises(ValueError, match="no longer the binding stage"):
        auto_pq_cand(curve, 1.01, at_k=5, strict=True)
    with pytest.raises(ValueError, match="curve is EMPTY"):
        auto_pq_cand([], 0.5)


def test_calibration_empty_inputs_fail_fast(spark, tmp_path):
    """r12 ADVICE: an empty query sample used to die in
    ZeroDivisionError deep in the recall math, and auto_n_probe on an
    empty curve in an unhelpful TypeError — both must be loud, typed,
    and immediate."""
    idx = str(tmp_path / "idx")
    build_ivf_pq_index(spark, SF_SMOKE, idx, k=2)
    empty = (
        load_table(spark, SF_SMOKE, "embeddings")
        .filter(F.lit(False))
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    with pytest.raises(ValueError, match="query sample is EMPTY"):
        calibrate_n_probe(spark, idx, empty, n_probes=(1,), at_k=(1,))
    with pytest.raises(ValueError, match="curve is EMPTY"):
        auto_n_probe([], 0.5)


def test_cli_index_calibrate(spark, tmp_path, capsys, monkeypatch):
    """`index-calibrate` sweeps a built index and reports the curve +
    the auto-picked n_probe for a target."""
    from fintech_etl_spark import cli

    monkeypatch.setattr(cli, "build_session", lambda *a, **k: spark)
    idx = str(tmp_path / "idx")
    build_ivf_pq_index(spark, SF_SMOKE, idx, k=4)
    rc = cli.main(
        [
            "index-calibrate",
            "--index", idx,
            "--sf-dir", SF_SMOKE,
            "--queries", "10",
            "--n-probes", "1,4",
            "--target-recall", "0.0",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [p["n_probe"] for p in out["curve"]] == [1, 4]
    assert out["picked_n_probe"] == 1  # trivial target -> minimal width
    # the r13 shortlist sweep rides the same command
    rc = cli.main(
        [
            "index-calibrate",
            "--index", idx,
            "--sf-dir", SF_SMOKE,
            "--queries", "10",
            "--n-probes", "1,4",
            "--pq-cands", "5,100000",
            "--n-probe-fixed", "2",
            "--target-recall", "0.0",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [p["pq_cand"] for p in out["pq_cand_curve"]] == [5, 100000]
    assert out["picked_pq_cand"] == 5  # trivial target -> minimal cut
    # --grid: joint sweep + cheapest-feasible pick through the CLI
    rc = cli.main(
        [
            "index-calibrate",
            "--index", idx,
            "--sf-dir", SF_SMOKE,
            "--queries", "10",
            "--n-probes", "1,4",
            "--pq-cands", "5,100000",
            "--grid",
            "--target-recall", "0.0",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["grid"]) == 4
    assert out["picked_config"]["recall"]["5"] >= 0.0
    # --grid without --pq-cands is loud
    assert cli.main(
        ["index-calibrate", "--index", idx, "--sf-dir", SF_SMOKE, "--grid"]
    ) == 2
    capsys.readouterr()


def test_serving_grid_and_joint_picker(spark, tmp_path):
    """The joint (n_probe, pq_cand) calibration (r13): the two levers
    interact (wider probes dilute a fixed shortlist), so the grid must
    be consistent along both axes — recall non-decreasing in pq_cand
    at fixed n_probe, and non-decreasing in n_probe once the shortlist
    covers the probe yield — and pick_serving_config must return the
    CHEAPEST feasible point under the documented cost model."""
    from fintech_etl_spark.streaming.ann import (
        _default_serving_cost,
        calibrate_serving_grid,
        pick_serving_config,
    )

    idx = str(tmp_path / "idx")
    build_ivf_pq_index(spark, SF_SMOKE, idx, k=4)
    queries = (
        load_table(spark, SF_SMOKE, "embeddings")
        .filter(F.col("vec_id") < 20)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    grid = calibrate_serving_grid(
        spark, idx, queries, n_probes=(1, 4), pq_cands=(5, 100000), at_k=(5,)
    )
    assert len(grid) == 4
    by = {(p["n_probe"], p["pq_cand"]): p for p in grid}

    def r5(np_, pc):
        return by[(np_, pc)]["recall"][5]

    # axis consistency
    for np_ in (1, 4):
        assert r5(np_, 100000) >= r5(np_, 5)
    assert r5(4, 100000) >= r5(1, 100000)  # covered shortlist: probes help
    assert r5(4, 100000) >= 0.8  # full coverage + full refine
    # cost metrics behave
    assert by[(4, 5)]["mean_fanout"] > by[(1, 5)]["mean_fanout"]
    assert by[(1, 100000)]["mean_refined"] <= by[(1, 100000)]["mean_fanout"]
    assert by[(1, 5)]["mean_refined"] <= 5.0

    # picker: cheapest feasible under the documented cost
    target = r5(4, 100000)
    picked = pick_serving_config(grid, target, at_k=5)
    assert picked["recall"][5] >= target
    feasible = [p for p in grid if p["recall"][5] >= target]
    assert _default_serving_cost(picked) == min(
        _default_serving_cost(p) for p in feasible
    )
    # trivial target: the globally cheapest point wins
    floor = min(p["recall"][5] for p in grid)
    cheap = pick_serving_config(grid, floor, at_k=5)
    assert _default_serving_cost(cheap) == min(
        _default_serving_cost(p) for p in grid
    )
    # saturation: default falls back to the highest-recall point,
    # strict is loud, empty grid is loud
    assert pick_serving_config(grid, 1.01, at_k=5)["recall"][5] == max(
        p["recall"][5] for p in grid
    )
    with pytest.raises(ValueError, match="widen the sweep"):
        pick_serving_config(grid, 1.01, at_k=5, strict=True)
    with pytest.raises(ValueError, match="grid is EMPTY"):
        pick_serving_config([], 0.5)
    with pytest.raises(ValueError, match="EMPTY"):
        calibrate_serving_grid(
            spark, idx, queries.filter(F.lit(False)), n_probes=(1,),
            pq_cands=(5,), at_k=(5,),
        )


def test_pq_cand_reaches_streaming_server(spark, tmp_path):
    """The --pq-cand serving flag must actually change what the
    streaming server emits: served results at a widened cut are
    bit-identical to ivf_pq_query_batch at the same cut, and differ
    from the default-cut serve where the cut binds."""
    import json as _json
    import time as _time

    from fintech_etl_spark.streaming.ann import (
        ivf_pq_query_batch,
        start_ivf_pq_queries,
    )

    idx = str(tmp_path / "idx")
    build_ivf_pq_index(spark, SF_SMOKE, idx, k=4)
    queries = (
        load_table(spark, SF_SMOKE, "embeddings")
        .filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    qdir = tmp_path / "q"
    qdir.mkdir()
    with open(qdir / "batch.jsonl", "w") as fh:
        for r in queries.collect():
            fh.write(
                _json.dumps(
                    {"query_id": r.query_id, "embedding": list(r.embedding)}
                )
                + "\n"
            )
    served: dict = {}

    def collect(df, bid):
        for r in df.collect():
            served[(r.query_id, r.rank)] = (r.neighbor_id, r.dist)

    q = start_ivf_pq_queries(
        spark,
        str(qdir / "*.jsonl"),
        str(tmp_path / "ck"),
        idx,
        collect,
        n_probe=4,
        pq_cand=3,  # binding cut: only 3 ADC candidates refine
    )
    q.awaitTermination()
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.dist)
        for r in ivf_pq_query_batch(
            spark, idx, queries.selectExpr(
                "query_id", "cast(embedding as array<double>) as qv"
            ), n_probe=4, pq_cand=3,
        ).collect()
    }
    assert served == want
    # at the binding cut no query can emit more than 3 rows
    per_q: dict = {}
    for (qid, _rank) in served:
        per_q[qid] = per_q.get(qid, 0) + 1
    assert per_q and max(per_q.values()) <= 3


def test_exact_refine_mode_parity_and_no_codes_scan(spark, tmp_path):
    """pq_cand='exact' (r13 audit ask): when the calibrated shortlist
    meets or exceeds the probe fan-out, the ADC stage prunes nothing —
    serve by exact refine over the probed cells instead. Pinned:
    (query_id, neighbor_id, dist, rank) bit-equal to the windowed path
    with a wider-than-fan-out shortlist, approx_dist == dist (no
    approximation happened), and the physical plan reads NO codes
    files at all (the windowed plan does)."""
    from fintech_etl_spark.streaming.ann import ivf_pq_query_batch

    idx = str(tmp_path / "idx")
    build_ivf_pq_index(spark, SF_SMOKE, idx, k=4)
    queries = (
        load_table(spark, SF_SMOKE, "embeddings")
        .filter(F.col("vec_id") < 12)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .select("query_id", F.col("embedding").cast("array<double>").alias("qv"))
    )
    windowed = ivf_pq_query_batch(
        spark, idx, queries, n_probe=2, top_k=5, pq_cand=10**6
    )
    exact = ivf_pq_query_batch(
        spark, idx, queries, n_probe=2, top_k=5, pq_cand="exact"
    )
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    wrows = {key(r): (r.neighbor_id, r.dist) for r in windowed.collect()}
    erows = {key(r): (r.neighbor_id, r.dist) for r in exact.collect()}
    assert wrows == erows and len(erows) == 12 * 5
    for r in exact.collect():
        assert r.approx_dist == r.dist  # exact mode approximates nothing
    # the exact plan never touches the codes dataset (whose scan is
    # identifiable by its pq_cell column; file paths truncate in the
    # plan string)
    eplan = exact._jdf.queryExecution().executedPlan().toString()
    wplan = windowed._jdf.queryExecution().executedPlan().toString()
    assert "pq_cell" not in eplan and "codes" not in eplan
    assert "pq_cell" in wplan


def test_grid_prices_exact_mode_below_the_adc_noop(spark, tmp_path):
    """The grid sweeps 'exact' as a first-class point: identical
    recall to the covered-shortlist point (both refine everything
    probed) at strictly LOWER modeled cost (no ADC scan) — so the
    picker emits exact mode whenever only full refinement reaches the
    target (the r13 receipt's pq_cand=16384 >= fan-out case)."""
    from fintech_etl_spark.streaming.ann import (
        _default_serving_cost,
        auto_pq_cand,
        calibrate_pq_cand,
        calibrate_serving_grid,
        pick_serving_config,
    )

    idx = str(tmp_path / "idx")
    build_ivf_pq_index(spark, SF_SMOKE, idx, k=4)
    queries = (
        load_table(spark, SF_SMOKE, "embeddings")
        .filter(F.col("vec_id") < 20)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    grid = calibrate_serving_grid(
        spark, idx, queries, n_probes=(4,), pq_cands=(5, 100000, "exact"),
        at_k=(5,),
    )
    by = {p["pq_cand"]: p for p in grid}
    # same recall as the ADC-no-op point (both refine every candidate)
    assert by["exact"]["recall"][5] == by[100000]["recall"][5]
    # exact refines the full fan-out but pays no ADC scan
    assert by["exact"]["mean_refined"] == by["exact"]["mean_fanout"]
    assert (
        _default_serving_cost(by["exact"])
        < _default_serving_cost(by[100000])
    )
    # a target only full refinement reaches → the picker lands on exact
    target = by[100000]["recall"][5]
    if by[5]["recall"][5] < target:
        assert pick_serving_config(grid, target, at_k=5)["pq_cand"] == "exact"
    # the single-lever sweep orders/returns it coherently too
    curve = calibrate_pq_cand(
        spark, idx, queries, pq_cands=(5, "exact"), n_probe=4, at_k=(5,)
    )
    assert [p["pq_cand"] for p in curve] == [5, "exact"]
    assert curve[-1]["recall"][5] >= curve[0]["recall"][5]
    if curve[0]["recall"][5] < curve[-1]["recall"][5]:
        assert auto_pq_cand(curve, curve[-1]["recall"][5], at_k=5) == "exact"
