"""One-command reproduction of the SCALE_RECEIPT chain.

``pytest -m slow tests/test_scale_gate.py`` (re)generates the seeded
sf0.1 and sf1 star schemas with tools/gen_scale_data.py and runs
tools/bench_scale.py's shuffle-heavy tier + plan-stability gate across
the 10× step — failing on any superlinear ratio or plan degradation,
exactly the checks behind SCALE_RECEIPT_r05.json. Excluded from the
default suite via ``-m "not slow"`` (the run is ~10-20 min); rounds
re-run it after touching partitioning, join strategies, or any
operator on the shuffle-heavy tier.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LO = os.path.join(REPO, ".scale", "sf0.1")
HI = os.path.join(REPO, ".scale", "sf1")


def _ensure(sf: float, out_dir: str) -> None:
    """Generate the seeded star schema if absent or stale (the marker
    file records the generator source hash, so a generator fix — e.g.
    the NATION_i value-domain repair — invalidates old data)."""
    import hashlib

    src = open(os.path.join(REPO, "tools", "gen_scale_data.py"), "rb").read()
    want = hashlib.sha256(src).hexdigest()[:16]
    marker = os.path.join(out_dir, ".gen_hash")
    if os.path.exists(marker) and open(marker).read() == want:
        return
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from gen_scale_data import generate  # noqa: PLC0415

    generate(sf, out_dir)
    with open(marker, "w") as f:
        f.write(want)


@pytest.mark.slow
def test_scale_gate_sf01_to_sf1():
    _ensure(0.1, LO)
    _ensure(1.0, HI)
    env = dict(os.environ, SPARK_GRAFT_SCALE_LO=LO, SPARK_GRAFT_SCALE_HI=HI)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_scale.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=3600,
    )
    # bench_scale prints one JSON summary line on stdout and exits 1 on
    # any superlinear / plan-degrade failure
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert not summary["failures"], summary["failures"]
    assert summary["n_queries"] >= 40  # the shuffle-heavy tier really ran
