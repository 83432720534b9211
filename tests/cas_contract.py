"""The CAS-store contract, stated ONCE.

Both harnesses execute these exact bodies — ``tests/test_cas_lock.py``
over the in-repo emulation and the service-semantics fakes (fast,
race-injectable), ``tests/test_cas_emulator.py`` over moto's
independent S3/DynamoDB implementations (real wire shapes). A contract
change edits THIS file and both suites move together; two hand-copied
bodies drifting apart is exactly what a "source of truth" must not
allow.
"""
from __future__ import annotations


def primitive_contract(st) -> None:
    """The three core primitives: create-exclusive put, read, and
    conditional delete — single-winner semantics throughout."""
    assert st.get("k") is None
    assert st.put_if_absent("k", {"v": 1}) is True
    assert st.put_if_absent("k", {"v": 2}) is False  # create-exclusive
    assert st.get("k") == {"v": 1}
    assert st.delete_if_match("k", {"v": 2}) is False  # wrong expected
    assert st.get("k") == {"v": 1}
    assert st.delete_if_match("k", {"v": 1}) is True
    assert st.get("k") is None
    assert st.delete_if_match("k", {"v": 1}) is False  # already gone
    # re-creation after delete works (generation history is no bar)
    assert st.put_if_absent("k", {"v": 3}) is True
    assert st.get("k") == {"v": 3}


def put_if_match_contract(st) -> None:
    """The FOURTH primitive (lease renewal's conditional replace):
    replace only when the current value matches, absent key = no
    match, and a successful replace invalidates the OLD value for any
    later conditional (the generation/etag/condition moved with it)."""
    assert st.put_if_match("x", {"v": 1}, {"v": 2}) is False  # absent
    assert st.put_if_absent("x", {"v": 1}) is True
    assert st.put_if_match("x", {"v": 9}, {"v": 2}) is False  # mismatch
    assert st.get("x") == {"v": 1}
    assert st.put_if_match("x", {"v": 1}, {"v": 2}) is True
    assert st.get("x") == {"v": 2}
    # the old value no longer matches anything — a stale steal loses
    assert st.delete_if_match("x", {"v": 1}) is False
    assert st.delete_if_match("x", {"v": 2}) is True


def steal_race_single_winner(st) -> None:
    """Two stealers acting on the SAME observed (expired) lease: the
    precondition admits exactly one, in either order."""
    stale = {"owner": "dead", "expires_at": 0}
    assert st.put_if_absent("lease", stale)
    wins = [st.delete_if_match("lease", stale) for _ in range(2)]
    assert wins == [True, False]
