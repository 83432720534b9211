"""Injectable materialization-barrier policy, shared by every operator
that must consume one computed frame more than once.

A frame referenced N times without a barrier re-runs its whole lineage
N times AND grows the logical plan multiplicatively when calls nest
(the un-checkpointed 3-ntile RFM plan was 658 nodes). The right
truncation depends on where the job runs, so the strategy is a
parameter with a cluster-safe ``"auto"`` default rather than a
hard-coded ``localCheckpoint`` at each call site (the round-8/9 audits
flagged exactly that hard-coding, first in the ranking family, then in
the IVF-PQ append path).

Strategies (the ``barrier=`` argument on public helpers):

- ``"reliable"`` — ``checkpoint(eager=False)`` against the session's
  checkpoint dir: plan truncation AND fault tolerance (materialized
  partitions live on the reliable store, so an executor loss replays
  from there). The cluster posture.
- ``"local"`` — ``localCheckpoint(eager=False)``: plan truncation, but
  partitions live on EXECUTOR-LOCAL storage with no lineage to replay —
  a single executor loss fails the job. Only safe where executors
  don't die (local mode / non-preemptible dev).
- ``"persist"`` — ``StorageLevel.MEMORY_AND_DISK`` cache: keeps
  lineage (recompute on loss is safe for deterministic upstreams) but
  does NOT truncate the logical plan, so deeply nested calls pay the
  multiplicative analysis cost.
- ``"none"`` — no barrier (plan-inspection tests only).
- ``"auto"`` (default) — ``"reliable"`` when the SparkContext has a
  checkpoint dir configured, else ``"local"``. Set
  ``spark.sparkContext.setCheckpointDir(...)`` on any real cluster —
  especially preemptible/spot fleets, where executor loss is the
  dominant failure mode — and every barrier-using operator becomes
  fault-tolerant with no call-site change.

Checkpoint retention: Spark never deletes reliable checkpoint files by
default, so iterative operators routed through ``"reliable"`` (one
barrier per iteration in pagerank / connected_components / kmeans_fit /
pq_fit) would accrete one permanent materialized copy per iteration
per job. ``build_session`` therefore sets
``spark.cleaner.referenceTracking.cleanCheckpoints=true`` — the
context cleaner removes a checkpoint's files once its DataFrame is
garbage-collected. Sessions built elsewhere should set the same flag,
or pair the checkpoint dir with a retention sweep (e.g. a TTL'd
bucket prefix); without either, plan for checkpoint-dir growth
proportional to total iterations run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialization_barrier(d: DataFrame, strategy: str) -> DataFrame:
    """Apply the ``strategy`` barrier to ``d`` — see the module
    docstring for the executor-loss semantics of each option."""
    if strategy == "none":
        return d
    if strategy == "persist":
        from pyspark import StorageLevel

        return d.persist(StorageLevel.MEMORY_AND_DISK)
    if strategy == "auto":
        has_dir = d.sparkSession.sparkContext.getCheckpointDir() is not None
        strategy = "reliable" if has_dir else "local"
    if strategy == "reliable":
        return d.checkpoint(eager=False)
    if strategy == "local":
        return d.localCheckpoint(eager=False)
    raise ValueError(
        f"unknown barrier strategy {strategy!r} "
        "(expected auto|reliable|local|persist|none)"
    )
