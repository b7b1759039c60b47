"""Dropped-work accounting (VERDICT r3 #6).

Every cap that silently narrows coverage — hot blocking keys
(stages/pairs.py), oversized LSH bands (stages/dedup.py), oversized
embedding buckets, oversized link blocks — increments a named counter here,
so a capped run reads as CAPPED in its manifest, not as "covered
everything" (the reference logs its oversized-component warning at
dedupe/clustering.py:92-95; this is the distributed equivalent).

Shape: one tiny named Ray actor owned by the DRIVER (created by
``enable_counters()`` before a pipeline runs).  Kernels inside
map_batches/map_groups tasks call ``add_dropped`` only when a cap actually
fires, so the common path costs nothing; when the driver never enabled
counting, ``add_dropped`` is a no-op.  This is the one piece of shared
mutable state the Dataset API can't express — sanctioned raw-actor use."""

from __future__ import annotations

import ray

_ACTOR_PREFIX = "ncfd_dropped_work"
_NAMESPACE = "ncfd_counters"
# per-actor-name cache: a worker process only ever sees its own job's
# actor, but keying by name keeps the creator handle of each job alive
# on a driver that runs several jobs
_cached_handles: dict[str, "ray.actor.ActorHandle"] = {}


def _actor_name() -> str:
    """One counter actor PER JOB (ADVICE r4): a fixed cluster-wide name
    would share one actor between concurrent jobs — cross-polluted counts,
    one job's ``reset`` wiping the other's, and the actor dying with
    whichever driver created it while the survivor's tasks still call it."""
    try:
        job = ray.get_runtime_context().get_job_id()
    except Exception:
        job = "nojob"
    return f"{_ACTOR_PREFIX}_{job}"


@ray.remote(num_cpus=0)
class _CounterActor:
    def __init__(self):
        self._counts: dict[str, int] = {}

    def add(self, name: str, n: int) -> None:
        self._counts[name] = self._counts.get(name, 0) + int(n)

    def totals(self) -> dict:
        return dict(self._counts)

    def reset(self) -> None:
        self._counts = {}


def enable_counters():
    """Driver-side: create (or fetch) the counter actor.  Must be called
    from the driver so the actor is owned by the job, not by a short-lived
    worker task.  The ORIGINAL creation handle must stay referenced — a
    ``get_if_exists`` lookup handle is weak, and replacing the creator
    handle would let Ray reap the actor — so a live cached handle is never
    overwritten."""
    aname = _actor_name()
    h = _cached_handles.get(aname)
    if h is not None:
        try:
            ray.get(h.totals.remote())
            return h
        except Exception:
            _cached_handles.pop(aname, None)
    h = _CounterActor.options(
        name=aname,
        namespace=_NAMESPACE,
        get_if_exists=True,
        max_restarts=0,
    ).remote()
    _cached_handles[aname] = h
    return h


def _handle():
    aname = _actor_name()
    h = _cached_handles.get(aname)
    if h is not None:
        return h
    try:
        h = ray.get_actor(aname, namespace=_NAMESPACE)
    except ValueError:
        return None
    _cached_handles[aname] = h
    return h


def add_dropped(name: str, n: int) -> None:
    """Increment from inside a task; no-op when ``n <= 0`` or counting was
    never enabled on the driver.  The add is SYNCHRONOUS so that once the
    dataset that fired the cap is consumed, the counts are fully visible —
    it only runs on the rare cap-fired path, so the round-trip is noise.
    A dead/missing actor (e.g. the driver that owned it exited) degrades
    to a silent no-op rather than failing the surrounding map task —
    counters are a diagnostics channel, never worth killing work over."""
    if n <= 0:
        return
    h = _handle()
    if h is None:
        return
    try:
        ray.get(h.add.remote(name, int(n)))
    except Exception:
        _cached_handles.pop(_actor_name(), None)


def dropped_totals(reset: bool = False) -> dict:
    """Totals of every dropped-work counter since the last reset.

    SEMANTICS UNDER RETRIES: counters increment inside map tasks, so a
    Ray task retry (or re-executing a lazy Dataset's lineage twice)
    re-fires the same increments — totals are exact on a clean
    single-consumption run and an UPPER BOUND otherwise.  They answer
    "did any cap fire and roughly how hard", not "exactly how many rows";
    exact accounting would need per-task dedup keys, which isn't worth
    the shuffle for a diagnostics channel.

    Driver-side: reads (and optionally resets) all counters; returns {}
    when counting was never enabled."""
    h = _handle()
    if h is None:
        return {}
    try:
        out = ray.get(h.totals.remote())
        if reset:
            ray.get(h.reset.remote())
    except Exception:
        _cached_handles.pop(_actor_name(), None)
        return {}
    return out
