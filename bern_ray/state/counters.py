"""Session-global cap/skew observability counters (SURVEY §7.5:
"cap + salt + LOG WHAT WAS DROPPED").

Every bounded-emission path (minhash band caps, blocking per-block
pair caps, hot-key salting) trades recall or balance for scale; a
100-TB operator must be able to SEE that trade happening. The
counters live in one tiny named Ray actor — the canonical
shared-mutable-state case the Dataset API can't express — and
kernels report with NON-BLOCKING actor submissions: a blocking
round-trip per capped kernel call measured 10-20% of the headline
block_score phase at 32 CPUs (BASELINE.md r5), all of it actor RPC
latency inside hot data tasks. Submission from a live Ray Data
worker is reliable (the core worker owns the queue; dropping the
ObjectRef does not cancel an actor task), so the only consistency
gap is IN-FLIGHT messages at read time — `snapshot()` closes it by
settling: it re-reads until two consecutive reads agree.

Rollup surface: `snapshot()` feeds `state.metrics.stage_metrics`,
which appends one `cap:<name>` row per counter — so the flagship's
`er_stage_metrics` query exposes the elision counts next to the
per-stage wall/rows facts.
"""

from __future__ import annotations

import time
from collections import deque

import ray

_ACTOR_NAME = "bern_ray_cap_counters"


@ray.remote(num_cpus=0)
class _CounterActor:
    def __init__(self) -> None:
        self._c: dict[str, int] = {}

    def add(self, name: str, n: int = 1) -> None:
        self._c[name] = self._c.get(name, 0) + int(n)

    def add_many(self, counts: dict) -> None:
        for name, n in counts.items():
            self._c[name] = self._c.get(name, 0) + int(n)

    def snapshot(self) -> dict[str, int]:
        return dict(self._c)

    def reset(self) -> None:
        self._c.clear()


_HANDLE = None
# bounded ref retention: keeps recent submissions alive long enough
# for error surfacing without growing per-process memory
_PENDING: deque = deque(maxlen=64)


def _actor():
    global _HANDLE
    if _HANDLE is None:
        _HANDLE = _CounterActor.options(
            name=_ACTOR_NAME, get_if_exists=True
        ).remote()
    return _HANDLE


def add(name: str, n: int) -> None:
    """Increment from a worker kernel — non-blocking (zero stall on
    the data task; the capped path used to pay a full actor RPC
    round-trip per call)."""
    if n:
        _PENDING.append(_actor().add.remote(name, int(n)))


def add_many(counts: dict) -> None:
    """Increment several counters in ONE submission (a kernel call
    that capped usually reports 2-3 related counts)."""
    counts = {k: int(v) for k, v in counts.items() if v}
    if counts:
        _PENDING.append(_actor().add_many.remote(counts))


def snapshot(settle_sec: float = 0.1, max_wait_sec: float = 2.0) -> dict:
    """Read the counters, settling in-flight worker submissions: the
    adds are async, so re-read until two consecutive snapshots agree
    (bounded by `max_wait_sec`). Callers read AFTER their dataset
    action returned, so every add was already submitted from a live
    worker — settling only waits out delivery, not generation."""
    a = _actor()
    prev = ray.get(a.snapshot.remote())
    deadline = time.monotonic() + max_wait_sec
    while time.monotonic() < deadline:
        time.sleep(settle_sec)
        cur = ray.get(a.snapshot.remote())
        if cur == prev:
            return cur
        prev = cur
    return prev


def reset() -> None:
    ray.get(_actor().reset.remote())
