"""Session-global cap/skew observability counters (SURVEY §7.5:
"cap + salt + LOG WHAT WAS DROPPED").

Every bounded-emission path (minhash band caps, blocking per-block
pair caps, hot-key salting) trades recall or balance for scale; a
100-TB operator must be able to SEE that trade happening. The
counters live in one tiny named Ray actor — the canonical
shared-mutable-state case the Dataset API can't express — and
kernels report fire-and-forget (one .remote() per bucket kernel call
that actually capped something; zero overhead on the un-capped path).

Rollup surface: `snapshot()` feeds `state.metrics.stage_metrics`,
which appends one `cap:<name>` row per counter — so the flagship's
`er_stage_metrics` query exposes the elision counts next to the
per-stage wall/rows facts.
"""

from __future__ import annotations

import ray

_ACTOR_NAME = "bern_ray_cap_counters"


@ray.remote(num_cpus=0)
class _CounterActor:
    def __init__(self) -> None:
        self._c: dict[str, int] = {}

    def add(self, name: str, n: int = 1) -> None:
        self._c[name] = self._c.get(name, 0) + int(n)

    def snapshot(self) -> dict[str, int]:
        return dict(self._c)

    def reset(self) -> None:
        self._c.clear()


_HANDLE = None


def _actor():
    global _HANDLE
    if _HANDLE is None:
        _HANDLE = _CounterActor.options(
            name=_ACTOR_NAME, get_if_exists=True
        ).remote()
    return _HANDLE


def add(name: str, n: int) -> None:
    """Increment from a worker kernel. The ray.get is deliberate: a
    fire-and-forget actor call submitted just before the calling task
    returns can be dropped with the caller's context (observed), and
    the blocking round-trip costs one RPC per kernel call that
    actually capped something — zero on the un-capped path."""
    if n:
        ray.get(_actor().add.remote(name, int(n)))


def snapshot() -> dict[str, int]:
    return ray.get(_actor().snapshot.remote())


def reset() -> None:
    ray.get(_actor().reset.remote())
