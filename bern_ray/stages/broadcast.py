"""Broadcast-once helpers: ``ray.put`` on the driver, cached
``ray.get`` per worker process.

The pattern for small-side lookup state (vocabularies, dictionaries,
query matrices): put ONCE, ship the tiny ObjectRef inside task
closures / actor constructor kwargs, and deserialize at most once per
worker process — never once per batch (a plain ``ray.get`` in a batch
fn re-deserializes pickled payloads such as string arrays every call).

``put_broadcast`` also pins the ref in a module-level keepalive list:
refs that live only inside serialized dataset plans are borrowed, and
an actor restart after the driver-side variable goes out of scope
would otherwise fail to recover its constructor args (ray#53727).
"""

from __future__ import annotations

import ray

_KEEPALIVE: list = []
_CACHE: dict = {}


def put_broadcast(obj) -> "ray.ObjectRef":
    ref = ray.put(obj)
    _KEEPALIVE.append(ref)
    return ref


def get_broadcast(ref):
    """ray.get with a per-process deserialization cache."""
    key = ref.hex()
    if key not in _CACHE:
        _CACHE[key] = ray.get(ref)
    return _CACHE[key]
