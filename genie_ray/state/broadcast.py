"""Broadcast-once state sharing for actor pools.

The reference re-loads pickled tries + catalogs from disk in every DDP
process (`genie_base_pl.py:92-94`). Here the ``World`` (tokenizer dicts,
catalog dicts, CSR numpy tries) is ``ray.put`` ONCE on the driver; every
actor calls ``ray.get`` in ``__init__`` and plasma serves one shared copy
per node — nothing is re-shipped per batch or per task (SURVEY.md §4
"State sharing").
"""

from __future__ import annotations

import ray

from ..core.world import World

_LOCAL_CACHE = {}


def put_world(world: World) -> ray.ObjectRef:
    return ray.put(world)


def get_world(ref) -> World:
    """Resolve a world ref (or accept a World/CompactWorld passed directly
    in tests). Caches per-process so repeated actor constructions in one
    worker reuse the deserialized object."""
    from ..core.compact import CompactWorld

    if isinstance(ref, (World, CompactWorld)):
        return ref
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _LOCAL_CACHE:
        _LOCAL_CACHE[key] = ray.get(ref)
    return _LOCAL_CACHE[key]
