"""A4: live id→surface lookup fallback with a shared memoization cache.

Reference `surface_forms_utils.py:310-404`: on a catalog miss the
reference queries Wikidata live (pywikibot — en_title sitelink first,
en_label only when ``allow_labels``) and memoizes the result into the
shared surface-form dict, so each id pays the network round-trip once
per run.

Ray-first shape: the memo is SHARED MUTABLE state — the one case the
design brief carves out for a raw ``@ray.remote`` actor (Dataset stages
carry only per-actor state). :class:`LookupCacheActor` owns the
authoritative memo; annotate stages batch their per-block misses into
ONE ``resolve_many`` call per batch (unique ids only), so actor traffic
is O(blocks), not O(rows), and each worker process additionally folds
resolved entries into its broadcast-catalog replica (the reference's
``update``) so repeat ids in later batches never leave the process.

The network fetch itself is INJECTED (``fetch_fn(wikidata_id,
allow_labels) -> (surface, provenance)``): this sandbox is closed-world
(no network), so the default fetcher raises ``NotImplementedError`` at
first use — an honest capability gate, same pattern as the HF backend —
and tests inject a deterministic offline fetcher.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional, Tuple

import ray

Entry = Tuple[Optional[str], Optional[str]]  # (surface, provenance)


def _no_network(wikidata_id: str, allow_labels: bool) -> Entry:
    raise NotImplementedError(
        "live Wikidata lookup requires network access (pywikibot, "
        "reference surface_forms_utils.py:311-347); this environment is "
        "closed-world — inject fetch_fn= with an offline resolver"
    )


def offline_fetcher(
    table: Dict[str, Entry]
) -> Callable[[str, bool], Entry]:
    """Deterministic stand-in fetcher from a dict — mirrors the
    reference's fetch semantics: en_title entries always resolve,
    en_label entries resolve only when ``allow_labels`` (the reference
    only *queries* labels under that flag, :325-331)."""

    def fetch(wikidata_id: str, allow_labels: bool) -> Entry:
        surface, prov = table.get(wikidata_id, (None, None))
        if prov == "en_label" and not allow_labels:
            return None, None
        return surface, prov

    return fetch


@ray.remote
class LookupCacheActor:
    """Cluster-wide lookup memo. ``cache_misses=True`` (default) also
    memoizes (None, None) so an unresolvable id is fetched at most once
    per run — the reference refetches misses every call (:376-392);
    pass ``cache_misses=False`` for byte-faithful reference behavior."""

    def __init__(
        self,
        fetch_fn: Optional[Callable[[str, bool], Entry]] = None,
        cache_misses: bool = True,
    ):
        self._memo: Dict[str, Entry] = {}
        self._fetch = fetch_fn or _no_network
        self._cache_misses = cache_misses
        self._hits = 0
        self._fetches = 0

    def resolve_many(
        self, ids: Iterable[str], allow_labels: bool = False
    ) -> Dict[str, Entry]:
        """id → (surface, provenance) for each requested id; fetches and
        memoizes the ones not seen before. The en_label gate applies at
        READ time (`:395-399`): a memoized label entry returns (None,
        None) to a caller without ``allow_labels``."""
        out: Dict[str, Entry] = {}
        for _id in ids:
            if _id in self._memo:
                self._hits += 1
                entry = self._memo[_id]
            else:
                self._fetches += 1
                # Always fetch WITH labels: the memo is shared across
                # callers with different allow_labels, so a label-blind
                # fetch memoized as a miss would poison later
                # allow_labels=True callers. The gate applies at read
                # time below, never at fetch time.
                entry = self._fetch(_id, True)
                if entry[0] is not None or self._cache_misses:
                    self._memo[_id] = entry
            surface, prov = entry
            if prov == "en_label" and not allow_labels:
                out[_id] = (None, None)
            else:
                out[_id] = (surface, prov)
        return out

    def stats(self) -> dict:
        return {
            "size": len(self._memo),
            "hits": self._hits,
            "fetches": self._fetches,
        }

    def snapshot(self) -> Dict[str, Entry]:
        """The memo contents — persist into the catalog Parquet after a
        run so the next run's broadcast world starts warm (the
        reference pickles the updated dict the same way)."""
        return dict(self._memo)
