"""The constrained "world": catalogs + tokenizer + tries, bundled.

The reference assembles this state per process: tokenizer from the
checkpoint (`genie_base_pl.py:69-81`), pickled entity/relation tries
(`genie_base_pl.py:92-94`), and the surface-form dicts
(`surface_forms_utils.py:250-262`). Here it is built ONCE on the driver from
the two catalog tables, then shipped to every actor with a single
``ray.put`` — the state is plain dicts + numpy arrays (no pickled object
graphs), so plasma shares one copy per node (SURVEY.md §4 "State sharing").
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple

from .catalog import Catalog
from .tokenizer import DetTokenizer
from .trie import FlatTrie


@dataclass
class World:
    tokenizer: DetTokenizer
    entities: Catalog
    relations: Catalog
    entities_trie: FlatTrie
    relations_trie: FlatTrie
    # token-id-tuple → canonical surface (exact catalog string recovery)
    surface_lookup: Dict[Tuple[int, ...], str] = field(default_factory=dict)

    @classmethod
    def build(cls, entities: Catalog, relations: Catalog, dedup_titles: bool = True) -> "World":
        """Title-dedup the catalogs (reference `utils.py:71-104` — done
        before any trie/dict is built, `init_surface_form_dicts.py:9-27`),
        build the shared tokenizer vocabulary from all surfaces, then the
        two tries exactly as ``get_trie_from_strings`` does (`trie.py:7-41`:
        sorted, leading space, BOS stripped → EOS-terminated sequences)."""
        if dedup_titles:
            entities = entities.dedup_surfaces()
            relations = relations.dedup_surfaces()
        tokenizer = DetTokenizer(entities.surfaces() + relations.surfaces())
        entities_trie = FlatTrie.from_strings(entities.surfaces(), tokenizer)
        relations_trie = FlatTrie.from_strings(relations.surfaces(), tokenizer)
        lookup: Dict[Tuple[int, ...], str] = {}
        for s in entities.surfaces() + relations.surfaces():
            ids = tuple(tokenizer.encode(f" {s}")[1:-1])  # strip BOS/EOS
            lookup[ids] = s
        return cls(tokenizer, entities, relations, entities_trie, relations_trie, lookup)

    def compact(self) -> "CompactWorld":
        """Buffer-backed form for broadcast at paper-scale catalogs
        (`core/compact.py`): identical extraction semantics, O(1)
        per-process deserialization instead of rebuilding millions of
        dict entries per worker."""
        from .compact import CompactWorld

        # rebuild from the (already title-deduped) catalogs; dedup again
        # is a no-op on deduped input
        return CompactWorld.build(
            self.entities, self.relations, dedup_titles=False
        )

    def make_extractor(
        self,
        num_beams: int = 10,
        validate_with_fsm: bool = True,
        max_input_tokens: int = 256,
        decode_mode: str = "scan",
    ):
        from .extractor import DeterministicExtractor

        return DeterministicExtractor(
            self.tokenizer,
            self.entities_trie,
            self.relations_trie,
            num_beams=num_beams,
            validate_with_fsm=validate_with_fsm,
            surface_lookup=self.surface_lookup,
            max_input_tokens=max_input_tokens,
            decode_mode=decode_mode,
        )
