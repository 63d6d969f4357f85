"""Linearization parse / emit — the GenIE wire format for triples.

A linearized triple sequence is ``" <sub> S <rel> R <obj> O <et>"`` repeated
per triple and concatenated. Semantics mirror the reference implementation
(`/root/reference/genie/datamodule/utils/triplet_utils.py:6-35`):

* parsing regex-splits on the tag alternation, strips each part, drops empty
  parts, chunks the remainder into 3-tuples (a trailing partial triple — i.e.
  ``len(parts) % 3 != 0`` — is silently dropped, with an optional warning),
  and optionally deduplicates into a set;
* emitting formats each triple as ``" <sub> {s} <rel> {r} <obj> {o} <et>"``
  with each element ``strip()``-ed, and joins with no separator.

Pure functions, no Ray: used identically by the single-process oracle and by
the distributed ``map_batches`` stages.
"""

from __future__ import annotations

import re
import warnings
from typing import List, Sequence, Set, Tuple

Triple = Tuple[str, str, str]

# Tag alternation used by the reference parser (triplet_utils.py:7).
_TAG_SPLIT_RE = re.compile(r"<sub>|<rel>|<obj>|<et>")

SUB_TAG = "<sub>"
REL_TAG = "<rel>"
OBJ_TAG = "<obj>"
ET_TAG = "<et>"


def parse_linearization(
    text: str, verbose: bool = False, return_set: bool = True
) -> Set[Triple] | List[Triple]:
    """Parse a linearized sequence into triples.

    Mirrors ``TripletUtils.convert_text_sequence_to_text_triples``
    (`triplet_utils.py:6-21`): malformed tails (parts % 3 != 0) are dropped,
    duplicates removed when ``return_set``. ``None`` input (a nulled
    prediction, `genie_base_pl.py:234-239`) parses as the empty set.
    """
    if text is None:
        text = ""
    parts = [p.strip() for p in _TAG_SPLIT_RE.split(text) if p.strip()]
    if verbose and len(parts) % 3 != 0:
        warnings.warn(
            f"Textual sequence ```{text}``` does not follow the "
            "<sub>, <rel>, <obj>, <et> format!"
        )
    triples = [tuple(parts[i : i + 3]) for i in range(0, len(parts) - 2, 3)]
    if not return_set:
        return triples
    unique = set(triples)
    if verbose and len(unique) != len(triples):
        warnings.warn(f"Textual sequence ```{text}``` has duplicated triplets!")
    return unique


def linearize_triples(triples: Sequence[Triple]) -> str:
    """Format triples to the linearized wire format.

    Mirrors ``TripletUtils.triples_to_output_format`` (`triplet_utils.py:23-35`)
    including the leading space before every tag and element-level strip().
    """
    out = []
    for sub, rel, obj in triples:
        out.append(
            f" {SUB_TAG} {sub.strip()} {REL_TAG} {rel.strip()}"
            f" {OBJ_TAG} {obj.strip()} {ET_TAG}"
        )
    return "".join(out)
