"""Bijections between key sets and contiguous integer ranges.

Capability parity with the reference's Bijection module
(ref Bijection.hs:16-32): map an ordered key collection (with duplicates)
to ``0..n-1`` preserving first-occurrence order, with both directions.
Used to turn room/plane IDs into dense indices for solver matrices.
"""

from __future__ import annotations

from typing import Callable, Hashable, Iterable, List, Tuple, TypeVar

T = TypeVar("T", bound=Hashable)


def ord_nub(items: Iterable[T]) -> List[T]:
    """Deduplicate, keeping the first occurrence of each item, in order.

    (ref Bijection.hs:27-32; Python dicts preserve insertion order so this
    is a one-liner here.)
    """
    return list(dict.fromkeys(items))


def biject(items: Iterable[T]) -> Tuple[Callable[[T], int], Callable[[int], T]]:
    """Return ``(index_of, item_of)`` mapping items <-> ``0..n-1``.

    First-occurrence order determines indices (ref Bijection.hs:16-24).
    ``index_of`` raises ``KeyError`` for unknown items; ``item_of`` raises
    ``IndexError`` for out-of-range indices.
    """
    uniq = ord_nub(items)
    index = {item: i for i, item in enumerate(uniq)}

    def index_of(item: T) -> int:
        return index[item]

    def item_of(i: int) -> T:
        return uniq[i]

    return index_of, item_of
