"""Undirected connected components over edge lists with payloads.

Capability parity with the reference's GroupConnectedComponents
(ref GroupConnectedComponents.hs:16-54): partition ``[((node, node), data)]``
into connected components so the room-position least-squares never solves an
underconstrained joint system (ref Main.hs:2126-2140).

Graph partitioning is a host-side problem, not a device problem; this uses a
plain union-find (the reference used Data.Graph's array-based DFS).
"""

from __future__ import annotations

from typing import Dict, Hashable, List, Sequence, Tuple, TypeVar

N = TypeVar("N", bound=Hashable)
A = TypeVar("A")

Edge = Tuple[Tuple[N, N], A]


class _UnionFind:
    def __init__(self) -> None:
        self.parent: Dict[Hashable, Hashable] = {}

    def find(self, x: Hashable) -> Hashable:
        parent = self.parent
        if x not in parent:
            parent[x] = x
            return x
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    def union(self, a: Hashable, b: Hashable) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def group_connected_components(
    edges_data: Sequence[Edge],
) -> List[List[Edge]]:
    """Partition an edge list (with payloads) into connected components.

    Components are ordered by first appearance of any of their edges, and
    edges within a component keep input order. Self-loops stay in the
    component of their node. (ref GroupConnectedComponents.hs:16-33.)
    """
    uf = _UnionFind()
    for (i, j), _ in edges_data:
        uf.union(i, j)

    groups: Dict[Hashable, List[Edge]] = {}
    order: List[Hashable] = []
    for edge in edges_data:
        root = uf.find(edge[0][0])
        if root not in groups:
            groups[root] = []
            order.append(root)
        groups[root].append(edge)
    return [groups[r] for r in order]
