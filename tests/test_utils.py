"""Tests for utils: bijection, order statistics, connected components.

Mirrors the behavior of the reference's Bijection.hs, VectorUtil.hs and
GroupConnectedComponents.hs (see SURVEY.md section 2, items 1-3).
"""

import numpy as np
import pytest

from housescan_tpu.utils import (
    biject,
    group_connected_components,
    kth_largest_by,
    kth_smallest_by,
    ord_nub,
)
from housescan_tpu.utils.vector_util import top_fraction_threshold


class TestBijection:
    def test_ord_nub_keeps_first_occurrence_order(self):
        assert ord_nub([3, 1, 3, 2, 1, 5]) == [3, 1, 2, 5]

    def test_biject_round_trip(self):
        items = ["c", "a", "c", "b"]
        index_of, item_of = biject(items)
        assert [index_of(x) for x in ["c", "a", "b"]] == [0, 1, 2]
        assert [item_of(i) for i in range(3)] == ["c", "a", "b"]

    def test_biject_unknown_key_raises(self):
        index_of, _ = biject([1, 2])
        with pytest.raises(KeyError):
            index_of(99)


class TestKthBy:
    def test_kth_smallest_numpy(self):
        pts = np.array([[5.0], [1.0], [3.0], [2.0], [4.0]])
        assert kth_smallest_by(lambda p: p[:, 0], 1, pts)[0] == 1.0
        assert kth_smallest_by(lambda p: p[:, 0], 3, pts)[0] == 3.0

    def test_kth_largest_numpy(self):
        pts = np.array([[5.0], [1.0], [3.0], [2.0], [4.0]])
        assert kth_largest_by(lambda p: p[:, 0], 1, pts)[0] == 5.0
        assert kth_largest_by(lambda p: p[:, 0], 2, pts)[0] == 4.0

    def test_kth_jax(self):
        import jax.numpy as jnp

        pts = jnp.array([[5.0, 0.0], [1.0, 1.0], [3.0, 2.0]])
        out = kth_smallest_by(lambda p: p[:, 0], 2, pts)
        assert float(out[0]) == 3.0

    def test_invalid_k(self):
        with pytest.raises(ValueError):
            kth_smallest_by(lambda p: p, 0, np.zeros(3))

    def test_top_fraction_threshold(self):
        import jax.numpy as jnp

        vals = jnp.arange(10.0)  # 0..9
        # 20% of 10 = 2 discarded -> threshold is the 2nd largest = 8
        thr = top_fraction_threshold(vals, 0.2)
        assert float(thr) == 8.0
        kept = vals[vals <= thr]
        assert kept.shape[0] == 9  # points <= threshold survive (ref Main.hs:2658)


class TestConnectedComponents:
    def test_two_components(self):
        edges = [((1, 2), "a"), ((3, 4), "b"), ((2, 5), "c")]
        comps = group_connected_components(edges)
        assert len(comps) == 2
        assert comps[0] == [((1, 2), "a"), ((2, 5), "c")]
        assert comps[1] == [((3, 4), "b")]

    def test_single_component_chain(self):
        edges = [((i, i + 1), i) for i in range(10)]
        comps = group_connected_components(edges)
        assert len(comps) == 1
        assert comps[0] == edges

    def test_empty(self):
        assert group_connected_components([]) == []

    def test_payloads_preserved_with_duplicate_edges(self):
        edges = [((1, 2), "x"), ((1, 2), "y")]
        comps = group_connected_components(edges)
        assert comps == [[((1, 2), "x"), ((1, 2), "y")]]

    def test_string_nodes(self):
        edges = [(("a", "b"), 1), (("c", "d"), 2), (("b", "c"), 3), (("e", "f"), 4)]
        comps = group_connected_components(edges)
        assert len(comps) == 2
        assert sum(len(c) for c in comps) == 4
