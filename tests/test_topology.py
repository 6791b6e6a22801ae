import numpy as np
import pytest

from traffic_env_tpu.topology import GridRoad


@pytest.mark.parametrize("m,n", [(1, 1), (2, 2), (3, 3), (2, 5)])
def test_shapes(m, n):
    g = GridRoad(m, n, 100.0)
    v = m * n
    assert g.intersections == v
    assert g.train_roads == 4 * v
    assert g.roads == 4 * v + 2 * n + 2 * m
    assert g.dest.shape == (g.roads,)
    assert (g.dest[:g.train_roads] == np.arange(g.train_roads) % v).all()
    assert (g.dest[g.train_roads:] == -1).all()


def test_phase_groups():
    g = GridRoad(3, 3, 100.0)
    v = 9
    assert (g.phase_group[:2 * v] == 1).all()      # horizontal roads
    assert (g.phase_group[2 * v:4 * v] == 0).all()  # vertical roads


@pytest.mark.parametrize("m,n", [(1, 1), (3, 3), (2, 4)])
def test_next_chains_reach_exit(m, n):
    """Every training road chain walks straight off the map."""
    g = GridRoad(m, n, 100.0)
    for i in range(g.train_roads):
        j, hops = i, 0
        while g.nxt[j] >= 0:
            j = g.nxt[j]
            hops += 1
            assert hops <= max(m, n) + 1
        assert g.dest[j] == -1  # ends on an exit road


def test_prev_is_inverse_of_next():
    g = GridRoad(3, 3, 100.0)
    for i in range(g.roads):
        if g.nxt[i] >= 0:
            assert g.prev[g.nxt[i]] == i
    # entry roads and off-map heads have no feeder
    assert (g.prev[g.entrypoints] == -1).all()


def test_entry_masks():
    g = GridRoad(3, 3, 100.0)
    g.set_entry_mask(0)
    assert len(g.entrypoints) == 12  # all four sides of a 3x3
    assert g.open_sides(0) == 4
    g.set_entry_mask(0b1110)
    assert g.open_sides(0b1110) == 1
    np.testing.assert_array_equal(g.entrypoints, [0, 3, 6])  # west side only
    g.set_entry_mask(0b1111)
    assert len(g.entrypoints) == 0


def test_next_road_formulas():
    g = GridRoad(2, 2, 100.0)
    v = 4
    # eastbound (0,0) -> (0,1): road 0 -> road 1
    assert g.nxt[0] == 1
    # eastbound at col n-1 exits east: road 1 -> 4v + n + row
    assert g.nxt[1] == 4 * v + 2 + 0
    # westbound at col 0 exits west
    assert g.nxt[v + 0] == 4 * v + 2 * 2 + 2 + 0
    # northbound at top row exits north
    assert g.nxt[2 * v + 2] == 4 * v + 2 + 2 + 0
    # southbound at row 0 exits south
    assert g.nxt[3 * v + 0] == 4 * v + 0
