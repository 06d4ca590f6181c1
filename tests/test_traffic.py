"""Tests for the grid-network traffic instance generator (config 3)."""
import numpy as np

import bsls_tpu as bsls
from bsls_tpu.models import oracle_solve
from bsls_tpu.models.traffic import grid_network, grid_traffic, k_routes

import pytest


def test_grid_network_structure():
    n, edges, adj = grid_network(4, 5)
    assert n == 20
    # each interior node has 4 outgoing edges
    deg = {u: len(v) for u, v in adj.items()}
    assert max(deg.values()) == 4
    # all edges are grid neighbours
    for u, v in edges:
        ui, uj = divmod(u, 5)
        vi, vj = divmod(v, 5)
        assert abs(ui - vi) + abs(uj - vj) == 1


def test_k_routes_distinct_and_connected():
    rng = np.random.default_rng(0)
    n, edges, adj = grid_network(6, 6)
    routes = k_routes(adj, len(edges), 0, 35, 4, rng)
    assert 1 <= len(routes) <= 4
    assert len({tuple(r) for r in routes}) == len(routes)
    for r in routes:
        # path continuity: consecutive edges share a node
        assert edges[r[0]][0] == 0
        assert edges[r[-1]][1] == 35
        for a, b in zip(r[:-1], r[1:]):
            assert edges[a][1] == edges[b][0]


def test_grid_traffic_instance_valid():
    prob = grid_traffic(seed=1, nx=8, ny=8, num_od=40, num_eq=8)
    # planted x feasible and consistent with constraints
    off = 0
    for s in prob.partition.sizes:
        assert abs(prob.x_true[off : off + s].sum() - 1) < 1e-9
        off += s
    np.testing.assert_allclose(prob.C.matvec(prob.x_true), prob.d)
    # b close to A x_true
    r = prob.A.matvec(prob.x_true) - prob.b
    assert np.abs(r).max() < 0.1


@pytest.mark.slow
def test_grid_traffic_solves_to_oracle():
    prob = grid_traffic(seed=2, nx=8, ny=8, num_od=40, num_eq=0, noise=1e-3)
    prob2 = bsls.Problem(A=prob.A, b=prob.b, partition=prob.partition)
    orc = oracle_solve(prob2, tol_gap=1e-9, max_iter=30000)
    res = bsls.solve(prob2, method="apgd", tol=1e-9, max_iter=6000, chunk=300)
    rel = (float(res.objective) - orc.objective) / max(1.0, orc.objective)
    assert rel <= 1e-5
