"""Multi-host layer: mesh construction, request routing, role split,
scaling-efficiency math (single-process semantics; the pod behavior is the
same code under jax.distributed)."""
import jax
import numpy as np
import pytest

from gemma_tpu.parallel import multihost


def test_make_multihost_mesh_single_host():
    mesh = multihost.make_multihost_mesh(n_model=4)
    assert mesh.shape["model"] == 4
    assert mesh.shape["data"] == len(jax.devices()) // 4


def test_mesh_rejects_tp_across_dcn():
    n_local = len(jax.devices())
    with pytest.raises(ValueError):
        multihost.make_multihost_mesh(n_model=n_local * 2)


def test_request_routing_stable_and_partitioned():
    class R:
        def __init__(self, id):
            self.id = id

    reqs = [R(f"req-{i}") for i in range(64)]
    # partition across 4 hypothetical hosts: disjoint and complete
    parts = [
        [r for r in reqs if multihost.route_request(r.id, 4) == h]
        for h in range(4)
    ]
    assert sum(len(p) for p in parts) == 64
    assert all(multihost.route_request("req-3", 4) == multihost.route_request("req-3", 4) for _ in range(3))
    # this process (process 0 single-host) admits exactly partition 0
    assert [r.id for r in multihost.local_requests(reqs, 1)] == [r.id for r in reqs]


def test_host_roles():
    roles = multihost.HostRoles.uniform(4)
    assert roles.is_prefill(2) and roles.is_decode(2)
    dis = multihost.HostRoles.disaggregated(1, 4)
    assert dis.is_prefill(0) and not dis.is_decode(0)
    assert dis.is_decode(3) and not dis.is_prefill(3)
    with pytest.raises(ValueError):
        multihost.HostRoles.disaggregated(4, 4)


def test_scaling_efficiency_math():
    eff = multihost.scaling_efficiency({1: 100.0, 2: 190.0, 4: 340.0})
    assert eff[1] == 1.0
    assert eff[2] == pytest.approx(0.95)
    assert eff[4] == pytest.approx(0.85)
