"""IPC service tests (reference IPCService protocol)."""

import numpy as np
import pytest

from jvector_tpu.bench.ipc import IPCClient, IPCService
from jvector_tpu.util.datasets import synthetic_dataset


@pytest.fixture()
def service(tmp_path):
    svc = IPCService(str(tmp_path / "jvtpu.sock"))
    svc.start()
    yield svc
    svc.stop()


def fmt(vs):
    return " ".join("[" + ",".join(f"{x:.5f}" for x in v) + "]" for v in vs)


def test_ipc_lifecycle(service, tmp_path):
    ds = synthetic_dataset(n=400, dim=8, n_queries=5, k=5, seed=3)
    c = IPCClient(service.socket_path)
    try:
        assert c.call("CREATE 8 euclidean 8 24") == "OK"
        for i in range(0, 400, 100):
            assert c.call("WRITE " + fmt(ds.base[i : i + 100])) == "OK"
        r = c.call("OPTIMIZE")
        assert r == "OK 400"
        resp = c.call(f"SEARCH 24 5 {fmt(ds.queries[:3])}")
        assert resp.startswith("RESULT ")
        rows = resp[len("RESULT "):].split(";")
        assert len(rows) == 3
        # top-1 matches ground truth for most queries
        hits = sum(
            int(rows[q].split()[0]) in set(ds.ground_truth[q][:5].tolist())
            for q in range(3)
        )
        assert hits >= 2
        mem = c.call("MEMORY")
        assert mem.startswith("OK ") and int(mem.split()[1]) > 0
    finally:
        c.close()


def test_ipc_errors(service):
    c = IPCClient(service.socket_path)
    try:
        assert c.call("SEARCH 10 5 [1,2]").startswith("ERROR")
        assert c.call("WRITE [1,2,3]").startswith("ERROR")
        assert c.call("BOGUS").startswith("ERROR unknown")
        assert c.call("CREATE 4 euclidean 8 16") == "OK"
        assert c.call("WRITE [1,2,3]").startswith("ERROR expected dim 4")
        assert c.call("OPTIMIZE").startswith("ERROR no vectors")
    finally:
        c.close()


def test_ipc_incremental_optimize(service):
    ds = synthetic_dataset(n=300, dim=8, n_queries=4, k=5, seed=9)
    c = IPCClient(service.socket_path)
    try:
        assert c.call("CREATE 8 euclidean 8 24") == "OK"
        assert c.call("WRITE " + fmt(ds.base[:200])) == "OK"
        assert c.call("OPTIMIZE") == "OK 200"
        assert c.call("WRITE " + fmt(ds.base[200:])) == "OK"
        assert c.call("OPTIMIZE") == "OK 300"  # incremental add_nodes path
        resp = c.call(f"SEARCH 24 5 {fmt(ds.queries[:2])}")
        assert resp.startswith("RESULT ")
    finally:
        c.close()


def test_ipc_save_load_roundtrip(service, tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(200, 8)).astype(np.float32)
    path = str(tmp_path / "ipc_index.jvtpu")
    c = IPCClient(service.socket_path)
    try:
        assert c.call("CREATE 8 euclidean 8 24") == "OK"
        assert c.call("WRITE " + fmt(data)).startswith("OK")
        assert c.call("OPTIMIZE").startswith("OK")
        assert c.call(f"SAVE {path}") == "OK"
    finally:
        c.close()
    c = IPCClient(service.socket_path)  # fresh session serves from file
    try:
        assert c.call(f"LOAD {path}") == "OK 200"
        resp = c.call("SEARCH 24 1 " + fmt(data[7:8]))
        assert resp.startswith("RESULT")
        assert resp.split()[1].split(";")[0] == "7"  # self-match
    finally:
        c.close()
