"""Remote ask/tell HTTP service end-to-end over a real socket
(the reference documents this protocol but ships no server; see
example/example_remote.py + shiny/USAGE.md)."""
import json
import threading
import urllib.request

import numpy as np
import pytest

from bayesian_optimization_tpu.service.http_server import serve


@pytest.fixture(scope="module")
def server():
    srv = serve(port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def _get(url):
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read())


def test_full_protocol_roundtrip(server):
    create = {
        "search_param": {
            "x": {"type": "r", "range": [-5, 5], "N": 2, "precision": 4},
            "k": {"type": "i", "range": [0, 10], "N": 1},
            "c": {"type": "c", "range": ["a", "b"], "N": 1},
        },
        "bo_param": {"n_point": 1, "max_iter": 10, "DoE_size": 4, "minimize": True, "n_obj": 1, "random_seed": 0},
    }
    job_id = _post(server, create)["job_id"]
    assert job_id

    def obj(d):
        return float(d["x0"] ** 2 + d["x1"] ** 2 + d["k"] + (0 if d["c"] == "a" else 1))

    for _ in range(2):
        out = _get(f"{server}/?ask=null&job_id={job_id}")
        X = out["X"]
        assert len(X) >= 1 and {"x0", "x1", "k", "c"} <= set(X[0])
        y = [obj(x) for x in X]
        ack = _post(server, {"job_id": job_id, "X": X, "y": y})
        assert ack["iteration"] >= 1

    rec = _get(f"{server}/?recommend=null&job_id={job_id}")
    assert "xopt" in rec and len(rec["fopt"]) == 1

    fin = _get(f"{server}/?finalize=null&job_id={job_id}")
    assert fin["finalized"]


def test_unknown_job_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/?ask=null&job_id=nope")
    assert e.value.code == 404


def test_bad_post_400(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, {"nonsense": 1})
    assert e.value.code == 400


def test_health_endpoint(server):
    out = _get(f"{server}/health")
    assert out["status"] == "ok"


def test_dashboard_html(server):
    with urllib.request.urlopen(f"{server}/") as r:
        assert "text/html" in r.headers["Content-Type"]
        body = r.read().decode()
    assert "Bayesian-optimization service" in body and "?status=null" in body


def test_status_endpoint(server):
    create = {
        "search_param": {"x": {"type": "r", "range": [-5, 5], "N": 2}},
        "bo_param": {"n_point": 1, "max_iter": 5, "DoE_size": 3, "random_seed": 1},
    }
    job_id = _post(server, create)["job_id"]
    st = _get(f"{server}/?status=null&job_id={job_id}")["job"]
    assert st["eval_count"] == 0 and st["best_so_far"] == [] and st["fopt"] is None

    out = _get(f"{server}/?ask=null&job_id={job_id}")
    y = [float(x["x0"] ** 2 + x["x1"] ** 2) for x in out["X"]]
    _post(server, {"job_id": job_id, "X": out["X"], "y": y})

    st = _get(f"{server}/?status=null&job_id={job_id}")["job"]
    assert st["eval_count"] == len(y)
    assert st["fopt"] == pytest.approx(min(y))
    best = st["best_so_far"]  # one point per iteration (hist_f semantics)
    assert best == [pytest.approx(min(y))]
    assert all(a >= b for a, b in zip(best, best[1:]))

    alljobs = _get(f"{server}/?status=null")["jobs"]
    assert any(j["job_id"] == job_id for j in alljobs)
    _get(f"{server}/?finalize=null&job_id={job_id}")
