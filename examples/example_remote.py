"""Remote ask/tell optimization over HTTP (analog of ref
example/example_remote.py — whose server module this framework actually
ships: `python -m bayesian_optimization_tpu.simple_http_server -w 7200`)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import subprocess
import sys
import time
import urllib.request

import numpy as np

PORT = 7203
ADDRESS = f"http://127.0.0.1:{PORT}"

data = {
    "search_param": {
        "emissivity": {"type": "r", "range": [0.95, 1], "N": 2, "precision": 2},
        "offset": {"type": "r", "range": [-10, 10], "N": 2, "precision": 2},
        "power": {"type": "r", "range": [3.2, 3.8], "N": 1, "precision": 2},
    },
    "bo_param": {
        "n_job": 1, "n_point": 1, "max_iter": 20, "DoE_size": 3,
        "minimize": True, "n_obj": 1, "random_seed": 0,
    },
}


def obj(par):
    xs = np.asarray([v for k, v in par.items() if k.startswith("emissivity")])
    off = np.asarray([v for k, v in par.items() if k.startswith("offset")])
    return float(np.sum(xs**2) + abs(par["power"] - 3.5) + np.sum(off**2))


def post(payload):
    req = urllib.request.Request(
        ADDRESS, data=json.dumps(payload).encode(), headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def get(params):
    with urllib.request.urlopen(f"{ADDRESS}/?{params}") as r:
        return json.loads(r.read())


def main():
    proc = subprocess.Popen(
        [sys.executable, "-m", "bayesian_optimization_tpu.simple_http_server", "-w", str(PORT)]
    )
    try:
        time.sleep(3)
        job_id = post(data)["job_id"]
        print("job:", job_id)
        for i in range(3):
            out = get(f"ask=null&job_id={job_id}")
            y = [obj(x) for x in out["X"]]
            post({"job_id": job_id, "X": out["X"], "y": y})
            print(f"iter {i}: y = {y}")
        print(get(f"recommend=null&job_id={job_id}"))
        get(f"finalize=null&job_id={job_id}")
    finally:
        proc.terminate()  # exact pid, never by pattern
        proc.wait()


if __name__ == "__main__":
    main()
