"""Launch the ask/tell HTTP service with the built-in web dashboard
(the analog of the reference's R-Shiny GUI, shiny/USAGE.md) and drive a
job against it so the dashboard has something to show.

Open http://127.0.0.1:7204/ in a browser while this runs.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import threading
import time
import urllib.request

from bayesian_optimization_tpu.service.http_server import serve

PORT = 7204
srv = serve(port=PORT)
threading.Thread(target=srv.serve_forever, daemon=True).start()
print(f"dashboard: http://127.0.0.1:{PORT}/")


def post(payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    return json.loads(urllib.request.urlopen(req).read())


def get(path):
    return json.loads(urllib.request.urlopen(f"http://127.0.0.1:{PORT}{path}").read())


job = post({
    "search_param": {"x": {"type": "r", "range": [-5, 5], "N": 3}},
    "bo_param": {"max_iter": 15, "DoE_size": 5, "random_seed": 0},
})["job_id"]

for it in range(10):
    X = get(f"/?ask=null&job_id={job}")["X"]
    y = [float(sum(v ** 2 for k, v in d.items())) for d in X]
    post({"job_id": job, "X": X, "y": y})
    st = get(f"/?status=null&job_id={job}")["job"]
    print(f"iter {st['iteration']}: evals {st['eval_count']}, best {st['fopt']:.4g}")
    time.sleep(1)  # give a human time to watch the dashboard update

print("job left running for inspection; Ctrl-C to exit")
try:
    time.sleep(60)
except KeyboardInterrupt:
    pass
