"""Remote ask/tell optimization service over HTTP/JSON.

The reference documents this protocol (shiny/USAGE.md, example/
example_remote.py:1-79) but the server module it launches
(`bayes_optim.simple_http_server`) is absent from its package — here it is
implemented for real, speaking the same JSON schema:

- POST {"search_param": {...}, "bo_param": {...}}   -> {"job_id": id}
- GET  ?ask=null&job_id=id                          -> {"job_id", "X": [dict, ...]}
- POST {"job_id": id, "X": [...], "y": [...]}       -> {"job_id", "iteration"}
- GET  ?finalize=null&job_id=id                     -> {"job_id", "finalized": true}
- GET  ?recommend=null&job_id=id                    -> {"xopt", "fopt"}

Implementation: stdlib ThreadingHTTPServer; one `BO`/`ParallelBO`/`MOBO`
per job keyed by a random id; jobs are independent so requests for
different jobs proceed concurrently (a per-job lock serializes ask/tell).
"""
from __future__ import annotations

import argparse
import json
import secrets
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np


class Job:
    def __init__(self, optimizer, max_iter: int):
        self.optimizer = optimizer
        self.max_iter = max_iter
        self.iteration = 0
        self.lock = threading.Lock()
        self.pending = None  # candidates awaiting a tell


def _build_optimizer(search_param: dict, bo_param: dict):
    from ..core.bo import BO, ParallelBO
    from ..core.mobo import MOBO
    from ..space import SearchSpace

    space = SearchSpace.from_dict(search_param)
    n_point = int(bo_param.get("n_point", 1))
    n_obj = int(bo_param.get("n_obj", 1))
    kwargs = dict(
        search_space=space,
        DoE_size=int(bo_param.get("DoE_size", 5)),
        max_FEs=int(bo_param.get("max_iter", 100)) * max(n_point, 1) + int(bo_param.get("DoE_size", 5)),
        n_job=int(bo_param.get("n_job", 1)),
        random_seed=bo_param.get("random_seed"),
        eval_type="dict",
    )
    if n_obj > 1:
        return MOBO(n_obj=n_obj, minimize=bo_param.get("minimize", True), **kwargs)
    kwargs["minimize"] = bool(bo_param.get("minimize", True))
    if n_point > 1:
        return ParallelBO(n_point=n_point, **kwargs)
    return BO(n_point=1, **kwargs)


class OptimizationService:
    """Job registry; the HTTP handler delegates here (also usable in-process)."""

    def __init__(self):
        self.jobs: Dict[str, Job] = {}
        self._lock = threading.Lock()

    def create(self, payload: dict) -> dict:
        optimizer = _build_optimizer(payload["search_param"], payload.get("bo_param", {}))
        job_id = secrets.token_urlsafe(12)
        with self._lock:
            self.jobs[job_id] = Job(optimizer, int(payload.get("bo_param", {}).get("max_iter", 100)))
        return {"job_id": job_id}

    def _job(self, job_id: Optional[str]) -> Job:
        if not job_id or job_id not in self.jobs:
            raise KeyError(f"unknown job_id {job_id!r}")
        return self.jobs[job_id]

    def ask(self, job_id: str) -> dict:
        job = self._job(job_id)
        with job.lock:
            X = job.optimizer.ask()
            job.pending = X
            clean = [
                {k: (v.item() if isinstance(v, np.generic) else v) for k, v in x.items()}
                for x in X
            ]
            return {"job_id": job_id, "X": clean}

    def tell(self, payload: dict) -> dict:
        job = self._job(payload.get("job_id"))
        with job.lock:
            X = payload["X"]
            y = payload["y"]
            job.optimizer.tell(X, y)
            job.iteration += 1
            return {"job_id": payload["job_id"], "iteration": job.iteration}

    def recommend(self, job_id: str) -> dict:
        job = self._job(job_id)
        with job.lock:
            xopt = job.optimizer.recommend()
            return {
                "job_id": job_id,
                "xopt": [dict(zip(job.optimizer.var_names, row)) for row in xopt.tolist()],
                "fopt": np.asarray(xopt.fitness, dtype=float).ravel().tolist(),
            }

    def finalize(self, job_id: str) -> dict:
        with self._lock:
            self.jobs.pop(job_id, None)
        return {"job_id": job_id, "finalized": True}


def make_handler(service: OptimizationService, verbose: bool = False):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            if verbose:
                super().log_message(fmt, *args)

        def _send(self, obj, code: int = 200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _error(self, exc: Exception, code: int = 400):
            self._send({"error": type(exc).__name__, "message": str(exc)}, code)

        def do_GET(self):
            q = parse_qs(urlparse(self.path).query)
            job_id = (q.get("job_id") or [None])[0]
            try:
                if "ask" in q:
                    self._send(service.ask(job_id))
                elif "finalize" in q:
                    self._send(service.finalize(job_id))
                elif "recommend" in q:
                    self._send(service.recommend(job_id))
                else:
                    self._send({"status": "ok", "jobs": len(service.jobs)})
            except KeyError as e:
                self._error(e, 404)
            except Exception as e:  # noqa: BLE001 - report to client
                self._error(e, 500)

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                if "search_param" in payload:
                    self._send(service.create(payload))
                elif "y" in payload:
                    self._send(service.tell(payload))
                else:
                    raise ValueError("POST body must contain 'search_param' (create) or 'y' (tell)")
            except (ValueError, KeyError) as e:
                self._error(e, 400)
            except Exception as e:  # noqa: BLE001
                self._error(e, 500)

    return Handler


def serve(port: int = 7200, host: str = "127.0.0.1", verbose: bool = False) -> ThreadingHTTPServer:
    service = OptimizationService()
    server = ThreadingHTTPServer((host, port), make_handler(service, verbose))
    server.service = service
    return server


def main(argv=None):
    parser = argparse.ArgumentParser(description="bayesian_optimization_tpu ask/tell HTTP service")
    parser.add_argument("-w", "--port", type=int, default=7200)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("-v", "--verbose", action="store_true")
    parser.add_argument("-d", "--daemon", action="store_true", help="detach via double fork")
    args = parser.parse_args(argv)
    if args.daemon:
        from .daemon import daemonize

        daemonize(pidfile=f"/tmp/bo_tpu_http_{args.port}.pid")
    server = serve(args.port, args.host, args.verbose)
    print(f"serving ask/tell on http://{args.host}:{args.port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
