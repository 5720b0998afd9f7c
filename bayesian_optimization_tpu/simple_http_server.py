"""Alias module so `python -m bayesian_optimization_tpu.simple_http_server`
launches the ask/tell service — the entry-point name the reference's
example scripts expect (ref: example/example_remote.py:52-54; the module is
missing from the reference package itself)."""
from .service.http_server import main

if __name__ == "__main__":
    main()
