"""Run a small BBOB experiment and write cocopp-compatible data
(.info/.dat/.tdat — the file layout of the reference's fgeneric logger,
ref: benchmark/fgeneric.py + benchmark/run_sequential.py)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import tempfile

from benchmark.harness import run_suite

out = tempfile.mkdtemp(prefix="coco_")
records = run_suite(
    fids=[1, 8],          # sphere, Rosenbrock
    dims=(2,),
    instances=(1, 2),
    max_FEs=30,
    seed=0,
    coco_dir=out,
)
for r in records:
    print(f"F{r['fid']} dim {r['dim']} inst {r['instance']}: "
          f"final regret {r['final_regret']:.3g} in {r['n_evals']} evals")
print(f"\nCOCO data written under {out}:")
for root, _, files in _os.walk(out):
    for f in sorted(files):
        print(" ", _os.path.relpath(_os.path.join(root, f), out))
print("\npost-process with: python -m cocopp", out)
