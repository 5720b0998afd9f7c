"""Compatibility patches that let the REFERENCE (bayes_optim v0.3.0 at
/root/reference) run against the sklearn installed here, so the parity
runner can produce a real head-to-head instead of recording environment
crashes. The first two patches adapt APIs that drifted since the reference
was released and do not change reference behavior; the third (r2_score) is
deliberately GENEROUS to the reference: r2_score has always rejected NaN
inputs, so the reference would crash on NaN predictions under its own era's
sklearn too — the shim rescues it by scoring the finite subset so the parity
run can continue.

- sklearn >= 1.4 removed OneHotEncoder(sparse=...) in favor of
  sparse_output= (used by bayes_optim/surrogate/random_forest.py:102).
- sklearn >= 1.0 rejects 1-D inputs to PCA.transform; the reference's
  PCABO passes single rows (bayes_optim/extension.py penalized acquisition
  path). We reshape to 2-D and restore the original shape.
- the reference's tell() logs r2 unconditionally (bayes_optim/base.py:
  444-446) and its GP can emit NaN rows mid-run; we score on the finite
  subset (1-D inputs only — multioutput calls fall through untouched) so
  the run continues, mirroring how the reference's own acquisition swallows
  NaN by returning 0 (acquisition_fun.py:136-137).

Call apply() BEFORE importing bayes_optim.
"""
from __future__ import annotations

import inspect

import numpy as np


def apply() -> None:
    import sklearn.preprocessing as skp

    if "sparse" not in inspect.signature(skp.OneHotEncoder.__init__).parameters:
        _OHE = skp.OneHotEncoder

        # sklearn introspects __init__ signatures (get_params/clone), so the
        # shim must spell out the current parameters explicitly + `sparse`.
        _params = [
            p for p in inspect.signature(_OHE.__init__).parameters.values()
            if p.name != "self"
        ]
        _names = [p.name for p in _params]

        class OneHotEncoder(_OHE):  # noqa: D101
            def __init__(self, **kwargs):
                sparse = kwargs.pop("sparse", None)
                if sparse is not None and "sparse_output" not in kwargs:
                    kwargs["sparse_output"] = sparse
                super().__init__(**kwargs)
                # `sparse` is in the synthesized __signature__ below, so
                # get_params()/clone() will getattr(self, 'sparse'): the
                # attribute must exist or every fit crashes (sklearn
                # _validate_params -> get_params).
                self.sparse = sparse

        _sig_params = [
            inspect.Parameter("self", inspect.Parameter.POSITIONAL_OR_KEYWORD)
        ] + [
            inspect.Parameter(n, inspect.Parameter.KEYWORD_ONLY,
                              default=p.default)
            for n, p in zip(_names, _params)
        ] + [
            inspect.Parameter("sparse", inspect.Parameter.KEYWORD_ONLY,
                              default=None)
        ]
        OneHotEncoder.__init__.__signature__ = inspect.Signature(_sig_params)
        skp.OneHotEncoder = OneHotEncoder
        try:
            import sklearn.preprocessing._encoders as _enc

            _enc.OneHotEncoder = OneHotEncoder
        except ImportError:
            pass

    from sklearn.decomposition import PCA

    if not getattr(PCA.transform, "_ref_shim", False):
        _transform = PCA.transform
        _inverse = PCA.inverse_transform

        def transform(self, X):
            X = np.asarray(X)
            if X.ndim == 1:
                return _transform(self, X.reshape(1, -1))[0]
            return _transform(self, X)

        def inverse_transform(self, X):
            X = np.asarray(X)
            if X.ndim == 1:
                return _inverse(self, X.reshape(1, -1))[0]
            return _inverse(self, X)

        transform._ref_shim = True
        inverse_transform._ref_shim = True
        PCA.transform = transform
        PCA.inverse_transform = inverse_transform

    import sklearn.metrics as skm

    if not getattr(skm.r2_score, "_ref_shim", False):
        _r2 = skm.r2_score

        def r2_score(y_true, y_pred, **kwargs):
            y_true = np.asarray(y_true, dtype=float)
            y_pred = np.asarray(y_pred, dtype=float)
            if y_true.ndim != 1 or y_pred.ndim != 1:
                # multioutput arrays: boolean-mask flattening would corrupt
                # shape/scoring — leave those calls to the original.
                return _r2(y_true, y_pred, **kwargs)
            ok = np.isfinite(y_true) & np.isfinite(y_pred)
            if ok.sum() < 2:
                return float("nan")
            if not ok.all():
                y_true, y_pred = y_true[ok], y_pred[ok]
            return _r2(y_true, y_pred, **kwargs)

        r2_score._ref_shim = True
        skm.r2_score = r2_score
        try:
            import bayes_optim.base as _rb

            if getattr(_rb, "r2_score", None) is _r2:
                _rb.r2_score = r2_score
        except ImportError:
            pass
