"""Feature registry: operation configs -> labeled kernel list -> schema.

This is the engine's equivalent of the reference's FeatureCalculator
planning stage (calculator.py:48-95): each operation has a base name, a
parameter grid (list-valued params are cartesian-expanded, matching the
``itertools.product`` semantics of calculator.py:68-70), optional
z-score/abs preprocessing flags (preprocess_decorator, utils.py:39-53),
and a label formatter replicating the reference's value mangling
(calculator.py:16-39): ``-`` -> ``m``, ``.`` -> ``p``, list -> values
joined by ``_``; a ``_raw`` suffix when zscore varies within an op and
is off (calculator.py:76-78).

The compiled output is a FeatureSet: an ordered list of (label, fn)
pairs where fn(y: 1-D float64) -> float, plus the flat Spark schema.
Dict-returning kernels are flattened to ``label_key`` columns. Unlike
the reference — where each of ~3,400 labels re-runs its own pipeline —
the FeatureSet compiles into ONE kernel invocation per window batch
(kernel fusion by design, SURVEY.md §4.2).
"""

from __future__ import annotations

import itertools
from collections.abc import Callable
from dataclasses import dataclass, field

import numpy as np

from pyhctsa_spark.functions.kernels import zscore


def format_value(v) -> str:
    """Reference label-mangling (calculator.py:16-39)."""
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "_".join(format_value(x) for x in v)
    if isinstance(v, float):
        s = f"{v}".replace("-", "m").replace(".", "p")
        return s
    if isinstance(v, int):
        return str(v).replace("-", "m")
    return str(v)


@dataclass
class Operation:
    """One configured operation (a row of the reference YAML)."""

    func: Callable
    base_name: str
    ordered_args: list[str] = field(default_factory=list)
    configs: list[dict] = field(default_factory=lambda: [{}])
    # each config dict may carry 'zscore': bool and 'absval': bool plus
    # grid params (list values are expanded)


@dataclass
class Feature:
    label: str
    fn: Callable  # fn(y) -> float | dict
    zscore: bool
    absval: bool
    base_fn: Callable | None = None  # unbound kernel, for batched dispatch
    params: dict | None = None

    def __call__(self, y: np.ndarray):
        x = y
        if self.zscore:
            x = zscore(x)
        if self.absval:
            x = np.abs(x)
        return self.fn(x)


def expand(ops: list[Operation]) -> list[Feature]:
    """Cartesian-expand param grids into labeled features."""
    feats: list[Feature] = []
    for op in ops:
        zscore_values = set()
        for cfg in op.configs:
            zscore_values.add(bool(cfg.get("zscore", False)))
        for cfg in op.configs:
            cfg = dict(cfg)
            zs = bool(cfg.pop("zscore", False))
            ab = bool(cfg.pop("absval", False))
            grid_keys = [k for k, v in cfg.items() if isinstance(v, list)]
            scalar = {k: v for k, v in cfg.items() if k not in grid_keys}
            grids = [cfg[k] for k in grid_keys]
            for combo in itertools.product(*grids) if grids else [()]:
                params = {**scalar, **dict(zip(grid_keys, combo))}
                parts = [op.base_name]
                for a in op.ordered_args:
                    if a in params:
                        parts.append(format_value(params[a]))
                label = "_".join(parts)
                if len(zscore_values) > 1 and not zs:
                    label += "_raw"

                def make(fn=op.func, p=dict(params)):
                    return lambda y: fn(y, **p)

                feats.append(
                    Feature(label, make(), zs, ab, op.func, dict(params))
                )
    return feats


class FeatureSet:
    """Compiled plan: flat labeled scalar outputs + Spark schema.

    Kernels returning dicts contribute one column per key
    (``label_key``); scalars contribute ``label``. Column order is
    discovered once on a probe series and then fixed (Spark needs a
    static schema; the reference's label set is likewise fixed at plan
    time, calculator.py:48-95).
    """

    def __init__(self, features: list[Feature], probe_len: int = 256) -> None:
        self.features = features
        rng = np.random.default_rng(0)
        probe = rng.standard_normal(probe_len) * 2.0 + 5.0
        self.columns: list[str] = []
        self._shape: list[tuple[str, list[str] | None]] = []
        for f in features:
            try:
                out = f(probe)
            except Exception:
                out = float("nan")
            if isinstance(out, dict):
                keys = list(out.keys())
                self._shape.append((f.label, keys))
                self.columns.extend(f"{f.label}_{k}" for k in keys)
            else:
                self._shape.append((f.label, None))
                self.columns.append(f.label)

    @property
    def spark_schema(self) -> str:
        return ", ".join(f"`{c}` double" for c in self.columns)

    def compute(self, y: np.ndarray) -> tuple[list[float], int]:
        """Evaluate every feature on one series; errors -> NaN + count
        (the reference stores 'Error: ...' strings per feature instead
        of failing the extraction, calculator.py:101-104).

        The (double) z-scored series is computed once and shared across
        all zscored features — the reference re-runs the preprocess per
        feature (preprocess_decorator), which is pure waste at ~20
        zscored features per catalog."""
        vals: list[float] = []
        n_err = 0
        zs: np.ndarray | None = None
        zs_err: Exception | None = None
        for f, (_, keys) in zip(self.features, self._shape):
            try:
                if f.zscore:
                    if zs is None and zs_err is None:
                        try:
                            zs = zscore(y)
                        except Exception as e:  # noqa: BLE001
                            zs_err = e
                    if zs_err is not None:
                        raise zs_err
                    x = zs
                else:
                    x = y
                if f.absval:
                    x = np.abs(x)
                out = f.fn(x)
            except Exception:
                out = None
                n_err += 1
            if keys is None:
                # a kernel probed as scalar can still return a dict on
                # real data (probe failed on the synthetic series, so
                # keys=None was a guess): degrade to NaN, never let a
                # TypeError escape per-feature isolation
                if out is None or isinstance(out, dict):
                    if isinstance(out, dict):
                        n_err += 1
                    vals.append(float("nan"))
                else:
                    vals.append(float(out))
            else:
                if isinstance(out, dict):
                    vals.extend(float(out.get(k, float("nan"))) for k in keys)
                else:
                    vals.extend(float("nan") for _ in keys)
        return vals, n_err

    def _batched_2d(self, f: Feature):
        """Return a batched (num_windows, W) -> (num_windows, width)
        evaluator for kernels that have a ``*_2d`` vectorized variant
        (the ALG north-star labels), else None. The batched kernels use
        the identical numpy expressions as the scalars, so results are
        bit-equal (asserted in tests)."""
        from pyhctsa_spark.functions import kernels as K

        bf, p = f.base_fn, f.params or {}
        if bf is K.mean_:
            return lambda Y: K.mean_2d(Y)[:, None]
        if bf is K.variance:
            return lambda Y: K.variance_2d(Y)[:, None]
        if bf is K.spread_std:
            return lambda Y: K.std_2d(Y)[:, None]
        if bf is K.spread_iqr:
            return lambda Y: K.iqr_hazen_2d(Y)[:, None]
        if bf is K.burstiness:
            return lambda Y: np.column_stack(K.burstiness_2d(Y))
        if bf is K.autocorr_timedomain:
            # .get mirrors the scalar kernels' tau=1 default — a missing
            # param must not crash the batched path where the scalar
            # path would have succeeded
            return lambda Y: K.ac_timedomain_2d(Y, p.get("tau", 1))[:, None]
        if bf is K.autocorr_fourier:
            return lambda Y: K.ac_fourier_2d(Y, [p.get("tau", 1)])
        return None

    def compute_matrix(self, Y: np.ndarray) -> tuple[np.ndarray, int]:
        """Evaluate on a (num_windows, W) matrix -> (num_windows,
        num_columns) float64 + error count.

        Column blocks whose kernel has a ``*_2d`` variant are evaluated
        vectorized across all windows at once; the rest fall back to the
        per-window scalar loop. Zscored batched features share one
        zscore_2d pass, with the scalar guard semantics (constant /
        near-constant rows -> NaN + error count) replicated row-wise.
        """
        Y = np.asarray(Y, dtype=np.float64)
        k = Y.shape[0]
        out = np.empty((k, len(self.columns)), dtype=np.float64)
        errs = 0
        col = 0
        Z: np.ndarray | None = None
        z_bad: np.ndarray | None = None

        def _zmat():
            nonlocal Z, z_bad
            if Z is None:
                from pyhctsa_spark.functions.kernels import zscore_2d

                z_bad = (np.var(Y, axis=1, ddof=1) < 1e-10) | (
                    np.ptp(Y, axis=1) < 1e-10
                )
                Z = zscore_2d(Y)
                Z[z_bad] = np.nan
            return Z

        for f, (_, keys) in zip(self.features, self._shape):
            width = 1 if keys is None else len(keys)
            bfn = self._batched_2d(f)
            if bfn is not None and k > 1:
                X = _zmat() if f.zscore else Y
                if f.absval:
                    X = np.abs(X)
                out[:, col : col + width] = bfn(X)
                if f.zscore:
                    errs += int(z_bad.sum())
                col += width
                continue
            for i in range(k):
                try:
                    o = f(Y[i])
                except Exception:
                    o = None
                    errs += 1
                if keys is None:
                    if o is None or isinstance(o, dict):
                        if isinstance(o, dict):
                            errs += 1
                        out[i, col] = float("nan")
                    else:
                        out[i, col] = float(o)
                elif isinstance(o, dict):
                    out[i, col : col + width] = [
                        float(o.get(kk, float("nan"))) for kk in keys
                    ]
                else:
                    out[i, col : col + width] = float("nan")
            col += width
        return out, errs
