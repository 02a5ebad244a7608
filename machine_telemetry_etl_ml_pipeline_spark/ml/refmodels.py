"""Model-EXACT scoring of the reference's two present model blobs.

The reference ships four fitted models, of which two blobs exist on
disk (`/root/reference/.MISSING_LARGE_BLOBS` lists the other two):

- `best_regressor_v18.pkl` — lightgbm.sklearn.LGBMRegressor (762
  trees, 18 leaves, objective=regression) + `regression_scaler_v18.pkl`
  (sklearn StandardScaler, 10 features).
- `best_anomaly_detector_v18.pkl` — pyod.models.iforest.IForest
  wrapping sklearn.ensemble.IsolationForest (100 ExtraTrees,
  max_samples=256, contamination=0.05) + `anomaly_scaler_v18.pkl`.

Neither sklearn, lightgbm, pyod, nor joblib is installed here, so this
module extracts the fitted PARAMETERS from the blobs and re-implements
the published scoring algorithms exactly:

- The blobs are joblib pickles. `SafeJoblibUnpickler` replicates
  joblib's public on-disk format (numpy arrays are written as raw
  bytes after a NumpyArrayWrapper marker object; BSD-licensed joblib
  documents/implements this in joblib/numpy_pickle.py). Security: the
  blobs are untrusted content, so `find_class` never returns a real
  class other than numpy's array/dtype reconstructors (data-only) —
  every sklearn/lightgbm/pyod global resolves to an inert generated
  stub that records constructor args and state. No third-party code
  can execute during the load.
- The LightGBM Booster pickles its entire fitted state as the public
  MODEL-STRING dump (Booster.__getstate__ replaces the native handle
  with model_to_string()); `parse_lgbm_model_str` parses the v4 text
  format (Tree=k blocks) and `lgbm_predict` replays LightGBM's
  NumericalDecision routing (missing_type/default_left semantics from
  include/LightGBM/tree.h) and sums leaf values — for
  objective=regression that IS Booster.predict(raw_score).
- The sklearn trees arrive as `sklearn.tree._tree.Tree.__getstate__`
  dicts (node_count + a structured `nodes` array); `iforest_scores`
  replays IsolationForest._compute_score_samples from sklearn 1.6.1
  (the version recorded in the blob): per-tree leaf routing, then
  depths += decision_path_length[leaf] + average_path_length[leaf]
  - 1, score = 2**(-depths / (n_trees * avg_path_length(256))).
  sklearn 1.6 STORES `_decision_path_lengths` and
  `_average_path_length_per_tree` at fit time, so the per-node math
  is taken from sklearn's own fit-time arrays, and
  tests/test_refmodels.py re-derives both from the raw node arrays:
  the integer-valued depths match bitwise; the average-path-length
  formula matches to <=4 ULP (np.log is libm-dependent, so the
  training machine's last bit differs from this one's — scoring uses
  the STORED arrays, so published scores are exactly what sklearn
  produces with this blob).
- pyod conventions (pyod/models/iforest.py): decision_function =
  invert_order(sklearn decision_function) = -(score_samples -
  offset_); predict = (score > threshold_), threshold_ =
  percentile(train scores, 100*(1-contamination)) — threshold_ and
  the 7200 train decision_scores_ are stored in the blob, so the
  convention is verified against stored data in the tests.

Reference citations: project/database_and_model_tools.py:140-158
(model/scaler paths), :219-231 (scaler.transform over the 10-feature
order). The reference never calls predict in present code, so the
parity target is the standard public scoring APIs.
"""

from __future__ import annotations

import os
import pickle
from functools import lru_cache

import numpy as np

MODEL_DIR = "/root/reference/project/models"

_NUMPY_ALLOW = {
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy._core.multiarray", "scalar"),
    ("numpy", "ndarray"),
    ("numpy", "dtype"),
    ("numpy.core.numeric", "_frombuffer"),
    ("numpy._core.numeric", "_frombuffer"),
}


class _Stub:
    """Inert stand-in for any non-numpy global in the pickle."""

    _qual = "?"

    def __init__(self, *args, **kw):
        self._args = args
        self._kw = kw

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self._state = state


_STUB_CACHE: dict[str, type] = {}


def _stub_for(module: str, name: str) -> type:
    key = f"{module}.{name}"
    if key not in _STUB_CACHE:
        _STUB_CACHE[key] = type(name, (_Stub,), {"_qual": key})
    return _STUB_CACHE[key]


class NumpyArrayWrapper(_Stub):
    """Replica of joblib.numpy_pickle.NumpyArrayWrapper.read_array:
    the wrapper's pickled attributes describe an array whose raw bytes
    follow inline in the stream (optionally preceded by one padding-
    length byte when numpy_array_alignment_bytes is set)."""

    def read(self, fh):
        dtype = self.dtype
        if dtype.hasobject:
            raise ValueError("object arrays not supported in model blobs")
        if getattr(self, "numpy_array_alignment_bytes", None) is not None:
            padding_length = int.from_bytes(fh.read(1), "little")
            fh.read(padding_length)
        count = int(np.prod(self.shape)) if len(self.shape) else 1
        arr = np.frombuffer(fh.read(count * dtype.itemsize), dtype=dtype, count=count)
        order = getattr(self, "order", "C")
        return arr.reshape(self.shape, order=order if order in ("C", "F") else "C").copy()


def _numpy_global(module: str, name: str):
    import importlib

    for cand in (module, module.replace("numpy._core", "numpy.core"),
                 module.replace("numpy.core", "numpy._core")):
        try:
            return getattr(importlib.import_module(cand), name)
        except (ImportError, AttributeError):
            continue
    raise ImportError(f"cannot resolve {module}.{name}")


class SafeJoblibUnpickler(pickle._Unpickler):
    """pickle._Unpickler (the pure-Python one — the C unpickler has no
    overridable dispatch) with two changes: a closed find_class, and a
    BUILD hook that swaps a completed NumpyArrayWrapper for the raw
    array bytes that follow it in the stream (joblib's layout)."""

    def __init__(self, fh):
        super().__init__(fh)
        self._fh = fh

    def find_class(self, module, name):
        if (module, name) in _NUMPY_ALLOW:
            return _numpy_global(module, name)
        if module == "joblib.numpy_pickle" and name == "NumpyArrayWrapper":
            return NumpyArrayWrapper
        return _stub_for(module, name)

    dispatch = pickle._Unpickler.dispatch.copy()

    def load_build(self):
        pickle._Unpickler.load_build(self)
        if isinstance(self.stack[-1], NumpyArrayWrapper):
            self.stack[-1] = self.stack[-1].read(self._fh)

    dispatch[pickle.BUILD[0]] = load_build


def load_joblib(path: str):
    with open(path, "rb") as fh:
        return SafeJoblibUnpickler(fh).load()


def available() -> bool:
    return all(
        os.path.exists(os.path.join(MODEL_DIR, f))
        for f in (
            "best_regressor_v18.pkl",
            "best_anomaly_detector_v18.pkl",
            "regression_scaler_v18.pkl",
            "anomaly_scaler_v18.pkl",
        )
    )


# --------------------------------------------------------------------------
# StandardScaler
# --------------------------------------------------------------------------


@lru_cache(maxsize=4)
def load_scaler(name: str) -> dict:
    s = load_joblib(os.path.join(MODEL_DIR, name))
    assert s._qual.endswith("StandardScaler") and s.with_mean and s.with_std
    return {
        "mean": np.asarray(s.mean_, dtype=np.float64),
        "scale": np.asarray(s.scale_, dtype=np.float64),
        "var": np.asarray(s.var_, dtype=np.float64),
        "features": [str(f) for f in s.feature_names_in_],
        "n_samples_seen": int(s.n_samples_seen_),
    }


def scaler_transform(scaler: dict, X: np.ndarray) -> np.ndarray:
    """StandardScaler.transform with with_mean=with_std=True."""
    return (X - scaler["mean"]) / scaler["scale"]


# --------------------------------------------------------------------------
# LightGBM regressor (text model v4, numeric splits)
# --------------------------------------------------------------------------

_MISSING_NONE, _MISSING_ZERO, _MISSING_NAN = 0, 1, 2
_K_ZERO_THRESHOLD = 1e-35  # LightGBM kZeroThreshold


def parse_lgbm_model_str(model_str: str) -> dict:
    header: dict[str, str] = {}
    for line in model_str[: model_str.find("Tree=0")].splitlines():
        if "=" in line:
            k, v = line.split("=", 1)
            header[k] = v
    trees = []
    for block in model_str.split("\nTree=")[1:]:
        kv: dict[str, str] = {}
        for line in block.splitlines()[1:]:  # first line is the tree index
            if not line or "=" not in line:
                break  # blank line terminates the section
            k, v = line.split("=", 1)
            kv[k] = v
        num_cat = int(kv.get("num_cat", "0"))
        if num_cat:
            raise NotImplementedError("categorical splits absent from the blob")
        trees.append(
            {
                "num_leaves": int(kv["num_leaves"]),
                "split_feature": np.fromstring(kv["split_feature"], dtype=np.int64, sep=" "),
                "threshold": np.fromstring(kv["threshold"], dtype=np.float64, sep=" "),
                "decision_type": np.fromstring(kv["decision_type"], dtype=np.int64, sep=" "),
                "left_child": np.fromstring(kv["left_child"], dtype=np.int64, sep=" "),
                "right_child": np.fromstring(kv["right_child"], dtype=np.int64, sep=" "),
                "leaf_value": np.fromstring(kv["leaf_value"], dtype=np.float64, sep=" "),
                "leaf_count": np.fromstring(kv.get("leaf_count", ""), dtype=np.int64, sep=" "),
                "internal_count": np.fromstring(
                    kv.get("internal_count", ""), dtype=np.int64, sep=" "
                ),
                "internal_value": np.fromstring(
                    kv.get("internal_value", ""), dtype=np.float64, sep=" "
                ),
            }
        )
    return {"header": header, "trees": trees}


@lru_cache(maxsize=1)
def load_regressor() -> dict:
    obj = load_joblib(os.path.join(MODEL_DIR, "best_regressor_v18.pkl"))
    assert obj._qual == "lightgbm.sklearn.LGBMRegressor"
    booster = obj.__dict__["_Booster"]
    model = parse_lgbm_model_str(booster.__dict__["_handle"])
    model["n_features"] = int(obj.__dict__["_n_features"])
    model["objective"] = obj.__dict__["_objective"]
    return model


def _lgbm_route_leaf(tree: dict, X: np.ndarray) -> np.ndarray:
    """Vectorized replay of LightGBM Tree::NumericalDecision
    (include/LightGBM/tree.h): missing_type = (decision_type>>2)&3,
    default_left = decision_type&2; child < 0 encodes leaf ~child."""
    n = X.shape[0]
    node = np.zeros(n, dtype=np.int64)  # >=0 internal idx, <0 → leaf ~v
    active = np.ones(n, dtype=bool)
    feat, thr = tree["split_feature"], tree["threshold"]
    dtp, lc, rc = tree["decision_type"], tree["left_child"], tree["right_child"]
    while active.any():
        idx = node[active]
        v = X[active, feat[idx]]
        missing_type = (dtp[idx] >> 2) & 3
        default_left = (dtp[idx] & 2) != 0
        nan = np.isnan(v)
        v = np.where(nan & (missing_type != _MISSING_NAN), 0.0, v)
        is_default = ((missing_type == _MISSING_ZERO) & (np.abs(v) <= _K_ZERO_THRESHOLD)) | (
            (missing_type == _MISSING_NAN) & nan
        )
        go_left = np.where(is_default, default_left, v <= thr[idx])
        node[active] = np.where(go_left, lc[idx], rc[idx])
        active = node >= 0
    return ~node  # leaf index


def lgbm_predict(model: dict, X: np.ndarray) -> np.ndarray:
    """Booster.predict(raw_score) for objective=regression: the sum of
    routed leaf values over trees in order (tree 0 carries the
    boost_from_average base, so no separate init score exists)."""
    out = np.zeros(X.shape[0], dtype=np.float64)
    for tree in model["trees"]:
        out += tree["leaf_value"][_lgbm_route_leaf(tree, X)]
    return out


# --------------------------------------------------------------------------
# IsolationForest (sklearn 1.6.1) wrapped by pyod IForest
# --------------------------------------------------------------------------


@lru_cache(maxsize=1)
def load_iforest() -> dict:
    obj = load_joblib(os.path.join(MODEL_DIR, "best_anomaly_detector_v18.pkl"))
    assert obj._qual == "pyod.models.iforest.IForest"
    det = obj.__dict__["detector_"]
    trees = []
    for est in det.__dict__["estimators_"]:
        t = est.__dict__["tree_"]
        nodes = t.nodes
        trees.append(
            {
                "left": nodes["left_child"].astype(np.int64),
                "right": nodes["right_child"].astype(np.int64),
                "feature": nodes["feature"].astype(np.int64),
                "threshold": nodes["threshold"].astype(np.float64),
                "n_node_samples": nodes["n_node_samples"].astype(np.int64),
            }
        )
    return {
        "trees": trees,
        # sklearn 1.6 fit-time arrays, indexed by node id (tests re-derive
        # both from the node arrays and compare bitwise):
        "decision_path_lengths": [
            np.asarray(a, dtype=np.float64)
            for a in det.__dict__["_decision_path_lengths"]
        ],
        "average_path_length_per_tree": [
            np.asarray(a, dtype=np.float64)
            for a in det.__dict__["_average_path_length_per_tree"]
        ],
        "max_samples": int(det.__dict__["max_samples_"]),
        "offset": float(det.__dict__["offset_"]),
        "contamination": float(obj.__dict__["contamination"]),
        "pyod_threshold": float(obj.__dict__["threshold_"]),
        "pyod_train_scores": np.asarray(obj.__dict__["decision_scores_"], dtype=np.float64),
    }


def average_path_length(n_samples_leaf: np.ndarray) -> np.ndarray:
    """sklearn.ensemble._iforest._average_path_length: c(1)=0, c(2)=1,
    c(n)=2(ln(n-1)+γ) - 2(n-1)/n."""
    n = np.asarray(n_samples_leaf, dtype=np.float64)
    out = np.zeros_like(n)
    out[n == 2] = 1.0
    big = n > 2
    out[big] = 2.0 * (np.log(n[big] - 1.0) + np.euler_gamma) - 2.0 * (n[big] - 1.0) / n[big]
    return out


def _sk_tree_leaf(tree: dict, X: np.ndarray) -> np.ndarray:
    """sklearn Tree.apply: leaf nodes have left_child == -1 (TREE_LEAF);
    route left when x[feature] <= threshold."""
    node = np.zeros(X.shape[0], dtype=np.int64)
    active = tree["left"][node] != -1
    while active.any():
        idx = node[active]
        go_left = X[active, tree["feature"][idx]] <= tree["threshold"][idx]
        node[active] = np.where(go_left, tree["left"][idx], tree["right"][idx])
        active = tree["left"][node] != -1
    return node


def iforest_scores(model: dict, X: np.ndarray) -> dict:
    """IsolationForest._compute_score_samples (sklearn 1.6.1) and the
    pyod wrappers around it. Returns score_samples, sklearn
    decision_function, pyod decision_function, pyod label."""
    depths = np.zeros(X.shape[0], dtype=np.float64)
    for tree, dpl, apl in zip(
        model["trees"],
        model["decision_path_lengths"],
        model["average_path_length_per_tree"],
    ):
        leaf = _sk_tree_leaf(tree, X)
        depths += dpl[leaf] + apl[leaf] - 1.0
    denom = len(model["trees"]) * average_path_length(np.array([model["max_samples"]]))[0]
    # scalar libm pow, NOT np.power: numpy's vectorized transcendentals
    # pick SIMD kernels by batch length, so an 8-row executor Arrow
    # batch and a 48-row driver batch can differ in the last bit —
    # scalar pow is batch-size-invariant (caught by the bitwise gate).
    import math

    score_samples = np.array(
        [-math.pow(2.0, -d / denom) for d in depths], dtype=np.float64
    )
    sk_decision = score_samples - model["offset"]
    pyod_score = -sk_decision  # pyod invert_order: higher = more abnormal
    label = (pyod_score > model["pyod_threshold"]).astype(np.int32)
    return {
        "score_samples": score_samples,
        "sk_decision": sk_decision,
        "pyod_score": pyod_score,
        "label": label,
    }


# --------------------------------------------------------------------------
# The fixed scoring grid shared by the Spark query and its oracle
# --------------------------------------------------------------------------

GRID_ROWS = 48
_N_FEATURES = 10


def grid_raw_features(ids: np.ndarray) -> np.ndarray:
    """Deterministic raw-feature grid: scaled-space offsets in
    [-2, 2] de-standardized through the REGRESSION scaler (the
    reference's canonical 10-feature order,
    database_and_model_tools.py:219-224), so the grid covers the
    models' training range without depending on any table or SF."""
    sc = load_scaler("regression_scaler_v18.pkl")
    i = np.asarray(ids, dtype=np.int64)[:, None]
    j = np.arange(_N_FEATURES, dtype=np.int64)[None, :]
    g = ((7 * i + 13 * j) % 41 - 20) / 10.0
    return sc["mean"] + sc["scale"] * g


def score_grid_ids(ids: np.ndarray):
    """(grid_id, reg_pred, anomaly_score, is_anomaly) for grid rows.

    Used verbatim by BOTH the Spark mapInPandas batches and the
    oracle-literal generation, and every output is a pure per-row
    function of grid_id, so partitioning cannot change a value and
    Spark-vs-oracle equality is bitwise."""
    import pandas as pd

    ids = np.asarray(ids, dtype=np.int64)
    raw = grid_raw_features(ids)
    reg_scaled = scaler_transform(load_scaler("regression_scaler_v18.pkl"), raw)
    ano_scaled = scaler_transform(load_scaler("anomaly_scaler_v18.pkl"), raw)
    reg_pred = lgbm_predict(load_regressor(), reg_scaled)
    ano = iforest_scores(load_iforest(), ano_scaled)
    return pd.DataFrame(
        {
            "grid_id": ids,
            "reg_pred": reg_pred,
            "anomaly_score": ano["pyod_score"],
            "is_anomaly": ano["label"],
        }
    )
