"""Hybrid GRN→GRU×2→MHA→pool→GRN→Dense forward pass (SURVEY §2 D8).

Numpy re-implementation of the reference architecture
(train.py:115-173): GatedResidualNetwork (ELU dense → linear dense,
GLU-style sigmoid gate, residual + LayerNorm), two stacked GRUs
(128, 64), 4-head MultiHeadAttention (key_dim 32) with residual
LayerNorm, GlobalAveragePooling over time, GRN(32), Dense(k).

Execution model: weights are a small pytree of numpy arrays, broadcast
once; inference runs inside ``mapInPandas`` so each Arrow batch of
(window × k) sequences does one vectorized forward pass per executor —
the Spark-idiomatic shape for model scoring (no driver tensor, no
per-row Python).  Dropout is inference-mode (identity).  Weights are
seeded deterministically: this engine serves a FIXED model; training
loops live outside the analytics surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from fiveg_spark.ml.features import FEATURES

K = len(FEATURES)


DTYPE = np.float32  # TF inference dtype; also sidesteps this BLAS build's
# pathological float64 batched-matmul path (~200× slower than float32)


def _glorot(rng: np.random.Generator, fan_in: int, fan_out: int) -> np.ndarray:
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return rng.uniform(-limit, limit, size=(fan_in, fan_out)).astype(DTYPE)


def init_weights(seed: int = 42, k: int = K) -> dict[str, np.ndarray]:
    """Deterministic weight pytree for the full hybrid network."""
    rng = np.random.default_rng(seed)
    w: dict[str, np.ndarray] = {}

    def grn(name: str, d_in: int, units: int) -> None:
        w[f"{name}.elu_W"] = _glorot(rng, d_in, units)
        w[f"{name}.elu_b"] = np.zeros(units, DTYPE)
        w[f"{name}.lin_W"] = _glorot(rng, units, units)
        w[f"{name}.lin_b"] = np.zeros(units, DTYPE)
        w[f"{name}.gate_W"] = _glorot(rng, d_in, units)
        w[f"{name}.gate_b"] = np.zeros(units, DTYPE)
        if d_in != units:
            w[f"{name}.skip_W"] = _glorot(rng, d_in, units)
            w[f"{name}.skip_b"] = np.zeros(units, DTYPE)
        w[f"{name}.ln_g"] = np.ones(units, DTYPE)
        w[f"{name}.ln_b"] = np.zeros(units, DTYPE)

    def gru(name: str, d_in: int, units: int) -> None:
        # fused kernels, gate order (z, r, h) — keras layout
        w[f"{name}.Wx"] = _glorot(rng, d_in, 3 * units)
        w[f"{name}.Wh"] = _glorot(rng, units, 3 * units)
        w[f"{name}.b"] = np.zeros(3 * units, DTYPE)

    grn("grn1", k, 64)
    gru("gru1", 64, 128)
    gru("gru2", 128, 64)
    for proj in ("q", "k", "v"):  # 4 heads × key_dim 32
        w[f"mha.{proj}_W"] = _glorot(rng, 64, 4 * 32)
        w[f"mha.{proj}_b"] = np.zeros(4 * 32, DTYPE)
    w["mha.out_W"] = _glorot(rng, 4 * 32, 64)
    w["mha.out_b"] = np.zeros(64, DTYPE)
    w["mha.ln_g"] = np.ones(64, DTYPE)
    w["mha.ln_b"] = np.zeros(64, DTYPE)
    grn("grn2", 64, 32)
    w["head_W"] = _glorot(rng, 32, k)
    w["head_b"] = np.zeros(k, DTYPE)
    return w


def _elu(x: np.ndarray) -> np.ndarray:
    return np.where(x > 0, x, np.expm1(np.minimum(x, x.dtype.type(0.0))))


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(x, -60, 60)))


def _layernorm(x: np.ndarray, g: np.ndarray, b: np.ndarray) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return g * (x - mu) / np.sqrt(var + 1e-3) + b  # keras epsilon=1e-3


def _grn(x: np.ndarray, w: dict, name: str) -> np.ndarray:
    skip = (
        x @ w[f"{name}.skip_W"] + w[f"{name}.skip_b"]
        if f"{name}.skip_W" in w
        else x
    )
    v = _elu(x @ w[f"{name}.elu_W"] + w[f"{name}.elu_b"])
    v = v @ w[f"{name}.lin_W"] + w[f"{name}.lin_b"]
    v = v * _sigmoid(x @ w[f"{name}.gate_W"] + w[f"{name}.gate_b"])
    return _layernorm(skip + v, w[f"{name}.ln_g"], w[f"{name}.ln_b"])


def _gru(x: np.ndarray, w: dict, name: str) -> np.ndarray:
    """x: (B, T, d_in) → (B, T, units), batched across B at each step."""
    B, T_, _ = x.shape
    units = w[f"{name}.Wh"].shape[0]
    Wx, Wh, b = w[f"{name}.Wx"], w[f"{name}.Wh"], w[f"{name}.b"]
    h = np.zeros((B, units), dtype=x.dtype)
    out = np.empty((B, T_, units), dtype=x.dtype)
    for t in range(T_):
        gx = x[:, t] @ Wx + b
        gh = h @ Wh
        z = _sigmoid(gx[:, :units] + gh[:, :units])
        r = _sigmoid(gx[:, units : 2 * units] + gh[:, units : 2 * units])
        hh = np.tanh(gx[:, 2 * units :] + r * gh[:, 2 * units :])
        h = z * h + (1.0 - z) * hh
        out[:, t] = h
    return out


def _mha(x: np.ndarray, w: dict) -> np.ndarray:
    """4-head self-attention, key_dim 32, residual + LayerNorm."""
    B, T_, d = x.shape
    heads, kd = 4, 32

    def proj(name: str) -> np.ndarray:
        p = x @ w[f"mha.{name}_W"] + w[f"mha.{name}_b"]
        return p.reshape(B, T_, heads, kd).transpose(0, 2, 1, 3)  # B,H,T,kd

    q, k_, v = proj("q"), proj("k"), proj("v")
    # 3-D batched GEMM (B*H as the batch axis): this BLAS build's 4-D
    # matmul path is orders of magnitude slower than the 3-D one
    q3 = q.reshape(B * heads, T_, kd)
    k3 = k_.reshape(B * heads, T_, kd)
    v3 = v.reshape(B * heads, T_, kd)
    scores = q3 @ k3.transpose(0, 2, 1) / np.asarray(np.sqrt(kd), dtype=DTYPE)
    scores -= scores.max(axis=-1, keepdims=True)
    att = np.exp(scores)
    att /= att.sum(axis=-1, keepdims=True)
    ctx = (
        (att @ v3)
        .reshape(B, heads, T_, kd)
        .transpose(0, 2, 1, 3)
        .reshape(B, T_, heads * kd)
    )
    out = ctx @ w["mha.out_W"] + w["mha.out_b"]
    return _layernorm(x + out, w["mha.ln_g"], w["mha.ln_b"])


def forward(X: np.ndarray, w: dict[str, np.ndarray]) -> np.ndarray:
    """(B, window, k) → (B, k) residual prediction."""
    x = _grn(X.astype(DTYPE, copy=False), w, "grn1")
    x = _gru(x, w, "gru1")
    x = _gru(x, w, "gru2")
    x = _mha(x, w)
    x = x.mean(axis=1)  # GlobalAveragePooling1D
    x = _grn(x, w, "grn2")
    return x @ w["head_W"] + w["head_b"]


_PRED_SCHEMA = T.StructType(
    [
        T.StructField("slice", T.StringType()),
        T.StructField("window_start", T.TimestampType()),
        T.StructField("split", T.StringType()),
        T.StructField("target", T.ArrayType(T.DoubleType())),
        T.StructField("resid_pred", T.ArrayType(T.DoubleType())),
    ]
)


CHUNK = 128  # sequences per forward pass: bounds peak working memory
# (MHA scores dominate: CHUNK·4·60·60 f32 ≈ 7 MB) so executor memory
# stays flat regardless of Arrow batch size, and freshly-faulted pages
# get reused by every subsequent chunk.


def predict_residuals(sequences: DataFrame, weights_bc) -> DataFrame:
    """mapInPandas scoring: chunked vectorized forward passes per batch."""

    def score(batches):
        w = weights_bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for lo in range(0, len(pdf), CHUNK):
                part = pdf.iloc[lo : lo + CHUNK]
                X = np.stack(
                    [
                        np.stack([np.asarray(r, dtype=DTYPE) for r in s])
                        for s in part["seq"]
                    ]
                )
                preds = forward(X, w)
                yield pd.DataFrame(
                    {
                        "slice": part["slice"].values,
                        "window_start": part["window_start"].values,
                        "split": part["split"].values,
                        "target": [list(map(float, t)) for t in part["target"]],
                        "resid_pred": [p.astype(np.float64).tolist() for p in preds],
                    }
                )

    return sequences.mapInPandas(score, schema=_PRED_SCHEMA)
