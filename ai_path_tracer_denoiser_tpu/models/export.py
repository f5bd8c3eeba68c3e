"""Model (de)serialization — the deployable artifact.

The reference deploys by tracing to TorchScript (convert_to_torchscript.py)
and loading that file from C++ (main.cpp:39, 107).  Here inference shares the
JAX model, so the artifact is simply the parameter + batch-norm-state pytree
in a single .npz with a JSON manifest — loadable anywhere numpy exists, and
jit-compiled on first use.  No tracing step means no traced-hidden-reset bug.
"""
from __future__ import annotations

import json
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_model(path: str, params, bn_state, meta: Dict[str, Any] = None,
               options=None):
    """Write params + bn state + metadata to ``path`` (.npz).

    Pass ``options`` (ModelOptions) to record the architecture (widths AND
    norm) in the metadata — loaders must know the norm to route batch-norm
    checkpoints through the BN-folding deployment path and group-norm ones
    through the eval graph (folding GroupNorm would silently produce
    garbage: its statistics are per-sample, not running state).
    """
    meta = dict(meta or {})
    if options is not None:
        meta.setdefault("widths", list(options.widths))
        meta.setdefault("norm", options.norm)
    flat = {f"params/{k}": v for k, v in _flatten(params).items()}
    flat.update({f"bn_state/{k}": v for k, v in _flatten(bn_state).items()})
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    np.savez(path, **flat)


def load_model(path: str) -> Tuple[Any, Any, Dict[str, Any]]:
    """Read (params, bn_state, meta) back as jnp arrays."""
    import jax.numpy as jnp
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode()) if "__meta__" in data else {}
        params_flat = {}
        state_flat = {}
        for key in data.files:
            if key == "__meta__":
                continue
            if key.startswith("params/"):
                params_flat[key[len("params/"):]] = data[key]
            elif key.startswith("bn_state/"):
                state_flat[key[len("bn_state/"):]] = data[key]
    params = jax.tree_util.tree_map(jnp.asarray, _unflatten(params_flat))
    bn_state = jax.tree_util.tree_map(jnp.asarray, _unflatten(state_flat))
    return params, bn_state, meta


def model_options_from_params(params, norm: str = "batch"):
    """Derive ModelOptions from parameter shapes.

    The checkpoint itself is the source of truth for the channel plan —
    trusting a CLI flag instead writes wrong metadata that crashes
    ``init_hidden`` far from the cause.  ``norm`` is not recoverable from
    shapes (batch/group share the same scale/bias tree) so it stays a
    parameter.
    """
    from ..config import ModelOptions
    widths = tuple(int(params[f"enc{i}"]["conv1"]["w"].shape[-1])
                   for i in range(1, 6))
    return ModelOptions(widths=widths, norm=norm)


def model_options_from_meta(meta: Dict[str, Any]):
    """Reconstruct the ModelOptions a checkpoint was trained with.

    Missing keys fall back to the reference architecture (pre-``norm``
    artifacts were all BatchNorm).
    """
    from ..config import ModelOptions
    return ModelOptions(
        widths=tuple(meta.get("widths", (32, 43, 57, 76, 101))),
        norm=meta.get("norm", "batch"))
