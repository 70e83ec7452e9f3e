"""Import/export for the reference's pretrained Keras ``.h5`` weight files.

The reference ships four pretrained models under
``VeryAccurateEmulator/models/autoencoder_based_emulator/`` (plus
``models/emulator.h5`` for the direct emulator) saved with Keras 2.7's
HDF5 serializer (reference ``emulator.py:319-337, 667-699``). This module
reads them with h5py directly — no TensorFlow required — into our MLP
parameter pytrees. Kernels are stored in the Keras ``(in, out)`` layout,
which is also ours (:mod:`tpu21cmvae.ops.mlp`), so no transposition.

Layout (verified against the shipped files):
``model_weights/<layer>/<layer>/{kernel:0, bias:0}`` with layer ordering
recorded in the group attributes ``layer_names`` / ``weight_names``.

:func:`save_keras_mlp` writes the same layout back, so models trained
here can travel the other direction — a reference user's
``tf.keras.models.load_model(..., custom loss)`` workflow (reference
``emulator.py:319-337``) can consume weights via
``Model.load_weights``; no TensorFlow is required on this side.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from tpu21cmvae.ops.mlp import MLPParams


def _decode(names) -> List[str]:
    return [n.decode() if isinstance(n, bytes) else str(n) for n in names]


def _natural_key(name: str):
    """Sort key splitting trailing digits: dense < dense_2 < dense_10."""
    import re

    return [
        int(part) if part.isdigit() else part
        for part in re.split(r"(\d+)", name)
    ]


def read_keras_h5_layers(path: str) -> List[Tuple[str, Dict[str, np.ndarray]]]:
    """Read ordered (layer_name, {'kernel': ..., 'bias': ...}) pairs from a
    Keras-2.x HDF5 model or weights file. Layers without weights are
    skipped; ordering follows the file's ``layer_names`` attribute."""
    import h5py

    out = []
    with h5py.File(path, "r") as f:
        g = f["model_weights"] if "model_weights" in f else f
        if "layer_names" in g.attrs:
            layer_names = _decode(g.attrs["layer_names"])
        else:
            # no ordering attribute: h5py yields keys lexicographically,
            # which mis-orders dense_10 before dense_2 — sort naturally
            # (equal-width layers would pass the shape-chain check and
            # load silently wrong otherwise)
            layer_names = sorted(g.keys(), key=_natural_key)
        for lname in layer_names:
            lg = g[lname]
            weight_names = _decode(lg.attrs.get("weight_names", []))
            if not weight_names:
                continue
            tensors = {}
            for wname in weight_names:
                arr = np.asarray(lg[wname])
                base = wname.rsplit("/", 1)[-1].split(":")[0]
                tensors[base] = arr
            out.append((lname, tensors))
    return out


def load_keras_mlp(path: str, dtype=jnp.float32) -> MLPParams:
    """Load a sequential dense MLP saved by Keras into our pytree.

    Validates that consecutive layer shapes chain (out_dim of layer i ==
    in_dim of layer i+1) so a mis-ordered file fails loudly.
    """
    layers = read_keras_h5_layers(path)
    if not layers:
        raise ValueError(f"No weight-bearing layers found in {path!r}")
    params = []
    prev_out = None
    for lname, tensors in layers:
        if "kernel" not in tensors or "bias" not in tensors:
            raise ValueError(f"Layer {lname!r} in {path!r} is not Dense-like")
        w, b = tensors["kernel"], tensors["bias"]
        if w.ndim != 2 or b.shape != (w.shape[1],):
            raise ValueError(f"Unexpected shapes in layer {lname!r}: {w.shape}, {b.shape}")
        if prev_out is not None and w.shape[0] != prev_out:
            raise ValueError(
                f"Layer {lname!r} input dim {w.shape[0]} does not chain from "
                f"previous output dim {prev_out} in {path!r}"
            )
        prev_out = w.shape[1]
        params.append({"w": jnp.asarray(w, dtype), "b": jnp.asarray(b, dtype)})
    return tuple(params)


def save_keras_mlp(path: str, params: MLPParams) -> str:
    """Write an MLP pytree as a Keras-2.x-style HDF5 weights file.

    Produces the ``model_weights/<layer>/<layer>/{kernel:0, bias:0}``
    layout with ``layer_names``/``weight_names`` attributes — readable by
    :func:`load_keras_mlp` and by Keras' ``Model.load_weights`` on a
    matching ``Sequential`` of Dense layers (the reference's builder,
    reference ``emulator.py:12-48``). Kernels are already stored in the
    Keras ``(in, out)`` layout, so no transposition happens.
    """
    import h5py

    with h5py.File(path, "w") as f:
        g = f.create_group("model_weights")
        layer_names = []
        for i, layer in enumerate(params):
            lname = "dense" if i == 0 else f"dense_{i}"
            layer_names.append(lname)
            lg = g.create_group(lname).create_group(lname)
            lg.create_dataset("kernel:0", data=np.asarray(layer["w"], np.float32))
            lg.create_dataset("bias:0", data=np.asarray(layer["b"], np.float32))
            g[lname].attrs["weight_names"] = [
                f"{lname}/kernel:0".encode(),
                f"{lname}/bias:0".encode(),
            ]
        g.attrs["layer_names"] = [n.encode() for n in layer_names]
        g.attrs["backend"] = b"tensorflow"
        f.attrs["keras_version"] = b"2.7.0"
    return path
