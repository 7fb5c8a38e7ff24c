"""Checkpoint save/load.

Two formats:

1. **Reference-compatible ``.pth``** — saved via torch (CPU tensors) in
   the reference's raw state_dict dialect so reference tooling
   (export_onnx.py etc.) can consume models trained here, and vice
   versa. Mirrors ``save_checkpoint`` (reference:train.py:442-456):
   ``fast_scnn_<dataset>.pth`` + best copy ``*_best_model.pth``.
2. **Native ``.npz`` train state** — full resume (params + BN stats +
   optimizer state + step), torch-free. (The reference's ``--resume``
   restores weights only, reference:train.py:175-180; we restore
   everything.)
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import jax
import jax.numpy as jnp

from fastscnn_tpu.models.import_torch import export_torch_state_dict, import_torch_state_dict

__all__ = [
    "save_pth_checkpoint",
    "load_pth_checkpoint",
    "save_train_state",
    "load_train_state",
]


def save_pth_checkpoint(params, state, directory, dataset="citys", is_best=False, aux=None):
    """Reference-dialect save (reference:train.py:442-456)."""
    os.makedirs(directory, exist_ok=True)
    sd = export_torch_state_dict(params, state, aux=aux)
    filename = os.path.join(directory, f"fast_scnn_{dataset}.pth")
    try:
        import torch

        torch.save({k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()}, filename)
    except ImportError:
        np.savez(filename + ".npz", **sd)
        filename = filename + ".npz"
    if is_best:
        # keep the REAL suffix: in torch-free envs the save fell back to
        # .pth.npz, and load_pth_checkpoint routes on endswith('.npz') -
        # a best copy named .pth would be unloadable
        suffix = ".pth.npz" if filename.endswith(".npz") else ".pth"
        best = os.path.join(directory, f"fast_scnn_{dataset}_best_model{suffix}")
        shutil.copyfile(filename, best)
    return filename


def load_pth_checkpoint(path, num_classes, **kwargs):
    if path.endswith(".npz"):
        sd = dict(np.load(path))
        return import_torch_state_dict(sd, num_classes, **kwargs)
    from fastscnn_tpu.models.import_torch import load_torch_checkpoint

    return load_torch_checkpoint(path, num_classes, **kwargs)


# -- native full-train-state format -----------------------------------------


def _flatten(tree, prefix=""):
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            flat.update(_flatten(v, f"{prefix}{i}/"))
    else:
        flat[prefix[:-1]] = np.asarray(tree)
    return flat


def save_train_state(train_state, path, extra: dict | None = None):
    """Save the full TrainState (pytree → flat npz keyed by treedef paths)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(train_state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    meta = {"treedef": str(treedef)}
    if extra:
        meta.update({f"extra_{k}": v for k, v in extra.items()})
    np.savez(path, __meta__=np.asarray([repr(meta)], dtype=object), **arrays)
    # np.savez appends .npz when the suffix is missing - return the path
    # that actually exists
    return path if path.endswith(".npz") else path + ".npz"


def load_train_state(path, template_state):
    """Restore into the structure of ``template_state`` (same treedef)."""
    data = np.load(path, allow_pickle=True)
    leaves_t, treedef = jax.tree_util.tree_flatten(template_state)
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves_t))]
    for a, b in zip(leaves, leaves_t):
        if a.shape != jnp.shape(b):
            raise ValueError(f"shape mismatch restoring train state: {a.shape} vs {jnp.shape(b)}")
    return jax.tree_util.tree_unflatten(treedef, leaves)


# -- orbax backend (ecosystem-standard; sharding/async/multi-host aware) ----


def save_train_state_orbax(train_state, directory):
    """Save via orbax (OCDBT pytree checkpoint). Returns the directory.

    Preferred for multi-host/sharded state; the npz format above remains
    the dependency-free fallback."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(directory, train_state, force=True)
    ckptr.wait_until_finished()
    return directory


def load_train_state_orbax(directory, template_state):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(directory), template_state)
