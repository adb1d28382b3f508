"""Checkpointing: single-pytree snapshots + reference-format import/export.

Native format: one compressed .npz per snapshot holding every leaf of
{params, opt_state, state, extras} under path-string keys, plus step and loss
histories. Static shapes (padded point cloud) make this trivially
resumable — unlike the reference, optimizer moments ARE restored on resume
(the reference silently drops them: models/model.py:588 default
load_optimizer=False; divergence documented in docs/design.md).

Interop: ``import_torch``/``export_torch`` read and write the reference's
``model.pth`` layout via model/torch_convert.py so pretrained reference
checkpoints can be evaluated and vice versa.
"""

from __future__ import annotations

import json
import os
import re

import jax
import numpy as np

SEP = "//"


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{SEP}{k}" if prefix else str(k)))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{SEP}#{i}"))
    else:
        out[prefix] = np.asarray(tree)
    return out


def _unflatten(flat: dict):
    root: dict = {}
    for path, value in flat.items():
        keys = path.split(SEP)
        node = root
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        if node and all(re.fullmatch(r"#\d+", k) for k in node):
            return [listify(node[f"#{i}"]) for i in range(len(node))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_checkpoint(save_dir: str, step: int, params, opt_state, state,
                    extras: dict | None = None, histories: dict | None = None,
                    keep_snapshot: bool = False):
    """Write <save_dir>/checkpoint.npz (+ checkpoint_<step>.npz snapshot)."""
    os.makedirs(save_dir, exist_ok=True)
    tree = {"params": params, "opt_state": opt_state, "state": state}
    if extras:
        tree["extras"] = extras
    flat = _flatten(jax.device_get(tree))
    flat["__step__"] = np.asarray(step)
    path = os.path.join(save_dir, "checkpoint.npz")
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **flat)
    os.replace(tmp, path)
    if keep_snapshot:
        np.savez_compressed(os.path.join(save_dir, f"checkpoint_{step}.npz"),
                            **flat)
    if histories is not None:
        with open(os.path.join(save_dir, "histories.json"), "w") as f:
            json.dump({k: [float(x) for x in v] for k, v in histories.items()}, f)


def load_checkpoint(save_dir_or_file: str):
    """Returns (step, tree) where tree has params/opt_state/state[/extras]."""
    path = save_dir_or_file
    if os.path.isdir(path):
        path = os.path.join(path, "checkpoint.npz")
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    step = int(flat.pop("__step__"))
    return step, _unflatten(flat)


def load_histories(save_dir: str) -> dict:
    path = os.path.join(save_dir, "histories.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def restore_into(template, loaded):
    """Map loaded numpy leaves onto a template pytree (keeps jnp dtypes)."""
    import jax.numpy as jnp
    t_flat = _flatten(template)
    l_flat = _flatten(loaded)
    missing = set(t_flat) - set(l_flat)
    if missing:
        raise KeyError(f"checkpoint missing keys: {sorted(missing)[:5]} ...")
    return _unflatten({k: jnp.asarray(l_flat[k]) for k in t_flat})


# ------------------------------------------------------- reference interop --

def import_torch(path: str, params, state, cfg):
    """Load a reference model.pth/model_<step>.pth into (params, state).

    Accepts a directory (tries model.pth inside) or a file. Returns
    (step, params, state, extras).
    """
    from ..model.torch_convert import from_torch_state_dict, load_torch_checkpoint
    if os.path.isdir(path):
        path = os.path.join(path, "model.pth")
    step, sd = load_torch_checkpoint(path)
    params, state, extras = from_torch_state_dict(params, state, cfg, sd)
    return step, params, state, extras


def export_torch(path: str, params, state, cfg, step: int = 0):
    """Write a reference-compatible {str(step): state_dict} model.pth."""
    import torch
    from ..model.torch_convert import to_torch_state_dict
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in to_torch_state_dict(params, state, cfg).items()}
    torch.save({str(step): sd}, path)
