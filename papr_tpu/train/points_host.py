"""Prune/grow events on the padded, static-shape point cloud.

The reference reallocates parameter tensors and rebuilds every optimizer on
each prune/grow (models/model.py:335-394, train.py:207-250). Here shapes are
static: prune clears alive-mask bits; grow writes host-computed points into
free slots. Both reset the optimizer moments (matching the reference's full
rebuild) via the caller re-initializing opt_state.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..model.pointgrow import add_points_knn


def prune_points(params: dict, state: dict, thresh: float,
                 prune_type: str = "<"):
    """Returns (params, state, num_pruned). Reference models/model.py:335-358."""
    alive = np.asarray(state["alive"])
    influ = np.asarray(params["points_influ_scores"])[:, 0]
    if prune_type == "<":
        keep = influ > thresh
    elif prune_type == ">":
        keep = influ < thresh
    else:
        raise ValueError(prune_type)
    new_alive = alive & keep
    num_pruned = int(alive.sum() - new_alive.sum())
    state = dict(state)
    state["alive"] = jnp.asarray(new_alive)
    return params, state, num_pruned


def add_points(params: dict, state: dict, cfg, add_num: int,
               rng: np.random.Generator):
    """Grow into free slots. Returns (params, state, num_added).

    Mirrors reference models/model.py:360-394 + the train.py:239-242 cap:
    never exceed max_num_pts (== padded size here).
    """
    alive = np.asarray(state["alive"])
    live_idx = np.nonzero(alive)[0]
    free_idx = np.nonzero(~alive)[0]
    add_num = min(int(add_num), len(free_idx))
    if add_num <= 0:
        return params, state, 0

    coords = np.asarray(params["points"])[live_idx]
    influ = np.asarray(params["points_influ_scores"])[live_idx]
    feats = None
    if "pc_feats" in params:
        feats = np.asarray(params["pc_feats"])[live_idx]

    popt = cfg.geoms.points
    new_coords, n_new, new_influ, new_feats = add_points_knn(
        coords, influ, add_num=add_num, k=int(popt.add_k),
        comb_type=popt.add_type, sample_k=int(popt.add_sample_k),
        sample_type=popt.add_sample_type, point_features=feats, rng=rng)
    if n_new <= 0:
        return params, state, 0

    slots = free_idx[:n_new]
    params = dict(params)
    params["points"] = _scatter_jnp(params["points"], slots, new_coords)
    params["points_influ_scores"] = _scatter_jnp(
        params["points_influ_scores"], slots, new_influ)
    if feats is not None:
        params["pc_feats"] = _scatter_jnp(params["pc_feats"], slots, new_feats)

    alive = alive.copy()
    alive[slots] = True
    state = dict(state)
    state["alive"] = jnp.asarray(alive)
    return params, state, n_new


def _scatter(arr: np.ndarray, idx: np.ndarray, values: np.ndarray) -> np.ndarray:
    out = arr.copy()
    out[idx] = values
    return out


def _scatter_jnp(arr, idx, values):
    return jnp.asarray(_scatter(np.asarray(arr), idx, np.asarray(values)))
