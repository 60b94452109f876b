"""Checkpoint / resume of streaming state (host side).

Re-expression of the reference's persistence model (SURVEY.md §5): the
radio CONFIG persists (EEPROM -> t41x.config JSON); t41x additionally
checkpoints the DSP carry state (filter histories, AGC, NR, NCO phase —
which the reference lets re-converge after power-up), enabling
deterministic resume of a long capture from block N.

States are arbitrary pytrees (NamedTuples of arrays); serialization is
a flat .npz keyed by tree path, so the format is stable and
human-inspectable.
"""

from __future__ import annotations

import json
import warnings

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "key"):
            parts.append(str(p.key))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_state(path: str, state, extra: dict | None = None) -> None:
    """Save a state pytree (plus an optional JSON-able metadata dict)."""
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {}
    for kp, leaf in leaves:
        arrays["s:" + _path_str(kp)] = np.asarray(leaf)
    if extra is not None:
        arrays["__meta__"] = np.frombuffer(
            json.dumps(extra).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_state(path: str, template):
    """Load into the structure of `template` (a state pytree with the
    same shape/dtype layout).  Returns (state, meta_dict)."""
    with np.load(path) as z:
        meta = None
        if "__meta__" in z:
            meta = json.loads(bytes(z["__meta__"]).decode())
        leaves_t = jax.tree_util.tree_flatten_with_path(template)
        paths = [("s:" + _path_str(kp)) for kp, _ in leaves_t[0]]
        new_leaves = []
        defaulted: list[str] = []
        for key, (kp, leaf) in zip(paths, leaves_t[0]):
            if key not in z:
                # forward compatibility: a state field added after the
                # checkpoint was written (e.g. KimState.idx) falls back
                # to the template's init value instead of a KeyError
                new_leaves.append(np.asarray(leaf))
                defaulted.append(key)
                continue
            arr = z[key]
            expect = np.asarray(leaf)
            if arr.shape != expect.shape:
                raise ValueError(
                    f"checkpoint mismatch at {key}: {arr.shape} vs "
                    f"{expect.shape}")
            new_leaves.append(arr.astype(expect.dtype))
        if defaulted:
            # loud, not silent: a field RENAME looks identical to a field
            # addition from here (old key ignored as extra, new key
            # defaulted) — surface the list so it can't slip through
            warnings.warn(
                f"checkpoint {path!r} missing {len(defaulted)} state "
                f"field(s), substituting template init values: "
                f"{', '.join(defaulted)}", stacklevel=2)
        state = jax.tree_util.tree_unflatten(leaves_t[1], new_leaves)
    return state, meta
