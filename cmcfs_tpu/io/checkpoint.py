"""Checkpoint / resume.

Three tiers:
* legacy text layer dumps compatible with the reference's 2D
  SaveLastLayer/LoadLastLayer (src/Common/IO.h:410-453),
* full-state .npz checkpoints (u, v, [w], T + step/time metadata) for both
  2D and 3D — the real resume feature the reference never finished
  (SURVEY.md §5: "3D has none"),
* orbax async checkpoints for large sharded grids (save_checkpoint_orbax /
  load_checkpoint_orbax): device arrays are snapshotted without a host
  round-trip blocking the step loop, and restore can re-shard onto the
  current mesh.
"""
from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np


# -------------------------------------------------- legacy 2D text format
def save_last_layer_txt(path: str, frame: int, u: np.ndarray, v: np.ndarray,
                        T: np.ndarray) -> None:
    dimx, dimy = u.shape
    with open(path, "w") as f:
        f.write("%i\n" % frame)
        f.write("%i %i\n" % (dimx, dimy))
        for j in range(dimy):
            f.write("".join("%f %f %f " % (u[i, j], v[i, j], T[i, j])
                            for i in range(dimx)) + "\n")


def load_last_layer_txt(path: str, dimx: int, dimy: int,
                        frames: int) -> Optional[Tuple[int, np.ndarray, np.ndarray, np.ndarray]]:
    """Returns (frame, u, v, T) or None on mismatch (reference returns 0)."""
    if not os.path.exists(path):
        return None
    with open(path) as f:
        toks = f.read().split()
    frame, indimx, indimy = int(toks[0]), int(toks[1]), int(toks[2])
    if indimx != dimx or indimy != dimy or frame <= 0 or frame > frames:
        return None
    vals = np.asarray(toks[3:3 + dimx * dimy * 3], dtype=np.float32)
    vals = vals.reshape(dimy, dimx, 3)
    u = np.ascontiguousarray(vals[:, :, 0].T)
    v = np.ascontiguousarray(vals[:, :, 1].T)
    T = np.ascontiguousarray(vals[:, :, 2].T)
    return frame, u, v, T


# ----------------------------------------------------- full-state npz tier
def _norm(path: str) -> str:
    return path if path.endswith(".npz") else path + ".npz"


def save_checkpoint(path: str, step: int, time: float, **fields) -> None:
    meta = dict(step=int(step), time=float(time),
                fields=sorted(fields.keys()))
    np.savez(_norm(path), __meta__=np.frombuffer(json.dumps(meta).encode(),
                                                 dtype=np.uint8),
             **{k: np.asarray(val) for k, val in fields.items()})


def load_checkpoint(path: str):
    data = np.load(_norm(path))
    meta = json.loads(bytes(data["__meta__"]).decode())
    fields = {k: data[k] for k in meta["fields"]}
    return meta["step"], meta["time"], fields


# -------------------------------------------------------------- orbax tier
def save_checkpoint_orbax(path: str, step: int, time: float,
                          fields: dict, async_save: bool = True):
    """Async device-array checkpoint for large (possibly sharded) grids.

    ``fields`` may hold jax arrays — they are snapshotted by orbax without
    a blocking host gather.  Returns the checkpointer; call ``.wait()``
    (or let the next save barrier) to ensure durability before relying on
    the file.  Directory format: orbax StandardCheckpointer under
    ``path/step_<n>``.
    """
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = (ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
             if async_save else
             ocp.Checkpointer(ocp.StandardCheckpointHandler()))
    tree = dict(fields)
    tree["__meta__"] = {"step": int(step), "time": float(time)}
    ckptr.save(os.path.join(path, f"step_{int(step)}"), tree, force=True)
    return ckptr


def latest_orbax_step(path: str):
    if not os.path.isdir(path):
        return None
    steps = [int(d.split("_", 1)[1]) for d in os.listdir(path)
             if d.startswith("step_") and d.split("_", 1)[1].isdigit()]
    return max(steps) if steps else None


def load_checkpoint_orbax(path: str, step: Optional[int] = None,
                          template: Optional[dict] = None):
    """Restore (step, time, fields).  With ``template`` (a pytree of arrays
    or jax.ShapeDtypeStruct with shardings), fields restore directly onto
    the current mesh layout."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    if step is None:
        step = latest_orbax_step(path)
        if step is None:
            raise FileNotFoundError(f"no orbax checkpoints under {path}")
    ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
    kwargs = {}
    if template is not None:
        tmpl = dict(template)
        tmpl["__meta__"] = {"step": 0, "time": 0.0}
        kwargs["args"] = ocp.args.StandardRestore(tmpl)
    tree = ckptr.restore(os.path.join(path, f"step_{int(step)}"), **kwargs)
    meta = tree.pop("__meta__")
    return int(meta["step"]), float(meta["time"]), tree
