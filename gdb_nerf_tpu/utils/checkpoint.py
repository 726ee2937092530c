"""Checkpoint save/load with the reference's directory contract.

Layout-equivalent of /root/reference/utils/net_utils.py:14-138:
``trained_model_dir/{epoch}.ckpt`` plus ``latest.ckpt``; at most 100 epoch
files retained; ``load_model`` resumes full state (net, optimizer,
recorder, epoch) returning epoch+1; ``load_network`` restores net-only for
eval, choosing latest/max/explicit epoch; ``load_pretrain`` warm-starts
from another experiment's latest checkpoint.

Format: a single msgpack file (flax.serialization) holding numpy-converted
pytrees — portable, no pickle, no torch.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, tree)


def save_model(
    state: dict,
    model_dir: str,
    epoch: int,
    last: bool = False,
) -> None:
    """Serialize {net, optim, scheduler, recorder, epoch} to the model dir."""
    os.makedirs(model_dir, exist_ok=True)
    state = dict(state, epoch=epoch)
    # to_state_dict flattens tuples/namedtuples (optax states) into dicts
    # that msgpack can serialize; from_state_dict restores them on load.
    blob = serialization.msgpack_serialize(
        serialization.to_state_dict(_to_numpy(state))
    )
    name = "latest.ckpt" if last else f"{epoch}.ckpt"
    tmp = os.path.join(model_dir, name + ".tmp")
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, os.path.join(model_dir, name))

    # Retain at most 100 numbered checkpoints (oldest removed first).
    epochs = sorted(
        int(f[:-5]) for f in os.listdir(model_dir)
        if f.endswith(".ckpt") and f[:-5].isdigit()
    )
    if len(epochs) > 100:
        os.remove(os.path.join(model_dir, f"{epochs[0]}.ckpt"))


def _read(path: str) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def _restore_into(template: Any, raw: Any) -> Any:
    """Shape raw (dict-of-dicts from msgpack) into template's pytree types."""
    if template is None:
        return raw
    return serialization.from_state_dict(template, raw)


def load_model(
    model_dir: str,
    resume: bool = True,
    epoch: int = -1,
    templates: dict | None = None,
):
    """Resume full training state. Returns (state dict or None, begin_epoch)."""
    if not resume and os.path.exists(model_dir):
        import shutil

        shutil.rmtree(model_dir)
    if not os.path.exists(model_dir):
        return None, 0
    files = [f for f in os.listdir(model_dir) if f.endswith(".ckpt")]
    numbered = sorted(int(f[:-5]) for f in files if f[:-5].isdigit())
    if epoch == -1:
        if "latest.ckpt" in files:
            path = os.path.join(model_dir, "latest.ckpt")
        elif numbered:
            path = os.path.join(model_dir, f"{numbered[-1]}.ckpt")
        else:
            return None, 0
    else:
        path = os.path.join(model_dir, f"{epoch}.ckpt")
    raw = _read(path)
    if templates:
        raw = {
            k: (_restore_into(templates.get(k), v) if k in templates else v)
            for k, v in raw.items()
        }
    print(f"Resuming from {path} (epoch {raw['epoch']})")
    return raw, int(raw["epoch"]) + 1


def load_network(
    model_dir: str,
    epoch: int = -1,
    template: Any = None,
):
    """Load net variables only (eval path). model_dir may be a file path."""
    if os.path.isfile(model_dir):
        path = model_dir
    else:
        if not os.path.exists(model_dir):
            raise FileNotFoundError(f"No checkpoint dir: {model_dir}")
        files = [f for f in os.listdir(model_dir) if f.endswith(".ckpt")]
        numbered = sorted(int(f[:-5]) for f in files if f[:-5].isdigit())
        if epoch == -1:
            name = "latest.ckpt" if "latest.ckpt" in files else f"{numbered[-1]}.ckpt"
        else:
            name = f"{epoch}.ckpt"
        path = os.path.join(model_dir, name)
    raw = _read(path)
    print(f"Loading network from {path} (epoch {raw.get('epoch', '?')})")
    return _restore_into(template, raw["net"])


def load_pretrain(cfg, template: Any = None):
    """Warm-start net variables from another experiment's latest checkpoint."""
    if not cfg.train.pretrain:
        return None
    model_dir = os.path.join(
        cfg.workspace, "trained_model", cfg.task, cfg.train.pretrain
    )
    path = os.path.join(model_dir, "latest.ckpt")
    if not os.path.exists(path):
        print(f"[pretrain] no checkpoint at {path}; starting from scratch")
        return None
    raw = _read(path)
    print(f"Warm-starting from {path}")
    return _restore_into(template, raw["net"])
