"""Fused BundleNeRF head as a single Pallas TPU kernel.

The bundle MLP (models/nerf_head.py::BundleNeRF) is a chain of ~12 small
matmuls and reductions over ~245k samples.  Under XLA each layer's
activations round-trip HBM (tens of MB per layer); on the bandwidth-bound
TPU that traffic dominates the head's cost.  This kernel tiles the sample
axis and keeps every intermediate in VMEM: per tile it loads vox/payload/
frd once, runs the whole head (view aggregation, density, view-softmax
payload blending, feature head), and writes only sigma + the output feature.

The kernel consumes the SAME parameter tree as the flax module (converted
checkpoints work unchanged) and matches it numerically — see
tests/test_pallas_nerf.py.  V (number of views) is static; the view loop is
unrolled.

Layout note: inputs arrive as (V, N, C) with N = B*H*W*S flattened and
padded to a multiple of the tile size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512


def _dense(x, p, name):
    w = p[name]["kernel"]
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if "bias" in p[name]:
        y = y + p[name]["bias"]
    return y


def _kernel(vox_ref, payload_ref, frd_ref, params, sigma_ref, feat_ref, *, V):
    """One tile: vox (T, vox), payload (V, T, P), frd (V, T, F4)."""
    p = params
    agg = p["agg"]

    frd = [frd_ref[v] for v in range(V)]  # V x (T, F4)

    # --- ViewAggregator ---
    ifr = []
    for v in range(V):
        vf = jax.nn.relu(_dense(frd[v][:, -4:], agg, "view_fc"))
        ifr.append(frd[v][:, :-4] + vf)

    mean = sum(ifr) / V
    var = sum(jnp.square(f - mean) for f in ifr) / max(V - 1, 1)

    shared = _dense(var, agg, "global_fc_var") + _dense(mean, agg, "global_fc_mean")
    gf = [jax.nn.relu(_dense(f, agg, "global_fc_pv") + shared) for f in ifr]

    logits = [jax.nn.relu(_dense(g, agg, "agg_w_fc")) for g in gf]
    m = logits[0]
    for v in range(1, V):
        m = jnp.maximum(m, logits[v])
    exps = [jnp.exp(l - m) for l in logits]
    denom = sum(exps)
    pooled = sum(g * (e / denom) for g, e in zip(gf, exps))
    img_feat = jax.nn.relu(_dense(pooled, agg, "fc"))  # (T, 16)

    # --- density ---
    vox_img = jnp.concatenate([vox_ref[:], img_feat], axis=-1)
    x = jax.nn.relu(_dense(vox_img, p, "lr0"))  # (T, hid)
    sigma = jax.nn.softplus(_dense(x, p, "sigma"))  # (T, 1)
    sigma_ref[:] = sigma.astype(sigma_ref.dtype)

    # --- payload blending ---
    shared_w = _dense(jnp.concatenate([x, vox_img], axis=-1), p, "weight0_shared")
    wl = []
    for v in range(V):
        h = jax.nn.relu(shared_w + _dense(frd[v], p, "weight0_view"))
        wl.append(jax.nn.relu(_dense(h, p, "weight1")))  # (T, 1)
    m = wl[0]
    for v in range(1, V):
        m = jnp.maximum(m, wl[v])
    exps = [jnp.exp(w - m) for w in wl]
    denom = sum(exps)
    blended = sum(payload_ref[v] * (e / denom) for v, e in enumerate(exps))

    extra = jax.nn.relu(_dense(x, p, "feat_head"))
    feat_ref[:] = jnp.concatenate([blended, extra], axis=-1).astype(feat_ref.dtype)


def fused_bundle_nerf(
    params: dict,
    vox: jax.Array,
    payload: jax.Array,
    frd: jax.Array,
    interpret: bool | None = None,
):
    """Run the fused head.

    Args:
      params: the BundleNeRF flax param subtree ({'agg': {...}, 'lr0': ...}).
      vox: (N, vox_dim); payload: (V, N, P); frd: (V, N, F4).
      interpret: run in interpreter mode (CPU tests).

    Returns: sigma (N,) float32, feat (N, P + voxel_dim) in payload dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    V, N, P = payload.shape
    vox_dim = vox.shape[-1]
    out_dim = P + params["feat_head"]["kernel"].shape[-1]

    pad = (-N) % TILE
    if pad:
        vox = jnp.pad(vox, ((0, pad), (0, 0)))
        payload = jnp.pad(payload, ((0, 0), (0, pad), (0, 0)))
        frd = jnp.pad(frd, ((0, 0), (0, pad), (0, 0)))
    Np = N + pad
    grid = (Np // TILE,)

    # Parameters are tiny; replicate them to every tile via full-array specs.
    flat_params, treedef = jax.tree_util.tree_flatten(params)

    def kernel(*refs):
        n_p = len(flat_params)
        vox_ref, payload_ref, frd_ref = refs[:3]
        param_refs = refs[3 : 3 + n_p]
        sigma_ref, feat_ref = refs[3 + n_p :]
        p = jax.tree_util.tree_unflatten(treedef, [r[:] for r in param_refs])
        _kernel(vox_ref, payload_ref, frd_ref, p, sigma_ref, feat_ref, V=V)

    sigma, feat = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, vox_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (V, TILE, P), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (V, TILE, frd.shape[-1]), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [
            pl.BlockSpec(
                w.shape,
                lambda i, nd=w.ndim: (0,) * nd,  # bind ndim now (late-binding!)
                memory_space=pltpu.VMEM,
            )
            for w in flat_params
        ],
        out_specs=[
            # sigma kept 2-D: Mosaic requires 1-D outputs to match XLA's
            # 1024-element tiling, which conflicts with the sample tile.
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TILE, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
            jax.ShapeDtypeStruct((Np, out_dim), payload.dtype),
        ],
        interpret=interpret,
    )(vox, payload, frd, *flat_params)

    return sigma[:N, 0], feat[:N]
