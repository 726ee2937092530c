"""Per-stage latency breakdown of the inference forward on the current device.

Times each pipeline section (FPN, MVS stages, bundle sampling, encoding,
NeRF+composite, decode) as separately jitted functions on the eval config
shapes, so optimization effort goes where the milliseconds are.

Usage: python tools/profile_forward.py [--size H W] [--views V] [--iters N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=5, name=""):
    """Chained-loop timing: per-iteration host syncs cost a full tunnel RTT
    (~50 ms) here, so iterations are chained on-device via lax.fori_loop
    (each depends on the previous through a 1e-12 perturbation of the first
    float arg) and only ONE host read happens at the end — the same method
    bench.py uses.  Returns (fn(*args), ms_per_iter)."""
    import jax
    import jax.numpy as jnp

    from gdb_nerf_tpu.runtime.renderer import force_sync

    out = fn(*args)  # real output for downstream stages

    # Find a float-array argument to perturb so iterations can't be CSE'd.
    def perturb(args, eps):
        done = False
        new = []
        for a in args:
            if (
                not done
                and hasattr(a, "dtype")
                and jnp.issubdtype(a.dtype, jnp.floating)
            ):
                new.append(a + eps.astype(a.dtype))
                done = True
            else:
                new.append(a)
        assert done, "no float arg to perturb"
        return tuple(new)

    def run_n(n):
        def body(i, carry):
            o = fn(*perturb(args, carry * 1e-12))
            leaves = [
                l for l in jax.tree_util.tree_leaves(o)
                if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
            ]
            return sum(jnp.mean(l).astype(jnp.float32) for l in leaves)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    g = jax.jit(run_n, static_argnums=0)
    force_sync(g(iters))  # compile + warmup
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        force_sync(g(iters))
        best = min(best, (time.time() - t0) / iters * 1000)
    print(f"{name:<28} {best:8.2f} ms", flush=True)
    return out, best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=2, default=[512, 640])
    ap.add_argument("--views", type=int, default=3)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16",
                    help="feature-path dtype (bench.py uses bfloat16)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gdb_nerf_tpu.models.feature_net import FeatureNet
    from gdb_nerf_tpu.models.cost_reg_net import CostRegNet, CostRegNetSmall
    from gdb_nerf_tpu.models.nerf_head import BundleNeRF
    from gdb_nerf_tpu.models.decoder_rdn import Decoder
    from gdb_nerf_tpu.ops import bundles, cost_volume, mip, render

    H, W = args.size
    V = args.views
    S = args.samples
    B = 1
    dt = jnp.dtype(args.dtype)
    print(f"device: {jax.devices()[0]}  size {H}x{W}  V={V}  S={S}  dtype={dt.name}")
    key = jax.random.PRNGKey(0)

    # --- FPN ---
    fpn = FeatureNet(dtype=dt)
    imgs = jax.random.uniform(key, (B * V, H, W, 3))
    fv = fpn.init(key, imgs, train=False)
    f_fpn = jax.jit(lambda v, x: fpn.apply(v, x, train=False))
    feats, _ = timed(f_fpn, fv, imgs, iters=args.iters, name="FPN features")

    # --- cameras ---
    K = np.array([[2.0 * W, 0, W / 2], [0, 2.0 * W, H / 2], [0, 0, 1]], np.float32)
    exts = []
    for i in range(V + 1):
        e = np.eye(4, dtype=np.float32)
        e[0, 3] = -0.3 + 0.2 * i
        e[2, 3] = 4.0
        exts.append(e)
    src_exts = jnp.asarray(np.stack(exts[:V]))
    tar_ext = jnp.asarray(exts[-1])
    Kj = jnp.asarray(K)

    def scale_K(k, s):
        return k * jnp.asarray([s, s, 1.0])[:, None]

    # --- stage 0 cost volume (1/8 res, D=64, feats at 1/4) ---
    D0 = 64
    h8, w8 = H // 8, W // 8
    nf = jnp.broadcast_to(jnp.asarray([1.0 / 2.5, 1.0 / 6.0])[:, None, None], (2, h8, w8))
    dv0 = nf[0] + (nf[1] - nf[0]) * jnp.linspace(0, 1, D0)[:, None, None]
    src_ints0 = jnp.stack([scale_K(Kj, 0.25)] * V)
    f_cv0 = jax.jit(
        lambda f: cost_volume.build_cost_volume(
            f, src_exts, src_ints0, tar_ext, scale_K(Kj, 0.125), dv0, True
        )
    )
    feat0 = feats[0].reshape(V, H // 4, W // 4, 32).astype(dt)
    vol0, _ = timed(f_cv0, feat0, iters=args.iters, name="cost volume stage0")

    # --- stage 0 reg ---
    reg0 = CostRegNetSmall(8, 8, None, dt)
    rv0 = reg0.init(key, vol0[None], train=False)
    f_reg0 = jax.jit(lambda v, x: reg0.apply(v, x, train=False))
    (fvol0, prob0), _ = timed(f_reg0, rv0, vol0[None], iters=args.iters, name="CostRegSmall stage0")

    # --- stage 1 cost volume (1/2 res, D=8, feats at 1/2) ---
    D1 = 8
    h2, w2 = H // 2, W // 2
    dv1 = jnp.broadcast_to(
        jnp.linspace(2.5, 6.0, D1)[:, None, None], (D1, h2, w2)
    )
    src_ints1 = jnp.stack([scale_K(Kj, 0.5)] * V)
    feat1 = feats[1].reshape(V, H // 2, W // 2, 16).astype(dt)
    f_cv1 = jax.jit(
        lambda f: cost_volume.build_cost_volume(
            f, src_exts, src_ints1, tar_ext, scale_K(Kj, 0.5), dv1, False
        )
    )
    vol1, _ = timed(f_cv1, feat1, iters=args.iters, name="cost volume stage1")

    reg1 = CostRegNet(8, 8, None, dt)
    rv1 = reg1.init(key, vol1[None], train=False)
    f_reg1 = jax.jit(lambda v, x: reg1.apply(v, x, train=False))
    (fvol1, prob1), _ = timed(f_reg1, rv1, vol1[None], iters=args.iters, name="CostRegNet stage1")

    # --- bundle sampling ---
    b = 2
    Hb, Wb = H // b, W // b
    rb = bundles.make_ray_bundles(
        tar_ext, Kj, (H, W), jnp.asarray(2.5), jnp.asarray(6.0), b
    )
    dr = jnp.stack(
        [jnp.full((Hb, Wb), 3.5), jnp.full((Hb, Wb), 4.5)]
    )
    vr = jnp.stack([jnp.full((Hb, Wb), 2.5), jnp.full((Hb, Wb), 6.0)])
    f_sample = jax.jit(
        lambda d, v: bundles.sample_bundles(rb, d, v, S, 64, False, True)
    )
    smp, _ = timed(f_sample, dr, vr, iters=args.iters, name="bundle sampling")

    # --- encoding ---
    src_imgs = jax.random.uniform(key, (V, H, W, 3)).astype(dt)
    img_feat = jax.random.uniform(key, (V, Hb, Wb, 16 + 3)).astype(dt)
    f_enc = jax.jit(
        lambda si, ifeat, fv: bundles.encode_samples(
            rb,
            smp,
            si,
            ifeat,
            *mip.pack_pyramid(mip.build_pyramid(ifeat, 3)),
            fv,
            src_exts,
            jnp.stack([Kj] * V),
            3,
        )
    )
    enc, _ = timed(f_enc, src_imgs, img_feat, fvol1[0], iters=args.iters, name="encode samples")

    # --- NeRF head + composite ---
    head = BundleNeRF(64, 8, True, dt)
    bsq = b * b
    payload = jnp.concatenate(
        [enc.rgbs.reshape(V, Hb, Wb, S, bsq * 3), enc.mip_feat], axis=-1
    )[None]  # (1, V, Hb, Wb, S, P)
    frd = jnp.concatenate([enc.mip_feat, enc.ray_diff], axis=-1)[None]
    vox = enc.vox_feat[None]
    hv = head.init(key, vox, payload, frd)

    def nerf_comp(v, vox, pl, fr, valid, z):
        sigma, feat = head.apply(v, vox, pl, fr)
        w = render.weights_from_sigma(sigma, valid)
        return render.composite(w, feat, z)

    f_nerf = jax.jit(nerf_comp)
    (fmap, dmap, op), _ = timed(
        f_nerf, hv, vox, payload, frd, smp.valid[None], smp.z_vals[None],
        iters=args.iters, name="NeRF head + composite",
    )

    # --- decoder ---
    dec = Decoder(3, 64, 3, b, dt)
    dvr = dec.init(key, fmap[..., bsq * 3 :])
    f_dec = jax.jit(lambda v, x: dec.apply(v, x))
    timed(f_dec, dvr, fmap[..., bsq * 3 :], iters=args.iters, name="RDN decoder")


if __name__ == "__main__":
    main()
