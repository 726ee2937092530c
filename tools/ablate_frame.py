"""Marginal per-stage attribution of the fused frame via DCE ablation.

The per-stage numbers from tools/profile_forward.py are separately-jitted
chained loops: they carry fixed overhead and measure the pre-fusion regime
(they sum to ~2x the fused frame).  This tool measures the REAL marginal
cost of each encode component inside the fused frame: it monkeypatches
``bundles.encode_samples`` to zero selected outputs — XLA then dead-code-
eliminates the entire producer chain (gathers + their coordinate math), and
the frame-time drop IS that component's marginal cost in the fused graph.

Knockouts:
  none     baseline frame
  rgbs     member-RGB fetch (2x2 packed gathers + projection math)
  mip      mip pyramid fetch (2 rows/sample + LOD math)
  raydiff  ray-difference features (elementwise normalize chains)
  vox      cost-volume sample fetch
  encode   all of the above (sampler+depthnet+convs+head remain)
  fpn      zero FeatureNet outputs (kills all FPN convs)
  cvwarp   zero the homography-warp volume build (both stages)
  regs     zero both cost-reg U-Nets' outputs
  dec      zero the RDN decoder (coarse path)
  head     zero the bundle NeRF head (and everything upstream of it)
  samp     zero sample_bundles outputs
  mipgather  keep LOD/coordinate math, kill the gather rows + tap lerp
  mippack    keep the mip fetch, kill the pyramid build/pack writes

Usage: python tools/ablate_frame.py [--knock none rgbs mip ...] [--n 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--knock", nargs="*",
        default=["none", "rgbs", "mip", "raydiff", "vox", "encode"],
    )
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--cfg", default="configs/dtu_eval.yaml")
    ap.add_argument("--set", nargs="*", default=[])
    args = ap.parse_args()

    from gdb_nerf_tpu.runtime import cache

    cache.enable()
    import jax
    import jax.numpy as jnp

    from gdb_nerf_tpu.config import load_cfg
    from gdb_nerf_tpu.datasets import make_data_loader
    from gdb_nerf_tpu.models import network as network_mod
    from gdb_nerf_tpu.ops import bundles
    from gdb_nerf_tpu.runtime import make_network
    from gdb_nerf_tpu.runtime.renderer import force_sync, init_network, to_device

    cfg = load_cfg(
        args.cfg,
        ["synthetic", "True", "compute_dtype", "bfloat16"] + list(args.set),
    )
    network = make_network(cfg)
    loader = make_data_loader(cfg, is_train=False)
    batch = next(iter(loader))
    variables = init_network(network, cfg, sample_batch=batch)
    dev = to_device(batch)

    real_encode = bundles.encode_samples

    def make_patched(zero_fields):
        def patched(*a, **k):
            enc = real_encode(*a, **k)
            return enc._replace(
                **{f: jnp.zeros_like(getattr(enc, f)) for f in zero_fields}
            )

        return patched

    KNOCKS = {
        "none": [],
        "rgbs": ["rgbs"],
        "mip": ["mip_feat"],
        "raydiff": ["ray_diff"],
        "vox": ["vox_feat"],
        "encode": ["rgbs", "mip_feat", "ray_diff", "vox_feat"],
    }

    # Model-side knocks: zero a module/op OUTPUT (shape from the real call),
    # letting DCE erase its entire producer chain.
    from gdb_nerf_tpu.models import cost_reg_net as crn_mod
    from gdb_nerf_tpu.models import decoder_rdn as dec_mod
    from gdb_nerf_tpu.models import nerf_head as head_mod
    from gdb_nerf_tpu.ops import cost_volume as cv_mod

    def _zeroed(cls_call):
        def patched(self, *a, **k):
            out = cls_call(self, *a, **k)
            return jax.tree_util.tree_map(jnp.zeros_like, out)

        return patched

    MODEL_KNOCKS = {
        # kills the homography-warp volume build (both stages); U-Nets run
        # on zeros
        "cvwarp": (cv_mod.build_cost_volume, "build_cost_volume", cv_mod),
        # kills U-Nets AND their warp inputs AND most of the FPN
        "regs": None,  # handled via class patches below
        # kills the RDN decoder (coarse path)
        "dec": None,
        # kills the bundle NeRF head matmuls and everything upstream of it
        # (encode+sampling) — the remainder is FPN+MVS+decoder
        "head": None,
    }

    real_cv = cv_mod.build_cost_volume
    real_reg_small = crn_mod.CostRegNetSmall.__call__
    real_reg_full = crn_mod.CostRegNet.__call__
    real_dec = dec_mod.Decoder.__call__
    real_head = head_mod.BundleNeRF.__call__
    from gdb_nerf_tpu.models import feature_net as fpn_mod

    from gdb_nerf_tpu.models import network as net_mod
    from gdb_nerf_tpu.ops import mip as mip_mod

    real_fpn = fpn_mod.FeatureNet.__call__
    real_mipfetch = bundles.mip_texture_fetch_packed
    real_sample = bundles.sample_bundles
    real_pack = mip_mod.pack_pyramid

    def pack_dummy(levels):
        """Keeps the mip FETCH live but kills the pyramid BUILD: the packed
        table becomes a broadcast of one level-0 scalar, so XLA DCEs the
        build_pyramid reductions and the 4C pack writes while the gathers,
        tap lerps, and LOD math still execute at full size.
        marginal(mip) - marginal(mippack) - marginal(mipgather-ish overlap)
        attributes the build separately from the fetch."""
        import jax.numpy as jnp

        packed, offs = real_pack(levels)
        seed = levels[0].reshape(-1)[0].astype(packed.dtype)
        return jnp.broadcast_to(seed, packed.shape), offs

    def mipfetch_mathonly(packed, offsets, base_hw, uv, lod, max_level):
        """All the uv/lod coordinate math stays live; the gather rows and
        the 4-tap lerp are replaced by a rank-1 combine — DCE removes only
        the take + tap weights.  marginal(mip) - marginal(mipgather) is
        then the pure LOD/coordinate-math cost."""
        C = packed.shape[-1] // 4
        return (lod + uv[..., 0] + uv[..., 1])[..., None] * packed[0, :C]

    def apply_model_knock(name):
        if name == "cvwarp":
            cv_mod.build_cost_volume = lambda *a, **k: jax.tree_util.tree_map(
                jnp.zeros_like, real_cv(*a, **k)
            )
        elif name == "regs":
            crn_mod.CostRegNetSmall.__call__ = _zeroed(real_reg_small)
            crn_mod.CostRegNet.__call__ = _zeroed(real_reg_full)
        elif name == "dec":
            dec_mod.Decoder.__call__ = _zeroed(real_dec)
        elif name == "head":
            head_mod.BundleNeRF.__call__ = _zeroed(real_head)
        elif name == "fpn":
            fpn_mod.FeatureNet.__call__ = _zeroed(real_fpn)
        elif name == "mipgather":
            bundles.mip_texture_fetch_packed = mipfetch_mathonly
        elif name == "mippack":
            mip_mod.pack_pyramid = pack_dummy
            net_mod.mip.pack_pyramid = pack_dummy
        elif name == "samp":
            bundles.sample_bundles = lambda *a, **k: jax.tree_util.tree_map(
                jnp.zeros_like, real_sample(*a, **k)
            )
        else:
            raise SystemExit(f"unknown knock: {name}")

    def clear_model_knocks():
        cv_mod.build_cost_volume = real_cv
        crn_mod.CostRegNetSmall.__call__ = real_reg_small
        crn_mod.CostRegNet.__call__ = real_reg_full
        dec_mod.Decoder.__call__ = real_dec
        head_mod.BundleNeRF.__call__ = real_head
        fpn_mod.FeatureNet.__call__ = real_fpn
        bundles.mip_texture_fetch_packed = real_mipfetch
        bundles.sample_bundles = real_sample
        mip_mod.pack_pyramid = real_pack
        net_mod.mip.pack_pyramid = real_pack

    def timed_frame():
        def run_n(n):
            def body(i, carry):
                sv = dict(dev["src_views"])
                sv["rgb"] = sv["rgb"] + carry * 1e-12
                b = {**dev, "src_views": sv}
                ret, _, _ = network.apply(variables, b, train=False)
                return ret["rgb"].mean()

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        g = jax.jit(run_n, static_argnums=0)
        force_sync(g(args.n))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            force_sync(g(args.n))
            best = min(best, (time.time() - t0) / args.n)
        return best * 1e3

    base_ms = None
    # network.py calls bundles.encode_samples through the module attribute
    # (network.py:288), so patching the bundles module attribute suffices.
    assert network_mod.bundles is bundles

    for name in args.knock:
        if name in KNOCKS:
            fields = KNOCKS[name]
            bundles.encode_samples = (
                make_patched(fields) if fields else real_encode
            )
        else:
            apply_model_knock(name)
        try:
            ms = timed_frame()
        finally:
            bundles.encode_samples = real_encode
            clear_model_knocks()
        if name == "none":
            base_ms = ms
            print(f"{name:8s} {ms:8.2f} ms/frame (baseline)", flush=True)
        else:
            delta = (base_ms - ms) if base_ms is not None else float("nan")
            print(
                f"{name:8s} {ms:8.2f} ms/frame   marginal cost {delta:+7.2f} ms",
                flush=True,
            )


if __name__ == "__main__":
    main()
