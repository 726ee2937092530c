"""End-to-end ops-library drive: reconstruct a textured plane from 2 views."""
import numpy as np, jax, jax.numpy as jnp
from gdb_nerf_tpu.ops import camera, cost_volume, bundles, render, mip

H = W = 32
PLANE_Z = 4.0
K = np.array([[40.0, 0, W/2], [0, 40.0, H/2], [0, 0, 1]], np.float32)

def cam_at(dx):
    ext = np.eye(4, dtype=np.float32); ext[0, 3] = dx
    return ext

# Texture on the z=PLANE_Z plane: color = f(world x, y)
def plane_color(x, y):
    return np.stack([np.sin(x*7)*0.5+0.5, np.cos(y*9)*0.5+0.5, (np.sin(5*x+6*y)*0.5+0.5)], -1)

def render_view(ext):
    ro, rd, _, _ = camera.build_rays(jnp.array(ext), jnp.array(K), H, W)
    pts = np.asarray(ro) + np.asarray(rd) * PLANE_Z
    return plane_color(pts[..., 0], pts[..., 1]).astype(np.float32)

tar_ext = cam_at(0.0)
src_exts = np.stack([cam_at(-0.4), cam_at(0.4)])
src_ints = np.stack([K, K])
src_imgs = np.stack([render_view(e) for e in src_exts])
gt = render_view(tar_ext)

# 1) cost volume over depth hypotheses using raw RGB as features
nf = np.array([3.0, 5.0], np.float32)[:, None, None] * np.ones((2, H, W), np.float32)
dv = cost_volume.get_depth_values(jnp.array(nf), 32, False)
vol = cost_volume.build_cost_volume(jnp.array(src_imgs), jnp.array(src_exts), jnp.array(src_ints),
                                    jnp.array(tar_ext), jnp.array(K), dv, False)
# variance is lowest at the true depth -> softmax(-variance) regression
best = jnp.argmin(vol.mean(-1), axis=0)  # (H, W) index of min-variance plane
best_depth = jnp.take(dv[:, 0, 0], best)
interior = np.s_[8:-8, 8:-8]
argmin_err = float(jnp.abs(best_depth - PLANE_Z)[interior].mean())
print(f"argmin-variance depth err (interior): {argmin_err:.4f}  (plane at {PLANE_Z}, bin {2/31:.3f})")
assert argmin_err < 2/31 + 1e-3, "plane-sweep warp localization failed"
prob = jax.nn.softmax(-2000.0 * vol.mean(-1), axis=0)
depth, ci = cost_volume.depth_regression(dv, prob, 3.0, False)
err = float(jnp.abs(depth - PLANE_Z)[interior].mean())
print(f"MVS regressed depth err (interior): {err:.4f}")
assert err < 0.07, "depth regression failed"

# 2) bundle sampling inside the CI + compositing recovers depth & color
b = 2
rb = bundles.make_ray_bundles(jnp.array(tar_ext), jnp.array(K), (H, W), jnp.array(3.0), jnp.array(5.0), b)
dr = jax.image.resize(ci, (2, H//b, W//b), 'linear')
vr = jnp.stack([jnp.full((H//b, W//b), 3.0), jnp.full((H//b, W//b), 5.0)])
smp = bundles.sample_bundles(rb, dr, vr, 6, 64, False, True)
print("adaptive samples/bundle: min", float(smp.samples_per_bundle.min()), "max", float(smp.samples_per_bundle.max()))

feat_vol = jnp.zeros((32, H, W, 4))  # dummy voxel features
packed, offs = mip.pack_pyramid(mip.build_pyramid(jnp.array(src_imgs), 3))
enc = bundles.encode_samples(rb, smp, jnp.array(src_imgs), jnp.array(src_imgs),
                             packed, offs, feat_vol,
                             jnp.array(src_exts), jnp.array(src_ints), 3)
print("encoded rgbs shape:", enc.rgbs.shape, "mip feat:", enc.mip_feat.shape)

# density peaked at the sample closest to the true plane depth
sigma = 50.0 * jnp.exp(-jnp.square(smp.z_metric - PLANE_Z) * 40.0)
w = render.weights_from_sigma(sigma, smp.valid)
rgb_mean = enc.rgbs.mean(0)  # avg over views: (H/b, W/b, S, b*b, 3)
feat = rgb_mean.reshape(H//b, W//b, smp.z_vals.shape[-1], -1)
fmap, dmap, op = render.composite(w, feat, smp.z_vals)
bint = np.s_[5:-5, 5:-5]
nerf_depth_err = float(jnp.abs(dmap - PLANE_Z)[bint].mean())
img = fmap.reshape(H//b, W//b, 4, 3)[:, :, [0]]  # take first member ray's rgb
# compare to gt at those ray positions (top-left pixel of each bundle)
gt_sub = gt[0::b, 0::b]
rgb_err = float(jnp.abs(img[:, :, 0] - gt_sub)[bint].mean())
ci_width = float((dr[1]-dr[0])[bint].mean())
print(f"composited depth err (interior): {nerf_depth_err:.4f}  rgb err vs GT: {rgb_err:.4f}  mean CI width: {ci_width:.3f}")
# Depth composited through occlusion-aware alpha lands at the *near edge*
# of the density bump (first absorbing sample), so tolerance = bump width.
assert nerf_depth_err < 0.35 and rgb_err < 0.03
print("SCENE RECONSTRUCTION OK")
