"""North-star-shaped quality run (VERDICT r3 item 5).

Real MipNeRF-360 data is unavailable in this environment (zero egress), so
this is the closest evidenceable protocol: a scaled teacher scene — a few
hundred thousand teacher splats with structured color — rendered at
garden-like resolution (1232x816, the standard MipNeRF-360 4x-downsample)
into a ring of COLMAP views, then reconstructed from a sparse point init
through the FULL production path (train_process: refine/densify, eval,
export) for thousands of steps. Emits a PSNR/SSIM-vs-steps curve artifact.

Usage: python benches/quality_run.py [steps] [teacher_n] [--json PATH]
Defaults: 2000 steps, 240k teacher splats.

Eval protocol matches the reference (eval.rs:22-63): black bg, 8-bit
roundtrip, PSNR = 10*log10(1/MSE); SSIM via the fused kernel.
"""
import json
import pathlib
import shutil
import struct
import sys
import time

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

sys.path.insert(0, "/root/repo")

from brush_tpu.camera import Camera
from brush_tpu.models.splats import from_raw
from brush_tpu.ops.sh import rgb_to_sh_dc
from brush_tpu.render import RenderConfig, camera_inputs, render

W, H = 1232, 816
FX = FY = 1000.0
N_VIEWS = 24

args = [a for a in sys.argv[1:] if not a.startswith("--")]
STEPS = int(args[0]) if args else 2000
N_TEACH = int(args[1]) if len(args) > 1 else 240_000
json_path = (sys.argv[sys.argv.index("--json") + 1]
             if "--json" in sys.argv else None)

root = pathlib.Path('/tmp/quality_run')
shutil.rmtree(root, ignore_errors=True)
scene = root / 'scene'
(scene / 'sparse' / '0').mkdir(parents=True)
(scene / 'images').mkdir()

# --- Teacher scene: a structured "garden": a bumpy textured ground plane,
# clustered foliage blobs, and a central object, so the target has real
# spatial frequency content rather than white noise.
rng = np.random.default_rng(7)
n_ground = N_TEACH // 3
n_blobs = N_TEACH // 2
n_center = N_TEACH - n_ground - n_blobs

gx = rng.uniform(-3.0, 3.0, (n_ground, 2)).astype(np.float32)
gy = (-0.8 + 0.08 * np.sin(3.1 * gx[:, 0]) * np.cos(2.7 * gx[:, 1])
      ).astype(np.float32)
ground = np.stack([gx[:, 0], gy, gx[:, 1]], -1)
ground_rgb = np.stack([
    0.25 + 0.15 * np.sin(7.0 * gx[:, 0]) * np.sin(6.0 * gx[:, 1]) ** 2,
    0.45 + 0.2 * np.cos(5.0 * gx[:, 0] + 2.0 * gx[:, 1]),
    0.2 + 0.1 * np.sin(9.0 * gx[:, 1])], -1).astype(np.float32)

n_clusters = 40
cc = rng.uniform(-2.4, 2.4, (n_clusters, 3)).astype(np.float32)
cc[:, 1] = rng.uniform(-0.5, 1.2, n_clusters)
which = rng.integers(0, n_clusters, n_blobs)
blobs = (cc[which] + rng.normal(0, 0.25, (n_blobs, 3))).astype(np.float32)
base = rng.uniform(0.1, 0.9, (n_clusters, 3)).astype(np.float32)
blob_rgb = np.clip(base[which] + rng.normal(0, 0.08, (n_blobs, 3)), 0.02,
                   0.98).astype(np.float32)

theta = rng.uniform(0, 2 * np.pi, n_center)
phi = np.arccos(rng.uniform(-1, 1, n_center))
r = 0.6 * rng.uniform(0.8, 1.0, n_center) ** (1 / 3)
center = np.stack([r * np.sin(phi) * np.cos(theta),
                   0.3 + r * np.cos(phi),
                   r * np.sin(phi) * np.sin(theta)], -1).astype(np.float32)
center_rgb = np.stack([0.8 + 0.15 * np.sin(12 * theta),
                       0.3 + 0.1 * np.cos(8 * phi),
                       0.25 * np.ones_like(theta)], -1).astype(np.float32)

means = np.concatenate([ground, blobs, center]).astype(np.float32)
rgb = np.clip(np.concatenate([ground_rgb, blob_rgb, center_rgb]), 0.01,
              0.99).astype(np.float32)
log_scales = np.log(rng.uniform(0.008, 0.035, (N_TEACH, 3))
                    ).astype(np.float32)
quats = rng.standard_normal((N_TEACH, 4)).astype(np.float32)
quats /= np.linalg.norm(quats, axis=1, keepdims=True)
sh = np.zeros((N_TEACH, 1, 3), np.float32)
sh[:, 0] = rgb_to_sh_dc(rgb)
opac = rng.uniform(0.5, 3.0, N_TEACH).astype(np.float32)
teacher = from_raw(means, log_scales, quats, sh, opac)
print(f"teacher: {N_TEACH} splats, {N_VIEWS} views @ {W}x{H}, "
      f"{STEPS} steps", flush=True)


def ring_camera(i):
    ang = 2 * np.pi * i / N_VIEWS
    pos = np.array([4.2 * np.sin(ang), 1.4 + 0.4 * np.sin(3 * ang),
                    -4.2 * np.cos(ang)])
    fwd = -pos / np.linalg.norm(pos)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd); right /= np.linalg.norm(right)
    true_up = np.cross(fwd, right)
    rmat = np.stack([right, true_up, fwd], axis=1)
    t = np.trace(rmat)
    s = np.sqrt(max(t + 1.0, 1e-12)) * 2
    q = np.array([0.25 * s, (rmat[2, 1] - rmat[1, 2]) / s,
                  (rmat[0, 2] - rmat[2, 0]) / s,
                  (rmat[1, 0] - rmat[0, 1]) / s])
    return Camera(position=pos, rotation=q,
                  fov_x=2 * np.arctan(W / (2 * FX)),
                  fov_y=2 * np.arctan(H / (2 * FY)))


from brush_tpu.ops.capacity import plan_caps
cams = [ring_camera(i) for i in range(N_VIEWS)]
ci0 = camera_inputs(cams[0], (W, H))
k0, rem_cap = plan_caps(teacher.means, teacher.log_scales, teacher.quats,
                        teacher.raw_opacities, ci0, (W, H), margin=1.4)
rcfg = RenderConfig(img_size=(W, H), sh_degree=0, isect_cap=rem_cap,
                    expand_k0=k0, use_pallas=True, forward_only=True)
bg = jnp.zeros(3, jnp.float32)
fwd = jax.jit(lambda ci: render(teacher.means, teacher.log_scales,
                                teacher.quats, teacher.sh_coeffs,
                                teacher.raw_opacities, ci, bg, rcfg)[0])
for i, cam in enumerate(cams):
    img = np.asarray(fwd(camera_inputs(cam, (W, H))))
    arr = (np.clip(img[..., :3], 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(scene / 'images' / f'img_{i:02d}.png')
print('teacher views rendered', flush=True)

with open(scene / 'sparse/0/cameras.bin', 'wb') as f:
    f.write(struct.pack('<Q', 1))
    f.write(struct.pack('<iiQQ', 1, 1, W, H))        # PINHOLE
    f.write(struct.pack('<4d', FX, FY, W / 2, H / 2))


def quat_to_mat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def mat_to_quat(m):
    t = np.trace(m)
    s = np.sqrt(max(t + 1.0, 1e-12)) * 2
    return np.array([0.25 * s, (m[2, 1] - m[1, 2]) / s,
                     (m[0, 2] - m[2, 0]) / s, (m[1, 0] - m[0, 1]) / s])


with open(scene / 'sparse/0/images.bin', 'wb') as f:
    f.write(struct.pack('<Q', N_VIEWS))
    for i, cam in enumerate(cams):
        r_c2w = quat_to_mat(cam.rotation / np.linalg.norm(cam.rotation))
        r_w2c = r_c2w.T
        tvec = -r_w2c @ cam.position
        qv = mat_to_quat(r_w2c)
        f.write(struct.pack('<i', i + 1))
        f.write(struct.pack('<4d', *qv))
        f.write(struct.pack('<3d', *tvec))
        f.write(struct.pack('<i', 1))
        f.write(f'img_{i:02d}.png'.encode() + b'\x00')
        f.write(struct.pack('<Q', 0))

with open(scene / 'sparse/0/points3D.bin', 'wb') as f:
    sub = rng.choice(N_TEACH, 30_000, replace=False)
    f.write(struct.pack('<Q', len(sub)))
    for j, i in enumerate(sub):
        f.write(struct.pack('<Q', j))
        f.write(struct.pack('<3d', *means[i]))
        c = (np.clip(rgb[i], 0, 1) * 255).astype(np.uint8)
        f.write(struct.pack('<3B', *c))
        f.write(struct.pack('<d', 0.5))
        f.write(struct.pack('<Q', 0))
print('colmap dataset written', flush=True)

from brush_tpu.data.formats import LoadConfig
from brush_tpu.process import ProcessConfig, train_process
from brush_tpu.train.config import TrainConfig

tcfg = TrainConfig(total_train_iters=STEPS, refine_every=200)
lcfg = LoadConfig(max_resolution=max(W, H), eval_split_every=8)
pcfg = ProcessConfig(eval_every=max(STEPS // 10, 1), export_every=0,
                     log_every=100,
                     export_path=str(root / 'out_{iter}.ply'),
                     sh_degree=0, use_pallas=True)
t0 = time.perf_counter()
curve = []
splat_counts = []
for msg in train_process(str(scene), tcfg, lcfg, pcfg):
    if msg.kind in ('step', 'refine', 'eval', 'export', 'overflow'):
        d = {k: (round(v, 4) if isinstance(v, float) else v)
             for k, v in msg.data.items() if not isinstance(v, (list, dict))}
        print(f'[{time.perf_counter()-t0:7.1f}s] {msg.kind} it={msg.iter} '
              f'{d}', flush=True)
    if msg.kind == 'eval':
        curve.append(dict(step=msg.iter, psnr=round(msg.data['psnr'], 3),
                          ssim=round(msg.data['ssim'], 4)))
    if msg.kind in ('step', 'refine'):
        splat_counts.append(dict(step=msg.iter,
                                 splats=msg.data.get('splats')))

elapsed = time.perf_counter() - t0
if json_path:
    with open(json_path, 'w') as f:
        json.dump(dict(
            protocol=(f"{N_TEACH}-splat structured teacher, {N_VIEWS} ring "
                      f"views @ {W}x{H}, init from 30k COLMAP points, "
                      f"{STEPS} steps, refine every 200 (densify active); "
                      "eval per eval.rs:22-63 (black bg, 8-bit roundtrip)"),
            device=jax.devices()[0].device_kind,
            elapsed_s=round(elapsed, 1),
            psnr_ssim_curve=curve,
            splat_count_curve=splat_counts[-40:],
        ), f, indent=1)
    print(f"wrote {json_path}")
