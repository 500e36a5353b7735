"""End-to-end self-validation: teacher-rendered COLMAP dataset.

Usage: python benches/e2e_teacher.py [steps] [workdir]


Builds a teacher splat scene, renders 8 ring views with OUR renderer, writes
them as a COLMAP dataset (pinhole cameras, subsampled teacher cloud for
init), then trains via the public train_process stream and reports eval
PSNR/SSIM — exercising the full CLI path (dataset loader, camera
conversion roundtrip, refine, eval, export) on whatever backend is active.
This harness caught two real TPU-only bugs: bf16 SSIM convs and the
zero-splat ply export crash.
"""
import pathlib, shutil, struct, sys, time
import numpy as np
from PIL import Image
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')

from brush_tpu.camera import Camera
from brush_tpu.render import RenderConfig, camera_inputs, render
from brush_tpu.models.splats import from_raw
from brush_tpu.ops.sh import rgb_to_sh_dc

W, H = 512, 384
FX = FY = 400.0
N_VIEWS = 8
N_TEACH = 4000

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 600
root = pathlib.Path(sys.argv[2] if len(sys.argv) > 2 else '/tmp/e2e_teacher')
shutil.rmtree(root, ignore_errors=True)
scene = root / 'scene'
(scene / 'sparse' / '0').mkdir(parents=True)
(scene / 'images').mkdir()

rng = np.random.default_rng(7)
means = rng.uniform(-1.5, 1.5, (N_TEACH, 3)).astype(np.float32)
log_scales = np.log(rng.uniform(0.02, 0.08, (N_TEACH, 3))).astype(np.float32)
quats = rng.standard_normal((N_TEACH, 4)).astype(np.float32)
quats /= np.linalg.norm(quats, axis=1, keepdims=True)
rgb = rng.uniform(0.05, 0.95, (N_TEACH, 3)).astype(np.float32)
sh = np.zeros((N_TEACH, 1, 3), np.float32)
sh[:, 0] = rgb_to_sh_dc(rgb)
opac = rng.uniform(1.0, 3.0, N_TEACH).astype(np.float32)
teacher = from_raw(means, log_scales, quats, sh, opac)


def ring_camera(i):
    ang = 2 * np.pi * i / N_VIEWS
    pos = np.array([3.5 * np.sin(ang), 0.6, -3.5 * np.cos(ang)])
    fwd = -pos / np.linalg.norm(pos)                 # look at origin
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd); right /= np.linalg.norm(right)
    true_up = np.cross(fwd, right)
    rmat = np.stack([right, true_up, fwd], axis=1)   # c2w columns
    # rotmat -> wxyz quat
    t = np.trace(rmat)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        q = np.array([0.25 * s, (rmat[2, 1] - rmat[1, 2]) / s,
                      (rmat[0, 2] - rmat[2, 0]) / s,
                      (rmat[1, 0] - rmat[0, 1]) / s])
    else:
        i_ = np.argmax(np.diag(rmat))
        j, k = (i_ + 1) % 3, (i_ + 2) % 3
        s = np.sqrt(1.0 + rmat[i_, i_] - rmat[j, j] - rmat[k, k]) * 2
        q = np.zeros(4)
        q[0] = (rmat[k, j] - rmat[j, k]) / s
        q[1 + i_] = 0.25 * s
        q[1 + j] = (rmat[j, i_] + rmat[i_, j]) / s
        q[1 + k] = (rmat[k, i_] + rmat[i_, k]) / s
    return Camera(position=pos, rotation=q,
                  fov_x=2 * np.arctan(W / (2 * FX)),
                  fov_y=2 * np.arctan(H / (2 * FY)))


rcfg = RenderConfig(img_size=(W, H), sh_degree=0, isect_cap=1 << 19,
                    expand_k0=8, use_pallas=True)
bg = jnp.zeros(3, jnp.float32)
fwd = jax.jit(lambda ci: render(teacher.means, teacher.log_scales,
                                teacher.quats, teacher.sh_coeffs,
                                teacher.raw_opacities, ci, bg, rcfg)[0])

cams = [ring_camera(i) for i in range(N_VIEWS)]
for i, cam in enumerate(cams):
    img = np.asarray(fwd(camera_inputs(cam, (W, H))))
    arr = (np.clip(img[..., :3], 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(scene / 'images' / f'img_{i}.png')
print('teacher views rendered', flush=True)

# COLMAP bin: w2c = inverse of c2w. R_w2c = R_c2wᵀ, t = -R_w2c @ pos.
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
        f.write(f'img_{i}.png'.encode() + b'\x00')
        f.write(struct.pack('<Q', 0))

with open(scene / 'sparse/0/points3D.bin', 'wb') as f:
    sub = rng.choice(N_TEACH, 2000, replace=False)
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

tcfg = TrainConfig(total_train_iters=STEPS, refine_every=150)
lcfg = LoadConfig(max_resolution=512, eval_split_every=8)
pcfg = ProcessConfig(eval_every=max(STEPS // 4, 1), export_every=0,
                     log_every=100,
                     export_path=str(root / 'out_{iter}.ply'),
                     sh_degree=0, use_pallas=True)
t0 = time.perf_counter()
for msg in train_process(str(scene), tcfg, lcfg, pcfg):
    if msg.kind in ('step', 'refine', 'eval', 'export'):
        d = {k: (round(v, 4) if isinstance(v, float) else v)
             for k, v in msg.data.items() if not isinstance(v, (list, dict))}
        print(f'[{time.perf_counter()-t0:7.1f}s] {msg.kind} it={msg.iter} {d}',
              flush=True)
