import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
from brush_tpu.data.formats import LoadConfig, load_dataset
from brush_tpu.render import RenderConfig, camera_inputs, render
from brush_tpu.io.ply import load_splat_ply
from brush_tpu.models.splats import from_raw
from brush_tpu.ops.sh import rgb_to_sh_dc
from brush_tpu.ops.loss import psnr, ssim
from brush_tpu.data.scene import AlphaMode, pack_rgba

# rebuild the same teacher
rng = np.random.default_rng(7)
N_TEACH = 4000
means = rng.uniform(-1.5, 1.5, (N_TEACH, 3)).astype(np.float32)
log_scales = np.log(rng.uniform(0.02, 0.08, (N_TEACH, 3))).astype(np.float32)
quats = rng.standard_normal((N_TEACH, 4)).astype(np.float32)
quats /= np.linalg.norm(quats, axis=1, keepdims=True)
rgb = rng.uniform(0.05, 0.95, (N_TEACH, 3)).astype(np.float32)
sh = np.zeros((N_TEACH, 1, 3), np.float32)
sh[:, 0] = rgb_to_sh_dc(rgb)
opac = rng.uniform(1.0, 3.0, N_TEACH).astype(np.float32)
teacher = from_raw(means, log_scales, quats, sh, opac)

ds = load_dataset('/tmp/e2e2/scene', LoadConfig(max_resolution=512, eval_split_every=8))
from brush_tpu.data.scene import load_image
for which, sc in (("train", ds.train), ("eval", ds.eval)):
    v = sc.views[0]
    img_np, has_alpha = load_image(sc.vfs, v.image_path, 512, v.mask_path)
    w, h = img_np.shape[1], img_np.shape[0]
    rcfg = RenderConfig(img_size=(w, h), sh_degree=0, isect_cap=1 << 19,
                        expand_k0=8, use_pallas=True)
    ci = camera_inputs(v.camera, (w, h))
    out, _ = jax.jit(lambda c: render(teacher.means, teacher.log_scales,
                                      teacher.quats, teacher.sh_coeffs,
                                      teacher.raw_opacities, c,
                                      jnp.zeros(3, jnp.float32), rcfg))(ci)
    gtp = jnp.asarray(pack_rgba(np.concatenate(
        [img_np, np.ones_like(img_np[..., :1])], -1), AlphaMode.NONE))
    p = float(psnr(out[..., :3], gtp))
    s = float(ssim(out[..., :3], gtp))
    print(f"{which}: teacher-vs-GT psnr={p:.2f} ssim={s:.4f}")
