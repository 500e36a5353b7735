import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
from brush_tpu.data.formats import LoadConfig, load_dataset
from brush_tpu.data.scene import AlphaMode, load_image, pack_rgba
from brush_tpu.render import RenderConfig, camera_inputs, render
from brush_tpu.io.ply import load_splat_ply
from brush_tpu.models.splats import from_raw
from brush_tpu.ops.loss import psnr, ssim

d = load_splat_ply('/tmp/e2e2/out_3000.ply')
sp = from_raw(d.means, d.log_scales, d.rotations, d.sh_coeffs, d.raw_opacities)
print('loaded', d.num_splats, 'splats, sh', d.sh_coeffs.shape)

ds = load_dataset('/tmp/e2e2/scene', LoadConfig(max_resolution=512, eval_split_every=8))
for which, sc, vi in (("train0", ds.train, 0), ("train3", ds.train, 3),
                      ("eval0", ds.eval, 0)):
    v = sc.views[vi]
    img_np, _ = load_image(sc.vfs, v.image_path, 512, v.mask_path)
    w, h = img_np.shape[1], img_np.shape[0]
    rcfg = RenderConfig(img_size=(w, h), sh_degree=0, isect_cap=1 << 20,
                        expand_k0=8, use_pallas=True)
    out, _ = jax.jit(lambda c: render(sp.means, sp.log_scales, sp.quats,
                                      sp.sh_coeffs, sp.raw_opacities, c,
                                      jnp.zeros(3, jnp.float32), rcfg))(
        camera_inputs(v.camera, (w, h)))
    gtp = jnp.asarray(pack_rgba(np.concatenate(
        [img_np, np.ones_like(img_np[..., :1])], -1), AlphaMode.NONE))
    print(f"{which}: psnr={float(psnr(out[..., :3], gtp)):.2f} "
          f"ssim={float(ssim(out[..., :3], gtp)):.4f}")
