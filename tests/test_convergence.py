"""End-to-end optimization quality: a random student trained against a
rendered teacher scene must make large PSNR gains. Catches optimizer /
LR-scaling / gradient-flow bugs that pointwise parity tests cannot see
(the reference's integration tests play the same role, SURVEY.md §4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from brush_tpu.camera import Camera
from brush_tpu.ops.loss import pack_gt, psnr
from brush_tpu.ops.sh import rgb_to_sh_dc
from brush_tpu.render import RenderConfig, camera_inputs, render
from brush_tpu.train.config import TrainConfig
from brush_tpu.train.splat_init import create_random_splats
from brush_tpu.train.trainer import SceneBatch, init_train_state, train_step

IMG = (48, 48)
RCFG = RenderConfig(img_size=IMG, sh_degree=0, isect_cap=1 << 12,
                    max_per_tile=512)


def _teacher_image(rng, cam):
    n = 24
    means = rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    sh = np.asarray(rgb_to_sh_dc(rng.uniform(0.1, 0.9, (n, 1, 3))),
                    np.float32)
    img, _ = render(jnp.asarray(means),
                    jnp.full((n, 3), np.log(0.35), jnp.float32),
                    jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (n, 1)),
                    jnp.asarray(sh),
                    jnp.full((n,), 2.5, jnp.float32),
                    camera_inputs(cam, IMG), jnp.zeros(3), RCFG)
    return np.asarray(img[..., :3])


def test_student_converges_to_teacher():
    rng = np.random.default_rng(7)
    cam = Camera(position=np.array([0.0, 0.0, -4.0]),
                 rotation=np.array([1.0, 0.0, 0.0, 0.0]),
                 fov_x=0.9, fov_y=0.9)
    gt_rgb = _teacher_image(rng, cam)
    gt = pack_gt(gt_rgb)

    student = create_random_splats(200, [cam], rng, scene_scale_override=5.0,
                                   sh_degree=0)
    # Toy-scale LRs: the production schedule (lr_mean 2e-5 etc.) is tuned
    # for multi-view 30k-step runs and correctly crawls on a 400-step
    # single-view memorization; with matched LRs the same step reaches
    # >49 dB in 200 steps (sanity-checked against a plain-optax oracle,
    # which peaks at ~53 dB on this scene).
    tcfg = TrainConfig(total_train_iters=100000, lr_mean=1e-2,
                       lr_mean_end=1e-2, lr_opac=2e-2, lr_scale=2e-2,
                       lr_rotation=2e-2, lr_coeffs_dc=2e-2,
                       lr_coeffs_sh_scale=1.0,
                       background_noise_strength=0.0,
                       mean_noise_weight=0.0, ssim_weight=0.0)
    state = init_train_state(student, jax.random.PRNGKey(1), 2.0)
    batch = SceneBatch(gt_packed=jnp.asarray(gt), cam=camera_inputs(cam, IMG))
    step = jax.jit(lambda s, b: train_step(s, b, tcfg, RCFG),
                   donate_argnums=0)

    def student_psnr(state):
        folded = state.splats.fold_min_scale()
        img, _ = render(folded.means, folded.log_scales, folded.quats,
                        folded.sh_coeffs, folded.raw_opacities,
                        camera_inputs(cam, IMG), jnp.zeros(3), RCFG)
        return float(psnr(img[..., :3], jnp.asarray(gt)))

    before = student_psnr(state)
    for _ in range(250):
        state, stats, _ = step(state, batch)
    after = student_psnr(state)

    assert np.isfinite(after)
    # Expect a big optimization gain on a single memorized view.
    assert after > before + 15.0, f"PSNR {before:.2f} -> {after:.2f}"
    assert after > 30.0, f"final PSNR too low: {after:.2f}"
