"""Numeric constants shared across the render/train pipeline.

Every value here is part of the numerical contract with the reference
implementation (brush @ /root/reference); sources are cited per constant so
parity tests can be traced back. Collected in one module per SURVEY.md §7
("collect them into one constants module").
"""

# --- Tiling ---
# The reference uses 16x16 tiles (brush-render/src/kernels/helpers.rs:14-15),
# sized for a GPU workgroup. On TPU the tile size trades sort volume against
# rasterizer pair work: intersections scale ~(bbox/tw + 1)^2 while per-slot
# kernel work scales ~tw^2, and the measured v5e cost model (sort ~1 ns per
# element per operand vs ~11 ps per pixel-splat pair) puts the optimum at
# 32x32 — it cuts the dominant tile-sort volume ~2.4x on bench scenes for a
# modest kernel-cost increase. Behavior (blend order, alpha math) is
# tile-size independent; only performance changes.
TILE_WIDTH = 32
TILE_SIZE = TILE_WIDTH * TILE_WIDTH  # 1024 pixels per tile

# --- Alpha cutoff (helpers.rs:22-23) ---
# Hard cutoff in production; the smooth C^1 band exists only for
# finite-difference gradient tests (RasterPass::BackwardSmoothCutoff).
ALPHA_CUTOFF_MID = 1.0 / 255.0
ALPHA_CUTOFF_BAND = 1.0e-3

# --- Rasterizer blending (rasterize.rs:128,138) ---
ALPHA_CAP = 0.999                 # alpha = min(0.999, opac * exp(-sigma))
TRANSMITTANCE_EPS = 1.0e-4        # stop blending when next_T <= this

# --- Backward-pass guards (rasterize_backwards.rs:362; project_backwards.rs:186-188) ---
SATURATED_ALPHA_GRAD_CUTOFF = 0.999   # skip conic/xy/alpha grads past this
REFINE_WEIGHT_CLAMP = 1.0e32
REFINE_ALPHA_FLOOR = 1.0e-5

# --- Projection / culling gates (project_forward.rs:44-111) ---
NEAR_PLANE = 0.01                 # pinhole: cull mean_c.z < this
MAX_VIEW_Z = 1.0e10               # cull mean_c.z > this (finite-but-absurd)
QUAT_NORM_SQ_MIN = 1.0e-6
COV2D_ENTRY_CLAMP = 1.0e18        # scale cov2d so max |entry| <= this (helpers.rs:166-170)

# --- Cov2d dilation blur (helpers.rs:177-191) ---
COV_BLUR_DEFAULT = 0.3
COV_BLUR_MIP = 0.1

# --- Post-SH color handling (project_visible.rs:63-71) ---
SH_COLOR_OFFSET = 0.5
COLOR_CLAMP = 100.0

# --- SH DC constant (brush-render/src/sh.rs:4, kernels/sh.rs:17) ---
SH_C0 = 0.2820948

# --- Jacobian clamp margin (camera.rs:220-226): pinhole limits are
# (1.15*img - c)/f and (-0.15*img - c)/f  (== canonical 3DGS 1.3*tan(fov/2)).
JAC_CLAMP_POS_MARGIN = 1.15
JAC_CLAMP_NEG_MARGIN = -0.15

# --- Fisheye FOV cull (render.rs:69-70): half_max_render_fov =
# min(1.05 * hypot(fovx, fovy), 2*pi - 1e-6) / 2
FISHEYE_FOV_MARGIN = 1.05

# --- SSIM loss (brush-loss/src/lib.rs:97-99, 337-346) ---
SSIM_C1 = 0.01 ** 2
SSIM_C2 = 0.03 ** 2
SSIM_WINDOW = 11
SSIM_SIGMA = 1.5

# --- Trainer defaults mirrored from the reference (brush-train/src/config.rs,
# train.rs; catalogued in SURVEY.md §5.6) — defined here only where a kernel
# needs them; the full config lives in brush_tpu/train/config.py. ---
ADAM_EPS = 1.0e-15
