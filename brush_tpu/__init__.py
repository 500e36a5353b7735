"""brush_tpu: a TPU-native 3D Gaussian Splatting framework (JAX/XLA/Pallas).

Ground-up rebuild of the capabilities of ArthurBrussee/brush for TPU:
training, viewing, and exporting 3D Gaussian splats from COLMAP/Nerfstudio/
RealityCapture datasets, designed around XLA's static-shape compilation
model, Pallas kernels for the rasterization hot path, and jax.sharding for
multi-chip data parallelism over camera views.
"""

__version__ = "0.1.0"

from brush_tpu.camera import Camera, Pinhole, KannalaBrandt4, RadialTangential8, ThinPrismFisheye  # noqa: F401
from brush_tpu.render import RenderConfig, render, camera_inputs  # noqa: F401
