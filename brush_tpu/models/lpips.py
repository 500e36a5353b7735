"""LPIPS perceptual metric (VGG16 backbone + 1x1 linear heads).

Counterpart of crates/lpips (lib.rs:73-215): VGG16 feature extraction at the
five standard taps, unit-normalized feature differences, 1x1 linear heads,
spatial mean, summed across taps. The reference embeds converted
torch weights (burn_mapped.bin); this build loads weights from a
`.safetensors`/`.npz` file instead (see `convert_torch_lpips` for producing
one from the public `lpips` PyPI package) — the environment has no network
egress, so weights must be provided by the user. Raises a clear error if
used without weights.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv layout: (out_channels, n_convs) per block; taps after each block's
# final ReLU (torchvision feature indices 3, 8, 15, 22, 29).
_VGG_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]

# Input normalization used by the lpips package (its `scaling_layer`).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


@dataclasses.dataclass
class LpipsModel:
    params: dict  # {"conv_{b}_{i}": {"w": [kh,kw,cin,cout], "b": [cout]},
    #                "lin_{b}": {"w": [1,1,cin,1]}}

    def features(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        """x: [B,H,W,3] in [0,1] -> list of tap activations."""
        h = (x * 2.0 - 1.0 - _SHIFT) / _SCALE
        taps = []
        for b, (ch, n_convs) in enumerate(_VGG_BLOCKS):
            for i in range(n_convs):
                p = self.params[f"conv_{b}_{i}"]
                # HIGHEST precision: TPU convs default to bf16 on the MXU,
                # which breaks the PyTorch-parity tolerance (ops/loss.py's
                # SSIM blur hit the same trap).
                h = jax.lax.conv_general_dilated(
                    h, p["w"], (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    precision=jax.lax.Precision.HIGHEST)
                h = jax.nn.relu(h + p["b"])
            taps.append(h)
            if b < len(_VGG_BLOCKS) - 1:
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
        return taps

    def __call__(self, pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
        """LPIPS distance between [B,H,W,3] images in [0,1] (lpips:73)."""
        fp = self.features(pred)
        fg = self.features(gt)
        total = 0.0
        for b, (p, g) in enumerate(zip(fp, fg)):
            pn = p / jnp.sqrt(jnp.sum(p * p, axis=-1, keepdims=True) + 1e-10)
            gn = g / jnp.sqrt(jnp.sum(g * g, axis=-1, keepdims=True) + 1e-10)
            diff = (pn - gn) ** 2
            w = self.params[f"lin_{b}"]["w"]
            val = jax.lax.conv_general_dilated(
                diff, w, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST)
            total = total + jnp.mean(val, axis=(1, 2, 3))
        return jnp.sum(total) if total.shape == () else jnp.mean(total)


def load_lpips(path: str | Path) -> LpipsModel:
    """Load converted weights (.npz produced by convert_torch_lpips)."""
    data = np.load(path)
    params = {}
    for key in data.files:
        group, leaf = key.rsplit("/", 1)
        params.setdefault(group, {})[leaf] = jnp.asarray(data[key])
    return LpipsModel(params=params)


def convert_torch_lpips(out_path: str) -> None:
    """One-off converter from the public `lpips` PyPI package (run on a
    machine with the package + weights; mirrors crates/lpips-convert)."""
    import torch
    import lpips as lpips_pkg  # type: ignore

    net = lpips_pkg.LPIPS(net="vgg")
    out = {}
    convs = [m for m in net.net.slice1] + [m for m in net.net.slice2] + \
            [m for m in net.net.slice3] + [m for m in net.net.slice4] + \
            [m for m in net.net.slice5]
    convs = [m for m in convs if isinstance(m, torch.nn.Conv2d)]
    idx = 0
    for b, (_, n) in enumerate(_VGG_BLOCKS):
        for i in range(n):
            m = convs[idx]
            idx += 1
            out[f"conv_{b}_{i}/w"] = m.weight.detach().numpy().transpose(2, 3, 1, 0)
            out[f"conv_{b}_{i}/b"] = m.bias.detach().numpy()
    for b, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()  # [1, C, 1, 1]
        out[f"lin_{b}/w"] = w.transpose(2, 3, 1, 0)
    np.savez(out_path, **out)


def random_lpips(seed: int = 0) -> LpipsModel:
    """Random-weight model for architecture/shape tests only."""
    rng = np.random.default_rng(seed)
    params = {}
    cin = 3
    for b, (ch, n) in enumerate(_VGG_BLOCKS):
        for i in range(n):
            params[f"conv_{b}_{i}"] = {
                "w": jnp.asarray(rng.normal(0, 0.05, (3, 3, cin, ch)),
                                 jnp.float32),
                "b": jnp.zeros((ch,), jnp.float32),
            }
            cin = ch
        params[f"lin_{b}"] = {
            "w": jnp.asarray(np.abs(rng.normal(0, 0.05, (1, 1, ch, 1))),
                             jnp.float32)}
    return LpipsModel(params=params)
