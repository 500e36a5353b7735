"""PLY import/export roundtrip and format compatibility."""

import io

import numpy as np

from brush_tpu.io.ply import SplatData, load_splat_ply, save_splat_ply
from brush_tpu.ops.sh import num_sh_coeffs


def make_params(n=17, k=num_sh_coeffs(3), seed=3):
    rng = np.random.default_rng(seed)
    return dict(
        means=rng.normal(0, 2, (n, 3)).astype(np.float32),
        log_scales=rng.normal(-2, 0.5, (n, 3)).astype(np.float32),
        quats=rng.normal(0, 1, (n, 4)).astype(np.float32),
        sh_coeffs=rng.normal(0, 0.3, (n, k, 3)).astype(np.float32),
        raw_opacities=rng.normal(0, 1, n).astype(np.float32),
    )


def test_roundtrip_binary():
    p = make_params()
    buf = io.BytesIO()
    save_splat_ply(buf, **p, up_axis="z")
    buf.seek(0)
    d = load_splat_ply(buf)
    assert d.num_splats == 17
    assert d.up_axis == "z"
    np.testing.assert_allclose(d.means, p["means"], rtol=1e-6)
    np.testing.assert_allclose(d.log_scales, p["log_scales"], rtol=1e-6)
    np.testing.assert_allclose(d.rotations, p["quats"], rtol=1e-6)
    np.testing.assert_allclose(d.sh_coeffs, p["sh_coeffs"], rtol=1e-6)
    np.testing.assert_allclose(d.raw_opacities, p["raw_opacities"], rtol=1e-6)


def test_roundtrip_dc_only():
    p = make_params(k=1)
    buf = io.BytesIO()
    save_splat_ply(buf, **p)
    buf.seek(0)
    d = load_splat_ply(buf)
    assert d.sh_coeffs.shape == (17, 1, 3)
    np.testing.assert_allclose(d.sh_coeffs, p["sh_coeffs"], rtol=1e-6)


def test_plain_point_cloud_rgb():
    """Plain xyz+rgb ply (e.g., COLMAP export) -> DC-only splat data."""
    n = 5
    header = (b"ply\nformat binary_little_endian 1.0\n"
              b"element vertex 5\n"
              b"property float x\nproperty float y\nproperty float z\n"
              b"property uchar red\nproperty uchar green\nproperty uchar blue\n"
              b"end_header\n")
    xyz = np.arange(15, dtype="<f4").reshape(5, 3)
    rgb = np.arange(15, dtype=np.uint8).reshape(5, 3)
    body = b"".join(xyz[i].tobytes() + rgb[i].tobytes() for i in range(n))
    d = load_splat_ply(io.BytesIO(header + body))
    assert d.num_splats == 5
    np.testing.assert_allclose(d.means, xyz)
    assert d.sh_coeffs is not None and d.sh_coeffs.shape == (5, 1, 3)
    assert d.log_scales is None and d.rotations is None


def test_ascii_ply():
    header = (b"ply\nformat ascii 1.0\nelement vertex 2\n"
              b"property float x\nproperty float y\nproperty float z\n"
              b"end_header\n"
              b"1.0 2.0 3.0\n4.0 5.0 6.0\n")
    d = load_splat_ply(io.BytesIO(header))
    np.testing.assert_allclose(d.means, [[1, 2, 3], [4, 5, 6]])


def test_compressed_roundtrip():
    from brush_tpu.io.ply import save_compressed_ply
    p = make_params(n=300, k=4)  # spans two chunks
    # normalize quats so the smallest-three packing is comparable
    q = p["quats"]
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    buf = io.BytesIO()
    save_compressed_ply(buf, **p)
    buf.seek(0)
    d = load_splat_ply(buf)
    assert d.num_splats == 512  # padded to chunk multiple
    m = 300
    np.testing.assert_allclose(d.means[:m], p["means"][:m], atol=1e-2)  # 11-bit over ~12-unit chunks
    np.testing.assert_allclose(d.log_scales[:m], p["log_scales"][:m], atol=5e-3)
    # quats equal up to sign
    qa = d.rotations[:m] / np.linalg.norm(d.rotations[:m], axis=1, keepdims=True)
    dot = np.abs(np.sum(qa * q[:m], axis=1))
    assert dot.min() > 0.999
    # DC color from packed 8-bit rgb
    from brush_tpu.constants import SH_C0
    rgb_in = np.clip(p["sh_coeffs"][:m, 0] * SH_C0 + 0.5, 0, 1)
    rgb_out = np.clip(d.sh_coeffs[:m, 0] * SH_C0 + 0.5, 0, 1)
    np.testing.assert_allclose(rgb_out, rgb_in, atol=1 / 255 + 1e-3)
    # opacity roundtrip through 8-bit sigmoid space
    a_in = 1 / (1 + np.exp(-p["raw_opacities"][:m]))
    a_out = 1 / (1 + np.exp(-d.raw_opacities[:m]))
    np.testing.assert_allclose(a_out, a_in, atol=1 / 255 + 2e-3)
    # higher SH bands quantized to [-4,4]/256 steps
    np.testing.assert_allclose(d.sh_coeffs[:m, 1:], p["sh_coeffs"][:m, 1:],
                               atol=8 / 255 + 1e-3)


def test_stream_splat_ply_progressive(tmp_path):
    """Streaming import yields growing prefixes whose final state equals
    the one-shot load (import.rs stream_splat_from_ply)."""
    from brush_tpu.io.ply import load_splat_ply, save_splat_ply, stream_splat_ply

    rng = np.random.default_rng(5)
    n = 1000
    save_splat_ply(
        str(tmp_path / "s.ply"),
        means=rng.normal(0, 1, (n, 3)),
        log_scales=np.full((n, 3), -2.0),
        quats=np.tile([1.0, 0, 0, 0], (n, 1)),
        sh_coeffs=rng.normal(0, 0.2, (n, 1, 3)),
        raw_opacities=np.zeros(n),
    )
    chunks = list(stream_splat_ply(str(tmp_path / "s.ply"), chunk_rows=300))
    assert [c.num_splats for c in chunks] == [300, 600, 900, 1000]
    ref = load_splat_ply(str(tmp_path / "s.ply"))
    np.testing.assert_array_equal(chunks[-1].means, ref.means)
    np.testing.assert_array_equal(chunks[-1].sh_coeffs, ref.sh_coeffs)
    # Prefix property: chunk k is a prefix of the full data.
    np.testing.assert_array_equal(chunks[0].means, ref.means[:300])


def test_export_zero_splats_roundtrip(tmp_path):
    """A fully-pruned (empty) splat set exports a valid ply and reloads
    (regression: reshape(0, -1) can't infer width)."""
    import io as _io

    from brush_tpu.io.ply import load_splat_ply, save_splat_ply

    buf = _io.BytesIO()
    save_splat_ply(buf,
                   np.zeros((0, 3), np.float32),
                   np.zeros((0, 3), np.float32),
                   np.zeros((0, 4), np.float32),
                   np.zeros((0, 16, 3), np.float32),
                   np.zeros((0,), np.float32))
    buf.seek(0)
    tmp = tmp_path / "empty.ply"
    tmp.write_bytes(buf.read())
    data = load_splat_ply(str(tmp))
    assert data.num_splats == 0
