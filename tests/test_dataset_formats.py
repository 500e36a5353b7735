"""Dataset loaders against synthetic fixtures (colmap bin, nerfstudio json,
realitycapture csv), mask discovery, and the threaded loader."""

import json
import struct
import zipfile
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from brush_tpu.data.dataloader import SceneLoader
from brush_tpu.data.formats import LoadConfig, find_mask_path, load_dataset
from brush_tpu.data.vfs import Vfs
from brush_tpu.camera import Pinhole, RadialTangential8


def write_colmap_bin(root: Path, n_views=4, w=64, h=48):
    sparse = root / "sparse" / "0"
    sparse.mkdir(parents=True)
    img_dir = root / "images"
    img_dir.mkdir()

    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, w, h))       # PINHOLE
        f.write(struct.pack("<4d", 50.0, 50.0, w / 2, h / 2))

    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", n_views))
        for i in range(n_views):
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", 1.0, 0.0, 0.0, 0.0))
            f.write(struct.pack("<3d", 0.1 * i, 0.0, -4.0))
            f.write(struct.pack("<i", 1))
            name = f"img_{i}.png".encode() + b"\x00"
            f.write(name)
            f.write(struct.pack("<Q", 0))

    with open(sparse / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", 10))
        for i in range(10):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<3d", i * 0.1, 0.0, 1.0))
            f.write(struct.pack("<3B", 255, 128, 0))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 0))

    rng = np.random.default_rng(0)
    for i in range(n_views):
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"img_{i}.png")


def test_colmap_bin_dir(tmp_path):
    write_colmap_bin(tmp_path)
    ds = load_dataset(str(tmp_path), LoadConfig(eval_split_every=4))
    assert len(ds.train.views) == 3
    assert len(ds.eval.views) == 1
    assert isinstance(ds.train.views[0].camera.model, Pinhole)
    assert ds.init_points.shape == (10, 3)
    np.testing.assert_allclose(ds.init_colors[0], [1.0, 128 / 255, 0.0])
    # Pose: identity rotation, position = -t. (Eval took view 0; train
    # starts at img_1 with tvec (0.1, 0, -4).)
    cam = ds.eval.views[0].camera
    np.testing.assert_allclose(cam.position, [0.0, 0.0, 4.0], atol=1e-9)
    np.testing.assert_allclose(ds.train.views[0].camera.position,
                               [-0.1, 0.0, 4.0], atol=1e-9)


def test_colmap_zip(tmp_path):
    write_colmap_bin(tmp_path / "scene")
    zp = tmp_path / "scene.zip"
    with zipfile.ZipFile(zp, "w") as z:
        for p in (tmp_path / "scene").rglob("*"):
            if p.is_file():
                z.write(p, p.relative_to(tmp_path / "scene"))
    ds = load_dataset(str(zp))
    assert len(ds.train.views) == 4


def test_nerfstudio(tmp_path):
    (tmp_path / "images").mkdir(parents=True)
    rng = np.random.default_rng(1)
    frames = []
    for i in range(3):
        name = f"images/frame_{i}.png"
        Image.fromarray(rng.integers(0, 255, (40, 60, 4), dtype=np.uint8)
                        ).save(tmp_path / name)
        m = np.eye(4).tolist()
        frames.append({"file_path": name, "transform_matrix": m})
    meta = {
        "camera_model": "OPENCV",
        "fl_x": 50.0, "fl_y": 50.0, "cx": 30.0, "cy": 20.0,
        "w": 60, "h": 40, "k1": 0.01, "k2": -0.002, "p1": 0.0, "p2": 0.0,
        "frames": frames,
    }
    (tmp_path / "transforms.json").write_text(json.dumps(meta))
    ds = load_dataset(str(tmp_path))
    assert len(ds.train.views) == 3
    model = ds.train.views[0].camera.model
    assert isinstance(model, RadialTangential8)
    assert model.k1 == pytest.approx(0.01)


def test_realitycapture_csv(tmp_path):
    rng = np.random.default_rng(2)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (30, 40, 3), dtype=np.uint8)
                        ).save(tmp_path / f"shot{i}.jpg")
    csv = "#name,x,y,alt,heading,pitch,roll,f,px,py,k1,k2,k3,k4,t1,t2\n"
    for i in range(2):
        csv += f"shot{i}.jpg,{i},0,5,0,0,0,30,0,0,0,0,0,0,0,0\n"
    (tmp_path / "cams.csv").write_text(csv)
    ds = load_dataset(str(tmp_path))
    assert len(ds.train.views) == 2
    np.testing.assert_allclose(ds.train.views[1].camera.position, [1, 0, 5])


def test_mask_discovery(tmp_path):
    (tmp_path / "images" / "sub").mkdir(parents=True)
    (tmp_path / "masks" / "sub").mkdir(parents=True)
    img = Image.fromarray(np.zeros((8, 8, 3), np.uint8))
    img.save(tmp_path / "images" / "sub" / "a.jpg")
    img.convert("L").save(tmp_path / "masks" / "sub" / "a.png")
    vfs = Vfs(tmp_path)
    found = find_mask_path(vfs, "images/sub/a.jpg")
    assert found == "masks/sub/a.png"
    assert find_mask_path(vfs, "images/sub/b.jpg") is None


def test_scene_loader_stream(tmp_path):
    write_colmap_bin(tmp_path)
    ds = load_dataset(str(tmp_path))
    loader = SceneLoader(ds.train, n_threads=1, prefetch=2)
    seen = set()
    for _ in range(8):
        v = next(loader)
        assert v.gt_packed.dtype == np.uint32
        assert v.img_size == (64, 48)
        seen.add(v.view_index)
    loader.stop()
    assert len(seen) >= 2


def test_colmap_multi_reconstruction_selection(tmp_path):
    """With sparse/0 and sparse/1 present, the reconstruction registering
    more images wins (colmap.rs:34-88)."""
    import shutil

    from brush_tpu.data.formats import load_dataset

    write_colmap_bin(tmp_path / "scene", n_views=2, w=32, h=32)
    src = tmp_path / "scene" / "sparse" / "0"
    # sparse/1 = a bigger reconstruction (4 views).
    big = tmp_path / "big"
    write_colmap_bin(big, n_views=4, w=32, h=32)
    dst = tmp_path / "scene" / "sparse" / "1"
    shutil.copytree(big / "sparse" / "0", dst)
    for f in (big / "images").iterdir():
        shutil.copy(f, tmp_path / "scene" / "images" / f.name)

    ds = load_dataset(str(tmp_path / "scene"))
    assert len(ds.train.views) == 4
