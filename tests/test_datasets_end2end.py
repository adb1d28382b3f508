"""Dataset-format tests on procedurally generated scenes (both formats) and
loader/iterator behavior."""

import numpy as np
import pytest

from papr_tpu.config import Config
from papr_tpu.dataset import Loader, get_dataset
from papr_tpu.dataset.synth import make_demo_scene, make_demo_scene_t2


def _ds_args(path, type_="synthetic", **over):
    base = {
        "mode": "train", "coord_scale": 2.0, "type": type_, "white_bg": True,
        "path": path, "factor": 1, "batch_size": 2, "shuffle": True,
        "extract_patch": True, "extract_online": True, "read_offline": True,
        "patches": {"height": 16, "width": 16, "max_patches": 2},
    }
    base.update(over)
    return Config(base)


@pytest.fixture(scope="module")
def blender_scene(tmp_path_factory):
    return make_demo_scene(str(tmp_path_factory.mktemp("bl") / "scene"),
                           n_train=4, n_test=2, H=32, W=32)


@pytest.fixture(scope="module")
def t2_scene(tmp_path_factory):
    return make_demo_scene_t2(str(tmp_path_factory.mktemp("t2") / "scene"),
                              n_train=4, n_test=2, H=32, W=32)


def test_blender_dataset(blender_scene):
    ds = get_dataset(_ds_args(blender_scene), mode="train")
    assert len(ds) == 4 and ds.H == ds.W == 32
    idx, pidx, img, rayd, rayo = ds[1]
    assert img.shape == (16, 16, 3) and rayd.shape == (16, 16, 3)
    assert np.allclose(np.linalg.norm(rayd, axis=-1), 1.0, atol=1e-4)
    # coord_scale multiplies the camera origin
    assert np.linalg.norm(rayo) == pytest.approx(
        2.0 * np.linalg.norm(ds.c2w[1][:3, 3] / 2.0), rel=1e-5)
    full_img, full_rayd, full_rayo = ds.get_full_img(0)
    assert full_img.shape == (1, 32, 32, 3)


def test_blender_lazy_read(blender_scene):
    ds = get_dataset(_ds_args(blender_scene, read_offline=False), mode="train")
    idx, _, img, rayd, rayo = ds[2]
    assert img.shape == (16, 16, 3)
    ds_off = get_dataset(_ds_args(blender_scene), mode="train")
    # lazy and offline paths agree on the full image
    a = ds.get_full_img(2)[0]
    b = ds_off.get_full_img(2)[0]
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_t2_dataset(t2_scene):
    ds = get_dataset(_ds_args(t2_scene, type_="t2"), mode="train")
    assert len(ds) == 4
    ds_test = get_dataset(_ds_args(t2_scene, type_="t2", extract_patch=False),
                          mode="test")
    assert len(ds_test) == 2
    _, _, img, rayd, rayo = ds_test[0]
    assert img.shape == (32, 32, 3)
    # rays point roughly at the scene origin (sphere visible)
    center_ray = rayd[16, 16]
    to_origin = -rayo / np.linalg.norm(rayo)
    assert center_ray @ to_origin > 0.95


def test_t2_rays_see_sphere(t2_scene):
    """Geometric sanity: central rays pass near the unit-ish sphere."""
    ds = get_dataset(_ds_args(t2_scene, type_="t2", extract_patch=False,
                              coord_scale=1.0), mode="test")
    _, _, img, rayd, rayo = ds[0]
    v = -rayo
    d = rayd[16, 16]
    perp = v - d * (v @ d)
    assert np.linalg.norm(perp) < 0.6  # hits within sphere radius ~0.5


def test_loader_batching_and_epoch(blender_scene):
    ds = get_dataset(_ds_args(blender_scene), mode="train")
    loader = Loader(ds, batch_size=2, shuffle=True, seed=0, prefetch=2)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b.image.shape == (2, 16, 16, 3)
    assert b.rayo.shape == (2, 3) and b.c2w.shape == (2, 4, 4)
    # two epochs shuffle differently
    order1 = [tuple(b.img_idx) for b in loader]
    order2 = [tuple(b.img_idx) for b in loader]
    assert sorted(np.concatenate(order1).tolist()) == [0, 1, 2, 3]


def test_offline_patch_mode(blender_scene):
    ds = get_dataset(_ds_args(blender_scene, extract_online=False), mode="train")
    assert len(ds) == 4 * 2  # num_imgs * max_patches
    idx, pidx, img, rayd, rayo = ds[5]
    assert (idx, pidx) == (2, 1)
    assert img.shape == (16, 16, 3)


def test_synth_exposure_jitter(tmp_path):
    """exposure_jitter scales TRAIN images by per-image gains (the cIMLE
    exposure stage's target inconsistency); test/val stay neutral."""
    import numpy as np
    from PIL import Image

    from papr_tpu.dataset.synth import make_demo_scene

    neutral = make_demo_scene(str(tmp_path / "a"), n_train=4, n_test=2,
                              H=32, W=32, seed=7)
    jittered = make_demo_scene(str(tmp_path / "b"), n_train=4, n_test=2,
                               H=32, W=32, seed=7, exposure_jitter=0.5)

    def rgb(root, split, k):
        return np.asarray(Image.open(f"{root}/{split}/r_{k}.png"),
                          np.float32)[..., :3]

    gains = []
    for k in range(4):
        a, b = rgb(neutral, "train", k), rgb(jittered, "train", k)
        m = a > 8  # foreground, away from the clip floor
        gains.append(np.median(b[m] / np.maximum(a[m], 1.0)))
    assert max(gains) > 1.05 or min(gains) < 0.95   # real variation
    assert np.std(gains) > 0.02                     # per-image, not global
    for split, n in (("test", 2), ("val", 1)):
        for k in range(n):
            np.testing.assert_array_equal(rgb(neutral, split, k),
                                          rgb(jittered, split, k))
