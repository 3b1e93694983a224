"""Native npz reader (native/sceneio.cpp) vs numpy; skipped when unbuilt."""

import numpy as np
import pytest

from solver_in_the_loop_tpu.io import native_npz
from solver_in_the_loop_tpu.io.scene import Scene

pytestmark = pytest.mark.skipif(
    not native_npz.available(), reason="native/libsceneio.so not built"
)


def test_native_matches_numpy_compressed(tmp_path):
    rng = np.random.RandomState(0)
    arr = rng.randn(1, 65, 33, 2).astype(np.float32)
    p = str(tmp_path / "a.npz")
    np.savez_compressed(p, arr)
    out = native_npz.read_npz(p)
    assert out.shape == arr.shape
    np.testing.assert_allclose(out, arr)


def test_native_batch(tmp_path):
    rng = np.random.RandomState(1)
    arr = rng.randn(1, 9, 8, 2).astype(np.float32)
    paths = []
    for i in range(7):
        p = str(tmp_path / f"f{i}.npz")
        np.savez_compressed(p, arr * (i + 1))
        paths.append(p)
    batch = native_npz.read_npz_batch(paths, arr.shape)
    ref = np.stack([np.load(p)["arr_0"] for p in paths])
    np.testing.assert_allclose(batch, ref)


def test_scene_read_uses_native_path(tmp_path):
    sc = Scene(str(tmp_path / "sim_000000"))
    rng = np.random.RandomState(2)
    u = rng.randn(1, 8, 9).astype(np.float32)
    v = rng.randn(1, 9, 8).astype(np.float32)
    sc.write_staggered("velo", 0, u, v)
    u2, v2 = sc.read_staggered("velo", 0)
    np.testing.assert_allclose(u2, u, rtol=1e-6)
    np.testing.assert_allclose(v2, v, rtol=1e-6)


def test_native_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.npz")
    with open(p, "wb") as f:
        f.write(b"not a zip at all")
    assert native_npz.read_npz(p) is None
