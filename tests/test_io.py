import numpy as np

from solver_in_the_loop_tpu.io.scene import (
    Scene,
    legacy_to_staggered,
    staggered_to_legacy,
)


def test_staggered_legacy_roundtrip():
    rng = np.random.RandomState(0)
    u = rng.randn(1, 8, 9).astype(np.float32)
    v = rng.randn(1, 9, 8).astype(np.float32)
    leg = staggered_to_legacy(u, v)
    assert leg.shape == (1, 9, 9, 2)
    # on-disk channel order [u, v]; padded far edges zero
    np.testing.assert_allclose(leg[:, -1, :, 0], 0.0)
    np.testing.assert_allclose(leg[:, :, -1, 1], 0.0)
    u2, v2 = legacy_to_staggered(leg)
    np.testing.assert_allclose(u2, u)
    np.testing.assert_allclose(v2, v)


def test_scene_create_and_frames(tmp_path):
    parent = str(tmp_path / "out")
    s0 = Scene.create(parent)
    s1 = Scene.create(parent)
    assert s0.path.endswith("sim_000000")
    assert s1.path.endswith("sim_000001")

    s0.write_params({"re": 160000.0, "seed": 0})
    assert Scene.list(parent)[0].read_params()["re"] == 160000.0

    rng = np.random.RandomState(1)
    dens = rng.randn(1, 8, 4).astype(np.float32)
    u = rng.randn(1, 8, 5).astype(np.float32)
    v = rng.randn(1, 9, 4).astype(np.float32)
    s0.write_centered("dens", 3, dens)
    s0.write_staggered("velo", 3, u, v)
    np.testing.assert_allclose(s0.read_centered("dens", 3), dens, rtol=1e-6)
    u2, v2 = s0.read_staggered("velo", 3)
    np.testing.assert_allclose(u2, u, rtol=1e-6)
    np.testing.assert_allclose(v2, v, rtol=1e-6)
    assert s0.frames("dens") == [3]
    assert s0.frames("velo") == [3]


def test_scene_npz_layout_matches_reference(tmp_path):
    """npz files hold a (1, Y(+1), X(+1), C) array under the default key —
    the layout the reference's readers expect (karman.py:104)."""
    s = Scene(str(tmp_path / "sim_000000"))
    dens = np.ones((1, 4, 4), np.float32)
    s.write_centered("dens", 0, dens)
    with np.load(s.frame_path("dens", 0)) as f:
        arr = f[f.files[-1]]
    assert arr.shape == (1, 4, 4, 1)


def test_batch_writers_roundtrip(tmp_path):
    """write_*_batch (native thread-pool, io/native_npz.py) frames read back
    identically through the single-frame readers."""
    from solver_in_the_loop_tpu.io.scene import Scene

    sc = Scene(str(tmp_path / "sim_000000"))
    rng = np.random.RandomState(3)
    dens = rng.randn(5, 4, 6).astype(np.float32)
    u = rng.randn(5, 4, 7).astype(np.float32)
    v = rng.randn(5, 5, 6).astype(np.float32)
    ids = [10, 11, 12, 13, 14]
    sc.write_centered_batch("dens", ids, dens)
    sc.write_staggered_batch("velo", ids, u, v)
    for k, f in enumerate(ids):
        np.testing.assert_array_equal(sc.read_centered("dens", f)[0], dens[k])
        ur, vr = sc.read_staggered("velo", f)
        np.testing.assert_array_equal(ur[0], u[k])
        np.testing.assert_array_equal(vr[0], v[k])
