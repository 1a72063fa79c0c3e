"""Sampling + HDRI fidelity: pmj02 stratification, Owen chains, Lambertian
cosine distribution, importance-sampling unbiasedness (MC estimate of the
environment integral against the direct texel sum)."""

import numpy as np
import jax.numpy as jnp
import pytest

from massivevoxelraytracing_tpu.ops import bits, camera as camera_ops, hdri, sampling
from massivevoxelraytracing_tpu.utils import hdr, png


def test_pmj02_progressive_stratification():
    seq = sampling.np_pmj02_samples(4096, np.random.default_rng(5).random)
    assert seq.shape == (4096, 2)
    assert np.all(seq >= 0) and np.all(seq < 1)
    # (0,2)-sequence property samples: first 4^k points hit every cell of a
    # 2^k x 2^k grid exactly once
    for k in (2, 4, 5):
        n = 4 ** (k // 2) if k % 2 == 0 else None
    for g in (4, 8, 16, 64):
        n = g * g
        cells = (seq[:n, 0] * g).astype(int) * g + (seq[:n, 1] * g).astype(int)
        assert len(np.unique(cells)) == n, f"grid {g}: not stratified"
    # 1-D stratification of the full sequence (float32 rounding at stratum
    # boundaries can merge a cell or two)
    for d in range(2):
        s = (seq[:, d] * 4096).astype(int)
        assert len(np.unique(s)) >= 4094


def test_pmj_sample2d_device():
    table = jnp.asarray(sampling.make_pmj_table(8, 256))
    # patch module constants for the small test table
    idx = jnp.arange(512, dtype=jnp.uint32) % 256
    dim = jnp.zeros(512, jnp.uint32)
    stream = jnp.arange(512, dtype=jnp.uint32)
    x, y = sampling.pmj_sample2d(table, idx, dim, stream)
    x = np.asarray(x)
    y = np.asarray(y)
    assert np.all((x >= 0) & (x < 1)) and np.all((y >= 0) & (y < 1))
    # different streams decorrelate
    assert np.std(x) > 0.2


def test_orthonormal_basis():
    rng = np.random.default_rng(0)
    z = rng.normal(size=(1000, 3)).astype(np.float32)
    z /= np.linalg.norm(z, axis=1, keepdims=True)
    x, y = sampling.orthonormal_basis(jnp.asarray(z))
    x = np.asarray(x)
    y = np.asarray(y)
    for a, b in [(x, y), (x, z), (y, z)]:
        dots = (a * b).sum(1)
        np.testing.assert_allclose(dots, 0, atol=1e-5)
    np.testing.assert_allclose((x * x).sum(1), 1, atol=1e-5)
    np.testing.assert_allclose(np.cross(x, y), z, atol=1e-5)


def test_lambertian_cosine_distribution():
    rng = np.random.default_rng(1)
    n = 200_000
    a = rng.random(n, dtype=np.float32)
    b = rng.random(n, dtype=np.float32)
    ng = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    d = np.asarray(sampling.sample_lambertian(jnp.asarray(a), jnp.asarray(b), jnp.asarray(ng)))
    assert np.all(d[:, 2] > -1e-6)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1, atol=1e-4)
    # E[cos theta] = 2/3 for pdf = cos/pi
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 3e-3


@pytest.mark.parametrize("use_alias", [True, False])
def test_hdri_importance_sampling_unbiased(use_alias):
    # both sampling backends (Walker alias and the reference's SAT binary
    # search) must estimate the env integral without bias
    img = hdr.procedural_sky(128, 64, sun_intensity=150.0)
    env = hdri.load(img, scale=1.0, use_alias=use_alias)
    # direct integral: sum(L * sr) per texel
    sr = hdri._solid_angle_weights(128, 64)
    direct = (img.astype(np.float64) * sr[..., None]).sum((0, 1))

    rng = np.random.default_rng(3)
    n = 100_000
    u = [jnp.asarray(rng.random(n, dtype=np.float32)) for _ in range(4)]
    nrm = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
    d, L, pdf = hdri.importance_sample(env, nrm, *u, axis_aligned=False)
    L = np.asarray(L, np.float64)
    pdf = np.asarray(pdf, np.float64)
    est = (L / pdf[:, None]).mean(0)
    np.testing.assert_allclose(est, direct, rtol=0.05)
    # directions are unit
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(d), axis=1), 1, atol=1e-4
    )


def test_alias_tables_match_distribution():
    rng = np.random.default_rng(9)
    w = rng.random(1000) ** 4  # peaky
    prob, alias, pdf = hdri._build_alias(w)
    np.testing.assert_allclose(pdf, w / w.sum(), rtol=1e-6)
    # exact expected mass per bin from the alias construction
    mass = prob.astype(np.float64).copy()
    np.add.at(mass, alias, 1.0 - prob.astype(np.float64))
    np.testing.assert_allclose(mass / len(w), w / w.sum(), atol=1e-6)


def test_hdri_axis_weighted_tables_prefer_hemisphere():
    img = hdr.procedural_sky(64, 32, sun_intensity=0.0)  # smooth sky
    env = hdri.load(img, scale=1.0)
    rng = np.random.default_rng(4)
    n = 20_000
    u = [jnp.asarray(rng.random(n, dtype=np.float32)) for _ in range(4)]
    up = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
    d_up, _, _ = hdri.importance_sample(env, up, *u, axis_aligned=True)
    frac_up = float((np.asarray(d_up)[:, 1] > 0).mean())
    dn = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32), (n, 1))
    d_dn, _, _ = hdri.importance_sample(env, dn, *u, axis_aligned=True)
    frac_dn = float((np.asarray(d_dn)[:, 1] < 0).mean())
    assert frac_up > 0.9
    assert frac_dn > 0.9


def test_sample_nearest_matches_texel():
    img = hdr.procedural_sky(64, 32)
    env = hdri.load(img, scale=1.0)
    # +x direction -> phi = pi -> u = 0.5, theta = pi/2 -> v = 0.5
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    c = np.asarray(hdri.sample_nearest(env, d, primary=False))[0]
    np.testing.assert_allclose(c, img[16, 32], rtol=1e-6)


def test_hdr_roundtrip(tmp_path):
    img = hdr.procedural_sky(32, 16, sun_intensity=40.0)
    p = str(tmp_path / "t.hdr")
    hdr.write_hdr(p, img)
    back = hdr.read_hdr(p)
    assert back.shape == img.shape
    np.testing.assert_allclose(back, img, rtol=0.02, atol=1e-3)


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    p = str(tmp_path / "t.png")
    png.write(p, img)
    back = png.read(p)
    np.testing.assert_array_equal(img, back)


def test_camera_rays():
    cam = camera_ops.Camera.look_at(
        eye=(0, 0, 5), target=(0, 0, 0), fovy_deg=60.0
    )
    ro, rd = camera_ops.np_frame_rays(cam, 64, 64)
    # center pixels look along -z
    c = rd.reshape(64, 64, 3)
    mid = 0.5 * (c[31, 31] + c[32, 32])
    np.testing.assert_allclose(mid[:2], 0, atol=0.05)
    assert mid[2] < -0.9
    # corner ray angle = fov/2 vertically at the pixel center row
    top = c[0, 32]
    ang = np.degrees(np.arctan2(abs(top[1]), abs(top[2])))
    assert 28 < ang < 30.1
