"""Alembic-Ogawa subset: container round-trip, archive round-trip, and the
rtcamp-style per-frame read path (reference: voxUtil.hpp:8-66 reads
rtcamp9.abc per frame via prlib/Alembic)."""

import numpy as np
import pytest

from massivevoxelraytracing_tpu.utils import abcio, meshgen
from massivevoxelraytracing_tpu.utils.ogawa import OgawaReader, OgawaWriter


def test_ogawa_container_roundtrip(tmp_path):
    path = str(tmp_path / "t.ogawa")
    root = [
        b"hello",
        [b"a", [], b"", [b"deep"]],
        b"",
    ]
    OgawaWriter().write(path, root)
    with OgawaReader(path) as r:
        assert r.version == 1
        w = r.group(r.root)
        assert len(w) == 3
        assert r.is_data(w[0]) and bytes(r.data(w[0])) == b"hello"
        sub = r.group(w[1])
        assert bytes(r.data(sub[0])) == b"a"
        assert r.group(sub[1]) == []
        assert bytes(r.data(sub[2])) == b""
        assert bytes(r.data(r.group(sub[3])[0])) == b"deep"
        assert r.is_data(w[2]) and bytes(r.data(w[2])) == b""


def test_abc_archive_roundtrip(tmp_path):
    path = str(tmp_path / "anim.abc")
    rng = np.random.default_rng(5)
    frames = []
    cols = []
    emis = []
    for f in range(3):
        tri = meshgen.icosphere(1, radius=0.5 + 0.1 * f)
        frames.append(tri)
        cols.append(rng.uniform(0, 1, (tri.size // 3, 3)).astype(np.float32))
        emis.append(rng.uniform(0, 1, (tri.size // 3, 3)).astype(np.float32))
    abcio.write_fixture_abc(path, frames, cols, emis, fps=24.0)

    ar = abcio.AbcArchive(path)
    assert ar.n_frames == 3
    assert abs(ar.time_per_cycle - 1.0 / 24.0) < 1e-12
    for f in range(3):
        v, c, e = ar.read_flat(f)
        np.testing.assert_array_equal(v, frames[f].astype(np.float32))
        np.testing.assert_array_equal(
            c.reshape(-1, 3), cols[f]
        )
        np.testing.assert_array_equal(
            e.reshape(-1, 3), emis[f]
        )
    # reading past the end holds the last sample (Alembic clamp semantics)
    v, _, _ = ar.read_flat(7)
    np.testing.assert_array_equal(v, frames[-1].astype(np.float32))
    ar.close()


def test_abc_no_attribs_defaults(tmp_path):
    path = str(tmp_path / "plain.abc")
    tri = meshgen.icosphere(1, radius=0.7)
    abcio.write_fixture_abc(path, [tri])
    ar = abcio.AbcArchive(path)
    v, c, e = ar.read_flat(0)
    assert v.shape == (len(tri), 3, 3)
    # reference defaults: Cd=1, Emission=0 (voxUtil.hpp:50-63)
    assert (c == 1.0).all() and (e == 0.0).all()
    ar.close()


def test_abc_animated_scene_path(tmp_path):
    """The rtcamp per-frame read path accepts .abc directly."""
    from massivevoxelraytracing_tpu.apps.scenes import animated_scene

    path = str(tmp_path / "shot.abc")
    frames = [meshgen.icosphere(1, radius=0.4 + 0.2 * f) for f in range(2)]
    abcio.write_fixture_abc(path, frames)
    for f in range(2):
        v, c, e = animated_scene(path, f, 2)
        np.testing.assert_array_equal(v, frames[f].astype(np.float32))
        assert c.shape == v.shape and e.shape == v.shape


def test_abc_rejects_non_alembic(tmp_path):
    path = str(tmp_path / "bad.abc")
    OgawaWriter().write(path, [b"x"])
    with pytest.raises(ValueError):
        abcio.AbcArchive(path)
