"""Tuned-knob resolution: per-resolution table, PT-profile overlay, and
the sweep-log applier that rewrites both tables in place.

The reference tunes its launch geometry with compile-time macros
(IntersectorOctreeGPU.hpp:13-19, renderCommon.hpp:13-15); our equivalent
is the TUNED_BY_RES / TUNED_PT_BY_RES tables resolved into STATIC jit
args by knobs_for_res (ops/hako_kernels.py) -- the path tracer's
wavefronts get their own overlay because their optimum can differ from
coherent primary tiles."""

import os
import shutil
import sys

import pytest

from massivevoxelraytracing_tpu.ops import hako_kernels as hk

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
import pick_knobs as pk  # noqa: E402


@pytest.fixture
def knob_tables(monkeypatch):
    monkeypatch.setattr(hk, "TUNED_BY_RES", {
        256: {},
        1024: dict(UNIQ=64),
        2048: dict(CAP_DIV=64),
    })
    monkeypatch.setattr(hk, "TUNED_PT_BY_RES", {
        1024: dict(CAP_DIV=8, PACK_DIV=1, UNIQ=0, TWO_BRICK=0, MAX_PROBES=4,
                   MAX_DDA_ITERS=24, VAC_PICK=64, VAC_RUN=2),
    })


def test_profile_overlay(knob_tables):
    # primary profile reads the base table only
    assert hk.knobs_for_res(1024) == dict(uniq=64)
    # pt profile: the overlay pins EVERY knob, so the base table's UNIQ=64
    # cannot leak into a config the PT sweep never measured
    pt = hk.knobs_for_res(1024, profile="pt")
    assert pt["uniq"] == 0 and pt["vac_pick"] == 64 and pt["pack_div"] == 1
    # resolutions near a PT entry (within 2x) ride the overlay
    assert hk.knobs_for_res(512, profile="pt")["vac_pick"] == 64
    # far resolutions must NOT: the overlay's full dict would clobber the
    # base table's per-scale knobs (e.g. cap_div=8 from the 1024 PT entry
    # vs the measured cap_div=64 base optimum at 2048+)
    assert hk.knobs_for_res(4096, profile="pt") == dict(cap_div=64)
    # base entries without overlay knobs stay pure base
    assert hk.knobs_for_res(2048) == dict(cap_div=64)


def test_explicit_module_attr_beats_tables(knob_tables, monkeypatch):
    monkeypatch.setattr(hk, "UNIQ", 128)  # off-factory = explicit override
    assert hk.knobs_for_res(1024)["uniq"] == 128
    assert hk.knobs_for_res(1024, profile="pt")["uniq"] == 128


def test_apply_pt_rewrites_table(tmp_path, monkeypatch, capsys):
    target = tmp_path / "hako_kernels.py"
    shutil.copy(hk.__file__.replace(".pyc", ".py"), target)
    monkeypatch.setattr(pk, "KERNELS_PY", str(target))
    log = tmp_path / "sweep.log"
    base = ("[pt] accel=hako res=256 640x360 16spp: {dt} s/step "
            "(first 90.0s) mean=2.041399956e-01 knobs[cap_div=8 max_dda=24 "
            "max_probes=4 pack_div=2 two_brick=0 uniq={u} vac_pick=64 "
            "vac_run=2]")
    log.write_text(base.format(dt="4.560", u=64) + "\n"
                   + base.format(dt="2.980", u=0) + "\n")
    pk.apply_pt_winners(str(log))
    src = target.read_text()
    block = src[src.index(pk.PT_BEGIN):src.index(pk.PT_END)]
    assert "256: dict(" in block and "UNIQ=0" in block
    assert "2.980 s/step" in block
    # the written block must stay importable / eval-able
    table = eval(block.split("=", 1)[1], {"dict": dict})
    assert table[256]["VAC_PICK"] == 64 and table[256]["UNIQ"] == 0
    # all 8 knobs pinned (full-dict overlay contract)
    assert len(table[256]) == 8


def test_apply_pt_skips_on_mean_drift(tmp_path, monkeypatch):
    target = tmp_path / "hako_kernels.py"
    shutil.copy(hk.__file__.replace(".pyc", ".py"), target)
    monkeypatch.setattr(pk, "KERNELS_PY", str(target))
    before = target.read_text()
    log = tmp_path / "sweep.log"
    base = ("[pt] accel=hako res=256 640x360 16spp: {dt} s/step "
            "(first 90.0s) mean={m} knobs[cap_div=8 max_dda=24 max_probes=4 "
            "pack_div=2 two_brick=0 uniq={u} vac_pick=0 vac_run=2]")
    log.write_text(base.format(dt="4.560", m="2.0e-01", u=64) + "\n"
                   + base.format(dt="2.980", m="2.1e-01", u=0) + "\n")
    pk.apply_pt_winners(str(log))
    assert target.read_text() == before  # drift -> nothing written


def test_sblk_knob_resolution_and_equivalence():
    """SBLK rides the tuned table into the static knob tuple (the jitted
    driver's cache does NOT key on the S_BLK module attr, so it must
    arrive as the s_blk static arg), and the traversal result is
    bit-identical across block heights."""
    import jax.numpy as jnp
    import numpy as np

    from massivevoxelraytracing_tpu.models import scene

    # SBLK entries in the table must surface as the s_blk static arg
    # (plumbing assertion on a SYNTHETIC table -- asserting the shipped
    # winners here made every retune break this test, ADVICE r3)
    try:
        saved = hk.TUNED_BY_RES
        hk.TUNED_BY_RES = {64: dict(SBLK=8), 256: dict(SBLK=16)}
        assert hk.knobs_for_res(64)["s_blk"] == 8
        assert hk.knobs_for_res(256)["s_blk"] == 16
    finally:
        hk.TUNED_BY_RES = saved

    rng = np.random.RandomState(7)
    tri = (rng.rand(40, 3, 3) * 0.8 + 0.1).astype(np.float32)
    tree = scene.build_scene(
        tri, None, origin=np.zeros(3, np.float32), dps=1.0 / 64,
        grid_res=64, accel="hako")
    meta, (T, level_rows) = hk.hako_args(tree)
    bricks, snodes, tabs, scal_i = meta
    n = 640
    ro = np.full((n, 3), -0.2, np.float32)
    rd = rng.rand(n, 3).astype(np.float32) + 0.05
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    outs = []
    g_sblk, g_rb = hk.S_BLK, hk.RB
    for sblk in (8, 16):
        t, nm, vi = hk.intersect_rays_hako(
            bricks, snodes, tabs, scal_i, tree.lower, tree.upper,
            jnp.asarray(ro), jnp.asarray(rd), T=T, level_rows=level_rows,
            shadow=False, s_blk=sblk, uniq=8, pack_div=1)
        outs.append((np.asarray(t), np.asarray(nm), np.asarray(vi)))
        # round 5 (ADVICE r3): s_blk is threaded through as a parameter;
        # the module defaults must NOT be mutated by the call
        assert hk.S_BLK == g_sblk and hk.RB == g_rb
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_array_equal(a, b)
