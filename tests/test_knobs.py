"""Tuned-knob resolution semantics (ops/hako_kernels.knobs_for_res) and
the sweep's self-apply rewrite (scripts/pick_knobs.apply_winners).

These paths run unattended (the sweep rewrites TUNED_BY_RES mid-run and
every later stage + the round-end bench resolve through it), so their
semantics are pinned here:
  * nearest-in-log-space resolution lookup,
  * explicit module-attr overrides beat the table,
  * factory defaults resolve to {} (kernel defaults),
  * --apply merges winners without clobbering other resolutions.
"""

import importlib.util
import os
import sys

import pytest

from massivevoxelraytracing_tpu.ops import hako_kernels as hk


@pytest.fixture
def knob_state():
    saved = {k: getattr(hk, k) for k in hk._FACTORY}
    saved_table = hk.TUNED_BY_RES
    yield
    for k, v in saved.items():
        setattr(hk, k, v)
    hk.TUNED_BY_RES = saved_table


def test_knobs_factory_default_is_empty(knob_state):
    hk.TUNED_BY_RES = {}
    for k, v in hk._FACTORY.items():
        setattr(hk, k, v)
    assert hk.knobs_for_res(1024) == {}


def test_knobs_nearest_log_lookup(knob_state):
    for k, v in hk._FACTORY.items():
        setattr(hk, k, v)
    hk.TUNED_BY_RES = {256: dict(CAP_DIV=16), 2048: dict(CAP_DIV=64)}
    assert hk.knobs_for_res(256) == dict(cap_div=16)
    assert hk.knobs_for_res(300) == dict(cap_div=16)    # log-nearest 256
    assert hk.knobs_for_res(1500) == dict(cap_div=64)   # log-nearest 2048
    assert hk.knobs_for_res(16384) == dict(cap_div=64)  # clamps to largest


def test_knobs_explicit_override_beats_table(knob_state):
    for k, v in hk._FACTORY.items():
        setattr(hk, k, v)
    hk.TUNED_BY_RES = {256: dict(CAP_DIV=16, UNIQ=64)}
    hk.CAP_DIV = 32  # e.g. an env patch in a sweep process
    out = hk.knobs_for_res(256)
    assert out["cap_div"] == 32        # module attr wins
    assert out["uniq"] == 64           # untouched knob still tuned


def _load_pick_knobs():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "pick_knobs.py",
    )
    spec = importlib.util.spec_from_file_location("pick_knobs", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["pick_knobs"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_pick_knobs_apply_merges(tmp_path, monkeypatch):
    pk = _load_pick_knobs()
    target = tmp_path / "kernels_stub.py"
    target.write_text(
        "# TUNED_BY_RES_BEGIN (rewritten)\n"
        "TUNED_BY_RES = {\n"
        "    256: {},  # comment survives eval\n"
        "    2048: dict(CAP_DIV=64),\n"
        "}\n"
        "# TUNED_BY_RES_END\n"
    )
    monkeypatch.setattr(pk, "KERNELS_PY", str(target))
    best = dict(capd=8, packd=1, uniq=64, twob=1, p=4, d=24)
    pk.apply_winners({256: (best, 25.0)})
    src = target.read_text()
    ns = {}
    exec(src[src.index("TUNED_BY_RES ="):src.index("# TUNED_BY_RES_END")], ns)
    table = ns["TUNED_BY_RES"]
    assert table[256] == dict(CAP_DIV=8, PACK_DIV=1, UNIQ=64, TWO_BRICK=1,
                              MAX_PROBES=4, MAX_DDA_ITERS=24)
    assert table[2048] == dict(CAP_DIV=64)  # untouched resolution survives
    # the rewritten block must itself be re-appliable (markers intact)
    pk.apply_winners({2048: (dict(best, capd=32), 9.0)})
    src = target.read_text()
    ns = {}
    exec(src[src.index("TUNED_BY_RES ="):src.index("# TUNED_BY_RES_END")], ns)
    assert ns["TUNED_BY_RES"][2048]["CAP_DIV"] == 32
    assert ns["TUNED_BY_RES"][256]["UNIQ"] == 64
