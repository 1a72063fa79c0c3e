"""Disagreement classifier for traversal A/B tests.

The reference's culture is pixel-exact A/B (voxRT.cpp:316-323). Two exact
in-order walkers can still legitimately disagree in two zero-measure cases:

  * t-tie: the ray passes through a shared voxel edge/corner, two voxels
    tie at the same entry distance, and either (voxel, face) answer is
    valid;
  * grazing touch vs the brute-force slab oracle: a ray along a voxel FACE
    or EDGE has a degenerate [entry, exit] interval that the inclusive slab
    test reports and the strict `en < ex` parametric walk excludes (matches
    the reference traversal's strict comparisons, voxCommon.hpp:326-334).

Instead of tolerating an unclassified mismatch budget (round-1 weakness:
0.5% could hide a systematic bug), every single disagreement must PROVE it
is one of the two cases above or the test fails."""

import numpy as np

from massivevoxelraytracing_tpu.ops import morton as morton_ops

F = np.float32


def _slab(m_voxel, lower, dps, ro, rd):
    """(entry, exit) of one voxel's AABB along the ray (inclusive slab)."""
    x, y, z = morton_ops.np_decode(np.asarray([m_voxel], np.uint64))
    lo = np.asarray(lower, F) + np.stack([x, y, z], -1).astype(F)[0] * F(dps)
    hi = lo + F(dps)
    en, ex = -np.inf, np.inf
    for a in range(3):
        if rd[a] == 0.0:
            if not (lo[a] <= ro[a] <= hi[a]):
                return np.inf, -np.inf
            continue
        t0 = (lo[a] - ro[a]) / rd[a]
        t1 = (hi[a] - ro[a]) / rd[a]
        en = max(en, min(t0, t1))
        ex = min(ex, max(t0, t1))
    return en, ex


def assert_tie_or_equal(i, t1, v1, m1, t2, v2, m2, rtol=1e-5, atol=1e-7):
    """Between two exact walkers: a disagreement must be a t-tie."""
    hit1 = t1 < 1e37
    hit2 = t2 < 1e37
    assert hit1 == hit2, f"ray {i}: hit-mask mismatch ({t1} vs {t2})"
    if not hit1:
        return
    assert np.isclose(t1, t2, rtol=rtol, atol=atol), (
        f"ray {i}: t differs beyond tie tolerance: {t1} vs {t2}"
    )
    # equal t, different (voxel, face): a legitimate corner/edge tie


def classify_vs_each_other(t1, m1, v1, t2, m2, v2, rtol=1e-5, atol=1e-7):
    """Vectorized outer check + per-ray classification of the residue."""
    hit1 = t1 < 1e37
    hit2 = t2 < 1e37
    agree = (hit1 == hit2) & (
        ~hit1 | (np.isclose(t1, t2, rtol=rtol, atol=atol)
                 & (v1 == v2) & (m1 == m2))
    )
    for i in np.nonzero(~agree)[0]:
        assert_tie_or_equal(
            i, t1[i], v1[i], m1[i], t2[i], v2[i], m2[i], rtol=rtol, atol=atol
        )
    return int((~agree).sum())


def assert_face_tie(i, m_voxel, lower, dps, ro, rd, rtol=1e-5):
    """A differing face axis at the SAME hit voxel and t is only legitimate
    when the voxel entry is achieved on >= 2 axes simultaneously (edge /
    corner entry). Verify from the per-axis slab times."""
    x, y, z = morton_ops.np_decode(np.asarray([m_voxel], np.uint64))
    lo = np.asarray(lower, F) + np.stack([x, y, z], -1).astype(F)[0] * F(dps)
    hi = lo + F(dps)
    tmins = []
    for a in range(3):
        if rd[a] == 0.0:
            continue
        t0 = (lo[a] - ro[a]) / rd[a]
        t1 = (hi[a] - ro[a]) / rd[a]
        tmins.append(min(t0, t1))
    tmins.sort()
    assert len(tmins) >= 2 and np.isclose(
        tmins[-1], tmins[-2], rtol=rtol, atol=1e-7
    ), f"ray {i}: face-axis mismatch without an axis tie (tmins={tmins})"


def classify_vs_oracle(
    i, m_sorted, lower, dps, ro, rd, t_dev, v_dev, t_ora, v_ora,
    rtol=2e-5, atol=1e-6, graze_eps=1e-4,
):
    """Device walker vs the inclusive brute-force slab oracle: any
    disagreement must be a t-tie or a grazing touch of the oracle's voxel.
    Returns a short tag describing the classified case (for reporting)."""
    dev_hit = t_dev < 1e37
    ora_hit = np.isfinite(t_ora)
    if dev_hit == ora_hit and dev_hit:
        if np.isclose(t_dev, t_ora, rtol=rtol, atol=atol):
            return "tie"  # same t, differing voxel/face at an edge
    if ora_hit:
        en, ex = _slab(m_sorted[int(v_ora)], lower, dps, ro, rd)
        scale = max(1.0, abs(en))
        if ex - en <= graze_eps * scale:
            # oracle counted a zero-measure touch; the walker's answer (miss
            # or a later real hit) must not be EARLIER than the graze
            if not dev_hit or t_dev >= en - rtol * scale:
                return "graze"
    raise AssertionError(
        f"ray {i}: unclassified disagreement: dev(t={t_dev}, v={v_dev}) "
        f"vs oracle(t={t_ora}, v={v_ora})"
    )
