"""PMJ(0,2) sampling + Owen shuffling/scrambling + Lambertian BRDF sampling.

Reference: pmjSampler.hpp (table generation on host, sample2d on device with
a nested_uniform_scramble shuffle of sample index and dimension plus a float
scramble of the point) and renderCommon.hpp:119-151 (branchless ONB +
cosine-hemisphere sampling). Table layout matches the reference: 128
sequences x 4096 2-D points.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .bits import scramble_f32, nested_uniform_scramble
from .hashing import hash_combine
from .rng import NpPCG32

LENGTH = 4096
N_SEQUENCE = 128


def _c(x):
    return jnp.uint32(x)


# pmj02 xor strata tables (Helmer stochastic-generation, public algorithm)
_PMJ02_XORS = (
    (0x0, 0x0, 0x2, 0x6, 0x6, 0xE, 0x36, 0x4E, 0x16, 0x2E, 0x276, 0x6CE,
     0x716, 0xC2E, 0x3076, 0x40CE, 0x116, 0x22E, 0x20676, 0x60ECE, 0x61716,
     0xE2C2E, 0x367076, 0x4EC0CE, 0x170116, 0x2C022E, 0x2700676, 0x6C00ECE,
     0x7001716, 0xC002C2E, 0x30007076, 0x4000C0CE),
    (0x0, 0x1, 0x3, 0x3, 0x7, 0x1B, 0x27, 0xB, 0x17, 0x13B, 0x367, 0x38B,
     0x617, 0x183B, 0x2067, 0x8B, 0x117, 0x1033B, 0x30767, 0x30B8B, 0x71617,
     0x1B383B, 0x276067, 0xB808B, 0x160117, 0x138033B, 0x3600767, 0x3800B8B,
     0x6001617, 0x1800383B, 0x20006067, 0x808B),
)


def np_pmj02_samples(num_samples: int, uniform) -> np.ndarray:
    """Generate one pmj02 sequence on host (float32 [n, 2]).

    `uniform` is a callable returning floats in [0, 1). Mirrors
    GetPMJ02Samples (pmjSampler.hpp:14-58)."""
    s = np.zeros((num_samples, 2), np.float64)
    s[0, 0] = uniform()
    s[0, 1] = uniform()
    log_n = 0
    while (1 << log_n) < num_samples:
        prev_len = 1 << log_n
        n_strata = prev_len * 2
        i_strata = 1.0 / n_strata
        for i in range(prev_len):
            if prev_len + i >= num_samples:
                break
            prev_x_idx = i ^ _PMJ02_XORS[0][log_n]
            x_stratum = int(s[prev_x_idx, 0] * n_strata) ^ 1
            prev_y_idx = i ^ _PMJ02_XORS[1][log_n]
            y_stratum = int(s[prev_y_idx, 1] * n_strata) ^ 1
            s[prev_len + i, 0] = (uniform() + x_stratum) * i_strata
            s[prev_len + i, 1] = (uniform() + y_stratum) * i_strata
        log_n += 1
    return s.astype(np.float32)


def make_pmj_table(n_sequence: int = N_SEQUENCE, length: int = LENGTH,
                   seed: int = 0, stream: int = 2525) -> np.ndarray:
    """All sequences: f32 [n_sequence, length, 2] (PMJSampler::setup).
    Uses the native generator when available (bit-exact with the python
    one, tested); python fallback otherwise."""
    from ..utils import native

    fast = native.pmj02_table(n_sequence, length, seed, stream)
    if fast is not None:
        return fast
    rng = NpPCG32(seed, stream)
    out = np.zeros((n_sequence, length, 2), np.float32)
    for i in range(n_sequence):
        out[i] = np_pmj02_samples(length, rng.uniformf)
    return out


def pmj_sample2d(table, sample_idx, dimension, stream):
    """Owen-shuffled, Owen-scrambled 2-D sample (PMJSampler::sample2d,
    pmjSampler.hpp:158-173). All args u32 arrays of the same shape;
    table: f32 [N_SEQUENCE, LENGTH, 2]."""
    sample_idx = nested_uniform_scramble(
        sample_idx, hash_combine(stream, dimension, _c(31082745))
    ) & _c(LENGTH - 1)
    dim = nested_uniform_scramble(
        dimension, hash_combine(stream, _c(54761983))
    ) & _c(N_SEQUENCE - 1)
    flat = table.reshape(-1, 2)
    lin = (dim * _c(LENGTH) + sample_idx).astype(jnp.int32)
    pt = jnp.take(flat, lin, axis=0, mode="clip")
    x = scramble_f32(pt[..., 0], hash_combine(stream, dim, _c(83927105)))
    y = scramble_f32(pt[..., 1], hash_combine(stream, dim, _c(12654890)))
    return x, y


def orthonormal_basis(z):
    """Branchless ONB (Duff et al., GetOrthonormalBasis,
    renderCommon.hpp:119-126). z: f32[..., 3] -> (x, y) axes."""
    sign = jnp.where(z[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z[..., 2])
    b = z[..., 0] * z[..., 1] * a
    x = jnp.stack(
        [1.0 + sign * z[..., 0] * z[..., 0] * a, sign * b, -sign * z[..., 0]],
        axis=-1,
    )
    y = jnp.stack(
        [b, sign + z[..., 1] * z[..., 1] * a, -z[..., 1]], axis=-1
    )
    return x, y


def sample_lambertian(a, b, ng):
    """Cosine-hemisphere direction around ng (sampleLambertian,
    renderCommon.hpp:134-151). a/b uniform [0,1), ng f32[..., 3]."""
    r = jnp.sqrt(a)
    theta = b * (2.0 * jnp.pi)
    x = r * jnp.cos(theta)
    y = r * jnp.sin(theta)
    z = jnp.sqrt(jnp.maximum(1.0 - a, 0.0))
    xa, ya = orthonormal_basis(ng)
    return xa * x[..., None] + ya * y[..., None] + ng * z[..., None]


def luminance(rgb):
    """Rec.709 luma (renderCommon.hpp:168-172)."""
    return 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]
