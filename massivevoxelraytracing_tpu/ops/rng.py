"""PCG32 (XSH-RR) on 2x-uint32 limbs, and the bandwidth-optimal LCG shuffler.

Parity targets: PCG32 at /root/reference/renderCommon.hpp:86-110 and
LCGShuffler at renderCommon.hpp:493-514 (present + unit-tested in the
reference, not wired into the render path -- same status here).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .bits import add64, mod64_u32, mul64, u32, umul32_wide

_MULT_HI = jnp.uint32(0x5851F42D)  # 6364136223846793005 = 0x5851F42D4C957F2D
_MULT_LO = jnp.uint32(0x4C957F2D)


def _c(x):
    return jnp.uint32(x)


def pcg32_init(seed, stream):
    """seed/stream are (hi, lo) uint32 pairs or plain uint32 (hi=0).

    Mirrors PCG32::setup: state=0, inc=stream*2+1, step, state+=seed, step.
    """
    def pair(v):
        if isinstance(v, tuple):
            return u32(v[0]), u32(v[1])
        v = u32(v)
        return jnp.zeros_like(v), v

    seed = pair(seed)
    stream = pair(stream)
    inc_hi = (stream[0] << 1) | (stream[1] >> 31)
    inc_lo = (stream[1] << 1) | _c(1)
    inc = (inc_hi, inc_lo)
    state = (jnp.zeros_like(inc_hi), jnp.zeros_like(inc_lo))
    state, _ = pcg32_next(state, inc)
    state = add64(state, seed)
    state, _ = pcg32_next(state, inc)
    return state, inc


def pcg32_next(state, inc):
    """One PCG32 step: returns (new_state, uint32 output)."""
    old_hi, old_lo = state
    new_state = add64(mul64(state, (_MULT_HI, _MULT_LO)), inc)
    # xorshifted = ((old >> 18) ^ old) >> 27  -- a 64-bit op whose result
    # fits 32 bits (64-18-27 > 32 truncated to u32 below).
    s18_hi = old_hi >> 18
    s18_lo = (old_lo >> 18) | (old_hi << 14)
    x_hi = s18_hi ^ old_hi
    x_lo = s18_lo ^ old_lo
    xorshifted = (x_lo >> 27) | (x_hi << 5)
    rot = old_hi >> 27  # old >> 59
    neg_rot = (_c(0) - rot) & _c(31)
    # guard shift-by-32: when rot == 0, (x << 32) is UB; select explicitly.
    left = jnp.where(rot == 0, jnp.zeros_like(xorshifted), xorshifted << neg_rot)
    out = (xorshifted >> rot) | left
    return new_state, out


def lcg_shuffle(i, a, c, n):
    """(a * i + c) mod n: bandwidth-optimal random permutation when
    gcd(a, n) == 1 ("Bandwidth-Optimal Random Shuffling for GPUs")."""
    hi, lo = umul32_wide(u32(i), u32(a))
    hi, lo = add64((hi, lo), (jnp.zeros_like(hi), u32(c)))
    return mod64_u32((hi, lo), n)


def lcg_try_init(r0: int, r1: int, n: int):
    """Host-side: returns (a, c, n) or None if gcd(a, n) != 1."""
    a = int(r0) & 0xFFFFFFFF
    c = int(r1) & 0xFFFFFFFF
    n = int(n) & 0xFFFFFFFF
    return (a, c, n) if np.gcd(a, n) == 1 else None


# -- host numpy PCG32 (oracle + PMJ table generation) ------------------------

class NpPCG32:
    """uint64 host implementation, bit-exact oracle for the limb version."""

    MULT = np.uint64(6364136223846793005)

    def __init__(self, seed: int, stream: int):
        self.state = np.uint64(0)
        self.inc = np.uint64((stream << 1 | 1) & 0xFFFFFFFFFFFFFFFF)
        self.next_u32()
        self.state = np.uint64((int(self.state) + seed) & 0xFFFFFFFFFFFFFFFF)
        self.next_u32()

    def next_u32(self) -> int:
        old = int(self.state)
        self.state = np.uint64((old * int(self.MULT) + int(self.inc)) & 0xFFFFFFFFFFFFFFFF)
        xorshifted = ((old >> 18) ^ old) >> 27 & 0xFFFFFFFF
        rot = old >> 59
        return ((xorshifted >> rot) | (xorshifted << ((-rot) & 31))) & 0xFFFFFFFF

    def uniformf(self) -> float:
        bits = ((self.next_u32() >> 9) | 0x3F800000) & 0xFFFFFFFF
        return float(np.frombuffer(np.uint32(bits).tobytes(), np.float32)[0]) - 1.0
