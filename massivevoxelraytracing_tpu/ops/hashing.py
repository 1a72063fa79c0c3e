"""Streaming 32-bit MurmurHash3 as pure uint32 JAX ops.

The reference uses an incremental MurmurHash32 for RNG stream derivation and
DAG node hashing (/root/reference/voxCommon.hpp:45-109); the canonical
MurmurHash3_x86_32 from smhasher is its test oracle (unittest.cpp:106-132).
We keep both roles: `murmur_*` below is the incremental form (word-at-a-time,
length counted in words * 4 bytes), and tests compare against a host numpy
oracle implementing canonical MurmurHash3_x86_32 over the same byte stream.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .bits import u32


def _c(x):
    return jnp.uint32(x)


def fmix32(h):
    h = u32(h)
    h = h ^ (h >> 16)
    h = h * _c(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * _c(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def rotl32(x, r: int):
    x = u32(x)
    return (x << r) | (x >> (32 - r))


def murmur_init(seed):
    """Returns hash state (h1, n_words)."""
    return u32(seed), jnp.zeros_like(u32(seed))


def murmur_combine(state, k1):
    h1, n = state
    k1 = u32(k1)
    k1 = k1 * _c(0xCC9E2D51)
    k1 = rotl32(k1, 15)
    k1 = k1 * _c(0x1B873593)
    h1 = h1 ^ k1
    h1 = rotl32(h1, 13)
    h1 = h1 * _c(5) + _c(0xE6546B64)
    return h1, n + _c(1)


def murmur_get(state):
    h1, n = state
    return fmix32(h1 ^ (n * _c(4)))


def hash_combine(*ks):
    """hashCombine(a, b[, c[, d]]): seed with the first word, mix the rest
    (voxCommon.hpp:88-109)."""
    state = murmur_init(ks[0])
    for k in ks[1:]:
        state = murmur_combine(state, k)
    return murmur_get(state)


# -- host numpy oracle: canonical MurmurHash3_x86_32 -------------------------

def np_murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """Canonical byte-stream MurmurHash3 (public domain algorithm by Austin
    Appleby), used as the oracle the incremental form must agree with on
    4-byte-aligned inputs."""
    c1 = 0xCC9E2D51
    c2 = 0x1B873593
    h1 = seed & 0xFFFFFFFF
    m = np.uint32
    nblocks = len(data) // 4
    for i in range(nblocks):
        k1 = int.from_bytes(data[4 * i: 4 * i + 4], "little")
        k1 = (k1 * c1) & 0xFFFFFFFF
        k1 = ((k1 << 15) | (k1 >> 17)) & 0xFFFFFFFF
        k1 = (k1 * c2) & 0xFFFFFFFF
        h1 ^= k1
        h1 = ((h1 << 13) | (h1 >> 19)) & 0xFFFFFFFF
        h1 = (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[nblocks * 4:]
    k1 = 0
    if len(tail) >= 3:
        k1 ^= tail[2] << 16
    if len(tail) >= 2:
        k1 ^= tail[1] << 8
    if len(tail) >= 1:
        k1 ^= tail[0]
        k1 = (k1 * c1) & 0xFFFFFFFF
        k1 = ((k1 << 15) | (k1 >> 17)) & 0xFFFFFFFF
        k1 = (k1 * c2) & 0xFFFFFFFF
        h1 ^= k1
    h1 ^= len(data)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1
