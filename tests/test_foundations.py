"""Property tests for L0 primitives, mirroring the reference's unittest.cpp
strategy (bijections, oracle agreement, involutions) at reduced-but-meaningful
iteration counts."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from massivevoxelraytracing_tpu.ops import bits, hashing, morton, rng

RNG = np.random.default_rng(12345)


def ru32(n):
    return RNG.integers(0, 1 << 32, size=n, dtype=np.uint32)


# ---------------------------------------------------------------------------
# bits
# ---------------------------------------------------------------------------

def test_reverse_bits_involution():
    # unittest.cpp:94-104
    x = ru32(100_000)
    y = np.asarray(bits.reverse_bits(bits.reverse_bits(jnp.asarray(x))))
    np.testing.assert_array_equal(x, y)


def test_reverse_bits_known():
    assert int(bits.reverse_bits(jnp.uint32(1))) == 0x80000000
    assert int(bits.reverse_bits(jnp.uint32(0xF0000000))) == 0x0000000F


def test_owen_scramble_bijection_on_prefixes():
    # unittest.cpp:66-93: nested_uniform_scramble is a bijection on b-bit
    # prefixes (test 6-bit prefixes over all 64 values for many seeds).
    for seed in ru32(64):
        x = jnp.arange(64, dtype=jnp.uint32) << 26
        y = np.asarray(bits.nested_uniform_scramble(x, jnp.uint32(seed))) >> 26
        assert len(np.unique(y)) == 64


def test_scramble_f32_range():
    x = RNG.random(100_000, dtype=np.float32)
    seeds = ru32(100_000)
    y = np.asarray(bits.scramble_f32(jnp.asarray(x), jnp.asarray(seeds)))
    assert np.all(y >= 0.0) and np.all(y < 1.0)


def test_uniformf_range_and_value():
    x = ru32(100_000)
    y = np.asarray(bits.uniformf(jnp.asarray(x)))
    assert np.all(y >= 0.0) and np.all(y < 1.0)
    # oracle: mantissa stuffing
    want = np.frombuffer(
        ((x >> 9) | 0x3F800000).astype(np.uint32).tobytes(), np.float32
    ) - 1.0
    np.testing.assert_array_equal(y, want)


def test_u64_arithmetic_vs_numpy():
    n = 50_000
    a = RNG.integers(0, 1 << 64, size=n, dtype=np.uint64)
    b = RNG.integers(0, 1 << 64, size=n, dtype=np.uint64)
    ah, al = morton.np_pack_pair(a)
    bh, bl = morton.np_pack_pair(b)
    pa = (jnp.asarray(ah), jnp.asarray(al))
    pb = (jnp.asarray(bh), jnp.asarray(bl))

    s = bits.add64(pa, pb)
    np.testing.assert_array_equal(morton.np_unpack_pair(*map(np.asarray, s)), a + b)

    m = bits.mul64(pa, pb)
    np.testing.assert_array_equal(morton.np_unpack_pair(*map(np.asarray, m)), a * b)

    for k in (0, 1, 3, 17, 31, 32, 33, 45, 63):
        sh = bits.shr64(pa, k)
        np.testing.assert_array_equal(
            morton.np_unpack_pair(*map(np.asarray, sh)), a >> np.uint64(k)
        )
        sl = bits.shl64(pa, k)
        np.testing.assert_array_equal(
            morton.np_unpack_pair(*map(np.asarray, sl)), a << np.uint64(k)
        )
    # dynamic shift
    ks = RNG.integers(0, 64, size=n).astype(np.uint32)
    sh = bits.shr64_dyn(pa, jnp.asarray(ks))
    np.testing.assert_array_equal(
        morton.np_unpack_pair(*map(np.asarray, sh)), a >> ks.astype(np.uint64)
    )


def test_mod64():
    n = 10_000
    a = RNG.integers(0, 1 << 64, size=n, dtype=np.uint64)
    mods = RNG.integers(1, 1 << 32, size=n, dtype=np.uint32)
    ah, al = morton.np_pack_pair(a)
    got = np.asarray(bits.mod64_u32((jnp.asarray(ah), jnp.asarray(al)), jnp.asarray(mods)))
    want = (a % mods.astype(np.uint64)).astype(np.uint32)
    np.testing.assert_array_equal(got, want)


def test_popcount8():
    x = ru32(10_000)
    got = np.asarray(bits.popcount8(jnp.asarray(x)))
    want = np.array([bin(v & 0xFF).count("1") for v in x], np.uint32)
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# morton
# ---------------------------------------------------------------------------

def test_morton_encoders_agree_and_invert():
    # unittest.cpp:183-216: all encoders agree, all decoders invert.
    n = 50_000
    x = RNG.integers(0, 1 << 21, size=n, dtype=np.uint32)
    y = RNG.integers(0, 1 << 21, size=n, dtype=np.uint32)
    z = RNG.integers(0, 1 << 21, size=n, dtype=np.uint32)
    jx, jy, jz = map(jnp.asarray, (x, y, z))

    h1, l1 = morton.encode_magicbits(jx, jy, jz)
    h2, l2 = morton.encode_naive(jx, jy, jz)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    want = morton.np_encode(x, y, z)
    wh, wl = morton.np_pack_pair(want)
    np.testing.assert_array_equal(np.asarray(h1), wh)
    np.testing.assert_array_equal(np.asarray(l1), wl)

    for dec in (morton.decode_magicbits, morton.decode_naive):
        dx, dy, dz = dec(h1, l1)
        np.testing.assert_array_equal(np.asarray(dx), x)
        np.testing.assert_array_equal(np.asarray(dy), y)
        np.testing.assert_array_equal(np.asarray(dz), z)


def test_number_of_sort_bits():
    # unittest.cpp:218-227: sort-bit count == popcount-style width of max code
    for res, want in ((2, 3), (4, 6), (256, 24), (2048, 33), (1 << 21, 63)):
        assert morton.number_of_sort_bits(res) == want


# ---------------------------------------------------------------------------
# hashing
# ---------------------------------------------------------------------------

def test_murmur_incremental_vs_canonical():
    # unittest.cpp:106-132: incremental == canonical MurmurHash3_x86_32
    for _ in range(200):
        nwords = int(RNG.integers(1, 9))
        words = ru32(nwords)
        seed = int(ru32(1)[0])
        state = hashing.murmur_init(jnp.uint32(seed))
        for w in words:
            state = hashing.murmur_combine(state, jnp.uint32(int(w)))
        got = int(hashing.murmur_get(state))
        want = hashing.np_murmur3_x86_32(words.tobytes(), seed)
        assert got == want


def test_hash_combine_matches_streaming():
    a, b, c, d = (int(v) for v in ru32(4))
    s = hashing.murmur_init(jnp.uint32(a))
    s = hashing.murmur_combine(s, jnp.uint32(b))
    assert int(hashing.hash_combine(jnp.uint32(a), jnp.uint32(b))) == int(
        hashing.murmur_get(s)
    )
    s = hashing.murmur_combine(s, jnp.uint32(c))
    s = hashing.murmur_combine(s, jnp.uint32(d))
    assert int(
        hashing.hash_combine(jnp.uint32(a), jnp.uint32(b), jnp.uint32(c), jnp.uint32(d))
    ) == int(hashing.murmur_get(s))


# ---------------------------------------------------------------------------
# rng
# ---------------------------------------------------------------------------

def test_pcg32_matches_numpy_oracle():
    for seed, stream in [(0, 2525), (1, 0), (123456789, 987654321), (0xFFFFFFFF, 0x7FFFFFFF)]:
        ref = rng.NpPCG32(seed, stream)
        state, inc = rng.pcg32_init(jnp.uint32(seed), jnp.uint32(stream))
        for _ in range(64):
            state, out = rng.pcg32_next(state, inc)
            assert int(out) == ref.next_u32()


def test_pcg32_vectorized():
    seeds = jnp.arange(128, dtype=jnp.uint32)
    state, inc = rng.pcg32_init(seeds, jnp.uint32(7))
    state, out = rng.pcg32_next(state, inc)
    outs = np.asarray(out)
    want = np.array([rng.NpPCG32(int(s), 7).next_u32() for s in range(128)])
    np.testing.assert_array_equal(outs, want)


def test_lcg_shuffler_is_permutation():
    # unittest.cpp:12-39
    for _ in range(20):
        n = int(RNG.integers(2, 10_000))
        while True:
            r0, r1 = (int(v) for v in ru32(2))
            params = rng.lcg_try_init(r0, r1, n)
            if params:
                break
        a, c, nn = params
        i = jnp.arange(n, dtype=jnp.uint32)
        out = np.asarray(rng.lcg_shuffle(i, jnp.uint32(a), jnp.uint32(c), jnp.uint32(nn)))
        assert len(np.unique(out)) == n
        assert out.max() < n
