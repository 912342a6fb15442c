"""Bitonic sort machinery tests (interpret mode, small blocks).

Differential vs numpy: keys must sort exactly; payloads must follow their
key (checked via a payload that is a bijection of position, verifying the
(key, payload) multiset is preserved and keys are ordered). The bitonic
network is not stable, so equal keys may swap payloads — tests use either
unique keys (exact payload check) or verify pair-multiset equality.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dpu_olap_tpu.ops.sort_pallas import (
    LANES,
    bitonic_cascade_blocks,
    bitonic_xblock,
    sort_bitonic,
    sortable_bitonic,
)

BR = 8  # small cascade blocks in tests: 1Ki elements per block
BLK = BR * LANES


def _pairs(k, p):
    return set(zip(k.tolist(), p.tolist()))


def _np_bitonic_segments(rng, n, seg, key_hi=2**32):
    """Random array whose seg-length segments are each bitonic
    (ascending first half, descending second half)."""
    k = rng.integers(0, key_hi, n).astype(np.uint32)
    for s in range(0, n, seg):
        h = seg // 2
        k[s : s + h] = np.sort(k[s : s + h])
        k[s + h : s + seg] = np.sort(k[s + h : s + seg])[::-1]
    return k


def check_sorted_segments(out_k, seg, alternating):
    for si, s in enumerate(range(0, len(out_k), seg)):
        segk = out_k[s : s + seg]
        if alternating and si % 2 == 1:
            segk = segk[::-1]
        assert np.all(segk[1:] >= segk[:-1]), f"segment {si} unsorted"


@pytest.mark.parametrize("segs,alternating", [(1, False), (2, True), (4, True)])
def test_cascade_blocks_merges_bitonic(rng, segs, alternating):
    # one cascade block per segment: full in-block merge
    n = segs * BLK
    k = _np_bitonic_segments(rng, n, BLK)
    p = np.arange(n, dtype=np.uint32)
    out = bitonic_cascade_blocks(
        (jnp.asarray(k), jnp.asarray(p)),
        start_d=BLK // 2,
        seg_len=BLK,
        alternating=alternating,
        block_rows=BR,
        interpret=True,
    )
    ok, op = np.asarray(out[0]), np.asarray(out[1])
    check_sorted_segments(ok, BLK, alternating)
    assert _pairs(ok, op) == _pairs(k, p)


def test_cascade_sub_block_segments(rng):
    # segments smaller than the cascade block: direction alternates within
    # one kernel block (grow//seg_rows path), incl. the lane-roll stages
    n = 4 * BLK
    seg = BLK // 2
    k = _np_bitonic_segments(rng, n, seg)
    p = np.arange(n, dtype=np.uint32)
    out = bitonic_cascade_blocks(
        (jnp.asarray(k), jnp.asarray(p)),
        start_d=seg // 2,
        seg_len=seg,
        alternating=True,
        block_rows=BR,
        interpret=True,
    )
    ok, op = np.asarray(out[0]), np.asarray(out[1])
    check_sorted_segments(ok, seg, True)
    assert _pairs(ok, op) == _pairs(k, p)


@pytest.mark.parametrize("m,segs,alternating", [(2, 1, False), (2, 2, True),
                                                (4, 2, True), (8, 1, False)])
def test_xblock_plus_cascade_full_merge(rng, m, segs, alternating):
    # m cascade blocks per segment: cross-block stages then in-block cascade
    # must equal a full segment merge
    seg = m * BLK
    n = segs * seg
    k = _np_bitonic_segments(rng, n, seg)
    p = np.arange(n, dtype=np.uint32)
    mid = bitonic_xblock(
        (jnp.asarray(k), jnp.asarray(p)),
        seg_len=seg,
        low_d=BLK,
        alternating=alternating,
        interpret=True,
    )
    out = bitonic_cascade_blocks(
        mid,
        start_d=BLK // 2,
        seg_len=seg,
        alternating=alternating,
        block_rows=BR,
        interpret=True,
    )
    ok, op = np.asarray(out[0]), np.asarray(out[1])
    check_sorted_segments(ok, seg, alternating)
    assert _pairs(ok, op) == _pairs(k, p)


@pytest.mark.parametrize("n_leaves", [2, 4, 8, 32])
def test_sort_bitonic_unique_keys(rng, n_leaves):
    leaf = 512
    n = n_leaves * leaf
    assert sortable_bitonic(n, leaf)
    k = rng.choice(2**32, size=n, replace=False).astype(np.uint32)
    p = np.arange(n, dtype=np.uint32)
    out = sort_bitonic(
        (jnp.asarray(k), jnp.asarray(p)), leaf=leaf, block_rows=BR,
        interpret=True,
    )
    order = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(np.asarray(out[0]), k[order])
    np.testing.assert_array_equal(np.asarray(out[1]), p[order])


def test_sort_bitonic_duplicate_keys(rng):
    leaf = 512
    n = 16 * leaf
    k = rng.integers(0, 64, n).astype(np.uint32)  # heavy duplicates
    p = np.arange(n, dtype=np.uint32)
    out = sort_bitonic(
        (jnp.asarray(k), jnp.asarray(p)), leaf=leaf, block_rows=BR,
        interpret=True,
    )
    ok, op = np.asarray(out[0]), np.asarray(out[1])
    np.testing.assert_array_equal(ok, np.sort(k))
    assert _pairs(ok, op) == _pairs(k, p)


def test_sort_bitonic_two_payloads(rng):
    leaf = 512
    n = 8 * leaf
    k = rng.choice(2**31, size=n, replace=False).astype(np.uint32)
    p1 = np.arange(n, dtype=np.uint32)
    p2 = (p1 * np.uint32(2654435761)) & np.uint32(0xFFFFFFFF)
    out = sort_bitonic(
        (jnp.asarray(k), jnp.asarray(p1), jnp.asarray(p2)),
        leaf=leaf, block_rows=BR, interpret=True,
    )
    order = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(np.asarray(out[0]), k[order])
    np.testing.assert_array_equal(np.asarray(out[1]), p1[order])
    np.testing.assert_array_equal(np.asarray(out[2]), p2[order])


def test_sortable_bitonic():
    assert sortable_bitonic(1 << 21)
    assert sortable_bitonic((1 << 21) - 128)  # non-pow2: padded internally
    assert not sortable_bitonic(4096)  # < 2 leaves
    assert sortable_bitonic(1024, leaf=256)


@pytest.mark.parametrize("n_off", [-384, -128, 128, 1920])
def test_sort_bitonic_non_pow2(rng, n_off):
    # arbitrary lengths pad to the next power of two with max keys and
    # slice back; parity vs numpy on keys and payload pairing
    leaf = 512
    n = 8 * leaf + n_off
    assert sortable_bitonic(n, leaf)
    k = rng.choice(2**32 - 1, size=n, replace=False).astype(np.uint32)
    p = np.arange(n, dtype=np.uint32)
    out = sort_bitonic(
        (jnp.asarray(k), jnp.asarray(p)), leaf=leaf, block_rows=BR,
        interpret=True,
    )
    order = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(np.asarray(out[0]), k[order])
    np.testing.assert_array_equal(np.asarray(out[1]), p[order])


def test_bitonic_merge_xblock_path(rng):
    # n > DEF_R*128 engages the fused cross-block stage kernel inside
    # merge_xla.bitonic_merge (the TPU big-d path), in interpret mode
    from dpu_olap_tpu.ops.merge_xla import bitonic_merge

    n = 1 << 17  # 2 x 64Ki cascade blocks
    h = n // 2
    k = rng.integers(0, 2**32, n).astype(np.uint32)
    k[:h] = np.sort(k[:h])
    k[h:] = np.sort(k[h:])[::-1]  # bitonic input
    p = np.arange(n, dtype=np.uint32)
    ok, op = bitonic_merge((jnp.asarray(k), jnp.asarray(p)), interpret=True)
    ok, op = np.asarray(ok), np.asarray(op)
    assert np.all(ok[1:] >= ok[:-1])
    assert _pairs(ok, op) == _pairs(k, p)


@pytest.mark.parametrize("segs,alternating", [(1, False), (2, True)])
def test_xblock_oversized_m_xla_fallback(rng, segs, alternating):
    # m = seg/BLK = 128 > M_MAX=64: the largest stages must run as XLA
    # passes with per-parent-segment directions before the fused kernel
    seg = 128 * BLK
    n = segs * seg
    k = _np_bitonic_segments(rng, n, seg)
    p = np.arange(n, dtype=np.uint32)
    mid = bitonic_xblock(
        (jnp.asarray(k), jnp.asarray(p)),
        seg_len=seg,
        low_d=BLK,
        alternating=alternating,
        interpret=True,
    )
    out = bitonic_cascade_blocks(
        mid,
        start_d=BLK // 2,
        seg_len=seg,
        alternating=alternating,
        block_rows=BR,
        interpret=True,
    )
    ok, op = np.asarray(out[0]), np.asarray(out[1])
    check_sorted_segments(ok, seg, alternating)
    assert _pairs(ok, op) == _pairs(k, p)


@pytest.mark.parametrize("rounds", [1, 2, 3])
def test_cascade_rounds_fused(rng, rounds):
    # leaves of length L sorted alternating; one fused pass must produce
    # seg_to-length alternating runs == applying the rounds one by one
    L = 128
    seg_to = L * (2 ** rounds)
    n = 4 * seg_to
    from dpu_olap_tpu.ops.sort_pallas import bitonic_cascade_rounds

    k = rng.integers(0, 2**32, n).astype(np.uint32)
    for s in range(0, n, L):  # alternating sorted leaves
        run = np.sort(k[s : s + L])
        k[s : s + L] = run if (s // L) % 2 == 0 else run[::-1]
    p = np.arange(n, dtype=np.uint32)
    out = bitonic_cascade_rounds(
        (jnp.asarray(k), jnp.asarray(p)),
        seg_from=2 * L,
        seg_to=seg_to,
        block_rows=BR,
        interpret=True,
    )
    ok, op = np.asarray(out[0]), np.asarray(out[1])
    check_sorted_segments(ok, seg_to, True)
    assert _pairs(ok, op) == _pairs(k, p)


def test_cascade_rounds_full_array_ascending(rng):
    # seg_to == n: the final round must come out ascending with no flip flag
    from dpu_olap_tpu.ops.sort_pallas import bitonic_cascade_rounds

    L = 256
    n = 1024  # one BR-block
    k = rng.integers(0, 2**32, n).astype(np.uint32)
    for s in range(0, n, L):
        run = np.sort(k[s : s + L])
        k[s : s + L] = run if (s // L) % 2 == 0 else run[::-1]
    p = np.arange(n, dtype=np.uint32)
    out = bitonic_cascade_rounds(
        (jnp.asarray(k), jnp.asarray(p)),
        seg_from=2 * L, seg_to=n, block_rows=BR, interpret=True,
    )
    ok, op = np.asarray(out[0]), np.asarray(out[1])
    assert np.all(ok[1:] >= ok[:-1])
    assert _pairs(ok, op) == _pairs(k, p)
