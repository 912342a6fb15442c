import jax.numpy as jnp
import numpy as np

from dpu_olap_tpu.ops.hashing import (
    bucket_shift,
    radix_bucket,
    wang_hash,
    wang_hash_np,
)


def ref_wang(key: int) -> int:
    """Literal transcription of the reference C (partition.c:20-28) on Python
    ints with explicit uint32 wraparound — an independent oracle."""
    M = 0xFFFFFFFF
    key = (key + (~(key << 15) & M)) & M
    key ^= key >> 10
    key = (key + ((key << 3) & M)) & M
    key ^= key >> 6
    key = (key + (~(key << 11) & M)) & M
    key ^= key >> 16
    return key


def test_wang_hash_matches_reference_scalar():
    for k in [0, 1, 42, 1 << 30, 0xFFFFFFFF, 123456789]:
        got = int(wang_hash(jnp.asarray([k], jnp.uint32))[0])
        assert got == ref_wang(k), k


def test_wang_hash_np_matches_jax(rng):
    keys = rng.integers(0, 2**32, size=4096, dtype=np.uint32)
    np.testing.assert_array_equal(
        np.asarray(wang_hash(jnp.asarray(keys))), wang_hash_np(keys)
    )


def test_bucket_shift_matches_clz():
    # BUCKET_SHIFT(n) = 1 + __builtin_clz(n)  (partition.c:44)
    for n, expect in [(1, 32), (2, 31), (8, 29), (64, 26), (2048, 21)]:
        assert bucket_shift(n) == expect


def test_radix_bucket_range_and_balance(rng):
    keys = jnp.asarray(rng.integers(0, 2**32, size=1 << 16, dtype=np.uint32))
    for p in [2, 8, 64]:
        b = np.asarray(radix_bucket(keys, p))
        assert b.min() >= 0 and b.max() < p
        counts = np.bincount(b, minlength=p)
        # Wang hash is well mixed: buckets within 20% of uniform at 64Ki keys.
        assert counts.min() > (1 << 16) / p * 0.8


def test_modulo_partitioning_flag(rng):
    from dpu_olap_tpu.config import FLAGS

    keys = jnp.asarray(rng.integers(0, 2**32, size=4096, dtype=np.uint32))
    FLAGS.use_radix_partitioning = False
    try:
        b = np.asarray(radix_bucket(keys, 6))  # modulo supports non-pow2
        np.testing.assert_array_equal(b, wang_hash_np(np.asarray(keys)) % 6)
    finally:
        FLAGS.use_radix_partitioning = True
