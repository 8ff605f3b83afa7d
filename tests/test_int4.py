"""int4 packed-nibble selection shadow: packing, fallback engine, recall."""

import jax.numpy as jnp
import numpy as np
import pytest

from typeagent_tpu.ops import int4 as int4_mod
from typeagent_tpu.ops.int4 import (
    _bucket_maxima_pallas_q4,
    _bucket_maxima_xla_q4,
    _half_pad,
    _pick_tile_q4,
    cosine_topk_exact2_i4,
    quantize_rows_int4,
    quantize_rows_int4_device,
    split_pad_queries,
)


def normalized(rng, n, dim):
    m = rng.standard_normal((n, dim)).astype(np.float32)
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def unpack_host(packed, scales, d):
    """Dequantized [n, d] f32 rows from the packed column-split shadow."""
    half = (d + 1) // 2
    lo = ((packed.astype(np.int32) << 28) >> 28).astype(np.float32)
    hi = (packed.astype(np.int32) >> 4).astype(np.float32)
    deq = np.concatenate([lo[:, :half], hi[:, : d - half]], axis=1)
    return deq * scales[:, None]


def test_pack_roundtrip_host_device_parity(rng):
    for dim in (128, 384, 100):  # even-lane, real, odd/non-padded
        rows = normalized(rng, 64, dim)
        p_h, s_h = quantize_rows_int4(rows)
        p_d, s_d = quantize_rows_int4_device(jnp.asarray(rows))
        assert p_h.shape == (64, _half_pad(dim))
        np.testing.assert_array_equal(p_h, np.asarray(p_d))
        np.testing.assert_allclose(s_h, np.asarray(s_d), rtol=1e-6)
        deq = unpack_host(p_h, s_h, dim)
        np.testing.assert_allclose(deq, rows, atol=0.05)  # scale/2 per elem
    # Zero rows quantize without blowup.
    pz, sz = quantize_rows_int4(np.zeros((4, 16), np.float32))
    assert (pz == 0).all() and (sz == 1.0).all()


def test_split_pad_queries_matches_layout(rng):
    d = 384
    q = normalized(rng, 4, d)
    qs = np.asarray(split_pad_queries(jnp.asarray(q), d)).astype(np.float32)
    dh = _half_pad(d)
    assert qs.shape == (4, 2 * dh)
    np.testing.assert_allclose(qs[:, :192], q[:, :192].astype(np.float32), atol=4e-3)
    assert (qs[:, 192:dh] == 0).all()
    np.testing.assert_allclose(
        qs[:, dh : dh + 192], q[:, 192:].astype(np.float32), atol=4e-3
    )


def test_bucket_maxima_match_dequantized_oracle(rng):
    n, dim = 512, 64  # 4 buckets of 128
    rows = normalized(rng, n, dim)
    packed, scales = quantize_rows_int4(rows)
    q = normalized(rng, 8, dim)
    count = 387  # mask a ragged tail
    bvals = np.asarray(
        _bucket_maxima_xla_q4(
            jnp.asarray(packed),
            jnp.asarray(scales),
            jnp.asarray(q),
            jnp.asarray(count, dtype=jnp.int32),
            dim,
        )
    )
    raw = q @ unpack_host(packed, scales, dim).T
    raw[:, count:] = -3.0
    want = raw.reshape(8, 4, 128).max(axis=2)
    np.testing.assert_allclose(bvals, want, atol=1e-5)


def test_exhaustive_selection_reproduces_exact_topk(rng):
    # B >= n_buckets => phase 2 rescores every bucket: results must equal
    # the exact top-k over the rescore buffer bit-for-bit, certs all True.
    n, dim, k = 512, 96, 10
    rows = normalized(rng, n, dim)
    packed, scales = quantize_rows_int4(rows)
    q = normalized(rng, 8, dim)
    vals, idx, cert = cosine_topk_exact2_i4(
        jnp.asarray(rows),
        jnp.asarray(packed),
        jnp.asarray(scales),
        jnp.asarray(q),
        n,
        k,
        slack=n // 128,  # B = k + 4 >= nb = 4
    )
    assert np.asarray(cert).all()
    raw = q @ rows.T
    want_scores = np.clip((np.sort(raw, axis=1)[:, ::-1][:, :k] + 1) / 2, 0, 1)
    np.testing.assert_allclose(np.asarray(vals), want_scores, atol=1e-5)
    want_idx = np.argsort(-raw, axis=1)[:, :k]
    assert (np.asarray(idx) == want_idx).mean() > 0.95  # ties aside


def test_narrow_selection_recall(rng):
    # Realistic regime: B < nb. int4 selection + exact rescore keeps recall
    # high even on isotropic data (the hardest case for any shadow).
    n, dim, k = 4096, 128, 10
    rows = normalized(rng, n, dim)
    packed, scales = quantize_rows_int4(rows)
    q = normalized(rng, 16, dim)
    vals, idx, cert = cosine_topk_exact2_i4(
        jnp.asarray(rows),
        jnp.asarray(packed),
        jnp.asarray(scales),
        jnp.asarray(q),
        n,
        k,
    )
    raw = q @ rows.T
    want_idx = np.argsort(-raw, axis=1)[:, :k]
    got = np.asarray(idx)
    recall = np.mean(
        [len(set(a) & set(b)) / k for a, b in zip(got.tolist(), want_idx.tolist())]
    )
    assert recall >= 0.95
    # Returned scores are exact (phase-2 rescores from the f32 buffer).
    flat_scores = np.clip((raw + 1) / 2, 0, 1)
    got_vals = np.asarray(vals)
    for b in range(got.shape[0]):
        np.testing.assert_allclose(
            got_vals[b], flat_scores[b, got[b]], atol=1e-5
        )


def test_pick_tile_q4_power_of_two():
    # Round-4 advisor finding: a non-power-of-two tile (3072 at d=384 with
    # small batch) makes buckets-per-tile (g=24) not divide _K_LANES, which
    # shifts every bucket past lane 120 of each output block — phase 2 then
    # rescores the WRONG buckets. The picker must only emit powers of two.
    for dh in (128, 192, 256, 384, 512):
        for b in (1, 4, 8, 64, 128, 256, 512):
            t = _pick_tile_q4(1 << 20, dh, b)
            assert t & (t - 1) == 0 and 1024 <= t <= 4096, (dh, b, t)


def test_pallas_q4_nondividing_tile_multistep_falls_back(rng, monkeypatch):
    # Whole-array clamp can still yield a non-dividing tile when n_pad is
    # not a power of two (e.g. 3072 -> g=24): safe single-step only. Force
    # the picker to return a misaligned tile with steps > 1 and check the
    # kernel refuses (None => caller takes the XLA path).
    monkeypatch.setattr(int4_mod, "_pick_tile_q4", lambda n, dh, b: 3072)
    n, d = 6144, 384
    rows = normalized(rng, n, d)
    packed, scales = quantize_rows_int4(rows)
    qs = split_pad_queries(jnp.asarray(rows[:4]), d)
    out = int4_mod._bucket_maxima_pallas_q4(
        jnp.asarray(packed),
        jnp.asarray(scales),
        qs,
        jnp.asarray([n], jnp.int32),
        interpret=True,
    )
    assert out is None


@pytest.mark.parametrize("batch", [1, 8, 256])
def test_pallas_q4_bucket_table_matches_xla(rng, batch):
    # Pallas-vs-XLA bucket-table parity (advisor round-4): interpret mode
    # exercises the real tile/sub-slot-blending layout without a chip.
    # n = 32768 -> 256 buckets -> TWO output blocks at tile 2048, which is
    # exactly the regime the misaligned-tile bug corrupted (bucket ids past
    # the first block). Sweeps batch to vary the VMEM budget input.
    n, d = 32768, 384
    rows = normalized(rng, n, d)
    packed, scales = quantize_rows_int4(rows)
    q = normalized(rng, batch, d)
    qs = split_pad_queries(jnp.asarray(q), d)
    count = n - 173  # ragged watermark inside the last tile
    pal = _bucket_maxima_pallas_q4(
        jnp.asarray(packed),
        jnp.asarray(scales),
        qs,
        jnp.asarray([count], jnp.int32),
        interpret=True,
    )
    assert pal is not None
    xla = _bucket_maxima_xla_q4(
        jnp.asarray(packed),
        jnp.asarray(scales),
        jnp.asarray(q),
        jnp.asarray(count, jnp.int32),
        d,
    )
    nb = n // 128
    got = np.asarray(pal)[:, :nb]
    want = np.asarray(xla)
    # Kernel dots run in bf16 on the split halves; XLA path is f32.
    np.testing.assert_allclose(got, want, atol=2e-3)
    # Overflow lanes past nb (block padding) must stay at the raw floor.
    tail = np.asarray(pal)[:, nb:]
    assert tail.size == 0 or (tail <= -2.0).all()


def test_count_watermark(rng):
    # Appended stores have arbitrary counts; rows past count never surface.
    n, dim, k = 256, 32, 5
    rows = normalized(rng, n, dim)
    packed, scales = quantize_rows_int4(rows)
    q = normalized(rng, 4, dim)
    count = 129
    _, idx, _ = cosine_topk_exact2_i4(
        jnp.asarray(rows),
        jnp.asarray(packed),
        jnp.asarray(scales),
        jnp.asarray(q),
        count,
        k,
        slack=2,
    )
    assert (np.asarray(idx) < count).all()
