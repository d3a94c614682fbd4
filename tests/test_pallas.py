"""Pallas kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

from swiftmp3_tpu.ops import dsp


def test_polyphase_pallas_matches_jnp():
    import jax.numpy as jnp

    from swiftmp3_tpu.ops.pallas_kernels import polyphase_chunk_pallas

    rng = np.random.default_rng(0)
    B, ch, T = 3, 2, 8
    hist = (rng.standard_normal((B, ch, 480)) * 0.2).astype(np.float32)
    pcm = (rng.standard_normal((B, ch, T * 1152)) * 0.5).astype(np.float32)
    S_ref, x_ref = dsp.polyphase_chunk(jnp.asarray(hist), jnp.asarray(pcm))
    S_pal, x_pal = polyphase_chunk_pallas(
        jnp.asarray(hist), jnp.asarray(pcm), interpret=True
    )
    assert S_pal.shape == S_ref.shape
    assert np.abs(np.asarray(S_ref) - np.asarray(S_pal)).max() < 2e-5
    assert np.array_equal(np.asarray(x_ref), np.asarray(x_pal))


def test_device_pack_matches_host_pack():
    import jax.numpy as jnp

    from swiftmp3_tpu.io.huffman_pack import pack_frame_main_data

    rng = np.random.default_rng(1)
    F, G = 5, 4
    q = rng.integers(-15, 16, size=(F, G, 576)).astype(np.int32)
    bv = rng.integers(0, 289, size=(F, G)).astype(np.int32)
    chunks, nbits = dsp.pair_chunks_device(jnp.asarray(q), jnp.asarray(bv))
    by, total = dsp.pack_main_data(
        jnp.asarray(np.asarray(chunks).reshape(F, G * 288)),
        jnp.asarray(np.asarray(nbits).reshape(F, G * 288)),
        2160,
    )
    by = np.asarray(by)
    total = np.asarray(total)
    for f in range(F):
        host_bytes, part_bits = pack_frame_main_data(q[f], bv[f])
        assert total[f] == part_bits.sum()
        assert by[f, : len(host_bytes)].tobytes() == host_bytes


@pytest.mark.parametrize(
    "F,P,cap", [(16, 1152, 894), (5, 576, 894), (8, 1812, 1536), (3, 1152, 2160)]
)
def test_pack_pallas_matches_xla(F, P, cap):
    """The VMEM pack kernel (interpret mode on CPU) is bit-identical to the
    XLA pack across frame/slot/cap shapes, including non-128-multiple P."""
    import jax
    import jax.numpy as jnp

    from swiftmp3_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(7)
    nb = rng.integers(0, 16, size=(F, P)).astype(np.int32)
    scale = (cap * 8 - 64) / max(nb.sum(axis=1).max(), 1)
    if scale < 1:  # keep every frame under the cap
        nb = np.where(rng.random((F, P)) < scale, nb, 0)
    ch = np.zeros((F, P), np.int32)
    nz = nb > 0
    ch[nz] = rng.integers(0, 1 << 15, size=nz.sum()) & ((1 << nb[nz]) - 1)
    b_ref, t_ref = jax.jit(lambda c, n: dsp.pack_main_data(c, n, cap))(ch, nb)
    b_pl, t_pl = jax.jit(
        lambda c, n: pk.pack_pallas(c, n, cap, interpret=True)
    )(jnp.asarray(ch), jnp.asarray(nb))
    assert np.array_equal(np.asarray(b_ref), np.asarray(b_pl))
    assert np.array_equal(np.asarray(t_ref), np.asarray(t_pl))


def test_t15_code_lookup_exact():
    import jax.numpy as jnp

    from swiftmp3_tpu.tables import TABLE15_CODE

    idx = np.arange(256, dtype=np.int32)
    got = np.asarray(dsp.t15_code_lookup(jnp.asarray(idx)))
    assert np.array_equal(got, TABLE15_CODE)


@pytest.mark.parametrize("iso", [False, True])
def test_rate_sweep_pallas_matches_xla(iso):
    """The fused Pallas gain-sweep kernel (interpret mode on CPU) returns
    bit-identical (bits, bv) to the XLA formulation for both quantization
    laws."""
    import jax.numpy as jnp

    from swiftmp3_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(7)
    spec = (
        rng.standard_normal((37, 576)) * 10 ** rng.uniform(-5, 0.5, (37, 1))
    ).astype(np.float32)
    spec[3] = 0.0  # silent granule
    mag = (np.maximum(np.abs(spec), 1e-10) ** 0.75).astype(np.float32)
    g0 = rng.integers(0, 256, 37).astype(np.int32)

    bits_p, bv_p = pk.rate_sweep_pallas(
        jnp.asarray(mag), jnp.asarray(g0), iso=iso, interpret=True
    )
    gains = jnp.asarray(g0[:, None] + 4 * np.arange(20, dtype=np.int32))
    qk = dsp.quantize_at_gains(
        jnp.asarray(mag), jnp.asarray(spec < 0), gains, iso=iso
    )
    pair_bits = dsp._count_bits_pairs(qk)
    bv = dsp.big_values_from_quantized(qk)
    bits = jnp.sum(
        jnp.where(jnp.arange(288) < bv[..., None], pair_bits, 0), axis=-1
    )
    assert np.array_equal(np.asarray(bits_p), np.asarray(bits))
    assert np.array_equal(np.asarray(bv_p), np.asarray(bv))


def test_polyphase_matmul_matches_stepwise():
    """The folded five-matmul filterbank (the production path) agrees with
    the stepwise formulation to float32 ULP level, and returns the same
    full-signal buffer."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    for T in (2, 6):
        hist = jnp.asarray(rng.standard_normal((3, 2, 480)).astype(np.float32))
        pcm = jnp.asarray(
            rng.standard_normal((3, 2, T * 1152)).astype(np.float32)
        )
        S_a, x_a = dsp.polyphase_chunk(hist, pcm)
        S_b, x_b = dsp.polyphase_chunk_matmul(hist, pcm)
        assert np.array_equal(np.asarray(x_a), np.asarray(x_b))
        np.testing.assert_allclose(
            np.asarray(S_a), np.asarray(S_b), rtol=0, atol=2e-4
        )
        scale = float(np.abs(np.asarray(S_a)).max())
        assert (
            float(np.abs(np.asarray(S_a) - np.asarray(S_b)).max()) <= 4e-6 * max(scale, 1.0)
        )


def test_mdct_fold_matches_stepwise():
    """The folded-matrix mdct_chunk (production) agrees with the two-step
    windowed formulation (windows x small matmuls x aliasing butterflies)
    for all block types, and the flat signed carry matches exactly."""
    import jax.numpy as jnp

    def two_step(S, overlap, block_type):
        lead = S.shape[:-2]
        n_gran = S.shape[-2] // 18
        signed = S.reshape(*lead, n_gran, 576) * dsp._SIGN_FLAT
        g = signed.reshape(*lead, n_gran, 18, 32)
        cur = jnp.swapaxes(g, -1, -2)
        ov = jnp.swapaxes(overlap.reshape(*lead, 18, 32), -1, -2)
        prev = jnp.concatenate(
            [ov[..., None, :, :], cur[..., :-1, :, :]], axis=-3
        )
        combined = jnp.concatenate([prev, cur], axis=-1)
        long_c = dsp._mdct_long_batch(combined)
        short_c = dsp._mdct_short_batch(combined)
        bt = block_type[..., None]
        sb = jnp.arange(32, dtype=jnp.int32)
        use_long = (bt == dsp.BLOCK_LONG) | ((bt == dsp.BLOCK_MIXED) & (sb < 2))
        coeffs = jnp.where(use_long[..., None], long_c, short_c)
        reduced = dsp._aliasing_reduce(coeffs)
        coeffs = jnp.where((bt == dsp.BLOCK_LONG)[..., None], reduced, coeffs)
        return coeffs.reshape(*coeffs.shape[:-2], 576), signed

    rng = np.random.default_rng(4)
    T = 3
    S = jnp.asarray(rng.standard_normal((2, 2, 36 * T, 32)).astype(np.float32))
    overlap = jnp.asarray(rng.standard_normal((2, 2, 576)).astype(np.float32))
    bt = jnp.asarray(
        rng.choice(
            [dsp.BLOCK_LONG, dsp.BLOCK_SHORT, dsp.BLOCK_MIXED], (2, 2, 2 * T)
        ).astype(np.int32)
    )
    out_a, cur_a = two_step(S, overlap, bt)
    out_b, cur_b = dsp.mdct_chunk(S, overlap, bt)
    assert np.array_equal(np.asarray(cur_a), np.asarray(cur_b))
    scale = float(np.abs(np.asarray(out_a)).max())
    assert float(np.abs(np.asarray(out_a) - np.asarray(out_b)).max()) <= 1e-5 * max(
        scale, 1.0
    )


def test_mdct_blocksparse_matches_fold():
    """The block-sparse MDCT experiment (round-3 negative result, kept as a
    tested twin — see ARCHITECTURE.md): values must match the dense fold to
    summation-tree ULPs for every block-type mix, both aliasing laws."""
    import jax.numpy as jnp
    import numpy as np

    from swiftmp3_tpu.ops import dsp

    rng = np.random.default_rng(3)
    G = 8
    S = (rng.standard_normal((2, 2, 18 * G, 32)) * 0.1).astype(np.float32)
    ov = (rng.standard_normal((2, 2, 576)) * 0.1).astype(np.float32)
    bt = rng.integers(0, 3, (2, 2, G)).astype(np.int32)
    for iso in (False, True):
        a, sa = dsp.mdct_chunk(
            jnp.asarray(S), jnp.asarray(ov), jnp.asarray(bt), iso_mixed_alias=iso
        )
        b, sb = dsp.mdct_chunk_blocksparse(
            jnp.asarray(S), jnp.asarray(ov), jnp.asarray(bt), iso_mixed_alias=iso
        )
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
