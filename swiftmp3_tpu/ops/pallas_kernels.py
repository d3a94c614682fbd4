"""Pallas TPU kernels for the hot DSP ops.

polyphase_chunk_pallas: the ISO analysis filterbank over a whole chunk.
The idea: keep each tile's samples in VMEM, build the 64-phase partial sums
in registers, and hit the MXU once per tile with the [64, 32] cosine matrix.

Tiling: rows = 8 streams (sublane), columns = 96 window positions per tile
(96 divides 36*T for any even T chunk size used by the pipeline). Each tile
needs a 480-sample halo, supplied by a second input ref whose block index
map points one tile ahead (overlapping reads are not expressible with a
single BlockSpec).

STATUS (v5e, 2026-08): validated bit-close in interpret mode, but Mosaic
rejects the in-kernel [8, 3552] -> [8, 111, 32] shape cast (32 < the
128-lane width; 'infer-vector-layout: unsupported shape cast'). Meanwhile
XLA's fusion of the jnp formulation (ops.dsp.polyphase_chunk) measures
3.8 ms per 128-stream x 32-frame chunk on the chip — a few percent of the
step and far below the host<->device transfer costs that dominate this rig —
so the kernel stays an experiment rather than the default path. Revisit with
a 128-lane-native layout (4 subbands x 32 phases per row) if the filterbank
ever becomes the bottleneck on real hardware.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tables import ANALYSIS_MATRIX, ISO_WINDOW

_W8 = jnp.asarray(ISO_WINDOW[::-1].copy().reshape(8, 64))  # [8, 64]
_M2T = jnp.asarray(ANALYSIS_MATRIX[:, ::-1].T.copy())  # [64, 32]

BN = 8  # stream rows per tile
BT = 96  # window positions per tile
_SPAN = 32 * BT  # main block samples
_HALO = 512  # halo block samples (480 used)


def _kernel(x_ref, halo_ref, w8_ref, m2t_ref, out_ref):
    # x_ref: [BN, SPAN]; halo_ref: [BN, 512]; w8_ref: [8, 64];
    # m2t_ref: [64, 32]; out_ref: [BN, BT, 32]
    xt = jnp.concatenate([x_ref[:, :], halo_ref[:, :480]], axis=-1)  # [BN, SPAN+480]
    A = xt.reshape(BN, (_SPAN + 480) // 32, 32)  # [BN, BT+15, 32]
    Y = jnp.concatenate([A[:, :-1, :], A[:, 1:, :]], axis=-1)  # [BN, BT+14, 64]
    w8 = w8_ref[:, :]
    partial = Y[:, 0:BT, :] * w8[0]
    for m in range(1, 8):
        partial = partial + Y[:, 2 * m : 2 * m + BT, :] * w8[m]
    S = jax.lax.dot_general(
        partial.reshape(BN * BT, 64),
        m2t_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:, :, :] = S.reshape(BN, BT, 32)


def polyphase_chunk_pallas(
    hist: jax.Array, pcm: jax.Array, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Drop-in replacement for ops.dsp.polyphase_chunk (same contract).

    hist: [..., 480]; pcm: [..., T*1152]. Returns (S [..., 36T, 32], full
    signal x [..., 480 + T*1152]).
    """
    x_full = jnp.concatenate([hist, pcm], axis=-1)
    lead = x_full.shape[:-1]
    L = x_full.shape[-1]
    T36 = (L - 480) // 32
    assert T36 % BT == 0, f"chunk windows {T36} not divisible by {BT}"
    N = int(np.prod(lead)) if lead else 1
    N_pad = ((N + BN - 1) // BN) * BN

    x = x_full.reshape(N, L)
    # pad streams to a multiple of BN and add 32 tail samples so the last
    # halo block (512 wide, 480 used) stays in bounds
    x = jnp.pad(x, ((0, N_pad - N), (0, 32)))

    n_tiles = T36 // BT
    halo_coord = _SPAN // _HALO  # block-index stride of the main span

    S = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((N_pad, T36, 32), jnp.float32),
        grid=(N_pad // BN, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (BN, _SPAN), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BN, _HALO),
                lambda i, j: (i, j * halo_coord + halo_coord),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((8, 64), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 32), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BN, BT, 32), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x, x, _W8, _M2T)

    S = S[:N].reshape(*lead, T36, 32)
    return S, x_full
