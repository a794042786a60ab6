"""Fused sequential 1-flip sweep as a Pallas TPU kernel.

The exhaustive greedy 1-flip sweep (`env_L2A.py:110-115`, our
`MaxcutEnv.sweep_1flip`) is inherently sequential over nodes: node i's
accept decision depends on flips at nodes < i. The XLA `fori_loop`
formulation re-materializes the [B, N] gain matrix in HBM every iteration
— O(N * B * N) HBM traffic per sweep (at G22 scale with 8k chains, ~2000
iterations x 130 MB). This kernel keeps a chain block's signs/gains/values
resident in VMEM for the whole sweep and streams adjacency rows from HBM
with double-buffered DMA — traffic drops to O(N^2 + B * N) per block pass.

Semantics are identical to `MaxcutEnv.sweep_1flip` (strict-improvement
accepts, ascending node order); tested bit-exact against it (interpret
mode at all sizes; real hardware at n <= 128).

Backend status (2026-08, axon TPU v5e tunnel): compiles and runs bit-exact
for single-lane-tile graphs (n_pad == 128); for larger graphs the remote
tpu_compile_helper crashes (opaque exit 1) on both the VMEM-resident and
row-DMA variants — an axon/Mosaic limitation, not a semantics issue.

SUPERSEDED for unit-weight graphs by
`ops/pallas/mcpg_sweep.py:sweep_1flip_packed` — the bit-packed popcount
formulation avoids the multi-tile lane dimension entirely ([BLK, N/32]
blocks), compiles fine through the tunnel at G22 scale, is bit-exact vs
`MaxcutEnv.sweep_1flip`, and runs 654M vs 29M node-visits/s (23x). This
f32 kernel remains the general-weight pattern.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sweep_kernel_vmem(adj_ref, s_in, gains_in, vs_in, s_io, gains_io, vs_io, *, num_nodes):
    """Variant with the whole (bf16) adjacency resident in VMEM: row i is a
    dynamic SUBLANE slice (legal in Mosaic), no DMA plumbing. Fits G22-class
    graphs (n_pad <= 2048 -> 8 MB)."""
    n = num_nodes
    s_io[:] = s_in[:]
    gains_io[:] = gains_in[:]
    vs_io[:] = vs_in[:]
    col = jax.lax.broadcasted_iota(jnp.int32, s_in.shape, 1)

    def body(i, _):
        row = adj_ref[pl.ds(i, 1), :].astype(jnp.float32)  # [1, N]
        onehot = (col == i).astype(jnp.float32)
        s = s_io[:]
        gains = gains_io[:]
        g_i = jnp.sum(gains * onehot, axis=1, keepdims=True)
        s_i = jnp.sum(s * onehot, axis=1, keepdims=True)
        accept = (g_i > 0.0).astype(jnp.float32)
        delta = -2.0 * (s_i * accept) * s * row
        gains = gains + delta * (1.0 - onehot)
        gains = gains + onehot * accept * (-2.0 * g_i)
        s = s + onehot * accept * (-2.0 * s_i)
        gains_io[:] = gains
        s_io[:] = s
        vs_io[:] = vs_io[:] + accept * g_i
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _sweep_kernel(
    adj_hbm, s_in, gains_in, vs_in, s_io, gains_io, vs_io, row_buf, sem, *, num_nodes
):
    n = num_nodes  # real node count; shape[1] may be lane-padded
    # initialize the VMEM-resident state from the inputs
    s_io[:] = s_in[:]
    gains_io[:] = gains_in[:]
    vs_io[:] = vs_in[:]
    col = jax.lax.broadcasted_iota(jnp.int32, s_in.shape, 1)  # [BLK, N]

    def get_dma(slot, i):
        return pltpu.make_async_copy(adj_hbm.at[i], row_buf.at[slot], sem.at[slot])

    get_dma(0, 0).start()

    def body(i, _):
        slot = i % 2

        @pl.when(i + 1 < n)
        def _():
            get_dma((i + 1) % 2, i + 1).start()

        get_dma(slot, i).wait()
        row = row_buf[slot, :]  # [N]

        # column i via onehot masks: Mosaic cannot dynamically slice the
        # lane dimension, so gather/scatter through elementwise ops
        onehot = (col == i).astype(jnp.float32)  # [BLK, N]
        s = s_io[:]
        gains = gains_io[:]
        g_i = jnp.sum(gains * onehot, axis=1, keepdims=True)  # [BLK, 1]
        s_i = jnp.sum(s * onehot, axis=1, keepdims=True)
        accept = (g_i > 0.0).astype(jnp.float32)
        # rank-1 gain update for all nodes: gains += -2 * s_i * s * row,
        # then overwrite column i with the negated own-gain on accept
        delta = -2.0 * (s_i * accept) * s * row[None, :]
        gains = gains + delta * (1.0 - onehot)
        gains = gains + onehot * accept * (-2.0 * g_i)
        s = s + onehot * accept * (-2.0 * s_i)
        gains_io[:] = gains
        s_io[:] = s
        vs_io[:] = vs_io[:] + accept * g_i
        return 0

    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit, static_argnames=("block_chains", "interpret"))
def sweep_1flip_pallas(
    adj: jax.Array,
    s: jax.Array,
    gains: jax.Array,
    vs: jax.Array,
    block_chains: int = 256,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One greedy 1-flip sweep. adj: f32 [N, N]; s: +-1 f32 [B, N];
    gains: f32 [B, N]; vs: f32 [B]. B must divide by `block_chains`.
    Returns (s, gains, vs) after the sweep."""
    b, n = s.shape
    if b % block_chains != 0:
        raise ValueError(f"chains {b} not a multiple of block {block_chains}")
    vs2 = vs[:, None]  # [B, 1] — keep everything 2-D for VMEM tiling

    # pad the node (lane) axis to a multiple of 128: Mosaic tiling needs it,
    # and padded nodes are inert (zero adjacency row -> zero gain -> no flip)
    n_pad = -(-n // 128) * 128
    if n_pad != n:
        pad_nodes = n_pad - n
        adj = jnp.pad(adj, ((0, pad_nodes), (0, pad_nodes)))
        s = jnp.pad(s, ((0, 0), (0, pad_nodes)), constant_values=1.0)
        gains = jnp.pad(gains, ((0, 0), (0, pad_nodes)))

    state_specs = [
        pl.BlockSpec((block_chains, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_chains, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_chains, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = (
        jax.ShapeDtypeStruct((b, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((b, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((b, 1), jnp.float32),
    )
    if n_pad <= 2048:
        # whole adjacency resident in VMEM as bf16 (exact for integer
        # weights |w| < 256); dynamic sublane row slicing, no DMA
        out = pl.pallas_call(
            functools.partial(_sweep_kernel_vmem, num_nodes=n),
            out_shape=out_shape,
            grid=(b // block_chains,),
            in_specs=[
                pl.BlockSpec(
                    (n_pad, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ]
            + state_specs,
            out_specs=tuple(state_specs),
            interpret=interpret,
        )(adj.astype(jnp.bfloat16), s, gains, vs2)
    else:
        out = pl.pallas_call(
            functools.partial(_sweep_kernel, num_nodes=n),
            out_shape=out_shape,
            grid=(b // block_chains,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + state_specs,
            out_specs=tuple(state_specs),
            scratch_shapes=[
                pltpu.VMEM((2, n_pad), jnp.float32),  # double-buffered adj row
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(adj.astype(jnp.float32), s, gains, vs2)
    s_out, gains_out, vs_out = out
    return s_out[:, :n], gains_out[:, :n], vs_out[:, 0]
