"""MCPG's degree-ordered sequential sweep as a bit-packed Pallas TPU kernel.

The sampler's inner loop (`sampler_func`, reference
`rlsolver/methods/MCPG.py:120-166`) visits nodes in descending-degree order
and sets x_i to the anti-majority of its neighbors' current values, with the
first sweep's mixed value domain: already-processed nodes contribute their
{0, 1} bit, unprocessed ones contribute 2x - 0.5 in {-0.5, 1.5}
(`MCPG.py:131-141`). The XLA formulation
(`rlsolver_tpu.ops.sweeps.degree_ordered_sweep`) is a `lax.scan` of padded
neighbor gathers over the [B, N+1] f32 state.

This kernel exploits that everything in the sweep is derivable from the
current *bits*: pack chains to int32 words ([BLK, N/32] resident in VMEM)
and precompute, per sweep step k (node i = order[k]),

  * m_proc[k]   — neighbors of i earlier in the order (already rewritten),
  * m_unproc[k] — neighbors of i later in the order (still original),

as static bit masks. The neighbor sum of the mixed domain is then

  nbr_sum = popcount(x & m_proc) + 2 * popcount(x & m_unproc) - 0.5 * U_k

with U_k = |m_unproc[k]| static, so the accept test
`nbr_sum + u * ns < (wdeg + ns) / 2` becomes a popcount compare against the
precomputed threshold thr1[k] = (wdeg_i + ns)/2 + 0.5 * U_k. Sweeps >= 2
see an all-{0,1} state and use m_all = m_proc | m_unproc with
thr2[k] = (wdeg_i + ns)/2.

Supports unit-weight graphs (one bit-plane per mask) and {0, +-1}-weight
graphs — half the real Gset suite (G11-G13, G32-G34, G56, G57, ...) — via a
second bit-plane per mask holding the negative edges: each weighted
neighbor sum is then a signed popcount difference
popcount(x & m_pos) - popcount(x & m_neg), still exact integer arithmetic.
General-weight graphs fall back to the XLA sweep.

All f32 quantities involved are exact (integers and halves), so the
injected-noise variant is bit-exact against its XLA twin
(`mcpg_sweep_reference`, tested in interpret mode), and the twin with zero
noise is provably identical to `degree_ordered_sweep(noise_scale=0)`
(tested). The production variant draws u16 noise from the on-core PRNG
(TPU-only, like `mh_sample_fused`).

Measured (TPU v5e-1, G22-class graph, 2026-08): at 8k chains 941M
node-updates/s vs the XLA sweep's 867M (XLA pipelines the gathers well
while the state is cache-sized); at 256k chains — the scale of the
reference's gset presets (up to 1M chains, `MCPG.py:49-84`) — 698M vs 41M
(17x), and the 32x smaller bit-packed state is what lets those presets fit
16 GB of HBM at all.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rlsolver_tpu.core.graph import Graph
from rlsolver_tpu.ops.pallas.mh_sampler import pack_bits, unpack_bits


class PackedSweepTables(NamedTuple):
    """Static per-instance tables, in sweep (descending-degree) order.

    The `*_neg` planes are None for unit-weight graphs and hold the
    negative-edge bit masks for {0, +-1}-weight graphs (signed popcounts)."""

    nodes: jax.Array  # [N] int32 node ids (sweep order)
    m_proc: jax.Array  # [N, WPAD] int32 earlier-neighbor masks (sweep 1)
    m_unproc: jax.Array  # [N, WPAD] int32 later-neighbor masks (sweep 1)
    m_all: jax.Array  # [N, WPAD] int32 all-neighbor masks (sweeps >= 2)
    thr1: jax.Array  # [N] f32 first-sweep thresholds
    thr2: jax.Array  # [N] f32 later-sweep thresholds
    m_proc_neg: Optional[jax.Array] = None  # [N, WPAD] negative-edge planes
    m_unproc_neg: Optional[jax.Array] = None
    m_all_neg: Optional[jax.Array] = None

    @property
    def num_nodes(self) -> int:
        return self.nodes.shape[0]

    @property
    def wpad(self) -> int:
        return self.m_proc.shape[1]

    @property
    def signed(self) -> bool:
        return self.m_proc_neg is not None

    @staticmethod
    def build(graph: Graph) -> "PackedSweepTables":
        n = graph.num_nodes
        adj = np.asarray(graph.adjacency_dense())
        if not np.all(np.isin(adj, (-1.0, 0.0, 1.0))):
            raise ValueError(
                "packed sweep requires a unit-weight or {0, +-1}-weight graph"
            )
        signed = bool(np.any(adj < 0))
        order = np.asarray(graph.degree_sorted_nodes(descending=True))
        pos = np.empty(n, np.int64)
        pos[order] = np.arange(n)
        earlier = pos[None, :] < np.arange(n)[:, None]  # [N, N]

        def planes(a: np.ndarray):
            a_ord = a[order]  # [N steps, N nodes]
            # nodes are never their own neighbors (no self loops in Graph)
            return a_ord & earlier, a_ord & ~earlier, a_ord

        mp, mu, ma = planes(adj > 0)
        u_cnt = mu.sum(axis=1).astype(np.float64)
        if signed:
            mpn, mun, man = planes(adj < 0)
            u_cnt -= mun.sum(axis=1)
        wdeg = np.asarray(graph.weighted_degrees())[order].astype(np.float64)
        # noise-free thresholds; the runtime adds noise_scale / 2
        base = wdeg / 2.0
        w = (n + 31) // 32
        wpad = max(128, -(-w // 128) * 128)

        def pack(rows: np.ndarray) -> jax.Array:
            padded = np.zeros((rows.shape[0], wpad * 32), bool)
            padded[:, :n] = rows
            bits = padded.reshape(rows.shape[0], wpad, 32)
            weights = (1 << np.arange(32, dtype=np.int64))[None, None, :]
            words = (bits * weights).sum(axis=2)
            return jnp.asarray((words & 0xFFFFFFFF).astype(np.uint32).view(np.int32))

        return PackedSweepTables(
            nodes=jnp.asarray(order.astype(np.int32)),
            m_proc=pack(mp),
            m_unproc=pack(mu),
            m_all=pack(ma),
            thr1=jnp.asarray((base + 0.5 * u_cnt).astype(np.float32)),
            thr2=jnp.asarray(base.astype(np.float32)),
            m_proc_neg=pack(mpn) if signed else None,
            m_unproc_neg=pack(mun) if signed else None,
            m_all_neg=pack(man) if signed else None,
        )


def _pc_f32(words, m):
    return jnp.sum(
        jax.lax.population_count(words & m), axis=1, keepdims=True
    ).astype(jnp.float32)


def _sweep_body(words, lane, node, m_a, m_b, two_b, u_term, thr):
    """One node update. words [BLK, WPAD]; node scalar; m_a/m_b are
    (pos, neg_or_None) mask pairs [1, WPAD] (signed popcount difference);
    u_term [BLK, 1] f32 (noise * scale, already scaled); thr scalar f32."""
    nbr = _pc_f32(words, m_a[0])
    if m_a[1] is not None:
        nbr = nbr - _pc_f32(words, m_a[1])
    if two_b:
        pc_b = _pc_f32(words, m_b[0])
        if m_b[1] is not None:
            pc_b = pc_b - _pc_f32(words, m_b[1])
        nbr = nbr + two_b * pc_b
    new_bit = ((nbr + u_term) < thr).astype(jnp.int32)  # [BLK, 1]
    word_i = jax.lax.shift_right_logical(node, 5)
    bitmask = jax.lax.shift_left(1, node & 31)
    hot = (lane == word_i).astype(jnp.int32)  # [BLK, WPAD]
    cleared = words & ~(hot * bitmask)
    return cleared | (hot * (new_bit * bitmask))


def _mcpg_sweep_kernel(
    seed_ref,
    nodes_ref,
    thr1_ref,
    thr2_ref,
    *rest,
    num_sweeps,
    noise_scale,
    use_prng,
    signed,
):
    if signed:
        (mp_ref, mpn_ref, mu_ref, mun_ref, ma_ref, man_ref,
         noise_ref, bits_ref, out_ref) = rest
    else:
        mp_ref, mu_ref, ma_ref, noise_ref, bits_ref, out_ref = rest
        mpn_ref = mun_ref = man_ref = None
    num_nodes = nodes_ref.shape[0]
    i_blk = pl.program_id(0)
    if use_prng:
        pltpu.prng_seed(seed_ref[0], i_blk)

    out_ref[:] = bits_ref[:]
    words0 = out_ref[:]
    blk = words0.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, words0.shape, 1)
    scale = jnp.float32(noise_scale / 65536.0)
    half_ns = jnp.float32(noise_scale / 2.0)

    def u_term(s, k):
        if use_prng:
            rnd = jax.lax.bitcast_convert_type(
                pltpu.prng_random_bits((blk, 1)), jnp.int32
            )
            return (rnd & 0xFFFF).astype(jnp.float32) * scale
        return noise_ref[s * num_nodes + k, :][:, None].astype(jnp.float32) * scale

    def first_sweep_step(k, words):
        node = nodes_ref[k]
        m_p = (mp_ref[pl.ds(k, 1), :], mpn_ref[pl.ds(k, 1), :] if signed else None)
        m_u = (mu_ref[pl.ds(k, 1), :], mun_ref[pl.ds(k, 1), :] if signed else None)
        return _sweep_body(
            words, lane, node, m_p, m_u, 2.0, u_term(0, k), thr1_ref[k] + half_ns
        )

    def later_step(sk, words):
        s = sk // num_nodes
        k = sk % num_nodes
        node = nodes_ref[k]
        m_a = (ma_ref[pl.ds(k, 1), :], man_ref[pl.ds(k, 1), :] if signed else None)
        return _sweep_body(
            words, lane, node, m_a, m_a, 0.0, u_term(s, k), thr2_ref[k] + half_ns
        )

    words = jax.lax.fori_loop(0, num_nodes, first_sweep_step, words0)
    words = jax.lax.fori_loop(
        num_nodes, num_sweeps * num_nodes, later_step, words
    )
    out_ref[:] = words


def _sweep_call(
    tables: PackedSweepTables,
    bits: jax.Array,
    seed: jax.Array,
    noise_u16: jax.Array,
    num_sweeps: int,
    noise_scale: float,
    block_chains: int,
    use_prng: bool,
    interpret: bool,
) -> jax.Array:
    b, n = bits.shape
    if n != tables.num_nodes:
        raise ValueError(f"bits have {n} nodes, tables built for {tables.num_nodes}")
    if b % block_chains != 0:
        raise ValueError(f"chains {b} not a multiple of block {block_chains}")
    wpad = tables.wpad
    words = pack_bits(bits)
    w = words.shape[1]
    words = jnp.pad(words, ((0, 0), (0, wpad - w)))

    signed = tables.signed
    if signed:
        masks = [
            tables.m_proc, tables.m_proc_neg,
            tables.m_unproc, tables.m_unproc_neg,
            tables.m_all, tables.m_all_neg,
        ]
    else:
        masks = [tables.m_proc, tables.m_unproc, tables.m_all]
    mask_spec = pl.BlockSpec((n, wpad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    noise_rows = noise_u16.shape[0]  # 1 (prng dummy) or num_sweeps * n
    noise_spec = pl.BlockSpec(
        (noise_rows, block_chains), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _mcpg_sweep_kernel,
            num_sweeps=num_sweeps,
            noise_scale=noise_scale,
            use_prng=use_prng,
            signed=signed,
        ),
        out_shape=jax.ShapeDtypeStruct((b, wpad), jnp.int32),
        grid=(b // block_chains,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),  # nodes
            pl.BlockSpec(memory_space=pltpu.SMEM),  # thr1
            pl.BlockSpec(memory_space=pltpu.SMEM),  # thr2
            *([mask_spec] * len(masks)),
            noise_spec,  # injected noise ([1, B] dummy when use_prng)
            pl.BlockSpec(
                (block_chains, wpad), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_chains, wpad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        jnp.atleast_1d(seed).astype(jnp.int32),
        tables.nodes,
        tables.thr1,
        tables.thr2,
        *masks,
        noise_u16,
        words,
    )
    return unpack_bits(out[:, :w], n)


@functools.partial(
    jax.jit,
    static_argnames=("num_sweeps", "noise_scale", "block_chains", "interpret"),
)
def mcpg_sweep_packed(
    noise_u16: jax.Array,
    bits: jax.Array,
    tables: PackedSweepTables,
    num_sweeps: int = 1,
    noise_scale: float = 0.25,
    block_chains: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Injected-noise variant (CI-testable). noise_u16: int32 in [0, 65536)
    of shape [num_sweeps * N, B]; bits: bool [B, N]. Bit-exact vs
    `mcpg_sweep_reference`."""
    return _sweep_call(
        tables,
        bits,
        jnp.int32(0),
        noise_u16,
        num_sweeps,
        noise_scale,
        block_chains,
        use_prng=False,
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_sweeps", "noise_scale", "block_chains"),
)
def mcpg_sweep_fused(
    seed: jax.Array,
    bits: jax.Array,
    tables: PackedSweepTables,
    num_sweeps: int = 1,
    noise_scale: float = 0.25,
    block_chains: int = 512,
) -> jax.Array:
    """Production variant: u16 noise from the on-core PRNG (TPU-only)."""
    dummy = jnp.zeros((1, bits.shape[0]), jnp.int32)
    return _sweep_call(
        tables,
        bits,
        seed,
        dummy,
        num_sweeps,
        noise_scale,
        block_chains,
        use_prng=True,
        interpret=False,
    )


def pack_adjacency(graph: Graph) -> Tuple[jax.Array, Optional[jax.Array]]:
    """{0, +-1}-weight adjacency as (pos, neg) packed int32 row planes
    [N, WPAD] (natural node order) for the greedy 1-flip sweep; neg is None
    for unit-weight graphs."""
    n = graph.num_nodes
    adj = np.asarray(graph.adjacency_dense())
    if not np.all(np.isin(adj, (-1.0, 0.0, 1.0))):
        raise ValueError(
            "packed sweep requires a unit-weight or {0, +-1}-weight graph"
        )
    w = (n + 31) // 32
    wpad = max(128, -(-w // 128) * 128)

    def pack(rows: np.ndarray) -> jax.Array:
        padded = np.zeros((n, wpad * 32), bool)
        padded[:, :n] = rows
        bits = padded.reshape(n, wpad, 32)
        weights = (1 << np.arange(32, dtype=np.int64))[None, None, :]
        words = (bits * weights).sum(axis=2)
        return jnp.asarray((words & 0xFFFFFFFF).astype(np.uint32).view(np.int32))

    neg = pack(adj < 0) if np.any(adj < 0) else None
    return pack(adj > 0), neg


def _sweep_1flip_kernel(*refs, num_nodes, signed):
    if signed:
        adj_ref, adjn_ref, bits_ref, out_ref = refs
    else:
        adj_ref, bits_ref, out_ref = refs
        adjn_ref = None
    out_ref[:] = bits_ref[:]
    words0 = out_ref[:]  # [BLK, WPAD] int32
    lane = jax.lax.broadcasted_iota(jnp.int32, words0.shape, 1)

    def body(i, words):
        row = adj_ref[pl.ds(i, 1), :]  # [1, WPAD]
        deg = jnp.sum(jax.lax.population_count(row))  # scalar
        p = jnp.sum(
            jax.lax.population_count(words & row), axis=1, keepdims=True
        )  # [BLK, 1] neighbors with bit set
        word_i = jax.lax.shift_right_logical(i, 5)
        bitpos = i & 31
        hot = (lane == word_i).astype(jnp.int32)
        cur_word = jnp.sum(words * hot, axis=1, keepdims=True)
        cur = jax.lax.shift_right_logical(cur_word, bitpos) & 1
        # cut weight at i: neighbors on the other side (signed popcount
        # difference for +-1 weights); flip gain = wdeg_i - 2 * cut_i
        cut_i = jnp.where(cur == 1, deg - p, p)
        wdeg = deg
        if signed:
            rown = adjn_ref[pl.ds(i, 1), :]
            degn = jnp.sum(jax.lax.population_count(rown))
            pn = jnp.sum(
                jax.lax.population_count(words & rown), axis=1, keepdims=True
            )
            cut_i = cut_i - jnp.where(cur == 1, degn - pn, pn)
            wdeg = deg - degn
        accept = (wdeg - 2 * cut_i > 0).astype(jnp.int32)  # strict improvement
        flip = jax.lax.shift_left(accept, bitpos)
        return jax.lax.bitwise_xor(words, hot * flip)

    out_ref[:] = jax.lax.fori_loop(0, num_nodes, body, words0)


@functools.partial(jax.jit, static_argnames=("block_chains", "interpret"))
def sweep_1flip_packed(
    bits: jax.Array,
    adj_packed: Tuple[jax.Array, Optional[jax.Array]],
    block_chains: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Greedy sequential 1-flip sweep (`env_L2A.py:110-115` semantics,
    `MaxcutEnv.sweep_1flip`'s strict-improvement accepts, ascending node
    order) on bit-packed state. Deterministic and integer-exact, so it is
    bit-identical to the f32 incremental-gain formulation for unit-weight
    and {0, +-1}-weight graphs (tested). bits: bool [B, N]; adj_packed =
    `pack_adjacency(graph)` (pos, neg-or-None) planes.
    """
    adj_pos, adj_neg = adj_packed
    signed = adj_neg is not None
    b, n = bits.shape
    if b % block_chains != 0:
        raise ValueError(f"chains {b} not a multiple of block {block_chains}")
    wpad = adj_pos.shape[1]
    words = pack_bits(bits)
    w = words.shape[1]
    words = jnp.pad(words, ((0, 0), (0, wpad - w)))
    adj_spec = pl.BlockSpec((n, wpad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    adj_args = (adj_pos, adj_neg) if signed else (adj_pos,)
    out = pl.pallas_call(
        functools.partial(_sweep_1flip_kernel, num_nodes=n, signed=signed),
        out_shape=jax.ShapeDtypeStruct((b, wpad), jnp.int32),
        grid=(b // block_chains,),
        in_specs=[
            *([adj_spec] * len(adj_args)),
            pl.BlockSpec(
                (block_chains, wpad), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_chains, wpad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(*adj_args, words)
    return unpack_bits(out[:, :w], n)


def mcpg_sweep_reference(
    noise_u16: jax.Array,
    bits: jax.Array,
    tables: PackedSweepTables,
    graph: Graph,
    num_sweeps: int = 1,
    noise_scale: float = 0.25,
) -> jax.Array:
    """XLA twin mirroring the kernel's exact arithmetic (signed-popcount
    form — all neighbor sums are exact f32 integers for {0, +-1} weights),
    consuming the same injected u16 noise. bits: bool [B, N] -> bool [B, N].
    """
    n = tables.num_nodes
    adj = jnp.asarray(np.asarray(graph.adjacency_dense()), jnp.float32)  # [N, N]
    order = tables.nodes
    a_ord = adj[order]  # [N, N] in sweep order
    pos = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    earlier = pos[None, :] < jnp.arange(n, dtype=jnp.int32)[:, None]
    m_proc = jnp.where(earlier, a_ord, 0.0)
    m_unproc = jnp.where(earlier, 0.0, a_ord)
    scale = jnp.float32(noise_scale / 65536.0)
    half_ns = jnp.float32(noise_scale / 2.0)

    x = bits.astype(jnp.float32)

    def step(x, inp):
        node, mp, mu, ma, thr1, thr2, u, is_first = inp
        pc_p = jnp.sum(x * mp[None, :], axis=1)
        pc_u = jnp.sum(x * mu[None, :], axis=1)
        pc_a = jnp.sum(x * ma[None, :], axis=1)
        nbr = jnp.where(is_first, pc_p + 2.0 * pc_u, pc_a + 0.0 * pc_a)
        thr = jnp.where(is_first, thr1, thr2) + half_ns
        u_term = u.astype(jnp.float32) * scale
        new_bit = ((nbr + u_term) < thr).astype(jnp.float32)
        return x.at[:, node].set(new_bit), None

    s_idx = jnp.repeat(jnp.arange(num_sweeps), n)
    k_idx = jnp.tile(jnp.arange(n), num_sweeps)
    seq = (
        jnp.tile(order, num_sweeps),
        m_proc[k_idx],
        m_unproc[k_idx],
        a_ord[k_idx],
        jnp.tile(tables.thr1, num_sweeps),
        jnp.tile(tables.thr2, num_sweeps),
        noise_u16,
        s_idx == 0,
    )
    x, _ = jax.lax.scan(step, x, seq)
    return x > 0
