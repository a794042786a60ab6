"""Dispatch helper for the fused degree-ordered sweep kernels.

One entry point for "run N noisy degree-ordered MCPG sweeps over these
candidate bits on the TPU" that picks the right kernel for the instance:

  * `mcpg_sweep_fused` (ops/pallas/mcpg_sweep.py) — unit / {0, +-1}-weight
    graphs whose [N, WPAD] mask tables fit resident in VMEM;
  * `mcpg_sweep_weighted_fused` (ops/pallas/weighted_sweep.py) — general
    integer weights, or G55/G70-scale instances whose mask tables must be
    streamed from HBM in node chunks.

This mirrors the dispatch in `algos/mcpg.py:_build_steps` (reference hot
loop `rlsolver/methods/MCPG.py:120-166`); factored out so the L2A flagship
(`algos/l2a.py`, reference `L2A/demo_instance.py:141-168`) can drive the
same engine. The returned `tables` pytree is meant to ride through outer
jits as an ARGUMENT (same-shape instances share one compiled program);
`weighted` / `node_chunk` / `block_chains` are trace-time statics.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from rlsolver_tpu.core.graph import Graph
from rlsolver_tpu.ops.pallas.mcpg_sweep import PackedSweepTables, mcpg_sweep_fused
from rlsolver_tpu.ops.pallas.weighted_sweep import (
    WeightedSweepTables,
    mcpg_sweep_weighted_fused,
    pick_node_chunk,
    resident_masks_fit,
)


class FusedSweepEngine(NamedTuple):
    """Static (trace-time) description of the chosen kernel. `tables` is a
    device pytree; the other fields are python values — do NOT pass the
    whole engine through a jit boundary, pass `engine.tables` and keep
    `weighted` / `node_chunk` in the closure (they select the kernel at
    trace time)."""

    tables: Union[PackedSweepTables, WeightedSweepTables]
    weighted: bool
    node_chunk: Optional[int]

    @staticmethod
    def build(graph: Graph, block_chains: int) -> "FusedSweepEngine":
        try:
            t = PackedSweepTables.build(graph)
            n_masks = 6 if t.signed else 3
            if not resident_masks_fit(t.num_nodes, t.wpad, n_masks, block_chains):
                raise ValueError("dedicated-kernel masks exceed VMEM")
            return FusedSweepEngine(t, False, None)
        except ValueError:
            t = WeightedSweepTables.build(graph)
            n_masks = 1 + len(t.planes_pos) * (2 if t.planes_neg else 1)
            chunk = pick_node_chunk(t.num_nodes, t.wpad, n_masks, block_chains)
            return FusedSweepEngine(t, True, chunk)

    def sweep(
        self,
        seed: jax.Array,
        bits: jax.Array,
        num_sweeps: int,
        block_chains: int,
        tables=None,
    ) -> jax.Array:
        """`num_sweeps` noisy sweeps over `bits` bool [B, N]. Pass `tables`
        explicitly when calling inside a jit whose caller threads
        `engine.tables` as an argument."""
        t = self.tables if tables is None else tables
        if self.weighted:
            return mcpg_sweep_weighted_fused(
                seed, bits, t, num_sweeps=num_sweeps,
                block_chains=block_chains, node_chunk=self.node_chunk,
            )
        return mcpg_sweep_fused(
            seed, bits, t, num_sweeps=num_sweeps, block_chains=block_chains
        )
