"""Pallas TPU kernels for the hot sampling loops.

`mh_sampler` holds the Metropolis-Hastings bit-flip sampler family: the
f32 VMEM-resident kernel, the bit-packed variants, and the production
`mh_sample_fused` (bit-packed chains + on-core PRNG + MXU threshold
lookup, ~18x the XLA scan at G22-class shapes — see the module docstring
for measured numbers). The injected-randomness variants are bit-exact
against their XLA twins and run under interpret mode on CPU.
"""

from rlsolver_tpu.ops.pallas.mcpg_sweep import (
    PackedSweepTables,
    mcpg_sweep_fused,
    mcpg_sweep_packed,
    mcpg_sweep_reference,
    pack_adjacency,
    sweep_1flip_packed,
)
from rlsolver_tpu.ops.pallas.weighted_sweep import (
    WeightedAdjPlanes,
    WeightedSweepTables,
    pick_node_chunk,
    resident_masks_fit,
    mcpg_sweep_weighted,
    mcpg_sweep_weighted_fused,
    sweep_1flip_weighted,
)
from rlsolver_tpu.ops.pallas.mh_sampler import (
    make_proposal_stream,
    make_round_randoms,
    mh_reference,
    mh_reference_stream,
    mh_sample_fused,
    mh_sample_packed,
    mh_sample_pallas,
    mh_sample_stream,
    pack_bits,
    unpack_bits,
)

__all__ = [
    "PackedSweepTables",
    "mcpg_sweep_fused",
    "mcpg_sweep_packed",
    "mcpg_sweep_reference",
    "pack_adjacency",
    "sweep_1flip_packed",
    "WeightedAdjPlanes",
    "WeightedSweepTables",
    "mcpg_sweep_weighted",
    "mcpg_sweep_weighted_fused",
    "sweep_1flip_weighted",
    "pick_node_chunk",
    "resident_masks_fit",
    "make_proposal_stream",
    "make_round_randoms",
    "mh_reference",
    "mh_reference_stream",
    "mh_sample_fused",
    "mh_sample_packed",
    "mh_sample_pallas",
    "mh_sample_stream",
    "pack_bits",
    "unpack_bits",
]
