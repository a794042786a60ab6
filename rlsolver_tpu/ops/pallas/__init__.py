"""Pallas TPU kernels for the hot sampling loops.

`mh_sampler` is the fused VMEM-resident Metropolis-Hastings bit-flip
sampler (bit-exact against its XLA twin; see its module docstring for the
measured tradeoff vs `rlsolver_tpu.ops.sampling.metropolis_bitflip_scan`,
which remains the production default on v5e).
"""

from rlsolver_tpu.ops.pallas.mh_sampler import (
    make_round_randoms,
    mh_reference,
    mh_sample_pallas,
)

__all__ = ["make_round_randoms", "mh_reference", "mh_sample_pallas"]
