"""Device mesh + sharding layout for multi-chip execution.

The parallel decomposition mirrors where the reference's shared-memory
parallelism lives (SURVEY 2.11): the landmark axis is embarrassingly
parallel -> every bucket's leading (landmark) axis is sharded over the
1-D 'lm' mesh; the camera axis is the contended one -> camera state and
all camera-indexed accumulators ([N,9] vectors, [N,9,9] blocks) are
replicated, and the segment-sums that replace the reference's per-camera
mutex scatters (linearization_qr.hpp:406-429) become partial sums per
shard + an XLA all-reduce over ICI, inserted automatically by GSPMD
when the sharded-operand segment-sum output is required replicated.

No code change is needed in the solvers: they are pure jnp functions,
so placing the bucket tensors with a NamedSharding and jitting with
replicated out-shardings turns them SPMD.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if num_devices and num_devices > 0:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), ("lm",))


def lm_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over 'lm'."""
    return NamedSharding(mesh, P("lm"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_bucket_index(bucket, mesh: Mesh):
    """Place a BucketIndex with its landmark axis sharded."""
    s = lm_sharding(mesh)
    return type(bucket)(*(jax.device_put(x, s) for x in bucket))


def shard_state(state, mesh: Mesh):
    """CamState replicated, landmark positions sharded (the landmark
    axis is leading for [L,3] einsum-layout states and trailing for
    [3,L] planar-layout states)."""
    r = replicated(mesh)
    cams = type(state.cams)(*(jax.device_put(x, r) for x in state.cams))
    lm_ps = []
    for p in state.lm_ps:
        if p.ndim == 2 and p.shape[0] == 3 and p.shape[1] != 3:
            spec = NamedSharding(mesh, P(None, "lm"))  # planar [3, L]
        else:
            spec = lm_sharding(mesh)  # [L, 3]
        lm_ps.append(jax.device_put(p, spec))
    return type(state)(cams=cams, lm_ps=tuple(lm_ps))


def pad_rows_for_mesh(num_devices: int, base_align: int = 8) -> int:
    """Row alignment so every bucket's landmark count divides evenly
    over the mesh."""
    align = base_align
    while align % max(num_devices, 1) != 0:
        align *= 2
    return align
