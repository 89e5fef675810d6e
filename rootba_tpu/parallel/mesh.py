"""Device mesh + sharding layout for multi-chip / multi-host execution.

The parallel decomposition mirrors where the reference's shared-memory
parallelism lives (SURVEY 2.11): the landmark axis is embarrassingly
parallel -> every bucket's leading (landmark) axis is sharded over the
1-D 'lm' mesh; the camera axis is the contended one -> camera state and
all camera-indexed accumulators ([N,9] vectors, [N,9,9] blocks) are
replicated, and the segment-sums that replace the reference's per-camera
mutex scatters (linearization_qr.hpp:406-429) become partial sums per
shard + an XLA all-reduce, inserted automatically by GSPMD when the
sharded-operand segment-sum output is required replicated.

Multi-host: jax.distributed.initialize() (init_distributed) builds one
global runtime across processes; jax.devices() then lists ALL chips in
process-major order, so the 1-D 'lm' mesh keeps each host's chips
contiguous -- XLA decomposes the camera all-reduce hierarchically
(reduce-scatter/all-gather over ICI within a host, the small [N,9]
partials over DCN between hosts), which is exactly the reference's
mutex-scatter boundary promoted to the network. Bucket tensors are
materialized per-process shard-only via make_array_from_callback
(put_sharded): a host never allocates landmark blocks it does not own.

No code change is needed in the solvers: they are pure jnp functions,
so placing the bucket tensors with a NamedSharding and jitting with
replicated out-shardings turns them SPMD.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize the cross-host runtime (jax.distributed). Arguments
    default to the ROOTBA_COORDINATOR / ROOTBA_NUM_PROCESSES /
    ROOTBA_PROCESS_ID environment variables; on managed TPU pods all
    three may be None and are auto-detected from the TPU metadata.

    The reference has no distributed backend (single process, TBB);
    this is the TPU-native equivalent demanded by SURVEY §2.11.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "ROOTBA_COORDINATOR")
    if num_processes is None and "ROOTBA_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["ROOTBA_NUM_PROCESSES"])
    if process_id is None and "ROOTBA_PROCESS_ID" in os.environ:
        process_id = int(os.environ["ROOTBA_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def make_mesh(num_devices: int = 0, devices=None) -> Mesh:
    """1-D 'lm' mesh over the (global) device list. jax.devices() is
    process-major, so multi-host meshes keep each host's chips
    contiguous (hierarchical ICI-then-DCN collectives)."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices and num_devices > 0:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), ("lm",))


def lm_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over 'lm'."""
    return NamedSharding(mesh, P("lm"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_sharded(arr, sharding: NamedSharding):
    """Place a host array with the given sharding. Single-process:
    plain device_put. Multi-process: materialize only this process's
    addressable shards (each host feeds its own chips; the reference
    analog is each TBB worker touching only its landmark range)."""
    if jax.process_count() > 1:
        arr = np.asarray(arr)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx])
    return jax.device_put(arr, sharding)


def gather_to_host(x) -> np.ndarray:
    """Fetch a (possibly cross-process sharded) array to every host as
    numpy. Single-process or fully-addressable: plain np.asarray."""
    if jax.process_count() > 1 and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(
            x, tiled=True))
    return np.asarray(x)


def shard_bucket_index(bucket, mesh: Mesh):
    """Place a BucketIndex with its landmark axis sharded."""
    s = lm_sharding(mesh)
    return type(bucket)(*(put_sharded(x, s) for x in bucket))


def shard_state(state, mesh: Mesh):
    """CamState replicated, landmark positions sharded over 'lm'."""
    r = replicated(mesh)
    cams = type(state.cams)(*(put_sharded(x, r) for x in state.cams))
    lm_ps = tuple(put_sharded(p, lm_sharding(mesh))
                  for p in state.lm_ps)
    return type(state)(cams=cams, lm_ps=lm_ps)


def pad_rows_for_mesh(num_devices: int, base_align: int = 8) -> int:
    """Row alignment so every bucket's landmark count divides evenly
    over the mesh."""
    align = base_align
    while align % max(num_devices, 1) != 0:
        align *= 2
    return align
