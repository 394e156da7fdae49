"""Multi-host scaffolding: jax.distributed init + DCN-aware batch layout.

The reference's "fleet" is one ROS graph of OS processes on one machine
(SURVEY.md §2 parallelism table); the TPU-native fleet is a multi-host pod
slice: every host runs the same program, ``jax.distributed`` stitches the
processes together, and the mesh keeps the two network tiers apart:

* **DCN** (between hosts) only ever carries the ``stream`` axis — pure data
  parallelism over independent recordings, which needs no collectives in
  the hot path at all (the one cross-stream reduction is the optional
  run-report power scalar);
* **ICI** (between chips of one host) carries the ``bin`` axis, whose
  all-gather before each iFFT is the only hot-path collective.

``multihost_mesh`` arranges the device array so the stream axis iterates
hosts-major (the hybrid-mesh recipe): bins never cross DCN. Everything
downstream (``sharded_batched_step``, ``sharded_spectral_pipeline``) works
unchanged — the mesh axes keep their names.

Single-process safe: every entry point degrades to the local mesh, so the
same program runs on one host (and in this repo's tests) without a
coordinator.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from beamform_tpu.parallel.mesh import make_mesh, mesh_shape_for


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> bool:
    """Initialize ``jax.distributed`` when a multi-process launch is
    configured (explicit args or the standard JAX_* / cluster env vars).

    Returns True if distributed init ran, False for the single-process
    no-op. Safe to call unconditionally at program start — the moral
    equivalent of ``ros::init`` in every reference node (das.cpp:105).
    """
    configured = (coordinator_address
                  or os.environ.get("JAX_COORDINATOR_ADDRESS")
                  or (num_processes or 0) > 1)
    if not configured:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def _platform_devices():
    """All devices of the platform the default device is pinned to — the
    axon TPU plugin ignores JAX_PLATFORMS, so honoring the pinned default
    (tests pin a CpuDevice) is the only reliable platform selector."""
    dd = jax.config.jax_default_device
    if dd is not None:
        return jax.devices(dd.platform)
    return jax.devices()


def multihost_mesh(bin_size: Optional[int] = None) -> Mesh:
    """A (stream, bin) mesh over every device of every process, with the
    stream axis hosts-major so DCN carries only data-parallel traffic.

    bin_size: chips per bin group (defaults to the single-host heuristic,
    capped at the local device count so a bin group never spans hosts).
    """
    devs = _platform_devices()
    # process identity must come from the mesh's own platform: with a
    # coexisting single-process accelerator plugin (the axon tunnel), the
    # default-backend process_index()/count() report 1 process even while
    # the CPU platform is genuinely multi-process
    pid = jax.process_index(backend=devs[0].platform)
    n_local = sum(1 for d in devs if d.process_index == pid)
    n_total = len(devs)
    n_proc = max(1, n_total // n_local)
    if bin_size is None:
        _, bin_size = mesh_shape_for(n_local)
    assert n_local % bin_size == 0, (n_local, bin_size)
    if n_proc == 1:
        return make_mesh(devices=devs,
                         shape=(n_total // bin_size, bin_size))
    # hosts-major stream axis: device[p, l] = process p's l-th device, so
    # rows (streams) group by host and bin groups stay inside one host (ICI)
    devs = sorted(devs, key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devs).reshape(n_proc * (n_local // bin_size), bin_size)
    return Mesh(arr, axis_names=("stream", "bin"))


def process_local_batch(mesh: Mesh, local_batch: np.ndarray):
    """Assemble the global batch array from each process's local streams.

    Every host contributes ``local_batch`` (B_local, M, S); the result is a
    global (B_local * num_processes, M, S) array sharded P('stream') whose
    shards never leave the host that produced them — the DCN-free ingest
    path. Single-process: equivalent to a device_put over the stream axis.
    """
    spec = P(*(["stream"] + [None] * (local_batch.ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    procs = {d.process_index for d in mesh.devices.ravel()}
    n_proc = max(1, len(procs))
    global_shape = (local_batch.shape[0] * n_proc,) + local_batch.shape[1:]
    if n_proc == 1:
        return jax.device_put(local_batch, sharding)
    # assemble from per-device arrays rather than
    # make_array_from_process_local_data: that helper consults the DEFAULT
    # backend's process count, which is 1 when a single-process accelerator
    # plugin (the axon tunnel) coexists with the multi-process CPU platform
    imap = sharding.addressable_devices_indices_map(global_shape)
    row0 = min((ix[0].start or 0) for ix in imap.values())
    arrays = []
    for d, ix in imap.items():
        start = (ix[0].start or 0) - row0
        stop = (global_shape[0] if ix[0].stop is None else ix[0].stop) - row0
        arrays.append(jax.device_put(
            local_batch[(slice(start, stop),) + ix[1:]], d))
    return jax.make_array_from_single_device_arrays(global_shape, sharding,
                                                    arrays)


def dcn_safety_report(mesh: Mesh) -> dict:
    """Diagnostic: which mesh axes cross process boundaries. The invariant
    this module exists for: only 'stream' may ever list more than one
    process."""
    out = {}
    for ax, size in zip(mesh.axis_names, mesh.devices.shape):
        procs = set()
        moved = np.moveaxis(mesh.devices,
                            mesh.axis_names.index(ax), 0)
        for row in moved.reshape(size, -1).T:
            procs.add(len({d.process_index for d in row}))
        out[ax] = max(procs) if procs else 1
    return out
